package graft.queries

import graft.Q

object TextQueries {
  val queries: Seq[Q] = Seq()
}
