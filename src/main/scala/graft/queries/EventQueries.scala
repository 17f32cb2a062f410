package graft.queries

import graft.Q

object EventQueries {
  val queries: Seq[Q] = Seq()
}
