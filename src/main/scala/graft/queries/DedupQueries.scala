package graft.queries

import graft.Q

object DedupQueries {
  val queries: Seq[Q] = Seq()
}
