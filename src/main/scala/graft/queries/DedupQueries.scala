package graft.queries

import graft.QueryDef

object DedupQueries {
  val all: Seq[QueryDef] = Seq()
}
