package graft.queries

import graft.QueryDef

object JobEtlQueries {
  val all: Seq[QueryDef] = Seq()
}
