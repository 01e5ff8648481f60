package graft.queries

import graft.QueryDef

object MlQueries {
  val all: Seq[QueryDef] = Seq()
}
