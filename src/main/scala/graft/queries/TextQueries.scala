package graft.queries

import graft.QueryDef

object TextQueries {
  val all: Seq[QueryDef] = Seq()
}
