package graft.queries

import graft.QueryDef

object SimilarityQueries {
  val all: Seq[QueryDef] = Seq()
}
