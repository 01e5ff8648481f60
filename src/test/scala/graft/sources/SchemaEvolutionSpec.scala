package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The wq05 oracle proves the round trip preserves values; this spec
  * pins the MIGRATION-COST property that makes the operator usable at
  * scale: only batches lacking the column rewrite — batches already
  * carrying it keep their exact files. */
class SchemaEvolutionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fileSet(dir: String): Set[(String, Long)] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      else Seq(f)
    walk(new java.io.File(dir)).filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.lastModified()).toSet
  }

  test("backfill rewrites only the legacy batch; merged read has no nulls after") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-schemaevo").toString + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .coalesce(1).write.parquet(root + "/batch=1")
    Seq((3L, "c", "HI"), (4L, "d", "LO")).toDF("id", "v", "tag")
      .coalesce(1).write.parquet(root + "/batch=2")

    // pre-migration merged read: legacy rows surface null tags
    val pre = SchemaEvolution.read(spark, root)
    assert(pre.filter($"tag".isNull).select($"id").as[Long].collect().toSet == Set(1L, 2L))

    val b2Before = fileSet(root + "/batch=2")
    val rewritten = SchemaEvolution.addColumnBackfill(spark, root, "tag", lit("LEGACY"))
    assert(rewritten == Seq("batch=1"), s"only the legacy batch rewrites: $rewritten")
    assert(fileSet(root + "/batch=2") == b2Before,
      "the batch already carrying the column must keep its exact files")

    val post = SchemaEvolution.read(spark, root)
      .select($"id", $"tag").as[(Long, String)].collect().toMap
    assert(post == Map(1L -> "LEGACY", 2L -> "LEGACY", 3L -> "HI", 4L -> "LO"))

    // idempotent: a second migration run touches nothing
    assert(SchemaEvolution.addColumnBackfill(spark, root, "tag", lit("X")).isEmpty)
  }
}
