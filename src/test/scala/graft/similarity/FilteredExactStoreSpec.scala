package graft.similarity

import graft.TestSpark
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** sq25b's storage claim, plan-asserted: the label-partitioned vector
  * store serves the filtered exact top-k through a scan PRUNED to the
  * target labels' partitions — the flip-point alternative to sq25's
  * filter-blind walk (whose answers DuckDB hash-anchors; here the
  * physical read is the subject). */
class FilteredExactStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("the filtered exact scan reads only the target labels' partitions") {
    import spark.implicits._
    import graft.similarity.VectorOps.toDouble
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val root = java.nio.file.Files.createTempDirectory("graft-lblstore").toString
    emb.select($"vec_id", toDouble($"embedding").as("v"), $"label")
      .write.partitionBy("label").mode("overwrite").parquet(root)
    val nLabels = emb.select($"label").distinct().count()
    assert(nLabels == 10, s"fixture drifted: $nLabels labels")
    val targets = Seq(0, 1, 2)
    val pruned = spark.read.parquet(root).filter($"label".isin(targets: _*))
    val scans = pruned.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec if f.relation.location.rootPaths
        .exists(_.toString.contains("graft-lblstore")) => f
    }
    assert(scans.nonEmpty)
    scans.foreach { f =>
      assert(f.selectedPartitions.partitionCount == targets.size,
        s"scan read ${f.selectedPartitions.partitionCount} label partitions, " +
          s"expected ${targets.size} of $nLabels")
    }
    // and the pruned store slice holds exactly the target labels' rows
    val expected = emb.filter($"label".isin(targets: _*)).count()
    assert(pruned.count() == expected)
  }
}
