package graft.sources

import graft.TestSpark
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partitioned layout → partition pruning, and the typed Dataset boundary. */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("partitionBy write + lang filter prunes to one partition directory") {
    val path = java.nio.file.Files.createTempDirectory("graft-part").toString + "/docs"
    PartitionedLayout.write(Tables.documents(spark, dir), path, "lang")
    // hive layout on disk: one dir per lang value
    val dirs = new java.io.File(path).listFiles.filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.forall(_.startsWith("lang=")), dirs.mkString(","))
    assert(dirs.length >= 3)

    val q = PartitionedLayout.read(spark, path).filter($"lang" === "en")
    val plan = q.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.linesIterator.exists(l =>
      l.contains("PartitionFilters") && l.contains("lang")),
      "lang predicate did not become a partition filter:\n" + plan)
    // and values round-trip
    val expected = Tables.documents(spark, dir).filter($"lang" === "en").count()
    assert(q.count() == expected)
  }

  test("typed Dataset boundary compiles field access and round-trips values") {
    val ds = graft.etl.JobPosting.fromEtl(
      graft.util.Barrier.stage(graft.etl.JobEtl.transform(
        graft.etl.JobsFixture.jobs(spark, dir), deterministicId = true)))
    // typed field access — compile-time checked
    val highPaying = ds.filter(p => p.salary_avg > 20.0 && p.exp_type == "range")
    val n = highPaying.count()
    assert(n > 0)
    val one = highPaying.head()
    assert(one.salary_avg > 20.0 && one.exp_type == "range")
    assert(one.id.length == 64) // sha256 hex surrogate key
  }
}
