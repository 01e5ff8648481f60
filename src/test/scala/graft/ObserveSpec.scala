package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dataset.observe — pipeline accounting metrics collected DURING a job
  * (one accumulator update per partition) instead of with a second pass.
  * At 100 TB a separate `df.count()` for row accounting is a full extra
  * scan; observe() rides the job that's already running, which is how
  * ingest/dedup stages should report rows-in/rows-kept.
  */
class ObserveSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("observe() collects row accounting in the same pass as the write") {
    import spark.implicits._
    val obs = new Observation("ingest")
    val li = graft.sources.Tables.lineitem(spark, dir)
    val kept = li
      .observe(obs,
        count(lit(1)).as("rows_in"),
        sum(when($"l_quantity" > 25, 1L).otherwise(0L)).as("rows_kept"))
      .filter($"l_quantity" > 25)
    kept.write.mode("overwrite").format("noop").save()
    val m = obs.get
    val total = li.count()
    val expectKept = li.filter($"l_quantity" > 25).count()
    assert(m("rows_in") == total)
    assert(m("rows_kept") == expectKept)
  }
}
