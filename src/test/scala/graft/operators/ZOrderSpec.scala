package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order clustering must deliver what single-column sorting cannot:
  * file-level min/max pruning on BOTH dimensions. We lay the same
  * 128×128 grid out both ways, reconstruct each file's bounding box from
  * `_metadata.file_name`, and count the files a y-predicate would touch
  * — the exact skipping decision parquet row-group stats make at scan
  * time.
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("morton interleave round-trips bit positions") {
    import spark.implicits._
    val r = Seq((1L, 0L), (0L, 1L), (3L, 5L)).toDF("a", "b")
      .select(ZOrder.zValue($"a", $"b", 4).as("z")).as[Long].collect()
    // (1,0) -> 0b01 = 1; (0,1) -> 0b10 = 2; (3,5) = (0b011, 0b101) ->
    // interleave b3 a3 b2 a2 b1 a1 = 1 0 0 1 1 1 = 0b100111 = 39
    assert(r.toSeq == Seq(1L, 2L, 39L))
  }

  test("z-ordered files prune a y-predicate that a linear-by-x layout cannot") {
    import spark.implicits._
    val nFiles = 16
    val grid = spark.range(128L * 128L)
      .select(($"id" % 128).as("x"), ($"id" / 128).cast("long").as("y"))
    def touchedFiles(path: String): (Long, Long) = {
      val boxes = spark.read.parquet(path)
        .groupBy(col("_metadata.file_name"))
        .agg(min($"x").as("xmin"), max($"x").as("xmax"),
          min($"y").as("ymin"), max($"y").as("ymax"))
        .cache()
      val total = boxes.count()
      // a scan filtered y < 16 must open every file whose [ymin, ymax]
      // intersects — the same decision row-group stats drive
      val touched = boxes.filter($"ymin" < 16).count()
      boxes.unpersist()
      (touched, total)
    }
    val linPath = java.nio.file.Files.createTempDirectory("graft-z").toString + "/linear"
    grid.repartitionByRange(nFiles, $"x").write.parquet(linPath)
    val zPath = java.nio.file.Files.createTempDirectory("graft-z").toString + "/zorder"
    ZOrder.cluster(grid, "x", "y", nFiles, bits = 7).write.parquet(zPath)

    val (linTouched, linTotal) = touchedFiles(linPath)
    val (zTouched, zTotal) = touchedFiles(zPath)
    assert(linTotal == nFiles && zTotal == nFiles,
      s"expected $nFiles files, got linear=$linTotal z=$zTotal")
    // every x-stripe spans all y: the y-filter touches everything
    assert(linTouched == nFiles, s"linear layout should not prune y: $linTouched")
    // z-order confines y < 16 to the bottom z-range files
    assert(zTouched <= nFiles / 2,
      s"z-order should prune most files for a y-slice: $zTouched of $zTotal")
    // and the data itself is identical
    assert(spark.read.parquet(zPath).agg(sum($"x" + $"y" * 1000)).head.getLong(0)
      == grid.agg(sum($"x" + $"y" * 1000)).head.getLong(0))
  }
}
