package graft.sources

import graft.TestSpark
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The hand-rolled Avro container source: schema mapping over the
  * supported flat-tabular subset, null round trips, multi-file reads,
  * and loud failure outside the subset. */
class AvroSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("score", DoubleType, nullable = true),
    StructField("tags", ArrayType(StringType), nullable = true)))

  test("write → read round-trips values, nulls, and arrays exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-avro-spec").toFile
    val rows = Seq(
      Row(1L, "alpha", 1.5, Seq("x", "y")),
      Row(2L, null, null, Seq.empty[String]),
      Row(3L, "gamma", -0.25, Seq("z")))
    Avro.writeFile(rows, schema, "t", new java.io.File(dir, "a.avro"))
    val back = Avro.read(spark, dir.toString).orderBy("id").collect().toSeq
    assert(back == rows)
  }

  test("multiple container files read as one frame, one task per file") {
    val dir = java.nio.file.Files.createTempDirectory("graft-avro-multi").toFile
    (0 until 3).foreach { i =>
      Avro.writeFile(Seq(Row(i.toLong, s"f$i", i * 1.0, Seq[String]())),
        schema, "t", new java.io.File(dir, s"p$i.avro"))
    }
    val df = Avro.read(spark, dir.toString)
    assert(df.count() == 3)
    assert(df.rdd.getNumPartitions >= 3,
      "each container file must be its own split (the parallelism unit)")
  }

  test("schema mapping rejects the unsupported shapes loudly") {
    val nested = org.apache.avro.SchemaBuilder.record("outer").fields()
      .name("inner").`type`(org.apache.avro.SchemaBuilder.record("i")
        .fields().requiredInt("x").endRecord()).noDefault()
      .endRecord()
    val e = intercept[IllegalArgumentException](Avro.sparkSchema(nested))
    assert(e.getMessage.contains("unsupported Avro type"))
  }
}
