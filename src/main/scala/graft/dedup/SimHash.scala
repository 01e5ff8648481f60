package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SimHash fingerprinting: 32-bit locality-sensitive token-set hash.
  * Near-identical documents differ in few bits (small Hamming distance);
  * unrelated documents differ in ~16. One explode + one 32-expression
  * aggregate; per-doc state is 32 counters regardless of length.
  */
object SimHash {

  val Bits = 32

  /** @param docs (doc_id, text)
    * @param portable use a 32-bit md5-prefix token hash instead of
    *   xxhash64 — slower per token but reproducible bit-for-bit in
    *   DuckDB, which makes the per-document fingerprints themselves
    *   row-level oracle-checkable (dq04b); xxhash64 stays the
    *   production mixer (dq04)
    * @return (doc_id, simhash: long) */
  def fingerprints(docs: DataFrame, portable: Boolean = false): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val tokenHash =
      if (portable) conv(substring(md5($"tok"), 1, 8), 16, 10).cast("long")
      else xxhash64($"tok")
    val votes = docs
      .select($"doc_id", explode(Shingles.tokens($"text")).as("tok"))
      .withColumn("th", tokenHash)
      .groupBy($"doc_id")
      .agg(
        sum(when(shiftrightunsigned($"th", 0).bitwiseAND(1) === 1, 1).otherwise(-1)).as("w0"),
        (1 until Bits).map(j =>
          sum(when(shiftrightunsigned($"th", j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"w$j")): _*)
    votes.withColumn("simhash",
        (0 until Bits)
          .map(j => when(col(s"w$j") > 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce(_ + _))
      .select($"doc_id", $"simhash")
  }

  /** Hamming distance between two fingerprints as a Column expression. */
  def hamming(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    bit_count(a.bitwiseXOR(b))
}
