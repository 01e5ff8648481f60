package graft.similarity

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over Array[Float]/Array[Double] columns as pure Column
  * expressions (zip_with + aggregate built-ins — codegen-friendly, no UDF,
  * per-row state bounded by vector dimension).
  *
  * Replaces the reference's row-wise python cosine UDF
  * (pyc compute_cosine_similarity@38) with engine-native expressions.
  */
object VectorOps {

  /** Element-wise cast to double (float arrays → stable double math). */
  def toDouble(v: Column): Column = transform(v, _.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0.0), _ + _)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity — the fused native expression (codegen'd single
    * loop, zero allocation; see graft.functions.CosineSimilarity). */
  def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSimilarity(a, b)

  /** Built-in composition of the same math (allocates a product array per
    * row; ~equal within 1 ulp). Kept as the pure-built-ins fallback and
    * the differential-test partner for the native expression. */
  def cosineComposed(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Signed-random-projection LSH bucket id: one bit per hyperplane
    * (sign of v·h), packed into an int. Hyperplanes are literal arrays —
    * the bucketing is a deterministic, broadcast-free projection. */
  def lshBucket(v: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val planeCol = array(p.map(lit): _*)
      when(dot(v, planeCol) >= 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)
}
