package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** FRESH-SAMPLED scale corpus (r16 verdict #1): the perturbed-unique
  * replicas killed the exact-clone degeneracy, but every probe's truth
  * was still dominated by its own perturbation FAMILY in its own cell
  * — cell-routed entries excel by construction, so the x100 recall
  * numbers measured locality-easy data. This generator samples a
  * corpus of ANY size from the base generator's own distribution with
  * NO families at all: the base table carries its generator's cluster
  * `label`, so we fit one diagonal Gaussian per label (mean + std per
  * dimension — the empirical shape of the generator's mixture) and
  * draw fresh vectors with label weights proportional to the base
  * counts. Every vector is a new draw; a query's true top-k is
  * whatever the mixture put near it — truth crosses "families" because
  * there are none.
  *
  * DETERMINISTIC by construction (no RNG state): cluster pick and
  * Box-Muller normals derive from `xxhash64(vec_id, dim, salt)` —
  * same (n, salt) always yields the same corpus, so replicas are
  * cacheable and probe runs reproducible, the replicate() discipline.
  * PREFIX-STABLE: row `vec_id` depends only on itself, so the x10
  * corpus's first n rows ARE the x1 corpus — the scale series grows
  * like the key-shifted replicas (copy 0 = base), and a probe query
  * set `vec_id < 16` asks the same vectors at every scale.
  *
  * 100 TB: one aggregate over the base fits the stats (labels × dim
  * rows to the driver — KBs); sampling is a map-only projection over
  * `spark.range(n)` — embarrassingly parallel, no shuffle, any scale. */
object FreshEmbeddings {

  /** Per-label diagonal-Gaussian stats of the base corpus:
    * (labels, weights, means, stds), positionally aligned in ascending
    * label order — the label VALUES come along so [[sample]] can emit
    * the base vocabulary, not positional indexes (a base with labels
    * {1, 3, 7} must not produce a corpus labeled {0, 1, 2} — r17
    * review). */
  def fitStats(base: DataFrame):
      (Seq[Int], Seq[Double], Seq[Seq[Double]], Seq[Seq[Double]]) = {
    import base.sparkSession.implicits._
    val rows = base
      .select($"label", posexplode($"embedding").as(Seq("d", "x")))
      .groupBy($"label", $"d")
      .agg(count(lit(1)).as("n"), avg($"x").as("mu"),
        // population std with a small floor: a degenerate dimension
        // must not collapse sampling onto an exact hyperplane
        greatest(stddev_pop($"x"), lit(1e-6)).as("sd"))
      .collect()
    val labels = rows.map(_.getInt(0)).distinct.sorted
    val dim = rows.map(_.getInt(1)).max + 1
    val byLabel = rows.groupBy(_.getInt(0))
    val counts = labels.map(l => byLabel(l).head.getLong(2).toDouble)
    val total = counts.sum
    val means = labels.map { l =>
      byLabel(l).sortBy(_.getInt(1)).map(_.getDouble(3)).toSeq }
    val stds = labels.map { l =>
      byLabel(l).sortBy(_.getInt(1)).map(_.getDouble(4)).toSeq }
    (labels.toSeq, counts.map(_ / total).toSeq, means.toSeq, stds.toSeq)
  }

  /** A 53-bit hash → uniform in (0, 1): shift keeps the top bits,
    * +0.5 keeps the value strictly inside the open interval (a zero
    * would blow up Box-Muller's log). */
  private def unif(h: org.apache.spark.sql.Column) =
    (shiftrightunsigned(h, 11).cast("double") + lit(0.5)) /
      lit(9007199254740992.0) // 2^53

  /** Sample `n` fresh (vec_id, embedding, label) rows from the fitted
    * mixture — the base table's schema, so every probe and store
    * reads it unchanged. */
  def sample(spark: SparkSession, base: DataFrame, n: Long,
      salt: Long = 42L): DataFrame = {
    import spark.implicits._
    val (labels, weights, means, stds) = fitStats(base)
    val dim = means.head.length
    val cum = weights.scanLeft(0.0)(_ + _).tail
    val ids = spark.range(n).select($"id".as("vec_id"))
    val uC = unif(xxhash64($"vec_id", lit(salt)))
    // `ci` is the POSITIONAL component index (what means/stds key by);
    // the emitted `label` maps it back through the base vocabulary
    val compCol = cum.init.zipWithIndex
      .foldRight(lit(cum.length - 1): org.apache.spark.sql.Column) {
        case ((c, i), els) => when(uC < lit(c), lit(i)).otherwise(els)
      }
    val meansLit = typedlit(means)
    val stdsLit = typedlit(stds)
    ids.withColumn("ci", compCol.cast("int"))
      .withColumn("embedding",
        transform(sequence(lit(0), lit(dim - 1)), d => {
          val u1 = unif(xxhash64($"vec_id", d, lit(salt + 1)))
          val u2 = unif(xxhash64($"vec_id", d, lit(salt + 2)))
          val z = sqrt(lit(-2.0) * log(u1)) *
            cos(lit(2.0 * math.Pi) * u2)
          (element_at(element_at(meansLit, $"ci" + 1), d + 1) +
            element_at(element_at(stdsLit, $"ci" + 1), d + 1) * z)
            .cast("float")
        }))
      .withColumn("label",
        element_at(typedlit(labels), $"ci" + 1).cast("int"))
      .select($"vec_id", $"embedding", $"label")
  }
}
