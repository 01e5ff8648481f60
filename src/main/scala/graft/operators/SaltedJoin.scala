package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-resilient equi-join via key salting.
  *
  * A shuffled join on a skewed key sends every row of the hot key to one
  * task. Salting splits each hot key into `saltFactor` sub-keys: the big
  * (skewed) side gets a RANDOM salt in [0, saltFactor), the small side is
  * REPLICATED once per salt value, and the join runs on (key, salt) — the
  * hot key's rows now spread over saltFactor tasks. AQE's skew-join
  * handles many cases at runtime (Sessions enables it); explicit salting
  * is the deterministic fallback when AQE can't split (e.g. broadcast
  * thresholds force a sort-merge, or the skew is in an aggregation
  * feeding the join).
  *
  * Result is row-identical to the plain join (SaltedJoinSpec proves it);
  * cost is small-side replication ×saltFactor — keep the replicated side
  * the dimension side.
  */
object SaltedJoin {

  def join(bigSkewed: DataFrame, smallReplicated: DataFrame, key: String,
      saltFactor: Int = 8): DataFrame = {
    val salted = bigSkewed
      // correctness needs NO property of the salt beyond range: every
      // row joins identically under any salt in [0, n) because the small
      // side carries all n salt values — so the result SET is invariant
      // under repartitioning even though rand(42)'s per-row draws are
      // partition-layout-dependent (seeded rand is deterministic only
      // for a fixed layout). SaltedJoinSpec pins both properties.
      .withColumn("__salt", (rand(42) * saltFactor).cast("int"))
    val replicated = smallReplicated
      .withColumn("__salt", explode(array((0 until saltFactor).map(lit): _*)))
    salted
      .join(replicated, Seq(key, "__salt"))
      .drop("__salt")
  }
}
