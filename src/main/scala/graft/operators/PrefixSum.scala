package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed prefix sum — a global running total WITHOUT the
  * single-partition sort that `Window.orderBy(key)` (no partitionBy)
  * plans. That shape (q08 uses it where the oracle demands it) funnels
  * every row through ONE task at 100 TB; this operator is the scale path:
  *
  *   1. DETERMINISTIC range bucketing: a tiny (min, max) aggregate is
  *      broadcast back and each row computes its own bucket id from the
  *      value range. Unlike repartitionByRange, whose sampled boundaries
  *      are an execution-time artifact (two plan branches sample
  *      independently and may disagree), the bucket id is a pure column
  *      function — every consumer derives the identical assignment, so
  *      joining per-bucket offsets back is correct by construction;
  *   2. the wide rows pay exactly ONE exchange (hash on bucket id) and
  *      sort within partitions by (bucket, key); per-bucket totals +
  *      non-null counts shuffle only bucket-count-many partial-agg rows,
  *      prefix-summed on a single tiny task;
  *   3. offsets broadcast-joined back and one sequential accumulator pass
  *      per partition (resetting at bucket boundaries — a partition may
  *      hold several whole buckets) — genuinely per-partition imperative
  *      logic, the mapPartitions case the engine reserves for exactly
  *      this. A window PARTITIONED BY bucket would instead re-shuffle the
  *      full rows a second time.
  *
  * Bucketing is uniform over the key range by default — the right shape
  * for id- and timestamp-like order keys. For pathologically skewed keys
  * (most rows packed into a sliver of the key range), pass
  * `skewSampled = true`: step 1 instead collects approximate key
  * QUANTILES once (one extra narrow pass over just the key column — the
  * same sampling cost RangePartitioner pays) and embeds them as literal
  * split points, so every bucket holds ~1/n of the ROWS regardless of how
  * the key VALUES are distributed. Because the splits are collected on
  * the driver and baked into the plan as literals, the assignment stays
  * deterministic across plan branches — the property that rules out
  * repartitionByRange (whose sampled boundaries are a per-branch
  * execution artifact) holds for both bucket maps.
  *
  * Matches `sum(v).over(Window.orderBy(k))` exactly for a UNIQUE order
  * key and an integral value column, INCLUDING null semantics: a row's
  * running value is null only while no non-null value has occurred
  * anywhere before it (nulls are skipped, not zeroed). For fractional
  * values the result differs from the sequential window only by
  * floating-point association (bucket subtotals are added first).
  * Verified by the tq11 oracle and OperatorsSpec.
  */
object PrefixSum {

  /** Attach a monotone `__bucket` column (Int; null keys get bucket -1 so
    * they sort first, matching the window's nulls-first order — a NULL
    * bucket would be silently dropped by the inner offsets join).
    * Uniform: affine map over the broadcast (min, max) — zero driver
    * actions. Sampled CDF: approximate key quantiles collected once and
    * embedded as literal split points — balanced buckets under arbitrary
    * key skew. Both maps are pure column functions of the key, so every
    * consumer of the returned frame derives the identical assignment. */
  private[graft] def withBuckets(df: DataFrame, orderCol: String,
      nBuckets: Int, skewSampled: Boolean): DataFrame = {
    val k = col(orderCol).cast("double")
    if (skewSampled) {
      // one narrow pass over the key column (nulls excluded by the
      // sketch); err << 1/nBuckets keeps the realized bucket counts
      // within a few percent of ideal
      val splits = df.select(k.as("__k")).stat.approxQuantile(
        "__k", (1 until nBuckets).map(_.toDouble / nBuckets).toArray,
        0.1 / nBuckets)
      if (splits.isEmpty)
        df.withColumn("__bucket",
          when(k.isNull, lit(-1)).otherwise(lit(0)))
      else {
        // bucket = first split index with k < split (== #splits <= k):
        // monotone in k, so bucket order == key order. A short-circuiting
        // when-chain of plain comparisons, NOT filter(array, lambda) — a
        // higher-order function here trips Catalyst's constraint
        // inference: the inferred isnotnull(__bucket) join filter
        // substitutes the alias body and strands a lambda expression
        // above the offsets aggregate where k is pruned
        // (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND at execution).
        val ss = splits.distinct.sorted
        val chain = ss.zipWithIndex.foldRight(lit(ss.length)) {
          case ((s, i), acc) => when(k < s, lit(i)).otherwise(acc)
        }
        df.withColumn("__bucket", when(k.isNull, lit(-1)).otherwise(chain))
      }
    } else {
      val mm = df.agg(min(k).as("__mn"), max(k).as("__mx"))
      df.crossJoin(broadcast(mm))
        // floor of an affine map is monotone in k, so bucket order == key order
        .withColumn("__bucket",
          when(k.isNull, lit(-1)).otherwise(
            when(col("__mx") <= col("__mn"), lit(0)).otherwise(
              least(lit(nBuckets - 1), greatest(lit(0),
                floor((k - col("__mn")) * nBuckets / (col("__mx") - col("__mn") + 1e-9))
                  .cast("int"))))))
        .drop("__mn", "__mx")
    }
  }

  /** @param orderCol unique global ordering column (numeric or timestamp)
    * @param valueCol numeric column to accumulate (integral → long
    *                 running total, fractional → double — same result
    *                 type as the built-in window sum)
    * @param out      name of the produced running-total column
    * @param skewSampled balanced sampled-CDF bucketing for pathologically
    *                 skewed key distributions (costs one extra pass over
    *                 the key column) */
  def runningSum(df: DataFrame, orderCol: String, valueCol: String,
      out: String, numPartitions: Int = 0,
      skewSampled: Boolean = false): DataFrame = {
    val parts =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val nBuckets = parts * 4 // several buckets per partition smooths the hash placement
    val integral = df.schema(valueCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case FloatType | DoubleType                        => false
      case t => throw new IllegalArgumentException(
        s"runningSum needs an integral or floating value column, got $t")
    }
    val accType = if (integral) LongType else DoubleType
    val bucketed = withBuckets(
      df.withColumn("__v", col(valueCol).cast(accType)),
      orderCol, nBuckets, skewSampled)
    // bucket-count-many (total, non-null count) rows → exclusive prefix on
    // one tiny task → broadcast back; the partial agg is map-side, so the
    // wide rows do NOT shuffle for this pass
    val w = Window.orderBy(col("__bucket")).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed
      .groupBy(col("__bucket"))
      .agg(sum(col("__v")).as("__total"), count(col("__v")).as("__cnt"))
      .select(col("__bucket"),
        coalesce(sum(col("__total")).over(w), lit(0).cast(accType)).as("__offset"),
        coalesce(sum(col("__cnt")).over(w), lit(0)).as("__prior"))
    // The local sort MUST sit ABOVE the offsets join, directly under
    // mapPartitions: a Sort placed below a join child is removed by
    // Catalyst's EliminateSorts (join output ordering is unspecified), and
    // the accumulator would then consume shuffle-fetch order — correct by
    // ACCIDENT whenever every map task is key-ordered (single-row-group
    // fixtures!) and silently wrong the moment it isn't (exposed by the
    // skewed-key spec's round-robin input). The broadcast join preserves
    // the left side's hash partitioning, so sorting after it is the same
    // per-partition order the accumulator needs.
    val joined = bucketed
      .repartition(parts, col("__bucket"))
      .join(broadcast(offsets), "__bucket")
      .sortWithinPartitions(col("__bucket"), col(orderCol))
    val outSchema = StructType(joined.schema.fields :+ StructField(out, accType))
    val bIdx = joined.schema.fieldIndex("__bucket")
    val vIdx = joined.schema.fieldIndex("__v")
    val offIdx = joined.schema.fieldIndex("__offset")
    val priorIdx = joined.schema.fieldIndex("__prior")
    implicit val enc = Encoders.row(outSchema)
    val accumulated =
      if (integral)
        joined.mapPartitions { rows =>
          var bucket = Int.MinValue; var acc = 0L; var seen = 0L
          rows.map { r =>
            if (r.getInt(bIdx) != bucket) { bucket = r.getInt(bIdx); acc = 0L; seen = 0L }
            if (!r.isNullAt(vIdx)) { acc += r.getLong(vIdx); seen += 1 }
            val run: Any =
              if (seen + r.getLong(priorIdx) == 0L) null
              else r.getLong(offIdx) + acc
            Row.fromSeq(r.toSeq :+ run)
          }
        }
      else
        joined.mapPartitions { rows =>
          var bucket = Int.MinValue; var acc = 0.0; var seen = 0L
          rows.map { r =>
            if (r.getInt(bIdx) != bucket) { bucket = r.getInt(bIdx); acc = 0.0; seen = 0L }
            if (!r.isNullAt(vIdx)) { acc += r.getDouble(vIdx); seen += 1 }
            val run: Any =
              if (seen + r.getLong(priorIdx) == 0L) null
              else r.getDouble(offIdx) + acc
            Row.fromSeq(r.toSeq :+ run)
          }
        }
    accumulated.drop("__bucket", "__v", "__offset", "__prior")
  }
}
