package graft.operators

import graft.TestSpark
import graft.sources.Tables
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale-pattern operators: bucketed co-located joins plan no Exchange;
  * salted joins return row-identical results to plain joins while
  * spreading hot keys. */
class OperatorsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("bucketed tables join without any Exchange (co-located SortMergeJoin)") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // clear any stale table locations from interrupted prior runs
      for (t <- Seq("orders_b", "lineitem_b")) {
        spark.sql(s"DROP TABLE IF EXISTS $t")
        val loc = new java.io.File(s"spark-warehouse/$t")
        if (loc.exists()) {
          def rm(f: java.io.File): Unit = {
            if (f.isDirectory) f.listFiles.foreach(rm)
            f.delete()
          }
          rm(loc)
        }
      }
      Bucketing.writeBucketed(Tables.orders(spark, dir), "orders_b", "o_orderkey")
      Bucketing.writeBucketed(
        Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity", "l_extendedprice"),
        "lineitem_b", "l_orderkey")
      val joined = Bucketing.colocatedJoin(spark, "lineitem_b", "orders_b",
        "l_orderkey", "o_orderkey")
      val plan = joined.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"),
        "bucketed join should not shuffle either side:\n" + plan)
      // and it computes the right thing
      val n = joined.count()
      val expected = Tables.lineitem(spark, dir)
        .join(Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey").count()
      assert(n == expected)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("salted join equals the plain join row-for-row on a skewed key") {
    // synthesize skew: 80% of lineitem rows mapped to one hot part key
    val skewed = Tables.lineitem(spark, dir)
      .withColumn("pk", when($"l_partkey" % 5 =!= 0, lit(1L)).otherwise($"l_partkey"))
      .select($"pk", $"l_quantity")
    val dim = Tables.part(spark, dir)
      .select($"p_partkey".as("pk"), $"p_brand")
    val plain = skewed.join(dim, Seq("pk"))
      .groupBy($"p_brand").agg(count(lit(1)).as("n"), sum($"l_quantity").as("q"))
    val salted = SaltedJoin.join(skewed, dim, "pk", saltFactor = 8)
      .groupBy($"p_brand").agg(count(lit(1)).as("n"), sum($"l_quantity").as("q"))
    val a = plain.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    val b = salted.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(a.sameElements(b))
    // the property the seeded rand() actually needs: the result SET is
    // stable under a different partition layout, even though per-row
    // salt draws are layout-dependent
    val reparted = SaltedJoin.join(skewed.repartition(7), dim, "pk", saltFactor = 8)
      .groupBy($"p_brand").agg(count(lit(1)).as("n"), sum($"l_quantity").as("q"))
    val c = reparted.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(a.sameElements(c), "salted join must be invariant to partitioning")
  }

  test("distributed prefix sum equals the single-partition window exactly") {
    import org.apache.spark.sql.expressions.Window
    val toks = Tables.documents(spark, dir)
      .select($"doc_id", size(split($"text", " ")).cast("long").as("v"))
    val dist = PrefixSum.runningSum(toks, "doc_id", "v", "run")
      .select($"doc_id", $"run")
    val naive = toks.withColumn("run", sum($"v").over(Window.orderBy($"doc_id")))
      .select($"doc_id", $"run")
    val d = dist.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val n = naive.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(d.sameElements(n))
  }

  test("prefix sum edge cases: empty input, one row, more partitions than rows") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("k", "v")
    assert(PrefixSum.runningSum(empty, "k", "v", "run").count() == 0)
    val one = Seq((7L, 42L)).toDF("k", "v")
    val oneOut = PrefixSum.runningSum(one, "k", "v", "run").collect()
    assert(oneOut.length == 1 && oneOut.head.getAs[Long]("run") == 42L)
    val few = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v")
    val fewOut = PrefixSum.runningSum(few, "k", "v", "run", numPartitions = 16)
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[Long]("run")).toMap
    assert(fewOut == Map(1L -> 10L, 2L -> 30L, 3L -> 60L))
  }

  test("prefix sum shuffles the data exactly once (bucket hash), all other exchanges are tiny") {
    import org.apache.spark.sql.execution.ExplainMode
    val toks = Tables.documents(spark, dir)
      .select($"doc_id", size(split($"text", " ")).cast("long").as("v"))
    val p = PrefixSum.runningSum(toks, "doc_id", "v", "run")
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("MapPartitions"),
      "expected the per-partition accumulator pass:\n" + p)
    // Deterministic bucketing: NO sampled range exchange anywhere (two
    // independently-sampled repartitionByRange branches can disagree on
    // boundaries — the bug this shape removes). The wide rows pay ONE
    // hash exchange on the computed bucket id; the offsets pass adds one
    // bucket-count-row agg exchange + one SinglePartition sort of the
    // totals. More than 3 exchanges would mean the full rows are being
    // reshuffled again (the window-on-partition-id mistake).
    // formatted explain prints the partitioning in per-node Arguments lines
    val ranges = "rangepartitioning\\(".r.findAllIn(p).size
    val bucketHashes = "hashpartitioning\\(__bucket".r.findAllIn(p).size
    // the remaining exchanges are the (min,max) / offsets scalar aggs and
    // the bucket-count window sort — all SinglePartition over tiny frames
    val singles = "SinglePartition".r.findAllIn(p).size
    assert(ranges == 0 && bucketHashes == 2 && singles <= 3,
      s"unexpected exchange profile (range=$ranges bucketHash=$bucketHashes single=$singles):\n$p")
  }

  test("prefix sum: the accumulator's local sort survives optimization (EliminateSorts guard)") {
    // A Sort placed BELOW the offsets join is removed by EliminateSorts
    // (join output ordering is unspecified) and the accumulator then
    // consumes raw shuffle-fetch order — correct by accident on
    // single-row-group fixtures, wrong on real multi-mapper inputs. The
    // sort must sit between MapPartitions and the join in the physical
    // plan.
    val toks = Tables.documents(spark, dir)
      .select($"doc_id", size(split($"text", " ")).cast("long").as("v"))
    val p = PrefixSum.runningSum(toks, "doc_id", "v", "run")
      .queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val iMap = p.indexOf("MapPartitions")
    val iSort = p.indexOf("Sort [__bucket")
    val iJoin = p.indexOf("Join")
    assert(iMap >= 0 && iSort >= 0 && iJoin >= 0, p)
    assert(iMap < iSort && iSort < iJoin,
      s"local sort not between MapPartitions and the offsets join (map=$iMap sort=$iSort join=$iJoin):\n$p")
  }

  test("sampled-CDF bucketing balances a pathologically skewed key; uniform does not") {
    import spark.implicits._
    // 90% of rows packed into <0.001% of the key range: keys 0..8999
    // dense, the last 1000 rows flung across [9000, ~1e9]
    val skewed = spark.range(10000)
      .select(when($"id" < 9000, $"id".cast("double"))
        .otherwise(lit(9000.0) + ($"id" - 9000) * 1e6).as("k"),
        lit(1L).as("v"))
      .repartition(8)
    val nBuckets = 16
    def maxBucket(sampled: Boolean): Long =
      PrefixSum.withBuckets(skewed, "k", nBuckets, skewSampled = sampled)
        .groupBy($"__bucket").count().agg(max($"count")).head().getLong(0)
    // uniform affine map: the dense sliver lands in ONE bucket
    assert(maxBucket(false) >= 9000L,
      s"expected the uniform map to collapse under skew, max=${maxBucket(false)}")
    // sampled CDF: every bucket ~1/16 of the ROWS (<=2x ideal tolerance)
    val cdfMax = maxBucket(true)
    assert(cdfMax <= 2L * 10000 / nBuckets,
      s"sampled-CDF bucket sizes unbalanced: max=$cdfMax ideal=${10000 / nBuckets}")
    // and the running sum over the skewed keys is still exactly the window
    val dist = PrefixSum.runningSum(skewed, "k", "v", "run", skewSampled = true)
      .select($"k", $"run")
      .collect().map(r => (r.getDouble(0), r.getLong(1))).sortBy(_._1)
    val naive = skewed.withColumn("run",
        sum($"v").over(org.apache.spark.sql.expressions.Window.orderBy($"k")))
      .select($"k", $"run")
      .collect().map(r => (r.getDouble(0), r.getLong(1))).sortBy(_._1)
    assert(dist.sameElements(naive))
  }

  test("prefix sum carries null order keys first (bucket -1), matching nulls-first window order") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val data = Seq[(java.lang.Long, Long)](
      (null, 7L), (1L, 10L), (2L, 20L), (3L, 30L))
      .toDF("k", "v")
    for (sampled <- Seq(false, true)) {
      val dist = PrefixSum.runningSum(data, "k", "v", "run",
          numPartitions = 3, skewSampled = sampled)
        .collect().map(r => Option(r.get(r.fieldIndex("k"))) -> r.getLong(r.fieldIndex("run")))
        .toMap
      val naive = data.withColumn("run", sum($"v").over(Window.orderBy($"k")))
        .collect().map(r => Option(r.get(r.fieldIndex("k"))) -> r.getLong(r.fieldIndex("run")))
        .toMap
      assert(dist == naive, s"sampled=$sampled dist=$dist naive=$naive")
      assert(dist(None) == 7L && dist(Some(3L)) == 67L)
    }
  }

  test("prefix sum null semantics match the global window: null until the first non-null") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val data = Seq[(Long, java.lang.Long)](
      (1L, null), (2L, null), (3L, 10L), (4L, null), (5L, 5L))
      .toDF("k", "v")
    val dist = PrefixSum.runningSum(data, "k", "v", "run", numPartitions = 3)
      .collect().map(r => r.getLong(0) -> Option(r.get(r.fieldIndex("run")))).toMap
    val naive = data.withColumn("run", sum($"v").over(Window.orderBy($"k")))
      .collect().map(r => r.getLong(0) -> Option(r.get(r.fieldIndex("run")))).toMap
    assert(dist == naive, s"dist=$dist naive=$naive")
    assert(dist(1L).isEmpty && dist(3L).contains(10L) && dist(5L).contains(15L))
  }
}
