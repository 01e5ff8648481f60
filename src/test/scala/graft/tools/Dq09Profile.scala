package graft.tools

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Diagnostic main (test scope, not shipped): splits dq09's wall time
  * into stages on a ScaleProbe replica dir. Run:
  *   sbt "Test/runMain graft.tools.Dq09Profile /tmp/graft_scale10/x1"
  */
object Dq09Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale10/x1")
    val spark = graft.Sessions.local("dq09-profile", 32)
    import spark.implicits._
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val base = graft.sources.Tables.fanOut(spark, graft.sources.Tables.documents(spark, dir))
      .withColumn("toks", graft.dedup.Shingles.tokens($"text"))
      .filter(size($"toks") >= 3)
      .select($"doc_id", graft.dedup.Shingles.shingles3($"toks").as("shingles"))
    val groups = base
      .groupBy(array_sort($"shingles").as("shingles"))
      .agg(min($"doc_id").as("rep"), count(lit(1)).as("gsz"))
      .cache()
    t("collapse")(println("N_GROUPS " + groups.count()))
    val ex = groups.select($"rep", explode($"shingles").as("sh"))
    // direct rep-level exact pair generation (old plan over reps)
    val szr = groups.select($"rep", size($"shingles").as("szv"))
    val direct = ex.as("a")
      .join(ex.as("b"), $"a.sh" === $"b.sh" && $"a.rep" < $"b.rep")
      .groupBy($"a.rep".as("rep_a"), $"b.rep".as("rep_b"))
      .agg(count(lit(1)).as("inter"))
      .join(szr.select($"rep".as("rep_a"), $"szv".as("sz_a")), Seq("rep_a"))
      .join(szr.select($"rep".as("rep_b"), $"szv".as("sz_b")), Seq("rep_b"))
      .filter($"inter".cast("double") / ($"sz_a" + $"sz_b" - $"inter") >= 0.5)
      .select($"rep_a", $"rep_b")
    val dM = t("direct_pairs")(direct.localCheckpoint(true))
    println("N_DIRECT " + dM.count())
    val dfreq = ex.groupBy($"sh").agg(count(lit(1)).as("df"))
    val wOrd = Window.partitionBy($"rep").orderBy($"df", $"sh")
    val wCnt = Window.partitionBy($"rep")
    val pref = ex.join(dfreq, Seq("sh"))
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("n", count(lit(1)).over(wCnt))
      .filter($"rn" <= $"n" - ceil($"n" * 0.5) + 1)
      .select($"rep", $"sh")
    val prefM = t("prefix")(pref.localCheckpoint(true))
    println("N_PREF " + prefM.count())
    val cand = prefM.as("a")
      .join(prefM.as("b"), $"a.sh" === $"b.sh" && $"a.rep" < $"b.rep")
      .select($"a.rep".as("rep_a"), $"b.rep".as("rep_b"))
      .distinct()
    val candM = t("candidates")(cand.localCheckpoint(true))
    println("N_CAND " + candM.count())
    val pairs = candM
      .join(groups.select($"rep".as("rep_a"), $"shingles".as("sh_a")), Seq("rep_a"))
      .join(groups.select($"rep".as("rep_b"), $"shingles".as("sh_b")), Seq("rep_b"))
      .withColumn("inter", size(array_intersect($"sh_a", $"sh_b")))
      .filter($"inter".cast("double") /
        (size($"sh_a") + size($"sh_b") - $"inter") >= 0.5)
      .select($"rep_a", $"rep_b")
    val p = t("verify_pairs")(pairs.localCheckpoint(true))
    println("N_PAIRS " + p.count())
    val cc = t("connected_components")(
      graft.operators.ConnectedComponents.components(p).localCheckpoint(true))
    t("final_agg")(cc.groupBy($"component").agg(count(lit(1)).as("c"))
      .agg(count(lit(1)), max($"c")).collect().foreach(println))
    // fused end-to-end timing of the registered query (bench shape)
    t("full_query_warm") {
      graft.SparkEntry.queries("dq09_dup_clusters")(spark, dir)
        .write.mode("overwrite").format("noop").save()
    }
    t("full_query") {
      graft.SparkEntry.queries("dq09_dup_clusters")(spark, dir)
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
