package graft.util

/** Process-lifetime scratch directories for queries that must materialize
  * an intermediate layout (snapshot tables, format round trips). The
  * scratch space is written at plan-construction time and read lazily at
  * execution time, so the earliest safe deletion point is process exit;
  * one shutdown hook drains every registered root — bench/verify loops
  * must not leak disk (r5 ADVICE on pq03). */
object Scratch {

  private val roots = new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      roots.forEach { root =>
        try {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(root).iterator().asScala.toSeq
            .sortBy(-_.getNameCount)
            .foreach(p => java.nio.file.Files.deleteIfExists(p))
        } catch { case _: java.io.IOException => () }
      }
    }))

  /** A fresh temp dir, deleted recursively at JVM exit. */
  def tempDir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    hookInstalled
    roots.add(p)
    p.toString
  }

  /** A fresh per-run dir that SURVIVES JVM exit — for artifacts the
    * driver's DuckDB oracle must read after the Spark process is gone
    * (tq43b/tq45b fingerprint frames). Unique per run, so concurrent
    * suite runs on one host never overwrite each other (r11 ADVICE);
    * the few-KB frames left behind live under the OS tmp dir. */
  def oracleDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** A DETERMINISTIC dir that survives JVM exit — the cross-PROCESS
    * resume cache (r15 verdict #6: each bench process re-paid sq28's
    * full policy ladder because the shared workDir was a fresh temp
    * dir per JVM). Callers MUST key `name` by a digest of every input
    * the cached artifact depends on (corpus content, k) — the name IS
    * the staleness guard: regenerated data → new digest → new dir,
    * never a silent stale reload. No exit hook — durability is the
    * point; stale siblings age out with the OS tmp dir. */
  def sharedDir(name: String): String = {
    val p = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft-shared", name)
    java.nio.file.Files.createDirectories(p)
    p.toString
  }
}
