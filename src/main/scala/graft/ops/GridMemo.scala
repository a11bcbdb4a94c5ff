package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-keyed memo for the bounded/narrow frames the round-15
  * scan-count fixes materialize (contingency grids, day rollups,
  * customer cohorts, k-gram streams): a bare `localCheckpoint(true)` at
  * query-construction time pays ~0.5-1 s of driver plan-analysis +
  * RDD-conversion latency on EVERY call (the cost the trainedIvfCells
  * scaladoc measured), which a 3-pass bench pays three times per query.
  * Memoizing the checkpoint per (session, dir, tag) moves the build to
  * first touch — attributed in the `[bench] memo` markers and the
  * memo_builds trailer — and makes warm passes read cached blocks, the
  * same discipline as the minhash / IVF / NB chains.
  *
  * Deterministic builds only (every consumer's frame is a pure function
  * of the dir's parquet), so cross-query reuse is value-safe.
  */
object GridMemo {
  private val cache =
    new SessionCache[(String, String), DataFrame]("grid:")

  // Tag-uniqueness is a convention spread across ~25 call sites in
  // different files; two queries accidentally reusing a tag with
  // different build frames would silently hand the first builder's
  // checkpoint to both. Fail fast instead: record the first caller's
  // code location per tag and assert every later call for that tag
  // comes from the same site (sites are static, so a global map is
  // session-safe — the same code line is the same site in any session).
  private val sites =
    scala.collection.concurrent.TrieMap.empty[String, String]

  private def callSite(): String =
    Thread.currentThread.getStackTrace.iterator
      .drop(1) // getStackTrace frame
      .find(f => !f.getClassName.startsWith("graft.ops.GridMemo") &&
                 !f.getClassName.startsWith("java.lang.Thread"))
      // file:line in the key, not just class.method: two memo calls with
      // the same tag but different build frames INSIDE one method (or
      // routed through a shared helper) are exactly the silent-sharing
      // hazard this gate exists for. File + line are stable within a JVM,
      // which is all the session-scoped sites map needs.
      .map(f => s"${f.getClassName}.${f.getMethodName}" +
        s"(${f.getFileName}:${f.getLineNumber})")
      .getOrElse("<unknown>")

  /** The checkpointed `build` frame, built once per (session, dir, tag).
    * Throws `IllegalStateException` if two distinct code sites ever use
    * the same tag — a tag collision would otherwise silently serve one
    * site's frame to the other. */
  def memo(spark: SparkSession, dir: String, tag: String)
      (build: => DataFrame): DataFrame = {
    val here = callSite()
    val owner = sites.putIfAbsent(tag, here).getOrElse(here)
    if (owner != here)
      throw new IllegalStateException(
        s"GridMemo tag collision: tag '$tag' is owned by $owner but was " +
        s"also requested from $here — distinct frames would silently " +
        "share one checkpoint; pick a unique tag per build site")
    cache.getOrElseUpdate(spark, (dir, tag), build.localCheckpoint(true))
  }

  /** `.memoCheckpoint(spark, dir, "tag")` — the drop-in session-memoized
    * replacement for a per-construction `.localCheckpoint(true)`. */
  implicit class MemoOps(private val df: DataFrame) extends AnyVal {
    def memoCheckpoint(spark: SparkSession, dir: String, tag: String): DataFrame =
      memo(spark, dir, tag)(df)
  }
}
