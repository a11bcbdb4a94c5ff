package graft

import org.apache.spark.scheduler.SparkListenerApplicationEnd

/** Eviction contract of [[graft.ops.SessionCache]]: the memo caches that
  * back the minhash / IVF / graph-edge chains must release a stopped
  * session's entries (round-9 verdict: a bare session-keyed TrieMap is a
  * leak in a long-lived multi-session service). A second in-JVM
  * SparkContext is unavailable to the suite, so the spec drives the
  * registered stop listener directly — the same code path a real
  * `session.stop()` fires through the listener bus.
  */
class SessionCacheSpec extends SparkSpec {

  test("entries for a stopped session vanish; other sessions keep theirs") {
    val cache = new graft.ops.SessionCache[String, Int]
    val s2 = spark.newSession()
    assert(cache.getOrElseUpdate(spark, "a", 1) == 1)
    assert(cache.getOrElseUpdate(s2, "a", 2) == 2)
    assert(cache.getOrElseUpdate(s2, "b", 3) == 3)
    assert(cache.sessionEntryCount(spark) == 1 && cache.sessionEntryCount(s2) == 2)

    // both sessions registered their own stop hook on first insert
    val l2 = cache.listenerFor(s2)
    assert(cache.listenerFor(spark).isDefined && l2.isDefined)

    l2.get.onApplicationEnd(SparkListenerApplicationEnd(0L))
    assert(cache.sessionEntryCount(s2) == 0, "stopped session's entries must drop")
    assert(cache.sessionEntryCount(spark) == 1, "other sessions unaffected")
    assert(cache.listenerFor(s2).isEmpty, "hook bookkeeping released too")

    // a revived session re-registers and caches fresh
    assert(cache.getOrElseUpdate(s2, "a", 9) == 9)
    assert(cache.listenerFor(s2).isDefined)
    assert(cache.sessionEntryCount(s2) == 1)
  }

  test("memoization still holds: build runs once per (session, key)") {
    val cache = new graft.ops.SessionCache[String, Int]
    var builds = 0
    def build: Int = { builds += 1; builds }
    assert(cache.getOrElseUpdate(spark, "k", build) == 1)
    assert(cache.getOrElseUpdate(spark, "k", build) == 1)
    assert(builds == 1)
  }

  test("the production caches are SessionCache instances (evictable)") {
    // compile-time-checked wiring: the three chains' caches expose the
    // eviction surface; a regression back to a bare TrieMap would fail here
    val caches: Seq[graft.ops.SessionCache[_, _]] = Seq(
      graft.queries.ExtensionQueries.minhashPairsCache,
      graft.queries.ExtensionQueries.ivfCellsCache,
      graft.queries.GraphQueries.tradeEdgesCache)
    caches.foreach(c => assert(c.sessionEntryCount(spark.newSession()) == 0))
  }

  test("nested memo builds record disjoint SELF-times") {
    // round-16: the memo-cost trailer must sum to real build wall-clock,
    // so a build nested inside another must be subtracted from its
    // parent's recorded seconds (no delta-read needed: the label names
    // below are unique to this test, and the ledger is per-label)
    val outer = new graft.ops.SessionCache[String, Int]("spec-nest-outer:")
    val inner = new graft.ops.SessionCache[String, Int]("spec-nest-inner:")
    val got = outer.getOrElseUpdate(spark, "k", {
      Thread.sleep(150)
      inner.getOrElseUpdate(spark, "k", { Thread.sleep(150); 1 }) + 1
    })
    assert(got == 2)
    val b = graft.ops.SessionCache.buildSeconds
    val o = b("spec-nest-outer:k")
    val i = b("spec-nest-inner:k")
    assert(i >= 0.14, s"inner self-time must be its own sleep, got $i")
    assert(o >= 0.14, s"outer self-time must include its own sleep, got $o")
    assert(o < 0.14 + i,
      s"outer ($o) must EXCLUDE the nested inner build ($i) — " +
        "wall-clock attribution would double-count")
  }

  test("GridMemo fails fast when two call sites share a tag") {
    import graft.ops.GridMemo
    val dir = "/tmp/spec-gridmemo-collision"
    def siteA() = GridMemo.memo(spark, dir, "spec_collision_tag")(
      spark.range(1).toDF("x"))
    def siteB() = GridMemo.memo(spark, dir, "spec_collision_tag")(
      spark.range(2).toDF("x"))
    assert(siteA().count() == 1)
    val e = intercept[IllegalStateException] { siteB() }
    assert(e.getMessage.contains("spec_collision_tag"))
    // the owning site keeps working (and still serves the memo)
    assert(siteA().count() == 1)
  }

}
