package graft.ops

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

import scala.collection.concurrent.TrieMap

/** Session-keyed memoization cache with stop-time eviction.
  *
  * The query families that share an expensive deterministic chain
  * (minhash pair graph, Lloyd-trained IVF cells, trade/co-supply edge
  * lists) memoize the checkpointed frame per (session, key). A bare
  * TrieMap keyed on the session never evicts — harmless in a
  * run-and-exit harness, a leak in a long-lived multi-session service
  * (every stopped session would pin its DataFrames, and through them the
  * driver-side checkpoint blocks, forever).
  *
  * On the FIRST insert for a session this cache registers a
  * SparkListener whose `onApplicationEnd` drops every entry belonging to
  * that session, so `session.stop()` releases the memoized frames
  * without any caller-side bookkeeping. Sessions sharing one
  * SparkContext (`newSession()`) each register their own listener;
  * context stop ends the application for all of them, and each listener
  * evicts its own session's entries. If the context is already stopped
  * when the first insert happens, registration fails — the entry is
  * still served, but a session that can no longer run jobs will not be
  * building cacheable frames in practice.
  *
  * SessionCacheSpec drives the eviction path by invoking the registered
  * listener directly (a second in-JVM SparkContext is not available to a
  * test suite, so a real stop cannot be exercised without tearing down
  * the shared test session).
  */
final class SessionCache[K, V](name: String = "") {
  /** Per-key lazy holder: the TrieMap insert race is settled by an
    * atomic `putIfAbsent` on a CHEAP unevaluated holder, and the build
    * itself runs under the winning holder's own monitor (`lazy val`).
    * Builds for unrelated keys never serialize, and two caches nesting
    * into each other lock only their own holders — no cache-wide
    * monitor, no lock-ordering deadlock (a cycle would require the
    * builds themselves to be circular, which is a real bug regardless).
    */
  private final class Holder(label: String, build: () => V) {
    lazy val value: V = {
      // SELF-time attribution: builds nest (state-comps → pair-store →
      // the minhash chain), and wall-clock attribution recorded each
      // inner build inside every ancestor — the r15 memo trailer's
      // state-comps 17.2 s was mostly its nested pair-store 10.4 s, and
      // Σ(builds) overshot the true cold−warm delta. A thread-local
      // nesting stack subtracts child seconds from the parent, so the
      // trailer's entries are disjoint and sum to real build wall-clock
      // (nested builds run on the caller's thread: lazy-val evaluation).
      val stack = SessionCache.nesting.get()
      stack.push(new Array[Double](1))
      val t0 = System.nanoTime()
      // Ledger-on-success only: a failed lazy val re-evaluates on the next
      // access, so recording in the failure path would double-count a
      // fail-then-retry build's seconds in the bench memo trailer. The
      // nesting-stack maintenance stays in finally regardless — a throwing
      // child must still pop its accumulator and charge its wall-clock to
      // the parent, or the parent's self-time would go negative.
      var ok = false
      val v =
        try { val r = build(); ok = true; r }
        finally {
          val total = (System.nanoTime() - t0) / 1e9
          val childSecs = stack.pop()(0)
          if (!stack.isEmpty) stack.peek()(0) += total
          val self = total - childSecs
          if (ok && self >= 0.05) {
            if (childSecs >= 0.05)
              System.err.println(
                f"[bench] memo $label built in $self%.2f s (+$childSecs%.2f s nested)")
            else
              System.err.println(f"[bench] memo $label built in $self%.2f s")
            SessionCache.recordBuild(label, self)
          }
        }
      v
    }
  }
  private val entries = TrieMap.empty[(SparkSession, K), Holder]
  private val hooked = TrieMap.empty[SparkSession, SparkListener]

  def getOrElseUpdate(spark: SparkSession, key: K, build: => V): V = {
    hooked.getOrElseUpdate(spark, {
      val listener = new SparkListener {
        override def onApplicationEnd(end: SparkListenerApplicationEnd): Unit =
          evict(spark)
      }
      try spark.sparkContext.addSparkListener(listener)
      catch { case _: IllegalStateException => () } // context already stopped
      listener
    })
    // first-touch attribution (round-13 verdict task 4): a cold bench
    // pass attributes every shared memo build to its alphabetical
    // first-toucher (q_cluster_terms pays the whole minhash chain). One
    // stderr marker per build makes the cold-pass cost table readable
    // at a glance without moving builds into untimed warmup (the driver
    // must keep seeing true first-touch cost). The per-name totals also
    // accumulate in [[SessionCache.buildSeconds]] so Bench can print a
    // machine-readable memo-cost trailer (round-14 verdict task 5).
    val holder = entries.getOrElseUpdate(
      (spark, key), new Holder(s"$name$key", () => build))
    holder.value
  }

  /** Drop every entry (and the stop hook) belonging to `spark`. */
  private[graft] def evict(spark: SparkSession): Unit = {
    entries.filterInPlace { case ((s, _), _) => s ne spark }
    hooked.remove(spark)
  }

  private[graft] def sessionEntryCount(spark: SparkSession): Int =
    entries.count { case ((s, _), _) => s eq spark }

  private[graft] def listenerFor(spark: SparkSession): Option[SparkListener] =
    hooked.get(spark)
}

/** Process-wide memo build-cost ledger. The stderr first-touch markers
  * die with the bench log (the driver archives only the 2000-byte tail),
  * so every build ≥0.05 s also lands here; [[graft.Bench]] prints the
  * accumulated per-name seconds as one compact JSON trailer line that
  * survives the tail capture. */
object SessionCache {
  private val builds =
    TrieMap.empty[String, Double]

  /** Per-thread stack of child-seconds accumulators for self-time
    * attribution of nested memo builds (see Holder.value). */
  private[ops] val nesting =
    ThreadLocal.withInitial[java.util.ArrayDeque[Array[Double]]](() =>
      new java.util.ArrayDeque[Array[Double]]())

  private[graft] def recordBuild(label: String, secs: Double): Unit =
    builds.updateWith(label) {
      case Some(t) => Some(t + secs)
      case None    => Some(secs)
    }

  /** Per-label accumulated build seconds since process start. */
  def buildSeconds: Map[String, Double] = builds.toMap

  private[graft] def resetBuilds(): Unit = builds.clear()
}
