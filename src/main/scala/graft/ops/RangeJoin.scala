package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned (bucketed) range join: the equi-join rewrite of
  * `point BETWEEN lo AND hi` — the join shape Spark's planner can only
  * nested-loop when no equality conjunct exists (BroadcastNestedLoopJoin,
  * quadratic work and a broadcast-size ceiling; commercial engines ship a
  * native "range join" for exactly this gap).
  *
  * Rewrite: bucket the point side once (`p div binSize` — one bin per
  * row), enumerate each interval's covered bins (`sequence(lo div b,
  * hi div b)` — fan-out (hi−lo)/b + 1), equi-join on the bin, re-apply the
  * exact range predicate as the residual. Exactness: truncating integral
  * division is monotone, so a point inside [lo, hi] always lands in one of
  * the interval's enumerated bins — the equi-join is a superset of the true
  * matches and the residual trims it; a point matches a given interval in
  * exactly ONE bin (its own), so no dedup pass is needed. At scale the
  * shuffle is keyed on bins (high cardinality, AQE-splittable) and the
  * per-task work is |bucket|² only within co-located bins — the same
  * candidates-only discipline as the LSH band join.
  *
  * `binSize` trades fan-out (interval side inflates by span/binSize) against
  * bucket collision width; size it near the typical interval span.
  */
object RangeJoin {

  /** Inner join of `left` rows whose integral `point` column falls within
    * `[lo, hi]` of `right` rows. Columns must be integral (long/int).
    * Expressions are built from dataset-scoped Column objects (never
    * spliced into SQL strings), so column names needing backticks, or
    * names present on BOTH sides, resolve correctly. */
  def binned(
      left: DataFrame, point: String,
      right: DataFrame, lo: String, hi: String,
      binSize: Long): DataFrame = {
    require(binSize > 0, s"binSize must be positive, got $binSize")
    // `div` (truncating IntegralDivide, exact on longs) has no public
    // Column-API function — build it through the catalyst bridge
    def divW(c: Column): Column = org.apache.spark.sql.graftbridge.Bridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.graftbridge.Bridge.expression(c),
        org.apache.spark.sql.catalyst.expressions.Literal(binSize)))
    val l = left.withColumn("__graft_bin_l", divW(left(point)))
    val r = right.withColumn("__graft_bin_r",
      explode(sequence(divW(right(lo)), divW(right(hi)))))
    l.join(r,
        l("__graft_bin_l") === r("__graft_bin_r") &&
          l(point) >= r(lo) && l(point) <= r(hi))
      .drop("__graft_bin_l", "__graft_bin_r")
  }

  /** Equality-prefix variant — the SCD2 / time-series probe shape
    * `k_l = k_r AND point BETWEEN lo AND hi` (the same shape
    * [[graft.plans.BinnedRangeJoinRule]] rewrites when installed as an
    * optimizer rule; this is the explicit operator form). Spark's planner
    * hash-joins the bare key and filters the per-key m×n product AFTER the
    * join — quadratic per key once keys are few or skewed. Joining on
    * (key, bin) instead means each bucket only meets rows whose ranges can
    * overlap; the one-bin-ownership argument of [[binned]] still holds, so
    * no dedup pass is needed. `lo`/`hi` must be non-null inclusive longs —
    * cap open-ended intervals at the maximum probe value BEFORE calling
    * (exact, since no probe can exceed it).
    */
  def binnedKeyed(
      left: DataFrame, leftKey: String, point: String,
      right: DataFrame, rightKey: String, lo: String, hi: String,
      binSize: Long): DataFrame = {
    require(binSize > 0, s"binSize must be positive, got $binSize")
    def divW(c: Column): Column = org.apache.spark.sql.graftbridge.Bridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.graftbridge.Bridge.expression(c),
        org.apache.spark.sql.catalyst.expressions.Literal(binSize)))
    val l = left.withColumn("__graft_bin_l", divW(left(point)))
    // inverted intervals (lo > hi) must fail loudly: sequence() would
    // silently generate a DESCENDING bin list whose rows the residual
    // filter then drops, turning a caller bug into empty matches (callers
    // with open ends cap them first — scd2Pit's greatest() guard). The
    // assert lives in a FILTER (always-true via isnull: assert_true yields
    // null when the check passes) so column pruning can't eliminate it.
    val r = right
      .filter(isnull(assert_true(right(lo) <= right(hi),
        lit(s"binnedKeyed requires $lo <= $hi on every right row"))))
      .withColumn("__graft_bin_r",
        explode(sequence(divW(right(lo)), divW(right(hi)))))
    l.join(r,
        l(leftKey) === r(rightKey) &&
          l("__graft_bin_l") === r("__graft_bin_r") &&
          l(point) >= r(lo) && l(point) <= r(hi))
      .drop("__graft_bin_l", "__graft_bin_r")
  }
}
