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
    * `[lo, hi]` of `right` rows. Columns must be integral (long/int). */
  def binned(
      left: DataFrame, point: String,
      right: DataFrame, lo: String, hi: String,
      binSize: Long): DataFrame = {
    require(binSize > 0, s"binSize must be positive, got $binSize")
    val l = left.withColumn("__graft_bin_l", expr(s"$point div ${binSize}L"))
    val r = right.withColumn("__graft_bin_r",
      explode(expr(s"sequence($lo div ${binSize}L, $hi div ${binSize}L)")))
    l.join(r,
        col("__graft_bin_l") === col("__graft_bin_r") &&
          col(point) >= col(lo) && col(point) <= col(hi))
      .drop("__graft_bin_l", "__graft_bin_r")
  }
}
