package graft.ops

import java.math.{BigDecimal => JBigDecimal}

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Robust-statistics primitives built for the 100 TB shape: exact
  * rank-medians without ever sorting the fact table inside a
  * low-cardinality-partitioned window.
  *
  * The naive exact median (`row_number` over a window partitioned by the
  * group key) is correct but becomes a single-task straggler when the
  * group key has a handful of values: the whole table funnels through
  * |groups| sort partitions. The machinery here is a driver-assisted
  * two-level rank search instead:
  *
  *   1. ONE pass: count rows per (group, fixed-width value bucket) — a
  *      map-side-combinable aggregate whose output is bounded by
  *      groups × (value range / width), never by n. Collected to the
  *      driver, a running sum locates the single bucket containing the
  *      target rank plus the exact count below it.
  *   2. ONE pass: per-value counts inside just that bucket — output
  *      bounded by width / value quantum (e.g. cents). The driver walks
  *      the sorted values to the exact rank-target value.
  *
  * Every cluster-side operation is an embarrassingly parallel scan + a
  * combinable aggregate with bounded output; the driver only ever touches
  * domain-bounded histograms (same contract as the centroid literals in
  * [[Similarity]] — never row-count-sized data). No approximation is
  * involved: the buckets only narrow where to look; the returned values
  * are exact data values.
  *
  * Bucket ids are `floor(double(v) / width)` with `width` a power of two:
  * DECIMAL(15,4)-range values are exactly representable in double and
  * division by 2^k is exact, so executor- and driver-side bucket
  * assignment agree bit-for-bit.
  */
object RobustStats {

  /** Exact lower median of `v` per group plus the search state reused by
    * downstream derivations (deviation buckets, threshold counts).
    *
    * @param n       group row count
    * @param med     the value at rank `(n+1) div 2` — an actual data value
    * @param bkt0    the bucket that contained the target rank
    * @param buckets all (bucketId, count) pairs for the group, ascending
    */
  case class MedianResult(n: Long, med: JBigDecimal, bkt0: Long,
      buckets: Seq[(Long, Long)])

  /** One pass: rows per (group, fixed-width bucket of `v`), collected.
    * Output cardinality is groups × (range/width) — domain-bounded.
    */
  def bucketCounts(df: DataFrame, grp: String, v: Column, width: Double)
      : Map[String, Seq[(Long, Long)]] =
    df.groupBy(col(grp), floor(v.cast("double") / lit(width)).as("bkt"))
      .agg(count(lit(1)).as("c")).collect()
      .groupBy(_.getString(0))
      .map { case (g, rows) =>
        g -> rows.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
      }

  /** One pass: per-value counts restricted to the given buckets per group,
    * collected. Output cardinality is buckets × (width/quantum) —
    * domain-bounded (`v` must be a DECIMAL column so values collect
    * exactly).
    */
  def valueCounts(df: DataFrame, grp: String, v: Column, width: Double,
      wanted: Map[String, Set[Long]]): Map[String, Seq[(JBigDecimal, Long)]] = {
    val bkt = floor(v.cast("double") / lit(width))
    val pred = wanted.map { case (g, bs) =>
      col(grp) === lit(g) && bkt.isin(bs.toSeq: _*)
    }.reduce(_ || _)
    df.filter(pred)
      .groupBy(col(grp), v.as("v")).agg(count(lit(1)).as("c")).collect()
      .groupBy(_.getString(0))
      .map { case (g, rows) =>
        g -> rows.map(r => (r.getDecimal(1), r.getLong(2))).sortBy(_._1).toSeq
      }
  }

  /** Driver walk: locate the lower-median target rank `(n+1) div 2` in a
    * group's ascending bucket counts → (bkt0, countBelowBkt0, target, n).
    */
  def rankTarget(buckets: Seq[(Long, Long)]): (Long, Long, Long, Long) = {
    val n = buckets.map(_._2).sum
    val target = (n + 1) / 2
    var cum = 0L
    val hit = buckets.find { case (_, c) =>
      val found = cum + c >= target
      if (!found) cum += c
      found
    }.getOrElse(throw new IllegalStateException("rank target outside histogram"))
    (hit._1, cum, target, n)
  }

  /** Driver walk: the value at `target` given ascending (value, count)
    * pairs that start at cumulative rank `cBefore`.
    */
  def pickAtRank(values: Seq[(JBigDecimal, Long)], cBefore: Long,
      target: Long): JBigDecimal = {
    var cum = cBefore
    values.find { case (_, c) =>
      val found = cum + c >= target
      if (!found) cum += c
      found
    }.map(_._1)
      .getOrElse(throw new IllegalStateException("rank target outside bucket"))
  }

  /** Exact lower median per group in two jobs (bucket pass + in-bucket
    * pass). See the object doc for the scale argument.
    */
  def exactLowerMedian(df: DataFrame, grp: String, v: Column, width: Double)
      : Map[String, MedianResult] = {
    val counts = bucketCounts(df, grp, v, width)
    val targets = counts.map { case (g, bs) => g -> rankTarget(bs) }
    val vals = valueCounts(df, grp, v, width,
      targets.map { case (g, (b0, _, _, _)) => g -> Set(b0) })
    targets.map { case (g, (b0, cBefore, target, n)) =>
      g -> MedianResult(n, pickAtRank(vals(g), cBefore, target), b0, counts(g))
    }
  }

  /** A per-group CASE literal: `when(grp = k, value(k))` chain. Injects
    * driver-computed group constants into a distributed expression without
    * a join (the groups-sized map is metadata).
    */
  def caseByGroup(grp: String, values: Map[String, Column]): Column =
    values.tail.foldLeft(when(col(grp) === lit(values.head._1), values.head._2)) {
      case (acc, (k, c)) => acc.when(col(grp) === lit(k), c)
    }
}
