package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic dataset mixing / rebalancing — the "sample each source to
  * a target quota" step of a training-data pipeline (down-sample dominant
  * languages or sources to a prescribed mixture), reproducible across runs
  * and engines because selection is by a content hash, not by rand().
  *
  * Per group g, the selected rows are exactly the `quota(g)` smallest by
  * `(hash, tieKey)` — a grouped order-statistic. The scale shape AVOIDS
  * the naive `row_number() OVER (PARTITION BY group ORDER BY hash)` plan,
  * which funnels the whole table through |groups| sort partitions (the
  * same single-task straggler the MAD rewrite killed — see
  * [[RobustStats]]). Instead:
  *
  *   1. ONE bucket-histogram pass over the hash domain (domain-bounded
  *      output: groups × 1024 buckets for the 32-bit universe),
  *   2. ONE in-bucket value-count pass that resolves the exact quota-th
  *      hash `h*(g)` and the exact `#{hash < h*}` per group,
  *   3. ONE scan-stage filter `hash < h*` plus a rank window over the
  *      TIE rows only (`hash = h*` — a handful of rows, never the table).
  *
  * Every cluster-side step is an embarrassingly parallel scan + a
  * combinable aggregate with bounded output; the driver only touches
  * histograms. No full-table sort, no data-sized shuffle at any point.
  */
object Mixing {

  private val W = 1L << 22 // 1024 buckets over the [0, 2^32) hash universe

  /** Keep exactly `min(quota(g), n_g)` rows per group — the quota-smallest
    * by `(hash, tieKey)`. Groups missing from `quotas` are dropped.
    *
    * `hash` must be a deterministic non-null column in [0, 2^32) (use
    * [[TextAnalysis.tokenHash32]] of a key for engine-portable selection);
    * `tieKey` must be unique per row within a group.
    */
  def quotaSample(df: DataFrame, grp: String, hash: Column, tieKey: Column,
      quotas: Map[String, Long]): DataFrame = {
    val h = df.withColumn("__h", hash)
    quotaSampleWith(h, grp, tieKey, quotas,
      RobustStats.bucketCounts(h, grp, col("__h"), W))
  }

  /** Equal-representation rebalance: budget = `n_total · num / den` rows,
    * split evenly across the observed groups, each capped by availability
    * (no redistribution of unused capacity — deterministic and
    * SQL-replayable: quota_g = min(n_g, budget div |groups|)).
    */
  def rebalanceEqual(df: DataFrame, grp: String, hash: Column, tieKey: Column,
      num: Long, den: Long): DataFrame = {
    val h = df.withColumn("__h", hash)
    val counts = RobustStats.bucketCounts(h, grp, col("__h"), W)
    val nG = counts.map { case (g, bs) => g -> bs.map(_._2).sum }
    val perG = nG.values.sum * num / den / nG.size
    quotaSampleWith(h, grp, tieKey, nG.map { case (g, n) => g -> math.min(n, perG) },
      counts)
  }

  /** Temperature-flattened rebalance (the multilingual α-sampling rule of
    * mC4 / XLM-R with α = 1/2): group g's share of the `n_total · num /
    * den` budget is proportional to `√n_g` instead of `n_g`, so dominant
    * languages are down-weighted and tail languages up-weighted relative
    * to natural sampling, each capped by availability.
    *
    * quota_g = min(n_g, budget · w_g div Σw_g) with w_g = ⌊√n_g⌋ — the
    * integer square root keeps every quota a pure integer computation:
    * `sqrt` is IEEE-correctly-rounded on both engines and ⌊√n⌋ cannot
    * misround for n ≤ 2^52 (the nearest double to √(k²−1) is below k for
    * all k < 2^25 since the gap 1/(2k) exceeds the ulp k·2^−52), so the
    * SQL twin `floor(sqrt(n))` lands on the same integer. Same two-pass
    * histogram rank search as [[rebalanceEqual]] — no full-table sort.
    */
  def rebalanceTemperature(df: DataFrame, grp: String, hash: Column,
      tieKey: Column, num: Long, den: Long): DataFrame = {
    val h = df.withColumn("__h", hash)
    val counts = RobustStats.bucketCounts(h, grp, col("__h"), W)
    val nG = counts.map { case (g, bs) => g -> bs.map(_._2).sum }
    val w = nG.map { case (g, n) => g -> math.sqrt(n.toDouble).toLong }
    val wSum = w.values.sum
    val budget = nG.values.sum * num / den
    quotaSampleWith(h, grp, tieKey,
      nG.map { case (g, n) => g -> math.min(n, budget * w(g) / wSum) }, counts)
  }

  /** Shared core over a precomputed pass-1 histogram (so rebalanceEqual
    * pays two passes total, not three). `df` already carries `__h`. */
  private def quotaSampleWith(df: DataFrame, grp: String, tieKey: Column,
      quotas: Map[String, Long], counts: Map[String, Seq[(Long, Long)]])
      : DataFrame = {
    val nG = counts.map { case (g, bs) => g -> bs.map(_._2).sum }
    // groups kept whole (quota >= n) need no rank search
    val whole = nG.keySet.filter(g => quotas.getOrElse(g, 0L) >= nG(g))
    val searched = quotas.collect {
      case (g, q) if nG.contains(g) && q >= 1 && q < nG(g) => g -> q
    }
    val thresholds: Map[String, (Long, Long)] = if (searched.isEmpty) Map.empty
    else {
      val rb = searched.map { case (g, q) => g -> RobustStats.rankBucket(counts(g), q) }
      val vals = RobustStats.valueCounts(df, grp, col("__h"), W,
        rb.map { case (g, (b0, _)) => g -> Set(b0) })
      searched.map { case (g, q) =>
        val (_, cBefore) = rb(g)
        val inBkt = vals(g)
        val v = RobustStats.pickAtRank(inBkt, cBefore, q)
        val below = cBefore + inBkt.takeWhile(_._1 < v).map(_._2).sum
        g -> (v, q - below) // (quota-th hash, rows to take from its ties)
      }
    }
    def orFalse(ps: Iterable[Column]): Column =
      ps.reduceOption(_ || _).getOrElse(lit(false))
    val mainPred = orFalse(
      whole.map(g => col(grp) === lit(g)) ++
        thresholds.map { case (g, (v, _)) => col(grp) === lit(g) && col("__h") < lit(v) })
    val tiePred = orFalse(
      thresholds.map { case (g, (v, _)) => col(grp) === lit(g) && col("__h") === lit(v) })
    val tieQuota = if (thresholds.isEmpty) lit(0L)
    else RobustStats.caseByGroup(grp, thresholds.map { case (g, (_, t)) => g -> lit(t) })
    val ties = df.filter(tiePred)
      .withColumn("__rn", row_number().over(Window.partitionBy(col(grp)).orderBy(tieKey)))
      .filter(col("__rn") <= tieQuota)
      .drop("__rn")
    df.filter(mainPred).unionByName(ties).drop("__h")
  }
}
