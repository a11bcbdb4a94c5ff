package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
  * All per-row arithmetic runs on UNSCALED LONGS: the caller projects a
  * fixed-scale DECIMAL to `v · 10^scale` once at the scan, and every
  * downstream subtract / abs / bucket / group key is 64-bit integer math —
  * exact, codegen-friendly, and ~2× cheaper than the DECIMAL ops it
  * replaces (measured on the MAD pipeline: 1.45 s → see q_outlier_mad).
  * Bucket ids are `floor(u / widthU)` computed through double division,
  * exact because `u ≤ ~1e13 < 2^53` is exactly representable and a true
  * quotient within one bucket of an integer boundary is ≥ `1/widthU`
  * away — far beyond double's ~1e-9 ulp at these magnitudes — so the
  * rounded division can never cross the floor boundary.
  */
object RobustStats {

  /** Exact lower median of `u` per group plus the search state reused by
    * downstream derivations (deviation buckets, threshold counts).
    *
    * @param n       group row count
    * @param med     the unscaled value at rank `(n+1) div 2` — an actual
    *                data value
    * @param bkt0    the bucket that contained the target rank
    * @param buckets all (bucketId, count) pairs for the group, ascending
    */
  case class MedianResult(n: Long, med: Long, bkt0: Long,
      buckets: Seq[(Long, Long)])

  /** Integer bucket id of an unscaled-long column (see object doc for the
    * float-exactness argument). */
  def bucketOf(u: Column, widthU: Long): Column =
    floor(u.cast("double") / lit(widthU.toDouble)).cast("long")

  /** One pass: rows per (group, fixed-width bucket of `u`), collected.
    * Output cardinality is groups × (range/width) — domain-bounded.
    */
  def bucketCounts(df: DataFrame, grp: String, u: Column, widthU: Long)
      : Map[String, Seq[(Long, Long)]] =
    df.groupBy(col(grp), bucketOf(u, widthU).as("bkt"))
      .agg(count(lit(1)).as("c")).collect()
      .groupBy(_.getString(0))
      .map { case (g, rows) =>
        g -> rows.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
      }

  /** One pass: per-value counts restricted to the given buckets per group,
    * collected. Output cardinality is buckets × (width/quantum) —
    * domain-bounded.
    */
  def valueCounts(df: DataFrame, grp: String, u: Column, widthU: Long,
      wanted: Map[String, Set[Long]]): Map[String, Seq[(Long, Long)]] = {
    val bkt = bucketOf(u, widthU)
    val pred = wanted.map { case (g, bs) =>
      col(grp) === lit(g) && bkt.isin(bs.toSeq: _*)
    }.reduce(_ || _)
    df.filter(pred)
      .groupBy(col(grp), u.as("u")).agg(count(lit(1)).as("c")).collect()
      .groupBy(_.getString(0))
      .map { case (g, rows) =>
        g -> rows.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
      }
  }

  /** One pass: total WEIGHT per (group, fixed-width bucket of `u`) — the
    * weighted sibling of [[bucketCounts]] (`wt` must be a non-negative
    * integral column; a row with weight w counts as w copies of its
    * value). Same domain-bounded output contract.
    */
  def wBucketCounts(df: DataFrame, grp: String, u: Column, wt: Column,
      widthU: Long): Map[String, Seq[(Long, Long)]] =
    df.groupBy(col(grp), bucketOf(u, widthU).as("bkt"))
      .agg(sum(wt).as("c")).collect()
      .groupBy(_.getString(0))
      .map { case (g, rows) =>
        g -> rows.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
      }

  /** One pass: per-value total weights restricted to the given buckets per
    * group — the weighted sibling of [[valueCounts]]. */
  def wValueCounts(df: DataFrame, grp: String, u: Column, wt: Column,
      widthU: Long, wanted: Map[String, Set[Long]]): Map[String, Seq[(Long, Long)]] = {
    val bkt = bucketOf(u, widthU)
    val pred = wanted.map { case (g, bs) =>
      col(grp) === lit(g) && bkt.isin(bs.toSeq: _*)
    }.reduce(_ || _)
    df.filter(pred)
      .groupBy(col(grp), u.as("u")).agg(sum(wt).as("c")).collect()
      .groupBy(_.getString(0))
      .map { case (g, rows) =>
        g -> rows.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
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
  def pickAtRank(values: Seq[(Long, Long)], cBefore: Long,
      target: Long): Long = {
    var cum = cBefore
    values.find { case (_, c) =>
      val found = cum + c >= target
      if (!found) cum += c
      found
    }.map(_._1)
      .getOrElse(throw new IllegalStateException("rank target outside bucket"))
  }

  /** Driver walk: locate an ARBITRARY target rank in ascending bucket
    * counts → (bucket, countBelowBucket). `target` must be in [1, n].
    */
  def rankBucket(buckets: Seq[(Long, Long)], target: Long): (Long, Long) = {
    var cum = 0L
    val hit = buckets.find { case (_, c) =>
      val found = cum + c >= target
      if (!found) cum += c
      found
    }.getOrElse(throw new IllegalStateException("rank target outside histogram"))
    (hit._1, cum)
  }

  /** Exact value at a caller-chosen rank per group — the grouped
    * order-statistic without a sort (two jobs: bucket histogram +
    * in-bucket value counts; see the object doc for the scale argument).
    * Groups absent from `targets`, and targets outside [1, n], are
    * dropped. Returns per group the value `v` at the rank and the exact
    * `#{u < v}` (callers doing exact-quota selection need the tie split).
    */
  def exactRankValue(df: DataFrame, grp: String, u: Column, widthU: Long,
      targets: Map[String, Long]): Map[String, (Long, Long)] = {
    val counts = bucketCounts(df, grp, u, widthU)
    val wanted = targets.flatMap { case (g, t) =>
      counts.get(g).filter(bs => t >= 1 && t <= bs.map(_._2).sum)
        .map(bs => g -> rankBucket(bs, t))
    }
    if (wanted.isEmpty) return Map.empty
    val vals = valueCounts(df, grp, u, widthU,
      wanted.map { case (g, (b0, _)) => g -> Set(b0) })
    wanted.map { case (g, (b0, cBefore)) =>
      val inBkt = vals(g)
      val v = pickAtRank(inBkt, cBefore, targets(g))
      // #{u < v} = histogram prefix below b0 + in-bucket values below v
      val below = cBefore + inBkt.takeWhile(_._1 < v).map(_._2).sum
      g -> (v, below)
    }
  }

  /** Exact values at MULTIPLE caller-chosen ranks per group in two jobs
    * total (one bucket histogram + one value-count pass over the union of
    * located buckets). `ranksOf` maps a group's row count n to its target
    * ranks (each must be in [1, n]) — so callers can ask for quantile
    * grids without a prior count job. Returns the values in `ranksOf`
    * order. Safe for negative unscaled values: the in-bucket filter uses
    * Math.floorDiv, matching [[bucketOf]]'s floor semantics (truncating
    * `/` would disagree below zero and leave the filter empty).
    */
  def rankValues(df: DataFrame, grp: String, u: Column, widthU: Long,
      ranksOf: Long => Seq[Long]): Map[String, Seq[Long]] = {
    val counts = bucketCounts(df, grp, u, widthU)
    val located = counts.map { case (g, bs) =>
      val n = bs.map(_._2).sum
      g -> ranksOf(n).map(t => t -> rankBucket(bs, t))
    }
    val vals = valueCounts(df, grp, u, widthU,
      located.map { case (g, ls) => g -> ls.map(_._2._1).toSet })
    located.map { case (g, ls) =>
      g -> ls.map { case (t, (b0, cBefore)) =>
        // floorDiv, NOT truncating /: bucket ids come from bucketOf
        // (floor of a double division), and for negative unscaled values
        // trunc and floor disagree (u = -1, width 10: 0 vs -1) — the
        // filter would come up empty and pickAtRank would throw
        pickAtRank(vals(g).filter(v => Math.floorDiv(v._1, widthU) == b0),
          cBefore, t)
      }
    }
  }

  /** [[rankValues]] for SEVERAL metrics of ONE frame in two jobs TOTAL —
    * the fused form a multi-metric quantiler (RFM's three quartile sets)
    * should run: the per-metric frames stack via one explode (metric
    * name becomes the group key, each metric keeps its own bucket
    * width), so the bucket histogram for every metric rides ONE
    * aggregation job and the in-bucket value pass rides ONE more —
    * instead of 2 jobs PER metric (q_rfm_segments: 6 driver-synchronous
    * jobs → 2; at scale, k metrics cost k full passes → 1 stacked pass
    * of the same total row volume, minus (k−1) per-job fixed costs and
    * (k−1) scans of the source frame). Result values are identical to k
    * independent [[rankValues]] calls (RobustStatsSpec pins it).
    *
    * `metrics`: (name, unscaled-long column, bucket width); names must
    * be unique. `ranksOf` maps each metric's row count n to its target
    * ranks, as in [[rankValues]]. Returns name → values in ranksOf
    * order.
    */
  def rankValuesMulti(df: DataFrame,
      metrics: Seq[(String, Column, Long)],
      ranksOf: Long => Seq[Long]): Map[String, Seq[Long]] = {
    require(metrics.map(_._1).distinct.size == metrics.size,
      "rankValuesMulti: metric names must be unique")
    val widths = metrics.map { case (g, _, w) => g -> w }.toMap
    val stacked = df.select(explode(array(metrics.map { case (g, u, w) =>
      struct(lit(g).as("g"), u.cast("long").as("u"),
        bucketOf(u, w).as("bkt"))
    }: _*)).as("m")).select(col("m.g").as("g"), col("m.u").as("u"),
      col("m.bkt").as("bkt"))
    // job 1: every metric's bucket histogram in one aggregation
    val counts = stacked.groupBy(col("g"), col("bkt"))
      .agg(count(lit(1)).as("c")).collect()
      .groupBy(_.getString(0))
      .map { case (g, rows) =>
        g -> rows.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
      }
    val located = counts.map { case (g, bs) =>
      val n = bs.map(_._2).sum
      g -> ranksOf(n).map(t => t -> rankBucket(bs, t))
    }
    // job 2: every metric's in-bucket value counts in one pass
    val pred = located.map { case (g, ls) =>
      col("g") === lit(g) && col("bkt").isin(ls.map(_._2._1).distinct: _*)
    }.reduce(_ || _)
    val vals = stacked.filter(pred)
      .groupBy(col("g"), col("u")).agg(count(lit(1)).as("c")).collect()
      .groupBy(_.getString(0))
      .map { case (g, rows) =>
        g -> rows.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
      }
    located.map { case (g, ls) =>
      g -> ls.map { case (t, (b0, cBefore)) =>
        pickAtRank(vals(g).filter(v => Math.floorDiv(v._1, widths(g)) == b0),
          cBefore, t)
      }
    }
  }

  /** Exact lower median per group in two jobs (bucket pass + in-bucket
    * pass). See the object doc for the scale argument.
    */
  def exactLowerMedian(df: DataFrame, grp: String, u: Column, widthU: Long)
      : Map[String, MedianResult] = {
    val counts = bucketCounts(df, grp, u, widthU)
    val targets = counts.map { case (g, bs) => g -> rankTarget(bs) }
    val vals = valueCounts(df, grp, u, widthU,
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

  /** Per-group exact median, exact MAD, and exact `2·dev > 3·mad` outlier
    * count — in TWO cluster passes total.
    *
    * The four-pass shape (median buckets → median values → dev buckets →
    * dev values) re-scans the fact once per level because the deviation
    * `|u − med|` seems to need the exact median first. It doesn't: with
    * `med = m0 + δ` (`m0 = b0·W` the median bucket's lower edge,
    * `δ ∈ [0, W)`), every u-bucket range this algorithm must inspect can
    * be expressed as `b0 ± k` offsets that hold for ALL δ. So pass 1's
    * (group, bucket) histogram already determines — without knowing med —
    *
    *   - `b0`: the bucket holding the median rank;
    *   - a bracket `[jlo−1, jhi]·W` for the MAD, from conservative counts
    *     `C_min(j) ≤ #{|u−med| ≤ jW} ≤ C_max(j)` whose uncertainty is
    *     confined to the two end buckets `b0±j`;
    *   - a conservative bucket cover for the `med ± 1.5·mad` threshold,
    *     via interval arithmetic over `δ ∈ [0,W)` and the MAD bracket.
    *
    * Pass 2 collects per-VALUE counts for just that bucket set (domain-
    * bounded: ~15–25 buckets × width/quantum). The driver then resolves
    * everything exactly: median from b0's values + the histogram prefix;
    * MAD by a rank walk over `|u−med|` of the bracket values (the walk's
    * starting cumulative count combines full inner buckets from pass 1
    * with exact partial-bucket counts from the collected values); the
    * outlier count as full-bucket sums for buckets provably outside
    * `med ± 1.5·mad` plus exact tests on the collected boundary buckets.
    * All arithmetic is 64-bit integer on unscaled values — exact.
    *
    * Scale shape: two embarrassingly parallel scans, each a map-side-
    * combinable aggregate with domain-bounded output; nothing row-count-
    * sized crosses an exchange, no window, no join. Halves the wall time
    * of the four-pass shape (sf0.1 warm: 1.45 s → 0.75 s).
    */
  def madProfile(df: DataFrame, grp: String, u: Column, widthU: Long)
      : Map[String, (Long, Long, Long, Long)] = {
    val W = widthU
    // ---- pass 1: (group, bucket) histogram --------------------------------
    val counts = bucketCounts(df, grp, u, W)
    val hist: Map[String, Map[Long, Long]] =
      counts.map { case (g, bs) => g -> bs.toMap }
    val targets = counts.map { case (g, bs) => g -> rankTarget(bs) }

    // ---- driver: derive the bucket set to collect, per group --------------
    case class Cover(b0: Long, jlo: Long, jhi: Long, buckets: Set[Long])
    val covers: Map[String, Cover] = targets.map { case (g, (b0, _, target, _)) =>
      val h = hist(g)
      def c(k: Long): Long = h.getOrElse(k, 0L)
      // C_min(j) = mass in buckets strictly inside b0±j — a lower bound on
      // #{dev ≤ jW} for every δ; C_max adds the two uncertain end buckets.
      // jlo = min{j : C_max(j) ≥ target} ⇒ mad > (jlo−1)W;
      // jhi = min{j : C_min(j) ≥ target} ⇒ mad ≤ jhi·W.
      var inner = c(b0) // C_min(1)
      var j = 1L
      var jloOpt = if (c(b0) >= target) Some(0L) else None // C_max(0) = c(b0)
      var jhiOpt: Option[Long] = None
      val kMax = h.keys.max - h.keys.min + 1
      while (jhiOpt.isEmpty && j <= kMax + 2) {
        if (inner >= target) jhiOpt = Some(j) // C_min(j) ≥ target
        else {
          val cmax = inner + c(b0 - j) + c(b0 + j) // C_max(j)
          if (jloOpt.isEmpty && cmax >= target) jloOpt = Some(j)
          inner = cmax // = C_min(j+1)
          j += 1
        }
      }
      val jhi = jhiOpt.getOrElse(
        throw new IllegalStateException("MAD rank outside histogram"))
      val jlo = jloOpt.get // exists: jloOpt set no later than jhiOpt
      // MAD bracket buckets: dev ∈ [(jlo−1)W, jhi·W] ⇒ u-buckets
      // [b0−jhi, b0−jlo+1] ∪ [b0+jlo−1, b0+jhi] for all δ; plus b0 for the
      // exact median
      val madB = ((b0 - jhi) to (b0 - jlo + 1)) ++ ((b0 + jlo - 1) to (b0 + jhi))
      // threshold t = 1.5·mad ∈ [tLoB·W, tHiB·W] (mad bracketed above):
      // over δ ∈ [0,W) the bucket holding med−t lies in [b0−tHiB, b0−tLoB]
      // and the one holding med+t in [b0+tLoB, b0+tHiB] — interval
      // arithmetic on med ∈ [m0, m0+W), t ∈ [tLoB·W, tHiB·W]; any slip is
      // caught by the covered-bucket require below, not silently absorbed
      val tLoB = 3 * math.max(0L, jlo - 1) / 2
      val tHiB = (3 * jhi + 1) / 2
      val thrB = ((b0 - tHiB) to (b0 - tLoB)) ++ ((b0 + tLoB) to (b0 + tHiB))
      g -> Cover(b0, jlo, jhi, (madB ++ thrB :+ b0).toSet)
    }

    // ---- pass 2: value counts over the covered buckets --------------------
    val vals: Map[String, Seq[(Long, Long)]] =
      valueCounts(df, grp, u, W, covers.map { case (g, cv) => g -> cv.buckets })

    // ---- driver: resolve exactly ------------------------------------------
    targets.map { case (g, (b0, cBelowB0, target, n)) =>
      val h = hist(g)
      def c(k: Long): Long = h.getOrElse(k, 0L)
      val Cover(_, jlo, jhi, covered) = covers(g)
      val vs = vals(g) // ascending (value, count)
      def bkt(v: Long): Long = v / W // u ≥ 0: trunc == floor
      // exact median: histogram prefix + b0's values
      val med = pickAtRank(vs.filter(v => bkt(v._1) == b0), cBelowB0, target)
      // cBefore = #{dev < D0}, D0 = max(0, jlo−1)·W: full buckets strictly
      // inside the open interval (med−D0, med+D0) from pass 1, exact
      // partials from the collected boundary buckets
      val d0 = math.max(0L, jlo - 1) * W
      val cBefore = if (d0 == 0) 0L
      else {
        val loBkt = (med - d0) / W // = b0 − (jlo−1) — collected
        val hiBkt = (med + d0) / W // = b0 + (jlo−1) — collected
        require(covered(loBkt) && covered(hiBkt), "cBefore boundary bucket not covered")
        val full = ((loBkt + 1) until hiBkt).map(c).sum
        val partial = vs.collect {
          case (v, k) if (bkt(v) == loBkt || bkt(v) == hiBkt) &&
            v > med - d0 && v < med + d0 && !(bkt(v) > loBkt && bkt(v) < hiBkt) => k
        }.sum
        // values in buckets strictly between lo and hi are already in
        // `full` — the collect above excludes them
        full + partial
      }
      // exact MAD: rank walk over dev ≥ D0 of the bracket buckets' values
      val walkBuckets = ((b0 - jhi) to (b0 - jlo + 1)).toSet ++
        ((b0 + jlo - 1) to (b0 + jhi)).toSet + b0
      val devCountsW = vs.iterator
        .filter { case (v, _) => walkBuckets(bkt(v)) }
        .map { case (v, k) => (math.abs(v - med), k) }
        .filter(_._1 >= d0)
        .toSeq.groupBy(_._1).map { case (d, xs) => (d, xs.map(_._2).sum) }
        .toSeq.sortBy(_._1)
      val mad = pickAtRank(devCountsW, cBefore, target)
      // the coverage proofs above rely on the bracket — fail loudly rather
      // than return a silently-wrong pick if it is ever violated
      require(mad > d0 - 1 && mad <= jhi * W,
        s"MAD $mad outside bracket ($d0, ${jhi * W}] (group $g)")
      // outliers: 2·dev > 3·mad ⟺ 2u < 2·med−3·mad ∨ 2u > 2·med+3·mad.
      // Buckets fully outside count from pass 1; boundary buckets exactly
      // from collected values (assert they are covered).
      val lo2 = 2 * med - 3 * mad
      val hi2 = 2 * med + 3 * mad
      def fullyOut(k: Long): Boolean = 2 * (k * W + W - 1) < lo2 || 2 * (k * W) > hi2
      def fullyIn(k: Long): Boolean = 2 * (k * W) >= lo2 && 2 * (k * W + W - 1) <= hi2
      val fullOut = h.iterator.collect { case (k, cnt) if fullyOut(k) => cnt }.sum
      val boundary = h.keysIterator.filter(k => !fullyOut(k) && !fullyIn(k)).toSeq
      boundary.foreach { k =>
        require(covered(k), s"outlier boundary bucket $k not covered (group $g)")
      }
      val bSet = boundary.toSet
      val partialOut = vs.collect {
        case (v, k) if bSet(bkt(v)) && (2 * v < lo2 || 2 * v > hi2) => k
      }.sum
      g -> (n, med, mad, fullOut + partialOut)
    }
  }
}
