package graft.queries

import graft.QueryDef
import graft.ops.GridMemo.MemoOps
import graft.ops.{RobustStats, Tables, TextAnalysis}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-2 analytic breadth: statistical aggregates, argmin/argmax,
  * ranking-window family, RANGE frames, grouping sets + IN-subqueries via
  * the spark.sql front-end, full outer join, unpivot, positional explode,
  * bitwise functions, and embedding normalization/quantization.
  *
  * Numeric discipline follows CoreQueries: every double SUM routes through
  * DECIMAL so partial-aggregation order can't split the engines, and every
  * derived double (stddev, corr, norms) is computed from those exact sums
  * with an identical expression tree on both sides, then floor-rounded to
  * 6 digits.
  */
object AnalyticQueries {

  private def dec(c: Column): Column = c.cast(DecimalType(12, 4))

  /** The shared floor-form cross-engine rounding (one definition repo-wide
    * so the discipline cannot drift). */
  private def r6(c: Column): Column = TextAnalysis.round6(c)

  /** Memoized daily-revenue mean-deviation grid — q_acf_table and
    * q_ljung_box derive from the IDENTICAL (day, dev = n·cents − Σcents)
    * frame, so the orders scan + checkpoint run once per session (the
    * minhashPairsCache pattern; calendar-grid-sized, cheap to pin). */
  private val devGridCache =
    new graft.ops.SessionCache[String, org.apache.spark.sql.DataFrame]("dev-grid:")

  private def dailyDevGrid(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    devGridCache.getOrElseUpdate(spark, dir, {
      val d380 = DecimalType(38, 0)
      val daily = Tables.orders(spark, dir)
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
          .as("c"))
      val st = daily.agg(count(lit(1)).as("n"), sum(col("c")).as("s"))
      daily.crossJoin(broadcast(st))
        .select(col("day"),
          (col("c").cast(d380) * col("n") - col("s")).as("dev"))
        .localCheckpoint(true)
    })

  // --- statistical aggregates from exact decimal sums -----------------------

  /** stddev/variance/correlation per return flag — computed from DECIMAL
    * power sums (not the builtin stddev/corr, whose double partials are
    * accumulation-order-dependent and diverge across engines). One shuffle,
    * all moments in a single aggregate pass.
    */
  private val statsAgg = QueryDef(
    fn = (spark, dir) => {
      val li = Tables.lineitem(spark, dir)
      val agg = li.groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          sum(dec(col("l_quantity"))).as("sx"),
          sum(dec(col("l_quantity")) * dec(col("l_quantity"))).as("sxx"),
          sum(dec(col("l_extendedprice"))).as("sy"),
          sum(dec(col("l_extendedprice")) * dec(col("l_extendedprice"))).as("syy"),
          sum(dec(col("l_quantity")) * dec(col("l_extendedprice"))).as("sxy"))
      val n = col("n").cast("double")
      val sx = col("sx").cast("double"); val sxx = col("sxx").cast("double")
      val sy = col("sy").cast("double"); val syy = col("syy").cast("double")
      val sxy = col("sxy").cast("double")
      agg.select(
          col("l_returnflag"),
          col("n"),
          r6(sx / n).as("mean_qty"),
          r6(sqrt((sxx - sx * sx / n) / (n - lit(1.0)))).as("stddev_qty"),
          r6((sxx - sx * sx / n) / (n - lit(1.0))).as("var_qty"),
          r6((n * sxy - sx * sy) /
            (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))).as("corr_qty_price"))
        .orderBy("l_returnflag")
    },
    oracle = Some(
      // factor casts are DECIMAL(19,4) so the product is int128-backed
      // (int64 DECIMAL(24,8) products overflow in DuckDB); every sum
      // round-trips decimal -> VARCHAR -> DOUBLE because DuckDB's direct
      // big-decimal->double cast double-rounds once the scaled integer
      // passes 2^53, while strtod (like BigDecimal.doubleValue) rounds once
      """WITH s AS (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS sx,
        |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(19,4))
        |             * CAST(l_quantity AS DECIMAL(19,4))) AS VARCHAR) AS DOUBLE) AS sxx,
        |    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS sy,
        |    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,4))
        |             * CAST(l_extendedprice AS DECIMAL(19,4))) AS VARCHAR) AS DOUBLE) AS syy,
        |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(19,4))
        |             * CAST(l_extendedprice AS DECIMAL(19,4))) AS VARCHAR) AS DOUBLE) AS sxy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  floor((sx / n) * 1000000.0 + 0.5) / 1000000.0 AS mean_qty,
        |  floor(sqrt((sxx - sx * sx / n) / (n - 1.0)) * 1000000.0 + 0.5) / 1000000.0 AS stddev_qty,
        |  floor(((sxx - sx * sx / n) / (n - 1.0)) * 1000000.0 + 0.5) / 1000000.0 AS var_qty,
        |  floor(((n * sxy - sx * sy)
        |         / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)))
        |        * 1000000.0 + 0.5) / 1000000.0 AS corr_qty_price
        |FROM s ORDER BY l_returnflag""".stripMargin))

  // --- robust-stats outlier ranking ----------------------------------------

  /** Per-group z-score outlier detection: the 50 most anomalous lineitems
    * per return flag by |(x - mean) / stddev|, with group moments from the
    * same exact DECIMAL power sums as statsAgg. Ranking ties (l_quantity
    * is discrete, so equal values share a z exactly) are broken on the
    * unique (l_orderkey, l_linenumber) key — the top-50 cutoff is a total
    * order on both engines. Scale shape: |z| depends only on the
    * BOUNDED-domain l_quantity, so ONE map-side-combinable
    * (flag, quantity) histogram pass — ≤ flags × 50 rows, collected
    * driver-side like [[RobustStats]]' bucket counts — yields BOTH the
    * exact group moments (Σ v·c over BigDecimals ≡ the row sums, exactly;
    * the double math then replicates the oracle's operation order) and
    * the top-k quantity prefilter: a quantity can host a rank-≤50 row
    * only if quantities with strictly greater |z| hold fewer than 50 rows
    * between them. The second (and last) pass scans the fact with that
    * `isin` prefilter and CASE-literal moments, so the ranking window and
    * Spark's map-side WindowGroupLimit only ever see the survivor sliver.
    * No full-table sort lands in the 3-partition flag exchange.
    */
  private val outlierZscore = QueryDef(
    fn = (spark, dir) => {
      val li = Tables.lineitem(spark, dir)
      val hist: Map[String, Seq[(Double, Long)]] =
        li.groupBy(col("l_returnflag"), col("l_quantity"))
          .agg(count(lit(1)).as("c")).collect()
          .groupBy(_.getString(0))
          .map { case (g, rows) =>
            g -> rows.map(r => (r.getDouble(1), r.getLong(2))).toSeq
          }
      val moments = hist.map { case (g, qs) =>
        // exact decimal power sums (order-independent), then the oracle's
        // double expression tree verbatim
        val bd = (d: Double) =>
          java.math.BigDecimal.valueOf(d).setScale(4, java.math.RoundingMode.HALF_UP)
        val n = qs.map(_._2).sum
        val sx = qs.map { case (q, c) =>
          bd(q).multiply(new java.math.BigDecimal(c)) }
          .reduce(_.add(_)).doubleValue
        val sxx = qs.map { case (q, c) =>
          bd(q).multiply(bd(q)).multiply(new java.math.BigDecimal(c)) }
          .reduce(_.add(_)).doubleValue
        val nd = n.toDouble
        g -> (sx / nd, math.sqrt((sxx - sx * sx / nd) / (nd - 1.0)))
      }
      val keep: Map[String, Seq[Double]] = hist.map { case (g, qs) =>
        val (m, sd) = moments(g)
        // merge quantities with identical |z| (symmetric around the mean)
        // so the running count is over STRICTLY greater scores
        val byScore = qs.groupBy { case (q, _) => math.abs((q - m) / sd) }
          .map { case (s, xs) => (s, xs.map(_._2).sum, xs.map(_._1)) }
          .toSeq.sortBy(-_._1)
        var sg = 0L
        g -> byScore.takeWhile { case (_, c, _) =>
          val in = sg < 50; sg += c; in
        }.flatMap(_._3)
      }
      val mCase = RobustStats.caseByGroup("l_returnflag",
        moments.map { case (g, (m, _)) => g -> lit(m) })
      val sdCase = RobustStats.caseByGroup("l_returnflag",
        moments.map { case (g, (_, sd)) => g -> lit(sd) })
      val pred = keep.map { case (g, qs) =>
        col("l_returnflag") === lit(g) && col("l_quantity").isin(qs: _*)
      }.reduce(_ || _)
      val z = (col("l_quantity") - mCase) / sdCase
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(abs(z).desc, col("l_orderkey"), col("l_linenumber"))
      li.filter(pred)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 50)
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), r6(z).as("z"))
        .orderBy("l_returnflag", "l_orderkey", "l_linenumber")
    },
    oracle = Some(
      """WITH s AS (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS sx,
        |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(19,4))
        |             * CAST(l_quantity AS DECIMAL(19,4))) AS VARCHAR) AS DOUBLE) AS sxx
        |  FROM lineitem GROUP BY l_returnflag),
        |m AS (SELECT l_returnflag, sx / n AS m,
        |        sqrt((sxx - sx * sx / n) / (n - 1.0)) AS sd FROM s),
        |r AS (
        |  SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
        |    (l_quantity - m) / sd AS z,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY abs((l_quantity - m) / sd) DESC, l_orderkey, l_linenumber) AS rn
        |  FROM lineitem JOIN m USING (l_returnflag))
        |SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
        |  floor(z * 1000000.0 + 0.5) / 1000000.0 AS z
        |FROM r WHERE rn <= 50
        |ORDER BY l_returnflag, l_orderkey, l_linenumber""".stripMargin))

  // --- argmin / argmax ------------------------------------------------------

  /** max_by/min_by keyed on the unique o_orderkey (a non-unique ordering
    * key would make the winner engine-dependent). */
  private val minmaxBy = QueryDef(
    fn = (spark, dir) =>
      Tables.orders(spark, dir)
        .groupBy(col("o_custkey"))
        .agg(
          max_by(col("o_orderstatus"), col("o_orderkey")).as("latest_status"),
          min_by(col("o_orderpriority"), col("o_orderkey")).as("first_priority"),
          max(col("o_orderkey")).as("max_key"),
          count(lit(1)).as("n_orders"))
        .orderBy("o_custkey"),
    oracle = Some(
      """SELECT o_custkey,
        |  max_by(o_orderstatus, o_orderkey) AS latest_status,
        |  min_by(o_orderpriority, o_orderkey) AS first_priority,
        |  MAX(o_orderkey) AS max_key,
        |  COUNT(*) AS n_orders
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin))

  // --- ranking window family ------------------------------------------------

  /** dense_rank / ntile / percent_rank / cume_dist / lead / first_value /
    * nth_value under one total order (totalprice desc, key asc — unique, so
    * every function is deterministic). percent_rank and cume_dist are exact
    * integer ratios divided once in double: identical across engines.
    */
  private val windowRanks = QueryDef(
    fn = (spark, dir) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(spark, dir)
        .filter(col("o_orderstatus") === "P")
        .select(
          col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
          dense_rank().over(w).as("drank"),
          ntile(4).over(w).as("quartile"),
          r6(percent_rank().over(w)).as("prank"),
          r6(cume_dist().over(w)).as("cdist"),
          lead(col("o_orderkey"), 1).over(w).as("next_key"),
          first_value(col("o_orderkey")).over(w).as("top_key"),
          nth_value(col("o_orderkey"), 3).over(w).as("third_key"))
        .orderBy("o_orderpriority", "drank", "o_orderkey")
    },
    oracle = Some(
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
        |  CAST(dense_rank() OVER w AS INTEGER) AS drank,
        |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        |  floor(percent_rank() OVER w * 1000000.0 + 0.5) / 1000000.0 AS prank,
        |  floor(cume_dist() OVER w * 1000000.0 + 0.5) / 1000000.0 AS cdist,
        |  lead(o_orderkey, 1) OVER w AS next_key,
        |  first_value(o_orderkey) OVER w AS top_key,
        |  nth_value(o_orderkey, 3) OVER w AS third_key
        |FROM orders
        |WHERE o_orderstatus = 'P'
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice DESC, o_orderkey ASC)
        |ORDER BY o_orderpriority, drank, o_orderkey""".stripMargin))

  // --- RANGE frame (value-bounded, not row-bounded) -------------------------

  /** Trailing 5-minute event stats per user: RANGE BETWEEN over the exact
    * integer microsecond timestamp. Peers (equal ts) enter the frame
    * together in both engines, so ties cannot split the result.
    */
  private val rangeWindow = QueryDef(
    fn = (spark, dir) => {
      val ev = Tables.events(spark, dir)
        .select(col("event_id"), col("user_id"),
          expr("ts_ns div 1000").as("ts_us"), col("value"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
        .rangeBetween(-300000000L, 0L) // 5 min in micros
      ev.select(
          col("event_id"), col("user_id"), col("ts_us"),
          count(lit(1)).over(w).as("n_5min"),
          sum(dec(col("value"))).over(w).cast("double").as("sum_5min"))
        .orderBy("event_id")
    },
    oracle = Some(
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |  COUNT(*) OVER w AS n_5min,
        |  CAST(SUM(CAST(value AS DECIMAL(12,4))) OVER w AS DOUBLE) AS sum_5min
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |             RANGE BETWEEN 300000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin))

  // --- grouping sets via the SQL front-end ----------------------------------

  /** GROUPING SETS with grouping() markers, entered through spark.sql — the
    * SQL surface twin of the rollup/cube DataFrame queries. */
  private val groupingSets = QueryDef(
    fn = (spark, dir) => {
      Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem_gsets")
      spark.sql(
        """SELECT l_returnflag, l_linestatus,
          |  CAST(grouping(l_returnflag) AS INT) AS g_flag,
          |  CAST(grouping(l_linestatus) AS INT) AS g_status,
          |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sum_qty,
          |  COUNT(*) AS n
          |FROM lineitem_gsets
          |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
          |ORDER BY g_flag, g_status, l_returnflag, l_linestatus""".stripMargin)
    },
    oracle = Some(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) AS INT) AS g_flag,
        |  CAST(grouping(l_linestatus) AS INT) AS g_status,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY g_flag, g_status, l_returnflag, l_linestatus""".stripMargin))

  /** IN / NOT IN subqueries through spark.sql (both keys are non-null, so
    * the NOT IN null trap cannot bite — documented, not dodged silently). */
  private val inSubquery = QueryDef(
    fn = (spark, dir) => {
      Tables.orders(spark, dir).createOrReplaceTempView("orders_insub")
      Tables.customer(spark, dir).createOrReplaceTempView("customer_insub")
      spark.sql(
        """SELECT o_orderkey, o_custkey, o_orderstatus
          |FROM orders_insub
          |WHERE o_custkey IN (SELECT c_custkey FROM customer_insub
          |                    WHERE c_mktsegment = 'BUILDING')
          |  AND o_custkey NOT IN (SELECT c_custkey FROM customer_insub
          |                        WHERE c_acctbal < 0)
          |ORDER BY o_orderkey""".stripMargin)
    },
    oracle = Some(
      """SELECT o_orderkey, o_custkey, o_orderstatus
        |FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer
        |                    WHERE c_mktsegment = 'BUILDING')
        |  AND o_custkey NOT IN (SELECT c_custkey FROM customer
        |                        WHERE c_acctbal < 0)
        |ORDER BY o_orderkey""".stripMargin))

  /** TPC-H Q3-shaped shipping-priority query through the SQL front-end:
    * 3-way join, pre-aggregation filters on both fact and dim, group, top-10
    * by revenue (unique-key tie-break so LIMIT is deterministic). Per-order
    * revenue sums stay far below 2^53 scaled, so the direct DOUBLE cast is
    * exact on both engines. */
  /** TPC-H Q22-shaped "sales opportunity": per nation, the count and
    * total balance of customers who hold an ABOVE-GLOBAL-AVERAGE
    * positive account balance yet placed no order in the data's final
    * year (>= 2000-06-01; EVERY synthetic customer has some order, so
    * Q22's bare never-ordered probe would be degenerate here) — the
    * classic scalar-subquery + NOT EXISTS pair. Decorrelation shape: the
    * global average is a one-row aggregate broadcast into the scan
    * filter as a CROSS-MULTIPLIED integer comparison (bal·n_pos >
    * sum_pos — no division, no double), the "never ordered" probe is a
    * LEFT ANTI join on custkey against the orders key projection (the
    * NOT-EXISTS decorrelation Catalyst can't always reach from
    * spark.sql when the subquery is hand-written correlated), and the
    * nation rollup runs on the surviving slice only. Balances are exact
    * integer cents throughout (floor(·100 + 0.5), the q_did pattern).
    *
    * Scale shape: orders is touched ONLY as a projected key column
    * (anti joins never widen), customer twice (one-row agg + filtered
    * scan — ReuseExchange-free but both scans prune to 3 columns), and
    * nothing shuffles wider than (nationkey, cents). */
  private val salesOpportunity = QueryDef(
    fn = (spark, dir) => {
      val cust = Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_nationkey"),
          floor(col("c_acctbal") * 100 + 0.5).cast("long").as("cents"))
      val avgPos = cust.filter(col("cents") > 0)
        .agg(count(lit(1)).as("n_pos"), sum(col("cents")).as("sum_pos"))
      val rich = cust.crossJoin(broadcast(avgPos))
        .filter(col("cents").cast(DecimalType(38, 0)) * col("n_pos")
          > col("sum_pos"))
      val idle = rich.join(
        Tables.orders(spark, dir)
          .filter(col("o_orderdate") >= lit("2000-06-01").cast("timestamp"))
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      idle.groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_cust"), sum(col("cents")).as("cents_total"))
        .orderBy("c_nationkey")
    },
    oracle = Some(
      """WITH cust AS (SELECT c_custkey, c_nationkey,
        |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
        |  FROM customer),
        |avgpos AS (SELECT COUNT(*) AS n_pos, SUM(cents) AS sum_pos
        |  FROM cust WHERE cents > 0),
        |rich AS (SELECT c.* FROM cust c CROSS JOIN avgpos
        |  WHERE CAST(c.cents AS HUGEINT) * n_pos > sum_pos),
        |idle AS (SELECT * FROM rich r
        |  WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                    WHERE o.o_custkey = r.c_custkey
        |                      AND o.o_orderdate >= TIMESTAMP '2000-06-01'))
        |SELECT c_nationkey, COUNT(*) AS n_cust,
        |  CAST(SUM(cents) AS BIGINT) AS cents_total
        |FROM idle GROUP BY 1 ORDER BY c_nationkey""".stripMargin))

  private val shipPriority = QueryDef(
    fn = (spark, dir) => {
      Tables.customer(spark, dir).createOrReplaceTempView("customer_q3")
      Tables.orders(spark, dir).createOrReplaceTempView("orders_q3")
      Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem_q3")
      spark.sql(
        """SELECT l_orderkey,
          |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
          |           * (1 - CAST(l_discount AS DECIMAL(12,4)))) AS DOUBLE) AS revenue,
          |  CAST(o_orderdate AS DATE) AS order_date, o_orderpriority
          |FROM customer_q3 JOIN orders_q3 ON c_custkey = o_custkey
          |JOIN lineitem_q3 ON l_orderkey = o_orderkey
          |WHERE c_mktsegment = 'BUILDING'
          |  AND CAST(o_orderdate AS DATE) < DATE '1997-03-15'
          |  AND CAST(l_shipdate AS DATE) > DATE '1997-03-15'
          |GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
          |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin)
    },
    oracle = Some(
      """SELECT l_orderkey,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
        |           * (1 - CAST(l_discount AS DECIMAL(12,4)))) AS DOUBLE) AS revenue,
        |  CAST(o_orderdate AS DATE) AS order_date, o_orderpriority
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND CAST(o_orderdate AS DATE) < DATE '1997-03-15'
        |  AND CAST(l_shipdate AS DATE) > DATE '1997-03-15'
        |GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin))

  /** TPC-H Q8-shaped national market share through the SQL front-end: the
    * full 6-table star (lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region on
    * the demand side, lineitem ⋈ supplier ⋈ nation on the supply side) —
    * the deepest join tree in the suite, and the optimizer showcase: every
    * dimension broadcasts, the two fact-side joins stay hash joins, and
    * the region/nation filters reach the dim scans. Revenue is the exact
    * DECIMAL(12,4) price×(1−disc) sum per (year, supplier-nation flag);
    * the share division is the one double, 6dp floored. Both engines run
    * the IDENTICAL aggregation tree (conditional sums in one pass — no
    * join of two aggregates).
    */
  private val marketShare = QueryDef(
    fn = (spark, dir) => {
      Tables.customer(spark, dir).createOrReplaceTempView("customer_q8")
      Tables.orders(spark, dir).createOrReplaceTempView("orders_q8")
      Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem_q8")
      Tables.supplier(spark, dir).createOrReplaceTempView("supplier_q8")
      Tables.nation(spark, dir).createOrReplaceTempView("nation_q8")
      Tables.region(spark, dir).createOrReplaceTempView("region_q8")
      spark.sql(
        """SELECT o_year,
          |  CAST(SUM(CASE WHEN target THEN vol ELSE CAST(0 AS DECIMAL(12,4)) END)
          |    AS DOUBLE) AS nation_rev,
          |  CAST(SUM(vol) AS DOUBLE) AS total_rev,
          |  floor(CAST(SUM(CASE WHEN target THEN vol
          |                      ELSE CAST(0 AS DECIMAL(12,4)) END) AS DOUBLE)
          |    / CAST(SUM(vol) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS mkt_share
          |FROM (
          |  SELECT year(CAST(o_orderdate AS DATE)) AS o_year,
          |    CAST(l_extendedprice AS DECIMAL(12,4))
          |      * (1 - CAST(l_discount AS DECIMAL(12,4))) AS vol,
          |    sn.n_name = 'NATION_2' AS target
          |  FROM lineitem_q8
          |  JOIN orders_q8 ON l_orderkey = o_orderkey
          |  JOIN customer_q8 ON o_custkey = c_custkey
          |  JOIN nation_q8 cn ON c_nationkey = cn.n_nationkey
          |  JOIN region_q8 ON cn.n_regionkey = r_regionkey
          |  JOIN supplier_q8 ON l_suppkey = s_suppkey
          |  JOIN nation_q8 sn ON s_nationkey = sn.n_nationkey
          |  WHERE r_name = 'ASIA') x
          |GROUP BY o_year ORDER BY o_year""".stripMargin)
    },
    oracle = Some(
      """SELECT o_year,
        |  CAST(SUM(CASE WHEN target THEN vol ELSE CAST(0 AS DECIMAL(12,4)) END)
        |    AS DOUBLE) AS nation_rev,
        |  CAST(SUM(vol) AS DOUBLE) AS total_rev,
        |  floor(CAST(SUM(CASE WHEN target THEN vol
        |                      ELSE CAST(0 AS DECIMAL(12,4)) END) AS DOUBLE)
        |    / CAST(SUM(vol) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS mkt_share
        |FROM (
        |  SELECT CAST(year(CAST(o_orderdate AS DATE)) AS INTEGER) AS o_year,
        |    CAST(l_extendedprice AS DECIMAL(12,4))
        |      * (1 - CAST(l_discount AS DECIMAL(12,4))) AS vol,
        |    sn.n_name = 'NATION_2' AS target
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation cn ON c_nationkey = cn.n_nationkey
        |  JOIN region ON cn.n_regionkey = r_regionkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation sn ON s_nationkey = sn.n_nationkey
        |  WHERE r_name = 'ASIA') x
        |GROUP BY o_year ORDER BY o_year""".stripMargin))

  /** TPC-H Q21-shaped sole-late-supplier report: suppliers whose line
    * item shipped late (> 60 days after the order date) on a finished
    * multi-supplier order where EVERY OTHER supplier shipped on time —
    * the double-correlated EXISTS / NOT EXISTS shape, the hardest
    * decorrelation pattern in the TPC-H suite (both subqueries reference
    * the outer line item's order key AND the outer order's date). Spark
    * plans both as existence joins on l_orderkey — no per-row re-scan;
    * the plan-audit spec pins it.
    */
  /** TPC-H Q5-shaped local-supplier volume: revenue per nation where the
    * CUSTOMER and the SUPPLIER sit in the same nation (the
    * c_nationkey = s_nationkey cross-dimension equality is the shape —
    * it correlates the two fact-side dimension joins), restricted to
    * ASIA and order year 1996. All dimensions broadcast; the two
    * fact-sized joins stay hash joins; the region filter prunes the
    * nation dim before it ever reaches the fact side.
    *
    * Revenue is EXACT: price(2dp)·(1−disc)(4dp) is a 6dp
    * DECIMAL product summed exactly, emitted as the integer
    * rev_e6 = Σvol·10⁶ — no double anywhere. */
  private val localSupplierVolume = QueryDef(
    fn = (spark, dir) => {
      val vol = (col("l_extendedprice").cast(DecimalType(12, 4))
        * (lit(1) - col("l_discount").cast(DecimalType(12, 4))))
      Tables.lineitem(spark, dir)
        .join(Tables.orders(spark, dir),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(spark, dir),
          col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(spark, dir),
          col("l_suppkey") === col("s_suppkey")
            && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(Tables.nation(spark, dir)),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(spark, dir)
          .filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .filter(col("o_orderdate").cast("date") >= lit("1996-01-01")
          && col("o_orderdate").cast("date") < lit("1997-01-01"))
        .groupBy(col("n_name"))
        .agg((sum(vol) * 1000000).cast("long").as("rev_e6"))
        .orderBy("n_name")
    },
    oracle = Some(
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
        |    * (1 - CAST(l_discount AS DECIMAL(12,4)))) * 1000000
        |    AS BIGINT) AS rev_e6
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |  AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
        |  AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'
        |GROUP BY n_name ORDER BY n_name""".stripMargin))

  /** TPC-H Q7-shaped bi-national trade volume: shipped revenue between
    * two nations in BOTH directions, by supplier nation × customer
    * nation × ship year — the symmetric-OR join filter shape
    * ((N1→N2) OR (N2→N1)) that exercises disjunctive predicates over
    * two broadcast dimension lineages. Revenue emitted exact
    * (rev_e6 integer, the Q5 convention). */
  private val nationTradeVolume = QueryDef(
    fn = (spark, dir) => {
      val vol = (col("l_extendedprice").cast(DecimalType(12, 4))
        * (lit(1) - col("l_discount").cast(DecimalType(12, 4))))
      val sn = Tables.nation(spark, dir)
        .select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))
      val cn = Tables.nation(spark, dir)
        .select(col("n_nationkey").as("cnk"), col("n_name").as("cust_nation"))
      Tables.lineitem(spark, dir)
        .join(Tables.supplier(spark, dir),
          col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(spark, dir),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(spark, dir),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(sn), col("s_nationkey") === col("snk"))
        .join(broadcast(cn), col("c_nationkey") === col("cnk"))
        .filter(
          (col("supp_nation") === "NATION_18"
            && col("cust_nation") === "NATION_19")
          || (col("supp_nation") === "NATION_19"
            && col("cust_nation") === "NATION_18"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate").cast("date")).as("l_year"))
        .agg((sum(vol) * 1000000).cast("long").as("rev_e6"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },
    oracle = Some(
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |  CAST(year(CAST(l_shipdate AS DATE)) AS INTEGER) AS l_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
        |    * (1 - CAST(l_discount AS DECIMAL(12,4)))) * 1000000
        |    AS BIGINT) AS rev_e6
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |WHERE (sn.n_name = 'NATION_18' AND cn.n_name = 'NATION_19')
        |   OR (sn.n_name = 'NATION_19' AND cn.n_name = 'NATION_18')
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin))

  /** TPC-H Q14-shaped promotion-revenue share per ship month: what
    * fraction of shipped revenue came from PROMO-type parts — the
    * conditional-share-over-a-broadcast-dimension shape. The part dim
    * broadcasts; one fact-sized hash join; exact 6dp DECIMAL revenue
    * with the share as integral division (promo·10⁶ div total) — no
    * double in the plan. */
  private val promoRevenue = QueryDef(
    fn = (spark, dir) => {
      val vol = (col("l_extendedprice").cast(DecimalType(12, 4))
        * (lit(1) - col("l_discount").cast(DecimalType(12, 4))))
      Tables.lineitem(spark, dir)
        .join(broadcast(Tables.part(spark, dir)
          .select(col("p_partkey"), col("p_type"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"))
        .agg(
          (sum(when(col("p_type") === "PROMO", vol)
            .otherwise(lit(0).cast(DecimalType(12, 4)))) * 1000000)
            .cast("long").as("promo_e6"),
          (sum(vol) * 1000000).cast("long").as("total_e6"))
        // promo_e6·10⁶ exceeds int64 at warehouse scale — the share
        // division runs in DECIMAL(38,0) (Spark div → BIGINT, exact)
        .withColumn("promo_share_e6",
          expr("CAST((CAST(promo_e6 AS DECIMAL(38,0)) * 1000000)"
            + " div CAST(total_e6 AS DECIMAL(38,0)) AS BIGINT)"))
        .orderBy("ship_month")
    },
    oracle = Some(
      """WITH g AS (SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
        |  CAST(SUM(CASE WHEN p_type = 'PROMO'
        |      THEN CAST(l_extendedprice AS DECIMAL(12,4))
        |        * (1 - CAST(l_discount AS DECIMAL(12,4)))
        |      ELSE CAST(0 AS DECIMAL(12,4)) END) * 1000000 AS BIGINT)
        |    AS promo_e6,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
        |    * (1 - CAST(l_discount AS DECIMAL(12,4)))) * 1000000 AS BIGINT)
        |    AS total_e6
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1)
        |SELECT ship_month, promo_e6, total_e6,
        |  CAST((CAST(promo_e6 AS HUGEINT) * 1000000)
        |    // CAST(total_e6 AS HUGEINT) AS BIGINT) AS promo_share_e6
        |FROM g ORDER BY ship_month""".stripMargin))

  /** TPC-H Q10-shaped returned-item report: the 20 customers losing the
    * most revenue to returns (l_returnflag = 'R'), with their nation —
    * the classic churn-triage list. Strict total order (revenue desc,
    * custkey asc) makes the LIMIT a deterministic takeOrdered; revenue
    * exact (rev_e6). */
  private val returnedItems = QueryDef(
    fn = (spark, dir) => {
      val vol = (col("l_extendedprice").cast(DecimalType(12, 4))
        * (lit(1) - col("l_discount").cast(DecimalType(12, 4))))
      Tables.lineitem(spark, dir)
        .filter(col("l_returnflag") === "R")
        .join(Tables.orders(spark, dir),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(spark, dir),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(spark, dir)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg((sum(vol) * 1000000).cast("long").as("rev_e6"))
        .orderBy(col("rev_e6").desc, col("c_custkey").asc)
        .limit(20)
    },
    oracle = Some(
      """SELECT c_custkey, c_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
        |    * (1 - CAST(l_discount AS DECIMAL(12,4)))) * 1000000 AS BIGINT)
        |    AS rev_e6
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |GROUP BY 1, 2, 3
        |ORDER BY rev_e6 DESC, c_custkey ASC LIMIT 20""".stripMargin))

  private val soleLateSupplier = QueryDef(
    fn = (spark, dir) => {
      Tables.supplier(spark, dir).createOrReplaceTempView("supplier_q21")
      Tables.orders(spark, dir).createOrReplaceTempView("orders_q21")
      Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem_q21")
      spark.sql(
        """SELECT s_name, CAST(COUNT(*) AS BIGINT) AS n_waiting
          |FROM supplier_q21
          |JOIN lineitem_q21 l1 ON s_suppkey = l1.l_suppkey
          |JOIN orders_q21 ON o_orderkey = l1.l_orderkey
          |WHERE o_orderstatus = 'F'
          |  AND datediff(CAST(l1.l_shipdate AS DATE),
          |               CAST(o_orderdate AS DATE)) > 60
          |  AND EXISTS (
          |    SELECT 1 FROM lineitem_q21 l2
          |    WHERE l2.l_orderkey = l1.l_orderkey
          |      AND l2.l_suppkey <> l1.l_suppkey)
          |  AND NOT EXISTS (
          |    SELECT 1 FROM lineitem_q21 l3
          |    WHERE l3.l_orderkey = l1.l_orderkey
          |      AND l3.l_suppkey <> l1.l_suppkey
          |      AND datediff(CAST(l3.l_shipdate AS DATE),
          |                   CAST(o_orderdate AS DATE)) > 60)
          |GROUP BY s_name
          |ORDER BY n_waiting DESC, s_name LIMIT 10""".stripMargin)
    },
    oracle = Some(
      """SELECT s_name, COUNT(*) AS n_waiting
        |FROM supplier
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |WHERE o_orderstatus = 'F'
        |  AND datediff('day', CAST(o_orderdate AS DATE),
        |               CAST(l1.l_shipdate AS DATE)) > 60
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND datediff('day', CAST(o_orderdate AS DATE),
        |                   CAST(l3.l_shipdate AS DATE)) > 60)
        |GROUP BY s_name
        |ORDER BY n_waiting DESC, s_name LIMIT 10""".stripMargin))

  /** Recursive CTE (Spark 4.1 WITH RECURSIVE): a complete month spine
    * generated by recursion, left-joined to per-month order counts so
    * empty months survive with 0 — the gap-free time dimension every
    * reporting pipeline needs. */
  private val recursiveCte = QueryDef(
    fn = (spark, dir) => {
      Tables.orders(spark, dir).createOrReplaceTempView("orders_rec")
      spark.sql(
        """WITH RECURSIVE months(m, idx) AS (
          |  SELECT CAST('1995-01-01' AS DATE), 0
          |  UNION ALL
          |  SELECT add_months(m, 1), idx + 1 FROM months WHERE idx < 23)
          |SELECT m AS month_start, idx, COALESCE(n, CAST(0 AS BIGINT)) AS n_orders
          |FROM months
          |LEFT JOIN (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS om,
          |                  COUNT(*) AS n
          |           FROM orders_rec GROUP BY 1) o ON om = m
          |ORDER BY idx""".stripMargin)
    },
    oracle = Some(
      """WITH RECURSIVE months(m, idx) AS (
        |  SELECT CAST('1995-01-01' AS DATE), 0
        |  UNION ALL
        |  SELECT CAST(m + INTERVAL 1 MONTH AS DATE), idx + 1 FROM months WHERE idx < 23)
        |SELECT m AS month_start, CAST(idx AS INT) AS idx,
        |  COALESCE(n, CAST(0 AS BIGINT)) AS n_orders
        |FROM months
        |LEFT JOIN (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS om,
        |                  COUNT(*) AS n
        |           FROM orders GROUP BY 1) o ON om = m
        |ORDER BY idx""".stripMargin))

  /** Correlated LATERAL subquery: per-nation top-2 customers by balance —
    * the "top-k related rows per outer row" shape, with the unique-key
    * tie-break keeping the LIMIT deterministic. */
  private val lateralTopk = QueryDef(
    fn = (spark, dir) => {
      Tables.nation(spark, dir).createOrReplaceTempView("nation_lat")
      Tables.customer(spark, dir).createOrReplaceTempView("customer_lat")
      spark.sql(
        """SELECT n_name, c_name, c_acctbal FROM nation_lat n,
          |LATERAL (SELECT c_name, c_acctbal FROM customer_lat
          |         WHERE c_nationkey = n.n_nationkey
          |         ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
          |ORDER BY n_name, c_acctbal DESC, c_name""".stripMargin)
    },
    oracle = Some(
      """SELECT n_name, c_name, c_acctbal FROM nation n,
        |LATERAL (SELECT c_name, c_acctbal FROM customer
        |         WHERE c_nationkey = n.n_nationkey
        |         ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
        |ORDER BY n_name, c_acctbal DESC, c_name""".stripMargin))

  // --- full outer join ------------------------------------------------------

  /** Customer presence vs supplier presence per nation: FULL OUTER keeps
    * nations appearing on either side only. */
  private val fullOuter = QueryDef(
    fn = (spark, dir) => {
      val c = Tables.customer(spark, dir)
        .groupBy(col("c_nationkey").as("nationkey"))
        .agg(count(lit(1)).as("n_customers"))
      val s = Tables.supplier(spark, dir)
        .groupBy(col("s_nationkey").as("nationkey"))
        .agg(count(lit(1)).as("n_suppliers"))
      c.join(s, Seq("nationkey"), "full_outer")
        .select(col("nationkey"),
          coalesce(col("n_customers"), lit(0L)).as("n_customers"),
          coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"))
        .orderBy("nationkey")
    },
    oracle = Some(
      """WITH c AS (SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers
        |           FROM customer GROUP BY c_nationkey),
        |s AS (SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers
        |      FROM supplier GROUP BY s_nationkey)
        |SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
        |  COALESCE(n_customers, 0) AS n_customers,
        |  COALESCE(n_suppliers, 0) AS n_suppliers
        |FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
        |ORDER BY nationkey""".stripMargin))

  // --- unpivot (wide -> long) -----------------------------------------------

  /** Aggregate-then-melt: per-flag metric columns unpivoted to
    * (flag, metric, value) rows — Dataset.unpivot, the inverse of pivot. */
  private val unpivotQ = QueryDef(
    fn = (spark, dir) => {
      val wide = Tables.lineitem(spark, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast("double").as("sum_price"),
          sum(dec(col("l_discount"))).cast("double").as("sum_disc"))
      wide.unpivot(
          Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
          "metric", "value")
        .orderBy("l_returnflag", "metric")
    },
    oracle = Some(
      """WITH wide AS (
        |  SELECT l_returnflag,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sum_qty,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE) AS sum_price,
        |    CAST(SUM(CAST(l_discount AS DECIMAL(12,4))) AS DOUBLE) AS sum_disc
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, metric, value FROM (
        |  SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM wide
        |  UNION ALL
        |  SELECT l_returnflag, 'sum_price', sum_price FROM wide
        |  UNION ALL
        |  SELECT l_returnflag, 'sum_disc', sum_disc FROM wide)
        |ORDER BY l_returnflag, metric""".stripMargin))

  // --- positional explode ---------------------------------------------------

  /** Tokens with their 0-based position (posexplode) — the order-preserving
    * flatten a sequence-labeling pipeline needs. Sampled: position output is
    * O(corpus tokens). */
  private val posExplode = QueryDef(
    fn = (spark, dir) =>
      Tables.documents(spark, dir)
        .filter(col("doc_id") % 50 === 0)
        .select(col("doc_id"),
          posexplode(TextAnalysis.tokens(col("text"))).as(Seq("pos", "token")))
        .orderBy("doc_id", "pos"),
    oracle = Some(
      """SELECT doc_id, CAST(pos - 1 AS INTEGER) AS pos, token FROM (
        |  SELECT doc_id,
        |    generate_subscripts(list_filter(regexp_split_to_array(lower(text), '\s+'),
        |                                    t -> t <> ''), 1) AS pos,
        |    unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
        |                       t -> t <> '')) AS token
        |  FROM documents WHERE doc_id % 50 = 0)
        |ORDER BY doc_id, pos""".stripMargin))

  // --- bitwise functions ----------------------------------------------------

  private val bitwiseQ = QueryDef(
    fn = (spark, dir) =>
      Tables.events(spark, dir)
        .filter(col("event_id") < 2000)
        .select(
          col("event_id"),
          (col("event_id").bitwiseAND(255)).as("b_and"),
          (col("event_id").bitwiseOR(4096)).as("b_or"),
          (col("event_id").bitwiseXOR(col("user_id"))).as("b_xor"),
          shiftleft(col("event_id"), 3).as("b_shl"),
          shiftright(col("event_id"), 2).as("b_shr"),
          bit_count(col("event_id")).as("b_pop"))
        .orderBy("event_id"),
    oracle = Some(
      """SELECT event_id,
        |  event_id & 255 AS b_and,
        |  event_id | 4096 AS b_or,
        |  xor(event_id, user_id) AS b_xor,
        |  -- DuckDB << widens; Spark shiftleft stays in the long domain
        |  CAST(event_id << 3 AS BIGINT) AS b_shl,
        |  CAST(event_id >> 2 AS BIGINT) AS b_shr,
        |  CAST(bit_count(event_id) AS INTEGER) AS b_pop
        |FROM events WHERE event_id < 2000 ORDER BY event_id""".stripMargin))

  // --- embedding normalization + int8 quantization --------------------------

  /** L2 norm and symmetric int8 scalar quantization per embedding — the
    * storage-shrink step before ANN indexing. Exact: norm from a sequential
    * double dot product (same order both engines), quantized code =
    * floor(x / max_abs * 127 + 0.5) on the float-to-double promoted value.
    * Zero vectors quantize to null, not a division blowup.
    */
  private val embQuantize = QueryDef(
    fn = (spark, dir) => {
      val e = col("embedding")
      val norm = sqrt(aggregate(e, lit(0.0d),
        (acc, x) => acc + x.cast("double") * x.cast("double")))
      val maxAbs = array_max(transform(e, x => abs(x.cast("double"))))
      def q(x: Column) =
        when(maxAbs > 0, floor(x.cast("double") / maxAbs * 127 + 0.5).cast("int"))
      Tables.embeddings(spark, dir)
        .select(col("vec_id"),
          r6(norm).as("l2_norm"),
          r6(maxAbs).as("max_abs"),
          q(element_at(e, 1)).as("q_first"),
          q(element_at(e, 64)).as("q_last"))
        .orderBy("vec_id")
    },
    oracle = Some(
      """WITH v AS (
        |  SELECT vec_id,
        |    sqrt(list_reduce(list_concat([CAST(0.0 AS DOUBLE)],
        |      list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
        |      (a, b) -> a + b)) AS l2_norm,
        |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS max_abs,
        |    CAST(embedding[1] AS DOUBLE) AS e1,
        |    CAST(embedding[64] AS DOUBLE) AS e64
        |  FROM embeddings)
        |SELECT vec_id,
        |  floor(l2_norm * 1000000.0 + 0.5) / 1000000.0 AS l2_norm,
        |  floor(max_abs * 1000000.0 + 0.5) / 1000000.0 AS max_abs,
        |  CASE WHEN max_abs > 0
        |       THEN CAST(floor(e1 / max_abs * 127 + 0.5) AS INTEGER) END AS q_first,
        |  CASE WHEN max_abs > 0
        |       THEN CAST(floor(e64 / max_abs * 127 + 0.5) AS INTEGER) END AS q_last
        |FROM v ORDER BY vec_id""".stripMargin))

  /** Pearson correlation matrix over the lineitem numeric columns, from
    * exact integer power sums in ONE aggregation pass (the same
    * sufficient-statistics discipline as q_regr_ols/q_stats_agg — 14 sums,
    * map-side combinable, so the full k×k matrix costs one shuffle of one
    * row regardless of input size). Per-row arithmetic is UNSCALED-LONG:
    * each column is `round(v·10^4)` (exact — the data is ≤4-decimal, never
    * near a .5 boundary) and cross-products multiply as 64-bit ints
    * (≤1.3e18, inside Long), replacing ten BigDecimal multiplies per row;
    * only the accumulators are DECIMAL(38,0). Pearson r is scale-invariant
    * so the 10^4 factors cancel in the quotient and no rescale is ever
    * applied. The 6 upper-triangle pairs unpivot from the singleton via
    * 1-row projections; sqrt/divide run on identical doubles in both
    * engines (VARCHAR-cast roundtrip guards the past-2^53 sums, as
    * statsAgg's oracle documents). */
  /** Partial correlation r(qty, price | discount): the qty-price
    * association with the discount channel regressed out — the
    * confounder-control readout that tells an analyst whether two
    * metrics co-move on their own or only through a third (the classic
    * spurious-correlation screen). r_xy.z = (r_xy − r_xz·r_yz) /
    * (√(1−r_xz²)·√(1−r_yz²)), each r from the SAME exact DECIMAL(38,0)
    * moment sums as q_corr_matrix (fixed-point units, one
    * string-mediated double cast so both engines round the big decimal
    * identically), and the composition uses only ±×÷√ — every step
    * IEEE-correctly-rounded in identical order; 6dp floors on the four
    * emitted statistics.
    *
    * Scale shape: ONE aggregation over the fact table (9 moment sums);
    * everything after is a single-row projection. */
  private val partialCorr = QueryDef(
    fn = (spark, dir) => {
      def u(c: String): Column = round(col(c) * lit(10000)).cast("long")
      def d38(c: Column): Column = c.cast(DecimalType(38, 0))
      val vars = Seq("l_quantity" -> "x", "l_extendedprice" -> "y",
        "l_discount" -> "z")
      val sums = vars.map { case (c, a) => sum(d38(u(c))).as(s"s_$a") } ++
        (for { i <- vars.indices; j <- i until vars.size } yield {
          val (ci, ai) = vars(i); val (cj, aj) = vars(j)
          sum(d38(u(ci) * u(cj))).as(s"s_${ai}$aj")
        })
      val agg = Tables.lineitem(spark, dir)
        .agg(count(lit(1)).as("n"), sums: _*)
      def dd(name: String): Column = col(name).cast("string").cast("double")
      val n = col("n").cast("double")
      def r(a: String, b: String): Column = {
        val cov = n * dd(s"s_$a$b") - dd(s"s_$a") * dd(s"s_$b")
        val va = n * dd(s"s_$a$a") - dd(s"s_$a") * dd(s"s_$a")
        val vb = n * dd(s"s_$b$b") - dd(s"s_$b") * dd(s"s_$b")
        cov / (sqrt(va) * sqrt(vb))
      }
      val (rxy, rxz, ryz) = (r("x", "y"), r("x", "z"), r("y", "z"))
      agg.select(col("n"),
        r6(rxy).as("r_xy"), r6(rxz).as("r_xz"), r6(ryz).as("r_yz"),
        r6((rxy - rxz * ryz)
          / (sqrt(lit(1.0) - rxz * rxz) * sqrt(lit(1.0) - ryz * ryz)))
          .as("r_xy_given_z"))
    },
    oracle = Some {
      def u(c: String) = s"CAST(round($c * 10000) AS BIGINT)"
      val vars = Seq("l_quantity" -> "x", "l_extendedprice" -> "y",
        "l_discount" -> "z")
      val sums = (vars.map { case (c, a) =>
        s"CAST(CAST(SUM(${u(c)}) AS VARCHAR) AS DOUBLE) AS s_$a" } ++
        (for { i <- vars.indices; j <- i until vars.size } yield {
          val (ci, ai) = vars(i); val (cj, aj) = vars(j)
          s"CAST(CAST(SUM(${u(ci)} * ${u(cj)}) AS VARCHAR) AS DOUBLE) AS s_$ai$aj"
        })).mkString(",\n    ")
      def rr(a: String, b: String) =
        s"((n * s_$a$b - s_$a * s_$b) / (sqrt(n * s_$a$a - s_$a * s_$a) * sqrt(n * s_$b$b - s_$b * s_$b)))"
      s"""WITH m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         |    $sums
         |  FROM lineitem)
         |SELECT CAST(n AS BIGINT) AS n,
         |  floor(${rr("x", "y")} * 1000000.0 + 0.5) / 1000000.0 AS r_xy,
         |  floor(${rr("x", "z")} * 1000000.0 + 0.5) / 1000000.0 AS r_xz,
         |  floor(${rr("y", "z")} * 1000000.0 + 0.5) / 1000000.0 AS r_yz,
         |  floor((${rr("x", "y")} - ${rr("x", "z")} * ${rr("y", "z")})
         |    / (sqrt(1.0 - ${rr("x", "z")} * ${rr("x", "z")})
         |       * sqrt(1.0 - ${rr("y", "z")} * ${rr("y", "z")}))
         |    * 1000000.0 + 0.5) / 1000000.0 AS r_xy_given_z
         |FROM m""".stripMargin
    })

  private val corrMatrix = QueryDef(
    fn = (spark, dir) => {
      val vars = Seq("l_quantity" -> "qty", "l_extendedprice" -> "price",
        "l_discount" -> "disc", "l_tax" -> "tax")
      def u(c: String): Column = round(col(c) * lit(10000)).cast("long")
      def d38(c: Column): Column = c.cast(DecimalType(38, 0))
      val sums = vars.map { case (c, a) => sum(d38(u(c))).as(s"s_$a") } ++
        (for { i <- vars.indices; j <- i until vars.size } yield {
          val (ci, ai) = vars(i); val (cj, aj) = vars(j)
          sum(d38(u(ci) * u(cj))).as(s"s_${ai}_$aj")
        })
      val agg = Tables.lineitem(spark, dir)
        .agg(count(lit(1)).as("n"), sums: _*)
      // plain double casts happen via the same VARCHAR trick DuckDB needs
      def dd(name: String): Column = col(name).cast("string").cast("double")
      val n = col("n").cast("double")
      val pairIdx = for { i <- vars.indices; j <- (i + 1) until vars.size }
        yield (vars(i)._2, vars(j)._2)
      // ONE aggregation; the 6 pairs unpivot from the singleton via stack()
      // (a per-row generator — 6 references to the agg would re-run it)
      val wide = agg.select(pairIdx.map { case (ai, aj) =>
        val cov = n * dd(s"s_${ai}_$aj") - dd(s"s_$ai") * dd(s"s_$aj")
        val va = n * dd(s"s_${ai}_$ai") - dd(s"s_$ai") * dd(s"s_$ai")
        val vb = n * dd(s"s_${aj}_$aj") - dd(s"s_$aj") * dd(s"s_$aj")
        r6(cov / (sqrt(va) * sqrt(vb))).as(s"c_${ai}_$aj")
      }: _*)
      val stackArgs = pairIdx
        .map { case (ai, aj) => s"'$ai', '$aj', c_${ai}_$aj" }
        .mkString(", ")
      wide.select(expr(
          s"stack(${pairIdx.size}, $stackArgs) AS (var_a, var_b, corr)"))
        .orderBy("var_a", "var_b")
    },
    oracle = Some {
      val vars = Seq("l_quantity" -> "qty", "l_extendedprice" -> "price",
        "l_discount" -> "disc", "l_tax" -> "tax")
      def u(c: String) = s"CAST(round($c * 10000) AS BIGINT)"
      val sums = (vars.map { case (c, a) =>
        s"CAST(CAST(SUM(${u(c)}) AS VARCHAR) AS DOUBLE) AS s_$a" } ++
        (for { i <- vars.indices; j <- i until vars.size } yield {
          val (ci, ai) = vars(i); val (cj, aj) = vars(j)
          s"CAST(CAST(SUM(${u(ci)} * ${u(cj)}) AS VARCHAR) AS DOUBLE) AS s_${ai}_$aj"
        })).mkString(",\n    ")
      val rows = (for { i <- vars.indices; j <- (i + 1) until vars.size } yield {
        val ai = vars(i)._2; val aj = vars(j)._2
        s"""SELECT '$ai' AS var_a, '$aj' AS var_b,
           |  floor(((n*s_${ai}_$aj - s_$ai*s_$aj)
           |    / (sqrt(n*s_${ai}_$ai - s_$ai*s_$ai) * sqrt(n*s_${aj}_$aj - s_$aj*s_$aj)))
           |    * 1000000.0 + 0.5) / 1000000.0 AS corr FROM s"""
      }).mkString("\nUNION ALL\n")
      s"""WITH s AS (
         |  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         |    $sums
         |  FROM lineitem)
         |$rows
         |ORDER BY var_a, var_b""".stripMargin
    })

  /** Lag-1 autocorrelation of the event value stream: Pearson r between
    * consecutive per-user observations — the stationarity / trend probe a
    * time-series pipeline runs before modeling (white noise → ≈ 0). The
    * lag pairs come from ONE window partitioned by user_id — a
    * high-cardinality key, so the sort is per-user-sized and
    * embarrassingly parallel (NOT the 3-value-key straggler shape the
    * outlier queries were purged of); the Pearson sums then collapse in
    * one map-side-combinable aggregation to a single row.
    *
    * Determinism: values are quantized once to unscaled integers via the
    * floor form (`⌊v·10⁴+0.5⌋` — bit-identical in both engines, where a
    * builtin round() would diverge at .5 boundaries), cross-products
    * multiply as 64-bit ints, accumulators are DECIMAL(38,0), and the
    * final quotient replays the oracle's double expression tree on
    * VARCHAR-guarded casts (sums exceed 2^53 at scale) — the same
    * discipline as q_corr_matrix. */
  private val autocorrLag1 = QueryDef(
    fn = (spark, dir) => {
      def d38(c: Column): Column = c.cast(DecimalType(38, 0))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      val p = Tables.events(spark, dir)
        .select(col("user_id"),
          floor(col("value") * 10000 + 0.5).cast("long").as("u"),
          expr("ts_ns div 1000").as("ts_us"), col("event_id"))
        .withColumn("up", lag(col("u"), 1).over(w))
        .filter(col("up").isNotNull)
      val s = p.agg(count(lit(1)).cast("double").as("n"),
        sum(d38(col("u"))).as("sx"), sum(d38(col("up"))).as("sy"),
        sum(d38(col("u") * col("u"))).as("sxx"),
        sum(d38(col("up") * col("up"))).as("syy"),
        sum(d38(col("u") * col("up"))).as("sxy"))
      def dd(name: String): Column = col(name).cast("string").cast("double")
      s.select(col("n").cast("long").as("n_pairs"),
        r6((col("n") * dd("sxy") - dd("sx") * dd("sy"))
          / (sqrt(col("n") * dd("sxx") - dd("sx") * dd("sx"))
            * sqrt(col("n") * dd("syy") - dd("sy") * dd("sy"))))
          .as("autocorr"))
    },
    oracle = Some(
      """WITH q AS (SELECT user_id,
        |    CAST(floor(value * 10000 + 0.5) AS BIGINT) AS u,
        |    epoch_us(ts) AS ts_us, event_id FROM events),
        |p AS (SELECT u, lag(u) OVER (PARTITION BY user_id
        |        ORDER BY ts_us, event_id) AS up FROM q),
        |s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
        |  CAST(CAST(SUM(u)     AS VARCHAR) AS DOUBLE) AS sx,
        |  CAST(CAST(SUM(up)    AS VARCHAR) AS DOUBLE) AS sy,
        |  CAST(CAST(SUM(u*u)   AS VARCHAR) AS DOUBLE) AS sxx,
        |  CAST(CAST(SUM(up*up) AS VARCHAR) AS DOUBLE) AS syy,
        |  CAST(CAST(SUM(u*up)  AS VARCHAR) AS DOUBLE) AS sxy
        |  FROM p WHERE up IS NOT NULL)
        |SELECT CAST(n AS BIGINT) AS n_pairs,
        |  floor(((n*sxy - sx*sy)
        |    / (sqrt(n*sxx - sx*sx) * sqrt(n*syy - sy*sy)))
        |    * 1000000.0 + 0.5) / 1000000.0 AS autocorr
        |FROM s""".stripMargin))

  /** ACF correlogram of the daily-revenue series at calendar lags 1–7 —
    * the multi-lag extension of q_autocorr_lag1 and the table a
    * forecasting pipeline reads before picking model order (the weekly
    * seasonality shows up as the lag-7 spike). Uses the standard
    * correlogram convention: r_k = Σ(xₜ−x̄)(xₜ₊ₖ−x̄) / Σ(xₜ−x̄)², with
    * the GLOBAL mean and denominator shared across lags.
    *
    * Exactness: deviations are cross-multiplied integers
    * (n·centsₜ − Σcents, DECIMAL(38,0)), so numerator and denominator
    * are exact and r_e6 is a sign-split integral division — no double
    * anywhere (the q_kendall_tau_rows convention).
    *
    * Scale shape: one partial-aggregatable groupBy(day) over orders;
    * the lag pairing is a (7 × calendar-grid) self-join on
    * day = day₀ + k — bounded by the calendar at any corpus size. */
  private val acfTable = QueryDef(
    fn = (spark, dir) => {
      val dev = dailyDevGrid(spark, dir) // memoized with q_ljung_box
      val den = dev.agg(sum(col("dev") * col("dev")).as("den"),
        count(lit(1)).as("n_days"))
      val ks = spark.range(1, 8).select(col("id").as("lag"))
      dev.select(col("day").as("d0"), col("dev").as("dev0"))
        .crossJoin(broadcast(ks))
        .join(dev.select(col("day").as("d1"), col("dev").as("dev1")),
          expr("d1 = date_add(d0, CAST(lag AS INT))"))
        .groupBy(col("lag"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("dev0") * col("dev1")).as("num"))
        .crossJoin(broadcast(den))
        .select(col("lag"), col("n_pairs"),
          (when(col("num") < 0, -1L).otherwise(1L)
            * expr("(abs(num) * CAST(1000000 AS DECIMAL(38,0))) div den"))
            .as("r_e6"))
        .orderBy("lag")
    },
    oracle = Some(
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS c
        |  FROM orders GROUP BY 1),
        |st AS (SELECT COUNT(*) AS n, CAST(SUM(c) AS HUGEINT) AS s
        |  FROM daily),
        |dev AS (SELECT day, CAST(c AS HUGEINT) * n - s AS dev
        |  FROM daily CROSS JOIN st),
        |den AS (SELECT SUM(dev * dev) AS den FROM dev),
        |ks AS (SELECT unnest([1, 2, 3, 4, 5, 6, 7]) AS lag),
        |p AS (SELECT ks.lag, a.dev AS dev0, b.dev AS dev1
        |  FROM dev a CROSS JOIN ks
        |  JOIN dev b ON b.day = a.day + to_days(ks.lag)),
        |s AS (SELECT lag, COUNT(*) AS n_pairs, SUM(dev0 * dev1) AS num
        |  FROM p GROUP BY lag)
        |SELECT CAST(lag AS BIGINT) AS lag, n_pairs,
        |  CAST((CASE WHEN num < 0 THEN -1 ELSE 1 END)
        |    * ((abs(num) * 1000000) // den) AS BIGINT) AS r_e6
        |FROM s CROSS JOIN den ORDER BY lag""".stripMargin))

  /** Ljung–Box portmanteau test over the q_acf_table machinery: is the
    * daily-revenue series white noise, or does SOME autocorrelation
    * survive through lag 7? Q = n(n+2)·Σ_{k=1..7} r_k²/(n−k), rejected
    * against χ²(7) at α = 0.05 (14.067140) — the standard residual
    * diagnostic run after fitting any forecast model.
    *
    * Numeric discipline: r_k² = num_k²/den² from the SAME exact
    * cross-multiplied integer numerators/denominator as q_acf_table
    * (scale-0 DECIMAL → double casts are single correctly-rounded
    * conversions on both engines — the q_spearman_corr precedent);
    * each lag's term is composed in one fixed order, 9dp floor-pinned,
    * DECIMAL-summed, and Q finishes as one multiplication. The decision
    * compares two identical doubles.
    *
    * Scale shape: identical to q_acf_table — one groupBy(day) over
    * orders, then calendar-grid work only. */
  private val ljungBox = QueryDef(
    fn = (spark, dir) => {
      val dev = dailyDevGrid(spark, dir) // memoized with q_acf_table
      val den = dev.agg(sum(col("dev") * col("dev")).as("den"),
        count(lit(1)).as("n"))
      val ks = spark.range(1, 8).select(col("id").as("lag"))
      def dd(c: Column) = c.cast("double")
      val terms = dev.select(col("day").as("d0"), col("dev").as("dev0"))
        .crossJoin(broadcast(ks))
        .join(dev.select(col("day").as("d1"), col("dev").as("dev1")),
          expr("d1 = date_add(d0, CAST(lag AS INT))"))
        .groupBy(col("lag"))
        .agg(sum(col("dev0") * col("dev1")).as("num"))
        .crossJoin(broadcast(den))
        .select(col("n"),
          (floor(dd(col("num")) * dd(col("num"))
            / (dd(col("den")) * dd(col("den")))
            / (dd(col("n")) - dd(col("lag")))
            * 1e9 + 0.5) / 1e9).cast(DecimalType(28, 9)).as("term"))
      val s = terms.agg(max(col("n")).as("n"), count(lit(1)).as("lags"),
        sum(col("term")).as("tsum"))
      val q = dd(col("n")) * (dd(col("n")) + 2.0) * dd(col("tsum"))
      s.select(col("n").cast("long").as("n_days"),
        col("lags"),
        TextAnalysis.round6(q).as("q_stat"),
        (q > 14.067140).as("reject"))
    },
    oracle = Some(
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS c
        |  FROM orders GROUP BY 1),
        |st AS (SELECT COUNT(*) AS n, CAST(SUM(c) AS HUGEINT) AS s
        |  FROM daily),
        |dev AS (SELECT day, CAST(c AS HUGEINT) * n - s AS dev
        |  FROM daily CROSS JOIN st),
        |den AS (SELECT SUM(dev * dev) AS den, COUNT(*) AS n FROM dev),
        |ks AS (SELECT unnest([1, 2, 3, 4, 5, 6, 7]) AS lag),
        |nums AS (SELECT ks.lag, SUM(a.dev * b.dev) AS num
        |  FROM dev a CROSS JOIN ks
        |  JOIN dev b ON b.day = a.day + to_days(ks.lag)
        |  GROUP BY ks.lag),
        |t AS (SELECT n,
        |    CAST(floor(CAST(num AS DOUBLE) * CAST(num AS DOUBLE)
        |      / (CAST(den AS DOUBLE) * CAST(den AS DOUBLE))
        |      / (CAST(n AS DOUBLE) - CAST(lag AS DOUBLE))
        |      * 1000000000.0 + 0.5) / 1000000000.0 AS DECIMAL(28,9)) AS term
        |  FROM nums CROSS JOIN den),
        |s AS (SELECT MAX(n) AS n, COUNT(*) AS lags,
        |    CAST(SUM(term) AS DECIMAL(38,9)) AS tsum FROM t)
        |SELECT CAST(n AS BIGINT) AS n_days, lags,
        |  floor(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0)
        |    * CAST(tsum AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS q_stat,
        |  CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0)
        |    * CAST(tsum AS DOUBLE) > 14.067140 AS reject
        |FROM s""".stripMargin))

  /** Theil's U₂ forecast-skill ratio on the daily-revenue series: the
    * squared-error ratio of the SEASONAL-naive forecast (x_{t−7}, the
    * weekly ghost) against the naive forecast (x_{t−1}) — U₂ < 1 means
    * the weekly pattern genuinely predicts, the go/no-go check before
    * any fancier model (q_forecast_eval scores absolute errors; U₂ is
    * the scale-free skill RATIO). Evaluated over days where both lags
    * exist; cents differences square into DECIMAL(38,0) sums, and the
    * output u2_sq_e6 = ⌊Σ(x_{t−7}−x_t)²·10⁶ / Σ(x_{t−1}−x_t)²⌋ is one
    * integral division — no double anywhere; `seasonal_better` compares
    * the two exact sums directly.
    *
    * Scale shape: one partial-aggregatable groupBy(day) over orders;
    * both lag windows run on the calendar grid. */
  private val theilU2 = QueryDef(
    fn = (spark, dir) => {
      val d380 = DecimalType(38, 0)
      val daily = Tables.orders(spark, dir)
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
          .as("c"))
      val w = Window.orderBy(col("day"))
      val lagged = daily
        .withColumn("l1", lag(col("c"), 1).over(w))
        .withColumn("l7", lag(col("c"), 7).over(w))
        .filter(col("l1").isNotNull && col("l7").isNotNull)
      val s = lagged.agg(count(lit(1)).as("n_days"),
        sum((col("l1") - col("c")).cast(d380) * (col("l1") - col("c")))
          .as("ssq1"),
        sum((col("l7") - col("c")).cast(d380) * (col("l7") - col("c")))
          .as("ssq7"))
      s.select(col("n_days"),
        expr("(ssq7 * CAST(1000000 AS DECIMAL(38,0))) div ssq1")
          .as("u2_sq_e6"),
        (col("ssq7") < col("ssq1")).as("seasonal_better"))
    },
    oracle = Some(
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS c
        |  FROM orders GROUP BY 1),
        |l AS (SELECT c, lag(c, 1) OVER (ORDER BY day) AS l1,
        |    lag(c, 7) OVER (ORDER BY day) AS l7
        |  FROM daily),
        |s AS (SELECT COUNT(*) AS n_days,
        |    SUM(CAST(l1 - c AS HUGEINT) * (l1 - c)) AS ssq1,
        |    SUM(CAST(l7 - c AS HUGEINT) * (l7 - c)) AS ssq7
        |  FROM l WHERE l1 IS NOT NULL AND l7 IS NOT NULL)
        |SELECT n_days,
        |  CAST((ssq7 * 1000000) // ssq1 AS BIGINT) AS u2_sq_e6,
        |  ssq7 < ssq1 AS seasonal_better
        |FROM s""".stripMargin))

  /** Deterministic Poisson bootstrap (Chamandy et al., "Estimating
    * Uncertainty for Massive Data Streams", Google TR 2012): a 90% CI for
    * the mean event value WITHOUT resampling passes — each row's weight
    * in replica b is Poisson(1), inverted from the uniform
    * `hash(id:b)/2^32` through fixed CDF literals, so one scan feeds all
    * 32 replicas and the whole thing replays bit-identically in the
    * oracle (a seeded RNG would not: partition order differs across
    * engines). The replica explode is in-stage (×32 rows into a
    * map-side-combinable 32-group aggregation); the rank window that
    * picks the 2nd/31st replica means orders a 32-row frame. Weighted
    * sums run on the floor-quantized integer values in DECIMAL(38,0) —
    * the q_autocorr_lag1 discipline. */
  private val bootstrapCi = QueryDef(
    fn = (spark, dir) => {
      def d38(c: Column): Column = c.cast(DecimalType(38, 0))
      val q = Tables.events(spark, dir)
        .select(col("event_id"), floor(col("value") * 10000 + 0.5).cast("long").as("u"))
      val n = q.agg(count(lit(1)).as("n"))
      // 8 digests × 4 words = 32 uniforms per row: md5 is the per-row
      // cost floor, so the replica streams ride TokenHash32x4Expr's full
      // 128 digest bits instead of one 32-bit word each (2.0 s → 1.1 s)
      val wts = q.select(col("event_id"), col("u"),
          explode(expr("sequence(0, 7)")).as("g"))
        .select(col("u"), col("g"),
          posexplode(TextAnalysis.tokenHash32Words(
            concat(col("event_id").cast("string"), lit(":"), col("g").cast("string"))))
            .as(Seq("wi", "h")))
        .select(col("u"), (col("g") * 4 + col("wi")).as("b"),
          (col("h") / lit(4294967296.0)).as("p"))
        .withColumn("wt",
          when(col("p") < 0.36787944117144233, 0L)
            .when(col("p") < 0.73575888234288467, 1L)
            .when(col("p") < 0.91969860292860584, 2L)
            .when(col("p") < 0.98101184312384615, 3L)
            .otherwise(4L))
      val means = wts.groupBy(col("b"))
        .agg(sum(col("wt")).as("nw"), sum(d38(col("wt") * col("u"))).as("swu"))
        .select(col("b"),
          r6(col("swu").cast("string").cast("double")
            / col("nw").cast("double") / 10000.0).as("mean_b"))
        .withColumn("rn", row_number().over(
          Window.orderBy(col("mean_b"), col("b"))))
        // 32-row replica grid, memo-checkpointed: both CI bound filters
        // re-reference it, and each reference re-planned the events
        // scan (ScanCountLintSpec)
        .memoCheckpoint(spark, dir, "bootstrap_means")
      n.crossJoin(broadcast(means.filter(col("rn") === 2).select(col("mean_b").as("ci_lo"))))
        .crossJoin(broadcast(means.filter(col("rn") === 31).select(col("mean_b").as("ci_hi"))))
    },
    oracle = Some {
      s"""WITH q AS (SELECT event_id,
         |    CAST(floor(value * 10000 + 0.5) AS BIGINT) AS u FROM events),
         |dg AS (SELECT u, g,
         |    md5(CAST(event_id AS VARCHAR) || ':' || CAST(g AS VARCHAR)) AS mx
         |  FROM q, range(0, 8) t(g)),
         |r AS (SELECT u, g * 4 + wi AS b,
         |    list_reduce(list_concat([CAST(0 AS BIGINT)],
         |      list_transform(string_split(
         |          substr(mx, CAST(1 + 8 * wi AS INTEGER), 8), ''),
         |        ch -> CAST(strpos('0123456789abcdef', ch) - 1 AS BIGINT))),
         |      (acc, d) -> acc * 16 + d) / 4294967296.0 AS p
         |  FROM dg, range(0, 4) t2(wi)),
         |w AS (SELECT u, b, CASE WHEN p < 0.36787944117144233 THEN 0
         |                        WHEN p < 0.73575888234288467 THEN 1
         |                        WHEN p < 0.91969860292860584 THEN 2
         |                        WHEN p < 0.98101184312384615 THEN 3
         |                        ELSE 4 END AS wt FROM r),
         |m AS (SELECT b,
         |        floor((CAST(CAST(SUM(wt * u) AS VARCHAR) AS DOUBLE)
         |             / CAST(SUM(wt) AS DOUBLE) / 10000.0)
         |          * 1000000.0 + 0.5) / 1000000.0 AS mean_b
         |      FROM w GROUP BY b),
         |rk AS (SELECT mean_b, row_number() OVER (ORDER BY mean_b, b) AS rn
         |       FROM m)
         |SELECT (SELECT COUNT(*) FROM q) AS n,
         |  (SELECT mean_b FROM rk WHERE rn = 2) AS ci_lo,
         |  (SELECT mean_b FROM rk WHERE rn = 31) AS ci_hi""".stripMargin
    })

  /** Inter-arrival-regularity bot screen: per-user coefficient of
    * variation of event gaps — humans are bursty (cv ≈ 1 for Poisson
    * arrivals), schedulers are metronomic (cv → 0), so `cv < 0.1` is the
    * classic automation flag (and the fixture, being Poisson-ish,
    * correctly flags nobody). Gaps are exact integer microseconds
    * (`ts_ns div 1000`, the q_resample_ohlc ordering discipline) from ONE
    * lag window partitioned by the high-cardinality user key; power sums
    * accumulate in DECIMAL(38,0) and come back to double through the
    * VARCHAR cast (sxx exceeds 2^53 immediately); mean/cv replay the
    * oracle's expression tree and the flag compares the UNROUNDED cv so
    * rounding can't flip it at the boundary. Scale: one shuffle on
    * user_id, then a user-keyed aggregate — no global structure. */
  private val botRegularity = QueryDef(
    fn = (spark, dir) => {
      val us = expr("ts_ns div 1000")
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      val g = Tables.events(spark, dir)
        .select(col("user_id"), col("event_id"), us.as("us"))
        .withColumn("gap", col("us") - lag(col("us"), 1).over(w))
        .filter(col("gap").isNotNull)
      val d38 = (c: Column) => c.cast(DecimalType(38, 0))
      val s = g.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"),
          sum(d38(col("gap"))).cast("string").cast("double").as("sx"),
          sum(d38(col("gap")) * d38(col("gap"))).cast("string").cast("double").as("sxx"))
        .filter(col("n") >= 4)
      val cv = sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1.0)) /
        (col("sx") / col("n"))
      s.select(col("user_id"), col("n"),
          (floor(col("sx") / col("n") / 1e6 * 1000.0 + 0.5) / 1000.0).as("mean_gap_s"),
          (floor(cv * 1e6 + 0.5) / 1e6).as("cv"),
          (cv < 0.1).as("metronomic"))
        .orderBy("user_id")
    },
    oracle = Some(
      """WITH g AS (SELECT user_id,
        |    epoch_us(ts) - lag(epoch_us(ts)) OVER
        |      (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap
        |  FROM events),
        |s AS (SELECT user_id, COUNT(*) AS n,
        |    CAST(SUM(CAST(gap AS DECIMAL(38,0))) AS VARCHAR) AS sx_s,
        |    CAST(SUM(CAST(gap AS DECIMAL(38,0)) * CAST(gap AS DECIMAL(38,0)))
        |      AS VARCHAR) AS sxx_s
        |  FROM g WHERE gap IS NOT NULL GROUP BY user_id HAVING COUNT(*) >= 4),
        |c AS (SELECT user_id, n, CAST(sx_s AS DOUBLE) AS sx,
        |             CAST(sxx_s AS DOUBLE) AS sxx FROM s)
        |SELECT user_id, n,
        |  floor(sx / n / 1000000.0 * 1000.0 + 0.5) / 1000.0 AS mean_gap_s,
        |  floor((sqrt((sxx - sx * sx / n) / (n - 1.0)) / (sx / n))
        |    * 1000000.0 + 0.5) / 1000000.0 AS cv,
        |  (sqrt((sxx - sx * sx / n) / (n - 1.0)) / (sx / n)) < 0.1 AS metronomic
        |FROM c ORDER BY user_id""".stripMargin))

  // --- sweep-line interval concurrency --------------------------------------

  /** Peak session concurrency — the classic interval-overlap sweep line
    * (max concurrent sessions/connections/jobs), distributed. Sessions are
    * the repo's standard 30-minute-gap islands (identical arithmetic to
    * q_sessionize); each closed interval [start, end] emits a +1/-1
    * endpoint pair, and the peak is the maximum of the running endpoint
    * sum ordered by (ts, starts-before-ends).
    *
    * Scale shape: the running sum is NOT a single-partition global window —
    * endpoints are `repartitionByRange` on ts, each partition computes its
    * local running sum, and the per-partition exclusive offsets come from
    * a numPartitions-scalar totals collect folded into a CASE literal (the
    * zipWithIndex/packBins pattern; driver state is partition-count-sized
    * metadata). The final reduction is a single `max(struct(run, -ts))` —
    * peak and its earliest timestamp in one aggregate, no second pass over
    * the data. Although ties on (ts, delta) make per-row `run` values
    * order-dependent, the MULTISET of running values within a timestamp is
    * permutation-invariant (+1 steps walk up a fixed ladder, -1 steps walk
    * back down), so (peak, first_peak_us) is deterministic and the
    * oracle's plain windowed running sum agrees.
    */
  private val concurrencyPeak = QueryDef(
    fn = (spark, dir) => {
      val gapUs = 30L * 60 * 1000000L
      val wu = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      val sessions = Tables.events(spark, dir)
        .select(col("user_id"), expr("ts_ns div 1000").as("ts_us"), col("event_id"))
        .withColumn("new_sess",
          when(col("ts_us") - lag(col("ts_us"), 1).over(wu) > gapUs, 1).otherwise(0))
        .withColumn("session_id", sum(col("new_sess"))
          .over(wu.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_id"))
        .agg(min(col("ts_us")).as("s"), max(col("ts_us")).as("e"))
        .localCheckpoint(false)
      val endpoints = sessions.select(col("s").as("ts"), lit(1).as("delta"))
        .unionAll(sessions.select(col("e").as("ts"), lit(-1).as("delta")))
      val parts = endpoints.repartitionByRange(col("ts"))
        .withColumn("__pid", spark_partition_id())
        .localCheckpoint(false) // totals pass + final pass share one compute
      val totals = parts.groupBy(col("__pid")).agg(sum(col("delta")).as("d"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
      var acc = 0L
      val excl = totals.map { case (p, d) => val o = p -> acc; acc += d; o }.toMap
      val offset = totals.map(_._1).foldLeft(lit(0L)) { (rest, p) =>
        when(col("__pid") === p, lit(excl(p))).otherwise(rest)
      }
      val w = Window.partitionBy(col("__pid"))
        .orderBy(col("ts").asc, col("delta").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      parts
        .withColumn("run", sum(col("delta")).over(w) + offset)
        .agg(
          sum(when(col("delta") === 1, 1L).otherwise(0L)).as("n_sessions"),
          max(struct(col("run"), (-col("ts")).as("nts"))).as("m"))
        .select(col("n_sessions"), col("m.run").as("peak"),
          (-col("m.nts")).as("first_peak_us"))
    },
    oracle = Some(
      """WITH flagged AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts), 1) OVER (
        |           PARTITION BY user_id ORDER BY ts, event_id)
        |         > CAST(30 AS BIGINT) * 60 * 1000000 THEN 1 ELSE 0 END AS new_sess
        |  FROM events),
        |sess0 AS (
        |  SELECT user_id, ts_us,
        |    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM flagged),
        |sess AS (SELECT user_id, session_id, MIN(ts_us) AS s, MAX(ts_us) AS e
        |         FROM sess0 GROUP BY user_id, session_id),
        |ep AS (SELECT s AS ts, 1 AS delta FROM sess
        |       UNION ALL SELECT e AS ts, -1 AS delta FROM sess),
        |rs AS (SELECT ts, delta,
        |         CAST(SUM(delta) OVER (ORDER BY ts, delta DESC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run
        |       FROM ep),
        |m AS (SELECT MAX(run) AS peak FROM rs)
        |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM sess) AS n_sessions,
        |  m.peak AS peak,
        |  (SELECT MIN(ts) FROM rs WHERE run = m.peak) AS first_peak_us
        |FROM m""".stripMargin))

  /** Revenue-concentration profile per market segment: Gini coefficient,
    * Herfindahl-Hirschman index, and CR-1/CR-10 concentration ratios of
    * per-customer order revenue — the inequality readouts a marketplace /
    * data-mix dashboard bolts onto the warehouse (and the same math that
    * scores token-budget concentration across corpus sources). Population
    * = customers with ≥ 1 order (declared). All statistics are EXACT
    * integer arithmetic on ¢-quantized revenue: Gini via the sorted-rank
    * identity G = (2Σi·vᵢ − (n+1)Σv) / (n·Σv) with ties broken
    * deterministically by customer key; HHI = Σv² / (Σv)²; CR-k = top-k
    * revenue share. Every emitted ratio is ⌊·10⁶⌋ via DECIMAL(38,0)
    * integral division (non-negative numerators, so floor = truncate on
    * both engines) — no double anywhere in the plan.
    *
    * Scale shape: the orders scan collapses to per-customer sums in one
    * partial-aggregatable shuffle; the segment dimension broadcasts; the
    * rank windows partition by segment (segment-parallel sorts over the
    * CUSTOMER-grain frame, ≪ fact grain); the final rollup is
    * segment-domain-sized. No unpartitioned window, no fact-grain sort.
    */
  private val concentration = QueryDef(
    fn = (spark, dir) => {
      val d380s = "CAST(rev_cents AS DECIMAL(38,0))"
      val rev = Tables.orders(spark, dir)
        .select(col("o_custkey"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
        .groupBy(col("o_custkey")).agg(sum(col("cents")).as("v"))
        .join(broadcast(Tables.customer(spark, dir)
          .select(col("c_custkey").as("o_custkey"),
            col("c_mktsegment").as("segment"))), "o_custkey")
      val wAsc = Window.partitionBy(col("segment"))
        .orderBy(col("v").asc, col("o_custkey").asc)
      val wDesc = Window.partitionBy(col("segment"))
        .orderBy(col("v").desc, col("o_custkey").asc)
      rev
        .withColumn("i", row_number().over(wAsc))
        .withColumn("rd", row_number().over(wDesc))
        .groupBy(col("segment"))
        .agg(count(lit(1)).as("n_cust"),
          sum(col("v")).as("rev_cents"),
          sum(col("i").cast(DecimalType(38, 0)) * col("v")).as("siv"),
          sum(col("v").cast(DecimalType(38, 0)) * col("v")).as("sv2"),
          sum(when(col("rd") <= 1, col("v")).otherwise(0L)).as("top1"),
          sum(when(col("rd") <= 10, col("v")).otherwise(0L)).as("top10"))
        .select(col("segment"), col("n_cust"), col("rev_cents"),
          expr("((2 * siv - (CAST(n_cust AS DECIMAL(38,0)) + 1)" +
            s" * $d380s) * CAST(1000000 AS DECIMAL(38,0)))" +
            s" div (CAST(n_cust AS DECIMAL(38,0)) * $d380s)").as("gini_e6"),
          expr("(sv2 * CAST(1000000 AS DECIMAL(38,0)))" +
            s" div ($d380s * $d380s)").as("hhi_e6"),
          expr(s"(CAST(top1 AS DECIMAL(38,0))" +
            s" * CAST(1000000 AS DECIMAL(38,0))) div $d380s").as("cr1_e6"),
          expr(s"(CAST(top10 AS DECIMAL(38,0))" +
            s" * CAST(1000000 AS DECIMAL(38,0))) div $d380s").as("cr10_e6"))
        .orderBy("segment")
    },
    oracle = Some(
      """WITH rev AS (SELECT o_custkey,
        |    SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS v
        |  FROM orders GROUP BY 1),
        |seg AS (SELECT rev.o_custkey, v, c_mktsegment AS segment
        |  FROM rev JOIN customer ON o_custkey = c_custkey),
        |rk AS (SELECT segment, v,
        |    row_number() OVER (PARTITION BY segment
        |      ORDER BY v ASC, o_custkey ASC) AS i,
        |    row_number() OVER (PARTITION BY segment
        |      ORDER BY v DESC, o_custkey ASC) AS rd
        |  FROM seg),
        |g AS (SELECT segment, COUNT(*) AS n_cust,
        |    SUM(v) AS rev_cents,
        |    SUM(CAST(i AS HUGEINT) * v) AS siv,
        |    SUM(CAST(v AS HUGEINT) * v) AS sv2,
        |    SUM(CASE WHEN rd <= 1 THEN v ELSE 0 END) AS top1,
        |    SUM(CASE WHEN rd <= 10 THEN v ELSE 0 END) AS top10
        |  FROM rk GROUP BY 1)
        |SELECT segment, CAST(n_cust AS BIGINT) AS n_cust,
        |  CAST(rev_cents AS BIGINT) AS rev_cents,
        |  CAST(((2 * siv - (CAST(n_cust AS HUGEINT) + 1)
        |      * CAST(rev_cents AS HUGEINT)) * 1000000)
        |    // (CAST(n_cust AS HUGEINT) * CAST(rev_cents AS HUGEINT))
        |    AS BIGINT) AS gini_e6,
        |  CAST((sv2 * 1000000) // (CAST(rev_cents AS HUGEINT)
        |    * CAST(rev_cents AS HUGEINT)) AS BIGINT) AS hhi_e6,
        |  CAST((CAST(top1 AS HUGEINT) * 1000000)
        |    // CAST(rev_cents AS HUGEINT) AS BIGINT) AS cr1_e6,
        |  CAST((CAST(top10 AS HUGEINT) * 1000000)
        |    // CAST(rev_cents AS HUGEINT) AS BIGINT) AS cr10_e6
        |FROM g ORDER BY segment""".stripMargin))

  val defs: Map[String, QueryDef] = Map(
    "q_concentration" -> concentration,
    "q_bot_regularity" -> botRegularity,
    "q_concurrency_peak" -> concurrencyPeak,
    "q_autocorr_lag1" -> autocorrLag1,
    "q_acf_table" -> acfTable,
    "q_ljung_box" -> ljungBox,
    "q_theil_u2" -> theilU2,
    "q_bootstrap_ci" -> bootstrapCi,
    "q_corr_matrix" -> corrMatrix,
    "q_partial_corr" -> partialCorr,
    "q_stats_agg" -> statsAgg,
    "q_outlier_zscore" -> outlierZscore,
    "q_minmax_by" -> minmaxBy,
    "q_window_ranks" -> windowRanks,
    "q_range_window" -> rangeWindow,
    "q_grouping_sets" -> groupingSets,
    "q_in_subquery" -> inSubquery,
    "q_ship_priority" -> shipPriority,
    "q_sales_opportunity" -> salesOpportunity,
    "q_recursive_cte" -> recursiveCte,
    "q_lateral_topk" -> lateralTopk,
    "q_market_share" -> marketShare,
    "q_sole_late_supplier" -> soleLateSupplier,
    "q_local_supplier_volume" -> localSupplierVolume,
    "q_nation_trade_volume" -> nationTradeVolume,
    "q_promo_revenue" -> promoRevenue,
    "q_returned_items" -> returnedItems,
    "q_full_outer" -> fullOuter,
    "q_unpivot" -> unpivotQ,
    "q_posexplode" -> posExplode,
    "q_bitwise" -> bitwiseQ,
    "q_emb_quantize" -> embQuantize)
}
