package graft.queries

import graft.QueryDef
import graft.ops.{Tables, TextAnalysis}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-8 warehouse-analytics breadth: the classic derived-table builders
  * a user of the reference's ETL would reach for next once the data lives
  * in an engine instead of a pandas script — SCD2 dimension construction
  * (the generalization of the reference's keyed upsert history,
  * `scripts/pricenow_etl.py:98-112`, to full version intervals),
  * ordered-step funnels, weekly cohort retention, and grouped OLS
  * regression from exact sufficient statistics.
  *
  * Numeric discipline matches AnalyticQueries: integer/µs arithmetic
  * wherever possible, DECIMAL power sums for anything that feeds a double,
  * the shared floor-form round6 on every derived double, and DuckDB twins
  * that replay the identical expression tree.
  */
object WarehouseQueries {

  private def dec(c: Column): Column = c.cast(DecimalType(12, 4))
  private def r6(c: Column): Column = TextAnalysis.round6(c)

  // --- SCD2 dimension build -------------------------------------------------

  /** Slowly-changing-dimension type 2 from an event stream: per user,
    * collapse consecutive runs of the tracked attribute (event_type) into
    * versioned rows with [valid_from, valid_to) intervals and an
    * is_current flag — gaps-and-islands via lag + conditional running sum,
    * then lead() for the interval close. One shuffle on user_id serves
    * both window passes and the run aggregation (same partitioning);
    * the lead() pass reuses it too. Timestamps stay integer µs end-to-end
    * (the repo's shared exact time unit — see CoreQueries.sessionize).
    * At 100 TB this partitions by the entity key with O(1) state per
    * window frame — no skew risk beyond a single entity's history.
    */
  private val scd2Build = QueryDef(
    fn = (spark, dir) => {
      val ev = Tables.events(spark, dir)
        .select(col("user_id"), expr("ts_ns div 1000").as("ts_us"),
          col("event_id"), col("event_type"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      val prev = lag(col("event_type"), 1).over(w)
      val versions = ev
        .withColumn("chg", when(prev.isNull || prev =!= col("event_type"), 1).otherwise(0))
        .withColumn("version",
          sum(col("chg")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("version"))
        .agg(min(col("event_type")).as("state"), // constant within a run
          min(col("ts_us")).as("valid_from_us"),
          count(lit(1)).as("n_events"))
      val wu = Window.partitionBy(col("user_id")).orderBy(col("version"))
      versions
        .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(wu))
        .withColumn("is_current", col("valid_to_us").isNull)
        .orderBy("user_id", "version")
    },
    oracle = Some(
      """WITH flagged AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type,
        |    CASE WHEN lag(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) IS NULL
        |           OR lag(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) <> event_type
        |         THEN 1 ELSE 0 END AS chg
        |  FROM events),
        |v AS (
        |  SELECT user_id, ts_us, event_type,
        |    CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS version
        |  FROM flagged),
        |g AS (
        |  SELECT user_id, version, MIN(event_type) AS state,
        |    MIN(ts_us) AS valid_from_us, COUNT(*) AS n_events
        |  FROM v GROUP BY user_id, version)
        |SELECT user_id, version, state, valid_from_us, n_events,
        |  lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY version) AS valid_to_us,
        |  (lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY version) IS NULL) AS is_current
        |FROM g ORDER BY user_id, version""".stripMargin))

  // --- ordered-step funnel --------------------------------------------------

  /** Three-stage strictly-ordered funnel over the event stream:
    * signup → first view strictly after it → first purchase strictly after
    * that, counted per user. Each stage is a groupBy on user_id joined back
    * to the (already user-keyed) next event filter — the stage frames are
    * user-count-sized, so every join after the first aggregation is
    * broadcast-able; no stage re-shuffles the full event table more than
    * once. Output is a single summary row (stage counts + conversion
    * rates), so the final singleton crossJoins are 1-row scalar broadcasts.
    */
  private val funnelSteps = QueryDef(
    fn = (spark, dir) => {
      val ev = Tables.events(spark, dir)
        .select(col("user_id"), expr("ts_ns div 1000").as("ts_us"), col("event_type"))
      val s1 = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("ts_us")).as("t1"))
      val s2 = ev.filter(col("event_type") === "view")
        .join(broadcast(s1), "user_id").filter(col("ts_us") > col("t1"))
        .groupBy(col("user_id")).agg(min(col("ts_us")).as("t2"))
      val s3 = ev.filter(col("event_type") === "purchase")
        .join(broadcast(s2), "user_id").filter(col("ts_us") > col("t2"))
        .groupBy(col("user_id")).agg(min(col("ts_us")).as("t3"))
      s1.agg(count(lit(1)).as("n_signup"))
        .crossJoin(s2.agg(count(lit(1)).as("n_view_after")))
        .crossJoin(s3.agg(count(lit(1)).as("n_purchase_after")))
        .select(col("n_signup"), col("n_view_after"), col("n_purchase_after"),
          when(col("n_signup") > 0,
            r6(col("n_view_after").cast("double") / col("n_signup").cast("double")))
            .as("view_rate"),
          when(col("n_signup") > 0,
            r6(col("n_purchase_after").cast("double") / col("n_signup").cast("double")))
            .as("purchase_rate"))
    },
    oracle = Some(
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_type FROM events),
        |s1 AS (SELECT user_id, MIN(ts_us) AS t1 FROM e WHERE event_type = 'signup' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, MIN(ts_us) AS t2 FROM e JOIN s1 USING (user_id)
        |       WHERE event_type = 'view' AND ts_us > t1 GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, MIN(ts_us) AS t3 FROM e JOIN s2 USING (user_id)
        |       WHERE event_type = 'purchase' AND ts_us > t2 GROUP BY e.user_id),
        |c AS (SELECT (SELECT COUNT(*) FROM s1) AS n_signup,
        |             (SELECT COUNT(*) FROM s2) AS n_view_after,
        |             (SELECT COUNT(*) FROM s3) AS n_purchase_after)
        |SELECT n_signup, n_view_after, n_purchase_after,
        |  CASE WHEN n_signup > 0 THEN
        |    floor((CAST(n_view_after AS DOUBLE) / CAST(n_signup AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0
        |  END AS view_rate,
        |  CASE WHEN n_signup > 0 THEN
        |    floor((CAST(n_purchase_after AS DOUBLE) / CAST(n_signup AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0
        |  END AS purchase_rate
        |FROM c""".stripMargin))

  // --- weekly cohort retention ----------------------------------------------

  /** Cohort retention matrix: users grouped by the ISO week (Monday start)
    * of their first event; for each later active week, the count of cohort
    * members still active at that week offset. Two aggregations over one
    * event scan — the distinct (user, week) projection collapses the
    * stream before the cohort join, and the cohort frame is
    * user-count-sized (broadcast side). Week arithmetic stays on
    * Monday-aligned DATEs, so the day-diff is exactly divisible by 7 and
    * the integral division is lossless in both engines.
    */
  private val cohortRetention = QueryDef(
    fn = (spark, dir) => {
      val e = Tables.events(spark, dir).select(col("user_id"), to_date(col("ts")).as("d"))
      val cohort = e.groupBy(col("user_id")).agg(min(col("d")).as("first_d"))
        .select(col("user_id"), to_date(date_trunc("week", col("first_d"))).as("cohort_wk"))
      val active = e.select(col("user_id"), to_date(date_trunc("week", col("d"))).as("act_wk"))
        .distinct()
      active.join(broadcast(cohort), "user_id")
        .select(col("cohort_wk"),
          expr("datediff(act_wk, cohort_wk) div 7").as("week_offset"), col("user_id"))
        .groupBy(col("cohort_wk"), col("week_offset"))
        .agg(count(lit(1)).as("n_users")) // (user, week) already distinct
        .orderBy("cohort_wk", "week_offset")
    },
    oracle = Some(
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
        |c AS (SELECT user_id, date_trunc('week', MIN(d)) AS cohort_wk FROM e GROUP BY user_id),
        |a AS (SELECT DISTINCT user_id, date_trunc('week', d) AS act_wk FROM e)
        |SELECT cohort_wk,
        |  CAST(datediff('day', cohort_wk, act_wk) // 7 AS BIGINT) AS week_offset,
        |  COUNT(*) AS n_users
        |FROM a JOIN c USING (user_id)
        |GROUP BY cohort_wk, week_offset
        |ORDER BY cohort_wk, week_offset""".stripMargin))

  // --- grouped OLS from exact sufficient statistics -------------------------

  /** Per-group simple linear regression (extendedprice on quantity):
    * slope / intercept / R² computed from DECIMAL power sums in one
    * aggregate pass — the regr_slope/regr_intercept/regr_r2 family, but
    * with engine-portable exact partials instead of order-dependent double
    * accumulation (same discipline and oracle tricks as
    * AnalyticQueries.statsAgg). The sufficient-statistics shape is the
    * 100 TB story: a map-side-combinable aggregate of five sums replaces
    * any per-group data pass, so model fitting costs one shuffle of six
    * numbers per group.
    */
  private val regrOls = QueryDef(
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
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      agg.select(
          col("l_returnflag"),
          col("n"),
          r6(slope).as("slope"),
          r6((sy - slope * sx) / n).as("intercept"),
          r6(((n * sxy - sx * sy) * (n * sxy - sx * sy)) /
            ((n * sxx - sx * sx) * (n * syy - sy * sy))).as("r2"))
        .orderBy("l_returnflag")
    },
    oracle = Some(
      // identical cast/roundtrip rationale as statsAgg's oracle: DECIMAL(19,4)
      // factors for int128 products, VARCHAR->DOUBLE for strtod single-rounding
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
        |  floor(((n * sxy - sx * sy) / (n * sxx - sx * sx)) * 1000000.0 + 0.5) / 1000000.0 AS slope,
        |  floor(((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n) * 1000000.0 + 0.5) / 1000000.0 AS intercept,
        |  floor((((n * sxy - sx * sy) * (n * sxy - sx * sy))
        |         / ((n * sxx - sx * sx) * (n * syy - sy * sy))) * 1000000.0 + 0.5) / 1000000.0 AS r2
        |FROM s ORDER BY l_returnflag""".stripMargin))

  val defs: Map[String, QueryDef] = Map(
    "q_scd2_build" -> scd2Build,
    "q_funnel_steps" -> funnelSteps,
    "q_cohort_retention" -> cohortRetention,
    "q_regr_ols" -> regrOls)
}
