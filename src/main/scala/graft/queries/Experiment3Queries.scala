package graft.queries

import graft.QueryDef
import graft.ops.{Tables, TextAnalysis}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Sequential / adaptive experimentation readouts: Wald's SPRT over the
  * daily conversion stream (stop an experiment the day the evidence
  * crosses a boundary, instead of waiting for the fixed-horizon
  * q_ab_test), a UCB1 multi-armed-bandit score board (which arm an
  * adaptive allocator would pull next, per day), and a stratified
  * inverse-propensity ATE estimate (the weighting counterpart of
  * q_psm_match's matching estimator).
  *
  * Numeric discipline: SPRT's log-likelihood-ratio increments are
  * LITERAL micro-nat integers (ln(p1/p0) etc. pre-rounded to 6dp and
  * embedded as constants), so the cumulative LLR and every boundary
  * decision are exact long arithmetic — no transcendental is evaluated
  * by either engine. UCB and IPW compose their doubles identically on
  * both engines from exact integer sufficient statistics and 6dp/9dp
  * floor-pin before any cross-row sum (the ExperimentQueries
  * discipline).
  *
  * Scale shape: SPRT and UCB collapse facts to the ~30-day (× 5-arm)
  * grid in one partial-aggregatable shuffle; windows run on the grid,
  * never on facts. IPW is one groupBy to 25 stratum rows plus scalar
  * arithmetic.
  */
object Experiment3Queries {

  private def r6(c: Column): Column = TextAnalysis.round6(c)
  private val d289 = DecimalType(28, 9)
  private def f9(c: Column): Column = (floor(c * 1e9 + 0.5) / 1e9).cast(d289)

  // --- Wald SPRT -------------------------------------------------------------

  /** Sequential probability ratio test on the purchase conversion rate
    * (value ≥ 150 — the q_ab_test conversion), H0: p = 0.04 vs
    * H1: p = 0.06, α = 0.05, β = 0.2. Observations accumulate in day
    * order; after day d the LLR is X·ln(p1/p0) + (N−X)·ln(q1/q0) with
    * X = cumulative conversions, N = cumulative purchases. The four
    * transcendentals are pre-rounded 6dp literals in MICRO-NATS
    * (ln(1.5) → 405465, ln(0.94/0.96) → −21053, ln(0.8/0.05) → 2772589,
    * ln(0.2/0.95) → −1558145), so llr_micronats and the three-way
    * decision are exact 64-bit integer arithmetic on both engines.
    * `decision` is the state AFTER that day's batch; a production
    * monitor would stop at the first non-continue day (sequential tests
    * batch by day in practice — per-event boundaries are
    * scan-order-dependent and unreproducible on a parallel engine).
    */
  private val sprt = QueryDef(
    fn = (spark, dir) => {
      val l1 = 405465L     // micro-nats: ln(0.06/0.04)
      val l0 = -21053L     // micro-nats: ln(0.94/0.96)
      val a = 2772589L     // ln((1-beta)/alpha) = ln(16)
      val b = -1558145L    // ln(beta/(1-alpha)) = ln(0.2/0.95)
      val daily = Tables.events(spark, dir)
        .filter(col("event_type") === "purchase")
        .groupBy(to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("value") >= 150, 1L).otherwise(0L)).as("x"))
      val w = Window.orderBy(col("d"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily
        .withColumn("cum_n", sum(col("n")).over(w))
        .withColumn("cum_x", sum(col("x")).over(w))
        .withColumn("llr_u",
          col("cum_x") * l1 + (col("cum_n") - col("cum_x")) * l0)
        .select(col("d"), col("n"), col("x"), col("cum_n"), col("cum_x"),
          (col("llr_u").cast("double") / 1e6).as("llr"),
          when(col("llr_u") >= a, "accept_h1")
            .when(col("llr_u") <= b, "accept_h0")
            .otherwise("continue").as("decision"))
        .orderBy("d")
    },
    oracle = Some(
      """WITH daily AS (SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n,
        |    CAST(SUM(CASE WHEN value >= 150 THEN 1 ELSE 0 END) AS BIGINT) AS x
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |cum AS (SELECT d, n, x,
        |    CAST(SUM(n) OVER (ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n,
        |    CAST(SUM(x) OVER (ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_x
        |  FROM daily),
        |llr AS (SELECT *, cum_x * 405465 + (cum_n - cum_x) * (-21053) AS llr_u
        |  FROM cum)
        |SELECT d, n, x, cum_n, cum_x,
        |  CAST(llr_u AS DOUBLE) / 1000000.0 AS llr,
        |  CASE WHEN llr_u >= 2772589 THEN 'accept_h1'
        |       WHEN llr_u <= -1558145 THEN 'accept_h0'
        |       ELSE 'continue' END AS decision
        |FROM llr ORDER BY d""".stripMargin))

  // --- UCB1 bandit board -----------------------------------------------------

  /** UCB1 score board: arms are the five event types, reward is the
    * conversion (value ≥ 150), and for every (day, arm) on the full
    * day × arm grid the board shows cumulative plays/wins and the UCB1
    * index mean + √(2·ln N / n) an adaptive allocator would rank arms by
    * at the START of the next day; `chosen` marks the argmax (arm-name
    * tie-break). Arms not yet played score NULL and rank behind every
    * scored arm (production UCB forces one initial play per arm; the
    * coalesce(−1) in the rank pins the same order on both engines).
    *
    * The grid is days × arms (domain-sized, broadcast cross join); facts
    * collapse to it in one partial-aggregatable shuffle; cumulative
    * sums and the per-day rank are grid windows.
    */
  private val ucbBandit = QueryDef(
    fn = (spark, dir) => {
      val daily = Tables.events(spark, dir)
        .groupBy(to_date(col("ts")).as("d"), col("event_type").as("arm"))
        .agg(count(lit(1)).as("plays"),
          sum(when(col("value") >= 150, 1L).otherwise(0L)).as("wins"))
        .localCheckpoint(false)
      val grid = daily.select(col("d")).distinct()
        .crossJoin(broadcast(daily.select(col("arm")).distinct()))
      val wc = Window.partitionBy(col("arm")).orderBy(col("d"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = grid.join(daily, Seq("d", "arm"), "left")
        .select(col("d"), col("arm"),
          coalesce(col("plays"), lit(0L)).as("plays"),
          coalesce(col("wins"), lit(0L)).as("wins"))
        .withColumn("cum_n", sum(col("plays")).over(wc))
        .withColumn("cum_w", sum(col("wins")).over(wc))
        .withColumn("total_n",
          sum(col("cum_n")).over(Window.partitionBy(col("d"))))
      val scored = cum.withColumn("ucb",
        when(col("cum_n") === 0, lit(null).cast("double"))
          .otherwise(r6(
            col("cum_w").cast("double") / col("cum_n").cast("double")
              + sqrt(lit(2.0) * log(col("total_n").cast("double"))
                / col("cum_n").cast("double")))))
      scored.withColumn("chosen",
          rank().over(Window.partitionBy(col("d"))
            .orderBy(coalesce(col("ucb"), lit(-1.0)).desc, col("arm"))) === 1)
        .select(col("d"), col("arm"), col("cum_n"), col("cum_w"),
          col("ucb"), col("chosen"))
        .orderBy("d", "arm")
    },
    oracle = Some(
      """WITH daily AS (SELECT CAST(ts AS DATE) AS d, event_type AS arm,
        |    COUNT(*) AS plays,
        |    CAST(SUM(CASE WHEN value >= 150 THEN 1 ELSE 0 END) AS BIGINT) AS wins
        |  FROM events GROUP BY 1, 2),
        |grid AS (SELECT d, arm FROM (SELECT DISTINCT d FROM daily)
        |         CROSS JOIN (SELECT DISTINCT arm FROM daily)),
        |filled AS (SELECT g.d, g.arm,
        |    COALESCE(daily.plays, 0) AS plays, COALESCE(daily.wins, 0) AS wins
        |  FROM grid g LEFT JOIN daily ON g.d = daily.d AND g.arm = daily.arm),
        |cum AS (SELECT d, arm,
        |    CAST(SUM(plays) OVER (PARTITION BY arm ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n,
        |    CAST(SUM(wins) OVER (PARTITION BY arm ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_w
        |  FROM filled),
        |tot AS (SELECT *, CAST(SUM(cum_n) OVER (PARTITION BY d) AS BIGINT)
        |    AS total_n FROM cum),
        |scored AS (SELECT d, arm, cum_n, cum_w,
        |    CASE WHEN cum_n = 0 THEN NULL
        |         ELSE floor((CAST(cum_w AS DOUBLE) / CAST(cum_n AS DOUBLE)
        |           + sqrt(2.0 * ln(CAST(total_n AS DOUBLE))
        |                  / CAST(cum_n AS DOUBLE)))
        |           * 1000000.0 + 0.5) / 1000000.0 END AS ucb
        |  FROM tot)
        |SELECT d, arm, cum_n, cum_w, ucb,
        |  rank() OVER (PARTITION BY d
        |    ORDER BY COALESCE(ucb, -1.0) DESC, arm) = 1 AS chosen
        |FROM scored ORDER BY d, arm""".stripMargin))

  // --- stratified IPW ATE ----------------------------------------------------

  /** Stratified inverse-propensity-weighted average treatment effect:
    * treatment = AUTOMOBILE segment (the q_psm_match cohort), outcome =
    * account balance, strata = nation. Within stratum s the propensity
    * is nt_s/n_s, so the Horvitz-Thompson terms collapse to
    * n_s·(Σ_t Y)/nt_s and n_s·(Σ_c Y)/nc_s — pure ratios of exact
    * integer sufficient statistics. Strata lacking either group are
    * excluded (positivity); `n_used` reports the population the
    * estimate actually covers, next to the naive mean difference the
    * weighting is supposed to de-bias.
    *
    * One groupBy to 25 stratum rows; per-stratum doubles are 9dp-floored
    * DECIMALs summed exactly; output 6dp doubles in dollars.
    */
  private val ipwAte = QueryDef(
    fn = (spark, dir) => {
      val cents = floor(col("c_acctbal") * 100 + 0.5).cast("long")
      val isT = col("c_mktsegment") === "AUTOMOBILE"
      val strata = Tables.customer(spark, dir)
        .select(col("c_nationkey").as("s"), isT.as("t"), cents.as("y"))
        .groupBy(col("s"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("t"), 1L).otherwise(0L)).as("nt"),
          sum(when(col("t"), col("y")).otherwise(0L)).as("syt"),
          sum(when(!col("t"), col("y")).otherwise(0L)).as("syc"))
      val used = strata.filter(col("nt") > 0 && col("nt") < col("n"))
      val agg = used.agg(
        count(lit(1)).as("n_strata"),
        sum(col("n")).as("n_used"),
        sum(f9(col("n").cast("double") * col("syt").cast("double")
          / col("nt").cast("double"))).cast(DecimalType(38, 9)).as("s1"),
        sum(f9(col("n").cast("double") * col("syc").cast("double")
          / (col("n") - col("nt")).cast("double"))).cast(DecimalType(38, 9)).as("s0"))
      val naive = strata.agg(
        sum(col("syt")).as("syt_t"), sum(col("nt")).as("nt_t"),
        sum(col("syc")).as("syc_t"), (sum(col("n")) - sum(col("nt"))).as("nc_t"))
      agg.crossJoin(broadcast(naive))
        .select(col("n_strata"), col("n_used"),
          r6((col("s1").cast("double") - col("s0").cast("double"))
            / col("n_used").cast("double") / 100.0).as("ate_ipw"),
          r6((col("syt_t").cast("double") / col("nt_t").cast("double")
            - col("syc_t").cast("double") / col("nc_t").cast("double"))
            / 100.0).as("ate_naive"))
    },
    oracle = Some(
      """WITH c AS (SELECT c_nationkey AS s,
        |    c_mktsegment = 'AUTOMOBILE' AS t,
        |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS y FROM customer),
        |strata AS (SELECT s, COUNT(*) AS n,
        |    CAST(SUM(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS nt,
        |    CAST(SUM(CASE WHEN t THEN y ELSE 0 END) AS BIGINT) AS syt,
        |    CAST(SUM(CASE WHEN NOT t THEN y ELSE 0 END) AS BIGINT) AS syc
        |  FROM c GROUP BY s),
        |used AS (SELECT * FROM strata WHERE nt > 0 AND nt < n),
        |agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
        |    CAST(SUM(n) AS BIGINT) AS n_used,
        |    CAST(SUM(CAST(floor(CAST(n AS DOUBLE) * CAST(syt AS DOUBLE)
        |        / CAST(nt AS DOUBLE) * 1000000000.0 + 0.5) / 1000000000.0
        |      AS DECIMAL(28,9))) AS DECIMAL(38,9)) AS s1,
        |    CAST(SUM(CAST(floor(CAST(n AS DOUBLE) * CAST(syc AS DOUBLE)
        |        / CAST(n - nt AS DOUBLE) * 1000000000.0 + 0.5) / 1000000000.0
        |      AS DECIMAL(28,9))) AS DECIMAL(38,9)) AS s0
        |  FROM used),
        |naive AS (SELECT CAST(SUM(syt) AS BIGINT) AS syt_t,
        |    CAST(SUM(nt) AS BIGINT) AS nt_t,
        |    CAST(SUM(syc) AS BIGINT) AS syc_t,
        |    CAST(SUM(n) - SUM(nt) AS BIGINT) AS nc_t FROM strata)
        |SELECT n_strata, n_used,
        |  floor((CAST(s1 AS DOUBLE) - CAST(s0 AS DOUBLE))
        |    / CAST(n_used AS DOUBLE) / 100.0 * 1000000.0 + 0.5)
        |    / 1000000.0 AS ate_ipw,
        |  floor((CAST(syt_t AS DOUBLE) / CAST(nt_t AS DOUBLE)
        |    - CAST(syc_t AS DOUBLE) / CAST(nc_t AS DOUBLE)) / 100.0
        |    * 1000000.0 + 0.5) / 1000000.0 AS ate_naive
        |FROM agg CROSS JOIN naive""".stripMargin))

  val defs: Map[String, QueryDef] = Map(
    "q_sprt" -> sprt,
    "q_ucb_bandit" -> ucbBandit,
    "q_ipw_ate" -> ipwAte)
}
