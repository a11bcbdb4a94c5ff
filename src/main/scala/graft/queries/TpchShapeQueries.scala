package graft.queries

import graft.QueryDef
import graft.ops.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The round-14 TPC-H shape completion: Q2 / Q11 / Q15 / Q18 / Q19 —
  * the five classic decision-support shapes the warehouse set still
  * lacked (the verdict's task 3). Each is expressed as the ANSI SQL the
  * shape is famous for (correlated scalar subqueries, HAVING-vs-scalar-
  * total, reused CTE views, IN over grouped HAVING, disjunctive
  * multi-predicate pushdown) and run through Spark's SQL front end, so
  * Catalyst's decorrelation / pushdown machinery is what's under test;
  * the DuckDB oracle runs the IDENTICAL string. PlanAuditSpec pins the
  * physical properties (decorrelated hash joins, no cartesians, the Q19
  * OR-filter landing in the scans).
  *
  * The TPC-H spec's partsupp table does not exist in this data model;
  * the supply relation is DERIVED from lineitem (cost of supplier s for
  * part p = the minimum extended price s ever charged for p) — same
  * shape, same cardinality structure (part × supplier), zero semantic
  * loss for the plan patterns being exercised.
  *
  * All money emissions follow the house exact-integer discipline
  * (DECIMAL products summed exactly, emitted as ⌊·10⁶⌋ / ⌊·10²⌋
  * BIGINT); every LIMIT rides a strict total order.
  */
object TpchShapeQueries {

  private def withViews(spark: SparkSession, dir: String,
      names: Seq[String])(sql: String): DataFrame = {
    names.foreach {
      case "lineitem" => Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem")
      case "orders" => Tables.orders(spark, dir).createOrReplaceTempView("orders")
      case "customer" => Tables.customer(spark, dir).createOrReplaceTempView("customer")
      case "supplier" => Tables.supplier(spark, dir).createOrReplaceTempView("supplier")
      case "part" => Tables.part(spark, dir).createOrReplaceTempView("part")
      case "nation" => Tables.nation(spark, dir).createOrReplaceTempView("nation")
      case "region" => Tables.region(spark, dir).createOrReplaceTempView("region")
    }
    spark.sql(sql)
  }

  /** TPC-H Q2-shaped minimum-cost supplier: for every STANDARD small
    * part, the EUROPE supplier(s) whose derived supply cost equals the
    * part's minimum — the correlated scalar-MIN-over-a-CTE shape, with
    * the Q2 trap intact: the region restriction applies BOTH to the
    * outer candidate row and inside the correlated minimum (a supplier
    * outside EUROPE can neither win nor set the bar). Catalyst
    * decorrelates the scalar MIN into a per-part aggregate of the same
    * CTE joined back on partkey — bounded extra shuffles, never a
    * per-row re-scan (PlanAuditSpec pins no-cartesian). The LIMIT rides
    * the strict total order (acctbal_e2 desc, n_name, s_name,
    * p_partkey) — p_partkey is unique per (part, winning supplier) row
    * within a supplier's ties, so the cut is deterministic. */
  private val q2Sql =
    """WITH eu_supply AS (
      |  SELECT l_partkey AS partkey, s_suppkey, s_name, n_name,
      |    CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT) AS acctbal_e2,
      |    CAST(MIN(CAST(l_extendedprice AS DECIMAL(12,2))) * 100
      |      AS BIGINT) AS cost_e2
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'EUROPE'
      |  GROUP BY 1, 2, 3, 4, 5)
      |SELECT s.s_name, s.n_name, p.p_partkey, p.p_type,
      |  s.cost_e2, s.acctbal_e2
      |FROM part p JOIN eu_supply s ON s.partkey = p.p_partkey
      |WHERE p.p_type = 'STANDARD' AND p.p_size <= 10
      |  AND s.cost_e2 = (SELECT MIN(s2.cost_e2) FROM eu_supply s2
      |                   WHERE s2.partkey = p.p_partkey)
      |ORDER BY s.acctbal_e2 DESC, s.n_name, s.s_name, p.p_partkey
      |LIMIT 100""".stripMargin

  private val minCostSupplier = QueryDef(
    fn = (spark, dir) => withViews(spark, dir,
      Seq("lineitem", "supplier", "part", "nation", "region"))(q2Sql),
    oracle = Some(q2Sql))

  /** The SAME Q2 semantics as [[minCostSupplier]], expressed as the plan
    * a 100 TB cluster should actually run (the q_corr_agg_fused
    * discipline): Catalyst decorrelates [[q2Sql]]'s scalar MIN into a
    * second aggregate over the supply CTE — the CTE is NOT shared, so
    * the fact side scans and aggregates TWICE. Here the supply frame
    * builds ONCE and the per-part minimum rides a partkey-partitioned
    * window on the already-aggregated (part × supplier) frame — one
    * fact scan, one aggregation shuffle, one domain-sized window, then
    * the broadcast part join. At 100 TB that halves fact I/O and
    * removes a full aggregate + sort-merge join lineage. Oracle =
    * [[q2Sql]] itself, so the driver proves output identity between the
    * two plans; PlanAuditSpec pins the one-fact-scan property. */
  private val minCostSupplierFused = QueryDef(
    fn = (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val supply = Tables.lineitem(spark, dir)
        .join(Tables.supplier(spark, dir),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(spark, dir)),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(spark, dir)
          .filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("l_partkey").as("partkey"), col("s_suppkey"),
          col("s_name"), col("n_name"),
          floor(col("s_acctbal") * 100 + 0.5).cast("long").as("acctbal_e2"))
        .agg((min(col("l_extendedprice")
          .cast(org.apache.spark.sql.types.DecimalType(12, 2))) * 100)
          .cast("long").as("cost_e2"))
      val w = Window.partitionBy(col("partkey"))
      val best = supply
        .withColumn("mc", min(col("cost_e2")).over(w))
        .filter(col("cost_e2") === col("mc"))
      best.join(broadcast(Tables.part(spark, dir)
          .filter(col("p_type") === "STANDARD" && col("p_size") <= 10)
          .select(col("p_partkey"), col("p_type"))),
          col("partkey") === col("p_partkey"))
        .select(col("s_name"), col("n_name"), col("p_partkey"),
          col("p_type"), col("cost_e2"), col("acctbal_e2"))
        .orderBy(col("acctbal_e2").desc, col("n_name"), col("s_name"),
          col("p_partkey"))
        .limit(100)
    },
    oracle = Some(q2Sql))

  /** TPC-H Q11-shaped important stock: parts whose ASIA-supplied revenue
    * exceeds twice the AVERAGE part's — the HAVING-vs-scalar-total
    * subquery shape. TPC-H's own Q11 hardwires fraction 0.0001/SF
    * because a FIXED share threshold empties as the part count grows
    * (measured here: max share 1.75% at sf0.001 but 0.018% at sf0.1);
    * self-normalizing against the mean (val·n_parts > 2·Σval) keeps the
    * selective tail at every scale — the form a 100 TB pipeline should
    * use. Both scalar subqueries re-aggregate the same CTE; all
    * comparisons run in DECIMAL(38,0) exact integers (val pre-scaled e6
    * inside the CTE so no product ever needs scale digits). */
  private val q11Sql =
    """WITH nv AS (
      |  SELECT l_partkey AS partkey,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
      |      * (1 - CAST(l_discount AS DECIMAL(12,4)))) * 1000000
      |      AS DECIMAL(38,0)) AS val_e6
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'ASIA'
      |  GROUP BY 1)
      |SELECT partkey, CAST(val_e6 AS BIGINT) AS value_e6
      |FROM nv
      |WHERE val_e6 * (SELECT COUNT(*) FROM nv)
      |    > 2 * (SELECT SUM(val_e6) FROM nv)
      |ORDER BY value_e6 DESC, partkey""".stripMargin

  private val nationalValueShare = QueryDef(
    fn = (spark, dir) => withViews(spark, dir,
      Seq("lineitem", "supplier", "nation", "region"))(q11Sql),
    oracle = Some(q11Sql))

  /** TPC-H Q15-shaped top revenue supplier: the quarter's per-supplier
    * revenue CTE (Q15's `revenue0` view) consumed TWICE — once as the
    * join input, once under the scalar MAX — selecting the supplier(s)
    * at the maximum. The ties-possible = scalar-subquery-equality form
    * (not a top-1 sort) is the point of the shape; output ordered by
    * the unique s_suppkey. The ship-date quarter predicate pushes into
    * the parquet scan. */
  private val q15Sql =
    """WITH rev AS (
      |  SELECT l_suppkey AS suppkey,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
      |      * (1 - CAST(l_discount AS DECIMAL(12,4)))) * 1000000
      |      AS BIGINT) AS total_e6
      |  FROM lineitem
      |  WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
      |    AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
      |  GROUP BY 1)
      |SELECT s_suppkey, s_name, total_e6
      |FROM supplier JOIN rev ON s_suppkey = suppkey
      |WHERE total_e6 = (SELECT MAX(total_e6) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  private val topQuarterSupplier = QueryDef(
    fn = (spark, dir) => withViews(spark, dir,
      Seq("lineitem", "supplier"))(q15Sql),
    oracle = Some(q15Sql))

  /** TPC-H Q18-shaped large-volume orders: customers whose order carried
    * more than 200 total quantity units — the IN-over-grouped-HAVING
    * shape (the subquery aggregates the FACT table itself, so Catalyst
    * must plan a semi join against an aggregate, not a dim lookup).
    * Threshold 200 is scale-free (per-ORDER quantity does not grow with
    * SF; measured 99 / 874 / 9185 qualifying orders at the three SFs).
    * sum_qty is integral (quantities are whole units), summed in
    * DECIMAL and emitted BIGINT; the LIMIT rides (totalprice_e2 desc,
    * o_orderkey) — orderkey unique per row. */
  private val q18Sql =
    """SELECT c_name, c_custkey, o_orderkey,
      |  CAST(o_orderdate AS DATE) AS o_orderdate,
      |  CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS totalprice_e2,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS BIGINT) AS sum_qty
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE o_orderkey IN (
      |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      |  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 200)
      |GROUP BY 1, 2, 3, 4, 5
      |ORDER BY totalprice_e2 DESC, o_orderkey
      |LIMIT 100""".stripMargin

  private val largeVolumeOrders = QueryDef(
    fn = (spark, dir) => withViews(spark, dir,
      Seq("customer", "orders", "lineitem"))(q18Sql),
    oracle = Some(q18Sql))

  /** TPC-H Q19-shaped disjunctive revenue: three brand/size/quantity
    * bands OR'd together across the lineitem × part join — the
    * multi-predicate pushdown stress test. Each disjunct mixes columns
    * of BOTH sides, so no single branch can push; the side-local HULLS
    * are therefore written as explicit redundant conjuncts (p_brand IN
    * (...) ∧ p_size ≤ 35 on the part side, l_quantity ∈ [1,36] on the
    * fact side) — the standard manual CNF extraction that lets each
    * parquet scan prune before the join (at 100 TB the quantity hull
    * alone drops ~30% of fact I/O and the brand hull ~88% of the dim).
    * PlanAuditSpec pins that both scans show pushed filters and the
    * join stays a broadcast hash join. */
  private val q19Sql =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
      |    * (1 - CAST(l_discount AS DECIMAL(12,4)))) * 1000000
      |    AS BIGINT) AS rev_e6,
      |  COUNT(*) AS n_lines
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand IN ('Brand#12', 'Brand#23', 'Brand#4')
      |  AND p_size BETWEEN 1 AND 35
      |  AND l_quantity BETWEEN 1 AND 36
      |  AND ((p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
      |        AND l_quantity BETWEEN 1 AND 11)
      |    OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
      |        AND l_quantity BETWEEN 14 AND 24)
      |    OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 35
      |        AND l_quantity BETWEEN 26 AND 36))""".stripMargin

  private val disjunctivePushdown = QueryDef(
    fn = (spark, dir) => withViews(spark, dir,
      Seq("lineitem", "part"))(q19Sql),
    oracle = Some(q19Sql))

  // --- the remaining canon (Q4/Q6/Q9/Q12/Q13/Q16 shapes) -------------------
  // With these, every TPC-H query shape is represented (Q1 q1_agg, Q3
  // q_ship_priority, Q5/Q7/Q8/Q10/Q14/Q17/Q20/Q21/Q22 in AnalyticQueries /
  // RelationalExtras, Q2/Q11/Q15/Q18/Q19 above) — adapted where the spec
  // needs columns this data model lacks (no partsupp / commitdate /
  // shipmode; each adaptation preserves the plan pattern the query is
  // famous for and is noted on the query).

  /** TPC-H Q4-shaped order-priority checking: orders of one quarter with
    * AT LEAST ONE line shipped > 60 days after the order date (the
    * model has no commitdate; 60-days-late is the q_sole_late_supplier
    * lateness convention), counted by priority — the canonical
    * EXISTS-correlated-to-the-fact shape. Catalyst plans the EXISTS as
    * a semi join on the order key after decorrelation — never a per-row
    * probe. */
  private val q4Sql =
    """SELECT o_orderpriority, COUNT(*) AS n_orders
      |FROM orders
      |WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
      |  AND CAST(o_orderdate AS DATE) < DATE '1996-04-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |    WHERE l_orderkey = o_orderkey
      |      AND CAST(l_shipdate AS DATE)
      |        > CAST(o_orderdate AS DATE) + INTERVAL 60 DAY)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  private val orderPriorityCheck = QueryDef(
    fn = (spark, dir) => withViews(spark, dir,
      Seq("orders", "lineitem"))(q4Sql),
    oracle = Some(q4Sql))

  /** TPC-H Q6-shaped forecasting-revenue change: one pure scan-filter
    * aggregate — the pushdown showcase (date range, discount band, and
    * quantity cap must ALL reach the parquet reader; PlanAuditSpec pins
    * it). Revenue here is price·discount (the would-be-forgone
    * discount), exact 6dp DECIMAL. Discount literals sit on the data's
    * own 0.01 grid so double comparison is engine-identical. */
  private val q6Sql =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
      |    * CAST(l_discount AS DECIMAL(12,4))) * 1000000 AS BIGINT)
      |    AS rev_e6,
      |  COUNT(*) AS n_lines
      |FROM lineitem
      |WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
      |  AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  private val forecastRevenue = QueryDef(
    fn = (spark, dir) => withViews(spark, dir, Seq("lineitem"))(q6Sql),
    oracle = Some(q6Sql))

  /** TPC-H Q9-shaped product-type profit: per supplier nation × ship
    * year, Σ(revenue − cost) over one part type — the widest
    * many-join-then-two-key-rollup shape. The model has no
    * ps_supplycost; cost is modeled as 10% of the part's retail price
    * per unit (qty·p_retailprice·0.10) — same join graph, same rollup,
    * exact DECIMAL arithmetic throughout (both terms are ≤ 6dp reals,
    * so the ⌊·10⁶⌋ emission is integral). */
  private val q9Sql =
    """SELECT n_name, CAST(year(CAST(l_shipdate AS DATE)) AS INTEGER)
      |    AS o_year,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
      |      * (1 - CAST(l_discount AS DECIMAL(12,4)))
      |    - CAST(l_quantity AS DECIMAL(12,2))
      |      * CAST(p_retailprice AS DECIMAL(12,2))
      |      * CAST(0.10 AS DECIMAL(3,2))) * 1000000 AS BIGINT)
      |    AS profit_e6
      |FROM lineitem
      |JOIN part ON p_partkey = l_partkey
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE p_type = 'ECONOMY'
      |GROUP BY 1, 2 ORDER BY n_name, o_year DESC""".stripMargin

  private val productProfit = QueryDef(
    fn = (spark, dir) => withViews(spark, dir,
      Seq("lineitem", "part", "supplier", "nation"))(q9Sql),
    oracle = Some(q9Sql))

  /** TPC-H Q12-shaped shipping-priority split: per category, how many
    * lines belonged to high-priority vs other orders — the two-branch
    * conditional-count shape. The model has no l_shipmode; the returned
    * /damaged flags (l_returnflag ∈ {R, A}) stand in as the audited
    * categories. */
  private val q12Sql =
    """SELECT l_returnflag AS mode,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE l_returnflag IN ('R', 'A')
      |  AND CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
      |  AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  private val shipmodePriority = QueryDef(
    fn = (spark, dir) => withViews(spark, dir,
      Seq("orders", "lineitem"))(q12Sql),
    oracle = Some(q12Sql))

  /** TPC-H Q13-shaped customer order distribution: LEFT JOIN with the
    * filter INSIDE the join condition (the Q13 trap — moving
    * `o_orderpriority <> '1-URGENT'` to WHERE would silently drop the
    * zero-order customers the histogram exists to count), then the
    * count-of-counts rollup. COUNT(o_orderkey) skips the outer join's
    * nulls by definition, so customers with no qualifying orders land
    * in the c_count = 0 bucket. */
  private val q13Sql =
    """WITH c_orders AS (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey)
      |SELECT c_count, COUNT(*) AS custdist
      |FROM c_orders GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  private val customerOrderDist = QueryDef(
    fn = (spark, dir) => withViews(spark, dir,
      Seq("customer", "orders"))(q13Sql),
    oracle = Some(q13Sql))

  /** TPC-H Q16-shaped supplier count per part attribute: distinct
    * suppliers per (brand, type, size) bucket, EXCLUDING a supplier
    * denylist via NOT IN (Q16's complaint suppliers; modeled as
    * accounts under 1000 — present at every SF, so the anti join always
    * removes real rows). s_suppkey is non-nullable, so Spark's
    * null-aware anti join degenerates to a plain anti join — the shape
    * the plan audit expects. The supply relation derives from lineitem
    * (no partsupp), distinct-counted per attribute bucket. */
  private val q16Sql =
    """SELECT p_brand, p_type, p_size,
      |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_size IN (1, 4, 9, 16, 25, 36)
      |  AND p_type <> 'PROMO'
      |  AND l_suppkey NOT IN
      |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
      |GROUP BY 1, 2, 3
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  private val supplierCnt = QueryDef(
    fn = (spark, dir) => withViews(spark, dir,
      Seq("lineitem", "part", "supplier"))(q16Sql),
    oracle = Some(q16Sql))

  val defs: Map[String, QueryDef] = Map(
    "q_min_cost_supplier" -> minCostSupplier,
    "q_min_cost_supplier_fused" -> minCostSupplierFused,
    "q_national_value_share" -> nationalValueShare,
    "q_top_quarter_supplier" -> topQuarterSupplier,
    "q_large_volume_orders" -> largeVolumeOrders,
    "q_disjunctive_pushdown" -> disjunctivePushdown,
    "q_order_priority_check" -> orderPriorityCheck,
    "q_forecast_revenue" -> forecastRevenue,
    "q_product_profit" -> productProfit,
    "q_shipmode_priority" -> shipmodePriority,
    "q_customer_order_dist" -> customerOrderDist,
    "q_supplier_cnt" -> supplierCnt)
}
