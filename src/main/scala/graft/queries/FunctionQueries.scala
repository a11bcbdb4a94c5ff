package graft.queries

import graft.QueryDef
import graft.ops.{Tables, Validation}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Scalar-function families (SURVEY.md §2.3: string / date / math / JSON),
  * multi-dimensional aggregation (rollup/cube), date-grid generation (T9) and
  * null-guard validation (V1/V2) — each with a DuckDB oracle.
  *
  * Cross-engine traps encoded here (found by differential testing):
  * DuckDB `regexp_replace` needs the 'g' flag to match Spark's replace-all;
  * DuckDB `year()`/`floor()`/`date_diff()` return BIGINT/DOUBLE where Spark
  * returns INT/LONG, so oracles cast; libm `ln`/`exp` can differ in the last
  * ulp between JVM and C, so transcendentals are rounded to 6-8 digits.
  */
object FunctionQueries {

  private def dec(c: Column): Column = c.cast(DecimalType(12, 4))

  private val stringFuncs = QueryDef(
    fn = (spark, dir) =>
      Tables.part(spark, dir).select(
        col("p_partkey"),
        upper(col("p_name")).as("up"),
        lower(col("p_type")).as("lo"),
        substring(col("p_name"), 1, 8).as("sub"),
        length(col("p_name")).as("len"),
        concat_ws("|", col("p_brand"), col("p_type")).as("cw"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("novowel"),
        lpad(col("p_brand"), 12, "*").as("pad"),
        reverse(col("p_name")).as("rev"),
        instr(col("p_name"), "a").as("pos_a"),
        translate(col("p_type"), "AEO", "aeo").as("tr"),
        size(split(col("p_name"), " ")).as("n_words"))
        .orderBy("p_partkey"),
    oracle = Some(
      """SELECT p_partkey,
        |  upper(p_name) AS up, lower(p_type) AS lo,
        |  substr(p_name, 1, 8) AS sub,
        |  CAST(length(p_name) AS INTEGER) AS len,
        |  concat_ws('|', p_brand, p_type) AS cw,
        |  regexp_replace(p_name, '[aeiou]', '', 'g') AS novowel,
        |  lpad(p_brand, 12, '*') AS pad,
        |  reverse(p_name) AS rev,
        |  CAST(strpos(p_name, 'a') AS INTEGER) AS pos_a,
        |  translate(p_type, 'AEO', 'aeo') AS tr,
        |  CAST(len(string_split(p_name, ' ')) AS INTEGER) AS n_words
        |FROM part ORDER BY p_partkey""".stripMargin))

  private val dateFuncs = QueryDef(
    fn = (spark, dir) =>
      Tables.orders(spark, dir).select(
        col("o_orderkey"),
        to_date(col("o_orderdate")).as("d"),
        year(to_date(col("o_orderdate"))).as("yr"),
        month(to_date(col("o_orderdate"))).as("mo"),
        dayofmonth(to_date(col("o_orderdate"))).as("dom"),
        quarter(to_date(col("o_orderdate"))).as("qtr"),
        date_add(to_date(col("o_orderdate")), 30).as("plus30"),
        add_months(to_date(col("o_orderdate")), 2).as("plus2m"),
        last_day(to_date(col("o_orderdate"))).as("eom"),
        datediff(to_date(lit("1998-01-01")), to_date(col("o_orderdate"))).as("dd"),
        date_trunc("month", to_date(col("o_orderdate"))).cast("date").as("mstart"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
        .orderBy("o_orderkey"),
    oracle = Some(
      """SELECT o_orderkey,
        |  CAST(o_orderdate AS DATE) AS d,
        |  CAST(year(o_orderdate) AS INTEGER) AS yr,
        |  CAST(month(o_orderdate) AS INTEGER) AS mo,
        |  CAST(day(o_orderdate) AS INTEGER) AS dom,
        |  CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
        |  CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS plus30,
        |  CAST(o_orderdate + INTERVAL 2 MONTH AS DATE) AS plus2m,
        |  last_day(CAST(o_orderdate AS DATE)) AS eom,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS INTEGER) AS dd,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS mstart,
        |  strftime(o_orderdate, '%Y-%m') AS ym
        |FROM orders ORDER BY o_orderkey""".stripMargin))

  private val mathFuncs = QueryDef(
    fn = (spark, dir) =>
      Tables.lineitem(spark, dir)
        .filter(col("l_orderkey") % 100 === 0)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          abs(col("l_discount") - 0.05).as("absd"),
          // rounding a 2-dp money value lands exactly on .xx5 boundaries where
          // Spark (rounds the shortest decimal repr) and DuckDB (rounds the
          // exact binary value) disagree — round an irrational instead, and
          // use the explicit floor form (TextAnalysis.round6 rationale) so
          // even near-boundary irrationals cannot split the engines
          (floor(sqrt(col("l_extendedprice")) * 1e4 + 0.5) / 1e4).as("rounded"),
          floor(col("l_quantity")).as("fl"),
          ceil(col("l_quantity")).as("ce"),
          sqrt(col("l_quantity")).as("sq"),
          (floor(log(col("l_extendedprice")) * 1e6 + 0.5) / 1e6).as("lnp"),
          (floor(exp(col("l_discount")) * 1e8 + 0.5) / 1e8).as("expd"),
          (col("l_quantity") * col("l_quantity")).as("qty2"),
          signum(col("l_discount") - 0.05).cast("int").as("sgn"),
          greatest(col("l_quantity"), col("l_discount") * 100).as("gr"),
          least(col("l_tax"), col("l_discount")).as("le"),
          (col("l_orderkey") % 7).as("mod7"))
        .orderBy("l_orderkey", "l_linenumber"),
    oracle = Some(
      """SELECT l_orderkey, l_linenumber,
        |  abs(l_discount - 0.05) AS absd,
        |  floor(sqrt(l_extendedprice) * 1e4 + 0.5) / 1e4 AS rounded,
        |  CAST(floor(l_quantity) AS BIGINT) AS fl,
        |  CAST(ceil(l_quantity) AS BIGINT) AS ce,
        |  sqrt(l_quantity) AS sq,
        |  floor(ln(l_extendedprice) * 1e6 + 0.5) / 1e6 AS lnp,
        |  floor(exp(l_discount) * 1e8 + 0.5) / 1e8 AS expd,
        |  l_quantity * l_quantity AS qty2,
        |  CAST(sign(l_discount - 0.05) AS INTEGER) AS sgn,
        |  greatest(l_quantity, l_discount * 100) AS gr,
        |  least(l_tax, l_discount) AS le,
        |  l_orderkey % 7 AS mod7
        |FROM lineitem WHERE l_orderkey % 100 = 0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin))

  private val jsonFuncs = QueryDef(
    fn = (spark, dir) =>
      Tables.events(spark, dir).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"),
        (get_json_object(col("props"), "$.k").cast("int") * 2).as("k2"),
        get_json_object(col("props"), "$.missing").as("missing"))
        .orderBy("event_id"),
    oracle = Some(
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) * 2 AS k2,
        |  json_extract_string(props, '$.missing') AS missing
        |FROM events ORDER BY event_id""".stripMargin))

  private val conditional = QueryDef(
    fn = (spark, dir) =>
      Tables.orders(spark, dir)
        .withColumn("bucket",
          when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "hot")
            .when(col("o_orderpriority") === "3-MEDIUM", "warm")
            .otherwise("cold"))
        .withColumn("is_big", col("o_totalprice") >= 200000.0)
        .groupBy("bucket", "is_big")
        .agg(count(lit(1)).as("n"),
          sum(dec(col("o_totalprice"))).cast("double").as("total"))
        .orderBy("bucket", "is_big"),
    oracle = Some(
      """SELECT
        |  CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 'hot'
        |       WHEN o_orderpriority = '3-MEDIUM' THEN 'warm'
        |       ELSE 'cold' END AS bucket,
        |  o_totalprice >= 200000.0 AS is_big,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS DOUBLE) AS total
        |FROM orders GROUP BY 1, 2 ORDER BY bucket, is_big""".stripMargin))

  private val rollupQ = QueryDef(
    fn = (spark, dir) =>
      Tables.lineitem(spark, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("l_quantity"))).cast("double").as("qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("qty"))
        .orderBy("rf", "ls"),
    oracle = Some(
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |       coalesce(l_linestatus, 'ALL') AS ls,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin))

  private val cubeQ = QueryDef(
    fn = (spark, dir) =>
      Tables.orders(spark, dir)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("st"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("pri"),
          col("n"))
        .orderBy("st", "pri"),
    oracle = Some(
      """SELECT coalesce(o_orderstatus, 'ALL') AS st,
        |       coalesce(o_orderpriority, 'ALL') AS pri,
        |       COUNT(*) AS n
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY st, pri""".stripMargin))

  /** T9 (ref `_daterange`, scripts/pricenow_etl.py:193-197): per-key dense
    * calendar via sequence+explode — generated map-side, no shuffle beyond
    * the min/max aggregation.
    */
  private val gridGenerate = QueryDef(
    fn = (spark, dir) =>
      Tables.events(spark, dir)
        .groupBy(col("user_id"))
        .agg(min(to_date(col("ts"))).as("d0"), max(to_date(col("ts"))).as("d1"))
        .select(col("user_id"),
          explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
        .orderBy("user_id", "day"),
    oracle = Some(
      """SELECT user_id,
        |       unnest(generate_series(d0, d1, INTERVAL 1 day))::DATE AS day
        |FROM (SELECT user_id, min(CAST(ts AS DATE)) AS d0,
        |             max(CAST(ts AS DATE)) AS d1
        |      FROM events GROUP BY user_id)
        |ORDER BY user_id, day""".stripMargin))

  /** V1/V2 null guards: violations on a fixture with a null key, plus
    * null-count profile over real orders keys.
    */
  private val nullGuard = QueryDef(
    fn = (spark, dir) => {
      import spark.implicits._
      val changes = Seq(
        (Some(101), Some("2025-12-01"), Some(5000)),
        (Some(102), None: Option[String], Some(1)),
        (Some(103), Some("2025-12-02"), None: Option[Int]),
        (None: Option[Int], Some("2025-12-03"), Some(7)))
        .toDF("product_id", "valid_from", "price")
      Validation.nullViolations(changes, Seq("product_id", "valid_from"))
        .orderBy(asc_nulls_first("product_id"))
    },
    oracle = Some(
      """SELECT * FROM (VALUES
        | (NULL, '2025-12-03', 7),
        | (102, NULL, 1)
        |) AS t(product_id, valid_from, price)
        |ORDER BY product_id NULLS FIRST""".stripMargin))

  private val nullProfile = QueryDef(
    fn = (spark, dir) =>
      Validation.nullCounts(Tables.orders(spark, dir),
        Seq("o_orderkey", "o_custkey", "o_orderdate")),
    oracle = Some(
      """SELECT COUNT(*) AS n_rows,
        |  CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_o_orderkey,
        |  CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_o_custkey,
        |  CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_o_orderdate
        |FROM orders""".stripMargin))

  /** Morton z-value layout keys over the two hottest lineitem filter
    * dimensions, quantized to 8 bits each (see [[graft.sink.ZOrder]] for
    * the layout rationale and ZOrderSpec for the file-envelope proof).
    * Exact integer bit-interleave — the oracle replays the identical
    * bit-sum. Sampled by order key to keep the dump bounded at every SF.
    */
  private val zorderKey = QueryDef(
    fn = (spark, dir) => {
      val pk = col("l_partkey") % 256
      val sk = col("l_suppkey") % 256
      Tables.lineitem(spark, dir)
        .filter(col("l_orderkey") % 50 === 0)
        .select(col("l_orderkey"), col("l_linenumber"),
          pk.as("pk8"), sk.as("sk8"),
          graft.sink.ZOrder.zValue(pk, sk, 8).as("zval"))
        .orderBy("l_orderkey", "l_linenumber")
    },
    oracle = Some(
      s"""SELECT l_orderkey, l_linenumber,
         |  l_partkey % 256 AS pk8, l_suppkey % 256 AS sk8,
         |  CAST(${graft.sink.ZOrder.zValueSql("(l_partkey % 256)", "(l_suppkey % 256)", 8)} AS BIGINT) AS zval
         |FROM lineitem WHERE l_orderkey % 50 = 0
         |ORDER BY l_orderkey, l_linenumber""".stripMargin))

  /** Hilbert-curve layout keys over the same two lineitem filter
    * dimensions as [[zorderKey]] — the locality-superior curve (a
    * contiguous key range is always a CONNECTED (x, y) region; Morton
    * ranges jump at quadrant seams), i.e. the clustering key Delta's
    * OPTIMIZE moved to. Same 8-bit quantization and sample, so the two
    * keys are directly comparable row by row; the per-level
    * rotate/reflect walk is unrolled into exact integer CASE/bit
    * projections ([[graft.sink.Hilbert]]) and the oracle replays the
    * identical walk as chained CTE steps. */
  private val hilbertKey = QueryDef(
    fn = (spark, dir) => {
      val base = Tables.lineitem(spark, dir)
        .filter(col("l_orderkey") % 50 === 0)
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_partkey") % 256).as("pk8"),
          (col("l_suppkey") % 256).as("sk8"))
      graft.sink.Hilbert
        .withHilbertKey(base, col("pk8"), col("sk8"), 8, "hval")
        .orderBy("l_orderkey", "l_linenumber")
    },
    oracle = Some {
      val (ctes, last) = graft.sink.Hilbert.hilbertSqlCtes(
        from = "base", xCol = "pk8", yCol = "sk8", bits = 8,
        carry = "l_orderkey, l_linenumber, pk8, sk8")
      s"""WITH base AS (SELECT l_orderkey, l_linenumber,
         |    l_partkey % 256 AS pk8, l_suppkey % 256 AS sk8
         |  FROM lineitem WHERE l_orderkey % 50 = 0),
         |$ctes
         |SELECT l_orderkey, l_linenumber, pk8, sk8, hd AS hval
         |FROM $last ORDER BY l_orderkey, l_linenumber""".stripMargin
    })

  val defs: Map[String, QueryDef] = Map(
    "q_hilbert_key" -> hilbertKey,
    "q_zorder_key" -> zorderKey,
    "q_string_funcs" -> stringFuncs,
    "q_date_funcs" -> dateFuncs,
    "q_math_funcs" -> mathFuncs,
    "q_json_funcs" -> jsonFuncs,
    "q_conditional" -> conditional,
    "q_rollup" -> rollupQ,
    "q_cube" -> cubeQ,
    "q_grid_generate" -> gridGenerate,
    "q_null_guard" -> nullGuard,
    "q_null_profile" -> nullProfile)
}
