package graft

import graft.ops.RangeJoin
import graft.plans.BinnedRangeJoinRule
import org.apache.spark.sql.functions._

/** The binned range join, on both surfaces: the DataFrame operator
  * (output identity with the naive BETWEEN join, boundary/empty-interval
  * traps) and the optimizer rule (fires on a qualifying logical join, skips
  * ineligible shapes, produces identical results with no nested-loop join
  * in the physical plan).
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def pts = Seq(
    (1L, -7L), (2L, 0L), (3L, 3L), (4L, 4L), (5L, 5L),
    (6L, 99L), (7L, 100L), (8L, 101L), (9L, 250L)
  ).toDF("pid", "p")

  private def ivs = Seq(
    (10L, 0L, 4L),     // closed bounds: hits 0,3,4
    (11L, 5L, 5L),     // degenerate single-point interval
    (12L, 100L, 90L),  // EMPTY interval (lo > hi): must match nothing
    (13L, -10L, -1L),  // negative range: hits -7
    (14L, 90L, 110L)   // spans several bins: hits 99,100,101
  ).toDF("iid", "lo", "hi")

  private def naive = pts.join(ivs, $"p" >= $"lo" && $"p" <= $"hi")
    .select($"pid", $"iid").as[(Long, Long)].collect().toSet

  test("binned operator: identical to the naive join incl. boundaries, empty and negative intervals") {
    for (bin <- Seq(1L, 3L, 4L, 1000L)) {
      val got = RangeJoin.binned(pts, "p", ivs, "lo", "hi", binSize = bin)
        .select($"pid", $"iid").as[(Long, Long)].collect().toSet
      assert(got == naive, s"binSize=$bin: ${got.diff(naive)} / ${naive.diff(got)}")
    }
  }

  test("optimizer rule: rewrites the naive plan to an equi-join, same results, no BNLJ") {
    BinnedRangeJoinRule.install(spark)
    try {
      spark.conf.set(BinnedRangeJoinRule.BinSizeConf, "4")
      val joined = pts.join(ivs, $"p" >= $"lo" && $"p" <= $"hi")
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("__graft_bin"), s"rule did not fire:\n$optimized")
      val physical = joined.queryExecution.executedPlan.toString
      assert(!physical.contains("BroadcastNestedLoopJoin") &&
        !physical.contains("CartesianProduct"),
        s"rewritten join still nested-loops:\n${physical.take(1500)}")
      assert(physical.contains("BroadcastHashJoin") || physical.contains("SortMergeJoin"))
      val got = joined.select($"pid", $"iid").as[(Long, Long)].collect().toSet
      assert(got == naive)
    } finally spark.conf.unset(BinnedRangeJoinRule.BinSizeConf)
  }

  test("optimizer rule: stays off when unset, skips non-long types") {
    BinnedRangeJoinRule.install(spark)
    // conf unset -> naive plan untouched (nested loop preserved)
    val off = pts.join(ivs, $"p" >= $"lo" && $"p" <= $"hi")
      .queryExecution.optimizedPlan.toString
    assert(!off.contains("__graft_bin"), "rule fired without opt-in")

    spark.conf.set(BinnedRangeJoinRule.BinSizeConf, "4")
    try {
      // int (not long) typed bounds -> out of scope, skip
      val iPts = Seq((1, 3)).toDF("pid", "p")
      val iIvs = Seq((10, 0, 4)).toDF("iid", "lo", "hi")
      val ints = iPts.join(iIvs, $"p" >= $"lo" && $"p" <= $"hi")
        .queryExecution.optimizedPlan.toString
      assert(!ints.contains("__graft_bin"), "rule fired on int columns")
    } finally spark.conf.unset(BinnedRangeJoinRule.BinSizeConf)
  }

  test("optimizer rule: equality-prefix range join gets the bin as a co-key, identical rows") {
    // the SCD2 / time-series probe shape: equi key + BETWEEN. 3 hot keys,
    // per-key intervals — the per-key cross product the bin must prune.
    BinnedRangeJoinRule.install(spark)
    val kPts = (0L until 300L).map(i => (i % 3, i, i % 40)).toDF("k", "pid", "p")
    val kIvs = (0L until 30L).map(i => (i % 3, i, (i * 7) % 40, (i * 7) % 40 + 3))
      .toDF("k", "iid", "lo", "hi")
    val cond = $"kp" === $"ki" && $"p" >= $"lo" && $"p" <= $"hi"
    val naiveKeyed = kPts.withColumnRenamed("k", "kp")
      .join(kIvs.withColumnRenamed("k", "ki"), cond)
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    spark.conf.set(BinnedRangeJoinRule.BinSizeConf, "4")
    try {
      val joined = kPts.withColumnRenamed("k", "kp")
        .join(kIvs.withColumnRenamed("k", "ki"), cond)
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("__graft_bin"),
        s"rule did not fire on the mixed shape:\n$optimized")
      val physical = joined.queryExecution.executedPlan.toString
      assert(!physical.contains("BroadcastNestedLoopJoin") &&
        !physical.contains("CartesianProduct"))
      assert(physical.contains("BroadcastHashJoin") || physical.contains("SortMergeJoin"))
      // both the original equality and the bin must be join keys: the
      // equality no longer appears as a post-join filter conjunct
      assert(physical.contains("__graft_bin"),
        s"bin key missing from the physical join:\n${physical.take(1500)}")
      val got = joined.select($"pid", $"iid").as[(Long, Long)].collect().toSet
      assert(got == naiveKeyed)
      assert(got.nonEmpty, "keyed fixture produced no matches")
    } finally spark.conf.unset(BinnedRangeJoinRule.BinSizeConf)
  }

  test("operator on real data: binned result equals the naive range join") {
    val sf = "/root/testdata/sf0.001"
    val pts = graft.ops.Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_linenumber",
        datediff(to_date($"l_shipdate"), lit("1992-01-01").cast("date"))
          .cast("long").as("p"))
    val ivs = graft.ops.Tables.orders(spark, sf)
      .filter($"o_orderstatus" === "P" && $"o_orderkey" % 16 === 0)
      .select($"o_orderkey",
        datediff(to_date($"o_orderdate"), lit("1992-01-01").cast("date"))
          .cast("long").as("lo"))
      .withColumn("hi", $"lo" + 2)
    val naiveReal = pts.join(ivs, $"p" >= $"lo" && $"p" <= $"hi")
      .select($"l_orderkey", $"l_linenumber", $"o_orderkey")
      .as[(Long, Int, Long)].collect().toSet
    val binnedReal = RangeJoin.binned(pts, "p", ivs, "lo", "hi", binSize = 4)
      .select($"l_orderkey", $"l_linenumber", $"o_orderkey")
      .as[(Long, Int, Long)].collect().toSet
    assert(binnedReal == naiveReal)
    assert(binnedReal.nonEmpty, "fixture produced no matches — trap lost its teeth")
  }
}
