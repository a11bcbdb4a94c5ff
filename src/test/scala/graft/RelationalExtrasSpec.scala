package graft

import graft.ops.Tables
import org.apache.spark.sql.functions._

class RelationalExtrasSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct stays within 5% of exact (HLL rsd=0.02)") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.01")
    val got = li.groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx"),
        countDistinct(col("l_partkey")).as("exact"))
      .as[(String, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (flag, approx, exact) =>
      val err = math.abs(approx - exact).toDouble / exact
      assert(err < 0.05, s"flag=$flag approx=$approx exact=$exact err=$err")
    }
  }

  test("WeightedMean aggregator: exact on a known mini case, NaN on empty weightsum") {
    val df = Seq(("a", 10.0, 1.0), ("a", 20.0, 3.0), ("b", 5.0, 0.0))
      .toDF("k", "v", "w")
    val got = df.groupBy(col("k"))
      .agg(udaf(graft.functions.WeightedMean).apply(col("v"), col("w")).as("wm"))
      .as[(String, Double)].collect().toMap
    assert(got("a") == 17.5) // (10*1 + 20*3) / 4
    assert(got("b").isNaN)   // zero total weight
  }
}
