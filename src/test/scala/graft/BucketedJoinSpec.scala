package graft

import graft.sink.Bucketed
import org.apache.spark.sql.functions._

/** The shuffle-elimination property bucketing exists for: joining two
  * tables bucketed on the join key with equal bucket counts must produce a
  * plan with NO shuffle Exchange — the shuffle was pre-paid at write time.
  */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("same-bucket-count join plans contain no shuffle Exchange") {
    val sf = "/root/testdata/sf0.001"
    Bucketed.writeBucketed(
      spark.read.parquet(s"$sf/orders.parquet"), "orders_b", "o_custkey", 8)
    Bucketed.writeBucketed(
      spark.read.parquet(s"$sf/customer.parquet"), "customer_b", "c_custkey", 8)
    val oldThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force the non-broadcast path: broadcasting would trivially avoid the
    // shuffle and prove nothing about the bucket layout
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketed.join(spark, "orders_b", "customer_b",
        "o_custkey", "c_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected sort-merge join:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      // and it computes the right thing
      val expect = spark.read.parquet(s"$sf/orders.parquet")
        .join(spark.read.parquet(s"$sf/customer.parquet"),
          col("o_custkey") === col("c_custkey")).count()
      assert(joined.count() == expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldThresh)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }

  test("bucket-sorted scan feeds aggregation without re-sorting the bucket key") {
    val sf = "/root/testdata/sf0.001"
    Bucketed.writeBucketed(
      spark.read.parquet(s"$sf/orders.parquet"), "orders_agg_b", "o_custkey", 8)
    try {
      // group-by on the bucket key: no Exchange before the aggregate either
      val agg = spark.table("orders_agg_b")
        .groupBy($"o_custkey").agg(count(lit(1)).as("n"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"group-by on bucket key still shuffles:\n$plan")
      assert(agg.count() ==
        spark.read.parquet(s"$sf/orders.parquet").select("o_custkey").distinct().count())
    } finally spark.sql("DROP TABLE IF EXISTS orders_agg_b")
  }
}
