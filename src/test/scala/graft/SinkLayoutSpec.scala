package graft

import java.nio.file.Files
import graft.sink.PartitionedParquet
import org.apache.spark.sql.functions._

class SinkLayoutSpec extends SparkSpec {
  import spark.implicits._

  test("writeByMonth lays out part_month dirs; reads prune partitions; dynamic overwrite converges") {
    val dir = Files.createTempDirectory("pp").toString + "/prices"
    val v1 = Seq(
      (101L, "2025-12-13", 5000), (101L, "2026-01-05", 6000),
      (102L, "2025-12-20", 3000))
      .toDF("product_id", "d", "price")
      .withColumn("valid_from", to_date(col("d"))).drop("d")
    PartitionedParquet.writeByMonth(v1, "valid_from", dir)
    val dirs = new java.io.File(dir).listFiles().map(_.getName).filter(_.startsWith("part_month=")).sorted
    assert(dirs.toSeq == Seq("part_month=2025-12", "part_month=2026-01"))

    // partition pruning visible in the scan
    val scan = PartitionedParquet.readMonth(spark, dir, "2025-12")
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("part_month"))
    assert(scan.count() == 2)

    // dynamic overwrite: rewrite only 2025-12; 2026-01 untouched
    val v2 = Seq((101L, "2025-12-13", 9999))
      .toDF("product_id", "d", "price")
      .withColumn("valid_from", to_date(col("d"))).drop("d")
    PartitionedParquet.writeByMonth(v2, "valid_from", dir)
    val all = spark.read.parquet(dir)
    assert(all.count() == 2) // 1 rewritten dec row + 1 untouched jan row
    assert(all.filter(col("part_month") === "2026-01").count() == 1)
  }

  test("saltedSumCount equals direct groupBy on a skewed input") {
    // 10k rows of one hot key + a tail
    val hot = spark.range(0, 10000).select(lit("HOT").as("k"), (col("id") % 97).cast("double").as("v"), col("id"))
    val tail = spark.range(0, 500).select(concat(lit("t"), col("id") % 7).as("k"), col("id").cast("double").as("v"), col("id"))
    val df = hot.union(tail)
    val salted = graft.ops.Skew.saltedSumCount(df, Seq("k"), "v", col("id"), salts = 8)
      .orderBy("k").as[(String, Double, Long)].collect().toSeq
    val direct = df.groupBy(col("k"))
      .agg(sum(col("v").cast("decimal(12,4)")).cast("double").as("s"), count(lit(1)).as("n"))
      .orderBy("k").as[(String, Double, Long)].collect().toSeq
    assert(salted == direct)
  }
}
