package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioned parquet sink for the price-fact table — the 100 TB layout
  * decision from SURVEY.md §4: facts partition by date (`valid_from` month)
  * so both the twice-daily rewrite and downstream scans touch only the
  * affected partitions (dynamic partition overwrite + partition pruning).
  */
object PartitionedParquet {

  /** Write `df` partitioned by month(dateCol) as `part_month=yyyy-MM`.
    * Dynamic overwrite replaces only the months present in `df` — the
    * batch-rewrite analog of the keyed upsert (a rerun converges).
    */
  def writeByMonth(df: DataFrame, dateCol: String, path: String): Unit =
    df.withColumn("part_month", date_format(col(dateCol), "yyyy-MM"))
      .write
      .partitionBy("part_month")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .parquet(path)

  /** Read back with a month filter — Catalyst prunes to the matching
    * `part_month=` directories (assert `PartitionFilters` in the scan). */
  def readMonth(spark: SparkSession, path: String, month: String): DataFrame =
    spark.read.parquet(path).filter(col("part_month") === month)
}
