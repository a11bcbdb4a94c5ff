package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Harness-table loaders (TESTDATA.md): one parquet file per table under
  * the scale-factor directory. Parquet scans give Catalyst predicate
  * pushdown + column pruning for free — every query should show
  * `PushedFilters`/narrow `ReadSchema` in `.explain("formatted")`.
  */
object Tables {
  /** Reads a harness table, normalizing any TIMESTAMP_NTZ column to
    * TimestampType. The driver's parquet writer has flipped
    * `isAdjustedToUTC` between rounds; with the session timezone pinned to
    * UTC (Verify/Bench/tests) the cast is wall-clock-identical, so every
    * epoch-based function (`unix_micros`, RANGE frames, lag arithmetic)
    * keeps working and the DuckDB oracle — which reads the same values as
    * naive timestamps — still hash-matches.
    */
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(s"$sfDir/$name.parquet")
    raw.schema.fields.collect {
      case f if f.dataType == org.apache.spark.sql.types.TimestampNTZType => f.name
    }.foldLeft(raw) { (df, c) =>
      df.withColumn(c, df.col(c).cast(org.apache.spark.sql.types.TimestampType))
    }
  }

  def lineitem(spark: SparkSession, d: String): DataFrame = t(spark, d, "lineitem")
  def orders(spark: SparkSession, d: String): DataFrame = t(spark, d, "orders")
  def customer(spark: SparkSession, d: String): DataFrame = t(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = t(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = t(spark, d, "part")
  def nation(spark: SparkSession, d: String): DataFrame = t(spark, d, "nation")
  def region(spark: SparkSession, d: String): DataFrame = t(spark, d, "region")
  /** events.parquet stores TIMESTAMP(NANOS), which Spark only reads via
    * `spark.sql.legacy.parquet.nanosAsLong=true` (set in Verify/Bench/tests).
    * Normalized here: `ts` becomes a microsecond TimestampType and `ts_ns`
    * keeps the exact int64 nanos for ns-faithful ordering/tie-breaks.
    */
  def events(spark: SparkSession, d: String): DataFrame = {
    val raw = t(spark, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts_ns", org.apache.spark.sql.functions.col("ts"))
          .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case _ =>
        raw.withColumn("ts_ns",
          org.apache.spark.sql.functions.expr("unix_micros(ts) * 1000"))
    }
  }
  def documents(spark: SparkSession, d: String): DataFrame = t(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = t(spark, d, "embeddings")
}
