package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed table layout: the shuffle-elimination companion to
  * [[PartitionedParquet]]. Writing both sides of a recurring equi-join
  * bucketed (and sorted) by the join key pre-pays the shuffle ONCE at write
  * time; every subsequent join reads co-located buckets and sort-merges
  * with no Exchange on either side — at 100 TB the difference between a
  * full-network shuffle per query and none.
  *
  * Bucket-count discipline: both tables must use the same `buckets` (or an
  * integer multiple) for the co-location to hold; bucket count is the write-
  * time parallelism floor, so size it to the LARGER table's target
  * partition size, not the smaller's.
  */
object Bucketed {

  /** Write `df` as a bucketed, bucket-sorted parquet table in the session
    * catalog. Sorting within buckets makes the downstream sort-merge join's
    * per-bucket sort a no-op read order.
    */
  def writeBucketed(
      df: DataFrame, table: String, bucketCol: String, buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  /** Equi-join two same-bucketed catalog tables on their bucket keys.
    * With matching bucket counts the physical plan contains no shuffle
    * Exchange (asserted by BucketedJoinSpec).
    */
  def join(
      spark: SparkSession, leftTable: String, rightTable: String,
      leftKey: String, rightKey: String): DataFrame = {
    // side-qualified refs: bucketed tables commonly share the key's column
    // name (incl. self-joins), where bare col(...) would be ambiguous
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
