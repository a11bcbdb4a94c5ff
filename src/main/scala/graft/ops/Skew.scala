package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Skew-resilient two-phase aggregation (SURVEY.md §4: "skewed keys →
  * salting or AQE skew-join"). A hot grouping key that would pin one
  * reducer is spread over `salts` sub-keys: partial-aggregate on
  * (key, salt), then final-aggregate on key. Decomposable aggregates only
  * (sum/count here); results are identical to the direct groupBy — the
  * oracle IS the plain GROUP BY, which is the correctness proof.
  *
  * The salt is `pmod(hash-ish of a uniform column, salts)` — deterministic
  * per row (crc32 of a row-unique column), so re-runs produce identical
  * partials. AQE's skewedJoin handles join skew; this is the groupBy-side
  * counterpart that AQE does not rewrite.
  */
object Skew {

  /** Decimal-exact salted sum/count per key. `saltSource` must be a
    * row-level column (unique-ish values spread the hot key uniformly). */
  def saltedSumCount(
      df: DataFrame, keyCols: Seq[String], valueCol: String,
      saltSource: Column, salts: Int = 16): DataFrame = {
    val dec = col(valueCol).cast(DecimalType(12, 4))
    val partial = df
      .withColumn("__salt", pmod(crc32(saltSource.cast("string")), lit(salts)))
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(sum(dec).as("__psum"), count(lit(1)).as("__pcnt"))
    partial
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__psum")).cast("double").as("sum_value"),
        sum(col("__pcnt")).as("n_rows"))
  }
}
