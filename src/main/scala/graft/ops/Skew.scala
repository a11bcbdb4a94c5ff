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

  /** Salted equi-join for hot join keys — the MANUAL mitigation for the
    * cases AQE's OptimizeSkewedJoin cannot touch (AQE splits oversized
    * shuffle partitions of sort-merge joins at runtime, but a hot key
    * inside streaming state, a bucketed-table join that skipped the
    * exchange, or a key so hot one partition exceeds the split floor
    * still pins a task): the fact side draws a deterministic salt in
    * [0, salts), the dim side is replicated `salts`× via a literal-range
    * explode, and the join runs on (key, salt) — every hot key now
    * spreads over `salts` reducers. Exactness: each fact row meets each
    * dim row exactly once (its own salt replica), so the result multiset
    * equals the plain join's — the oracle IS the plain join. Cost: dim
    * rows shuffle `salts`× (choose salts ≪ fact-rows-per-hot-key; the
    * dim side is the small one by construction).
    */
  def saltedJoin(
      fact: DataFrame, dim: DataFrame, keyCols: Seq[String],
      saltSource: Column, salts: Int = 16): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    // coalesce: crc32(NULL) is NULL, and a NULL salt would silently drop
    // fact rows from the inner (key, salt) join that the plain join keeps
    val f = fact.withColumn("__salt",
      pmod(crc32(coalesce(saltSource.cast("string"), lit(""))), lit(salts))
        .cast("int"))
    val d = dim.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
      .withColumn("__salt", col("__salt").cast("int"))
    f.join(d, keyCols :+ "__salt").drop("__salt")
  }

  /** Decimal-exact salted sum/count per key. `saltSource` must be a
    * row-level column (unique-ish values spread the hot key uniformly). */
  def saltedSumCount(
      df: DataFrame, keyCols: Seq[String], valueCol: String,
      saltSource: Column, salts: Int = 16): DataFrame = {
    val dec = col(valueCol).cast(DecimalType(12, 4))
    val partial = df
      .withColumn("__salt",
        pmod(crc32(coalesce(saltSource.cast("string"), lit(""))), lit(salts)))
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(sum(dec).as("__psum"), count(lit(1)).as("__pcnt"))
    partial
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__psum")).cast("double").as("sum_value"),
        sum(col("__pcnt")).as("n_rows"))
  }
}
