package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** In-pass data-quality metrics via `Dataset.observe` — the observability
  * primitive a 100 TB pipeline needs because a separate metrics query IS
  * a second full scan: `observe` attaches accumulator-backed aggregates
  * to the frame's one real action (the write), so row counts, null-key
  * counts, and value bounds arrive FREE with the job that already ran.
  *
  * Batch: [[qualityObserved]] returns the instrumented frame plus the
  * `Observation` handle — run any action, then `observation.get` blocks
  * until the metrics land. Streaming: the same `observe(name, ...)` call
  * works on a streaming Dataset; metrics surface per micro-batch through
  * `StreamingQueryProgress.observedMetrics` (use [[qualityMetricExprs]]
  * with `df.observe("name", exprs…)` — the Observation class itself is
  * batch-only).
  *
  * The metric expressions are all partial-aggregatable (count/sum/min/
  * max), so the observation adds no shuffle and no extra pass — the
  * accumulators ride the existing tasks.
  */
object Observability {

  /** The standard quality metric set over a (key, value) pair:
    * row count, NULL-key rows, NULL values, negative values, value
    * min/max. All single-pass, combine-friendly aggregates. */
  def qualityMetricExprs(keyCol: String, valueCol: String): Seq[Column] = Seq(
    count(lit(1)).as("n_rows"),
    sum(when(col(keyCol).isNull, 1L).otherwise(0L)).as("n_null_key"),
    sum(when(col(valueCol).isNull, 1L).otherwise(0L)).as("n_null_value"),
    sum(when(col(valueCol) < 0, 1L).otherwise(0L)).as("n_negative"),
    min(col(valueCol)).as("value_min"),
    max(col(valueCol)).as("value_max"))

  /** Instrument a batch frame: returns (same frame, metrics handle).
    * After ANY action on the returned frame, `_2.get` yields the row
    * map: n_rows, n_null_key, n_null_value, n_negative, value_min/max. */
  def qualityObserved(df: DataFrame, keyCol: String, valueCol: String)
      : (DataFrame, Observation) = {
    val obs = Observation()
    val exprs = qualityMetricExprs(keyCol, valueCol)
    (df.observe(obs, exprs.head, exprs.tail: _*), obs)
  }
}
