package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` (the engine's UDAF surface, SURVEY.md §2.3 UDF row):
  * exact weighted mean. Both running sums are `BigDecimal` so partial
  * aggregation is order-insensitive (Catalyst plans partial+final
  * automatically for Aggregator-backed UDAFs — map-side combine included);
  * the single double division happens once at `finish`, making results
  * deterministic under any partitioning and oracle-matchable.
  *
  * Usage: `df.agg(udaf(WeightedMean)($"value", $"weight"))` or as a
  * `TypedColumn` on `Dataset[(Double, Double)]`.
  */
object WeightedMean extends Aggregator[(Double, Double), (BigDecimal, BigDecimal), Double] {

  override def zero: (BigDecimal, BigDecimal) = (BigDecimal(0), BigDecimal(0))

  override def reduce(b: (BigDecimal, BigDecimal), in: (Double, Double)): (BigDecimal, BigDecimal) = {
    val (v, w) = in
    // DECIMAL(12,4) quantization mirrors the relational suite's `dec` cast
    val vd = BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP)
    val wd = BigDecimal(w).setScale(4, BigDecimal.RoundingMode.HALF_UP)
    (b._1 + vd * wd, b._2 + wd)
  }

  override def merge(a: (BigDecimal, BigDecimal), b: (BigDecimal, BigDecimal)): (BigDecimal, BigDecimal) =
    (a._1 + b._1, a._2 + b._2)

  override def finish(r: (BigDecimal, BigDecimal)): Double =
    if (r._2.signum == 0) Double.NaN
    // explicit 6-digit rounding: DuckDB's int128-decimal -> double cast
    // double-rounds for sums beyond 2^53, so raw quotients differ in the
    // last ulp (same discipline as TextAnalysis.round6)
    else math.floor(r._1.toDouble / r._2.toDouble * 1e6 + 0.5) / 1e6

  override def bufferEncoder: Encoder[(BigDecimal, BigDecimal)] =
    Encoders.product[(BigDecimal, BigDecimal)]

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
