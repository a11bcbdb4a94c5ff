package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** DDSketch (Masson et al., VLDB 2019) log-bucket quantile state as a
  * typed `Aggregator` — the mergeable, bounded form the batch twin
  * (`q_ddsketch_quantiles`) derives by groupBy: the buffer is the
  * (bucket → count) map, `merge` is count addition (commutative,
  * associative), so Catalyst plans partial + final with map-side combine
  * in batch AND carries the same buffer as streaming window state. State
  * is value-RANGE-bounded (~50 buckets across any realistic positive
  * domain at α = 5%) regardless of row count — the 100 TB / infinite-
  * stream shape for quantiles.
  *
  * Input is the PRE-BUCKETED index (computed scan-stage as
  * `floor(round9(ln(v)/ln γ))` — the 9dp-round-before-floor discipline
  * that keeps a boundary value in the same bucket on every libm), so the
  * aggregator itself is pure integer bookkeeping. `finish` walks the
  * sorted buckets once per requested quantile rank (`ceil(q·n)` in
  * integer arithmetic) and returns the harmonic-mean midpoint estimate
  * `2γ^(b+1)/(γ+1)` per quantile, 6dp-floored — each guaranteed within
  * α relative error of the true rank value.
  *
  * @param gamma  bucket base (1+α)/(1−α)
  * @param qs     quantile ranks as (numerator, denominator) integer pairs
  */
case class DdSketchAgg(gamma: Double, qs: Seq[(Long, Long)])
    extends Aggregator[Int, Map[Int, Long], Array[Double]] {
  require(gamma > 1.0, s"gamma must exceed 1, got $gamma")
  require(qs.nonEmpty && qs.forall { case (n, d) => n > 0 && n <= d },
    s"quantile ranks must be fractions in (0, 1]: $qs")

  override def zero: Map[Int, Long] = Map.empty

  override def reduce(buf: Map[Int, Long], b: Int): Map[Int, Long] =
    buf.updated(b, buf.getOrElse(b, 0L) + 1L)

  override def merge(a: Map[Int, Long], b: Map[Int, Long]): Map[Int, Long] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else b.foldLeft(a) { case (acc, (k, v)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + v)
    }

  override def finish(r: Map[Int, Long]): Array[Double] = {
    if (r.isEmpty) return Array.fill(qs.length)(Double.NaN)
    val hist = r.toArray.sortBy(_._1)
    val n = hist.map(_._2).sum
    qs.map { case (num, den) =>
      val target = (n * num + den - 1) / den // ceil(q·n), exact
      var cum = 0L
      val b = hist.find { case (_, c) =>
        val hit = cum + c >= target; if (!hit) cum += c; hit
      }.get._1
      val est = 2.0 * math.pow(gamma, b + 1.0) / (gamma + 1.0)
      math.floor(est * 1e6 + 0.5) / 1e6
    }.toArray
  }

  override def bufferEncoder: Encoder[Map[Int, Long]] = ExpressionEncoder[Map[Int, Long]]()
  override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
}

object DdSketchAgg {
  /** α = 5% sketch of a pre-bucketed INT column → `array<double>` of
    * [p50, p95] harmonic-midpoint estimates. */
  def dd5(bucketCol: Column): Column =
    udaf(DdSketchAgg(1.05 / 0.95, Seq((1L, 2L), (95L, 100L))),
      Encoders.scalaInt)(bucketCol)
}
