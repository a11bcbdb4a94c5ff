package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Exact second-moment (co-moment) matrix of a fixed-dimension float
  * vector column as ONE typed `Aggregator` pass — the sufficient
  * statistics for covariance/PCA over embeddings, computed the way a
  * 100 TB engine must: each input vector is ×1e6-quantized to longs and
  * folded into a single flat buffer holding the `dim` coordinate sums
  * followed by the `dim·(dim+1)/2` upper-triangle products Σ eᵢ·eⱼ
  * (i ≤ j, row-major). The buffer is one `Array[Long]` of
  * `dim + dim(dim+1)/2` entries (2144 longs for dim = 64 — ~17 KB),
  * merge is element-wise addition — commutative/associative, so Catalyst
  * plans partial + final aggregation with map-side combine and the whole
  * corpus collapses to ONE row regardless of size.
  *
  * Exactness: quantized coordinates of unit-scale embeddings are ≤ ~2e6
  * in magnitude; a product is ≤ 4e12 and 50k rows sum to ≤ 2e17 — inside
  * long. (At larger corpus scales, shrink the quantization or split the
  * accumulation — overflow is a documented precondition, not a silent
  * wrap: see [[MomentMatrix.maxRowsAt1e6]].) A DuckDB oracle rebuilds
  * the identical integers from the same floor(x·1e6 + 0.5) quantization,
  * so downstream eigen-iterations start from bit-identical matrices on
  * both engines.
  */
case class MomentMatrix(dim: Int) extends Aggregator[Array[Float], Array[Long], Array[Long]] {
  require(dim > 0, s"dim must be positive, got $dim")
  private val nPairs = dim * (dim + 1) / 2

  override def zero: Array[Long] = new Array[Long](dim + nPairs)

  override def reduce(buf: Array[Long], v: Array[Float]): Array[Long] = {
    require(v != null && v.length == dim,
      s"MomentMatrix(dim=$dim) got a vector of length ${if (v == null) -1 else v.length}")
    val q = new Array[Long](dim)
    var i = 0
    while (i < dim) {
      q(i) = math.floor(v(i) * 1e6 + 0.5).toLong
      buf(i) += q(i)
      i += 1
    }
    var k = dim
    i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        buf(k) += q(i) * q(j)
        k += 1
        j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object MomentMatrix {
  /** Conservative row bound before a Σ eᵢ·eⱼ cell can overflow long at the
    * ×1e6 quantization, for coordinates bounded by `maxAbs`. */
  def maxRowsAt1e6(maxAbs: Double): Long = {
    val q = math.ceil(maxAbs * 1e6).toLong + 1
    Long.MaxValue / (q * q)
  }

  /** Column form for dim-64 embeddings (the harness table's shape). */
  def moments64(c: Column): Column =
    udaf(MomentMatrix(64),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Float]]())(c)
}
