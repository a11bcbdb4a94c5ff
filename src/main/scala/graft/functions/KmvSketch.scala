package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** K-minimum-values (KMV / bottom-k) sketch as a typed `Aggregator`: the
  * bounded, mergeable distinct-count state behind theta-style sketch set
  * algebra. The buffer is the sorted array of the k smallest DISTINCT
  * hash values seen; `merge` is a capped sorted-merge — commutative,
  * associative, idempotent on duplicates — so Catalyst's partial+final
  * planning gives map-side combine with O(k) state per group regardless
  * of input size: the 100 TB shape for distinct estimation, and (unlike
  * HLL registers) the sketch VALUES are engine-portable — a DuckDB oracle
  * rebuilds the identical array with `row_number() <= k` over the same
  * md5-fold hashes, so the driver gate hash-compares the sketch itself,
  * not just a tolerance contract.
  *
  * Estimator (derived in plain column arithmetic downstream, integer-only):
  * if fewer than k distinct values were seen the sketch is exhaustive and
  * |sketch| is exact; otherwise D ≈ (k-1) · 2³² / (h_k + 1) for hashes
  * uniform on [0, 2³²). Set algebra: union = capped merge of two sketches;
  * the fraction of the merged k-set present in both inputs estimates
  * Jaccard (Beyer et al., SIGMOD'07).
  *
  * The per-row insert is O(log k) search + O(k) copy — the right trade at
  * k=64 where the copy is two cache lines; a production k≫1000 sketch
  * would buffer-and-sort, but the aggregate's contract (sorted distinct
  * bounded array) would not change.
  */
case class KmvSketch(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  require(k > 0, s"k must be positive, got $k")

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(buf, h)
    if (pos >= 0) buf // already present — sketch state is a set
    else {
      val ins = -pos - 1
      if (buf.length < k) {
        val out = new Array[Long](buf.length + 1)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
        out
      } else if (ins < k) { // beats the current kth minimum; drop the max
        val out = new Array[Long](k)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(buf, ins, out, ins + 1, k - ins - 1)
        out
      } else buf
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new Array[Long](math.min(k, a.length + b.length))
    var i = 0; var j = 0; var n = 0
    while (n < k && (i < a.length || j < b.length)) {
      val next =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { val v = a(i); i += 1; v }
        else { val v = b(j); j += 1; v }
      if (n == 0 || out(n - 1) != next) { out(n) = next; n += 1 }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

object KmvSketch {
  /** k=64 sketch of a BIGINT hash column → sorted `array<bigint>` column. */
  def kmv64(hashCol: Column): Column = udaf(KmvSketch(64), Encoders.scalaLong)(hashCol)
}
