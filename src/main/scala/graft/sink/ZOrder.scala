package graft.sink

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton (Z-order) space-filling-curve keys for multi-dimensional data
  * layout — the clustering decision bucketing cannot make: sorting a fact
  * table by the interleaved bits of TWO filter dimensions gives every
  * written file a bounded min/max envelope on BOTH columns, so parquet
  * row-group stats prune scans filtered on either dimension (or both).
  * A lexicographic sort gives the same locality only on its leading key;
  * the trailing key's per-file span stays the full domain.
  *
  * At 100 TB the pattern is: derive `zValue` of the two hottest filter
  * columns (quantized to `bits`), `repartitionByRange` on it, sort within
  * partitions by it, write. Contiguous z-ranges are axis-aligned rectangles
  * in key space (exact squares at power-of-4 boundaries), which is what
  * makes the min/max stats tight. All expressions are exact integer
  * bit-arithmetic — codegen'd, shuffle-free, engine-portable.
  */
object ZOrder {

  /** Interleave the low `bits` of two non-negative integral columns:
    * bit i of `a` lands at z-bit 2i, bit i of `b` at 2i+1. Inputs must
    * already be quantized to [0, 2^bits); compose with `% (1 << bits)` or
    * a width-preserving hash for wider domains.
    */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits out of range: $bits")
    val al = a.cast("long"); val bl = b.cast("long")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc +
        shiftright(al, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(bl, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }
  }

  /** Inverse of [[zValue]]: recover the even-bit dimension (pass the
    * z-column and get `a` back; [[deinterleaveOdd]] gives `b`). */
  def deinterleaveEven(z: Column, bits: Int): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc + shiftright(z.cast("long"), 2 * i).bitwiseAND(lit(1L)) * lit(1L << i)
    }

  def deinterleaveOdd(z: Column, bits: Int): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc + shiftright(z.cast("long"), 2 * i + 1).bitwiseAND(lit(1L)) * lit(1L << i)
    }

  /** The DuckDB twin of [[zValue]] over two BIGINT SQL expressions —
    * the identical bit-sum, rendered as SQL text for oracle queries. */
  def zValueSql(a: String, b: String, bits: Int): String =
    (0 until bits).map { i =>
      s"(($a >> $i) & 1) * ${1L << (2 * i)} + (($b >> $i) & 1) * ${1L << (2 * i + 1)}"
    }.mkString("(", " + ", ")")
}
