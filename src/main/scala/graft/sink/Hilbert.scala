package graft.sink

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hilbert space-filling-curve keys — the locality-superior sibling of
  * [[ZOrder]]: a contiguous Hilbert-key range is always a CONNECTED
  * region of (x, y) space (Morton ranges jump at quadrant seams, e.g.
  * z = 1 → 2 teleports across the square), so files written in Hilbert
  * order get strictly tighter min/max envelopes on both dimensions —
  * the reason Delta Lake moved its OPTIMIZE clustering from Z-order to
  * Hilbert. The trade: the key needs a per-level state rotation, not a
  * plain bit-interleave.
  *
  * The conversion is the standard xy→d walk (Hilbert 1891; iterative
  * form as in Warren, "Hacker's Delight"): per level s = 2^(k−1) … 1,
  * take quadrant bits (rx, ry), add s²·((3·rx) XOR ry) to the distance,
  * and rotate/reflect the lower quadrant — here UNROLLED over the k
  * levels into chained projections of exact integer CASE/bit arithmetic
  * (each level's (x, y, d) is one projection — the expression tree stays
  * linear in k, codegen-friendly, shuffle-free, engine-portable). The
  * SQL twin renders the identical unrolled walk as nested CTE steps.
  *
  * At 100 TB the usage is [[ZOrder]]'s: quantize the two hottest filter
  * columns to 2^k, key, `repartitionByRange` + sort within partitions,
  * write; row-group stats then prune on either dimension.
  */
object Hilbert {

  /** Append `out` = order-`bits` Hilbert distance of (xCol, yCol), both
    * already quantized to [0, 2^bits). Emitted as a chain of per-level
    * projections over temp columns (dropped before return). */
  def withHilbertKey(df: DataFrame, xCol: Column, yCol: Column,
      bits: Int, out: String): DataFrame = {
    require(bits >= 1 && bits <= 31, s"bits out of range: $bits")
    val seeded = df
      .withColumn("__hx", xCol.cast("long"))
      .withColumn("__hy", yCol.cast("long"))
      .withColumn("__hd", lit(0L))
    val walked = (bits - 1 to 0 by -1).foldLeft(seeded) { (cur, level) =>
      val s = 1L << level
      val rx = when(col("__hx").bitwiseAND(lit(s)) > 0, 1L).otherwise(0L)
      val ry = when(col("__hy").bitwiseAND(lit(s)) > 0, 1L).otherwise(0L)
      // quadrant contribution, then the lower-half rotate/reflect:
      // if ry == 0 { if rx == 1 { x = s-1-x; y = s-1-y }; swap(x, y) }
      cur
        .withColumn("__rx", rx)
        .withColumn("__ry", ry)
        .withColumn("__hd",
          col("__hd") + lit(s * s)
            * (lit(3L) * col("__rx")).bitwiseXOR(col("__ry")))
        .withColumn("__hx2",
          when(col("__ry") === 0,
            when(col("__rx") === 1, lit(s - 1) - col("__hy"))
              .otherwise(col("__hy")))
            .otherwise(col("__hx")))
        .withColumn("__hy2",
          when(col("__ry") === 0,
            when(col("__rx") === 1, lit(s - 1) - col("__hx"))
              .otherwise(col("__hx")))
            .otherwise(col("__hy")))
        .withColumn("__hx", col("__hx2"))
        .withColumn("__hy", col("__hy2"))
        .drop("__hx2", "__hy2", "__rx", "__ry")
    }
    walked.withColumn(out, col("__hd")).drop("__hx", "__hy", "__hd")
  }

  /** The DuckDB twin of [[withHilbertKey]]: the identical unrolled walk
    * as chained CTE steps. `from` must expose columns (`xCol`, `yCol`)
    * plus `carry` (comma-separated passthrough columns); the final step
    * exposes `carry` plus `hd`. Returns the CTE chain body text and the
    * final CTE name as (ctes, lastName). */
  def hilbertSqlCtes(from: String, xCol: String, yCol: String,
      bits: Int, carry: String, prefix: String = "h"): (String, String) = {
    val seed =
      s"""${prefix}0 AS (SELECT $carry, CAST($xCol AS BIGINT) AS hx,
         |  CAST($yCol AS BIGINT) AS hy, CAST(0 AS BIGINT) AS hd
         |  FROM $from)""".stripMargin
    val steps = (bits - 1 to 0 by -1).zipWithIndex.map { case (level, i) =>
      val s = 1L << level
      val prev = s"$prefix$i"
      s"""$prefix${i + 1} AS (SELECT $carry,
         |  CASE WHEN ((hy >> $level) & 1) = 0 THEN
         |    CASE WHEN ((hx >> $level) & 1) = 1 THEN ${s - 1} - hy ELSE hy END
         |  ELSE hx END AS hx,
         |  CASE WHEN ((hy >> $level) & 1) = 0 THEN
         |    CASE WHEN ((hx >> $level) & 1) = 1 THEN ${s - 1} - hx ELSE hx END
         |  ELSE hy END AS hy,
         |  hd + ${s * s} * xor(3 * ((hx >> $level) & 1), (hy >> $level) & 1)
         |    AS hd
         |  FROM $prev)""".stripMargin
    }
    ((seed +: steps).mkString(",\n"), s"$prefix$bits")
  }
}
