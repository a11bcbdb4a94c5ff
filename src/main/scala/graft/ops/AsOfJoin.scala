package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** General backward as-of join — the operator family behind the
  * reference's forward-fill (F1 is an as-of join of a calendar against
  * change points; this is the unrestricted form for arbitrary left rows).
  *
  * For every left row, attach the single latest right row with
  * rightTime <= leftTime within the same key (LEFT semantics: unmatched
  * left rows keep nulls).
  *
  * Spark-first plan — ONE shuffle, no range-join explosion: tag and union
  * both inputs, sort within key by (time, side) in a single window, and
  * carry the last right values forward with `last(ignoreNulls)`. Right
  * rows sort before left rows at equal times (side 0 < 1), so a right row
  * AT the left timestamp matches — the standard backward-asof convention
  * (DuckDB's ASOF JOIN `ON l.t >= r.t` is the differential oracle).
  * At scale this behaves exactly like the LOCF fill: state per partition is
  * one row of carried values; skew on the key is AQE-splittable.
  */
object AsOfJoin {

  /** @param left      probe rows (all columns preserved)
    * @param right     reference rows
    * @param keyCols   equi-join key
    * @param leftTime  ordering column on left (e.g. event ns)
    * @param rightTime ordering column on right — same type as leftTime
    * @param valueCols right columns to attach
    * @param rightTieBreak orders right rows sharing (key, time); LAST wins
    */
  def backward(
      left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTime: String, rightTime: String,
      valueCols: Seq[String], rightTieBreak: Seq[String]): DataFrame = {
    val t = "__asof_t"
    val side = "__asof_side"
    val carry = "__asof_carry"
    val leftCols = left.columns.toSeq

    // SQL join semantics: NULL keys never match. Window.partitionBy would
    // group null keys into one partition and happily carry null-key right
    // values into null-key left rows — drop null-key RIGHT rows instead
    // (null-key LEFT rows stay, with null asof values, as LEFT join does).
    val rightClean = right.na.drop(keyCols)

    val tbs = rightTieBreak.zipWithIndex.map { case (_, i) => s"__asof_tb_$i" }
    // all right values ride in ONE struct so a match is all-or-nothing —
    // per-column fills could mix values from different right rows when some
    // columns are null
    val r = rightClean.select(
      (keyCols.map(col) :+ col(rightTime).as(t) :+ lit(0).as(side) :+
        struct(valueCols.map(col): _*).as(carry)) ++
        rightTieBreak.zip(tbs).map { case (c, a) => col(c).as(a) }: _*)
    val l = left.select(
      (leftCols.map(col) :+ col(leftTime).as(t) :+ lit(1).as(side) :+
        lit(null).cast(r.schema(carry).dataType).as(carry)) ++
        tbs.map(a => lit(null).cast(r.schema(a).dataType).as(a)): _*)

    // right rows (side 0) precede left rows (side 1) at equal times; the
    // tie-break orders same-time right rows so the LAST one is carried
    val order = (Seq(col(t), col(side)) ++ tbs.map(col)).map(_.asc)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    r.unionByName(l, allowMissingColumns = true)
      .withColumn(carry, last(col(carry), ignoreNulls = true).over(w))
      .filter(col(side) === 1)
      .select(leftCols.map(col) ++
        valueCols.map(v => col(s"$carry.$v").as(s"asof_$v")): _*)
  }
}
