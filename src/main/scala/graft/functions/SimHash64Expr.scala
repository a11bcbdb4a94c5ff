package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen 64-bit SimHash: folds an `array<long>` of full-width
  * 64-bit token hashes ([[TokenHash64Expr]]) into the 64-bit signature in
  * one pass — same fused fold as [[SimHash32Expr]], doubled width. Because
  * each signature bit depends only on the same bit of every token hash, the
  * high word of the result equals `simhash32` over the hashes' high words
  * and the low word equals `simhash32` over the low words — which is exactly
  * how the DuckDB oracle (and the equivalence spec) reconstruct it without
  * unsigned 64-bit arithmetic.
  *
  * The 64-bit width is what makes pigeonhole banding effective: splitting
  * into maxHamming+1 <= 8 chunks keeps every chunk >= 8 bits, so unrelated
  * documents collide on a band with probability <= 1/256 instead of the
  * 1/8-per-band of a 3-bit chunk over 32 bits.
  */
case class SimHash64Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.sql}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    val n = hs.numElements()
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < 64) {
        counts(j) += (((h >>> j) & 1L).toInt << 1) - 1 // +1 if bit set else -1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) sig |= 1L << j; j += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val counts = ctx.freshName("counts")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      s"""
         |int[] $counts = new int[64];
         |int $n = $hs.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $hs.getLong($i);
         |  for (int $j = 0; $j < 64; $j++) {
         |    $counts[$j] += ((int) (($h >>> $j) & 1L) << 1) - 1;
         |  }
         |}
         |long $sig = 0L;
         |for (int $j = 0; $j < 64; $j++) {
         |  if ($counts[$j] > 0) $sig |= 1L << $j;
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

object SimHash64Expr {
  def simhashFast(hashes: Column): Column =
    Bridge.column(SimHash64Expr(Bridge.expression(hashes)))
}
