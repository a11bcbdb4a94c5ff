package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen SimHash: folds an `array<long>` of 32-bit token hashes
  * into the 32-bit SimHash signature in ONE pass with a stack-local count
  * array. The higher-order-function formulation (`Dedup.simhash32Hof`)
  * evaluates 32 separate `aggregate` lambdas — 32 full walks of the hash
  * array per row through the Catalyst lambda interpreter; this expression
  * is a tight fused loop (n·32 branch-free ops) inside whole-stage codegen.
  * Bit-identical by construction (same +1/-1 counting, same bit order) —
  * property-tested against the HOF twin, shares its DuckDB oracle.
  */
case class SimHash32Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.sql}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](32)
    val n = hs.numElements()
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < 32) {
        counts(j) += (((h >> j) & 1L).toInt << 1) - 1 // +1 if bit set else -1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 32) { if (counts(j) > 0) sig |= 1L << j; j += 1 }
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
         |int[] $counts = new int[32];
         |int $n = $hs.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $hs.getLong($i);
         |  for (int $j = 0; $j < 32; $j++) {
         |    $counts[$j] += ((int) (($h >> $j) & 1L) << 1) - 1;
         |  }
         |}
         |long $sig = 0L;
         |for (int $j = 0; $j < 32; $j++) {
         |  if ($counts[$j] > 0) $sig |= 1L << $j;
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash32Expr =
    copy(child = newChild)
}

object SimHash32Expr {
  def simhashFast(hashes: Column): Column =
    Bridge.column(SimHash32Expr(Bridge.expression(hashes)))
}
