package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Native codegen 64-bit difference hash (dHash) — the perceptual
  * near-dup signature for the multimodal surface (round-14 verdict task
  * 3), sibling of [[SimHash64Expr]]: where SimHash folds token hashes,
  * dHash folds a DECODED 9×8 pixel grid (the deterministic
  * [[graft.ops.Multimodal.resizeStub]] thumbnail) into one bit per
  * horizontal gradient: bit (r·8 + c) = 1 iff grid[r][c] > grid[r][c+1]
  * (unsigned byte compare). Gradients survive re-encoding, scaling and
  * brightness shifts, so Hamming-close dHashes mean perceptually-close
  * media — the signature the banded pigeonhole pair join
  * ([[graft.ops.Dedup.bandedPairsFromSigs]]) blocks on.
  *
  * Inputs shorter than the 72-byte grid (only the empty payload, since
  * the clamped resize always emits w2·h2 bytes otherwise) hash to 0 —
  * the same zero-signature convention SimHash uses for token-less docs.
  */
case class DHash64Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "dhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${other.sql}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val g = input.asInstanceOf[Array[Byte]]
    if (g.length < 72) 0L
    else {
      var sig = 0L
      var r = 0
      while (r < 8) {
        var c = 0
        while (c < 8) {
          if ((g(r * 9 + c) & 0xff) > (g(r * 9 + c + 1) & 0xff))
            sig |= 1L << (r * 8 + c)
          c += 1
        }
        r += 1
      }
      sig
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, g => {
      val sig = ctx.freshName("sig")
      val r = ctx.freshName("r")
      val c = ctx.freshName("c")
      s"""
         |long $sig = 0L;
         |if ($g.length >= 72) {
         |  for (int $r = 0; $r < 8; $r++) {
         |    for (int $c = 0; $c < 8; $c++) {
         |      if (($g[$r * 9 + $c] & 0xff) > ($g[$r * 9 + $c + 1] & 0xff)) {
         |        $sig |= 1L << ($r * 8 + $c);
         |      }
         |    }
         |  }
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): DHash64Expr =
    copy(child = newChild)
}

object DHash64Expr {
  def dhash(grid: Column): Column =
    Bridge.column(DHash64Expr(Bridge.expression(grid)))
}
