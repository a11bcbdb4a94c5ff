package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen MinHash: folds an `array<long>` of token hashes into the
  * k-element signature `min_i((a_j * (h_i mod P) + b_j) mod P)` in ONE pass.
  * The expression-composition form (`Dedup.minhashSignatureHof`) builds k
  * separate `array_min(transform(...))` trees — k full walks and k
  * transient arrays per row; this is a fused n·k loop with one stack-local
  * minima array inside whole-stage codegen. Value-identical by construction
  * (same affine map, same modulus) — property-tested against the HOF twin,
  * shares its DuckDB oracle.
  *
  * Empty (or all-null-element) input yields a null signature (the HOF form
  * yields an array of k null mins): neither can band-match, so pair
  * outputs are identical — empty documents are never near-dup candidates.
  */
case class MinHashSigExpr(child: Expression, as: Seq[Long], bs: Seq[Long])
    extends UnaryExpression {

  private val P = 2147483647L // Mersenne prime 2^31-1, the minhash universe

  require(as.nonEmpty && as.length == bs.length,
    "coefficient arrays must be non-empty and equal-length")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.sql}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val k = as.length
    val mins = Array.fill(k)(Long.MaxValue)
    var seen = false
    var i = 0
    while (i < n) {
      // null slots are skipped, matching array_min's null handling in the
      // HOF twin (a null token hash must not fold b_j%P into every min)
      if (!hs.isNullAt(i)) {
        seen = true
        val h = hs.getLong(i) % P
        var j = 0
        while (j < k) {
          val v = (as(j) * h + bs(j)) % P
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (!seen) null else new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val aRef = ctx.addReferenceObj("minhashA", as.toArray, "long[]")
      val bRef = ctx.addReferenceObj("minhashB", bs.toArray, "long[]")
      val k = as.length
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val mins = ctx.freshName("mins")
      val seen = ctx.freshName("seen")
      s"""
         |int $n = $hs.numElements();
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |boolean $seen = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$hs.isNullAt($i)) {
         |    $seen = true;
         |    long $h = $hs.getLong($i) % ${P}L;
         |    for (int $j = 0; $j < $k; $j++) {
         |      long $v = ($aRef[$j] * $h + $bRef[$j]) % ${P}L;
         |      if ($v < $mins[$j]) $mins[$j] = $v;
         |    }
         |  }
         |}
         |if (!$seen) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

object MinHashSigExpr {
  def minhashFast(hashes: Column, coefs: Seq[(Long, Long)]): Column =
    Bridge.column(MinHashSigExpr(
      Bridge.expression(hashes), coefs.map(_._1), coefs.map(_._2)))
}
