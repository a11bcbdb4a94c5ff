package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
/** Native Catalyst expression counting common elements of two SORTED,
  * DISTINCT `array<string>` (or `array<bigint>` — shingle-hash sets)
  * columns in one fused merge walk — the hot
  * inner loop of the exact-Jaccard verify stage in the near-dup operators
  * (SURVEY.md §2.4; the token sets come from
  * [[graft.ops.TextAnalysis.tokenSet]] = array_sort(array_distinct(...)),
  * so sortedness is an input contract, see `require`-style caveat below).
  *
  * Why a custom Expression and not `size(array_intersect(a, b))`:
  * array_intersect builds a per-row hash set of one side and probes the
  * other — an allocation and hashing pass per candidate pair, exactly
  * where LSH concentrates work (candidates ≪ corpus, but each candidate
  * pays the verify). The merge walk does zero allocation and one
  * binary-comparison pass over both arrays inside whole-stage codegen
  * (measured ~2× on the sf0.1 verify stage).
  *
  * CONTRACT: both inputs must be sorted ascending (Spark's UTF8String
  * binary order — what array_sort produces) with distinct elements.
  * Unsorted input silently undercounts; this is not checked per row (a
  * check would cost the pass the expression exists to save). The
  * equivalence spec pins this against array_intersect on real corpora.
  *
  * NULL handling: a NULL array yields NULL (BinaryExpression default);
  * NULL ELEMENTS sort first in array_sort's output and never equal
  * anything here (array_intersect also drops null-vs-null matches only
  * when both sides contain null — tokenSet arrays cannot contain null
  * elements, so the difference is unobservable on the contract inputs).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  // array<string> (token sets, UTF8 binary order) or array<bigint>
  // (shingle-hash sets, numeric order) — both are what array_sort emits
  // for their element type, so the sortedness contract is unchanged
  private def elemType: Option[DataType] = Seq(left, right).map(_.dataType) match {
    case Seq(ArrayType(StringType, _), ArrayType(StringType, _)) => Some(StringType)
    case Seq(ArrayType(LongType, _), ArrayType(LongType, _)) => Some(LongType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType.isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<string> or two array<bigint> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")

  override def nullable: Boolean = true

  private def isLong: Boolean = elemType.contains(LongType)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    val long = isLong
    var i = 0; var j = 0; var c = 0
    while (i < nx && j < ny) {
      if (x.isNullAt(i)) { i += 1 }
      else if (y.isNullAt(j)) { j += 1 }
      else {
        val cmp =
          if (long) java.lang.Long.compare(x.getLong(i), y.getLong(j))
          else x.getUTF8String(i).compareTo(y.getUTF8String(j))
        if (cmp == 0) { c += 1; i += 1; j += 1 }
        else if (cmp < 0) i += 1
        else j += 1
      }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val cmp = ctx.freshName("cmp")
      val cmpExpr =
        if (isLong) s"Long.compare($x.getLong($i), $y.getLong($j))"
        else s"$x.getUTF8String($i).compareTo($y.getUTF8String($j))"
      s"""
         |int $nx = $x.numElements();
         |int $ny = $y.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $nx && $j < $ny) {
         |  if ($x.isNullAt($i)) { $i++; }
         |  else if ($y.isNullAt($j)) { $j++; }
         |  else {
         |    int $cmp = $cmpExpr;
         |    if ($cmp == 0) { $c++; $i++; $j++; }
         |    else if ($cmp < 0) { $i++; }
         |    else { $j++; }
         |  }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  /** Column-API entry point: fused sorted-set intersection count. */
  def intersectCountFast(a: Column, b: Column): Column =
    Bridge.column(SortedIntersectCount(Bridge.expression(a), Bridge.expression(b)))
}
