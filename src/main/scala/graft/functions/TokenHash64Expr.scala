package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 64-bit md5-prefix token hash: the first 8 digest bytes as one
  * big-endian long (hex chars 1-16 of `md5(t)`). The high 32 bits are
  * definitionally [[TokenHash32Expr]] (hex chars 1-8); the low 32 bits fold
  * hex chars 9-16 the same way — so the DuckDB oracle reconstructs each half
  * with the proven 32-bit hex-fold and never needs unsigned 64-bit
  * arithmetic (DuckDB BIGINT is checked; a 16-nibble fold would overflow).
  *
  * Motivation: a 32-bit SimHash cannot be banded into chunks wide enough to
  * prune (maxHamming=10 forces 3-bit chunks -> ~1.5x all-pairs candidates);
  * 64 signature bits give maxHamming<=7 eight-bit chunks (collision rate
  * 1/256 per band for unrelated docs). One md5 per token, same thread-local
  * digest discipline as the 32-bit expression.
  */
case class TokenHash64Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "token_hash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.sql}")
  }

  override protected def nullSafeEval(input: Any): Any =
    TokenHash64Expr.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.TokenHash64Expr.hash($s);")

  override protected def withNewChildInternal(newChild: Expression): TokenHash64Expr =
    copy(child = newChild)
}

object TokenHash64Expr {

  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 8 md5 bytes as a big-endian long (may be negative — all 64 bits
    * carry hash). Called from generated code — must stay public. */
  def hash(s: UTF8String): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h
  }

  def tokenHashFast(c: Column): Column =
    Bridge.column(TokenHash64Expr(Bridge.expression(c)))
}
