package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 32-bit md5-prefix token hash: the first 4 digest bytes as an
  * unsigned big-endian long — definitionally equal to the SQL form
  * `conv(substring(md5(t), 1, 8), 16, 10)` (equivalence spec'd), but
  * without materializing the 32-char hex string and re-parsing it through
  * `conv`'s radix BigInteger path. Every dedup operator hashes every token
  * through this (MinHash, SimHash), so the hex round-trip was pure per-token
  * overhead. Thread-local MessageDigest: instances aren't thread-safe and
  * allocation per row would dominate.
  */
case class TokenHash32Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "token_hash32"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.sql}")
  }

  override protected def nullSafeEval(input: Any): Any =
    TokenHash32Expr.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.TokenHash32Expr.hash($s);")

  override protected def withNewChildInternal(newChild: Expression): TokenHash32Expr =
    copy(child = newChild)
}

object TokenHash32Expr {

  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 4 md5 bytes as an unsigned 32-bit value in a long. Called from
    * generated code — must stay public static-like. */
  def hash(s: UTF8String): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  def tokenHashFast(c: Column): Column =
    Bridge.column(TokenHash32Expr(Bridge.expression(c)))
}
