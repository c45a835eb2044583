package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native form of the engine's portable hash
  * ([[PortableHash.md5Hash32]]): the first 4 MD5 digest bytes of the
  * UTF-8 input, big-endian unsigned — bit-identical to
  * `conv(substring(md5(x), 1, 8), 16, 10) cast long`, the formula the
  * DuckDB oracles mirror.
  *
  * Why native: the composed form materializes a 32-char hex string per
  * call and then radix-parses 8 chars of it (`Conv`), and it sits in
  * the hottest loop the engine has — inside `transform` lambdas over
  * every token/gram of the corpus (minhash, simhash, dup spans,
  * winnowing, inverted index, decontamination …), where higher-order
  * lambdas run interpreted and the two string allocations dominate.
  * This expression hashes the UTF8String bytes directly into a long —
  * no hex, no parse — and compiles to a single static call in
  * whole-stage codegen. Values are unchanged, so every oracle and every
  * stored artifact hash stays valid (PropertySpec pins equality with
  * the composed formula).
  */
case class Md5Hash32(child: Expression) extends UnaryExpression {

  // no ExpectsInputTypes: both entry points (PortableHash.md5Hash32 and
  // the SQL registration) wrap the child in Cast(_, StringType), so the
  // input is a UTF8String by construction
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_hash32"

  override protected def nullSafeEval(input: Any): Any =
    Md5Hash32.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Hash32.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Hash32 =
    copy(child = newChild)
}

object Md5Hash32 {
  // MessageDigest is stateful — one instance per executor thread
  private val md: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** First 8 hex chars of md5(s) as a long in [0, 2^32). */
  def compute(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val bytes = d.digest(s.getBytes)
    ((bytes(0) & 0xffL) << 24) | ((bytes(1) & 0xffL) << 16) |
      ((bytes(2) & 0xffL) << 8) | (bytes(3) & 0xffL)
  }
}
