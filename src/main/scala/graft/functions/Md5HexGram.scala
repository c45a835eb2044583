package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native form of the substring family's exact window identity:
  * `md5(concat_ws(" ", slice(toks, pos, k)))` — the full 128-bit hex
  * digest of one k-token gram, fed the token bytes and single-space
  * separators directly instead of materializing the joined gram string
  * (~6·k bytes allocated + copied per window at the family's heavy
  * k = 50, inside interpreted transform lambdas on the verify lines of
  * q99/q100/q155/q156 and over EVERY corpus window in the substring
  * screen artifact builds). Values are IDENTICAL by construction — md5
  * over the same byte stream, same lowercase-hex rendering, including
  * the concat_ws null-skip and the short-tail slice — so every oracle
  * and stored `exact` digest set stays valid (DedupSpec pins equality
  * with the composed form). */
case class Md5HexGram(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  require(k >= 1, s"gram width must be >= 1, got $k")

  override def dataType: DataType = StringType
  override def prettyName: String = "md5_hex_gram"

  override def nullSafeEval(toks: Any, pos: Any): Any =
    Md5HexGram.compute(toks.asInstanceOf[ArrayData],
      pos.asInstanceOf[Number].intValue(), k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, p) => s"graft.functions.Md5HexGram.compute($t, (int)($p), $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Md5HexGram =
    copy(left = newLeft, right = newRight)
}

object Md5HexGram {

  private val Sep = Array(' '.toByte)
  private val HexDigits = "0123456789abcdef".getBytes

  /** md5 hex of tokens [pos, pos+k) joined by single spaces —
    * `pos` 1-based (slice semantics; a start past the end hashes the
    * empty string, exactly like the composed form), null tokens
    * skipped (concat_ws semantics). */
  def compute(toks: ArrayData, pos: Int, k: Int): UTF8String = {
    require(pos >= 1, s"gram start must be >= 1 (slice semantics), got $pos")
    val n = toks.numElements()
    val d = Md5Hash32Digest.get()
    d.reset()
    val end = math.min(pos - 1 + k, n)
    var i = pos - 1
    var first = true
    while (i < end) {
      if (!toks.isNullAt(i)) {
        if (!first) d.update(Sep)
        d.update(toks.getUTF8String(i).getBytes)
        first = false
      }
      i += 1
    }
    val bytes = d.digest()
    val out = new Array[Byte](32)
    var j = 0
    while (j < 16) {
      out(2 * j) = HexDigits((bytes(j) >> 4) & 0xf)
      out(2 * j + 1) = HexDigits(bytes(j) & 0xf)
      j += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Column API: identical to
    * `md5(concat_ws(" ", slice(toks, pos, lit(k))))`. */
  def of(toks: Column, pos: Column, k: Int): Column =
    ColumnBridge.column(Md5HexGram(
      ColumnBridge.expression(toks),
      ColumnBridge.expression(pos.cast("int")), k))
}

/** Shared thread-local MD5 instance (the [[Md5Hash32]] discipline —
  * MessageDigest is stateful). */
private[functions] object Md5Hash32Digest {
  private val md: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))
  def get(): java.security.MessageDigest = md.get()
}
