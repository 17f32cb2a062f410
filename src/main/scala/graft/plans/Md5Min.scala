package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import java.security.MessageDigest

/** Native fingerprint kernels (SURVEY §7.3 path (b)) for the document
  * fingerprint family (ref `str/kernels` fingerprinting; q46): the composed
  * form `array_min(transform(ws, w => md5(w)))` runs through an interpreted
  * HOF and materializes a 32-char hex string per element just to compare —
  * per word and per shingle that is millions of allocations per partition
  * at sf0.1 and billions at 100 TB. Hex encoding is monotone in the digest
  * bytes, so the minimum hex string == hex of the unsigned-byte-min digest:
  * one codegen'd loop keeps a 16-byte running min and hex-encodes ONCE per
  * row. Null elements are skipped (array_min / list_min semantics); an
  * empty or all-null array yields null.
  */
case class MinMd5Hex(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"min_md5_hex requires array<string>, got $t")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "min_md5_hex"

  override protected def nullSafeEval(input: Any): Any =
    MinMd5Hex.minHex(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.plans.MinMd5Hex.minHex($c);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinMd5Hex {
  private val digests = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))
  private val hexDigits = "0123456789abcdef".getBytes

  private def hex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(d(i) & 0xf)
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Called from both interpreted eval and generated code. */
  def minHex(arr: ArrayData): UTF8String = {
    val n = arr.numElements()
    val md = digests.get()
    var best: Array[Byte] = null
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        val d = md.digest(arr.getUTF8String(i).getBytes)
        if (best == null || java.util.Arrays.compareUnsigned(d, best) < 0)
          best = d
      }
      i += 1
    }
    if (best == null) null else hex(best)
  }

  private val space = " ".getBytes

  /** min-over-shingles md5, fused: digests `words[i..i+n-1]` joined by a
    * single space WITHOUT building the shingle string (MessageDigest is
    * streamed word bytes + separator). Byte-identical to
    * `md5(concat_ws(" ", slice(ws, i, n)))`. Returns null when fewer than
    * n words (empty shingle set). A null word inside a window makes that
    * window null (skipped) — concat_ws would instead drop the element, but
    * tokenized text never contains nulls. */
  def minShingleHex(arr: ArrayData, n: Int): UTF8String = {
    val len = arr.numElements()
    if (n <= 0 || len < n) return null
    val md = digests.get()
    var best: Array[Byte] = null
    var i = 0
    while (i <= len - n) {
      var ok = true
      var j = i
      while (ok && j < i + n) { if (arr.isNullAt(j)) ok = false; j += 1 }
      if (ok) {
        md.reset()
        j = i
        while (j < i + n) {
          if (j > i) md.update(space)
          md.update(arr.getUTF8String(j).getBytes)
          j += 1
        }
        val d = md.digest()
        if (best == null || java.util.Arrays.compareUnsigned(d, best) < 0)
          best = d
      }
      i += 1
    }
    if (best == null) null else hex(best)
  }
}

/** `min_shingle_md5_hex(words, n)` — see [[MinMd5Hex.minShingleHex]]. */
case class MinShingleMd5Hex(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"min_shingle_md5_hex requires (array<string>, int), got ($l, $r)")
    }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "min_shingle_md5_hex"

  override protected def nullSafeEval(words: Any, n: Any): Any =
    MinMd5Hex.minShingleHex(words.asInstanceOf[ArrayData],
      n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, n) => s"""
      ${ev.value} = graft.plans.MinMd5Hex.minShingleHex($w, $n);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}
