package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.unsafe.types.UTF8String
import java.security.MessageDigest

/** Native Catalyst expression (SURVEY §7.3 path (b)): the unsigned 32-bit
  * value of the first 4 md5 bytes, as a long — i.e. exactly
  * `conv(substring(md5(x), 1, 8), 16, 10)` but in ONE codegen'd kernel with
  * no hex-string round trip (the composed form materializes a 32-char hex
  * string and re-parses it per row; in the MinHash pipeline this runs once
  * per shingle, i.e. billions of times at 100 TB).
  */
case class Md5Prefix64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_prefix64 requires a string argument, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix64"

  override protected def nullSafeEval(input: Any): Any =
    Md5Prefix64.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Md5Prefix64.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Prefix64 {
  private val digests = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** Called from both interpreted eval and generated code. */
  def hash(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }
}

/** 60-bit md5 prefix: the first 15 hex nibbles of md5(x) as a long —
  * the widest md5 prefix whose DuckDB mirror stays INTEGER-EXACT: split
  * 7 + 8 nibbles, each half sums exactly in doubles (< 2^32), recombined
  * as BIGINT hi * 16^8 + lo <= 16^15 - 1 < 2^63. The 32-bit
  * [[Md5Prefix64]] is fine as a bucket key with a verify stage behind it,
  * but as a MATCH predicate it saturates at corpus scale: 10^12 segments
  * over 2^32 buckets puts ~250 distinct contents in EVERY bucket, so a
  * frequency/dedup query keyed on it would flag essentially everything.
  * At 60 bits the expected cross-content collisions at 10^12 keys are
  * ~400 globally — rare enough that a content-verify stage over the
  * collision mass is effectively free. */
case class Md5Prefix60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_prefix60 requires a string argument, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix60"

  override protected def nullSafeEval(input: Any): Any =
    Md5Prefix60.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Md5Prefix60.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Prefix60 {
  private val digests = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** First 8 md5 bytes big-endian, shifted right 4: the top 15 nibbles. */
  def hash(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }
}

/** Session extension registering the engine's native functions —
  * `spark.sql.extensions=graft.plans.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functionDescriptors.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => SizeFilterToExists)
    // operator-optimization batch — runs before SchemaPruning's early
    // scan-pushdown batch, so the extracted form is what pruning sees
    ext.injectOptimizerRule(_ => TransformFieldExtraction)
  }
}

object GraftExtensions {
  private[graft] val functionDescriptors = Seq(
    (new FunctionIdentifier("md5_prefix64"),
      new ExpressionInfo(classOf[Md5Prefix64].getName, "md5_prefix64"),
      (children: Seq[Expression]) => Md5Prefix64(children.head): Expression),
    (new FunctionIdentifier("md5_prefix60"),
      new ExpressionInfo(classOf[Md5Prefix60].getName, "md5_prefix60"),
      (children: Seq[Expression]) => Md5Prefix60(children.head): Expression),
    (new FunctionIdentifier("prefix_offsets"),
      new ExpressionInfo(classOf[PrefixOffsets].getName, "prefix_offsets"),
      (children: Seq[Expression]) => PrefixOffsets(children.head): Expression),
    (new FunctionIdentifier("deflate_ratio"),
      new ExpressionInfo(classOf[DeflateRatio].getName, "deflate_ratio"),
      (children: Seq[Expression]) => DeflateRatio(children.head): Expression),
    (new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) =>
        DotProduct(children(0), children(1)): Expression),
    (new FunctionIdentifier("quantize_stats"),
      new ExpressionInfo(classOf[QuantizeStats].getName, "quantize_stats"),
      (children: Seq[Expression]) => QuantizeStats(children.head): Expression),
    (new FunctionIdentifier("min_md5_hex"),
      new ExpressionInfo(classOf[MinMd5Hex].getName, "min_md5_hex"),
      (children: Seq[Expression]) => MinMd5Hex(children.head): Expression),
    (new FunctionIdentifier("min_shingle_md5_hex"),
      new ExpressionInfo(classOf[MinShingleMd5Hex].getName,
        "min_shingle_md5_hex"),
      (children: Seq[Expression]) =>
        MinShingleMd5Hex(children(0), children(1)): Expression),
    (new FunctionIdentifier("cdc_cuts"),
      new ExpressionInfo(classOf[CdcCuts].getName, "cdc_cuts"),
      (children: Seq[Expression]) => CdcCuts(children.head): Expression),
    (new FunctionIdentifier("bigram_sq_sum"),
      new ExpressionInfo(classOf[BigramSqSum].getName, "bigram_sq_sum"),
      (children: Seq[Expression]) => BigramSqSum(children.head): Expression))

  /** Imperative fallback: if `getOrCreate` returned a session built without
    * `spark.sql.extensions=graft.plans.GraftExtensions` (e.g. a harness
    * created it first), register the functions directly. Idempotent. */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    functionDescriptors.foreach { case (id, info, builder) =>
      if (!reg.functionExists(id)) reg.registerFunction(id, info, builder)
    }
  }
}
