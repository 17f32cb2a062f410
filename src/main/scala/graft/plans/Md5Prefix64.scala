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

/** Session extension registering the engine's native functions —
  * `spark.sql.extensions=graft.plans.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functionDescriptors.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => SizeFilterToExists)
  }
}

object GraftExtensions {
  private[graft] val functionDescriptors = Seq(
    (new FunctionIdentifier("md5_prefix64"),
      new ExpressionInfo(classOf[Md5Prefix64].getName, "md5_prefix64"),
      (children: Seq[Expression]) => Md5Prefix64(children.head): Expression),
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
      (children: Seq[Expression]) => CdcCuts(children.head): Expression))

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
