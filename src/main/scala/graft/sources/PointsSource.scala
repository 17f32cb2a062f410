package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import scala.util.Random

/** A full DataSourceV2 implementation of the reference's generic source
  * protocol (`from_map` + `mock`/`prepare_for_projection`/`project`,
  * /root/reference/src/dask_awkward/lib/io/io.py:528-697 and
  * layers/layers.py:68-141): a pluggable scan that
  *
  *  - defines its own partitioning (one partition per `numPartitions`
  *    slice — the reference's "one partition per input"),
  *  - supports COLUMN PRUNING pushdown (`SupportsPushDownRequiredColumns`
  *    == the reference's `project_columns` protocol): pruned-away nested
  *    generators are never evaluated,
  *  - generates the reference's canonical "points" test fixture shape
  *    (array<struct<x,y>> jagged rows, lib/testutils.py:141-150),
  *    deterministically from a seed.
  *
  * Usage: `spark.read.format("graft.sources.PointsSource")
  *   .option("rows", 1000).option("partitions", 8).load()`
  */
class PointsSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PointsSource.fullSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new PointsTable(
      properties.getOrDefault("rows", "100").toLong,
      properties.getOrDefault("partitions", "4").toInt,
      properties.getOrDefault("seed", "414").toLong)
}

object PointsSource {
  val fullSchema: StructType = StructType(Seq(
    StructField("row_id", LongType, nullable = false),
    StructField("points", ArrayType(StructType(Seq(
      StructField("x", LongType, nullable = false),
      StructField("y", LongType, nullable = false))), containsNull = false),
      nullable = false),
    StructField("label", StringType, nullable = false)))
}

class PointsTable(rows: Long, partitions: Int, seed: Long)
    extends Table with SupportsRead {
  override def name(): String = s"graft_points($rows)"
  override def schema(): StructType = PointsSource.fullSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PointsScanBuilder(rows, partitions, seed)
}

class PointsScanBuilder(rows: Long, partitions: Int, seed: Long)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  import org.apache.spark.sql.sources._

  private var required: StructType = PointsSource.fullSchema
  // row_id range accepted from pushed filters: [lo, hi)
  private var lo = 0L
  private var hi = Long.MaxValue
  private var accepted: Array[Filter] = Array.empty

  // the reference's `project_columns` (parquet.py:179-190): remember the
  // projection; the readers below only generate what was asked for
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  // Filter pushdown with real PARTITION PRUNING: row_id is this source's
  // physical ordering key, so range predicates on it narrow which input
  // partitions are planned at all (the behavior that matters at scale —
  // the analogue of parquet row-group min/max skipping). Everything else
  // is returned as residual for Spark to evaluate post-scan.
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, residual) = filters.partition {
      case GreaterThan("row_id", _: java.lang.Long | _: java.lang.Integer) => true
      case GreaterThanOrEqual("row_id", _: java.lang.Long | _: java.lang.Integer) => true
      case LessThan("row_id", _: java.lang.Long | _: java.lang.Integer) => true
      case LessThanOrEqual("row_id", _: java.lang.Long | _: java.lang.Integer) => true
      case EqualTo("row_id", _: java.lang.Long | _: java.lang.Integer) => true
      case _ => false
    }
    def num(v: Any): Long = v match {
      case l: java.lang.Long => l
      case i: java.lang.Integer => i.toLong
    }
    // saturating +1: `Long.MaxValue + 1` would wrap to MinValue and turn
    // an empty/half-open bound into "everything". Saturation is exact here
    // because row ids are 0..rows-1 < Long.MaxValue, so a bound AT
    // MaxValue selects the same rows as one past it.
    def bump(v: Long): Long = if (v == Long.MaxValue) v else v + 1
    ok.foreach {
      case GreaterThan(_, v) => lo = math.max(lo, bump(num(v)))
      case GreaterThanOrEqual(_, v) => lo = math.max(lo, num(v))
      case LessThan(_, v) => hi = math.min(hi, num(v))
      case LessThanOrEqual(_, v) => hi = math.min(hi, bump(num(v)))
      case EqualTo(_, v) => lo = math.max(lo, num(v)); hi = math.min(hi, bump(num(v)))
      case _ => ()
    }
    accepted = ok
    residual
  }
  override def pushedFilters(): Array[Filter] = accepted

  override def build(): Scan = new Scan with Batch
      with SupportsReportStatistics {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    // post-pushdown statistics (the reference's from_map protocol reports
    // row counts the same way; SURVEY §2.11): row count reflects the
    // pruned [lo, hi) range and the size estimate the pruned columns, so
    // Catalyst's join-side planning sees the real scan, not the raw table
    override def estimateStatistics(): Statistics = new Statistics {
      private val n = math.max(0L, math.min(rows, hi) - math.max(0L, lo))
      // ~8 bytes per numeric leaf; points average 1.5 structs of 2 longs
      private val perRow = required.fields.map {
        case f if f.name == "points" => 24L
        case f if f.name == "label" => 6L
        case _ => 8L
      }.sum
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(n * math.max(perRow, 1L))
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.of(n)
    }
    override def planInputPartitions(): Array[InputPartition] = {
      val per = math.max(1L, (rows + partitions - 1) / partitions)
      (0L until rows by per)
        .map(start => PointsPartition(math.max(start, lo),
          math.min(math.min(start + per, rows), hi)))
        .filter(p => p.start < p.end)
        .toArray[InputPartition]
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new PointsReaderFactory(required, seed)
  }
}

case class PointsPartition(start: Long, end: Long) extends InputPartition

class PointsReaderFactory(required: StructType, seed: Long)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[PointsPartition]
    new PartitionReader[InternalRow] {
      private var i = part.start - 1
      override def next(): Boolean = { i += 1; i < part.end }
      override def get(): InternalRow = {
        val rng = new Random(seed ^ i)                  // per-row determinism
        val n = rng.nextInt(4)                          // jagged: 0-3 points
        val fields: Seq[Any] = required.fields.toSeq.map(_.name match {
          case "row_id" => i
          case "label" => UTF8String.fromString(s"p$i")
          case "points" =>
            // only materialized when the projection kept this column
            new GenericArrayData((0 until n).map { _ =>
              InternalRow(rng.nextLong() % 100, rng.nextLong() % 100)
            }.toArray[Any]): ArrayData
        })
        InternalRow.fromSeq(fields)
      }
      override def close(): Unit = ()
    }
  }
}
