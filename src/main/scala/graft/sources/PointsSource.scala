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
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = PointsSource.fullSchema

  // the reference's `project_columns` (parquet.py:179-190): remember the
  // projection; the readers below only generate what was asked for
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def planInputPartitions(): Array[InputPartition] = {
      val per = math.max(1L, (rows + partitions - 1) / partitions)
      (0L until rows by per)
        .map(start => PointsPartition(start, math.min(start + per, rows)))
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
