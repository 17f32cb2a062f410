package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata. The *decode* step is a clearly-marked deterministic
  * STUB (no image/audio codecs exist in this container); everything
  * Spark-side — schema, batching, partition-parallel execution via
  * mapPartitions (the Scala analogue of mapInPandas), frame sampling — is
  * real and tested.
  *
  * At 100 TB these run as per-partition streaming iterators: no
  * collect-to-driver, no shuffle; binary payloads flow through Tungsten rows
  * batch by batch.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("n_frames", IntegerType, nullable = false))),
      nullable = false)))

  /** Synthesize a media table from any keyed string column: payload =
    * UTF-8 bytes (a deterministic fake "encoded image"), metadata derived
    * from the key. Stands in for `spark.read.format("binaryFile")`. */
  def fakeMediaTable(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      (when(col(idCol) % 3 === 0, "image")
        .when(col(idCol) % 3 === 1, "audio")
        .otherwise("video")).as("kind"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        (col(idCol) % 64 + 1).cast("int").as("width"),
        (col(idCol) % 48 + 1).cast("int").as("height"),
        (col(idCol) % 16 + 1).cast("int").as("n_frames")).as("meta"))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("features", ArrayType(DoubleType, containsNull = false),
      nullable = true)))

  /** Per-partition "decode + featurize" over binary payloads — the Scala
    * analogue of a Pandas UDF over mapInPandas: one iterator per partition,
    * constant memory, no driver round-trip.
    *
    * ===== STUB =====
    * A real implementation would decode `payload` with an image/audio codec
    * and emit model features. Codecs are unavailable in this container, so
    * the "decode" is a deterministic fake: an 8-bin byte histogram,
    * normalized. The plumbing (schema, batching, partitioning) is real.
    */
  def decodeAndFeaturize(media: DataFrame, bins: Int = 8): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(featureSchema)
    media.select("media_id", "payload").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        if (payload == null) Row(id, 0L, null)
        else {
          val hist = new Array[Double](bins)
          payload.foreach(b => hist((b & 0xff) * bins / 256) += 1.0)
          val n = payload.length.toDouble.max(1.0)
          Row(id, payload.length.toLong, hist.map(_ / n).toSeq)
        }
      }
    }(enc)
  }

  val resizedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("resized", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("n_frames", IntegerType, nullable = false))),
      nullable = false)))

  /** Resize: nearest-neighbor resample of the payload interpreted as a
    * row-major `meta.width x meta.height` byte grid (what the stub decode
    * produces) to `outW x outH`. The sampling arithmetic is the real
    * nearest-neighbor kernel — only the "pixels are raw payload bytes"
    * premise is the stub (a codec build would decode first). Runs
    * per-partition, constant memory, output metadata carries the new
    * dimensions. */
  def resize(media: DataFrame, outW: Int, outH: Int): DataFrame = {
    require(outW > 0 && outH > 0, "resize target must be positive")
    val enc = org.apache.spark.sql.Encoders.row(resizedSchema)
    media.select(col("media_id"), col("kind"), col("payload"),
      col("meta.width"), col("meta.height"), col("meta.n_frames"))
      .mapPartitions { rows =>
        rows.map { r =>
          val (id, kind) = (r.getLong(0), r.getString(1))
          val payload = if (r.isNullAt(2)) null else r.getAs[Array[Byte]](2)
          val (w, h, nf) = (r.getInt(3), r.getInt(4), r.getInt(5))
          val outMeta = Row(outW, outH, nf)
          if (payload == null || w <= 0 || h <= 0) Row(id, kind, null, outMeta)
          else {
            val out = Array.tabulate[Byte](outW * outH) { p =>
              val (x2, y2) = (p % outW, p / outW)
              val idx = (y2 * h / outH) * w + (x2 * w / outW)
              if (idx < payload.length) payload(idx) else 0
            }
            Row(id, kind, out, outMeta)
          }
        }
      }(enc)
  }

  /** Frame sampling: split the payload into `meta.n_frames` equal chunks and
    * keep every `stride`-th — pure Column expressions (codegen'd), the
    * binary twin of ArrayOps.chunk. */
  def sampleFrames(media: DataFrame, stride: Int = 2): DataFrame = {
    val n = col("meta.n_frames")
    val flen = (length(col("payload")) / n).cast("int")
    val frames = transform(sequence(lit(0), n - 1),
      i => col("payload").substr(i * flen + 1, flen))
    media.select(col("media_id"), col("kind"),
      filter(frames, (_, i) => i % stride === 0).as("sampled_frames"))
  }
}
