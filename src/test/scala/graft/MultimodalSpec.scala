package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** Multimodal plumbing: schema, per-partition decode (stub), frame
  * sampling. The decode itself is a deterministic fake — the tests pin the
  * Spark-side contract (schema, batching, partition parallelism). */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Multimodal.fakeMediaTable(
    Seq((0L, "aaaabbbb"), (1L, "spark engine"), (2L, "cccc"))
      .toDF("id", "text").repartition(2),
    "id", "text")

  test("fakeMediaTable produces the media schema") {
    assert(media.schema("payload").dataType ==
      org.apache.spark.sql.types.BinaryType)
    assert(media.select("meta.width", "meta.height", "meta.n_frames")
      .count() == 3)
    val kinds = media.orderBy("media_id").select("kind").collect().map(_.getString(0))
    assert(kinds.toSeq == Seq("image", "audio", "video"))
  }

  test("decodeAndFeaturize: per-partition, histogram sums to 1") {
    val feats = Multimodal.decodeAndFeaturize(media)
    assert(feats.schema == Multimodal.featureSchema)
    val rows = feats.orderBy("media_id").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getLong(1) > 0)
      val hist = r.getSeq[Double](2)
      assert(hist.length == 8)
      assert(math.abs(hist.sum - 1.0) < 1e-9)
    }
  }

  test("resize: nearest-neighbor over the byte grid, new meta dims") {
    // 4x2 "image" of bytes 0..7, downscaled to 2x1: picks (0,0) and (2,0)
    val one = spark.createDataFrame(
      java.util.List.of(
        org.apache.spark.sql.Row(7L, "image",
          Array[Byte](0, 1, 2, 3, 4, 5, 6, 7),
          org.apache.spark.sql.Row(4, 2, 1))),
      Multimodal.mediaSchema)
    val out = Multimodal.resize(one, outW = 2, outH = 1).collect().head
    assert(out.getAs[Array[Byte]](2).toSeq == Seq[Byte](0, 2))
    val m = out.getStruct(3)
    assert(m.getInt(0) == 2 && m.getInt(1) == 1 && m.getInt(2) == 1)
    // identity resize returns the grid prefix unchanged
    val same = Multimodal.resize(one, outW = 4, outH = 2).collect().head
    assert(same.getAs[Array[Byte]](2).toSeq == (0 to 7).map(_.toByte))
  }

  test("sampleFrames keeps every 2nd frame, chunks cover payload length") {
    val sampled = Multimodal.sampleFrames(media, stride = 2)
    val r = sampled.orderBy("media_id").collect()
    assert(r.length == 3)
    // media_id=0: n_frames=1 -> 1 frame, stride keeps frame 0
    val f0 = r(0).getSeq[Array[Byte]](2)
    assert(f0.length == 1 && new String(f0.head, "UTF-8") == "aaaabbbb")
    // media_id=1: n_frames=2, frame length 6 -> keeps frame 0 only
    val f1 = r(1).getSeq[Array[Byte]](2)
    assert(f1.length == 1 && new String(f1.head, "UTF-8") == "spark ")
  }
}
