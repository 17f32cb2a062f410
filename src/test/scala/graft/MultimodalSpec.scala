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
