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

  // --- real javax.imageio decode path ---

  /** Encode a w x h image whose pixel (x, y) is the RGB given by `px`. */
  private def encodeImage(fmt: String, w: Int, h: Int,
      px: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, px(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
    bos.toByteArray
  }

  test("decodeAndFeaturize really decodes PNG and BMP via javax.imageio") {
    // left half black (lum 0 -> bin 0), right half white (lum 255 -> bin 7)
    val halfAndHalf = (x: Int, _: Int) => if (x < 4) 0x000000 else 0xffffff
    val png = encodeImage("png", 8, 4, halfAndHalf)
    val bmp = encodeImage("bmp", 8, 4, halfAndHalf)
    assert(new String(png.slice(1, 4), "US-ASCII") == "PNG") // really encoded
    val df = spark.createDataFrame(
      java.util.List.of(
        org.apache.spark.sql.Row(0L, "image", png,
          org.apache.spark.sql.Row(8, 4, 1)),
        org.apache.spark.sql.Row(1L, "image", bmp,
          org.apache.spark.sql.Row(8, 4, 1))),
      Multimodal.mediaSchema)
    val rows = Multimodal.decodeAndFeaturize(df).orderBy("media_id").collect()
    rows.foreach { r =>
      val hist = r.getSeq[Double](2)
      assert(hist == Seq(0.5, 0, 0, 0, 0, 0, 0, 0.5),
        s"expected pixel histogram, got $hist")
    }
    // n_bytes is the ENCODED size (payload), not the pixel count
    assert(rows(0).getLong(1) == png.length.toLong)
  }

  test("decodeAndFeaturize: mid-gray lands in the right luminance bin") {
    // 0x808080 -> lum = 128*299/1000*... = (128*299+128*587+128*114)/1000
    //           = 128 -> bin 128*8/256 = 4
    val png = encodeImage("png", 3, 3, (_, _) => 0x808080)
    val df = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(0L, "image", png,
        org.apache.spark.sql.Row(3, 3, 1))),
      Multimodal.mediaSchema)
    val hist = Multimodal.decodeAndFeaturize(df).collect().head.getSeq[Double](2)
    assert(hist(4) == 1.0 && hist.sum == 1.0)
  }

  test("non-image payloads still take the deterministic stub path") {
    // text bytes carry no image magic -> byte histogram (the q70 oracle
    // recomputes exactly this from the same characters)
    val r = Multimodal.decodeAndFeaturize(media).orderBy("media_id")
      .collect().head
    // "aaaabbbb": all bytes 0x61/0x62 -> bin 97*8/256 = 3
    assert(r.getSeq[Double](2) == Seq(0, 0, 0, 1.0, 0, 0, 0, 0))
  }

  test("truncated image payload degrades to the stub, not a failure") {
    val png = encodeImage("png", 8, 4, (_, _) => 0xffffff).take(12)
    val df = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(0L, "image", png,
        org.apache.spark.sql.Row(8, 4, 1))),
      Multimodal.mediaSchema)
    val r = Multimodal.decodeAndFeaturize(df).collect().head
    assert(r.getLong(1) == 12L)
    assert(math.abs(r.getSeq[Double](2).sum - 1.0) < 1e-9) // byte histogram
  }

  // --- real javax.sound.sampled WAV/PCM decode path ---

  /** Encode mono [-1,1] samples as a 16-bit signed little-endian PCM WAV. */
  private def encodeWav(samples: Array[Double], rate: Float): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val raw = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      val v = math.round(s * 32767.0).toInt.max(-32768).min(32767)
      raw(2 * i) = (v & 0xff).toByte
      raw(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("decodePcm round-trips a generated WAV (rate + sample values)") {
    val samples = Array.tabulate(64)(i => if (i % 2 == 0) 0.5 else -0.5)
    val wav = encodeWav(samples, 8000f)
    assert(Multimodal.looksLikeWav(wav)) // really a RIFF/WAVE container
    val (decoded, rate) = Multimodal.decodePcm(wav)
    assert(rate == 8000f)
    assert(decoded.length == 64)
    decoded.zip(samples).foreach { case (d, s) =>
      assert(math.abs(d - s) < 1e-3, s"decoded $d vs encoded $s")
    }
  }

  test("audioFeatures: RMS and zero-crossing rate of a known signal") {
    // square wave alternating +0.5/-0.5: rms = 0.5, every adjacent pair crosses
    val sq = encodeWav(Array.tabulate(100)(i => if (i % 2 == 0) 0.5 else -0.5), 16000f)
    // constant positive: zero crossings = 0
    val flat = encodeWav(Array.fill(100)(0.25), 16000f)
    val df = spark.createDataFrame(
      java.util.List.of(
        org.apache.spark.sql.Row(0L, "audio", sq, org.apache.spark.sql.Row(0, 0, 1)),
        org.apache.spark.sql.Row(1L, "audio", flat, org.apache.spark.sql.Row(0, 0, 1)),
        org.apache.spark.sql.Row(2L, "video", "notawav".getBytes, org.apache.spark.sql.Row(0, 0, 1))),
      Multimodal.mediaSchema)
    val rows = Multimodal.audioFeatures(df).orderBy("media_id").collect()
    assert(rows(0).getDouble(1) == 16000.0 && rows(0).getLong(2) == 100L)
    assert(math.abs(rows(0).getDouble(3) - 0.5) < 1e-3)       // rms
    assert(math.abs(rows(0).getDouble(4) - 1.0) < 1e-9)       // zcr: all 99 pairs cross
    assert(math.abs(rows(1).getDouble(3) - 0.25) < 1e-3)
    assert(rows(1).getDouble(4) == 0.0)
    assert(rows(2).isNullAt(1) && rows(2).isNullAt(3))        // non-WAV -> nulls
  }

  test("decodeAndFeaturize takes the real amplitude-histogram path for WAV") {
    // silence: amplitude 0 -> (0+1)/2*8 = bin 4, all mass there
    val silent = encodeWav(Array.fill(32)(0.0), 8000f)
    val df = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(0L, "audio", silent,
        org.apache.spark.sql.Row(0, 0, 1))),
      Multimodal.mediaSchema)
    val hist = Multimodal.decodeAndFeaturize(df).collect().head.getSeq[Double](2)
    assert(hist(4) == 1.0 && hist.sum == 1.0,
      s"expected all mass in bin 4 (silence), got $hist")
  }

  test("truncated WAV payload degrades to the stub, not a failure") {
    val wav = encodeWav(Array.fill(32)(0.0), 8000f).take(16) // RIFF+WAVE intact
    val df = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(0L, "audio", wav,
        org.apache.spark.sql.Row(0, 0, 1))),
      Multimodal.mediaSchema)
    val r = Multimodal.decodeAndFeaturize(df).collect().head
    assert(math.abs(r.getSeq[Double](2).sum - 1.0) < 1e-9) // byte histogram
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

  /** Encode an animated GIF of solid-gray frames with the JDK's own GIF
    * sequence writer — a REAL multi-frame container payload. */
  private def encodeAnimatedGif(grays: Seq[Int], w: Int = 8, h: Int = 8)
      : Array[Byte] = {
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("gif").next()
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      grays.foreach { g =>
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val gr = img.createGraphics()
        gr.setColor(new java.awt.Color(g, g, g))
        gr.fillRect(0, 0, w, h)
        gr.dispose()
        writer.writeToSequence(
          new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    baos.toByteArray
  }

  test("videoFrameFeatures REALLY decodes an animated GIF's frames") {
    val bins = 8
    val grays = Seq(16, 80, 144, 208, 240) // bins 0, 2, 4, 6, 7
    val gif = encodeAnimatedGif(grays)
    assert(Multimodal.looksLikeGif(gif))
    val df = spark.createDataFrame(
      java.util.List.of(
        org.apache.spark.sql.Row(7L, "video", gif,
          org.apache.spark.sql.Row(8, 8, grays.length)),
        org.apache.spark.sql.Row(8L, "video", "notagif".getBytes, // degrade
          org.apache.spark.sql.Row(1, 1, 1))),
      Multimodal.mediaSchema)
    val out = Multimodal.videoFrameFeatures(df, stride = 2, bins = bins)
      .orderBy("media_id").collect()
    val r = out(0)
    assert(r.getLong(1) == grays.length)
    val frames = r.getSeq[org.apache.spark.sql.Row](2)
    assert(frames.map(_.getInt(0)) == Seq(0, 2, 4)) // stride 2
    frames.foreach { f =>
      val idx = f.getInt(0)
      val hist = f.getSeq[Double](1)
      val expectBin = grays(idx) * bins / 256
      assert(math.abs(hist(expectBin) - 1.0) < 1e-9,
        s"frame $idx: mass not in bin $expectBin: $hist")
    }
    // non-GIF payload degrades to nulls, row survives
    assert(out(1).isNullAt(1) && out(1).isNullAt(2))
  }

  private def le32(n: Int): Array[Byte] =
    Array[Byte]((n & 0xff).toByte, ((n >> 8) & 0xff).toByte,
      ((n >> 16) & 0xff).toByte, ((n >> 24) & 0xff).toByte)

  private def jpegBytes(gray: Int, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val gr = img.createGraphics()
    gr.setColor(new java.awt.Color(gray, gray, gray))
    gr.fillRect(0, 0, w, h)
    gr.dispose()
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", baos)
    baos.toByteArray
  }

  /** Encode an MJPEG-in-AVI of solid-gray frames: a real RIFF container
    * (LIST hdrl with an avih chunk, LIST movi with one complete JPEG per
    * `00dc` chunk, even-length padding) — the exact layout
    * `aviMjpegFrames` walks. */
  private def encodeMjpegAvi(frames: Seq[Array[Byte]]): Array[Byte] = {
    def chunk(fourcc: String, data: Array[Byte]): Array[Byte] = {
      val pad = if (data.length % 2 == 1) Array[Byte](0) else Array.empty[Byte]
      fourcc.getBytes("US-ASCII") ++ le32(data.length) ++ data ++ pad
    }
    def list(listType: String, payload: Array[Byte]): Array[Byte] =
      chunk("LIST", listType.getBytes("US-ASCII") ++ payload)
    val hdrl = list("hdrl", chunk("avih", new Array[Byte](56)))
    val movi = list("movi", frames.toArray.flatMap(f => chunk("00dc", f)))
    val form = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    "RIFF".getBytes("US-ASCII") ++ le32(form.length) ++ form
  }

  test("aviMjpegFrames walks the RIFF tree and returns the exact JPEGs") {
    val jpegs = Seq(16, 80, 240).map(jpegBytes(_, 8, 8))
    val avi = encodeMjpegAvi(jpegs)
    assert(Multimodal.looksLikeAvi(avi) && !Multimodal.looksLikeWav(avi))
    val out = Multimodal.aviMjpegFrames(avi)
    assert(out.length == 3)
    out.zip(jpegs).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b)) // byte-exact extraction
    }
    // truncation mid-movi degrades to fewer frames, never an exception
    val cut = java.util.Arrays.copyOfRange(avi, 0, avi.length - jpegs.last.length - 20)
    assert(Multimodal.aviMjpegFrames(cut).length < 3)
  }

  test("videoFrameFeatures REALLY decodes MJPEG-in-AVI frames") {
    val bins = 8
    val grays = Seq(16, 80, 144, 208, 240) // mid-bin grays: JPEG DC error safe
    val avi = encodeMjpegAvi(grays.map(jpegBytes(_, 8, 8)))
    val df = spark.createDataFrame(
      java.util.List.of(
        org.apache.spark.sql.Row(7L, "video", avi,
          org.apache.spark.sql.Row(8, 8, grays.length)),
        org.apache.spark.sql.Row(8L, "video", // sniffs AVI, no JPEG frames
          encodeMjpegAvi(Seq("nope".getBytes)),
          org.apache.spark.sql.Row(1, 1, 1))),
      Multimodal.mediaSchema)
    val out = Multimodal.videoFrameFeatures(df, stride = 2, bins = bins)
      .orderBy("media_id").collect()
    val r = out(0)
    assert(r.getLong(1) == grays.length)
    val frames = r.getSeq[org.apache.spark.sql.Row](2)
    assert(frames.map(_.getInt(0)) == Seq(0, 2, 4)) // stride 2
    frames.foreach { f =>
      val idx = f.getInt(0)
      val hist = f.getSeq[Double](1)
      val expectBin = grays(idx) * bins / 256
      assert(hist(expectBin) > 0.99,
        s"frame $idx: mass not in bin $expectBin: $hist")
    }
    // AVI with no decodable video chunks degrades to nulls, row survives
    assert(out(1).isNullAt(1) && out(1).isNullAt(2))
  }
}
