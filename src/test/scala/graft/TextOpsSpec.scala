package graft

import org.apache.spark.sql.functions._
import graft.functions.TextOps
import java.security.MessageDigest

/** Differential tests for the pipeline text ops: goldens computed with an
  * independent JVM md5 implementation (same idiom as the reference testing
  * lazy vs eager awkward). */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("shingles: 3-grams in order; short docs yield empty") {
    val df = Seq((0L, "a b c d e"), (1L, "x y")).toDF("row_id", "t")
    val got = eval1(df, TextOps.shingles(TextOps.tokens(col("t")), 3)).map(seqOf)
    assert(got(0) == Seq("a b c", "b c d", "c d e"))
    assert(got(1) == Seq())
  }

  test("minhash matches independent md5 min") {
    val text = "the quick brown fox jumps"
    val df = Seq((0L, text)).toDF("row_id", "t")
    val shingles = Seq("the quick brown", "quick brown fox", "brown fox jumps")
    val expected = shingles.map(s => md5hex("s0" + s)).min
    val got = eval1(df,
      TextOps.minhash(TextOps.shingles(TextOps.tokens(col("t")), 3), "s0"))
    assert(got == Seq(expected))
  }

  test("simhash16 matches independent bit-vote computation") {
    val words = Seq("spark", "join", "merge", "scan", "filter")
    val df = Seq((0L, words.mkString(" "))).toDF("row_id", "t")
    def bit(w: String, b: Int): Int = {
      val digit = Integer.parseInt(md5hex(w).substring(b / 4, b / 4 + 1), 16)
      (digit >> (b % 4)) & 1
    }
    val expected = (0 until 16).map { b =>
      val score = words.map(w => bit(w, b) * 2 - 1).sum
      if (score > 0) 1L << b else 0L
    }.sum
    val got = eval1(df, TextOps.simhash16(TextOps.tokens(col("t"))))
    assert(got == Seq(expected))
  }

  test("dot / norm / cosine on known vectors") {
    val df = Seq((0L, Seq(3.0f, 4.0f), Seq(4.0f, 3.0f))).toDF("row_id", "a", "b")
    assert(eval1(df, TextOps.dot(col("a"), col("b"))) == Seq(24.0))
    assert(eval1(df, TextOps.norm(col("a"))) == Seq(5.0))
    val cos = eval1(df, TextOps.cosine(col("a"), col("b"))).head
      .asInstanceOf[Double]
    assert(math.abs(cos - 24.0 / 25.0) < 1e-12)
  }

  test("dot_product kernel: null-skip, mixed float/double, length mismatch, SQL form") {
    // null elements are skipped (DuckDB list_sum semantics), not poisoning
    val withNull = Seq((0L, Seq[java.lang.Float](1.0f, null, 2.0f),
      Seq[java.lang.Float](10.0f, 5.0f, 100.0f))).toDF("row_id", "a", "b")
    assert(eval1(withNull, TextOps.dot(col("a"), col("b"))) == Seq(210.0))
    // mixed element types: float vector x double literal plane
    val f = Seq((0L, Seq(2.0f, 3.0f))).toDF("row_id", "a")
    assert(eval1(f, TextOps.dot(col("a"),
      array(lit(1.5), lit(2.0)))) == Seq(9.0))
    // shorter side bounds the walk
    assert(eval1(f, TextOps.dot(col("a"), array(lit(10.0)))) == Seq(20.0))
    // registered SQL function form (GraftExtensions)
    graft.plans.GraftExtensions.install(spark)
    f.createOrReplaceTempView("dotv")
    assert(spark.sql(
      "SELECT dot_product(a, a) AS d FROM dotv").head.getDouble(0) == 13.0)
    // equivalence with the composed HOF form on real-ish vectors
    val vs = Seq((0L, Seq.tabulate(64)(i => (i * 0.37 - 9).toFloat),
      Seq.tabulate(64)(i => (3.1 - i * 0.21).toFloat))).toDF("row_id", "a", "b")
    val hof = eval1(vs, aggregate(zip_with(col("a"), col("b"),
      (x, y) => x.cast("double") * y.cast("double")), lit(0.0),
      (acc, x) => acc + x)).head.asInstanceOf[Double]
    val native = eval1(vs, TextOps.dot(col("a"), col("b"))).head
      .asInstanceOf[Double]
    assert(native == hof) // bit-identical: same casts, same order, no FMA
  }

  test("quantizeInt8: roundtrip bound, constant vector yields null qs") {
    val df = Seq((0L, Seq(-1.0f, 0.0f, 1.0f)), (1L, Seq(5.0f, 5.0f)))
      .toDF("row_id", "v")
    val rows = df.orderBy("row_id")
      .select(TextOps.quantizeInt8(col("v")).as("q")).collect()
    val q0 = rows(0).getStruct(0)
    val (mn, sc) = (q0.getDouble(0), q0.getDouble(1))
    val qs = q0.getSeq[Long](2)
    assert(mn == -1.0 && qs == Seq(0L, 128L, 255L))
    // dequantized error bounded by half a step
    Seq(-1.0, 0.0, 1.0).zip(qs).foreach { case (x, q) =>
      assert(math.abs(mn + q * sc - x) <= sc / 2 + 1e-12)
    }
    assert(rows(1).getStruct(0).isNullAt(2)) // constant vector: sc = 0
  }

  test("signBucket packs sign bits") {
    val df = Seq((0L, Seq(1.0f, -1.0f, 2.0f, -2.0f))).toDF("row_id", "v")
    // bits: e1>0 -> 1, e2<0 -> 0, e3>0 -> 4, e4<0 -> 0 => 5
    assert(eval1(df, TextOps.signBucket(col("v"), 4)) == Seq(5L))
  }

  test("rpBucket: scale-invariant signs, nearby vectors collide, far don't") {
    val base = Seq.tabulate(64)(i => math.sin(i * 1.7).toFloat)
    val scaled = base.map(_ * 7.5f)          // same direction
    val nudged = base.updated(0, base(0) + 1e-4f) // tiny angle
    val flipped = base.map(-_)               // opposite direction
    val df = Seq((0L, base), (1L, scaled), (2L, nudged), (3L, flipped))
      .toDF("row_id", "v")
    val got = eval1(df, TextOps.rpBucket(col("v"), 8, 64))
      .map(_.asInstanceOf[Long])
    assert(got(0) == got(1), "positive scaling must not change any sign bit")
    assert(got(0) == got(2), "1e-4 nudge should keep all 8 sign bits")
    assert(got(0) == 255L - got(3), "negation flips every sign bit")
    // planes are data-independent constants: same vector, same bucket, any
    // partitioning (rpCoef is pure integer arithmetic)
    assert(TextOps.rpCoef(0, 0) == 12345L - 50001L)
  }

  test("jaccard on distinct sets") {
    val df = Seq((0L, Seq("a", "b", "c"), Seq("b", "c", "d")))
      .toDF("row_id", "x", "y")
    val got = eval1(df, TextOps.jaccard(col("x"), col("y"))).head
      .asInstanceOf[Double]
    assert(math.abs(got - 0.5) < 1e-12)
  }

  test("compressionRatio: repetitive text compresses below natural prose") {
    val rep = "spam spam spam " * 50
    val prose = "the quick brown fox jumps over a lazy dog while seventeen " +
      "distinct melodies echo through crowded autumn markets near the harbor"
    val df = Seq((0L, rep), (1L, prose), (2L, "")).toDF("row_id", "t")
    val got = eval1(df, TextOps.compressionRatio(col("t")))
      .map(_.asInstanceOf[Double])
    assert(got(0) < 0.1, s"repetitive ratio ${got(0)}")
    assert(got(1) > 0.5, s"prose ratio ${got(1)}")
    assert(got(2) == 1.0)
    // registered SQL form agrees with the Column form
    val viaSql = eval1(df, call_function("deflate_ratio", col("t")))
      .map(_.asInstanceOf[Double])
    assert(viaSql == got)
  }

  test("bpeishCount splits letters/digits/other") {
    val df = Seq((0L, "ab12 cd-ef")).toDF("row_id", "t")
    // ab, 12, cd, -, ef
    assert(eval1(df, TextOps.bpeishCount(col("t"))) == Seq(5L))
  }

  test("quantize_stats kernel EQUALS the composed quantizeInt8 form") {
    import graft.functions.ArrayOps.bindOnce
    graft.plans.GraftExtensions.install(spark)
    // real fixture vectors + adversarial shapes (ties at min/max, tiny sc)
    val fixture = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id").as("row_id"), col("embedding").as("a"))
    val edge = Seq(
      (1000L, Seq(1.0f, 1.0f, 1.0f)),            // sc = 0: filtered by both
      (1001L, Seq(0.0f, 1e-7f, 2e-7f)),          // tiny scale
      (1002L, Seq(-5.5f, 2.25f, 9.75f, -5.5f))) // ties at min
      .toDF("row_id", "a")
    for (df <- Seq(fixture, edge)) {
      val hof = bindOnce(graft.functions.TextOps.quantizeInt8(col("a"))) { q =>
        val (mn, sc) = (q.getField("mn"), q.getField("sc"))
        bindOnce(q.getField("qs")) { qs =>
          struct(sc.as("sc"),
            aggregate(qs, lit(0L), (acc, x) => acc + x).as("q_sum"),
            array_max(zip_with(qs, col("a"), (x, v) =>
              abs(mn + x * sc - v.cast("double")))).as("max_err"))
        }
      }
      val both = df.select(col("row_id"), hof.as("h"),
          call_function("quantize_stats", col("a")).as("st"))
        .filter(col("h.sc") > 0)
        .select(col("row_id"),
          col("h.sc"), col("st").getItem(0),
          col("h.q_sum").cast("double"), col("st").getItem(1),
          col("h.max_err"), col("st").getItem(2))
        .collect()
      assert(both.nonEmpty)
      both.foreach { r =>
        assert(r.getDouble(1) == r.getDouble(2), s"sc mismatch: $r")
        assert(r.getDouble(3) == r.getDouble(4), s"q_sum mismatch: $r")
        assert(r.getDouble(5) == r.getDouble(6), s"max_err mismatch: $r")
      }
    }
  }
}
