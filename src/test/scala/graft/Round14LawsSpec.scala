package graft

import graft.queries.DedupQueries

/** Laws for the round-14 OPTIMIZATION rewrites: each changed operator
  * must be provably output-identical to the shape it replaced, on
  * frames crafted to hit the cases the gate SFs cannot force (the >62
  * source fallback dispatch, canonical ties, bit-boundary sources).
  */
class Round14LawsSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------------- q240

  /** Overlapping vocabularies across several sources, with duplicate
    * shingles inside a source (exercises the map-side bit_or collapse)
    * and one source disjoint from the rest. */
  private def kmvFrame(nSources: Int) = {
    val rows = (0 until nSources).map { s =>
      val shared = (1 to 20).map(i => s"w${i % (4 + s % 5)}")
      val own = (1 to 12).map(i => s"s${s}_$i")
      (f"src$s%03d", (shared ++ own ++ shared).mkString(" "))
    }
    rows.toDF("source", "text")
  }

  test("differential: q240 source-bitmask path is row-identical to the " +
    "r13 set path (same frame, both dispatches)") {
    val d = kmvFrame(8)
    val mask = DedupQueries.kmvOverlapCore(d).collect().toSeq
    val sets = DedupQueries.kmvOverlapCore(d, maskMaxSources = 0)
      .collect().toSeq
    assert(mask.nonEmpty && mask == sets,
      s"mask=${mask.take(3)} sets=${sets.take(3)}")
  }

  test("differential: q240 >62 sources dispatches to the set fallback " +
    "and matches a forced 63-bit mask run (bit 62 boundary exact)") {
    val d = kmvFrame(63)
    val auto = DedupQueries.kmvOverlapCore(d).collect().toSeq // set path
    val mask = DedupQueries.kmvOverlapCore(d, maskMaxSources = 63)
      .collect().toSeq // bits 0..62, top bit still positive
    assert(auto.length == 63 * 62 / 2 && auto == mask)
  }

  // ------------------------------------------------- q111/q223/canonMap

  test("law: canonPick tie — equal best n_chars picks the MIN doc id " +
    "(q223 savings core, oracle's min(id) WHERE n_chars = max)") {
    val grp = Seq((10L, 1L), (7L, 1L), (9L, 1L), (3L, 2L))
      .toDF("doc_id", "group_id")
    val qual = Seq((10L, "a", 50L), (7L, "a", 50L), (9L, "a", 20L),
      (3L, "b", 10L), (99L, "a", 5L))
      .toDF("doc_id", "source", "n_chars")
    val got = DedupQueries.dedupSavingsCore(grp, qual)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    // group 1: best len 50 held by docs 7 and 10 -> canonical 7; docs
    // 10 and 9 drop (50 + 20 chars saved of source a's 125 total).
    // group 2: singleton group -> nothing dropped.
    assert(got == Seq(("a", 4L, 2L, 125L, 70L), ("b", 1L, 0L, 10L, 0L)),
      s"got $got")
  }

  test("law: canonPick prefers larger n_chars over smaller id " +
    "(argmax on length, not min id globally)") {
    val grp = Seq((1L, 1L), (2L, 1L)).toDF("doc_id", "group_id")
    val qual = Seq((1L, "a", 10L), (2L, "a", 30L))
      .toDF("doc_id", "source", "n_chars")
    val got = DedupQueries.dedupSavingsCore(grp, qual).collect()
    // doc 2 (longer) is canonical although doc 1 has the smaller id.
    assert(got.length == 1 && got.head.getLong(2) == 1L &&
      got.head.getLong(4) == 10L, s"got ${got.toSeq}")
  }
}
