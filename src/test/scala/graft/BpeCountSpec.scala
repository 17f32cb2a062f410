package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftColumnBridge

/** Differential laws for the q148 BpeCount kernel: the single-pass
  * symbol walk must be byte-identical to the replace-chain form it
  * replaces (spacing regex + K sequential replace() + split), which is
  * also what the DuckDB oracle replays. Adversarial shapes: overlap
  * runs ("l l l" — non-overlapping left-to-right), merged symbols
  * re-merging in LATER passes, empty words (split-of-empty counts 1),
  * unicode incl. a supplementary-plane code point, and empty arrays.
  */
class BpeCountSpec extends SparkSpec {
  import spark.implicits._

  private def chainCount(words: Seq[String],
      merges: Seq[(String, String)]): Long =
    words.map { w =>
      // exact concat(" ", regexp_replace(w, "(.)", "$1 ")) shape:
      // " c1 c2 ... cn " with code-point symbols
      var s = " " + w.codePoints().toArray
        .map(cp => new String(Character.toChars(cp)) + " ").mkString
      merges.foreach { case (l, r) =>
        s = s.replace(" " + l + " " + r + " ", " " + l + r + " ")
      }
      val t = s.trim
      if (t.isEmpty) 1L else t.split(" ", -1).length.toLong
    }.sum

  private def kernelDf(rows: Seq[Seq[String]],
      merges: Seq[(String, String)]) =
    rows.zipWithIndex.map { case (ws, i) => (i.toLong, ws) }
      .toDF("id", "ws")
      .select(col("id"), GraftColumnBridge.column(graft.plans.BpeCount(
        GraftColumnBridge.expression(col("ws")),
        merges.map(_._1), merges.map(_._2))).as("n"))
      .orderBy("id")

  test("kernel == replace chain on adversarial words (overlap runs, " +
    "chained merges, empty word, unicode incl. supplementary plane)") {
    val merges = Seq(("l", "l"), ("h", "e"), ("he", "l"), ("hel", "lo"),
      ("Σ", "π"), ("漢", "字"))
    val rows = Seq(
      Seq("hello", "hellhole"),
      Seq("lllll", "llll", "lll", "ll", "l"),
      Seq(""),                      // empty word counts 1
      Seq("Σπ漢字Σπ", "😀x😀"), // emoji = 1 symbol
      Seq("hehe", "hel", "helllo"),
      Seq())                        // empty array sums 0
    val got = kernelDf(rows, merges).collect().map(_.getLong(1))
    val want = rows.map(ws => chainCount(ws, merges))
    assert(got.toSeq == want, s"got=${got.toSeq} want=$want")
    // and the replace-chain reference itself behaves as documented on
    // overlap runs: the scanner consumes the boundary space, so the
    // symbol after a merge cannot open a match in the same pass —
    // " l l l " -> " ll l " (2), " l l l l " -> " ll l l " (3, NOT
    // " ll ll "), " l l l l l " -> " ll l ll " (3)
    assert(chainCount(Seq("lll"), Seq(("l", "l"))) == 2L)
    assert(chainCount(Seq("llll"), Seq(("l", "l"))) == 3L)
    assert(chainCount(Seq("lllll"), Seq(("l", "l"))) == 3L)
  }

  test("engine-level differential: kernel q148 output == replace-chain " +
    "q148 output on the sf0.001 corpus (same merges, same docs)") {
    val sf = "/root/testdata/sf0.001"
    val kernel = SparkEntry.queries("q148_bpe_encode")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // replicate the retired r13 replace-chain form inline as the
    // independent reference for the diff
    val merges = graft.queries.TextQueries.bpeMerges(spark, sf, 6)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val mp = merges.map(m => (m._2, m._3))
    val want = docs.map { case (id, text) =>
      val ws = text.split(" ", -1).toSeq
      (id, chainCount(ws, mp), ws.length.toLong)
    }.sortBy(_._1)
    assert(kernel.toSeq == want.toSeq)
  }
}
