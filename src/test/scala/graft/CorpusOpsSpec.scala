package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the corpus-construction operators added with
  * q142-q144, beyond the DuckDB oracle gate: a from-scratch differential
  * replica of the CDC boundary kernel and of the BPE merge loop (computed
  * via a DIFFERENT representation than the engine's), the CDC re-sync
  * property that motivates content-defined over fixed-offset chunking,
  * and the PMI fixed-point definition.
  */
class CorpusOpsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.all.find(_.name == name).get.fn(spark, sfDir)

  /** From-scratch replica of the cdc_cuts definition (window sum over code
    * points, Knuth-mixed mod-64 gate). */
  private def cutsRef(text: String): Seq[Long] = {
    val cps = text.codePoints().toArray
    (16 until cps.length).flatMap { pos => // pos is 1-based cut candidate < n
      val h = cps.slice(pos - 16, pos).map(_.toLong).sum
      if ((h * 2654435761L) % 64 == 0) Some(pos.toLong) else None
    }
  }

  private def chunksOf(text: String): Seq[String] = {
    val bounds = 0L +: cutsRef(text) :+ text.length.toLong
    bounds.sliding(2).map { case Seq(a, b) =>
      text.substring(a.toInt, b.toInt)
    }.toSeq
  }

  test("cdc_cuts matches the from-scratch window-sum replica on real docs") {
    graft.plans.GraftExtensions.install(spark)
    val rows = Tables.documents(spark, sfDir)
      .select(col("text"), call_function("cdc_cuts", col("text")).as("cuts"))
      .collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val expected = cutsRef(r.getString(0))
      assert(r.getSeq[Long](1) == expected)
    }
    // structural: all cuts interior and ordered, first cut >= window
    rows.foreach { r =>
      val cs = r.getSeq[Long](1)
      assert(cs == cs.sorted && cs.distinct == cs)
      cs.foreach(c => assert(c >= 16 && c < r.getString(0).length))
    }
  }

  test("CDC re-synchronizes after an insertion (the anti-q126 property)") {
    // Take real docs, insert one char mid-document: chunk hash multisets
    // must still share all but a bounded number of chunks (a fixed-grid
    // chunker would shift EVERY chunk after the edit). Bound: the edit can
    // perturb boundaries only while the 16-char window still covers the
    // inserted char, i.e. O(1) chunks, but a destroyed/created cut merges
    // or splits neighbors — allow <= 4 differing chunks per side.
    val texts = Tables.documents(spark, sfDir).select("text")
      .limit(50).collect().map(_.getString(0)).filter(_.length > 80)
    assert(texts.nonEmpty)
    texts.foreach { t =>
      val mid = t.length / 2
      val edited = t.substring(0, mid) + "X" + t.substring(mid)
      val a = chunksOf(t).groupBy(identity).view.mapValues(_.size).toMap
      val b = chunksOf(edited).groupBy(identity).view.mapValues(_.size).toMap
      val onlyA = a.map { case (k, v) => v - b.getOrElse(k, 0) }
        .filter(_ > 0).sum
      val onlyB = b.map { case (k, v) => v - a.getOrElse(k, 0) }
        .filter(_ > 0).sum
      assert(onlyA <= 4 && onlyB <= 4,
        s"edit perturbed $onlyA/$onlyB chunks of ${a.values.sum}")
    }
  }

  test("q142 BPE merges match a symbol-list replica (no string replace)") {
    // Different representation on purpose: token sequences as List[String]
    // with an explicit greedy left-to-right merge walk — if the engine's
    // sentinel-string replace() had boundary bugs, this would diverge.
    val words = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count().collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (w, c) => (-c, w) }.take(1024)
    var seqs: Array[(List[String], Long)] =
      words.map { case (w, c) => (w.toCharArray.map(_.toString).toList, c) }
    val expect = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    for (round <- 1 to 6) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      seqs.foreach { case (ss, c) =>
        ss.zip(ss.tail).foreach { p => counts(p) = counts.getOrElse(p, 0L) + c }
      }
      val ((l, r), c) = counts.minBy { case ((x, y), n) => (-n, x, y) }
      expect += ((round.toLong, l, r, c))
      def mergeWalk(ss: List[String]): List[String] = ss match {
        case a :: b :: rest if a == l && b == r => (l + r) :: mergeWalk(rest)
        case a :: rest => a :: mergeWalk(rest)
        case Nil => Nil
      }
      seqs = seqs.map { case (ss, c2) => (mergeWalk(ss), c2) }
    }
    val got = q("q142_bpe_vocab").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == expect.toSeq)
  }

  test("q145 shards partition the corpus; key ranges stay in-nibble") {
    val rows = q("q145_shuffle_shard").collect()
    assert(rows.length == 16)
    val total = Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getLong(1)).sum == total)
    rows.foreach { r =>
      val shard = r.getLong(0)
      val nib = java.lang.Long.parseLong(r.getString(3).substring(0, 1), 16)
      val nibHi = java.lang.Long.parseLong(r.getString(4).substring(0, 1), 16)
      assert(nib == shard && nibHi == shard,
        s"key range escaped shard $shard: ${r.getString(3)}..${r.getString(4)}")
    }
  }

  test("q146 recall/precision are coherent (tp bounded, ppm in range)") {
    val r = q("q146_lsh_recall").collect().head
    val (t, n, tp, rec, prec) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))
    assert(t > 0, "sampled truth set is empty — probe threshold too small")
    assert(tp <= t && tp <= n)
    assert(rec == tp * 1000000L / math.max(t, 1L))
    assert(prec == tp * 1000000L / math.max(n, 1L))
    assert(rec >= 0 && rec <= 1000000L && prec >= 0 && prec <= 1000000L)
  }

  test("q147 report card totals reconcile with the corpus") {
    val rows = q("q147_corpus_report").collect()
    val total = Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getLong(2)).sum == total)
    // dup_docs <= n_docs per cell; quality Q20 in (0, 2^20]
    rows.foreach { r =>
      assert(r.getLong(4) <= r.getLong(2))
      assert(r.getLong(5) > 0 && r.getLong(5) <= 1048576L)
    }
  }

  test("q148 BPE encode matches a symbol-list walk of the learned merges") {
    // independent encode path: greedy left-to-right merge WALK per word
    // (the engine encodes via a chain of sentinel-string replaces)
    val merges = graft.queries.TextQueries.bpeMerges(spark, sfDir, 6)
      .map { case (_, l, r, _) => (l, r) }
    def encode(w: String): Int = {
      var syms = w.toCharArray.map(_.toString).toList
      merges.foreach { case (l, r) =>
        def walk(ss: List[String]): List[String] = ss match {
          case a :: b :: rest if a == l && b == r => (l + r) :: walk(rest)
          case a :: rest => a :: walk(rest)
          case Nil => Nil
        }
        syms = walk(syms)
      }
      syms.length
    }
    val docsRows = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
    val expected = docsRows.map { r =>
      val ws = r.getString(1).split(" ")
      (r.getLong(0), ws.map(encode).map(_.toLong).sum, ws.length.toLong)
    }.sortBy(_._1).toSeq
    val got = q("q148_bpe_encode").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    // compression sanity: words <= bpe tokens <= non-space chars
    got.zip(docsRows.sortBy(_.getLong(0))).foreach { case ((_, nb, nw), dr) =>
      assert(nw <= nb && nb <= dr.getString(1).count(_ != ' '))
    }
  }

  test("q149 RRF scores decompose into the emitted ranks") {
    val rows = q("q149_rrf_fusion").collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val (lr, sr, s) = (r.getLong(2), r.getLong(3), r.getLong(1))
      val expect = (if (lr > 0) 1048576L / (60 + lr) else 0L) +
        (if (sr > 0) 1048576L / (60 + sr) else 0L)
      assert(s == expect, s"rrf mismatch at doc ${r.getLong(0)}")
      assert(lr >= 0 && lr <= 50 && sr >= 0 && sr <= 50)
      assert(lr > 0 || sr > 0)
    }
    val scores = rows.map(_.getLong(1))
    assert(scores.sliding(2).forall(p => p(0) >= p(1)))
  }

  test("q150 keeps exactly floor(3n/4) per source with a valid cutoff") {
    val rows = q("q150_adaptive_filter").collect()
    rows.foreach { r =>
      val (n, kept) = (r.getLong(1), r.getLong(2))
      assert(kept == n * 3 / 4, s"${r.getString(0)}: kept $kept of $n")
      assert(r.getLong(3) > 0 && r.getLong(4) > 0)
    }
  }

  test("q151 hard negatives never share the probe's label") {
    val labels = Tables.embeddings(spark, sfDir)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = q("q151_hard_negatives").collect()
    assert(rows.nonEmpty && rows.length % 3 == 0)
    rows.foreach { r =>
      val (qid, neg) = (r.getLong(0), r.getLong(1))
      assert(labels(qid) != labels(neg),
        s"negative $neg shares label ${labels(qid)} with probe $qid")
      assert(neg != qid)
    }
    // per-probe: ranks are exactly 1..3 with non-increasing similarity
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(3))
      assert(sorted.map(_.getLong(3)).toSeq == Seq(1L, 2L, 3L))
      val sims = sorted.map(_.getDouble(2))
      assert(sims.sliding(2).forall(p => p(0) >= p(1)))
    }
  }

  test("q152 deciles partition the corpus into disjoint ordered bands") {
    val rows = q("q152_curriculum").collect()
    val total = Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getLong(1)).sum == total)
    assert(rows.map(_.getLong(0)).toSeq == rows.map(_.getLong(0)).toSeq.sorted)
    // bands are disjoint value ranges in decile order (ties share deciles)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getLong(3) < b.getLong(2),
          s"decile ${a.getLong(0)} hi ${a.getLong(3)} overlaps " +
            s"${b.getLong(0)} lo ${b.getLong(2)}")
      case _ =>
    }
    // roughly balanced: no decile holds more than 3x its fair share
    rows.foreach(r => assert(r.getLong(1) <= 3 * total / 10 + 1))
  }

  test("q144 PMI values satisfy the Q20.20 definition and ordering") {
    val rows = q("q144_pmi_colloc").collect()
    assert(rows.length == 50)
    // recompute marginals from scratch
    val bigrams = Tables.documents(spark, sfDir).select("text").collect()
      .flatMap { r => val ws = r.getString(0).split(" "); ws.zip(ws.tail) }
    val pc = bigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ua = bigrams.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val ub = bigrams.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    rows.foreach { r =>
      val (wa, wb, cab, q40) =
        (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))
      assert(pc((wa, wb)) == cab)
      assert(q40 == cab * 1048576L / ua(wa) * 1048576L / ub(wb))
    }
    val scores = rows.map(_.getLong(3))
    assert(scores.sliding(2).forall(p => p(0) >= p(1)))
  }
}
