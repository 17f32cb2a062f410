package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Q, Tables}
import graft.functions.TextOps

/** Deduplication + similarity search — the scale-path operators a training
  * data pipeline needs (north-star mandate; absent from the reference).
  *
  * Scale design notes (100 TB):
  *  - exact dedup = hash-groupBy on md5(text): map-side partial agg, one
  *    shuffle of (digest, id) pairs only — never the payload.
  *  - MinHash LSH = per-row signature (shuffle-free) → explode to
  *    (band, doc) pairs → groupBy band → pairs within bucket. The
  *    candidate-pair join shuffles only signature-bucket keys; the
  *    quadratic blowup is bounded per bucket, and band width trades
  *    recall vs cost.
  *  - ANN = per-row bucket id (shuffle-free) → co-partitioned
  *    bucket-join instead of the O(N·Q) brute-force cross join.
  */
object DedupQueries {

  private def docs(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.documents(s, d)
  private def emb(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.embeddings(s, d)

  private val dbl = (c: org.apache.spark.sql.Column) => c.cast("double")

  val queries: Seq[Q] = Seq(
    // Exact dedup via content digest: representative = min doc_id per
    // digest; groups listed with their sizes.
    Q(
      "q50_dedup_exact",
      """SELECT substr(md5(text), 1, 8) AS fp8, count(*) AS n,
        |       min(doc_id) AS keep_id
        |FROM documents GROUP BY fp8 ORDER BY fp8""".stripMargin
    ) { (s, d) =>
      docs(s, d)
        .groupBy(substring(md5(col("text")), 1, 8).as("fp8"))
        .agg(count(lit(1)).as("n"), min("doc_id").as("keep_id"))
        .orderBy("fp8")
    },

    // MinHash signatures (k=4 salted permutations over 3-word shingles).
    Q(
      "q51_minhash_sig",
      """SELECT doc_id,
        |  list_min(list_transform(sh, x -> md5('s0' || x))) AS mh0,
        |  list_min(list_transform(sh, x -> md5('s1' || x))) AS mh1,
        |  list_min(list_transform(sh, x -> md5('s2' || x))) AS mh2,
        |  list_min(list_transform(sh, x -> md5('s3' || x))) AS mh3
        |FROM (SELECT doc_id,
        |        list_transform(range(1, len(ws) - 1),
        |          i -> array_to_string(ws[i:i+2], ' ')) AS sh
        |      FROM (SELECT doc_id, string_split(text, ' ') AS ws
        |            FROM documents) i) t
        |ORDER BY doc_id""".stripMargin
    ) { (s, d) =>
      val sh = TextOps.shingles(TextOps.tokens(col("text")), 3)
      docs(s, d).select(
        col("doc_id"),
        TextOps.minhash(sh, "s0").as("mh0"),
        TextOps.minhash(sh, "s1").as("mh1"),
        TextOps.minhash(sh, "s2").as("mh2"),
        TextOps.minhash(sh, "s3").as("mh3"))
        .orderBy("doc_id")
    },

    // LSH candidate pairs: 4 bands of 1 row each, band key = 2-hex prefix
    // of the banded minhash (256 buckets/band). Pairs deduped across bands.
    Q(
      "q52_lsh_pairs",
      """WITH sig AS (
        |  SELECT doc_id,
        |    [substr(list_min(list_transform(sh, x -> md5('s0' || x))), 1, 2),
        |     substr(list_min(list_transform(sh, x -> md5('s1' || x))), 1, 2),
        |     substr(list_min(list_transform(sh, x -> md5('s2' || x))), 1, 2),
        |     substr(list_min(list_transform(sh, x -> md5('s3' || x))), 1, 2)] AS bands
        |  FROM (SELECT doc_id,
        |          list_transform(range(1, len(ws) - 1),
        |            i -> array_to_string(ws[i:i+2], ' ')) AS sh
        |        FROM (SELECT doc_id, string_split(text, ' ') AS ws
        |              FROM documents) i) t),
        |pairs AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM (SELECT doc_id, unnest(range(0, 4)) AS band,
        |               unnest(bands) AS key FROM sig) a
        |  JOIN (SELECT doc_id, unnest(range(0, 4)) AS band,
        |               unnest(bands) AS key FROM sig) b
        |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
        |SELECT id_a, id_b FROM pairs ORDER BY id_a, id_b""".stripMargin
    ) { (s, d) =>
      val sh = TextOps.shingles(TextOps.tokens(col("text")), 3)
      val sig = docs(s, d).select(
        col("doc_id"),
        array((0 to 3).map(i =>
          substring(TextOps.minhash(sh, s"s$i"), 1, 2)): _*).as("bands"))
      val exploded = sig.select(col("doc_id"),
        posexplode(col("bands")).as(Seq("band", "key")))
      val a = exploded.as("a")
      val b = exploded.as("b")
      a.join(b, col("a.band") === col("b.band") && col("a.key") === col("b.key")
        && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .distinct()
        .orderBy("id_a", "id_b")
    },

    // 16-bit SimHash per document + Hamming distance to document 0.
    Q(
      "q53_simhash",
      """WITH sh AS (
        |  SELECT doc_id,
        |    CAST(list_sum(list_transform(range(0, 16), b ->
        |      CASE WHEN list_sum(list_transform(ws, w ->
        |          (((strpos('0123456789abcdef', substr(md5(w), b//4 + 1, 1)) - 1)
        |            >> (b % 4)) & 1) * 2 - 1)) > 0
        |      THEN 1 << b ELSE 0 END)) AS BIGINT) AS simhash
        |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents) t)
        |SELECT s.doc_id, s.simhash,
        |  CAST(bit_count(xor(s.simhash, f.simhash)) AS BIGINT) AS ham0
        |FROM sh s, (SELECT simhash FROM sh WHERE doc_id = 0) f
        |ORDER BY s.doc_id""".stripMargin
    ) { (s, d) =>
      val withSh = docs(s, d)
        .select(col("doc_id"),
          TextOps.simhash16(TextOps.tokens(col("text"))).as("simhash"))
      val ref = withSh.filter(col("doc_id") === 0)
        .select(col("simhash").as("sim0"))
      withSh.crossJoin(broadcast(ref))
        .select(col("doc_id"), col("simhash"),
          bit_count(col("simhash").bitwiseXOR(col("sim0"))).cast("long")
            .as("ham0"))
        .orderBy("doc_id")
    },

    // N-gram Jaccard near-dup scoring on a bounded candidate set
    // (consecutive doc pairs — in production the LSH candidates feed this).
    Q(
      "q54_jaccard",
      """SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
        |        len(list_distinct(list_concat(a.sh, b.sh))), 4) AS jac
        |FROM (SELECT doc_id, list_distinct(list_transform(range(1, len(ws) - 1),
        |        i -> array_to_string(ws[i:i+2], ' '))) AS sh
        |      FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents) i) a
        |JOIN (SELECT doc_id, list_distinct(list_transform(range(1, len(ws) - 1),
        |        i -> array_to_string(ws[i:i+2], ' '))) AS sh
        |      FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents) i) b
        |  ON b.doc_id = a.doc_id + 1
        |ORDER BY id_a""".stripMargin
    ) { (s, d) =>
      val sh = array_distinct(TextOps.shingles(TextOps.tokens(col("text")), 3))
      val withSh = docs(s, d).select(col("doc_id"), sh.as("sh"))
      val a = withSh.as("a")
      val b = withSh.as("b")
      a.join(b, col("b.doc_id") === col("a.doc_id") + 1)
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
          round(TextOps.jaccard(col("a.sh"), col("b.sh")), 4).as("jac"))
        .orderBy("id_a")
    },

    // Brute-force cosine top-5 per query vector (the correctness baseline
    // for ANN): queries broadcast against the full embedding table.
    Q(
      "q55_cosine_knn",
      """WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
        |           WHERE vec_id < 3),
        |scored AS (
        |  SELECT q.qid, e.vec_id,
        |    round(list_sum(list_transform(range(1, len(e.embedding) + 1),
        |            i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
        |      / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |       * sqrt(list_sum(list_transform(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4) + 0
        |      AS rcos
        |  FROM embeddings e, q WHERE e.vec_id != q.qid),
        |ranked AS (
        |  SELECT qid, vec_id, rcos,
        |    row_number() OVER (PARTITION BY qid ORDER BY rcos DESC, vec_id) AS rn
        |  FROM scored)
        |SELECT qid, vec_id, rcos FROM ranked WHERE rn <= 5
        |ORDER BY qid, rcos DESC, vec_id""".stripMargin
    ) { (s, d) =>
      val q = emb(s, d).filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val scored = emb(s, d).crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          (round(TextOps.cosine(col("embedding"), col("qv")), 4) + lit(0.0)).as("rcos"))
      val w = Window.partitionBy("qid").orderBy(col("rcos").desc, col("vec_id"))
      scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select("qid", "vec_id", "rcos")
        .orderBy(col("qid"), col("rcos").desc, col("vec_id"))
    },

    // LSH-bucketed ANN (the scale path): sign-bucket on the first 4
    // components (16 buckets), candidates restricted to the query's bucket.
    Q(
      "q56_ann_lsh",
      """WITH b AS (
        |  SELECT vec_id, embedding,
        |    CAST(list_sum(list_transform(range(0, 4), i ->
        |      CASE WHEN embedding[i + 1] > 0 THEN 1 << i ELSE 0 END)) AS BIGINT)
        |      AS bucket
        |  FROM embeddings),
        |q AS (SELECT vec_id AS qid, embedding AS qv, bucket FROM b
        |      WHERE vec_id < 5),
        |scored AS (
        |  SELECT q.qid, b.vec_id, b.bucket,
        |    round(list_sum(list_transform(range(1, len(b.embedding) + 1),
        |            i -> CAST(b.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE))), 4) + 0
        |      AS rdot
        |  FROM b JOIN q ON b.bucket = q.bucket AND b.vec_id != q.qid),
        |ranked AS (
        |  SELECT qid, vec_id, bucket, rdot,
        |    row_number() OVER (PARTITION BY qid ORDER BY rdot DESC, vec_id) AS rn
        |  FROM scored)
        |SELECT qid, vec_id, bucket, rdot FROM ranked WHERE rn <= 3
        |ORDER BY qid, rdot DESC, vec_id""".stripMargin
    ) { (s, d) =>
      val withB = emb(s, d).select(col("vec_id"), col("embedding"),
        TextOps.signBucket(col("embedding"), 4).as("bucket"))
      val q = withB.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"),
          col("bucket").as("qbucket"))
      val scored = withB.join(broadcast(q),
        col("bucket") === col("qbucket") && col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"), col("bucket"),
          (round(TextOps.dot(col("embedding"), col("qv")), 4) + lit(0.0)).as("rdot"))
      val w = Window.partitionBy("qid").orderBy(col("rdot").desc, col("vec_id"))
      scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("qid", "vec_id", "bucket", "rdot")
        .orderBy(col("qid"), col("rdot").desc, col("vec_id"))
    },

    // Embedding near-dup histogram: distribution of rounded cosine between
    // consecutive vectors (bounded deterministic candidate set).
    Q(
      "q57_cosine_hist",
      """SELECT CAST(floor(rcos * 10) AS BIGINT) AS bucket, count(*) AS n
        |FROM (
        |  SELECT round(list_sum(list_transform(range(1, len(a.embedding) + 1),
        |           i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))), 4) + 0
        |         AS rcos
        |  FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1) t
        |GROUP BY bucket ORDER BY bucket""".stripMargin
    ) { (s, d) =>
      val a = emb(s, d).as("a")
      val b = emb(s, d).as("b")
      a.join(b, col("b.vec_id") === col("a.vec_id") + 1)
        .select((round(TextOps.dot(col("a.embedding"), col("b.embedding")), 4) + lit(0.0))
          .as("rcos"))
        .groupBy(floor(col("rcos") * 10).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy("bucket")
    }
  )
}
