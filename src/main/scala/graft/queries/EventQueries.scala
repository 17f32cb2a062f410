package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Q, Tables}

/** Time-series / event-log operators over the `events` table: time
  * bucketing, JSON prop extraction, ordered-window gaps, sessionization,
  * and keep-first dedup. These are the batch twins of the Structured
  * Streaming pipeline in `graft.streaming` (same windowing semantics;
  * watermarks only matter for unbounded input). Timestamps are compared
  * via epoch seconds so engine timestamp formatting can never diverge.
  */
object EventQueries {

  private def ev(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.events(s, d)

  /** Memoized max(unix_micros(ts)) per data dir (q213's decay anchor):
    * one 1-column aggregate job instead of a broadcast-scalar subquery,
    * which would serialize its consumers' stages (round-8 rule, same as
    * TextQueries.maxDocId). */
  private val maxTsUs =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]
  private def maxTsMicros(s: org.apache.spark.sql.SparkSession,
      d: String): Long =
    maxTsUs.computeIfAbsent(d,
      dir => ev(s, dir).agg(max(expr("unix_micros(ts)"))).head().getLong(0))

  /** Non-SQL-expressible entries (rows-only driver check): multimodal
    * decode plumbing — the featurize step runs per-partition via
    * mapPartitions; not expressible as DuckDB SQL over the input tables. */
  val multimodal: Seq[Q] = Seq(
    // Full oracle (upgraded from rows-only): the decode stub is a
    // deterministic byte histogram, so DuckDB can recompute it from the
    // same ASCII text the fake payload encodes (ascii(substr)//32 = the
    // stub's (b & 0xff)*8/256 bin). Features fixed-point-quantized on both
    // sides (count/n and *1e6 are exactly-rounded IEEE ops — engine-equal).
    // ASSUMES ASCII, non-empty, non-null text (true of the synthetic
    // corpus by construction): DuckDB strlen counts bytes but
    // substr/ascii index CHARACTERS, so multi-byte text would diverge
    // from the Spark byte-level stub, and empty text would divide by 0.
    Q(
      "q70_media_features",
      """WITH counts AS (
        |  SELECT doc_id AS media_id, strlen(text) AS n_bytes,
        |    list_transform(range(0, 8), b -> len(list_filter(
        |      range(1, strlen(text) + 1),
        |      i -> ascii(substr(text, i, 1)) // 32 = b))) AS cs
        |  FROM documents)
        |SELECT media_id, CAST(n_bytes AS BIGINT) AS n_bytes,
        |  to_json(list_transform(cs, c ->
        |    CAST(round(CAST(c AS DOUBLE) / n_bytes * 1000000) AS BIGINT)))::VARCHAR
        |    AS features_json
        |FROM counts ORDER BY media_id""".stripMargin
    ) { (s, d) =>
      val media = graft.multimodal.Multimodal.fakeMediaTable(
        Tables.documents(s, d), "doc_id", "text")
      graft.multimodal.Multimodal.decodeAndFeaturize(media)
        .select(col("media_id"), col("n_bytes"),
          Ser.jsfp(col("features")).as("features_json"))
        .orderBy("media_id")
    },
    // Full oracle (upgraded from rows-only): the fake payload is the UTF-8
    // text, so DuckDB can re-derive frame boundaries (flen = len // nf)
    // and md5 the CONCATENATED SAMPLED FRAMES — proving stride sampling
    // picked exactly the right byte ranges, not just the right count.
    Q(
      "q71_frame_sample",
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    CASE WHEN doc_id % 3 = 0 THEN 'image'
        |         WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
        |    CAST(doc_id % 16 + 1 AS INTEGER) AS nf,
        |    strlen(text) AS len, text
        |  FROM documents),
        |s AS (
        |  SELECT media_id, kind, nf, len // nf AS flen,
        |    list_filter(range(0, nf), i -> i % 2 = 0) AS keep, text
        |  FROM m)
        |SELECT media_id, kind, CAST(len(keep) AS BIGINT) AS n_sampled,
        |  substr(md5(array_to_string(list_transform(keep,
        |    i -> substr(text, i * flen + 1, flen)), '')), 1, 8) AS fp8
        |FROM s ORDER BY media_id""".stripMargin
    ) { (s, d) =>
      val media = graft.multimodal.Multimodal.fakeMediaTable(
        Tables.documents(s, d), "doc_id", "text")
      graft.multimodal.Multimodal.sampleFrames(media, stride = 2)
        .select(col("media_id"), col("kind"),
          size(col("sampled_frames")).cast("long").as("n_sampled"),
          substring(md5(aggregate(col("sampled_frames"),
            lit(Array.emptyByteArray), (acc, f) => concat(acc, f))), 1, 8)
            .as("fp8"))
        .orderBy("media_id")
    })

  /** Sketch aggregates (HLL++ count-distinct, quantile sketch) — the
    * scale path where exact distinct/percentile shuffles too much. The
    * sketches themselves can't be oracle-compared (different algorithms,
    * different estimates), so the gate row is structured as
    * verify-in-query: compute BOTH the sketch estimate and the exact
    * value, emit the exact value only while the estimate agrees within
    * its error bound, and emit the (wrong) estimate otherwise — the
    * sketch is load-bearing in an oracle-exact row, and sketch
    * nondeterminism (HLL/KLL merge order) is absorbed by the tolerance
    * instead of leaking into the output. Tight error-bound assertions
    * against exact values stay in SketchSpec. The exact companions are
    * gate verification, not the production path — a real pipeline runs
    * the sketch alone; the exact forms used here (countDistinct,
    * Quantiles.groupQuantilesCont) are themselves O(1)-state shuffles,
    * so even the verification shape survives scale. */
  val sketches: Seq[Q] = Seq(
    Q(
      "q91_sketches",
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS parts_checked,
        |  count(DISTINCT l_suppkey) AS supps_checked,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS median_checked
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
    ) { (s, d) =>
      import graft.functions.Quantiles
      val li = Tables.lineitem(s, d)
      // TWO lineitem scans, down from r10's three: the sketch lane keeps
      // its own 3-group ObjectHashAggregate (folding the sketches into a
      // multi-distinct agg allocates HLL/QuantileSummaries buffers per
      // Expand distinct-group — measured 5.4 s vs 2.1 s at sf0.1), and
      // BOTH exact companions now come from the quantile histogram pass:
      // the distinct columns ride it as extra posexplode lanes, so the
      // exact countDistincts are free lane-row counts in the same final
      // aggregate (Quantiles.groupQuantilesAndDistincts — no Expand
      // anywhere; Round11PlanSpec pins ≤2 scans + Expand-free).
      val sk = li.groupBy("l_returnflag").agg(
        approx_count_distinct(col("l_partkey")).as("ap"),
        approx_count_distinct(col("l_suppkey")).as("asu"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
          .as("am"))
      val med = Quantiles.groupQuantilesAndDistincts(li, "l_returnflag",
        "l_extendedprice", Seq(("em", 0.5)),
        Seq("l_partkey" -> "ep", "l_suppkey" -> "es"))
      // approx_count_distinct rsd defaults to 5%; 10% relative tolerance
      // leaves ~2 sigma of slack. percentile_approx at accuracy 10000 is
      // well inside 5% on any non-degenerate distribution.
      def checked(approx: org.apache.spark.sql.Column,
          exact: org.apache.spark.sql.Column,
          tol: Double): org.apache.spark.sql.Column =
        when(abs(approx.cast("double") - exact.cast("double")) <=
          exact.cast("double") * tol, exact).otherwise(approx)
      sk.join(med, Seq("l_returnflag"))
        .select(col("l_returnflag"),
          checked(col("ap"), col("ep"), 0.10).cast("long").as("parts_checked"),
          checked(col("asu"), col("es"), 0.10).cast("long").as("supps_checked"),
          round(checked(col("am"), col("em"), 0.05), 4).as("median_checked"))
        .orderBy("l_returnflag")
    },

    // Compression-ratio quality filter. deflate has no DuckDB equivalent,
    // so the gate row is verify-in-query (same pattern as q91): the
    // oracle-exact output is the per-lang aggregate of the distinct-word
    // ratio — the classic repetitiveness proxy both engines compute
    // bit-identically — and the codegen'd deflate kernel guards it:
    // corr(deflate_ratio, dwr) is ~0.95 on this corpus (measured at
    // sf0.001 and sf0.01), so the query poisons n_docs (negates it) if
    // the corpus-wide correlation drops below 0.9, i.e. if the kernel
    // stops tracking repetitiveness the gate goes red. Tight kernel
    // assertions (deflate monotonicity vs repeated text, java.util.zip
    // equivalence) stay in TextOpsSpec. One scalar kernel call per doc;
    // per-lang aggregate is partial+final; the guard is a 1-row broadcast.
    Q(
      "q93_compress_quality",
      """WITH d AS (
        |  SELECT lang,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) /
        |      len(string_split(text, ' ')) AS dwr
        |  FROM documents)
        |SELECT lang, count(*) AS n_docs,
        |  round(avg(dwr), 4) AS avg_dwr,
        |  CAST(sum(CASE WHEN dwr < 0.35 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_repetitive
        |FROM d GROUP BY lang ORDER BY lang""".stripMargin
    ) { (s, d) =>
      import graft.functions.TextOps
      val toks = TextOps.tokens(col("text"))
      val base = Tables.documents(s, d)
        .select(col("lang"),
          TextOps.compressionRatio(col("text")).as("ratio"),
          (size(array_distinct(toks)).cast("double") / size(toks)).as("dwr"))
      val guard = base.agg(corr(col("ratio"), col("dwr")).as("__c"))
      base.crossJoin(broadcast(guard))
        .groupBy("lang")
        .agg(
          (count(lit(1)) * when(first(col("__c")) >= 0.9, 1L).otherwise(-1L))
            .as("n_docs"),
          round(avg("dwr"), 4).as("avg_dwr"),
          sum(when(col("dwr") < 0.35, 1L).otherwise(0L)).as("n_repetitive"))
        .orderBy("lang")
    })

  val queries: Seq[Q] = Seq(
    // Tumbling 1-hour windows (batch form of streaming window agg).
    Q(
      "q60_hourly",
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_start,
        |       event_type, count(*) AS n, round(sum(value), 2) AS sum_val
        |FROM events GROUP BY hour_start, event_type
        |ORDER BY hour_start, event_type""".stripMargin
    ) { (s, d) =>
      ev(s, d)
        .groupBy(
          unix_timestamp(date_trunc("hour", col("ts"))).as("hour_start"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_val"))
        .orderBy("hour_start", "event_type")
    },

    // Tumbling 6-hour windows via Spark's native window() — epoch-aligned,
    // identical to integer bucketing in the oracle.
    Q(
      "q61_window_6h",
      """SELECT CAST(floor(epoch(ts) / 21600) * 21600 AS BIGINT) AS wstart,
        |       count(*) AS n, round(avg(value), 4) AS avg_val
        |FROM events GROUP BY wstart ORDER BY wstart""".stripMargin
    ) { (s, d) =>
      ev(s, d)
        .groupBy(window(col("ts"), "6 hours").as("w"))
        .agg(count(lit(1)).as("n"), round(avg("value"), 4).as("avg_val"))
        .select(unix_timestamp(col("w.start")).as("wstart"), col("n"),
          col("avg_val"))
        .orderBy("wstart")
    },

    // JSON property extraction (props is a JSON string column).
    Q(
      "q62_json_props",
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS kmod,
        |       count(*) AS n, round(avg(value), 4) AS avg_val
        |FROM events GROUP BY kmod ORDER BY kmod""".stripMargin
    ) { (s, d) =>
      ev(s, d)
        .groupBy((get_json_object(col("props"), "$.k").cast("long") % 10)
          .as("kmod"))
        .agg(count(lit(1)).as("n"), round(avg("value"), 4).as("avg_val"))
        .orderBy("kmod")
    },

    // Typed JSON parsing: from_json with an explicit schema (the
    // reference's JSONSchema pushdown analogue at column level) — distinct
    // from the path-string get_json_object in q62.
    Q(
      "q66_json_typed",
      """SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 7 AS kmod7,
        |       count(*) AS n,
        |       CAST(min(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS kmin
        |FROM events GROUP BY kmod7 ORDER BY kmod7""".stripMargin
    ) { (s, d) =>
      val parsed = from_json(col("props"),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.LongType))))
      ev(s, d).withColumn("p", parsed)
        .groupBy((col("p.k") % 7).as("kmod7"))
        .agg(count(lit(1)).as("n"), min(col("p.k")).as("kmin"))
        .orderBy("kmod7")
    },

    // Ordered window: gap to previous event per user (lag), average gap.
    Q(
      "q63_user_gaps",
      """SELECT user_id, count(*) AS n_events,
        |  round(avg(gap), 2) AS avg_gap_s
        |FROM (
        |  SELECT user_id,
        |    epoch(ts) - lag(epoch(ts)) OVER (PARTITION BY user_id
        |                                     ORDER BY ts, event_id) AS gap
        |  FROM events) t
        |GROUP BY user_id ORDER BY user_id""".stripMargin
    ) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val sec = col("ts").cast("double")
      ev(s, d)
        .withColumn("gap", sec - lag(sec, 1).over(w))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"), round(avg("gap"), 2).as("avg_gap_s"))
        .orderBy("user_id")
    },

    // Sessionization: a session starts when the gap to the previous event
    // of the same user exceeds 30 minutes.
    Q(
      "q64_sessionize",
      """SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions,
        |       count(*) AS n_events
        |FROM (
        |  SELECT user_id,
        |    CASE WHEN epoch(ts) - lag(epoch(ts)) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id) > 1800
        |         OR lag(epoch(ts)) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id) IS NULL
        |    THEN 1 ELSE 0 END AS new_session
        |  FROM events) t
        |GROUP BY user_id ORDER BY user_id""".stripMargin
    ) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val sec = col("ts").cast("double")
      val prev = lag(sec, 1).over(w)
      ev(s, d)
        .withColumn("new_session",
          when(sec - prev > 1800 || prev.isNull, 1).otherwise(0))
        .groupBy("user_id")
        .agg(sum("new_session").cast("long").as("n_sessions"),
          count(lit(1)).as("n_events"))
        .orderBy("user_id")
    },

    // Keep-first dedup by (user, event_type): the streaming
    // dropDuplicates-with-watermark analogue in batch.
    Q(
      "q65_event_dedup",
      """SELECT user_id, event_type, min(event_id) AS first_event,
        |       CAST(floor(epoch(min(ts))) AS BIGINT) AS first_ts, count(*) AS n
        |FROM events GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin
    ) { (s, d) =>
      ev(s, d)
        .groupBy("user_id", "event_type")
        .agg(min("event_id").as("first_event"),
          unix_timestamp(min(col("ts"))).as("first_ts"),
          count(lit(1)).as("n"))
        .orderBy("user_id", "event_type")
    },

    // Backward as-of join (JoinOps.asofBackward): each purchase picks the
    // user's latest click at-or-before it — the feature-snapshot join of a
    // training pipeline. Spark has no ASOF operator; the union+window
    // carry-forward shape is one hash shuffle on user_id (no nested loop).
    // Oracle: DuckDB's native ASOF LEFT JOIN.
    Q(
      "q89_asof_join",
      """SELECT l.event_id, l.user_id, round(l.value, 2) AS pvalue,
        |  round(COALESCE(epoch(l.ts) - epoch(r.ts), -1.0), 2) AS gap_s,
        |  round(COALESCE(r.value, -1.0), 2) AS cvalue
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') l
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') r
        |  ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY l.event_id""".stripMargin
    ) { (s, d) =>
      import graft.functions.JoinOps
      val purchases = ev(s, d).filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
      val clicks = ev(s, d).filter(col("event_type") === "click")
        .select("user_id", "ts", "value")
      JoinOps.asofBackward(purchases, clicks, key = "user_id", ts = "ts")
        .select(col("event_id"), col("user_id"),
          round(col("value"), 2).as("pvalue"),
          round(coalesce(col("ts").cast("double") - col("ts_r").cast("double"),
            lit(-1.0)), 2).as("gap_s"),
          round(coalesce(col("value_r"), lit(-1.0)), 2).as("cvalue"))
        .orderBy("event_id")
    },

    // The SAME as-of join on the native whole-operator path (custom
    // AsofJoinNode -> AsofJoinStrategy -> one-pass streaming-merge
    // AsofJoinExec; SURVEY §7.3 path (c)) — identical oracle to q89, so
    // the gate proves the custom physical operator end-to-end.
    Q(
      "q112_asof_native",
      """SELECT l.event_id, l.user_id, round(l.value, 2) AS pvalue,
        |  round(COALESCE(epoch(l.ts) - epoch(r.ts), -1.0), 2) AS gap_s,
        |  round(COALESCE(r.value, -1.0), 2) AS cvalue
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') l
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') r
        |  ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY l.event_id""".stripMargin
    ) { (s, d) =>
      import graft.functions.JoinOps
      val purchases = ev(s, d).filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
      val clicks = ev(s, d).filter(col("event_type") === "click")
        .select("user_id", "ts", "value")
      JoinOps.asofBackwardNative(purchases, clicks, key = "user_id", ts = "ts")
        .select(col("event_id"), col("user_id"),
          round(col("value"), 2).as("pvalue"),
          round(coalesce(col("ts").cast("double") - col("ts_r").cast("double"),
            lit(-1.0)), 2).as("gap_s"),
          round(coalesce(col("value_r"), lit(-1.0)), 2).as("cvalue"))
        .orderBy("event_id")
    },

    // Range (interval) join (JoinOps.rangeJoinBucketed): events bucketed
    // into value tiers derived from the region table. A pure inequality
    // join in Spark is a BroadcastNestedLoopJoin — O(n x m); the bucketed
    // form is an equi-shuffle. Tiers: [key*100, key*100+100).
    Q(
      "q90_range_join",
      """WITH tiers AS (
        |  SELECT r_regionkey AS tier, r_regionkey * 100.0 AS lo,
        |         r_regionkey * 100.0 + 100.0 AS hi FROM region)
        |SELECT t.tier, count(*) AS n, round(sum(e.value), 2) + 0 AS sum_val
        |FROM events e JOIN tiers t ON e.value >= t.lo AND e.value < t.hi
        |GROUP BY t.tier ORDER BY t.tier""".stripMargin
    ) { (s, d) =>
      import graft.functions.JoinOps
      val tiers = Tables.region(s, d).select(
        col("r_regionkey").cast("long").as("tier"),
        (col("r_regionkey") * 100.0).as("lo"),
        (col("r_regionkey") * 100.0 + 100.0).as("hi"))
      JoinOps.rangeJoinBucketed(ev(s, d), "value", tiers, "lo", "hi",
          bucketWidth = 100.0)
        .groupBy("tier")
        .agg(count(lit(1)).as("n"),
          (round(sum("value"), 2) + lit(0.0)).as("sum_val"))
        .orderBy("tier")
    },

    // Interval-overlap join (interval x interval — neither Spark nor the
    // reference has one): per-(user, hour) activity spans joined to
    // sampled error windows (±300 s) they overlap. The bucketed shape
    // ([[JoinOps.intervalJoinBucketed]], hour-wide buckets) replaces the
    // BroadcastNestedLoopJoin Spark would plan for the raw inequality
    // predicate; canonical-bucket dedup keeps the output exact without a
    // distinct. Oracle: DuckDB runs the naive inequality join.
    Q(
      "q101_overlap_join",
      """WITH spans AS (
        |  SELECT user_id, min(epoch(ts)) AS s_lo, max(epoch(ts)) AS s_hi
        |  FROM events GROUP BY user_id, date_trunc('hour', ts)),
        |errw AS (
        |  SELECT event_id, epoch(ts) - 300 AS e_lo, epoch(ts) + 300 AS e_hi
        |  FROM events WHERE event_type = 'error' AND event_id % 97 = 0)
        |SELECT s.user_id, CAST(count(*) AS BIGINT) AS n_overlaps
        |FROM spans s JOIN errw e ON s.s_lo < e.e_hi AND e.e_lo < s.s_hi
        |GROUP BY s.user_id ORDER BY user_id""".stripMargin
    ) { (s, d) =>
      import graft.functions.JoinOps
      val sec = col("ts").cast("double")
      val spans = ev(s, d)
        .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
        .agg(min(sec).as("s_lo"), max(sec).as("s_hi"))
        .drop("h")
      val errw = ev(s, d)
        .filter(col("event_type") === "error" && col("event_id") % 97 === 0)
        .select(col("event_id"), (sec - 300).as("e_lo"), (sec + 300).as("e_hi"))
      JoinOps.intervalJoinBucketed(spans, "s_lo", "s_hi", errw, "e_lo", "e_hi",
          bucketWidth = 3600.0)
        .groupBy("user_id")
        .agg(count(lit(1)).cast("long").as("n_overlaps"))
        .orderBy("user_id")
    },

    // Funnel analysis: view -> click -> purchase, each stage within 7 days
    // of the previous one, earliest-qualifying-event semantics. Three
    // conditional min-aggregations chained by an equi-join on user_id —
    // each stage is one hash shuffle on the same key (AQE co-partitions),
    // never a per-user sort or collect. All arithmetic is integer
    // microseconds (epoch_us / unix_micros), lags floored to whole seconds
    // per user BEFORE the cross-user sum so the average is integer-exact
    // cross-engine (Σ of per-user DOUBLES would be summation-order-
    // dependent; Σ of BIGINTs is not).
    Q(
      "q135_funnel",
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |s1 AS (SELECT user_id, min(us) AS t1 FROM e
        |       WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(e.us) AS t2, min(s1.t1) AS t1
        |       FROM e JOIN s1 USING (user_id)
        |       WHERE e.event_type = 'click' AND e.us > s1.t1
        |         AND e.us <= s1.t1 + 604800000000 GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.us) AS t3, min(s2.t2) AS t2
        |       FROM e JOIN s2 USING (user_id)
        |       WHERE e.event_type = 'purchase' AND e.us > s2.t2
        |         AND e.us <= s2.t2 + 604800000000 GROUP BY e.user_id)
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS stage_ord, 'view' AS stage,
        |         count(*) AS n_users, CAST(0 AS BIGINT) AS avg_lag_s FROM s1
        |  UNION ALL
        |  SELECT 2, 'click', count(*), CAST(CASE WHEN count(*) = 0 THEN 0
        |    ELSE sum((t2 - t1) // 1000000) // count(*) END AS BIGINT) FROM s2
        |  UNION ALL
        |  SELECT 3, 'purchase', count(*), CAST(CASE WHEN count(*) = 0 THEN 0
        |    ELSE sum((t3 - t2) // 1000000) // count(*) END AS BIGINT) FROM s3
        |) ORDER BY stage_ord""".stripMargin
    ) { (s, d) =>
      val e = ev(s, d).select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      val horizon = 604800000000L // 7 days in micros
      val s1 = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("us").as("t1"))
      val s2 = e.filter(col("event_type") === "click").join(s1, "user_id")
        .filter(col("us") > col("t1") && col("us") <= col("t1") + horizon)
        .groupBy("user_id").agg(min("us").as("t2"), min("t1").as("t1"))
      val s3 = e.filter(col("event_type") === "purchase")
        .join(s2.select("user_id", "t2"), "user_id")
        .filter(col("us") > col("t2") && col("us") <= col("t2") + horizon)
        .groupBy("user_id").agg(min("us").as("t3"), min("t2").as("t2"))
      def stage(df: org.apache.spark.sql.DataFrame, ord: Int, nm: String,
          lagSecs: org.apache.spark.sql.Column) =
        df.agg(count(lit(1)).as("n_users"), lagSecs.as("sl"))
          .select(lit(ord.toLong).as("stage_ord"), lit(nm).as("stage"),
            col("n_users"),
            when(col("n_users") === 0, 0L)
              .otherwise(expr("sl div n_users")).as("avg_lag_s"))
      stage(s1, 1, "view", lit(0L))
        .unionByName(stage(s2, 2, "click",
          sum(expr("(t2 - t1) div 1000000"))))
        .unionByName(stage(s3, 3, "purchase",
          sum(expr("(t3 - t2) div 1000000"))))
        .orderBy("stage_ord")
    },

    // Weekly retention cohorts: cohort = a user's first active epoch-week,
    // cells = distinct users active at each week offset. One exchange on
    // user_id (whole-partition window min — no second scan or self-join),
    // then distinct + partial/final count. Epoch-week integer bucketing
    // (cast-to-seconds floor div 604800) sidesteps engine date_trunc /
    // timezone divergence entirely.
    Q(
      "q136_retention",
      """WITH w AS (SELECT user_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) // 604800 AS wk FROM events),
        |c AS (SELECT user_id, wk,
        |    min(wk) OVER (PARTITION BY user_id) AS cohort FROM w),
        |act AS (SELECT DISTINCT user_id, cohort, wk - cohort AS offs FROM c)
        |SELECT cohort, offs, count(*) AS n_users
        |FROM act GROUP BY cohort, offs ORDER BY cohort, offs""".stripMargin
    ) { (s, d) =>
      val w = Window.partitionBy("user_id")
      ev(s, d)
        .select(col("user_id"), expr("cast(ts as long) div 604800").as("wk"))
        .withColumn("cohort", min("wk").over(w))
        .select(col("user_id"), col("cohort"),
          (col("wk") - col("cohort")).as("offs"))
        .distinct()
        .groupBy("cohort", "offs").agg(count(lit(1)).as("n_users"))
        .orderBy("cohort", "offs")
    },

    // Rolling anomaly detection: flag events whose value deviates > 3
    // sigma from the user's own trailing-20-event baseline. The z-score
    // test is done entirely in Q2 fixed-point integer algebra —
    // (n·v − s)² > 9·(n·q − s²) with v = floor(100·value), s/q = window
    // sum / sum-of-squares — so there is no sqrt, no double accumulation,
    // and both engines agree bit-exactly regardless of their window-sum
    // order. Partitioned by user_id (cardinality scales with the data),
    // never by the 5-value event_type; all three window aggregates share
    // one frame spec -> ONE Window operator.
    Q(
      "q137_rolling_anomaly",
      """WITH q AS (SELECT event_id, user_id, event_type, ts,
        |    CAST(floor(value * 100) AS BIGINT) AS v FROM events),
        |w AS (SELECT event_id, user_id, event_type, v,
        |    sum(v) OVER win AS s, sum(v * v) OVER win AS sq,
        |    count(*) OVER win AS n
        |  FROM q
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
        |                 ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
        |SELECT event_id, user_id, event_type, v
        |FROM w WHERE n = 20
        |  AND (20 * v - s) * (20 * v - s) > 9 * (20 * sq - s * s)
        |ORDER BY event_id""".stripMargin
    ) { (s, d) =>
      val win = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
      ev(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts"),
          floor(col("value") * 100).cast("long").as("v"))
        // pre-project v*v so all three aggregates are over plain input
        // columns of ONE frame spec -> Spark plans a single Window
        // operator (a derived expression between withColumns splits it
        // into two passes over every partition)
        .withColumn("vv", col("v") * col("v"))
        .withColumn("s", sum("v").over(win))
        .withColumn("sq", sum("vv").over(win))
        .withColumn("n", count(lit(1)).over(win))
        .filter(col("n") === 20 &&
          (lit(20L) * col("v") - col("s")) * (lit(20L) * col("v") - col("s")) >
            lit(9L) * (lit(20L) * col("sq") - col("s") * col("s")))
        .select(col("event_id"), col("user_id"), col("event_type"), col("v"))
        .orderBy("event_id")
    },

    // Event-type transition matrix (first-order Markov bigrams): per-user
    // ordered lead() pairs -> partial+final count. The row-normalized
    // probability is computed over the AGGREGATED k² matrix (25 rows), so
    // the fixed-cardinality window partition never sees corpus-sized
    // input; ppm fixed-point keeps it integer-exact.
    Q(
      "q139_transitions",
      """WITH seq AS (
        |  SELECT user_id, event_type AS a,
        |    lead(event_type) OVER (PARTITION BY user_id
        |                           ORDER BY ts, event_id) AS b
        |  FROM events)
        |SELECT a, b, count(*) AS n,
        |  CAST(count(*) * 1000000 // sum(count(*)) OVER (PARTITION BY a)
        |    AS BIGINT) AS p_ppm
        |FROM seq WHERE b IS NOT NULL
        |GROUP BY a, b ORDER BY a, b""".stripMargin
    ) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val counts = ev(s, d)
        .select(col("user_id"), col("event_type").as("a"),
          lead("event_type", 1).over(w).as("b"))
        .filter(col("b").isNotNull)
        .groupBy("a", "b").agg(count(lit(1)).as("n"))
      counts
        .withColumn("p_ppm",
          expr("n * 1000000 div sum(n) over (partition by a)"))
        .orderBy("a", "b")
    },

    // Fixed-domain value histogram with gap-filled empty bins (the
    // reporting twin of q57's cosine histogram): 32 bins over [0, 330),
    // partial+final count agg, then a left join from the 32-row bin
    // spine (spark.range — never corpus-sized) fills gaps with 0. Bin
    // edges exposed as exact integers (bin * 103125 div 10000).
    Q(
      "q140_histogram",
      """WITH b AS (
        |  SELECT CAST(floor(value / 10.3125) AS BIGINT) AS bin,
        |         count(*) AS n
        |  FROM events WHERE value >= 0 AND value < 330 GROUP BY 1),
        |bins AS (SELECT unnest(range(0, 32)) AS bin)
        |SELECT bins.bin, COALESCE(b.n, 0) AS n,
        |  CAST(bins.bin * 103125 // 10000 AS BIGINT) AS lo_int
        |FROM bins LEFT JOIN b USING (bin) ORDER BY bins.bin""".stripMargin
    ) { (s, d) =>
      val b = ev(s, d)
        .filter(col("value") >= 0 && col("value") < 330)
        .groupBy(floor(col("value") / 10.3125).cast("long").as("bin"))
        .agg(count(lit(1)).as("n"))
      s.range(0, 32).select(col("id").as("bin"))
        .join(b, Seq("bin"), "left")
        .select(col("bin"), coalesce(col("n"), lit(0L)).as("n"),
          expr("bin * 103125 div 10000").as("lo_int"))
        .orderBy("bin")
    },

    // Engagement-weighted corpus selection — the cross-table op a
    // product-data pipeline runs: user events carry an item key in their
    // JSON props; aggregate per-item engagement (view +1, purchase +5,
    // error -2 — all-integer weights) and join back to the documents
    // those items reference, ranking training data by real usage. Scale
    // shape: JSON extraction is map-side, engagement collapses in a
    // partial+final agg BEFORE the join (the join's left side is
    // item-cardinality, not event-cardinality), and the doc join is an
    // ordinary shuffled equi-join on the pruned (doc_id, text) scan;
    // top-50 is a TakeOrderedAndProject heap.
    Q(
      "q153_engagement_select",
      """WITH ev AS (
        |  SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS item,
        |         event_type
        |  FROM events
        |), eng AS (
        |  SELECT item,
        |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS views,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS purchases,
        |    CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS errors,
        |    CAST(sum(CASE WHEN event_type = 'view' THEN 1
        |              WHEN event_type = 'purchase' THEN 5
        |              WHEN event_type = 'error' THEN -2 ELSE 0 END)
        |      AS BIGINT) AS engagement
        |  FROM ev GROUP BY item
        |)
        |SELECT d.doc_id, views, purchases, errors, engagement,
        |  CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_words
        |FROM eng JOIN documents d ON d.doc_id = eng.item
        |ORDER BY engagement DESC, doc_id LIMIT 50""".stripMargin
    ) { (s, d) =>
      val eng = ev(s, d)
        .select(get_json_object(col("props"), "$.k").cast("long").as("item"),
          col("event_type"))
        .groupBy("item")
        .agg(
          sum(when(col("event_type") === "view", 1L).otherwise(0L))
            .cast("long").as("views"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .cast("long").as("purchases"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L))
            .cast("long").as("errors"),
          sum(when(col("event_type") === "view", 1L)
            .when(col("event_type") === "purchase", 5L)
            .when(col("event_type") === "error", -2L).otherwise(0L))
            .cast("long").as("engagement"))
      Tables.documents(s, d)
        .select(col("doc_id"), size(split(col("text"), " ")).cast("long")
          .as("n_words"))
        .join(eng, col("doc_id") === col("item"))
        .select(col("doc_id"), col("views"), col("purchases"),
          col("errors"), col("engagement"), col("n_words"))
        .orderBy(col("engagement").desc, col("doc_id"))
        .limit(50)
    },

    // Graph centrality over the user->item engagement graph
    // (GraphOps.pageRank): 3 fixed iterations of integer fixed-point
    // PageRank — the authority signal a curation pipeline uses to weight
    // sources by real usage rather than raw counts (an item clicked by
    // heavy multi-item users ranks below one owning a dedicated
    // audience). Node ids prefix-code the bipartition (user*2, item*2+1)
    // so the spaces can't collide. All-integer floor-div arithmetic makes
    // the ranks bit-exact cross-engine (a double PageRank never is —
    // summation order); the oracle unrolls the 3 iterations as CTEs.
    // Scale shape: per iteration ONE shuffle join of the rank table onto
    // the checkpointed (src, dst, outd) edge table + partial+final sum;
    // top-50 is a TakeOrderedAndProject heap.
    Q(
      "q155_pagerank",
      """WITH e AS (
        |  SELECT DISTINCT user_id * 2 AS src,
        |    CAST(json_extract(props, '$.k') AS BIGINT) * 2 + 1 AS dst
        |  FROM events),
        |nodes AS (SELECT DISTINCT id FROM
        |  (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
        |p AS (SELECT count(*) AS n FROM nodes),
        |deg AS (SELECT src, count(*) AS outd FROM e GROUP BY src),
        |r0 AS (SELECT id, 1000000000000 // p.n AS r FROM nodes, p),
        |s1 AS (SELECT e.dst AS id, sum(r0.r // d.outd) AS m
        |       FROM e JOIN deg d USING (src) JOIN r0 ON r0.id = e.src
        |       GROUP BY e.dst),
        |r1 AS (SELECT nodes.id, 1000000000000 * 15 // 100 // p.n
        |         + 85 * coalesce(s1.m, 0) // 100 AS r
        |       FROM nodes LEFT JOIN s1 USING (id), p),
        |s2 AS (SELECT e.dst AS id, sum(r1.r // d.outd) AS m
        |       FROM e JOIN deg d USING (src) JOIN r1 ON r1.id = e.src
        |       GROUP BY e.dst),
        |r2 AS (SELECT nodes.id, 1000000000000 * 15 // 100 // p.n
        |         + 85 * coalesce(s2.m, 0) // 100 AS r
        |       FROM nodes LEFT JOIN s2 USING (id), p),
        |s3 AS (SELECT e.dst AS id, sum(r2.r // d.outd) AS m
        |       FROM e JOIN deg d USING (src) JOIN r2 ON r2.id = e.src
        |       GROUP BY e.dst),
        |r3 AS (SELECT nodes.id, 1000000000000 * 15 // 100 // p.n
        |         + 85 * coalesce(s3.m, 0) // 100 AS r
        |       FROM nodes LEFT JOIN s3 USING (id), p)
        |SELECT CAST(id % 2 AS BIGINT) AS is_item,
        |  CAST(id // 2 AS BIGINT) AS node_id, CAST(r AS BIGINT) AS rank_pico
        |FROM r3 ORDER BY rank_pico DESC, is_item, node_id
        |LIMIT 50""".stripMargin
    ) { (s, d) =>
      val edges = ev(s, d).select(
        (col("user_id") * 2).as("src"),
        (get_json_object(col("props"), "$.k").cast("long") * 2 + 1)
          .as("dst"))
      graft.functions.GraphOps.pageRank(edges, iters = 3)
        .select((col("id") % 2).as("is_item"),
          expr("id div 2").as("node_id"), col("r").as("rank_pico"))
        .orderBy(col("rank_pico").desc, col("is_item"), col("node_id"))
        .limit(50)
    },

    // Sequence-model training pairs from the event log: per user, the
    // (last-3-items context, next item) examples a next-item-prediction
    // or session-LM trainer consumes — the events-to-training-examples
    // materialization step. Scale shape: filter + JSON extract map-side,
    // then ONE window shuffle keyed by user_id (millions of users -> no
    // funnel; frame is 3 lags, O(1) state per row), final global sort is
    // the gate's determinism only. event_id is the within-user order key
    // (assigned in ingestion order; using it instead of ts sidesteps
    // equal-timestamp ties). All-BIGINT output.
    Q(
      "q161_next_item_pairs",
      """WITH it AS (
        |  SELECT user_id, event_id,
        |    CAST(json_extract(props, '$.k') AS BIGINT) AS item
        |  FROM events
        |  WHERE event_type IN ('view', 'click', 'purchase')
        |    AND json_extract(props, '$.k') IS NOT NULL),
        |seq AS (
        |  SELECT user_id, event_id, item,
        |    lag(item, 1) OVER w AS c1,
        |    lag(item, 2) OVER w AS c2,
        |    lag(item, 3) OVER w AS c3
        |  FROM it WINDOW w AS (PARTITION BY user_id ORDER BY event_id))
        |SELECT user_id, event_id, c1, c2, c3, item AS target
        |FROM seq WHERE c1 IS NOT NULL
        |ORDER BY user_id, event_id""".stripMargin
    ) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("event_id")
      ev(s, d)
        .filter(col("event_type").isin("view", "click", "purchase"))
        // pre-cast null filter, matching the oracle (and q165/q171/q172):
        // filtering the post-cast value would also drop non-integer $.k
        // rows that DuckDB keeps — a silent window shift on dirty data
        .filter(get_json_object(col("props"), "$.k").isNotNull)
        .select(col("user_id"), col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("item"))
        .select(col("user_id"), col("event_id"),
          lag("item", 1).over(w).as("c1"),
          lag("item", 2).over(w).as("c2"),
          lag("item", 3).over(w).as("c3"),
          col("item").as("target"))
        .filter(col("c1").isNotNull)
        .orderBy("user_id", "event_id")
    },

    // Freshness-weighted item authority: engagement with exponential
    // time decay — the recency signal a curation pipeline uses to
    // prefer currently-relevant sources over historically-popular ones.
    // Decay is EXACT integer arithmetic: age in whole days from the
    // corpus max timestamp (floor of a microsecond difference — no
    // calendar functions, so both engines agree), weight = Q20 >> age
    // (a right shift halves per day; clamped at 20 so the shift stays
    // defined). Scale shape: one all-reduce for max(ts) broadcast back
    // as a literal-sized row, then a pure map stage + ONE partial+final
    // hash agg by item; top-50 is a TakeOrderedAndProject heap.
    Q(
      "q165_decayed_engagement",
      """WITH mx AS (SELECT max(epoch_us(ts)) AS m FROM events),
        |e AS (
        |  SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS item,
        |    least((mx.m - epoch_us(ts)) // 86400000000, 20) AS age_d,
        |    CASE event_type WHEN 'purchase' THEN 5 WHEN 'click' THEN 2
        |      WHEN 'view' THEN 1 ELSE 0 END AS base
        |  FROM events, mx
        |  WHERE json_extract(props, '$.k') IS NOT NULL)
        |SELECT item, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(base * (1048576 >> age_d)) AS BIGINT) AS decayed_q20
        |FROM e GROUP BY item
        |ORDER BY decayed_q20 DESC, item LIMIT 50""".stripMargin
    ) { (s, d) =>
      val ev0 = ev(s, d)
      val mx = ev0.agg(max(unix_micros(col("ts"))).as("m"))
      ev0.filter(get_json_object(col("props"), "$.k").isNotNull)
        .crossJoin(broadcast(mx))
        .select(
          get_json_object(col("props"), "$.k").cast("long").as("item"),
          least(expr("(m - unix_micros(ts)) div 86400000000"),
            lit(20L)).cast("int").as("age_d"),
          when(col("event_type") === "purchase", 5L)
            .when(col("event_type") === "click", 2L)
            .when(col("event_type") === "view", 1L)
            .otherwise(0L).as("base"))
        .groupBy("item")
        .agg(count(lit(1)).cast("long").as("n_events"),
          sum(col("base") * expr("shiftright(1048576L, age_d)"))
            .cast("long").as("decayed_q20"))
        .orderBy(col("decayed_q20").desc, col("item"))
        .limit(50)
    },

    // Deterministic NEGATIVE sampling for implicit-feedback training:
    // per user, 2 non-engaged items drawn by integer hash slots — the
    // (user, positive, negative) triple generator every recsys /
    // contrastive trainer needs. Rejection sampling without iteration:
    // 6 fixed hash slots per user (Knuth-mix of (user, slot) mod the
    // item universe), positives knocked out by an anti-join on
    // (user, item), first 2 surviving slots kept (slot order — replays
    // can't flip the draw). Scale (round-8 rework, was 99x at 1000x):
    // a positive can knock out a slot ONLY if it equals one of its
    // user's 6 candidate values, and the candidates are a pure function
    // of (user_id, item-universe size) — so the knock-out test runs
    // MAP-SIDE over the events scan and the anti-join's build side
    // carries just the colliding positives (observed q171_hits), not
    // the 100M-row distinct positive set. The only corpus-scale
    // exchange left is the user-id distinct (map-side partial agg);
    // the keep is a per-user window over <= 6 rows.
    Q(
      "q171_negative_sampling",
      """WITH pos AS (
        |  SELECT DISTINCT user_id,
        |    CAST(json_extract(props, '$.k') AS BIGINT) AS item
        |  FROM events WHERE json_extract(props, '$.k') IS NOT NULL),
        |ni AS (SELECT max(item) + 1 AS n FROM pos),
        |slots AS (
        |  SELECT u.user_id, s.j,
        |    ((u.user_id % 2147483647) * 2654435761 + s.j * 40503)
        |      % ni.n AS cand
        |  FROM (SELECT DISTINCT user_id FROM pos) u,
        |       (SELECT unnest(range(1, 7)) AS j) s, ni),
        |neg AS (
        |  SELECT user_id, j, cand FROM slots
        |  WHERE NOT EXISTS (SELECT 1 FROM pos p
        |    WHERE p.user_id = slots.user_id AND p.item = slots.cand)),
        |keep AS (
        |  SELECT user_id, cand, j FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id
        |      ORDER BY j) AS rk FROM neg) t WHERE rk <= 2)
        |SELECT user_id, CAST(cand AS BIGINT) AS neg_item,
        |  CAST(j AS BIGINT) AS slot
        |FROM keep ORDER BY user_id, slot""".stripMargin
    ) { (s, d) =>
      // ONE events scan: ni (broadcast scalar), the user-id distinct and
      // the knock-out filter are three consumers of this projection, and
      // the ni broadcast SERIALIZES the stages — without a barrier the
      // recompute form pays three sequential scan+JSON-parse passes
      // (measured 94.5 s vs 52.7 s at the warm 1000x replica). The
      // corpus-scale checkpoint goes DISK_ONLY per the q155 doctrine
      // (checkpoint blocks are non-evictable); the barrier costs ~1 s at
      // the sf0.01 gate — the deliberate small-SF price of the 1000x win.
      val base = ev(s, d)
        .filter(get_json_object(col("props"), "$.k").isNotNull)
        .select(col("user_id"),
          get_json_object(col("props"), "$.k").cast("long").as("item"))
        .localCheckpoint(true,
          org.apache.spark.storage.StorageLevel.DISK_ONLY)
      val ni = base.agg((max("item") + 1L).as("n"))
      // id reduced mod 2^31-1 BEFORE the Knuth mix: replica/sharded
      // user ids can exceed 2^31 and the raw product overflows int64
      // under ANSI (caught at the 1000x rehearsal); a no-op at every
      // gate SF, so outputs are unchanged there
      def cand(u: org.apache.spark.sql.Column, j: org.apache.spark.sql.Column,
          n: org.apache.spark.sql.Column) =
        ((u % 2147483647L) * 2654435761L + j * 40503L) % n
      val slots = base.select("user_id").distinct()
        .crossJoin(broadcast(ni))
        .select(col("user_id"), col("n"),
          explode(sequence(lit(1L), lit(6L))).as("j"))
        .select(col("user_id"), col("j"),
          cand(col("user_id"), col("j"), col("n")).as("cand"))
      // map-side knock-out detection: keep only the positives that equal
      // one of their user's 6 candidate slots — dedup is unnecessary
      // (anti-join semantics ignore build-side duplicates)
      val hits = base.crossJoin(broadcast(ni))
        .filter(array_contains(
          transform(sequence(lit(1L), lit(6L)),
            j => cand(col("user_id"), j, col("n"))),
          col("item")))
        .select(col("user_id"), col("item").as("cand"))
        .observe("q171_hits", count(lit(1)).as("colliding_positives"))
      // hint on the RIGHT side: an anti-join can only build right, so a
      // left-side hint is ignored (HintErrorLogger warning at 1000x)
      val neg = slots.join(hits.hint("shuffle_hash"),
        Seq("user_id", "cand"), "left_anti")
      val rk = row_number().over(
        Window.partitionBy("user_id").orderBy("j"))
      neg.withColumn("rk", rk).filter(col("rk") <= 2)
        .select(col("user_id"), col("cand").as("neg_item"),
          col("j").as("slot"))
        .orderBy("user_id", "slot")
    },

    // Item-item co-engagement similarity — the collaborative-filtering
    // precompute (items sharing audiences): per-user engaged-item sets
    // CAPPED at 32 (by engagement count desc, item asc — the bounded-
    // state rule: an uncapped power user would emit O(m²) pairs),
    // bucket-collected as a narrow long array (within the narrow-payload
    // doctrine), pair-exploded via combinations2, ONE partial+final agg
    // by pair, top-50 heap. Cap mirrored exactly in the oracle.
    Q(
      "q172_item_cooccurrence",
      """WITH ui AS (
        |  SELECT user_id, CAST(json_extract(props, '$.k') AS BIGINT)
        |    AS item, count(*) AS n
        |  FROM events WHERE json_extract(props, '$.k') IS NOT NULL
        |  GROUP BY 1, 2),
        |capped AS (
        |  SELECT user_id, item FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id
        |      ORDER BY n DESC, item) AS rk FROM ui) t WHERE rk <= 32),
        |pairs AS (
        |  SELECT a.item AS item_a, b.item AS item_b
        |  FROM capped a JOIN capped b
        |    ON a.user_id = b.user_id AND a.item < b.item)
        |SELECT item_a, item_b, CAST(count(*) AS BIGINT) AS n_users
        |FROM pairs GROUP BY 1, 2
        |ORDER BY n_users DESC, item_a, item_b LIMIT 50""".stripMargin
    ) { (s, d) =>
      val ui = ev(s, d)
        .filter(get_json_object(col("props"), "$.k").isNotNull)
        .select(col("user_id"),
          get_json_object(col("props"), "$.k").cast("long").as("item"))
        .groupBy("user_id", "item").agg(count(lit(1)).as("n"))
      val rk = row_number().over(Window.partitionBy("user_id")
        .orderBy(col("n").desc, col("item")))
      val capped = ui.withColumn("rk", rk).filter(col("rk") <= 32)
        .groupBy("user_id")
        .agg(sort_array(collect_list(col("item"))).as("items"))
      capped
        .select(explode(graft.functions.ArrayOps.combinations2(
          col("items"), fields = Seq("a", "b"))).as("p"))
        .select(col("p.a").as("item_a"), col("p.b").as("item_b"))
        // pair mass into the pair-keyed exchange — the 1000x growth
        // attribution point (output mass vs exchange constant)
        .observe("q172_pairs", count(lit(1)).as("pair_rows"))
        .groupBy("item_a", "item_b")
        .agg(count(lit(1)).cast("long").as("n_users"))
        .orderBy(col("n_users").desc, col("item_a"), col("item_b"))
        .limit(50)
    },

    // CONTEXT-WINDOW PACKING — the "fit the most recent turns in the
    // budget" step of every chat/agent training-data builder: per user,
    // events are turns (ts order, event_id tiebreak), token cost is the
    // chars/4+1 heuristic, and a REVERSE running sum (window ordered ts
    // DESC) marks the suffix that fits a 256-token context; truncation
    // is from the FRONT, as a chat template would. One window + one
    // conditional aggregate, both keyed on user_id — the window's
    // exchange doubles as the groupBy's partitioning (no second
    // shuffle). Everything integer (floor-div token costs, epoch-micros
    // timestamps), so the oracle is exact.
    Q(
      "q184_context_pack",
      """WITH t AS (
        |  SELECT user_id, event_id, ts,
        |    length(event_type || ' ' || props) // 4 + 1 AS toks
        |  FROM events),
        |c AS (
        |  SELECT *, sum(toks) OVER (PARTITION BY user_id
        |    ORDER BY ts DESC, event_id DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_turns,
        |  CAST(sum(CASE WHEN cum <= 256 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_kept,
        |  CAST(sum(CASE WHEN cum <= 256 THEN toks ELSE 0 END) AS BIGINT)
        |    AS tokens_kept,
        |  CAST(min(CASE WHEN cum <= 256 THEN event_id END) AS BIGINT)
        |    AS first_kept_event,
        |  CAST(min(CASE WHEN cum <= 256 THEN epoch_us(ts) END) AS BIGINT)
        |    AS kept_from_us
        |FROM c GROUP BY user_id ORDER BY user_id""".stripMargin
    ) { (s, d) =>
      // `div`, not `/`: Column./ on longs is DOUBLE division in Spark.
      // concat (null-PROPAGATING), not concat_ws (null-skipping): the
      // oracle's `||` nulls the whole row's token cost when either field
      // is NULL, and the Spark side must diverge identically.
      val toks = expr(
        "CAST(length(concat(event_type, ' ', props)) AS BIGINT) div 4") +
        lit(1L)
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").desc, col("event_id").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val kept = col("cum") <= 256L
      ev(s, d)
        .select(col("user_id"), col("event_id"), col("ts"), toks.as("toks"))
        .withColumn("cum", sum("toks").over(w))
        .groupBy("user_id")
        .agg(count(lit(1)).cast("long").as("n_turns"),
          sum(when(kept, 1L).otherwise(0L)).cast("long").as("n_kept"),
          sum(when(kept, col("toks")).otherwise(0L)).cast("long")
            .as("tokens_kept"),
          min(when(kept, col("event_id"))).cast("long")
            .as("first_kept_event"),
          min(when(kept, unix_micros(col("ts")))).cast("long")
            .as("kept_from_us"))
        .orderBy("user_id")
    },

    // LEAKAGE-FREE TEMPORAL SPLIT — the time-based decontamination twin
    // of q182's group split: train = events before the 80%-of-span cut,
    // eval after, and the query PROVES the leakage surface instead of
    // assuming it (items seen on BOTH sides, and how many eval events
    // they poison). All integer (epoch-micros, floor-div cut). Scale
    // shape: the cut is a 1-row aggregate broadcast back onto the
    // stream (the round-8 note applies: a broadcast scalar serializes
    // its consumer — one consumer chain here, two scans total); the
    // item-side table is one (event_type, item)-keyed aggregate whose
    // per-side counts collapse map-side; the rollup is type-keyed
    // (bounded).
    Q(
      "q190_temporal_split",
      """WITH e AS (
        |  SELECT epoch_us(ts) AS t, event_type,
        |    CAST(json_extract(props, '$.k') AS BIGINT) AS item
        |  FROM events WHERE json_extract(props, '$.k') IS NOT NULL),
        |cut AS (SELECT min(t) + (max(t) - min(t)) * 4 // 5 AS c FROM e),
        |side AS (
        |  SELECT event_type, item,
        |    sum(CASE WHEN t < (SELECT c FROM cut) THEN 1 ELSE 0 END)
        |      AS n_train,
        |    sum(CASE WHEN t >= (SELECT c FROM cut) THEN 1 ELSE 0 END)
        |      AS n_test
        |  FROM e GROUP BY 1, 2)
        |SELECT event_type,
        |  CAST(sum(n_train) AS BIGINT) AS train_events,
        |  CAST(sum(n_test) AS BIGINT) AS test_events,
        |  CAST(sum(CASE WHEN n_train > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS train_items,
        |  CAST(sum(CASE WHEN n_test > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS test_items,
        |  CAST(sum(CASE WHEN n_train > 0 AND n_test > 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS leaked_items,
        |  CAST(sum(CASE WHEN n_train > 0 AND n_test > 0 THEN n_test
        |    ELSE 0 END) AS BIGINT) AS leaked_test_events
        |FROM side GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, d) =>
      val e = ev(s, d)
        .filter(get_json_object(col("props"), "$.k").isNotNull)
        .select(unix_micros(col("ts")).as("t"), col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("item"))
        .localCheckpoint(true,
          org.apache.spark.storage.StorageLevel.DISK_ONLY)
      val cut = e.agg(
        (min("t") + expr("(max(t) - min(t)) * 4 div 5")).as("c"))
      e.crossJoin(broadcast(cut))
        .groupBy("event_type", "item")
        .agg(sum(when(col("t") < col("c"), 1L).otherwise(0L)).as("n_train"),
          sum(when(col("t") >= col("c"), 1L).otherwise(0L)).as("n_test"))
        .groupBy("event_type")
        .agg(sum("n_train").cast("long").as("train_events"),
          sum("n_test").cast("long").as("test_events"),
          sum(when(col("n_train") > 0L, 1L).otherwise(0L)).cast("long")
            .as("train_items"),
          sum(when(col("n_test") > 0L, 1L).otherwise(0L)).cast("long")
            .as("test_items"),
          sum(when(col("n_train") > 0L && col("n_test") > 0L, 1L)
            .otherwise(0L)).cast("long").as("leaked_items"),
          sum(when(col("n_train") > 0L && col("n_test") > 0L,
            col("n_test")).otherwise(0L)).cast("long")
            .as("leaked_test_events"))
        .orderBy("event_type")
    },

    // PREFERENCE-PAIR CONSTRUCTION — the RLHF/DPO data builder: per
    // user, items are scored by an integer engagement weight (purchase 3
    // > signup 2 > click 1 > view 0 > error -2), the top item becomes
    // `chosen` and the bottom `rejected` (deterministic tie-breaks on
    // item id both ways, strict margin > 0 so ties never emit), and
    // pairs aggregate across users. Scale shape: one (user, item)
    // aggregate, THREE window functions sharing one user-keyed exchange,
    // a self-join of the SAME windowed subtree (aliased twice — per the
    // exchange-reuse rule) on user_id, then a bounded pair rollup.
    Q(
      "q194_preference_pairs",
      """WITH e AS (
        |  SELECT user_id, CAST(json_extract(props, '$.k') AS BIGINT)
        |      AS item,
        |    CASE event_type WHEN 'purchase' THEN 3 WHEN 'signup' THEN 2
        |         WHEN 'click' THEN 1 WHEN 'view' THEN 0 ELSE -2 END AS w
        |  FROM events WHERE json_extract(props, '$.k') IS NOT NULL),
        |ui AS (SELECT user_id, item, sum(w) AS eng FROM e GROUP BY 1, 2),
        |rk AS (
        |  SELECT user_id, item, eng,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY eng DESC, item) AS rtop,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY eng ASC, item DESC) AS rbot,
        |    count(*) OVER (PARTITION BY user_id) AS ni
        |  FROM ui),
        |pairs AS (
        |  SELECT t.user_id, t.item AS chosen, b.item AS rejected,
        |    t.eng - b.eng AS margin
        |  FROM rk t JOIN rk b USING (user_id)
        |  WHERE t.rtop = 1 AND b.rbot = 1 AND t.ni >= 2 AND t.eng > b.eng)
        |SELECT chosen, rejected, CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(sum(margin) AS BIGINT) AS margin_sum
        |FROM pairs GROUP BY 1, 2
        |ORDER BY n_users DESC, chosen, rejected LIMIT 50""".stripMargin
    ) { (s, d) =>
      val wU = Window.partitionBy("user_id")
      val rk = ev(s, d)
        .filter(get_json_object(col("props"), "$.k").isNotNull)
        .select(col("user_id"),
          get_json_object(col("props"), "$.k").cast("long").as("item"),
          when(col("event_type") === "purchase", 3L)
            .when(col("event_type") === "signup", 2L)
            .when(col("event_type") === "click", 1L)
            .when(col("event_type") === "view", 0L)
            .otherwise(-2L).as("w"))
        .groupBy("user_id", "item")
        .agg(sum("w").as("eng"))
        .localCheckpoint(true,
          org.apache.spark.storage.StorageLevel.DISK_ONLY)
        .withColumn("rtop", row_number().over(
          wU.orderBy(col("eng").desc, col("item"))))
        .withColumn("rbot", row_number().over(
          wU.orderBy(col("eng").asc, col("item").desc)))
        .withColumn("ni", count(lit(1)).over(wU))
      rk.as("t").filter(col("rtop") === 1)
        .join(rk.as("b").filter(col("rbot") === 1 && col("ni") >= 2L),
          "user_id")
        .filter(col("t.eng") > col("b.eng"))
        .select(col("t.item").as("chosen"), col("b.item").as("rejected"),
          (col("t.eng") - col("b.eng")).as("margin"))
        .groupBy("chosen", "rejected")
        .agg(count(lit(1)).cast("long").as("n_users"),
          sum("margin").cast("long").as("margin_sum"))
        .orderBy(col("n_users").desc, col("chosen"), col("rejected"))
        .limit(50)
    },

    // CONSISTENT PSEUDONYMIZATION — the de-identification step every
    // shareable event corpus needs: user_id is replaced by a salted
    // 60-bit hash, and the query PROVES the two properties that make
    // pseudonymized data usable instead of asserting them: (a) zero
    // collisions (distinct pseudo == distinct raw per event type, plus
    // the corpus-wide delta), and (b) multiset preservation — the
    // busiest pseudonym has exactly the busiest raw user's event count
    // (a collision would merge two users and inflate it). Scale shape:
    // one event scan into a (event_type, user) two-phase aggregate; the
    // pseudonym is computed AFTER the aggregate (map stage over group
    // keys, codegen'd md5_prefix60); the second aggregate is keyed on
    // (event_type, pseudo) — user-scale, far under event mass; the
    // final rollup is event-type-bounded.
    Q(
      "q196_pseudonymize",
      """WITH uu AS (
        |  SELECT event_type, user_id, count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |up AS (
        |  SELECT event_type, c,
        |    CAST(list_sum(list_transform(range(1, 8),
        |      j -> (strpos('0123456789abcdef',
        |              substr(md5('u' || CAST(user_id AS VARCHAR)), j, 1))
        |            - 1) * 16.0 ** (7 - j))) AS BIGINT) * 4294967296
        |    + CAST(list_sum(list_transform(range(8, 16),
        |      j -> (strpos('0123456789abcdef',
        |              substr(md5('u' || CAST(user_id AS VARCHAR)), j, 1))
        |            - 1) * 16.0 ** (15 - j))) AS BIGINT) AS pseudo
        |  FROM uu),
        |pp AS (
        |  SELECT event_type, pseudo, count(*) AS n_users, sum(c) AS c_p,
        |    max(c) AS m_u
        |  FROM up GROUP BY 1, 2)
        |SELECT event_type, CAST(sum(c_p) AS BIGINT) AS n_events,
        |  CAST(sum(n_users) AS BIGINT) AS nd_raw,
        |  CAST(count(*) AS BIGINT) AS nd_pseudo,
        |  CAST(sum(n_users) - count(*) AS BIGINT) AS collisions,
        |  CAST(max(m_u) AS BIGINT) AS max_user_events,
        |  CAST(max(c_p) AS BIGINT) AS max_pseudo_events
        |FROM pp GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, d) =>
      pseudonymizeAudit(ev(s, d),
        c => call_function("md5_prefix60", concat(lit("u"), c)))
    },

    // CHAT-FORMAT LINT — conversation-shaped training data must
    // alternate roles; this validates per-user event sequences against
    // the two chat-template rules (no same-role adjacency, first turn is
    // a "user" turn) and histograms users by violation-rate decile so a
    // corpus-level format report stays bounded. Scale shape: ONE
    // user-keyed window exchange (lag), and the per-user aggregate
    // REUSES the window's partitioning (no exchange between them); the
    // decile rollup is bounded (0..10). Ties broken by event_id so the
    // sequence — and therefore the lint — is deterministic.
    Q(
      "q199_chat_lint",
      """WITH e AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN event_type IN ('click', 'view') THEN 0 ELSE 1 END
        |      AS role
        |  FROM events),
        |l AS (
        |  SELECT user_id, role,
        |    lag(role) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev
        |  FROM e),
        |u AS (
        |  SELECT user_id, count(*) AS n_turns,
        |    sum(CASE WHEN prev = role THEN 1 ELSE 0 END) AS viol,
        |    sum(CASE WHEN prev IS NULL AND role <> 0 THEN 1 ELSE 0 END)
        |      AS bad_start
        |  FROM l GROUP BY 1)
        |SELECT CAST(viol * 10 // n_turns AS BIGINT) AS viol_decile,
        |  CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(sum(n_turns) AS BIGINT) AS turns,
        |  CAST(sum(viol) AS BIGINT) AS violations,
        |  CAST(sum(bad_start) AS BIGINT) AS bad_starts
        |FROM u GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, d) =>
      ev(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          when(col("event_type").isin("click", "view"), 0L).otherwise(1L)
            .as("role"))
        .withColumn("prev", lag("role", 1).over(
          Window.partitionBy("user_id").orderBy("ts", "event_id")))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_turns"),
          sum(when(col("prev") === col("role"), 1L).otherwise(0L))
            .as("viol"),
          sum(when(col("prev").isNull && col("role") =!= 0L, 1L)
            .otherwise(0L)).as("bad_start"))
        .groupBy(expr("viol * 10 div n_turns").as("viol_decile"))
        .agg(count(lit(1)).cast("long").as("n_users"),
          sum("n_turns").cast("long").as("turns"),
          sum("viol").cast("long").as("violations"),
          sum("bad_start").cast("long").as("bad_starts"))
        .orderBy("viol_decile")
    },

    // CONTRIBUTION CAPPING — the differential-privacy prep every
    // user-event release runs BEFORE adding noise: bound each user's
    // contribution to their newest k=8 events (sensitivity control), and
    // report per-event-type what the cap clips. A heavy user (bot, test
    // account) otherwise dominates any histogram the release computes.
    // Scale shape: ONE user-keyed window exchange (the op must rank
    // every event; user groups are bounded post-cap but not pre-cap —
    // rank, don't collect); the per-type rollup collapses map-side to
    // |event_type| rows. Clipped share is ppm by integer floor division.
    Q(
      "q211_contribution_cap",
      """WITH r AS (
        |  SELECT event_type,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_pre,
        |  CAST(sum(CASE WHEN rn <= 8 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_post,
        |  CAST(((count(*) - sum(CASE WHEN rn <= 8 THEN 1 ELSE 0 END))
        |    * 1000000) // count(*) AS BIGINT) AS clipped_ppm
        |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin
    ) { (s, d) => contributionCap(ev(s, d)) },

    // FRESHNESS-DECAYED ENGAGEMENT — the time-decay weighting a
    // recency-aware sampler applies before drawing training interactions:
    // each positive-value event contributes floor(value*1000) halved per
    // 7-day age epoch (integer shift — no libm exp, no double
    // accumulation), summed per user; output is the log2 histogram of
    // user scores (length(bin(x)) is integer-exact in both engines).
    // Scale shape: the decay anchor is a memoized driver-side
    // max(unix_micros) (broadcast-scalar subqueries serialize consumer
    // stages); the weight is a pure map; the user aggregate collapses
    // map-side; the histogram exchange is |buckets|-bounded.
    Q(
      "q213_freshness",
      """WITH mx AS (SELECT max(epoch_us(ts)) AS m FROM events),
        |w AS (
        |  SELECT user_id,
        |    CAST(floor(value * 1000) AS BIGINT) //
        |      (1 << least((mx.m - epoch_us(ts)) // 604800000000, 40))
        |      AS wt
        |  FROM events, mx WHERE value IS NOT NULL AND value > 0),
        |u AS (SELECT user_id, sum(wt) AS score FROM w GROUP BY user_id)
        |SELECT CAST(length(bin(score)) AS BIGINT) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(sum(score) AS BIGINT) AS mass
        |FROM u GROUP BY 1 ORDER BY bucket""".stripMargin
    ) { (s, d) => freshnessCore(ev(s, d), maxTsMicros(s, d)) },

    // WEEKLY MIX DRIFT — the data-drift monitor a pipeline runs on its
    // ingest stream: total-variation distance (ppm) between each week's
    // event-type mix and the previous week's. Shares are independently
    // floored ppm (q220's rule), so nothing multiplies two corpus-scale
    // counts — overflow-safe at any volume. Scale shape: ONE corpus
    // exchange into the (week, type) aggregate — bounded keys, map-side
    // collapse — checkpointed (q203: the week-total/grid consumers
    // would re-plan the scan); everything downstream (grid completion,
    // lag window, TVD rollup) runs on the bounded table.
    Q(
      "q221_mix_drift",
      """WITH w AS (
        |  SELECT epoch_us(ts) // 604800000000 AS wk, event_type,
        |    count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |wt AS (SELECT wk, sum(c) AS n FROM w GROUP BY wk),
        |grid AS (
        |  SELECT wk.wk, t.event_type,
        |    coalesce(w.c, 0) * 1000000 // wt.n AS share_ppm, wt.n
        |  FROM (SELECT DISTINCT wk FROM w) wk
        |  CROSS JOIN (SELECT DISTINCT event_type FROM w) t
        |  LEFT JOIN w ON w.wk = wk.wk AND w.event_type = t.event_type
        |  JOIN wt ON wt.wk = wk.wk),
        |d AS (
        |  SELECT wk, share_ppm, n,
        |    lag(share_ppm) OVER (PARTITION BY event_type ORDER BY wk)
        |      AS prev_ppm
        |  FROM grid)
        |SELECT wk AS week, CAST(max(n) AS BIGINT) AS n_events,
        |  CAST(sum(abs(share_ppm - prev_ppm)) // 2 AS BIGINT) AS tvd_ppm
        |FROM d WHERE prev_ppm IS NOT NULL
        |GROUP BY wk ORDER BY week""".stripMargin
    ) { (s, d) => mixDriftCore(ev(s, d)) },

    // DP HISTOGRAM RELEASE — the step AFTER q211's sensitivity prep: a
    // differentially-private count release over (event_type, day-of-
    // week) cells. Each user contributes at most C=4 events per cell
    // (Σ least(c,4) — bounded sensitivity), then integer noise from the
    // cell key's 60-bit hash (pmod 13 − 6 ≈ a bounded-Laplace stand-in:
    // REAL deployments draw calibrated randomness at release time; the
    // engine-side contract — cap, noise-add, clamp-at-0 — is identical
    // and a deterministic draw keeps the gate exact), clamped ≥ 0.
    // Scale shape: ONE corpus-scale exchange on (type, dow, user) with
    // map-side collapse; the cap-sum exchange is |cells|·|users|-scale
    // → |cells|; noise/clamp are map stages over the bounded cell
    // table. dow via integer epoch-day % 7 — no timezone/libm paths.
    Q(
      "q227_dp_release",
      """WITH c AS (
        |  SELECT event_type,
        |    (epoch_us(ts) // 86400000000) % 7 AS dow, user_id,
        |    count(*) AS c
        |  FROM events GROUP BY 1, 2, 3),
        |cap AS (
        |  SELECT event_type, dow, sum(least(c, 4)) AS n_capped
        |  FROM c GROUP BY 1, 2),
        |n AS (
        |  SELECT event_type, dow, n_capped,
        |    (CAST(list_sum(list_transform(range(1, 8),
        |      j -> (strpos('0123456789abcdef',
        |              substr(md5('dp|' || event_type || '|' ||
        |                CAST(dow AS VARCHAR)), j, 1))
        |            - 1) * 16.0 ** (7 - j))) AS BIGINT) * 4294967296
        |    + CAST(list_sum(list_transform(range(8, 16),
        |      j -> (strpos('0123456789abcdef',
        |              substr(md5('dp|' || event_type || '|' ||
        |                CAST(dow AS VARCHAR)), j, 1))
        |            - 1) * 16.0 ** (15 - j))) AS BIGINT)) % 13 - 6
        |      AS noise
        |  FROM cap)
        |SELECT event_type, CAST(dow AS BIGINT) AS dow,
        |  CAST(n_capped AS BIGINT) AS n_capped,
        |  CAST(noise AS BIGINT) AS noise,
        |  CAST(greatest(n_capped + noise, 0) AS BIGINT) AS released
        |FROM n ORDER BY event_type, dow""".stripMargin
    ) { (s, d) => dpReleaseCore(ev(s, d)) },

    // JOIN-KEY SKEW AUDIT — the pre-flight a 100 TB join runs before
    // choosing salting/AQE-skew handling: the per-key cardinality
    // profile of the join key (user_id), as a log2-bucket histogram
    // plus the exact Gini coefficient of key mass. Gini WITHOUT a
    // global per-user sort: users are grouped by their count c first
    // (≤ max-events-per-user distinct values), and a run of m users
    // with equal c at ranks below+1..below+m contributes
    // c·(m·below + m(m+1)/2) to Σ rank·mass — tie order within a run
    // cannot matter, so the statistic is deterministic AND the rank
    // window runs over the tiny (c, m) table, not the user table.
    // Scale shape: one corpus exchange (user counts, map-side
    // collapse), one user-scale exchange into the ≤|distinct-c| hist
    // (checkpointed once for its three consumers — q203 rule); the
    // window, totals and buckets are all bounded-table stages. Integer
    // envelope: the ppm scaling runs as base-100 staged long division
    // (see keySkewCore) so no intermediate exceeds 100·n·S — exact
    // through n·S ≤ 9.2e16 (e.g. 1e8 users × 1e9 events); beyond that,
    // pre-bucket c to log2 first.
    Q(
      "q229_key_skew",
      """WITH cnt AS (SELECT user_id, count(*) AS c
        |  FROM events GROUP BY 1),
        |hist AS (SELECT c, count(*) AS m FROM cnt GROUP BY c),
        |cum AS (
        |  SELECT c, m, coalesce(sum(m) OVER (ORDER BY c
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS below
        |  FROM hist),
        |t AS (
        |  SELECT sum(c * (m * below + (m * (m + 1)) // 2)) AS sic,
        |    sum(c * m) AS s, sum(m) AS n
        |  FROM cum),
        |g AS (SELECT CAST((2 * sic - (n + 1) * s) * 1000000 // (n * s)
        |    AS BIGINT) AS gini_ppm FROM t),
        |b AS (SELECT length(bin(c)) AS bucket, sum(m) AS n_users,
        |        sum(c * m) AS n_events
        |      FROM hist GROUP BY 1)
        |SELECT CAST(bucket AS BIGINT) AS bucket,
        |  CAST(n_users AS BIGINT) AS n_users,
        |  CAST(n_events AS BIGINT) AS n_events, g.gini_ppm
        |FROM b, g ORDER BY bucket""".stripMargin
    ) { (s, d) => keySkewCore(ev(s, d), "user_id") },

    // ENGAGEMENT DIVERSITY — bot/spam accounts and scrapers hammer one
    // event type; engaged humans spread across them. Per-user
    // Gini–Simpson diversity 1 − Σ pᵢ² — the RATIONAL diversity index
    // (Shannon entropy needs libm logs; Simpson is exact in integers:
    // ppm = 1e6 − s2·1e6 div n²) — histogrammed by decile so the
    // output stays 10-row bounded. The diversity-decile profile feeds
    // the q153-style engagement selectors. Scale shape: one corpus
    // exchange into (user, type) counts with map-side collapse; the
    // per-user rollup is user-scale; the decile rollup is bounded.
    // Overflow: s2 ≤ n², so s2·1e6 is exact while n ≤ 3e6 events per
    // user — a per-user bound, not a corpus bound.
    Q(
      "q231_simpson_diversity",
      """WITH c AS (
        |  SELECT user_id, event_type, count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |u AS (SELECT user_id, sum(c) AS n, sum(c * c) AS s2
        |      FROM c GROUP BY 1),
        |p AS (SELECT user_id, n,
        |        1000000 - (s2 * 1000000 // (n * n)) AS ppm
        |      FROM u)
        |SELECT CAST(ppm // 100000 AS BIGINT) AS decile,
        |  CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(sum(n) AS BIGINT) AS n_events
        |FROM p GROUP BY 1 ORDER BY decile""".stripMargin
    ) { (s, d) => simpsonDiversityCore(ev(s, d)) },

    // BURSTINESS AUDIT — scrapers and incident storms arrive in bursts;
    // organic traffic is ~Poisson. Per (user, event_type): the Fano
    // factor (variance/mean) of HOURLY event counts over that stream's
    // own active span (zero hours included via the span length — the
    // all-in-one-hour bot and the steady human separate cleanly;
    // Poisson ⇒ Fano ≈ 1). Integer-exact: with hh = span hours,
    // n = Σc, ss = Σc², Fano·1e6 = (hh·ss − n²)·1e6 / (n·hh), and
    // Cauchy–Schwarz over the hh hour slots gives hh·ss ≥ n², so every
    // operand is non-negative and Spark's truncating div == DuckDB's
    // flooring //. The ppm runs as base-100 staged long division (q229
    // pattern): no intermediate exceeds 100·n·hh, so the envelope is
    // n·hh ≤ 9.2e16 per user-type stream (e.g. 1e10 events over 1e4
    // hours) — never the corpus. Scale shape: one corpus exchange into
    // (user, type, hour) counts with map-side collapse, then
    // user-scale and bounded rollups; output is |types| × ~10 buckets.
    Q(
      "q242_burstiness",
      """WITH hc AS (
        |  SELECT user_id, event_type, epoch_us(ts) // 3600000000 AS hr,
        |         count(*) AS c
        |  FROM events GROUP BY 1, 2, 3),
        |u AS (
        |  SELECT user_id, event_type, max(hr) - min(hr) + 1 AS hh,
        |    sum(c) AS n, sum(c * c) AS ss
        |  FROM hc GROUP BY 1, 2),
        |f AS (SELECT event_type, n, hh * ss - n * n AS nn, n * hh AS dd
        |      FROM u),
        |s1 AS (SELECT event_type, n, nn // dd AS q1, nn % dd AS r1, dd
        |       FROM f),
        |s2 AS (SELECT event_type, n, q1, (r1 * 100) // dd AS q2,
        |         (r1 * 100) % dd AS r2, dd FROM s1),
        |s3 AS (SELECT event_type, n, q1, q2, (r2 * 100) // dd AS q3,
        |         (r2 * 100) % dd AS r3, dd FROM s2),
        |fano AS (SELECT event_type, n,
        |    q1 * 1000000 + q2 * 10000 + q3 * 100 + (r3 * 100) // dd AS fp
        |  FROM s3)
        |SELECT event_type, CAST(fp // 50000 AS BIGINT) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_user_types,
        |  CAST(sum(n) AS BIGINT) AS n_events,
        |  CAST(sum(fp) AS BIGINT) AS fano_sum
        |FROM fano GROUP BY 1, 2 ORDER BY event_type, bucket""".stripMargin
    ) { (s, d) => burstinessCore(ev(s, d)) },

    // CUSUM CHANGEPOINT — the drift MONITOR behind q221's weekly mix
    // gauge: for each event type, locate WHERE the daily rate shifted.
    // Classic CUSUM S_t = Σ_{i≤t}(c_i − mean) maximized over t; kept
    // integer-exact by scaling through the day count: S_t·D = D·P_t −
    // t·T (P = prefix sum, T = total, D = span days — gap days count
    // as zeros via the day spine, q140 pattern). The peak |S·D| day is
    // the changepoint; ties break to the earliest day; direction is
    // the sign at the peak (rate fell then rose ⇒ +). cusum_ppm =
    // ⌊1e6·|S·D| / (D·T)⌋ ≤ 1e6 since |S·D| ≤ D·T; operands stay under
    // 1e6·D·T ≤ 9.2e18 through T ≤ 2.5e8 events/type at a year span.
    // Scale shape: ONE corpus exchange into (type, day) counts with
    // map-side collapse (the spine join, windows, and argmax all run
    // on the ≤ |types|·|days| table, checkpointed once for its three
    // consumers — q203 rule).
    Q(
      "q243_cusum_changepoint",
      """WITH e AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day
        |           FROM events),
        |dc0 AS (SELECT event_type, day, count(*) AS c FROM e GROUP BY 1, 2),
        |span AS (SELECT event_type, min(day) AS d0, max(day) AS d1
        |         FROM dc0 GROUP BY 1),
        |spine AS (
        |  SELECT s.event_type, g.day
        |  FROM span s, unnest(range(s.d0, s.d1 + 1)) g(day)),
        |dc AS (
        |  SELECT s.event_type, s.day, CAST(coalesce(dc0.c, 0) AS BIGINT) AS c
        |  FROM spine s LEFT JOIN dc0
        |    ON dc0.event_type = s.event_type AND dc0.day = s.day),
        |tot AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS tt,
        |          CAST(count(*) AS BIGINT) AS dd FROM dc GROUP BY 1),
        |pre AS (SELECT dc.event_type,
        |    row_number() OVER (PARTITION BY dc.event_type
        |                       ORDER BY dc.day) AS t,
        |    CAST(sum(dc.c) OVER (PARTITION BY dc.event_type
        |                         ORDER BY dc.day) AS BIGINT) AS p,
        |    tot.tt, tot.dd
        |  FROM dc JOIN tot USING (event_type)),
        |sc AS (SELECT event_type, t, tt, dd, dd * p - t * tt AS sd
        |       FROM pre),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |    ORDER BY abs(sd) DESC, t) AS r FROM sc)
        |SELECT event_type, dd AS n_days, tt AS total,
        |  CAST(t AS BIGINT) AS t_star,
        |  CAST(CASE WHEN sd >= 0 THEN 1 ELSE -1 END AS BIGINT) AS direction,
        |  CAST(abs(sd) * 1000000 // (dd * tt) AS BIGINT) AS cusum_ppm
        |FROM rk WHERE r = 1 ORDER BY event_type""".stripMargin
    ) { (s, d) => cusumChangepointCore(ev(s, d)) },

    // HASH-PERMUTATION A/B TEST — before trusting an online experiment
    // readout at 100 TB, the pipeline needs a p-value it can compute
    // WITHOUT floats or RNG state: the observed assignment (user parity)
    // is compared against 256 deterministic hash-drawn reassignments of
    // the same users; p = share of permuted |T| ≥ |T_obs| where T is
    // the signed per-user metric sum. All 256 lanes ride ONE fused
    // Aggregator buffer (PermLanesAgg — the GramAgg rule: a per-row
    // O(k) expansion into a |types|-cardinality aggregate never
    // explodes) fused with the observed statistic in the SAME groupBy,
    // so the whole test is one corpus exchange into (user, type)
    // counts plus one user-scale pass. Null data ⇒ p ≈ uniform (the
    // synthetic corpus reads 0.5–0.97 — correct null behavior).
    Q(
      "q248_ab_permutation",
      """WITH m AS (
        |  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS m
        |  FROM events GROUP BY 1, 2),
        |hu AS (SELECT user_id, event_type, m,
        |  CAST(list_sum(list_transform(range(1, 9),
        |    j -> (strpos('0123456789abcdef',
        |            substr(md5('ab|' || CAST(user_id AS VARCHAR)), j, 1))
        |          - 1) * 16.0 ** (8 - j))) AS BIGINT) AS h
        |  FROM m),
        |obs AS (
        |  SELECT event_type,
        |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN m ELSE -m END)
        |      AS BIGINT) AS t_obs,
        |    CAST(count(*) AS BIGINT) AS n_users
        |  FROM hu GROUP BY 1),
        |lanes AS (
        |  SELECT event_type, k.k,
        |    CAST(sum(CASE WHEN ((h * (2 * k.k + 3)) % 1000003) % 2 = 0
        |      THEN m ELSE -m END) AS BIGINT) AS t
        |  FROM hu, (SELECT unnest(range(256)) AS k) k
        |  GROUP BY 1, 2),
        |p AS (
        |  SELECT l.event_type,
        |    CAST(sum(CASE WHEN abs(l.t) >= abs(o.t_obs) THEN 1 ELSE 0 END)
        |      AS BIGINT) AS cnt
        |  FROM lanes l JOIN obs o USING (event_type) GROUP BY 1)
        |SELECT o.event_type, o.n_users, o.t_obs,
        |  CAST((p.cnt * 1000000) // 256 AS BIGINT) AS p_ppm
        |FROM obs o JOIN p ON p.event_type = o.event_type
        |ORDER BY o.event_type""".stripMargin
    ) { (s, d) => abPermutationCore(ev(s, d)) },

    // TOUCH ATTRIBUTION — which touchpoint gets credit for a purchase:
    // the user's latest (last-touch) and earliest (first-touch)
    // click/view in the 24 h before each purchase, counted per touch
    // type. The lookup is a RANGE-frame window over each user's
    // timeline (one corpus exchange by user — never a self-join of
    // events to events, which would be corpus × corpus at 100 TB);
    // the touch rides an integer us·8+code encoding so max/min pick
    // latest/earliest with a deterministic type tie-break at equal
    // timestamps (code 2 = view over 1 = click), exact in both
    // engines (us·8 ≤ 1.4e17 < 2^63 through year 5138).
    Q(
      "q249_attribution",
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us
        |           FROM events),
        |w AS (
        |  SELECT user_id, event_type, us,
        |    max(CASE WHEN event_type IN ('click', 'view')
        |        THEN us * 8 + CASE event_type WHEN 'click' THEN 1
        |          ELSE 2 END END)
        |      OVER (PARTITION BY user_id ORDER BY us
        |            RANGE BETWEEN 86400000000 PRECEDING AND 1 PRECEDING)
        |      AS lt,
        |    min(CASE WHEN event_type IN ('click', 'view')
        |        THEN us * 8 + CASE event_type WHEN 'click' THEN 1
        |          ELSE 2 END END)
        |      OVER (PARTITION BY user_id ORDER BY us
        |            RANGE BETWEEN 86400000000 PRECEDING AND 1 PRECEDING)
        |      AS ft
        |  FROM e),
        |p AS (SELECT * FROM w WHERE event_type = 'purchase'),
        |lab AS (
        |  SELECT
        |    CASE WHEN lt IS NULL THEN 'none'
        |         WHEN lt % 8 = 1 THEN 'click' ELSE 'view' END AS lastt,
        |    CASE WHEN ft IS NULL THEN 'none'
        |         WHEN ft % 8 = 1 THEN 'click' ELSE 'view' END AS firstt
        |  FROM p)
        |SELECT kind, touch, CAST(count(*) AS BIGINT) AS n FROM (
        |  SELECT 'first' AS kind, firstt AS touch FROM lab
        |  UNION ALL SELECT 'last', lastt FROM lab) t
        |GROUP BY 1, 2 ORDER BY kind, touch""".stripMargin
    ) { (s, d) => attributionCore(ev(s, d)) },

    // DELETION AUDIT (right-to-be-forgotten) — when a 100 TB store
    // serves a deletion request, recomputing every aggregate from
    // scratch is unaffordable; the ledger subtracts the forget-set's
    // deltas instead (q173's increment algebra, applied to deletes).
    // This audit runs BOTH paths — stored totals minus forget-side
    // deltas, and a direct aggregate over the kept rows — and emits
    // their differences, which must be identically zero (count, cent
    // mass, distinct users — users subtract cleanly because the
    // forget set is an exact user split). Scale shape: ONE corpus
    // exchange into (type, user) grain (forget is a per-user hash
    // bit), checkpointed for the two derivations; values enter as
    // floor(value·100) cents so every sum is integer-exact.
    Q(
      "q250_deletion_audit",
      """WITH e AS (SELECT event_type, user_id,
        |    CAST(floor(value * 100) AS BIGINT) AS cents,
        |    CAST(list_sum(list_transform(range(1, 9),
        |      j -> (strpos('0123456789abcdef',
        |              substr(md5('del|' || CAST(user_id AS VARCHAR)), j, 1))
        |            - 1) * 16.0 ** (8 - j))) AS BIGINT) % 16 = 0 AS forget
        |  FROM events),
        |per AS (SELECT event_type, user_id, forget,
        |    CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS c
        |  FROM e GROUP BY 1, 2, 3),
        |tot AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS n,
        |    CAST(sum(c) AS BIGINT) AS c, CAST(count(*) AS BIGINT) AS u
        |  FROM per GROUP BY 1),
        |del AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS n,
        |    CAST(sum(c) AS BIGINT) AS c, CAST(count(*) AS BIGINT) AS u
        |  FROM per WHERE forget GROUP BY 1),
        |inc AS (SELECT t.event_type, t.n - coalesce(d.n, 0) AS n_inc,
        |    t.c - coalesce(d.c, 0) AS c_inc, t.u - coalesce(d.u, 0) AS u_inc,
        |    coalesce(d.n, 0) AS n_forgotten
        |  FROM tot t LEFT JOIN del d USING (event_type)),
        |dir AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS n_dir,
        |    CAST(sum(c) AS BIGINT) AS c_dir, CAST(count(*) AS BIGINT) AS u_dir
        |  FROM per WHERE NOT forget GROUP BY 1)
        |SELECT i.event_type, CAST(i.n_inc AS BIGINT) AS n_kept,
        |  CAST(i.c_inc AS BIGINT) AS cents_kept,
        |  CAST(i.u_inc AS BIGINT) AS users_kept,
        |  CAST(i.n_inc - b.n_dir AS BIGINT) AS n_diff,
        |  CAST(i.c_inc - b.c_dir AS BIGINT) AS c_diff,
        |  CAST(i.u_inc - b.u_dir AS BIGINT) AS u_diff,
        |  CAST(i.n_forgotten AS BIGINT) AS n_forgotten
        |FROM inc i JOIN dir b USING (event_type)
        |ORDER BY i.event_type""".stripMargin
    ) { (s, d) => deletionAuditCore(ev(s, d)) },

    // SEASONALITY PROFILE — the capacity-planning monitor: per event
    // type, the peak (day-of-week, hour) cell of the 7×24 occupancy
    // grid (ties break to the earliest cell), its share of the type's
    // mass, and the weekend share (dow offset +3 puts Saturday/Sunday
    // at 5/6 — epoch day 0 was a Thursday). One corpus exchange into
    // ≤ |types|·168 cells (map-side collapse), everything after is
    // bounded-table work. Integer envelope: cell·1e6 exact through
    // 9.2e12 events per cell — a per-cell bound no real corpus hits.
    Q(
      "q251_seasonality",
      """WITH c AS (
        |  SELECT event_type,
        |    (epoch_us(ts) // 86400000000 + 3) % 7 AS dow,
        |    (epoch_us(ts) % 86400000000) // 3600000000 AS hr,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2, 3),
        |tot AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS t,
        |    CAST(sum(CASE WHEN dow >= 5 THEN n ELSE 0 END) AS BIGINT)
        |      AS wknd
        |  FROM c GROUP BY 1),
        |pk AS (SELECT event_type, dow, hr, n,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY n DESC, dow, hr) AS r
        |  FROM c)
        |SELECT p.event_type, CAST(p.dow AS BIGINT) AS peak_dow,
        |  CAST(p.hr AS BIGINT) AS peak_hr,
        |  CAST(p.n * 1000000 // t.t AS BIGINT) AS peak_ppm,
        |  CAST(t.wknd * 1000000 // t.t AS BIGINT) AS weekend_ppm
        |FROM pk p JOIN tot t USING (event_type) WHERE p.r = 1
        |ORDER BY p.event_type""".stripMargin
    ) { (s, d) => seasonalityCore(ev(s, d)) },

    // VALUE-QUANTILE DRIFT — metric pipelines break silently when the
    // VALUE distribution moves even while counts stay flat. Per week:
    // exact type-1 quantiles (p25/p50/p75) of the cent-quantized value
    // off the value HISTOGRAM (the q234 rule — quantiles ride a
    // (week, value) count table, never a per-row sort), then the
    // largest week-over-week jump per quantile and the week it
    // happened. Integer-exact: q_p = min v with 100·cum ≥ p·n — no
    // interpolation, both engines floor identically. Scale shape: ONE
    // corpus exchange into the (week, cents) histogram with map-side
    // collapse; the cumulative window runs per week over ≤ |distinct
    // cents| rows; everything after is |weeks|·3 rows.
    Q(
      "q256_value_quantile_drift",
      """WITH e AS (SELECT epoch_us(ts) // 604800000000 AS wk,
        |             CAST(floor(value * 100) AS BIGINT) AS v FROM events),
        |h AS (SELECT wk, v, CAST(count(*) AS BIGINT) AS c
        |      FROM e GROUP BY 1, 2),
        |n AS (SELECT wk, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY 1),
        |cum AS (SELECT h.wk, h.v,
        |          CAST(sum(h.c) OVER (PARTITION BY h.wk ORDER BY h.v)
        |            AS BIGINT) AS cc, n.n
        |        FROM h JOIN n USING (wk)),
        |qs AS (SELECT wk, p.p,
        |    min(CASE WHEN cc * 100 >= p.p * n THEN v END) AS q
        |  FROM cum, (SELECT unnest([25, 50, 75]) AS p) p
        |  GROUP BY 1, 2),
        |dr AS (SELECT p, wk, q,
        |    q - lag(q) OVER (PARTITION BY p ORDER BY wk) AS d
        |  FROM qs),
        |mx AS (SELECT p, CAST(max(abs(d)) AS BIGINT) AS max_drift
        |       FROM dr WHERE d IS NOT NULL GROUP BY p),
        |am AS (SELECT p, wk,
        |    row_number() OVER (PARTITION BY p
        |      ORDER BY abs(d) DESC, wk) AS r
        |  FROM dr WHERE d IS NOT NULL)
        |SELECT CAST(m.p AS BIGINT) AS pct, m.max_drift,
        |  CAST(a.wk AS BIGINT) AS peak_week
        |FROM mx m JOIN am a ON a.p = m.p AND a.r = 1
        |ORDER BY pct""".stripMargin
    ) { (s, d) => quantileDriftCore(ev(s, d)) }
  )

  /** q256 core over any (ts, value) frame. Factored for crafted drift
    * laws (identical weeks drift 0; one shifted week drifts exactly the
    * planted offset at every quantile, peaking at that week). */
  private[graft] def quantileDriftCore(
      e: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val h = e.select(expr("unix_micros(ts) div 604800000000").as("wk"),
        expr("cast(floor(value * 100) as bigint)").as("v"))
      .groupBy("wk", "v").agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // histogram-scale; cum + n consumers
    val n = h.groupBy("wk").agg(sum("c").as("n"))
    val wc = Window.partitionBy("wk").orderBy("v")
    val cum = h.withColumn("cc", sum("c").over(wc))
      .join(broadcast(n), "wk")
    val qs = cum
      .withColumn("p", explode(typedLit(Seq(25L, 50L, 75L))))
      .groupBy("wk", "p")
      .agg(min(when(col("cc") * 100 >= col("p") * col("n"), col("v")))
        .as("q"))
    val wd = Window.partitionBy("p").orderBy("wk")
    val dr = qs.withColumn("d", col("q") - lag("q", 1).over(wd))
      .filter(col("d").isNotNull)
    val wr = Window.partitionBy("p").orderBy(abs(col("d")).desc, col("wk"))
    dr.withColumn("r", row_number().over(wr)).filter(col("r") === 1)
      .select(col("p").cast("long").as("pct"),
        abs(col("d")).cast("long").as("max_drift"),
        col("wk").cast("long").as("peak_week"))
      .orderBy("pct")
  }

  /** q248 core over any (ts?, user_id, event_type) frame (ts unused).
    * Factored for crafted test laws (a planted uniform effect drives
    * p to 0; a null metric keeps every lane at |T| = |T_obs|). */
  private[graft] def abPermutationCore(
      e: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import graft.functions.Aggregators
    val m = e.groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("m"))
      .withColumn("h", call_function("md5_prefix64",
        concat(lit("ab|"), col("user_id").cast("string"))))
    val perm = udaf(new Aggregators.PermLanesAgg(256),
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[(Long, Long)]())
    m.groupBy("event_type")
      .agg(count(lit(1)).cast("long").as("n_users"),
        sum(when(pmod(col("user_id"), lit(2)) === 0, col("m"))
          .otherwise(-col("m"))).cast("long").as("t_obs"),
        perm(col("h"), col("m")).as("ts"))
      .withColumn("cnt", size(filter(col("ts"),
        t => abs(t) >= abs(col("t_obs")))).cast("long"))
      .selectExpr("event_type", "n_users", "t_obs",
        "(cnt * 1000000) div 256 as p_ppm")
      .orderBy("event_type")
  }

  /** q249 core over any (ts, user_id, event_type) frame. Factored for
    * crafted attribution laws (a purchase 25 h after the only click is
    * 'none'; view-then-click splits first vs last). */
  private[graft] def attributionCore(
      e: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val enc = when(col("event_type").isin("click", "view"),
      unix_micros(col("ts")) * 8 +
        when(col("event_type") === "click", 1L).otherwise(2L))
    val w = Window.partitionBy("user_id").orderBy(col("us"))
      .rangeBetween(-86400000000L, -1L)
    def decode(c: org.apache.spark.sql.Column) =
      when(c.isNull, "none")
        .when(pmod(c, lit(8)) === 1, "click").otherwise("view")
    e.select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), enc.as("tk"))
      .withColumn("lt", max("tk").over(w))
      .withColumn("ft", min("tk").over(w))
      .filter(col("event_type") === "purchase")
      .select(decode(col("ft")).as("firstt"), decode(col("lt")).as("lastt"))
      .selectExpr("stack(2, 'first', firstt, 'last', lastt)" +
        " as (kind, touch)")
      .groupBy("kind", "touch")
      .agg(count(lit(1)).cast("long").as("n"))
      .orderBy("kind", "touch")
  }

  /** q250 core over any (event_type, user_id, value) frame. Factored
    * for crafted ledger laws (deleting one user's rows must zero every
    * diff and decrement the distinct-user lane by exactly 1). */
  private[graft] def deletionAuditCore(
      e: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val per = e.select(col("event_type"), col("user_id"),
        expr("cast(floor(value * 100) as bigint)").as("cents"),
        (pmod(call_function("md5_prefix64",
          concat(lit("del|"), col("user_id").cast("string"))),
          lit(16)) === 0).as("forget"))
      .groupBy("event_type", "user_id", "forget")
      .agg(count(lit(1)).as("n"), sum("cents").as("c"))
      .localCheckpoint(true) // user-scale; ledger + direct consumers
    val tot = per.groupBy("event_type")
      .agg(sum("n").as("tn"), sum("c").as("tc"),
        count(lit(1)).as("tu"))
    val del = per.filter(col("forget")).groupBy("event_type")
      .agg(sum("n").as("dn"), sum("c").as("dc"), count(lit(1)).as("du"))
    val dir = per.filter(!col("forget")).groupBy("event_type")
      .agg(sum("n").as("n_dir"), sum("c").as("c_dir"),
        count(lit(1)).as("u_dir"))
    tot.join(del, Seq("event_type"), "left")
      .select(col("event_type"),
        (col("tn") - coalesce(col("dn"), lit(0L))).as("n_inc"),
        (col("tc") - coalesce(col("dc"), lit(0L))).as("c_inc"),
        (col("tu") - coalesce(col("du"), lit(0L))).as("u_inc"),
        coalesce(col("dn"), lit(0L)).as("n_forgotten"))
      .join(dir, "event_type")
      .selectExpr("event_type", "cast(n_inc as long) as n_kept",
        "cast(c_inc as long) as cents_kept",
        "cast(u_inc as long) as users_kept",
        "cast(n_inc - n_dir as long) as n_diff",
        "cast(c_inc - c_dir as long) as c_diff",
        "cast(u_inc - u_dir as long) as u_diff",
        "cast(n_forgotten as long) as n_forgotten")
      .orderBy("event_type")
  }

  /** q251 core over any (ts, event_type) frame. Factored for crafted
    * seasonality laws (a single-cell stream peaks at that cell with
    * ppm 1e6; a Saturday-only stream has weekend_ppm 1e6). */
  private[graft] def seasonalityCore(
      e: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val c = e.groupBy(col("event_type"),
        expr("pmod(unix_micros(ts) div 86400000000 + 3, 7)").as("dow"),
        expr("pmod(unix_micros(ts), 86400000000) div 3600000000")
          .as("hr"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // ≤ |types|·168 rows; two consumers
    val tot = c.groupBy("event_type")
      .agg(sum("n").as("t"),
        sum(when(col("dow") >= 5, col("n")).otherwise(0L)).as("wknd"))
    val wr = Window.partitionBy("event_type")
      .orderBy(col("n").desc, col("dow"), col("hr"))
    c.withColumn("r", row_number().over(wr)).filter(col("r") === 1)
      .join(broadcast(tot), "event_type")
      .select(col("event_type"), col("dow").cast("long").as("peak_dow"),
        col("hr").cast("long").as("peak_hr"),
        expr("n * 1000000 div t").as("peak_ppm"),
        expr("wknd * 1000000 div t").as("weekend_ppm"))
      .orderBy("event_type")
  }

  /** q242 core over any (ts, user_id, event_type) frame. Factored for
    * crafted burst laws (a one-hour burst over an hh-hour span has the
    * closed-form Fano n·(hh−1)/hh; a one-event-per-hour stream has 0). */
  private[graft] def burstinessCore(
      e: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    e.groupBy(col("user_id"), col("event_type"),
        expr("unix_micros(ts) div 3600000000").as("hr"))
      .agg(count(lit(1)).as("c"))
      .groupBy("user_id", "event_type")
      .agg((max("hr") - min("hr") + lit(1L)).as("hh"),
        sum("c").as("n"), sum(col("c") * col("c")).as("ss"))
      .selectExpr("event_type", "n", "hh * ss - n * n as nn",
        "n * hh as dd")
      .selectExpr("event_type", "n", "nn div dd as q1",
        "pmod(nn, dd) as r1", "dd")
      .selectExpr("event_type", "n", "q1", "(r1 * 100) div dd as q2",
        "pmod(r1 * 100, dd) as r2", "dd")
      .selectExpr("event_type", "n", "q1", "q2",
        "(r2 * 100) div dd as q3", "pmod(r2 * 100, dd) as r3", "dd")
      .selectExpr("event_type", "n",
        "q1 * 1000000 + q2 * 10000 + q3 * 100 + (r3 * 100) div dd as fp")
      .groupBy(col("event_type"),
        expr("fp div 50000").cast("long").as("bucket"))
      .agg(count(lit(1)).cast("long").as("n_user_types"),
        sum("n").cast("long").as("n_events"),
        sum("fp").cast("long").as("fano_sum"))
      .orderBy("event_type", "bucket")

  /** q243 core over any (ts, event_type) frame. Factored for crafted
    * changepoint laws (a constant daily rate has S_t ≡ 0 everywhere so
    * the argmax tie-breaks to day 1 with ppm 0; a planted step in the
    * rate peaks |S| exactly at the step day). */
  private[graft] def cusumChangepointCore(
      e: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val dc0 = e
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // tiny (types × active days); 3 consumers
    // per-TYPE day span (matches the streaming twin cusumStream, whose
    // keyed state can only see its own type's history): each type's
    // spine runs over its own observed first..last day, gaps as zeros
    val spine = dc0.groupBy("event_type")
      .agg(min("day").as("d0"), max("day").as("d1"))
      .select(col("event_type"),
        explode(sequence(col("d0"), col("d1"))).as("day"))
    val dc = spine.join(dc0, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        coalesce(col("c"), lit(0L)).as("c"))
    val tot = dc.groupBy("event_type")
      .agg(sum("c").as("tt"), count(lit(1)).as("dd"))
    val wv = Window.partitionBy("event_type").orderBy("day")
    val wr = Window.partitionBy("event_type")
      .orderBy(abs(col("sd")).desc, col("t").asc)
    dc.withColumn("t", row_number().over(wv).cast("long"))
      .withColumn("p", sum("c").over(wv))
      .join(broadcast(tot), "event_type")
      .withColumn("sd", col("dd") * col("p") - col("t") * col("tt"))
      .withColumn("r", row_number().over(wr))
      .filter(col("r") === 1)
      .select(col("event_type"), col("dd").as("n_days"),
        col("tt").as("total"), col("t").as("t_star"),
        when(col("sd") >= 0, 1L).otherwise(-1L).as("direction"),
        expr("abs(sd) * 1000000 div (dd * tt)").as("cusum_ppm"))
      .orderBy("event_type")
  }

  /** q231 core over any (user_id, event_type) frame. Factored for
    * crafted diversity laws (single-type user → 0; uniform k-type user
    * → 1e6·(k−1)/k floored). */
  private[graft] def simpsonDiversityCore(
      e: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    e.groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
      .groupBy("user_id")
      .agg(sum("c").as("n"), sum(col("c") * col("c")).as("s2"))
      .selectExpr("n", "1000000 - (s2 * 1000000 div (n * n)) as ppm")
      .groupBy(expr("ppm div 100000").cast("long").as("decile"))
      .agg(count(lit(1)).cast("long").as("n_users"),
        sum("n").cast("long").as("n_events"))
      .orderBy("decile")

  /** q229 core over any frame and key column. Factored for crafted
    * distribution laws (uniform keys → Gini 0; one dominant key →
    * Gini → 1). */
  private[graft] def keySkewCore(
      e: org.apache.spark.sql.DataFrame, key: String)
      : org.apache.spark.sql.DataFrame = {
    val hist = e.groupBy(key).agg(count(lit(1)).as("c"))
      .groupBy("c").agg(count(lit(1)).as("m"))
      .localCheckpoint(true) // tiny; three consumers (q203 rule)
    val w = Window.orderBy("c") // ≤ |distinct-c| rows
      .rowsBetween(Window.unboundedPreceding, -1)
    val tot = hist
      .withColumn("below", coalesce(sum("m").over(w), lit(0L)))
      .agg(
        sum(col("c") * (col("m") * col("below") +
          expr("(m * (m + 1)) div 2"))).as("sic"),
        sum(col("c") * col("m")).as("s"), sum("m").as("n"))
      // floor(N·1e6 / D) via base-100 long division: the oracle's
      // HUGEINT computes N*1000000 exactly, but in Long that product
      // wraps once N = 2·sic−(n+1)·s exceeds ~9.2e12 (the 1000x replica
      // is ~1.5e14 — silent wrong answer). Staged quotient/remainder
      // never forms the product: each step multiplies a remainder < D
      // by 100, so the envelope is D = n·s ≤ 9.2e16 (~1e8 users x 1e9
      // events, or 1e7 x 1e10); beyond that, pre-bucket c to log2
      // first. All operands non-negative (Gini numerator of an
      // ascending-rank sum ≥ 0; remainders via pmod), so Spark's
      // truncating div == DuckDB's flooring // at every step.
      .selectExpr("sic * 2 - (n + 1) * s as nn", "n * s as dd")
      .selectExpr("nn div dd as q1", "pmod(nn, dd) as r1", "dd")
      .selectExpr("q1", "(r1 * 100) div dd as q2",
        "pmod(r1 * 100, dd) as r2", "dd")
      .selectExpr("q1", "q2", "(r2 * 100) div dd as q3",
        "pmod(r2 * 100, dd) as r3", "dd")
      .selectExpr("cast(q1 * 1000000 + q2 * 10000 + q3 * 100 +" +
        " (r3 * 100) div dd as long) as gini_ppm")
    hist.groupBy(length(bin(col("c"))).cast("long").as("bucket"))
      .agg(sum("m").cast("long").as("n_users"),
        sum(col("c") * col("m")).cast("long").as("n_events"))
      .crossJoin(broadcast(tot))
      .orderBy("bucket")
  }

  /** q227 core over any (ts, event_type, user_id) frame. Factored for
    * crafted cap/clamp laws (a 100-event user contributes exactly 4;
    * a negative-noise empty cell clamps to 0). */
  private[graft] def dpReleaseCore(
      e: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    e.groupBy(col("event_type"),
        expr("(unix_micros(ts) div 86400000000) % 7").as("dow"),
        col("user_id"))
      .agg(count(lit(1)).as("c"))
      .groupBy("event_type", "dow")
      .agg(sum(least(col("c"), lit(4L))).as("n_capped"))
      .withColumn("noise",
        expr("""md5_prefix60(concat('dp|', event_type, '|',
                cast(dow as string))) % 13 - 6"""))
      .select(col("event_type"), col("dow").cast("long").as("dow"),
        col("n_capped").cast("long").as("n_capped"),
        col("noise").cast("long").as("noise"),
        greatest(col("n_capped") + col("noise"), lit(0L))
          .cast("long").as("released"))
      .orderBy("event_type", "dow")

  /** q221 core over any (ts, event_type) frame. Factored for crafted
    * drift laws (known two-week mixes with exact TVD). */
  private[graft] def mixDriftCore(
      e: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val w = e
      .groupBy(expr("unix_micros(ts) div 604800000000").as("wk"),
        col("event_type"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val wt = w.groupBy("wk").agg(sum("c").as("n"))
    val grid = w.select("wk").distinct()
      .crossJoin(broadcast(w.select("event_type").distinct()))
      .join(w, Seq("wk", "event_type"), "left")
      .join(broadcast(wt), Seq("wk"))
      .select(col("wk"), col("event_type"),
        expr("coalesce(c, 0) * 1000000 div n").as("share_ppm"),
        col("n"))
    val lagw = Window.partitionBy("event_type").orderBy("wk")
    grid
      .withColumn("prev_ppm", lag("share_ppm", 1).over(lagw))
      .filter(col("prev_ppm").isNotNull)
      .groupBy(col("wk").as("week"))
      .agg(max("n").cast("long").as("n_events"),
        expr("sum(abs(share_ppm - prev_ppm)) div 2").as("tvd_ppm"))
      .orderBy("week")
  }

  /** q213 core over any (user_id, ts, value) frame and a fixed decay
    * anchor (micros). Factored for crafted decay laws. */
  private[graft] def freshnessCore(e: org.apache.spark.sql.DataFrame,
      mxUs: Long): org.apache.spark.sql.DataFrame =
    e.filter(col("value").isNotNull && col("value") > 0)
      .select(col("user_id"),
        expr(s"""cast(floor(value * 1000) AS bigint) div
          shiftleft(cast(1 AS bigint),
            cast(least(($mxUs - unix_micros(ts)) div 604800000000, 40)
              AS int))""").as("wt"))
      .groupBy("user_id")
      .agg(sum("wt").as("score"))
      .groupBy(expr("cast(length(bin(score)) AS bigint)").as("bucket"))
      .agg(count(lit(1)).cast("long").as("n_users"),
        sum("score").cast("long").as("mass"))
      .orderBy("bucket")

  /** q211 core over any (event_id, ts, user_id, event_type) frame: rank
    * each user's events newest-first, keep k=8, report per-type clipped
    * mass. Factored for crafted laws (exact cap per user, ppm
    * arithmetic). */
  private[graft] def contributionCap(
      e: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    e.select(col("event_type"), col("user_id"), col("ts"),
        col("event_id"))
      .withColumn("rn", row_number().over(w))
      .groupBy("event_type")
      .agg(count(lit(1)).cast("long").as("n_pre"),
        sum(when(col("rn") <= 8, 1L).otherwise(0L)).cast("long")
          .as("n_post"))
      .select(col("event_type"), col("n_pre"), col("n_post"),
        expr("((n_pre - n_post) * 1000000) div n_pre")
          .as("clipped_ppm"))
      .orderBy("event_type")
  }

  /** q196 core, parameterized over the pseudonym hash so the law spec can
    * force collisions (impossible to reach with the real salted 60-bit
    * hash at any gate SF) and prove the audit's collision accounting —
    * `collisions` and the max-multiset drift — is exact. `events` needs
    * (event_type, user_id); hashFn gets user_id already cast to string. */
  private[graft] def pseudonymizeAudit(
      events: org.apache.spark.sql.DataFrame,
      hashFn: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
      : org.apache.spark.sql.DataFrame = {
    events
      .groupBy("event_type", "user_id")
      .agg(count(lit(1)).as("c"))
      .select(col("event_type"), col("c"),
        hashFn(col("user_id").cast("string")).as("pseudo"))
      .groupBy("event_type", "pseudo")
      .agg(count(lit(1)).as("n_users"), sum("c").as("c_p"),
        max("c").as("m_u"))
      .groupBy("event_type")
      .agg(sum("c_p").cast("long").as("n_events"),
        sum("n_users").cast("long").as("nd_raw"),
        count(lit(1)).cast("long").as("nd_pseudo"),
        (sum("n_users") - count(lit(1))).cast("long").as("collisions"),
        max("m_u").cast("long").as("max_user_events"),
        max("c_p").cast("long").as("max_pseudo_events"))
      .orderBy("event_type")
  }
}
