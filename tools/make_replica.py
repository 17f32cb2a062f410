#!/usr/bin/env python3
"""Build an N-x replica of the corpus tables (documents / embeddings /
events) for adversarial scale testing — the round-3 version of this script
(which caught the q52 `% 256` band-key blowup) lived in /tmp and was lost;
this one is committed.

Scale model: N-x MORE entities, not N-x heavier ones — doc/vec/event/user
ids are offset per replica so per-entity cardinality stays constant (the
realistic way a corpus grows). Text is perturbed per replica (a replica
token is appended) so replicas are near- but not exact duplicates of the
original — near-dup mass grows ~N-x, which is the real signal the dedup
family must absorb. Embeddings get one dimension nudged by a tiny
deterministic epsilon per replica: cosine structure survives, exact-equal
degeneracy doesn't.

The other tables (lineitem etc., needed only by Bench warm-up / non-corpus
queries) are symlinked from the source dir.

Usage: make_replica.py <srcSfDir> <dstDir> <factor> [--skew]

--skew layers two adversarial distributions on documents (round-6 100x
rehearsal, VERDICT r5 #4):
  * Zipfian vocabulary: every replicated doc gets 3 extra terms drawn
    deterministically with P(term_j) ~ 1/j over a 500-term tail — so the
    head term `zt1` lands in a double-digit share of the corpus. Stresses
    the term-keyed stages of q95 (tf-df join) and q109 (shingle distinct).
  * Mega dup cluster: docs with doc_id % 997 == 0 collapse to one
    IDENTICAL text across all replicas — at 100x that is a single
    ~500-doc exact-dup cluster, which must trip q52's 256-doc bucket cap
    and stress q92's connected components, without growing output O(m^2).
  * Hot event user (round 13): events whose user_id % 997 == 0 KEEP the
    base user_id across all replicas (everyone else offsets per replica)
    — per-key mass now grows with the factor (the one thing the plain
    replica's constant-mass growth never exercises), so at 10x+ the
    events self-join's worst key exceeds the 1e6-pair salt threshold and
    q255's advisor must flip events_self to 'salt', and user-windowed
    queries (sessionize, attribution) absorb a bot-user partition.

Then:  SPARK_GRAFT_SF_DIR=<dstDir> SPARK_GRAFT_ONLY=q95_tfidf,... \
         sbt -batch "runMain graft.Bench"
"""
import os
import sys

import duckdb

PASSTHROUGH = ["region", "nation", "customer", "supplier", "part",
               "orders", "lineitem"]


def main():
    src, dst, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
    skew = "--skew" in sys.argv[4:]
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.sql("SET threads TO 32")
    # a factor-N build is one N-way UNION ALL; DuckDB's default expression
    # depth caps at 1000, which a 1000x build exceeds
    con.sql("SET max_expression_depth TO 100000")

    def replicate(table, sql_tpl):
        parts = " UNION ALL ".join(sql_tpl.format(i=i) for i in range(n))
        con.sql(f"COPY ({parts}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)")
        print(f"{table}: x{n} ->",
              con.sql(f"SELECT count(*) FROM '{dst}/{table}.parquet'")
                 .fetchone()[0], "rows", file=sys.stderr)

    docs = f"'{src}/documents.parquet'"
    if skew:
        # Zipf tail: term index j = floor(500^u) for deterministic u in
        # [0,1) gives P(j) ~ 1/j with P(j=1) ~ ln2/ln500 ~ 11% per draw;
        # three draws per doc seeded off (doc_id, replica, draw). Mega
        # cluster: one identical text for every (doc_id % 997 == 0) row
        # in every replica.
        zipf_terms = " || ".join(
            f"' zt' || CAST(FLOOR(POW(500, (hash(doc_id * 31 + {{i}} * 7 "
            f"+ {d}) % 8192) / 8192.0)) AS BIGINT)"
            for d in range(3))
        replicate("documents", f"""
            SELECT doc_id + {{i}} * CAST(10000000 AS BIGINT) AS doc_id,
                   CASE WHEN doc_id % 997 = 0
                        THEN 'mega cluster common text block shared by '
                             || 'every replica of the pathological dup '
                             || 'family for the bucket cap rehearsal'
                        WHEN {{i}} = 0 THEN text || {zipf_terms}
                        ELSE text || ' replica{{i}}' || {zipf_terms}
                   END AS text,
                   lang, source,
                   CASE WHEN {{i}} = 0 THEN n_chars
                        ELSE n_chars + {{i}} END AS n_chars
            FROM {docs}""")
    else:
        replicate("documents", f"""
            SELECT doc_id + {{i}} * CAST(10000000 AS BIGINT) AS doc_id,
                   CASE WHEN {{i}} = 0 THEN text
                        ELSE text || ' replica{{i}}' END AS text,
                   lang, source,
                   CASE WHEN {{i}} = 0 THEN n_chars
                        ELSE n_chars + {{i}} END AS n_chars
            FROM {docs}""")

    embs = f"'{src}/embeddings.parquet'"
    replicate("embeddings", f"""
        SELECT vec_id + {{i}} * CAST(10000000 AS BIGINT) AS vec_id,
               list_transform(range(1, len(embedding) + 1),
                 j -> CAST(embedding[j]
                        + CASE WHEN j = 1 THEN {{i}} * 1e-4 ELSE 0 END
                        AS FLOAT)) AS embedding,
               label
        FROM {embs}""")

    evs = f"'{src}/events.parquet'"
    # The driver's events.parquet stores ts as INT64 TIMESTAMP(NANOS),
    # which DuckDB 1.0 reads as a micro TIMESTAMP but cannot write back as
    # NANOS. Write a native micro TIMESTAMP (parquet TIMESTAMP_NTZ):
    # Tables.events sniffs the column type and casts NTZ -> LTZ under the
    # UTC session, the exact same ns->us truncation as its nanos path —
    # so Spark runs unchanged AND DuckDB can evaluate epoch(ts)-style
    # oracle SQL directly against the replica (the earlier raw-INT64-nanos
    # layout kept Spark's read path identical but made every ts-bearing
    # oracle binder-fail, leaving event queries unchecked at scale).
    con.sql("SET TimeZone = 'UTC'")
    # --skew: hot users (user_id % 997 == 0) collapse to the base id in
    # every replica, so their per-key mass grows with the factor
    uid = ("CASE WHEN user_id % 997 = 0 THEN user_id "
           "ELSE user_id + {i} * CAST(10000000 AS BIGINT) END"
           if skew else
           "user_id + {i} * CAST(10000000 AS BIGINT)")
    replicate("events", f"""
        SELECT event_id + {{i}} * CAST(100000000 AS BIGINT) AS event_id,
               CAST(ts AS TIMESTAMP) AS ts,
               {uid} AS user_id,
               event_type, value, props
        FROM {evs}""")

    for t in PASSTHROUGH:
        link = f"{dst}/{t}.parquet"
        if not os.path.exists(link):
            os.symlink(f"{src}/{t}.parquet", link)


if __name__ == "__main__":
    main()
