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

Usage: make_replica.py <srcSfDir> <dstDir> <factor>
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
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.sql("SET threads TO 32")

    def replicate(table, sql_tpl):
        parts = " UNION ALL ".join(sql_tpl.format(i=i) for i in range(n))
        con.sql(f"COPY ({parts}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)")
        print(f"{table}: x{n} ->",
              con.sql(f"SELECT count(*) FROM '{dst}/{table}.parquet'")
                 .fetchone()[0], "rows", file=sys.stderr)

    docs = f"'{src}/documents.parquet'"
    replicate("documents", f"""
        SELECT doc_id + {{i}} * 10000000 AS doc_id,
               CASE WHEN {{i}} = 0 THEN text
                    ELSE text || ' replica{{i}}' END AS text,
               lang, source,
               CASE WHEN {{i}} = 0 THEN n_chars
                    ELSE n_chars + {{i}} END AS n_chars
        FROM {docs}""")

    embs = f"'{src}/embeddings.parquet'"
    replicate("embeddings", f"""
        SELECT vec_id + {{i}} * 10000000 AS vec_id,
               list_transform(range(1, len(embedding) + 1),
                 j -> CAST(embedding[j]
                        + CASE WHEN j = 1 THEN {{i}} * 1e-4 ELSE 0 END
                        AS FLOAT)) AS embedding,
               label
        FROM {embs}""")

    evs = f"'{src}/events.parquet'"
    # The driver's events.parquet stores ts as INT64 TIMESTAMP(NANOS) and
    # Tables.events converts it (`timestamp_micros(ts div 1000)` with
    # nanosAsLong). DuckDB 1.0 reads NANOS as micro TIMESTAMP and cannot
    # write NANOS back, so a naive copy changes the column's parquet type
    # and every ts-arithmetic Spark query on the replica fails at ANALYSIS
    # time (this silently zeroed the first round-5 10x numbers for the
    # event queries — Bench reports failures on stderr only). Writing raw
    # INT64 nanos (epoch_ns) keeps Spark's read path identical: a plain
    # INT64 column arrives as long, exactly like the NANOS column under
    # nanosAsLong.
    con.sql("SET TimeZone = 'UTC'")
    replicate("events", f"""
        SELECT event_id + {{i}} * 100000000 AS event_id,
               epoch_ns(ts) AS ts,
               user_id + {{i}} * 10000000 AS user_id,
               event_type, value, props
        FROM {evs}""")

    for t in PASSTHROUGH:
        link = f"{dst}/{t}.parquet"
        if not os.path.exists(link):
            os.symlink(f"{src}/{t}.parquet", link)


if __name__ == "__main__":
    main()
