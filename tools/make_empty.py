#!/usr/bin/env python3
"""Empty-corpus gate (dev tooling; the q148 empty-agg NPE class).

Builds <dst> as a full table dir: every table symlinked from <src>
except documents.parquet (and with --embeddings, embeddings.parquet),
which is written with ZERO rows but the source schema. The reference
tests the empty-input path explicitly (test/model/test_tfidf.py:15
test_apply_with_empty); a driver-side scalar derivation (.head on an
aggregate, max over zero rows) NPEs exactly here.

Usage:
    python3 tools/make_empty.py /root/testdata/sf0.001 /tmp/graft_empty_sf
    SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify /tmp/graft_empty_sf /tmp/empty_out" \
        2>&1 | grep '\[verify\]'   # every line is a crash to triage

CONTRACT (round 8): every non-fit query returns a well-formed
(possibly empty) result on a zero-row corpus — the round-8 sweep
fixed the vanished-sink class (Tables.nonVanishing), an ANSI
divide-by-zero (q206) and a null bloom buffer (q99). Fit-backed
queries (w2v family, LDA, doc2vec, the learned quality filter) RAISE
with a clear message instead — the reference's gensim/TF trainers
raise on an empty fit corpus too, so empty-in/empty-out would
invent behavior the reference doesn't have. Expected [verify] lines
are exactly that fit family; anything else is a regression.
"""
import os
import shutil
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events",
]


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--embeddings"]
    empty_embeddings = "--embeddings" in sys.argv
    src, dst = args[0], args[1]
    if os.path.exists(dst):
        shutil.rmtree(dst)
    os.makedirs(dst)
    tables = TABLES + ([] if empty_embeddings else ["embeddings"])
    emptied = ["documents"] + (["embeddings"] if empty_embeddings else [])
    for t in tables:
        os.symlink(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
    con = duckdb.connect()
    for t in emptied:
        con.execute(f"""
            COPY (SELECT * FROM read_parquet('{src}/{t}.parquet') WHERE 1 = 0)
            TO '{dst}/{t}.parquet' (FORMAT PARQUET)
        """)
    print(f"wrote {dst} (empty: {', '.join(emptied)})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
