#!/usr/bin/env python3
"""Train the char-bigram LM artifact for the CCNet-style perplexity
quality filter (Wenzek et al. 2020 filter corpora by LM perplexity; the
public idea, scaled down to a char bigram model this sandbox can train
deterministically from its own corpus).

The artifact IS the model: per bigram an integer `surprise_mb`
(millibits) = floor(log2((N + V) / (c + 1)) * 1000) under add-one
smoothing, where c = corpus count of the bigram over the LOWERCASED
sf0.01 documents (code-point pairs), N = total bigrams, V = distinct
bigrams. A `<OOV>` row carries the c = 0 surprise. Storing integers —
not probabilities — is what makes the Spark kernel and the DuckDB
oracle agree exactly: neither engine computes a log at query time, so
libm ulp differences cannot move a floor boundary.

Usage: python3 tools/bigram_lm_expected.py
Writes src/test/resources/golden/bigram_lm_sf001.parquet
(bigram: string, surprise_mb: int64).
"""
import math
from collections import Counter

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.01/documents.parquet"
OUT = "src/test/resources/golden/bigram_lm_sf001.parquet"


def main():
    rows = duckdb.sql(f"SELECT text FROM '{SRC}' ORDER BY doc_id").fetchall()
    counts = Counter()
    for (text,) in rows:
        t = text.lower()
        for i in range(len(t) - 1):
            counts[t[i:i + 2]] += 1
    n = sum(counts.values())
    v = len(counts)

    def surprise_mb(c):
        return math.floor(math.log2((n + v) / (c + 1)) * 1000)

    bigrams = sorted(counts)
    table = pa.table({
        "bigram": pa.array(bigrams + ["<OOV>"], pa.string()),
        "surprise_mb": pa.array(
            [surprise_mb(counts[b]) for b in bigrams] + [surprise_mb(0)],
            pa.int64()),
    })
    pq.write_table(table, OUT)
    print(f"wrote {v} bigrams (N={n}) + <OOV> -> {OUT}")


if __name__ == "__main__":
    main()
