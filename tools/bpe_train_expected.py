#!/usr/bin/env python3
"""Independent dual derivation of the bpe_train golden.

Reimplements BPE TRAINING (Sennrich et al. 2016) in Python from
scratch: pretokenize the sf0.01 documents, build the piece-frequency
dict, then 48 greedy merge rounds — most frequent adjacent symbol pair,
ties to the lexicographically smallest (left, right), stop when the
best pair occurs fewer than 2 times. Shares NOTHING with the Scala
trainer but the published algorithm; any divergence (argmax, tie-break,
merge application) turns the bpe_train correctness row red.

Run: python3 tools/bpe_train_expected.py
Writes src/test/resources/golden/bpe_train_sf001.parquet
(rank: int64, lhs: string, rhs: string).
"""
import re
from collections import Counter

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.01/documents.parquet"
OUT = "src/test/resources/golden/bpe_train_sf001.parquet"
NUM_MERGES = 48
MIN_PAIR_FREQ = 2

# the exact pattern of TextAnalysis.BpeTokenPattern (disjoint classes:
# Python re's leftmost-first == Java == RE2 here)
PRETOKEN = re.compile(r" ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 \t\n\r]+|[ \t\n\r]+")


def train(texts, num_merges, min_pair_freq):
    piece_freq = Counter()
    for t in texts:
        piece_freq.update(PRETOKEN.findall(t))
    # piece -> current symbol list (python strings iterate by code point)
    words = [(list(p), f) for p, f in piece_freq.items()]
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for syms, f in words:
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < min_pair_freq:
            break
        merges.append(best)
        merged = best[0] + best[1]
        new_words = []
        for syms, f in words:
            out = []
            i = 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == best[0]
                        and syms[i + 1] == best[1]):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words.append((out, f))
        words = new_words
    return merges


def main():
    rows = duckdb.sql(
        f"SELECT text FROM '{SRC}' ORDER BY doc_id").fetchall()
    merges = train([t for (t,) in rows], NUM_MERGES, MIN_PAIR_FREQ)
    table = pa.table({
        "rank": pa.array(range(len(merges)), pa.int64()),
        "lhs": pa.array([l for l, _ in merges], pa.string()),
        "rhs": pa.array([r for _, r in merges], pa.string()),
    })
    pq.write_table(table, OUT)
    print(f"wrote {len(merges)} merges -> {OUT}")


if __name__ == "__main__":
    main()
