#!/usr/bin/env python3
"""Independent dual derivation of the token_bpe golden.

Reimplements the GPT-2-style pretokenizer + greedy lowest-rank BPE merge
application IN PYTHON, from scratch, sharing ONLY the committed merges
artifact (golden/bpe_merges.txt) with the Scala kernel
(graft.text.Bpe). Writes golden/bpe_sf001.parquet; the driver's DuckDB
oracle reads it, so any divergence between the two implementations turns
the token_bpe correctness row red.

Run after regenerating the merges artifact:
    python3 tools/bpe_expected.py
"""
import re

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

GOLDEN = "src/test/resources/golden"
SF001 = "/root/testdata/sf0.01/documents.parquet"

# the exact pattern of TextAnalysis.BpeTokenPattern (disjoint classes:
# Python re's leftmost-first == Java == RE2 here)
PRETOKEN = re.compile(r" ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 \t\n\r]+|[ \t\n\r]+")


def unescape(s: str) -> str:
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            n = s[i + 1]
            out.append({"\\": "\\", "t": "\t", "n": "\n", "r": "\r", "s": " "}.get(n, n))
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def load_ranks(path: str) -> dict:
    ranks = {}
    with open(path, encoding="utf-8") as f:
        for rank, line in enumerate(l for l in f.read().split("\n") if l):
            left, right = line.split(" ", 1)
            ranks[(unescape(left), unescape(right))] = rank
    return ranks


def apply_count(piece: str, ranks: dict) -> int:
    syms = list(piece)  # python strings iterate by code point
    while len(syms) > 1:
        best_rank, best_at = None, None
        for j in range(len(syms) - 1):
            r = ranks.get((syms[j], syms[j + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_at = r, j
        if best_at is None:
            break
        syms[best_at : best_at + 2] = [syms[best_at] + syms[best_at + 1]]
    return len(syms)


def count_tokens(text: str, ranks: dict, cache: dict) -> int:
    total = 0
    for m in PRETOKEN.finditer(text):
        p = m.group()
        c = cache.get(p)
        if c is None:
            c = apply_count(p, ranks)
            cache[p] = c
        total += c
    return total


def main():
    ranks = load_ranks(f"{GOLDEN}/bpe_merges.txt")
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF001}') ORDER BY doc_id"
    ).fetchall()
    cache = {}
    ids, counts = [], []
    for doc_id, text in rows:
        ids.append(doc_id)
        counts.append(count_tokens(text or "", ranks, cache))
    table = pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "bpe_tokens": pa.array(counts, pa.int64())}
    )
    pq.write_table(table, f"{GOLDEN}/bpe_sf001.parquet")
    print(f"wrote {len(ids)} rows to {GOLDEN}/bpe_sf001.parquet")
    pieces = sum(len(PRETOKEN.findall(t or "")) for _, t in rows)
    merged = sum(counts)
    print(f"pretokenizer pieces={pieces} post-merge tokens={merged} "
          f"merge ratio={pieces / max(merged, 1):.3f}")


if __name__ == "__main__":
    main()
