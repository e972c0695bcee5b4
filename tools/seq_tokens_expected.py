#!/usr/bin/env python3
"""Independent dual derivation of the per-document BPE TOKEN STREAM the
seq_pack oracle packs relationally.

Reimplements the pretokenizer + greedy lowest-rank merge application IN
PYTHON (sharing only the committed merges artifact with the Scala
kernel, like tools/bpe_expected.py) and writes one row per token —
including the per-document '<|eos|>' sentinel seq_pack appends — with
the portable 31-polynomial identity key:

    tok_key = fold(h = (h*31 + ord(c)) % (2^31 - 1)) over code points

The driver's DuckDB oracle recomputes concat-and-chunk packing from
these rows (global row_number -> seq_id/pos -> positional checksum), so
a divergence in EITHER the tokenization or the packing arithmetic turns
the seq_pack correctness row red.

Usage: python3 tools/seq_tokens_expected.py
Writes src/test/resources/golden/doc_tokens_sf001.parquet
(doc_id: int64, pos: int64, tok_key: int64).
"""
import re

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

GOLDEN = "src/test/resources/golden"
SF001 = "/root/testdata/sf0.01/documents.parquet"
EOS = "<|eos|>"
P = 2147483647

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


def apply_tokens(piece: str, ranks: dict) -> list:
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
    return syms


def tok_key(tok: str) -> int:
    h = 0
    for c in tok:
        h = (h * 31 + ord(c)) % P
    return h


def main():
    ranks = load_ranks(f"{GOLDEN}/bpe_merges.txt")
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF001}') ORDER BY doc_id"
    ).fetchall()
    cache = {}
    ids, poss, keys = [], [], []
    for doc_id, text in rows:
        pos = 0
        for m in PRETOKEN.finditer(text or ""):
            p = m.group()
            toks = cache.get(p)
            if toks is None:
                toks = apply_tokens(p, ranks)
                cache[p] = toks
            for t in toks:
                ids.append(doc_id)
                poss.append(pos)
                keys.append(tok_key(t))
                pos += 1
        ids.append(doc_id)
        poss.append(pos)
        keys.append(tok_key(EOS))
    table = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "pos": pa.array(poss, pa.int64()),
        "tok_key": pa.array(keys, pa.int64()),
    })
    pq.write_table(table, f"{GOLDEN}/doc_tokens_sf001.parquet")
    print(f"wrote {len(ids)} token rows ({len(rows)} docs, "
          f"eos_key={tok_key(EOS)}) -> {GOLDEN}/doc_tokens_sf001.parquet")


if __name__ == "__main__":
    main()
