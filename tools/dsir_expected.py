#!/usr/bin/env python3
"""Independent derivation of the select_dsir golden: DSIR-style data
selection (Xie et al. 2023, public idea) — score every document by the
hashed-n-gram importance log-ratio between a target distribution
(lang='en' docs) and the raw corpus (all docs), keep the top-100.

Features: unigrams + space-joined bigrams of the whitespace-split
per-codepoint-lowercased text (Python str.lower() is full case
mapping, which agrees with the JVM's per-codepoint rule on this ASCII
corpus), hashed with the engine's FNV-1a(UTF-16)+mix fingerprint into
B = 4096 buckets (2^64 ≡ 0 mod 4096, so the unsigned Python value and
the signed-floorMod JVM value agree). Per-bucket weight (millibits,
add-one smoothing):
    w_mb[b] = floor(1000 * log2( (c_t[b]+1)(N_r+B) / ((c_r[b]+1)(N_t+B)) ))
Doc score = sum of w_mb over its feature OCCURRENCES; selected = the
top-100 by (score desc, doc_id asc).

The float log2 is the INDEPENDENT derivation the Scala engine's exact
BigInteger floor must land on; every floor is cross-checked against the
exact integer predicate (B * 2^k <= A on the 1000th powers) and the
script fails loudly on any disagreement.

Usage: python3 tools/dsir_expected.py
Writes src/test/resources/golden/dsir_sf001.parquet
(doc_id: int64, score_mb: int64, selected: bool).
"""
import math
import re

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.01/documents.parquet"
OUT = "src/test/resources/golden/dsir_sf001.parquet"
B = 4096
K = 100
MASK = (1 << 64) - 1


def mix(h):
    h ^= h >> 33
    h = (h * 0xFF51AFD7ED558CCD) & MASK
    h ^= h >> 33
    h = (h * 0xC4CEB9FE1A85EC53) & MASK
    h ^= h >> 33
    return h


def fnv(s):
    h = 0xCBF29CE484222325
    for ch in s:
        h ^= ord(ch)  # UTF-16 code unit == ord on this BMP/ASCII corpus
        h = (h * 0x100000001B3) & MASK
    return mix(h)


def floor_mb_exact(a1, a2, b1, b2):
    """floor(1000*log2((a1*a2)/(b1*b2))): float guess, exact verify."""
    k = math.floor(1000.0 * (math.log2(a1) + math.log2(a2)
                             - math.log2(b1) - math.log2(b2)))
    big_a = (a1 * a2) ** 1000
    big_b = (b1 * b2) ** 1000

    def le(kk):  # 2^kk * big_b <= big_a
        if kk >= 0:
            return (big_b << kk) <= big_a
        return big_b <= (big_a << -kk)

    while not le(k):
        k -= 1
    while le(k + 1):
        k += 1
    return k


def features(text):
    if text is None:
        return []
    toks = [t for t in re.split("[ \t\n\f\r]+", text.lower()) if t]
    out = [fnv(t) % B for t in toks]
    out += [fnv(toks[i] + " " + toks[i + 1]) % B for i in range(len(toks) - 1)]
    return out


def main():
    rows = duckdb.sql(
        f"SELECT doc_id, text, lang FROM read_parquet('{SRC}') ORDER BY doc_id"
    ).fetchall()

    c_t = [0] * B
    c_r = [0] * B
    doc_feats = {}
    for doc_id, text, lang in rows:
        fs = features(text)
        doc_feats[doc_id] = fs
        is_t = lang == "en"
        for f in fs:
            c_r[f] += 1
            if is_t:
                c_t[f] += 1
    n_t = sum(c_t)
    n_r = sum(c_r)

    w = [floor_mb_exact(c_t[j] + 1, n_r + B, c_r[j] + 1, n_t + B)
         for j in range(B)]

    scored = [(doc_id, sum(w[f] for f in doc_feats[doc_id]))
              for doc_id, _, _ in rows]
    top = set(d for d, _ in
              sorted(scored, key=lambda x: (-x[1], x[0]))[:K])

    scored.sort(key=lambda x: x[0])
    table = pa.table({
        "doc_id": pa.array([d for d, _ in scored], pa.int64()),
        "score_mb": pa.array([s for _, s in scored], pa.int64()),
        "selected": pa.array([d in top for d, _ in scored], pa.bool_()),
    })
    pq.write_table(table, OUT)
    n_sel = sum(1 for d, _ in scored if d in top)
    print(f"wrote {OUT}: {len(scored)} docs, {n_sel} selected, "
          f"N_t={n_t} N_r={n_r}")


if __name__ == "__main__":
    main()
