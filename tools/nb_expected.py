#!/usr/bin/env python3
"""Independent derivation of the quality_nb golden: a multinomial
Naive Bayes classifier (the fastText/DCLM-style model-based quality
filter, scaled to what this sandbox can train deterministically)
labeled lang='en' vs rest over the sf0.01 documents.

Per-token weight (millibits, add-one smoothing):
    w_mb(t) = floor(1000 * log2( (c1+1)(N0+V) / ((c0+1)(N1+V)) ))
where c1/c0 = token count in the positive/negative class, N1/N0 =
class token totals, V = vocabulary size. Class prior:
    prior_mb = floor(1000 * log2( (D1+1) / (D0+1) ))
Doc score = prior + sum of its tokens' weights; pred_pos = score >= 0.

The float log2 here is the INDEPENDENT derivation the Scala engine's
exact-BigInteger floor must land on; to guarantee the golden itself is
not a float-boundary casualty, every floor is cross-checked against an
exact integer predicate (B * 2^k <= A on the 1000th powers, Python
bignums) and the script fails loudly on any disagreement.

Usage: python3 tools/nb_expected.py
Writes src/test/resources/golden/nb_sf001.parquet
(doc_id: int64, score_mb: int64, pred_pos: bool, is_pos: bool).
"""
import math
from collections import Counter

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.01/documents.parquet"
OUT = "src/test/resources/golden/nb_sf001.parquet"


def floor_mb_exact(a1, a2, b1, b2):
    """floor(1000*log2((a1*a2)/(b1*b2))): float guess, exact verify."""
    k = math.floor(1000.0 * (math.log2(a1) + math.log2(a2)
                             - math.log2(b1) - math.log2(b2)))
    big_a = (a1 * a2) ** 1000
    big_b = (b1 * b2) ** 1000

    def le(kk):  # b * 2^kk <= a, exactly
        return (big_b << kk if kk >= 0 else big_b) <= \
               (big_a if kk >= 0 else big_a << -kk)

    while not le(k):
        k -= 1
    while le(k + 1):
        k += 1
    # the float guess must already be the exact floor — if libm ever
    # disagrees the golden is boundary-sensitive and needs a look
    g = math.floor(1000.0 * (math.log2(a1) + math.log2(a2)
                             - math.log2(b1) - math.log2(b2)))
    assert g == k, f"float floor {g} != exact floor {k} for " \
                   f"({a1},{a2})/({b1},{b2})"
    return k


def main():
    rows = duckdb.sql(
        f"SELECT doc_id, text, lang FROM '{SRC}' ORDER BY doc_id"
    ).fetchall()

    c1, c0 = Counter(), Counter()
    docs = []
    d1 = d0 = 0
    for doc_id, text, lang in rows:
        pos = lang == "en"
        toks = (text or "").lower().split()
        docs.append((doc_id, pos, toks))
        if pos:
            d1 += 1
            c1.update(toks)
        else:
            d0 += 1
            c0.update(toks)

    n1 = sum(c1.values())
    n0 = sum(c0.values())
    vocab = set(c1) | set(c0)
    v = len(vocab)
    w = {t: floor_mb_exact(c1[t] + 1, n0 + v, c0[t] + 1, n1 + v)
         for t in vocab}
    prior = floor_mb_exact(d1 + 1, 1, d0 + 1, 1)

    out = [(doc_id, prior + sum(w[t] for t in toks), pos)
           for doc_id, pos, toks in docs]
    table = pa.table({
        "doc_id": pa.array([r[0] for r in out], pa.int64()),
        "score_mb": pa.array([r[1] for r in out], pa.int64()),
        "pred_pos": pa.array([r[1] >= 0 for r in out], pa.bool_()),
        "is_pos": pa.array([r[2] for r in out], pa.bool_()),
    })
    pq.write_table(table, OUT)
    npos = sum(1 for r in out if r[1] >= 0)
    print(f"wrote {len(out)} docs (V={v}, N1={n1}, N0={n0}, "
          f"prior={prior} mb, pred_pos={npos}) -> {OUT}")


if __name__ == "__main__":
    main()
