#!/usr/bin/env python3
"""Independent derivation of the dedup_simhash golden parquet.

The dedup_simhash driver query (SparkEntry.queries) returns all document
pairs (doc_id < 2000) whose 64-bit SimHashes are within Hamming distance 6.
Its oracle is a committed golden parquet; this script is the SECOND,
non-JVM derivation of that golden, so the pin is a dual derivation rather
than a self-pin of the kernel's own output.

Spec being re-implemented (independently of graft/ops/Dedup.scala):
  - tokenize: split on Python str whitespace (Python str.split() IS that
    class), lowercase each token. Java's toLowerCase(Locale.ROOT) and
    Python's str.lower() agree on this corpus; known divergences are
    locale-free anyway (dotted capital I family).
  - token hash: Java String.hashCode (31*h + utf16_code_unit, wrapping
    int32), sign-extended to 64 bits, multiplied by the golden-ratio
    constant 0x9e3779b97f4a7c15 (wrapping 64), then the murmur3 fmix64
    finalizer.
  - simhash: per-bit majority vote over token hashes.
  - pairs: BRUTE FORCE over all id pairs, keep hamming <= 6. The Spark
    kernel uses a pigeonhole block join (7 blocks of 9 bits; any pair
    within distance 6 shares at least one exact block, so recall is
    exactly 1.0) — brute force here is deliberately a different algorithm
    that must produce the identical set.

Usage: python3 tools/simhash_expected.py [sfDir] [outParquet]
Defaults: /root/testdata/sf0.01  src/test/resources/golden/simhash_sf001.parquet
Exits nonzero if an existing golden at the output path disagrees.
"""
import os
import sys

import duckdb

M64 = (1 << 64) - 1
GOLDEN_RATIO = 0x9E3779B97F4A7C15
FMIX1 = 0xFF51AFD7ED558CCD
FMIX2 = 0xC4CEB9FE1A85EC53


def java_string_hash(s: str) -> int:
    """Java String.hashCode over UTF-16 code units (signed 32-bit)."""
    h = 0
    for ch in s:
        o = ord(ch)
        if o < 0x10000:
            h = (31 * h + o) & 0xFFFFFFFF
        else:
            o -= 0x10000
            h = (31 * h + (0xD800 | (o >> 10))) & 0xFFFFFFFF
            h = (31 * h + (0xDC00 | (o & 0x3FF))) & 0xFFFFFFFF
    return h - (1 << 32) if h >= (1 << 31) else h


def fmix64(h: int) -> int:
    h &= M64
    h ^= h >> 33
    h = (h * FMIX1) & M64
    h ^= h >> 33
    h = (h * FMIX2) & M64
    h ^= h >> 33
    return h


def simhash64(text: str) -> int:
    counts = [0] * 64
    for tok in text.split():  # Python \s-class split == kernel tokenize
        t = tok.lower()
        h = fmix64((java_string_hash(t) * GOLDEN_RATIO) & M64)
        for b in range(64):
            if (h >> b) & 1:
                counts[b] += 1
            else:
                counts[b] -= 1
    out = 0
    for b in range(64):
        if counts[b] > 0:
            out |= 1 << b
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = (sys.argv[2] if len(sys.argv) > 2 else
           os.path.join(os.path.dirname(__file__), "..",
                        "src/test/resources/golden/simhash_sf001.parquet"))
    con = duckdb.connect()
    docs = con.execute(
        "SELECT doc_id, text FROM read_parquet(?) WHERE doc_id < 2000 "
        "ORDER BY doc_id", [os.path.join(sf_dir, "documents.parquet")]
    ).fetchall()
    hashes = [(did, simhash64(txt)) for did, txt in docs]
    pairs = []
    for i in range(len(hashes)):
        ida, ha = hashes[i]
        for j in range(i + 1, len(hashes)):
            idb, hb = hashes[j]
            d = bin(ha ^ hb).count("1")
            if d <= 6:
                pairs.append((ida, idb, d))
    pairs.sort()
    print(f"docs={len(hashes)} pairs_within_h6={len(pairs)}")

    con.execute(
        "CREATE TABLE expected (id_a BIGINT, id_b BIGINT, hamming BIGINT)")
    con.executemany("INSERT INTO expected VALUES (?, ?, ?)", pairs)

    if os.path.exists(out):
        diff = con.execute(
            "SELECT count(*) FROM ("
            " (SELECT * FROM expected EXCEPT SELECT id_a, id_b, hamming"
            "  FROM read_parquet(?))"
            " UNION ALL "
            " (SELECT id_a, id_b, hamming FROM read_parquet(?)"
            "  EXCEPT SELECT * FROM expected))", [out, out]).fetchone()[0]
        if diff:
            print(f"MISMATCH vs existing golden at {out}: {diff} rows differ")
            return 1
        print(f"existing golden at {out} matches the independent derivation")
    tmp = out + ".tmp.parquet"
    quoted = tmp.replace("'", "''")
    con.execute(
        f"COPY (SELECT * FROM expected ORDER BY id_a, id_b) TO '{quoted}' (FORMAT PARQUET)")
    os.replace(tmp, out)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
