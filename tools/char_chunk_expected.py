#!/usr/bin/env python3
"""Independent derivation of the character-mode chunker golden.

Implements the reference's _split_by_characters semantics
(core/processors/chunking.py:117-172) directly in Python — a separate
derivation from the Scala kernel (text/Chunker.scala byCharacters), so
the committed golden is dual-derived: if either implementation drifts
from the reference behavior, the driver compare goes red.

Semantics covered:
  - texts at/below chunk_size return verbatim as one chunk (no strip,
    no min check);
  - window of chunk_size; break-point = last '.'/'!'/'?' within the
    final 100 chars (exclusive lower bound, +1), else last isspace()
    within the final 50, else 0;
  - emitted chunk is the stripped slice, kept only if its stripped
    length >= min_chunk_size; offsets are the stripped bounds;
  - advance = start+bp-overlap (bp>0) else end-overlap, then the
    reference's progress rule max(next, len(last_chunk)+next-overlap);
  - PLUS the Scala kernel's documented divergence guard (next<=start ->
    next=end): the reference infinite-loops there, a Spark task must
    not — both derivations implement the guard identically.

The corpus is punctuation-free word soup, so the query (SparkEntry
"chunk_chars") and this generator both plant identical sentence enders
first: text.replace("row ", "row. ").replace("fast ", "fast! ")
.replace("key ", "key? ").

Usage: python3 tools/char_chunk_expected.py
Writes src/test/resources/golden/char_chunks_sf001.parquet from
/root/testdata/sf0.01/documents.parquet (config 120/30/20).
"""
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

CHUNK_SIZE = 120
OVERLAP = 30
MIN_CHUNK = 20

SRC = "/root/testdata/sf0.01/documents.parquet"
OUT = "src/test/resources/golden/char_chunks_sf001.parquet"


def find_break_point(window: str) -> int:
    n = len(window)
    for i in range(n - 1, max(0, n - 100), -1):
        if window[i] in ".!?":
            return i + 1
    for i in range(n - 1, max(0, n - 50), -1):
        if window[i].isspace():
            return i
    return 0


def stripped_bounds(text: str, a: int, b: int):
    while a < b and text[a].isspace():
        a += 1
    while b > a and text[b - 1].isspace():
        b -= 1
    return a, b


def char_chunks(text: str):
    """[(chunk_id, text, start, end)] with stripped-slice offsets."""
    if not text.strip():
        return []
    if len(text) <= CHUNK_SIZE:
        return [(0, text, 0, len(text))]
    chunks = []
    start = 0
    while start < len(text):
        end = start + CHUNK_SIZE
        if end >= len(text):
            a, b = stripped_bounds(text, start, len(text))
            if b - a >= MIN_CHUNK:
                chunks.append((len(chunks), text[a:b], a, b))
            break
        bp = find_break_point(text[start:end])
        chunk_end = start + bp if bp > 0 else end
        a, b = stripped_bounds(text, start, chunk_end)
        if b - a >= MIN_CHUNK:
            chunks.append((len(chunks), text[a:b], a, b))
        nxt = start + bp - OVERLAP if bp > 0 else end - OVERLAP
        if chunks:
            nxt = max(nxt, len(chunks[-1][1]) + nxt - OVERLAP)
        if nxt <= start:  # divergence guard, mirrored from the kernel
            nxt = end
        start = nxt
    return chunks


def main():
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{SRC}' ORDER BY doc_id").fetchall()
    out = {"doc_id": [], "chunk_id": [], "chunk_text": [],
           "chunk_start": [], "chunk_end": []}
    for doc_id, text in rows:
        aug = (text.replace("row ", "row. ")
                   .replace("fast ", "fast! ")
                   .replace("key ", "key? "))
        for cid, ctext, a, b in char_chunks(aug):
            out["doc_id"].append(doc_id)
            out["chunk_id"].append(cid)
            out["chunk_text"].append(ctext)
            out["chunk_start"].append(a)
            out["chunk_end"].append(b)
    table = pa.table({
        "doc_id": pa.array(out["doc_id"], pa.int64()),
        "chunk_id": pa.array(out["chunk_id"], pa.int32()),
        "chunk_text": pa.array(out["chunk_text"], pa.string()),
        "chunk_start": pa.array(out["chunk_start"], pa.int32()),
        "chunk_end": pa.array(out["chunk_end"], pa.int32()),
    })
    pq.write_table(table, OUT)
    print(f"wrote {table.num_rows} chunks for {len(rows)} docs -> {OUT}")


if __name__ == "__main__":
    main()
