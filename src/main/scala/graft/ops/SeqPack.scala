package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.text.Bpe

/** Sequence packing — the LAST stage of an LM pretraining data
  * pipeline: concatenate every document's BPE token stream (plus one
  * EOS sentinel per document) in corpus order and cut the global
  * stream into fixed-length training sequences (the GPT-2
  * concat-and-chunk recipe; deterministic in (order, tokenization)
  * only, unlike greedy first-fit packing whose output depends on bin
  * state).
  *
  * SCALE SHAPE: the naive spelling — explode to one row per token,
  * row_number over a global ORDER BY — is a one-task trap twice over
  * (un-partitioned window AND a 10^14-row token shuffle at corpus
  * scale). This operator instead
  *
  *  1. computes each sorted partition's token total (two-phase
  *     distributed prefix sum, one long per partition collected — the
  *     [[Sharding]] machinery) over the ONE range-partitioned sort,
  *  2. re-tokenizes in phase 2 (recompute beats shuffling token
  *     strings; document text never leaves its scan task), folding
  *     each doc's tokens into per-(doc, sequence) PARTIALS locally —
  *     a doc overlaps at most n/seqLen + 2 sequences, so the only
  *     exchange carries fixed-width (seq_id, doc_id, cnt, csum) rows,
  *     ~seqLen× fewer than tokens,
  *  3. hash-aggregates by seq_id (map-side combinable sums/min/max).
  *
  * The per-sequence `checksum` = Σ (pos_in_seq + 1) · tokKey(token)
  * pins every token IDENTITY at every POSITION (order-sensitive), so
  * the DuckDB oracle — which recomputes the packing relationally from
  * an independently-derived Python token golden — verifies the full
  * token stream without either engine materializing sequences of
  * strings. Bounded exactly: (p+1) ≤ seqLen, tokKey < 2^31, so a
  * 64-token sequence's checksum < 2^43 — no BIGINT overflow in either
  * engine.
  *
  * Returns (seq_id, n_toks, n_docs, first_doc, last_doc, checksum).
  */
object SeqPack {

  /** The per-document end-of-text sentinel (GPT-2's `<|endoftext|>`
    * idea). Participates in packing as one ordinary token.
    */
  val EosToken = "<|eos|>"

  private val P = 2147483647L

  /** Portable token-identity key: 31-polynomial over CODE POINTS mod
    * the Mersenne prime 2^31−1 (the repo's MINSTD modulus). Python
    * iterates strings by code point natively, so the dual derivation
    * in tools/seq_tokens_expected.py is the same three-line loop.
    */
  def tokKey(tok: String): Long = {
    var h = 0L
    var i = 0
    while (i < tok.length) {
      val cp = tok.codePointAt(i)
      h = (h * 31L + cp) % P
      i += Character.charCount(cp)
    }
    h
  }

  def packSequences(docs: DataFrame, merges: Seq[(String, String)],
      seqLen: Int): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive: $seqLen")
    val spark = docs.sparkSession
    val sorted = docs.where(col("doc_id").isNotNull)
      .select(col("doc_id").cast("long"), col("text"))
      .orderBy(col("doc_id"))
      .rdd
      .map(r => (r.getLong(0), if (r.isNullAt(1)) "" else r.getString(1)))
    // phase 1: per-partition (tokens + EOS) totals — |partitions| longs
    val totals = sorted
      .mapPartitionsWithIndex { (i, it) =>
        val ranks = Bpe.ranksOf(merges)
        val cache = new java.util.HashMap[String, Int]()
        var s = 0L
        it.foreach { case (_, t) => s += Bpe.countTokens(t, ranks, cache) + 1L }
        Iterator.single((i, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val starts = totals.scanLeft(0L)(_ + _)
    // phase 2: same sort instance (skipped stage), re-tokenize, fold
    // per-(doc, seq) partials before anything shuffles
    val partials = sorted.mapPartitionsWithIndex { (i, it) =>
      val ranks = Bpe.ranksOf(merges)
      val cache = new java.util.HashMap[String, Array[String]]()
      var g = starts(i)
      it.flatMap { case (id, t) =>
        val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
        var seq = -1L
        var cnt = 0L
        var csum = 0L
        (Bpe.tokens(t, ranks, cache) ++ Iterator.single(EosToken)).foreach { tok =>
          val s = g / seqLen
          val p = g - s * seqLen
          if (s != seq) {
            if (seq >= 0) buf += Row(seq, id, cnt, csum)
            seq = s; cnt = 0L; csum = 0L
          }
          cnt += 1L
          csum += (p + 1L) * tokKey(tok)
          g += 1L
        }
        if (seq >= 0) buf += Row(seq, id, cnt, csum)
        buf.iterator
      }
    }
    val pdf = spark.createDataFrame(partials, StructType(Seq(
      StructField("seq_id", LongType, nullable = false),
      StructField("doc_id", LongType, nullable = false),
      StructField("cnt", LongType, nullable = false),
      StructField("csum", LongType, nullable = false))))
    // one doc contributes exactly one partial row per sequence it
    // touches, so count(*) IS the distinct-doc count
    pdf.groupBy(col("seq_id"))
      .agg(sum(col("cnt")).as("n_toks"),
        count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"),
        sum(col("csum")).as("checksum"))
      .select(col("seq_id"), col("n_toks"), col("n_docs"),
        col("first_doc"), col("last_doc"), col("checksum"))
  }
}
