package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lexical (keyword) retrieval — the classic complement to the RAG
  * module's vector search: BM25-shaped scoring over an on-the-fly
  * posting aggregation, with every arithmetic step in integers so the
  * ranking is bit-reproducible across engines and partitionings.
  *
  * Scoring, deliberately integer-only:
  *  - idf weight w(t) = 64 - bitlen(df(t)) — a log2-scaled rarity
  *    weight (each doubling of document frequency costs one point),
  *    spelled as length(bin(df)) on both engines. A float
  *    ln((N-df+.5)/(df+.5)) would rank identically in spirit but Java
  *    and DuckDB libm logs differ in final ulps, which flips
  *    tie-adjacent ranks and breaks the driver's hash compare.
  *  - tf saturation min(tf, satCap) — BM25's diminishing returns for
  *    repeated terms, the k1-saturation shape without the float ratio.
  *  - score(d) = Σ_t min(tf(t,d), satCap) · w(t), ties broken by
  *    doc_id — a total order.
  *
  * SCALE: the query-term set broadcasts and semi-joins the token
  * stream BEFORE any aggregation, so only tokens matching the query
  * ever shuffle (a full-corpus tf table would be the inverted index —
  * this operator is the query-time path that avoids materializing
  * it); tf partial-aggregates map-side and the final ranking is one
  * TakeOrdered (per-partition heaps, no global sort).
  */
object Lexical {

  /** Top-k documents for a bag of query terms.
    *
    * @param docs       (doc_id, text)
    * @param queryTerms one column `tok` — the query bag (deduplicated
    *                   here; expected tiny, it broadcasts)
    * @param k          result size
    * @param satCap     tf saturation cap (BM25 k1-shape)
    * @return (doc_id, score) — the k highest integer scores,
    *         score desc then doc_id asc
    */
  def lexicalTopK(docs: DataFrame, queryTerms: DataFrame, k: Int,
      satCap: Int = 3): DataFrame = {
    require(k >= 1 && satCap >= 1, s"k=$k, satCap=$satCap must be >= 1")
    val toks = docs.select(col("doc_id"),
        explode(split(trim(lower(col("text"))), "[ \t\n\f\r]+")).as("tok"))
      .where(col("tok") =!= "")
    val hits = toks.join(
      broadcast(queryTerms.select(col("tok")).distinct()), "tok")
    val tf = hits.groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    // tf rows are distinct (doc, tok), so counting them per tok IS the
    // document frequency — no second corpus pass
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), "tok")
      .select(col("doc_id"),
        (least(col("tf"), lit(satCap.toLong)) *
          (lit(64) - length(bin(col("df"))))).as("contrib"))
      .groupBy(col("doc_id")).agg(sum(col("contrib")).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }
}
