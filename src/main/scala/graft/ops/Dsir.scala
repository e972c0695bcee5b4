package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DSIR-style data selection with importance resampling (Xie et al.
  * 2023, "Data Selection for Language Models via Importance
  * Resampling" — public idea): score every raw-corpus document by how
  * much more likely its hashed n-gram features are under a TARGET
  * distribution (a small trusted/high-quality subset) than under the
  * raw corpus, then keep the top-k.
  *
  * This is the data-SELECTION stage of a pretraining pipeline (decide
  * what to train on), distinct from the quality-CLASSIFIER stage
  * (TextAnalysis.nbClassify scores docs against a labeled model): DSIR
  * needs no labels beyond "these documents are the target domain", its
  * features are hashed unigrams+bigrams (fixed B buckets, so the model
  * is corpus-size-independent), and its output is a ranked selection.
  *
  * Scale shape — the whole operator is two kernel scans and one
  * k-bounded sort:
  *  1. count pass: per-partition long[2B] accumulators; the ONLY
  *     exchange is ≤ B (bucket, target_partial, raw_partial) rows per
  *     partition (B = 4096 → KBs), map-side-combined by construction.
  *     Document text never shuffles.
  *  2. the B-row bucket table collects to the driver (bounded by B,
  *     not the corpus — the lm_train/|alphabet|² discipline) where each
  *     bucket gets an EXACT integer millibit log-ratio
  *     λ_mb[b] = floor(1000·log2( (c_t[b]+1)(N_r+B) / ((c_r[b]+1)(N_t+B)) ))
  *     (add-one smoothing; BigInteger floor, no libm) — the weight
  *     array broadcasts at 8·B bytes.
  *  3. score pass: per-row λ-sum over the doc's feature occurrences —
  *     zero exchange. Selection is orderBy+limit(k) =
  *     TakeOrderedAndProject (per-partition heaps), joined back as a
  *     broadcast flag.
  *
  * Tokenization matches nbTokens' rule (trim, per-code-point
  * lowercase, split on Python-\s [ \t\n\f\r]+); features are unigrams
  * and space-joined bigrams, hashed with the same FNV-1a+mix
  * fingerprint the line dedup uses, bucketed mod B.
  */
object Dsir {

  val DefaultBuckets = 4096

  private[graft] def tokenize(text: String): Array[String] = {
    if (text == null) return Array.empty
    val cps = text.codePoints().map(Character.toLowerCase(_)).toArray
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    var start = -1
    while (i <= cps.length) {
      val isWs = i == cps.length || (cps(i) match {
        case ' ' | '\t' | '\n' | '\f' | '\r' => true
        case _ => false
      })
      if (isWs) {
        if (start >= 0) { out += new String(cps, start, i - start); start = -1 }
      } else if (start < 0) start = i
      i += 1
    }
    out.toArray
  }

  /** Feature buckets of one document: every unigram and every
    * consecutive space-joined bigram, fingerprinted and bucketed mod B
    * (occurrence counts, not presence — DSIR's multinomial estimate).
    */
  private[graft] def featureBuckets(text: String, b: Int): Array[Int] = {
    val toks = tokenize(text)
    val out = new Array[Int](if (toks.length == 0) 0 else 2 * toks.length - 1)
    var i = 0
    while (i < toks.length) {
      out(i) = java.lang.Math.floorMod(Dedup.lineHash(toks(i)), b.toLong).toInt
      i += 1
    }
    i = 0
    while (i + 1 < toks.length) {
      out(toks.length + i) =
        java.lang.Math.floorMod(Dedup.lineHash(toks(i) + " " + toks(i + 1)), b.toLong).toInt
      i += 1
    }
    out
  }

  /** The bucket count table: (bucket, c_target, c_raw) — raw counts
    * include the target rows (the target set IS part of the corpus,
    * as in the paper's raw/target framing over overlapping supports).
    * Exchange bounded at B rows per partition.
    */
  def bucketCounts(docs: DataFrame, isTarget: org.apache.spark.sql.Column,
      b: Int = DefaultBuckets): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("text"), isTarget.as("is_target"))
      .as[(String, Boolean)]
      .mapPartitions { it =>
        val tgt = new Array[Long](b)
        val raw = new Array[Long](b)
        it.foreach { case (text, isT) =>
          val fs = featureBuckets(text, b)
          var i = 0
          while (i < fs.length) {
            raw(fs(i)) += 1
            if (isT) tgt(fs(i)) += 1
            i += 1
          }
        }
        (0 until b).iterator
          .filter(j => raw(j) != 0 || tgt(j) != 0)
          .map(j => (j, tgt(j), raw(j)))
      }
      .toDF("bucket", "c_target", "c_raw")
      .groupBy(col("bucket"))
      .agg(sum(col("c_target")).as("c_target"), sum(col("c_raw")).as("c_raw"))
  }

  /** Exact integer millibit importance weights per bucket, as a plain
    * array indexed by bucket (zero-count buckets get the smoothed
    * floor too — a doc can only hit them via hash collision at apply
    * time if the corpus changed, and the smoothing keeps that defined).
    */
  def importanceWeights(docs: DataFrame, isTarget: org.apache.spark.sql.Column,
      b: Int = DefaultBuckets): Array[Long] = {
    val rows = bucketCounts(docs, isTarget, b).collect()
    var nT = 0L; var nR = 0L
    rows.foreach { r => nT += r.getLong(1); nR += r.getLong(2) }
    val w = new Array[Long](b)
    var j = 0
    while (j < b) {
      w(j) = TextAnalysis.floorMillibitLog2Rat(1L, nR + b, 1L, nT + b)
      j += 1
    }
    rows.foreach { r =>
      w(r.getInt(0)) = TextAnalysis.floorMillibitLog2Rat(
        r.getLong(1) + 1, nR + b, r.getLong(2) + 1, nT + b)
    }
    w
  }

  /** Score + select: every doc gets its integer importance score;
    * `selected` marks the top-k by (score desc, doc_id asc).
    *
    * @return (doc_id, score_mb, selected)
    */
  def selectTopK(docs: DataFrame, isTarget: org.apache.spark.sql.Column,
      k: Int, b: Int = DefaultBuckets): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(importanceWeights(docs, isTarget, b))
    val scored = docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val w = bc.value
        it.map { case (id, text) =>
          val fs = featureBuckets(text, w.length)
          var s = 0L
          var i = 0
          while (i < fs.length) { s += w(fs(i)); i += 1 }
          (id, s)
        }
      }
      .toDF("doc_id", "score_mb")
      // two consumers below (top-k and the flag join): materialize the
      // (doc_id, score) pairs — 16 bytes/doc — so the tokenize/featurize/
      // score kernel scans the corpus ONCE, not once per consumer
      // (ADVICE r05; the prefixJaccardPairs multi-consumer pattern)
      .localCheckpoint(true)
    val top = scored.orderBy(col("score_mb").desc, col("doc_id").asc)
      .limit(k).select(col("doc_id"), lit(true).as("selected"))
    scored.join(broadcast(top), Seq("doc_id"), "left")
      .select(col("doc_id"), col("score_mb"),
        coalesce(col("selected"), lit(false)).as("selected"))
  }
}
