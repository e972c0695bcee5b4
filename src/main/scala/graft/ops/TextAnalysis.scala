package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines, expressed as
  * Catalyst columns (codegen'd; no UDFs in the hot path) so the same
  * logic is also expressible as the DuckDB oracle SQL in SparkEntry.
  */
object TextAnalysis {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))
      .cast("long")

  /** BPE-ish pre-tokenizer pattern (GPT-2-style word/number/punct
    * splitting with an attached leading space), simplified to
    * engine-portable ASCII classes with no lookahead so the DuckDB
    * oracle (RE2) runs the identical pattern. The alternation's
    * character classes are disjoint, which makes Java's leftmost-FIRST
    * and RE2's leftmost-LONGEST semantics pick identical matches.
    */
  val BpeTokenPattern: String =
    " ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 \\t\\n\\r]+|[ \\t\\n\\r]+"

  /** Token count under the BPE-ish pre-tokenizer (the budget metric a
    * training pipeline actually bills by, vs whitespace words).
    */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeTokenPattern), lit(0))).cast("long")

  /** Stopword sets per language for the n-gram language heuristic.
    * Word lists are the top function words of each language (public
    * knowledge).
    */
  val langStopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "with", "for", "was"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "für", "von"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "pour", "que", "une", "dans"),
    "es" -> Seq("el", "la", "los", "y", "es", "no", "con", "para", "que", "una"))

  private def hitCount(text: Column, words: Seq[String]): Column =
    regexp_count(lower(text), lit(words.mkString("\\b(", "|", ")\\b")))

  /** n-gram/stopword language-ID heuristic: argmax of per-language
    * function-word hits; ties resolve in en>de>fr>es order; no hits →
    * "und" (undetermined).
    */
  def langId(text: Column): Column = {
    val langs = Seq("en", "de", "fr", "es")
    // explicit argmax with deterministic tie order (en > de > fr > es)
    val c = langs.map(l => l -> hitCount(text, langStopwords(l))).toMap
    when(c("en") > 0 && c("en") >= c("de") && c("en") >= c("fr") && c("en") >= c("es"), "en")
      .when(c("de") > 0 && c("de") >= c("fr") && c("de") >= c("es"), "de")
      .when(c("fr") > 0 && c("fr") >= c("es"), "fr")
      .when(c("es") > 0, "es")
      .otherwise("und")
  }

  /** Heuristic document quality score in [0,1]: combines length,
    * punctuation-terminated structure, stopword presence, and penalizes
    * very short docs and extreme symbol density. Deterministic and
    * SQL-expressible for the oracle.
    */
  def qualityScore(text: Column): Column = {
    val t = trim(text)
    val chars = length(t).cast("double")
    val toks = tokenCount(t).cast("double")
    val sentences = regexp_count(t, lit("[.!?]")).cast("double")
    val stop = hitCount(t, langStopwords("en")).cast("double")
    val symbols = length(regexp_replace(t, "[\\p{L}\\p{N}\\s.,!?;:'\"-]", "")).cast("double")

    val lenScore = least(chars / 500.0, lit(1.0))
    val sentScore = least(sentences / greatest(toks / 25.0, lit(1.0)), lit(1.0))
    val stopScore = least(stop * 10.0 / greatest(toks, lit(1.0)), lit(1.0))
    val symbolPenalty = least(symbols * 5.0 / greatest(chars, lit(1.0)), lit(1.0))
    // basis points via floor — cross-engine bit-stable (see Dedup)
    floor(
      greatest(lit(0.0),
        lenScore * 0.35 + sentScore * 0.25 + stopScore * 0.25 +
          (lit(1.0) - symbolPenalty) * 0.15) * 10000).cast("long")
  }

  /** Whole-document fingerprint: sha256 of the lowercased,
    * whitespace-normalized text (SQL-expressible; the rolling-hash
    * winnowing variant below is the Spark-only scale path).
    */
  def fingerprint(text: Column): Column =
    sha2(regexp_replace(lower(trim(text)), "\\s+", " "), 256)

  /** Winnowing fingerprints (Schleimer et al., public algorithm):
    * rolling k-gram hashes, minimum per window — robust local
    * fingerprints for partial-overlap detection.
    */
  def winnow(text: String, k: Int = 8, window: Int = 4): Array[Long] = {
    if (text == null || text.length < k) return Array.empty
    val n = text.length - k + 1
    val hashes = new Array[Long](n)
    var i = 0
    while (i < n) {
      var h = 1125899906842597L
      var j = 0
      while (j < k) { h = h * 31 + Character.toLowerCase(text.charAt(i + j)); j += 1 }
      h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
      hashes(i) = h
      i += 1
    }
    if (n <= window) return Array(hashes.min)
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var lastMinPos = -1
    i = 0
    while (i + window <= n) {
      var minPos = i
      var j = i + 1
      while (j < i + window) {
        if (hashes(j) <= hashes(minPos)) minPos = j
        j += 1
      }
      if (minPos != lastMinPos) { out += hashes(minPos); lastMinPos = minPos }
      i += 1
    }
    out.toArray
  }

  /** documents(doc_id, text, ...) → per-doc analysis columns. */
  def analyze(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      tokenCount(col("text")).as("n_tokens"),
      langId(col("text")).as("lang_guess"),
      qualityScore(col("text")).as("quality_bp"),
      fingerprint(col("text")).as("fingerprint"))
}
