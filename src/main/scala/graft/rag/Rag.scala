package graft.rag

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One vector-index row (core/rag/stores/base.py:11-23 → typed).
  * `meta` is the open metadata dict's spill column (same convention as
  * Extracted.extras): the reference's per-chunk metadata projection
  * (rag/stages/index.py:131-148) lands here — chunk_size, total_chunks,
  * overlap_size, extractor — plus any source passthrough keys.
  */
final case class IndexDoc(
    id: String,
    content: String,
    embedding: Array[Float],
    url: String,
    chunk_index: Int,
    title: String,
    meta: Map[String, String] = Map.empty)

/** Vector math as Catalyst higher-order functions — codegen-friendly,
  * no UDFs, stays inside WholeStageCodegen.
  */
object VectorFunctions {
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  /** Cosine similarity with zero-vector guard. Backed by the codegen'd
    * native expression (graft.functions.CosineSimilarity) — the
    * zip_with/aggregate HOF formulation evaluates an interpreted lambda
    * per element and is ~50x slower on 64-dim vectors.
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorExpr.cosineSim(a, b)
}

/** Retrieval engine: embed → index → broadcast-scalar cosine top-k.
  *
  * Scale shape (SURVEY.md §2.5): the query vector is a literal (one
  * broadcast scalar); scoring is a projection over the index table;
  * `orderBy(desc).limit(k)` plans as TakeOrderedAndProject — a
  * distributed top-k with per-partition heaps, no global sort, no
  * shuffle of the full index.
  */
object Rag {

  /** chunks(url, chunk_index, chunk_text[, title]) → index rows.
    * Embedding runs in mapPartitions with a per-partition embedder
    * handle and reference-style batching (100/batch) — the pooled-
    * model pattern (sentence_transformer.py:28-48).
    */
  def buildIndex(chunks: DataFrame, embedder: Embedder = new DeterministicHashEmbedder()): Dataset[IndexDoc] = {
    val spark = chunks.sparkSession
    import spark.implicits._
    val withTitle =
      if (chunks.columns.contains("title")) chunks
      else chunks.withColumn("title", lit(null).cast("string"))
    withTitle
      .select(col("url"), col("chunk_index").cast("int"), col("chunk_text"),
        col("title"))
      .as[(String, Int, String, String)]
      .mapPartitions { it =>
        it.grouped(100).flatMap { batch =>
          val vecs = embedder.embedBatch(batch.map(_._3))
          batch.iterator.zip(vecs.iterator).map { case ((url, ci, text, title), v) =>
            IndexDoc(
              id = url.replace('/', '_').replace(':', '_') + "_chunk_" + ci,
              content = text, embedding = v, url = url, chunk_index = ci,
              title = title)
          }
        }
      }
  }

  /** Cosine top-k search (core/rag/stores/file_store.py:82-127).
    *
    * `parityPostKFilter = true` reproduces the reference quirk of
    * applying metadata filters AFTER the k-cut (can return < k rows
    * even when k matches exist, file_store.py:104-121); false applies
    * them before — the sane default for new callers.
    */
  def search(
      index: DataFrame,
      query: Array[Float],
      topK: Int = 10,
      threshold: Double = 0.0,
      filters: Map[String, String] = Map.empty,
      parityPostKFilter: Boolean = true): DataFrame = {
    val q = typedLit(query.toSeq)
    val scored = index
      .withColumn("score", VectorFunctions.cosine(col("embedding"), q))
      .where(col("score") >= threshold)
    def applyFilters(df: DataFrame): DataFrame =
      filters.foldLeft(df) { case (d, (k, v)) => d.where(col(k) === lit(v)) }
    val base = if (parityPostKFilter) scored else applyFilters(scored)
    // deterministic tiebreak by id (numpy argsort ties are order-
    // dependent; a distributed engine needs a total order)
    val cut = base.orderBy(desc("score"), asc("id")).limit(topK)
    if (parityPostKFilter) applyFilters(cut) else cut
  }

  /** add_documents upsert semantics (file_store.py:46-80): rows whose
    * embedding dimension mismatches are skipped (the reference logs a
    * warning and continues); an incoming id replaces the existing row.
    * The caller commits the result (atomicity = IcebergLite publish,
    * mirroring the reference's tmp+rename save).
    */
  def upsertDocuments(existing: DataFrame, incoming: DataFrame, dim: Int): DataFrame = {
    val valid = incoming.where(size(col("embedding")) === dim)
    existing.join(valid.select("id"), Seq("id"), "left_anti")
      .unionByName(valid)
  }

  /** get_document by id (file_store.py:129-131). */
  def getDocument(index: DataFrame, id: String): DataFrame =
    index.where(col("id") === lit(id))

  /** delete_document as an anti-filter (file_store.py:133-159); the
    * caller rewrites/commits the result.
    */
  def deleteDocument(index: DataFrame, id: String): DataFrame =
    index.where(col("id") =!= lit(id))

  /** Index stats (file_store.py:161-168). */
  def stats(index: DataFrame): DataFrame =
    index.agg(
      count(lit(1)).as("total_documents"),
      max(size(col("embedding"))).as("embedding_dimension"))

  /** Query formatting (core/rag/query.py:109-141): `[Result i, Score:
    * %.3f]\ncontent` joined by `\n\n---\n\n`. Driver-side over <= k rows.
    */
  def formatResults(results: Seq[(String, Double)]): String =
    results.zipWithIndex.map { case ((content, score), i) =>
      // Locale.ROOT: the f-interpolator formats %.3f with the JVM
      // default locale — a comma-decimal locale would break both the
      // reference format and the driver oracle's printf('.') output.
      // Literal \n (not %n): content must pass through untouched.
      String.format(java.util.Locale.ROOT, "[Result %d, Score: %.3f]\n%s",
        Int.box(i + 1), Double.box(score), content)
    }.mkString("\n\n---\n\n")
}
