package graft.jobs

import graft.extract.{CascadeConfig, Extract}
import graft.rag.{DeterministicHashEmbedder, Embedder, IndexDoc, Rag}
import graft.table.IcebergLite
import graft.text.{ChunkConfig, Chunker}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The RAG-side pipelines (reference core/rag/pipeline.py): one lazy
  * DAG per job, one action, shuffle-free until the index write (chunk
  * ids derive from url + chunk_index — SURVEY.md §3.2).
  */
object RagJobs {

  /** pages → extract → chunk → embed → Dataset[IndexDoc]
    * (build_index_from_url semantics, rag/pipeline.py:156-202, as a
    * distributed DAG).
    */
  def buildIndex(
      pages: DataFrame,
      cascade: CascadeConfig = CascadeConfig(),
      chunk: ChunkConfig = ChunkConfig(),
      embedder: Embedder = new DeterministicHashEmbedder()): Dataset[IndexDoc] = {
    val spark = pages.sparkSession
    import spark.implicits._
    Extract.extractPages(pages, cascade)
      .filter(_.succeeded)
      .flatMap { e =>
        Chunker.chunkWithMeta(e.extracted_text, chunk).map { c =>
          (e.url, c.chunk_id, c.text, e.title,
            // per-chunk metadata projection (rag/stages/index.py:131-148)
            Map(
              "chunk_size" -> c.chunk_size.toString,
              "total_chunks" -> c.total_chunks.toString,
              "overlap_size" -> c.overlap_size.toString,
              "extractor" -> e.strategy_used) ++ e.extras)
        }
      }
      .mapPartitions { it =>
        val emb = embedder
        it.grouped(100).flatMap { batch => // reference batching (100)
          val vecs = emb.embedBatch(batch.map(_._3))
          batch.iterator.zip(vecs.iterator).map { case ((url, ci, text, title, meta), v) =>
            IndexDoc(
              id = url.replace('/', '_').replace(':', '_') + "_chunk_" + ci,
              content = text, embedding = v, url = url, chunk_index = ci,
              title = title, meta = meta)
          }
        }
      }
  }

  /** Index build + committed write (IcebergLite unit 0; callers with
    * many input units loop like ExtractJob.runUnits).
    */
  def buildAndWrite(pages: DataFrame, out: IcebergLite): Long = {
    val idx = buildIndex(pages).toDF()
    out.writeData(idx, 0)
    val n = out.readUnit(pages.sparkSession, 0).count()
    out.publish(pages.sparkSession, 0, Map("rows" -> n.toString))
    n
  }

  /** Query an index table: embed the query text driver-side (1 string),
    * broadcast-scalar top-k, format (reference §3.3; one collect of
    * <= k rows).
    */
  def query(
      index: DataFrame,
      queryText: String,
      topK: Int = 10,
      threshold: Double = 0.0,
      embedder: Embedder = new DeterministicHashEmbedder()): String = {
    val qv = embedder.embedBatch(Seq(queryText)).head
    val rows = Rag.search(index, qv, topK, threshold)
      .select(col("content"), col("score"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    Rag.formatResults(rows.toSeq)
  }
}
