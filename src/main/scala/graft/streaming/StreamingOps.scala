package graft.streaming

import graft.extract.{CascadeConfig, Extract}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming paths. The reference is batch-only
  * (ARCHITECTURE.md:241-244 lists event-driven as future work), so these
  * are capability extensions, not parity surface: the same extraction
  * kernel and the same declarative aggregations run over `readStream`
  * sources with watermarks and checkpointed sinks.
  */
object StreamingOps {

  /** Tumbling-window event aggregation over a parquet event stream.
    * Complete output mode + memory sink: after processAllAvailable the
    * result equals the equivalent batch GROUP BY (the oracle in
    * SparkEntry relies on this).
    */
  def windowedEventCounts(spark: SparkSession, eventsPath: String,
      queryName: String = "graft_stream_events"): DataFrame = {
    // FileStreamSource requires a directory; stage a lone file into one
    val srcDir = {
      val p = java.nio.file.Paths.get(eventsPath)
      if (java.nio.file.Files.isDirectory(p)) eventsPath
      else {
        val d = java.nio.file.Files.createTempDirectory("graft-stream-src")
        java.nio.file.Files.copy(p, d.resolve(p.getFileName))
        d.toString
      }
    }
    val schema = spark.read.parquet(srcDir).schema
    val stream = spark.readStream.schema(schema).parquet(srcDir)
    val agg = stream
      // parquet carries TIMESTAMP_NTZ; watermarks need TIMESTAMP (UTC session)
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "2 days")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("w.start").as("day"), col("event_type"), col("n"), col("sum_value"))
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }

  /** Streaming extraction: a growing directory of page parquet files →
    * cascade → checkpointed parquet sink (exactly-once file sink; the
    * streaming analogue of ExtractJob's manifest resume).
    */
  def streamingExtract(spark: SparkSession, pagesDir: String,
      outDir: String, checkpointDir: String,
      cfg: CascadeConfig = CascadeConfig()): Unit = {
    val schema = spark.read.parquet(pagesDir).schema
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "16")
      .parquet(pagesDir)
    val extracted = Extract.extractPages(stream, cfg).toDF()
    val q = extracted.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
  }
}
