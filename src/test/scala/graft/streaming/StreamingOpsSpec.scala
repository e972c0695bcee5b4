package graft.streaming

import graft.table.SyntheticPages
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class StreamingOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("streaming-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("windowed event counts equal the batch equivalent") {
    val path = "/root/testdata/sf0.001/events.parquet"
    val streamed = StreamingOps.windowedEventCounts(spark, path, "spec_events")
      .orderBy("day", "event_type").collect()
    val batch = spark.read.parquet(path)
      .withColumn("ts", col("ts").cast("timestamp"))
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("w.start").as("day"), col("event_type"), col("n"), col("sum_value"))
      .orderBy("day", "event_type").collect()
    assert(streamed.length == batch.length && streamed.nonEmpty)
    streamed.zip(batch).foreach { case (s, b) => assert(s == b) }
  }

  test("streaming extraction: incremental files, checkpointed resume, no reprocessing") {
    val pagesDir = Files.createTempDirectory("stream-pages").toString
    val outDir = Files.createTempDirectory("stream-out").toString + "/data"
    val ckDir = Files.createTempDirectory("stream-ck").toString

    // batch 1 arrives
    SyntheticPages.generate(spark, 100, partitions = 2).toDF()
      .write.mode("append").parquet(pagesDir)
    StreamingOps.streamingExtract(spark, pagesDir, outDir, ckDir)
    val n1 = spark.read.parquet(outDir).count()
    assert(n1 == 100)

    // batch 2 arrives; restart processes ONLY the new files
    SyntheticPages.generate(spark, 50, partitions = 2).toDF()
      .withColumn("url", concat(lit("b2-"), col("url")))
      .write.mode("append").parquet(pagesDir)
    StreamingOps.streamingExtract(spark, pagesDir, outDir, ckDir)
    val out = spark.read.parquet(outDir)
    assert(out.count() == 150)
    assert(out.where(col("url").startsWith("b2-")).count() == 50)
    // no duplicates — exactly-once sink semantics
    assert(out.select("url").distinct().count() == 150)
  }
}
