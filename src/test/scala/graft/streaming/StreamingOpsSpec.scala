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

  test("stream-stream interval join equals the batch join") {
    val path = "/root/testdata/sf0.001/events.parquet"
    val streamed = StreamingOps.streamStreamJoin(spark, path,
        queryNameBase = "spec_stream_join")
      .orderBy("click_id", "purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ev = spark.read.parquet(path)
      .withColumn("ts", col("ts").cast("timestamp"))
    val batch = ev.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("cts"))
      .join(ev.where(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"),
            col("user_id").as("pu"), col("ts").as("pts")),
        col("user_id") === col("pu") && col("pts") >= col("cts") &&
          col("pts") <= col("cts") + expr("interval 30 minutes"))
      .select("click_id", "purchase_id", "user_id")
      .orderBy("click_id", "purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(streamed.toSeq == batch.toSeq)
  }

  test("streaming ingest dedup drops re-delivered duplicates to the batch distinct set") {
    val path = "/root/testdata/sf0.001/documents.parquet"
    val streamed = StreamingOps.streamDedup(spark, path,
        queryNameBase = "spec_stream_dedup")
      .collect().map(_.getString(0)).sorted.toSeq
    val batch = spark.read.parquet(path)
      .select(sha2(col("text"), 256)).distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    assert(streamed.nonEmpty && streamed == batch,
      "append-mode dedup output must equal the batch DISTINCT hash set")
    // the simulated re-delivery really produced duplicate inputs: every
    // 3rd doc twice => without dedup the stream would carry more rows
    val docs = spark.read.parquet(path).count()
    assert(streamed.length <= docs && docs / 3 > 0)
  }

  test("streaming incremental dedup: union of per-batch pairs equals one-shot mining, any batch split") {
    val path = "/root/testdata/sf0.001/documents.parquet"
    def pairsOf(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(p => (p._1, p._2)).toSeq
    val docs = spark.read.parquet(path).where(col("doc_id") < 2000)
    val isNew = pmod(col("doc_id"), lit(5)) === 0
    val oneShot = pairsOf(graft.ops.Dedup.incrementalNearDupPairs(
      graft.ops.Dedup.lshBandIndex(docs.where(!isNew), 64, 32, 3),
      docs.where(!isNew), docs.where(isNew),
      threshold = 0.8, numHashes = 64, bands = 32, shingleSize = 3))
    // two different micro-batch splits must both equal the one-shot set
    for (n <- Seq(1, 3)) {
      val streamed = pairsOf(
        StreamingOps.streamIncrementalDedup(spark, path, nBatches = n))
      assert(streamed.nonEmpty && streamed == oneShot,
        s"nBatches=$n: stream pair set must equal one-shot mining")
    }
  }

  test("stateful sessionization (flatMapGroupsWithState) matches batch sessions past the watermark") {
    val sfDir = "/root/testdata/sf0.001"
    val gapMs = 30L * 60 * 1000
    val streamed = StreamingOps
      .sessionizeStream(spark, s"$sfDir/events.parquet", "sos_sessions")
      .collect() // SessionOut bounds are epoch micros; compare at ms like batch getTime
      .map(r => (r.getLong(0), r.getLong(1) / 1000, r.getLong(2) / 1000,
        r.getLong(3), r.getDouble(4)))
    assert(streamed.nonEmpty)

    // batch truth: the same gap sessionization computed with windows
    // (parquet ts is TIMESTAMP_NTZ; cast like the stream ingest does)
    val batch = graft.SparkEntry.queries("events_sessionize")(spark, sfDir)
      .withColumn("start_ts", col("start_ts").cast("timestamp"))
      .withColumn("end_ts", col("end_ts").cast("timestamp"))
      .collect()
      .map(r => (r.getLong(0),
        r.getAs[java.sql.Timestamp]("start_ts").getTime,
        r.getAs[java.sql.Timestamp]("end_ts").getTime,
        r.getLong(2), r.getDouble(5)))
    val watermark = batch.map(_._3).max // delay 0s → wm = max event ts
    // sessions whose close deadline passed the final watermark MUST have
    // been flushed by the event-time timeout; later ones stay open in
    // state (correct unbounded-stream semantics). Leave a 1ms guard band
    // around the exact-boundary case.
    val mustFlush = batch.filter(_._3 + gapMs < watermark - 1)
    val mayFlush = batch.filter(_._3 + gapMs <= watermark + 1).map(k => (k._1, k._2)).toSet
    val streamedKeys = streamed.map(s => (s._1, s._2)).toSet
    mustFlush.foreach { b =>
      val hit = streamed.find(s => s._1 == b._1 && s._2 == b._2)
      assert(hit.isDefined, s"session not flushed: $b")
      val s = hit.get
      assert(s._3 == b._3 && s._4 == b._4, s"session shape diverged: $s vs $b")
      assert(math.abs(s._5 - b._5) < 0.011) // batch side is round(.,2)
    }
    // and nothing is emitted that batch doesn't have
    assert(streamedKeys.subsetOf(mayFlush))
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
