package graft.jobs

import graft.extract.CascadeConfig
import graft.table.{IcebergLite, SyntheticPages}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** spark-submit CLI mirroring the reference's verbs
  * (core/cli/app.py: info, extract, build_rag, query, test_pipeline).
  * The `--async` flag of the reference becomes partition parallelism —
  * here the `--cpus` option (SURVEY.md §2.7).
  *
  * Usage:
  *   graft.jobs.Cli info
  *   graft.jobs.Cli extract   <pagesParquet|synth:N> <outTable> [--min-length N] [--units N]
  *   graft.jobs.Cli build_rag <pagesParquet|synth:N> <indexTable>
  *   graft.jobs.Cli query     <indexTable> <text...> [--top-k N]
  *   graft.jobs.Cli test_pipeline <workDir>
  */
object Cli {

  private def session(cpus: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-cli")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.columnarReaderBatchSize", "64")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def loadPages(spark: SparkSession, src: String): DataFrame =
    if (src.startsWith("synth:"))
      SyntheticPages.generate(spark, src.stripPrefix("synth:").toLong).toDF()
    else spark.read.parquet(src)

  private def opt(args: Array[String], name: String): Option[String] = {
    val i = args.indexOf(name)
    if (i >= 0 && i + 1 < args.length) Some(args(i + 1)) else None
  }

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) { println(usage); sys.exit(2) }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    args(0) match {
      case "info" =>
        println("graft scragspark engine — strategies: newspaper, readability, http; " +
          "processors: normalize_whitespace, chunking; storage: json, txt, ndjson, md; " +
          "index: IcebergLite parquet + manifest; embedder: deterministic-hash dim 384")

      case "extract" =>
        val spark = session(cpus)
        val pages = loadPages(spark, args(1))
        val out = new IcebergLite(args(2))
        val minLen = opt(args, "--min-length").map(_.toInt).getOrElse(200)
        val units = opt(args, "--units").map(_.toInt).getOrElse(8)
        val cfg = ExtractJobConfig(nUnits = units, partitionsPerUnit = cpus.toInt,
          cascade = CascadeConfig(minContentLength = minLen))
        // units = row-id ranges over the staged input
        val withUnit = pages.withColumn("unit",
          pmod(xxhash64(col("url")), lit(units)).cast("int"))
        withUnit.cache()
        val ran = ExtractJob.runUnits(spark,
          u => withUnit.where(col("unit") === u), out, cfg)
        val rows = out.read(spark).count()
        val okRows = out.read(spark).where(col("succeeded")).count()
        println(s"extract: units_run=${ran.size} rows=$rows succeeded=$okRows " +
          s"failed=${rows - okRows}")
        spark.stop()

      case "build_rag" =>
        val spark = session(cpus)
        val pages = loadPages(spark, args(1))
        val out = new IcebergLite(args(2))
        val n = RagJobs.buildAndWrite(pages, out)
        println(s"build_rag: indexed_count=$n index=${args(2)}")
        spark.stop()

      case "query" =>
        val spark = session(cpus)
        val index = new IcebergLite(args(1)).read(spark)
        val topK = opt(args, "--top-k").map(_.toInt).getOrElse(10)
        val text = args.drop(2).filterNot(a => a.startsWith("--") ||
          opt(args, "--top-k").contains(a)).mkString(" ")
        println(RagJobs.query(index, text, topK))
        spark.stop()

      case "test_pipeline" =>
        // end-to-end smoke: extract -> build_rag -> query (cli/app.py:453-643)
        val work = args(1)
        val spark = session(cpus)
        val pages = SyntheticPages.generate(spark, 500).toDF()
        val extracted = new IcebergLite(s"$work/extracted")
        val ran = ExtractJob.runUnits(spark,
          u => pages.where(pmod(xxhash64(col("url")), lit(4)) === u),
          extracted, ExtractJobConfig(nUnits = 4, partitionsPerUnit = cpus.toInt))
        val index = new IcebergLite(s"$work/index")
        val n = RagJobs.buildAndWrite(pages, index)
        val answer = RagJobs.query(index.read(spark), "analytics engine processes data", 3)
        println(s"test_pipeline: extract_units=${ran.size} indexed=$n\n$answer")
        spark.stop()

      case other =>
        println(s"unknown command '$other'\n$usage"); sys.exit(2)
    }
  }

  private val usage: String =
    """usage: graft.jobs.Cli <info|extract|build_rag|query|test_pipeline> [args]""".stripMargin
}
