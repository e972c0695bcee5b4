package graft.tools

import org.apache.spark.sql.SparkSession

/** Spark-level extraction overhead probe: same 20k pages, local[1],
  * kernel vs full Dataset path. runMain graft.tools.ProfileSparkExtract
  */
object ProfileSparkExtract {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 20000L
    val spark = SparkSession.builder()
      .master("local[1]")
      .appName("profile-spark-extract")
      .config("spark.sql.shuffle.partitions", "1")
      .config("spark.sql.parquet.columnarReaderBatchSize", "64")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Files.createTempDirectory("pse").toString
    graft.table.SyntheticPages.generate(spark, n, partitions = 4)
      .toDF().write.mode("overwrite").parquet(dir)
    val pages = spark.read.parquet(dir)

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val s = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$label%-30s $sec%8.3f s  ${n / sec}%8.0f pages/s (sink=$s)")
    }

    // warmup both paths
    graft.extract.Extract.extractPages(pages.limit(4000)).count()

    for (_ <- 1 to 2) {
      time("scan only (url+html count)") {
        pages.selectExpr("url", "html").where("html is not null").count()
      }
      time("scan+kernel via mapPartitions") {
        import spark.implicits._
        pages.select("url", "html").as[(String, Array[Byte])]
          .mapPartitions { it =>
            val ex = graft.extract.CascadeExtractor.pooled()
            var ok = 0L
            it.foreach { case (u, h) =>
              if (ex.extract(u, h, graft.extract.CascadeConfig()).succeeded) ok += 1
            }
            Iterator.single(ok)
          }.reduce(_ + _)
      }
      time("full extractPages (encoder out)") {
        graft.extract.Extract.extractPages(pages).filter(_.succeeded).count()
      }
    }
    spark.stop()
  }
}
