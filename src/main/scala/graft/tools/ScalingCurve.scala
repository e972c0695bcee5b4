package graft.tools

import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

/** Thread-count saturation curve for the extraction job — the bounding
  * measurement behind the full-width (8→32) scaling-efficiency figure:
  * docs/sec and JVM GC time at each parallelism level on the SAME
  * staged input, levels visited interleaved (round-robin) so shared-
  * host phases hit every level equally, best visit per level.
  *
  *   runMain graft.tools.ScalingCurve [pages] [visits] [level,level,...]
  *
  * GC time is the delta of the GarbageCollectorMXBean totals across the
  * timed region — local mode runs driver+executors in one JVM, so this
  * is the whole job's collector cost. If per-thread throughput decays
  * while GC share stays flat, the ceiling is memory bandwidth, not
  * collector pressure.
  */
object ScalingCurve {
  private def gcMillis(): Long =
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum

  def main(args: Array[String]): Unit = {
    val pages = if (args.length > 0) args(0).toLong else 480000L
    val visits = if (args.length > 1) args(1).toInt else 3
    val levels = (if (args.length > 2) args(2) else "8,16,24,32")
      .split(",").map(_.trim.toInt).toSeq

    def session(n: Int): SparkSession = {
      val s = SparkSession.builder()
        .master(s"local[$n]")
        .appName(s"scaling-curve-$n")
        .config("spark.sql.shuffle.partitions", n.toString)
        .config("spark.sql.files.maxPartitionBytes", (4 * 1024 * 1024).toString)
        .config("spark.sql.parquet.columnarReaderBatchSize", "64")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }

    // stage once; warm the kernel JIT with a real pass
    val dir = java.nio.file.Files.createTempDirectory("graft-curve").toString
    locally {
      val s = session(32)
      graft.table.SyntheticPages.generate(s, pages, partitions = 128)
        .toDF().write.mode("overwrite").parquet(dir)
      graft.extract.Extract.extractPages(
        graft.table.SyntheticPages.generate(s, 8000, partitions = 32).toDF()).count()
      s.stop()
    }

    case class Obs(secs: Double, gcMs: Long)
    val best = scala.collection.mutable.Map.empty[Int, Obs]
    for (v <- 1 to visits; n <- levels) {
      val s = session(n)
      val in = s.read.parquet(dir)
      val gc0 = gcMillis()
      val t0 = System.nanoTime()
      graft.extract.Extract.extractPages(in).filter(_.succeeded).count()
      val secs = (System.nanoTime() - t0) / 1e9
      val gcMs = gcMillis() - gc0
      s.stop()
      System.gc()
      Thread.sleep(500)
      val o = Obs(secs, gcMs)
      if (!best.contains(n) || o.secs < best(n).secs) best(n) = o
      println(f"visit $v level $n%2d: ${pages / secs}%9.0f docs/s  " +
        f"(${pages / secs / n}%7.1f /thread)  gc=${gcMs}ms (${gcMs / 10.0 / secs}%.1f%% of wall)")
    }
    println("\n== best per level ==")
    val base = best(levels.head)
    levels.foreach { n =>
      val o = best(n)
      val rate = pages / o.secs
      val eff = (rate / (pages / base.secs)) / (n.toDouble / levels.head)
      println(f"local[$n%2d]: $rate%9.0f docs/s  ${rate / n}%7.1f /thread  " +
        f"eff-vs-${levels.head}=${eff}%.3f  gc=${o.gcMs}ms (${o.gcMs / 10.0 / o.secs}%.1f%%)")
    }

    try {
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
      finally walk.close()
    } catch { case scala.util.control.NonFatal(_) => () }
  }
}
