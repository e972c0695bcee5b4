package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** WARC-at-scale evidence (round-4 verdict item 6): stage a deterministic
  * multi-file `.warc.gz` corpus of synthetic pages (few FAT archives — the
  * adversarial layout where one-task-per-file starves the cluster), build
  * the cdx-style sidecar member indexes once, then run the member-split
  * read → extraction cascade at two parallelism levels, interleaved
  * visits, best per level.
  *
  * Reports docs/s at both levels, scaling efficiency, the member-GROUP
  * count vs the archive count (the split-parallelism proof: tasks ≫
  * files), and — at the 10× tier — the data-scaled cost ratio.
  *
  *   runMain graft.tools.WarcScaleBench [pages=60000] [archives=4] [visits=3] [lo=4] [hi=16]
  */
object WarcScaleBench {

  /** Encode `pages` synthetic pages into `archives` .warc.gz files under
    * `dir`, one archive per partition, written executor-side through the
    * Hadoop FS API (no driver materialization). Returns total bytes.
    */
  def stage(spark: SparkSession, dir: String, pages: Long, archives: Int): Long = {
    import spark.implicits._
    graft.table.SyntheticPages.generate(spark, pages, partitions = archives)
      .mapPartitions { it =>
        val hconf = new org.apache.hadoop.conf.Configuration()
        val part = org.apache.spark.TaskContext.getPartitionId()
        val p = new org.apache.hadoop.fs.Path(f"$dir/part-$part%05d.warc.gz")
        val fs = p.getFileSystem(hconf)
        val out = fs.create(p, true)
        var bytes = 0L
        it.foreach { pg =>
          val ts = if (pg.warc_ts == null) "2024-01-01T00:00:00Z"
            else pg.warc_ts.toInstant.toString
          val payload = if (pg.html == null) Array.emptyByteArray else pg.html
          val member = graft.sources.Warc.gzipMember(
            graft.sources.Warc.encodeRecord(pg.url, ts, payload, "resource"))
          out.write(member)
          bytes += member.length
        }
        out.close()
        Iterator.single(bytes)
      }
      .reduce(_ + _)
  }

  def main(args: Array[String]): Unit = {
    val pages = if (args.length > 0) args(0).toLong else 60000L
    val archives = if (args.length > 1) args(1).toInt else 4
    val visits = if (args.length > 2) args(2).toInt else 3
    val lo = if (args.length > 3) args(3).toInt else 4
    val hi = if (args.length > 4) args(4).toInt else 16
    // split size chooses the task granularity: groups ~= corpus_bytes /
    // split. Default 4 MB keeps groups >> hi even for a small staged
    // corpus; production readIndexed defaults to 32 MB (Common-Crawl
    // archives are ~1 GB, so 32 groups per archive there)
    val splitBytes = (if (args.length > 5) args(5).toLong else 4L) * 1024 * 1024

    def session(n: Int): SparkSession = {
      val s = SparkSession.builder()
        .master(s"local[$n]")
        .appName(s"warc-scale-$n")
        .config("spark.sql.shuffle.partitions", n.toString)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }

    val dir = java.nio.file.Files.createTempDirectory("graft-warc-scale").toString
    locally {
      val s = session(32)
      val t0 = System.nanoTime()
      val bytes = stage(s, dir, pages, archives)
      val idx = graft.sources.Warc.writeMemberIndexes(s, dir)
      println(f"[warc-scale] staged $pages pages -> $archives archives, " +
        f"${bytes / 1e6}%.0f MB compressed, $idx indexed, " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s")
      // split-parallelism proof: member groups (tasks) vs archives
      val groups = s.read.textFile(s"$dir/*.warc.gz.idx")
        .select(input_file_name().as("idx"),
          split(col("value"), " ").getItem(0).cast("long").as("off"))
        .groupBy(col("idx"), floor(col("off") / splitBytes).as("grp"))
        .count().count()
      println(s"[warc-scale] member groups = $groups over $archives archives " +
        s"(one task per GROUP, not per archive)")
      // JIT warm-up for the WHOLE timed path (seek + gunzip + WARC
      // parse + cascade), not just the cascade kernel
      graft.extract.Extract.extractPages(
        graft.sources.Warc.readIndexed(s, dir, bytesPerSplit = splitBytes)
          .where(col("succeeded")).select(col("url"), col("html"))).count()
      s.stop()
    }

    val best = scala.collection.mutable.Map.empty[Int, Double]
    for (v <- 1 to visits; n <- Seq(lo, hi)) {
      val s = session(n)
      val t0 = System.nanoTime()
      val rows = graft.sources.Warc.readIndexed(s, dir, bytesPerSplit = splitBytes)
        .where(col("succeeded"))
        .select(col("url"), col("html"))
      val cnt = graft.extract.Extract.extractPages(rows)
        .filter(_.succeeded).count()
      val secs = (System.nanoTime() - t0) / 1e9
      s.stop()
      System.gc(); Thread.sleep(300)
      if (!best.contains(n) || secs < best(n)) best(n) = secs
      println(f"visit $v local[$n%2d]: ${pages / secs}%9.0f docs/s ($cnt extracted, $secs%.2f s)")
    }
    val eff = (pages / best(hi)) / (pages / best(lo)) / (hi.toDouble / lo)
    println(f"\n[warc-scale] best: local[$lo]=${pages / best(lo)}%.0f docs/s " +
      f"local[$hi]=${pages / best(hi)}%.0f docs/s  efficiency $lo->$hi = $eff%.3f")

    try {
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
      finally walk.close()
    } catch { case scala.util.control.NonFatal(_) => () }
  }
}
