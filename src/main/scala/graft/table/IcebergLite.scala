package graft.table

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.charset.StandardCharsets

/** Iceberg-style table layout over Parquet, implemented thin (no
  * Iceberg jar ships in this sandbox — SURVEY.md §4 note): data files
  * live under `data/unit=<u>/`, and a unit becomes visible only when
  * its manifest entry `manifest/unit-<u>.json` exists. Manifest files
  * are written via tmp + atomic rename (the same commit idea as the
  * reference's index save, file_store.py:246-251, and of Iceberg
  * snapshot commits).
  *
  * This gives the north rule's checkpointed resume: a killed job
  * re-runs only units without manifest entries (uncommitted partial
  * data is overwritten), and readers never see half-written units.
  * Units are the resume granularity — at 10^12 docs you size them so
  * one unit is a few minutes of cluster work (e.g. 10k units).
  *
  * Uses the Hadoop FileSystem API throughout, so the same code runs on
  * HDFS/S3A on a real cluster.
  */
final class IcebergLite(val root: String) extends Serializable {

  private def fs(spark: SparkSession): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def dataPath(unit: Int): String = s"$root/data/unit=$unit"

  /** Manifests are versioned: `unit-<u>-v<k>.json`. A re-publish writes
    * v(k+1) via tmp + atomic rename BEFORE deleting vk, so a committed
    * unit always has at least one manifest entry — first-time publish
    * and re-publish are both atomic for readers (the delete-then-rename
    * window of a fixed filename is gone). Readers use the highest
    * version per unit.
    */
  private def manifestDir = new Path(s"$root/manifest")
  private def manifestPath(unit: Int, version: Int) =
    new Path(s"$root/manifest/unit-$unit-v$version.json")
  private def legacyManifestPath(unit: Int) =
    new Path(s"$root/manifest/unit-$unit.json")

  /** Filesystem path of a parsed (unit, version) entry — version 0 may
    * be a legacy unversioned filename.
    */
  private def entryPath(f: FileSystem, unit: Int, version: Int): Path = {
    val p = manifestPath(unit, version)
    if (version == 0 && !f.exists(p)) legacyManifestPath(unit) else p
  }

  /** (unit, version) pairs parsed from manifest filenames. A legacy
    * unversioned `unit-<u>.json` (written before manifests were
    * versioned) reads as version 0, so pre-upgrade tables stay
    * committed and resumable; the next publish writes v1 and retires
    * the legacy file through the normal superseded-version sweep.
    */
  private def manifestEntries(f: FileSystem): Seq[(Int, Int)] = {
    if (!f.exists(manifestDir)) return Seq.empty
    f.listStatus(manifestDir).toSeq
      .map(_.getPath.getName)
      .collect {
        case n if n.startsWith("unit-") && n.endsWith(".json") && n.contains("-v") =>
          val core = n.stripPrefix("unit-").stripSuffix(".json")
          val cut = core.lastIndexOf("-v")
          (core.substring(0, cut).toInt, core.substring(cut + 2).toInt)
        case n if n.startsWith("unit-") && n.endsWith(".json") &&
            n.stripPrefix("unit-").stripSuffix(".json").forall(_.isDigit) =>
          (n.stripPrefix("unit-").stripSuffix(".json").toInt, 0)
      }
  }

  /** Latest manifest version per committed unit. */
  private def latestVersions(f: FileSystem): Map[Int, Int] =
    manifestEntries(f).groupBy(_._1).map { case (u, vs) => u -> vs.map(_._2).max }

  def isCommitted(spark: SparkSession, unit: Int): Boolean =
    latestVersions(fs(spark)).contains(unit)

  def committedUnits(spark: SparkSession): Seq[Int] =
    latestVersions(fs(spark)).keys.toSeq.sorted

  /** Write one unit's rows and commit it: parquet overwrite into the
    * unit dir, then atomic manifest publish. Idempotent — re-running a
    * committed unit is a no-op for readers; re-running an uncommitted
    * one overwrites its partial data.
    */
  def commitUnit(df: DataFrame, unit: Int,
      metrics: Map[String, String] = Map.empty): Unit = {
    writeData(df, unit)
    publish(df.sparkSession, unit, metrics)
  }

  /** Stage a unit's data files (not yet visible to readers). */
  def writeData(df: DataFrame, unit: Int): Unit =
    df.write.mode("overwrite").parquet(dataPath(unit))

  /** Read back a staged (possibly uncommitted) unit's data. */
  def readUnit(spark: SparkSession, unit: Int): DataFrame =
    spark.read.parquet(dataPath(unit))

  /** Atomically publish a staged unit with lineage + metrics. */
  def publish(spark: SparkSession, unit: Int,
      metrics: Map[String, String] = Map.empty): Unit = {
    val f = fs(spark)
    // lineage: input fingerprint + row/byte counts from the written files
    val written = f.listStatus(new Path(dataPath(unit)))
      .filter(_.getPath.getName.endsWith(".parquet"))
    val bytes = written.map(_.getLen).sum
    val fields = Map(
      "unit" -> unit.toString,
      "files" -> written.length.toString,
      "bytes" -> bytes.toString) ++ metrics
    val json = fields.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k": "${v.replace("\\", "\\\\").replace("\"", "\\\"")}"""" }
      .mkString("{", ", ", "}")
    f.mkdirs(manifestDir)
    val next = latestVersions(f).get(unit) match {
      case Some(v) => v + 1
      case None => 1
    }
    val tmp = new Path(s"$root/manifest/.unit-$unit-v$next.json.tmp")
    val out = f.create(tmp, true)
    out.write(json.getBytes(StandardCharsets.UTF_8))
    out.close()
    f.rename(tmp, manifestPath(unit, next)) // atomic commit of v(next)
    // retire superseded versions (incl. a legacy unversioned file) only
    // after the new one is visible
    manifestEntries(f).filter { case (u, v) => u == unit && v < next }
      .foreach { case (u, v) => f.delete(entryPath(f, u, v), false) }
  }

  /** Read the committed table (only units with manifest entries). */
  def read(spark: SparkSession): DataFrame = {
    val units = committedUnits(spark)
    require(units.nonEmpty, s"no committed units under $root")
    spark.read
      .option("basePath", s"$root/data")
      .parquet(units.map(dataPath): _*)
  }

  /** The manifest itself as a DataFrame (per-unit lineage + metrics),
    * latest version per unit.
    */
  def manifest(spark: SparkSession): DataFrame = {
    val f = fs(spark)
    val latest = latestVersions(f).toSeq.sorted
      .map { case (u, v) => entryPath(f, u, v).toString }
    require(latest.nonEmpty, s"no committed units under $root")
    spark.read.json(latest: _*)
  }

  def drop(spark: SparkSession): Unit = {
    val f = fs(spark)
    if (f.exists(new Path(root))) f.delete(new Path(root), true)
  }
}
