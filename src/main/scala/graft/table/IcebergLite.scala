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
  private def manifestPath(unit: Int) = new Path(s"$root/manifest/unit-$unit.json")

  def isCommitted(spark: SparkSession, unit: Int): Boolean =
    fs(spark).exists(manifestPath(unit))

  def committedUnits(spark: SparkSession): Seq[Int] = {
    val dir = new Path(s"$root/manifest")
    val f = fs(spark)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("unit-") && n.endsWith(".json") =>
        n.stripPrefix("unit-").stripSuffix(".json").toInt
      }.sorted
  }

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
    val tmp = new Path(s"$root/manifest/.unit-$unit.json.tmp")
    f.mkdirs(new Path(s"$root/manifest"))
    val out = f.create(tmp, true)
    out.write(json.getBytes(StandardCharsets.UTF_8))
    out.close()
    if (f.exists(manifestPath(unit))) f.delete(manifestPath(unit), false)
    f.rename(tmp, manifestPath(unit))
  }

  /** Read the committed table (only units with manifest entries). */
  def read(spark: SparkSession): DataFrame = {
    val units = committedUnits(spark)
    require(units.nonEmpty, s"no committed units under $root")
    spark.read
      .option("basePath", s"$root/data")
      .parquet(units.map(dataPath): _*)
  }

  /** The manifest itself as a DataFrame (per-unit lineage + metrics). */
  def manifest(spark: SparkSession): DataFrame =
    spark.read.json(s"$root/manifest/unit-*.json")

  def drop(spark: SparkSession): Unit = {
    val f = fs(spark)
    if (f.exists(new Path(root))) f.delete(new Path(root), true)
  }
}
