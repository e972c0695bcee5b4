package graft.table

import graft.text.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's 4 file formats (core/storage/base.py:66-126) as
  * distributed sinks: each row becomes one envelope line/file-body in a
  * partitioned text dataset. The reference writes one file per document
  * with a wall-clock filename suffix; at 10^12 rows "one file per doc"
  * is an anti-pattern, so rows carry their slug and the envelope body,
  * and files are Spark-partitioned (SURVEY.md §2.1). The envelope
  * BYTES per row match the reference's per-file bytes (pinned in
  * FormatSinkSpec), with the caller supplying the timestamp for
  * determinism.
  */
object FormatSink {

  val SupportedFormats: Set[String] = Set("json", "txt", "ndjson", "md")

  /** df must carry (content, title, url, author, date, timestamp)
    * columns (nullables fine). Returns (slug, body) rows.
    */
  def envelope(df: DataFrame, format: String): DataFrame = {
    require(SupportedFormats.contains(format),
      s"Unsupported format '$format'. Supported formats: ${SupportedFormats.toSeq.sorted.mkString(", ")}")
    val meta = struct(df("title"), df("url"), df("author"), df("date"))
    val body = format match {
      case "json" =>
        TextFunctions.jsonEnvelope(df("content"), meta, df("timestamp"))
      case "ndjson" =>
        TextFunctions.ndjsonEnvelope(df("content"), meta, df("timestamp"))
      case "md" =>
        TextFunctions.mdEnvelope(df("content"), df("title"), df("url"),
          df("author"), df("date"))
      case "txt" => df("content")
    }
    df.select(
      TextFunctions.slug(df("title"), df("url")).as("slug"),
      body.as("body"))
  }

  /** Write the envelopes as a partitioned (slug, body) dataset -- the
    * scale representation (one file per document is an anti-pattern at
    * 10^12 rows).
    */
  def write(df: DataFrame, dir: String, format: String): Unit =
    envelope(df, format).write.mode("overwrite").parquet(dir)

  /** Reference-layout materialization: one `<slug>.<format>` file per
    * row (test/export scale only -- collects to the driver).
    */
  def writeFiles(df: DataFrame, dir: String, format: String): Seq[String] = {
    val rows = envelope(df, format).collect()
    val d = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(d)
    rows.toSeq.map { r =>
      val path = d.resolve(s"${r.getString(0)}.$format")
      java.nio.file.Files.write(path,
        r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      path.toString
    }
  }
}
