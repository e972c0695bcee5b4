package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship: the extraction cascade (the north-star operator) over the
    * deterministic synthetic pages corpus. Driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("cascade_extract")(spark, "/root/testdata/sf0.001")

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Synthetic-page count scaled to the sf tier of `dir`. */
  private def pagesFor(dir: String): Long =
    if (dir.contains("sf0.1")) 20000L
    else if (dir.contains("sf0.01")) 5000L
    else 1000L

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_price"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    // The cascade extractor (SURVEY.md §2.2/§2.4): synthetic pages →
    // Dataset[Extracted]; per-row, shuffle-free; not SQL-expressible →
    // rows-only driver check; byte-level correctness is pinned by the
    // frozen goldens in GoldenSpec.
    "cascade_extract" -> ((s, dir) => {
      val pages = graft.table.SyntheticPages.generate(s, pagesFor(dir))
      graft.extract.Extract.extractPages(pages.toDF())
        .toDF()
        .select(col("url"), col("strategy_used"), col("succeeded"),
          col("partial"), length(col("extracted_text")).as("text_len"),
          col("title"), col("failure_reason"))
        .orderBy(col("url"))
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        |round(sum(l_extendedprice), 2) AS sum_price,
        |round(avg(l_discount), 6) AS avg_disc,
        |count(*) AS n FROM lineitem GROUP BY 1,2 ORDER BY 1,2""".stripMargin
  )
}
