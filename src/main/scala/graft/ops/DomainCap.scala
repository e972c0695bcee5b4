package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-domain document caps (the Gopher / C4 curation rule: keep at
  * most N documents per registered domain so no host dominates the
  * training mix).
  *
  * The naive shape — one `row_number` window partitioned by domain —
  * is a skew trap at corpus scale: a hot domain (at 10^12 docs a big
  * host owns billions of rows) lands on ONE reducer, and AQE cannot
  * split a window partition. [[topNPerKey]] is the skew-safe shape:
  *
  *  - phase 1 ranks within (key, physical input partition) — the
  *    partition id is a salt that spreads a hot key over every
  *    upstream task — and keeps each group's top n. Correct because
  *    each row lives in exactly one input partition, so a key's global
  *    top n is a subset of the union of its per-partition top n.
  *  - phase 2 ranks the survivors (≤ n × input-partitions rows per
  *    key, however hot the key) with the exact per-key window.
  *
  * Both phases are plain Catalyst windows — codegen'd, spillable, no
  * kernel. Output = input columns + `rank` (1-based within key).
  */
object DomainCap {

  def topNPerKey(df: DataFrame, keys: Seq[Column], order: Seq[Column],
      n: Int): DataFrame = {
    require(n > 0, s"cap must be positive: $n")
    // withColumn silently REPLACES an existing column — refuse rather
    // than clobber the caller's data (rank is the output contract;
    // __salt/__rn are internal scratch)
    Seq("__salt", "__rn", "rank").foreach(c =>
      require(!df.columns.contains(c), s"input already has a '$c' column"))
    val salted = Window.partitionBy(keys :+ col("__salt"): _*).orderBy(order: _*)
    val exact = Window.partitionBy(keys: _*).orderBy(order: _*)
    df.withColumn("__salt", spark_partition_id())
      .withColumn("__rn", row_number().over(salted))
      .where(col("__rn") <= n)
      .drop("__salt", "__rn")
      .withColumn("rank", row_number().over(exact))
      .where(col("rank") <= n)
  }

  /** The curation rule over a documents table: keep the `cap` longest
    * documents per source domain (ties broken by doc_id — fully
    * deterministic, so a SQL oracle reproduces the exact kept set).
    */
  def domainCap(docs: DataFrame, cap: Int = 5): DataFrame =
    topNPerKey(docs.select(col("doc_id"), col("source"), col("n_chars")),
      keys = Seq(col("source")),
      order = Seq(col("n_chars").desc, col("doc_id").asc),
      n = cap)
}
