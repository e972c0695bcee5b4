package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for every probe row, the most recent build row of the
  * same key with buildTime <= probeTime (the canonical time-series
  * operator: trades joined to the prevailing quote, events joined to
  * the last preceding state change).
  *
  * Spark has no native ASOF JOIN; rather than a custom SparkStrategy,
  * this composes built-ins in the classic union-window shape
  * (SURVEY §7.3 preference order — (a) compose built-ins):
  *
  *   1. tag both inputs and UNION them (no join, no fan-out);
  *   2. one window per key, ordered by (time, tag) with build rows
  *      BEFORE probe rows at equal timestamps (ASOF's `>=` tie rule);
  *   3. `last_value(build payload, ignoreNulls)` over the unbounded
  *      preceding frame gives every probe row the prevailing build row;
  *   4. filter back to probe rows.
  *
  * Cost at scale: exactly ONE hash-partition shuffle on the key plus a
  * per-partition sort — the same cost as the sort-merge join a native
  * implementation would do, with no skew surprises beyond what the key
  * distribution already implies. The build side must be unique per
  * (key, time); [[latestPerKeyTime]] pre-aggregates duplicates away
  * (which also pins the otherwise-ambiguous equal-time semantics).
  */
object AsofJoin {

  /** Collapse the build side to one row per (key, time): max payload
    * wins (any deterministic reducer works; the oracle uses the same).
    */
  def latestPerKeyTime(build: DataFrame, key: String, time: String,
      payload: String): DataFrame =
    build.groupBy(col(key), col(time))
      .agg(max(col(payload)).as(payload))

  /** @param probe rows to enrich: key, time, plus carried columns
    * @param build prevailing-state rows: key, time, one payload column
    *              (must be unique per (key, time) — see
    *              [[latestPerKeyTime]])
    * @return probe columns + `asof_<payload>` (null when no build row
    *         precedes the probe)
    */
  def asofJoin(probe: DataFrame, build: DataFrame, key: String,
      time: String, payload: String): DataFrame = {
    val probeCols = probe.columns.toSeq
    // the window value is a non-null STRUCT wrapping the payload, not the
    // bare payload: last(_, ignoreNulls) must skip only the probe rows'
    // sentinel, never a build row whose payload is genuinely NULL —
    // DuckDB's native ASOF (the oracle) matches the most recent row
    // regardless of payload nullness
    val pvType = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("p", build.schema(payload).dataType)))
    val tagged = probe
      .withColumn("__tag", lit(1))
      .withColumn("__pv", lit(null).cast(pvType))
      .select((probeCols.map(col) :+ col("__tag") :+ col("__pv")): _*)
      .unionByName(
        build.select(col(key), col(time), lit(0).as("__tag"),
          struct(col(payload).as("p")).as("__pv")),
        allowMissingColumns = true)
    // build (tag 0) sorts before probe (tag 1) at equal time → `<=` ties
    // resolve to "build row at the same instant matches"
    val w = Window.partitionBy(col(key))
      .orderBy(col(time), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn(s"asof_$payload",
        last(col("__pv"), ignoreNulls = true).over(w).getField("p"))
      .where(col("__tag") === 1)
      .select((probeCols.map(col) :+ col(s"asof_$payload")): _*)
  }
}
