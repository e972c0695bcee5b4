package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Contiguous budget sharding — the pretraining-prep step that cuts an
  * ordered corpus into ~budget-sized shards (tokens or bytes) for
  * sequential writers: shard = floor(exclusive-prefix-sum(weight) /
  * budget), offset = prefix − shard·budget. Every doc lands wholly in
  * one shard; shard boundaries are deterministic in (order, weights)
  * only.
  *
  * The naive Spark spelling — `sum(w).over(Window.orderBy(id))` with no
  * partition key — collapses the whole corpus onto ONE task (Spark
  * plans an un-partitioned window as a single partition; the same trap
  * as domain_cap's hot key, but for every row). The scale shape is the
  * textbook two-phase prefix sum:
  *
  *  - phase 1: one pass computes each sorted partition's weight TOTAL
  *    (one long per partition collected — bounded by partition count);
  *  - phase 2: each partition streams its rows adding its starting
  *    offset (the sum of all earlier partitions' totals).
  *
  * Both passes share the ONE range-partitioned sort via the same
  * underlying RDD (a deliberate RDD-level island: Dataset actions
  * re-plan per action and would re-sort; holding the RDD instance makes
  * Spark skip the sort stage in phase 2 — visible as a "skipped stage").
  */
object Sharding {

  def shardByBudget(docs: DataFrame, weight: String, budget: Long,
      idCol: String = "doc_id"): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val spark = docs.sparkSession
    val rdd = docs
      // null weight ≡ 0, matching the SQL oracle's sum() which skips
      // nulls in the running prefix (and Row.getLong would NPE); a
      // null ID has no defined position in the shard order — dropped,
      // with the oracle carrying the same `doc_id IS NOT NULL` filter
      .where(col(idCol).isNotNull)
      .select(col(idCol).cast("long").as("id"),
        coalesce(col(weight).cast("long"), lit(0L)).as("w"))
      .orderBy(col("id"))
      .rdd
      .map(r => (r.getLong(0), r.getLong(1)))
    val totals = rdd
      .mapPartitionsWithIndex { (i, it) =>
        var s = 0L
        it.foreach(s += _._2)
        Iterator.single((i, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val starts = totals.scanLeft(0L)(_ + _) // starts(i) = sum of earlier partitions
    val out = rdd.mapPartitionsWithIndex { (i, it) =>
      var prefix = starts(i)
      it.map { case (id, w) =>
        val shard = prefix / budget
        val off = prefix - shard * budget
        prefix += w
        Row(id, shard, off)
      }
    }
    spark.createDataFrame(out, StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("shard", LongType, nullable = false),
      StructField("shard_offset", LongType, nullable = false))))
  }
}
