package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join — match each point row to the interval rows of
  * the same key that contain its timestamp. Spark plans a raw
  * `t BETWEEN start AND end` join predicate as BroadcastNestedLoop or
  * Cartesian (the classic range-join trap); this composes the standard
  * time-bucket decomposition instead:
  *
  *   1. each interval EXPLODES to the fixed-width buckets it covers
  *      (sessions/windows are short, so this is a small constant
  *      fan-out — pick bucketWidth near the typical interval length);
  *   2. each point maps to exactly ONE bucket;
  *   3. equi-join on (key, bucket) — an ordinary hash join Catalyst can
  *      shuffle or broadcast;
  *   4. exact range filter on the survivors.
  *
  * A (point, interval) pair meets in exactly one bucket (the point's),
  * so no dedup pass is needed. Cost at scale: one equi-shuffle of
  * points + intervals×(avg buckets per interval) — never |points| ×
  * |intervals|.
  */
object RangeJoin {

  /** @param points    rows with `key` and timestamp column `ptTime`
    * @param intervals rows with `key`, `startCol`, `endCol` (inclusive)
    * @param bucketWidthUs bucket width in microseconds
    * @return points joined with their containing interval's columns
    */
  def bucketIntervalJoin(points: DataFrame, intervals: DataFrame,
      key: String, ptTime: String, startCol: String, endCol: String,
      bucketWidthUs: Long = 3600L * 1000000): DataFrame = {
    val iv = intervals.withColumn("__bucket",
      explode(sequence(
        floor(unix_micros(col(startCol).cast("timestamp")) / bucketWidthUs),
        floor(unix_micros(col(endCol).cast("timestamp")) / bucketWidthUs))))
    val pt = points.withColumn("__bucket",
      floor(unix_micros(col(ptTime).cast("timestamp")) / bucketWidthUs))
    pt.join(iv, Seq(key, "__bucket"))
      .where(col(ptTime) >= col(startCol) && col(ptTime) <= col(endCol))
      .drop("__bucket")
  }
}
