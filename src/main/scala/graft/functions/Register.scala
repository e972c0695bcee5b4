package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL registration for the engine's native expressions, so
  * `spark.sql("SELECT cosine_sim(a, b) ...")` works alongside the
  * Column API.
  */
object Register {
  def all(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim",
      exprs => CosineSimilarity(exprs(0), exprs(1)),
      "scala_udf")
  }
}
