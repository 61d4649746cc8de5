package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.types.StructType

/** The one Spark-internal call the V1 streaming source needs, behind
  * the `private[sql]` fence — the same technique every out-of-tree
  * connector uses (Spark's own Kafka source lives in
  * `org.apache.spark.sql.kafka010` precisely so it can call this):
  * a V1 `Source.getBatch` must return a frame whose plan is marked
  * `isStreaming = true`, and the only way to stamp that onto an
  * ARBITRARY computed plan (the CDF batch is joins + explodes, not a
  * file scan) is `internalCreateDataFrame(rdd, schema,
  * isStreaming = true)` over the plan's compiled RDD. Nothing else
  * from the internal surface is touched. */
object GraftShims {

  /** `df`'s rows as a streaming-tagged DataFrame of `schema`. The
    * inner plan is compiled here (analysis + physical planning, no
    * job); it executes when the micro-batch runs. */
  def asStreaming(
      sqlContext: SQLContext, df: DataFrame,
      schema: StructType): DataFrame =
    sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
      .internalCreateDataFrame(
        df.queryExecution.toRdd, schema, isStreaming = true)
}
