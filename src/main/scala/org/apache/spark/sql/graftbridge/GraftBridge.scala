package org.apache.spark.sql.graftbridge

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** The ONE `private[sql]` call a DataSource-V1 streaming `Source`
  * cannot avoid: `getBatch` must hand back a Dataset whose logical
  * plan carries `isStreaming = true` (MicroBatchExecution asserts it),
  * and the only way to tag an already-planned batch frame is
  * `SparkSession.internalCreateDataFrame(rdd, schema, isStreaming)`.
  * Delta's own `DeltaSource` ships the equivalent shim in the
  * `org.apache.spark.sql` namespace for the same reason. Nothing else
  * lives here — every other graft/Spark seam goes through public API. */
object GraftBridge {
  def streamingDf(spark: SparkSession, rdd: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = true)

  /** The inverse, for a streaming SINK: `addBatch` receives an
    * incrementally-planned frame that batch writers refuse; re-wrapping
    * its InternalRow RDD as a plain batch frame (isStreaming = false)
    * is the v1-sink counterpart of the trick above. */
  def batchDf(spark: SparkSession, rdd: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = false)
}
