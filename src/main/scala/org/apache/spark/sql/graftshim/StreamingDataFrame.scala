package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.classic.{Dataset, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.DataFrame

/** The one Spark-internal bridge this library needs: a V1 streaming
  * `Source.getBatch` must return a DataFrame whose plan reports
  * `isStreaming = true` (`MicroBatchExecution` asserts it — "did not
  * have isStreaming=true"), but the public API offers no way to build
  * one from a batch relation. Delta's streaming source solves it the
  * same way (`DeltaLog.createDataFrame(..., isStreaming = true)` lives
  * in an `org.apache.spark.sql.delta` package for exactly this access);
  * here the batch plan's LEAVES are re-tagged and the Dataset rebuilt
  * via the `private[sql]` `Dataset.ofRows`. Nothing else in the library
  * reaches into Spark internals. */
object StreamingDataFrame {

  /** `df`'s analyzed plan with every leaf relation re-tagged as
    * streaming, rebuilt as a DataFrame on `df`'s own session. */
  def asStreaming(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[SparkSession]
    val plan = df.queryExecution.analyzed transform {
      case lr: LogicalRelation => lr.copy(isStreaming = true)
      case lr: LocalRelation => lr.copy(isStreaming = true)
      case lr: LogicalRDD =>
        LogicalRDD(lr.output, lr.rdd, lr.outputPartitioning,
          lr.outputOrdering, isStreaming = true)(spark)
    }
    Dataset.ofRows(spark, plan)
  }

  /** [[asStreaming]]'s exact inverse: re-tag the leaves back to batch.
    * For code that drives a V1 source's `getBatch` directly — outside a
    * running streaming query the batch-side analyzer refuses
    * streaming-tagged leaves, and [[asBatch]] (the SINK bridge) cannot
    * help because it requires the micro-batch's already-planned
    * IncrementalExecution. Used by the source specs to verify window
    * contents offset-by-offset. */
  def asStaticBatch(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[SparkSession]
    val plan = df.queryExecution.analyzed transform {
      case lr: LogicalRelation => lr.copy(isStreaming = false)
      case lr: LocalRelation => lr.copy(isStreaming = false)
      case lr: LogicalRDD =>
        LogicalRDD(lr.output, lr.rdd, lr.outputPartitioning,
          lr.outputOrdering, isStreaming = false)(spark)
    }
    Dataset.ofRows(spark, plan)
  }

  /** The inverse bridge, for a V1 `Sink.addBatch`: the batch DataFrame
    * a sink receives is backed by the micro-batch's IncrementalExecution
    * and cannot be re-planned through arbitrary batch operators; rebuild
    * it as a plain batch DataFrame over the already-planned physical
    * RDD — exactly what `ForeachBatchSink` does before handing users
    * their batch (`LogicalRDD.fromDataset(..., isStreaming = false)`). */
  def asBatch(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[Dataset[org.apache.spark.sql.Row]]
    Dataset.ofRows(ds.sparkSession,
      LogicalRDD.fromDataset(ds.queryExecution.toRdd, ds,
        isStreaming = false))
  }
}
