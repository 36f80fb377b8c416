package org.apache.spark.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.LogicalRDD

/** graft's single, deliberately narrow bridge into `private[sql]`
  * constructors — exists ONLY so `graft.core.Caches.checkpointOnce`
  * can swap a localCheckpoint's backing RDD for a fail-loud wrapper
  * without losing the plan-level output partitioning / ordering /
  * statistics the checkpoint carries (re-deriving the frame through
  * the public `createDataFrame(RDD[Row], schema)` would both pay an
  * InternalRow→Row→InternalRow round trip on every downstream action
  * and reset the partitioning to Unknown, re-introducing shuffles the
  * checkpoint had already paid for).
  */
object GraftSqlBridge { // public: the caller lives in graft.core

  /** The block-backed RDD under a localCheckpoint frame, if the frame
    * is one (analyzed plan = LogicalRDD). */
  def checkpointRddOf(ck: Dataset[Row]): Option[RDD[InternalRow]] =
    ck.queryExecution.analyzed match {
      case l: LogicalRDD => Some(l.rdd)
      case _ => None
    }

  /** `ck`'s plan with its backing RDD swapped for `wrapped`; output
    * attributes, partitioning, ordering, and the effective statistics
    * and constraints are preserved (stats drive downstream broadcast
    * decisions — dropping them would un-broadcast small checkpointed
    * dims). */
  def rewrapCheckpointRdd(ck: Dataset[Row],
      wrapped: RDD[InternalRow]): DataFrame = {
    val l = ck.queryExecution.analyzed.asInstanceOf[LogicalRDD]
    val spark = ck.sparkSession.asInstanceOf[classic.SparkSession]
    val plan = l.copy(rdd = wrapped)(
      spark, Some(l.stats), Some(l.constraints))
    classic.Dataset.ofRows(spark, plan)
  }
}
