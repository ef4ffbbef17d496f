package graft

import org.apache.spark.sql.Dataset

/** Release tooling for eager `Dataset.localCheckpoint` storage.
  *
  * `localCheckpoint` persists an internal RDD that `Dataset.unpersist`
  * does not see (unpersist consults the plan cache only), so iterative
  * algorithms and checkpoint-returning operators would otherwise pin
  * every checkpoint in executor storage until session end.
  */
object Checkpoints {

  /** Frees the executor storage behind every eager localCheckpoint
    * reachable from `df`'s plan (its `LogicalRDD` leaves). Call once the
    * data has been consumed — any later action on a plan referencing the
    * checkpoint would fail or recompute from nothing.
    */
  def release(df: Dataset[_]): Unit =
    df.queryExecution.analyzed.foreach {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd.unpersist(false)
      case _ => ()
    }
}
