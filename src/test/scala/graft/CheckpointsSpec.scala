package graft

import org.scalatest.funsuite.AnyFunSuite

class CheckpointsSpec extends AnyFunSuite with SparkTestSession {

  test("release frees the executor storage behind an eager localCheckpoint") {
    import spark.implicits._
    val df = Seq(1, 2, 3).toDF("x").localCheckpoint(true)
    assert(df.count() == 3)
    // the checkpoint's backing RDD is persisted outside the plan cache —
    // Dataset.unpersist would not see it; Checkpoints.release must
    val id = df.queryExecution.analyzed.collect {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd.id
    }.head
    assert(spark.sparkContext.getPersistentRDDs.contains(id),
      "localCheckpoint did not register a persistent RDD — test premise broken")
    Checkpoints.release(df)
    assert(!spark.sparkContext.getPersistentRDDs.contains(id),
      "release left the checkpointed RDD pinned")
  }
}
