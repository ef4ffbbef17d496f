package graft

import org.scalatest.funsuite.AnyFunSuite

class CheckpointsSpec extends AnyFunSuite with SparkTestSession {

  private def checkpointRddId(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.analyzed.collect {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd.id
    }.head

  test("release frees the executor storage behind an eager localCheckpoint") {
    import spark.implicits._
    val df = Checkpoints.checkpoint(Seq(1, 2, 3).toDF("x"))
    assert(df.count() == 3)
    // the checkpoint's backing RDD is persisted outside the plan cache —
    // Dataset.unpersist would not see it; Checkpoints.release must
    val id = checkpointRddId(df)
    assert(spark.sparkContext.getPersistentRDDs.contains(id),
      "localCheckpoint did not register a persistent RDD — test premise broken")
    Checkpoints.release(df)
    assert(!spark.sparkContext.getPersistentRDDs.contains(id),
      "release left the checkpointed RDD pinned")
    // idempotent: releasing an already-released frame is a no-op
    Checkpoints.release(df)
  }

  test("release leaves checkpoints this library did not create untouched") {
    import spark.implicits._
    // a caller-managed checkpoint embedded in a plan must survive release:
    // unpersisting every reachable LogicalRDD leaf would sever storage the
    // caller still depends on
    val theirs = Seq(4, 5).toDF("x").localCheckpoint(true)
    assert(theirs.count() == 2)
    val id = checkpointRddId(theirs)
    assert(spark.sparkContext.getPersistentRDDs.contains(id))
    Checkpoints.release(theirs)
    assert(spark.sparkContext.getPersistentRDDs.contains(id),
      "release unpersisted a checkpoint it does not own")
    assert(theirs.count() == 2)
    theirs.queryExecution.analyzed.foreach {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd.unpersist(false)
      case _ => ()
    }
  }
}
