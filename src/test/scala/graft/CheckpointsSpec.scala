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

  test("a PINNED shared checkpoint survives consumer releases; releasePinned frees it") {
    import spark.implicits._
    // the memoized build-once shape (LPA labels, the ANN index): the
    // first consumer's harness-level release must not tear the shared
    // storage down under the next consumer (the q157
    // CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND regression)
    val sharedRel = Checkpoints.pin(Checkpoints.checkpoint(Seq(7, 8).toDF("x")))
    val id = checkpointRddId(sharedRel)
    assert(spark.sparkContext.getPersistentRDDs.contains(id))
    val consumer = sharedRel.select(org.apache.spark.sql.functions.col("x") * 2)
    Checkpoints.release(consumer) // a per-query harness release
    assert(spark.sparkContext.getPersistentRDDs.contains(id),
      "consumer release tore down a pinned shared checkpoint")
    assert(sharedRel.count() == 2, "the shared relation must still be readable")
    Checkpoints.releasePinned(sharedRel) // the owner's evict path
    assert(!spark.sparkContext.getPersistentRDDs.contains(id),
      "releasePinned left the shared checkpoint pinned")
  }

  test("the shared LPA assignment survives a consumer-level release (q157 regression)") {
    val d = "/root/testdata/sf0.001"
    graft.ops.Graph.lpaEvict(spark, d)
    val q157 = graft.SparkEntry.queries("q157_label_propagation")
    val first = q157(spark, d)
    val n1 = first.count()
    Checkpoints.release(first) // what Verify/Bench now do per query
    val second = q157(spark, d)
    assert(second.count() == n1,
      "the second consumer must still read the memoized assignment")
    Checkpoints.release(second)
    graft.ops.Graph.lpaEvict(spark, d)
  }
}
