package graft.api

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue

import graft.SparkTestSession
import graft.source.ShardedStreamLog
import graft.source.ShardedStreamLog.LogRecord
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** The reference's end-to-end client behavior (`kinesumer_test.go:30-316`)
  * through the migration-facing API.
  */
class ConsumerGroupSpec extends AnyFunSuite with SparkTestSession {

  private def rec(seq: Long) =
    LogRecord(seq, s"pk$seq", 1700000000000L + seq, s"data-$seq".getBytes("UTF-8"))

  private def newEnv(): (String, String) =
    (Files.createTempDirectory("cg-log").toString,
      Files.createTempDirectory("cg-ck").toString)

  test("consume delivers all records; restart under same app resumes exactly-once") {
    val (root, ck) = newEnv()
    ShardedStreamLog.append(root, "events", "shard-0", (0L to 9L).map(rec))
    val seen = new ConcurrentLinkedQueue[Long]()
    val cfg = ConsumerConfig(app = "app1", logRoot = root, checkpointRoot = ck)

    val cg = new ConsumerGroup(spark, cfg)
    cg.start(Seq("events")) { (df, _) =>
      df.select("sequence_number").collect()
        .foreach(r => seen.add(r.getString(0).toLong))
    }
    cg.processAllAvailable()
    cg.close()
    assert(seen.asScala.toSeq.sorted == (0L to 9L))

    // new client instance, same app → resumes after the checkpoint
    ShardedStreamLog.append(root, "events", "shard-0", (10L to 14L).map(rec))
    val cg2 = new ConsumerGroup(spark, cfg)
    cg2.start(Seq("events")) { (df, _) =>
      df.select("sequence_number").collect()
        .foreach(r => seen.add(r.getString(0).toLong))
    }
    cg2.processAllAvailable()
    cg2.close()
    assert(seen.asScala.toSeq.sorted == (0L to 14L), "no replay, no loss")
  }

  test("refresh swaps the stream set at runtime (Refresh parity)") {
    val (root, ck) = newEnv()
    ShardedStreamLog.append(root, "s1", "shard-0", (0L to 2L).map(rec))
    ShardedStreamLog.append(root, "s2", "shard-0", (100L to 102L).map(rec))
    val seen = new ConcurrentLinkedQueue[(String, Long)]()
    val cg = new ConsumerGroup(spark,
      ConsumerConfig(app = "app2", logRoot = root, checkpointRoot = ck))
    cg.start(Seq("s1")) { (df, _) =>
      df.select("stream", "sequence_number").collect()
        .foreach(r => seen.add((r.getString(0), r.getString(1).toLong)))
    }
    cg.processAllAvailable()
    assert(seen.asScala.map(_._1).toSet == Set("s1"))
    cg.refresh(Seq("s2"))
    cg.processAllAvailable()
    cg.close()
    val byStream = seen.asScala.toSeq.groupBy(_._1)
    assert(byStream("s1").map(_._2).sorted == (0L to 2L))
    assert(byStream("s2").map(_._2).sorted == (100L to 102L))
  }

  test("start twice without refresh fails; refresh before start fails") {
    val (root, ck) = newEnv()
    ShardedStreamLog.append(root, "events", "shard-0", Seq(rec(0)))
    val cg = new ConsumerGroup(spark,
      ConsumerConfig(app = "app3", logRoot = root, checkpointRoot = ck))
    intercept[IllegalStateException] { cg.refresh(Seq("events")) }
    cg.start(Seq("events")) { (_, _) => () }
    intercept[IllegalArgumentException] { cg.start(Seq("events")) { (_, _) => () } }
    cg.close()
  }

  test("errors() surfaces query failures (Errors channel parity, lossless)") {
    val (root, ck) = newEnv()
    ShardedStreamLog.append(root, "events", "shard-0", Seq(rec(0), rec(1)))
    val cg = new ConsumerGroup(spark,
      ConsumerConfig(app = "app-err", logRoot = root, checkpointRoot = ck))
    cg.start(Seq("events")) { (df, _) =>
      df.count() // force evaluation
      throw new RuntimeException("boom: application batch failure")
    }
    // the query may fail before or during this call; either way the
    // listener captures the failure — errors() below is the real check
    try cg.processAllAvailable() catch { case _: Exception => () }
    var tries = 0
    var errs = cg.errors()
    while (errs.isEmpty && tries < 150) { Thread.sleep(100); errs = cg.errors(); tries += 1 }
    assert(errs.exists(_.contains("boom")), s"captured: $errs")
    cg.close()
  }

  test("lag() reports backlog before processing and zero after drain") {
    val (root, ck) = newEnv()
    ShardedStreamLog.append(root, "events", "shard-0", (0L to 9L).map(rec))
    ShardedStreamLog.append(root, "events", "shard-1", (0L to 4L).map(rec))
    // a wide trigger interval keeps the background query from racing the
    // append→lag() window below (with the default 100 ms cadence a trigger
    // could commit the new records before lag() reads lastProgress)
    val cg = new ConsumerGroup(spark,
      ConsumerConfig(app = "lagapp", logRoot = root, checkpointRoot = ck,
        scanIntervalMs = 2000L))
    assert(cg.lag().isEmpty, "no lag map before start")
    try {
      cg.start(Seq("events")) { (df, _) => df.count(); () }
      cg.processAllAvailable()
      val drained = cg.lag()
      assert(drained == Map(("events", "shard-0") -> 0L, ("events", "shard-1") -> 0L),
        s"drained consumer must report zero lag: $drained")
      // new records arrive but no trigger has committed them yet… the
      // sequence distance surfaces immediately via the incremental index
      ShardedStreamLog.append(root, "events", "shard-0", (10L to 14L).map(rec))
      val behind = cg.lag()(("events", "shard-0"))
      assert(behind == 5L, s"expected 5 records behind, got $behind")
      cg.processAllAvailable()
      assert(cg.lag()(("events", "shard-0")) == 0L)
    } finally cg.close()
  }

  test("empty app name is rejected (config validation parity)") {
    intercept[IllegalArgumentException] {
      ConsumerConfig(app = "", logRoot = "/tmp", checkpointRoot = "/tmp")
    }
  }
}
