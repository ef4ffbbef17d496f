package graft.api

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue

import graft.SparkTestSession
import graft.source.ShardedStreamLog
import graft.source.ShardedStreamLog.LogRecord
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** Multi-stream consumption through one consumer group — the reference's
  * `streams=events,clicks` deployment shape: one query plans every
  * (stream, shard) pair per trigger, commits ONE offset map keyed by
  * stream, and progress in one stream must never depend on the other's.
  */
class MultiStreamSpec extends AnyFunSuite with SparkTestSession {

  private def rec(seq: Long) =
    LogRecord(seq, s"pk$seq", 1700000000000L + seq, s"data-$seq".getBytes("UTF-8"))

  test("two streams: offsets advance independently; reshard in one never stalls the other") {
    val root = Files.createTempDirectory("ms-log").toString
    val ck = Files.createTempDirectory("ms-ck").toString
    ShardedStreamLog.append(root, "events", "shard-0", (0L to 4L).map(rec))
    ShardedStreamLog.append(root, "clicks", "shard-0", (100L to 102L).map(rec))
    val seen = new ConcurrentLinkedQueue[(String, String, Long)]()
    val cfg = ConsumerConfig(app = "ms-app", logRoot = root, checkpointRoot = ck)
    val cg = new ConsumerGroup(spark, cfg)
    cg.start(Seq("events", "clicks")) { (df, _) =>
      df.select("stream", "shard_id", "sequence_number").collect()
        .foreach(r => seen.add((r.getString(0), r.getString(1), r.getString(2).toLong)))
    }
    cg.processAllAvailable()
    def byStream = seen.asScala.toSeq.groupBy(_._1)
    assert(byStream("events").map(_._3).sorted == (0L to 4L))
    assert(byStream("clicks").map(_._3).sorted == (100L to 102L))

    // one stream advances while the other is idle: only clicks gets data;
    // the shared offset map must move clicks forward and leave events
    // exactly where it was (no replay, no invented progress)
    ShardedStreamLog.append(root, "clicks", "shard-0", (103L to 105L).map(rec))
    cg.processAllAvailable()
    assert(byStream("events").map(_._3).sorted == (0L to 4L), "idle stream replayed")
    assert(byStream("clicks").map(_._3).sorted == (100L to 105L))
    val lagAfter = cg.lag()
    assert(lagAfter.values.forall(_ == 0L), s"caught-up consumer reports lag: $lagAfter")

    // reshard events (a new shard appears mid-flight) while clicks also
    // has new data: the same trigger must drain the new events shard from
    // its origin AND keep delivering clicks — per-stream planning is
    // independent, so a reshard in one stream cannot stall the other
    ShardedStreamLog.append(root, "events", "shard-1", (0L to 2L).map(rec))
    ShardedStreamLog.append(root, "clicks", "shard-0", (106L to 107L).map(rec))
    cg.processAllAvailable()
    cg.close()
    assert(byStream("clicks").map(_._3).sorted == (100L to 107L),
      "clicks stalled behind the events reshard")
    val eventsByShard = byStream("events").groupBy(_._2)
    assert(eventsByShard("shard-0").map(_._3).sorted == (0L to 4L))
    assert(eventsByShard("shard-1").map(_._3).sorted == (0L to 2L),
      "new shard not read from its origin")

    // restart under the same app: per-stream committed offsets survive —
    // each stream resumes after ITS OWN last sequence, delivering only
    // the post-restart appends
    ShardedStreamLog.append(root, "events", "shard-1", Seq(rec(3)))
    ShardedStreamLog.append(root, "clicks", "shard-0", Seq(rec(108)))
    seen.clear()
    val cg2 = new ConsumerGroup(spark, cfg)
    cg2.start(Seq("events", "clicks")) { (df, _) =>
      df.select("stream", "shard_id", "sequence_number").collect()
        .foreach(r => seen.add((r.getString(0), r.getString(1), r.getString(2).toLong)))
    }
    cg2.processAllAvailable()
    cg2.close()
    assert(seen.asScala.toSet ==
      Set(("events", "shard-1", 3L), ("clicks", "shard-0", 108L)),
      s"restart must deliver exactly the new records, got ${seen.asScala.toSet}")
  }
}
