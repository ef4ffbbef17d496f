package graft.source

import java.nio.file.Files

import graft.SparkTestSession
import graft.source.ShardedStreamLog.LogRecord
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** WAL-compaction posture of the source's checkpoint store: a consumer
  * that runs for months executes millions of triggers, and each one
  * appends an offsets + commits entry to the checkpoint WAL. Structured
  * Streaming purges entries older than `spark.sql.streaming.
  * minBatchesToRetain` after every batch, so the on-disk WAL is O(retain),
  * not O(triggers) — this spec pins that contract for the sharded source
  * (retain=2 to make purging observable within a short run) and proves a
  * restart AFTER purge still resumes exactly-once: recovery needs only
  * the LATEST committed entry, never the purged history.
  */
class WalCompactionSpec extends AnyFunSuite with SparkTestSession {

  private def rec(seq: Long) =
    LogRecord(seq, s"pk$seq", 1700000000000L + seq, s"data-$seq".getBytes("UTF-8"))

  private def walIds(ck: String, sub: String): Seq[Long] = {
    val dir = new java.io.File(ck, sub)
    Option(dir.listFiles()).getOrElse(Array.empty).toSeq
      .flatMap(f => scala.util.Try(f.getName.toLong).toOption)
      .sorted
  }

  test("offset/commit WAL stays bounded across triggers; restart after purge is exactly-once") {
    val root = Files.createTempDirectory("wal-log").toString
    val ck = Files.createTempDirectory("wal-ck").toString
    val out = Files.createTempDirectory("wal-out").toString + "/data"
    val retainKey = "spark.sql.streaming.minBatchesToRetain"
    val prev = spark.conf.getOption(retainKey)
    spark.conf.set(retainKey, "2")
    try {
      def startQuery() = spark.readStream
        .format("graft.source.ShardedStreamProvider")
        .option("path", root).option("streams", "events").load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .trigger(Trigger.ProcessingTime(25))
        .start()

      // many distinct micro-batches in one incarnation: each append is
      // drained before the next lands, so the batch counter advances at
      // least once per append
      ShardedStreamLog.append(root, "events", "shard-0", Seq(rec(0)))
      val q = startQuery()
      try {
        q.processAllAvailable()
        (1L to 10L).foreach { i =>
          ShardedStreamLog.append(root, "events", "shard-0", Seq(rec(i)))
          q.processAllAvailable()
        }
      } finally q.stop()

      val offsets = walIds(ck, "offsets")
      val commits = walIds(ck, "commits")
      assert(offsets.max >= 10, s"expected ≥10 batches, saw ids $offsets")
      // bounded: retain(2) + the in-flight entry + purge-lag slack — the
      // point is O(retain), not O(batches); 11+ entries means no purging
      assert(offsets.size <= 5, s"offsets WAL grew unbounded: $offsets")
      assert(commits.size <= 5, s"commits WAL grew unbounded: $commits")
      assert(offsets.min > 0, "batch-0 offsets entry should have been purged")
      assert(commits.min > 0, "batch-0 commits entry should have been purged")

      // restart on the purged checkpoint: only the latest committed entry
      // exists, and that is all recovery needs — the new records are
      // delivered exactly once, with no replay of purged batches
      ShardedStreamLog.append(root, "events", "shard-0", (11L to 13L).map(rec))
      val q2 = startQuery()
      try q2.processAllAvailable() finally q2.stop()
      import spark.implicits._
      val seqs = spark.read.parquet(out)
        .select($"sequence_number".cast("long")).as[Long].collect().toSeq.sorted
      assert(seqs == (0L to 13L),
        s"restart after purge lost or replayed records: $seqs")
    } finally prev match {
      case Some(v) => spark.conf.set(retainKey, v)
      case None => spark.conf.unset(retainKey)
    }
  }
}
