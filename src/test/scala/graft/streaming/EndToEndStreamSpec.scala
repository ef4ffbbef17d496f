package graft.streaming

import java.nio.file.Files

import graft.SparkTestSession
import graft.source.ShardedStreamLog
import graft.source.ShardedStreamLog.LogRecord
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The full SURVEY §7.2 slice, streaming end-to-end: sharded-stream source
  * → JSON payload decode → watermarked tumbling aggregation → memory sink.
  */
class EndToEndStreamSpec extends AnyFunSuite with SparkTestSession {

  test("source → decodeJson → tumblingAgg over event-time payloads") {
    import spark.implicits._
    val root = Files.createTempDirectory("e2e-log").toString
    val ck = Files.createTempDirectory("e2e-ck").toString
    val hourMs = 3600L * 1000
    val t0 = 1704067200000L // 2024-01-01 00:00:00 UTC
    // two shards, payloads carry their own event time + value
    def payload(i: Long) =
      s"""{"event_ts": ${t0 + i * 20 * 60 * 1000}, "v": ${i + 1}}"""
    for (sh <- 0 until 2)
      ShardedStreamLog.append(root, "events", s"shard-$sh",
        (0L to 5L).map(i => LogRecord(i, s"pk$i", t0 + i, payload(i).getBytes("UTF-8"))))

    val payloadSchema = StructType(Seq(
      StructField("event_ts", LongType), StructField("v", DoubleType)))
    val envelope = spark.readStream
      .format("graft.source.ShardedStreamProvider")
      .option("path", root).option("streams", "events").load()
    val decoded = StreamOps.decodeJson(envelope, payloadSchema)
      .withColumn("ts", timestamp_millis(col("event_ts")))
    val agg = StreamOps.tumblingAgg(decoded, "ts", "1 hour", "10 minutes", "v")

    spark.sql("DROP TABLE IF EXISTS e2e_sink")
    val q = agg.writeStream.format("memory").queryName("e2e_sink")
      .option("checkpointLocation", ck)
      .outputMode(OutputMode.Complete).start()
    try q.processAllAvailable()
    finally q.stop()

    val rows = spark.table("e2e_sink")
      .select($"window_start".cast("long"), $"n_events", $"sum_value")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    // events at minute 0,20,40 → hour 0; 60,80,100 → hour 1; ×2 shards
    assert(rows.toSeq == Seq(
      (t0 / 1000, 6L, 2 * (1.0 + 2.0 + 3.0)),
      (t0 / 1000 + hourMs / 1000, 6L, 2 * (4.0 + 5.0 + 6.0))))
  }

  test("full pipeline restart: source → window → parquet resumes without loss or dup") {
    // the composed pipeline under checkpointing — source offsets, window
    // state, and the file sink's transaction log together must make a
    // kill + restart + more-data sequence exactly-once end to end
    // (memory sink can't recover a checkpoint; the parquet sink can)
    import spark.implicits._
    val root = Files.createTempDirectory("e2er-log").toString
    val ck = Files.createTempDirectory("e2er-ck").toString
    val out = Files.createTempDirectory("e2er-out").toString + "/agg"
    val t0 = 1704067200000L
    def payload(i: Long) =
      s"""{"event_ts": ${t0 + i * 20 * 60 * 1000}, "v": ${i + 1}}"""
    def appendBatch(r: Range): Unit =
      ShardedStreamLog.append(root, "events", "shard-0",
        r.map(i => LogRecord(i.toLong, s"pk$i", t0 + i, payload(i.toLong).getBytes("UTF-8"))))
    val payloadSchema = StructType(Seq(
      StructField("event_ts", LongType), StructField("v", DoubleType)))
    def run(): Unit = {
      val envelope = spark.readStream
        .format("graft.source.ShardedStreamProvider")
        .option("path", root).option("streams", "events").load()
      val decoded = StreamOps.decodeJson(envelope, payloadSchema)
        .withColumn("ts", timestamp_millis(col("event_ts")))
      // append-mode windowed agg: the watermark must pass a window before
      // its row is final — the sentinel events below push it
      val agg = StreamOps.tumblingAgg(decoded, "ts", "1 hour", "0 seconds", "v")
      val q = agg.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .outputMode(OutputMode.Append).start()
      try q.processAllAvailable()
      finally q.stop()
    }
    appendBatch(0 until 3) // hour 0: v = 1+2+3
    appendBatch(3 until 4) // hour 1 opens → watermark closes hour 0
    run()                  // first incarnation emits hour 0, then "crashes"
    appendBatch(4 until 6) // more of hour 1
    appendBatch(6 until 7) // hour 2 opens → closes hour 1
    run()                  // restart: resumes from offsets + window state
    val rows = spark.read.parquet(out)
      .select($"window_start".cast("long"), $"n_events", $"sum_value")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    // exactly one final row per closed window, counts spanning the restart
    assert(rows.toSeq == Seq(
      (t0 / 1000, 3L, 1.0 + 2.0 + 3.0),
      (t0 / 1000 + 3600, 3L, 4.0 + 5.0 + 6.0)))
  }
}
