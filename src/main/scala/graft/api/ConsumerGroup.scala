package graft.api

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener, Trigger}

/** Configuration parity with the reference's `kinesumer.Config`
  * (`/root/reference/kinesumer.go:120-170`), mapped to Spark:
  *
  *   - `app`       — consumer-group name; namespaces the checkpoint store
  *                   (≈ the DynamoDB table keyed by app,
  *                   `/root/reference/statemodel.go:17-57`)
  *   - `logRoot`   — sharded-stream log root (the Kinesis data plane)
  *   - `checkpointRoot` — offset store root (≈ the DynamoDB state store;
  *                   here the Structured Streaming offset WAL)
  *   - `scanLimit` — per-shard records per micro-batch
  *                   (≈ `Config.ScanLimit`, default 2000)
  *   - `scanIntervalMs` — trigger cadence (≈ `Config.ScanInterval`)
  *   - `startFromLatest` — `LATEST` vs `TRIM_HORIZON` start
  *                   (≈ `GetShardIterator` mode, `kinesumer.go:706-729`)
  *
  * NOT carried over (documented divergences, SURVEY.md §7.4):
  * `ClientID`/aliveness/leader election — the Spark driver is the single
  * planner, so there is no client-side group membership; `MarkRecord`/
  * `Commit`/`CommitConfig` — the offset WAL commits transactionally per
  * micro-batch, a strict upgrade from the reference's at-least-once
  * periodic commit; `EFOMode` — push transport has no micro-batch analog.
  */
final case class ConsumerConfig(
    app: String,
    logRoot: String,
    checkpointRoot: String,
    scanLimit: Long = 2000L,
    scanIntervalMs: Long = 100L,
    startFromLatest: Boolean = false) {
  require(app.nonEmpty, "app must be set") // ≈ kinesumer.go:189-193
}

/** The kinesumer client surface on Spark (SURVEY.md §3): `consume` is the
  * record channel, `refresh` the runtime stream swap, `close` the shutdown.
  */
class ConsumerGroup(spark: SparkSession, cfg: ConsumerConfig) {

  @volatile private var active: Option[(StreamingQuery, Seq[String], BatchFn)] = None

  type BatchFn = (DataFrame, Long) => Unit

  // ≈ the reference's lossy 1-slot error channel (`kinesumer.go:833-844`,
  // K2 in SURVEY §2) — except nothing is dropped: failures of this app's
  // query are captured (listener + direct harvest, deduped by runId) and
  // drained on demand.
  private val errorQueue = new ConcurrentLinkedQueue[String]()
  private val owned =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.util.UUID]()
  private val reported =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.util.UUID]()
  private val listener = new StreamingQueryListener {
    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
      e.exception.foreach { msg =>
        if (owned.contains(e.runId) && reported.add(e.runId)) errorQueue.add(msg)
      }
  }
  spark.streams.addListener(listener)

  // covers the race where the query fails before/without the listener event
  private def harvest(): Unit = active.foreach { case (q, _, _) =>
    q.exception.foreach { e =>
      if (reported.add(q.runId)) errorQueue.add(e.getMessage)
    }
  }

  /** Drain captured query failures — `Errors()` parity, without the
    * reference's drop-when-full behavior.
    */
  def errors(): Seq[String] = {
    harvest()
    // per-element drain: an error enqueued concurrently is either taken
    // now or left intact for the next call — never discarded
    Iterator.continually(errorQueue.poll()).takeWhile(_ != null).toSeq
  }

  /** Lazy streaming envelope of the given streams — the analog of the
    * record channel returned by `Consume` (`kinesumer.go:346-370`); attach
    * any sink/transformation.
    */
  def consume(streams: Seq[String]): DataFrame = {
    require(streams.nonEmpty, "at least one stream")
    spark.readStream
      .format("graft.source.ShardedStreamProvider")
      .option("path", cfg.logRoot)
      .option("streams", streams.mkString(","))
      .option("startingPosition", if (cfg.startFromLatest) "latest" else "trim_horizon")
      .option("maxRecordsPerShardPerBatch", cfg.scanLimit)
      .load()
  }

  /** Start consuming with a per-batch callback (≈ the application loop
    * draining the record channel). Offsets are committed per batch under
    * the app's checkpoint namespace — restart resumes after the last
    * committed sequence (`AFTER_SEQUENCE_NUMBER` semantics,
    * `kinesumer.go:716-718`). SOURCE progress is exactly-once; the
    * callback is AT-LEAST-ONCE across crashes: a batch whose side
    * effects ran but whose commit was not yet recorded re-runs on
    * restart with the SAME batchId — `onBatch` must be idempotent per
    * batchId (the standard foreachBatch contract; still a strict
    * upgrade over the reference's periodic-commit replay window, which
    * re-delivers with no dedup handle at all).
    */
  def start(streams: Seq[String])(onBatch: BatchFn): StreamingQuery = synchronized {
    require(active.isEmpty, "consumer already started; use refresh() to change streams")
    val q = consume(streams).writeStream
      .queryName(s"${cfg.app}-consumer")
      .option("checkpointLocation", s"${cfg.checkpointRoot}/${cfg.app}/main")
      .trigger(Trigger.ProcessingTime(cfg.scanIntervalMs))
      .foreachBatch { (df: DataFrame, batchId: Long) => onBatch(df, batchId) }
      .start()
    owned.add(q.runId)
    active = Some((q, streams, onBatch))
    q
  }

  /** Swap the consumed stream set at runtime — `Refresh`
    * (`kinesumer.go:817-831`): pause-the-world, swap, restart. The shared
    * checkpoint namespace preserves per-stream offsets across the swap.
    */
  def refresh(streams: Seq[String]): StreamingQuery = synchronized {
    val (q, _, onBatch) = active.getOrElse(
      throw new IllegalStateException("consumer not started"))
    q.stop()
    awaitQuietly(q)
    active = None
    start(streams)(onBatch)
  }

  /** Block until all currently-available records are processed (test aid —
    * the reference's tests poll with timeouts instead).
    */
  def processAllAvailable(): Unit = active.foreach(_._1.processAllAvailable())

  /** Consumer lag per (stream, shard): the SEQUENCE DISTANCE between the
    * log's newest record and the last COMMITTED batch's end offset — the
    * monitoring metric the reference left as an open TODO
    * (`/root/reference/kinesumer.go:128`; Kinesis exposes the analogous
    * MillisBehindLatest). Reads the running query's committed end offset
    * (the offset-WAL JSON surfaced through `lastProgress`) and the log's
    * incremental max-sequence index — O(new bytes), driver-side only.
    * With dense sequences the distance equals the record backlog; shards
    * never read yet report maxSeq − (−1). Committed-but-empty logs and a
    * not-yet-started consumer report 0 / an empty map respectively.
    *
    * `lastProgress` is null until the running query's FIRST trigger
    * completes — in particular right after `start()`/`refresh()` on an
    * existing checkpoint — so the committed end offset falls back to the
    * offset WAL on disk (latest batch present in the commit log); without
    * the fallback a freshly restarted, fully caught-up consumer would
    * report the entire log as backlog.
    */
  def lag(): Map[(String, String), Long] = active match {
    case None => Map.empty
    case Some((q, streams, _)) =>
      val progress = Option(q.lastProgress)
      val committed: Map[String, Map[String, Long]] = progress
        .flatMap(p => p.sources.headOption)
        .flatMap(s => Option(s.endOffset))
        .orElse(walCommittedOffsetJson())
        .map(graft.source.ShardedStreamOffset.fromJson(_).positions)
        .getOrElse(Map.empty)
      streams.flatMap { stream =>
        val shards = graft.source.ShardedStreamLog.listShards(cfg.logRoot, stream).keys
        // parallel head-probe (shared with the source's offset planning):
        // a sequential per-shard loop would make this monitoring call
        // linear in shard count
        val maxSeqs = graft.source.ShardedStreamLog.maxSequences(cfg.logRoot, stream, shards)
        maxSeqs.map { case (shard, maxSeq) =>
          val done = committed.getOrElse(stream, Map.empty).getOrElse(shard, -1L)
          (stream, shard) -> math.max(0L, maxSeq - done)
        }
      }.toMap
  }

  /** End-offset JSON of the latest batch in the commit log — the durable
    * committed progress used by [[lag]] before the first trigger of a
    * (re)started query populates `lastProgress`. Offset-log file layout
    * (Spark's OffsetSeqLog): version line, metadata line, then one offset
    * JSON per source ("-" for a source with no offset); this query has
    * exactly one source.
    */
  private def walCommittedOffsetJson(): Option[String] =
    try {
      // Hadoop FS, not java.io.File: Spark accepts URI-style checkpoint
      // locations (file:/, hdfs://, s3a://), and a local-path-only read
      // here would silently miss the WAL and report the whole log as
      // backlog after every restart
      val base = new org.apache.hadoop.fs.Path(s"${cfg.checkpointRoot}/${cfg.app}/main")
      val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val commits = new org.apache.hadoop.fs.Path(base, "commits")
      if (!fs.exists(commits)) None
      else {
        val committedIds = fs.listStatus(commits).toSeq
          .map(_.getPath.getName)
          .flatMap(n => scala.util.Try(n.toLong).toOption)
        committedIds.sorted.lastOption.flatMap { id =>
          val f = new org.apache.hadoop.fs.Path(base, s"offsets/$id")
          if (!fs.isFile(f)) None
          else {
            val in = fs.open(f)
            val txt =
              try scala.io.Source.fromInputStream(in, "UTF-8").mkString
              finally in.close()
            txt.split("\n", -1).drop(2).find(l => l.nonEmpty && l != "-")
          }
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** `Close` (`kinesumer.go:846-869`): stop the query; offsets are already
    * durable, so shutdown needs no drain/sleep dance.
    */
  def close(): Unit = synchronized {
    active.foreach { case (q, _, _) => q.stop(); awaitQuietly(q) }
    harvest()
    active = None
    spark.streams.removeListener(listener)
  }

  // a failed query's exception is delivered through errors(), not rethrown
  // from shutdown (≈ the reference's Close never throws, kinesumer.go:846-869)
  private def awaitQuietly(q: StreamingQuery): Unit =
    try q.awaitTermination()
    catch { case _: org.apache.spark.sql.streaming.StreamingQueryException => () }
}
