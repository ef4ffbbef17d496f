package graft.source

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import java.util.Base64
import scala.collection.immutable.SortedMap
import scala.jdk.CollectionConverters._

/** The on-disk sharded stream log — this environment's stand-in for the
  * Kinesis data plane (zero egress). Layout:
  *
  * {{{
  *   <root>/<stream>/<shardId>/records.tsv   append-only record log
  *   <root>/<stream>/<shardId>/_CLOSED       marker: shard is closed (resharded)
  * }}}
  *
  * Each record line: `seq \t partitionKey \t arrivalEpochMs \t base64(data)`.
  * Sequence numbers are monotonically increasing per shard — the analog of
  * the Kinesis per-shard `SequenceNumber` the reference checkpoints
  * (`/root/reference/statemodel.go:40-45`). A closed shard keeps its tail
  * readable until drained — unlike the reference, which filters closed
  * shards out before reading and can drop their tails
  * (`/root/reference/kinesumer.go:305-344`, bug noted in SURVEY §2.3).
  */
object ShardedStreamLog {

  final case class LogRecord(
      sequenceNumber: Long,
      partitionKey: String,
      arrivalEpochMs: Long,
      data: Array[Byte])

  private def shardDir(root: String, stream: String, shard: String): Path =
    Paths.get(root, stream, shard)

  private def recordsFile(root: String, stream: String, shard: String): Path =
    shardDir(root, stream, shard).resolve("records.tsv")

  /** Append records to a shard (creating it on first use). Test/dev writer. */
  def append(root: String, stream: String, shard: String, records: Seq[LogRecord]): Unit = {
    val dir = shardDir(root, stream, shard)
    Files.createDirectories(dir)
    require(!Files.exists(dir.resolve("_CLOSED")), s"shard $stream/$shard is closed")
    val lines = records.map { r =>
      s"${r.sequenceNumber}\t${r.partitionKey}\t${r.arrivalEpochMs}\t" +
        Base64.getEncoder.encodeToString(r.data)
    }
    Files.write(recordsFile(root, stream, shard),
      (lines.mkString("", "\n", "\n")).getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  /** Close a shard (no further appends) — the resharding analog. */
  def closeShard(root: String, stream: String, shard: String): Unit = {
    val dir = shardDir(root, stream, shard)
    Files.createDirectories(dir)
    Files.write(dir.resolve("_CLOSED"), Array.emptyByteArray,
      StandardOpenOption.CREATE)
  }

  def isClosed(root: String, stream: String, shard: String): Boolean =
    Files.exists(shardDir(root, stream, shard).resolve("_CLOSED"))

  /** Discover a stream's shards, sorted — shard discovery ≈ the reference's
    * paginated ListShards (`/root/reference/kinesumer.go:305-344`), except
    * closed shards stay visible so their tails can drain.
    */
  def listShards(root: String, stream: String): SortedMap[String, Boolean] = {
    val dir = Paths.get(root, stream)
    if (!Files.isDirectory(dir)) SortedMap.empty
    else {
      val entries = Files.list(dir).iterator().asScala
        .filter(Files.isDirectory(_))
        .map(p => p.getFileName.toString -> Files.exists(p.resolve("_CLOSED")))
        .toSeq
      SortedMap(entries: _*)
    }
  }

  /** Highest sequence number currently in a shard, or -1 if empty. */
  def maxSequence(root: String, stream: String, shard: String): Long = {
    val f = recordsFile(root, stream, shard)
    if (!Files.exists(f)) -1L
    else {
      var max = -1L
      Files.lines(f).iterator().asScala.foreach { line =>
        if (line.nonEmpty) {
          val tab = line.indexOf('\t')
          if (tab > 0) {
            val seq = line.substring(0, tab).toLong
            if (seq > max) max = seq
          }
        }
      }
      max
    }
  }

  /** Read records with sequence in (afterSeq, untilSeq], ordered by seq. */
  def read(root: String, stream: String, shard: String,
      afterSeq: Long, untilSeq: Long): Iterator[LogRecord] = {
    val f = recordsFile(root, stream, shard)
    if (!Files.exists(f)) Iterator.empty
    else {
      Files.readAllLines(f, StandardCharsets.UTF_8).asScala.iterator
        .filter(_.nonEmpty)
        .map { line =>
          val parts = line.split("\t", 4)
          LogRecord(parts(0).toLong, parts(1), parts(2).toLong,
            Base64.getDecoder.decode(parts(3)))
        }
        .filter(r => r.sequenceNumber > afterSeq && r.sequenceNumber <= untilSeq)
        .toSeq.sortBy(_.sequenceNumber).iterator
    }
  }
}
