package graft.llm

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the contract between q54's sequential per-lang packing and q74's
  * (lang, shard)-banded production variant ([[Pipeline.packedContexts]]):
  * shards=1 IS the sequential semantics, every band independently obeys
  * the sequential contract on its own subset, token/doc mass is conserved,
  * and the banded plan's running-sum window really partitions by the
  * shard key (the whole point — no ~5-value window partition at scale).
  */
class PackingSpec extends AnyFunSuite with SparkTestSession {

  private val d = "/root/testdata/sf0.001"
  private def docs = graft.Tables(spark, d, "documents")

  // the same engine-reproducible banding hash packedContexts uses,
  // re-derived independently so the spec catches a helper hash change
  private val shardOf =
    expr("cast(conv(substring(md5(cast(doc_id AS string)), 1, 8), 16, 10) AS bigint)") %
      Pipeline.PackShards

  private val packCols =
    Seq("lang", "pack_id", "n_docs", "n_tokens", "first_doc", "last_doc")

  test("packedContexts with shards=1 degenerates to the sequential q54 packing") {
    val q54 = graft.SparkEntry.queries("q54_context_packing")(spark, d)
    val one = Pipeline.packedContexts(docs, shards = 1)
      .select(packCols.map(col): _*)
    assert(one.except(q54).isEmpty, "shards=1 produced packs q54 does not")
    assert(q54.except(one).isEmpty, "shards=1 lost packs q54 produces")
    assert(one.count() === q54.count())
  }

  test("every band packs exactly as the sequential contract applied to its subset") {
    val banded = Pipeline.packedContexts(docs, Pipeline.PackShards)
      .collect()
      .map(r => (r.getInt(1), (r.getString(0), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(banded.keySet.size > 1, "fixture degenerated to a single shard band")
    (0 until Pipeline.PackShards).foreach { s =>
      val expected = Pipeline
        .packedContexts(docs.filter(shardOf === s), shards = 1)
        .select(packCols.map(col): _*)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5)))
        .toSet
      assert(banded.getOrElse(s, Set.empty) === expected,
        s"band $s diverged from sequential packing of its own subset")
    }
  }

  test("banding conserves per-language doc and token mass vs q54") {
    import spark.implicits._
    val q54 = graft.SparkEntry.queries("q54_context_packing")(spark, d)
      .groupBy($"lang")
      .agg(sum($"n_docs").as("nd"), sum($"n_tokens").as("nt"))
      .as[(String, Long, Long)].collect().map { case (l, nd, nt) => l -> (nd, nt) }.toMap
    val band = Pipeline.packedContexts(docs, Pipeline.PackShards)
      .groupBy($"lang")
      .agg(sum($"n_docs").as("nd"), sum($"n_tokens").as("nt"))
      .as[(String, Long, Long)].collect().map { case (l, nd, nt) => l -> (nd, nt) }.toMap
    assert(band === q54)
  }

  test("banded packing windows partition by the shard key, never lang alone") {
    val df = Pipeline.packedContexts(docs, Pipeline.PackShards)
    val wins = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(wins.nonEmpty, "running-sum window vanished from the plan")
    wins.foreach { w =>
      assert(w.partitionSpec.size >= 2 &&
        w.partitionSpec.exists(_.toString.contains("pack_shard")),
        s"window partitions by ${w.partitionSpec.mkString(", ")} — " +
          "a low-cardinality key serializes each language into one task at scale")
    }
  }
}
