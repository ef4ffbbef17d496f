package graft.llm

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the retrieval/mining operators — the oracle
  * hash-match (Verify) proves engine agreement; these prove the
  * answers MEAN what the operators claim.
  */
class SearchSpec extends AnyFunSuite with SparkTestSession {

  private val d = "/root/testdata/sf0.001"

  test("q123: the rare-term query ranks only dup-containing docs, idf favors the rare term") {
    val rows = graft.SparkEntry.queries("q123_bm25_topk")(spark, d).collect()
    assert(rows.nonEmpty)
    // per-query invariants
    val byQ = rows.groupBy(_.getInt(0))
    byQ.foreach { case (_, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to rs.length),
        "ranks must be dense 1..k")
      val scores = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        "scores must be non-increasing in rank")
    }
    // query 3 is ("dup", "scan"): 'dup' appears in ~5% of docs with the
    // corpus's only high-idf odds, so every top hit must contain it —
    // a scoring regression that loses the idf contrast breaks this
    val docsWithDup = graft.Tables(spark, d, "documents")
      .filter(org.apache.spark.sql.functions.expr(
        "array_contains(split(text, ' '), 'dup')"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(docsWithDup.nonEmpty, "fixture premise: some docs contain 'dup'")
    val q3Top = byQ(3).sortBy(_.getInt(1)).map(_.getLong(2))
    q3Top.take(math.min(docsWithDup.size, q3Top.length)).foreach { id =>
      assert(docsWithDup.contains(id),
        s"q3 top hit $id lacks the rare term 'dup' — idf contrast lost")
    }
  }

  test("q124: negatives are cross-label, positives same-label, hardness ordering holds") {
    val emb = graft.Tables(spark, d, "embeddings")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = graft.SparkEntry.queries("q124_contrastive_mining")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (aId, kind, cand) = (r.getLong(0), r.getString(1), r.getLong(3))
      if (kind == "hard_negative")
        assert(emb(aId) != emb(cand), s"negative $cand shares anchor $aId's label")
      else assert(emb(aId) == emb(cand), s"positive $cand differs from anchor $aId's label")
    }
    // hard negatives list the MOST similar first, hard positives the LEAST
    rows.groupBy(r => (r.getLong(0), r.getString(1))).foreach { case ((_, kind), rs) =>
      val sims = rs.sortBy(_.getInt(2)).map(_.getDouble(4))
      val ordered = sims.zip(sims.tail).forall { case (a, b) =>
        if (kind == "hard_negative") a >= b else a <= b
      }
      assert(ordered, s"$kind similarity not ordered by hardness: ${sims.toSeq}")
    }
  }

  test("q125: estimates equal exact counts on the small-set path and stay in band") {
    val rows = graft.SparkEntry.queries("q125_kmv_set_sketch")(spark, d).collect()
    assert(rows.length === 10, "5 segments -> 10 unordered pairs")
    rows.foreach { r =>
      val (nA, estA) = (r.getLong(2), r.getDouble(6))
      // sf0.001 segments (~160 user-days) sit under KmvK=256: the sketch
      // IS the set, so the per-segment estimate must be EXACT
      assert(estA === nA.toDouble, s"small-set estimate $estA != exact $nA")
      assert(r.getBoolean(10) && r.getBoolean(11) && r.getBoolean(12) && r.getBoolean(13),
        s"contract bands must hold on the fixture: $r")
    }
  }
}
