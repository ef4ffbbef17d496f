package graft.llm

import graft.SparkTestSession
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property checks for the round-12 span-removal planner (q329) against
  * a BRUTE-FORCE Scala re-derivation — an oracle independent of BOTH
  * engines (the DuckDB SQL mirrors the distributed algebra, so a shared
  * algebra bug would hash-match; this derivation shares nothing): mark
  * every position covered by a 5-gram occurring ≥ 2 times corpus-wide,
  * merge marked positions into maximal islands, and compare the
  * per-source rollup exactly. Small vocabularies force heavy gram
  * collisions, cross-doc AND within-doc repeats, and boundary overlaps.
  * Fixed ScalaCheck seeds (the SketchPropertySpec convention) — every
  * run exercises the same cases, reproducible failures, no flakes.
  */
class CurationPropertySpec extends AnyFunSuite with SparkTestSession {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(fail(s"generator returned no value for seed $seed"))

  // tiny vocabulary + short docs → dense 5-gram collisions
  private val corpusGen: Gen[List[(Long, String, String)]] = for {
    nDocs <- Gen.choose(3, 14)
    docs <- Gen.listOfN(nDocs, for {
      len <- Gen.choose(1, 40)
      toks <- Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d"))
      src <- Gen.oneOf("s1", "s2")
    } yield (toks.mkString(" "), src))
  } yield docs.zipWithIndex.map { case ((t, s), i) => (i.toLong, t, s) }

  /** Brute-force q329: per source (n_docs, total_tokens, affected_docs,
    * dup_span_tokens, max_span).
    */
  private def bruteForce(docs: Seq[(Long, String, String)])
      : Map[String, (Long, Long, Long, Long, Long)] = {
    val toks = docs.map { case (id, t, s) => (id, t.split(" ").toSeq, s) }
    // corpus-wide 5-gram multiplicity
    val counts = scala.collection.mutable.Map.empty[String, Int]
    toks.foreach { case (_, ts, _) =>
      if (ts.size >= 5)
        ts.sliding(5).foreach(g => counts(g.mkString(" ")) =
          counts.getOrElse(g.mkString(" "), 0) + 1)
    }
    val perDoc = toks.map { case (id, ts, src) =>
      val covered = Array.fill(ts.size)(false)
      if (ts.size >= 5)
        ts.sliding(5).zipWithIndex.foreach { case (g, i) =>
          if (counts(g.mkString(" ")) >= 2)
            (i until i + 5).foreach(covered(_) = true)
        }
      // maximal islands over the covered mask
      var spans = List.empty[Int]
      var run = 0
      covered.foreach { c =>
        if (c) run += 1
        else { if (run > 0) spans ::= run; run = 0 }
      }
      if (run > 0) spans ::= run
      (id, src, ts.size.toLong, spans.map(_.toLong),
        if (spans.isEmpty) 0L else spans.max.toLong)
    }
    perDoc.groupBy(_._2).map { case (src, xs) =>
      val affected = xs.filter(_._4.nonEmpty)
      src -> (
        xs.size.toLong,
        xs.map(_._3).sum,
        affected.size.toLong,
        affected.flatMap(_._4).sum,
        if (affected.isEmpty) 0L else affected.map(_._5).max)
    }
  }

  test("q329 span-removal plan equals the brute-force mask-and-merge on random corpora") {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("lang", StringType),
      StructField("source", StringType),
      StructField("n_chars", LongType)))
    (1L to 12L).foreach { seed =>
      val docs = sample(corpusGen, seed)
      val dir = java.nio.file.Files.createTempDirectory(s"spanprop$seed").toString
      spark.createDataFrame(
        spark.sparkContext.parallelize(docs.map { case (id, t, s) =>
          Row(id, t, "en", s, t.length.toLong)
        }),
        schema).write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val got = graft.SparkEntry.queries("q329_span_removal_plan")(spark, dir)
        .collect().map { r =>
          r.getAs[String]("source") -> (
            r.getAs[Long]("n_docs"), r.getAs[Long]("total_tokens"),
            r.getAs[Long]("affected_docs"), r.getAs[Long]("dup_span_tokens"),
            r.getAs[Long]("max_span"))
        }.toMap
      val exp = bruteForce(docs)
      assert(got == exp, s"seed $seed: got $got, brute-force $exp")
    }
  }
}
