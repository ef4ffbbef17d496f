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

  /** The library id-hash, re-derived from first principles (MessageDigest,
    * not Spark expressions) — first 8 md5 hex digits of the id string.
    */
  private def idHash(id: Long): Long = java.lang.Long.parseLong(
    java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
      .take(4).map(b => f"${b & 0xff}%02x").mkString, 16)

  test("q334 split-leakage audit equals an independent md5-split brute force") {
    // duplicate-heavy corpora: few distinct texts over many doc ids, so
    // clusters straddle the hash split often
    val gen: Gen[List[(Long, String)]] = for {
      nDocs <- Gen.choose(4, 30)
      docs <- Gen.listOfN(nDocs, Gen.oneOf("t1", "t2", "t3", "a b c"))
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong * 7L, t) }
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("lang", StringType),
      StructField("source", StringType),
      StructField("n_chars", LongType)))
    (1L to 8L).foreach { seed =>
      val docs = sample(gen, seed)
      val dir = java.nio.file.Files.createTempDirectory(s"leakprop$seed").toString
      spark.createDataFrame(
        spark.sparkContext.parallelize(docs.map { case (id, t) =>
          Row(id, t, "en", "s1", t.length.toLong)
        }),
        schema).write.mode("overwrite").parquet(s"$dir/documents.parquet")
      // brute force: split by the md5 bucket, cluster by exact text
      def splitOf(id: Long): String = {
        val b = idHash(id) % 100
        if (b < 80) "train" else if (b < 90) "val" else "test"
      }
      val byText = docs.groupBy(_._2)
      val exp = docs.groupBy(d => splitOf(d._1)).map { case (sp, xs) =>
        val inDup = xs.count(d => byText(d._2).size >= 2)
        val leaking = xs.count { d =>
          val cluster = byText(d._2)
          cluster.size >= 2 && cluster.map(c => splitOf(c._1)).distinct.size >= 2
        }
        sp -> (xs.size.toLong, inDup.toLong, leaking.toLong)
      }
      val got = graft.SparkEntry.queries("q334_split_cluster_leakage")(spark, dir)
        .collect().map { r =>
          r.getAs[String]("split") -> (
            r.getAs[Long]("n_docs"),
            r.getAs[Long]("docs_in_dup_clusters"),
            r.getAs[Long]("docs_leaking"))
        }.toMap
      assert(got == exp, s"seed $seed: got $got, brute-force $exp")
    }
  }

  test("q340 stutter runs match a brute-force run-length scan on random corpora") {
    // tiny vocabulary → dense accidental runs; per-lang split exercises
    // the rollup. The brute force is a direct linear run-length scan —
    // independent of both engines' window/island algebra.
    val gen: Gen[List[(Long, String, String)]] = for {
      nDocs <- Gen.choose(2, 12)
      docs <- Gen.listOfN(nDocs, for {
        len <- Gen.choose(1, 30)
        toks <- Gen.listOfN(len, Gen.oneOf("a", "b", "c"))
        lang <- Gen.oneOf("en", "de")
      } yield (toks.mkString(" "), lang))
    } yield docs.zipWithIndex.map { case ((t, l), i) => (i.toLong, t, l) }
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    for (seed <- 1L to 10L) {
      val docs = sample(gen, seed)
      val dir = java.nio.file.Files.createTempDirectory("stutterprop").toString
      spark.createDataFrame(
        spark.sparkContext.parallelize(docs.map { case (id, t, l) =>
          Row(id, t, l, "s1", t.length.toLong)
        }),
        schema).write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val exp = docs.groupBy(_._3).map { case (lang, xs) =>
        val perDoc = xs.map { case (_, t, _) =>
          val toks = t.split(" ")
          val runs = scala.collection.mutable.ArrayBuffer.empty[Long]
          var cur = 1L
          for (i <- 1 until toks.length) {
            if (toks(i) == toks(i - 1)) cur += 1
            else { runs += cur; cur = 1L }
          }
          runs += cur
          (toks.length.toLong, runs.max, runs.filter(_ >= 2L).sum)
        }
        lang -> (xs.size.toLong,
          perDoc.count(_._2 >= 3L).toLong,
          perDoc.map(_._2).max,
          perDoc.map(_._3).sum,
          perDoc.map(_._1).sum)
      }
      val got = graft.SparkEntry.queries("q340_stutter_runs")(spark, dir)
        .collect().map { r =>
          r.getAs[String]("lang") -> (
            r.getAs[Long]("n_docs"), r.getAs[Long]("n_stutter_docs"),
            r.getAs[Long]("max_run"), r.getAs[Long]("stutter_tokens"),
            r.getAs[Long]("total_tokens"))
        }.toMap
      assert(got == exp, s"seed $seed: got $got, brute-force $exp")
    }
  }
}
