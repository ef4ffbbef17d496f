package graft.llm

import graft.SparkTestSession
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based checks for the round's algorithmic kernels, on random
  * data the fixture-based specs can't reach: the Misra–Gries superset
  * guarantee must hold for EVERY input multiset, partitioning, and
  * counter budget (it is a worst-case bound, not an average-case one),
  * and chunking must cover every token exactly once net of overlap for
  * every (n_tok, size, stride) geometry. Raw ScalaCheck generators under
  * FIXED seeds (the offline cache has no scalatestplus bridge), so every
  * run exercises the same 25 cases — reproducible failures, no flakes.
  */
class SketchPropertySpec extends AnyFunSuite with SparkTestSession {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(fail(s"generator returned no value for seed $seed"))

  // skewed alphabets: few hot items over a long tail, the MG target shape
  private val caseGen: Gen[(List[String], Int, Int)] = for {
    n <- Gen.choose(1, 400)
    xs <- Gen.listOfN(n, Gen.frequency(
      5 -> Gen.const("hot1"), 3 -> Gen.const("hot2"),
      2 -> Gen.oneOf("w1", "w2", "w3"),
      1 -> Gen.choose(0, 50).map("t" + _)))
    k <- Gen.choose(2, 12)
    parts <- Gen.choose(1, 7)
  } yield (xs, k, parts)

  test("Misra–Gries candidates ⊇ true heavy hitters for random data/layout/budget") {
    val spark2 = spark
    import spark2.implicits._
    (1L to 25L).foreach { seed =>
      val (xs, k, parts) = sample(caseGen, seed)
      val df = xs.toDF("item").repartition(parts)
      val n = xs.size
      val truth = xs.groupBy(identity).collect {
        case (x, occ) if occ.size.toLong * k > n => x
      }.toSet
      val cand = HeavyHitters.candidates(df, "item", k)
        .collect().map(_.getString(0)).toSet
      assert(truth.subsetOf(cand),
        s"lost heavy hitters ${truth -- cand} (seed=$seed n=$n k=$k parts=$parts)")
      val exact = HeavyHitters.exactOverThreshold(df, "item", k)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(exact.keySet == truth,
        s"exact output diverged from brute force (seed=$seed)")
      exact.foreach { case (x, f) =>
        assert(f == xs.count(_ == x).toLong, s"wrong exact count for $x (seed=$seed)")
      }
    }
  }

  private val geomGen: Gen[(Int, Int, Int)] = for {
    size <- Gen.choose(1, 40)
    stride <- Gen.choose(1, size)
    nTok <- Gen.choose(1, 120)
  } yield (size, stride, nTok)

  test("chunking covers every token exactly once net of overlap, any geometry") {
    val spark2 = spark
    import spark2.implicits._
    (1L to 25L).foreach { seed =>
      val (size, stride, nTok) = sample(geomGen, seed)
      val text = (0 until nTok).map("t" + _).mkString(" ")
      val df = Seq((1L, text)).toDF("doc_id", "text")
      val chunks = Pipeline.chunked(df, size, stride)
        .select("chunk_idx", "chunk_toks")
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[String](1))
        .sortBy(_._1)
      // chunk i covers [i*stride, i*stride + size) clamped to n_tok
      chunks.foreach { case (i, toks) =>
        val start = (i * stride).toInt
        val expected = (start until math.min(start + size, nTok)).map("t" + _)
        assert(toks == expected,
          s"chunk $i content (seed=$seed size=$size stride=$stride n=$nTok)")
      }
      // count formula + full coverage (last chunk reaches the end)
      val expectedChunks =
        1 + math.ceil(math.max(0, nTok - size) / stride.toDouble).toLong
      assert(chunks.length.toLong == expectedChunks, s"chunk count (seed=$seed)")
      assert(chunks.last._1 * stride + chunks.last._2.size == nTok,
        s"coverage gap at the tail (seed=$seed)")
    }
  }
}
