package graft.multimodal

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite with SparkTestSession {

  private val d = "/root/testdata/sf0.001"

  test("perceptualNearDup at hamming 0 recovers exactly q158's raster-dup pairs") {
    import spark.implicits._
    val pairs = Multimodal.perceptualNearDup(spark, d, maxHamming = 0)
      .select($"doc_a", $"doc_b", $"hamming", $"exact")
      .as[(Long, Long, Int, Boolean)].collect()
    assert(pairs.forall(p => p._1 < p._2 && p._3 == 0))
    // ground truth: images are pixel-identical iff payload byte lengths
    // are congruent mod 256 (the gradient construction)
    val classes = graft.Tables(spark, d, "documents")
      .select($"doc_id", (octet_length(encode($"text", "UTF-8")) % 256).as("cls"))
      .as[(Long, Int)].collect()
      .groupBy(_._2).values.map(_.map(_._1).sorted).filter(_.length >= 2)
    val truthPairs = classes.flatMap(ids =>
      for (i <- ids.indices; j <- i + 1 until ids.length) yield (ids(i), ids(j))).toSet
    val exactPairs = pairs.filter(_._4).map(p => (p._1, p._2)).toSet
    assert(exactPairs == truthPairs,
      s"missing ${truthPairs.diff(exactPairs).take(5)}, extra ${exactPairs.diff(truthPairs).take(5)}")
    // Non-exact hash-0 survivors are ABUNDANT here, and that is a
    // fixture property, not a defect: every synthesized image is the
    // same smooth two-axis gradient, so perceptually they ARE all
    // near-identical — aHash faithfully reports that. The operator's
    // verifiable claims are recall (truth ⊆ candidates, asserted
    // above via exact-pair equality) and the hamming bound (below);
    // collision precision is a corpus property no spec should pin.
  }

  test("perceptualNearDup hamming bound holds and widens monotonically") {
    import spark.implicits._
    val h0 = Multimodal.perceptualNearDup(spark, d, 0)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    val h4 = Multimodal.perceptualNearDup(spark, d, 4)
      .select($"doc_a", $"doc_b", $"hamming").as[(Long, Long, Int)].collect()
    assert(h4.forall(_._3 <= 4))
    assert(h0.subsetOf(h4.map(p => (p._1, p._2)).toSet))
  }

  test("q171 resize halves dims and keeps sums consistent with the source raster") {
    import spark.implicits._
    val rz = graft.SparkEntry.queries("q171_image_resize_real")(spark, d)
      .select($"doc_id", $"width_in", $"height_in", $"width_out", $"height_out",
        $"sum_red", $"sum_green")
      .as[(Long, Int, Int, Int, Int, Long, Long)].collect()
    assert(rz.nonEmpty)
    rz.foreach { case (_, w, h, w2, h2, sr, sg) =>
      assert(w2 == w / 2 && h2 == h / 2)
      // channel sums bounded by a full-intensity resized raster, nonzero
      // because the gradient always spans more than one value
      assert(sr > 0 && sr < 255L * w2 * h2)
      assert(sg > 0 && sg < 255L * w2 * h2)
    }
  }

  test("q172 PCM stats respect the ramp's closed-form bounds") {
    import spark.implicits._
    val pcm = graft.SparkEntry.queries("q172_audio_pcm_decode")(spark, d)
      .select($"doc_id", $"channels", $"n_frames", $"sum_samples", $"sum_abs")
      .as[(Long, Int, Long, Long, Long)].collect()
    assert(pcm.nonEmpty)
    pcm.foreach { case (_, ch, frames, sum, sabs) =>
      val nSamples = frames * ch
      assert(sabs >= math.abs(sum)) // triangle inequality
      assert(sabs <= 2000L * nSamples) // ramp amplitude bound
      assert(sabs > 0) // non-silent by construction
    }
  }

  test("banded join recall holds for negative hashes at every hamming 1..7") {
    // Adversarial keys: bit 63 set (negative longs), each neighbor
    // flipping k bits SPREAD ACROSS k DISTINCT BANDS of the base —
    // the worst case for the pigeonhole bound (exactly 8-k intact
    // bands). Signed div/% band extraction mangles these; unsigned
    // shift+mask must recover every pair.
    import spark.implicits._
    val base = 0xF0F0F0F0F0F0F0F0L // bit 63 set -> negative
    def flip(h: Long, bits: Seq[Int]): Long = bits.foldLeft(h)((a, b) => a ^ (1L << b))
    // neighbor k flips bit 7 of bands 0..k-1 (k bits, k bands)
    val rows = (0L, "d0", base) +: (1 to 7).map { k =>
      (k.toLong, s"d$k", flip(base, (0 until k).map(b => b * 8 + 7)))
    }
    val keys = rows.toDF("doc_id", "digest", "ahash")
    for (h <- 1 to 7) {
      val got = Multimodal.bandedNearDupPairs(keys, h)
        .select($"doc_a", $"doc_b", $"hamming").as[(Long, Long, Int)].collect()
      // every neighbor within hamming h of doc 0 must be found
      val fromBase = got.filter(_._1 == 0L).map(p => p._2 -> p._3).toMap
      for (k <- 1 to h)
        assert(fromBase.get(k.toLong).contains(k),
          s"maxHamming=$h lost pair (0,$k) at hamming $k: $fromBase")
    }
  }
}
