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
}
