package graft.ops

import graft.SparkTestSession
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property checks for Scale.groupedRank — the two-pass range-shuffle
  * grouped rank that q180/q198/q342/q344/q348/q349 all ride — against a
  * BRUTE-FORCE Scala re-derivation (plain sort per group; shares nothing
  * with Spark's window algebra OR the range-partitioner mechanics under
  * test). Generators force the shapes the operator exists for: heavily
  * SKEWED groups (one group holding most rows — the 100 TB hazard),
  * heavy value ties (range-boundary splits land inside tie blocks),
  * singleton and empty-ish groups, and arbitrary input partitioning.
  * Fixed ScalaCheck seeds (the SketchPropertySpec convention): every run
  * exercises the same cases — reproducible failures, no flakes.
  */
class GroupedRankPropertySpec extends AnyFunSuite with SparkTestSession {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(fail(s"generator returned no value for seed $seed"))

  /** (group, value, id) rows: few groups, Zipf-ish sizes, tiny value
    * domain for dense ties; ids unique (the total-order tie-break).
    */
  private val corpusGen: Gen[List[(Long, Long, Long)]] = for {
    nGroups <- Gen.choose(1, 6)
    // per-group sizes: one group can dwarf the rest (skew is the point)
    sizes <- Gen.listOfN(nGroups, Gen.frequency(
      (3, Gen.choose(1, 20)), (2, Gen.choose(50, 400)), (1, Gen.const(1))))
    valueDomain <- Gen.choose(2, 9)
    rows <- Gen.sequence[List[List[(Long, Long)]], List[(Long, Long)]](
      sizes.zipWithIndex.map { case (n, g) =>
        Gen.listOfN(n, Gen.choose(0L, valueDomain.toLong - 1))
          .map(_.map(v => (g.toLong, v)))
      })
  } yield rows.flatten.zipWithIndex.map { case ((g, v), i) => (g, v, i.toLong) }

  /** Brute force: per group, the ascending-sorted value multiset —
    * rank k's VALUE is well-defined whatever tie-break ranks used.
    */
  private def sortedByGroup(rows: Seq[(Long, Long, Long)]): Map[Long, Vector[Long]] =
    rows.groupBy(_._1).map { case (g, rs) => g -> rs.map(_._2).sorted.toVector }

  test("groupedRank: ranks are per-group permutations with exact values-at-rank (10 seeded corpora)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    for (seed <- 1L to 10L) {
      val rows = sample(corpusGen, seed)
      val truth = sortedByGroup(rows)
      // vary the INPUT partitioning too: the operator must not depend on
      // how the caller's frame happens to be distributed
      val nPart = 1 + (seed % 5).toInt
      val df = rows.toDF("g", "v", "id").repartition(nPart)
      val ranked = Scale.groupedRank(df, Seq("g"), "rk", Some("n"), col("v"))
      val got = ranked.select($"g", $"rk", $"v", $"n")
        .as[(Long, Long, Long, Long)].collect()
      // 1. per group: ranks form exactly 1..n and n matches the size
      got.groupBy(_._1).foreach { case (g, rs) =>
        val n = truth(g).size.toLong
        assert(rs.map(_._2).sorted.toSeq == (1L to n),
          s"seed $seed group $g: ranks are not a permutation of 1..$n")
        assert(rs.forall(_._4 == n),
          s"seed $seed group $g: count column != $n")
      }
      // 2. the value at every (group, rank) equals the sorted multiset's
      got.foreach { case (g, rk, v, _) =>
        val want = truth(g)((rk - 1).toInt)
        assert(v == want,
          s"seed $seed group $g rank $rk: value $v != sorted multiset's $want")
      }
      graft.Checkpoints.release(ranked)
    }
  }

  test("groupedQuantiles equals a brute-force R-7 per group (10 seeded corpora)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val fractions = Seq(0.0, 0.25, 0.5, 0.75, 1.0)
    for (seed <- 21L to 30L) {
      val rows = sample(corpusGen, seed)
      val truth = sortedByGroup(rows)
      // brute-force R-7 on integer values: h = (n−1)p + 1, x_lo + (x_hi −
      // x_lo)·(h − ⌊h⌋) — the operator's documented fold, recomputed in
      // plain Scala over the sorted multiset
      def r7(vs: Vector[Long], p: Double): Double = {
        val h = (vs.size - 1) * p + 1
        val lo = math.floor(h).toInt
        val hi = math.ceil(h).toInt
        vs(lo - 1) + (vs(hi - 1) - vs(lo - 1)) * (h - lo)
      }
      val df = rows.toDF("g", "v", "id").repartition(1 + (seed % 3).toInt)
      val got = Scale.groupedQuantiles(df, Seq("g"), "v", fractions)
      val gotRows = got.as[(Long, Double, Double)].collect()
      assert(gotRows.length == truth.size * fractions.size,
        s"seed $seed: one row per (group, fraction)")
      gotRows.foreach { case (g, p, quant) =>
        val want = r7(truth(g), p)
        assert(quant == want,
          s"seed $seed group $g p=$p: got $quant, brute force says $want")
      }
      graft.Checkpoints.release(got)
    }
  }

  test("groupedRank under a total order equals the keyed window row-for-row (10 seeded corpora)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    for (seed <- 11L to 20L) {
      val rows = sample(corpusGen, seed)
      val df = rows.toDF("g", "v", "id").repartition(1 + (seed % 4).toInt)
      val w = Window.partitionBy($"g").orderBy($"v", $"id")
      val expected = df.withColumn("rk", row_number().over(w).cast("long"))
        .select($"id", $"rk").as[(Long, Long)].collect().toMap
      val got = Scale.groupedRank(df, Seq("g"), "rk", None, $"v", $"id")
      val gotMap = got.select($"id", $"rk").as[(Long, Long)].collect().toMap
      assert(gotMap == expected, s"seed $seed: total-order rank mismatch")
      graft.Checkpoints.release(got)
    }
  }
}
