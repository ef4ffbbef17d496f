package graft.llm

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contract of [[HeavyHitters]] (q86): the Misra–Gries candidate pass is a
  * superset of every true heavy hitter under ANY partitioning, candidate
  * volume is bounded by counters × partitions, and the exact recount makes
  * the final output partitioning-independent and equal to the brute-force
  * answer.
  */
class HeavyHittersSpec extends AnyFunSuite with SparkTestSession {

  private val d = "/root/testdata/sf0.001"

  private def tokens = graft.Tables(spark, d, "documents")
    .select(explode(split(col("text"), " ")).as("token"))

  private def bruteForce(k: Int) = {
    val n = tokens.count()
    tokens.groupBy(col("token")).agg(count(lit(1)).as("freq"))
      .filter(col("freq") * k > n)
  }

  test("candidates ⊇ all true heavy hitters, for skewed partitionings too") {
    val k = 20
    val expected = bruteForce(k).select("token")
    Seq(tokens, tokens.repartition(13), tokens.repartition(1),
      tokens.repartitionByRange(7, col("token"))).foreach { layout =>
      val cand = HeavyHitters.candidates(layout, "token", k)
      assert(expected.exceptAll(cand).isEmpty,
        "Misra–Gries lost a true heavy hitter — the superset guarantee broke")
    }
  }

  test("candidate volume is bounded by counters × partitions") {
    val k = 5
    val parts = tokens.repartition(4)
    val n = HeavyHitters.candidates(parts, "token", k).count()
    assert(n <= 4L * k, s"candidate bound violated: $n > ${4 * k}")
  }

  test("exact output equals brute force and is partitioning-independent") {
    val k = 20
    val expected = bruteForce(k)
    Seq(tokens, tokens.repartition(17)).foreach { layout =>
      val got = HeavyHitters.exactOverThreshold(layout, "token", k)
        .select("token", "freq")
      assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
        "two-pass output diverged from the exact answer")
    }
  }

  test("threshold is strict and exact (freq·k > N, integer arithmetic)") {
    val spark2 = spark
    import spark2.implicits._
    // 10 'a', 5 'b', 5 'c': N=20, k=4 → threshold freq>5: only 'a'
    val items = (Seq.fill(10)("a") ++ Seq.fill(5)("b") ++ Seq.fill(5)("c"))
      .toDF("item")
    val out = HeavyHitters.exactOverThreshold(items, "item", 4).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("a"))
    assert(out.head.getLong(1) === 10L)
  }

  test("invalid parameters are refused") {
    intercept[IllegalArgumentException](
      HeavyHitters.exactOverThreshold(tokens, "token", 0))
    intercept[IllegalArgumentException](
      HeavyHitters.candidates(tokens, "token", 0))
  }

  test("above the broadcast ceiling, the fallback semi join gives the same answer") {
    val k = 20
    val expected = bruteForce(k)
    // ceiling 0 forces the non-broadcast path
    val got = HeavyHitters
      .exactOverThreshold(tokens, "token", k, maxBroadcastCandidates = 0L)
    val gotKeyed = got.select("token", "freq")
    assert(gotKeyed.exceptAll(expected).isEmpty &&
      expected.exceptAll(gotKeyed).isEmpty,
      "fallback path diverged from the exact answer")
    // the ceiling removes the FORCED broadcast hint — the optimizer may
    // still choose to broadcast a genuinely small relation (as here, on
    // fixture data), but at scale its size estimate makes that choice,
    // not our hint; assert on the hint, not the planner's pick
    // (the one-row total relation keeps its hint in both shapes)
    def hints(df: org.apache.spark.sql.DataFrame) =
      "ResolvedHint".r.findAllIn(df.queryExecution.analyzed.toString).length
    assert(hints(got) === 1,
      "above the ceiling only the total relation may carry a hint")
    assert(hints(HeavyHitters.exactOverThreshold(tokens, "token", k)) === 2,
      "below the ceiling both the candidates and the total broadcast")
  }
}
