package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contract of [[Scale.bloomPrune]] (q85): answer-preserving pruning (no
  * false negatives), bounded over-keep (false-positive rate), the plan
  * shape that makes it matter at scale (the predicate below the join's
  * exchange), and the empty-build-side short-circuit.
  */
class BloomPruneSpec extends AnyFunSuite with SparkTestSession {

  private val d = "/root/testdata/sf0.001"
  private def lineitem = graft.Tables(spark, d, "lineitem")
  private def parts =
    graft.Tables(spark, d, "part").filter(col("p_brand") === "Brand#23")

  test("pruned join is row-identical to the plain join (no false negatives)") {
    val cond = col("l_partkey") === col("p_partkey")
    val pruned = Scale
      .bloomPrune(lineitem, "l_partkey", parts, "p_partkey", 1024)
      .join(parts, cond)
    val plain = lineitem.join(parts, cond)
    assert(pruned.exceptAll(plain).isEmpty, "pruning invented rows")
    assert(plain.exceptAll(pruned).isEmpty, "pruning lost matching rows")
  }

  test("pruning keeps every match and over-keeps only within fpp slack") {
    val n = lineitem.count()
    val matches = lineitem
      .join(parts.select("p_partkey"),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .count()
    val kept = Scale
      .bloomPrune(lineitem, "l_partkey", parts, "p_partkey", 1024, 0.01)
      .count()
    assert(kept >= matches, "a Bloom filter must never drop a match")
    assert(kept <= matches + (0.05 * n).toLong,
      s"false-positive keep-through too high: kept=$kept matches=$matches n=$n")
  }

  test("the might_contain predicate sits below the join exchange") {
    val pruned =
      Scale.bloomPrune(lineitem, "l_partkey", parts, "p_partkey", 1024)
    val p = pruned
      .join(parts.hint("merge"), col("l_partkey") === col("p_partkey"))
      .queryExecution.executedPlan.toString
    assert(p.contains("might_contain"), s"bloom predicate missing:\n$p")
    // tree prints root-first: the exchange line must come BEFORE the
    // filter line, i.e. the filter evaluates before rows reach the shuffle
    assert(p.indexOf("Exchange") >= 0 &&
      p.indexOf("might_contain") > p.indexOf("Exchange"),
      s"bloom predicate must be below the exchange:\n$p")
  }

  test("empty build side short-circuits to zero rows") {
    val none = parts.filter(lit(false))
    assert(Scale.bloomPrune(lineitem, "l_partkey", none, "p_partkey", 16)
      .count() === 0)
  }

  test("invalid parameters are refused") {
    intercept[IllegalArgumentException](
      Scale.bloomPrune(lineitem, "l_partkey", parts, "p_partkey", 0))
    intercept[IllegalArgumentException](
      Scale.bloomPrune(lineitem, "l_partkey", parts, "p_partkey", 10, 1.5))
  }

  test("an oversized build is not silently clamped, and the ceilings are restored") {
    // Spark's BloomFilterAggregate Math.min-clamps items/bits to the
    // runtime-filter confs (4M/67.1M defaults) with no error — a 100M-key
    // build would realize fpp≈1 while the caller believes 1%. bloomPrune
    // must lift the ceilings for the build, and must NOT leave them
    // escalated (they also bound Catalyst's auto-injected filters).
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumItems",
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits")
    val before = keys.map(spark.conf.get(_))
    val items = 8000000L // > 4M default; optimal bits 76.7M > 67.1M default
    val bits = math.ceil(
      -items * math.log(0.01) / (math.log(2) * math.log(2))).toLong
    val pruned =
      Scale.bloomPrune(lineitem, "l_partkey", parts, "p_partkey", items)
    assert(pruned.count() > 0) // build executed
    // the filter ships as a binary literal in the predicate — its size
    // proves the build ran UNclamped (clamped would be ≤ 67.1M bits)
    val litBytes = pruned.queryExecution.analyzed
      .expressions.flatMap(_.collect {
        case l: org.apache.spark.sql.catalyst.expressions.Literal
            if l.dataType ==
              org.apache.spark.sql.types.BinaryType && l.value != null =>
          l.value.asInstanceOf[Array[Byte]].length
      }).max
    assert(litBytes.toLong >= bits / 8,
      s"filter literal is $litBytes bytes — smaller than the requested " +
        s"${bits / 8}; the build was clamped")
    assert(keys.map(spark.conf.get(_)) == before,
      "bloomPrune must restore the session ceilings after the build")
  }
}
