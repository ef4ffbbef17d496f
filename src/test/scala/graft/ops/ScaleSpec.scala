package graft.ops

import java.nio.file.Files

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ScaleSpec extends AnyFunSuite with SparkTestSession {

  private val d = "/root/testdata/sf0.001"

  test("saltedJoin equals the plain join on skewed fixture data") {
    import spark.implicits._
    val li = graft.Tables(spark, d, "lineitem")
    val ord = graft.Tables(spark, d, "orders")
    val plain = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val salted = Scale
      .saltedJoin(li, ord, "l_orderkey", "o_orderkey", col("l_linenumber"), 4)
      .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(salted == plain)
  }

  test("q24's join condition keeps the cheap-to-expensive conjunct order") {
    // Regression guard: a split .filter chain once made Catalyst evaluate
    // the pushed-down intersect kernel before doc_a < doc_b (1.6× slower
    // at sf0.1). The cheap ordering + ratio conjuncts must precede the
    // kernel call in the join condition.
    val plan = graft.SparkEntry.queries("q24_jaccard_near_dup_pairs")(spark, d)
      .queryExecution.executedPlan.toString
    val joinLine = plan.linesIterator.find(l =>
      l.contains("Join") && l.contains("sorted_intersect_count_min"))
    assert(joinLine.isDefined, s"kernel not pushed into the join condition:\n$plan")
    val l = joinLine.get
    val cheap = l.indexOf("doc_a")
    val kernel = l.indexOf("sorted_intersect_count_min")
    assert(cheap >= 0 && cheap < kernel,
      s"doc_a < doc_b must precede the kernel in the join condition: $l")
  }

  test("q55 pivot plans as one aggregation pass — no value-discovery scan") {
    // pivot with an explicit value list must not add a distinct-values job
    // or a second scan of orders: exactly one parquet scan in the plan.
    val plan = graft.SparkEntry.queries("q55_pivot_order_counts")(spark, d)
      .queryExecution.executedPlan.toString
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 1, s"expected exactly 1 scan, got $scans:\n$plan")
  }

  test("q62 decontamination plans with no cross join and one documents scan") {
    val plan = graft.SparkEntry.queries("q62_decontamination")(spark, d)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"doc×doc product leaked into the plan:\n$plan")
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 1, s"inverted-index shape should scan documents once, got $scans:\n$plan")
  }

  test("LSH candidate stages plan postings lists, not band self-joins") {
    // band/bucket → pairs must go through a single grouped expansion
    // (Generate over the collected member list), never a self-join of the
    // band relation. q26 carries its fingerprints through the postings
    // list, so its whole plan is join-free; q25's only joins are the
    // verify-stage leg joins (shingle sets), not band×band.
    val q26 = graft.SparkEntry.queries("q26_simhash_dedup")(spark, d)
      .queryExecution.executedPlan.toString
    assert(!q26.contains("Join"), s"q26 must be join-free:\n$q26")
    assert(q26.contains("Generate explode"), s"q26 postings expansion missing:\n$q26")
    val q25 = graft.SparkEntry.queries("q25_minhash_lsh_dedup")(spark, d)
      .queryExecution.executedPlan.toString
    assert(q25.contains("Generate explode"), s"q25 postings expansion missing:\n$q25")
    // exactly the two verify leg-joins — a band self-join would add more
    val joins = q25.linesIterator.count(l => l.contains("Join"))
    assert(joins <= 2, s"q25 has $joins joins (band self-join leaked back?):\n$q25")
  }

  test("q59 stratified sampling filters in the scan stage, before any exchange") {
    // the md5 sampling predicate is not parquet-pushable, but it must
    // evaluate scan-side: the Filter sits below the first Exchange.
    val plan = graft.SparkEntry.queries("q59_stratified_sample")(spark, d)
      .queryExecution.executedPlan.toString
    val lines = plan.linesIterator.toVector
    // match the Filter OPERATOR only — the scan line itself mentions
    // "PushedFilters"/"DataFilters", which would make the check vacuous
    val firstFilter = lines.indexWhere(l => l.contains("Filter") && !l.contains("Scan"))
    val firstExchange = lines.indexWhere(_.contains("Exchange"))
    assert(firstFilter >= 0 && firstExchange >= 0 && firstFilter > firstExchange,
      // plans print top-down: scan-side Filter appears BELOW (after) the
      // Exchange line in the text, i.e. at a larger index
      s"sampling filter must be below the exchange (scan side):\n$plan")
  }

  test("bucketed tables join without a shuffle exchange") {
    val warehouse = Files.createTempDirectory("bucketed-wh").toString
    val db = "bucketdemo"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '$warehouse'")
    try {
      graft.Tables(spark, d, "lineitem")
        .select("l_orderkey", "l_quantity")
        .write.mode("overwrite")
        .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable(s"$db.li_b")
      graft.Tables(spark, d, "orders")
        .select("o_orderkey", "o_totalprice")
        .write.mode("overwrite")
        .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable(s"$db.ord_b")
      val joined = spark.table(s"$db.li_b")
        .join(spark.table(s"$db.ord_b"), col("l_orderkey") === col("o_orderkey"))
      // co-located by bucket: plan must contain no shuffle exchange
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(joined.count() > 0)
    } finally {
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    }
  }
}
