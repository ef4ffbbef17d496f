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
