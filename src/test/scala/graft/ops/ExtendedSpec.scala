package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExtendedSpec extends AnyFunSuite with SparkTestSession {

  private val d = "/root/testdata/sf0.001"

  test("approx_count_distinct is within 5% of exact counts") {
    import spark.implicits._
    val approx = SparkEntry_q39(d)
    val exact = graft.Tables(spark, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("p"), countDistinct(col("l_suppkey")).as("s"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    approx.foreach { case (flag, ap, as_) =>
      val (ep, es) = exact(flag)
      assert(math.abs(ap - ep).toDouble / ep < 0.05, s"$flag parts: $ap vs $ep")
      assert(math.abs(as_ - es).toDouble / es < 0.05, s"$flag supps: $as_ vs $es")
    }
  }

  test("array-typed order item lists are sorted with consistent bounds") {
    import spark.implicits._
    val rows = Extended.orderItemArrays(spark, d)
      .select($"l_orderkey", $"n_items", $"part_keys", $"max_part", $"first_part")
      .as[(Long, Long, Seq[Long], Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, parts, maxPart, firstPart) =>
      assert(parts.length.toLong == n && n >= 7)
      assert(parts == parts.sorted)
      assert(maxPart == parts.max && firstPart == parts.head)
    }
  }

  private def SparkEntry_q39(dir: String) = {
    import spark.implicits._
    graft.SparkEntry.queries("q39_approx_distinct_parts")(spark, dir)
      .select($"l_returnflag", $"approx_parts", $"approx_supps")
      .as[(String, Long, Long)].collect()
  }

  test("q148's q-gram count filter is loss-free vs the brute-force linkage join") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val got = graft.SparkEntry.queries("q148_name_linkage_join")(spark, d)
      .select($"name_a", $"name_b", $"dist").as[(String, String, Int)].collect()
    assert(got.forall(r => r._3 >= 1 && r._3 <= 2 && r._1 < r._2))
    val names = graft.Tables(spark, d, "part").select($"p_name").distinct()
    val truth = names.as("a").join(names.as("b"),
        col("a.p_name") < col("b.p_name") &&
          levenshtein(col("a.p_name"), col("b.p_name")) <= 2)
      .select(col("a.p_name"), col("b.p_name")).as[(String, String)]
      .collect().toSet
    assert(got.map(r => (r._1, r._2)).toSet == truth,
      s"blocked join diverged from brute force: missing " +
        s"${truth.diff(got.map(r => (r._1, r._2)).toSet).take(5)}")
  }

  test("q148 candidates survive repeated-gram names the distinct bound would drop") {
    // Adversarial pair: 10-char names of alternating 'xa' — distinct
    // grams {xa, ax} intersect in only 2 < bound (10-5=5), so a
    // DISTINCT-gram count filter silently drops this true lev-1 pair.
    // The full-bag co-occurrence count (kept duplicates) must admit it.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val names = Seq("xaxaxaxaxa", "xaxaxaxaxb", "qrstuvwxyz")
      .toDF("name").withColumn("len", length(col("name")))
    val cand = Extended.levenshteinCandidates(names)
      .as[(String, String)].collect().toSet
    assert(cand.contains(("xaxaxaxaxa", "xaxaxaxaxb")),
      s"repeated-gram true pair lost by the count filter: $cand")
    // sanity: the unrelated name pairs share no grams and stay out
    assert(!cand.exists(p => p._1 == "qrstuvwxyz" || p._2 == "qrstuvwxyz"))
  }
}
