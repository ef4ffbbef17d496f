package graft.llm

import graft.SparkTestSession
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-7 curation operators (q127–q133) — the
  * oracle hash-match (Verify) proves engine agreement; these prove the
  * answers MEAN what the operators claim.
  */
class SemDedupSpec extends AnyFunSuite with SparkTestSession {

  private val d = "/root/testdata/sf0.001"

  test("q127: partition covers the corpus; identical vectors collapse to one survivor") {
    // synthetic corpus with KNOWN redundancy: 4 well-separated axis
    // directions, each present as an identical pair (plus noise-free
    // singletons), so exact duplicates MUST share an argmax cluster and
    // dedup to one survivor each
    val dir = java.nio.file.Files.createTempDirectory("semdedup").toString
    val dim = 8
    def vec(axis: Int, sign: Double): Seq[Float] =
      (0 until dim).map(i => if (i == axis) (sign * 1.0).toFloat else 0.05f)
    val rows = Seq(
      (0L, vec(0, 1)), (1L, vec(0, 1)),   // identical pair on axis 0
      (2L, vec(1, 1)), (3L, vec(1, 1)),   // identical pair on axis 1
      (4L, vec(2, 1)), (5L, vec(3, 1)),   // singletons
      (6L, vec(4, 1)), (7L, vec(5, 1)))
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, v) => Row(id, v, 0) }),
      schema)
    df.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val out = Similarity.semDedup(spark, dir, theta = 0.99).collect()
    assert(out.map(_.getLong(1)).sum == rows.length,
      "cluster sizes must partition the corpus")
    out.foreach { r =>
      assert(r.getLong(3) == r.getLong(1) - r.getLong(2), "kept = members - dropped")
      assert(r.getLong(2) >= 0 && r.getLong(2) < r.getLong(1),
        "at least one survivor per cluster")
    }
    // exactly the two identical-pair duplicates are dropped at θ=0.99:
    // cos(identical)=1 ≥ θ, and distinct axis directions stay below it
    assert(out.map(_.getLong(2)).sum == 2,
      s"expected exactly the 2 exact-duplicate drops, got ${out.map(_.getLong(2)).sum}")
  }

  test("q127: drops are monotone non-increasing in the threshold") {
    val loose = Similarity.semDedup(spark, d, theta = 0.3)
      .agg(sum("n_dropped")).collect()(0).getLong(0)
    val tight = Similarity.semDedup(spark, d, theta = 0.5)
      .agg(sum("n_dropped")).collect()(0).getLong(0)
    assert(loose >= tight,
      s"a looser cosine cut must drop at least as much ($loose < $tight)")
    assert(loose > 0, "fixture premise: θ=0.3 finds semantic redundancy")
  }

  test("q128: fused ranks are dense, borda is consistent with the side ranks") {
    val rows = graft.SparkEntry.queries("q128_hybrid_retrieval")(spark, d).collect()
    assert(rows.nonEmpty)
    val F = 20
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to rs.length),
        "fused ranks must be dense 1..k")
      val bordas = rs.sortBy(_.getInt(1)).map(_.getInt(3))
      assert(bordas.zip(bordas.tail).forall { case (a, b) => a >= b },
        "borda must be non-increasing in fused rank")
    }
    rows.foreach { r =>
      val (borda, bm, dn) = (r.getInt(3), r.getInt(4), r.getInt(5))
      assert(bm >= 0 && bm <= F && dn >= 0 && dn <= F)
      val expected = (if (bm > 0) F + 1 - bm else 0) + (if (dn > 0) F + 1 - dn else 0)
      assert(borda == expected, s"borda $borda != recomputed $expected")
      assert(borda >= 1, "a fused row must come from at least one retriever")
    }
  }

  test("q129: exactly min(m, group size) docs per language, ids from the corpus") {
    val docs = graft.Tables(spark, d, "documents")
    val sizes = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val out = graft.SparkEntry.queries("q129_balanced_group_sample")(spark, d)
    val got = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == sizes.keySet, "every language must be represented")
    got.foreach { case (lang, n) =>
      assert(n == math.min(40L, sizes(lang)),
        s"$lang: got $n, want min(40, ${sizes(lang)})")
    }
    // sampled ids must exist under the claimed language
    val bad = out.join(docs, Seq("lang", "doc_id"), "left_anti").count()
    assert(bad == 0, s"$bad sampled rows are not corpus (lang, doc_id) rows")
  }

  test("q130: median/MAD and flag counts match a brute-force recompute") {
    val docs = graft.Tables(spark, d, "documents")
      .select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1).toDouble))
    def median(xs: Array[Double]): Double = {
      val s = xs.sorted
      val h = (s.length - 1) * 0.5
      val (lo, hi) = (math.floor(h).toInt, math.ceil(h).toInt)
      s(lo) + (s(hi) - s(lo)) * (h - lo)
    }
    val med = median(docs.map(_._2))
    val mad = median(docs.map { case (_, x) => math.abs(x - med) })
    val expected = docs.groupBy(_._1).map { case (src, xs) =>
      src -> xs.count { case (_, x) => math.abs(x - med) > 3.0 * mad }
    }
    val out = graft.SparkEntry.queries("q130_mad_outlier_audit")(spark, d).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getDouble(3) == med, s"median ${r.getDouble(3)} != $med")
      assert(r.getDouble(4) == mad, s"MAD ${r.getDouble(4)} != $mad")
      assert(r.getLong(2) == expected(r.getString(0)).toLong,
        s"${r.getString(0)}: outliers ${r.getLong(2)} != ${expected(r.getString(0))}")
    }
  }

  test("q131: rank/count consistency; BM25 resolves the rare-term query at rank 1") {
    val rows = graft.SparkEntry.queries("q131_retrieval_eval")(spark, d).collect()
    assert(rows.nonEmpty)
    val byQ = rows.groupBy(_.getLong(0))
    byQ.foreach { case (_, rs) =>
      assert(rs.map(_.getString(1)).sorted.toSeq == Seq("bm25", "hybrid"),
        "both retrievers must be evaluated for every query")
    }
    rows.foreach { r =>
      val (first, n) = (r.getInt(2), r.getLong(3))
      assert(first >= 0 && first <= 10 && n >= 0 && n <= 10)
      assert((first == 0) == (n == 0),
        "no-relevant-in-top-k iff zero relevant counted")
    }
    // query 3's 'dup' is the corpus's rare term (SearchSpec proves BM25
    // ranks dup-docs first), so BM25's first relevant hit must be rank 1
    val q3bm = rows.find(r => r.getLong(0) == 3L && r.getString(1) == "bm25").get
    assert(q3bm.getInt(2) == 1, s"bm25 q3 first_rel_rank ${q3bm.getInt(2)} != 1")
  }

  test("q132: matrix cells sum to the exact-duplicate pair total from q23's groups") {
    val cells = graft.SparkEntry.queries("q132_cross_source_dup_matrix")(spark, d)
      .agg(org.apache.spark.sql.functions.sum("n_dup_pairs"))
      .collect()(0).getLong(0)
    val fromGroups = Dedup.exactDedupGroups(spark, d)
      .select("n_copies").collect()
      .map(r => { val g = r.getLong(0); g * (g - 1) / 2 }).sum
    assert(cells == fromGroups,
      s"matrix total $cells != C(g,2) over dedup groups $fromGroups")
    assert(cells > 0, "fixture premise: exact duplicates exist")
  }

  test("q133: allocation fits the budget and the cap is maximal") {
    val out = graft.SparkEntry.queries("q133_token_budget_waterfill")(spark, d).collect()
    assert(out.nonEmpty)
    val tokens = out.map(_.getLong(1))
    val alloc = out.map(_.getLong(2))
    val cap = out.head.getLong(4)
    val budget = tokens.sum / 2
    assert(alloc.sum <= budget, s"allocated ${alloc.sum} exceeds budget $budget")
    out.foreach { r =>
      val (t, a, c) = (r.getLong(1), r.getLong(2), r.getInt(3))
      assert(a == math.min(t, cap), "allocation must be min(tokens, cap)")
      assert((c == 1) == (t > cap), "capped flag must reflect the cap")
    }
    // maximality: raising the cap by one must overflow the budget
    assert(tokens.map(t => math.min(t, cap + 1)).sum > budget,
      "cap is not the largest integer fitting the budget")
  }

  test("q134: weighted quantiles match a driver-side weighted scan") {
    val rows = graft.Tables(spark, d, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("n_chars"),
        org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.split(
            org.apache.spark.sql.functions.col("text"), " ")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._2, t._1)) // (n_chars, doc_id) — the operator's order
    val wtot = rows.map(_._3).sum
    def brute(num: Long, den: Long): Long = {
      val t = (wtot * num + den - 1) / den
      var c = 0L
      rows.find { r => c += r._3; c >= t }.get._2
    }
    val out = graft.SparkEntry.queries("q134_weighted_quantiles")(spark, d)
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(out(0.25) == brute(1, 4) && out(0.5) == brute(1, 2) &&
      out(0.75) == brute(3, 4),
      s"weighted quantiles $out != brute (${brute(1, 4)}, ${brute(1, 2)}, ${brute(3, 4)})")
  }

  test("q135: funnel counts are monotone and step 1 equals the signup-user count") {
    val out = graft.SparkEntry.queries("q135_kstep_funnel")(spark, d)
      .collect().sortBy(_.getInt(0)).map(_.getLong(2))
    assert(out.length == 4)
    assert(out.zip(out.tail).forall { case (a, b) => a >= b },
      s"funnel must be non-increasing: ${out.toSeq}")
    val signupUsers = graft.Tables(spark, d, "events")
      .filter(org.apache.spark.sql.functions.col("event_type") === "signup")
      .select("user_id").distinct().count()
    assert(out(0) == signupUsers,
      s"step 1 ${out(0)} != distinct signup users $signupUsers")
    assert(out(3) > 0, "fixture premise: some users complete the 4-step funnel")
  }

  test("q136: exact prefix-filter join contains every q25 LSH-verified pair") {
    // q136 is the EXACT answer on q25's own measure (3-shingle Jaccard
    // ≥ 0.6): the approximate path's verified pairs must be a subset —
    // a prefix-length bug (lost true pair) breaks containment, and
    // recall(q25) measured against q136 is the honest recall number
    val exact = graft.SparkEntry.queries("q136_prefix_filter_simjoin")(spark, d)
    val exactPairs = exact.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exactPairs.nonEmpty, "fixture premise: shingle near-dups exist")
    val lsh = Dedup.minhashDedup(spark, d)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exactPairs),
      s"LSH-verified pairs outside the exact answer: ${lsh.diff(exactPairs)}")
    graft.Checkpoints.release(exact)
  }

  test("q137: star-schema FK edges are clean; the events edge is the loose one") {
    val rows = graft.SparkEntry.queries("q137_referential_integrity")(spark, d)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows.size == 6)
    // the TPC-H-style generator produces referentially-intact facts
    Seq("lineitem->orders", "lineitem->part", "lineitem->supplier",
      "orders->customer", "customer->nation").foreach { e =>
      assert(rows(e)._3 == 0, s"$e has ${rows(e)._3} orphan rows")
    }
    rows.foreach { case (e, (children, distinct, orphans, _)) =>
      assert(children >= distinct && orphans <= children, s"$e counts inconsistent")
    }
  }

  test("q139: cohort counts recompute; transitive hop stays inside the direct one") {
    val rows = graft.SparkEntry.queries("q139_deletion_propagation")(spark, d)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.keySet == Set("customer", "events", "orders", "lineitem"))
    // the cohort predicate recomputed directly must agree with the audit
    val cohortCustomers = graft.Tables(spark, d, "customer")
      .filter(graft.Ids.hash("c_custkey") < org.apache.spark.sql.functions.lit(85899345L))
      .count()
    assert(rows("customer")._1 == cohortCustomers,
      s"customer audit ${rows("customer")._1} != recompute $cohortCustomers")
    assert(cohortCustomers > 0, "fixture premise: the 2% cohort is non-empty")
    // orders→customer is a clean FK edge (q137), so order-placing cohort
    // users are a subset of cohort customers; lineitem only covers
    // orders that have lines
    assert(rows("orders")._2 <= rows("customer")._1)
    assert(rows("lineitem")._2 <= rows("orders")._2)
  }

  test("q140: every user contributes exactly n_events-1 gaps; avg within [min, max]") {
    val out = graft.SparkEntry.queries("q140_transition_gap_profile")(spark, d).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, mn, mx, avg) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(mn >= 0, "events sorted by ts — a negative gap is a sort bug")
      assert(avg * 1e6 >= mn - 1e-6 && avg * 1e6 <= mx + 1e-6,
        s"avg $avg s outside [${mn}us, ${mx}us]")
      assert(n > 0)
    }
    val events = graft.Tables(spark, d, "events")
    val totalGaps = out.map(_.getLong(2)).sum
    val expected = events.count() - events.select("user_id").distinct().count()
    assert(totalGaps == expected,
      s"gap total $totalGaps != events - users $expected")
  }

  test("q141: the audit notices the fixture's header/detail divergence") {
    val rows = graft.SparkEntry.queries("q141_rollup_reconciliation")(spark, d).collect()
    assert(rows.nonEmpty)
    val (orders, mismatched) = (rows.map(_.getLong(1)).sum, rows.map(_.getLong(3)).sum)
    // the synthetic headers are generated independently of the lines —
    // the audit's entire job is to report that, loudly
    assert(mismatched > orders / 2,
      s"fixture premise: headers diverge from rollups ($mismatched of $orders)")
    rows.foreach { r =>
      // a lineless header counts as mismatched too (delta = its full
      // total), so the two counts overlap — each is bounded by n_orders
      assert(r.getLong(2) <= r.getLong(1) && r.getLong(3) <= r.getLong(1),
        "counts consistent")
      assert(r.getDouble(4) >= 0 && r.getDouble(5) >= 0, "deltas non-negative")
    }
  }

  test("q142: bands partition the corpus into near-quarters") {
    val out = graft.SparkEntry.queries("q142_quantile_band_mix")(spark, d).collect()
    val total = out.map(_.getLong(2)).sum
    assert(total == graft.Tables(spark, d, "documents").count())
    val byBand = out.groupBy(_.getInt(1)).view.mapValues(_.map(_.getLong(2)).sum)
    assert(byBand.keySet == Set(1, 2, 3, 4), s"bands present: ${byBand.keySet}")
    byBand.foreach { case (b, n) =>
      // quartile bands are quarter-sized up to tie plateaus
      assert(n >= total / 8 && n <= total * 3 / 8, s"band $b holds $n of $total")
    }
  }

  test("q143: chi-squared cells reconcile with their marginals") {
    val out = graft.SparkEntry.queries("q143_chi2_independence")(spark, d).collect()
    assert(out.nonEmpty)
    val n = out.map(_.getLong(2)).sum.toDouble
    val byLang = out.groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(2)).sum)
    out.foreach { r =>
      val expected = r.getDouble(3)
      assert(expected > 0 && r.getDouble(4) >= 0)
      // expected cell mass sums to the row marginal across its row —
      // spot-check via one lang: Σ_src expected(lang, src) ≈ n_lang when
      // every source appears in the row's grid slice
    }
    // Σ observed = corpus; expected totals match observed totals per lang
    assert(n == graft.Tables(spark, d, "documents").count().toDouble)
    byLang.foreach { case (lang, nl) =>
      val expSum = out.filter(_.getString(0) == lang).map(_.getDouble(3)).sum
      assert(math.abs(expSum - nl) < nl * 0.2 + 1,
        s"$lang expected-mass $expSum far from marginal $nl")
    }
  }

  test("q138: fertility ratios are finite and coherent per language") {
    val rows = graft.SparkEntry.queries("q138_tokenizer_fertility")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (chars, bpe, words) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(bpe >= words,
        s"${r.getString(0)}: BPE must split at least to words ($bpe < $words)")
      assert(chars > bpe, s"${r.getString(0)}: a token averages > 1 char")
      assert(r.getDouble(5) == chars.toDouble / bpe.toDouble &&
        r.getDouble(6) == bpe.toDouble / words.toDouble, "ratio recompute")
    }
  }
}
