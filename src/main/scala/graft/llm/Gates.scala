package graft.llm

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-backed REGRESSION GATES for the approximate/hash-family
  * operators (the seven `no_oracle` queries). Sketch internals are
  * engine-specific by design, so their raw outputs can't hash-match
  * DuckDB — but their CONTRACTS can: an error band around an exact
  * aggregate, a recall floor against an oracle-computable truth set, a
  * subset guarantee. Each gate computes the contract verdict Spark-side
  * as deterministic booleans next to oracle-computable exact anchors, so
  * the driver's hash gate (and `Verify` locally) catches a regression in
  * the approximate path — previously only ScalaTest properties did.
  *
  * Thresholds are fixed constants measured across all three fixture SFs
  * with explicit margin (each gate's comment records the measured
  * values); they gate CONTRACT violations, not noise.
  */
object Gates {

  private def defOf(defs: Seq[QueryDef], name: String): QueryDef =
    defs.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(s"no registered query named $name"))

  /** Count-and-compare scaffold shared by every recall gate: one row,
    * `n_truth` (oracle-anchored) + booleans, all computed in-plan (the
    * single-row aggregates cross-join — no driver-side actions). With
    * `withFpCheck`, also asserts found ⊆ truth via a left-anti count.
    */
  private def recallRow(truth: DataFrame, found: DataFrame, keys: Seq[String],
      floor: Double, withFpCheck: Boolean = false): DataFrame = {
    val hits = truth.join(found, keys, "left_semi")
    val base = truth.agg(count(lit(1)).as("n_truth"))
      .crossJoin(hits.agg(count(lit(1)).as("n_hit")))
    val withFp =
      if (!withFpCheck) base
      else base.crossJoin(found.join(truth, keys, "left_anti")
        .agg(count(lit(1)).as("n_fp")))
    val cols = Seq(col("n_truth"),
      (col("n_hit").cast("double") >= col("n_truth").cast("double") * floor)
        .as("recall_ok")) ++
      (if (withFpCheck) Seq((col("n_fp") === 0L).as("no_false_positives")) else Nil)
    withFp.select(cols: _*)
  }

  val queries: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------------
    // q105: HLL error-band gate for q39 (approx_count_distinct, rsd=2%).
    // The sketch estimate must land within ±5% (2.5 standard errors) of
    // the exact distinct count on every group; the exact counts are the
    // oracle anchor. Measured relative error ≤2% on all groups at
    // sf0.001/0.01/0.1.
    QueryDef.sql("q105_hll_error_band") { (s, d) =>
      val li = Tables(s, d, "lineitem")
      def inBand(a: Column, e: Column): Column =
        abs(a.cast("double") - e.cast("double")) <= e.cast("double") * 0.05
      // Mixing exact countDistinct with other aggregates makes Catalyst
      // Expand every row 4x (one replica per distinct/plain aggregate
      // group). Instead: the two HLLs + the row count in ONE un-expanded
      // scan pass, and each exact distinct as its own SHRINKING two-level
      // agg — partial (flag, key) dedup map-side, then a count of the
      // deduped relation. 2.9s -> 1.0s at sf0.1, and the sf1 suite cost
      // drops with the Expand's memory traffic.
      val sketch = li.groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n_rows"),
          approx_count_distinct(col("l_partkey"), rsd = 0.02).as("a_parts"),
          approx_count_distinct(col("l_suppkey"), rsd = 0.02).as("a_supps"))
      def exactDistinct(key: String, as: String) =
        li.select(col("l_returnflag"), col(key)).distinct()
          .groupBy(col("l_returnflag")).agg(count(lit(1)).as(as))
      sketch
        .join(broadcast(exactDistinct("l_partkey", "exact_parts")), Seq("l_returnflag"))
        .join(broadcast(exactDistinct("l_suppkey", "exact_supps")), Seq("l_returnflag"))
        .select(col("l_returnflag"), col("exact_parts"), col("exact_supps"),
          col("n_rows"),
          inBand(col("a_parts"), col("exact_parts")).as("parts_in_band"),
          inBand(col("a_supps"), col("exact_supps")).as("supps_in_band"))
        .orderBy("l_returnflag")
    } {
      """SELECT l_returnflag,
        |  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS exact_supps,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  TRUE AS parts_in_band,
        |  TRUE AS supps_in_band
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin
    },

    // ------------------------------------------------------------------
    // q106: rank-error gate for q67 (approx_percentile, accuracy=10000).
    // The guarantee is on RANK, not value: for each reported quantile v,
    // the target rank q·n must fall inside [count(<v) − εn, count(≤v) + εn]
    // with ε = 1/accuracy (the count(<v)..count(≤v) interval handles the
    // tie plateaus of integer-valued quantities). Exact median is the
    // oracle anchor (Spark `percentile` ≡ DuckDB QUANTILE_CONT, exact in
    // binary on integer-valued data).
    QueryDef.sql("q106_approx_percentile_rank_band") { (s, d) =>
      val acc = graft.ops.Stats.ApproxPercentileAccuracy
      val li = Tables(s, d, "lineitem").select(col("l_returnflag"), col("l_quantity"))
      val agg = li.groupBy(col("l_returnflag")).agg(
        expr(s"approx_percentile(l_quantity, array(0.25, 0.5, 0.75), $acc)").as("ap"),
        expr("percentile(l_quantity, 0.5)").as("exact_median"))
      def rankOk(q: Double, i: Int): Column = {
        val v = element_at(col("ap"), i)
        val lt = sum(when(col("l_quantity") < v, 1L).otherwise(0L)).cast("double")
        val le = sum(when(col("l_quantity") <= v, 1L).otherwise(0L)).cast("double")
        val n = count(lit(1)).cast("double")
        val eps = n / acc + 1.0
        (lit(q) * n >= lt - eps) && (lit(q) * n <= le + eps)
      }
      li.join(broadcast(agg), Seq("l_returnflag"))
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          max(col("exact_median")).as("exact_median"),
          rankOk(0.25, 1).as("p25_rank_ok"),
          rankOk(0.50, 2).as("median_rank_ok"),
          rankOk(0.75, 3).as("p75_rank_ok"))
        .orderBy("l_returnflag")
    } {
      """SELECT l_returnflag,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  QUANTILE_CONT(l_quantity, 0.5) AS exact_median,
        |  TRUE AS p25_rank_ok,
        |  TRUE AS median_rank_ok,
        |  TRUE AS p75_rank_ok
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin
    },

    // ------------------------------------------------------------------
    // q107: MinHash-LSH recall gate for q25, against the EXHAUSTIVE
    // 3-word-shingle Jaccard ≥ 0.5 truth — q25's own similarity contract
    // (q24's token-set J ≥ 0.6 is a different measure: a pair can share
    // 60% of its vocabulary with near-zero shingle overlap, so it is not
    // a recall target for a shingle verifier). The truth is exhaustive
    // (un-blocked) over a FIXED 500-doc sample, so the oracle's
    // all-pairs cost stays constant as the corpus scales while the
    // GATED path (minhashDedup) still runs over the full corpus.
    // Shingles are md5-hashed to 60-bit ints on BOTH engines before the
    // pairwise intersects — engine-identical (md5), and integer-array
    // intersection is several times cheaper than ~20-char-string
    // intersection across the 125k truth pairs (this was the most
    // expensive registered query before the change). Collisions would
    // need two shingles of one PAIR to share 60 bits: P ≈ 300²·125k/2⁶¹
    // ≈ 5e-9 — not a truth hazard. Measured recall ≥ 0.8 at every
    // fixture SF (LlmSpec measures the same bound exhaustively at
    // sf0.001).
    QueryDef.sql("q107_minhash_recall_gate") { (s, d) =>
      graft.functions.SortedIntersectCount.register(s)
      // round 16: the all-pairs truth verify rides the early-exit
      // sorted-merge kernel (q24's posture) instead of per-pair
      // array_intersect hash sets — same md5-derived shingle hashes,
      // sorted once per doc, and J ≥ 0.5 ⟺ 3·i ≥ na+nb, so the integer
      // minRequired = ceil((na+nb)/3) decides the pair with no float
      // compare; truth set identical (exact count when kept, -1 when
      // provably below threshold). One caveat (round-16 ADVICE): the
      // kernel counts equal runs pairwise where array_intersect deduped —
      // identical HERE because array_distinct above makes each doc's
      // hashed shingle array duplicate-free unless two distinct shingles
      // of one doc collide in the 60-bit hash (P ≈ 5e-9 per pair, and the
      // old path was equally collision-exposed through n = size(sh)).
      val docs = Tables(s, d, "documents")
        .filter(col("doc_id") < 500)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= 3)
        .withColumn("sh", expr(
          """sort_array(transform(
            |  array_distinct(transform(sequence(0, size(toks) - 3),
            |    i -> concat_ws(' ', slice(toks, i + 1, 3)))),
            |  x -> cast(conv(substring(md5(x), 1, 15), 16, 10) AS bigint)))""".stripMargin))
        .select(col("doc_id"), col("sh"), size(col("sh")).as("n"))
      val truth = docs.select(col("doc_id").as("doc_a"), col("sh").as("sa"), col("n").as("na"))
        .join(docs.select(col("doc_id").as("doc_b"), col("sh").as("sb"), col("n").as("nb")),
          col("doc_a") < col("doc_b"))
        .withColumn("i", expr(
          "sorted_intersect_count_min(sa, sb, cast((na + nb + 2) DIV 3 AS int))"))
        .filter(col("i") >= 0)
        .select("doc_a", "doc_b")
      val found = Dedup.minhashDedup(s, d)
        .filter(col("doc_a") < 500 && col("doc_b") < 500)
        .select("doc_a", "doc_b")
      recallRow(truth, found, Seq("doc_a", "doc_b"), floor = 0.8)
    } {
      """WITH t AS (
        |  SELECT doc_id, STRING_SPLIT(text, ' ') AS toks FROM documents
        |  WHERE doc_id < 500 AND LEN(STRING_SPLIT(text, ' ')) >= 3),
        |s AS (
        |  SELECT doc_id,
        |    LIST_TRANSFORM(
        |      LIST_DISTINCT(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(toks) - 2),
        |        i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])),
        |      x -> CAST(('0x' || SUBSTRING(MD5(x), 1, 15)) AS BIGINT)) AS sh
        |  FROM t),
        |p AS (
        |  SELECT LEN(LIST_INTERSECT(a.sh, b.sh)) AS i,
        |         LEN(a.sh) AS na, LEN(b.sh) AS nb
        |  FROM s a JOIN s b ON a.doc_id < b.doc_id)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_truth, TRUE AS recall_ok
        |FROM p
        |WHERE CAST(i AS DOUBLE) >= 0.5 * CAST(na + nb - i AS DOUBLE)""".stripMargin
    },

    // ------------------------------------------------------------------
    // q108: SimHash completeness gate for q26: every EXACT duplicate pair
    // (byte-identical text → identical fingerprint → hamming 0) must
    // appear among the simhash pairs — the pigeonhole banding may miss
    // borderline hamming-3 pairs, never identical ones. The exact-dup
    // pair count is the oracle anchor.
    QueryDef.sql("q108_simhash_exact_dup_gate") { (s, d) =>
      val docs = Tables(s, d, "documents").select(col("doc_id"), col("text"))
      val dupPairs = docs.groupBy(col("text"))
        .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
        .filter(size(col("ids")) > 1)
        .select(explode(expr(
          """flatten(transform(ids, (a, i) ->
            |  transform(slice(ids, i + 2, size(ids)), b ->
            |    struct(a AS doc_a, b AS doc_b))))""".stripMargin)).as("p"))
        .select(col("p.doc_a"), col("p.doc_b"))
      val found = Dedup.simhashDedup(s, d).select("doc_a", "doc_b")
      recallRow(dupPairs, found, Seq("doc_a", "doc_b"), floor = 1.0)
        .withColumnRenamed("n_truth", "n_exact_dup_pairs")
        .withColumnRenamed("recall_ok", "all_found")
    } {
      """SELECT CAST(COALESCE(SUM((c * (c - 1)) // 2), 0) AS BIGINT) AS n_exact_dup_pairs,
        |  TRUE AS all_found
        |FROM (SELECT COUNT(*) AS c FROM documents GROUP BY text HAVING COUNT(*) > 1)""".stripMargin
    },

    // ------------------------------------------------------------------
    // q109: hyperplane-LSH ANN recall gate for q28, against q27's exact
    // brute-force top-10 (oracle-computable). Multi-table + Hamming-≤2
    // query probes at the adaptive plane count: measured recall 1.0 at
    // the three fixture SFs and 0.92 at the derived sf1.0.
    QueryDef.sql("q109_ann_lsh_recall_gate") { (s, d) =>
      val truth = defOf(Similarity.queries, "q27_cosine_topk")
        .run(s, d).select("q_id", "neighbor_id")
      val found = Similarity.annLsh(s, d).select("q_id", "neighbor_id")
      recallRow(truth, found, Seq("q_id", "neighbor_id"), floor = 0.7)
    } {
      s"""SELECT CAST(COUNT(*) AS BIGINT) AS n_truth, TRUE AS recall_ok
         |FROM (${defOf(Similarity.queries, "q27_cosine_topk").oracle.get})""".stripMargin
    },

    // ------------------------------------------------------------------
    // q110: IVF ANN recall gate for q75, against the same q27 truth.
    // nprobe=4 of k=16 clusters: measured recall 0.54–0.68 at the three
    // fixture SFs (LlmSpec measures the same at sf0.01).
    QueryDef.sql("q110_ivf_recall_gate") { (s, d) =>
      val truth = defOf(Similarity.queries, "q27_cosine_topk")
        .run(s, d).select("q_id", "neighbor_id")
      val found = Similarity.annIvf(s, d).select("q_id", "neighbor_id")
      recallRow(truth, found, Seq("q_id", "neighbor_id"), floor = 0.4)
    } {
      s"""SELECT CAST(COUNT(*) AS BIGINT) AS n_truth, TRUE AS recall_ok
         |FROM (${defOf(Similarity.queries, "q27_cosine_topk").oracle.get})""".stripMargin
    },

    // ------------------------------------------------------------------
    // q278: PQ-ADC recall gate for q277, against the exact q27 cosine
    // top-10 (oracle-anchored). Measured recall@10 of the
    // shortlist-then-exact-rerank path: 0.84 / 0.92 / 0.70 at
    // sf0.001/0.01/0.1 (shortlist 100 ≈ 0.2% of the sf0.1 corpus); the
    // 0.55 floor sits below the minimum with margin. A codebook /
    // encoding / ADC regression (wrong block slice, lost tie-break,
    // broken table lookup) collapses the shortlist toward random
    // (recall ≈ shortlist/N) and trips this hard.
    QueryDef.sql("q278_pq_adc_recall_gate") { (s, d) =>
      val truth = defOf(Similarity.queries, "q27_cosine_topk")
        .run(s, d).select("q_id", "neighbor_id")
      // gates the SHARED deployed model (one PQ training per session per
      // corpus across q277/q278/q320/q321/q328 — annBuilds spec-pinned)
      val found = Similarity.annShared(s, d).adcTopk()
        .select("q_id", "neighbor_id")
      recallRow(truth, found, Seq("q_id", "neighbor_id"), floor = 0.55)
    } {
      s"""SELECT CAST(COUNT(*) AS BIGINT) AS n_truth, TRUE AS recall_ok
         |FROM (${defOf(Similarity.queries, "q27_cosine_topk").oracle.get})""".stripMargin
    },

    // ------------------------------------------------------------------
    // q321: composed IVF→PQ-ADC→re-rank recall gate for q320, against
    // the same exact q27 cosine top-10 truth. The composition's recall
    // is bounded above by the IVF routing recall (q110's floor 0.4 at
    // nprobe=4 of 16 cells) times the PQ shortlist recall WITHIN the
    // routed candidates (near 1 at shortlist=100 over ~25% of a fixture
    // corpus) — the floor sits below the measured minimum with margin.
    // A geometry mismatch between the stages (router trained in the raw
    // domain, scorer in the unit-sphere domain) mis-routes magnitude
    // outliers and trips this before it ships.
    QueryDef.sql("q321_ivf_pq_recall_gate") { (s, d) =>
      val truth = defOf(Similarity.queries, "q27_cosine_topk")
        .run(s, d).select("q_id", "neighbor_id")
      // gates the SHARED deployed model — the very artifact q320 serves
      // (one training job for q320/q321/q328, pinned via annBuilds);
      // query() ≡ ivfPqRerank row-for-row is itself spec-pinned
      val found = Similarity.annShared(s, d).query()
        .select("q_id", "neighbor_id")
      recallRow(truth, found, Seq("q_id", "neighbor_id"), floor = 0.35)
    } {
      s"""SELECT CAST(COUNT(*) AS BIGINT) AS n_truth, TRUE AS recall_ok
         |FROM (${defOf(Similarity.queries, "q27_cosine_topk").oracle.get})""".stripMargin
    },

    // ------------------------------------------------------------------
    // q328: nprobe TUNING CURVE for the q320 stack — recall and
    // candidate-volume contract at nprobe ∈ {1,2,4,8}, all sweep levels
    // measured in ONE pass over the SHARED deployed model's code table
    // (candidates carry their probe rank; see AnnIndex.sweep — q320/
    // q321/q328 ride one training job, pinned via annBuilds). Each row
    // is the oracle-checkable contract: truth size, recall ≥ the
    // per-level measured floor (0.08/0.2/0.35/0.35 — below the
    // sf0.001/0.01/0.1 minima with margin; sf0.01 measures 0.34 at
    // nprobe=1 rising to 0.84 at nprobe=8), and cand_rank — the level's
    // rank ordered by (candidate volume, nprobe), which the oracle pins
    // to the nprobe order 1..4: equal IFF candidate volume is
    // non-decreasing in nprobe, so a routing regression that loses
    // candidates hash-mismatches on a NON-constant oracle column.
    // Measured recall VALUES at sf0.01 are pinned in LlmSpec.
    QueryDef.sql("q328_ann_nprobe_advisor") { (s, d) =>
      Similarity.annShared(s, d).sweep()
    } {
      s"""WITH t AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_truth
         |  FROM (${defOf(Similarity.queries, "q27_cosine_topk").oracle.get}))
         |SELECT CAST(p AS BIGINT) AS nprobe, n_truth,
         |  TRUE AS recall_ok,
         |  CAST(ROW_NUMBER() OVER (ORDER BY p) AS BIGINT) AS cand_rank
         |FROM t, (SELECT UNNEST([1, 2, 4, 8]) AS p) g
         |ORDER BY nprobe""".stripMargin
    },

    // ------------------------------------------------------------------
    // q111: embedding near-dup LSH gate for q50, against q49's exact
    // pair truth (oracle-computable): the LSH path must produce NO false
    // positives (same exact-cosine verification → subset) and keep
    // recall above the measured floor (recall-adaptive table count:
    // 0.86/0.93/0.94 at the fixture SFs, 0.93 at the derived sf1.0 —
    // flat in corpus size by construction, see Similarity.tablesFor).
    // q49's truth is the BOUNDED deterministic sample (full exact at
    // fixture SFs), so the found side restricts to pairs inside the
    // sampled universe with the same predicate — recall over the slice
    // is an unbiased estimate (bucket membership is content-independent)
    // and the gate's cost stays flat as the corpus grows.
    QueryDef.sql("q111_embedding_lsh_gate") { (s, d) =>
      val truth = defOf(Similarity.queries, "q49_embedding_near_dup")
        .run(s, d).select("vec_a", "vec_b")
      val n = Tables(s, d, "embeddings").select(col("vec_id")).count()
      val inSample =
        Similarity.sampleKeep(n, Similarity.ExactTruthSampleTarget, "vec_a") &&
          Similarity.sampleKeep(n, Similarity.ExactTruthSampleTarget, "vec_b")
      val found = Similarity.embeddingNearDupLsh(s, d)
        .filter(inSample).select("vec_a", "vec_b")
      recallRow(truth, found, Seq("vec_a", "vec_b"), floor = 0.85, withFpCheck = true)
    } {
      s"""SELECT CAST(COUNT(*) AS BIGINT) AS n_truth, TRUE AS recall_ok,
         |  TRUE AS no_false_positives
         |FROM (${defOf(Similarity.queries, "q49_embedding_near_dup").oracle.get})""".stripMargin
    },

    // ------------------------------------------------------------------
    // q113: cluster-integrity gate for q112 (the production dedup
    // pipeline). Anchor: exact duplicates — byte-identical texts have
    // shingle Jaccard 1 ≥ the 0.5 verify threshold and identical MinHash
    // signatures (same bands → guaranteed candidates), so every exact-dup
    // pair MUST be an edge and therefore land inside ONE q112 cluster.
    // The exact-dup pair count is the oracle anchor; `all_pairs_joined`
    // asserts no exact-dup pair was split across clusters or dropped —
    // a regression in any stage (shingling, banding, verification, CC)
    // breaks it. The weaker near-dup recall of the pair stage itself is
    // gated separately (q107).
    QueryDef.sql("q113_dedup_pipeline_gate") { (s, d) =>
      val docs = Tables(s, d, "documents").select(col("doc_id"), col("text"))
      val dupPairs = docs.groupBy(col("text"))
        .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
        .filter(size(col("ids")) > 1)
        .select(explode(expr(
          """flatten(transform(ids, (a, i) ->
            |  transform(slice(ids, i + 2, size(ids)), b ->
            |    struct(a AS doc_a, b AS doc_b))))""".stripMargin)).as("p"))
        .select(col("p.doc_a"), col("p.doc_b"))
      val labels = Dedup.scalableClusterLabels(s, d)
      val joined = dupPairs
        .join(labels.select(col("id").as("doc_a"), col("cluster_id").as("ca")), Seq("doc_a"))
        .join(labels.select(col("id").as("doc_b"), col("cluster_id").as("cb")), Seq("doc_b"))
        .filter(col("ca") === col("cb"))
      dupPairs.agg(count(lit(1)).as("n_exact_dup_pairs"))
        .crossJoin(joined.agg(count(lit(1)).as("n_joined")))
        .select(col("n_exact_dup_pairs"),
          (col("n_joined") === col("n_exact_dup_pairs")).as("all_pairs_joined"))
    } {
      """SELECT CAST(COALESCE(SUM((c * (c - 1)) // 2), 0) AS BIGINT) AS n_exact_dup_pairs,
        |  TRUE AS all_pairs_joined
        |FROM (SELECT COUNT(*) AS c FROM documents GROUP BY text HAVING COUNT(*) > 1)""".stripMargin
    }
  )
}
