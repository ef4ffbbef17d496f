package graft.ops

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape audit for the round-6 query surface (q76–q83): the shapes
  * that make them 100 TB-safe are pinned here so a regression shows up
  * as a failing test, not a slow cluster.
  */
class NewQueryPlanSpec extends AnyFunSuite with SparkTestSession {

  private val d = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    graft.SparkEntry.queries(q)(spark, d).queryExecution.executedPlan.toString

  test("q76 scans documents once and never pair-joins shingles") {
    val p = plan("q76_dup_ngram_coverage")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans === 1,
      s"q76's shingle-df must be a shared window, not an agg+join-back " +
        s"that re-derives the corpus per consumer (got $scans scans):\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("Join"),
      s"q76 must never pair-join shingles:\n$p")
  }

  test("q80's label pair join broadcasts (labels², never vectors²)") {
    val p = plan("q80_label_centroid_sim")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"label-pair join should broadcast the tiny centroid relation:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"q80 must broadcast, not cartesian:\n$p")
  }

  test("q81 joins only over broadcast (no shuffle join for the rate table)") {
    val p = plan("q81_mixture_materialize")
    assert(!p.contains("SortMergeJoin"),
      s"the 5-row language rate relation must broadcast:\n$p")
  }

  test("q83's global rank avoids the single-task window") {
    // the single-ROW total aggregate legitimately plans an Exchange
    // SinglePartition; the hazard is a WINDOW with an empty partition
    // spec — assert every window partitions by the two-pass __pid key
    val df = graft.SparkEntry.queries("q83_export_shard_manifest")(spark, d)
    val p = df.queryExecution.executedPlan.toString
    val windows = p.linesIterator.filter(_.contains("windowspecdefinition")).toList
    assert(windows.nonEmpty)
    windows.foreach { w =>
      assert(w.contains("__pid"),
        s"a q83 window does not partition by the two-pass key:\n$w")
    }
    graft.Checkpoints.release(df)
  }

  test("q86's recount never shuffle-joins the trigram universe") {
    val p = plan("q86_trigram_heavy_hitters")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      s"candidate restriction must be a broadcast semi-join:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"no shuffle join anywhere in the heavy-hitter plan:\n$p")
  }

  test("q87's stats relation joins back by broadcast") {
    val p = plan("q87_zscore_outliers")
    assert(p.contains("BroadcastHashJoin"),
      s"the one-row-per-type stats relation must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no shuffle join:\n$p")
  }

  test("q88's probe containment is a broadcast loop join, not a cartesian") {
    val p = plan("q88_exact_substring_contamination")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"probes must broadcast against the corpus scan:\n$p")
    assert(!p.contains("CartesianProduct"), s"never a cartesian:\n$p")
  }

  test("q89 samples via TakeOrderedAndProject, never a global sort") {
    val p = plan("q89_deterministic_sample")
    assert(p.contains("TakeOrderedAndProject"),
      s"orderBy+limit must plan as a distributed top-n:\n$p")
    assert(!p.contains("Exchange rangepartitioning"),
      s"a range-partitioned global sort defeats the sample's shape:\n$p")
  }

  test("q90 shuffles once on the group key") {
    val p = plan("q90_event_sequence_assembly")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashEx === 1,
      s"expected exactly one hash exchange (the user_id groupBy), got $hashEx:\n$p")
  }

  test("q91/q92's single-row stats relations broadcast, never shuffle-join") {
    Seq("q91_mixture_drift", "q92_burst_windows").foreach { q =>
      val p = plan(q)
      assert(!p.contains("SortMergeJoin"),
        s"$q: the global-stats relation must broadcast:\n$p")
    }
  }

  test("q93's global rank windows partition by the two-pass key") {
    val df = graft.SparkEntry.queries("q93_curriculum_stages")(spark, d)
    val p = df.queryExecution.executedPlan.toString
    val windows = p.linesIterator.filter(_.contains("windowspecdefinition")).toList
    assert(windows.nonEmpty)
    windows.foreach(w => assert(w.contains("__pid"),
      s"a q93 window does not partition by the two-pass key:\n$w"))
    graft.Checkpoints.release(df)
  }

  test("q94 never pair-joins documents (anti join on the shingle key only)") {
    val p = plan("q94_split_ngram_novelty")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"q94 must join on the (lang, trigram) key, never a product:\n$p")
  }

  test("q21's as-of is one per-user window over a union — no join, no single-task stage") {
    // r6 watch item: q21 measured 0.62→1.05 s r5→r6 with no code change;
    // isolated re-bench (SPARK_GRAFT_ONLY=q21..., 5 reps, sf0.1) gives
    // 0.56 s — the slowdown was suite-level plan/JIT noise, not the plan.
    // Pin the scale-correct shape so a real regression fails here:
    val p = plan("q21_asof_latest_order")
    assert(!p.contains("Join") && !p.contains("CartesianProduct"),
      s"the as-of must stay a union+window, never an events×orders pair join:\n$p")
    val windows = p.linesIterator.filter(_.contains("windowspecdefinition")).toList
    assert(windows.nonEmpty)
    windows.foreach(w => assert(w.contains("u#"),
      s"the as-of window must partition by the user key, got:\n$w"))
    val windowOps = p.linesIterator.count(_.trim.stripPrefix("+- ").stripPrefix("*(").
      dropWhile(_.isDigit).stripPrefix(") ").startsWith("Window"))
    assert(windowOps == 1, s"expected exactly one Window sort, got $windowOps:\n$p")
    assert(!p.contains("SinglePartition"),
      s"no stage of the as-of may collapse to one task:\n$p")
  }

  test("q95's as-of window partitions by the high-cardinality user key") {
    val p = plan("q95_conversion_latency")
    val windows = p.linesIterator.filter(_.contains("windowspecdefinition")).toList
    assert(windows.nonEmpty)
    windows.foreach(w => assert(w.contains("user_id"),
      s"the latency window must partition by user_id:\n$w"))
  }

  test("q114 scores the corpus once; only the vocab scalar broadcast-loops") {
    val df = graft.SparkEntry.queries("q114_bigram_lm_surprisal")(spark, d)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"),
      s"the bigram/unigram model joins must stay keyed, never cartesian:\n$p")
    // the final plan reads the FROZEN per-doc relation — the LM-scoring
    // subtree (which holds the one legitimate BroadcastNestedLoopJoin,
    // the 1-row vocab scalar) must not be re-planned per consumer
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"the scoring subtree leaked past the checkpoint (re-scored per consumer):\n$p")
    graft.Checkpoints.release(df)
  }

  test("q116 classifies map-side: the only join is the 1-row centroid broadcast") {
    val p = plan("q116_centroid_classifier")
    assert(!p.contains("CartesianProduct"),
      s"the centroid set must broadcast, never cartesian:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"no shuffle join may touch the held-out vectors — the argmax is a " +
        s"per-row fold over the broadcast centroid array:\n$p")
    assert(!p.contains("hashpartitioning(vec_id"),
      s"q116 must never shuffle per vector (labels²-key confusion agg only):\n$p")
  }

  test("q117's trigram branch materializes tokens behind the doc_id barrier") {
    // round 16 tested removing this barrier (q41's precedent) and the
    // pin's premise held HERE: the two-branch shared docs projection
    // re-split per element_at reference (split(text) x8) — the barrier
    // is load-bearing for q117, unlike the single-consumer fan-outs
    // (q41/q76/q114/q333) where it was removed
    val p = plan("q117_source_ngram_diversity")
    assert(p.contains("hashpartitioning(doc_id"),
      s"the trigram transform must read frozen token arrays (q41/q86's " +
        s"anti-CollapseProject barrier):\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      s"the per-source join is tiny and must broadcast:\n$p")
  }

  test("q118's successor window partitions by the high-cardinality user key") {
    val p = plan("q118_event_transitions")
    val windows = p.linesIterator.filter(_.contains("windowspecdefinition")).toList
    assert(windows.nonEmpty)
    windows.foreach(w => assert(w.contains("user_id"),
      s"the lead() window must partition by user_id, never SinglePartition:\n$w"))
    assert(!p.contains("CartesianProduct"),
      s"the row-total join is tiny and must broadcast:\n$p")
  }

  test("q173's range frame partitions by user_id; q175's lateral decorrelates") {
    val p173 = plan("q173_trailing_window")
    val windows = p173.linesIterator.filter(_.contains("windowspecdefinition")).toList
    assert(windows.nonEmpty)
    windows.foreach(w => assert(w.contains("user_id"),
      s"the trailing range frame must key on user_id, never SinglePartition:\n$w"))
    val p175 = plan("q175_lateral_topk")
    assert(!p175.contains("CartesianProduct") && !p175.contains("BroadcastNestedLoopJoin"),
      s"the lateral LIMIT must decorrelate to a keyed join, not re-scan per row:\n$p175")
    assert(p175.contains("WindowGroupLimit"),
      s"the correlated top-3 should plan as a window group limit:\n$p175")
  }

  test("q162's recursion plans one keyed frontier join per step") {
    // the q119 posture for the recursive CTE: the loop body must be ONE
    // inner equi-join of the frontier (UnionLoopRef) against the edge
    // relation — never a nested-loop and never a second frontier
    // reference (which would re-scan the recursion's accumulated rows)
    val p = graft.ops.Graph.reachability(spark, d, depth = 4)
      .queryExecution.executedPlan.toString
    assert(p.contains("UnionLoop"), s"expected a recursive UnionLoop plan:\n$p")
    assert("UnionLoopRef".r.findAllIn(p).length == 1,
      s"the frontier must be referenced exactly once per step:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the frontier-edge join must stay a keyed equi-join:\n$p")
  }

  test("q119's correlated subquery decorrelates to one keyed aggregate join") {
    val p = plan("q119_small_qty_revenue")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the correlated AVG must rewrite to an equi-join on l_partkey, " +
        s"never a nested-loop re-scan per row:\n$p")
    assert(p.contains("partial_avg") || p.contains("avg("),
      s"expected the decorrelated per-part aggregate in the plan:\n$p")
  }

  test("q115's budget prefix never plans a single-task stage") {
    val df = graft.SparkEntry.queries("q115_token_budget_selection")(spark, d)
    val p = df.queryExecution.executedPlan.toString
    val windows = p.linesIterator.filter(_.contains("windowspecdefinition")).toList
    assert(windows.nonEmpty)
    windows.foreach { w =>
      assert(w.contains("__pid"),
        s"the budget running sum must partition by the two-pass key:\n$w")
    }
    graft.Checkpoints.release(df)
  }

  test("q121's top-(k+1) is a TakeOrdered heap merge, not a global sort") {
    val p = plan("q121_priority_sample")
    assert(p.contains("TakeOrderedAndProject"),
      s"the corpus-sized top-k must plan per-partition heaps:\n$p")
    // the only windows/sorts allowed are on the O(k) survivor relation,
    // which sits ABOVE the TakeOrderedAndProject — the corpus side must
    // never see an Exchange SinglePartition before the take
    val beforeTake = p.substring(p.indexOf("TakeOrderedAndProject"))
    assert(!beforeTake.contains("Exchange SinglePartition"),
      s"the corpus side of q121 must not gather to one task:\n$p")
  }

  test("q122 scans documents once; all joins on the bucket grid broadcast") {
    val df = graft.SparkEntry.queries("q122_length_drift_ks")(spark, d)
    val p = df.queryExecution.executedPlan.toString
    // the single corpus scan runs inside the eager checkpoint of the
    // (source, bucket) agg; the final plan must see ONLY the frozen
    // O(sources x buckets) relation — any parquet scan here means a
    // consumer re-derived the corpus
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans === 0,
      s"q122's grid/cum relations must derive from the one frozen " +
        s"(source, bucket) agg, not re-scan the corpus (got $scans scans):\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"the O(sources x buckets) grid joins must broadcast:\n$p")
    graft.Checkpoints.release(df)
  }

  test("q123 joins postings only over broadcast; top-k limits before the exchange") {
    val p = plan("q123_bm25_topk")
    assert(!p.contains("SortMergeJoin"),
      s"df/query-set/corpus-stats relations must broadcast:\n$p")
    // the low-cardinality q_id window is admissible ONLY because the
    // rank filter plans a partial WindowGroupLimit on the map side —
    // each task forwards ≤ k rows per query, so the per-query partition
    // sorts ≤ k·tasks rows, never the scored candidate relation
    assert("WindowGroupLimit .*Partial".r.findFirstIn(p).isDefined,
      s"q123's top-k must prune per-partition before the q_id exchange:\n$p")
  }

  test("q124's anchor scan broadcasts; per-anchor top-k limits before the exchange") {
    val p = plan("q124_contrastive_mining")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the anchor set must broadcast against the candidate scan:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"q124 must never shuffle-join or cross-join the corpus:\n$p")
    assert("WindowGroupLimit .*Partial".r.findFirstIn(p).isDefined,
      s"q124's per-anchor top-k must prune map-side:\n$p")
  }

  test("q126 never self-joins shingles; diagonal windows partition on pair keys") {
    val p = plan("q126_repeated_spans")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans <= 2,
      s"q126 is one shingle pass (+ guard agg) — a self-join shape re-scans:\n$p")
    windowsPartitionBy(p, "da", "db", "diag")
    assert(!p.contains("CartesianProduct"),
      s"pair expansion must be the postings transform, never a cartesian:\n$p")
  }

  private def windowsPartitionBy(p: String, keys: String*): Unit = {
    val windows = p.linesIterator.filter(_.contains("windowspecdefinition")).toList
    assert(windows.nonEmpty, s"expected a window in:\n$p")
    windows.foreach { w =>
      keys.foreach(k => assert(w.contains(k),
        s"window must partition by $k:\n$w"))
    }
  }

  test("q125's bottom-k sketches limit map-side; sketch-sized joins broadcast") {
    val p = plan("q125_kmv_set_sketch")
    assert("WindowGroupLimit .*Partial".r.findFirstIn(p).isDefined,
      s"per-segment bottom-k must prune per-partition before the exchange:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the O(k·segments²) sketch relations must broadcast onto pairs:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"q125 must never cartesian:\n$p")
  }

  test("q127's assignment is one frozen scan; the pair join keys on cluster_id") {
    val df = graft.SparkEntry.queries("q127_semantic_dedup")(spark, d)
    val p = df.queryExecution.executedPlan.toString
    // the seed fold is the only corpus consumer before the freeze: the
    // executed plan reads the checkpoint RDD, never parquet, and the
    // within-cluster pair join must key on cluster_id (AQE/skew handles
    // an oversized natural cluster), never cartesian
    assert(!p.contains("Scan parquet"),
      s"q127's consumers must read the frozen assignment, not re-scan:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"the within-cluster pair space must be keyed on cluster_id:\n$p")
    graft.Checkpoints.release(df)
  }

  test("q128's fusion joins rank lists only; per-side top-F limits map-side") {
    val p = plan("q128_hybrid_retrieval")
    assert("WindowGroupLimit .*Partial".r.findFirstIn(p).isDefined,
      s"both retrievers' top-F must prune per-partition before the exchange:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"q128 must never cartesian:\n$p")
  }

  test("q129's per-group cap limits map-side before the lang exchange") {
    val p = plan("q129_balanced_group_sample")
    assert("WindowGroupLimit .*Partial".r.findFirstIn(p).isDefined,
      s"rank ≤ m must prune per-partition — each task forwards ≤ m rows " +
        s"per language, the per-lang sort must never see the corpus:\n$p")
  }

  test("q132 never expands duplicate groups into pairs") {
    val p = plan("q132_cross_source_dup_matrix")
    // the digest join's per-key fan-out is bounded by |sources|; the
    // hazard shape is a doc-level self-join (O(g²) per hub digest) —
    // pinned by scan count: two scans (cross legs) aggregate BEFORE
    // joining, so no plan node ever sees doc×doc rows
    assert(!p.contains("CartesianProduct"),
      s"q132 must join on the digest key only:\n$p")
    // doc_id must never reach a join: the legs aggregate to
    // per-(digest, source) counts first, so no join input carries
    // doc-level rows (the O(g²) hub-digest hazard)
    val joinLines = p.linesIterator.filter(_.contains("Join")).toList
    assert(joinLines.nonEmpty && joinLines.forall(!_.contains("doc_id")),
      s"a join sees doc-level rows — group counts must aggregate first:\n$p")
  }

  test("q136 reads the frozen shingle relation, never re-tokenizes; no cartesian") {
    val df = graft.SparkEntry.queries("q136_prefix_filter_simjoin")(spark, d)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Scan parquet"),
      s"all four consumers (df agg, prefix rank, verify legs) must read " +
        s"the checkpoint, not re-tokenize the corpus:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"candidates must join on the prefix-shingle key:\n$p")
    graft.Checkpoints.release(df)
  }

  test("q133's windows run above the frozen O(|sources|) relation") {
    val df = graft.SparkEntry.queries("q133_token_budget_waterfill")(spark, d)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Scan parquet"),
      s"everything above the freeze is source-cardinality rows — a parquet " +
        s"scan means the corpus leaked past the checkpoint:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the total/cap scalars must broadcast:\n$p")
    graft.Checkpoints.release(df)
  }

  test("q146's verify kernel is pushed into the plan; no cartesian anywhere") {
    val p = plan("q146_containment_join")
    assert(p.contains("sorted_intersect_count_min"),
      s"containment verify must ride the early-exit kernel:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"candidates must come from the postings equi-join only:\n$p")
  }

  test("q153's as-of window partitions by the high-cardinality user key") {
    val p = plan("q153_lasttouch_attribution")
    assert(p.contains("Window") && p.contains("user_id"),
      s"attribution needs the user-keyed ignore-nulls window:\n$p")
    assert(!p.contains("Join"),
      s"attribution must be a window over the unified stream, never a " +
        s"purchases x events join:\n$p")
  }

  test("q154's final stage reads the frozen sweep and broadcasts the scalar") {
    // the three sweeps execute eagerly behind Checkpoints (their joins
    // are not in the FINAL plan by design — the lineage is truncated);
    // what must hold here: the output reads the materialized sweep RDD,
    // the max|v| normalizer arrives as a 1-row broadcast, and nothing
    // plans a cartesian
    val p = plan("q154_power_iteration_pca")
    assert(p.contains("ExistingRDD") || p.contains("Scan ExistingRDD"),
      s"final stage must read the checkpointed sweep, not recompute it:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"the scalar normalizer must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q160's walk never plans a cartesian; per-seed top-k is a plain window") {
    val p = plan("q160_ppr_recommendations")
    assert(!p.contains("CartesianProduct"), s"sparse walk only:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"no stage may collapse to one task:\n$p")
  }

  test("q178/q180 windows key on their group columns, never SinglePartition") {
    for ((q, key) <- Seq("q178_max_drawdown" -> "user_id")) {
      val p = plan(q)
      val windows = p.linesIterator.filter(_.contains("windowspecdefinition")).toList
      assert(windows.nonEmpty, s"$q expected a window:\n$p")
      windows.foreach(w => assert(w.contains(key),
        s"$q's window must partition by $key:\n$w"))
      assert(!p.contains("Exchange SinglePartition"),
        s"$q must never collapse to one task:\n$p")
    }
    // q180 graduated to the two-pass grouped rank (5 priorities would
    // cap the keyed window at 5 tasks over the full orders table)
    assertTwoPassRank("q180_gini_concentration")
  }

  test("q198's NTILE rides the two-pass grouped rank") {
    assertTwoPassRank("q198_ntile_deciles")
  }

  test("q181 expands outer products map-side: one scan, zero joins") {
    val p = plan("q181_gram_matrix")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans === 1, s"Gram matrix is ONE pass over embeddings (got $scans):\n$p")
    assert(!p.contains("Join") && !p.contains("CartesianProduct"),
      s"the pair expansion must be the nested array transform, never a " +
        s"self-join shuffling 64N rows:\n$p")
    assert(p.contains("partial_count") || p.contains("HashAggregate"),
      s"the 2080-key agg must combine map-side:\n$p")
  }

  test("q185's top-20 is a distributed partial top-k; q188's dims broadcast") {
    val p185 = plan("q185_bpe_merge_candidates")
    assert(p185.contains("TakeOrderedAndProject"),
      s"the merge-candidate cut must be a merged-heaps top-k, not a " +
        s"global sort:\n$p185")
    val p188 = plan("q188_percent_of_parent")
    assert(!p188.contains("CartesianProduct"), s"broadcast dims only:\n$p188")
    val smjs = "SortMergeJoin".r.findAllIn(p188).length
    assert(smjs <= 1,
      s"nation/region must broadcast; only the customer join may shuffle:\n$p188")
  }

  test("q182's first dominance pass is bucketed; no pair join anywhere") {
    val p = plan("q182_skyline_pareto")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"dominance must come from range windows, never an O(n^2) join:\n$p")
    val bucketed = p.linesIterator
      .filter(_.contains("windowspecdefinition")).exists(_.contains("b#"))
    assert(bucketed,
      s"phase 1 must run the dominance windows inside hash buckets so the " +
        s"global pass only ever sees local-skyline survivors:\n$p")
  }

  test("q204's triple expansion stays basket-local: equi-joins only") {
    val p = plan("q204_frequent_triples")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"triples must expand in-buffer and join pairs on keys — any " +
        s"non-equi join is the O(n²) candidate generation this avoids:\n$p")
  }

  test("q207's phrase probe broadcasts; no cartesian anywhere") {
    val p = plan("q207_phrase_search")
    assert(p.contains("BroadcastHashJoin"),
      s"the 1-row phrase must broadcast into the postings slice:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"q207 must never cartesian the postings:\n$p")
  }

  test("q211's codebooks reach the corpus only as broadcasts") {
    val p = plan("q211_pq_codebook")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"the 4×8 centroid relation must broadcast-join the block relation; " +
        s"a shuffle join here re-partitions the corpus per sweep:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$p")
  }

  test("q212's point-in-time assignment is join-free: one union, one keyed window") {
    val p = plan("q212_point_in_time_join")
    assert(!p.contains("Join"),
      s"the as-of state must come from the union + last-ignoreNulls " +
        s"window, never a per-fact probe join:\n$p")
    assert(p.contains("Union"), s"expected the tagged union:\n$p")
  }

  test("q245 is one shared scan through Expand, join-free") {
    val p = plan("q245_sort_compression_advisor")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans === 1,
      s"all 13 pair-distinct metrics must ride ONE lineitem scan " +
        s"(got $scans):\n$p")
    assert(p.contains("Expand"),
      s"multi-distinct must plan as Expand projections, not " +
        s"per-metric re-scans:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"q245 has no join anywhere:\n$p")
  }

  test("q250's scalar stats and true counts reach the steps only as broadcasts") {
    val p = plan("q250_join_order_advisor")
    assert(!p.contains("CartesianProduct"),
      s"1-row stat relations must broadcast, never cartesian:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast crossJoins of the 1-row stats:\n$p")
  }

  test("q252's pair join lives in the broadcast top-k universe") {
    val p = plan("q252_term_lift_matrix")
    assert(p.contains("BroadcastHashJoin"),
      s"the top-12 df relation must broadcast into the token scan:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"q252 must never cartesian:\n$p")
  }

  test("q255's bucket recount is a broadcast range join; ranks ride the two-pass key") {
    val df = graft.SparkEntry.queries("q255_equidepth_histogram")(spark, d)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the 16-row range relation must broadcast into the cents scan:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"q255 must broadcast, never cartesian:\n$p")
    graft.Checkpoints.release(df)
  }

  test("q244's rank windows partition by the two-pass key, never SinglePartition") {
    val df = graft.SparkEntry.queries("q244_rank_sum_test")(spark, d)
    val p = df.queryExecution.executedPlan.toString
    val windows = p.linesIterator.filter(_.contains("windowspecdefinition")).toList
    assert(windows.nonEmpty)
    windows.foreach(w => assert(w.contains("__pid"),
      s"a q244 window does not partition by the two-pass key:\n$w"))
    graft.Checkpoints.release(df)
  }

  test("q247's residual ranks ride the two-pass key and the median broadcasts") {
    val df = graft.SparkEntry.queries("q247_conformal_calibration")(spark, d)
    val p = df.queryExecution.executedPlan.toString
    val windows = p.linesIterator.filter(_.contains("windowspecdefinition")).toList
    windows.foreach(w => assert(w.contains("__pid"),
      s"a q247 window does not partition by the two-pass key:\n$w"))
    assert(p.contains("BroadcastHashJoin"),
      s"the 3-row per-lang median relation must broadcast:\n$p")
    graft.Checkpoints.release(df)
  }

  test("q249's first-seen relation broadcasts back into the day census") {
    val p = plan("q249_schema_drift")
    assert(p.contains("BroadcastHashJoin"),
      s"the schema-bounded first-seen relation must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian in q249:\n$p")
  }

  test("q256 and q259 are join-free aggregates") {
    Seq("q256_column_correlation_stats", "q259_bucketing_advisor").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Join"),
        s"$q is unions of aggregates — any join is a regression:\n$p")
    }
  }

  test("q260's chain folds in ONE keyed shuffle, join-free") {
    val p = plan("q260_cooldown_dedup")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans === 1, s"one events scan (got $scans):\n$p")
    assert(!p.contains("Join"),
      s"the greedy chain is a per-group fold, never a self-join:\n$p")
    assert(!p.contains("windowspecdefinition"),
      s"no window anywhere — the fold happens inside aggregate():\n$p")
  }

  test("q261 compares day relations with one keyed join, no broadcast of the fact side") {
    val p = plan("q261_partition_sync_audit")
    assert(!p.contains("CartesianProduct"), s"no cartesian in q261:\n$p")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans <= 2,
      s"primary + replica legs are each one scan (got $scans):\n$p")
  }

  test("q262's three widths ride one vocabulary aggregate") {
    val p = plan("q262_feature_hash_audit")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans === 1,
      s"the vocabulary aggregates once; per-width re-plans re-scan the " +
        s"corpus (got $scans):\n$p")
    assert(!p.contains("Join"), s"q262 is aggregation only:\n$p")
  }

  test("q258 prunes each profiled scan to its single column") {
    val p = plan("q258_row_width_profile")
    // every ReadSchema lists exactly one struct field
    val reads = "ReadSchema: struct<[^>]*>".r.findAllIn(p).toList
    assert(reads.nonEmpty)
    reads.foreach { r =>
      assert(!r.contains(","),
        s"a q258 scan reads more than its one profiled column: $r")
    }
  }

  test("q277's ADC join broadcasts the distance table and never cartesians the corpus") {
    val p = plan("q277_pq_adc_topk")
    assert(!p.contains("CartesianProduct"),
      s"q277 must never pair corpus rows:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the queries×blocks×codes distance table must broadcast:\n$p")
  }

  test("q322's quantile walk rides priority-keyed windows only") {
    val p = plan("q322_order_cycle_time")
    val windows = p.linesIterator.filter(_.contains("windowspecdefinition")).toList
    assert(windows.nonEmpty)
    windows.foreach { w =>
      assert(w.contains("prio"),
        s"a q322 window is not priority-keyed:\n$w")
    }
    assert(!p.contains("CartesianProduct"), s"q322 planned a cartesian:\n$p")
  }

  test("q323 broadcasts the supplier dimension and top-10s without a global sort") {
    val p = plan("q323_supplier_return_exposure")
    assert(p.contains("BroadcastHashJoin"),
      s"the supplier dimension must broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-10 must be a distributed partial top-k, not a global sort:\n$p")
  }

  test("q325 broadcasts the part dimension and never cartesians") {
    val p = plan("q325_price_elasticity")
    assert(p.contains("BroadcastHashJoin"),
      s"the part dimension must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"q325 planned a cartesian:\n$p")
  }

  test("q327's dead-stock prune is one anti join with a broadcast high-water mark") {
    val p = plan("q327_dead_stock_census")
    assert(p.contains("LeftAnti"),
      s"recent parts must leave via one anti join:\n$p")
    // the hwm scalar rides a broadcast nested-loop (1-row relation);
    // the only allowed cartesian-ish node is that broadcast
    assert(!p.contains("CartesianProduct"), s"q327 planned a cartesian:\n$p")
  }

  test("q320's composed stack broadcasts every model relation and never cartesians the corpus") {
    val p = plan("q320_ann_ivf_pq_rerank")
    assert(!p.contains("CartesianProduct"),
      s"q320 must never pair corpus rows:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"probes / distance table / query vectors must broadcast:\n$p")
    // the IVF prune must reach the assignment as a broadcast of the
    // (queries × nprobe) probe list — a shuffled join here would pay a
    // corpus-wide exchange for a model-sized relation. Inspect each
    // SortMergeJoin node's OWN key line (the old whole-plan disjunct was
    // vacuous: "vec_id" appears somewhere in every q320 plan): the only
    // sort-merge joins allowed are the candidate-sized vec_id joins
    // (ADC code join, re-rank embedding fetch).
    val smjKeys = p.linesIterator.filter(_.contains("SortMergeJoin")).toList
    smjKeys.foreach { line =>
      assert(line.contains("vec_id"),
        s"a q320 sort-merge join is not a vec_id candidate join:\n$line\n$p")
    }
  }

  test("q176's bracket windows are both incremental (no following frame)") {
    // WindowExec re-scans a CURRENT→UNBOUNDED-FOLLOWING frame per row
    // (O(rows²) per partition — the q182 skyline lesson); the next-
    // observation bracket must ride the reversed-order running frame
    val p = plan("q176_gap_interpolation")
    assert(!p.toLowerCase.contains("unboundedfollowing"),
      s"q176 planned a following frame:\n$p")
  }

  test("q279's candidate generation never plans a cartesian product") {
    val p = plan("q279_link_prediction")
    assert(!p.contains("CartesianProduct"),
      s"wedges must expand in-buffer per center, never via a product:\n$p")
    assert(p.contains("LeftAnti"),
      s"existing edges must leave via one anti join:\n$p")
  }

  test("q288's concurrency windows are all keyed (user or two-pass pid)") {
    val df = graft.SparkEntry.queries("q288_peak_concurrency")(spark, d)
    val p = df.queryExecution.executedPlan.toString
    val windows = p.linesIterator.filter(_.contains("windowspecdefinition")).toList
    assert(windows.nonEmpty)
    windows.foreach { w =>
      assert(w.contains("user_id") || w.contains("__pid"),
        s"a q288 window is neither user-keyed nor two-pass-keyed:\n$w")
    }
    graft.Checkpoints.release(df)
  }

  test("q273's quintile machinery never plans an unkeyed window (no NTILE shortcut)") {
    val df = graft.SparkEntry.queries("q273_rfm_segmentation")(spark, d)
    val p = df.queryExecution.executedPlan.toString
    val windows = p.linesIterator.filter(_.contains("windowspecdefinition")).toList
    assert(windows.nonEmpty)
    windows.foreach { w =>
      assert(w.contains("__pid"),
        s"a q273 window does not partition by the two-pass key:\n$w")
    }
    graft.Checkpoints.release(df)
  }

  test("q285's per-source cut prunes map-side and the global cut is a partial top-k") {
    val p = plan("q285_constrained_topk")
    assert(p.contains("WindowGroupLimit"),
      s"the src_rank <= 3 filter must push into WindowGroupLimit:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"the global top-20 must be a distributed partial top-k:\n$p")
  }

  test("q290's weekly rank cuts push into WindowGroupLimit") {
    val p = plan("q290_rank_movers")
    assert(p.contains("WindowGroupLimit"),
      s"both rnk filters must prune each week map-side:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q329's gram multiplicity is a window, never a pair expansion") {
    val p = plan("q329_span_removal_plan")
    // q76's posture: the ≥2-occurrence test must ride a window over the
    // gram key (one scan of the shingle subtree), and unlike q126 this
    // operator NEVER expands postings into doc pairs — the only join is
    // the source-keyed totals ⋈ perdoc rollup (20-row side)
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans <= 2,
      s"q329 should scan documents at most twice (shingles + totals), got $scans:\n$p")
    assert(!p.contains("CartesianProduct"), s"q329 planned a cartesian:\n$p")
    // island windows must partition on doc_id (doc-length bounded), the
    // df window on the gram key — no unpartitioned window anywhere
    val unpart = p.linesIterator
      .filter(_.contains("windowspecdefinition()")).toList
    assert(unpart.isEmpty, s"q329 planned an unpartitioned window:\n$unpart")
  }

  test("q330's model probe joins are broadcast-only (512-row model)") {
    val p = plan("q330_dsir_importance")
    assert(!p.contains("SortMergeJoin"),
      s"the 512-bucket model must broadcast, never shuffle the token stream:\n$p")
    assert(!p.contains("CartesianProduct"), s"q330 planned a cartesian:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the bucket-model probe must be a broadcast hash join:\n$p")
  }

  test("q331's top-10 prunes map-side and the probe set broadcasts") {
    val p = plan("q331_knn_loo_accuracy")
    assert(p.contains("WindowGroupLimit"),
      s"the rank<=10 filter must prune per-partition before the shuffle:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"the fixed-size probe set must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"q331 planned a cartesian:\n$p")
  }

  test("q333's top-1 prunes map-side; all windows key on (doc, n)") {
    val p = plan("q333_top_ngram_fraction")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans === 1,
      s"all three gram streams must come from ONE flatten explode, got $scans:\n$p")
    assert(p.contains("WindowGroupLimit"),
      s"the top-1 rank filter must prune per-partition before the shuffle:\n$p")
    assert(!p.contains("CartesianProduct"), s"q333 planned a cartesian:\n$p")
    // round 17: the doc_id barrier is load-bearing — it satisfies both the
    // gram aggregation's and the window's clustered distributions, so the
    // plan must carry exactly TWO hash exchanges (the doc_id barrier and
    // the final per-lang rollup); removing the barrier adds one gram-row
    // exchange per operator (r16's measured regression)
    assert(p.contains("hashpartitioning(doc_id"),
      s"the pre-explode doc_id barrier must anchor the gram pipeline:\n$p")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashEx === 2,
      s"q333 must have exactly 2 hash exchanges (doc barrier + lang rollup), got $hashEx:\n$p")
  }

  test("q334 is one scan; cluster stats ride digest-keyed windows") {
    val p = plan("q334_split_cluster_leakage")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans === 1,
      s"the digest relation must derive from ONE scan, got $scans:\n$p")
    assert(!p.contains("Join"),
      s"cluster size/spread must be windows over the digest key, not a " +
        s"re-agg + join-back:\n$p")
    val unpart = p.linesIterator
      .filter(_.contains("windowspecdefinition()")).toList
    assert(unpart.isEmpty, s"q334 planned an unpartitioned window:\n$unpart")
  }

  test("q335's nation lookup broadcasts; BH windows ride the tests relation") {
    val p = plan("q335_bh_fdr_correction")
    assert(p.contains("BroadcastHashJoin"),
      s"the customer→nation lookup must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"q335 planned a shuffle join or cartesian:\n$p")
    // the two unpartitioned windows are deliberate and bounded: they run
    // over the per-nation TESTS relation (|nations| rows), after two
    // shrinking keyed aggs — assert they sit above an agg, not the scan
    assert(p.contains("windowspecdefinition"), s"BH needs its rank windows:\n$p")
  }

  test("q336 is one scan and join-free (single global moment row)") {
    val p = plan("q336_cuped_adjustment")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans === 1, s"q336 should scan events once, got $scans:\n$p")
    assert(!p.contains("Join"), s"q336 must not join:\n$p")
    assert(!p.contains("Window"), s"q336 must not window:\n$p")
  }

  test("q337's rollup rides the user-sized relation with a broadcast lookup") {
    val p = plan("q337_srm_check")
    assert(p.contains("BroadcastHashJoin"),
      s"the customer→nation lookup must broadcast:\n$p")
    assert(p.contains("Expand"), s"the ROLLUP global cell needs Expand:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"q337 planned a shuffle join or cartesian:\n$p")
  }

  test("q338 freezes the segment relation: one events scan feeds both consumers") {
    val p = plan("q338_diff_in_diff")
    val scans = "Scan parquet".r.findAllIn(p).length
    // the frozen seg checkpoint replaces the second events scan; the
    // remaining parquet scans are events + customer (the global row
    // reads the frozen RDD, not the source)
    assert(scans <= 2,
      s"q338 must not re-derive the segment relation per consumer, got $scans:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"q338 planned a shuffle join or cartesian:\n$p")
  }

  test("q332 is one scan, zero joins, zero windows") {
    val p = plan("q332_boilerplate_edge_audit")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans === 1,
      s"both edge digests must come from ONE projection of one scan, got $scans:\n$p")
    assert(!p.contains("Join"), s"q332 must not join:\n$p")
    // the node prints as "Window", never "WindowExec" — match what the
    // plan string actually contains
    assert(!p.contains("Window"), s"q332 must not window:\n$p")
  }

  // ---------------------------------------------------------------- r13

  test("q340 is one scan, join-free; every window keys on doc_id") {
    val p = plan("q340_stutter_runs")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans === 1, s"q340 should tokenize in ONE scan, got $scans:\n$p")
    assert(!p.contains("Join"), s"q340 must not join:\n$p")
    val unpart = p.linesIterator
      .filter(_.contains("windowspecdefinition()")).toList
    assert(unpart.isEmpty,
      s"q340's run windows must partition by doc_id (doc-length bounded):\n$unpart")
  }

  test("q341's nation lookup broadcasts; cumulative windows key on nation") {
    val p = plan("q341_sequential_stopping")
    assert(p.contains("BroadcastHashJoin"),
      s"the customer→nation lookup must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"q341 planned a shuffle join or cartesian:\n$p")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans <= 2,
      s"q341 is one events scan + the broadcast lookup, got $scans:\n$p")
    val unpart = p.linesIterator
      .filter(_.contains("windowspecdefinition()")).toList
    assert(unpart.isEmpty,
      s"q341's look series must cumulate per nation, never globally:\n$unpart")
  }

  /** Shared pin for the groupedRank-migrated order-statistic family
    * (q342/q344/q348/q349): the user/key-grain relation is frozen by
    * Scale.groupedRank, so the final plan reads the checkpoint (0
    * parquet scans), the offsets join-back broadcasts, and the ONLY
    * data-sized window — the rank — partitions by the two-pass __pid
    * key, never by the low-cardinality group alone (25 nations / 2 key
    * names would cap the sort at 25-/2-way parallelism).
    */
  private def assertTwoPassRank(q: String): Unit = {
    val df = graft.SparkEntry.queries(q)(spark, d)
    val p = df.queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans === 0,
      s"$q's post-freeze consumers must read the checkpoint, got $scans scans:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"$q's rank-offset join-back must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"$q planned a shuffle join or cartesian:\n$p")
    val rankWindows = p.linesIterator
      .filter(l => l.contains("row_number") && l.contains("windowspecdefinition"))
      .toList
    assert(rankWindows.nonEmpty && rankWindows.forall(_.contains("__pid")),
      s"$q's rank window must partition by the two-pass __pid key, " +
        s"not the low-cardinality group alone:\n$rankWindows")
    graft.Checkpoints.release(df)
  }

  test("q342's order statistics ride the two-pass grouped rank") {
    assertTwoPassRank("q342_quantile_treatment_effect")
  }

  test("q343 is one scan, join-free; χ² terms ride the cell relation") {
    val p = plan("q343_value_drift_chi2")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans === 1, s"q343 should scan events once, got $scans:\n$p")
    assert(!p.contains("Join"), s"q343 must not join:\n$p")
    val unpart = p.linesIterator
      .filter(_.contains("windowspecdefinition()")).toList
    assert(unpart.isEmpty,
      s"q343's totals window must partition by event_type:\n$unpart")
  }

  test("q344's winsorization rides the two-pass grouped rank, cap-window-free") {
    assertTwoPassRank("q344_winsorized_effect")
    // the rank-range identity folds the cap into the keyed agg — no
    // second (cap broadcast-back) window anywhere
    val df = graft.SparkEntry.queries("q344_winsorized_effect")(spark, d)
    val windows = df.queryExecution.executedPlan.toString.linesIterator
      .count(_.contains("windowspecdefinition"))
    assert(windows <= 3,
      s"q344 needs only groupedRank's rank + offset windows, got $windows")
    graft.Checkpoints.release(df)
  }

  test("q345 freezes the nation counts: the corpus is scanned once") {
    val df = graft.SparkEntry.queries("q345_jackknife_ci")(spark, d)
    val p = df.queryExecution.executedPlan.toString
    // the frozen |nations|-row relation feeds the totals row (twice) and
    // the leave-one-out series — no events re-scan per consumer
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans === 0,
      s"post-freeze consumers must read the checkpoint, got $scans scans:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"q345 planned a shuffle join or cartesian:\n$p")
    graft.Checkpoints.release(df)
  }

  test("q346's lookup broadcasts and the meta-set is a keyed agg") {
    val p = plan("q346_effect_heterogeneity")
    assert(p.contains("BroadcastHashJoin"),
      s"the customer→nation lookup must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"q346 planned a shuffle join or cartesian:\n$p")
    assert(!p.contains("Window"), s"q346 needs no windows:\n$p")
  }

  test("q347 is one scan; the lengths relation broadcasts; tokens never explode") {
    val p = plan("q347_truncation_loss")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans === 1, s"q347 should scan documents once, got $scans:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the 3-row lengths relation must broadcast:\n$p")
    assert(!p.contains("Window"), s"q347 needs no windows:\n$p")
  }

  test("q348's Gini rank rides the two-pass grouped rank") {
    assertTwoPassRank("q348_purchase_gini")
  }

  test("q349's fan-out census rides the two-pass grouped rank") {
    // the round-13 shape partitioned the corpus-sized key-count relation
    // by the 2-value key NAME — a 2-task sort on the very table the
    // profiler exists to diagnose; the migrated shape is pinned here
    assertTwoPassRank("q349_join_skew_profile")
  }

  test("q351's auto-salted join broadcasts its dimension, never a cartesian") {
    // whichever branch the profile picks (the fixture decides), the
    // customer side must broadcast — salting replicates it ×salt, still
    // dimension-sized — and nothing may degrade to a cartesian; the
    // decision-branch behavior itself is pinned in ScaleSpec
    val df = graft.SparkEntry.queries("q351_auto_salted_join")(spark, d)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"q351's dimension join must broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      s"q351 planned a shuffle join or cartesian:\n$p")
  }

  test("q350 freezes the cell relation: one events scan, no windows") {
    val df = graft.SparkEntry.queries("q350_fano_burstiness")(spark, d)
    val p = df.queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans === 0,
      s"post-freeze consumers must read the checkpoint, got $scans scans:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"q350's span row must broadcast:\n$p")
    assert(!p.contains("Window"), s"q350 needs no windows:\n$p")
    graft.Checkpoints.release(df)
  }

  test("q222's Spearman ranks BOTH measures in one two-pass grouped rank") {
    // the round-14 shape ran two source-keyed windows over the corpus —
    // |sources|-task sorts; the melted (measure, value) relation ranks
    // both at cluster width in one pass
    assertTwoPassRank("q222_spearman_quality_length")
  }

  test("q63's per-lang schedule rank rides the two-pass grouped rank") {
    assertTwoPassRank("q63_mixture_schedule")
    // the global top-200 must be a distributed partial top-k, fed by the
    // rank<=200 prune — never a global sort of the scheduled corpus
    val df = graft.SparkEntry.queries("q63_mixture_schedule")(spark, d)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      s"q63's top-200 must be a partial top-k:\n$p")
    graft.Checkpoints.release(df)
  }

  test("q210's draw rank rides the two-pass grouped rank; strata read the snapshot") {
    // rn <= alloc carries no static bound, so no WindowGroupLimit prune
    // applies — the keyed draw window was a |strata|-task corpus sort.
    // assertTwoPassRank is not used verbatim: the largest-remainder
    // apportionment legitimately runs ONE rank window over the
    // aggregated ≤|strata|-row relation (ordered by rem — bounded by
    // the stratum count, never data-sized); the DRAW rank over the
    // corpus must carry the two-pass __pid key
    val df = graft.SparkEntry.queries("q210_neyman_allocation")(spark, d)
    val p = df.queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans === 0,
      s"strata moments + draw must read the one frozen snapshot, got $scans scans:\n$p")
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin") &&
      !p.contains("CartesianProduct"),
      s"q210's join-backs must broadcast:\n$p")
    val rankWindows = p.linesIterator
      .filter(l => l.contains("row_number") && l.contains("windowspecdefinition"))
      .toList
    val (apportion, draw) = rankWindows.partition(_.contains("rem#"))
    assert(apportion.size <= 1, s"one apportionment window only:\n$apportion")
    assert(draw.nonEmpty && draw.forall(_.contains("__pid")),
      s"q210's draw rank lost the two-pass key:\n$draw")
    graft.Checkpoints.release(df)
  }

  test("q71's packing cumsum rides the two-pass grouped cumsum, tokens pruned pre-freeze") {
    val df = graft.SparkEntry.queries("q71_pipeline_funnel")(spark, d)
    val p = df.queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans === 0,
      s"post-freeze consumers must read the checkpoint, got $scans scans:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"q71's offsets join-back must broadcast:\n$p")
    // the running sum must ride the two-pass __pid key (the canon-key
    // window runs pre-freeze and is digest-keyed — not in this plan)
    val sumWindows = p.linesIterator
      .filter(l => l.contains("windowspecdefinition") && l.contains("sum"))
      .toList
    assert(sumWindows.nonEmpty && sumWindows.forall(_.contains("__pid")),
      s"q71's running sum lost the two-pass key:\n$sumWindows")
    graft.Checkpoints.release(df)
  }

  test("q352's quantile ranks ride the two-pass grouped rank, one frozen scan") {
    assertTwoPassRank("q352_source_length_quantiles")
  }

  test("q200's within-source rank rides the two-pass grouped rank, one frozen scan") {
    // not assertTwoPassRank verbatim: the position LOOKUP is a corpus×
    // positions equi-join on int position — both sides data-sized, so a
    // shuffle join (SMJ/shuffled-hash) is the DESIGNED shape there, and
    // only the rank must carry the two-pass key
    val df = graft.SparkEntry.queries("q200_quantile_normalization")(spark, d)
    val p = df.queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans === 0,
      s"totals + position table must read the one frozen snapshot, got $scans scans:\n$p")
    assert(!p.contains("CartesianProduct"), s"q200 planned a cartesian:\n$p")
    val rankWindows = p.linesIterator
      .filter(l => l.contains("row_number") && l.contains("windowspecdefinition"))
      .toList
    assert(rankWindows.nonEmpty && rankWindows.forall(_.contains("__pid")),
      s"q200's within-source rank lost the two-pass key:\n$rankWindows")
    graft.Checkpoints.release(df)
  }
}
