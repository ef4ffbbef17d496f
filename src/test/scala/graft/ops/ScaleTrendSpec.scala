package graft.ops

import graft.{SparkTestSession, Tables}
import org.scalatest.funsuite.AnyFunSuite

/** Scale-trend tripwire: the heavy hash/graph operators must grow
  * SUB-QUADRATICALLY in their input size across the fixture scale
  * factors. A blocked/bucketed plan grows ~linearly in rows; an
  * accidental all-pairs regression (the q49-class bug) grows with the
  * SQUARE of the row count and blows through the generous allowance
  * asserted here. This is a tripwire, not a benchmark — constants are
  * deliberately loose so host noise can't trip it, and only the
  * sf0.01 → sf0.1 transition is asserted (the two smaller fixtures are
  * the same size, so there is no trend to read between them).
  */
class ScaleTrendSpec extends AnyFunSuite with SparkTestSession {

  private val small = "/root/testdata/sf0.01"
  private val large = "/root/testdata/sf0.1"

  /** Full plan execution (noop sink), like Bench — count() would let
    * Catalyst prune final sorts/projections.
    */
  private def run(name: String, d: String): Unit =
    graft.SparkEntry.queries(name)(spark, d)
      .write.format("noop").mode("overwrite").save()

  /** min-of-2 timing after the caller's warmup. */
  private def time(name: String, d: String): Double =
    (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      run(name, d)
      (System.nanoTime() - t0) / 1e9
    }.min

  /** Asserts t(large) against the sub-quadratic allowance:
    * `slack × rowRatio × t(small)`, with an absolute floor absorbing
    * fixed job overhead. A quadratic plan costs rowRatio² × t(small) —
    * rowRatio is 10 for documents, so quadratic ≈ 100× vs the ≤ 40×
    * allowed.
    */
  private def assertTrend(query: String, table: String): Unit = {
    val rowsSmall = Tables(spark, small, table).count().toDouble
    val rowsLarge = Tables(spark, large, table).count().toDouble
    val ratio = rowsLarge / rowsSmall
    assert(ratio >= 4.0, s"fixture premise: $table must grow between SFs, got $ratio")
    run(query, small) // warmup: codegen + JIT hot before any timing
    val tSmall = time(query, small)
    val tLarge = time(query, large)
    val allowed = math.max(5.0, 4.0 * ratio * tSmall)
    info(f"$query: $tSmall%.2fs @ ${rowsSmall.toLong} rows → " +
      f"$tLarge%.2fs @ ${rowsLarge.toLong} rows (allowed ${allowed}%.1fs)")
    assert(tLarge <= allowed,
      f"$query grew ${tLarge / tSmall}%.1f× on a $ratio%.0f× input — " +
        "super-linear beyond the sub-quadratic allowance; look for an " +
        "unblocked pair fan-out or a lost pushdown")
  }

  test("q24 jaccard near-dup pairs scales sub-quadratically in documents") {
    assertTrend("q24_jaccard_near_dup_pairs", "documents")
  }

  test("q50 embedding near-dup LSH scales sub-quadratically in embeddings") {
    assertTrend("q50_embedding_near_dup_lsh", "embeddings")
  }

  test("q66 dedup clusters scales sub-quadratically in documents") {
    assertTrend("q66_dedup_clusters", "documents")
  }

  test("q76 dup-ngram coverage scales sub-quadratically in documents") {
    // the round-6 shingle-df op: explode + join-back on the shingle key
    // — a lost distinct or an accidental shingle×shingle join would show
    // up here as super-linear growth
    assertTrend("q76_dup_ngram_coverage", "documents")
  }

  test("q86 heavy hitters scales sub-quadratically in documents") {
    // sketch pass + candidate-restricted recount: a broken candidate
    // bound (e.g. the semi-join degrading to the full universe twice)
    // shows up as super-linear growth
    assertTrend("q86_trigram_heavy_hitters", "documents")
  }

  test("q94 split n-gram novelty scales sub-quadratically in documents") {
    // distinct + anti join on the (lang, trigram) key; an accidental
    // trigram×trigram product would trip this immediately
    assertTrend("q94_split_ngram_novelty", "documents")
  }

  test("q62 decontamination scales sub-quadratically in documents") {
    // inverted shingle-index join with a frequent-shingle guard; losing
    // the guard (or the index) degrades to doc×doc shingle comparison
    assertTrend("q62_decontamination", "documents")
  }

  test("q88 exact-substring contamination scales sub-quadratically in documents") {
    // broadcast probe set + scan-side CONTAINS: per-row cost must stay
    // O(probes), so growth tracks the corpus scan, never a pair product
    assertTrend("q88_exact_substring_contamination", "documents")
  }

  test("q112 production dedup pipeline scales sub-quadratically in documents") {
    // the full scale path: banded candidates → verified pairs → CC →
    // keep/drop; any stage regressing to a pair product trips this
    assertTrend("q112_dedup_pipeline_scalable", "documents")
  }

  test("q49 sampled exact truth scales sub-quadratically in embeddings") {
    // the blocked GEMM kernel over the bounded sample: its cost is
    // pairs-in-sample + one corpus scan, so growth must track the scan
    assertTrend("q49_embedding_near_dup", "embeddings")
  }

  test("q114 bigram-LM surprisal scales sub-quadratically in documents") {
    // unigram/bigram model relations have unique keys, so the probe
    // joins are linear in corpus bigrams; a lost group-by (duplicate
    // model keys fanning out the probe) would grow as a pair product
    assertTrend("q114_bigram_lm_surprisal", "documents")
  }

  test("q117 n-gram diversity scales sub-quadratically in documents") {
    // two-level (source, gram) aggs: growth must track the trigram
    // explode; a degraded plan (global distinct, or the barrier lost
    // and split() re-evaluated per element_at) shows up here
    assertTrend("q117_source_ngram_diversity", "documents")
  }

  test("q123 BM25 retrieval scales sub-quadratically in documents") {
    // postings are the query-vocabulary slice of one corpus scan and
    // the final rank limits map-side; a lost vocabulary filter (full
    // token shuffle) or a lost WindowGroupLimit (full candidate sort
    // into 4 query partitions) shows up here
    assertTrend("q123_bm25_topk", "documents")
  }

  test("q124 contrastive mining scales sub-quadratically in embeddings") {
    // one candidate scan against a fixed broadcast anchor set: growth
    // must be linear in vectors; an anchor set accidentally scaling
    // with the corpus would grow as the pair product
    assertTrend("q124_contrastive_mining", "embeddings")
  }

  test("q125 KMV set sketch scales sub-quadratically in events") {
    // the only corpus-scale stage is the (segment, hash) distinct agg
    // and the exact-anchor hash join (bounded by segments² per hash);
    // everything downstream is O(k·segments²) broadcast
    assertTrend("q125_kmv_set_sketch", "events")
  }

  test("q126 repeated-span finder scales sub-quadratically in documents") {
    // pair fan-out is bounded by the df guard + true repeated structure;
    // a lost guard (hot shingle exploding the postings expansion) or a
    // degraded diagonal window grows super-linearly here
    assertTrend("q126_repeated_spans", "documents")
  }

  test("q127 semantic dedup scales sub-quadratically in embeddings") {
    // within-cluster pairs cost N²/k = N^1.5 at k = √N — comfortably
    // inside the sub-quadratic allowance; a broken seed predicate
    // (constant seed count as N grows) degrades toward all-pairs and
    // trips this
    assertTrend("q127_semantic_dedup", "embeddings")
  }

  test("q132 cross-source dup matrix scales sub-quadratically in documents") {
    // count arithmetic on per-(digest, source) rows: growth must track
    // the digest agg; a regression to doc-level pair expansion (the
    // O(g²) hub-digest hazard) grows with the square of group sizes
    assertTrend("q132_cross_source_dup_matrix", "documents")
  }

  test("q136 prefix-filter simjoin scales sub-quadratically in documents") {
    // candidate pairs come only from PREFIX shingles (each among its
    // doc's rarest): a broken prefix-length formula (full shingle join)
    // or a lost df order (hot shingles entering prefixes) re-creates the
    // quadratic hot-key fan-out this operator exists to avoid
    assertTrend("q136_prefix_filter_simjoin", "documents")
  }

  test("q146 containment join scales sub-quadratically in documents") {
    // one-sided prefix filter: probe prefixes meet full postings — a
    // lost df-ordering (prefix no longer the rarest shingles) or a lost
    // prefix cut degrades toward the doc×doc product this catches
    assertTrend("q146_containment_join", "documents")
  }

  test("q146 containment join survives a hub document quoted in 10% of the corpus") {
    // Deliberate worst-case skew for a containment join: one document's
    // FULL text is appended to every 10th document, so the hub's
    // shingles jump to df ≈ N/10 (hot keys). The one-sided prefix
    // filter must keep fan-out bounded anyway: quoting docs still probe
    // their own rarest (non-hub) shingles, and the hub itself probes a
    // single ~N/10 posting list — linear, never the N²/100 hot-key
    // product a full postings self-join would pay. Same sub-quadratic
    // allowance as assertTrend, on hub-skewed rewrites of both fixtures.
    import org.apache.spark.sql.functions._
    def makeSkewed(src: String, out: String): Unit = {
      val docs = Tables(spark, src, "documents")
      val hub = docs.orderBy("doc_id").limit(1)
        .select("text").collect().head.getString(0)
      docs.withColumn("text",
          when(col("doc_id") % 10 === 0 && col("doc_id") > 0,
            concat(col("text"), lit(" "), lit(hub))).otherwise(col("text")))
        .write.mode("overwrite").parquet(s"$out/documents.parquet")
    }
    val (skSmall, skLarge) = ("/tmp/graft_skew_small", "/tmp/graft_skew_large")
    makeSkewed(small, skSmall)
    makeSkewed(large, skLarge)
    val ratio = 10.0 // 500 → 5000 documents
    run("q146_containment_join", skSmall) // warmup
    val tSmall = time("q146_containment_join", skSmall)
    val tLarge = time("q146_containment_join", skLarge)
    val allowed = math.max(5.0, 4.0 * ratio * tSmall)
    info(f"hub-skewed q146: $tSmall%.2fs → $tLarge%.2fs (allowed $allowed%.1fs)")
    assert(tLarge <= allowed,
      f"hub skew broke the prefix-filter bound: ${tLarge / tSmall}%.1f× on a " +
        "10× corpus — bucket the verify join by doc_b so hub arrays ship " +
        "once per partition")
    // sanity: the hub inclusion is actually detected (containment ≥ 0.8
    // pairs from the hub into its quoting docs must exist)
    val hubPairs = graft.SparkEntry.queries("q146_containment_join")(spark, skSmall)
      .filter(col("doc_a") === 0 || col("doc_b") === 0).count()
    assert(hubPairs >= 40, s"hub quoted in ~50 docs but only $hubPairs pairs found")
  }

  test("q145 association rules scale sub-quadratically in lineitem") {
    // basket-local pair expansion bounded by order size; an accidental
    // part×part or basket×basket join trips this
    assertTrend("q145_association_rules", "lineitem")
  }

  test("q152 triangle clustering scales sub-quadratically in lineitem") {
    // degree-ordered compact-forward: wedge fan-out is bounded by
    // oriented out-degree; losing the orientation lets a hub node own
    // O(deg^2) wedges and shows up here
    assertTrend("q152_triangle_clustering", "lineitem")
  }

  test("q204 frequent triples scale sub-quadratically in lineitem") {
    // C(L,3) expansion is basket-local (L domain-bounded); a candidate
    // pair×pair join regression grows with the square of the pair
    // relation and trips this
    assertTrend("q204_frequent_triples", "lineitem")
  }

  test("q207 phrase search scales sub-quadratically in documents") {
    // the adjacency join is doc-collocated (pos+1 within one doc) and
    // the census relation is bigram-vocab-sized; a cross-doc postings
    // join would grow quadratically in corpus tokens
    assertTrend("q207_phrase_search", "documents")
  }

  test("q211 PQ codebook scales sub-quadratically in embeddings") {
    // both sweeps are map-side folds over a broadcast 4×8 codebook; a
    // shuffle join of blocks×centroids (or worse, blocks×blocks)
    // regresses the growth and trips this
    assertTrend("q211_pq_codebook", "embeddings")
  }

  test("q200 quantile normalization scales sub-quadratically in documents") {
    // the position table explodes from the DISTINCT-score relation and
    // joins once on int position; a per-doc×distinct-score range probe
    // would be quadratic
    assertTrend("q200_quantile_normalization", "documents")
  }

  test("q277 PQ-ADC search scales sub-quadratically in embeddings") {
    // codebook training, encoding and the ADC table-lookup shuffle are
    // all linear in vectors; a regression to a vector×vector join (or a
    // lost shortlist cut making the exact re-rank corpus-sized) trips
    // this
    assertTrend("q277_pq_adc_topk", "embeddings")
  }

  test("q349 join-skew profiler scales sub-quadratically in lineitem") {
    // the two-pass grouped rank is two balanced shuffles + a broadcast
    // join-back over the distinct-key relation; a regression back to a
    // per-key-name window (2 tasks sort everything) or a non-broadcast
    // offsets join shows up here as super-linear wall-clock growth
    assertTrend("q349_join_skew_profile", "lineitem")
  }

  test("q351 auto-salted join scales sub-quadratically in events") {
    // the fan-out profile is a shrinking keyed count + a two-pass rank
    // over DISTINCT keys; the join is one shuffle (salted or not). A
    // profile that loses the distinct shrink (ranking the raw fact) or
    // a salt explosion beyond the cap trips this
    assertTrend("q351_auto_salted_join", "events")
  }

  test("q162 recursive reachability scales sub-quadratically in lineitem") {
    // one keyed frontier join per BFS level; losing the depth predicate
    // or re-scanning the whole accumulated walk set per level (instead
    // of the previous frontier) regresses the growth and trips this
    assertTrend("q162_recursive_reachability", "lineitem")
  }

  test("q162 recursive reachability survives a dense clique on the seed") {
    // Deliberate worst-case fan-out for a walk-COUNTING BFS: 40 parts
    // (incl. the seed, part 0) are co-purchased pairwise ≥ MinSupport
    // times — a 40-clique on the seed. ≤3-hop walks inside a K-clique
    // multiply as ~K² per surviving node (~60k extra walk rows here):
    // data-dependent fan-out the depth bound alone doesn't cap. The
    // implementation must pay walk-row cost LINEARLY (each level joins
    // only the previous frontier against the edge list) — an allowance
    // of 12× the unskewed time catches any super-linear restructuring
    // (e.g. the recursion re-joining the full accumulated bfs relation,
    // which squares the clique's walk rows). Semantics stay exact: the
    // walk counts ARE the query's contract; this pins their COST.
    import org.apache.spark.sql.functions._
    val li = Tables(spark, small, "lineitem")
    val cliqueParts = (0L until 40L)
    // 2 synthetic orders, each containing all 40 clique parts → every
    // pair co-occurs twice (= MinSupport); order keys above the domain
    val extra = spark.createDataFrame(
      for (o <- Seq(9000001L, 9000002L); p <- cliqueParts) yield (o, p))
      .toDF("l_orderkey", "l_partkey")
    val skDir = "/tmp/graft_clique_li"
    // q162 runs over registerViews (all 10 tables) — symlink the
    // untouched ones from the source fixture dir
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(skDir))
    Tables.names.filterNot(_ == "lineitem").foreach { n =>
      val link = java.nio.file.Paths.get(s"$skDir/$n.parquet")
      java.nio.file.Files.deleteIfExists(link)
      java.nio.file.Files.createSymbolicLink(link,
        java.nio.file.Paths.get(s"$small/$n.parquet"))
    }
    // only the two columns the edge derivation reads; remaining lineitem
    // columns are never touched by q162 (column pruning is part of the
    // plan contract) — but keep the schema union-compatible by writing
    // the full row set for base and nulls for the synthetic clique rows
    val cols = li.columns
    val extraFull = extra.select(cols.map { c =>
      if (c == "l_orderkey" || c == "l_partkey") col(c)
      else lit(null).cast(li.schema(c).dataType).as(c)
    }: _*)
    li.unionByName(extraFull)
      .write.mode("overwrite").parquet(s"$skDir/lineitem.parquet")
    run("q162_recursive_reachability", small) // warmup
    val tPlain = time("q162_recursive_reachability", small)
    val tSkew = time("q162_recursive_reachability", skDir)
    val allowed = math.max(5.0, 12.0 * tPlain)
    info(f"clique-skewed q162: $tPlain%.2fs → $tSkew%.2fs (allowed $allowed%.1fs)")
    assert(tSkew <= allowed,
      f"seed clique broke the frontier bound: ${tSkew / tPlain}%.1f× — the " +
        "recursion is paying more than linear cost per walk row")
    // sanity: the clique is actually in the graph — every clique member
    // is reachable at dist 1 with multiplied walk counts
    val res = graft.SparkEntry.queries("q162_recursive_reachability")(spark, skDir)
      .filter(col("node") < 40 && col("node") > 0)
      .agg(max("dist").as("maxd"), min("n_walks").as("minw"))
      .collect().head
    assert(res.getInt(0) == 1 && res.getLong(1) > 100L,
      s"clique fixture inert: $res")
  }
}
