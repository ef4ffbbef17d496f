package graft.llm

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Properties the DuckDB oracle can't check (hash-family operators), run on
  * the sf0.001 fixtures.
  */
class LlmSpec extends AnyFunSuite with SparkTestSession {

  private val d = "/root/testdata/sf0.001"

  test("minhash-LSH verified pairs are a subset of exhaustive Jaccard>=0.5 pairs") {
    import spark.implicits._
    val lsh = Dedup.minhashDedup(spark, d)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    // exhaustive (no blocking, no LSH) ground truth on shingle sets
    val docs = graft.Tables(spark, d, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("tokens"))
      .filter(size(col("tokens")) >= 3)
      .withColumn("shingles",
        expr("array_distinct(transform(sequence(0, size(tokens)-3), i -> concat_ws(' ', slice(tokens, i+1, 3))))"))
      .select("doc_id", "shingles")
    val truth = docs.alias("a").join(docs.alias("b"),
        col("a.doc_id") < col("b.doc_id"))
      .withColumn("j",
        size(array_intersect(col("a.shingles"), col("b.shingles"))).cast("double") /
          size(array_union(col("a.shingles"), col("b.shingles"))).cast("double"))
      .filter(col("j") >= 0.5)
      .select(col("a.doc_id"), col("b.doc_id")).as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(truth), s"false positives: ${lsh.diff(truth).take(5)}")
    // LSH with 8 bands × 4 rows has high recall at J>=0.5 on this corpus
    if (truth.nonEmpty) {
      val recall = lsh.size.toDouble / truth.size
      assert(recall >= 0.8, s"recall $recall too low (${lsh.size}/${truth.size})")
    }
  }

  test("connectedComponents merges transitive chains and keeps components apart") {
    import spark.implicits._
    // component {1,2,3} via a chain (1-2, 2-3: NOT a direct 1-3 pair —
    // the transitivity near-dup similarity itself lacks), component
    // {10,11}, and 2-hop chain {20,21,22,23}
    val edges = Seq((2L, 1L), (2L, 3L), (10L, 11L),
      (20L, 21L), (21L, 22L), (22L, 23L)).toDF("a", "b")
    val expected = Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L)
    // small-graph branch (driver union-find — the default here)
    val uf = Dedup.connectedComponents(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(uf == expected)
    // distributed min-label loop, forced by a zero small-graph threshold
    // — must produce the identical labeling
    val dist = Dedup.connectedComponents(edges, "a", "b", smallGraphEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(dist == expected)
    // empty edge list → empty labeling on both paths, no crash
    assert(Dedup.connectedComponents(
      Seq.empty[(Long, Long)].toDF("a", "b"), "a", "b").count() == 0)
    assert(Dedup.connectedComponents(
      Seq.empty[(Long, Long)].toDF("a", "b"), "a", "b", smallGraphEdges = -1L).count() == 0)
  }

  test("production dedup pipeline (q112) is coherent and minhash-consistent") {
    import spark.implicits._
    // cluster labels must partition exactly the doc ids that appear in
    // the minhash-verified pair graph, with cluster_id = component min
    val pairs = Dedup.minhashDedup(spark, d)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect()
    val inGraph = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    val labels = Dedup.scalableClusterLabels(spark, d)
      .as[(Long, Long)].collect().toMap
    assert(labels.keySet == inGraph)
    pairs.foreach { case (a, b) =>
      assert(labels(a) == labels(b), s"pair ($a,$b) split across clusters")
    }
    labels.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.keys.min == cid, s"cluster $cid label is not its min id")
    }
    // the aggregated q112 view: one keep per cluster, keep is the longest
    // member (doc_id tie-break), dropped = members minus keep
    val q112 = graft.SparkEntry.queries("q112_dedup_pipeline_scalable")(spark, d)
    val rows = q112.collect()
    assert(rows.length == labels.values.toSet.size)
    val nChars = graft.Tables(spark, d, "documents")
      .select($"doc_id", $"n_chars").as[(Long, Long)].collect().toMap
    rows.foreach { r =>
      val cid = r.getAs[Long]("cluster_id")
      val keep = r.getAs[Long]("keep_id")
      val members = labels.collect { case (id, c) if c == cid => id }.toSeq
      val best = members.map(id => (-nChars(id), id)).min._2
      assert(keep == best, s"cluster $cid kept $keep, expected $best")
      val dropped = r.getAs[String]("dropped_ids")
        .split(",").filter(_.nonEmpty).map(_.toLong).toSet
      assert(dropped == members.toSet - keep)
    }
  }

  test("array-typed exact-dedup groups are internally consistent") {
    import spark.implicits._
    val groups = Dedup.exactDedupGroups(spark, d)
      .select($"canonical_id", $"n_copies", $"member_ids")
      .as[(Long, Long, Seq[Long])].collect()
    assert(groups.nonEmpty)
    groups.foreach { case (canon, n, members) =>
      assert(members.length.toLong == n && n > 1)
      assert(members == members.sorted)
      assert(members.head == canon) // canonical = min doc_id, list sorted
    }
    // groups are disjoint: a doc belongs to at most one duplicate group
    val all = groups.flatMap(_._3)
    assert(all.distinct.length == all.length)
  }

  test("IVF ANN probes a cluster subset with measurable recall vs brute force") {
    import spark.implicits._
    val ivf = Similarity.annIvf(spark, d)
      .select($"q_id", $"neighbor_id", $"cos_sim").as[(Long, Long, Double)].collect()
    assert(ivf.nonEmpty)
    ivf.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.length <= 10)
      val sims = rows.map(_._3)
      assert(sims.zip(sims.tail).forall { case (x, y) => x >= y })
    }
    val exact = graft.SparkEntry.queries("q27_cosine_topk")(spark, d)
      .select($"q_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val approx = ivf.map(r => (r._1, r._2)).toSet
    val recall = (approx & exact).size.toDouble / exact.size
    info(f"IVF recall@10 = $recall%.2f (probing 4/16 clusters)")
    assert(recall >= 0.3, s"recall $recall suspiciously low for nprobe=4 of k=16")
  }

  test("IVF at sf0.01: one index build amortizes over query batches, recall@10 holds") {
    import spark.implicits._
    val d01 = "/root/testdata/sf0.01"
    // the amortized deployment shape: train ONCE (the expensive index
    // build — several jobs over the corpus), then issue query batches
    // against the prebuilt driver-side model
    val model = Similarity.ivfBuild(spark, d01)
    val exact = graft.SparkEntry.queries("q27_cosine_topk")(spark, d01)
      .select($"q_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    def recallAt(nprobe: Int): Double = {
      val got = Similarity.ivfQuery(spark, d01, model, nprobe = nprobe)
        .select($"q_id", $"neighbor_id").as[(Long, Long)].collect().toSet
      (got & exact).size.toDouble / exact.size
    }
    val r4 = recallAt(4)
    val r6 = recallAt(6)
    info(f"sf0.01 IVF recall@10: nprobe=4 → $r4%.2f, nprobe=6 → $r6%.2f")
    // measured 0.54 / 0.74; thresholds leave headroom for fixture drift
    assert(r4 >= 0.45, s"recall@10 $r4 below floor at default nprobe=4")
    assert(r6 >= 0.6, s"recall@10 $r6 below floor at nprobe=6")
    assert(r6 >= r4, "probing more clusters must not lose neighbors")
    // the registered q75 is exactly this build+query composition
    val q75 = graft.SparkEntry.queries("q75_ann_ivf_topk")(spark, d01)
      .select($"q_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val composed = Similarity.ivfQuery(spark, d01, model)
      .select($"q_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    assert(q75 == composed, "q75 must equal ivfQuery over a fresh ivfBuild model")
  }

  test("composed IVF->PQ-ADC->rerank stack: measured recall across the nprobe sweep") {
    import spark.implicits._
    val d01 = "/root/testdata/sf0.01"
    val exact = graft.SparkEntry.queries("q27_cosine_topk")(spark, d01)
      .select($"q_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    def recallAt(nprobe: Int): Double = {
      val got = Similarity.ivfPqRerank(spark, d01, nprobe = nprobe)
        .select($"q_id", $"neighbor_id").as[(Long, Long)].collect().toSet
      (got & exact).size.toDouble / exact.size
    }
    val r1 = recallAt(1)
    val r8 = recallAt(8)
    info(f"sf0.01 composed recall@10: nprobe=1 -> $r1%.2f, nprobe=8 -> $r8%.2f")
    // q328's registered floors are 0.08/0.2/0.35/0.35; these pins hold
    // the measured VALUES (the advisor row only carries the flags)
    assert(r1 >= 0.08, s"composed recall@10 $r1 below floor at nprobe=1")
    assert(r8 >= 0.35, s"composed recall@10 $r8 below floor at nprobe=8")
    // the sweep's contract row agrees with the per-level floors
    val sweep = Similarity.annShared(spark, d01).sweep()
      .as[(Long, Long, Boolean, Long)].collect().toSeq.sortBy(_._1)
    assert(sweep.map(_._1) == Seq(1L, 2L, 4L, 8L))
    assert(sweep.forall(_._3), s"a sweep level broke its recall floor: $sweep")
    // cand_rank = rank by (candidate volume, nprobe); equal to the
    // nprobe order iff candidate volume is non-decreasing in nprobe
    assert(sweep.map(_._4) == Seq(1L, 2L, 3L, 4L),
      s"candidate volume must be non-decreasing in nprobe: $sweep")
  }

  test("q154 magnitude guard: right-shifted power iteration tracks the exact path") {
    import spark.implicits._
    val d01 = "/root/testdata/sf0.01"
    val base = Similarity.powerIterationPca(spark, d01)
      .as[(Long, Double)].collect().toMap
    val shifted = Similarity.powerIterationPca(spark, d01, shiftBits = 8)
      .as[(Long, Double)].collect().toMap
    assert(base.keySet == shifted.keySet)
    assert(base.size == 64)
    val maxDiff = base.keys.map(c => math.abs(base(c) - shifted(c))).max
    info(f"max |loading delta| at shiftBits=8: $maxDiff%.2e")
    // the shift drops ≤2^8 per element per sweep — far below the sweep
    // magnitudes even at sf0.01, and the final normalization is
    // scale-free; at the N where a shift is NEEDED (|v| ≥ 1e30) the
    // relative perturbation is smaller still
    assert(maxDiff <= 1e-3, s"shifted loadings drifted: $maxDiff")
  }

  test("q277/q278/q320/q321/q328 deploy ONE shared trained model (a single annOpen build)") {
    // the registered compressed-search family must ride the amortized
    // build-once path the AnnIndex API advertises — retraining an
    // identical codebook per registry entry measured ~24 s/bench before
    // the share (the trio ~19 s + the q277/q278 pair ~5 s)
    val d01 = "/root/testdata/sf0.01"
    Similarity.annSharedEvict(spark, d01)
    val before = Similarity.annBuilds
    assert(graft.SparkEntry.queries("q320_ann_ivf_pq_rerank")(spark, d01).count() > 0)
    assert(graft.SparkEntry.queries("q321_ivf_pq_recall_gate")(spark, d01).count() > 0)
    assert(graft.SparkEntry.queries("q328_ann_nprobe_advisor")(spark, d01).count() == 4)
    assert(graft.SparkEntry.queries("q277_pq_adc_topk")(spark, d01).count() > 0)
    assert(graft.SparkEntry.queries("q278_pq_adc_recall_gate")(spark, d01).count() == 1)
    assert(Similarity.annBuilds - before == 1L,
      s"the ANN family trained ${Similarity.annBuilds - before} models; must be 1")
  }

  test("IvfIndex handle: zero source scans per query batch after the cache fills") {
    import spark.implicits._
    val d01 = "/root/testdata/sf0.01"
    val idx = Similarity.ivfOpen(spark, d01, k = 16)
    try {
      // first batch materializes the persisted assignment (one corpus scan)
      val batch1 = idx.query(nprobe = 4)
      val rows1 = batch1.select($"q_id", $"neighbor_id").as[(Long, Long)].collect().toSet
      assert(rows1.nonEmpty)
      // every subsequent batch plans entirely over the in-memory relation:
      // no source relation on either join side (the un-cached ivfQuery pays
      // two corpus scans). InMemoryRelation is a logical LEAF — its cached
      // build plan is not a child — so any LogicalRelation collected here
      // is a genuine per-batch scan.
      val batch2 = idx.query(nprobe = 6)
      val opt = batch2.queryExecution.optimizedPlan
      val cached = opt.collect {
        case m: org.apache.spark.sql.execution.columnar.InMemoryRelation => m }
      val sources = opt.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r }
      assert(cached.nonEmpty, s"query batch must read the persisted assignment:\n$opt")
      assert(sources.isEmpty, s"a post-build batch re-scanned the source corpus:\n$opt")
      // the handle answers identically to the per-batch path over the
      // same centroid model
      val direct = Similarity.ivfQuery(spark, d01, idx.centroids, nprobe = 4)
        .select($"q_id", $"neighbor_id").as[(Long, Long)].collect().toSet
      assert(rows1 == direct, "cached and un-cached IVF paths must agree")
    } finally idx.close()
  }

  test("AnnIndex handle: composed-stack batches are source-free and agree with ivfPqRerank") {
    import spark.implicits._
    val d01 = "/root/testdata/sf0.01"
    val idx = Similarity.annOpen(spark, d01)
    try {
      val batch = idx.query(nprobe = 4)
      // build already materialized every cache, so even the FIRST batch
      // must plan source-free (the IvfIndex test's stricter form)
      val opt = batch.queryExecution.optimizedPlan
      val cached = opt.collect {
        case m: org.apache.spark.sql.execution.columnar.InMemoryRelation => m }
      val sources = opt.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r }
      assert(cached.nonEmpty, s"batch must read the persisted code table:\n$opt")
      assert(sources.isEmpty, s"a post-build batch re-scanned the source corpus:\n$opt")
      // row-for-row agreement with the un-cached registered q320 path
      val got = batch.select($"q_id", $"rnk", $"neighbor_id")
        .as[(Long, Long, Long)].collect().toSet
      val direct = Similarity.ivfPqRerank(spark, d01, nprobe = 4)
        .select($"q_id", $"rnk", $"neighbor_id")
        .as[(Long, Long, Long)].collect().toSet
      assert(got == direct, "handle and un-cached composed paths must agree")
      // a second batch at a different nprobe still answers sanely
      assert(idx.query(nprobe = 8).limit(1).count() == 1L)
      // the un-routed compressed scan over the same handle equals the
      // un-cached q277 path (one shared codebook serves both families)
      val adc = idx.adcTopk().select($"q_id", $"rnk", $"neighbor_id")
        .as[(Long, Long, Long)].collect().toSet
      val adcDirect = Similarity.pqAdcTopk(spark, d01)
        .select($"q_id", $"rnk", $"neighbor_id")
        .as[(Long, Long, Long)].collect().toSet
      assert(adc == adcDirect, "handle adcTopk and un-cached pqAdcTopk must agree")
    } finally idx.close()
  }

  test("embedding near-dup LSH: precision 1 vs exact truth, measurable recall") {
    import spark.implicits._
    val truth = Similarity.embeddingNearDupExact(spark, d)
      .select($"vec_a", $"vec_b").as[(Long, Long)].collect().toSet
    val lsh = Similarity.embeddingNearDupLsh(spark, d)
      .select($"vec_a", $"vec_b").as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty)
    // same exact cosine verify → every surviving candidate is a true pair
    assert(lsh.subsetOf(truth), s"false positives: ${lsh.diff(truth).take(5)}")
    val recall = lsh.size.toDouble / truth.size
    info(f"embedding near-dup recall = $recall%.2f (${lsh.size}/${truth.size})")
    assert(recall >= 0.4, s"recall $recall too low for 8 tables x 4 planes")
  }

  test("simhash pairs are symmetric-free and within hamming bound") {
    import spark.implicits._
    val pairs = Dedup.simhashDedup(spark, d)
      .select($"doc_a", $"doc_b", $"hamming").as[(Long, Long, Int)].collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall { case (a, b, h) => a < b && h >= 0 && h <= 3 })
    assert(pairs.map(p => (p._1, p._2)).distinct.length == pairs.length)
  }

  test("ANN results are valid cosines, ranked, with measurable recall vs brute force") {
    import spark.implicits._
    val ann = Similarity.annLsh(spark, d)
      .select($"q_id", $"neighbor_id", $"cos_sim").as[(Long, Long, Double)].collect()
    assert(ann.nonEmpty)
    assert(ann.forall { case (q, n, c) => q != n && c >= -1.0001 && c <= 1.0001 })
    // per query, at most 10 neighbors, ranked descending
    ann.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.length <= 10)
      val sims = rows.map(_._3)
      assert(sims.zip(sims.tail).forall { case (x, y) => x >= y })
    }
    // recall@10 against the exact q27 top-10
    val exact = graft.SparkEntry.queries("q27_cosine_topk")(spark, d)
      .select($"q_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val approx = ann.map(r => (r._1, r._2)).toSet
    val recall = (approx & exact).size.toDouble / exact.size
    info(f"ANN multi-probe recall@10 = $recall%.2f")
    assert(recall >= 0.3, s"recall $recall suspiciously low for multi-probe LSH")
  }

  test("containment join (q146) is exact: matches brute-force truth and dominates Jaccard") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q146_containment_join")(spark, d)
      .select($"doc_a", $"doc_b", $"containment")
      .as[(Long, Long, Double)].collect()
    assert(got.forall(r => r._3 >= 0.8 && r._3 <= 1.0 && r._1 != r._2))
    // brute-force directional truth over string shingles (no prefix
    // filter, no postings join) -- the prefix prune must lose nothing
    val docs = graft.Tables(spark, d, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("tokens"))
      .filter(size(col("tokens")) >= 3)
      .withColumn("sh",
        expr("array_distinct(transform(sequence(0, size(tokens)-3), i -> concat_ws(' ', slice(tokens, i+1, 3))))"))
      .select("doc_id", "sh")
    val truth = docs.alias("a").join(docs.alias("b"),
        col("a.doc_id") =!= col("b.doc_id"))
      .withColumn("c",
        size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
          size(col("a.sh")).cast("double"))
      .filter(col("c") >= 0.8)
      .select(col("a.doc_id"), col("b.doc_id")).as[(Long, Long)].collect().toSet
    assert(got.map(r => (r._1, r._2)).toSet == truth,
      s"prefix-filter answer differs from brute force: " +
        s"missing ${truth.diff(got.map(r => (r._1, r._2)).toSet).take(5)}, " +
        s"extra ${got.map(r => (r._1, r._2)).toSet.diff(truth).take(5)}")
    // C(A->B) >= J(A,B) always, so every q136 pair at J >= 0.8 must
    // appear in BOTH directions here
    val j8 = graft.SparkEntry.queries("q136_prefix_filter_simjoin")(spark, d)
      .filter(col("jaccard") >= 0.8)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect()
    val pairs = got.map(r => (r._1, r._2)).toSet
    j8.foreach { case (a, b) =>
      assert(pairs.contains((a, b)) && pairs.contains((b, a)),
        s"J>=0.8 pair ($a,$b) missing a containment direction")
    }
  }

  test("q154's integer power iteration aligns with a double-precision reference") {
    import spark.implicits._
    val loadings = graft.SparkEntry.queries("q154_power_iteration_pca")(spark, d)
      .as[(Int, Double)].collect().sortBy(_._1).map(_._2)
    assert(loadings.length == 64)
    assert(loadings.forall(l => l >= -1.0 && l <= 1.0))
    assert(loadings.count(l => math.abs(l) == 1.0) == 1,
      "exactly one component normalizes to +-1")
    // double-precision reference: the SAME 3 sweeps on the same
    // quantized vectors, driver-side (fixture is tiny at sf0.001) —
    // compares the exact-integer pipeline against its float twin, so
    // only quantization/rounding can separate them (convergence depth
    // is identical by construction; the spectrum at this SF is flat
    // enough that a deeper reference would legitimately diverge)
    val xs = graft.Tables(spark, d, "embeddings")
      .select($"embedding").as[Array[Float]].collect()
      .map(_.map(f => math.floor(f.toDouble * 256.0)))
    var v = Array.fill(64)(1.0)
    for (_ <- 1 to 3) {
      val nv = new Array[Double](64)
      xs.foreach { x =>
        var dd = 0.0
        var i = 0
        while (i < 64) { dd += x(i) * v(i); i += 1 }
        i = 0
        while (i < 64) { nv(i) += dd * x(i); i += 1 }
      }
      val m = nv.map(math.abs).max
      v = nv.map(_ / m)
    }
    val dot = loadings.zip(v).map { case (a, b) => a * b }.sum
    val cos = dot / (math.sqrt(loadings.map(x => x * x).sum) *
      math.sqrt(v.map(x => x * x).sum))
    assert(math.abs(cos) >= 0.9999,
      s"integer sweeps diverged from their double twin: cos=$cos")
  }
}
