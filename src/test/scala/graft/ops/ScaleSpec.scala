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

  test("autoSaltedJoin salts only above the skew threshold, answer-preserved") {
    import spark.implicits._
    // uniform fan-out: every key appears 10× — max/p99 = 1 → PLAIN join,
    // no salt column anywhere in the plan
    val uniform = spark.range(0, 1000)
      .select(($"id" % 100).as("k"), $"id".as("tag")).toDF()
    val dim = spark.range(0, 100).select($"id".as("dk"), ($"id" * 7).as("dv")).toDF()
    assert(Scale.suggestedSalt(uniform, "k") === 1)
    val plainPlan = Scale.autoSaltedJoin(uniform, dim, "k", "dk", col("tag"))
      .queryExecution.executedPlan.toString
    assert(!plainPlan.contains("__salt"),
      s"a uniform profile must not pay the salted shape:\n$plainPlan")
    // skewed fan-out: key 0 holds 900 rows, the other 100 keys 1 row each
    // — p99 rank ⌈0.99·101⌉ = 100 picks an ordinary key (count 1), so the
    // suggested salt is the full hot/ordinary ratio
    val skewed = spark.range(0, 1000)
      .select(when($"id" < 900, 0L).otherwise($"id" - 899).as("k"),
        $"id".as("tag")).toDF()
    assert(Scale.suggestedSalt(skewed, "k") === 900)
    // the sub-100-key shape (review finding): with 50 distinct keys the
    // unclipped ⌈0.99·n⌉ rank IS the max itself and skew became
    // undetectable; the n−1 clip makes the reference the largest
    // ordinary key, so the classic low-cardinality hot key still salts
    val lowCard = spark.range(0, 1000)
      .select(when($"id" < 951, 0L).otherwise($"id" - 950).as("k"),
        $"id".as("tag")).toDF()
    assert(Scale.suggestedSalt(lowCard, "k") === 951)
    // no ordinary-key reference at n = 1: the ratio heuristic abstains
    val single = spark.range(0, 100).select(lit(7L).as("k"), $"id".as("tag")).toDF()
    assert(Scale.suggestedSalt(single, "k") === 1)
    val auto = Scale.autoSaltedJoin(skewed, dim, "k", "dk", col("tag"), saltCap = 8)
    assert(auto.queryExecution.executedPlan.toString.contains("__salt"),
      "the skewed profile must take the salted branch")
    // answer preservation: equals the plain join, row for row
    val expected = skewed.join(dim, $"k" === $"dk")
      .groupBy($"dk").agg(count(lit(1)).as("n"), sum($"tag").as("st"))
      .as[(Long, Long, Long)].collect().toSet
    val got = auto.groupBy($"dk").agg(count(lit(1)).as("n"), sum($"tag").as("st"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("saltedJoin's assignment is the deterministic golden split") {
    import spark.implicits._
    // the kinesumer golden-assignment spirit (kinesumer_test.go:231-316
    // pins the exact shard split): the salt of every row is a pure
    // function of the salt column — pmod(hash(tag), 4) — so speculative
    // retries and re-runs land every row in the SAME bucket. Pin the
    // exact assignment for a fixed fixture.
    val rows = spark.range(0, 8).select(lit(1L).as("k"), $"id".as("tag")).toDF()
    // LITERAL golden assignment: pmod(Murmur3_x86_32.hashLong(tag, 42), 4)
    // for tags 0..7, computed once and pinned — a silent change to the
    // salt recipe (hash seed, mixing, pmod) breaks this test, exactly
    // like the reference's pinned [2,1,2]/[3,2,3] shard splits
    val golden = Map(0L -> 1, 1L -> 1, 2L -> 0, 3L -> 3,
      4L -> 0, 5L -> 0, 6L -> 1, 7L -> 3)
    val assigned = rows
      .withColumn("s", pmod(hash($"tag"), lit(4)))
      .select($"tag", $"s").as[(Long, Int)].collect().toMap
    assert(assigned == golden, "the deterministic salt assignment moved")
    // and the operator itself delivers every row exactly once under it
    val dim = Seq((1L, "x")).toDF("dk", "dv")
    val joined = Scale.saltedJoin(rows, dim, "k", "dk", col("tag"), 4)
    assert(joined.select($"tag").as[Long].collect().sorted.toSeq == (0L to 7L),
      "every row survives the salted join exactly once")
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

  test("q49's exact validator refuses inputs beyond its cap") {
    // the quadratic all-pairs ground truth must enforce its validation
    // role in code, not in a comment: past the cap it throws instead of
    // detonating into n²/2 dot products
    val ex = intercept[IllegalArgumentException] {
      graft.llm.Similarity.embeddingNearDupExact(spark, d, maxVectors = 5)
    }
    assert(ex.getMessage.contains("validation operator"))
  }

  test("sampled near-dup validator is an exact subset of the full ground truth") {
    val sim = graft.llm.Similarity
    val full = sim.embeddingNearDupExact(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // force the sampling path (target < fixture's 500 vectors); the md5
    // bucket keep-set is deterministic, so this is a stable regression
    val sampled = sim.embeddingNearDupSampled(spark, d, targetVectors = 250)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(sampled.nonEmpty, "deterministic half-sample lost every pair")
    assert(sampled.forall(full.contains),
      "sampled validator produced a pair absent from the exact ground truth")
    assert(sampled.length < full.size,
      "sampling did not reduce the pair set — the guard path was not exercised")
  }

  test("bucketed tables join without a shuffle exchange") {
    val warehouse = Files.createTempDirectory("bucketed-wh").toString
    val db = "bucketdemo"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '$warehouse'")
    try {
      Scale.bucketedWrite(
        graft.Tables(spark, d, "lineitem").select("l_orderkey", "l_quantity"),
        s"$db.li_b", 4, "l_orderkey")
      Scale.bucketedWrite(
        graft.Tables(spark, d, "orders").select("o_orderkey", "o_totalprice"),
        s"$db.ord_b", 4, "o_orderkey")
      val joined = Scale.bucketedJoin(spark,
        s"$db.li_b", s"$db.ord_b", Seq("l_orderkey"), Seq("o_orderkey"))
      // co-located by bucket: plan must contain no shuffle exchange
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(joined.count() > 0)
    } finally {
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    }
  }

  test("globalRowNumber matches the global window, without its SinglePartition exchange") {
    import spark.implicits._
    val ord = graft.Tables(spark, d, "orders")
    // ground truth: the single-task global window (fine at fixture scale,
    // the straggler shape globalRowNumber exists to avoid at 100 TB)
    val expected = ord.withColumn("rk",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy($"o_totalprice".desc, $"o_orderkey")).cast("long"))
      .select($"o_orderkey", $"rk").as[(Long, Long)].collect().toMap
    val got = Scale.globalRowNumber(ord, "rk", $"o_totalprice".desc, $"o_orderkey")
    val gotMap = got.select($"o_orderkey", $"rk").as[(Long, Long)].collect().toMap
    assert(gotMap == expected)
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      s"two-pass ranking must not collapse to one task:\n$plan")
    // the documented storage contract: releasing through the returned
    // frame frees the checkpointed boundary snapshot
    val ckptIds = got.queryExecution.analyzed.collect {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd.id
    }
    assert(ckptIds.nonEmpty && ckptIds.forall(spark.sparkContext.getPersistentRDDs.contains))
    graft.Checkpoints.release(got)
    assert(ckptIds.forall(id => !spark.sparkContext.getPersistentRDDs.contains(id)),
      "Checkpoints.release(result) left the ranged checkpoint pinned")
  }

  test("globalOrderedCumsum matches the single-window prefix sum, in parallel") {
    import spark.implicits._
    // value = id % 7 gives heavy ties; (value desc, id) restores the
    // required total order
    val df = spark.range(0, 10000).select($"id", ($"id" % 7).as("v"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"v".desc, $"id")
      .rowsBetween(Long.MinValue, 0)
    val expected = df
      .withColumn("cum", sum($"v").over(w))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy($"v".desc, $"id")).cast("long"))
      .select($"id", $"cum", $"rk").as[(Long, Long, Long)].collect().toSet
    val got = Scale.globalOrderedCumsum(df.toDF(), "v", "cum", "rk",
      $"v".desc, $"id")
    val gotSet = got.select($"id", $"cum", $"rk")
      .as[(Long, Long, Long)].collect().toSet
    assert(gotSet == expected)
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      s"two-pass prefix sum must not collapse to one task:\n$plan")
    graft.Checkpoints.release(got)
  }

  test("groupedRank matches the keyed window, without per-group single tasks") {
    import spark.implicits._
    // 3 groups with very different sizes + heavy ties within each; the
    // (v, id) order is total, so exact row_number parity must hold
    val df = spark.range(0, 9000)
      .select($"id", ($"id" % 3).as("g"), ($"id" % 11).as("v"))
      .filter($"g" =!= 2L || $"id" < 300) // group 2 is small, 0/1 large
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"v", $"id")
    val expected = df
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy($"g")))
      .select($"id", $"rk", $"n").as[(Long, Long, Long)].collect().toSet
    val got = Scale.groupedRank(df.toDF(), Seq("g"), "rk", Some("n"), $"v", $"id")
    val gotSet = got.select($"id", $"rk", $"n")
      .as[(Long, Long, Long)].collect().toSet
    assert(gotSet == expected)
    // the data-sized rank window must partition by the two-pass __pid
    // key — a window keyed on the 3-value group alone is the 3-task
    // straggler shape this operator exists to retire
    val plan = got.queryExecution.executedPlan.toString
    val rankWindows = plan.linesIterator
      .filter(l => l.contains("row_number") && l.contains("windowspecdefinition"))
      .toList
    assert(rankWindows.nonEmpty && rankWindows.forall(_.contains("__pid")),
      s"groupedRank's rank window lost the __pid key:\n$rankWindows")
    assert(!plan.contains("SortMergeJoin"),
      s"the offsets join-back must broadcast:\n$plan")
    graft.Checkpoints.release(got)
  }

  test("groupedRank's value-at-rank is tie-invariant (order statistics contract)") {
    import spark.implicits._
    // NO tie-break: row_number assignment within a tied block is
    // arbitrary, but the VALUE at each (group, rank) must still equal
    // the keyed window's — both are the sorted multiset read off by rank
    val df = spark.range(0, 5000)
      .select($"id", ($"id" % 4).as("g"), ($"id" % 5).as("v"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"v")
    val expected = df
      .withColumn("rk", row_number().over(w).cast("long"))
      .select($"g", $"rk", $"v").as[(Long, Long, Long)].collect().toSet
    val got = Scale.groupedRank(df.toDF(), Seq("g"), "rk", None, $"v")
    val gotSet = got.select($"g", $"rk", $"v")
      .as[(Long, Long, Long)].collect().toSet
    assert(gotSet == expected)
    graft.Checkpoints.release(got)
  }

  test("parquet aggregate pushdown answers COUNT/MIN/MAX from footer statistics") {
    // at 100 TB a bare COUNT(*)/MIN/MAX over parquet should read row-group
    // metadata, not data pages — spark.sql.parquet.aggregatePushdown pushes
    // the aggregate into the scan (visible as PushedAggregation)
    val s = spark.newSession()
    s.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    // pushdown lives in the V2 parquet source; the default V1 list
    // routes parquet around it
    s.conf.set("spark.sql.sources.useV1SourceList", "")
    val agg = s.read.parquet(s"$d/orders.parquet")
      .agg(count(lit(1)).as("n"), min(col("o_totalprice")).as("lo"),
        max(col("o_totalprice")).as("hi"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregation") && plan.contains("COUNT(*)"),
      s"aggregate not pushed into the parquet scan:\n$plan")
    val r = agg.head
    val expected = graft.Tables(spark, d, "orders")
      .agg(count(lit(1)), min(col("o_totalprice")), max(col("o_totalprice"))).head
    assert(r.getLong(0) === expected.getLong(0))
    assert(r.getDouble(1) === expected.getDouble(1))
    assert(r.getDouble(2) === expected.getDouble(2))
  }

  test("layoutWrite partitions prune at plan time before any bytes are read") {
    val out = Files.createTempDirectory("layout").toString + "/orders"
    Scale.layoutWrite(
      graft.Tables(spark, d, "orders"),
      out, partitionCols = Seq("o_orderpriority"), sortCols = Seq("o_orderdate"))
    val pruned = spark.read.parquet(out)
      .filter(col("o_orderpriority") === "1-URGENT")
    // the partition predicate must appear as a PartitionFilter on the
    // scan (directory pruning), not as a post-scan data Filter
    val scanLine = pruned.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("Scan parquet")).get
    assert(scanLine.contains("PartitionFilters") &&
      scanLine.substring(scanLine.indexOf("PartitionFilters"))
        .takeWhile(_ != ']').contains("1-URGENT"),
      s"partition predicate did not reach PartitionFilters:\n$scanLine")
    val expected = graft.Tables(spark, d, "orders")
      .filter(col("o_orderpriority") === "1-URGENT").count()
    assert(pruned.count() === expected)
  }

  test("q70 self-join reuses the digest exchange when too big to broadcast") {
    // at corpus scale neither side broadcasts: the self-join must become
    // a co-partitioned SMJ whose second side REUSES the repartition
    // exchange (one documents scan + one md5 pass), not a second scan
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    val df = graft.SparkEntry.queries("q70_cross_source_leakage")(s, d)
    assert(df.collect().nonEmpty)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange"),
      s"digest exchange not reused — both join sides re-scan documents:\n$plan")
  }

  test("AQE skew-join splits a hot key's partition at runtime") {
    // The automatic counterpart to saltedJoin: when one join key carries
    // most of the rows, AQE's skew handling splits the oversized shuffle
    // partition into advisory-sized chunks at runtime (the replicated
    // other side is re-read per chunk). Thresholds are lowered here so
    // the fixture-scale skew trips the same code path a 100 TB hot key
    // would. Conf changes live in a child session; the shared one is
    // untouched.
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32k")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k")
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    import s.implicits._
    // 90% of the left side lands on key 1 — one shuffle partition holds
    // ~180k rows while its peers hold ~20
    val left = s.range(0, 200000)
      .select(when($"id" % 10 =!= 0, lit(1L)).otherwise($"id").as("k"),
        $"id".as("payload"))
    val right = s.range(0, 200000).select($"id".as("rk"), ($"id" * 2).as("rv"))
    val joined = left.join(right, $"k" === $"rk")
    // execute THIS Dataset's query (count() would plan a separate one and
    // leave joined's adaptive plan unfinalized)
    assert(joined.collect().length === 200000)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"),
      s"AQE did not mark the join as skew-handled:\n$plan")
  }

  test("skewProfile finds the hot key with exact share, without a global sort") {
    import spark.implicits._
    // key 0 carries 1000 rows; keys 1..10 carry 10 each → 1100 rows,
    // 11 keys, avg 100 rows/key
    val df = spark.range(0, 1000).select(lit(0L).as("k"))
      .union(spark.range(0, 100).select(($"id" % 10 + 1).as("k")))
    val prof = Scale.skewProfile(df.toDF(), "k", 3)
    val rows = prof.orderBy("rnk")
      .as[(Long, Long, Int, Double, Double, Long, Long)].collect()
    assert(rows.length === 3)
    val (hotKey, hotCnt, rnk1, share, skew, nKeys, total) = rows.head
    assert(hotKey === 0L && hotCnt === 1000L && rnk1 === 1)
    assert(nKeys === 11L && total === 1100L)
    assert(share === 1000.0 / 1100.0)
    assert(skew === 1000.0 * 11.0 / 1100.0) // 10× the average key
    // ties among the 10-row keys break by key value
    assert(rows(1)._1 === 1L && rows(2)._1 === 2L)
    // scale posture: the top-k must be a distributed partial top-k, not
    // a global sort or a single-task window over the full key relation
    val plan = prof.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected partial top-k (TakeOrderedAndProject):\n$plan")
  }

  test("exactQuantiles equals the single-buffer percentile, without it") {
    import spark.implicits._
    val d = "/root/testdata/sf0.001"
    val li = graft.Tables(spark, d, "lineitem")
    val fractions = Seq(0.25, 0.5, 0.75)
    val got = Scale.exactQuantiles(li, "l_quantity", fractions)
    val rows = got.as[(Double, Double)].collect().toMap
    val exact = li.selectExpr(
      fractions.map(p => s"percentile(l_quantity, $p)"): _*).head
    fractions.zipWithIndex.foreach { case (p, i) =>
      assert(rows(p) === exact.getDouble(i),
        s"p=$p: two-pass ${rows(p)} != buffered ${exact.getDouble(i)}")
    }
    // the point of the operator: every window partitions by the
    // two-pass key — never the SinglePartition global window that a
    // corpus-scale distribution cannot run
    val plan = got.queryExecution.executedPlan.toString
    val windows = plan.linesIterator
      .filter(_.contains("windowspecdefinition")).toList
    assert(windows.nonEmpty)
    windows.foreach(w => assert(w.contains("__pid"),
      s"a window does not partition by the two-pass key:\n$w"))
    graft.Checkpoints.release(got)
  }

  test("exactQuantiles handles even/odd counts and duplicate values") {
    import spark.implicits._
    // odd n with duplicates: [1,1,2,3,5] → median 2, q25 1, q75 3
    val odd = Seq(1.0, 1.0, 2.0, 3.0, 5.0).toDF("v")
    val oddQ = Scale.exactQuantiles(odd, "v", Seq(0.25, 0.5, 0.75))
      .as[(Double, Double)].collect().toMap
    assert(oddQ(0.5) === 2.0 && oddQ(0.25) === 1.0 && oddQ(0.75) === 3.0)
    // even n: [1,2,3,4] → median 2.5 (interpolated), q25 1.75
    val even = Seq(1.0, 2.0, 3.0, 4.0).toDF("v")
    val evenQ = Scale.exactQuantiles(even, "v", Seq(0.25, 0.5))
      .as[(Double, Double)].collect().toMap
    assert(evenQ(0.5) === 2.5 && evenQ(0.25) === 1.75)
  }

  test("exactQuantiles matches percentile's NULL semantics") {
    import spark.implicits._
    // nulls are excluded before ranking (percentile/QUANTILE_CONT agree)
    val withNulls = Seq[java.lang.Double](null, 10.0, 20.0, 30.0).toDF("v")
    val q = Scale.exactQuantiles(withNulls, "v", Seq(0.5))
      .as[(Double, Double)].collect().toMap
    assert(q(0.5) === 20.0, "null must not participate in the ranking")
    // empty / all-null input: one row per fraction, NULL quantile —
    // never zero rows
    val allNull = Seq[java.lang.Double](null, null).toDF("v")
    val rows = Scale.exactQuantiles(allNull, "v", Seq(0.25, 0.75)).collect()
    assert(rows.length === 2)
    assert(rows.forall(_.isNullAt(1)), "all-null input must yield NULL quantiles")
  }

  test("groupedQuantiles equals per-group percentile, without its single buffer") {
    import spark.implicits._
    val fractions = Seq(0.25, 0.5, 0.75)
    // integer-valued doubles (cents): the documented exactness contract —
    // percentile's two-sided weighting and the operator's R-7 fold agree
    // bit-for-bit exactly there (q57/q102's argument); off-grid inputs
    // differ in ULPs between ANY two interpolation orderings
    val ord = graft.Tables(spark, d, "orders")
      .select($"o_orderpriority".as("g"),
        expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").cast("double").as("v"))
    val expected = ord.groupBy($"g")
      .agg(expr("percentile(v, array(0.25, 0.5, 0.75))").as("qs"))
      .select($"g", posexplode($"qs"))
      .select($"g", element_at(lit(fractions.toArray), $"pos" + 1).as("p"),
        $"col".as("quantile"))
      .as[(String, Double, Double)].collect().toSet
    val got = Scale.groupedQuantiles(ord.toDF(), Seq("g"), "v", fractions)
    val gotSet = got.as[(String, Double, Double)].collect().toSet
    assert(gotSet == expected)
    // the data-sized rank window must ride the two-pass __pid key
    val plan = got.queryExecution.executedPlan.toString
    val rankWindows = plan.linesIterator
      .filter(l => l.contains("row_number") && l.contains("windowspecdefinition"))
      .toList
    assert(rankWindows.nonEmpty && rankWindows.forall(_.contains("__pid")),
      s"groupedQuantiles' rank must partition by the two-pass key:\n$rankWindows")
    assert(!plan.contains("Exchange SinglePartition") || plan.contains("noop"),
      s"no single-task stage:\n$plan")
    graft.Checkpoints.release(got)
  }

  test("groupedRank past maxCells falls back to the plain keyed window, answer-identical") {
    import spark.implicits._
    // 2000 distinct single-row-ish groups with parts=4 → thousands of
    // cells; maxCells=64 forces the many-small-groups fallback
    val df = spark.range(0, 4000)
      .select($"id", ($"id" % 2000).as("g"), ($"id" % 7).as("v")).toDF()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"v", $"id")
    val expected = df
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy($"g")))
      .select($"id", $"rk", $"n").as[(Long, Long, Long)].collect().toSet
    val got = Scale.groupedRank(df, Seq("g"), "rk", Some("n"), 64L, $"v", $"id")
    assert(got.select($"id", $"rk", $"n")
      .as[(Long, Long, Long)].collect().toSet == expected)
    // the fallback IS the plain keyed window: no two-pass machinery
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("__pid") && !plan.contains("ExistingRDD"),
      s"fallback must not build the two-pass plan:\n$plan")
    // schema parity with the two-pass branch (column names AND order)
    val twoPass = Scale.groupedRank(df, Seq("g"), "rk", Some("n"), $"v", $"id")
    assert(got.columns.toSeq == twoPass.columns.toSeq)
    graft.Checkpoints.release(twoPass)
  }

  test("grouped two-pass operators keep NULL group values (null-safe join-back)") {
    import spark.implicits._
    // a NULL group is a real group to the keyed window; the old
    // equi-join-back would silently drop its rows
    val df = spark.range(0, 600)
      .select($"id",
        when($"id" % 3 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("g"), ($"id" % 3).cast("string"))).as("g"),
        ($"id" % 13).as("v")).toDF()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"v", $"id")
    val expRank = df.withColumn("rk", row_number().over(w).cast("long"))
      .select($"id", $"rk").as[(Long, Long)].collect().toSet
    val gotRank = Scale.groupedRank(df, Seq("g"), "rk", None, $"v", $"id")
    assert(gotRank.select($"id", $"rk")
      .as[(Long, Long)].collect().toSet == expRank)
    graft.Checkpoints.release(gotRank)
    val wRun = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.currentRow)
    val expCum = df.withColumn("c", sum($"v").over(wRun))
      .select($"id", $"c").as[(Long, Long)].collect().toSet
    val gotCum = Scale.groupedOrderedCumsum(
      df, Seq("g"), "v", "c", None, $"v", $"id")
    assert(gotCum.select($"id", $"c")
      .as[(Long, Long)].collect().toSet == expCum)
    graft.Checkpoints.release(gotCum)
  }

  test("groupedOrderedCumsum matches the keyed running sum, in parallel") {
    import spark.implicits._
    // skewed groups (one group holds ~90% of rows) + a rank request:
    // both outputs must equal the keyed window's, and the running-sum
    // window must ride the two-pass __pid key
    val df = spark.range(0, 9000)
      .select($"id",
        when($"id" % 10 === 0, $"id" % 3 + 10).otherwise(lit(0L)).as("g"),
        ($"id" % 11).as("v")).toDF()
    val wRun = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"v", $"id")
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"v", $"id")
    val expected = df
      .withColumn("c", sum($"v").over(wRun))
      .withColumn("rk", row_number().over(wOrd).cast("long"))
      .select($"id", $"c", $"rk").as[(Long, Long, Long)].collect().toSet
    val got = Scale.groupedOrderedCumsum(
      df, Seq("g"), "v", "c", Some("rk"), $"v", $"id")
    assert(got.select($"id", $"c", $"rk")
      .as[(Long, Long, Long)].collect().toSet == expected)
    val plan = got.queryExecution.executedPlan.toString
    val dataWindows = plan.linesIterator
      .filter(l => l.contains("windowspecdefinition") &&
        (l.contains("row_number") || l.contains("sum")))
      .toList
    assert(dataWindows.nonEmpty && dataWindows.forall(_.contains("__pid")),
      s"the running-sum/rank windows lost the two-pass key:\n$dataWindows")
    assert(!plan.contains("SortMergeJoin"),
      s"the offsets join-back must broadcast:\n$plan")
    graft.Checkpoints.release(got)
  }

  test("groupedQuantiles deduplicates repeated fractions and scans its input once") {
    import spark.implicits._
    val df = spark.range(0, 500)
      .select(($"id" % 4).as("g"), ($"id" % 97).cast("double").as("v")).toDF()
    val got = Scale.groupedQuantiles(df, Seq("g"), "v", Seq(0.5, 0.25, 0.5))
    val rows = got.collect()
    // one row per (group, DISTINCT fraction)
    assert(rows.length == 4 * 2)
    // the rank, the group universe, and the null counts all come from
    // the one frozen snapshot: nothing re-reads the source
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Scan parquet") && !plan.contains("LocalTableScan [g"),
      s"groupedQuantiles must not re-scan its input for the group universe:\n$plan")
    graft.Checkpoints.release(got)
  }

  test("fanoutCensus keeps non-integral key identity instead of nulling it") {
    import spark.implicits._
    // the old cast("long") turned every string key into ONE null key —
    // max_fanout = table size, a plausible-looking but wrong census
    val df = spark.range(0, 12).select(
      concat(lit("k"), ($"id" % 3).cast("string")).as("s"),
      ($"id" % 4).as("i")).toDF()
    val census = Scale.fanoutCensus(df, Seq("s", "i"))
    val got = census
      .as[(String, Long, Long, Double, Long, Long, Long, Double, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(got("s") == ("s", 3L, 12L, 4.0, 4L, 4L, 4L, 1.0, 1L))
    assert(got("i") == ("i", 4L, 12L, 3.0, 3L, 3L, 3L, 1.0, 1L))
    graft.Checkpoints.release(census)
    val bad = intercept[IllegalArgumentException] {
      Scale.fanoutCensus(
        df.select(array($"i").as("arr"), $"i"), Seq("arr", "i"))
    }
    assert(bad.getMessage.contains("non-atomic"))
  }

  test("fanoutCensus profiles arbitrary key sets against hand-computed truth") {
    import spark.implicits._
    // 12 rows; four key columns spanning the census shapes: one constant
    // key (everything is fan-out), a balanced 3-key split, an all-unique
    // key, and a skewed 4-key split (one key holding 9 of 12 rows)
    val df = spark.range(0, 12).select(
      lit(1L).as("a"), ($"id" % 3).as("b"), $"id".as("c"),
      when($"id" < 9, 0L).otherwise($"id" - 8).as("dk")).toDF()
    val census = Scale.fanoutCensus(df, Seq("a", "b", "c", "dk"))
    val got = census
      .as[(String, Long, Long, Double, Long, Long, Long, Double, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(got("a") == ("a", 1L, 12L, 12.0, 12L, 12L, 12L, 1.0, 1L))
    assert(got("b") == ("b", 3L, 12L, 4.0, 4L, 4L, 4L, 1.0, 1L))
    assert(got("c") == ("c", 12L, 12L, 1.0, 1L, 1L, 1L, 1.0, 1L))
    // skewed: counts [1,1,1,9] — p50 at rank ⌊5/2⌋=2 is 1, p99 at rank
    // ⌈3.96⌉=4 is the max (the census reports the unclipped statistic),
    // skew = 9·4/12 = 3, suggested_salt = ⌈9/9⌉ = 1
    assert(got("dk") == ("dk", 4L, 12L, 3.0, 1L, 9L, 9L, 3.0, 1L))
    graft.Checkpoints.release(census)
  }

  test("ntileFromRank equals Spark's ntile for every (n, k) shape, including n < k") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // exhaustive over the boundary shapes: n from 1 (degenerate: one row
    // per tile) through n < k, n = k, n barely over k, to n ≫ k with and
    // without a remainder — the fixture-backed q198 never exercises
    // n < k, so this spec owns that branch
    for (k <- Seq(3, 10); n <- Seq(1, 2, 7, 9, 10, 11, 25, 100, 101)) {
      val df = spark.range(1, n + 1).select($"id".as("r"))
        .withColumn("n", lit(n.toLong))
        .withColumn("g", lit(1))
      val w = Window.partitionBy($"g").orderBy($"r")
      val got = df
        .withColumn("tile", Scale.ntileFromRank(k, $"r", $"n"))
        .withColumn("want", ntile(k).over(w).cast("long"))
        .select($"r", $"tile", $"want")
        .as[(Long, Long, Long)].collect()
      got.foreach { case (r, tile, want) =>
        assert(tile == want, s"n=$n k=$k rank $r: got tile $tile, ntile says $want")
      }
    }
  }

  test("ntileFromRank stays exact past 2^53, where FP division goes wrong") {
    import spark.implicits._
    // group sizes beyond double precision: a floor(a / b.toDouble) path
    // can land one tile off at these magnitudes; integer `div` cannot.
    // Expected tiles computed with BigInt — independent arithmetic.
    val k = 10
    val n = (1L << 55) + 7L // 36 quadrillion rows, rem = n % 10 ≠ 0
    val q = n / k
    val rem = n % k
    def want(r: Long): Long = {
      val (rb, qb, remb) = (BigInt(r), BigInt(q), BigInt(rem))
      if (rb <= (qb + 1) * remb) ((rb - 1) / (qb + 1) + 1).toLong
      else (remb + (rb - 1 - (qb + 1) * remb) / qb + 1).toLong
    }
    // probe ranks straddling every dangerous boundary: tile edges around
    // the rem cutoff, the exact cutoff, and the extremes
    val probes = Seq(1L, q, q + 1, (q + 1) * rem - 1, (q + 1) * rem,
      (q + 1) * rem + 1, (q + 1) * rem + q, (q + 1) * rem + q + 1, n)
    val df = probes.toDF("r").withColumn("n", lit(n))
    val got = df.withColumn("tile", Scale.ntileFromRank(k, $"r", $"n"))
      .select($"r", $"tile").as[(Long, Long)].collect().toMap
    probes.foreach { r =>
      assert(got(r) == want(r),
        s"rank $r of $n: got tile ${got(r)}, BigInt arithmetic says ${want(r)}")
    }
  }

  test("groupedQuantiles matches percentile's per-group NULL semantics") {
    import spark.implicits._
    // group "b" has ONLY null values; percentile reports NULL for it,
    // and so must the grouped operator — one row per fraction, null
    // quantile, the group never silently vanishing
    val df = Seq(("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(3.0)),
      ("b", None), ("b", None)).toDF("g", "v")
    val got = Scale.groupedQuantiles(df, Seq("g"), "v", Seq(0.5))
      .as[(String, Double, Option[Double])].collect().toSet
    assert(got == Set(("a", 0.5, Some(2.0)), ("b", 0.5, None)))
  }

  test("q147: z-order files bound BOTH dimension spans; linear bounds only one") {
    import spark.implicits._
    val rows = graft.SparkEntry.queries("q147_zorder_layout_audit")(spark, d)
      .select($"layout", $"span_partkey", $"span_suppkey")
      .as[(String, Long, Long)].collect()
    val (zo, lin) = rows.partition(_._1 == "zorder")
    assert(zo.nonEmpty && lin.nonEmpty)
    // 64 aligned z-ranges of a 16-bit interleave are 32x32 tiles: a
    // hard geometric bound, not a statistical one
    zo.foreach { case (_, sx, sy) =>
      assert(sx <= 32 && sy <= 32, s"z-order tile leaked: $sx x $sy")
    }
    // the single-column layout cannot bound the second dimension: at
    // least one populated linear file spans over half the suppkey domain
    assert(lin.exists(_._3 >= 128),
      s"linear layout unexpectedly bounded suppkey: ${lin.map(_._3).max}")
    // ...while it does bound its own sort column tightly
    assert(lin.forall(_._2 <= 4))
  }

  test("zorderLayout physically clusters partitions into bounded boxes") {
    val df = Scale.zorderLayout(
      graft.Tables(spark, d, "lineitem"), "l_partkey", "l_suppkey",
      bits = 8, files = 16)
    // plan: a range exchange on z, never a single partition
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning(z"),
      s"expected a range exchange on z:\n$plan")
    // the only SinglePartition allowed is the 1-row global min/max
    // scalar aggregate; the row-data path must be the range exchange
    assert(plan.linesIterator.count(_.contains("Exchange SinglePartition")) <= 1)
    // partitions hold contiguous z-ranges; 16 range partitions over a
    // 16-bit z cover ~4096 z-values = 64x64 boxes on ALIGNED splits.
    // Data-driven split points are unaligned: a range that crosses a
    // HIGH-bit z boundary (16384k) teleports across the domain, so a
    // FEW partitions are legitimately wide — the curve guarantees
    // locality for ranges that avoid high-bit crossings, and the
    // aligned-file audit (q147) carries the hard 32x32 bound. Honest
    // physical claim: at least 3/4 of partitions land in a <=128-wide
    // box in BOTH dimensions (a linear sort bounds only one, ever).
    val boxes = df.select("bx", "by").rdd.mapPartitions { it =>
      val b = it.map(r => (r.getLong(0), r.getLong(1))).toSeq
      if (b.isEmpty) Iterator.empty
      else Iterator((b.map(_._1).min, b.map(_._1).max,
        b.map(_._2).min, b.map(_._2).max))
    }.collect()
    assert(boxes.nonEmpty)
    val tight = boxes.count { case (x0, x1, y0, y1) =>
      x1 - x0 + 1 <= 128 && y1 - y0 + 1 <= 128
    }
    assert(tight * 4 >= boxes.length * 3,
      s"only $tight/${boxes.length} partitions in bounded boxes: " +
        boxes.map { case (x0, x1, y0, y1) => s"[$x0,$x1]x[$y0,$y1]" }
          .mkString(", "))
  }
}
