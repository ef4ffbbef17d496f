package graft.llm

import graft.SparkTestSession
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-12 curation operators (q329–q332) on
  * CONSTRUCTED corpora with known answers — the oracle hash-match
  * (Verify) proves engine agreement; these prove the answers mean what
  * the operators claim (island merging, target-likelihood direction,
  * vote correctness, edge-group detection).
  */
class CurationOpsSpec extends AnyFunSuite with SparkTestSession {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Write a documents.parquet fixture; returns its table dir. */
  private def docsDir(rows: Seq[(Long, String, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("curation").toString
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, t, l, s) =>
        Row(id, t, l, s, t.length.toLong)
      }),
      docSchema)
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def toks(prefix: String, n: Int): Seq[String] =
    (1 to n).map(i => s"$prefix$i")

  test("q329: a shared 12-token block yields one merged 12-token span per doc") {
    val shared = toks("s", 12)
    val a = (toks("u", 5) ++ shared ++ toks("x", 5)).mkString(" ")   // 22 toks
    val b = (toks("v", 4) ++ shared ++ toks("y", 8)).mkString(" ")   // 24 toks
    val c = toks("w", 20).mkString(" ")                              // unique
    val d = docsDir(Seq(
      (1L, a, "en", "sA"), (2L, b, "en", "sA"), (3L, c, "en", "sA")))
    val out = graft.SparkEntry.queries("q329_span_removal_plan")(spark, d)
      .collect()
    assert(out.length === 1)
    val r = out(0)
    assert(r.getAs[Long]("n_docs") === 3L)
    assert(r.getAs[Long]("total_tokens") === 66L)
    // the 8 in-block 5-grams occur twice; each doc's covered positions
    // merge to EXACTLY the 12 shared tokens — boundary grams are unique
    assert(r.getAs[Long]("affected_docs") === 2L,
      s"only the two block-carrying docs are affected: $r")
    assert(r.getAs[Long]("dup_span_tokens") === 24L,
      s"one 12-token maximal span per carrier: $r")
    assert(r.getAs[Long]("max_span") === 12L, s"$r")
    assert(math.abs(r.getAs[Double]("removal_share") - 24.0 / 66.0) < 1e-12)
  }

  test("q329: a WITHIN-doc repeated block is duplicated too (Lee et al. semantics)") {
    val rep = toks("r", 8)
    val f = (toks("p", 3) ++ rep ++ toks("q", 3) ++ rep ++ toks("t", 3))
      .mkString(" ") // 25 toks, the 8-token block occurs twice in ONE doc
    val d = docsDir(Seq((1L, f, "en", "sB")))
    val r = graft.SparkEntry.queries("q329_span_removal_plan")(spark, d)
      .collect()(0)
    assert(r.getAs[Long]("affected_docs") === 1L)
    // both occurrences' covered positions are spans: 2 × 8 tokens
    assert(r.getAs[Long]("dup_span_tokens") === 16L, s"$r")
    assert(r.getAs[Long]("max_span") === 8L, s"$r")
  }

  test("q330: target-vocabulary docs score > 1, disjoint-vocabulary docs < 1") {
    // 'en' docs write with vocabulary a*, others with disjoint b* — the
    // likelihood ratio must separate the two sources directionally
    val enDoc = toks("a", 30).mkString(" ")
    val frDoc = toks("b", 30).mkString(" ")
    val d = docsDir(Seq(
      (1L, enDoc, "en", "sen"), (2L, enDoc, "en", "sen"),
      (3L, frDoc, "fr", "sfr"), (4L, frDoc, "fr", "sfr")))
    val out = graft.SparkEntry.queries("q330_dsir_importance")(spark, d)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(out("sen").getAs[Double]("mean_weight") > 1.0,
      s"target-vocab docs must be target-like: ${out("sen")}")
    assert(out("sfr").getAs[Double]("mean_weight") < 1.0,
      s"disjoint-vocab docs must score below the pool: ${out("sfr")}")
    assert(out("sen").getAs[Long]("n_target_like") === 2L)
    assert(out("sfr").getAs[Long]("n_target_like") === 0L)
  }

  test("q331: axis-separated label clusters vote to accuracy 1.0 per class") {
    val dir = java.nio.file.Files.createTempDirectory("knnloo").toString
    val dim = 8
    def vec(axis: Int): Seq[Float] =
      (0 until dim).map(i => if (i == axis) 1.0f else 0.01f)
    val rows = for {
      label <- 0 until 3
      j <- 0 until 12
    } yield Row((label * 12 + j).toLong, vec(label), label)
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = graft.SparkEntry.queries("q331_knn_loo_accuracy")(spark, dir)
      .collect()
    assert(out.length === 3)
    out.foreach { r =>
      assert(r.getAs[Long]("n_queries") === 12L,
        s"36 < probe target — every vector is a probe: $r")
      assert(r.getAs[Double]("accuracy") === 1.0,
        s"11 identical same-label neighbors must out-vote: $r")
    }
  }

  test("q331: fixture accuracy is structurally sound (bounded, complete probes)") {
    val d01 = "/root/testdata/sf0.001"
    val out = graft.SparkEntry.queries("q331_knn_loo_accuracy")(spark, d01)
      .collect()
    val total = out.map(_.getAs[Long]("n_queries")).sum
    assert(total > 0 && total <= 2 * Similarity.KnnEvalQueryTarget,
      s"probe count $total outside the sampleKeep contract")
    out.foreach { r =>
      val acc = r.getAs[Double]("accuracy")
      assert(acc >= 0.0 && acc <= 1.0)
      assert(r.getAs[Long]("n_correct") <= r.getAs[Long]("n_queries"))
    }
  }

  test("q333: an alternating doc computes the exact Gopher fractions and flags") {
    // "x y x y x y": top 2-gram "x y" ×3 (overlapping) = 9 chars of 11;
    // top 3-gram ties ("x y x" ×2 vs "y x y" ×2) → lexicographic pick;
    // top 4-gram "x y x y" ×2 = 14 chars. All three trip their flags.
    val d = docsDir(Seq((1L, "x y x y x y", "en", "s1")))
    val out = graft.SparkEntry.queries("q333_top_ngram_fraction")(spark, d)
      .collect().map(r => r.getAs[Int]("n") -> r).toMap
    assert(out.keySet === Set(2, 3, 4))
    assert(math.abs(out(2).getAs[Double]("avg_top_fraction") - 9.0 / 11) < 1e-6)
    assert(math.abs(out(3).getAs[Double]("avg_top_fraction") - 10.0 / 11) < 1e-6)
    assert(math.abs(out(4).getAs[Double]("avg_top_fraction") - 14.0 / 11) < 1e-6)
    out.values.foreach(r => assert(r.getAs[Long]("n_flagged") === 1L, s"$r"))
  }

  test("q333: a 2-token doc joins the n=2 stats and skips n=3/4") {
    // "buy now": its only bigram covers 100% of its characters — it must
    // trip the 20% flag, not be silently dropped by a blanket length cut
    val d = docsDir(Seq((1L, "buy now", "en", "s1")))
    val out = graft.SparkEntry.queries("q333_top_ngram_fraction")(spark, d)
      .collect().map(r => r.getAs[Int]("n") -> r).toMap
    assert(out.keySet === Set(2), s"got ${out.keySet}")
    assert(out(2).getAs[Long]("n_docs") === 1L)
    assert(math.abs(out(2).getAs[Double]("avg_top_fraction") - 1.0) < 1e-6)
    assert(out(2).getAs[Long]("n_flagged") === 1L)
  }

  test("q334: an exact-dup pair straddling splits is counted as leaking") {
    // find two doc ids the SHARED split recipe sends to different splits,
    // using the library's own bucket hash (the audit must agree with q53)
    import org.apache.spark.sql.functions.col
    val buckets = spark.range(0, 200)
      .select(col("id"), (graft.Ids.hash("id") % 100).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val trainId = buckets.collectFirst { case (id, b) if b < 80 => id }.get
    val testId = buckets.collectFirst { case (id, b) if b >= 90 => id }.get
    val train2 = buckets.collectFirst {
      case (id, b) if b < 80 && id != trainId => id }.get
    val dupText = toks("dup", 12).mkString(" ")
    val d = docsDir(Seq(
      (trainId, dupText, "en", "s1"),       // the leaked pair
      (testId, dupText, "en", "s1"),
      (train2, toks("u", 12).mkString(" "), "en", "s1")))
    val out = graft.SparkEntry.queries("q334_split_cluster_leakage")(spark, d)
      .collect().map(r => r.getAs[String]("split") -> r).toMap
    assert(out("train").getAs[Long]("docs_leaking") === 1L, s"${out("train")}")
    assert(out("test").getAs[Long]("docs_leaking") === 1L, s"${out("test")}")
    assert(out("train").getAs[Long]("docs_in_dup_clusters") === 1L)
    assert(out.get("val").forall(_.getAs[Long]("docs_leaking") === 0L))
  }

  test("q339: a k-anonymous but homogeneous class is flagged low-diversity") {
    // segment A: 6 customers, ALL in balance band 2 — k-anonymous at
    // k=6 yet l=1 (membership leaks the balance); segment B: bands
    // 1/2/3 → l=3, clean
    val dir = java.nio.file.Files.createTempDirectory("ldiv").toString
    val schema = StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("c_nationkey", LongType),
      StructField("c_mktsegment", StringType),
      StructField("c_acctbal", DoubleType)))
    val rows =
      (1L to 6L).map(i => Row(i, 1L, "A", 2500.0)) ++
        Seq(Row(7L, 1L, "B", 1500.0), Row(8L, 1L, "B", 2500.0),
          Row(9L, 1L, "B", 3500.0))
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val out = graft.SparkEntry.queries("q339_l_diversity")(spark, dir)
      .collect()
    assert(out.length === 1)
    val r = out(0)
    assert(r.getAs[Long]("n_classes") === 2L)
    assert(r.getAs[Long]("n_low_diversity") === 1L, s"$r")
    assert(r.getAs[Long]("n_rows_at_risk") === 6L, s"$r")
    assert(r.getAs[Long]("min_diversity") === 1L, s"$r")
  }

  test("q332: three docs sharing a verbatim 8-token header form one prefix group") {
    val header = toks("h", 8)
    val d = docsDir(Seq(
      (1L, (header ++ toks("a", 6)).mkString(" "), "en", "s1"),
      (2L, (header ++ toks("b", 7)).mkString(" "), "en", "s1"),
      (3L, (header ++ toks("c", 8)).mkString(" "), "en", "s1"),
      (4L, toks("z", 16).mkString(" "), "en", "s1")))
    val out = graft.SparkEntry.queries("q332_boilerplate_edge_audit")(spark, d)
      .collect().map(r => r.getAs[String]("edge") -> r).toMap
    val pre = out("prefix")
    assert(pre.getAs[Long]("n_docs") === 4L)
    assert(pre.getAs[Long]("n_shared_groups") === 1L, s"$pre")
    assert(pre.getAs[Long]("docs_in_shared") === 3L, s"$pre")
    assert(pre.getAs[Long]("max_group") === 3L, s"$pre")
    val suf = out("suffix")
    assert(suf.getAs[Long]("n_shared_groups") === 0L,
      s"all suffixes are distinct: $suf")
  }

  test("q340: constructed stutter runs measure exactly; alternation is run-free") {
    val d = docsDir(Seq(
      (1L, "a a a b c", "en", "s1"),       // one 3-run: stutter mass 3
      (2L, "x y x y x", "en", "s1"),       // alternating: NO run ≥ 2
      (3L, "m m n n n n o", "en", "s1")))  // runs of 2 and 4: mass 6
    val out = graft.SparkEntry.queries("q340_stutter_runs")(spark, d)
      .collect()
    assert(out.length === 1)
    val r = out(0)
    assert(r.getAs[Long]("n_docs") === 3L)
    assert(r.getAs[Long]("n_stutter_docs") === 2L, s"docs 1 and 3 only: $r")
    assert(r.getAs[Long]("max_run") === 4L, s"$r")
    assert(r.getAs[Long]("stutter_tokens") === 9L, s"3 + 2 + 4: $r")
    assert(r.getAs[Long]("total_tokens") === 17L, s"$r")
  }
}
