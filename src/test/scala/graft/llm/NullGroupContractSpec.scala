package graft.llm

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** NULL-group semantics of the q63/q200 groupedRank migrations, pinned
  * on a null-BEARING fixture.
  *
  * The driver fixtures are null-free (SURVEY §5), so the DuckDB oracle
  * gate cannot exercise the contracts the round-15 migration wrote in
  * comments: q63's oracle joins per-lang counts with `USING (lang)`
  * (NULL langs never match → excluded from the schedule), and q200's
  * oracle reads totals and the global position table off ALL docs while
  * its per-source equi-join drops NULL sources from the normalized
  * output. `Scale.groupedRank`'s null-safe join-back keeps NULL as a
  * real group, so each query filters explicitly — and only this spec
  * would catch a refactor silently dropping those filters.
  *
  * The expected values are computed here with the PRE-migration shapes
  * (keyed windows + plain equi-joins), whose NULL behavior is exactly
  * the oracles': an equi-join/USING join never matches NULL.
  */
class NullGroupContractSpec extends AnyFunSuite with graft.SparkTestSession {

  // documents fixture with NULL lang and NULL source rows, written once
  // per suite run (the queries read `$dir/documents.parquet`)
  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-nulldocs").toString
    import spark.implicits._
    val rows = (1L to 60L).map { i =>
      val lang = if (i % 5 == 0) null else s"l${i % 3}"
      val source = if (i % 4 == 0) null else s"s${i % 2}"
      (i, s"text $i", lang, source, 40L + (i * 7) % 23)
    }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("q63 excludes NULL-lang docs from the schedule (oracle USING-join parity)") {
    val got = graft.SparkEntry.queries("q63_mixture_schedule")(spark, dir)
    val gotRows = got.collect()
    try {
      assert(gotRows.forall(!_.isNullAt(0)),
        s"q63 emitted a NULL-lang schedule group:\n${gotRows.mkString("\n")}")
      // pre-migration shape: keyed rank window + count equi-join (the
      // join drops NULL langs exactly like the oracle's USING (lang))
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("lang"))
      val nl = docs.groupBy(col("lang")).agg(count(lit(1)).as("nl"))
      val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      val expected = docs
        .join(nl, Seq("lang")) // equi-join: NULL lang never matches
        .withColumn("rnk", row_number().over(w).cast("long"))
        .withColumn("vt",
          col("rnk").cast("double") / sqrt(col("nl").cast("double")))
        .filter(col("rnk") <= 200)
        .orderBy(col("vt"), col("lang"), col("doc_id"))
        .limit(200)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_slots"),
          (count(lit(1)).cast("double") / 200).as("share"),
          min(col("vt")).as("first_vt"), max(col("vt")).as("last_vt"))
        .orderBy("lang")
        .collect()
      assert(gotRows.toSeq == expected.toSeq)
    } finally graft.Checkpoints.release(got)
  }

  test("q200 keeps NULL-source docs in totals/positions, out of the per-source output") {
    val got = graft.SparkEntry.queries("q200_quantile_normalization")(spark, dir)
    val gotRows = got.collect()
    try {
      assert(gotRows.forall(!_.isNullAt(0)),
        s"q200 emitted a NULL-source row:\n${gotRows.mkString("\n")}")
      // pre-migration shape: keyed windows + per-source count equi-join.
      // Totals, the distinct-score occupancy, and the position table all
      // read ALL docs (NULL source included) — only the per-source join
      // excludes them, exactly the oracle's occ/tot-vs-per_src split. A
      // NULL-source doc that leaked into totals-only (or was dropped
      // from them) shifts every mapped position, so value equality here
      // pins BOTH halves of the contract.
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("source"),
          col("n_chars").cast("long").as("score"))
      val wSrc = Window.partitionBy(col("source"))
        .orderBy(col("score"), col("doc_id"))
      val ranked = docs.withColumn("r", row_number().over(wSrc).cast("long"))
      val perSrc = docs.groupBy(col("source")).agg(count(lit(1)).as("n_s"))
      val tot = docs.agg(count(lit(1)).as("n_total"))
      val wScore = Window.orderBy(col("score"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val positions = docs.groupBy(col("score"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("cum", sum(col("cnt")).over(wScore))
        .select(col("score").as("norm_score"),
          explode(expr("sequence(cum - cnt + 1, cum)")).as("pos"))
      val expected = ranked
        .join(perSrc, Seq("source")) // equi-join: NULL source never matches
        .crossJoin(tot)
        .withColumn("pos",
          expr("CAST((r * n_total + n_s - 1) DIV n_s AS BIGINT)"))
        .join(positions, "pos")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("norm_score")).as("min_norm"),
          max(col("norm_score")).as("max_norm"),
          (sum(col("norm_score")).cast("double") /
            count(lit(1)).cast("double")).as("mean_norm"),
          (sum(col("score")).cast("double") /
            count(lit(1)).cast("double")).as("mean_raw"))
        .orderBy("source")
        .collect()
      assert(gotRows.toSeq == expected.toSeq)
    } finally graft.Checkpoints.release(got)
  }
}
