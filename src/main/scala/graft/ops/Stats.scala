package graft.ops

import graft.{Det, QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reshaping and statistics operators: pivot/unpivot, exact percentiles,
  * and correlation/regression computed from exact decimal sums.
  *
  * Oracle-exactness notes: percentile interpolation on these fixtures is
  * exact in binary (integer-valued data, quarter fractions), and the
  * correlation/regression family is DERIVED from order-free exact sums
  * (Det.csum within its per-group int64 contract, Det.dsum decimals
  * elsewhere) with one identical IEEE double formula on both engines —
  * the built-in corr/stddev/regr_* aggregates would accumulate doubles
  * in engine-specific order and drift in the last bits.
  */
object Stats {

  /** q67's sketch accuracy: rank error ≤ n / accuracy. 10000 bounds the
    * error at 0.01% of each group's rows for a fixed (~KB-scale) sketch —
    * the same buffer whether the group holds 6e3 or 3e11 rows. (Defined
    * before `queries`: its SQL strings interpolate it at object init.)
    */
  final val ApproxPercentileAccuracy = 10000

  /** Columns q73 profiles — the single source of truth for BOTH the
    * Spark aggregation list and the generated oracle SQL. (Defined
    * before `queries`, which interpolates it at object init.)
    */
  private val ProfiledOrderCols = Seq(
    "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
    "o_orderdate", "o_orderpriority")

  /** Column profile of any table: per-column null count and distinct
    * count, plus the row total, in ONE aggregation pass — the
    * data-quality scorecard a pipeline runs on every ingested table
    * (q73 is this API applied to `orders`).
    *
    * Exact mode plans the multi-column COUNT(DISTINCT) via Expand
    * (×columns row multiplication with partial aggregation — the
    * standard exact shape). For wide tables at corpus scale that
    * multiplication is the dominant cost, so `approxDistinct = true`
    * swaps in approx_count_distinct: one HLL sketch per column in the
    * same single pass, no Expand, ~2% relative error.
    *
    * Aliases are positional (`null_0`, `dist_0`), never derived from the
    * column names, so names that are not valid identifiers (dots,
    * spaces) cannot corrupt the generated aggregation list; the output
    * reports the original name as data.
    */
  def profile(df: DataFrame, cols: Seq[String],
      approxDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile: need at least one column")
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      val dist =
        if (approxDistinct) approx_count_distinct(col(c))
        else countDistinct(col(c))
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null_$i"),
        dist.as(s"dist_$i"))
    } :+ count(lit(1)).as("n_rows")
    val one = df.agg(aggs.head, aggs.tail: _*)
    // single-quote escape: the column NAME re-enters the plan as a
    // string literal inside stack()
    def lit1(c: String) = "'" + c.replace("'", "\\'") + "'"
    one.selectExpr("n_rows",
        s"stack(${cols.length}, " +
          cols.zipWithIndex.map { case (c, i) => s"${lit1(c)}, null_$i, dist_$i" }
            .mkString(", ") +
          ") AS (column_name, n_null, n_distinct)")
      .select("column_name", "n_rows", "n_null", "n_distinct")
      .orderBy("column_name")
  }

  /** Benford's law leading-digit probabilities, log10(1 + 1/d), as
    * shared 17-digit literals — ONE definition interpolated into the
    * Spark lookup relation and the oracle's VALUES so the two engines
    * can never audit against different expectations (computing them
    * with log10 at runtime would be transcendental and engine-local).
    */
  private val BenfordP: Seq[(Int, String)] = Seq(
    1 -> "0.3010299956639812", 2 -> "0.17609125905568124",
    3 -> "0.12493873660829992", 4 -> "0.09691001300805642",
    5 -> "0.07918124604762482", 6 -> "0.06694678963061322",
    7 -> "0.05799194697768673", 8 -> "0.05115252244738129",
    9 -> "0.04575749056067514")

  val queries: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------------
    // q55: pivot — long-to-wide on order status. Spark's
    // groupBy().pivot(values) with an explicit value list stays a single
    // two-phase hash aggregation (no extra pass to discover values, which
    // at 100 TB would be a full scan); counts are coalesced to 0 so empty
    // cells match SQL's FILTER semantics.
    QueryDef.sql("q55_pivot_order_counts") { (s, d) =>
      Tables(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .count()
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("F"),
          coalesce(col("O"), lit(0L)).as("O"),
          coalesce(col("P"), lit(0L)).as("P"))
        .orderBy("o_orderpriority")
    } {
      """SELECT o_orderpriority,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS F,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS O,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS P
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin
    },

    // ------------------------------------------------------------------
    // q56: unpivot — wide-to-long melt of two part measures. Per-row
    // generator (no shuffle until the final sort); measure values share
    // one double-typed value column.
    QueryDef.sql("q56_unpivot_part_measures") { (s, d) =>
      Tables(s, d, "part")
        .filter(col("p_partkey") <= 200)
        .select(col("p_partkey"),
          col("p_size").cast("double").as("size"),
          col("p_retailprice").cast("double").as("retailprice"))
        .unpivot(
          Array(col("p_partkey")),
          Array(col("size"), col("retailprice")),
          "measure", "value")
        .orderBy("p_partkey", "measure")
    } {
      """SELECT p_partkey, measure, value FROM (
        |  SELECT p_partkey, 'size' AS measure, CAST(p_size AS DOUBLE) AS value
        |  FROM part WHERE p_partkey <= 200
        |  UNION ALL
        |  SELECT p_partkey, 'retailprice' AS measure, CAST(p_retailprice AS DOUBLE) AS value
        |  FROM part WHERE p_partkey <= 200)
        |ORDER BY p_partkey, measure""".stripMargin
    },

    // ------------------------------------------------------------------
    // q57: exact percentiles (R-7 linear interpolation) of the quantity
    // distribution per return flag. Spark's percentile and DuckDB's
    // quantile_cont share the definition h = (n−1)p; on integer-valued
    // quantities with quarter fractions every interpolation term is exact
    // in binary, so the doubles are bit-equal. Exact percentile sorts
    // per group — the distributed shape holds because group count is
    // small and per-group data shuffles to its own aggregation buffer;
    // for corpus-scale distributions use approx_percentile (q67), the
    // exact two-pass Scale.exactQuantiles (q102), or — when the groups
    // themselves are corpus-sized — Scale.groupedQuantiles (round 14),
    // which ranks each group cluster-wide and never buffers one.
    QueryDef.sql("q57_quantity_percentiles") { (s, d) =>
      Tables(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_quantity, 0.25)").as("q25"),
          expr("percentile(l_quantity, 0.5)").as("median"),
          expr("percentile(l_quantity, 0.75)").as("q75"),
          min(col("l_quantity")).as("qmin"),
          max(col("l_quantity")).as("qmax"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    } {
      """SELECT l_returnflag,
        |  QUANTILE_CONT(l_quantity, 0.25) AS q25,
        |  QUANTILE_CONT(l_quantity, 0.5) AS median,
        |  QUANTILE_CONT(l_quantity, 0.75) AS q75,
        |  MIN(l_quantity) AS qmin,
        |  MAX(l_quantity) AS qmax,
        |  COUNT(*) AS n
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin
    },

    // ------------------------------------------------------------------
    // q67: the corpus-scale twin of q57 — approx_percentile. Exact
    // percentile buffers and sorts EVERY group value in one aggregation
    // buffer, which is fine for small groups and impossible for a 100 TB
    // distribution; approx_percentile is a bounded-size Greenwald–Khanna
    // sketch: one pass, map-side mergeable partials, rank error ≤ n/acc
    // regardless of n. Sketch internals are engine-specific (no DuckDB
    // oracle); StatsSpec asserts every output sits inside the exact
    // rank-error band from q57's percentile.
    QueryDef.noOracle("q67_quantity_percentiles_approx") { (s, d) =>
      Tables(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          expr(s"approx_percentile(l_quantity, 0.25, $ApproxPercentileAccuracy)").as("q25"),
          expr(s"approx_percentile(l_quantity, 0.5, $ApproxPercentileAccuracy)").as("median"),
          expr(s"approx_percentile(l_quantity, 0.75, $ApproxPercentileAccuracy)").as("q75"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },

    // ------------------------------------------------------------------
    // q73: COLUMN PROFILE — [[profile]] applied to orders (exact mode;
    // the approx HLL mode for wide tables is spec-covered in
    // ProfileSpec). The Spark aggregation list and the oracle SQL are
    // generated from the same column list, so they cannot drift.
    QueryDef.sql("q73_column_profile") { (s, d) =>
      profile(Tables(s, d, "orders"), ProfiledOrderCols)
    } {
      val per = ProfiledOrderCols.map { c =>
        s"SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS null_$c, " +
          s"COUNT(DISTINCT $c) AS dist_$c"
      }.mkString(",\n|    ")
      val rows = ProfiledOrderCols.map { c =>
        s"SELECT '$c' AS column_name, n_rows, CAST(null_$c AS BIGINT) AS n_null, " +
          s"dist_$c AS n_distinct FROM a"
      }.mkString("\n|  UNION ALL ")
      s"""WITH a AS (
         |  SELECT COUNT(*) AS n_rows,
         |    $per
         |  FROM orders)
         |SELECT column_name, n_rows, n_null, n_distinct FROM (
         |  $rows)
         |ORDER BY column_name""".stripMargin
    },

    // ------------------------------------------------------------------
    // q77: KEY-SKEW PROFILE — [[graft.ops.Scale.skewProfile]] on
    // lineitem's supplier key: exact per-key counts, global key stats,
    // top-20 heavy hitters with row share and multiple-of-average. The
    // operational answer to "does this join need saltedJoin/AQE?",
    // verifiable because every ratio is one IEEE division of exact ints.
    QueryDef.sql("q77_key_skew_profile") { (s, d) =>
      Scale.skewProfile(Tables(s, d, "lineitem"), "l_suppkey", 20)
        .orderBy("rnk")
    } {
      """WITH c AS (
        |  SELECT l_suppkey, COUNT(*) AS cnt FROM lineitem GROUP BY l_suppkey),
        |t AS (
        |  SELECT CAST(SUM(cnt) AS BIGINT) AS total_rows, COUNT(*) AS n_keys
        |  FROM c),
        |r AS (
        |  SELECT l_suppkey, cnt,
        |    ROW_NUMBER() OVER (ORDER BY cnt DESC, l_suppkey) AS rnk
        |  FROM c)
        |SELECT r.l_suppkey, CAST(r.cnt AS BIGINT) AS cnt, CAST(r.rnk AS INT) AS rnk,
        |  CAST(r.cnt AS DOUBLE) / t.total_rows AS share,
        |  CAST(r.cnt AS DOUBLE) * t.n_keys / t.total_rows AS skew_vs_avg,
        |  t.n_keys, t.total_rows
        |FROM r, t
        |WHERE r.rnk <= 20
        |ORDER BY rnk""".stripMargin
    },

    // ------------------------------------------------------------------
    // q85: BLOOM-PRUNED FACT JOIN — Scale.bloomPrune drops lineitem rows
    // that cannot match the selected part subset (one Brand in 25)
    // before the join, using Spark's own runtime-filter kernels
    // (bloom_filter_agg / might_contain) as an explicit library step.
    // Because Bloom filters have no false negatives, the pruned join is
    // row-identical to the plain join — the oracle below IS the plain
    // join, which is the whole correctness story. At 100 TB the pruning
    // predicate cuts the fact side's shuffle write by the dimension's
    // selectivity; BloomPruneSpec pins the filter below the exchange.
    QueryDef.sql("q85_bloom_pruned_join") { (s, d) =>
      val parts = Tables(s, d, "part").filter(col("p_brand") === "Brand#23")
      val pruned = Scale.bloomPrune(
        Tables(s, d, "lineitem"), "l_partkey", parts, "p_partkey",
        expectedItems = 4096, fpp = 0.01)
      pruned.join(parts, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_type"))
        .agg(
          count(lit(1)).as("n_items"),
          Det.csum(col("l_quantity"), 0).as("sum_qty"),
          Det.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"))
        .orderBy("p_type")
    } {
      s"""SELECT p_type, COUNT(*) AS n_items,
         |  ${Det.csumSql("l_quantity", 0)} AS sum_qty,
         |  ${Det.dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE p_brand = 'Brand#23'
         |GROUP BY p_type
         |ORDER BY p_type""".stripMargin
    },

    // ------------------------------------------------------------------
    // q102: GLOBAL exact quantiles at scale — Scale.exactQuantiles over
    // the full lineitem quantity distribution: R-7 order statistics
    // from the two-pass global rank (distributed range sort) instead of
    // q57's single-buffer `percentile`, which is exact but cannot hold
    // a corpus-scale distribution in one aggregation buffer. Quarter
    // fractions keep every interpolation term exact in binary, so the
    // result hash-matches DuckDB's QUANTILE_CONT.
    QueryDef.sql("q102_global_quantiles_scalable") { (s, d) =>
      Scale.exactQuantiles(
        Tables(s, d, "lineitem"), "l_quantity", Seq(0.25, 0.5, 0.75))
    } {
      """SELECT * FROM (
        |  SELECT CAST(0.25 AS DOUBLE) AS p,
        |    QUANTILE_CONT(l_quantity, 0.25) AS quantile FROM lineitem
        |  UNION ALL
        |  SELECT CAST(0.5 AS DOUBLE), QUANTILE_CONT(l_quantity, 0.5)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT CAST(0.75 AS DOUBLE), QUANTILE_CONT(l_quantity, 0.75)
        |  FROM lineitem)
        |ORDER BY p""".stripMargin
    },

    // ------------------------------------------------------------------
    // q147: Z-ORDER LAYOUT SKIPPING AUDIT — the data-layout decision
    // made measurable. Both layouts assign every lineitem row to one of
    // 64 value-range files: `linear` by l_partkey bucket alone (the
    // single-column sort a naive writer produces), `zorder` by the
    // Morton interleave of (l_partkey, l_suppkey) buckets
    // (Scale.zorderSql — what OPTIMIZE ZORDER writes). Per (layout,
    // file): row count and the min/max BOX of both dimensions — the
    // exact statistics a reader's file-pruning consults. The numbers
    // say it all: linear files span ≤ 4 partkey buckets but the FULL
    // suppkey domain (a suppkey filter prunes nothing); aligned z-range
    // files are ≤ 32×32 tiles, so filters on EITHER dimension prune
    // ~31/32 of files. All-integer arithmetic from one shared formula
    // builder on both engines; the physical write path
    // (repartitionByRange on z) is Scale.zorderLayout, spec-pinned.
    QueryDef.sql("q147_zorder_layout_audit") { (s, d) =>
      val li = Tables(s, d, "lineitem")
      val mm = broadcast(li.agg(
        min(col("l_partkey")).cast("long").as("min_a"),
        (max(col("l_partkey")).cast("long")
          - min(col("l_partkey")).cast("long") + 1L).as("range_a"),
        min(col("l_suppkey")).cast("long").as("min_b"),
        (max(col("l_suppkey")).cast("long")
          - min(col("l_suppkey")).cast("long") + 1L).as("range_b")))
      val bucketed = li.crossJoin(mm)
        .withColumn("bx", expr(Scale.bucketSql("l_partkey", "min_a", "range_a", 8)))
        .withColumn("by", expr(Scale.bucketSql("l_suppkey", "min_b", "range_b", 8)))
        .withColumn("z", expr(Scale.zorderSql("bx", "by", 8)))
      val z = bucketed
        .select(lit("zorder").as("layout"),
          expr("CAST(FLOOR(CAST(z AS DOUBLE) / 1024) AS BIGINT)").as("file_id"),
          col("bx"), col("by"))
      val lin = bucketed
        .select(lit("linear").as("layout"),
          expr("CAST(FLOOR(CAST(bx AS DOUBLE) / 4) AS BIGINT)").as("file_id"),
          col("bx"), col("by"))
      z.unionAll(lin)
        .groupBy(col("layout"), col("file_id"))
        .agg(count(lit(1)).as("n_rows"),
          (max(col("bx")) - min(col("bx")) + 1L).as("span_partkey"),
          (max(col("by")) - min(col("by")) + 1L).as("span_suppkey"))
        .orderBy("layout", "file_id")
    } {
      s"""WITH mm AS (
         |  SELECT CAST(MIN(l_partkey) AS BIGINT) AS min_a,
         |    CAST(MAX(l_partkey) - MIN(l_partkey) + 1 AS BIGINT) AS range_a,
         |    CAST(MIN(l_suppkey) AS BIGINT) AS min_b,
         |    CAST(MAX(l_suppkey) - MIN(l_suppkey) + 1 AS BIGINT) AS range_b
         |  FROM lineitem),
         |b AS (
         |  SELECT ${Scale.bucketSql("l_partkey", "min_a", "range_a", 8)} AS bx,
         |    ${Scale.bucketSql("l_suppkey", "min_b", "range_b", 8)} AS by
         |  FROM lineitem CROSS JOIN mm),
         |bz AS (SELECT bx, by, ${Scale.zorderSql("bx", "by", 8)} AS z FROM b),
         |u AS (
         |  SELECT 'zorder' AS layout,
         |    CAST(FLOOR(CAST(z AS DOUBLE) / 1024) AS BIGINT) AS file_id, bx, by FROM bz
         |  UNION ALL
         |  SELECT 'linear' AS layout,
         |    CAST(FLOOR(CAST(bx AS DOUBLE) / 4) AS BIGINT) AS file_id, bx, by FROM bz)
         |SELECT layout, file_id, COUNT(*) AS n_rows,
         |  MAX(bx) - MIN(bx) + 1 AS span_partkey,
         |  MAX(by) - MIN(by) + 1 AS span_suppkey
         |FROM u GROUP BY layout, file_id
         |ORDER BY layout, file_id""".stripMargin
    },

    // ------------------------------------------------------------------
    // q130: MEDIAN/MAD ROBUST OUTLIER AUDIT — the robust twin of q87's
    // z-score: median and median-absolute-deviation replace mean/stddev,
    // so a heavy tail cannot drag its own detection threshold (the
    // classic failure of moment-based outlier gates on power-law corpus
    // length distributions). Flag = |len − median| > 3·MAD, reported per
    // source. Both medians run through Scale.exactQuantiles' two-pass
    // global order statistics (the q102 machinery — no single-buffer
    // percentile), so the operator is exact at any corpus size: two
    // rank passes + one flagging scan, each distributed. Every
    // interpolation lands on a multiple of 0.5 (integer data, quarter
    // weights), exact in binary — the doubles hash-match QUANTILE_CONT.
    QueryDef.sql("q130_mad_outlier_audit") { (s, d) =>
      val docs = Tables(s, d, "documents")
      val med = Scale.exactQuantiles(docs, "n_chars", Seq(0.5))
        .select(col("quantile").as("med"))
      val dev = docs.select(col("source"), col("n_chars"))
        .crossJoin(broadcast(med))
        .withColumn("absdev", abs(col("n_chars").cast("double") - col("med")))
      val mad = Scale.exactQuantiles(dev, "absdev", Seq(0.5))
        .select(col("quantile").as("mad"))
      dev.crossJoin(broadcast(mad))
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("absdev") > lit(3.0) * col("mad"), 1L).otherwise(0L))
            .as("n_outliers"),
          max(col("med")).as("med"), max(col("mad")).as("mad"))
        .orderBy("source")
    } {
      """WITH med AS (SELECT QUANTILE_CONT(n_chars, 0.5) AS med FROM documents),
        |dev AS (
        |  SELECT source, med.med AS med,
        |    ABS(CAST(n_chars AS DOUBLE) - med.med) AS absdev
        |  FROM documents, med),
        |mad AS (SELECT QUANTILE_CONT(absdev, 0.5) AS mad FROM dev)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN absdev > 3.0 * mad.mad THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_outliers,
        |  MAX(dev.med) AS med, MAX(mad.mad) AS mad
        |FROM dev, mad
        |GROUP BY source
        |ORDER BY source""".stripMargin
    },

    // ------------------------------------------------------------------
    // q134: WEIGHTED GLOBAL QUANTILES — order statistics where each row
    // counts with a WEIGHT (here: doc length in chars weighted by its
    // token count — "the length of the median token"): the p-quantile is
    // the smallest value whose cumulative weight reaches ceil(p·W).
    // Spark has no weighted percentile at all, and the unweighted
    // exact/approx pair (q57/q67) cannot express it; corpus curation
    // needs it wherever documents are not equal (token-weighted length
    // targets, quality-weighted thresholds). Shape at scale: the
    // cumulative weight is Scale.globalOrderedCumsum's two-pass frozen
    // range shuffle (the q102/q115 machinery — no single-task window),
    // thresholds are one 3-row broadcast, and the crossing is a
    // map-side-combined min per fraction. Integer weights end-to-end:
    // thresholds are exact ceilings ((W·num + den − 1) DIV den), so the
    // quantiles are integers and hash-match the oracle.
    QueryDef.sql("q134_weighted_quantiles") { (s, d) =>
      val docs = Tables(s, d, "documents")
        .select(col("doc_id"), col("n_chars"),
          size(split(col("text"), " ")).cast("long").as("w"))
      val cum = Scale.globalOrderedCumsum(docs, "w", "cumw", "rnk",
        col("n_chars").asc, col("doc_id").asc)
      val tot = cum.agg(max(col("cumw")).as("wtot"))
      val th = {
        import s.implicits._
        Seq((1, 4), (1, 2), (3, 4)).toDF("num", "den")
      }.crossJoin(broadcast(tot))
        .withColumn("t", expr("(wtot * num + den - 1) DIV den"))
        .withColumn("p", col("num").cast("double") / col("den"))
        .select("p", "t")
      cum.join(broadcast(th), col("cumw") >= col("t"))
        .groupBy(col("p")).agg(min(col("n_chars")).as("w_quantile"))
        .orderBy("p")
    } {
      """WITH w AS (
        |  SELECT doc_id, n_chars,
        |    CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS w
        |  FROM documents),
        |cum AS (
        |  SELECT n_chars,
        |    SUM(w) OVER (ORDER BY n_chars, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw
        |  FROM w),
        |tot AS (SELECT CAST(SUM(w) AS BIGINT) AS wtot FROM w),
        |th(num, den) AS (VALUES (1, 4), (1, 2), (3, 4)),
        |t2 AS (
        |  SELECT CAST(num AS DOUBLE) / den AS p,
        |    (wtot * num + den - 1) // den AS t
        |  FROM th, tot)
        |SELECT p, MIN(n_chars) AS w_quantile
        |FROM cum JOIN t2 ON cumw >= t
        |GROUP BY p ORDER BY p""".stripMargin
    },

    // ------------------------------------------------------------------
    // q137: REFERENTIAL-INTEGRITY AUDIT — orphan and coverage counts for
    // every foreign-key edge of the star schema plus the events→customer
    // edge: the data-quality gate a warehouse runs before trusting joins
    // (an orphan fact row silently disappears from every inner join; an
    // unreferenced dimension row signals a stale or mis-keyed feed).
    // Each edge costs two keyed anti-joins (orphans: child ⟂ parent;
    // unreferenced: parent ⟂ child) — broadcast when the dimension is
    // small, shuffle otherwise, both sides exact integer counts. The
    // edge list is the audit's config; results union into one relation.
    QueryDef.sql("q137_referential_integrity") { (s, d) =>
      def edge(name: String, child: DataFrame, ck: String,
          parent: DataFrame, pk: String): DataFrame = {
        val c = child.select(col(ck).as("__k"))
        val p = parent.select(col(pk).as("__p"))
        val childStats = c.agg(
          count(lit(1)).as("child_rows"),
          count_distinct(col("__k")).as("distinct_keys"))
        val orphans = c.join(p, col("__k") === col("__p"), "left_anti")
          .agg(count(lit(1)).as("orphan_rows"))
        val unref = p.join(c, col("__p") === col("__k"), "left_anti")
          .agg(count(lit(1)).as("unreferenced_parents"))
        childStats.crossJoin(orphans).crossJoin(unref)
          .select(lit(name).as("edge"), col("child_rows"),
            col("distinct_keys"), col("orphan_rows"),
            col("unreferenced_parents"))
      }
      val li = Tables(s, d, "lineitem"); val o = Tables(s, d, "orders")
      val cst = Tables(s, d, "customer"); val pt = Tables(s, d, "part")
      val sp = Tables(s, d, "supplier"); val nt = Tables(s, d, "nation")
      val ev = Tables(s, d, "events")
      Seq(
        edge("lineitem->orders", li, "l_orderkey", o, "o_orderkey"),
        edge("lineitem->part", li, "l_partkey", pt, "p_partkey"),
        edge("lineitem->supplier", li, "l_suppkey", sp, "s_suppkey"),
        edge("orders->customer", o, "o_custkey", cst, "c_custkey"),
        edge("customer->nation", cst, "c_nationkey", nt, "n_nationkey"),
        edge("events->customer", ev, "user_id", cst, "c_custkey"))
        .reduce(_ unionByName _)
        .orderBy("edge")
    } {
      def e(name: String, child: String, ck: String,
          parent: String, pk: String): String =
        s"""SELECT '$name' AS edge,
           |  (SELECT COUNT(*) FROM $child) AS child_rows,
           |  (SELECT COUNT(DISTINCT $ck) FROM $child) AS distinct_keys,
           |  (SELECT COUNT(*) FROM $child c
           |     WHERE NOT EXISTS (SELECT 1 FROM $parent p WHERE p.$pk = c.$ck))
           |    AS orphan_rows,
           |  (SELECT COUNT(*) FROM $parent p
           |     WHERE NOT EXISTS (SELECT 1 FROM $child c WHERE c.$ck = p.$pk))
           |    AS unreferenced_parents""".stripMargin
      Seq(
        e("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        e("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
        e("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        e("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
        e("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
        e("events->customer", "events", "user_id", "customer", "c_custkey"))
        .mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY edge")
    },

    // ------------------------------------------------------------------
    // q139: DELETION-PROPAGATION AUDIT (right-to-be-forgotten) — given a
    // deletion cohort of users, count every row each table still holds
    // that references them, directly (events.user_id, orders.o_custkey)
    // or transitively (lineitem through its order): the pre-deletion
    // inventory a compliance pipeline runs, and re-runs post-deletion
    // expecting zeros. The cohort here is the library-wide md5 id-hash
    // under ~2% of the bucket space — deterministic, content-independent,
    // engine-shared. Shapes: the cohort predicate is scan-side for the
    // direct tables; lineitem's transitive hop is one semi-join on
    // l_orderkey against the cohort's orders (keyed shuffle; the fact
    // table is never re-keyed by user). Exact integer counts.
    QueryDef.sql("q139_deletion_propagation") { (s, d) =>
      val keep = graft.Ids.hash("user_key") < lit(85899345L) // 2% of 2^32
      def cohortRows(df: DataFrame, keyCol: String): DataFrame =
        df.withColumn("user_key", col(keyCol)).filter(keep)
      val cust = cohortRows(Tables(s, d, "customer"), "c_custkey")
        .agg(count(lit(1)).as("n_rows"),
          count_distinct(col("user_key")).as("n_users"))
        .select(lit("customer").as("table_name"), col("n_rows"), col("n_users"))
      val ev = cohortRows(Tables(s, d, "events"), "user_id")
        .agg(count(lit(1)).as("n_rows"),
          count_distinct(col("user_key")).as("n_users"))
        .select(lit("events").as("table_name"), col("n_rows"), col("n_users"))
      val ords = cohortRows(Tables(s, d, "orders"), "o_custkey")
      val or = ords
        .agg(count(lit(1)).as("n_rows"),
          count_distinct(col("user_key")).as("n_users"))
        .select(lit("orders").as("table_name"), col("n_rows"), col("n_users"))
      val li = Tables(s, d, "lineitem")
        .join(ords.select(col("o_orderkey"), col("user_key")),
          col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n_rows"),
          count_distinct(col("user_key")).as("n_users"))
        .select(lit("lineitem").as("table_name"), col("n_rows"), col("n_users"))
      cust.unionByName(ev).unionByName(or).unionByName(li)
        .orderBy("table_name")
    } {
      def hash(c: String) = graft.Ids.hashSql(c)
      s"""SELECT * FROM (
         |  SELECT 'customer' AS table_name, COUNT(*) AS n_rows,
         |    COUNT(DISTINCT c_custkey) AS n_users
         |  FROM customer WHERE ${hash("c_custkey")} < 85899345
         |  UNION ALL
         |  SELECT 'events', COUNT(*), COUNT(DISTINCT user_id)
         |  FROM events WHERE ${hash("user_id")} < 85899345
         |  UNION ALL
         |  SELECT 'orders', COUNT(*), COUNT(DISTINCT o_custkey)
         |  FROM orders WHERE ${hash("o_custkey")} < 85899345
         |  UNION ALL
         |  SELECT 'lineitem', COUNT(*), COUNT(DISTINCT o.o_custkey)
         |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         |  WHERE ${hash("o.o_custkey")} < 85899345
         |) ORDER BY table_name""".stripMargin
    },

    // ------------------------------------------------------------------
    // q141: FACT-ROLLUP RECONCILIATION — does the order header's
    // o_totalprice equal its lineitems' Σ extprice·(1−disc)·(1+tax)?
    // The warehouse trust audit for any header/detail pair (billing vs
    // ledger, manifest vs shards): report, per order priority, how many
    // headers disagree with their detail rollup beyond a tolerance and
    // by how much. On this synthetic corpus the headers are generated
    // independently of the lines, so the audit reports ~100% mismatch —
    // which is precisely its job to notice (spec-pinned). Exactness: the
    // per-row term is one shared IEEE chain, the per-order rollup is an
    // order-free decimal sum (Det.dsum), the delta a single subtraction
    // — deltas, counts and extrema all hash-match. Shape: one shuffle
    // on l_orderkey (map-side partial sums), one broadcast-joinable
    // header relation, one priority-key agg.
    QueryDef.sql("q141_rollup_reconciliation") { (s, d) =>
      val roll = Tables(s, d, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(Det.dsum(expr(
          "l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")).as("roll"))
      Tables(s, d, "orders")
        .join(roll, col("o_orderkey") === col("l_orderkey"), "left_outer")
        .withColumn("delta", abs(col("o_totalprice") - coalesce(col("roll"), lit(0.0))))
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(when(col("roll").isNull, 1L).otherwise(0L)).as("n_lineless"),
          sum(when(col("delta") > 1.0, 1L).otherwise(0L)).as("n_mismatched"),
          max(col("delta")).as("max_abs_delta"),
          Det.dsum(col("delta")).as("sum_abs_delta"))
        .orderBy("o_orderpriority")
    } {
      s"""WITH r AS (
         |  SELECT l_orderkey,
         |    ${Det.dsumSql("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")}
         |      AS roll
         |  FROM lineitem GROUP BY l_orderkey),
         |j AS (
         |  SELECT o.o_orderpriority, r.roll,
         |    ABS(o.o_totalprice - COALESCE(r.roll, 0.0)) AS delta
         |  FROM orders o LEFT JOIN r ON o.o_orderkey = r.l_orderkey)
         |SELECT o_orderpriority, COUNT(*) AS n_orders,
         |  CAST(SUM(CASE WHEN roll IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_lineless,
         |  CAST(SUM(CASE WHEN delta > 1.0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_mismatched,
         |  MAX(delta) AS max_abs_delta,
         |  ${Det.dsumSql("delta")} AS sum_abs_delta
         |FROM j
         |GROUP BY o_orderpriority
         |ORDER BY o_orderpriority""".stripMargin
    },

    // ------------------------------------------------------------------
    // q142: QUANTILE-BAND LABELING — tag every document with its GLOBAL
    // length quartile and report the (lang, band) composition: the
    // "which languages live in the long tail" audit, and the general
    // pattern of using corpus-level order statistics as a row-level
    // transform (curriculum difficulty bands q93 ranks globally; this
    // labels against three broadcast scalars — one scan, no rank
    // shuffle for the labeling pass). Quartiles come from the q102
    // two-pass machinery; band = 1 + Σ (len > q_i) is pure integer
    // arithmetic over identical doubles, so the counts hash-match.
    QueryDef.sql("q142_quantile_band_mix") { (s, d) =>
      val docs = Tables(s, d, "documents")
      val qs = Scale.exactQuantiles(docs, "n_chars", Seq(0.25, 0.5, 0.75))
        .groupBy()
        .agg(
          min(when(col("p") === 0.25, col("quantile"))).as("q1"),
          min(when(col("p") === 0.5, col("quantile"))).as("q2"),
          min(when(col("p") === 0.75, col("quantile"))).as("q3"))
      docs.select(col("lang"), col("n_chars"))
        .crossJoin(broadcast(qs))
        .withColumn("band",
          lit(1) + (col("n_chars") > col("q1")).cast("int")
            + (col("n_chars") > col("q2")).cast("int")
            + (col("n_chars") > col("q3")).cast("int"))
        .groupBy(col("lang"), col("band"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"))
        .orderBy("lang", "band")
    } {
      """WITH q AS (
        |  SELECT QUANTILE_CONT(n_chars, 0.25) AS q1,
        |    QUANTILE_CONT(n_chars, 0.5) AS q2,
        |    QUANTILE_CONT(n_chars, 0.75) AS q3
        |  FROM documents)
        |SELECT lang,
        |  1 + CAST(n_chars > q.q1 AS INT) + CAST(n_chars > q.q2 AS INT)
        |    + CAST(n_chars > q.q3 AS INT) AS band,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM documents, q
        |GROUP BY 1, 2
        |ORDER BY lang, band""".stripMargin
    },

    // ------------------------------------------------------------------
    // q143: CHI-SQUARED INDEPENDENCE AUDIT — is `lang` independent of
    // `source` in the corpus? Per-cell observed vs expected counts and
    // the cell's χ² contribution: the categorical-association monitor
    // behind mixture design (a source that only speaks one language is
    // a concentration risk the marginals hide; q91/q122 watch drift,
    // this watches ASSOCIATION). Exactness: observed and marginals are
    // integers, expected = (row_total · col_total) / n is ONE division
    // of exact integer products, and the χ² contribution is a shared
    // IEEE chain over identical operands — per-cell doubles hash-match
    // without any transcendental (a G-test's logs would not). Shape:
    // one (lang, source) agg, two marginal re-aggs of that tiny grid,
    // broadcast joins — a single corpus scan.
    QueryDef.sql("q143_chi2_independence") { (s, d) =>
      val grid = Tables(s, d, "documents")
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("observed"))
      val rowM = grid.groupBy(col("lang")).agg(sum(col("observed")).as("n_lang"))
      val colM = grid.groupBy(col("source")).agg(sum(col("observed")).as("n_source"))
      val tot = grid.agg(sum(col("observed")).as("n"))
      grid.join(broadcast(rowM), "lang")
        .join(broadcast(colM), "source")
        .crossJoin(broadcast(tot))
        .withColumn("expected", expr(
          "CAST(n_lang * n_source AS DOUBLE) / CAST(n AS DOUBLE)"))
        .withColumn("chi2_cell", expr(
          "(CAST(observed AS DOUBLE) - expected) * (CAST(observed AS DOUBLE) - expected) / expected"))
        .select("lang", "source", "observed", "expected", "chi2_cell")
        .orderBy("lang", "source")
    } {
      """WITH grid AS (
        |  SELECT lang, source, COUNT(*) AS observed
        |  FROM documents GROUP BY lang, source),
        |rm AS (SELECT lang, CAST(SUM(observed) AS BIGINT) AS n_lang
        |       FROM grid GROUP BY lang),
        |cm AS (SELECT source, CAST(SUM(observed) AS BIGINT) AS n_source
        |       FROM grid GROUP BY source),
        |tot AS (SELECT CAST(SUM(observed) AS BIGINT) AS n FROM grid)
        |SELECT g.lang, g.source, g.observed,
        |  CAST(rm.n_lang * cm.n_source AS DOUBLE) / CAST(tot.n AS DOUBLE)
        |    AS expected,
        |  (CAST(g.observed AS DOUBLE)
        |     - CAST(rm.n_lang * cm.n_source AS DOUBLE) / CAST(tot.n AS DOUBLE))
        |  * (CAST(g.observed AS DOUBLE)
        |     - CAST(rm.n_lang * cm.n_source AS DOUBLE) / CAST(tot.n AS DOUBLE))
        |  / (CAST(rm.n_lang * cm.n_source AS DOUBLE) / CAST(tot.n AS DOUBLE))
        |    AS chi2_cell
        |FROM grid g
        |JOIN rm ON g.lang = rm.lang
        |JOIN cm ON g.source = cm.source
        |CROSS JOIN tot
        |ORDER BY g.lang, g.source""".stripMargin
    },

    // ------------------------------------------------------------------
    // q163: BENFORD FIRST-DIGIT AUDIT — the forensic screen for
    // fabricated or mechanically-generated numeric columns: the
    // distribution of leading digits of o_totalprice against Benford's
    // law, with per-digit χ² contributions. Cross-engine determinism
    // hinges on how the leading digit is taken: NEVER from the float's
    // string form (engines format doubles differently) and never via
    // log10 (transcendental) — prices convert to exact integer cents
    // (leading digit invariant under ×100) and the digit is the first
    // character of the INTEGER's decimal form, identical everywhere.
    // The nine Benford probabilities are shared 17-digit literals, so
    // expected counts and χ² terms are the same IEEE chain on both
    // engines. On this synthetic fixture the audit correctly reports
    // massive deviation — uniform-ish generators fail Benford, which is
    // precisely what it detects.
    QueryDef.sql("q163_benford_audit")({ (s, d) =>
      Tables(s, d, "orders")
        .select(expr(
          "substring(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS STRING), 1, 1)")
          .as("digit"))
        .groupBy(col("digit"))
        .agg(count(lit(1)).as("n_obs"))
        .crossJoin(broadcast(
          Tables(s, d, "orders").agg(count(lit(1)).as("n"))))
        .join({
          import s.implicits._
          BenfordP.map { case (k, v) => (k.toString, v.toDouble) }
            .toDF("digit_p", "p")
        }, col("digit") === col("digit_p"))
        .select(col("digit"), col("n_obs"),
          (col("n").cast("double") * col("p")).as("expected"),
          expr("(CAST(n_obs AS DOUBLE) - CAST(n AS DOUBLE) * p) " +
            "* (CAST(n_obs AS DOUBLE) - CAST(n AS DOUBLE) * p) " +
            "/ (CAST(n AS DOUBLE) * p)").as("chi2_term"))
        .orderBy("digit")
    }) {
      s"""WITH d AS (
         |  SELECT SUBSTRING(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
         |    AS VARCHAR), 1, 1) AS digit
         |  FROM orders),
         |obs AS (SELECT digit, COUNT(*) AS n_obs FROM d GROUP BY digit),
         |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM orders),
         |bp AS (${BenfordP.map { case (k, v) =>
             s"SELECT '$k' AS digit_p, CAST($v AS DOUBLE) AS p"
           }.mkString(" UNION ALL ")})
         |SELECT obs.digit, obs.n_obs,
         |  CAST(tot.n AS DOUBLE) * bp.p AS expected,
         |  (CAST(obs.n_obs AS DOUBLE) - CAST(tot.n AS DOUBLE) * bp.p)
         |    * (CAST(obs.n_obs AS DOUBLE) - CAST(tot.n AS DOUBLE) * bp.p)
         |    / (CAST(tot.n AS DOUBLE) * bp.p) AS chi2_term
         |FROM obs CROSS JOIN tot
         |JOIN bp ON obs.digit = bp.digit_p
         |ORDER BY obs.digit""".stripMargin
    },

    // ------------------------------------------------------------------
    // q170: ORPHAN-RATE TREND — q137's referential-integrity audit as a
    // TIME SERIES: per day, how many events reference a user with no
    // customer row, and the orphan rate. A point-in-time audit says
    // "0.4% orphans"; the trend says WHEN the producer broke (a joint
    // deploy window shows as a step change). One left join of the fact
    // stream against the dimension key (keyed equi-join — at warehouse
    // scale the dimension side is bloom-prunable, q85's tooling), one
    // day-keyed aggregation; all exact integers plus one division.
    QueryDef.sql("q170_orphan_rate_trend") { (s, d) =>
      val cust = Tables(s, d, "customer").select(col("c_custkey"))
      Tables(s, d, "events")
        .select(expr("CAST(ts AS DATE)").as("day"), col("user_id"))
        .join(cust, col("user_id") === col("c_custkey"), "left_outer")
        .groupBy(col("day"))
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("c_custkey").isNull, 1L).otherwise(0L))
            .as("n_orphans"))
        .select(col("day"), col("n_events"), col("n_orphans"),
          (col("n_orphans").cast("double") / col("n_events").cast("double"))
            .as("orphan_rate"))
        .orderBy("day")
    } {
      """SELECT CAST(ts AS DATE) AS day,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_orphans,
        |  CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
        |      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS orphan_rate
        |FROM events e
        |LEFT JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY 1
        |ORDER BY day""".stripMargin
    },

    // ------------------------------------------------------------------
    // q58: correlation + least-squares regression of extended price on
    // quantity, from exact decimal sums: Σx, Σy, Σxy, Σx², Σy² are
    // order-free exact decimals (one map-side-combined aggregation), and
    // corr/slope/intercept are one identical double formula on both
    // engines. Price enters in THOUSANDS: correlation is scale-invariant
    // and the scaling keeps every sum's decimal→double cast exact (below
    // 2^53 of mantissa — Σy² in raw currency units differed from the
    // oracle by 2 ulp through the engines' different cast paths);
    // slope/intercept are therefore in kilo-currency units, named so.
    QueryDef.sql("q58_corr_regression") { (s, d) =>
      val x = col("l_quantity")
      val y = col("l_extendedprice") / 1000.0
      // exact long sums (Det.csum) where the int64 contract holds at the
      // design row counts — quantity is a small integer, kilo-price has
      // 5 decimals ≤ 100; Σxy (per-row up to 5e8 once 1e5-scaled, ~1e8 on
      // average) would overflow int64 within ~1e11 rows per group, so it
      // takes the decimal accumulator like Σy²
      Tables(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).cast("double").as("n"),
          Det.csum(x, 0).as("sx"),
          Det.csum(y, 5).as("sy"),
          Det.dsum(x * y).as("sxy"),
          Det.csum(x * x, 0).as("sxx"),
          Det.dsum(y * y).as("syy"))
        .select({
          // degenerate groups (zero variance, or n = 1) yield NULL, not
          // NaN: DuckDB's double x/0 is already NULL, Spark's is NaN —
          // the guards align Spark on the SQL semantics. The corr guard
          // is <= 0, not === 0: syy sums y² ROUNDED at 6 decimals while
          // sy is exact, so a uniform-y group can make vary slightly
          // NEGATIVE — sqrt of that is NaN on Spark and an Out-of-Range
          // ERROR on DuckDB; both sides guard on the same condition
          val cov = col("n") * col("sxy") - col("sx") * col("sy")
          val varx = col("n") * col("sxx") - col("sx") * col("sx")
          val vary = col("n") * col("syy") - col("sy") * col("sy")
          val slope = cov / varx
          Seq(
            col("l_returnflag"),
            when(varx * vary <= 0, lit(null).cast("double"))
              .otherwise(cov / sqrt(varx * vary)).as("corr_qty_price"),
            when(varx === 0, lit(null).cast("double"))
              .otherwise(slope).as("slope_kprice"),
            when(varx === 0, lit(null).cast("double"))
              .otherwise((col("sy") - slope * col("sx")) / col("n"))
              .as("intercept_kprice"),
            when(col("n") <= 1, lit(null).cast("double"))
              .otherwise(sqrt(varx / (col("n") * (col("n") - 1))))
              .as("stddev_qty"))
        }: _*)
        .orderBy("l_returnflag")
    } {
      s"""WITH sums AS (
         |  SELECT l_returnflag,
         |    CAST(COUNT(*) AS DOUBLE) AS n,
         |    ${Det.csumSql("l_quantity", 0)} AS sx,
         |    ${Det.csumSql("l_extendedprice / 1000.0", 5)} AS sy,
         |    ${Det.dsumSql("l_quantity * (l_extendedprice / 1000.0)")} AS sxy,
         |    ${Det.csumSql("l_quantity * l_quantity", 0)} AS sxx,
         |    ${Det.dsumSql("(l_extendedprice / 1000.0) * (l_extendedprice / 1000.0)")} AS syy
         |  FROM lineitem GROUP BY l_returnflag)
         |SELECT l_returnflag,
         |  CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) <= 0 THEN NULL
         |       ELSE (n * sxy - sx * sy)
         |            / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy))
         |  END AS corr_qty_price,
         |  (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope_kprice,
         |  (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n AS intercept_kprice,
         |  SQRT((n * sxx - sx * sx) / (n * (n - 1))) AS stddev_qty
         |FROM sums
         |ORDER BY l_returnflag""".stripMargin
    },

    // ------------------------------------------------------------------
    // q122: PER-SOURCE LENGTH-DISTRIBUTION DRIFT — the two-sample
    // Kolmogorov–Smirnov statistic between each source's document-length
    // distribution and the REST of the corpus, on width-50 char buckets:
    // D = max over bucket boundaries of |CDF_source − CDF_rest|. A
    // templated or truncated feed shows up as a large D long before eye-
    // balling histograms does — the distribution-drift twin of q91's KL
    // mixture monitor (which compares CATEGORY shares; this compares a
    // numeric distribution's shape). Scale: one shrinking (source,
    // bucket) count agg is the only corpus-sized pass; the global bucket
    // relation, the dense source × bucket grid (KS must evaluate the gap
    // where a source has NO mass, so missing cells are zero-filled), the
    // cumulative windows and the max all run on O(sources × buckets)
    // rows. Engine-exact: every CDF value is ONE division of exact
    // integers (< 2^53), the gap is elementwise IEEE subtract/abs, and
    // MAX is order-free — no floating-point accumulation anywhere.
    QueryDef.sql("q122_length_drift_ks") { (s, d) =>
      // the ONE corpus-sized pass, frozen (q78's posture) so the four
      // consumers below derive from the O(sources × buckets) relation
      // instead of four re-scans of the corpus
      val sb = graft.Checkpoints.checkpointLazy(
        Tables(s, d, "documents")
          .select(col("source"), expr("n_chars DIV 50").as("bucket"))
          .groupBy(col("source"), col("bucket")).agg(count(lit(1)).as("n_sb")))
      val gb = sb.groupBy(col("bucket")).agg(sum(col("n_sb")).as("n_b"))
      val sources = sb.groupBy(col("source")).agg(sum(col("n_sb")).as("n_s"))
      val total = sources.agg(sum(col("n_s")).as("n_tot"))
      val grid = sources.crossJoin(broadcast(gb))
        .join(sb, Seq("source", "bucket"), "left_outer")
        .withColumn("n_sb", coalesce(col("n_sb"), lit(0L)))
      val cw = Window.partitionBy(col("source")).orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid
        .withColumn("cum_s", sum(col("n_sb")).over(cw))
        .withColumn("cum_b", sum(col("n_b")).over(cw))
        .crossJoin(broadcast(total))
        .withColumn("n_r", col("n_tot") - col("n_s"))
        .withColumn("gap", abs(
          col("cum_s").cast("double") / col("n_s").cast("double") -
            (col("cum_b") - col("cum_s")).cast("double") / col("n_r").cast("double")))
        .groupBy(col("source"), col("n_s"), col("n_r"))
        .agg(max(col("gap")).as("ks_d"))
        .orderBy("source")
    } {
      """WITH sb AS (
        |  SELECT source, n_chars // 50 AS bucket, COUNT(*) AS n_sb
        |  FROM documents GROUP BY 1, 2),
        |gb AS (SELECT bucket, CAST(SUM(n_sb) AS BIGINT) AS n_b FROM sb GROUP BY 1),
        |src AS (SELECT source, CAST(SUM(n_sb) AS BIGINT) AS n_s FROM sb GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n_s) AS BIGINT) AS n_tot FROM src),
        |grid AS (
        |  SELECT src.source, src.n_s, gb.bucket, gb.n_b,
        |    COALESCE(sb.n_sb, 0) AS n_sb
        |  FROM src CROSS JOIN gb
        |  LEFT JOIN sb ON sb.source = src.source AND sb.bucket = gb.bucket),
        |c AS (
        |  SELECT source, n_s, bucket,
        |    CAST(SUM(n_sb) OVER (PARTITION BY source ORDER BY bucket
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_s,
        |    CAST(SUM(n_b) OVER (PARTITION BY source ORDER BY bucket
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_b
        |  FROM grid)
        |SELECT source, n_s, n_tot - n_s AS n_r,
        |  MAX(ABS(CAST(cum_s AS DOUBLE) / CAST(n_s AS DOUBLE)
        |    - CAST(cum_b - cum_s AS DOUBLE) / CAST(n_tot - n_s AS DOUBLE))) AS ks_d
        |FROM c, tot
        |GROUP BY source, n_s, n_tot
        |ORDER BY source""".stripMargin
    },

    // ------------------------------------------------------------------
    // q125: KMV (k-minimum-values) DISTINCT-SET SKETCH with mergeable
    // union/intersection estimates — the "audience overlap between
    // segments without an exact distinct-join" operator (Beyer et al.,
    // SIGMOD'07 / the theta-sketch family's bottom-k core). Per segment
    // the sketch is the k smallest values of the library's md5 id-hash;
    // distinct ≈ (k−1)·2³²/h_k. A pair's union sketch is the k smallest
    // of the merged sketches, and — because h ∈ KMV(A∪B) ∧ h ∈ A implies
    // h ∈ KMV(A) (A's k-th-smallest threshold is ≥ the union's) — the
    // Jaccard numerator needs only k-sized sketch joins, never the
    // underlying sets: |A∩B| ≈ (|{h ∈ KMV(A∪B): h ∈ KMV(A) ∧ h ∈
    // KMV(B)}| / |KMV(A∪B)|) · est(A∪B). Sets below k report exactly.
    //
    // UNLIKE an HLL, every step is deterministic given the hash — the k-th
    // order statistic, integer counts, one IEEE division — so the
    // ESTIMATES THEMSELVES hash-match the oracle (q105's gate-boolean
    // indirection is unnecessary); the in-band booleans just document the
    // accuracy contract (k=256 → rse ≈ 1/√(k−2) ≈ 6%; bands are 3σ-ish
    // fixed constants measured across the fixture SFs). Exact anchors
    // count the hashed universe the sketch sees (2³² space: collisions
    // are ≪1 per segment below ~10⁵ ids; at larger universes widen the
    // hash, not the band).
    //
    // Shape at 100 TB: one distinct-agg on (segment, h) — the only
    // corpus-scale shuffle — then per-segment bottom-k via the map-side
    // partial WindowGroupLimit; every relation after that is O(k·
    // segments²) and broadcast. The exact-intersection anchor is a
    // hash-keyed equi-join of the distinct relation with itself (output
    // bounded by segments² per h) — the thing the sketch exists to
    // avoid, priced here as the validation anchor.
    QueryDef.sql("q125_kmv_set_sketch") { (s, d) =>
      val ev = Tables(s, d, "events")
      // element = active user-DAY (user_id:date): segments then overlap
      // partially (Jaccard ≈ 0.2 on the fixtures) instead of sharing one
      // user universe, so the intersection estimate is non-trivial
      val elem = "concat(cast(user_id AS string), ':', cast(to_date(ts) AS string))"
      val segs = ev.select(col("event_type"), graft.Ids.hash(elem).as("h")).distinct()
      val exact = segs.groupBy(col("event_type")).agg(count(lit(1)).as("n_exact"))
      val wk = Window.partitionBy(col("event_type")).orderBy(col("h"))
      val sk = segs.withColumn("rnk", row_number().over(wk)).filter(col("rnk") <= KmvK)
        .select(col("event_type"), col("h"))
      val skStats = sk.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_sk"), max(col("h")).as("hk"))
      val pairs = exact
        .select(col("event_type").as("seg_a"), col("n_exact").as("n_exact_a"))
        .crossJoin(broadcast(exact
          .select(col("event_type").as("seg_b"), col("n_exact").as("n_exact_b"))))
        .filter(col("seg_a") < col("seg_b"))
      val uh = pairs.select("seg_a", "seg_b")
        .join(sk, col("event_type") === col("seg_a") || col("event_type") === col("seg_b"))
        .select(col("seg_a"), col("seg_b"), col("h")).distinct()
      val wu = Window.partitionBy(col("seg_a"), col("seg_b")).orderBy(col("h"))
      val usk = uh.withColumn("rnk", row_number().over(wu)).filter(col("rnk") <= KmvK)
        .select("seg_a", "seg_b", "h")
      val um = usk
        .join(sk.select(col("event_type").as("seg_a"), col("h"), lit(1).as("in_a")),
          Seq("seg_a", "h"), "left")
        .join(sk.select(col("event_type").as("seg_b"), col("h"), lit(1).as("in_b")),
          Seq("seg_b", "h"), "left")
        .groupBy(col("seg_a"), col("seg_b"))
        .agg(count(lit(1)).as("n_usk"), max(col("h")).as("hk_u"),
          count(when(col("in_a").isNotNull && col("in_b").isNotNull, 1)).as("n_both"))
      val inter = segs.select(col("event_type").as("seg_a"), col("h"))
        .join(segs.select(col("event_type").as("seg_b"), col("h")), Seq("h"))
        .filter(col("seg_a") < col("seg_b"))
        .groupBy(col("seg_a"), col("seg_b")).agg(count(lit(1)).as("n_inter_nn"))
      pairs
        .join(broadcast(skStats.select(col("event_type").as("seg_a"),
          col("n_sk").as("n_sk_a"), col("hk").as("hk_a"))), Seq("seg_a"))
        .join(broadcast(skStats.select(col("event_type").as("seg_b"),
          col("n_sk").as("n_sk_b"), col("hk").as("hk_b"))), Seq("seg_b"))
        .join(broadcast(um), Seq("seg_a", "seg_b"))
        .join(broadcast(inter), Seq("seg_a", "seg_b"), "left")
        .withColumn("n_exact_inter", coalesce(col("n_inter_nn"), lit(0L)))
        .withColumn("n_exact_union",
          col("n_exact_a") + col("n_exact_b") - col("n_exact_inter"))
        .withColumn("est_a", expr(kmvEst("n_sk_a", "hk_a")))
        .withColumn("est_b", expr(kmvEst("n_sk_b", "hk_b")))
        .withColumn("est_union", expr(kmvEst("n_usk", "hk_u")))
        .withColumn("est_inter", expr(
          "(CAST(n_both AS DOUBLE) / CAST(n_usk AS DOUBLE)) * est_union"))
        .select(col("seg_a"), col("seg_b"),
          col("n_exact_a"), col("n_exact_b"), col("n_exact_inter"), col("n_exact_union"),
          col("est_a"), col("est_b"), col("est_union"), col("est_inter"),
          expr(kmvBand("est_a", "n_exact_a", "0.25")).as("a_in_band"),
          expr(kmvBand("est_b", "n_exact_b", "0.25")).as("b_in_band"),
          expr(kmvBand("est_union", "n_exact_union", "0.25")).as("union_in_band"),
          expr(kmvBand("est_inter", "n_exact_inter", "0.40")).as("inter_in_band"))
        .orderBy("seg_a", "seg_b")
    } {
      s"""WITH segs AS (
         |  SELECT DISTINCT event_type, ${graft.Ids.hashSql(
        "CAST(user_id AS VARCHAR) || ':' || CAST(CAST(ts AS DATE) AS VARCHAR)")} AS h
         |  FROM events),
         |ex AS (SELECT event_type, COUNT(*) AS n_exact FROM segs GROUP BY event_type),
         |sk AS (
         |  SELECT event_type, h FROM (
         |    SELECT event_type, h,
         |      ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rnk
         |    FROM segs) WHERE rnk <= ${Stats.KmvK}),
         |skst AS (
         |  SELECT event_type, COUNT(*) AS n_sk, MAX(h) AS hk FROM sk
         |  GROUP BY event_type),
         |pairs AS (
         |  SELECT a.event_type AS seg_a, a.n_exact AS n_exact_a,
         |         b.event_type AS seg_b, b.n_exact AS n_exact_b
         |  FROM ex a JOIN ex b ON a.event_type < b.event_type),
         |uh AS (
         |  SELECT DISTINCT p.seg_a, p.seg_b, s.h
         |  FROM pairs p JOIN sk s
         |    ON s.event_type = p.seg_a OR s.event_type = p.seg_b),
         |usk AS (
         |  SELECT seg_a, seg_b, h FROM (
         |    SELECT seg_a, seg_b, h,
         |      ROW_NUMBER() OVER (PARTITION BY seg_a, seg_b ORDER BY h) AS rnk
         |    FROM uh) WHERE rnk <= ${Stats.KmvK}),
         |um AS (
         |  SELECT u.seg_a, u.seg_b, COUNT(*) AS n_usk, MAX(u.h) AS hk_u,
         |    COUNT(*) FILTER (WHERE a.h IS NOT NULL AND b.h IS NOT NULL) AS n_both
         |  FROM usk u
         |  LEFT JOIN sk a ON a.event_type = u.seg_a AND a.h = u.h
         |  LEFT JOIN sk b ON b.event_type = u.seg_b AND b.h = u.h
         |  GROUP BY u.seg_a, u.seg_b),
         |inter AS (
         |  SELECT a.event_type AS seg_a, b.event_type AS seg_b, COUNT(*) AS n_inter
         |  FROM segs a JOIN segs b ON a.h = b.h AND a.event_type < b.event_type
         |  GROUP BY 1, 2),
         |est AS (
         |  SELECT p.seg_a, p.seg_b, p.n_exact_a, p.n_exact_b,
         |    COALESCE(i.n_inter, 0) AS n_exact_inter,
         |    p.n_exact_a + p.n_exact_b - COALESCE(i.n_inter, 0) AS n_exact_union,
         |    ${Stats.kmvEst("sa.n_sk", "sa.hk")} AS est_a,
         |    ${Stats.kmvEst("sb.n_sk", "sb.hk")} AS est_b,
         |    ${Stats.kmvEst("um.n_usk", "um.hk_u")} AS est_union,
         |    um.n_both, um.n_usk
         |  FROM pairs p
         |  JOIN skst sa ON sa.event_type = p.seg_a
         |  JOIN skst sb ON sb.event_type = p.seg_b
         |  JOIN um ON um.seg_a = p.seg_a AND um.seg_b = p.seg_b
         |  LEFT JOIN inter i ON i.seg_a = p.seg_a AND i.seg_b = p.seg_b),
         |est2 AS (
         |  SELECT *,
         |    (CAST(n_both AS DOUBLE) / CAST(n_usk AS DOUBLE)) * est_union AS est_inter
         |  FROM est)
         |SELECT seg_a, seg_b,
         |  CAST(n_exact_a AS BIGINT) AS n_exact_a,
         |  CAST(n_exact_b AS BIGINT) AS n_exact_b,
         |  CAST(n_exact_inter AS BIGINT) AS n_exact_inter,
         |  CAST(n_exact_union AS BIGINT) AS n_exact_union,
         |  est_a, est_b, est_union, est_inter,
         |  ${Stats.kmvBand("est_a", "n_exact_a", "0.25")} AS a_in_band,
         |  ${Stats.kmvBand("est_b", "n_exact_b", "0.25")} AS b_in_band,
         |  ${Stats.kmvBand("est_union", "n_exact_union", "0.25")} AS union_in_band,
         |  ${Stats.kmvBand("est_inter", "n_exact_inter", "0.40")} AS inter_in_band
         |FROM est2
         |ORDER BY seg_a, seg_b""".stripMargin
    },

    // ------------------------------------------------------------------
    // q174: SEQUENCE-GAP AUDIT — every missing id range in the fact
    // table's order-key sequence (gap start/end/size): the
    // lost-ingestion detector for tables whose keys are supposed to
    // arrive from a sequence (on this corpus it correctly reports the
    // ~257 order keys that never reached lineitem). DISTRIBUTED islands:
    // island boundaries come from two keyed ANTI joins (k present,
    // k±1 absent — shuffles on the key, never a global sort of the
    // table), and only the BOUNDARY relation is globally ranked, via
    // the two-pass Scale.globalRowNumber (range-partitioned, no
    // single-task window even when boundaries are corpus-sized, as
    // sparse key spaces make them). Gap i pairs end-rank i with
    // start-rank i+1 — one keyed join on the rank. All-integer output.
    QueryDef.sql("q174_sequence_gaps") { (s, d) =>
      val keys = graft.Checkpoints.checkpointLazy(
        Tables(s, d, "lineitem").select(col("l_orderkey").as("k")).distinct())
      // island end: k present, k+1 absent  <=>  k not in (keys - 1)
      val ends = keys.join(keys.select((col("k") - 1).as("k")), Seq("k"), "left_anti")
      // island start: k present, k-1 absent  <=>  k not in (keys + 1)
      val starts = keys.join(keys.select((col("k") + 1).as("k")), Seq("k"), "left_anti")
      val er = graft.ops.Scale.globalRowNumber(ends, "r", col("k").asc)
        .select(col("k").as("before_gap"), col("r"))
      val sr = graft.ops.Scale.globalRowNumber(starts, "r2", col("k").asc)
        .select(col("k").as("after_gap"), col("r2"))
      er.join(sr, col("r2") === col("r") + 1)
        .select((col("before_gap") + 1).as("gap_start"),
          (col("after_gap") - 1).as("gap_end"),
          (col("after_gap") - col("before_gap") - 1).as("n_missing"))
        .orderBy("gap_start")
    } {
      """WITH k AS (SELECT DISTINCT l_orderkey AS k FROM lineitem),
        |g AS (SELECT k, LEAD(k) OVER (ORDER BY k) AS nk FROM k)
        |SELECT k + 1 AS gap_start, nk - 1 AS gap_end,
        |  nk - k - 1 AS n_missing
        |FROM g WHERE nk > k + 1
        |ORDER BY gap_start""".stripMargin
    },

    // ------------------------------------------------------------------
    // q177: K-ANONYMITY AUDIT — group the customer table by its
    // quasi-identifiers (nation, market segment, account-balance
    // kilo-band) and report, per nation, how exposed the equivalence
    // classes are: classes below k = 5 members re-identify their rows
    // (the governance gate run before any "anonymized" export). One
    // keyed aggregation to class sizes, one shrinking rollup to the
    // nation report — exact integers end-to-end; the balance band is a
    // single double division + floor, bit-identical on both engines.
    QueryDef.sql("q177_k_anonymity") { (s, d) =>
      val classes = Tables(s, d, "customer")
        .select(col("c_nationkey"), col("c_mktsegment"),
          expr("CAST(FLOOR(c_acctbal / 1000) AS BIGINT)").as("bal_band"))
        .groupBy(col("c_nationkey"), col("c_mktsegment"), col("bal_band"))
        .agg(count(lit(1)).as("sz"))
      classes.groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_classes"),
          sum(when(col("sz") < 5, 1L).otherwise(0L)).as("n_small_classes"),
          sum(when(col("sz") < 5, col("sz")).otherwise(0L)).as("n_rows_at_risk"),
          min(col("sz")).as("min_class_size"))
        .orderBy("c_nationkey")
    } {
      """WITH cls AS (
        |  SELECT c_nationkey, c_mktsegment,
        |    CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_band,
        |    COUNT(*) AS sz
        |  FROM customer GROUP BY 1, 2, 3)
        |SELECT c_nationkey,
        |  COUNT(*) AS n_classes,
        |  CAST(SUM(CASE WHEN sz < 5 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_small_classes,
        |  CAST(SUM(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT)
        |    AS n_rows_at_risk,
        |  MIN(sz) AS min_class_size
        |FROM cls GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin
    },

    // ------------------------------------------------------------------
    // q179: WINSORIZED MEAN — per-language mean document length with the
    // global 5%/95% tails clipped to the cut values (winsorization: the
    // outlier-robust mean that, unlike trimming, keeps every row's
    // vote). Cuts are pure ORDER STATISTICS — the value at global rank
    // ceil(p·n) — not interpolated quantiles, so the whole query is
    // integer-exact end-to-end (interpolation weights at p=0.05 are not
    // binary-representable; rank picks are). Ranks come from the
    // two-pass Scale.globalRowNumber frozen range shuffle (no
    // single-task sort); the two cut values collapse to ONE broadcast
    // row, so the clipping pass is a map-side scan. ceil(p·n) is one
    // shared IEEE multiply — bit-identical on both engines.
    QueryDef.sql("q179_winsorized_mean") { (s, d) =>
      val docs = Tables(s, d, "documents").select(col("lang"), col("n_chars"))
      val ranked = Scale.globalRowNumber(
        docs.select(col("n_chars").as("v")), "r", col("v").asc)
      val tot = ranked.agg(count(lit(1)).as("n"))
      val cuts = ranked.crossJoin(broadcast(tot))
        .agg(
          min(when(col("r") === expr("CAST(CEIL(0.05 * n) AS BIGINT)"),
            col("v"))).as("lo"),
          min(when(col("r") === expr("CAST(CEIL(0.95 * n) AS BIGINT)"),
            col("v"))).as("hi"))
      docs.crossJoin(broadcast(cuts))
        .withColumn("w", least(greatest(col("n_chars"), col("lo")), col("hi")))
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("n_chars") < col("lo"), 1L)
            .when(col("n_chars") > col("hi"), 1L).otherwise(0L)).as("n_clipped"),
          (sum(col("n_chars")).cast("double") / count(lit(1))).as("mean_raw"),
          (sum(col("w")).cast("double") / count(lit(1))).as("mean_winsorized"))
        .orderBy("lang")
    } {
      """WITH ranked AS (
        |  SELECT n_chars AS v,
        |    ROW_NUMBER() OVER (ORDER BY n_chars) AS r
        |  FROM documents),
        |tot AS (SELECT COUNT(*) AS n FROM documents),
        |cuts AS (
        |  SELECT
        |    MIN(CASE WHEN r = CAST(CEIL(0.05 * n) AS BIGINT) THEN v END) AS lo,
        |    MIN(CASE WHEN r = CAST(CEIL(0.95 * n) AS BIGINT) THEN v END) AS hi
        |  FROM ranked, tot)
        |SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN n_chars < lo OR n_chars > hi THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_clipped,
        |  CAST(CAST(SUM(n_chars) AS BIGINT) AS DOUBLE) / COUNT(*) AS mean_raw,
        |  CAST(CAST(SUM(LEAST(GREATEST(n_chars, lo), hi)) AS BIGINT) AS DOUBLE)
        |    / COUNT(*) AS mean_winsorized
        |FROM documents, cuts
        |GROUP BY lang ORDER BY lang""".stripMargin
    },

    // ------------------------------------------------------------------
    // q180: GINI CONCENTRATION — per order priority, the Gini
    // coefficient of order value: the inequality/concentration audit
    // behind "do a few whale orders carry this segment?" (q100 measures
    // source concentration by HHI; Gini is the size-invariant
    // complement). Closed form on sorted values: G = (2·Σ rᵢxᵢ − (n+1)·
    // Σxᵢ) / (n·Σxᵢ) with ranks ascending — rank ties on equal x leave
    // the sums invariant, so the per-group row_number needs no
    // engine-aligned tie-break. Both sums accumulate exactly in
    // decimal(38)/HUGEINT (r·x overflows int64 at warehouse row
    // counts), and the single terminal division runs on correctly-
    // rounded casts (oracle routes wide ints through VARCHAR — the q154
    // lesson). One keyed window + one keyed agg on the priority key.
    // Bound audit (round 11): Σ r·x ≤ n²·max(x); at 1.5e11 orders
    // (~3e10 per priority) and 1e7 max cents that is ~9e27 — ten orders
    // of magnitude under 10³⁸; no shift path needed.
    QueryDef.sql("q180_gini_concentration") { (s, d) =>
      val wide = org.apache.spark.sql.types.DecimalType(38, 0)
      // two-pass grouped rank (Scale.groupedRank): 5 priorities would
      // cap a plain keyed window at 5 tasks over the full orders table
      graft.ops.Scale.groupedRank(
        Tables(s, d, "orders")
          .select(col("o_orderpriority").as("prio"), col("o_orderkey"),
            expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").as("xc")),
        Seq("prio"), "r", None, col("xc"), col("o_orderkey"))
        .groupBy(col("prio"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(col("xc").cast(wide)).as("s"),
          sum((col("r").cast(wide) * col("xc")).cast(wide)).as("s1"))
        .select(col("prio"), col("n_orders"),
          (col("s").cast("double") / lit(100.0)).as("total_value"),
          ((lit(2).cast(wide) * col("s1") -
            (col("n_orders") + 1).cast(wide) * col("s")).cast("double") /
            (col("n_orders").cast(wide) * col("s")).cast("double")).as("gini"))
        .orderBy("prio")
    } {
      """WITH v AS (
        |  SELECT o_orderpriority AS prio, o_orderkey,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS xc
        |  FROM orders),
        |rk AS (
        |  SELECT prio, xc,
        |    ROW_NUMBER() OVER (PARTITION BY prio
        |      ORDER BY xc, o_orderkey) AS r
        |  FROM v),
        |agg AS (
        |  SELECT prio, COUNT(*) AS n_orders,
        |    SUM(CAST(xc AS HUGEINT)) AS s,
        |    SUM(CAST(r AS HUGEINT) * xc) AS s1
        |  FROM rk GROUP BY prio)
        |SELECT prio, n_orders,
        |  CAST(CAST(s AS VARCHAR) AS DOUBLE) / 100.0 AS total_value,
        |  CAST(CAST(2 * s1 - (n_orders + 1) * s AS VARCHAR) AS DOUBLE)
        |    / CAST(CAST(n_orders * s AS VARCHAR) AS DOUBLE) AS gini
        |FROM agg ORDER BY prio""".stripMargin
    },

    // ------------------------------------------------------------------
    // q183: ABC / PARETO CLASSIFICATION — every part banded by its
    // cumulative share of corpus revenue in descending-revenue order
    // (A: the head reaching 80%, B: to 95%, C: the tail) — the
    // inventory-policy / storage-tiering primitive behind "which 20% of
    // items earn 80% of revenue". Revenue is exact scale-4 integer
    // cents⁴ per part, half-up-rounded to whole cents by INTEGER
    // arithmetic ((x+50) div 100 — never a float round), and the
    // cumulative sum over (revenue DESC, partkey) is
    // Scale.globalOrderedCumsum's two-pass frozen range shuffle — the
    // CDF shape with no single-task window. Band tests are integer
    // cross-multiplications (cum·100 ≤ 80·total), exact at any scale
    // where the int64 cumsum contract holds (whole-cents corpus revenue
    // < 2^63 — ~9e16 dollars; scale-4 would not survive 100 TB, which
    // is WHY the cumsum runs on cents).
    QueryDef.sql("q183_abc_classification") { (s, d) =>
      val rev = Tables(s, d, "lineitem")
        .select(col("l_partkey"),
          (expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)") *
            expr("CAST(100 - ROUND(l_discount * 100) AS BIGINT)")).as("rev4"))
        .groupBy(col("l_partkey"))
        .agg(sum(col("rev4")).as("rev4"))
        .select(col("l_partkey"),
          expr("CAST((rev4 + 50) DIV 100 AS BIGINT)").as("cents"))
      val cum = Scale.globalOrderedCumsum(rev, "cents", "cum", "rnk",
        col("cents").desc, col("l_partkey").asc)
      val tot = cum.agg(max(col("cum")).as("total"))
      cum.crossJoin(broadcast(tot))
        .withColumn("band",
          when(col("cum") * 100 <= col("total") * 80, "A")
            .when(col("cum") * 100 <= col("total") * 95, "B")
            .otherwise("C"))
        .groupBy(col("band"))
        .agg(
          count(lit(1)).as("n_parts"),
          sum(col("cents")).as("band_cents"))
        .crossJoin(broadcast(tot))
        .select(col("band"), col("n_parts"), col("band_cents"),
          (col("band_cents").cast("double") / col("total").cast("double"))
            .as("revenue_share"))
        .orderBy("band")
    } {
      """WITH rev AS (
        |  SELECT l_partkey,
        |    CAST((SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
        |      * CAST(100 - ROUND(l_discount * 100) AS BIGINT)) + 50) // 100
        |      AS BIGINT) AS cents
        |  FROM lineitem GROUP BY l_partkey),
        |cum AS (
        |  SELECT l_partkey, cents,
        |    CAST(SUM(cents) OVER (ORDER BY cents DESC, l_partkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum
        |  FROM rev),
        |tot AS (SELECT MAX(cum) AS total FROM cum),
        |banded AS (
        |  SELECT cents,
        |    CASE WHEN cum * 100 <= total * 80 THEN 'A'
        |      WHEN cum * 100 <= total * 95 THEN 'B'
        |      ELSE 'C' END AS band
        |  FROM cum, tot)
        |SELECT band, COUNT(*) AS n_parts,
        |  CAST(SUM(cents) AS BIGINT) AS band_cents,
        |  CAST(CAST(SUM(cents) AS BIGINT) AS DOUBLE)
        |    / CAST(total AS DOUBLE) AS revenue_share
        |FROM banded, tot
        |GROUP BY band, total ORDER BY band""".stripMargin
    },

    // ------------------------------------------------------------------
    // q195: CUSUM CHANGE-POINT SCAN — per priority, the one-sided CUSUM
    // of daily order counts against the series' own mean: the standard
    // "when did the level shift" detector (Page, Biometrika'54) behind
    // volume-drop/spike alerts, where per-day z-scores (q87) miss slow
    // drifts that ACCUMULATE. The sequential recurrence S_t = max(0,
    // S_{t−1} + dev_t) is not a window function — but it has a closed
    // running-min identity: S_t = P_t − min_{j≤t} P_j over the prefix
    // sums P of the deviations. INTEGER EXACTNESS: deviations are
    // n-scaled (n·c_t − total removes the rational mean), so P, the
    // running min, and every S are exact int64 end-to-end; the one
    // division (S/n, back to order units) happens at output. Two
    // priority-keyed windows over the q165 dense grid — the fact table
    // is scanned once.
    QueryDef.sql("q195_cusum_changepoint") { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val daily = Tables(s, d, "orders")
        .select(col("o_orderpriority").as("prio"),
          expr("CAST(datediff(o_orderdate, DATE '1992-01-01') AS BIGINT)").as("day"))
        .groupBy(col("prio"), col("day"))
        .agg(count(lit(1)).as("n"))
      val span = daily.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      val grid = span.select(explode(expr("sequence(lo, hi)")).as("day"))
        .crossJoin(daily.select(col("prio")).distinct())
      val filled = grid.join(daily, Seq("prio", "day"), "left_outer")
        .withColumn("c", coalesce(col("n"), lit(0L)))
      val stats = filled.groupBy(col("prio"))
        .agg(count(lit(1)).as("nd"), sum(col("c")).as("total"))
      val wRun = Window.partitionBy(col("prio")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, 0)
      filled.join(broadcast(stats), "prio")
        .withColumn("p", sum(col("c") * col("nd") - col("total")).over(wRun))
        .withColumn("s", col("p") - min(col("p")).over(wRun))
        .groupBy(col("prio"))
        .agg(
          max(col("nd")).as("n_days"),
          sum(when(col("s") > col("nd") * 10, 1L).otherwise(0L))
            .as("n_alert_days"),
          (max(col("s")).cast("double") / max(col("nd")).cast("double"))
            .as("max_cusum"))
        .orderBy("prio")
    } {
      """WITH daily AS (
        |  SELECT o_orderpriority AS prio,
        |    CAST(DATEDIFF('day', DATE '1992-01-01',
        |      CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
        |    COUNT(*) AS n
        |  FROM orders GROUP BY 1, 2),
        |span AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM daily),
        |grid AS (
        |  SELECT p.prio, g.day
        |  FROM (SELECT DISTINCT prio FROM daily) p,
        |    (SELECT UNNEST(GENERATE_SERIES(lo, hi)) AS day FROM span) g),
        |filled AS (
        |  SELECT g.prio, g.day, COALESCE(d.n, 0) AS c
        |  FROM grid g LEFT JOIN daily d ON g.prio = d.prio AND g.day = d.day),
        |st AS (
        |  SELECT prio, COUNT(*) AS nd, CAST(SUM(c) AS BIGINT) AS total
        |  FROM filled GROUP BY prio),
        |pfx AS (
        |  SELECT f.prio, f.day, nd,
        |    CAST(SUM(f.c * st.nd - st.total) OVER (PARTITION BY f.prio
        |      ORDER BY f.day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS p
        |  FROM filled f JOIN st ON f.prio = st.prio),
        |cusum AS (
        |  SELECT prio, nd,
        |    p - MIN(p) OVER (PARTITION BY prio ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
        |  FROM pfx)
        |SELECT prio, MAX(nd) AS n_days,
        |  CAST(SUM(CASE WHEN s > nd * 10 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_alert_days,
        |  CAST(MAX(s) AS DOUBLE) / CAST(MAX(nd) AS DOUBLE) AS max_cusum
        |FROM cusum GROUP BY prio
        |ORDER BY prio""".stripMargin
    },

    // ------------------------------------------------------------------
    // q197: FUNCTIONAL-DEPENDENCY AUDIT — does column A determine column
    // B? Checked for a dependency the star schema PROMISES (nation →
    // region, must hold) and one it does NOT (part → supplier: TPC-H
    // multi-sources every part), reporting keys, violating keys, and
    // the worst fan-out. This is the schema-inference/data-contract
    // primitive: a violated promised FD is an upstream corruption page.
    // Shape: one (A)-keyed two-level aggregation per declared edge
    // (distinct B per A — the q117 posture, never a global distinct);
    // the audit relation is edge-count-sized. Exact integers; one
    // terminal division.
    QueryDef.sql("q197_fd_audit") { (s, d) =>
      def audit(df: DataFrame, fd: String, a: String, b: String): DataFrame =
        df.groupBy(col(a)).agg(countDistinct(col(b)).as("nb"))
          .agg(
            count(lit(1)).as("n_keys"),
            sum(when(col("nb") > 1, 1L).otherwise(0L)).as("n_violating"),
            max(col("nb")).as("max_fanout"))
          .select(lit(fd).as("fd"), col("n_keys"), col("n_violating"),
            col("max_fanout"),
            (col("n_violating").cast("double") / col("n_keys").cast("double"))
              .as("violation_rate"))
      audit(Tables(s, d, "nation"), "nation->region",
          "n_nationkey", "n_regionkey")
        .unionAll(audit(Tables(s, d, "lineitem"), "part->supplier",
          "l_partkey", "l_suppkey"))
        .orderBy("fd")
    } {
      """WITH n1 AS (
        |  SELECT n_nationkey AS a, COUNT(DISTINCT n_regionkey) AS nb
        |  FROM nation GROUP BY 1),
        |e1 AS (
        |  SELECT 'nation->region' AS fd, COUNT(*) AS n_keys,
        |    CAST(SUM(CASE WHEN nb > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_violating,
        |    MAX(nb) AS max_fanout
        |  FROM n1),
        |n2 AS (
        |  SELECT l_partkey AS a, COUNT(DISTINCT l_suppkey) AS nb
        |  FROM lineitem GROUP BY 1),
        |e2 AS (
        |  SELECT 'part->supplier' AS fd, COUNT(*) AS n_keys,
        |    CAST(SUM(CASE WHEN nb > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_violating,
        |    MAX(nb) AS max_fanout
        |  FROM n2),
        |u AS (SELECT * FROM e1 UNION ALL SELECT * FROM e2)
        |SELECT fd, n_keys, n_violating, max_fanout,
        |  CAST(n_violating AS DOUBLE) / CAST(n_keys AS DOUBLE)
        |    AS violation_rate
        |FROM u ORDER BY fd""".stripMargin
    },

    // ------------------------------------------------------------------
    // q201: JOIN-CARDINALITY ESTIMATOR AUDIT — the planner primitive
    // behind every join-order/broadcast decision: estimate |R ⋈ R| on
    // l_partkey from a 100-bucket MCV histogram (the PostgreSQL/Catalyst
    // statistics model: exact mass for the top-100 heavy keys, uniform
    // spread for the tail) and compare to the EXACT self-join size
    // Σ_k c_k² (the second frequency moment). Reports both plus the
    // relative error — drift here is how a stats-stale catalog starts
    // choosing wrong plans. DETERMINISM: MCV selection orders by
    // (count DESC, key); every sum is exact int64 (c_k ≤ fan-out per
    // part, Σc_k² ≪ 2^63 while max fan-out √(9e18/d) — thousands at
    // TPC-H shape); the tail estimate is one double divide at the end.
    // SCALE SHAPE: one keyed count agg, a TakeOrdered(100) for the MCV
    // set (no global sort), two shrinking scans of the counts relation,
    // 1-row broadcast combine.
    QueryDef.sql("q201_join_size_estimate") { (s, d) =>
      val counts = Tables(s, d, "lineitem")
        .groupBy(col("l_partkey")).agg(count(lit(1)).as("c"))
      val mcv = counts.orderBy(col("c").desc, col("l_partkey")).limit(100)
      val mcvAgg = mcv.agg(
        sum(col("c") * col("c")).as("mcv_sq"),
        sum(col("c")).as("mcv_n"),
        count(lit(1)).as("mcv_d"))
      val allAgg = counts.agg(
        sum(col("c") * col("c")).as("exact_size"),
        sum(col("c")).as("n_rows"),
        count(lit(1)).as("n_distinct"))
      allAgg.crossJoin(broadcast(mcvAgg))
        .select(
          col("n_rows"), col("n_distinct"), col("exact_size"),
          (col("mcv_sq").cast("double") +
            when(col("n_distinct") > col("mcv_d"),
              ((col("n_rows") - col("mcv_n")) *
                (col("n_rows") - col("mcv_n"))).cast("double") /
                (col("n_distinct") - col("mcv_d")).cast("double"))
              .otherwise(0.0)).as("est_size"))
        .withColumn("rel_err",
          abs(col("est_size") - col("exact_size").cast("double")) /
            col("exact_size").cast("double"))
    } {
      """WITH counts AS (
        |  SELECT l_partkey, COUNT(*) AS c FROM lineitem GROUP BY 1),
        |mcv AS (
        |  SELECT c FROM counts ORDER BY c DESC, l_partkey LIMIT 100),
        |m AS (
        |  SELECT CAST(SUM(c * c) AS BIGINT) AS mcv_sq,
        |    CAST(SUM(c) AS BIGINT) AS mcv_n, COUNT(*) AS mcv_d
        |  FROM mcv),
        |a AS (
        |  SELECT CAST(SUM(c * c) AS BIGINT) AS exact_size,
        |    CAST(SUM(c) AS BIGINT) AS n_rows, COUNT(*) AS n_distinct
        |  FROM counts),
        |e AS (
        |  SELECT n_rows, n_distinct, exact_size,
        |    CAST(mcv_sq AS DOUBLE) +
        |      CASE WHEN n_distinct > mcv_d
        |        THEN CAST((n_rows - mcv_n) * (n_rows - mcv_n) AS DOUBLE)
        |          / CAST(n_distinct - mcv_d AS DOUBLE)
        |        ELSE 0.0 END AS est_size
        |  FROM a, m)
        |SELECT n_rows, n_distinct, exact_size, est_size,
        |  ABS(est_size - CAST(exact_size AS DOUBLE))
        |    / CAST(exact_size AS DOUBLE) AS rel_err
        |FROM e""".stripMargin
    },

    // ------------------------------------------------------------------
    // q205: INCREMENTAL-VIEW-MAINTENANCE AUDIT — the delta-merge
    // contract behind every materialized aggregate: partition the fact
    // stream at a cutoff into base and delta, maintain the view by
    // COMBINING PARTIALS (counts add; DECIMAL sums add exactly —
    // decimal addition is associative, unlike double), and prove the
    // maintained view equals a full recompute, including the classic
    // non-mergeable case done right (avg is re-derived from merged
    // sum/count, never averaged-of-averages). The agree flags are the
    // audit's point: a 0 in production means the incremental pipeline
    // dropped or double-applied a delta. SCALE SHAPE: two
    // predicate-disjoint keyed aggs + one keyed recompute agg, joined
    // on the (small) group key — the fact table is scanned twice only
    // because the audit DEMANDS an independent full recompute; the
    // production path is the partial-merge leg alone.
    QueryDef.sql("q205_incremental_agg_maintenance") { (s, d) =>
      import org.apache.spark.sql.types.DecimalType
      val D = DecimalType(18, 6)
      val ev = Tables(s, d, "events")
        .select(col("event_type").as("etype"),
          col("ts").cast("timestamp").as("ts"), col("value"))
      val cutoff = lit("2024-01-16").cast("timestamp")
      def part(p: DataFrame, tag: String): DataFrame =
        p.groupBy(col("etype")).agg(
          count(lit(1)).as(s"n_$tag"),
          sum(col("value").cast(D)).as(s"s_$tag"))
      val base = part(ev.filter(col("ts") < cutoff), "base")
      val delta = part(ev.filter(col("ts") >= cutoff), "delta")
      val full = ev.groupBy(col("etype")).agg(
        count(lit(1)).as("n_full"),
        sum(col("value").cast(D)).as("s_full"))
      base.join(delta, Seq("etype"), "full_outer")
        .select(col("etype"),
          (coalesce(col("n_base"), lit(0L)) +
            coalesce(col("n_delta"), lit(0L))).as("n_merged"),
          (coalesce(col("s_base"), lit(0).cast(D)) +
            coalesce(col("s_delta"), lit(0).cast(D))).as("s_merged"),
          coalesce(col("n_base"), lit(0L)).as("n_base"),
          coalesce(col("n_delta"), lit(0L)).as("n_delta"))
        .join(full, "etype")
        .select(col("etype"), col("n_base"), col("n_delta"),
          col("n_merged"), col("n_full"),
          col("s_full").cast("double").as("sum_full"),
          (col("s_merged").cast("double") /
            col("n_merged").cast("double")).as("avg_merged"),
          (col("s_full").cast("double") /
            col("n_full").cast("double")).as("avg_full"),
          when(col("n_merged") === col("n_full") &&
            col("s_merged") === col("s_full"), 1L).otherwise(0L)
            .as("agree"))
        .orderBy("etype")
    } {
      """WITH ev AS (
        |  SELECT event_type AS etype, CAST(ts AS TIMESTAMP) AS ts,
        |    CAST(value AS DECIMAL(18,6)) AS v
        |  FROM events),
        |b AS (
        |  SELECT etype, COUNT(*) AS n_base, SUM(v) AS s_base
        |  FROM ev WHERE ts < TIMESTAMP '2024-01-16' GROUP BY etype),
        |dl AS (
        |  SELECT etype, COUNT(*) AS n_delta, SUM(v) AS s_delta
        |  FROM ev WHERE ts >= TIMESTAMP '2024-01-16' GROUP BY etype),
        |f AS (
        |  SELECT etype, COUNT(*) AS n_full, SUM(v) AS s_full
        |  FROM ev GROUP BY etype),
        |m AS (
        |  SELECT COALESCE(b.etype, dl.etype) AS etype,
        |    COALESCE(n_base, 0) + COALESCE(n_delta, 0) AS n_merged,
        |    COALESCE(s_base, 0) + COALESCE(s_delta, 0) AS s_merged,
        |    COALESCE(n_base, 0) AS n_base, COALESCE(n_delta, 0) AS n_delta
        |  FROM b FULL OUTER JOIN dl ON b.etype = dl.etype)
        |SELECT m.etype, n_base, n_delta, n_merged, n_full,
        |  CAST(s_full AS DOUBLE) AS sum_full,
        |  CAST(s_merged AS DOUBLE) / CAST(n_merged AS DOUBLE) AS avg_merged,
        |  CAST(s_full AS DOUBLE) / CAST(n_full AS DOUBLE) AS avg_full,
        |  CAST(CASE WHEN n_merged = n_full AND s_merged = s_full
        |    THEN 1 ELSE 0 END AS BIGINT) AS agree
        |FROM m JOIN f ON m.etype = f.etype
        |ORDER BY m.etype""".stripMargin
    },

    // ------------------------------------------------------------------
    // q206: HAAR WAVELET SKETCH — the classic time-series compression /
    // similarity-index transform (Chan & Fu, ICDE'99): the monthly order
    // series, zero-padded to 128, decomposed into UNNORMALIZED Haar
    // coefficients (detail at level k = even-block sum − odd-block sum
    // of level k−1; DC term = the full-series total), keeping the top-8
    // by energy. Unnormalized keeps EVERYTHING exact int64 — no √2
    // factors, no division anywhere; ties in |detail| break by (level,
    // pos), so the kept set is deterministic. SCALE SHAPE: the fact
    // scan reduces to ≤ 128 rows in the first keyed agg; the seven
    // halving levels are keyed shrinking aggs over ≤ 64 rows each (at
    // billion-row facts the cost is the one scan — the pyramid is
    // noise). A longer horizon just deepens the pyramid
    // logarithmically.
    QueryDef.sql("q206_haar_sketch") { (s, d) =>
      val monthly = Tables(s, d, "orders")
        .select(expr(
          "CAST((year(o_orderdate) - 1992) * 12 + month(o_orderdate) - 1 AS BIGINT)")
          .as("pos"))
        .groupBy(col("pos")).agg(count(lit(1)).as("v"))
      var lvl = s.range(0, 128).toDF("pos")
        .join(monthly, Seq("pos"), "left_outer")
        .select(col("pos"), coalesce(col("v"), lit(0L)).as("v"))
      var details: DataFrame = null
      for (k <- 1 to 7) {
        val next = lvl
          .groupBy(expr("pos DIV 2").as("p"))
          .agg(sum(col("v")).as("v"),
            sum(when(pmod(col("pos"), lit(2L)) === 0, col("v"))
              .otherwise(-col("v"))).as("det"))
          .select(col("p").as("pos"), col("v"), col("det"))
        val dk = next.select(lit(k).as("level"), col("pos"),
          col("det").as("detail"))
        details = if (details == null) dk else details.unionAll(dk)
        lvl = next.select(col("pos"), col("v"))
      }
      val dc = lvl.select(lit(8).as("level"), col("pos"),
        col("v").as("detail"))
      val w = Window.orderBy(abs(col("detail")).desc, col("level"),
        col("pos"))
      details.unionAll(dc)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 8)
        .select(col("rn").cast("long").as("rn"), col("level").cast("long")
          .as("level"), col("pos"), col("detail"))
        .orderBy("rn")
    } {
      val levels = (1 to 7).map { k =>
        s"""l$k AS (
           |  SELECT pos // 2 AS pos, CAST(SUM(v) AS BIGINT) AS v,
           |    CAST(SUM(CASE WHEN pos % 2 = 0 THEN v ELSE -v END)
           |      AS BIGINT) AS det
           |  FROM l${k - 1} GROUP BY pos // 2)""".stripMargin
      }.mkString(",\n")
      val dets = (1 to 7)
        .map(k => s"SELECT $k AS level, pos, det AS detail FROM l$k")
        .mkString("\n  UNION ALL ")
      s"""WITH monthly AS (
         |  SELECT CAST((YEAR(CAST(o_orderdate AS DATE)) - 1992) * 12
         |      + MONTH(CAST(o_orderdate AS DATE)) - 1 AS BIGINT) AS pos,
         |    COUNT(*) AS v
         |  FROM orders GROUP BY 1),
         |g AS (SELECT UNNEST(GENERATE_SERIES(0, 127)) AS pos),
         |l0 AS (
         |  SELECT g.pos, COALESCE(m.v, 0) AS v
         |  FROM g LEFT JOIN monthly m ON g.pos = m.pos),
         |$levels,
         |dets AS (
         |  $dets
         |  UNION ALL SELECT 8 AS level, pos, v AS detail FROM l7),
         |ranked AS (
         |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY ABS(detail) DESC,
         |      level, pos) AS BIGINT) AS rn,
         |    CAST(level AS BIGINT) AS level, pos, detail
         |  FROM dets)
         |SELECT rn, level, pos, detail FROM ranked
         |WHERE rn <= 8 ORDER BY rn""".stripMargin
    },

    // ------------------------------------------------------------------
    // q213: BINARY-SEGMENTATION CHANGE POINT — the offline "WHERE did
    // the level shift" estimator that complements q195's online CUSUM
    // alarm (AMOC / first step of binary segmentation, Scott & Knott):
    // per priority, the split day t maximizing the between-segment
    // contrast |n·S_t − t·S_n|² / (t·(n−t)) over the dense daily grid.
    // The numerator's base n·S_t − t·S_n is EXACT int64 (the same
    // n-scaled mean-removal as q195); the objective is one IEEE divide
    // per candidate of exact-integer operands, and the argmax
    // tie-breaks on the earlier day. Left/right segment means are
    // terminal divisions. Shape: the q195 grid + ONE prefix-sum window
    // per priority, a keyed max, one keyed join back — no per-split
    // rescan (the naive formulation recomputes both segment means per
    // candidate; the prefix identity makes each candidate O(1)).
    QueryDef.sql("q213_binary_segmentation") { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val daily = Tables(s, d, "orders")
        .select(col("o_orderpriority").as("prio"),
          expr("CAST(datediff(o_orderdate, DATE '1992-01-01') AS BIGINT)")
            .as("day"))
        .groupBy(col("prio"), col("day"))
        .agg(count(lit(1)).as("n"))
      val span = daily.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      val grid = span.select(explode(expr("sequence(lo, hi)")).as("day"))
        .crossJoin(daily.select(col("prio")).distinct())
      val filled = grid.join(daily, Seq("prio", "day"), "left_outer")
        .withColumn("c", coalesce(col("n"), lit(0L)))
      val wRun = Window.partitionBy(col("prio")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val wIdx = Window.partitionBy(col("prio")).orderBy(col("day"))
      val stats = filled.groupBy(col("prio"))
        .agg(count(lit(1)).as("nd"), sum(col("c")).as("total"))
      val scored = filled.join(broadcast(stats), "prio")
        .withColumn("t", row_number().over(wIdx).cast("long"))
        .withColumn("st", sum(col("c")).over(wRun))
        .filter(col("t") < col("nd"))
        // square in DOUBLE: num is exact int64 (|num| ≤ nd·total < 2^53
        // at the design point) but num² would overflow int64 — one
        // exact long→double cast then a correctly-rounded square
        .withColumn("num",
          (col("nd") * col("st") - col("t") * col("total")).cast("double"))
        .withColumn("contrast",
          (col("num") * col("num")) /
            (col("t") * (col("nd") - col("t"))).cast("double"))
      val wBest = Window.partitionBy(col("prio"))
        .orderBy(col("contrast").desc, col("day"))
      scored.withColumn("rb", row_number().over(wBest))
        .filter(col("rb") === 1)
        .select(col("prio"), col("day").as("split_day"), col("contrast"),
          (col("st").cast("double") / col("t").cast("double"))
            .as("mean_left"),
          ((col("total") - col("st")).cast("double") /
            (col("nd") - col("t")).cast("double")).as("mean_right"))
        .orderBy("prio")
    } {
      """WITH daily AS (
        |  SELECT o_orderpriority AS prio,
        |    CAST(DATEDIFF('day', DATE '1992-01-01',
        |      CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
        |    COUNT(*) AS n
        |  FROM orders GROUP BY 1, 2),
        |span AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM daily),
        |grid AS (
        |  SELECT p.prio, g.day
        |  FROM (SELECT DISTINCT prio FROM daily) p,
        |    (SELECT UNNEST(GENERATE_SERIES(lo, hi)) AS day FROM span) g),
        |filled AS (
        |  SELECT g.prio, g.day, COALESCE(d.n, 0) AS c
        |  FROM grid g LEFT JOIN daily d ON g.prio = d.prio AND g.day = d.day),
        |st AS (
        |  SELECT prio, COUNT(*) AS nd, CAST(SUM(c) AS BIGINT) AS total
        |  FROM filled GROUP BY prio),
        |pfx AS (
        |  SELECT f.prio, f.day, st.nd, st.total,
        |    CAST(ROW_NUMBER() OVER w AS BIGINT) AS t,
        |    CAST(SUM(f.c) OVER (PARTITION BY f.prio ORDER BY f.day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS stv
        |  FROM filled f JOIN st ON f.prio = st.prio
        |  WINDOW w AS (PARTITION BY f.prio ORDER BY f.day)),
        |sc AS (
        |  SELECT prio, day, t, nd, total, stv,
        |    (CAST(nd * stv - t * total AS DOUBLE)
        |      * CAST(nd * stv - t * total AS DOUBLE))
        |      / CAST(t * (nd - t) AS DOUBLE) AS contrast
        |  FROM pfx WHERE t < nd),
        |best AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY prio
        |    ORDER BY contrast DESC, day) AS rb
        |  FROM sc)
        |SELECT prio, day AS split_day, contrast,
        |  CAST(stv AS DOUBLE) / CAST(t AS DOUBLE) AS mean_left,
        |  CAST(total - stv AS DOUBLE) / CAST(nd - t AS DOUBLE) AS mean_right
        |FROM best WHERE rb = 1
        |ORDER BY prio""".stripMargin
    },

    // ------------------------------------------------------------------
    // q221: DECISION-STUMP SPLIT FINDER — the inner loop of every
    // gradient-boosted tree, distributed: over (user engagement score →
    // did purchase), find the threshold minimizing weighted Gini
    // impurity. The candidate relation is the DISTINCT-score histogram
    // (score vocab, not user count) with prefix class counts — each
    // candidate split is then O(1), the exact trick real GBM engines
    // use (feature-histogram split finding, LightGBM-style). Gini
    // needs no logs: n²·gini = n² − pos² − neg² is EXACT int64, and
    // the weighted child impurity is a fixed chain of IEEE ops over
    // exact operands, so the argmin is cross-engine stable (ties →
    // smaller threshold). OVERFLOW: pos² ≤ n² < 2^63 to ~3e9 users —
    // past that lift the squares into DECIMAL(38,0)/HUGEINT.
    QueryDef.sql("q221_decision_stump") { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val users = Tables(s, d, "events")
        .groupBy(col("user_id"))
        .agg(sum(expr("CAST(ROUND(value * 100) AS BIGINT)")).as("score"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("y"))
      val hist = users.groupBy(col("score"))
        .agg(count(lit(1)).as("cnt"), sum(col("y")).as("pos"))
      val tot = users.agg(count(lit(1)).as("n"), sum(col("y")).as("p"))
      val wCum = Window.orderBy(col("score"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val cands = hist
        .withColumn("nl", sum(col("cnt")).over(wCum))
        .withColumn("pl", sum(col("pos")).over(wCum))
        .crossJoin(broadcast(tot))
        .filter(col("nl") < col("n")) // a split must leave both sides
      // weighted gini after split: Σ_child (n_c − (pos_c²+neg_c²)/n_c)/n
      val giniAfter =
        ((col("nl").cast("double") -
          (col("pl") * col("pl") + (col("nl") - col("pl")) *
            (col("nl") - col("pl"))).cast("double") /
            col("nl").cast("double")) +
          ((col("n") - col("nl")).cast("double") -
            ((col("p") - col("pl")) * (col("p") - col("pl")) +
              ((col("n") - col("nl")) - (col("p") - col("pl"))) *
              ((col("n") - col("nl")) - (col("p") - col("pl"))))
              .cast("double") /
              (col("n") - col("nl")).cast("double"))) /
          col("n").cast("double")
      val wBest = Window.orderBy(col("gini_after").asc, col("score").asc)
      cands
        .withColumn("gini_after", giniAfter)
        .withColumn("rb", row_number().over(wBest))
        .filter(col("rb") === 1)
        .select(col("score").as("threshold"),
          col("nl").as("n_left"), (col("n") - col("nl")).as("n_right"),
          ((col("n").cast("double") -
            (col("p") * col("p") + (col("n") - col("p")) *
              (col("n") - col("p"))).cast("double") /
              col("n").cast("double")) / col("n").cast("double"))
            .as("gini_before"),
          col("gini_after"))
        .withColumn("gain", col("gini_before") - col("gini_after"))
    } {
      """WITH users AS (
        |  SELECT user_id,
        |    CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
        |      AS score,
        |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
        |  FROM events GROUP BY user_id),
        |hist AS (
        |  SELECT score, COUNT(*) AS cnt, CAST(SUM(y) AS BIGINT) AS pos
        |  FROM users GROUP BY score),
        |tot AS (
        |  SELECT COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS p FROM users),
        |cands AS (
        |  SELECT score,
        |    CAST(SUM(cnt) OVER w AS BIGINT) AS nl,
        |    CAST(SUM(pos) OVER w AS BIGINT) AS pl,
        |    n, p
        |  FROM hist CROSS JOIN tot
        |  WINDOW w AS (ORDER BY score
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |scored AS (
        |  SELECT score, nl, pl, n, p,
        |    ((CAST(nl AS DOUBLE)
        |        - CAST(pl * pl + (nl - pl) * (nl - pl) AS DOUBLE)
        |          / CAST(nl AS DOUBLE))
        |      + (CAST(n - nl AS DOUBLE)
        |        - CAST((p - pl) * (p - pl)
        |            + ((n - nl) - (p - pl)) * ((n - nl) - (p - pl))
        |          AS DOUBLE) / CAST(n - nl AS DOUBLE)))
        |      / CAST(n AS DOUBLE) AS gini_after
        |  FROM cands WHERE nl < n),
        |best AS (
        |  SELECT *, ROW_NUMBER() OVER (ORDER BY gini_after, score) AS rb
        |  FROM scored)
        |SELECT score AS threshold, nl AS n_left, n - nl AS n_right,
        |  (CAST(n AS DOUBLE)
        |    - CAST(p * p + (n - p) * (n - p) AS DOUBLE) / CAST(n AS DOUBLE))
        |    / CAST(n AS DOUBLE) AS gini_before,
        |  gini_after,
        |  ((CAST(n AS DOUBLE)
        |    - CAST(p * p + (n - p) * (n - p) AS DOUBLE) / CAST(n AS DOUBLE))
        |    / CAST(n AS DOUBLE)) - gini_after AS gain
        |FROM best WHERE rb = 1""".stripMargin
    },

    // ------------------------------------------------------------------
    // q226: PARTITION-SIZING ADVISOR — the capacity arithmetic behind
    // `spark.sql.files.maxPartitionBytes` / shuffle-partition tuning,
    // computed from the data instead of guessed: per corpus table, the
    // estimated uncompressed payload (exact byte sums over the payload
    // columns + a per-row envelope constant), the partition count a
    // 128 MiB target implies, and how many 32-core waves that schedule
    // costs. The numbers that matter at 100 TB — "how many tasks will
    // this scan actually plan, and do they fit one wave" — derived
    // with the same exact-integer discipline as everything else.
    QueryDef.sql("q226_partition_sizing_advisor") { (s, d) =>
      val target = 134217728L // 128 MiB
      val docs = Tables(s, d, "documents")
        .agg(count(lit(1)).as("n_rows"),
          (sum(expr("octet_length(encode(text, 'UTF-8'))")) +
            sum(expr("octet_length(encode(lang, 'UTF-8'))")) +
            sum(expr("octet_length(encode(source, 'UTF-8'))")) +
            count(lit(1)) * 16L).as("est_bytes"))
        .select(lit("documents").as("tbl"), col("n_rows"), col("est_bytes"))
      val ev = Tables(s, d, "events")
        .agg(count(lit(1)).as("n_rows"),
          (sum(expr("octet_length(encode(props, 'UTF-8'))")) +
            sum(expr("octet_length(encode(event_type, 'UTF-8'))")) +
            count(lit(1)) * 32L).as("est_bytes"))
        .select(lit("events").as("tbl"), col("n_rows"), col("est_bytes"))
      val li = Tables(s, d, "lineitem")
        .agg(count(lit(1)).as("n_rows"),
          (count(lit(1)) * 120L).as("est_bytes"))
        .select(lit("lineitem").as("tbl"), col("n_rows"), col("est_bytes"))
      docs.unionAll(ev).unionAll(li)
        .withColumn("recommended_partitions",
          expr(s"CAST((est_bytes + $target - 1) DIV $target AS BIGINT)"))
        .withColumn("waves_32core",
          expr("CAST((recommended_partitions + 31) DIV 32 AS BIGINT)"))
        .withColumn("avg_row_bytes",
          (col("est_bytes").cast("double") / col("n_rows").cast("double")))
        .orderBy("tbl")
    } {
      """WITH docs AS (
        |  SELECT 'documents' AS tbl, COUNT(*) AS n_rows,
        |    CAST(SUM(OCTET_LENGTH(ENCODE(text)))
        |      + SUM(OCTET_LENGTH(ENCODE(lang)))
        |      + SUM(OCTET_LENGTH(ENCODE(source)))
        |      + COUNT(*) * 16 AS BIGINT) AS est_bytes
        |  FROM documents),
        |ev AS (
        |  SELECT 'events' AS tbl, COUNT(*) AS n_rows,
        |    CAST(SUM(OCTET_LENGTH(ENCODE(props)))
        |      + SUM(OCTET_LENGTH(ENCODE(event_type)))
        |      + COUNT(*) * 32 AS BIGINT) AS est_bytes
        |  FROM events),
        |li AS (
        |  SELECT 'lineitem' AS tbl, COUNT(*) AS n_rows,
        |    CAST(COUNT(*) * 120 AS BIGINT) AS est_bytes
        |  FROM lineitem),
        |u AS (SELECT * FROM docs UNION ALL SELECT * FROM ev
        |  UNION ALL SELECT * FROM li)
        |SELECT tbl, n_rows, est_bytes,
        |  (est_bytes + 134217727) // 134217728 AS recommended_partitions,
        |  ((est_bytes + 134217727) // 134217728 + 31) // 32 AS waves_32core,
        |  CAST(est_bytes AS DOUBLE) / CAST(n_rows AS DOUBLE)
        |    AS avg_row_bytes
        |FROM u
        |ORDER BY tbl""".stripMargin
    },

    // ------------------------------------------------------------------
    // q227: PRE-AGGREGATION ADVISOR — which rollups are worth
    // materializing? For each candidate grouping of the order stream,
    // the group count and the reduction factor (fact rows per
    // materialized row) — the numbers a cube/materialized-view planner
    // ranks by: a 10,000× reduction pays for nightly maintenance, a 2×
    // one doesn't. Also reports whether the candidate FUNCTIONALLY
    // refines a cheaper one (distinct-count comparison against the
    // 1-dim groupings — a refined rollup can be served FROM the finer
    // one instead of the fact table). All exact integer counts; one
    // keyed agg per candidate over one scan each.
    QueryDef.sql("q227_preagg_advisor") { (s, d) =>
      val o = Tables(s, d, "orders")
      def cand(name: String,
          cols: org.apache.spark.sql.Column*): DataFrame =
        o.groupBy(cols: _*).agg(count(lit(1)).as("c"))
          .agg(count(lit(1)).as("n_groups"), sum(col("c")).as("n_rows"))
          .select(lit(name).as("grouping"), col("n_groups"), col("n_rows"),
            (col("n_rows").cast("double") / col("n_groups").cast("double"))
              .as("reduction"))
      cand("priority", col("o_orderpriority"))
        .unionAll(cand("status", col("o_orderstatus")))
        .unionAll(cand("priority_status",
          col("o_orderpriority"), col("o_orderstatus")))
        .unionAll(cand("priority_month", col("o_orderpriority"),
          expr("date_trunc('month', o_orderdate)")))
        .unionAll(cand("custkey", col("o_custkey")))
        .orderBy("grouping")
    } {
      """WITH c1 AS (
        |  SELECT 'priority' AS grouping, COUNT(*) AS n_groups,
        |    CAST(SUM(c) AS BIGINT) AS n_rows
        |  FROM (SELECT COUNT(*) AS c FROM orders GROUP BY o_orderpriority)),
        |c2 AS (
        |  SELECT 'status', COUNT(*), CAST(SUM(c) AS BIGINT)
        |  FROM (SELECT COUNT(*) AS c FROM orders GROUP BY o_orderstatus)),
        |c3 AS (
        |  SELECT 'priority_status', COUNT(*), CAST(SUM(c) AS BIGINT)
        |  FROM (SELECT COUNT(*) AS c FROM orders
        |        GROUP BY o_orderpriority, o_orderstatus)),
        |c4 AS (
        |  SELECT 'priority_month', COUNT(*), CAST(SUM(c) AS BIGINT)
        |  FROM (SELECT COUNT(*) AS c FROM orders
        |        GROUP BY o_orderpriority,
        |          DATE_TRUNC('month', CAST(o_orderdate AS DATE)))),
        |c5 AS (
        |  SELECT 'custkey', COUNT(*), CAST(SUM(c) AS BIGINT)
        |  FROM (SELECT COUNT(*) AS c FROM orders GROUP BY o_custkey)),
        |u AS (SELECT * FROM c1 UNION ALL SELECT * FROM c2
        |  UNION ALL SELECT * FROM c3 UNION ALL SELECT * FROM c4
        |  UNION ALL SELECT * FROM c5)
        |SELECT grouping, n_groups, n_rows,
        |  CAST(n_rows AS DOUBLE) / CAST(n_groups AS DOUBLE) AS reduction
        |FROM u
        |ORDER BY grouping""".stripMargin
    },

    // ------------------------------------------------------------------
    // q236: PERIOD-OVER-PERIOD PROFILE DIFF — the warehouse diff tool:
    // per-user activity profiles (event count, purchase cents) for the
    // two halves of the month, full-outer-joined into the
    // added/removed/changed/same census plus the aggregate cents
    // delta. This is the shape of every snapshot-comparison job
    // (yesterday's dim vs today's, replica vs primary); q150 audits a
    // CHANGELOG against a rebuild, this diffs two MATERIALIZED states
    // with no changelog at all. One user-keyed agg with per-side
    // conditional sums (the q205 posture — the fact scan happens
    // once); exact integers.
    QueryDef.sql("q236_profile_snapshot_diff") { (s, d) =>
      val cutoff = lit("2024-01-16").cast("timestamp")
      val pu = Tables(s, d, "events")
        .select(col("user_id"),
          (col("ts").cast("timestamp") < cutoff).as("in_a"),
          when(col("event_type") === "purchase",
            expr("CAST(ROUND(value * 100) AS BIGINT)")).otherwise(0L)
            .as("cents"))
        .groupBy(col("user_id"))
        .agg(
          sum(when(col("in_a"), 1L).otherwise(0L)).as("n_a"),
          sum(when(!col("in_a"), 1L).otherwise(0L)).as("n_b"),
          sum(when(col("in_a"), col("cents")).otherwise(0L)).as("c_a"),
          sum(when(!col("in_a"), col("cents")).otherwise(0L)).as("c_b"))
      pu.agg(
        sum(when(col("n_a") === 0L && col("n_b") > 0L, 1L).otherwise(0L))
          .as("n_added"),
        sum(when(col("n_a") > 0L && col("n_b") === 0L, 1L).otherwise(0L))
          .as("n_removed"),
        sum(when(col("n_a") > 0L && col("n_b") > 0L &&
          (col("n_a") =!= col("n_b") || col("c_a") =!= col("c_b")), 1L)
          .otherwise(0L)).as("n_changed"),
        sum(when(col("n_a") > 0L && col("n_b") > 0L &&
          col("n_a") === col("n_b") && col("c_a") === col("c_b"), 1L)
          .otherwise(0L)).as("n_same"),
        (sum(col("c_b")) - sum(col("c_a"))).as("cents_delta"))
    } {
      """WITH pu AS (
        |  SELECT user_id,
        |    CAST(SUM(CASE WHEN CAST(ts AS TIMESTAMP)
        |      < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_a,
        |    CAST(SUM(CASE WHEN CAST(ts AS TIMESTAMP)
        |      >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_b,
        |    CAST(SUM(CASE WHEN CAST(ts AS TIMESTAMP)
        |        < TIMESTAMP '2024-01-16' AND event_type = 'purchase'
        |      THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END)
        |      AS BIGINT) AS c_a,
        |    CAST(SUM(CASE WHEN CAST(ts AS TIMESTAMP)
        |        >= TIMESTAMP '2024-01-16' AND event_type = 'purchase'
        |      THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END)
        |      AS BIGINT) AS c_b
        |  FROM events GROUP BY user_id)
        |SELECT
        |  CAST(SUM(CASE WHEN n_a = 0 AND n_b > 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_added,
        |  CAST(SUM(CASE WHEN n_a > 0 AND n_b = 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_removed,
        |  CAST(SUM(CASE WHEN n_a > 0 AND n_b > 0
        |      AND (n_a <> n_b OR c_a <> c_b) THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_changed,
        |  CAST(SUM(CASE WHEN n_a > 0 AND n_b > 0
        |      AND n_a = n_b AND c_a = c_b THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_same,
        |  CAST(SUM(c_b) - SUM(c_a) AS BIGINT) AS cents_delta
        |FROM pu""".stripMargin
    },

    // ------------------------------------------------------------------
    // q242: CRAMÉR'S V — q143's χ² grid compressed to the bounded [0,1]
    // association strength dashboards can threshold (χ² itself grows
    // with n, so "is lang associated with source" cannot be read off it
    // directly): V = √(χ²/(n·min(r−1,c−1))). Per-cell terms are q143's
    // exact chain verbatim (divergence here would mean the two audits
    // disagree about the same grid); the total crosses the order-
    // dependent-summation gap via the Det decimal contract, and √ is a
    // correctly-rounded IEEE primitive — no transcendental anywhere.
    // Everything after the (lang,source) rollup is O(r·c) rows.
    QueryDef.sql("q242_cramers_v") { (s, d) =>
      val grid = Tables(s, d, "documents")
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("observed"))
      val rowM = grid.groupBy(col("lang")).agg(sum(col("observed")).as("n_lang"))
      val colM = grid.groupBy(col("source")).agg(sum(col("observed")).as("n_source"))
      val dims = grid.agg(
        sum(col("observed")).as("n"),
        countDistinct(col("lang")).as("r"),
        countDistinct(col("source")).as("c"))
      grid.join(broadcast(rowM), "lang")
        .join(broadcast(colM), "source")
        .crossJoin(broadcast(dims))
        .withColumn("chi2_cell", expr(
          "(CAST(observed AS DOUBLE) " +
            "- CAST(n_lang * n_source AS DOUBLE) / CAST(n AS DOUBLE)) " +
            "* (CAST(observed AS DOUBLE) " +
            "- CAST(n_lang * n_source AS DOUBLE) / CAST(n AS DOUBLE)) " +
            "/ (CAST(n_lang * n_source AS DOUBLE) / CAST(n AS DOUBLE))"))
        .groupBy(col("n"), col("r"), col("c"))
        .agg(Det.dsum(col("chi2_cell")).as("chi2"))
        .select(col("n"), col("r").as("n_langs"), col("c").as("n_sources"),
          col("chi2"),
          expr("SQRT(chi2 / (CAST(n AS DOUBLE) " +
            "* CAST(least(r - 1, c - 1) AS DOUBLE)))").as("cramers_v"))
    } {
      s"""WITH grid AS (
         |  SELECT lang, source, COUNT(*) AS observed
         |  FROM documents GROUP BY lang, source),
         |rm AS (SELECT lang, CAST(SUM(observed) AS BIGINT) AS n_lang
         |       FROM grid GROUP BY lang),
         |cm AS (SELECT source, CAST(SUM(observed) AS BIGINT) AS n_source
         |       FROM grid GROUP BY source),
         |dims AS (
         |  SELECT CAST(SUM(observed) AS BIGINT) AS n,
         |    CAST(COUNT(DISTINCT lang) AS BIGINT) AS r,
         |    CAST(COUNT(DISTINCT source) AS BIGINT) AS c
         |  FROM grid),
         |cells AS (
         |  SELECT dims.n, dims.r, dims.c,
         |    (CAST(g.observed AS DOUBLE)
         |       - CAST(rm.n_lang * cm.n_source AS DOUBLE)
         |         / CAST(dims.n AS DOUBLE))
         |    * (CAST(g.observed AS DOUBLE)
         |       - CAST(rm.n_lang * cm.n_source AS DOUBLE)
         |         / CAST(dims.n AS DOUBLE))
         |    / (CAST(rm.n_lang * cm.n_source AS DOUBLE)
         |       / CAST(dims.n AS DOUBLE)) AS chi2_cell
         |  FROM grid g
         |  JOIN rm ON g.lang = rm.lang
         |  JOIN cm ON g.source = cm.source
         |  CROSS JOIN dims),
         |t AS (
         |  SELECT n, r, c, ${Det.dsumSql("chi2_cell")} AS chi2
         |  FROM cells GROUP BY n, r, c)
         |SELECT n, r AS n_langs, c AS n_sources, chi2,
         |  SQRT(chi2 / (CAST(n AS DOUBLE)
         |    * CAST(LEAST(r - 1, c - 1) AS DOUBLE))) AS cramers_v
         |FROM t""".stripMargin
    },

    // ------------------------------------------------------------------
    // q243: MANN–KENDALL TREND TEST — is each event type's daily volume
    // monotonically drifting? The KPI-trend screen that works where OLS
    // slopes mislead (no linearity assumption, outlier-robust) and where
    // q195's CUSUM answers a different question (abrupt change, not
    // drift). S = Σ_{i<j} sign(c_j − c_i) over day pairs in exact
    // integers; Kendall's tau-a = S / C(n,2) is the single terminal
    // division. Shape at scale: the pair join is per-type days² — the
    // CALENDAR bounds it (365² pairs/type/year), never the corpus; the
    // daily rollup in front is the only pass over the fact table.
    QueryDef.sql("q243_mann_kendall_trend") { (s, d) =>
      val daily = Tables(s, d, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt"))
      val a = daily.select(col("event_type"), col("day").as("day_a"),
        col("cnt").as("cnt_a"))
      val b = daily.select(col("event_type").as("et_b"),
        col("day").as("day_b"), col("cnt").as("cnt_b"))
      val nd = daily.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"))
      a.join(b, col("event_type") === col("et_b") &&
          col("day_a") < col("day_b"))
        .groupBy(col("event_type"))
        .agg(
          sum(when(col("cnt_b") > col("cnt_a"), 1L)
            .when(col("cnt_b") < col("cnt_a"), -1L).otherwise(0L))
            .as("s_stat"),
          count(lit(1)).as("n_pairs"))
        .join(broadcast(nd), "event_type")
        .select(col("event_type"), col("n_days"), col("n_pairs"),
          col("s_stat"),
          (col("s_stat").cast("double") / col("n_pairs").cast("double"))
            .as("tau_a"))
        .orderBy("event_type")
    } {
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY event_type, CAST(ts AS DATE)),
        |p AS (
        |  SELECT a.event_type,
        |    CAST(SUM(CASE WHEN b.cnt > a.cnt THEN 1
        |      WHEN b.cnt < a.cnt THEN -1 ELSE 0 END) AS BIGINT) AS s_stat,
        |    CAST(COUNT(*) AS BIGINT) AS n_pairs
        |  FROM daily a JOIN daily b
        |    ON a.event_type = b.event_type AND a.day < b.day
        |  GROUP BY a.event_type),
        |nd AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days
        |  FROM daily GROUP BY event_type)
        |SELECT p.event_type, nd.n_days, p.n_pairs, p.s_stat,
        |  CAST(p.s_stat AS DOUBLE) / CAST(p.n_pairs AS DOUBLE) AS tau_a
        |FROM p JOIN nd ON p.event_type = nd.event_type
        |ORDER BY p.event_type""".stripMargin
    },

    // ------------------------------------------------------------------
    // q244: MANN–WHITNEY RANK-SUM + CLIFF'S DELTA per source vs the rest
    // of the corpus — the non-parametric twin of q199's z-test and the
    // distribution-shift screen q122's KS complements: "does source X
    // produce systematically longer documents?" without any normality
    // assumption. Everything is exact integers until one division:
    // average ranks are kept DOUBLED (r2 = 2·cnt_less + ties + 1, always
    // an integer), so 2R₁ = Σ ties_source·r2 and 2U₁ = 2R₁ − n₁(n₁+1)
    // are exact int64, and Cliff's delta = (2U₁ − n₁n₂)/(n₁n₂) is the
    // terminal division. Shape at scale: ranks come from the VALUE
    // histogram (distinct n_chars, not rows) through the two-pass
    // globalOrderedCumsum — no single-task window, no row-level sort;
    // int64 bound: 2R₁ ≤ n₁·(2N+1) → valid to N ≈ 2e9 rows.
    QueryDef.sql("q244_rank_sum_test") { (s, d) =>
      val docs = Tables(s, d, "documents").select(col("source"), col("n_chars"))
      val hist = docs.groupBy(col("n_chars")).agg(count(lit(1)).as("t"))
      val r2 = Scale.globalOrderedCumsum(hist, "t", "cumt", "rnk",
          col("n_chars").asc)
        .select(col("n_chars"),
          (lit(2L) * (col("cumt") - col("t")) + col("t") + 1L).as("r2"))
      val bySrc = docs.groupBy(col("source"), col("n_chars"))
        .agg(count(lit(1)).as("ts"))
      val tot = docs.agg(count(lit(1)).as("n_total"))
      bySrc.join(r2, "n_chars")
        .groupBy(col("source"))
        .agg(sum(col("ts")).as("n1"),
          sum(col("ts") * col("r2")).as("two_r1"))
        .crossJoin(broadcast(tot))
        .withColumn("n2", col("n_total") - col("n1"))
        .withColumn("two_u", col("two_r1") - col("n1") * (col("n1") + 1L))
        .select(col("source"), col("n1"), col("n2"), col("two_u"),
          expr("CAST(two_u - n1 * n2 AS DOUBLE) / CAST(n1 * n2 AS DOUBLE)")
            .as("cliffs_delta"))
        .orderBy("source")
    } {
      """WITH hist AS (
        |  SELECT n_chars, CAST(COUNT(*) AS BIGINT) AS t
        |  FROM documents GROUP BY n_chars),
        |cum AS (
        |  SELECT n_chars, t,
        |    CAST(SUM(t) OVER (ORDER BY n_chars) AS BIGINT) AS cumt
        |  FROM hist),
        |r AS (
        |  SELECT n_chars, 2 * (cumt - t) + t + 1 AS r2 FROM cum),
        |bs AS (
        |  SELECT source, n_chars, CAST(COUNT(*) AS BIGINT) AS ts
        |  FROM documents GROUP BY source, n_chars),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM documents),
        |agg AS (
        |  SELECT source, CAST(SUM(ts) AS BIGINT) AS n1,
        |    CAST(SUM(ts * r2) AS BIGINT) AS two_r1
        |  FROM bs JOIN r USING (n_chars) GROUP BY source)
        |SELECT source, n1,
        |  CAST(n_total - n1 AS BIGINT) AS n2,
        |  CAST(two_r1 - n1 * (n1 + 1) AS BIGINT) AS two_u,
        |  CAST((two_r1 - n1 * (n1 + 1)) - n1 * (n_total - n1) AS DOUBLE)
        |    / CAST(n1 * (n_total - n1) AS DOUBLE) AS cliffs_delta
        |FROM agg CROSS JOIN tot
        |ORDER BY source""".stripMargin
    },

    // ------------------------------------------------------------------
    // q245: SORT-KEY COMPRESSION ADVISOR — which clustering key should
    // the 100 TB table be written under? Columnar run encodings
    // (parquet RLE + dictionary pages) are decided by how many value
    // RUNS each dictionary-encodable column degenerates to after the
    // sort, so the advisor scores each candidate key by the
    // clustered-run bound per measured column: Σ over sort-key groups
    // of COUNT(DISTINCT column) — the run count a writer that
    // co-locates equal values within each key group achieves, exact up
    // to group-boundary merges. Measured columns are the BOUNDED-
    // dictionary ones (returnflag, linestatus, quantity): those are
    // where RLE/dictionary pricing decides anything; unbounded
    // surrogate keys ship as plain/delta pages under ANY sort order, so
    // scanning their pair-distincts would buy nothing and cost the most
    // (the first cut of this query measured them and benched at
    // exponent 1.22 — each high-NDV pair is a full-corpus dedup).
    // Plan shape: Σ over groups of COUNT(DISTINCT c) IS the global
    // distinct (key, c) PAIR count, so every metric is one
    // countDistinct(key, c) in a single shared-scan aggregate —
    // map-side partials dedup each pair stream to ≤ ndv_key·ndv_col
    // rows before the shuffle, and no per-group intermediate ever
    // materializes. Exact integers; the rows-per-run ratio is the
    // terminal division.
    QueryDef.sql("q245_sort_compression_advisor") { (s, d) =>
      val cols6 = Tables(s, d, "lineitem")
        .select(to_date(col("l_shipdate")).as("day"),
          col("l_partkey").as("pk"), col("l_suppkey").as("sk"),
          col("l_returnflag").as("rf"), col("l_linestatus").as("ls"),
          col("l_quantity").as("qty"))
      // The fixtures are single-file/single-row-group parquet, so the
      // scan yields fewer splits than cores and the partial-dedup phase
      // would serialize on the scan task (measured 43 s → 12 s at the
      // 10× corpus). One round-robin exchange restores parallelism when
      // (and only when) the layout under-splits — a well-laid-out
      // multi-file table skips it entirely.
      val cores = s.sparkContext.defaultParallelism
      val src =
        if (cols6.rdd.getNumPartitions < cores) cols6.repartition(cores)
        else cols6
      val stats = src.agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("pk")).as("ndv_pk"),
        countDistinct(col("day")).as("ndv_day"),
        countDistinct(col("sk")).as("ndv_sk"),
        countDistinct(col("pk"), col("rf")).as("pk_rf"),
        countDistinct(col("pk"), col("ls")).as("pk_ls"),
        countDistinct(col("pk"), col("qty")).as("pk_qty"),
        countDistinct(col("day"), col("rf")).as("day_rf"),
        countDistinct(col("day"), col("ls")).as("day_ls"),
        countDistinct(col("day"), col("qty")).as("day_qty"),
        countDistinct(col("sk"), col("rf")).as("sk_rf"),
        countDistinct(col("sk"), col("ls")).as("sk_ls"),
        countDistinct(col("sk"), col("qty")).as("sk_qty"))
      // one row per candidate via a 1-row explode — a union of three
      // selects over `stats` would re-plan (and re-run) the whole
      // multi-distinct aggregate per branch (observed as 3 scans)
      def cand(name: String, groups: String, rf: String, ls: String,
          qty: String) =
        struct(lit(name).as("sort_key"), col(groups).as("n_groups"),
          col("n_rows"), col(rf).as("runs_returnflag"),
          col(ls).as("runs_linestatus"), col(qty).as("runs_quantity"),
          (col(rf) + col(ls) + col(qty)).as("total_runs"))
      stats.select(explode(array(
          cand("l_partkey", "ndv_pk", "pk_rf", "pk_ls", "pk_qty"),
          cand("l_shipdate_day", "ndv_day", "day_rf", "day_ls", "day_qty"),
          cand("l_suppkey", "ndv_sk", "sk_rf", "sk_ls", "sk_qty")))
          .as("r"))
        .select(col("r.sort_key").as("sort_key"),
          col("r.n_groups").as("n_groups"), col("r.n_rows").as("n_rows"),
          col("r.runs_returnflag").as("runs_returnflag"),
          col("r.runs_linestatus").as("runs_linestatus"),
          col("r.runs_quantity").as("runs_quantity"),
          col("r.total_runs").as("total_runs"),
          expr("CAST(3 * r.n_rows AS DOUBLE) / CAST(r.total_runs AS DOUBLE)")
            .as("rows_per_run"))
        .orderBy("sort_key")
    } {
      val candidates = Seq(
        "l_partkey" -> "l_partkey",
        "l_shipdate_day" -> "CAST(l_shipdate AS DATE)",
        "l_suppkey" -> "l_suppkey")
      def pair(keyExpr: String, c: String) =
        s"(SELECT CAST(COUNT(*) AS BIGINT) FROM " +
          s"(SELECT DISTINCT $keyExpr AS a, $c AS b FROM lineitem) t)"
      val branches = candidates.map { case (name, keyExpr) =>
        s"""  SELECT '$name' AS sort_key,
           |    (SELECT CAST(COUNT(DISTINCT $keyExpr) AS BIGINT)
           |       FROM lineitem) AS n_groups,
           |    ${pair(keyExpr, "l_returnflag")} AS runs_returnflag,
           |    ${pair(keyExpr, "l_linestatus")} AS runs_linestatus,
           |    ${pair(keyExpr, "l_quantity")} AS runs_quantity""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM lineitem),
         |u AS (
         |$branches)
         |SELECT sort_key, n_groups, n_rows, runs_returnflag,
         |  runs_linestatus, runs_quantity,
         |  runs_returnflag + runs_linestatus + runs_quantity AS total_runs,
         |  CAST(3 * n_rows AS DOUBLE)
         |    / CAST(runs_returnflag + runs_linestatus + runs_quantity
         |        AS DOUBLE) AS rows_per_run
         |FROM u CROSS JOIN tot
         |ORDER BY sort_key""".stripMargin
    },

    // ------------------------------------------------------------------
    // q247: SPLIT-CONFORMAL CALIBRATION — the distribution-free
    // prediction-interval recipe (Vovk; Lei et al.): fit on one half,
    // take q̂ = the ⌈(n_cal+1)(1−α)⌉-th smallest calibration residual,
    // and |y − ŷ| ≤ q̂ is guaranteed ≥ 1−α coverage on exchangeable
    // test data — the model-agnostic error bar for any score the
    // curation pipeline predicts. Model here: per-lang median n_chars
    // (R-7, integer data → exact halves), residuals DOUBLED into exact
    // int64 so the order statistic is integer algebra; α = 0.1 with the
    // rank ceiling as exact integer DIV. The calibration/test split is
    // the library-wide md5 id-hash recipe (q53/q89/q155 — Ids.hash).
    // Shape at scale: residual ranks come from the VALUE histogram via
    // the two-pass globalOrderedCumsum; the crossing is a broadcast
    // threshold; coverage is one more scan-side agg. One division each
    // for q̂/2 and coverage.
    QueryDef.sql("q247_conformal_calibration") { (s, d) =>
      val split = Tables(s, d, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"),
          (graft.Ids.hash("doc_id") % 2 === 0).as("is_cal"))
      val med = split.filter(col("is_cal")).groupBy(col("lang"))
        .agg(expr("CAST(2 * percentile(n_chars, 0.5) AS BIGINT)").as("med2"))
      val joined = split.join(broadcast(med), "lang")
        .withColumn("res2", abs(lit(2L) * col("n_chars") - col("med2")))
      val cal = joined.filter(col("is_cal")).select("res2")
      val k = cal.agg(count(lit(1)).as("n_cal"))
        .withColumn("k_rank", expr("(9 * (n_cal + 1) + 9) DIV 10"))
      val hist = cal.groupBy(col("res2")).agg(count(lit(1)).as("t"))
      val cum = Scale.globalOrderedCumsum(hist, "t", "cum", "rnk",
        col("res2").asc)
      val qhat = cum.crossJoin(broadcast(k))
        .filter(col("cum") >= col("k_rank"))
        .agg(min(col("res2")).as("qhat2"))
      val cov = joined.filter(!col("is_cal")).select("res2")
        .crossJoin(broadcast(qhat))
        .agg(count(lit(1)).as("n_test"),
          sum(when(col("res2") <= col("qhat2"), 1L).otherwise(0L))
            .as("n_covered"))
      k.crossJoin(broadcast(qhat)).crossJoin(broadcast(cov))
        .select(col("n_cal"), col("k_rank").cast("long").as("k_rank"),
          (col("qhat2").cast("double") / lit(2.0)).as("qhat"),
          col("n_test"), col("n_covered"),
          (col("n_covered").cast("double") / col("n_test").cast("double"))
            .as("coverage"))
    } {
      s"""WITH split AS (
         |  SELECT doc_id, lang, n_chars,
         |    (${graft.Ids.hashSql("doc_id")} % 2 = 0) AS is_cal
         |  FROM documents),
         |med AS (
         |  SELECT lang, CAST(2 * MEDIAN(n_chars) AS BIGINT) AS med2
         |  FROM split WHERE is_cal GROUP BY lang),
         |res AS (
         |  SELECT s.is_cal, ABS(2 * s.n_chars - m.med2) AS res2
         |  FROM split s JOIN med m ON s.lang = m.lang),
         |k AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_cal,
         |    CAST((9 * (COUNT(*) + 1) + 9) // 10 AS BIGINT) AS k_rank
         |  FROM res WHERE is_cal),
         |hist AS (
         |  SELECT res2, CAST(COUNT(*) AS BIGINT) AS t
         |  FROM res WHERE is_cal GROUP BY res2),
         |cum AS (
         |  SELECT res2, CAST(SUM(t) OVER (ORDER BY res2) AS BIGINT) AS cum
         |  FROM hist),
         |q AS (
         |  SELECT CAST(MIN(res2) AS BIGINT) AS qhat2
         |  FROM cum CROSS JOIN k WHERE cum >= k_rank),
         |cov AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_test,
         |    CAST(SUM(CASE WHEN res2 <= qhat2 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_covered
         |  FROM res CROSS JOIN q WHERE NOT is_cal)
         |SELECT k.n_cal, k.k_rank,
         |  CAST(q.qhat2 AS DOUBLE) / 2.0 AS qhat,
         |  cov.n_test, cov.n_covered,
         |  CAST(cov.n_covered AS DOUBLE) / CAST(cov.n_test AS DOUBLE)
         |    AS coverage
         |FROM k CROSS JOIN q CROSS JOIN cov""".stripMargin
    },

    // ------------------------------------------------------------------
    // q248: THEIL–SEN SLOPE — q243 detects THAT a daily KPI drifts;
    // this estimates HOW FAST, robustly: the median of all pairwise
    // slopes tolerates up to ~29% outlier days where the OLS slope
    // (q58's machinery) is dragged by a single bad backfill. Each pair's
    // slope is ONE IEEE division of exact integers (Δcount/Δdays —
    // bit-identical on both engines), and the median is the shared R-7
    // interpolation over an exact sort (the q57 cross-engine contract).
    // Same calendar-bounded pair join as q243 — days² per type, never
    // corpus-bounded; the daily rollup is the only pass over the facts.
    QueryDef.sql("q248_theil_sen_slope") { (s, d) =>
      val daily = Tables(s, d, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt"))
      val a = daily.select(col("event_type"), col("day").as("day_a"),
        col("cnt").as("cnt_a"))
      val b = daily.select(col("event_type").as("et_b"),
        col("day").as("day_b"), col("cnt").as("cnt_b"))
      a.join(b, col("event_type") === col("et_b") &&
          col("day_a") < col("day_b"))
        .withColumn("slope",
          (col("cnt_b") - col("cnt_a")).cast("double") /
            datediff(col("day_b"), col("day_a")).cast("double"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_pairs"),
          expr("percentile(slope, 0.5)").as("theil_sen_slope"))
        .orderBy("event_type")
    } {
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY event_type, CAST(ts AS DATE)),
        |p AS (
        |  SELECT a.event_type,
        |    CAST(b.cnt - a.cnt AS DOUBLE)
        |      / CAST(DATEDIFF('day', a.day, b.day) AS DOUBLE) AS slope
        |  FROM daily a JOIN daily b
        |    ON a.event_type = b.event_type AND a.day < b.day)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |  MEDIAN(slope) AS theil_sen_slope
        |FROM p GROUP BY event_type
        |ORDER BY event_type""".stripMargin
    },

    // ------------------------------------------------------------------
    // q250: JOIN-ORDER ADVISOR AUDIT — the System-R cardinality
    // estimate |A⋈B| ≈ |A|·|B| / max(ndv_A(k), ndv_B(k)) for each step
    // of both join orders of the customer⋈orders⋈lineitem chain, placed
    // NEXT TO the true intermediate sizes so the estimator itself is
    // audited (q201 prices one join; this prices ORDERS — the input to
    // "which intermediate do I materialize first" at 100 TB, where the
    // wrong order is a 10× shuffle). Base-table NDVs are exact
    // countDistinct; estimates are exact-int operands in one shared IEEE
    // double chain (products in double — int64 would overflow at
    // petabyte row counts); true sizes are the FK-keyed joins
    // themselves, each one keyed shuffle.
    QueryDef.sql("q250_join_order_advisor") { (s, d) =>
      val li = Tables(s, d, "lineitem")
      val or = Tables(s, d, "orders")
      val cu = Tables(s, d, "customer")
      val stats = li
        .agg(count(lit(1)).as("l_n"),
          countDistinct(col("l_orderkey")).as("l_ndv_ok"))
        .crossJoin(broadcast(or.agg(count(lit(1)).as("o_n"),
          countDistinct(col("o_orderkey")).as("o_ndv_ok"),
          countDistinct(col("o_custkey")).as("o_ndv_ck"))))
        .crossJoin(broadcast(cu.agg(count(lit(1)).as("c_n"),
          countDistinct(col("c_custkey")).as("c_ndv_ck"))))
      val loTrue = li.join(or, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("true_rows"))
      val ocTrue = or.join(cu, col("o_custkey") === col("c_custkey"))
        .agg(count(lit(1)).as("true_rows"))
      val locTrue = li.join(or, col("l_orderkey") === col("o_orderkey"))
        .join(cu, col("o_custkey") === col("c_custkey"))
        .agg(count(lit(1)).as("true_rows"))
      def step(name: String, trueDf: DataFrame, estExpr: String) =
        stats.crossJoin(broadcast(trueDf))
          .select(lit(name).as("step"), expr(estExpr).as("est_rows"),
            col("true_rows"),
            (expr(estExpr) / col("true_rows").cast("double")).as("err_ratio"))
      val estLo = "CAST(l_n AS DOUBLE) * CAST(o_n AS DOUBLE) " +
        "/ CAST(greatest(l_ndv_ok, o_ndv_ok) AS DOUBLE)"
      val estOc = "CAST(o_n AS DOUBLE) * CAST(c_n AS DOUBLE) " +
        "/ CAST(greatest(o_ndv_ck, c_ndv_ck) AS DOUBLE)"
      val estLoC = s"($estLo) * CAST(c_n AS DOUBLE) " +
        "/ CAST(greatest(o_ndv_ck, c_ndv_ck) AS DOUBLE)"
      val estOcL = s"($estOc) * CAST(l_n AS DOUBLE) " +
        "/ CAST(greatest(l_ndv_ok, o_ndv_ok) AS DOUBLE)"
      step("1_lineitem_x_orders", loTrue, estLo)
        .unionByName(step("2_orders_x_customer", ocTrue, estOc))
        .unionByName(step("3_lo_then_customer", locTrue, estLoC))
        .unionByName(step("4_oc_then_lineitem", locTrue, estOcL))
        .orderBy("step")
    } {
      """WITH st AS (
        |  SELECT
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS l_n,
        |    (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT)
        |       FROM lineitem) AS l_ndv_ok,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS o_n,
        |    (SELECT CAST(COUNT(DISTINCT o_orderkey) AS BIGINT)
        |       FROM orders) AS o_ndv_ok,
        |    (SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT)
        |       FROM orders) AS o_ndv_ck,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM customer) AS c_n,
        |    (SELECT CAST(COUNT(DISTINCT c_custkey) AS BIGINT)
        |       FROM customer) AS c_ndv_ck),
        |lo AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS t FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey),
        |oc AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS t FROM orders
        |  JOIN customer ON o_custkey = c_custkey),
        |loc AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS t FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey),
        |u AS (
        |  SELECT '1_lineitem_x_orders' AS step,
        |    CAST(l_n AS DOUBLE) * CAST(o_n AS DOUBLE)
        |      / CAST(GREATEST(l_ndv_ok, o_ndv_ok) AS DOUBLE) AS est_rows,
        |    lo.t AS true_rows
        |  FROM st CROSS JOIN lo
        |  UNION ALL
        |  SELECT '2_orders_x_customer',
        |    CAST(o_n AS DOUBLE) * CAST(c_n AS DOUBLE)
        |      / CAST(GREATEST(o_ndv_ck, c_ndv_ck) AS DOUBLE),
        |    oc.t
        |  FROM st CROSS JOIN oc
        |  UNION ALL
        |  SELECT '3_lo_then_customer',
        |    (CAST(l_n AS DOUBLE) * CAST(o_n AS DOUBLE)
        |      / CAST(GREATEST(l_ndv_ok, o_ndv_ok) AS DOUBLE))
        |      * CAST(c_n AS DOUBLE)
        |      / CAST(GREATEST(o_ndv_ck, c_ndv_ck) AS DOUBLE),
        |    loc.t
        |  FROM st CROSS JOIN loc
        |  UNION ALL
        |  SELECT '4_oc_then_lineitem',
        |    (CAST(o_n AS DOUBLE) * CAST(c_n AS DOUBLE)
        |      / CAST(GREATEST(o_ndv_ck, c_ndv_ck) AS DOUBLE))
        |      * CAST(l_n AS DOUBLE)
        |      / CAST(GREATEST(l_ndv_ok, o_ndv_ok) AS DOUBLE),
        |    loc.t
        |  FROM st CROSS JOIN loc)
        |SELECT step, est_rows, true_rows,
        |  est_rows / CAST(true_rows AS DOUBLE) AS err_ratio
        |FROM u ORDER BY step""".stripMargin
    },

    // ------------------------------------------------------------------
    // q251: WILSON LOWER BOUND per segment — ranking segments (or
    // sources, or variants) by raw conversion rate promotes tiny-n
    // flukes; the Wilson score interval's lower bound is the standard
    // small-sample-safe ranking statistic (how "sort by rating" works
    // at scale). Exposure/conversion reuses q199's semantics (a user
    // counts once, exposed = any view, converted = any purchase); the
    // bound is one shared transcendental-free IEEE chain over exact
    // integer counts with z = 1.96 as exact decimal literals (z² =
    // 3.8416, z²/2 = 1.9208, z²/4 = 0.9604). One user-keyed agg + one
    // broadcast dimension join; segments are a handful of rows.
    QueryDef.sql("q251_wilson_lower_bound") { (s, d) =>
      val perUser = Tables(s, d, "events")
        .groupBy(col("user_id"))
        .agg(
          max(when(col("event_type") === "view", 1L).otherwise(0L))
            .as("exposed"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("converted"))
        .filter(col("exposed") === 1L)
      val cust = Tables(s, d, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
      val wilson =
        "(p_hat + 1.9208 / n_d - 1.96 * SQRT(p_hat * (1.0 - p_hat) / n_d " +
          "+ 0.9604 / (n_d * n_d))) / (1.0 + 3.8416 / n_d)"
      perUser.join(broadcast(cust), col("user_id") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_exposed"),
          sum(col("converted")).as("n_converted"))
        .withColumn("n_d", col("n_exposed").cast("double"))
        .withColumn("p_hat", col("n_converted").cast("double") / col("n_d"))
        .withColumn("wilson_lb", expr(wilson))
        .select(col("c_mktsegment"), col("n_exposed"), col("n_converted"),
          col("p_hat"), col("wilson_lb"))
        .orderBy("c_mktsegment")
    } {
      """WITH pu AS (
        |  SELECT user_id,
        |    MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |      AS exposed,
        |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS converted
        |  FROM events GROUP BY user_id),
        |seg AS (
        |  SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_exposed,
        |    CAST(SUM(converted) AS BIGINT) AS n_converted
        |  FROM pu JOIN customer ON user_id = c_custkey
        |  WHERE exposed = 1 GROUP BY c_mktsegment),
        |x AS (
        |  SELECT c_mktsegment, n_exposed, n_converted,
        |    CAST(n_exposed AS DOUBLE) AS n_d,
        |    CAST(n_converted AS DOUBLE) / CAST(n_exposed AS DOUBLE)
        |      AS p_hat
        |  FROM seg)
        |SELECT c_mktsegment, n_exposed, n_converted, p_hat,
        |  (p_hat + 1.9208 / n_d - 1.96 * SQRT(p_hat * (1.0 - p_hat) / n_d
        |    + 0.9604 / (n_d * n_d))) / (1.0 + 3.8416 / n_d) AS wilson_lb
        |FROM x ORDER BY c_mktsegment""".stripMargin
    },

    // ------------------------------------------------------------------
    // q254: NEAR-CONSTANT COLUMN SCREEN — q73 profiles nulls and NDV;
    // this adds the MODE SHARE, the number that actually decides two
    // production actions: drop the column from feature sets (a 99%-
    // constant feature carries no signal) and expect ~free storage
    // (RLE/dictionary collapse a near-constant column regardless of
    // sort order — the q245 advisor's trivial case). Mode COUNT only —
    // max over the per-value histogram, deterministic with no tie-break
    // and no engine-specific value formatting (a double mode rendered
    // as text would differ between engines). One scan per column of a
    // generated list; exact ints, one division.
    QueryDef.sql("q254_near_constant_audit") { (s, d) =>
      val li = Tables(s, d, "lineitem")
      val cols = Seq("l_returnflag", "l_linestatus", "l_quantity",
        "l_discount", "l_tax")
      cols.map { c =>
        li.groupBy(col(c)).agg(count(lit(1)).as("cnt"))
          .agg(count(lit(1)).as("ndv"), sum(col("cnt")).as("n_rows"),
            max(col("cnt")).as("mode_cnt"))
          .select(lit(c).as("col_name"), col("n_rows"), col("ndv"),
            col("mode_cnt"),
            expr("CAST(mode_cnt AS DOUBLE) / CAST(n_rows AS DOUBLE)")
              .as("mode_share"),
            expr("CAST(CASE WHEN ndv = 1 " +
              "OR mode_cnt * 100 >= n_rows * 95 THEN 1 ELSE 0 END AS BIGINT)")
              .as("near_constant"))
      }.reduce(_ unionByName _).orderBy("col_name")
    } {
      val branches = Seq("l_returnflag", "l_linestatus", "l_quantity",
        "l_discount", "l_tax").map { c =>
        s"""  SELECT '$c' AS col_name,
           |    CAST(SUM(cnt) AS BIGINT) AS n_rows,
           |    CAST(COUNT(*) AS BIGINT) AS ndv,
           |    CAST(MAX(cnt) AS BIGINT) AS mode_cnt
           |  FROM (SELECT $c, CAST(COUNT(*) AS BIGINT) AS cnt
           |        FROM lineitem GROUP BY $c) h""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH u AS (
         |$branches)
         |SELECT col_name, n_rows, ndv, mode_cnt,
         |  CAST(mode_cnt AS DOUBLE) / CAST(n_rows AS DOUBLE) AS mode_share,
         |  CAST(CASE WHEN ndv = 1 OR mode_cnt * 100 >= n_rows * 95
         |    THEN 1 ELSE 0 END AS BIGINT) AS near_constant
         |FROM u ORDER BY col_name""".stripMargin
    },

    // ------------------------------------------------------------------
    // q255: EQUI-DEPTH HISTOGRAM (ANALYZE-style optimizer statistics) —
    // 16 equal-frequency buckets over order value in exact cents, the
    // statistic a cost-based optimizer feeds range-selectivity from.
    // Boundaries are EXACT order statistics at the binary-exact k/16
    // fractions via Scale.exactQuantiles' two-pass frozen range shuffle
    // (no buffer ever holds the distribution — the q102 scale shape);
    // the per-bucket recount is one broadcast range join back over the
    // scan. The audit IS the output: per-bucket share vs the ideal 1/16
    // exposes heavy ties (a value spanning bucket boundaries collapses
    // neighbors to zero — exactly what the optimizer needs to know).
    // The 17-row boundary window is driver-trivial; everything row-scale
    // is distributed.
    QueryDef.sql("q255_equidepth_histogram") { (s, d) =>
      val cents = Tables(s, d, "orders")
        .select(expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").as("cents"))
      val qs = Scale.exactQuantiles(cents, "cents", (0 to 16).map(_ / 16.0))
      val w = Window.orderBy("p") // 17 rows — single-task by construction
      val ranges = qs
        .withColumn("hi", lead(col("quantile"), 1).over(w))
        .withColumn("bucket", row_number().over(w).cast("long"))
        .filter(col("hi").isNotNull)
        .select(col("bucket"), col("quantile").as("lo"), col("hi"))
      val tot = cents.agg(count(lit(1)).as("n_total"))
      cents.join(broadcast(ranges),
          col("cents") >= col("lo") &&
            (col("cents") < col("hi") ||
              (col("bucket") === 16L && col("cents") <= col("hi"))))
        .groupBy(col("bucket"), col("lo"), col("hi"))
        .agg(count(lit(1)).as("n_in_bucket"))
        .crossJoin(broadcast(tot))
        .select(col("bucket"), col("lo"), col("hi"), col("n_in_bucket"),
          expr("CAST(n_in_bucket AS DOUBLE) / CAST(n_total AS DOUBLE)")
            .as("share"))
        .orderBy("bucket")
    } {
      val branches = (0 to 16).map { k =>
        s"  SELECT $k AS k, QUANTILE_CONT(cents, $k / 16.0) AS b FROM c"
      }.mkString("\nUNION ALL\n")
      s"""WITH c AS (
         |  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
         |  FROM orders),
         |qq AS (
         |$branches),
         |r AS (
         |  SELECT lo.k + 1 AS bucket, lo.b AS lo, hi.b AS hi
         |  FROM qq lo JOIN qq hi ON hi.k = lo.k + 1),
         |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM c)
         |SELECT CAST(r.bucket AS BIGINT) AS bucket, r.lo, r.hi,
         |  CAST(COUNT(*) AS BIGINT) AS n_in_bucket,
         |  CAST(COUNT(*) AS DOUBLE) / CAST(MAX(tot.n_total) AS DOUBLE)
         |    AS share
         |FROM c JOIN r ON c.cents >= r.lo
         |  AND (c.cents < r.hi OR (r.bucket = 16 AND c.cents <= r.hi))
         |CROSS JOIN tot
         |GROUP BY r.bucket, r.lo, r.hi
         |ORDER BY bucket""".stripMargin
    },

    // ------------------------------------------------------------------
    // q256: COLUMN-CORRELATION STATS — the audit that tells you when
    // q250's System-R arithmetic LIES: cardinality estimators multiply
    // per-column selectivities under an independence assumption, and
    // the standard correction factor is ndv(a)·ndv(b)/ndv(a,b) (≈1 when
    // every combination occurs — independent-ish; ≫1 when the columns
    // move together and the product estimate undercounts by exactly
    // that factor). One multi-distinct aggregate per table over
    // BOUNDED-dictionary column pairs, so every dedup stream collapses
    // map-side; exact integers, one terminal division per pair.
    QueryDef.sql("q256_column_correlation_stats") { (s, d) =>
      def pairStats(df: DataFrame, name: String,
          a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
        df.agg(countDistinct(a).as("ndv_a"), countDistinct(b).as("ndv_b"),
            countDistinct(a, b).as("ndv_pair"))
          .select(lit(name).as("pair"), col("ndv_a"), col("ndv_b"),
            col("ndv_pair"),
            expr("CAST(ndv_a * ndv_b AS DOUBLE) / CAST(ndv_pair AS DOUBLE)")
              .as("independence_ratio"))
      val or = Tables(s, d, "orders")
      val li = Tables(s, d, "lineitem")
      pairStats(or, "o_status_x_priority",
          col("o_orderstatus"), col("o_orderpriority"))
        .unionByName(pairStats(or, "o_status_x_month",
          col("o_orderstatus"), date_trunc("month", col("o_orderdate"))))
        .unionByName(pairStats(or, "o_priority_x_month",
          col("o_orderpriority"), date_trunc("month", col("o_orderdate"))))
        .unionByName(pairStats(li, "l_returnflag_x_linestatus",
          col("l_returnflag"), col("l_linestatus")))
        .orderBy("pair")
    } {
      def b(name: String, tbl: String, a: String, c: String) =
        s"""  SELECT '$name' AS pair,
           |    (SELECT CAST(COUNT(DISTINCT $a) AS BIGINT) FROM $tbl)
           |      AS ndv_a,
           |    (SELECT CAST(COUNT(DISTINCT $c) AS BIGINT) FROM $tbl)
           |      AS ndv_b,
           |    (SELECT CAST(COUNT(*) AS BIGINT) FROM
           |      (SELECT DISTINCT $a AS x, $c AS y FROM $tbl) t)
           |      AS ndv_pair""".stripMargin
      val month = "DATE_TRUNC('month', o_orderdate)"
      val branches = Seq(
        b("l_returnflag_x_linestatus", "lineitem",
          "l_returnflag", "l_linestatus"),
        b("o_priority_x_month", "orders", "o_orderpriority", month),
        b("o_status_x_month", "orders", "o_orderstatus", month),
        b("o_status_x_priority", "orders",
          "o_orderstatus", "o_orderpriority")).mkString("\nUNION ALL\n")
      s"""WITH u AS (
         |$branches)
         |SELECT pair, ndv_a, ndv_b, ndv_pair,
         |  CAST(ndv_a * ndv_b AS DOUBLE) / CAST(ndv_pair AS DOUBLE)
         |    AS independence_ratio
         |FROM u ORDER BY pair""".stripMargin
    },

    // ------------------------------------------------------------------
    // q258: ROW-WIDTH PROFILE — exact byte-width statistics per string
    // column (UTF-8 octets, not code points — what pages, shuffles, and
    // network actually carry): the input to page sizing, shuffle-buffer
    // budgets, and "which column is 80% of this table" questions that
    // row counts alone cannot answer. One column-pruned scan per
    // profiled column (the parquet reader materializes nothing else);
    // exact int64 sums, the mean is the terminal division.
    QueryDef.sql("q258_row_width_profile") { (s, d) =>
      def widths(tbl: String, colName: String) =
        Tables(s, d, tbl)
          .select(octet_length(col(colName)).cast("long").as("w"))
          .agg(count(lit(1)).as("n_rows"), sum(col("w")).as("total_bytes"),
            max(col("w")).as("max_bytes"))
          .select(lit(s"$tbl.$colName").as("column"), col("n_rows"),
            col("total_bytes"), col("max_bytes"),
            expr("CAST(total_bytes AS DOUBLE) / CAST(n_rows AS DOUBLE)")
              .as("avg_bytes"))
      widths("documents", "text")
        .unionByName(widths("events", "props"))
        .unionByName(widths("part", "p_name"))
        .unionByName(widths("customer", "c_name"))
        .unionByName(widths("orders", "o_orderpriority"))
        .orderBy("column")
    } {
      val branches = Seq("documents" -> "text", "events" -> "props",
        "part" -> "p_name", "customer" -> "c_name",
        "orders" -> "o_orderpriority").map { case (t, c) =>
        s"""  SELECT '$t.$c' AS column, CAST(COUNT(*) AS BIGINT) AS n_rows,
           |    CAST(SUM(OCTET_LENGTH(ENCODE($c))) AS BIGINT) AS total_bytes,
           |    CAST(MAX(OCTET_LENGTH(ENCODE($c))) AS BIGINT) AS max_bytes
           |  FROM $t""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH u AS (
         |$branches)
         |SELECT "column", n_rows, total_bytes, max_bytes,
         |  CAST(total_bytes AS DOUBLE) / CAST(n_rows AS DOUBLE) AS avg_bytes
         |FROM u ORDER BY "column"""".stripMargin
    },

    // ------------------------------------------------------------------
    // q259: BUCKETING ADVISOR — before writing a bucketed/clustered
    // table on a join key, pick the bucket count: too few and each
    // bucket outgrows a task, too many and files shrink below the scan
    // sweet spot, and EITHER way a skewed key distribution quietly
    // concentrates rows. For each candidate count b the advisor hashes
    // the key through the library-wide md5 recipe (Ids.hash — the same
    // function the engine's hash_split/sampling use, so the measured
    // distribution is the one a bucketed write would actually produce)
    // and reports max/min bucket occupancy and the max/ideal skew
    // ratio. One keyed agg per candidate over ≤ b groups; exact ints,
    // the skew ratio is the terminal division.
    QueryDef.sql("q259_bucketing_advisor") { (s, d) =>
      val ev = Tables(s, d, "events")
      def forB(b: Int) =
        ev.select((graft.Ids.hash("user_id") % b).as("bucket"))
          .groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
          .agg(count(lit(1)).as("n_used_buckets"),
            sum(col("cnt")).as("n_rows"), max(col("cnt")).as("max_rows"),
            min(col("cnt")).as("min_rows"))
          .select(lit(b.toLong).as("n_buckets"), col("n_rows"),
            col("n_used_buckets"), col("max_rows"), col("min_rows"),
            expr(s"CAST(max_rows * $b AS DOUBLE) / CAST(n_rows AS DOUBLE)")
              .as("skew_ratio"))
      forB(8).unionByName(forB(16)).unionByName(forB(32))
        .orderBy("n_buckets")
    } {
      val branches = Seq(8, 16, 32).map { b =>
        s"""  SELECT CAST($b AS BIGINT) AS n_buckets,
           |    CAST(SUM(cnt) AS BIGINT) AS n_rows,
           |    CAST(COUNT(*) AS BIGINT) AS n_used_buckets,
           |    CAST(MAX(cnt) AS BIGINT) AS max_rows,
           |    CAST(MIN(cnt) AS BIGINT) AS min_rows,
           |    CAST(MAX(cnt) * $b AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE)
           |      AS skew_ratio
           |  FROM (SELECT ${graft.Ids.hashSql("user_id")} % $b AS bucket,
           |          COUNT(*) AS cnt
           |        FROM events GROUP BY 1) h""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""$branches
         |ORDER BY n_buckets""".stripMargin
    },

    // ------------------------------------------------------------------
    // q261: PARTITION-SYNC CHECKSUM AUDIT — the anti-entropy shape
    // every replicated warehouse runs: compare per-partition (here:
    // per-day) row counts AND order-free content checksums between a
    // primary and a replica, and resync ONLY the partitions that
    // disagree — never the table. The checksum is the SUM of per-row
    // 32-bit md5 id-hashes: order-free (addition commutes), exact in
    // int64 to ~2^31 rows/partition, and sensitive to any dropped or
    // duplicated row. The "replica" here is the primary minus a
    // deterministic ~0.1% md5 cohort — a SIMULATED defect, so the
    // audit provably reports exactly the planted loss; the comparison
    // machinery is the production shape (two scans, one day-keyed agg
    // each, a tiny day-keyed join). Spark-side fault line and DuckDB
    // side share the Ids recipe, so both engines plant and detect the
    // SAME defect.
    QueryDef.sql("q261_partition_sync_audit") { (s, d) =>
      val ev = Tables(s, d, "events")
        .select(to_date(col("ts")).as("day"),
          graft.Ids.hash("event_id").as("h"))
      def sums(df: DataFrame, n: String, c: String) =
        df.groupBy(col("day"))
          .agg(count(lit(1)).as(n), sum(col("h")).as(c))
      val primary = sums(ev, "n_primary", "sum_primary")
      val replica = sums(ev.filter(col("h") % 997 =!= 0L),
        "n_replica", "sum_replica")
      primary.join(replica, Seq("day"), "left_outer")
        .select(col("day"), col("n_primary"),
          coalesce(col("n_replica"), lit(0L)).as("n_replica"),
          (col("n_primary") - coalesce(col("n_replica"), lit(0L)))
            .as("rows_missing"),
          (coalesce(col("sum_replica"), lit(0L)) =!= col("sum_primary"))
            .cast("long").as("needs_resync"))
        .orderBy("day")
    } {
      s"""WITH ev AS (
         |  SELECT CAST(ts AS DATE) AS day,
         |    ${graft.Ids.hashSql("event_id")} AS h
         |  FROM events),
         |p AS (
         |  SELECT day, CAST(COUNT(*) AS BIGINT) AS n_primary,
         |    CAST(SUM(h) AS BIGINT) AS sum_primary
         |  FROM ev GROUP BY day),
         |r AS (
         |  SELECT day, CAST(COUNT(*) AS BIGINT) AS n_replica,
         |    CAST(SUM(h) AS BIGINT) AS sum_replica
         |  FROM ev WHERE h % 997 <> 0 GROUP BY day)
         |SELECT p.day, p.n_primary,
         |  COALESCE(r.n_replica, 0) AS n_replica,
         |  CAST(p.n_primary - COALESCE(r.n_replica, 0) AS BIGINT)
         |    AS rows_missing,
         |  CAST(CASE WHEN COALESCE(r.sum_replica, 0) <> p.sum_primary
         |    THEN 1 ELSE 0 END AS BIGINT) AS needs_resync
         |FROM p LEFT JOIN r ON p.day = r.day
         |ORDER BY p.day""".stripMargin
    },

    // ------------------------------------------------------------------
    // q262: FEATURE-HASH COLLISION AUDIT — the hashing trick maps an
    // unbounded vocabulary into 2^k feature buckets; its silent cost is
    // collisions, and this measures them EXACTLY for candidate widths
    // (2^14/2^16/2^18) before a model bakes one in: distinct tokens per
    // bucket, tokens sharing a bucket, and the OCCURRENCE-weighted
    // share of collided tokens (a rare token colliding matters less
    // than 'the'). The vocabulary aggregates once; the three widths
    // ride ONE explode of that relation (k, bucket) — the q245 lesson:
    // no per-width re-plan of the corpus scan. Bucketing uses the
    // library-wide md5 recipe, so the audited table IS the one a
    // hashed-feature writer built on [[graft.Ids]] would produce.
    QueryDef.sql("q262_feature_hash_audit") { (s, d) =>
      val vocab = Tables(s, d, "documents")
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("freq"))
        .select(col("token"), col("freq"),
          graft.Ids.hash("token").as("h"))
      val widths = Seq(14, 16, 18)
      val exploded = vocab.select(col("freq"), explode(array(
        widths.map(k => struct(lit(k.toLong).as("k_bits"),
          (col("h") % (1L << k)).as("bucket"))): _*)).as("kb"))
        .select(col("kb.k_bits").as("k_bits"), col("kb.bucket").as("bucket"),
          col("freq"))
      exploded.groupBy(col("k_bits"), col("bucket"))
        .agg(count(lit(1)).as("toks"), sum(col("freq")).as("occ"))
        .groupBy(col("k_bits"))
        .agg(
          sum(col("toks")).as("n_tokens"),
          count(lit(1)).as("n_buckets_used"),
          sum(when(col("toks") > 1L, col("toks")).otherwise(0L))
            .as("n_collided_tokens"),
          sum(col("occ")).as("n_occurrences"),
          sum(when(col("toks") > 1L, col("occ")).otherwise(0L))
            .as("collided_occurrences"))
        .select(col("k_bits"), col("n_tokens"), col("n_buckets_used"),
          col("n_collided_tokens"),
          expr("CAST(collided_occurrences AS DOUBLE) " +
            "/ CAST(n_occurrences AS DOUBLE)").as("collided_occ_share"))
        .orderBy("k_bits")
    } {
      val branches = Seq(14, 16, 18).map { k =>
        s"""  SELECT CAST($k AS BIGINT) AS k_bits,
           |    CAST(SUM(toks) AS BIGINT) AS n_tokens,
           |    CAST(COUNT(*) AS BIGINT) AS n_buckets_used,
           |    CAST(SUM(CASE WHEN toks > 1 THEN toks ELSE 0 END) AS BIGINT)
           |      AS n_collided_tokens,
           |    CAST(SUM(CASE WHEN toks > 1 THEN occ ELSE 0 END) AS DOUBLE)
           |      / CAST(SUM(occ) AS DOUBLE) AS collided_occ_share
           |  FROM (
           |    SELECT ${graft.Ids.hashSql("token")} % ${1L << k} AS bucket,
           |      CAST(COUNT(*) AS BIGINT) AS toks,
           |      CAST(SUM(freq) AS BIGINT) AS occ
           |    FROM vocab GROUP BY 1) b""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH vocab AS (
         |  SELECT token, CAST(COUNT(*) AS BIGINT) AS freq
         |  FROM (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS token
         |        FROM documents)
         |  GROUP BY token)
         |$branches
         |ORDER BY k_bits""".stripMargin
    },

    // ------------------------------------------------------------------
    // q267: LSH PARAMETER ADVISOR — the (bands, rows) tuning table for
    // a 128-hash MinHash signature: collision probability
    // p = 1 − (1 − s^r)^b at decision-relevant similarities, for the
    // three power-of-two splits of 128. This is the planning input
    // behind q25/q107/q109's fixed parameters: pick the S-curve whose
    // knee sits on YOUR dedup threshold. Exactness: no POW anywhere —
    // libm pow is not correctly rounded and differs across engines —
    // every power is an explicit SQUARING CHAIN (r and b are powers of
    // two), one shared dialect-neutral expression string per (b, r),
    // so both engines execute the identical IEEE multiply sequence.
    // Zero table scans: a planner relation, the q218 posture.
    QueryDef.sql("q267_lsh_parameter_advisor") { (s, d) =>
      val _ = d // planner table: no fixture input
      def sq(x: String, times: Int): String =
        (1 to times).foldLeft(x) { case (e, _) => s"($e * $e)" }
      def chain(b: Int, r: Int): String = {
        // s^r then (1 - s^r)^b, both by squaring (r, b powers of two)
        val sr = sq("sim", Integer.numberOfTrailingZeros(r))
        val t = s"(1.0 - $sr)"
        s"(1.0 - ${sq(t, Integer.numberOfTrailingZeros(b))})"
      }
      val sims = Seq(0.3, 0.5, 0.7, 0.8, 0.9, 0.95)
      Seq((32, 4), (16, 8), (8, 16)).map { case (b, r) =>
        s.range(1)
          .select(explode(array(sims.map(lit): _*)).as("sim"))
          .select(lit(b.toLong).as("bands"),
            lit(r.toLong).as("rows_per_band"), col("sim"),
            expr(chain(b, r)).as("collision_prob"))
      }.reduce(_ unionByName _).orderBy("bands", "sim")
    } {
      def sq(x: String, times: Int): String =
        (1 to times).foldLeft(x) { case (e, _) => s"($e * $e)" }
      def chain(b: Int, r: Int): String = {
        val sr = sq("sim", Integer.numberOfTrailingZeros(r))
        val t = s"(1.0 - $sr)"
        s"(1.0 - ${sq(t, Integer.numberOfTrailingZeros(b))})"
      }
      val simList = Seq(0.3, 0.5, 0.7, 0.8, 0.9, 0.95)
        .map(v => s"$v::DOUBLE").mkString(", ")
      val branches = Seq((32, 4), (16, 8), (8, 16)).map { case (b, r) =>
        s"""  SELECT CAST($b AS BIGINT) AS bands,
           |    CAST($r AS BIGINT) AS rows_per_band, sim,
           |    ${chain(b, r)} AS collision_prob
           |  FROM (SELECT UNNEST([$simList]) AS sim) t""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""$branches
         |ORDER BY bands, sim""".stripMargin
    },

    // ------------------------------------------------------------------
    // q274: KEY-CANDIDATE DETECTOR — which column (or pair) can serve as
    // a primary/merge key? For each candidate: exact NDV, uniqueness
    // ratio, the boolean verdict, and the duplication factor that
    // prices a dedup-on-write. Complements q197 (which audits value
    // DEPENDENCIES between given columns; this discovers identity).
    // Plan shape is the q245/q256 discipline: ALL candidates ride ONE
    // shared-scan multi-distinct aggregate (map-side partials dedup each
    // stream before the shuffle), and the per-candidate rows explode off
    // the single aggregate row — no per-candidate re-plan of the scan.
    // The composite candidate uses a null-safe delimited concat (the
    // delimiter can't occur in the integer/date renderings).
    QueryDef.sql("q274_key_candidates") { (s, d) =>
      val o = Tables(s, d, "orders")
      val agg = o.agg(count(lit(1)).as("n"),
        countDistinct(col("o_orderkey")).as("d_orderkey"),
        countDistinct(col("o_custkey")).as("d_custkey"),
        countDistinct(col("o_orderstatus")).as("d_status"),
        countDistinct(col("o_custkey"), to_date(col("o_orderdate")))
          .as("d_cust_date"))
      agg.select(col("n"), explode(expr(
          """array(
            |  named_struct('candidate', 'o_orderkey', 'ndv', d_orderkey),
            |  named_struct('candidate', 'o_custkey', 'ndv', d_custkey),
            |  named_struct('candidate', 'o_orderstatus', 'ndv', d_status),
            |  named_struct('candidate', 'o_custkey+o_orderdate',
            |               'ndv', d_cust_date))""".stripMargin)).as("x"))
        .select(col("x.candidate").as("candidate"), col("n"),
          col("x.ndv").as("ndv"),
          expr("CAST(x.ndv AS DOUBLE) / CAST(n AS DOUBLE)").as("uniqueness"),
          (col("x.ndv") === col("n")).as("is_unique_key"),
          expr("CAST(n AS DOUBLE) / CAST(x.ndv AS DOUBLE)")
            .as("duplication_factor"))
        .orderBy("candidate")
    } {
      """WITH agg AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS d_orderkey,
        |    CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS d_custkey,
        |    CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS d_status,
        |    CAST(COUNT(DISTINCT (o_custkey, CAST(o_orderdate AS DATE)))
        |      AS BIGINT) AS d_cust_date
        |  FROM orders),
        |x AS (
        |  SELECT n, candidate, ndv FROM agg, (VALUES (1)) v,
        |  LATERAL (SELECT UNNEST([
        |    {'candidate': 'o_orderkey', 'ndv': d_orderkey},
        |    {'candidate': 'o_custkey', 'ndv': d_custkey},
        |    {'candidate': 'o_orderstatus', 'ndv': d_status},
        |    {'candidate': 'o_custkey+o_orderdate', 'ndv': d_cust_date}],
        |    recursive := true)) u)
        |SELECT candidate, n, ndv,
        |  CAST(ndv AS DOUBLE) / CAST(n AS DOUBLE) AS uniqueness,
        |  ndv = n AS is_unique_key,
        |  CAST(n AS DOUBLE) / CAST(ndv AS DOUBLE) AS duplication_factor
        |FROM x
        |ORDER BY candidate""".stripMargin
    },

    // ------------------------------------------------------------------
    // q269: KRUSKAL–WALLIS H — does ANY source produce a different
    // length distribution? q244 compares one source vs the rest; this is
    // the k-group omnibus (the screen you run FIRST, before k pairwise
    // rank-sums inflate the false-positive rate). Machinery: q244's
    // doubled average ranks from the VALUE histogram (exact int64 via
    // the two-pass cumsum — never a row-level sort), per-source exact
    // (n, 2R) aggregates, then H = 3/(N(N+1))·Σ(2R)²/n − 3(N+1) — the
    // 12/4 constant folding of the doubled ranks. Σ(2R)²/n is the only
    // order-sensitive double sum, so it rides an ORDERED source fold
    // (the q239 list_reduce contract) — both engines add ~5 doubles in
    // the identical sequence. Tie correction Σ(t³−t) is exact int64
    // from the same histogram (valid to t ≈ 2e6 rows per value). One
    // fact pass + vocabulary-sized relations throughout.
    QueryDef.sql("q269_kruskal_wallis") { (s, d) =>
      val docs = Tables(s, d, "documents").select(col("source"), col("n_chars"))
      val hist = docs.groupBy(col("n_chars")).agg(count(lit(1)).as("t"))
      val r2 = Scale.globalOrderedCumsum(hist, "t", "cumt", "rnk",
          col("n_chars").asc)
        .select(col("n_chars"),
          (lit(2L) * (col("cumt") - col("t")) + col("t") + 1L).as("r2"))
      val grp = docs.groupBy(col("source"), col("n_chars"))
        .agg(count(lit(1)).as("ts"))
        .join(r2, "n_chars")
        .groupBy(col("source"))
        .agg(sum(col("ts")).as("n"), sum(col("ts") * col("r2")).as("two_r"))
        // the per-source contribution is ONE shared IEEE chain on exact
        // int64 operands — identical on both engines
        .withColumn("contrib", expr(
          "(CAST(two_r AS DOUBLE) * CAST(two_r AS DOUBLE)) / CAST(n AS DOUBLE)"))
      val folded = grp.agg(
        sum(col("n")).as("n_total"),
        count(lit(1)).as("n_groups"),
        expr("aggregate(transform(sort_array(collect_list(" +
          "struct(source, contrib))), x -> x.contrib), 0.0D, " +
          "(acc, v) -> acc + v)").as("s2"))
      val ties = hist.agg(
        sum(col("t") * col("t") * col("t") - col("t")).as("tie_sum"))
      folded.crossJoin(broadcast(ties)).select(
        col("n_total"), col("n_groups"),
        expr(KwHExpr).as("h"),
        expr(KwTieExpr).as("tie_c"),
        expr(s"CASE WHEN ($KwTieExpr) <= 0.0 THEN NULL " +
          s"ELSE ($KwHExpr) / ($KwTieExpr) END").as("h_tie_adjusted"))
    } {
      s"""WITH hist AS (
         |  SELECT n_chars, CAST(COUNT(*) AS BIGINT) AS t
         |  FROM documents GROUP BY n_chars),
         |r AS (
         |  SELECT n_chars,
         |    2 * (CAST(SUM(t) OVER (ORDER BY n_chars) AS BIGINT) - t) + t + 1
         |      AS r2
         |  FROM hist),
         |grp AS (
         |  SELECT source, CAST(SUM(ts) AS BIGINT) AS n,
         |    CAST(SUM(ts * r2) AS BIGINT) AS two_r
         |  FROM (SELECT source, n_chars, CAST(COUNT(*) AS BIGINT) AS ts
         |        FROM documents GROUP BY source, n_chars) bs
         |  JOIN r USING (n_chars) GROUP BY source),
         |cb AS (
         |  SELECT source,
         |    (CAST(two_r AS DOUBLE) * CAST(two_r AS DOUBLE))
         |      / CAST(n AS DOUBLE) AS contrib, n
         |  FROM grp),
         |fold AS (
         |  SELECT CAST(SUM(n) AS BIGINT) AS n_total,
         |    CAST(COUNT(*) AS BIGINT) AS n_groups,
         |    LIST_REDUCE(LIST(contrib ORDER BY source),
         |      (acc, v) -> acc + v) AS s2
         |  FROM cb),
         |tie AS (
         |  SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS tie_sum FROM hist)
         |SELECT n_total, n_groups,
         |  $KwHExpr AS h,
         |  $KwTieExpr AS tie_c,
         |  CASE WHEN ($KwTieExpr) <= 0.0 THEN NULL
         |    ELSE ($KwHExpr) / ($KwTieExpr) END AS h_tie_adjusted
         |FROM fold CROSS JOIN tie""".stripMargin
    },

    // ------------------------------------------------------------------
    // q270: POISSON BOOTSTRAP CI for the mean purchase value — the error
    // bar for any corpus-scale point estimate, computed the only way a
    // bootstrap scales: resampling-with-replacement is approximated by
    // independent Poisson(1) replicate weights per row (Chamandy et al.'s
    // Poisson bootstrap), so all B=64 replicates ride ONE fact scan —
    // no per-replicate shuffle of the corpus, no N×B materialization
    // beyond the map-side explode. Weights are DETERMINISTIC: the
    // library md5 recipe over (event_id, b) inverted through the exact
    // Poisson(1) CDF literals (shortest round-trip doubles — both
    // engines parse the identical values). Replicate means are one
    // division of exact int64 (Σw·cents / Σw); the CI bounds are exact
    // ORDER STATISTICS of the 64 means (ranks 4 and 61 ≈ 90% central
    // coverage) — no interpolation, so arbitrary-double percentile
    // arithmetic can never drift between engines.
    QueryDef.sql("q270_bootstrap_ci") { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val pv = Tables(s, d, "events")
        .filter(col("event_type") === "purchase")
        .select(col("event_id"),
          expr("CAST(ROUND(value * 100) AS BIGINT)").as("cents"))
      val exact = pv.agg(count(lit(1)).as("n_rows"),
        expr("CAST(SUM(cents) AS DOUBLE) / COUNT(*)").as("exact_mean_cents"))
      val reps = pv
        .select(col("event_id"), col("cents"),
          explode(expr("sequence(0, 63)")).as("b"))
        .withColumn("u", graft.Ids.hash(
          "concat(cast(event_id AS string), ':', cast(b AS string))")
          .cast("double") / lit(4294967296.0))
        .withColumn("w", expr(PoissonWExpr))
        .groupBy(col("b"))
        .agg(sum(col("w")).as("wsum"), sum(col("w") * col("cents")).as("wcents"))
        .withColumn("m",
          expr("CAST(wcents AS DOUBLE) / CAST(wsum AS DOUBLE)"))
      val ranked = reps.withColumn("rnk",
        row_number().over(Window.orderBy(col("m"), col("b"))))
      val lo = ranked.filter(col("rnk") === 4).select(col("m").as("ci_lo"))
      val hi = ranked.filter(col("rnk") === 61).select(col("m").as("ci_hi"))
      exact.crossJoin(broadcast(lo)).crossJoin(broadcast(hi))
    } {
      s"""WITH pv AS (
         |  SELECT event_id, CAST(ROUND(value * 100) AS BIGINT) AS cents
         |  FROM events WHERE event_type = 'purchase'),
         |exact AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         |    CAST(CAST(SUM(cents) AS BIGINT) AS DOUBLE) / COUNT(*)
         |      AS exact_mean_cents
         |  FROM pv),
         |reps AS (
         |  SELECT b.b, CAST(SUM(w) AS BIGINT) AS wsum,
         |    CAST(SUM(w * cents) AS BIGINT) AS wcents
         |  FROM pv, (SELECT UNNEST(GENERATE_SERIES(0, 63)) AS b) b,
         |    LATERAL (SELECT CAST(${graft.Ids.hashSql(
               "(CAST(event_id AS VARCHAR) || ':' || CAST(b.b AS VARCHAR))")} AS DOUBLE)
         |      / 4294967296.0 AS u) lu,
         |    LATERAL (SELECT $PoissonWExpr AS w) lw
         |  GROUP BY b.b),
         |means AS (
         |  SELECT b, CAST(wcents AS DOUBLE) / CAST(wsum AS DOUBLE) AS m
         |  FROM reps),
         |ranked AS (
         |  SELECT m, ROW_NUMBER() OVER (ORDER BY m, b) AS rnk FROM means)
         |SELECT exact.n_rows, exact.exact_mean_cents,
         |  lo.m AS ci_lo, hi.m AS ci_hi
         |FROM exact
         |CROSS JOIN (SELECT m FROM ranked WHERE rnk = 4) lo
         |CROSS JOIN (SELECT m FROM ranked WHERE rnk = 61) hi""".stripMargin
    },

    // ------------------------------------------------------------------
    // q271: STATISTICS-STALENESS AUDIT — optimizer statistics are
    // gathered once and decay silently; this prices the decay by
    // re-deriving the stats a mid-corpus ANALYZE would have stored (the
    // first half of the calendar — a deterministic cutoff both engines
    // compute identically from the fixture's own date span) next to the
    // current truth: row-count growth, user-NDV growth, and the
    // concrete damage — the row estimate a stale selectivity
    // (purchase share at ANALYZE time) produces for today's corpus vs
    // the actual purchase count, as a misestimate factor. Two exact
    // aggregates over one table (the audit runs rarely; NDVs are exact
    // countDistinct); all ratios are IEEE chains over exact int64 with
    // products in double (int64 products would overflow at petabyte row
    // counts).
    QueryDef.sql("q271_stats_staleness") { (s, d) =>
      val ev = Tables(s, d, "events")
        .select(to_date(col("ts")).as("day"), col("user_id"),
          (col("event_type") === "purchase").cast("long").as("isp"))
      val cut = ev.agg(expr(
        "date_add(MIN(day), CAST((datediff(MAX(day), MIN(day)) div 2) AS INT))")
        .as("cutoff"))
      val old = ev.crossJoin(broadcast(cut)).filter(col("day") < col("cutoff"))
        .agg(count(lit(1)).as("n_old"),
          countDistinct(col("user_id")).as("ndv_user_old"),
          sum(col("isp")).as("npurch_old"))
      val cur = ev.agg(count(lit(1)).as("n_cur"),
        countDistinct(col("user_id")).as("ndv_user_cur"),
        sum(col("isp")).as("npurch_cur"))
      cut.crossJoin(broadcast(old)).crossJoin(broadcast(cur))
        .select(col("cutoff"), col("n_old"), col("n_cur"),
          expr("CAST(n_cur AS DOUBLE) / CAST(n_old AS DOUBLE)")
            .as("count_growth"),
          col("ndv_user_old"), col("ndv_user_cur"),
          expr("CAST(ndv_user_cur AS DOUBLE) / CAST(ndv_user_old AS DOUBLE)")
            .as("ndv_growth"),
          expr("(CAST(npurch_old AS DOUBLE) * CAST(n_cur AS DOUBLE)) / CAST(n_old AS DOUBLE)")
            .as("est_purchase_rows"),
          col("npurch_cur").as("actual_purchase_rows"),
          expr("(CAST(npurch_old AS DOUBLE) * CAST(n_cur AS DOUBLE)) / " +
            "(CAST(n_old AS DOUBLE) * CAST(npurch_cur AS DOUBLE))")
            .as("misestimate_factor"))
    } {
      """WITH ev AS (
        |  SELECT CAST(ts AS DATE) AS day, user_id,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS isp
        |  FROM events),
        |cut AS (
        |  SELECT MIN(day) + CAST((MAX(day) - MIN(day)) // 2 AS INTEGER)
        |    AS cutoff FROM ev),
        |old AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_old,
        |    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS ndv_user_old,
        |    CAST(SUM(isp) AS BIGINT) AS npurch_old
        |  FROM ev CROSS JOIN cut WHERE day < cutoff),
        |cur AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_cur,
        |    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS ndv_user_cur,
        |    CAST(SUM(isp) AS BIGINT) AS npurch_cur
        |  FROM ev)
        |SELECT cutoff, n_old, n_cur,
        |  CAST(n_cur AS DOUBLE) / CAST(n_old AS DOUBLE) AS count_growth,
        |  ndv_user_old, ndv_user_cur,
        |  CAST(ndv_user_cur AS DOUBLE) / CAST(ndv_user_old AS DOUBLE)
        |    AS ndv_growth,
        |  (CAST(npurch_old AS DOUBLE) * CAST(n_cur AS DOUBLE))
        |    / CAST(n_old AS DOUBLE) AS est_purchase_rows,
        |  npurch_cur AS actual_purchase_rows,
        |  (CAST(npurch_old AS DOUBLE) * CAST(n_cur AS DOUBLE))
        |    / (CAST(n_old AS DOUBLE) * CAST(npurch_cur AS DOUBLE))
        |    AS misestimate_factor
        |FROM cut CROSS JOIN old CROSS JOIN cur""".stripMargin
    },

    // ------------------------------------------------------------------
    // q272: WEEKDAY SEASONALITY PROFILE — the additive-decomposition
    // screen behind every "is Monday supposed to look like this"
    // question: per-weekday purchase seasonal indices plus the seasonal
    // STRENGTH (eta² — the share of daily-volume variance explained by
    // weekday), which decides whether a forecast/anomaly stack needs a
    // seasonal term at all (q184's seasonal-naive error measures one
    // model; this measures the signal). Weekday is engine-neutral
    // integer arithmetic (epoch-day mod 7, 0 = Thursday — no locale
    // dayofweek), indices are single IEEE chains over exact int64 with
    // products in double, and eta²'s Σ(S_w²/n_w) rides a 7-row ORDERED
    // weekday fold (the q269 posture). Calendar-bounded everywhere
    // after the one fact pass; days without purchases are absent from
    // the daily relation (both engines agree) — the profile describes
    // ACTIVE days.
    QueryDef.sql("q272_weekday_seasonality") { (s, d) =>
      val daily = Tables(s, d, "events")
        .filter(col("event_type") === "purchase")
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("c"))
        .withColumn("wd", expr("datediff(day, DATE '1970-01-01') % 7"))
      val byWd = daily.groupBy(col("wd"))
        .agg(count(lit(1)).as("n_days"), sum(col("c")).as("total"))
        .withColumn("contrib", expr(
          "(CAST(total AS DOUBLE) * CAST(total AS DOUBLE)) / CAST(n_days AS DOUBLE)"))
      val glob = daily.agg(count(lit(1)).as("n_all"),
        sum(col("c")).as("s_all"), sum(col("c") * col("c")).as("q_all"))
      val f = byWd.agg(expr(
        "aggregate(transform(sort_array(collect_list(struct(wd, contrib))), " +
          "x -> x.contrib), 0.0D, (acc, v) -> acc + v)").as("f"))
      byWd.crossJoin(broadcast(glob)).crossJoin(broadcast(f))
        .select(col("wd"), col("n_days"), col("total"),
          expr("(CAST(total AS DOUBLE) * CAST(n_all AS DOUBLE)) / " +
            "(CAST(n_days AS DOUBLE) * CAST(s_all AS DOUBLE))")
            .as("seasonal_index"),
          expr(Eta2Expr).as("weekday_eta2"))
        .orderBy("wd")
    } {
      s"""WITH daily AS (
         |  SELECT day, CAST(COUNT(*) AS BIGINT) AS c,
         |    (day - DATE '1970-01-01') % 7 AS wd
         |  FROM (SELECT CAST(ts AS DATE) AS day FROM events
         |        WHERE event_type = 'purchase') t
         |  GROUP BY day),
         |bywd AS (
         |  SELECT wd, CAST(COUNT(*) AS BIGINT) AS n_days,
         |    CAST(SUM(c) AS BIGINT) AS total
         |  FROM daily GROUP BY wd),
         |cb AS (
         |  SELECT wd, n_days, total,
         |    (CAST(total AS DOUBLE) * CAST(total AS DOUBLE))
         |      / CAST(n_days AS DOUBLE) AS contrib
         |  FROM bywd),
         |gl AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_all,
         |    CAST(SUM(c) AS BIGINT) AS s_all,
         |    CAST(SUM(c * c) AS BIGINT) AS q_all
         |  FROM daily),
         |fd AS (
         |  SELECT LIST_REDUCE(LIST(contrib ORDER BY wd), (acc, v) -> acc + v)
         |    AS f
         |  FROM cb)
         |SELECT wd, n_days, total,
         |  (CAST(total AS DOUBLE) * CAST(n_all AS DOUBLE))
         |    / (CAST(n_days AS DOUBLE) * CAST(s_all AS DOUBLE))
         |    AS seasonal_index,
         |  $Eta2Expr AS weekday_eta2
         |FROM cb CROSS JOIN gl CROSS JOIN fd
         |ORDER BY wd""".stripMargin
    },

    // ------------------------------------------------------------------
    // q284: HIERARCHICAL CHECKSUM TREE — q261 compares replicas day by
    // day; at years of retention that is thousands of comparisons per
    // sync. The Merkle posture fixes it: day / week / month levels of
    // (count, order-free md5-id-hash sum), so two replicas binary-search
    // divergence top-down (month differs → its weeks → its days) in
    // O(log) comparisons. Checksum sums are ASSOCIATIVE, so the tree is
    // one day-keyed fact aggregation and a calendar-sized 3-row explode
    // re-aggregated (the q245 lesson: never three scans, never a union
    // of re-planned aggregates). All exact int64.
    QueryDef.sql("q284_checksum_tree") { (s, d) =>
      val day = Tables(s, d, "events")
        .select(to_date(col("ts")).as("day"),
          graft.Ids.hash("event_id").as("h"))
        .groupBy(col("day"))
        .agg(count(lit(1)).as("n"), sum(col("h")).as("ck"))
      day.select(explode(expr(
          "array(named_struct('level', 'day', 'bucket', day), " +
            "named_struct('level', 'week', 'bucket', " +
            "date_add(DATE '1970-01-01', " +
            "CAST((datediff(day, DATE '1970-01-01') div 7) * 7 AS INT))), " +
            "named_struct('level', 'month', 'bucket', trunc(day, 'MM')))"))
          .as("x"), col("n"), col("ck"))
        .groupBy(col("x.level").as("level"), col("x.bucket").as("bucket"))
        .agg(sum(col("n")).as("n_rows"), sum(col("ck")).as("checksum"))
        .orderBy("level", "bucket")
    } {
      s"""WITH day AS (
         |  SELECT CAST(ts AS DATE) AS day,
         |    CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(${graft.Ids.hashSql("event_id")}) AS BIGINT) AS ck
         |  FROM events GROUP BY 1),
         |x AS (
         |  SELECT n, ck, UNNEST([
         |    {'level': 'day', 'bucket': day},
         |    {'level': 'week', 'bucket': DATE '1970-01-01'
         |      + CAST(((day - DATE '1970-01-01') // 7) * 7 AS INTEGER)},
         |    {'level': 'month',
         |     'bucket': CAST(date_trunc('month', day) AS DATE)}],
         |    recursive := true)
         |  FROM day)
         |SELECT level, bucket, CAST(SUM(n) AS BIGINT) AS n_rows,
         |  CAST(SUM(ck) AS BIGINT) AS checksum
         |FROM x GROUP BY level, bucket
         |ORDER BY level, bucket""".stripMargin
    },

    // ------------------------------------------------------------------
    // q289: BLOOM-FILTER SIZING ADVISOR — q85 prunes a join through a
    // Bloom filter; this computes what that filter should COST before
    // anyone builds it: for each join-key candidate, the exact NDV and
    // the optimal (m bits, k hashes, MiB) at 1% and 0.01% target FPR.
    // The transcendental constants (−ln p / ln²2 bits per element and
    // the derived integer k) are SHORTEST-ROUND-TRIP LITERALS — no libm
    // at query time, both engines parse identical doubles. One exact
    // multi-distinct aggregate per table (the q274 shared-scan
    // discipline); the sizing table is candidates × 2 planner rows.
    QueryDef.sql("q289_bloom_sizing_advisor") { (s, d) =>
      val li = Tables(s, d, "lineitem").agg(
        countDistinct(col("l_partkey")).as("d_part"),
        countDistinct(col("l_suppkey")).as("d_supp"))
      val o = Tables(s, d, "orders").agg(
        countDistinct(col("o_custkey")).as("d_cust"))
      li.crossJoin(broadcast(o))
        .select(explode(expr(
          """array(
            |  named_struct('key_col', 'lineitem.l_partkey', 'ndv', d_part),
            |  named_struct('key_col', 'lineitem.l_suppkey', 'ndv', d_supp),
            |  named_struct('key_col', 'orders.o_custkey', 'ndv', d_cust))"""
            .stripMargin)).as("x"))
        .select(col("x.key_col").as("key_col"), col("x.ndv").as("ndv"),
          explode(expr(
            "array(named_struct('fpr', 0.01D, 'bpe', 9.585058377367439D, " +
              "'k', 7L), " +
              "named_struct('fpr', 0.0001D, 'bpe', 19.170116754734877D, " +
              "'k', 13L))")).as("t"))
        .select(col("key_col"), col("ndv"), col("t.fpr").as("target_fpr"),
          expr("CAST(CEIL(CAST(ndv AS DOUBLE) * t.bpe) AS BIGINT)")
            .as("m_bits"),
          col("t.k").as("k_hashes"),
          expr("CAST(CEIL(CAST(ndv AS DOUBLE) * t.bpe) AS DOUBLE) / 8388608.0D").as("mib"))
        .orderBy("key_col", "target_fpr")
    } {
      """WITH li AS (
        |  SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS d_part,
        |    CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS d_supp
        |  FROM lineitem),
        |o AS (
        |  SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS d_cust
        |  FROM orders),
        |cand AS (
        |  SELECT key_col, ndv FROM li CROSS JOIN o,
        |  LATERAL (SELECT UNNEST([
        |    {'key_col': 'lineitem.l_partkey', 'ndv': d_part},
        |    {'key_col': 'lineitem.l_suppkey', 'ndv': d_supp},
        |    {'key_col': 'orders.o_custkey', 'ndv': d_cust}],
        |    recursive := true)) u),
        |t AS (
        |  SELECT * FROM (SELECT UNNEST([
        |    {'fpr': 0.01::DOUBLE, 'bpe': 9.585058377367439::DOUBLE,
        |     'k': 7::BIGINT},
        |    {'fpr': 0.0001::DOUBLE, 'bpe': 19.170116754734877::DOUBLE,
        |     'k': 13::BIGINT}], recursive := true)) v)
        |SELECT key_col, ndv, fpr AS target_fpr,
        |  CAST(CEIL(CAST(ndv AS DOUBLE) * bpe) AS BIGINT) AS m_bits,
        |  k AS k_hashes,
        |  CEIL(CAST(ndv AS DOUBLE) * bpe) / 8388608.0 AS mib
        |FROM cand CROSS JOIN t
        |ORDER BY key_col, target_fpr""".stripMargin
    },

    // ------------------------------------------------------------------
    // q290: RANK MOVERS REPORT — the week's top-20 parts by shipped
    // quantity, each with its rank LAST week and the delta (NULL = new
    // entry): the "movers and shakers" report every merchandising
    // dashboard leads with. Scale shape: both rank relations are
    // rank-filtered keyed windows, which Spark executes as
    // WindowGroupLimit — each task keeps only its local top-N per week
    // BEFORE the exchange, so no week is ever fully sorted in one task
    // (the q175/q207 plan posture); the previous-week lookup joins
    // top-20 against top-200 on (part, week−1) — both dimension-bounded
    // relations. Quantities are exact int64.
    QueryDef.sql("q290_rank_movers") { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val wq = Tables(s, d, "lineitem")
        .select(expr("datediff(to_date(l_shipdate), DATE '1970-01-01') div 7")
          .as("wk"), col("l_partkey").as("part"),
          expr("CAST(ROUND(l_quantity) AS BIGINT)").as("qty"))
        .groupBy(col("wk"), col("part"))
        .agg(sum(col("qty")).as("q"))
      def ranked(depth: Int) = wq.withColumn("rnk", row_number().over(
          Window.partitionBy(col("wk"))
            .orderBy(col("q").desc, col("part"))))
        .filter(col("rnk") <= depth)
      val cur = ranked(20)
        .select(col("wk"), col("part"), col("q"), col("rnk").as("cur_rank"))
      val prev = ranked(200)
        .select((col("wk") + 1L).as("wk"), col("part"),
          col("rnk").as("prev_rank"))
      cur.join(prev, Seq("wk", "part"), "left_outer")
        .select(col("wk"), col("part"), col("q"),
          col("cur_rank").cast("long").as("cur_rank"),
          col("prev_rank").cast("long").as("prev_rank"),
          (col("prev_rank").cast("long") - col("cur_rank").cast("long"))
            .as("rank_delta"))
        .orderBy("wk", "cur_rank")
    } {
      """WITH wq AS (
        |  SELECT (CAST(l_shipdate AS DATE) - DATE '1970-01-01') // 7 AS wk,
        |    l_partkey AS part,
        |    CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS q
        |  FROM lineitem GROUP BY 1, 2),
        |r AS (
        |  SELECT wk, part, q,
        |    ROW_NUMBER() OVER (PARTITION BY wk ORDER BY q DESC, part)
        |      AS rnk
        |  FROM wq),
        |cur AS (SELECT wk, part, q, rnk AS cur_rank FROM r WHERE rnk <= 20),
        |prev AS (
        |  SELECT wk + 1 AS wk, part, rnk AS prev_rank
        |  FROM r WHERE rnk <= 200)
        |SELECT cur.wk, cur.part, cur.q,
        |  CAST(cur_rank AS BIGINT) AS cur_rank,
        |  CAST(prev_rank AS BIGINT) AS prev_rank,
        |  CAST(prev_rank - cur_rank AS BIGINT) AS rank_delta
        |FROM cur LEFT JOIN prev ON cur.wk = prev.wk AND cur.part = prev.part
        |ORDER BY cur.wk, cur_rank""".stripMargin
    },

    // ------------------------------------------------------------------
    // q287: DISCOUNT LIFT TABLE — does a discount move quantity? Per
    // discount band (exact percent points), the order-line volume and
    // quantity lift vs the no-discount baseline — the
    // price-sensitivity census a merchandising warehouse publishes.
    // Quantities are integral doubles → exact int64 sums; the lift is
    // cross-multiplied exact integers in ONE shared IEEE chain
    // (sumq_band · n_base) / (n_band · sumq_base), products in double
    // so petabyte row counts can't overflow. One scan, one ≤11-group
    // agg, a broadcast of the baseline row.
    QueryDef.sql("q287_discount_lift") { (s, d) =>
      val li = Tables(s, d, "lineitem")
        .select(expr("CAST(ROUND(l_discount * 100) AS BIGINT)").as("disc_pct"),
          expr("CAST(ROUND(l_quantity) AS BIGINT)").as("qty"))
      val bands = li.groupBy(col("disc_pct"))
        .agg(count(lit(1)).as("n_items"), sum(col("qty")).as("sum_qty"))
      val base = bands.filter(col("disc_pct") === 0L)
        .select(col("n_items").as("n_base"), col("sum_qty").as("sumq_base"))
      bands.crossJoin(broadcast(base))
        .select(col("disc_pct"), col("n_items"),
          expr("CAST(sum_qty AS DOUBLE) / CAST(n_items AS DOUBLE)")
            .as("avg_qty"),
          expr("(CAST(sum_qty AS DOUBLE) * CAST(n_base AS DOUBLE)) / " +
            "(CAST(n_items AS DOUBLE) * CAST(sumq_base AS DOUBLE))")
            .as("qty_lift_vs_no_discount"))
        .orderBy("disc_pct")
    } {
      """WITH li AS (
        |  SELECT CAST(ROUND(l_discount * 100) AS BIGINT) AS disc_pct,
        |    CAST(ROUND(l_quantity) AS BIGINT) AS qty
        |  FROM lineitem),
        |bands AS (
        |  SELECT disc_pct, CAST(COUNT(*) AS BIGINT) AS n_items,
        |    CAST(SUM(qty) AS BIGINT) AS sum_qty
        |  FROM li GROUP BY disc_pct),
        |base AS (
        |  SELECT n_items AS n_base, sum_qty AS sumq_base
        |  FROM bands WHERE disc_pct = 0)
        |SELECT disc_pct, n_items,
        |  CAST(sum_qty AS DOUBLE) / CAST(n_items AS DOUBLE) AS avg_qty,
        |  (CAST(sum_qty AS DOUBLE) * CAST(n_base AS DOUBLE))
        |    / (CAST(n_items AS DOUBLE) * CAST(sumq_base AS DOUBLE))
        |    AS qty_lift_vs_no_discount
        |FROM bands CROSS JOIN base
        |ORDER BY disc_pct""".stripMargin
    },

    // ------------------------------------------------------------------
    // q325: PRICE-ELASTICITY SCREEN — per brand, the correlation between
    // weekly realized unit price and weekly volume: the first-pass
    // merchandising question (q287 measures lift per DISCOUNT band;
    // this reads the price→volume relationship off the observed weekly
    // series). Weekly operands are exact int64 (qty; unit price as
    // cents·10 div qty — floor division, identical truncation on both
    // engines for positive operands); Pearson moments are exact int64
    // sums over ≤ calendar-bounded weeks per brand (OVERFLOW CONTRACT:
    // per-(brand, week) quantity < ~3e9 keeps Σy², the widest moment,
    // inside int64 at any corpus scale — a per-group bound, like
    // Det.csum's); r is one shared IEEE chain, NULL on degenerate
    // variance. Two keyed aggs (lineitem → brand-week → brand), the
    // part dimension broadcasts.
    QueryDef.sql("q325_price_elasticity") { (s, d) =>
      val li = Tables(s, d, "lineitem")
        .select(col("l_partkey"),
          expr("CAST(datediff(CAST(l_shipdate AS DATE), DATE '1970-01-01') div 7 AS BIGINT)")
            .as("wk"),
          expr("CAST(l_quantity AS BIGINT)").as("qty"),
          expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)").as("cents"))
      val p = broadcast(Tables(s, d, "part")
        .select(col("p_partkey"), col("p_brand")))
      val wkrel = li.join(p, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("wk"))
        .agg(sum(col("qty")).as("x"), sum(col("cents")).as("c"))
        .withColumn("y", expr("(c * 10) div x"))
      val mom = wkrel.groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("x")).as("sum_qty"))
      mom.select(col("p_brand"), col("n").as("n_weeks"), col("sum_qty"),
          expr(ElasticityCorrExpr).as("price_volume_corr"))
        .orderBy("p_brand")
    } {
      s"""WITH li AS (
         |  SELECT l_partkey,
         |    CAST((CAST(l_shipdate AS DATE) - DATE '1970-01-01') // 7
         |      AS BIGINT) AS wk,
         |    CAST(l_quantity AS BIGINT) AS qty,
         |    CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
         |  FROM lineitem),
         |wkrel AS (
         |  SELECT p_brand, wk, CAST(SUM(qty) AS BIGINT) AS x,
         |    CAST(SUM(cents) AS BIGINT) AS c
         |  FROM li JOIN part ON l_partkey = p_partkey
         |  GROUP BY p_brand, wk),
         |w2 AS (SELECT p_brand, x, (c * 10) // x AS y FROM wkrel),
         |mom AS (
         |  SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         |    CAST(SUM(x * y) AS BIGINT) AS sxy,
         |    CAST(SUM(x * x) AS BIGINT) AS sxx,
         |    CAST(SUM(y * y) AS BIGINT) AS syy,
         |    CAST(SUM(x) AS BIGINT) AS sum_qty
         |  FROM w2 GROUP BY p_brand)
         |SELECT p_brand, n AS n_weeks, sum_qty,
         |  $ElasticityCorrSql AS price_volume_corr
         |FROM mom
         |ORDER BY p_brand""".stripMargin
    },

    // ------------------------------------------------------------------
    // q339: l-DIVERSITY AUDIT — the homogeneity-attack check k-anonymity
    // (q177) misses: a quasi-identifier class can be large (k-anonymous)
    // while every member shares ONE sensitive value, so membership alone
    // leaks it. Per QI class (nation, segment), the count of DISTINCT
    // sensitive values (the balance band q177 treats as a third QI);
    // per nation: classes below l = 3, rows exposed in them, and the
    // worst class. All-integer — exact on both engines.
    //
    // Shape at 100 TB: one dimension scan → (QI, sensitive) keyed
    // two-level distinct agg (the q177/q197 posture) → nation-sized
    // rollup. Nothing corpus-sized after the first agg.
    QueryDef.sql("q339_l_diversity") { (s, d) =>
      val classes = Tables(s, d, "customer")
        .select(col("c_nationkey"), col("c_mktsegment"),
          expr("CAST(FLOOR(c_acctbal / 1000) AS BIGINT)").as("bal_band"))
        .groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("sz"),
          countDistinct(col("bal_band")).as("l"))
      classes.groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_classes"),
          sum(when(col("l") < 3, 1L).otherwise(0L)).as("n_low_diversity"),
          sum(when(col("l") < 3, col("sz")).otherwise(0L))
            .as("n_rows_at_risk"),
          min(col("l")).as("min_diversity"))
        .orderBy("c_nationkey")
    } {
      """WITH cls AS (
        |  SELECT c_nationkey, c_mktsegment,
        |    COUNT(*) AS sz,
        |    COUNT(DISTINCT CAST(FLOOR(c_acctbal / 1000) AS BIGINT)) AS l
        |  FROM customer GROUP BY c_nationkey, c_mktsegment)
        |SELECT c_nationkey,
        |  COUNT(*) AS n_classes,
        |  CAST(SUM(CASE WHEN l < 3 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_low_diversity,
        |  CAST(SUM(CASE WHEN l < 3 THEN sz ELSE 0 END) AS BIGINT)
        |    AS n_rows_at_risk,
        |  CAST(MIN(l) AS BIGINT) AS min_diversity
        |FROM cls GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin
    }
  )

  // q325's Pearson r off exact int64 moments: every product of sums runs
  // in DOUBLE (identical IEEE chain on both engines — the q272 posture);
  // NULL when either variance is degenerate. defs, not vals: `val
  // queries` above interpolates the oracle EAGERLY at object init, and
  // a val declared after it would interpolate as "null" (the
  // RegistrySpec init-order trap).
  private def ElasticityCorrExpr: String =
    "CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - " +
      "CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * " +
      "(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - " +
      "CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) <= 0.0 THEN NULL " +
      "ELSE (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - " +
      "CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / " +
      "SQRT((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - " +
      "CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * " +
      "(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - " +
      "CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) END"

  private def ElasticityCorrSql: String = ElasticityCorrExpr

  /** q125's sketch size. 256 keeps the estimation path (n > k) exercised
    * at the sf0.01 correctness gate (~1.6k user-days/segment) while the
    * sf0.001 fixture (~160/segment) exercises the exact small-set path;
    * rse ≈ 1/√(k−2) ≈ 6%.
    */
  final val KmvK = 256

  /** KMV distinct estimate — ONE dialect-shared fragment: exact count
    * below k, else (k−1)·2³² over the k-th smallest hash (exact-integer
    * operands, one correctly-rounded IEEE division).
    */
  def kmvEst(n: String, hk: String): String =
    s"CASE WHEN $n < $KmvK THEN CAST($n AS DOUBLE) " +
      s"ELSE (${KmvK - 1}.0 * 4294967296.0) / CAST($hk AS DOUBLE) END"

  /** Accuracy-contract boolean, dialect-shared. */
  def kmvBand(est: String, exact: String, tol: String): String =
    s"ABS(($est) - CAST($exact AS DOUBLE)) <= CAST($exact AS DOUBLE) * $tol"

  /** q269's H statistic from (n_total, s2 = Σ(2R)²/n) — one shared IEEE
    * chain: 3·s2/(N(N+1)) − 3(N+1) (the 12/4 constant of doubled ranks).
    */
  private def KwHExpr: String =
    "(3.0 * s2) / (CAST(n_total AS DOUBLE) * CAST(n_total + 1 AS DOUBLE))" +
      " - 3.0 * CAST(n_total + 1 AS DOUBLE)"

  /** q269's tie-correction factor 1 − Σ(t³−t)/(N³−N), products in double
    * (N³ overflows int64 past N ≈ 2e6).
    */
  private def KwTieExpr: String =
    "1.0 - CAST(tie_sum AS DOUBLE) / (CAST(n_total AS DOUBLE) * " +
      "CAST(n_total AS DOUBLE) * CAST(n_total AS DOUBLE) - CAST(n_total AS DOUBLE))"

  /** q270's deterministic Poisson(1) weight: the 32-bit md5 hash
    * fragment `h` mapped to u ∈ [0,1) (exactly representable — h/2³²)
    * and inverted through the exact CDF literals (shortest round-trip
    * doubles; both engines parse the identical values). P(w=8 bucket,
    * the open tail) ≈ 1.1e-6.
    */
  private def PoissonWExpr: String = {
    val cum = Seq(
      "0.36787944117144233", "0.7357588823428847", "0.9196986029286058",
      "0.9810118431238463", "0.9963401531726563", "0.9994058151824183",
      "0.999916758850712", "0.9999897508033253", "0.999998874797402")
    val whens = cum.zipWithIndex
      .map { case (c, k) => s"WHEN u < $c THEN $k" }.mkString(" ")
    s"CAST(CASE $whens ELSE 9 END AS BIGINT)"
  }

  /** q272's seasonal strength eta² = (n·F − S²)/(n·Q − S²) over exact
    * operands (F from the ordered weekday fold), NULL on zero variance.
    */
  private def Eta2Expr: String =
    "CASE WHEN CAST(n_all AS DOUBLE) * CAST(q_all AS DOUBLE) - " +
      "CAST(s_all AS DOUBLE) * CAST(s_all AS DOUBLE) <= 0.0 THEN NULL " +
      "ELSE (CAST(n_all AS DOUBLE) * f - " +
      "CAST(s_all AS DOUBLE) * CAST(s_all AS DOUBLE)) / " +
      "(CAST(n_all AS DOUBLE) * CAST(q_all AS DOUBLE) - " +
      "CAST(s_all AS DOUBLE) * CAST(s_all AS DOUBLE)) END"
}
