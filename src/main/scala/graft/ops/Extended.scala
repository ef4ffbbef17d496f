package graft.ops

import graft.{Det, QueryDef, Tables}
import graft.Det.{dsum, dsumSql}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Coverage beyond the core set: outer joins, CUBE grouping sets, HLL
  * approximate distinct, and array aggregation/functions.
  */
object Extended {

  /** q148's candidate generator over an arbitrary `(name, len)` relation:
    * Gravano et al.'s (VLDB'01) q-gram count filter for lev ≤ 2, plus the
    * dedicated ≤6-char short block. Duplicate grams are KEPT: distinct
    * grams would undercount shared bigrams for names with repeated grams
    * ('ue', 'e ' repeat routinely in p_names) and the count filter could
    * silently drop true pairs. Joining the full positional bags
    * over-counts (r_a·r_b per repeated gram ≥ the bag-intersection min),
    * which only ADMITS extra candidates — safe for a lower-bound filter;
    * the caller's levenshtein verification prunes. Factored out so the
    * loss-free claim is testable on adversarial repeated-gram names
    * (ExtendedSpec) independent of the part table.
    */
  def levenshteinCandidates(names: DataFrame): DataFrame = {
    val grams = names
      .select(col("name"), col("len"),
        explode(expr(
          "transform(sequence(1, len - 1), i -> substring(name, i, 2))"))
          .as("g"))
    val ga = grams.select(col("g"), col("name").as("name_a"), col("len").as("la"))
    val gb = grams.select(col("g").as("g2"), col("name").as("name_b"), col("len").as("lb"))
    val byGram = ga.join(gb, col("g") === col("g2") &&
        col("name_a") < col("name_b") &&
        abs(col("la") - col("lb")) <= 2)
      .groupBy(col("name_a"), col("name_b"), col("la"), col("lb"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= greatest(col("la"), col("lb")) - lit(5))
      .select(col("name_a"), col("name_b"))
    val short = names.filter(col("len") <= 6)
    val shortPairs = short.select(col("name").as("name_a"))
      .crossJoin(short.select(col("name").as("name_b")))
      .filter(col("name_a") < col("name_b"))
    byGram.unionAll(shortPairs).distinct()
  }

  val queries: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------------
    // q37: full outer join of two sparse keyed aggregates — both null
    // sides occur (high-balance customers exist in more nations than
    // high-balance suppliers).
    QueryDef.sql("q37_full_outer_nations") { (s, d) =>
      val richCust = Tables(s, d, "customer").filter(col("c_acctbal") > 9900)
        .groupBy(col("c_nationkey").as("nk_c"))
        .agg(count(lit(1)).as("n_rich_customers"))
      val richSupp = Tables(s, d, "supplier").filter(col("s_acctbal") > 9900)
        .groupBy(col("s_nationkey").as("nk_s"))
        .agg(count(lit(1)).as("n_rich_suppliers"))
      richCust.join(richSupp, col("nk_c") === col("nk_s"), "full_outer")
        .select(
          coalesce(col("nk_c"), col("nk_s")).as("nationkey"),
          coalesce(col("n_rich_customers"), lit(0L)).as("n_rich_customers"),
          coalesce(col("n_rich_suppliers"), lit(0L)).as("n_rich_suppliers"))
        .orderBy("nationkey")
    } {
      """WITH c AS (SELECT c_nationkey AS nk, COUNT(*) AS n_rich_customers
        |           FROM customer WHERE c_acctbal > 9900 GROUP BY 1),
        |     s AS (SELECT s_nationkey AS nk, COUNT(*) AS n_rich_suppliers
        |           FROM supplier WHERE s_acctbal > 9900 GROUP BY 1)
        |SELECT COALESCE(c.nk, s.nk) AS nationkey,
        |  COALESCE(n_rich_customers, 0) AS n_rich_customers,
        |  COALESCE(n_rich_suppliers, 0) AS n_rich_suppliers
        |FROM c FULL OUTER JOIN s ON c.nk = s.nk
        |ORDER BY nationkey""".stripMargin
    },

    // ------------------------------------------------------------------
    // q38: CUBE over two dimensions with grouping indicators (all four
    // grouping sets in one pass — Spark expands to a single shuffle).
    QueryDef.sql("q38_cube_status") { (s, d) =>
      val ord = Tables(s, d, "orders")
      ord.cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(
          grouping(col("o_orderstatus")).cast("int").as("g_s"),
          grouping(col("o_orderpriority")).cast("int").as("g_p"),
          count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("sum_price"))
        .orderBy(col("g_s"), col("g_p"), col("o_orderstatus"), col("o_orderpriority"))
    } {
      s"""SELECT o_orderstatus, o_orderpriority,
         |  CAST(GROUPING(o_orderstatus) AS INT) AS g_s,
         |  CAST(GROUPING(o_orderpriority) AS INT) AS g_p,
         |  COUNT(*) AS n_orders,
         |  ${dsumSql("o_totalprice")} AS sum_price
         |FROM orders
         |GROUP BY CUBE (o_orderstatus, o_orderpriority)
         |ORDER BY g_s, g_p, o_orderstatus, o_orderpriority""".stripMargin
    },

    // ------------------------------------------------------------------
    // q39: HLL approximate distinct (approx_count_distinct). Sketch
    // internals are engine-specific, so no SQL oracle — ExtendedSpec
    // bounds the estimate against the exact count instead.
    QueryDef.noOracle("q39_approx_distinct_parts") { (s, d) =>
      val li = Tables(s, d, "lineitem")
      li.groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_partkey"), rsd = 0.02).as("approx_parts"),
          approx_count_distinct(col("l_suppkey"), rsd = 0.02).as("approx_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")
    },

    // ------------------------------------------------------------------
    // q45: explicit GROUPING SETS — two unrelated rollup dimensions in
    // one pass (by status and by year), without the full cube.
    QueryDef.sql("q45_grouping_sets") { (s, d) =>
      Tables(s, d, "orders").createOrReplaceTempView("orders_gs")
      s.sql(s"""
        |SELECT o_orderstatus, YEAR(o_orderdate) AS y,
        |  CAST(GROUPING(o_orderstatus) AS INT) AS g_s,
        |  CAST(GROUPING(YEAR(o_orderdate)) AS INT) AS g_y,
        |  COUNT(*) AS n_orders,
        |  ${dsumSql("o_totalprice")} AS sum_price
        |FROM orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus), (YEAR(o_orderdate)))
        |ORDER BY g_s, g_y, o_orderstatus, y""".stripMargin)
    } {
      s"""SELECT o_orderstatus, CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS y,
         |  CAST(GROUPING(o_orderstatus) AS INT) AS g_s,
         |  CAST(GROUPING(EXTRACT(YEAR FROM o_orderdate)) AS INT) AS g_y,
         |  COUNT(*) AS n_orders,
         |  ${dsumSql("o_totalprice")} AS sum_price
         |FROM orders
         |GROUP BY GROUPING SETS ((o_orderstatus), (EXTRACT(YEAR FROM o_orderdate)))
         |ORDER BY g_s, g_y, o_orderstatus, y""".stripMargin
    },

    // ------------------------------------------------------------------
    // q43: right outer join — every customer kept, orders optional;
    // customers with no 2001 orders surface with zero counts.
    QueryDef.sql("q43_right_outer_customers") { (s, d) =>
      val ord01 = Tables(s, d, "orders").filter(
        col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
      val cust = Tables(s, d, "customer")
      ord01.join(cust, col("o_custkey") === col("c_custkey"), "right_outer")
        .groupBy(col("c_mktsegment"))
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          countDistinct(col("c_custkey")).as("n_customers"),
          sum(when(col("o_orderkey").isNull, 1).otherwise(0)).as("n_customers_no_order"))
        .orderBy("c_mktsegment")
    } {
      """SELECT c_mktsegment,
        |  COUNT(o_orderkey) AS n_orders,
        |  COUNT(DISTINCT c_custkey) AS n_customers,
        |  CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_customers_no_order
        |FROM (SELECT * FROM orders
        |      WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00') o
        |RIGHT JOIN customer ON o.o_custkey = c_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin
    },

    // ------------------------------------------------------------------
    // q42: typed Aggregator UDAF (graft.functions.ExactMoments): exact
    // decimal moments → deterministic mean/variance per event type.
    QueryDef.sql("q42_typed_moments") { (s, d) =>
      val moments = udaf(graft.functions.ExactMoments)
      Tables(s, d, "events")
        .groupBy(col("event_type"))
        .agg(moments(col("value")).as("m"))
        .select(col("event_type"), col("m.n").as("n"),
          col("m.mean").as("mean_value"), col("m.variance").as("var_value"))
        .orderBy("event_type")
    } {
      """WITH t AS (
        |  SELECT event_type, COUNT(*) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s,
        |    CAST(SUM(CAST(value * value AS DECIMAL(18,6))) AS DOUBLE) AS ss
        |  FROM events GROUP BY event_type)
        |SELECT event_type, n,
        |  s / n AS mean_value,
        |  ss / n - (s / n) * (s / n) AS var_value
        |FROM t
        |ORDER BY event_type""".stripMargin
    },

    // ------------------------------------------------------------------
    // q40: array aggregation + array functions: per-order item lists
    // (sorted for determinism), membership and bounds over the array.
    QueryDef.sql("q40_order_item_arrays") { (s, d) =>
      // The array column is emitted comma-joined (numeric sort preserved)
      // so the driver's pandas/DuckDB compare can hash the cell; the
      // array-typed form is orderItemArrays, covered by ExtendedSpec.
      orderItemArrays(s, d)
        .withColumn("part_keys",
          array_join(transform(col("part_keys"), _.cast("string")), ","))
        .orderBy("l_orderkey")
    } {
      s"""SELECT l_orderkey, COUNT(*) AS n_items,
         |  STRING_AGG(l_partkey, ',' ORDER BY l_partkey) AS part_keys,
         |  ${Det.csumSql("l_quantity", 0)} AS total_qty,
         |  MAX(l_partkey) AS max_part,
         |  MIN(l_partkey) AS first_part
         |FROM lineitem
         |GROUP BY l_orderkey
         |HAVING COUNT(*) >= 7
         |ORDER BY l_orderkey""".stripMargin
    },

    // ------------------------------------------------------------------
    // q46: LEFT OUTER join with null-side aggregation: every order kept,
    // returned-lineitem rollup optional. Right side is pre-aggregated to
    // one row per order key before the join (shuffle on o_orderkey /
    // l_orderkey), so the outer join never multiplies rows.
    QueryDef.sql("q46_left_outer_returns") { (s, d) =>
      val ret = Tables(s, d, "lineitem").filter(col("l_returnflag") === "R")
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_ret_items"), Det.csum(col("l_extendedprice"), 2).as("ret_value"))
      Tables(s, d, "orders")
        .join(ret, col("o_orderkey") === col("l_orderkey"), "left_outer")
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(when(col("l_orderkey").isNull, 1L).otherwise(0L)).as("n_no_returns"),
          Det.csum(coalesce(col("ret_value"), lit(0.0)), 2).as("total_ret_value"))
        .orderBy("o_orderpriority")
    } {
      s"""WITH r AS (
         |  SELECT l_orderkey, COUNT(*) AS n_ret_items,
         |    ${Det.csumSql("l_extendedprice", 2)} AS ret_value
         |  FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_orderkey)
         |SELECT o_orderpriority, COUNT(*) AS n_orders,
         |  CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_no_returns,
         |  ${Det.csumSql("COALESCE(ret_value, 0.0)", 2)} AS total_ret_value
         |FROM orders LEFT JOIN r ON o_orderkey = l_orderkey
         |GROUP BY o_orderpriority
         |ORDER BY o_orderpriority""".stripMargin
    },

    // ------------------------------------------------------------------
    // q47: map-typed functions — from_json(props) → MapType, then
    // element_at / map_keys / map_values (folded per row) feeding a keyed
    // aggregate. Per-row scalar work + one shuffle on event_type.
    QueryDef.sql("q47_map_props") { (s, d) =>
      Tables(s, d, "events")
        .withColumn("m", from_json(col("props"),
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.IntegerType)))
        .withColumn("k_val", element_at(col("m"), "k"))
        .withColumn("key_shape", array_join(array_sort(map_keys(col("m"))), ","))
        .withColumn("val_total", expr("aggregate(map_values(m), 0, (acc, x) -> acc + x)"))
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          sum(col("k_val")).as("sum_k"),
          min(col("k_val")).as("min_k"),
          max(col("k_val")).as("max_k"),
          countDistinct(col("k_val")).as("n_distinct_k"),
          min(col("key_shape")).as("key_shape"),
          sum(col("val_total")).as("sum_vals"))
        .orderBy("event_type")
    } {
      """WITH t AS (
        |  SELECT event_type,
        |    CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
        |    ARRAY_TO_STRING(LIST_SORT(json_keys(props::JSON)), ',') AS key_shape,
        |    CAST(LIST_SUM(LIST_TRANSFORM(json_keys(props::JSON),
        |      key -> CAST(json_extract_string(props, '$.' || key) AS INT))) AS INT)
        |      AS val_total
        |  FROM events)
        |SELECT event_type, COUNT(*) AS n_events,
        |  CAST(SUM(k_val) AS BIGINT) AS sum_k,
        |  MIN(k_val) AS min_k, MAX(k_val) AS max_k,
        |  COUNT(DISTINCT k_val) AS n_distinct_k,
        |  MIN(key_shape) AS key_shape,
        |  CAST(SUM(val_total) AS BIGINT) AS sum_vals
        |FROM t GROUP BY event_type ORDER BY event_type""".stripMargin
    },

    // ------------------------------------------------------------------
    // q48: the ranking window family over real ties — rank/dense_rank on
    // a banded price (ties within a band), ntile over a fully-ordered
    // spec (tie order inside a band would otherwise be engine-specific).
    //
    // SCALE CONTRACT: rank-family windows sort each partition in ONE
    // task, so the partition key must be high-cardinality relative to the
    // data (like q54's (lang, shard) packing key). o_orderpriority's 5
    // values are the tie-semantics DEMO; ranking a 100 TB table demands
    // either a finer key (e.g. priority × date bucket, when per-bucket
    // ranks are acceptable) or a two-pass global shape: range-partition
    // on the order column, rank within ranges, then add per-range row
    // counts as offsets — the orderBy().limit() family below already
    // relies on Spark's range partitioner the same way.
    QueryDef.sql("q48_rank_family") { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val ord = Tables(s, d, "orders")
        .withColumn("price_band", floor(col("o_totalprice") / 1000).cast("long"))
      val wRank = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("price_band").desc)
      val wTile = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("price_band").desc, col("o_orderkey"))
      ord.select(
          col("o_orderkey"), col("o_orderpriority"), col("price_band"),
          rank().over(wRank).as("rnk"),
          dense_rank().over(wRank).as("drnk"),
          ntile(4).over(wTile).as("tile"))
        .orderBy("o_orderkey")
    } {
      """SELECT o_orderkey, o_orderpriority,
        |  CAST(FLOOR(o_totalprice / 1000) AS BIGINT) AS price_band,
        |  RANK() OVER wr AS rnk,
        |  DENSE_RANK() OVER wr AS drnk,
        |  NTILE(4) OVER wt AS tile
        |FROM orders
        |WINDOW
        |  wr AS (PARTITION BY o_orderpriority
        |         ORDER BY CAST(FLOOR(o_totalprice / 1000) AS BIGINT) DESC),
        |  wt AS (PARTITION BY o_orderpriority
        |         ORDER BY CAST(FLOOR(o_totalprice / 1000) AS BIGINT) DESC, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin
    },

    // ------------------------------------------------------------------
    // q97: SALTED JOIN answer preservation — Scale.saltedJoin splits each
    // hot key's rows over 8 salt buckets (left side salted by a row-level
    // hash, right side replicated ×8 with matching salts) so one skewed
    // key's shuffle partition becomes 8 parallel tasks. The query proves
    // the rewrite is ANSWER-PRESERVING: the oracle is the PLAIN join —
    // same aggregate, no salt anywhere. Use when AQE's skew handling
    // can't kick in (e.g. a skewed BROADCAST-ineligible dimension or
    // pre-AQE materialization points); q77's skew profile is the
    // decision input.
    QueryDef.sql("q97_salted_join") { (s, d) =>
      val joined = graft.ops.Scale.saltedJoin(
        Tables(s, d, "events"), Tables(s, d, "customer"),
        "user_id", "c_custkey", col("event_id"), saltFactor = 8)
      joined.groupBy(col("c_mktsegment"))
        .agg(
          count(lit(1)).as("n_events"),
          Det.dsum(col("value")).as("total_value"))
        .orderBy("c_mktsegment")
    } {
      s"""SELECT c_mktsegment, COUNT(*) AS n_events,
         |  ${Det.dsumSql("value")} AS total_value
         |FROM events JOIN customer ON user_id = c_custkey
         |GROUP BY c_mktsegment
         |ORDER BY c_mktsegment""".stripMargin
    },

    // ------------------------------------------------------------------
    // q148: EXACT EDIT-DISTANCE SIMILARITY JOIN (record linkage) —
    // every distinct-name pair within Levenshtein ≤ 2, with per-name
    // record counts: the entity-resolution primitive (catalog merge,
    // near-miss entity match) as an EXACT blocked join, never a name ×
    // name cross product. Candidate generation is Gravano et al.'s
    // (VLDB'01) q-gram count filtering, answer-preserving: one edit
    // destroys ≤ q = 2 positional bigrams, so lev(a,b) ≤ d = 2 forces
    // ≥ max(|a|,|b|) − 1 − q·d shared bigrams — the bigram-postings
    // pair counts (keyed agg, shuffle on bigram then pair) plus the
    // length filter |len diff| ≤ 2 cover every true pair whose longer
    // name has ≥ 7 chars. Pairs where BOTH names are ≤ 6 chars could
    // share zero bigrams, so a dedicated short block (alphabet-bounded:
    // the ≤6-char name universe, a few thousand rows at ANY corpus
    // scale) cross-joins only within itself. Candidates verify on
    // codegen'd `levenshtein`; the oracle is the brute-force join over
    // the distinct-name relation, so the filter chain is proven
    // loss-free at every Verify run, not just in the spec.
    QueryDef.sql("q148_name_linkage_join") { (s, d) =>
      val names = Tables(s, d, "part")
        .groupBy(col("p_name").as("name"))
        .agg(count(lit(1)).as("n_recs"))
        .withColumn("len", length(col("name")))
      val withDist = levenshteinCandidates(names)
        .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
        .filter(col("dist") <= 2)
      withDist
        .join(names.select(col("name").as("name_a"), col("n_recs").as("n_recs_a")), "name_a")
        .join(names.select(col("name").as("name_b"), col("n_recs").as("n_recs_b")), "name_b")
        .select(col("name_a"), col("name_b"), col("dist"),
          col("n_recs_a"), col("n_recs_b"))
        .orderBy("name_a", "name_b")
    } {
      """WITH names AS (
        |  SELECT p_name AS name, COUNT(*) AS n_recs
        |  FROM part GROUP BY 1)
        |SELECT a.name AS name_a, b.name AS name_b,
        |  LEVENSHTEIN(a.name, b.name) AS dist,
        |  a.n_recs AS n_recs_a, b.n_recs AS n_recs_b
        |FROM names a JOIN names b ON a.name < b.name
        |WHERE LEVENSHTEIN(a.name, b.name) <= 2
        |ORDER BY name_a, name_b""".stripMargin
    },

    // ------------------------------------------------------------------
    // q98: DISTRIBUTION RANKS — the rest of the rank family over the
    // q48 fixture: percent_rank and cume_dist on the tie-aware ordering
    // (both are exact-integer ratios → bit-identical doubles), plus
    // nth_value over the tie-broken total order (same running frame on
    // both engines). Same high-cardinality partition key as q48.
    QueryDef.sql("q98_rank_distributions") { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val ord = Tables(s, d, "orders")
        .withColumn("price_band", floor(col("o_totalprice") / 1000).cast("long"))
      val wRank = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("price_band").desc)
      val wTotal = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("price_band").desc, col("o_orderkey"))
      ord.select(
          col("o_orderkey"), col("o_orderpriority"), col("price_band"),
          percent_rank().over(wRank).as("pct_rank"),
          cume_dist().over(wRank).as("cume"),
          nth_value(col("price_band"), 2).over(wTotal).as("second_band"))
        .orderBy("o_orderkey")
    } {
      """SELECT o_orderkey, o_orderpriority,
        |  CAST(FLOOR(o_totalprice / 1000) AS BIGINT) AS price_band,
        |  PERCENT_RANK() OVER wr AS pct_rank,
        |  CUME_DIST() OVER wr AS cume,
        |  NTH_VALUE(CAST(FLOOR(o_totalprice / 1000) AS BIGINT), 2) OVER wt
        |    AS second_band
        |FROM orders
        |WINDOW
        |  wr AS (PARTITION BY o_orderpriority
        |         ORDER BY CAST(FLOOR(o_totalprice / 1000) AS BIGINT) DESC),
        |  wt AS (PARTITION BY o_orderpriority
        |         ORDER BY CAST(FLOOR(o_totalprice / 1000) AS BIGINT) DESC, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin
    },

    // ------------------------------------------------------------------
    // q182: SKYLINE (PARETO FRONTIER) — the customers no other customer
    // beats on BOTH lifetime spend and account balance (dominance:
    // ≥ on both, > on one): the multi-criteria "best tradeoffs" query
    // (Börzsönyi et al., ICDE'01) that a max() cannot express and a
    // naive formulation answers with an O(n²) self-join. DISTRIBUTED
    // two-phase shape: phase 1 computes a LOCAL skyline inside each of
    // 32 md5-hash buckets — answer-preserving, since a bucket-mate that
    // dominates a point locally also dominates it globally, so only
    // non-skyline points are discarded — and phase 2 re-runs the exact
    // dominance test on the tiny survivor union (≤ buckets × skyline
    // size; skylines of anti-correlated data grow ~log n per bucket).
    // Per-bucket dominance is two RANGE windows on the spend value, not
    // a pair join: dominated ⇔ max(bal over spend' > spend) ≥ bal OR
    // max(bal over spend' = spend) > bal. Exact integer cents
    // end-to-end; the oracle is the brute-force NOT EXISTS, so the
    // bucket prune is re-proven loss-free on every Verify run.
    QueryDef.sql("q182_skyline_pareto") { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      // Both dominance windows must be INCREMENTAL (O(n) per bucket):
      // the strictly-greater-spend max runs as an unbounded-preceding
      // frame over DESCENDING spend (Spark's running-frame path — an
      // (1, unboundedFollowing) frame re-scans the tail per row, which
      // measured super-linear, 20x at 10x data), and the equal-spend max
      // is a whole-partition aggregate keyed on (bucket, spend).
      def survivors(df: DataFrame, bucketed: Boolean): DataFrame = {
        val part = if (bucketed) Seq(col("b")) else Seq.empty[Column]
        val wGt = Window.partitionBy(part: _*).orderBy(col("spend").desc)
          .rangeBetween(Window.unboundedPreceding, -1L)
        val wEq = Window.partitionBy(part :+ col("spend"): _*)
        df.withColumn("m1", max(col("bal")).over(wGt))
          .withColumn("m2", max(col("bal")).over(wEq))
          .filter((col("m1").isNull || col("m1") < col("bal")) &&
            col("m2") <= col("bal"))
          .drop("m1", "m2")
      }
      val spend = Tables(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)")).as("spend"))
      val pts = spend.join(
        Tables(s, d, "customer").select(col("c_custkey"),
          expr("CAST(ROUND(c_acctbal * 100) AS BIGINT)").as("bal")),
        col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("spend"), col("bal"))
        .withColumn("b", pmod(graft.Ids.hash("c_custkey"), lit(32)))
      survivors(survivors(pts, bucketed = true), bucketed = false)
        .select(col("c_custkey"), col("spend"), col("bal"))
        .orderBy("c_custkey")
    } {
      """WITH pts AS (
        |  SELECT c.c_custkey,
        |    CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS spend,
        |    CAST(ROUND(c.c_acctbal * 100) AS BIGINT) AS bal
        |  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        |  GROUP BY c.c_custkey, c.c_acctbal)
        |SELECT p.c_custkey, p.spend, p.bal
        |FROM pts p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM pts q
        |  WHERE q.spend >= p.spend AND q.bal >= p.bal
        |    AND (q.spend > p.spend OR q.bal > p.bal))
        |ORDER BY p.c_custkey""".stripMargin
    },

    // ------------------------------------------------------------------
    // q198: NTILE DECILE BANDING — NTILE(10) per priority over the
    // (price, orderkey) total order, reporting each decile's size and
    // exact value range: completes the rank-function family
    // (q48 rank/dense_rank/row_number, q98 percent_rank/cume_dist/
    // nth_value) with the one member whose semantics differ between
    // naive implementations — the standard fills the first (n mod k)
    // tiles with one extra row, and the hash-match pins both engines to
    // it. The tie-broken ORDER BY makes tile membership deterministic;
    // aggregates are exact cents.
    QueryDef.sql("q198_ntile_deciles") { (s, d) =>
      // two-pass grouped rank (Scale.groupedRank — 5 priorities would
      // cap a plain keyed NTILE window at 5 tasks over the full orders
      // table), with NTILE(k) recomposed from (rank, group count) by the
      // standard's fill rule — the first (n mod k) tiles take
      // ⌈n/k⌉ rows, the rest ⌊n/k⌋: with q = n div k and rem = n mod k,
      //   tile(r) = ⌈r/(q+1)⌉                    for r ≤ (q+1)·rem
      //           = rem + ⌈(r − (q+1)·rem)/q⌉    otherwise
      // (all integer `div` arithmetic — no FP anywhere near a tile
      // boundary; n < k degenerates to tile = r, one row per tile,
      // exactly NTILE's rule). The oracle keeps DuckDB's built-in NTILE,
      // so the hash-match proves the recomposition IS the standard.
      val ranked = graft.ops.Scale.groupedRank(
        Tables(s, d, "orders")
          .select(col("o_orderpriority"), col("o_orderkey"),
            expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").as("cents")),
        Seq("o_orderpriority"), "r", Some("n"),
        col("cents"), col("o_orderkey"))
      ranked
        .withColumn("tile",
          graft.ops.Scale.ntileFromRank(10, col("r"), col("n")))
        .groupBy(col("o_orderpriority"), col("tile"))
        .agg(count(lit(1)).as("n_orders"),
          (min(col("cents")).cast("double") / 100.0).as("lo_value"),
          (max(col("cents")).cast("double") / 100.0).as("hi_value"))
        .orderBy("o_orderpriority", "tile")
    } {
      """WITH t AS (
        |  SELECT o_orderpriority, o_orderkey,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
        |    CAST(NTILE(10) OVER (PARTITION BY o_orderpriority
        |      ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT),
        |        o_orderkey) AS BIGINT) AS tile
        |  FROM orders)
        |SELECT o_orderpriority, tile, COUNT(*) AS n_orders,
        |  CAST(MIN(cents) AS DOUBLE) / 100.0 AS lo_value,
        |  CAST(MAX(cents) AS DOUBLE) / 100.0 AS hi_value
        |FROM t GROUP BY o_orderpriority, tile
        |ORDER BY o_orderpriority, tile""".stripMargin
    },

    // ------------------------------------------------------------------
    // q215: LEAVE-ONE-OUT TARGET ENCODING — the gradient-boosting
    // feature trick for high-cardinality categoricals (encode p_brand
    // by its return rate) done the non-leaking way: each row's encoding
    // excludes ITS OWN target ((sum − y)/(n − 1), plus m-smoothing
    // toward the global prior so rare brands shrink to the mean —
    // Micci-Barreca, SIGKDD Expl.'01). A naive mean encoding leaks the
    // label and a GBM will happily memorize it; LOO is the audit
    // difference this query materializes (enc_mean vs naive_rate).
    // DETERMINISM: counts exact; prior and every encoding are fixed
    // IEEE expression trees (one divide each). The per-row encoding
    // aggregates back to brand level in DECIMAL(18,6) — order-free
    // exact — before ONE cast. SCALE SHAPE: one keyed join
    // (lineitem⋈part on partkey), one brand-keyed moment agg, a
    // broadcast scalar prior, then the per-row encode is map-side
    // arithmetic — the wide relation is never re-shuffled.
    QueryDef.sql("q215_target_encoding") { (s, d) =>
      import org.apache.spark.sql.types.DecimalType
      val D = DecimalType(18, 6)
      val m = 10.0
      val rows = Tables(s, d, "lineitem")
        .join(Tables(s, d, "part").select(col("p_partkey"), col("p_brand")),
          col("l_partkey") === col("p_partkey"))
        .select(col("p_brand").as("brand"),
          when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
      val prior = rows.agg(
        (sum(col("y")).cast("double") / count(lit(1)).cast("double"))
          .as("prior"))
      val stats = rows.groupBy(col("brand"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
      rows.join(stats, "brand").crossJoin(broadcast(prior))
        .withColumn("enc",
          ((col("pos") - col("y")).cast("double") + lit(m) * col("prior")) /
            ((col("n") - 1L).cast("double") + lit(m)))
        .groupBy(col("brand"))
        .agg(
          max(col("n")).as("n_rows"), max(col("pos")).as("n_pos"),
          max(col("prior")).as("prior"),
          (max(col("pos")).cast("double") / max(col("n")).cast("double"))
            .as("naive_rate"),
          sum(col("enc").cast(D)).cast("double").as("enc_sum"),
          min(col("enc")).as("enc_min"), max(col("enc")).as("enc_max"))
        .withColumn("enc_mean", col("enc_sum") / col("n_rows").cast("double"))
        .drop("enc_sum")
        .orderBy("brand")
    } {
      """WITH rows_ AS (
        |  SELECT p.p_brand AS brand,
        |    CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        |pr AS (
        |  SELECT CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
        |    AS prior
        |  FROM rows_),
        |st AS (
        |  SELECT brand, COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS pos
        |  FROM rows_ GROUP BY brand),
        |enc AS (
        |  SELECT r.brand, st.n, st.pos, pr.prior,
        |    (CAST(st.pos - r.y AS DOUBLE) + 10.0 * pr.prior)
        |      / (CAST(st.n - 1 AS DOUBLE) + 10.0) AS enc
        |  FROM rows_ r JOIN st ON r.brand = st.brand CROSS JOIN pr)
        |SELECT brand, MAX(n) AS n_rows, MAX(pos) AS n_pos,
        |  MAX(prior) AS prior,
        |  CAST(MAX(pos) AS DOUBLE) / CAST(MAX(n) AS DOUBLE) AS naive_rate,
        |  MIN(enc) AS enc_min, MAX(enc) AS enc_max,
        |  CAST(SUM(CAST(enc AS DECIMAL(18,6))) AS DOUBLE)
        |    / CAST(MAX(n) AS DOUBLE) AS enc_mean
        |FROM enc GROUP BY brand
        |ORDER BY brand""".stripMargin
    },

    // ------------------------------------------------------------------
    // q237: TOP-K WITH TIES — the rank family's semantics gap: q7/q175
    // take exactly k rows per group (row_number), silently breaking
    // ties by id; ANSI FETCH FIRST k WITH TIES keeps EVERY row tied
    // with the k-th (rank() ≤ k), so group output sizes vary with the
    // data — the correct semantics for leaderboards and SLA reports
    // where "joint third place" is real. Top-3 order SIZES (line
    // count, domain 1–7) per priority: the tiny measure domain
    // guarantees massive ties, so the two semantics differ by
    // thousands of rows (spec-asserted) — exactly the situation where
    // a LIMIT-3 rewrite silently drops the joint leaders. One keyed
    // agg + one keyed rank window, map-side group-limited.
    QueryDef.sql("q237_topk_with_ties") { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val sized = Tables(s, d, "lineitem")
        .join(Tables(s, d, "orders")
          .select(col("o_orderkey"), col("o_orderpriority")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"), col("l_orderkey"))
        .agg(count(lit(1)).as("qty"))
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("qty").desc)
      sized.withColumn("rnk", rank().over(w).cast("long"))
        .filter(col("rnk") <= 3)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_rows_kept"),
          countDistinct(col("qty")).as("n_distinct_qty"),
          max(col("qty")).as("top_qty"), min(col("qty")).as("cut_qty"))
        .orderBy("o_orderpriority")
    } {
      """WITH sized AS (
        |  SELECT o.o_orderpriority, l.l_orderkey,
        |    COUNT(*) AS qty
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  GROUP BY o.o_orderpriority, l.l_orderkey),
        |r AS (
        |  SELECT o_orderpriority, qty,
        |    CAST(RANK() OVER (PARTITION BY o_orderpriority
        |      ORDER BY qty DESC) AS BIGINT) AS rnk
        |  FROM sized)
        |SELECT o_orderpriority, COUNT(*) AS n_rows_kept,
        |  CAST(COUNT(DISTINCT qty) AS BIGINT) AS n_distinct_qty,
        |  MAX(qty) AS top_qty, MIN(qty) AS cut_qty
        |FROM r WHERE rnk <= 3
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin
    },

    // ------------------------------------------------------------------
    // q301: SUBJECT-ACCESS EXPORT — the GDPR/CCPA right-of-access
    // manifest: for ONE subject, every table holding their rows, with
    // row counts and an order-free content checksum (the receipt both
    // the requester and the deletion pipeline — q139 — verify against).
    // The subject here is derived deterministically (md5-min purchaser)
    // so the oracle can replay it; in production it is an input
    // parameter and the derivation scan disappears. Each table's slice
    // is one keyed lookup (partition-prunable / bloom-prunable at
    // scale); lineitem routes through the subject's orders — the same
    // FK walk the deletion propagation uses. The union branches scan
    // DIFFERENT tables, so no shared aggregate is re-planned.
    QueryDef.sql("q301_subject_access_export") { (s, d) =>
      val target = graft.Checkpoints.checkpointLazy(
        Tables(s, d, "events")
          .select(col("user_id"), graft.Ids.hash("user_id").as("h"))
          .orderBy(col("h"), col("user_id")).limit(1)
          .select(col("user_id").as("subject")))
      def slice(df: org.apache.spark.sql.DataFrame, table: String,
          keyCol: String, idHash: org.apache.spark.sql.Column) =
        df.crossJoin(broadcast(target))
          .filter(col(keyCol) === col("subject"))
          .agg(count(lit(1)).as("n_rows"),
            coalesce(sum(idHash), lit(0L)).as("checksum"))
          .select(lit(table).as("table_name"), col("n_rows"),
            col("checksum"))
      val ev = slice(Tables(s, d, "events"), "events", "user_id",
        graft.Ids.hash("event_id"))
      val cu = slice(Tables(s, d, "customer"), "customer", "c_custkey",
        graft.Ids.hash("c_custkey"))
      val or = slice(Tables(s, d, "orders"), "orders", "o_custkey",
        graft.Ids.hash("o_orderkey"))
      val li = Tables(s, d, "lineitem")
        .join(Tables(s, d, "orders").crossJoin(broadcast(target))
            .filter(col("o_custkey") === col("subject"))
            .select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left_semi")
        .agg(count(lit(1)).as("n_rows"),
          coalesce(sum(graft.Ids.hash(
            "concat(cast(l_orderkey AS string), ':', cast(l_linenumber AS string))")),
            lit(0L)).as("checksum"))
        .select(lit("lineitem").as("table_name"), col("n_rows"),
          col("checksum"))
      ev.unionByName(cu).unionByName(or).unionByName(li)
        .orderBy("table_name")
    } {
      s"""WITH subject AS (
         |  SELECT user_id AS s FROM (
         |    SELECT user_id, ${graft.Ids.hashSql("user_id")} AS h
         |    FROM events)
         |  ORDER BY h, user_id LIMIT 1),
         |ev AS (
         |  SELECT 'events' AS table_name, CAST(COUNT(*) AS BIGINT)
         |      AS n_rows,
         |    COALESCE(CAST(SUM(${graft.Ids.hashSql("event_id")})
         |      AS BIGINT), 0) AS checksum
         |  FROM events, subject WHERE user_id = s),
         |cu AS (
         |  SELECT 'customer', CAST(COUNT(*) AS BIGINT),
         |    COALESCE(CAST(SUM(${graft.Ids.hashSql("c_custkey")})
         |      AS BIGINT), 0)
         |  FROM customer, subject WHERE c_custkey = s),
         |orr AS (
         |  SELECT 'orders', CAST(COUNT(*) AS BIGINT),
         |    COALESCE(CAST(SUM(${graft.Ids.hashSql("o_orderkey")})
         |      AS BIGINT), 0)
         |  FROM orders, subject WHERE o_custkey = s),
         |li AS (
         |  SELECT 'lineitem', CAST(COUNT(*) AS BIGINT),
         |    COALESCE(CAST(SUM(${graft.Ids.hashSql(
               "(CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR))")}
         |      ) AS BIGINT), 0)
         |  FROM lineitem
         |  WHERE l_orderkey IN (
         |    SELECT o_orderkey FROM orders, subject WHERE o_custkey = s))
         |SELECT * FROM ev UNION ALL SELECT * FROM cu
         |UNION ALL SELECT * FROM orr UNION ALL SELECT * FROM li
         |ORDER BY table_name""".stripMargin
    },

    // ------------------------------------------------------------------
    // q249: SCHEMA-DRIFT CENSUS — when did a producer add or drop a
    // field? Semi-structured payloads (events.props) rot silently: a
    // new app version ships an extra key, a migration renames one, and
    // every downstream from_json starts reading NULLs. This audits the
    // JSON key population per day — distinct keys present, and keys
    // making their FIRST corpus appearance that day (the new-field
    // alarm) — using q47's parse parity (Spark from_json map_keys ↔
    // DuckDB json_keys). Shape at scale: the (day × key) grid is
    // calendar × schema bounded regardless of fact count; the key
    // explode is scan-side; first-seen is a broadcast-sized relation.
    QueryDef.sql("q249_schema_drift") { (s, d) =>
      val ev = Tables(s, d, "events")
        .select(to_date(col("ts")).as("day"),
          map_keys(from_json(col("props"),
            org.apache.spark.sql.types.MapType(
              org.apache.spark.sql.types.StringType,
              org.apache.spark.sql.types.StringType))).as("keys"))
      val dayKey = ev.select(col("day"), explode(col("keys")).as("key"))
        .groupBy(col("day"), col("key")).agg(count(lit(1)).as("n_rows"))
      val firstSeen = dayKey.groupBy(col("key"))
        .agg(min(col("day")).as("first_day"))
      val perDay = ev.groupBy(col("day")).agg(count(lit(1)).as("n_events"))
      dayKey.join(broadcast(firstSeen), "key")
        .groupBy(col("day"))
        .agg(count(lit(1)).as("n_keys"),
          sum(when(col("first_day") === col("day"), 1L).otherwise(0L))
            .as("n_new_keys"))
        .join(perDay, "day")
        .select(col("day"), col("n_events"), col("n_keys"), col("n_new_keys"))
        .orderBy("day")
    } {
      """WITH ev AS (
        |  SELECT CAST(ts AS DATE) AS day, json_keys(props::JSON) AS keys
        |  FROM events),
        |dk0 AS (SELECT day, UNNEST(keys) AS key FROM ev),
        |dk AS (SELECT DISTINCT day, key FROM dk0),
        |fs AS (SELECT key, MIN(day) AS first_day FROM dk GROUP BY key),
        |pe AS (
        |  SELECT day, CAST(COUNT(*) AS BIGINT) AS n_events
        |  FROM ev GROUP BY day)
        |SELECT dk.day, pe.n_events,
        |  CAST(COUNT(*) AS BIGINT) AS n_keys,
        |  CAST(SUM(CASE WHEN fs.first_day = dk.day THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_new_keys
        |FROM dk JOIN fs ON dk.key = fs.key JOIN pe ON pe.day = dk.day
        |GROUP BY dk.day, pe.n_events
        |ORDER BY dk.day""".stripMargin
    }
  )

  /** Array-typed per-order item lists (sorted for determinism) with
    * membership/bounds over the array. q40 stringifies `part_keys` for the
    * oracle harness; this form is what library users get.
    */
  def orderItemArrays(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(
        count(lit(1)).as("n_items"),
        sort_array(collect_list(col("l_partkey"))).as("part_keys"),
        Det.csum(col("l_quantity"), 0).as("total_qty"))
      .filter(col("n_items") >= 7)
      .withColumn("max_part", array_max(col("part_keys")))
      .withColumn("first_part", element_at(col("part_keys"), 1))
}
