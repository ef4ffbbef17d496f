package graft.ops

import graft.{QueryDef, Tables}
import graft.Det.{dsum, dsumSql}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Coverage beyond the core set: outer joins, CUBE grouping sets, HLL
  * approximate distinct, and array aggregation/functions.
  */
object Extended {

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
         |  ${dsumSql("l_quantity")} AS total_qty,
         |  MAX(l_partkey) AS max_part,
         |  MIN(l_partkey) AS first_part
         |FROM lineitem
         |GROUP BY l_orderkey
         |HAVING COUNT(*) >= 7
         |ORDER BY l_orderkey""".stripMargin
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
        dsum(col("l_quantity")).as("total_qty"))
      .filter(col("n_items") >= 7)
      .withColumn("max_part", array_max(col("part_keys")))
      .withColumn("first_part", element_at(col("part_keys"), 1))
}
