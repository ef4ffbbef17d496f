package graft.ops

import graft.{Det, QueryDef, Tables}
import graft.Det.{dsum, dsumSql}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational operator surface (SURVEY.md §2.2): scans, projection and
  * filtering, equi/semi/anti joins, hash aggregation, grouping sets, window
  * functions, sort/top-k, set operations, scalar string/date/math/JSON
  * functions. All pure DataFrame API — Catalyst handles pushdown, join
  * strategy, partial aggregation; dimension tables are broadcast explicitly.
  *
  * The reference (daangn/kinesumer) ships none of these — records pass
  * through opaque (`/root/reference/kinesumer.go:648-654`); this is the
  * analytics layer the library exists to feed.
  */
object Relational {

  val queries: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------------
    // q291: ORDER LEAD-TIME PERCENTILES — the fulfillment SLA report:
    // days from order placement to line shipment, per order priority
    // (exact integer days through one FK-keyed join), with engine-exact
    // P50/P87.5 (binary-exact fractions on integer data — the q57
    // contract) and the mean as one division of exact int64. Scale
    // caveat (q57's, documented there): per-group exact percentile
    // buffers one PRIORITY per aggregation buffer — at extreme scale
    // swap in the q102 two-pass machinery per group; the join itself is
    // one keyed shuffle either way.
    QueryDef.sql("q291_lead_time_percentiles") { (s, d) =>
      val li = Tables(s, d, "lineitem")
        .select(col("l_orderkey"), to_date(col("l_shipdate")).as("ship"))
      val o = Tables(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          to_date(col("o_orderdate")).as("odate"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority"),
          datediff(col("ship"), col("odate")).cast("long").as("lead_days"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"),
          expr("CAST(SUM(lead_days) AS DOUBLE) / COUNT(*)").as("mean_days"),
          expr("percentile(lead_days, 0.5)").as("p50"),
          expr("percentile(lead_days, 0.875)").as("p875"))
        .orderBy("o_orderpriority")
    } {
      """SELECT o_orderpriority,
        |  CAST(COUNT(*) AS BIGINT) AS n_lines,
        |  CAST(CAST(SUM(lead_days) AS BIGINT) AS DOUBLE) / COUNT(*)
        |    AS mean_days,
        |  QUANTILE_CONT(lead_days, 0.5) AS p50,
        |  QUANTILE_CONT(lead_days, 0.875) AS p875
        |FROM (
        |  SELECT o.o_orderpriority,
        |    CAST(CAST(l.l_shipdate AS DATE) - CAST(o.o_orderdate AS DATE)
        |      AS BIGINT) AS lead_days
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey) t
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin
    },

    // ------------------------------------------------------------------
    // q294: SUPPLIER CONCENTRATION (HHI) per brand — the
    // supply-chain-risk census: the Herfindahl–Hirschman index of
    // supplier shipment shares within each part brand, plus the top
    // supplier's share. HHI = Σc² / (Σc)² — the numerator is exact
    // int64 over per-(brand, supplier) counts (valid to ~3e9 lines per
    // cell), the denominator a double product, ONE division; the top
    // share is a max over the same relation. Shape: one fact pass keyed
    // by (brand, supplier) after a broadcast dimension join; everything
    // downstream is brand×supplier bounded.
    QueryDef.sql("q294_supplier_hhi") { (s, d) =>
      val li = Tables(s, d, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"))
      val p = Tables(s, d, "part").select(col("p_partkey"), col("p_brand"))
      val cell = li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("l_suppkey"))
        .agg(count(lit(1)).as("c"))
      cell.groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_suppliers"), sum(col("c")).as("n_lines"),
          sum(col("c") * col("c")).as("sumsq"), max(col("c")).as("maxc"))
        .select(col("p_brand"), col("n_suppliers"), col("n_lines"),
          expr("CAST(sumsq AS DOUBLE) / " +
            "(CAST(n_lines AS DOUBLE) * CAST(n_lines AS DOUBLE))").as("hhi"),
          expr("CAST(maxc AS DOUBLE) / CAST(n_lines AS DOUBLE)")
            .as("top_supplier_share"))
        .orderBy("p_brand")
    } {
      """WITH cell AS (
        |  SELECT p.p_brand, l.l_suppkey, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  GROUP BY p.p_brand, l.l_suppkey)
        |SELECT p_brand,
        |  CAST(COUNT(*) AS BIGINT) AS n_suppliers,
        |  CAST(SUM(c) AS BIGINT) AS n_lines,
        |  CAST(CAST(SUM(c * c) AS BIGINT) AS DOUBLE)
        |    / (CAST(CAST(SUM(c) AS BIGINT) AS DOUBLE)
        |      * CAST(CAST(SUM(c) AS BIGINT) AS DOUBLE)) AS hhi,
        |  CAST(MAX(c) AS DOUBLE) / CAST(CAST(SUM(c) AS BIGINT) AS DOUBLE)
        |    AS top_supplier_share
        |FROM cell GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin
    },

    // ------------------------------------------------------------------
    // q319: BASKET-SIZE HISTOGRAM — the order-line count distribution
    // (capped band 10+), with shares and the max observed basket: the
    // cost model behind every basket-local pair expansion in this
    // library (q145 rules, q152 triangles, q317 cross-shop all pay
    // Σ L² — this is the L distribution that bounds them). One
    // order-keyed count + a ≤10-band census; exact ints, single
    // divisions.
    QueryDef.sql("q319_basket_size_histogram") { (s, d) =>
      val sizes = Tables(s, d, "lineitem")
        .groupBy(col("l_orderkey")).agg(count(lit(1)).as("L"))
      val tot = sizes.agg(count(lit(1)).as("n_orders"),
        max(col("L")).as("max_basket"),
        sum(col("L") * col("L")).as("sum_l2"))
      sizes.withColumn("band", least(col("L"), lit(10L)))
        .groupBy(col("band")).agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(tot))
        .select(col("band"), col("n"),
          expr("CAST(n AS DOUBLE) / CAST(n_orders AS DOUBLE)").as("share"),
          col("max_basket"), col("sum_l2"))
        .orderBy("band")
    } {
      """WITH sz AS (
        |  SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS L
        |  FROM lineitem GROUP BY l_orderkey),
        |tot AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
        |    CAST(MAX(L) AS BIGINT) AS max_basket,
        |    CAST(SUM(L * L) AS BIGINT) AS sum_l2
        |  FROM sz)
        |SELECT LEAST(L, 10) AS band, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(*) AS DOUBLE) / CAST(n_orders AS DOUBLE) AS share,
        |  max_basket, sum_l2
        |FROM sz CROSS JOIN tot
        |GROUP BY LEAST(L, 10), n_orders, max_basket, sum_l2
        |ORDER BY band""".stripMargin
    },

    // ------------------------------------------------------------------
    // q322: ORDER-TO-SHIP CYCLE TIME — the fulfillment SLA number: per
    // order priority, exact P50/P87.5 of days from order date to the
    // LAST line shipment (the customer-visible completion). Quantiles
    // are exact order statistics over the per-(priority, lag-day) value
    // HISTOGRAM (b_k = smallest lag whose cumulative count reaches
    // ⌈n·k/8⌉ — QUANTILE_DISC integer arithmetic, the q273 posture),
    // with the cumulative walk a PRIORITY-KEYED window over ≤ days
    // histogram rows — never a row-level sort. Orders with no shipped
    // lines are out of the population by the join (their cycle time is
    // undefined, not zero). Two orderkey-keyed shuffles + one bounded
    // histogram.
    QueryDef.sql("q322_order_cycle_time") { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val shipped = Tables(s, d, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(max(to_date(col("l_shipdate"))).as("last_ship"))
      val lagrel = shipped.join(Tables(s, d, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority").as("prio"),
          datediff(col("last_ship"), to_date(col("o_orderdate")))
            .cast("long").as("lag"))
      val hist = lagrel.groupBy(col("prio"), col("lag"))
        .agg(count(lit(1)).as("c"))
      val cum = hist.withColumn("cum", sum(col("c")).over(
        Window.partitionBy(col("prio")).orderBy(col("lag"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val n = lagrel.groupBy(col("prio")).agg(count(lit(1)).as("n"))
      val ks = n.select(col("prio").as("kprio"), col("n"),
          explode(typedLit(Seq(4L, 7L))).as("k"))
        .withColumn("t", expr("(n * k + 7) div 8"))
      val bounds = cum.join(broadcast(ks),
          col("prio") === col("kprio") && col("cum") >= col("t"))
        .groupBy(col("prio"), col("k")).agg(min(col("lag")).as("b"))
        .groupBy(col("prio"))
        .agg(max(when(col("k") === 4L, col("b"))).as("p50_days"),
          max(when(col("k") === 7L, col("b"))).as("p875_days"))
      n.join(bounds, "prio")
        .select(col("prio"), col("n").as("n_orders"),
          col("p50_days"), col("p875_days"))
        .orderBy("prio")
    } {
      """WITH shipped AS (
        |  SELECT l_orderkey, MAX(CAST(l_shipdate AS DATE)) AS last_ship
        |  FROM lineitem GROUP BY l_orderkey),
        |lag AS (
        |  SELECT o_orderpriority AS prio,
        |    CAST(last_ship - CAST(o_orderdate AS DATE) AS BIGINT) AS lag
        |  FROM shipped JOIN orders ON l_orderkey = o_orderkey),
        |hist AS (
        |  SELECT prio, lag, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM lag GROUP BY prio, lag),
        |cum AS (
        |  SELECT prio, lag,
        |    CAST(SUM(c) OVER (PARTITION BY prio ORDER BY lag) AS BIGINT)
        |      AS cum
        |  FROM hist),
        |n AS (SELECT prio, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM lag GROUP BY prio),
        |ks AS (
        |  SELECT prio AS kprio, n, k, (n * k + 7) // 8 AS t
        |  FROM n, (SELECT UNNEST([4, 7]) AS k) g),
        |b AS (
        |  SELECT prio, k, CAST(MIN(lag) AS BIGINT) AS b
        |  FROM cum JOIN ks ON prio = kprio AND cum >= t
        |  GROUP BY prio, k),
        |bp AS (
        |  SELECT prio,
        |    MAX(CASE WHEN k = 4 THEN b END) AS p50_days,
        |    MAX(CASE WHEN k = 7 THEN b END) AS p875_days
        |  FROM b GROUP BY prio)
        |SELECT n.prio, n.n AS n_orders, p50_days, p875_days
        |FROM n JOIN bp ON n.prio = bp.prio
        |ORDER BY n.prio""".stripMargin
    },

    // ------------------------------------------------------------------
    // q323: SUPPLIER RETURN EXPOSURE — the vendor-quality leaderboard:
    // per supplier, returned-line share and the exact returned revenue
    // (cents), top-10 by exposure with a deterministic suppkey
    // tie-break. One supplier-keyed agg over lineitem; the supplier
    // dimension broadcasts; top-10 is a TakeOrdered, never a global
    // sort.
    QueryDef.sql("q323_supplier_return_exposure") { (s, d) =>
      val li = Tables(s, d, "lineitem")
        .select(col("l_suppkey"),
          (col("l_returnflag") === "R").cast("long").as("ret"),
          expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)").as("cents"))
      val per = li.groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n_lines"), sum(col("ret")).as("n_returned"),
          sum(when(col("ret") === 1L, col("cents")).otherwise(0L))
            .as("returned_cents"))
      per.join(broadcast(Tables(s, d, "supplier")
          .select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_lines"),
          col("n_returned"),
          expr("CAST(n_returned AS DOUBLE) / CAST(n_lines AS DOUBLE)")
            .as("return_share"),
          col("returned_cents"))
        .orderBy(col("returned_cents").desc, col("s_suppkey"))
        .limit(10)
    } {
      """WITH per AS (
        |  SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n_lines,
        |    CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_returned,
        |    CAST(SUM(CASE WHEN l_returnflag = 'R'
        |      THEN CAST(ROUND(l_extendedprice * 100) AS BIGINT)
        |      ELSE 0 END) AS BIGINT) AS returned_cents
        |  FROM lineitem GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, n_lines, n_returned,
        |  CAST(n_returned AS DOUBLE) / CAST(n_lines AS DOUBLE)
        |    AS return_share,
        |  returned_cents
        |FROM per JOIN supplier ON l_suppkey = s_suppkey
        |ORDER BY returned_cents DESC, s_suppkey
        |LIMIT 10""".stripMargin
    },

    // ------------------------------------------------------------------
    // q324: SPLIT-SHIPMENT RATE — how often an order ships in more than
    // one wave, per priority, with the exact total span (first→last
    // ship day) those split orders impose: the fulfillment-cost and
    // customer-experience number behind "ship complete" policies. One
    // orderkey-keyed agg (distinct ship days per order are in-group),
    // then a 5-group census; exact int sums, single divisions, NULL avg
    // when a priority has no splits.
    QueryDef.sql("q324_split_shipment_rate") { (s, d) =>
      val per = Tables(s, d, "lineitem")
        .select(col("l_orderkey"), to_date(col("l_shipdate")).as("sday"))
        .groupBy(col("l_orderkey"))
        .agg(countDistinct(col("sday")).as("waves"),
          datediff(max(col("sday")), min(col("sday"))).cast("long")
            .as("span"))
      val joined = per.join(Tables(s, d, "orders")
          .select(col("o_orderkey"), col("o_orderpriority")),
          col("l_orderkey") === col("o_orderkey"))
      joined.groupBy(col("o_orderpriority").as("prio"))
        .agg(count(lit(1)).as("n_orders"),
          sum((col("waves") > 1L).cast("long")).as("n_split"),
          sum(when(col("waves") > 1L, col("span")).otherwise(0L))
            .as("split_span_days"))
        .select(col("prio"), col("n_orders"), col("n_split"),
          expr("CAST(n_split AS DOUBLE) / CAST(n_orders AS DOUBLE)")
            .as("split_share"),
          col("split_span_days"),
          expr("CASE WHEN n_split = 0 THEN NULL ELSE " +
            "CAST(split_span_days AS DOUBLE) / CAST(n_split AS DOUBLE) END")
            .as("avg_split_span_days"))
        .orderBy("prio")
    } {
      """WITH per AS (
        |  SELECT l_orderkey,
        |    CAST(COUNT(DISTINCT CAST(l_shipdate AS DATE)) AS BIGINT)
        |      AS waves,
        |    CAST(MAX(CAST(l_shipdate AS DATE))
        |      - MIN(CAST(l_shipdate AS DATE)) AS BIGINT) AS span
        |  FROM lineitem GROUP BY l_orderkey)
        |SELECT o_orderpriority AS prio,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CASE WHEN waves > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_split,
        |  CAST(SUM(CASE WHEN waves > 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) AS split_share,
        |  CAST(SUM(CASE WHEN waves > 1 THEN span ELSE 0 END) AS BIGINT)
        |    AS split_span_days,
        |  CASE WHEN SUM(CASE WHEN waves > 1 THEN 1 ELSE 0 END) = 0
        |    THEN NULL
        |    ELSE CAST(SUM(CASE WHEN waves > 1 THEN span ELSE 0 END)
        |      AS DOUBLE)
        |      / CAST(SUM(CASE WHEN waves > 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |  END AS avg_split_span_days
        |FROM per JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority
        |ORDER BY prio""".stripMargin
    },

    // ------------------------------------------------------------------
    // q326: DISCOUNT-DEPTH AUDIT — what each discount band actually
    // moves: lines, units, exact gross cents and exact net revenue (in
    // CENTI-CENTS: gross_cents × (100 − depth) — pure int64, conserved
    // to the hundredth of a cent), plus each band's share of total net.
    // Band = round(discount·100), an 11-value dictionary (the fixture's
    // discount grid — no .5 ties, so both engines' round agree). One
    // scan, one ≤11-group agg, totals via a broadcast.
    QueryDef.sql("q326_discount_depth_audit") { (s, d) =>
      val li = Tables(s, d, "lineitem")
        .select(expr("CAST(ROUND(l_discount * 100) AS BIGINT)").as("band"),
          expr("CAST(l_quantity AS BIGINT)").as("qty"),
          expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)").as("cents"))
      val per = li.groupBy(col("band"))
        .agg(count(lit(1)).as("n_lines"), sum(col("qty")).as("units"),
          sum(col("cents")).as("gross_cents"),
          sum(col("cents") * (lit(100L) - col("band")))
            .as("net_centicents"))
      val tot = per.agg(sum(col("net_centicents")).as("total_net"))
      per.crossJoin(broadcast(tot))
        .select(col("band"), col("n_lines"), col("units"),
          col("gross_cents"), col("net_centicents"),
          expr("CAST(net_centicents AS DOUBLE) / CAST(total_net AS DOUBLE)")
            .as("net_share"))
        .orderBy("band")
    } {
      """WITH li AS (
        |  SELECT CAST(ROUND(l_discount * 100) AS BIGINT) AS band,
        |    CAST(l_quantity AS BIGINT) AS qty,
        |    CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
        |  FROM lineitem),
        |per AS (
        |  SELECT band, CAST(COUNT(*) AS BIGINT) AS n_lines,
        |    CAST(SUM(qty) AS BIGINT) AS units,
        |    CAST(SUM(cents) AS BIGINT) AS gross_cents,
        |    CAST(SUM(cents * (100 - band)) AS BIGINT) AS net_centicents
        |  FROM li GROUP BY band),
        |tot AS (SELECT CAST(SUM(net_centicents) AS BIGINT) AS total_net
        |  FROM per)
        |SELECT band, n_lines, units, gross_cents, net_centicents,
        |  CAST(net_centicents AS DOUBLE) / CAST(total_net AS DOUBLE)
        |    AS net_share
        |FROM per CROSS JOIN tot
        |ORDER BY band""".stripMargin
    },

    // ------------------------------------------------------------------
    // q327: DEAD-STOCK CENSUS — per brand, the parts with NO shipment
    // in the trailing 90 days of the corpus window (including parts
    // never shipped at all — the anti join catches both), their share
    // of the catalog, and the exact retail cents parked in them: the
    // working-capital number behind every markdown decision. The
    // recent-part set is a corpus-keyed distinct bounded by the part
    // dimension; the census is one anti join + two ≤brands-group aggs;
    // the high-water mark broadcasts (never a per-row subquery).
    QueryDef.sql("q327_dead_stock_census") { (s, d) =>
      val li = Tables(s, d, "lineitem")
        .select(col("l_partkey"), to_date(col("l_shipdate")).as("sday"))
      val hwm = li.agg(max(col("sday")).as("maxday"))
      val recent = li.crossJoin(broadcast(hwm))
        .filter(col("sday") > date_sub(col("maxday"), 90))
        .select(col("l_partkey")).distinct()
      val part = Tables(s, d, "part")
        .select(col("p_partkey"), col("p_brand"),
          expr("CAST(ROUND(p_retailprice * 100) AS BIGINT)").as("rcents"))
      val dead = part.join(recent,
          col("p_partkey") === col("l_partkey"), "left_anti")
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_dead"),
          sum(col("rcents")).as("dead_retail_cents"))
      part.groupBy(col("p_brand")).agg(count(lit(1)).as("n_parts"))
        .join(dead, Seq("p_brand"), "left_outer")
        .select(col("p_brand"), col("n_parts"),
          coalesce(col("n_dead"), lit(0L)).as("n_dead"),
          expr("CAST(COALESCE(n_dead, 0) AS DOUBLE) / CAST(n_parts AS DOUBLE)")
            .as("dead_share"),
          coalesce(col("dead_retail_cents"), lit(0L))
            .as("dead_retail_cents"))
        .orderBy("p_brand")
    } {
      """WITH li AS (
        |  SELECT l_partkey, CAST(l_shipdate AS DATE) AS sday
        |  FROM lineitem),
        |hwm AS (SELECT MAX(sday) AS maxday FROM li),
        |recent AS (
        |  SELECT DISTINCT l_partkey
        |  FROM li CROSS JOIN hwm WHERE sday > maxday - 90),
        |part0 AS (
        |  SELECT p_partkey, p_brand,
        |    CAST(ROUND(p_retailprice * 100) AS BIGINT) AS rcents
        |  FROM part),
        |dead AS (
        |  SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_dead,
        |    CAST(SUM(rcents) AS BIGINT) AS dead_retail_cents
        |  FROM part0 WHERE p_partkey NOT IN (SELECT l_partkey FROM recent)
        |  GROUP BY p_brand),
        |cat AS (
        |  SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_parts
        |  FROM part0 GROUP BY p_brand)
        |SELECT cat.p_brand, n_parts,
        |  CAST(COALESCE(n_dead, 0) AS BIGINT) AS n_dead,
        |  CAST(COALESCE(n_dead, 0) AS DOUBLE) / CAST(n_parts AS DOUBLE)
        |    AS dead_share,
        |  CAST(COALESCE(dead_retail_cents, 0) AS BIGINT)
        |    AS dead_retail_cents
        |FROM cat LEFT JOIN dead ON cat.p_brand = dead.p_brand
        |ORDER BY cat.p_brand""".stripMargin
    },

    // ------------------------------------------------------------------
    // q317: BRAND CROSS-SHOPPING MATRIX — the assortment-planning twin
    // of q279's item graph, at BRAND grain: the top-10 brand pairs by
    // shared customers, with the lift vs independence (shared·N /
    // (cust_a·cust_b) — cross-multiplied exact integers in one IEEE
    // chain). Pairs expand per customer over the sorted distinct brand
    // list (≤25 brands → ≤300 pairs per customer, in-buffer, a<b by
    // construction — never a customer×customer or brand-postings
    // self-join); everything downstream is brands²-bounded. Top-10 is
    // a distributed partial top-k.
    QueryDef.sql("q317_brand_crossshop") { (s, d) =>
      val li = Tables(s, d, "lineitem").select(col("l_orderkey"), col("l_partkey"))
      val o = Tables(s, d, "orders").select(col("o_orderkey"), col("o_custkey"))
      val p = Tables(s, d, "part").select(col("p_partkey"), col("p_brand"))
      // ONE customer-keyed exchange feeds everything (round 16, guide
      // §2.4): the former (cust, brand) DISTINCT exchange followed by a
      // second cust-keyed exchange for the pair expansion is collapsed
      // into one grouped relation — collect_set dedupes in the
      // aggregation buffer, row count IS the distinct-customer count,
      // and the per-brand customer counts come from an in-buffer
      // explode. Frozen so its three consumers don't re-run the
      // fact join (answer-identical: set semantics).
      val cb = graft.Checkpoints.checkpointLazy(
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .groupBy(col("o_custkey").as("cust"))
          .agg(sort_array(collect_set(col("p_brand"))).as("bs")))
      val brandCust = cb.select(explode(col("bs")).as("brand"))
        .groupBy(col("brand")).agg(count(lit(1)).as("n_cust"))
      val nAll = cb.agg(count(lit(1)).as("n"))
      val pairs = cb
        .select(explode(expr(
          """flatten(transform(bs, (x, i) ->
            |  transform(slice(bs, i + 2, size(bs)), y ->
            |    struct(x AS a, y AS b))))""".stripMargin)).as("e"))
        .groupBy(col("e.a").as("brand_a"), col("e.b").as("brand_b"))
        .agg(count(lit(1)).as("shared_customers"))
      // brandCust is brands-bounded (≤25 rows at any corpus scale) —
      // broadcast explicitly: the frozen cb leaf carries no size
      // statistics, so the planner would otherwise default these
      // dimension joins to sort-merge (guide §3.1)
      pairs
        .join(broadcast(brandCust.select(col("brand").as("brand_a"),
          col("n_cust").as("cust_a"))), "brand_a")
        .join(broadcast(brandCust.select(col("brand").as("brand_b"),
          col("n_cust").as("cust_b"))), "brand_b")
        .crossJoin(broadcast(nAll))
        .select(col("brand_a"), col("brand_b"), col("shared_customers"),
          col("cust_a"), col("cust_b"),
          expr("(CAST(shared_customers AS DOUBLE) * CAST(n AS DOUBLE)) / " +
            "(CAST(cust_a AS DOUBLE) * CAST(cust_b AS DOUBLE))").as("lift"))
        .orderBy(col("shared_customers").desc, col("brand_a"), col("brand_b"))
        .limit(10)
    } {
      """WITH cb AS (
        |  SELECT DISTINCT o.o_custkey AS cust, p.p_brand AS brand
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN part p ON l.l_partkey = p.p_partkey),
        |bc AS (
        |  SELECT brand, CAST(COUNT(*) AS BIGINT) AS n_cust
        |  FROM cb GROUP BY brand),
        |na AS (SELECT CAST(COUNT(DISTINCT cust) AS BIGINT) AS n FROM cb),
        |pairs AS (
        |  SELECT x.brand AS brand_a, y.brand AS brand_b,
        |    CAST(COUNT(*) AS BIGINT) AS shared_customers
        |  FROM cb x JOIN cb y ON x.cust = y.cust AND x.brand < y.brand
        |  GROUP BY x.brand, y.brand)
        |SELECT brand_a, brand_b, shared_customers,
        |  a.n_cust AS cust_a, b.n_cust AS cust_b,
        |  (CAST(shared_customers AS DOUBLE) * CAST(n AS DOUBLE))
        |    / (CAST(a.n_cust AS DOUBLE) * CAST(b.n_cust AS DOUBLE))
        |    AS lift
        |FROM pairs
        |JOIN bc a ON a.brand = brand_a
        |JOIN bc b ON b.brand = brand_b
        |CROSS JOIN na
        |ORDER BY shared_customers DESC, brand_a, brand_b
        |LIMIT 10""".stripMargin
    },

    // ------------------------------------------------------------------
    // q312: LEAD-TIME VARIANCE SPLIT — is fulfillment latency a
    // SUPPLIER problem or ambient noise? Eta² of q291's lead days
    // between suppliers (the share of variance the supplier identity
    // explains — high means fix vendors, low means fix the process),
    // plus the slowest suppliers by exact mean with their volume.
    // Order-free exactness trick: the one fractional per-group term
    // (S_g²/n_g) quantizes to an integer micro-grid with ONE
    // deterministic rounding per supplier, so the cross-supplier sum is
    // exact int64 in ANY order — no ordered fold needed even over an
    // unbounded supplier dimension (upgrades the q269/q272 posture).
    // One FK-keyed shuffle + a supplier-keyed agg; top-5 is a
    // distributed partial top-k.
    QueryDef.sql("q312_leadtime_variance_split") { (s, d) =>
      val li = Tables(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"),
          to_date(col("l_shipdate")).as("ship"))
      val o = Tables(s, d, "orders")
        .select(col("o_orderkey"), to_date(col("o_orderdate")).as("odate"))
      val lead = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_suppkey"),
          datediff(col("ship"), col("odate")).cast("long").as("ld"))
      val bySupp = lead.groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n_g"), sum(col("ld")).as("s_g"),
          sum(col("ld") * col("ld")).as("q_g"))
        .withColumn("contrib", expr(
          "CAST(ROUND((CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE) * 1e6) / " +
            "CAST(n_g AS DOUBLE)) AS BIGINT)"))
      val glob = bySupp.agg(sum(col("n_g")).as("n"),
        sum(col("s_g")).as("sx"), sum(col("q_g")).as("q"),
        sum(col("contrib")).as("f6"), count(lit(1)).as("n_suppliers"))
        .select(col("n"), col("n_suppliers"),
          expr(LeadEta2Expr).as("supplier_eta2"))
      import org.apache.spark.sql.expressions.Window
      val top = bySupp
        .select(col("l_suppkey"), col("n_g"),
          expr("CAST(s_g AS DOUBLE) / CAST(n_g AS DOUBLE)").as("mean_days"))
        .orderBy(col("mean_days").desc, col("l_suppkey")).limit(5)
        .withColumn("rnk", row_number().over(
          Window.orderBy(col("mean_days").desc, col("l_suppkey"))))
      top.crossJoin(broadcast(glob))
        .select(col("rnk"), col("l_suppkey"), col("n_g").as("n_lines"),
          col("mean_days"), col("n"), col("n_suppliers"),
          col("supplier_eta2"))
        .orderBy("rnk")
    } {
      s"""WITH lead AS (
         |  SELECT l.l_suppkey,
         |    CAST(CAST(l.l_shipdate AS DATE) - CAST(o.o_orderdate AS DATE)
         |      AS BIGINT) AS ld
         |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
         |bys AS (
         |  SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n_g,
         |    CAST(SUM(ld) AS BIGINT) AS s_g,
         |    CAST(SUM(ld * ld) AS BIGINT) AS q_g
         |  FROM lead GROUP BY l_suppkey),
         |cb AS (
         |  SELECT *, CAST(ROUND((CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE)
         |    * 1e6) / CAST(n_g AS DOUBLE)) AS BIGINT) AS contrib
         |  FROM bys),
         |gb AS (
         |  SELECT CAST(SUM(n_g) AS BIGINT) AS n,
         |    CAST(SUM(s_g) AS BIGINT) AS sx,
         |    CAST(SUM(q_g) AS BIGINT) AS q,
         |    CAST(SUM(contrib) AS BIGINT) AS f6,
         |    CAST(COUNT(*) AS BIGINT) AS n_suppliers
         |  FROM cb),
         |ge AS (SELECT n, n_suppliers, $LeadEta2Expr AS supplier_eta2
         |       FROM gb),
         |top AS (
         |  SELECT l_suppkey, n_g,
         |    CAST(s_g AS DOUBLE) / CAST(n_g AS DOUBLE) AS mean_days,
         |    ROW_NUMBER() OVER (ORDER BY CAST(s_g AS DOUBLE)
         |      / CAST(n_g AS DOUBLE) DESC, l_suppkey) AS rnk
         |  FROM bys)
         |SELECT rnk, l_suppkey, n_g AS n_lines, mean_days,
         |  n, n_suppliers, supplier_eta2
         |FROM top CROSS JOIN ge
         |WHERE rnk <= 5
         |ORDER BY rnk""".stripMargin
    },

    // ------------------------------------------------------------------
    // q300: INVOICE RECONCILIATION — does the order header's total match
    // the recomputed sum of its lines? The billing-integrity audit every
    // finance warehouse runs nightly: per order status, how many orders
    // disagree and by how much. Line amounts are ONE shared IEEE chain
    // (price·(1−disc)·(1+tax)) rounded to cents per LINE (the invoicing
    // convention — and the rounding point both engines share), summed
    // exactly; the header rounds once. One FK-keyed shuffle; everything
    // above it is status-bounded. On this synthetic fixture the headers
    // are independent of the lines, so the audit reports near-total
    // mismatch — the MACHINERY is the deliverable, and the oracle
    // hash-pins every count and cent of it.
    QueryDef.sql("q300_invoice_reconciliation") { (s, d) =>
      val lines = Tables(s, d, "lineitem")
        .select(col("l_orderkey"),
          expr("CAST(ROUND(l_extendedprice * (1.0 - l_discount) * " +
            "(1.0 + l_tax) * 100) AS BIGINT)").as("line_cents"))
        .groupBy(col("l_orderkey"))
        .agg(sum(col("line_cents")).as("lines_cents"))
      Tables(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"),
          expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").as("hdr_cents"))
        .join(lines, col("o_orderkey") === col("l_orderkey"))
        .withColumn("diff", col("hdr_cents") - col("lines_cents"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          sum(when(col("diff") =!= 0L, 1L).otherwise(0L)).as("n_mismatched"),
          max(abs(col("diff"))).as("max_abs_diff_cents"),
          sum(abs(col("diff"))).as("total_abs_diff_cents"))
        .orderBy("o_orderstatus")
    } {
      """WITH lines AS (
        |  SELECT l_orderkey,
        |    CAST(SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount)
        |      * (1.0 + l_tax) * 100) AS BIGINT)) AS BIGINT) AS lines_cents
        |  FROM lineitem GROUP BY l_orderkey),
        |j AS (
        |  SELECT o.o_orderstatus,
        |    CAST(ROUND(o.o_totalprice * 100) AS BIGINT) - lines_cents
        |      AS diff
        |  FROM orders o JOIN lines l ON o.o_orderkey = l.l_orderkey)
        |SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CASE WHEN diff <> 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_mismatched,
        |  CAST(MAX(ABS(diff)) AS BIGINT) AS max_abs_diff_cents,
        |  CAST(SUM(ABS(diff)) AS BIGINT) AS total_abs_diff_cents
        |FROM j GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin
    },

    // ------------------------------------------------------------------
    // q302: DEAD-STOCK CENSUS — catalog items that never shipped, per
    // brand: the slow-mover report behind every inventory clearance
    // decision (and the catalog-coverage sanity check for any
    // recommendation index built on co-purchases — q279's universe
    // excludes exactly these). One anti join from the part dimension
    // against the fact key (bloom-prunable at scale), one brand agg;
    // exact counts, one division.
    QueryDef.sql("q302_dead_stock") { (s, d) =>
      val sold = Tables(s, d, "lineitem").select(col("l_partkey")).distinct()
      val p = Tables(s, d, "part").select(col("p_partkey"), col("p_brand"))
      val dead = p.join(sold, col("p_partkey") === col("l_partkey"),
          "left_anti")
        .groupBy(col("p_brand")).agg(count(lit(1)).as("n_never_sold"))
      p.groupBy(col("p_brand")).agg(count(lit(1)).as("n_parts"))
        .join(dead, Seq("p_brand"), "left_outer")
        .select(col("p_brand"), col("n_parts"),
          coalesce(col("n_never_sold"), lit(0L)).as("n_never_sold"),
          expr("CAST(COALESCE(n_never_sold, 0) AS DOUBLE) / " +
            "CAST(n_parts AS DOUBLE)").as("dead_share"))
        .orderBy("p_brand")
    } {
      """WITH sold AS (SELECT DISTINCT l_partkey FROM lineitem),
        |dead AS (
        |  SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_never_sold
        |  FROM part p LEFT JOIN sold s ON p.p_partkey = s.l_partkey
        |  WHERE s.l_partkey IS NULL GROUP BY p_brand),
        |tot AS (
        |  SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_parts
        |  FROM part GROUP BY p_brand)
        |SELECT tot.p_brand, n_parts,
        |  COALESCE(n_never_sold, 0) AS n_never_sold,
        |  CAST(COALESCE(n_never_sold, 0) AS DOUBLE)
        |    / CAST(n_parts AS DOUBLE) AS dead_share
        |FROM tot LEFT JOIN dead ON tot.p_brand = dead.p_brand
        |ORDER BY tot.p_brand""".stripMargin
    },

    // ------------------------------------------------------------------
    // q01: full-scan hash aggregation with multiple measures (TPC-H Q1
    // flavor). Map-side partial agg + 2-phase final agg; only the six
    // referenced columns are read from parquet (column pruning).
    QueryDef.sql("q01_pricing_summary") { (s, d) =>
      val li = Tables(s, d, "lineitem")
      // exact LONG sums (Det.csum) only where the int64 contract's ≥3×
      // headroom holds at the 100 TB design point: quantity (scale 0,
      // ≤50/row) and discount (scale 2, ≤0.10/row) stay far inside it
      // even for ~3e11-row returnflag/linestatus groups. Price does NOT —
      // cents(l_extendedprice) ≈ 1e7/row puts a 3e11-row group at ~3e18,
      // under 3× from 2^63 — so price sums keep the decimal accumulator
      // (dsum), like the discounted products.
      li.filter(col("l_shipdate") <= lit("2000-12-31").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          Det.csum(col("l_quantity"), 0).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")))
            .as("sum_charge"),
          (Det.csum(col("l_quantity"), 0) / count(lit(1))).as("avg_qty"),
          (dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
          (Det.csum(col("l_discount"), 2) / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    } {
      s"""SELECT l_returnflag, l_linestatus,
         |  ${Det.csumSql("l_quantity", 0)} AS sum_qty,
         |  ${dsumSql("l_extendedprice")} AS sum_base_price,
         |  ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
         |  ${dsumSql("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
         |  (${Det.csumSql("l_quantity", 0)} / COUNT(*)) AS avg_qty,
         |  (${dsumSql("l_extendedprice")} / COUNT(*)) AS avg_price,
         |  (${Det.csumSql("l_discount", 2)} / COUNT(*)) AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '2000-12-31 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin
    },

    // ------------------------------------------------------------------
    // q02: projection + predicates (BETWEEN, IN, LIKE, null-safe equality,
    // CASE). All predicates push to the parquet scan.
    QueryDef.sql("q02_filter_project") { (s, d) =>
      val p = Tables(s, d, "part")
      p.filter(
          col("p_size").between(10, 30) &&
            col("p_brand").isin("Brand#1", "Brand#2", "Brand#3", "Brand#4", "Brand#5") &&
            col("p_type").like("%A%"))
        .select(
          col("p_partkey"), col("p_name"), col("p_brand"), col("p_type"), col("p_size"),
          when(col("p_retailprice") < 500, "low")
            .when(col("p_retailprice") < 1500, "mid")
            .otherwise("high").as("price_band"),
          (col("p_brand") <=> "Brand#1").as("is_brand1"))
        .orderBy("p_partkey")
    } {
      """SELECT p_partkey, p_name, p_brand, p_type, p_size,
        |  CASE WHEN p_retailprice < 500 THEN 'low'
        |       WHEN p_retailprice < 1500 THEN 'mid'
        |       ELSE 'high' END AS price_band,
        |  (p_brand IS NOT DISTINCT FROM 'Brand#1') AS is_brand1
        |FROM part
        |WHERE p_size BETWEEN 10 AND 30
        |  AND p_brand IN ('Brand#1','Brand#2','Brand#3','Brand#4','Brand#5')
        |  AND p_type LIKE '%A%'
        |ORDER BY p_partkey""".stripMargin
    },

    // ------------------------------------------------------------------
    // q03: 3-way join + agg + top-k (TPC-H Q3 flavor). customer is the
    // small side and broadcast; orders⋈lineitem shuffles on the join key.
    QueryDef.sql("q03_shipping_priority") { (s, d) =>
      val cust = Tables(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = Tables(s, d, "orders")
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val li = Tables(s, d, "lineitem")
        .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(Det.csum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(10)
    } {
      s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
         |  ${Det.csumSql("l_extendedprice * (1.0 - l_discount)", 4)} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, o_orderdate, l_orderkey
         |LIMIT 10""".stripMargin
    },

    // ------------------------------------------------------------------
    // q04: semi join (EXISTS). Spark plans a left-semi hash join — no
    // row multiplication, no distinct needed.
    QueryDef.sql("q04_order_priority_exists") { (s, d) =>
      val ord = Tables(s, d, "orders").filter(
        col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      val bigLines = Tables(s, d, "lineitem").filter(col("l_quantity") > 45)
      ord.join(bigLines, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    } {
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin
    },

    // ------------------------------------------------------------------
    // q05: anti join (NOT EXISTS): customers with no order in 1995.
    QueryDef.sql("q05_customers_without_orders") { (s, d) =>
      val cust = Tables(s, d, "customer")
      val ord95 = Tables(s, d, "orders").filter(
        col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
      cust.join(ord95, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"), dsum(col("c_acctbal")).as("sum_acctbal"))
        .orderBy("c_mktsegment")
    } {
      s"""SELECT c_mktsegment, COUNT(*) AS n_customers,
         |  ${dsumSql("c_acctbal")} AS sum_acctbal
         |FROM customer
         |WHERE NOT EXISTS (SELECT 1 FROM orders
         |                  WHERE o_custkey = c_custkey
         |                    AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
         |                    AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00')
         |GROUP BY c_mktsegment
         |ORDER BY c_mktsegment""".stripMargin
    },

    // ------------------------------------------------------------------
    // q06: 5-way star join rolled up to nation (TPC-H Q5 flavor).
    // nation/region broadcast (tiny dims); the fact-side joins shuffle.
    QueryDef.sql("q06_nation_revenue") { (s, d) =>
      val li = Tables(s, d, "lineitem")
      val ord = Tables(s, d, "orders").filter(
        col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val cust = Tables(s, d, "customer")
      val nat = Tables(s, d, "nation")
      val reg = Tables(s, d, "region")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    } {
      s"""SELECT r_name, n_name,
         |  ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY r_name, n_name
         |ORDER BY revenue DESC, n_name""".stripMargin
    },

    // ------------------------------------------------------------------
    // q07: per-group top-k via ranking window (row_number ≤ 3): the
    // scalable top-k idiom — no global sort of the full aggregate.
    QueryDef.sql("q07_top_parts_per_brand") { (s, d) =>
      val li = Tables(s, d, "lineitem")
      val p = Tables(s, d, "part")
      val rev = li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_partkey"))
        .agg(Det.csum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"))
      val w = Window.partitionBy(col("p_brand"))
        .orderBy(col("revenue").desc, col("p_partkey"))
      rev.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select("p_brand", "rnk", "p_partkey", "revenue")
        .orderBy("p_brand", "rnk")
    } {
      s"""SELECT p_brand, rnk, p_partkey, revenue FROM (
         |  SELECT p_brand, p_partkey, revenue,
         |    ROW_NUMBER() OVER (PARTITION BY p_brand
         |                       ORDER BY revenue DESC, p_partkey) AS rnk
         |  FROM (
         |    SELECT p_brand, p_partkey,
         |      ${Det.csumSql("l_extendedprice * (1.0 - l_discount)", 4)} AS revenue
         |    FROM lineitem JOIN part ON l_partkey = p_partkey
         |    GROUP BY p_brand, p_partkey))
         |WHERE rnk <= 3
         |ORDER BY p_brand, rnk""".stripMargin
    },

    // ------------------------------------------------------------------
    // q08: analytic windows — running sum (frame UNBOUNDED PRECEDING..
    // CURRENT ROW), lag, lead over per-customer order history.
    QueryDef.sql("q08_customer_order_history") { (s, d) =>
      val ord = Tables(s, d, "orders")
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ord
        .withColumn("running_spend",
          sum(col("o_totalprice").cast("decimal(18,6)")).over(wRun).cast("double"))
        .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
        .withColumn("next_price", lead(col("o_totalprice"), 1).over(w))
        .withColumn("order_idx", row_number().over(w))
        .select("o_custkey", "order_idx", "o_orderkey", "o_orderdate", "o_totalprice",
          "running_spend", "prev_price", "next_price")
        .orderBy("o_custkey", "order_idx")
    } {
      """SELECT o_custkey,
        |  ROW_NUMBER() OVER w AS order_idx,
        |  o_orderkey, o_orderdate, o_totalprice,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
        |       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |       AS DOUBLE) AS running_spend,
        |  LAG(o_totalprice, 1) OVER w AS prev_price,
        |  LEAD(o_totalprice, 1) OVER w AS next_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, order_idx""".stripMargin
    },

    // ------------------------------------------------------------------
    // q09: grouping sets (ROLLUP) with grouping indicators.
    QueryDef.sql("q09_rollup_lineitem") { (s, d) =>
      val li = Tables(s, d, "lineitem")
      li.rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(
          grouping(col("l_returnflag")).cast("int").as("g_rf"),
          grouping(col("l_linestatus")).cast("int").as("g_ls"),
          count(lit(1)).as("n_rows"),
          Det.csum(col("l_quantity"), 0).as("sum_qty"))
        .orderBy(col("g_rf"), col("g_ls"), col("l_returnflag"), col("l_linestatus"))
    } {
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
         |  CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
         |  COUNT(*) AS n_rows,
         |  ${Det.csumSql("l_quantity", 0)} AS sum_qty
         |FROM lineitem
         |GROUP BY ROLLUP (l_returnflag, l_linestatus)
         |ORDER BY g_rf, g_ls, l_returnflag, l_linestatus""".stripMargin
    },

    // ------------------------------------------------------------------
    // q10: set operations — INTERSECT / EXCEPT / UNION ALL over the
    // nations reachable from customers vs suppliers.
    QueryDef.sql("q10_nation_set_ops") { (s, d) =>
      val nat = broadcast(Tables(s, d, "nation"))
      val custNations = Tables(s, d, "customer")
        .join(nat, col("c_nationkey") === col("n_nationkey"))
        .select("n_name").distinct()
      val suppNations = Tables(s, d, "supplier")
        .join(nat, col("s_nationkey") === col("n_nationkey"))
        .select("n_name").distinct()
      custNations.intersect(suppNations).withColumn("tag", lit("both"))
        .unionByName(custNations.except(suppNations).withColumn("tag", lit("cust_only")))
        .unionByName(suppNations.except(custNations).withColumn("tag", lit("supp_only")))
        .orderBy("tag", "n_name")
    } {
      """WITH cn AS (SELECT DISTINCT n_name FROM customer
        |            JOIN nation ON c_nationkey = n_nationkey),
        |     sn AS (SELECT DISTINCT n_name FROM supplier
        |            JOIN nation ON s_nationkey = n_nationkey)
        |SELECT n_name, tag FROM (
        |  SELECT n_name, 'both' AS tag FROM (SELECT * FROM cn INTERSECT SELECT * FROM sn)
        |  UNION ALL
        |  SELECT n_name, 'cust_only' AS tag FROM (SELECT * FROM cn EXCEPT SELECT * FROM sn)
        |  UNION ALL
        |  SELECT n_name, 'supp_only' AS tag FROM (SELECT * FROM sn EXCEPT SELECT * FROM cn))
        |ORDER BY tag, n_name""".stripMargin
    },

    // ------------------------------------------------------------------
    // q11: exact distinct aggregation (COUNT DISTINCT expands to a
    // two-phase plan; keyed on the group column — no driver-side state).
    QueryDef.sql("q11_distinct_customers") { (s, d) =>
      val ord = Tables(s, d, "orders")
      ord.groupBy(col("o_orderpriority"))
        .agg(
          countDistinct(col("o_custkey")).as("n_customers"),
          countDistinct(year(col("o_orderdate"))).as("n_years"),
          count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority")
    } {
      """SELECT o_orderpriority,
        |  COUNT(DISTINCT o_custkey) AS n_customers,
        |  COUNT(DISTINCT EXTRACT(YEAR FROM o_orderdate)) AS n_years,
        |  COUNT(*) AS n_orders
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin
    },

    // ------------------------------------------------------------------
    // q12: scalar string functions — split, element_at, lower, substring,
    // regexp_extract, levenshtein, concat_ws.
    QueryDef.sql("q12_string_functions") { (s, d) =>
      val p = Tables(s, d, "part").filter(col("p_size") >= 45)
      p.select(
          col("p_partkey"),
          lower(col("p_name")).as("lname"),
          size(split(col("p_name"), " ")).as("n_tokens"),
          element_at(split(col("p_name"), " "), 1).as("first_token"),
          substring(col("p_name"), 1, 10).as("prefix10"),
          regexp_extract(col("p_type"), "^[A-Z]+", 0).as("type_head"),
          levenshtein(col("p_brand"), lit("Brand#1")).as("brand_dist"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"))
        .orderBy("p_partkey")
    } {
      """SELECT p_partkey,
        |  LOWER(p_name) AS lname,
        |  CAST(LEN(STRING_SPLIT(p_name, ' ')) AS INT) AS n_tokens,
        |  STRING_SPLIT(p_name, ' ')[1] AS first_token,
        |  SUBSTRING(p_name, 1, 10) AS prefix10,
        |  REGEXP_EXTRACT(p_type, '^[A-Z]+', 0) AS type_head,
        |  CAST(LEVENSHTEIN(p_brand, 'Brand#1') AS INT) AS brand_dist,
        |  CONCAT_WS('|', p_brand, p_type) AS brand_type
        |FROM part
        |WHERE p_size >= 45
        |ORDER BY p_partkey""".stripMargin
    },

    // ------------------------------------------------------------------
    // q13: date/time functions — year/month extraction, date_trunc.
    QueryDef.sql("q13_monthly_orders") { (s, d) =>
      val ord = Tables(s, d, "orders")
      ord.groupBy(
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          date_trunc("month", col("o_orderdate")).as("month_start"))
        .agg(count(lit(1)).as("n_orders"), Det.csum(col("o_totalprice"), 2).as("sum_price"))
        .orderBy("y", "m")
    } {
      s"""SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS y,
         |  CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS m,
         |  DATE_TRUNC('month', o_orderdate) AS month_start,
         |  COUNT(*) AS n_orders,
         |  ${Det.csumSql("o_totalprice", 2)} AS sum_price
         |FROM orders
         |GROUP BY 1, 2, 3
         |ORDER BY y, m""".stripMargin
    },

    // ------------------------------------------------------------------
    // q14: CASE + math functions (round, abs, sqrt) feeding aggregation.
    QueryDef.sql("q14_quantity_bands") { (s, d) =>
      val li = Tables(s, d, "lineitem")
      li.withColumn("qty_band",
          when(col("l_quantity") <= 10, "small")
            .when(col("l_quantity") <= 30, "medium")
            .otherwise("large"))
        .groupBy(col("qty_band"))
        .agg(
          count(lit(1)).as("n_rows"),
          dsum(round(col("l_extendedprice") * col("l_discount"), 4)).as("sum_disc_amount"),
          dsum(sqrt(abs(col("l_extendedprice")))).as("sum_sqrt_price"))
        .orderBy("qty_band")
    } {
      s"""SELECT CASE WHEN l_quantity <= 10 THEN 'small'
         |            WHEN l_quantity <= 30 THEN 'medium'
         |            ELSE 'large' END AS qty_band,
         |  COUNT(*) AS n_rows,
         |  ${dsumSql("ROUND(l_extendedprice * l_discount, 4)")} AS sum_disc_amount,
         |  ${dsumSql("SQRT(ABS(l_extendedprice))")} AS sum_sqrt_price
         |FROM lineitem
         |GROUP BY 1
         |ORDER BY qty_band""".stripMargin
    },

    // ------------------------------------------------------------------
    // q15: JSON extraction from events.props (schema-on-read over the
    // opaque payload — the kinesumer `Data []byte` analog).
    QueryDef.sql("q15_json_props") { (s, d) =>
      val ev = Tables(s, d, "events")
      ev.withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .withColumn("k_bucket", expr("k div 10"))
        .groupBy(col("k_bucket"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
        .orderBy("k_bucket")
    } {
      s"""SELECT CAST(json_extract_string(props, '$$.k') AS INT) // 10 AS k_bucket,
         |  COUNT(*) AS n_events,
         |  ${dsumSql("value")} AS sum_value
         |FROM events
         |GROUP BY 1
         |ORDER BY k_bucket NULLS FIRST""".stripMargin
      // NULLS FIRST matches Spark's ascending default; DuckDB defaults
      // NULLS LAST, so a payload lacking '$.k' (schema-on-read expects
      // heterogeneity) would otherwise order its NULL group differently
    },

    // ------------------------------------------------------------------
    // q119: CORRELATED SCALAR SUBQUERY (TPC-H Q17 shape) — revenue from
    // below-half-average-quantity line items per brand. Registered
    // through the literal-SQL surface (Tables.registerViews + one
    // dialect-shared string run VERBATIM on both engines), because the
    // interesting operator here is Catalyst's decorrelation: the
    // correlated `AVG(l2.l_quantity) WHERE l2.l_partkey = l.l_partkey`
    // rewrites to a per-part aggregate joined back on l_partkey — one
    // extra keyed shuffle of the (partkey, avg) relation, never a
    // per-row re-scan. Determinism: quantities are integer-valued
    // doubles, so the per-part AVG is an exact sum over a small group
    // divided once; revenue uses the decimal-summed double (Det.dsum's
    // SQL form, valid in both dialects).
    QueryDef.sql("q119_small_qty_revenue") { (s, d) =>
      Tables.registerViews(s, d)
      s.sql(SmallQtyRevenueSql)
    } { SmallQtyRevenueSql },

    // ------------------------------------------------------------------
    // q161: VARIANT SEMI-STRUCTURED INGESTION — the Spark 4 VARIANT
    // type on the event property bags: parse_json ONCE into the binary
    // variant encoding, then typed path extraction (variant_get with a
    // target type) feeding ordinary integer aggregation. This is the
    // schema-on-read path a 100 TB event pipeline actually wants:
    // VARIANT parses each JSON document once at scan time into a
    // shredded binary form, where get_json_object-style string paths
    // re-parse the text per extraction. Null accounting is aligned on
    // TRY-cast semantics in BOTH engines: "missing" = absent path OR
    // explicit JSON null OR a value that fails the int cast
    // (try_variant_get here, TRY_CAST in the oracle) — so dirty
    // payloads degrade identically instead of diverging between
    // engines. Residual contract (documented, fixture-guaranteed):
    // '$.k' is integer / digit-string / null / absent; a FRACTIONAL
    // double would truncate under Spark's variant cast but fail
    // DuckDB's VARCHAR-routed TRY_CAST. Every aggregate is an exact
    // int64 within the csum contract.
    QueryDef.sql("q161_variant_extract") { (s, d) =>
      Tables(s, d, "events")
        .select(col("event_type"),
          expr("try_variant_get(parse_json(props), '$.k', 'int')").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("k").isNull, 1L).otherwise(0L)).as("n_missing"),
          min(col("k")).as("k_min"),
          max(col("k")).as("k_max"),
          sum(col("k").cast("long")).as("k_sum"))
        .orderBy("event_type")
    } {
      """SELECT event_type,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CASE WHEN TRY_CAST(props ->> '$.k' AS INT) IS NULL
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_missing,
        |  MIN(TRY_CAST(props ->> '$.k' AS INT)) AS k_min,
        |  MAX(TRY_CAST(props ->> '$.k' AS INT)) AS k_max,
        |  CAST(SUM(TRY_CAST(props ->> '$.k' AS INT)) AS BIGINT) AS k_sum
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin
    },

    // ------------------------------------------------------------------
    // q175: LATERAL CORRELATED TOP-K JOIN — the top-3 orders by price
    // for each cohort customer, written as ONE dialect-shared LATERAL
    // subquery with ORDER BY + LIMIT run VERBATIM on both engines (the
    // q119/q162 posture, now for Spark 4's lateral-join decorrelation:
    // the operator under test is the rewrite itself). Catalyst plans
    // the correlated LIMIT as a per-key window group-limit over ONE
    // keyed join — never a per-customer re-scan of orders — so the
    // 100 TB posture is q07's top-per-group with the loop moved into
    // the planner. Ties break on o_orderkey; the price double orders
    // identically on both engines.
    QueryDef.sql("q175_lateral_topk") { (s, d) =>
      Tables.registerViews(s, d)
      s.sql(LateralTopkSql)
    } { LateralTopkSql },

    // ------------------------------------------------------------------
    // q187: NOT IN vs NOT EXISTS NULL SEMANTICS — the classic
    // three-valued-logic trap, pinned as a cross-engine contract: the
    // urgent-customer subquery deliberately carries NULLs (every
    // non-urgent row projects NULL), so standard SQL makes `NOT IN`
    // UNKNOWN for every candidate — zero rows — while `NOT EXISTS`
    // returns the real complement. One dialect-shared string run
    // VERBATIM on both engines (the q119/q162/q175 posture): the
    // operator under test is the ENGINE's null-aware anti-join
    // semantics, and a hash-match proves both implement the standard
    // (Catalyst plans the NOT IN as a null-aware anti join — the
    // broadcast-only plan shape that is exactly WHY production
    // pipelines should write NOT EXISTS; this query is the library's
    // executable documentation of that rule).
    QueryDef.sql("q187_not_in_null_semantics") { (s, d) =>
      Tables.registerViews(s, d)
      s.sql(NotInNullSql)
    } { NotInNullSql },

    // ------------------------------------------------------------------
    // q188: PERCENT-OF-PARENT SHARES — each nation's share of its
    // REGION's order revenue: the two-level drill-down ratio every BI
    // rollup renders (percent-of-parent, not percent-of-total — q100
    // covers the global shares). One keyed customer join + one
    // (nation)-keyed exact cents aggregation; the region totals come
    // from a window over the 25-row nation relation (never a second
    // fact-table pass), and the tiny dimension joins broadcast. Share =
    // one division of exact int64 cents.
    QueryDef.sql("q188_percent_of_parent") { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val rev = Tables(s, d, "orders")
        .join(Tables(s, d, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey"))
        .agg(sum(expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)")).as("cents"))
      val named = rev
        .join(broadcast(Tables(s, d, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables(s, d, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("r_name").as("region"), col("n_name").as("nation"),
          col("cents"))
      val w = Window.partitionBy(col("region"))
      named
        .withColumn("region_cents", sum(col("cents")).over(w))
        .select(col("region"), col("nation"),
          (col("cents").cast("double") / 100.0).as("nation_revenue"),
          (col("cents").cast("double") / col("region_cents").cast("double"))
            .as("share_of_region"))
        .orderBy("region", "nation")
    } {
      """WITH rev AS (
        |  SELECT c.c_nationkey,
        |    CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY c.c_nationkey),
        |named AS (
        |  SELECT r.r_name AS region, n.n_name AS nation, rev.cents
        |  FROM rev
        |  JOIN nation n ON rev.c_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey)
        |SELECT region, nation,
        |  CAST(cents AS DOUBLE) / 100.0 AS nation_revenue,
        |  CAST(cents AS DOUBLE)
        |    / CAST(CAST(SUM(cents) OVER (PARTITION BY region) AS BIGINT)
        |      AS DOUBLE) AS share_of_region
        |FROM named
        |ORDER BY region, nation""".stripMargin
    },

    // ------------------------------------------------------------------
    // q193: GROUP BY ALL / ORDER BY ALL — the key-inference SQL surface
    // (Spark 3.4+/DuckDB): grouping keys inferred from the non-aggregate
    // select list, sort keys from the whole list, ONE dialect-shared
    // string run verbatim on both engines (the q119 posture — the
    // operator under test is the inference rule itself, and a
    // hash-match proves both engines resolve it to the identical
    // explicit plan). The aggregate rides the Det decimal contract.
    QueryDef.sql("q193_group_by_all") { (s, d) =>
      Tables.registerViews(s, d)
      s.sql(GroupByAllSql)
    } { GroupByAllSql },

    // ------------------------------------------------------------------
    // q223: BAG SET OPERATIONS — EXCEPT ALL / INTERSECT ALL with
    // MULTIPLICITY semantics (result count = max(0, m−n) / min(m, n)
    // per value), the contract that separates bag algebra from the
    // DISTINCT set ops q10 covers — and the one naive rewrites to
    // NOT IN/joins silently break. ONE dialect-shared string (the
    // q193/q162 posture): a hash match proves Spark SQL and DuckDB
    // resolve the multiplicity rules identically. Aggregated output so
    // the bag result itself (orderless, duplicate-bearing) hashes
    // stably.
    QueryDef.sql("q223_bag_set_ops") { (s, d) =>
      Tables.registerViews(s, d)
      s.sql(BagSetOpsSql)
    } { BagSetOpsSql },

    // ------------------------------------------------------------------
    // q349: JOIN-SKEW PROFILER — the planner-facing fan-out census a
    // salted join (q97) or AQE skew split needs as INPUT: per candidate
    // join key of the fact table (l_orderkey, l_partkey), the exact
    // key-count distribution summary — distinct keys, mean/max fan-out,
    // exact p50/p99 fan-out (order statistics over the KEY-COUNT
    // relation, q342's deterministic-rank argument), the max/mean skew
    // factor, and the integer salt a ceil(max/p99) heuristic suggests
    // (1 = no salting needed). q201 estimates a JOIN SIZE from moments;
    // this profiles the SHAPE that decides the physical strategy.
    // NOTE: the census REPORTS the unclipped ⌈0.99·n⌉ statistic
    // (oracle-pinned); the DECISION rule Scale.suggestedSalt applies
    // additionally clips that rank to n−1 so sub-100-key universes
    // still expose their hot key (see its scaladoc).
    //
    // Shape at 100 TB: ONE lineitem scan exploding each row into its
    // two (key-name, key) pairs → keyed counts (map-side combine; the
    // relation shrinks to distinct keys immediately) → the TWO-PASS
    // grouped rank (Scale.groupedRank) over the key-count relation →
    // 2-row summary. The key name has exactly 2 values, so a plain
    // per-key-name window would sort the corpus-sized distinct-key
    // relation in 2 tasks — the profiler you run ON the skewed table
    // must not have a skew-shaped plan itself; groupedRank's range
    // shuffle spreads each key name across the cluster and ranks
    // compose via broadcast offsets.
    QueryDef.sql("q349_join_skew_profile") { (s, d) =>
      graft.ops.Scale.fanoutCensus(
        Tables(s, d, "lineitem"), Seq("l_orderkey", "l_partkey"))
    } {
      """WITH keyed AS (
        |  SELECT jk, k, COUNT(*) AS c FROM (
        |    SELECT 'l_orderkey' AS jk, l_orderkey AS k FROM lineitem
        |    UNION ALL
        |    SELECT 'l_partkey', l_partkey FROM lineitem)
        |  GROUP BY jk, k),
        |r AS (
        |  SELECT jk, c,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY jk ORDER BY c) AS BIGINT)
        |      AS rn,
        |    COUNT(*) OVER (PARTITION BY jk) AS nk,
        |    CAST(SUM(c) OVER (PARTITION BY jk) AS BIGINT) AS rows_total,
        |    MAX(c) OVER (PARTITION BY jk) AS max_c
        |  FROM keyed),
        |p AS (
        |  SELECT jk, MAX(nk) AS n_keys, MAX(rows_total) AS n_rows,
        |    MAX(max_c) AS max_fanout,
        |    MAX(CASE WHEN rn = CAST(FLOOR(CAST(nk + 1 AS DOUBLE) / 2.0)
        |      AS BIGINT) THEN c END) AS p50_fanout,
        |    MAX(CASE WHEN rn = CAST(CEIL(CAST(nk AS DOUBLE) * 0.99)
        |      AS BIGINT) THEN c END) AS p99_fanout
        |  FROM r GROUP BY jk)
        |SELECT jk AS join_key, n_keys, n_rows,
        |  CAST(n_rows AS DOUBLE) / CAST(n_keys AS DOUBLE) AS mean_fanout,
        |  p50_fanout, p99_fanout, max_fanout,
        |  CAST(max_fanout AS DOUBLE) * CAST(n_keys AS DOUBLE)
        |    / CAST(n_rows AS DOUBLE) AS skew_factor,
        |  GREATEST(1, CAST(CEIL(CAST(max_fanout AS DOUBLE)
        |    / CAST(GREATEST(p99_fanout, 1) AS DOUBLE)) AS BIGINT))
        |    AS suggested_salt
        |FROM p
        |ORDER BY join_key""".stripMargin
    },

    // ------------------------------------------------------------------
    // q351: AUTO-SALTED JOIN — the census (q349) and the remedy (q97)
    // closed into ONE operator: Scale.autoSaltedJoin profiles the fact
    // side's join-key fan-out (the q349 ceil(max/p99) heuristic over an
    // exact two-pass rank) and salts only when the profile demands it.
    // The oracle is the PLAIN join — the same answer-preservation
    // contract q97 pins for a hand-chosen salt, now for the
    // machine-chosen one; ScaleSpec pins the decision branches (uniform
    // → plain plan, skewed → the exact golden salt assignment, the
    // kinesumer_test.go:231-316 golden-split spirit).
    QueryDef.sql("q351_auto_salted_join") { (s, d) =>
      val joined = graft.ops.Scale.autoSaltedJoin(
        Tables(s, d, "events"), Tables(s, d, "customer"),
        "user_id", "c_custkey", col("event_id"))
      joined.groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_events"),
          graft.Det.dsum(col("value")).as("total_value"))
        .orderBy("c_nationkey")
    } {
      s"""SELECT c_nationkey, COUNT(*) AS n_events,
         |  ${graft.Det.dsumSql("value")} AS total_value
         |FROM events JOIN customer ON user_id = c_custkey
         |GROUP BY c_nationkey
         |ORDER BY c_nationkey""".stripMargin
    }
  )

  /** q223's dialect-shared text. The two legs deliberately overlap:
    * high includes most of very_high, so both multiplicity rules are
    * exercised away from their trivial zero/full cases.
    */
  private def BagSetOpsSql: String =
    """WITH high AS (
      |  SELECT event_type FROM events WHERE value > 50.0),
      |very_high AS (
      |  SELECT event_type FROM events WHERE value > 80.0),
      |ex AS (
      |  SELECT 'except_all' AS op, event_type FROM (
      |    SELECT event_type FROM high
      |    EXCEPT ALL
      |    SELECT event_type FROM very_high)),
      |ia AS (
      |  SELECT 'intersect_all' AS op, event_type FROM (
      |    SELECT event_type FROM high
      |    INTERSECT ALL
      |    SELECT event_type FROM very_high)),
      |u AS (SELECT * FROM ex UNION ALL SELECT * FROM ia)
      |SELECT op, event_type, COUNT(*) AS n
      |FROM u GROUP BY op, event_type
      |ORDER BY op, event_type""".stripMargin

  /** q193's dialect-shared text: GROUP BY ALL / ORDER BY ALL — the
    * modern-SQL ergonomics surface (Spark ≥ 3.4 and DuckDB both infer
    * the grouping keys from the non-aggregate select list and the sort
    * keys from the full list), proven equivalent by the hash-match.
    */
  private def GroupByAllSql: String =
    s"""SELECT o_orderpriority, o_orderstatus,
      |  COUNT(*) AS n_orders,
      |  ${graft.Det.dsumSql("o_totalprice")}
      |    AS total_value
      |FROM orders
      |GROUP BY ALL
      |ORDER BY ALL""".stripMargin

  /** q187's dialect-shared text: the NULL-polluted NOT IN, its NOT
    * EXISTS complement, and the census, evaluated identically (standard
    * three-valued logic) on Spark SQL and DuckDB.
    */
  private def NotInNullSql: String =
    """WITH urgent AS (
      |  SELECT CASE WHEN o_orderpriority = '1-URGENT'
      |    THEN o_custkey END AS k
      |  FROM orders),
      |not_in AS (
      |  SELECT COUNT(*) AS n FROM customer
      |  WHERE c_custkey NOT IN (SELECT k FROM urgent)),
      |not_exists AS (
      |  SELECT COUNT(*) AS n FROM customer c
      |  WHERE NOT EXISTS (SELECT 1 FROM urgent u WHERE u.k = c.c_custkey))
      |SELECT ni.n AS n_not_in, ne.n AS n_not_exists,
      |  (SELECT COUNT(*) FROM customer) AS n_customers
      |FROM not_in ni, not_exists ne""".stripMargin

  /** q175's dialect-shared text: the LATERAL correlated top-k parses
    * and evaluates identically on Spark SQL and DuckDB.
    */
  private def LateralTopkSql: String =
    """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
      |FROM customer c,
      |LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
      |         WHERE o.o_custkey = c.c_custkey
      |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) t
      |WHERE c.c_custkey % 100 = 0
      |ORDER BY c.c_custkey, o_totalprice DESC, o_orderkey""".stripMargin


  /** q119's dialect-shared text: everything here parses and evaluates
    * identically on Spark SQL and DuckDB — the correlated subquery, the
    * decimal-sum cast chain, and the explicit ORDER BY.
    */
  private def SmallQtyRevenueSql: String =
    """SELECT p.p_brand,
      |  COUNT(*) AS n_small_qty_items,
      |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
      |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |WHERE l.l_quantity < 0.5 * (
      |  SELECT AVG(l2.l_quantity) FROM lineitem l2
      |  WHERE l2.l_partkey = l.l_partkey)
      |GROUP BY p.p_brand
      |ORDER BY p.p_brand""".stripMargin

  /** q312's eta² from (n, sx, q, f6 = Σ round(1e6·S_g²/n_g)):
    * (F − sx²/n)/(Q − sx²/n) with F = f6/1e6; NULL on zero total
    * variance. Products in double (the q286 overflow argument).
    */
  private def LeadEta2Expr: String =
    "CASE WHEN CAST(q AS DOUBLE) - CAST(sx AS DOUBLE) * " +
      "CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) <= 0.0 THEN NULL ELSE " +
      "(CAST(f6 AS DOUBLE) / 1e6 - CAST(sx AS DOUBLE) * " +
      "CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) / " +
      "(CAST(q AS DOUBLE) - CAST(sx AS DOUBLE) * " +
      "CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) END"
}
