package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the round-8 robust-statistics / multi-criteria
  * operators (q178 drawdown, q179 winsorized mean, q180 Gini, q181 Gram
  * matrix, q182 skyline, q183 ABC bands, q184 seasonal-naive error):
  * each is re-derived by an independent in-memory brute force on the
  * sf0.001 fixture and compared exactly — the oracle hash proves
  * cross-engine agreement, these prove the MATH.
  */
class RobustOpsSpec extends AnyFunSuite with SparkTestSession {

  private val d = "/root/testdata/sf0.001"

  test("q178 drawdown matches a sequential per-user replay") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q178_max_drawdown")(spark, d)
      .select($"user_id", $"n_events", $"max_value", $"max_drawdown", $"n_below_peak")
      .as[(Long, Long, Double, Double, Long)].collect().toSeq.sortBy(_._1)
    val events = spark.read.parquet(s"$d/events.parquet")
      .filter(graft.Ids.hash("user_id") % 20 === 0)
      .select($"user_id", expr("unix_micros(cast(ts AS timestamp))").as("tsl"),
        $"event_id", $"value")
      .as[(Long, Long, Long, Double)].collect()
    val expect = events.groupBy(_._1).map { case (u, es) =>
      val vs = es.sortBy(e => (e._2, e._3)).map(e => math.round(e._4 * 100))
      var peak = Long.MinValue; var dd = 0L; var below = 0L
      vs.foreach { v =>
        peak = math.max(peak, v)
        dd = math.max(dd, peak - v)
        if (v < peak) below += 1
      }
      (u, vs.length.toLong, vs.max / 100.0, dd / 100.0, below)
    }.toSeq.sortBy(_._1)
    assert(got == expect)
    assert(got.forall(r => r._4 >= 0 && r._3 >= 0))
  }

  test("q179 cuts are true order statistics and clipping is idempotent") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q179_winsorized_mean")(spark, d)
      .select($"lang", $"n_docs", $"n_clipped", $"mean_raw", $"mean_winsorized")
      .as[(String, Long, Long, Double, Double)].collect().toSeq.sortBy(_._1)
    val lens = spark.read.parquet(s"$d/documents.parquet")
      .select($"lang", $"n_chars").as[(String, Long)].collect()
    val sorted = lens.map(_._2).sorted
    val n = sorted.length
    val lo = sorted((math.ceil(0.05 * n) - 1).toInt)
    val hi = sorted((math.ceil(0.95 * n) - 1).toInt)
    assert(lo <= hi)
    val expect = lens.groupBy(_._1).map { case (lang, ds) =>
      val raw = ds.map(_._2)
      val w = raw.map(v => math.min(math.max(v, lo), hi))
      (lang, raw.length.toLong,
        raw.count(v => v < lo || v > hi).toLong,
        raw.sum.toDouble / raw.length, w.sum.toDouble / w.length)
    }.toSeq.sortBy(_._1)
    assert(got == expect)
    // winsorized mean lies inside [lo, hi]; clipping twice changes nothing
    got.foreach { r => assert(r._5 >= lo && r._5 <= hi) }
  }

  test("q180 Gini matches the sorted-rank closed form and sits in [0, 1)") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q180_gini_concentration")(spark, d)
      .select($"prio", $"n_orders", $"total_value", $"gini")
      .as[(String, Long, Double, Double)].collect().toSeq.sortBy(_._1)
    val orders = spark.read.parquet(s"$d/orders.parquet")
      .select($"o_orderpriority", $"o_totalprice").as[(String, Double)].collect()
    val expect = orders.groupBy(_._1).map { case (p, os) =>
      val xs = os.map(o => math.round(o._2 * 100)).sorted
      val nL = xs.length.toLong
      val s = xs.map(BigInt(_)).sum
      val s1 = xs.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
      val gini = (BigDecimal(2 * s1 - (nL + 1) * s) / BigDecimal(nL * s)).toDouble
      (p, nL, (BigDecimal(s) / 100).toDouble, gini)
    }.toSeq.sortBy(_._1)
    got.zip(expect).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2)
      assert(math.abs(g._3 - e._3) < 1e-6 && math.abs(g._4 - e._4) < 1e-12,
        s"prio ${g._1}: got $g expected $e")
      assert(g._4 >= 0.0 && g._4 < 1.0)
    }
  }

  test("q181 Gram matrix equals the in-memory XtX on quantized embeddings") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q181_gram_matrix")(spark, d)
      .select($"i", $"j", $"n_vecs", $"s")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    val vecs = spark.read.parquet(s"$d/embeddings.parquet")
      .select($"embedding").as[Array[Float]].collect()
      .map(_.map(x => math.floor(x.toDouble * 1e6).toLong))
    val dim = vecs.head.length
    assert(got.size == dim * (dim + 1) / 2)
    for (i <- 0 until dim; j <- i until dim) {
      val s = vecs.map(v => v(i) * v(j)).sum
      assert(got((i + 1).toLong, (j + 1).toLong) == (vecs.length.toLong, s),
        s"cell ($i, $j) mismatch")
    }
    // diagonal cells are sums of squares: strictly positive
    for (i <- 1 to dim) assert(got((i.toLong, i.toLong))._2 > 0)
  }

  test("q182 skyline equals the brute-force dominance filter") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q182_skyline_pareto")(spark, d)
      .select($"c_custkey", $"spend", $"bal")
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    val spend = spark.read.parquet(s"$d/orders.parquet")
      .groupBy($"o_custkey")
      .agg(sum(expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)")).as("sp"))
      .as[(Long, Long)].collect().toMap
    val pts = spark.read.parquet(s"$d/customer.parquet")
      .select($"c_custkey", $"c_acctbal").as[(Long, Double)].collect()
      .flatMap { case (k, b) =>
        spend.get(k).map(sp => (k, sp, math.round(b * 100)))
      }
    val expect = pts.filter { p =>
      !pts.exists(q => q._2 >= p._2 && q._3 >= p._3 &&
        (q._2 > p._2 || q._3 > p._3))
    }.toSeq.sortBy(_._1)
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("q183 bands partition all parts and respect the cumulative thresholds") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q183_abc_classification")(spark, d)
      .select($"band", $"n_parts", $"band_cents", $"revenue_share")
      .as[(String, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    val li = spark.read.parquet(s"$d/lineitem.parquet")
      .select($"l_partkey",
        (expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)") *
          expr("CAST(100 - ROUND(l_discount * 100) AS BIGINT)")).as("rev4"))
      .groupBy($"l_partkey").agg(sum($"rev4").as("rev4"))
      .as[(Long, Long)].collect()
      .map { case (k, r4) => (k, (r4 + 50) / 100) }
    val ordered = li.sortBy(p => (-p._2, p._1))
    val total = ordered.map(_._2).sum
    var cum = 0L
    val bands = ordered.map { case (_, c) =>
      cum += c
      if (cum * 100 <= total * 80) "A" else if (cum * 100 <= total * 95) "B" else "C"
    }
    val expect = bands.zip(ordered.map(_._2)).groupBy(_._1).map { case (b, xs) =>
      (b, xs.length.toLong, xs.map(_._2).sum, xs.map(_._2).sum.toDouble / total)
    }.toSeq.sortBy(_._1)
    assert(got == expect)
    assert(got.map(_._2).sum == li.length)
    assert(math.abs(got.map(_._4).sum - 1.0) < 1e-9)
  }

  test("q185 top pairs match a brute-force adjacent-pair census") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q185_bpe_merge_candidates")(spark, d)
      .select($"pair", $"n").as[(String, Long)].collect().toSeq
    val counts = spark.read.parquet(s"$d/documents.parquet")
      .select($"text").as[String].collect()
      .flatMap(_.split(" ", -1))
      .filter(_.length >= 2)
      .flatMap(w => (0 until w.length - 1).map(i => w.substring(i, i + 2)))
      .groupBy(identity).map { case (p, xs) => (p, xs.length.toLong) }
    val expect = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    assert(got == expect)
  }

  test("q186 ACF matches direct Pearson on the dense series") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q186_autocorrelation")(spark, d)
      .select($"prio", $"lag", $"n_pairs", $"acf")
      .as[(String, Long, Long, Option[Double])].collect().toSeq
      .sortBy(r => (r._1, r._2))
    val daily = spark.read.parquet(s"$d/orders.parquet")
      .select($"o_orderpriority".as("p"),
        expr("CAST(datediff(o_orderdate, DATE '1992-01-01') AS BIGINT)").as("day"))
      .as[(String, Long)].collect()
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val lo = daily.keys.map(_._2).min; val hi = daily.keys.map(_._2).max
    def pearson(xs: Seq[Long], ys: Seq[Long]): Option[Double] = {
      val n = xs.length.toDouble
      val (sx, sy) = (xs.sum.toDouble, ys.sum.toDouble)
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum.toDouble
      val sxx = xs.map(a => a * a).sum.toDouble
      val syy = ys.map(a => a * a).sum.toDouble
      val vx = n * sxx - sx * sx; val vy = n * syy - sy * sy
      if (vx * vy <= 0) None else Some((n * sxy - sx * sy) / math.sqrt(vx * vy))
    }
    val expect = (for {
      p <- daily.keys.map(_._1).toSeq.distinct
      k <- Seq(1L, 7L)
    } yield {
      val c = (lo to hi).map(day => daily.getOrElse((p, day), 0L))
      val pairs = c.dropRight(k.toInt).zip(c.drop(k.toInt))
      (p, k, pairs.length.toLong, pearson(pairs.map(_._1), pairs.map(_._2)))
    }).sortBy(r => (r._1, r._2))
    got.zip(expect).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2 && g._3 == e._3)
      (g._4, e._4) match {
        case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-12, s"$g vs $e")
        case (a, b) => assert(a == b)
      }
    }
  }

  test("q187 pins the three-valued-logic contract: NOT IN over NULLs is empty") {
    import spark.implicits._
    val Array((nNotIn, nNotExists, nCust)) =
      graft.SparkEntry.queries("q187_not_in_null_semantics")(spark, d)
        .as[(Long, Long, Long)].collect()
    // the fixture always has non-urgent orders, so the subquery carries
    // NULLs and standard SQL must return UNKNOWN for every candidate
    assert(nNotIn == 0L)
    val urgent = spark.read.parquet(s"$d/orders.parquet")
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_custkey").as[Long].collect().toSet
    val custs = spark.read.parquet(s"$d/customer.parquet")
      .select($"c_custkey").as[Long].collect()
    assert(nNotExists == custs.count(!urgent.contains(_)))
    assert(nCust == custs.length)
  }

  test("q188 shares are positive and sum to 1 inside every region") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q188_percent_of_parent")(spark, d)
      .select($"region", $"nation_revenue", $"share_of_region")
      .as[(String, Double, Double)].collect()
    assert(got.nonEmpty && got.forall(r => r._2 > 0 && r._3 > 0 && r._3 <= 1))
    got.groupBy(_._1).foreach { case (region, rows) =>
      assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-9,
        s"$region shares sum to ${rows.map(_._3).sum}")
    }
  }

  test("q189 growth curve is monotone and lands on the exact distinct total") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q189_cumulative_uniques")(spark, d)
      .select($"day", $"n_new_users", $"n_cum_users")
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got.map(_._2).sum == got.last._3)
    assert(got.map(_._3) == got.map(_._3).sorted)
    val total = spark.read.parquet(s"$d/events.parquet")
      .select($"user_id").distinct().count()
    assert(got.last._3 == total)
  }

  test("q190 HITS scores are L1-normalized per role and bipartite-disjoint") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q190_hits_bipartite")(spark, d)
      .select($"role", $"id", $"degree", $"score")
      .as[(String, Long, Long, Double)].collect()
    val (hubs, auths) = got.partition(_._1 == "hub")
    assert(hubs.nonEmpty && auths.nonEmpty)
    // L1 normalization: each role's scores sum to 1 (up to grid rounding)
    assert(math.abs(hubs.map(_._4).sum - 1.0) < 1e-9)
    assert(math.abs(auths.map(_._4).sum - 1.0) < 1e-9)
    assert(got.forall(r => r._4 > 0 && r._3 >= 1))
    // brute-force replay of the two quantized sweeps
    val e = spark.read.parquet(s"$d/lineitem.parquet")
      .join(spark.read.parquet(s"$d/orders.parquet"),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_suppkey", $"o_custkey")
      .agg(countDistinct($"o_orderkey").as("n"))
      .filter($"n" >= 2)
      .select($"l_suppkey", $"o_custkey").as[(Long, Long)].collect()
    val m = e.length.toDouble
    val a1 = e.groupBy(_._2).map { case (c, xs) => c -> xs.length / m }
    def normSweep(scores: Map[Long, Long]): Map[Long, Double] = {
      val tot = scores.values.sum.toDouble
      scores.map { case (k, v) => k -> v / tot }
    }
    val h1 = normSweep(e.groupBy(_._1).map { case (s, xs) =>
      s -> xs.map(x => math.round(a1(x._2) * 1e12)).sum
    })
    val a2 = normSweep(e.groupBy(_._2).map { case (c, xs) =>
      c -> xs.map(x => math.round(h1(x._1) * 1e12)).sum
    })
    val h2 = normSweep(e.groupBy(_._1).map { case (s, xs) =>
      s -> xs.map(x => math.round(a2(x._2) * 1e12)).sum
    })
    hubs.foreach(r => assert(math.abs(r._4 - h2(r._2)) < 1e-15, s"hub $r"))
    auths.foreach(r => assert(math.abs(r._4 - a2(r._2)) < 1e-15, s"auth $r"))
  }

  test("q191 histogram masses equal the corpus pixel count in both channels") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q191_channel_histogram")(spark, d)
      .select($"bin", $"n_red", $"n_green")
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got.map(_._1) == (0L to 15L))
    val totalPixels = spark.read.parquet(s"$d/documents.parquet")
      .select($"text").as[String].collect()
      .map { t =>
        val n = t.getBytes("UTF-8").length
        (16 + n % 64).toLong * (16 + (n * 7) % 64)
      }.sum
    assert(got.map(_._2).sum == totalPixels)
    assert(got.map(_._3).sum == totalPixels)
  }

  test("q192 two-sweep Lloyd matches an in-memory replay exactly") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q192_kmeans_lloyd")(spark, d)
      .select($"cid", $"n_members", $"inertia")
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    val vecs = spark.read.parquet(s"$d/embeddings.parquet")
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
      .map { case (id, e) =>
        (id, e.map(x => math.floor(x.toDouble * 1000.0).toLong))
      }
    def md5hash(id: Long): Long =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(id.toString.getBytes("UTF-8"))
          .take(4).map("%02x".format(_)).mkString, 16)
    val seeds = vecs.sortBy { case (id, _) => (md5hash(id), id) }.take(8)
      .zipWithIndex.map { case ((_, v), i) => (i + 1L, v) }
    def sq(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def assign(cents: Seq[(Long, Array[Long])]) = vecs.map { case (id, v) =>
      val best = cents.map { case (cid, c) => (sq(v, c), cid) }.minBy(identity)
      (id, v, best._2, best._1)
    }
    val a1 = assign(seeds)
    val c1 = a1.groupBy(_._3).toSeq.map { case (cid, xs) =>
      val n = xs.length
      val c = Array.tabulate(vecs.head._2.length) { dim =>
        math.floor(xs.map(_._2(dim)).sum.toDouble / n).toLong
      }
      (cid, c)
    }
    val a2 = assign(c1)
    val expect = a2.groupBy(_._3).toSeq.map { case (cid, xs) =>
      (cid, xs.length.toLong, xs.map(_._4).sum)
    }.sortBy(_._1)
    assert(got == expect)
    assert(got.map(_._2).sum == vecs.length)
  }

  test("q193 GROUP BY ALL resolves to the explicit grouping") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q193_group_by_all")(spark, d)
      .as[(String, String, Long, Double)].collect().toSeq
    val explicit = graft.Tables(spark, d, "orders")
      .groupBy($"o_orderpriority", $"o_orderstatus")
      .agg(count(lit(1)).as("n"),
        graft.Det.dsum($"o_totalprice").as("t"))
      .orderBy($"o_orderpriority", $"o_orderstatus", $"n", $"t")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got == explicit)
  }

  test("q194 island identity equals the sliding distinct count") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q194_rolling_active_users")(spark, d)
      .as[(Long, Long)].collect().toMap
    val ud = spark.read.parquet(s"$d/events.parquet")
      .select($"user_id",
        expr("CAST(datediff(cast(ts AS timestamp), DATE '2024-01-01') AS BIGINT)")
          .as("day"))
      .distinct().as[(Long, Long)].collect()
    val lo = ud.map(_._2).min; val hi = ud.map(_._2).max + 6
    (lo to hi).foreach { w =>
      val expect = ud.filter(x => x._2 >= w - 6 && x._2 <= w)
        .map(_._1).distinct.length.toLong
      assert(got.getOrElse(w, 0L) == expect, s"day $w")
    }
  }

  test("q195 running-min identity equals the sequential CUSUM recurrence") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q195_cusum_changepoint")(spark, d)
      .select($"prio", $"n_days", $"n_alert_days", $"max_cusum")
      .as[(String, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    val daily = spark.read.parquet(s"$d/orders.parquet")
      .select($"o_orderpriority".as("p"),
        expr("CAST(datediff(o_orderdate, DATE '1992-01-01') AS BIGINT)").as("day"))
      .as[(String, Long)].collect()
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val lo = daily.keys.map(_._2).min; val hi = daily.keys.map(_._2).max
    val expect = daily.keys.map(_._1).toSeq.distinct.map { p =>
      val c = (lo to hi).map(day => daily.getOrElse((p, day), 0L))
      val n = c.length.toLong
      val total = c.sum
      // the textbook sequential recurrence, n-scaled
      var s = 0L; var alerts = 0L; var maxS = 0L
      c.foreach { ct =>
        s = math.max(0L, s + (ct * n - total))
        if (s > n * 10) alerts += 1
        maxS = math.max(maxS, s)
      }
      (p, n, alerts, maxS.toDouble / n)
    }.sortBy(_._1)
    assert(got == expect)
  }

  test("q196 three-sweep costs match a bounded Bellman-Ford replay") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q196_weighted_shortest_path")(spark, d)
      .as[(Long, Long)].collect().toMap
    // independent edge derivation: basket pairs with support >= 2
    val baskets = spark.read.parquet(s"$d/lineitem.parquet")
      .select($"l_orderkey", $"l_partkey").distinct()
      .as[(Long, Long)].collect().groupBy(_._1).values.map(_.map(_._2).toSeq)
    val support = baskets.toSeq.flatMap(ps =>
      ps.combinations(2).map(_.sorted).map(p => (p(0), p(1))))
      .groupBy(identity).collect { case (k, v) if v.size >= 2 => (k, v.size.toLong) }
    val adj = support.toSeq.flatMap { case ((a, b), w) =>
      val cost = math.max(1L, 1000L / w)
      Seq((a, b, cost), (b, a, cost))
    }.groupBy(_._1)
    var dist = Map(0L -> 0L)
    for (_ <- 1 to 3) {
      val relaxed = dist.toSeq.flatMap { case (u, c) =>
        adj.getOrElse(u, Nil).map { case (_, v, ec) => (v, c + ec) }
      }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1)
        .map { case (k, vs) => k -> vs.map(_._2).min }
    }
    assert(got == dist)
    assert(got(0L) == 0L && got.size > 1)
  }

  test("q197 the promised FD holds and the broken one matches brute force") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q197_fd_audit")(spark, d)
      .select($"fd", $"n_keys", $"n_violating", $"max_fanout")
      .as[(String, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    val Seq(nr, ps) = got
    assert(nr._1 == "nation->region" && nr._3 == 0L && nr._4 == 1L,
      s"the star schema's promised FD must hold: $nr")
    val fan = spark.read.parquet(s"$d/lineitem.parquet")
      .select($"l_partkey", $"l_suppkey").distinct()
      .as[(Long, Long)].collect().groupBy(_._1).map(_._2.length.toLong)
    assert(ps == (("part->supplier"), fan.size.toLong,
      fan.count(_ > 1).toLong, fan.max))
  }

  test("q198 deciles partition each priority with standard NTILE fill") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q198_ntile_deciles")(spark, d)
      .select($"o_orderpriority", $"tile", $"n_orders")
      .as[(String, Long, Long)].collect().toSeq
    got.groupBy(_._1).foreach { case (prio, tiles) =>
      val n = tiles.map(_._3).sum
      val k = tiles.length
      assert(k == 10 || n < 10, s"$prio: $k tiles for $n rows")
      // standard fill: first (n mod k) tiles get ceil(n/k), rest floor
      val sizes = tiles.sortBy(_._2).map(_._3)
      val (big, small) = ((n + k - 1) / k, n / k)
      val nBig = (n % k).toInt
      assert(sizes == Seq.fill(nBig)(big) ++
        Seq.fill(k - nBig)(if (n % k == 0) big else small),
        s"$prio sizes $sizes violate the standard NTILE distribution")
    }
  }

  test("q184 seasonal-naive MAE matches a dense-calendar replay") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q184_seasonal_naive_error")(spark, d)
      .select($"prio", $"n_days", $"total_abs_err", $"mae")
      .as[(String, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    val daily = spark.read.parquet(s"$d/orders.parquet")
      .select($"o_orderpriority".as("p"),
        expr("CAST(datediff(o_orderdate, DATE '1992-01-01') AS BIGINT)").as("day"))
      .as[(String, Long)].collect()
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val lo = daily.keys.map(_._2).min
    val hi = daily.keys.map(_._2).max
    val prios = daily.keys.map(_._1).toSeq.distinct
    val expect = prios.map { p =>
      val c = (lo to hi).map(day => daily.getOrElse((p, day), 0L))
      val errs = (7 until c.length).map(t => math.abs(c(t) - c(t - 7)))
      (p, errs.length.toLong, errs.sum, errs.sum.toDouble / errs.length)
    }.sortBy(_._1)
    assert(got == expect)
  }
}
