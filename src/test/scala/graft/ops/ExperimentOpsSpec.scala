package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the experiment-analysis / normalization /
  * planner-audit batch (q199 A/B z-test, q200 quantile normalization,
  * q201 join-size estimate, q202 dyadic EWMA, q203 audio zero
  * crossings): each is re-derived by an independent in-memory brute
  * force on the sf0.001 fixture and compared exactly — the oracle hash
  * proves cross-engine agreement, these prove the MATH.
  */
class ExperimentOpsSpec extends AnyFunSuite with SparkTestSession {

  private val d = "/root/testdata/sf0.001"

  private def idHash(id: Long): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .take(4).map(b => f"${b & 0xff}%02x").mkString, 16)

  test("q199 z-test matches a per-user replay and the arms partition exposed users") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q199_ab_conversion_ztest")(spark, d)
      .select($"n_a", $"x_a", $"n_b", $"x_b", $"p_a", $"p_b", $"z_stat",
        $"significant")
      .as[(Long, Long, Long, Long, Double, Double, Double, Long)]
      .collect().toSeq
    assert(got.size == 1)
    val ev = spark.read.parquet(s"$d/events.parquet")
      .select($"user_id", $"event_type").as[(Long, String)].collect()
    val perUser = ev.groupBy(_._1).iterator.collect {
      case (u, es) if es.exists(_._2 == "view") =>
        (idHash(u) % 2 == 0, es.exists(_._2 == "purchase"))
    }.toSeq
    val na = perUser.count(_._1).toLong
    val xa = perUser.count(p => p._1 && p._2).toLong
    val nb = perUser.count(!_._1).toLong
    val xb = perUser.count(p => !p._1 && p._2).toLong
    val (pa, pb) = (xa.toDouble / na, xb.toDouble / nb)
    val pp = (xa + xb).toDouble / (na + nb)
    val se = math.sqrt((pp * (1.0 - pp)) * (1.0 / na + 1.0 / nb))
    val z = if (se == 0.0) 0.0 else (pa - pb) / se
    val sig = if (se != 0.0 && math.abs(z) > 1.96) 1L else 0L
    assert(got.head == ((na, xa, nb, xb, pa, pb, z, sig)))
    // the split covers every exposed user exactly once
    assert(na + nb == perUser.size)
  }

  test("q200 normalized scores are the global order statistics at the mapped ranks") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q200_quantile_normalization")(spark, d)
      .select($"source", $"n_docs", $"min_norm", $"max_norm", $"mean_norm",
        $"mean_raw")
      .as[(String, Long, Long, Long, Double, Double)].collect().toSeq.sortBy(_._1)
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select($"doc_id", $"source", $"n_chars").as[(Long, String, Long)]
      .collect()
    val global = docs.map(_._3).sorted // 1-indexed order statistics
    val n = global.length.toLong
    val expect = docs.groupBy(_._2).map { case (src, ds) =>
      val ns = ds.length.toLong
      val ranked = ds.sortBy(x => (x._3, x._1)).zipWithIndex
      val norm = ranked.map { case (_, i) =>
        val r = i + 1L
        val pos = (r * n + ns - 1L) / ns // ceil(r*n/ns), all-integer
        global((pos - 1L).toInt)
      }
      (src, ns, norm.min, norm.max,
        norm.sum.toDouble / ns, ds.map(_._3).sum.toDouble / ns)
    }.toSeq.sortBy(_._1)
    assert(got == expect)
    // every source's top rank maps to the global maximum
    assert(got.forall(_._4 == global.last))
  }

  test("q201 exact self-join size is the second frequency moment; estimator replayed") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q201_join_size_estimate")(spark, d)
      .select($"n_rows", $"n_distinct", $"exact_size", $"est_size", $"rel_err")
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    assert(got.size == 1)
    val counts = spark.read.parquet(s"$d/lineitem.parquet")
      .select($"l_partkey").as[Long].collect()
      .groupBy(identity).map { case (k, v) => (k, v.length.toLong) }.toSeq
    val exact = counts.map(c => c._2 * c._2).sum
    val nRows = counts.map(_._2).sum
    val nDist = counts.size.toLong
    val mcv = counts.sortBy(c => (-c._2, c._1)).take(100)
    val est = mcv.map(c => c._2 * c._2).sum.toDouble + (
      if (nDist > mcv.size) {
        val restN = nRows - mcv.map(_._2).sum
        (restN * restN).toDouble / (nDist - mcv.size)
      } else 0.0)
    assert(got.head._1 == nRows && got.head._2 == nDist && got.head._3 == exact)
    assert(got.head._4 == est)
    assert(got.head._5 == math.abs(est - exact.toDouble) / exact.toDouble)
  }

  test("q202 EWMA matches a sequential dyadic replay per event type") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q202_ewma_level_shift")(spark, d)
      .select($"etype", $"n_days", $"max_ewma", $"n_spike_days")
      .as[(String, Long, Double, Long)].collect().toSeq.sortBy(_._1)
    val days = spark.read.parquet(s"$d/events.parquet")
      .select($"event_type",
        expr("CAST(datediff(cast(ts AS timestamp), DATE '2024-01-01') AS BIGINT)")
          .as("day"))
      .as[(String, Long)].collect()
    val (lo, hi) = (days.map(_._2).min, days.map(_._2).max)
    val expect = days.groupBy(_._1).map { case (t, es) =>
      val byDay = es.groupBy(_._2).map { case (k, v) => (k, v.length.toLong) }
      val cs = (lo to hi).map(day => byDay.getOrElse(day, 0L))
      val es16 = cs.indices.map { t =>
        (0 to 15).map(k =>
          (if (t - k >= 0) cs(t - k) else 0L) * (1L << (15 - k))).sum
      }
      val spikes = cs.indices.count(i =>
        i + 1 > 16 && cs(i) * 65536L > es16(i - 1) * 3L).toLong
      (t, cs.length.toLong, es16.max.toDouble / 65536.0, spikes)
    }.toSeq.sortBy(_._1)
    assert(got == expect)
  }

  test("q203 crossings match the ramp's closed form, independent of the codec") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q203_audio_zero_crossings")(spark, d)
      .select($"doc_id", $"channels", $"n_frames", $"n_crossings", $"peak")
      .as[(Long, Int, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    val blobs = spark.read.parquet(s"$d/documents.parquet")
      .select($"doc_id", length(encode($"text", "UTF-8")).cast("long"))
      .as[(Long, Long)].collect().toSeq.sortBy(_._1)
    val expect = blobs.map { case (id, n) =>
      val ch = (1 + n % 2).toInt
      val frames = 100 + (n * 3) % 900
      def s(i: Long): Long = (n + i * 7) % 4001 - 2000
      val crossings = (0 until ch).map { c =>
        (0L until frames - 1).count(j =>
          s(j * ch + c) * s((j + 1) * ch + c) < 0).toLong
      }.sum
      val peak = (0L until frames * ch).map(i => math.abs(s(i))).max
      (id, ch, frames, crossings, peak)
    }
    assert(got == expect)
    // short ramps may stay one-signed, but the corpus as a whole crosses
    assert(got.exists(_._4 > 0))
  }

  test("q204 triples match a brute-force basket census; support bounded by pairs") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q204_frequent_triples")(spark, d)
      .select($"a", $"b", $"c", $"support", $"min_pair", $"floor_confidence")
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
      .sortBy(t => (t._1, t._2, t._3))
    val baskets = spark.read.parquet(s"$d/lineitem.parquet")
      .select($"l_orderkey", $"l_partkey").distinct()
      .as[(Long, Long)].collect()
      .groupBy(_._1).values.map(_.map(_._2).sorted.toSeq).toSeq
    val triCount = scala.collection.mutable.Map.empty[(Long, Long, Long), Long]
    val pairCount = scala.collection.mutable.Map.empty[(Long, Long), Long]
    baskets.foreach { ps =>
      ps.combinations(3).foreach { t =>
        triCount((t(0), t(1), t(2))) = triCount.getOrElse((t(0), t(1), t(2)), 0L) + 1
      }
      ps.combinations(2).foreach { p =>
        pairCount((p(0), p(1))) = pairCount.getOrElse((p(0), p(1)), 0L) + 1
      }
    }
    val expect = triCount.toSeq.collect { case ((a, b, c), w) if w >= 2 =>
      val mp = Seq(pairCount((a, b)), pairCount((a, c)), pairCount((b, c))).min
      (a, b, c, w, mp, w.toDouble / mp)
    }.sortBy(t => (t._1, t._2, t._3))
    assert(got == expect)
    // anti-monotonicity: a triple can never out-support its weakest pair
    assert(got.forall(t => t._4 <= t._5))
  }

  test("q205 merged partials equal the full recompute on every group") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q205_incremental_agg_maintenance")(spark, d)
      .select($"etype", $"n_base", $"n_delta", $"n_merged", $"n_full",
        $"avg_merged", $"avg_full", $"agree")
      .as[(String, Long, Long, Long, Long, Double, Double, Long)]
      .collect().toSeq
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r._2 + r._3 == r._4 && r._4 == r._5, s"counts diverge: $r")
      assert(r._6 == r._7, s"avg from merged partials diverges: $r")
      assert(r._8 == 1L, s"agree flag down: $r")
    }
    // the cutoff actually splits the stream (both legs non-empty somewhere)
    assert(got.exists(_._2 > 0) && got.exists(_._3 > 0))
  }

  test("q206 sketch matches an in-memory Haar pyramid and satisfies Parseval") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q206_haar_sketch")(spark, d)
      .select($"rn", $"level", $"pos", $"detail")
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    val months = spark.read.parquet(s"$d/orders.parquet")
      .select(expr("CAST((year(o_orderdate) - 1992) * 12 + month(o_orderdate) - 1 AS BIGINT)"))
      .as[Long].collect()
    val series = Array.fill(128)(0L)
    months.foreach(m => series(m.toInt) += 1)
    var cur = series.toSeq
    val all = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    for (k <- 1 to 7) {
      val next = cur.grouped(2).map(p => p(0) + p(1)).toSeq
      val det = cur.grouped(2).map(p => p(0) - p(1)).toSeq
      det.zipWithIndex.foreach { case (dv, p) => all += ((k.toLong, p.toLong, dv)) }
      cur = next
    }
    all += ((8L, 0L, cur.head)) // DC term
    val expect = all.sortBy(t => (-math.abs(t._3), t._1, t._2)).take(8)
      .zipWithIndex.map { case ((l, p, dv), i) => (i + 1L, l, p, dv) }.toSeq
    assert(got == expect)
    // unnormalized Parseval: sum over levels of 2^-k * (details_k^2) plus
    // 2^-7 * DC^2 equals the series energy — checked on the FULL pyramid
    val lhs = all.map { case (l, _, dv) =>
      BigInt(dv) * BigInt(dv) * BigInt(1) << (7 - math.min(l, 7L).toInt)
    }.sum
    val rhs = series.map(v => BigInt(v) * BigInt(v)).sum * BigInt(128)
    assert(lhs == rhs, s"Parseval: $lhs vs $rhs")
  }

  test("q207 phrase hits match an in-memory positional scan with overlap counting") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q207_phrase_search")(spark, d)
      .select($"doc_id", $"n_occurrences", $"first_pos")
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    val texts = spark.read.parquet(s"$d/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val adj = texts.flatMap { case (id, t) =>
      val ts = t.split(" ", -1)
      (0 until ts.length - 1).map(i => (id, i + 1L, (ts(i), ts(i + 1))))
    }
    val top = adj.groupBy(_._3).view.mapValues(_.length).toSeq
      .sortBy { case ((w1, w2), n) => (-n, w1, w2) }.head._1
    val expect = adj.filter(_._3 == top).groupBy(_._1).map { case (id, os) =>
      (id, os.length.toLong, os.map(_._2).min)
    }.toSeq.sortBy(_._1)
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("q208 lift and gains replay from the ranked user list; gains end at 1") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q208_gains_table")(spark, d)
      .select($"decile", $"n_users", $"n_conv", $"conv_rate", $"lift",
        $"cum_gains")
      .as[(Long, Long, Long, Double, Double, Double)].collect().toSeq
      .sortBy(_._1)
    val ev = spark.read.parquet(s"$d/events.parquet")
      .select($"user_id", $"event_type",
        expr("CAST(ROUND(value * 100) AS BIGINT)"))
      .as[(Long, String, Long)].collect()
    val users = ev.groupBy(_._1).map { case (u, es) =>
      (u, es.map(_._3).sum, if (es.exists(_._2 == "purchase")) 1L else 0L)
    }.toSeq.sortBy(t => (-t._2, t._1))
    val n = users.length.toLong
    val totalConv = users.map(_._3).sum
    val dec = users.zipWithIndex.groupBy { case (_, i) => i.toLong * 10 / n }
    var cum = 0L
    val expect = (0L to 9L).map { dcl =>
      val us = dec(dcl).map(_._1)
      val conv = us.map(_._3).sum
      cum += conv
      (dcl, us.length.toLong, conv, conv.toDouble / us.length,
        (conv * n).toDouble / (us.length * totalConv),
        cum.toDouble / totalConv)
    }
    assert(got == expect)
    assert(math.abs(got.last._6 - 1.0) == 0.0)
    // the score actually targets: top decile must beat the bottom
    assert(got.head._4 >= got.last._4)
  }

  test("q209 keywords match an in-memory tf-idf ranking per document") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q209_doc_keywords")(spark, d)
      .select($"doc_id", $"rank", $"token", $"tf", $"df", $"score")
      .as[(Long, Long, String, Long, Long, Double)].collect().toSeq
      .sortBy(t => (t._1, t._2))
    val texts = spark.read.parquet(s"$d/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val tf = texts.flatMap { case (id, t) =>
      t.split(" ", -1).groupBy(identity).map { case (w, o) =>
        (id, w, o.length.toLong)
      }
    }
    val df = tf.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n = texts.length.toLong
    val expect = tf.groupBy(_._1).iterator.flatMap { case (id, ts) =>
      ts.map { case (_, w, f) => (w, f, df(w), (f * n).toDouble / df(w)) }
        .sortBy { case (w, _, _, sc) => (-sc, w) }.take(3).zipWithIndex
        .map { case ((w, f, dfw, sc), i) => (id, i + 1L, w, f, dfw, sc) }
    }.toSeq.sortBy(t => (t._1, t._2))
    assert(got == expect)
  }

  test("q210 allocation sums to the budget and follows N·sigma ordering") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q210_neyman_allocation")(spark, d)
      .select($"lang", $"n_docs", $"wq", $"alloc", $"n_sampled",
        $"sample_mean_chars")
      .as[(String, Long, Long, Long, Long, Double)].collect().toSeq
      .sortBy(_._1)
    // replay the largest-remainder apportionment in exact integers
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select($"lang", $"n_chars").as[(String, Long)].collect()
    val strata = docs.groupBy(_._1).map { case (l, ds) =>
      val xs = ds.map(_._2)
      val (nH, s1, s2) = (xs.length.toLong, xs.sum, xs.map(x => x * x).sum)
      (l, nH, math.round(math.sqrt((nH * s2 - s1 * s1).toDouble) * 1e6))
    }.toSeq.sortBy(_._1)
    val bigW = strata.map(_._3).sum
    val based = strata.map { case (l, nH, wq) =>
      (l, nH, wq, 100L * wq / bigW, 100L * wq % bigW)
    }
    val spare = 100L - based.map(_._4).sum
    val topUp = based.sortBy(t => (-t._5, t._1)).take(spare.toInt)
      .map(_._1).toSet
    val expectAlloc = based.map { case (l, nH, wq, b, _) =>
      (l, nH, wq, b + (if (topUp(l)) 1L else 0L))
    }.sortBy(_._1)
    assert(got.map(t => (t._1, t._2, t._3, t._4)) == expectAlloc)
    assert(got.map(_._4).sum == 100L)
    // every stratum fills its allocation (fixture strata are large enough)
    assert(got.forall(r => r._5 == math.min(r._4, r._2)))
  }

  test("q211 PQ codebook matches an in-memory two-sweep replay per block") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q211_pq_codebook")(spark, d)
      .select($"block", $"n_vecs", $"n_codes_used", $"inertia", $"mean_dist")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    val vecs = spark.read.parquet(s"$d/embeddings.parquet")
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
      .map { case (id, e) =>
        (id, e.map(x => math.floor(x.toDouble * 1000.0).toLong))
      }
    val seeds = vecs.map { case (id, v) => (idHash(id), id, v) }
      .sortBy(t => (t._1, t._2)).take(8).zipWithIndex
      .map { case ((_, _, v), i) => (i + 1L, v) }
    def dist(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val expect = (0L to 3L).map { blk =>
      val lo = blk.toInt * 16
      val bvs = vecs.map { case (id, v) => (id, v.slice(lo, lo + 16)) }
      val cb0 = seeds.map { case (cid, v) => (cid, v.slice(lo, lo + 16)) }
      def assign(cb: Seq[(Long, Array[Long])]) = bvs.map { case (id, bv) =>
        val best = cb.map { case (cid, cv) => (dist(bv, cv), cid) }.min
        (id, bv, best._2, best._1)
      }
      val a1 = assign(cb0)
      val cb1 = a1.groupBy(_._3).map { case (cid, ms) =>
        (cid, Array.tabulate(16)(p =>
          math.floor(ms.map(_._2(p)).sum.toDouble / ms.length).toLong))
      }.toSeq
      val a2 = assign(cb1)
      (blk, a2.length.toLong, a2.map(_._3).distinct.length.toLong,
        a2.map(_._4).sum,
        a2.map(_._4).sum.toDouble / a2.length)
    }
    assert(got == expect)
    // every block uses more than one code on the fixture
    assert(got.forall(_._3 > 1))
  }

  test("q212 point-in-time tiers match a sequential per-user replay") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q212_point_in_time_join")(spark, d)
      .select($"tier", $"n_purchases", $"revenue_cents", $"avg_cents")
      .as[(String, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    val ev = spark.read.parquet(s"$d/events.parquet")
      .select($"user_id", expr("unix_micros(cast(ts AS timestamp))"),
        $"event_id", $"event_type", $"value")
      .as[(Long, Long, Long, String, Double)].collect()
    def tier(v: Double) = if (v < 30.0) "basic" else if (v < 70.0) "plus" else "pro"
    val assigned = ev.groupBy(_._1).iterator.flatMap { case (_, es) =>
      // replay in (ts, kind, event_id) order: signup updates state,
      // purchase reads it
      var cur: String = "none"
      es.sortBy(e => (e._2, if (e._4 == "signup") 0 else 1, e._3)).flatMap {
        case (_, _, _, "signup", v) => cur = tier(v); None
        case (_, _, _, "purchase", v) => Some((cur, math.round(v * 100)))
        case _ => None
      }
    }.toSeq
    val expect = assigned.groupBy(_._1).map { case (t, ps) =>
      (t, ps.length.toLong, ps.map(_._2).sum,
        ps.map(_._2).sum.toDouble / ps.length)
    }.toSeq.sortBy(_._1)
    assert(got == expect)
    // temporal correctness bites on the fixture: not every purchase is 'none'
    assert(got.exists(_._1 != "none"))
  }

  test("q213 split maximizes the contrast — checked against the naive rescan") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q213_binary_segmentation")(spark, d)
      .select($"prio", $"split_day", $"contrast", $"mean_left", $"mean_right")
      .as[(String, Long, Double, Double, Double)].collect().toSeq.sortBy(_._1)
    val days = spark.read.parquet(s"$d/orders.parquet")
      .select($"o_orderpriority",
        expr("CAST(datediff(o_orderdate, DATE '1992-01-01') AS BIGINT)"))
      .as[(String, Long)].collect()
    val (lo, hi) = (days.map(_._2).min, days.map(_._2).max)
    val expect = days.groupBy(_._1).map { case (prio, ds) =>
      val byDay = ds.groupBy(_._2).map { case (k, v) => (k, v.length.toLong) }
      val cs = (lo to hi).map(day => byDay.getOrElse(day, 0L))
      val (nd, total) = (cs.length.toLong, cs.sum)
      // the NAIVE formulation: recompute both segment means per split
      val cands = (1L until nd).map { t =>
        val st = cs.take(t.toInt).sum
        val num = (nd * st - t * total).toDouble
        (num * num / (t * (nd - t)).toDouble, lo + t - 1, st, t)
      }
      val best = cands.maxBy(c => (c._1, -c._2))
      (prio, best._2, best._1, best._3.toDouble / best._4,
        (total - best._3).toDouble / (nd - best._4))
    }.toSeq.sortBy(_._1)
    assert(got == expect)
    // a split separates: left and right means differ where contrast > 0
    assert(got.forall(r => r._3 == 0.0 || r._4 != r._5))
  }

  test("q214 features replay sequentially; edges are NULL not zero") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q214_lag_features")(spark, d)
      .select($"etype", $"day", $"c", $"lag_1", $"lag_7", $"trail_7",
        $"trail_mean", $"delta_1")
      .as[(String, Long, Long, Option[Long], Option[Long], Long, Double,
        Option[Long])].collect().toSeq.sortBy(t => (t._1, t._2))
    val days = spark.read.parquet(s"$d/events.parquet")
      .select($"event_type",
        expr("CAST(datediff(cast(ts AS timestamp), DATE '2024-01-01') AS BIGINT)"))
      .as[(String, Long)].collect()
    val (lo, hi) = (days.map(_._2).min, days.map(_._2).max)
    val expect = days.groupBy(_._1).iterator.flatMap { case (t, ds) =>
      val byDay = ds.groupBy(_._2).map { case (k, v) => (k, v.length.toLong) }
      val cs = (lo to hi).map(day => byDay.getOrElse(day, 0L)).toIndexedSeq
      cs.indices.map { i =>
        val t7 = cs.slice(math.max(0, i - 6), i + 1)
        (t, lo + i, cs(i),
          if (i >= 1) Some(cs(i - 1)) else None,
          if (i >= 7) Some(cs(i - 7)) else None,
          t7.sum, t7.sum.toDouble / t7.length,
          if (i >= 1) Some(cs(i) - cs(i - 1)) else None)
      }
    }.toSeq.sortBy(t => (t._1, t._2))
    assert(got == expect)
    assert(got.filter(_._2 == lo).forall(r => r._4.isEmpty && r._8.isEmpty))
  }

  test("q215 LOO encoding replays per brand and never equals the leaking mean") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q215_target_encoding")(spark, d)
      .select($"brand", $"n_rows", $"n_pos", $"naive_rate", $"enc_min",
        $"enc_max", $"enc_mean")
      .as[(String, Long, Long, Double, Double, Double, Double)]
      .collect().toSeq.sortBy(_._1)
    val li = spark.read.parquet(s"$d/lineitem.parquet")
      .select($"l_partkey", $"l_returnflag").as[(Long, String)].collect()
    val brandOf = spark.read.parquet(s"$d/part.parquet")
      .select($"p_partkey", $"p_brand").as[(Long, String)].collect().toMap
    val rows = li.map { case (pk, rf) => (brandOf(pk), if (rf == "R") 1L else 0L) }
    val prior = rows.map(_._2).sum.toDouble / rows.length
    val expect = rows.groupBy(_._1).map { case (b, rs) =>
      val (n, pos) = (rs.length.toLong, rs.map(_._2).sum)
      val encs = rs.map(r =>
        ((pos - r._2).toDouble + 10.0 * prior) / ((n - 1).toDouble + 10.0))
      val encMean = encs.map(e =>
        BigDecimal(e).setScale(6, BigDecimal.RoundingMode.HALF_EVEN)).sum
      (b, n, pos, pos.toDouble / n, encs.min, encs.max,
        encMean.toDouble / n)
    }.toSeq.sortBy(_._1)
    assert(got.map(r => (r._1, r._2, r._3, r._4, r._5, r._6)) ==
      expect.map(r => (r._1, r._2, r._3, r._4, r._5, r._6)))
    got.zip(expect).foreach { case (g, e) =>
      assert(math.abs(g._7 - e._7) < 1e-9, s"${g._1}: ${g._7} vs ${e._7}")
    }
    // LOO ≠ naive mean wherever the brand has both outcomes
    assert(got.exists(r => r._5 != r._6))
  }

  test("q216 metrics are consistent with the registered q116 matrix") {
    import spark.implicits._
    val matrix = graft.SparkEntry.queries("q116_centroid_classifier")(spark, d)
      .select($"label_actual", $"label_pred", $"n_vecs")
      .as[(Int, Int, Long)].collect().toSeq
    val got = graft.SparkEntry.queries("q216_confusion_metrics")(spark, d)
      .select($"label", $"n_actual", $"n_pred", $"tp", $"precision",
        $"recall", $"f1")
      .as[(Int, Long, Long, Long, Double, Double, Double)].collect().toSeq
      .sortBy(_._1)
    val labels = (matrix.map(_._1) ++ matrix.map(_._2)).distinct.sorted
    val expect = labels.map { l =>
      val na = matrix.filter(_._1 == l).map(_._3).sum
      val np = matrix.filter(_._2 == l).map(_._3).sum
      val tp = matrix.filter(m => m._1 == l && m._2 == l).map(_._3).sum
      (l, na, np, tp,
        if (np == 0) 0.0 else tp.toDouble / np,
        if (na == 0) 0.0 else tp.toDouble / na,
        if (na + np == 0) 0.0 else (2 * tp).toDouble / (na + np))
    }
    assert(got == expect)
    // F1 is between min and max of precision/recall wherever defined
    got.filter(r => r._5 > 0 && r._6 > 0).foreach { r =>
      assert(r._7 >= math.min(r._5, r._6) - 1e-12 &&
        r._7 <= math.max(r._5, r._6) + 1e-12)
    }
  }

  test("q217 modularity replays from the registered q157 assignment") {
    import spark.implicits._
    val labels = graft.SparkEntry.queries("q157_label_propagation")(spark, d)
      .select($"node", $"community").as[(Long, Long)].collect().toMap
    val got = graft.SparkEntry.queries("q217_modularity_score")(spark, d)
      .select($"community", $"e_intra", $"d_c", $"contribution")
      .as[(Long, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    // rebuild the supported symmetric edge relation like the query does
    val baskets = spark.read.parquet(s"$d/lineitem.parquet")
      .select($"l_orderkey", $"l_partkey").distinct()
      .as[(Long, Long)].collect().groupBy(_._1).values
      .map(_.map(_._2).sorted.toSeq)
    val half = baskets.toSeq.flatMap(_.combinations(2).map(p => (p(0), p(1))))
      .groupBy(identity).view.mapValues(_.length).filter(_._2 >= 2).keys.toSeq
    val edges = half.flatMap(p => Seq(p, (p._2, p._1)))
    val m2 = edges.length.toLong
    val deg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val expect = labels.values.toSeq.distinct.sorted.map { c =>
      val members = labels.collect { case (n, cc) if cc == c => n }.toSet
      val eIntra = edges.count(e =>
        members(e._1) && labels(e._2) == c).toLong
      val dC = members.toSeq.map(n => deg.getOrElse(n, 0L)).sum
      (c, eIntra, dC,
        (eIntra.toDouble * m2 - dC.toDouble * dC.toDouble) / (m2.toDouble * m2))
    }
    assert(got == expect)
    // total modularity is a proper score: in (-1, 1]
    val q = got.map(_._4).sum
    assert(q > -1.0 && q <= 1.0)
  }

  test("q157 + q217 deploy ONE shared LPA assignment (a single three-sweep build)") {
    // the communities and their modularity must grade the identical frozen
    // assignment without re-running the three propagation sweeps per
    // consumer — q217 re-ran them before the share and was the slowest
    // bench query two rounds straight (8.85 s driver vs 3.73 s pair in r11)
    graft.ops.Graph.lpaEvict(spark, d)
    val before = graft.ops.Graph.lpaBuilds
    assert(graft.SparkEntry.queries("q157_label_propagation")(spark, d).count() > 0)
    assert(graft.SparkEntry.queries("q217_modularity_score")(spark, d).count() > 0)
    assert(graft.ops.Graph.lpaBuilds - before == 1L,
      s"the LPA family ran ${graft.ops.Graph.lpaBuilds - before} three-sweep builds; must be 1")
  }

  test("q218 SQL owners agree with ShardAssignment.split and its goldens") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q218_shard_rebalance_plan")(spark, d)
      .select($"shard_id", $"n_records", $"old_owner", $"new_owner", $"moved")
      .as[(String, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got.size == 5)
    // the SQL owner derivation must equal the source layer's function
    val shards = (0 until 5).toSeq
    def owners(n: Int): Map[Int, Int] =
      graft.source.ShardAssignment.split(shards, n).zipWithIndex
        .flatMap { case (ss, i) => ss.map(_ -> i) }.toMap
    val (o2, o3) = (owners(2), owners(3))
    got.zipWithIndex.foreach { case (r, s) =>
      assert(r._3 == o2(s).toLong && r._4 == o3(s).toLong,
        s"shard $s: SQL (${r._3}, ${r._4}) vs function (${o2(s)}, ${o3(s)})")
    }
    // the reference golden: 5 shards / 3 clients split [2, 1, 2]
    assert(graft.source.ShardAssignment.split(shards, 3).map(_.size) ==
      Seq(2, 1, 2))
    // contiguous-range rebalance is minimal-movement: growing 2 -> 3
    // clients moves strictly fewer shards than a full reshuffle
    assert(got.count(_._5 == 1L) < 5)
    // every record is accounted for
    val evTotal = spark.read.parquet(s"$d/events.parquet").count()
    assert(got.map(_._2).sum == evTotal)
  }

  test("q219 waste replays per strategy; sorting can only help") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q219_padding_waste_audit")(spark, d)
      .select($"strategy", $"n_batches", $"total_tokens", $"padding_waste",
        $"waste_ratio")
      .as[(String, Long, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select($"doc_id", size(split($"text", " ")).cast("long"))
      .as[(Long, Long)].collect()
    def replay(ordered: Seq[Long]): (Long, Long, Long) = {
      val batches = ordered.grouped(32).toSeq
      (batches.length.toLong, ordered.sum,
        batches.map(b => b.length * b.max - b.sum).sum)
    }
    val hashOrd = docs.sortBy { case (id, _) => (idHash(id), id) }.map(_._2)
    val lenOrd = docs.sortBy { case (id, l) => (-l, id) }.map(_._2)
    val (hb, ht, hw) = replay(hashOrd)
    val (sb, st, sw) = replay(lenOrd)
    assert(got.map(r => (r._1, r._2, r._3, r._4)) == Seq(
      ("hash_order", hb, ht, hw), ("length_sorted", sb, st, sw)))
    // descending-sorted consecutive grouping minimizes the batch maxima
    assert(sw <= hw)
    assert(got.forall(r => r._5 >= 0.0 && r._5 < 1.0))
  }

  test("q220 recall replays from exact full vs truncated rankings") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q220_matryoshka_truncation")(spark, d)
      .select($"a_id", $"n_overlap", $"recall_at_10")
      .as[(Long, Long, Double)].collect().toSeq.sortBy(_._1)
    val vecs = spark.read.parquet(s"$d/embeddings.parquet")
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
      .map { case (id, e) =>
        (id, e.map(x => math.floor(x.toDouble * 1000.0)))
      }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d0 = a.zip(b).map { case (x, y) => x * y }.sum
      d0 / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val anchors = vecs.filter(_._1 < 8)
    val expect = anchors.sortBy(_._1).map { case (aid, av) =>
      val cands = vecs.filter(_._1 != aid)
      def topk(f: Array[Double] => Array[Double]) = cands
        .map { case (id, v) => (cos(f(av), f(v)), id) }
        .sortBy { case (c, id) => (-c, id) }.take(10).map(_._2).toSet
      val overlap = (topk(identity) & topk(_.take(16))).size.toLong
      (aid, overlap, overlap.toDouble / 10)
    }.toSeq
    assert(got == expect)
    assert(got.forall(r => r._2 >= 0 && r._2 <= 10))
  }

  test("q221 stump threshold beats every other candidate split — full rescan") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q221_decision_stump")(spark, d)
      .select($"threshold", $"n_left", $"n_right", $"gini_before",
        $"gini_after", $"gain")
      .as[(Long, Long, Long, Double, Double, Double)].collect().toSeq
    assert(got.size == 1)
    val ev = spark.read.parquet(s"$d/events.parquet")
      .select($"user_id", $"event_type",
        expr("CAST(ROUND(value * 100) AS BIGINT)"))
      .as[(Long, String, Long)].collect()
    val users = ev.groupBy(_._1).map { case (_, es) =>
      (es.map(_._3).sum, if (es.exists(_._2 == "purchase")) 1L else 0L)
    }.toSeq
    val n = users.length.toLong
    val p = users.map(_._2).sum
    def gini(pos: Long, cnt: Long): Double =
      if (cnt == 0) 0.0
      else (cnt.toDouble -
        (pos * pos + (cnt - pos) * (cnt - pos)).toDouble / cnt) / n
    val cands = users.map(_._1).distinct.sorted.dropRight(1).map { thr =>
      val left = users.filter(_._1 <= thr)
      val (nl, pl) = (left.length.toLong, left.map(_._2).sum)
      (gini(pl, nl) + gini(p - pl, n - nl), thr, nl)
    }
    val best = cands.minBy(c => (c._1, c._2))
    val gb = gini(p, n) // with the 1/n inside, this is the parent impurity
    assert(got.head._1 == best._2 && got.head._2 == best._3)
    assert(got.head._3 == n - best._3)
    assert(math.abs(got.head._5 - best._1) < 1e-12)
    assert(math.abs(got.head._4 - gb) < 1e-12)
    // splitting never increases impurity (gain is 0 on the degenerate
    // sf0.001 label where every user converts; positive at sf0.01 —
    // the oracle gate covers that scale)
    assert(got.head._6 >= 0.0)
  }

  test("q222 Spearman replays from deterministic ranks and stays in [-1, 1]") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q222_spearman_quality_length")(spark, d)
      .select($"source", $"n_docs", $"sum_d2", $"rho")
      .as[(String, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    val docs = spark.read.parquet(s"$d/documents.parquet")
    // the oracle hash already proves the ranks cross-engine; here, prove
    // the ρ arithmetic is exactly the published formula over the emitted
    // integer parts, and that ρ is a proper correlation
    got.foreach { r =>
      assert(r._4 >= -1.0 && r._4 <= 1.0)
      val n = r._2.toDouble
      val rhoFromParts = 1.0 - 6.0 * r._3.toDouble / (n * (n * n - 1.0))
      assert(r._4 == rhoFromParts)
    }
    assert(got.map(_._2).sum == docs.count())
  }

  test("q224 lateness replays against a sequential high-water-mark walk") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q224_watermark_delay_profile")(spark, d)
      .select($"shard_id", $"n_records", $"n_late", $"late_rate",
        $"max_late_us")
      .as[(String, Long, Long, Double, Long)].collect().toSeq.sortBy(_._1)
    val ev = spark.read.parquet(s"$d/events.parquet")
      .select($"user_id", $"event_id",
        expr("unix_micros(cast(ts AS timestamp))"))
      .as[(Long, Long, Long)].collect()
    val expect = ev.groupBy(e => e._1 % 5).toSeq.map { case (shard, es) =>
      var hwm = Long.MinValue
      var (late, maxLate) = (0L, 0L)
      es.sortBy(e => (e._2 * 7 + idHash(e._2) % 59 - 29, e._2))
        .foreach { case (_, _, t) =>
        if (hwm != Long.MinValue && hwm > t) {
          late += 1; maxLate = math.max(maxLate, hwm - t)
        }
        hwm = math.max(hwm, t)
      }
      (f"shardId-$shard%012d", es.length.toLong, late,
        late.toDouble / es.length, maxLate)
    }.sortBy(_._1)
    assert(got == expect)
    // the fixture streams are genuinely out of order per shard
    assert(got.exists(_._3 > 0))
  }

  test("q225 burn rates replay from hourly counts; both windows must fire") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q225_slo_burn_rate")(spark, d)
      .select($"hour", $"n", $"e", $"burn_1h", $"burn_6h")
      .as[(Long, Long, Long, Double, Double)].collect().toSeq.sortBy(_._1)
    val ev = spark.read.parquet(s"$d/events.parquet")
      .select(expr("CAST(floor(unix_micros(cast(ts AS timestamp)) / 3600000000.0) AS BIGINT)"),
        ($"event_type" === "error").cast("long"))
      .as[(Long, Long)].collect()
    val hourly = ev.groupBy(_._1).toSeq.sortBy(_._1).map { case (h, es) =>
      (h, es.length.toLong, es.map(_._2).sum)
    }
    val expect = hourly.indices.flatMap { i =>
      val (h, n, e) = hourly(i)
      val win = hourly.slice(math.max(0, i - 5), i + 1)
      val (n6, e6) = (win.map(_._2).sum, win.map(_._3).sum)
      val b1 = (e.toDouble / n) / 0.01
      val b6 = (e6.toDouble / n6) / 0.01
      if (b1 > 20.0 && b6 > 20.0) Some((h, n, e, b1, b6)) else None
    }
    assert(got == expect)
    // the threshold discriminates: some hours page, some don't
    assert(got.nonEmpty && got.size < hourly.size)
  }

  test("q226 partition math replays from exact byte sums") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q226_partition_sizing_advisor")(spark, d)
      .select($"tbl", $"n_rows", $"est_bytes", $"recommended_partitions",
        $"waves_32core", $"avg_row_bytes")
      .as[(String, Long, Long, Long, Long, Double)].collect().toSeq
      .sortBy(_._1)
    assert(got.map(_._1) == Seq("documents", "events", "lineitem"))
    got.foreach { r =>
      assert(r._4 == (r._3 + 134217727L) / 134217728L)
      assert(r._5 == (r._4 + 31L) / 32L)
      assert(r._6 == r._3.toDouble / r._2)
      assert(r._4 >= 1L && r._5 >= 1L)
    }
    val docBytes = spark.read.parquet(s"$d/documents.parquet")
      .select((length(encode($"text", "UTF-8")) + length(encode($"lang", "UTF-8")) +
        length(encode($"source", "UTF-8"))).cast("long"))
      .as[Long].collect()
    assert(got.head._3 == docBytes.sum + docBytes.length * 16L)
  }

  test("q228 Horvitz–Thompson estimates replay from the md5 buckets") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q228_sample_extrapolation_audit")(spark, d)
      .select($"design", $"n_sampled", $"est_cents", $"exact_cents",
        $"rel_err")
      .as[(String, Long, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    val ev = spark.read.parquet(s"$d/events.parquet")
      .select($"user_id", expr("CAST(ROUND(value * 100) AS BIGINT)"))
      .as[(Long, Long)].collect()
    val exact = ev.map(_._2).sum
    val withBuckets = ev.map { case (u, c) =>
      (c, idHash(u) % 100, idHash(u) % 2 == 0)
    }
    val uniEst = withBuckets.filter(_._2 < 20).map(_._1).sum * 5
    val uniN = withBuckets.count(_._2 < 20).toLong
    val stratRows = withBuckets.filter(r =>
      (r._3 && r._2 < 10) || (!r._3 && r._2 < 25))
    val stratEst = stratRows.map(r => if (r._3) r._1 * 10 else r._1 * 4).sum
    val expect = Seq(
      ("stratified_10_25", stratRows.length.toLong, stratEst, exact,
        (stratEst - exact).toDouble / exact),
      ("uniform_20pct", uniN, uniEst, exact,
        (uniEst - exact).toDouble / exact))
    assert(got == expect)
    // no accuracy bound here: sf0.001 has only ~15 distinct users, so
    // user-level sampling variance swamps the estimate (6/15 users in
    // the 20% bucket on this seed). The replay equality above is the
    // contract; accuracy at realistic populations is visible at sf0.01.
    assert(got.forall(_._2 > 0))
  }

  test("q229 lateness pricing replays the q224 walk with three delays") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q229_allowed_lateness_impact")(spark, d)
      .select($"d_us", $"n_records", $"n_dropped", $"drop_rate",
        $"cents_lost")
      .as[(Long, Long, Long, Double, Long)].collect().toSeq.sortBy(_._1)
    val ev = spark.read.parquet(s"$d/events.parquet")
      .select($"user_id", $"event_id",
        expr("unix_micros(cast(ts AS timestamp))"),
        when($"event_type" === "purchase",
          expr("CAST(ROUND(value * 100) AS BIGINT)")).otherwise(0L))
      .as[(Long, Long, Long, Long)].collect()
    val lateness = ev.groupBy(_._1 % 5).iterator.flatMap { case (_, es) =>
      var hwm = Long.MinValue
      es.sortBy(e => (e._2 * 7 + idHash(e._2) % 59 - 29, e._2)).map {
        case (_, _, t, c) =>
          val late = if (hwm != Long.MinValue && hwm > t) hwm - t else 0L
          hwm = math.max(hwm, t)
          (late, c)
      }
    }.toSeq
    val expect = Seq(1000000L, 10000000L, 60000000L).map { dUs =>
      val dropped = lateness.filter(_._1 > dUs)
      (dUs, lateness.length.toLong, dropped.length.toLong,
        dropped.length.toDouble / lateness.length, dropped.map(_._2).sum)
    }
    assert(got == expect)
    // a longer allowance can only drop fewer records
    assert(got.map(_._3) == got.map(_._3).sorted.reverse)
  }

  test("q230 suspect purchases replay from a per-(user, dollars) walk") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q230_duplicate_payments")(spark, d)
      .select($"user_id", $"n_purchases", $"n_suspect", $"cents_at_risk")
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    val p = spark.read.parquet(s"$d/events.parquet")
      .filter($"event_type" === "purchase")
      .select($"user_id", $"event_id",
        expr("unix_micros(cast(ts AS timestamp))"),
        expr("CAST(ROUND(value) AS BIGINT)"),
        expr("CAST(ROUND(value * 100) AS BIGINT)"))
      .as[(Long, Long, Long, Long, Long)].collect()
    val expect = p.groupBy(_._1).iterator.map { case (u, es) =>
      val suspects = es.groupBy(_._4).iterator.flatMap { case (_, same) =>
        same.sortBy(e => (e._3, e._2)).toSeq.sliding(2).collect {
          case Seq(a, b) if b._3 - a._3 <= 86400000000L => b._5
        }
      }.toSeq
      (u, es.length.toLong, suspects.length.toLong, suspects.sum)
    }.filter(_._3 > 0).toSeq.sortBy(_._1)
    assert(got == expect)
    assert(got.nonEmpty) // the detector actually fires on the fixture
  }

  test("q231 normalization can only merge digest groups, never split them") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q231_normalization_uplift")(spark, d)
      .select($"digest", $"n_groups", $"n_dup_groups", $"n_docs_in_dups")
      .as[(String, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got.map(_._1) == Seq("normalized", "raw"))
    val Seq(norm, raw) = got
    // normalization is a function of the text: group count can only drop
    assert(norm._2 <= raw._2)
    assert(norm._4 >= raw._4)
    val total = spark.read.parquet(s"$d/documents.parquet").count()
    // group counts are consistent with the corpus size
    assert(raw._2 <= total && norm._2 >= 1)
  }

  test("q232 metadata gate replays: the fixture's n_chars is LENGTH(text)") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q232_metadata_consistency")(spark, d)
      .select($"source", $"n_docs", $"n_char_mismatch", $"n_byte_mismatch",
        $"max_char_delta")
      .as[(String, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select($"source", $"n_chars", length($"text").cast("long"),
        expr("octet_length(encode(text, 'UTF-8'))").cast("long"))
      .as[(String, Long, Long, Long)].collect()
    val expect = docs.groupBy(_._1).iterator.map { case (src, ds) =>
      (src, ds.length.toLong,
        ds.count(r => r._2 != r._3).toLong,
        ds.count(r => r._2 != r._4).toLong,
        ds.map(r => math.abs(r._2 - r._3)).max)
    }.toSeq.sortBy(_._1)
    assert(got == expect)
    // the synthetic fixture's metadata is trustworthy — zero drift
    assert(got.forall(r => r._3 == 0L && r._5 == 0L))
  }

  test("q233 confusion shares sum to 1 per language; diagonal carries agree=1") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q233_langid_confusion")(spark, d)
      .select($"lang", $"predicted", $"n_docs", $"share", $"agree")
      .as[(String, String, Long, Double, Long)].collect().toSeq
    val total = spark.read.parquet(s"$d/documents.parquet").count()
    assert(got.map(_._3).sum == total)
    got.groupBy(_._1).foreach { case (_, rows) =>
      val n = rows.map(_._3).sum
      rows.foreach(r => assert(r._4 == r._3.toDouble / n))
    }
    got.foreach(r => assert(r._5 == (if (r._1 == r._2) 1L else 0L)))
    // detector agreement must match the registered q31 per-doc predictions
    val q31Agree = graft.SparkEntry.queries("q31_langid_stopwords")(spark, d)
      .filter($"lang" === $"predicted_lang").count()
    assert(got.filter(_._5 == 1L).map(_._3).sum == q31Agree)
  }

  test("q234 leakage replays from per-user side counts") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q234_temporal_split_leakage")(spark, d)
      .select($"n_train_events", $"n_test_events", $"n_train_users",
        $"n_test_users", $"n_straddling_users", $"n_leaked_test_events",
        $"leakage_rate")
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(got.size == 1)
    val cutoff = 1705363200000L // 2024-01-16T00:00:00Z (session tz is UTC)
    // read through graft.Tables: the fixture's TIMESTAMP(NANOS) needs its
    // canonical micro-truncating conversion before absolute comparisons
    val ev = graft.Tables(spark, d, "events")
      .select($"user_id", expr("unix_millis(cast(ts AS timestamp))"))
      .as[(Long, Long)].collect()
    val pu = ev.groupBy(_._1).iterator.map { case (_, es) =>
      (es.count(_._2 < cutoff).toLong, es.count(_._2 >= cutoff).toLong)
    }.toSeq
    val r = got.head
    assert(r._1 == pu.map(_._1).sum && r._2 == pu.map(_._2).sum)
    assert(r._3 == pu.count(_._1 > 0) && r._4 == pu.count(_._2 > 0))
    assert(r._5 == pu.count(p => p._1 > 0 && p._2 > 0))
    assert(r._6 == pu.filter(_._1 > 0).map(_._2).sum)
    assert(r._7 == r._6.toDouble / r._2)
    // on this fixture nearly every user straddles — the temporal split
    // leaks heavily, which is exactly the audit's point
    assert(r._7 > 0.5)
  }

  test("q235 assortativity replays from the edge-endpoint degree moments") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q235_degree_assortativity")(spark, d)
      .select($"m2", $"mean_deg", $"assortativity")
      .as[(Long, Double, Option[Double])].collect().toSeq
    assert(got.size == 1)
    val baskets = spark.read.parquet(s"$d/lineitem.parquet")
      .select($"l_orderkey", $"l_partkey").distinct()
      .as[(Long, Long)].collect().groupBy(_._1).values
      .map(_.map(_._2).sorted.toSeq)
    val half = baskets.toSeq.flatMap(_.combinations(2).map(p => (p(0), p(1))))
      .groupBy(identity).view.mapValues(_.length).filter(_._2 >= 2).keys.toSeq
    val edges = half.flatMap(p => Seq(p, (p._2, p._1)))
    val deg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val (xs, ys) = edges.map(e => (deg(e._1), deg(e._2))).unzip
    val m2 = edges.length.toDouble
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val (sxx, syy) = (xs.map(x => x * x).sum, ys.map(y => y * y).sum)
    val cov = m2 * sxy - sx.toDouble * sy.toDouble
    val vx = m2 * sxx - sx.toDouble * sx.toDouble
    val vy = m2 * syy - sy.toDouble * sy.toDouble
    val r = got.head
    assert(r._1 == edges.length.toLong)
    assert(r._2 == sx / m2)
    if (vx * vy > 0) {
      assert(math.abs(r._3.get - cov / math.sqrt(vx * vy)) < 1e-12)
      assert(r._3.get >= -1.0 && r._3.get <= 1.0)
    } else assert(r._3.isEmpty)
    // the symmetric edge relation makes x and y exchangeable
    assert(sx == sy && sxx == syy)
  }

  test("q236 diff census partitions the user universe; cents delta replays") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q236_profile_snapshot_diff")(spark, d)
      .select($"n_added", $"n_removed", $"n_changed", $"n_same",
        $"cents_delta")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.size == 1)
    val cutoff = 1705363200000L
    val ev = graft.Tables(spark, d, "events")
      .select($"user_id", expr("unix_millis(cast(ts AS timestamp))"),
        when($"event_type" === "purchase",
          expr("CAST(ROUND(value * 100) AS BIGINT)")).otherwise(0L))
      .as[(Long, Long, Long)].collect()
    val pu = ev.groupBy(_._1).view.mapValues { es =>
      val (a, b) = es.partition(_._2 < cutoff)
      (a.length.toLong, b.length.toLong, a.map(_._3).sum, b.map(_._3).sum)
    }.values.toSeq
    val r = got.head
    assert(r._1 == pu.count(p => p._1 == 0 && p._2 > 0))
    assert(r._2 == pu.count(p => p._1 > 0 && p._2 == 0))
    assert(r._3 == pu.count(p => p._1 > 0 && p._2 > 0 &&
      (p._1 != p._2 || p._3 != p._4)))
    assert(r._4 == pu.count(p => p._1 > 0 && p._2 > 0 &&
      p._1 == p._2 && p._3 == p._4))
    assert(r._5 == pu.map(_._4).sum - pu.map(_._3).sum)
    // the census covers every user exactly once
    assert(r._1 + r._2 + r._3 + r._4 == pu.size)
  }

  test("q237 WITH TIES keeps more than row_number would where ties exist") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q237_topk_with_ties")(spark, d)
      .select($"o_orderpriority", $"n_rows_kept", $"n_distinct_qty",
        $"top_qty", $"cut_qty")
      .as[(String, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    val sized = spark.read.parquet(s"$d/lineitem.parquet")
      .join(spark.read.parquet(s"$d/orders.parquet")
        .select($"o_orderkey", $"o_orderpriority"),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority", $"l_orderkey")
      .agg(count(lit(1)).as("qty"))
      .select($"o_orderpriority", $"qty").as[(String, Long)].collect()
    val expect = sized.groupBy(_._1).iterator.map { case (p, qs) =>
      val sorted = qs.map(_._2).sorted.reverse.toSeq
      val kept = sorted.takeWhile(q =>
        sorted.count(_ > q) < 3) // rank() <= 3 keeps all tied with 3rd
      (p, kept.length.toLong, kept.distinct.length.toLong,
        kept.head, kept.last)
    }.toSeq.sortBy(_._1)
    assert(got == expect)
    // the semantics visibly differ from LIMIT 3 somewhere on the fixture
    assert(got.exists(_._2 > 3))
  }

  test("q238 diversity bands replay from per-user type counts") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q238_action_diversity")(spark, d)
      .select($"n_action_types", $"n_users", $"n_scripted",
        $"min_diversity", $"max_diversity")
      .as[(Long, Long, Long, Double, Double)].collect().toSeq.sortBy(_._1)
    val ev = spark.read.parquet(s"$d/events.parquet")
      .select($"user_id", $"event_type").as[(Long, String)].collect()
    val perUser = ev.groupBy(_._1).map { case (_, es) =>
      val c = es.groupBy(_._2).map(_._2.size.toLong).toSeq
      val n = c.sum
      val div = 1.0 - c.map(x => x * x).sum.toDouble / (n * n).toDouble
      val top = c.max.toDouble / n.toDouble
      (c.size.toLong, div, div < 0.30 || top > 0.85)
    }.toSeq
    val expect = perUser.groupBy(_._1).map { case (k, us) =>
      (k, us.size.toLong, us.count(_._3).toLong,
        us.map(_._2).min, us.map(_._2).max)
    }.toSeq.sortBy(_._1)
    assert(got == expect)
    // a uniform mix maximizes the index: every diversity ≤ 1 − 1/k
    perUser.foreach { case (k, div, _) =>
      assert(div <= 1.0 - 1.0 / k + 1e-12)
    }
  }

  test("q239 KM curve: at-risk ladder is consistent and survival is the prefix product") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q239_conversion_survival")(spark, d)
      .select($"t_days", $"n_at_risk", $"n_events", $"n_censored", $"survival")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(got.nonEmpty)
    // n_at_risk(t) = everyone whose observed duration is >= t
    val totalObs = got.map(r => r._3 + r._4).sum
    got.foldLeft(totalObs) { case (atRisk, (_, n, dEv, cEn, _)) =>
      assert(n == atRisk)
      atRisk - dEv - cEn
    }
    // survival is exactly the running product of (n-d)/n in t order
    got.foldLeft(1.0) { case (acc, (_, n, dEv, _, surv)) =>
      val next = acc * ((n - dEv).toDouble / n.toDouble)
      assert(surv == next)
      next
    }
    // monotone non-increasing from 1, and the cohort is the signup users
    assert(got.map(_._5).zip(got.map(_._5).drop(1)).forall(p => p._2 <= p._1))
    val signups = spark.read.parquet(s"$d/events.parquet")
      .filter($"event_type" === "signup").select($"user_id")
      .distinct().count()
    assert(totalObs == signups)
  }

  test("q240 zipf profile replays from the exact token histogram") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q240_zipf_profile")(spark, d)
      .select($"rank", $"token", $"freq", $"rank_x_freq", $"cum_share")
      .as[(Long, String, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(got.size == 20)
    val toks = spark.read.parquet(s"$d/documents.parquet")
      .select($"text").as[String].collect()
      .flatMap(_.split(" ", -1))
    val hist = toks.groupBy(identity).map { case (t, o) => (t, o.size.toLong) }
    val top = hist.toSeq.sortBy { case (t, f) => (-f, t) }.take(20)
    val totalToks = hist.values.sum
    got.zip(top).zipWithIndex.foreach { case (((r, tok, f, rf, cs), (et, ef)), i) =>
      assert(r == i + 1 && tok == et && f == ef && rf == (i + 1) * ef)
      assert(cs == top.take(i + 1).map(_._2).sum.toDouble / totalToks.toDouble)
    }
  }

  test("q241 kappa replays from the confusion matrix and reads 0 on the majority-class labeler") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q241_labeler_kappa")(spark, d)
      .select($"n_docs", $"n_agree", $"pe_num", $"kappa")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got.size == 1)
    val (n, agree, peNum, kappa) = got.head
    val conf = graft.SparkEntry.queries("q233_langid_confusion")(spark, d)
      .select($"lang", $"predicted", $"n_docs")
      .as[(String, String, Long)].collect().toSeq
    assert(n == conf.map(_._3).sum)
    assert(agree == conf.collect { case (l, p, c) if l == p => c }.sum)
    val rows = conf.groupBy(_._1).view.mapValues(_.map(_._3).sum)
    val cols = conf.groupBy(_._2).view.mapValues(_.map(_._3).sum)
    val pe = (rows.keySet ++ cols.keySet).toSeq
      .map(l => rows.getOrElse(l, 0L) * cols.getOrElse(l, 0L)).sum
    assert(peNum == pe)
    assert(kappa == (n * agree - pe).toDouble / (n * n - pe).toDouble)
    // the fixture labeler degenerates to majority-class → zero skill
    assert(kappa == 0.0)
  }

  test("q242 Cramér's V replays from q143's cell grid and lands in [0,1]") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q242_cramers_v")(spark, d)
      .select($"n", $"n_langs", $"n_sources", $"chi2", $"cramers_v")
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    assert(got.size == 1)
    val (n, r, c, chi2, v) = got.head
    val cells = graft.SparkEntry.queries("q143_chi2_independence")(spark, d)
      .select($"chi2_cell").as[Double].collect()
    // same grid: the total is the Det-decimal sum of q143's cells
    // (tie-free nearest-grid floor(x·1e6 + 0.5) quantization — Det's
    // contract since the round-11 bias fix)
    val detSum = (BigDecimal(cells.map(x => math.floor(x * 1e6 + 0.5).toLong).sum) /
      BigDecimal(1000000)).toDouble
    assert(chi2 == detSum)
    assert(v == math.sqrt(chi2 / (n.toDouble * math.min(r - 1, c - 1).toDouble)))
    assert(v >= 0.0 && v <= 1.0)
  }

  test("q243 Mann-Kendall replays from the daily rollup pairs") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q243_mann_kendall_trend")(spark, d)
      .select($"event_type", $"n_days", $"n_pairs", $"s_stat", $"tau_a")
      .as[(String, Long, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    // daily rollup shared with the query (same to_date), pairs replayed here
    val daily = spark.read.parquet(s"$d/events.parquet")
      .select($"event_type", to_date($"ts").cast("string").as("day"))
      .as[(String, String)].collect()
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .map { case ((et, day), cnt) => (et, day, cnt) }
    val exp = daily.groupBy(_._1).toSeq.sortBy(_._1).map { case (et, rows) =>
      val byDay = rows.sortBy(_._2).map(_._3)
      val pairs = for (i <- byDay.indices; j <- i + 1 until byDay.size)
        yield java.lang.Long.signum(byDay(j) - byDay(i)).toLong
      (et, byDay.size.toLong, pairs.size.toLong, pairs.sum,
        pairs.sum.toDouble / pairs.size.toDouble)
    }
    assert(got == exp)
    // tau is a bounded correlation
    got.foreach { case (_, _, _, _, tau) => assert(tau >= -1.0 && tau <= 1.0) }
  }

  test("q244 rank-sum replays from brute-force average ranks") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q244_rank_sum_test")(spark, d)
      .select($"source", $"n1", $"n2", $"two_u", $"cliffs_delta")
      .as[(String, Long, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select($"source", $"n_chars").as[(String, Long)].collect()
    val n = docs.length.toLong
    val less = docs.map(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val sortedVals = less.keys.toSeq.sorted
    val cntLess = sortedVals.zip(
      sortedVals.scanLeft(0L)((acc, v) => acc + less(v)).init).toMap
    val exp = docs.groupBy(_._1).toSeq.sortBy(_._1).map { case (src, rows) =>
      val twoR1 = rows.map { case (_, v) => 2 * cntLess(v) + less(v) + 1 }.sum
      val n1 = rows.size.toLong
      val n2 = n - n1
      val twoU = twoR1 - n1 * (n1 + 1)
      (src, n1, n2, twoU, (twoU - n1 * n2).toDouble / (n1 * n2).toDouble)
    }
    assert(got == exp)
    // 2U counts (wins + half-ties) doubled: bounded by the pair universe
    got.foreach { case (_, n1, n2, twoU, delta) =>
      assert(twoU >= 0L && twoU <= 2 * n1 * n2)
      assert(delta >= -1.0 && delta <= 1.0)
    }
  }

  test("q245 run bounds replay per candidate as Σ-per-group distinct counts") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q245_sort_compression_advisor")(spark, d)
      .select($"sort_key", $"n_groups", $"n_rows", $"runs_returnflag",
        $"runs_linestatus", $"runs_quantity", $"total_runs", $"rows_per_run")
      .as[(String, Long, Long, Long, Long, Long, Long, Double)]
      .collect().toSeq
    assert(got.size == 3)
    val li = spark.read.parquet(s"$d/lineitem.parquet")
      .select($"l_partkey", $"l_suppkey", $"l_shipdate".cast("date").cast("string"),
        $"l_returnflag", $"l_linestatus", $"l_quantity")
      .as[(Long, Long, String, String, String, Double)].collect()
    // the implementation computes global distinct PAIRS; the replay uses
    // the definition it stands in for: Σ over key groups of per-group
    // distinct column values
    def replay(key: ((Long, Long, String, String, String, Double)) => Any) = {
      val groups = li.groupBy(key)
      (groups.size.toLong,
        groups.values.map(_.map(_._4).distinct.size.toLong).sum,
        groups.values.map(_.map(_._5).distinct.size.toLong).sum,
        groups.values.map(_.map(_._6).distinct.size.toLong).sum)
    }
    val byName = got.map(r => r._1 -> r).toMap
    for ((name, key) <- Seq[(String,
        ((Long, Long, String, String, String, Double)) => Any)](
        "l_partkey" -> (_._1), "l_suppkey" -> (_._2),
        "l_shipdate_day" -> (_._3))) {
      val (ng, rFlag, rStat, rQty) = replay(key)
      val r = byName(name)
      assert((r._2, r._4, r._5, r._6) == ((ng, rFlag, rStat, rQty)),
        s"candidate $name")
      assert(r._3 == li.length.toLong)
      assert(r._7 == rFlag + rStat + rQty)
      assert(r._8 == (3L * li.length).toDouble / r._7.toDouble)
    }
    // a key group can never need fewer runs than groups
    got.foreach(r => assert(r._4 >= r._2 && r._5 >= r._2 && r._6 >= r._2))
  }

  test("q246 McNemar replays from per-doc paired correctness") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q246_mcnemar_paired")(spark, d)
      .select($"n_docs", $"n_both", $"n_only_detector", $"n_only_baseline",
        $"n_neither", $"mcnemar_chi2")
      .as[(Long, Long, Long, Long, Long, Option[Double])].collect().toSeq
    assert(got.size == 1)
    val (n, both, b, c, neither, chi2) = got.head
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select($"lang", $"text").as[(String, String)].collect()
    val en = Set("the", "a", "of", "and", "to", "in")
    val es = Set("el", "la", "de", "y", "en", "los")
    val de = Set("der", "die", "das", "und", "ein", "zu")
    def hits(t: String, s: Set[String]) =
      t.split(" ", -1).count(s.contains)
    val mode = docs.groupBy(_._1).view.mapValues(_.size).toSeq
      .sortBy { case (l, cnt) => (-cnt, l) }.head._1
    val paired = docs.map { case (lang, text) =>
      val (he, hs, hd) = (hits(text, en), hits(text, es), hits(text, de))
      val pred = if (he >= hs && he >= hd) "en"
        else if (hs >= hd) "es" else "de"
      (pred == lang, mode == lang)
    }
    val eb = paired.count(p => p._1 && !p._2).toLong
    val ec = paired.count(p => !p._1 && p._2).toLong
    assert(n == docs.length.toLong)
    assert(both == paired.count(p => p._1 && p._2).toLong)
    assert((b, c) == ((eb, ec)))
    assert(neither == paired.count(p => !p._1 && !p._2).toLong)
    assert(both + b + c + neither == n)
    if (eb + ec == 0) assert(chi2.isEmpty)
    else assert(chi2.contains(
      ((eb - ec) * (eb - ec)).toDouble / (eb + ec).toDouble))
  }

  test("q247 conformal threshold and coverage replay from the md5 split") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q247_conformal_calibration")(spark, d)
      .select($"n_cal", $"k_rank", $"qhat", $"n_test", $"n_covered",
        $"coverage")
      .as[(Long, Long, Double, Long, Long, Double)].collect().toSeq
    assert(got.size == 1)
    val (nCal, kRank, qhat, nTest, nCovered, coverage) = got.head
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select($"doc_id", $"lang", $"n_chars").as[(Long, String, Long)]
      .collect()
    val (cal, tst) = docs.partition(r => idHash(r._1) % 2 == 0)
    def med2(vs: Seq[Long]): Long = {
      val s = vs.sorted; val m = s.size
      if (m % 2 == 1) 2 * s(m / 2) else s(m / 2 - 1) + s(m / 2)
    }
    val m2 = cal.groupBy(_._2).view.mapValues(g => med2(g.map(_._3).toSeq)).toMap
    val calRes = cal.map(r => math.abs(2 * r._3 - m2(r._2))).sorted
    val k = (9 * (calRes.length + 1) + 9) / 10
    val q2 = calRes(k - 1)
    val tstRes = tst.map(r => math.abs(2 * r._3 - m2(r._2)))
    assert(nCal == calRes.length.toLong && nTest == tstRes.length.toLong)
    assert(nCal + nTest == docs.length.toLong)
    assert(kRank == k.toLong)
    assert(qhat == q2.toDouble / 2.0)
    assert(nCovered == tstRes.count(_ <= q2).toLong)
    assert(coverage == nCovered.toDouble / nTest.toDouble)
  }

  test("q248 Theil-Sen slope replays as the R-7 median of pairwise slopes") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q248_theil_sen_slope")(spark, d)
      .select($"event_type", $"n_pairs", $"theil_sen_slope")
      .as[(String, Long, Double)].collect().toSeq.sortBy(_._1)
    val daily = spark.read.parquet(s"$d/events.parquet")
      .select($"event_type", to_date($"ts").as("day"))
      .groupBy($"event_type", $"day")
      .agg(count(lit(1)).as("cnt"))
      .select($"event_type", $"day".cast("string"), $"cnt")
      .as[(String, String, Long)].collect()
    def r7median(vs: Seq[Double]): Double = {
      val s = vs.sorted; val h = 0.5 * (s.size - 1)
      val lo = h.toInt; val w = h - lo
      if (lo + 1 < s.size) s(lo) + (s(lo + 1) - s(lo)) * w else s(lo)
    }
    val exp = daily.groupBy(_._1).toSeq.sortBy(_._1).map { case (et, rows) =>
      val byDay = rows.sortBy(_._2)
      val slopes = for {
        i <- byDay.indices; j <- i + 1 until byDay.size
      } yield (byDay(j)._3 - byDay(i)._3).toDouble /
        java.time.temporal.ChronoUnit.DAYS.between(
          java.time.LocalDate.parse(byDay(i)._2),
          java.time.LocalDate.parse(byDay(j)._2)).toDouble
      (et, slopes.size.toLong, r7median(slopes))
    }
    assert(got == exp)
  }

  test("q249 schema drift: every key is new exactly once and day censuses replay") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q249_schema_drift")(spark, d)
      .select($"day".cast("string"), $"n_events", $"n_keys", $"n_new_keys")
      .as[(String, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    // shared parse (q47's from_json parity), independent census math
    val parsed = graft.Tables(spark, d, "events")
      .select(to_date($"ts").cast("string").as("day"),
        map_keys(from_json($"props", org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.StringType))).as("keys"))
      .as[(String, Seq[String])].collect()
    val dayKeys = parsed.flatMap { case (day, ks) => ks.map(day -> _) }.distinct
    val firstDay = dayKeys.groupBy(_._2).view.mapValues(_.map(_._1).min).toMap
    val exp = dayKeys.groupBy(_._1).toSeq.sortBy(_._1).map { case (day, ks) =>
      (day, parsed.count(_._1 == day).toLong, ks.size.toLong,
        ks.count { case (dy, k) => firstDay(k) == dy }.toLong)
    }
    assert(got == exp)
    // pigeonhole: total new-key credits == distinct keys in the corpus
    assert(got.map(_._4).sum == firstDay.size.toLong)
  }

  test("q250 join-order estimates replay and true sizes match the FK joins") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q250_join_order_advisor")(spark, d)
      .select($"step", $"est_rows", $"true_rows", $"err_ratio")
      .as[(String, Double, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(got.size == 4)
    val li = spark.read.parquet(s"$d/lineitem.parquet")
      .select($"l_orderkey").as[Long].collect()
    val or = spark.read.parquet(s"$d/orders.parquet")
      .select($"o_orderkey", $"o_custkey").as[(Long, Long)].collect()
    val cu = spark.read.parquet(s"$d/customer.parquet")
      .select($"c_custkey").as[Long].collect()
    val (ln, lndv) = (li.length.toLong, li.distinct.length.toLong)
    val (on, ondvOk, ondvCk) =
      (or.length.toLong, or.map(_._1).distinct.length.toLong,
        or.map(_._2).distinct.length.toLong)
    val (cn, cndv) = (cu.length.toLong, cu.distinct.length.toLong)
    val orderCust = or.map(_._2).groupBy(identity).view.mapValues(_.size).toMap
    val custSet = cu.toSet
    val ordKeyToCust = or.toMap
    val loTrue = {
      val okSet = or.map(_._1).toSet; li.count(okSet.contains).toLong
    }
    val ocTrue = or.count(o => custSet.contains(o._2)).toLong
    val locTrue = li.map(ordKeyToCust.get)
      .count(c => c.exists(custSet.contains)).toLong
    val estLo = ln.toDouble * on.toDouble / math.max(lndv, ondvOk).toDouble
    val estOc = on.toDouble * cn.toDouble / math.max(ondvCk, cndv).toDouble
    val byStep = got.map(r => r._1 -> r).toMap
    assert(byStep("1_lineitem_x_orders")._2 == estLo)
    assert(byStep("1_lineitem_x_orders")._3 == loTrue)
    assert(byStep("2_orders_x_customer")._2 == estOc)
    assert(byStep("2_orders_x_customer")._3 == ocTrue)
    assert(byStep("3_lo_then_customer")._2 ==
      estLo * cn.toDouble / math.max(ondvCk, cndv).toDouble)
    assert(byStep("3_lo_then_customer")._3 == locTrue)
    assert(byStep("4_oc_then_lineitem")._2 ==
      estOc * ln.toDouble / math.max(lndv, ondvOk).toDouble)
    assert(byStep("4_oc_then_lineitem")._3 == locTrue)
    got.foreach(r => assert(r._4 == r._2 / r._3.toDouble))
    assert(orderCust.nonEmpty) // silence unused in case fixtures change
  }

  test("q251 Wilson lower bound replays and never exceeds the raw rate") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q251_wilson_lower_bound")(spark, d)
      .select($"c_mktsegment", $"n_exposed", $"n_converted", $"p_hat",
        $"wilson_lb")
      .as[(String, Long, Long, Double, Double)].collect().toSeq.sortBy(_._1)
    val ev = spark.read.parquet(s"$d/events.parquet")
      .select($"user_id", $"event_type").as[(Long, String)].collect()
    val seg = spark.read.parquet(s"$d/customer.parquet")
      .select($"c_custkey", $"c_mktsegment").as[(Long, String)].collect().toMap
    val perUser = ev.groupBy(_._1).iterator.collect {
      case (u, es) if es.exists(_._2 == "view") && seg.contains(u) =>
        (seg(u), es.exists(_._2 == "purchase"))
    }.toSeq
    val exp = perUser.groupBy(_._1).toSeq.sortBy(_._1).map { case (sg, rows) =>
      val n = rows.size.toLong
      val x = rows.count(_._2).toLong
      val nd = n.toDouble
      val p = x.toDouble / nd
      val lb = (p + 1.9208 / nd - 1.96 * math.sqrt(p * (1.0 - p) / nd
        + 0.9604 / (nd * nd))) / (1.0 + 3.8416 / nd)
      (sg, n, x, p, lb)
    }
    assert(got == exp)
    got.foreach { case (_, _, _, p, lb) =>
      assert(lb <= p && lb >= 0.0 || p == 0.0)
    }
  }

  test("q252 term lift replays from brute-force co-occurrence over the top-12") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q252_term_lift_matrix")(spark, d)
      .select($"tok_a", $"tok_b", $"df_a", $"df_b", $"df_ab", $"lift")
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
      .sortBy(r => (r._1, r._2))
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val sets = docs.map { case (_, t) => t.split(" ", -1).toSet }
    val df = sets.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val top = df.toSeq.sortBy { case (t, f) => (-f, t) }.take(12).toMap
    val n = docs.length.toLong
    val exp = (for {
      a <- top.keys; b <- top.keys if a < b
      ab = sets.count(s => s(a) && s(b)).toLong if ab > 0
    } yield (a, b, top(a), top(b), ab,
      (n * ab).toDouble / (top(a) * top(b)).toDouble))
      .toSeq.sortBy(r => (r._1, r._2))
    assert(got == exp)
  }

  test("q253 freshness audit replays staleness and completeness per type") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q253_freshness_audit")(spark, d)
      .select($"event_type", $"n_events", $"staleness_min", $"v_ref_day",
        $"med7", $"volume_ratio")
      .as[(String, Long, Long, Long, Double, Double)].collect().toSeq
      .sortBy(_._1)
    val ev = graft.Tables(spark, d, "events")
      .select($"event_type",
        expr("unix_micros(cast(ts AS timestamp))").as("tus"),
        to_date($"ts").cast("string").as("day"))
      .as[(String, Long, String)].collect()
    val hwUs = ev.map(_._2).max
    val refDay = ev.map(_._3).max
    def r7median(vs: Seq[Long]): Double = {
      val s = vs.sorted; val h = 0.5 * (s.size - 1)
      val lo = h.toInt; val w = h - lo
      if (lo + 1 < s.size) s(lo) + (s(lo + 1) - s(lo)) * w else s(lo).toDouble
    }
    val exp = ev.groupBy(_._1).toSeq.sortBy(_._1).map { case (et, rows) =>
      val daily = rows.groupBy(_._3).view.mapValues(_.size.toLong).toMap
      val ref = java.time.LocalDate.parse(refDay)
      val prior = (1 to 7).flatMap(i => daily.get(ref.minusDays(i).toString))
      val med = r7median(prior)
      val vRef = daily(refDay)
      (et, rows.size.toLong, (hwUs - rows.map(_._2).max) / 60000000L,
        vRef, med, vRef.toDouble / med)
    }
    assert(got == exp)
  }

  test("q254 near-constant screen replays mode counts per column") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q254_near_constant_audit")(spark, d)
      .select($"col_name", $"n_rows", $"ndv", $"mode_cnt", $"mode_share",
        $"near_constant")
      .as[(String, Long, Long, Long, Double, Long)].collect().toSeq
      .sortBy(_._1)
    val li = spark.read.parquet(s"$d/lineitem.parquet")
      .select($"l_returnflag", $"l_linestatus",
        $"l_quantity".cast("string"), $"l_discount".cast("string"),
        $"l_tax".cast("string"))
      .as[(String, String, String, String, String)].collect()
    val colVals = Map(
      "l_returnflag" -> li.map(_._1), "l_linestatus" -> li.map(_._2),
      "l_quantity" -> li.map(_._3), "l_discount" -> li.map(_._4),
      "l_tax" -> li.map(_._5))
    got.foreach { case (name, n, ndv, modeCnt, share, flag) =>
      val vs = colVals(name)
      val hist = vs.groupBy(identity).view.mapValues(_.size.toLong)
      assert(n == vs.length.toLong)
      assert(ndv == hist.size.toLong)
      assert(modeCnt == hist.values.max)
      assert(share == modeCnt.toDouble / n.toDouble)
      assert(flag == (if (ndv == 1 || modeCnt * 100 >= n * 95) 1L else 0L))
    }
  }

  test("q255 equi-depth buckets partition the corpus and replay exactly") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q255_equidepth_histogram")(spark, d)
      .select($"bucket", $"lo", $"hi", $"n_in_bucket", $"share")
      .as[(Long, Double, Double, Long, Double)].collect().toSeq
      .sortBy(_._1)
    val cents = spark.read.parquet(s"$d/orders.parquet")
      .select(expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)"))
      .as[Long].collect().sorted
    val n = cents.length
    def r7(p: Double): Double = {
      val h = (n - 1) * p; val lo = h.toInt; val w = h - lo
      if (lo + 1 < n) cents(lo) + (cents(lo + 1) - cents(lo)) * w
      else cents(lo).toDouble
    }
    val bounds = (0 to 16).map(k => r7(k / 16.0))
    // buckets with zero rows are absent (inner-join semantics both engines)
    val exp = (1 to 16).map { k =>
      val (lo, hi) = (bounds(k - 1), bounds(k))
      val cnt = cents.count(c =>
        c >= lo && (c < hi || (k == 16 && c <= hi))).toLong
      (k.toLong, lo, hi, cnt, cnt.toDouble / n.toDouble)
    }.filter(_._4 > 0L)
    assert(got == exp)
    // the buckets partition the corpus exactly once
    assert(got.map(_._4).sum == n.toLong)
  }

  test("q256 correlation factors replay from exact distinct counts") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q256_column_correlation_stats")(spark, d)
      .select($"pair", $"ndv_a", $"ndv_b", $"ndv_pair", $"independence_ratio")
      .as[(String, Long, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    val or = spark.read.parquet(s"$d/orders.parquet")
      .select($"o_orderstatus", $"o_orderpriority",
        date_trunc("month", $"o_orderdate").cast("string"))
      .as[(String, String, String)].collect()
    val li = spark.read.parquet(s"$d/lineitem.parquet")
      .select($"l_returnflag", $"l_linestatus").as[(String, String)].collect()
    def f(a: Seq[String], b: Seq[String]) = {
      val (na, nb) = (a.distinct.size.toLong, b.distinct.size.toLong)
      val np = a.zip(b).distinct.size.toLong
      (na, nb, np, (na * nb).toDouble / np.toDouble)
    }
    val exp = Seq(
      "l_returnflag_x_linestatus" -> f(li.map(_._1), li.map(_._2)),
      "o_priority_x_month" -> f(or.map(_._2), or.map(_._3)),
      "o_status_x_month" -> f(or.map(_._1), or.map(_._3)),
      "o_status_x_priority" -> f(or.map(_._1), or.map(_._2)))
      .map { case (n, (a, b, p, r)) => (n, a, b, p, r) }
    assert(got == exp)
    // a correlation factor is never below 1 (every combo is bounded by the product)
    got.foreach(r => assert(r._5 >= 1.0))
  }

  test("q257 daily quantiles and WoW deltas replay with R-7 interpolation") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q257_daily_quantile_drift")(spark, d)
      .select($"day".cast("string"), $"n_purchases", $"p50", $"p875",
        $"p50_wow", $"p875_wow")
      .as[(String, Long, Double, Double, Option[Double], Option[Double])]
      .collect().toSeq.sortBy(_._1)
    val pv = graft.Tables(spark, d, "events")
      .filter($"event_type" === "purchase")
      .select(to_date($"ts").cast("string").as("day"),
        expr("CAST(ROUND(value * 100) AS BIGINT)"))
      .as[(String, Long)].collect()
    def r7(vs: Seq[Long], p: Double): Double = {
      val s = vs.sorted; val h = (s.size - 1) * p
      val lo = h.toInt; val w = h - lo
      if (lo + 1 < s.size) s(lo) + (s(lo + 1) - s(lo)) * w else s(lo).toDouble
    }
    val byDay = pv.groupBy(_._1).view
      .mapValues(rs => (rs.length.toLong, r7(rs.map(_._2).toSeq, 0.5),
        r7(rs.map(_._2).toSeq, 0.875))).toMap
    val exp = byDay.toSeq.sortBy(_._1).map { case (day, (n, p50, p90)) =>
      val prior = byDay.get(java.time.LocalDate.parse(day).minusDays(7).toString)
      (day, n, p50, p90, prior.map(p50 - _._2), prior.map(p90 - _._3))
    }
    assert(got == exp)
  }

  test("q258 byte widths replay from UTF-8 encodings") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q258_row_width_profile")(spark, d)
      .select($"column", $"n_rows", $"total_bytes", $"max_bytes", $"avg_bytes")
      .as[(String, Long, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    val sources = Seq(
      "customer.c_name" -> ("customer", "c_name"),
      "documents.text" -> ("documents", "text"),
      "events.props" -> ("events", "props"),
      "orders.o_orderpriority" -> ("orders", "o_orderpriority"),
      "part.p_name" -> ("part", "p_name"))
    val exp = sources.map { case (label, (t, c)) =>
      val vs = spark.read.parquet(s"$d/$t.parquet")
        .select(col(c).cast("string")).as[String].collect()
      val ws = vs.map(_.getBytes("UTF-8").length.toLong)
      (label, vs.length.toLong, ws.sum, ws.max,
        ws.sum.toDouble / vs.length.toDouble)
    }
    assert(got == exp)
  }

  test("q259 bucket occupancy replays from the shared md5 hash recipe") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q259_bucketing_advisor")(spark, d)
      .select($"n_buckets", $"n_rows", $"n_used_buckets", $"max_rows",
        $"min_rows", $"skew_ratio")
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
      .sortBy(_._1)
    val users = spark.read.parquet(s"$d/events.parquet")
      .select($"user_id").as[Long].collect()
    val exp = Seq(8, 16, 32).map { b =>
      val hist = users.map(u => idHash(u) % b)
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      (b.toLong, users.length.toLong, hist.size.toLong, hist.values.max,
        hist.values.min,
        (hist.values.max * b).toDouble / users.length.toDouble)
    }
    assert(got == exp)
    // used buckets never exceed the candidate count (empties are legal
    // on a small fixture and show up as n_used_buckets < n_buckets)
    got.foreach(r => assert(r._3 <= r._1 && r._6 >= 1.0))
  }

  private def strHash(s0: String): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s0.getBytes("UTF-8"))
        .take(4).map(b => f"${b & 0xff}%02x").mkString, 16)

  test("q260 cooldown chains replay greedily per (user, type)") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q260_cooldown_dedup")(spark, d)
      .select($"event_type", $"n_events", $"n_kept", $"suppression_ratio")
      .as[(String, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    val ev = graft.Tables(spark, d, "events")
      .select($"user_id", $"event_type", $"event_id",
        expr("unix_micros(cast(ts AS timestamp))"))
      .as[(Long, String, Long, Long)].collect()
    val exp = ev.groupBy(_._2).toSeq.sortBy(_._1).map { case (et, rows) =>
      val perPair = rows.groupBy(_._1).values.map { es =>
        val sorted = es.sortBy(e => (e._4, e._3))
        var last = Long.MinValue / 2; var kept = 0L
        sorted.foreach { e =>
          if (e._4 >= last + 86400000000L) { last = e._4; kept += 1L }
        }
        (es.size.toLong, kept)
      }.toSeq
      val (n, k) = (perPair.map(_._1).sum, perPair.map(_._2).sum)
      (et, n, k, (n - k).toDouble / n.toDouble)
    }
    assert(got == exp)
    // the chain keeps at least one event per active pair, never more than all
    got.foreach(r => assert(r._3 >= 1L && r._3 <= r._2))
  }

  test("q261 checksum audit reports exactly the planted cohort loss") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q261_partition_sync_audit")(spark, d)
      .select($"day".cast("string"), $"n_primary", $"n_replica",
        $"rows_missing", $"needs_resync")
      .as[(String, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    val ev = spark.read.parquet(s"$d/events.parquet")
      .select(to_date($"ts").cast("string"), $"event_id")
      .as[(String, Long)].collect()
    val exp = ev.groupBy(_._1).toSeq.sortBy(_._1).map { case (day, rows) =>
      val hs = rows.map(r => idHash(r._2))
      val kept = hs.filter(_ % 997L != 0L)
      (day, hs.length.toLong, kept.length.toLong,
        (hs.length - kept.length).toLong,
        if (kept.sum != hs.sum) 1L else 0L)
    }
    assert(got == exp)
    // a day needs resync IFF rows are missing (sum-of-distinct-hashes
    // cannot collide back to equality when rows were dropped, since
    // every dropped hash is nonzero)
    got.foreach(r => assert((r._5 == 1L) == (r._4 > 0L)))
    // the planted 0.1% defect is actually present somewhere
    assert(got.exists(_._5 == 1L))
  }

  test("q262 collision census replays from the md5 token hash") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q262_feature_hash_audit")(spark, d)
      .select($"k_bits", $"n_tokens", $"n_buckets_used",
        $"n_collided_tokens", $"collided_occ_share")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    val toks = spark.read.parquet(s"$d/documents.parquet")
      .select($"text").as[String].collect()
      .flatMap(_.split(" ", -1))
    val freq = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val exp = Seq(14, 16, 18).map { k =>
      val m = 1L << k
      val byBucket = freq.toSeq.groupBy { case (t, _) => strHash(t) % m }
      val collided = byBucket.values.filter(_.size > 1).flatten.toSeq
      (k.toLong, freq.size.toLong, byBucket.size.toLong,
        collided.size.toLong,
        collided.map(_._2).sum.toDouble / toks.length.toDouble)
    }
    assert(got == exp)
    // wider tables collide monotonically less
    assert(got.map(_._4) == got.map(_._4).sorted.reverse)
  }

  test("q263 capped sessions replay the two-rule greedy chain per user") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q263_capped_sessions")(spark, d)
      .select($"n_users", $"n_events", $"n_sessions", $"n_gap_breaks",
        $"n_cap_breaks", $"events_per_session")
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(got.size == 1)
    val ev = graft.Tables(spark, d, "events")
      .select($"user_id", $"event_id",
        expr("unix_micros(cast(ts AS timestamp))"))
      .as[(Long, Long, Long)].collect()
    var (sessions, gapB, capB) = (0L, 0L, 0L)
    ev.groupBy(_._1).values.foreach { es =>
      val sorted = es.sortBy(e => (e._3, e._2))
      var start = -1L; var last = -1L; var first = true
      sorted.foreach { e =>
        if (first) { sessions += 1; start = e._3; last = e._3; first = false }
        else if (e._3 - last > 1800000000L) {
          sessions += 1; gapB += 1; start = e._3; last = e._3
        } else if (e._3 - start > 14400000000L) {
          sessions += 1; capB += 1; start = e._3; last = e._3
        } else last = e._3
      }
    }
    val users = ev.map(_._1).distinct.length.toLong
    assert(got.head == ((users, ev.length.toLong, sessions, gapB, capB,
      ev.length.toDouble / sessions.toDouble)))
    // every break is attributed to exactly one rule
    assert(sessions == users + gapB + capB)
  }

  test("q265 rolling correlation replays frame-exact Pearson over the dense calendar") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q265_rolling_correlation")(spark, d)
      .select($"day".cast("string"), $"a", $"b", $"rolling_corr")
      .as[(String, Long, Long, Option[Double])].collect().toSeq.sortBy(_._1)
    val ev = spark.read.parquet(s"$d/events.parquet")
      .select(to_date($"ts").cast("string"), $"event_type")
      .as[(String, String)].collect()
    val byDay = ev.groupBy(_._1).view.mapValues { rs =>
      (rs.count(_._2 == "view").toLong, rs.count(_._2 == "purchase").toLong)
    }.toMap
    val d0 = java.time.LocalDate.parse(ev.map(_._1).min)
    val d1 = java.time.LocalDate.parse(ev.map(_._1).max)
    val days = Iterator.iterate(d0)(_.plusDays(1))
      .takeWhile(!_.isAfter(d1)).toSeq
    val series = days.map(dy => (dy.toString,
      byDay.getOrElse(dy.toString, (0L, 0L))))
    val exp = series.indices.drop(13).map { i =>
      val fr = series.slice(i - 13, i + 1).map(_._2)
      val n = 14L
      val sa = fr.map(_._1).sum; val sb = fr.map(_._2).sum
      val saa = fr.map(x => x._1 * x._1).sum
      val sbb = fr.map(x => x._2 * x._2).sum
      val sab = fr.map(x => x._1 * x._2).sum
      val den = (n * saa - sa * sa) * (n * sbb - sb * sb)
      val r = if (den <= 0) None
        else Some((n * sab - sa * sb).toDouble / math.sqrt(den.toDouble))
      (series(i)._1, series(i)._2._1, series(i)._2._2, r)
    }
    assert(got == exp)
    got.flatMap(_._4).foreach(r => assert(r >= -1.0 && r <= 1.0))
  }

  test("q266 backfill segments replay from merged tainted intervals") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q266_backfill_plan")(spark, d)
      .select($"island", $"from_day".cast("string"),
        $"to_day".cast("string"), $"n_recompute_days", $"n_bad_days",
        $"n_bad_rows")
      .as[(Long, String, String, Long, Long, Long)].collect().toSeq
      .sortBy(_._1)
    val ev = spark.read.parquet(s"$d/events.parquet")
      .select(to_date($"ts").cast("string"), $"event_id")
      .as[(String, Long)].collect()
    val badRows = ev.filter(r => idHash(r._2) % 997L == 0L)
    val byDay = badRows.groupBy(_._1).view.mapValues(_.size.toLong)
      .toSeq.sortBy(_._1)
    // greedy interval merge over [day, day+6]
    var islands = List.empty[(String, String, Long, Long)] // from,toEnd,badDays,badRows
    byDay.foreach { case (day, n) =>
      val end = java.time.LocalDate.parse(day).plusDays(6).toString
      islands match {
        case (f, t, bd, br) :: rest if day <= t =>
          islands = (f, if (end > t) end else t, bd + 1, br + n) :: rest
        case _ => islands = (day, end, 1L, n) :: islands
      }
    }
    val exp = islands.reverse.zipWithIndex.map { case ((f, t, bd, br), i) =>
      val days = java.time.temporal.ChronoUnit.DAYS.between(
        java.time.LocalDate.parse(f), java.time.LocalDate.parse(t)) + 1
      (i + 1L, f, t, days, bd, br)
    }
    assert(got == exp)
    // merged segments never overlap and cover every bad day once
    assert(got.map(_._5).sum == byDay.size.toLong)
  }

  test("q267 S-curves replay via the identical squaring chains and are monotone") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q267_lsh_parameter_advisor")(spark, d)
      .select($"bands", $"rows_per_band", $"sim", $"collision_prob")
      .as[(Long, Long, Double, Double)].collect().toSeq
      .sortBy(r => (r._1, r._3))
    assert(got.size == 18)
    def chain(b: Int, r: Int, s0: Double): Double = {
      def sq(x: Double, times: Int): Double =
        (1 to times).foldLeft(x) { case (e, _) => e * e }
      1.0 - sq(1.0 - sq(s0, Integer.numberOfTrailingZeros(r)),
        Integer.numberOfTrailingZeros(b))
    }
    got.foreach { case (b, r, s0, p) =>
      assert(b * r == 128L)
      assert(p == chain(b.toInt, r.toInt, s0))
      assert(p >= 0.0 && p <= 1.0)
    }
    // more rows per band -> sharper knee: below the knee fewer collisions
    val at3 = got.filter(_._3 == 0.3).sortBy(_._2).map(_._4)
    assert(at3 == at3.sorted.reverse)
    // every curve is monotone in similarity
    got.groupBy(_._1).values.foreach { c =>
      val ps = c.sortBy(_._3).map(_._4)
      assert(ps == ps.sorted)
    }
  }

  test("q268 A/A arms replay from the salted hash and partition the exposed users") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q268_aa_test_calibration")(spark, d)
      .select($"n_a", $"x_a", $"n_b", $"x_b", $"p_a", $"p_b", $"z_stat",
        $"significant")
      .as[(Long, Long, Long, Long, Double, Double, Double, Long)]
      .collect().toSeq
    assert(got.size == 1)
    val ev = spark.read.parquet(s"$d/events.parquet")
      .select($"user_id", $"event_type").as[(Long, String)].collect()
    val perUser = ev.groupBy(_._1).iterator.collect {
      case (u, es) if es.exists(_._2 == "view") =>
        (strHash(s"aa:$u") % 2 == 0, es.exists(_._2 == "purchase"))
    }.toSeq
    val (na, xa) = (perUser.count(_._1).toLong,
      perUser.count(p => p._1 && p._2).toLong)
    val (nb, xb) = (perUser.count(!_._1).toLong,
      perUser.count(p => !p._1 && p._2).toLong)
    val (pa, pb) = (xa.toDouble / na, xb.toDouble / nb)
    val pp = (xa + xb).toDouble / (na + nb)
    val se = math.sqrt(pp * (1.0 - pp) * (1.0 / na + 1.0 / nb))
    val z = if (se == 0.0) 0.0 else (pa - pb) / se
    assert(got.head == ((na, xa, nb, xb, pa, pb, z,
      if (se != 0.0 && math.abs(z) > 1.96) 1L else 0L)))
    assert(na + nb == perUser.size.toLong)
  }

  test("q315 multi-touch attribution conserves revenue to the cent") {
    // largest-remainder apportionment must hand out EXACTLY each
    // purchase's cents — the invariant that makes integer multi-touch
    // auditable (a floating split drifts by ulps and never reconciles)
    val attributed = graft.SparkEntry
      .queries("q315_multitouch_attribution")(spark, d)
      .agg(sum(col("attributed_cents"))).collect().head.getLong(0)
    val total = graft.Tables(spark, d, "events")
      .filter(col("event_type") === "purchase")
      .agg(sum(expr("CAST(ROUND(value * 100) AS BIGINT)")))
      .collect().head.getLong(0)
    assert(attributed == total,
      s"attributed $attributed cents != purchase total $total cents")
  }

  /** Write an events+customer fixture: per user, one view plus
    * `purchases(u)` purchase events at the given timestamp(s).
    */
  private def abFixture(
      users: Seq[Long],
      nation: Long => Long,
      purchases: Long => Seq[String],
      segment: Long => String = _ => "SEG"): String = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("abfx").toString
    val evSchema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", TimestampType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))
    var eid = 0L
    val evRows = users.flatMap { u =>
      val view = Row({ eid += 1; eid }, java.sql.Timestamp.valueOf("2024-01-05 00:00:00"),
        u, "view", 1.0, "{}")
      val buys = purchases(u).map { day =>
        Row({ eid += 1; eid }, java.sql.Timestamp.valueOf(s"$day 12:00:00"),
          u, "purchase", 5.0, "{}")
      }
      view +: buys
    }
    spark.createDataFrame(spark.sparkContext.parallelize(evRows), evSchema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val cSchema = StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("c_nationkey", LongType),
      StructField("c_mktsegment", StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        users.map(u => Row(u, nation(u), segment(u)))), cSchema)
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    dir
  }

  test("q335: BH rejects a constructed true effect and keeps the null segment") {
    // nation 1 carries a MAXIMAL effect (arm A all heavy buyers, arm B
    // none — arm computed from the library's own hash so the test
    // controls the outcome); nation 2 is a uniform null. With m = 2 and
    // the effect ranked first, rejection needs z² ≥ 20; the constructed
    // z² is ~n/… far above it.
    val users = (1L to 240L)
    def armA(u: Long) = idHash(u) % 2 == 0
    val dir = abFixture(
      users,
      nation = u => if (u <= 120) 1L else 2L,
      purchases = u =>
        if (u <= 120) { if (armA(u)) Seq.fill(14)("2024-01-10") else Seq("2024-01-10") }
        else Seq.fill(14)("2024-01-10"))
    val out = graft.SparkEntry.queries("q335_bh_fdr_correction")(spark, dir)
      .collect().map(r => r.getAs[Long]("nationkey") -> r).toMap
    assert(out(1L).getAs[Long]("rejected") === 1L,
      s"the true effect must survive BH: ${out(1L)}")
    assert(out(2L).getAs[Long]("rejected") === 0L,
      s"the null segment must not be rejected: ${out(2L)}")
    assert(out(1L).getAs[Long]("bh_rank") === 1L)
    // arms partition the nation's exposed users
    assert(out(1L).getAs[Long]("n_a") + out(1L).getAs[Long]("n_b") === 120L)
  }

  test("q336: a perfectly predictive covariate removes ALL variance and the arm gap") {
    // y = x per user → θ = 1, every adjusted value collapses to x̄:
    // var_reduction is exactly 1.0 and diff_adj exactly 0.0 (identical
    // IEEE operands cancel bit-for-bit)
    val users = (1L to 40L)
    def k(u: Long) = (u % 7).toInt
    val dir = abFixture(
      users,
      nation = _ => 1L,
      purchases = u =>
        Seq.fill(k(u))("2024-01-10") ++ Seq.fill(k(u))("2024-01-20"))
    val r = graft.SparkEntry.queries("q336_cuped_adjustment")(spark, dir)
      .collect()(0)
    assert(r.getAs[Double]("theta") === 1.0, s"$r")
    assert(r.getAs[Double]("var_reduction") === 1.0, s"$r")
    assert(r.getAs[Double]("diff_adj") === 0.0, s"$r")
    assert(r.getAs[Double]("mean_y_adj_a") === r.getAs[Double]("mean_y_adj_b"))
    assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") === 40L)
  }

  test("q337: a constructed 40-vs-2 imbalance trips SRM; a balanced nation doesn't") {
    // arms come from the library hash, so the test SELECTS user ids by
    // their hash parity: nation 1 gets 40 A-arm + 2 B-arm users
    // (chi2 = 38²/42 ≈ 34.4 ≫ 3.841), nation 2 gets 10 + 10
    def armA(u: Long) = idHash(u) % 2 == 0
    val ids = (1L to 2000L)
    val n1 = ids.filter(armA).take(40) ++ ids.filterNot(armA).take(2)
    val n2 = ids.filter(u => armA(u) && !n1.contains(u)).take(10) ++
      ids.filterNot(u => armA(u) || n1.contains(u)).take(10)
    val dir = abFixture(
      (n1 ++ n2).distinct,
      nation = u => if (n1.contains(u)) 1L else 2L,
      purchases = _ => Seq("2024-01-10"))
    val out = graft.SparkEntry.queries("q337_srm_check")(spark, dir)
      .collect().map(r => r.getAs[Long]("nationkey") -> r).toMap
    assert(out(1L).getAs[Long]("srm_flag") === 1L, s"${out(1L)}")
    assert(out(1L).getAs[Long]("n_a") === 40L)
    assert(out(2L).getAs[Long]("srm_flag") === 0L, s"${out(2L)}")
    // the ROLLUP global cell is present and sums both nations
    assert(out(-1L).getAs[Long]("n_a") + out(-1L).getAs[Long]("n_b") === 62L)
  }

  test("q338: constructed parallel-trend violations recover the exact DiD") {
    // segment X users: pre=1, post=5; segment Y users: pre=2, post=3 —
    // DiD(X) = (5−1) − (3−2) = 3 exactly; DiD(Y) is its mirror −3
    val users = (1L to 30L)
    def seg(u: Long) = if (u <= 15) "X" else "Y"
    val dir = abFixture(
      users,
      nation = _ => 1L,
      purchases = u =>
        if (seg(u) == "X") Seq.fill(1)("2024-01-10") ++ Seq.fill(5)("2024-01-20")
        else Seq.fill(2)("2024-01-10") ++ Seq.fill(3)("2024-01-20"),
      segment = seg)
    val out = graft.SparkEntry.queries("q338_diff_in_diff")(spark, dir)
      .collect().map(r => r.getAs[String]("c_mktsegment") -> r).toMap
    assert(out("X").getAs[Double]("did") === 3.0, s"${out("X")}")
    assert(out("Y").getAs[Double]("did") === -3.0, s"${out("Y")}")
    assert(out("X").getAs[Long]("n_t") === 15L)
    assert(out("X").getAs[Long]("n_c") === 15L)
    assert(out("X").getAs[Double]("pre_treated_mean") === 1.0)
    assert(out("X").getAs[Double]("post_control_mean") === 3.0)
  }

  test("q341 sequential looks match a per-day replay bit-exactly") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q341_sequential_stopping")(spark, d)
      .select($"nationkey", $"n_looks", $"n_two_arm_looks",
        $"first_cross_day", $"crossed", $"z_final")
      .as[(Long, Long, Long, Option[java.sql.Timestamp], Long, Double)]
      .collect().toSeq.sortBy(_._1)
    val ev = graft.Tables(spark, d, "events")
      .select($"user_id", $"event_type", $"ts")
      .as[(Long, String, java.sql.Timestamp)].collect()
    val nat = spark.read.parquet(s"$d/customer.parquet")
      .select($"c_custkey", $"c_nationkey").as[(Long, Long)].collect().toMap
    def day(t: java.sql.Timestamp): java.time.LocalDate =
      t.toLocalDateTime.toLocalDate
    val perUser = ev.groupBy(_._1).iterator.flatMap { case (u, es) =>
      val views = es.filter(_._2 == "view").map(e => day(e._3))
      val buys = es.filter(_._2 == "purchase").map(e => day(e._3))
      if (views.isEmpty) None
      else {
        val eDay = views.min(Ordering.by((x: java.time.LocalDate) => x.toEpochDay))
        val xDay = if (buys.isEmpty) None else {
          val bDay = buys.min(Ordering.by((x: java.time.LocalDate) => x.toEpochDay))
          Some(if (bDay.isAfter(eDay)) bDay else eDay)
        }
        nat.get(u).map(n => (n, idHash(u) % 2 == 0, eDay, xDay))
      }
    }.toSeq
    val exp = perUser.groupBy(_._1).map { case (nk, us) =>
      // (day → (dna, dxa, dnb, dxb))
      var daily = Map.empty[java.time.LocalDate, (Long, Long, Long, Long)]
      def add(dy: java.time.LocalDate, a: Boolean, dn: Long, dx: Long): Unit = {
        val (p, q, r, s) = daily.getOrElse(dy, (0L, 0L, 0L, 0L))
        daily = daily.updated(dy,
          if (a) (p + dn, q + dx, r, s) else (p, q, r + dn, s + dx))
      }
      us.foreach { case (_, a, eDay, xDay) =>
        add(eDay, a, 1L, if (xDay.contains(eDay)) 1L else 0L)
        xDay.filter(_.isAfter(eDay)).foreach(add(_, a, 0L, 1L))
      }
      var (na, xa, nb, xb) = (0L, 0L, 0L, 0L)
      var looks = 0L; var twoArm = 0L; var firstCross: Option[java.time.LocalDate] = None
      var crossed = 0L; var zFinal = 0.0
      daily.keys.toSeq.sortBy(_.toEpochDay).foreach { dy =>
        val (p, q, r, s) = daily(dy)
        na += p; xa += q; nb += r; xb += s
        looks += 1
        if (na > 0 && nb > 0) twoArm += 1
        val naD = math.max(na, 1L).toDouble
        val nbD = math.max(nb, 1L).toDouble
        val pp = (xa + xb).toDouble / (na + nb).toDouble
        val se = math.sqrt((pp * (1.0 - pp)) * (1.0 / naD + 1.0 / nbD))
        val z = if (na == 0L || nb == 0L || se == 0.0) 0.0
          else (xa.toDouble / naD - xb.toDouble / nbD) / se
        if (z * z > 6.25) { crossed = 1L; if (firstCross.isEmpty) firstCross = Some(dy) }
        zFinal = z
      }
      (nk, looks, twoArm,
        firstCross.map(dy => java.sql.Timestamp.valueOf(dy.atStartOfDay)),
        crossed, zFinal)
    }.toSeq.sortBy(_._1)
    assert(got == exp)
    assert(got.nonEmpty)
  }

  test("q342 medians are the exact per-arm order statistics") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q342_quantile_treatment_effect")(spark, d)
      .select($"nationkey", $"n_a", $"med_a", $"n_b", $"med_b", $"qte")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    val ev = spark.read.parquet(s"$d/events.parquet")
      .select($"user_id", $"event_type").as[(Long, String)].collect()
    val nat = spark.read.parquet(s"$d/customer.parquet")
      .select($"c_custkey", $"c_nationkey").as[(Long, Long)].collect().toMap
    val perUser = ev.groupBy(_._1).iterator.collect {
      case (u, es) if es.exists(_._2 == "view") && nat.contains(u) =>
        (nat(u), idHash(u) % 2 == 0, es.count(_._2 == "purchase").toLong)
    }.toSeq
    def lowerMedian(ys: Seq[Long]): Long = {
      val s = ys.sorted
      s(((s.size + 1) / 2) - 1)
    }
    val exp = perUser.groupBy(_._1).toSeq.flatMap { case (nk, us) =>
      val (a, b) = us.partition(_._2)
      if (a.isEmpty || b.isEmpty) None
      else Some((nk, a.size.toLong, lowerMedian(a.map(_._3)),
        b.size.toLong, lowerMedian(b.map(_._3)),
        lowerMedian(a.map(_._3)) - lowerMedian(b.map(_._3))))
    }.sortBy(_._1)
    assert(got == exp)
    assert(got.nonEmpty)
  }

  test("q343 χ² matches a quantized-sum replay; a constructed mix shift trips the flag") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q343_value_drift_chi2")(spark, d)
      .select($"event_type", $"n_pre", $"n_post", $"n_buckets", $"chi2",
        $"drift_flag")
      .as[(String, Long, Long, Long, Double, Long)].collect().toSeq.sortBy(_._1)
    val ev = graft.Tables(spark, d, "events")
      .select($"event_type", $"value", $"ts")
      .as[(String, Double, java.sql.Timestamp)].collect()
    val cut = java.sql.Timestamp.valueOf("2024-01-16 00:00:00")
    val exp = ev.groupBy(_._1).toSeq.map { case (t, es) =>
      val cells = es.groupBy(e => math.min(math.floor(e._2 / 50.0), 6.0).toLong)
        .map { case (b, xs) =>
          b -> (xs.count(_._3.before(cut)).toLong,
            xs.count(!_._3.before(cut)).toLong)
        }
      val nn1 = cells.values.map(_._1).sum
      val nn2 = cells.values.map(_._2).sum
      // Det.dsum replay: quantize each term to the 1e-6 grid, sum the
      // grid units exactly, one final decimal→double conversion
      val units = cells.values.map { case (n1, n2) =>
        val term = if (nn1 == 0L || nn2 == 0L) 0.0
          else {
            val d1 = n1.toDouble; val d2 = n2.toDouble
            val dn1 = nn1.toDouble; val dn2 = nn2.toDouble
            (d1 * dn2 - d2 * dn1) * (d1 * dn2 - d2 * dn1) /
              (dn1 * dn2 * (d1 + d2))
          }
        BigInt(math.floor(term * 1e6 + 0.5).toLong)
      }.sum
      val chi2 = (BigDecimal(units) / BigDecimal(1000000)).toDouble
      (t, nn1, nn2, cells.size.toLong, chi2,
        if (chi2 > 12.592) 1L else 0L)
    }.sortBy(_._1)
    assert(got == exp)
    // constructed shift: pre mass in bucket 0, post mass in bucket 6 —
    // the chi² must saturate and trip
    val dir = java.nio.file.Files.createTempDirectory("drift").toString
    (1L to 200L).map { i =>
      val pre = i <= 100
      (i, if (pre) java.sql.Timestamp.valueOf("2024-01-05 10:00:00")
          else java.sql.Timestamp.valueOf("2024-01-25 10:00:00"),
        i, "click", if (pre) 10.0 else 310.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val trip = graft.SparkEntry.queries("q343_value_drift_chi2")(spark, dir)
      .collect()(0)
    assert(trip.getAs[Long]("drift_flag") === 1L, s"$trip")
    assert(trip.getAs[Long]("n_buckets") === 2L, s"$trip")
    assert(trip.getAs[Double]("chi2") === 200.0, s"total separation = N: $trip")
  }

  /** Det.dsum replay: 1e-6-grid quantized units summed exactly, one
    * final decimal→double conversion.
    */
  private def dsumReplay(xs: Iterable[Double]): Double = {
    val units = xs.map(x => BigInt(math.floor(x * 1e6 + 0.5).toLong)).sum
    (BigDecimal(units) / BigDecimal(1000000)).toDouble
  }

  /** Per-user (nation, in_a, purchase-count) for exposed users with a
    * customer row — the shared input of the q344/q345/q346 replays.
    */
  private def exposedUsers(convertAt: Long = 1L,
      dir: String = d): Seq[(Long, Boolean, Long, Boolean)] = {
    import spark.implicits._
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select($"user_id", $"event_type").as[(Long, String)].collect()
    val nat = spark.read.parquet(s"$dir/customer.parquet")
      .select($"c_custkey", $"c_nationkey").as[(Long, Long)].collect().toMap
    ev.groupBy(_._1).iterator.collect {
      case (u, es) if es.exists(_._2 == "view") && nat.contains(u) =>
        val y = es.count(_._2 == "purchase").toLong
        (nat(u), idHash(u) % 2 == 0, y, y >= convertAt)
    }.toSeq
  }

  test("q344 winsorized means cap at the exact per-cell p90 order statistic") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q344_winsorized_effect")(spark, d)
      .select($"nationkey", $"n_a", $"n_b", $"cap_a", $"cap_b",
        $"wmean_a", $"wmean_b", $"diff_raw", $"diff_winsorized")
      .as[(Long, Long, Long, Long, Long, Double, Double, Double, Double)]
      .collect().toSeq.sortBy(_._1)
    val exp = exposedUsers().groupBy(_._1).toSeq.flatMap { case (nk, us) =>
      val (a, b) = us.partition(_._2)
      if (a.isEmpty || b.isEmpty) None
      else {
        def cell(ys: Seq[Long]): (Long, Long, Double, Double) = {
          val s = ys.sorted
          val cap = s(math.ceil(s.size * 0.9).toLong.toInt - 1)
          val yw = ys.map(math.min(_, cap))
          (ys.size.toLong, cap, ys.sum.toDouble / ys.size,
            yw.sum.toDouble / ys.size)
        }
        val (na, capA, meanA, wmeanA) = cell(a.map(_._3))
        val (nb, capB, meanB, wmeanB) = cell(b.map(_._3))
        Some((nk, na, nb, capA, capB, wmeanA, wmeanB,
          meanA - meanB, wmeanA - wmeanB))
      }
    }.sortBy(_._1)
    assert(got == exp)
    assert(got.nonEmpty)
  }

  test("q345 jackknife CI matches a leave-one-nation-out replay") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q345_jackknife_ci")(spark, d)
      .select($"delta", $"g", $"se_jack", $"ci_lo", $"ci_hi")
      .as[(Double, Long, Double, Double, Double)].collect().toSeq
    assert(got.size == 1)
    val byNation = exposedUsers(convertAt = 14L).groupBy(_._1).map { case (nk, us) =>
      val (a, b) = us.partition(_._2)
      (nk, a.size.toLong, a.count(_._4).toLong,
        b.size.toLong, b.count(_._4).toLong)
    }.toSeq
    val (tna, txa) = (byNation.map(_._2).sum, byNation.map(_._3).sum)
    val (tnb, txb) = (byNation.map(_._4).sum, byNation.map(_._5).sum)
    val deltas = byNation.map { case (_, na, xa, nb, xb) =>
      (txa - xa).toDouble / math.max(tna - na, 1L).toDouble -
        (txb - xb).toDouble / math.max(tnb - nb, 1L).toDouble
    }
    // Det.csum(·, 12) replay: 1e-12-grid units summed as int64, one
    // final long→double cast and division
    def csum12(xs: Iterable[Double]): Double =
      xs.map(x => math.floor(x * 1e12 + 0.5).toLong).sum.toDouble / 1e12
    val g = deltas.size.toLong
    val sd = csum12(deltas)
    val sdd = csum12(deltas.map(x => x * x))
    val se = math.sqrt(((g - 1).toDouble / g.toDouble) *
      math.max(sdd - sd * sd / g.toDouble, 0.0))
    val delta = txa.toDouble / tna.toDouble - txb.toDouble / tnb.toDouble
    assert(got.head == ((delta, g, se, delta - 2.0 * se, delta + 2.0 * se)))
    assert(se > 0.0, "the fixture has cross-nation variation")
  }

  test("q346 Cochran's Q / I² match an inverse-variance replay") {
    import spark.implicits._
    // sf0.01: sf0.001's 15 users leave every nation cell with a
    // degenerate 0/1 proportion (vi = 0 → empty meta-set, NULL row)
    val d01 = "/root/testdata/sf0.01"
    val got = graft.SparkEntry.queries("q346_effect_heterogeneity")(spark, d01)
      .select($"k", $"theta_bar", $"q_stat", $"i2")
      .as[(Long, Double, Double, Double)].collect().toSeq
    assert(got.size == 1)
    val cells = exposedUsers(convertAt = 14L, dir = d01).groupBy(_._1).toSeq
      .flatMap { case (_, us) =>
        val (a, b) = us.partition(_._2)
        if (a.isEmpty || b.isEmpty) None
        else {
          val (na, xa) = (a.size.toLong, a.count(_._4).toLong)
          val (nb, xb) = (b.size.toLong, b.count(_._4).toLong)
          val pa = xa.toDouble / na.toDouble
          val pb = xb.toDouble / nb.toDouble
          val vi = pa * (1.0 - pa) / na.toDouble + pb * (1.0 - pb) / nb.toDouble
          if (vi > 0.0) Some((pa - pb, 1.0 / vi)) else None
        }
      }
    val k = cells.size.toLong
    val sw = dsumReplay(cells.map(_._2))
    val swt = dsumReplay(cells.map(c => c._2 * c._1))
    val swtt = dsumReplay(cells.map(c => c._2 * c._1 * c._1))
    val q = swtt - swt * swt / sw
    val i2 = if (q <= 0.0 || k <= 1L) 0.0
      else math.max(0.0, (q - (k - 1).toDouble) / q)
    assert(got.head == ((k, swt / sw, q, i2)))
    assert(k > 1L)
  }

  test("q348 Gini matches a sorted-rank replay; constructed extremes read 0 and (n-1)/n") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q348_purchase_gini")(spark, d)
      .select($"nationkey", $"n_users", $"total_purchases", $"gini")
      .as[(Long, Long, Long, Option[Double])].collect().toSeq.sortBy(_._1)
    val ev = spark.read.parquet(s"$d/events.parquet")
      .select($"user_id", $"event_type").as[(Long, String)].collect()
    val nat = spark.read.parquet(s"$d/customer.parquet")
      .select($"c_custkey", $"c_nationkey").as[(Long, Long)].collect().toMap
    val perUser = ev.groupBy(_._1).iterator.collect {
      case (u, es) if nat.contains(u) =>
        (nat(u), es.count(_._2 == "purchase").toLong)
    }.toSeq
    def gini(xs: Seq[Long]): Option[Double] = {
      val s0 = xs.sum
      if (s0 == 0L) None
      else {
        val sorted = xs.sorted
        val six = sorted.zipWithIndex.map { case (x, i) => (i + 1L) * x }.sum
        Some((2.0 * six.toDouble - (xs.size + 1L).toDouble * s0.toDouble) /
          (xs.size.toDouble * s0.toDouble))
      }
    }
    val exp = perUser.groupBy(_._1).toSeq.map { case (nk, us) =>
      (nk, us.size.toLong, us.map(_._2).sum, gini(us.map(_._2)))
    }.sortBy(_._1)
    assert(got == exp)
    // constructed extremes: perfect equality → 0; one user owns all →
    // (n−1)/n exactly
    val dir = java.nio.file.Files.createTempDirectory("gini").toString
    // nation 10 (u1-4): 3 purchases each — perfect equality. nation 20
    // (u5-8): u5 owns all 12, u6-8 appear with a view only (a user must
    // appear in events to be in the census — zero-event users are out
    // of scope by construction, documented)
    val evRows = (1L to 4L).flatMap(u => Seq.fill(3)((u, "purchase"))) ++
      Seq.fill(12)((5L, "purchase")) ++ (6L to 8L).map(u => (u, "view"))
    evRows.zipWithIndex.map { case ((u, t), i) =>
      (i.toLong, java.sql.Timestamp.valueOf("2024-01-05 10:00:00"), u, t,
        1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    (1L to 8L).map(u => (u, if (u <= 4) 10L else 20L))
      .toDF("c_custkey", "c_nationkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val ex = graft.SparkEntry.queries("q348_purchase_gini")(spark, dir)
      .collect().map(r => r.getAs[Long]("nationkey") -> r).toMap
    assert(ex(10L).getAs[Double]("gini") === 0.0, s"${ex(10L)}")
    assert(ex(20L).getAs[Double]("gini") === 0.75, s"(n-1)/n = 3/4: ${ex(20L)}")
  }

  test("q349 fan-out profile matches a brute-force census") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q349_join_skew_profile")(spark, d)
      .select($"join_key", $"n_keys", $"n_rows", $"mean_fanout",
        $"p50_fanout", $"p99_fanout", $"max_fanout", $"skew_factor",
        $"suggested_salt")
      .as[(String, Long, Long, Double, Long, Long, Long, Double, Long)]
      .collect().toSeq.sortBy(_._1)
    val li = spark.read.parquet(s"$d/lineitem.parquet")
      .select($"l_orderkey", $"l_partkey").as[(Long, Long)].collect()
    def profile(keys: Seq[Long], name: String) = {
      val cs = keys.groupBy(identity).values.map(_.size.toLong).toSeq.sorted
      val nk = cs.size.toLong
      val p50 = cs(((nk + 1L) / 2L).toInt - 1)
      val p99 = cs(math.ceil(nk * 0.99).toLong.toInt - 1)
      val mx = cs.max
      (name, nk, keys.size.toLong, keys.size.toDouble / nk.toDouble,
        p50, p99, mx, mx.toDouble * nk.toDouble / keys.size.toDouble,
        math.max(1L, math.ceil(mx.toDouble / math.max(p99, 1L).toDouble).toLong))
    }
    val exp = Seq(profile(li.map(_._1), "l_orderkey"),
      profile(li.map(_._2), "l_partkey")).sortBy(_._1)
    assert(got == exp)
  }

  test("q350 Fano reads ~1 on uniform arrivals and ≫1 on clumped ones") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q350_fano_burstiness")(spark, d)
      .select($"event_type", $"m_minutes", $"n_events", $"fano")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got.nonEmpty && got.forall(_._4 >= 0.0))
    // constructed: "steady" = 1/minute over 60 minutes (variance 0 on
    // the dense grid → Fano 0); "burst" = 60 events in one minute of
    // the same hour (Fano = (60·3600−3600)/(60·60) = 59)
    val dir = java.nio.file.Files.createTempDirectory("fano").toString
    val rows =
      (0 until 60).map(i => (java.sql.Timestamp.valueOf(
        f"2024-01-05 10:$i%02d:30"), "steady")) ++
        (0 until 60).map(_ => (java.sql.Timestamp.valueOf(
          "2024-01-05 10:30:10"), "burst"))
    rows.zipWithIndex.map { case ((t, ty), i) =>
      (i.toLong, t, 1L, ty, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ex = graft.SparkEntry.queries("q350_fano_burstiness")(spark, dir)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    assert(ex("steady").getAs[Long]("m_minutes") === 60L)
    assert(ex("steady").getAs[Double]("fano") === 0.0, s"${ex("steady")}")
    assert(ex("steady").getAs[Long]("bursty_flag") === 0L)
    assert(ex("burst").getAs[Double]("fano") === 59.0, s"${ex("burst")}")
    assert(ex("burst").getAs[Long]("bursty_flag") === 1L)
  }
}
