package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the warehouse-maintenance operators (CDC
  * apply, SCD-2 build, graph cohesion) beyond their oracle hashes.
  */
class WarehouseSpec extends AnyFunSuite with SparkTestSession {

  private val d = "/root/testdata/sf0.001"

  test("q150: the apply path reproduces the rebuild on every source") {
    import spark.implicits._
    val rows = graft.SparkEntry.queries("q150_cdc_merge_audit")(spark, d)
      .select($"matches").as[Boolean].collect()
    assert(rows.nonEmpty && rows.forall(identity),
      "CDC apply diverged from the from-scratch rebuild")
  }

  test("q151: SCD-2 intervals are contiguous, versioned 1..n, open only at the tail") {
    import spark.implicits._
    val rows = graft.SparkEntry.queries("q151_scd2_dimension_build")(spark, d)
      .select($"user_id", $"band", $"effective_from", $"effective_to", $"version_n")
      .as[(Long, Int, java.sql.Timestamp, Option[java.sql.Timestamp], Int)]
      .collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (user, vs) =>
      val hist = vs.sortBy(_._5)
      assert(hist.map(_._5).toSeq == (1 to hist.length),
        s"user $user versions not dense: ${hist.map(_._5).toSeq}")
      // adjacent versions: this interval closes exactly where the next opens
      hist.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4.contains(b._3),
            s"user $user: v${a._5} closes at ${a._4}, v${b._5} opens at ${b._3}")
          assert(a._2 != b._2, s"user $user: consecutive versions share band ${a._2}")
        case _ => ()
      }
      // only the last version is open-ended
      assert(hist.last._4.isEmpty && hist.init.forall(_._4.nonEmpty),
        s"user $user: open intervals not exactly the tail")
    }
  }

  test("q152: per-node triangle counts sum to 3x the global count; coefficients in [0,1]") {
    import spark.implicits._
    val rows = graft.SparkEntry.queries("q152_triangle_clustering")(spark, d)
      .select($"node", $"deg", $"n_triangles", $"clustering")
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r._4 >= 0.0 && r._4 <= 1.0))
    // every triangle contributes one count at each of its 3 corners
    assert(rows.map(_._3).sum % 3 == 0,
      s"per-node triangle mass not divisible by 3: ${rows.map(_._3).sum}")
    // a triangle requires degree >= 2 at every corner
    assert(rows.filter(_._2 < 2).forall(_._3 == 0))
  }

  test("q155: the evaluated model predicts each from-type's modal train successor") {
    import spark.implicits._
    val rows = graft.SparkEntry.queries("q155_markov_eval")(spark, d)
      .select($"from_type", $"predicted", $"n_test", $"n_correct", $"accuracy")
      .as[(String, String, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, pred, nTest, nCorrect, acc) =>
      assert(pred != null, "every from-type seen in test must exist in train here")
      assert(nCorrect <= nTest && acc >= 0.0 && acc <= 1.0)
    }
    // determinism pin: the argmax tie-break is lexicographic, so a
    // rerun must reproduce the identical prediction table
    val again = graft.SparkEntry.queries("q155_markov_eval")(spark, d)
      .select($"from_type", $"predicted").as[(String, String)].collect().toMap
    assert(rows.map(r => r._1 -> r._2).toMap == again)
  }

  test("q163: digits 1-9 covered, chi2 terms non-negative, counts sum to the table") {
    import spark.implicits._
    val rows = graft.SparkEntry.queries("q163_benford_audit")(spark, d)
      .select($"digit", $"n_obs", $"expected", $"chi2_term")
      .as[(String, Long, Double, Double)].collect()
    assert(rows.map(_._1).sorted.toSeq == (1 to 9).map(_.toString),
      s"digit coverage: ${rows.map(_._1).toSeq}")
    assert(rows.forall(r => r._3 > 0.0 && r._4 >= 0.0))
    val total = graft.Tables(spark, d, "orders").count()
    assert(rows.map(_._2).sum == total)
    // expected counts must also sum to ~the table (Benford probs sum to 1)
    assert(math.abs(rows.map(_._3).sum - total) < 1e-6 * total)
  }

  test("q165: the grid is complete (days x priorities) and zeros mark real gaps") {
    import spark.implicits._
    val rows = graft.SparkEntry.queries("q165_calendar_densify")(spark, d)
      .select($"day", $"o_orderpriority", $"n_orders")
      .as[(java.sql.Date, String, Long)].collect()
    val days = rows.map(_._1.toLocalDate).distinct.sorted
    val prios = rows.map(_._2).distinct
    assert(rows.length == days.length * prios.length,
      s"grid not dense: ${rows.length} != ${days.length} x ${prios.length}")
    // the scaffold is CONTIGUOUS: every calendar day in the span appears
    assert(days.length ==
      java.time.temporal.ChronoUnit.DAYS.between(days.head, days.last) + 1)
    // totals reconcile with the raw table
    assert(rows.map(_._3).sum == graft.Tables(spark, d, "orders").count())
  }

  test("q166: coverage is bounded by the naive sum and at least one interval") {
    import spark.implicits._
    val rows = graft.SparkEntry.queries("q166_interval_coverage")(spark, d)
      .select($"user_id", $"n_islands", $"coverage_us")
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val halfHour = 1800000000L
    val nEvents = graft.Tables(spark, d, "events")
      .filter(graft.Ids.hash("user_id") % 20 === 0)
      .groupBy($"user_id").count().as[(Long, Long)].collect().toMap
    rows.foreach { case (u, islands, cov) =>
      val n = nEvents(u)
      assert(islands >= 1 && islands <= n)
      // union length: at least one interval, at most the no-overlap sum
      assert(cov >= halfHour && cov <= n * halfHour,
        s"user $u coverage $cov outside [$halfHour, ${n * halfHour}]")
    }
  }

  test("q167/q168: pattern support and RLE invariants hold") {
    import spark.implicits._
    val pats = graft.SparkEntry.queries("q167_sequence_patterns")(spark, d)
      .select($"n_occurrences", $"n_users").as[(Long, Long)].collect()
    assert(pats.nonEmpty)
    assert(pats.forall(p => p._1 >= p._2 && p._2 >= 2))
    val rle = graft.SparkEntry.queries("q168_rle_compressibility")(spark, d)
      .select($"n_events", $"n_runs", $"rle_ratio")
      .as[(Long, Long, Double)].collect()
    assert(rle.nonEmpty)
    rle.foreach { case (n, runs, ratio) =>
      assert(runs >= 1 && runs <= n && ratio > 0.0 && ratio <= 1.0)
    }
  }

  test("q169: deciles partition the corpus; q170 rates reconcile with q137-style totals") {
    import spark.implicits._
    val cal = graft.SparkEntry.queries("q169_quality_calibration")(spark, d)
      .select($"decile", $"n_docs", $"n_dup_docs", $"dup_rate")
      .as[(Long, Long, Long, Double)].collect()
    assert(cal.map(_._1).sorted.toSeq == (0L to 9L))
    assert(cal.map(_._2).sum == graft.Tables(spark, d, "documents").count())
    assert(cal.forall(r => r._3 <= r._2 && r._4 >= 0.0 && r._4 <= 1.0))
    val trend = graft.SparkEntry.queries("q170_orphan_rate_trend")(spark, d)
      .select($"n_events", $"n_orphans").as[(Long, Long)].collect()
    assert(trend.map(_._1).sum == graft.Tables(spark, d, "events").count())
    assert(trend.forall(r => r._2 <= r._1))
  }

  test("q173 trailing sums match a per-user brute force on the cohort") {
    import spark.implicits._
    val rows = graft.SparkEntry.queries("q173_trailing_window")(spark, d)
      .select($"user_id", $"event_id", $"ts_s", $"trail_sum", $"trail_n")
      .as[(Long, Long, Long, Double, Long)].collect()
    assert(rows.nonEmpty)
    // independent brute force from the raw cohort events
    val raw = graft.Tables(spark, d, "events")
      .filter(graft.Ids.hash("user_id") % 20 === 0)
      .select($"user_id",
        expr("unix_micros(cast(ts AS timestamp)) DIV 1000000").as("ts_s"),
        $"value")
      .as[(Long, Long, Double)].collect().groupBy(_._1)
    rows.foreach { case (u, _, t, sum, n) =>
      val frame = raw(u).filter(e => e._2 >= t - 604800 && e._2 <= t)
      assert(frame.length == n, s"user $u@$t: frame count $n != ${frame.length}")
      // the query sums via DECIMAL(18,6): replay that exactly
      val brute = frame.map(e => BigDecimal(e._3).setScale(6,
        BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
      assert(math.abs(brute - sum) < 1e-9,
        s"user $u@$t: brute $brute != windowed $sum")
    }
  }

  test("q176 interpolation stays inside its brackets and reproduces observed days") {
    import spark.implicits._
    val filled = graft.SparkEntry.queries("q176_gap_interpolation")(spark, d)
      .select($"prio", $"day", $"filled", $"observed")
      .as[(String, Long, Double, Int)].collect()
    assert(filled.nonEmpty && filled.exists(_._4 == 0),
      "fixture premise: the calendar must actually have gaps to interpolate")
    filled.groupBy(_._1).values.foreach { series =>
      val obs = series.filter(_._4 == 1).sortBy(_._2)
      series.filter(_._4 == 0).foreach { case (_, day, v, _) =>
        val prev = obs.filter(_._2 < day).lastOption
        val next = obs.find(_._2 > day)
        (prev, next) match {
          case (Some(p), Some(n)) =>
            val (lo, hi) = (math.min(p._3, n._3), math.max(p._3, n._3))
            assert(v >= lo - 1e-9 && v <= hi + 1e-9,
              s"interpolated $v escapes bracket [$lo,$hi] at day $day")
          case (Some(p), None) => assert(v == p._3)
          case (None, Some(n)) => assert(v == n._3)
          case _ => fail("gap with no observations at all")
        }
      }
      // observed days carry their exact integer count
      obs.foreach { case (_, _, v, _) => assert(v == math.rint(v)) }
    }
  }

  test("q161 variant extraction degrades identically to TRY_CAST on dirty payloads") {
    // Pins the Spark side of the cross-engine null contract: missing
    // path, explicit JSON null, and a non-numeric string are all
    // "missing" (NULL); ints and digit-strings extract. The DuckDB
    // TRY_CAST oracle side was verified to produce exactly this table
    // (7, NULL, NULL, 5, NULL) — see the q161 Scaladoc contract.
    import spark.implicits._
    val got = Seq("""{"k": 7}""", """{"k": null}""", """{"j": 1}""",
        """{"k": "5"}""", """{"k": "abc"}""")
      .toDF("props")
      .select(expr("try_variant_get(parse_json(props), '$.k', 'int')").as("k"))
      .as[Option[Int]].collect().toSeq
    assert(got == Seq(Some(7), None, None, Some(5), None), got.toString)
  }
}
