package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StatsSpec extends AnyFunSuite with SparkTestSession {

  private val d = "/root/testdata/sf0.001"

  test("q67 approx percentiles sit inside the exact rank-error band") {
    // q67 (the registered corpus-scale twin of q57) guarantees rank error
    // ≤ n/accuracy. Assert each sketch output lies between the EXACT
    // percentiles at p ± 2/accuracy — the sketch's own contract, checked
    // against q57's ground-truth operator (the q39 HLL treatment).
    import spark.implicits._
    val eps = 2.0 / Stats.ApproxPercentileAccuracy
    val li = graft.Tables(spark, d, "lineitem")
    val bands = li.groupBy($"l_returnflag")
      .agg(
        expr(s"percentile(l_quantity, ${0.25 - eps})").as("lo25"),
        expr(s"percentile(l_quantity, ${0.25 + eps})").as("hi25"),
        expr(s"percentile(l_quantity, ${0.50 - eps})").as("lo50"),
        expr(s"percentile(l_quantity, ${0.50 + eps})").as("hi50"),
        expr(s"percentile(l_quantity, ${0.75 - eps})").as("lo75"),
        expr(s"percentile(l_quantity, ${0.75 + eps})").as("hi75"))
      .as[(String, Double, Double, Double, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    val approx = graft.SparkEntry
      .queries("q67_quantity_percentiles_approx")(spark, d)
      .select($"l_returnflag",
        $"q25".cast("double"), $"median".cast("double"), $"q75".cast("double"))
      .as[(String, Double, Double, Double)].collect()
    assert(approx.nonEmpty)
    approx.foreach { case (flag, a25, a50, a75) =>
      val (_, lo25, hi25, lo50, hi50, lo75, hi75) = bands(flag)
      assert(a25 >= lo25 && a25 <= hi25, s"group $flag q25 $a25 outside [$lo25,$hi25]")
      assert(a50 >= lo50 && a50 <= hi50, s"group $flag median $a50 outside [$lo50,$hi50]")
      assert(a75 >= lo75 && a75 <= hi75, s"group $flag q75 $a75 outside [$lo75,$hi75]")
    }
  }

  test("q58 regression outputs are internally consistent") {
    // slope and intercept must reproduce the group means exactly:
    // mean_y = slope * mean_x + intercept (an algebraic identity of
    // least squares, so it must hold to double round-off).
    import spark.implicits._
    val li = graft.Tables(spark, d, "lineitem")
    val means = li.groupBy($"l_returnflag")
      .agg(avg($"l_quantity").as("mx"),
        avg($"l_extendedprice" / 1000.0).as("my"))
      .as[(String, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val fit = graft.SparkEntry.queries("q58_corr_regression")(spark, d)
      .select($"l_returnflag", $"slope_kprice", $"intercept_kprice", $"corr_qty_price")
      .as[(String, Double, Double, Double)].collect()
    assert(fit.nonEmpty)
    fit.foreach { case (flag, slope, intercept, corr) =>
      val (mx, my) = means(flag)
      assert(math.abs(my - (slope * mx + intercept)) < 1e-9,
        s"group $flag: regression line misses the mean point")
      assert(corr >= -1.0 && corr <= 1.0)
    }
  }

  test("q174 gaps reconcile exactly with the key census and contain no keys") {
    import spark.implicits._
    val gaps = graft.SparkEntry.queries("q174_sequence_gaps")(spark, d)
      .select($"gap_start", $"gap_end", $"n_missing")
      .as[(Long, Long, Long)].collect()
    gaps.foreach { case (s, e, n) => assert(e >= s && n == e - s + 1) }
    // non-overlapping and ordered
    gaps.sliding(2).foreach {
      case Array(a, b) => assert(a._2 + 1 < b._1); case _ => ()
    }
    // census: sum of gap sizes == span − distinct keys
    val keys = graft.Tables(spark, d, "lineitem")
      .select($"l_orderkey").distinct().as[Long].collect()
    val expectedMissing = (keys.max - keys.min + 1) - keys.length
    assert(gaps.map(_._3).sum == expectedMissing,
      s"gap census ${gaps.map(_._3).sum} != $expectedMissing")
    val keySet = keys.toSet
    gaps.foreach { case (s, e, _) =>
      assert(!(s to e).exists(keySet), s"gap [$s,$e] contains a present key") }
  }

  test("q177 class sizes partition each nation's customers") {
    import spark.implicits._
    val audit = graft.SparkEntry.queries("q177_k_anonymity")(spark, d)
      .select($"c_nationkey", $"n_classes", $"n_small_classes",
        $"n_rows_at_risk", $"min_class_size")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(audit.nonEmpty)
    val perNation = graft.Tables(spark, d, "customer")
      .groupBy($"c_nationkey").count()
      .as[(Long, Long)].collect().toMap
    audit.foreach { case (nk, nc, nsmall, atRisk, minSz) =>
      assert(nsmall <= nc && atRisk <= perNation(nk) && minSz >= 1)
      // rows at risk come only from small classes: at most 4 each
      assert(atRisk <= nsmall * 4)
    }
  }
}
