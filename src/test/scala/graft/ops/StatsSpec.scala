package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StatsSpec extends AnyFunSuite with SparkTestSession {

  private val d = "/root/testdata/sf0.001"

  test("approx_percentile (the corpus-scale path) stays within accuracy bounds of exact") {
    // q57 uses exact percentile (per-group sort) for the oracle; at
    // corpus scale the operator of choice is approx_percentile, which is
    // a fixed-size sketch with one pass and no per-group sort. Assert the
    // sketch lands within the quantity domain's resolution of exact.
    import spark.implicits._
    val li = graft.Tables(spark, d, "lineitem")
    val both = li.groupBy($"l_returnflag")
      .agg(
        expr("percentile(l_quantity, 0.5)").as("exact"),
        expr("approx_percentile(l_quantity, 0.5, 1000)").as("approx"))
      .as[(String, Double, Double)].collect()
    assert(both.nonEmpty)
    both.foreach { case (flag, exact, approx) =>
      assert(math.abs(exact - approx) <= 1.0,
        s"group $flag: approx $approx drifted from exact $exact")
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
}
