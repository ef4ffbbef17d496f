package graft.ops

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `Stats.profile` as a library API — q73 pins the orders instance
  * against the DuckDB oracle; this spec covers the generalization: a
  * second table, null accounting, the approx (HLL) mode for wide
  * tables, and hostile column names.
  */
class ProfileSpec extends AnyFunSuite with SparkTestSession {

  private val d = "/root/testdata/sf0.001"

  test("profile of lineitem matches per-column counts computed independently") {
    val cols = Seq("l_orderkey", "l_returnflag", "l_shipdate", "l_quantity")
    val li = Tables(spark, d, "lineitem")
    val got = Stats.profile(li, cols).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet == cols.toSet)
    val nRows = li.count()
    cols.foreach { c =>
      val (n, nNull, nDist) = got(c)
      assert(n == nRows, s"$c: n_rows $n != $nRows")
      assert(nNull == li.filter(col(c).isNull).count(), s"$c: null count")
      assert(nDist == li.select(c).na.drop().distinct().count(), s"$c: distinct count")
    }
  }

  test("profile counts nulls, and output order is by column name") {
    import spark.implicits._
    val df = Seq(
      (Some(1), Some("a")), (None, Some("a")), (Some(1), None), (None, None)
    ).toDF("num", "txt")
    val rows = Stats.profile(df, Seq("txt", "num")).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("num", "txt"))
    rows.foreach { r =>
      assert(r.getLong(1) == 4)     // n_rows
      assert(r.getLong(2) == 2)     // n_null
      assert(r.getLong(3) == 1)     // n_distinct (nulls excluded, as in SQL)
    }
  }

  test("approx mode stays within HLL error of exact and plans without Expand") {
    val cols = Seq("l_orderkey", "l_suppkey", "l_returnflag", "l_linestatus")
    val li = Tables(spark, d, "lineitem")
    val exact = Stats.profile(li, cols).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    val approxDf = Stats.profile(li, cols, approxDistinct = true)
    val approx = approxDf.collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    cols.foreach { c =>
      val (e, a) = (exact(c), approx(c))
      // approx_count_distinct's default rsd is 5%; allow 3x headroom
      assert(math.abs(a - e).toDouble <= math.max(2.0, 0.15 * e),
        s"$c: approx $a too far from exact $e")
    }
    // the point of the approx mode at scale: no Expand row multiplication
    val plan = approxDf.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"),
      "approx profile should aggregate sketches in one pass, not Expand")
    val exactPlan = Stats.profile(li, cols).queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand"),
      "exact multi-column COUNT(DISTINCT) is expected to plan via Expand — " +
        "if Spark changed shape, revisit the profile scaladoc")
  }

  test("column names that are not identifiers survive the generated plan") {
    import spark.implicits._
    val df = Seq((1, "x"), (2, "y"), (2, null))
      .toDF("weird col", "it's quoted")
    val rows = Stats.profile(df, Seq("weird col", "it's quoted")).collect()
    val byName = rows.map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(byName("weird col") == ((0L, 2L)))
    assert(byName("it's quoted") == ((1L, 2L)))
  }
}
