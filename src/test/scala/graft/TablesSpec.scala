package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TablesSpec extends AnyFunSuite with SparkTestSession {

  private val d = "/root/testdata/sf0.001"

  test("registerViews exposes the corpus to literal spark.sql") {
    // child session: the 10 table-named temp views (and the nanos conf)
    // must not leak into the shared session other suites resolve against
    val s = spark.newSession()
    Tables.registerViews(s, d)
    val viaSql = s.sql(
      """SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(SUM(l_quantity) AS BIGINT) AS q
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val viaDf = Tables(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).cast("long").as("q"))
      .orderBy("l_returnflag")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(viaSql == viaDf)
    // the events view must carry the nanos→micros timestamp handling —
    // a bare parquet read of events.ts throws PARQUET_TYPE_ILLEGAL
    val ev = s.sql(
      "SELECT COUNT(*) AS n FROM events WHERE ts IS NOT NULL").head.getLong(0)
    assert(ev > 0)
  }
}
