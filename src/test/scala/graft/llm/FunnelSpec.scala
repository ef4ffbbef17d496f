package graft.llm

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FunnelSpec extends AnyFunSuite with SparkTestSession {

  test("audit computes cumulative counts, mass, and retention on a known fixture") {
    import spark.implicits._
    // (value, weight): stage1 keeps v >= 10 (4 rows: 10,11,12,14 — mass
    // 3+4+7+12 = 26), stage2 additionally keeps even v (3 rows: 10,12,14
    // — mass 3+7+12 = 22)
    val df = Seq((5, 1L), (9, 2L), (10, 3L), (11, 4L), (12, 7L), (14, 12L))
      .toDF("v", "w")
    val rep = Funnel.audit(df,
      Seq("min_v" -> ($"v" >= 10), "even" -> ($"v" % 2 === 0)),
      massCol = Some($"w"))
      .as[(Int, String, Long, Long, Option[Double], Long, Long)]
      .collect().toList
    assert(rep === List(
      (1, "min_v", 6L, 4L, Some(4.0 / 6.0), 29L, 26L),
      (2, "even", 4L, 3L, Some(3.0 / 4.0), 26L, 22L)))
  }

  test("a stage that drops everything yields NULL retention downstream, not NaN") {
    import spark.implicits._
    val df = Seq(1, 2, 3).toDF("v")
    val rep = Funnel.audit(df,
      Seq("none" -> ($"v" > 100), "after" -> ($"v" > 0)))
      .as[(Int, String, Long, Long, Option[Double])].collect().toList
    assert(rep === List(
      (1, "none", 3L, 0L, Some(0.0)),
      (2, "after", 0L, 0L, None)))
  }

  test("the audit is one scan and one single-row aggregate") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .withColumn("n_tok", size(split(col("text"), " ")))
    val plan = Funnel.audit(docs, Pipeline.QualityStages,
      massCol = Some(col("n_tok")))
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans === 1, s"funnel must scan its input once, got $scans:\n$plan")
  }

  test("per-batch streaming audits sum to the batch audit of the union") {
    // Funnel on a stream: audit each micro-batch in foreachBatch and add
    // the reports — counts and mass are sums, so the accumulated funnel
    // equals one audit over all the data. (retention is re-derived from
    // the summed counts, not averaged.)
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val stages = Seq("pos" -> ($"v" > 0), "small" -> ($"v" < 10))
    val input = MemoryStream[Int](spark)
    val acc = scala.collection.mutable.Map.empty[(Int, String), (Long, Long)]
    val q = input.toDF().withColumnRenamed("value", "v")
      .writeStream.foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Funnel.audit(batch, stages)
          .as[(Int, String, Long, Long, Option[Double])]
          .collect().foreach { case (st, nm, nIn, nOut, _) =>
            val (a, b) = acc.getOrElse((st, nm), (0L, 0L))
            acc((st, nm)) = (a + nIn, b + nOut)
          }
      }.start()
    try {
      input.addData(-3, 1, 5)
      q.processAllAvailable()
      input.addData(7, 12, 20, 2)
      q.processAllAvailable()
    } finally q.stop()
    val expected = Funnel.audit(Seq(-3, 1, 5, 7, 12, 20, 2).toDF("v"), stages)
      .as[(Int, String, Long, Long, Option[Double])]
      .collect().map { case (st, nm, nIn, nOut, _) => (st, nm) -> (nIn, nOut) }
      .toMap
    assert(acc.toMap === expected)
  }

  test("stage names survive quoting (apostrophes)") {
    import spark.implicits._
    val df = Seq(1).toDF("v")
    val rep = Funnel.audit(df, Seq("o'brien's rule" -> ($"v" > 0)))
      .select("name").as[String].collect().toList
    assert(rep === List("o'brien's rule"))
  }
}
