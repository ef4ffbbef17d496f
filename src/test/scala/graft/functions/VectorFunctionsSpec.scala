package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorFunctionsSpec extends AnyFunSuite with SparkTestSession {

  test("vec_dot matches the higher-order-function fold exactly") {
    import spark.implicits._
    VectorFunctions.register(spark)
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(-1.5, 0.25), Seq(2.0, 8.0)),
      (Seq.empty[Double], Seq.empty[Double]))
      .toDF("a", "b")
    val out = df.select(
      expr("vec_dot(a, b)").as("native"),
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), cast(0 as double), (acc, v) -> acc + v)")
        .as("hof"))
      .as[(Double, Double)].collect()
    out.foreach { case (n, h) => assert(n == h) }
    assert(out(0)._1 == 32.0)
    assert(out(2)._1 == 0.0)
  }

  test("vec_dot survives whole-stage codegen on fixture embeddings") {
    import spark.implicits._
    VectorFunctions.register(spark)
    val emb = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) as v")
    val norms = emb.selectExpr("vec_id", "vec_dot(v, v) as n2").as[(Long, Double)]
      .collect()
    assert(norms.nonEmpty)
    assert(norms.forall(_._2 >= 0.0))
    // the vec_dot projection carries the `*(n)` whole-stage-codegen marker
    val plan = emb.selectExpr("vec_dot(v, v)").queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("vec_dot") && l.trim.startsWith("*")),
      plan)
  }

  test("null inputs propagate null") {
    VectorFunctions.register(spark)
    val row = spark.sql("SELECT vec_dot(cast(null as array<double>), array(1.0d))")
      .collect().head
    assert(row.isNullAt(0))
  }
}
