package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class UdfsSpec extends AnyFunSuite with SparkTestSession {

  test("char_entropy registers and computes Shannon entropy per row") {
    import spark.implicits._
    Udfs.register(spark)
    val rows = Seq("aaaa", "abab", "abcd", "").toDF("s")
      .selectExpr("s", "char_entropy(s) AS h")
      .as[(String, Double)].collect().toMap
    assert(rows("aaaa") == 0.0)
    assert(math.abs(rows("abab") - 1.0) < 1e-12)
    assert(math.abs(rows("abcd") - 2.0) < 1e-12)
    assert(rows("") == 0.0)
  }

  test("char_entropy counts supplementary characters as one code point") {
    import spark.implicits._
    Udfs.register(spark)
    // U+1F600 is a surrogate pair in UTF-16; per code point the string
    // "😀😀" is uniform (entropy 0), and "😀a" is a fair coin (entropy 1)
    val rows = Seq("😀😀", "😀a").toDF("s")
      .selectExpr("s", "char_entropy(s) AS h")
      .as[(String, Double)].collect().toMap
    assert(rows("😀😀") == 0.0)
    assert(math.abs(rows("😀a") - 1.0) < 1e-12)
  }

  test("udf column form composes with built-in expressions") {
    import spark.implicits._
    val df = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), Udfs.charEntropy(col("text")).as("h"))
    val hs = df.as[(Long, Double)].collect()
    assert(hs.nonEmpty && hs.forall { case (_, h) => h > 0.0 && h < 8.0 })
  }
}
