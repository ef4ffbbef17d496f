package graft.ops

import java.nio.file.Files

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink format coverage beyond parquet: CSV and JSON round-trips
  * with explicit schemas (schema-on-read, no inference in production paths).
  */
class FormatsSpec extends AnyFunSuite with SparkTestSession {

  private val d = "/root/testdata/sf0.001"

  test("CSV round-trip preserves rows and values with an explicit schema") {
    val out = Files.createTempDirectory("fmt-csv").toString
    val src = graft.Tables(spark, d, "nation")
    src.write.mode("overwrite").option("header", "true").csv(out)
    val schema = StructType(Seq(
      StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType)))
    val back = spark.read.option("header", "true").schema(schema).csv(out)
    assert(back.count() == src.count())
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      src.orderBy("n_nationkey").collect().toSeq)
  }

  test("JSON lines round-trip preserves rows incl. nested JSON payloads") {
    val out = Files.createTempDirectory("fmt-json").toString
    val src = graft.Tables(spark, d, "events").limit(200)
    src.write.mode("overwrite").json(out)
    val back = spark.read.schema(src.schema).json(out)
    assert(back.count() == 200)
    val a = src.orderBy("event_id").select("event_id", "event_type", "props").collect()
    val b = back.orderBy("event_id").select("event_id", "event_type", "props").collect()
    assert(a.toSeq == b.toSeq)
  }
}
