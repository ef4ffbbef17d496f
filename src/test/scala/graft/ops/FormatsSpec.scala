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

  test("rate source streams monotonically timestamped rows for replay tests") {
    import spark.implicits._
    val q = spark.readStream.format("rate")
      .option("rowsPerSecond", 500).load()
      .writeStream.format("memory").queryName("rate_sink").start()
    try {
      // wait until at least one batch with data lands
      val deadline = System.currentTimeMillis() + 30000
      while (spark.table("rate_sink").isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
    } finally q.stop()
    val rows = spark.table("rate_sink")
      .select($"timestamp", $"value").as[(java.sql.Timestamp, Long)].collect()
    assert(rows.nonEmpty, "rate source produced no rows in 30s")
    // values are the dense sequence 0..n-1; timestamps non-decreasing in value order
    val sorted = rows.sortBy(_._2)
    assert(sorted.map(_._2).toSeq == (0L until rows.length).toSeq)
    assert(sorted.sliding(2).forall {
      case Array(a, b) => !b._1.before(a._1); case _ => true
    })
  }

  test("console sink accepts a batch write (smoke)") {
    // console is a debugging sink; just prove the plumbing runs
    val src = graft.Tables(spark, d, "region")
    src.write.format("console").save()
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

  test("ORC round-trip preserves rows, values, and column pruning") {
    val out = Files.createTempDirectory("fmt-orc").toString
    val src = graft.Tables(spark, d, "customer")
    src.write.mode("overwrite").orc(out)
    val back = spark.read.orc(out)
    assert(back.count() == src.count())
    assert(back.orderBy("c_custkey").collect().toSeq ==
      src.orderBy("c_custkey").collect().toSeq)
    // pruning reaches the ORC scan exactly as it does for parquet
    val pruned = back.select("c_custkey", "c_mktsegment")
      .queryExecution.executedPlan.toString
    assert(pruned.contains("ReadSchema: struct<c_custkey:"),
      s"projection must prune at the ORC scan:\n$pruned")
  }

  test("parquet schema evolution: mergeSchema unions columns, fills missing with null") {
    val out = Files.createTempDirectory("fmt-evolve").toString
    // day-1 files carry (id, a); day-2 adds column b — the standard
    // additive-evolution shape of a long-lived ingest directory
    spark.range(0, 5).select(col("id"), lit("old").as("a"))
      .write.parquet(s"$out/d=1")
    spark.range(5, 8).select(col("id"), lit("new").as("a"), lit(7L).as("b"))
      .write.parquet(s"$out/d=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert(merged.columns.toSet == Set("id", "a", "b", "d"))
    assert(merged.count() == 8)
    // rows from day-1 read b as null, never a default or a crash
    assert(merged.filter(col("d") === 1 && col("b").isNull).count() == 5)
    assert(merged.filter(col("d") === 2 && col("b") === 7L).count() == 3)
    // without mergeSchema, the first footer in path order (d=1, which
    // has no b) wins silently — the spec pins that the EXPLICIT option
    // is what buys the unioned view
    val unmergedCols = spark.read.parquet(out).columns.toSet
    assert(!unmergedCols.contains("b"),
      s"default read must NOT see day-2's added column, got $unmergedCols")
  }

  test("binaryFile source reads raw media files as (path, content) for multimodal ingest") {
    // the raw-media on-ramp: a directory of opaque payload files becomes
    // a (path, modificationTime, length, content) DataFrame that joins
    // to metadata and feeds the multimodal decode pipeline
    // (Multimodal.decodeImageMeta) without any custom reader code
    val dir = Files.createTempDirectory("fmt-bin")
    val payloads = Map("a.bin" -> "GIF89a-ish".getBytes("UTF-8"),
      "b.bin" -> Array.tabulate(256)(_.toByte))
    payloads.foreach { case (n, b) => Files.write(dir.resolve(n), b) }
    val df = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.bin").load(dir.toString)
    assert(df.columns.toSet ==
      Set("path", "modificationTime", "length", "content"))
    val got = df.select(
        expr("reverse(split(path, '/'))[0]").as("name"),
        col("length"), col("content"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]]("content")).toMap
    assert(got.keySet == payloads.keySet)
    payloads.foreach { case (n, b) =>
      assert(java.util.Arrays.equals(got(n), b), s"$n content must round-trip byte-exact")
    }
  }

  test("XML round-trip preserves rows via rowTag (Spark 4 built-in source)") {
    val out = Files.createTempDirectory("fmt-xml").toString
    val src = graft.Tables(spark, d, "region")
    src.write.mode("overwrite").option("rowTag", "region").xml(out)
    val back = spark.read.option("rowTag", "region")
      .schema(src.schema).xml(out)
    assert(back.count() == src.count())
    val a = src.orderBy("r_regionkey").collect().map(_.toSeq)
    val b = back.orderBy("r_regionkey").collect().map(_.toSeq)
    assert(a.sameElements(b), "XML round-trip must preserve every value")
  }

  test("text source reads line-per-row corpora (the raw-documents on-ramp)") {
    val dir = Files.createTempDirectory("fmt-text")
    Files.write(dir.resolve("docs.txt"),
      "first line\nsecond line\nthird".getBytes("UTF-8"))
    val lines = spark.read.text(dir.toString)
    assert(lines.columns.toSeq == Seq("value"))
    assert(lines.count() == 3)
    // wholetext mode: one row per FILE — the document-per-file corpus shape
    val whole = spark.read.option("wholetext", "true").text(dir.toString)
    assert(whole.count() == 1)
    assert(whole.head().getString(0).startsWith("first line\n"))
  }
}
