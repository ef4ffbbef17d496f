package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet corpus (TESTDATA.md).
  *
  * `events.ts` is written as parquet TIMESTAMP(NANOS) which Spark 4 refuses
  * to read as a timestamp; we read it as raw nanos
  * (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to microseconds —
  * exactly what DuckDB does on read, so oracle comparisons line up.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = name match {
    case "events" =>
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/events.parquet")
      // driver fixtures carry TIMESTAMP(NANOS) (read here as raw longs);
      // derived corpora written by Spark itself (e.g. ScaleUp's sf1) are
      // already micros timestamps and pass through
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case _ => raw
      }
    case other =>
      spark.read.parquet(s"$dir/$other.parquet")
  }

  /** The `spark.sql(...)` surface: register every corpus table as a temp
    * view (with the same timestamp handling as [[apply]]), so literal
    * ANSI SQL runs against the engine — the views are lazy relations,
    * and every Catalyst benefit (pushdown, pruning, whole-stage codegen)
    * applies to SQL text exactly as to the DataFrame API.
    */
  def registerViews(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
