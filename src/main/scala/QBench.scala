import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
object QBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val d = "/root/testdata/sf0.1"
    val li = graft.Tables(spark, d, "lineitem")
      .filter(col("l_shipdate") <= lit("2000-12-31").cast("timestamp"))
    def time(name: String)(f: => Unit): Unit = (1 to 2).foreach { i =>
      val t0 = System.nanoTime(); f
      println(f"QBENCH $name run$i ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    val D = DecimalType(18, 6)
    time("double_sums") {
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")), sum(col("l_extendedprice")),
          sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))),
          sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))),
          avg(col("l_quantity")), avg(col("l_extendedprice")), avg(col("l_discount")),
          count(lit(1)))
        .write.format("noop").mode("overwrite").save()
    }
    time("decimal_sums") {
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity").cast(D)), sum(col("l_extendedprice").cast(D)),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(D)),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).cast(D)),
          count(lit(1)))
        .write.format("noop").mode("overwrite").save()
    }
    time("long_micro_sums") {
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(round(col("l_quantity") * 1e6).cast("long")),
          sum(round(col("l_extendedprice") * 1e6).cast("long")),
          sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 1e6).cast("long")),
          sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")) * 1e6).cast("long")),
          count(lit(1)))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
