package graft

// TEMPORARY round-17 measurement probe for q146's cost decomposition.
// Never committed: deleted before the change-set commit.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Scratch146 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.SortedIntersectCount.register(spark)
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch146] $tag: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    import graft.llm.Lsh
    val docs = graft.Checkpoints.checkpointLazy(
      Tables(spark, d, "documents")
        .withColumn("tokens", split(col("text"), " "))
        .select(col("doc_id"),
          expr(Lsh.shingleHashesSql(sorted = true)).as("toks"))
        .withColumn("n_toks", size(col("toks")))
        .filter(col("n_toks") > 0))
    time("docs freeze + count")(println("docs=" + docs.count()))
    val toksRel = docs.select(col("doc_id"), col("n_toks"),
      explode(col("toks")).as("tok"))
    time("toksRel count")(println("toks=" + toksRel.count()))
    val dfRel = toksRel.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("df").asc, col("tok").asc)
    val prefix = toksRel.join(dfRel, "tok")
      .withColumn("rn", row_number().over(wDoc))
      .filter(col("rn") <= col("n_toks") - expr("(4 * n_toks + 4) DIV 5") + 1)
      .select(col("tok"), col("doc_id").as("doc_a"), col("n_toks").as("na"))
    time("prefix noop")(prefix.write.format("noop").mode("overwrite").save())
    val postings = toksRel.select(col("tok").as("tok_b"),
      col("doc_id").as("doc_b"), col("n_toks").as("nb"))
    val cand0 = prefix.join(postings, col("tok") === col("tok_b") &&
      col("doc_a") =!= col("doc_b") &&
      col("nb") * 5 >= col("na") * 4)
      .select(col("doc_a"), col("doc_b"), col("na"), col("nb"))
    time("cand pre-distinct count")(println("cand0=" + cand0.count()))
    val cand = cand0.distinct()
    time("cand distinct count")(println("cand=" + cand.count()))
    val la = docs.select(col("doc_id").as("doc_a"), col("toks").as("toks_a"))
    val lb = docs.select(col("doc_id").as("doc_b"), col("toks").as("toks_b"))
    val ver = cand.join(la, "doc_a").join(lb, "doc_b")
      .withColumn("i", expr(
        "sorted_intersect_count_min(toks_a, toks_b, cast((4 * na + 4) div 5 AS int))"))
      .filter(col("i") * 5 >= col("na") * 4)
    time("verify noop")(ver.write.format("noop").mode("overwrite").save())
    time("full q146")(SparkEntry.queries("q146_containment_join")(spark, d)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
