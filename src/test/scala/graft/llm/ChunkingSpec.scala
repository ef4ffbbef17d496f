package graft.llm

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of [[Pipeline.chunked]] (q84): exact coverage of the token
  * stream, the overlap contract between consecutive chunks, the chunk-count
  * formula, and the shuffle-free plan shape that makes the operator safe at
  * any corpus size.
  */
class ChunkingSpec extends AnyFunSuite with SparkTestSession {

  private val d = "/root/testdata/sf0.001"
  private def docs = graft.Tables(spark, d, "documents")

  test("disjoint chunking (stride = size) reconstructs every document exactly") {
    val back = Pipeline.chunked(docs, chunkTokens = 24, stride = 24)
      .groupBy(col("doc_id"))
      .agg(array_join(flatten(array_sort(collect_list(
        struct(col("chunk_idx"), col("chunk_toks"))))
        .getField("chunk_toks")), " ").as("rebuilt"))
    val bad = back.join(docs, "doc_id")
      .filter(col("rebuilt") =!= col("text")).count()
    assert(bad === 0, "stride=size must partition the token stream losslessly")
  }

  test("consecutive overlapping chunks share exactly size-stride tokens") {
    val c = Pipeline.chunked(docs, chunkTokens = 32, stride = 24)
      .select(col("doc_id"), col("chunk_idx"), col("chunk_toks"))
      .collect()
      .groupBy(_.getLong(0)).values
    c.foreach { rows =>
      val byIdx = rows.sortBy(_.getLong(1)).map(_.getSeq[String](2)).toSeq
      byIdx.sliding(2).foreach {
        case Seq(a, b) if a.length == 32 =>
          assert(a.drop(24) == b.take(8),
            "chunk i's tail must equal chunk i+1's head (overlap 8)")
        case _ => () // short (last) chunk: no successor to overlap with
      }
    }
  }

  test("chunk count and sizes follow the exact formula; every token covered") {
    val got = Pipeline.chunked(docs, chunkTokens = 32, stride = 24)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(size(col("chunk_toks"))).as("tok_with_overlap"),
        max(col("n_tok")).as("n_tok"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (nChunks, tokWithOverlap, nTok) =
        (r.getLong(1), r.getLong(2), r.getLong(3))
      val expected = 1L + math.ceil(math.max(0L, nTok - 32) / 24.0).toLong
      assert(nChunks === expected, s"doc ${r.getLong(0)}: chunk-count formula")
      // covered tokens = emitted minus the 8-token overlap per seam
      assert(tokWithOverlap - 8 * (nChunks - 1) === nTok,
        s"doc ${r.getLong(0)}: chunks must cover all tokens exactly once " +
          "net of the per-seam overlap")
    }
  }

  test("chunking plans as a single scan with no shuffle") {
    val p = Pipeline.chunked(docs, 32, 24)
      .select(col("doc_id"), col("chunk_idx"), size(col("chunk_toks")))
      .queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(p).length === 1, s"one scan:\n$p")
    assert(!p.contains("Exchange"),
      s"per-row explode must not shuffle:\n$p")
    assert(p.contains("Generate"), s"expected a generator node:\n$p")
  }

  test("invalid parameters are refused") {
    intercept[IllegalArgumentException](Pipeline.chunked(docs, 0, 1))
    intercept[IllegalArgumentException](Pipeline.chunked(docs, 32, 0))
    intercept[IllegalArgumentException](Pipeline.chunked(docs, 32, 33))
  }
}
