package graft.llm

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data pipeline operators above the analysis layer: stable
  * hash-based dataset splits and context-window sequence packing. Both are
  * pure per-row expressions + keyed window/agg — fully distributed, and
  * deterministic across engines (md5-derived buckets, exact integer token
  * arithmetic), so both carry DuckDB oracles.
  */
object Pipeline {

  /** Tokens per packed context window (q54). */
  final val ContextTokens = 512

  val queries: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------------
    // q53: deterministic train/val/test split (80/10/10) by a stable
    // content-independent hash of the document id — md5-derived bucket, so
    // the assignment is reproducible across runs, engines and cluster
    // sizes (never use rand(): resampling on retry poisons eval sets).
    // Output is the per-split/lang audit a pipeline gates on.
    QueryDef.sql("q53_hash_split") { (s, d) =>
      val bucket =
        expr("cast(conv(substring(md5(cast(doc_id AS string)), 1, 8), 16, 10) AS bigint) % 100")
      Tables(s, d, "documents")
        .withColumn("split",
          when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))
        .groupBy(col("split"), col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          min(col("doc_id")).as("min_doc"),
          max(col("doc_id")).as("max_doc"))
        .orderBy("split", "lang")
    } {
      """WITH b AS (
        |  SELECT *, CAST(('0x' || SUBSTRING(MD5(CAST(doc_id AS VARCHAR)), 1, 8))
        |                 AS BIGINT) % 100 AS bucket
        |  FROM documents)
        |SELECT CASE WHEN bucket < 80 THEN 'train'
        |            WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
        |  lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
        |FROM b
        |GROUP BY 1, 2
        |ORDER BY split, lang""".stripMargin
    },

    // ------------------------------------------------------------------
    // q54: context-window sequence packing — documents are concatenated
    // in (lang, doc_id) order and chunked into fixed token windows; a doc
    // belongs to the window its first token lands in (running-sum
    // bucketing, the streaming-concat packing used for LM pretraining).
    // One sort per lang partition; at corpus scale the partition key
    // would be (lang, shard) so no partition outgrows a task.
    QueryDef.sql("q54_context_packing") { (s, d) =>
      val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, d, "documents")
        .withColumn("n_tok", size(split(col("text"), " ")))
        .withColumn("cum", sum(col("n_tok")).over(w))
        .withColumn("pack_id",
          floor((col("cum") - col("n_tok")) / ContextTokens).cast("long"))
        .groupBy(col("lang"), col("pack_id"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tok")).cast("long").as("n_tokens"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
        .orderBy("lang", "pack_id")
    } {
      s"""WITH t AS (
         |  SELECT lang, doc_id, CAST(LEN(STRING_SPLIT(text, ' ')) AS INT) AS n_tok
         |  FROM documents),
         |c AS (
         |  SELECT lang, doc_id, n_tok,
         |    SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
         |                     ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM t)
         |SELECT lang, CAST(FLOOR((cum - n_tok) / $ContextTokens) AS BIGINT) AS pack_id,
         |  COUNT(*) AS n_docs,
         |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
         |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
         |FROM c
         |GROUP BY 1, 2
         |ORDER BY lang, pack_id""".stripMargin
    }
  )
}
