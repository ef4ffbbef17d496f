package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Composable quality-filter funnel audit — the per-stage attrition
  * report a pipeline publishes with every dataset build, as a library
  * API over ANY input frame (q64 is this applied to the documents
  * quality rules; q79 adds token mass).
  *
  * Stages are ordered `(name, keep)` predicates applied CUMULATIVELY: a
  * row survives stage i iff it passed stages 1..i. The audit runs in ONE
  * scan — every per-stage survival boolean is a row-local expression, the
  * counts collapse into a single global aggregation (partial map-side,
  * one exchange of one row), and the per-stage report rows are exploded
  * from that single aggregate row. Row count is irrelevant to cost at
  * 100 TB beyond the scan itself: nothing shuffles but one aggregate.
  *
  * `massCol` optionally tracks a conserved quantity (token counts, byte
  * sizes) through the funnel: `m_in`/`m_out` per stage. It must be
  * EXACT-typed or integer-valued (it is summed as int64 — the overflow
  * bound binds the global total; a 6e11-row corpus of ≤1e5-token docs
  * stays under 2^63 with 150× headroom).
  */
object Funnel {

  def audit(
      df: DataFrame,
      stages: Seq[(String, Column)],
      massCol: Option[Column] = None): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    // cumulative survival: s_i = s_1 && ... && pred_i
    val cum = stages.map(_._2).scanLeft(lit(true))(_ && _).tail
    val counts: Seq[Column] =
      count(lit(1)).as("n0") +: cum.zipWithIndex.map { case (c, i) =>
        count(when(c, 1)).as(s"n${i + 1}")
      }
    val masses: Seq[Column] = massCol.toSeq.flatMap { m =>
      sum(m.cast("long")).as("m0") +: cum.zipWithIndex.map { case (c, i) =>
        sum(when(c, m.cast("long")).otherwise(0L)).as(s"m${i + 1}")
      }
    }
    val aggCols = counts ++ masses
    val agg = df.agg(aggCols.head, aggCols.tail: _*)
    val structs = stages.zipWithIndex.map { case ((name, _), i) =>
      val quoted = name.replace("\\", "\\\\").replace("'", "\\'")
      val mass = if (massCol.isDefined) s", m$i AS m_in, m${i + 1} AS m_out" else ""
      s"struct(${i + 1} AS stage, '$quoted' AS name, n$i AS n_in, n${i + 1} AS n_out$mass)"
    }.mkString("array(\n", ",\n", ")")
    val reportCols = Seq(
      col("st.stage"), col("st.name"), col("st.n_in"), col("st.n_out"),
      // NULL (not NaN) on an empty stage: Spark's double 0/0 is NaN
      // where DuckDB's is NULL — align on SQL semantics explicitly
      when(col("st.n_in") === 0, lit(null).cast("double"))
        .otherwise(col("st.n_out").cast("double") / col("st.n_in"))
        .as("retention")) ++
      (if (massCol.isDefined) Seq(col("st.m_in"), col("st.m_out")) else Nil)
    agg.select(explode(expr(structs)).as("st"))
      .select(reportCols: _*)
      .orderBy("stage")
  }
}
