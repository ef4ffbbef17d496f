package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** STANDING TRIPWIRE over every registered query's optimized plan: fail
  * on any rank/aggregate WINDOW whose partition key is DIMENSION-valued
  * (bounded cardinality — it does not grow with the data) while its
  * input is still fact/doc-grain. That shape caps a corpus-sized sort at
  * |dimension| tasks — the straggler rounds 13–15 kept finding by hand
  * (q349 → q342/q344/q348/q180/q198 → q222/q63/q71/q210); this gate
  * finds it at authoring time instead.
  *
  * Mechanics:
  *  - "dimension-valued" is MEASURED, not guessed: a per-(table, column)
  *    cardinality census over the sf0.001 AND sf0.01 fixtures classifies
  *    a column as dimension-valued iff distinct(sf0.01) ≤ 120 and it did
  *    not grow ≥ 3× across the 10× fixtures (user_id reads 15 → 150, so
  *    it is correctly fact-valued even though it is ≤ 120 at the small
  *    fixture). Window partition expressions are traced through
  *    Project/Aggregate aliases down to their base column; derived
  *    expressions (hash buckets, md5 keys, month() truncations) are
  *    untraceable and conservatively skipped — the gate is a net, not a
  *    proof.
  *  - "fact-grain" means a fact-table leaf is reachable from the
  *    window's child without crossing a grain-bounding node (Aggregate /
  *    Deduplicate / Limit / WindowGroupLimit). A rank window whose
  *    `rank <= k` filter was pushed as a WindowGroupLimit is therefore
  *    exempt automatically: its effective input is ≤ k·partitions rows.
  *  - the two-pass operators' own windows carry the __pid key (or read a
  *    __pid-bearing snapshot) and are exempt: their partition count IS
  *    cluster width, which scales with the cluster, not the dimension.
  *
  * The whitelist carries every exception WITH its justification; keep it
  * ≤ 5 entries — an entry that cannot justify itself in one sentence is
  * a migration ticket, not an exception.
  */
class LowCardWindowTripwireSpec extends AnyFunSuite with SparkTestSession {

  private val dSmall = "/root/testdata/sf0.001"
  private val dBig = "/root/testdata/sf0.01"

  /** Documented exceptions: query name → one-sentence justification. */
  private val whitelist: Map[String, String] = Map(
    "q54_context_packing" -> ("the GLOBAL-ORDER packing contract form: its header " +
      "documents q74's banded packedContexts as the production path and q71 " +
      "(two-pass) as the audited funnel; kept as the oracle-matched contract " +
      "statement (llm/Pipeline.scala q54 header)"),
    "q182_skyline_pareto" -> ("phase 2 of the two-phase skyline re-runs the " +
      "dominance windows GLOBALLY over the phase-1 survivor union, which is " +
      "bounded by <= 32 buckets x per-bucket skyline size (~log n each) — " +
      "the documented Borzsonyi two-phase shape; the data-sized windows are " +
      "the phase-1 BUCKETED ones, which pass (ops/Extended.scala q182 header). " +
      "A filter is not statically grain-bounding, so the net cannot see the " +
      "survivor bound")
  )

  private val factTables =
    Set("lineitem", "orders", "events", "documents", "embeddings",
      "customer", "supplier", "part")
  private val allTables = factTables ++ Set("nation", "region")

  /** Identify a leaf's fixture table by its signature columns. */
  private def tableOf(l: LeafNode): Option[String] = {
    val names = l.output.map(_.name).toSet
    if (names("l_orderkey")) Some("lineitem")
    else if (names("o_orderkey")) Some("orders")
    else if (names("c_custkey")) Some("customer")
    else if (names("s_suppkey")) Some("supplier")
    else if (names("p_partkey")) Some("part")
    else if (names("n_nationkey")) Some("nation")
    else if (names("r_regionkey")) Some("region")
    else if (names("event_id") || (names("event_type") && names("user_id")))
      Some("events")
    else if (names("doc_id") && names("text")) Some("documents")
    else if (names("vec_id")) Some("embeddings")
    else None
  }

  /** (table, column) → is dimension-valued, from the two-fixture census. */
  private lazy val dimCols: Set[(String, String)] = {
    def census(dir: String): Map[(String, String), Long] =
      allTables.flatMap { t =>
        val df = graft.Tables(spark, dir, t)
        val cols = df.schema.fields.filter(f => f.dataType match {
          case _: org.apache.spark.sql.types.ArrayType |
               _: org.apache.spark.sql.types.MapType |
               _: org.apache.spark.sql.types.StructType => false
          case _ => true
        }).map(_.name)
        if (cols.isEmpty) Nil
        else {
          val row = df.agg(
            count_distinct(col(cols.head)).as(cols.head),
            cols.tail.map(c => count_distinct(col(c)).as(c)): _*).head
          cols.zipWithIndex.map { case (c, i) => (t, c) -> row.getLong(i) }
        }
      }.toMap
    val small = census(dSmall)
    val big = census(dBig)
    big.collect {
      case (key, nBig)
        if nBig <= 120 && nBig < 3 * math.max(small.getOrElse(key, 1L), 1L) =>
        key
    }.toSet
  }

  /** Trace an attribute through aliases to its base (table, column). */
  private def originOf(a: Attribute, p: LogicalPlan): Option[(String, String)] =
    p match {
      case l: LeafNode =>
        if (l.output.exists(_.exprId == a.exprId))
          tableOf(l).map(t => (t, a.name))
        else None
      case proj: Project =>
        proj.projectList.find(_.exprId == a.exprId) match {
          case Some(al: Alias) => al.child match {
            case ar: Attribute => originOf(ar, proj.child)
            case _ => None
          }
          case Some(ar: AttributeReference) => originOf(ar, proj.child)
          case _ => None
        }
      case ag: Aggregate =>
        ag.aggregateExpressions.find(_.exprId == a.exprId) match {
          case Some(al: Alias) => al.child match {
            case ar: Attribute => originOf(ar, ag.child)
            case _ => None
          }
          case Some(ar: AttributeReference) => originOf(ar, ag.child)
          case _ => None
        }
      case g: Generate =>
        if (g.generatorOutput.exists(_.exprId == a.exprId)) None
        else originOf(a, g.child)
      case _: Union => None // positional lineage — conservative skip
      case other =>
        other.children.find(_.output.exists(_.exprId == a.exprId))
          .flatMap(c => originOf(a, c))
    }

  /** A fact-table leaf reachable without a grain-bounding node between. */
  private def unboundedFactBelow(p: LogicalPlan): Boolean = p match {
    case _: Aggregate | _: Deduplicate | _: GlobalLimit | _: LocalLimit |
         _: WindowGroupLimit => false
    case l: LeafNode =>
      // a __pid-bearing leaf is a two-pass frozen snapshot: its window
      // consumers partition by __pid (cluster width), not the dimension
      !l.output.exists(_.name == "__pid") && tableOf(l).exists(factTables)
    case other => other.children.exists(unboundedFactBelow)
  }

  private def isDimensionValued(e: Expression, child: LogicalPlan): Option[Boolean] =
    e match {
      case _: Literal => Some(true)
      case a: Attribute =>
        if (a.name == "__pid") Some(false)
        else originOf(a, child).map(dimCols.contains)
      case _ => None // derived partition key — unknowable, skip
    }

  test("no registered query windows a fact-grain input over a dimension-valued key") {
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
    val offenders = names.filterNot(whitelist.contains).flatMap { name =>
      val df = graft.SparkEntry.queries(name)(spark, dSmall)
      val plan = df.queryExecution.optimizedPlan
      val hits = plan.collect {
        // an EMPTY partition spec over fact-grain input is the worst
        // case of the same family (Exchange SinglePartition — ONE task
        // sorts the corpus); a dimension-valued key is its |dim|-task
        // sibling. Both flag; bounded/aggregated inputs never do.
        case w: Window
          if w.partitionSpec.forall(e =>
            isDimensionValued(e, w.child).contains(true)) &&
            unboundedFactBelow(w.child) =>
          val keys =
            if (w.partitionSpec.isEmpty) "<empty — single-task global window>"
            else w.partitionSpec.map(_.sql).mkString(", ")
          s"$name: window PARTITION BY ($keys) over a fact-grain input — " +
            "a |dimension|-task (or single-task) sort at scale; ride " +
            "Scale.groupedRank / groupedOrderedCumsum / globalRowNumber " +
            "(or whitelist with a justification)"
      }
      graft.Checkpoints.release(df)
      hits
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
    // the whitelist must not go stale: every entry still names a
    // registered query, and the list stays small enough to be honest
    val stale = whitelist.keys.filterNot(graft.SparkEntry.queries.contains)
    assert(stale.isEmpty, s"whitelist entries for unregistered queries: $stale")
    assert(whitelist.size <= 5, "the whitelist is a migration backlog, not a policy")
  }
}
