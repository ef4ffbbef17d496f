package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale tooling for the 100 TB posture (SURVEY §7.4): explicit skew
  * mitigation for joins whose hot keys overwhelm AQE's skew splitting.
  */
object Scale {

  /** Salted equi-join for skewed keys: the left (large, skewed) side gets a
    * deterministic salt derived from a high-cardinality column; the right
    * side is replicated `saltFactor` times so every (key, salt) bucket can
    * join locally. Result equals the plain inner join, but a hot key's rows
    * spread over `saltFactor` tasks instead of one straggler.
    *
    * The salt is derived (hash of a disambiguating column), not random —
    * plans stay deterministic and re-executable (speculative retries see
    * the same rows).
    */
  def saltedJoin(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      saltCol: Column, saltFactor: Int): DataFrame = {
    require(saltFactor > 0)
    val salted = left.withColumn("__salt", pmod(hash(saltCol), lit(saltFactor)))
    val replicated = right
      .withColumn("__salt", explode(expr(s"sequence(0, ${saltFactor - 1})")))
    salted
      .join(replicated, salted(leftKey) === replicated(rightKey) &&
        salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }

  /** The q349 census' salt heuristic for ONE join key, as a driver-side
    * decision value: ceil(max_fanout / p99_fanout) over the key-count
    * relation, 1 when the top key is within ordinary-key range (no
    * salting needed). The reference rank is ⌈0.99·n⌉ CLIPPED to n−1:
    * for n < 100 distinct keys the unclipped q349 convention gives
    * rank n — the maximum itself — so max/p99 would read 1 on exactly
    * the classic low-cardinality hot-key shape (50 keys, one holding
    * 99% of rows) that salting exists to fix; the clip makes the
    * reference the largest NON-max key there while changing nothing
    * for n ≥ 101 (q349 the census still REPORTS the unclipped
    * statistic — this is the decision rule, not the report). A
    * single-key relation (n = 1) has no ordinary-key reference and
    * returns 1 — callers joining on a known-constant key should pass
    * an explicit factor to [[saltedJoin]]. The rank is the EXACT order
    * statistic via the two-pass [[globalRowNumber]] range-shuffle
    * rank — the profiler input is the skewed table itself, so its own
    * plan must not hinge on a single-task sort. Cost: one shrinking
    * keyed count + the two-pass rank over the DISTINCT-key relation;
    * the frozen snapshot is released before returning.
    */
  def suggestedSalt(df: DataFrame, key: String): Int = {
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("c"))
    val n = counts.count()
    if (n <= 1) 1
    else {
      val ranked = globalRowNumber(counts, "rn", col("c").asc, col(key).asc)
      val k = math.min(math.ceil(0.99 * n).toLong, n - 1)
      val row = ranked.agg(
        max(col("c")).as("mx"),
        max(when(col("rn") === k, col("c"))).as("p99")).head
      graft.Checkpoints.release(ranked)
      val p99 = math.max(row.getLong(1), 1L)
      math.max(1L, math.ceil(row.getLong(0).toDouble / p99).toLong).toInt
    }
  }

  /** Join-key fan-out census for ARBITRARY candidate keys — q349's
    * relation as a reusable operator: per key column, the exact
    * key-count distribution summary (distinct keys, row count,
    * mean/p50/p99/max fan-out, skew factor, and the raw ⌈0.99·n⌉-rank
    * salt suggestion — [[suggestedSalt]] is the clipped DECISION form).
    * One pass over `df` exploding each row into its |keys| (name, key)
    * pairs → keyed counts (map-side combine shrinks to distinct keys
    * immediately) → the two-pass [[groupedRank]] over the key-count
    * relation (|keys| groups would otherwise cap the sort at |keys|
    * tasks) → |keys| summary rows. An all-integral key set is read as
    * int64 (the join-key domain every fixture fact schema uses); other
    * atomic types keep their identity via an injective string rendering
    * (see the body note); non-atomic key columns are rejected.
    */
  def fanoutCensus(df: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty)
    // Key representation: an all-integral key set keeps the native int64
    // domain (the join-key shape every fixture fact schema uses — the
    // cheapest shuffle key). Any other ATOMIC type is rendered to its
    // string form (hex for binary) — injective per column, so the
    // grouped counts equal native grouping — instead of the previous
    // cast("long"), which silently turned a string key into one NULL
    // key and reported a plausible-looking but wrong census
    // (max_fanout = table size). Non-atomic keys are rejected: a
    // join-key census over an array/struct column has no meaning here.
    import org.apache.spark.sql.types._
    val integral = keys.forall(k => df.schema(k).dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    })
    def rep(k: String): Column =
      if (integral) col(k).cast("long")
      else df.schema(k).dataType match {
        case BinaryType => hex(col(k))
        // add +0.0 first: Spark's grouping/join semantics normalize
        // -0.0 to 0.0 (NormalizeFloatingNumbers), but their STRING
        // forms differ — without the normalization the census would
        // split one join key's fan-out across two rows and understate
        // max_fanout for exactly the hot-key case it measures
        case FloatType | DoubleType =>
          (col(k).cast("double") + lit(0.0)).cast("string")
        case _: ArrayType | _: MapType | _: StructType =>
          throw new IllegalArgumentException(
            s"fanoutCensus: key column $k has non-atomic type " +
              s"${df.schema(k).dataType.simpleString}; a join-key census " +
              "is defined over atomic key types only")
        case _ => col(k).cast("string")
      }
    val keyed = df
      .select(explode(array(keys.map(k =>
        struct(lit(k).as("jk"), rep(k).as("k"))): _*)).as("e"))
      .select(col("e.jk").as("jk"), col("e.k").as("k"))
      .groupBy(col("jk"), col("k"))
      .agg(count(lit(1)).as("c"))
    // rank ties on c are value-safe: p50/p99 read the VALUE at a rank,
    // identical under any tie-break (groupedRank's contract)
    val ranked = groupedRank(keyed, Seq("jk"), "rn", Some("nk"), col("c"))
    val p50 = max(when(col("rn") ===
      floor((col("nk") + lit(1L)).cast("double") / lit(2.0)).cast("long"),
      col("c")))
    val p99 = max(when(col("rn") ===
      ceil(col("nk").cast("double") * lit(0.99)).cast("long"), col("c")))
    ranked.groupBy(col("jk"))
      .agg(max(col("nk")).as("n_keys"), sum(col("c")).as("n_rows"),
        max(col("c")).as("max_fanout"),
        p50.as("p50_fanout"), p99.as("p99_fanout"))
      .select(col("jk").as("join_key"), col("n_keys"), col("n_rows"),
        (col("n_rows").cast("double") / col("n_keys").cast("double"))
          .as("mean_fanout"),
        col("p50_fanout"), col("p99_fanout"), col("max_fanout"),
        (col("max_fanout").cast("double") * col("n_keys").cast("double") /
          col("n_rows").cast("double")).as("skew_factor"),
        greatest(lit(1L),
          ceil(col("max_fanout").cast("double") /
            greatest(col("p99_fanout"), lit(1L)).cast("double"))
            .cast("long")).as("suggested_salt"))
      .orderBy("join_key")
  }

  /** Skew-adaptive equi-join — the census (q349) and the remedy
    * ([[saltedJoin]], q97) closed into one operator: profile the left
    * (large, potentially skewed) side's join-key fan-out, then salt
    * with the suggested factor ONLY when the profile says the top key
    * overwhelms an ordinary one (suggested salt > 1, capped at
    * `saltCap` so a pathological profile cannot explode the right
    * side's replication). A uniform fan-out plans the PLAIN join —
    * answer-identical either way (q97's oracle argument), so the
    * profile affects only the physical shape. Use when the key
    * distribution is unknown at authoring time and AQE's skew split
    * can't kick in (broadcast-ineligible dimension, pre-AQE
    * materialization); the profile pass costs one keyed count over the
    * fact side, the price of not guessing.
    */
  def autoSaltedJoin(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      saltCol: Column, saltCap: Int = 64): DataFrame = {
    require(saltCap > 0)
    val s = math.min(suggestedSalt(left, leftKey), saltCap)
    if (s <= 1) left.join(right, left(leftKey) === right(rightKey))
    else saltedJoin(left, right, leftKey, rightKey, saltCol, s)
  }

  /** Write `df` as a bucketed (and per-bucket sorted) table: rows are
    * hash-partitioned into `buckets` files per partition on `keys`, which
    * lets every later equi-join or aggregation on those keys skip its
    * shuffle exchange entirely (see [[bucketedJoin]]). This is THE tool
    * for the repeated-large-dim-join workload a 100 TB warehouse lives
    * on: pay one shuffle at write time, join exchange-free forever after.
    *
    * Bucket counts should match between join sides (Spark can coalesce
    * compatible multiples, but equal counts avoid the planner caveats);
    * size them so a bucket's data fits one task (~128–512 MB each).
    */
  def bucketedWrite(
      df: DataFrame, table: String, buckets: Int, keys: String*): Unit = {
    require(keys.nonEmpty && buckets > 0)
    df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
  }

  /** Hive-style partitioned layout write — the directory-level
    * counterpart to [[bucketedWrite]]: rows land under
    * `path/col=value/...` directories, so any later filter on the
    * partition columns prunes whole directories at PLAN time (the scan's
    * `PartitionFilters` — spec-asserted), before a single byte is read.
    * This is how a 100 TB corpus makes `lang = 'en'` or a date-range
    * predicate cost only the slice it selects.
    *
    * `sortCols` additionally sorts within each written file, tightening
    * parquet min/max row-group statistics so non-partition predicates
    * skip row groups too. Partition columns should be LOW-cardinality
    * (bounded directory count); high-cardinality keys belong in
    * [[bucketedWrite]] buckets instead.
    *
    * The pre-write shuffle is a RANGE repartition on
    * (partitionCols ++ sortCols): it clusters rows by directory (no
    * tasks×values small-file explosion) while a HOT partition value
    * still spreads across many tasks via the sort-column ranges — a
    * plain hash repartition on the partition columns would funnel the
    * dominant value (think `lang = 'en'` over most of a corpus) into
    * one straggler task. With no `sortCols` the hot value IS one task
    * per value — pass a spread column as `sortCols` for skewed layouts.
    */
  def layoutWrite(
      df: DataFrame, path: String,
      partitionCols: Seq[String], sortCols: Seq[String] = Nil): Unit = {
    require(partitionCols.nonEmpty)
    val keys = (partitionCols ++ sortCols).map(col)
    val arranged = df.repartitionByRange(keys: _*).sortWithinPartitions(keys: _*)
    arranged.write.mode("overwrite")
      .partitionBy(partitionCols: _*).parquet(path)
  }

  /** Global row numbering at scale — the two-pass shape q48's scale
    * contract calls for, as a real operator: a total order over the
    * whole dataset without the single-task global window
    * (`Window.orderBy` with no partition key collapses everything into
    * ONE task — the plan shows `Exchange SinglePartition`).
    *
    * Pass 1 range-repartitions on the order columns, so partitions hold
    * disjoint key ranges and ordering within+across partitions composes;
    * a cheap count per partition (≤ `spark.sql.shuffle.partitions` rows
    * to the driver) yields each partition's global offset. Pass 2 ranks
    * within each partition (one task per partition, all parallel) and
    * adds the broadcast offset. Equals the single-partition
    * `row_number()` over the same order — spec-asserted — at the cost of
    * one materialization of the ranged dataset (executor-local storage,
    * like a checkpointed staging table; at 100 TB, trade it against a
    * straggler task sorting the whole table). `order` must be a TOTAL
    * order (include a tie-break column) or ranks within a tie group are
    * partition-placement-dependent.
    *
    * Storage contract: the checkpoint stays pinned in executor storage
    * until released — after consuming the result (write/collect), call
    * `graft.Checkpoints.release(result)` to free it (the checkpointed
    * leaf rides inside the returned frame's plan). Skipping the release
    * leaks one materialized copy per call until session end.
    */
  def globalRowNumber(
      df: DataFrame, rankName: String, order: Column*): DataFrame = {
    // row_number over a total order IS the running count of an all-ones
    // column — delegate to the generalized prefix aggregation
    val one = "__grn_one"
    globalOrderedCumsum(df.withColumn(one, lit(1L)), one, one + "_cum",
      rankName, order: _*)
      .drop(one, one + "_cum")
  }

  /** Global ordered prefix sum (+ rank) at scale: for each row, the
    * running total of `valueCol` over the TOTAL order given by `order`,
    * without the single-task global window (`Window.orderBy` with no
    * partition key = `Exchange SinglePartition` = one task sorts the
    * world). This is the coverage-curve / quantile-boundary / CDF shape:
    * "how many tokens does the top-k vocabulary cover" (q78), "which
    * prefix of the corpus reaches N tokens".
    *
    * Two passes over one frozen range shuffle: pass 1
    * range-repartitions on `order` (disjoint key ranges per partition)
    * and aggregates each partition's value sum + row count (≤
    * `spark.sql.shuffle.partitions` rows to the driver); pass 2 runs
    * the running sum + row_number within each partition in parallel and
    * adds the broadcast prefix offsets. Equals the single-partition
    * window — spec-asserted.
    *
    * Freeze rationale: RangePartitioner's sample seed derives from the
    * RDD id, so re-executing the lineage in a second job can pick
    * DIFFERENT boundaries — pass-1 offsets would then misalign with
    * pass-2 partitions (observed as overlapping ranks). The LAZY
    * localCheckpoint pins partition membership at the first action (the
    * pass-1 partition-aggregate collect materializes the snapshot as it
    * streams through); both passes read the same frozen partitions, and
    * a lost block fails loudly instead of silently recomputing new
    * boundaries.
    *
    * Contracts: `valueCol` must be EXACT-typed (integral/decimal — a
    * double's running sum is order-of-addition-dependent and not
    * engine-reproducible); sums are accumulated as int64 (the int64
    * overflow bound binds the GLOBAL total here, not per group). `order`
    * must be a total order (include a tie-break column). Storage: as
    * with [[globalRowNumber]], call `graft.Checkpoints.release(result)`
    * after consuming the result, or the frozen snapshot stays pinned.
    */
  def globalOrderedCumsum(
      df: DataFrame, valueCol: String, cumName: String, rankName: String,
      order: Column*): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(order.nonEmpty)
    val spark = df.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // LAZY freeze (round 16, guide §1.2/§2.4 — the twoPassGrouped job
    // economics applied here too): the per-partition offset aggregation
    // below is the FIRST action over the snapshot, so its shuffle-map
    // stage materializes every partition and local-checkpoint
    // finalization backfills any skipped ones — one scheduled job per
    // operator call instead of a dedicated eager materialization pass
    // followed by a re-read. The freeze contract is unchanged: ONE RDD
    // instance backs both consumers, so RangePartitioner boundaries are
    // sampled exactly once.
    val ranged = graft.Checkpoints.checkpointLazy(
      df.repartitionByRange(parts, order: _*)
        .withColumn("__pid", spark_partition_id()))
    val partAgg = ranged.groupBy(col("__pid"))
      .agg(sum(col(valueCol).cast("long")).as("s"), count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val offsets = (0 until parts).map { p =>
      val prior = (0 until p).map(partAgg.getOrElse(_, (0L, 0L)))
      (p, prior.map(_._1).sum, prior.map(_._2).sum)
    }
    import spark.implicits._
    val offsetDf = offsets.toDF("__pid", "__sbase", "__nbase")
    val w = Window.partitionBy(col("__pid")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged.join(broadcast(offsetDf), "__pid")
      .withColumn(cumName,
        sum(col(valueCol).cast("long")).over(w) + col("__sbase"))
      .withColumn(rankName, row_number().over(w).cast("long") + col("__nbase"))
      .drop("__pid", "__sbase", "__nbase")
  }

  /** GROUPED row numbering at scale — [[globalRowNumber]]'s two-pass
    * range-shuffle rank applied PER GROUP: `row_number() OVER
    * (PARTITION BY groupCols ORDER BY order)` without a single task per
    * group. A plain keyed window gives one task per group value, so a
    * 2-value key (q349's join-key census) or a 25-nation partition caps
    * the sort of a corpus-sized relation at 2- or 25-way parallelism —
    * exactly the shape this helper exists to retire.
    *
    * Pass 1 range-repartitions on (groupCols ++ order): partitions hold
    * disjoint (group, order) ranges, so a heavy group SPANS many
    * partitions while ranks still compose across them. The per-(pid,
    * group) cell counts (≤ partitions × |groups| rows — metadata-sized
    * for the low-cardinality-group / large-group regime this serves)
    * yield each cell's per-group offset via a prefix window over that
    * tiny relation — never a driver collect. Pass 2 ranks within each
    * (pid, group) cell — parallelism = occupied cells, i.e. cluster
    * width even when ONE group holds all rows — and adds the
    * broadcast-joined offset.
    *
    * Contracts: for exact row_number parity `order` must be a TOTAL
    * order within a group (include a tie-break); callers that only read
    * the VALUE at a rank (medians, winsorization caps, Gini's Σi·x) are
    * tie-safe, because the value at rank k of a sorted multiset does
    * not depend on how row_number broke ties. `countName`, when given,
    * adds each group's total row count (the `COUNT(*) OVER (PARTITION
    * BY groupCols)` companion every order-statistic picker needs).
    * Group cardinality must be modest (the offsets relation is
    * broadcast); the many-small-groups regime belongs to the plain
    * keyed window, which is already parallel there — ENFORCED: the plan
    * raises an actionable error past [[DefaultMaxCells]] cells (an
    * overload takes an explicit ceiling). NULL group values are real
    * groups (null-safe join-back), matching the keyed window it
    * replaces. Storage: the ranged
    * relation is a frozen snapshot (the [[globalOrderedCumsum]] freeze
    * rationale — RangePartitioner boundaries are lineage-unstable);
    * call `graft.Checkpoints.release(result)` after consuming.
    */
  def groupedRank(
      df: DataFrame, groupCols: Seq[String], rankName: String,
      countName: Option[String], order: Column*): DataFrame =
    twoPassGrouped(df, groupCols, order, None, Some(rankName), countName,
      DefaultMaxCells)

  /** [[groupedRank]] with an explicit offsets-relation ceiling — see
    * [[DefaultMaxCells]] for what the ceiling protects.
    */
  def groupedRank(
      df: DataFrame, groupCols: Seq[String], rankName: String,
      countName: Option[String], maxCells: Long, order: Column*): DataFrame =
    twoPassGrouped(df, groupCols, order, None, Some(rankName), countName,
      maxCells)

  /** GROUPED ordered prefix sum at scale — [[globalOrderedCumsum]]'s
    * per-group sibling, by the same per-(pid, group) cell-offset trick
    * [[groupedRank]] uses: `SUM(valueCol) OVER (PARTITION BY groupCols
    * ORDER BY order ROWS UNBOUNDED PRECEDING)` without one task per
    * group value. A per-lang running token sum over a whole corpus is
    * the motivating shape (q71's packing stage): a plain keyed window
    * caps its parallelism at |langs| tasks each summing a corpus.
    *
    * Pass 1 range-partitions on (groupCols ++ order) and aggregates each
    * (pid, group) cell's value sum + row count; the per-group prefix
    * over earlier pids (a window over the metadata-sized cell relation)
    * is each cell's starting offset. Pass 2 runs the running sum within
    * each cell — parallelism = occupied cells — and adds the
    * broadcast-joined offset. `rankName`, when given, also emits the
    * per-group row number (one window serves both).
    *
    * Contracts are [[groupedRank]]'s (total order within a group for
    * exact parity, modest group cardinality guarded by
    * [[DefaultMaxCells]], NULL group values kept via the null-safe
    * join-back, release the frozen snapshot after consuming) plus
    * [[globalOrderedCumsum]]'s value contract: `valueCol` must be
    * EXACT-typed — sums accumulate as int64, and the overflow bound
    * binds per GROUP total.
    */
  def groupedOrderedCumsum(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      cumName: String, rankName: Option[String], order: Column*): DataFrame =
    twoPassGrouped(df, groupCols, order, Some((valueCol, cumName)), rankName,
      None, DefaultMaxCells)

  /** Ceiling on the per-(partition, group) offsets relation the grouped
    * two-pass operators broadcast: |occupied cells| ≤ shuffle.partitions
    * × |groups|. At the default (2^20 rows ≈ tens of MB of (pid, group,
    * offset) triples) the broadcast is safely driver- and
    * executor-resident; past it the caller is in the many-small-groups
    * regime, where the plain keyed window is already parallel and is
    * the documented tool — the operators BOUND the cell relation
    * (a `limit(maxCells + 1)` on its one aggregation job) and FALL
    * BACK to that plain keyed window (logged to stderr) instead of
    * the broadcast OOM / silent plan inversion a breach used to
    * produce. The bound costs no extra pass: the same collect that
    * fetches the cells for the driver-side offset prefix detects the
    * breach, and the ceiling is exactly the driver-residency bound
    * the broadcast itself would impose.
    */
  val DefaultMaxCells: Long = 1L << 20

  /** The shared two-pass range-shuffle core behind [[groupedRank]] and
    * [[groupedOrderedCumsum]] — one frozen range repartition on
    * (groupCols ++ order), per-(pid, group) cell aggregates collected
    * to the driver (bounded by `maxCells`), driver-computed per-group
    * prefix offsets, and a broadcast join-back of the local offsets
    * relation.
    *
    * Freeze rationale (why the checkpoint cannot be skipped even for a
    * deterministic one-scan input): the cell relation and the
    * join-back consume the SAME range shuffle twice. Unfrozen, the two
    * consumers are two physical exchange instances whose
    * RangePartitioner boundaries are SAMPLED INDEPENDENTLY — only
    * Spark's ReuseExchange optimization happens to unify identical
    * subtrees, and it is an optimization, not a contract (AQE
    * re-planning can split them again). Misaligned boundaries silently
    * corrupt every offset, so correctness must not hinge on a rule
    * firing; the checkpoint pins one physical set of partitions for
    * both passes and fails loudly if a block is lost.
    *
    * Job economics (the round-15 verdict's fixture-scale-constant
    * finding): the checkpoint is LAZY — Spark's local-checkpoint
    * finalization persists partitions during the FIRST job that
    * computes them and backfills any a partial action skipped
    * (`LocalRDDCheckpointData.doCheckpoint` runs a fill-in job for
    * missing partitions), so the cell aggregation below doubles as the
    * materialization pass instead of paying a dedicated count job
    * first. The cell relation itself is never checkpointed or
    * re-aggregated: ONE bounded collect fetches it, the offsets are
    * integer prefix sums over ≤ maxCells driver rows, and the offsets
    * ship back as a broadcast-hinted local relation — the same bytes
    * the old broadcast already collected to the driver, minus two
    * scheduled jobs and a window stage per operator call.
    */
  private def twoPassGrouped(
      df: DataFrame, groupCols: Seq[String], order: Seq[Column],
      cum: Option[(String, String)], rankName: Option[String],
      countName: Option[String], maxCells: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(groupCols.nonEmpty && order.nonEmpty)
    require(maxCells > 0)
    cum.foreach { case (v, _) =>
      import org.apache.spark.sql.types._
      val dt = df.schema(v).dataType
      // the EXACT-typed contract, enforced: sums accumulate as int64,
      // and a silent cast("long") on a fractional valueCol would
      // truncate per-row instead of failing — diverging from the keyed
      // window this operator claims parity with
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
        s"groupedOrderedCumsum value column '$v' must be integral " +
          s"(sums accumulate exactly as int64), got $dt; cast explicitly " +
          "upstream if truncation is intended")
    }
    val spark = df.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val gcols = groupCols.map(col)
    val outCols =
      (df.columns.toSeq ++ countName ++ cum.map(_._2) ++ rankName).map(col)
    // LAZY freeze: the cell aggregation's shuffle-map stage computes —
    // and therefore persists — every snapshot partition, so it IS the
    // materialization job (doc above); no dedicated eager-count pass
    val ranged = graft.Checkpoints.checkpointLazy(
      df.repartitionByRange(parts, gcols ++ order: _*)
        .withColumn("__pid", spark_partition_id()))
    val cellAggs = count(lit(1)).as("__cn") +:
      cum.toSeq.map { case (v, _) => sum(col(v).cast("long")).as("__cs") }
    // ONE driver-bounded job replaces the round-15 cells checkpoint +
    // count() pair: collect the (pid, group) cell aggregates, capped at
    // maxCells + 1 rows so a contract breach is detected BEFORE the
    // driver holds more than the broadcast-residency bound — the exact
    // bytes the old plan's broadcast collection already shipped to the
    // driver, fetched once instead of checkpoint + count + re-read
    val cap = math.min(maxCells, Int.MaxValue - 2L).toInt
    val cellRows = ranged.groupBy(col("__pid") +: gcols: _*)
      .agg(cellAggs.head, cellAggs.tail: _*)
      .limit(cap + 1).collect()
    if (cellRows.length > cap) {
      // many-small-groups regime: the offsets relation would not
      // broadcast. The plain keyed window is the documented — and
      // already parallel — plan there; fall back to it, loudly.
      graft.Checkpoints.release(ranged)
      System.err.println(
        s"[graft.Scale] grouped two-pass on (${groupCols.mkString(", ")}): " +
          s"more than maxCells=$maxCells (pid, group) cells — many small " +
          "groups; falling back to the plain keyed window (parallel in " +
          "this regime)")
      val wPlain = Window.partitionBy(gcols: _*).orderBy(order: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val withCountP = countName.fold(df) { n =>
        df.withColumn(n,
          count(lit(1)).over(Window.partitionBy(gcols: _*)))
      }
      val withCumP = cum.fold(withCountP) { case (v, cn) =>
        withCountP.withColumn(cn, sum(col(v).cast("long")).over(wPlain))
      }
      val withRankP = rankName.fold(withCumP) { rn =>
        withCumP.withColumn(rn, row_number().over(wPlain).cast("long"))
      }
      withRankP.select(outCols: _*)
    } else {
      // for a fixed group, pid order IS order-column order (range
      // partitioning on group-then-order), so the prefix over earlier
      // pids is exactly the rows/mass ranking below this cell. The
      // prefix is integer arithmetic over ≤ maxCells collected rows —
      // driver-side plain Scala, zero scheduled jobs (driver-bounded by
      // the same contract that makes the join-back broadcastable).
      // Cell-row layout from the aggregation: (__pid, groupCols..., __cn
      // [, __cs]).
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
      val cnIdx = 1 + groupCols.size
      val csIdx = cnIdx + 1
      // binary group keys collect as Array[Byte] (reference equality) —
      // key on a value-equal view; all other externals (boxed
      // primitives, String, Row, Seq, Date/Timestamp) compare by value,
      // and float keys are already NaN/-0.0-normalized by the upstream
      // Spark aggregation
      def groupKey(r: Row): IndexedSeq[Any] =
        groupCols.indices.map(i => r.get(i + 1) match {
          case b: Array[Byte] => b.toSeq
          case x => x
        })
      val offRows = new java.util.ArrayList[Row](cellRows.length)
      cellRows.groupBy(groupKey).valuesIterator.foreach { cells =>
        val sorted = cells.sortBy(_.getInt(0))
        val tot = sorted.iterator.map(_.getLong(cnIdx)).sum
        var nb = 0L
        var sb = 0L
        sorted.foreach { r =>
          val base = r.get(0) +: groupCols.indices.map(i => r.get(i + 1))
          val extra = countName.map(_ => tot).toSeq ++
            cum.map(_ => sb).toSeq :+ nb
          offRows.add(Row.fromSeq(base ++ extra))
          nb += r.getLong(cnIdx)
          // sum() skips NULLs: an all-null cell contributes nothing to
          // the running-sum base, matching the keyed window
          if (cum.isDefined && !r.isNullAt(csIdx)) sb += r.getLong(csIdx)
        }
      }
      // group-col fields keep their aggregated types exactly (the <=>
      // join-back must not see a type change); __pid is IntegerType
      // (spark_partition_id's type)
      val gFields = groupCols.zipWithIndex.map { case (g, i) =>
        ranged.schema(g).copy(name = s"__off_$g")
      }
      val offSchema = StructType(
        (StructField("__off___pid", IntegerType, nullable = false) +:
          gFields) ++
          countName.map(n => StructField(n, LongType, nullable = false)) ++
          cum.map(_ => StructField("__sbase", LongType, nullable = false)) :+
          StructField("__nbase", LongType, nullable = false))
      // join-back under NULL-SAFE group equality: a NULL group value is
      // a real group to the keyed window this operator replaces, and a
      // plain equi-join would silently drop its rows
      val off = spark.createDataFrame(offRows, offSchema)
      val cond = (col("__pid") === col("__off___pid")) &&
        groupCols.map(g => col(g) <=> col(s"__off_$g")).reduce(_ && _)
      val wCell = Window.partitionBy(col("__pid") +: gcols: _*)
        .orderBy(order: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val joined = ranged.join(broadcast(off), cond)
      val withCum = cum.fold(joined) { case (v, cn) =>
        joined.withColumn(cn,
          sum(col(v).cast("long")).over(wCell) + col("__sbase"))
      }
      val withRank = rankName.fold(withCum) { rn =>
        withCum.withColumn(rn,
          row_number().over(wCell).cast("long") + col("__nbase"))
      }
      withRank.select(outCols: _*)
    }
  }

  /** EXACT global quantiles at any scale — the scale-correct answer to
    * the caveat on q57's per-group exact percentiles: Spark's exact
    * `percentile` buffers and sorts EVERY value of a group inside one
    * aggregation buffer, which cannot hold a corpus-scale distribution.
    * Here the R-7 order statistics come from the [[globalRowNumber]]
    * two-pass frozen range shuffle instead: rank every row by value
    * (distributed range sort — no single task ever sees more than its
    * partition), then pick the ≤ 2·|fractions| rows whose global rank
    * hits an interpolation endpoint (a broadcast join with the tiny
    * fraction relation — the rank filter runs scan-side) and fold them
    * into x_lo + (x_hi − x_lo)·frac, the same R-7 formula `percentile`
    * and DuckDB's QUANTILE_CONT share.
    *
    * Exactness: h = (n−1)p + 1 is a product of an exact integer and an
    * exact binary fraction — for the p = k/2^m fractions used in
    * practice every term (h, w, the interpolation) is exact in binary,
    * so results hash-match engines on integer-valued data (q57's
    * argument). NULL semantics match `percentile`/QUANTILE_CONT: null
    * values are excluded before ranking, and an all-null (or empty)
    * input yields one NULL-quantile row per fraction rather than zero
    * rows. Storage: the ranked relation is a frozen snapshot —
    * call `graft.Checkpoints.release(result)` after consuming, as with
    * [[globalRowNumber]].
    */
  def exactQuantiles(
      df: DataFrame, valueCol: String, fractions: Seq[Double]): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(p => p >= 0 && p <= 1),
      s"fractions must be within [0, 1] (got $fractions)")
    val spark = df.sparkSession
    import spark.implicits._
    val ranked = globalRowNumber(
      df.select(col(valueCol).cast("double").as("__v"))
        .filter(col("__v").isNotNull), "__rnk",
      col("__v").asc)
    val total = ranked.agg(count(lit(1)).as("__n"))
    val fr = fractions.toDF("p")
      .crossJoin(broadcast(total))
      .withColumn("__h", (col("__n") - 1) * col("p") + 1)
      .withColumn("__lo", floor(col("__h")).cast("long"))
      .withColumn("__hi", ceil(col("__h")).cast("long"))
      .withColumn("__w", col("__h") - col("__lo"))
    val picked = ranked
      .join(broadcast(fr),
        col("__rnk") === col("__lo") || col("__rnk") === col("__hi"))
      .groupBy(col("p"), col("__w"))
      .agg(
        min(when(col("__rnk") === col("__lo"), col("__v"))).as("__vlo"),
        min(when(col("__rnk") === col("__hi"), col("__v"))).as("__vhi"))
    // left join from the fraction relation: an empty/all-null input
    // still yields one row per fraction, with a NULL quantile
    fr.select(col("p"), col("__w"))
      .join(picked, Seq("p", "__w"), "left_outer")
      .withColumn("quantile",
        col("__vlo") + (col("__vhi") - col("__vlo")) * col("__w"))
      .select(col("p"), col("quantile"))
      .orderBy("p")
  }

  /** NTILE(k) recomposed from a row number and its group count — the
    * standard's fill rule (the first n mod k tiles take ⌈n/k⌉ rows, the
    * rest ⌊n/k⌋) in pure integer `div` arithmetic, no FP anywhere near
    * a tile boundary: with q = n div k and rem = n mod k,
    *   tile(r) = ⌈r/(q+1)⌉                    for r ≤ (q+1)·rem
    *           = rem + ⌈(r − (q+1)·rem)/q⌉    otherwise,
    * and n < k degenerates to tile = r (one row per tile — NTILE's
    * rule). This is what lets an NTILE ride [[groupedRank]] instead of
    * a one-task-per-group window (q198); equality with Spark's own
    * `ntile` across every (n, k) shape is spec-pinned, and q198's
    * DuckDB hash-match pins it cross-engine. `r` must be a valid
    * 1-based row_number over the tile order; `n` the group's row count.
    */
  def ntileFromRank(k: Int, r: Column, n: Column): Column = {
    require(k > 0)
    // `div` = Spark's IntegralDivide — exact int64 division; a double
    // `/` + floor would go wrong past 2^53, i.e. exactly at the group
    // sizes this operator exists for
    def idiv(a: Column, b: Column): Column = call_function("div", a, b)
    val q = idiv(n, lit(k.toLong))
    val rem = n % lit(k.toLong)
    when(q === 0L, r)
      .otherwise(when(r <= (q + lit(1L)) * rem,
        idiv(r - lit(1L), q + lit(1L)) + lit(1L))
        .otherwise(rem + idiv(r - lit(1L) - (q + lit(1L)) * rem, q) +
          lit(1L)))
      .cast("long")
  }

  /** EXACT per-GROUP quantiles at any scale — [[exactQuantiles]]' grouped
    * sibling, closing the caveat q57 documents: Spark's exact
    * `percentile` buffers and sorts EVERY value of a group inside ONE
    * aggregation buffer, which cannot hold a corpus-scale group (and a
    * keyed rank window would sort each group in one task). Here the R-7
    * order statistics per group come from [[groupedRank]]'s two-pass
    * frozen range shuffle: rank every row within its group (cluster-wide
    * parallelism even for a dominant group), build the tiny group ×
    * fraction endpoint relation (|groups|·|fractions| rows — the
    * [[groupedRank]] modest-group-cardinality contract), broadcast-join
    * it back as a FILTER (≤ 2 rows survive per endpoint — never a row
    * multiplier), and fold x_lo + (x_hi − x_lo)·frac.
    *
    * Semantics match `percentile(v, p)` per group (R-7, null values
    * excluded): a group whose values are ALL null yields one row per
    * fraction with a NULL quantile — the group-universe left join keeps
    * it, exactly like the global operator's empty-input contract.
    * Exactness argument is q57/q102's: h = (n−1)p + 1 and the
    * interpolation are exact IEEE for practical fractions on
    * integer-valued data. Output: groupCols ++ (p, quantile), ordered.
    * Repeated fractions are deduplicated (one row per distinct (group,
    * fraction)). NULL group values are real groups, as in
    * [[groupedRank]]. Storage: call `graft.Checkpoints.release(result)`
    * after consuming.
    *
    * ONE source pass: values are ranked WITH their nulls (ascending
    * order sorts nulls first, so the j-th non-null value of a group
    * sits at rank nulls + j), and the group universe, null counts, and
    * totals all come from the one frozen snapshot — no second scan of
    * the input for the group relation.
    */
  def groupedQuantiles(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      fractions: Seq[Double]): DataFrame = {
    val fracs = fractions.distinct
    require(fracs.nonEmpty && fracs.forall(p => p >= 0 && p <= 1),
      s"fractions must be within [0, 1] (got $fractions)")
    val spark = df.sparkSession
    import spark.implicits._
    val gcols = groupCols.map(col)
    val base = df.select(gcols :+ col(valueCol).cast("double").as("__v"): _*)
    val ranked = groupedRank(base, groupCols, "__rnk", None, col("__v").asc)
    // group universe (including all-null groups) + the null prefix each
    // group's R-7 endpoints must skip — read off the frozen snapshot
    val gstats = ranked.groupBy(gcols: _*)
      .agg(count(lit(1)).as("__tot"), count(col("__v")).as("__n0"))
    val fr = gstats
      .withColumn("__nulls", col("__tot") - col("__n0"))
      .crossJoin(broadcast(fracs.toDF("p")))
      .withColumn("__h", (col("__n0") - 1) * col("p") + 1)
      .withColumn("__w", col("__h") - floor(col("__h")))
      .withColumn("__lo", floor(col("__h")).cast("long") + col("__nulls"))
      .withColumn("__hi", ceil(col("__h")).cast("long") + col("__nulls"))
      .drop("__tot", "__n0", "__nulls")
    val picked = ranked
      .join(broadcast(fr.withColumnsRenamed(
        groupCols.map(g => g -> s"__g_$g").toMap)),
        groupCols.map(g => col(g) <=> col(s"__g_$g")).reduce(_ && _) &&
          (col("__rnk") === col("__lo") || col("__rnk") === col("__hi")))
      .groupBy(gcols :+ col("p"): _*)
      .agg(
        min(when(col("__rnk") === col("__lo"), col("__v"))).as("__vlo"),
        min(when(col("__rnk") === col("__hi"), col("__v"))).as("__vhi"))
    val pk = picked.withColumnsRenamed(
      (groupCols.map(g => g -> s"__p_$g") :+ ("p" -> "__p_p")).toMap)
    fr.select(gcols :+ col("p") :+ col("__w"): _*)
      .join(broadcast(pk),
        groupCols.map(g => col(g) <=> col(s"__p_$g")).reduce(_ && _) &&
          col("p") === col("__p_p"), "left_outer")
      .withColumn("quantile",
        col("__vlo") + (col("__vhi") - col("__vlo")) * col("__w"))
      .select(gcols :+ col("p") :+ col("quantile"): _*)
      .orderBy(gcols :+ col("p"): _*)
  }

  /** Key-skew profiler — the diagnostic that picks between a plain join,
    * AQE's skew splitting, and [[saltedJoin]]: exact per-key counts, the
    * global key statistics, and the top-k heavy hitters, each with its
    * share of all rows and its multiple of the average key's size.
    *
    * Shape: one shrinking partial aggregation on the key, a single-row
    * global rollup joined back by broadcast, and a distributed partial
    * top-k (`TakeOrderedAndProject` — each partition keeps its own top k,
    * the driver merges k-sized heaps; no global sort, no single-task
    * window). The only window function runs over the ≤ k selected rows.
    * Safe at any key cardinality: the full per-key count relation is
    * never collected or globally sorted.
    *
    * All derived ratios are single IEEE divisions of exact integers, so
    * the output is engine-reproducible (the q77 oracle hashes it).
    */
  def skewProfile(df: DataFrame, key: String, k: Int): DataFrame = {
    require(k > 0)
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(
      sum(col("cnt")).as("total_rows"),
      count(lit(1)).as("n_keys"))
    val top = counts.orderBy(col("cnt").desc, col(key)).limit(k)
    top.crossJoin(broadcast(totals))
      .withColumn("rnk",
        row_number().over(Window.orderBy(col("cnt").desc, col(key))))
      .withColumn("share", col("cnt").cast("double") / col("total_rows"))
      .withColumn("skew_vs_avg",
        col("cnt").cast("double") * col("n_keys") / col("total_rows"))
      .select(col(key), col("cnt"), col("rnk"), col("share"),
        col("skew_vs_avg"), col("n_keys"), col("total_rows"))
  }

  /** Bloom-filter SEMI-JOIN PRUNING — the explicit form of the runtime
    * filter Catalyst injects for selective shuffle joins: build a Bloom
    * filter over the small side's join key (distributed, via Spark's own
    * `bloom_filter_agg`), then drop big-side rows that cannot match
    * BEFORE the join's exchange. At 100 TB the win is shuffle bytes: a
    * 1% -selective dimension cuts the fact side's shuffle write ~99%
    * for the cost of one scan-side codegen predicate per row.
    *
    * No false negatives (Bloom guarantee) — `bloomPrune(big).join(small)`
    * is row-identical to `big.join(small)`; false positives (rate ≤ fpp)
    * only cost the exact join a few extra probe rows. The single
    * driver-side `head` transfers ONE row: the serialized filter
    * (~1.2 MB/M keys at 1% fpp — the same payload class as a broadcast
    * relation; the filter build itself is a distributed aggregate, and
    * the resulting literal ships to executors with the plan exactly like
    * a broadcast var). An empty build side short-circuits to an
    * always-false predicate — the semantically exact answer. The
    * session's runtime-filter size ceilings are raised to the requested
    * sizing for the duration of the build and restored afterwards:
    * Spark's aggregate otherwise silently clamps items/bits to the conf
    * defaults (4M / 67.1M), which at large builds would degrade the
    * realized fpp toward 1 with no error.
    */
  def bloomPrune(big: DataFrame, bigKey: String,
      small: DataFrame, smallKey: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    require(expectedItems > 0, s"expectedItems must be > 0 (got $expectedItems)")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0, 1) (got $fpp)")
    val spark = big.sparkSession
    graft.GraftExtensions.registerAll(spark)
    // optimal sizing: bits = -n·ln(p) / ln(2)²  (standard Bloom formula)
    val numBits = math.ceil(
      -expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    // BloomFilterAggregate SILENTLY Math.min-clamps both parameters to
    // the runtime-filter conf ceilings (defaults: 4M items / 67.1M
    // bits). A clamped build would keep the requested-fpp docstring
    // promise a lie — ~0.67 bits/key at 100M keys means fpp→1 and the
    // prune stops pruning with no error anywhere. The caller asked for
    // this sizing explicitly, so raise the session ceilings for the
    // duration of the (eager) build, then RESTORE them: the ceilings
    // also bound Catalyst's auto-injected runtime filters, and leaving
    // them escalated would let an unrelated later join build a
    // multi-hundred-MB filter the defaults exist to prevent.
    val ceilings = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumItems" -> expectedItems,
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits" -> numBits)
    val saved = ceilings.map { case (k, _) => k -> spark.conf.get(k) }
    val bf =
      try {
        ceilings.foreach { case (k, needed) =>
          if (spark.conf.get(k).toLong < needed) spark.conf.set(k, needed)
        }
        small
          .select(call_function("bloom_filter_agg",
            xxhash64(col(smallKey)), lit(expectedItems), lit(numBits)).as("bf"))
          .head.getAs[Array[Byte]](0)
      } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
    if (bf == null) big.filter(lit(false))
    else big.filter(
      call_function("might_contain", lit(bf), xxhash64(col(bigKey))))
  }

  /** Equi-join of two bucketed tables on their bucket keys. When both
    * sides were written by [[bucketedWrite]] with the same keys and
    * bucket count, the plan is a SortMergeJoin with NO
    * `Exchange hashpartitioning` on either side (spec-asserted in
    * ScaleSpec) — the co-location bought at write time replaces the
    * runtime shuffle, and the per-bucket sort order feeds the merge.
    */
  def bucketedJoin(
      spark: org.apache.spark.sql.SparkSession,
      leftTable: String, rightTable: String,
      leftKeys: Seq[String], rightKeys: Seq[String]): DataFrame = {
    require(leftKeys.nonEmpty && leftKeys.length == rightKeys.length)
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    val cond = leftKeys.zip(rightKeys)
      .map { case (lk, rk) => l(lk) === r(rk) }
      .reduce(_ && _)
    l.join(r, cond)
  }

  /** Morton (Z-order) interleave of two `bits`-bit bucket expressions —
    * the multi-dimensional clustering key behind data-skipping layouts
    * (Delta/Iceberg OPTIMIZE ZORDER): rows close in z are close in BOTH
    * dimensions, so a file holding a contiguous z-range covers a small
    * min/max box in each dimension and file-level statistics prune scans
    * filtered on EITHER column. A linear (single-column) sort buys
    * pruning on that column only — the second dimension's per-file span
    * is the full domain.
    *
    * Emitted as dialect-neutral SQL arithmetic (FLOOR-division + modulo
    * with every operand CAST to DOUBLE explicitly — division of ≤2^53
    * non-negative ints by powers of two is EXACT in IEEE, identical on
    * both engines, and stays in fast codegen'd double math; an uncast
    * `p.0` literal would parse as DECIMAL on both engines and drag the
    * whole interleave into wide-decimal arithmetic, measured 10× slower
    * on the Spark side), so ONE builder serves the Spark expression and
    * the DuckDB oracle and the two engines can never interleave
    * differently. Bit k of each input lands at z-bit 2k (x) / 2k+1 (y).
    */
  def zorderSql(bx: String, by: String, bits: Int): String = {
    require(bits >= 1 && bits <= 16)
    val terms = (0 until bits).flatMap { k =>
      val p = 1L << k
      Seq(
        s"(CAST(FLOOR(CAST($bx AS DOUBLE) / $p) AS BIGINT) % 2) * ${1L << (2 * k)}",
        s"(CAST(FLOOR(CAST($by AS DOUBLE) / $p) AS BIGINT) % 2) * ${1L << (2 * k + 1)}")
    }
    terms.mkString("(", " + ", ")")
  }

  /** Affine bucketing of an integer column onto [0, 2^bits): dialect-
    * neutral like [[zorderSql]]; `minv`/`range` are column references to
    * broadcast scalars (global min and max−min+1). Exact: the numerator
    * stays far below 2^53 for any 2^bits ≤ 2^16 and 64-bit key domain
    * bucketed via a first modulo if needed.
    */
  def bucketSql(v: String, minv: String, range: String, bits: Int): String =
    s"CAST(FLOOR(CAST(($v) - ($minv) AS DOUBLE) * ${1L << bits} " +
      s"/ CAST($range AS DOUBLE)) AS BIGINT)"

  /** The physical z-order layout: cluster `df` into `files` contiguous
    * z-ranges of the interleave of `ca` × `cb` (each bucketed to `bits`
    * bits against its global min/max) and sort within partitions by z —
    * exactly what a writer would stream to `files` parquet files. The
    * returned frame carries the `z` column; ZorderSpec measures the
    * per-partition min/max box of both dimensions against a linear
    * layout of the same data.
    */
  def zorderLayout(df: DataFrame, ca: String, cb: String,
      bits: Int = 8, files: Int = 64): DataFrame = {
    val mm = df.agg(
      min(col(ca)).cast("long").as("min_a"),
      (max(col(ca)).cast("long") - min(col(ca)).cast("long") + 1L).as("range_a"),
      min(col(cb)).cast("long").as("min_b"),
      (max(col(cb)).cast("long") - min(col(cb)).cast("long") + 1L).as("range_b"))
    df.crossJoin(broadcast(mm))
      .withColumn("bx", expr(bucketSql(ca, "min_a", "range_a", bits)))
      .withColumn("by", expr(bucketSql(cb, "min_b", "range_b", bits)))
      .withColumn("z", expr(zorderSql("bx", "by", bits)))
      .drop("min_a", "range_a", "min_b", "range_b")
      .repartitionByRange(files, col("z"))
      .sortWithinPartitions(col("z"))
  }
}
