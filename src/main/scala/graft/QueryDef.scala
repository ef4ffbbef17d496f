package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One verifiable operator: a Spark implementation plus (optionally) a
  * DuckDB-ANSI oracle over the same parquet tables. Queries without an
  * oracle get the driver's weaker rows-only check and are covered by
  * ScalaTest instead.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  // no stripMargin here: every call site already strips, and a second
  // pass would corrupt any oracle line whose SQL legitimately begins
  // with '|' (e.g. a wrapped '||' string concat)
  def sql(name: String)(run: (SparkSession, String) => DataFrame)(oracle: String): QueryDef =
    QueryDef(name, run, Some(oracle.trim))

  def noOracle(name: String)(run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, None)
}

/** Determinism helpers for oracle-comparable floating-point aggregates.
  *
  * A plain `SUM(double)` is order-dependent, and Spark's partitioned
  * aggregation will not add in DuckDB's order. We instead compute each row's
  * value in double (bit-identical IEEE arithmetic on both engines),
  * FLOOR-quantize it onto the 1e-6 grid, sum exactly in DECIMAL(18,6)
  * (order-free), and cast the total back to double.
  *
  * Why `floor(x·1e6 + 0.5)`, not a rounding cast: the engines'
  * double→DECIMAL casts round DIFFERENT things — Spark rounds the exact
  * binary expansion (BigDecimal HALF_UP), DuckDB rounds the SHORTEST
  * DECIMAL string. For inputs that are exact small rationals (ratios
  * like 1 − ssq/n²), true scale-6 ties occur (e.g. 0.7790625: binary
  * expansion …624999…, shortest string …625) and the two casts
  * disagree — observed as a q238 hash mismatch at sf0.1 that sf0.01
  * never exposed. `floor(x·1e6 + 0.5)` is a pure IEEE chain (multiply,
  * add, floor — no engine rounding mode anywhere), so both engines
  * compute the identical result even on would-be ties, and unlike a
  * bare `floor(x·1e6)` it IS the identity on every exact-scale-≤6
  * input: a money value like 2.01 has x·1e6 = 2009999.999…, which bare
  * floor truncates to 2009999 (a systematic −1e-6/row bias on ~half of
  * all scale-2 inputs) while the +0.5 form recovers 2010000. The
  * subsequent grid-point→DECIMAL cast is ≥5e-7 from any boundary —
  * unambiguous on both engines. Grid fidelity holds for per-row
  * |x| < ~9e9 (x·1e6 must stay inside 2^53), with orders of magnitude
  * of headroom over every summed measure here.
  */
/** The single md5-derived 32-bit id-hash recipe every deterministic
  * bucketing in the library derives from (train/val/test split, strata,
  * corpus halves, sampling order). One definition on each engine side —
  * the q53 split, q89 sample, q91/q96 halves MUST all hash identically,
  * and a recipe change in one copy would silently de-synchronize them.
  */
object Ids {
  /** Stable non-negative 32-bit hash of an id column (first 8 md5 hex
    * digits), content-independent and engine-reproducible.
    */
  def hash(idCol: String): Column = expr(
    s"cast(conv(substring(md5(cast($idCol AS string)), 1, 8), 16, 10) AS bigint)")

  /** DuckDB fragment equivalent to [[hash]]. */
  def hashSql(idCol: String): String =
    s"CAST(('0x' || SUBSTRING(MD5(CAST($idCol AS VARCHAR)), 1, 8)) AS BIGINT)"

  /** Deterministic fixed-SIZE sample predicate: keep ids whose [[hash]]
    * falls under ~`target/n` of the full 32-bit bucket space. The
    * validators built on quadratic ground truth (exact all-pairs
    * near-dup, blocked Jaccard) bound their input with this so their
    * cost stays FLAT as the corpus grows — a validator that detonates at
    * scale validates nothing. The coarse 2^32 space keeps the 1-bucket
    * floor harmless up to n ≈ target·2^32; membership is
    * content-independent, so truth metrics measured on the slice are
    * unbiased estimates.
    */
  def sampleKeep(idCol: String, n: Long, target: Long): Column = {
    val space = 4294967296.0 // 2^32
    val keepBuckets = math.max(1L, (target.toDouble / n * space).toLong)
    hash(idCol) < lit(keepBuckets)
  }

  /** DuckDB fragment equivalent to [[sampleKeep]], with the corpus count
    * read from a `cnt(n)` relation in scope (FLOOR + BIGINT cast ≡
    * Scala's toLong on these positive values).
    */
  def sampleKeepSql(idCol: String, target: Long): String =
    s"${hashSql(idCol)} < GREATEST(1, " +
      s"CAST(FLOOR($target.0 / n * 4294967296.0) AS BIGINT))"
}

object Det {
  private val D = DecimalType(18, 6)

  /** Order-insensitive, engine-exact sum of a double expression
    * (tie-free nearest-grid quantization onto the 1e-6 grid via
    * `floor(x·1e6 + 0.5)` — see the object Scaladoc).
    */
  def dsum(c: Column): Column =
    sum((floor(c * lit(1e6) + lit(0.5)) / lit(1e6)).cast(D)).cast("double")

  /** DuckDB fragment equivalent to [[dsum]]. The final decimal→double
    * cast routes through a string/strtod (the q154 HUGEINT precedent):
    * DuckDB's direct DECIMAL→DOUBLE computes on the SCALED int64, which
    * past 2^53 scaled units (totals ≥ ~9.0e9 at scale 6) is not
    * correctly rounded, while Spark's BigDecimal path is — observed as
    * a 1-ulp q38/q45 global-cell mismatch at sf0.1. The type spells
    * STRING, not VARCHAR: several queries run this fragment VERBATIM on
    * Spark too (dialect-shared SQL), and Spark rejects an unsized
    * VARCHAR while both engines accept STRING.
    */
  def dsumSql(expr: String): String =
    s"CAST(CAST(SUM(CAST(FLOOR(($expr) * 1e6 + 0.5) / 1e6 AS DECIMAL(18,6))) AS STRING) AS DOUBLE)"

  /** Order-insensitive mean: exact sum divided by count as double. */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  def davgSql(expr: String): String = s"(${dsumSql(expr)} / COUNT(*))"

  /** Cent-scaled exact long sum for doubles with ≤ `scale` decimal places
    * and bounded magnitude: Σ floor(x·10^scale + 0.5) as int64, then one
    * long→double cast (single IEEE rounding, identical on both engines —
    * unlike wide decimal→double casts, which can double-round).
    * ~3× cheaper than [[dsum]] (no 128-bit decimal accumulation).
    *
    * Quantization is the same TIE-FREE floor-shift [[dsum]] uses, not
    * built-in round(): round() splits across engines on exact .5 scaled
    * ties (Spark half-up via a decimal string, DuckDB half-even), and
    * while on-grid inputs never hit a tie, callers that feed ARBITRARY
    * doubles (e.g. q330's likelihood ratios) can — N+0.5 at 1e6 scale is
    * exactly representable. floor(x·f + 0.5) is a single IEEE add+floor,
    * bit-identical on both engines for every double, and agrees with
    * round() everywhere the on-grid contract held.
    *
    * OVERFLOW CONTRACT (ANSI mode aborts rather than wraps): the bound
    * binds PER AGGREGATION GROUP — partial sums per partition are always
    * small; it is the merged per-group total that must satisfy
    * max_rows_per_group · max|x|·10^scale < 2^63 ≈ 9.2e18, with real
    * headroom (≥ 3×) at the 100 TB design point (lineitem ~6e11 rows,
    * orders ~1.5e11). Safe: quantities/discounts at any grouping;
    * 2-decimal prices when no single group exceeds ~1e10 rows (per-order
    * / per-part / per-month / ≥5-way splits of a table). NOT safe —
    * use [[dsum]]: scale-4 products over large groups (revenue by
    * nation), PRICE-SCALE measures in a CUBE/ROLLUP global cell over a
    * full table (small-integer measures like quantity stay safe even in
    * the global cell: 6e11 rows × 50 ≈ 3e13 — see q09), and price sums
    * in ≤3-way splits of lineitem.
    *
    * NEGATIVE-TIE NOTE: the floor-shift quantizer rounds an exact
    * negative half-tie toward +∞ (floor(−100.5·f + 0.5)/f = −100), where
    * the pre-round-13 round() path gave half-away-from-zero (−101).
    * On-grid inputs (≤ `scale` decimals) never hit a tie, so every
    * oracle-verified caller is unaffected; callers feeding ARBITRARY
    * negative doubles get the engine-identical floor-shift convention,
    * not round()'s.
    */
  def csum(c: Column, scale: Int = 2): Column = {
    val f = math.pow(10, scale)
    (sum(floor(c * f + lit(0.5)).cast("long")).cast("double")) / f
  }

  /** DuckDB fragment equivalent to [[csum]]. DuckDB's SUM(BIGINT) widens
    * to HUGEINT — cast back to BIGINT (exact under the contract) so the
    * final int→double rounding matches Spark's long→double cast.
    */
  def csumSql(expr: String, scale: Int = 2): String = {
    val f = s"1e$scale"
    s"(CAST(CAST(SUM(CAST(FLOOR(($expr) * $f + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE) / $f)"
  }
}
