package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension entry point: injects every native graft kernel into
  * the session's function registry at session build time, so a cluster
  * deployment enables them once via
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * instead of calling the per-module `register(spark)` helpers (which
  * remain for ad-hoc/local use — both paths are idempotent and register
  * identical expressions).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.kernels.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        (exprs: Seq[Expression]) => builder(exprs)))
    }
}

object GraftExtensions {

  /** Every native kernel the library ships, by SQL name. */
  val kernels: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_dot" -> (es => functions.DotProduct(es(0), es(1))),
    "minhash_sigs" -> (es => functions.MinHashSigs(es.head)),
    "simhash64" -> (es => functions.SimHash64(es.head)),
    "fingerprint64" -> (es => functions.Fingerprint64(es.head)),
    "sorted_intersect_count" -> (es => functions.SortedIntersectCount(es(0), es(1))),
    "sorted_intersect_count_min" ->
      (es => functions.SortedIntersectCountMin(es(0), es(1), es(2))))

  /** Register all kernels on an already-built session (ad-hoc twin of the
    * extensions path; idempotent).
    */
  def registerAll(spark: SparkSession): Unit =
    kernels.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
