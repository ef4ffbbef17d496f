package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` (SURVEY §2.2 "custom stats via Aggregator"):
  * count/mean/variance with the same engine-exact strategy as `Det.dsum` —
  * inputs are rounded into scale-6 decimals, summed exactly (order- and
  * partition-independent), and converted to double once at the end, so the
  * result is bit-identical to the DuckDB oracle's decimal formulation.
  */
final case class Moments(n: Long, mean: Double, variance: Double)

final case class MomentsBuf(n: Long, sum: BigDecimal, sumSq: BigDecimal)

object ExactMoments extends Aggregator[Double, MomentsBuf, Moments] {
  private val Scale = 6
  private def q(x: Double): BigDecimal =
    BigDecimal(x).setScale(Scale, BigDecimal.RoundingMode.HALF_UP)

  override def zero: MomentsBuf =
    MomentsBuf(0L, BigDecimal(0).setScale(Scale), BigDecimal(0).setScale(Scale))

  override def reduce(b: MomentsBuf, x: Double): MomentsBuf =
    MomentsBuf(b.n + 1, b.sum + q(x), b.sumSq + q(x * x))

  override def merge(a: MomentsBuf, b: MomentsBuf): MomentsBuf =
    MomentsBuf(a.n + b.n, a.sum + b.sum, a.sumSq + b.sumSq)

  override def finish(b: MomentsBuf): Moments =
    if (b.n == 0L) Moments(0L, 0.0, 0.0)
    else {
      val n = b.n.toDouble
      val s = b.sum.toDouble
      val ss = b.sumSq.toDouble
      val m = s / n
      Moments(b.n, m, ss / n - m * m)
    }

  override def bufferEncoder: Encoder[MomentsBuf] = Encoders.product[MomentsBuf]
  override def outputEncoder: Encoder[Moments] = Encoders.product[Moments]
}
