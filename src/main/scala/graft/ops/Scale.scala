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
}
