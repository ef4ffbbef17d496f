package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** The scalar `udf()` surface (SURVEY.md §2.2 UDF row).
  *
  * The engine's stance is built-ins-first: every shipped operator uses
  * `org.apache.spark.sql.functions` / native Catalyst expressions, which
  * stay inside whole-stage codegen; a Scala UDF is an opaque black box to
  * the optimizer (no pushdown through it, boxing per row). The surface
  * still exists for user extension points — registered here and
  * spec-verified against the codegen'd equivalent.
  */
object Udfs {

  /** Shannon entropy (bits per character) of a string — a quality-scoring
    * helper users commonly bring as custom code; genuinely awkward as
    * built-ins (needs a per-row frequency map). Iterates Unicode CODE
    * POINTS, so supplementary characters (emoji, rare CJK) count once
    * rather than as two UTF-16 surrogate halves.
    */
  val charEntropy: UserDefinedFunction = udf { (s: String) =>
    if (s == null || s.isEmpty) 0.0
    else {
      val counts = new scala.collection.mutable.HashMap[Int, Int]()
      var n = 0
      val it = s.codePoints().iterator()
      while (it.hasNext) {
        val cp = it.nextInt()
        counts.update(cp, counts.getOrElse(cp, 0) + 1)
        n += 1
      }
      counts.values.foldLeft(0.0) { (acc, c) =>
        val p = c / n.toDouble
        acc - p * math.log(p) / math.log(2.0)
      }
    }
  }

  /** Register all user-facing UDFs on the session (idempotent). */
  def register(s: SparkSession): Unit =
    s.udf.register("char_entropy", charEntropy)
}
