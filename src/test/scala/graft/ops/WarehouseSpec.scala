package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the warehouse-maintenance operators (CDC
  * apply, SCD-2 build, graph cohesion) beyond their oracle hashes.
  */
class WarehouseSpec extends AnyFunSuite with SparkTestSession {

  private val d = "/root/testdata/sf0.001"

  test("q150: the apply path reproduces the rebuild on every source") {
    import spark.implicits._
    val rows = graft.SparkEntry.queries("q150_cdc_merge_audit")(spark, d)
      .select($"matches").as[Boolean].collect()
    assert(rows.nonEmpty && rows.forall(identity),
      "CDC apply diverged from the from-scratch rebuild")
  }

  test("q151: SCD-2 intervals are contiguous, versioned 1..n, open only at the tail") {
    import spark.implicits._
    val rows = graft.SparkEntry.queries("q151_scd2_dimension_build")(spark, d)
      .select($"user_id", $"band", $"effective_from", $"effective_to", $"version_n")
      .as[(Long, Int, java.sql.Timestamp, Option[java.sql.Timestamp], Int)]
      .collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (user, vs) =>
      val hist = vs.sortBy(_._5)
      assert(hist.map(_._5).toSeq == (1 to hist.length),
        s"user $user versions not dense: ${hist.map(_._5).toSeq}")
      // adjacent versions: this interval closes exactly where the next opens
      hist.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4.contains(b._3),
            s"user $user: v${a._5} closes at ${a._4}, v${b._5} opens at ${b._3}")
          assert(a._2 != b._2, s"user $user: consecutive versions share band ${a._2}")
        case _ => ()
      }
      // only the last version is open-ended
      assert(hist.last._4.isEmpty && hist.init.forall(_._4.nonEmpty),
        s"user $user: open intervals not exactly the tail")
    }
  }

  test("q152: per-node triangle counts sum to 3x the global count; coefficients in [0,1]") {
    import spark.implicits._
    val rows = graft.SparkEntry.queries("q152_triangle_clustering")(spark, d)
      .select($"node", $"deg", $"n_triangles", $"clustering")
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r._4 >= 0.0 && r._4 <= 1.0))
    // every triangle contributes one count at each of its 3 corners
    assert(rows.map(_._3).sum % 3 == 0,
      s"per-node triangle mass not divisible by 3: ${rows.map(_._3).sum}")
    // a triangle requires degree >= 2 at every corner
    assert(rows.filter(_._2 < 2).forall(_._3 == 0))
  }

  test("q155: the evaluated model predicts each from-type's modal train successor") {
    import spark.implicits._
    val rows = graft.SparkEntry.queries("q155_markov_eval")(spark, d)
      .select($"from_type", $"predicted", $"n_test", $"n_correct", $"accuracy")
      .as[(String, String, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, pred, nTest, nCorrect, acc) =>
      assert(pred != null, "every from-type seen in test must exist in train here")
      assert(nCorrect <= nTest && acc >= 0.0 && acc <= 1.0)
    }
    // determinism pin: the argmax tie-break is lexicographic, so a
    // rerun must reproduce the identical prediction table
    val again = graft.SparkEntry.queries("q155_markov_eval")(spark, d)
      .select($"from_type", $"predicted").as[(String, String)].collect().toMap
    assert(rows.map(r => r._1 -> r._2).toMap == again)
  }
}
