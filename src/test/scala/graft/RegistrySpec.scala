package graft

import org.scalatest.funsuite.AnyFunSuite

/** Structural guard over the query registry — cheap insurance as the
  * surface grows (300+ names concatenated across 12 modules in
  * `SparkEntry.all`): a planted duplicate name, an empty oracle, or a
  * query missing from the README operator index fails HERE instead of
  * surfacing as a silent driver-side drift (the round-8 README gap).
  */
class RegistrySpec extends AnyFunSuite {

  private lazy val defs = SparkEntry.all

  test("query names are unique across all modules") {
    val dups = defs.groupBy(_.name).filter(_._2.size > 1).keys.toSeq.sorted
    assert(dups.isEmpty, s"duplicate registry names: ${dups.mkString(", ")}")
  }

  test("query names follow the qNNN_snake_case convention") {
    val bad = defs.map(_.name).filterNot(_.matches("q\\d{1,3}_[a-z0-9_]+"))
    assert(bad.isEmpty, s"malformed names: ${bad.mkString(", ")}")
  }

  test("query numbers are unique (one operator per number)") {
    val nums = defs.map(_.name.takeWhile(_ != '_'))
    val dups = nums.groupBy(identity).filter(_._2.size > 1).keys.toSeq.sorted
    assert(dups.isEmpty, s"reused query numbers: ${dups.mkString(", ")}")
  }

  test("every oracle is non-empty ANSI text that starts like a statement") {
    // full grammar validation happens in the driver's DuckDB run; this
    // catches the cheap-and-deadly cases: an empty/whitespace oracle, an
    // interpolated-null fragment (object-init-order trap: a helper val
    // declared after `val queries` interpolates "null" silently), and a
    // statement that can't possibly be a query
    // a Scala-interpolated null is LOWERCASE and standalone; the house
    // SQL style writes the keyword NULL uppercase, so any bare lowercase
    // `null` word is the init-order trap, not a literal
    val nullFrag = "(?<![A-Za-z0-9_])null(?![A-Za-z0-9_])".r
    val bad = defs.flatMap { d =>
      d.oracle.collect {
        case o if o.trim.isEmpty => s"${d.name}: empty oracle"
        case o if nullFrag.findFirstIn(o).isDefined =>
          s"${d.name}: interpolated-null fragment"
        case o if !o.trim.toUpperCase.matches("(?s)(WITH|SELECT)\\b.*") =>
          s"${d.name}: oracle does not start with WITH/SELECT"
      }
    }
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("every registered query appears in the README operator index") {
    val readme = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")), "UTF-8")
    // a query is indexed if its qNN number appears as a cell reference
    // (`| qNN |`, a `qNN,`/`qNN ` mention inside a row, or the module
    // pointer `"qNN_`); require the full name's numeric prefix with a
    // word boundary so q31 never satisfies q310
    val missing = defs.map(_.name).filterNot { n =>
      val num = n.takeWhile(_ != '_')
      ("""(?<![a-z0-9])""" + num + """(?![0-9])""").r
        .findFirstIn(readme).isDefined
    }
    assert(missing.isEmpty,
      s"queries missing from README index: ${missing.mkString(", ")}")
  }

  test("every oracle-less query is named in a gate or spec rationale") {
    // the no_oracle set is a closed, deliberately-audited list: each has
    // a hash-green oracle GATE query or a dedicated spec. A new no-oracle
    // query must be added here consciously, with its gate.
    val gated = Map(
      "q25_minhash_lsh_dedup" -> "q107 recall gate",
      "q26_simhash_dedup" -> "q108 recall gate",
      "q28_ann_lsh_topk" -> "q110 recall gate",
      "q39_approx_distinct_parts" -> "q105 error gate",
      "q50_embedding_near_dup_lsh" -> "q111 recall gate",
      "q67_quantity_percentiles_approx" -> "q106 error gate",
      "q75_ann_ivf_topk" -> "q109 recall gate",
      "q112_dedup_pipeline_scalable" -> "q113 contract gate",
      "q277_pq_adc_topk" -> "q278 recall gate",
      "q320_ann_ivf_pq_rerank" -> "q321 recall gate")
    val unexplained = defs.filter(_.oracle.isEmpty).map(_.name)
      .filterNot(gated.contains)
    assert(unexplained.isEmpty,
      s"no-oracle queries without a registered gate: ${unexplained.mkString(", ")}")
  }
}
