package graft.llm

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RedactionSpec extends AnyFunSuite with SparkTestSession {

  private def scrub(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t")
      .select(TextAnalysis.redact(col("t"), TextAnalysis.PiiRules).as("r"))
      .as[String].head()
  }

  test("PiiRules scrub emails, IPv4 addresses, and phone numbers") {
    assert(scrub("contact bob.smith+spam@example.co.uk today") ===
      "contact <EMAIL> today")
    assert(scrub("peer at 192.168.001.7 timed out") ===
      "peer at <IP> timed out")
    assert(scrub("call 555-867-5309 or 555.867.5309 now") ===
      "call <PHONE> or <PHONE> now")
  }

  test("rule order protects overlapping shapes") {
    // the email rule must fire before the IP rule would eat the dotted
    // digits in its domain; dotted quads must not half-match as phones
    assert(scrub("mail 99.bob@10.20.com from 10.20.30.40") ===
      "mail <EMAIL> from <IP>")
  }

  test("non-PII text passes through unchanged") {
    val s = "plain words with digits 42 and a trailing dot."
    assert(scrub(s) === s)
  }

  test("redact applies custom rules left-to-right") {
    import spark.implicits._
    val out = Seq("a1b22c").toDF("t")
      .select(TextAnalysis.redact(col("t"),
        Seq("[0-9]+" -> "#", "a#b" -> "X")).as("r"))
      .as[String].head()
    assert(out === "X#c")
  }
}
