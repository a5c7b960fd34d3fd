package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.PiiRedaction

/** Hand-computed redaction cases pinning the rule chain's semantics:
  * per-rule placeholders, application ORDER (email consumes an IP-shaped
  * host before the IP rule runs), counts measured on the original text,
  * the documented no-word-boundary trade, and the backslash-free pattern
  * contract. Cross-engine parity is the q104 driver gate's job. */
class PiiRedactionSpec extends AnyFunSuite with SparkTestBase {

  private def run(texts: String*): Seq[(String, Long, Long, Long)] = {
    import spark.implicits._
    PiiRedaction.redact(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"),
      "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
  }

  test("each rule redacts its pattern with its placeholder") {
    val out = run(
      "mail a.b-c_d%e+f@host-1.example.COM today",
      "server at 10.0.42.255 responded",
      "ssn 123-45-6789 on file",
      "clean text with plain words 42")
    assert(out(0) === (("mail [EMAIL] today", 1L, 0L, 0L)))
    assert(out(1) === (("server at [IP] responded", 0L, 1L, 0L)))
    assert(out(2) === (("ssn [ID] on file", 0L, 0L, 1L)))
    assert(out(3) === (("clean text with plain words 42", 0L, 0L, 0L)))
  }

  test("rule order: an IP-shaped email host is consumed by the email rule") {
    val out = run("bob@10.0.0.5.mail.io and 192.168.1.1")
    // redacted: whole email goes first, then the bare IP
    assert(out(0)._1 === "[EMAIL] and [IP]")
    // counts are on the ORIGINAL text: the host's IP shape counts as an
    // IP even though the email rule consumed it in the redaction
    assert((out(0)._2, out(0)._3) === ((1L, 2L)))
  }

  test("multiple matches of one rule all redact (the DuckDB 'g' flag trap)") {
    val out = run("a@b.co then c@d.org and 1.2.3.4 5.6.7.8")
    assert(out(0)._1 === "[EMAIL] then [EMAIL] and [IP] [IP]")
    assert((out(0)._2, out(0)._3) === ((2L, 2L)))
  }

  test("documented no-boundary trade: an SSN shape inside a longer run still matches") {
    val out = run("id 999-12-345678")
    assert(out(0)._1 === "id [ID]78")
    assert(out(0)._4 === 1L)
  }

  test("rule contract rejects backslashes and quotes") {
    intercept[IllegalArgumentException](PiiRedaction.Rule("x", "\\d+", "[X]"))
    intercept[IllegalArgumentException](PiiRedaction.Rule("x", "it's", "[X]"))
    intercept[IllegalArgumentException](PiiRedaction.Rule("Bad-Name", "[0-9]", "[X]"))
  }
}
