package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.UrlOps

/** URL canonicalization (q118's operator): every rule on hand-built
  * URLs, the rules' non-targets (non-default ports, non-tracking params,
  * case-sensitive paths), and the zero-shuffle plan claim. */
class UrlOpsSpec extends AnyFunSuite with SparkTestBase {

  private def canon(urls: String*): Map[String, (String, String)] = {
    import spark.implicits._
    UrlOps.canonicalize(urls.toDF("url"), "url")
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
  }

  test("scheme+host lowercase; www, default port, fragment, tracking params stripped") {
    val got = canon(
      "https://WWW.News.Example.COM:443/A/B/?id=7&utm_source=x&page=2#frag")
    assert(got.head._2 ===
      (("https://news.example.com/A/B?id=7&page=2", "news.example.com")))
  }

  test("non-default ports, non-tracking params, and path case are PRESERVED") {
    val got = canon(
      "http://api.example.org:8080/V1/Items?b=2&a=1", // param order kept too
      "https://example.org:80/x") //                     80 is only http's default
    assert(got("http://api.example.org:8080/V1/Items?b=2&a=1")._1 ===
      "http://api.example.org:8080/V1/Items?b=2&a=1")
    assert(got("https://example.org:80/x")._1 === "https://example.org:80/x")
  }

  test("http:80 dropped; empty path becomes '/'; all-tracking query vanishes") {
    val got = canon(
      "http://example.com:80?utm_source=a&utm_medium=b&ref=rss",
      "HTTP://EXAMPLE.COM")
    assert(got("http://example.com:80?utm_source=a&utm_medium=b&ref=rss")._1 ===
      "http://example.com/")
    assert(got("HTTP://EXAMPLE.COM")._1 === "http://example.com/")
  }

  test("only ONE leading www is stripped, and only as a label prefix") {
    val got = canon(
      "https://www.www.example.com/a", // second www is a real label
      "https://wwwx.example.com/a") //    not a www. prefix
    assert(got("https://www.www.example.com/a")._2 === "www.example.com")
    assert(got("https://wwwx.example.com/a")._2 === "wwwx.example.com")
  }

  test("a '?' inside the fragment is NOT a query; first-'?' wins over later ones") {
    val got = canon(
      "http://h.example.com/p#a?b=1", //        fragment-only '?': no query
      "http://h.example.com/p?a=1?b=2#f", //    query starts at FIRST '?'
      "http://h.example.com/p?x=1#f?utm_source=t") // '#' ends the query
    assert(got("http://h.example.com/p#a?b=1")._1 === "http://h.example.com/p")
    assert(got("http://h.example.com/p?a=1?b=2#f")._1 ===
      "http://h.example.com/p?a=1?b=2")
    assert(got("http://h.example.com/p?x=1#f?utm_source=t")._1 ===
      "http://h.example.com/p?x=1")
  }

  test("canonicalize is a pure projection: zero exchanges in the plan") {
    import spark.implicits._
    val df = UrlOps.canonicalize(
      (0 until 100).map(i => s"https://h$i.example.com/p?utm_source=$i")
        .toDF("url").repartition(4), "url")
    val exchanges = df.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    // the repartition is the input's own exchange; canonicalize adds none
    assert(exchanges.size <= 1, df.queryExecution.executedPlan.toString.take(1200))
  }

  test("garbage in, NULL out: non-URL strings and NULL produce NULL canon + host") {
    import spark.implicits._
    val df = UrlOps.canonicalize(
      Seq("not a url at all", "ftp:/missing-slash", "", null.asInstanceOf[String])
        .toDF("url"), "url")
      .collect().map(r => (r.getString(1), r.getString(2)))
    assert(df.forall { case (c, h) => c == null && h == null }, df.toSeq.toString)
  }

  test("canonical key collapses spelling variants of the same page") {
    val variants = Seq(
      "https://www.shop.example.com/item/42?utm_campaign=mail",
      "https://shop.example.com:443/item/42/",
      "https://shop.example.com/item/42#reviews")
    val keys = canon(variants: _*).values.map(_._1).toSet
    assert(keys === Set("https://shop.example.com/item/42"))
  }
}
