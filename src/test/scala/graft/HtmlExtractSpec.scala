package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** HTML main-content extraction: hand-computed visible text, entity
  * decode order, link-density arithmetic, degenerate inputs, and
  * partition invariance. */
class HtmlExtractSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def run(rows: Seq[(Long, String)], maxBp: Int = 1000, minChars: Int = 5) =
    TextAnalysis.extractHtmlText(rows.toDF("doc_id", "html"),
      "doc_id", "html", maxLinkDensityBp = maxBp, minChars = minChars)
      .orderBy("doc_id").collect()

  test("tags, script and style blocks vanish; visible text survives") {
    val html = "<html><head><script>var x = 1;</script><style>p { color: red }" +
      "</style></head><body><h1>Title</h1><p>hello world</p></body></html>"
    val out = run(Seq((1L, html)))
    assert(out.head.getAs[String]("text") === "Title hello world")
  }

  test("entity decode: &amp; last, so &amp;lt; yields literal &lt;") {
    val out = run(Seq((1L, "<p>a &lt;b&gt; c &amp; d &amp;lt; e</p>")))
    assert(out.head.getAs[String]("text") === "a <b> c & d &lt; e")
  }

  test("link density is the hand-computed basis points") {
    // visible text: "menu here and more words x" = 26 chars;
    // anchor inner text: "menu" + "here" = 8 chars.
    // bp = round(8 * 10000 / 26) = round(3076.9) = 3077.
    val html = "<a href=/m>menu</a> <a href=/h>here</a> and more words x"
    val out = run(Seq((1L, html)))
    assert(out.head.getAs[Long]("link_chars") === 8L)
    assert(out.head.getAs[Long]("n_links") === 2L)
    assert(out.head.getAs[Long]("text_chars") === 26L)
    assert(out.head.getAs[Long]("link_density_bp") === 3077L)
    assert(out.head.getAs[Int]("kept") === 0) // over the 1000 bp bar
  }

  test("script content (markup-free regime) never reaches text or link counts") {
    // The documented regime: script/style bodies without '<'. The block
    // is dropped whole — its content is neither visible text nor anchor
    // text, and the anchor AFTER it still counts.
    val html = "<script>var fake = 'a href ignored';</script><p>real text</p>" +
      "<a href=/r>r</a>"
    val out = run(Seq((1L, html)))
    assert(out.head.getAs[String]("text") === "real text r")
    assert(out.head.getAs[Long]("link_chars") === 1L)
    assert(out.head.getAs[Long]("n_links") === 1L)
  }

  test("degenerate inputs: empty html, text-free markup, no links") {
    val out = run(Seq(
      (1L, ""),
      (2L, "<p></p><br>"),
      (3L, "plain words no markup at all")))
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getAs[Long]("link_density_bp") === 10000L) // 0-char guard
    assert(byId(1L).getAs[Int]("kept") === 0)
    assert(byId(2L).getAs[Long]("text_chars") === 0L)
    assert(byId(3L).getAs[String]("text") === "plain words no markup at all")
    assert(byId(3L).getAs[Long]("link_chars") === 0L)
    assert(byId(3L).getAs[Int]("kept") === 1)
  }

  test("partition invariance") {
    val rows = (0 until 60).map(i =>
      (i.toLong, s"<p>body $i</p><a href=/x>nav$i</a>"))
    val df = rows.toDF("doc_id", "html")
    val a = TextAnalysis.extractHtmlText(df.repartition(1), "doc_id", "html", 1000, 3)
      .orderBy("doc_id").collect().toSeq
    val b = TextAnalysis.extractHtmlText(df.repartition(7), "doc_id", "html", 1000, 3)
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
  }
}
