package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** HTML strip + boilerplate extraction ([[HtmlFunctions]]).
  * The roundtrip test is load-bearing for `text_prep_pipeline`: its
  * stage 0 wraps the corpus in tags and strips them back, and the
  * pipeline's DuckDB oracle keeps mirroring the CLEAN text — valid only
  * because the strip recovers it exactly. */
class HtmlStripSpec extends SparkSpec {
  import spark.implicits._

  test("stripHtml roundtrip: tag-wrapped corpus text recovers exactly (pipeline stage-0 contract)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val wrapped = concat(
      lit("<html><body><script>var x = 1 < 2;</script><p>"),
      col("text"), lit("</p></body></html>"))
    val bad = docs
      .select(col("text"), HtmlFunctions.stripHtml(wrapped).as("s"))
      .where(col("s") =!= col("text"))
    assert(bad.isEmpty, s"roundtrip broke on: ${bad.take(1).mkString}")
  }

  test("entity decode: full set, &amp; decoded last so &amp;lt; decodes exactly once") {
    val out = Seq("<p>Fish &amp; chips &lt;b&gt; &quot;q&quot; &#39;s&#39;&nbsp;x &amp;lt;</p>")
      .toDF("h").select(HtmlFunctions.stripHtml(col("h"))).as[String].head()
    assert(out == "Fish & chips <b> \"q\" 's' x &lt;", s"got: $out")
  }

  test("script/style/comment content never leaks; block tags break lines; inline tags do not") {
    val out = Seq(
      "<style>p { color: red }</style><p>alpha <b>beta</b> gamma</p>" +
        "<!-- hidden -->\n<script>var leak = 'SECRET';</script><p>delta line here</p>")
      .toDF("h").select(HtmlFunctions.stripHtml(col("h"))).as[String].head()
    assert(out == "alpha beta gamma\ndelta line here", s"got: $out")
    assert(!out.contains("SECRET") && !out.contains("color"))
  }

  test("boilerplate filter: nav / link lists / link-dense footer drop; content + adjacent short line survive") {
    val content = Seq.fill(5)("real content word").mkString(" ")
    val h = "<div><a href='/'>Home</a> | <a href='/a'>About us</a></div>" +
      s"<p>$content</p>" +
      "<p>short tail line</p>" +
      "<ul><li><a href='/x'>first link</a></li><li><a href='/y'>second link</a></li></ul>" +
      "<div><a href='/t'>Terms of Service</a> | <a href='/p'>Privacy Policy</a> &copy; 2024</div>"
    val out = Seq(h).toDF("h")
      .select(HtmlFunctions.extractMainText(col("h"), 25, 10)).as[String].head()
    assert(out == s"$content\nshort tail line", s"got: $out")
    // the staged DataFrame overload is the same function, evaluated once
    val staged = HtmlFunctions.extractMainText(Seq(h).toDF("h"), col("h"), "m")
      .select("m").as[String].head()
    assert(staged == out)
  }

  test("markup-only / empty pages strip to an empty string, never throw (zero-line sequence edge)") {
    val cases = Seq("<script>var x = 1;</script>", "", "   ",
      "<html><head><style>p{}</style></head><body></body></html>",
      "<!-- only a comment -->")
    val out = cases.toDF("h")
      .select(HtmlFunctions.extractMainText(col("h"), 25, 10)).as[String].collect()
    assert(out.toSeq == Seq.fill(cases.length)(""), s"got: ${out.toSeq}")
    val staged = HtmlFunctions.extractMainText(cases.toDF("h"), col("h"), "m")
      .select("m").as[String].collect()
    assert(staged.toSeq == Seq.fill(cases.length)(""))
  }

  test("an isolated short-line run drops entirely (no long neighbor rescues it)") {
    val out = Seq("<p>one two</p><p>three four</p><p>five six</p>")
      .toDF("h").select(HtmlFunctions.extractMainText(col("h"), 25, 10)).as[String].head()
    assert(out == "", s"got: $out")
  }
}
