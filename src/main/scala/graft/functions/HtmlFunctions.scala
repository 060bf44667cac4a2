package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction for crawl corpora — the stage-0 operator every
  * pretraining pipeline runs before the quality/PII/langid cascade
  * ([[graft.ops.Curation]], [[graft.ops.TextAnalysis]] assume clean
  * text; a real corpus enters as markup).
  *
  * Two layers, composed of codegen'd regex/array built-ins (no UDF):
  *
  *  - [[stripHtml]] — structural strip: drop script/style/comment
  *    blocks, turn block-level tags into newlines (preserving line
  *    structure), remove remaining tags, decode the common entities,
  *    normalize lines. Content-preserving: every visible text character
  *    survives.
  *  - [[extractMainText]] — trafilatura-style boilerplate-line filter
  *    on top (public-spec heuristics: Barbaresi 2021; Kohlschütter et
  *    al. 2010 boilerpipe): drop lines that are mostly link text (nav
  *    bars, related-links lists, footers) and runs of short lines,
  *    keeping short lines only when adjacent to kept content. Link
  *    density is computed WITHOUT division — `2·anchorChars ≤
  *    totalChars` on exact integer counts — so the whole operator is
  *    engine-mirrorable (the DuckDB oracle re-derives it verbatim;
  *    `text_html_strip`).
  *
  * Exactness/mirroring notes: all regexes avoid lookaround and
  * backreferences-in-pattern (RE2-compatible); anchors are marked with
  * U+0001/U+0002 sentinels before tag-stripping so per-line anchor
  * lengths survive; entity decode runs `&amp;` LAST so `&amp;lt;`
  * decodes exactly once (to `&lt;`, not `<`).
  *
  * Scale: per-row scalar expressions — scan-speed, no shuffle, no
  * state; the line arrays live only inside the expression tree.
  */
object HtmlFunctions {

  /** Blocks whose open/close tags break lines. */
  private val BlockTags =
    "p|div|br|li|ul|ol|h[1-6]|tr|table|section|article|header|footer|nav|blockquote|title"

  private def dropBlocks(c: Column): Column = {
    val noScript = regexp_replace(c, "(?is)<script\\b[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style\\b[^>]*>.*?</style>", " ")
    regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
  }

  private def tagsToText(c: Column): Column = {
    val blocks = regexp_replace(c, s"(?i)</?($BlockTags)\\b[^>]*>", "\n")
    regexp_replace(blocks, "<[^>]*>", "")
  }

  /** Decode the common named/numeric entities. `&amp;` LAST: decoding
    * it first would let `&amp;lt;` double-decode to `<`; decoded last,
    * it yields the correct single decode `&lt;`. */
  private def decodeEntities(c: Column): Column = {
    val a = regexp_replace(c, "&nbsp;", " ")
    val b = regexp_replace(a, "&lt;", "<")
    val d = regexp_replace(b, "&gt;", ">")
    val e = regexp_replace(d, "&quot;", "\"")
    val f = regexp_replace(e, "&#39;", "'")
    regexp_replace(f, "&amp;", "&")
  }

  private def normalizeLines(c: Column): Column =
    array_join(filter(transform(split(c, "\n"), l => trim(l)), l => l =!= ""), "\n")

  /** Structural HTML strip: script/style/comment blocks dropped, block
    * tags → newlines, remaining tags removed, entities decoded, lines
    * trimmed and blank lines dropped. Content-preserving (no
    * boilerplate heuristics) — `stripHtml` of plain tag-free text is
    * the text itself (modulo line trimming), which is what lets it sit
    * as stage 0 of a pipeline whose later stages are oracle-mirrored on
    * the clean text. */
  def stripHtml(c: Column): Column =
    normalizeLines(decodeEntities(tagsToText(dropBlocks(c))))

  /** [[stripHtml]] + boilerplate-line filter. A line is KEPT iff its
    * alphanumeric length ≥ `minLong` and at most half of it is anchor
    * (link) text, OR its alphanumeric length ≥ `minShort` (same link
    * bound) and an ADJACENT line is long — so isolated runs of short
    * lines (nav crumbs, list-of-links, footers) drop while short
    * connective lines inside real content survive. All-integer
    * arithmetic: link density ≤ 1/2 is `2·anchorAlnum ≤ alnum`. */
  /** [[extractMainText]] staged over bound columns — USE THIS FORM on
    * real data. The Column form inlines its lambda arguments: every
    * `element_at(metrics, i)` in the neighbor pass re-evaluates the
    * whole per-line regex array, O(lines²) regex passes per document
    * (measured 15.8 s → 1.7 s at sf0.1). Staging each array as a
    * `withColumn` attribute evaluates it once — CollapseProject keeps
    * multi-referenced non-cheap aliases materialized, so the plan
    * preserves the staging. */
  def extractMainText(df: org.apache.spark.sql.DataFrame, html: Column,
                      outCol: String, minLong: Int = 25,
                      minShort: Int = 10): org.apache.spark.sql.DataFrame =
    df.withColumn("__hlm", markedLines(html))
      .withColumn("__hme", lineMetrics(col("__hlm")))
      .withColumn("__hlg", longFlags(col("__hme"), minLong))
      .withColumn(outCol, joinKept(col("__hme"), col("__hlg"), minShort))
      .drop("__hlm", "__hme", "__hlg")

  def extractMainText(c: Column, minLong: Int, minShort: Int): Column =
    joinKept(lineMetrics(markedLines(c)),
      longFlags(lineMetrics(markedLines(c)), minLong), minShort)

  /** Mark anchor TEXT before tags die (per-line anchor lengths must
    * survive the strip -- sentinels are control chars no corpus text
    * contains), strip, and split into non-blank lines. Blank lines drop
    * BEFORE the adjacency pass: `</p><p>` boundaries produce empty
    * lines that would otherwise sit between every pair of real lines
    * and defeat the long-neighbor rescue. */
  private def markedLines(c: Column): Column = {
    val marked = regexp_replace(c, "(?is)<a\\b[^>]*>(.*?)</a>", "\u0001$1\u0002")
    val text = decodeEntities(tagsToText(dropBlocks(marked)))
    filter(split(text, "\n"),
      l => trim(regexp_replace(l, "[\\x01\\x02]", "")) =!= "")
  }

  /** Per line: visible text (marks removed, trimmed), alnum length,
    * anchor alnum length (alnum of the whole minus alnum outside
    * anchor spans). */
  private def lineMetrics(lines: Column): Column =
    transform(lines, l => {
      val visible = regexp_replace(l, "[\\x01\\x02]", "")
      val nonAnchor = regexp_replace(l, "\\x01[^\\x02]*\\x02", "")
      val alnum = length(regexp_replace(visible, "[^A-Za-z0-9]", ""))
      val nonAnchorAlnum = length(regexp_replace(nonAnchor, "[^A-Za-z0-9]", ""))
      struct(trim(visible).as("t"), alnum.as("n"),
        (alnum - nonAnchorAlnum).as("a"))
    })

  private def longFlags(metrics: Column, minLong: Int): Column =
    transform(metrics, m =>
      m.getField("n") >= minLong && m.getField("a") * 2 <= m.getField("n"))

  /** The keep rule + re-join. `metrics`/`longs` should be BOUND
    * attributes (see the DataFrame overload) -- the indexed neighbor
    * reads here are O(1) on an attribute but re-evaluate the whole
    * array expression per index when inlined (the O(lines^2) blowup
    * the staged overload exists to avoid). */
  private def joinKept(metrics: Column, longs: Column, minShort: Int): Column = {
    val keep = transform(sequence(lit(1), size(metrics)), i => {
      val m = element_at(metrics, i)
      val isLong = element_at(longs, i)
      val prevLong = when(i > 1, element_at(longs, i - 1)).otherwise(lit(false))
      val nextLong = when(i < size(longs), element_at(longs, i + 1)).otherwise(lit(false))
      isLong || (m.getField("n") >= minShort &&
        m.getField("a") * 2 <= m.getField("n") && (prevLong || nextLong))
    })
    val kept = filter(
      zip_with(metrics, keep, (m, k) => when(k, m.getField("t"))),
      t => t.isNotNull && t =!= "")
    // `sequence(1, 0)` DESCENDS ([1, 0] — Spark defaults the step to -1
    // when start > stop), so a document that strips to zero lines
    // (markup-only, script-only, empty — routine in a real crawl) would
    // hit element_at(..., 0) and throw. Short-circuit the empty case;
    // `when` branches evaluate lazily, so the crash path never runs.
    when(size(metrics) === 0, lit("")).otherwise(array_join(kept, "\n"))
  }
}
