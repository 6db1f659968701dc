package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction for web-corpus pipelines — the WARC→WET
  * stage that runs before every text-quality operator: strip
  * script/style/comment blocks, drop tags, decode the common entities,
  * collapse whitespace; plus href link extraction for the link graph.
  *
  * Everything is chained codegen `regexp_replace` /
  * `regexp_extract_all` column expressions — no UDFs, fully
  * whole-stage-codegen, embarrassingly parallel at 100 TB. Patterns
  * are kept in the Java∩RE2 common subset (non-greedy spans, inline
  * `(?is)` flags, explicit whitespace classes — NO lookarounds or
  * backreferences) so the DuckDB oracle can state them verbatim; the
  * q132/q133 oracle SQL interpolates THESE constants, so the two
  * engines cannot drift.
  */
object Html {

  /** Script block incl. content (non-greedy to the first closer). */
  val ScriptRe = "(?is)<script\\b.*?</script>"

  /** Style block incl. content. */
  val StyleRe = "(?is)<style\\b.*?</style>"

  /** HTML comment. */
  val CommentRe = "(?s)<!--.*?-->"

  /** Any remaining tag (a negated class crosses newlines without a
    * flag). */
  val TagRe = "<[^>]*>"

  /** Whitespace run, INCLUDING Unicode whitespace as literal chars —
    * Scala's \\uXXXX escapes resolve at compile time, so the regex
    * sees literal characters, which parse identically in Java regex
    * and RE2 — the one spelling serves both engines (fuzz-harness
    * trim-drift class: DuckDB's trim eats NBSP, Spark's doesn't;
    * collapsing exotic whitespace to ASCII spaces BEFORE the trim
    * makes both trims agree). */
  val WsRe = "[ \\t\\r\\n\\f\u000B\u0085\u00A0\u1680" +
    "\u2000-\u200A\u2028\u2029\u202F\u205F\u3000]+"

  /** href attribute value (single- or double-quoted, case-insensitive;
    * explicit whitespace class for the same `\s` reason). */
  val HrefRe = "(?i)href[ \\t\\r\\n]*=[ \\t\\r\\n]*[\"']([^\"'>]+)[\"']"

  /** Entity decode table IN ORDER — `&amp;` must come last so
    * `&amp;lt;` decodes to the literal text `&lt;`, not `<` (the
    * standard unescape order). Patterns contain no regex
    * metacharacters. */
  val Entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<",
    "&gt;" -> ">",
    "&quot;" -> "\"",
    "&#39;" -> "'",
    "&nbsp;" -> " ",
    "&amp;" -> "&")

  /** Extracted visible text: blocks stripped, tags dropped, entities
    * decoded, whitespace collapsed to single spaces, trimmed. Null
    * HTML → null.
    *
    * Runs as the FUSED single-pass scanner
    * ([[graft.functions.HtmlExtractText]]) — one JIT-compiled walk per
    * document instead of ~11 chained regexp passes (the r14 100×
    * artifact's cpu-dense hot loop). Byte-identical to
    * [[extractTextChained]] (HtmlSpec pins the parity on adversarial
    * and randomized inputs; the q132/q144 oracles state the chained
    * passes verbatim in DuckDB SQL and still hash-match). */
  def extractText(html: Column): Column =
    graft.functions.HtmlExpressions.htmlExtractText(html)

  /** The chained-regexp form of [[extractText]] — the semantic
    * definition (these passes ARE what the oracle states); kept as the
    * parity twin the fused scanner is spec-checked against. */
  def extractTextChained(html: Column): Column = {
    val noBlocks = regexp_replace(
      regexp_replace(
        regexp_replace(html, ScriptRe, " "), StyleRe, " "),
      CommentRe, " ")
    val noTags = regexp_replace(noBlocks, TagRe, " ")
    val decoded = Entities.foldLeft(noTags) { case (c, (pat, rep)) =>
      regexp_replace(c, pat, rep)
    }
    trim(regexp_replace(decoded, WsRe, " "))
  }

  /** All href values in document order, as an array column (raw —
    * resolve/normalize downstream via [[Urls.host]]). */
  def links(html: Column): Column =
    regexp_extract_all(html, lit(HrefRe), lit(1))

  /** One whole `<a …>text</a>` element. Inner text is the no-nested-tag
    * case (`[^<]*`) — the common crawl-anchor shape; an anchor wrapping
    * further markup simply fails the guard instead of matching greedily
    * across elements. Java∩RE2 subset like every pattern here. */
  val AnchorTagRe = "(?is)<a[ \\t\\r\\n][^>]*>[^<]*</a[ \\t\\r\\n]*>"

  /** Inner text (group 1) of one [[AnchorTagRe]] match. */
  val AnchorTextRe = "(?is)>([^<]*)<"

  /** All (url, text) anchor pairs in document order — the link-graph
    * edge payload anchor-text aggregation runs on (the classic
    * "anchor text describes the TARGET page" signal used for retrieval
    * and page-quality corpora). url is the raw href ('' when the
    * anchor has none — resolve/filter downstream via [[Urls.host]]);
    * text is whitespace-collapsed and trimmed, entities left intact.
    * Pure nested regexp column expressions: extract whole anchor
    * elements, then per element the href and the inner text. */
  def anchors(html: Column): Column =
    transform(regexp_extract_all(html, lit(AnchorTagRe), lit(0)), t =>
      struct(
        regexp_extract(t, HrefRe, 1).as("url"),
        trim(regexp_replace(regexp_extract(t, AnchorTextRe, 1), WsRe, " "))
          .as("text")))

  /** Block-level split points for [[mainContent]]: opening or closing
    * structural tags. Inline markup (`<a>`, `<b>`, …) stays INSIDE a
    * block so its text weighs into that block's score. */
  val BlockTagRe =
    "(?is)</?(p|div|section|article|main|header|footer|nav|aside|ul|ol|li|h[1-6]|table|tr|td|br)\\b[^>]*>"

  /** Main-content extraction (the Arc90-readability / boilerpipe idea
    * re-expressed as pure column work): split the page into block
    * segments at structural tags, score each block by LINK DENSITY —
    * navigation/footer chrome is mostly anchor text, body prose is
    * not — and keep blocks whose cleaned text is long enough
    * (≥ `minChars`) with anchor-text chars ≤ 1/`maxLinkDenom` of text
    * chars. Returns struct(content = kept blocks joined by one space,
    * n_blocks = total non-empty blocks, n_kept).
    *
    * All nested HOF + regexp column expressions over the SAME shared
    * constants the oracle states verbatim ([[Entities]], [[WsRe]],
    * [[AnchorTagRe]], [[AnchorTextRe]], [[BlockTagRe]]) — no UDFs,
    * embarrassingly parallel. The q53 boilerplate and q127 line-dedup
    * operators clean REPEATED chrome corpus-wide; this drops
    * structural chrome per page, before any corpus-level look. */
  def mainContent(html: Column, minChars: Int = 20,
      maxLinkDenom: Int = 3): Column =
    graft.functions.HtmlExpressions.htmlMainContent(html, minChars,
      maxLinkDenom)

  /** The chained column form of [[mainContent]] — the semantic
    * definition (the q166 oracle states these expressions verbatim);
    * kept as the parity twin the fused scanner is spec-checked
    * against. [[mainContent]] runs the fused
    * [[graft.functions.HtmlMainContent]] single-walk scanner. */
  def mainContentChained(html: Column, minChars: Int = 20,
      maxLinkDenom: Int = 3): Column = {
    val segs = split(html, BlockTagRe)
    def cleanOf(seg: Column): Column = {
      val noTags = regexp_replace(seg, TagRe, " ")
      val decoded = Entities.foldLeft(noTags) { case (c, (pat, rep)) =>
        regexp_replace(c, pat, rep)
      }
      trim(regexp_replace(decoded, WsRe, " "))
    }
    def anchorCharsOf(seg: Column): Column =
      aggregate(
        transform(regexp_extract_all(seg, lit(AnchorTagRe), lit(0)),
          a => length(trim(regexp_replace(
            regexp_extract(a, AnchorTextRe, 1), WsRe, " ")))),
        lit(0), (acc, x) => acc + x)
    val scored = filter(
      transform(segs, s =>
        struct(cleanOf(s).as("txt"), anchorCharsOf(s).as("ac"))),
      b => length(b.getField("txt")) > 0)
    val kept = filter(scored, b =>
      length(b.getField("txt")) >= minChars &&
        b.getField("ac") * maxLinkDenom <= length(b.getField("txt")))
    struct(
      array_join(transform(kept, b => b.getField("txt")), " ")
        .as("content"),
      size(scored).cast("long").as("n_blocks"),
      size(kept).cast("long").as("n_kept"))
  }

  /** The page's robots meta tag (`name="robots"`, any attribute order,
    * any case), or '' when absent. */
  val MetaRobotsRe =
    "(?is)<meta\\b[^>]*name[ \\t\\r\\n]*=[ \\t\\r\\n]*[\"']robots[\"'][^>]*>"

  /** True when the page opts out of indexing via
    * `<meta name="robots" content="…noindex…">` — the crawl-etiquette
    * filter run before a page's text enters the corpus. */
  def metaRobotsNoindex(html: Column): Column =
    regexp_extract(html, MetaRobotsRe, 0).rlike("(?i)noindex")
}
