package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → visible-text extraction for crawl-corpus curation: the step
  * between a WARC/WET scan and every text-level operator in this
  * library (dedup, quality, langid all assume prose, not markup).
  * C4/RefinedWeb-class pipelines run exactly this shape of extraction
  * before anything else touches the page.
  *
  * Everything here is a stateless per-row projection in the
  * Java-regex ∩ RE2 subset (same contract as [[Scrub]] / [[UrlOps]]):
  * codegen'd, embarrassingly parallel, no shuffle, runs unchanged on
  * Structured Streaming. This is deliberately a REGEX extractor, not a
  * DOM parser — on malformed real-world markup a lenient
  * strip-and-squeeze is the robust default (a strict parser fails pages
  * a crawler must survive), and it keeps the operator engine-portable.
  *
  * Extraction applied by [[text]], in order:
  *   1. drop `<script>…</script>` and `<style>…</style>` blocks whole
  *      (their content is code, never prose);
  *   2. drop `<!-- … -->` comments;
  *   3. every remaining tag `<…>` becomes a single space (so
  *      `a<br>b` keeps its word boundary);
  *   4. decode the six entities that dominate real pages
  *      (`&lt; &gt; &quot; &#39; &nbsp;` then `&amp;` LAST — decoding
  *      `&amp;` first would double-decode `&amp;lt;`);
  *   5. squeeze whitespace runs to one space and trim.
  */
object HtmlExtract {

  /** Markup with script/style/comment blocks removed and tags replaced
    * by spaces — the shared prefix of [[text]] before entity decode. */
  private def stripped(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script\\b[^>]*>.*?</script>", " ")
    val noStyle  = regexp_replace(noScript, "(?is)<style\\b[^>]*>.*?</style>", " ")
    val noCmt    = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    regexp_replace(noCmt, "<[^>]*>", " ")
  }

  /** Visible text of the page (steps documented on the object). */
  def text(html: Column): Column = {
    val decoded = regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(stripped(html), "&lt;", "<"),
              "&gt;", ">"),
            "&quot;", "\""),
          "&#39;", "'"),
        "&nbsp;", " "),
      "&amp;", "&")
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Content of the first `<title>…</title>` element, whitespace
    * squeezed; empty string when the page has none. */
  def title(html: Column): Column =
    trim(regexp_replace(
      regexp_extract(html, "(?is)<title\\b[^>]*>(.*?)</title>", 1),
      "\\s+", " "))

  /** Number of `<a …>` anchor tags — the boilerplate signal: link farms
    * and nav-heavy pages carry high link counts per visible character. */
  def linkCount(html: Column): Column =
    size(regexp_extract_all(html, lit("(?i)<a[\\s>]"), lit(0))).cast("long")

  /** Visible-text length ÷ markup length (0 for empty markup) — the
    * classic text-density quality gate: boilerplate-heavy pages score
    * low, article pages high. One division: bit-exact across engines. */
  def textRatio(html: Column): Column =
    when(length(html) === 0, lit(0.0d))
      .otherwise(length(text(html)).cast("double") /
        length(html).cast("double"))
}
