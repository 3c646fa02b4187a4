package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-data curation: count and
  * replace email addresses, URLs, and IPv4 literals in a text column.
  * Pure per-row `regexp_count`/`regexp_replace` projections — codegen'd,
  * embarrassingly parallel, no shuffle.
  *
  * The built-in patterns deliberately stick to the regex subset that
  * behaves identically under Java regex (Spark) and RE2 (DuckDB, Go
  * tooling): character classes, bounded repetition, `\b`/`\s` — so scrub
  * results are reproducible across engines (and differential-testable).
  * Swap in stricter patterns per deployment; the operator shape is the
  * contract.
  */
object Scrub {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlRe = "https?://[^\\s]+"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Patterns applied in order (order matters: URLs are scrubbed before
    * IPv4 so `http://1.2.3.4/x` redacts as one URL, not URL+IP).
    */
  val DefaultPatterns: Seq[(String, String)] = Seq(
    "email" -> EmailRe, "url" -> UrlRe, "ipv4" -> Ipv4Re)

  /** Appends, per pattern `name`, a `n_<name>` match-count column, plus
    * `outCol` = the text with every match replaced by `<name.toUpperCase>`
    * (e.g. `<EMAIL>`). Counts are taken on the ORIGINAL text; replacement
    * is sequential, so overlapping pattern families (URL ⊃ IPv4) redact
    * under the earlier name.
    */
  def apply(
      df: DataFrame,
      textCol: String,
      outCol: String = "scrubbed",
      patterns: Seq[(String, String)] = DefaultPatterns): DataFrame = {
    val counted = patterns.foldLeft(df) { case (d, (name, re)) =>
      d.withColumn(s"n_$name", regexp_count(col(textCol), lit(re)))
    }
    val scrubbed = patterns.foldLeft(col(textCol)) { case (c, (name, re)) =>
      regexp_replace(c, re, s"<${name.toUpperCase}>")
    }
    counted.withColumn(outCol, scrubbed)
  }
}
