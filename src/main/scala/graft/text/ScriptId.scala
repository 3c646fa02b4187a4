package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Writing-system (script) detection by Unicode-block character counts —
  * the cheap, model-free signal curation pipelines use to split a
  * multilingual crawl before any per-language processing ([[LangId]]'s
  * stop-word vote only works AFTER you know the text is in a script its
  * word lists cover; CJK text, for instance, never matches a European
  * stop word).
  *
  * Counts are pure per-row projections (`length` minus
  * `regexp_replace`-stripped length), stateless and streaming-safe, in
  * the Java-regex ∩ RE2 subset — BMP character-class ranges only, so
  * both engines count identical codepoints.
  */
object ScriptId {

  /** (name, character-class regex) per script family. Basic-multilingual-
    * plane ranges: Latin (ASCII + Latin-1/Extended letters), Cyrillic,
    * Greek, Arabic, CJK (Han + kana + Hangul), decimal digits.
    */
  val Scripts: Seq[(String, String)] = Seq(
    "latin" -> "[A-Za-zÀ-ɏ]",
    "cyrillic" -> "[Ѐ-ӿ]",
    "greek" -> "[Ͱ-Ͽ]",
    "arabic" -> "[؀-ۿ]",
    "cjk" -> "[一-鿿぀-ヿ가-힯]",
    "digit" -> "[0-9]")

  /** Count of `pattern`-class characters in `text`. */
  def charCount(text: Column, pattern: String): Column =
    length(text) - length(regexp_replace(text, pattern, ""))

  /** Appends one `n_<script>` count column per [[Scripts]] entry plus
    * `main_script`: the script with the most characters ("none" when no
    * script character occurs; ties break by [[Scripts]] order, which
    * puts latin first — deterministic).
    */
  def apply(df: DataFrame, textCol: String): DataFrame = {
    val counted = Scripts.foldLeft(df) { case (d, (name, re)) =>
      d.withColumn(s"n_$name", charCount(col(textCol), re))
    }
    val letters = Scripts.filterNot(_._1 == "digit")
    val best = letters.map { case (name, _) => col(s"n_$name") }
      .reduce((a, b) => greatest(a, b))
    val main = letters.foldRight(lit("none"): Column) {
      case ((name, _), alt) =>
        when(best > 0 && col(s"n_$name") === best, lit(name)).otherwise(alt)
    }
    // foldRight puts earlier scripts in OUTER whens — ties resolve in
    // Scripts order
    counted.withColumn("main_script", main)
  }
}
