package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text quality / statistics expressions for training-data curation — all
  * built-in (codegen'd) expressions usable both as columns and via the
  * [[TextStats.apply]] convenience transformer.
  */
object TextStats {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(Shingles.tokens(text))

  /** BPE-ish subword count: splits on word/number/punctuation boundaries
    * like a byte-pair pre-tokenizer (letters runs, digit runs, single
    * punctuation marks each count).
    */
  def subwordCount(text: Column): Column =
    size(filter(
      split(lower(text), """(?=[^a-z0-9])|(?<=[^a-z0-9])"""),
      t => t.rlike("""\S""")))

  /** Ratio of non-alphanumeric, non-space characters. */
  def punctRatio(text: Column): Column = {
    val total = length(text)
    val punct = length(regexp_replace(text, "[a-zA-Z0-9\\s]", ""))
    when(total === 0, lit(0.0)).otherwise(punct.cast("double") / total)
  }

  /** English stopword list used by [[stopwordRatio]] / quality scoring. */
  val EnglishStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are", "was",
    "for", "on", "with", "as", "by", "at", "it", "that", "this")

  /** Fraction of tokens that are stopwords. */
  def stopwordRatio(text: Column, stopwords: Seq[String] = EnglishStopwords): Column = {
    val ts = Shingles.tokens(text)
    val hits = size(filter(ts, t => t.isin(stopwords.map(lit): _*)))
    when(size(ts) === 0, lit(0.0)).otherwise(hits.cast("double") / size(ts))
  }

  /** Mean token length (characters). */
  def meanTokenLen(text: Column): Column = {
    val ts = Shingles.tokens(text)
    when(size(ts) === 0, lit(0.0))
      .otherwise(
        aggregate(ts, lit(0), (acc, t) => acc + length(t)).cast("double") / size(ts))
  }

  /** Heuristic quality score in [0,1]: documents that are too short,
    * all-punctuation, or stopword-free (word salad) score low. The exact
    * blend is a curation policy, not a contract — each component is also
    * exposed separately.
    */
  def qualityScore(text: Column): Column = {
    val lenScore  = least(tokenCount(text).cast("double") / 20.0, lit(1.0))
    val punctOk   = lit(1.0) - least(punctRatio(text) * 4.0, lit(1.0))
    val stopOk    = least(stopwordRatio(text) * 5.0, lit(1.0))
    (lenScore + punctOk + stopOk) / 3.0
  }

  /** Append the standard stat columns to `df`. */
  def apply(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_tokens", tokenCount(t))
      .withColumn("n_subwords", subwordCount(t))
      .withColumn("punct_ratio", punctRatio(t))
      .withColumn("stopword_ratio", stopwordRatio(t))
      .withColumn("mean_token_len", meanTokenLen(t))
      .withColumn("quality", qualityScore(t))
  }
}

/** N-gram-profile language identification heuristic: score each language's
  * marker-word list against the document's token set, pick the argmax
  * (ties → lexicographically first language; "und" when nothing matches).
  * Real deployments plug in larger profiles — the operator shape (a
  * codegen'd expression over a broadcast-able profile map) is what scales.
  */
object LangId {

  /** Tiny built-in function-word profiles. */
  val DefaultProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it", "with", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "ich"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "por", "con"),
    "fr" -> Seq("le", "la", "de", "et", "est", "un", "une", "que", "pour", "dans"),
    "zh" -> Seq("的", "是", "不", "我", "了", "在", "人", "有", "他", "这"))

  /** Language code column for a text column. */
  def apply(text: Column,
      profiles: Map[String, Seq[String]] = DefaultProfiles): Column = {
    val ts = Shingles.tokens(text)
    // score struct per language: (-hits, lang) → array_min picks the
    // highest hit count, ties by language code ascending
    val scored = profiles.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(
        (-size(filter(ts, t => t.isin(words.map(lit): _*)))).as("neg"),
        lit(lang).as("lang"))
    }
    val best = array_min(array(scored: _*))
    when(best.getField("neg") === 0, lit("und")).otherwise(best.getField("lang"))
  }
}

/** Rolling-hash document fingerprinting (winnowing-style): polynomial
  * rolling hash over the token stream, keep the minimum hash in each
  * window of `w` consecutive k-gram hashes — a compact, shift-robust
  * document signature for near-dup candidate generation.
  */
object Fingerprint {

  /** Set of winnowed fingerprint hashes of a text column: k-gram token
    * hashes (via `xxhash64`), min-sampled over sliding windows of `w`.
    */
  def winnow(text: Column, k: Int = 4, w: Int = 5): Column = {
    val ts = Shingles.tokens(text)
    val grams = transform(
      sequence(lit(0), greatest(size(ts) - k, lit(0))),
      i => xxhash64(concat_ws(" ", slice(ts, i + 1, lit(k)))))
    val wins = transform(
      sequence(lit(0), greatest(size(grams) - w, lit(0))),
      i => array_min(slice(grams, i + 1, lit(w))))
    array_sort(array_distinct(wins))
  }

  /** Single 64-bit fingerprint: xxhash of the winnowed set. */
  def digest(text: Column, k: Int = 4, w: Int = 5): Column =
    xxhash64(to_json(struct(winnow(text, k, w))))
}
