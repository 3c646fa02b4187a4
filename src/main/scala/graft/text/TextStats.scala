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

  /** Append the standard stat columns to `df`. Staged: the token array is
    * materialized once per row and every ratio reads it as a column
    * (interpreted HOFs have no CSE — never re-split per component), and
    * `quality` is re-expressed over the already-computed stat columns.
    */
  def apply(df: DataFrame, textCol: String): DataFrame = {
    val t  = col(textCol)
    val tk = col("__graft_tk")
    val hits = size(filter(tk, x => x.isin(EnglishStopwords.map(lit): _*)))
    df.withColumn("__graft_tk", Shingles.tokens(t))
      .withColumn("n_tokens", size(tk))
      .withColumn("n_subwords", subwordCount(t))
      .withColumn("punct_ratio", punctRatio(t))
      .withColumn("stopword_ratio",
        when(size(tk) === 0, lit(0.0)).otherwise(hits.cast("double") / size(tk)))
      .withColumn("mean_token_len",
        when(size(tk) === 0, lit(0.0)).otherwise(
          aggregate(tk, lit(0), (acc, x) => acc + length(x)).cast("double") / size(tk)))
      .withColumn("quality",
        (least(col("n_tokens").cast("double") / 20.0, lit(1.0)) +
          (lit(1.0) - least(col("punct_ratio") * 4.0, lit(1.0))) +
          least(col("stopword_ratio") * 5.0, lit(1.0))) / 3.0)
      .drop("__graft_tk")
  }
}

/** Corpus-level vocabulary statistics: token frequencies and per-group
  * top-k (vocabulary building / domain-mix inspection for training data).
  */
object VocabStats {

  /** Token → count per group (one shuffle on (group, token); map-side
    * combine collapses in-partition repeats before the exchange).
    */
  def tokenCounts(
      df: DataFrame,
      textCol: String,
      groupBy: Seq[String] = Nil): DataFrame =
    df.select(groupBy.map(col) :+
        explode(Shingles.tokens(col(textCol))).as("token"): _*)
      .groupBy((groupBy :+ "token").map(col): _*)
      .agg(count(lit(1)).as("cnt"))

  /** The `k` most frequent tokens per group, rank 1..k by count
    * descending, ties by token ascending (deterministic). The rank filter
    * pushes into the window sort (`WindowGroupLimit`), so each partition
    * holds at most k rows per group before the final per-group sort.
    */
  def topTokens(
      df: DataFrame,
      textCol: String,
      groupBy: Seq[String] = Nil,
      k: Int = 100): DataFrame = {
    val counts = tokenCounts(df, textCol, groupBy)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupBy.map(col): _*)
      .orderBy(col("cnt").desc, col("token").asc)
    counts.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
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

  /** Staged DataFrame form: materializes the token array once per row
    * before the per-language scoring reads it (scale path).
    */
  def assign(
      df: DataFrame,
      textCol: String,
      outCol: String = "lang_guess",
      profiles: Map[String, Seq[String]] = DefaultProfiles): DataFrame = {
    val tk = col("__graft_tk")
    val scored = profiles.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(
        (-size(filter(tk, t => t.isin(words.map(lit): _*)))).as("neg"),
        lit(lang).as("lang"))
    }
    val best = array_min(array(scored: _*))
    df.withColumn("__graft_tk", Shingles.tokens(col(textCol)))
      .withColumn(outCol,
        when(best.getField("neg") === 0, lit("und")).otherwise(best.getField("lang")))
      .drop("__graft_tk")
  }
}

/** Rolling-hash document fingerprinting (winnowing-style): polynomial
  * rolling hash over the token stream, keep the minimum hash in each
  * window of `w` consecutive k-gram hashes — a compact, shift-robust
  * document signature for near-dup candidate generation.
  *
  * Prefer the staged [[Fingerprint.apply]] transformer at scale: the
  * single-expression [[winnow]] re-derives the token and gram arrays
  * inside each sliding-window lambda (higher-order functions are
  * interpreted, with no common-subexpression elimination), which turns
  * O(grams) into O(grams²).
  */
object Fingerprint {

  private def gramHashes(tk: Column, k: Int): Column =
    transform(
      sequence(lit(0), greatest(size(tk) - k, lit(0))),
      i => xxhash64(concat_ws(" ", slice(tk, i + 1, lit(k)))))

  private def winnowFromGrams(grams: Column, w: Int): Column =
    array_sort(array_distinct(transform(
      sequence(lit(0), greatest(size(grams) - w, lit(0))),
      i => array_min(slice(grams, i + 1, lit(w))))))

  /** Set of winnowed fingerprint hashes of a text column (single
    * expression; fine for small inputs and tests).
    */
  def winnow(text: Column, k: Int = 4, w: Int = 5): Column =
    winnowFromGrams(gramHashes(Shingles.tokens(text), k), w)

  /** Single 64-bit fingerprint: xxhash of the winnowed set. */
  def digest(text: Column, k: Int = 4, w: Int = 5): Column =
    xxhash64(to_json(struct(winnow(text, k, w))))

  /** Staged pipeline: tokens → gram hashes → winnowed set → digest, each
    * materialized once per row as a named column (the scale path).
    * Appends `fpCol` (array of fingerprint hashes) and `digestCol`.
    *
    * `hashFn`/`digestFn` default to xxhash64 (fastest, codegen'd) but are
    * swappable: any orderable hash works for winnowing (`array_min` per
    * window), so a differential oracle can use md5-hex strings, which
    * every engine computes identically.
    */
  def apply(
      df: DataFrame,
      textCol: String,
      k: Int = 4,
      w: Int = 5,
      fpCol: String = "fingerprints",
      digestCol: String = "digest",
      hashFn: Column => Column = xxhash64(_),
      digestFn: Column => Column = c => xxhash64(to_json(struct(c)))): DataFrame =
    df.withColumn("__graft_tk", Shingles.tokens(col(textCol)))
      .withColumn("__graft_gr",
        transform(
          sequence(lit(0), greatest(size(col("__graft_tk")) - k, lit(0))),
          i => hashFn(concat_ws(" ", slice(col("__graft_tk"), i + 1, lit(k))))))
      .withColumn(fpCol, winnowFromGrams(col("__graft_gr"), w))
      .withColumn(digestCol, digestFn(col(fpCol)))
      .drop("__graft_tk", "__graft_gr")
}
