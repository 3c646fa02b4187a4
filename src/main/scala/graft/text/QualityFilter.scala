package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Composite document-quality gate: the Gopher rules (Rae et al. 2021,
  * "Scaling Language Models", Table A1) as one declarative filter pass.
  * Each rule is also exposed as its own flag column so pipelines can
  * audit WHY documents fall out — the per-rule drop rates are the first
  * thing a curation run reports.
  *
  * Every rule is a per-row projection over two staged arrays (tokens,
  * lines) — no shuffle, no state — so the gate runs unchanged in
  * Structured Streaming and composes with any upstream source. The token
  * array is materialized once per row and every rule reads it as a
  * column: interpreted higher-order functions have no common-subexpression
  * elimination, so re-splitting per rule would multiply the scan cost
  * (same staging discipline as [[TextStats.apply]]).
  */
object QualityFilter {

  /** Thresholds; defaults follow the published Gopher values. */
  case class GopherThresholds(
      minTokens: Int = 50,
      maxTokens: Int = 100000,
      minMeanLen: Double = 3.0,
      maxMeanLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1,
      maxBulletFrac: Double = 0.9,
      maxEllipsisFrac: Double = 0.3,
      minAlphaFrac: Double = 0.8,
      minStopwords: Int = 2)

  /** Rule names in evaluation order — `reason` reports the FIRST failed
    * rule so downstream dashboards aggregate deterministically.
    */
  val RuleNames: Seq[String] = Seq(
    "n_tokens", "mean_token_len", "symbol_ratio", "bullet_frac",
    "ellipsis_frac", "alpha_frac", "n_stopwords")

  /** Append stat columns, per-rule 0/1 flags (`r_<rule>`), the combined
    * `passes` flag, and the first-failure `reason` (null when passing).
    */
  def gopher(df: DataFrame, textCol: String,
             t: GopherThresholds = GopherThresholds(),
             stopwords: Seq[String] = TextStats.EnglishStopwords): DataFrame = {
    val text = col(textCol)
    val tk = col("__graft_tk")
    val ln = col("__graft_ln")
    val nTok = size(tk)
    val safeTok = greatest(nTok, lit(1)).cast("double")
    val nLines = greatest(size(ln), lit(1)).cast("double")
    // '#' and ellipsis ('...' or '…') occurrences per token — the Gopher
    // symbol-to-word screen for markup/truncation debris
    val symbols =
      (length(text) - length(regexp_replace(text, "#", ""))) +
        regexp_count(text, lit("\\.{3}|…"))
    val stats = df
      .withColumn("__graft_tk", Shingles.tokens(text))
      .withColumn("__graft_ln", Repetition.lines(text))
      .withColumn("n_tokens", nTok)
      .withColumn("mean_token_len",
        when(nTok === 0, lit(0.0)).otherwise(
          aggregate(tk, lit(0), (a, x) => a + length(x)).cast("double") / nTok))
      .withColumn("symbol_ratio", symbols.cast("double") / safeTok)
      .withColumn("bullet_frac",
        size(filter(ln, l => l.rlike("^[-*•]"))).cast("double") / nLines)
      .withColumn("ellipsis_frac",
        size(filter(ln, l => l.rlike("(\\.\\.\\.|…)$"))).cast("double") / nLines)
      .withColumn("alpha_frac",
        size(filter(tk, x => x.rlike("[a-z]"))).cast("double") / safeTok)
      // distinct stopwords PRESENT: filter the (tiny, literal) stopword
      // list by containment — distinct by construction on any engine
      .withColumn("n_stopwords",
        size(filter(lit(stopwords.toArray),
          s => array_contains(tk, s))))
      .drop("__graft_tk", "__graft_ln")
    val checks: Seq[(String, Column)] = Seq(
      "n_tokens" ->
        (col("n_tokens") >= t.minTokens && col("n_tokens") <= t.maxTokens),
      "mean_token_len" ->
        (col("mean_token_len") >= t.minMeanLen &&
          col("mean_token_len") <= t.maxMeanLen),
      "symbol_ratio" -> (col("symbol_ratio") <= t.maxSymbolRatio),
      "bullet_frac" -> (col("bullet_frac") <= t.maxBulletFrac),
      "ellipsis_frac" -> (col("ellipsis_frac") <= t.maxEllipsisFrac),
      "alpha_frac" -> (col("alpha_frac") >= t.minAlphaFrac),
      "n_stopwords" -> (col("n_stopwords") >= t.minStopwords))
    val flagged = checks.foldLeft(stats) { case (d, (name, ok)) =>
      d.withColumn(s"r_$name", ok.cast("int"))
    }
    val reason = checks.reverse.foldLeft(lit(null).cast("string")) {
      case (acc, (name, _)) => when(col(s"r_$name") === 0, lit(name)).otherwise(acc)
    }
    flagged
      .withColumn("passes",
        checks.map(c => col(s"r_${c._1}")).reduce(_ * _))
      .withColumn("reason", reason)
  }

  /** The gate itself: rows passing every rule, original schema. */
  def keep(df: DataFrame, textCol: String,
           t: GopherThresholds = GopherThresholds()): DataFrame = {
    val cols = df.columns.toSeq
    gopher(df, textCol, t).where(col("passes") === 1)
      .select(cols.map(col): _*)
  }
}
