package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Repetition-based quality signals for training-data curation — the
  * duplicate-line / duplicate-token / top-n-gram family of filters
  * popularized by large-LM data pipelines (cf. the Gopher/MassiveText
  * repetition rules): heavily self-repeating documents are low-quality
  * (boilerplate, scraped menus, keyword stuffing) and get filtered or
  * down-weighted by thresholding these fractions.
  *
  * Two execution shapes:
  *   - LINE-level signals are per-row `Column` expressions over the
  *     (bounded, usually dozens) lines of one document — higher-order
  *     functions with the single-materialization discipline (stage the
  *     line array once; interpreted HOFs have no CSE).
  *   - TOKEN/N-GRAM-level signals aggregate over every token of every
  *     document — [[signals]] runs them as explode → groupBy(doc, term)
  *     → re-aggregate per doc: one shuffle keyed by (doc, term) with
  *     map-side combine, then one keyed by doc. No per-row quadratic
  *     lambdas, no driver-side loops — the 100 TB shape.
  */
object Repetition {

  /** Trimmed non-empty lines of a text column (stage this once). */
  def lines(text: Column): Column =
    filter(transform(split(text, "\n"), l => trim(l)), l => length(l) > 0)

  /** Fraction of lines that are duplicates of an earlier line:
    * `1 - distinct/total` over trimmed non-empty lines; 0 for line-less
    * documents. `ls` MUST be a materialized line-array column.
    */
  def dupLineFrac(ls: Column): Column =
    when(size(ls) === 0, lit(0.0))
      .otherwise(lit(1.0) -
        size(array_distinct(ls)).cast("double") / size(ls))

  /** Fraction of line characters living in lines that occur more than
    * once. O(lines × distinct lines) per row — lines per document are
    * bounded small; token-level repetition uses [[signals]] instead.
    */
  def dupLineCharFrac(ls: Column): Column = {
    // per distinct line: (occurrences, chars) — each component referenced
    // once; the occurrence scan is the O(L·D) part
    val perDistinct = transform(array_distinct(ls),
      d => struct(
        size(filter(ls, x => x === d)).as("cnt"),
        length(d).as("len")))
    val dupChars = aggregate(perDistinct, lit(0),
      (acc, s) => acc + when(s.getField("cnt") > 1,
        s.getField("cnt") * s.getField("len")).otherwise(0))
    val allChars = aggregate(ls, lit(0), (acc, l) => acc + length(l))
    when(size(ls) === 0, lit(0.0))
      .otherwise(dupChars.cast("double") / allChars)
  }

  /** Per-document token- and n-gram-repetition signals, computed with
    * distributed aggregations (NOT per-row lambdas):
    *
    *   - `dup_token_frac`      1 − distinct tokens / tokens
    *   - `dup_token_char_frac` chars of tokens occurring >1× / token chars
    *   - `top_ngram`           most frequent word n-gram (count desc,
    *                           gram asc on ties — deterministic)
    *   - `top_ngram_char_frac` occurrences × gram chars / document chars
    *
    * Documents with fewer than `n` tokens get `top_ngram = ""` and frac 0.
    * Output: one row per input row, `idCol` + the four signal columns.
    */
  def signals(df: DataFrame, idCol: String, textCol: String, n: Int = 2): DataFrame = {
    val base = df.select(col(idCol).as("__graft_id"),
      length(col(textCol)).as("__graft_doclen"),
      Shingles.tokens(col(textCol)).as("__graft_tk"))

    // token-level: explode → count per (doc, token) → one row per doc
    val tokAgg = base
      .select(col("__graft_id"), explode(col("__graft_tk")).as("tok"))
      .groupBy(col("__graft_id"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("__graft_id"))
      .agg(
        (lit(1.0) - count(lit(1)).cast("double") / sum(col("cnt")))
          .as("dup_token_frac"),
        (sum(when(col("cnt") > 1, col("cnt") * length(col("tok")))
          .otherwise(lit(0L))).cast("double") /
          sum(col("cnt") * length(col("tok")))).as("dup_token_char_frac"))

    // n-gram level: non-distinct grams (every occurrence counts).
    // sequence(0, size-n) DESCENDS when size < n — guard to an empty
    // array so short documents contribute no grams (explode drops them;
    // the left join + coalesce below restores frac 0)
    val grams = base.select(col("__graft_id"), col("__graft_doclen"),
      explode(when(size(col("__graft_tk")) >= n,
        transform(
          sequence(lit(0), size(col("__graft_tk")) - n),
          i => concat_ws(" ", slice(col("__graft_tk"), i + 1, lit(n)))))
        .otherwise(array()))
        .as("gram"))
    // gram counts feed BOTH the top-1 window and the duplicate-gram
    // aggregate
    val gramCounts = grams
      .groupBy(col("__graft_id"), col("__graft_doclen"), col("gram"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("__graft_id"))
      .orderBy(col("cnt").desc, col("gram").asc)
    val topGram = gramCounts
      .withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") === 1)
      .select(col("__graft_id"), col("gram").as("top_ngram"),
        (col("cnt") * length(col("gram")) / col("__graft_doclen"))
          .as("top_ngram_char_frac"))
    // chars in grams occurring more than once / all gram chars (the
    // simplified occurrence-weighted form of Gopher's dup-n-gram rule —
    // overlapping-position coverage needs per-position bookkeeping that
    // buys little at filter time)
    // grouping by (id, doclen) — doclen is functionally dependent on id —
    // keeps this branch's gram-count subtree canonically equal to
    // topGram's so AQE stage reuse CAN kick in (column pruning would
    // otherwise drop doclen here and fork the pipeline from the scan)
    val dupGram = gramCounts
      .groupBy(col("__graft_id"), col("__graft_doclen"))
      .agg((sum(when(col("cnt") > 1, col("cnt") * length(col("gram")))
        .otherwise(lit(0L))).cast("double") /
        sum(col("cnt") * length(col("gram")))).as("dup_ngram_char_frac"))
      .drop("__graft_doclen")

    df.select(col(idCol))
      .join(tokAgg, col(idCol) === col("__graft_id"), "left").drop("__graft_id")
      .join(topGram, col(idCol) === col("__graft_id"), "left").drop("__graft_id")
      .join(dupGram, col(idCol) === col("__graft_id"), "left").drop("__graft_id")
      .select(col(idCol),
        coalesce(col("dup_token_frac"), lit(0.0)).as("dup_token_frac"),
        coalesce(col("dup_token_char_frac"), lit(0.0)).as("dup_token_char_frac"),
        coalesce(col("top_ngram"), lit("")).as("top_ngram"),
        coalesce(col("top_ngram_char_frac"), lit(0.0)).as("top_ngram_char_frac"),
        coalesce(col("dup_ngram_char_frac"), lit(0.0)).as("dup_ngram_char_frac"))
  }
}
