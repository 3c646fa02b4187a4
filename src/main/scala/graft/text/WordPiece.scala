package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.TextFunctions

/** Subword tokenization for training-data pipelines: exact token
  * counts for budget planning ([[graft.text.Packing]] /
  * [[graft.sample.TokenBudget]] consume counts; a whitespace proxy
  * over-counts rare words and under-counts agglutinations), sequence
  * packing at real token granularity, and vocabulary coverage checks.
  *
  * Backed by the native [[WordPieceTokens]] expression (greedy
  * longest-match, `##` continuations, whole-word `unk` on dead ends —
  * the BERT-family algorithm; see its scaladoc for why this is a
  * native per-row projection and not a composed plan). Stateless and
  * shuffle-free: runs unchanged on Structured Streaming.
  *
  * Training vs encoding, scale posture: [[wordCounts]] is the
  * distributed half of tokenizer TRAINING — the corpus reduces to a
  * (word, count) table with map-side combine, which is tiny (vocabulary
  * grows ~Heaps' law, sublinearly) and is what an offline
  * BPE/WordPiece trainer actually consumes; the learned vocabulary
  * then broadcasts back inside this expression for distributed
  * ENCODING, the only part that touches all 100 TB.
  */
object WordPiece {

  val DefaultUnk = "[UNK]"

  /** Tokens of `text` under `vocab` (word-initial pieces plain,
    * continuations `##`-prefixed), as `array<string>`. */
  def tokens(text: Column, vocab: Seq[String],
             unk: String = DefaultUnk): Column =
    TextFunctions.wordpiece_tokens(text, vocab, unk)

  /** Exact subword token count — the budget-planning input. */
  def countTokens(text: Column, vocab: Seq[String],
                  unk: String = DefaultUnk): Column =
    size(tokens(text, vocab, unk)).cast("long")

  /** Distributed word-frequency table `(word, n)` — the input a
    * tokenizer trainer consumes. One map-side-combined aggregation;
    * `minCount` prunes the hapax tail before it reaches the driver. */
  def wordCounts(df: DataFrame, textCol: String,
                 minCount: Long = 1L): DataFrame =
    df.select(explode(split(col(textCol), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
}
