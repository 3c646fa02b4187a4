package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Duplicate-span removal — exact substring deduplication at n-token
  * window granularity (the corpus-level cleanup of Lee et al. 2022,
  * "Deduplicating Training Data Makes Language Models Better": repeated
  * passages, not just repeated documents, get removed).
  *
  * Rule: every n-token window whose key occurs more than once in the
  * corpus (across documents OR repeated inside one) is a duplicate span.
  * The globally FIRST occurrence (minimal `(doc id, position)`) is kept;
  * every token covered by any other occurrence is dropped, and each
  * document is reassembled from its surviving tokens in original order
  * (single-space joined — the operator is token-level, so output text is
  * whitespace-normalized; token-less documents reassemble to "").
  *
  * Not in the reference (no text ops there) — extends the engine toward
  * training-data curation alongside [[LineDedup]] and [[Contamination]].
  *
  * Scale posture: the occurrence stream is one row per token (the same
  * volume every other token-level op here shuffles); duplicate detection
  * is a `groupBy(gram)` with map-side combine — `min(struct(id, pos))` +
  * `count` reduce partially, so a boilerplate gram occurring millions of
  * times never concentrates its occurrences on one task the way a rank
  * window over the gram partition would. Only grams with count > 1
  * join back (the duplicated set, a small head at any corpus size).
  * Removal spans merge per document first (the GroupIntervals cummax
  * sweep), so no n×-expanded position set ever materializes — tokens
  * anti-join against the few merged spans of their document; reassembly
  * is the bounded per-document `collect_list` used by [[LineDedup]].
  *
  * By default gram keys are the codegen'd rolling [[org.apache.spark.sql.graft.GramHash]]
  * over token hashes (no gram strings materialize — the
  * [[Contamination]] lesson); pass `gramKey = Some(f)` to key on the
  * gram STRING via `f` (e.g. md5) for cross-engine differential checks.
  */
object SpanDedup {

  /** One row per input document: `idCol`, `textCol` rewritten to the
    * surviving tokens, `n_tokens` (original), `n_removed`.
    *
    * @param crossDocOnly count a span as duplicated only when it appears
    *                     in MORE THAN ONE document — in-document
    *                     repetition is then left alone (measure it with
    *                     [[Repetition]] instead of editing it away)
    */
  def apply(df: DataFrame, idCol: String, textCol: String, n: Int = 8,
            gramKey: Option[Column => Column] = None,
            crossDocOnly: Boolean = false): DataFrame = {
    require(n >= 1, "n must be >= 1")

    // pinned: the token frame feeds the window-key stream, the token
    // stream AND the final length join — unpinned, the tokenizer ran
    // once per reference (guide §1.2 step 1: don't recompute; the
    // operator-pinning convention — blocks are ContextCleaner-freed
    // when the frame goes unreachable)
    val toks = df.select(col(idCol),
      Shingles.tokens(col(textCol)).as("__graft_tk"))
      .withColumn("__graft_len", size(col("__graft_tk")).cast("long"))
      .localCheckpoint(false)
    val nonEmpty = toks.filter(col("__graft_len") > 0)

    // one row per window start; documents shorter than n tokens form a
    // single whole-document window (GramHash semantics). Pinned: the
    // duplicate-gram aggregate AND the span join both consume this
    // stream — unpinned, the whole gram construction (slice + concat +
    // key for the string path) ran twice
    val keyed0 = gramKey match {
      case None =>
        nonEmpty.select(col(idCol), col("__graft_len"),
          posexplode(org.apache.spark.sql.graft.VecFunctions.gram_hash(
            transform(col("__graft_tk"), t => xxhash64(t)), n))
            .as(Seq("__graft_pos", "__graft_g")))
          .withColumn("__graft_pos", col("__graft_pos").cast("long"))
      case Some(key) =>
        nonEmpty.select(col(idCol), col("__graft_len"),
          explode(sequence(lit(0L),
            greatest(col("__graft_len") - n, lit(0L)))).as("__graft_pos"),
          col("__graft_tk"))
          .select(col(idCol), col("__graft_len"), col("__graft_pos"),
            key(concat_ws(" ",
              slice(col("__graft_tk"), (col("__graft_pos") + 1).cast("int"), lit(n))))
              .as("__graft_g"))
    }
    val keyed = keyed0.localCheckpoint(false)

    // duplicated grams + their first occurrence, via partial-aggregating
    // groupBy (skew-robust: no per-gram sorted window)
    val dupCount: Column =
      if (crossDocOnly) count_distinct(col(idCol)) else count(lit(1))
    val dupFirsts = keyed
      .groupBy("__graft_g")
      .agg(dupCount.as("__graft_c"),
        min(struct(col(idCol).as("_1"), col("__graft_pos").as("_2"))).as("__graft_first"))
      .filter(col("__graft_c") > 1)
      .select(col("__graft_g"),
        col("__graft_first")("_1").as("__graft_fid"),
        col("__graft_first")("_2").as("__graft_fpos"))

    // all non-first occurrences of duplicated grams → removal spans
    // [pos, end); consecutive duplicate windows overlap n−1 positions, so
    // MERGE spans per document first (the GroupIntervals cummax sweep —
    // one window pass keyed by doc) instead of exploding every span into
    // n positions: the anti-join below then tests each token against the
    // few merged spans of its document, and nothing n×-sized ever
    // materializes
    val spans = keyed
      .join(dupFirsts, Seq("__graft_g"))
      .filter(!(col(idCol) === col("__graft_fid") &&
        col("__graft_pos") === col("__graft_fpos")))
      .select(col(idCol), col("__graft_pos").as("__graft_s"),
        least(col("__graft_pos") + n, col("__graft_len")).as("__graft_e"))
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy(col("__graft_s"))
    val cm = max(col("__graft_e"))
      .over(wDoc.rowsBetween(Long.MinValue, -1))
    val merged = spans
      .withColumn("__graft_new",
        when(cm.isNull || col("__graft_s") > cm, 1L).otherwise(0L))
      .withColumn("__graft_sid", sum(col("__graft_new"))
        .over(wDoc.rowsBetween(Long.MinValue, 0)))
      .groupBy(col(idCol), col("__graft_sid"))
      .agg(min(col("__graft_s")).as("__graft_s"),
        max(col("__graft_e")).as("__graft_e"))

    val tokStream = nonEmpty.select(col(idCol),
      posexplode(col("__graft_tk")).as(Seq("__graft_p", "__graft_tok")))
      .withColumn("__graft_p", col("__graft_p").cast("long"))

    // drop tokens covered by any merged span: equi-anti-join on the doc
    // id with the span range as residual condition
    val kept = tokStream.join(merged,
      tokStream(idCol) === merged(idCol) &&
        col("__graft_p") >= col("__graft_s") &&
        col("__graft_p") < col("__graft_e"), "left_anti")

    val reassembled = kept
      .groupBy(idCol)
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("__graft_p"), col("__graft_tok")))),
            e => e("__graft_tok")),
          " ").as("__graft_text"),
        count(lit(1)).as("__graft_nkept"))

    df.select(col(idCol), col(textCol))
      .join(toks.select(col(idCol), col("__graft_len")), Seq(idCol))
      .join(reassembled, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__graft_text"), lit("")).as(textCol),
        col("__graft_len").as("n_tokens"),
        (col("__graft_len") - coalesce(col("__graft_nkept"), lit(0L))).as("n_removed"))
  }
}
