package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Train/eval contamination checking: for every corpus document, the
  * fraction of its distinct word `n`-grams that also occur anywhere in an
  * evaluation corpus — the overlap filter LM pipelines run before
  * training so benchmark data can be excluded or flagged (classically
  * with 8- to 13-grams).
  *
  * Plan shape (the 100 TB posture):
  *   - both sides: tokens → staged gram array → explode → distinct gram
  *     keys — per-row work is codegen'd, gram arrays are materialized
  *     once (interpreted HOFs have no CSE);
  *   - the eval side collapses to its distinct gram keys; an eval set is
  *     small by nature, so the corpus-side join is a broadcast hash join
  *     (Catalyst/AQE decide — with a huge "eval" side it degrades to one
  *     shuffle keyed by gram, still linear);
  *   - per-doc totals and hits are two aggregations keyed by doc id with
  *     map-side combine. The corpus is never shuffled whole — only its
  *     (id, gram key) pairs.
  *
  * `gramKey = None` (the scale default) never builds gram STRINGS at
  * all: tokens hash once and the codegen'd [[GramHash]] loop combines
  * them into rolling n-gram keys (string grams via interpreted
  * `concat_ws` lambdas were the dominant cost — the same lesson as
  * n-gram Jaccard). Pass `Some(f)` mapping the gram string to a key for
  * cross-engine differential testing (e.g. an md5-derived key — md5 is
  * bit-identical in every engine, the native hash is not).
  */
object Contamination {

  /** @return one row per corpus row: `idCol`, `n_grams` (distinct grams),
    *         `n_contaminated` (grams also in eval), `contamination_frac`
    *         (0.0 for gram-less documents)
    */
  def check(
      corpus: DataFrame,
      eval: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8,
      gramKey: Option[Column => Column] = None): DataFrame = {
    def gramKeys(df: DataFrame, cols: Seq[Column]): DataFrame = gramKey match {
      case None =>
        // native path: token hashes → rolling gram hashes, no strings
        df.withColumn("__graft_tk", Shingles.tokens(col(textCol)))
          .withColumn("__graft_th", transform(col("__graft_tk"), t => xxhash64(t)))
          .select(cols :+ explode(array_distinct(
            org.apache.spark.sql.graft.VecFunctions.gram_hash(col("__graft_th"), n)))
            .as("__graft_g"): _*)
      case Some(key) =>
        // gram STRINGS, but no interpreted lambda: explode token
        // POSITIONS first, then build each gram with plain slice/
        // concat_ws — ordinary expressions stay inside whole-stage
        // codegen, where a `transform(sequence, …)` HOF cannot. Within-
        // doc dup grams are handled by the caller's distinct() (the HOF
        // path pre-deduped via array_distinct; here dedup after keying
        // costs a few extra md5s but keeps the hot loop codegen'd).
        df.withColumn("__graft_tk", Shingles.tokens(col(textCol)))
          .select(cols :+ col("__graft_tk") :+
            explode(sequence(lit(0),
              greatest(size(col("__graft_tk")) - n, lit(0)))).as("__graft_i"): _*)
          .select(cols :+ concat_ws(" ",
            slice(col("__graft_tk"), col("__graft_i") + 1, lit(n)))
            .as("__graft_gram"): _*)
          .filter(length(col("__graft_gram")) > 0)
          .select(cols :+ key(col("__graft_gram")).as("__graft_g"): _*)
    }

    val corpusG = gramKeys(corpus, Seq(col(idCol))).distinct()
    val evalG = gramKeys(eval, Nil).distinct()

    // ONE pass over the corpus gram pipeline: left-join the (broadcast)
    // eval keys to tag hits, then a single per-doc aggregation counts
    // totals and hits together. (Separate totals/hits aggregations would
    // re-evaluate the whole shingle+hash pipeline per consumer.)
    val stats = corpusG
      .join(evalG.withColumn("__graft_hit", lit(1)), Seq("__graft_g"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        count(col("__graft_hit")).as("n_contaminated"))

    corpus.select(col(idCol))
      .join(stats, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
        when(coalesce(col("n_grams"), lit(0L)) === 0, lit(0.0))
          .otherwise(coalesce(col("n_contaminated"), lit(0L)).cast("double") /
            col("n_grams"))
          .as("contamination_frac"))
  }

  /** The distinct native gram keys of an eval corpus, collected to the
    * driver — the input to [[perRow]]. Eval sets are small by nature
    * (benchmark suites, not corpora); a corpus-sized "eval" side belongs
    * to [[check]], whose join never leaves the cluster.
    */
  def evalGramKeys(eval: DataFrame, textCol: String, n: Int = 8): Array[Long] =
    eval.withColumn("__graft_tk", Shingles.tokens(col(textCol)))
      .withColumn("__graft_th", transform(col("__graft_tk"), t => xxhash64(t)))
      .select(explode(array_distinct(
        org.apache.spark.sql.graft.VecFunctions.gram_hash(col("__graft_th"), n)))
        .as("__graft_g"))
      // BOUNDED collect: one long per DISTINCT eval n-gram — the eval
      // suite is the small, fixed side of decontamination by contract
      // (benchmarks, not the corpus), so this is a broadcast-sized
      // array, not a data-scaled job result
      .distinct().collect().map(_.getLong(0)).sorted

  /** Shuffle-free, state-free contamination: each document's distinct
    * gram keys are computed in-row (codegen'd rolling [[GramHash]]) and
    * merge-intersected against the sorted eval keys with the codegen'd
    * [[org.apache.spark.sql.graft.SortedLongIntersectCount]] — a pure
    * projection, so it runs UNCHANGED in Structured Streaming (the
    * streaming decontamination gate) and adds zero exchanges in batch.
    * Agrees exactly with [[check]]`(gramKey = None)` on the same inputs.
    */
  def perRow(
      corpus: DataFrame,
      textCol: String,
      evalKeys: Array[Long],
      n: Int = 8): DataFrame = {
    val sortedKeys = evalKeys.sorted
    val staged = corpus
      .withColumn("__graft_tk", Shingles.tokens(col(textCol)))
      .withColumn("__graft_th", transform(col("__graft_tk"), t => xxhash64(t)))
      // projection boundary: the gram array materializes ONCE; the two
      // consumers below reference the attribute, not the HOF pipeline
      .withColumn("__graft_g", sort_array(array_distinct(
        org.apache.spark.sql.graft.VecFunctions.gram_hash(col("__graft_th"), n))))
    staged
      .withColumn("n_grams", size(col("__graft_g")).cast("long"))
      .withColumn("n_contaminated",
        org.apache.spark.sql.graft.VecFunctions
          .sorted_long_intersect_count(col("__graft_g"),
            typedLit(sortedKeys)).cast("long"))
      .withColumn("contamination_frac",
        when(col("n_grams") === 0, lit(0.0))
          .otherwise(col("n_contaminated").cast("double") / col("n_grams")))
      .drop("__graft_tk", "__graft_th", "__graft_g")
  }
}
