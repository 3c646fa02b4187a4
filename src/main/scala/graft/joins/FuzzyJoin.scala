package graft.joins

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Edit-distance (Levenshtein) join without a cartesian product —
  * the record-linkage / entity-resolution primitive ("join these two
  * name tables allowing ≤ k typos") that a naive Spark plan executes
  * as a BroadcastNestedLoopJoin over |L|·|R| `levenshtein` calls.
  *
  * Method — q-gram prefix filtering (Gravano et al. 2001's count
  * filter + the prefix-filter family of PPJoin): an edit operation
  * destroys at most `q` of a string's positional q-grams, so two
  * strings within distance `k` share all but ≤ `k·q` grams; under ANY
  * global total order on grams, each string's first `k·q + 1` grams
  * (its "prefix") must then intersect its partner's. Candidates =
  * pairs sharing ≥ 1 prefix gram; the exact `levenshtein(l, r, k)`
  * (codegen'd, threshold-bounded) verifies each candidate once, so the
  * OUTPUT IS EXACT — blocking only bounds the candidate count, never
  * the result.
  *
  * Gram bookkeeping: strings are padded with `q−1` sentinel chars per
  * side (so every non-empty string has `len + q − 1` grams) and grams
  * are occurrence-NUMBERED (`(gram, i-th repeat)`), which makes set
  * intersection equal multiset intersection — the count bound is a
  * multiset statement, and un-numbered grams of repetitive strings
  * ("aaaa…") would overcount sharing.
  *
  * Scale posture:
  *   - the gram stream is a stateless per-row explode; prefix selection
  *     is a per-string window (partition = one string's ≤ `k·q+1 +`
  *     few grams — never a hot token's);
  *   - the candidate join shuffles on the gram value. Default order is
  *     `xxhash64(gram)` — zero extra passes, but a Zipf-head gram
  *     ("aa" in names) can still bucket-explode, so `maxBucket` counts
  *     and REFUSES oversized gram buckets loudly rather than melting
  *     an executor. `frequencyOrder = true` spends one extra
  *     df-aggregation + join to order grams rarest-first, which makes
  *     prefixes rare by construction — the right switch for skewed
  *     corpora at 100 TB;
  *   - strings too short to carry `k·q + 1` grams (len ≤ `(k−1)·q+1`;
  *     for k=1,q=2 that is single chars) fall outside the prefix
  *     guarantee and are completed by an explicit short-block pairing,
  *     count-guarded by `maxShortSide` — at real scale this block is
  *     degenerate unless the data is adversarial, and then refusing is
  *     the correct behavior.
  *
  * Nulls on either side never match (SQL convention). Equality `on`
  * keys co-partition the candidate join when given.
  */
object FuzzyJoin {

  /** Pairs `(idL, strL, idR, strR, dist)` with `levenshtein ≤ maxDistance`.
    *
    * @param leftId/rightId  unique id columns (carried through)
    * @param leftCol/rightCol string columns to match
    * @param maxDistance     k ≥ 1
    * @param q               gram width (2 is right for short strings
    *                        like names; 3 for longer text keys)
    * @param frequencyOrder  order prefix grams by global document
    *                        frequency (rarest first) instead of hash —
    *                        one extra aggregation, far fewer candidates
    *                        on skewed data
    * @param maxBucket       refuse candidate gram buckets whose combined
    *                        left + right prefix count exceeds this (hash
    *                        order only — frequency order cannot
    *                        concentrate a hot gram in prefixes)
    * @param maxShortSide    refuse the short-string completion block
    *                        when either side exceeds this count
    */
  def apply(
      left: DataFrame,
      right: DataFrame,
      leftId: String, leftCol: String,
      rightId: String, rightCol: String,
      maxDistance: Int,
      q: Int = 2,
      frequencyOrder: Boolean = false,
      maxBucket: Int = 100000,
      maxShortSide: Int = 100000): DataFrame = {
    require(maxDistance >= 1, "maxDistance must be >= 1")
    require(q >= 2, "q must be >= 2")
    val k = maxDistance
    val prefixLen = k * q + 1

    val l = left.select(col(leftId).as("__fz_lid"),
      col(leftCol).as("__fz_l")).filter(col("__fz_l").isNotNull)
    val r = right.select(col(rightId).as("__fz_rid"),
      col(rightCol).as("__fz_r")).filter(col("__fz_r").isNotNull)

    // ── numbered padded grams ───────────────────────────────────────────
    // control-char sentinels (distinct per side so head/tail grams cannot
    // collide with data), q−1 per side: every non-empty string carries
    // len + q − 1 grams
    val padL = lit("\u0001" * (q - 1))
    val padR = lit("\u0002" * (q - 1))
    def gramStream(df: DataFrame, strC: String): DataFrame = {
      val padded = concat(padL, col(strC), padR)
      val withPad = df.withColumn("__fz_padded", padded)
      withPad
        .withColumn("__fz_pos",
          explode(sequence(lit(1), length(col("__fz_padded")) - (q - 1))))
        .withColumn("__fz_gram",
          expr(s"substring(__fz_padded, __fz_pos, $q)"))
        .withColumn("__fz_occ", row_number().over(
          Window.partitionBy(col("__fz_sid"), col("__fz_gram"))
            .orderBy(col("__fz_pos"))))
        .select(col("__fz_sid"), col("__fz_gram"), col("__fz_occ"))
    }

    val lLong = l.filter(length(col("__fz_l")) > shortLen(k, q))
    val rLong = r.filter(length(col("__fz_r")) > shortLen(k, q))
    val lg = gramStream(lLong.withColumn("__fz_sid", col("__fz_lid")), "__fz_l")
    val rg = gramStream(rLong.withColumn("__fz_sid", col("__fz_rid")), "__fz_r")

    // ── global gram order: hash (free) or df (rarest-first) ─────────────
    val (lOrd, rOrd) =
      if (!frequencyOrder) {
        val o = (df: DataFrame) => df.withColumn("__fz_ord",
          xxhash64(col("__fz_gram"), col("__fz_occ")))
        (o(lg), o(rg))
      } else {
        val df = lg.select(col("__fz_gram"), col("__fz_occ"))
          .unionByName(rg.select(col("__fz_gram"), col("__fz_occ")))
          .groupBy("__fz_gram", "__fz_occ").agg(count(lit(1)).as("__fz_df"))
        val o = (g: DataFrame) => g.join(df, Seq("__fz_gram", "__fz_occ"))
          .withColumn("__fz_ord",
            col("__fz_df") * 4294967296L +
              pmod(xxhash64(col("__fz_gram"), col("__fz_occ")),
                lit(4294967296L)))
        (o(lg), o(rg))
      }

    // per-string prefix: first k·q+1 numbered grams under the order
    def prefix(g: DataFrame): DataFrame = g
      .withColumn("__fz_rk", row_number().over(
        // tie-break by the element itself: the global order must be
        // TOTAL and side-consistent or the prefix theorem breaks
        Window.partitionBy(col("__fz_sid"))
          .orderBy(col("__fz_ord"), col("__fz_gram"), col("__fz_occ"))))
      .filter(col("__fz_rk") <= prefixLen)
      .select(col("__fz_sid"), col("__fz_gram"), col("__fz_occ"))
    val lp = prefix(lOrd)
    val rp = prefix(rOrd)

    // skew guard on the hash order: a hot gram bucket would explode the
    // candidate join quadratically. Counted over BOTH prefix streams —
    // a hot gram concentrated on the right side alone explodes the
    // candidate join just the same (candidates per gram = |lp|·|rp|).
    if (!frequencyOrder) {
      // BOUNDED collect: limit(1) — at most ONE row crosses the driver,
      // whatever the corpus size (the aggregation runs distributed; the
      // collect is only the existence witness for the loud failure)
      val hot = lp.select(col("__fz_gram"), col("__fz_occ"))
        .unionByName(rp.select(col("__fz_gram"), col("__fz_occ")))
        .groupBy("__fz_gram", "__fz_occ")
        .agg(count(lit(1)).as("c")).filter(col("c") > maxBucket)
        .limit(1).collect()
      require(hot.isEmpty,
        s"prefix gram bucket exceeds maxBucket=$maxBucket " +
          s"(gram ${hot.headOption.map(_.get(0))}); pass " +
          "frequencyOrder = true or raise maxBucket")
    }

    val lpK = lp.withColumnRenamed("__fz_sid", "__fz_lid")
    val rpK = rp.withColumnRenamed("__fz_sid", "__fz_rid")
    val cands = lpK.join(rpK, Seq("__fz_gram", "__fz_occ"))
      .select(col("__fz_lid"), col("__fz_rid"))
      .distinct()

    // ── exact verify (threshold-bounded levenshtein) ────────────────────
    def verify(pairs: DataFrame): DataFrame = pairs
      .join(l, "__fz_lid").join(r, "__fz_rid")
      .filter(abs(length(col("__fz_l")) - length(col("__fz_r"))) <= k)
      .withColumn("__fz_d", levenshtein(col("__fz_l"), col("__fz_r"), k))
      .filter(col("__fz_d") >= 0 && col("__fz_d") <= k)

    // ── short-string completion (outside the prefix guarantee) ──────────
    val shortCap = shortLen(k, q) + k
    val lShort = l.filter(length(col("__fz_l")) <= shortLen(k, q))
    val rShort = r.filter(length(col("__fz_r")) <= shortCap)
    val lShortCap = l.filter(length(col("__fz_l")) <= shortCap)
    val rShortOnly = r.filter(length(col("__fz_r")) <= shortLen(k, q))
    val nShort = Seq(lShort.limit(maxShortSide + 1).count(),
      rShort.limit(maxShortSide + 1).count(),
      lShortCap.limit(maxShortSide + 1).count(),
      rShortOnly.limit(maxShortSide + 1).count())
    require(nShort.forall(_ <= maxShortSide),
      s"short-string block exceeds maxShortSide=$maxShortSide rows; " +
        "raise it only if the cross-block is genuinely affordable")
    val shortPairs =
      lShort.crossJoin(rShort)
        .unionByName(lShortCap.crossJoin(rShortOnly))
        .select(col("__fz_lid"), col("__fz_rid")).distinct()

    val out = verify(cands)
      .unionByName(verify(shortPairs))
      .dropDuplicates("__fz_lid", "__fz_rid")
    out.select(
      col("__fz_lid").as(leftId), col("__fz_l").as(leftCol),
      col("__fz_rid").as(rightId), col("__fz_r").as(rightCol),
      col("__fz_d").cast("long").as("distance"))
  }

  /** Longest length that cannot carry a full prefix: padded gram count
    * `len + q − 1 ≤ k·q` ⇔ `len ≤ (k−1)·q + 1`. */
  private def shortLen(k: Int, q: Int): Int = (k - 1) * q + 1
}
