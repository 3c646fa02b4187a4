package graft.dedup

import graft.text.Shingles
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact deduplication: one surviving row per distinct key, canonical =
  * smallest `idCol`. A single hash aggregation (partial map-side combine,
  * one shuffle on the key); at 100 TB the key should be a digest — pass
  * `hashKey = true` to group on `xxhash64` + length instead of the raw
  * payload so shuffle rows stay small (hash collisions at 64 bit are
  * negligible at trillions of rows, and can be re-verified downstream).
  */
object ExactDedup {

  /** @return one row per distinct `keyCols` value: the key columns,
    *         `canonical_id` (min id), `dup_count` (rows collapsed).
    */
  def apply(
      df: DataFrame,
      keyCols: Seq[String],
      idCol: String,
      hashKey: Boolean = false): DataFrame = {
    val keys: Seq[Column] =
      if (hashKey)
        Seq(xxhash64(keyCols.map(col): _*).as("key_hash"),
          keyCols.map(c => length(col(c))).reduce(_ + _).as("key_len"))
      else keyCols.map(col)
    df.groupBy(keys: _*)
      .agg(min(col(idCol)).as("canonical_id"),
        count(lit(1)).as("dup_count"))
  }

  /** Keep-one projection: the input rows whose id is canonical for their
    * key (survivors of exact dedup), dropping all duplicates.
    */
  def survivors(df: DataFrame, keyCols: Seq[String], idCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(idCol).asc)
    df.withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") === 1)
      .drop("__graft_rn")
  }
}

/** MinHash + banded LSH near-duplicate detection over a text column.
  *
  * Pipeline (all built-in expressions until the candidate join):
  *   shingle (word n-grams) → k minhashes (`min(xxhash64(seed_i, s))`)
  *   → b bands of r = k/b rows, each hashed → explode to (band, bucket)
  *   → self-equi-join on (band, bucket) with `idL < idR` → distinct pairs
  *   → verify true Jaccard on the shingle sets → threshold filter.
  *
  * Scale notes: the only shuffle keys are the LSH buckets; mega-buckets
  * (boilerplate shingle sets) are the classic skew source — AQE skew-join
  * splits them, and `maxBucket` drops degenerate buckets outright (a
  * bucket with m rows generates m²/2 candidates; a bucket of 100k
  * identical docs is better handled by [[ExactDedup]] first). Verification
  * re-joins the (small) pair list to the shingles — broadcast when small.
  */
object MinHashDedup {

  /** @param numHashes   k — minhash signature length
    * @param numBands    b — LSH bands (r = k/b); pair collision probability
    *                    is 1−(1−J^r)^b
    * @param shingleN    word n-gram size
    * @param threshold   true-Jaccard acceptance threshold for candidates
    * @param maxBucket   drop LSH buckets with more members (skew guard)
    * @return pairs `(id_l, id_r, jaccard)` with `id_l < id_r`
    */
  def apply(
      df: DataFrame,
      textCol: String,
      idCol: String,
      numHashes: Int = 32,
      numBands: Int = 8,
      shingleN: Int = 3,
      threshold: Double = 0.5,
      maxBucket: Int = 1000): DataFrame = {
    require(numHashes % numBands == 0, "numBands must divide numHashes")
    val r = numHashes / numBands

    val shingled = df.select(
      col(idCol).as("id"),
      Shingles.wordNGrams(col(textCol), shingleN).as("sh"))
      .filter(size(col("sh")) > 0)
      .cache() // reused by banding and by pair verification

    // k minhashes grouped straight into bands — no intermediate signature
    // column (a multiply-referenced alias would be re-evaluated per band
    // under interpreted HOF eval); each minhash `min(xxhash64(i, s))` is
    // computed exactly once, reading the cached shingle column. xxhash64
    // is seeded by prefixing the hash index (it has no seed parameter).
    val bands = transform(
      sequence(lit(0), lit(numBands - 1)),
      b => struct(b.as("band"),
        xxhash64(transform(
          sequence(b * r, b * r + (r - 1)),
          i => array_min(transform(col("sh"), s => xxhash64(i, s))))).as("bucket")))
    val exploded = shingled
      .select(col("id"), explode(bands).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))

    // skew guard: drop degenerate buckets
    val bucketed = exploded.withColumn("bsz",
      count(lit(1)).over(Window.partitionBy(col("band"), col("bucket"))))
      .filter(col("bsz") <= maxBucket)

    // candidate pairs carry only ids through the join + distinct; the
    // (large) shingle arrays are re-attached afterwards for verification
    val l = bucketed.select(col("band"), col("bucket"), col("id").as("id_l"))
    val rt = bucketed.select(col("band"), col("bucket"), col("id").as("id_r"))
    val pairs = l.join(rt, Seq("band", "bucket"))
      .filter(col("id_l") < col("id_r"))
      .select(col("id_l"), col("id_r"))
      .distinct()

    val verified = pairs
      .join(shingled.select(col("id").as("id_l"), col("sh").as("sh_l")), Seq("id_l"))
      .join(shingled.select(col("id").as("id_r"), col("sh").as("sh_r")), Seq("id_r"))
    Shingles.stageJaccard(verified, "sh_l", "sh_r", "jaccard")
      .filter(col("jaccard") >= threshold)
      .select(col("id_l"), col("id_r"), col("jaccard"))
  }
}

/** SimHash near-duplicate detection: 64-bit fingerprint = sign-aggregated
  * token hash bits; near-dups = fingerprints within `maxHamming` bits,
  * found by the pigeonhole block trick (split 64 bits into
  * `maxHamming + 1` blocks; any pair within distance shares ≥ 1 exact
  * block → equi-join per block, verify true Hamming distance).
  */
object SimHashDedup {

  // the Scala `shiftright`/`shiftleft` wrappers only take literal shift
  // amounts; the SQL functions accept a column
  private def shr(c: Column, n: Column): Column = call_function("shiftright", c, n)
  private def shru(c: Column, n: Column): Column = call_function("shiftrightunsigned", c, n)
  private def shl(c: Column, n: Column): Column = call_function("shiftleft", c, n)

  /** Per-bit vote counts from a token-HASH array column: one pass over the
    * hashes, accumulating a 64-int vote vector (bit j set in a hash ⇒ +1,
    * else −1). Higher-order functions are interpreted (not codegen'd) and
    * interpreted eval has no common-subexpression elimination, so this is
    * deliberately a SINGLE aggregate over a pre-materialized hash column —
    * never re-derive the hashes or votes inside another lambda.
    */
  private[dedup] def bitVotes(tokenHashes: Column): Column =
    aggregate(
      tokenHashes,
      array_repeat(lit(0), 64),
      (acc, h) => zip_with(acc, sequence(lit(0), lit(63)),
        (a, j) => a + when(shr(h, j).bitwiseAND(1) === 1, 1).otherwise(-1)))

  /** Fold a 64-int vote vector into the 64-bit simhash. References the
    * `votes` expression exactly ONCE (a multiply-referenced subexpression
    * is re-evaluated per reference under interpreted HOF eval — a 64×
    * blowup when `votes` is itself an aggregate).
    */
  private[dedup] def votesToBits(votes: Column): Column =
    aggregate(
      zip_with(votes, sequence(lit(0), lit(63)),
        (v, j) => when(v > 0, shl(lit(1L), j)).otherwise(lit(0L))),
      lit(0L),
      (acc, x) => acc + x)

  /** 64-bit simhash of a token-array column: bit j of the result is 1 iff
    * Σ_tokens sign(bit j of xxhash64(token)) > 0. Prefer the staged
    * [[apply]] pipeline at scale — this single-expression form re-derives
    * the token hashes inside the vote pass.
    */
  def simhash(tokens: Column): Column =
    votesToBits(bitVotes(transform(tokens, t => xxhash64(t))))

  private def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** @return pairs `(id_l, id_r, hamming)` with `id_l < id_r` and
    *         Hamming distance ≤ `maxHamming`.
    */
  def apply(
      df: DataFrame,
      textCol: String,
      idCol: String,
      maxHamming: Int = 3): DataFrame = {
    val blocks = maxHamming + 1
    val bits = 64 / blocks

    // staged: tokens → hashes → votes → fingerprint, each as a named
    // column in its own Project — expensive arrays are materialized once
    // per row instead of being re-derived inside downstream lambdas
    // (interpreted HOF eval has no CSE; CollapseProject keeps multiply-
    // referenced non-cheap aliases in separate stages)
    val hashed = df
      .select(col(idCol).as("id"),
        transform(Shingles.tokens(col(textCol)), t => xxhash64(t)).as("th"))
      .withColumn("votes", bitVotes(col("th")))
      .select(col("id"), votesToBits(col("votes")).as("sh64"))

    // pigeonhole: explode each fingerprint into its blocks
    val blockCol = explode(
      transform(sequence(lit(0), lit(blocks - 1)), b =>
        struct(b.as("blk"),
          // block b = bits [b*bits, (b+1)*bits); last block takes the rest
          when(b === blocks - 1, shru(col("sh64"), b * bits))
            .otherwise(shru(col("sh64"), b * bits)
              .bitwiseAND((1L << bits) - 1)).as("key"))))
    val exploded = hashed.select(col("id"), col("sh64"), blockCol.as("bb"))
      .select(col("id"), col("sh64"), col("bb.blk").as("blk"), col("bb.key").as("key"))

    val l = exploded.select(col("blk"), col("key"), col("id").as("id_l"), col("sh64").as("h_l"))
    val r = exploded.select(col("blk"), col("key"), col("id").as("id_r"), col("sh64").as("h_r"))
    l.join(r, Seq("blk", "key"))
      .filter(col("id_l") < col("id_r"))
      .select(col("id_l"), col("id_r"), hamming(col("h_l"), col("h_r")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("id_l", "id_r")
  }
}

/** Exact n-gram (or token-set) Jaccard near-dup join with equality
  * blocking — the brute-force baseline the LSH variants approximate.
  * Quadratic within a block; use only with a selective `blockBy` (e.g.
  * language, length bucket) or at verification scale.
  */
object NgramJaccardDedup {

  def apply(
      df: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 1,
      threshold: Double = 0.5,
      blockBy: Seq[String] = Nil): DataFrame = {
    val grams =
      if (n == 1) array_distinct(Shingles.tokens(col(textCol)))
      else Shingles.wordNGrams(col(textCol), n)
    val base = df.select(
      (col(idCol).as("id") +: grams.as("sh") +: blockBy.map(col)): _*)
    val l = base.select(
      (col("id").as("id_l") +: col("sh").as("sh_l") +: blockBy.map(col)): _*)
    val r = base.select(
      (col("id").as("id_r") +: col("sh").as("sh_r") +: blockBy.map(col)): _*)
    val joined =
      if (blockBy.nonEmpty) l.join(r, blockBy)
      else l.crossJoin(r)
    Shingles.stageJaccard(
        joined.filter(col("id_l") < col("id_r")), "sh_l", "sh_r", "jaccard")
      .filter(col("jaccard") >= threshold)
      .select(col("id_l"), col("id_r"), col("jaccard"))
  }
}
