package graft.joins

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join — explicit skew mitigation for hot join keys.
  *
  * Hash partitioning sends every row of a hot key to ONE reducer; with a
  * handful of dominant keys (a power-law id, a country code, a default
  * value) one task does most of the work no matter how many executors
  * exist. AQE's skew-join splitting handles the sort-merge case
  * automatically, but not every shape (e.g. a shuffled-hash join it
  * cannot split, a skewed aggregation feeding the join, or a join buried
  * inside a custom operator where AQE's stats are off). Salting is the
  * explicit fix: the big side gets a uniform salt in [0, salts), the
  * small side is replicated once per salt value, and the join runs on
  * (keys, salt) — each hot key now spreads over `salts` reducers.
  *
  * Cost model: the small side shuffles/broadcasts `salts` times its size
  * — pick `salts` ≈ (hot-key row count) / (rows a single task should
  * own); 8-32 covers most real skew.
  *
  * Semantics: identical to `big.join(small, on, how)` for `how` ∈
  * inner / left_outer (the big-side-preserving joins — each big row
  * carries exactly one salt, so it matches exactly the small rows it
  * would have matched unsalted, and appears exactly once when unmatched
  * under left_outer). Null keys follow plain `===` join semantics
  * (never match). Right/full joins are rejected: the replicated small
  * side would emit its unmatched rows once per salt.
  *
  * The salt is derived by hashing the big row's non-key columns (plus a
  * fixed seed), not `rand()`: deterministic under task retry and
  * re-evaluation, which nondeterministic expressions in join inputs are
  * not (see SPARK-23207 for the class of bug). Duplicate big rows land
  * on the same salt — harmless, they'd match the same small rows anyway.
  */
object SaltedJoin {

  val SaltCol = "__graft_salt"

  def apply(
      big: DataFrame,
      small: DataFrame,
      on: Seq[String],
      salts: Int,
      how: String = "inner"): DataFrame = {
    require(on.nonEmpty, "SaltedJoin needs equality keys")
    require(salts > 0, "salts must be positive")
    require(Seq("inner", "left", "left_outer").contains(how),
      s"how=$how: only big-side-preserving joins (inner/left) are salt-safe")

    val nonKey = big.columns.filterNot(on.contains)
    // hash of the non-key columns: spreads a hot key's rows across salts
    // as long as rows differ anywhere outside the key (add a unique id
    // column upstream if they don't)
    val saltExpr =
      if (nonKey.isEmpty) pmod(spark_partition_id(), lit(salts))
      else pmod(hash(lit(0x5a17) +: nonKey.map(col): _*), lit(salts))

    val bigS = big.withColumn(SaltCol, saltExpr)
    // sequence(int, int) is array<int>, matching pmod's int salt
    val smallS = small.withColumn(SaltCol,
      explode(sequence(lit(0), lit(salts - 1))))
    bigS.join(smallS, on :+ SaltCol, how).drop(SaltCol)
  }
}
