package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text normalization ahead of dedup/fingerprinting: exact dedup is
  * case- and whitespace-brittle, so pipelines canonicalize first (C4,
  * RefinedWeb, Gopher all normalize before hashing). Kept to transforms
  * with identical semantics in the Java-regex ∩ RE2 subset (the same
  * contract as [[Scrub]]) so results are engine-portable:
  *
  *  - lowercase (locale-free),
  *  - control characters (except \n\t) → space,
  *  - runs of whitespace → one space,
  *  - trim.
  *
  * Unicode canonical forms (NFC/NFKC) are deliberately out: they need a
  * normalization table, have no cross-engine oracle, and this corpus is
  * ASCII; a custom Expression could add them later.
  *
  * Scale posture: a pure per-row codegen'd projection — no shuffle, no
  * UDF, runs unchanged on streams.
  */
object TextClean {

  /** The normalization as a column expression. */
  def clean(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[\\x00-\\x08\\x0b-\\x1f\\x7f]", " "),
      "\\s+", " "))

  /** Adds `<textCol>_clean`. */
  def apply(df: DataFrame, textCol: String): DataFrame =
    df.withColumn(s"${textCol}_clean", clean(col(textCol)))
}
