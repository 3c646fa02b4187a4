package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus curation: the dedup key of choice
  * for crawled corpora (C4, CCNet, RefinedWeb all dedup or partition by
  * normalized URL / host before any content-level pass — it is orders of
  * magnitude cheaper than text similarity and catches re-crawls exactly).
  *
  * Everything here is a stateless per-row projection built from
  * `regexp_replace`/`regexp_extract` in the Java-regex ∩ RE2 subset
  * (same contract as [[Scrub]]): codegen'd, embarrassingly parallel, no
  * shuffle, runs unchanged on Structured Streaming.
  *
  * Canonicalization applied by [[normalize]], in order:
  *   1. trim surrounding whitespace;
  *   2. drop the `#fragment` (never server-visible);
  *   3. lowercase the scheme and authority (host names are
  *      case-insensitive; paths are NOT touched);
  *   4. drop scheme-default ports (`http://h:80/` → `http://h/`,
  *      `https://h:443/` → `https://h/`);
  *   5. strip tracking query parameters (`utm_*`, `fbclid`, `gclid`,
  *      `msclkid`, `mc_eid` by default) and tidy the separators left
  *      behind (`?&a` → `?a`, trailing `?`/`&` dropped);
  *   6. collapse a bare root path `http://h/` → `http://h`.
  */
object UrlOps {

  /** Tracking-parameter keys stripped by default (the ad-click and
    * mail-campaign families that make otherwise-identical crawls hash
    * differently).
    */
  val TrackingParams: Seq[String] =
    Seq("utm_[A-Za-z0-9_]*", "fbclid", "gclid", "msclkid", "mc_eid")

  /** The full canonicalization chain (steps documented on the object). */
  def normalize(url: Column,
                trackingParams: Seq[String] = TrackingParams): Column = {
    val t0 = trim(url)
    val noFrag = regexp_replace(t0, "#.*", "")
    // lowercase scheme://authority, leave path/query casing alone
    val prefix = regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?]*)", 1)
    val lowered = when(prefix === "", noFrag)
      .otherwise(concat(lower(prefix),
        substring(noFrag, length(prefix) + 1, lit(1000000))))
    val noPort = regexp_replace(
      regexp_replace(lowered, "^(http://[^/:?]+):80([/?]|$)", "$1$2"),
      "^(https://[^/:?]+):443([/?]|$)", "$1$2")
    val keys = trackingParams.mkString("|")
    val noTrack = regexp_replace(noPort, s"([?&])($keys)=[^&#]*", "$1")
    val tidySep = regexp_replace(noTrack, "([?&])&+", "$1")
    val noTrail = regexp_replace(tidySep, "[?&]+$", "")
    regexp_replace(noTrail, "^(https?://[^/?]+)/$", "$1")
  }

  /** Lowercased host (authority minus userinfo and port); empty string
    * when the value does not parse as a scheme-ful URL.
    */
  def host(url: Column): Column =
    lower(regexp_extract(trim(url),
      "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/:?#]+)", 1))

  /** Heuristic registrable domain ("example.co.uk", "example.com"):
    * the last two host labels, or the last three when the host ends in a
    * two-part country-code suffix (`co.uk`, `com.au`, …). A full public-
    * suffix list is a data file, not an algorithm change — swap the
    * `ccSld` alternation for the PSL set in deployments that need exact
    * ICANN boundaries.
    */
  def registrableDomain(hostCol: Column): Column = {
    val ccSld = "(co|com|net|org|ac|gov|edu)\\.[a-z][a-z]"
    val last3 = regexp_extract(hostCol, "([^.]+\\.[^.]+\\.[^.]+)$", 1)
    val last2 = regexp_extract(hostCol, "([^.]+\\.[^.]+)$", 1)
    when(hostCol.rlike(s"\\.$ccSld$$") && last3 =!= "", last3)
      .otherwise(when(last2 =!= "", last2).otherwise(hostCol))
  }
}
