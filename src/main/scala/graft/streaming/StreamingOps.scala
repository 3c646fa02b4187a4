package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Row types of [[StreamingOps.trendingTokens]] (top-level so Spark can
  * derive product encoders). */
case class TokenWindowEvent(ws: java.sql.Timestamp, token: String)
/** State of [[StreamingOps.streamingQuotaSample]] (top-level for the
  * product encoder). */
case class QuotaState(taken: Long)
case class TrendState(counts: Map[String, Long])
case class Trend(window_start: java.sql.Timestamp, token: String,
                 n: Long, rank: Int)

/** Structured Streaming variants of the engine's core operators.
  *
  * The reference is batch-only (SURVEY.md §1.1: no streaming surface), so
  * none of this is parity — it is the natural extension SURVEY.md §7
  * notes: a 100 TB training-data pipeline ingests events continuously,
  * and the same declarative plans run incrementally under watermarks.
  * Each function takes/returns a streaming DataFrame (`readStream` in,
  * `writeStream` out is the caller's concern), so they compose with the
  * batch operators that are expressible in append/update modes.
  */
object StreamingOps {

  /** Live curation-funnel feed: the batch [[graft.core.Funnel]]'s
    * first-fail attribution (a stateless nested-CASE projection —
    * identical semantics, same Column) grouped under a watermarked
    * tumbling window, so an ingest pipeline sees per-window
    * `(stage, rows)` attrition as a stream — gate drift (a broken
    * upstream feed suddenly failing the language gate) surfaces within
    * one window instead of at the next batch report. `stage_idx =
    * stages.length` rows are the survivors ("kept"). State is one
    * count per (window, stage) — bounded by the watermark, never the
    * stream.
    */
  def streamingFunnel(
      stream: DataFrame,
      timeCol: String,
      stages: Seq[(String, org.apache.spark.sql.Column)],
      watermark: String,
      windowDur: String): DataFrame = {
    require(stages.map(_._1).distinct.length == stages.length,
      "stage names must be unique")
    val names = stages.map(_._1) :+ "kept"
    stream.withWatermark(timeCol, watermark)
      .groupBy(window(col(timeCol), windowDur).as("win"),
        graft.core.Funnel.firstFailStage(stages).as("stage_idx"))
      .agg(count(lit(1)).as("rows"))
      .select(col("win.start").as("win_start"), col("stage_idx"),
        element_at(typedLit(names), col("stage_idx") + 1).as("stage"),
        col("rows"))
  }

  /** Streaming analog of `group_intervals` on point events: per-entity
    * session windows with inactivity gap `gap` — events closer than the
    * gap coalesce into one session, exactly single-linkage clustering
    * with `distance = gap` over degenerate (point) intervals
    * (`misc.py:125-257`). Spark's `session_window` maintains the merge
    * state incrementally; the watermark bounds it.
    *
    * @return entity, session_start, session_stop, n_events, v_sum
    */
  def sessionize(
      events: DataFrame,
      timeCol: String,
      entityCol: String,
      valueCol: String,
      gap: String,
      watermark: String): DataFrame =
    events
      .withWatermark(timeCol, watermark)
      .groupBy(col(entityCol), session_window(col(timeCol), gap).as("w"))
      .agg(count(lit(1)).as("n_events"), sum(col(valueCol)).as("v_sum"))
      .select(col(entityCol),
        col("w.start").as("session_start"), col("w.end").as("session_stop"),
        col("n_events"), col("v_sum"))

  /** Streaming fast path of `resample_eav` for REGULAR tumbling/sliding
    * windows (the `window()` bucketing SURVEY.md §2.9 identifies): per
    * (entity, attribute, window) aggregation with a watermark for state
    * eviction. Irregular explicit windows need the batch operator — a
    * stream-batch interval join is not expressible incrementally without
    * a state-store operator.
    *
    * @param obs       streaming frame with `timeCol` (event time),
    *                  `entityCol`, `attrCol`, `valueCol`
    * @param watermark max event-time lateness, e.g. "10 minutes"
    * @param windowDur tumbling window duration, e.g. "1 hour"
    * @param slide     optional slide (sliding windows when ≠ windowDur)
    * @return columns: entity, attribute, win_start, win_stop, n, v_sum,
    *         v_min, v_max, v_avg (count-like semantics match the batch
    *         operator: counts of non-null values)
    */
  def resampleEavRegular(
      obs: DataFrame,
      timeCol: String,
      entityCol: String,
      attrCol: String,
      valueCol: String,
      watermark: String,
      windowDur: String,
      slide: Option[String] = None): DataFrame = {
    val w = slide match {
      case Some(s) => window(col(timeCol), windowDur, s)
      case None    => window(col(timeCol), windowDur)
    }
    obs
      .withWatermark(timeCol, watermark)
      .groupBy(col(entityCol), col(attrCol), w.as("win"))
      .agg(
        count(col(valueCol)).as("n"),
        sum(col(valueCol)).as("v_sum"),
        min(col(valueCol)).as("v_min"),
        max(col(valueCol)).as("v_max"),
        avg(col(valueCol)).as("v_avg"))
      .select(col(entityCol), col(attrCol),
        col("win.start").as("win_start"), col("win.end").as("win_stop"),
        col("n"), col("v_sum"), col("v_min"), col("v_max"), col("v_avg"))
  }

  /** Streaming top-k trending tokens per tumbling window — the
    * custom-state streaming surface (`flatMapGroupsWithState`): the
    * per-window token counts are arbitrary user state Spark's built-in
    * streaming aggregation cannot rank incrementally (a windowed
    * `groupBy(token).count` cannot emit "top k per window" in append
    * mode). State per window is one bounded count map; an event-time
    * timeout fires once the watermark passes the window end, emitting
    * the final ranking exactly once and dropping the state.
    *
    * `maxTokens` bounds state for adversarial vocabularies: when the map
    * overflows, the smallest counts are evicted (top-k of what remains
    * is exact for `k ≪ maxTokens` unless an evicted token re-surges —
    * the standard space-bounded heavy-hitters tradeoff).
    */
  def trendingTokens(
      docs: DataFrame,
      timeCol: String,
      textCol: String,
      windowMillis: Long,
      k: Int,
      watermark: String,
      maxTokens: Int = 10000): Dataset[Trend] = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(windowMillis > 0 && k > 0 && maxTokens >= k,
      "need windowMillis > 0, 0 < k <= maxTokens")
    // the watermark is declared on the WINDOW-START column (the grouping
    // key itself): the original event-time column does not survive the
    // projection, and the stateful operator needs a watermarked column
    // in ITS input to drive event-time timeouts
    val toks = docs
      .select(
        window(col(timeCol), s"$windowMillis milliseconds")
          .getField("start").as("ws"),
        explode(graft.text.Shingles.tokens(col(textCol))).as("token"))
      .withWatermark("ws", watermark)
      .as[TokenWindowEvent]
    toks.groupByKey(_.ws)
      .flatMapGroupsWithState[TrendState, Trend](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (ws, events, state) =>
          if (state.hasTimedOut) {
            val counts = state.get.counts
            state.remove()
            counts.toSeq.sortBy { case (t, n) => (-n, t) }.take(k)
              .zipWithIndex
              .map { case ((t, n), i) => Trend(ws, t, n, i + 1) }.iterator
          } else {
            var m = state.getOption.map(_.counts).getOrElse(Map.empty[String, Long])
            events.foreach(e => m = m.updated(e.token, m.getOrElse(e.token, 0L) + 1L))
            if (m.size > maxTokens)
              m = m.toSeq.sortBy { case (t, n) => (-n, t) }.take(maxTokens).toMap
            state.update(TrendState(m))
            // fire when the watermark passes the window end. The upstream
            // watermark filter guarantees surviving rows have ws >= the
            // batch watermark (so ws + window > watermark), but clamp
            // anyway — a timeout at-or-before the current watermark
            // throws and would kill the query, and insurance is free
            state.setTimeoutTimestamp(
              math.max(ws.getTime + windowMillis, state.getCurrentWatermarkMs + 1))
            Iterator.empty
          }
      }
  }

  /** Streaming per-stratum quota sampling: pass rows through until each
    * stratum has emitted `quota`, then drop — the admission-control
    * counterpart of the batch [[graft.sample.Sampling.stratified]] (which
    * needs a complete view to rank; a stream admits in arrival order).
    * "Collect at most N documents per language from the firehose."
    *
    * State is ONE long per stratum — bounded by stratum cardinality, not
    * data volume, and it never needs eviction (a filled quota must stay
    * filled, which is why this uses explicit `mapGroupsWithState` rather
    * than a watermarked aggregation). Within a micro-batch admission
    * follows the batch's iterator order; across batches the counter is
    * exact — at most `quota` rows per stratum ever emit.
    */
  def streamingQuotaSample(
      df: DataFrame,
      strataCol: String,
      quota: Long): DataFrame = {
    require(quota > 0, "quota must be positive")
    implicit val stateEnc: org.apache.spark.sql.Encoder[QuotaState] =
      org.apache.spark.sql.Encoders.product[QuotaState]
    implicit val rowEnc: org.apache.spark.sql.Encoder[org.apache.spark.sql.Row] =
      org.apache.spark.sql.Encoders.row(df.schema)
    df.groupByKey(r => String.valueOf(r.getAs[Any](strataCol)))(
        org.apache.spark.sql.Encoders.STRING)
      .flatMapGroupsWithState[QuotaState, org.apache.spark.sql.Row](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_, rows, state) =>
          val already  = state.getOption.map(_.taken).getOrElse(0L)
          val room     = math.max(quota - already, 0L)
          val admitted = rows.take(math.min(room, Int.MaxValue.toLong).toInt).toSeq
          state.update(QuotaState(already + admitted.size))
          admitted.iterator
      }
      .toDF()
  }

  /** Streaming exact dedup: keep the first occurrence of each key within
    * the watermark horizon (`dropDuplicates` keyed state, evicted by the
    * event-time watermark — the streaming analog of
    * [[graft.dedup.ExactDedup.survivors]]).
    */
  def streamingExactDedup(
      df: DataFrame,
      keyCols: Seq[String],
      timeCol: String,
      watermark: String): DataFrame =
    df.withWatermark(timeCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Streaming near-duplicate suppression by SimHash fingerprint: keep
    * the first document whose 64-bit simhash has not been seen within the
    * watermark horizon. The fingerprint is a stateless codegen'd
    * expression ([[org.apache.spark.sql.graft.SimHash64]] — native
    * expressions run unchanged inside streaming plans), so the only state
    * is the keyed dedup store, evicted by the watermark.
    *
    * Exact-signature matching catches identical and near-identical
    * documents (a d-bit flip changes the signature, so this is the
    * streaming recall floor; the full pigeonhole pair search stays a
    * batch operator — its self-join is not incremental).
    *
    * On a BATCH frame the identical fingerprint plan runs with the
    * deterministic analog of first-arrival: the earliest-`timeCol` row
    * per signature (a keyed window, not `dropDuplicates`, whose batch
    * row choice is nondeterministic) — how the driver query puts this
    * gate under the DuckDB oracle. Ties on `timeCol` within a signature
    * break arbitrarily; feed a unique event time for full determinism.
    *
    * @param tokenHash token → 64-bit hash; default `xxhash64`.
    *                  Swappable for a cross-engine-reproducible hash
    *                  (md5 prefix) in differential oracles.
    */
  def streamingSimHashDedup(
      docs: DataFrame,
      textCol: String,
      timeCol: String,
      watermark: String,
      tokenHash: Column => Column = (t: Column) => xxhash64(t)): DataFrame = {
    val sig = docs.withColumn("__graft_sh64",
      graft.dedup.SimHashDedup.fingerprint(col(textCol), tokenHash))
    val kept =
      if (sig.isStreaming)
        sig.withWatermark(timeCol, watermark)
          .dropDuplicatesWithinWatermark(Seq("__graft_sh64"))
      else
        sig.withColumn("__graft_rn",
            row_number().over(org.apache.spark.sql.expressions.Window
              .partitionBy("__graft_sh64").orderBy(col(timeCol))))
          .filter(col("__graft_rn") === 1).drop("__graft_rn")
    kept.withColumnRenamed("__graft_sh64", "simhash")
  }

  /** Streaming PERCEPTUAL media gate — the media member of the gate
    * family (exact / MinHash / SimHash / semantic / media): keep the
    * first arriving image per 64-bit average-hash fingerprint within
    * the watermark horizon, so re-encoded/brightness-jittered copies of
    * an already-seen picture are suppressed on ingest. The fingerprint
    * ([[graft.multimodal.Media.aHash64]]: decode → integer luminance
    * grid → exact mean-threshold bits) is computed in a stateless
    * `mapPartitions` batch — decode is inherently JVM work, the same
    * batched shape as the batch extractors — so the ONLY state is the
    * keyed dedup store, evicted by the watermark. Non-image and
    * undecodable payloads are DROPPED (the gate is image-scoped;
    * quarantine corrupt blobs upstream via `extractFeatures`'s empty-
    * features contract).
    *
    * Exact-fingerprint matching is the streaming recall floor (a
    * Hamming-1 flip changes the key); the full Hamming ≤ h pair search
    * stays the batch operator `q_media_dedup` runs — its pigeonhole
    * self-join is not incremental. Same trade as
    * [[streamingSimHashDedup]], documented there.
    *
    * On a BATCH frame the identical fingerprint path runs with the
    * deterministic first-arrival analog (earliest `timeCol` per
    * fingerprint, ties broken by media_id) — how the driver query puts
    * this gate under the DuckDB oracle.
    *
    * @param media (media_id long, kind string, content binary,
    *              `timeCol`) — extra columns are dropped (the decode
    *              stage is typed)
    * @return (media_id, `timeCol`, ahash) — the kept survivors
    */
  def streamingMediaDedup(
      media: DataFrame,
      timeCol: String,
      watermark: String,
      gw: Int = 8,
      gh: Int = 8): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val typed = media.select(col("media_id").cast("long"),
        col("kind").cast("string"), col("content"),
        col(timeCol).cast("timestamp"))
      .as[(Long, String, Array[Byte], java.sql.Timestamp)]
    val fp = typed.mapPartitions { it =>
      it.flatMap { case (id, kind, content, ts) =>
        graft.multimodal.Media.aHash64(kind, content, gw, gh)
          .map(h => (id, ts, h))
      }
    }.toDF("media_id", timeCol, "ahash")
    if (fp.isStreaming)
      fp.withWatermark(timeCol, watermark)
        .dropDuplicatesWithinWatermark(Seq("ahash"))
    else
      fp.withColumn("__graft_rn",
          row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy("ahash").orderBy(col(timeCol), col("media_id"))))
        .filter(col("__graft_rn") === 1).drop("__graft_rn")
  }

  /** Streaming first-arrival AUDIO gate — the media gate family's
    * fourth member (image aHash / video digest / semantic / this):
    * keep the first arriving clip per 63-bit envelope fingerprint
    * ([[graft.multimodal.Media.audioHash64]]: PCM decode → |amplitude|
    * envelope bins → exact-Long DCT band signs) within the watermark
    * horizon, so re-encoded / gain-adjusted copies of already-seen
    * material are suppressed on ingest. The decode+fingerprint stage
    * is stateless (streaming-legal); state is one fingerprint per kept
    * clip, evicted by the watermark. Non-audio, null and empty
    * payloads quarantine (no row). Exact-fingerprint equality only —
    * Hamming-ball near-dup stays with the batch operator
    * ([[graft.multimodal.AudioDedup]]), the standard gate trade
    * documented on [[streamingSimHashDedup]].
    *
    * On a BATCH frame the identical path runs with the deterministic
    * first-arrival analog (earliest `timeCol` per fingerprint, ties by
    * media_id) — how the driver query puts this gate under the DuckDB
    * oracle.
    *
    * @param media (media_id long, kind string, content binary,
    *              `timeCol`) — extra columns are dropped
    * @return (media_id, `timeCol`, afp) — the kept survivors
    */
  def streamingAudioDedup(
      media: DataFrame,
      timeCol: String,
      watermark: String): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val typed = media.select(col("media_id").cast("long"),
        col("kind").cast("string"), col("content"),
        col(timeCol).cast("timestamp"))
      .as[(Long, String, Array[Byte], java.sql.Timestamp)]
    val fp = typed.mapPartitions { it =>
      it.flatMap { case (id, kind, content, ts) =>
        graft.multimodal.Media.audioHash64(kind, content)
          .map(h => (id, ts, h))
      }
    }.toDF("media_id", timeCol, "afp")
    if (fp.isStreaming)
      fp.withWatermark(timeCol, watermark)
        .dropDuplicatesWithinWatermark(Seq("afp"))
    else
      fp.withColumn("__graft_rn",
          row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy("afp").orderBy(col(timeCol), col("media_id"))))
        .filter(col("__graft_rn") === 1).drop("__graft_rn")
  }

  /** Streaming first-arrival VIDEO gate — the media gate extended to
    * the third media kind: each arriving clip is decoded
    * ([[graft.multimodal.Media.decodeVideoFrames]]), per-frame DCT
    * pHashed ([[graft.multimodal.Media.pHashImage]]), and keyed by the
    * md5 digest of its SORTED frame-fingerprint list — exact
    * perceptual equality (same pictures in any per-frame hash order),
    * robust to byte-level re-encoding but NOT a near-dup gate: a
    * Hamming ball is not a keyed equality, so min-Hamming video
    * near-dup stays with the batch operator
    * ([[graft.multimodal.VideoDedup]]), exactly as the SimHash gate
    * defers to its batch pair search. The decode+digest stage is
    * stateless (streaming-legal); state is one digest per kept clip,
    * evicted by the watermark. Non-video or undecodable payloads are
    * quarantined (no row).
    *
    * On a BATCH frame the identical digest path runs with the
    * deterministic first-arrival analog (earliest `timeCol` per
    * digest, ties broken by media_id) — how the driver query puts this
    * gate under the DuckDB oracle (md5 over the comma-joined sorted
    * BIGINT fingerprints is engine-portable).
    *
    * @param media (media_id long, kind string, content binary,
    *              `timeCol`) — extra columns are dropped
    * @return (media_id, `timeCol`, vdigest) — the kept survivors
    */
  def streamingVideoDedup(
      media: DataFrame,
      timeCol: String,
      watermark: String): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val typed = media.select(col("media_id").cast("long"),
        col("kind").cast("string"), col("content"),
        col(timeCol).cast("timestamp"))
      .as[(Long, String, Array[Byte], java.sql.Timestamp)]
    val fp = typed.mapPartitions { it =>
      it.flatMap { case (id, kind, content, ts) =>
        // null content would NPE inside the decode — a poison row must
        // quarantine (no row), not kill the streaming query permanently
        // (the image gate's contract)
        if (kind != "video" || content == null) None
        else {
          val frames = graft.multimodal.Media.decodeVideoFrames(content)
          if (frames.isEmpty) None
          else {
            val fps = frames.map(graft.multimodal.Media.pHashImage).sorted
            val md = java.security.MessageDigest.getInstance("MD5")
              .digest(fps.mkString(",")
                .getBytes(java.nio.charset.StandardCharsets.UTF_8))
            Some((id, ts, md.map("%02x".format(_)).mkString))
          }
        }
      }
    }.toDF("media_id", timeCol, "vdigest")
    if (fp.isStreaming)
      fp.withWatermark(timeCol, watermark)
        .dropDuplicatesWithinWatermark(Seq("vdigest"))
    else
      fp.withColumn("__graft_rn",
          row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy("vdigest").orderBy(col(timeCol), col("media_id"))))
        .filter(col("__graft_rn") === 1).drop("__graft_rn")
  }

  /** Streaming incremental MinHash near-dup gate: each arriving
    * document's near-duplicates (true Jaccard ≥ `threshold`) in a
    * STATIC banded corpus — [[graft.dedup.MinHashDedup.incremental]]'s
    * batch-vs-corpus shape as a stream-static join, so a continuously
    * ingesting pipeline can tag (or drop) near-dups of the existing
    * lake without any corpus-internal pair work.
    *
    * Plan shape (all stream-legal):
    *   - the stream side computes shingle hashes + band buckets IN-ROW
    *     (stateless codegen'd expressions / HOFs — no aggregation);
    *   - the corpus side is banded once per (micro-batch-reused) static
    *     plan: `(band, bucket, id_c, hs_c)` with the count-first hot-
    *     bucket guard of the batch operator — CACHE the returned static
    *     side upstream (or persist the banded signatures, which are
    *     deterministic and append-only at lake scale);
    *   - candidates = stream-static inner equi-join on (band, bucket);
    *     multi-band duplicate hits collapse via
    *     `dropDuplicatesWithinWatermark` keyed on (stream id, corpus
    *     id) — the ONLY stateful step, evicted by the watermark;
    *   - verification = the codegen'd sorted-merge Jaccard on the pair.
    *
    * On a BATCH frame the identical plan runs with the watermark a
    * no-op — that is how the driver query puts this code path under the
    * DuckDB oracle, alongside the MemoryStream spec.
    *
    * @return stream columns `idCol`, `timeCol` + `(id_c, jaccard)` —
    *         one row per (stream doc, matching corpus doc)
    */
  def streamingMinHashDedup(
      stream: DataFrame,
      corpus: DataFrame,
      textCol: String,
      idCol: String,
      timeCol: String,
      watermark: String,
      numHashes: Int = 32,
      numBands: Int = 8,
      shingleN: Int = 3,
      threshold: Double = 0.5,
      maxBucket: Int = 1000): DataFrame = {
    require(numHashes % numBands == 0, "numBands must divide numHashes")
    val r = numHashes / numBands
    import graft.dedup.{Buckets, MinHashDedup}

    // static side: banded corpus signatures + sorted shingle sets,
    // hot buckets refused count-first (same contract as the batch op)
    val cSh = MinHashDedup.hashedShingles(corpus, textCol, idCol, shingleN)
    val cEx = MinHashDedup.bandBuckets(cSh, numBands, r)
      .select(col("id").as("__mh_idc"), col("band"), col("bucket"))
    val cBounded =
      if (maxBucket == Int.MaxValue) cEx
      else cEx.join(
        Buckets.hotKeys(cEx, Seq("band", "bucket"), maxBucket)
          .select(col("band"), col("bucket")),
        Seq("band", "bucket"), "left_anti")
    val cSide = cBounded.join(
      cSh.select(col("id").as("__mh_idc"), sort_array(col("h0")).as("__mh_hsc")),
      Seq("__mh_idc"))

    // stream side: in-row shingle hashes + bands, watermark attached
    // before the stateful dedup downstream
    val sSh = stream
      .withColumn("__mh_tk", graft.text.Shingles.tokens(col(textCol)))
      .withColumn("__mh_th", transform(col("__mh_tk"), t => xxhash64(t)))
      .withColumn("__mh_h0", array_distinct(
        org.apache.spark.sql.graft.VecFunctions.gram_hash(col("__mh_th"), shingleN)))
      .filter(size(col("__mh_h0")) > 0)
      .withColumn("__mh_hsb", sort_array(col("__mh_h0")))
      .select(col(idCol), col(timeCol), col("__mh_hsb"),
        posexplode(org.apache.spark.sql.graft.VecFunctions
          .minhash_bands(col("__mh_h0"), numBands, r)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")
      .withWatermark(timeCol, watermark)

    val verified = Buckets.hashedJaccard(
      sSh.join(cSide, Seq("band", "bucket")), "__mh_hsb", "__mh_hsc", "jaccard")
      .filter(col("jaccard") >= threshold)
      .select(col(idCol), col(timeCol), col("__mh_idc").as("id_c"),
        col("jaccard"))
    // collapse multi-band hits of the same pair; watermark bounds the
    // state (batch frames take plain dropDuplicates — Spark rejects the
    // watermarked variant outside streaming, and on bounded input the
    // two are equivalent because every "batch" is the whole input)
    if (verified.isStreaming)
      verified.dropDuplicatesWithinWatermark(Seq(idCol, "id_c"))
    else verified.dropDuplicates(Seq(idCol, "id_c"))
  }

  /** Streaming semantic near-dup gate: each arriving embedding's
    * near-duplicates (exact cosine ≥ `threshold`) in a STATIC corpus,
    * blocked by the IVF coarse quantizer — the semantic analog of
    * [[streamingMinHashDedup]], so a continuously ingesting pipeline
    * can SemDeDup-gate new documents against the lake without any
    * corpus-internal pair work.
    *
    * Plan shape (all stream-legal, NOTHING stateful):
    *   - the static side carries one cell id per corpus vector (the
    *     inverted-file layout — persist/bucket it at lake scale and the
    *     gate reads it as-is);
    *   - the stream side explodes its `nprobe` probe cells in-row
    *     (codegen'd [[org.apache.spark.sql.graft.VecTopCosine]]);
    *   - candidates = stream-static inner equi-join on cell; a corpus
    *     vector lives in exactly ONE cell, so a (stream, corpus) pair
    *     can match at most once — unlike the banded MinHash gate there
    *     is NO pair-collapse state at all, and the watermark exists
    *     only to bound late-data semantics for downstream consumers;
    *   - verification = exact cosine (codegen'd dot/norm) ≥ threshold.
    *
    * On a BATCH frame the identical plan runs with the watermark a
    * no-op — how the driver query puts this path under the DuckDB
    * oracle, alongside the MemoryStream spec.
    *
    * @return stream columns `idCol`, `timeCol` + `(id_c, cosine)` — one
    *         row per (stream vector, matching corpus vector) whose cell
    *         was probed; recall is the IVF nprobe/nlist trade
    */
  def streamingSemanticDedup(
      stream: DataFrame,
      corpus: DataFrame,
      vecCol: String,
      idCol: String,
      timeCol: String,
      watermark: String,
      coarse: graft.similarity.IvfAnn.Model,
      nprobe: Int = 2,
      threshold: Double = 0.9): DataFrame = {
    val cSide = corpus.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("__sem_idc"),
        col(vecCol).cast("array<double>").as("__sem_vc"))
      .withColumn("__sem_cell", coarse.cell(col("__sem_vc")))
    val sSide = stream.filter(col(vecCol).isNotNull)
      .select(col(idCol), col(timeCol),
        col(vecCol).cast("array<double>").as("__sem_v"))
      .withColumn("__sem_cell", explode(coarse.probes(col("__sem_v"), nprobe)))
    val wm = if (sSide.isStreaming) sSide.withWatermark(timeCol, watermark)
             else sSide
    wm.join(cSide, Seq("__sem_cell"))
      .withColumn("cosine",
        graft.similarity.VectorOps.cosine(col("__sem_v"), col("__sem_vc")))
      .filter(col("cosine") >= threshold)
      .select(col(idCol), col(timeCol), col("__sem_idc").as("id_c"),
        col("cosine"))
  }

  /** Streaming as-of join against a STATIC right side — the incremental
    * analog of [[graft.joins.AsOfJoin]] for slowly-changing reference
    * data (latest price, config version, model checkpoint at event time).
    *
    * A stream-side "latest right row ≤ t" needs per-row aggregation in
    * general, which streaming joins cannot express. But with a static
    * right side the aggregation moves ENTIRELY to the static side: each
    * right row is valid on `[rt, next_rt)` per key (backward; `(prev_rt,
    * rt]` forward), computed once per micro-batch with a batch window
    * function, and the as-of lookup becomes a stream-static point-in-
    * interval join — one output row per event, no stream state beyond the
    * join itself, append-mode friendly.
    *
    * Tie semantics: right rows with identical (keys, time) collapse to
    * one row — the greatest tuple of the remaining columns (original row
    * order is meaningless on an unordered static frame, and row-id
    * expressions are rejected inside streaming plans; the batch operator
    * orders ties by generated row id instead).
    *
    * @param direction "backward" (latest right at-or-before the event) or
    *                  "forward" (earliest right at-or-after)
    * @param tolerance max |event time − right time|; None = unbounded
    * @return left stream columns + right columns (right time column kept),
    *         unmatched events carry nulls (left join)
    */
  def asOfStatic(
      left: DataFrame,
      right: DataFrame,
      leftTime: String,
      rightTime: String,
      on: Seq[String] = Nil,
      direction: String = "backward",
      tolerance: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    require(Seq("backward", "forward").contains(direction), s"direction=$direction")
    val iPrefix = "__graft_a_"
    val rPre = right.columns.foldLeft(right)(
      (d, c) => d.withColumnRenamed(c, iPrefix + c))
    val rt = col(iPrefix + rightTime)
    val keyCols = on.map(k => col(iPrefix + k))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols: _*).orderBy(rt)
    // ties: one row per (keys, rt), picked by greatest remaining tuple
    val restDesc = rPre.columns
      .filterNot(c => (on.map(iPrefix + _) :+ (iPrefix + rightTime)).contains(c))
      .map(col(_).desc)
    val dedupW = org.apache.spark.sql.expressions.Window
      .partitionBy((keyCols :+ rt): _*)
      .orderBy((if (restDesc.isEmpty) Seq(lit(1).asc) else restDesc.toSeq): _*)
    val bound = "__graft_a_bound"
    val rIv = rPre
      .withColumn("__graft_a_keep", row_number().over(dedupW) === 1)
      .filter(col("__graft_a_keep"))
      .withColumn(bound,
        if (direction == "backward") lead(rt, 1).over(w)
        else lag(rt, 1).over(w))
      .drop("__graft_a_keep")
    val lt = col(leftTime)
    val validity =
      if (direction == "backward")
        rt <= lt && (col(bound).isNull || lt < col(bound))
      else
        lt <= rt && (col(bound).isNull || col(bound) < lt)
    val tolCond = tolerance.map { t =>
      if (direction == "backward") rt >= lt - t else rt <= lt + t
    }.getOrElse(lit(true))
    val keyCond = on.map(k => col(k) === col(iPrefix + k))
      .reduceOption(_ && _).getOrElse(lit(true))
    val joined = left.join(broadcast(rIv), keyCond && validity && tolCond, "left")
      .drop(bound)
      // key columns duplicate the left side's — drop; other right columns
      // get their names back, suffixed `_r` on collision (e.g. same time
      // column name on both sides)
      .drop(on.map(iPrefix + _): _*)
    rPre.columns.filterNot(c => on.contains(c.stripPrefix(iPrefix)))
      .foldLeft(joined) { (d, c) =>
        val base = c.stripPrefix(iPrefix)
        d.withColumnRenamed(c,
          if (left.columns.contains(base)) base + "_r" else base)
      }
  }

  /** Stream-stream interval-containment join: a stream of points against
    * a STREAM of intervals, both under event-time watermarks — the fully
    * incremental form of `merge_intervals` containment (point-in-interval
    * kind). Spark's stream-stream join keeps both sides' state until the
    * watermark proves no future match is possible; for that proof the
    * join condition must bound each side's event time by the other's,
    * which an unbounded interval length cannot do — hence the REQUIRED
    * `maxDuration` (an upper bound on interval length, enforced in the
    * condition): state per key is then O(events within watermark +
    * maxDuration).
    *
    * @param maxDuration SQL interval literal body, e.g. "1 HOUR" — only
    *        intervals no longer than this can match (longer ones are
    *        truncated by the bound, documented contract)
    * @return inner join: point rows × containing interval rows (interval
    *         columns suffixed `_iv` on name collision)
    */
  def pointsInStreamingIntervals(
      points: DataFrame,
      intervals: DataFrame,
      pointTime: String,
      startCol: String,
      stopCol: String,
      on: Seq[String],
      watermark: String,
      maxDuration: String): DataFrame = {
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    val ivR = overlap.foldLeft(intervals)(
      (d, c) => d.withColumnRenamed(c, c + "_iv"))
    def iName(c: String): String = if (overlap(c)) c + "_iv" else c
    val p = points.withWatermark(pointTime, watermark)
    val iv = ivR.withWatermark(iName(startCol), watermark)
    val keyCond = on.map(k => col(k) === col(iName(k)))
    val cond = (keyCond :+
      (col(pointTime) >= col(iName(startCol))) :+
      (col(pointTime) <= col(iName(stopCol))) :+
      // the state-eviction bound: point time ≤ interval start + maxDuration
      (col(pointTime) <= col(iName(startCol)) + expr(s"INTERVAL $maxDuration")))
      .reduce(_ && _)
    p.join(iv, cond, "inner")
  }

  /** Watermarked stream-stream interval OVERLAP join: both sides are
    * interval streams; emits every key-equal pair whose intervals
    * intersect (closed endpoints — the batch
    * [[graft.joins.IntervalJoin]] default). `maxDuration` bounds BOTH
    * sides' interval lengths, and longer intervals are dropped — the
    * price of bounded state: the overlap predicate alone relates each
    * side's watermarked start only to the other's UNwatermarked stop, so
    * without a length bound no state could ever be evicted. The two
    * derived start-vs-start inequalities are stated explicitly so the
    * watermark analysis sees them and ages out join state on both sides.
    *
    * Right-side columns are suffixed `_r` on name collision.
    */
  def streamingIntervalOverlap(
      left: DataFrame,
      right: DataFrame,
      startCol: String,
      stopCol: String,
      on: Seq[String],
      watermark: String,
      maxDuration: String): DataFrame = {
    val shared = left.columns.toSet.intersect(right.columns.toSet)
    val rR = shared.foldLeft(right)((d, c) => d.withColumnRenamed(c, c + "_r"))
    def rName(c: String): String = if (shared(c)) c + "_r" else c
    val dur = expr(s"INTERVAL $maxDuration")
    val l = left.filter(col(stopCol) <= col(startCol) + dur)
      .withWatermark(startCol, watermark)
    val r = rR.filter(col(rName(stopCol)) <= col(rName(startCol)) + dur)
      .withWatermark(rName(startCol), watermark)
    val keyCond = on.map(k => col(k) === col(rName(k)))
    val cond = (keyCond :+
      (col(startCol) <= col(rName(stopCol))) :+
      (col(rName(startCol)) <= col(stopCol)) :+
      // start-vs-start bounds implied by the length cap — the eviction
      // condition the state store needs
      (col(startCol) <= col(rName(startCol)) + dur) :+
      (col(rName(startCol)) <= col(startCol) + dur))
      .reduce(_ && _)
    l.join(r, cond, "inner")
  }

  /** Streaming interval-containment enrichment: join a stream of points
    * against a STATIC intervals table (broadcast dimension) — the
    * streaming analog of `find_containing_interval` for slowly-changing
    * interval dimensions (e.g. per-user sessions, campaign windows).
    * Stream-static joins need no watermark; the static side re-resolves
    * per micro-batch.
    */
  def pointsInStaticIntervals(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      on: Seq[String],
      startCol: String,
      stopCol: String): DataFrame = {
    val iPrefix = "__graft_i_"
    val ivR = intervals.columns.foldLeft(intervals)(
      (d, c) => d.withColumnRenamed(c, iPrefix + c))
    val cond = on.map(k => col(k) === col(iPrefix + k))
      .reduceOption(_ && _).getOrElse(lit(true)) &&
      col(iPrefix + startCol) <= col(pointCol) &&
      col(pointCol) <= col(iPrefix + stopCol)
    points.join(broadcast(ivR), cond, "left")
  }

  /** Streaming blackout filter: PASS only stream rows whose point falls
    * inside NO static interval sharing the keys — the complement of
    * [[pointsInStaticIntervals]] and the streaming face of
    * [[graft.joins.IntervalAntiJoin]] (time-range decontamination of a
    * live feed against a once-loaded embargo/outage table). Stateless:
    * stream-static left_anti joins need no state store or watermark, so
    * this is a pure broadcast-probe projection that scales with the
    * stream, not with history.
    */
  def pointsNotInStaticIntervals(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      on: Seq[String],
      startCol: String,
      stopCol: String): DataFrame = {
    val iPrefix = "__graft_i_"
    val ivR = intervals.columns.foldLeft(intervals)(
      (d, c) => d.withColumnRenamed(c, iPrefix + c))
    val cond = on.map(k => col(k) === col(iPrefix + k))
      .reduceOption(_ && _).getOrElse(lit(true)) &&
      col(iPrefix + startCol) <= col(pointCol) &&
      col(pointCol) <= col(iPrefix + stopCol)
    points.join(broadcast(ivR), cond, "left_anti")
  }
}
