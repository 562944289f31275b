package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.sql.{GraftExtensions, GraftFunctions}

/** Incremental (Structured Streaming) surface of the training-data
  * dedup pipeline — the ingest-time shape of the batch q40/q44/q45
  * operators: documents arrive continuously and must be deduplicated
  * AGAINST EVERYTHING ALREADY SEEN, not just within the batch.
  *
  * The reference itself is pure batch (SURVEY.md §2.10), so this module
  * is part of the beyond-the-reference training-pipeline surface:
  *  - exact dedup: content-hash `dropDuplicatesWithinWatermark` — the
  *    engine-managed dedup state is bounded by the event-time watermark
  *    instead of growing forever;
  *  - near-dup flagging: `flatMapGroupsWithState` keyed by the LSH band
  *    bucket (same banding as q45) — custom per-bucket state holds the
  *    keeper signatures within the dedup horizon, expired by an
  *    event-time timeout, so a new document is compared only against
  *    its own bucket's recent history (state is per-bucket, bounded by
  *    keeper-rate x horizon — the same reason the batch LSH join
  *    shuffles on the bucket key);
  *  - windowed quality stats: watermarked event-time windows over the
  *    q42 quality expressions.
  *
  * Scale notes: all state is keyed (hash / bucket), so it partitions
  * across executors like any shuffle; nothing is collected or
  * broadcast. Outputs are Append-mode (each doc judged exactly once on
  * arrival), so any sink (`writeStream`) composes.
  */
object StreamDedup {

  /** One incoming document (event-time `ts` drives the watermarks). */
  final case class Doc(doc_id: Long, text: String, ts: java.sql.Timestamp)

  /** Internal row shape of the banded stream (public: encoder codegen
    * cannot construct a private class; `ts` carries the watermark
    * through to the stateful operator). */
  final case class Banded(doc_id: Long, band_key: Long, mh0: Long,
      mh1: Long, ts: java.sql.Timestamp)

  /** Verdict for one doc in one band bucket: dup_of = the id of the
    * earliest prior doc with an identical signature pair, or -1 when
    * this doc is the bucket's first of its signature (a keeper). */
  final case class Verdict(doc_id: Long, band_key: Long, dup_of: Long)

  /** Exact incremental dedup: the first arrival of each content hash
    * within the watermark horizon passes; later identical payloads are
    * dropped. State (hash -> seen) is expired by the watermark, so it
    * is bounded by the stream's rate x horizon, not its lifetime. */
  def exactDedup(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("content_hash", sha2(col("text"), 256))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("content_hash")

  /** MinHash band key + leading signatures, via the same one-pass
    * MinHashSigs expression as the batch path (q44/q45 banding). */
  private def banded(docs: DataFrame): DataFrame = {
    val sig = GraftFunctions.minhash_sigs(col("text"),
      GraftExtensions.MinHashParams, GraftExtensions.MinHashPrime)
    docs.select(col("doc_id"), sig.as("sig"), col("ts"))
      .select(col("doc_id"),
        ((col("sig").getItem(0) % 64) * 64 + col("sig").getItem(1) % 64)
          .as("band_key"),
        col("sig").getItem(0).as("mh0"), col("sig").getItem(1).as("mh1"),
        col("ts"))
  }

  /** Near-duplicate flagging with custom keyed state: per band bucket,
    * the state is the KEEPERS' (doc_id, mh0, mh1, tsMs) tuples seen
    * within the dedup horizon; each new doc is judged against it.
    * Duplicates are never appended (their signature is already
    * present), unsigned (too-short) docs touch no state at all.
    *
    * State is bounded TWO ways, both required on a continuous stream:
    *  - per-keeper pruning: on every bucket invocation, keepers whose
    *    event time has fallen past `watermark - horizonMs` are dropped
    *    BEFORE matching — with only 4096 band keys every bucket keeps
    *    receiving data forever, so a whole-bucket timeout alone would
    *    never fire and `seen` would accumulate every distinct signature
    *    for the stream's lifetime;
    *  - whole-bucket idle timeout: a bucket with no data for
    *    `horizonMs` past the watermark is removed via the event-time
    *    timeout (the empty-bucket cleanup).
    * Net bound: keeper-rate x horizon, never the stream's lifetime,
    * and a doc repeated after the horizon becomes a keeper again
    * (horizon-scoped dedup, same contract as exactDedup's
    * dropDuplicatesWithinWatermark) — stale keepers can no longer
    * linger in active buckets and suppress re-keeping. Within one
    * micro-batch a bucket's rows are processed in doc_id order so
    * replay is deterministic. */
  def nearDupVerdicts(docs: DataFrame, watermark: String = "24 hours",
      horizonMs: Long = 24L * 3600 * 1000): Dataset[Verdict] = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(horizonMs > 0, "dedup horizon must be positive")
    banded(docs.withWatermark("ts", watermark))
      .select(col("doc_id"), coalesce(col("band_key"), lit(-1L)).as("band_key"),
        coalesce(col("mh0"), lit(-1L)).as("mh0"),
        coalesce(col("mh1"), lit(-1L)).as("mh1"), col("ts"))
      .as[Banded]
      .groupByKey(_.band_key)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(judgeBucket(horizonMs))
  }

  /** Shared stateful-bucket scaffolding for both near-dup judges:
    * whole-bucket idle-timeout cleanup, per-entry event-time pruning
    * of the seen list BEFORE matching (an in-horizon doc whose only
    * match is a stale entry must become a keeper itself), deterministic
    * in-batch replay order, state write-back, and the event-time lease.
    * The lease is anchored on EVENT time (the first batches run with
    * the watermark still at zero — anchoring there would expire the
    * bucket immediately) and extended every time the bucket sees data.
    * `step` judges one row against the pruned seen list and returns
    * (verdict, entry-to-remember-or-None). */
  private def statefulBucket[R, E, V](horizonMs: Long, rows: Iterator[R],
      state: GroupState[Seq[E]], orderKey: R => Long, rowTs: R => Long,
      entryTs: E => Long)(step: (Seq[E], R) => (V, Option[E])): Iterator[V] = {
    if (state.hasTimedOut) { // idle past the horizon: drop the bucket
      state.remove()
      return Iterator.empty
    }
    val cutoffMs = state.getCurrentWatermarkMs() - horizonMs
    var seen = state.getOption.getOrElse(Seq.empty)
      .filter(e => entryTs(e) >= cutoffMs)
    val batch = rows.toSeq.sortBy(orderKey)
    val out = batch.map { r =>
      val (verdict, remember) = step(seen, r)
      remember.foreach(e => seen = seen :+ e)
      verdict
    }
    state.update(seen)
    val maxTs = batch.map(rowTs).max
    state.setTimeoutTimestamp(
      math.max(state.getCurrentWatermarkMs(), maxTs) + horizonMs)
    out.iterator
  }

  private def judgeBucket(horizonMs: Long)(key: Long,
      rows: Iterator[Banded],
      state: GroupState[Seq[(Long, Long, Long, Long)]]): Iterator[Verdict] = {
    if (key == -1L) { // unsigned docs: stateless pass-through keepers
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      return rows.toSeq.sortBy(_.doc_id)
        .map(d => Verdict(d.doc_id, key, -1L)).iterator
    }
    statefulBucket(horizonMs, rows, state,
      (d: Banded) => d.doc_id, (d: Banded) => d.ts.getTime,
      (e: (Long, Long, Long, Long)) => e._4) {
      (seen, d) =>
        val dupOf = seen.collectFirst {
          case (id, m0, m1, _) if m0 == d.mh0 && m1 == d.mh1 => id
        }.getOrElse(-1L)
        // only keepers are remembered: a dup's signature is already present
        (Verdict(d.doc_id, key, dupOf),
          if (dupOf == -1L) Some((d.doc_id, d.mh0, d.mh1, d.ts.getTime))
          else None)
    }
  }

  /** One incoming image row (the input_hint table's dedup-relevant
    * columns; event-time `ts` drives the watermark). */
  final case class Img(image_id: Long, phash: Long, ts: java.sql.Timestamp)

  /** Internal banded image row: bucket = (band << 16) | 16-bit chunk. */
  final case class ImgBanded(image_id: Long, bucket: Long, phash: Long,
      ts: java.sql.Timestamp)

  /** Verdict for one image in one band bucket: dup_of = the smallest
    * prior image_id within `maxDist` hamming bits (or -1), hamming =
    * its distance (or -1). An image is a near-dup iff ANY of its 4
    * bucket rows carries dup_of != -1. */
  final case class ImgVerdict(image_id: Long, bucket: Long, dup_of: Long,
      hamming: Int)

  /** Incremental IMAGE near-dup over the perceptual-hash column — the
    * streaming shape of batch q77 (4x16-bit pigeonhole banding,
    * hamming <= maxDist, Manku et al. WWW'07): each arriving image is
    * judged against EVERY prior image within the horizon, not just the
    * current micro-batch. The machinery is agnostic to what the 64
    * signature bits encode — `audioDupVerdicts` below reuses it
    * verbatim for energy-delta audio fingerprints.
    *
    * Unlike `nearDupVerdicts` (one LSH bucket per doc, probabilistic
    * recall), recall here is EXACT by pigeonhole: the image fans out to
    * its 4 band buckets, state in each bucket holds the full 64-bit
    * phash of every image seen there within the horizon (dups
    * included — that is what makes the relation exact and keeps the
    * per-bucket judge independent, no cross-bucket keeper feedback),
    * and any prior image at distance <= maxDist < 4 shares at least
    * one band bucket. State is per-bucket rate x horizon, pruned
    * per-image by event time plus a whole-bucket idle timeout, exactly
    * the `judgeBucket` bounds. Consumers reduce the 4 verdict rows per
    * image with min(dup_of != -1). */
  def phashDupVerdicts(imgs: DataFrame, watermark: String = "24 hours",
      horizonMs: Long = 24L * 3600 * 1000,
      maxDist: Int = 3,
      bucketPrefix: Column = lit(0L)): Dataset[ImgVerdict] = {
    val spark = imgs.sparkSession
    import spark.implicits._
    require(horizonMs > 0, "dedup horizon must be positive")
    require(maxDist < 4, "4-band pigeonhole covers hamming <= 3")
    imgs.withWatermark("ts", watermark)
      .select(col("image_id"), col("phash"), col("ts"),
        bucketPrefix.cast("long").as("pfx"),
        posexplode(array((0 until 4).map(b =>
          shiftright(col("phash"), b * 16).bitwiseAND(lit(0xFFFFL))): _*))
          .as(Seq("band", "chunk")))
      .select(col("image_id"),
        // bucket = prefix << 18 | band << 16 | chunk: the prefix keeps
        // differently-aligned signatures (video frame positions) in
        // disjoint state buckets; the default prefix 0 leaves the
        // image/audio bucket ids unchanged
        (col("pfx") * lit(1L << 18) +
          shiftleft(col("band"), 16).cast("long") + col("chunk"))
          .as("bucket"),
        col("phash"), col("ts"))
      .as[ImgBanded]
      .groupByKey(_.bucket)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(judgeImgBucket(horizonMs, maxDist))
  }

  private def judgeImgBucket(horizonMs: Long, maxDist: Int)(key: Long,
      rows: Iterator[ImgBanded],
      state: GroupState[Seq[(Long, Long, Long)]]): Iterator[ImgVerdict] =
    statefulBucket(horizonMs, rows, state,
      (m: ImgBanded) => m.image_id, (m: ImgBanded) => m.ts.getTime,
      (e: (Long, Long, Long)) => e._3) {
      (seen, m) =>
        val hit = seen.iterator
          .filter(p => java.lang.Long.bitCount(p._2 ^ m.phash) <= maxDist)
          .minByOption(_._1)
        // EVERY image is remembered (dups included) — that is what keeps
        // pigeonhole recall exact and the buckets independent
        (ImgVerdict(m.image_id, key, hit.fold(-1L)(_._1),
          hit.fold(-1)(p => java.lang.Long.bitCount(p._2 ^ m.phash))),
          Some((m.image_id, m.phash, m.ts.getTime)))
    }

  /** Incremental AUDIO near-dup — the streaming shape of batch q83:
    * each arriving clip's opaque s16le payload is fingerprinted
    * in-stream (`AudioFingerprint`, the same codegen expression batch
    * q83 uses) and judged through the banded machinery above — the
    * pigeonhole state machine is agnostic to what the 64 bits MEAN
    * (block-mean phash, energy-delta audio fingerprint, SimHash), so
    * the audio path is a projection plus delegation, not a second
    * state machine. Output columns renamed to the audio domain. */
  def audioDupVerdicts(clips: DataFrame, nSamples: Int, nWin: Int = 64,
      watermark: String = "24 hours",
      horizonMs: Long = 24L * 3600 * 1000,
      maxDist: Int = 3): DataFrame = {
    import graft.sql.GraftFunctions.audio_fingerprint
    require(nWin > 0 && nSamples % nWin == 0,
      s"fingerprint windows $nWin must divide clip length $nSamples")
    phashDupVerdicts(
        clips.select(col("audio_id").as("image_id"),
          audio_fingerprint(col("bytes"), nSamples / nWin, nWin)
            .as("phash"),
          col("ts")),
        watermark, horizonMs, maxDist)
      .withColumnRenamed("image_id", "audio_id")
  }

  /** Incremental VIDEO near-dup — the streaming shape of batch q85:
    * each arriving video's payload is frame-sampled and per-frame
    * phashed in-stream (the same plan-constant `FramePhash` byte-slice
    * decodes as the batch query), and every sampled frame is judged
    * through the banded machinery FRAME-ALIGNED: the bucket key
    * carries frame_idx above band+chunk (`bucketPrefix`), so state and
    * matching never mix frame positions — the streaming twin of
    * `hammingPairs(alignCols = frame_idx)`.
    *
    * Emits one verdict per (video, sampled frame, bucket); `frame_idx`
    * is recovered from the bucket id. Consumers apply the batch q85
    * vote incrementally: video V is a near-dup of prior P when
    * verdicts for >= minVote DISTINCT frames of V carry dup_of = P.
    * Per-bucket dup_of is the min-id prior within `maxDist` (the
    * ImgVerdict contract), so when one frame matches several priors
    * only the smallest id is voted — at dedup time that is the keeper
    * candidate anyway. */
  def videoDupVerdicts(videos: DataFrame, nFrames: Int, stride: Int,
      nPixels: Int, w: Int, h: Int,
      watermark: String = "24 hours",
      horizonMs: Long = 24L * 3600 * 1000,
      maxDist: Int = 3): DataFrame = {
    import graft.sql.GraftFunctions.frame_phash
    require(stride > 0, "frame-sample stride must be positive")
    val sampled = (0 until nFrames by stride).map { f =>
      struct(lit(f).as("frame_idx"),
        frame_phash(col("bytes"), col("fmt"), nPixels, f, w, h)
          .as("fphash"))
    }
    val perFrame = videos
      .select(col("video_id"), col("ts"),
        explode(array(sampled: _*)).as("fr"))
      .select(col("video_id").as("image_id"),
        col("fr.frame_idx").as("frame_idx"),
        col("fr.fphash").as("phash"), col("ts"))
    phashDupVerdicts(perFrame, watermark, horizonMs, maxDist,
        bucketPrefix = col("frame_idx"))
      .withColumnRenamed("image_id", "video_id")
      .withColumn("frame_idx", shiftright(col("bucket"), 18).cast("int"))
  }

  /** Streaming SESSIONIZATION — the incremental shape of batch q60:
    * per-user sessions close after `gap` of event-time silence, via
    * Spark's native `session_window` (dynamic, merging windows; state
    * is expired by the watermark). Emitted columns mirror q60:
    * t_start = first event ts, t_end = LAST EVENT ts (session_window's
    * own `end` is last-event + gap, so the gap is subtracted back).
    *
    * Boundary semantics vs batch q60: session_window treats a session
    * as the half-open [start, last + gap) — an event at EXACTLY
    * prev + gap starts a NEW session, where the batch rule
    * (`ts > prev + gap`) keeps it. Identical for every gap that is not
    * exactly the threshold; cross-checked against q60 on a fixture in
    * StreamingSpec. */
  def sessionize(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("t_start"),
        (col("w.end") - expr(s"INTERVAL '$gap'")).as("t_end"),
        col("n_events"))

  /** Stream-stream INTERVAL JOIN — the attribution primitive (a click
    * matches an impression of the same key when it lands inside
    * [imp_ts, imp_ts + horizon]), the one stateful Structured Streaming
    * operator family the surface above does not exercise: BOTH sides
    * are unbounded, so the engine buffers each in join state and the
    * time-range predicate plus the two watermarks are what make that
    * state finite — an impression is evictable once the click-side
    * watermark passes imp_ts + horizon, a click once the
    * impression-side watermark passes its ts (Spark derives both
    * bounds from the inequality itself; without the range constraint
    * the state would grow without bound and Spark would reject the
    * append-mode query). Late rows beyond the watermark are dropped,
    * the same contract as every operator above. Inner join in append
    * mode; inputs need (key LONG, ts TIMESTAMP).
    *
    * Scale shape: both sides hash-Exchange on `key`, state is
    * per-key-and-horizon bounded, so 1000 executors hold disjoint key
    * ranges — the same co-partitioning a batch q80-style banded join
    * uses, made incremental. */
  def attributionJoin(imps: DataFrame, clicks: DataFrame,
      horizon: String = "10 minutes",
      watermark: String = "20 minutes"): DataFrame = {
    val i = imps.withWatermark("ts", watermark).alias("i")
    val c = clicks.withWatermark("ts", watermark).alias("c")
    i.join(c,
        expr("i.key = c.key AND " +
          s"c.ts >= i.ts AND c.ts <= i.ts + INTERVAL '$horizon'"))
      .select(col("i.key").as("key"), col("i.ts").as("imp_ts"),
        col("c.ts").as("click_ts"))
  }

  /** One funnel event (streaming twin of the batch q125 input rows). */
  final case class FunEv(user_id: Long, event_type: String,
      ts: java.sql.Timestamp)

  /** Funnel progress snapshot: step times as epoch SECONDS (-1 until
    * reached) — the batch q125 output shape, emitted incrementally. */
  final case class FunnelRow(user_id: Long, steps: Int,
      t1_s: Long, t2_s: Long, t3_s: Long)

  /** Per-user state: resolved step times in ms (-1 unset) plus the
    * buffer of events not yet behind the watermark (tsMs, kind). */
  final case class FunState(t1: Long, t2: Long, t3: Long,
      buf: Seq[(Long, Int)])

  /** Incremental funnel (streaming twin of batch q125): per user, the
    * strictly-ordered view -> click -> purchase progression, exactly
    * the batch rule (t1 = min view, t2 = min click AFTER t1, t3 = min
    * purchase AFTER t2).
    *
    * Disorder handling: the greedy fold is only exact when events are
    * folded in EVENT-TIME order, so arrivals are BUFFERED in state
    * until the watermark passes them, then folded ascending — any
    * disorder within the watermark horizon is invisible, and rows later
    * than the watermark are dropped by the engine (the standard
    * watermark contract, same as sessionize). An event-time timeout set
    * past the newest buffered event guarantees a user's tail folds even
    * if the user never appears again.
    *
    * State bound: 3 longs per user plus a buffer bounded by the user's
    * rate x the watermark horizon; step times are SET-ONCE (the fold
    * consumes events in global event-time order, so no later fold can
    * see an earlier event), which also makes emitted snapshots
    * monotone — the max-steps row per user is the final answer. */
  def funnelByUser(events: DataFrame,
      watermark: String = "1 hour"): Dataset[FunnelRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    // NO pre-filter on event_type: Catalyst pushes filters below the
    // EventTimeWatermark node, so dropping non-funnel events here would
    // also stop them advancing the watermark (a quiet funnel would
    // never ripen while the stream is busy with other events). Unknown
    // kinds ride to the fold as no-ops instead.
    events
      .withWatermark("ts", watermark)
      .select(col("user_id"), col("event_type"), col("ts"))
      .as[FunEv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.EventTimeTimeout)(foldFunnel)
  }

  private val FunKinds =
    Map("view" -> 0, "click" -> 1, "purchase" -> 2).withDefaultValue(-1)

  private def foldFunnel(user: Long, rows: Iterator[FunEv],
      state: GroupState[FunState]): Iterator[FunnelRow] = {
    val first = state.getOption.isEmpty
    val prev = state.getOption.getOrElse(FunState(-1L, -1L, -1L, Nil))
    val arrived = rows.map(e =>
      (e.ts.getTime, FunKinds(e.event_type))).toSeq
    val wm = state.getCurrentWatermarkMs()
    // non-funnel kinds advanced the watermark upstream; don't buffer them
    val (ripe, hold) =
      (prev.buf ++ arrived.filter(_._2 >= 0)).partition(_._1 <= wm)
    var (t1, t2, t3) = (prev.t1, prev.t2, prev.t3)
    // ascending event time; order among equal timestamps is immaterial
    // because every step demands a STRICTLY later timestamp
    ripe.sortBy(_._1).foreach { case (tsMs, kind) =>
      if (kind == 0 && t1 < 0) t1 = tsMs
      else if (kind == 1 && t2 < 0 && t1 >= 0 && tsMs > t1) t2 = tsMs
      else if (kind == 2 && t3 < 0 && t2 >= 0 && tsMs > t2) t3 = tsMs
    }
    val next = FunState(t1, t2, t3, hold)
    state.update(next)
    // re-arm at the OLDEST buffered event (+1 ms, all held events are
    // strictly newer than the watermark so this is always legal): the
    // buffer folds progressively as the watermark advances, instead of
    // waiting for the newest event to ripen
    if (hold.nonEmpty)
      state.setTimeoutTimestamp(hold.map(_._1).min + 1)
    val changed = (t1, t2, t3) != ((prev.t1, prev.t2, prev.t3))
    // emit on progress, plus a steps-0 snapshot the first time a user
    // shows a REAL funnel event (the batch q125 row exists for step-0
    // users too; users seen only through non-funnel kinds stay silent);
    // timeout-only invocations that resolve nothing stay silent
    if (changed || (first && arrived.exists(_._2 >= 0)))
      Iterator.single(FunnelRow(user,
        (if (t3 >= 0) 3 else if (t2 >= 0) 2 else if (t1 >= 0) 1 else 0),
        if (t1 >= 0) t1 / 1000 else -1L,
        if (t2 >= 0) t2 / 1000 else -1L,
        if (t3 >= 0) t3 / 1000 else -1L))
    else Iterator.empty
  }

  /** One CDC change (streaming twin of the batch q133 input rows). */
  final case class CdcEv(entity_id: Long, ts: java.sql.Timestamp,
      op: String, value: Long)

  /** A CLOSED SCD2 history row: [valid_from, valid_to) epoch seconds. */
  final case class Scd2Row(entity_id: Long, valid_from: Long,
      valid_to: Long, value: Long)

  /** Per-entity state: the currently-open interval (fromMs = -1 when
    * none) plus the buffer of changes not yet behind the watermark
    * (tsMs, isUpsert, value). */
  final case class Scd2State(fromMs: Long, value: Long,
      buf: Seq[(Long, Boolean, Long)])

  /** Incremental SCD2 apply (streaming twin of batch q133): a CDC
    * stream of upserts/deletes folds into dimension HISTORY rows —
    * each upsert opens an interval, the next change of any kind closes
    * it, and the CLOSED row is emitted append-only. The open interval
    * is unemittable in a stream (its valid_to would need retraction),
    * so it lives in state until a later change closes it — batch
    * q133's is_current rows are exactly the ones a stream never emits.
    *
    * Disorder handling is the funnel discipline: changes BUFFER in
    * state until the watermark passes them, then fold in ascending
    * event-time order, so the emitted history is insensitive to any
    * arrival disorder within the horizon, and the event-time timeout
    * re-arms at the oldest buffered change so buffers fold
    * progressively as the watermark advances. State per entity: one
    * open interval + a disorder-bounded buffer. */
  def scd2ByEntity(changes: DataFrame,
      watermark: String = "1 hour"): Dataset[Scd2Row] = {
    val spark = changes.sparkSession
    import spark.implicits._
    changes
      .withWatermark("ts", watermark)
      .select(col("entity_id"), col("ts"), col("op"), col("value"))
      .as[CdcEv]
      .groupByKey(_.entity_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(foldScd2)
  }

  private def foldScd2(entity: Long, rows: Iterator[CdcEv],
      state: GroupState[Scd2State]): Iterator[Scd2Row] = {
    val prev = state.getOption.getOrElse(Scd2State(-1L, 0L, Nil))
    val arrived = rows.map(e => (e.ts.getTime, e.op == "U", e.value)).toSeq
    val wm = state.getCurrentWatermarkMs()
    val (ripe, hold) = (prev.buf ++ arrived).partition(_._1 <= wm)
    var from = prev.fromMs
    var value = prev.value
    val out = Seq.newBuilder[Scd2Row]
    // equal-ts ties fold deletes first, then upserts by ascending value
    // — the SAME total order batch q133's window pins (ORDER BY ts, op,
    // value), so the emitted history is arrival-order-independent even
    // on a log with duplicate timestamps
    ripe.sortBy { case (tsMs, isU, v) => (tsMs, isU, v) }.foreach {
      case (tsMs, isU, v) =>
        if (from >= 0) out += Scd2Row(entity, from / 1000, tsMs / 1000, value)
        if (isU) { from = tsMs; value = v } else { from = -1L; value = 0L }
    }
    // a fully-folded, fully-closed entity holds nothing: drop the state
    // entry entirely instead of checkpointing a zombie forever (the
    // remove() discipline of the bucket folds above)
    if (from < 0 && hold.isEmpty) state.remove()
    else {
      state.update(Scd2State(from, value, hold))
      if (hold.nonEmpty) state.setTimeoutTimestamp(hold.map(_._1).min + 1)
    }
    out.result().iterator
  }

  /** Watermarked event-time quality windows (the q42 stats, streaming):
    * per window, document count, mean token count, and the share of
    * quality-passing docs. */
  def qualityByWindow(docs: DataFrame, windowLen: String = "10 minutes",
      watermark: String = "1 hour"): DataFrame = {
    val toks = split(col("text"), " ")
    val nTok = size(toks)
    val stops = Seq("the", "a", "data", "key", "row")
    val nStop = size(filter(toks, tk => tk.isin(stops: _*)))
    docs
      .withColumn("n_tokens", nTok)
      .withColumn("quality_ok",
        (nTok >= 20 && nStop.cast("double") / nTok < 0.5).cast("int"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"))
      .agg(count(lit(1)).as("n_docs"),
        avg("n_tokens").as("mean_tokens"),
        avg("quality_ok").as("quality_rate"))
      .select(col("w.start").as("w_start"), col("n_docs"),
        col("mean_tokens"), col("quality_rate"))
  }

  /** Streaming AUDIO windowed stats: each arriving clip (opaque s16le
    * payload + event time) fans out to its per-window integer stats via
    * the same plan-constant `AudioWindowStats` byte-slice reads as
    * batch q81 — stateless per row, so it composes with any downstream
    * watermarked aggregation; here, per event-time window: clip count,
    * total energy, max peak (the live ingest-monitoring shape). */
  def audioStatsByWindow(clips: DataFrame, nSamples: Int, winSize: Int,
      windowLen: String = "10 minutes",
      watermark: String = "1 hour"): DataFrame = {
    import graft.sql.GraftFunctions.audio_window_stats
    require(winSize > 0 && nSamples % winSize == 0,
      s"window $winSize must divide clip length $nSamples")
    val wins = (0 until nSamples / winSize).map { w =>
      audio_window_stats(col("bytes"), w, winSize)
    }
    val energy = wins.map(_.getField("sum_sq")).reduce(_ + _)
    val peaks = wins.map(_.getField("peak"))
    val peak = if (peaks.length == 1) peaks.head else greatest(peaks: _*)
    clips
      .withColumn("energy", energy)
      .withColumn("peak", peak)
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"))
      .agg(count(lit(1)).as("n_clips"),
        sum("energy").as("total_energy"),
        max("peak").as("max_peak"))
      .select(col("w.start").as("w_start"), col("n_clips"),
        col("total_energy"), col("max_peak"))
  }

  /** Streaming PER-DOMAIN DOCUMENT CAP (batch q95 incremental): per
    * event-time window and source domain, the top-k arriving documents
    * by length with ties to the smaller doc_id — the live shape of the
    * mixture-balancing cap (watch each crawl domain's best candidates
    * as a window fills). State is the engine/TopK size-k heap buffer
    * itself: Spark's streaming aggregation holds ONE k-long array per
    * open (window, source) group regardless of arrival volume — the
    * same bounded-state property that makes the batch shuffle
    * O(tasks * k). Emits (w_start, source, rk, doc_id, doc_len) rows
    * when the watermark closes the window (append mode), or the
    * running leaderboard in complete mode. Pack/unpack are the SAME
    * TopK helpers batch q95 uses (length high 32, 0xFFFFFFFF - doc_id
    * low 32, bounds guarded per row), so the two shapes cannot
    * diverge. */
  def domainCapByWindow(docs: DataFrame, k: Int,
      windowLen: String = "10 minutes",
      watermark: String = "1 hour"): DataFrame = {
    import graft.engine.TopK
    val topk = udaf(new TopK.Agg(k))
    val packed =
      TopK.packDescSmallerId(length(col("text")).cast("long"), col("doc_id"))
    docs
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"), col("source"))
      .agg(topk(packed).as("tops"))
      .select(col("w.start").as("w_start"), col("source"),
        posexplode(col("tops")).as(Seq("rk0", "pk")))
      .select(col("w_start"), col("source"),
        (col("rk0") + 1).cast("int").as("rk"),
        TopK.unpackId(col("pk")).as("doc_id"),
        TopK.unpackScore(col("pk")).as("doc_len"))
  }

  /** Streaming COUNT-MIN registers per event-time window — the
    * incremental shape of batch q91: each arriving event fans out to
    * its d sketch cells (the same nonlinear World.h2 addressing), and
    * a watermarked groupBy(window, r, c) count IS the sketch — Spark's
    * windowed-aggregation state holds exactly d*w counters per open
    * window (bounded regardless of key cardinality, the property that
    * lets a heavy-hitter monitor watch 10^9-key streams), finalized
    * rows emit on watermark close. Consumers screen with
    * `TextOps.cmEstimate` per window; absent (r, c) rows are zero
    * registers (append mode emits only touched cells — at d*w = 256
    * cells per window and realistic volumes, effectively all). */
  def cmSketchByWindow(events: DataFrame, keyCol: String,
      windowLen: String = "10 minutes",
      watermark: String = "1 hour"): DataFrame = {
    val d = graft.queries.TextOps.CmDepth
    val w = graft.queries.TextOps.CmWidth
    val cells = (0 until d).map { r =>
      struct(lit(r).as("r"),
        (graft.world.World.h2Col(col(keyCol) * 31 + lit(r * 131)) % w)
          .cast("int").as("c"))
    }
    events
      .withWatermark("ts", watermark)
      .select(col("ts"), explode(array(cells: _*)).as("rc"))
      .groupBy(window(col("ts"), windowLen).as("w"),
        col("rc.r").as("r"), col("rc.c").as("c"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("w_start"), col("r"), col("c"), col("cnt"))
  }

  /** Streaming LOG-LINEAR QUANTILE SKETCH registers per event-time
    * window — the incremental shape of batch q110: each arriving value
    * lands in its (bit-length, 3-mantissa-bit) bucket (the SAME
    * `TextOps.qsketchBucket` addressing, so streaming and batch
    * registers are interchangeable and ADD), and a watermarked
    * groupBy(window, group, bucket) count IS the sketch — state is
    * bounded at ≤512 registers per open (window, group) regardless of
    * how many values arrive, the property that lets a latency/size
    * monitor track per-group p99 over unbounded streams. Consumers
    * fold a window's registers with `TextOps.qsketchEstimate`; the
    * 12.5% relative bound is constructive, so it holds per window too. */
  def qsketchByWindow(events: DataFrame, valCol: String, groupCol: String,
      windowLen: String = "10 minutes",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .filter(col(valCol) > 0) // bin() of 0 has no leading 1
      .groupBy(window(col("ts"), windowLen).as("w"), col(groupCol),
        graft.queries.TextOps.qsketchBucket(col(valCol)).as("bucket"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col(groupCol),
        col("bucket"), col("n"))
}
