package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.llm.{CurationOps, DedupOps, MultimodalOps}

/** DUAL-TIER streaming admission — ONE call that screens an increment
  * against BOTH maintained index tiers (the text tier's sixteen
  * always-on [[DedupStream]] sides — more under a dHash-bearing
  * `imageLens` or `dihedralRung` —
  * and the vector tier's [[VectorStream]] serving
  * tree), emits the single c2b-shaped verdict, and commits the admitted
  * survivors to BOTH tiers. This is the service form of the batch
  * `c2b_semantic_admission` composition: same screens, same precedence
  * (near_dup > span_dup > semantic_dup > image_dup > image_shift_dup >
  * audio_dup >
  * audio_near_dup > audio_shift_dup > video_dup > video_near_dup >
  * video_shift_dup > contaminated >
  * low_quality > admitted), same oracle
  * — where the two single-tier services each fold only their OWN screen
  * into admission, this one commits the complete curation policy. Feeds
  * carrying the media envelope (a `source` column) additionally pass
  * the IMAGE rung, BOTH AUDIO rungs and the VIDEO rung — the
  * increment's fingerprints against the maintained imagehashes /
  * audiohashes / audiofps / videohashes sides: the exact audio rung is
  * PCM-content identity, the acoustic-print rung behind it catches the
  * re-encoded or gain-shifted clip recycler whose hash differs but
  * whose energy contour survives, the video rung catches the clip
  * re-uploaded with its opening shot intact (keyframe-print identity),
  * and the SHOT-LEVEL rung behind it catches the re-edit keeping later
  * footage under a new opening (same-ordinal frame prints against the
  * framehashes side). Under `audioShiftRung` the WINDOW rung joins the
  * ladder (forward-shift ∪ reversal screens off the audiowins +
  * audiorwins sides — the silence-padded, trimmed, reversed or
  * reversed-plus-padded clip recycler rejects as `audio_shift_dup`),
  * under `videoShiftRung` the STRIDE rung (framestride ∪ framestridek
  * sides — the prepended-intro re-edit rejects as `video_shift_dup`,
  * and since round 20 so does the MIRRORED-and-prepended composed
  * re-edit, via the dihedral-canonical stride leg), and under
  * `imageShiftRung` the TILE rung (imagetiles side — the CROPPED
  * re-upload all three full-frame lenses miss rejects as
  * `image_shift_dup`).
  *
  * WHY THE SHIFT/TILE RUNGS ARE OPT-IN (the r19 verdict's ask #7,
  * decided and MEASURED in round 20): they are REJECTION rungs whose
  * false-positive rate is content-dependent in a way the whole-clip
  * rungs' is not — a 128-sample window (or a 16-px tile) carries far
  * less evidence than a whole clip, so on highly self-similar or
  * synthetic content, sub-prints of UNRELATED items land within the
  * Hamming gate. The fixture demonstrates the extreme: its mod-65536
  * sawtooth streams collide across unrelated text lengths (defaulting
  * the audio rung on reclassified nearly every media-feed spec probe
  * `audio_shift_dup` against clips it merely resembled window-wise),
  * and its generative ramp tiles collide across lengths the same way.
  * Real corpora sit between the extremes, so a deployment TUNES
  * `minMatched`/`maxHamming`/`maxOffset` against its own content
  * before arming an admission-time rejecter — arming it blind risks
  * false rejects that silently starve the corpus. The asymmetric
  * design makes opt-in cheap and late arming safe: the rungs' SIDES
  * are always-on (a flag toggle can never lose side history), and the
  * side SET is versioned in the mediaconf stamp (r19 advice), so
  * arming a rung against an index admitted under an OLDER side set
  * fails fast and routes through a backfill instead of silently
  * under-screening the pre-upgrade corpus. Text-only feeds skip all of
  * them entirely.
  *
  * Cross-tier CRASH SEMANTICS (the seam this type exists to pin): the
  * three phases run in a fixed order —
  *   1. VERDICT — computed over both tiers with the batch's own
  *      `batch=<lineage>-<id>` dirs EXCLUDED from every maintained-side
  *      read ([[DedupStream.sideExcluding]] /
  *      [[VectorStream.screenExcluding]]), materialized BEFORE any
  *      write, and stored at `outDir/verdicts/batch=<tag>` (idempotent
  *      overwrite);
  *   2. TEXT COMMIT — the admitted docs through
  *      [[DedupStream.admitBatch]] (its own self-exclusion + prior-probe
  *      replay discipline, every maintained side + groups);
  *   3. VECTOR COMMIT — the admitted ids' vectors through
  *      [[VectorStream.admitBatch]] (cells + stats + codes, same
  *      discipline).
  * A crash ANYWHERE — before the verdict write, BETWEEN the tiers (text
  * committed, vector not: the window the round-13 verdict called out),
  * or mid-vector-commit — replays the whole batch idempotently. The
  * phase-1 exclusion is what makes the replayed VERDICT STABLE: no
  * matter which tier(s) already committed, the replay reads exactly the
  * corpus the original attempt saw — an admitted doc's own shingles or
  * cells landing in tier state cannot flip its replayed verdict to
  * near_dup/semantic_dup, and its own seeds cannot manufacture a span
  * self-match — so each tier's batch-keyed overwrite rewrites itself
  * with identical content. Compaction carries each lineage's latest
  * (only replayable) batch dir un-folded, so the exclusion stays
  * addressable across an intervening compact on either tier.
  *
  * Preconditions: the vector tier is built once ([[VectorStream.build]]
  * — the frozen centroids are the screen's serving state) and the
  * single-writer-per-index discipline of each tier extends to the PAIR
  * (one CurationStream owns both index dirs between its microbatches).
  * Docs without a vector simply skip the semantic screen — multimodal
  * feeds are rarely total — and vectors without a doc are ignored (the
  * doc frame is the admission spine).
  *
  * Reference: the reference runs backfills through its livescan path
  * (main/src/etl.rs) — this service extends that one-path discipline
  * across two index tiers. */
object CurationStream {

  /** Thrown only by the spec's injected-crash seam, between phases 2 and
    * 3 — the exact window the cross-tier replay contract covers. */
  private[graft] final class CrashBetweenTiers
    extends RuntimeException("injected crash: text tier committed, vector tier not")

  /** The increment's per-batch media decode products, computed ONCE and
    * shared by the phase-1 screens and the phase-2 side writes. Which
    * image lens frames exist follows the `imageLens` config: `aHashes`
    * under AHashLens/BothLens, `dHashes` under DHashLens/BothLens —
    * under BothLens both PROJECT from one dual-lens decode
    * ([[MultimodalOps.lensFingerprintFrame]]); `frames` always (the
    * keyframe table is its ordinal-0 projection) — under `dihedralRung`
    * it is the DUAL-FAMILY frame ([[MultimodalOps.sampleFrameLens]]:
    * plain + canonical prints off one decode memo), whose projections
    * feed both video screens and all three video sides. */
  private final case class IncrMedia(aHashes: Option[DataFrame],
      dHashes: Option[DataFrame], kHashes: Option[DataFrame],
      frames: DataFrame, strides: DataFrame, kStrides: DataFrame,
      tiles: DataFrame, ktiles: DataFrame)

  /** The c2b-shaped ADVISORY verdict over both maintained tiers (nothing
    * excluded, nothing committed): what WOULD this increment do under
    * the full curation policy. One call, both tiers — the audit form of
    * [[admitBatch]], composing [[DedupStream.admissionVerdicts]] with
    * the vector tier's served screen. The media/audio decode products
    * are computed ONCE and shared across the four media screens exactly
    * like the committed path (the [[incrementMedia]]/[[incrementAudio]]
    * seam — an advisory call must not pay the payload generation and
    * container/PCM decode once per screen). */
  def verdicts(spark: SparkSession, textIndexDir: String,
      vectorIndexDir: String, docs: DataFrame, vectors: DataFrame,
      benchmark: DataFrame, threshold: Double = 0.5,
      semThreshold: Double = 0.9, minQuality: Double = 0.5,
      contamK: Int = 4, contamMinShared: Int = 1,
      maxCell: Int = 256,
      spanRung: DedupStream.SpanRung = DedupStream.SeedsRung,
      imageLens: DedupStream.ImageLens = DedupStream.AHashLens,
      dihedralRung: Boolean = false,
      audioShiftRung: Boolean = false,
      videoShiftRung: Boolean = false,
      imageShiftRung: Boolean = false): DataFrame = {
    // advisory calls never stamp, but a mismatched lens/rung must still
    // fail fast: screening against sides the index never maintained
    // reads empty and silently loses recall (the mediaconf discipline's
    // read-only half). The shift/tile rungs' sides are always-on, but
    // the side SET itself is versioned (r19 advice): an index stamped
    // under an older side set lacks those sides for its earlier batches,
    // so the rungs would silently under-screen forever — the version
    // check routes that through a backfill instead.
    DedupStream.checkMediaConf(spark, textIndexDir, imageLens, dihedralRung,
      needsShiftSides = audioShiftRung || videoShiftRung || imageShiftRung)
    val incrMedia = incrementMedia(docs, imageLens, dihedralRung)
    val incrAudio = incrementAudio(docs)
    val ids = docs.select("doc_id")
    DedupStream.admissionVerdicts(spark, textIndexDir, docs, benchmark,
      threshold, minQuality, contamK, contamMinShared,
      spanRung = spanRung,
      semPairs = Some(VectorStream.screen(spark, vectorIndexDir, vectors,
        semThreshold, maxCell)),
      imagePairs = incrMedia.map(im =>
        imagePairsOf(im, imageLens,
          DedupStream.corpusImageHashes(spark, textIndexDir),
          DedupStream.corpusImageDHashes(spark, textIndexDir),
          DedupStream.corpusImageKHashes(spark, textIndexDir), ids)),
      audioPairs = incrAudio.map(a =>
        MultimodalOps.audioExactDupsServedHashes(
          DedupStream.corpusAudioHashes(spark, textIndexDir), a, ids)),
      audioFpPairs = incrAudio.map(a =>
        MultimodalOps.imageNearDupsServedHashes(
          DedupStream.corpusAudioFps(spark, textIndexDir), a, ids)),
      videoPairs = incrMedia.map(im =>
        videoPairsOf(im, dihedralRung,
          DedupStream.corpusVideoHashes(spark, textIndexDir),
          DedupStream.corpusVideoKHashes(spark, textIndexDir), ids)),
      videoFramePairs = incrMedia.map(im =>
        videoFramePairsOf(im, dihedralRung,
          DedupStream.corpusFrameHashes(spark, textIndexDir),
          DedupStream.corpusFrameKHashes(spark, textIndexDir), ids)),
      audioShiftPairs =
        if (!audioShiftRung) None
        else incrAudio.map(a => audioShiftPairsOf(a,
          DedupStream.corpusAudioWins(spark, textIndexDir),
          DedupStream.corpusAudioRWins(spark, textIndexDir), ids)),
      videoShiftPairs =
        if (!videoShiftRung) None
        else incrMedia.map(im => videoShiftPairsOf(im,
          DedupStream.corpusFrameStrides(spark, textIndexDir),
          DedupStream.corpusFrameKStrides(spark, textIndexDir), ids)),
      imageTilePairs =
        if (!imageShiftRung) None
        else incrMedia.map(im => imageTilePairsOf(im,
          DedupStream.corpusImageTiles(spark, textIndexDir),
          DedupStream.corpusImageTileKs(spark, textIndexDir), ids)))
  }

  /** The audio WINDOW rung's COMPLETE pair frame: the forward-shift
    * screen (audiowins side) unioned with the reversal-canonical screen
    * (audiorwins side) — ONE rung class (`audio_shift_dup`) catching
    * the silence-padded, whole-window-trimmed, reversed AND
    * reversed-plus-padded clip recyclers, every one of which slips the
    * exact (pcm identity) and contour (whole-clip print) rungs above
    * it. Offset-0 pairs are deliberately INCLUDED: a pair a higher rung
    * also sees classes as that rung by the verdict precedence (the
    * imagePairsOf rule), so the screens stay complete with no
    * suppression logic. Both screens consume projections of the ONE
    * combined audio decode. */
  private def audioShiftPairsOf(incrAudio: DataFrame, winsSide: => DataFrame,
      rwinsSide: => DataFrame, ids: DataFrame): DataFrame =
    MultimodalOps.audioShiftNearDupsServedWins(
        winsSide, MultimodalOps.audioWinsOf(incrAudio), ids)
      .select("id_a", "id_b")
      .unionByName(MultimodalOps.audioRevNearDupsServedWins(
          rwinsSide, MultimodalOps.audioRWinsOf(incrAudio), ids)
        .select("id_a", "id_b"))
      .distinct()

  /** The image TILE rung's COMPLETE pair frame: the PLAIN tile screen
    * (imagetiles side — the CROPPED re-upload all three full-frame
    * lenses structurally miss: every sample position moves under a
    * crop, and a crop is not a dihedral transform) unioned with the
    * dihedral-CANONICAL tile screen (imagetilesk side — the
    * crop-AND-mirrored composed re-upload, r20: the evasion that also
    * scrambles every plain tile print), ONE rung class
    * (`image_shift_dup`), the videoShiftPairsOf rule on the spatial
    * axes. Both screens consume projections of the batch's one
    * combined image decode. Offset-(0,0) pairs deliberately included —
    * the verdict precedence classes them image_dup (the
    * audioShiftPairsOf rule). */
  private def imageTilePairsOf(im: IncrMedia, tileSide: => DataFrame,
      ktileSide: => DataFrame, ids: DataFrame): DataFrame =
    MultimodalOps.imageTileNearDupsServed(tileSide, im.tiles, ids)
      .select("id_a", "id_b")
      .unionByName(MultimodalOps.imageTileKNearDupsServed(
          ktileSide, im.ktiles, ids)
        .select("id_a", "id_b"))
      .distinct()

  /** The video STRIDE rung's COMPLETE pair frame: the PLAIN stride
    * screen (framestride side — the prepended-intro re-edit) unioned
    * with the dihedral-CANONICAL stride screen (framestridek side — the
    * MIRRORED-and-prepended composed re-edit, r20: the r19 verdict's
    * remaining video evasion), ONE rung class (`video_shift_dup`), the
    * audioShiftPairsOf rule on the frame axis. Both screens consume
    * projections of the batch's one combined video decode; the k-prints
    * ride the same frame memo, so the second leg costs bit work over
    * 16-byte rows, never a second container parse. */
  private def videoShiftPairsOf(im: IncrMedia, strideSide: => DataFrame,
      kStrideSide: => DataFrame, ids: DataFrame): DataFrame =
    MultimodalOps.audioShiftNearDupsServedWins(strideSide, im.strides, ids)
      .select("id_a", "id_b")
      .unionByName(MultimodalOps.audioShiftNearDupsServedWins(
          kStrideSide, im.kStrides, ids)
        .select("id_a", "id_b"))
      .distinct()

  /** The increment's image-lens fingerprints AND sampled-frame prints,
    * decoded ONCE per batch off ONE materialized media table and fed to
    * the phase-1 screens and the phase-2 side writes — the keyframe
    * table is the frame prints' ordinal-0 PROJECTION
    * ([[MultimodalOps.keyframeOf]]), so a video container parses exactly
    * once per batch however many rungs consume it; under a dHash-bearing
    * lens both print families project from ONE dual-lens decode. None
    * when the feed carries no media envelope
    * ([[MultimodalOps.hasMediaEnvelope]], the same single gate the side
    * writes key on): text-only feeds pay nothing, not even the sides'
    * FS probes. */
  private def incrementMedia(docs: DataFrame, lens: DedupStream.ImageLens,
      dihedralRung: Boolean): Option[IncrMedia] =
    if (MultimodalOps.hasMediaEnvelope(docs)) {
      val media = MultimodalOps.mediaTableRaw(docs)
      // ONE combined video decode (decodeVideoFull: proportional
      // dual-family samples + fixed-stride prints off one container
      // parse and one frame memo): the keyframe, shot, canonical and
      // SHIFT screens — and all four video side writes — are column
      // projections of this frame; a container never parses twice
      val vfull = MultimodalOps.videoFullRaw(docs.sparkSession, media)
      val frames = MultimodalOps.videoFramesOf(vfull)
      val strides = MultimodalOps.videoStridesOf(vfull)
      val kStrides = MultimodalOps.videoStrideKOf(vfull)
      // ONE combined image decode (lensTileFrame: every lens family AND
      // the tile sub-prints off the same pixels — the imagetiles side is
      // always-on since round 20, so the tile rows are needed whatever
      // the lens config); each configured family projects its column set
      val lensRaw = MultimodalOps.lensTileFrameRaw(media)
      Some(IncrMedia(
        if (lens != DedupStream.DHashLens)
          Some(MultimodalOps.aHashOf(lensRaw)) else None,
        if (lens != DedupStream.AHashLens)
          Some(MultimodalOps.dHashOf(lensRaw)) else None,
        if (dihedralRung)
          Some(MultimodalOps.dihedralOf(lensRaw)) else None,
        frames, strides, kStrides, MultimodalOps.tilesOf(lensRaw),
        MultimodalOps.ktilesOf(lensRaw)))
    } else None

  /** The image rung's COMPLETE pair frame: the configured lens screen,
    * unioned (on (id_a, id_b)) with the dihedral-canonical screen when
    * `dihedralRung` is on — the mirrored/rotated recycler rejects as
    * `image_dup` like any other image recycling. */
  private def imagePairsOf(im: IncrMedia, lens: DedupStream.ImageLens,
      aSide: => DataFrame, dSide: => DataFrame, kSide: => DataFrame,
      ids: DataFrame): DataFrame = {
    val base = DedupStream.imageScreenOfHashes(lens, aSide, dSide,
      im.aHashes.get, im.dHashes.get, ids)
    im.kHashes.fold(base) { k =>
      base.select("id_a", "id_b").unionByName(
          MultimodalOps.imageNearDupsServedHashes(kSide, k, ids)
            .select("id_a", "id_b"))
        .distinct()
    }
  }

  /** The video rung's COMPLETE pair frame: the plain keyframe screen,
    * unioned (on (id_a, id_b)) with the DIHEDRAL-CANONICAL keyframe
    * screen when `dihedralRung` is on — the clip recycled MIRRORED or
    * rotated rejects as `video_dup` like any other clip recycling (the
    * imagePairsOf rule on the fourth modality; both screens' keyframes
    * project from the ONE dual-family frame decode). */
  private def videoPairsOf(im: IncrMedia, dihedralRung: Boolean,
      vSide: => DataFrame, vkSide: => DataFrame,
      ids: DataFrame): DataFrame = {
    val base = MultimodalOps.imageNearDupsServedHashes(
      vSide, MultimodalOps.keyframeOf(im.frames), ids)
    if (!dihedralRung) base
    else base.select("id_a", "id_b").unionByName(
        MultimodalOps.imageNearDupsServedHashes(vkSide,
          MultimodalOps.keyframeOf(MultimodalOps.frameDihedralOf(im.frames)),
          ids).select("id_a", "id_b"))
      .distinct()
  }

  /** The shot-level rung's COMPLETE pair frame: the plain per-ordinal
    * screen, unioned with the DIHEDRAL-CANONICAL per-ordinal screen when
    * `dihedralRung` is on — the re-edit that keeps later footage AND
    * flips it rejects as `video_near_dup` (the [[videoPairsOf]] rule one
    * rung down; the canonical frame prints project from the same
    * dual-family decode). Output is (id_a, id_b) under both configs —
    * the screen is a pair rejecter, and a config-dependent column set
    * breaks distance-reading callers silently (the imageScreenOfHashes
    * normalization rule). */
  private def videoFramePairsOf(im: IncrMedia, dihedralRung: Boolean,
      fSide: => DataFrame, fkSide: => DataFrame,
      ids: DataFrame): DataFrame = {
    val base = MultimodalOps.frameNearDupsServedHashes(fSide, im.frames, ids)
      .select("id_a", "id_b")
    if (!dihedralRung) base
    else base.unionByName(
        MultimodalOps.frameNearDupsServedHashes(fkSide,
          MultimodalOps.frameDihedralOf(im.frames), ids)
          .select("id_a", "id_b"))
      .distinct()
  }

  /** The increment's COMBINED audio decode (header + content hash +
    * acoustic print), decoded ONCE per batch — the [[incrementMedia]]
    * discipline on the third modality: phase-1's exact-audio rung, its
    * perceptual-print rung, and BOTH phase-2 side writes (audiohashes +
    * audiofps) share this one frame. */
  private def incrementAudio(docs: DataFrame): Option[DataFrame] =
    if (MultimodalOps.hasMediaEnvelope(docs))
      Some(MultimodalOps.audioFullRaw(docs.sparkSession, docs))
    else None

  /** One microbatch: dual-tier verdict, then commit admitted docs to the
    * text tier and their vectors to the vector tier. Public so batch
    * backfills reuse the exact streaming admission logic. */
  def admitBatch(docs: DataFrame, vectors: DataFrame, batchId: Long,
      textIndexDir: String, vectorIndexDir: String, outDir: String,
      benchmark: DataFrame, threshold: Double = 0.5,
      semThreshold: Double = 0.9, minQuality: Double = 0.5,
      contamK: Int = 4, contamMinShared: Int = 1,
      lineage: String = "curation", maxCell: Int = 256,
      bloomSizing: DedupOps.BloomSizing = DedupOps.BloomSizing.Default,
      spanRung: DedupStream.SpanRung = DedupStream.SeedsRung,
      imageLens: DedupStream.ImageLens = DedupStream.AHashLens,
      dihedralRung: Boolean = false,
      audioShiftRung: Boolean = false,
      videoShiftRung: Boolean = false,
      imageShiftRung: Boolean = false): Unit =
    admitBatchImpl(docs, vectors, batchId, textIndexDir, vectorIndexDir,
      outDir, benchmark, threshold, semThreshold, minQuality, contamK,
      contamMinShared, lineage, maxCell, bloomSizing,
      failAfterTextTier = false, spanRung = spanRung, imageLens = imageLens,
      dihedralRung = dihedralRung, audioShiftRung = audioShiftRung,
      videoShiftRung = videoShiftRung, imageShiftRung = imageShiftRung)

  private[graft] def admitBatchImpl(docs: DataFrame, vectors: DataFrame,
      batchId: Long, textIndexDir: String, vectorIndexDir: String,
      outDir: String, benchmark: DataFrame, threshold: Double,
      semThreshold: Double, minQuality: Double, contamK: Int,
      contamMinShared: Int, lineage: String, maxCell: Int,
      bloomSizing: DedupOps.BloomSizing, failAfterTextTier: Boolean,
      spanRung: DedupStream.SpanRung = DedupStream.SeedsRung,
      imageLens: DedupStream.ImageLens = DedupStream.AHashLens,
      dihedralRung: Boolean = false,
      audioShiftRung: Boolean = false,
      videoShiftRung: Boolean = false,
      imageShiftRung: Boolean = false): Unit = {
    val spark = docs.sparkSession
    if (docs.isEmpty) return // trailing empty trigger: no state change
    val tag = s"$lineage-$batchId"
    // the increment's image-lens + audio fingerprints, decoded ONCE (None
    // for text-only feeds) — the screens below and the phase-2 side
    // writes share them
    val incrMedia = incrementMedia(docs, imageLens, dihedralRung)
    val incrFrames = incrMedia.map(_.frames)
    val incrVideo = incrFrames.map(MultimodalOps.keyframeOf)
    // the canonical keyframe projection (videokhashes' rows) — off the
    // same dual-family frame decode, only under the rung
    val incrVideoK =
      if (dihedralRung)
        incrFrames.map(f =>
          MultimodalOps.keyframeOf(MultimodalOps.frameDihedralOf(f)))
      else None
    val incrAudio = incrementAudio(docs)
    // ---- phase 1: VERDICT, both tiers' own-batch dirs excluded --------
    val verdict = CurationOps.admitIncrement(docs,
      DedupOps.incrementalNearDups(DedupOps.shingleArrays(docs),
        DedupStream.sideExcluding(spark, textIndexDir, "shingles", tag),
        DedupStream.sideExcluding(spark, textIndexDir, "bands", tag),
        threshold),
      // the span rung on the CONFIGURED index (seeds = coordinates;
      // sketch = t21d's 1/w-sized winnowfps side), each side through the
      // own-batch exclusion; the by-name args mean only the chosen
      // rung's sides are ever probed
      DedupStream.spanScreenOf(spark, spanRung, docs,
        DedupStream.sideExcluding(spark, textIndexDir, "seeds", tag),
        DedupStream.sideExcluding(spark, textIndexDir, "seedstats", tag),
        DedupStream.sideExcluding(spark, textIndexDir, "winnowfps", tag)),
      DedupOps.contaminationHits(docs, benchmark, contamK, contamMinShared),
      minQuality,
      Some(VectorStream.screenExcluding(spark, vectorIndexDir, vectors,
        semThreshold, maxCell, tag)),
      // the image rung (when the feed carries media): the CONFIGURED
      // lens's maintained side(s) with this batch's own dir excluded —
      // on top of the screen's id-level self-exclusion — so a replay
      // screens exactly the corpus the original attempt saw; under
      // BothLens the two lens screens' pairs union (the m4g semantics,
      // served), and under dihedralRung the canonical-print screen's
      // pairs join the union (the mirror-flip catch)
      incrMedia.map(im => imagePairsOf(im, imageLens,
        DedupStream.sideExcluding(spark, textIndexDir, "imagehashes", tag),
        DedupStream.sideExcluding(spark, textIndexDir, "imagedhashes", tag),
        DedupStream.sideExcluding(spark, textIndexDir, "imagekhashes", tag),
        docs.select("doc_id"))),
      // the exact-audio rung: maintained side with this batch's own dir
      // excluded, on top of the screen's id-level self-exclusion
      incrAudio.map(a => MultimodalOps.audioExactDupsServedHashes(
        DedupStream.sideExcluding(spark, textIndexDir, "audiohashes", tag),
        a, docs.select("doc_id"))),
      // the PERCEPTUAL audio rung: the increment's acoustic prints (off
      // the same combined decode) against the maintained audiofps side,
      // same exclusion discipline — catches the re-encoded clip whose
      // pcm_hash slipped the exact rung
      incrAudio.map(a => MultimodalOps.imageNearDupsServedHashes(
        DedupStream.sideExcluding(spark, textIndexDir, "audiofps", tag),
        a, docs.select("doc_id"))),
      // the VIDEO rung: the increment's keyframe prints (off the same
      // materialized media table as the image rung) against the
      // maintained videohashes side, same exclusion discipline — the
      // clip re-uploaded with its opening shot intact; under
      // dihedralRung the CANONICAL keyframe screen's pairs join the
      // union (the mirrored-clip catch, videokhashes side)
      incrMedia.map(im => videoPairsOf(im, dihedralRung,
        DedupStream.sideExcluding(spark, textIndexDir, "videohashes", tag),
        DedupStream.sideExcluding(spark, textIndexDir, "videokhashes", tag),
        docs.select("doc_id"))),
      // the SHOT-LEVEL rung: the increment's sampled-frame prints (the
      // same frame the keyframe projection rode) against the maintained
      // framehashes side, same exclusion discipline — catches the
      // re-edit whose opening shot is new; under dihedralRung the
      // CANONICAL per-ordinal screen's pairs join the union (the
      // flipped-re-edit catch, framekhashes side)
      incrMedia.map(im => videoFramePairsOf(im, dihedralRung,
        DedupStream.sideExcluding(spark, textIndexDir, "framehashes", tag),
        DedupStream.sideExcluding(spark, textIndexDir, "framekhashes", tag),
        docs.select("doc_id"))),
      // the audio WINDOW rung (forward-shift ∪ reversal screens off the
      // always-on audiowins/audiorwins sides) and the video STRIDE rung
      // (framestride side): both consume projections of the batch's one
      // combined decode, both under the own-batch exclusion discipline
      if (!audioShiftRung) None
      else incrAudio.map(a => audioShiftPairsOf(a,
        DedupStream.sideExcluding(spark, textIndexDir, "audiowins", tag),
        DedupStream.sideExcluding(spark, textIndexDir, "audiorwins", tag),
        docs.select("doc_id"))),
      if (!videoShiftRung) None
      else incrMedia.map(im => videoShiftPairsOf(im,
        DedupStream.sideExcluding(spark, textIndexDir, "framestride", tag),
        DedupStream.sideExcluding(spark, textIndexDir, "framestridek", tag),
        docs.select("doc_id"))),
      // the image TILE rung: the increment's tile sub-prints (the same
      // combined image decode) against the maintained imagetiles side,
      // own-batch exclusion discipline — the cropped re-upload rejects
      // as image_shift_dup
      imageTilePairs =
        if (!imageShiftRung) None
        else incrMedia.map(im => imageTilePairsOf(im,
          DedupStream.sideExcluding(spark, textIndexDir, "imagetiles", tag),
          DedupStream.sideExcluding(spark, textIndexDir, "imagetilesk", tag),
          docs.select("doc_id"))))
      .persist()
    try {
      // materialize NOW: the verdict lazily reads the very dirs the
      // commits below append to — forcing it first keeps the read set
      // consistent (the DedupStream.admitBatch discipline, cross-tier)
      verdict.count()
      verdict.write.mode("overwrite").parquet(s"$outDir/verdicts/batch=$tag")
      // the COMMITS consume the durable verdict (a parquet re-read, not
      // the live plan): the admitted set a replay acts on is exactly the
      // set the stored verdict names, and the downstream tier plans stop
      // embedding the full dual-tier screen tree (whose repeated
      // re-composition otherwise balloons every commit-side plan)
      val admitted = spark.read.parquet(s"$outDir/verdicts/batch=$tag")
        .filter(col("verdict") === "admitted")
        .select("doc_id")
      // ---- phase 2: TEXT COMMIT ---------------------------------------
      // DedupStream.admitBatch re-runs its dedup screens over the
      // admitted set — they find nothing (verdict-admitted docs have no
      // pairs) — and owns the replay discipline for every maintained
      // side (sixteen always-on, plus the lens/rung-configured ones)
      DedupStream.admitBatch(
        docs.join(admitted, Seq("doc_id"), "left_semi"),
        batchId, textIndexDir, s"$outDir/text", threshold, lineage,
        bloomSizing,
        // the phase-1 fingerprints, restricted to the kept set inside
        // admitBatch — the admitted images/clips are NOT re-decoded
        imageHashes = incrMedia.flatMap(_.aHashes),
        audioFull = incrAudio,
        videoHashes = incrVideo,
        frameHashes = incrFrames,
        imageLens = imageLens,
        imageDHashes = incrMedia.flatMap(_.dHashes),
        dihedralRung = dihedralRung,
        imageKHashes = incrMedia.flatMap(_.kHashes),
        videoKHashes = incrVideoK,
        frameKHashes =
          if (dihedralRung)
            incrFrames.map(MultimodalOps.frameDihedralOf)
          else None,
        frameStrides = incrMedia.map(_.strides),
        frameKStrides = incrMedia.map(_.kStrides),
        imageTiles = incrMedia.map(_.tiles),
        imageKTiles = incrMedia.map(im =>
          im.ktiles.filter(col("fam") === "lt")
            .select("doc_id", "tx", "ty", "h_hi", "h_lo")))
      if (failAfterTextTier) throw new CrashBetweenTiers
      // ---- phase 3: VECTOR COMMIT -------------------------------------
      VectorStream.admitBatch(
        vectors.join(admitted.withColumnRenamed("doc_id", "vec_id"),
          Seq("vec_id"), "left_semi"),
        batchId, vectorIndexDir, s"$outDir/vec", semThreshold, lineage,
        maxCell)
      // Dual-tier admission accounting (the K4 discipline): the per-tier
      // metrics under outDir/text|vec see only the verdict-admitted
      // subset — a 100%-admission picture — so the service exports the
      // verdict-level reject counts itself. Written LAST on the same
      // idempotent batch= key: a present metrics row implies the batch
      // committed BOTH tiers.
      val counts = spark.read.parquet(s"$outDir/verdicts/batch=$tag")
        .groupBy("verdict").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      import spark.implicits._
      Seq((lineage, batchId, counts.values.sum,
          counts.getOrElse("admitted", 0L), counts.getOrElse("near_dup", 0L),
          counts.getOrElse("span_dup", 0L),
          counts.getOrElse("semantic_dup", 0L),
          counts.getOrElse("image_dup", 0L),
          counts.getOrElse("image_shift_dup", 0L),
          counts.getOrElse("audio_dup", 0L),
          counts.getOrElse("audio_near_dup", 0L),
          counts.getOrElse("audio_shift_dup", 0L),
          counts.getOrElse("video_dup", 0L),
          counts.getOrElse("video_near_dup", 0L),
          counts.getOrElse("video_shift_dup", 0L),
          counts.getOrElse("contaminated", 0L),
          counts.getOrElse("low_quality", 0L)))
        .toDF("lineage", "batch_id", "n_in", "n_admitted", "n_near_dup",
          "n_span_dup", "n_semantic_dup", "n_image_dup", "n_image_shift_dup",
          "n_audio_dup",
          "n_audio_near_dup", "n_audio_shift_dup", "n_video_dup",
          "n_video_near_dup", "n_video_shift_dup",
          "n_contaminated", "n_low_quality")
        .write.mode("overwrite").parquet(s"$outDir/metrics/batch=$tag")
    } finally {
      verdict.unpersist(blocking = false)
      DedupOps.releaseCaches()
    }
  }

  /** The verdict history across the stream: one c2b-shaped row per
    * screened doc per batch (the service's primary output — kept/dups
    * details per tier live under `outDir/text` and `outDir/vec`). */
  def verdictLog(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(s"$outDir/verdicts").drop("batch").orderBy("doc_id")

  /** Per-batch DUAL-TIER admission accounting: the verdict-level counts
    * (the per-tier metrics under `outDir/text`/`outDir/vec` describe only
    * the already-admitted subset). A batch appears here only once both
    * tiers committed. Read under an EXPLICIT schema (the readSide
    * discipline): a long-lived outDir mixing rows written before the
    * image rung with rows after must not let one parquet footer decide
    * the column set — legacy rows surface n_image_dup as 0, the count a
    * rung that didn't exist yet genuinely had. */
  def metrics(spark: SparkSession, outDir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(
      Seq(StructField("lineage", StringType), StructField("batch_id", LongType),
        StructField("n_in", LongType), StructField("n_admitted", LongType),
        StructField("n_near_dup", LongType), StructField("n_span_dup", LongType),
        StructField("n_semantic_dup", LongType),
        StructField("n_image_dup", LongType),
        StructField("n_image_shift_dup", LongType),
        StructField("n_audio_dup", LongType),
        StructField("n_audio_near_dup", LongType),
        StructField("n_audio_shift_dup", LongType),
        StructField("n_video_dup", LongType),
        StructField("n_video_near_dup", LongType),
        StructField("n_video_shift_dup", LongType),
        StructField("n_contaminated", LongType),
        StructField("n_low_quality", LongType),
        StructField("batch", StringType)))
    spark.read.schema(schema).parquet(s"$outDir/metrics")
      .na.fill(0L, Seq("n_image_dup", "n_image_shift_dup", "n_audio_dup",
        "n_audio_near_dup",
        "n_audio_shift_dup", "n_video_dup", "n_video_near_dup",
        "n_video_shift_dup"))
      .drop("batch").orderBy("lineage", "batch_id")
  }

  /** Start the dual-tier admission stream over a streaming frame carrying
    * (doc_id, text, …, embedding) — the embedding column may be null for
    * text-only rows; those skip the semantic screen and the vector
    * commit. */
  def start(stream: DataFrame, textIndexDir: String, vectorIndexDir: String,
      outDir: String, checkpointDir: String, benchmark: DataFrame,
      threshold: Double = 0.5, semThreshold: Double = 0.9,
      minQuality: Double = 0.5, maxCell: Int = 256,
      bloomSizing: DedupOps.BloomSizing = DedupOps.BloomSizing.Default,
      spanRung: DedupStream.SpanRung = DedupStream.SeedsRung,
      imageLens: DedupStream.ImageLens = DedupStream.AHashLens,
      dihedralRung: Boolean = false,
      audioShiftRung: Boolean = false,
      videoShiftRung: Boolean = false,
      imageShiftRung: Boolean = false): StreamingQuery = {
    val lineage = IndexSides.lineageOf(checkpointDir)
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        admitBatch(
          batch.drop("embedding"),
          batch.filter(col("embedding").isNotNull)
            .select(col("doc_id").as("vec_id"), col("embedding")),
          batchId, textIndexDir, vectorIndexDir, outDir, benchmark,
          threshold, semThreshold, minQuality, lineage = lineage,
          maxCell = maxCell, bloomSizing = bloomSizing, spanRung = spanRung,
          imageLens = imageLens, dihedralRung = dihedralRung,
          audioShiftRung = audioShiftRung, videoShiftRung = videoShiftRung,
          imageShiftRung = imageShiftRung)
      }
      .start()
  }
}
