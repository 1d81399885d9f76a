package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

import graft.llm.DedupOps

/** Streaming incremental dedup — the online form of
  * [[graft.llm.DedupOps.incrementalNearDups]] (D5): each microbatch of
  * incoming documents is near-dup-checked against the maintained corpus
  * index, duplicates are rejected with a verdict row naming what they
  * matched, and the admitted survivors' bands + shingles are APPENDED to
  * the index. Per-batch cost is O(batch + matches), independent of corpus
  * size — the property that makes continuous dedup viable at 100 TB,
  * where re-running the batch pipeline per increment would re-shingle the
  * whole lake.
  *
  * On-disk state (all parquet, one immutable dir per batch —
  * `mode=overwrite` into a (lineage, batchId)-keyed dir makes replay of a
  * failed microbatch idempotent, the same recipe as the DLQ sink, while a
  * NEW checkpoint lineage restarting batch numbering at 0 cannot clobber
  * a previous lineage's admissions):
  * {{{
  * indexDir/shingles/batch=<lineage>-<id>/  (doc_id, sh_arr)   verify side
  * indexDir/bands/batch=<lineage>-<id>/     (doc_id, band, key) LSH side
  * indexDir/seeds/batch=<lineage>-<id>/     (doc_id, pos, kh)  d9b span side
  * indexDir/seedstats/batch=<lineage>-<id>/ (kh, df) sum-partials — d9b's
  *                                          df prune, no corpus re-agg
  * indexDir/wordcounts/batch=<lineage>-<id>/ (word, n) sum-partials —
  *                                          t13/t15 vocabulary serving
  * indexDir/bigramcounts/batch=<lineage>-<id>/ (prev, word, n)
  *                                          sum-partials — t19d's
  *                                          conditional LM screen
  * indexDir/imagehashes/batch=<lineage>-<id>/ (doc_id, h_hi, h_lo, w, h)
  *                                          aHash fingerprints of the
  *                                          admitted media — m4d serving
  * indexDir/imagedhashes/batch=<lineage>-<id>/ (imagehashes schema) dHash
  *                                          GRADIENT-lens prints — the
  *                                          OPTIONAL fourteenth side,
  *                                          written under imageLens =
  *                                          DHashLens|BothLens off the
  *                                          SAME decode (m4f/m4g serving)
  * indexDir/imagekhashes/batch=<lineage>-<id>/ (imagehashes schema)
  *                                          DIHEDRAL-canonical prints —
  *                                          the OPTIONAL fifteenth side,
  *                                          written under dihedralRung
  *                                          (orthogonal to imageLens)
  *                                          off the SAME decode — the
  *                                          mirror-flip-recycler catch
  * indexDir/winnowfps/batch=<lineage>-<id>/ (doc_id, fp) winnow sketch
  *                                          rows (t21, ~1/w the seed
  *                                          side) — t21d pair serving
  * indexDir/audiohashes/batch=<lineage>-<id>/ (doc_id, …, pcm_hash) audio
  *                                          content fingerprints of the
  *                                          admitted media — m5c serving
  * indexDir/audiofps/batch=<lineage>-<id>/  (doc_id, h_hi, h_lo, n_frames)
  *                                          acoustic prints off the SAME
  *                                          decode — m5d/m5e serving
  * indexDir/audiowins/batch=<lineage>-<id>/ (doc_id, ordinal, h_hi, h_lo)
  *                                          WINDOWED sub-prints off the
  *                                          SAME decode — m5h's shift
  *                                          tier served (m5i/m5j): the
  *                                          silence-padded recycler
  *                                          caught at its true offset
  * indexDir/audiorwins/batch=<lineage>-<id>/ (doc_id, family, ordinal,
  *                                          h_hi, h_lo) dual-family
  *                                          REVERSAL-canonical window
  *                                          prints off the SAME decode —
  *                                          m5m's reversal∘shift tier
  *                                          served (m5n/m5o): the
  *                                          reversed(+padded) recycler
  *                                          caught at admission
  * indexDir/videohashes/batch=<lineage>-<id>/ (imagehashes schema) keyframe
  *                                          prints of the admitted video
  *                                          renditions — m7c serving
  * indexDir/videokhashes/batch=<lineage>-<id>/ (imagehashes schema)
  *                                          DIHEDRAL-canonical keyframe
  *                                          prints — the OPTIONAL
  *                                          sixteenth side, written under
  *                                          dihedralRung off the SAME
  *                                          frame decode — the mirrored/
  *                                          rotated clip-recycler catch
  *                                          (m7f serving)
  * indexDir/framehashes/batch=<lineage>-<id>/ (doc_id, frame_idx,
  *                                          frame_no, h_hi, h_lo) the
  *                                          sampled-frame prints behind
  *                                          them — m3c shot-level serving
  * indexDir/framekhashes/batch=<lineage>-<id>/ (framehashes schema)
  *                                          DIHEDRAL-canonical per-
  *                                          ordinal prints — OPTIONAL,
  *                                          under dihedralRung off the
  *                                          SAME frame decode: the
  *                                          flipped re-edit catch (m3e
  *                                          serving)
  * indexDir/framestride/batch=<lineage>-<id>/ (doc_id, ordinal, h_hi,
  *                                          h_lo) fixed-STRIDE frame
  *                                          prints off the SAME frame
  *                                          decode — m3f's video shift
  *                                          tier served (m3g/m3h): the
  *                                          prepended-intro re-edit
  *                                          caught at its true offset
  * indexDir/framestridek/batch=<lineage>-<id>/ (framestride schema)
  *                                          dihedral-CANONICAL stride
  *                                          prints off the SAME frame
  *                                          memo — m3i's dihedral∘shift
  *                                          tier served (m3j/m3k): the
  *                                          mirrored-AND-prepended
  *                                          re-edit caught at admission
  * indexDir/imagetiles/batch=<lineage>-<id>/ (doc_id, tx, ty, h_hi,
  *                                          h_lo) TILE sub-prints off
  *                                          the SAME image decode —
  *                                          m4o's spatial-crop tier
  *                                          served (m4p/m4q): the
  *                                          cropped re-upload caught at
  *                                          its true (dx, dy)
  * indexDir/imagetilesk/batch=<lineage>-<id>/ (imagetiles schema)
  *                                          dihedral-CANONICAL tile
  *                                          prints, 'lt' anchor family
  *                                          only, off the SAME decode —
  *                                          m4r's crop∘dihedral tier
  *                                          served (m4s/m4t): the
  *                                          crop-AND-mirrored re-upload
  *                                          caught at admission
  * indexDir/bloom/batch=<lineage>-<id>/     (bits) one OR-mergeable Bloom
  *                                          bitset partial — d10 serving
  * indexDir/groups/                         (doc_id, group_id) assignment
  *                                          — a BucketStore (manifest +
  *                                          CURRENT flip), upserted per
  *                                          batch via incrementalGroupDelta
  * outDir/kept/batch=<lineage>-<id>/        admitted documents (full rows)
  * outDir/dups/batch=<lineage>-<id>/        (id_a, id_b, jaccard) verdicts
  * outDir/metrics/batch=<lineage>-<id>/     one admission-accounting row
  * }}}
  * The eighteen always-on index sides (plus the optional imagedhashes
  * under `imageLens = DHashLens | BothLens`, and imagekhashes +
  * videokhashes + framekhashes under `dihedralRung`; the lens/rung pair
  * is STAMPED at the index root on first admission and a mismatch fails
  * fast — `mediaconf`, the bloom-geometry discipline) start flat under
  * `indexDir` and migrate into
  * GENERATION TREES on first [[compact]]: the fold is staged and
  * published atomically as `indexDir/tree-<g>/<side>/…`
  * ([[IndexSides.compact]]), readers resolve the highest generation via
  * [[liveRoot]], and the superseded tree (or the flat layout) is
  * retained one publication so in-flight scans finish on intact files —
  * the same retention discipline as [[VectorStream]]'s rebuild seam.
  * `groups/` and the three `outDir` sides stay at their flat paths
  * (groups is a BucketStore with its own manifest-flip retention; the
  * out sides are append-only, never rewritten).
  *
  * At deployment scale `bands/` is bucketed by (band, key) so the
  * per-batch candidate join shuffles only the increment, and `shingles/`
  * by doc_id for the verify join; both then serve as ordinary tables.
  * Small-file accumulation (one dir per microbatch) is the standard
  * streaming-table concern: [[compact]] is the OPTIMIZE analog, and a
  * deployment can equally back the sides with a real table format
  * (Delta/Iceberg) whose rewrite compaction runs out-of-band — the same
  * swap seam as BucketStore's MERGE INTO note, leaving the admission
  * logic untouched. */
object DedupStream {

  private val ShingleSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("sh_arr", ArrayType(LongType))))
  private val BandSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("band", IntegerType),
    StructField("key", StringType)))
  private val SeedSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("pos", IntegerType),
    StructField("kh", LongType)))
  private val StatsSchema = StructType(Seq(
    StructField("kh", LongType), StructField("df", LongType)))
  private val WordSchema = StructType(Seq(
    StructField("word", StringType), StructField("n", LongType)))
  private val BigramSchema = StructType(Seq(
    StructField("prev", StringType), StructField("word", StringType),
    StructField("n", LongType)))
  private val ImgHashSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("h_hi", LongType),
    StructField("h_lo", LongType), StructField("width", LongType),
    StructField("height", LongType)))
  private val TileSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("tx", LongType),
    StructField("ty", LongType), StructField("h_hi", LongType),
    StructField("h_lo", LongType)))
  private val WinnowSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("fp", LongType)))
  private val AudioHashSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("format", StringType),
    StructField("sample_rate", LongType), StructField("channels", LongType),
    StructField("n_frames", LongType), StructField("duration_ms", LongType),
    StructField("pcm_hash", LongType)))
  private val AudioFpSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("h_hi", LongType),
    StructField("h_lo", LongType), StructField("n_frames", LongType)))
  private val AudioWinSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("ordinal", LongType),
    StructField("h_hi", LongType), StructField("h_lo", LongType)))
  private val AudioRWinSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("family", StringType),
    StructField("ordinal", LongType),
    StructField("h_hi", LongType), StructField("h_lo", LongType)))
  private val FrameHashSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("frame_idx", LongType),
    StructField("frame_no", LongType), StructField("h_hi", LongType),
    StructField("h_lo", LongType)))
  // (shard, bits): one bitset partial per shard per batch. Legacy
  // pre-shard partials lack the column — they read as NULL and fold as
  // shard 0, so unsharded history and sharded appends coexist.
  private val BloomSchema = StructType(Seq(
    StructField("shard", IntegerType), StructField("bits", BinaryType)))
  private val BloomConfSchema = StructType(Seq(
    StructField("bits", IntegerType), StructField("hashes", IntegerType),
    StructField("shards", IntegerType), StructField("target_fpr", DoubleType)))

  /** The index's PERSISTED Bloom geometry — stamped beside the bloom side
    * on the index's first admission ([[admitBatch]]'s `bloomSizing`, fed
    * from `EngineConf.bloomSizingFor` at deployment) and carried through
    * compactions/generations like any tree member. Geometry is INDEX
    * state, not caller memory: partials of different geometries cannot
    * OR, so every serve/fold path reads THIS, never a parameter. Absent
    * conf (an index predating config-driven sizing) means the
    * compile-time default. */
  def bloomSizingAt(spark: SparkSession, indexDir: String): DedupOps.BloomSizing =
    bloomSizingUnder(spark, liveRoot(spark, indexDir))

  private def bloomSizingUnder(spark: SparkSession, live: String): DedupOps.BloomSizing =
    readConfUnder(spark, live).getOrElse(DedupOps.BloomSizing.Default)

  /** The stamp dirs under a live root, (version, name), version-descending.
    * `bloomconf` (the round-13 original) is version 0; updates write
    * `bloomconf-<n>` — a stamp is NEVER overwritten in place (an
    * overwrite of an established stamp would open a window where readers
    * resolve no stamp at all and misread the geometry); readers take the
    * highest READABLE version, so a crash mid-write of a new version is
    * simply skipped. */
  private def confDirsUnder(fs: org.apache.hadoop.fs.FileSystem,
      live: String): Seq[(Long, String)] = {
    val p = new Path(live)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .flatMap {
        case "bloomconf" => Some(0L -> "bloomconf")
        case n if n.startsWith("bloomconf-") =>
          scala.util.Try(n.stripPrefix("bloomconf-").toLong).toOption.map(_ -> n)
        case _ => None
      }
      .sortBy(-_._1)
  }

  /** The highest READABLE stamp, with its version. Two distinct
    * can't-read cases, two behaviors:
    *  - an EMPTY dir (a crash mid-stamp leaves no data files) reads as
    *    absent — fall through to the previous version, or Default for a
    *    never-stamped index;
    *  - a CORRUPT/truncated file (a non-atomic copy; the read throws) is
    *    skipped ONLY in favor of a readable lower version — and skipping
    *    it is LOUD: a corrupt dir that OUTRANKS the resolved stamp means
    *    a newer configuration was written and lost, so resolution emits a
    *    rate-limited warning naming the skipped version(s) (once per
    *    (live root, corrupt dir) per process, the drift-warning
    *    discipline) instead of silently serving the older stamp forever.
    *    Under the current writers the skip is geometry-safe — every
    *    stamp version past the first shares the stamped geometry
    *    (retargetBloomFpr changes only designFpr; the no-partials
    *    re-stamp path has nothing to screen) — but the warning is the
    *    operator's cue to repair before any future writer breaks that
    *    invariant. If no version is readable but a corrupt stamp
    *    exists, resolution FAILS — the index demonstrably had a stamped
    *    geometry, so silently assuming Default would test the wrong
    *    hash positions against the partials and turn the
    *    no-false-negative screen into silent misses. */
  private def readConfVersioned(spark: SparkSession,
      live: String): Option[(Long, DedupOps.BloomSizing)] = {
    val fs = IndexSides.fsOf(spark, live)
    var corrupt = List.empty[String]
    val resolved = confDirsUnder(fs, live).iterator.flatMap { case (v, name) =>
      scala.util.Try(
        spark.read.schema(BloomConfSchema).parquet(s"$live/$name").take(1).headOption
      ) match {
        case scala.util.Success(row) => row.map(r => v -> (
          // stamps written before the design point rode along read as the
          // class default (ONE source of truth for the 1%)
          if (r.isNullAt(3)) DedupOps.BloomSizing(r.getInt(0), r.getInt(1), r.getInt(2))
          else DedupOps.BloomSizing(r.getInt(0), r.getInt(1), r.getInt(2), r.getDouble(3))))
        case scala.util.Failure(_) => corrupt ::= name; None
      }
    }.nextOption()
    if (resolved.isEmpty && corrupt.nonEmpty)
      throw new IllegalStateException(
        s"no readable Bloom stamp at $live, but corrupt stamp dir(s) " +
          s"${corrupt.reverse.mkString(", ")} exist — refusing to assume " +
          "Default geometry (partials of another geometry cannot be " +
          "screened safely); repair or remove the corrupt stamp")
    // corrupt dirs encountered before the resolved one OUTRANK it (the
    // iteration is version-descending): record each skip, once
    corrupt.reverse.foreach { name =>
      if (corruptWarned.add((live, name)))
        System.err.println(s"[DedupStream] corrupt Bloom stamp dir $name at " +
          s"$live outranks the resolved version ${resolved.map(_._1).get} — " +
          "serving the older stamp; repair or remove the corrupt dir (a " +
          "retarget it recorded is NOT in effect)")
    }
    resolved
  }

  /** Corrupt-stamp skips already warned this process — bounded by the
    * set of (live root, corrupt dir) pairs a process actually sees. */
  private val corruptWarned =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(String, String)]()

  private def readConfUnder(spark: SparkSession,
      live: String): Option[DedupOps.BloomSizing] =
    readConfVersioned(spark, live).map(_._2)

  /** Write stamp version `v` — the ONE writer both the first-admission
    * stamp and retargeting use (one place owns the schema). */
  private def writeStamp(spark: SparkSession, live: String, v: Long,
      s0: DedupOps.BloomSizing): Unit =
    writeStampTo(spark,
      s"$live/${if (v == 0) "bloomconf" else s"bloomconf-$v"}", s0)

  private def writeStampTo(spark: SparkSession, dir: String,
      s0: DedupOps.BloomSizing): Unit = {
    import spark.implicits._
    Seq((s0.bits, s0.hashes, s0.shards, s0.designFpr))
      .toDF("bits", "hashes", "shards", "target_fpr")
      .coalesce(1).write.mode("overwrite").parquet(dir)
  }

  /** First-admission stamping under a CREATE-IF-ABSENT protocol: the
    * stamp parquet is written to a dot-prefixed temp dir (invisible to
    * Spark's listing and to [[confDirsUnder]]) and renamed to `bloomconf`
    * only while absent; whoever loses the race cleans up its temp and
    * RE-RESOLVES — geometry equality with the winning stamp is required
    * before this returns, so two concurrent first admissions (e.g. two
    * lineages on a fresh index) can never each proceed under their own
    * geometry and write partials that silently OR-corrupt on fold. A
    * local-FS rename that moved the temp INSIDE a just-created target is
    * likewise invisible (dot prefix) and deleted. The resolved stamp —
    * not the argument — is what the caller admits under.
    *
    * OBJECT-STORE caveat: the create-if-absent is `exists` + `rename` —
    * not atomic. On HDFS/local FS rename-to-existing-dir either fails or
    * nests (both handled above), so the window is benign; on an object
    * store WITHOUT atomic exclusive rename (S3A), two same-instant first
    * admitters can interleave mid-copy and leave a TORN stamp. The
    * post-rename re-resolve + sameGeometry gate makes that fail LOUDLY
    * (unreadable or mismatched stamp → exception, never partials under
    * two geometries) — but recovery is manual. Deployments on such
    * stores should route the first admission through a coordinator that
    * has conditional-put (write the stamp, then conditional-create an
    * empty `_STAMPED` marker; the marker's winner is the stamp), or
    * simply serialize index CREATION — the steady state (stamp exists)
    * never writes here. */
  private def stampFirstAdmission(spark: SparkSession, live: String,
      s0: DedupOps.BloomSizing): DedupOps.BloomSizing = {
    val fs = IndexSides.fsOf(spark, live)
    // a READABLE stamp that appeared since the caller's resolution wins
    // outright (the other first-admitter finished) — verify, never write
    readConfVersioned(spark, live).foreach { case (_, cfg) =>
      require(cfg.sameGeometry(s0),
        s"concurrent first admission stamped Bloom geometry $cfg at " +
          s"$live; cannot admit with $s0")
      return cfg
    }
    // stamp the next version ABOVE any existing dir (all unreadable here —
    // a crashed or corrupt stamp is outranked, never rewritten in place)
    val next = confDirsUnder(fs, live).headOption.map(_._1 + 1L).getOrElse(0L)
    val targetName = if (next == 0L) "bloomconf" else s"bloomconf-$next"
    val target = new Path(s"$live/$targetName")
    val tmpName = s".bloomconf-tmp-${java.util.UUID.randomUUID}"
    val tmp = new Path(s"$live/$tmpName")
    writeStampTo(spark, tmp.toString, s0)
    // rename-if-absent, with one last readable-stamp check to shrink the
    // window where a just-completed rival could be outranked; the loser's
    // temp (or a local-FS rename that moved it INSIDE a just-created
    // target) is dot-prefixed — invisible to Spark listing and to
    // [[confDirsUnder]] — and deleted
    if (!fs.exists(target) && readConfVersioned(spark, live).isEmpty)
      fs.rename(tmp, target)
    if (fs.exists(tmp)) fs.delete(tmp, true)
    val nested = new Path(target, tmpName)
    if (fs.exists(nested)) fs.delete(nested, true)
    val resolved = readConfVersioned(spark, live).map(_._2).getOrElse(
      throw new IllegalStateException(
        s"Bloom stamp at $live unreadable immediately after stamping"))
    require(resolved.sameGeometry(s0),
      s"concurrent first admission stamped Bloom geometry $resolved at " +
        s"$live; cannot admit with $s0")
    resolved
  }

  /** [[admitBatch]]'s geometry resolution, run BEFORE any side write: an
    * established stamp wins and is never rewritten on the admission path
    * (a conf overwrite would open a crash/concurrency window where readers
    * see no stamp and misread the geometry); the index's first admission
    * stamps the caller's sizing; a geometry clash fails with the index
    * untouched. */
  private def resolveBloomSizing(spark: SparkSession, indexDir: String,
      root: String, bloomSizing: DedupOps.BloomSizing): DedupOps.BloomSizing = {
    val default = DedupOps.BloomSizing.Default
    val hasPartials =
      IndexSides.fsOf(spark, root).exists(new Path(s"$root/bloom"))
    readConfVersioned(spark, root) match {
      case Some((v, cfg)) if hasPartials =>
        // compatibility is GEOMETRY: equal-geometry partials OR regardless
        // of design point. The exact Default value means "inherit"; a
        // differing designFpr also inherits — LOUDLY, since a config
        // change that silently does nothing is how retargets get lost
        // ([[retargetBloomFpr]] is the explicit path).
        require(bloomSizing == default || bloomSizing.sameGeometry(cfg),
          s"index at $indexDir has Bloom geometry $cfg; cannot admit with $bloomSizing")
        if (bloomSizing != default && bloomSizing.designFpr != cfg.designFpr)
          System.err.println(s"[DedupStream] admission designFpr " +
            s"${bloomSizing.designFpr} differs from the stamped " +
            s"${cfg.designFpr} — inheriting the stamp; use " +
            "retargetBloomFpr to change it")
        cfg
      case Some((v, cfg)) =>
        // a stamp with NO partials (a first admission that stamped and
        // then died before any side write): geometry compatibility is
        // vacuous, so a corrected config may re-stamp rather than being
        // pinned forever to a mis-sized first attempt
        if (bloomSizing == default || bloomSizing == cfg) cfg
        else { writeStamp(spark, root, v + 1, bloomSizing); bloomSizing }
      case None =>
        // legacy partials (pre-stamp index) were built at Default GEOMETRY
        // — different geometry must fail HERE, on batch 0, not one batch
        // later against the freshly written stamp
        require(!hasPartials || bloomSizing.sameGeometry(default),
          s"index at $indexDir predates geometry stamping (Default " +
            s"partials); cannot admit with $bloomSizing")
        stampFirstAdmission(spark, root, bloomSizing)
    }
  }

  private def lensName(lens: ImageLens): String = lens match {
    case AHashLens => "ahash"
    case DHashLens => "dhash"
    case BothLens => "both"
  }

  /** The always-on side SET's version, stamped into `mediaconf` beside
    * the lens/rung pair (r19 advice): "a side is always-on" is only true
    * for batches admitted at or after the code that writes it — an index
    * whose earlier batches predate a side has no rows there for that
    * part of the corpus, and `readSide` cannot distinguish "side not
    * maintained" from "side missing earlier batches", so a screen over
    * it silently loses recall forever. Version 1 = the first round-20
    * set (through audiorwins/framestride/framestridek/imagetiles);
    * version 2 adds imagetilesk (the crop∘dihedral canonical tile
    * side); a stamp WITHOUT the column reads 0 — an index admitted
    * under an older side set. Admission to (and shift/tile-rung
    * screening of) an older-set index FAILS FAST and routes through a
    * backfill (re-admit into a fresh index) instead of under-screening
    * silently. Grow the side set again → bump this. */
  val MediaSidesVersion: Long = 2L

  /** Resolve (and on the index's FIRST admission, stamp) the media PRINT
    * CONFIG — which image lens side(s) the index maintains and whether
    * the dihedral rung's sides (imagekhashes + videokhashes) exist.
    * The bloom-geometry discipline applied to the lens/rung pair: the
    * sides a config gates are ALL-OR-NOTHING per index, because a
    * mid-stream toggle leaves a side partially populated and `readSide`
    * cannot distinguish "side not maintained" from "side missing earlier
    * batches" — every later screen against it silently loses recall
    * (e.g. a DHashLens-era batch is invisible to every later AHashLens
    * screen). So the config is persisted at the index root on the first
    * admission and a mismatch FAILS FAST with the index untouched; to
    * change a live index's config, create a new index (or backfill the
    * missing side dirs explicitly, then stamp by hand). A pre-stamp
    * (round-17 or older) index adopts the next admission's config as its
    * stamp — the bloom legacy rule. Single-writer-per-index discipline
    * makes the create-if-absent rename sufficient; a torn stamp on an
    * object store fails loudly on read-back, never admits under two
    * configs. */
  /** One stamp read shared by the admission and advisory paths: (lens,
    * rung, side-set version). A stamp written before side-set
    * versioning (r17–r19) lacks the column and reads version 0 — an
    * index whose earlier batches predate the newest always-on sides. */
  private def readMediaConf(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem,
      dir: Path): Option[(String, Boolean, Long)] =
    if (!fs.exists(dir)) None
    else Some(scala.util.Try {
      val df = spark.read.parquet(dir.toString)
      val r = df.select("image_lens", "dihedral_rung").head()
      val v =
        if (df.columns.contains("sides_version"))
          df.select("sides_version").head().getLong(0)
        else 0L
      (r.getString(0), r.getBoolean(1), v)
    }.getOrElse(throw new IllegalStateException(
      s"unreadable media-config stamp at $dir — repair or remove it " +
        "(the sides it described are still intact)")))

  private def resolveMediaConf(spark: SparkSession, indexDir: String,
      root: String, lens: ImageLens, dihedralRung: Boolean): Unit = {
    val fs = IndexSides.fsOf(spark, root)
    val dir = new Path(s"$root/mediaconf")
    def check(l: String, r: Boolean, v: Long): Unit = {
      require(l == lensName(lens) && r == dihedralRung,
        s"index at $indexDir maintains media print sides under " +
          s"imageLens=$l, dihedralRung=$r; cannot admit with " +
          s"imageLens=${lensName(lens)}, dihedralRung=$dihedralRung — a " +
          "mid-stream lens/rung change would leave print sides partially " +
          "populated and silently lose screen recall; use a new index")
      // the side-SET version gate (r19 advice): this build writes sides
      // the stamped set lacks for every earlier batch — admitting would
      // leave the new sides partially populated, the exact silent-recall
      // failure the lens/rung stamp exists to prevent
      require(v == MediaSidesVersion,
        s"index at $indexDir was admitted under always-on side-set " +
          s"version $v; this build maintains version $MediaSidesVersion " +
          "— its earlier batches lack the newer sides, so further " +
          "admissions would leave them partially populated and every " +
          "screen over them would silently lose recall; re-admit the " +
          "corpus into a fresh index (backfill), or backfill the missing " +
          "side dirs explicitly and re-stamp by hand")
    }
    readMediaConf(spark, fs, dir) match {
      case Some((l, r, v)) => check(l, r, v)
      case None =>
        import spark.implicits._
        val tmp = new Path(
          s"$root/.mediaconf-tmp-${java.util.UUID.randomUUID}")
        Seq((lensName(lens), dihedralRung, MediaSidesVersion))
          .toDF("image_lens", "dihedral_rung", "sides_version")
          .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        if (!fs.exists(dir)) fs.rename(tmp, dir)
        if (fs.exists(tmp)) fs.delete(tmp, true)
        val nested = new Path(dir, tmp.getName)
        if (fs.exists(nested)) fs.delete(nested, true)
        val (l, r, v) = readMediaConf(spark, fs, dir).getOrElse(
          throw new IllegalStateException(
            s"media-config stamp at $dir unreadable immediately after stamping"))
        check(l, r, v)
    }
  }

  /** READ-ONLY form of [[resolveMediaConf]] for advisory/serving callers
    * ([[CurationStream.verdicts]]): verify the caller's lens/rung against
    * the stamp WITHOUT ever writing one — an advisory call with a
    * mismatched config would silently screen against sides the index
    * never maintained (empty reads, lost recall), the exact failure the
    * stamp exists to surface. A pre-stamp (legacy) index checks nothing:
    * absence means "never admitted under a stamped config", not a
    * mismatch. */
  private[streaming] def checkMediaConf(spark: SparkSession,
      indexDir: String, lens: ImageLens, dihedralRung: Boolean,
      needsShiftSides: Boolean = false): Unit = {
    val root = liveRoot(spark, indexDir)
    val dir = new Path(s"$root/mediaconf")
    readMediaConf(spark, IndexSides.fsOf(spark, root), dir).foreach {
      case (l, r, v) =>
        require((l, r) == ((lensName(lens), dihedralRung)),
          s"index at $indexDir maintains media print sides under " +
            s"imageLens=$l, dihedralRung=$r; screening with " +
            s"imageLens=${lensName(lens)}, dihedralRung=$dihedralRung would " +
            "read sides the index never maintained (silent recall loss)")
        // the shift/tile rungs' sides are always-on, but only for batches
        // admitted at or after the side existed (r19 advice): a rung
        // screen against an older-side-set index reads empty for the
        // pre-upgrade corpus and silently under-screens forever — fail
        // fast and route through a backfill instead
        if (needsShiftSides) require(v == MediaSidesVersion,
          s"index at $indexDir was admitted under always-on side-set " +
            s"version $v; the shift/tile rungs need version " +
            s"$MediaSidesVersion sides (audiowins/audiorwins/framestride/" +
            "framestridek/imagetiles/imagetilesk) for EVERY admitted " +
            "batch — re-admit the corpus into a fresh index (backfill) " +
            "before enabling these rungs, or run with them off")
    }
  }

  /** Retarget the drift-warning threshold of an EXISTING, stamped index —
    * an explicit maintenance call under the single-writer discipline (run
    * between microbatches, like compact). The new threshold is written as
    * a NEW stamp VERSION (never an in-place overwrite, so readers always
    * resolve a complete stamp and a crash mid-write is skipped by
    * resolution); superseded versions older than the previous one are
    * reclaimed, mirroring the generation-tree retention window. Geometry
    * is unchanged by construction; bytes written = one stamp row, never
    * index data. */
  def retargetBloomFpr(spark: SparkSession, indexDir: String,
      designFpr: Double): DedupOps.BloomSizing = {
    val live = liveRoot(spark, indexDir)
    val (v, cfg) = readConfVersioned(spark, live).getOrElse(
      throw new IllegalArgumentException(
        s"no readable Bloom stamp at $indexDir — retarget needs a stamped " +
          "index (admit once to stamp; a legacy index stamps Default on " +
          "its next admission)"))
    val next = cfg.copy(designFpr = designFpr)
    if (next == cfg) return cfg
    writeStamp(spark, live, v + 1, next)
    // retention: keep the new and previous versions (a reader that listed
    // before this write finishes on the intact previous stamp); reclaim
    // older ones best-effort
    val fs = IndexSides.fsOf(spark, live)
    confDirsUnder(fs, live).filter(_._1 < v)
      .foreach { case (_, name) => fs.delete(new Path(s"$live/$name"), true) }
    next
  }

  /** Seed width of the maintained positional index (d9's default k): span
    * screening against the index must probe at the width it was built. */
  val SeedK: Int = 5

  /** Window width of the maintained winnow-sketch side (t21's default w):
    * sketch screening must winnow its increment at the width the side was
    * built. With [[SeedK]] = 5 the k + w − 1 forced-sharing bound is 8
    * words — exactly the span rung's default minSpan, which is what makes
    * the sketch side a drop-in ladder option for pair-level detection. */
  val WinnowW: Int = 4

  /** Side reads go through [[IndexSides.readSide]] (shared with the
    * embedding-tier [[VectorStream]]): Hadoop-FS probe, `.old`
    * crash-fallback, `batch=` surfaced for replay self-exclusion. */
  private def readSide(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    IndexSides.readSide(spark, dir, schema)

  /** The live index tree: the highest-generation `tree-<g>` dir a
    * [[compact]] published (always complete — publication is atomic),
    * falling back to `indexDir` itself for the flat pre-compaction
    * layout [[admitBatch]] starts in. Public so tests and operational
    * tooling can address the live sides directly; the `groups/`
    * BucketStore stays at `indexDir` (it has its own manifest-flip
    * retention). */
  def liveRoot(spark: SparkSession, indexDir: String): String =
    IndexSides.liveRoot(spark, indexDir)

  /** A maintained side with one `batch=<tag>` dir EXCLUDED (partition
    * pruning skips it): the dual-tier [[CurationStream]] computes its
    * pre-commit verdict over these, so a REPLAY whose previous attempt
    * already committed this tier reads exactly the corpus the original
    * attempt saw — the same self-exclusion [[admitBatch]]'s prior probe
    * uses, surfaced for the cross-tier composition. Compaction carries
    * each lineage's latest (only replayable) batch dir un-folded, so the
    * exclusion stays addressable across an intervening compact. */
  private[streaming] def sideExcluding(spark: SparkSession, indexDir: String,
      side: String, tag: String): DataFrame = {
    val schema = side match {
      case "shingles" => ShingleSchema
      case "bands" => BandSchema
      case "seeds" => SeedSchema
      case "seedstats" => StatsSchema
      case "imagehashes" => ImgHashSchema
      case "imagedhashes" => ImgHashSchema
      case "imagekhashes" => ImgHashSchema
      case "videokhashes" => ImgHashSchema
      case "framekhashes" => FrameHashSchema
      case "winnowfps" => WinnowSchema
      case "audiohashes" => AudioHashSchema
      case "audiofps" => AudioFpSchema
      case "audiowins" => AudioWinSchema
      case "audiorwins" => AudioRWinSchema
      // the stride sides share the windowed-print schema by design (the
      // one-serving-path-per-schema rule on the frame axis)
      case "framestride" => AudioWinSchema
      case "framestridek" => AudioWinSchema
      case "imagetiles" => TileSchema
      // the canonical tile side shares the plain tile schema by design
      // (the 'lt' family is stored fam-less — the one-serving-shape
      // rule on the spatial axes)
      case "imagetilesk" => TileSchema
      case "videohashes" => ImgHashSchema
      case "framehashes" => FrameHashSchema
      case other => throw new IllegalArgumentException(s"no such side: $other")
    }
    readSide(spark, s"${liveRoot(spark, indexDir)}/$side", schema)
      .filter(col("batch") =!= tag).drop("batch")
  }

  def corpusShingles(spark: SparkSession, indexDir: String): DataFrame =
    readSide(spark, s"${liveRoot(spark, indexDir)}/shingles", ShingleSchema)
      .drop("batch")

  def corpusBands(spark: SparkSession, indexDir: String): DataFrame =
    readSide(spark, s"${liveRoot(spark, indexDir)}/bands", BandSchema)
      .drop("batch")

  /** The maintained positional seed index (d9's [[
    * graft.llm.DedupOps.positionalSeeds]] schema) over every ADMITTED doc
    * — appended per batch like the other two sides; kh-bucketed at
    * deployment so span screening shuffles only the increment. */
  def corpusSeeds(spark: SparkSession, indexDir: String): DataFrame =
    readSide(spark, s"${liveRoot(spark, indexDir)}/seeds", SeedSchema)
      .drop("batch")

  /** The maintained (kh, df) seed-stats side ([[
    * graft.llm.DedupOps.seedStats]] schema): PARTIAL per-batch counts —
    * one file per admission, folded to one row per kh by [[compact]] —
    * whose per-kh SUM is the seed table's df. Span screening joins its
    * increment's kh set against this table instead of re-aggregating the
    * corpus seeds, which is what keeps [[screenSpans]] O(increment). */
  def corpusSeedStats(spark: SparkSession, indexDir: String): DataFrame =
    readSide(spark, s"${liveRoot(spark, indexDir)}/seedstats", StatsSchema)
      .drop("batch")

  /** The maintained (word, n) word-count side over every ADMITTED doc —
    * per-batch sum-mergeable partials like [[corpusSeedStats]], folded by
    * [[compact]]. This is t13's corpus state as ingest-side serving
    * state: vocabulary induction and OOV screening read these counts
    * instead of re-TOKENIZING the corpus (the expensive pass — the count
    * table is Heaps'-law sized, orders of magnitude under the corpus). */
  def corpusWordCounts(spark: SparkSession, indexDir: String): DataFrame =
    readSide(spark, s"${liveRoot(spark, indexDir)}/wordcounts", WordSchema)
      .drop("batch")

  /** The maintained (prev, word, n) BIGRAM-count side over every ADMITTED
    * doc — the conditional model beside [[corpusWordCounts]]' unigram
    * one, same per-batch sum-mergeable partials folded by [[compact]].
    * Bigram tables grow faster than Heaps' law (≲ corpus tokens in the
    * worst case) but stay orders of magnitude under corpus TEXT; at
    * deployment scale the side is (prev, word)-bucketed so the screening
    * join shuffles only the increment. A pre-seventh-side index simply
    * has no dirs here and reads empty (every bigram screens as unseen —
    * the smoothed ceiling — rather than erroring). */
  def corpusBigramCounts(spark: SparkSession, indexDir: String): DataFrame =
    readSide(spark, s"${liveRoot(spark, indexDir)}/bigramcounts", BigramSchema)
      .drop("batch")

  /** The maintained WINNOW-SKETCH side over every ADMITTED doc (t21's
    * (doc_id, fp) rows at the index's [[SeedK]]/[[WinnowW]] widths,
    * appended per batch off the SAME positional-hash evaluation the seed
    * side makes, identity fold) — ~1/w the seed side's row count: the
    * index a deployment serves pair-level duplicate DETECTION from when
    * it doesn't need span coordinates. */
  def corpusWinnowFps(spark: SparkSession, indexDir: String): DataFrame =
    readSide(spark, s"${liveRoot(spark, indexDir)}/winnowfps", WinnowSchema)
      .drop("batch")

  /** T21d over the maintained side: winnow-sketch pair screening of an
    * increment against the ADMITTED corpus's fingerprint table — the
    * m4d serving discipline on the text tier's sketch side (combined-
    * population df rail, corpus member as id_a, id-level self-exclusion
    * for replay). The LADDER OPTION this side exists for: a deployment
    * wanting pair-level verbatim-overlap detection (≥ [[SeedK]] +
    * [[WinnowW]] − 1 = 8 words forced) without span COORDINATES swaps
    * the span rung's [[screenSpans]] for this at ~1/w the index size;
    * pipelines needing the coordinates (d9c's scrub remediation) keep
    * the seed side — the two are maintained off one hash evaluation, so
    * carrying both costs one extra narrow projection per admission. */
  def screenWinnow(spark: SparkSession, indexDir: String,
      newDocs: DataFrame, minShared: Int = 2, maxDf: Int = 100): DataFrame =
    DedupOps.winnowScreen(corpusWinnowFps(spark, indexDir), newDocs,
      k = SeedK, w = WinnowW, minShared = minShared, maxDf = maxDf)

  /** The maintained image-FINGERPRINT side over every ADMITTED doc's
    * decodable media (m4's aHash rows, appended per batch, identity
    * fold) — 16 bytes per image, so screening a media increment is pure
    * bit work; pixels decoded exactly once, at admission. */
  def corpusImageHashes(spark: SparkSession, indexDir: String): DataFrame =
    readSide(spark, s"${liveRoot(spark, indexDir)}/imagehashes", ImgHashSchema)
      .drop("batch")

  /** The maintained image DHASH-print side over every ADMITTED doc's
    * decodable media — the GRADIENT lens beside [[corpusImageHashes]]'
    * mean-threshold one, written only under `imageLens = DHashLens |
    * BothLens` (the OPTIONAL fourteenth side: an AHash-configured index
    * simply has no dirs here and reads empty). Same 16-byte print
    * schema, so the whole banded serving machinery runs unchanged. */
  def corpusImageDHashes(spark: SparkSession, indexDir: String): DataFrame =
    readSide(spark, s"${liveRoot(spark, indexDir)}/imagedhashes", ImgHashSchema)
      .drop("batch")

  /** The maintained DIHEDRAL-CANONICAL print side over every ADMITTED
    * doc's decodable media (m4k's orientation-invariant prints,
    * imagehashes schema, identity fold) — written only under
    * `dihedralRung = true`, a config ORTHOGONAL to [[ImageLens]]
    * (production lens families COMPOSE: the canonical print rides the
    * same decode as the other lenses and adds its own 16 bytes). The
    * side behind the mirror-flip-recycler catch. */
  def corpusImageKHashes(spark: SparkSession, indexDir: String): DataFrame =
    readSide(spark, s"${liveRoot(spark, indexDir)}/imagekhashes", ImgHashSchema)
      .drop("batch")

  /** The maintained TILE sub-print side over every ADMITTED doc's
    * decodable media ([[graft.llm.MultimodalOps.tilePrintsOf]]' rows,
    * identity fold) — the twenty-second side, the spatial-crop tier's
    * serving state: a re-upload CROPPED by whole tiles moves every
    * sample of all three full-frame lenses (a crop is not a dihedral
    * transform, so even the canonical print misses), while its tile
    * prints are the corpus's shifted by exactly the cropped tile count.
    * ≤ (w/16)·(h/16) rows of 16-byte prints per image, capped at
    * [[graft.llm.MultimodalOps.MaxTilesPerImage]]; rides the SAME
    * per-admission image decode as the lens sides ([[
    * graft.llm.MultimodalOps.lensTileFrame]] — one decode, every
    * family). */
  def corpusImageTiles(spark: SparkSession, indexDir: String): DataFrame =
    readSide(spark, s"${liveRoot(spark, indexDir)}/imagetiles", TileSchema)
      .drop("batch")

  /** The CROP∘DIHEDRAL canonical tile side (m4t's serving state): the
    * 'lt' anchor family's dihedral-canonical tile prints, fam-less —
    * the SAME row count and schema as imagetiles (the stored side never
    * pays the 4-family fan; [[graft.llm.MultimodalOps.tileKPrintsOf]]'s
    * algebra puts the other three families on the increment side).
    * Rides the same per-admission image decode as every other image
    * side. */
  def corpusImageTileKs(spark: SparkSession, indexDir: String): DataFrame =
    readSide(spark, s"${liveRoot(spark, indexDir)}/imagetilesk", TileSchema)
      .drop("batch")

  /** M4s/m4t over the maintained side: CROP∘DIHEDRAL-robust image
    * near-dups between a media increment's 4-family canonical tile
    * prints and the admitted corpus's imagetilesk side — the
    * crop-and-mirrored re-upload caught at its true (dx, dy) with its
    * transform witness at admission time. */
  def screenImageTileKDups(spark: SparkSession, indexDir: String,
      newMedia: DataFrame, maxHamming: Int = 3, maxBucket: Int = 100,
      maxOffset: Int = 1, minMatched: Int = 2): DataFrame =
    graft.llm.MultimodalOps.imageTileKNearDupsServed(
      corpusImageTileKs(spark, indexDir),
      graft.llm.MultimodalOps.tileKPrintFrame(newMedia),
      newMedia.select("doc_id"), maxHamming, maxBucket, maxOffset,
      minMatched)

  /** M4p/m4q over the maintained side: SPATIAL-CROP-robust image
    * near-dups between a media increment's tile prints and the admitted
    * corpus's imagetiles side — the cropped re-upload caught at its
    * true (dx, dy) at admission time. */
  def screenImageTileDups(spark: SparkSession, indexDir: String,
      newMedia: DataFrame, maxHamming: Int = 3, maxBucket: Int = 100,
      maxOffset: Int = 1, minMatched: Int = 2): DataFrame =
    graft.llm.MultimodalOps.imageTileNearDupsServed(
      corpusImageTiles(spark, indexDir),
      graft.llm.MultimodalOps.tilePrintFrame(newMedia),
      newMedia.select("doc_id"), maxHamming, maxBucket, maxOffset,
      minMatched)

  /** The image rung's LENS choice — the spanRung discipline on the image
    * modality: `AHashLens` screens the mean-threshold prints against the
    * imagehashes side (the default, the original single-lens rung);
    * `DHashLens` screens the gradient prints against the imagedhashes
    * side (robust to within-row order-preserving luma transforms —
    * vignettes, scanner shading — where the global mean moves);
    * `BothLens` maintains BOTH sides off ONE decode
    * ([[graft.llm.MultimodalOps.lensFingerprintFrame]]) and screens on
    * the CANDIDATE UNION (m4g's recall win: a pair within the gate under
    * EITHER lens rejects) at one extra 16-byte print per image. */
  sealed trait ImageLens
  case object AHashLens extends ImageLens
  case object DHashLens extends ImageLens
  case object BothLens extends ImageLens

  /** The lens rung's screen for callers that already hold the
    * increment's prints — ONE dispatch shared by [[CurationStream]]'s
    * advisory and committed paths (each passes its own corpus-side
    * frames: own-batch-excluded on the committed path) and by the
    * m4h/m4i registry rows (session-cache and maintained-side corpus
    * splits). All frame
    * arguments are by-name so the un-chosen lens's side is never probed
    * and its prints never computed. Under `BothLens` the two screens'
    * verified pairs union on (id_a, id_b) — each pair already verified
    * within its own lens space, the m4g semantics served.
    *
    * Output is (id_a, id_b) under EVERY lens — the served screen is a
    * pair REJECTER, and a config-dependent column set would break any
    * distance-reading caller silently the day the lens changes (callers
    * that want distances run the batch operators, which carry per-lens
    * ham_ahash/ham_dhash).
    *
    * DESIGNED divergence from the batch union (m4g,
    * [[graft.llm.MultimodalOps.imageLensUnionNearDups]]): m4g verifies
    * the DEDUPED candidate union under an OR of both exact distances, so
    * an aHash band candidate that is only dHash-near still surfaces;
    * this served form verifies each leg WITHIN ITS OWN lens space before
    * unioning, so that same pair surfaces only if its dHash bucket also
    * survives the rail. Each form matches its own oracle (the m4h/m4i
    * oracle verifies per-leg; m4g's verifies the union) — under rail
    * pressure the batch row can carry a pair its served twin misses, the
    * honest price of never paying a cross-lens verify join on the
    * admission path. */
  def imageScreenOfHashes(lens: ImageLens,
      aSide: => DataFrame, dSide: => DataFrame,
      incrA: => DataFrame, incrD: => DataFrame, incrIds: DataFrame,
      maxHamming: Int = 3, maxBucket: Int = 100): DataFrame = lens match {
    case AHashLens =>
      graft.llm.MultimodalOps.imageNearDupsServedHashes(
        aSide, incrA, incrIds, maxHamming, maxBucket)
        .select("id_a", "id_b")
    case DHashLens =>
      graft.llm.MultimodalOps.imageNearDupsServedHashes(
        dSide, incrD, incrIds, maxHamming, maxBucket)
        .select("id_a", "id_b")
    case BothLens =>
      graft.llm.MultimodalOps.imageNearDupsServedHashes(
          aSide, incrA, incrIds, maxHamming, maxBucket)
        .select("id_a", "id_b")
        .unionByName(graft.llm.MultimodalOps.imageNearDupsServedHashes(
            dSide, incrD, incrIds, maxHamming, maxBucket)
          .select("id_a", "id_b"))
        .distinct()
  }

  /** The maintained AUDIO-fingerprint side over every ADMITTED doc's
    * audio rendition (m5's meta rows — header fields + the decoded-PCM
    * content hash — appended per batch, identity fold): one long per
    * clip, so exact-audio screening is an equality join over hash
    * tables; samples decoded exactly once, at admission. */
  def corpusAudioHashes(spark: SparkSession, indexDir: String): DataFrame =
    readSide(spark, s"${liveRoot(spark, indexDir)}/audiohashes", AudioHashSchema)
      .drop("batch")

  /** M5c over the maintained side: EXACT-duplicate audio between a media
    * increment and the admitted corpus's hash table — the audio rung of
    * the admission ladder (d1's content-identity tier on the third
    * modality), corpus samples never touched. Corpus member rides as
    * id_a; the increment's own ids self-exclude for replay. */
  def screenAudioDups(spark: SparkSession, indexDir: String,
      newDocs: DataFrame): DataFrame =
    graft.llm.MultimodalOps.audioExactDupsServed(
      corpusAudioHashes(spark, indexDir), newDocs)

  /** The maintained ACOUSTIC-fingerprint side over every ADMITTED doc's
    * audio rendition (m5d's sign-of-energy-delta prints in the image
    * hash schema, appended per batch off the SAME decode as the
    * audiohashes side, identity fold): 16 bytes of print per clip, so
    * PERCEPTUAL audio screening is pure bit work — the eleventh side,
    * the audiohashes↔audiofps pair mirroring the seeds↔winnowfps one
    * (exact coordinates vs sketch detection, one decode feeding both). */
  def corpusAudioFps(spark: SparkSession, indexDir: String): DataFrame =
    readSide(spark, s"${liveRoot(spark, indexDir)}/audiofps", AudioFpSchema)
      .drop("batch")

  /** The maintained WINDOWED-sub-print side over every ADMITTED doc's
    * audio rendition (m5h's fixed-128-sample window prints, appended per
    * batch off the SAME combined decode as the audiohashes/audiofps
    * sides, identity fold): the seventeenth side, the shift tier's
    * serving state — a clip recycled behind leading silence or a whole-
    * window trim is caught at its true offset against clips admitted
    * unpadded, which the whole-clip audiofps contour gate structurally
    * misses. ≤ ~n_samples/128 rows of 16-byte prints per clip. */
  def corpusAudioWins(spark: SparkSession, indexDir: String): DataFrame =
    readSide(spark, s"${liveRoot(spark, indexDir)}/audiowins", AudioWinSchema)
      .drop("batch")

  /** M5i/m5j over the maintained side: TIME-SHIFT-robust audio near-dups
    * between a media increment and the admitted corpus's window-print
    * table — the serving form of [[graft.llm.MultimodalOps
    * .audioShiftNearDups]] (combined-population rail per (ordinal, band,
    * key), increment-side ±offset fan-out, corpus as id_a, id-level
    * self-exclusion). Since round 19 the admission LADDER composes this
    * screen (plus the reversal-canonical one) into the `audio_shift_dup`
    * class under [[CurationStream]]'s `audioShiftRung` — offset-0 pairs
    * deliberately INCLUDED: a pair the exact or contour rung also sees
    * classes as the HIGHER rung by the verdict precedence (the
    * imagePairsOf rule), so no suppression logic is needed and the
    * screen stays complete for standalone callers. */
  def screenAudioShiftDups(spark: SparkSession, indexDir: String,
      newAudio: DataFrame, maxHamming: Int = 3, maxBucket: Int = 100,
      maxOffset: Int = 3, minMatched: Int = 2): DataFrame =
    graft.llm.MultimodalOps.audioShiftNearDupsServedWins(
      corpusAudioWins(spark, indexDir),
      graft.llm.MultimodalOps.audioWindowPrints(newAudio),
      newAudio.select("doc_id"), maxHamming, maxBucket, maxOffset,
      minMatched)

  /** The maintained dual-family REVERSAL-CANONICAL window-print side
    * over every ADMITTED doc's audio rendition
    * ([[graft.llm.MultimodalOps.revWindowPrintsOfSamples]]' rows,
    * appended per batch off the SAME combined decode as the other three
    * audio sides — the nested rwins column of one AudioFull row,
    * identity fold): the nineteenth side, the reversal∘shift tier's
    * serving state. ~2× the audiowins rows per clip, 16-byte prints,
    * both families capped at [[graft.llm.MultimodalOps.MaxWinsPerClip]]
    * windows. */
  def corpusAudioRWins(spark: SparkSession, indexDir: String): DataFrame =
    readSide(spark, s"${liveRoot(spark, indexDir)}/audiorwins", AudioRWinSchema)
      .drop("batch")

  /** M5n/m5o over the maintained side: REVERSAL∘SHIFT-robust audio
    * near-dups between a media increment and the admitted corpus's
    * canonical window-print table — the serving form of
    * [[graft.llm.MultimodalOps.audioRevShiftNearDups]]. The rung that
    * catches the clip recycled REVERSED, PADDED, or both: the
    * composition the plain shift tier (forward windows) and the
    * whole-clip canonical print (m5k) each structurally miss alone. */
  def screenAudioRevDups(spark: SparkSession, indexDir: String,
      newAudio: DataFrame, maxHamming: Int = 3, maxBucket: Int = 100,
      maxOffset: Int = 3, minMatched: Int = 2): DataFrame =
    graft.llm.MultimodalOps.audioRevNearDupsServedWins(
      corpusAudioRWins(spark, indexDir),
      graft.llm.MultimodalOps.audioRevWindowPrints(newAudio),
      newAudio.select("doc_id"), maxHamming, maxBucket, maxOffset,
      minMatched)

  /** The maintained video KEYFRAME-print side over every ADMITTED doc's
    * video rendition (m7b's frame-0 aHash rows in the imagehashes
    * schema, appended per batch off the media table the image side
    * shares, identity fold): 16 bytes per clip, so video identity
    * screening — thumbnail-print identity — is pure bit work; the
    * container parses once, at admission. */
  def corpusVideoHashes(spark: SparkSession, indexDir: String): DataFrame =
    readSide(spark, s"${liveRoot(spark, indexDir)}/videohashes", ImgHashSchema)
      .drop("batch")

  /** The maintained DIHEDRAL-CANONICAL keyframe-print side over every
    * ADMITTED doc's video rendition (m7e's orientation-invariant frame-0
    * prints, imagehashes schema, identity fold) — written only under
    * `dihedralRung = true`, the video analog of [[corpusImageKHashes]]:
    * a clip re-uploaded MIRRORED or rotated keeps its canonical keyframe
    * print, so the video_dup rung catches the recycler the plain
    * keyframe side misses by ~half its bits. Rides the same per-frame
    * decode as the videohashes/framehashes sides (the
    * [[graft.llm.MultimodalOps.sampleFrameLens]] seam) — the rung costs
    * bit arithmetic and 16 bytes per clip, never a second container
    * parse. */
  def corpusVideoKHashes(spark: SparkSession, indexDir: String): DataFrame =
    readSide(spark, s"${liveRoot(spark, indexDir)}/videokhashes", ImgHashSchema)
      .drop("batch")

  /** M7b/m7c over the maintained side: NEAR-duplicate videos between a
    * media increment and the admitted corpus's keyframe-print table —
    * the VIDEO rung of the admission ladder (the clip re-uploaded with
    * its opening shot intact), riding the same banded machinery as the
    * image and acoustic print families. */
  def screenVideoNearDups(spark: SparkSession, indexDir: String,
      newDocs: DataFrame, maxHamming: Int = 3,
      maxBucket: Int = 100): DataFrame =
    graft.llm.MultimodalOps.imageNearDupsServedHashes(
      corpusVideoHashes(spark, indexDir),
      graft.llm.MultimodalOps.videoKeyframeHashes(
        graft.llm.MultimodalOps.asMediaTable(newDocs)),
      newDocs.select("doc_id"), maxHamming, maxBucket)

  /** The maintained sampled-FRAME-print side over every ADMITTED doc's
    * video rendition (m3's per-ordinal aHash rows, appended per batch
    * off the SAME frame decode that derives the keyframe side, identity
    * fold): ≤ 4 prints per clip, so SHOT-LEVEL screening is pure bit
    * work — the side behind the video_near_dup rung. */
  def corpusFrameHashes(spark: SparkSession, indexDir: String): DataFrame =
    readSide(spark, s"${liveRoot(spark, indexDir)}/framehashes", FrameHashSchema)
      .drop("batch")

  /** The maintained DIHEDRAL-CANONICAL per-ordinal print side over every
    * ADMITTED doc's video rendition (m3d's orientation-invariant frame
    * prints, framehashes schema, identity fold) — written only under
    * `dihedralRung = true`, the shot-level analog of
    * [[corpusVideoKHashes]]: a re-edit that keeps later footage AND
    * flips it matches on the ordinals it kept, which the plain
    * framehashes screen misses by ~half its bits. Same dual-family
    * frame decode — the side costs bit arithmetic and ≤ 4 extra
    * 16-byte prints per clip. */
  def corpusFrameKHashes(spark: SparkSession, indexDir: String): DataFrame =
    readSide(spark, s"${liveRoot(spark, indexDir)}/framekhashes", FrameHashSchema)
      .drop("batch")

  /** The maintained fixed-STRIDE frame-print side over every ADMITTED
    * doc's video rendition ([[graft.llm.MultimodalOps.decodeVideoFull]]'s
    * strides projection, appended per batch off the SAME combined frame
    * decode as the keyframe/shot/canonical sides, identity fold): the
    * twentieth side, the video shift tier's serving state — a clip
    * re-edited behind PREPENDED intro frames shifts every proportionally
    * sampled ordinal (fno = i·nf/4 moves when nf grows), so both the
    * keyframe and shot rungs structurally miss it; the stride prints
    * shift by exactly the prepend count and match per ordinal under the
    * bounded offset fan. Shares the audiowins row schema by design. */
  def corpusFrameStrides(spark: SparkSession, indexDir: String): DataFrame =
    readSide(spark, s"${liveRoot(spark, indexDir)}/framestride", AudioWinSchema)
      .drop("batch")

  /** The maintained dihedral-CANONICAL stride-print side over every
    * ADMITTED doc's video rendition
    * ([[graft.llm.MultimodalOps.videoStrideKOf]]'s projection of the
    * same combined decode — the k-print was already computed per
    * memoized frame, so this side costs 16 bytes per stride row and
    * ZERO extra decode, identity fold): the twenty-first side, the
    * dihedral∘shift tier's serving state — a clip recycled MIRRORED (or
    * rotated) AND intro-prepended keeps every canonical stride print
    * shifted by exactly the intro count, the composed evasion every
    * other video rung structurally misses (plain strides differ by
    * ~half their bits under the mirror; the canonical keyframe/shot
    * prints live on proportionally-sampled frames that all shift).
    * Shares the framestride row schema, so the whole windowed serving
    * machinery runs unchanged. */
  def corpusFrameKStrides(spark: SparkSession, indexDir: String): DataFrame =
    readSide(spark, s"${liveRoot(spark, indexDir)}/framestridek", AudioWinSchema)
      .drop("batch")

  /** M3j/m3k over the maintained side: DIHEDRAL∘SHIFT-robust video
    * near-dups between a media increment's canonical stride prints and
    * the admitted corpus's framestridek side —
    * [[graft.llm.MultimodalOps.audioShiftNearDupsServedWins]] VERBATIM
    * (the one-serving-path-per-schema rule): the mirrored-and-prepended
    * re-edit is caught at its true offset at admission time. */
  def screenVideoKStrideDups(spark: SparkSession, indexDir: String,
      newMedia: DataFrame, maxHamming: Int = 3, maxBucket: Int = 100,
      maxOffset: Int = 3, minMatched: Int = 2): DataFrame =
    graft.llm.MultimodalOps.audioShiftNearDupsServedWins(
      corpusFrameKStrides(spark, indexDir),
      graft.llm.MultimodalOps.frameStrideKPrints(spark, newMedia),
      newMedia.select("doc_id"), maxHamming, maxBucket, maxOffset,
      minMatched)

  /** M3g/m3h over the maintained side: TIME-SHIFT-robust video near-dups
    * between a media increment's stride prints and the admitted corpus's
    * framestride side — [[graft.llm.MultimodalOps
    * .audioShiftNearDupsServedWins]] VERBATIM over frame-axis rows (the
    * one-serving-path-per-schema rule): combined-population rail per
    * (ordinal, band, key), increment-side ±offset fan-out only, corpus
    * as id_a, id-level self-exclusion. The prepended-intro re-edit is
    * caught at its true offset at admission time. */
  def screenVideoShiftDups(spark: SparkSession, indexDir: String,
      newMedia: DataFrame, maxHamming: Int = 3, maxBucket: Int = 100,
      maxOffset: Int = 3, minMatched: Int = 2): DataFrame =
    graft.llm.MultimodalOps.audioShiftNearDupsServedWins(
      corpusFrameStrides(spark, indexDir),
      graft.llm.MultimodalOps.frameStridePrints(spark, newMedia),
      newMedia.select("doc_id"), maxHamming, maxBucket, maxOffset,
      minMatched)

  /** M3c over the maintained side: SHOT-LEVEL video near-dups between a
    * media increment and the admitted corpus's frame-print table — the
    * rung that catches a RE-EDIT keeping later footage under a new
    * opening shot (keyframe identity, m7c's rung, structurally cannot
    * see it): same-ordinal banded candidates under the per-ordinal
    * combined-population rail. */
  def screenFrameNearDups(spark: SparkSession, indexDir: String,
      newDocs: DataFrame, maxHamming: Int = 3,
      maxBucket: Int = 100): DataFrame =
    graft.llm.MultimodalOps.frameNearDupsServedHashes(
      corpusFrameHashes(spark, indexDir),
      graft.llm.MultimodalOps.sampleFrames(spark,
        graft.llm.MultimodalOps.asMediaTable(newDocs)).toDF(),
      newDocs.select("doc_id"), maxHamming, maxBucket)

  /** M5d/m5e over the maintained side: NEAR-duplicate audio between a
    * media increment and the admitted corpus's acoustic-print table —
    * the PERCEPTUAL audio rung (a re-encoded or gain-shifted clip keeps
    * its energy contour, so it lands here even though its `pcm_hash`
    * differs and slips the exact rung). The prints share the image hash
    * schema by design, so the banded serving machinery — combined-
    * population rail, corpus-as-id_a orientation, id-level
    * self-exclusion — runs unchanged over audio. */
  def screenAudioNearDups(spark: SparkSession, indexDir: String,
      newDocs: DataFrame, maxHamming: Int = 3,
      maxBucket: Int = 100): DataFrame =
    graft.llm.MultimodalOps.imageNearDupsServedHashes(
      corpusAudioFps(spark, indexDir),
      graft.llm.MultimodalOps.audioFingerprintFrame(
        graft.llm.MultimodalOps.asAudioTable(newDocs)),
      newDocs.select("doc_id"), maxHamming, maxBucket)

  /** T19 over the maintained side: unigram-LM NLL of an increment under
    * the ADMITTED corpus's word distribution — the LM quality screen a
    * deployment runs per batch, O(increment tokens), corpus text never
    * touched (the wordcounts partials are the model). OOV words score
    * the Laplace ceiling and are counted beside the NLL. */
  def screenNll(spark: SparkSession, indexDir: String,
      newDocs: DataFrame): DataFrame =
    graft.llm.TextOps.unigramNllServed(newDocs, corpusWordCounts(spark, indexDir))

  /** T19d over the maintained sides: bigram-LM NLL of an increment under
    * the ADMITTED corpus's unigram + bigram models — the order-sensitive
    * LM screen ([[screenNll]] sees a bag of words; this sees their
    * sequence), O(increment tokens), corpus text never touched. */
  def screenBigramNll(spark: SparkSession, indexDir: String,
      newDocs: DataFrame): DataFrame =
    graft.llm.TextOps.bigramNllServed(newDocs,
      corpusWordCounts(spark, indexDir), corpusBigramCounts(spark, indexDir))

  /** M4d over the maintained side: near-duplicate IMAGES between a media
    * increment and the admitted corpus's fingerprint table — the image
    * modality's rung of the admission ladder, corpus pixels never
    * touched (the hashes are the state). Corpus member rides as id_a
    * whatever the numeric order. */
  def screenImageNearDups(spark: SparkSession, indexDir: String,
      newMedia: DataFrame, maxHamming: Int = 3,
      maxBucket: Int = 100): DataFrame =
    graft.llm.MultimodalOps.imageNearDupsServed(
      corpusImageHashes(spark, indexDir), newMedia, maxHamming, maxBucket)

  /** T13 over the maintained side: the admitted corpus's top-N
    * vocabulary as a served (word, rank) table — one sum over the
    * partial counts (vocabulary-sized, never corpus-sized) and a
    * TakeOrdered top-N, ranked exactly like
    * [[graft.llm.TextOps.vocabulary]] (n desc, then word). */
  def corpusVocabulary(spark: SparkSession, indexDir: String,
      topN: Int = 200): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val top = corpusWordCounts(spark, indexDir)
      .groupBy("word").agg(sum("n").as("n"))
      .orderBy(col("n").desc, col("word")).limit(topN)
    top.withColumn("rank",
        row_number().over(Window.orderBy(col("n").desc, col("word"))).cast("long"))
      .select("word", "rank")
      .orderBy("rank")
  }

  /** T15 over the maintained side: OOV-screen a probe set against the
    * ADMITTED corpus's vocabulary — corpus text is never re-read; only
    * the increment tokenizes. */
  def screenOov(spark: SparkSession, indexDir: String, newDocs: DataFrame,
      topN: Int = 200): DataFrame =
    graft.llm.TextOps.oovStats(newDocs, corpusVocabulary(spark, indexDir, topN))

  /** The maintained Bloom bitset over every ADMITTED doc's content
    * fingerprint (d10 as streaming state): the OR of the per-batch
    * partials — #dirs tiny binary rows, folded to one by [[compact]].
    * An index created before this side existed serves the EMPTY filter
    * (screen answers "definitely new" for everything), so [[screenExact]]
    * is advisory there until a backfill re-admits; sides written since
    * carry the full no-false-negative guarantee. */
  def corpusBloom(spark: SparkSession, indexDir: String): Array[Byte] = {
    val live = liveRoot(spark, indexDir)
    val sizing = bloomSizingUnder(spark, live)
    require(sizing.shards == 1,
      s"index at $indexDir is sharded (${sizing.shards}) — use corpusBloomShards")
    corpusBloomShardsAt(spark, live, sizing).head
  }

  /** The per-shard serving bitsets (array index = shard id; empty shards
    * serve empty filters). The shards == 1 case is [[corpusBloom]]. */
  def corpusBloomShards(spark: SparkSession, indexDir: String): Array[Array[Byte]] = {
    val live = liveRoot(spark, indexDir)
    corpusBloomShardsAt(spark, live, bloomSizingUnder(spark, live))
  }

  private def corpusBloomShardsAt(spark: SparkSession, live: String,
      sizing: DedupOps.BloomSizing): Array[Array[Byte]] = {
    val folded = DedupOps.bloomFoldSharded(
        readSide(spark, s"$live/bloom", BloomSchema).drop("batch"), sizing)
      .collect().map(r => r.getInt(0) -> r.getAs[Array[Byte]](1)).toMap
    Array.tabulate(sizing.shards)(s =>
      folded.getOrElse(s, new Array[Byte](sizing.bytes)))
  }

  /** D10 over the maintained side: flag increment docs whose exact
    * content fingerprint is possibly already admitted — the zero-join,
    * zero-shuffle first rung of the admission ladder (no false negatives
    * vs the admitted corpus, tunable-FPR false positives). Advisory: the
    * pair verdicts remain the authority; this screen's job is to let
    * "definitely new" docs skip the exact-dup tier cheaply. */
  def screenExact(spark: SparkSession, indexDir: String,
      newDocs: DataFrame): DataFrame = {
    // live root + stamp resolved ONCE; the shard dispatch serves either
    // geometry from the same fold
    val live = liveRoot(spark, indexDir)
    val (stampV, sizing) = readConfVersioned(spark, live)
      .getOrElse(-1L -> DedupOps.BloomSizing.Default)
    val shards = corpusBloomShardsAt(spark, live, sizing)
    // Design-point drift guard: the screen stays no-false-negative at any
    // fill, but an overfull filter answers maybe_dup for nearly everything
    // and stops paying for itself — surface that here, on the serving path
    // (per shard: one hot shard is actionable on its own). RATE-LIMITED to
    // once per (live root, shard, stamp version) per process: a
    // per-microbatch streaming loop must not emit the multi-line warning
    // for every shard on every batch forever; a retarget (new stamp
    // version) or a new generation tree re-arms it.
    shards.zipWithIndex.foreach { case (bits, s) =>
      DedupOps.bloomHealthWarning(bits, sizing).foreach { w =>
        if (driftWarned.add((live, s, stampV)))
          System.err.println(s"[DedupStream] shard $s: $w")
      }
    }
    if (sizing.shards == 1) DedupOps.bloomScreen(newDocs, shards.head, sizing)
    else DedupOps.bloomScreenSharded(newDocs, shards.toSeq, sizing)
  }

  /** Drift warnings already emitted this process — bounded by the set of
    * (index, shard, stamp-version) triples a process actually serves. */
  private val driftWarned =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(String, Int, Long)]()

  private val GroupSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("group_id", LongType)))

  /** The maintained (doc_id, group_id) assignment over every doc ever
    * ingested — admitted AND rejected (a rejected doc belongs to its
    * keeper's component; admission status lives in kept/, not here).
    * group_id is the component's min doc_id, exactly d6's election. */
  def corpusGroups(spark: SparkSession, indexDir: String): DataFrame = {
    val dir = s"$indexDir/groups"
    if (BucketStore.exists(dir)) BucketStore.read(spark, dir)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], GroupSchema)
  }

  private def lineageOf(checkpointDir: String): String =
    IndexSides.lineageOf(checkpointDir)

  /** One microbatch: verdict, admit, append. Public so batch backfills can
    * reuse the exact streaming admission logic (parity with the reference's
    * backfill-runs-the-livescan-path design). */
  def admitBatch(batch: DataFrame, batchId: Long, indexDir: String,
      outDir: String, threshold: Double, lineage: String = "batch",
      bloomSizing: DedupOps.BloomSizing = DedupOps.BloomSizing.Default,
      imageHashes: Option[DataFrame] = None,
      audioFull: Option[DataFrame] = None,
      videoHashes: Option[DataFrame] = None,
      frameHashes: Option[DataFrame] = None,
      imageLens: ImageLens = AHashLens,
      imageDHashes: Option[DataFrame] = None,
      dihedralRung: Boolean = false,
      imageKHashes: Option[DataFrame] = None,
      videoKHashes: Option[DataFrame] = None,
      frameKHashes: Option[DataFrame] = None,
      frameStrides: Option[DataFrame] = None,
      frameKStrides: Option[DataFrame] = None,
      imageTiles: Option[DataFrame] = None,
      imageKTiles: Option[DataFrame] = None): Unit = {
    val spark = batch.sparkSession
    if (batch.isEmpty) return // trailing empty trigger: no state change
    // resolve the live tree ONCE per batch: appends land beside the reads
    // (compaction runs between microbatches, so the root is stable for
    // the batch's duration; a replay after an intervening compaction
    // resolves the new tree, whose carried dir it overwrites idempotently)
    val root = liveRoot(spark, indexDir)
    // Resolve (and on the index's FIRST admission, stamp) the Bloom
    // geometry BEFORE any side write: a config clash must fail with the
    // index untouched, not after half the batch's sides landed. An
    // established stamp is NEVER rewritten here — the caller's sizing can
    // only confirm it (geometry-wise; a differing designFpr INHERITS the
    // stamp — [[retargetBloomFpr]] is the explicit, atomic retarget path).
    val sizing = resolveBloomSizing(spark, indexDir, root, bloomSizing)
    // Resolve (first admission: stamp) the lens/rung config the same way
    // — a toggled config must fail fast HERE, with the index untouched,
    // never leave a print side partially populated.
    resolveMediaConf(spark, indexDir, root, imageLens, dihedralRung)
    val batchSh = DedupOps.shingleArrays(batch)
    val pairs = DedupOps.incrementalNearDups(
      batchSh,
      readSide(spark, s"$root/shingles", ShingleSchema).drop("batch"),
      readSide(spark, s"$root/bands", BandSchema).drop("batch"),
      threshold).persist()
    // Force the verdicts NOW: `pairs` lazily reads the index dirs this
    // batch is about to append to — materializing before any write keeps
    // the read set consistent (a replayed batch, whose previous attempt
    // already appended, sees its own docs only via identity pairs, which
    // incrementalNearDups drops).
    pairs.count()
    val key = s"batch=$lineage-$batchId"
    // A doc_id already admitted by a PREVIOUS batch must never be indexed
    // (or kept) a second time: a re-ingest under a different lineage is
    // not rejected by the pair verdict (its only match is its own identity
    // pair), and a double-indexed doc corrupts future Jaccard verification
    // (duplicated shingle rows double-count n_inter). The batch's OWN dir
    // is excluded from the probe — partition pruning skips every other dir
    // — so a same-lineage replay still rewrites itself idempotently.
    // Probe = corpus ids ∩ batch ids via a broadcast semi-join on the
    // (small) batch id set — the corpus side contributes a one-column scan,
    // never a shuffle, and at deployment the doc_id-bucketed shingle table
    // prunes to the buckets the batch ids hash into.
    val priorIds = readSide(spark, s"$root/shingles", ShingleSchema)
      .filter(col("batch") =!= key.stripPrefix("batch="))
      .select("doc_id")
      .join(broadcast(batchSh.select("doc_id")), Seq("doc_id"), "left_semi")
    val dupIds = pairs.select(col("id_b").as("doc_id")).distinct().persist()
    val prior = priorIds.persist()
    val rejected = dupIds.unionByName(prior).distinct()
    val keptSh = batchSh.join(rejected, Seq("doc_id"), "left_anti").persist()
    keptSh.count()
    // Read by three writes (kept rows, positional seeds, word counts) —
    // materialize once instead of re-running the anti-join per side.
    val keptOut = batch.join(rejected, Seq("doc_id"), "left_anti").persist()
    try {
      pairs.write.mode("overwrite").parquet(s"$outDir/dups/$key")
      keptOut.write.mode("overwrite").parquet(s"$outDir/kept/$key")
      keptSh.write.mode("overwrite").parquet(s"$root/shingles/$key")
      DedupOps.bandIndex(DedupOps.signaturesFromShingleArrays(keptSh))
        .write.mode("overwrite").parquet(s"$root/bands/$key")
      // third + ninth sides off ONE positional-hash evaluation: the
      // per-doc kh array materializes once; the seed side posexplodes it
      // (d9b's span-screening index), the winnow side window-mins it
      // (t21's 1/w-sized pair-detection sketch) — maintaining the sketch
      // beside the seeds never hashes the text a second time. Same
      // idempotent batch=-keyed overwrite on both.
      val keptKh = DedupOps.khArrays(keptOut, SeedK).persist()
      val keptSeeds = DedupOps.seedsFromKhArrays(keptKh).persist()
      keptSeeds.write.mode("overwrite").parquet(s"$root/seeds/$key")
      // fourth side: the batch's (kh, df) seed-stats partial, upserted
      // beside the seeds (same idempotent key — a replay overwrites its
      // own partial, never double-counts) so screening's df prune joins
      // maintained counts instead of re-aggregating the seed table
      DedupOps.seedStats(keptSeeds)
        .write.mode("overwrite").parquet(s"$root/seedstats/$key")
      keptSeeds.unpersist(blocking = false)
      // ninth side: the winnow sketch (identity fold, the imagehashes
      // discipline) — t21d's serving state
      DedupOps.winnowFromKhArrays(keptKh, WinnowW)
        .write.mode("overwrite").parquet(s"$root/winnowfps/$key")
      keptKh.unpersist(blocking = false)
      // fifth side: the batch's (word, n) counts — t13's corpus state,
      // maintained so vocabulary/OOV serving never re-tokenizes the
      // corpus; same sum-mergeable-partial discipline as the seed stats
      keptOut.select(explode(split(col("text"), " ")).as("word"))
        .groupBy("word").agg(count(lit(1)).as("n"))
        .write.mode("overwrite").parquet(s"$root/wordcounts/$key")
      // seventh side: the batch's (prev, word, n) bigram counts — the
      // t19d conditional model beside the unigram one, same sum-mergeable
      // partials (pair extraction shared with the batch scorer via
      // TextOps.bigramPairs, so the model and its probe cannot drift)
      graft.llm.TextOps.bigramPairs(keptOut)
        .groupBy("prev", "word").agg(count(lit(1)).as("n"))
        .write.mode("overwrite").parquet(s"$root/bigramcounts/$key")
      // eighth + twelfth sides: the admitted docs' image-modality
      // FINGERPRINTS (m4's aHash) and the video renditions' KEYFRAME
      // prints (m7b's frame-0 aHash, imagehashes schema) — pixels and
      // containers decode exactly once, at admission; the m4d/m7c
      // screens read 16-byte hash rows ever after. Same idempotent
      // batch= key. A caller that already decoded the batch
      // (CurationStream's phase-1 screens) passes its fingerprint
      // frames via `imageHashes`/`videoHashes` — restricted here to the
      // kept set; otherwise BOTH sides derive from ONE materialized
      // media table (the payload generation/read must not run twice),
      // and only for batches carrying the media envelope: a text-only
      // admission must not pay a per-doc decode for sides it will never
      // query — its dirs are simply absent, which readSide resolves as
      // empty.
      // the LENS config decides which image print sides this index
      // maintains: aHash (imagehashes), dHash (the optional fourteenth
      // side, imagedhashes), or both off ONE decode
      val writesA = imageLens != DHashLens
      val writesD = imageLens != AHashLens
      val mediaFallback =
        if (((writesA && imageHashes.isEmpty) ||
          (writesD && imageDHashes.isEmpty) ||
          (dihedralRung && imageKHashes.isEmpty) ||
          imageTiles.isEmpty ||
          videoHashes.isEmpty || frameHashes.isEmpty ||
          frameStrides.isEmpty || frameKStrides.isEmpty ||
          (dihedralRung && (videoKHashes.isEmpty || frameKHashes.isEmpty))) &&
          graft.llm.MultimodalOps.hasMediaEnvelope(keptOut))
          Some(graft.llm.MultimodalOps.asRenditionMediaTable(keptOut).persist())
        else None
      // the fallback's video sides derive from ONE combined decode
      // (decodeVideoFull: proportional dual-family samples + fixed-
      // stride prints off one container parse and one frame memo): the
      // keyframe side is the ordinal-0 projection (keyframeOf), the
      // canonical sides cost bit arithmetic over the same pixels, and
      // the stride side is the strides projection — a container never
      // parses twice inside an admission, caller-passed or not.
      val videoFullFallback =
        if ((videoHashes.isEmpty || frameHashes.isEmpty ||
          frameStrides.isEmpty || frameKStrides.isEmpty ||
          (dihedralRung && (videoKHashes.isEmpty || frameKHashes.isEmpty))) &&
          mediaFallback.nonEmpty)
          mediaFallback.map(m =>
            graft.llm.MultimodalOps.decodeVideoFull(spark, m).toDF().persist())
        else None
      val framesFallback =
        videoFullFallback.map(graft.llm.MultimodalOps.videoFramesOf)
      // when ANY image-family side needs a fallback, ONE combined decode
      // feeds EVERY image side (lensTileFrame — aHash, dHash, the
      // dihedral-canonical print AND the tile sub-prints off the same
      // pixels): since the imagetiles side is always-on (round 20), a
      // media batch without caller-passed frames always routes here, and
      // a pixel never decodes twice inside an admission
      val lensFallback =
        if (((writesA && imageHashes.isEmpty) ||
          (writesD && imageDHashes.isEmpty) ||
          (dihedralRung && imageKHashes.isEmpty) ||
          imageTiles.isEmpty || imageKTiles.isEmpty) && mediaFallback.nonEmpty)
          mediaFallback.map(m =>
            graft.llm.MultimodalOps.lensTileFrame(m).persist())
        else None
      try {
        if (writesA) imageHashes
          .map(_.join(keptOut.select("doc_id"), Seq("doc_id"), "left_semi"))
          .orElse(lensFallback.map(graft.llm.MultimodalOps.aHashOf))
          .foreach(_.write.mode("overwrite").parquet(s"$root/imagehashes/$key"))
        if (writesD) imageDHashes
          .map(_.join(keptOut.select("doc_id"), Seq("doc_id"), "left_semi"))
          .orElse(lensFallback.map(graft.llm.MultimodalOps.dHashOf))
          .foreach(_.write.mode("overwrite").parquet(s"$root/imagedhashes/$key"))
        if (dihedralRung) imageKHashes
          .map(_.join(keptOut.select("doc_id"), Seq("doc_id"), "left_semi"))
          .orElse(lensFallback.map(graft.llm.MultimodalOps.dihedralOf))
          .foreach(_.write.mode("overwrite").parquet(s"$root/imagekhashes/$key"))
        // the twenty-second side: tile sub-prints (m4o's spatial-crop
        // tier) — the tilesOf projection of the same combined decode, so
        // a cropped re-upload is caught at its true (dx, dy) at
        // admission time (the framestride discipline on the x/y axes;
        // ≤ MaxTilesPerImage rows of 16-byte prints per image)
        imageTiles
          .map(_.join(keptOut.select("doc_id"), Seq("doc_id"), "left_semi"))
          .orElse(lensFallback.map(graft.llm.MultimodalOps.tilesOf))
          .foreach(_.write.mode("overwrite").parquet(s"$root/imagetiles/$key"))
        // the twenty-third side: dihedral-CANONICAL tile sub-prints
        // ('lt' family only — the stored side of the m4r crop∘dihedral
        // tier), the ktileSideOf projection of the same combined
        // decode: a re-upload that crops AND mirrors is caught at its
        // true (dx, dy) with its transform witness at admission time
        imageKTiles
          .map(_.join(keptOut.select("doc_id"), Seq("doc_id"), "left_semi"))
          .orElse(lensFallback.map(graft.llm.MultimodalOps.ktileSideOf))
          .foreach(_.write.mode("overwrite").parquet(s"$root/imagetilesk/$key"))
        videoHashes
          .map(_.join(keptOut.select("doc_id"), Seq("doc_id"), "left_semi"))
          .orElse(framesFallback.map(graft.llm.MultimodalOps.keyframeOf))
          .foreach(_.write.mode("overwrite").parquet(s"$root/videohashes/$key"))
        // the sixteenth side: dihedral-canonical KEYFRAME prints — the
        // ordinal-0 projection of the dual-family sampler's k columns
        // (keyframeOf over frameDihedralOf), the video analog of the
        // imagekhashes side
        if (dihedralRung) videoKHashes
          .map(_.join(keptOut.select("doc_id"), Seq("doc_id"), "left_semi"))
          .orElse(framesFallback.map(f => graft.llm.MultimodalOps.keyframeOf(
            graft.llm.MultimodalOps.frameDihedralOf(f))))
          .foreach(_.write.mode("overwrite").parquet(s"$root/videokhashes/$key"))
        frameHashes
          .map(_.join(keptOut.select("doc_id"), Seq("doc_id"), "left_semi"))
          .orElse(framesFallback)
          .foreach(_.select("doc_id", "frame_idx", "frame_no", "h_hi", "h_lo")
            .write.mode("overwrite").parquet(s"$root/framehashes/$key"))
        // the eighteenth side: dihedral-canonical PER-ORDINAL prints —
        // the frameDihedralOf projection of the same dual-family sampler
        // (the shot-level analog of videokhashes: the flipped RE-EDIT
        // that keeps later footage)
        if (dihedralRung) frameKHashes
          .map(_.join(keptOut.select("doc_id"), Seq("doc_id"), "left_semi"))
          .orElse(framesFallback.map(graft.llm.MultimodalOps.frameDihedralOf))
          .foreach(_.select("doc_id", "frame_idx", "frame_no", "h_hi", "h_lo")
            .write.mode("overwrite").parquet(s"$root/framekhashes/$key"))
        // the twentieth side: fixed-STRIDE frame prints (m3f's video
        // shift tier) — the strides projection of the same combined
        // decode, so a clip re-edited behind prepended intro frames is
        // caught at its true offset at admission time (the audiowins
        // discipline on the frame axis; ≤ MaxStridePrintsPerClip rows
        // of 16-byte prints per clip)
        frameStrides
          .map(_.join(keptOut.select("doc_id"), Seq("doc_id"), "left_semi"))
          .orElse(videoFullFallback.map(graft.llm.MultimodalOps.videoStridesOf))
          .foreach(_.write.mode("overwrite").parquet(s"$root/framestride/$key"))
        // the twenty-first side: dihedral-CANONICAL stride prints (m3i's
        // dihedral∘shift tier) — the videoStrideKOf projection of the
        // same combined decode: the k-print is already computed per
        // memoized frame, so the side costs 16 bytes per stride row and
        // zero extra decode; the mirrored-AND-prepended re-edit is
        // caught at its true offset at admission time
        frameKStrides
          .map(_.join(keptOut.select("doc_id"), Seq("doc_id"), "left_semi"))
          .orElse(videoFullFallback.map(graft.llm.MultimodalOps.videoStrideKOf))
          .foreach(_.write.mode("overwrite").parquet(s"$root/framestridek/$key"))
      } finally {
        lensFallback.foreach(_.unpersist(blocking = false))
        videoFullFallback.foreach(_.unpersist(blocking = false))
        mediaFallback.foreach(_.unpersist(blocking = false))
      }
      // tenth + eleventh sides off ONE audio decode: the combined
      // AudioFull frame (header + decoded-PCM content hash + acoustic
      // print — one container parse, one sample parse) projects into the
      // audiohashes side (m5c's exact tier) AND the audiofps side
      // (m5d/m5e's perceptual tier), so an admitted clip's samples are
      // touched exactly once however many screens later consume them —
      // the khArrays seeds↔winnowfps discipline on the audio modality.
      // Same media-envelope gate, same idempotent batch= key, same
      // caller-passed decode-once seam as the image side (CurationStream
      // feeds its phase-1 frame via `audioFull`).
      audioFull
        .map(_.join(keptOut.select("doc_id"), Seq("doc_id"), "left_semi"))
        .orElse(
          if (graft.llm.MultimodalOps.hasMediaEnvelope(keptOut))
            Some(graft.llm.MultimodalOps.decodeAudioFull(spark,
              graft.llm.MultimodalOps.asRenditionAudioTable(keptOut)).toDF())
          else None)
        .foreach { full0 =>
          // three writes read it — materialize once, never decode twice
          val full = full0.persist()
          try {
            graft.llm.MultimodalOps.audioMetaOf(full)
              .write.mode("overwrite").parquet(s"$root/audiohashes/$key")
            graft.llm.MultimodalOps.audioFpOf(full)
              .write.mode("overwrite").parquet(s"$root/audiofps/$key")
            // seventeenth side: the windowed sub-prints (m5h's shift
            // tier) — the nested wins column exploded off the SAME
            // decode row, so time-shift screening serves maintained
            // 16-byte rows ever after (≤ ~n_samples/128 rows per clip)
            graft.llm.MultimodalOps.audioWinsOf(full)
              .write.mode("overwrite").parquet(s"$root/audiowins/$key")
            // nineteenth side: the dual-family REVERSAL-canonical window
            // prints (m5m's reversal∘shift tier) — the nested rwins
            // column off the same decode row, so a clip recycled
            // REVERSED (± leading silence) is caught at admission time;
            // ~2× the audiowins rows, both capped per clip
            graft.llm.MultimodalOps.audioRWinsOf(full)
              .write.mode("overwrite").parquet(s"$root/audiorwins/$key")
          } finally full.unpersist(blocking = false)
        }
      // sixth side: the batch's Bloom bitset partial (d10's filter as
      // maintained state) — one m/8-byte row per admission, OR-mergeable,
      // same idempotent batch=-keyed overwrite (a replay recomputes the
      // identical partial from the identical kept set). The geometry is
      // stamped on the index's FIRST admission and read back thereafter:
      // a caller-passed sizing that contradicts the stamp is a loud
      // config error (partials of different geometries cannot OR).
      locally {
        import spark.implicits._
        // one (shard, bits) partial row per shard — the unsharded case is
        // shard 0; a replay recomputes identical rows into the same dir
        val partials =
          if (sizing.shards == 1) Seq((0, DedupOps.bloomBuild(keptOut, sizing)))
          else DedupOps.bloomBuildSharded(keptOut, sizing)
            .zipWithIndex.map { case (b, s) => (s, b) }.toSeq
        partials.toDF("shard", "bits")
          .coalesce(1)
          .write.mode("overwrite").parquet(s"$root/bloom/$key")
      }
      // Group maintenance (d7 ∘ d5): fold this batch's pairs into the
      // maintained (doc_id, group_id) assignment. The delta is O(batch +
      // touched components); BucketStore's manifest flip rewrites only the
      // buckets holding moved rows — untouched groups stay byte-identical.
      // Runs LAST so a crash replays the whole admission idempotently: a
      // doc already assigned is excluded from newIds, and re-merging an
      // identical delta is a no-op upsert.
      val groups = corpusGroups(spark, indexDir)
      val batchIds = batch.select("doc_id")
      val newIds = batchIds.join(
        groups.select("doc_id")
          .join(broadcast(batchIds), Seq("doc_id"), "left_semi"),
        Seq("doc_id"), "left_anti")
      val delta = DedupOps.incrementalGroupDelta(
        groups, pairs.select("id_a", "id_b"), newIds).persist()
      if (!delta.isEmpty)
        BucketStore.merge(spark, s"$indexDir/groups", delta,
          key = "doc_id", combine = BucketStore.upsertCombine("doc_id"))
      // Admission accounting, one row per batch — the dedup loop's K4
      // analog (every reference pipeline stage exports measurements; an
      // admission service that can't report its reject rate or index
      // growth is unoperable at 100 TB). Each count reads an
      // already-persisted frame or a broadcast-pruned derivative; the row
      // rides the same idempotent batch=-keyed overwrite as the data it
      // describes. No arithmetic identities are assumed: n_kept counts
      // the kept output itself (short docs admit without shingles, and a
      // doc can in principle be both prior-known and verdict-matched).
      val nRemapped = delta
        .join(broadcast(batchIds), Seq("doc_id"), "left_anti").count()
      import spark.implicits._
      Seq((lineage, batchId, batch.count(), keptOut.count(),
          dupIds.count(), prior.count(), nRemapped))
        .toDF("lineage", "batch_id", "n_in", "n_kept",
          "n_dup_rejected", "n_prior_known", "n_group_rows_remapped")
        .write.mode("overwrite").parquet(s"$outDir/metrics/$key")
      delta.unpersist(blocking = false)
    } finally {
      pairs.unpersist(blocking = false)
      keptSh.unpersist(blocking = false)
      keptOut.unpersist(blocking = false)
      dupIds.unpersist(blocking = false)
      prior.unpersist(blocking = false)
      // intermediate persists inside incrementalNearDups; safe here because
      // this pipeline owns the session's dedup work for the batch duration
      DedupOps.releaseCaches()
    }
  }

  /** D9b over the maintained index: verbatim shared spans between a probe
    * set and the ALREADY-ADMITTED corpus, served from the seeds side —
    * the corpus is never re-tokenized. Width is pinned to [[SeedK]] (the
    * index's build width). */
  def screenSpans(spark: SparkSession, indexDir: String, newDocs: DataFrame,
      minSpan: Int = 8, maxDf: Int = 100): DataFrame =
    DedupOps.incrementalSpans(newDocs, corpusSeeds(spark, indexDir),
      corpusSeedStats(spark, indexDir),
      k = SeedK, minSpan = minSpan, maxDf = maxDf)

  /** D6b over the maintained assignment: quality-keeper election served
    * straight from the group store the admission loop maintains — the
    * editorial keep/drop decision is a query-time VIEW over (groups ×
    * quality), never persisted state, so a changed quality model re-elects
    * without touching the store. */
  def electKeepers(spark: SparkSession, indexDir: String,
      quality: DataFrame): DataFrame =
    DedupOps.qualityKeepers(corpusGroups(spark, indexDir), quality)

  /** C2 over the maintained index: the FULL admission verdict for a
    * candidate increment — near-dup (d5, off the band index), verbatim
    * span (d9b, off the seed index), benchmark contamination (d8,
    * broadcast) and quality (t5), with pipeline-order precedence — before
    * committing anything. [[admitBatch]] folds only the dedup screen into
    * its reject set; this is the advisory form a curation operator runs
    * to decide (or audit) what a batch WOULD do under the complete c1
    * policy, served entirely from the index the admission loop maintains.
    * Same composition as the batch `c2_incremental_admission` query —
    * StreamingSpec asserts verdict-for-verdict parity.
    *
    * `semPairs` (c2b) adds the embedding-tier screen: pass
    * [[graft.llm.SimilarityOps.semanticScreen]] output over the SERVED
    * IVF index (maintained by the embedding pipeline, not this stream's
    * text index) and the increment's vectors; `semantic_dup` slots
    * between span_dup and contaminated. */
  /** The span rung's INDEX choice — the documented 1/w-size tradeoff as
    * a config value instead of prose: `Seeds` serves [[screenSpans]]
    * (exact span COORDINATES off the positional seed side — what d9c's
    * scrub remediation needs); `Sketch` serves [[screenWinnow]] off the
    * winnowfps side at ~1/[[WinnowW]] the index size, detecting the same
    * ≥ [[SeedK]] + [[WinnowW]] − 1 = 8-word forced overlap at pair level
    * only. The sketch rung screens at minShared = 1: an exactly-8-word
    * overlap forces exactly ONE shared fingerprint, so parity with the
    * seed rung's minSpan = 8 needs the single-print evidence level
    * (higher minShared trades that boundary recall for precision).
    *
    * PRECISION ASYMMETRY (accepted, by design): minShared = 1 makes the
    * sketch rung's recall direction exact — every ≥ 8-word overlap is
    * caught — but its PRECISION direction is weaker than the seed
    * rung's: one shared fingerprint only proves one shared SELECTED
    * k-gram ([[SeedK]] = 5 words), so two docs sharing a short phrase
    * below the 8-word span bound CAN reject `span_dup` under SketchRung
    * where SeedsRung admits (CurationStreamSpec pins exactly that
    * divergence). This is the standard sketch-index tradeoff: the
    * winnow side holds 1/w of the evidence, so its positives are
    * k-gram-level, not span-level. A deployment wanting span-level
    * precision keeps SeedsRung (exact coordinates); one preferring the
    * 1/w index size accepts that a selected-k-gram collision is
    * rejection-worthy — for verbatim-duplication screens over web-scale
    * corpora a shared rare 5-gram is itself a strong duplication
    * signal, which is why minShared = 1 is the shipped default rather
    * than a recall hole. */
  sealed trait SpanRung
  case object SeedsRung extends SpanRung
  case object SketchRung extends SpanRung

  /** The rung's screen over the maintained index — ONE dispatch shared
    * by [[admissionVerdicts]] and [[CurationStream]]'s phase-1 (which
    * passes each side through its own-batch exclusion first). */
  private[streaming] def spanScreenOf(spark: SparkSession, rung: SpanRung,
      newDocs: DataFrame, seeds: => DataFrame, seedStats: => DataFrame,
      winnowFps: => DataFrame): DataFrame = rung match {
    case SeedsRung =>
      DedupOps.incrementalSpans(newDocs, seeds, seedStats, k = SeedK)
    case SketchRung =>
      DedupOps.winnowScreen(winnowFps, newDocs, k = SeedK, w = WinnowW,
        minShared = 1)
  }

  def admissionVerdicts(spark: SparkSession, indexDir: String,
      newDocs: DataFrame, benchmark: DataFrame, threshold: Double = 0.5,
      minQuality: Double = 0.5, contamK: Int = 4,
      contamMinShared: Int = 1, semPairs: Option[DataFrame] = None,
      imagePairs: Option[DataFrame] = None,
      audioPairs: Option[DataFrame] = None,
      audioFpPairs: Option[DataFrame] = None,
      videoPairs: Option[DataFrame] = None,
      videoFramePairs: Option[DataFrame] = None,
      spanRung: SpanRung = SeedsRung,
      audioShiftPairs: Option[DataFrame] = None,
      videoShiftPairs: Option[DataFrame] = None,
      imageTilePairs: Option[DataFrame] = None): DataFrame =
    graft.llm.CurationOps.admitIncrement(newDocs,
      DedupOps.incrementalNearDups(DedupOps.shingleArrays(newDocs),
        corpusShingles(spark, indexDir), corpusBands(spark, indexDir), threshold),
      spanScreenOf(spark, spanRung, newDocs,
        corpusSeeds(spark, indexDir), corpusSeedStats(spark, indexDir),
        corpusWinnowFps(spark, indexDir)),
      DedupOps.contaminationHits(newDocs, benchmark, contamK, contamMinShared),
      minQuality, semPairs, imagePairs, audioPairs, audioFpPairs,
      videoPairs, videoFramePairs,
      audioShiftPairs = audioShiftPairs, videoShiftPairs = videoShiftPairs,
      imageTilePairs = imageTilePairs)

  /** D8 over the maintained index: screen the ALREADY-ADMITTED corpus
    * against a (new) benchmark without touching corpus text — the
    * shingle side table IS the corpus's k-gram set, so a fresh eval-set
    * release costs one index scan vs a broadcast of the benchmark's
    * shingles. The collision rule's k is the admission shingle width
    * (default 3); a pipeline wanting a wider decontamination k than its
    * dedup k maintains a second index at that width. */
  def screenBenchmark(spark: SparkSession, indexDir: String,
      benchmark: DataFrame, minShared: Int = 1, k: Int = 3): DataFrame =
    DedupOps.contaminationHitsFromShingles(
      corpusShingles(spark, indexDir), benchmark, k, minShared)

  /** Per-batch admission accounting across the stream's whole history. */
  def metrics(spark: SparkSession, outDir: String): DataFrame = {
    val path = new Path(s"$outDir/metrics")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(path), s"no metrics at $outDir/metrics")
    spark.read.parquet(s"$outDir/metrics")
      .drop("batch").orderBy("lineage", "batch_id")
  }

  /** Fold the per-batch dirs of every index side into one consolidated
    * `batch=compacted` dir each, published as a NEW generation tree by
    * [[IndexSides.compact]] (replay-safe carried dirs; the superseded
    * tree — or the flat pre-compaction layout — is retained one
    * publication for in-flight readers). seedstats/wordcounts rows are
    * sum-mergeable partials: their fold re-aggregates to one row per key
    * (the carried latest-per-lineage dirs stay partial — per-key SUM
    * semantics are unchanged either way). Single-writer discipline like
    * BucketStore: run between microbatches (the admission loop is the
    * only other writer). */
  /** The tier's sides with their compaction folds — ONE definition shared
    * by [[compact]] and [[compactIfDue]] so the trigger decision and the
    * action can never see different side lists. The bloom fold needs the
    * index's persisted geometry; `bloomconf` itself rides as an extra
    * (tree layouts carry it as an unknown member anyway — the extra
    * covers flat legacy layouts). */
  private def compactionSides(
      sizing: DedupOps.BloomSizing): Seq[(String, StructType, DataFrame => DataFrame)] = Seq(
    ("shingles", ShingleSchema, identity[DataFrame] _),
    ("bands", BandSchema, identity[DataFrame] _),
    ("seeds", SeedSchema, identity[DataFrame] _),
    ("seedstats", StatsSchema,
      (df: DataFrame) => df.groupBy("kh").agg(sum("df").as("df"))),
    ("wordcounts", WordSchema,
      (df: DataFrame) => df.groupBy("word").agg(sum("n").as("n"))),
    ("bigramcounts", BigramSchema,
      (df: DataFrame) => df.groupBy("prev", "word").agg(sum("n").as("n"))),
    ("imagehashes", ImgHashSchema, identity[DataFrame] _),
    ("imagedhashes", ImgHashSchema, identity[DataFrame] _),
    ("imagekhashes", ImgHashSchema, identity[DataFrame] _),
    ("imagetiles", TileSchema, identity[DataFrame] _),
    ("imagetilesk", TileSchema, identity[DataFrame] _),
    ("winnowfps", WinnowSchema, identity[DataFrame] _),
    ("audiohashes", AudioHashSchema, identity[DataFrame] _),
    ("audiofps", AudioFpSchema, identity[DataFrame] _),
    ("audiowins", AudioWinSchema, identity[DataFrame] _),
    ("audiorwins", AudioRWinSchema, identity[DataFrame] _),
    ("videohashes", ImgHashSchema, identity[DataFrame] _),
    ("videokhashes", ImgHashSchema, identity[DataFrame] _),
    ("framehashes", FrameHashSchema, identity[DataFrame] _),
    ("framekhashes", FrameHashSchema, identity[DataFrame] _),
    ("framestride", AudioWinSchema, identity[DataFrame] _),
    ("framestridek", AudioWinSchema, identity[DataFrame] _),
    ("bloom", BloomSchema, (df: DataFrame) =>
      // OR the foldable partials down to one row PER SHARD (associative,
      // so the carried per-lineage dirs staying partial changes nothing;
      // legacy null-shard rows fold as shard 0)
      DedupOps.bloomFoldSharded(df, sizing)))

  /** The live stamp dirs by name — compact carries them as extras so a
    * FLAT legacy layout's stamps migrate into the first generation tree
    * (tree layouts carry them as unknown members anyway). */
  private def confExtras(spark: SparkSession, indexDir: String): Seq[String] = {
    val live = liveRoot(spark, indexDir)
    confDirsUnder(IndexSides.fsOf(spark, live), live).map(_._2) :+ "mediaconf"
  }

  def compact(spark: SparkSession, indexDir: String): Unit =
    IndexSides.compact(spark, indexDir,
      compactionSides(bloomSizingAt(spark, indexDir)),
      extras = confExtras(spark, indexDir))

  /** The cron seam: compact iff `policy` fires on this tier's sides
    * (dir-count / byte thresholds over the foldable NEW batch dirs — a
    * pure listing read, never data). The geometry stamp is read only when
    * the policy actually fires: an idle tick must not run a Spark job.
    * Returns whether compact() ran (it may have only healed). */
  def compactIfDue(spark: SparkSession, indexDir: String,
      policy: CompactionPolicy = CompactionPolicy()): Boolean = {
    val due = IndexSides.shouldCompact(spark, indexDir,
      compactionSides(DedupOps.BloomSizing.Default).map(_._1), policy)
    if (due) compact(spark, indexDir)
    due
  }

  /** Start the admission stream over a streaming (doc_id, text, …) frame.
    * `bloomSizing` (from `EngineConf.bloomSizingFor` at deployment) stamps
    * the d10 filter geometry on the index's first admission. */
  def start(docs: DataFrame, indexDir: String, outDir: String,
      checkpointDir: String, threshold: Double = 0.5,
      bloomSizing: DedupOps.BloomSizing = DedupOps.BloomSizing.Default,
      imageLens: ImageLens = AHashLens,
      dihedralRung: Boolean = false): StreamingQuery = {
    val lineage = lineageOf(checkpointDir)
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        admitBatch(batch, batchId, indexDir, outDir, threshold, lineage,
          bloomSizing, imageLens = imageLens, dihedralRung = dihedralRung)
      }
      .start()
  }
}
