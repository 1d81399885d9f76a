package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.model.ObjectsModel
import graft.streaming.IngestPipeline

/** End-to-end Structured Streaming pipeline tests: the streamed store must
  * converge to exactly the batch objects view (streaming/batch parity), the
  * completion countdown must commit checkpoints exactly once, and windowed
  * aggregation must respect the watermark. */
/** Raw event shape matching the testdata events table with nanos-long ts
  * (see Tables.load). Top-level so Spark can derive an Encoder. */
case class Ev(event_id: Long, ts: Long, user_id: Long,
    event_type: String, value: Double, props: String)

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def mkEvents(n: Int): Seq[Ev] =
    (0 until n).map { i =>
      Ev(i.toLong, 1700000000000000000L + i.toLong * 1000000000L, (i % 7).toLong,
        Seq("signup", "click", "purchase", "view", "error")(i % 5), i * 1.5,
        s"""{"k": ${i % 100}}""")
    }

  test("streamed ingest converges to the batch objects view (K1/K2/K3 parity)") {
    val tmp = Files.createTempDirectory("graft_stream").toString
    val events = mkEvents(200)
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val query = IngestPipeline.start(
      spark, stream.toDF(), s"$tmp/store", s"$tmp/dlq", s"$tmp/ckpt",
      Trigger.ProcessingTime("50 milliseconds"))
    try {
      // three microbatches, deliberately splitting mid-checkpoint
      stream.addData(events.slice(0, 77))
      query.processAllAvailable()
      stream.addData(events.slice(77, 140))
      query.processAllAvailable()
      stream.addData(events.slice(140, 200))
      query.processAllAvailable()
    } finally query.stop()

    val streamed = IngestPipeline.readStore(spark, s"$tmp/store")
      .select("_id", "version", "deletion").as[(String, Long, Boolean)].collect().toSet
    val batch = ObjectsModel.latestWins(ObjectsModel.processed(
      ObjectsModel.kept(ObjectsModel.deriveChanges(events.toDF()))))
      .select("_id", "version", "deletion").as[(String, Long, Boolean)].collect().toSet
    assert(streamed === batch)

    // DLQ captured exactly the poisoned items (version % 97 == 13, K3),
    // as JSON envelopes (kind, payload) like the reference's Pulsar messages
    val dlqVersions = spark.read.parquet(s"$tmp/dlq")
      .filter(col("kind") === IngestPipeline.KindChangeFailure)
      .select(get_json_object(col("payload"), "$.version").cast("long").as("version"))
      .as[Long].collect().toSet
    val expectedDlq = ObjectsModel.failures(ObjectsModel.kept(
      ObjectsModel.deriveChanges(events.toDF()))).select("version").as[Long].collect().toSet
    assert(dlqVersions === expectedDlq)
  }

  test("restart with same checkpoint: no duplicates, store converges (exactly-once)") {
    val tmp = Files.createTempDirectory("graft_restart").toString
    val events = mkEvents(120)
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    // first run: half the data, then STOP mid-stream
    val q1 = IngestPipeline.start(
      spark, stream.toDF(), s"$tmp/store", s"$tmp/dlq", s"$tmp/ckpt",
      Trigger.ProcessingTime("50 milliseconds"))
    try {
      stream.addData(events.slice(0, 60))
      q1.processAllAvailable()
    } finally q1.stop()
    // second run: SAME checkpoint + store, rest of the data (plus a replay
    // of a slice the first run already processed — must be absorbed)
    val q2 = IngestPipeline.start(
      spark, stream.toDF(), s"$tmp/store", s"$tmp/dlq", s"$tmp/ckpt",
      Trigger.ProcessingTime("50 milliseconds"))
    try {
      stream.addData(events.slice(40, 120))
      q2.processAllAvailable()
    } finally q2.stop()

    val streamed = IngestPipeline.readStore(spark, s"$tmp/store")
      .select("_id", "version", "deletion").as[(String, Long, Boolean)].collect().toSeq
    val batch = ObjectsModel.latestWins(ObjectsModel.processed(
      ObjectsModel.kept(ObjectsModel.deriveChanges(events.toDF()))))
      .select("_id", "version", "deletion").as[(String, Long, Boolean)].collect().toSeq
    assert(streamed.size === streamed.map(_._1).distinct.size, "duplicate ids in store")
    assert(streamed.toSet === batch.toSet)
  }

  test("restart mid-backfill: deferred poll rows survive the crash and land once") {
    val tmp = Files.createTempDirectory("graft_deferrestart").toString
    val events = mkEvents(200)
    implicit val sqlCtx = spark.sqlContext
    val s1 = MemoryStream[Ev]
    // run 1: contiguous start, then a gap batch that pauses the poll route
    // and spills it to _defer — then CRASH (stop) before any resume batch
    val q1 = IngestPipeline.start(
      spark, s1.toDF(), s"$tmp/store", s"$tmp/dlq", s"$tmp/ckpt",
      Trigger.ProcessingTime("50 milliseconds"))
    try {
      s1.addData(events.slice(0, 50)) // cps 0..4
      q1.processAllAvailable()
      s1.addData(events.slice(100, 150)) // cps 10..14, behind 5 → backfill
      q1.processAllAvailable()
    } finally q1.stop()
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$tmp/store/_defer")))

    // run 2: fresh driver state (tip cache re-reads the store), contiguous
    // batch → livescan resume merges the deferred rows exactly once
    val s2 = MemoryStream[Ev]
    val q2 = IngestPipeline.start(
      spark, s2.toDF(), s"$tmp/store", s"$tmp/dlq", s"$tmp/ckpt2",
      Trigger.ProcessingTime("50 milliseconds"))
    try {
      s2.addData(events.slice(150, 200)) // cps 15..19
      q2.processAllAvailable()
    } finally q2.stop()

    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$tmp/store/_defer")))
    val delivered = events.slice(0, 50) ++ events.slice(100, 200)
    val expected = ObjectsModel.latestWins(ObjectsModel.processed(ObjectsModel.kept(
      ObjectsModel.deriveChanges(delivered.toDF()))))
      .select("_id", "version").as[(String, Long)].collect().toSet
    val got = IngestPipeline.readStore(spark, s"$tmp/store")
      .select("_id", "version").as[(String, Long)].collect().toSeq
    assert(got.size === got.distinct.size)
    assert(got.toSet === expected)
  }

  test("replaying the same batch does not change the store (idempotent MERGE)") {
    val tmp = Files.createTempDirectory("graft_replay").toString
    val events = mkEvents(50)
    val batch = ObjectsModel.kept(ObjectsModel.deriveChanges(events.toDF()))
    IngestPipeline.mergeStore(spark, s"$tmp/store", batch)
    val first = IngestPipeline.readStore(spark, s"$tmp/store").orderBy("_id", "version").collect().toSeq
    IngestPipeline.mergeStore(spark, s"$tmp/store", batch)
    val second = IngestPipeline.readStore(spark, s"$tmp/store").orderBy("_id", "version").collect().toSeq
    assert(first === second)
  }

  test("a reader on the previous manifest scans intact buckets through a merge (BucketStore retention)") {
    import graft.streaming.BucketStore
    val store = s"${Files.createTempDirectory("graft_bretain")}/bstore"
    def merge(rows: (Long, Long)*): Unit = BucketStore.merge(spark, store,
      rows.toSeq.toDF("doc_id", "group_id"), key = "doc_id",
      combine = BucketStore.upsertCombine("doc_id"))
    def manifests(): Set[String] = {
      import scala.jdk.CollectionConverters._
      val s = Files.list(java.nio.file.Paths.get(store))
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("manifest-")).toSet
      finally s.close()
    }
    merge((1L, 1L), (2L, 2L), (3L, 3L)) // manifest-0 (store birth)
    merge((4L, 4L))                     // manifest-1
    // reader resolves the live manifest NOW; its parquet file listing is
    // captured at DataFrame creation, so the next merge's GC must leave
    // every file this manifest references intact
    val reader = BucketStore.read(spark, store)
    merge((1L, 100L))                   // manifest-2 rewrites doc 1's bucket
    assert(reader.select("doc_id", "group_id").as[(Long, Long)].collect().toSet
      === Set((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L)),
      "the pre-merge reader lost files to the flip")
    // the live read serves the merged truth
    assert(BucketStore.read(spark, store)
      .select("doc_id", "group_id").as[(Long, Long)].collect().toSet
      === Set((1L, 100L), (2L, 2L), (3L, 3L), (4L, 4L)))
    // retention is one manifest deep: the previous stays, older are gone
    assert(manifests() === Set("manifest-1", "manifest-2"), manifests())
    // a further merge advances the window
    merge((2L, 200L))                   // manifest-3
    assert(manifests() === Set("manifest-2", "manifest-3"), manifests())
    assert(BucketStore.read(spark, store)
      .select("doc_id", "group_id").as[(Long, Long)].collect().toSet
      === Set((1L, 100L), (2L, 200L), (3L, 3L), (4L, 4L)))
  }

  test("incremental merge rewrites only touched buckets; the rest stay byte-identical") {
    val tmp = Files.createTempDirectory("graft_incremental").toString
    val store = s"$tmp/store"
    val all = ObjectsModel.kept(ObjectsModel.deriveChanges(mkEvents(200).toDF()))
    IngestPipeline.mergeStore(spark, store, all)

    def bucketFiles(): Map[String, Seq[(String, Array[Byte])]] = {
      import scala.jdk.CollectionConverters._
      val cur = java.nio.file.Paths.get(store, "CURRENT")
      val man = Files.readString(cur).trim
      Files.readAllLines(java.nio.file.Paths.get(store, man)).asScala.toList.tail
        .map(_.split(" ", 2)).map { case Array(k, rel) =>
          val dir = java.nio.file.Paths.get(store, rel)
          val s = Files.list(dir)
          val files = try s.iterator().asScala.toList.filter(
            _.getFileName.toString.endsWith(".parquet")).sortBy(_.toString)
          finally s.close()
          k -> files.map(f => (f.getFileName.toString, Files.readAllBytes(f)))
        }.toMap
    }

    val before = bucketFiles()
    assert(before.size > 1, "need multiple populated buckets for this test")
    // merge a single-id batch: exactly one bucket should be rewritten
    val one = all.orderBy("_id").limit(1)
      .withColumn("version", col("version") + 1000000L)
    IngestPipeline.mergeStore(spark, store, one)
    val after = bucketFiles()

    assert(before.keySet === after.keySet)
    val changed = before.keySet.filter { k =>
      val (b, a) = (before(k), after(k))
      b.map(_._1) != a.map(_._1) ||
        b.zip(a).exists { case ((_, bb), (_, ab)) => !java.util.Arrays.equals(bb, ab) }
    }
    assert(changed.size === 1, s"expected exactly one rewritten bucket, got $changed")
    // and the store still converges to the latest-wins batch view
    val expected = ObjectsModel.latestWins(all.unionByName(one))
      .select("_id", "version").as[(String, Long)].collect().toSet
    val got = IngestPipeline.readStore(spark, store)
      .select("_id", "version").as[(String, Long)].collect().toSeq
    assert(got.size === got.distinct.size)
    assert(got.toSet === expected)
  }

  test("S9 corrupt JSONL lines dead-letter as envelopes; a repaired line replays (K3)") {
    val tmp = Files.createTempDirectory("graft_jsondlq").toString
    val jsonDir = s"$tmp/in"
    Files.createDirectories(java.nio.file.Paths.get(jsonDir))
    val good = (1 to 6).map(i =>
      s"""{"event_id":$i,"ts":${i}000000,"user_id":${i % 3},"event_type":"click","value":1.5,"props":"p$i"}""")
    val corrupt = Seq("""{"event_id":"seven","ts":7""", """not json at all""")
    Files.write(java.nio.file.Paths.get(jsonDir, "events.jsonl"),
      (good ++ corrupt).mkString("\n").getBytes)

    val q = IngestPipeline.startCorruptLineDlq(spark, jsonDir, s"$tmp/dlq", s"$tmp/ckpt")
    try q.processAllAvailable() finally q.stop()

    // both corrupt lines arrive as envelopes with full line fidelity
    val lines = spark.read.parquet(s"$tmp/dlq")
      .filter(col("kind") === IngestPipeline.KindCorruptLine)
      .select("payload").as[String].collect().toSet
    assert(lines === corrupt.toSet)

    // operator repair: a fixed-up line dropped back into the DLQ revives
    // through the same replay consumer; the 2 still-unparsable stay dead
    val repaired =
      """{"event_id":7,"ts":7000000,"user_id":1,"event_type":"click","value":2.0,"props":"{}"}"""
    Seq((IngestPipeline.KindCorruptLine, repaired)).toDF("kind", "payload")
      .write.parquet(s"$tmp/dlq/batch=repair")
    val n = IngestPipeline.replayDlq(spark, s"$tmp/store", s"$tmp/dlq", drain = true)
    assert(n === 1L)
    assert(IngestPipeline.readStore(spark, s"$tmp/store")
      .filter(col("version") === 7L).count() === 1L)
    assert(!Files.exists(java.nio.file.Paths.get(s"$tmp/dlq")))
  }

  test("DLQ replay lands poisoned items in the store exactly once (K3 replay)") {
    val tmp = Files.createTempDirectory("graft_dlqreplay").toString
    val events = mkEvents(200)
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val query = IngestPipeline.start(
      spark, stream.toDF(), s"$tmp/store", s"$tmp/dlq", s"$tmp/ckpt",
      Trigger.ProcessingTime("50 milliseconds"))
    try {
      stream.addData(events)
      query.processAllAvailable()
    } finally query.stop()

    val poisonKeys = spark.read.parquet(s"$tmp/dlq")
      .select(get_json_object(col("payload"), "$._id").as("_id"),
        get_json_object(col("payload"), "$.version").cast("long").as("version"))
      .as[(String, Long)].collect().toSet
    assert(poisonKeys.nonEmpty)
    val before = IngestPipeline.readStore(spark, s"$tmp/store")
      .select("_id", "version").as[(String, Long)].collect().toSet
    assert(before.intersect(poisonKeys).isEmpty)

    // replay: every dead letter re-enters the merge; the store converges to
    // the batch view over ALL kept changes (poison included)
    val n = IngestPipeline.replayDlq(spark, s"$tmp/store", s"$tmp/dlq")
    assert(n === poisonKeys.size.toLong)
    val after = IngestPipeline.readStore(spark, s"$tmp/store")
      .select("_id", "version", "deletion").as[(String, Long, Boolean)].collect().toSeq
    val expected = ObjectsModel.latestWins(ObjectsModel.kept(
      ObjectsModel.deriveChanges(events.toDF())))
      .select("_id", "version", "deletion").as[(String, Long, Boolean)].collect().toSeq
    assert(after.toSet === expected.toSet)
    assert(after.size === after.map(_._1).distinct.size) // one row per _id

    // second replay is a no-op (idempotent MERGE, at-least-once safe); with
    // drain=true it also ACKs: the DLQ directory is gone afterwards
    IngestPipeline.replayDlq(spark, s"$tmp/store", s"$tmp/dlq", drain = true)
    val again = IngestPipeline.readStore(spark, s"$tmp/store")
      .select("_id", "version", "deletion").as[(String, Long, Boolean)].collect().toSeq
    assert(again.toSet === after.toSet && again.size === after.size)
    assert(!Files.exists(java.nio.file.Paths.get(s"$tmp/dlq")))
    assert(IngestPipeline.replayDlq(spark, s"$tmp/store", s"$tmp/dlq") === 0L)
  }

  test("completion countdown commits a checkpoint exactly once when all items arrive (A1)") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = Files.createTempDirectory("graft_cpd").toString
    val committed = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val stream = MemoryStream[(Long, Long)] // (cp, expected)
    val done = IngestPipeline.completionCountdown(spark, stream.toDS())
    // AvailableNow + restarts over the same checkpoint: processes what's
    // queued, stops, and recovers countdown state on the next start —
    // exercising both the countdown and state recovery.
    def runOnce(): Unit = {
      val q = done.writeStream
        .outputMode(OutputMode.Append())
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[IngestPipeline.CpDone], _: Long) =>
          batch.collect().foreach(d => committed.add((d.cp, d.items)))
          ()
        }
        .start()
      assert(q.awaitTermination(120000), "countdown query did not finish")
    }
    stream.addData(Seq.fill(3)((1L, 5L)): _*) // 3 of 5
    runOnce()
    assert(committed.isEmpty)
    stream.addData(Seq.fill(2)((1L, 5L)): _*) // completes cp 1
    stream.addData(Seq.fill(2)((2L, 4L)): _*) // 2 of 4
    runOnce()
    assert(committed.toArray.toSet === Set((1L, 5L)))
    stream.addData(Seq.fill(2)((2L, 4L)): _*) // completes cp 2
    runOnce()
    assert(committed.toArray.toSet === Set((1L, 5L), (2L, 4L)))
    // replayed sightings of an already-committed cp must NOT re-commit
    // (tombstone guard — at-least-once upstream)
    stream.addData(Seq.fill(5)((1L, 5L)): _*)
    runOnce()
    assert(committed.size === 2, s"double-commit: ${committed.toArray.toSeq}")
  }

  test("streaming dedup drops cross-batch duplicate (id, version) sightings (J4/J5)") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val events = mkEvents(40)
    val deduped = IngestPipeline.dedupStream(
      IngestPipeline.changeStream(stream.toDF()))
    val query = deduped.writeStream.format("memory").queryName("dedup_out")
      .trigger(Trigger.ProcessingTime("50 milliseconds"))
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(events)
      query.processAllAvailable()
      stream.addData(events) // replay the exact same events
      query.processAllAvailable()
      val n = spark.table("dedup_out").count()
      val expected = ObjectsModel.kept(ObjectsModel.deriveChanges(events.toDF())).count()
      assert(n === expected)
    } finally query.stop()
  }

  test("session_window sessionizes the change stream by event-time gaps (W3 streaming)") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    // user 0's events 1s apart, then a > 30min gap, then more → 2 sessions
    val burst1 = (0 until 10).map(i =>
      Ev(i.toLong, 1700000000000000000L + i * 1000000000L, 0L, "click", 1.0, "{}"))
    val burst2 = (0 until 5).map(i =>
      Ev(100L + i, 1700000000000000000L + 3600L * 1000000000L + i * 1000000000L,
        0L, "click", 1.0, "{}"))
    val sessions = IngestPipeline.changeStream(stream.toDF())
      .withColumn("ts_event", expr("timestamp_millis(ts_ms)"))
      .withWatermark("ts_event", "10 minutes")
      .groupBy(session_window(col("ts_event"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
    val query = sessions.writeStream.format("memory").queryName("sess_out")
      .trigger(Trigger.ProcessingTime("50 milliseconds"))
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(burst1 ++ burst2)
      // watermark-advancing sentinel far in the future closes both sessions
      stream.addData(Ev(9999L, 1700000000000000000L + 30000L * 1000000000L, 6L, "click", 1.0, "{}"))
      query.processAllAvailable()
      val rows = spark.table("sess_out").filter(col("user_id") === 0L).collect()
      assert(rows.length === 2, rows.mkString(";"))
      assert(rows.map(_.getAs[Long]("n")).sorted.toSeq === Seq(5L, 10L))
    } finally query.stop()
  }

  test("sliding windows assign each event to two 1h/30m windows (W2 streaming)") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val sliding = IngestPipeline.changeStream(stream.toDF())
      .withColumn("ts_event", expr("timestamp_millis(ts_ms)"))
      .withWatermark("ts_event", "1 hour")
      .groupBy(window(col("ts_event"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("n"))
    val query = sliding.writeStream.format("memory").queryName("slide_out")
      .trigger(Trigger.ProcessingTime("50 milliseconds"))
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(mkEvents(50))
      stream.addData(Ev(9999L, 1700000000000000000L + 50000L * 1000000000L, 0L, "click", 1.0, "{}"))
      query.processAllAvailable()
      val kept = ObjectsModel.kept(ObjectsModel.deriveChanges(mkEvents(50).toDF())).count()
      // every kept event lands in exactly two sliding windows, all closed
      // by the sentinel's watermark advance; the sentinel's own windows
      // stay open and are not emitted in append mode
      val total = spark.table("slide_out").agg(sum("n")).head().getLong(0)
      assert(total === 2 * kept, s"total=$total kept=$kept")
    } finally query.stop()
  }

  test("the audiowins side serves the time-shift screen; a silence-padded recycler is caught at its true offset (m5i/m5j streaming)") {
    val tmp = Files.createTempDirectory("graft_audiowins_stream").toString
    import graft.llm.MultimodalOps
    import graft.llm.MultimodalOps.{AudioGen, AudioRecord}
    // admission stocks the seventeenth side off the same combined decode
    // as audiohashes/audiofps (the nested wins column of one AudioFull)
    graft.streaming.DedupStream.admitBatch(
      Seq((1L, "src", "a" * 30), (2L, "src", "b" * 41))
        .toDF("doc_id", "source", "text"),
      0L, s"$tmp/index", s"$tmp/out", 0.5, "l1")
    // the recycler: doc 1's exact PCM behind TWO whole windows of
    // leading silence — every whole-clip contour window shifts (the m5e
    // rung's blind spot), but the windowed sub-prints land verbatim at
    // ordinal + 2
    val (ch, nf) = AudioGen.params(30L)
    val base = Array.tabulate(nf * ch)(i => AudioGen.sample(30L, i.toLong))
    val probe = Seq(AudioRecord(10L, "audio/wav",
      AudioGen.wavOf(ch, new Array[Int](2 * 128) ++ base))).toDS().toDF()
    def screen() = graft.streaming.DedupStream
      .screenAudioShiftDups(spark, s"$tmp/index", probe)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val hits = screen()
    // caught at exactly the pad offset with every base window matched,
    // corpus member as id_a
    assert(hits.contains((1L, 10L, 2L, (nf * ch / 128).toLong)), s"got $hits")
    // the contour rung misses this exact pair (the gap the side closes)
    val contour = MultimodalOps.imageNearDupsServedHashes(
      graft.streaming.DedupStream.corpusAudioFps(spark, s"$tmp/index"),
      MultimodalOps.audioFingerprintFrame(probe), probe.select("doc_id"))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(!contour.contains((1L, 10L)),
      s"contour rung unexpectedly caught the padded rendition: $contour")
    // compaction folds the per-batch dirs (identity fold); screen stable
    graft.streaming.DedupStream.compact(spark, s"$tmp/index")
    assert(screen() === hits)
    // the maintained side IS the admitted corpus's window prints
    val served = graft.streaming.DedupStream
      .corpusAudioWins(spark, s"$tmp/index")
      .as[(Long, Long, Long, Long)].collect().toSet
    val direct = MultimodalOps.audioWinsOf(
      MultimodalOps.decodeAudioFull(spark, MultimodalOps.asAudioTable(
        spark.read.parquet(s"$tmp/out/kept").select("doc_id", "text"))).toDF())
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(served === direct)
    graft.llm.DedupOps.releaseCaches()
  }

  test("the audiorwins side serves the reversal screen; a reversed+padded recycler is caught at admission (m5n/m5o streaming)") {
    val tmp = Files.createTempDirectory("graft_audiorwins_stream").toString
    import graft.llm.MultimodalOps
    import graft.llm.MultimodalOps.{AudioGen, AudioRecord}
    // admission stocks the nineteenth side off the same combined decode
    // (the nested rwins column of one AudioFull)
    graft.streaming.DedupStream.admitBatch(
      Seq((1L, "src", "a" * 30), (2L, "src", "b" * 41))
        .toDF("doc_id", "source", "text"),
      0L, s"$tmp/index", s"$tmp/out", 0.5, "l1")
    // the recycler: doc 1's PCM time-REVERSED behind two whole windows
    // of leading silence — the shift screen's forward windows never
    // match it, the reversal screen's cross legs do
    val (ch, nf) = AudioGen.params(30L)
    val base = Array.tabulate(nf * ch)(i => AudioGen.sample(30L, i.toLong))
    val nw = (nf * ch / 128).toLong
    val probe = Seq(AudioRecord(10L, "audio/wav",
      AudioGen.wavOf(ch, new Array[Int](2 * 128) ++ base.reverse)))
      .toDS().toDF()
    def screen() = graft.streaming.DedupStream
      .screenAudioRevDups(spark, s"$tmp/index", probe)
      .as[(Long, Long, String, Long, Long)].collect().toSet
    val hits = screen()
    // both cross legs fire: the pad-invariant (f, b) leg at offset 0
    // and the (b, f) leg at the pad offset — corpus member as id_a
    assert(Set((1L, 10L, "fb", 0L, nw), (1L, 10L, "bf", 2L, nw))
      .subsetOf(hits), s"got $hits")
    // the FORWARD shift screen misses the reversal — the gap this side
    // closes
    val fwd = graft.streaming.DedupStream
      .screenAudioShiftDups(spark, s"$tmp/index", probe)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(!fwd.exists(r => r._1 == 1L && r._2 == 10L),
      s"forward-window rung unexpectedly caught the reversal: $fwd")
    // compaction folds the per-batch dirs (identity fold); screen stable
    graft.streaming.DedupStream.compact(spark, s"$tmp/index")
    assert(screen() === hits)
    // the maintained side IS the admitted corpus's dual-family prints
    val served = graft.streaming.DedupStream
      .corpusAudioRWins(spark, s"$tmp/index")
      .as[(Long, String, Long, Long, Long)].collect().toSet
    val direct = MultimodalOps.audioRWinsOf(
      MultimodalOps.decodeAudioFull(spark, MultimodalOps.asAudioTable(
        spark.read.parquet(s"$tmp/out/kept").select("doc_id", "text"))).toDF())
      .as[(Long, String, Long, Long, Long)].collect().toSet
    assert(served === direct)
    graft.llm.DedupOps.releaseCaches()
  }

  test("the framestride side serves the video shift screen; a prepended-intro re-edit is caught at admission (m3g/m3h streaming)") {
    val tmp = Files.createTempDirectory("graft_framestride_stream").toString
    import graft.llm.MultimodalOps
    import graft.llm.MultimodalOps.{MediaRecord, VideoGen}
    // admission stocks the twentieth side off the combined video decode
    // (the strides projection of one VideoFull row); doc 4 is a video id
    graft.streaming.DedupStream.admitBatch(
      Seq((4L, "avi", "x" * 35), (8L, "avi", "y" * 41))
        .toDF("doc_id", "source", "text"),
      0L, s"$tmp/index", s"$tmp/out", 0.5, "l1")
    // the recycler: doc 4's clip re-edited behind TWO intro frames —
    // every proportionally sampled ordinal shifts (nf 4 → 6)
    val probe = Seq(MediaRecord(40L, "video/avi",
      VideoGen.aviWithIntro(35L, 2))).toDS().toDF()
    def screen() = graft.streaming.DedupStream
      .screenVideoShiftDups(spark, s"$tmp/index", probe)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val hits = screen()
    // caught at exactly the intro offset with every real frame matched
    // (nf(35) = 4), corpus member as id_a
    assert(hits.contains((4L, 40L, 2L, 4L)), s"got $hits")
    // compaction folds the per-batch dirs (identity fold); screen stable
    graft.streaming.DedupStream.compact(spark, s"$tmp/index")
    assert(screen() === hits)
    // the maintained side IS the admitted corpus's stride prints
    val served = graft.streaming.DedupStream
      .corpusFrameStrides(spark, s"$tmp/index")
      .as[(Long, Long, Long, Long)].collect().toSet
    val direct = MultimodalOps.frameStridePrints(spark,
      MultimodalOps.asMediaTable(
        spark.read.parquet(s"$tmp/out/kept")
          .select("doc_id", "source", "text")))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(served === direct)
    graft.llm.DedupOps.releaseCaches()
  }

  test("the lens/rung config stamps on first admission; a mid-stream toggle fails fast with the index untouched") {
    val tmp = Files.createTempDirectory("graft_mediaconf").toString
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.DedupStream
    val docs1 = Seq((1L, "src", "one distinct document with enough words to shingle cleanly today"))
      .toDF("doc_id", "source", "text")
    val docs2 = Seq((2L, "src", "another fully different set of vocabulary items for the second batch"))
      .toDF("doc_id", "source", "text")
    DedupStream.admitBatch(docs1, 0L, s"$tmp/index", s"$tmp/out", 0.5, "a")
    // toggled LENS: fails before any side write (a DHashLens-era batch
    // invisible to later AHashLens screens is the silent-recall-loss the
    // stamp exists to prevent — r17 advice)
    val exLens = intercept[IllegalArgumentException] {
      DedupStream.admitBatch(docs2, 1L, s"$tmp/index", s"$tmp/out", 0.5, "a",
        imageLens = DedupStream.BothLens)
    }
    assert(exLens.getMessage.contains("imageLens"), exLens.getMessage)
    // toggled RUNG: same failure
    val exRung = intercept[IllegalArgumentException] {
      DedupStream.admitBatch(docs2, 1L, s"$tmp/index", s"$tmp/out", 0.5, "a",
        dihedralRung = true)
    }
    assert(exRung.getMessage.contains("dihedralRung"), exRung.getMessage)
    // the index is untouched by the failed admissions: no batch=a-1 dir
    // landed on any side, and the SAME config still admits normally
    assert(spark.read.parquet(s"$tmp/index/shingles")
      .select("batch").distinct().as[String].collect().toSeq === Seq("a-0"))
    DedupStream.admitBatch(docs2, 1L, s"$tmp/index", s"$tmp/out", 0.5, "a")
    assert(spark.read.parquet(s"$tmp/index/shingles")
      .select("doc_id").as[Long].collect().toSet === Set(1L, 2L))
    graft.llm.DedupOps.releaseCaches()
  }

  test("incremental dedup stream admits uniques, flags cross- and within-batch dups (D5 streaming)") {
    val tmp = Files.createTempDirectory("graft_dedup_stream").toString
    implicit val sqlCtx = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val other = "completely different words about spark catalyst optimizer plans and shuffles everywhere"
    val third = "a third unique document with its own vocabulary of rare tokens entirely"
    val stream = MemoryStream[(Long, String)]
    val docs = stream.toDF().toDF("doc_id", "text")
    val q = graft.streaming.DedupStream.start(
      docs, s"$tmp/index", s"$tmp/out", s"$tmp/ckpt")
    try {
      stream.addData((1L, base), (2L, other))
      q.processAllAvailable()
      // 3 duplicates corpus doc 1 (cross-batch); 5 duplicates 4 (within-batch)
      stream.addData((3L, base), (4L, third), (5L, third))
      q.processAllAvailable()
    } finally q.stop()

    val kept = spark.read.parquet(s"$tmp/out/kept")
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 2L, 4L))
    val dups = spark.read.parquet(s"$tmp/out/dups")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(dups === Set((1L, 3L), (4L, 5L)))
    // the index admitted exactly the kept docs — a rejected duplicate must
    // not pollute future batches' candidate generation
    val indexed = spark.read.parquet(s"$tmp/index/shingles")
      .select("doc_id").as[Long].collect().toSet
    assert(indexed === Set(1L, 2L, 4L))
    // re-admitting the batch against the already-appended index (a replay,
    // here under a foreign lineage tag) must not change the admitted truth
    graft.streaming.DedupStream.admitBatch(
      Seq((3L, base), (4L, third), (5L, third)).toDF("doc_id", "text"),
      1L, s"$tmp/index", s"$tmp/out", 0.5)
    val keptAfter = spark.read.parquet(s"$tmp/out/kept")
      .select("doc_id").as[Long].collect().toSet
    assert(keptAfter === Set(1L, 2L, 4L))
    val dupsAfter = spark.read.parquet(s"$tmp/out/dups")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(dupsAfter === Set((1L, 3L), (4L, 5L)))
    // …and the replay must not have double-indexed doc 4 under the foreign
    // lineage's dir: duplicated shingle rows would double-count n_inter in
    // every future batch's Jaccard verification
    val shPerDoc = spark.read.parquet(s"$tmp/index/shingles")
      .groupBy("doc_id").count().filter(col("count") > 1).count()
    assert(shPerDoc === 0, "doc indexed twice in shingles side")
    val bandsPerDoc = spark.read.parquet(s"$tmp/index/bands")
      .groupBy("doc_id", "band").count().filter(col("count") > 1).count()
    assert(bandsPerDoc === 0, "doc indexed twice in bands side")

    // admission accounting: one row per batch, counting the batch's truth
    val metrics = graft.streaming.DedupStream.metrics(spark, s"$tmp/out")
      .select("batch_id", "n_in", "n_kept", "n_dup_rejected", "n_prior_known")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(metrics.contains((0L, 2L, 2L, 0L, 0L)), s"batch 0 accounting: $metrics")
    assert(metrics.contains((1L, 3L, 1L, 2L, 0L)), s"batch 1 accounting: $metrics")
    // the foreign-lineage replay wrote its own accounting row: nothing
    // kept (1 doc prior-known, 2 rejected again)
    assert(metrics.contains((1L, 3L, 0L, 2L, 1L)), s"replay accounting: $metrics")

    // restart: a NEW query over the same checkpoint + index keeps
    // deduping against everything admitted before the restart
    val stream2 = MemoryStream[(Long, String)]
    val q2 = graft.streaming.DedupStream.start(
      stream2.toDF().toDF("doc_id", "text"), s"$tmp/index", s"$tmp/out", s"$tmp/ckpt2")
    try {
      stream2.addData((6L, other), (7L, "yet another brand new unique document text corpus entry"))
      q2.processAllAvailable()
    } finally q2.stop()
    val keptFinal = spark.read.parquet(s"$tmp/out/kept")
      .select("doc_id").as[Long].collect().toSet
    assert(keptFinal === Set(1L, 2L, 4L, 7L), "6 duplicates pre-restart doc 2")
    val indexedFinal = spark.read.parquet(s"$tmp/index/shingles")
      .select("doc_id").as[Long].collect().toSet
    assert(indexedFinal === Set(1L, 2L, 4L, 7L))
  }

  test("admitted docs' seeds are maintained; span screening serves from them (d9b streaming)") {
    val tmp = Files.createTempDirectory("graft_span_stream").toString
    val shared = (0 until 12).map(i => s"tok$i").mkString(" ")
    val a = s"$shared unique tail for document alpha entirely"
    val b = "completely different words about spark catalyst optimizer plans and shuffles everywhere"
    graft.streaming.DedupStream.admitBatch(
      Seq((1L, a), (2L, b)).toDF("doc_id", "text"),
      0L, s"$tmp/index", s"$tmp/out", 0.5, "l1")
    // probe shares the 12-token block with admitted doc 1; the corpus
    // enters only through its maintained seeds side
    val probe = Seq((9L, s"lead words then $shared and then divergence"))
      .toDF("doc_id", "text")
    val spans = graft.streaming.DedupStream.screenSpans(spark, s"$tmp/index", probe)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    graft.llm.DedupOps.releaseCaches()
    assert(spans === Seq((1L, 9L, 0L, 3L, 12L)))
    // a rejected duplicate must never reach the seeds side
    graft.streaming.DedupStream.admitBatch(
      Seq((3L, a)).toDF("doc_id", "text"),
      1L, s"$tmp/index", s"$tmp/out", 0.5, "l1")
    val seedDocs = spark.read.parquet(s"$tmp/index/seeds")
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(seedDocs === Set(1L, 2L))
    // compaction folds the seeds side with the other two; screening unchanged
    graft.streaming.DedupStream.compact(spark, s"$tmp/index")
    val spans2 = graft.streaming.DedupStream.screenSpans(spark, s"$tmp/index", probe)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    graft.llm.DedupOps.releaseCaches()
    assert(spans2 === spans)
  }

  test("the (kh, df) seed-stats side updates across admissions and folds on compact") {
    val tmp = Files.createTempDirectory("graft_seedstats").toString
    val shared = (0 until 12).map(i => s"tok$i").mkString(" ")
    val doc1 = s"$shared " + (0 until 15).map(i => s"a$i").mkString(" ")
    val doc2 = s"$shared " + (0 until 15).map(i => s"b$i").mkString(" ")
    def statsSum(): Map[Long, Long] = graft.streaming.DedupStream
      .corpusSeedStats(spark, s"$tmp/index")
      .groupBy("kh").agg(sum("df").as("df"))
      .as[(Long, Long)].collect().toMap
    graft.streaming.DedupStream.admitBatch(
      Seq((1L, doc1)).toDF("doc_id", "text"),
      0L, s"$tmp/index", s"$tmp/out", 0.5, "l1")
    val s1 = statsSum()
    // the partial rows' per-kh sum IS the seed table's df
    assert(s1.values.sum === spark.read.parquet(s"$tmp/index/seeds").count())
    assert(s1.values.forall(_ === 1L), "one admission: every df is 1")
    // second admission shares the 12-token block (but not enough 3-gram
    // shingles to be rejected as a near-dup): the 8 shared 5-gram seeds
    // must now carry df = 2 from two partial rows
    graft.streaming.DedupStream.admitBatch(
      Seq((2L, doc2)).toDF("doc_id", "text"),
      1L, s"$tmp/index", s"$tmp/out", 0.5, "l1")
    val s2 = statsSum()
    assert(spark.read.parquet(s"$tmp/out/kept").count() === 2, "doc 2 admitted")
    assert(s2.values.count(_ === 2L) === 8, s"8 shared seeds at df=2: $s2")
    assert(s2.values.sum === spark.read.parquet(s"$tmp/index/seeds").count())
    // a rejected duplicate must not touch the stats side
    graft.streaming.DedupStream.admitBatch(
      Seq((3L, doc1)).toDF("doc_id", "text"),
      2L, s"$tmp/index", s"$tmp/out", 0.5, "l1")
    assert(statsSum() === s2, "rejected dup left the stats unchanged")
    // compaction folds the partials; per-kh sums are invariant
    graft.streaming.DedupStream.compact(spark, s"$tmp/index")
    assert(statsSum() === s2, "compaction preserves the per-kh sums")
  }

  test("the word-count side serves vocabulary + OOV screening without re-reading corpus text (t13/t15 streaming)") {
    val tmp = Files.createTempDirectory("graft_vocab_stream").toString
    graft.streaming.DedupStream.admitBatch(
      Seq((1L, "alpha alpha alpha beta beta gamma one two three four five six"))
        .toDF("doc_id", "text"),
      0L, s"$tmp/index", s"$tmp/out", 0.5, "l1")
    graft.streaming.DedupStream.admitBatch(
      Seq((2L, "alpha beta beta completely different words about catalyst plans everywhere"))
        .toDF("doc_id", "text"),
      1L, s"$tmp/index", s"$tmp/out", 0.5, "l1")
    // counts sum across admissions: alpha 3+1, beta 2+2
    val vocab = graft.streaming.DedupStream
      .corpusVocabulary(spark, s"$tmp/index", 2)
      .as[(String, Long)].collect().toSeq
    assert(vocab === Seq(("alpha", 1L), ("beta", 2L)),
      s"alpha(4) then beta(4) on the word tiebreak: $vocab")
    // a rejected duplicate contributes nothing
    graft.streaming.DedupStream.admitBatch(
      Seq((3L, "alpha alpha alpha beta beta gamma one two three four five six"))
        .toDF("doc_id", "text"),
      2L, s"$tmp/index", s"$tmp/out", 0.5, "l1")
    val counts = graft.streaming.DedupStream
      .corpusWordCounts(spark, s"$tmp/index")
      .groupBy("word").agg(sum("n").as("n"))
      .as[(String, Long)].collect().toMap
    assert(counts("alpha") === 4L && counts("beta") === 4L)
    // the OOV screen: only the probe tokenizes; ranks come from the
    // ADMITTED corpus — equal to the batch t15 form over the kept docs
    val probe = Seq((9L, "alpha zeta beta")).toDF("doc_id", "text")
    val served = graft.streaming.DedupStream
      .screenOov(spark, s"$tmp/index", probe, 2)
      .as[(Long, Long, Long, Double, Option[Double])].collect().toSeq
    assert(served === Seq((9L, 3L, 1L, 0.3333, Some(1.5))),
      s"zeta OOV, alpha rank 1 + beta rank 2 → mean 1.5: $served")
    val batchForm = graft.llm.TextOps.oovStats(probe,
        graft.llm.TextOps.vocabulary(
          spark.read.parquet(s"$tmp/out/kept").select("doc_id", "text"), 2)
          .select("word", "rank"))
      .as[(Long, Long, Long, Double, Option[Double])].collect().toSeq
    assert(served === batchForm)
    // compaction folds the partials; vocabulary unchanged
    graft.streaming.DedupStream.compact(spark, s"$tmp/index")
    val vocab2 = graft.streaming.DedupStream
      .corpusVocabulary(spark, s"$tmp/index", 2)
      .as[(String, Long)].collect().toSeq
    assert(vocab2 === vocab)
  }

  test("the wordcounts side serves the unigram-LM screen (t19 streaming)") {
    val tmp = Files.createTempDirectory("graft_nll_stream").toString
    graft.streaming.DedupStream.admitBatch(
      Seq((1L, "alpha beta alpha"), (2L, "beta gamma delta"))
        .toDF("doc_id", "text"),
      0L, s"$tmp/index", s"$tmp/out", 0.5, "l1")
    val screened = graft.streaming.DedupStream.screenNll(spark, s"$tmp/index",
      Seq((10L, "alpha beta"), (11L, "zz yy xx")).toDF("doc_id", "text"))
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._5)).toMap
    // the known-words probe has zero OOV; the gibberish probe is all-OOV
    // and scores strictly higher under the admitted corpus's model
    assert(screened(10L)._2 === 0L)
    assert(screened(11L)._2 === 3L)
    assert(screened(11L)._3 > screened(10L)._3)
    // hand model over the ADMITTED corpus (alpha 2, beta 2, gamma 1,
    // delta 1 → N=6, V=4, denom=11): the streaming screen must land on
    // the independently computed Laplace numbers, not merely on itself
    def nll(num: Long): Long = math.round(-math.log(num.toDouble / 11) * 10000.0)
    val wantKnown = nll(3) + nll(3)           // alpha, beta at (n+1)=3
    val wantOov = 3 * nll(1)                  // three unseen words
    val avgOf = (s: Long, n: Long) => math.round(s.toDouble / n / 10000.0 * 10000) / 10000.0
    assert(screened(10L) === ((2L, 0L, avgOf(wantKnown, 2))),
      s"known-words probe: ${screened(10L)} vs hand $wantKnown")
    assert(screened(11L) === ((3L, 3L, avgOf(wantOov, 3))))
  }

  test("the bigramcounts side serves the conditional LM screen (t19d streaming)") {
    val tmp = Files.createTempDirectory("graft_bigram_stream").toString
    graft.streaming.DedupStream.admitBatch(
      Seq((1L, "alpha beta alpha"), (2L, "beta gamma delta"))
        .toDF("doc_id", "text"),
      0L, s"$tmp/index", s"$tmp/out", 0.5, "l1")
    def screen() = graft.streaming.DedupStream.screenBigramNll(spark,
      s"$tmp/index",
      Seq((10L, "alpha beta"), (11L, "beta delta")).toDF("doc_id", "text"))
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // hand model over the ADMITTED corpus: uni alpha:2 beta:2 gamma:1
    // delta:1 (N=6, V=4); bigrams (alpha,beta) (beta,alpha) (beta,gamma)
    // (gamma,delta) each once. The screen must land on independently
    // computed Laplace numbers — order sensitivity included: "beta delta"
    // is a plausible BAG of words but an unseen TRANSITION
    def nll(p: Double): Long = math.round(-math.log(p) * 10000.0)
    val want10 = (2L, 0L, nll(3.0 / 11) + nll(2.0 / 7))   // seen bigram
    val want11 = (2L, 0L, nll(3.0 / 11) + nll(1.0 / 7))   // unseen bigram
    val first = screen()
    assert(first(10L) === want10, s"${first(10L)} vs hand $want10")
    assert(first(11L) === want11)
    assert(first(11L)._3 > first(10L)._3,
      "the order-sensitive screen must penalize the unseen transition")
    // compaction folds the per-batch partials; the screen is unchanged
    graft.streaming.DedupStream.compact(spark, s"$tmp/index")
    assert(screen() === first)
  }

  test("the imagehashes side serves the image near-dup screen (m4d streaming)") {
    import graft.llm.MultimodalOps
    val tmp = Files.createTempDirectory("graft_img_stream").toString
    // the fixture images depend only on text LENGTH: len 30 and 41 enter
    // the corpus fingerprint side at admission (pixels decode here, once).
    // The media envelope (source column) is what opts a batch into the
    // imagehashes side — text-only admissions skip the decode entirely.
    graft.streaming.DedupStream.admitBatch(
      Seq((1L, "src", "a" * 30), (2L, "src", "b" * 41))
        .toDF("doc_id", "source", "text"),
      0L, s"$tmp/index", s"$tmp/out", 0.5, "l1")
    def screen(probe: org.apache.spark.sql.DataFrame) =
      graft.streaming.DedupStream.screenImageNearDups(spark, s"$tmp/index",
        MultimodalOps.asMediaTable(probe))
        .as[(Long, Long, Long)].collect().toSeq
    val probe = Seq((10L, "src", "c" * 30), (11L, "src", "d" * 57))
      .toDF("doc_id", "source", "text")
    val hits = screen(probe)
    // the same-length probe is an IDENTICAL image: flagged at Hamming 0
    // against the corpus copy, with the corpus member as id_a
    assert(hits.contains((1L, 10L, 0L)), s"got $hits")
    // every reported pair has the increment member on the b side
    assert(hits.forall(_._2 >= 10L), s"got $hits")
    // orientation holds for NON-MONOTONE ids too: a corpus doc with a
    // HIGHER id than the probe still rides as id_a (the d5 lesson)
    graft.streaming.DedupStream.admitBatch(
      Seq((501L, "src", "e" * 33)).toDF("doc_id", "source", "text"),
      1L, s"$tmp/index", s"$tmp/out", 0.5, "l1")
    val low = screen(Seq((3L, "src", "f" * 33)).toDF("doc_id", "source", "text"))
    assert(low.contains((501L, 3L, 0L)), s"got $low")
    // REPLAY self-exclusion: admit two docs with IDENTICAL images (same
    // length, disjoint text so the text screen keeps both), then screen
    // the same two docs again — their fingerprints already sit in the
    // corpus side, so without self-exclusion the pair would surface in
    // BOTH orientations via the corpus leg; with it, exactly once,
    // (min, max)-oriented
    graft.streaming.DedupStream.admitBatch(
      Seq((6L, "src", "x" * 35), (7L, "src", "y" * 35))
        .toDF("doc_id", "source", "text"),
      2L, s"$tmp/index", s"$tmp/out", 0.5, "l1")
    val replay = screen(
      Seq((6L, "src", "x" * 35), (7L, "src", "y" * 35))
        .toDF("doc_id", "source", "text"))
    assert(replay.count(r => Set(r._1, r._2) == Set(6L, 7L)) === 1, s"got $replay")
    assert(replay.contains((6L, 7L, 0L)), s"got $replay")
    // compaction folds the per-batch dirs; the screen is unchanged
    graft.streaming.DedupStream.compact(spark, s"$tmp/index")
    assert(screen(probe) === hits)
    graft.llm.DedupOps.releaseCaches()
  }

  test("the audiohashes side serves the exact-audio screen (m5c streaming)") {
    val tmp = Files.createTempDirectory("graft_audio_stream").toString
    // the fixture audio depends only on text LENGTH: len 30 and 41 enter
    // the corpus hash side at admission (samples decode here, once); the
    // media envelope (source column) opts the batch into the side
    graft.streaming.DedupStream.admitBatch(
      Seq((1L, "src", "a" * 30), (2L, "src", "b" * 41))
        .toDF("doc_id", "source", "text"),
      0L, s"$tmp/index", s"$tmp/out", 0.5, "l1")
    def screen(probe: org.apache.spark.sql.DataFrame) =
      graft.streaming.DedupStream.screenAudioDups(spark, s"$tmp/index", probe)
        .as[(Long, Long)].collect().toSeq
    val probe = Seq((10L, "src", "c" * 30), (11L, "src", "d" * 57))
      .toDF("doc_id", "source", "text")
    val hits = screen(probe)
    // the same-length probe is an IDENTICAL clip: flagged against the
    // corpus copy with the corpus member as id_a
    assert(hits.contains((1L, 10L)), s"got $hits")
    assert(hits.forall(_._2 >= 10L), s"got $hits")
    // non-monotone orientation (the d5/m4d lesson)
    graft.streaming.DedupStream.admitBatch(
      Seq((501L, "src", "e" * 33)).toDF("doc_id", "source", "text"),
      1L, s"$tmp/index", s"$tmp/out", 0.5, "l1")
    val low = screen(Seq((3L, "src", "f" * 33)).toDF("doc_id", "source", "text"))
    assert(low.contains((501L, 3L)), s"got $low")
    // REPLAY self-exclusion: re-screening two already-admitted docs with
    // identical clips surfaces their internal pair exactly once,
    // (min, max)-oriented — never twice via the corpus leg
    graft.streaming.DedupStream.admitBatch(
      Seq((6L, "src", "x" * 35), (7L, "src", "y" * 35))
        .toDF("doc_id", "source", "text"),
      2L, s"$tmp/index", s"$tmp/out", 0.5, "l1")
    val replay = screen(
      Seq((6L, "src", "x" * 35), (7L, "src", "y" * 35))
        .toDF("doc_id", "source", "text"))
    assert(replay.count(r => Set(r._1, r._2) == Set(6L, 7L)) === 1, s"got $replay")
    assert(replay.contains((6L, 7L)), s"got $replay")
    // compaction folds the per-batch dirs (identity fold); screen unchanged
    graft.streaming.DedupStream.compact(spark, s"$tmp/index")
    assert(screen(probe) === hits)
    // the served side IS the admitted corpus's fingerprints
    val served = graft.streaming.DedupStream
      .corpusAudioHashes(spark, s"$tmp/index")
      .select("doc_id", "pcm_hash").as[(Long, Long)].collect().toSet
    val direct = graft.llm.MultimodalOps.decodeAudioMeta(spark,
      graft.llm.MultimodalOps.asAudioTable(
        spark.read.parquet(s"$tmp/out/kept").select("doc_id", "text")))
      .toDF().select("doc_id", "pcm_hash").as[(Long, Long)].collect().toSet
    assert(served === direct)
    graft.llm.DedupOps.releaseCaches()
  }

  test("the audiofps side serves the perceptual audio screen (m5f streaming)") {
    val tmp = Files.createTempDirectory("graft_audiofp_stream").toString
    // same decode-once fixture rule as the m5c test: the WAV depends only
    // on text LENGTH, so a same-length probe is an IDENTICAL clip
    // (acoustic Hamming 0); the media envelope opts the batch in, and the
    // audiofps side is written off the SAME combined decode as the
    // audiohashes side (one parse, two projections)
    graft.streaming.DedupStream.admitBatch(
      Seq((1L, "src", "a" * 30), (2L, "src", "b" * 41))
        .toDF("doc_id", "source", "text"),
      0L, s"$tmp/index", s"$tmp/out", 0.5, "l1")
    def screen(probe: org.apache.spark.sql.DataFrame) =
      graft.streaming.DedupStream.screenAudioNearDups(spark, s"$tmp/index", probe)
        .as[(Long, Long, Long)].collect().toSeq
    val probe = Seq((10L, "src", "c" * 30), (11L, "src", "d" * 57))
      .toDF("doc_id", "source", "text")
    val hits = screen(probe)
    assert(hits.contains((1L, 10L, 0L)), s"got $hits")
    assert(hits.forall(_._2 >= 10L), s"got $hits")
    // non-monotone orientation (the d5/m4d lesson)
    graft.streaming.DedupStream.admitBatch(
      Seq((501L, "src", "e" * 33)).toDF("doc_id", "source", "text"),
      1L, s"$tmp/index", s"$tmp/out", 0.5, "l1")
    val low = screen(Seq((3L, "src", "f" * 33)).toDF("doc_id", "source", "text"))
    assert(low.contains((501L, 3L, 0L)), s"got $low")
    // REPLAY self-exclusion: the already-admitted pair's internal match
    // surfaces exactly once, (min, max)-oriented
    graft.streaming.DedupStream.admitBatch(
      Seq((6L, "src", "x" * 35), (7L, "src", "y" * 35))
        .toDF("doc_id", "source", "text"),
      2L, s"$tmp/index", s"$tmp/out", 0.5, "l1")
    val replay = screen(
      Seq((6L, "src", "x" * 35), (7L, "src", "y" * 35))
        .toDF("doc_id", "source", "text"))
    assert(replay.count(r => Set(r._1, r._2) == Set(6L, 7L)) === 1, s"got $replay")
    assert(replay.contains((6L, 7L, 0L)), s"got $replay")
    // compaction folds the per-batch dirs (identity fold); screen unchanged
    graft.streaming.DedupStream.compact(spark, s"$tmp/index")
    assert(screen(probe) === hits)
    // the served side IS the admitted corpus's acoustic prints
    val served = graft.streaming.DedupStream
      .corpusAudioFps(spark, s"$tmp/index")
      .select("doc_id", "h_hi", "h_lo").as[(Long, Long, Long)].collect().toSet
    val direct = graft.llm.MultimodalOps.audioFingerprintFrame(
      graft.llm.MultimodalOps.asAudioTable(
        spark.read.parquet(s"$tmp/out/kept").select("doc_id", "text")))
      .select("doc_id", "h_hi", "h_lo").as[(Long, Long, Long)].collect().toSet
    assert(served === direct)
    graft.llm.DedupOps.releaseCaches()
  }

  test("the videohashes side serves the keyframe screen (m7c streaming)") {
    val tmp = Files.createTempDirectory("graft_video_stream").toString
    // VIDEO ids only (doc_id % 4 == 0): the media envelope opts the
    // batch in, and the keyframe prints land on the twelfth side off the
    // SAME media-table materialization as the image side; the fixture
    // AVI depends only on text LENGTH, so a same-length probe is an
    // identical clip (keyframe Hamming 0)
    graft.streaming.DedupStream.admitBatch(
      Seq((4L, "src", "a" * 30), (8L, "src", "b" * 41))
        .toDF("doc_id", "source", "text"),
      0L, s"$tmp/index", s"$tmp/out", 0.5, "l1")
    def screen(probe: org.apache.spark.sql.DataFrame) =
      graft.streaming.DedupStream.screenVideoNearDups(spark, s"$tmp/index", probe)
        .as[(Long, Long, Long)].collect().toSeq
    val probe = Seq((12L, "src", "c" * 30), (16L, "src", "d" * 57))
      .toDF("doc_id", "source", "text")
    val hits = screen(probe)
    assert(hits.contains((4L, 12L, 0L)), s"got $hits")
    assert(hits.forall(_._2 >= 12L), s"got $hits")
    // non-monotone orientation (the d5/m4d lesson)
    graft.streaming.DedupStream.admitBatch(
      Seq((500L, "src", "e" * 33)).toDF("doc_id", "source", "text"),
      1L, s"$tmp/index", s"$tmp/out", 0.5, "l1")
    val low = screen(Seq((20L, "src", "f" * 33)).toDF("doc_id", "source", "text"))
    assert(low.contains((500L, 20L, 0L)), s"got $low")
    // REPLAY self-exclusion: the already-admitted pair's internal match
    // surfaces exactly once, (min, max)-oriented
    graft.streaming.DedupStream.admitBatch(
      Seq((24L, "src", "x" * 35), (28L, "src", "y" * 35))
        .toDF("doc_id", "source", "text"),
      2L, s"$tmp/index", s"$tmp/out", 0.5, "l1")
    val replay = screen(
      Seq((24L, "src", "x" * 35), (28L, "src", "y" * 35))
        .toDF("doc_id", "source", "text"))
    assert(replay.count(r => Set(r._1, r._2) == Set(24L, 28L)) === 1, s"got $replay")
    assert(replay.contains((24L, 28L, 0L)), s"got $replay")
    // compaction folds the per-batch dirs (identity fold); screen unchanged
    graft.streaming.DedupStream.compact(spark, s"$tmp/index")
    assert(screen(probe) === hits)
    // the served side IS the admitted corpus's keyframe prints
    val served = graft.streaming.DedupStream
      .corpusVideoHashes(spark, s"$tmp/index")
      .select("doc_id", "h_hi", "h_lo").as[(Long, Long, Long)].collect().toSet
    val direct = graft.llm.MultimodalOps.videoKeyframeHashes(
      graft.llm.MultimodalOps.asMediaTable(
        spark.read.parquet(s"$tmp/out/kept").select("doc_id", "source", "text")))
      .select("doc_id", "h_hi", "h_lo").as[(Long, Long, Long)].collect().toSet
    assert(served === direct)
    graft.llm.DedupOps.releaseCaches()
  }

  test("the framehashes side serves the shot-level screen (m3c streaming)") {
    val tmp = Files.createTempDirectory("graft_frame_stream").toString
    // VIDEO ids; a same-length probe is an identical clip, so EVERY
    // sampled ordinal matches at Hamming 0; the side is written off the
    // same frame decode whose ordinal-0 projection is the keyframe side
    graft.streaming.DedupStream.admitBatch(
      Seq((4L, "src", "a" * 30), (8L, "src", "b" * 41))
        .toDF("doc_id", "source", "text"),
      0L, s"$tmp/index", s"$tmp/out", 0.5, "l1")
    def screen(probe: org.apache.spark.sql.DataFrame) =
      graft.streaming.DedupStream.screenFrameNearDups(spark, s"$tmp/index", probe)
        .as[(Long, Long, Long, Long)].collect().toSeq
    val probe = Seq((12L, "src", "c" * 30), (16L, "src", "d" * 57))
      .toDF("doc_id", "source", "text")
    val hits = screen(probe)
    assert(hits.count(r => r._1 == 4L && r._2 == 12L && r._4 == 0L) === 4,
      s"identical clips match on every sampled ordinal: $hits")
    assert(hits.forall(_._2 >= 12L), s"got $hits")
    // non-monotone orientation (the d5/m4d lesson)
    graft.streaming.DedupStream.admitBatch(
      Seq((500L, "src", "e" * 33)).toDF("doc_id", "source", "text"),
      1L, s"$tmp/index", s"$tmp/out", 0.5, "l1")
    val low = screen(Seq((20L, "src", "f" * 33)).toDF("doc_id", "source", "text"))
    assert(low.exists(r => r._1 == 500L && r._2 == 20L && r._4 == 0L), s"got $low")
    // REPLAY self-exclusion: internal pairs once, (min, max)-oriented
    graft.streaming.DedupStream.admitBatch(
      Seq((24L, "src", "x" * 35), (28L, "src", "y" * 35))
        .toDF("doc_id", "source", "text"),
      2L, s"$tmp/index", s"$tmp/out", 0.5, "l1")
    val replay = screen(
      Seq((24L, "src", "x" * 35), (28L, "src", "y" * 35))
        .toDF("doc_id", "source", "text"))
    assert(replay.filter(r => Set(r._1, r._2) == Set(24L, 28L))
      .forall(r => r._1 == 24L && r._2 == 28L), s"got $replay")
    assert(replay.count(r => r._1 == 24L && r._2 == 28L && r._3 == 0L) === 1,
      s"ordinal 0 pair surfaces once: $replay")
    // compaction folds the per-batch dirs (identity fold); screen unchanged
    graft.streaming.DedupStream.compact(spark, s"$tmp/index")
    assert(screen(probe) === hits)
    // the served side IS the admitted corpus's frame prints, and the
    // keyframe side is exactly its ordinal-0 projection (one decode
    // wrote both)
    val frames = graft.streaming.DedupStream
      .corpusFrameHashes(spark, s"$tmp/index")
    val direct = graft.llm.MultimodalOps.sampleFrames(spark,
      graft.llm.MultimodalOps.asMediaTable(
        spark.read.parquet(s"$tmp/out/kept").select("doc_id", "source", "text")))
      .toDF()
    assert(frames.select("doc_id", "frame_idx", "h_hi", "h_lo")
      .as[(Long, Long, Long, Long)].collect().toSet ===
      direct.select("doc_id", "frame_idx", "h_hi", "h_lo")
        .as[(Long, Long, Long, Long)].collect().toSet)
    val kf = graft.streaming.DedupStream
      .corpusVideoHashes(spark, s"$tmp/index")
      .select("doc_id", "h_hi", "h_lo").as[(Long, Long, Long)].collect().toSet
    val kfDirect = graft.llm.MultimodalOps.keyframeOf(direct)
      .select("doc_id", "h_hi", "h_lo").as[(Long, Long, Long)].collect().toSet
    assert(kf === kfDirect)
    graft.llm.DedupOps.releaseCaches()
  }

  test("the winnowfps side serves the sketch pair screen (t21d streaming)") {
    val tmp = Files.createTempDirectory("graft_winnow_stream").toString
    val sharedA = (1 to 12).map(i => s"z$i").mkString(" ")
    val sharedB = (1 to 12).map(i => s"y$i").mkString(" ")
    // corpus doc 1 carries sharedA; doc 2 is unrelated — both admit, and
    // their sketches enter the ninth side (one hash evaluation shared
    // with the seed side)
    graft.streaming.DedupStream.admitBatch(
      Seq((1L, "front matter words then " + sharedA),
        (2L, "a completely different document about catalyst plans today"))
        .toDF("doc_id", "text"),
      0L, s"$tmp/index", s"$tmp/out", 0.5, "l1")
    def screen(probe: org.apache.spark.sql.DataFrame) =
      graft.streaming.DedupStream.screenWinnow(spark, s"$tmp/index", probe,
        minShared = 1)
        .as[(Long, Long, Long)].collect().toSeq
    val probe = Seq((10L, sharedA + " closing bits"),
      (11L, "nothing in common with anything admitted so far at all"))
      .toDF("doc_id", "text")
    val hits = screen(probe)
    // the ≥ k+w−1-word shared span forces a shared fingerprint: the
    // corpus member rides as id_a, the increment as id_b
    assert(hits.exists(r => r._1 === 1L && r._2 === 10L), s"got $hits")
    assert(hits.forall(_._2 >= 10L), s"got $hits")
    // non-monotone ids: a corpus doc with a HIGHER id than the probe
    // still rides as id_a (the d5/m4d orientation lesson)
    val sharedC = (1 to 12).map(i => s"q$i").mkString(" ")
    graft.streaming.DedupStream.admitBatch(
      Seq((501L, "lead tokens before " + sharedC)).toDF("doc_id", "text"),
      1L, s"$tmp/index", s"$tmp/out", 0.5, "l1")
    val low = screen(Seq((3L, sharedC + " trailing words here"))
      .toDF("doc_id", "text"))
    assert(low.exists(r => r._1 === 501L && r._2 === 3L), s"got $low")
    // REPLAY self-exclusion: admit two docs sharing sharedB but with
    // enough disjoint padding that the near-dup screen keeps both
    // (Jaccard ≈ 0.2), then screen the SAME two docs again — their
    // sketches already sit in the side, so without id-level
    // self-exclusion the internal pair would surface in both
    // orientations via the corpus leg; with it, exactly once
    val six = (1 to 20).map(i => s"a$i").mkString(" ") + " " + sharedB
    val seven = (1 to 20).map(i => s"b$i").mkString(" ") + " " + sharedB
    graft.streaming.DedupStream.admitBatch(
      Seq((6L, six), (7L, seven)).toDF("doc_id", "text"),
      2L, s"$tmp/index", s"$tmp/out", 0.5, "l1")
    assert(spark.read.parquet(s"$tmp/out/kept").filter(col("doc_id").isin(6L, 7L))
      .count() === 2L, "fixture sanity: the text screen must keep both")
    val replay = screen(Seq((6L, six), (7L, seven)).toDF("doc_id", "text"))
    assert(replay.count(r => Set(r._1, r._2) == Set(6L, 7L)) === 1, s"got $replay")
    assert(replay.exists(r => r._1 === 6L && r._2 === 7L), s"got $replay")
    // compaction folds the per-batch dirs (identity fold); the screen is
    // unchanged
    graft.streaming.DedupStream.compact(spark, s"$tmp/index")
    assert(screen(probe) === hits)
    // the served side IS the admitted corpus's sketch: fold-equal to
    // winnowing the kept output directly
    val served = graft.streaming.DedupStream.corpusWinnowFps(spark, s"$tmp/index")
      .as[(Long, Long)].collect().toSet
    val direct = graft.llm.DedupOps.winnowFingerprints(
      spark.read.parquet(s"$tmp/out/kept").select("doc_id", "text"))
      .as[(Long, Long)].collect().toSet
    assert(served === direct)
    graft.llm.DedupOps.releaseCaches()
  }

  test("the bloom side serves the exact-dup pre-screen and folds on compact (d10 streaming)") {
    val tmp = Files.createTempDirectory("graft_bloom_stream").toString
    val a = "the quick brown fox jumps over the lazy dog near the river bank today"
    val b = "completely different words about spark catalyst optimizer plans and shuffles everywhere"
    val c = "a third unique document with its own vocabulary of rare tokens entirely"
    graft.streaming.DedupStream.admitBatch(
      Seq((1L, a), (2L, b)).toDF("doc_id", "text"),
      0L, s"$tmp/index", s"$tmp/out", 0.5, "l1")
    // doc 3 duplicates 1 (rejected) — its text is in the filter anyway via
    // doc 1; doc 4 admits and must enter the filter
    graft.streaming.DedupStream.admitBatch(
      Seq((3L, a), (4L, c)).toDF("doc_id", "text"),
      1L, s"$tmp/index", s"$tmp/out", 0.5, "l1")
    def screen(): Map[Long, Boolean] = graft.streaming.DedupStream
      .screenExact(spark, s"$tmp/index",
        Seq((10L, a), (11L, b), (12L, c),
          (13L, "an entirely novel probe document that matches nothing admitted"))
          .toDF("doc_id", "text"))
      .as[(Long, Boolean)].collect().toMap
    val verdicts = screen()
    assert(verdicts === Map(10L -> true, 11L -> true, 12L -> true, 13L -> false),
      s"admitted texts flag, novel text passes: $verdicts")
    // the served OR-of-partials IS the admitted corpus's filter
    val served = graft.streaming.DedupStream.corpusBloom(spark, s"$tmp/index")
    val direct = graft.llm.DedupOps.bloomBuild(
      spark.read.parquet(s"$tmp/out/kept").select("doc_id", "text"))
    assert(java.util.Arrays.equals(served, direct))
    // a same-lineage replay overwrites its own partial: bits unchanged
    graft.streaming.DedupStream.admitBatch(
      Seq((3L, a), (4L, c)).toDF("doc_id", "text"),
      1L, s"$tmp/index", s"$tmp/out", 0.5, "l1")
    assert(java.util.Arrays.equals(
      graft.streaming.DedupStream.corpusBloom(spark, s"$tmp/index"), served))
    // compaction folds the partials into one consolidated row; serving and
    // screening are invariant
    graft.streaming.DedupStream.compact(spark, s"$tmp/index")
    assert(java.util.Arrays.equals(
      graft.streaming.DedupStream.corpusBloom(spark, s"$tmp/index"), served))
    assert(screen() === verdicts)
    val live = graft.streaming.DedupStream.liveRoot(spark, s"$tmp/index")
    val rows = spark.read.parquet(s"$live/bloom")
    assert(rows.count() <= 2, "compacted row + at most the carried latest dir")
  }

  test("a custom bloom geometry is stamped on first admission and survives compaction (d10 config)") {
    import graft.llm.DedupOps.BloomSizing
    val tmp = Files.createTempDirectory("graft_bloom_conf").toString
    val sizing = BloomSizing.forCapacity(5000, 0.005)
    assert(sizing !== BloomSizing.Default)
    val a = "configured geometry document one with many distinctive words inside"
    val b = "another admitted document carrying its own unique vocabulary entirely"
    graft.streaming.DedupStream.admitBatch(
      Seq((1L, a)).toDF("doc_id", "text"),
      0L, s"$tmp/index", s"$tmp/out", 0.5, "l1", sizing)
    // the stamp is readable and the partials carry the custom byte length
    assert(graft.streaming.DedupStream.bloomSizingAt(spark, s"$tmp/index") === sizing)
    assert(graft.streaming.DedupStream.corpusBloom(spark, s"$tmp/index").length
      === sizing.bytes)
    // a later admission with a CONTRADICTING sizing fails loudly...
    val clash = intercept[IllegalArgumentException] {
      graft.streaming.DedupStream.admitBatch(
        Seq((2L, b)).toDF("doc_id", "text"),
        1L, s"$tmp/index", s"$tmp/out", 0.5, "l1",
        BloomSizing.forCapacity(99, 0.1))
    }
    assert(clash.getMessage.contains("geometry"))
    // the clash failed BEFORE any side write: nothing of the rejected
    // batch landed, so no half-admitted state exists to replay over
    assert(!new java.io.File(s"$tmp/index/shingles/batch=l1-1").exists(),
      "a geometry clash must leave the index untouched")
    // ...while the parameterless default defers to the stamp
    graft.streaming.DedupStream.admitBatch(
      Seq((2L, b)).toDF("doc_id", "text"),
      1L, s"$tmp/index", s"$tmp/out", 0.5, "l1")
    def screen(): Map[Long, Boolean] = graft.streaming.DedupStream
      .screenExact(spark, s"$tmp/index",
        Seq((10L, a), (11L, b), (12L, "a wholly novel probe text"))
          .toDF("doc_id", "text"))
      .as[(Long, Boolean)].collect().toMap
    val verdicts = screen()
    assert(verdicts === Map(10L -> true, 11L -> true, 12L -> false))
    // compaction folds at the stamped geometry and carries the stamp
    graft.streaming.DedupStream.compact(spark, s"$tmp/index")
    assert(graft.streaming.DedupStream.bloomSizingAt(spark, s"$tmp/index") === sizing)
    assert(screen() === verdicts)
    // an ADMISSION with the same geometry but a different design point
    // INHERITS the stamp (equal-geometry partials OR regardless of the
    // warning threshold; the admission path never rewrites a stamp)
    graft.streaming.DedupStream.admitBatch(
      Seq((3L, "a threshold-divergent admission with fresh words entirely"))
        .toDF("doc_id", "text"),
      2L, s"$tmp/index", s"$tmp/out", 0.5, "l1", sizing.copy(designFpr = 0.001))
    assert(graft.streaming.DedupStream.bloomSizingAt(spark, s"$tmp/index") === sizing,
      "admission must inherit the stamp, never silently re-stamp")
    // RETARGET is the explicit maintenance call: a NEW stamp VERSION
    // (never an in-place overwrite — readers always resolve a complete
    // stamp), one row written, index data untouched
    val retargeted = graft.streaming.DedupStream
      .retargetBloomFpr(spark, s"$tmp/index", 0.001)
    assert(retargeted === sizing.copy(designFpr = 0.001))
    assert(graft.streaming.DedupStream.bloomSizingAt(spark, s"$tmp/index") === retargeted)
    assert(screen() === verdicts, "retargeting must not disturb the filter")
    // ...and the next admission under the old config inherits the NEW
    // threshold instead of silently reverting it
    graft.streaming.DedupStream.admitBatch(
      Seq((4L, "an admission after the retarget with novel words too"))
        .toDF("doc_id", "text"),
      3L, s"$tmp/index", s"$tmp/out", 0.5, "l1", sizing)
    assert(graft.streaming.DedupStream.bloomSizingAt(spark, s"$tmp/index") === retargeted)
    // the versioned stamp survives a compaction (carried into the tree)
    graft.streaming.DedupStream.compact(spark, s"$tmp/index")
    assert(graft.streaming.DedupStream.bloomSizingAt(spark, s"$tmp/index") === retargeted)
    assert(screen() === verdicts)
    // retargeting an index with no stamp at all is refused, not fabricated
    val none = intercept[IllegalArgumentException](graft.streaming.DedupStream
      .retargetBloomFpr(spark, s"$tmp/nowhere", 0.01))
    assert(none.getMessage.contains("no readable Bloom stamp"))
  }

  test("a sharded bloom geometry builds, serves and compacts per shard (d10b streaming)") {
    import graft.llm.DedupOps
    import graft.llm.DedupOps.BloomSizing
    val tmp = Files.createTempDirectory("graft_bloom_sharded").toString
    val sizing = BloomSizing(1 << 12, 3, shards = 2)
    val texts = (0 until 8).map(i => s"sharded streaming doc $i words ${i * 13}")
    graft.streaming.DedupStream.admitBatch(
      texts.take(4).zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"),
      0L, s"$tmp/index", s"$tmp/out", 0.5, "l1", sizing)
    graft.streaming.DedupStream.admitBatch(
      texts.drop(4).zipWithIndex.map { case (t, i) => ((i + 4).toLong, t) }
        .toDF("doc_id", "text"),
      1L, s"$tmp/index", s"$tmp/out", 0.5, "l1", sizing)
    // the stamp carries the shard count; the single-filter accessor
    // refuses a sharded index instead of serving a wrong fold
    assert(graft.streaming.DedupStream.bloomSizingAt(spark, s"$tmp/index") === sizing)
    val refuse = intercept[IllegalArgumentException](
      graft.streaming.DedupStream.corpusBloom(spark, s"$tmp/index"))
    assert(refuse.getMessage.contains("sharded"))
    val shards = graft.streaming.DedupStream.corpusBloomShards(spark, s"$tmp/index")
    assert(shards.length === 2 && shards.forall(_.length === sizing.bytes))
    // the served shards equal a direct sharded build over the kept docs —
    // keys actually went to their ROUTED shard, not one overloaded filter
    val direct = DedupOps.bloomBuildSharded(
      spark.read.parquet(s"$tmp/out/kept").select("doc_id", "text"), sizing)
    assert(shards.zip(direct).forall { case (a, b) => java.util.Arrays.equals(a, b) })
    def screen(): Map[Long, Boolean] = graft.streaming.DedupStream
      .screenExact(spark, s"$tmp/index",
        (texts.take(2).zipWithIndex.map { case (t, i) => ((100 + i).toLong, t) } :+
          (199L -> "a wholly novel probe never admitted")).toDF("doc_id", "text"))
      .as[(Long, Boolean)].collect().toMap
    val verdicts = screen()
    assert(verdicts === Map(100L -> true, 101L -> true, 199L -> false))
    // per-shard partials survive the compaction fold
    graft.streaming.DedupStream.compact(spark, s"$tmp/index")
    assert(graft.streaming.DedupStream.bloomSizingAt(spark, s"$tmp/index") === sizing)
    assert(screen() === verdicts)
    val after = graft.streaming.DedupStream.corpusBloomShards(spark, s"$tmp/index")
    assert(after.zip(direct).forall { case (a, b) => java.util.Arrays.equals(a, b) })
  }

  test("a crash-emptied bloom stamp reads as absent and re-stamps on replay") {
    import graft.llm.DedupOps.BloomSizing
    val tmp = Files.createTempDirectory("graft_bloom_crash").toString
    // simulate a death mid-stamp: the conf dir exists with no data files
    new java.io.File(s"$tmp/index/bloomconf").mkdirs()
    assert(graft.streaming.DedupStream.bloomSizingAt(spark, s"$tmp/index")
      === BloomSizing.Default, "an empty stamp dir must read as absent")
    val sizing = BloomSizing.forCapacity(500, 0.02)
    graft.streaming.DedupStream.admitBatch(
      Seq((1L, "replayed first admission after a crashed stamp"))
        .toDF("doc_id", "text"),
      0L, s"$tmp/index", s"$tmp/out", 0.5, "l1", sizing)
    assert(graft.streaming.DedupStream.bloomSizingAt(spark, s"$tmp/index") === sizing,
      "the replayed admission must re-stamp, outranking the crashed dir")
    // a stamp-less index that already carries partials is LEGACY: a
    // non-default admit must fail on its own batch (batch 0 of the
    // contradiction), never stamp-then-crash one batch later
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(s"$tmp/index")).toSeq
      .filter(_.getPath.getName.startsWith("bloomconf"))
      .foreach(st => fs.delete(st.getPath, true))
    val boom = intercept[IllegalArgumentException] {
      graft.streaming.DedupStream.admitBatch(
        Seq((2L, "a second admission against the legacy-looking index"))
          .toDF("doc_id", "text"),
        1L, s"$tmp/index", s"$tmp/out", 0.5, "l1",
        BloomSizing.forCapacity(99, 0.1))
    }
    assert(boom.getMessage.contains("predates"))
  }

  test("a corrupt bloom stamp version is skipped; the previous stamp keeps serving") {
    import graft.llm.DedupOps.BloomSizing
    val tmp = Files.createTempDirectory("graft_bloom_corrupt").toString
    val sizing = BloomSizing.forCapacity(500, 0.02)
    graft.streaming.DedupStream.admitBatch(
      Seq((1L, "first admission stamps version zero")).toDF("doc_id", "text"),
      0L, s"$tmp/index", s"$tmp/out", 0.5, "l1", sizing)
    assert(graft.streaming.DedupStream.bloomSizingAt(spark, s"$tmp/index") === sizing)
    // a non-atomic copy leaves a TRUNCATED parquet in a higher version:
    // resolution must fall through to the readable v0, not throw on every
    // admit/serve path until manual cleanup — but LOUDLY: the corrupt dir
    // OUTRANKS what it serves (a retarget it recorded is not in effect),
    // so the skip warns, rate-limited to once per (index, dir) per
    // process like the drift warning
    val bad = new java.io.File(s"$tmp/index/bloomconf-1")
    bad.mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$tmp/index/bloomconf-1/part-00000.parquet"),
      "not a parquet footer".getBytes)
    val captured = new java.io.ByteArrayOutputStream()
    val realErr = System.err
    System.setErr(new java.io.PrintStream(captured, true))
    try {
      assert(graft.streaming.DedupStream.bloomSizingAt(spark, s"$tmp/index") === sizing,
        "the corrupt higher version must be skipped, serving the v0 stamp")
      assert(graft.streaming.DedupStream.bloomSizingAt(spark, s"$tmp/index") === sizing)
    } finally System.setErr(realErr)
    assert("corrupt Bloom stamp dir bloomconf-1".r
      .findAllIn(captured.toString).size === 1,
      s"the outranking-corrupt skip must warn exactly once — got:\n$captured")
    // the admission path keeps working against the surviving stamp
    graft.streaming.DedupStream.admitBatch(
      Seq((2L, "second admission under the surviving stamp resolution"))
        .toDF("doc_id", "text"),
      1L, s"$tmp/index", s"$tmp/out", 0.5, "l1", sizing)
    val screen = graft.streaming.DedupStream.screenExact(spark, s"$tmp/index",
      Seq((1L, "first admission stamps version zero")).toDF("doc_id", "text"))
    assert(screen.filter(col("maybe_dup")).count() === 1L)
    // but a corrupt SOLE stamp must fail LOUDLY, never silently resolve
    // Default: the index demonstrably had a stamped geometry, and serving
    // Default hash positions against its partials would turn the
    // no-false-negative screen into silent misses
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$tmp/index/bloomconf"), true)
    val boom = intercept[IllegalStateException] {
      graft.streaming.DedupStream.bloomSizingAt(spark, s"$tmp/index")
    }
    assert(boom.getMessage.contains("corrupt stamp"), boom.getMessage)
  }

  test("bloom drift warning emits once per (index, shard, stamp version)") {
    import graft.llm.DedupOps.BloomSizing
    val tmp = Files.createTempDirectory("graft_bloom_ratelimit").toString
    // a filter sized for 8 docs takes 120 → far past its design point
    val sizing = BloomSizing.forCapacity(8, 0.02)
    graft.streaming.DedupStream.admitBatch(
      (0 until 120).map(i => (i.toLong, s"overfull document number $i rambling"))
        .toDF("doc_id", "text"),
      0L, s"$tmp/index", s"$tmp/out", 0.5, "l1", sizing)
    val probe = Seq((999L, "a probe that is definitely new")).toDF("doc_id", "text")
    val captured = new java.io.ByteArrayOutputStream()
    val realErr = System.err
    System.setErr(new java.io.PrintStream(captured, true))
    try {
      graft.streaming.DedupStream.screenExact(spark, s"$tmp/index", probe).count()
      graft.streaming.DedupStream.screenExact(spark, s"$tmp/index", probe).count()
      graft.streaming.DedupStream.screenExact(spark, s"$tmp/index", probe).count()
    } finally System.setErr(realErr)
    val hits = "\\[DedupStream\\] shard".r.findAllIn(captured.toString).size
    assert(hits === 1,
      s"the drift warning must fire once per stamp version, not per call — got $hits")
    // a retarget bumps the stamp version and re-arms the warning
    graft.streaming.DedupStream.retargetBloomFpr(spark, s"$tmp/index", 0.019)
    val captured2 = new java.io.ByteArrayOutputStream()
    System.setErr(new java.io.PrintStream(captured2, true))
    try graft.streaming.DedupStream.screenExact(spark, s"$tmp/index", probe).count()
    finally System.setErr(realErr)
    assert("\\[DedupStream\\] shard".r.findAllIn(captured2.toString).size === 1,
      "a new stamp version must re-arm the (rate-limited) warning")
  }

  test("span screening never aggregates the corpus seed table (O(increment) plan gate)") {
    val tmp = Files.createTempDirectory("graft_seedgate").toString
    val shared = (0 until 12).map(i => s"tok$i").mkString(" ")
    graft.streaming.DedupStream.admitBatch(
      Seq((1L, s"$shared unique tail for document alpha entirely"))
        .toDF("doc_id", "text"),
      0L, s"$tmp/index", s"$tmp/out", 0.5, "l1")
    val probe = Seq((9L, s"lead words then $shared and then divergence"))
      .toDF("doc_id", "text")
    val screen = graft.streaming.DedupStream.screenSpans(spark, s"$tmp/index", probe)
    // The O(increment) contract in plan form: every Aggregate that reads
    // the corpus-side seed or seed-stats scan must sit ABOVE a join that
    // pruned it to increment-matched rows first. The round-7 shape
    // (corpusSeeds ∪ newSeeds → groupBy kh) aggregated the corpus scan
    // directly and fails this gate.
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan}
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    def corpusScanNoJoin(p: LogicalPlan): Boolean = p match {
      case _: Join => false
      case l: LogicalRelation => l.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.exists { rp =>
          rp.toString.contains("/seeds") || rp.toString.contains("/seedstats")
        }
        case _ => false
      }
      case other => other.children.exists(corpusScanNoJoin)
    }
    val offending = screen.queryExecution.optimizedPlan.collect {
      case a: Aggregate if corpusScanNoJoin(a.child) => a
    }
    assert(offending.isEmpty,
      s"corpus-sized aggregation in the screening plan:\n${offending.mkString("\n")}")
    // and the screen still finds the span through the maintained stats
    val spans = screen.as[(Long, Long, Long, Long, Long)].collect().toSeq
    graft.llm.DedupOps.releaseCaches()
    assert(spans === Seq((1L, 9L, 0L, 3L, 12L)))
  }

  test("a new doc with a LOWER id than its corpus near-dup is rejected (D5 non-monotone ids)") {
    // Streaming ingest does not guarantee monotone doc_ids (late arrivals,
    // multi-source ids). Round 6 filtered candidates on id_a < id_b, so a
    // new doc sorting BELOW its corpus twin produced no pair and slipped in.
    val tmp = Files.createTempDirectory("graft_dedup_order").toString
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val other = "completely different words about spark catalyst optimizer plans and shuffles everywhere"
    graft.streaming.DedupStream.admitBatch(
      Seq((50L, base)).toDF("doc_id", "text"),
      0L, s"$tmp/index", s"$tmp/out", 0.5, "l1")
    // doc 10 duplicates corpus doc 50 (10 < 50); doc 60 is unique
    graft.streaming.DedupStream.admitBatch(
      Seq((10L, base), (60L, other)).toDF("doc_id", "text"),
      0L, s"$tmp/index", s"$tmp/out", 0.5, "l2")
    val kept = spark.read.parquet(s"$tmp/out/kept")
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(50L, 60L), "doc 10 must be rejected despite its lower id")
    val dups = spark.read.parquet(s"$tmp/out/dups")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(dups === Set((50L, 10L)), "corpus member is the keeper id_a")
    val indexed = spark.read.parquet(s"$tmp/index/shingles")
      .select("doc_id").as[Long].collect().toSet
    assert(indexed === Set(50L, 60L))
  }

  test("an increment merging two existing groups rewrites only their buckets (d7 streaming)") {
    val tmp = Files.createTempDirectory("graft_group_stream").toString
    // Texts engineered (and pre-verified against the exact md5 hash
    // pipeline) so j(A,B)=0.459 < 0.5 — two SEPARATE groups — while the
    // bridge C has j(C,A)=0.730 and j(C,B)=0.641, with 2 resp. 1 LSH band
    // collisions: deterministic candidates at the default threshold.
    val s = "alpha bravo charlie delta echo foxtrot golf hotel india juliett " +
      "kilo lima mike november oscar papa quebec romeo sierra"
    val pa = "apple banana cherry date elderberry fig grape honeydew kiwi lemon"
    val pb = "zinc yttrium xenon tungsten silver radium platinum osmium nickel mercury"
    val textA = s"$s $pa"
    val textB = s"$s $pb"
    val bridge = s"$s $pa $pb"
    val textD = "unrelated vocabulary entirely about streaming group maintenance tests"
    graft.streaming.DedupStream.admitBatch(
      Seq((100L, textA), (200L, textB), (300L, textD)).toDF("doc_id", "text"),
      0L, s"$tmp/index", s"$tmp/out", 0.5, "g1")
    val g0 = graft.streaming.DedupStream.corpusGroups(spark, s"$tmp/index")
      .as[(Long, Long)].collect().toMap
    assert(g0 === Map(100L -> 100L, 200L -> 200L, 300L -> 300L),
      "three singleton groups before the increment")

    def groupFiles(): Map[String, Array[Byte]] = {
      import scala.jdk.CollectionConverters._
      val root = java.nio.file.Paths.get(s"$tmp/index/groups")
      val w = Files.walk(root)
      try w.iterator().asScala.toList
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .map(p => root.relativize(p).toString -> Files.readAllBytes(p)).toMap
      finally w.close()
    }
    val before = groupFiles()

    // the bridge is rejected (dup of both 100 and 200) but its pairs merge
    // the two groups transitively — exactly d6 over the full history
    graft.streaming.DedupStream.admitBatch(
      Seq((400L, bridge)).toDF("doc_id", "text"),
      1L, s"$tmp/index", s"$tmp/out", 0.5, "g1")
    val g1 = graft.streaming.DedupStream.corpusGroups(spark, s"$tmp/index")
      .as[(Long, Long)].collect().toMap
    assert(g1 === Map(100L -> 100L, 200L -> 100L, 300L -> 300L, 400L -> 100L))
    val kept = spark.read.parquet(s"$tmp/out/kept")
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(100L, 200L, 300L), "the bridge itself is not admitted")

    // only the buckets holding MOVED rows (200 remapped, 400 new) may be
    // rewritten; doc 100 (group unchanged) and doc 300 (untouched group)
    // keep byte-identical files unless they share one of those buckets
    val after = groupFiles()
    val movedBuckets = Seq(200L, 400L).toDF("doc_id")
      .select(pmod(hash(col("doc_id")), lit(32)).cast("int")).as[Int].collect().toSet
    val changed = before.keySet.union(after.keySet).filter { p =>
      !before.get(p).zip(after.get(p)).exists { case (b, a) => java.util.Arrays.equals(b, a) }
    }
    val changedBuckets = changed.map(p =>
      "_b=(\\d+)".r.findFirstMatchIn(p).get.group(1).toInt)
    assert(changedBuckets === movedBuckets,
      s"rewritten buckets $changedBuckets must be exactly the moved rows' buckets $movedBuckets")

    // keeper election served from the maintained store (d6b streaming):
    // within the merged {100, 200, 400} group the best quality wins — a
    // pure query-time view, so a different quality model re-elects
    // without touching the store
    val quality = Seq((100L, 0.3), (200L, 0.9), (300L, 0.5), (400L, 0.7))
      .toDF("doc_id", "quality_score")
    val elected = graft.streaming.DedupStream
      .electKeepers(spark, s"$tmp/index", quality)
      .as[(Long, Long, Double, Boolean)].collect().toSeq
    assert(elected.filter(_._4).map(_._1) === Seq(200L, 300L))
  }

  test("compaction folds index batch dirs mid-stream; admissions and verdicts unchanged (D5 compaction)") {
    val tmp = Files.createTempDirectory("graft_dedup_compact").toString
    implicit val sqlCtx = spark.sqlContext
    def doc(i: Long) = (i, s"document number $i carries words w${i}a w${i}b w${i}c " +
      s"w${i}d w${i}e w${i}f plus shared filler tokens")
    val stream = MemoryStream[(Long, String)]
    val q = graft.streaming.DedupStream.start(
      stream.toDF().toDF("doc_id", "text"), s"$tmp/index", s"$tmp/out", s"$tmp/ckpt")
    try {
      // 10 microbatches: docs 1..10, with batch 4 re-sending doc 2's text
      // as doc 42 (a cross-batch dup) — verdicts exist pre-compaction
      (1L to 10L).foreach { i =>
        stream.addData(doc(i))
        if (i == 4L) stream.addData((42L, doc(2L)._2))
        q.processAllAvailable()
      }
      val keptBefore = spark.read.parquet(s"$tmp/out/kept")
        .select("doc_id").as[Long].collect().toSet
      val shBefore = graft.streaming.DedupStream.corpusShingles(spark, s"$tmp/index")
        .select("doc_id").as[Long].collect().toSet
      assert(keptBefore === (1L to 10L).toSet)
      assert(shBefore === (1L to 10L).toSet)

      // compact between triggers, stream still live
      graft.streaming.DedupStream.compact(spark, s"$tmp/index")
      // sides live inside the published generation tree after a compact —
      // resolve the live root each time (the flat pre-compaction layout
      // and every superseded tree are retained one publication, so a
      // stale path would still read, but the CURRENT state is the tree's)
      def batchDirs(side: String): Set[String] = {
        import scala.jdk.CollectionConverters._
        val root = graft.streaming.DedupStream.liveRoot(spark, s"$tmp/index")
        val st = Files.list(java.nio.file.Paths.get(s"$root/$side"))
        try st.iterator().asScala.map(_.getFileName.toString)
          .filter(_.startsWith("batch=")).toSet
        finally st.close()
      }
      // everything folds except the latest batch per lineage — the one
      // dir a checkpoint replay can still address
      val dirs1 = batchDirs("shingles")
      assert(dirs1.contains("batch=compacted"), s"$dirs1")
      assert(dirs1.size === 2, s"compacted + the latest replayable dir: $dirs1")
      assert(batchDirs("bands") === dirs1)
      assert(graft.streaming.DedupStream.corpusShingles(spark, s"$tmp/index")
        .select("doc_id").as[Long].collect().toSet === shBefore,
        "compaction must not change the corpus")

      // post-compaction: a dup of a PRE-compaction doc is still rejected,
      // uniques still admit, groups still maintained
      stream.addData((101L, doc(3L)._2), doc(77L))
      q.processAllAvailable()
      val keptAfter = spark.read.parquet(s"$tmp/out/kept")
        .select("doc_id").as[Long].collect().toSet
      assert(keptAfter === (1L to 10L).toSet + 77L, "101 duplicates compacted doc 3")
      val dupPair = spark.read.parquet(s"$tmp/out/dups")
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(dupPair.contains((3L, 101L)))
      assert(dupPair.contains((2L, 42L)), "pre-compaction verdicts untouched")
      val groups = graft.streaming.DedupStream.corpusGroups(spark, s"$tmp/index")
        .as[(Long, Long)].collect().toMap
      assert(groups(42L) === 2L && groups(101L) === 3L && groups(77L) === 77L)
      // second compaction folds the post-compaction appends too; the
      // carried dir advances to the new latest batch
      graft.streaming.DedupStream.compact(spark, s"$tmp/index")
      val dirs2 = batchDirs("shingles")
      assert(dirs2.contains("batch=compacted") && dirs2.size === 2, s"$dirs2")
      assert(dirs2 !== dirs1, "the carried latest dir must advance")
      assert(graft.streaming.DedupStream.corpusShingles(spark, s"$tmp/index")
        .select("doc_id").as[Long].collect().toSet === shBefore + 77L)
    } finally q.stop()
  }

  test("a reader that resolved the pre-compaction tree scans intact files through the swap (reader-on-previous retention)") {
    val tmp = Files.createTempDirectory("graft_dedup_retain").toString
    def doc(i: Long) = (i, s"document $i carries words w${i}a w${i}b w${i}c " +
      s"w${i}d w${i}e plus shared filler tokens")
    def admit(i: Long, batchId: Long, lineage: String): Unit =
      graft.streaming.DedupStream.admitBatch(
        Seq(doc(i)).toDF("doc_id", "text"),
        batchId, s"$tmp/index", s"$tmp/out", 0.5, lineage)
    admit(1L, 0L, "l1"); admit(2L, 1L, "l1"); admit(3L, 0L, "l2")
    val all = Set(1L, 2L, 3L)
    // a reader resolves the FLAT pre-compaction layout; its parquet file
    // listing is captured at DataFrame creation, so the compaction swap
    // must leave those exact files intact for the scan to complete
    val flatReader = graft.streaming.DedupStream.corpusShingles(spark, s"$tmp/index")
    assert(graft.streaming.DedupStream.liveRoot(spark, s"$tmp/index")
      === s"$tmp/index", "pre-compaction layout is flat")
    graft.streaming.DedupStream.compact(spark, s"$tmp/index")
    val root1 = graft.streaming.DedupStream.liveRoot(spark, s"$tmp/index")
    assert(root1.endsWith("/tree-1"), s"first compaction publishes tree-1: $root1")
    // the in-flight flat reader completes AFTER the swap — the flat sides
    // are retained one publication, not reclaimed at migration
    assert(flatReader.select("doc_id").as[Long].collect().toSet === all,
      "reader on the flat layout lost files to the migration")
    // a reader pinned to tree-1, then another admission + a second
    // compaction publishing tree-2
    val tree1Reader = graft.streaming.DedupStream.corpusShingles(spark, root1)
    admit(4L, 1L, "l2")
    graft.streaming.DedupStream.compact(spark, s"$tmp/index")
    assert(graft.streaming.DedupStream.liveRoot(spark, s"$tmp/index")
      .endsWith("/tree-2"))
    // the second publication reclaims the flat legacy sides…
    assert(!Files.exists(java.nio.file.Paths.get(s"$tmp/index/shingles")),
      "flat sides reclaimed after one further publication")
    // …but retains tree-1, so the in-flight tree-1 reader completes (its
    // listing predates doc 4's append — exactly the original tree)
    assert(tree1Reader.select("doc_id").as[Long].collect().toSet === all,
      "reader on the superseded tree lost files to the swap")
    // a third compaction evicts tree-1: the window is one generation deep
    admit(5L, 2L, "l2")
    graft.streaming.DedupStream.compact(spark, s"$tmp/index")
    assert(!Files.exists(java.nio.file.Paths.get(s"$tmp/index/tree-1")))
    assert(graft.streaming.DedupStream.corpusShingles(spark, s"$tmp/index")
      .select("doc_id").as[Long].collect().toSet === all + 4L + 5L,
      "the live corpus is complete across migrations")
    // an IDLE re-compaction (nothing new to fold — every side holds only
    // its consolidation + carried replay dirs) must be a no-op: churning
    // out a fresh generation anyway would advance the eviction window
    // under a cron'd compaction loop and evict a slow reader's tree
    val rootBefore = graft.streaming.DedupStream.liveRoot(spark, s"$tmp/index")
    graft.streaming.DedupStream.compact(spark, s"$tmp/index")
    assert(graft.streaming.DedupStream.liveRoot(spark, s"$tmp/index") === rootBefore,
      "idle compaction published a new generation")
  }

  test("a new benchmark screens the admitted corpus from the index alone (d8 streaming)") {
    val tmp = Files.createTempDirectory("graft_screen").toString
    graft.streaming.DedupStream.admitBatch(
      Seq(
        (1L, "models memorize the capital of france is paris when it leaks into training"),
        (2L, "a clean document about distributed query planning and shuffles")
      ).toDF("doc_id", "text"),
      0L, s"$tmp/index", s"$tmp/out", 0.5, "s1")
    // eval set released AFTER admission — corpus text is never re-read
    val bench = Seq((9000L, "question: the capital of france is what"))
      .toDF("doc_id", "text")
    val hits = graft.streaming.DedupStream.screenBenchmark(
      spark, s"$tmp/index", bench)
      .select("doc_id", "bench_id").as[(Long, Long)].collect().toSet
    assert(hits === Set((1L, 9000L)), "doc 1 shares 'the capital of' / 'capital of france'")
  }

  test("admission verdicts served from the index match the batch c2 composition") {
    val tmp = Files.createTempDirectory("graft_verdicts").toString
    val span = (1 to 10).map(i => s"s$i").mkString(" ")
    graft.streaming.DedupStream.admitBatch(
      Seq(
        (1L, "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"),
        (2L, (1 to 20).map(i => s"c$i").mkString(" ") + " " + span + " " +
          (21 to 40).map(i => s"c$i").mkString(" "))
      ).toDF("doc_id", "text"),
      0L, s"$tmp/index", s"$tmp/out", 0.5, "v1")
    graft.llm.DedupOps.releaseCaches()
    val bench = Seq((50L, "alpha beta gamma delta benchmark probe words here"))
      .toDF("doc_id", "text")
    val increment = Seq(
      (401L, "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo zulu"),
      (402L, (1 to 15).map(i => s"x$i").mkString(" ") + " " + span + " " +
        (16 to 30).map(i => s"x$i").mkString(" ")),
      (403L, "noise one two three alpha beta gamma delta more noise tail"),
      (404L, "tiny junk words"),
      (405L, (1 to 60).map(i => s"the w$i").mkString(" "))).toDF("doc_id", "text")
    // embedding tier (c2b): a SERVED IVF index over the corpus vectors;
    // increment vec 404 is a semantic twin of corpus vec 1 — textually
    // unrelated, so only the embedding screen can catch it, and
    // semantic_dup must outrank its low_quality verdict
    val corpusEmb = Seq(
      (1L, Array(1f, 0f, 0f, 0f)), (2L, Array(0f, 1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val incEmb = Seq(
      (401L, Array(0f, 0f, 1f, 0f)), (402L, Array(0f, 0f, 0f, 1f)),
      (403L, Array(0f, 0f, -1f, 0f)), (404L, Array(0.999f, 0.01f, 0f, 0f)),
      (405L, Array(0f, 0f, 0f, -1f))).toDF("vec_id", "embedding")
    val servedIndex = graft.llm.SimilarityOps.ivfBuild(corpusEmb, 2, 2)
    val semScreen = graft.llm.SimilarityOps.semanticScreen(
      servedIndex, incEmb, 0.9)
    // the streaming-served verdict: corpus text enters ONLY via the
    // maintained shingle/band/seed sides; vectors via the served cells
    val served = graft.streaming.DedupStream.admissionVerdicts(
      spark, s"$tmp/index", increment, bench, semPairs = Some(semScreen))
      .as[(Long, String, Option[Long], Double)].collect().toSeq
    graft.llm.DedupOps.releaseCaches()
    assert(served.map(r => (r._1, r._2, r._3)) === Seq(
      (401L, "near_dup", Some(1L)),
      (402L, "span_dup", Some(2L)),
      (403L, "contaminated", Some(50L)),
      (404L, "semantic_dup", Some(1L)),
      (405L, "admitted", None)))
    // parity with the batch composition over explicitly-built corpus state
    val corpus = spark.read.parquet(s"$tmp/out/kept").select("doc_id", "text")
    val corpusSh = graft.llm.DedupOps.shingleArrays(corpus)
    val batch = graft.llm.CurationOps.admitIncrement(increment,
        graft.llm.DedupOps.incrementalNearDups(
          graft.llm.DedupOps.shingleArrays(increment), corpusSh,
          graft.llm.DedupOps.bandIndex(
            graft.llm.DedupOps.signaturesFromShingleArrays(corpusSh)), 0.5),
        {
          val cs = graft.llm.DedupOps.positionalSeeds(corpus)
          graft.llm.DedupOps.incrementalSpans(
            increment, cs, graft.llm.DedupOps.seedStats(cs))
        },
        graft.llm.DedupOps.contaminationHits(increment, bench, 4, 1),
        semPairs = Some(graft.llm.SimilarityOps.semanticScreen(
          graft.llm.SimilarityOps.ivfBuild(corpusEmb, 2, 2), incEmb, 0.9)))
      .as[(Long, String, Option[Long], Double)].collect().toSeq
    graft.llm.DedupOps.releaseCaches()
    assert(served === batch)
    // without the embedding screen the same increment degrades to c2's
    // text-only verdict (404 back to low_quality) — the screen composes,
    // never replaces
    val textOnly = graft.streaming.DedupStream.admissionVerdicts(
      spark, s"$tmp/index", increment, bench)
      .as[(Long, String, Option[Long], Double)].collect().toSeq
    graft.llm.DedupOps.releaseCaches()
    assert(textOnly.map(r => (r._1, r._2)).toMap.get(404L) === Some("low_quality"))
  }

  test("windowed aggregation groups by event-time hour (W1 streaming)") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val windowed = IngestPipeline.windowedCounts(
      IngestPipeline.changeStream(stream.toDF()))
    val query = windowed.writeStream.format("memory").queryName("win_out")
      .trigger(Trigger.ProcessingTime("50 milliseconds"))
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(mkEvents(100))
      // advance the watermark far enough to close all windows
      stream.addData(Ev(10000L, 1700100000000000000L, 0L, "click", 0.0, "{}"))
      query.processAllAvailable()
      val rows = spark.table("win_out")
      assert(rows.count() > 0)
      assert(rows.agg(sum("n")).head().getLong(0) > 0)
    } finally query.stop()
  }
}
