package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.pipeline.{Bronze, Silver}
import graft.streaming.Streams

class StreamingSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("session windows: gap-exact event merges; beyond-gap event opens a new session") {
    import spark.implicits._
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:10:00")),   // same session
      (1L, ts("2024-01-01 10:40:00")),   // exactly 30min after prev → merges
      (1L, ts("2024-01-01 11:40:30")),   // > 30min after prev → NEW session
      (2L, ts("2024-01-01 09:00:00")))
      .toDF("user_id", "ts")
    val sessions = Streams.sessionCounts(df).collect()
    assert(sessions.length === 3)
    val u1 = sessions.filter(_.getAs[Long]("user_id") == 1L)
      .sortBy(_.getAs[Timestamp]("session_start").getTime)
    assert(u1(0).getAs[Long]("event_count") === 3)
    assert(u1(0).getAs[Timestamp]("session_end") === ts("2024-01-01 11:10:00"))
    assert(u1(1).getAs[Long]("event_count") === 1)
  }

  test("tumbling counts: same transform is streamable with a watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    mem.addData(
      (1L, ts("2024-01-01 10:05:00"), "click"),
      (2L, ts("2024-01-01 10:55:00"), "click"),
      (3L, ts("2024-01-01 11:05:00"), "view"))
    val streamed = Streams.tumblingCounts(
      mem.toDF.toDF("event_id", "ts", "event_type").withWatermark("ts", "2 hours"))
    Streams.toMemorySink(streamed, "tumbling_test", OutputMode.Complete())
    val rows = spark.sql("SELECT * FROM tumbling_test").collect()
    assert(rows.length === 2)
    val clicks = rows.find(_.getAs[String]("event_type") == "click").get
    assert(clicks.getAs[Long]("event_count") === 2)
    assert(clicks.getAs[Timestamp]("window_start") === ts("2024-01-01 10:00:00"))
  }

  test("sliding counts: event lands in exactly width/slide windows; stream agrees with batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    mem.addData((1L, ts("2024-01-01 10:05:00"), "click"))
    val streamed = Streams.slidingCounts(
      mem.toDF.toDF("event_id", "ts", "event_type").withWatermark("ts", "2 hours"))
    Streams.toMemorySink(streamed, "sliding_test", OutputMode.Complete())
    val rows = spark.sql("SELECT * FROM sliding_test").collect()
    assert(rows.length === 4, "1h window / 15min slide → 4 windows per event")
    val starts = rows.map(_.getAs[Timestamp]("window_start")).sortBy(_.getTime)
    assert(starts.head === ts("2024-01-01 09:15:00"))
    assert(starts.last === ts("2024-01-01 10:00:00"))
    // batch face of the same transform: total count mass = 4 × events
    val silver = Silver.cleanEvents(Bronze.ingestEvents(Tables.events(spark, sfDir)))
    val batch = Streams.slidingCounts(silver)
    assert(batch.agg(sum("event_count")).head().getLong(0) === 4 * silver.count())
  }

  test("batch and streaming tumbling counts agree on real events") {
    val silver = Silver.cleanEvents(Bronze.ingestEvents(Tables.events(spark, sfDir)))
    val batch = Streams.tumblingCounts(silver)
    assert(batch.agg(sum("event_count")).head().getLong(0) === silver.count())
  }

  test("parquet-source stream: watermarked tumbling counts over a real directory") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    Silver.cleanEvents(Bronze.ingestEvents(Tables.events(spark, sfDir)))
      .select("event_id", "ts", "event_type").write.mode("overwrite").parquet(dir)
    val streamed = Streams.tumblingCountsStream(spark, dir)
    Streams.toMemorySink(streamed, "tumbling_pq", OutputMode.Append())
    val n = spark.sql("SELECT sum(event_count) FROM tumbling_pq").head().getLong(0)
    // append mode emits only windows sealed by the watermark; with a 2h
    // watermark over 30 days of data, all but the tail hours are sealed
    assert(n > 0)
  }

  test("streaming dedup: dropDuplicatesWithinWatermark matches first-wins batch dedup") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dedup_stream").toString
    val raw = Tables.events(spark, sfDir).filter(col("event_id").isNotNull)
    raw.select("event_id", "ts", "user_id").write.mode("overwrite").parquet(dir)
    val streamed = Streams.dedupedStream(spark, dir)
    Streams.toMemorySink(streamed, "dedup_pq", OutputMode.Append())
    val streamedCount = spark.sql("SELECT count(*) FROM dedup_pq").head().getLong(0)
    val batchCount = Streams.firstEventPerKey(raw).count()
    // one surviving row per key either way (the single-batch stream sees
    // everything inside the watermark, so counts match exactly)
    assert(streamedCount === batchCount)
    assert(batchCount === raw.select("event_id").distinct().count())
  }

  test("streaming PSI drift monitor: drifted window alerts, stable window doesn't, matches batch face") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // baseline: uniform over [0, 10)
    val baseline = (0 until 1000).map(i => i % 100 / 10.0).toDF("value")
    val (lo, hi, pcts) = graft.monitoring.Monitoring.baselineHistogram(baseline, "value")
    assert(math.abs(pcts.sum - 1.0) < 1e-9 && pcts.forall(p => math.abs(p - 0.1) < 1e-3))
    // window 1 (10:00): same uniform shape → no alert
    // window 2 (12:00): everything piled into the top bin → alert
    val stable = (0 until 200).map(i => (i.toLong, ts("2024-01-01 10:30:00"), i % 100 / 10.0))
    val drifted = (0 until 200).map(i => (1000L + i, ts("2024-01-01 12:30:00"), 9.9))
    val mem = MemoryStream[(Long, Timestamp, Double)]
    mem.addData(stable ++ drifted: _*)
    // watermark-advancing tail event so both windows seal in append mode
    mem.addData((9999L, ts("2024-01-02 00:00:00"), 5.0))
    val events = mem.toDF.toDF("event_id", "ts", "value")
    val alerts = Streams.psiAlertStream(events, lo, hi, pcts)
    Streams.toMemorySink(alerts, "psi_stream", OutputMode.Append())
    val rows = spark.sql("SELECT * FROM psi_stream").collect()
      .map(r => r.getAs[Timestamp]("window_start") -> r).toMap
    val w1 = rows(ts("2024-01-01 10:00:00"))
    val w2 = rows(ts("2024-01-01 12:00:00"))
    assert(w1.getAs[Long]("n") === 200 && w2.getAs[Long]("n") === 200)
    assert(w1.getAs[Int]("drift_alert") === 0,
      s"stable window must not alert (psi=${w1.getAs[Double]("psi")})")
    assert(w1.getAs[Double]("psi") < 0.05)
    assert(w2.getAs[Int]("drift_alert") === 1,
      s"collapsed-distribution window must alert (psi=${w2.getAs[Double]("psi")})")
    // batch face on the same rows produces the same sealed-window numbers
    val batchDf = (stable ++ drifted).toDF("event_id", "ts", "value")
    val batch = Streams.psiAlertStream(batchDf, lo, hi, pcts).collect()
      .map(r => r.getAs[Timestamp]("window_start") -> r).toMap
    Seq(ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00")).foreach { w =>
      assert(batch(w).getAs[Double]("psi") === rows(w).getAs[Double]("psi"))
      assert(batch(w).getAs[Long]("n") === rows(w).getAs[Long]("n"))
    }
  }

  test("stream-stream attribution join: two watermarked streams, bounded state, matches batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    mem.addData(
      (1L, ts("2024-01-01 10:00:00"), 7L, "click", 0.0),
      (2L, ts("2024-01-01 10:30:00"), 7L, "purchase", 9.99), // within 1h of click 1
      (3L, ts("2024-01-01 12:00:00"), 7L, "purchase", 5.00), // beyond 1h → no match
      (4L, ts("2024-01-01 10:05:00"), 8L, "click", 0.0))     // other user → no match
    val events = mem.toDF
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .withWatermark("ts", "2 hours")
    val joined = Streams.attributionJoin(events)
    Streams.toMemorySink(joined, "attr_test", OutputMode.Append())
    val rows = spark.sql("SELECT * FROM attr_test").collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[Long]("click_id") === 1L)
    assert(rows.head.getAs[Long]("purchase_id") === 2L)
    assert(rows.head.getAs[Double]("purchase_value") === 9.99)
    // batch face on the same data agrees
    val batchDf = Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, "click", 0.0),
      (2L, ts("2024-01-01 10:30:00"), 7L, "purchase", 9.99),
      (3L, ts("2024-01-01 12:00:00"), 7L, "purchase", 5.00),
      (4L, ts("2024-01-01 10:05:00"), 8L, "click", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val batchRows = Streams.attributionJoin(batchDf).collect()
    assert(batchRows.length === 1 && batchRows.head.getAs[Long]("purchase_id") === 2L)
  }

  test("foreachBatch partitioned sink: full replay rewrites partitions, never duplicates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_fb").toString
    val mem = MemoryStream[(Long, String)]
    mem.addData((1L, "2024-01-01"), (2L, "2024-01-02"))
    val df = mem.toDF.toDF("event_id", "d")
      .withColumn("event_date", col("d").cast("date")).drop("d")
    Streams.toPartitionedSink(df, dir)
    assert(spark.read.parquet(dir).count() === 2)
    // a fresh uncheckpointed query re-delivers everything (at-least-once);
    // the dynamic overwrite must leave the sink unchanged, not doubled
    Streams.toPartitionedSink(df, dir)
    val after = spark.read.parquet(dir)
    assert(after.count() === 2, "replay must rewrite, not append")
    assert(after.select("event_date").distinct().count() === 2)
  }

  test("incremental dedup stream: two micro-batches equal the full batch LSH; replay is idempotent") {
    val root = java.nio.file.Files.createTempDirectory("graft_mi").toString
    val src = s"$root/src"
    val indexPath = s"$root/index"
    val pairsPath = s"$root/pairs"
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    // two source files → two micro-batches (maxFilesPerTrigger = 1)
    docs.filter(col("doc_id") % 2 === 0).coalesce(1)
      .write.mode("append").parquet(src)
    docs.filter(col("doc_id") % 2 =!= 0).coalesce(1)
      .write.mode("append").parquet(src)
    Streams.incrementalDedupStream(spark, src, indexPath, pairsPath,
      checkpoint = s"$root/ckpt")
    val streamedPairs = spark.read.parquet(pairsPath)
    assert(streamedPairs.select("batch_id").distinct().count() === 2,
      "AvailableNow + maxFilesPerTrigger=1 must process two micro-batches")
    // the union of per-batch pair partitions equals the one-shot batch
    // minhashLsh over the whole corpus — for ANY split into batches
    // (batch-1 pairs: internal; batch-2 pairs: internal + cross via index)
    val batchPairs = graft.dedup.Dedup.minhashLsh(docs)
    val streamed = streamedPairs.select("doc_a", "doc_b", "est_jaccard")
    assert(streamed.count() === batchPairs.count())
    assert(streamed.exceptAll(batchPairs).count() === 0)
    assert(batchPairs.exceptAll(streamed).count() === 0)
    // index accumulated both batches' signatures, exactly once per doc/band
    val index = spark.read.parquet(indexPath)
    assert(index.select("doc_id").distinct().count() === docs.count())
    // idempotent replay: re-running the LAST micro-batch (at-least-once
    // recovery) leaves both tables byte-identical — the stored index
    // excludes the batch's own partition when it joins, and the dynamic
    // overwrite rewrites rather than appends
    val indexBefore = index.collect().toSet
    // partition columns read back as int: cast before extracting
    val lastBatch = streamedPairs.agg(max(col("batch_id").cast("long")))
      .head().getLong(0)
    val lastDocs = index.filter(col("batch_id") === lastBatch)
      .select("doc_id").distinct()
      .join(docs, "doc_id")
    Streams.incrementalDedupBatch(lastDocs, lastBatch, indexPath, pairsPath)
    assert(spark.read.parquet(pairsPath)
      .select("doc_a", "doc_b", "est_jaccard")
      .exceptAll(batchPairs).count() === 0)
    assert(spark.read.parquet(pairsPath).count() === batchPairs.count())
    assert(spark.read.parquet(indexPath).collect().toSet === indexBefore)
  }

  test("CDF stream + maintained view: folds equal the from-scratch recompute; replays are no-ops") {
    import graft.sources.VersionedTable
    import graft.pipeline.Aggregates
    import spark.implicits._
    import java.sql.Timestamp
    val root = java.nio.file.Files.createTempDirectory("graft_cdf").toString
    val tbl = s"$root/fact"
    val viewP = s"$root/view"
    def ev(id: Long, hour: Int, tpe: String, zone: java.lang.Long, v: Double) =
      (id, Timestamp.valueOf(f"2026-03-01 $hour%02d:15:00"), tpe, zone, v)
    val cols = Seq("event_id", "ts", "event_type", "zone_id", "value")
    val day1 = Seq(ev(1, 9, "purchase", 10L, 19.99), ev(2, 9, "purchase", 10L, 0.01),
      ev(3, 17, "purchase", 11L, 5.50), ev(4, 9, "click", 10L, 0.0))
      .toDF(cols: _*)
    val day2 = Seq(ev(5, 9, "purchase", 10L, 100.00), ev(6, 23, "purchase", 12L, 7.77))
      .toDF(cols: _*)
    VersionedTable.commit(day1, tbl, mode = "overwrite", ts = "2026-03-01T00:00:00Z")
    VersionedTable.commit(day2, tbl, mode = "append", ts = "2026-03-02T00:00:00Z")
    // v2 = merge: update id 3's value (update pre+post in one view key)
    // and insert id 7 into the same key
    VersionedTable.merge(
      Seq(ev(3, 17, "purchase", 11L, 6.00), ev(7, 17, "purchase", 11L, 1.00)).toDF(cols: _*),
      tbl, keyCols = Seq("event_id"), ts = "2026-03-03T00:00:00Z")
    // v3 = delete id 5 — the CURRENT max of view key (10,9): only the
    // affected-key recompute path can restore max correctly (min/max are
    // not subtractable)
    VersionedTable.delete(spark, tbl, "event_id = 5", ts = "2026-03-04T00:00:00Z")
    Streams.maintainView(spark, tbl, viewP, checkpoint = s"$root/ckpt")
    def dump(state: org.apache.spark.sql.DataFrame) =
      Aggregates.revenueViewFromState(state)
        .orderBy("zone_id", "hour").collect().map(_.toSeq).toSeq
    val maintained = VersionedTable.readVersion(spark, viewP)
    val recomputed = Aggregates.revenueStateByZoneHour(VersionedTable.readVersion(spark, tbl))
    assert(dump(maintained) === dump(recomputed)) // bit-exact, the iv_ag standard
    assert(Aggregates.revenueViewFromState(maintained)
      .filter(col("zone_id") === 10 && col("hour") === 9)
      .select("max_value").head.getDouble(0) === 19.99)
    // one time-travelable view snapshot per source version
    val folds = VersionedTable.latestVersion(spark, viewP)
    assert(folds === 3L)
    // same checkpoint, nothing new committed → the stream finds no work
    Streams.maintainView(spark, tbl, viewP, checkpoint = s"$root/ckpt")
    assert(VersionedTable.latestVersion(spark, viewP) === folds)
    // FRESH checkpoint re-delivers every version (at-least-once): each
    // fold is skipped by its (appId, version) txn marker before any
    // write — the view is byte-identical, not re-folded
    Streams.maintainView(spark, tbl, viewP, checkpoint = s"$root/ckpt2")
    assert(VersionedTable.latestVersion(spark, viewP) === folds)
    assert(dump(VersionedTable.readVersion(spark, viewP)) === dump(recomputed))
    // a new commit + the original checkpoint: exactly the new version folds
    VersionedTable.commit(Seq(ev(8, 9, "purchase", 10L, 3.00)).toDF(cols: _*),
      tbl, mode = "append", ts = "2026-03-05T00:00:00Z")
    Streams.maintainView(spark, tbl, viewP, checkpoint = s"$root/ckpt")
    assert(VersionedTable.latestVersion(spark, viewP) === folds + 1)
    assert(dump(VersionedTable.readVersion(spark, viewP)) ===
      dump(Aggregates.revenueStateByZoneHour(VersionedTable.readVersion(spark, tbl))))
    // MERGE-ON-READ delete: no file-list diff at all — the change feed's
    // vector-diff branch must deliver the deleted rows so the maintained
    // view stays bit-exact with the recompute (the CDF×DV composition)
    VersionedTable.deleteMergeOnRead(spark, tbl, "event_id IN (2, 6)",
      ts = "2026-03-06T00:00:00Z")
    Streams.maintainView(spark, tbl, viewP, checkpoint = s"$root/ckpt")
    assert(VersionedTable.latestVersion(spark, viewP) === folds + 2)
    assert(dump(VersionedTable.readVersion(spark, viewP)) ===
      dump(Aggregates.revenueStateByZoneHour(VersionedTable.readVersion(spark, tbl))))
    // MERGE-ON-READ update: reaches the feed as a row-level DELETE
    // (pre-image) + INSERT (post-image) pair — the documented CDF shape,
    // never update_pre/postimage — and the fold must treat the pair
    // compositionally, staying bit-exact with the recompute
    val mu = VersionedTable.updateMergeOnRead(spark, tbl, "event_id = 3",
      Map("value" -> "9.00"), ts = "2026-03-07T00:00:00Z",
      maxVectoredFraction = 1.0)
    val pairTypes = VersionedTable.changes(spark, tbl, Seq("event_id"), mu - 1, mu)
      .select("_change_type").distinct().collect().map(_.getString(0)).toSet
    assert(pairTypes === Set("delete", "insert"),
      s"MoR update must surface as a delete+insert pair, got $pairTypes")
    Streams.maintainView(spark, tbl, viewP, checkpoint = s"$root/ckpt")
    assert(VersionedTable.latestVersion(spark, viewP) === folds + 3)
    assert(dump(VersionedTable.readVersion(spark, viewP)) ===
      dump(Aggregates.revenueStateByZoneHour(VersionedTable.readVersion(spark, tbl))))
  }

  test("fresh CDF consumer on an expireLog'd table bootstraps at the anchor as an insert feed") {
    import graft.sources.VersionedTable
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_cdfexp").toString
    val tbl = s"$root/t"
    VersionedTable.commit(Seq(0L).toDF("id"), tbl, mode = "overwrite",
      ts = "2026-01-01T00:00:00Z")
    (1 to 12).foreach { i =>
      VersionedTable.commit(Seq(i.toLong).toDF("id"), tbl, mode = "append",
        ts = f"2026-01-01T$i%02d:00:00Z")
    }
    // a delete AFTER the anchor so the retained tail isn't append-only
    VersionedTable.delete(spark, tbl, "id = 4", ts = "2026-01-01T23:00:00Z") // v13
    assert(VersionedTable.expireLog(spark, tbl, retainVersions = 3) > 0)
    assert(!VersionedTable.hasVersion(spark, tbl, 9L),
      "fixture must actually expire the anchor's predecessor")
    var first = -1L
    var firstTypes = Set.empty[String]
    var state = Set.empty[Long]
    // without the bootstrap branch this stream DIES on FileNotFound:
    // the first retained version v10 triggers changes(9, 10) and v9's
    // manifest is gone
    Streams.changesStream(spark, tbl, Seq("id"), s"$root/ckpt") { (feed, v) =>
      val rows = feed.select("id", "_change_type").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      if (first < 0) { first = v; firstTypes = rows.map(_._2).toSet }
      rows.foreach {
        case (id, "insert") => state += id
        case (id, "delete") => state -= id
        case _ => ()
      }
    }
    assert(first === 10L, s"bootstrap must start at the anchor version, got $first")
    assert(firstTypes === Set("insert"),
      s"the anchor must arrive as a pure insert feed, got $firstTypes")
    assert(state ===
      VersionedTable.readVersion(spark, tbl).collect().map(_.getLong(0)).toSet,
      "folding the bootstrapped feed must reproduce the head snapshot")
  }

  test("versioned sink: one snapshot per micro-batch, replay skipped before any write") {
    import graft.sources.VersionedTable
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_vs").toString
    val src = s"$root/src"
    val tbl = s"$root/table"
    // two source files → two micro-batches (maxFilesPerTrigger=1 via the
    // readStream below)
    (1L to 5L).toDF("id").coalesce(1).write.mode("append").parquet(src)
    (6L to 9L).toDF("id").coalesce(1).write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    def stream() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    Streams.toVersionedSink(stream(), tbl, appId = "spec-app")
    assert(VersionedTable.latestVersion(spark, tbl) === 1L,
      "two micro-batches must commit versions 0 and 1")
    assert(VersionedTable.readVersion(spark, tbl).collect()
      .map(_.getLong(0)).toSet === (1L to 9L).toSet)
    assert(VersionedTable.lastTxn(spark, tbl, "spec-app") === Some(1L))
    // each batch boundary is time-travelable: version 0 holds exactly one
    // of the two source files (batch order follows file listing)
    assert(Set(4L, 5L).contains(VersionedTable.readVersion(spark, tbl, 0L).count()))
    // uncheckpointed re-run re-delivers both batches (at-least-once);
    // both replays are skipped — same version count, same content, and
    // no orphaned data dirs (skip happens before any write)
    Streams.toVersionedSink(stream(), tbl, appId = "spec-app")
    assert(VersionedTable.latestVersion(spark, tbl) === 1L, "replay must not commit")
    assert(VersionedTable.readVersion(spark, tbl).count() === 9L)
    assert(VersionedTable.vacuum(spark, tbl, retainVersions = 2) === 0,
      "skipped replays must leave no orphaned data dirs")
    // a DIFFERENT app's stream appends independently
    Streams.toVersionedSink(stream(), tbl, appId = "other-app")
    assert(VersionedTable.latestVersion(spark, tbl) === 3L)
    assert(VersionedTable.readVersion(spark, tbl).count() === 18L)
  }

  test("stream-static enrich: dim joined per micro-batch, no state store, gaps kept") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((10L, "downtown"), (20L, "airport")).toDF("zone_id", "zone_name")
    val mem = MemoryStream[(Long, Long)]
    mem.addData((1L, 10L), (2L, 20L), (3L, 99L)) // 99 has no dim row
    val enriched = Streams.enrichWithDim(
      mem.toDF.toDF("event_id", "zone_id"), dim)
    Streams.toMemorySink(enriched, "enrich_test", OutputMode.Append())
    val rows = spark.sql("SELECT * FROM enrich_test").collect()
    assert(rows.length === 3, "left join must keep dim-less events")
    val byId = rows.map(r => r.getAs[Long]("event_id") -> r).toMap
    assert(byId(1L).getAs[String]("zone_name") === "downtown")
    assert(byId(3L).isNullAt(byId(3L).fieldIndex("zone_name")))
  }

  test("sessionize: events get gaps-and-islands session ordinals at event grain") {
    import spark.implicits._
    val df = Seq(
      (1L, 7L, ts("2024-01-01 10:00:00")),
      (2L, 7L, ts("2024-01-01 10:10:00")),   // same session
      (3L, 7L, ts("2024-01-01 11:30:00")),   // > 30 min gap → session 2
      (4L, 8L, ts("2024-01-01 09:00:00")))
      .toDF("event_id", "user_id", "ts")
    val out = Streams.sessionize(df).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("session_seq")).toMap
    assert(out(1L) === 1L && out(2L) === 1L)
    assert(out(3L) === 2L)
    assert(out(4L) === 1L)
  }

  test("outer attribution join: unconverted clicks emit null-padded after the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_outer").toString
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val events = mem.toDF
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .withWatermark("ts", "10 minutes")
    val joined = Streams.attributionJoinOuter(events)
    val query = joined.writeStream.format("memory").queryName("outer_test")
      .outputMode(OutputMode.Append()).option("checkpointLocation", ckpt).start()
    try {
      mem.addData(
        (1L, ts("2024-01-01 10:00:00"), 7L, "click", 0.0),    // converts
        (2L, ts("2024-01-01 10:30:00"), 7L, "purchase", 9.99),
        (3L, ts("2024-01-01 10:00:00"), 8L, "click", 0.0))    // never converts
      query.processAllAvailable()
      // push the watermark far past click 3's horizon, then drain timeouts
      mem.addData((4L, ts("2024-01-01 14:00:00"), 9L, "click", 0.0))
      query.processAllAvailable()
      mem.addData((5L, ts("2024-01-01 18:00:00"), 9L, "click", 0.0))
      query.processAllAvailable()
      val rows = spark.sql("SELECT * FROM outer_test").collect()
      val byClick = rows.map(r => r.getAs[Long]("click_id") -> r).toMap
      assert(byClick(1L).getAs[Long]("purchase_id") === 2L, "converted click joins")
      assert(byClick.contains(3L), "unconverted click must emit after the watermark")
      assert(byClick(3L).isNullAt(byClick(3L).fieldIndex("purchase_id")))
    } finally query.stop()
  }

  test("flatMapGroupsWithState: sessions finalize when the watermark passes the gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_fmgws").toString
    val mem = MemoryStream[(Long, Timestamp)]
    val sessions = Streams.finalizedSessions(spark, mem.toDS())
    val query = sessions.toDF().writeStream.format("memory").queryName("fin_test")
      .outputMode(OutputMode.Append()).option("checkpointLocation", ckpt).start()
    try {
      // batch 1: user 7 has a 2-event session; user 8 a 1-event session
      mem.addData((7L, ts("2024-01-01 10:00:00")), (7L, ts("2024-01-01 10:10:00")),
        (8L, ts("2024-01-01 10:00:00")))
      query.processAllAvailable()
      assert(spark.sql("SELECT * FROM fin_test").count() === 0,
        "open sessions must not emit before the watermark passes the gap")
      // batch 2 pushes the watermark to 12:00 — past both timeout stamps
      mem.addData((9L, ts("2024-01-01 12:00:00")))
      query.processAllAvailable()
      // batch 3 lets the timeouts fire against the advanced watermark
      mem.addData((9L, ts("2024-01-01 14:00:00")))
      query.processAllAvailable()
      val rows = spark.sql("SELECT * FROM fin_test").collect()
        .map(r => r.getAs[Long]("user_id") ->
          (r.getAs[Timestamp]("session_end"), r.getAs[Long]("event_count"))).toMap
      assert(rows.contains(7L) && rows.contains(8L), s"both sessions must finalize: $rows")
      assert(rows(7L) === (ts("2024-01-01 10:10:00"), 2L))
      assert(rows(8L) === (ts("2024-01-01 10:00:00"), 1L))
    } finally query.stop()
  }

  test("flatMapGroupsWithState: late events merge by gap distance, not arrival order") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_fmgws_late").toString
    val mem = MemoryStream[(Long, Timestamp)]
    // 4h watermark so batch-2 events hours behind the open session are
    // late-but-above-watermark (delivered, not dropped)
    val sessions = Streams.finalizedSessions(spark, mem.toDS(), watermark = "4 hours")
    val query = sessions.toDF().writeStream.format("memory").queryName("fin_late")
      .outputMode(OutputMode.Append()).option("checkpointLocation", ckpt).start()
    try {
      // batch 1: user 7's open session [10:00, 10:10]
      mem.addData((7L, ts("2024-01-01 10:00:00")), (7L, ts("2024-01-01 10:10:00")))
      query.processAllAvailable()
      // batch 2, both late: 08:00 is 120 min before the session start
      // (> 30 min gap — its OWN session, an arrival-order fold would have
      // glued it on because 08:00 - last < 0 <= gap); 09:45 is 15 min
      // before the start (<= gap — extends the session BACKWARD)
      mem.addData((7L, ts("2024-01-01 08:00:00")), (7L, ts("2024-01-01 09:45:00")))
      query.processAllAvailable()
      // batch 3, even later arrival: 08:10 must merge into the HELD 08:00
      // session (emission is watermark-final — nothing has emitted yet,
      // so no double-billing split), not found a third session
      mem.addData((7L, ts("2024-01-01 08:10:00")))
      query.processAllAvailable()
      assert(spark.sql("SELECT * FROM fin_late").count() === 0,
        "nothing may emit before the watermark passes a session's gap")
      // two batches to advance the watermark past 10:40 and drain timeouts
      mem.addData((9L, ts("2024-01-01 15:00:00")))
      query.processAllAvailable()
      mem.addData((9L, ts("2024-01-01 20:00:00")))
      query.processAllAvailable()
      val u7 = spark.sql("SELECT * FROM fin_late WHERE user_id = 7").collect()
        .map(r => (r.getAs[Timestamp]("session_start"), r.getAs[Timestamp]("session_end"),
          r.getAs[Long]("event_count"))).toSet
      assert(u7 === Set(
        (ts("2024-01-01 08:00:00"), ts("2024-01-01 08:10:00"), 2L),
        (ts("2024-01-01 09:45:00"), ts("2024-01-01 10:10:00"), 3L)),
        s"detached late events form their own watermark-held session: $u7")
    } finally query.stop()
  }

  test("mapGroupsWithState accumulates per-user counts across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val counts = Streams.runningUserCounts(spark, mem.toDS())
    val query = counts.writeStream.format("memory")
      .queryName("running_counts").outputMode(OutputMode.Update()).start()
    mem.addData((1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:01:00")))
    query.processAllAvailable()
    mem.addData((1L, ts("2024-01-01 10:02:00")))
    query.processAllAvailable()
    query.stop()
    val states = spark.sql("SELECT * FROM running_counts").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("events")))
    // second batch sees state from the first: 2 then 3
    assert(states.contains((1L, 2L)) && states.contains((1L, 3L)))
  }

  test("changesStream tails a LIVE table under a ProcessingTime trigger: commits land mid-stream") {
    import graft.sources.VersionedTable
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Files.createTempDirectory("graft_tail").toString
    val tbl = s"$root/fact"
    VersionedTable.commit(Seq((1L, 10L)).toDF("id", "v"), tbl,
      mode = "overwrite", ts = "2026-03-01T00:00:00Z")
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val q = Streams.changesStreamQuery(spark, tbl, Seq("id"), s"$root/ckpt",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds")) {
      (feed, v) => feed.count(); seen.add(v); ()
    }
    def await(cond: => Boolean, what: String): Unit = {
      val deadline = System.nanoTime() + 60L * 1000000000L
      while (!cond) {
        assert(System.nanoTime() < deadline, s"timed out waiting for $what; seen=$seen")
        Thread.sleep(100)
      }
    }
    try {
      await(seen.contains(0L), "initial version")
      // two commits arriving WHILE the tail runs — the parameterized
      // trigger's point: the long-lived shape needs no restart or copy
      // of the function to pick up new versions
      VersionedTable.commit(Seq((2L, 20L)).toDF("id", "v"), tbl,
        mode = "append", ts = "2026-03-02T00:00:00Z")
      await(seen.contains(1L), "first live commit")
      VersionedTable.commit(Seq((3L, 30L)).toDF("id", "v"), tbl,
        mode = "append", ts = "2026-03-03T00:00:00Z")
      await(seen.contains(2L), "second live commit")
    } finally q.stop()
    assert(seen.asScala.toSet === Set(0L, 1L, 2L))
  }

  test("versioned sink auto-compaction bounds the small-file count; replay accounting intact") {
    import graft.sources.VersionedTable
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_vac").toString
    val src = s"$root/src"
    val tbl = s"$root/table"
    (1 to 4).foreach { i =>
      ((i * 10L) to (i * 10L + 3L)).toDF("id").coalesce(1)
        .write.mode("append").parquet(src)
    }
    val schema = spark.read.parquet(src).schema
    def stream() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    // four micro-batches, compaction after every second COMMITTED batch
    Streams.toVersionedSink(stream(), tbl, appId = "vac-app", autoCompactEvery = 2)
    val expect = (1 to 4).flatMap(i => (i * 10L) to (i * 10L + 3L)).toSet
    assert(VersionedTable.readVersion(spark, tbl).collect()
      .map(_.getLong(0)).toSet === expect)
    // 4 data commits + 2 compactions = 6 versions; head file count is
    // BOUNDED (the last compaction folded everything before it)
    assert(VersionedTable.latestVersion(spark, tbl) === 5L)
    assert(VersionedTable.snapshotFiles(spark, tbl).size <= 2)
    val ops = VersionedTable.history(spark, tbl).orderBy("version")
      .select("op").collect().map(_.getString(0)).toSeq
    assert(ops.count(_ == "compact") === 2, s"ops: $ops")
    // replay: all four batches re-delivered, all skipped, NO fresh
    // compactions (compaction only follows a COMMITTED batch)
    Streams.toVersionedSink(stream(), tbl, appId = "vac-app", autoCompactEvery = 2)
    assert(VersionedTable.latestVersion(spark, tbl) === 5L)
    assert(VersionedTable.readVersion(spark, tbl).collect()
      .map(_.getLong(0)).toSet === expect)
  }
}
