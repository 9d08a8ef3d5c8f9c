package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

/** Hive-style partitioned versioned tables (reference:
  * src/ingestion/bronze_loader.py:56 `partition_by=["requested_date"]`,
  * src/ml/batch_scoring.py:173 `.partitionBy("event_date", "city")`).
  * The contract under test: partition columns are ordinary DATA columns
  * (duplicated into value directories, never removed from file
  * content), so every read/DML/maintenance path behaves identically to
  * an unpartitioned table — while file pruning on partition predicates
  * is EXACT because files are value-homogeneous. */
class PartitionedTableSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("vt_part").toString

  private def sales(rows: (Long, String, Long)*): DataFrame =
    rows.toDF("id", "city", "amount")

  private def contents(t: String, v: Long = -1L): Set[(Long, String, Long)] =
    VersionedTable.readVersion(spark, t, v)
      .select("id", "city", "amount").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  /** Every data file must live under a `p__city=<its own city>` dir and
    * contain exactly that city — the homogeneity invariant every write
    * path must preserve. */
  private def assertHomogeneous(t: String, pcol: String = "city"): Unit = {
    val dirRe = (".*/" + VersionedTable.PartDirPrefix + pcol + "=([^/]+)/[^/]+$").r
    VersionedTable.snapshotFiles(spark, t).foreach { f =>
      val dirVal = f match {
        case dirRe(v) => v
        case _ => fail(s"file $f not under a ${VersionedTable.PartDirPrefix}$pcol= directory")
      }
      val inFile = spark.read.parquet(s"$t/$f")
        .select(pcol).distinct().collect().map(_.getString(0)).toSeq
      assert(inFile === Seq(dirVal),
        s"file $f under $pcol=$dirVal holds values $inFile")
    }
  }

  test("partitioned commit: layout, content parity, pcols persisted") {
    val t = freshTable()
    VersionedTable.commit(
      sales((1, "ams", 10), (2, "nyc", 20), (3, "ams", 30), (4, "sfo", 40)),
      t, mode = "overwrite", partitionBy = Seq("city"))
    assert(VersionedTable.partitionColumnsOf(spark, t) === Seq("city"))
    assert(contents(t) === Set((1L, "ams", 10L), (2L, "nyc", 20L), (3L, "ams", 30L), (4L, "sfo", 40L)))
    assertHomogeneous(t)
    // the partition column stays IN the files: a direct parquet read of
    // one data file sees the full schema (the duplicate-dir-column
    // design, not Delta's dropped-column layout)
    val f0 = VersionedTable.snapshotFiles(spark, t).head
    assert(spark.read.parquet(s"$t/$f0").columns.toSet === Set("id", "city", "amount"))
  }

  test("append inherits partitioning; a conflicting declaration throws") {
    val t = freshTable()
    VersionedTable.commit(sales((1, "ams", 10)), t, mode = "overwrite",
      partitionBy = Seq("city"))
    // plain append — no restatement needed
    VersionedTable.commit(sales((2, "nyc", 20)), t, mode = "append")
    // restating the same partitioning is fine
    VersionedTable.commit(sales((3, "ams", 30)), t, mode = "append",
      partitionBy = Seq("city"))
    assertHomogeneous(t)
    assert(contents(t).size === 3)
    intercept[IllegalArgumentException] {
      VersionedTable.commit(sales((4, "sfo", 40)), t, mode = "append",
        partitionBy = Seq("amount"))
    }
    // complex-typed partition column rejected up front
    intercept[IllegalArgumentException] {
      VersionedTable.commit(
        Seq((1L, Seq("a"))).toDF("id", "tags"),
        freshTable(), mode = "overwrite", partitionBy = Seq("tags"))
    }
  }

  test("partition pruning is exact and manifest-only; readWhere ≡ filter") {
    val t = freshTable()
    // three appends so each city spans several files
    (0 until 3).foreach { i =>
      VersionedTable.commit(
        sales((i * 10 + 1, "ams", 10), (i * 10 + 2, "nyc", 20), (i * 10 + 3, "sfo", 30)),
        t, mode = if (i == 0) "overwrite" else "append",
        partitionBy = if (i == 0) Seq("city") else Seq.empty)
    }
    val all = VersionedTable.snapshotFiles(spark, t)
    val pruned = VersionedTable.prunedFiles(spark, t, "city = 'nyc'")
    assert(pruned.nonEmpty && pruned.size < all.size)
    // EXACT: every kept file is an nyc file — partition pruning, not
    // best-effort range pruning
    assert(pruned.forall(_.contains(s"${VersionedTable.PartDirPrefix}city=nyc")),
      s"pruned set kept a non-nyc file: $pruned")
    assert(all.count(_.contains(s"${VersionedTable.PartDirPrefix}city=nyc")) === pruned.size)
    val viaWhere = VersionedTable.readWhere(spark, t, "city = 'nyc'")
      .select("id").collect().map(_.getLong(0)).toSet
    val viaFilter = VersionedTable.readVersion(spark, t)
      .filter(col("city") === "nyc")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(viaWhere === viaFilter)
    // IN-list prunes to the union of the named partitions
    val inPruned = VersionedTable.prunedFiles(spark, t, "city IN ('ams', 'sfo')")
    assert(inPruned.forall(f =>
      f.contains(s"${VersionedTable.PartDirPrefix}city=ams") ||
        f.contains(s"${VersionedTable.PartDirPrefix}city=sfo")))
  }

  test("COW delete/update preserve homogeneity; update moves rows across partitions") {
    val t = freshTable()
    VersionedTable.commit(
      sales((1, "ams", 10), (2, "ams", 99), (3, "nyc", 20), (4, "sfo", 5)),
      t, mode = "overwrite", partitionBy = Seq("city"))
    VersionedTable.delete(spark, t, "amount = 99")
    assertHomogeneous(t)
    assert(contents(t).map(_._1) === Set(1L, 3L, 4L))
    // an UPDATE that changes the partition column must land the row in
    // its NEW value directory (no special casing: values ride in data)
    VersionedTable.update(spark, t, "id = 4", Map("city" -> "'ams'"))
    assertHomogeneous(t)
    assert(contents(t) === Set((1L, "ams", 10L), (3L, "nyc", 20L), (4L, "ams", 5L)))
  }

  test("merge and MoR delete/update behave identically to the unpartitioned table") {
    val tp = freshTable()
    val tu = freshTable()
    val base = sales((1, "ams", 10), (2, "nyc", 20), (3, "sfo", 30))
    VersionedTable.commit(base, tp, mode = "overwrite", partitionBy = Seq("city"))
    VersionedTable.commit(base, tu, mode = "overwrite")
    val upserts = sales((2, "nyc", 99), (9, "ams", 50))
    VersionedTable.merge(upserts, tp, Seq("id"))
    VersionedTable.merge(upserts, tu, Seq("id"))
    assert(contents(tp) === contents(tu))
    assertHomogeneous(tp)
    VersionedTable.deleteMergeOnRead(spark, tp, "id = 3")
    VersionedTable.deleteMergeOnRead(spark, tu, "id = 3")
    assert(contents(tp) === contents(tu))
    VersionedTable.updateMergeOnRead(spark, tp, "id = 1", Map("amount" -> "11"))
    VersionedTable.updateMergeOnRead(spark, tu, "id = 1", Map("amount" -> "11"))
    assert(contents(tp) === contents(tu))
    assertHomogeneous(tp) // MoR post-image files land partitioned too
  }

  test("partition-aligned replaceWhere rewrites nothing outside the scope") {
    val t = freshTable()
    VersionedTable.commit(
      sales((1, "ams", 10), (2, "nyc", 20), (3, "sfo", 30)),
      t, mode = "overwrite", partitionBy = Seq("city"))
    val before = VersionedTable.snapshotFiles(spark, t)
    val untouched = before.filterNot(_.contains(s"${VersionedTable.PartDirPrefix}city=nyc"))
    VersionedTable.replaceWhere(sales((20, "nyc", 200), (21, "nyc", 210)),
      t, "city = 'nyc'")
    val after = VersionedTable.snapshotFiles(spark, t)
    // value-homogeneous files + an aligned predicate = the other
    // partitions' files carry by REFERENCE (zero boundary rewrites)
    assert(untouched.forall(after.contains),
      "replaceWhere rewrote files outside the replaced partition")
    assert(contents(t) === Set((1L, "ams", 10L), (3L, "sfo", 30L),
      (20L, "nyc", 200L), (21L, "nyc", 210L)))
    assertHomogeneous(t)
  }

  test("compactSmall folds within the layout; optimize keeps it; vacuum respects nested dirs") {
    val t = freshTable()
    (0 until 4).foreach { i =>
      VersionedTable.commit(sales((i * 10 + 1, "ams", i), (i * 10 + 2, "nyc", i)),
        t, mode = if (i == 0) "overwrite" else "append",
        partitionBy = if (i == 0) Seq("city") else Seq.empty)
    }
    val want = contents(t)
    val cv = VersionedTable.compactSmall(spark, t, smallBytes = 1L << 20)
    assert(cv > 0)
    assert(contents(t) === want)
    assertHomogeneous(t)
    VersionedTable.optimize(spark, t)
    assert(contents(t) === want)
    assertHomogeneous(t)
    // vacuum with zero grace reclaims the superseded partitioned commit
    // dirs and keeps every live nested file
    val live = VersionedTable.snapshotFiles(spark, t).toSet
    val n = VersionedTable.vacuum(spark, t, retainVersions = 1, graceMs = 0L)
    assert(n > 0)
    assert(VersionedTable.snapshotFiles(spark, t).toSet === live)
    assert(contents(t) === want)
  }

  test("pcols survive checkpoints and rename; drop of a partition column is blocked") {
    val t = freshTable()
    VersionedTable.commit(sales((0, "ams", 0)), t, mode = "overwrite",
      partitionBy = Seq("city"))
    (1 to 12).foreach { i => // cross the checkpoint cadence
      VersionedTable.commit(sales((i.toLong, if (i % 2 == 0) "nyc" else "ams", i.toLong)), t)
    }
    assert(VersionedTable.partitionColumnsOf(spark, t) === Seq("city"))
    val pruned = VersionedTable.prunedFiles(spark, t, "city = 'nyc'")
    assert(pruned.nonEmpty &&
      pruned.forall(_.contains(s"${VersionedTable.PartDirPrefix}city=nyc")))
    // column mapping: renaming the partition column is metadata-only
    // (the layout keys on the immutable PHYSICAL name)
    VersionedTable.renameColumn(spark, t, "city", "metro")
    assert(VersionedTable.partitionColumnsOf(spark, t) === Seq("metro"))
    val renamedPrune = VersionedTable.prunedFiles(spark, t, "metro = 'nyc'")
    assert(renamedPrune.toSet === pruned.toSet)
    // appends under the new logical name still land in p__city= dirs
    VersionedTable.commit(Seq((100L, "nyc", 100L)).toDF("id", "metro", "amount"), t)
    assert(VersionedTable.readVersion(spark, t)
      .filter(col("metro") === "nyc").count() === 7L)
    intercept[IllegalArgumentException] {
      VersionedTable.dropColumn(spark, t, "metro")
    }
  }

  test("generated partition column: batches omit it, the layout computes it") {
    val t = freshTable()
    val withDay = Seq((1L, "2026-03-01T10:00:00Z", 5L), (2L, "2026-03-02T09:00:00Z", 6L))
      .toDF("id", "ts", "amount")
      .withColumn("day", to_date(col("ts")).cast("string"))
    VersionedTable.commit(withDay, t, mode = "overwrite", partitionBy = Seq("day"))
    VersionedTable.addGeneratedColumn(spark, t, "day",
      "CAST(to_date(ts) AS STRING)")
    // the streaming-shaped append: no day column in the batch
    VersionedTable.commit(
      Seq((3L, "2026-03-01T23:00:00Z", 7L)).toDF("id", "ts", "amount"), t)
    assertHomogeneous(t, pcol = "day")
    val d1 = VersionedTable.prunedFiles(spark, t, "day = '2026-03-01'")
    assert(d1.nonEmpty &&
      d1.forall(_.contains(s"${VersionedTable.PartDirPrefix}day=2026-03-01")))
    assert(VersionedTable.readWhere(spark, t, "day = '2026-03-01'")
      .select("id").collect().map(_.getLong(0)).toSet === Set(1L, 3L))
  }

  test("typed partition columns: date and int prune on range predicates") {
    val t = freshTable()
    val d = Seq(
      (1L, java.sql.Date.valueOf("2026-01-01"), 3),
      (2L, java.sql.Date.valueOf("2026-01-02"), 7),
      (3L, java.sql.Date.valueOf("2026-01-03"), 3)
    ).toDF("id", "day", "bucket")
    VersionedTable.commit(d, t, mode = "overwrite", partitionBy = Seq("day", "bucket"))
    // two-level layout
    assert(VersionedTable.snapshotFiles(spark, t).forall(f =>
      f.contains(s"${VersionedTable.PartDirPrefix}day=") &&
        f.contains(s"${VersionedTable.PartDirPrefix}bucket=")))
    // range predicate on a DATE partition column prunes via the exact
    // footer stats (logical-domain epoch days)
    val late = VersionedTable.prunedFiles(spark, t, "day >= DATE'2026-01-02'")
    assert(late.nonEmpty && late.forall(f => !f.contains("day=2026-01-01")))
    assert(VersionedTable.readWhere(spark, t, "day >= DATE'2026-01-02' AND bucket = 3")
      .select("id").collect().map(_.getLong(0)).toSet === Set(3L))
  }

  test("rowCount is exact across every DML face and never opens data files") {
    val t = freshTable()
    VersionedTable.commit(
      sales((1, "ams", 10), (2, "ams", 20), (3, "nyc", 30), (4, "sfo", 40)),
      t, mode = "overwrite", partitionBy = Seq("city"))
    def check(): Unit =
      assert(VersionedTable.rowCount(spark, t) ===
        VersionedTable.readVersion(spark, t).count())
    check()
    VersionedTable.commit(sales((5, "nyc", 50), (6, "ams", 60)), t); check()
    VersionedTable.delete(spark, t, "amount = 20"); check()
    // MoR delete: the count must come from the recorded DV position
    // count, not a scan (threshold 1.0 disables auto-fold so the vector
    // actually survives into the manifest)
    VersionedTable.deleteMergeOnRead(spark, t, "id = 3",
      maxVectoredFraction = 1.0); check()
    VersionedTable.updateMergeOnRead(spark, t, "id = 1",
      Map("amount" -> "11"), maxVectoredFraction = 1.0); check()
    VersionedTable.optimize(spark, t); check()
    VersionedTable.rollback(spark, t, 2L)
    assert(VersionedTable.rowCount(spark, t) ===
      VersionedTable.readVersion(spark, t, 2L).count())
    // historical versions answer from their own manifests
    assert(VersionedTable.rowCount(spark, t, 0L) === 4L)
    assert(VersionedTable.rowCount(spark, t, 1L) === 6L)
  }

  test("rowCount and partition-aligned countWhere survive unreadable data files") {
    val t = freshTable()
    VersionedTable.commit(
      sales((1, "ams", 10), (2, "nyc", 20), (3, "nyc", 30), (4, "sfo", 40)),
      t, mode = "overwrite", partitionBy = Seq("city"))
    VersionedTable.deleteMergeOnRead(spark, t, "id = 3",
      maxVectoredFraction = 1.0)
    val expectTotal = VersionedTable.readVersion(spark, t).count()
    val expectNyc = VersionedTable.readVersion(spark, t)
      .filter(col("city") === "nyc").count()
    // corrupt EVERY data file: any code path that opens one now throws,
    // so a correct answer PROVES the count is manifest-only
    VersionedTable.snapshotFiles(spark, t).foreach { f =>
      java.nio.file.Files.write(java.nio.file.Paths.get(t, f),
        "not parquet".getBytes)
    }
    assert(VersionedTable.rowCount(spark, t) === expectTotal)
    assert(VersionedTable.countWhere(spark, t, "city = 'nyc'") === expectNyc)
    assert(VersionedTable.countWhere(spark, t, "city IN ('ams', 'sfo')") === 2L)
    assert(VersionedTable.countWhere(spark, t, "city = 'berlin'") === 0L)
  }

  test("countWhere degrades to an exact boundary scan off the partition axis") {
    val t = freshTable()
    VersionedTable.commit(
      sales((1, "ams", 10), (2, "ams", 25), (3, "nyc", 30), (4, "sfo", 99)),
      t, mode = "overwrite", partitionBy = Seq("city"))
    def agree(cond: String): Unit =
      assert(VersionedTable.countWhere(spark, t, cond) ===
        VersionedTable.readVersion(spark, t).filter(expr(cond)).count(),
        s"countWhere disagrees with filter for: $cond")
    agree("amount > 20")                       // pure data predicate
    agree("city = 'ams' AND amount > 15")      // mixed: partition + data
    agree("amount IS NULL")
    agree("city <> 'ams' OR amount = 10")
    // unpartitioned table: everything is a boundary scan, still exact
    val u = freshTable()
    VersionedTable.commit(sales((1, "ams", 10), (2, "nyc", 20)), u, mode = "overwrite")
    assert(VersionedTable.countWhere(spark, u, "city = 'ams'") === 1L)
    assert(VersionedTable.rowCount(spark, u) === 2L)
  }

  test("escaped partition values round-trip through layout and metadata count") {
    val t = freshTable()
    VersionedTable.commit(
      sales((1, "new york", 10), (2, "new york", 20), (3, "s:f", 30)),
      t, mode = "overwrite", partitionBy = Seq("city"))
    assert(contents(t).map(_._2) === Set("new york", "s:f"))
    assert(VersionedTable.countWhere(spark, t, "city = 'new york'") === 2L)
    assert(VersionedTable.countWhere(spark, t, "city = 's:f'") === 1L)
    // null partition values land in the default dir and are only ever
    // scanned, never proven — and never match an equality
    val tn = freshTable()
    VersionedTable.commit(
      Seq((1L, Option("ams"), 10L), (2L, Option.empty[String], 20L))
        .toDF("id", "city", "amount"),
      tn, mode = "overwrite", partitionBy = Seq("city"))
    assert(VersionedTable.rowCount(spark, tn) === 2L)
    assert(VersionedTable.countWhere(spark, tn, "city = 'ams'") === 1L)
    assert(VersionedTable.countWhere(spark, tn, "city IS NULL") === 1L)
  }

  test("optimizeWhere compacts one partition; the rest carries by reference") {
    val t = freshTable()
    (0 until 4).foreach { i =>
      VersionedTable.commit(
        sales((i * 10 + 1, "ams", i), (i * 10 + 2, "nyc", i)),
        t, mode = if (i == 0) "overwrite" else "append",
        partitionBy = if (i == 0) Seq("city") else Seq.empty)
    }
    // a vector on an nyc file must materialize away in the scoped fold
    VersionedTable.deleteMergeOnRead(spark, t, "id = 2",
      maxVectoredFraction = 1.0)
    val want = contents(t)
    val before = VersionedTable.snapshotFiles(spark, t)
    val amsBefore = before.filter(_.contains(s"${VersionedTable.PartDirPrefix}city=ams"))
    val v = VersionedTable.optimizeWhere(spark, t, "city = 'nyc'")
    assert(v > 0)
    val after = VersionedTable.snapshotFiles(spark, t)
    // untouched partition carried by reference, scoped partition folded
    assert(amsBefore.forall(after.contains),
      "optimizeWhere rewrote files outside its scope")
    val nycAfter = after.filter(_.contains(s"${VersionedTable.PartDirPrefix}city=nyc"))
    assert(nycAfter.size === 1, s"nyc should fold to one file, got $nycAfter")
    assert(contents(t) === want)
    assertHomogeneous(t)
    // the scoped fold IS the vector's materialization
    assert(VersionedTable.rowCount(spark, t) === want.size.toLong)
    // sub-threshold scope: no commit
    assert(VersionedTable.optimizeWhere(spark, t, "city = 'nyc'") === v)
  }

  test("change data feed classifies partitioned DML, including cross-partition moves") {
    val t = freshTable()
    VersionedTable.commit(
      sales((1, "ams", 10), (2, "nyc", 20), (3, "sfo", 30)),
      t, mode = "overwrite", partitionBy = Seq("city"))
    VersionedTable.delete(spark, t, "id = 2")
    VersionedTable.update(spark, t, "id = 3", Map("city" -> "'ams'"))
    val feed = VersionedTable.changes(spark, t, Seq("id"), 0L, 2L)
      .select("id", "city", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(feed === Set(
      (2L, "nyc", "delete"),
      (3L, "sfo", "update_preimage"),
      (3L, "ams", "update_postimage")))
  }

  test("shallow clone of a partitioned table inherits the layout") {
    val src = freshTable()
    VersionedTable.commit(sales((1, "ams", 10), (2, "nyc", 20)), src,
      mode = "overwrite", partitionBy = Seq("city"))
    val dst = freshTable() + "/clone"
    VersionedTable.cloneTable(spark, src, dst)
    assert(VersionedTable.partitionColumnsOf(spark, dst) === Seq("city"))
    // appends to the clone land hive-partitioned in the clone's own layout
    VersionedTable.commit(sales((3, "sfo", 30)), dst)
    val own = VersionedTable.snapshotFiles(spark, dst)
      .filter(_.startsWith("files/c"))
    assert(own.nonEmpty && own.forall(_.contains(s"${VersionedTable.PartDirPrefix}city=")))
    assert(contents(dst) === Set((1L, "ams", 10L), (2L, "nyc", 20L), (3L, "sfo", 30L)))
    // pruning is exact across source-referenced AND own files
    val pruned = VersionedTable.prunedFiles(spark, dst, "city = 'sfo'")
    assert(pruned.nonEmpty &&
      pruned.forall(_.contains(s"${VersionedTable.PartDirPrefix}city=sfo")))
    assert(VersionedTable.rowCount(spark, dst) === 3L)
  }

  test("partitioned streaming sink shape: commitIfNew + time travel") {
    val t = freshTable()
    assert(VersionedTable.commitIfNew(sales((1, "ams", 1)), t, "app", 0L,
      partitionBy = Seq("city")).contains(0L))
    assert(VersionedTable.commitIfNew(sales((2, "nyc", 2)), t, "app", 1L).contains(1L))
    // replay skipped before any data lands
    assert(VersionedTable.commitIfNew(sales((2, "nyc", 2)), t, "app", 1L).isEmpty)
    assertHomogeneous(t)
    assert(contents(t, 0L) === Set((1L, "ams", 1L)))
    assert(contents(t) === Set((1L, "ams", 1L), (2L, "nyc", 2L)))
  }
}
