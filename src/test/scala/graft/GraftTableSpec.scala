package graft

import org.apache.spark.sql.functions._

import graft.sources.{GraftTable, VersionedTable}

/** The DeltaTable-shaped fluent facade: the reference's exact call
  * chain (batch_scoring.py:169-185 — isDeltaTable / forPath / merge /
  * whenMatchedUpdateAll / whenNotMatchedInsertAll / execute) ports
  * verbatim, plus DESCRIBE DETAIL and VACUUM DRY RUN. */
class GraftTableSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("vt_gt").toString

  test("the reference's create-or-merge branch ports verbatim") {
    val t = freshTable()
    val batch = Seq((1L, "a", 10L), (2L, "a", 20L)).toDF("id", "state", "amount")
    // batch_scoring.py:169: if not isDeltaTable -> overwrite write
    assert(!GraftTable.isGraftTable(spark, t))
    VersionedTable.commit(batch, t, mode = "overwrite")
    assert(GraftTable.isGraftTable(spark, t))
    // batch_scoring.py:180-185: forPath -> merge -> updateAll/insertAll
    val changes = Seq((2L, "b", 99L), (3L, "c", 30L)).toDF("id", "state", "amount")
    GraftTable.forPath(spark, t)
      .merge(changes, Seq("id"))
      .whenMatchedUpdateAll()
      .whenNotMatchedInsertAll()
      .execute()
    val got = GraftTable.forPath(spark, t).toDF
      .select("id", "state", "amount").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got === Set((1L, "a", 10L), (2L, "b", 99L), (3L, "c", 30L)))
  }

  test("fluent clause order maps to evaluation order") {
    val t = freshTable()
    VersionedTable.commit(Seq((1L, 5L), (2L, 50L)).toDF("id", "v"), t,
      mode = "overwrite")
    GraftTable.forPath(spark, t)
      .merge(Seq((1L, 0L), (2L, 0L)).toDF("id", "x"), Seq("id"))
      .whenMatchedDelete(Some("t.v < 10"))
      .whenMatchedUpdate(Map("v" -> "t.v + 1"))
      .execute()
    assert(GraftTable.forPath(spark, t).toDF.select("id", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet === Set((2L, 51L)))
  }

  test("detail() is the head manifest, no data read") {
    val t = freshTable()
    VersionedTable.commit(
      Seq((1L, "ams", 10L), (2L, "nyc", 20L)).toDF("id", "city", "amount"),
      t, mode = "overwrite", partitionBy = Seq("city"),
      bloomIndex = Seq("id"), ts = "2026-01-01T00:00:00Z")
    VersionedTable.addConstraint(spark, t, "pos", "amount >= 0")
    VersionedTable.deleteMergeOnRead(spark, t, "id = 2",
      maxVectoredFraction = 1.0)
    val d = GraftTable.forPath(spark, t).detail().collect().head
    assert(d.getAs[Long]("version") === 2L)
    assert(d.getAs[Long]("num_rows") === 1L)
    assert(d.getAs[Seq[String]]("partition_columns") === Seq("city"))
    assert(d.getAs[Seq[String]]("constraints") === Seq("pos"))
    assert(d.getAs[Seq[String]]("bloom_index_columns") === Seq("id"))
    assert(d.getAs[Long]("num_vectored_files") >= 1L)
    assert(d.getAs[Long]("num_files") >= 2L)
  }

  test("vacuumDryRun counts dead files without touching them; time travel survives") {
    val t = freshTable()
    VersionedTable.commit(Seq((1L, 1L)).toDF("id", "v"), t, mode = "overwrite")
    VersionedTable.commit(Seq((2L, 2L)).toDF("id", "v"), t, mode = "overwrite")
    VersionedTable.commit(Seq((3L, 3L)).toDF("id", "v"), t, mode = "overwrite")
    val h = GraftTable.forPath(spark, t)
    // default grace: fresh files are protected, preview says 0 — exactly
    // what a default vacuum would delete
    assert(h.vacuumDryRun(retainVersions = 1) === 0)
    val dead = h.vacuumDryRun(retainVersions = 1, graceMs = 0L)
    assert(dead >= 2) // v0 + v1 files are unreferenced at the head
    // nothing deleted: every historical version still reads
    (0L to 2L).foreach { v =>
      assert(h.asOf(v).select("id").head().getLong(0) === v + 1)
    }
    // the real vacuum with zero grace reclaims exactly that count
    assert(VersionedTable.vacuum(spark, t, retainVersions = 1, graceMs = 0L) === dead)
  }

  test("restore, history and time travel through the handle") {
    val t = freshTable()
    VersionedTable.commit(Seq((1L, 1L)).toDF("id", "v"), t,
      mode = "overwrite", ts = "2026-01-01T00:00:00Z")
    VersionedTable.commit(Seq((2L, 2L)).toDF("id", "v"), t,
      mode = "append", ts = "2026-01-02T00:00:00Z")
    val h = GraftTable.forPath(spark, t)
    assert(h.version === 1L)
    assert(h.asOfTimestamp("2026-01-01T12:00:00Z").count() === 1L)
    h.restoreToVersion(0L, ts = "2026-01-03T00:00:00Z")
    assert(GraftTable.forPath(spark, t).toDF.count() === 1L)
    assert(h.history().count() === 3L)
    // RESTORE TO TIMESTAMP: back to the v1 (two-row) state by time
    h.restoreToTimestamp("2026-01-02T12:00:00Z", ts = "2026-01-04T00:00:00Z")
    assert(GraftTable.forPath(spark, t).toDF.count() === 2L)
    // operation metrics ride the history rows (manifest-recorded counts)
    val hm = h.history().orderBy("version").collect()
    assert(hm.map(_.getAs[Long]("n_rows_added")).take(2).toSeq === Seq(1L, 1L))
    assert(hm.forall(_.getAs[Long]("n_dv_rows_deleted") === 0L))
  }

  test("restoreToTimestamp compares instants, not strings; pre-history asOf is descriptive") {
    val t = freshTable()
    VersionedTable.commit(Seq((1L, 1L)).toDF("id", "v"), t,
      mode = "overwrite", ts = "2026-01-01T00:00:00Z")
    // sub-second commit AFTER the asOf below — lexicographically it
    // sorts BEFORE ('.' < 'Z'), so a string compare would restore to it
    VersionedTable.commit(Seq((2L, 2L)).toDF("id", "v"), t,
      mode = "append", ts = "2026-01-02T00:00:00.500Z")
    val h = GraftTable.forPath(spark, t)
    h.restoreToTimestamp("2026-01-02T00:00:00Z", ts = "2026-01-03T00:00:00Z")
    assert(GraftTable.forPath(spark, t).toDF.count() === 1L,
      "instant-ordered resolve must pick v0, not the later sub-second commit")
    // asOf before every commit: a descriptive error, not an NPE
    val e = intercept[IllegalArgumentException](
      h.restoreToTimestamp("2020-01-01T00:00:00Z"))
    assert(e.getMessage.contains("no version at or before"))
  }
}
