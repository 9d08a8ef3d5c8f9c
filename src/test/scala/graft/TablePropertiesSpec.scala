package graft

import graft.sources.{GraftTable, VersionedTable}

/** Persisted TABLE PROPERTIES (Delta `TBLPROPERTIES`, re-derived as
  * `prv=1` + `prop=key|hexvalue` manifest state): policy travels WITH
  * the table — retention, vacuum grace, checkpoint cadence and
  * auto-compaction are read from the manifest, so two writers with
  * different JVM configs apply the SAME table-declared policy; the
  * state survives checkpoint resolution, clone, rollback, overwrite
  * and expireLog; and the SQL surface (`ALTER TABLE ... SET/UNSET
  * TBLPROPERTIES`, `SHOW TBLPROPERTIES`) round-trips it. */
final class TablePropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("props_spec").toString

  private def seed(p: String, n: Int = 10): Unit =
    VersionedTable.commit(
      (1 to n).map(i => (i.toLong, i * 10L)).toDF("id", "v"), p,
      mode = "overwrite", ts = "2026-01-01T00:00:00Z")

  test("set/unset round-trip; properties inherit through delta commits and survive overwrite") {
    val t = fresh()
    seed(t)
    VersionedTable.setProperties(spark, t,
      Map("graft.retainVersions" -> "5", "team" -> "mobility"),
      ts = "2026-01-02T00:00:00Z")
    assert(VersionedTable.propertiesOf(spark, t)
      === Map("graft.retainVersions" -> "5", "team" -> "mobility"))
    // delta commits inherit (no prv marker of their own)
    VersionedTable.commit(Seq((99L, 990L)).toDF("id", "v"), t,
      mode = "append", ts = "2026-01-03T00:00:00Z")
    VersionedTable.delete(spark, t, "id = 2", ts = "2026-01-04T00:00:00Z")
    assert(VersionedTable.propertiesOf(spark, t)("team") === "mobility")
    // an OVERWRITE replaces data+schema but keeps the table's policy
    VersionedTable.commit(Seq((1L, 1L)).toDF("id", "v"), t,
      mode = "overwrite", ts = "2026-01-05T00:00:00Z")
    assert(VersionedTable.propertiesOf(spark, t)("team") === "mobility")
    // unset: unknown keys loud unless IF EXISTS; removal sticks
    intercept[IllegalArgumentException](
      VersionedTable.unsetProperties(spark, t, Seq("nope")))
    VersionedTable.unsetProperties(spark, t, Seq("nope"), ifExists = true,
      ts = "2026-01-06T00:00:00Z")
    VersionedTable.unsetProperties(spark, t, Seq("team"),
      ts = "2026-01-07T00:00:00Z")
    assert(VersionedTable.propertiesOf(spark, t)
      === Map("graft.retainVersions" -> "5"))
    // time travel sees the property state of its era (versioned like
    // everything else — rollback restores it below)
    val v1 = VersionedTable.rollback(spark, t, 2L, ts = "2026-01-08T00:00:00Z")
    assert(v1 > 0)
    assert(VersionedTable.propertiesOf(spark, t)("team") === "mobility")
    // bad keys refuse
    intercept[IllegalArgumentException](
      VersionedTable.setProperties(spark, t, Map("a|b" -> "x")))
    intercept[IllegalArgumentException](
      VersionedTable.setProperties(spark, t, Map("a b" -> "x")))
  }

  test("properties survive checkpoint resolution, expireLog and shallow clone") {
    val t = fresh()
    seed(t)
    VersionedTable.setProperties(spark, t, Map("k" -> "v with | = and 'quotes'"),
      ts = "2026-01-02T00:00:00Z")
    // push past a checkpoint boundary (cadence 10), then cut the log
    // below it — the head resolves from the CHECKPOINT, which must
    // carry the property state
    (1 to 12).foreach(i => VersionedTable.commit(
      Seq((100L + i, 1L)).toDF("id", "v"), t, mode = "append",
      ts = f"2026-01-03T${i}%02d:00:00Z"))
    VersionedTable.expireLog(spark, t, retainVersions = 2)
    assert(VersionedTable.propertiesOf(spark, t)("k") === "v with | = and 'quotes'")
    // clone carries the source's properties (Delta clones carry them)
    val c = fresh() + "/clone"
    VersionedTable.cloneTable(spark, t, c, ts = "2026-01-04T00:00:00Z")
    assert(VersionedTable.propertiesOf(spark, c)("k") === "v with | = and 'quotes'")
  }

  test("policy FROM the table: vacuum retention/grace, expireLog retention, checkpoint cadence") {
    val t = fresh()
    seed(t)
    // declared policy: keep 3 versions, zero grace (test scope), log 4
    VersionedTable.setProperties(spark, t, Map(
      "graft.retainVersions" -> "3",
      "graft.vacuumGraceHours" -> "0",
      "graft.logRetainVersions" -> "4",
      "graft.checkpointInterval" -> "5"), ts = "2026-01-02T00:00:00Z")
    (1 to 14).foreach(i => VersionedTable.commit(
      Seq((200L + i, 1L)).toDF("id", "v"), t, mode = "overwrite",
      ts = f"2026-01-03T${i}%02d:00:00Z"))
    // checkpoint cadence 5 (not the default 10): checkpoints landed at
    // multiples of 5
    val ckDir = new java.io.File(t, "_checkpoints")
    val cks = Option(ckDir.list()).map(_.toSeq).getOrElse(Seq.empty)
      .filter(_.endsWith(".checkpoint"))
      .map(_.stripPrefix("v").stripSuffix(".checkpoint").toLong).sorted
    assert(cks.nonEmpty && cks.forall(_ % 5 == 0),
      s"expected cadence-5 checkpoints, got $cks")
    // defaulted vacuum applies the DECLARED retention+grace — another
    // "session" (a policy-free call site) reclaims overwritten files
    // older than the 3 retained versions, proving the policy rides the
    // TABLE, not the JVM
    val reclaimed = VersionedTable.vacuum(spark, t)
    assert(reclaimed > 0, "declared zero grace must reclaim dead overwrites")
    (0 to 2).foreach { k =>
      assert(VersionedTable.readVersion(spark, t,
        VersionedTable.latestVersion(spark, t) - k).count() >= 1L)
    }
    // defaulted expireLog applies graft.logRetainVersions = 4
    val head = VersionedTable.latestVersion(spark, t)
    assert(VersionedTable.expireLog(spark, t) > 0)
    val kept = new java.io.File(t, "_manifests").list().toSeq
      .map(_.stripPrefix("v").stripSuffix(".manifest").toLong).sorted
    assert(kept.head <= head - 3 + (head % 5),
      s"log cut should anchor at a cadence-5 checkpoint, kept $kept")
    // explicit arguments still override the table policy
    assert(VersionedTable.vacuumReclaimable(spark, t, retainVersions = 1,
      graceMs = 0L) >= 0)
  }

  test("SQL surface: SET/UNSET/SHOW TBLPROPERTIES on name and path spellings; autoCompact applies") {
    val t = fresh()
    seed(t)
    spark.sql("DROP TABLE IF EXISTS props_sql_t")
    spark.sql(s"CREATE TABLE props_sql_t USING graft LOCATION '$t'")
    spark.sql("ALTER TABLE props_sql_t SET TBLPROPERTIES " +
      "('graft.autoOptimize.autoCompact' = 'true', 'dept' = 'ops')")
    // SHOW by name, by path, and single-key
    val shown = spark.sql("SHOW TBLPROPERTIES props_sql_t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(shown === Map(
      "graft.autoOptimize.autoCompact" -> "true", "dept" -> "ops"))
    val byPath = spark.sql(s"SHOW TBLPROPERTIES graft.`$t`").collect()
    assert(byPath.length === 2)
    val one = spark.sql("SHOW TBLPROPERTIES props_sql_t ('dept')").collect()
    assert(one.map(_.toSeq.last) === Array("ops"))
    // the catalog's copy synced as a convenience
    assert(spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier("props_sql_t"))
      .properties.get("dept").contains("ops"))
    // table-declared autoCompact: many small appends through the
    // format face end compacted without any caller cadence
    (1 to 6).foreach(i => Seq((500L + i, 1L)).toDF("id", "v")
      .write.format("graft").mode("append").save(t))
    val hist = VersionedTable.history(spark, t)
      .select("op").collect().map(_.getString(0))
    assert(hist.contains("compact"),
      s"autoCompact property must trigger compaction, ops: ${hist.mkString(",")}")
    assert(VersionedTable.readVersion(spark, t).count() === 16L)
    // UNSET via SQL, path spelling; IF EXISTS tolerated
    spark.sql(s"ALTER TABLE graft.`$t` UNSET TBLPROPERTIES ('dept')")
    spark.sql("ALTER TABLE props_sql_t UNSET TBLPROPERTIES IF EXISTS ('ghost')")
    assert(VersionedTable.propertiesOf(spark, t).keySet
      === Set("graft.autoOptimize.autoCompact"))
    // non-graft tables are untouched by the interception
    spark.sql("DROP TABLE IF EXISTS props_plain_t")
    spark.sql("CREATE TABLE props_plain_t (id INT) USING parquet")
    spark.sql("ALTER TABLE props_plain_t SET TBLPROPERTIES ('x' = '1')")
    val plain = spark.sql("SHOW TBLPROPERTIES props_plain_t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(plain.get("x").contains("1"))
    spark.sql("DROP TABLE props_plain_t")
    spark.sql("DROP TABLE props_sql_t")
  }

  test("graft.appendOnly blocks every row-deleting/updating face; appends and insert-only merges pass") {
    val t = fresh()
    seed(t)
    VersionedTable.setProperties(spark, t, Map("graft.appendOnly" -> "true"),
      ts = "2026-01-02T00:00:00Z")
    def blocked(op: => Any): Unit = {
      val e = intercept[UnsupportedOperationException](op)
      assert(e.getMessage.contains("graft.appendOnly"), e.getMessage)
    }
    blocked(VersionedTable.delete(spark, t, "id = 1"))
    blocked(VersionedTable.deleteMergeOnRead(spark, t, "id = 1"))
    blocked(VersionedTable.update(spark, t, "id = 1", Map("v" -> "v + 1")))
    blocked(VersionedTable.updateMergeOnRead(spark, t, "id = 1", Map("v" -> "v + 1")))
    blocked(VersionedTable.merge(Seq((1L, 99L)).toDF("id", "v"), t, Seq("id")))
    blocked(VersionedTable.replaceWhere(
      Seq((1L, 99L)).toDF("id", "v"), t, "id = 1"))
    blocked(VersionedTable.commit(Seq((1L, 1L)).toDF("id", "v"), t,
      mode = "overwrite"))
    blocked(spark.sql(s"DELETE FROM graft.`$t` WHERE id = 1"))
    // appends and INSERT-ONLY merges stay allowed (only existing rows
    // are protected — Delta's delta.appendOnly rule)
    VersionedTable.commit(Seq((100L, 1L)).toDF("id", "v"), t,
      mode = "append", ts = "2026-01-03T00:00:00Z")
    VersionedTable.mergeClauses(Seq((101L, 1L), (1L, 999L)).toDF("id", "v"), t,
      Seq("id"), matched = Seq.empty,
      notMatched = Seq(VersionedTable.MergeAction.Insert()),
      ts = "2026-01-04T00:00:00Z")
    val ids = VersionedTable.readVersion(spark, t).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(ids === ((1L to 10L) ++ Seq(100L, 101L)).toSet)
    // id 1 survived UNMODIFIED (the insert-only merge matched it away)
    assert(VersionedTable.readVersion(spark, t).filter("id = 1")
      .select("v").head().getLong(0) === 10L)
    // unset re-opens the table
    VersionedTable.unsetProperties(spark, t, Seq("graft.appendOnly"),
      ts = "2026-01-05T00:00:00Z")
    VersionedTable.delete(spark, t, "id = 1", ts = "2026-01-06T00:00:00Z")
    assert(!VersionedTable.readVersion(spark, t).select("id")
      .collect().map(_.getLong(0)).contains(1L))
  }

  test("DESCRIBE DETAIL reports properties; CLONE ... TBLPROPERTIES merges overrides") {
    val t = fresh()
    seed(t)
    VersionedTable.setProperties(spark, t,
      Map("team" -> "mobility", "graft.retainVersions" -> "5"),
      ts = "2026-01-02T00:00:00Z")
    val detail = VersionedTable.describeDetail(spark, t).collect().head
    assert(detail.getAs[Seq[String]]("properties")
      === Seq("graft.retainVersions=5", "team=mobility"))
    // clone with overrides: source props carry, overrides merge on top
    val c = fresh() + "/c"
    spark.sql(s"CREATE TABLE graft.`$c` SHALLOW CLONE '$t' " +
      "TBLPROPERTIES ('team' = 'ml', 'tier' = 'dev')")
    assert(VersionedTable.propertiesOf(spark, c) === Map(
      "team" -> "ml", "tier" -> "dev", "graft.retainVersions" -> "5"))
    // and the source's own properties are untouched
    assert(VersionedTable.propertiesOf(spark, t)("team") === "mobility")
  }

  test("fluent face + stream sink honor the property surface") {
    val t = fresh()
    seed(t)
    val tbl = GraftTable.forPath(spark, t)
    tbl.setProperties(Map("graft.vacuumGraceHours" -> "0.5"))
    assert(tbl.properties("graft.vacuumGraceHours") === "0.5")
    tbl.unsetProperties(Seq("graft.vacuumGraceHours"))
    assert(tbl.properties.isEmpty)
    // a mistyped policy value fails the op that consults it, loudly
    tbl.setProperties(Map("graft.retainVersions" -> "lots"))
    val e = intercept[IllegalArgumentException](VersionedTable.vacuum(spark, t))
    assert(e.getMessage.contains("graft.retainVersions"))
  }
}
