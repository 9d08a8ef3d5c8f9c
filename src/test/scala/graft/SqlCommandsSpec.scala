package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

/** SQL maintenance commands (graft.plans.GraftSqlParser): DESCRIBE
  * HISTORY / VACUUM / OPTIMIZE / RESTORE must behave exactly like the
  * library calls they route to, all three target spellings must
  * resolve, and every non-graft statement must reach Spark's parser
  * untouched. */
class SqlCommandsSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0
  private def fixture(df: DataFrame, name: String): (String, String) = {
    n += 1
    val t = java.nio.file.Files.createTempDirectory("sqlcmd").toString
    VersionedTable.commit(df.repartition(1), t, mode = "overwrite",
      ts = "2026-01-01T00:00:00Z")
    val tbl = s"sqlcmd_${name}_$n"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl USING graft LOCATION '$t'")
    (t, tbl)
  }

  private def base: DataFrame = (1L to 40L).toDF("id").withColumn("v", col("id") * 10)

  test("DESCRIBE HISTORY ≡ library history, all three target spellings") {
    val (path, tbl) = fixture(base, "hist")
    VersionedTable.commit(Seq(99L).toDF("id").withColumn("v", lit(990L)),
      path, mode = "append", ts = "2026-01-02T00:00:00Z")
    val lib = VersionedTable.history(spark, path).collect().map(_.toSeq).toSet
    for (target <- Seq(tbl, s"'$path'", s"graft.`$path`")) {
      val sql = spark.sql(s"DESCRIBE HISTORY $target")
      assert(sql.columns.toSeq === Seq("version", "ts", "op", "n_files",
        "n_rows_added", "n_dv_rows_deleted"))
      assert(sql.collect().map(_.toSeq).toSet === lib, s"target $target")
    }
  }

  test("VACUUM DRY RUN previews exactly what VACUUM would delete (grace applies)") {
    val (path, tbl) = fixture(base, "vac")
    // two overwrites orphan the previous snapshots' files
    VersionedTable.commit(base.repartition(1), path, mode = "overwrite",
      ts = "2026-01-02T00:00:00Z")
    VersionedTable.commit(base.repartition(1), path, mode = "overwrite",
      ts = "2026-01-03T00:00:00Z")
    // everything is freshly written: under the default 7-day grace a
    // plain DRY RUN must report 0 — exactly what a plain VACUUM deletes
    // (the old behavior claimed N then deleted nothing)
    val dryDefault = spark.sql(s"VACUUM $tbl DRY RUN").collect().head.getInt(0)
    assert(dryDefault === 0)
    assert(spark.sql(s"VACUUM $tbl").collect().head.getInt(0) === dryDefault)
    // with the grace window retained away, DRY RUN counts the dead files
    // and the matching real vacuum reclaims the same number
    val dry = spark.sql(s"VACUUM $tbl RETAIN 0 HOURS DRY RUN")
      .collect().head.getInt(0)
    assert(dry === VersionedTable.vacuumReclaimable(spark, path, 2, graceMs = 0L))
    assert(dry >= 1)
    val real = spark.sql(s"VACUUM $tbl RETAIN 0 HOURS").collect().head.getInt(0)
    assert(real === dry)
    // retained versions still read; the vacuumed one no longer does
    assert(VersionedTable.readVersion(spark, path, 2L).count() === 40L)
    intercept[Exception](VersionedTable.readVersion(spark, path, 0L).count())
  }

  test("OPTIMIZE folds small files; WHERE + ZORDER BY variant parses and runs") {
    val (path, tbl) = fixture(base, "opt")
    (1 to 3).foreach { i =>
      VersionedTable.commit(Seq((100L + i, 1L)).toDF("id", "v").repartition(1),
        path, mode = "append", ts = s"2026-01-0${i + 1}T00:00:00Z")
    }
    val before = VersionedTable.readVersion(spark, path).collect().map(_.toSeq).toSet
    val opt = spark.sql(s"OPTIMIZE $tbl").collect().head
    val v = opt.getLong(0)
    assert(v === 4L)
    assert(opt.getInt(1) === 4 && opt.getInt(2) === 1) // 4 small files fold to 1
    assert(VersionedTable.readVersion(spark, path).collect().map(_.toSeq).toSet === before)
    assert(VersionedTable.history(spark, path)
      .filter(col("version") === 4).select("n_files").head.getInt(0) === 1)
    val v2 = spark.sql(s"OPTIMIZE $tbl WHERE id <= 20 ZORDER BY (id, v)")
      .collect().head.getLong(0)
    assert(VersionedTable.readVersion(spark, path, v2)
      .collect().map(_.toSeq).toSet === before)
  }

  test("RESTORE TO VERSION / TIMESTAMP AS OF is a zero-copy rollback commit") {
    val (path, tbl) = fixture(base, "rst")
    VersionedTable.commit(Seq((999L, 0L)).toDF("id", "v"), path,
      mode = "overwrite", ts = "2026-01-05T00:00:00Z")
    val v = spark.sql(s"RESTORE TABLE $tbl TO VERSION AS OF 0")
      .collect().head.getLong(0)
    assert(v === 2L)
    assert(VersionedTable.readVersion(spark, path).count() === 40L)
    // timestamp restore on its own fixture (the version restore above
    // committed with the default epoch ts, which would itself win any
    // later as-of resolution — by design: history stores ts verbatim)
    val (path2, tbl2) = fixture(base, "rstts")
    VersionedTable.commit(Seq((999L, 0L)).toDF("id", "v"), path2,
      mode = "overwrite", ts = "2026-01-05T00:00:00Z")
    val v2 = spark.sql(s"RESTORE $tbl2 TO TIMESTAMP AS OF '2026-01-02T00:00:00Z'")
      .collect().head.getLong(0)
    assert(v2 === 2L)
    assert(VersionedTable.readVersion(spark, path2).count() === 40L)
  }

  test("CREATE TABLE ... SHALLOW CLONE: metadata fork via SQL") {
    val (path, tbl) = fixture(base, "cl")
    VersionedTable.commit(Seq((500L, 5000L)).toDF("id", "v"), path,
      mode = "append", ts = "2026-01-02T00:00:00Z")
    val loc = java.nio.file.Files.createTempDirectory("sqlcmd_clone").toString + "/t"
    spark.sql("DROP TABLE IF EXISTS sqlcmd_clone_t")
    val got = spark.sql(s"CREATE TABLE sqlcmd_clone_t SHALLOW CLONE $tbl " +
      s"VERSION AS OF 0 LOCATION '$loc'").head.getString(0)
    assert(got === loc)
    // clone carries v0's 40 rows, reads through SQL, evolves independently
    assert(spark.sql("SELECT count(*) FROM sqlcmd_clone_t").head.getLong(0) === 40L)
    spark.sql("INSERT INTO sqlcmd_clone_t VALUES (777, 7770)")
    assert(spark.sql("SELECT count(*) FROM sqlcmd_clone_t").head.getLong(0) === 41L)
    assert(VersionedTable.readVersion(spark, path).count() === 41L) // 40 + appended 1
    // IF NOT EXISTS: second clone is a no-op returning the existing path
    val again = spark.sql(s"CREATE TABLE IF NOT EXISTS sqlcmd_clone_t " +
      s"SHALLOW CLONE $tbl").head.getString(0)
    assert(again.endsWith(loc) || again === loc)
    // path-spelled target, head version
    val p2 = java.nio.file.Files.createTempDirectory("sqlcmd_clone2").toString + "/t2"
    spark.sql(s"CREATE TABLE graft.`$p2` SHALLOW CLONE '$path'")
    assert(VersionedTable.readVersion(spark, p2).count() === 41L)
  }

  test("DESCRIBE HISTORY LIMIT n keeps the newest n commits") {
    val (path, tbl) = fixture(base, "hl")
    VersionedTable.commit(Seq((501L, 1L)).toDF("id", "v"), path,
      mode = "append", ts = "2026-01-02T00:00:00Z")
    VersionedTable.commit(Seq((502L, 1L)).toDF("id", "v"), path,
      mode = "append", ts = "2026-01-03T00:00:00Z")
    val limited = spark.sql(s"DESCRIBE HISTORY $tbl LIMIT 2").collect()
    assert(limited.map(_.getLong(0)).toSeq === Seq(2L, 1L),
      "LIMIT keeps the NEWEST n, newest first")
    assert(spark.sql(s"DESCRIBE HISTORY $tbl").count() === 3L)
    assert(spark.sql(s"DESCRIBE HISTORY graft.`$path` LIMIT 1")
      .head().getLong(0) === 2L)
  }

  test("CREATE TABLE ... CLONE (no SHALLOW) is the self-contained DEEP clone") {
    val (path, tbl) = fixture(base, "dcl")
    val loc = java.nio.file.Files.createTempDirectory("sqlcmd_dclone").toString + "/t"
    spark.sql("DROP TABLE IF EXISTS sqlcmd_dclone_t")
    val got = spark.sql(s"CREATE TABLE sqlcmd_dclone_t CLONE $tbl LOCATION '$loc'")
      .head.getString(0)
    assert(got === loc)
    assert(spark.sql("SELECT count(*) FROM sqlcmd_dclone_t").head.getLong(0) === 40L)
    // deep: local data files, fresh v0, no clone-ref pin on the source
    assert(new java.io.File(loc, "files").exists())
    assert(VersionedTable.history(spark, loc).count() === 1L)
    assert(VersionedTable.cloneRefs(spark, path).isEmpty)
    // DEEP spelling accepted too, path target
    val p3 = java.nio.file.Files.createTempDirectory("sqlcmd_dclone2").toString + "/t3"
    spark.sql(s"CREATE TABLE graft.`$p3` DEEP CLONE '$path'")
    // the source's data can vanish; the deep clone survives
    VersionedTable.delete(spark, path, "true")
    VersionedTable.vacuum(spark, path, retainVersions = 1, graceMs = 0L)
    assert(VersionedTable.readVersion(spark, p3).count() === 40L)
    assert(spark.sql("SELECT count(*) FROM sqlcmd_dclone_t").head.getLong(0) === 40L)
    spark.sql("DROP TABLE sqlcmd_dclone_t")
  }

  test("DESCRIBE DETAIL ≡ library describeDetail") {
    val (path, tbl) = fixture(base, "dt")
    val lib = VersionedTable.describeDetail(spark, path).collect().head
    val sql = spark.sql(s"DESCRIBE DETAIL $tbl").collect().head
    assert(sql.getLong(0) === lib.getLong(0))
    assert(sql.getLong(5) === 40L) // num_rows
    assert(spark.sql(s"DESCRIBE DETAIL graft.`$path`").columns.toSeq ===
      VersionedTable.describeDetail(spark, path).columns.toSeq)
  }

  test("CONVERT TO GRAFT: in-place v0 over existing parquet") {
    val dir = java.nio.file.Files.createTempDirectory("sqlcmd_conv").toString
    base.repartition(2).write.mode("overwrite").parquet(dir)
    // remove _SUCCESS-style markers is unnecessary — convert skips _ files
    val v = spark.sql(s"CONVERT TO GRAFT parquet.`$dir`").head.getLong(0)
    assert(v === 0L)
    assert(VersionedTable.readVersion(spark, dir).count() === 40L)
    // idempotence guard: converting a versioned table refuses
    val again = intercept[Exception](spark.sql(s"CONVERT TO GRAFT '$dir'"))
    assert(again.getMessage.contains("already a versioned table"))
  }

  test("ADD/DROP CONSTRAINT as SQL: validated, enforced, droppable") {
    val (path, tbl) = fixture(base, "ck")
    spark.sql(s"ALTER TABLE $tbl ADD CONSTRAINT v_pos CHECK (v > 0)")
    assert(VersionedTable.constraintsOf(spark, path).contains("v_pos"))
    // enforcement: a violating insert refuses
    val bad = intercept[Exception](spark.sql(s"INSERT INTO $tbl VALUES (99, -1)"))
    assert(bad.getMessage.toLowerCase.contains("constraint")
      || bad.getMessage.contains("v_pos"))
    // an already-violated constraint refuses to be added
    val lies = intercept[Exception](
      spark.sql(s"ALTER TABLE $tbl ADD CONSTRAINT v_huge CHECK (v > 1000)"))
    assert(lies.getMessage.nonEmpty)
    spark.sql(s"ALTER TABLE $tbl DROP CONSTRAINT v_pos")
    assert(!VersionedTable.constraintsOf(spark, path).contains("v_pos"))
    // IF EXISTS tolerates absence; bare DROP refuses
    spark.sql(s"ALTER TABLE $tbl DROP CONSTRAINT IF EXISTS nope")
    intercept[Exception](spark.sql(s"ALTER TABLE $tbl DROP CONSTRAINT nope"))
  }

  test("GraftTable.forName and CREATE TABLE ... AS SELECT") {
    val (path, tbl) = fixture(base, "nm")
    val t = graft.sources.GraftTable.forName(spark, tbl)
    assert(t.version === 0L)
    assert(t.toDF.count() === 40L)
    val bad = intercept[Exception](
      graft.sources.GraftTable.forName(spark, "sqlcmd_plain_never"))
    assert(bad.getMessage.nonEmpty)
    // CTAS through the v1 CreatableRelationProvider seam (managed table:
    // clear any stale warehouse dir a previous run's DROP left behind —
    // v1 DROP on a non-FileFormat provider does not delete the location)
    spark.sql("DROP TABLE IF EXISTS sqlcmd_ctas_t")
    val wh = new java.io.File("spark-warehouse/sqlcmd_ctas_t")
    if (wh.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(wh)
    }
    spark.sql(s"CREATE TABLE sqlcmd_ctas_t USING graft AS SELECT * FROM $tbl WHERE id <= 5")
    assert(spark.sql("SELECT count(*) FROM sqlcmd_ctas_t").head.getLong(0) === 5L)
    // the CTAS result is a real versioned table (history, time travel)
    val loc = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier("sqlcmd_ctas_t"))
      .location.toString
    assert(VersionedTable.history(spark, loc).count() === 1L)
  }

  test("INSERT INTO ... REPLACE WHERE: predicate-scoped overwrite") {
    val (path, tbl) = fixture(base, "rw")
    // replace the id<=10 band with recomputed rows; out-of-band carries
    val v = spark.sql(
      s"""INSERT INTO $tbl REPLACE WHERE id <= 10
         |SELECT id, v * 100 AS v FROM $tbl WHERE id <= 10""".stripMargin)
      .head.getLong(0)
    assert(v === 1L)
    val out = VersionedTable.readVersion(spark, path).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) === 1000L && out(10L) === 10000L)  // replaced band
    assert(out(11L) === 110L && out(40L) === 400L)    // carried rows
    assert(out.size === 40)
    // plain INSERT INTO stays untouched by the new grammar
    spark.sql(s"INSERT INTO $tbl VALUES (99, 990)")
    assert(VersionedTable.readVersion(spark, path).count() === 41L)
  }

  test("REPLACE WHERE condition may contain query keywords in quotes or parens") {
    // a string column whose literals embed FROM/SELECT — the naive
    // first-keyword split misparsed these into garbage condition+query
    val df = Seq((1L, "from paris"), (2L, "select few"), (3L, "plain"))
      .toDF("id", "tag")
    val (path, tbl) = fixture(df, "rwkw")
    spark.sql(
      s"""INSERT INTO $tbl REPLACE WHERE tag = 'from paris'
         |SELECT 10 AS id, 'from paris' AS tag""".stripMargin)
    val afterLit = VersionedTable.readVersion(spark, path).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(afterLit === Set((10L, "from paris"), (2L, "select few"), (3L, "plain")))
    // a parenthesized IN (... SELECT ...) whose keywords stay inside parens
    spark.sql(
      s"""INSERT INTO $tbl REPLACE WHERE id IN (SELECT id FROM $tbl WHERE id <= 3)
         |SELECT 2 AS id, 'two' AS tag UNION ALL SELECT 3, 'three'""".stripMargin)
    val afterIn = VersionedTable.readVersion(spark, path).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(afterIn === Set((10L, "from paris"), (2L, "two"), (3L, "three")))
    // double-quoted literals and backslash escapes hide keywords too
    spark.sql(
      s"""INSERT INTO $tbl REPLACE WHERE tag = "from paris"
         |SELECT 10 AS id, 'from paris' AS tag""".stripMargin)
    assert(VersionedTable.readVersion(spark, path)
      .filter(col("id") === 10L).count() === 1L)
    // a backslash-escaped quote inside the literal must not end it: the
    // batch row is outside the (empty) scope, so the statement reaches
    // the SCOPE check — reaching it at all proves the split survived
    val esc = intercept[Exception](spark.sql(
      s"""INSERT INTO $tbl REPLACE WHERE tag = 'it\\'s from x'
         |SELECT 99 AS id, 'other' AS tag""".stripMargin))
    assert(esc.getMessage.contains("outside its scope"),
      s"expected the scope error, got: ${esc.getMessage}")
    // no query at all is a grammar-level usage error, not a baffling
    // delegate parse failure
    val e = intercept[Exception](
      spark.sql(s"INSERT INTO $tbl REPLACE WHERE tag = 'from paris'"))
    assert(e.getMessage.contains("no query found"))
  }

  test("table_changes TVF: per-commit CDF from SQL") {
    val (path, tbl) = fixture(base, "tc")
    VersionedTable.commit(Seq((99L, 990L)).toDF("id", "v"), path,
      mode = "append", ts = "2026-01-02T00:00:00Z")
    VersionedTable.delete(spark, path, "id = 99", ts = "2026-01-03T00:00:00Z")
    // by name: version 1's insert + version 2's delete
    val byName = spark.sql(
      s"SELECT _change_type, _commit_version FROM table_changes('$tbl', 1, 'id')")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(byName === Set(("insert", 1L), ("delete", 2L)))
    // by path + bounded range
    val byPath = spark.sql(
      s"SELECT _change_type FROM table_changes('$path', 1, 1, 'id')")
      .collect().map(_.getString(0)).toSet
    assert(byPath === Set("insert"))
    val bad = intercept[Exception](
      spark.sql("SELECT * FROM table_changes('no_such_tbl_xyz', 0, 'id')").collect())
    assert(bad.getMessage.contains("not a graft table"))
    // TIMESTAMP bounds (Databricks' spelling): start = first commit
    // at-or-after, end = last at-or-before; mixes with version bounds
    val byTs = spark.sql(
      s"""SELECT _change_type FROM table_changes('$tbl',
         |'2026-01-01T12:00:00Z', '2026-01-02T12:00:00Z', 'id')""".stripMargin)
      .collect().map(_.getString(0)).toSet
    assert(byTs === Set("insert"))
    val mixed = spark.sql(
      s"SELECT _change_type FROM table_changes('$tbl', 1, '2026-01-03T00:00:00Z', 'id')")
      .collect().map(_.getString(0)).toSet
    assert(mixed === Set("insert", "delete"))
  }

  test("grammar errors speak; everything else reaches Spark's parser") {
    val (_, tbl) = fixture(base, "err")
    val bad = intercept[Exception](spark.sql(s"VACUUM $tbl RETAIN MANY THINGS"))
    assert(bad.getMessage.contains("graft SQL"))
    // non-graft table target refuses with the provider message
    val plainDir = java.nio.file.Files.createTempDirectory("sqlcmd_plain").toString
    base.write.mode("overwrite").parquet(plainDir)
    spark.sql(s"DROP TABLE IF EXISTS sqlcmd_plain")
    spark.sql(s"CREATE TABLE sqlcmd_plain USING parquet LOCATION '$plainDir'")
    val nong = intercept[Exception](spark.sql("DESCRIBE HISTORY sqlcmd_plain").collect())
    assert(nong.getMessage.contains("not a USING graft table"))
    // ordinary SQL is untouched by the injected parser
    assert(spark.sql("SELECT 1 + 1 AS two").head.getInt(0) === 2)
    assert(spark.sql(s"SELECT count(*) FROM $tbl").head.getLong(0) === 40L)
    assert(spark.sql(s"DESCRIBE TABLE $tbl").count() >= 2)
  }
}
