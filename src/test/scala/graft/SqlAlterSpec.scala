package graft

import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

/** SQL schema evolution on `USING graft` tables
  * (graft.plans.GraftSqlAlter): ADD/RENAME/DROP COLUMN must route to
  * the zero-rewrite column-mapping ops, keep the catalog schema in
  * sync, and the relation must survive schema evolution that happened
  * behind the catalog's back (the SchemaRelationProvider contract). */
class SqlAlterSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(name: String): (String, String) = {
    val t = java.nio.file.Files.createTempDirectory("sqlalter").toString
    VersionedTable.commit(Seq((1L, 10L), (2L, 20L)).toDF("id", "v"), t,
      mode = "overwrite", ts = "2026-01-01T00:00:00Z")
    val tbl = s"sqlalter_$name"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl USING graft LOCATION '$t'")
    (t, tbl)
  }

  test("ALTER TABLE RENAME COLUMN: zero-rewrite, catalog synced") {
    val (path, tbl) = fixture("rn")
    val filesBefore = VersionedTable.history(spark, path)
      .filter(col("version") === 0).head.getInt(3)
    spark.sql(s"ALTER TABLE $tbl RENAME COLUMN v TO amount")
    assert(spark.sql(s"SELECT amount FROM $tbl").collect()
      .map(_.getLong(0)).toSet === Set(10L, 20L))
    // catalog schema followed (DESCRIBE resolves the new name)
    assert(spark.sql(s"DESCRIBE TABLE $tbl").collect()
      .map(_.getString(0)).contains("amount"))
    // metadata-only: the rename commit carries exactly the prior files
    val renameFiles = VersionedTable.history(spark, path)
      .filter(col("version") === 1).head.getInt(3)
    assert(renameFiles === filesBefore)
    assert(VersionedTable.history(spark, path)
      .filter(col("version") === 1).head.getLong(4) === 0L) // no rows added
    // old name gone everywhere
    intercept[Exception](spark.sql(s"SELECT v FROM $tbl").collect())
  }

  test("ALTER TABLE ADD COLUMNS: old rows read NULL; non-nullable refuses") {
    val (path, tbl) = fixture("add")
    spark.sql(s"ALTER TABLE $tbl ADD COLUMNS (score DOUBLE, tag STRING)")
    val rows = spark.sql(s"SELECT id, score, tag FROM $tbl").collect()
    assert(rows.length === 2 && rows.forall(r => r.isNullAt(1) && r.isNullAt(2)))
    // new column is writable immediately
    spark.sql(s"INSERT INTO $tbl VALUES (3, 30, 0.5, 'x')")
    assert(spark.sql(s"SELECT tag FROM $tbl WHERE id = 3").head.getString(0) === "x")
    assert(VersionedTable.readVersion(spark, path).columns.toSeq ===
      Seq("id", "v", "score", "tag"))
    val dup = intercept[Exception](
      spark.sql(s"ALTER TABLE $tbl ADD COLUMNS (V BIGINT)"))
    assert(dup.getMessage.contains("already exist"))
  }

  test("ALTER TABLE DROP COLUMN: metadata-only drop, catalog synced") {
    val (path, tbl) = fixture("dr")
    spark.sql(s"ALTER TABLE $tbl DROP COLUMN v")
    assert(spark.sql(s"SELECT * FROM $tbl").columns.toSeq === Seq("id"))
    assert(VersionedTable.readVersion(spark, path).columns.toSeq === Seq("id"))
    intercept[Exception](spark.sql(s"SELECT v FROM $tbl").collect())
    // non-graft table keeps Spark's own judgment
    val plainDir = java.nio.file.Files.createTempDirectory("sqlalter_plain").toString
    Seq((1L, 1L)).toDF("id", "v").write.mode("overwrite").parquet(plainDir)
    spark.sql("DROP TABLE IF EXISTS sqlalter_plain")
    spark.sql(s"CREATE TABLE sqlalter_plain USING parquet LOCATION '$plainDir'")
    val e = intercept[Exception](
      spark.sql("ALTER TABLE sqlalter_plain DROP COLUMN v"))
    assert(!e.getMessage.contains("graft"))
  }

  test("ALTER COLUMN TYPE: widening commit; narrowing rejects") {
    val t = java.nio.file.Files.createTempDirectory("sqlalter_ty").toString
    VersionedTable.commit(Seq((1, 10.5f), (2, 20.5f)).toDF("id", "v"), t,
      mode = "overwrite", ts = "2026-01-01T00:00:00Z")
    spark.sql("DROP TABLE IF EXISTS sqlalter_ty_t")
    spark.sql(s"CREATE TABLE sqlalter_ty_t USING graft LOCATION '$t'")
    spark.sql("ALTER TABLE sqlalter_ty_t ALTER COLUMN id TYPE BIGINT")
    spark.sql("ALTER TABLE sqlalter_ty_t ALTER COLUMN v TYPE DOUBLE")
    val out = VersionedTable.readVersion(spark, t)
    assert(out.schema.map(f => (f.name, f.dataType.simpleString)).toSeq ===
      Seq(("id", "bigint"), ("v", "double")))
    assert(out.filter(col("id") === 1L).head.getDouble(1) === 10.5)
    // narrowing refuses through the commit's own widen rule
    intercept[Exception](
      spark.sql("ALTER TABLE sqlalter_ty_t ALTER COLUMN id TYPE INT"))
    // comment/position changes have no manifest home
    val cm = intercept[Exception](
      spark.sql("ALTER TABLE sqlalter_ty_t ALTER COLUMN v COMMENT 'x'"))
    assert(cm.getMessage.contains("TYPE changes only"))
  }

  test("library-side evolution no longer bricks the catalog relation") {
    val (path, tbl) = fixture("beh")
    // rename BEHIND the catalog's back: the stored schema is now stale
    VersionedTable.renameColumn(spark, path, "v", "w")
    // the relation serves the manifest schema (the log owns the schema)
    assert(spark.sql(s"SELECT * FROM $tbl").columns.toSeq === Seq("id", "w"))
    assert(spark.sql(s"SELECT w FROM $tbl").collect()
      .map(_.getLong(0)).toSet === Set(10L, 20L))
  }
}
