package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.{GraftTable, VersionedTable}

/** SQL row-level DML on `USING graft` tables (graft.plans.GraftSqlDml):
  * DELETE FROM / UPDATE / MERGE INTO must behave exactly like the
  * library calls they route to, qualifier handling must be structural
  * (string literals containing "t." survive), and non-graft targets
  * must pass through to Spark untouched. */
class SqlDmlSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0
  /** Fresh (path, tableName) with the table registered in the session
    * catalog over an initial snapshot. */
  private def fixture(df: DataFrame, name: String): (String, String) = {
    n += 1
    val t = java.nio.file.Files.createTempDirectory("sqldml").toString
    VersionedTable.commit(df, t, mode = "overwrite")
    val tbl = s"sqldml_${name}_$n"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl USING graft LOCATION '$t'")
    (t, tbl)
  }

  private def base: DataFrame =
    Seq((1L, 10L, "alpha"), (2L, 20L, "beta"), (3L, 30L, "t. literal"),
      (4L, 40L, "delta")).toDF("id", "v", "tag")

  private def rows(path: String): Set[(Long, Long, String)] =
    VersionedTable.readVersion(spark, path)
      .select("id", "v", "tag").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet

  test("SQL DELETE FROM ... WHERE routes to the versioned COW delete") {
    val (path, tbl) = fixture(base, "del")
    spark.sql(s"DELETE FROM $tbl WHERE v >= 30")
    assert(rows(path) === Set((1L, 10L, "alpha"), (2L, 20L, "beta")))
    // the delete is a real commit: history grew and time travel sees v0
    assert(VersionedTable.latestVersion(spark, path) === 1L)
    assert(VersionedTable.readVersion(spark, path, 0L).count() === 4L)
  }

  test("DELETE with table alias and qualified columns; literals with dots survive") {
    val (path, tbl) = fixture(base, "delq")
    // alias-qualified attribute + a string literal containing "t." — a
    // string-replace dealias would mangle it; the structural rewrite must not
    spark.sql(s"DELETE FROM $tbl AS t WHERE t.tag = 't. literal'")
    assert(rows(path).map(_._1) === Set(1L, 2L, 4L))
    // table-name-qualified spelling works too
    spark.sql(s"DELETE FROM $tbl WHERE $tbl.id = 4")
    assert(rows(path).map(_._1) === Set(1L, 2L))
  }

  test("SQL UPDATE SET ... WHERE routes to the versioned COW update") {
    val (path, tbl) = fixture(base, "upd")
    spark.sql(s"UPDATE $tbl SET v = v * 2, tag = concat(tag, '!') WHERE id <= 2")
    assert(rows(path) === Set((1L, 20L, "alpha!"), (2L, 40L, "beta!"),
      (3L, 30L, "t. literal"), (4L, 40L, "delta")))
    // no WHERE → all rows
    spark.sql(s"UPDATE $tbl SET v = 0")
    assert(rows(path).map(_._2) === Set(0L))
  }

  test("SQL MERGE INTO: update/delete/insert clauses match the merge builder") {
    val src = Seq((2L, 200L, "BETA"), (3L, 300L, "GAMMA"), (9L, 900L, "IOTA"))
      .toDF("id", "v", "tag")
    // SQL on one fixture
    val (pSql, tbl) = fixture(base, "mrg")
    src.createOrReplaceTempView("sqldml_mrg_src")
    spark.sql(
      s"""MERGE INTO $tbl AS t USING sqldml_mrg_src AS s ON t.id = s.id
         |WHEN MATCHED AND s.v >= 300 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET v = s.v, tag = lower(s.tag)
         |WHEN NOT MATCHED AND s.v < 1000 THEN INSERT (id, v, tag) VALUES (s.id, s.v, s.tag)
         |WHEN NOT MATCHED BY SOURCE AND t.id = 1 THEN UPDATE SET tag = 'kept'
         |""".stripMargin)
    // same clauses through the library builder on a second fixture
    val pLib = java.nio.file.Files.createTempDirectory("sqldml_lib").toString
    VersionedTable.commit(base, pLib, mode = "overwrite")
    GraftTable.forPath(spark, pLib).merge(src, Seq("id"))
      .whenMatchedDelete(Some("s.v >= 300"))
      .whenMatchedUpdate(Map("v" -> "s.v", "tag" -> "lower(s.tag)"))
      .whenNotMatchedInsert(
        Map("id" -> "s.id", "v" -> "s.v", "tag" -> "s.tag"), Some("s.v < 1000"))
      .whenNotMatchedBySourceUpdate(Map("tag" -> "'kept'"), Some("t.id = 1"))
      .execute()
    assert(rows(pSql) === rows(pLib))
    assert(rows(pSql) === Set((1L, 10L, "kept"), (2L, 200L, "beta"),
      (4L, 40L, "delta"), (9L, 900L, "IOTA")))
  }

  test("MERGE star clauses: UPDATE SET * / INSERT *") {
    val (path, tbl) = fixture(base, "star")
    Seq((1L, 111L, "one"), (7L, 777L, "seven")).toDF("id", "v", "tag")
      .createOrReplaceTempView("sqldml_star_src")
    spark.sql(
      s"""MERGE INTO $tbl t USING sqldml_star_src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *
         |""".stripMargin)
    assert(rows(path) === Set((1L, 111L, "one"), (2L, 20L, "beta"),
      (3L, 30L, "t. literal"), (4L, 40L, "delta"), (7L, 777L, "seven")))
  }

  test("MERGE with differently-named ON key renames the source (the CDC shape)") {
    val (path, tbl) = fixture(base, "dnk")
    Seq((2L, 222L, "two"), (7L, 777L, "seven")).toDF("customer_id", "v", "tag")
      .createOrReplaceTempView("sqldml_dnk_src")
    // star clauses: the renamed key column participates as `id`
    spark.sql(
      s"""MERGE INTO $tbl t USING sqldml_dnk_src s ON t.id = s.customer_id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *
         |""".stripMargin)
    assert(rows(path) === Set((1L, 10L, "alpha"), (2L, 222L, "two"),
      (3L, 30L, "t. literal"), (4L, 40L, "delta"), (7L, 777L, "seven")))
    // explicit clauses may still reference the ORIGINAL source spelling
    Seq((2L, 999L)).toDF("customer_id", "nv")
      .createOrReplaceTempView("sqldml_dnk_src2")
    spark.sql(
      s"""MERGE INTO $tbl t USING sqldml_dnk_src2 s ON t.id = s.customer_id
         |WHEN MATCHED AND s.customer_id = 2 THEN UPDATE SET v = s.nv
         |""".stripMargin)
    assert(rows(path).contains((2L, 999L, "two")))
    // a rename landing on a name another source column still holds refuses
    Seq((2L, 5L, 50L)).toDF("customer_id", "id", "v")
      .createOrReplaceTempView("sqldml_dnk_bad")
    val clash = intercept[Exception](spark.sql(
      s"""MERGE INTO $tbl t USING sqldml_dnk_bad s ON t.id = s.customer_id
         |WHEN MATCHED THEN UPDATE SET v = s.v
         |""".stripMargin))
    assert(clash.getMessage.contains("collides"))
  }

  test("descriptive DML errors: duplicate SET targets, unknown ON key, bad VERSION AS OF") {
    val (_, tbl) = fixture(base, "derr")
    val dup = intercept[Exception](spark.sql(s"UPDATE $tbl SET v = 1, v = 2"))
    assert(dup.getMessage.contains("duplicate UPDATE SET"))
    Seq((1L, 1L)).toDF("id", "w").createOrReplaceTempView("sqldml_derr_src")
    val dupM = intercept[Exception](spark.sql(
      s"""MERGE INTO $tbl t USING sqldml_derr_src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET v = 1, v = 2""".stripMargin))
    assert(dupM.getMessage.contains("duplicate"))
    // an ON key naming no real column is a descriptive error, not a bare
    // NoSuchElementException
    val nk = intercept[Exception](spark.sql(
      s"""MERGE INTO $tbl t USING sqldml_derr_src s ON t.nope = s.nope
         |WHEN MATCHED THEN DELETE""".stripMargin))
    assert(nk.getMessage.contains("nope") &&
      !nk.toString.contains("NoSuchElement"))
    val bv = intercept[Exception](
      spark.sql(s"SELECT * FROM $tbl VERSION AS OF 'abc'").collect())
    assert(bv.getMessage.contains("must be an integer"))
  }

  test("MERGE with unqualified columns classifies by side; ambiguity errors") {
    val (path, tbl) = fixture(base, "unq")
    Seq((2L, "x")).toDF("sid", "stag").createOrReplaceTempView("sqldml_unq_src")
    // a view sharing the key name: unqualified non-key columns classify
    // by which side's schema holds them
    Seq((2L, 222L)).toDF("id", "nv").createOrReplaceTempView("sqldml_unq_src2")
    spark.sql(
      s"""MERGE INTO $tbl USING sqldml_unq_src2 ON $tbl.id = sqldml_unq_src2.id
         |WHEN MATCHED THEN UPDATE SET v = nv
         |""".stripMargin)
    assert(rows(path).contains((2L, 222L, "beta")))
    // a column present on BOTH sides unqualified is ambiguous
    val amb = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO $tbl USING sqldml_unq_src2 ON id = id
           |WHEN MATCHED THEN UPDATE SET v = nv
           |""".stripMargin)
    }
    assert(amb.getMessage.toLowerCase.contains("ambiguous"))
  }

  test("unsupported shapes refuse loudly; non-graft targets pass through") {
    val (_, tbl) = fixture(base, "err")
    Seq((1L, 1L)).toDF("id", "w").createOrReplaceTempView("sqldml_err_src")
    val nonEq = intercept[Exception](spark.sql(
      s"""MERGE INTO $tbl USING sqldml_err_src s ON $tbl.id > s.id
         |WHEN MATCHED THEN DELETE""".stripMargin))
    assert(nonEq.getMessage.contains("equality"))
    val sub = intercept[Exception](spark.sql(
      s"DELETE FROM $tbl WHERE id IN (SELECT id FROM sqldml_err_src)"))
    assert(sub.getMessage.contains("subqueries are not supported"))
    // non-graft target: Spark's own v2-only guard still speaks, not ours
    val plainDir = java.nio.file.Files.createTempDirectory("sqldml_plain").toString
    base.write.mode("overwrite").parquet(plainDir)
    spark.sql(s"DROP TABLE IF EXISTS sqldml_plain_t")
    spark.sql(s"CREATE TABLE sqldml_plain_t USING parquet LOCATION '$plainDir'")
    val passthru = intercept[Exception](
      spark.sql("DELETE FROM sqldml_plain_t WHERE id = 1"))
    assert(!passthru.getMessage.contains("graft SQL DML"))
  }

  test("SQL time travel: SELECT ... VERSION AS OF / TIMESTAMP AS OF") {
    val t = java.nio.file.Files.createTempDirectory("sqldml_tt").toString
    VersionedTable.commit(Seq((1L, 10L)).toDF("id", "v"), t,
      mode = "overwrite", ts = "2026-01-01T00:00:00Z")
    VersionedTable.commit(Seq((2L, 20L)).toDF("id", "v"), t,
      mode = "append", ts = "2026-01-05T00:00:00Z")
    spark.sql("DROP TABLE IF EXISTS sqldml_tt_t")
    spark.sql(s"CREATE TABLE sqldml_tt_t USING graft LOCATION '$t'")
    assert(spark.sql("SELECT count(*) AS n FROM sqldml_tt_t VERSION AS OF 0")
      .head.getLong(0) === 1L)
    assert(spark.sql("SELECT count(*) AS n FROM sqldml_tt_t VERSION AS OF 1")
      .head.getLong(0) === 2L)
    assert(spark.sql(
      "SELECT sum(v) AS s FROM sqldml_tt_t TIMESTAMP AS OF '2026-01-03T00:00:00Z'")
      .head.getLong(0) === 10L)
    // alias + join with the head read: two snapshots of one table coexist
    val joined = spark.sql(
      """SELECT cur.id FROM sqldml_tt_t cur
        |LEFT ANTI JOIN sqldml_tt_t VERSION AS OF 0 old ON cur.id = old.id
        |""".stripMargin).collect().map(_.getLong(0)).toSet
    assert(joined === Set(2L))
    // non-graft target: the placeholder reconstructs the original node
    // and Spark's own time-travel judgment speaks, not ours
    val plainDir = java.nio.file.Files.createTempDirectory("sqldml_tt_plain").toString
    Seq((1L, 1L)).toDF("id", "v").write.mode("overwrite").parquet(plainDir)
    spark.sql("DROP TABLE IF EXISTS sqldml_tt_plain")
    spark.sql(s"CREATE TABLE sqldml_tt_plain USING parquet LOCATION '$plainDir'")
    val e = intercept[Exception](
      spark.sql("SELECT * FROM sqldml_tt_plain VERSION AS OF 0").collect())
    assert(!e.getMessage.contains("graft"))
  }

  test("path-based SQL: graft.`/path` works everywhere, no catalog entry") {
    val t = java.nio.file.Files.createTempDirectory("sqldml_path").toString
    VersionedTable.commit(base, t, mode = "overwrite")
    assert(spark.sql(s"SELECT count(*) AS n FROM graft.`$t`").head.getLong(0) === 4L)
    spark.sql(s"INSERT INTO graft.`$t` VALUES (9, 90, 'iota')")
    assert(spark.sql(s"SELECT count(*) AS n FROM graft.`$t`").head.getLong(0) === 5L)
    spark.sql(s"UPDATE graft.`$t` SET v = 91 WHERE id = 9")
    spark.sql(s"DELETE FROM graft.`$t` WHERE v >= 40")
    assert(spark.sql(s"SELECT sum(v) AS s FROM graft.`$t`").head.getLong(0) === 60L)
    Seq((2L, 200L, "two")).toDF("id", "v", "tag")
      .createOrReplaceTempView("sqldml_path_src")
    spark.sql(
      s"""MERGE INTO graft.`$t` t USING sqldml_path_src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |""".stripMargin)
    assert(spark.sql(s"SELECT v FROM graft.`$t` WHERE id = 2").head.getLong(0) === 200L)
    // time travel over the path spelling
    assert(spark.sql(s"SELECT count(*) AS n FROM graft.`$t` VERSION AS OF 0")
      .head.getLong(0) === 4L)
    // a non-table path gets its original node back and Spark's own
    // judgment speaks (here: direct-file-query unsupported), not ours
    val e = intercept[Exception](
      spark.sql("SELECT * FROM graft.`/no/such/table`").collect())
    assert(!e.getMessage.contains("graft SQL DML"))
  }

  test("MERGE WITH SCHEMA EVOLUTION widens the target with source-only columns") {
    val t = java.nio.file.Files.createTempDirectory("sqldml_evo").toString
    VersionedTable.commit(base, t, mode = "overwrite")
    Seq((2L, 222L, "beta2", 0.9), (7L, 700L, "eta", 0.1))
      .toDF("id", "v", "tag", "score")
      .createOrReplaceTempView("sqldml_evo_src")
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO graft.`$t` t
         |USING sqldml_evo_src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *
         |""".stripMargin)
    val out = VersionedTable.readVersion(spark, t)
    assert(out.columns.toSeq === Seq("id", "v", "tag", "score"))
    val byId = out.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getString(2), if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    assert(byId(2L) === ((222L, "beta2", 0.9)))   // matched: updated + new col
    assert(byId(7L) === ((700L, "eta", 0.1)))     // inserted with new col
    assert(byId(1L) === ((10L, "alpha", null)))   // untouched: new col NULL
  }

  test("concurrent SQL DMLs on disjoint slices both land") {
    val t = java.nio.file.Files.createTempDirectory("sqldml_race").toString
    VersionedTable.commit((1L to 40L).toDF("id").withColumn("v", col("id")), t,
      mode = "overwrite")
    spark.sql("DROP TABLE IF EXISTS sqldml_race_t")
    spark.sql(s"CREATE TABLE sqldml_race_t USING graft LOCATION '$t'")
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val f1 = Future(spark.sql("UPDATE sqldml_race_t SET v = v + 100 WHERE id <= 20"))
    val f2 = Future(spark.sql("UPDATE sqldml_race_t SET v = v + 1000 WHERE id > 20"))
    Await.result(Future.sequence(Seq(f1, f2)), 120.seconds)
    val out = VersionedTable.readVersion(spark, t)
    assert(out.filter(col("id") <= 20 && col("v") === col("id") + 100).count() === 20L)
    assert(out.filter(col("id") > 20 && col("v") === col("id") + 1000).count() === 20L)
    assert(VersionedTable.latestVersion(spark, t) === 2L)
  }

  test("DML through a temp view over a format-loaded graft relation") {
    val (path, _) = fixture(base, "view")
    spark.read.format("graft").load(path).createOrReplaceTempView("sqldml_view_v")
    spark.sql("DELETE FROM sqldml_view_v WHERE id = 1")
    assert(rows(path).map(_._1) === Set(2L, 3L, 4L))
  }
}
