package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.{GraftTable, VersionedTable}

/** Differential property battery for the SQL MERGE translation: each
  * round draws a random clause set (conditional/unconditional matched
  * update/delete, not-matched insert, by-source update/delete) from a
  * small expression AST that renders TWO ways — SQL text over
  * nontrivial statement aliases (`tgt`/`src`) and the library's `t`/`s`
  * dialect — then runs the SQL MERGE against one table and the builder
  * against its twin. Any divergence in qualifier classification, clause
  * ordering, or condition fidelity (literals with dots and quotes are
  * in the value pool) splits the twins. */
class SqlMergePropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(7)

  /** Per-round spelling of the SOURCE key column in the SQL statement —
    * "id" for the same-named shape, anything else exercises the
    * differently-named ON key path (`ON tgt.id = src.key_id`), where the
    * translation must rename the source column to the target's name and
    * re-render every s-side reference under it. The library twin always
    * merges the un-renamed source on "id". */
  private var srcIdName = "id"

  /** Condition AST rendering to (sql-over-tgt/src, library-over-t/s). */
  private sealed trait C { def sql: String; def lib: String }
  private case class Atom(side: String, col: String, op: String, lit: String) extends C {
    def sql: String = {
      val c = if (side == "s" && col == "id") srcIdName else col
      s"${if (side == "t") "tgt" else "src"}.$c $op $lit"
    }
    def lib: String = s"$side.$col $op $lit"
  }
  private case class Not(c: C) extends C {
    def sql = s"(NOT ${c.sql})"; def lib = s"(NOT ${c.lib})"
  }
  private case class Bin(op: String, l: C, r: C) extends C {
    def sql = s"(${l.sql} $op ${r.sql})"; def lib = s"(${l.lib} $op ${r.lib})"
  }

  private def atom(sides: Seq[String]): C = {
    val side = sides(rnd.nextInt(sides.length))
    rnd.nextInt(4) match {
      case 0 => Atom(side, "v", Seq("<", ">=", "=")(rnd.nextInt(3)), rnd.nextInt(90).toString)
      case 1 => Atom(side, "tag", "=", Seq("'t. literal'", "'s.x'", "'it''s'")(rnd.nextInt(3)))
      case 2 => Atom(side, "id", "%", s"3 = ${rnd.nextInt(3)}") // id % 3 = k
      case _ => Atom(side, "v", ">", "40")
    }
  }
  private def cond(depth: Int, sides: Seq[String]): C =
    if (depth == 0) atom(sides)
    else rnd.nextInt(4) match {
      case 0 => Bin("AND", cond(depth - 1, sides), cond(depth - 1, sides))
      case 1 => Bin("OR", cond(depth - 1, sides), cond(depth - 1, sides))
      case 2 => Not(cond(depth - 1, sides))
      case _ => atom(sides)
    }

  private def freshRows(n: Int, base: Long): DataFrame =
    (0 until n).map { i =>
      val id = base + i
      (id, id * 7 % 97, Seq("alpha", "t. literal", "s.x", "it's")(i % 4))
    }.toDF("id", "v", "tag")

  private def rows(p: String): Set[Seq[Any]] =
    VersionedTable.readVersion(spark, p).collect().map(_.toSeq.toVector: Seq[Any]).toSet

  test("15 random clause sets: SQL MERGE ≡ merge builder on twin tables") {
    val a = java.nio.file.Files.createTempDirectory("mrgprop_sql").toString
    val b = java.nio.file.Files.createTempDirectory("mrgprop_lib").toString
    val seed = freshRows(50, 0L)
    VersionedTable.commit(seed, a, mode = "overwrite")
    VersionedTable.commit(seed, b, mode = "overwrite")
    spark.sql("DROP TABLE IF EXISTS mrgprop_t")
    spark.sql(s"CREATE TABLE mrgprop_t USING graft LOCATION '$a'")

    (1 to 15).foreach { i =>
      // source overlaps ~half the table plus fresh ids; half the rounds
      // spell the source key under a different name in the SQL
      srcIdName = if (rnd.nextBoolean()) "id"
        else Seq("key_id", "src_key", "recId")(rnd.nextInt(3))
      val src = freshRows(30, rnd.nextInt(40).toLong)
        .withColumn("v", col("v") + 100)
      src.withColumnRenamed("id", srcIdName).createOrReplaceTempView("mrgprop_src")

      // half the rounds carry an EXTRA (non-key) ON conjunct — the
      // conditional-match CDC shape. The builder twin passes it as the
      // merge's full-ON remainder (`extraOn`), which is exactly the
      // Delta classification the SQL translation must implement:
      // key-matching pairs failing it are not-matched on BOTH sides.
      val extraOn: Option[C] =
        if (rnd.nextBoolean()) Some(cond(1, Seq("t", "s"))) else None

      // matched clauses: optionally one conditional, then one unconditional
      val mUp = cond(1, Seq("t", "s"))
      val matchedSql = new StringBuilder
      var builder = GraftTable.forPath(spark, b)
        .merge(src, Seq("id"), extraOn.map(_.lib))
      if (rnd.nextBoolean()) {
        matchedSql ++= s"WHEN MATCHED AND ${mUp.sql} THEN DELETE\n"
        builder = builder.whenMatchedDelete(Some(mUp.lib))
        matchedSql ++= "WHEN MATCHED THEN UPDATE SET v = src.v\n"
        builder = builder.whenMatchedUpdate(Map("v" -> "s.v"), None)
      } else {
        matchedSql ++= "WHEN MATCHED THEN UPDATE SET *\n"
        builder = builder.whenMatchedUpdateAll(None)
      }
      // not matched: conditional insert half the time
      if (rnd.nextBoolean()) {
        val nm = cond(1, Seq("s"))
        matchedSql ++= s"WHEN NOT MATCHED AND ${nm.sql} THEN INSERT *\n"
        builder = builder.whenNotMatchedInsertAll(Some(nm.lib))
      } else {
        matchedSql ++= s"WHEN NOT MATCHED THEN INSERT (id, v, tag) VALUES (src.$srcIdName, src.v, src.tag)\n"
        builder = builder.whenNotMatchedInsert(
          Map("id" -> "s.id", "v" -> "s.v", "tag" -> "s.tag"))
      }
      // by source occasionally
      if (rnd.nextInt(3) == 0) {
        val bs = cond(1, Seq("t"))
        matchedSql ++= s"WHEN NOT MATCHED BY SOURCE AND ${bs.sql} THEN UPDATE SET tag = 'swept'\n"
        builder = builder.whenNotMatchedBySourceUpdate(Map("tag" -> "'swept'"), Some(bs.lib))
      }

      spark.sql(
        s"""MERGE INTO mrgprop_t AS tgt USING mrgprop_src AS src
           |ON tgt.id = src.$srcIdName${extraOn.fold("")(x => s" AND ${x.sql}")}
           |$matchedSql""".stripMargin)
      builder.execute()
      assert(rows(a) === rows(b),
        s"diverged after merge round $i (extra ON: ${extraOn.map(_.sql)}):\n$matchedSql")
    }
  }

  test("extra ON conjunct: Delta classification — stale pairs insert; key-less ON refuses") {
    val a = java.nio.file.Files.createTempDirectory("mrgex_sql").toString
    val b = java.nio.file.Files.createTempDirectory("mrgex_lib").toString
    val seed = freshRows(20, 0L)
    VersionedTable.commit(seed, a, mode = "overwrite")
    VersionedTable.commit(seed, b, mode = "overwrite")
    spark.sql("DROP TABLE IF EXISTS mrgex_t")
    spark.sql(s"CREATE TABLE mrgex_t USING graft LOCATION '$a'")
    // source: half the rows carry a HIGHER v (fresh), half a lower one
    // (stale). Delta's classification: `AND src.v > tgt.v` is part of
    // the JOIN condition, so a stale pair is not-matched on both sides
    // — the fresh rows UPDATE, and the stale rows INSERT as second rows
    // per key (Delta's documented merge-condition gotcha, reproduced
    // faithfully)
    val src = freshRows(20, 10L)
      .withColumn("v", when(col("id") % 2 === 0, col("v") + 1000)
        .otherwise(col("v") - 1000))
    src.createOrReplaceTempView("mrgex_src")
    spark.sql(
      """MERGE INTO mrgex_t AS tgt USING mrgex_src AS src
        |ON tgt.id = src.id AND src.v > tgt.v
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    GraftTable.forPath(spark, b).merge(src, Seq("id"), Some("s.v > t.v"))
      .whenMatchedUpdateAll()
      .whenNotMatchedInsertAll()
      .execute()
    assert(rows(a) === rows(b), "SQL extra-ON must equal the builder's extraOn")
    // matched ids are 10..19: the 5 even ones (fresh) updated in place,
    // the 5 odd ones (stale) inserted a second row per key — and the
    // original stale target rows survived unchanged
    val dupIds = VersionedTable.readVersion(spark, a).groupBy("id").count()
      .filter(col("count") > 1).collect().map(_.getLong(0)).sorted
    assert(dupIds.toSeq === Seq(11L, 13L, 15L, 17L, 19L),
      "stale key-matching source rows must insert (Delta's classification)")
    val updated = VersionedTable.readVersion(spark, a)
      .filter(col("id") === 10L).select("v").collect().map(_.getLong(0))
    assert(updated.forall(_ > 1000L), "fresh pairs must take the matched UPDATE")

    // an ON with no key equality at all is a loud refusal, not a cross join
    val e = intercept[UnsupportedOperationException](spark.sql(
      """MERGE INTO mrgex_t AS tgt USING mrgex_src AS src
        |ON src.v > tgt.v
        |WHEN MATCHED THEN DELETE""".stripMargin))
    assert(e.getMessage.contains("no target-column = source-column equality"))
    spark.sql("DROP TABLE mrgex_t")
  }
}
