package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

/** Differential property battery for the SQL DML face: a deterministic
  * stream of random conditions (three-valued-logic comparisons, string
  * predicates whose literals contain alias-looking fragments like
  * "t." and quotes, AND/OR/NOT nests) drives paired DELETE/UPDATE
  * statements — SQL (with randomized qualifier spelling) against one
  * table, the library call against its twin — and the two tables must
  * stay row-identical through the whole chained history. This is the
  * bloom 40-predicate differential pattern applied to the qualifier
  * rewrite: any structural-dealias bug (mangled literal, misclassified
  * qualifier, three-valued-logic drift) diverges the twins. */
class SqlDmlPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)

  private def freshRows(n: Int, base: Long): DataFrame = {
    val tags = Seq("alpha", "t. literal", "s.thing", "it's", "be%ta", null)
    (0 until n).map { i =>
      val id = base + i
      val v: java.lang.Long = if (i % 7 == 3) null else java.lang.Long.valueOf(id * 10 % 97)
      (id, v, tags((i + (base % 5).toInt) % tags.length))
    }.toDF("id", "v", "tag")
  }

  /** Random boolean condition over (id, v, tag); depth-bounded. */
  private def cond(depth: Int): String = {
    def leaf(): String = rnd.nextInt(7) match {
      case 0 => s"id % ${2 + rnd.nextInt(5)} = ${rnd.nextInt(3)}"
      case 1 => s"v ${Seq("<", "<=", ">", ">=", "=")(rnd.nextInt(5))} ${rnd.nextInt(97)}"
      case 2 => "v IS NULL"
      case 3 => s"tag = '${Seq("alpha", "t. literal", "s.thing", "be%ta")(rnd.nextInt(4))}'"
      case 4 => "tag LIKE 'b%'"
      case 5 => "tag = 'it''s'"
      case 6 => s"id ${if (rnd.nextBoolean()) "<" else ">="} ${rnd.nextInt(60)}"
    }
    if (depth == 0) leaf()
    else rnd.nextInt(4) match {
      case 0 => s"(${cond(depth - 1)} AND ${cond(depth - 1)})"
      case 1 => s"(${cond(depth - 1)} OR ${cond(depth - 1)})"
      case 2 => s"(NOT ${cond(depth - 1)})"
      case _ => leaf()
    }
  }

  private def rows(p: String): Set[Seq[Any]] =
    VersionedTable.readVersion(spark, p).collect().map(_.toSeq.toVector: Seq[Any]).toSet

  test("40 random conditions: SQL DELETE/UPDATE ≡ library on twin tables") {
    val a = java.nio.file.Files.createTempDirectory("dmlprop_sql").toString
    val b = java.nio.file.Files.createTempDirectory("dmlprop_lib").toString
    val seed = freshRows(60, 0L)
    VersionedTable.commit(seed, a, mode = "overwrite")
    VersionedTable.commit(seed, b, mode = "overwrite")
    spark.sql("DROP TABLE IF EXISTS dmlprop_t")
    spark.sql(s"CREATE TABLE dmlprop_t USING graft LOCATION '$a'")

    var refill = 1L
    (1 to 40).foreach { i =>
      val c = cond(2)
      // randomized qualifier spelling on the SQL side: bare, aliased, or
      // table-name qualified (qualifying only the simple columns)
      val (fromClause, qc) = rnd.nextInt(3) match {
        case 0 => ("dmlprop_t", c)
        case 1 => ("dmlprop_t AS t",
          c.replaceAll("\\bid\\b", "t.id").replaceAll("\\bv\\b(?! IS)", "t.v"))
        case _ => ("dmlprop_t",
          c.replaceAll("\\bid\\b", "dmlprop_t.id"))
      }
      if (i % 2 == 0) {
        spark.sql(s"DELETE FROM $fromClause WHERE $qc")
        VersionedTable.delete(spark, b, c)
      } else {
        spark.sql(s"UPDATE $fromClause SET v = coalesce(v, 0) + 1 WHERE $qc")
        VersionedTable.update(spark, b, c, Map("v" -> "coalesce(v, 0) + 1"))
      }
      assert(rows(a) === rows(b), s"diverged after step $i: $c (sql: $qc)")
      if (i % 8 == 0) { // keep the corpus from emptying out
        val more = freshRows(30, refill * 1000L)
        VersionedTable.commit(more, a, mode = "append")
        VersionedTable.commit(more, b, mode = "append")
        refill += 1
      }
    }
    assert(VersionedTable.latestVersion(spark, a) ===
      VersionedTable.latestVersion(spark, b))
  }
}
