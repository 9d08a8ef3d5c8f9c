package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._

import graft.sources.{GraftRelation, VersionedTable}

/** Differential property test for the format face's filter pushdown
  * soundness: the V1 `buildScan` translation may only ever WIDEN a
  * predicate (Spark re-evaluates the original above the scan), never
  * narrow it — a narrow push drops rows AT THE SCAN and nothing above
  * can resurrect them. The historical bug class: `Not(And(a, b))` where
  * one conjunct's attribute fails the `simple()` name guard widened the
  * inner And to `a`, so the pushed `Not(a)` was NARROWER than `¬(a∧b)`.
  *
  * The table deliberately carries a hyphenated column (`the-v`) so the
  * name guard rejects half the atoms — every random Not/And/Or mix over
  * {simple, non-simple} attributes crosses the widened/exact boundary.
  * Format read must equal `readVersion().filter` on all of them. The
  * seed is fixed: failures reproduce. */
class DataSourcePushdownPropertySpec extends SparkSpec {

  test("unit: translation is exactness-aware — Not/Or never push over a widened child") {
    def push(f: Filter) = GraftRelation.toColumn(f)
    val simpleEq = EqualTo("id", 1L)
    val oddGt = GreaterThan("the-v", 5L) // name fails the simple() guard
    // leaves: simple pushes, non-simple doesn't
    assert(push(simpleEq).isDefined && push(oddGt).isEmpty)
    // one-sided And push is the sound widening
    assert(push(And(simpleEq, oddGt)).map(_.toString)
      === push(simpleEq).map(_.toString))
    // the bug class: Not over a partially-translated And must NOT push
    assert(push(Not(And(simpleEq, oddGt))).isEmpty)
    assert(push(Not(And(oddGt, simpleEq))).isEmpty)
    // Not over an exact child still pushes
    assert(push(Not(simpleEq)).isDefined)
    assert(push(Not(And(simpleEq, EqualTo("id", 2L)))).isDefined)
    // Or: a failed child kills the push; widened children propagate the
    // widening, so Not(Or(widened, exact)) must not push either
    assert(push(Or(simpleEq, oddGt)).isEmpty)
    assert(push(Or(And(simpleEq, oddGt), simpleEq)).isDefined)
    assert(push(Not(Or(And(simpleEq, oddGt), simpleEq))).isEmpty)
    // nested: Not(Not(exact)) pushes; Not(Not(widened)) doesn't
    assert(push(Not(Not(simpleEq))).isDefined)
    assert(push(Not(Not(And(simpleEq, oddGt)))).isEmpty)
  }

  test("format read ≡ readVersion().filter over 60 random Not/And/Or trees on a hyphen-named column") {
    val t = java.nio.file.Files.createTempDirectory("ds_pushprop").toString
    // `the-v` fails simple(); `id`/`cc` pass — every mixed tree crosses
    // the exact/widened boundary somewhere
    val base = spark.range(1, 201).select(
      col("id"),
      (col("id") % 7).as("the-v"),
      concat(lit("c"), lpad((col("id") % 10).cast("string"), 2, "0")).as("cc"))
      .repartitionByRange(4, col("id"))
    VersionedTable.commit(base, t, mode = "overwrite", ts = "2026-01-01T00:00:00Z")

    val lib = VersionedTable.readVersion(spark, t)
    val fmt = spark.read.format("graft").load(t)

    val rnd = new scala.util.Random(37L) // fixed seed: failures reproduce
    def atom(): String = rnd.nextInt(6) match {
      case 0 => s"id ${Seq("<", "<=", "=", ">", ">=")(rnd.nextInt(5))} ${rnd.nextInt(220) - 10}"
      case 1 => s"`the-v` ${Seq("<", "<=", "=", ">", ">=")(rnd.nextInt(5))} ${rnd.nextInt(9) - 1}"
      case 2 => f"cc = 'c${rnd.nextInt(12)}%02d'"
      case 3 => s"id IN (${Seq.fill(3)(rnd.nextInt(200) + 1).mkString(", ")})"
      case 4 => s"`the-v` IN (${Seq.fill(2)(rnd.nextInt(7)).mkString(", ")})"
      case _ => f"cc LIKE 'c${rnd.nextInt(10)}%%'"
    }
    def tree(depth: Int): String =
      if (depth == 0 || rnd.nextInt(3) == 0) atom()
      else rnd.nextInt(3) match {
        case 0 => s"(${tree(depth - 1)} AND ${tree(depth - 1)})"
        case 1 => s"(${tree(depth - 1)} OR ${tree(depth - 1)})"
        case _ => s"(NOT ${tree(depth - 1)})"
      }

    var nonEmpty = 0
    (0 until 60).foreach { i =>
      val c = tree(3)
      val got = fmt.filter(expr(c)).select("id").collect().map(_.getLong(0)).toSet
      val want = lib.filter(expr(c)).select("id").collect().map(_.getLong(0)).toSet
      assert(got === want, s"format pushdown diverged on predicate #$i: $c")
      if (want.nonEmpty) nonEmpty += 1
    }
    // the battery must actually exercise row-bearing predicates — an
    // all-empty stream would pass vacuously
    assert(nonEmpty >= 20, s"only $nonEmpty/60 predicates selected any row")
  }
}
