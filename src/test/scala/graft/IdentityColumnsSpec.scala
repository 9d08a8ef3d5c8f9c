package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.sources.{GraftTable, VersionedTable}

/** Identity columns (Delta `GENERATED ALWAYS AS IDENTITY`, re-derived):
  * declaration is creation-time metadata, the engine assigns unique
  * step-aligned strictly-advancing values on the commit faces, the
  * high-water mark rides table properties transactionally, and the DML
  * paths that cannot maintain the counter refuse loudly. */
class IdentityColumnsSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String = {
    val p = java.nio.file.Files.createTempDirectory("ident").toString
    val empty = spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      StructType(Seq(StructField("name", StringType), StructField("v", LongType))))
    VersionedTable.commit(empty, p, mode = "overwrite")
    p
  }

  private def rows(p: String): Array[org.apache.spark.sql.Row] =
    VersionedTable.readVersion(spark, p).collect()

  test("declare + append: unique, step-aligned, strictly advancing; hwm persists") {
    val p = freshTable()
    val t = GraftTable.forPath(spark, p)
    t.addIdentityColumn("id", start = 100L, step = 3L)
    // declared column widened the schema and the spec landed in props
    assert(t.identityColumns("id") ===
      VersionedTable.IdentitySpec(100L, 3L, always = true, None))

    VersionedTable.commit(Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("name", "v"),
      p, mode = "append")
    val ids1 = rows(p).map(_.getAs[Long]("id")).sorted
    assert(ids1.length === 3)
    assert(ids1.distinct.length === 3, "identity values must be unique")
    assert(ids1.forall(v => v >= 100L && (v - 100L) % 3L == 0L),
      s"values must be step-aligned from start: ${ids1.mkString(",")}")
    val hwm1 = t.identityColumns("id").highWaterMark.get
    assert(hwm1 === ids1.max, "hwm must record the max assigned value")

    // second batch: every value strictly beyond the recorded hwm
    VersionedTable.commit(Seq(("d", 4L), ("e", 5L)).toDF("name", "v"),
      p, mode = "append")
    val ids2 = rows(p).map(_.getAs[Long]("id")).sorted
    assert(ids2.length === 5 && ids2.distinct.length === 5)
    val newOnes = ids2.filterNot(ids1.contains)
    assert(newOnes.forall(_ > hwm1),
      s"second batch must assign beyond hwm $hwm1: ${newOnes.mkString(",")}")
    assert(t.identityColumns("id").highWaterMark.get === ids2.max)
  }

  test("single-partition batches assign densely from start (deterministic)") {
    val p = freshTable()
    GraftTable.forPath(spark, p).addIdentityColumn("id", start = 10L, step = 5L)
    val batch = Seq(("a", 1L), ("b", 2L), ("c", 3L), ("d", 4L))
      .toDF("name", "v").repartition(1).sortWithinPartitions("v")
    VersionedTable.commit(batch, p, mode = "append")
    // one partition → monotonically_increasing_id is 0..n-1 → dense
    val got = rows(p).sortBy(_.getAs[Long]("v")).map(_.getAs[Long]("id")).toSeq
    assert(got === Seq(10L, 15L, 20L, 25L))
  }

  test("GENERATED ALWAYS refuses batches carrying the column; BY DEFAULT passes them and advances hwm") {
    val p = freshTable()
    GraftTable.forPath(spark, p).addIdentityColumn("id", start = 1L, step = 1L)
    val carrying = Seq(("a", 1L, 7L)).toDF("name", "v", "id")
    val e = intercept[VersionedTable.SchemaMismatchException](
      VersionedTable.commit(carrying, p, mode = "append"))
    assert(e.getMessage.contains("GENERATED ALWAYS"))

    val q = freshTable()
    val tq = GraftTable.forPath(spark, q)
    tq.addIdentityColumn("id", start = 1L, step = 1L, always = false)
    VersionedTable.commit(Seq(("a", 1L, 50L)).toDF("name", "v", "id"),
      q, mode = "append")
    assert(tq.identityColumns("id").highWaterMark.get === 50L,
      "explicit BY DEFAULT values must advance the hwm past themselves")
    VersionedTable.commit(Seq(("b", 2L)).toDF("name", "v"), q, mode = "append")
    val ids = rows(q).map(_.getAs[Long]("id"))
    assert(ids.distinct.length === 2 && ids.max > 50L,
      "engine assignment after an explicit write must clear its value")
  }

  test("overwrite keeps the declaration and continues the counter") {
    val p = freshTable()
    val t = GraftTable.forPath(spark, p)
    t.addIdentityColumn("id", start = 1L, step = 1L)
    VersionedTable.commit(Seq(("a", 1L)).toDF("name", "v"), p, mode = "append")
    val hwm = t.identityColumns("id").highWaterMark.get
    VersionedTable.commit(Seq(("z", 9L), ("y", 8L)).toDF("name", "v"),
      p, mode = "overwrite")
    val ids = rows(p).map(_.getAs[Long]("id"))
    assert(ids.length === 2 && ids.forall(_ > hwm),
      "overwrite batches continue the counter, never restart it")
    assert(t.identityColumns("id").highWaterMark.get === ids.max)
  }

  test("creation-time only; counter-breaking DML refuses loudly") {
    val p = freshTable()
    VersionedTable.commit(Seq(("a", 1L)).toDF("name", "v"), p, mode = "append")
    val eLate = intercept[IllegalArgumentException](
      GraftTable.forPath(spark, p).addIdentityColumn("id"))
    assert(eLate.getMessage.contains("creation"))

    val q = freshTable()
    val tq = GraftTable.forPath(spark, q)
    tq.addIdentityColumn("id", start = 1L, step = 1L)
    VersionedTable.commit(Seq(("a", 1L), ("b", 2L)).toDF("name", "v"),
      q, mode = "append")
    // UPDATE SET on the identity column refuses
    val eUpd = intercept[UnsupportedOperationException](
      VersionedTable.update(spark, q, "v = 1", Map("id" -> "99")))
    assert(eUpd.getMessage.contains("IDENTITY"))
    // merge inserts refuse (cannot assign on that path)
    val src = Seq(("c", 3L)).toDF("name", "v")
    val eMrg = intercept[UnsupportedOperationException](
      tq.merge(src, Seq("name")).whenNotMatchedInsertAll().execute())
    assert(eMrg.getMessage.contains("identity"))
    // replaceWhere refuses
    val eRw = intercept[UnsupportedOperationException](
      VersionedTable.replaceWhere(VersionedTable.readVersion(spark, q), q, "v = 1"))
    assert(eRw.getMessage.contains("identity"))
    // but UPDATE on OTHER columns and DELETE still work
    VersionedTable.update(spark, q, "name = 'a'", Map("v" -> "42"))
    VersionedTable.delete(spark, q, "name = 'b'")
    val left = rows(q)
    assert(left.length === 1 && left.head.getAs[Long]("v") === 42L)
  }

  test("commitWithRetry assigns identity and advances the hwm; ALWAYS still refuses") {
    val p = freshTable()
    val t = GraftTable.forPath(spark, p)
    t.addIdentityColumn("id", start = 1L, step = 1L)
    VersionedTable.commitWithRetry(Seq(("a", 1L), ("b", 2L)).toDF("name", "v"), p)
    val ids1 = rows(p).map(_.getAs[Long]("id"))
    assert(ids1.length === 2 && ids1.distinct.length === 2,
      "the multi-writer append face must assign unique identity values")
    val hwm1 = t.identityColumns("id").highWaterMark.get
    assert(hwm1 === ids1.max, "the retry face must advance the hwm it assigned")
    // a second retry-append continues strictly past the mark
    VersionedTable.commitWithRetry(Seq(("c", 3L)).toDF("name", "v"), p)
    val ids2 = rows(p).map(_.getAs[Long]("id"))
    assert(ids2.length === 3 && ids2.distinct.length === 3)
    assert(ids2.filterNot(ids1.contains).forall(_ > hwm1))
    // GENERATED ALWAYS refuses explicit values on this face too
    intercept[VersionedTable.SchemaMismatchException] {
      VersionedTable.commitWithRetry(
        Seq(("x", 9L, 999L)).toDF("name", "v", "id"), p)
    }
  }

  test("commitWithRetry refuses to re-claim after a winner moved the identity counter") {
    val p = freshTable()
    GraftTable.forPath(spark, p).addIdentityColumn("id", start = 1L, step = 1L)
    // the winner lands between our data write and the manifest claim and
    // ADVANCES the counter — re-claiming our pre-assigned values could
    // duplicate the winner's, so the loop must surface instead of retry
    var once = true
    val e = intercept[VersionedTable.SchemaMismatchException] {
      VersionedTable.commitWithRetryImpl(
        Seq(("a", 1L)).toDF("name", "v"), p, "1970-01-01T00:00:00Z",
        mergeSchema = false, maxRetries = 5, { _ =>
          if (once) {
            once = false
            VersionedTable.commit(Seq(("w", 9L)).toDF("name", "v"), p,
              mode = "append")
          }
        })
    }
    assert(e.getMessage.contains("identity counter changed concurrently"))
    // no duplicates landed: only the winner's row is visible
    val ids = rows(p).map(_.getAs[Long]("id"))
    assert(ids.length === 1 && ids.distinct.length === 1)
  }

  test("merge UPDATE SET * never assigns an identity column the source carries") {
    import VersionedTable.MergeAction.Update
    val p = freshTable()
    val t = GraftTable.forPath(spark, p)
    t.addIdentityColumn("id", start = 1L, step = 1L)
    VersionedTable.commit(Seq(("a", 1L), ("b", 2L)).toDF("name", "v"), p,
      mode = "append")
    val before = rows(p).map(r =>
      r.getAs[String]("name") -> r.getAs[Long]("id")).toMap
    // the source carries id = 999 for both rows; SET * must not take it
    val src = Seq(("a", 10L, 999L), ("b", 20L, 999L)).toDF("name", "v", "id")
    VersionedTable.mergeClauses(src, p, Seq("name"),
      matched = Seq(Update()), notMatched = Seq.empty)
    val after = rows(p)
    assert(after.map(_.getAs[Long]("v")).sorted === Array(10L, 20L),
      "SET * must still take the source's data columns")
    after.foreach(r =>
      assert(r.getAs[Long]("id") === before(r.getAs[String]("name")),
        "SET * must leave the engine-owned identity column untouched"))
  }

  test("TBLPROPERTIES faces refuse the engine-managed identity namespace") {
    val p = freshTable()
    GraftTable.forPath(spark, p).addIdentityColumn("id")
    intercept[UnsupportedOperationException] {
      VersionedTable.setProperties(spark, p, Map("graft.identity.id" -> "oops"))
    }
    intercept[UnsupportedOperationException] {
      VersionedTable.unsetProperties(spark, p, Seq("graft.identity.id"))
    }
    // unrelated properties still flow
    VersionedTable.setProperties(spark, p, Map("graft.custom.note" -> "ok"))
    assert(GraftTable.forPath(spark, p).properties("graft.custom.note") === "ok")
  }

  test("an identity column cannot be a partition column (no footer stats, no hwm)") {
    val p = freshTable()
    GraftTable.forPath(spark, p).addIdentityColumn("id")
    val e = intercept[UnsupportedOperationException] {
      VersionedTable.commit(Seq(("a", 1L)).toDF("name", "v"), p,
        mode = "overwrite", partitionBy = Seq("id"))
    }
    assert(e.getMessage.contains("partition"))
  }

  test("hwm is transactional metadata: visible via properties, time-travel consistent") {
    val p = freshTable()
    val t = GraftTable.forPath(spark, p)
    t.addIdentityColumn("id", start = 1L, step = 1L)
    val vDecl = VersionedTable.latestVersion(spark, p)
    VersionedTable.commit(Seq(("a", 1L)).toDF("name", "v"), p, mode = "append")
    // raw property format is start|step|always|hwm
    val prop = t.properties("graft.identity.id")
    assert(prop.matches("""1\|1\|true\|\d+"""), prop)
    // head props carry the assigned hwm
    assert(t.identityColumns("id").highWaterMark.nonEmpty)
    assert(vDecl >= 0)
  }
}
