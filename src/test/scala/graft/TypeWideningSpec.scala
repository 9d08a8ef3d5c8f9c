package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.sources.VersionedTable

/** Type widening (Delta's type-widening feature re-derived) and the
  * manifest-schema scan that enables it: reads request the RECORDED
  * snapshot schema instead of a mergeSchema footer-union, so a column
  * widened by an evolved append (int32 files + int64 schema) reads
  * through Spark's per-file widening type promotion — and every scan
  * saves the one-footer-per-file planning pass mergeSchema costs. */
class TypeWideningSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("vt_tw").toString

  test("mergeSchema append widens int->long and float->double; old files read through") {
    val t = freshTable()
    VersionedTable.commit(
      Seq((1, 1.5f), (2, 2.5f)).toDF("id", "score"),
      t, mode = "overwrite")
    VersionedTable.commit(
      Seq((3000000000L, 3.5d)).toDF("id", "score"),
      t, mode = "append", mergeSchema = true)
    val head = VersionedTable.readVersion(spark, t)
    assert(head.schema("id").dataType === LongType)
    assert(head.schema("score").dataType === DoubleType)
    assert(head.select("id").collect().map(_.getLong(0)).toSet ===
      Set(1L, 2L, 3000000000L))
    // float 1.5/2.5 are exactly representable: the widened read is exact
    assert(head.filter(col("score") === 1.5d).count() === 1L)
    // time travel sees v0's own (narrow) schema
    assert(VersionedTable.readVersion(spark, t, 0L)
      .schema("id").dataType === org.apache.spark.sql.types.IntegerType)
  }

  test("widening without mergeSchema is schema drift; incompatible types always reject") {
    val t = freshTable()
    VersionedTable.commit(Seq((1, 10)).toDF("id", "v"), t, mode = "overwrite")
    val e = intercept[VersionedTable.SchemaMismatchException] {
      VersionedTable.commit(Seq((2L, 20)).toDF("id", "v"), t, mode = "append")
    }
    assert(e.getMessage.contains("widens"))
    intercept[VersionedTable.SchemaMismatchException] { // string vs int: never
      VersionedTable.commit(Seq(("x", 30)).toDF("id", "v"), t,
        mode = "append", mergeSchema = true)
    }
  }

  test("narrow batches upcast into a widened table; stats prune across mixed files") {
    val t = freshTable()
    VersionedTable.commit(
      spark.range(0, 100).select(col("id").cast("int").as("id"),
        (col("id") * 2).cast("int").as("v")).repartitionByRange(4, col("v")),
      t, mode = "overwrite")
    VersionedTable.commit(
      Seq((200L, 400L)).toDF("id", "v"), t, mode = "append", mergeSchema = true)
    // a plain-int batch into the now-long table: no mergeSchema needed,
    // lands upcast, schema stays long
    VersionedTable.commit(Seq((300, 600)).toDF("id", "v"), t, mode = "append")
    val head = VersionedTable.readVersion(spark, t)
    assert(head.schema("v").dataType === LongType)
    assert(head.count() === 102L)
    // readWhere prunes on stats recorded by files of BOTH widths and
    // agrees with the row-level filter
    val pruned = VersionedTable.prunedFiles(spark, t, "v >= 300")
    assert(pruned.size < VersionedTable.snapshotFiles(spark, t).size)
    assert(VersionedTable.readWhere(spark, t, "v >= 300")
      .select("id").collect().map(_.getLong(0)).toSet ===
      VersionedTable.readVersion(spark, t).filter(col("v") >= 300)
        .select("id").collect().map(_.getLong(0)).toSet)
  }

  test("DML through a widened table: delete, update, merge, counts stay exact") {
    val t = freshTable()
    VersionedTable.commit(
      Seq((1, 10), (2, 20), (3, 30)).toDF("id", "v"), t, mode = "overwrite")
    VersionedTable.commit(Seq((4L, 40L)).toDF("id", "v"), t,
      mode = "append", mergeSchema = true)
    VersionedTable.delete(spark, t, "v = 20")
    VersionedTable.update(spark, t, "id = 1", Map("v" -> "11"))
    // a narrow merge source upcasts into the widened table
    VersionedTable.merge(Seq((3, 33), (5, 50)).toDF("id", "v"), t, Seq("id"))
    assert(VersionedTable.readVersion(spark, t)
      .select("id", "v").collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((1L, 11L), (3L, 33L), (4L, 40L), (5L, 50L)))
    assert(VersionedTable.rowCount(spark, t) === 4L)
    // wider-typed merge into a narrow table rejects loudly
    val tn = freshTable()
    VersionedTable.commit(Seq((1, 10)).toDF("id", "v"), tn, mode = "overwrite")
    intercept[VersionedTable.SchemaMismatchException] {
      VersionedTable.merge(Seq((1L, 99L)).toDF("id", "v"), tn, Seq("id"))
    }
  }

  test("widening composes with column mapping and deletion vectors") {
    val t = freshTable()
    VersionedTable.commit(
      Seq((1, 10), (2, 20)).toDF("id", "amount"), t, mode = "overwrite")
    VersionedTable.renameColumn(spark, t, "amount", "value")
    VersionedTable.commit(Seq((3L, 30L)).toDF("id", "value"), t,
      mode = "append", mergeSchema = true)
    VersionedTable.deleteMergeOnRead(spark, t, "id = 2",
      maxVectoredFraction = 1.0)
    val head = VersionedTable.readVersion(spark, t)
    assert(head.schema("value").dataType === LongType)
    assert(head.select("id", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 10L), (3L, 30L)))
    assert(VersionedTable.rowCount(spark, t) === 2L)
  }
}
