package graft

import org.apache.spark.sql.functions._

import graft.sources.{GraftTable, VersionedTable}

/** CONVERT TO TABLE (Delta's CONVERT TO DELTA re-derived): a plain
  * parquet directory becomes a versioned table in place — zero bytes
  * rewritten — and every capability (pruning, counts, DML, optimize,
  * time travel) works over the foreign-named files from the first
  * read. */
class ConvertSpec extends SparkSpec {
  import spark.implicits._

  private def plainDir(n: Int = 40): String = {
    val d = java.nio.file.Files.createTempDirectory("vt_conv").toString
    spark.range(0, n)
      .select(col("id"), (col("id") % 4).as("grp"), (col("id") * 10).as("v"))
      .repartitionByRange(4, col("v"))
      .write.mode("overwrite").parquet(d)
    d
  }

  test("convert writes one manifest, rewrites nothing, reads and prunes work") {
    val d = plainDir()
    val names = new java.io.File(d).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.lastModified)).toMap
    assert(VersionedTable.convert(spark, d) === 0L)
    // nothing rewritten: same files, same mtimes
    val after = new java.io.File(d).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.lastModified)).toMap
    assert(after === names)
    assert(VersionedTable.readVersion(spark, d).count() === 40L)
    assert(VersionedTable.rowCount(spark, d) === 40L)
    // footer stats recorded at convert time prune the range layout
    val pruned = VersionedTable.prunedFiles(spark, d, "v >= 300")
    assert(pruned.nonEmpty && pruned.size < names.size)
    assert(VersionedTable.readWhere(spark, d, "v >= 300").count() ===
      VersionedTable.readVersion(spark, d).filter(col("v") >= 300).count())
    // double convert rejected
    intercept[IllegalArgumentException] { VersionedTable.convert(spark, d) }
  }

  test("DML over foreign files: COW and MoR migrate touched files natively") {
    val d = plainDir()
    VersionedTable.convert(spark, d)
    // append lands native
    VersionedTable.commit(Seq((100L, 0L, 1000L)).toDF("id", "grp", "v"), d)
    // COW delete discovers + rewrites the touched FOREIGN files
    VersionedTable.delete(spark, d, "v < 50")
    assert(VersionedTable.readVersion(spark, d)
      .filter(col("v") < 50).count() === 0L)
    assert(VersionedTable.rowCount(spark, d) ===
      VersionedTable.readVersion(spark, d).count())
    // MoR delete vectors a foreign file without rewriting it
    val before = VersionedTable.snapshotFiles(spark, d).toSet
    VersionedTable.deleteMergeOnRead(spark, d, "v = 100",
      maxVectoredFraction = 1.0)
    assert(VersionedTable.snapshotFiles(spark, d).toSet === before)
    assert(VersionedTable.readVersion(spark, d)
      .filter(col("v") === 100).count() === 0L)
    // merge upserts across foreign + native files
    VersionedTable.merge(Seq((100L, 0L, 2000L), (101L, 1L, 2010L))
      .toDF("id", "grp", "v"), d, Seq("id"))
    assert(VersionedTable.readVersion(spark, d)
      .filter(col("id") >= 100).count() === 2L)
  }

  test("optimize migrates everything into the native layout; history spans the epochs") {
    val d = plainDir()
    VersionedTable.convert(spark, d, ts = "2026-01-01T00:00:00Z")
    val want = VersionedTable.readVersion(spark, d)
      .collect().map(_.toSeq).toSet
    VersionedTable.optimize(spark, d, ts = "2026-01-02T00:00:00Z")
    assert(VersionedTable.snapshotFiles(spark, d)
      .forall(_.startsWith("files/c")), "optimize left foreign references")
    assert(VersionedTable.readVersion(spark, d)
      .collect().map(_.toSeq).toSet === want)
    // v0 (foreign layout) still time-travels
    assert(VersionedTable.readVersion(spark, d, 0L)
      .collect().map(_.toSeq).toSet === want)
    assert(GraftTable.forPath(spark, d).history().count() === 2L)
  }

  test("hive-partitioned source directories are rejected with guidance") {
    val d = java.nio.file.Files.createTempDirectory("vt_convp").toString
    spark.range(0, 10).select(col("id"), (col("id") % 2).as("p"))
      .write.partitionBy("p").mode("overwrite").parquet(d)
    val e = intercept[IllegalArgumentException] {
      VersionedTable.convert(spark, d)
    }
    assert(e.getMessage.contains("partitionBy"))
  }

  test("parquet in nested non-hive subdirectories converts too — never a partial table") {
    val d = java.nio.file.Files.createTempDirectory("vt_convn").toString
    spark.range(0, 10).select(col("id"), (col("id") * 10).as("v"))
      .coalesce(1).write.mode("overwrite").parquet(d)
    spark.range(10, 25).select(col("id"), (col("id") * 10).as("v"))
      .coalesce(1).write.mode("overwrite").parquet(s"$d/year_2025/jan")
    VersionedTable.convert(spark, d)
    assert(VersionedTable.readVersion(spark, d).count() === 25L)
    assert(VersionedTable.rowCount(spark, d) === 25L)
    // nested foreign files carry stats: pruning reaches them
    assert(VersionedTable.readWhere(spark, d, "v >= 150").count() === 10L)

    // hive dirs reject even when nested below a plain subdirectory
    val dh = java.nio.file.Files.createTempDirectory("vt_convnh").toString
    spark.range(0, 4).toDF("id").coalesce(1)
      .write.mode("overwrite").parquet(s"$dh/sub/p=1")
    val e = intercept[IllegalArgumentException](VersionedTable.convert(spark, dh))
    assert(e.getMessage.contains("partitionBy"))

    // a pre-existing files/ dir is the native layout's reserved name
    val df2 = java.nio.file.Files.createTempDirectory("vt_convf").toString
    spark.range(0, 4).toDF("id").coalesce(1)
      .write.mode("overwrite").parquet(s"$df2/files")
    val e2 = intercept[IllegalArgumentException](VersionedTable.convert(spark, df2))
    assert(e2.getMessage.contains("files"))
  }
}
