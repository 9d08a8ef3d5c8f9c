package graft

import java.time.Instant

import org.apache.spark.sql.functions.col

import graft.sources.{GraftTable, VersionedTable}

/** Wall-clock commit timestamps on every USER-FACING write face
  * ([[VersionedTable.TsNow]]): a table built through pure SQL (or the
  * format writer, or the fluent API) must carry CURRENT, STRICTLY
  * ORDERED commit timestamps — an epoch-anchored default would make
  * every commit look 56 years stale, vacuously passing every age-based
  * retention cutoff (`VACUUM ... RETAIN n HOURS`, `restoreToTimestamp`)
  * and degenerating `TIMESTAMP AS OF` (all commits share one instant).
  * Deterministic timestamps stay the explicit opt-in (`ts` option /
  * parameter), which the library-core epoch default serves. */
final class WallClockTsSpec extends SparkSpec {

  private def historyTs(path: String): Seq[(Long, Instant)] = {
    VersionedTable.history(spark, path).select("version", "ts").collect()
      .map(r => (r.getLong(0), Instant.parse(r.getString(1))))
      .sortBy(_._1).toSeq
  }

  test("a table built through PURE SQL has current, strictly ordered commit timestamps") {
    val t0 = Instant.now()
    val loc = java.nio.file.Files.createTempDirectory("graft_wc_sql").toString
    spark.sql("DROP TABLE IF EXISTS wc_sql_t")
    spark.sql(
      s"""CREATE TABLE wc_sql_t USING graft LOCATION '$loc' AS
         |SELECT id, id * 10.0 AS v FROM range(100)""".stripMargin)
    spark.sql("INSERT INTO wc_sql_t SELECT id, id * 10.0 FROM range(100, 150)")
    spark.sql("UPDATE wc_sql_t SET v = v + 1 WHERE id % 10 = 0")
    spark.sql("DELETE FROM wc_sql_t WHERE id >= 140")
    spark.sql("OPTIMIZE wc_sql_t")
    val hist = historyTs(loc)
    assert(hist.map(_._1) == Seq(0L, 1L, 2L, 3L, 4L))
    val t1 = Instant.now()
    // current: every commit between the test's own clock reads
    hist.foreach { case (v, ts) =>
      assert(!ts.isBefore(t0) && !ts.isAfter(t1.plusSeconds(1)),
        s"version $v stamped $ts outside [$t0, $t1]")
    }
    // strictly ordered even when commits land within the same millisecond
    hist.sliding(2).foreach {
      case Seq((_, a), (v, b)) => assert(a.isBefore(b),
        s"version $v ts $b does not advance past $a")
      case _ => ()
    }
    // TIMESTAMP AS OF resolves BETWEEN commits: the instant of v1
    // (post-INSERT, pre-UPDATE) sees the inserted-but-unmodified state
    val atV1 = hist(1)._2.toString
    val n = spark.sql(
      s"SELECT count(*) FROM wc_sql_t TIMESTAMP AS OF '$atV1'").head().getLong(0)
    assert(n == 150L, s"TIMESTAMP AS OF '$atV1' resolved $n rows, expected 150")
    val sumAtV1 = spark.sql(
      s"SELECT cast(sum(v) AS double) FROM wc_sql_t TIMESTAMP AS OF '$atV1'")
      .head().getDouble(0)
    val sumRaw = (0 until 150).map(_ * 10.0).sum
    assert(math.abs(sumAtV1 - sumRaw) < 1e-6, "v1 snapshot must predate the UPDATE")
    // RESTORE TO TIMESTAMP AS OF between commits lands on v1 exactly
    spark.sql(s"RESTORE TABLE wc_sql_t TO TIMESTAMP AS OF '$atV1'")
    assert(spark.sql("SELECT count(*) FROM wc_sql_t").head().getLong(0) == 150L)
    // and the restore commit itself is stamped current + ordered
    val hist2 = historyTs(loc)
    assert(hist2.last._1 == 5L && hist2.last._2.isAfter(hist.last._2))
    spark.sql("DROP TABLE wc_sql_t")
  }

  test("format-face batch writes default to wall clock; the ts option stays the deterministic opt-in") {
    val t0 = Instant.now()
    val p = java.nio.file.Files.createTempDirectory("graft_wc_fmt").toString + "/t"
    spark.range(10).toDF("id").write.format("graft").save(p)
    spark.range(5).toDF("id").write.format("graft").mode("append").save(p)
    val hist = historyTs(p)
    assert(hist.size == 2 && hist.head._2.isBefore(hist(1)._2))
    hist.foreach { case (_, ts) => assert(!ts.isBefore(t0)) }
    // explicit ts pins deterministically (fixtures/replay)
    spark.range(3).toDF("id").write.format("graft").mode("append")
      .option("ts", "2026-02-01T00:00:00Z").save(p)
    assert(historyTs(p).last._2 == Instant.parse("2026-02-01T00:00:00Z"))
  }

  test("fluent-API DML and the streaming sink stamp current monotonic timestamps") {
    val t0 = Instant.now()
    val p = java.nio.file.Files.createTempDirectory("graft_wc_fl").toString + "/t"
    spark.range(50).selectExpr("id", "id * 2.0 AS v").write.format("graft").save(p)
    val tbl = GraftTable.forPath(spark, p)
    tbl.update("id % 5 = 0", Map("v" -> "v + 1"))
    tbl.delete("id >= 40")
    tbl.optimize()
    val hist = historyTs(p)
    assert(hist.size == 4)
    hist.sliding(2).foreach {
      case Seq((_, a), (_, b)) => assert(a.isBefore(b))
      case _ => ()
    }
    hist.foreach { case (_, ts) => assert(!ts.isBefore(t0)) }

    // streaming sink: wall-clock default (per-batch clock read), and
    // tsBaseEpochSec keeps the deterministic opt-in
    val src = java.nio.file.Files.createTempDirectory("graft_wc_src").toString
    val sink = java.nio.file.Files.createTempDirectory("graft_wc_snk").toString + "/t"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_wc_ck").toString
    spark.range(20).selectExpr("id", "id * 1.0 AS v")
      .write.mode("overwrite").parquet(src)
    val q = spark.readStream.schema(
        spark.read.parquet(src).schema).parquet(src)
      .writeStream.format("graft")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start(sink)
    q.awaitTermination()
    val sinkTs = historyTs(sink)
    assert(sinkTs.nonEmpty)
    sinkTs.foreach { case (_, ts) => assert(!ts.isBefore(t0),
      s"sink commit stamped $ts, before test start $t0") }
    assert(VersionedTable.readVersion(spark, sink).count() == 20L)
  }
}
