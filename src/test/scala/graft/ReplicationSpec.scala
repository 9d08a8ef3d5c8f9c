package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.VersionedTable
import graft.streaming.Streams

/** Continuous cross-table replication: the CDF stream feeding the
  * full-clause merge — every DML face on the source (append, COW
  * update, MoR update's delete+insert pair, MoR delete, COW delete)
  * must land the replica bit-equal to the source, across restarts,
  * idempotently. */
class ReplicationSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def snap(t: String): Set[(Long, String, Long)] =
    VersionedTable.readVersion(spark, t)
      .select("id", "state", "amount").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  test("replica equals source through every DML face, across runs, idempotently") {
    val src = fresh("repl_src")
    val dst = fresh("repl_dst")
    val ckp = fresh("repl_ckp")
    def df(rows: (Long, String, Long)*): DataFrame =
      rows.toDF("id", "state", "amount")

    VersionedTable.commit(df((1, "a", 10), (2, "a", 20), (3, "b", 30)),
      src, mode = "overwrite", ts = "2026-01-01T00:00:00Z")
    VersionedTable.commit(df((4, "b", 40)), src, ts = "2026-01-02T00:00:00Z")
    Streams.replicateStream(spark, src, dst, Seq("id"), ckp)
    assert(snap(dst) === snap(src))

    // second wave: every mutation shape, then resume from the checkpoint
    VersionedTable.update(spark, src, "id = 1", Map("amount" -> "11"),
      ts = "2026-01-03T00:00:00Z")
    VersionedTable.updateMergeOnRead(spark, src, "id = 2",
      Map("state" -> "'z'"), ts = "2026-01-04T00:00:00Z",
      maxVectoredFraction = 1.0) // reaches the feed as delete+insert
    VersionedTable.deleteMergeOnRead(spark, src, "id = 3",
      ts = "2026-01-05T00:00:00Z", maxVectoredFraction = 1.0)
    VersionedTable.delete(spark, src, "id = 4", ts = "2026-01-06T00:00:00Z")
    VersionedTable.commit(df((9, "c", 90)), src, ts = "2026-01-07T00:00:00Z")
    Streams.replicateStream(spark, src, dst, Seq("id"), ckp)
    assert(snap(dst) === snap(src))
    assert(snap(dst) === Set((1L, "a", 11L), (2L, "z", 20L), (9L, "c", 90L)))

    // no new commits: the resumed stream applies nothing
    val v = VersionedTable.latestVersion(spark, dst)
    Streams.replicateStream(spark, src, dst, Seq("id"), ckp)
    assert(VersionedTable.latestVersion(spark, dst) === v)
    assert(snap(dst) === snap(src))
  }

  test("bounded catch-up: a long-down replica drains in >1 rate-limited micro-batch") {
    val src = fresh("repl_src2")
    val dst = fresh("repl_dst2")
    val ckp = fresh("repl_ckp2")
    def df(rows: (Long, String, Long)*): DataFrame =
      rows.toDF("id", "state", "amount")

    VersionedTable.commit(df((1, "a", 10)), src, mode = "overwrite",
      ts = "2026-01-01T00:00:00Z")
    Streams.replicateStream(spark, src, dst, Seq("id"), ckp)
    assert(snap(dst) === snap(src))

    // replica is down while the source takes 20 commits
    (1L to 20L).foreach { i =>
      VersionedTable.commit(df((100L + i, "w", i)), src,
        ts = java.time.Instant.parse("2026-01-02T00:00:00Z").plusSeconds(i).toString)
    }
    // resume with a 5-manifest cap: AvailableNow must drain the backlog
    // as MULTIPLE bounded micro-batches, each checkpointed
    val q = Streams.changesStreamQuery(spark, src, Seq("id"), ckp,
      maxFilesPerTrigger = 5)(Streams.replicateBatch(spark, dst, Seq("id")))
    q.awaitTermination()
    val applied = q.recentProgress.count(_.numInputRows > 0)
    assert(applied > 1,
      s"20-version backlog with maxFilesPerTrigger=5 drained in $applied batch(es)")
    assert(snap(dst) === snap(src))
    assert(snap(dst).size === 21)
  }
}
