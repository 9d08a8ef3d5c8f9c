package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.Streams
import graft.streaming.Streams.CdcChange

/** Both faces of CDC apply: the batch window reduction ([[Streams.cdcApply]])
  * and the mapGroupsWithState fold ([[Streams.cdcStates]]) must converge to
  * the SAME snapshot from the same change feed — including when the stream
  * delivers changes out of order across micro-batches, since both sides use
  * the identical (ts, event_id) total order. */
class CdcStreamSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  // user 1: two upserts, latest wins.
  // user 2: upsert then a later delete → gone from the snapshot.
  // user 3: upsert and delete at the SAME ts; event_id 6 > 5 breaks the
  //         tie toward the delete → gone.
  // user 4: delete then a LATER upsert → resurrected, survives.
  private val feed = Seq(
    CdcChange(1L, ts("2024-01-01 10:00:00"), 1L, "upsert", Some(1.0)),
    CdcChange(1L, ts("2024-01-01 11:00:00"), 3L, "upsert", Some(2.0)),
    CdcChange(2L, ts("2024-01-01 10:30:00"), 2L, "upsert", Some(5.0)),
    CdcChange(2L, ts("2024-01-01 12:00:00"), 4L, "delete", None),
    CdcChange(3L, ts("2024-01-01 12:00:00"), 5L, "upsert", Some(7.0)),
    CdcChange(3L, ts("2024-01-01 12:00:00"), 6L, "delete", None),
    CdcChange(4L, ts("2024-01-01 09:00:00"), 7L, "delete", None),
    CdcChange(4L, ts("2024-01-01 09:30:00"), 8L, "upsert", Some(9.0)))

  test("batch face: latest op per key wins; terminal delete removes the key") {
    import spark.implicits._
    val out = Streams.cdcApply(feed.toDF()).collect()
      .map(r => r.getAs[Long]("user_id") -> r).toMap
    assert(out.keySet === Set(1L, 4L))
    assert(out(1L).getAs[Long]("n_changes") === 2)
    assert(out(1L).getAs[Double]("last_value") === 2.0)
    assert(out(1L).getAs[Timestamp]("last_ts") === ts("2024-01-01 11:00:00"))
    assert(out(4L).getAs[Long]("n_changes") === 2)
    assert(out(4L).getAs[Double]("last_value") === 9.0)
  }

  test("batch face costs exactly one shuffle (both windows share the key)") {
    import spark.implicits._
    val plan = Streams.cdcApply(feed.toDF()).queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).length === 1, plan)
  }

  test("streaming face converges to the batch snapshot under out-of-order delivery") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[CdcChange]
    val q = Streams.cdcStates(spark, mem.toDS())
      .writeStream.format("memory").queryName("cdc_snap")
      .outputMode(OutputMode.Update()).start()
    try {
      // NEWER half of each key's history first, older half second: the
      // fold must not regress the state when stale changes arrive late.
      mem.addData(feed(1), feed(3), feed(5), feed(7))
      q.processAllAvailable()
      mem.addData(feed(0), feed(2), feed(4), feed(6))
      q.processAllAvailable()
    } finally q.stop()

    // Update mode appends one row per (key, batch); n_changes strictly
    // grows per key, so max-n row per key IS the final state.
    val snaps = spark.table("cdc_snap").as[Streams.CdcSnapshot].collect()
      .groupBy(_.user_id).map { case (_, rows) => rows.maxBy(_.n_changes) }

    assert(snaps.filter(_.deleted).map(_.user_id).toSet === Set(2L, 3L))
    val live = snaps.filterNot(_.deleted)
      .map(s => (s.user_id, s.n_changes, s.last_ts, s.last_value)).toSet
    val batch = Streams.cdcApply(feed.toDF()).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_changes"),
        r.getAs[Timestamp]("last_ts"), Option(r.getAs[Double]("last_value")))).toSet
    assert(live === batch)
  }
}
