package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.mobility.Mobility

/** Semantics + plan shape for the mobility trajectory operators.
  *
  * Semantic tests run on a hand-built trajectory whose transitions, stays,
  * flows, rog and entropy are computed by hand; plan tests assert the
  * one-user_id-shuffle design (no join in the window/aggregate operators,
  * no cartesian anywhere — the two join-bearing operators coLocation and
  * markovNextZoneEval must join on blocked/bounded keys).
  */
class MobilitySpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** user 1: zones 0 → 0 → 5 → 5 → 5 → 12 (one stay in 0, one in 5;
    * transitions 0→5, 5→12); user 2: zone 7 only (no transitions, one
    * stay); user 3: zones 3 → NULL → 4 (the NULL is skipped, so 3→4 IS a
    * transition). Night events (23:00) pin user 1's home to zone 0. */
  private lazy val silverToy: DataFrame = Seq(
    // (event_id, ts, user_id, zone_id)
    (1L, "2024-01-01 23:00:00", 1L, Some(0L)),
    (2L, "2024-01-01 23:10:00", 1L, Some(0L)),
    (3L, "2024-01-02 08:00:00", 1L, Some(5L)),
    (4L, "2024-01-02 08:30:00", 1L, Some(5L)),
    (5L, "2024-01-02 09:00:00", 1L, Some(5L)),
    (6L, "2024-01-02 10:00:00", 1L, Some(12L)),
    (7L, "2024-01-01 12:00:00", 2L, Some(7L)),
    (8L, "2024-01-01 12:30:00", 2L, Some(7L)),
    (9L, "2024-01-03 10:00:00", 3L, Some(3L)),
    (10L, "2024-01-03 11:00:00", 3L, None),
    (11L, "2024-01-03 12:00:00", 3L, Some(4L)),
  ).map { case (id, t, u, z) => (id, ts(t), u, z) }
    .toDF("event_id", "ts", "user_id", "zone_id")

  test("odMatrix counts different-zone consecutive pairs, skipping NULL zones") {
    val od = Mobility.odMatrix(silverToy)
      .select("origin", "dest", "n_trans")
      .as[(Long, Long, Long)].collect().toSet
    assert(od === Set((0L, 5L, 1L), (5L, 12L, 1L), (3L, 4L, 1L)))
  }

  test("odMatrix p_dest is conditional on origin and sums to 1 per origin") {
    val byOrigin = Mobility.odMatrix(silverToy)
      .groupBy("origin").agg(sum("p_dest").as("p"))
      .as[(Long, Double)].collect()
    byOrigin.foreach { case (o, p) =>
      assert(math.abs(p - 1.0) < 1e-12, s"origin $o sums to $p")
    }
  }

  test("nextZoneTopK ranks by count desc with dest-asc tiebreak") {
    // user 1 visits 5→12 and 0→5; add a second 0→9 user so origin 0 has a
    // tie between dests 5 and 9 → rank 1 must be dest 5 (asc tiebreak)
    val extra = Seq(
      (20L, ts("2024-01-05 10:00:00"), 9L, Some(0L)),
      (21L, ts("2024-01-05 11:00:00"), 9L, Some(9L)),
    ).toDF("event_id", "ts", "user_id", "zone_id")
    val top = Mobility.nextZoneTopK(silverToy.unionByName(extra), k = 1)
      .filter($"origin" === 0L)
      .select("rank", "dest").as[(Int, Long)].collect()
    assert(top.toSeq === Seq((1, 5L)))
  }

  test("stayEpisodes finds maximal same-zone runs with exact dwell") {
    val stays = Mobility.stayEpisodes(silverToy, minEvents = 2)
      .select("user_id", "zone_id", "n_events", "dwell_us")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(stays === Set(
      (1L, 0L, 2L, 600000000L),   // 10 min in zone 0
      (1L, 5L, 3L, 3600000000L),  // 60 min in zone 5
      (2L, 7L, 2L, 1800000000L),  // 30 min in zone 7
    ))
  }

  test("stayEpisodes separates two visits to the same zone into two runs") {
    val back = Seq(
      (30L, ts("2024-01-04 08:00:00"), 1L, Some(0L)),
      (31L, ts("2024-01-04 08:10:00"), 1L, Some(0L)),
    ).toDF("event_id", "ts", "user_id", "zone_id")
    val zone0 = Mobility.stayEpisodes(silverToy.unionByName(back), minEvents = 2)
      .filter($"user_id" === 1L && $"zone_id" === 0L)
    assert(zone0.count() === 2L)
  }

  test("zoneNetFlow conserves: global sum of net_flow is zero") {
    val total = Mobility.zoneNetFlow(silverToy)
      .agg(sum("net_flow")).as[Long].collect().head
    assert(total === 0L)
    // zone 5 in user 1's trajectory: one arrival (08:00) and one
    // departure (10:00) in different hours
    val z5 = Mobility.zoneNetFlow(silverToy).filter($"zone_id" === 5L)
      .select("n_in", "n_out").as[(Long, Long)].collect().toSet
    assert(z5 === Set((1L, 0L), (0L, 1L)))
  }

  test("radiusOfGyration: single-zone user has rog 0; moments match hand calc") {
    val rog = Mobility.radiusOfGyration(silverToy)
      .select("user_id", "rog").as[(Long, Double)].collect().toMap
    assert(rog(2L) === 0.0)
    // user 3: zones 3 (x=3,y=0) and 4 (x=4,y=0) → centroid (3.5, 0),
    // rog = sqrt(((0.5)^2 + (0.5)^2)/2) = 0.5
    assert(math.abs(rog(3L) - 0.5) < 1e-9)
  }

  test("locationEntropy: uniform two-zone user has ln(2); single-zone has 0") {
    val ent = Mobility.locationEntropy(silverToy)
      .select("user_id", "entropy", "max_p").as[(Long, Double, Double)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(ent(2L)._1 === 0.0 && ent(2L)._2 === 1.0)
    assert(math.abs(ent(3L)._1 - math.log(2)) < 1e-6 && ent(3L)._2 === 0.5)
  }

  test("homeZone picks the modal night zone; day-only users are absent") {
    val home = Mobility.homeZone(silverToy)
      .select("user_id", "home_zone").as[(Long, Long)].collect().toMap
    assert(home === Map(1L -> 0L)) // users 2 and 3 have no night events
  }

  test("zonePageRank: ranks sum to 1, favor the sink zone, and are deterministic") {
    // star-into-sink graph: 1→2, 3→2, 4→2 and nothing leaves zone 2 (a
    // dangling sink whose mass the residual spread redistributes) — zone 2
    // receives from three zones and must out-rank them all
    val star = Seq(
      (41L, ts("2024-01-01 08:00:00"), 11L, Some(1L)),
      (42L, ts("2024-01-01 09:00:00"), 11L, Some(2L)),
      (44L, ts("2024-01-01 08:00:00"), 12L, Some(3L)),
      (45L, ts("2024-01-01 09:00:00"), 12L, Some(2L)),
      (46L, ts("2024-01-01 08:00:00"), 13L, Some(4L)),
      (47L, ts("2024-01-01 09:00:00"), 13L, Some(2L)),
    ).toDF("event_id", "ts", "user_id", "zone_id")
    val pr = Mobility.zonePageRank(star, iters = 10)
      .select("zone_id", "pr", "pos").as[(Long, Double, Int)].collect()
    val total = pr.map(_._2).sum
    assert(math.abs(total - 1.0) < 1e-4, s"ranks sum to $total")
    val byPos = pr.sortBy(_._3)
    assert(byPos.head._1 === 2L, s"sink zone should rank first: ${byPos.toSeq}")
    // determinism: a second run returns bit-identical rounded ranks
    val again = Mobility.zonePageRank(star, iters = 10)
      .select("zone_id", "pr", "pos").as[(Long, Double, Int)].collect()
    assert(pr.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
    // path parity: the bounded-collect path (default at this size) and
    // the distributed loop (forced via driverCutover = 0) agree exactly
    // on the 6-dp-rounded ranks and positions
    val dist = Mobility.zonePageRank(star, iters = 10, driverCutover = 0)
      .select("zone_id", "pr", "pos").as[(Long, Double, Int)].collect()
    assert(pr.sortBy(_._1).toSeq === dist.sortBy(_._1).toSeq,
      "driver-side and distributed pagerank must emit identical results")
  }

  test("plan shape: no joins anywhere in the module — one user_id shuffle feeds each") {
    val plans = Map(
      "od" -> Mobility.odMatrix(silverToy),
      "stay" -> Mobility.stayEpisodes(silverToy),
      "flow" -> Mobility.zoneNetFlow(silverToy),
      "rog" -> Mobility.radiusOfGyration(silverToy),
      "ent" -> Mobility.locationEntropy(silverToy),
      "home" -> Mobility.homeZone(silverToy),
    ).map { case (k, df) => k -> df.queryExecution.executedPlan.toString }
    plans.foreach { case (k, p) =>
      assert(!p.contains("Join"), s"$k plans a join:\n$p")
      assert(!p.contains("CartesianProduct"), s"$k plans a cartesian")
    }
    // the aggregate-only operators (rog) need no window at all
    assert(!plans("rog").contains("Window"), "rog should be a single aggregate pass")
  }

  /** zone 5: user 1 stays 08:00–09:00, user 2 stays 08:45–09:30 (15 min
    * overlap), user 3 stays 09:30–10:00 (touches user 2 at the shared
    * instant — closed intervals, so it counts with 0 overlap; disjoint
    * from user 1). zone 9: users 1 and 2 again, 12:00–12:30 vs
    * 12:10–12:40 (20 min) — pair (1,2) meets in TWO zones. */
  private lazy val colocToy: DataFrame = Seq(
    (1L, "2024-01-01 08:00:00", 1L, 5L), (2L, "2024-01-01 08:30:00", 1L, 5L),
    (3L, "2024-01-01 09:00:00", 1L, 5L),
    (4L, "2024-01-01 08:45:00", 2L, 5L), (5L, "2024-01-01 09:30:00", 2L, 5L),
    (6L, "2024-01-01 09:30:00", 3L, 5L), (7L, "2024-01-01 10:00:00", 3L, 5L),
    (8L, "2024-01-01 12:00:00", 1L, 9L), (9L, "2024-01-01 12:30:00", 1L, 9L),
    (10L, "2024-01-01 12:10:00", 2L, 9L), (11L, "2024-01-01 12:40:00", 2L, 9L),
  ).map { case (id, t, u, z) => (id, ts(t), u, Some(z)) }
    .toDF("event_id", "ts", "user_id", "zone_id")

  test("coLocation: overlapping stays pair up once each, closed intervals, exact overlap") {
    val pairs = Mobility.coLocation(colocToy)
      .collect().map(r => (r.getAs[Long]("user_a"), r.getAs[Long]("user_b")) -> r).toMap
    assert(pairs.keySet === Set((1L, 2L), (2L, 3L)))
    val u12 = pairs((1L, 2L))
    assert(u12.getAs[Long]("n_meetings") === 2L)       // zone 5 + zone 9
    assert(u12.getAs[Long]("overlap_us") === (15L + 20L) * 60 * 1000000)
    assert(u12.getAs[Long]("n_zones") === 2L)
    val u23 = pairs((2L, 3L))
    assert(u23.getAs[Long]("n_meetings") === 1L)       // the shared instant
    assert(u23.getAs[Long]("overlap_us") === 0L)
  }

  test("coLocation: a pair spanning many shared hour buckets still counts ONCE") {
    // both users camp in zone 4 for six hours with overlapping intervals:
    // 6-7 shared buckets, exactly one surviving pair row
    val camp = Seq(
      (21L, "2024-01-01 00:00:00", 7L, 4L), (22L, "2024-01-01 06:00:00", 7L, 4L),
      (23L, "2024-01-01 01:00:00", 8L, 4L), (24L, "2024-01-01 07:00:00", 8L, 4L),
    ).map { case (id, t, u, z) => (id, ts(t), u, Some(z)) }
      .toDF("event_id", "ts", "user_id", "zone_id")
    val out = Mobility.coLocation(camp).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("n_meetings") === 1L)
    assert(out.head.getAs[Long]("overlap_us") === 5L * 3600 * 1000000)
    // and the plan is the blocked equi-join, never a cartesian
    val plan = Mobility.coLocation(camp).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in coLocation:\n$plan")
  }

  test("markovNextZoneEval: argmax model from the train window, hit@1 on the test window") {
    // train (before Jan 3): user 10 does 0→5, 0→5 (model: 0 predicts 5)
    // test (Jan 3+): user 10 does 0→5 (hit), user 11 does 0→7 (miss) and
    // 7→0 (origin 7 unseen in training → NULL prediction, zero hits)
    val rows = Seq(
      (31L, "2024-01-01 08:00:00", 10L, 0L), (32L, "2024-01-01 09:00:00", 10L, 5L),
      (33L, "2024-01-02 08:00:00", 10L, 0L), (34L, "2024-01-02 09:00:00", 10L, 5L),
      (35L, "2024-01-03 08:00:00", 10L, 0L), (36L, "2024-01-03 09:00:00", 10L, 5L),
      (37L, "2024-01-03 10:00:00", 11L, 0L), (38L, "2024-01-03 11:00:00", 11L, 7L),
      (39L, "2024-01-03 12:00:00", 11L, 0L),
    ).map { case (id, t, u, z) => (id, ts(t), u, Some(z)) }
      .toDF("event_id", "ts", "user_id", "zone_id")
    val eval = Mobility.markovNextZoneEval(rows, split = "2024-01-03")
      .collect().map(r => r.getAs[Long]("origin") -> r).toMap
    val o0 = eval(0L)
    assert(o0.getAs[Long]("pred_dest") === 5L)
    assert(o0.getAs[Long]("n_test") === 2L)   // 0→5 (hit) + 0→7 (miss)
    assert(o0.getAs[Long]("n_hits") === 1L)
    assert(o0.getAs[Double]("acc") === 0.5)
    val o7 = eval(7L)
    assert(o7.isNullAt(o7.fieldIndex("pred_dest")))
    assert(o7.getAs[Long]("n_hits") === 0L && o7.getAs[Double]("acc") === 0.0)
    // user 10's overnight returns (5→0 each morning) train origin 5 too:
    // its Jan-3 08:00 return is a scored hit
    val o5 = eval(5L)
    assert(o5.getAs[Long]("pred_dest") === 0L && o5.getAs[Double]("acc") === 1.0)
    // test volume = the four on/after-split transitions, nothing from train
    assert(eval.values.map(_.getAs[Long]("n_test")).sum === 4L)
  }

  test("dwellStats: exact per-zone dwell distribution from the hand-built stays") {
    // silverToy stays: zone 0 (user 1, 10 min), zone 5 (user 1, 60 min),
    // zone 7 (user 2, 30 min) — one stay each
    val dw = Mobility.dwellStats(silverToy)
      .collect().map(r => r.getAs[Long]("zone_id") -> r).toMap
    assert(dw.keySet === Set(0L, 5L, 7L))
    assert(dw(0L).getAs[Long]("n_stays") === 1L)
    assert(dw(0L).getAs[Double]("p50_us") === 10.0 * 60 * 1000000)
    assert(dw(5L).getAs[Double]("p90_us") === 60.0 * 60 * 1000000)
    assert(dw(7L).getAs[Double]("mean_us") === 30.0 * 60 * 1000000)
  }

  test("trips: stay-to-stay journeys with exact travel time; stayless users absent") {
    val out = Mobility.trips(silverToy).collect()
    // user 1 is the only one with TWO stays (zone 0 then zone 5): one trip
    // departing at the zone-0 exit (23:10) and arriving at the zone-5
    // enter (08:00 next day) = 8 h 50 m travel. user 2 has one stay (no
    // trip); user 3's single-event visits never form stays.
    assert(out.length === 1)
    val t = out.head
    assert(t.getAs[Long]("user_id") === 1L)
    assert(t.getAs[Long]("origin") === 0L && t.getAs[Long]("dest") === 5L)
    assert(t.getAs[java.sql.Timestamp]("depart_ts") === ts("2024-01-01 23:10:00"))
    assert(t.getAs[java.sql.Timestamp]("arrive_ts") === ts("2024-01-02 08:00:00"))
    assert(t.getAs[Long]("travel_us") === (8L * 3600 + 50 * 60) * 1000000)
  }

  test("zoneCommunities: disconnected districts get distinct min-labels, no oscillation") {
    // triangle 1-2-3 (user 20 cycles it) and pair 8-9 (user 21 ping-pongs):
    // equal integer weights everywhere, so the self-anchored argmax must
    // collapse each component onto its smallest zone id — and the pair
    // must NOT oscillate (the classic synchronous-LPA failure)
    val zones = Seq(1L, 2L, 3L, 1L, 2L, 3L, 1L).zipWithIndex.map {
      case (z, i) => (i.toLong, ts(f"2024-01-01 ${8 + i}%02d:00:00"), 20L, Some(z))
    } ++ Seq(8L, 9L, 8L).zipWithIndex.map {
      case (z, i) => (100L + i, ts(f"2024-01-01 ${8 + i}%02d:00:00"), 21L, Some(z))
    }
    val rows = zones.toDF("event_id", "ts", "user_id", "zone_id")
    val out = Mobility.zoneCommunities(rows)
      .collect().map(r => r.getAs[Long]("zone_id") ->
        (r.getAs[Long]("community"), r.getAs[Long]("community_size"))).toMap
    assert(out(1L) === ((1L, 3L)) && out(2L) === ((1L, 3L)) && out(3L) === ((1L, 3L)))
    assert(out(8L) === ((8L, 2L)) && out(9L) === ((8L, 2L)))
    // determinism: a second run is byte-identical
    val again = Mobility.zoneCommunities(rows)
      .collect().map(r => r.getAs[Long]("zone_id") ->
        (r.getAs[Long]("community"), r.getAs[Long]("community_size"))).toMap
    assert(again === out)
    // path parity: bounded-collect (default here) vs distributed loop
    // (forced) — all-integer LPA makes these exactly equal by construction
    val dist = Mobility.zoneCommunities(rows, driverCutover = 0)
      .collect().map(r => r.getAs[Long]("zone_id") ->
        (r.getAs[Long]("community"), r.getAs[Long]("community_size"))).toMap
    assert(dist === out,
      "driver-side and distributed LPA must emit identical results")
  }
}
