package graft.mobility

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mobility analytics over silver events — the domain the reference is
  * named for (reference src/transformation/gold_aggregates.py builds
  * zone-hour demand and zone-day revenue; these operators add the
  * trajectory-level view a mobility platform needs next: where users move
  * between zones, how long they dwell, how far they range, and how
  * predictable they are).
  *
  * Trajectory model: a user's events ordered by `(ts, event_id)` (a total
  * order — `event_id` breaks timestamp ties deterministically) with
  * `zone_id` as the location. A "transition" is a consecutive pair of
  * events in DIFFERENT zones; a "stay" is a maximal run of events in the
  * same zone.
  *
  * Scale design: every operator here shuffles exactly once on `user_id`
  * (the window partition key, whose cardinality grows with data — no
  * bottleneck partition), then reduces by low-cardinality keys
  * (zone/hour) that broadcast-sized results aggregate into. No operator
  * holds more than one user's ordered events in window state, and none
  * collects to the driver. Transition math is integer counts divided at
  * the end — bit-identical across engines — and the only float folds
  * (entropy, radius of gyration) are rounded at 6 dp.
  */
object Mobility {

  /** Per-user consecutive zone pairs: the shared first stage of the
    * transition operators. One `user_id` shuffle; rows with NULL zones are
    * dropped BEFORE the lag so a trajectory skips unlocated events rather
    * than breaking at them. Same-zone pairs are dropped (they are stays,
    * not movements — [[stayEpisodes]] covers those). */
  private def transitions(silver: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    silver
      .filter(col("zone_id").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"), col("zone_id"))
      .withColumn("origin", lag("zone_id", 1).over(w))
      .filter(col("origin").isNotNull && col("origin") =!= col("zone_id"))
      .select(col("user_id"), col("ts"), col("origin"),
        col("zone_id").as("dest"))
  }

  /** Origin-destination matrix: transition counts and the conditional
    * probability of each destination given the origin. The mobility
    * platform's core planning artifact (zone-to-zone demand). Output is
    * at most |zones|² rows — broadcast-sized however big the input. */
  def odMatrix(silver: DataFrame): DataFrame = {
    val wOrigin = Window.partitionBy("origin")
    transitions(silver)
      .groupBy(col("origin"), col("dest"))
      .agg(count(lit(1)).as("n_trans"))
      .withColumn("p_dest",
        col("n_trans").cast("double") / sum("n_trans").over(wOrigin))
  }

  /** Top-k next zones per origin, by transition count (ties broken by
    * dest asc — deterministic, unlike a bare max_by). The serving-side
    * "where will demand go next" lookup table. */
  def nextZoneTopK(silver: DataFrame, k: Int = 3): DataFrame = {
    val w = Window.partitionBy("origin")
      .orderBy(col("n_trans").desc, col("dest").asc)
    odMatrix(silver)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("origin", "rank", "dest", "n_trans", "p_dest")
  }

  /** Stay episodes: maximal same-zone runs per user (gaps-and-islands via
    * the two-row_number difference), with enter/exit timestamps, event
    * count and dwell time in microseconds (exact integer math on both
    * engines). `minEvents` drops pass-through pings. Window state per
    * partition is one user's events; the groupBy key `(user, zone, run)`
    * grows with data, so no reducer hot-spots. */
  def stayEpisodes(silver: DataFrame, minEvents: Int = 2): DataFrame = {
    val wAll = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val wZone = Window.partitionBy("user_id", "zone_id").orderBy("ts", "event_id")
    silver
      .filter(col("zone_id").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"), col("zone_id"))
      .withColumn("run_id",
        row_number().over(wAll) - row_number().over(wZone))
      .groupBy(col("user_id"), col("zone_id"), col("run_id"))
      .agg(
        min(col("ts")).as("enter_ts"),
        max(col("ts")).as("exit_ts"),
        count(lit(1)).as("n_events"))
      .filter(col("n_events") >= minEvents)
      .withColumn("dwell_us",
        unix_micros(col("exit_ts")) - unix_micros(col("enter_ts")))
      .select("user_id", "zone_id", "enter_ts", "exit_ts", "n_events", "dwell_us")
  }

  /** Hourly zone net flow: arrivals minus departures per (hour, zone),
    * both stamped at the transition's (arrival-event) timestamp. The
    * rebalancing signal — a persistently negative zone drains vehicles.
    * One union of two projections of the shared transition stage, then
    * one aggregate on a bounded (hour × zone) key space. */
  def zoneNetFlow(silver: DataFrame): DataFrame = {
    val t = transitions(silver)
      .withColumn("hour", date_trunc("hour", col("ts")))
    val in = t.select(col("hour"), col("dest").as("zone_id"),
      lit(1L).as("n_in"), lit(0L).as("n_out"))
    val out = t.select(col("hour"), col("origin").as("zone_id"),
      lit(0L).as("n_in"), lit(1L).as("n_out"))
    in.unionByName(out)
      .groupBy(col("hour"), col("zone_id"))
      .agg(sum("n_in").as("n_in"), sum("n_out").as("n_out"))
      .withColumn("net_flow", col("n_in") - col("n_out"))
  }

  /** Radius of gyration per user (González/Hidalgo/Barabási, "Understanding
    * individual human mobility patterns", Nature 2008) — how far a user
    * ranges around their trajectory centroid. Zones embed on a 10×10 grid
    * (`zone % 10`, `zone / 10`), and the moment identity
    * rog² = E[x²+y²] − E[x]² − E[y]² makes it ONE aggregation pass:
    * integer sums (exact on both engines) divided and combined at the end,
    * rounded at 6 dp. */
  def radiusOfGyration(silver: DataFrame): DataFrame = {
    val located = silver
      .filter(col("zone_id").isNotNull)
      .withColumn("x", col("zone_id") % 10)
      .withColumn("y", floor(col("zone_id") / 10))
    located
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_visits"),
        (sum(col("x")).cast("double") / count(lit(1))).as("cx"),
        (sum(col("y")).cast("double") / count(lit(1))).as("cy"),
        (sum(col("x") * col("x") + col("y") * col("y")).cast("double")
          / count(lit(1))).as("m2"))
      .withColumn("rog",
        round(sqrt(greatest(
          col("m2") - col("cx") * col("cx") - col("cy") * col("cy"),
          lit(0.0))), 6))
      .select("user_id", "n_visits", "cx", "cy", "rog")
  }

  /** Location entropy per user: H = −Σ_z p_z ln p_z over the zone-visit
    * distribution, plus the modal-zone share (`max_p`, the Song-et-al
    * predictability proxy) and distinct-zone count. Two aggregations
    * ((user, zone) → user), both on data-growing keys. Each entropy term
    * is a bit-identical integer ratio; only the Σ is order-sensitive,
    * hence the 6 dp round. */
  def locationEntropy(silver: DataFrame): DataFrame = {
    val perZone = silver
      .filter(col("zone_id").isNotNull)
      .groupBy(col("user_id"), col("zone_id"))
      .agg(count(lit(1)).as("n_z"))
    val wUser = Window.partitionBy("user_id")
    perZone
      .withColumn("n_tot", sum("n_z").over(wUser))
      .withColumn("p", col("n_z").cast("double") / col("n_tot"))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_zones"),
        round(-sum(col("p") * log(col("p"))), 6).as("entropy"),
        max(col("p")).as("max_p"))
  }

  /** Zone PageRank over the transition graph — which zones are central to
    * the city's flow, counting not just direct arrivals but arrivals from
    * other well-connected zones (Page/Brin/Motwani/Winograd 1999). Edges
    * are the [[odMatrix]] probabilities, so each origin's out-weights sum
    * to 1 and the walk is properly stochastic.
    *
    * Mass-conserving formulation: each iteration computes the edge-carried
    * mass contrib(z) = d·Σ_in p(o→z)·r(o), then spreads the residual
    * 1 − Σ contrib (teleport + dangling-zone mass) uniformly — so ranks
    * sum to exactly 1 every round with no separate dangling bookkeeping.
    *
    * Scale: the graph is DIMENSION-sized (|zones|² edges at most) however
    * big the event data — the one `user_id` shuffle that builds the OD
    * matrix is the only data-scale stage. Iterations are tiny-table joins;
    * the residual is a 1-row broadcast (the text_tfidf scalar-stat
    * pattern); `localCheckpoint` per round keeps the lineage flat, so
    * `iters` is a job-count multiplier only (the dedup_cc pattern). Ranks
    * are rounded at 6 dp (the Σ is the only order-sensitive float), and
    * `pos` ranks by the ROUNDED value with a zone-asc tiebreak so the
    * ordering is engine-independent too. */
  def zonePageRank(silver: DataFrame, iters: Int = 10,
      damping: Double = 0.85): DataFrame = {
    val edges = odMatrix(silver).select("origin", "dest", "p_dest")
      .persist()
    val zones = edges.select(col("origin").as("zone_id"))
      .union(edges.select(col("dest").as("zone_id")))
      .distinct()
      .persist()
    val n = zones.count() // dimension-sized; one bounded driver value
    var ranks = zones.withColumn("rank", lit(1.0 / n))
    for (i <- 1 to iters) {
      val contrib = edges
        .join(ranks, edges("origin") === ranks("zone_id"))
        .groupBy(col("dest").as("zone_id"))
        .agg(sum(col("p_dest") * col("rank") * damping).as("contrib"))
      val carried = contrib.agg(sum("contrib").as("s"))
      ranks = zones
        .join(contrib, Seq("zone_id"), "left")
        .crossJoin(broadcast(carried))
        .select(col("zone_id"),
          (coalesce(col("contrib"), lit(0.0)) + (lit(1.0) - col("s")) / n)
            .as("rank"))
      // eager checkpoint every SECOND round: per-round job overhead
      // dominates these dimension-sized joins, and the carried-mass
      // scalar's double reference to contrib only squares per
      // checkpoint interval (4× tiny work), so two rounds per job
      // halves the job count at flat lineage
      if (i % 2 == 0 || i == iters) ranks = ranks.localCheckpoint()
    }
    edges.unpersist()
    zones.unpersist()
    val byRank = Window.orderBy(col("pr").desc, col("zone_id").asc)
    ranks
      .withColumn("pr", round(col("rank"), 6))
      .withColumn("pos", row_number().over(byRank))
      .select(col("zone_id"), col("pr"), col("pos"))
  }

  /** Home zone per user: the modal zone over night-hour events (22:00–05:59,
    * when people are usually home — the standard home-detection heuristic
    * in mobility literature), ties broken by zone asc. Users with no night
    * events are absent (their home is unobserved, not zone NULL). */
  def homeZone(silver: DataFrame): DataFrame = {
    val night = silver
      .filter(col("zone_id").isNotNull)
      .filter(hour(col("ts")) >= 22 || hour(col("ts")) <= 5)
      .groupBy(col("user_id"), col("zone_id"))
      .agg(count(lit(1)).as("n_night"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("n_night").desc, col("zone_id").asc)
    night
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("zone_id").as("home_zone"), col("n_night"))
  }
}
