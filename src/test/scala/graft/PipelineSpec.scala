package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Aggregates, Bronze, Gold, Silver}
import graft.quality.DataQuality

class PipelineSpec extends SparkSpec {

  private lazy val bronze = Bronze.ingestEvents(Tables.events(spark, sfDir))
  private lazy val silver = Silver.cleanEvents(bronze)

  test("bronze ingest derives partition date and keeps every row") {
    assert(bronze.count() === Tables.events(spark, sfDir).count())
    assert(bronze.filter(col("event_date").isNull).count() === 0)
  }

  test("silver clean: no null keys, error values nulled, pk unique") {
    assert(silver.filter(col("event_id").isNull || col("user_id").isNull || col("ts").isNull).count() === 0)
    assert(silver.filter(col("event_type") === "error" && col("value").isNotNull).count() === 0)
    val dupes = silver.groupBy("event_id").count().filter(col("count") > 1).count()
    assert(dupes === 0)
  }

  test("silver dedup keeps latest row per key") {
    import spark.implicits._
    val raw = Seq(
      (1L, "2024-01-01 00:00:00", 10L, "click", 1.0, """{"k": 5}"""),
      (1L, "2024-01-02 00:00:00", 10L, "click", 2.0, """{"k": 5}"""),
      (2L, "2024-01-01 00:00:00", 11L, "view", 3.0, """{"k": 6}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts").cast("timestamp"))
    val cleaned = Silver.cleanEvents(Bronze.ingestEvents(raw))
    assert(cleaned.count() === 2)
    val kept = cleaned.filter(col("event_id") === 1).select("value").head().getDouble(0)
    assert(kept === 2.0)
  }

  test("gold dims have unique surrogate keys") {
    for (dim <- Seq(Gold.dimTime(silver), Gold.dimUsers(silver), Gold.dimZones(silver))) {
      val keyCol = dim.columns.head
      assert(dim.select(keyCol).distinct().count() === dim.count())
    }
  }

  test("fact_events keeps silver grain and resolves dim keys") {
    val fact = Gold.factEvents(silver, Gold.dimUsers(silver), Gold.dimZones(silver))
    assert(fact.count() === silver.count())
    assert(fact.filter(col("user_key").isNull).count() === 0)
  }

  test("scd2 intervals: exhaustive, non-overlapping, one current row per user") {
    // deliberately NOT cached: a cached frame registers its plan with the
    // session-global cache manager, which then substitutes an
    // InMemoryRelation into the identical plan PlanAuditSpec builds for
    // its exchange-count audit (suites share one SparkSession)
    val scd = Gold.scd2UserZones(silver)
    val base = silver.filter(col("zone_id").isNotNull && col("ts").isNotNull)
    // run construction loses no events
    val total = scd.agg(sum("n_events")).head().getLong(0)
    assert(total === base.count())
    // exactly one open (current) interval per user
    val users = base.select("user_id").distinct().count()
    assert(scd.filter(col("is_current")).count() === users)
    assert(scd.filter(col("is_current") && col("valid_to").isNotNull).count() === 0)
    // intervals chain: every closed interval's valid_to equals the next
    // interval's valid_from (half-open, no gaps, no overlaps)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("valid_from")
    val chained = scd
      .withColumn("next_from", lead(col("valid_from"), 1).over(w))
      .filter(col("valid_to").isNotNull)
    assert(chained.filter(col("valid_to") =!= col("next_from")).count() === 0)
    // consecutive runs always change zone (maximal runs)
    val zoneChain = scd.withColumn("next_zone", lead(col("zone_id"), 1).over(w))
      .filter(col("next_zone").isNotNull)
    assert(zoneChain.filter(col("zone_id") === col("next_zone")).count() === 0)
  }

  test("fact build broadcasts dims (no fact shuffle)") {
    val fact = Gold.factEvents(silver, Gold.dimUsers(silver), Gold.dimZones(silver))
    val plan = fact.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast joins, got:\n$plan")
    assert(!plan.contains("SortMergeJoin"), "fact-dim join must not sort-merge")
  }

  test("wide fact: four dim roles resolved, silver grain kept, dims broadcast") {
    val wide = Gold.factEventsWide(silver, Gold.dimUsers(silver),
      Gold.dimZones(silver), Gold.dimEventTypes(silver))
    assert(wide.count() === silver.count())
    assert(wide.filter(col("user_key").isNull).count() === 0)
    assert(wide.filter(col("event_type_key").isNull).count() === 0)
    // origin role: each user's FIRST event (by ts, event_id) has no
    // origin; every later event's origin is the previous event's zone —
    // so null-origin rows == number of users with >= 1 event
    val users = silver.select("user_id").distinct().count()
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val expected = silver
      .withColumn("oz", lag(col("zone_id"), 1).over(w))
      .filter(col("oz").isNull).count()
    assert(wide.filter(col("origin_location_id").isNull).count() === expected)
    assert(expected >= users) // first-event rows plus null-zone predecessors
    // both zone roles resolve through the SAME dim: a row whose origin
    // zone equals its current zone carries identical surrogate keys
    val zs = Gold.dimZones(silver).select(col("location_id"), col("zone_id"))
    val oneZone = wide.join(zs, Seq("location_id"))
      .filter(col("origin_location_id") === col("location_id"))
    assert(oneZone.count() > 0)
    // plan: the three bounded dims broadcast; no sort-merge join anywhere
    val plan = wide.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast joins, got:\n$plan")
    assert(!plan.contains("SortMergeJoin"), "wide fact dim joins must not sort-merge")
  }

  test("aggregates reconcile with silver totals") {
    val purchases = silver.filter(col("event_type") === "purchase")
    val rev = Aggregates.revenueDailyByZone(silver)
    val totalFromAgg = rev.agg(sum("purchase_count")).head().getLong(0)
    assert(totalFromAgg === purchases.count())
  }

  test("data quality summary computes in a single pass and evaluates") {
    val summary = DataQuality.summary(silver, Seq("event_id", "user_id", "ts", "value"))
    val results = DataQuality.evaluate(summary)
    assert(results.size === 4)
    // value column has nulls by design (error events) → fails strict gate
    assert(results.filter(_.name == "event_id").forall(_.passed))
    assert(!results.find(_.name == "value").get.passed)
  }

  test("k-anonymity: distinct individuals per QI class, at_risk below k only") {
    import spark.implicits._
    val rows = Seq(
      // QI (a,1): 3 distinct users over 4 rows → at risk at k=5
      ("a", 1, 10L), ("a", 1, 10L), ("a", 1, 11L), ("a", 1, 12L),
      // QI (b,2): 5 distinct users → exactly k, safe
      ("b", 2, 20L), ("b", 2, 21L), ("b", 2, 22L), ("b", 2, 23L), ("b", 2, 24L))
      .toDF("event_type", "hour", "user_id")
    val audit = DataQuality.kAnonymity(rows, Seq("event_type", "hour"), "user_id")
      .collect().map(r => (r.getAs[String]("event_type"), r.getAs[Int]("hour")) -> r).toMap
    val a = audit(("a", 1)); val b = audit(("b", 2))
    assert(a.getAs[Long]("n_rows") === 4L && a.getAs[Long]("n_ids") === 3L)
    assert(a.getAs[Boolean]("at_risk"))
    assert(b.getAs[Long]("n_ids") === 5L && !b.getAs[Boolean]("at_risk"))
    // the audit output is QI-grid-sized, never row-sized
    val real = DataQuality.kAnonymity(
      Tables.events(spark, sfDir).withColumn("hour", hour(col("ts"))),
      Seq("event_type", "hour"), "user_id")
    assert(real.count() <= 5 * 24)
  }

  test("l-diversity: sensitive-value spread per QI class, homogeneous classes flagged") {
    import spark.implicits._
    val rows = Seq(
      // QI (0,8): everyone did the same thing → l=1, homogeneous, at risk
      (0L, 8, "purchase"), (0L, 8, "purchase"), (0L, 8, "purchase"),
      // QI (1,9): three sensitive values over 4 rows → diverse, safe
      (1L, 9, "view"), (1L, 9, "view"), (1L, 9, "click"), (1L, 9, "purchase"))
      .toDF("zone_id", "hour", "event_type")
    val audit = DataQuality.lDiversity(rows, Seq("zone_id", "hour"), "event_type")
      .collect().map(r => r.getAs[Long]("zone_id") -> r).toMap
    val z0 = audit(0L); val z1 = audit(1L)
    assert(z0.getAs[Long]("n_rows") === 3L && z0.getAs[Long]("n_sens") === 1L)
    assert(z0.getAs[Double]("max_share") === 1.0 && z0.getAs[Boolean]("at_risk"))
    assert(z1.getAs[Long]("n_sens") === 3L && !z1.getAs[Boolean]("at_risk"))
    assert(z1.getAs[Double]("max_share") === 0.5)   // 2 of 4 rows are views
    // the audit output is QI-grid-sized, never row-sized
    val real = DataQuality.lDiversity(
      Silver.cleanEvents(Bronze.ingestEvents(Tables.events(spark, sfDir)))
        .withColumn("hour", hour(col("ts"))),
      Seq("zone_id", "hour"), "event_type")
    assert(real.count() <= 101 * 24)   // 100 zones + the NULL-zone class
  }

  test("dp release: noise matches the inverse-CDF hand formula, reproducible, group-sized") {
    import spark.implicits._
    val rows = (1L to 500L).map(i => (i, i % 5)).toDF("id", "g")
    val out = DataQuality.dpNoisedCounts(rows, "g")
      .collect().map(r => (r.getAs[Long]("g"), r.getAs[Long]("true_count"),
        r.getAs[Double]("noise"), r.getAs[Double]("released"))).sortBy(_._1)
    assert(out.length === 5)
    assert(out.forall(_._2 === 100L))
    // noise replicates the exact Laplace inverse-CDF over the same hash
    val us = (0L to 4L).toDF("g")
      .withColumn("u", graft.sampling.Sampling.hashFraction(col("g"), "dp") - 0.5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    out.foreach { case (g, _, noise, released) =>
      val u = us(g)
      val expected = math.rint(-1.0 * math.signum(u)
        * math.log(math.max(1.0 - 2.0 * math.abs(u), 1e-12)) * 1e6) / 1e6
      assert(noise === expected, s"group $g")
      assert(released === math.rint((100L + noise) * 1e6) / 1e6)
    }
    // a second run is byte-identical (the seeded-release contract)
    val again = DataQuality.dpNoisedCounts(rows, "g")
      .collect().map(r => (r.getAs[Long]("g"), r.getAs[Long]("true_count"),
        r.getAs[Double]("noise"), r.getAs[Double]("released"))).sortBy(_._1)
    assert(again.toSeq === out.toSeq)
  }

  test("freshness: lag vs freshest group, stale flag past the SLA, one row per group") {
    import spark.implicits._
    val rows = Seq(
      ("feed_a", "2024-01-31 12:00:00"), ("feed_a", "2024-01-31 06:00:00"),
      ("feed_b", "2024-01-31 06:00:00"),   // 6 h behind → fresh at 24 h SLA
      ("feed_c", "2024-01-29 12:00:00"))   // 48 h behind → stale
      .toDF("src", "ts").withColumn("ts", col("ts").cast("timestamp"))
    val audit = DataQuality.freshness(rows, "ts", "src")
      .collect().map(r => r.getAs[String]("src") -> r).toMap
    assert(audit("feed_a").getAs[Double]("lag_hours") === 0.0)
    assert(audit("feed_b").getAs[Double]("lag_hours") === 6.0)
    assert(!audit("feed_b").getAs[Boolean]("stale_alert"))
    assert(audit("feed_c").getAs[Double]("lag_hours") === 48.0)
    assert(audit("feed_c").getAs[Boolean]("stale_alert"))
    assert(audit("feed_a").getAs[Long]("n_rows") === 2L)
    // real silver: audit is group-sized, freshest group lags exactly 0
    // (not cached — PlanAuditSpec audits this lineage's scan count)
    val real = DataQuality.freshness(silver, "ts", "event_type")
    assert(real.count() === silver.select("event_type").distinct().count())
    assert(real.filter(col("lag_hours") === 0.0).count() >= 1)
    // wall-clock audit: against an asOf clock days after every feed
    // stopped, EVERY group alerts — the all-feeds-dead case the relative
    // default cannot see
    val wallClock = DataQuality.freshness(rows, "ts", "src",
      asOf = Some("2024-02-10 00:00:00"))
      .collect().map(r => r.getAs[String]("src") -> r).toMap
    assert(wallClock.values.forall(_.getAs[Boolean]("stale_alert")))
    assert(wallClock("feed_a").getAs[Double]("lag_hours") === 228.0)
  }

  test("event-type pivot: per-zone counts sum back to the zone's event total") {
    val pivoted = Aggregates.eventTypePivot(silver).cache()
    val types = Seq("click", "error", "purchase", "signup", "view")
    val fromPivot = pivoted.agg(sum(types.map(col).reduce(_ + _))).head().getLong(0)
    assert(fromPivot === silver.filter(col("zone_id").isNotNull).count())
    // explicit pivot values → no nulls, fixed schema
    assert(pivoted.columns.toSeq === "zone_id" +: types)
    assert(types.forall(t => pivoted.filter(col(t).isNull).count() === 0))
  }

  test("funnel: stages monotone, ordering enforced (click before signup doesn't count)") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val planted = Seq(
      // user 1: full ordered funnel
      (1L, 10L, "signup"), (2L, 10L, "click"), (3L, 10L, "purchase"),
      // user 2: click BEFORE signup → stalls at signup
      (4L, 20L, "click"), (5L, 20L, "signup"),
      // user 3: signup + click, purchase BEFORE the click → 2 stages
      (6L, 30L, "signup"), (7L, 30L, "purchase"), (8L, 30L, "click"))
      .zipWithIndex.map { case ((id, u, t), i) =>
        (id, u, t, ts(f"2024-01-01 10:0$i%d:00")) }
      .toDF("event_id", "user_id", "event_type", "ts")
    val r = Aggregates.conversionFunnel(planted).head()
    assert(r.getAs[Long]("n_signup") === 3)
    assert(r.getAs[Long]("n_signup_click") === 2, "user 2's early click must not count")
    assert(r.getAs[Long]("n_signup_click_purchase") === 1, "user 3's early purchase must not count")
    // corpus: monotone non-increasing stages
    val c = Aggregates.conversionFunnel(silver).head()
    assert(c.getAs[Long]("n_signup") >= c.getAs[Long]("n_signup_click"))
    assert(c.getAs[Long]("n_signup_click") >= c.getAs[Long]("n_signup_click_purchase"))
  }

  test("retention cohorts: day-0 cell equals cohort size, cells never exceed it") {
    val r = Aggregates.retentionCohorts(silver).cache()
    val day0 = r.filter(col("day_offset") === 0)
      .select(col("cohort_date"), col("active_users").as("cohort_size"))
    // every user's first day counts them active → day-0 row per cohort
    val total = day0.agg(sum("cohort_size")).head().getLong(0)
    assert(total === silver.filter(col("user_id").isNotNull)
      .select("user_id").distinct().count())
    assert(r.join(day0, "cohort_date")
      .filter(col("active_users") > col("cohort_size")).count() === 0)
    assert(r.filter(col("day_offset") < 0).count() === 0)
  }

  test("cumulative revenue: running total reconciles, shares sum to 1 per zone") {
    val c = Aggregates.revenueCumulativeByZone(silver).cache()
    val agg = c.groupBy("zone_id").agg(
      max("cum_revenue").as("final_cum"), // monotone: purchase values >= 0
      sum("daily_revenue").as("tot"),
      sum("revenue_share").as("share_sum"))
    assert(agg.filter(abs(col("final_cum") - col("tot")) > 0.05).count() === 0)
    assert(agg.filter(abs(col("share_sum") - 1.0) > 1e-3).count() === 0)
  }

  test("per-zone percentiles: ordered quantiles bounded by min/max") {
    val p = Aggregates.valuePercentilesByZone(silver).cache()
    assert(p.count() > 0)
    assert(p.filter(col("p25") > col("p50") || col("p50") > col("p75") ||
      col("p75") > col("p95")).count() === 0)
    val bounds = silver.filter(col("event_type") === "purchase")
      .agg(min("value").as("lo"), max("value").as("hi")).head()
    assert(p.filter(col("p25") < bounds.getAs[Double]("lo") - 1e-6 ||
      col("p95") > bounds.getAs[Double]("hi") + 1e-6).count() === 0)
  }

  test("trailing 7d range window: frame bounded by day distance, not row count") {
    val t = Aggregates.revenueTrailing7dByZone(silver).cache()
    assert(t.count() > 0)
    // every frame holds 1..7 days and the sum is at least its own day
    assert(t.filter(col("days_active_7d") < 1 || col("days_active_7d") > 7).count() === 0)
    assert(t.filter(col("rev_7d") < col("rev") - 1e-6).count() === 0)
    // cross-check one zone by hand: rev_7d = sum of that zone's daily rev
    // within [day-6, day] — the RANGE semantics a rows-frame would break
    import spark.implicits._
    val z = t.select("zone_id").head().getLong(0)
    val days = t.filter(col("zone_id") === z)
      .select(datediff(col("date"), lit("1970-01-01")).as("day"), col("rev"), col("rev_7d"))
      .collect().map(r => (r.getAs[Int]("day"), r.getAs[Double]("rev"), r.getAs[Double]("rev_7d")))
    days.foreach { case (d, _, r7) =>
      val expect = days.filter(x => x._1 >= d - 6 && x._1 <= d).map(_._2).sum
      assert(math.abs(r7 - expect) < 1e-3, s"zone $z day $d: $r7 vs $expect")
    }
    t.unpersist()
  }

  test("value-hour stats: corr bounded, covar/stddev consistent, single aggregate") {
    // plan audit FIRST, before the cache below would wrap the lineage in
    // an InMemoryRelation whose dump double-counts the embedded plan: no
    // join anywhere, one partial+final hash-aggregate pair (silver's own
    // chain has a dedup window but no aggregate, so the count isolates
    // this operator)
    val audit = Aggregates.valueHourStatsByZone(silver)
      .queryExecution.executedPlan.toString
    assert(!audit.contains("Join"), s"moment stats must not join:\n$audit")
    assert("HashAggregate".r.findAllMatchIn(audit).size === 2,
      s"moment stats must be one partial+final hash aggregate pass:\n$audit")
    val s = Aggregates.valueHourStatsByZone(silver).cache()
    assert(s.count() > 0)
    assert(s.filter(col("corr_value_hour") > 1.0 || col("corr_value_hour") < -1.0).count() === 0)
    assert(s.filter(col("stddev_value") < 0).count() === 0)
    // corr sign == covar sign (they share the numerator)
    assert(s.filter(col("corr_value_hour") * col("covar_value_hour") < -1e-9).count() === 0)
    s.unpersist()
  }

  test("sketch union: merged daily HLLs track the exact global distinct") {
    val out = graft.quality.DataQuality.sketchUnionDistinct(silver).head()
    val exact = silver.filter(col("user_id").isNotNull)
      .select("user_id").distinct().count()
    val merged = out.getAs[Long]("merged_distinct").toDouble
    assert(math.abs(merged - exact) <= exact * 0.05,
      s"merged estimate $merged too far from exact $exact")
    assert(out.getAs[Long]("n_days") ===
      silver.select("event_date").distinct().count())
    // repeat visitors make the per-day sum exceed the merged distinct
    assert(out.getAs[Long]("sum_daily_distinct").toDouble >= merged)
  }

  test("corpus profile: one-pass sketches land within tolerance of exact answers") {
    val docs = Tables.documents(spark, sfDir)
    val p = DataQuality.corpusProfile(docs).head()
    val nDocs = docs.count()
    assert(p.getAs[Long]("n_docs") === nDocs)
    val exactTexts = docs.select("text").distinct().count()
    val approx = p.getAs[Long]("approx_distinct_texts").toDouble
    assert(math.abs(approx - exactTexts) <= exactTexts * 0.05,
      s"HLL distinct $approx too far from exact $exactTexts")
    assert(p.getAs[Long]("n_langs") === 5)
    // scalar percentile columns (the driver comparator can't sort rows on
    // an array column, so the sketch emits p50/p95 separately; Catalyst
    // dedupes the two identical approx_percentile aggregates into one)
    assert(p.getAs[Int]("chars_p50") <= p.getAs[Int]("chars_p95"))
    assert(p.getAs[Double]("avg_chars") > 0)
  }

  test("exact twins: corpusProfileExact / distinctLedger agree with the sketch variants") {
    val docs = Tables.documents(spark, sfDir)
    val ex = DataQuality.corpusProfileExact(docs).head()
    val sk = DataQuality.corpusProfile(docs).head()
    assert(ex.getAs[Long]("n_docs") === sk.getAs[Long]("n_docs"))
    assert(ex.getAs[Long]("n_langs") === sk.getAs[Long]("n_langs"))
    assert(ex.getAs[Long]("total_ws_tokens") === sk.getAs[Long]("total_ws_tokens"))
    assert(ex.getAs[Int]("min_chars") <= ex.getAs[Int]("max_chars"))
    assert(ex.getAs[Double]("avg_chars") >= ex.getAs[Int]("min_chars").toDouble)
    assert(ex.getAs[Double]("avg_chars") <= ex.getAs[Int]("max_chars").toDouble)
    val led = graft.quality.DataQuality.distinctLedger(silver).head()
    val skl = graft.quality.DataQuality.sketchUnionDistinct(silver).head()
    assert(led.getAs[Long]("n_days") === skl.getAs[Long]("n_days"))
    assert(led.getAs[Long]("total_rows") === skl.getAs[Long]("total_rows"))
    // the ledger's merged column IS the exact answer the sketch estimates
    val exact = led.getAs[Long]("merged_distinct").toDouble
    assert(math.abs(skl.getAs[Long]("merged_distinct") - exact) <= exact * 0.05,
      "HLL merged estimate drifted from the exact ledger")
    assert(led.getAs[Long]("sum_daily_distinct") >= led.getAs[Long]("merged_distinct"))
  }

  test("key-skew report: hot key's share/straggler multiple/salt factor, deterministic top-N cut") {
    import spark.implicits._
    val df = (Seq.fill(6)("hot") ++ Seq("a", "a", "b", "c") :+ null)
      .toDF("k")
    val rep = DataQuality.keySkewReport(df, "k", topN = 3).collect()
    val byKey = rep.map(r => r.getAs[String]("k") ->
      ((r.getAs[Long]("cnt"), r.getAs[Double]("row_share"),
        r.getAs[Double]("skew_x"), r.getAs[Long]("salt_factor")))).toMap
    // nulls excluded: 4 keys / 10 rows, mean 2.5
    assert(rep.head.getAs[Long]("n_keys") === 4L)
    assert(rep.head.getAs[Long]("n_rows") === 10L)
    assert(byKey("hot") === ((6L, 0.6, 2.4, 3L))) // ⌈6/2.5⌉ = 3
    assert(byKey("a") === ((2L, 0.2, 0.8, 1L)))
    // top-3 cut: the b/c tie breaks on the key value ascending
    assert(rep.map(_.getAs[String]("k")).toSeq === Seq("hot", "a", "b"))
  }

  test("incremental view maintenance: state ⊕ day1 ⊕ day2 equals full recompute bit-exactly") {
    import spark.implicits._
    import java.sql.{Date, Timestamp}
    def ev(id: Long, day: Int, hour: Int, zone: java.lang.Long, v: java.lang.Double) =
      (id, s"u$id", Timestamp.valueOf(f"2026-03-$day%02d $hour%02d:15:00"),
        "purchase", v, zone, Date.valueOf(f"2026-03-$day%02d"))
    val rows = Seq(
      ev(1, 1, 9, 10L, 19.99), ev(2, 1, 9, 10L, 0.01), ev(3, 1, 17, 11L, 5.50),
      ev(4, 2, 9, 10L, 100.00), ev(5, 2, 23, 12L, 7.77),
      ev(6, 3, 9, 10L, 0.02), ev(7, 3, 17, 11L, 42.42),
      ev(8, 3, 5, null, 1.0) // null zone: excluded from the view key
    ).toDF("event_id", "user_id", "ts", "event_type", "value", "zone_id", "event_date")
    def day(d: Int) = rows.filter(col("event_date") === s"2026-03-0$d")
    // fold: day-1 state, then merge day 2, then merge day 3
    val folded = Aggregates.mergeRevenueState(
      Aggregates.mergeRevenueState(
        Aggregates.revenueStateByZoneHour(day(1)),
        Aggregates.revenueStateByZoneHour(day(2))),
      Aggregates.revenueStateByZoneHour(day(3)))
    val full = Aggregates.revenueStateByZoneHour(rows)
    def dump(df: org.apache.spark.sql.DataFrame) =
      Aggregates.revenueViewFromState(df)
        .orderBy("zone_id", "hour").collect().map(_.toSeq).toSeq
    assert(dump(folded) === dump(full)) // bit-exact: no tolerance
    // the merged key set is the union; a key only in one day survives
    val view = Aggregates.revenueViewFromState(folded)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getAs[Double]("total_revenue")).toMap
    assert(view((12L, 23)) === 7.77)   // day-2-only key
    assert(view((10L, 9)) === 120.02)  // combined across all three days
    assert(view((11L, 17)) === 47.92)  // key present on days 1 and 3 only
    assert(view.size === 3)            // null-zone row contributed no key
  }

  test("bucketed state: maintenance join shuffles only the batch side; A/B fold equals recompute") {
    import spark.implicits._
    import java.sql.{Date, Timestamp}
    def ev(id: Long, day: Int, hour: Int, zone: java.lang.Long, v: java.lang.Double) =
      (id, s"u$id", Timestamp.valueOf(f"2026-03-$day%02d $hour%02d:15:00"),
        "purchase", v, zone, Date.valueOf(f"2026-03-$day%02d"))
    val rows = Seq(
      ev(1, 1, 9, 10L, 19.99), ev(2, 1, 9, 10L, 0.01), ev(3, 1, 17, 11L, 5.50),
      ev(4, 2, 9, 10L, 100.00), ev(5, 2, 23, 12L, 7.77),
      ev(6, 3, 9, 10L, 0.02), ev(7, 3, 17, 11L, 42.42)
    ).toDF("event_id", "user_id", "ts", "event_type", "value", "zone_id", "event_date")
    def day(d: Int) = rows.filter(col("event_date") === s"2026-03-0$d")
    val tmp = java.nio.file.Files.createTempDirectory("graft_bst").toString
    val names = Seq("rev_state_a", "rev_state_b")
    names.foreach(n => spark.sql(s"DROP TABLE IF EXISTS $n"))
    // seed: day-1 state, bucketed on the view key
    graft.sources.Sinks.writeBucketed(
      Aggregates.revenueStateByZoneHour(day(1)), names(0), s"$tmp/s0",
      Seq("zone_id", "hour"), nBuckets = 4)
    // plan property: the merge's join has exactly ONE shuffle — the
    // batch delta moving into the state's bucket layout; the bucketed
    // state scan feeds the join with no Exchange above it
    val planCheck = Aggregates.mergeRevenueState(
      spark.table(names(0)), Aggregates.revenueStateByZoneHour(day(2)))
    val plan = planCheck.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).length === 1,
      s"expected one Exchange (batch side only):\n$plan")
    // the state side reads its bucket layout directly into the join —
    // the single Exchange is the delta's, printed BELOW the bucketed
    // state scan in the join's tree
    assert(plan.contains("Bucketed: true"), s"state scan must be bucketed:\n$plan")
    assert(plan.indexOf("Exchange hashpartitioning") > plan.indexOf("Bucketed: true"),
      s"the Exchange must sit on the delta branch, not above the state scan:\n$plan")
    // fold days 2 and 3 through A/B steps; final content = recompute
    Aggregates.mergeRevenueStateBucketedStep(spark, names(0), day(2),
      names(1), s"$tmp/s1", nBuckets = 4)
    Aggregates.mergeRevenueStateBucketedStep(spark, names(1), day(3),
      names(0), s"$tmp/s2", nBuckets = 4)
    def dump(df: org.apache.spark.sql.DataFrame) =
      Aggregates.revenueViewFromState(df)
        .orderBy("zone_id", "hour").collect().map(_.toSeq).toSeq
    assert(dump(spark.table(names(0))) === dump(Aggregates.revenueStateByZoneHour(rows)))
    names.foreach(n => spark.sql(s"DROP TABLE IF EXISTS $n"))
  }
}
