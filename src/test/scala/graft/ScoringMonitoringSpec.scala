package graft

import org.apache.spark.sql.functions._

import graft.features.FeatureEngineering
import graft.monitoring.Monitoring
import graft.pipeline.{Bronze, Silver}
import graft.scoring.Scoring

class ScoringMonitoringSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private lazy val silver =
    Silver.cleanEvents(Bronze.ingestEvents(Tables.events(spark, dir))).cache()

  test("demand scorer: pure column expr, no UDF, factors bounded") {
    val scored = Scoring.scoreDemand(FeatureEngineering.demandFeatures(silver)).cache()
    assert(scored.count() > 0)
    // peak factor 1.25, weekend 0.85, value factor >= 1 → prediction within
    // [0.85, 1.25 * valueFactor] times the rolling mean
    assert(scored.filter(col("predicted_demand") < col("demand_avg_7d") * 0.85).count() === 0)
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("SQLAppendColumn"))
  }

  test("surge scorer clamps to [1, 3]") {
    val scored = Scoring.scoreSurge(FeatureEngineering.surgeFeatures(silver)).cache()
    assert(scored.count() > 0)
    assert(scored.filter(col("predicted_surge") < 1.0 || col("predicted_surge") > 3.0).count() === 0)
  }

  test("scoring metrics: single row, mae <= rmse") {
    val m = Scoring.scoringMetrics(
      Scoring.scoreDemand(FeatureEngineering.demandFeatures(silver)),
      "event_count", "predicted_demand").head()
    assert(m.getAs[Long]("n") > 0)
    assert(m.getAs[Double]("mae") <= m.getAs[Double]("rmse"))
  }

  test("psi: identical windows give ~0, disjoint distributions give large psi") {
    import spark.implicits._
    // uniform baseline vs shifted current: psi must be clearly nonzero
    val df = ((1 to 100).map(i => (i.toDouble, "2024-01-10")) ++
      (1 to 100).map(i => (i.toDouble + 1000, "2024-01-20")))
      .toDF("value", "event_date")
      .withColumn("event_date", col("event_date").cast("date"))
    val drift = Monitoring.psi(df, Seq("value"), "2024-01-15").head()
    assert(drift.getAs[Double]("psi") > 1.0)

    val same = ((1 to 100).map(i => (i.toDouble, "2024-01-10")) ++
      (1 to 100).map(i => (i.toDouble, "2024-01-20")))
      .toDF("value", "event_date")
      .withColumn("event_date", col("event_date").cast("date"))
    assert(math.abs(Monitoring.psi(same, Seq("value"), "2024-01-15")
      .head().getAs[Double]("psi")) < 1e-12)
  }

  test("ks: bounded in [0,1], 0 on identical windows, ~1 on disjoint supports") {
    import spark.implicits._
    // disjoint supports: every current value clamps into the top bin →
    // the CDF gap hits (bins-1)/bins at the penultimate edge
    val df = ((1 to 100).map(i => (i.toDouble, "2024-01-10")) ++
      (1 to 100).map(i => (i.toDouble + 1000, "2024-01-20")))
      .toDF("value", "event_date")
      .withColumn("event_date", col("event_date").cast("date"))
    val drift = Monitoring.ksStat(df, Seq("value"), "2024-01-15").head()
    assert(drift.getAs[Long]("base_count") === 100L)
    assert(drift.getAs[Double]("ks") === 0.9)

    val same = ((1 to 100).map(i => (i.toDouble, "2024-01-10")) ++
      (1 to 100).map(i => (i.toDouble, "2024-01-20")))
      .toDF("value", "event_date")
      .withColumn("event_date", col("event_date").cast("date"))
    assert(Monitoring.ksStat(same, Seq("value"), "2024-01-15")
      .head().getAs[Double]("ks") === 0.0)
    // real silver: a statistic, not a count — always inside [0, 1]
    val real = Monitoring.ksStat(silver, Seq("value", "zone_id"), "2024-01-15")
    assert(real.filter(col("ks") < 0.0 || col("ks") > 1.0).count() === 0)
  }

  test("chi-square: 0 on identical windows, hand-computed 2x2, dof = categories - 1") {
    import spark.implicits._
    // base: a×30 b×10, cur: a×10 b×30 → E = 20 per cell,
    // chi2 = 4 × (10²/20) = 20, dof = 1
    val swapped = ((1 to 30).map(_ => ("a", "2024-01-10")) ++
      (1 to 10).map(_ => ("b", "2024-01-10")) ++
      (1 to 10).map(_ => ("a", "2024-01-20")) ++
      (1 to 30).map(_ => ("b", "2024-01-20")))
      .toDF("cat", "event_date")
      .withColumn("event_date", col("event_date").cast("date"))
    val drift = Monitoring.chiSquare(swapped, Seq("cat"), "2024-01-15").head()
    assert(drift.getAs[Double]("chi2") === 20.0)
    assert(drift.getAs[Long]("dof") === 1L)
    assert(drift.getAs[Long]("base_count") === 40L)

    val same = ((1 to 10).map(_ => ("a", "2024-01-10")) ++
      (1 to 10).map(_ => ("a", "2024-01-20")))
      .toDF("cat", "event_date")
      .withColumn("event_date", col("event_date").cast("date"))
    assert(Monitoring.chiSquare(same, Seq("cat"), "2024-01-15")
      .head().getAs[Double]("chi2") === 0.0)
    // real silver: non-negative statistic, one row per feature
    val real = Monitoring.chiSquare(silver, Seq("event_type", "zone_id"), "2024-01-15")
    assert(real.count() === 2)
    assert(real.filter(col("chi2") < 0.0).count() === 0)

    // an empty window (all rows on one side of the split) makes every
    // expected count 0 — chi2 must be null, never NaN/Infinity
    val oneSided = ((1 to 10).map(_ => ("a", "2024-01-10")) ++
      (1 to 5).map(_ => ("b", "2024-01-10")))
      .toDF("cat", "event_date")
      .withColumn("event_date", col("event_date").cast("date"))
    val empty = Monitoring.chiSquare(oneSided, Seq("cat"), "2024-01-15").head()
    assert(empty.getAs[Long]("cur_count") === 0L)
    assert(empty.isNullAt(empty.fieldIndex("chi2")),
      "chi2 over an empty window must be null, not NaN/Infinity")
  }

  test("embedding drift: identical halves read as no drift, scaled half moves norm not angle") {
    import spark.implicits._
    // even/odd vec_ids carry the SAME two vectors -> centroids identical
    val calm = Seq(
      (0L, Array(1f, 0f, 2f), 7), (1L, Array(1f, 0f, 2f), 7),
      (2L, Array(0f, 3f, 1f), 7), (3L, Array(0f, 3f, 1f), 7)
    ).toDF("vec_id", "embedding", "label")
    val c = Monitoring.embeddingDrift(calm).head()
    assert(math.abs(c.getAs[Double]("centroid_cosine") - 1.0) < 1e-9)
    assert(math.abs(c.getAs[Double]("norm_ratio") - 1.0) < 1e-9)
    assert(c.getAs[Long]("base_n") === 2L && c.getAs[Long]("cur_n") === 2L)
    // odd half scaled 2x: same direction (cosine 1), doubled norm
    val scaled = Seq(
      (0L, Array(1f, 0f, 2f), 7), (1L, Array(2f, 0f, 4f), 7),
      (2L, Array(0f, 3f, 1f), 7), (3L, Array(0f, 6f, 2f), 7)
    ).toDF("vec_id", "embedding", "label")
    val s = Monitoring.embeddingDrift(scaled).head()
    assert(math.abs(s.getAs[Double]("centroid_cosine") - 1.0) < 1e-9)
    assert(math.abs(s.getAs[Double]("norm_ratio") - 2.0) < 1e-9)
    // rotated half: angle moves, cosine drops below 1
    val rotated = Seq(
      (0L, Array(1f, 0f, 0f), 7), (1L, Array(0f, 1f, 0f), 7)
    ).toDF("vec_id", "embedding", "label")
    val r = Monitoring.embeddingDrift(rotated).head()
    assert(r.getAs[Double]("centroid_cosine") < 0.5)
    // real embeddings: one row per label, cosine in [-1, 1]
    val real = Monitoring.embeddingDrift(Tables.embeddings(spark, dir)).cache()
    assert(real.count() === Tables.embeddings(spark, dir).select("label").distinct().count())
    assert(real.filter(col("centroid_cosine") < -1.0 || col("centroid_cosine") > 1.0).count() === 0)
  }

  test("missing rates: value column reflects nulled error events in both windows") {
    val rates = Monitoring.missingRates(silver, Seq("value", "user_id"), "2024-01-15")
      .collect().map(r => r.getAs[String]("feature") -> r).toMap
    assert(rates("user_id").getAs[Double]("base_missing_rate") === 0.0)
    assert(rates("value").getAs[Double]("base_missing_rate") > 0.0)
  }

  test("prediction upsert: latest wins, replay is a no-op, new keys insert") {
    import spark.implicits._
    val run1 = Scoring.addRunMetadata(
      Seq((1L, 10.0), (2L, 20.0)).toDF("zone_id", "predicted_demand"),
      "run1", "2024-01-20 00:00:00")
    val run2 = Scoring.addRunMetadata(
      Seq((2L, 25.0), (3L, 30.0)).toDF("zone_id", "predicted_demand"),
      "run2", "2024-01-21 00:00:00")
    val merged = Scoring.upsertPredictions(run1, run2, Seq("zone_id")).cache()
    assert(merged.count() === 3)
    val byZone = merged.collect().map(r => r.getAs[Long]("zone_id") -> r).toMap
    assert(byZone(1L).getAs[Double]("predicted_demand") === 10.0) // untouched
    assert(byZone(2L).getAs[Double]("predicted_demand") === 25.0) // updated
    assert(byZone(3L).getAs[Double]("predicted_demand") === 30.0) // inserted
    // idempotency: replaying run2 changes nothing
    val replayed = Scoring.upsertPredictions(merged, run2, Seq("zone_id"))
    assert(replayed.exceptAll(merged).count() === 0 && replayed.count() === 3)
  }

  test("latency stats: exact distributed percentiles") {
    import spark.implicits._
    val lat = (1 to 100).map(_.toDouble).toDF("latency_ms")
    val s = Monitoring.latencyStats(lat, "latency_ms").head()
    assert(s.getAs[Long]("n") === 100)
    assert(s.getAs[Double]("p50") === 50.5)
    assert(math.abs(s.getAs[Double]("p95") - 95.05) < 1e-9)
  }

  test("volume monitor: one row, ratio consistent with counts") {
    val v = Monitoring.volume(silver, "2024-01-15").head()
    val expected = (v.getAs[Long]("cur_count").toDouble / v.getAs[Long]("cur_days")) /
      (v.getAs[Long]("base_count").toDouble / v.getAs[Long]("base_days"))
    assert(math.abs(v.getAs[Double]("volume_ratio") - expected) < 1e-12)
  }

  test("change point: finds a planted level shift at the right day") {
    import spark.implicits._
    // 20 quiet days (10 rows/day) then 10 loud days (50 rows/day):
    // the split statistic must peak at day 20
    val rows = (1 to 30).flatMap { d =>
      val n = if (d <= 20) 10 else 50
      Seq.fill(n)(f"2024-03-$d%02d")
    }
    val df = rows.toDF("ds").withColumn("event_date", to_date(col("ds")))
    val cp = Monitoring.changePoint(df).head()
    assert(cp.getAs[java.sql.Date]("change_date").toString === "2024-03-20")
    assert(cp.getAs[Long]("n_days") === 30)
    assert(math.abs(cp.getAs[Double]("mean_before") - 10.0) < 1e-12)
    assert(math.abs(cp.getAs[Double]("mean_after") - 50.0) < 1e-12)
    // G at the true split: sqrt(20*10/30) * 40
    assert(math.abs(cp.getAs[Double]("g_stat") - math.sqrt(200.0 / 30.0) * 40.0) < 1e-9)
    // one row out, and the corpus collapses to the daily series in pass one
    assert(Monitoring.changePoint(silver).count() === 1)
  }

  test("forecast baselines: naive/seasonal lags exact, EWMA exact-dyadic, head renormalized") {
    val fc = Scoring.forecastBaselines(silver).cache()
    assert(fc.count() > 0)
    // fc_naive is the previous PRESENT day's demand: self-join check
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("zone_id").orderBy("event_date")
    val expect = fc.withColumn("prev", lag(col("demand"), 1).over(w))
    assert(expect.filter(col("fc_naive") =!= col("prev").cast("double")).count() === 0)
    // first observation of every zone has no forecasts
    val firsts = fc.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    assert(firsts.filter(col("fc_naive").isNotNull || col("fc_ewma").isNotNull).count() === 0)
    // with all 7 lags present, EWMA is the renormalized dyadic blend:
    // check one fully-warmed row against a driver-side recomputation
    val warmed = fc.withColumn("rn", row_number().over(w)).filter(col("rn") > 7)
    val zid = warmed.select("zone_id").head().getLong(0)
    val series = fc.filter(col("zone_id") === zid).orderBy("event_date")
      .select("demand", "fc_ewma").collect()
    val demands = series.map(_.getLong(0))
    val idx = 8 // 9th row: all 7 lags exist
    val ws = (1 to 7).map(j => demands(idx - j) * math.pow(0.5, j)).sum
    val wn = (1 to 7).map(j => math.pow(0.5, j)).sum
    assert(series(idx).getDouble(1) === ws / wn)
    // errors are |demand - forecast|
    val bad = fc.filter(col("fc_ewma").isNotNull &&
      abs(col("demand") - col("fc_ewma")) =!= col("ae_ewma")).count()
    assert(bad === 0)
  }

  test("expectation suite: one scan, violations counted per rule, pass flags correct") {
    import graft.quality.DataQuality
    val out = DataQuality.expectations(silver, Seq(
      DataQuality.ExpectNotNull("user_id"),
      DataQuality.ExpectNotNull("value"),
      DataQuality.ExpectUnique("event_id"),
      DataQuality.ExpectBetween("value", 0, 200),
      DataQuality.ExpectInSet("event_type",
        Seq("view", "click", "purchase", "signup", "error")),
      DataQuality.ExpectRegex("props", "^\\{.*\\}$"))).cache()
    val rows = out.collect().map(r =>
      (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getBoolean(4))).toMap
    // silver filters null user_ids and dedups event_id → both pass
    assert(rows(("not_null", "user_id"))._2)
    assert(rows(("unique", "event_id"))._2)
    // error events null out value → not_null('value') must FAIL with the
    // exact error count; range rule must also fail (values reach ~490)
    val errs = silver.filter(col("value").isNull).count()
    assert(rows(("not_null", "value")) === ((errs, false)))
    assert(rows(("between", "value"))._1 > 0 && !rows(("between", "value"))._2)
    assert(rows(("in_set", "event_type"))._2)
    assert(rows(("regex", "props"))._2)
    // between/in_set/regex skip nulls: violation counts never exceed non-null rows
    val nonNullValue = silver.filter(col("value").isNotNull).count()
    assert(rows(("between", "value"))._1 <= nonNullValue)
    // ONE scan: a single aggregate feeds every rule (+1 distinct expand);
    // no join anywhere in the plan
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"expectation suite must not join:\n$plan")
  }

  test("seasonal anomaly: planted burst flags against its own (zone, hour-of-week) cell only") {
    import spark.implicits._
    // zone 1, Mondays 08:00: steady 10 events for four weeks, then a 100-
    // event burst on week five; zone 2 sees 100 every week (its normal)
    val weeks = Seq("2024-01-01", "2024-01-08", "2024-01-15", "2024-01-22")
    def burstRows(zone: Long, perHour: Int, dates: Seq[String]) =
      for { (d, wi) <- dates.zipWithIndex; i <- 1 to perHour }
        yield (zone * 100000L + wi * 1000L + i,
          java.sql.Timestamp.valueOf(s"$d 08:00:${i % 60}"), zone, Some(zone))
    val rows = burstRows(1L, 10, weeks) ++ burstRows(1L, 100, Seq("2024-01-29")) ++
      burstRows(2L, 100, weeks :+ "2024-01-29")
    val sv = rows.toDF("event_id", "ts", "user_id", "zone_id")
    val out = Monitoring.seasonalAnomaly(sv).cache()
    val anoms = out.filter(col("is_anom") === 1)
      .select("zone_id", "n_events").as[(Long, Long)].collect()
    // exactly the planted burst: zone 1's 100-event hour; zone 2's steady
    // 100s are that cell's normal and must NOT flag
    assert(anoms.toSeq === Seq((1L, 100L)), s"got ${anoms.toSeq}")
    // the profile is cell-scoped: zone 1's fences come from its own 10s
    val z1 = out.filter(col("zone_id") === 1L && col("n_events") === 100L).head()
    assert(z1.getAs[Double]("q1") === 10.0 && z1.getAs[Double]("q3") === 10.0)
    out.unpersist()
    ()
  }

  test("calibration bins: exact bin math, edge scores clamp into the top bin") {
    import spark.implicits._
    val scored = Seq(
      (0.05, 0), (0.05, 1),          // bin 0: mean_p 0.05, pos_rate 0.5
      (0.95, 1), (0.95, 1),          // bin 9
      (1.0, 1),                      // floor(10) clamps into bin 9
      (0.25, 0),                     // exact-binary edge → bin 2
    ).toDF("p", "label")
    val bins = Scoring.calibrationBins(scored, "label", "p")
      .collect().map(r => r.getAs[Int]("bin") -> r).toMap
    assert(bins.keySet === Set(0, 2, 9))
    val b0 = bins(0)
    assert(b0.getAs[Long]("n") === 2L)
    assert(b0.getAs[Double]("mean_p") === 0.05)
    assert(b0.getAs[Double]("pos_rate") === 0.5)
    assert(b0.getAs[Double]("gap") === 0.45)
    val b9 = bins(9)
    assert(b9.getAs[Long]("n") === 3L)     // the 1.0 score joined bin 9
    assert(b9.getAs[Double]("pos_rate") === 1.0)
    assert(bins(2).getAs[Long]("n") === 1L)
    // output is bin-bounded however big the input
    assert(Scoring.calibrationBins(scored, "label", "p", 4).count() <= 4)
  }

  test("churn scorer: probabilities in (0,1), declining flags raise risk, deterministic") {
    import spark.implicits._
    val feat = Seq(
      (1L, 0, 0, 5L), (2L, 1, 0, 5L), (3L, 1, 1, 5L), (4L, 1, 1, 1L),
    ).toDF("user_id", "events_declining", "value_declining", "daily_events")
    val p = Scoring.scoreChurn(feat)
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Double]("churn_p")).toMap
    assert(p.values.forall(v => v > 0.0 && v < 1.0))
    assert(p(2L) > p(1L) && p(3L) > p(2L))   // each flag raises risk
    assert(p(4L) > p(3L))                    // lower activity raises risk
    // hand value: z = −1.2 + 1.1 + 0.9 − 0.08 = 0.72
    assert(p(4L) === math.rint(1.0 / (1.0 + math.exp(-0.72)) * 1e6) / 1e6)
  }

  test("ab test: md5 arms reproduce, counts exact, degenerate zones give NULL z") {
    import spark.implicits._
    // 40 users; compute each user's arm with the SAME public hash the
    // operator uses, then plant conversions so expected counts are known
    val users = (1L to 40L)
    val armOf = users.toDF("user_id")
      .withColumn("t",
        graft.sampling.Sampling.hashFraction(col("user_id"), "ab") >= 0.5)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // zone 5: treatment users convert, control users don't → uplift 1
    //   (degenerate pooled variance is NOT hit: both arms non-empty, mixed)
    // zone 6: EVERYONE converts → pooled p = 1 → z must be NULL
    // zone 7: nobody converts → pooled p = 0 → z NULL, rates 0
    val events = users.flatMap { u =>
      val conv5 = if (armOf(u)) "purchase" else "view"
      Seq((u * 10 + 1, s"2024-01-01 10:00:00", u, conv5, 5L),
        (u * 10 + 2, s"2024-01-02 10:00:00", u, "purchase", 6L),
        (u * 10 + 3, s"2024-01-03 10:00:00", u, "view", 7L))
    }.toDF("event_id", "ts", "user_id", "event_type", "zone_id")
      .withColumn("ts", col("ts").cast("timestamp"))
    val out = Scoring.abTest(events)
      .collect().map(r => r.getAs[Long]("zone_id") -> r).toMap
    val nT = armOf.values.count(identity).toLong
    val nC = 40L - nT
    assert(nT > 0 && nC > 0, s"hash split degenerate: $nT/$nC")
    val z5 = out(5L)
    assert(z5.getAs[Long]("n_c") === nC && z5.getAs[Long]("n_t") === nT)
    assert(z5.getAs[Long]("x_c") === 0L && z5.getAs[Long]("x_t") === nT)
    assert(z5.getAs[Double]("p_c") === 0.0 && z5.getAs[Double]("p_t") === 1.0)
    assert(z5.getAs[Double]("uplift") === 1.0)
    assert(z5.getAs[Double]("z") > 5.0, "all-or-nothing split must be wildly significant")
    assert(out(6L).isNullAt(out(6L).fieldIndex("z")), "universal conversion → NULL z")
    assert(out(7L).isNullAt(out(7L).fieldIndex("z")), "zero conversion → NULL z")
    assert(out(7L).getAs[Double]("p_t") === 0.0 && out(7L).getAs[Double]("uplift") === 0.0)
  }

  test("kaplan-meier: hand-computed product-limit, censoring respected, zero factor pins S=0") {
    import spark.implicits._
    def ev(id: Long, day: Int, u: Long) =
      (id, s"2024-01-${"%02d".format(day)} 10:00:00", u)
    // A: Jan1..Jan2 (t=1, gap 18 → event);  B: Jan1..Jan20 (t=19, gap 0 →
    // censored); C: Jan5..Jan6 (t=1, event); D: Jan1 only (t=0, event)
    val rows = Seq(
      ev(1, 1, 1L), ev(2, 2, 1L),
      ev(3, 1, 2L), ev(4, 20, 2L),
      ev(5, 5, 3L), ev(6, 6, 3L),
      ev(7, 1, 4L),
    ).toDF("event_id", "ts", "user_id")
      .withColumn("ts", col("ts").cast("timestamp"))
      .withColumn("event_date", col("ts").cast("date"))
    val km = Scoring.kaplanMeier(rows)
      .collect().map(r => r.getAs[Int]("t") -> r).toMap
    // t=0: 4 at risk, 1 event → S = 3/4; t=1: 3 at risk, 2 events →
    // S = 0.75 · 1/3 = 0.25; t=19: censored only → S unchanged
    assert(km(0).getAs[Long]("n_risk") === 4L && km(0).getAs[Long]("d") === 1L)
    assert(km(0).getAs[Double]("survival") === 0.75)
    assert(km(1).getAs[Long]("n_risk") === 3L && km(1).getAs[Long]("d") === 2L)
    assert(km(1).getAs[Double]("survival") === 0.25)
    assert(km(19).getAs[Long]("d") === 0L && km(19).getAs[Long]("censored") === 1L)
    assert(km(19).getAs[Double]("survival") === 0.25)

    // zero factor: the longest-lived user churns → everyone at risk at
    // t_max dies there, S must be EXACTLY 0, not exp(ln 0) debris
    val zrows = Seq(
      ev(11, 1, 7L), ev(12, 10, 7L),    // t=9, gap 10 → event
      ev(13, 15, 8L), ev(14, 20, 8L),   // t=5, gap 0 → censored
    ).toDF("event_id", "ts", "user_id")
      .withColumn("ts", col("ts").cast("timestamp"))
      .withColumn("event_date", col("ts").cast("date"))
    val zkm = Scoring.kaplanMeier(zrows)
      .collect().map(r => r.getAs[Int]("t") -> r.getAs[Double]("survival")).toMap
    assert(zkm(5) === 1.0)
    assert(zkm(9) === 0.0)
  }
}
