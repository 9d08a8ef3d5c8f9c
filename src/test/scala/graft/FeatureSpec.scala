package graft

import org.apache.spark.sql.functions._

import graft.features.FeatureEngineering
import graft.pipeline.{Bronze, Silver}

class FeatureSpec extends SparkSpec {

  // sf0.001 has too few rows per zone for lag-14 support; features specs
  // exercise real data at sf0.01 (the correctness-gate SF).
  private val dir = "/root/testdata/sf0.01"
  private lazy val silver =
    Silver.cleanEvents(Bronze.ingestEvents(Tables.events(spark, dir)))

  test("demand features: complete history only, lag semantics correct") {
    val feat = FeatureEngineering.demandFeatures(silver).cache()
    assert(feat.count() > 0)
    val lagCols = Seq("demand_lag_1", "demand_lag_7", "demand_lag_14",
      "demand_avg_7d", "demand_avg_30d", "demand_std_7d", "avg_value_lag_1")
    assert(feat.filter(lagCols.map(col(_).isNull).reduce(_ || _)).count() === 0)
    // flags are consistent with the hour column
    assert(feat.filter(col("hour").between(7, 9) && col("is_peak_hour") =!= 1).count() === 0)
    assert(feat.filter(col("hour") === 12 && col("is_night") =!= 0).count() === 0)
  }

  test("lag/lead/rolling window semantics on a handcrafted frame") {
    import spark.implicits._
    // one user, 10 purchase days, value = day index → easy to verify lags
    val raw = (1 to 10).map { d =>
      (d.toLong, f"2024-01-$d%02d 08:00:00", 1L, "purchase", d.toDouble, """{"k": 1}""")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts").cast("timestamp"))
    val churn = FeatureEngineering.churnFeatures(
      Silver.cleanEvents(Bronze.ingestEvents(raw)))
    // lag-7 requires 7 prior days: rows for days 8..10 survive
    assert(churn.count() === 3)
    val day8 = churn.filter(col("event_date") === "2024-01-08").head()
    assert(day8.getAs[Long]("events_lag_7") === 1L)        // day 1 activity
    assert(day8.getAs[Long]("daily_events") === 1L)
    assert(day8.getAs[Double]("avg_events_30d") === 1.0)   // mean of days 1..7
    assert(day8.getAs[Int]("days_to_next") === 1)
    assert(day8.getAs[Int]("will_churn") === 0)
    // last day: lead is null → churn label fires
    val day10 = churn.filter(col("event_date") === "2024-01-10").head()
    assert(day10.getAs[Int]("will_churn") === 1)
  }

  test("surge features: ratio bounded below by 1 and windows partition by zone") {
    val feat = FeatureEngineering.surgeFeatures(silver).cache()
    assert(feat.count() > 0)
    // each hourly group has >=1 event per distinct user → ratio >= 1
    assert(feat.filter(col("demand_supply_ratio") < 1.0).count() === 0)
    val plan = feat.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }

  test("LOO target encoding: own target excluded, nulls get full mean, singletons null") {
    import spark.implicits._
    val rows = Seq(
      ("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(3.0)),
      ("a", None),                 // null target → full category mean = 2.0
      ("b", Some(7.0)))            // singleton → null encoding
      .toDF("cat", "y")
    val enc = FeatureEngineering.targetEncodeLoo(rows, "cat", "y").collect()
      .map(r => (r.getAs[String]("cat"), Option(r.getAs[Any]("y"))) -> r).toMap
    assert(enc(("a", Some(1.0))).getAs[Double]("target_enc") === 2.5)
    assert(enc(("a", Some(3.0))).getAs[Double]("target_enc") === 1.5)
    assert(enc(("a", None)).getAs[Double]("target_enc") === 2.0)
    assert(enc(("b", Some(7.0))).isNullAt(2))
    // leakage check on real data: no encoding ever equals the plain
    // category mean for a non-null target unless the target IS the mean
    val real = FeatureEngineering.targetEncodeLoo(silver, "event_type", "value").cache()
    assert(real.count() === silver.count())
    val plan = real.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"))
  }

  test("quantile bins: 10 near-equal bins, disjoint ranges, no global sort") {
    val orders = Tables.orders(spark, sfDir)
    val bins = FeatureEngineering.quantileBins(orders, "o_totalprice")
    val rows = bins.collect().sortBy(_.getAs[Int]("bin"))
    val total = orders.count()
    assert(rows.map(_.getAs[Int]("bin")).toSeq === (1 to 10))
    assert(rows.map(_.getAs[Long]("n")).sum === total, "bins partition the rows")
    // decile cutpoints → each bin within a couple rows of total/10
    rows.foreach(r => assert(math.abs(r.getAs[Long]("n") - total / 10) <= 2,
      s"bin ${r.getAs[Int]("bin")} holds ${r.getAs[Long]("n")} of $total"))
    // ranges are ordered and disjoint
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Double]("hi") <= b.getAs[Double]("lo"))
    }
    // the scale contract: binning must NOT plan a global-sort window
    val plan = bins.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"quantile bins must not use a global window:\n$plan")
  }

  test("robust scale: z moments correct per group, winsor bounds exact, singleton guarded") {
    val scaled = FeatureEngineering.robustScale(silver, "zone_id", "value").cache()
    // per-group z mean ~0 and sample sd ~1 over non-null values
    val moments = scaled.filter(col("z_value").isNotNull)
      .groupBy("zone_id")
      .agg(avg("z_value").as("zm"), stddev_samp("z_value").as("zs"), count(lit(1)).as("n"))
      .collect()
    moments.foreach { r =>
      assert(math.abs(r.getAs[Double]("zm")) < 1e-9, s"zone ${r.get(0)}: z mean ${r.get(1)}")
      assert(math.abs(r.getAs[Double]("zs") - 1.0) < 1e-6, s"zone ${r.get(0)}: z sd ${r.get(2)}")
    }
    // winsorized values live inside the group's [p05, p95], and values
    // already inside are untouched
    val withPct = silver.filter(col("value").isNotNull)
      .groupBy("zone_id")
      .agg(percentile(col("value"), lit(0.05)).as("p05"),
        percentile(col("value"), lit(0.95)).as("p95"))
    val chk = scaled.filter(col("value").isNotNull).join(withPct, "zone_id")
    assert(chk.filter(col("value_wins") < col("p05") || col("value_wins") > col("p95"))
      .count() === 0)
    assert(chk.filter(col("value") >= col("p05") && col("value") <= col("p95") &&
      col("value_wins") =!= col("value")).count() === 0)
    // null value (error events) → null z, null winsor
    assert(scaled.filter(col("value").isNull && col("z_value").isNotNull).count() === 0)
    // singleton group: variance is 0/0 — z must be NULL, not NaN/inf
    import spark.implicits._
    val single = Seq((1L, 10.0), (1L, 20.0), (2L, 5.0))
      .toDF("g", "v")
    val s1 = FeatureEngineering.robustScale(single, "g", "v")
    assert(s1.filter(col("g") === 2 && col("z_value").isNotNull).count() === 0)
    assert(s1.filter(col("g") === 1 && col("z_value").isNull).count() === 0)
    // stats broadcast back: no shuffle join on the fact side
    val plan = scaled.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"stats must broadcast:\n$plan")
    scaled.unpersist()
  }

  test("rfm: hand-built quintiles, exact-cents monetary, lifecycle segments") {
    import spark.implicits._
    // five users, strictly ordered on every axis: user i has frequency
    // 6−i, monetary (6−i)·10.10, last purchase Jan (31−i) → each lands
    // alone in quintile i on all three scores
    val rows = (1 to 5).flatMap { i =>
      (1 to (6 - i)).map { j =>
        (i * 100L + j, s"2024-01-${"%02d".format(31 - i)} 10:0$j:00", i.toLong, "purchase", 10.10)
      }
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
      .withColumn("event_date", col("ts").cast("date"))
    val rfm = FeatureEngineering.rfmSegments(rows)
      .collect().map(r => r.getAs[Long]("user_id") -> r).toMap
    (1 to 5).foreach { i =>
      val r = rfm(i.toLong)
      assert(r.getAs[Int]("recency") === i)
      assert(r.getAs[Long]("frequency") === (6 - i).toLong)
      assert(math.abs(r.getAs[Double]("monetary") - (6 - i) * 10.10) < 1e-9)
      assert(r.getAs[Int]("r_q") === i && r.getAs[Int]("f_q") === i && r.getAs[Int]("m_q") === i)
    }
    assert(rfm(1L).getAs[String]("segment") === "champion")
    assert(rfm(2L).getAs[String]("segment") === "champion")
    assert(rfm(3L).getAs[String]("segment") === "regular")
    // r_q ≥ 4 AND f_q ≥ 4 on the aligned toy → lost for both tail users
    assert(rfm(4L).getAs[String]("segment") === "lost")
    assert(rfm(5L).getAs[String]("segment") === "lost")
  }
}
