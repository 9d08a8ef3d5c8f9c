package graft

import org.apache.spark.sql.functions._

import graft.analytics.Analytics

class AnalyticsSpec extends SparkSpec {

  test("cube: all four grouping sets in one pass, grand total equals row count") {
    val li = Tables.lineitem(spark, sfDir)
    val cube = Analytics.pricingCube(li)
    val rows = cube.collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length === 1)
    assert(grand.head.getAs[Long]("n_items") === li.count())
    val flags = li.select("l_returnflag").distinct().count()
    val stats = li.select("l_linestatus").distinct().count()
    val pairs = li.select("l_returnflag", "l_linestatus").distinct().count()
    assert(rows.length === pairs + flags + stats + 1)
    // one pass: a cube must not scan the fact once per grouping set
    // (sparkPlan, not executedPlan — AQE's string repr prints the scan
    // twice, once under Final Plan and once under Initial Plan)
    val scans = cube.queryExecution.sparkPlan.toString
      .linesIterator.count(_.contains("Scan parquet"))
    assert(scans <= 1, "cube must expand grouping sets, not union scans")
    assert(cube.queryExecution.sparkPlan.toString.contains("Expand"))
  }

  test("above-nation-avg: every kept row beats its nation average, avgs broadcast") {
    val out = Analytics.aboveNationAvg(
      Tables.customer(spark, sfDir), Tables.nation(spark, sfDir)).cache()
    assert(out.count() > 0)
    assert(out.filter(col("c_acctbal") <= col("nation_avg")).count() === 0)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "nation avgs must broadcast")
  }

  test("window suite: five functions share one partition-sort, values consistent") {
    val out = Analytics.balanceWindows(
      Tables.customer(spark, sfDir), Tables.nation(spark, sfDir))
    // plan first, uncached (a cached frame's plan string embeds the
    // InMemoryRelation's stored plan and double-counts operators): a
    // shared window spec means ONE shuffle and ONE sort feed all five
    // window functions
    val plan = out.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)
    assert(plan.linesIterator.count(_.contains("Exchange hashpartitioning")) === 1,
      s"five window functions must share one shuffle:\n$plan")
    assert(plan.linesIterator.count(_.contains("Sort [")) === 1,
      s"five window functions must share one sort:\n$plan")
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => { val q = r.getAs[Int]("bal_quartile"); q >= 1 && q <= 4 }))
    assert(rows.forall(r => { val p = r.getAs[Double]("bal_pct"); p >= 0.0 && p <= 1.0 }))
    // rank 1 rows have no prev; every other row's prev >= own balance
    assert(rows.forall(r => r.getAs[Int]("bal_rank") != 1 || r.isNullAt(r.fieldIndex("prev_bal"))))
    assert(rows.forall(r => r.isNullAt(r.fieldIndex("prev_bal")) ||
      r.getAs[Double]("prev_bal") >= r.getAs[Double]("c_acctbal")))
  }

  test("semi/anti activity: partitions customers exactly, never multiplies the left side") {
    val cust = Tables.customer(spark, sfDir)
    val out = Analytics.orderActivityByNation(
      cust, Tables.orders(spark, sfDir), Tables.nation(spark, sfDir)).cache()
    val total = out.agg(sum(col("active_customers") + col("inactive_customers")))
      .head().getLong(0)
    assert(total === cust.count(), "semi + anti must partition the customers")
    assert(out.filter(col("active_customers") < 0 || col("inactive_customers") < 0)
      .count() === 0)
  }

  test("salted join: equals the plain join row-for-row, hot key spread across salts") {
    val big = spark.range(0, 10000L).select(
      col("id").as("row_id"),
      when(col("id") % 4 === 0, lit(0L)).otherwise(col("id") % 100).as("key"))
    val small = spark.range(0, 100L)
      .select(col("id").as("key"), (col("id") * 2).as("payload"))
    val salted = graft.analytics.SkewJoin.salted(big, small, "key", col("row_id"))
      .select("key", "row_id", "payload")
    val plain = big.join(small, "key").select("key", "row_id", "payload")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }

  test("range join: values land in every containing interval, bounds half-open, equi-join plan") {
    import spark.implicits._
    val points = Seq((1L, 5.0), (2L, 10.0), (3L, 14.9), (4L, 25.0)).toDF("id", "v")
    val ranges = Seq(("a", 0.0, 10.0), ("b", 5.0, 15.0), ("c", 30.0, 40.0))
      .toDF("name", "lo", "hi")
    val out = graft.analytics.RangeJoin.bucketed(points, ranges, "v", "lo", "hi", 4.0)
      .select("id", "name").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // 5.0 ∈ [0,10) and [5,15) (lo-inclusive); 10.0 ∉ [0,10) (hi-exclusive)
    assert(out === Set((1L, "a"), (1L, "b"), (2L, "b"), (3L, "b")))
    val plan = graft.analytics.RangeJoin.bucketed(points, ranges, "v", "lo", "hi", 4.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      "range join must plan as a bucketed equi-join")
  }

  test("as-of tolerance: stale prior rows null out, fresh ones match") {
    import spark.implicits._
    val left = Seq((1L, 100L, 10L), (2L, 100L, 500L)).toDF("event_id", "user_id", "ts")
    val right = Seq((100L, 5L, 1.0)).toDF("user_id", "ts", "purchase_value")
    val out = graft.analytics.AsOfJoin
      .asOf(left, right, "user_id", "ts", Seq("purchase_value"),
        toleranceSeconds = Some(100L))
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Double]("purchase_value_asof")).map(_.toDouble)).toMap
    assert(out(1L) === Some(1.0), "within tolerance: matches")
    assert(out(2L) === None, "past tolerance: stale payload must null out")
  }

  test("as-of forward: earliest following payload, tie-inclusive, tolerance bounds the gap") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, 10L), (2L, 100L, 20L), (3L, 100L, 30L), (4L, 200L, 15L))
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, 10L, 1.0),  // exactly at event 1's ts -> visible to it (<=)
      (100L, 25L, 2.0),  // next after events 2 and 3? only 2 (3 is at 30)
      (200L, 5L, 9.0))   // before event 4 -> never visible forward
      .toDF("user_id", "ts", "purchase_value")
    val out = graft.analytics.AsOfJoin
      .asOf(left, right, "user_id", "ts", Seq("purchase_value"), direction = "forward")
    val byEvent = out.collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Double]("purchase_value_asof")).map(_.toDouble)).toMap
    assert(byEvent(1L) === Some(1.0), "right row at exactly left.ts matches (<=)")
    assert(byEvent(2L) === Some(2.0))
    assert(byEvent(3L) === None, "no following right row")
    assert(byEvent(4L) === None, "prior right rows are invisible forward")
    // tolerance: a following row further than the bound nulls out
    val tol = graft.analytics.AsOfJoin
      .asOf(left, right, "user_id", "ts", Seq("purchase_value"),
        direction = "forward", toleranceSeconds = Some(3L))
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Double]("purchase_value_asof")).map(_.toDouble)).toMap
    assert(tol(1L) === Some(1.0), "gap 0 within tolerance")
    assert(tol(2L) === None, "gap 5 > tolerance 3")
  }

  test("as-of nearest: closer side wins, ties backward, one sort in the plan") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, 10L),  // right at 10 (gap 0 back) and 12 (gap 2 fwd) -> back
      (2L, 100L, 20L),  // right at 12 (gap 8 back) and 25 (gap 5 fwd) -> fwd
      (3L, 100L, 26L),  // right at 25 (gap 1 back) and 27 (gap 1 fwd) -> tie: back
      (4L, 200L, 50L))  // no right rows for key 200 -> null
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, 10L, 1.0), (100L, 12L, 2.0), (100L, 25L, 3.0), (100L, 27L, 4.0))
      .toDF("user_id", "ts", "purchase_value")
    val nearest = graft.analytics.AsOfJoin
      .asOf(left, right, "user_id", "ts", Seq("purchase_value"), direction = "nearest")
    val byEvent = nearest.collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Double]("purchase_value_asof")).map(_.toDouble)).toMap
    assert(byEvent(1L) === Some(1.0), "exact-ts match counts as backward gap 0")
    assert(byEvent(2L) === Some(3.0), "closer following row wins")
    assert(byEvent(3L) === Some(3.0), "equal gaps resolve backward (pandas tie rule)")
    assert(byEvent(4L) === None)
    // tolerance bounds the winning gap
    val tol = graft.analytics.AsOfJoin
      .asOf(left, right, "user_id", "ts", Seq("purchase_value"),
        direction = "nearest", toleranceSeconds = Some(1L))
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Double]("purchase_value_asof")).map(_.toDouble)).toMap
    assert(tol(1L) === Some(1.0) && tol(3L) === Some(3.0))
    assert(tol(2L) === None, "winning gap 5 > tolerance 1")
    // both window frames share one sort (AQE toString repeats the plan in
    // its Initial Plan section — audit only the final plan): a second Sort
    // would mean the mirrored frame broke the shared (ts, tag) order
    val plan = nearest.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val sorts = "\\bSort \\[".r.findAllIn(plan).length
    assert(sorts === 1, s"expected one shared sort, got $sorts:\n$plan")
    assert("\\bWindow \\[".r.findAllIn(plan).length === 1,
      "both frames must fuse into one Window operator")
  }

  test("as-of join: latest prior payload per key, tie-inclusive, no range nested-loop") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, 10L), (2L, 100L, 20L), (3L, 100L, 25L), (4L, 200L, 15L))
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, 10L, 1.0),  // exactly at event 1's ts -> visible to it (>=)
      (100L, 22L, 2.0),  // between events 2 and 3
      (200L, 99L, 9.0))  // after event 4 -> never visible
      .toDF("user_id", "ts", "purchase_value")
    val out = graft.analytics.AsOfJoin
      .asOf(left, right, "user_id", "ts", Seq("purchase_value"))
    val byEvent = out.collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Double]("purchase_value_asof")).map(_.toDouble)).toMap
    assert(byEvent(1L) === Some(1.0))
    assert(byEvent(2L) === Some(1.0))
    assert(byEvent(3L) === Some(2.0))
    assert(byEvent(4L) === None)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      "as-of must plan as union+window, never a range join")
  }

  test("as-of picks ONE atomic right row: a null payload on the latest row stays null") {
    import spark.implicits._
    // the latest prior right row (ts=100) carries a NULL payload; per-
    // column last(ignoreNulls) would reach past it to the ts=10 row —
    // merge_asof / DuckDB ASOF semantics say the row at ts=100 wins and
    // its null payload is the answer
    val left = Seq((1L, 100L, 105L)).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, 10L, Some(5.0)),
      (100L, 100L, Option.empty[Double])).toDF("user_id", "ts", "purchase_value")
    val out = graft.analytics.AsOfJoin
      .asOf(left, right, "user_id", "ts", Seq("purchase_value")).head()
    assert(out.isNullAt(out.fieldIndex("purchase_value_asof")),
      "payload must come from the matched row, not an older non-null one")
    // and the tolerance is measured against that same row: the ts=100
    // row is 5s away (within 10s), so the match gap passes even though
    // the older non-null row is 95s stale — payload still null
    val tol = graft.analytics.AsOfJoin
      .asOf(left, right, "user_id", "ts", Seq("purchase_value"),
        toleranceSeconds = Some(10L)).head()
    assert(tol.isNullAt(tol.fieldIndex("purchase_value_asof")))
    // nearest direction: same atomicity through both frames
    val near = graft.analytics.AsOfJoin
      .asOf(left, right, "user_id", "ts", Seq("purchase_value"),
        direction = "nearest").head()
    assert(near.isNullAt(near.fieldIndex("purchase_value_asof")))
  }

  test("q1 pricing summary: one aggregate pass, bounded group count") {
    val q1 = Analytics.pricingSummary(Tables.lineitem(spark, sfDir)).cache()
    assert(q1.count() > 0 && q1.count() <= 9) // |returnflag| x |linestatus|
    // one scan, no join, whole-stage codegen
    val plan = q1.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"))
    // ship-date filter reaches the parquet scan
    val formatted = q1.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(formatted.contains("PushedFilters") && formatted.contains("l_shipdate"))
  }

  test("q5 snowflake joins broadcast the bounded dims and filter the region early") {
    val q5 = Analytics.localSupplierVolume(
      Tables.lineitem(spark, sfDir), Tables.orders(spark, sfDir),
      Tables.customer(spark, sfDir), Tables.supplier(spark, sfDir),
      Tables.nation(spark, sfDir), Tables.region(spark, sfDir)).cache()
    assert(q5.count() > 0 && q5.count() <= 5) // nations of one region
    val plan = q5.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("top-N per group: exactly n rows per brand with dense coverage") {
    val top = Analytics.topPartsPerBrand(
      Tables.lineitem(spark, sfDir), Tables.part(spark, sfDir), n = 3).cache()
    val perBrand = top.groupBy("p_brand").count()
    assert(perBrand.filter(col("count") > 3).count() === 0)
    assert(top.filter(col("rank") < 1 || col("rank") > 3).count() === 0)
  }

  test("rollup emits subtotal and grand-total rows") {
    val r = Analytics.customersRollup(
      Tables.customer(spark, sfDir), Tables.nation(spark, sfDir),
      Tables.region(spark, sfDir)).cache()
    assert(r.filter(col("r_name").isNull && col("n_name").isNull).count() === 1)
    val regions = r.filter(col("r_name").isNotNull && col("n_name").isNull).count()
    assert(regions === 5)
    // grand total equals full customer count
    val total = r.filter(col("r_name").isNull && col("n_name").isNull)
      .head().getAs[Long]("customer_count")
    assert(total === Tables.customer(spark, sfDir).count())
  }

  test("grouping sets: exactly the three requested views, each summing to the total") {
    // not cached: PlanAuditSpec audits this exact lineage — a live cache
    // entry would wrap it in InMemoryRelation and distort the plan audit
    val g = Analytics.customersGroupingSets(
      Tables.customer(spark, sfDir), Tables.nation(spark, sfDir),
      Tables.region(spark, sfDir))
    val nCust = Tables.customer(spark, sfDir).count()
    // gid encodes which set a row came from (first grouping column = MSB):
    // (r_name, c_mktsegment) → 010=2, (n_name) → 101=5, () → 111=7
    assert(g.select("gid").distinct().collect().map(_.getLong(0)).toSet === Set(2L, 5L, 7L))
    val bySet = g.groupBy("gid").agg(sum("customer_count").as("n"))
      .collect().map(r => r.getAs[Long]("gid") -> r.getAs[Long]("n")).toMap
    // every grouping set partitions the same joined rows
    assert(bySet === Map(2L -> nCust, 5L -> nCust, 7L -> nCust))
    // a CUBE over 3 columns would emit 8 combinations; sets emit 3
    val rSeg = g.filter(col("gid") === 2)
    assert(rSeg.filter(col("r_name").isNull || col("c_mktsegment").isNull
      || col("n_name").isNotNull).count() === 0)
  }

  test("unpivot: one Expand melts 4 measures, masses match the wide table") {
    val li = Tables.lineitem(spark, sfDir)
    val melted = Analytics.meltedMeasures(li)
    val rows = melted.collect()
    val flags = li.select("l_returnflag").distinct().count()
    assert(rows.length === flags * 4, "one output group per (flag, measure)")
    // per-measure mass equals the wide column's direct aggregate
    val qty = rows.filter(_.getAs[String]("measure") == "l_quantity")
      .map(_.getAs[Double]("sum_value")).sum
    assert(math.abs(qty - li.agg(sum("l_quantity")).head().getDouble(0)) < 1e-6)
    // every group saw exactly the flag's row count
    val n = rows.filter(_.getAs[String]("measure") == "l_tax")
      .map(_.getAs[Long]("n")).sum
    assert(n === li.count())
    // one scan: the melt is an Expand, not four unions re-reading the fact
    val plan = melted.queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), s"unpivot should plan as Expand:\n$plan")
    assert(!plan.contains("Union"), s"unpivot must not plan as self-union:\n$plan")
  }

  test("set ops: intersect/except partition the urgent customer set") {
    val orders = Tables.orders(spark, sfDir)
    val out = Analytics.prioritySetOps(orders).cache()
    val urgent = orders.filter(col("o_orderpriority") === "1-URGENT")
      .select("o_custkey").distinct().count()
    val both = out.filter(col("set_op") === "both_extremes")
    val only = out.filter(col("set_op") === "urgent_only")
    // INTERSECT ∪ EXCEPT = the distinct left side, disjointly
    assert(both.count() + only.count() === urgent)
    assert(both.select("o_custkey").intersect(only.select("o_custkey")).count() === 0)
    // set semantics: no duplicates survive either branch
    assert(out.count() === out.distinct().count())
    // INTERSECT members really do have a 5-LOW order; EXCEPT members don't
    val lows = orders.filter(col("o_orderpriority") === "5-LOW").select("o_custkey").distinct()
    assert(both.select("o_custkey").except(lows).count() === 0)
    assert(only.select("o_custkey").intersect(lows).count() === 0)
    out.unpersist()
  }

  test("fuzzy join: segment blocking is lossless vs brute force, hash join only") {
    val part = Tables.part(spark, sfDir)
    val fuzzy = Analytics.fuzzyNameJoin(part).cache()
    assert(fuzzy.count() > 0)
    // brute force ground truth: unblocked distinct-name cross pairs
    val names = part.select(col("p_name").as("n")).distinct()
    val brute = names.alias("a").join(names.alias("b"), col("a.n") < col("b.n"))
      .select(col("a.n").as("name_a"), col("b.n").as("name_b"),
        levenshtein(col("a.n"), col("b.n")).as("edit_distance"))
      .filter(col("edit_distance") <= 2)
    assert(fuzzy.exceptAll(brute).count() === 0, "blocking invented a pair")
    assert(brute.exceptAll(fuzzy).count() === 0,
      "segment blocking dropped a qualifying pair — it must be lossless")
    // self-pairs excluded, distances within bound, ordered pair key
    assert(fuzzy.filter(col("name_a") >= col("name_b")).count() === 0)
    assert(fuzzy.filter(col("edit_distance") < 1 || col("edit_distance") > 2).count() === 0)
    // the blocked join must plan as a hash equi-join on segments, not NLJ
    val plan = fuzzy.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"fuzzy join must block via equi-join:\n$plan")
    fuzzy.unpersist()
  }

  test("fuzzy join: adversarial dictionary — short names, shifts, skewed lengths") {
    import spark.implicits._
    // One dominant length bucket (the case length-band blocking fans out
    // quadratically on), prefix/suffix shifts up to k, deletions inside
    // segments, short names (len ≤ k) that can't be segmented, and far
    // pairs that must NOT appear.
    val dict = Seq(
      "abcdefgh", "xxabcdefgh", "abcdefghyy", "acdefgh", "abcdegh",
      "abcdffgh", "hgfedcba", "abcdefghij", "cdefgh",
      "a", "b", "ab", "", "zz",
      "mmmmmmmm", "nnnnnnnn", "mmmmmmnn").toDF("name")
    val fuzzy = Analytics.fuzzyNameJoin(dict, "name", maxDist = 2).cache()
    val brute = dict.select(col("name").as("n")).distinct().alias("a")
      .join(dict.select(col("name").as("n")).distinct().alias("b"),
        col("a.n") < col("b.n"))
      .select(col("a.n").as("name_a"), col("b.n").as("name_b"),
        levenshtein(col("a.n"), col("b.n")).as("edit_distance"))
      .filter(col("edit_distance") <= 2)
    assert(fuzzy.exceptAll(brute).count() === 0, "invented a pair")
    assert(brute.exceptAll(fuzzy).count() === 0,
      s"dropped a qualifying pair; got ${fuzzy.collect().mkString(", ")}")
    // the short stratum really did pair up (ed("a","b")=1, ed("","ab")=2…)
    assert(fuzzy.filter(col("name_a") === "a" && col("name_b") === "b").count() === 1)
    assert(fuzzy.filter(col("name_a") === "" && col("name_b") === "ab").count() === 1)
    fuzzy.unpersist()
  }

  test("argmax: max_by/min_by pick the priced extremes in one aggregate, no window") {
    val orders = Tables.orders(spark, sfDir)
    val ext = Analytics.argExtremes(orders).cache()
    assert(ext.count() === orders.select("o_custkey").distinct().count())
    // top_order's price IS the max price (join back to check)
    val chk = ext.join(orders.select(col("o_custkey"), col("o_orderkey").as("top_order"),
      col("o_totalprice").as("chk_price")), Seq("o_custkey", "top_order"))
    assert(chk.filter(col("chk_price") =!= col("top_price")).count() === 0)
    // single-order customers: both extremes collapse to the same order
    assert(ext.filter(col("n_orders") === 1 && col("top_order") =!= col("bottom_order"))
      .count() === 0)
    // max_by's string ordering key gives the aggregate an immutable
    // buffer, so Spark plans SortAggregate (local sorts only) — the
    // contract here is no Window pass and no join back onto the fact,
    // and partial aggregation still precedes the one key shuffle
    val plan = ext.queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && !plan.contains("Join"),
      s"argmax must be one aggregate, not a window or self-join:\n$plan")
    // operator-level assert (not the "partial_max_by" operator-name
    // spelling, which is brittle across Spark upgrades): a partial
    // aggregate mode must appear before the shuffle
    assert(plan.contains("partial_"),
      s"argmax must partial-aggregate before the shuffle:\n$plan")
    ext.unpersist()
  }

  test("z-order: interleave exact on known values, bijective, layout clusters both dims") {
    import spark.implicits._
    import graft.analytics.ZOrder
    // driver-side reference interleave
    def zRef(a: Int, b: Int): Long =
      (0 until 16).foldLeft(0L) { (acc, i) =>
        acc | ((a >> i) & 1).toLong << (2 * i) | ((b >> i) & 1).toLong << (2 * i + 1)
      }
    val pts = for (a <- 0 until 32; b <- 0 until 32) yield (a, b)
    val df = pts.toDF("a", "b")
      .withColumn("zval", ZOrder.zValue(col("a"), col("b")))
    val got = df.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got((0, 0)) === 0L && got((1, 0)) === 1L && got((0, 1)) === 2L)
    assert(got((5, 3)) === 27L)
    assert(pts.forall { case (a, b) => got((a, b)) === zRef(a, b) })
    // bijective on the grid
    assert(df.select("zval").distinct().count() === pts.size)
    // layout: 16 partitions over a 32×32 grid — every partition's
    // bounding box must be a small rectangle in BOTH dimensions (the
    // whole point vs a single-column sort, whose trailing dim spans the
    // full range in every partition)
    val laid = ZOrder.zOrderLayout(pts.toDF("a", "b"), "a", "b", numPartitions = 16)
    val boxes = laid
      .withColumn("pid", org.apache.spark.sql.functions.spark_partition_id())
      .groupBy("pid")
      .agg((max("a") - min("a") + 1).as("wa"), (max("b") - min("b") + 1).as("wb"))
      .collect()
    val avgArea = boxes.map(r => r.getInt(1).toLong * r.getInt(2)).sum.toDouble / boxes.length
    // perfect quadrants would be 64 (8×8); allow slack for sampled range
    // bounds, but demand far below the 1024 a full-span dim would give
    assert(avgArea < 300.0, s"z-layout boxes too loose: avg area $avgArea")
    // the plan is ONE range exchange + local sort, no global sort
    val plan = laid.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning") || plan.contains("RangePartitioning"),
      s"expected range partitioning in:\n$plan")
  }

  test("3-D z-order: interleave exact vs reference, bijective, boxes tight in all three dims") {
    import spark.implicits._
    import graft.analytics.ZOrder
    def zRef3(a: Int, b: Int, c: Int): Long =
      (0 until 21).foldLeft(0L) { (acc, i) =>
        acc | ((a >> i) & 1).toLong << (3 * i) |
          ((b >> i) & 1).toLong << (3 * i + 1) |
          ((c >> i) & 1).toLong << (3 * i + 2)
      }
    val pts = for (a <- 0 until 16; b <- 0 until 16; c <- 0 until 16) yield (a, b, c)
    val df = pts.toDF("a", "b", "c")
      .withColumn("zval", ZOrder.zValue3(col("a"), col("b"), col("c")))
    val got = df.collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> r.getLong(3)).toMap
    assert(got((1, 0, 0)) === 1L && got((0, 1, 0)) === 2L && got((0, 0, 1)) === 4L)
    // big-coordinate sanity against the reference (the 21-bit masks)
    val bigDf = Seq((1234567, 2021161, 99)).toDF("a", "b", "c")
      .withColumn("zval", ZOrder.zValue3(col("a"), col("b"), col("c")))
    assert(bigDf.head().getLong(3) === zRef3(1234567, 2021161, 99))
    assert(pts.forall { case (a, b, c) => got((a, b, c)) === zRef3(a, b, c) })
    assert(df.select("zval").distinct().count() === pts.size)
    // 16 partitions over a 16^3 grid: every partition's bounding BOX must
    // be tight in ALL THREE dims — a 2-D interleave or lexicographic sort
    // leaves the extra dim spanning the full range
    val laid = ZOrder.zOrderLayoutN(pts.toDF("a", "b", "c"), Seq("a", "b", "c"),
      numPartitions = 16)
    val boxes = laid
      .withColumn("pid", org.apache.spark.sql.functions.spark_partition_id())
      .groupBy("pid")
      .agg((max("a") - min("a") + 1).as("wa"), (max("b") - min("b") + 1).as("wb"),
        (max("c") - min("c") + 1).as("wc"))
      .collect()
    val avgVol = boxes.map(r => r.getInt(1).toLong * r.getInt(2) * r.getInt(3))
      .sum.toDouble / boxes.length
    // perfect octants at 16 partitions would be 256 (8x8x4-ish); a
    // full-span third dim would give >= 1024 — demand well below
    assert(avgVol < 700.0, s"3-D z-layout boxes too loose: avg volume $avgVol")
    intercept[IllegalArgumentException] {
      ZOrder.zOrderLayoutN(pts.toDF("a", "b", "c"), Seq("a"))
    }
  }

  test("OPTIMIZE ZORDER BY three columns: versioned table prunes on the third dimension") {
    import spark.implicits._
    import graft.sources.VersionedTable
    val t = java.nio.file.Files.createTempDirectory("vt_z3").toString
    val pts = (for (a <- 0 until 32; b <- 0 until 32; c <- 0 until 32)
      yield (a.toLong, b.toLong, c.toLong)).toDF("a", "b", "c")
    VersionedTable.commit(pts.repartition(16), t, mode = "overwrite",
      ts = "2026-01-01T00:00:00Z")
    VersionedTable.optimize(spark, t, targetFileBytes = 8L * 1024,
      zorderCols = Seq("a", "b", "c"), ts = "2026-01-02T00:00:00Z")
    val total = VersionedTable.snapshotFiles(spark, t).size
    assert(total >= 8, s"need a multi-file layout to measure pruning, got $total")
    // a narrow slice on the THIRD column alone: file-level stats pruning
    // must engage (every file's c-range is a tight box side) — on the
    // hash layout every file spans the full c-domain and nothing prunes
    val kept = VersionedTable.prunedFiles(spark, t, "c >= 2 AND c <= 3").size
    assert(kept * 2 <= total, s"z3 layout must prune on c: kept $kept of $total")
    assert(VersionedTable.readWhere(spark, t, "c >= 2 AND c <= 3").count() ===
      32L * 32 * 2)
  }
}
