package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** General analytic query capability over the TPC-H-ish star schema —
  * graft's OLAP core (SURVEY.md §2.5). No reference-counterpart module;
  * these exercise the engine the way a warehouse user would.
  *
  * Scale notes: the fact (`lineitem`) is only ever scanned and hash-
  * aggregated — predicates and column pruning reach the parquet scan.
  * Dimension tables are broadcast (region/nation/supplier are structurally
  * tiny; customer/orders broadcast at these SFs and would shuffle-join
  * cleanly at 100 TB via AQE size estimation — only `region`/`nation`
  * carry explicit hints, mirroring the Gold-layer policy of hinting only
  * structurally-bounded dims).
  */
object Analytics {

  /** TPC-H Q1-shape multi-aggregate scan: one pass, eight aggregates,
    * map-side partial aggregation into a 6-group result. */
  def pricingSummary(lineitem: DataFrame, shipBefore: String = "1999-01-01"): DataFrame =
    lineitem
      .filter(col("l_shipdate") <= lit(shipBefore).cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum("l_quantity").as("sum_qty"),
        sum("l_extendedprice").as("sum_base_price"),
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        avg("l_quantity").as("avg_qty"),
        avg("l_extendedprice").as("avg_price"),
        avg("l_discount").as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** Exact revenue sum: `extendedprice` and `discount` are 2-dp values,
    * so each line's `ep·(1−disc)` is EXACTLY a 4-dp number — summing its
    * ×10⁴ integer image (an integer-valued double, exact in any
    * accumulation order) then dividing once recovers the true revenue
    * bit-identically on every engine. A raw double sum drifts a last ulp
    * with partial-aggregation order (caught by the round-8 exact local
    * gate). Magnitude bound: the scaled per-group sum must stay below
    * 2⁵³ — per-order revenue (≤ 7 lines × 1e5 × 1e4 = 7e9) and per-nation
    * revenue at any tested SF are far under it. */
  private val revenueExact =
    (sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 10000)) / 10000)
      .as("revenue")

  /** TPC-H Q3-shape: segment-filtered customer × orders × lineitem,
    * revenue per order. Filters apply before every join so the join inputs
    * are pruned at the scan. */
  def shippingPriority(
      customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
      segment: String = "BUILDING", cutoff: String = "1998-01-01"): DataFrame = {
    val cut = lit(cutoff).cast("timestamp")
    customer.filter(col("c_mktsegment") === segment)
      .join(orders.filter(col("o_orderdate") < cut), col("c_custkey") === col("o_custkey"))
      .join(lineitem.filter(col("l_shipdate") > cut), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(revenueExact, count(lit(1)).as("line_count"))
  }

  /** TPC-H Q5-shape snowflake: lineitem × orders × customer × supplier ×
    * nation × region, revenue by nation within one region-year. The
    * customer-supplier co-nationality predicate makes this a genuine
    * 6-table multijoin. */
  def localSupplierVolume(
      lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
      supplier: DataFrame, nation: DataFrame, region: DataFrame,
      regionName: String = "ASIA", yearStart: String = "1996-01-01", yearEnd: String = "1997-01-01"): DataFrame =
    lineitem
      .join(orders.filter(col("o_orderdate") >= lit(yearStart).cast("timestamp") &&
        col("o_orderdate") < lit(yearEnd).cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(supplier, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region.filter(col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(revenueExact, count(lit(1)).as("line_count"))

  /** Per-group top-N via a rank window: top 3 parts per brand by lineitem
    * popularity. Integer sort keys + partkey tie-break keep the ranking
    * bit-deterministic. The window partitions by brand — bounded state per
    * partition, no global sort. */
  def topPartsPerBrand(lineitem: DataFrame, part: DataFrame, n: Int = 3): DataFrame = {
    val counts = lineitem
      .join(part.select("p_partkey", "p_brand"), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_partkey"))
      .agg(count(lit(1)).as("order_count"))
    val w = Window.partitionBy("p_brand").orderBy(col("order_count").desc, col("p_partkey"))
    counts
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= n)
  }

  /** Semi/anti-join surface: per nation, customers WITH at least one order
    * (left_semi — never duplicates the left side, unlike an inner join to
    * a dedup'd orders) and customers with NONE (left_anti). Both joins
    * shuffle only on custkey; the nation dim is broadcast at the end. */
  def orderActivityByNation(customer: DataFrame, orders: DataFrame, nation: DataFrame): DataFrame = {
    val ordKeys = orders.select("o_custkey")
    val active = customer
      .join(ordKeys, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("active_customers"))
    val inactive = customer
      .join(ordKeys, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("inactive_customers"))
    active.join(inactive, Seq("c_nationkey"), "full_outer")
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .select(
        col("n_name").as("nation"),
        coalesce(col("active_customers"), lit(0L)).as("active_customers"),
        coalesce(col("inactive_customers"), lit(0L)).as("inactive_customers"))
  }

  /** CUBE over (returnflag, linestatus): all four grouping combinations —
    * per-pair, per-flag, per-status, grand total — in ONE pass. Spark
    * expands the cube on the map side and partial-aggregates every
    * grouping set before the single shuffle, so the fact is scanned once
    * no matter how many grouping sets the cube implies. */
  def pricingCube(lineitem: DataFrame): DataFrame =
    lineitem
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n_items"),
        sum("l_quantity").as("sum_qty"),
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"))

  /** Customers whose balance beats their nation's average — the classic
    * correlated scalar subquery, expressed directly in its decorrelated
    * form: one partial-agg shuffle builds the 25-row per-nation average,
    * which is broadcast back onto the customer scan (Catalyst would plan
    * the subquery form the same way; declaring the join makes the
    * broadcast explicit and keeps the fact side shuffle-free). */
  def aboveNationAvg(customer: DataFrame, nation: DataFrame): DataFrame = {
    val avgs = customer.groupBy("c_nationkey").agg(avg("c_acctbal").as("nation_avg"))
    customer
      .join(broadcast(avgs), "c_nationkey")
      .filter(col("c_acctbal") > col("nation_avg"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("n_name").as("nation"), col("nation_avg"))
  }

  /** The analytic-window suite over one partition pass: per-nation balance
    * rank, percent_rank, quartile (ntile), and neighboring balances
    * (lag/lead). All five functions share ONE window spec, so Spark plans
    * a single partition-sort and evaluates them in the same Window
    * operator — adding a function costs nothing extra. The partition key
    * (nation) keeps per-partition state at customers-per-nation; the
    * (acctbal DESC, custkey) order is a deterministic total order, which
    * ntile/rank parity across engines requires. */
  def balanceWindows(customer: DataFrame, nation: DataFrame): DataFrame = {
    val w = Window.partitionBy("c_nationkey")
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .select(
        col("n_name").as("nation"), col("c_custkey"), col("c_acctbal"),
        rank().over(w).as("bal_rank"),
        percent_rank().over(w).as("bal_pct"),
        ntile(4).over(w).as("bal_quartile"),
        lag("c_acctbal", 1).over(w).as("prev_bal"),
        lead("c_acctbal", 1).over(w).as("next_bal"))
  }

  /** Hierarchical ROLLUP: customers per region → nation with subtotal and
    * grand-total rows (null-filled grouping columns, same convention as
    * ANSI ROLLUP). */
  def customersRollup(customer: DataFrame, nation: DataFrame, region: DataFrame): DataFrame =
    customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("customer_count"), sum(col("c_acctbal")).as("total_acctbal"))

  /** ANSI GROUPING SETS — the non-hierarchical generalization ROLLUP/CUBE
    * can't express: one pass computes the (region × market segment) grid,
    * the per-nation view, and the grand total, and NOTHING else (a CUBE
    * over the same three columns would pay for 8 grouping combinations to
    * get these 3). Spark expands the sets into a single Expand + hash
    * aggregate — one scan, one shuffle, exactly like rollup/cube. Absent
    * grouping columns are null-filled per the ANSI convention; `gid`
    * (grouping_id) disambiguates which set a row belongs to. */
  def customersGroupingSets(customer: DataFrame, nation: DataFrame,
      region: DataFrame): DataFrame =
    customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupingSets(
        Seq(Seq(col("r_name"), col("c_mktsegment")), Seq(col("n_name")), Seq.empty),
        col("r_name"), col("n_name"), col("c_mktsegment"))
      .agg(count(lit(1)).as("customer_count"), sum(col("c_acctbal")).as("total_acctbal"),
        grouping_id().as("gid"))

  /** Wide→long UNPIVOT (melt): the four lineitem measure columns become
    * (measure, value) rows, then one hash aggregate summarizes each
    * measure per return flag. Spark plans the unpivot as a single Expand —
    * the fact is scanned ONCE and each input row fans out to 4 in the
    * same stage (map-side, codegen'd), so the cost is one scan + one
    * partial-aggregated shuffle into a 12-group result, not four
    * self-unions re-reading 100 TB. The inverse of [[Aggregates]]' pivot. */
  def meltedMeasures(lineitem: DataFrame): DataFrame =
    lineitem
      .unpivot(
        Array(col("l_returnflag")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax")),
        "measure", "value")
      .groupBy("l_returnflag", "measure")
      .agg(
        count(lit(1)).as("n"),
        sum("value").as("sum_value"),
        round(avg("value"), 6).as("avg_value"))

  /** ANSI set operations: customers ordering at BOTH priority extremes
    * (INTERSECT) and at urgent only (EXCEPT), tagged and stacked. Spark
    * plans INTERSECT/EXCEPT as aggregate + left-semi/anti hash joins —
    * set semantics (distinct) per the standard, no sort, and the two
    * branches share the scan via exchange reuse. */
  def prioritySetOps(orders: DataFrame): DataFrame = {
    val urgent = orders.filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
    val low = orders.filter(col("o_orderpriority") === "5-LOW").select("o_custkey")
    urgent.intersect(low).withColumn("set_op", lit("both_extremes"))
      .unionByName(urgent.except(low).withColumn("set_op", lit("urgent_only")))
  }

  /** Edit-distance similarity join (entity resolution): all DISTINCT name
    * pairs within `maxDist` Levenshtein edits — the string face of the
    * similarity-join family (sets → Jaccard, vectors → cosine, strings →
    * edit distance). Dictionary-level on purpose: names are deduplicated
    * BEFORE pairing, so the candidate space is the entity dictionary,
    * not the fact table.
    *
    * Blocking is LOSSLESS segment blocking in the style of PassJoin
    * (Li, Deng & Feng, PVLDB 2011): each build name of length L splits
    * into k+1 contiguous segments. If lev(a,b) ≤ k then, over an optimal
    * alignment, some segment is edit-free (pigeonhole: ≤ k edits, k+1
    * segments) and every character in it shifts by at most the number of
    * preceding edits ≤ k — so the probe contains that segment VERBATIM,
    * starting within ±k of its build-side position. The probe therefore
    * emits, per candidate build length L ∈ [len−k, len+k] and segment
    * index, the ≤ 2k+1 aligned substrings — a constant ≤ (2k+1)²(k+1)
    * keys per name — and candidates come from ONE hash equi-join on
    * (L, segment_index, segment_text). Candidate volume is linear in
    * the dictionary + the true near-pair count. Length-band blocking
    * (the natural first cut) is NOT used: its fan-out is Σ_ℓ n_ℓ² —
    * quadratic per length bucket, effectively all-pairs on a real name
    * distribution with ~20 distinct lengths (measured: see BASELINE.md
    * "fuzzy 10× dictionary" stress lines).
    *
    * Names shorter than k+1 chars cannot be segmented, but any two
    * strings of length ≤ k are trivially within k edits (substitute the
    * overlap, insert the rest), so the short stratum pairs exhaustively
    * through a length-key join — its size is alphabet-bounded.
    * Verification uses Spark's threshold Levenshtein (early-abandons
    * above k, returns −1) so per-pair cost is k·min(len), not len².
    *
    * Honest limit: like every signature-based lossless scheme, exact
    * segments degrade when their VALUES are low-entropy — a dictionary
    * of `Customer#000000001`-style keys puts the shared literal prefix
    * in one segment for every name, and that bucket joins quadratically
    * (the stop-shingle failure mode of [[graft.dedup.Dedup.ngramJaccard]],
    * which there is capped at the documented cost of coarseness; capping
    * here would break the lossless contract instead). Strip known
    * boilerplate prefixes before calling on such keys. */
  def fuzzyNameJoin(df: DataFrame, nameCol: String = "p_name",
      maxDist: Int = 2): DataFrame = {
    val k = maxDist
    val nSeg = k + 1
    val names = df.select(col(nameCol).as("name")).distinct()
      .withColumn("len", length(col("name")))

    // Even partition of a length-L string into k+1 segments: the first
    // (k+1 − L mod (k+1)) get ⌊L/(k+1)⌋ chars, the rest one more.
    def segLen(l: Column, i: Column): Column = {
      val q = floor(l / nSeg).cast("int")
      val t = lit(nSeg) - (l % nSeg)
      when(i < t, q).otherwise(q + 1)
    }
    def segPos(l: Column, i: Column): Column = { // 0-based start offset
      val q = floor(l / nSeg).cast("int")
      val t = lit(nSeg) - (l % nSeg)
      i * q + when(i < t, lit(0)).otherwise(i - t)
    }

    val longNames = names.filter(col("len") >= nSeg)
    val shortNames = names.filter(col("len") < nSeg)

    // Build side: k+1 (length, index, segment) rows per name.
    val build = longNames
      .select(col("name").as("name_b"), col("len").as("lb"),
        explode(sequence(lit(0), lit(k))).as("i"))
      .withColumn("seg", col("name_b").substr(
        segPos(col("lb"), col("i")) + 1, segLen(col("lb"), col("i"))))

    // Probe side: the aligned substrings an edit-free segment could map
    // to. The j-window is always non-empty: pos+len(seg) ≤ L and
    // L ≤ len+k give hi ≥ lo, so no sequence() ever runs descending.
    val probeKeys = flatten(transform(
      sequence(greatest(col("len") - k, lit(nSeg)), col("len") + k),
      lb => flatten(transform(sequence(lit(0), lit(k)), i => {
        val sl = segLen(lb, i)
        val sp = segPos(lb, i)
        transform(
          sequence(greatest(sp - k, lit(0)), least(sp + k, col("len") - sl)),
          j => struct(lb.as("lb"), i.as("i"),
            col("name").substr(j + 1, sl).as("seg")))
      }))))
    val probe = names.filter(col("len") >= 1)
      .select(col("name").as("name_a"), explode(probeKeys).as("key"))
      .select(col("name_a"), col("key.lb"), col("key.i"), col("key.seg"))

    // A qualifying pair is found in at least one direction (the one that
    // segments a name of length ≥ k+1), so normalize the pair key before
    // distinct — no reliance on both directions matching.
    val segPairs = probe.join(build, Seq("lb", "i", "seg"))
      .filter(col("name_a") =!= col("name_b"))
      .select(least(col("name_a"), col("name_b")).as("name_a"),
        greatest(col("name_a"), col("name_b")).as("name_b"))
      .distinct()

    // Short stratum (len ≤ k): every pair qualifies by construction;
    // enumerate via the length-key join (bucket sizes alphabet-bounded).
    val shortPairs = shortNames
      .select(col("name").as("name_a"),
        explode(sequence(greatest(col("len") - k, lit(0)), col("len") + k))
          .as("len"))
      .join(shortNames.select(col("name").as("name_b"), col("len")), "len")
      .filter(col("name_a") < col("name_b"))
      .select("name_a", "name_b")

    segPairs.unionByName(shortPairs)
      .withColumn("edit_distance",
        levenshtein(col("name_a"), col("name_b"), maxDist))
      .filter(col("edit_distance") >= 0)
      .select("name_a", "name_b", "edit_distance")
  }

  /** max_by / min_by (argmax aggregates): each customer's highest- and
    * lowest-priced order id in ONE hash aggregate — no window, no sort,
    * no self-join back onto the fact. The ordering key is a zero-padded
    * `price|orderkey` string: fixed-width decimal so lexicographic ==
    * numeric, orderkey suffix so ties resolve identically in ANY engine
    * (SQL mirrors it with arg_max/arg_min over the same string). */
  def argExtremes(orders: DataFrame): DataFrame = {
    val ord = format_string("%018.2f|%012d", col("o_totalprice"), col("o_orderkey"))
    orders.groupBy("o_custkey").agg(
      max_by(col("o_orderkey"), ord).as("top_order"),
      min_by(col("o_orderkey"), ord).as("bottom_order"),
      max("o_totalprice").as("top_price"),
      count(lit(1)).as("n_orders"))
  }
}
