package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Declarative data-quality checks.
  *
  * The reference runs one Spark job per column per check (reference
  * src/utils/data_quality.py:52-77 — `_null_count` collects per column,
  * `check_positive` filters+counts per column). graft folds EVERY counter
  * into a single `agg` over one scan: at 100 TB the audit costs one pass,
  * not 3×|columns| passes.
  *
  * NaN counts as null for floating-point columns (matching the
  * reference's `isnan` handling); negativity applies to numeric columns.
  */
object DataQuality {

  final case class QualityResult(name: String, passed: Boolean, details: String)

  /** Long-format audit: one row per column with null/negative/total
    * counters, computed in one distributed pass. */
  def summary(df: DataFrame, cols: Seq[String]): DataFrame = {
    def isFloating(dt: DataType) = dt == DoubleType || dt == FloatType
    def isNumeric(dt: DataType)  = dt.isInstanceOf[NumericType]

    val aggs: Seq[Column] = cols.flatMap { c =>
      val dt = df.schema(c).dataType
      val nullPred = if (isFloating(dt)) col(c).isNull || isnan(col(c)) else col(c).isNull
      val negCount =
        if (isNumeric(dt)) sum(when(col(c) < 0, 1L).otherwise(0L))
        else sum(lit(0L))
      Seq(
        sum(when(nullPred, 1L).otherwise(0L)).as(s"${c}__null"),
        negCount.as(s"${c}__neg"))
    } :+ count(lit(1)).as("__total")

    val wide = df.agg(aggs.head, aggs.tail: _*)

    // unpivot the single wide row into (col_name, null_count, negative_count, total_count)
    val stackArgs = cols
      .map(c => s"'$c', `${c}__null`, `${c}__neg`")
      .mkString(", ")
    wide.select(expr(
      s"stack(${cols.size}, $stackArgs) AS (col_name, null_count, negative_count)"),
      col("__total").as("total_count"))
  }

  /** Threshold evaluation on a computed [[summary]] — the driver-facing
    * pass/fail gate (reference run_silver_checks). Only the tiny summary
    * is collected. */
  /** One-pass sketch profile of a document corpus: exact counts where
    * cheap, sketches where exact would shuffle the world —
    * `approx_count_distinct` is HyperLogLog++ (constant memory, ~2% err;
    * an exact distinct over 100 TB of text is a full-corpus shuffle),
    * `approx_percentile` is a mergeable quantile sketch. Everything
    * computes in ONE aggregate over one scan, the same single-pass
    * discipline as [[summary]]. */
  /** Exact-counter corpus profile — the oracle-checkable face of
    * [[corpusProfile]]: the same one-aggregate/one-scan discipline over
    * only columns a replay engine can recompute bit-for-bit (counts,
    * exact distincts over LOW-cardinality columns, min/max/avg lengths,
    * whitespace-token total). The sketch columns (HLL distincts,
    * approx-percentiles) live in [[corpusProfile]], whose estimates are
    * spec-asserted against these exact counterparts. `n_langs`/
    * `n_sources` are exact distincts — sound here because both columns
    * are enum-like (the 100 TB-scale rule: exact distinct on bounded
    * cardinality, HLL on unbounded like `text`). */
  def corpusProfileExact(docs: DataFrame): DataFrame =
    docs.agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col("lang")).as("n_langs"),
      countDistinct(col("source")).as("n_sources"),
      round(avg(length(col("text"))), 6).as("avg_chars"),
      min(length(col("text"))).as("min_chars"),
      max(length(col("text"))).as("max_chars"),
      sum(size(split(col("text"), " ")).cast("long")).as("total_ws_tokens"))

  def corpusProfile(docs: DataFrame): DataFrame =
    docs.agg(
      count(lit(1)).as("n_docs"),
      approx_count_distinct(col("text"), rsd = 0.02).as("approx_distinct_texts"),
      approx_count_distinct(col("source")).as("approx_distinct_sources"),
      countDistinct(col("lang")).as("n_langs"),
      avg(length(col("text"))).as("avg_chars"),
      expr("element_at(approx_percentile(length(text), array(0.5, 0.95)), 1)")
        .as("chars_p50"),
      expr("element_at(approx_percentile(length(text), array(0.5, 0.95)), 2)")
        .as("chars_p95"),
      sum(size(split(col("text"), " "))).as("total_ws_tokens"))

  /** Incremental distinct counting with MERGEABLE sketches — the 100 TB
    * pattern: each daily batch persists a KB-sized HLL sketch of its key,
    * and any corpus-wide or windowed distinct count is a UNION of stored
    * sketches, never a re-scan of the data. Here both halves run in one
    * lineage (per-day `hll_sketch_agg` → `hll_union_agg`), but the daily
    * sketch frame is exactly what an incremental pipeline would persist
    * next to each partition.
    *
    * Returns one row: days covered, the union-merged distinct estimate,
    * and the sum of per-day estimates (whose gap to the merged value is
    * the cross-day repeat mass — a retention signal for free). */
  def sketchUnionDistinct(events: DataFrame, keyCol: String = "user_id"): DataFrame = {
    val daily = events
      .filter(col(keyCol).isNotNull)
      .groupBy(col("event_date"))
      .agg(
        hll_sketch_agg(col(keyCol)).as("sketch"),
        count(lit(1)).as("day_rows"))
    daily.agg(
      count(lit(1)).as("n_days"),
      hll_sketch_estimate(hll_union_agg(col("sketch"))).as("merged_distinct"),
      sum(hll_sketch_estimate(col("sketch"))).as("sum_daily_distinct"),
      sum(col("day_rows")).as("total_rows"))
  }

  /** Exact twin of [[sketchUnionDistinct]]'s ledger — the
    * oracle-checkable face: the same daily-partial shape (per-day
    * distinct + row counts roll up in one pass) plus the exact merged
    * distinct, which NEEDS a second scan over the raw keys — precisely
    * the full-corpus re-scan the HLL union avoids at 100 TB (that cost
    * asymmetry is the point of the sketch variant; this twin exists to
    * oracle the exact columns and to let the spec bound the sketch's
    * estimation error against truth). Both aggregates are single-row;
    * the cross join is scalar-broadcast, not data-sized. */
  def distinctLedger(events: DataFrame, keyCol: String = "user_id"): DataFrame = {
    val keyed = events.filter(col(keyCol).isNotNull)
    val daily = keyed
      .groupBy(col("event_date"))
      .agg(
        countDistinct(col(keyCol)).as("day_distinct"),
        count(lit(1)).as("day_rows"))
    val totals = daily.agg(
      count(lit(1)).as("n_days"),
      sum(col("day_distinct")).as("sum_daily_distinct"),
      sum(col("day_rows")).as("total_rows"))
    totals.crossJoin(
      keyed.agg(countDistinct(col(keyCol)).as("merged_distinct")))
  }

  /** k-anonymity audit: one row per quasi-identifier equivalence class
    * with its row count, distinct-individual count, and an `at_risk` flag
    * (fewer than `k` distinct individuals share the QI combination — the
    * re-identification risk a privacy review screens a training corpus
    * for BEFORE release, complementing content-level scrubbing like
    * [[graft.text.TextFunctions.redactPii]]).
    *
    * One hash-groupBy over the QI grid; the distinct-count is a two-phase
    * partial aggregate over (QI, id) so nothing driver-side grows with the
    * data. At 100 TB the output is |QI-combination space| rows — audit
    * tables, not data tables. */
  def kAnonymity(df: DataFrame, qiCols: Seq[String], idCol: String, k: Int = 5): DataFrame =
    df.groupBy(qiCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col(idCol)).as("n_ids"))
      .withColumn("at_risk", col("n_ids") < k)

  /** Join-key skew diagnostic — the pre-flight a 100 TB join or groupBy
    * runs BEFORE shuffling on a key: the `topN` hottest key values with
    * their row share, skew multiple vs the mean key (`skew_x`, the
    * straggler factor an unsalted shuffle pays on that key's partition)
    * and the integer `salt_factor` (⌈cnt / avg⌉, exact long arithmetic)
    * that [[graft.analytics.SkewJoin]]-style salting would need to level
    * it. One hash-groupBy on the key (map-side combined), a scalar
    * second aggregate broadcast back, and a TakeOrdered top-N — no
    * single-partition sort, nothing driver-side grows with the data.
    * Ties break on the key value so the top-N cut is deterministic. */
  def keySkewReport(df: DataFrame, keyCol: String, topN: Int = 10): DataFrame = {
    val perKey = df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
    val totals = perKey.agg(
      count(lit(1)).as("n_keys"), sum(col("cnt")).as("n_rows"))
    perKey.crossJoin(broadcast(totals))
      .select(
        col(keyCol), col("cnt"), col("n_keys"), col("n_rows"),
        (col("cnt").cast("double") / col("n_rows")).as("row_share"),
        (col("cnt").cast("double") * col("n_keys") / col("n_rows")).as("skew_x"),
        expr("(cnt * n_keys + n_rows - 1) div n_rows").as("salt_factor"))
      .orderBy(col("cnt").desc, col(keyCol).asc)
      .limit(topN)
  }

  /** l-diversity audit — [[kAnonymity]]'s companion (Machanavajjhala et
    * al., ICDE 2006): a QI class can be k-anonymous yet still leak if all
    * its members share one SENSITIVE value (the homogeneity attack). One
    * row per QI equivalence class with its row count, distinct sensitive
    * values, the modal sensitive value's share (the attacker's best-guess
    * confidence), and an `at_risk` flag (fewer than `l` distinct values).
    *
    * Two map-side-combinable aggregates — (QI, sensitive) counts, then a
    * QI roll-up — so the sensitive-value distribution never materializes
    * per row; output is audit-table-sized at any corpus scale. The modal
    * share is an exact integer ratio rounded at 6 dp. */
  def lDiversity(df: DataFrame, qiCols: Seq[String], sensCol: String,
      l: Int = 2): DataFrame =
    df.groupBy((qiCols.map(col) :+ col(sensCol)): _*)
      .agg(count(lit(1)).as("n_sv"))
      .groupBy(qiCols.map(col): _*)
      .agg(
        sum(col("n_sv")).as("n_rows"),
        count(lit(1)).as("n_sens"),
        round(max(col("n_sv")).cast("double") / sum(col("n_sv")), 6)
          .as("max_share"))
      .withColumn("at_risk", col("n_sens") < l)

  /** Differentially-private count release — the Laplace mechanism
    * (Dwork et al., TCC 2006) over a group-by: each group's count gets
    * Laplace(sensitivity/ε) noise via inverse-CDF transform
    * sampling, completing the privacy-audit trio ([[kAnonymity]],
    * [[lDiversity]]) with the release mechanism itself.
    *
    * DETERMINISM CAVEAT, stated loudly: the uniform draw here is the
    * repo's md5 hash family seeded by the group key — which makes the
    * release reproducible (and hence ORACLE-checkable), and makes it NOT
    * actually differentially private (a fixed per-key seed lets an
    * attacker subtract the noise). This operator is the mechanism's
    * dataflow shape — noise generation at the aggregate boundary, never
    * row level — with the scaladoc contract that production swaps
    * `hashFraction` for a real CSPRNG draw per release. The inverse-CDF
    * argument is floored at 1e-12 so the u = −0.5 hash corner can't
    * produce ln(0) (sign(0) at the u = 0 corner already yields noise 0).
    *
    * One map-side-combinable aggregate; noise math is per-group scalar
    * arithmetic rounded at 6 dp. */
  def dpNoisedCounts(df: DataFrame, groupCol: String, epsilon: Double = 1.0,
      sensitivity: Double = 1.0, salt: String = "dp"): DataFrame = {
    val u = graft.sampling.Sampling.hashFraction(col(groupCol), salt) - 0.5
    val b = sensitivity / epsilon
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("true_count"))
      .withColumn("noise",
        round(lit(-b) * signum(u)
          * log(greatest(lit(1.0) - lit(2.0) * abs(u), lit(1e-12))), 6))
      .withColumn("released",
        round(col("true_count") + col("noise"), 6))
  }

  /** Data-freshness / staleness SLA audit: one row per partition group
    * (source, feed, event type, …) with its row count, latest event time,
    * hours of lag behind the freshest group, and an SLA-breach flag — the
    * check a pipeline health dashboard runs before trusting "today's"
    * data (complements [[graft.monitoring.Monitoring.volume]], which
    * watches row RATE rather than recency).
    *
    * Scale: one hash-groupBy over the group key; the corpus-wide max is
    * then a window over the already-aggregated |groups| rows (single tiny
    * partition by construction), so the raw data is scanned exactly once.
    * lag_hours rounds to 6 dp (double epoch arithmetic).
    *
    * `asOf` picks the reference clock. The default (None) lags against
    * the freshest GROUP — deterministic for a fixed corpus, which is what
    * the oracle check needs, but blind to ALL feeds being stale at once.
    * A wall-clock audit (the reference's silver_dag.py
    * check_data_freshness compares against today) passes
    * `asOf = Some("2026-08-13 00:00:00")`-style timestamps and alerts
    * even when every feed stopped days ago. */
  def freshness(df: DataFrame, tsCol: String, groupCol: String,
      staleHours: Double = 24.0, asOf: Option[String] = None): DataFrame = {
    val per = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"), max(col(tsCol)).as("last_ts"))
    val all = org.apache.spark.sql.expressions.Window
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    per
      .withColumn("corpus_last_ts", asOf match {
        case Some(ts) => lit(ts).cast("timestamp")
        case None     => max(col("last_ts")).over(all)
      })
      .withColumn("lag_hours", round(
        (col("corpus_last_ts").cast("double") - col("last_ts").cast("double")) / 3600.0, 6))
      .withColumn("stale_alert", col("lag_hours") > staleHours)
  }

  /** Declarative row-level expectations (Great-Expectations flavor; the
    * reference's ad-hoc `check_non_null`/`check_positive` generalized to
    * a typed rule set). */
  sealed trait Expectation { def column: String; def kind: String }
  final case class ExpectNotNull(column: String) extends Expectation { val kind = "not_null" }
  final case class ExpectUnique(column: String) extends Expectation { val kind = "unique" }
  final case class ExpectBetween(column: String, lo: Double, hi: Double)
    extends Expectation { val kind = "between" }
  final case class ExpectInSet(column: String, values: Seq[String])
    extends Expectation { val kind = "in_set" }
  final case class ExpectRegex(column: String, pattern: String)
    extends Expectation { val kind = "regex" }

  /** Expectation-suite audit: every rule's violation count in ONE
    * distributed pass — one row per rule with (kind, col_name,
    * violations, total_rows, passed).
    *
    * Range/set/regex rules skip nulls (that's [[ExpectNotNull]]'s job —
    * composing rules must not double-count a failure mode); uniqueness
    * counts surplus non-null occurrences (count − count distinct).
    *
    * Scale: the row-level rules are plain conditional sums — partial
    * aggregation map-side, one exchange carrying one row per partition.
    * A [[ExpectUnique]] rule adds the standard two-phase distinct
    * (Expand): still one scan, but the exchange then carries the
    * distinct keys of that column — leave uniqueness rules off append-
    * only audits where the key is the partition key and let the
    * dedup operators own that check instead. */
  def expectations(df: DataFrame, exps: Seq[Expectation]): DataFrame = {
    require(exps.nonEmpty, "expectation suite is empty")
    val aggs: Seq[Column] = exps.zipWithIndex.map { case (e, i) =>
      val v = e match {
        case ExpectNotNull(c) => sum(when(col(c).isNull, 1L).otherwise(0L))
        case ExpectUnique(c)  => count(col(c)) - countDistinct(col(c))
        case ExpectBetween(c, lo, hi) =>
          sum(when(col(c).isNotNull && (col(c) < lo || col(c) > hi), 1L).otherwise(0L))
        case ExpectInSet(c, vs) =>
          sum(when(col(c).isNotNull && !col(c).isin(vs: _*), 1L).otherwise(0L))
        case ExpectRegex(c, p) =>
          sum(when(col(c).isNotNull && !col(c).rlike(p), 1L).otherwise(0L))
      }
      coalesce(v, lit(0L)).as(s"__v$i")
    } :+ count(lit(1)).as("__total")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = exps.zipWithIndex
      .map { case (e, i) => s"'${e.kind}', '${e.column}', `__v$i`" }
      .mkString(", ")
    wide.select(
        expr(s"stack(${exps.size}, $stackArgs) AS (expectation, col_name, violations)"),
        col("__total").as("total_rows"))
      .withColumn("passed", col("violations") === 0L)
  }

  def evaluate(summaryDf: DataFrame, maxNullRate: Double = 0.001): Seq[QualityResult] = {
    val rows = summaryDf.collect()
    rows.toSeq.map { r =>
      val name  = r.getAs[String]("col_name")
      val nulls = r.getAs[Long]("null_count")
      val negs  = r.getAs[Long]("negative_count")
      val total = r.getAs[Long]("total_count")
      val nullRate = if (total == 0) 1.0 else nulls.toDouble / total
      val passed = nullRate <= maxNullRate && negs == 0
      QualityResult(name, passed,
        f"null_rate=$nullRate%.5f negatives=$negs total=$total")
    }
  }
}
