package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, the single latest
  * right row with `right.ts <= left.ts` on the same key — the join shape
  * behind "state of X when the event happened" queries (price at trade
  * time, last score before the impression, latest config at request
  * time).
  *
  * Spark has no native as-of join, and the naive range-condition join
  * (`l.key = r.key AND r.ts <= l.ts` + a max-window) plans the
  * inequality as a per-key row multiplication — every left row pairs
  * with ALL its prior right rows before the window prunes: quadratic in
  * rows-per-key. This operator uses the union-window formulation
  * instead:
  *
  *   1. union both sides, right rows carrying their payload, left rows
  *      carrying nulls;
  *   2. one window per key ordered by (ts, side) — right sorts BEFORE
  *      left at equal ts, making the join tie-inclusive (a right row at
  *      exactly left.ts is visible, matching ANSI/DuckDB `ASOF JOIN`'s
  *      `>=`);
  *   3. `last(payload, ignoreNulls)` over the unbounded-preceding frame
  *      gives every left row the latest prior payload; filter back to
  *      left rows.
  *
  * Cost: ONE shuffle on the key + one sort — linear in |L|+|R| at any
  * scale, no row multiplication, no nested-loop. Right side must be
  * unique per (key, ts); pre-aggregate it if it isn't (the caller knows
  * which reduction is right — max/last/sum).
  */
object AsOfJoin {

  /** `toleranceSeconds`: when set, a matched right row further away than
    * the tolerance does NOT match (its payload reads null) — the "price is
    * stale after N minutes" contract of ASOF TOLERANCE in kdb/Pandas
    * merge_asof. Implemented by carrying the matched right timestamp
    * through the same window and nulling payloads past the bound — same
    * one-shuffle cost.
    *
    * `direction`: `"backward"` (default) matches the latest right row at
    * or before left.ts; `"forward"` the earliest right row at or after it
    * (merge_asof's direction — "next scheduled maintenance after the
    * alert", "first fill after the order"). Forward mirrors the window:
    * right rows sort AFTER left at equal ts (tie-inclusive for `<=`), the
    * frame runs current-row → unbounded FOLLOWING, and `first` replaces
    * `last`. Identical one-shuffle cost. `"nearest"` (see [[asOfNearest]])
    * picks whichever side is closer, ties backward — pandas semantics. */
  def asOf(left: DataFrame, right: DataFrame, key: String, ts: String,
      payloadCols: Seq[String], outSuffix: String = "_asof",
      toleranceSeconds: Option[Long] = None,
      direction: String = "backward"): DataFrame = {
    if (direction == "nearest")
      return asOfNearest(left, right, key, ts, payloadCols, outSuffix, toleranceSeconds)
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward|nearest, got $direction")
    val fwd = direction == "forward"
    val tagged = "__graft_is_left"
    val rts = "__graft_r_ts"
    val renamed = payloadCols.map(c => c -> s"__graft_r_$c")
    val r = right.select(
      (Seq(col(key), col(ts)) ++ renamed.map { case (c, rc) => col(c).as(rc) }): _*)
      .withColumn(tagged, lit(if (fwd) 2 else 0))
      .withColumn(rts, col(ts))
    val l = left.withColumn(tagged, lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val base = Window.partitionBy(key).orderBy(col(ts), col(tagged))
    val w =
      if (fwd) base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      else base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Pick ONE atomic right ROW (a struct of rts + payloads), not each
    // payload column independently: per-column last(ignoreNulls) would
    // skip a null payload field and read it from an OLDER row than the
    // one the tolerance gap is measured against — and different payload
    // columns could come from different rows. The struct is non-null iff
    // the unioned row is a right row, so last/first(ignoreNulls) selects
    // exactly the latest-prior / earliest-following right row, null
    // payload fields and all — DuckDB ASOF JOIN / merge_asof semantics.
    val rowStruct = when(col(rts).isNotNull,
      struct((col(rts).as("__rts") +: renamed.map { case (_, rc) => col(rc).as(rc) }): _*))
    val picked =
      if (fwd) first(rowStruct, ignoreNulls = true).over(w)
      else last(rowStruct, ignoreNulls = true).over(w)
    val filled0 = renamed.foldLeft(unioned) { case (df, (_, rc)) =>
      df.withColumn(rc, picked.getField(rc))
    }
    val filled = toleranceSeconds match {
      case None => filled0
      case Some(tol) =>
        val gap =
          if (fwd) picked.getField("__rts").cast("long") - col(ts).cast("long")
          else col(ts).cast("long") - picked.getField("__rts").cast("long")
        renamed.foldLeft(filled0) { case (df, (_, rc)) =>
          df.withColumn(rc, when(gap <= tol, col(rc)))
        }
    }
    val out = filled.filter(col(tagged) === 1).drop(tagged, rts)
    renamed.foldLeft(out) { case (df, (c, rc)) =>
      df.withColumnRenamed(rc, s"$c$outSuffix")
    }
  }

  /** merge_asof `direction='nearest'`: whichever of the latest-prior /
    * earliest-following right rows is closer in time wins; equal gaps
    * resolve backward (pandas tie rule). One union, one shuffle, ONE sort:
    * right rows tag 0 (before left at equal ts), and both window frames —
    * unbounded-preceding for the backward candidate, current-row→following
    * for the forward one — share the same (ts, tag) sort order. A right
    * row at exactly left.ts lands in the backward frame, which the tie
    * rule prefers anyway. `toleranceSeconds` bounds the winning gap. */
  def asOfNearest(left: DataFrame, right: DataFrame, key: String, ts: String,
      payloadCols: Seq[String], outSuffix: String = "_asof",
      toleranceSeconds: Option[Long] = None): DataFrame = {
    val tagged = "__graft_is_left"
    val rts = "__graft_r_ts"
    val renamed = payloadCols.map(c => c -> s"__graft_r_$c")
    val r = right.select(
      (Seq(col(key), col(ts)) ++ renamed.map { case (c, rc) => col(c).as(rc) }): _*)
      .withColumn(tagged, lit(0))
      .withColumn(rts, col(ts))
    val l = left.withColumn(tagged, lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val base = Window.partitionBy(key).orderBy(col(ts), col(tagged))
    val wb = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    // one atomic right-row struct per direction (see asOf: per-column
    // ignoreNulls would mix payloads from different rows)
    val rowStruct = when(col(rts).isNotNull,
      struct((col(rts).as("__rts") +: renamed.map { case (_, rc) => col(rc).as(rc) }): _*))
    val back = last(rowStruct, ignoreNulls = true).over(wb)
    val fwd = first(rowStruct, ignoreNulls = true).over(wf)
    val gapB = col(ts).cast("long") - back.getField("__rts").cast("long")
    val gapF = fwd.getField("__rts").cast("long") - col(ts).cast("long")
    // backward wins when it exists and is at least as close (ties backward)
    val backWins = gapB.isNotNull && (gapF.isNull || gapB <= gapF)
    val withinTol: Column => Column = toleranceSeconds match {
      case None => _ => lit(true)
      case Some(tol) => g => g <= tol
    }
    val filled = renamed.foldLeft(unioned) { case (df, (_, rc)) =>
      df.withColumn(rc,
        when(backWins && withinTol(gapB), back.getField(rc))
          .when(!backWins && withinTol(gapF), fwd.getField(rc)))
    }
    val out = filled.filter(col(tagged) === 1).drop(tagged, rts)
    renamed.foldLeft(out) { case (df, (c, rc)) =>
      df.withColumnRenamed(rc, s"$c$outSuffix")
    }
  }
}
