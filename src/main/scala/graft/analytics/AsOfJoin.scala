package graft.analytics

import org.apache.spark.sql.DataFrame
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

  /** `toleranceSeconds`: when set, a prior right row older than the
    * tolerance does NOT match (its payload reads null) — the "price is
    * stale after N minutes" contract of ASOF TOLERANCE in kdb/Pandas
    * merge_asof. Implemented by carrying the matched right timestamp
    * through the same window and nulling payloads past the bound — same
    * one-shuffle cost. */
  def asOf(left: DataFrame, right: DataFrame, key: String, ts: String,
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
    val w = Window.partitionBy(key).orderBy(col(ts), col(tagged))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled0 = renamed.foldLeft(unioned) { case (df, (_, rc)) =>
      df.withColumn(rc, last(col(rc), ignoreNulls = true).over(w))
    }
    val filled = toleranceSeconds match {
      case None => filled0
      case Some(tol) =>
        val fresh = col(ts).cast("long") - last(col(rts), ignoreNulls = true).over(w).cast("long") <= tol
        renamed.foldLeft(filled0) { case (df, (_, rc)) =>
          df.withColumn(rc, when(fresh, col(rc)))
        }
    }
    val out = filled.filter(col(tagged) === 1).drop(tagged, rts)
    renamed.foldLeft(out) { case (df, (c, rc)) =>
      df.withColumnRenamed(rc, s"$c$outSuffix")
    }
  }
}
