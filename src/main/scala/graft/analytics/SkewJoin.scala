package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * A hash join shuffles both sides on the key; a hot key (one zone with
  * 30% of all events, one empty-string join value) lands its entire row
  * mass on ONE reducer, and the stage runs at the speed of that straggler.
  * Salting splits the hot key's rows across `nSalts` reducers: the big
  * side gets a deterministic salt derived from a high-cardinality column,
  * the small side is replicated once per salt value, and the join key
  * becomes (key, salt) — same join semantics, `nSalts`-way parallel
  * reduction of the hot key.
  *
  * When to reach for this instead of AQE: AQE's skew-join split
  * (`spark.sql.adaptive.skewJoin`) handles sort-merge joins by splitting
  * oversized partitions at runtime, but it cannot split a partition that
  * a downstream stateful operator (window, stream agg) keys on, and it
  * only reacts after a stage has materialized its shuffle files. Explicit
  * salting is declarative — the plan never builds the skewed partition in
  * the first place — at the cost of an `nSalts`× replication of the small
  * side (bounded: replicate dims, never facts).
  */
object SkewJoin {

  /** Inner equi-join of `big` and `small` on `key`, salted `nSalts` ways.
    * `saltFrom` must be a high-cardinality column of `big` (a pk) so the
    * salt spreads rows uniformly; the result equals the unsalted join
    * row-for-row. */
  def salted(big: DataFrame, small: DataFrame, key: String,
      saltFrom: Column, nSalts: Int = 8): DataFrame = {
    val l = big.withColumn("__salt", pmod(xxhash64(saltFrom), lit(nSalts.toLong)))
    val r = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(nSalts.toLong - 1))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
