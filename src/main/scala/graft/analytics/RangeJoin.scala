package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join: left rows matched to every right interval
  * containing their value — `l.v ∈ [r.lo, r.hi)`. Spark plans the naive
  * inequality join as BroadcastNestedLoopJoin (small right) or a
  * cartesian (large right): |L|×|R| comparisons.
  *
  * The bucketed formulation makes it an EQUI-join: pick a bucket width w,
  * give every left row bucket ⌊v/w⌋, explode every right interval to the
  * buckets it touches (⌊lo/w⌋..⌊hi/w⌋ — at most width/w + 1 rows), join
  * on the bucket, then re-check the exact bounds. Cost is
  * |L| + |R|·(width/w) shuffled on a key whose cardinality grows with
  * the data — no pair explosion, AQE handles hot buckets like any other
  * skewed equi-join. Pick w near the typical interval width: larger w
  * → fewer replicas but more false candidates per bucket; smaller w →
  * the reverse.
  */
object RangeJoin {

  def bucketed(left: DataFrame, right: DataFrame, valueCol: String,
      loCol: String, hiCol: String, bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val bucket = "__graft_bucket"
    val lb = left.withColumn(bucket, floor(col(valueCol) / bucketWidth).cast("long"))
    val rb = right.withColumn(bucket,
      explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    lb.join(rb, bucket)
      .filter(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop(bucket)
  }
}
