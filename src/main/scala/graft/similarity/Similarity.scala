package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY.md §2.8).
  *
  * Two paths:
  *   - [[bruteForceTopK]] — exact cosine top-k via a broadcast cross join
  *     + rank window. Quadratic in corpus size: the CORRECTNESS BASELINE,
  *     never the scale path. The queries (small) broadcast; the corpus
  *     only streams.
  *   - [[lshTopK]] — random-hyperplane LSH: each vector hashes to a
  *     bucket by the sign pattern of its dot products with `nPlanes`
  *     fixed pseudo-random hyperplanes; search touches only the query's
  *     bucket. Cost drops from |Q|×|C| to |Q|×|bucket| (expected
  *     |C|/2^nPlanes). Buckets are the only shuffle key.
  *
  * Determinism: hyperplane coefficients come from an integer LCG
  * (coef = ((1103515245·(p·dim+d) + 12345) mod 2048) − 1024) — exact
  * integer arithmetic reproducible in any engine, no RNG state. Cosines
  * are index-ordered folds, bit-identical across engines.
  */
object Similarity {

  /** Index-ordered cosine — graft's native codegen'd one-pass expression
    * (same accumulation order as an explicit fold, so the ANSI oracle
    * reproduces it bit-identically). */
  private def cosine(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.cosineSim(a, b)

  /** Exact top-k neighbors per query vector (correctness baseline). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("q_emb"), col("c_emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Sign-pattern LSH bucket id from `nPlanes` LCG hyperplanes starting at
    * global plane index `planeOffset` (distinct offsets give independent
    * hash tables — the LCG coefficient stream is indexed by the GLOBAL
    * plane number, so table t's planes are disjoint from table t−1's).
    *
    * Delegates to the native codegen'd expression
    * ([[graft.functions.HyperplaneBuckets]]): ONE fused loop computes all
    * plane dots, vs one interpreted HOF fold per plane — the cost gap
    * grows with the auto-scaled plane count. The session must have graft
    * functions registered ([[graft.functions.GraftFunctions.register]];
    * [[lshTopK]] does it for callers). `dim` must equal the array length
    * (the expression reads the actual length; the LCG stream is indexed
    * by it). */
  def bucketCol(emb: Column, dim: Int, nPlanes: Int, planeOffset: Int = 0): Column =
    graft.functions.GraftFunctions.hyperplaneBucket(emb, nPlanes, planeOffset)

  /** Planes needed so the EXPECTED bucket occupancy stays ~`targetBucket`
    * as the corpus grows: ⌈log₂(N / targetBucket)⌉, floored at 4. A
    * constant plane count is a scale cliff — per-query candidate cost is
    * |C|/2^planes, linear in corpus size unless the bucket space grows
    * with it (same lesson as the simhash 8-bit→15-bit band fix). */
  def autoPlanes(corpusSize: Long, targetBucket: Int = 64): Int =
    math.max(4, math.ceil(math.log(math.max(corpusSize, 1L).toDouble / targetBucket) / math.log(2)).toInt)

  /** Bucketed ANN: top-k per query among candidates that share a bucket
    * with the query in ANY of `tables` independent hash tables.
    *
    *   - plane count auto-scales with corpus size ([[autoPlanes]]) unless
    *     pinned via `nPlanes` — per-query cost stays ~`targetBucket` ×
    *     `tables` candidates at any corpus size;
    *   - recall widens with `tables` (a true neighbor is missed only if
    *     it hashes away from the query in EVERY table); candidates are
    *     deduped before scoring so a pair found by both tables is scored
    *     once.
    *
    * `nPlanes = 0` (auto) triggers one `corpus.count()` — a metadata-only
    * job on a parquet scan; pass an explicit value to avoid it. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      dim: Int = 64, nPlanes: Int = 0, tables: Int = 2, targetBucket: Int = 64): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val np = if (nPlanes > 0) nPlanes else autoPlanes(corpus.count(), targetBucket)
    val candidates = (0 until tables).map { t =>
      val bucket = bucketCol(col("embedding"), dim, np, planeOffset = t * np)
      val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        bucket.as("bucket"))
      val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"),
        bucket.as("bucket"))
      c.join(broadcast(q), Seq("bucket")).drop("bucket")
    }.reduce(_ unionByName _)
      .filter(col("query_id") =!= col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    candidates
      .withColumn("cosine", cosine(col("q_emb"), col("c_emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }
}
