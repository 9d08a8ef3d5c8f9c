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

  /** Sign-pattern LSH bucket id from `nPlanes` LCG hyperplanes. */
  def bucketCol(emb: Column, dim: Int, nPlanes: Int): Column = {
    def planeDot(p: Int): Column = aggregate(
      transform(sequence(lit(0), lit(dim - 1)), d =>
        element_at(emb, d + lit(1)).cast("double") *
          (((lit(1103515245L) * (lit(p.toLong * dim) + d) + lit(12345L)) % 2048L) - 1024L)
            .cast("double")),
      lit(0.0), (acc, v) => acc + v)
    (0 until nPlanes)
      .map(p => when(planeDot(p) >= 0, lit(1 << p)).otherwise(lit(0)))
      .reduce(_ + _)
  }

  /** Bucketed ANN: top-k per query among same-bucket candidates. Recall is
    * approximate by construction; widen with more tables (union over
    * several plane seeds) when needed. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      dim: Int = 64, nPlanes: Int = 4): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
      bucketCol(col("embedding"), dim, nPlanes).as("bucket"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"),
      bucketCol(col("embedding"), dim, nPlanes).as("bucket"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("q_emb"), col("c_emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "bucket", "cosine", "rank")
  }
}
