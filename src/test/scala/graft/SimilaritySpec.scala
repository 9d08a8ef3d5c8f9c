package graft

import org.apache.spark.sql.functions._

import graft.similarity.Similarity

class SimilaritySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private lazy val emb = Tables.embeddings(spark, dir).cache()
  private lazy val queries = emb.filter(col("vec_id") < 10)

  test("brute force: exactly k neighbors per query, ranked by cosine") {
    val top = Similarity.bruteForceTopK(emb, queries, k = 5).cache()
    assert(top.groupBy("query_id").count().filter(col("count") =!= 5).count() === 0)
    // rank 1 cosine >= rank 5 cosine within each query
    val byQuery = top.groupBy("query_id")
      .agg(max(when(col("rank") === 1, col("cosine"))).as("c1"),
        max(when(col("rank") === 5, col("cosine"))).as("c5"))
    assert(byQuery.filter(col("c1") < col("c5")).count() === 0)
    assert(top.filter(col("query_id") === col("neighbor_id")).count() === 0)
  }

  test("lsh buckets are balanced enough and ann results come from one bucket") {
    val buckets = emb.select(
      Similarity.bucketCol(col("embedding"), 64, 4).as("bucket"))
    val n = buckets.select("bucket").distinct().count()
    assert(n > 4, s"expected spread over >4 of 16 buckets, got $n")
    val ann = Similarity.lshTopK(emb, queries, k = 5).cache()
    assert(ann.count() > 0)
    // each (query, neighbor) pair shares the query's bucket by construction
    assert(ann.select("query_id", "bucket").distinct().groupBy("query_id")
      .count().filter(col("count") > 1).count() === 0)
  }

  test("lsh ann recalls the bucket-local subset of brute-force ranking") {
    val bf = Similarity.bruteForceTopK(emb, queries, k = 1)
      .select(col("query_id"), col("neighbor_id").as("bf_top1"))
    val ann = Similarity.lshTopK(emb, queries, k = 1)
      .select(col("query_id"), col("neighbor_id").as("ann_top1"))
    // when the true top-1 lands in the query's bucket, ANN must return it;
    // sanity: ANN top-1 cosine never exceeds brute-force top-1 cosine
    val j = Similarity.bruteForceTopK(emb, queries, k = 1)
      .select(col("query_id"), col("cosine").as("bf_cos"))
      .join(Similarity.lshTopK(emb, queries, k = 1)
        .select(col("query_id"), col("cosine").as("ann_cos")), "query_id")
    assert(j.filter(col("ann_cos") > col("bf_cos") + 1e-12).count() === 0)
  }
}
