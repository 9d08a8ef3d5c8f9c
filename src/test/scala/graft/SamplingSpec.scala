package graft

import org.apache.spark.sql.functions._

import graft.sampling.Sampling

class SamplingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private lazy val docs = Tables.documents(spark, dir).cache()

  test("hash sample is deterministic and repartition-stable") {
    val a = Sampling.hashSample(docs, "doc_id", 0.3).select("doc_id")
    val b = Sampling.hashSample(docs.repartition(7), "doc_id", 0.3).select("doc_id")
    assert(a.exceptAll(b).count() === 0)
    assert(b.exceptAll(a).count() === 0)
    // rate lands in a sane window at n=500 (binomial ±5 sd)
    val n = a.count().toDouble
    assert(n > 500 * 0.3 - 5 * math.sqrt(500 * 0.3 * 0.7))
    assert(n < 500 * 0.3 + 5 * math.sqrt(500 * 0.3 * 0.7))
  }

  test("different salts draw (near-)independent samples") {
    val a = Sampling.hashSample(docs, "doc_id", 0.5, salt = "s1").select("doc_id")
    val b = Sampling.hashSample(docs, "doc_id", 0.5, salt = "s2").select("doc_id")
    val overlap = a.join(b, "doc_id").count().toDouble
    // independence → overlap ≈ 0.25 * 500 = 125; allow a wide window
    assert(overlap > 60 && overlap < 190, s"overlap $overlap looks non-independent")
  }

  test("stratified rates apply per stratum") {
    val s = Sampling.stratifiedHashSample(docs, "doc_id", "lang",
      Map("en" -> 1.0, "de" -> 0.0), defaultRate = 0.0)
    val langs = s.select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(langs === Set("en"))
    assert(s.count() === docs.filter(col("lang") === "en").count())
  }

  test("hash splits partition the corpus: disjoint and exhaustive") {
    val lo = Sampling.hashSplit(docs, "doc_id", 0.0, 0.8).select("doc_id")
    val hi = Sampling.hashSplit(docs, "doc_id", 0.8, 1.0).select("doc_id")
    assert(lo.join(hi, "doc_id").count() === 0)
    assert(lo.count() + hi.count() === docs.count())
  }
}
