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

  test("split assignment labels every row, agrees with hashSplit, stays repartition-stable") {
    val s = Sampling.splitAssign(docs, "doc_id").cache()
    assert(s.count() === docs.count())
    // the labeled train partition IS hashSplit's [0, 0.8) partition
    val viaFilter = Sampling.hashSplit(docs, "doc_id", 0.0, 0.8).select("doc_id")
    val viaLabel = s.filter(col("split") === "train").select("doc_id")
    assert(viaFilter.exceptAll(viaLabel).count() === 0)
    assert(viaLabel.exceptAll(viaFilter).count() === 0)
    val again = Sampling.splitAssign(docs.repartition(7), "doc_id")
      .select("doc_id", "split")
    assert(s.select("doc_id", "split").exceptAll(again).count() === 0)
  }

  test("per-stratum reservoir: exact counts, nested prefixes, repartition-stable") {
    val n20 = Sampling.reservoirPerStratum(docs, "doc_id", "lang", 20).cache()
    // exact n per stratum (every lang has ≥ 20 docs at sf0.01)
    val counts = n20.groupBy("lang").count().collect()
    assert(counts.nonEmpty && counts.forall(_.getAs[Long]("count") === 20L))
    // a smaller sample is a strict prefix of a bigger one (stable order)
    val n5 = Sampling.reservoirPerStratum(docs, "doc_id", "lang", 5)
    assert(n5.select("doc_id").exceptAll(n20.select("doc_id")).count() === 0)
    // deterministic under repartitioning
    val again = Sampling.reservoirPerStratum(docs.repartition(7), "doc_id", "lang", 20)
    assert(n20.select("doc_id").exceptAll(again.select("doc_id")).count() === 0)
    // the rank filter must compile to a WindowGroupLimit (map-side top-n
    // per stratum before the exchange — the 100 TB property); plan read
    // off a FRESH frame: a cached one hides it inside InMemoryRelation
    val plan = Sampling.reservoirPerStratum(docs, "doc_id", "lang", 20)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit in:\n$plan")
  }

  test("weighted sample: exact size, deterministic, length-biased, no global sort") {
    val w = Sampling.weightedSample(docs, "doc_id", "n_chars", 200).cache()
    assert(w.count() === 200)
    assert(w.columns.toSeq === docs.columns.toSeq) // priority column dropped
    // deterministic under repartitioning
    val again = Sampling.weightedSample(docs.repartition(7), "doc_id", "n_chars", 200)
    assert(w.select("doc_id").exceptAll(again.select("doc_id")).count() === 0)
    // inclusion probability ∝ n_chars: the selected docs must be longer on
    // average than the corpus (500 docs, 200 drawn — a uniform draw lands
    // within ±3 sd of the corpus mean; weighting pushes it far above)
    val corpusAvg = docs.agg(avg("n_chars")).head().getDouble(0)
    val sampleAvg = w.agg(avg("n_chars")).head().getDouble(0)
    assert(sampleAvg > corpusAvg * 1.05,
      s"sample avg $sampleAvg not length-biased vs corpus $corpusAvg")
    // top-n must execute as TakeOrderedAndProject (per-task heap + driver
    // merge of tasks×n rows), never a global Sort
    val plan = Sampling.weightedSample(docs, "doc_id", "n_chars", 200)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject in:\n$plan")
  }

  test("shuffle shards: a true permutation, repartition-stable, salt draws a new epoch") {
    val s = Sampling.shuffleShards(docs.select("doc_id"), "doc_id").cache()
    // every doc exactly once, shards within range
    assert(s.count() === docs.count())
    assert(s.select("doc_id").distinct().count() === docs.count())
    assert(s.filter(col("shard") < 0 || col("shard") >= 64).count() === 0)
    // pos is a dense 1..n rank within each shard (a permutation, no gaps)
    val bad = s.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("pos").as("mx"), min("pos").as("mn"),
        countDistinct("pos").as("d"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1 || col("d") =!= col("n"))
    assert(bad.count() === 0)
    // the permutation is the hash order, not the input order: stable
    // under repartitioning
    val r = Sampling.shuffleShards(docs.select("doc_id").repartition(7), "doc_id")
    assert(s.exceptAll(r).count() === 0 && r.exceptAll(s).count() === 0)
    // a different salt is a different epoch permutation of the same rows
    val e2 = Sampling.shuffleShards(docs.select("doc_id"), "doc_id", salt = "epoch2")
    assert(e2.count() === docs.count())
    val moved = s.select("doc_id", "shard", "pos")
      .exceptAll(e2.select("doc_id", "shard", "pos")).count()
    assert(moved > 400, s"only $moved of 500 rows moved between epochs")
    // the shuffle is domain-separated from the split hash: a pos-prefix
    // of the epoch order must NOT be all-train (with the raw salt it
    // would be — shuffle_key order would equal split-assignment order)
    val firstHalf = s.withColumn("mid", (max("pos").over(
        org.apache.spark.sql.expressions.Window.partitionBy("shard")) / 2))
      .filter(col("pos") <= col("mid")).select("doc_id")
    val splitsInPrefix = Sampling.splitAssign(docs, "doc_id")
      .join(firstHalf, "doc_id")
      .select("split").distinct().collect().map(_.getString(0)).toSet
    assert(splitsInPrefix === Set("train", "val", "test"),
      s"epoch-order prefix only reached splits $splitsInPrefix — shuffle correlates with split hash")
  }

  test("cross-table consistency: same key+salt samples the same entities everywhere") {
    // the referential-integrity-for-free property: sampling documents and
    // embeddings by the same id space + salt keeps exactly the joined
    // pairs — no orphaned rows on either side of a sampled join
    val emb = Tables.embeddings(spark, dir)
      .withColumnRenamed("vec_id", "doc_id")
    val docsKept = Sampling.hashSample(docs, "doc_id", 0.4).select("doc_id")
    val embKept = Sampling.hashSample(emb, "doc_id", 0.4).select("doc_id")
    assert(docsKept.exceptAll(embKept).count() === 0)
    assert(embKept.exceptAll(docsKept).count() === 0)
    // and split assignment agrees row-for-row across the tables
    val dSplit = Sampling.splitAssign(docs, "doc_id").select("doc_id", "split")
    val eSplit = Sampling.splitAssign(emb, "doc_id").select("doc_id", "split")
    assert(dSplit.join(eSplit, "doc_id")
      .filter(dSplit("split") =!= eSplit("split")).count() === 0)
  }

  test("per-stratum weighted sample: exact counts, length-biased, map-side pruned") {
    val s = Sampling.weightedSamplePerStratum(docs, "doc_id", "lang", "n_chars", 20).cache()
    val counts = s.groupBy("lang").count().collect()
    assert(counts.nonEmpty && counts.forall(_.getAs[Long]("count") === 20L))
    // within every stratum the draw is length-biased vs that stratum
    val corpus = docs.groupBy("lang").agg(avg("n_chars").as("corpus_avg"))
    val sample = s.groupBy("lang").agg(avg("n_chars").as("sample_avg"))
    val joined = sample.join(corpus, "lang").collect()
    assert(joined.forall(r => r.getAs[Double]("sample_avg") > r.getAs[Double]("corpus_avg")),
      joined.mkString("; "))
    // deterministic under repartitioning
    val again = Sampling.weightedSamplePerStratum(
      docs.repartition(7), "doc_id", "lang", "n_chars", 20)
    assert(s.select("doc_id").exceptAll(again.select("doc_id")).count() === 0)
    // same map-side WindowGroupLimit execution as the reservoir
    val plan = Sampling.weightedSamplePerStratum(docs, "doc_id", "lang", "n_chars", 20)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit in:\n$plan")
  }

  test("token budget: bucketed plan ≡ naive per-stratum window, budget reached, prefix nested") {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
    val budgets = Map("en" -> 6000L)
    val got = Sampling.tokenBudgetSample(toks, "doc_id", "lang", "n_tok",
      budgets, defaultBudget = 2000L)
    // naive formulation: full per-stratum window (the oracle's plan)
    val wNaive = Window.partitionBy("lang")
      .orderBy(Sampling.hashFraction(col("doc_id"), "graft"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val naive = toks
      .withColumn("cb", coalesce(sum("n_tok").over(wNaive), lit(0L)))
      .filter(col("cb") < when(col("lang") === "en", 6000L).otherwise(2000L))
    assert(got.select("doc_id").exceptAll(naive.select("doc_id")).count() === 0)
    assert(naive.select("doc_id").exceptAll(got.select("doc_id")).count() === 0)
    // crossing-doc rule: every stratum's kept tokens reach the budget,
    // and removing the last (highest-hash) kept doc drops back under it
    val kept = got.groupBy("lang").agg(sum("n_tok").as("tot"),
      max(Sampling.hashFraction(col("doc_id"), "graft")).as("maxfrac")).collect()
    kept.foreach { r =>
      val budget = if (r.getString(0) == "en") 6000L else 2000L
      assert(r.getLong(1) >= budget, s"${r.getString(0)}: ${r.getLong(1)} < $budget")
    }
    // nested: a smaller budget selects a subset of the larger budget's docs
    val small = Sampling.tokenBudgetSample(toks, "doc_id", "lang", "n_tok",
      Map("en" -> 3000L), defaultBudget = 1000L)
    assert(small.select("doc_id").exceptAll(got.select("doc_id")).count() === 0)
    // deterministic under repartitioning
    val again = Sampling.tokenBudgetSample(
      toks.repartition(7), "doc_id", "lang", "n_tok", budgets, defaultBudget = 2000L)
    assert(got.select("doc_id").exceptAll(again.select("doc_id")).count() === 0)
    // scale shape: the per-row window partitions by (stratum, bucket) —
    // never a per-stratum global sort over the corpus
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("__tb_bkt"), s"expected bucketed window in:\n$plan")
  }
}
