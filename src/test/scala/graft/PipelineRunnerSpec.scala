package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Pipeline

class PipelineRunnerSpec extends SparkSpec {

  test("incremental runs: only listed dates land, re-runs idempotent, discovery finds the gap") {
    val sink = java.nio.file.Files.createTempDirectory("graft_incr").toString
    val d1 = Pipeline.runIncremental(spark, sfDir, sink, Seq("2024-01-01"))
    assert(d1.select("event_date").distinct().count() === 1)
    val c1 = d1.count()
    assert(c1 > 0)
    Pipeline.runIncremental(spark, sfDir, sink, Seq("2024-01-02"))
    val after2 = spark.read.parquet(sink)
    assert(after2.select("event_date").distinct().count() === 2)
    val c2 = after2.count()
    // replaying date 1 rewrites its partition, never appends
    Pipeline.runIncremental(spark, sfDir, sink, Seq("2024-01-01"))
    assert(spark.read.parquet(sink).count() === c2, "replay must be idempotent")
    // discovery: both processed dates excluded, the rest of the month remains
    val nd = Pipeline.newDates(spark, sfDir, sink)
    assert(!nd.contains("2024-01-01") && !nd.contains("2024-01-02"))
    assert(nd.nonEmpty)
  }

  test("newDates: absent sink means all-new; corrupt sink PROPAGATES, no silent reprocess") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sink")
    val absent = tmp.resolve("never_written").toString
    val all = Pipeline.newDates(spark, sfDir, absent)
    assert(all.nonEmpty, "first run must see every source date as new")
    // corrupt sink: a .parquet file whose footer cannot be read must NOT
    // be mistaken for "sink absent" — full reprocessing is idempotent but
    // expensive, and the sink needs fixing
    val corrupt = tmp.resolve("corrupt")
    java.nio.file.Files.createDirectories(corrupt)
    java.nio.file.Files.write(corrupt.resolve("part-00000.parquet"),
      "not a parquet file".getBytes("UTF-8"))
    intercept[Exception] {
      Pipeline.newDates(spark, sfDir, corrupt.toString)
    }
  }

  test("runAll composes every stage over one shared silver lineage") {
    val out = Pipeline.runAll(spark, sfDir)
    val expected = Set(
      "brz", "silver", "dim_time", "dim_users", "dim_zones",
      "fact_events", "fact_payments", "agg_demand_hourly",
      "agg_revenue_daily", "agg_user_daily",
      "feat_demand", "feat_surge", "feat_churn",
      "score_demand", "score_surge", "score_metrics",
      "dq_summary", "monitor_psi", "monitor_missing", "monitor_volume")
    assert(out.keySet === expected)
    // stages are lazy: building the full DAG runs no jobs; materializing
    // a leaf pulls exactly its lineage
    assert(out("fact_events").count() === out("silver").count())
    assert(out("monitor_volume").count() === 1)
  }

  test("runCuration: each stage shrinks or holds the corpus; curated docs are canonical and clean") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val bench = docs.filter(col("doc_id") % 20 === 0)
    val out = Pipeline.runCuration(docs, bench,
      minQuality = 0.2, rates = Map("en" -> 0.5), defaultRate = 1.0)
    val n0 = docs.count()
    val counts = Seq("quality_kept", "exact_kept", "near_kept", "decontaminated", "curated")
      .map(k => k -> out(k).count())
    // monotone non-increasing through the stages
    assert(counts.map(_._2).sliding(2).forall(p => p.head >= p.last),
      s"stage counts must shrink: $counts (from $n0)")
    assert(counts.last._2 > 0)
    // benchmark docs themselves never survive decontamination
    assert(out("decontaminated").join(bench.select("doc_id"), "doc_id").count() === 0)
    // curated is a subset of decontaminated
    assert(out("curated").join(out("decontaminated").select("doc_id"), "doc_id").count()
      === out("curated").count())
    // split assignment covers every curated doc, disjointly and exhaustively
    val split = out("split")
    assert(split.count() === out("curated").count())
    assert(split.filter(!col("split").isin("train", "val", "test")).count() === 0)
    // epoch shuffle covers exactly the curated mix, permuted (dense
    // 1..n positions per shard)
    val shuffled = out("shuffled")
    assert(shuffled.count() === out("curated").count())
    assert(shuffled.select("doc_id").exceptAll(out("curated").select("doc_id")).count() === 0)
    assert(shuffled.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("pos").as("mx"))
      .filter(col("mx") =!= col("n")).count() === 0)
    // default run ships no QA report; opting in adds the one-row
    // confusion matrix over the quality-kept corpus
    assert(!out.contains("lsh_eval"))
    val withQa = Pipeline.runCuration(docs, bench, withLshEval = true)
    val qa = withQa("lsh_eval").head()
    assert(qa.getAs[Double]("recall") >= 0.0 && qa.getAs[Double]("recall") <= 1.0)
    assert(qa.getAs[Long]("tp") + qa.getAs[Long]("fn") > 0, "eval saw the planted near-dups")
  }

  test("curationReport: pinStages produces the identical 9-row report") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val bench = docs.filter(col("doc_id") % 20 === 0)
    val lazyRep = Pipeline.curationReport(docs, bench,
      minQuality = 0.2, rates = Map("en" -> 0.5), defaultRate = 1.0)
    val pinnedRep = Pipeline.curationReport(docs, bench,
      minQuality = 0.2, rates = Map("en" -> 0.5), defaultRate = 1.0,
      pinStages = true)
    assert(lazyRep.count() === 9)
    assert(lazyRep.exceptAll(pinnedRep).count() === 0)
    assert(pinnedRep.exceptAll(lazyRep).count() === 0)
  }

  test("cross-stage optimization: fact build reuses the silver lineage plan") {
    val out = Pipeline.runMedallion(spark, sfDir)
    // the fact's analyzed plan embeds the silver dedup window — one
    // lineage end-to-end, no opaque stage boundary
    val plan = out("fact_events").queryExecution.optimizedPlan.toString
    assert(plan.contains("row_number") || plan.contains("Window"), plan)
    assert(out("agg_revenue_daily").filter(col("total_revenue") < 0).count() === 0)
  }
}
