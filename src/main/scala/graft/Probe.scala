package graft

import org.apache.spark.sql.SparkSession

/** Throwaway-style measurement main for iterative-operator knob probes
  * (kept in-tree so probe results in BASELINE are reproducible):
  * times zonePageRank / zoneCommunities across checkpoint cadences. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    SparkEntry.warmCache(spark, dir)
    // one-off curation-stage decomposition probe
    // IVF-PQ recall curve over its two query-side levers (nprobe ×
    // refine) — the measurement behind the deployed v_iq/v_ix defaults;
    // results recorded in BASELINE.md
    if (args.length > 1 && args(1) == "iqcurve") {
      import org.apache.spark.sql.functions.col
      val emb = Tables.embeddings(spark, dir).cache()
      val q = emb.filter(col("vec_id") < 10)
      for (nprobe <- Seq(1, 2, 4, 8, 16); refine <- Seq(1, 2, 4, 8)) {
        val t0 = System.nanoTime()
        val r = graft.similarity.Similarity
          .ivfPqEval(emb, q, nprobe = nprobe, refine = refine)
          .head().getAs[Double]("recall_at_k")
        println(f"IQCURVE nprobe=$nprobe%2d refine=$refine%2d recall@5=$r%.3f " +
          f"(${(System.nanoTime() - t0) / 1e9}%5.2f s)")
      }
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "curstages") {
      import org.apache.spark.sql.functions._
      val docs = Tables.documents(spark, dir)
      val bench = docs.filter(col("doc_id") % 20 === 0)
      def t(name: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val n = f
        println(f"CURSTAGE $name%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s ($n rows)")
      }
      for (pass <- 1 to 2) {
        val t0 = System.nanoTime()
        val st = graft.pipeline.Pipeline.runCuration(docs, bench, 0.2,
          Map("en" -> 0.5, "de" -> 0.25), 0.1)
        println(f"CURSTAGE runCuration($pass)      ${(System.nanoTime() - t0) / 1e9}%6.2f s")
        t(s"decontam_lazy($pass)")(st("decontaminated").count())
        val d = st("decontaminated")
        val t1 = System.nanoTime()
        d.persist(); d.count()
        println(f"CURSTAGE decontam_fill($pass)    ${(System.nanoTime() - t1) / 1e9}%6.2f s")
        d.unpersist()
      }
      spark.stop()
      return
    }
    // generic mode: `runMain graft.Probe <dir> q1,q2` times the named
    // SparkEntry queries (2 passes each) instead of the cadence sweep
    if (args.length > 1) {
      val names = args(1).split(',').toSeq
      for (name <- names; pass <- 1 to 2) {
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, dir).count()
        println(f"PROBE $name%-10s($pass) ${(System.nanoTime() - t0) / 1e9}%6.2f s ($n rows)")
      }
      spark.stop()
      return
    }
    val silver = graft.pipeline.Silver.cleanEvents(
      graft.pipeline.Bronze.ingestEvents(Tables.events(spark, dir))).cache()
    silver.count()
    def time(name: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = f.count()
      println(f"PROBE $name%-14s ${(System.nanoTime() - t0) / 1e9}%6.2f s ($n rows)")
    }
    for (c <- Seq(1, 2, 3); pass <- 1 to 2)
      time(s"m_pr_ck$c($pass)")(graft.mobility.Mobility.zonePageRank(silver, checkpointEvery = c))
    for (c <- Seq(1, 2, 3); pass <- 1 to 2)
      time(s"m_lp_ck$c($pass)")(graft.mobility.Mobility.zoneCommunities(silver, checkpointEvery = c))
    spark.stop()
  }
}
