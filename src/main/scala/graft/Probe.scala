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
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    SparkEntry.warmCache(spark, dir)
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
