package graft

import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

/** Differential property test for manifest-stats file pruning: for a
  * seeded stream of random predicates over every stat-bearing type
  * (long, decimal, timestamp, string), `readWhere(cond)` must return
  * EXACTLY `readVersion().filter(cond)`'s rows. Pruning is an
  * optimization — any divergence is silent data corruption, and the
  * failure mode that matters (a sound-looking range that wrongly drops
  * a file) is exactly what random literals around the domain edges
  * flush out. The seed is fixed: failures reproduce. */
class PruningPropertySpec extends SparkSpec {

  test("readWhere ≡ filter over 60 random mixed-type predicates; some prune") {
    val prevTs = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try {
      val t = java.nio.file.Files.createTempDirectory("vt_prop").toString
      // 200 rows over 4 stat-bearing columns; range layout on id gives
      // every file a distinct id/amt/ts band and a distinct cc band
      val base = spark.range(1, 201).select(
        col("id"),
        expr("CAST(id * 1.05 AS DECIMAL(9,2))").as("amt"),
        timestamp_seconds(lit(1767225600L) + col("id") * 3600).as("ts"),
        concat(lit("c"), lpad(col("id").cast("string"), 3, "0")).as("cc"))
        .repartitionByRange(4, col("id"))
      VersionedTable.commit(base, t, mode = "overwrite", ts = "2026-01-01T00:00:00Z")
      val full = VersionedTable.snapshotFiles(spark, t).size
      assert(full === 4)

      val rnd = new scala.util.Random(11L) // fixed seed: failures reproduce
      def randLit(colName: String): String = {
        // in-domain (1..200) plus out-of-domain edges either side
        val v = rnd.nextInt(260) - 30
        colName match {
          case "id" => v.toString
          case "amt" => f"${v * 1.05}%.2f"
          case "ts" =>
            val sec = 1767225600L + v.toLong * 3600
            val inst = java.time.Instant.ofEpochSecond(math.max(0L, sec))
            s"TIMESTAMP '${inst.toString.replace("T", " ").stripSuffix("Z")}'"
          case _ => f"'c$v%03d'"
        }
      }
      def atom(): String = {
        val c = Seq("id", "amt", "ts", "cc")(rnd.nextInt(4))
        rnd.nextInt(7) match {
          case 0 => s"$c < ${randLit(c)}"
          case 1 => s"$c <= ${randLit(c)}"
          case 2 => s"$c = ${randLit(c)}"
          case 3 => s"$c > ${randLit(c)}"
          case 4 => s"$c >= ${randLit(c)}"
          case 5 => s"$c BETWEEN ${randLit(c)} AND ${randLit(c)}"
          case _ => s"$c IN (${randLit(c)}, ${randLit(c)}, ${randLit(c)})"
        }
      }
      def cond(): String =
        (0 until 1 + rnd.nextInt(3)).map(_ => atom())
          .mkString(if (rnd.nextBoolean()) " AND " else " OR ")

      var pruned = 0
      (0 until 60).foreach { _ =>
        val c = cond()
        val kept = VersionedTable.prunedFiles(spark, t, c)
        val got = VersionedTable.readWhere(spark, t, c)
          .select("id").collect().map(_.getLong(0)).toSet
        val want = VersionedTable.readVersion(spark, t).filter(expr(c))
          .select("id").collect().map(_.getLong(0)).toSet
        assert(got === want, s"readWhere diverged on: $c (kept ${kept.size}/$full)")
        if (kept.size < full) pruned += 1
      }
      // the machinery must actually fire — an always-conservative pruner
      // would pass the equality vacuously
      assert(pruned >= 20, s"only $pruned/60 predicates pruned any file")
    } finally spark.conf.set("spark.sql.parquet.outputTimestampType", prevTs)
  }

  test("readWhere ≡ filter over 40 random CROSS-TYPED equality predicates on an INDEXED table") {
    // the ADVICE hazard class: bloom probes canonicalized from the
    // literal's type alone prune files Spark's cast-based equality would
    // match. Random same- and cross-typed literals over a bloom-indexed
    // long + zero-padded-string pair; every query must equal the filter.
    val t = java.nio.file.Files.createTempDirectory("vt_prop_bloom").toString
    val base = spark.range(1, 201).select(
      col("id"),
      lpad(col("id").cast("string"), 4, "0").as("code"))
      .repartition(4, col("id")) // hash layout: only blooms can prune
    VersionedTable.commit(base, t, mode = "overwrite", ts = "2026-01-01T00:00:00Z",
      bloomIndex = Seq("id", "code"), bloomBits = 1 << 12)
    val rnd = new scala.util.Random(23L)
    var pruned = 0
    (0 until 40).foreach { _ =>
      val v = rnd.nextInt(230) - 15
      val c = rnd.nextInt(6) match {
        case 0 => s"id = $v"                        // same-typed: prunes
        case 1 => s"id = '$v'"                      // string on long
        case 2 => f"id = '$v%04d'"                  // PADDED string on long
        case 3 => f"code = '$v%04d'"                // same-typed: prunes
        case 4 => s"code = $v"                      // int on string
        case _ => f"id IN ($v, '${rnd.nextInt(200) + 1}%04d')" // mixed IN
      }
      val got = VersionedTable.readWhere(spark, t, c)
        .select("id").collect().map(_.getLong(0)).toSet
      val want = VersionedTable.readVersion(spark, t).filter(expr(c))
        .select("id").collect().map(_.getLong(0)).toSet
      assert(got === want, s"readWhere diverged on: $c")
      if (VersionedTable.prunedFiles(spark, t, c).size < 4) pruned += 1
    }
    assert(pruned >= 8, s"only $pruned/40 indexed probes pruned any file")
  }
}
