package graft

import org.apache.spark.sql.DataFrame

import graft.sources.VersionedTable

/** Model-based lifecycle fuzzer for the versioned table: a seeded
  * stream of random operations (append, overwrite, COW delete, MoR
  * delete, COW update, merge upsert, optimize, rollback) runs against
  * BOTH the real table and a driver-side model map; after every
  * operation the head snapshot must equal the model EXACTLY, and at the
  * end every recorded version must time-travel back to the model state
  * it was committed with. This is the interleaving coverage the
  * per-operation specs can't give: DV deletes under later COW rewrites,
  * rollbacks across optimizes, merges over vectored files — whatever
  * the seed composes. The seed is fixed: failures reproduce. */
class TableLifecyclePropertySpec extends SparkSpec {
  import spark.implicits._

  private type Row3 = (Long, Long, String)

  test("40 random table ops: head ≡ model after each; every version time-travels to its model state") {
    val t = java.nio.file.Files.createTempDirectory("vt_life").toString
    val rnd = new scala.util.Random(41L) // fixed seed: failures reproduce
    var nextId = 0L
    var step = 0
    def ts(): String = {
      step += 1
      java.time.Instant.EPOCH.plusSeconds(step.toLong * 60).toString
    }
    def freshRows(n: Int): Seq[Row3] = (0 until n).map { _ =>
      nextId += 1
      (nextId, rnd.nextInt(100).toLong, s"t${rnd.nextInt(5)}")
    }
    def df(rows: Seq[Row3]): DataFrame = rows.toDF("id", "v", "tag")

    var model = Map.empty[Long, Row3]
    // expected content per committed version (time-travel oracle)
    val states = scala.collection.mutable.Map.empty[Long, Set[Row3]]

    def tableRows(): Set[Row3] =
      VersionedTable.readVersion(spark, t).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet

    // v0: a seed snapshot
    val seed = freshRows(30)
    VersionedTable.commit(df(seed), t, mode = "overwrite", ts = ts())
    model = seed.map(r => r._1 -> r).toMap
    states(0L) = model.values.toSet

    def pred(): (String, Row3 => Boolean) = rnd.nextInt(3) match {
      case 0 =>
        val k = rnd.nextInt(3)
        (s"v % 3 = $k", r => r._2 % 3 == k)
      case 1 =>
        val x = 20 + rnd.nextInt(60)
        (s"v < $x", r => r._2 < x)
      case _ =>
        val g = s"t${rnd.nextInt(5)}"
        (s"tag = '$g'", r => r._3 == g)
    }

    (1 to 40).foreach { opIdx =>
      val opName: String = rnd.nextInt(8) match {
        case 0 => // append fresh rows
          val rows = freshRows(5 + rnd.nextInt(10))
          VersionedTable.commit(df(rows), t, mode = "append", ts = ts())
          model ++= rows.map(r => r._1 -> r)
          "append"
        case 1 => // snapshot overwrite
          val rows = freshRows(10 + rnd.nextInt(10))
          VersionedTable.commit(df(rows), t, mode = "overwrite", ts = ts())
          model = rows.map(r => r._1 -> r).toMap
          "overwrite"
        case 2 => // COW delete
          val (c, f) = pred()
          VersionedTable.delete(spark, t, c, ts = ts())
          model = model.filterNot { case (_, r) => f(r) }
          s"delete[$c]"
        case 3 => // merge-on-read delete (deletion vectors; may auto-fold)
          val (c, f) = pred()
          VersionedTable.deleteMergeOnRead(spark, t, c, ts = ts())
          model = model.filterNot { case (_, r) => f(r) }
          s"mor_delete[$c]"
        case 4 => // COW update
          val (c, f) = pred()
          val add = 100L + rnd.nextInt(100)
          VersionedTable.update(spark, t, c, Map("v" -> s"v + $add"), ts = ts())
          model = model.map { case (id, r) =>
            id -> (if (f(r)) (r._1, r._2 + add, r._3) else r)
          }
          s"update[$c]"
        case 5 => // merge upsert: half existing keys re-valued, half fresh
          val existing = rnd.shuffle(model.keys.toSeq.sorted).take(5)
            .map(id => (id, 1000L + rnd.nextInt(100), "merged"))
          val fresh = freshRows(5)
          val src = existing ++ fresh
          VersionedTable.merge(df(src), t, keyCols = Seq("id"), ts = ts())
          model ++= src.map(r => r._1 -> r)
          "merge"
        case 6 => // maintenance: content must not move
          VersionedTable.optimize(spark, t, ts = ts())
          "optimize"
        case _ => // rollback to a random recorded version
          val target = states.keys.toSeq.sorted.apply(
            rnd.nextInt(states.size))
          VersionedTable.rollback(spark, t, target, ts = ts())
          model = states(target).map(r => r._1 -> r).toMap
          s"rollback[$target]"
      }
      val head = VersionedTable.latestVersion(spark, t)
      states(head) = model.values.toSet
      assert(tableRows() === model.values.toSet,
        s"head diverged from model after op #$opIdx ($opName) at v$head")
    }

    // every recorded version time-travels back to its model state
    states.toSeq.sortBy(_._1).foreach { case (v, want) =>
      val got = VersionedTable.readVersion(spark, t, v).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(got === want, s"time travel to v$v diverged from its model state")
    }
    // the log survives maintenance: expire below a checkpoint anchor and
    // the head still equals the model
    VersionedTable.expireLog(spark, t, retainVersions = 5)
    assert(tableRows() === model.values.toSet, "head diverged after expireLog")
  }
}
