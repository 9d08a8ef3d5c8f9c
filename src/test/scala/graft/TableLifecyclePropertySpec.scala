package graft

import org.apache.spark.sql.DataFrame

import graft.sources.VersionedTable

/** Model-based lifecycle fuzzer for the versioned table: a seeded
  * stream of random operations (append, overwrite, COW delete, MoR
  * delete, COW update, merge upsert, replaceWhere, optimize, rollback,
  * mid-run expireLog, and — round 15 — SET/UNSET TBLPROPERTIES with a
  * property model asserted after every op, rollback restoring the
  * target's property state, and `graft.appendOnly=true` randomly
  * arming a gate under which every row-mutating op must refuse loudly
  * and commit nothing) runs against BOTH the real table and a
  * driver-side model map; after every operation the head snapshot must
  * equal the model EXACTLY, at the end every still-resolvable version
  * must time-travel back to the model state it was committed with, and
  * the CHANGE FEED between every consecutive resolvable pair must
  * replay the earlier state into the later one (the CDF algebra:
  * state ∖ deletes ∖ update-pre ∪ inserts ∪ update-post = next state).
  * This is the interleaving coverage the per-operation specs can't
  * give: DV deletes under later COW rewrites, rollbacks across
  * optimizes, merges over vectored files, scoped replaces over log
  * expiry — whatever the seed composes. Seeds are fixed: failures
  * reproduce. */
class TableLifecyclePropertySpec extends SparkSpec {
  import spark.implicits._

  private type Row3 = (Long, Long, String)

  private def runLifecycle(seedVal: Long, nOps: Int): Unit = {
    val t = java.nio.file.Files.createTempDirectory("vt_life").toString
    val rnd = new scala.util.Random(seedVal)
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
    // table-property model (round 15): set/unset are ops in the mix,
    // rollback restores the target version's property state, and
    // graft.appendOnly=true must turn every row-deleting/updating op
    // into a loud refusal that commits NOTHING (model unchanged)
    var propsModel = Map.empty[String, String]
    val propsStates = scala.collection.mutable.Map.empty[Long, Map[String, String]]
    propsStates(0L) = propsModel
    def appendOnly: Boolean = propsModel.get("graft.appendOnly").contains("true")
    /** Run a row-mutating op: under appendOnly it must refuse naming the
      * property and leave table + model untouched. Returns whether it ran. */
    def guarded(op: => Unit): Boolean =
      if (appendOnly) {
        val before = VersionedTable.latestVersion(spark, t)
        val e = intercept[UnsupportedOperationException](op)
        assert(e.getMessage.contains("graft.appendOnly"))
        assert(VersionedTable.latestVersion(spark, t) === before,
          s"seed $seedVal: a refused op still committed")
        false
      } else { op; true }

    def tableRows(): Set[Row3] =
      VersionedTable.readVersion(spark, t).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet

    // v0: a seed snapshot
    val seed = freshRows(30)
    VersionedTable.commit(df(seed), t, mode = "overwrite", ts = ts())
    model = seed.map(r => r._1 -> r).toMap
    states(0L) = model.values.toSet

    // (condition SQL, model predicate, force-a-row-into-scope)
    def pred(): (String, Row3 => Boolean, Row3 => Row3) = rnd.nextInt(3) match {
      case 0 =>
        val k = rnd.nextInt(3)
        (s"v % 3 = $k", r => r._2 % 3 == k,
          r => (r._1, r._2 - r._2 % 3 + k, r._3))
      case 1 =>
        val x = 20 + rnd.nextInt(60)
        (s"v < $x", r => r._2 < x,
          r => (r._1, math.min(r._2, x - 1L), r._3))
      case _ =>
        val g = s"t${rnd.nextInt(5)}"
        (s"tag = '$g'", r => r._3 == g, r => (r._1, r._2, g))
    }

    def resolvable(v: Long): Boolean = VersionedTable.hasVersion(spark, t, v)

    (1 to nOps).foreach { opIdx =>
      val opName: String = rnd.nextInt(12) match {
        case 0 => // append fresh rows
          val rows = freshRows(5 + rnd.nextInt(10))
          VersionedTable.commit(df(rows), t, mode = "append", ts = ts())
          model ++= rows.map(r => r._1 -> r)
          "append"
        case 1 => // snapshot overwrite
          val rows = freshRows(10 + rnd.nextInt(10))
          if (guarded(VersionedTable.commit(df(rows), t, mode = "overwrite", ts = ts())))
            model = rows.map(r => r._1 -> r).toMap
          "overwrite"
        case 2 => // COW delete
          val (c, f, _) = pred()
          if (guarded(VersionedTable.delete(spark, t, c, ts = ts())))
            model = model.filterNot { case (_, r) => f(r) }
          s"delete[$c]"
        case 3 => // merge-on-read delete (deletion vectors; may auto-fold)
          val (c, f, _) = pred()
          if (guarded(VersionedTable.deleteMergeOnRead(spark, t, c, ts = ts())))
            model = model.filterNot { case (_, r) => f(r) }
          s"mor_delete[$c]"
        case 4 => // COW update
          val (c, f, _) = pred()
          val add = 100L + rnd.nextInt(100)
          if (guarded(VersionedTable.update(spark, t, c, Map("v" -> s"v + $add"), ts = ts())))
            model = model.map { case (id, r) =>
              id -> (if (f(r)) (r._1, r._2 + add, r._3) else r)
            }
          s"update[$c]"
        case 5 => // merge upsert: half existing keys re-valued, half fresh
          val existing = rnd.shuffle(model.keys.toSeq.sorted).take(5)
            .map(id => (id, 1000L + rnd.nextInt(100), "merged"))
          val fresh = freshRows(5)
          val src = existing ++ fresh
          if (guarded(VersionedTable.merge(df(src), t, keyCols = Seq("id"), ts = ts())))
            model ++= src.map(r => r._1 -> r)
          "merge"
        case 6 => // predicate-scoped overwrite: in-scope batch replaces scope
          val (c, f, fix) = pred()
          val rows = freshRows(3 + rnd.nextInt(5)).map(fix)
          if (guarded(VersionedTable.replaceWhere(df(rows), t, c, ts = ts())))
            model = model.filterNot { case (_, r) => f(r) } ++
              rows.map(r => r._1 -> r)
          s"replaceWhere[$c]"
        case 7 => // maintenance: content must not move
          VersionedTable.optimize(spark, t, ts = ts())
          "optimize"
        case 8 => // rollback to a random still-resolvable recorded version
          val candidates = states.keys.toSeq.sorted.filter(resolvable)
          val target = candidates(rnd.nextInt(candidates.size))
          VersionedTable.rollback(spark, t, target, ts = ts())
          model = states(target).map(r => r._1 -> r).toMap
          // properties are versioned metadata: rollback restores them too
          propsModel = propsStates(target)
          s"rollback[$target]"
        case 9 => // mid-run log expiry: old versions become unresolvable
          VersionedTable.expireLog(spark, t, retainVersions = 8)
          "expireLog"
        case 10 => // set a table property (sometimes the appendOnly gate)
          val (k, v) = rnd.nextInt(4) match {
            case 0 => ("graft.appendOnly", "true")
            case 1 => ("team", s"team${rnd.nextInt(3)}")
            case 2 => ("graft.retainVersions", (2 + rnd.nextInt(5)).toString)
            case _ => ("note", s"n${rnd.nextInt(10)}")
          }
          VersionedTable.setProperties(spark, t, Map(k -> v), ts = ts())
          propsModel += (k -> v)
          s"set_prop[$k]"
        case _ => // unset a random property (or prove unknown-key refusal)
          if (propsModel.isEmpty) {
            intercept[IllegalArgumentException](
              VersionedTable.unsetProperties(spark, t, Seq("ghost")))
            "unset_prop[none]"
          } else {
            val k = rnd.shuffle(propsModel.keys.toSeq.sorted).head
            VersionedTable.unsetProperties(spark, t, Seq(k), ts = ts())
            propsModel -= k
            s"unset_prop[$k]"
          }
      }
      val head = VersionedTable.latestVersion(spark, t)
      states(head) = model.values.toSet
      propsStates(head) = propsModel
      assert(tableRows() === model.values.toSet,
        s"seed $seedVal: head diverged from model after op #$opIdx ($opName) at v$head")
      assert(VersionedTable.propertiesOf(spark, t) === propsModel,
        s"seed $seedVal: properties diverged from model after op #$opIdx ($opName)")
    }

    // every still-resolvable recorded version time-travels back to its
    // model state (expired versions are gone, like Delta after cleanup)
    val live = states.toSeq.sortBy(_._1).filter(s => resolvable(s._1))
    assert(live.size >= 8, s"seed $seedVal: too few resolvable versions survived")
    live.foreach { case (v, want) =>
      val got = VersionedTable.readVersion(spark, t, v).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(got === want,
        s"seed $seedVal: time travel to v$v diverged from its model state")
    }

    // CDF algebra over every consecutive resolvable pair: the change
    // feed replays state(v) into state(v+1) exactly
    live.map(_._1).sliding(2).foreach {
      case Seq(a, b) if b == a + 1 =>
        val feed = VersionedTable.changes(spark, t, Seq("id"), a, b)
          .select("id", "v", "tag", "_change_type").collect()
          .map(r => ((r.getLong(0), r.getLong(1), r.getString(2)), r.getString(3)))
        val dropIds = feed.collect {
          case ((id, _, _), tpe) if tpe == "delete" || tpe == "update_preimage" => id
        }.toSet
        val addRows = feed.collect {
          case (row, tpe) if tpe == "insert" || tpe == "update_postimage" => row
        }.toSet
        val applied = states(a).filterNot(r => dropIds.contains(r._1)) ++ addRows
        assert(applied === states(b),
          s"seed $seedVal: CDF algebra broke replaying v$a -> v$b")
      case _ => ()
    }

    // the log survives a final expiry: head still equals the model
    VersionedTable.expireLog(spark, t, retainVersions = 5)
    assert(tableRows() === model.values.toSet,
      s"seed $seedVal: head diverged after final expireLog")
  }

  test("seed 41: 40 random ops — head ≡ model, time travel ≡ states, CDF replays states") {
    runLifecycle(41L, 40)
  }

  test("seed 97: 40 random ops — head ≡ model, time travel ≡ states, CDF replays states") {
    runLifecycle(97L, 40)
  }
}
