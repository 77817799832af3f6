package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.streaming.StatefulProfile

/** Round-66 sweeps for the transformWithState operator: q614 against a
  * driver-side fold of the typed events (exact equality including the
  * dominant-type tie-break), then the part the oracle can't see — a REAL
  * multi-batch drain (events split across two files, one file per
  * trigger) proving the ValueState/MapState handoff across micro-batches
  * and the strictly-increasing-n_events emission contract the
  * finalization rule depends on.
  */
class Round66PropertySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def driverProfiles(): Map[Long, (Long, Long, Long, Long, Long, String)] = {
    val typed = StatefulProfile
      .typedEvents(Tables.events(spark, sfDir))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    typed.groupBy(_._1).map { case (u, xs) =>
      val byType = xs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val dom = byType.toSeq.minBy { case (tp, n) => (-n, tp) }._1
      u -> ((xs.size.toLong, byType.size.toLong, xs.map(_._3).sum,
        xs.map(_._4).min, xs.map(_._4).max, dom))
    }
  }

  private def toMapped(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r =>
        r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getString(6))))
      .toMap

  test("q614 streaming profile equals the driver fold, exactly") {
    val got = toMapped(SparkEntry.queries("q614_tws_user_profile")(spark, sfDir))
    val expected = driverProfiles()
    assert(got == expected, s"mismatch: got ${got.size} keys, expected ${expected.size}")
  }

  // ---------------------------------------------------------------- q621

  test("q621 bootstrap+delta equals q614's full-history profile") {
    val boot = toMapped(SparkEntry.queries("q621_tws_bootstrap")(spark, sfDir))
    assert(boot == driverProfiles(), "backfill-then-stream != full batch profile")
    // the equality is only meaningful if the stream really carried a
    // strict subset: at least one user's profile must straddle the cut
    // (first event before it, last event after it)
    val events = StatefulProfile.typedEvents(Tables.events(spark, sfDir))
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    val mm = (events.map(_._2).min, events.map(_._2).max)
    val cut = (mm._1 + mm._2) / 2
    val straddlers = events.groupBy(_._1).count { case (_, xs) =>
      xs.exists(_._2 <= cut) && xs.exists(_._2 > cut)
    }
    assert(straddlers > 0, "no user straddles the cut - bootstrap merge untested")
  }

  // ---------------------------------------------------------------- q617

  private def driverSessions(): Map[(Long, Long), (Long, Long)] = {
    val typed = StatefulProfile
      .typedEvents(Tables.events(spark, sfDir))
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))) // user, cents, us
    typed.groupBy(_._1).flatMap { case (u, xs) =>
      val sorted = xs.sortBy(_._3)
      val sessions = scala.collection.mutable.ArrayBuffer.empty[List[(Long, Long, Long)]]
      var cur = List.empty[(Long, Long, Long)]
      sorted.foreach { e =>
        if (cur.nonEmpty && e._3 - cur.head._3 > StatefulProfile.SessionGapUs) {
          sessions += cur.reverse; cur = Nil
        }
        cur = e :: cur
      }
      if (cur.nonEmpty) sessions += cur.reverse
      sessions.map(s => (u, s.head._3) -> ((s.size.toLong, s.map(_._2).sum)))
    }
  }

  private def sessionsToMap(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap

  test("q617 timer sessions equal the driver gaps-and-islands fold") {
    val got = sessionsToMap(SparkEntry.queries("q617_tws_timer_sessions")(spark, sfDir))
    val expected = driverSessions()
    assert(got == expected, s"got ${got.size} sessions, expected ${expected.size}")
    // both close paths exercised: inline closes (more sessions than
    // users) and timer closes (every user's LAST session only ever
    // closes via handleExpiredTimer after the sentinel flush)
    val users = got.keySet.map(_._1)
    assert(got.size > users.size, "no inline session close was exercised")
  }

  test("q617 multi-batch: timer state and deletion hand off across batches") {
    val tmp = java.nio.file.Files.createTempDirectory("tws_sess_split").toFile
    try {
      val events = Tables.events(spark, sfDir).cache()
      val mm = events.selectExpr("min(unix_micros(ts))", "max(unix_micros(ts))").collect().head
      val cutUs = (mm.getLong(0) + mm.getLong(1)) / 2
      val dataDir = new java.io.File(tmp, "data"); dataDir.mkdirs()
      // time-ordered files (older half first) so batch 2 is never late;
      // the 1 h watermark delay ≥ 30 min gap keeps timer closes exact
      Seq(("a", unix_micros(col("ts")) <= cutUs), ("b", unix_micros(col("ts")) > cutUs),
        ("c_sentinel", lit(false))).foreach { case (tag, pred) =>
        val stage = new java.io.File(tmp, s"stage_$tag")
        val part =
          if (tag == "c_sentinel") {
            import spark.implicits._
            Seq((-1L, new java.sql.Timestamp(7258118400000L), -1L, "sentinel", 0.0, "{}"))
              .toDF(events.columns.toIndexedSeq: _*)
              .select(events.columns.map(c =>
                col(c).cast(events.schema(c).dataType)).toIndexedSeq: _*)
              .coalesce(1).write.parquet(stage.toString)
            stage.listFiles().filter(_.getName.endsWith(".parquet")).head
          } else {
            events.filter(pred).coalesce(1).write.parquet(stage.toString)
            stage.listFiles().filter(_.getName.endsWith(".parquet")).head
          }
        java.nio.file.Files.move(
          part.toPath, new java.io.File(dataDir, s"$tag.parquet").toPath)
      }
      val stream = spark.readStream
        .schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(dataDir.toString)
      val drained = StatefulProfile
        .drainUpdate(spark, StatefulProfile.sessionTimerStream(stream))
        .filter(col("user_id") =!= -1L)
      assert(sessionsToMap(drained) == driverSessions(),
        "three-batch timer drain != batch gaps-and-islands")
      events.unpersist()
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(tmp)
    }
  }

  test("multi-batch drain: state hands off across micro-batches") {
    val tmp = java.nio.file.Files.createTempDirectory("tws_split").toFile
    try {
      // two files, one per trigger -> two micro-batches through the
      // processor; the split is by event_id parity so most users appear
      // in BOTH batches and genuinely exercise the state handoff
      val events = Tables.events(spark, sfDir)
      val dataDir = new java.io.File(tmp, "data"); dataDir.mkdirs()
      Seq(("a", col("event_id") % 2 === 0), ("b", col("event_id") % 2 === 1)).foreach {
        case (tag, pred) =>
          val stage = new java.io.File(tmp, s"stage_$tag")
          events.filter(pred).coalesce(1).write.parquet(stage.toString)
          val part = stage.listFiles().filter(_.getName.endsWith(".parquet")).head
          java.nio.file.Files.move(
            part.toPath,
            new java.io.File(dataDir, s"events_$tag.parquet").toPath)
      }
      val stream = spark.readStream
        .schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(dataDir.toString)
      val drained = StatefulProfile
        .drainUpdate(spark, StatefulProfile.profileStream(stream))
        .cache()
      try {
        val emissions = drained
          .groupBy(col("user_id")).agg(count(lit(1)).as("k"))
          .agg(max(col("k")), min(col("k"))).collect().head
        assert(emissions.getLong(0) == 2L, "some key must be touched by both batches")

        // emission contract: per key, n_events strictly increases
        val perKey = drained.collect()
          .map(r => (r.getLong(0), r.getLong(1)))
          .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
        assert(perKey.values.forall(ns => ns.distinct.size == ns.size),
          "n_events must strictly increase across a key's emissions")

        val finals = toMapped(StatefulProfile.finalProfiles(drained))
        assert(finals == driverProfiles(), "two-batch final state != batch profile")
      } finally drained.unpersist()
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(tmp)
    }
  }
}
