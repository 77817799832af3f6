package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingRateLimiter

/** The streaming rate limiter replicates the reference deque semantics
  * (strict `now - ts > window` eviction, allowed-only admission) across
  * micro-batches, and agrees with a direct fold of the same rules.
  */
class StreamingRateLimiterSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(sec: Int) = 1672567200000000000L + sec.toLong * 1000000000L

  private def drain(dir: String, limit: Int): Map[Long, Boolean] = {
    val stream = spark.readStream
      .schema("event_id long, ts long, user_id long")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/data")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val name = s"rl_${System.nanoTime()}"
    try {
      graft.streaming.StreamingOps.withStatePartitions(spark) {
        val q = StreamingRateLimiter.decisions(stream, limit, windowUs = 60000000L)
          .writeStream.outputMode("update").format("memory")
          .queryName(name).trigger(Trigger.AvailableNow()).start()
        try q.processAllAvailable()
        finally q.stop()
      }
    } finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
    spark.table(name).select("event_id", "allowed")
      .as[(Long, Boolean)].collect().toMap
  }

  test("strict-window eviction, admission cap, cross-batch deque persistence") {
    val dir = Files.createTempDirectory("graft_rl").toString
    def stage(name: String, rows: Seq[(Long, Long, Long)]): Unit = {
      val scratch = s"$dir/scratch_$name"
      rows.toDF("event_id", "ts", "user_id").coalesce(1).write.parquet(scratch)
      val part = new java.io.File(scratch).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.createDirectories(java.nio.file.Paths.get(s"$dir/data"))
      Files.move(part.toPath, java.nio.file.Paths.get(s"$dir/data/$name.parquet"))
    }
    // limit 3 / 60 s. batch a (user 7): t=0,10,20 allowed; t=30 over cap
    stage("a", Seq(
      (1L, ts(0), 7L), (2L, ts(10), 7L), (3L, ts(20), 7L), (4L, ts(30), 7L)))
    // batch b: t=60 — entry at t=0 is EXACTLY window old (60-0 = 60, not
    // > 60) so still counted → rejected; t=61 — t=0 evicted → allowed
    // (deque then holds 10,20,61). Distinct user unaffected by 7's cap.
    stage("b", Seq(
      (5L, ts(60), 7L), (6L, ts(61), 7L), (7L, ts(0), 8L)))

    val got = drain(dir, limit = 3)
    val expected = Map(
      1L -> true, 2L -> true, 3L -> true, 4L -> false,
      5L -> false, 6L -> true, 7L -> true)
    assert(got == expected, s"got $got")
  }

  test("agrees with a direct fold of the reference rules on a random schedule") {
    val rng = new scala.util.Random(11)
    val events = (1L to 120L).map(i =>
      (i, ts(rng.nextInt(300)), (i % 3) + 100L)).sortBy(e => (e._2, e._1))
    val dir = Files.createTempDirectory("graft_rl2").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$dir/data"))
    // two batches split mid-stream
    val (first, second) = events.splitAt(60)
    def stage(name: String, rows: Seq[(Long, Long, Long)]): Unit = {
      val scratch = s"$dir/scratch_$name"
      rows.toDF("event_id", "ts", "user_id").coalesce(1).write.parquet(scratch)
      val part = new java.io.File(scratch).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, java.nio.file.Paths.get(s"$dir/data/$name.parquet"))
    }
    stage("a", first)
    stage("b", second)
    val got = drain(dir, limit = 5)
    // reference fold (api_client.py:17-24 semantics) per user in stream order
    val expected = events.groupBy(_._3).flatMap { case (_, es) =>
      val deque = scala.collection.mutable.Queue[Long]()
      es.map { case (id, t, _) =>
        val tUs = t / 1000
        while (deque.nonEmpty && tUs - deque.head > 60000000L) deque.dequeue()
        val allowed = deque.size < 5
        if (allowed) deque.enqueue(tUs)
        id -> allowed
      }
    }.toMap
    assert(got == expected)
    assert(expected.values.exists(!_), "fixture never hit the cap — weak test")
  }
}
