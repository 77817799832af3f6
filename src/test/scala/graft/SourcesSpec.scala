package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.SimConfig
import graft.sim.SimOperator
import graft.sources.{DataGen, RequestCsv}

/** CSV source contract (reference tests/test_csv_parser.py), datagen shape
  * (scripts/generate_sample_data.py), and scenario fan-out equivalence.
  */
class SourcesSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def tmpCsv(content: String): String = {
    val f = Files.createTempFile("graft_req", ".csv")
    Files.writeString(f, content)
    f.toString
  }

  test("valid CSV parses with tz-aware UTC µs timestamps (test_csv_parser.py:53-70)") {
    val path = tmpCsv(
      """user_id,request_time,processing_time
        |user1,2023-01-01T00:00:00.100000Z,1.0
        |user2,2023-01-01T00:00:00.200000Z,2.0
        |user3,2023-01-01T00:00:00.300000Z,0.5
        |""".stripMargin)
    val rows = RequestCsv.read(spark, path).collect().sortBy(_.seq)
    assert(rows.length == 3)
    assert(rows(0).userId == "user1")
    assert(rows(0).requestTimeMicros.contains(1672531200100000L))
    assert(math.abs(rows(0).simArrivalTime - 0.1) < 1e-9)
    assert(rows(2).processingTime == 0.5)
  }

  test("header-only CSV → empty, no error (test_csv_parser.py:95-97)") {
    val path = tmpCsv("user_id,request_time,processing_time\n")
    assert(RequestCsv.read(spark, path).count() == 0)
  }

  test("malformed timestamp → row-numbered error (test_csv_parser.py:103-108)") {
    val path = tmpCsv(
      """user_id,request_time,processing_time
        |user1,not_a_datetime_string,1.0
        |""".stripMargin)
    val e = intercept[RequestCsv.CsvParseException](RequestCsv.read(spark, path).collect())
    assert(e.message.contains("timestamp"))
    assert(e.message.contains("row 1"))
  }

  test("1-5 digit fractional seconds parse (fromisoformat parity, csv_parser.py:50-53)") {
    val path = tmpCsv(
      """user_id,request_time,processing_time
        |user1,2023-01-01T00:00:00.123Z,1.0
        |user2,2023-01-01T00:00:00.1,2.0
        |user3,2023-01-01T00:00:00.12345+00:00,3.0
        |""".stripMargin)
    val rows = RequestCsv.read(spark, path).collect().sortBy(_.seq)
    assert(rows(0).requestTimeMicros.contains(1672531200123000L))
    assert(rows(1).requestTimeMicros.contains(1672531200100000L))
    assert(rows(2).requestTimeMicros.contains(1672531200123450L))
  }

  test("malformed row in a multi-file read reports a real position, not a partition-id offset") {
    val dir = Files.createTempDirectory("graft_req_multi")
    Files.writeString(dir.resolve("a.csv"),
      """user_id,request_time,processing_time
        |user1,2023-01-01T00:00:00.100000Z,1.0
        |user2,2023-01-01T00:00:00.200000Z,2.0
        |""".stripMargin)
    Files.writeString(dir.resolve("b.csv"),
      """user_id,request_time,processing_time
        |user3,bad_timestamp_here,3.0
        |""".stripMargin)
    val e = intercept[RequestCsv.CsvParseException](RequestCsv.read(spark, dir.toString).collect())
    // seq (monotonically_increasing_id) jumps by 2^33 across input files;
    // the reported row number must be the rank in seq order, never the id.
    val reported = "row (\\d+)".r.findFirstMatchIn(e.message).map(_.group(1).toLong)
    assert(reported.exists(n => n >= 1 && n <= 3), s"got: ${e.message}")
  }

  test("lenient ingest: clean rows parse, malformed rows quarantine with a reason") {
    val path = tmpCsv(
      """user_id,request_time,processing_time
        |user1,2023-01-01T00:00:00.100000Z,1.0
        |user2,not-a-timestamp,2.0
        |user3,2023-01-01T00:00:00.300000Z,abc
        |user4,2023-01-01T00:00:01Z,4.0
        |""".stripMargin)
    val (clean, quarantined) = graft.sources.RequestCsv.readLenient(spark, path)
    assert(clean.collect().map(_.userId).toSet == Set("user1", "user4"))
    val q = quarantined.collect()
      .map(r => r.getAs[String]("user_id") -> r.getAs[String]("reason")).toMap
    assert(q == Map("user2" -> "malformed_timestamp", "user3" -> "malformed_float"))
    // lenient and strict agree on fully-clean input
    val okPath = tmpCsv(
      """user_id,request_time,processing_time
        |user1,2023-01-01T00:00:00.100000Z,1.0
        |""".stripMargin)
    val (c2, q2) = graft.sources.RequestCsv.readLenient(spark, okPath)
    assert(q2.isEmpty)
    assert(c2.collect().toSeq == graft.sources.RequestCsv.read(spark, okPath).collect().toSeq)
  }

  test("malformed float → error (test_csv_parser.py:110-116)") {
    val path = tmpCsv(
      """user_id,request_time,processing_time
        |user1,2023-01-01T00:00:00.100000Z,not_a_float
        |""".stripMargin)
    val e = intercept[RequestCsv.CsvParseException](RequestCsv.read(spark, path).collect())
    assert(e.message.contains("float"))
  }

  test("missing column → error naming it (test_csv_parser.py:118-121)") {
    val path = tmpCsv(
      """user_id,request_time
        |user1,2023-01-01T00:00:00.100000Z
        |""".stripMargin)
    val e = intercept[RequestCsv.CsvParseException](RequestCsv.read(spark, path))
    assert(e.message.contains("processing_time"))
  }

  test("no-Z timestamps parse as naive UTC (test_csv_parser.py / csv_parser.py:54-59)") {
    val path = tmpCsv(
      """user_id,request_time,processing_time
        |user1,2023-01-01T00:00:01,1.0
        |""".stripMargin)
    val rows = RequestCsv.read(spark, path).collect()
    assert(rows(0).requestTimeMicros.contains(1672531201000000L))
  }

  test("end-to-end: reference sample_requests.csv shape simulates completely") {
    // 25 rows equivalent to the bundled sample (5 users, arrivals within
    // ~14 s, processing 1.4–9.6 s) — the reference asserts len == 25
    // (tests/test_simulator.py:146).
    val rng = new scala.util.Random(5)
    val lines = (1 to 25).map { i =>
      val t = 680000 + rng.nextInt(12810000) // µs offsets ≈ 0.68–13.49 s
      val sec = t / 1000000
      val micro = t % 1000000
      f"user_${('a' + rng.nextInt(5)).toChar},2023-01-01T00:00:$sec%02d.$micro%06dZ,${1.4 + rng.nextDouble() * 8.2}%.1f"
    }
    val path = tmpCsv("user_id,request_time,processing_time\n" + lines.mkString("\n") + "\n")
    val reqs = RequestCsv.read(spark, path)
    val completed = SimOperator.simulate(reqs, SimConfig(numWorkers = 2)).collect()
    assert(completed.length == 25)
    assert(completed.forall(_.finishTime >= 0))
  }

  test("datagen: deterministic under seed, sorted, bounded values (generate_sample_data.py)") {
    val a = DataGen.generate(spark, 5, 5, seed = 42).collect()
    val b = DataGen.generate(spark, 5, 5, seed = 42).collect()
    assert(a.toSeq == b.toSeq)
    assert(a.length == 25)
    val times = a.map(_.getAs[String]("request_time"))
    assert(times.sorted.toSeq == times.toSeq)
    val procs = a.map(_.getAs[Double]("processing_time"))
    assert(procs.forall(p => p >= 1.0 && p <= 10.0))
    val users = a.map(_.getAs[String]("user_id")).toSet
    assert(users.subsetOf(Set("user_a", "user_b", "user_c", "user_d", "user_e")))
  }

  test("CSV sink round-trip: datagen → writeCsv → RequestCsv.read (S2→S1)") {
    val dir = Files.createTempDirectory("graft_gen").toString + "/out"
    DataGen.writeCsv(DataGen.generate(spark, 4, 6, seed = 9L), dir)
    val back = RequestCsv.read(spark, dir).collect()
    assert(back.length == 24)
    assert(back.forall(r => r.simArrivalTime > 0 && r.processingTime >= 1.0))
  }

  test("32-combo grid fan-out ≡ 32 independent full-stream simulations") {
    import spark.implicits._
    val grid = graft.queries.SimQueries.grid32
    assert(grid.size === 32)
    val reqs = graft.sources.EventRequests
      .requests(spark, "/root/testdata/sf0.001").collect().toSeq
    val keyed = grid.keys.toSeq.sorted.flatMap(k => reqs.map(r => (k, r)))
    val fanned = SimOperator
      .simulateScenarios(keyed.toDS(), (k: Int) => grid(k))
      .collect()
      .groupBy(_._1)
      .map { case (k, rows) => k -> rows.map(_._2).toVector }
    val direct = grid.map { case (k, cfg) =>
      k -> graft.sim.SimCore.run(cfg, reqs.iterator).toVector
    }
    assert(fanned.keySet === direct.keySet)
    for (k <- direct.keys) assert(fanned(k) === direct(k), s"scenario $k diverged")
  }

  test("scenario fan-out ≡ independent per-key simulations") {
    import spark.implicits._
    val reqs = (0 until 30).map { i =>
      graft.model.SimRequest(s"u$i", None, 1.0 + i % 5, (i / 3) * 0.5, i.toLong)
    }
    val keyed = reqs.zipWithIndex.map { case (r, i) => (s"k${i % 3}", r) }
    val fanned = SimOperator
      .simulateScenarios(keyed.toDS(), (_: String) => SimConfig(numWorkers = 2))
      .collect()
      .groupBy(_._1)
      .map { case (k, rows) => k -> rows.map(_._2).toVector }
    val direct = keyed.groupBy(_._1).map { case (k, rs) =>
      k -> graft.sim.SimCore.run(SimConfig(numWorkers = 2), rs.map(_._2).iterator).toVector
    }
    assert(fanned == direct)
  }
}
