package graft

import java.io.{ByteArrayOutputStream, PrintStream}
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** The CLI end to end, in-process: CSV → simulate → printed report
  * (X1, reference main.py:16-159), including the bounded-FIFO rejection
  * path and the reference's error contract for bad input.
  */
class CliSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def csv(content: String): String = {
    val f = Files.createTempFile("graft_cli", ".csv")
    Files.writeString(f, content)
    f.toString
  }

  private def runCapturing(args: String*): (String, String) = {
    val _ = spark.version // init the shared session OUTSIDE the capture
    val out = new ByteArrayOutputStream()
    val err = new ByteArrayOutputStream()
    Console.withOut(new PrintStream(out, true, "UTF-8")) {
      Console.withErr(new PrintStream(err, true, "UTF-8")) {
        val prevErr = System.err
        System.setErr(new PrintStream(err, true, "UTF-8"))
        try graft.cli.Main.run(spark, args.toArray)
        finally System.setErr(prevErr)
      }
    }
    (out.toString("UTF-8"), err.toString("UTF-8"))
  }

  private val fourRows =
    """user_id,request_time,processing_time
      |u1,2023-01-01T00:00:00.000000Z,1.0
      |u2,2023-01-01T00:00:00.500000Z,2.0
      |u3,2023-01-01T00:00:01.000000Z,1.5
      |u4,2023-01-01T00:00:01.500000Z,0.5
      |""".stripMargin

  test("default priority run prints the full report; everything processes") {
    val (out, err) = runCapturing(csv(fourRows), "-w", "2")
    assert(!err.contains("Error:"), err)
    assert(out.contains("Total requests (input):  4"))
    assert(out.contains("Processed requests:      4"))
    assert(out.contains("Rejected requests:       0"))
    assert(out.contains("Queuing time P99:"))
    assert(out.contains("api_1:"), "API usage block missing")
    assert(out.contains("priority:"), "queue totals block missing")
  }

  test("--fifo -q 1 with one worker makes rejection reachable and reported") {
    // burst of simultaneous arrivals against a 1-slot queue: at most
    // (in-flight + queued) survive, the rest reject
    val burst =
      """user_id,request_time,processing_time
        |u1,2023-01-01T00:00:00.000000Z,5.0
        |u2,2023-01-01T00:00:00.000000Z,5.0
        |u3,2023-01-01T00:00:00.000000Z,5.0
        |u4,2023-01-01T00:00:00.000000Z,5.0
        |""".stripMargin
    val (out, _) = runCapturing(csv(burst), "-w", "1", "-q", "1", "--fifo")
    val rejected = "Rejected requests:\\s+(\\d+)".r
      .findFirstMatchIn(out).map(_.group(1).toInt).getOrElse(-1)
    assert(rejected > 0, s"expected rejections in:\n$out")
  }

  test("malformed CSV reports the reference's error message, no report") {
    val bad = csv(
      """user_id,request_time,processing_time
        |u1,not-a-time,1.0
        |""".stripMargin)
    val (out, err) = runCapturing(bad)
    assert(err.contains("CSV file format is invalid"))
    assert(!out.contains("Simulation statistics"))
  }

  test("animation mode prints frame gauges and the same report totals") {
    // the sleep default is 0.7 ms per frame — small enough to run the
    // 4-row fixture unthrottled without touching the env knob
    val (out, err) = runCapturing(csv(fourRows), "-w", "2", "--animation")
    assert(!err.contains("Error:"), err)
    assert(out.contains("[t="), "no animation frames printed")
    assert(out.contains("Processed requests:      4"))
  }
}
