package graft

import org.scalatest.funsuite.AnyFunSuite

/** The streaming-stateful sim must agree with the batch scenario fan-out
  * on a bounded replay (same deterministic core, different host).
  */
class StreamingSimSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("flatMapGroupsWithState sim ≡ batch scenario fan-out on bounded input") {
    def canon(rows: Array[org.apache.spark.sql.Row]): Set[String] =
      rows.map(_.mkString("|")).toSet
    val streaming = SparkEntry.queries("q40_stream_sim")(spark, sfDir).collect()
    val batch = SparkEntry.queries("q39_sim_scenarios")(spark, sfDir).collect()
    assert(streaming.nonEmpty)
    assert(canon(streaming) == canon(batch))
  }
}
