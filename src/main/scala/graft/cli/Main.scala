package graft.cli

import org.apache.spark.sql.SparkSession

import graft.model.{FifoConfig, PriorityConfig, SimConfig}
import graft.sim.SimOperator
import graft.sources.RequestCsv
import graft.stats.Statistics

/** CLI entry mirroring the reference product pipeline (X1,
  * reference: main.py:16-159): CSV → enrich → simulate → statistics →
  * report.
  *
  * Flags: `<csv_file> [-w N] [-q M] [--fifo]`.
  * `-q` only binds with `--fifo` — faithfully to the reference, the
  * default priority strategy has no capacity bound (its is_full() ≡ false,
  * src/queue_manager.py:249-256), so `-q` alone is accepted-and-inert
  * exactly like the original; `--fifo` selects the bounded FIFO discipline
  * where rejection is reachable (SURVEY §4.1).
  */
object Main {

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println(
        "usage: graft.cli.Main <csv_file> [-w N] [-q M] [--fifo] [--animation]")
      sys.exit(2)
    }
    val spark = SparkSession
      .builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-sim")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, args)
    finally spark.stop()
  }

  /** The whole pipeline against a CALLER-OWNED session — separated from
    * `main` so the CLI is end-to-end testable in-process (a test must not
    * let the CLI stop the shared SparkContext).
    */
  def run(spark: SparkSession, args: Array[String]): Unit = {
    require(args.nonEmpty, "run() needs at least the csv path")
    val csvFile = args(0)
    def intFlag(names: Set[String]): Option[Int] =
      args.sliding(2).collectFirst {
        case Array(f, v) if names(f) => v.toInt
      }
    val numWorkers = intFlag(Set("-w", "--num_workers")).getOrElse(1)
    val queueSize = intFlag(Set("-q", "--queue_size"))
    val useFifo = args.contains("--fifo")
    val animation = args.contains("--animation")

    {
      val requests =
        try RequestCsv.read(spark, csvFile)
        catch {
          case e: RequestCsv.CsvParseException =>
            System.err.println(s"Error: CSV file format is invalid. Detail: ${e.message}")
            return
          case e: org.apache.spark.sql.AnalysisException if e.getMessage.contains("PATH_NOT_FOUND") =>
            System.err.println(s"Error: CSV file '$csvFile' not found.")
            return
        }

      val total = requests.count()
      if (total == 0) {
        println("No request data in CSV; nothing to simulate.")
        return
      }

      val cfg = SimConfig(
        numWorkers = numWorkers,
        strategy = if (useFifo) FifoConfig(queueSize) else PriorityConfig()
      )
      val completed =
        if (animation) {
          // Animation mode (E2, reference src/simulator.py:148-193): the
          // fixed-step loop with per-frame console gauges is a driver-side
          // presentation of the same transition function; wall-clock scale
          // is 24 h simulated = 60 s real (sleep = interval / 1440,
          // src/simulator.py:44-45). GRAFT_ANIMATION_SLEEP=0 disables
          // pacing (tests).
          val sleepMs =
            sys.env.get("GRAFT_ANIMATION_SLEEP").map(_.toDouble).getOrElse(1.0 / 1440 * 1000)
          val rows = requests.collect()
          val out = graft.sim.SimCore
            .runFixedStep(cfg, rows.iterator, interval = 1.0, onFrame = f => {
              println(
                f"[t=${f.currentTime}%9.2f] pending=${f.pendingCount}%5d queued=${f.queuedCount}%5d " +
                  f"active=${f.activeWorkers}%3d/${numWorkers} completed=${f.completedCount}%5d"
              )
              if (sleepMs > 0) Thread.sleep(sleepMs.toLong)
            })
            .toSeq
          import spark.implicits._
          spark.createDataset(out)
        } else SimOperator.simulate(requests, cfg)
      val completedDF = Statistics.toDF(completed).cache()
      val s = Statistics.summary(completedDF).collect()(0)
      val usage = Statistics
        .apiUsage(completedDF, cfg.numApis)
        .orderBy("api_id")
        .collect()

      def fmt(d: Double): String = if (d.isNaN) "N/A" else f"$d%.4f"
      println("\n--- Simulation statistics ---")
      println(s"  Total requests (input):  $total")
      println(s"  Processed requests:      ${s.getAs[Long]("total_requests_processed")}")
      println(s"  Rejected requests:       ${s.getAs[Long]("total_requests_rejected")}")
      println(s"  Average queuing time:    ${fmt(s.getAs[Double]("average_queuing_time"))}")
      println(s"  Queuing time P50:        ${fmt(s.getAs[Double]("p50"))}")
      println(s"  Queuing time P75:        ${fmt(s.getAs[Double]("p75"))}")
      println(s"  Queuing time P90:        ${fmt(s.getAs[Double]("p90"))}")
      println(s"  Queuing time P99:        ${fmt(s.getAs[Double]("p99"))}")
      println("\n  --- API usage ---")
      usage.foreach(r => println(s"    ${r.getAs[String]("api_id")}: ${r.getAs[Long]("n_used")}"))
      println("\n  --- Queue totals (enqueued) ---")
      println(s"    priority: ${s.getAs[Long]("priority_queue_enqueued_total")}")
      println(s"    normal:   ${s.getAs[Long]("normal_queue_enqueued_total")}")
      println("-----------------------------\n")
    }
  }
}
