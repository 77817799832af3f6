package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry
import graft.plans.PlanGuard

/** Dev audit: runs [[PlanGuard.forcedBroadcastOffenders]] over every
  * registered catalogue query and prints the hits — the scan behind the
  * QueriesSmokeSpec broadcast gate's whitelist. Not part of the driver
  * contract — run with `sbt 'runMain graft.tools.BroadcastAudit <sfDir>'`.
  */
object BroadcastAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    var flagged = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val bad = PlanGuard.forcedBroadcastOffenders(df)
        if (bad.nonEmpty) {
          flagged += 1; println(s"FLAG $name: ${bad.mkString("; ")}")
          if (args.contains("-v")) {
            import org.apache.spark.sql.catalyst.plans.logical
            df.queryExecution.optimizedPlan.foreach {
              case j: logical.Join =>
                def hinted(h: Option[logical.HintInfo]) =
                  h.exists(_.strategy.contains(logical.BROADCAST))
                if (hinted(j.hint.leftHint) && !PlanGuard.isBoundedLogical(j.left))
                  println(j.left.treeString.linesIterator.take(6).map("  L| " + _).mkString("\n"))
                if (hinted(j.hint.rightHint) && !PlanGuard.isBoundedLogical(j.right))
                  println(j.right.treeString.linesIterator.take(6).map("  R| " + _).mkString("\n"))
              case _ =>
            }
          }
        }
      } catch {
        case e: Throwable => println(s"ERR  $name: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    println(s"flagged: $flagged / ${SparkEntry.queries.size}")
    spark.stop()
  }
}
