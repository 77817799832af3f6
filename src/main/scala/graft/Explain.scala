package graft

import org.apache.spark.sql.SparkSession

/** Plan-capture tool for the optimization rounds: writes
  * `.explain("formatted")` for each named query to
  * `<outDir>/<name>_<tag>.txt` so plan claims in OPTIMIZATION_r*.md are
  * checkable without running Spark.
  *
  * Usage: sbt "runMain graft.Explain <sfDir> <outDir> <tag> q1_agg,q2_..."
  * (query list may also come from SPARK_GRAFT_ONLY; args win).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val tag = args(2)
    val names: Seq[String] =
      (if (args.length > 3) args(3) else sys.env.getOrElse("SPARK_GRAFT_ONLY", ""))
        .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[explain] unknown query: $name")
        case Some(fn) =>
          try {
            val df = fn(spark, sfDir)
            val txt = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            java.nio.file.Files.writeString(
              java.nio.file.Paths.get(s"$outDir/${name}_$tag.txt"), txt)
            System.err.println(s"[explain] wrote $outDir/${name}_$tag.txt")
          } catch {
            case e: Throwable =>
              System.err.println(s"[explain] $name failed: ${e.getMessage}")
          } finally spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
