package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Feature discretization for training pipelines. */
object Binning {

  /** Equi-depth (quantile) binning: exact percentile boundaries from ONE
    * aggregate, broadcast back, row-local assignment by counting
    * boundaries strictly below the value — no global sort, no ntile
    * window over the corpus (the difference between this and `ntile` is
    * exactly what survives 100 TB: boundaries are a constant-size
    * reduce, assignment is scan-local). Bin b holds values in
    * (q_b, q_{b+1}]; exact ties share a bin on both engines because the
    * comparison is the same strict `>` on the same boundary doubles.
    *
    * Output per bin: (bin, n, lo, hi).
    */
  def equiDepth(df: DataFrame, valueCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 2, "bins must be >= 2")
    val qs = (1 until bins).map(i => i.toDouble / bins)
    val b = df.agg(
      expr(s"percentile($valueCol, array(${qs.mkString(", ")}))").as("bs"))
    df.crossJoin(broadcast(b))
      .select(
        col(valueCol).as("v"),
        size(filter(col("bs"), x => col(valueCol) > x)).cast("long").as("bin"))
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n"),
        round(min(col("v")), 6).as("lo"),
        round(max(col("v")), 6).as("hi"))
  }
}
