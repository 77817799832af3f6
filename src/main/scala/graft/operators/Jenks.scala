package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Jenks natural breaks / v-optimal 1-D binning: split a value
  * distribution into k=4 classes minimizing total within-class SSE —
  * the choropleth/quantization classic — computed ENTIRELY
  * relationally: the O(B²k) dynamic program runs as three join+argmin
  * stages over the B-bin histogram (B is bounded by the value RANGE,
  * not the row count, so corpus scale only affects the one histogram
  * aggregation).
  *
  * Exactness contract: prefix sums are exact longs; each class cost
  * SSE(j,i) = ss − s²/n is ONE fixed float expression of those longs;
  * DP values are ≤ 4-term pairwise additions and argmins of
  * deterministically-identical doubles, so a relational oracle
  * replays every break decision without any grid snapping (there are
  * no order-dependent float SUMS anywhere). Argmin ties break toward
  * the smallest split index via (cost, j) lexicographic min.
  */
object Jenks {

  /** Natural breaks of `values(v: BIGINT)` histogrammed at `binWidth`.
    *
    * Output: one row per class c ∈ 1..4 — (class, lo_edge, hi_edge,
    * n_rows, mean) where edges are bin-width multiples (hi inclusive
    * of the class's last bin).
    */
  def naturalBreaks4(values: DataFrame, binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val vcol = values.columns.head
    val hist = values
      .select(expr(s"$vcol div $binWidth").as("bin"), col(vcol).as("v"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("nb"), sum(col("v")).as("sb"), sum(col("v") * col("v")).as("ssb"))
    val wOrd = Window.orderBy(col("bin"))
    val pre0 = hist
      .withColumn("i", row_number().over(wOrd).cast("long"))
      .withColumn("cn", sum(col("nb")).over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("cs", sum(col("sb")).over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("css", sum(col("ssb")).over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("i"), col("bin"), col("nb"), col("sb"), col("cn"), col("cs"), col("css"))
      .localCheckpoint() // histogram-sized; consumed by every DP stage
    val zero = pre0.sparkSession.range(1).select(
      lit(0L).as("i"), lit(Long.MinValue).as("bin"), lit(0L).as("nb"), lit(0L).as("sb"),
      lit(0L).as("cn"), lit(0L).as("cs"), lit(0L).as("css"))
    val pre = pre0.unionByName(zero)

    // SSE of rows (j..i] from prefix diffs — one fixed float expression
    def cost(j: String, i: String): Column = {
      val n = col(s"$i.cn") - col(s"$j.cn")
      val s = col(s"$i.cs") - col(s"$j.cs")
      val ss = col(s"$i.css") - col(s"$j.css")
      ss.cast("double") - s.cast("double") * s.cast("double") / n.cast("double")
    }

    // D1(i) = cost(0, i]
    val d1 = pre.as("i").join(zero.as("j"), col("i.i") > col("j.i"))
      .select(col("i.i").as("i"), cost("j", "i").as("d"))

    // Dm(i) = min over j of D_{m-1}(j) + cost(j, i], argmin kept
    def stage(prev: DataFrame, m: Int): DataFrame = {
      val pairs = pre.as("i").join(prev.as("p"), col("p.i") < col("i.i") && col("p.i") >= (m - 1))
        .join(pre.as("j"), col("j.i") === col("p.i"))
        .select(col("i.i").as("i"), col("p.i").as("j"), (col("p.d") + cost("j", "i")).as("v"))
      // single-pass argmin: min over struct is (v, j)-lexicographic, which
      // IS the (cost, smallest-split) tie-break — one aggregation instead
      // of a min + equality-join re-pass
      pairs.groupBy(col("i")).agg(min(struct(col("v"), col("j"))).as("mv"))
        .select(col("i"), col("mv.v").as("d"), col("mv.j").as("arg"))
    }
    val d1k = d1.select(col("i"), col("d")).localCheckpoint()
    val d2 = stage(d1k, 2).localCheckpoint()
    val d3 = stage(d2, 3).localCheckpoint()
    val d4 = stage(d3, 4).localCheckpoint()

    // backtrack from the last row index B
    val bMax = pre0.agg(max(col("i")).as("b"))
    val b3 = d4.join(bMax, d4("i") === bMax("b")).select(col("arg").as("b3"))
    val b2 = d3.join(b3, d3("i") === b3("b3")).select(col("arg").as("b2"), col("b3"))
    val b1 = d2.join(b2, d2("i") === b2("b2")).select(col("arg").as("b1"), col("b2"), col("b3"))
    val breaks = b1.crossJoin(bMax) // (b1, b2, b3, b)

    // class assignment per histogram row -> per-class stats + edges
    pre0.crossJoin(broadcast(breaks))
      .withColumn(
        "class",
        when(col("i") <= col("b1"), 1L)
          .when(col("i") <= col("b2"), 2L)
          .when(col("i") <= col("b3"), 3L)
          .otherwise(4L))
      .groupBy(col("class"))
      .agg(
        (min(col("bin")) * binWidth).as("lo_edge"),
        ((max(col("bin")) + 1L) * binWidth - 1L).as("hi_edge"),
        sum(col("nb")).as("n_rows"),
        sum(col("sb")).as("sum_v"))
      .select(
        col("class"), col("lo_edge"), col("hi_edge"), col("n_rows"),
        round(col("sum_v").cast("double") / col("n_rows").cast("double"), 6).as("mean"))
  }
}
