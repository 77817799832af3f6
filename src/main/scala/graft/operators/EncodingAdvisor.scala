package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Column-encoding advisor: for each audited column, estimate the
  * bytes parquet would spend under the three encodings that matter —
  * PLAIN, DICTIONARY (dict page + fixed-width codes), and
  * RLE-DICTIONARY (dict page + run-length runs of codes, parquet's
  * actual dictionary-index encoding) — under the table's declared sort
  * layout, and name the winner. This is the "is this table laid out
  * right?" audit that decides sort keys and dictionary thresholds
  * before a 100 TB rewrite ([[graft.sources.LakeWriter]] being the
  * rewrite side).
  *
  * Every estimate is EXACT integer arithmetic from three facts per
  * column: row count, the distinct-value page (count + total value
  * bytes, one keyed aggregate), and the RUN count under the layout
  * (adjacent-change count via lag over the SORT-KEY-partitioned
  * window — partitioned by the layout's coarse key, so the window is
  * partition-parallel; runs that straddle a partition boundary are
  * counted conservatively as new runs, exactly as a parquet page
  * boundary would). Code width is the when-chain ⌈⌈log₂ d⌉/8⌉ —
  * branchless float logs would wobble at exact powers of two.
  *
  * Input contract: audited columns are non-null (the lake's NOT NULL
  * core columns; a null would need a definedness-levels stream that
  * parquet prices separately anyway).
  *
  * Output: (col_name, n, n_distinct, n_runs, plain_bytes, dict_bytes,
  * rle_bytes, advice).
  */
object EncodingAdvisor {

  /** @param df       table to audit
    * @param cols     (column name, fixed byte width; 0 = variable/string,
    *                 priced by octet length)
    * @param partCol  coarse layout key (window partition — keeps the
    *                 run-count window distributed)
    * @param ordCol   intra-partition order of the layout
    */
  def advise(
      df: DataFrame,
      cols: Seq[(String, Int)],
      partCol: String,
      ordCol: String
  ): DataFrame = {
    val melted = df
      .select(
        col(partCol).as("__p"),
        col(ordCol).as("__o"),
        explode(array(cols.map { case (c, wBytes) =>
          struct(
            lit(c).as("col_name"),
            lit(wBytes).as("w"),
            col(c).cast("string").as("v"))
        }: _*)).as("m"))
      .select(col("__p"), col("__o"), col("m.col_name"), col("m.w"), col("m.v"))
    // The value itself is the FINAL order tie-break: if (partCol, ordCol)
    // is not a unique key, equal-key rows would otherwise order
    // nondeterministically and the run count would not replay. Grouping
    // equal values inside a tied key is also what a layout writer would
    // actually do for RLE.
    val w = Window.partitionBy(col("col_name"), col("__p")).orderBy(col("__o"), col("v"))
    val runs = melted
      .withColumn("__chg",
        when(lag(col("v"), 1).over(w).isNull || col("v") =!= lag(col("v"), 1).over(w), 1L)
          .otherwise(0L))
      .groupBy(col("col_name"))
      .agg(
        count(lit(1)).as("n"),
        max(col("w")).as("w"),
        sum(col("__chg")).as("n_runs"),
        sum(octet_length(col("v"))).as("str_bytes"))
    val dict = melted
      .groupBy(col("col_name"), col("v"))
      .agg(max(col("w")).as("w"))
      .groupBy(col("col_name"))
      .agg(
        count(lit(1)).as("n_distinct"),
        sum(when(col("w") === 0, octet_length(col("v"))).otherwise(col("w")))
          .as("dict_data_bytes"))
    val codeBytes =
      when(col("n_distinct") <= 256L, 1L)
        .when(col("n_distinct") <= 65536L, 2L)
        .when(col("n_distinct") <= 16777216L, 3L)
        .otherwise(4L)
    val est = runs
      .join(dict, Seq("col_name"))
      .select(
        col("col_name"), col("n"), col("n_distinct"), col("n_runs"),
        when(col("w") > 0, col("n") * col("w")).otherwise(col("str_bytes"))
          .as("plain_bytes"),
        (col("dict_data_bytes") + col("n") * codeBytes).as("dict_bytes"),
        (col("dict_data_bytes") + col("n_runs") * (codeBytes + lit(4L))).as("rle_bytes"))
    est.select(
      col("col_name"), col("n"), col("n_distinct"), col("n_runs"),
      col("plain_bytes"), col("dict_bytes"), col("rle_bytes"),
      when(col("rle_bytes") <= col("dict_bytes") && col("rle_bytes") <= col("plain_bytes"),
        lit("rle_dict"))
        .when(col("dict_bytes") <= col("plain_bytes"), lit("dict"))
        .otherwise(lit("plain")).as("advice"))
  }
}
