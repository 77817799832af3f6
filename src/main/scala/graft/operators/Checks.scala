package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality gates for lake tables — the expectation checks an ingest
  * pipeline runs before publishing a partition (dbt-test / Delta-
  * constraint shape, engine-native).
  *
  * All row-level rules evaluate in ONE pass over the table: each rule
  * becomes a conditional-count aggregate, so adding a rule never adds a
  * scan. Uniqueness is the exception by nature (it needs a keyed
  * aggregate) and runs as its own groupBy, reported in the same result
  * shape.
  */
object Checks {

  /** One scan, one row per rule: (rule, n_violations) for every named
    * predicate that rows are EXPECTED to satisfy.
    */
  def rowChecks(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "no rules")
    val counters = rules.map { case (name, expect) =>
      struct(
        lit(name).as("rule"),
        // outer coalesce: an EMPTY table has zero violations, not null
        coalesce(sum(when(!coalesce(expect, lit(false)), 1L).otherwise(0L)), lit(0L))
          .as("n_violations")
      )
    }
    df.agg(array(counters.head +: counters.tail: _*).as("c"))
      .select(explode(col("c")).as("r"))
      .select(col("r.rule"), col("r.n_violations"))
  }

  /** Duplicate-key report in the same (rule, n_violations) shape:
    * violations = number of EXTRA rows beyond one per key.
    */
  def uniqueCheck(df: DataFrame, ruleName: String, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .agg(
        coalesce(sum(col("n") - 1), lit(0L)).as("n_violations")
      )
      .select(lit(ruleName).as("rule"), col("n_violations"))

  /** Column PROFILING in one scan — the discovery half of data quality
    * (the stats a platform surfaces before anyone writes rules): per
    * column, null count, exact distinct count, min and max (as strings,
    * so heterogeneous columns share one result schema). All columns'
    * aggregates ride a single `agg` call, so profiling N columns costs
    * one table pass (count_distinct adds the standard expand — still one
    * scan), and the per-column rows come from exploding the aggregated
    * struct array, never from per-column jobs.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "no columns to profile")
    val stats = cols.map { c =>
      struct(
        lit(c).as("column"),
        coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L)).as("n_nulls"),
        count_distinct(col(c)).as("n_distinct"),
        min(col(c)).cast("string").as("min_s"),
        max(col(c)).cast("string").as("max_s")
      )
    }
    df.agg(array(stats.head +: stats.tail: _*).as("s"))
      .select(explode(col("s")).as("r"))
      .select(col("r.column"), col("r.n_nulls"), col("r.n_distinct"), col("r.min_s"), col("r.max_s"))
  }

  /** BENFORD first-digit audit of a positive money/measure column — the
    * classic synthetic-data / fraud smell test. Digits are extracted by
    * integer-cents string arithmetic (`round(x·100) → BIGINT → first
    * char`), never float log10, so the digit of every value is exact on
    * both engines; expected mass log10(1+1/d) is derived in-engine from
    * exact literals (one ln ratio — the γ-constant idiom). χ² accrues
    * per digit: one scan, 9-row output.
    *
    * Output: (digit, obs, expected_p, chi2_term) — Σ chi2_term is the
    * statistic; emitting the addends keeps every column scalar and lets
    * the caller pick any significance threshold.
    */
  def benfordDigits(df: DataFrame, valueCol: String): DataFrame = {
    val digit = substring(
      round(col(valueCol) * 100, 0).cast("long").cast("string"), 1, 1)
      .cast("int")
    val obs = df
      .filter(col(valueCol) > 0)
      .groupBy(digit.as("digit"))
      .agg(count(lit(1)).as("obs"))
    val tot = obs.agg(sum(col("obs")).as("n"))
    obs
      .crossJoin(broadcast(tot))
      .withColumn("expected_p",
        log(lit(1.0) + lit(1.0) / col("digit")) / log(lit(10.0)))
      .select(
        col("digit"), col("obs"),
        round(col("expected_p"), 6).as("expected_p"),
        round(
          pow(col("obs").cast("double") / col("n") - col("expected_p"), 2)
            / col("expected_p") * col("n"),
          6).as("chi2_term"))
  }

  /** Row rules + uniqueness rules, one result table. */
  def run(
      df: DataFrame,
      rowRules: Seq[(String, Column)],
      uniqueRules: Seq[(String, Seq[String])] = Nil
  ): DataFrame =
    uniqueRules.foldLeft(rowChecks(df, rowRules)) { case (acc, (name, keys)) =>
      acc.unionByName(uniqueCheck(df, name, keys))
    }
}
