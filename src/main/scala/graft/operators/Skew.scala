package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: two-phase salted aggregation.
  *
  * A single hot key funnels its entire partition through one reducer; the
  * salt spreads phase 1 across `saltBuckets` reducers (map-side partials
  * still apply), and phase 2 merges the per-salt partials — tiny, one row
  * per (key, salt). Result is identical to the unsalted groupBy for any
  * algebraic aggregate (sum/count/min/max), which is exactly what the
  * DuckDB oracle checks. AQE's skew-join splitting covers joins; this
  * covers aggregation skew, which AQE does not rebalance.
  */
object Skew {

  /** count + sum(valueCol) by keyCols, salt-spread. */
  def saltedCountSum(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      saltBuckets: Int = 16
  ): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val phase1 = salted
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__cnt"), sum(col(valueCol)).as("__sum"))
    phase1
      .groupBy(keyCols.map(col): _*)
      .agg(
        sum(col("__cnt")).cast("long").as("n_rows"),
        round(sum(col("__sum")), 2).as("sum_value")
      )
  }

  /** SALTED EQUI-JOIN for skewed fact keys — the manual form of AQE's
    * skew-join split, for when the skew is known up front (or the build
    * side must stay a shuffle join): the fact side gets a deterministic
    * salt in [0, salts) hashed from a row-identity column, the dim side
    * is replicated once per salt value, and the join key becomes
    * (key, salt) — a hot key's rows now land on `salts` reducers instead
    * of one. Row-for-row identical to the unsalted inner join; costs a
    * `salts`× blow-up OF THE DIM SIDE only, so size salts to the skew,
    * not the cluster.
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      idCol: String,
      salts: Int = 8
  ): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltedFact = fact.withColumn(
      "__salt", pmod(xxhash64(col(idCol)), lit(salts.toLong)).cast("int"))
    val saltedDim = dim.withColumn(
      "__salt", explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }
}
