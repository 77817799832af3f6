package graft.operators

import org.apache.spark.sql.DataFrame

/** Scan-parallelism guard (r13 optimization round, guide §2.5/§6).
  *
  * The bench inputs are SINGLE-ROW-GROUP parquet files, so every file
  * scan is one task no matter what `spark.sql.files.maxPartitionBytes`
  * says (splits can't cut a row group) — and any expensive per-row work
  * that sits between the scan and the first exchange (md5 digests,
  * shingle/signature kernels, HOF pipelines) runs on ONE core of the 32.
  * At lake scale the same scans carry thousands of row groups and
  * parallelize by themselves, so an unconditional `repartition(n)` there
  * would be a pure full-relation shuffle tax.
  *
  * `spread` is the scale-adaptive middle: round-robin repartition to the
  * session's default parallelism ONLY when the plan's current partition
  * count is below it. Locally that unlocks the other 31 cores for the
  * kernel work at the cost of shuffling the (projected, narrow) input
  * once; on a many-split production scan it returns the frame unchanged.
  * Callers project to the needed columns FIRST (guide §2.3 — the shuffle
  * should carry keys and payload actually consumed by the kernel).
  */
object Par {
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // getNumPartitions plans (but does not run) the frame; cheap relative
    // to the kernels this guards.
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }
}
