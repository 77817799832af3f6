package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.graftbridge.SqlBridge

import graft.operators.{Dedup, Winnow}
import graft.sources.Tables

/** r11 hygiene gate: library operators that cache corpus-sized
  * intermediates must release them before returning (cache speed during
  * the computation, zero residual cached partitions after — the pattern
  * that fixed the q243 regression without re-importing the r10 leak).
  * `localCheckpoint` persists live in the RDD layer and are
  * ContextCleaner-collected with their DataFrame, so output-sized
  * checkpoints don't trip the probe.
  */
class CacheHygieneSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def assertNoDfCaches(label: String): Unit =
    assert(SqlBridge.cacheManagerIsEmpty(spark),
      s"$label left DataFrame-level cache entries behind")

  test("ngramJaccardPairs releases its shingle/prefix caches") {
    spark.catalog.clearCache()
    val pairs = Dedup.ngramJaccardPairs(Tables.documents(spark, sfDir))
    assertNoDfCaches("ngramJaccardPairs (eager path)")
    assert(pairs.count() > 0)
    assertNoDfCaches("ngramJaccardPairs (after terminal action)")
  }

  test("containmentPairs releases its shingle cache") {
    spark.catalog.clearCache()
    val pairs = Dedup.containmentPairs(Tables.documents(spark, sfDir))
    assertNoDfCaches("containmentPairs (eager path)")
    assert(pairs.count() > 0)
    assertNoDfCaches("containmentPairs (after terminal action)")
  }

  test("Winnow.overlapPairs leaves no cached partitions") {
    spark.catalog.clearCache()
    val pairs = Winnow.overlapPairs(Tables.documents(spark, sfDir))
    assert(pairs.count() > 0)
    assertNoDfCaches("Winnow.overlapPairs")
  }
}
