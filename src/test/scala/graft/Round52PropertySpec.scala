package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-52 differential sweeps — driver references for the catalogue
  * churn set algebra, the orphan counts, the trailing-median SLA walk
  * and the PK uniqueness sweep. Independent Scala recomputation from
  * collected rows.
  */
class Round52PropertySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def snapD(x: Double): Double =
    math.floor(x * 1073741824.0 + 0.5) / 1073741824.0

  // ---------------------------------------------------------------- q571

  test("q571 catalog churn equals the driver set algebra") {
    val rows = graft.sources.Tables.lineitem(spark, sfDir)
      .selectExpr("year(CAST(l_shipdate AS TIMESTAMP)) AS y", "l_partkey", "l_suppkey")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val byYear = rows.groupBy(_._1).map { case (y, xs) => y -> xs.map(t => (t._2, t._3)) }
    val years = byYear.keys.toSeq.sorted
    val expected = years.tail.map { y =>
      val prev = byYear.getOrElse(y - 1, Set.empty[(Long, Long)])
      val cur = byYear.getOrElse(y, Set.empty[(Long, Long)])
      val added = (cur diff prev).size.toLong
      val removed = (prev diff cur).size.toLong
      val retained = (cur intersect prev).size.toLong
      (y, added, removed, retained,
        snapD(retained.toDouble / (added + removed + retained)))
    }
    val got = SparkEntry.queries("q571_catalog_churn")(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(got == expected, s"got $got expected $expected")
    got.foreach(r => assert(r._5 >= 0.0 && r._5 <= 1.0))
  }

  // ---------------------------------------------------------------- q572

  test("q572 orphan audit equals the driver anti-join counts") {
    def keys(table: String, col: String): Set[Long] =
      graft.sources.Tables.table(spark, sfDir, table)
        .selectExpr(s"CAST($col AS BIGINT) AS k").collect().map(_.getLong(0)).toSet
    def childKeys(table: String, col: String): Seq[Long] =
      (if (table == "events") graft.sources.Tables.events(spark, sfDir)
       else graft.sources.Tables.table(spark, sfDir, table))
        .selectExpr(s"CAST($col AS BIGINT) AS k").collect().map(_.getLong(0)).toSeq
    val edges = Seq(
      ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
      ("events->customer", "events", "user_id", "customer", "c_custkey"),
      ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
      ("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
      ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
      ("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"))
    val expected = edges.map { case (name, ct, ck, pt, pk) =>
      val parents = keys(pt, pk)
      val children = childKeys(ct, ck)
      val orphans = children.count(k => !parents.contains(k)).toLong
      (name, children.length.toLong, orphans,
        snapD(orphans.toDouble / children.length))
    }
    val got = SparkEntry.queries("q572_orphan_audit")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got == expected, s"got $got expected $expected")
  }

  // ---------------------------------------------------------------- q573

  test("q573 completeness SLA equals the trailing-median walk") {
    val ds = graft.sources.Tables.events(spark, sfDir)
      .selectExpr("unix_micros(ts) AS us").collect()
      .map(r => Math.floorDiv(r.getLong(0), 86400000000L))
    val cnt = ds.groupBy(identity).map { case (d, xs) => d -> xs.length.toLong }
    val series = (ds.min to ds.max).map(d => cnt.getOrElse(d, 0L))
    val expected = (7 until series.length).flatMap { i =>
      val window = (i - 7 until i).map(series(_)).sorted
      val med = window(3) // lower median of 7 = 4th smallest
      if (med > 0)
        Some((i.toLong, series(i), med,
          snapD(series(i).toDouble / med),
          if (2 * series(i) < med) 1 else 0))
      else None
    }
    val got = SparkEntry.queries("q573_completeness_sla")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getInt(4))).toSeq
    assert(got == expected, s"got $got expected $expected")
  }

  // ---------------------------------------------------------------- q574

  test("q574 PK uniqueness equals the driver distinct counts") {
    def simple(table: String, col: String): (Long, Long) = {
      val ks = (if (table == "events") graft.sources.Tables.events(spark, sfDir)
                else graft.sources.Tables.table(spark, sfDir, table))
        .selectExpr(s"CAST($col AS BIGINT) AS k").collect().map(_.getLong(0))
      (ks.length.toLong, ks.distinct.length.toLong)
    }
    val li = graft.sources.Tables.lineitem(spark, sfDir)
      .selectExpr("l_orderkey * 1000000 + l_linenumber AS k").collect()
      .map(_.getLong(0))
    val tables = Seq(
      ("customer", simple("customer", "c_custkey")),
      ("documents", simple("documents", "doc_id")),
      ("events", simple("events", "event_id")),
      ("lineitem", (li.length.toLong, li.distinct.length.toLong)),
      ("nation", simple("nation", "n_nationkey")),
      ("orders", simple("orders", "o_orderkey")),
      ("part", simple("part", "p_partkey")),
      ("region", simple("region", "r_regionkey")),
      ("supplier", simple("supplier", "s_suppkey")))
    val expected = tables.map { case (n, (rows, keys)) =>
      (n, rows, keys, rows - keys, if (rows == keys) 1 else 0)
    }
    val got = SparkEntry.queries("q574_pk_uniqueness")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getInt(4))).toSeq
    assert(got == expected, s"got $got expected $expected")
    // the composite lineitem key is honestly non-unique in this corpus
    assert(got.find(_._1 == "lineitem").exists(_._5 == 0))
  }
}
