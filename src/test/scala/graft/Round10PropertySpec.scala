package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.queries.Round10
import graft.sources.Tables

/** Differential checks for the round-10 query statistics: each
  * relational result is recomputed with an independent driver-side
  * brute-force reference (explicit sorts, sequential folds, O(n²)
  * pair scans) over the same sf0.001 tables. The DuckDB oracle
  * replays the relational formulation; these sweeps validate the
  * MATH behind it.
  */
class Round10PropertySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("kendall tau-b == O(n^2) driver reference on the weekly series") {
    val weekly = Tables.orders(spark, sfDir)
      .select(
        expr("CAST(datediff(to_date(o_orderdate), DATE '1992-01-01') AS BIGINT) div 7")
          .as("w"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("x"), sum(col("cents")).as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    var s = 0L; var tx = 0L; var ty = 0L; var n0 = 0L
    for (i <- weekly.indices; j <- (i + 1) until weekly.length) {
      val (_, xi, yi) = weekly(i); val (_, xj, yj) = weekly(j)
      n0 += 1
      s += java.lang.Long.signum(xj - xi).toLong * java.lang.Long.signum(yj - yi)
      if (xi == xj) tx += 1
      if (yi == yj) ty += 1
    }
    val tau = s.toDouble / math.sqrt((n0 - tx).toDouble * (n0 - ty).toDouble)
    val got = Round10.q339KendallTau.fn(spark, sfDir).collect().head
    assert(got.getLong(0) === weekly.length.toLong)
    assert(got.getLong(1) === s)
    assert(math.abs(got.getDouble(2) - tau) < 1e-6)
  }

  test("kruskal-wallis H == sort-based midrank reference") {
    val vals = Tables.orders(spark, sfDir)
      .select(col("o_orderpriority"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val n = vals.length
    val sorted = vals.map(_._2).sorted
    // midrank of value v via first/last occurrence in the sorted array
    val first = scala.collection.mutable.HashMap[Long, Int]()
    val count = scala.collection.mutable.HashMap[Long, Int]()
    for ((v, i) <- sorted.zipWithIndex) {
      if (!first.contains(v)) first(v) = i + 1
      count(v) = count.getOrElse(v, 0) + 1
    }
    def midrank(v: Long): Double = first(v) + (count(v) - 1) / 2.0
    val groups = vals.groupBy(_._1)
    val st = groups.values.map { g =>
      val rbar = g.map(x => midrank(x._2)).sum / g.length
      g.length * rbar * rbar / (n.toDouble * (n + 1))
    }.sum
    val tie3 = count.values.map(t => t.toLong * t * t - t).sum
    val h = (12.0 * st - 3.0 * (n + 1)) /
      (1.0 - tie3.toDouble / (n.toLong * n * n - n))
    val got = Round10.q340KruskalWallis.fn(spark, sfDir).collect().head
    assert(got.getLong(0) === groups.size.toLong)
    assert(got.getLong(1) === n.toLong)
    assert(math.abs(got.getDouble(2) - h) < 1e-5)
  }

  test("max drawdown == sequential fold over the day spine") {
    val daily = Tables.events(spark, sfDir)
      .groupBy(to_date(col("ts")).as("d"))
      .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("net"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
      .sortBy(_._1.toEpochDay)
    val d0 = daily.head._1.toEpochDay
    val d1 = daily.last._1.toEpochDay
    val byDay = daily.map { case (d, v) => d.toEpochDay -> v }.toMap
    var cum = 0L; var peak = Long.MinValue; var mdd = 0L
    var troughDay = 0L; var peakAt = 0L
    for (d <- d0 to d1) {
      cum += byDay.getOrElse(d, 0L)
      if (cum > peak) peak = cum
      val dd = peak - cum
      if (dd > mdd) { mdd = dd; troughDay = d; peakAt = peak }
    }
    if (mdd == 0L) { troughDay = d0; peakAt = byDay(d0) } // dd=0 everywhere: earliest day
    val got = Round10.q341MaxDrawdown.fn(spark, sfDir).collect().head
    assert(got.getLong(0) === (d1 - d0 + 1))
    assert(got.getLong(1) === mdd)
    assert(got.getDate(2).toLocalDate.toEpochDay === troughDay)
    assert(got.getLong(3) === peakAt)
  }

  test("friedman chi2 == per-block rank reference on the week x priority grid") {
    val cells = Tables.orders(spark, sfDir)
      .groupBy(
        expr("CAST(datediff(to_date(o_orderdate), DATE '1992-01-01') AS BIGINT) div 7")
          .as("w"),
        col("o_orderpriority").as("trt"))
      .agg(count(lit(1)).as("v"))
      .collect().map(r => ((r.getLong(0), r.getString(1)), r.getLong(2))).toMap
    val weeks = cells.keys.map(_._1).toSeq.distinct.sorted
    val trts = cells.keys.map(_._2).toSeq.distinct.sorted
    val k = trts.length
    val rs = scala.collection.mutable.HashMap[String, Double]()
    for (w <- weeks) {
      val vs = trts.map(t => t -> cells.getOrElse((w, t), 0L))
      for ((t, v) <- vs) {
        val smaller = vs.count(_._2 < v)
        val ties = vs.count(_._2 == v)
        val mid = smaller + (ties + 1) / 2.0
        rs(t) = rs.getOrElse(t, 0.0) + mid
      }
    }
    val sq = rs.values.map(r => r * r).sum
    val chi2 = 12.0 * sq / (weeks.length.toDouble * k * (k + 1)) -
      3.0 * weeks.length * (k + 1)
    val got = Round10.q346Friedman.fn(spark, sfDir).collect().head
    assert(got.getLong(0) === weeks.length.toLong)
    assert(got.getLong(1) === k.toLong)
    assert(math.abs(got.getDouble(2) - chi2) < 1e-6)
  }

  test("conformal q-hat and coverage == driver split/sort reference") {
    def md5mod3(key: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$key:cf".getBytes("UTF-8"))
      val hex = d.take(4).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16) % 3
    }
    val rows = Tables.orders(spark, sfDir)
      .select(col("o_orderkey").cast("long"), col("o_orderpriority"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val folded = rows.map { case (k, g, y) => (md5mod3(k), g, y) }
    val model = folded.filter(_._1 == 0L).groupBy(_._2).map { case (g, xs) =>
      g -> java.lang.Math.floorDiv(xs.map(_._3).sum, xs.length.toLong)
    }
    val calib = folded.filter(_._1 == 1L).map { case (_, g, y) => math.abs(y - model(g)) }
    val m = math.ceil((calib.length + 1) * 0.9).toLong
    val qhat = calib.sorted.apply((m - 1).toInt) // m-th smallest
    val eval = folded.filter(_._1 == 2L).map { case (_, g, y) => math.abs(y - model(g)) }
    val cov = eval.count(_ <= qhat).toDouble / eval.length
    val got = Round10.q347Conformal.fn(spark, sfDir).collect().head
    assert(got.getLong(0) === calib.length.toLong)
    assert(got.getLong(1) === eval.length.toLong)
    assert(got.getLong(2) === qhat)
    assert(math.abs(got.getDouble(3) - cov) < 1e-6)
  }

  test("cochran-armitage z == direct formula from the dose table") {
    val doses = Tables.lineitem(spark, sfDir)
      .select(expr("CAST(round(l_discount * 100) AS BIGINT)").as("w"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("s"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("n"), sum(col("s")).as("r"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nTot = doses.map(_._2).sum
    val rTot = doses.map(_._3).sum
    val swn = doses.map(d => d._1 * d._2).sum
    val swr = doses.map(d => d._1 * d._3).sum
    val sw2n = doses.map(d => d._1 * d._1 * d._2).sum
    val p = rTot.toDouble / nTot
    val t = swr.toDouble - p * swn
    val v = p * (1.0 - p) * (sw2n.toDouble - swn.toDouble * swn / nTot)
    val z = t / math.sqrt(v)
    val got = Round10.q348CochranArmitage.fn(spark, sfDir).collect().head
    assert(got.getLong(0) === doses.length.toLong)
    assert(got.getLong(1) === nTot)
    assert(got.getLong(2) === rTot)
    assert(math.abs(got.getDouble(3) - z) < 1e-6)
  }

  test("geo knn == brute-force neighborhood search per customer") {
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_custkey").cast("long"), col("c_nationkey").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val supp = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey").cast("long"))
      .collect().map(_.getLong(0))
    val cell = 500000L
    def cpos(c: Long) = ((c % 11) * 400000L + (c % 17) * 10000L,
      (c % 7) * 300000L + (c % 13) * 10000L)
    def spos(s: Long) = ((s % 13) * 350000L + (s % 19) * 9000L,
      (s % 5) * 420000L + (s % 11) * 8000L)
    val byNation = scala.collection.mutable.HashMap[Long, (Long, Long, Long)]()
    for ((ck, nat) <- cust) {
      val (px, py) = cpos(ck)
      val (ccx, ccy) = (px / cell, py / cell)
      val cands = supp.filter { s =>
        val (sx, sy) = spos(s)
        math.abs(sx / cell - ccx) <= 1 && math.abs(sy / cell - ccy) <= 1
      }
      val best = if (cands.isEmpty) None
      else Some(cands.map { s =>
        val (sx, sy) = spos(s)
        ((px - sx) * (px - sx) + (py - sy) * (py - sy), s)
      }.min)
      val (n, m, d) = byNation.getOrElse(nat, (0L, 0L, 0L))
      byNation(nat) = (n + 1, m + (if (best.isDefined) 1L else 0L),
        d + best.map(_._1).getOrElse(0L))
    }
    val got = Round10.q349GeoKnn.fn(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got === byNation.toMap)
  }

  test("negbin fit == direct method-of-moments on collected daily counts") {
    val xs = Tables.events(spark, sfDir)
      .groupBy(to_date(col("ts"))).agg(count(lit(1)).as("x"))
      .collect().map(_.getLong(1))
    val n = xs.length
    val m = xs.sum.toDouble / n
    val v = (n.toLong * xs.map(x => x * x).sum - xs.sum * xs.sum).toDouble / (n.toLong * n)
    val got = Round10.q357NegbinFit.fn(spark, sfDir).collect().head
    assert(got.getLong(0) === n.toLong)
    assert(math.abs(got.getDouble(1) - m) < 1e-5)
    assert(math.abs(got.getDouble(2) - v) < 1e-5)
    if (v > m) {
      assert(math.abs(got.getDouble(3) - m * m / (v - m)) < 1e-4)
      assert(math.abs(got.getDouble(4) - m / v) < 1e-6)
    } else assert(got.isNullAt(3) && got.isNullAt(4))
  }

  test("cramers v == direct chi2 effect size from collected cells") {
    val cells = Tables.orders(spark, sfDir)
      .groupBy(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("o"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val n = cells.values.sum
    val ra = cells.groupBy(_._1._1).map { case (k, v) => k -> v.values.sum }
    val cb = cells.groupBy(_._1._2).map { case (k, v) => k -> v.values.sum }
    val chi2 = cells.map { case ((a, b), o) =>
      val e = ra(a).toDouble * cb(b) / n
      (o - e) * (o - e) / e
    }.sum
    val (r, c) = (ra.size, cb.size)
    val v0 = math.sqrt(chi2 / (n.toDouble * math.min(r - 1, c - 1)))
    val got = Round10.q358CramersV.fn(spark, sfDir).collect().head
    assert(got.getLong(0) === n)
    assert((got.getLong(1), got.getLong(2)) === ((r.toLong, c.toLong)))
    assert(math.abs(got.getDouble(3) - v0) < 1e-5)
  }

  test("partial correlation == direct formula from collected triples") {
    val rows = Tables.lineitem(spark, sfDir)
      .select(expr("CAST(round(l_quantity) AS BIGINT)"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)"),
        expr("CAST(round(l_discount * 100) AS BIGINT)"))
      .collect().map(r => (r.getLong(0).toDouble, r.getLong(1).toDouble, r.getLong(2).toDouble))
    val n = rows.length.toDouble
    def corr(f: ((Double, Double, Double)) => Double,
             g: ((Double, Double, Double)) => Double): Double = {
      val (sa, sb) = (rows.map(f).sum, rows.map(g).sum)
      val (saa, sbb) = (rows.map(t => f(t) * f(t)).sum, rows.map(t => g(t) * g(t)).sum)
      val sab = rows.map(t => f(t) * g(t)).sum
      (n * sab - sa * sb) / math.sqrt((n * saa - sa * sa) * (n * sbb - sb * sb))
    }
    val rxy = corr(_._1, _._2); val rxz = corr(_._1, _._3); val ryz = corr(_._2, _._3)
    val part = (rxy - rxz * ryz) / math.sqrt((1 - rxz * rxz) * (1 - ryz * ryz))
    val got = Round10.q359PartialCorr.fn(spark, sfDir).collect().head
    assert(math.abs(got.getDouble(1) - rxy) < 1e-5)
    assert(math.abs(got.getDouble(4) - part) < 1e-4)
  }

  test("ljung-box Q == direct ACF portmanteau on the collected hourly series") {
    val byHour = Tables.events(spark, sfDir)
      .select(expr("unix_micros(ts) div 3600000000").as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("x"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (mn, mx) = (byHour.keys.min, byHour.keys.max)
    val xs = (mn to mx).map(h => byHour.getOrElse(h, 0L).toDouble).toArray
    val n = xs.length
    val mean = xs.sum / n
    val c0 = xs.map(x => (x - mean) * (x - mean)).sum / n
    var q = 0.0
    for (k <- 1 to 12) {
      val ck = (0 until n - k).map(i => (xs(i) - mean) * (xs(i + k) - mean)).sum / n
      val rho = ck / c0
      q += rho * rho / (n - k)
    }
    q *= n.toDouble * (n + 2)
    val got = Round10.q360LjungBox.fn(spark, sfDir).collect().head
    assert(got.getLong(0) === n.toLong)
    assert(got.getLong(1) === 12L)
    assert(math.abs(got.getDouble(2) - q) < 1e-3)
  }

  test("cooks distance top-5 == driver OLS influence reference") {
    val byDay = Tables.orders(spark, sfDir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(count(lit(1)).as("y"))
      .collect().map(r => r.getDate(0).toLocalDate.toEpochDay -> r.getLong(1)).toMap
    val (d0, d1) = (byDay.keys.min, byDay.keys.max)
    val ys = (d0 to d1).map(d => byDay.getOrElse(d, 0L).toDouble).toArray
    val n = ys.length
    val ts = (0 until n).map(_.toDouble).toArray
    val (st, sy) = (ts.sum, ys.sum)
    val stt = ts.map(t => t * t).sum
    val sty = ts.zip(ys).map { case (t, y) => t * y }.sum
    val beta = (n * sty - st * sy) / (n * stt - st * st)
    val alpha = (sy - beta * st) / n
    val es = ts.zip(ys).map { case (t, y) => y - alpha - beta * t }
    val s2 = es.map(e => e * e).sum / (n - 2)
    val hs = ts.map(t => 1.0 / n + (t - st / n) * (t - st / n) / (stt - st * st / n))
    val ds = es.zip(hs).map { case (e, h) => e * e * h / (2 * s2 * (1 - h) * (1 - h)) }
    val top = ds.zipWithIndex.sortBy { case (d, i) => (-d, i) }.take(5)
    val got = Round10.q361CooksDistance.fn(spark, sfDir).collect()
    assert(got.length === 5)
    for (((dRef, iRef), row) <- top.zip(got)) {
      assert(row.getLong(0) === iRef.toLong)
      assert(math.abs(row.getDouble(1) - dRef) < 1e-4)
    }
  }

  test("containment finds subset docs that symmetric jaccard misses") {
    import spark.implicits._
    val small = "alpha beta gamma delta epsilon zeta" // 4 trigrams
    val big = small + " " + (1 to 40).map(i => s"w$i").mkString(" ")
    val other = (1 to 20).map(i => s"x$i").mkString(" ")
    val docs = Seq((1L, small), (2L, big), (3L, other)).toDF("doc_id", "text")
    val got = graft.operators.Dedup.containmentPairs(docs, n = 3, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(4)))
    assert(got.toSeq === Seq((1L, 2L, 1.0)))
    // the same pair is invisible to symmetric jaccard at any usable threshold
    assert(graft.operators.Dedup
      .ngramJaccardPairs(docs, n = 3, threshold = 0.5).count() === 0L)
  }

  test("containment == quadratic brute force on sf0.001 documents") {
    val sh = graft.operators.Dedup
      .hashedTokenShingles(Tables.documents(spark, sfDir), n = 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet)
      .filter(_._2.nonEmpty)
    val expected = (for {
      (da, ga) <- sh; (db, gb) <- sh
      if ga.size < gb.size || (ga.size == gb.size && da < db)
      inter = ga.intersect(gb).size
      if inter >= ga.size * 0.8 - 1e-9
    } yield (da, db)).toSet
    val got = Round10.q362Containment.fn(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expected)
  }

  test("weighted quantiles == driver cumulative-weight reference") {
    val rows = Tables.lineitem(spark, sfDir)
      .select(expr("CAST(round(l_extendedprice * 100) AS BIGINT)"),
        expr("CAST(round(l_quantity) AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val wtot = rows.map(_._2).sum
    // collapse duplicate values first so cum matches the histogram walk
    val hist = rows.groupBy(_._1).map { case (v, xs) => (v, xs.map(_._2).sum) }
      .toSeq.sortBy(_._1)
    def wqh(k: Long): Long = {
      var cum = 0L
      for ((v, w) <- hist) { cum += w; if (cum * 10 >= k * wtot) return v }
      hist.last._1
    }
    val got = Round10.q363WeightedQuantiles.fn(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(10L -> wqh(1L), 50L -> wqh(5L), 90L -> wqh(9L)))
  }

  test("modularity == direct computation from collected edges") {
    val edges = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .join(Tables.lineitem(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(spark, sfDir), col("s_suppkey") === col("l_suppkey"))
      .filter(col("c_nationkey") =!= col("s_nationkey"))
      .groupBy(
        least(col("c_nationkey"), col("s_nationkey")).cast("long").as("a"),
        greatest(col("c_nationkey"), col("s_nationkey")).cast("long").as("b"))
      .agg(count(lit(1)).as("wt"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val region = Tables.nation(spark, sfDir)
      .select(col("n_nationkey").cast("long"), col("n_regionkey").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val m = edges.map(_._3).sum
    val inC = scala.collection.mutable.HashMap[Long, Long]()
    val deg = scala.collection.mutable.HashMap[Long, Long]()
    for ((a, b, w) <- edges) {
      val (ca, cb) = (region(a), region(b))
      if (ca == cb) inC(ca) = inC.getOrElse(ca, 0L) + w
      deg(ca) = deg.getOrElse(ca, 0L) + w
      deg(cb) = deg.getOrElse(cb, 0L) + w
    }
    val qScaled = deg.keys.map(c =>
      4L * m * inC.getOrElse(c, 0L) - deg(c) * deg(c)).sum
    val got = Round10.q343Modularity.fn(spark, sfDir).collect().head
    assert(got.getLong(0) === deg.size.toLong)
    assert(got.getLong(1) === m)
    assert(got.getLong(2) === qScaled)
    assert(math.abs(got.getDouble(3) - qScaled.toDouble / (4.0 * m * m)) < 1e-6)
  }

  // ---- q365–q378 batch -------------------------------------------------

  private def snapD(x: Double): Double = math.floor(x * 1073741824.0 + 0.5) / 1073741824.0

  /** first 8 md5 hex digits of s, as a long (the engine's cross-replayable
    * hash contract), mod m — independent JVM reimplementation.
    */
  private def md5Mod(sv: String, m: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(sv.getBytes("UTF-8"))
    d.take(4).foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL)) % m
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("bitemporal as-of == brute-force latest-committed-version pick") {
    val rows = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .select(col("l_partkey").cast("long"), to_date(col("o_orderdate")),
        to_date(col("l_shipdate")), col("l_linenumber").cast("long"),
        col("l_orderkey").cast("long"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate,
        r.getDate(2).toLocalDate, r.getLong(3), r.getLong(4), r.getLong(5)))
    val v = java.time.LocalDate.parse("1995-06-15")
    val t = java.time.LocalDate.parse("1995-06-01")
    val live = rows.filter { case (_, vf, vt, ln, _, _) =>
      !vf.isAfter(v) && v.isBefore(vt) && !vf.plusDays(ln).isAfter(t)
    }
    assert(live.nonEmpty, "sweep needs at least one live version at sf0.001")
    val picked = live.groupBy(_._1).map { case (_, vs) =>
      vs.maxBy { case (_, vf, _, ln, ok, _) => (vf.plusDays(ln).toEpochDay, ok, ln) }
    }.toSeq
    val got = Round10.q368Bitemporal.fn(spark, sfDir).collect().head
    assert(got.getLong(0) === picked.size.toLong)
    assert(got.getLong(1) === picked.map(_._6).sum)
    assert(got.getLong(2) === picked.map(_._1).min)
    assert(got.getLong(3) === picked.map(_._1).max)
  }

  test("flesch readability == per-doc driver reference") {
    val docs = Tables.documents(spark, sfDir).select(col("lang"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val want = docs.groupBy(_._1).toSeq.sortBy(_._1).map { case (lang, ds) =>
      val scores = ds.map { case (_, text) =>
        val words = text.split(" ", -1).length.toDouble
        val syl = "[aeiou]+".r.findAllIn(text).length.toDouble
        val sents = math.max(1, text.split("\\.", -1).length - 1).toDouble
        snapD(206.835 - 1.015 * words / sents - 84.6 * syl / words)
      }
      (lang, ds.length.toLong, round6(scores.sum / ds.length))
    }
    val got = Round10.q369Readability.fn(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(x => (x._1, x._2)).toSeq === want.map(x => (x._1, x._2)))
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g._3 - w._3) < 2e-6, s"lang=${g._1}: ${g._3} vs ${w._3}")
    }
  }

  test("gumbel fit == direct moments on weekly block maxima") {
    val epoch0 = java.time.LocalDate.parse("1992-01-01").toEpochDay
    val daily = Tables.orders(spark, sfDir)
      .groupBy(to_date(col("o_orderdate")).as("d")).agg(count(lit(1)).as("x"))
      .collect().map(r => (r.getDate(0).toLocalDate.toEpochDay - epoch0, r.getLong(1)))
    val maxima = daily.groupBy(t => Math.floorDiv(t._1, 7L)).values.map(_.map(_._2).max).toSeq
    val n = maxima.size.toLong
    val sm = maxima.sum
    val sxx = maxima.map(x => x * x).sum
    val mean = sm.toDouble / n
    val variance = (n * sxx - sm * sm).toDouble / (n.toDouble * (n - 1))
    val beta = math.sqrt(variance * 6.0) / 3.14159265358979
    val mu = mean - 0.5772156649 * beta
    val got = Round10.q370GumbelFit.fn(spark, sfDir).collect().head
    assert(got.getLong(0) === n)
    assert(math.abs(got.getDouble(1) - mean) < 1e-6)
    assert(math.abs(got.getDouble(2) - beta) < 1e-6)
    assert(math.abs(got.getDouble(3) - mu) < 1e-6)
  }

  test("covariate balance == driver SMD with independently computed md5 arms") {
    val epoch0 = java.time.LocalDate.parse("1992-01-01").toEpochDay
    val rows = Tables.orders(spark, sfDir)
      .select(col("o_orderkey").cast("long"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)"),
        to_date(col("o_orderdate")), length(col("o_orderpriority")).cast("long"))
      .collect().map(r => (md5Mod(s"${r.getLong(0)}:bal", 2L) == 0L,
        r.getLong(1), r.getDate(2).toLocalDate.toEpochDay - epoch0, r.getLong(3)))
    def smd(f: ((Boolean, Long, Long, Long)) => Long): Double = {
      val (tr, co) = rows.partition(_._1)
      val (vt, vc) = (tr.map(f), co.map(f))
      def meanVar(xs: Seq[Long]): (Double, Double) = {
        val n = xs.size.toLong
        val s = xs.sum
        val ss = xs.map(x => BigInt(x) * BigInt(x)).sum
        (s.toDouble / n,
          (BigInt(n) * ss - BigInt(s) * BigInt(s)).toDouble / (n.toDouble * (n - 1)))
      }
      val ((mt, vart), (mc, varc)) = (meanVar(vt.toSeq), meanVar(vc.toSeq))
      (mt - mc) / math.sqrt((vart + varc) / 2.0)
    }
    val want = Seq("c1_price" -> smd(_._2), "c2_day" -> smd(_._3), "c3_prio_len" -> smd(_._4))
    val got = Round10.q371CovariateBalance.fn(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getBoolean(2)))
    assert(got.map(_._1).toSeq === want.map(_._1))
    got.zip(want).foreach { case ((c, g, bal), (_, w)) =>
      assert(math.abs(g - w) < 1e-5, s"$c: $g vs $w")
      assert(bal === (math.abs(w) < 0.1), c)
    }
  }

  test("stream PSI == batch PSI driver reference (≡-batch contract)") {
    val ev = Tables.events(spark, sfDir).select(to_date(col("ts")).as("d"), col("value"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getDouble(1)))
    val d0 = ev.map(_._1).min
    def band(v: Double): Long =
      math.min(9L, Math.floorDiv(
        new java.math.BigDecimal(v * 100).setScale(0, java.math.RoundingMode.HALF_UP)
          .longValueExact, 5000L))
    val grouped = ev.groupBy { case (d, v) => band(v) }
    val ca = grouped.view.mapValues(_.count { case (d, _) =>
      java.time.temporal.ChronoUnit.DAYS.between(d0, d) < 15 }.toLong).toMap
    val cb = grouped.view.mapValues(_.count { case (d, _) =>
      java.time.temporal.ChronoUnit.DAYS.between(d0, d) >= 15 }.toLong).toMap
    val na = ca.values.sum
    val nb = cb.values.sum
    val psi = round6(grouped.keys.toSeq.map { b =>
      val pa = (ca(b) + 1).toDouble / (na + 10)
      val pb = (cb(b) + 1).toDouble / (nb + 10)
      snapD((pa - pb) * math.log(pa / pb))
    }.sum)
    val verdict = if (psi < 0.1) "stable" else if (psi < 0.25) "moderate" else "shifted"
    val got = Round10.q372StreamPsi.fn(spark, sfDir).collect().head
    assert(math.abs(got.getDouble(0) - psi) < 1e-6)
    assert(got.getString(1) === verdict)
  }

  test("xyz classification == driver CV classify over weekly demand") {
    val epoch0 = java.time.LocalDate.parse("1992-01-01").toEpochDay
    val rows = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey").cast("long"), to_date(col("l_shipdate")),
        expr("CAST(round(l_quantity) AS BIGINT)"))
      .collect().map(r => (r.getLong(0),
        Math.floorDiv(r.getDate(1).toLocalDate.toEpochDay - epoch0, 7L), r.getLong(2)))
    val nw = rows.map(_._2).max - rows.map(_._2).min + 1
    val weekly = rows.groupBy(t => (t._1, t._2)).view.mapValues(_.map(_._3).sum).toMap
    val perPart = weekly.groupBy(_._1._1).map { case (part, ws) =>
      val sq = ws.values.sum
      val sqq = ws.values.map(q => q * q).sum
      val mean = sq.toDouble / nw
      val vr = (nw * sqq - sq * sq).toDouble / (nw.toDouble * nw)
      val cv = math.sqrt(vr) / mean
      (part, sq, if (cv < 0.5) "X" else if (cv < 1.0) "Y" else "Z")
    }
    val tq = perPart.map(_._2).sum
    val want = perPart.groupBy(_._3).view.mapValues(ps =>
      (ps.size.toLong, round6(ps.map(_._2).sum.toDouble / tq))).toMap
    val got = Round10.q373XyzClassification.fn(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet === want.keySet)
    for (k <- want.keys) {
      assert(got(k)._1 === want(k)._1, k)
      assert(math.abs(got(k)._2 - want(k)._2) < 1e-6, k)
    }
  }

  test("croston == sequential driver fold over the most-active part") {
    val daily = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_partkey").cast("long").as("part"), to_date(col("l_shipdate")).as("d"))
      .agg(expr("CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)").as("q"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getLong(2)))
    val part = daily.groupBy(_._1).toSeq
      .map { case (p, ds) => (p, ds.size) }
      .sortBy { case (p, nd) => (-nd, p) }.head._1
    val series = daily.filter(_._1 == part).sortBy(_._2.toEpochDay)
    val nd = series.length.toLong
    assert(nd >= 2, "croston sweep needs >= 2 demand days")
    val gaps = series.sliding(2).map { case Array(a, b) =>
      (b._2.toEpochDay - a._2.toEpochDay).toDouble }.toSeq
    var z = series.head._3.toDouble
    var p = gaps.head
    for (i <- 1 until series.length) {
      z = 0.5 * z + 0.5 * series(i)._3
      p = 0.5 * p + 0.5 * gaps(i - 1)
    }
    val got = Round10.q374Croston.fn(spark, sfDir).collect().head
    assert(got.getLong(0) === part)
    assert(got.getLong(1) === nd)
    assert(math.abs(got.getDouble(2) - z) < 1e-6)
    assert(math.abs(got.getDouble(3) - p) < 1e-6)
    assert(math.abs(got.getDouble(4) - z / p) < 1e-6)
  }

  test("runs test == sequential driver walk over the zero-filled day spine") {
    val daily = Tables.orders(spark, sfDir)
      .groupBy(to_date(col("o_orderdate")).as("d")).agg(count(lit(1)).as("x"))
      .collect().map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getLong(1))).toMap
    val (dMin, dMax) = (daily.keys.min, daily.keys.max)
    val spine = (dMin to dMax).map(d => daily.getOrElse(d, 0L))
    val n = spine.size
    // lower median: smallest v with 2*cum >= n over the value histogram
    val sortedVals = spine.sorted
    val med = sortedVals((n - 1) / 2)
    val signs = spine.filter(_ != med).map(_ > med)
    val n1 = signs.count(identity).toLong
    val n2 = signs.size - n1
    val r = 1L + signs.sliding(2).count { case Seq(a, b) => a != b }
    val got = Round10.q377RunsTest.fn(spark, sfDir).collect().head
    assert(got.getLong(0) === n1)
    assert(got.getLong(1) === n2)
    assert(got.getLong(2) === r)
    if (n1 > 0 && n2 > 0) {
      val (d1, d2) = (n1.toDouble, n2.toDouble)
      val mu = 1.0 + 2.0 * d1 * d2 / (d1 + d2)
      val v = 2.0 * d1 * d2 * (2.0 * d1 * d2 - d1 - d2) /
        ((d1 + d2) * (d1 + d2) * (d1 + d2 - 1.0))
      assert(math.abs(got.getDouble(3) - (r - mu) / math.sqrt(v)) < 1e-6)
    } else assert(got.isNullAt(3))
  }

  test("capture-recapture == Chapman from independently computed md5 captures") {
    val users = Tables.events(spark, sfDir).select(col("user_id")).distinct()
      .collect().map(_.getLong(0))
    val n1 = users.count(u => md5Mod(s"$u:c1", 10L) < 3L).toLong
    val n2 = users.count(u => md5Mod(s"$u:c2", 10L) < 3L).toLong
    val m = users.count(u => md5Mod(s"$u:c1", 10L) < 3L && md5Mod(s"$u:c2", 10L) < 3L).toLong
    val chapman = (n1 + 1).toDouble * (n2 + 1) / (m + 1) - 1.0
    val got = Round10.q378CaptureRecapture.fn(spark, sfDir).collect().head
    assert(got.getLong(0) === users.length.toLong)
    assert(got.getLong(1) === n1)
    assert(got.getLong(2) === n2)
    assert(got.getLong(3) === m)
    assert(math.abs(got.getDouble(4) - chapman) < 1e-6)
  }
}
