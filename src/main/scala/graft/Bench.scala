package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every declared query at the target scale factor
  * and prints ONE JSON line.
  *
  * One untimed warmup pass (JIT, codegen compilation, parquet footer
  * reads), then TWO timed runs per query with the session state reset
  * between all runs; each query reports the faster timed run, so the
  * measurement reflects achievable steady-state cost, not residual
  * cached intermediates or a one-off GC pause.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Isolation between measurements: beyond the cache, the streaming
    // queries leave per-run debris in the shared JVM — memory-sink temp
    // views (uniquely named, so they only accumulate) and loaded state
    // store providers — which inflates GC pressure for everything timed
    // after them. Release all of it, then let the cleaner actually run.
    def resetSessionState(): Unit = {
      spark.catalog.clearCache()
      spark.catalog.listTables().collect().foreach { t =>
        if (t.isTemporary) spark.catalog.dropTempView(t.name)
      }
      org.apache.spark.sql.execution.streaming.state.StateStore.stop()
      System.gc()
    }

    // SPARK_GRAFT_ONLY=q1_agg,q66_... : time a subset (iteration tool;
    // the driver never sets it, so the full catalogue runs)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    // Single source of truth for the timing methodology — the loop below
    // and the archived provenance stamp both read it, so the stamp can
    // never lie about runs-per-query again (r10 hard-coded 1 vs min-of-2).
    val timedRuns = 2
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => only.forall(_.contains(q._1)))
    // Warmup pass (untimed).
    queries.foreach { case (_, fn) =>
      try fn(spark, sfDir).count()
      catch { case _: Throwable => () }
    }
    resetSessionState()

    val results = queries.map { case (name, fn) =>
      // Two timed runs, keep the faster: a single sample is hostage to a
      // GC pause or a neighboring-process burst; min-of-2 reports the
      // query's achievable steady-state cost. Session state resets
      // between runs so both pay identical (cold-cache) work.
      val times = (1 to timedRuns).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch { case _: Throwable => false }
        val dt = (System.nanoTime() - t0) / 1e9
        // Each query pays for (and then releases) its own cached
        // intermediates — later queries must not inherit memory pressure.
        resetSessionState()
        (dt, ok)
      }
      val ok = times.forall(_._2)
      // A failed query reports -1, never a (misleadingly fast) elapsed time.
      (name, if (ok) times.map(_._1).min else -1.0, ok)
    }
    // The driver captures only the LAST ~2000 chars of stdout and parses the
    // JSON line out of that tail; sbt appends an ~80-char "[success]" line
    // after us. Full-precision doubles for 64+ queries made the line ~2450
    // chars, so its head fell outside the tail window and the driver recorded
    // parsed:null (rounds 1-3). Millisecond precision keeps the line ~1450
    // chars — well inside the window — and loses nothing a benchmark needs.
    def fmt(v: Double): String = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    // Short keys ("q78", not "q78_stream_left_outer"): at 81 queries the
    // full-name line crossed the 2000-char tail window and the driver
    // recorded parsed:null (r01-r03 all did). qNN is unique (SURVEY §8
    // maps it back) and keeps the line ~1.1 KB with room to grow.
    def short(name: String): String = name.takeWhile(_ != '_')
    val qs = results.map { case (k, v, _) => "\"" + short(k) + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val errors = results.collect { case (k, _, false) => "\"" + short(k) + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    // The driver captures only the last ~2000 chars of stdout (sbt appends an
    // ~80-char "[success]" line after us) and parses the LAST complete JSON
    // line out of that tail. At 378 queries the single combined line is ~5.3 KB
    // — its head (with "value") fell outside the window in r05 (parsed:null).
    // Structural fix: emit the full per-query map on its OWN line first (for
    // humans / logs), then a compact summary line LAST (~150 chars, bounded
    // regardless of catalogue size) so the tail always contains a complete,
    // parseable JSON object with the headline total.
    println(s"""{"metric":"per_query","queries":$qs,"sf":"$sfDir"}""")
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n":${results.size},"queries":{"all":${fmt(total)}},"errors":$errors,"sf":"$sfDir"}""")
    // Self-archive the FULL per-query map (full names, not the qNN stdout
    // shorthand) to a committed file: the driver's stdout capture keeps
    // only a ~2000-char tail, which destroyed ~70% of the per-query
    // history every round (BENCH_r07 preserved 142 of 455 timings) and
    // left round-over-round comparison with a 69-query intersection.
    // Round number: SPARK_GRAFT_BENCH_ROUND if set, else max committed
    // BENCH_r*.json + 1 (the driver writes its own file only after this
    // run — but a RE-run after the driver commit would otherwise archive
    // under the next round's number). The scan and the write both resolve
    // against the repo root (nearest ancestor of CWD holding build.sbt),
    // not bare CWD, and the chosen filename is logged so misnumbering is
    // visible. SPARK_GRAFT_ONLY subset runs skip the archive — a 2-query
    // iteration must never clobber the round's full record.
    if (only.isEmpty) try {
      var root = new java.io.File(".").getCanonicalFile
      while (!new java.io.File(root, "build.sbt").exists() &&
             root.getParentFile != null) root = root.getParentFile
      // Malformed env values (e.g. "r09") must not abort the archive —
      // fall back to the BENCH_r*.json scan with a loud warning instead
      // of losing the round's timing record to a NumberFormatException.
      val envRound = sys.env.get("SPARK_GRAFT_BENCH_ROUND")
      val parsed = envRound.flatMap(v => scala.util.Try(v.trim.toInt).toOption)
      if (envRound.nonEmpty && parsed.isEmpty)
        System.err.println(
          s"[bench] WARNING: SPARK_GRAFT_BENCH_ROUND='${envRound.get}' is not an " +
            "integer — falling back to the BENCH_r*.json scan")
      val round = parsed.getOrElse {
        val prev = Option(root.listFiles()).getOrElse(Array.empty)
          .flatMap { f =>
            "^BENCH_r(\\d+)\\.json$".r.findFirstMatchIn(f.getName).map(_.group(1).toInt)
          }
        if (prev.isEmpty) 0 else prev.max + 1
      }
      val full = results
        .map { case (k, v, _) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      // Provenance: identical HEADs have measured 2× apart on the
      // md5-heavy tail depending on who ran them (builder in-suite vs
      // driver cold, r9 q395 3.24 ↔ 6.63 s) — stamp the producing
      // context so future rounds compare like with like instead of
      // re-litigating the swing. Producer defaults to "unknown" (NOT
      // "builder-local": the driver's re-runs don't set the env var and
      // r10's default let them masquerade as the builder's archive).
      // Sanitize before the value reaches a FILENAME or the JSON context
      // (path separators in a mis-set env var must not escape the repo
      // root; a stray quote must not corrupt the archive JSON).
      val producerRaw = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONTEXT", "unknown")
      val producer = {
        val clean = producerRaw.replaceAll("[^A-Za-z0-9_-]", "_")
        if (clean.isEmpty) "unknown" else clean.take(64)
      }
      var out = new java.io.File(root, f"BENCH_LOCAL_r$round%02d.json").toPath
      // Never silently clobber an archive produced by a DIFFERENT
      // context under the same round number — divert to a
      // producer-suffixed filename so both records survive; if the
      // suffixed target ALSO exists (two re-runs from the same foreign
      // context), keep diverting with a numeric bump rather than
      // overwriting the earlier record.
      if (java.nio.file.Files.exists(out)) {
        val prevProducer = "\"producer\":\"([^\"]*)\"".r
          .findFirstMatchIn(java.nio.file.Files.readString(out)).map(_.group(1))
        if (prevProducer.exists(_ != producer)) {
          System.err.println(
            s"[bench] $out exists with producer='${prevProducer.get}' != " +
              s"'$producer' — diverting to a suffixed archive")
          out = new java.io.File(
            root, f"BENCH_LOCAL_r$round%02d.$producer.json").toPath
          var bump = 2
          while (java.nio.file.Files.exists(out) && bump < 100) {
            out = new java.io.File(
              root, f"BENCH_LOCAL_r$round%02d.$producer.$bump%d.json").toPath
            bump += 1
          }
          // Exhausting the bump range must not fall through to a silent
          // overwrite of the .99 archive — fail the archive loudly instead
          // (the "never silently clobber" contract of this whole block).
          if (java.nio.file.Files.exists(out))
            throw new IllegalStateException(
              s"bump range exhausted; refusing to overwrite $out — set " +
                "SPARK_GRAFT_BENCH_ROUND or clean up stale archives")
        }
      }
      System.err.println(s"[bench] archiving per-query timings to $out")
      val host = scala.util.Try(
        java.net.InetAddress.getLocalHost.getHostName).getOrElse("unknown")
      // Calibration triple + drift factor (VERDICT r12 ask #4): identical
      // HEADs have measured 1.1-1.5x apart by producing context, so every
      // archive carries its own context anchor — three trivial fixed-plan
      // queries — and the geometric-mean ratio against the PINNED r12
      // builder-local values. scripts/bench_compare.py uses the triple to
      // drift-normalize round-over-round deltas; the in-archive factor is
      // the at-a-glance "how hot was this context" number.
      val pinnedCalibration = Seq( // BENCH_LOCAL_r12.json, builder-local
        "q1_agg" -> 0.263, "q2_filter_project" -> 0.225, "q14_datetime" -> 0.150)
      val calTimes = pinnedCalibration.flatMap { case (n, pin) =>
        results.collectFirst { case (`n`, t, true) => (n, t, pin) }
      }
      val calJson = calTimes.map { case (n, t, _) => s""""$n":${fmt(t)}""" }
        .mkString("{", ",", "}")
      val drift =
        if (calTimes.isEmpty) 1.0
        else math.exp(calTimes.map { case (_, t, pin) => math.log(t / pin) }.sum / calTimes.size)
      val ctx =
        s"""{"producer":"$producer","host":"$host","runs_per_query":$timedRuns,""" +
          s""""calibration":$calJson,"drift_factor_vs_r12":${fmt(drift)},""" +
          s""""java":"${System.getProperty("java.version")}"}"""
      java.nio.file.Files.writeString(
        out,
        s"""{"metric":"per_query_full","n":${results.size},"queries":$full,"errors":$errors,"sf":"$sfDir","context":$ctx}""" + "\n")
    } catch { case e: Throwable => System.err.println(s"[bench] archive skipped: $e") }
    spark.stop()
  }
}
