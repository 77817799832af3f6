package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Snapshot-versioned parquet table with a file-listing commit log — the
  * transactional-lake core (what Delta/Iceberg/Hudi provide) built from
  * first principles on the two primitives every distributed store has:
  * immutable data files and one atomic rename.
  *
  * Layout:
  * {{{
  *   <path>/data/<uuid>-part-*.parquet     immutable, never rewritten
  *   <path>/_graft_log/00000000001.json    commit v1: full file listing
  *   <path>/_graft_log/00000000002.json    commit v2: ...
  * }}}
  *
  * Every commit file carries the COMPLETE data-file listing of its
  * snapshot (no log replay needed to read — one file fetch resolves any
  * version; at 100 TB the listing is thousands of names, still KBs).
  * Readers never list the data directory, so half-written files from a
  * failed job are invisible until (unless) their commit publishes —
  * that is the whole isolation story:
  *
  *   - WRITE: stage part files into `data/` under a fresh UUID prefix,
  *     then publish the next log entry with `ATOMIC_MOVE`+
  *     fail-if-exists — a compare-and-swap on the version number.
  *     Losing a race throws [[LakeLog.CommitConflictException]]; the
  *     caller's files are unreferenced garbage (vacuumable), never
  *     corruption.
  *   - READ: resolve version → read exactly that listing. Time travel is
  *     reading an older commit file; snapshot isolation is free because
  *     data files are immutable.
  *   - VACUUM: delete data files referenced by NO retained commit (a
  *     failed writer's orphans, or all-versions-expired files after log
  *     truncation).
  *
  * Single-JVM rename semantics stand in for the object-store
  * conditional-PUT a cluster deployment would use; the log format and
  * read path are storage-agnostic.
  */
object LakeLog {

  final class CommitConflictException(v: Long)
      extends RuntimeException(s"concurrent commit lost the race for version $v")

  private def logDir(path: String): Path = Paths.get(path, "_graft_log")
  private def dataDir(path: String): Path = Paths.get(path, "data")

  private def commitFile(path: String, v: Long): Path =
    logDir(path).resolve(f"$v%011d.json")

  /** `Files.list` with the stream closed (it holds a directory fd). */
  private def listDir(dir: Path): Seq[Path] = {
    val st = Files.list(dir)
    try st.iterator().asScala.toSeq
    finally st.close()
  }

  /** Versions present in the log, ascending. */
  def versions(path: String): Seq[Long] = {
    val dir = logDir(path)
    if (!Files.isDirectory(dir)) return Nil
    listDir(dir)
      .map(_.getFileName.toString)
      .filter(_.endsWith(".json"))
      .flatMap(n => n.stripSuffix(".json").toLongOption)
      .sorted
  }

  def latestVersion(path: String): Option[Long] = versions(path).lastOption

  /** The data files of a snapshot (relative names under data/). */
  def listing(path: String, version: Long): Seq[String] = {
    val f = commitFile(path, version)
    require(Files.exists(f), s"version $version does not exist under $path")
    val txt = new String(Files.readAllBytes(f), StandardCharsets.UTF_8)
    // one quoted relative filename per line between the brackets; the
    // .parquet suffix keeps the JSON keys out of the match
    "\"([^\"]+\\.parquet)\"".r.findAllMatchIn(txt).map(_.group(1)).toSeq
  }

  /** Read a snapshot: latest, or `version` for time travel. An empty
    * listing (e.g. an overwrite with an empty frame) reads as an empty
    * slice of the nearest non-empty snapshot's schema.
    */
  def read(spark: SparkSession, path: String, version: Long = -1L): DataFrame = {
    val v = if (version >= 0) version
    else latestVersion(path).getOrElse(
      throw new IllegalArgumentException(s"no committed version under $path"))
    val files = listing(path, v)
    if (files.isEmpty) {
      // schema-only snapshot: an empty slice of any committed file set
      val any = versions(path).reverseIterator
        .map(listing(path, _)).find(_.nonEmpty).flatMap(_.headOption)
      any match {
        case Some(f) =>
          spark.read.parquet(dataDir(path).resolve(f).toString).limit(0)
        case None => spark.emptyDataFrame
      }
    } else {
      spark.read.parquet(files.map(f => dataDir(path).resolve(f).toString): _*)
    }
  }

  /** Schema-evolution read: like [[read]], but resolves the UNION of the
    * snapshot's file schemas (parquet `mergeSchema`) — columns added by
    * later commits surface as NULL on rows from files that predate them.
    * This is the additive-evolution contract (add-column only): renames
    * and type changes are rewrites, not merges, and fail here the same
    * way they would on any footer-merging reader.
    */
  def readEvolved(spark: SparkSession, path: String, version: Long = -1L): DataFrame = {
    val v = if (version >= 0) version
    else latestVersion(path).getOrElse(
      throw new IllegalArgumentException(s"no committed version under $path"))
    val files = listing(path, v)
    if (files.isEmpty) read(spark, path, version)
    else
      spark.read
        .option("mergeSchema", "true")
        .parquet(files.map(f => dataDir(path).resolve(f).toString): _*)
  }

  /** Files added between `fromV` (exclusive; 0 = before the first commit)
    * and `toV` — the manifest-level delta an incremental consumer reads.
    */
  def appendedFiles(path: String, fromV: Long, toV: Long): Seq[String] = {
    val before = if (fromV <= 0) Set.empty[String] else listing(path, fromV).toSet
    val after = listing(path, toV).toSet
    // An incremental consumer is only sound over APPEND-ONLY history: if
    // any commit in (fromV, toV] dropped files (an overwrite), the delta
    // would double-count against state derived from the dead files.
    // Detectable for free — fail loudly instead of returning wrong data.
    val dropped = before -- after
    require(
      dropped.isEmpty,
      s"non-append history between v$fromV and v$toV under $path: " +
        s"${dropped.size} file(s) removed (overwrite/compaction) — " +
        "rebuild derived state from scratch instead of a delta refresh")
    (after -- before).toSeq.sorted
  }

  /** Read ONLY the files appended between two versions. For append-only
    * tables this is the incremental scan: a consumer that maintains
    * derived state (see [[MaterializedAgg]]) reads the delta, never the
    * table — the manifest, not a full listing or scan, names the new
    * files.
    */
  def readDelta(spark: SparkSession, path: String, fromV: Long, toV: Long): DataFrame = {
    val files = appendedFiles(path, fromV, toV)
    if (files.isEmpty) read(spark, path, toV).limit(0)
    else spark.read.parquet(files.map(f => dataDir(path).resolve(f).toString): _*)
  }

  /** SNAPSHOT DIFF: keyed change set between two committed versions —
    * the audit/CDC-extraction primitive a versioned lake enables (what
    * changed between yesterday's and today's snapshot, without either
    * writer having logged its changes).
    *
    * Output: `keyCols`, then `<c>_old`/`<c>_new` per value column, then
    * `change_type` ∈ {added, removed, changed, unchanged}. Comparison is
    * null-safe per value column.
    *
    * Plan shape: two snapshot scans pruned to key+value columns, ONE
    * full-outer hash join on the keys. No window, no sort; at 100 TB both
    * sides shuffle once on the same key (or zero times if the table is
    * bucketed by it).
    */
  def diff(
      spark: SparkSession,
      path: String,
      v1: Long,
      v2: Long,
      keyCols: Seq[String],
      valueCols: Seq[String]
  ): DataFrame = {
    import org.apache.spark.sql.functions._
    def side(v: Long, suffix: String, marker: String) =
      read(spark, path, v).select(
        keyCols.map(col) ++
          valueCols.map(c => col(c).as(s"${c}_$suffix")) :+
          lit(true).as(marker): _*)
    val joined = side(v1, "old", "__a")
      .join(side(v2, "new", "__b"), keyCols, "full_outer")
    val anyChanged = valueCols
      .map(c => !(col(s"${c}_old") <=> col(s"${c}_new")))
      .reduceOption(_ || _)
      .getOrElse(lit(false))
    joined
      .withColumn(
        "change_type",
        when(col("__a").isNull, "added")
          .when(col("__b").isNull, "removed")
          .when(anyChanged, "changed")
          .otherwise("unchanged"))
      .drop("__a", "__b")
  }

  /** Create or replace the table with `df` as version 1 (create) or the
    * next version (replace — old snapshots stay readable).
    *
    * `expectedLatest` is optimistic concurrency control: the commit only
    * publishes as `expectedLatest + 1`; if another writer got there
    * first, [[CommitConflictException]] — the caller re-reads and
    * decides, its staged files are harmless vacuumable orphans. Without
    * it the overwrite targets whatever the latest version is at publish
    * time (last-replacer-wins, still never corrupting).
    */
  def overwrite(
      df: DataFrame,
      path: String,
      expectedLatest: Option[Long] = None,
      statsCols: Seq[String] = Nil
  ): Long =
    commit(df, path, carryForward = false, expectedLatest, None, statsCols)

  /** Append `df` as a new version: previous snapshot's files plus the new
    * ones. Appenders never rewrite existing files, so concurrent readers
    * of any version are unaffected.
    */
  def append(df: DataFrame, path: String, statsCols: Seq[String] = Nil): Long =
    commit(df, path, carryForward = true, None, None, statsCols)

  /** Origin-idempotent OVERWRITE: publish `df` as the next snapshot
    * unless a committed version already carries `origin` — the
    * replace-the-table sibling of [[appendIfAbsent]], for at-least-once
    * producers whose payload is a full replacement (e.g. a continuously
    * re-derived materialized view). Returns None when skipped.
    */
  def overwriteIfAbsent(df: DataFrame, path: String, origin: String): Option[Long] =
    if (origins(path).contains(origin)) None
    else Some(commit(df, path, carryForward = false, None, Some(origin), Nil))

  /** Origins (caller-supplied idempotence tokens) of every committed
    * version — the ledger a restarted at-least-once producer consults.
    */
  def origins(path: String): Set[String] =
    versions(path).flatMap { v =>
      val txt = new String(Files.readAllBytes(commitFile(path, v)), StandardCharsets.UTF_8)
      "\"origin\": \"([^\"]+)\"".r.findFirstMatchIn(txt).map(_.group(1))
    }.toSet

  /** Append exactly once per `origin`: a commit tagged with an origin the
    * log already carries is skipped (returns None). This is the
    * at-least-once → exactly-once bridge for a retrying producer (e.g. a
    * foreachBatch sink re-delivering a micro-batch after a crash, even
    * with a FRESH checkpoint — the table itself remembers what landed).
    * Assumes one producer per origin value; concurrent distinct-origin
    * writers are safe (append CAS rebases).
    */
  def appendIfAbsent(
      df: DataFrame,
      path: String,
      origin: String,
      statsCols: Seq[String] = Nil
  ): Option[Long] =
    if (origins(path).contains(origin)) None
    else Some(commit(df, path, carryForward = true, None, Some(origin), statsCols))

  /** Snapshot expiry + orphan-file GC — the retention half of the lake
    * lifecycle (OPTIMIZE/compact exists in [[LakeMerge]]; this is
    * VACUUM). Drops all but the last `keepLast` versions from the log,
    * then deletes every data file no RETAINED snapshot references.
    * Time travel to an expired version fails afterwards by design;
    * readers of retained versions are untouched (their files are, by
    * construction, never orphans). Safe against concurrent appenders
    * in the same sense as Delta's VACUUM: appends only add files, so a
    * racing commit's files are never in the orphan set (it either
    * carries the retained tail forward or adds fresh uuids).
    *
    * Returns (versions expired, orphan files deleted).
    */
  def vacuum(path: String, keepLast: Int = 1): (Int, Int) = {
    require(keepLast >= 1, "must retain at least one version")
    val vs = versions(path)
    val drop = vs.dropRight(keepLast)
    val referenced = vs.takeRight(keepLast).flatMap(listing(path, _)).toSet
    drop.foreach(v => Files.delete(commitFile(path, v)))
    val orphans = listDir(dataDir(path)).filter { p =>
      val n = p.getFileName.toString
      n.endsWith(".parquet") && !referenced.contains(n)
    }
    orphans.foreach(Files.delete(_))
    (drop.size, orphans.size)
  }

  private def commit(
      df: DataFrame,
      path: String,
      carryForward: Boolean,
      expectedLatest: Option[Long],
      origin: Option[String] = None,
      statsCols: Seq[String] = Nil
  ): Long = {
    Files.createDirectories(dataDir(path))
    Files.createDirectories(logDir(path))
    // stage: write under a throwaway dir, move parts into data/ under a
    // fresh uuid prefix (move, not copy: same filesystem)
    val staging = Files.createTempDirectory("graft_lakelog_stage")
    df.write.mode("overwrite").parquet(staging.toString)
    val uuid = UUID.randomUUID().toString.take(8)
    val moved = listDir(staging)
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map { p =>
        val name = s"$uuid-${p.getFileName}"
        Files.move(p, dataDir(path).resolve(name))
        name
      }
      .toSeq
    // CAS publish loop: losing a race to version v retries at v+1 for
    // APPENDS (the new files are still valid additions to the newer
    // snapshot); an overwrite that loses its race must NOT silently
    // clobber the winner — surface the conflict.
    var v = expectedLatest.getOrElse(latestVersion(path).getOrElse(0L)) + 1
    while (true) {
      val base = if (carryForward && v > 1) listing(path, v - 1) else Nil
      val all = base ++ moved
      val originField = origin.map(o => s""""origin": "$o",\n  """).getOrElse("")
      val body = all.map(f => s"""    "$f"""").mkString(
        s"""{\n  "version": $v,\n  $originField"files": [\n""", ",\n", "\n  ]\n}\n")
      val tmp = Files.createTempFile(logDir(path), s".v$v", ".tmp")
      Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
      // Publish via hard LINK, not rename: POSIX rename() silently
      // REPLACES an existing target (so ATOMIC_MOVE is not a CAS), while
      // link() fails with EEXIST atomically — and the linked content is
      // complete, so readers never see a partial commit file.
      try {
        Files.createLink(commitFile(path, v), tmp)
        Files.deleteIfExists(tmp)
        writeStatsSidecar(path, v, moved, statsCols, carryForward)
        return v
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          Files.deleteIfExists(tmp)
          if (!carryForward) throw new CommitConflictException(v)
          v += 1 // append retry: rebase on the winner's listing
      }
    }
    v // unreachable
  }

  // ------------------------------------------------------ manifest stats

  /** Per-file [min, max] of `col` for every file of snapshot `v` that has
    * stats (from the commit's `.stats.json` sidecar; files committed
    * without stats are simply absent — readers treat them as unprunable).
    */
  def fileStats(path: String, version: Long, colName: String): Map[String, (Double, Double)] = {
    val f = logDir(path).resolve(f"$version%011d.stats.json")
    if (!Files.exists(f)) return Map.empty
    val txt = new String(Files.readAllBytes(f), StandardCharsets.UTF_8)
    val fileRe = "\"([^\"]+\\.parquet)\": \\{([^}]*)\\}".r
    val colRe = ("\"" + java.util.regex.Pattern.quote(colName) +
      "\": \\[([-0-9.eE]+), ([-0-9.eE]+)\\]").r
    fileRe.findAllMatchIn(txt).flatMap { m =>
      colRe.findFirstMatchIn(m.group(2)).map(c =>
        m.group(1) -> (c.group(1).toDouble, c.group(2).toDouble))
    }.toMap
  }

  /** Snapshot read PRUNED by the manifest: only files whose recorded
    * [min, max] for `colName` intersects [lo, hi] are opened (files
    * without stats are kept — correctness first). This is data skipping
    * from the LOG alone — no file listing, no footer reads at query time;
    * at 100 TB the manifest fetch replaces opening every file to learn it
    * was irrelevant. Compose with [[graft.sources.LakeWriter.writeZOrdered]]-style
    * layout so file ranges are actually tight. The caller still applies
    * its own row filter — pruning is file-granular, not row-exact.
    */
  def readPruned(
      spark: SparkSession,
      path: String,
      colName: String,
      lo: Double,
      hi: Double,
      version: Long = -1L
  ): DataFrame = {
    val v = if (version >= 0) version
    else latestVersion(path).getOrElse(
      throw new IllegalArgumentException(s"no committed version under $path"))
    val stats = fileStats(path, v, colName)
    val keep = listing(path, v).filter(f =>
      stats.get(f).forall { case (mn, mx) => mx >= lo && mn <= hi })
    if (keep.isEmpty) read(spark, path, v).limit(0)
    else spark.read.parquet(keep.map(f => dataDir(path).resolve(f).toString): _*)
  }

  /** Write commit `v`'s stats sidecar: footer-derived [min, max] per
    * requested column for the NEW files, merged with the carried-forward
    * files' entries from the previous sidecar (any column set recorded
    * there). Sidecars are an optimization layer: written after the CAS
    * win, so a crash in between leaves a valid commit that simply prunes
    * nothing; losing stats never loses rows.
    */
  private def writeStatsSidecar(
      path: String,
      v: Long,
      newFiles: Seq[String],
      statsCols: Seq[String],
      carryForward: Boolean
  ): Unit = {
    val prev: Map[String, String] =
      if (!carryForward || v <= 1) Map.empty
      else {
        val pf = logDir(path).resolve(f"${v - 1}%011d.stats.json")
        if (!Files.exists(pf)) Map.empty
        else {
          val txt = new String(Files.readAllBytes(pf), StandardCharsets.UTF_8)
          "\"([^\"]+\\.parquet)\": (\\{[^}]*\\})".r.findAllMatchIn(txt)
            .map(m => m.group(1) -> m.group(2)).toMap
        }
      }
    val fresh: Map[String, String] =
      if (statsCols.isEmpty) Map.empty
      else newFiles.map { f =>
        val st = footerStats(dataDir(path).resolve(f), statsCols)
        f -> st.toSeq.sortBy(_._1)
          .map { case (c, (mn, mx)) => s""""$c": [$mn, $mx]""" }
          .mkString("{", ", ", "}")
      }.toMap
    val all = prev ++ fresh
    if (all.nonEmpty) {
      val body = all.toSeq.sortBy(_._1)
        .map { case (f, s) => s""""$f": $s""" }
        .mkString("{ ", ",\n  ", " }\n")
      Files.write(
        logDir(path).resolve(f"$v%011d.stats.json"),
        body.getBytes(StandardCharsets.UTF_8))
    }
  }

  /** Driver-side footer scan of a data file: per-column [min, max] over
    * all row groups for the requested NUMERIC columns (int/long/float/
    * double/date). Stats are captured once here, at commit time — reads
    * never touch footers (the Delta/Iceberg write-side-stats discipline).
    */
  private def footerStats(file: Path, statsCols: Seq[String]): Map[String, (Double, Double)] = {
    import scala.jdk.CollectionConverters._
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(file.toUri),
      new org.apache.hadoop.conf.Configuration())
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val acc = scala.collection.mutable.Map.empty[String, (Double, Double)]
      for {
        block <- reader.getFooter.getBlocks.asScala
        chunk <- block.getColumns.asScala
        name = chunk.getPath.toDotString
        if statsCols.contains(name)
        st = chunk.getStatistics
        if st != null && st.hasNonNullValue
      } {
        val (mn, mx) = (st.genericGetMin, st.genericGetMax) match {
          case (a: Number, b: Number) => (a.doubleValue(), b.doubleValue())
          case _ => (Double.NaN, Double.NaN) // non-numeric: no stats
        }
        if (!mn.isNaN) {
          val prev = acc.get(name)
          acc(name) = (
            prev.fold(mn)(p => math.min(p._1, mn)),
            prev.fold(mx)(p => math.max(p._2, mx)))
        }
      }
      acc.toMap
    } finally reader.close()
  }

  /** Delete data files referenced by no retained version (failed-writer
    * orphans; post-truncation garbage). Returns the deleted names.
    */
  def vacuum(path: String): Seq[String] = {
    val referenced = versions(path).flatMap(listing(path, _)).toSet
    val dir = dataDir(path)
    if (!Files.isDirectory(dir)) return Nil
    listDir(dir)
      .filter(p => !referenced.contains(p.getFileName.toString))
      .map { p => Files.delete(p); p.getFileName.toString }
  }

  /** Drop all but the last `keep` versions from the log (their files
    * become vacuumable unless newer snapshots still reference them).
    */
  def truncateLog(path: String, keep: Int): Unit = {
    val vs = versions(path)
    vs.dropRight(keep).foreach { v =>
      Files.deleteIfExists(commitFile(path, v))
      Files.deleteIfExists(logDir(path).resolve(f"$v%011d.stats.json"))
    }
  }
}
