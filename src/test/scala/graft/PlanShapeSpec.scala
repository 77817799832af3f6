package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.PlanFingerprint

/** Plan-shape snapshot gate (VERDICT r12 ask #1): the committed
  * `PLANSHAPES.json` pins a normalized physical-plan fingerprint for the
  * expensive bench tail, the r12 presumptive-swing movers, the PPJoin
  * watchlist, and the calibration triple. Rounds 9–12 each burned a
  * forensics pass on swing-vs-drift attribution; with this gate, "file
  * untouched + fingerprint identical" closes a mover in seconds, and a
  * silent plan flip (AQE default change, statistics shift, Spark
  * upgrade) fails the suite the round it happens even with zero code
  * change.
  *
  * Fingerprints are taken at sf0.01 (the driver's t2 gate SF): plan
  * SHAPE — operator kinds, join strategies, exchange kinds — is what the
  * gate pins, and several watched queries are eager (driver-iterated /
  * checkpointed) so construction at sf0.1 would cost bench-scale time
  * inside the unit suite. A planning-time flip that manifests ONLY at
  * sf0.1 file sizes is out of this gate's reach and stays with the bench
  * ritual.
  *
  * Regenerate after an INTENDED plan change:
  *   SPARK_GRAFT_REGEN_PLANSHAPES=1 sbt "testOnly graft.PlanShapeSpec"
  * then commit the diff (the file stores the full normalized tree per
  * query, so the review diff shows exactly which operators moved).
  */
class PlanShapeSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.01"
  private val shapesFile = java.nio.file.Paths.get("PLANSHAPES.json")

  /** Watched set: bench top tail (streaming drains excluded — their
    * returned DataFrame is a memory-sink scan, so the fingerprint would
    * pin nothing while the drain costs seconds), the r12 movers, the
    * PPJoin watchlist, the q57/q52 cache-rule pair, and the calibration
    * triple.
    */
  private val watched: Seq[String] = Seq(
    // calibration triple (bench drift anchors)
    "q1_agg", "q2_filter_project", "q14_datetime",
    // r12 presumptive-swing movers (VERDICT r12 ask #2)
    "q142_triangles", "q114_pagerank", "q395_minhash_calibration",
    "q73_variant", "q137_cms_heavy", "q101_incremental_mv",
    "q103_curation_e2e", "q138_pmi",
    // PPJoin + cache-rule watchlist (q243 r10 / q57 r11 regression class)
    "q28_ngram_jaccard", "q521_dedup_locality",
    "q57_session_overlap", "q52_series_corr",
    // bench top tail (non-streaming), BENCH_LOCAL_r12 order
    "q500_curation_funnel", "q158_trigram_search", "q475_dedup_percolation",
    "q212_poisson_bootstrap", "q257_identity_graph", "q282_mahalanobis",
    "q221_pit_join", "q463_maxscore_prune", "q165_deletion_vectors",
    "q172_hits", "q76_winnow_overlap", "q383_lone_late_supplier",
    "q466_self_bleu", "q393_huber_mean", "q406_repeated_substring",
    "q397_good_turing", "q390_mutual_nn", "q486_sinkhorn_ot",
    "q106_fuzzy_match", "q280_label_noise", "q290_jenks_breaks",
    "q69_dedup_clusters_star", "q396_chao1_richness",
    // DSv2 connector shapes (r13): BatchScan with pushed id bounds, and
    // the columnar variant's ColumnarToRow transition
    "q612_dsv2_pushdown", "q615_dsv2_columnar")

  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  test("watched query plan fingerprints match the committed PLANSHAPES.json") {
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir not present")
    val regen = sys.env.get("SPARK_GRAFT_REGEN_PLANSHAPES").contains("1")

    val shapes: Seq[(String, PlanFingerprint.Shape)] = watched.map { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        fail(s"watched query $name is not registered in SparkEntry"))
      val df = fn(spark, sfDir)
      val s = PlanFingerprint.shape(df)
      spark.catalog.clearCache()
      name -> s
    }

    if (regen) {
      val body = shapes.sortBy(_._1).map { case (name, s) =>
        s""""${esc(name)}": {"digest": "${s.digest}", "exchanges": ${s.exchanges}, """ +
          s""""joins": [${s.joins.map(j => "\"" + esc(j) + "\"").mkString(", ")}], """ +
          s""""plan": "${esc(s.tree)}"}"""
      }.mkString("{\n  \"_sf\": \"" + esc(sfDir) + "\",\n  ", ",\n  ", "\n}\n")
      java.nio.file.Files.writeString(shapesFile, body)
      info(s"regenerated $shapesFile with ${shapes.size} fingerprints")
    } else {
      assert(java.nio.file.Files.exists(shapesFile),
        "PLANSHAPES.json missing — regenerate with SPARK_GRAFT_REGEN_PLANSHAPES=1")
      val committed = java.nio.file.Files.readString(shapesFile)
      val digestRe = """"(q[0-9][^"]*)": \{"digest": "([0-9a-f]{12})"""".r
      val pinned = digestRe.findAllMatchIn(committed)
        .map(m => m.group(1) -> m.group(2)).toMap
      val missing = watched.filterNot(pinned.contains)
      assert(missing.isEmpty,
        s"PLANSHAPES.json lacks ${missing.mkString(", ")} — regenerate")
      val mismatches = shapes.flatMap { case (name, s) =>
        if (pinned(name) == s.digest) None
        else Some(s"$name: committed ${pinned(name)} != current ${s.digest}\n" +
          s"--- current normalized plan ---\n${s.tree}\n" +
          "--- committed plan: see PLANSHAPES.json ---")
      }
      assert(mismatches.isEmpty,
        s"${mismatches.size} plan fingerprint(s) drifted (if INTENDED, " +
          "regenerate with SPARK_GRAFT_REGEN_PLANSHAPES=1 and commit):\n" +
          mismatches.mkString("\n\n"))
    }
  }
}
