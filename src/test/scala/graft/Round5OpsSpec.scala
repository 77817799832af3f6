package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Sampling, TextAnalysis}
import graft.sources.LakeLog

/** Round-5 operators: chunk-level dedup election/reassembly, classifier
  * feature arithmetic, shard-assign stability, and lake snapshot diff.
  */
class Round5OpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ----------------------------------------------------------- chunkDedup

  test("chunkDedup keeps first occurrence across and within documents") {
    // chunkWords=2: doc 1 = [a b][c d], doc 2 = [a b][e f], doc 3 repeats
    // its own chunk: [g h][g h]
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "a b e f"),
      (3L, "g h g h")
    ).toDF("doc_id", "text")
    val got = Dedup
      .chunkDedup(docs, chunkWords = 2)
      .select("doc_id", "n_chunks", "n_kept", "kept_text")
      .as[(Long, Long, Long, String)]
      .collect()
      .toMap1

    assert(got(1L) == (2L, 2L, "a b c d"))
    // doc 2 loses its first chunk to doc 1
    assert(got(2L) == (2L, 1L, "e f"))
    // doc 3's second copy of "g h" loses to its own first
    assert(got(3L) == (2L, 1L, "g h"))
  }

  test("chunkDedup: a document whose every chunk is seen earlier keeps empty text") {
    val docs = Seq((1L, "a b"), (2L, "a b")).toDF("doc_id", "text")
    val got = Dedup
      .chunkDedup(docs, chunkWords = 2)
      .select("doc_id", "n_kept", "kept_text")
      .as[(Long, Long, String)]
      .collect()
      .map(r => r._1 -> (r._2, r._3))
      .toMap
    assert(got(2L) == (0L, ""))
  }

  test("chunkDedup: trailing partial chunk is its own unit") {
    val docs = Seq((1L, "a b c d e")).toDF("doc_id", "text") // [a b][c d][e]
    val got = Dedup
      .chunkDedup(docs, chunkWords = 2)
      .select("n_chunks", "n_kept", "kept_text")
      .as[(Long, Long, String)]
      .head()
    assert(got == (3L, 3L, "a b c d e"))
  }

  test("chunkDedup identity: globally unique chunks reassemble every doc verbatim") {
    val rnd = new scala.util.Random(3)
    // words carry the doc id, so no chunk can repeat across documents
    val docs = (1L to 40L).map { d =>
      val n = 1 + rnd.nextInt(37)
      d -> (1 to n).map(i => s"w${d}_$i").mkString(" ")
    }
    val got = Dedup
      .chunkDedup(docs.toDF("doc_id", "text"), chunkWords = 10)
      .select("doc_id", "n_chunks", "n_kept", "kept_text")
      .as[(Long, Long, Long, String)]
      .collect()
      .toMap1
    docs.foreach { case (d, text) =>
      val nWords = text.split(" ").length
      val expChunks = (nWords - 1) / 10 + 1
      assert(got(d) == (expChunks.toLong, expChunks.toLong, text), s"doc $d")
    }
  }

  // ------------------------------------------------------ classifierScore

  test("classifierScore computes the documented margin on a crafted doc") {
    // "the the cat" → n=3, distinct=2, stop=2, mean_wlen=(11-3+1)/3=3,
    // long=0  margin = (2/3)*0.8 + (2/3)*2.0 - 3*0.1 + 3*0.004 - 1.2
    val df = Seq((7L, "the the cat")).toDF("doc_id", "text")
    val row = TextAnalysis.classifierScore(df)
      .select("n_words", "margin", "bucket").as[(Long, Double, String)].head()
    val expected = BigDecimal(
      (2.0 / 3) * 0.8 + (2.0 / 3) * 2.0 - 3.0 * 0.1 + 3 * 0.004 + 0.0 * 1.5 - 1.2
    ).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row._1 == 3L)
    assert(math.abs(row._2 - expected) < 1e-12)
    assert(row._3 == (if (expected > 0.2) "high" else if (expected > 0) "mid" else "low"))
  }

  // ---------------------------------------------------------- shardAssign

  test("shardAssign: positions are 1..n per shard and stable under repartition") {
    val df = (1L to 300L).toDF("id")
    val a = Sampling.shardAssign(df, "id", shards = 4, salt = "s")
      .select("id", "shard", "pos").as[(Long, Int, Long)].collect().toSet
    val b = Sampling.shardAssign(df.repartition(7), "id", shards = 4, salt = "s")
      .select("id", "shard", "pos").as[(Long, Int, Long)].collect().toSet
    assert(a == b)
    val byShard = a.groupBy(_._2)
    assert(byShard.keySet.subsetOf((0 until 4).toSet))
    byShard.foreach { case (_, rows) =>
      assert(rows.map(_._3).toSeq.sorted == (1L to rows.size).toSeq)
    }
    // a different salt is a different permutation
    val c = Sampling.shardAssign(df, "id", shards = 4, salt = "t")
      .select("id", "shard", "pos").as[(Long, Int, Long)].collect().toSet
    assert(a != c)
  }

  // -------------------------------------------------------- LakeLog.diff

  test("diff classifies added/removed/changed/unchanged with null-safe compare") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_diff").resolve("t").toString
    val v1 = Seq(
      (1L, Some(10.0)), // unchanged
      (2L, Some(20.0)), // changed
      (3L, Some(30.0)), // removed
      (4L, None)        // null -> null: unchanged (null-safe)
    ).toDF("k", "v")
    val v2 = Seq(
      (1L, Some(10.0)),
      (2L, Some(21.0)),
      (4L, None),
      (5L, Some(50.0)) // added
    ).toDF("k", "v")
    LakeLog.overwrite(v1, path)
    LakeLog.overwrite(v2, path)
    val got = LakeLog.diff(spark, path, 1L, 2L, Seq("k"), Seq("v"))
      .select("k", "change_type").as[(Long, String)].collect().toMap
    assert(got == Map(
      1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "unchanged", 5L -> "added"))
  }

  // --------------------------------------------------------- kmeansAssign

  test("kmeansAssign separates well-separated clusters and is repartition-stable") {
    val rnd = new scala.util.Random(7)
    def around(cx: Double, cy: Double) =
      Array((cx + rnd.nextGaussian() * 0.1).toFloat, (cy + rnd.nextGaussian() * 0.1).toFloat)
    // vec 0 near (0,0), vec 1 near (10,10) → deterministic init picks one
    // seed per true cluster
    val rows = (Array(0L -> Array(0.1f, -0.1f), 1L -> Array(10.2f, 9.9f)) ++
      (2L to 60L).map(i => i -> (if (i % 2 == 0) around(0, 0) else around(10, 10)))).toSeq
    val df = rows.toDF("vec_id", "embedding")
    val got = graft.operators.Similarity
      .kmeansAssign(df, k = 2, iters = 2)
      .select("vec_id", "cluster", "dist2")
      .as[(Long, Long, Double)]
      .collect()
    assert(got.length == rows.length)
    got.foreach { case (id, cluster, d2) =>
      val expected = if (id == 0 || (id >= 2 && id % 2 == 0)) 0L else 1L
      assert(cluster == expected, s"vec $id in cluster $cluster")
      assert(d2 >= 0.0 && d2 < 1.0) // tight clusters → small residual
    }
    val again = graft.operators.Similarity
      .kmeansAssign(df.repartition(5), k = 2, iters = 2)
      .select("vec_id", "cluster", "dist2")
      .as[(Long, Long, Double)]
      .collect()
    assert(got.toSet == again.toSet)
  }

  test("kmeansAssign iters=0 assigns to the nearest quantized seed vector") {
    val df = Seq(
      (0L, Array(0f, 0f)),
      (1L, Array(4f, 4f)),
      (2L, Array(0.6f, 0.9f)), // closer to (0,0)
      (3L, Array(3.0f, 2.9f))  // closer to (4,4)
    ).toDF("vec_id", "embedding")
    val got = graft.operators.Similarity
      .kmeansAssign(df, k = 2, iters = 0)
      .select("vec_id", "cluster")
      .as[(Long, Long)]
      .collect()
      .toMap
    assert(got == Map(0L -> 0L, 1L -> 1L, 2L -> 0L, 3L -> 1L))
  }

  // ------------------------------------------------------ MaterializedAgg

  test("MaterializedAgg refresh chain equals a full recompute; delta reads only new files") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_mv").resolve("t").toString
    def batch(lo: Long, hi: Long) =
      (lo to hi).map(i => (i, s"k${i % 3}", i * 1.5)).toDF("id", "k", "v")
    LakeLog.overwrite(batch(1, 100), path)
    LakeLog.append(batch(101, 180), path)
    LakeLog.append(batch(181, 200), path)

    // the incremental scan must read ONLY the files of the new commit
    val v2Files = LakeLog.readDelta(spark, path, 1, 2).inputFiles.toSet
    val v1Files = LakeLog.readDelta(spark, path, 0, 1).inputFiles.toSet
    assert(v2Files.nonEmpty && v1Files.nonEmpty && v2Files.intersect(v1Files).isEmpty)
    assert(LakeLog.readDelta(spark, path, 1, 2).count() == 80)

    val keys = Seq("k"); val sums = Seq("v")
    val mv1 = graft.sources.MaterializedAgg.refresh(spark, path, None, 0, 1, keys, sums)
    val mv2 = graft.sources.MaterializedAgg.refresh(spark, path, Some(mv1), 1, 2, keys, sums)
    val mv3 = graft.sources.MaterializedAgg.refresh(spark, path, Some(mv2), 2, 3, keys, sums)
    val got = mv3.select("k", "n", "v_sum").as[(String, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val want = LakeLog.read(spark, path).groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      .as[(String, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, (n, s)) =>
      assert(n == want(k)._1)
      assert(math.abs(s - want(k)._2) < 1e-6)
    }
  }

  test("MaterializedAgg refresh refuses a delta across an overwrite (no silent double count)") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_mv_ow").resolve("t").toString
    LakeLog.overwrite((1L to 10L).map(i => (i, "a", 1.0)).toDF("id", "k", "v"), path)
    LakeLog.overwrite((1L to 5L).map(i => (i, "a", 2.0)).toDF("id", "k", "v"), path)
    val mv1 = graft.sources.MaterializedAgg.refresh(spark, path, None, 0, 1, Seq("k"), Seq("v"))
    val e = intercept[IllegalArgumentException] {
      graft.sources.MaterializedAgg.refresh(spark, path, Some(mv1), 1, 2, Seq("k"), Seq("v"))
    }
    assert(e.getMessage.contains("non-append history"))
  }

  test("streaming MV: one snapshot per micro-batch; origin redelivery is a no-op") {
    val base = java.nio.file.Files.createTempDirectory("graft_smv_spec")
    val srcDir = base.resolve("src").toString
    val mvPath = base.resolve("mv").toString
    (1 to 3).foreach(i =>
      Seq((i.toLong, s"k${i % 2}", i * 10.0)).toDF("id", "k", "v")
        .coalesce(1).write.mode("append").parquet(srcDir))
    val stream = spark.readStream
      .schema("id BIGINT, k STRING, v DOUBLE")
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
    graft.streaming.StreamingOps.streamMaterializedAgg(
      stream, mvPath, Seq("k"), Seq("v"), appId = "runA") { w =>
      w.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", base.resolve("ckpt").toString)
        .start()
    }
    // one MV snapshot per micro-batch, every intermediate state readable
    assert(LakeLog.versions(mvPath).size == 3)
    val fin = LakeLog.read(spark, mvPath).select("k", "n", "v_sum")
      .as[(String, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(fin == Map("k0" -> (1L, 20.0), "k1" -> (2L, 40.0)))
    // redelivering an already-committed batch origin of THIS run is skipped
    val dup = Seq(("k0", 99L, 999.0)).toDF("k", "n", "v_sum")
    assert(LakeLog.overwriteIfAbsent(dup, mvPath, "runA-batch-0").isEmpty)
    assert(LakeLog.versions(mvPath).size == 3)
    // ...but a DIFFERENT producer run re-using the MV path (fresh
    // checkpoint → batch ids restart at 0) is NOT suppressed: the origin
    // is scoped to the run, so its batch 0 lands instead of being
    // silently dropped as a replay of runA's batch 0.
    val ckptB = base.resolve("ckptB").toString
    graft.streaming.StreamingOps.streamMaterializedAgg(
      spark.readStream.schema("id BIGINT, k STRING, v DOUBLE").parquet(srcDir),
      mvPath, Seq("k"), Seq("v"), appId = "runB") { w =>
      w.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", ckptB).start()
    }
    assert(LakeLog.versions(mvPath).size == 4)
    val fin2 = LakeLog.read(spark, mvPath).select("k", "n", "v_sum")
      .as[(String, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(fin2 == Map("k0" -> (2L, 40.0), "k1" -> (4L, 80.0)))
  }

  // ------------------------------------------------- semanticNearDupPairs

  test("semanticNearDupPairs finds a planted duplicate and equals brute within-cluster") {
    val rnd = new scala.util.Random(11)
    def vec(cx: Double) = Array.fill(8)((cx + rnd.nextGaussian() * 0.05).toFloat)
    // two tight clusters; vec 100 duplicates vec 7's direction exactly
    val base = (0L to 59L).map(i => i -> vec(if (i % 2 == 0) 1.0 else -1.0))
    val planted = base.toMap.apply(7L)
    val rows = base :+ (100L -> planted.map(x => (x * 2.0f)))
    val df = rows.toDF("vec_id", "embedding")
    val got = graft.operators.Similarity
      .semanticNearDupPairs(df, k = 2, iters = 1, threshold = 0.999)
      .select("id_a", "id_b", "cos").as[(Long, Long, Double)].collect()
    assert(got.exists(p => p._1 == 7L && p._2 == 100L && p._3 > 0.9999),
      s"planted duplicate not found in ${got.mkString(",")}")
    // every reported pair really is above threshold by brute cosine
    val vecs = rows.toMap
    got.foreach { case (a, b, _) =>
      val (va, vb) = (vecs(a).map(_.toDouble), vecs(b).map(_.toDouble))
      val dot = va.zip(vb).map { case (x, y) => x * y }.sum
      val cos = dot / (math.sqrt(va.map(x => x * x).sum) * math.sqrt(vb.map(x => x * x).sum))
      assert(cos > 0.999, s"pair ($a,$b) cos $cos below threshold")
    }
  }

  // ----------------------------------------------------------- saltedJoin

  test("saltedJoin equals the plain join on a 90%-hot-key fact table") {
    val fact = (1L to 2000L)
      .map(i => (if (i % 10 == 0) i % 7 else 0L, i, i * 0.5))
      .toDF("k", "row_id", "v") // 90% of rows share key 0
    val dim = (0L to 6L).map(k => (k, s"name_$k")).toDF("k", "name")
    val got = graft.operators.Skew
      .saltedJoin(fact, dim, key = "k", idCol = "row_id", salts = 8)
      .select("k", "row_id", "v", "name")
      .as[(Long, Long, Double, String)].collect().sortBy(_._2)
    val want = fact.join(dim, Seq("k"))
      .select("k", "row_id", "v", "name")
      .as[(Long, Long, Double, String)].collect().sortBy(_._2)
    assert(got.toSeq == want.toSeq)
  }

  // -------------------------------------------- randomized property sweeps

  test("chunkDedup sweep: random corpora with planted repeats equal an in-memory fold") {
    for (seed <- Seq(1, 2, 3)) {
      val rnd = new scala.util.Random(seed)
      val vocab = (0 until 12).map(i => s"t$i")
      val docs = (1L to 30L).map { d =>
        d -> (0 until (5 + rnd.nextInt(40))).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val cw = 3
      // reference: first occurrence of each chunk by (doc_id, idx)
      val seen = scala.collection.mutable.Set.empty[String]
      val expected = docs.map { case (d, text) =>
        val chunks = text.split(" ").grouped(cw).map(_.mkString(" ")).toSeq
        val kept = chunks.filter(c => seen.add(c))
        d -> (chunks.size.toLong, kept.size.toLong, kept.mkString(" "))
      }.toMap
      val got = Dedup
        .chunkDedup(docs.toDF("doc_id", "text"), chunkWords = cw)
        .select("doc_id", "n_chunks", "n_kept", "kept_text")
        .as[(Long, Long, Long, String)]
        .collect()
        .toMap1
      assert(got == expected, s"seed $seed")
    }
  }

  test("MaterializedAgg sweep: random append sequences equal a full recompute") {
    for (seed <- Seq(5, 6)) {
      val rnd = new scala.util.Random(seed)
      val path = java.nio.file.Files
        .createTempDirectory(s"graft_mv_sweep$seed").resolve("t").toString
      val nCommits = 2 + rnd.nextInt(4)
      var id = 0L
      for (c <- 1 to nCommits) {
        val batch = (1 to (1 + rnd.nextInt(120))).map { _ =>
          id += 1; (id, s"k${rnd.nextInt(4)}", rnd.nextInt(1000).toLong)
        }
        if (c == 1) LakeLog.overwrite(batch.toDF("id", "k", "v"), path)
        else LakeLog.append(batch.toDF("id", "k", "v"), path)
      }
      var mv: Option[org.apache.spark.sql.DataFrame] = None
      for (v <- 1L to nCommits.toLong)
        mv = Some(graft.sources.MaterializedAgg.refresh(
          spark, path, mv, v - 1, v, Seq("k"), Seq("v")))
      val got = mv.get.select("k", "n", "v_sum").as[(String, Long, Long)]
        .collect().map(r => r._1 -> (r._2, r._3)).toMap
      val want = LakeLog.read(spark, path).groupBy(col("k"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
        .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
      assert(got == want, s"seed $seed")
    }
  }

  // ------------------------------------------------------------- pageRank

  test("pageRank: ranks are positive and total mass is bounded by 1") {
    val nodes = (0L to 9L).toDF("id")
    // ring graph: every node one out-edge → no leak, mass stays uniform
    val ring = (0L to 9L).map(i => (i, (i + 1) % 10)).toDF("src", "dst")
    val r = graft.operators.Graph.pageRank(nodes, ring, iters = 5)
      .select("id", "r").as[(Long, Double)].collect().toMap
    assert(r.size == 10)
    r.values.foreach(v => assert(math.abs(v - 0.1) < 1e-9, s"ring rank $v != 0.1"))
    // star graph: hub receives all mass, leaves only the base share
    val star = (1L to 9L).map(i => (i, 0L)).toDF("src", "dst")
    val s = graft.operators.Graph.pageRank(nodes, star, iters = 5)
      .select("id", "r").as[(Long, Double)].collect().toMap
    assert(s(0L) > s(1L) * 5, s"hub ${s(0L)} not dominant over leaf ${s(1L)}")
    assert(s.values.forall(_ > 0) && s.values.sum <= 1.0 + 1e-9)
  }

  // ----------------------------------------------------- balancedSample

  test("balancedSample equalizes strata: smallest fully kept, others downsampled to match") {
    val rows = (0L until 1000L).map(i =>
      (i, if (i < 600) "big" else if (i < 900) "mid" else "small"))
    val df = rows.toDF("id", "src")
    val kept = Sampling.balancedSample(df, "src", "id")
      .groupBy("src").count().as[(String, Long)].collect().toMap
    // smallest stratum (100 rows) keeps rate 1000 -> fully present
    assert(kept("small") == 100L)
    // the others land near 100 (hash granularity, not exactness)
    assert(math.abs(kept("big") - 100L) <= 30, s"big kept ${kept("big")}")
    assert(math.abs(kept("mid") - 100L) <= 30, s"mid kept ${kept("mid")}")
    // determinism: identical result on rerun and under repartition
    val again = Sampling.balancedSample(df.repartition(7), "src", "id")
      .select("id").as[Long].collect().sorted.toSeq
    val first = Sampling.balancedSample(df, "src", "id")
      .select("id").as[Long].collect().sorted.toSeq
    assert(again == first)
  }

  // ------------------------------------------------- fuzzyBlockedPairs

  test("fuzzyBlockedPairs: exact parity with the unbanded theta-join under planted skew") {
    // ONE degenerate block key for every row — the skew hazard: an
    // unbanded block would hold all n(n-1)/2 pairs. Name lengths spread
    // 5..104, so the length band splits the block ~25 ways.
    val rnd = new scala.util.Random(31)
    val rows = (0L until 240L).map { i =>
      val len = 5 + rnd.nextInt(100)
      val name =
        if (i % 3 == 0 && i > 0) {
          // every third row: near-copy of the previous row's name
          val prev = ("x" * (5 + ((i - 1) % 100).toInt))
          prev.dropRight(1) + "yz" // small edit
        } else ("ab".head.toString * len)
      (i, "B1", name)
    }
    val df = rows.toDF("pid", "blk", "nm")

    val naive = df.select(col("blk"), col("pid").as("id_a"), col("nm").as("name_a"))
      .join(df.select(col("blk"), col("pid").as("id_b"), col("nm").as("name_b")), Seq("blk"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= 3)
      .select("id_a", "id_b", "dist")
      .as[(Long, Long, Int)].collect().sorted.toSeq
    val banded = Dedup.fuzzyBlockedPairs(df, Seq("blk"), "pid", "nm", maxDist = 3)
      .select("id_a", "id_b", "dist")
      .as[(Long, Long, Int)].collect().sorted.toSeq
    assert(banded == naive, "length band must lose no qualifying pair")
    assert(naive.nonEmpty, "planted near-copies must produce matches")

    // the bound: banded candidate count is a small fraction of the
    // unbanded block's n(n-1)/2 — the quadratic the band defuses
    val nCand = Dedup.fuzzyBlockCandidates(df, Seq("blk"), "pid", "nm", 3).count()
    val nNaive = 240L * 239L / 2L
    assert(nCand < nNaive / 4,
      s"banded candidates $nCand not meaningfully below unbanded $nNaive")
  }

  private implicit class MapOps(rows: Array[(Long, Long, Long, String)]) {
    def toMap1: Map[Long, (Long, Long, String)] =
      rows.map(r => r._1 -> (r._2, r._3, r._4)).toMap
  }
}
