package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.Tables

/** Dev profiling harness: stage-by-stage timing + cardinalities for the
  * dedup pipelines (the bench's heavy hitters). Not part of the driver
  * contract — run with `sbt 'runMain graft.tools.Profile <sfDir>'`.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s   $r")
      r
    }

    val docs = Tables.documents(spark, sfDir)
    val emb = Tables.embeddings(spark, sfDir)

    println("== q26 minhash_lsh ==")
    locally {
      val sh = Dedup.hashedTokenShingles(docs, 3)
        .filter(size(col("shingles")) > 0).cache()
      t("shingle+hash+cache")(sh.count())
      val bands = Dedup.minhashBands(sh, 64, 16)
      t("minhash bands")(bands.count())
      val cands = Dedup.minhashCandidates(bands)
      t("candidates")(cands.count())
      t("full q26")(Dedup.minhashPairs(docs).count())
      sh.unpersist()
    }
    spark.catalog.clearCache()

    println("== q28 ngram_jaccard ==")
    locally {
      val sh = Dedup.hashedTokenShingles(docs, 3)
        .withColumn("sz", size(col("shingles")))
        .filter(col("sz") > 0).cache()
      t("shingle+hash+cache")(sh.count())
      val exploded = sh.select(col("doc_id"), col("sz"), explode(col("shingles")).as("sh"))
      t("exploded")(exploded.count())
      val docFreq = exploded.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      t("docFreq distinct shingles")(docFreq.count())
      val prefixes = exploded.join(broadcast(docFreq), "sh")
        .groupBy(col("doc_id"))
        .agg(max(col("sz")).as("sz"),
          slice(array_sort(collect_list(struct(col("df"), col("sh")))), lit(1),
            (floor((lit(1.0) - 0.8) * max(col("sz"))) + lit(1)).cast("int")).as("pref"))
        .select(col("doc_id"), col("sz"), explode(col("pref.sh")).as("sh"))
      t("prefixes")(prefixes.count())
      val a = prefixes.toDF("doc_a", "sz_a", "sh")
      val b = prefixes.toDF("doc_b", "sz_b", "sh_b")
      val candidates = a.join(b,
          col("sh") === col("sh_b") && col("doc_a") < col("doc_b") &&
            col("sz_a") >= col("sz_b") * 0.8 && col("sz_b") >= col("sz_a") * 0.8)
        .select("doc_a", "doc_b")
      t("candidates raw (pre-distinct)")(candidates.count())
      t("candidates distinct")(candidates.distinct().count())
      t("full q28")(Dedup.ngramJaccardPairs(docs).count())
      sh.unpersist()
    }
    spark.catalog.clearCache()

    println("== q395 minhash_calibration (pair-set vs estimator split) ==")
    locally {
      graft.functions.MinHashMd5Signature.register(spark, "minhash_md5_64_prof", 64)
      val pairs = t("pair set (PPJoin t=0.6)")(
        Dedup.ngramJaccardPairs(docs, 3, 0.6)) // operator materializes internally
      t("pair count")(pairs.count())
      val pairDocs = pairs.select(col("doc_a").as("doc_id"))
        .union(pairs.select(col("doc_b").as("doc_id"))).distinct()
      val comp = t("signatures (join-first + checkpoint)")(
        Dedup.tokenShingles(docs.join(pairDocs, "doc_id"), 3)
          .filter(size(col("shingles")) > 0)
          .select(col("doc_id"), expr("minhash_md5_64_prof(shingles)").as("sig"))
          .localCheckpoint())
      val est = pairs
        .join(comp.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
        .join(comp.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
        .select(col("jaccard"),
          (expr("aggregate(zip_with(sig_a, sig_b, (x, y) -> IF(x = y, 1, 0))," +
            " 0, (acc, v) -> acc + v)") / 64.0).as("est"))
      t("estimator joins + agg")(est.agg(count(lit(1))).collect()(0))
    }
    spark.catalog.clearCache()

    println("== ppjoin t=0.6 internals ==")
    locally {
      val sh = Dedup.hashedTokenShingles(docs, 3)
        .withColumn("sz", size(col("shingles")))
        .filter(col("sz") > 0).cache()
      t("shingles")(sh.count())
      val exploded = sh.select(col("doc_id"), col("sz"), explode(col("shingles")).as("sh"))
      val docFreq = exploded.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      val prefixes = exploded.join(docFreq, "sh")
        .groupBy(col("doc_id"))
        .agg(max(col("sz")).as("sz"),
          slice(array_sort(collect_list(struct(col("df"), col("sh")))), lit(1),
            (floor((lit(1.0) - 0.6) * max(col("sz")) + lit(1e-9)) + lit(1)).cast("int")).as("pref"))
        .select(col("doc_id"), col("sz"), posexplode(col("pref.sh")).as(Seq("pos", "sh")))
        .cache()
      t("prefixes (40% of shingles)")(prefixes.count())
      val a = prefixes.toDF("doc_a", "sz_a", "pos_a", "sh")
      val b = prefixes.toDF("doc_b", "sz_b", "pos_b", "sh_b")
      val candidates = a.join(b,
          col("sh") === col("sh_b") && col("doc_a") < col("doc_b") &&
            col("sz_a") >= col("sz_b") * 0.6 - 1e-9 &&
            col("sz_b") >= col("sz_a") * 0.6 - 1e-9 &&
            least(col("sz_a") - col("pos_a"), col("sz_b") - col("pos_b")) * 1.6 >= (col("sz_a") + col("sz_b")) * 0.6 - 1e-9)
        .select("doc_a", "doc_b")
      t("candidates raw")(candidates.count())
      val cd = candidates.distinct()
      t("candidates distinct")(cd.count())
      t("verify")(cd.join(sh.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a"), size(col("shingles")).as("vsz_a")), "doc_a")
        .join(sh.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b"), size(col("shingles")).as("vsz_b")), "doc_b")
        .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
        .filter(round(col("inter") / (col("vsz_a") + col("vsz_b") - col("inter")), 6) >= 0.6).count())
      sh.unpersist(); prefixes.unpersist()
    }
    spark.catalog.clearCache()

    println("== q29 embed_neardup ==")
    locally {
      val fn = "srp_prof"
      graft.functions.SrpSignatures.register(spark, fn, 64, 6, 4, 42L)
      val signed = emb.select(col("vec_id"), col("embedding"), expr(s"$fn(embedding)").as("sigs")).cache()
      t("signatures+cache")(signed.count())
      val banded = signed.select(col("vec_id"), posexplode(col("sigs")).as(Seq("table_id", "sig")))
      val a = banded.select(col("table_id"), col("sig"), col("vec_id").as("id_a"))
      val b = banded.select(col("table_id").as("tb"), col("sig").as("sb"), col("vec_id").as("id_b"))
      val raw = a.join(b, col("table_id") === col("tb") && col("sig") === col("sb") && col("id_a") < col("id_b"))
        .select("id_a", "id_b")
      t("candidates raw")(raw.count())
      t("candidates distinct")(raw.distinct().count())
      t("full q29")(Dedup.embeddingNearDupPairs(emb).count())
      signed.unpersist()
    }
    spark.stop()
  }
}
