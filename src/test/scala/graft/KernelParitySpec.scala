package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{SimHash64, TokenShingleHashes, VectorCosine, VectorOps}
import graft.operators.Dedup

/** Bit-parity of the compiled one-pass kernels against the declarative
  * formulations they replaced — the performance rework is only safe
  * because these are EXACT equivalences, so each is pinned here:
  *
  *   - TokenShingleHashes ≡ array_distinct∘transform∘xxhash64 (set-equal;
  *     the expression returns ascending order)
  *   - SimHash64 ≡ explode → 64-column ±1 vote aggregate
  *   - VectorCosine ≡ zip_with/aggregate double fold (identical bits, not
  *     just approximately equal — same cast + left-fold order)
  */
class KernelParitySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a b c d e f g h i j k l m n o p",
    "repeated repeated repeated repeated repeated words words words",
    "double  space and trailing space ",
    "one two",
    "Punctuated, sentence! with? marks; and CAPS",
    ""
  )

  test("token shingle hashes match the HOF formulation as a set") {
    val d = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
    val fast = Dedup
      .hashedTokenShingles(d, 3)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet)
      .toMap
    // Docs with >= 3 words must agree exactly. The HOF formulation is fed
    // only those: below 3 words its sequence() bound degenerates to the
    // DESCENDING [1, 0] and slice(…, 0, …) throws — a latent bug the
    // expression fixes by defining the short-doc case as the empty set,
    // matching the DuckDB oracle's range() semantics.
    val slow = Dedup
      .hashShingles(Dedup.tokenShingles(d.filter(size(split(col("text"), " ")) >= 3), 3))
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Seq[Long]]("shingles").toSet)
      .toMap
    assert(slow.nonEmpty)
    for ((id, sh) <- slow) assert(fast(id) == sh, s"doc $id")
    assert(fast(4L).isEmpty, "two-word doc has no trigram shingles")
    assert(fast(6L).isEmpty, "empty doc has no shingles")
  }

  test("token shingle hashes are ascending and distinct") {
    val d = Seq((1L, ("xy " * 200).trim)).toDF("doc_id", "text")
    val sh = Dedup.hashedTokenShingles(d, 3).collect().head.getSeq[Long](1)
    assert(sh == sh.distinct.sorted)
    // "xy xy xy" repeated → exactly one distinct trigram shingle.
    assert(sh.length == 1)
  }

  test("simhash64 matches the explode + 64-column vote aggregate bit-for-bit") {
    val d = texts.zipWithIndex
      .filter(_._1.nonEmpty)
      .map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    SimHash64.register(spark)
    val fast = d
      .select(col("doc_id"), expr("simhash64(text)").as("s"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    // The pre-rework formulation, inline (graft @ 403ecf6): xxhash64 per
    // token, each bit votes ±1, sign of tally.
    val tokens = d.select(col("doc_id"), explode(split(lower(col("text")), " ")).as("tok"))
    val h = xxhash64(col("tok"))
    val bitAggs = (0 until 64).map { j =>
      sum(when(shiftright(h, j).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"bit$j")
    }
    val tallies = tokens.groupBy(col("doc_id")).agg(bitAggs.head, bitAggs.tail: _*)
    val sig = (0 until 64)
      .map(j => when(col(s"bit$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_.bitwiseOR(_))
    val slow = tallies
      .select(col("doc_id"), sig.as("s"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(fast == slow)
  }

  test("vector_cosine is bit-identical to the zip_with/aggregate fold") {
    VectorCosine.register(spark)
    val rng = new scala.util.Random(7)
    val vecs = Seq.tabulate(50)(i => (i.toLong, Array.fill(64)(rng.nextFloat() * 2f - 1f)))
    val d = vecs.toDF("id", "v")
    val pairs = d
      .toDF("id_a", "a")
      .crossJoin(d.toDF("id_b", "b"))
      .select(
        expr("vector_cosine(a, b)").as("fast"),
        VectorOps.cosine(VectorOps.toDouble(col("a")), VectorOps.toDouble(col("b"))).as("slow")
      )
      .collect()
    pairs.foreach { r =>
      assert(
        java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToRawLongBits(r.getDouble(1))
      )
    }
  }

  test("vector_cosine: NaN on zero vector, 1.0 on identical") {
    VectorCosine.register(spark)
    val d = Seq(
      (Array(1f, 2f, 3f), Array(1f, 2f, 3f)),
      (Array(0f, 0f, 0f), Array(1f, 2f, 3f))
    ).toDF("a", "b")
    val out = d.select(expr("vector_cosine(a, b)")).collect().map(_.getDouble(0))
    assert(math.abs(out(0) - 1.0) < 1e-12)
    assert(out(1).isNaN)
  }

  test("fuzz: shingle and simhash kernels match the declarative forms on random texts") {
    val rng = new scala.util.Random(42)
    val vocab = Vector("a", "bb", "ccc", "the", "of", "and", "x1", "y2", "z3", "word")
    val randomTexts = Seq.tabulate(40) { i =>
      val words = Seq.fill(3 + rng.nextInt(30))(vocab(rng.nextInt(vocab.size)))
      // Random double spaces exercise the empty-segment path.
      val sep = if (rng.nextBoolean()) " " else "  "
      (i.toLong, words.mkString(sep))
    }
    val d = randomTexts.toDF("doc_id", "text").withColumn("lang", lit("en"))

    val fastSh = Dedup.hashedTokenShingles(d, 3).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val slowSh = Dedup.hashShingles(Dedup.tokenShingles(d, 3)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Seq[Long]]("shingles").toSet).toMap
    for ((id, sh) <- slowSh) assert(fastSh(id) == sh, s"shingle mismatch doc $id")

    SimHash64.register(spark)
    val fastSim = d.select(col("doc_id"), expr("simhash64(text)")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val tokens = d.select(col("doc_id"), explode(split(lower(col("text")), " ")).as("tok"))
    val h = xxhash64(col("tok"))
    val bitAggs = (0 until 64).map { j =>
      sum(when(shiftright(h, j).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"bit$j")
    }
    val sig = (0 until 64)
      .map(j => when(col(s"bit$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_.bitwiseOR(_))
    val slowSim = tokens.groupBy(col("doc_id")).agg(bitAggs.head, bitAggs.tail: _*)
      .select(col("doc_id"), sig).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fastSim == slowSim)
  }

  test("token shingle width other than 3 works (bigrams)") {
    val d = Seq((1L, "a b c d")).toDF("doc_id", "text")
    TokenShingleHashes.register(spark, "tsh2", 2)
    val fast = d.select(expr("tsh2(text)")).collect().head.getSeq[Long](0).toSet
    val slow = Dedup
      .hashShingles(
        d.withColumn("lang", lit("en")).transform(Dedup.tokenShingles(_, 2))
      )
      .collect()
      .head
      .getAs[Seq[Long]]("shingles")
      .toSet
    assert(fast == slow && fast.size == 3)
  }

  test("simhashPairsMd5 equals an in-memory md5 vote reference on a planted corpus") {
    // near-copies (1-2 word edits) + unrelated docs; the reference
    // computes the identical md5-half votes, bands, bucket collisions
    // and banded Hamming in plain Scala
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val docs = Seq(
      0L -> base,
      1L -> base.replace("gamma", "gamma2"),
      2L -> base.replace("mu", "nu"),
      3L -> "completely different words about ships and harbors tonight",
      4L -> base
    ).toDF("doc_id", "text")

    def md5Halves(t: String): (Long, Long) = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(d.substring(0, 8), 16),
        java.lang.Long.parseLong(d.substring(8, 16), 16))
    }
    def bandsOf(text: String): Seq[Long] = {
      val hs = text.split(" ").filter(_.nonEmpty).map(md5Halves)
      (0 until 4).map { b =>
        (0 until 16).foldLeft(0L) { (acc, j) =>
          val i = b * 16 + j
          val votes = hs.map { case (hi, lo) =>
            if ((((if (i < 32) lo else hi) >> (i % 32)) & 1L) == 1L) 1 else -1
          }.sum
          if (votes >= 0) acc | (1L << j) else acc
        }
      }
    }
    val sigs = Seq(0L, 1L, 2L, 3L, 4L).map(i =>
      i -> bandsOf(Seq(base, base.replace("gamma", "gamma2"), base.replace("mu", "nu"),
        "completely different words about ships and harbors tonight", base)(i.toInt)))
    val expected = (for {
      (a, ba) <- sigs; (b, bb) <- sigs if a < b
      if ba.zip(bb).exists { case (x, y) => x == y } // some shared band bucket
      ham = ba.zip(bb).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
      if ham <= 3
    } yield (a, b, ham)).sorted
    val got = Dedup.simhashPairsMd5(docs)
      .select("doc_a", "doc_b", "hamming")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    assert(got == expected, s"got $got expected $expected")
    assert(expected.contains((0L, 4L, 0))) // exact copies at Hamming 0
  }

  test("minhash_md5_signature matches the explode/conv/min SQL formulation per component") {
    import org.apache.spark.sql.functions._
    graft.functions.MinHashMd5Signature.register(spark, "mh_md5_test", 16)
    // ≥3-word docs only: tokenShingles' HOF throws on shorter ones (the
    // documented sequence()/slice() quirk covered by the first test)
    val d = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .filter(size(split($"text", " ")) >= 3)
    val sh = Dedup.tokenShingles(d, 3).filter(size($"shingles") > 0)
    // the pre-r8 q395 shape: explode shingles × permutations, shuffle-agg min
    val viaExplode = sh
      .select($"doc_id", explode($"shingles").as("sh"))
      .withColumn("k", explode(lit((0 until 16).toArray)))
      .select($"doc_id", $"k",
        conv(substring(md5(concat($"k".cast("string"), lit(":"), $"sh")), 1, 12), 16, 10)
          .cast("long").as("h"))
      .groupBy($"doc_id", $"k").agg(min($"h").as("mh"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq
      }
    val viaKernel = sh
      .select($"doc_id", expr("mh_md5_test(shingles)").as("sig"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq)
      .toMap
    assert(viaKernel.keySet == viaExplode.keySet)
    viaExplode.foreach { case (id, sig) =>
      assert(viaKernel(id) == sig, s"doc $id: kernel ${viaKernel(id)} != explode $sig")
    }
  }

  test("aho_contains matches per-pattern contains() including overlap/suffix cases") {
    import org.apache.spark.sql.functions._
    // patterns chosen to stress the automaton: shared prefixes (ab/abc),
    // a pattern that is a suffix of another (bc inside abc), overlapping
    // occurrences (aa in aaa), and a never-matching pattern
    val pats = Seq("ab", "abc", "bc", "aa", "xyz", "c d", "d")
    graft.functions.AhoCorasickContains.register(spark, "aho_test", pats)
    val rows = Seq(
      (0L, "abc d"), // ab, abc, bc, c d, d
      (1L, "aaa"), // aa (twice, emitted once)
      (2L, "zzz"), // nothing
      (3L, "bcd"), // bc, d
      (4L, ""), // empty text
      (5L, "xyzxyz abc aa") // xyz, abc (and its subpatterns), aa
    ).toDF("id", "text")
    val got = rows
      .select($"id", expr("aho_test(text)").as("ids"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet)
      .toMap
    val texts = Map(0L -> "abc d", 1L -> "aaa", 2L -> "zzz", 3L -> "bcd",
      4L -> "", 5L -> "xyzxyz abc aa")
    texts.foreach { case (id, t) =>
      val expected = pats.zipWithIndex
        .collect { case (p, i) if t.contains(p) => i.toLong }
        .toSet
      assert(got(id) == expected, s"id=$id text='$t': ${got(id)} != $expected")
    }
  }
}
