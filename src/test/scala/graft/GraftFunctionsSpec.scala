package graft

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorOps
import graft.plans.GraftExtensions

/** The SQL surface of the custom kernels: after [[GraftExtensions.install]]
  * every kernel is callable from `spark.sql`, produces the same values as
  * its DataFrame/expression form, and rejects non-literal static
  * parameters at analysis time.
  */
class GraftFunctionsSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkTestSession.spark
    GraftExtensions.install(s)
    s
  }
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "pack my box with five dozen liquor jugs"),
    (3L, "the quick brown fox jumps over the lazy cat"),
    (4L, "")
  ).toDF("id", "text")

  test("jaro_winkler: textbook values, empty contract, codegen path") {
    import graft.functions.JaroWinkler
    // classic published examples (prefix boost active on all three)
    assert(math.abs(JaroWinkler.similarity("martha", "marhta") - 0.9611111111111111) < 1e-12)
    assert(math.abs(JaroWinkler.similarity("dwayne", "duane") - 0.84) < 1e-12)
    assert(math.abs(JaroWinkler.similarity("dixon", "dicksonx") - 0.8133333333333332) < 1e-9)
    // C-library edge contract: ANY empty input is 0, even "" vs ""
    assert(JaroWinkler.similarity("", "") == 0.0)
    assert(JaroWinkler.similarity("a", "") == 0.0)
    assert(JaroWinkler.similarity("abc", "abc") == 1.0)
    assert(JaroWinkler.similarity("abc", "xyz") == 0.0) // no matches
    // SQL registration runs through the generated-code path
    val got = spark
      .sql("SELECT jaro_winkler('martha', 'marhta') AS jw, jaro_winkler('', '') AS z")
      .head()
    assert(math.abs(got.getDouble(0) - 0.9611111111111111) < 1e-12 && got.getDouble(1) == 0.0)
  }

  test("rolling_hash64 in SQL: default base, explicit base, parity with expression form") {
    docs.createOrReplaceTempView("gf_docs")
    val viaSql = spark
      .sql("SELECT id, rolling_hash64(text) AS h, rolling_hash64(text, 31) AS h31 FROM gf_docs")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    // independent reimplementation of the fold, straight over UTF-8 bytes
    def roll(s: String, base: Long): Long =
      s.getBytes("UTF-8").foldLeft(0L)((h, b) => h * base + (b & 0xff))
    val expected = docs.collect()
      .map(r => (r.getLong(0), roll(r.getString(1), 1000003L), roll(r.getString(1), 31L)))
      .sortBy(_._1)
    assert(viaSql.toSeq == expected.toSeq)
    assert(viaSql.map(_._2).distinct.length == 4, "distinct texts must hash distinctly")
  }

  test("simhash64 + token_shingle_hashes + minhash_signature compose in pure SQL") {
    docs.createOrReplaceTempView("gf_docs")
    val sig = spark.sql(
      """SELECT id,
             simhash64(text) AS sh,
             token_shingle_hashes(text, 3) AS shingles,
             minhash_signature(token_shingle_hashes(text, 3), 16, 42) AS mh
         FROM gf_docs WHERE text <> ''""")
    val rows = sig.collect().sortBy(_.getLong(0))
    assert(rows.length == 3)
    // near-identical docs 1 and 3 agree on most minhash coordinates;
    // unrelated doc 2 does not
    val mh = rows.map(r => r.getSeq[Long](3))
    def agree(a: Seq[Long], b: Seq[Long]) = a.zip(b).count { case (x, y) => x == y }
    assert(mh.forall(_.length == 16))
    assert(agree(mh(0), mh(2)) > agree(mh(0), mh(1)))
    // shingle parity with the registered-temp-function path used internally
    graft.functions.TokenShingleHashes.register(spark, "tsh_ref", 3)
    val ref = spark.sql("SELECT id, tsh_ref(text) AS s FROM gf_docs WHERE text <> ''")
      .collect().sortBy(_.getLong(0)).map(_.getSeq[Long](1))
    assert(rows.map(_.getSeq[Long](2)).toSeq == ref.toSeq)
  }

  test("vector_cosine in SQL matches the HOF composition") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 2.0f), Array(1.0f, 0.0f, 2.0f)),
      (2L, Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(1.0f, 2.0f, 3.0f), Array(-1.0f, 0.5f, 0.25f))
    ).toDF("id", "a", "b")
    vecs.createOrReplaceTempView("gf_vecs")
    val sql = spark.sql("SELECT id, vector_cosine(a, b) AS c FROM gf_vecs")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    val hof = vecs.select($"id", VectorOps.cosine($"a", $"b").as("c"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    sql.zip(hof).foreach { case ((_, s), (_, h)) => assert(math.abs(s - h) < 1e-12) }
    assert(math.abs(sql(0)._2 - 1.0) < 1e-12 && math.abs(sql(1)._2) < 1e-12)
  }

  test("the spark.sql.extensions class path registers the kernels (fresh SessionState)") {
    // newSession() builds a FRESH SessionState (empty temp registry) from
    // the session's extensions: if the kernels resolve there, they came
    // through GraftExtensions.injectFunction — the production
    // `--conf spark.sql.extensions` wiring (SparkTestSession sets it) —
    // not through this suite's registerAll on the base session.
    val s2 = spark.newSession()
    val r = s2.sql(
      """SELECT simhash64('a b c') AS sh,
             rolling_hash64('abc') AS rh,
             size(token_shingle_hashes('a b c d', 2)) AS n""").head()
    assert(r.getInt(2) == 3)
    // and DESCRIBE FUNCTION knows them (ExpressionInfo registered)
    val desc = s2.sql("DESCRIBE FUNCTION simhash64").collect().map(_.getString(0)).mkString("\n")
    assert(desc.contains("simhash64"))
  }

  test("static parameters must be literals — analysis-time error, not runtime") {
    docs.createOrReplaceTempView("gf_docs")
    val e = intercept[AnalysisException] {
      spark.sql("SELECT minhash_signature(token_shingle_hashes(text, 3), id, 42) FROM gf_docs")
        .collect()
    }
    assert(e.getMessage.contains("num_perm"))
    val e2 = intercept[AnalysisException] {
      spark.sql("SELECT token_shingle_hashes(text) FROM gf_docs").collect()
    }
    assert(e2.getMessage.contains("token_shingle_hashes"))
  }

  test("shingle_posexplode: UDTF rows in SELECT list and LATERAL VIEW, ≡ composed form") {
    docs.createOrReplaceTempView("gf_docs")
    val got = spark
      .sql("""SELECT id, s.pos, s.shingle
              FROM gf_docs LATERAL VIEW shingle_posexplode(text, 3) s AS pos, shingle""")
      .as[(Long, Int, String)].collect().toSet
    // composed built-in equivalent
    val want = spark
      .sql("""SELECT id, posexplode(transform(sequence(0, size(split(text, ' ')) - 3),
                i -> array_join(slice(split(text, ' '), i + 1, 3), ' '))) AS (pos, shingle)
              FROM gf_docs WHERE size(split(text, ' ')) >= 3""")
      .as[(Long, Int, String)].collect().toSet
    assert(got == want)
    assert(got.exists(_._3 == "the quick brown"))
    // empty text ("" splits to one token < n): no rows, doc dropped like explode
    assert(!got.exists(_._1 == 4L))
    // SELECT-list generator with multi-alias also works
    val inline = spark
      .sql("SELECT shingle_posexplode('a b c d', 2) AS (p, sh) FROM (SELECT 1)")
      .as[(Int, String)].collect().toSet
    assert(inline == Set((0, "a b"), (1, "b c"), (2, "c d")))
    // static width must be a literal — analysis-time error
    val e = intercept[AnalysisException] {
      spark.sql("SELECT shingle_posexplode(text, id) FROM gf_docs").collect()
    }
    assert(e.getMessage.contains("shingle_posexplode"))
  }
}
