package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, LongType}

/** SQL registration of the engine's custom Catalyst expressions, so the
  * pure-SQL surface (`spark.sql`, JDBC/Thrift clients, SQL notebooks) has
  * the same kernels as the DataFrame API:
  *
  *   - `rolling_hash64(text[, base])` — document fingerprint
  *     ([[RollingHash64]]; base defaults to 1000003)
  *   - `simhash64(text)` — 64-bit SimHash ([[SimHash64]])
  *   - `token_shingle_hashes(text, n)` — distinct xxhash64'd word
  *     n-shingles ([[TokenShingleHashes]])
  *   - `minhash_signature(hashes, num_perm, seed)` — MinHash signature of
  *     a hashed-shingle set ([[MinHashSignature]])
  *   - `vector_cosine(a, b)` — cosine similarity of two float/double
  *     arrays ([[VectorCosine]])
  *
  * Static parameters (shingle width, permutation count, seed, hash base)
  * must be foldable literals — they configure the compiled kernel, they
  * are not per-row inputs — and violations surface as analysis errors,
  * not runtime failures.
  *
  * Wired two ways: [[graft.plans.GraftExtensions]] calls
  * `injectFunction` for `spark.sql.extensions`-configured sessions, and
  * [[GraftFunctions.registerAll]] installs into a LIVE session's
  * function registry (extension classes only apply at session build).
  */
object GraftFunctions {

  /** A placeholder that fails analysis (CheckAnalysis runs
    * `checkInputDataTypes` on every resolved expression) — throwing from
    * the registry builder itself would surface as an opaque wrapped
    * SparkException; this path produces a first-class AnalysisException
    * carrying the kernel's own message.
    */
  private case class InvalidKernelCall(name: String, detail: String, children: Seq[Expression])
      extends Expression with org.apache.spark.sql.catalyst.expressions.Unevaluable {
    override def dataType: org.apache.spark.sql.types.DataType =
      org.apache.spark.sql.types.NullType
    override def nullable: Boolean = true
    override def prettyName: String = name
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(detail)
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
      copy(children = c)
  }

  /** A foldable integral argument, else Left(analysis failure). */
  private def literalLong(e: Expression, fn: String, arg: String): Either[String, Long] =
    e match {
      case Literal(v: Int, IntegerType) => Right(v.toLong)
      case Literal(v: Long, LongType) => Right(v)
      case other =>
        Left(s"$fn: <$arg> must be an integer literal, got ${other.sql}")
    }

  private def arity(fn: String, args: Seq[Expression], want: String): Expression =
    InvalidKernelCall(fn, s"$fn expects $want arguments, got ${args.size}", args)

  private def orInvalid(fn: String, args: Seq[Expression])(e: Either[String, Expression]): Expression =
    e.fold(msg => InvalidKernelCall(fn, msg, args), identity)

  type Builder = Seq[Expression] => Expression

  /** (name, usage doc, builder) for every SQL-exposed kernel. */
  val registrations: Seq[(FunctionIdentifier, ExpressionInfo, Builder)] = Seq(
    make("rolling_hash64",
      "_FUNC_(text[, base]) - 64-bit polynomial rolling hash of the string's UTF-8 bytes.") {
      case Seq(s) => RollingHash64(s, 1000003L)
      case args @ Seq(s, b) =>
        orInvalid("rolling_hash64", args)(
          literalLong(b, "rolling_hash64", "base").map(RollingHash64(s, _)))
      case args => arity("rolling_hash64", args, "1 or 2")
    },
    make("simhash64",
      "_FUNC_(text) - 64-bit SimHash over lowercased whitespace tokens.") {
      case Seq(s) => SimHash64(s)
      case args => arity("simhash64", args, "1")
    },
    make("token_shingle_hashes",
      "_FUNC_(text, n) - distinct xxhash64'd word n-shingles of the text.") {
      case args @ Seq(s, n) =>
        orInvalid("token_shingle_hashes", args)(
          literalLong(n, "token_shingle_hashes", "n").map(w => TokenShingleHashes(s, w.toInt)))
      case args => arity("token_shingle_hashes", args, "2")
    },
    make("minhash_signature",
      "_FUNC_(hashes, num_perm, seed) - MinHash signature (array<long>) of a hashed-shingle set.") {
      case args @ Seq(h, p, seed) =>
        orInvalid("minhash_signature", args)(for {
          np <- literalLong(p, "minhash_signature", "num_perm")
          sd <- literalLong(seed, "minhash_signature", "seed")
        } yield MinHashSignature(h, np.toInt, sd))
      case args => arity("minhash_signature", args, "3")
    },
    make("jaro_winkler",
      "_FUNC_(a, b) - Jaro-Winkler similarity in [0,1]; empty input scores 0.") {
      case Seq(a, b) => JaroWinkler(a, b)
      case args => arity("jaro_winkler", args, "2")
    },
    make("vector_cosine",
      "_FUNC_(a, b) - cosine similarity of two numeric arrays (NaN when a norm is 0).") {
      case Seq(a, b) => VectorCosine(a, b)
      case args => arity("vector_cosine", args, "2")
    },
    make("shingle_posexplode",
      "_FUNC_(text, n) - table function: one row per word n-shingle, (pos, shingle).") {
      case args @ Seq(s, n) =>
        orInvalid("shingle_posexplode", args)(
          literalLong(n, "shingle_posexplode", "n").map(w => ShingleExplode(s, w.toInt)))
      case args => arity("shingle_posexplode", args, "2")
    },
    make("space_saving_topk",
      "_FUNC_(key, capacity) - aggregate: SpaceSaving heavy hitters, array<struct<key,est,err>>.") {
      case args @ Seq(k, cap) =>
        orInvalid("space_saving_topk", args)(
          literalLong(cap, "space_saving_topk", "capacity").map(c => SpaceSavingTopK(k, c.toInt)))
      case args => arity("space_saving_topk", args, "2")
    }
  )

  private def make(name: String, usage: String)(builder: Builder)
      : (FunctionIdentifier, ExpressionInfo, Builder) =
    (FunctionIdentifier(name),
      // full (non-deprecated) constructor; shows under DESCRIBE FUNCTION
      new ExpressionInfo("graft.functions.GraftFunctions", null, name, usage,
        "", "", "", "", "4.0.0", "", "built-in"),
      builder)

  /** Install every kernel into a live session (idempotent — re-registration
    * replaces the same binding).
    */
  def registerAll(spark: SparkSession): Unit = {
    val registry: FunctionRegistry = spark.sessionState.functionRegistry
    registrations.foreach { case (ident, info, builder) =>
      registry.registerFunction(ident, info, builder)
    }
  }
}
