package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke: every declared query runs on sf0.001 and yields rows; entry()
  * yields the one-row summary. Value-level correctness is checked by the
  * DuckDB oracle (driver + scripts/local_verify.py).
  */
class QueriesSmokeSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("entry() produces a non-empty summary") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[Long]("total_requests_processed") > 0L)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and returns rows on sf0.001") {
      val df = fn(spark, sfDir)
      assert(df.count() > 0, s"query $name returned no rows")
      // Rows-only queries go through the driver's pandas capture, which
      // sorts every column — a non-atomic column (array/struct/map) is
      // unhashable there and turns the row into a harness crash (the
      // round-4 q42 regression). Oracle-checked queries hit the same
      // sort path, so the contract is universal: scalar columns only.
      import org.apache.spark.sql.types.{ArrayType, DecimalType, MapType, StructType}
      val nonScalar = df.schema.fields.filter(f =>
        f.dataType.isInstanceOf[ArrayType] || f.dataType.isInstanceOf[MapType] ||
          f.dataType.isInstanceOf[StructType])
      assert(
        nonScalar.isEmpty,
        s"query $name emits non-scalar columns ${nonScalar.map(_.name).mkString(", ")} — " +
          "unsortable by the driver's capture layer")
      // DECIMAL outputs are banned: Spark and DuckDB widen decimal
      // aggregates differently (sum(DECIMAL(18,2)) → DECIMAL(28,2) vs
      // DECIMAL(38,2)/HUGEINT) and decimal values serialize differently
      // through the driver's hash even when every cell is equal — this
      // class cost three rounds of q256/q391/q392 hash mismatches with
      // zero differing cells. Emit DOUBLE (snapped) or BIGINT
      // integer-cents instead; decimals may still be used INSIDE a plan
      // for exact intermediate arithmetic.
      val decimals = df.schema.fields.filter(_.dataType.isInstanceOf[DecimalType])
      assert(
        decimals.isEmpty,
        s"query $name emits DECIMAL columns ${decimals.map(_.name).mkString(", ")} — " +
          "not hash-portable through the driver's capture layer (cast to DOUBLE " +
          "or emit BIGINT integer units)")
    }
  }

  test("oracle SQL map only references declared queries") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
