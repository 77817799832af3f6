package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** MULTI-PROBE SRP-LSH probe sequences (Lv et al. 2007): for each table,
  * the base sign-bit signature followed by `nprobe − 1` single-bit
  * perturbations, flipping the LOWEST-|dot| planes first — the planes
  * the vector was least confidently on one side of, i.e. the buckets a
  * true neighbor most likely fell into. Returns `array<int>` of length
  * `tables × nprobe`, probes for table t at positions [t·nprobe,
  * (t+1)·nprobe).
  *
  * Why: recall of plain SRP-LSH scales with TABLES, and each table is a
  * full corpus-sized index (signature column + shuffle). Multi-probe
  * buys the same recall from extra probe JOINS on the SAME index — at
  * 100 TB, probing 3 buckets in 4 tables beats storing 12 tables. The
  * perturbation order is deterministic (|dot| asc, plane index asc) and
  * every dot is the same ordered 64-term fold as [[SrpSignatures]], so
  * a SQL engine replays the exact probe sequence from the md5 plane
  * family.
  */
case class SrpMultiProbe(
    child: Expression,
    planes: Array[Double], // [table][plane][dim] flattened
    tables: Int,
    planesPerTable: Int,
    dim: Int,
    nprobe: Int
) extends UnaryExpression
    with CodegenFallback {

  require(nprobe >= 1 && nprobe <= planesPerTable + 1,
    s"nprobe must be in [1, planesPerTable + 1], got $nprobe")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "srp_multi_probe"

  override def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData].toFloatArray()
    val d = math.min(dim, vec.length)
    val out = new Array[Int](tables * nprobe)
    val dots = new Array[Double](planesPerTable)
    var t = 0
    while (t < tables) {
      var sig = 0
      var p = 0
      while (p < planesPerTable) {
        val base = (t * planesPerTable + p) * dim
        var dot = 0.0
        var i = 0
        while (i < d) {
          dot += vec(i) * planes(base + i)
          i += 1
        }
        dots(p) = dot
        if (dot >= 0) sig |= 1 << p
        p += 1
      }
      // perturbation order: |dot| ascending, plane index tiebreak
      val order = (0 until planesPerTable).sortBy(p => (math.abs(dots(p)), p))
      out(t * nprobe) = sig
      var r = 1
      while (r < nprobe) {
        out(t * nprobe + r) = sig ^ (1 << order(r - 1))
        r += 1
      }
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SrpMultiProbe {

  /** Register `<name>(vec)` over the md5-derived plane family (the
    * oracle-replayable one — [[SrpSignatures.makePlanesMd5]]).
    */
  def registerMd5(
      spark: SparkSession,
      name: String,
      dim: Int,
      tables: Int,
      planesPerTable: Int,
      nprobe: Int
  ): Unit = {
    val planes = SrpSignatures.makePlanesMd5(dim, tables, planesPerTable)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name,
      exprs => SrpMultiProbe(exprs.head, planes, tables, planesPerTable, dim, nprobe),
      "built-in"
    )
  }
}
