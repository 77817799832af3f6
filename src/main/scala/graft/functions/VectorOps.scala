package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from Spark's
  * higher-order functions (`zip_with` / `aggregate`) — declarative and
  * UDF-free, but NOTE: Spark HOFs are interpreted (no codegen), so for
  * per-pair hot paths prefer [[VectorCosine]], which folds the same math
  * in one compiled pass with bit-identical results.
  *
  * All math is done in Double after an explicit per-element cast: the
  * DuckDB oracle mirrors the same cast + left-fold order, giving
  * bit-identical sums.
  */
object VectorOps {

  /** Element-wise cast to double. */
  def toDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Dot product (left fold in element order). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Sum of squares. */
  def sq(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x * x)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(sq(a))

  /** Cosine similarity of two double vectors; NaN when either norm is 0. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))
}
