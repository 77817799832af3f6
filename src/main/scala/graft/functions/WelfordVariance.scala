package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY §2.2 last row): a numerically-stable
  * population-variance `Aggregator[Double, _, Double]` using Welford/
  * Chan's parallel merge — the same partial+final shape Catalyst gives
  * built-ins, so it distributes with map-side partials.
  *
  * Exists to prove the user-extensible aggregate surface; the engine's own
  * queries use the codegen'd built-ins.
  */
final case class WelfordBuf(n: Long, mean: Double, m2: Double)

object WelfordVariance extends Aggregator[Double, WelfordBuf, Double] {

  override def zero: WelfordBuf = WelfordBuf(0L, 0.0, 0.0)

  override def reduce(b: WelfordBuf, x: Double): WelfordBuf = {
    val n = b.n + 1
    val d = x - b.mean
    val mean = b.mean + d / n
    WelfordBuf(n, mean, b.m2 + d * (x - mean))
  }

  override def merge(a: WelfordBuf, b: WelfordBuf): WelfordBuf =
    if (a.n == 0) b
    else if (b.n == 0) a
    else {
      val n = a.n + b.n
      val d = b.mean - a.mean
      WelfordBuf(
        n,
        a.mean + d * b.n / n,
        a.m2 + b.m2 + d * d * a.n.toDouble * b.n / n
      )
    }

  override def finish(b: WelfordBuf): Double =
    if (b.n == 0) Double.NaN else b.m2 / b.n

  override def bufferEncoder: Encoder[WelfordBuf] = Encoders.product[WelfordBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
