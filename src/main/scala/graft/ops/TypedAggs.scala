package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator[IN, BUF, OUT]` surface (SURVEY §2.B custom typed agg;
  * the reference exposes arbitrary Python aggregation through Ibis/Polars
  * UDFs — reference: projects/feray/pyproject.toml:24-25).
  */
object TypedAggs {

  /** Chan et al. parallel-merge mean/variance state. */
  final case class MomentState(n: Long, mean: Double, m2: Double)

  final case class Moments(n: Long, mean: Double, varSamp: Double, stdSamp: Double)

  /** Numerically stable streaming mean/variance (Welford update, Chan merge)
    * — unlike the sum-of-squares formula, this never catastrophically
    * cancels, which matters when a 100 TB column has mean ≫ stddev. */
  class WelfordVariance extends Aggregator[Double, MomentState, Moments] {
    override def zero: MomentState = MomentState(0L, 0.0, 0.0)

    override def reduce(s: MomentState, x: Double): MomentState = {
      val n = s.n + 1
      val d = x - s.mean
      val mean = s.mean + d / n
      MomentState(n, mean, s.m2 + d * (x - mean))
    }

    override def merge(a: MomentState, b: MomentState): MomentState = {
      if (a.n == 0) return b
      if (b.n == 0) return a
      val n = a.n + b.n
      val d = b.mean - a.mean
      MomentState(n,
        a.mean + d * b.n / n,
        a.m2 + b.m2 + d * d * a.n * b.n / n)
    }

    override def finish(s: MomentState): Moments =
      if (s.n < 2) Moments(s.n, s.mean, Double.NaN, Double.NaN)
      else {
        val v = s.m2 / (s.n - 1)
        Moments(s.n, s.mean, v, math.sqrt(v))
      }

    override def bufferEncoder: Encoder[MomentState] = Encoders.product[MomentState]
    override def outputEncoder: Encoder[Moments] = Encoders.product[Moments]
  }

  def welford: org.apache.spark.sql.TypedColumn[Double, Moments] =
    new WelfordVariance().toColumn
}
