package graft.ops

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Numerically-stable mean/variance as a typed `Aggregator` — SURVEY.md §2
  * B4.8 / B11.2 (the sanctioned custom-aggregate path; no internal APIs).
  *
  * Chan et al.'s parallel Welford update: each partition folds locally, and
  * partition buffers merge exactly like the map-side/reduce-side split of a
  * HashAggregate — so the aggregate stays a partial+final two-phase plan
  * with no extra shuffle. Naive sum-of-squares cancels catastrophically for
  * large-mean/small-variance data; this doesn't (see StableStatsSpec).
  */
object StableStats {

  final case class Moments(n: Long, mean: Double, m2: Double)
  final case class MeanVar(n: Long, mean: Double, variance: Double, stddev: Double)

  object WelfordAgg extends Aggregator[Double, Moments, MeanVar] {
    override def zero: Moments = Moments(0L, 0.0, 0.0)

    override def reduce(b: Moments, x: Double): Moments = {
      val n = b.n + 1
      val delta = x - b.mean
      val mean = b.mean + delta / n
      Moments(n, mean, b.m2 + delta * (x - mean))
    }

    override def merge(a: Moments, b: Moments): Moments =
      if (a.n == 0) b
      else if (b.n == 0) a
      else {
        val n = a.n + b.n
        val delta = b.mean - a.mean
        Moments(n,
          a.mean + delta * b.n / n,
          a.m2 + b.m2 + delta * delta * a.n * b.n / n)
      }

    override def finish(m: Moments): MeanVar = {
      val variance = if (m.n < 2) 0.0 else m.m2 / (m.n - 1)
      MeanVar(m.n, m.mean, variance, math.sqrt(variance))
    }

    override def bufferEncoder: Encoder[Moments] = Encoders.product[Moments]
    override def outputEncoder: Encoder[MeanVar] = Encoders.product[MeanVar]
  }

  /** Column form for DataFrame use: `df.agg(stableStats(col("x")))`. */
  def stableStats(c: Column): Column = udaf(WelfordAgg).apply(c)
}
