package graft.ops

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra–Gries heavy-hitters sketch as a typed `Aggregator` — SURVEY.md §2
  * B4.19 / B11.2 (with [[StableStats]], the sanctioned custom-aggregate
  * path). The frequent-items question ("which tokens/domains/users
  * dominate this corpus?") at 100 TB cannot groupBy an unbounded key
  * space; Misra–Gries answers it in k counters per group with a PROVEN
  * mergeable bound (Misra & Gries 1982; merge rule from Agarwal et al.
  * 2012, "Mergeable summaries" — both public methods).
  *
  * Invariant carried through any reduce/merge tree (each decrement round
  * retires ≥ k+1 units of count, so total undercount Δ ≤ (n − Σstored) /
  * (k+1)):
  *
  *   est(x) ≤ true(x) ≤ est(x) + Δ,  Δ = (n − Σ stored counts) / (k+1)
  *
  * so any item with true frequency > n/(k+1) is GUARANTEED present (if it
  * were absent, est 0 would force true ≤ Δ ≤ n/(k+1)). Counts are
  * merge-order-dependent WITHIN the bound — like the HLL/KLL sketches this
  * is TEST-gated, never oracle-declared (SURVEY §7.5.7); the spec asserts
  * the invariant itself at two partitionings rather than a fixed output.
  *
  * Plan shape: partial+final two-phase aggregate like any HashAggregate —
  * the shuffle carries one k-entry map per partition per group, never the
  * key space.
  */
object HeavyHitters {

  final case class MgBuf(n: Long, counts: Map[String, Long])
  final case class ItemCount(item: String, count: Long)
  final case class Result(n: Long, stored: Long, maxError: Long,
      items: Seq[ItemCount])

  final case class MisraGries(k: Int)
      extends Aggregator[String, MgBuf, Result] {
    require(k >= 1)

    override def zero: MgBuf = MgBuf(0L, Map.empty)

    override def reduce(b: MgBuf, x: String): MgBuf = {
      val n = b.n + 1
      b.counts.get(x) match {
        case Some(c) => MgBuf(n, b.counts.updated(x, c + 1))
        case None if b.counts.size < k => MgBuf(n, b.counts.updated(x, 1L))
        case None =>
          // classic decrement: the incoming item cancels against one unit
          // of every stored counter (k+1 count units retired)
          MgBuf(n, b.counts.flatMap { case (i, c) =>
            if (c > 1) Some(i -> (c - 1)) else None
          })
      }
    }

    override def merge(a: MgBuf, b: MgBuf): MgBuf = {
      val summed = b.counts.foldLeft(a.counts) { case (m, (i, c)) =>
        m.updated(i, m.getOrElse(i, 0L) + c)
      }
      val pruned =
        if (summed.size <= k) summed
        else {
          // subtract the (k+1)-th largest count from everything, drop ≤0 —
          // ≥ k+1 count units retired per unit subtracted, preserving the
          // Δ accounting (Agarwal et al. 2012)
          val kth = summed.values.toSeq.sorted(Ordering[Long].reverse)(k)
          summed.flatMap { case (i, c) =>
            if (c > kth) Some(i -> (c - kth)) else None
          }
        }
      MgBuf(a.n + b.n, pruned)
    }

    override def finish(b: MgBuf): Result = {
      val stored = b.counts.values.sum
      Result(b.n, stored, (b.n - stored) / (k + 1),
        b.counts.toSeq.map { case (i, c) => ItemCount(i, c) }
          .sortBy(ic => (-ic.count, ic.item)))
    }

    override def bufferEncoder: Encoder[MgBuf] = Encoders.product[MgBuf]
    override def outputEncoder: Encoder[Result] = Encoders.product[Result]
  }

  /** Column form: `df.agg(heavyHitters(col("token"), 32))` or per group. */
  def heavyHitters(c: Column, k: Int): Column = udaf(MisraGries(k)).apply(c)
}
