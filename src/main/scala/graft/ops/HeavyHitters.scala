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
  * merge-order-dependent WITHIN the bound — in the approximate regime this
  * is TEST-gated like the HLL/KLL sketches (SURVEY §7.5.7); the spec
  * asserts the invariant itself at two partitionings rather than a fixed
  * output. In the EXACT regime (k ≥ per-group distinct items) no reduce or
  * merge ever decrements, so estimates equal true counts, Δ = 0, and the
  * result is merge-order-independent — `agg_heavy_hitters`
  * ([[Relational.queries]]) declares that regime against the DuckDB
  * oracle, proving the sketch end-to-end where determinism permits.
  *
  * Plan shape: partial+final two-phase aggregate like any HashAggregate —
  * the shuffle carries one k-entry map per partition per group, never the
  * key space. The buffer is a MUTABLE map (r11 what's-wrong #2: the
  * earlier immutable `Map.updated` per input row allocated a fresh trie
  * node path per token — fine at spec scale, dominant at 10⁹ rows).
  * Spark's typed-Aggregator path (`ScalaAggregator`, a
  * `TypedImperativeAggregate`) keeps the buffer as a live JVM object
  * inside the hash map and only serializes it at the partial→final
  * exchange, so in-place mutation is both legal and the intended shape;
  * the kryo buffer encoder serializes the java.util.HashMap directly
  * instead of converting it to Catalyst rows per shuffle row.
  * Throughput is measured, not assumed: [[graft.HhVolume]] feeds ≥10M
  * tokens through one aggregate and records tokens/s
  * (dev/hh_volume.json).
  */
object HeavyHitters {

  /** Mutable Misra–Gries state: `n` inputs seen, ≤k stored counters. */
  final class MgBuf(var n: Long, val counts: java.util.HashMap[String, Long])
      extends Serializable

  final case class ItemCount(item: String, count: Long)
  final case class Result(n: Long, stored: Long, maxError: Long,
      items: Seq[ItemCount])

  final case class MisraGries(k: Int)
      extends Aggregator[String, MgBuf, Result] {
    require(k >= 1)

    override def zero: MgBuf = new MgBuf(0L, new java.util.HashMap)

    override def reduce(b: MgBuf, x: String): MgBuf = {
      b.n += 1
      // null unboxes to 0L, and 0-valued counters are never stored, so
      // cur == 0 ⇔ absent — one hash lookup on the hot path
      val cur = b.counts.get(x)
      if (cur != 0L) b.counts.put(x, cur + 1L)
      else if (b.counts.size < k) b.counts.put(x, 1L)
      else {
        // classic decrement: the incoming item cancels against one unit
        // of every stored counter (k+1 count units retired)
        val it = b.counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue > 1L) e.setValue(e.getValue - 1L) else it.remove()
        }
      }
      b
    }

    override def merge(a: MgBuf, b: MgBuf): MgBuf = {
      val bi = b.counts.entrySet().iterator()
      while (bi.hasNext) {
        val e = bi.next()
        a.counts.merge(e.getKey, e.getValue, (x, y) => x + y)
      }
      if (a.counts.size > k) {
        // subtract the (k+1)-th largest count from everything, drop ≤0 —
        // ≥ k+1 count units retired per unit subtracted, preserving the
        // Δ accounting (Agarwal et al. 2012)
        val vals = new Array[Long](a.counts.size)
        var i = 0
        val vi = a.counts.values().iterator()
        while (vi.hasNext) { vals(i) = vi.next(); i += 1 }
        java.util.Arrays.sort(vals)
        val kth = vals(vals.length - 1 - k)
        val it = a.counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue > kth) e.setValue(e.getValue - kth) else it.remove()
        }
      }
      a.n += b.n
      a
    }

    override def finish(b: MgBuf): Result = {
      import scala.jdk.CollectionConverters._
      var stored = 0L
      b.counts.values().asScala.foreach(stored += _)
      Result(b.n, stored, (b.n - stored) / (k + 1),
        b.counts.asScala.toSeq.map { case (i, c) => ItemCount(i, c) }
          .sortBy(ic => (-ic.count, ic.item)))
    }

    override def bufferEncoder: Encoder[MgBuf] = Encoders.kryo[MgBuf]
    override def outputEncoder: Encoder[Result] = Encoders.product[Result]
  }

  /** Column form: `df.agg(heavyHitters(col("token"), 32))` or per group. */
  def heavyHitters(c: Column, k: Int): Column = udaf(MisraGries(k)).apply(c)
}
