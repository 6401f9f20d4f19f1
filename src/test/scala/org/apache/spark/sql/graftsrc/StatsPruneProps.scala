package org.apache.spark.sql.graftsrc

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.types.LongType

/** Property layer for the file-skipping decision
  * ([[StatsFileIndex.survives]] / `boundOf` — SURVEY B1.9): the
  * decision is CORRECTNESS-CRITICAL in exactly one direction — a
  * pruned file must be PROVABLY empty under the predicate (a kept file
  * is merely re-filtered by Spark). The soundness property is checked
  * exhaustively per sample: on small integer ranges, `survives ==
  * false` implies NO value in [min, max] satisfies every bound, and
  * `survives == true` implies SOME value does (tightness — the index
  * never keeps a provably-empty file either, on single-column
  * conjunctions). Plus: absent stats always survive, and `boundOf`
  * extracts the semantics-preserving bound from every supported
  * expression shape including the literal-on-the-left mirrors. */
object StatsPruneProps extends Properties("graftsrc.statsprune") {

  private val ops = Seq(">=", ">", "<=", "<", "=")

  private def sat(op: String, w: Long, v: Long): Boolean = op match {
    case ">=" => w >= v
    case ">"  => w > v
    case "<=" => w <= v
    case "<"  => w < v
    case "="  => w == v
  }

  private val rangeGen: Gen[(Long, Long)] = for {
    mn <- Gen.chooseNum(-8L, 8L)
    len <- Gen.chooseNum(0L, 6L)
  } yield (mn, mn + len)

  private val boundGen: Gen[StatsFileIndex.Bound] = Gen.oneOf(
    for {
      op <- Gen.oneOf(ops)
      v <- Gen.chooseNum(-10L, 10L)
    } yield StatsFileIndex.Bound("c", op, v),
    for {
      vs <- Gen.nonEmptyListOf(Gen.chooseNum(-10L, 10L))
    } yield StatsFileIndex.Bound("c", "in", 0L, vs))

  private def satB(b: StatsFileIndex.Bound, w: Long): Boolean =
    if (b.op == "in") b.vs.contains(w) else sat(b.op, w, b.v)

  property("SOUND on conjunctions: some value in [min,max] satisfying " +
      "every bound ⟹ the file survives (pruning never loses a " +
      "possible row; the converse is deliberately not claimed — " +
      "per-bound checks keep contradictory conjunctions, which Spark " +
      "then filters to empty)") =
    forAll(rangeGen, Gen.listOfN(3, boundGen)) { case ((mn, mx), bs) =>
      val kept = StatsFileIndex.survives(
        Some(Map("c" -> ((mn, mx)))), bs)
      val satisfiable = (mn to mx).exists(w => bs.forall(satB(_, w)))
      !satisfiable || kept
    }

  property("TIGHT per single bound: a one-bound filter prunes exactly " +
      "the provably-empty files") =
    forAll(rangeGen, boundGen) { case ((mn, mx), b) =>
      val kept = StatsFileIndex.survives(
        Some(Map("c" -> ((mn, mx)))), Seq(b))
      val satisfiable = (mn to mx).exists(w => satB(b, w))
      kept == satisfiable
    }

  property("absent stats (file or column) always survive") =
    forAll(Gen.listOfN(3, boundGen)) { bs =>
      StatsFileIndex.survives(None, bs) &&
        StatsFileIndex.survives(Some(Map("other" -> ((0L, 0L)))), bs)
    }

  private val attr = AttributeReference("c", LongType)()

  property("boundOf preserves semantics for every supported shape " +
      "(incl. literal-on-the-left mirrors and IN), checked exhaustively " +
      "on a small domain") =
    forAll(Gen.chooseNum(-5L, 5L), Gen.oneOf(0, 1, 2, 3, 4),
        Gen.oneOf(true, false)) { (v, opIdx, flipped) =>
      val lit = Literal(v, LongType)
      val e =
        if (!flipped) opIdx match {
          case 0 => GreaterThanOrEqual(attr, lit)
          case 1 => GreaterThan(attr, lit)
          case 2 => LessThanOrEqual(attr, lit)
          case 3 => LessThan(attr, lit)
          case 4 => EqualTo(attr, lit)
        } else opIdx match {
          case 0 => GreaterThanOrEqual(lit, attr)
          case 1 => GreaterThan(lit, attr)
          case 2 => LessThanOrEqual(lit, attr)
          case 3 => LessThan(lit, attr)
          case 4 => EqualTo(lit, attr)
        }
      val b = StatsFileIndex.boundOf(e).get
      (-7L to 7L).forall { w =>
        // the expression's truth at w ≡ the extracted bound's truth
        val expTruth =
          if (!flipped) sat(Seq(">=", ">", "<=", "<", "=")(opIdx), w, v)
          else sat(Seq(">=", ">", "<=", "<", "=")(opIdx), v, w)
        satB(b, w) == expTruth
      }
    }

  property("And splits into conjuncts; In extracts the value list") =
    forAll(Gen.chooseNum(-5L, 5L), Gen.nonEmptyListOf(
        Gen.chooseNum(-5L, 5L))) { (v, vs) =>
      val e = And(GreaterThanOrEqual(attr, Literal(v, LongType)),
        In(attr, vs.map(Literal(_, LongType))))
      val cs = StatsFileIndex.conjuncts(e)
      val bounds = cs.flatMap(StatsFileIndex.boundOf)
      bounds.size == 2 &&
        bounds.exists(b => b.op == ">=" && b.v == v) &&
        bounds.exists(b => b.op == "in" && b.vs == vs)
    }
}
