package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer rule: rewrite a pure-inequality band join
  * `a JOIN b ON a.v >= b.lo AND a.v < b.hi` into the binned equi-join
  * [[graft.operators.Joins.rangeJoinBinned]] builds by hand — Spark has no
  * equi-key to hash on, so it would otherwise plan BroadcastNestedLoopJoin
  * (O(|a|·|b|) comparisons; a non-starter when the band side isn't tiny).
  *
  * The rewrite projects `floor(v / w)` on the value side, explodes each
  * band to the bins it covers (`sequence(floor(lo/w), floor(hi/w))`) on the
  * band side, joins on the bin, and keeps the original predicate as the
  * residual filter. Semantics are identical: a value's bin is unique and a
  * band covers it at most once, so no duplicates; the residual drops
  * boundary bins' false positives. A final projection restores the
  * original output attributes.
  *
  * Opt-in: fires only when `spark.graft.rangeJoin.binWidth` is set
  * positive — bin width is workload knowledge (≈ median band width), not
  * something the optimizer should guess. Both orientations (value on
  * either side) are handled; conditions with any other shape are left for
  * Spark to plan as usual.
  */
object BinnedRangeJoinRule extends Rule[LogicalPlan] {

  val BinWidthKey = "spark.graft.rangeJoin.binWidth"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = conf.getConfString(BinWidthKey, "0").toDouble
    if (w <= 0) plan
    else plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        rewrite(j, left, right, cond, hint, w).getOrElse(j)
    }
  }

  private def numeric(e: Expression): Boolean =
    e.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
                      cond: Expression, hint: JoinHint,
                      w: Double): Option[LogicalPlan] = {
    // exactly `v >= lo AND v < hi`, all deterministic numerics
    val parts = cond match {
      case And(GreaterThanOrEqual(v, lo), LessThan(v2, hi))
        if v.semanticEquals(v2) => Some((v, lo, hi))
      case And(LessThan(v, hi), GreaterThanOrEqual(v2, lo))
        if v.semanticEquals(v2) => Some((v, lo, hi))
      case _ => None
    }
    parts.flatMap { case (v, lo, hi) =>
      if (!Seq(v, lo, hi).forall(e => e.deterministic && numeric(e))) None
      else {
        val vSide = // which child the value expression reads from
          if (v.references.subsetOf(left.outputSet)) Some(left)
          else if (v.references.subsetOf(right.outputSet)) Some(right)
          else None
        vSide.flatMap { vs =>
          val bandSide = if (vs eq left) right else left
          val boundsOk = (lo.references ++ hi.references)
            .subsetOf(bandSide.outputSet)
          if (!boundsOk) None
          else {
            def bin(e: Expression) =
              Floor(Divide(Cast(e, DoubleType), Literal(w)))
            val vBin = Alias(bin(v), "__graft_vbin")()
            val valueP = Project(vs.output :+ vBin, vs)
            val bBin = AttributeReference("__graft_bbin", LongType,
              nullable = false)()
            // timeZoneId must be pinned here: Sequence is TimeZoneAware and
            // counts as unresolved without it, and the analyzer's
            // ResolveTimeZone has already run by optimization time. The
            // step is left for Sequence to infer: an explicit 1 throws
            // "Illegal sequence boundaries" on a malformed band (lo > hi)
            // that the original nested-loop plan would simply not match —
            // the inferred descending bins are then dropped by the
            // residual predicate, preserving the no-match semantics.
            val gen = Generate(
              Explode(new Sequence(bin(lo), bin(hi), None,
                Some(conf.sessionLocalTimeZone))),
              unrequiredChildIndex = Nil, outer = false, qualifier = None,
              generatorOutput = Seq(bBin), child = bandSide)
            val (nl, nr) =
              if (vs eq left) (valueP, gen) else (gen: LogicalPlan, valueP)
            val newJoin = Join(nl, nr, Inner,
              Some(And(EqualTo(vBin.toAttribute, bBin), cond)), hint)
            Some(Project(j.output, newJoin))
          }
        }
      }
    }
  }
}
