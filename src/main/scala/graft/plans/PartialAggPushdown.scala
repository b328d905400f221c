package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{ByteType, DecimalType, IntegerType, LongType, ShortType}

/** Partial-aggregation pushdown through inner equi-joins — the one
  * rewrite the reference corpus identifies as missing from Catalyst
  * (`303-spark-sql/303-solutions.scala:45-48`: "Catalyst does not push
  * down aggregations.. thus, the following is a better solution", and the
  * RDD demonstration `302-spark-opt/ExerciseComplete.scala:281-294`
  * "Pushing down aggregations is even better"). The corpus hand-writes
  * the pre-aggregated form per query; this rule performs the rewrite as a
  * real optimizer rule, so ANY agg-over-join in the engine benefits.
  *
  * Rewrite: `Aggregate(G, F(s.cols), Join(l, s, Inner, l.k = s.k))` where
  * every aggregate input comes from side `s` and no group key does,
  * becomes
  * `Aggregate(G, F'(partials), Join(l, Aggregate(s.k, partials, s)))`:
  * the fact side is pre-aggregated by its join keys BELOW the join, so
  * the join and the final aggregate see one row per key instead of one
  * per event. Composition per function (all orthogonal to duplicate keys
  * on either side, because each left row contributes its key's ENTIRE
  * partial — exactly what the unpushed plan sums row-by-row):
  *
  *   sum(e)   → sum(sum_k(e))    (cast back if decimal precision grew)
  *   count(e) → sum(count_k(e))  (coalesced to 0 to keep non-null type)
  *   min(e)   → min(min_k(e)),  max(e) → max(max_k(e))
  *
  * Fires ONLY when (unless `spark.graft.aggPushdown.force=true`):
  *   - the join is Inner with a purely conjunctive equi-condition on
  *     bare attributes;
  *   - every aggregate is a non-distinct, unfiltered sum/count/min/max
  *     with deterministic inputs, all from ONE side — and sums only over
  *     EXACT types (integral/decimal): re-associating a floating-point
  *     sum changes its low-order bits, and whether this rule fires
  *     depends on table stats, so a pushed double sum would make results
  *     drift the day a table crosses the broadcast threshold;
  *   - no grouping expression references that side;
  *   - BOTH join inputs exceed `autoBroadcastJoinThreshold` (a broadcast
  *     join leaves the fact side unshuffled, so pre-aggregating there
  *     would ADD a shuffle — the regression case; under a shuffle join
  *     the pre-aggregation reuses the exchange the join needs anyway,
  *     map-side-combining the fact rows before the network);
  *   - the side is not already an aggregate grouped by the join keys
  *     (idempotence, and respect for hand-pre-aggregated queries).
  *
  * Disable with `spark.graft.aggPushdown.enabled=false`. Average is
  * deliberately not decomposed: sum/count re-association changes double
  * summation order, and the engine's determinism contract keeps
  * fractional aggregates as explicit decimal sum ÷ count (which this
  * rule DOES push, as the sum and count it is written as).
  */
object PartialAggPushdown extends Rule[LogicalPlan] with PredicateHelper {

  private val Pushed = TreeNodeTag[Boolean]("graft.partialAggPushed")

  /** True iff some join input subtree contains an Aggregate — the plan
    * signature of this rule having fired. Shared by the q83 gate query
    * and OptimizerRuleSpec so the detection logic cannot drift.
    */
  def pushedBelowJoin(plan: LogicalPlan): Boolean =
    plan.collect { case j: Join =>
      j.children.exists(_.collectFirst { case a: Aggregate => a }.isDefined)
    }.exists(identity)

  private def flag(key: String, default: Boolean): Boolean =
    try SQLConf.get.getConfString(s"spark.graft.aggPushdown.$key",
      default.toString).toBoolean
    catch { case _: IllegalArgumentException => default }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!flag("enabled", default = true)) return plan
    plan.transformDown {
      case agg: Aggregate if agg.getTagValue(Pushed).isEmpty =>
        stripAttributeProjects(agg.child) match {
          case Some(join) => tryRewrite(agg, join).getOrElse(agg)
          case None => agg
        }
    }
  }

  /** Look through attribute-only Projects (pruning artifacts) between the
    * aggregate and the join; anything computing new values bails.
    */
  private def stripAttributeProjects(p: LogicalPlan): Option[Join] = p match {
    case j: Join => Some(j)
    case Project(list, child) if list.forall(_.isInstanceOf[AttributeReference]) =>
      stripAttributeProjects(child)
    case _ => None
  }

  private def tryRewrite(agg: Aggregate, join: Join): Option[LogicalPlan] = {
    if (join.joinType != Inner) return None
    val condition = join.condition.getOrElse(return None)

    // purely conjunctive equi-join on bare attributes
    val pairs: Seq[(Attribute, Attribute)] =
      splitConjunctivePredicates(condition).map {
        case EqualTo(a: AttributeReference, b: AttributeReference)
            if join.left.outputSet.contains(a) &&
              join.right.outputSet.contains(b) => (a, b)
        case EqualTo(a: AttributeReference, b: AttributeReference)
            if join.left.outputSet.contains(b) &&
              join.right.outputSet.contains(a) => (b, a)
        case _ => return None
      }

    val aggExps = agg.aggregateExpressions.flatMap(_.collect {
      case ae: AggregateExpression => ae
    }).distinct
    if (aggExps.isEmpty) return None
    val pushable = aggExps.forall { ae =>
      !ae.isDistinct && ae.filter.isEmpty &&
        ae.aggregateFunction.children.forall(_.deterministic) &&
        (ae.aggregateFunction match {
          case s: Sum => s.child.dataType match {
            // FP sums re-associate under the rewrite; exact types only
            case _: DecimalType | ByteType | ShortType | IntegerType |
                LongType => true
            case _ => false
          }
          case _: Count | _: Min | _: Max => true
          case _ => false
        })
    }
    if (!pushable) return None

    val funcRefs = AttributeSet(
      aggExps.flatMap(_.aggregateFunction.references))
    val groupRefs = AttributeSet(
      agg.groupingExpressions.flatMap(_.references))

    // choose the side all aggregate inputs come from (count(*) has no
    // refs and can push to either; prefer right, the conventional fact
    // position in this engine's queries)
    val side: Option[Boolean] = // Some(true) = push right side
      if (funcRefs.subsetOf(join.right.outputSet) &&
        groupRefs.intersect(join.right.outputSet).isEmpty) Some(true)
      else if (funcRefs.subsetOf(join.left.outputSet) &&
        groupRefs.intersect(join.left.outputSet).isEmpty) Some(false)
      else None
    val pushRight = side.getOrElse(return None)
    val sidePlan = if (pushRight) join.right else join.left
    val keys = (if (pushRight) pairs.map(_._2) else pairs.map(_._1)).distinct
    if (keys.isEmpty) return None

    // idempotence + respect hand-pre-aggregated shapes: the side is
    // already an aggregate no finer than the join keys
    sidePlan match {
      case a: Aggregate
          if a.groupingExpressions.forall(g =>
            keys.exists(_.semanticEquals(g))) => return None
      case _ =>
    }

    // only under a shuffle join (see scaladoc); forced in tests/gates
    if (!flag("force", default = false)) {
      val threshold = SQLConf.get.autoBroadcastJoinThreshold
      if (threshold >= 0 &&
        (join.left.stats.sizeInBytes <= threshold ||
          join.right.stats.sizeInBytes <= threshold)) return None
    }

    // partial aggregate below the join: one alias per pushed function
    val partialAliases = aggExps.map(ae =>
      Alias(ae, s"_pushed_${ae.aggregateFunction.prettyName}")())
    val partial = Aggregate(
      keys, (keys: Seq[NamedExpression]) ++ partialAliases, sidePlan)

    // final composition per original aggregate expression
    val replacements: Map[AggregateExpression, Expression] =
      aggExps.zip(partialAliases).map { case (ae, pa) =>
        val pAttr = pa.toAttribute
        val composed: Expression = ae.aggregateFunction match {
          case _: Sum =>
            val s = Sum(pAttr).toAggregateExpression()
            if (s.dataType == ae.dataType) s else Cast(s, ae.dataType)
          case _: Count =>
            Coalesce(Seq(
              Sum(pAttr).toAggregateExpression(), Literal(0L, LongType)))
          case _: Min => Min(pAttr).toAggregateExpression()
          case _: Max => Max(pAttr).toAggregateExpression()
          case _ => return None
        }
        ae -> composed
      }.toMap

    val newAggExprs = agg.aggregateExpressions.map(_.transform {
      case ae: AggregateExpression if replacements.contains(ae) =>
        replacements(ae)
    }.asInstanceOf[NamedExpression])

    val newJoin =
      if (pushRight) join.copy(right = partial)
      else join.copy(left = partial)
    val rewritten =
      agg.copy(aggregateExpressions = newAggExprs, child = newJoin)
    rewritten.setTagValue(Pushed, true)
    Some(rewritten)
  }
}
