package graft.plans

import graft.functions.TopKLong
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Catalyst OPTIMIZER RULE — the (c)-tier extension point of the
  * build doctrine: rewrite the ubiquitous window top-k pattern
  *
  * {{{ Filter(rn <= k, Window(rn = row_number() OVER
  *       (PARTITION BY p ORDER BY score DESC, payload ASC), child)) }}}
  *
  * into the bounded-heap aggregate [[graft.functions.TopKLong]]:
  *
  * {{{ Project(p, score, payload, rn = pos + 1,
  *       Generate(posexplode(tk),
  *         Aggregate(p, top_k_long(score, payload, k) AS tk, child))) }}}
  *
  * The window plan must exchange and SORT every row of every group
  * before row_number can cut; the rewritten plan's map-side combine
  * holds ≤ k pairs per (group, partition) and ships only those — the
  * same answer (both sides share the (score DESC, payload ASC) total
  * order) for a shuffle of k rows per group instead of the table.
  *
  * FIRES ONLY when provably safe, else leaves the plan alone:
  *   - single window expression, exactly `row_number()`;
  *   - order is (LongType attr DESC, LongType attr ASC), both
  *     non-nullable (the heap skips nulls; row_number ranks them);
  *   - partition keys are bare attributes;
  *   - the window child's output ⊆ {partition keys, score, payload} —
  *     i.e. column pruning already proved nothing else rides along
  *     (a rider column cannot survive an aggregate);
  *   - the filter is `rn <= intLiteral` with k in TopKLong's [1, 1024]
  *     buffer contract.
  * The rewritten subtree re-exposes the ORIGINAL attribute ids
  * (aliases pinned to the old exprIds), so parents resolve unchanged.
  *
  * Gated by `spark.graft.topk.rewrite` (default false): injected
  * globally via [[graft.functions.GraftExtensions]] but inert until a
  * session opts in — the conservative deployment posture for a
  * semantics-preserving but plan-shape-changing rule.
  */
object TopKRewrite extends Rule[LogicalPlan] {

  private val FLAG = "spark.graft.topk.rewrite"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(FLAG, "false").toBoolean) return plan
    plan.transformUp {
      case Filter(LessThanOrEqual(rn: AttributeReference, Literal(k: Int, IntegerType)), w: Window)
          if k >= 1 && k <= 1024 =>
        tryRewrite(w, rn, k).getOrElse(
          Filter(LessThanOrEqual(rn, Literal(k, IntegerType)), w))
    }
  }

  private def tryRewrite(w: Window, rn: AttributeReference, k: Int): Option[LogicalPlan] =
    (w.windowExpressions, w.orderSpec) match {
      case (Seq(alias @ Alias(WindowExpression(_: RowNumber, _), _)),
            Seq(SortOrder(score: AttributeReference, Descending, _, _),
                SortOrder(payload: AttributeReference, Ascending, _, _)))
          if alias.exprId == rn.exprId &&
            score.dataType == LongType && !score.nullable &&
            payload.dataType == LongType && !payload.nullable &&
            w.partitionSpec.forall(_.isInstanceOf[AttributeReference]) => {
        val part = w.partitionSpec.map(_.asInstanceOf[AttributeReference])
        val needed = AttributeSet(part ++ Seq(score, payload))
        if (!w.child.outputSet.subsetOf(needed)) None
        else {
          val tk = Alias(TopKLong(score, payload, k).toAggregateExpression(), "tk")()
          val aggregate = Aggregate(part, part :+ tk, w.child)
          // posexplode of array<struct<score,payload>> emits
          // (pos: int, col: struct<score,payload>) — the struct is NOT
          // flattened; fields come back out via GetStructField
          val posOut = AttributeReference("pos", IntegerType, nullable = false)()
          val colOut = AttributeReference("tkcol",
            new org.apache.spark.sql.types.StructType()
              .add("score", LongType, nullable = false)
              .add("payload", LongType, nullable = false),
            nullable = false)()
          val generate = Generate(PosExplode(tk.toAttribute), Nil, outer = false, None,
            Seq(posOut, colOut), aggregate)
          // re-expose the window plan's output under its ORIGINAL ids
          val projections: Seq[NamedExpression] = (w.child.output :+ alias.toAttribute).map {
            case a if a.exprId == score.exprId =>
              Alias(GetStructField(colOut, 0, Some("score")), a.name)(exprId = a.exprId)
            case a if a.exprId == payload.exprId =>
              Alias(GetStructField(colOut, 1, Some("payload")), a.name)(exprId = a.exprId)
            case a if a.exprId == rn.exprId =>
              Alias(Add(posOut, Literal(1, IntegerType)), a.name)(exprId = a.exprId)
            case a => a
          }
          Some(Project(projections, generate))
        }
      }
      case _ => None
    }
}
