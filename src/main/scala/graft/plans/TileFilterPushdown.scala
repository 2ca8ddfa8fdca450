package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Catalyst optimizer rule (the SURVEY §7.3 preference-order "(c)"
  * surface: a `Rule[LogicalPlan]` registered through
  * `SparkSessionExtensions`): tile-bound pushdown for the packed-tile
  * path.
  *
  * A pixel-coordinate crop above `PixelFrame.explodeTiles` optimizes
  * to `Filter((tx·ts + off%ts) ⋈ k, Generate(posexplode(data), …))` —
  * the predicate is evaluated once per EXPLODED pixel row, ts² rows
  * per tile, after the explode has already paid for every tile. This
  * rule recognizes the `base·ts + residual` shape (residual =
  * `off % ts` or `floor(off / ts)`, both in [0, ts) under the
  * posexplode-of-a-ts²-array contract that `PixelFrame.pack`
  * guarantees) and derives the implied TILE bounds:
  *
  *   base·ts + r ≥ a (0 ≤ r < ts)  ⇒  base ≥ ⌊a/ts⌋
  *   base·ts + r ≤ b               ⇒  base ≤ ⌊b/ts⌋
  *
  * which it injects as a conjunctive Filter BELOW the Generate. Whole
  * out-of-window tiles are dropped before exploding — ts² fewer
  * generator rows per pruned tile — while the original pixel-exact
  * filter stays above for correctness. Idempotent (skips predicates
  * already present), so it is safe in a fixed-point batch.
  */
object TileFilterPushdown extends Rule[LogicalPlan] with PredicateHelper {

  private def stripCast(e: Expression): Expression = e match {
    case c: Cast => stripCast(c.child)
    case other => other
  }

  /** Match `base·ts + residual` where the residual only references the
    * generator output and is bounded in [0, ts).
    */
  private def tileLinear(e: Expression, genOut: AttributeSet): Option[(Attribute, Int)] =
    stripCast(e) match {
      case Add(l, r, _) =>
        val sides = Seq(stripCast(l), stripCast(r))
        val mul = sides.collectFirst {
          case Multiply(a: Attribute, Literal(ts: Int, _), _) => (a, ts)
          case Multiply(Literal(ts: Int, _), a: Attribute, _) => (a, ts)
        }
        mul.filter { case (_, ts) =>
          sides.exists { o =>
            o.references.nonEmpty && o.references.subsetOf(genOut) &&
              (stripCast(o) match {
                case Remainder(_, Literal(k: Int, _), _) => k == ts
                case Floor(d) => stripCast(d) match {
                  case Divide(_, Literal(k, _), _) =>
                    k == ts || k == ts.toDouble
                  case _ => false
                }
                case _ => false
              })
          }
        }
      case _ => None
    }

  private def litLong(v: Any): Option[Long] = v match {
    case i: Int => Some(i.toLong)
    case l: Long => Some(l)
    case s: Short => Some(s.toLong)
    case b: Byte => Some(b.toLong)
    case _ => None
  }

  /** Tile-level bounds implied by one pixel-level conjunct. */
  private def derive(conjunct: Expression, genOut: AttributeSet): Seq[Expression] = {
    def lo(base: Attribute, ts: Int, a: Long) =
      GreaterThanOrEqual(base, Literal(Math.floorDiv(a, ts).toInt))
    def hi(base: Attribute, ts: Int, b: Long) =
      LessThanOrEqual(base, Literal(Math.floorDiv(b, ts).toInt))
    conjunct match {
      case GreaterThanOrEqual(e, Literal(v, _)) =>
        (tileLinear(e, genOut), litLong(v)) match {
          case (Some((b, ts)), Some(a)) => Seq(lo(b, ts, a)); case _ => Nil }
      case GreaterThan(e, Literal(v, _)) =>
        (tileLinear(e, genOut), litLong(v)) match {
          case (Some((b, ts)), Some(a)) => Seq(lo(b, ts, a + 1)); case _ => Nil }
      case LessThanOrEqual(e, Literal(v, _)) =>
        (tileLinear(e, genOut), litLong(v)) match {
          case (Some((b, ts)), Some(a)) => Seq(hi(b, ts, a)); case _ => Nil }
      case LessThan(e, Literal(v, _)) =>
        (tileLinear(e, genOut), litLong(v)) match {
          case (Some((b, ts)), Some(a)) => Seq(hi(b, ts, a - 1)); case _ => Nil }
      case EqualTo(e, Literal(v, _)) =>
        (tileLinear(e, genOut), litLong(v)) match {
          case (Some((b, ts)), Some(a)) => Seq(lo(b, ts, a), hi(b, ts, a)); case _ => Nil }
      // mirrored literal-on-the-left forms
      case GreaterThanOrEqual(l @ Literal(_, _), e) => derive(LessThanOrEqual(e, l), genOut)
      case GreaterThan(l @ Literal(_, _), e) => derive(LessThan(e, l), genOut)
      case LessThanOrEqual(l @ Literal(_, _), e) => derive(GreaterThanOrEqual(e, l), genOut)
      case LessThan(l @ Literal(_, _), e) => derive(GreaterThan(e, l), genOut)
      case _ => Nil
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, g @ Generate(_: PosExplode, _, _, _, genOut, gchild)) =>
      val genSet = AttributeSet(genOut)
      val derived = splitConjunctivePredicates(cond)
        .flatMap(derive(_, genSet))
        .filter(_.references.subsetOf(gchild.outputSet))
      val existing = gchild match {
        case Filter(c, _) => splitConjunctivePredicates(c)
        case _ => Nil
      }
      val fresh = derived.filterNot(d => existing.exists(_.semanticEquals(d))).distinct
      if (fresh.isEmpty) f
      else f.copy(child = g.copy(child = Filter(fresh.reduce(And), gchild)))
  }

  /** Install on an existing session (tests/REPL); production sessions
    * get it via `spark.sql.extensions=graft.functions.GraftExtensions`.
    */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(TileFilterPushdown))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ TileFilterPushdown
}
