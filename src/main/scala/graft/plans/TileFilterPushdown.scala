package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Catalyst optimizer rule (the SURVEY §7.3 preference-order "(c)"
  * surface: a `Rule[LogicalPlan]` registered through
  * `SparkSessionExtensions`): tile-bound pushdown for the packed-tile
  * path.
  *
  * A pixel-coordinate crop above `PixelFrame.explodeTiles` optimizes
  * to `Filter((tx·ts + off%ts) ⋈ k, Generate(posexplode(data), …))` —
  * the predicate is evaluated once per EXPLODED pixel row, ts² rows
  * per tile, after the explode has already paid for every tile. This
  * rule recognizes the `base·ts + residual` shape where the residual
  * is built from the posexplode POSITION attribute (`off % ts` or
  * `floor(off / ts)`) and derives implied TILE bounds injected as a
  * conjunctive Filter BELOW the Generate. Whole out-of-window tiles
  * are dropped before exploding — ts² fewer generator rows per pruned
  * tile — while the original pixel-exact filter stays above for
  * correctness.
  *
  * Soundness (no PixelFrame-contract assumption): the position is
  * non-negative by posexplode semantics, so
  *
  *   r = pos % ts        ∈ [0, ts)                    — always
  *   r = ⌊pos / ts⌋      ∈ [0, ⌈len(arr)/ts⌉)         — always
  *
  * Upper bounds need only r ≥ 0 and are injected statically:
  * `base·ts + r ≤ b ⇒ base ≤ ⌊b/ts⌋`. The LOWER bound
  * `base·ts + r ≥ a ⇒ base ≥ ⌊a/ts⌋` additionally needs r < ts; that
  * holds statically for the `%` form, while for the `⌊/⌋` form it
  * would require len(arr) ≤ ts² — true for packed tiles but not
  * verifiable from the plan, so the rule instead injects the exact
  * runtime guard `base·ts + ⌊(size(arr)−1)/ts⌋ ≥ a` (the tile's true
  * maximum row coordinate; one cheap per-TILE evaluation). An
  * arbitrary user query with the same shape over a non-tile array is
  * therefore never over-pruned. Residuals built from the exploded
  * ELEMENT (which may be negative) are not matched at all. Idempotent
  * (skips predicates already present), so it is safe in a fixed-point
  * batch.
  */
object TileFilterPushdown extends Rule[LogicalPlan] with PredicateHelper {

  private sealed trait Residual
  private case object ModTs extends Residual // pos % ts
  private case object DivTs extends Residual // floor(pos / ts)

  private def stripCast(e: Expression): Expression = e match {
    case c: Cast => stripCast(c.child)
    case other => other
  }

  private def isPos(e: Expression, pos: Attribute): Boolean = stripCast(e) match {
    case a: Attribute => a.semanticEquals(pos)
    case _ => false
  }

  /** Match `base·ts + residual(pos)` → (base, ts, residual form). */
  private def tileLinear(e: Expression, pos: Attribute): Option[(Attribute, Int, Residual)] =
    stripCast(e) match {
      case Add(l, r, _) =>
        val sides = Seq(stripCast(l), stripCast(r))
        val mul = sides.collectFirst {
          case Multiply(a: Attribute, Literal(ts: Int, _), _) if ts > 0 => (a, ts)
          case Multiply(Literal(ts: Int, _), a: Attribute, _) if ts > 0 => (a, ts)
        }
        mul.flatMap { case (base, ts) =>
          def residual(o: Expression): Option[Residual] = o match {
            case Remainder(p, Literal(k: Int, _), _) if k == ts && isPos(p, pos) =>
              Some(ModTs)
            case Floor(d) => stripCast(d) match {
              case Divide(p, Literal(k, _), _)
                  if (k == ts || k == ts.toDouble) && isPos(p, pos) => Some(DivTs)
              case _ => None
            }
            case _ => None
          }
          sides.flatMap(residual).headOption.map(r => (base, ts, r))
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
  private def derive(conjunct: Expression, pos: Attribute, arr: Expression): Seq[Expression] = {
    def lo(base: Attribute, ts: Int, a: Long, res: Residual) = res match {
      case ModTs => // r < ts statically
        Seq(GreaterThanOrEqual(base, Literal(Math.floorDiv(a, ts).toInt)))
      case DivTs => // r < ts only if len ≤ ts² — use the runtime max residual
        val maxR = new IntegralDivide(
          Cast(Subtract(Size(arr, legacySizeOfNull = false), Literal(1)), LongType),
          Literal(ts.toLong))
        Seq(GreaterThanOrEqual(
          Add(Multiply(Cast(base, LongType), Literal(ts.toLong)), maxR), Literal(a)))
    }
    def hi(base: Attribute, ts: Int, b: Long) = // needs only r ≥ 0
      Seq(LessThanOrEqual(base, Literal(Math.floorDiv(b, ts).toInt)))
    conjunct match {
      case GreaterThanOrEqual(e, Literal(v, _)) =>
        (tileLinear(e, pos), litLong(v)) match {
          case (Some((b, ts, res)), Some(a)) => lo(b, ts, a, res); case _ => Nil }
      case GreaterThan(e, Literal(v, _)) =>
        (tileLinear(e, pos), litLong(v)) match {
          case (Some((b, ts, res)), Some(a)) => lo(b, ts, a + 1, res); case _ => Nil }
      case LessThanOrEqual(e, Literal(v, _)) =>
        (tileLinear(e, pos), litLong(v)) match {
          case (Some((b, ts, _)), Some(a)) => hi(b, ts, a); case _ => Nil }
      case LessThan(e, Literal(v, _)) =>
        (tileLinear(e, pos), litLong(v)) match {
          case (Some((b, ts, _)), Some(a)) => hi(b, ts, a - 1); case _ => Nil }
      case EqualTo(e, Literal(v, _)) =>
        (tileLinear(e, pos), litLong(v)) match {
          case (Some((b, ts, res)), Some(a)) => lo(b, ts, a, res) ++ hi(b, ts, a); case _ => Nil }
      // mirrored literal-on-the-left forms
      case GreaterThanOrEqual(l @ Literal(_, _), e) => derive(LessThanOrEqual(e, l), pos, arr)
      case GreaterThan(l @ Literal(_, _), e) => derive(LessThan(e, l), pos, arr)
      case LessThanOrEqual(l @ Literal(_, _), e) => derive(GreaterThanOrEqual(e, l), pos, arr)
      case LessThan(l @ Literal(_, _), e) => derive(GreaterThan(e, l), pos, arr)
      case _ => Nil
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, g @ Generate(pe: PosExplode, _, _, _, genOut, gchild))
        if genOut.length == 2 => // (pos, col)
      val pos = genOut.head
      val derived = splitConjunctivePredicates(cond)
        .flatMap(derive(_, pos, pe.child))
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
