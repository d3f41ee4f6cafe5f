package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.filters.{FieldResolver, FilterCompiler}
import graft.functions.VectorFunctions
import graft.model.{Condition, GeoPoint}

/** Formula rescore: arbitrary arithmetic over prefetch scores, payload
  * variables, condition indicators, geo distance and decay kernels,
  * compiled 1:1 to Catalyst expressions.
  *
  * AST mirrors `ParsedExpression`
  * (`lib/segment/src/index/query_optimization/rescore_formula/parsed_formula.rs:24-140`);
  * evaluation semantics (f64 "PreciseScore", div-by-zero default, decay
  * kernels) mirror `rescore_formula/formula_scorer.rs:260-345`.
  */
object Formula {

  sealed trait Expr
  final case class Constant(v: Double) extends Expr
  /** `$score[i]` — the i-th prefetch's score column. */
  final case class ScoreVar(i: Int) extends Expr
  /** Payload variable with optional default when missing. */
  final case class PayloadVar(key: String, default: Option[Double] = None) extends Expr
  /** Condition indicator: 1.0 when it holds else 0.0. */
  final case class CondVar(c: Condition) extends Expr
  final case class GeoDistanceVar(origin: GeoPoint, key: String) extends Expr
  /** RFC3339 datetime payload value as epoch seconds (fractional micros)
    * — the `DatetimeExpression` payload-field form, for recency decay. */
  final case class DatetimeVar(key: String) extends Expr
  /** RFC3339 datetime literal as epoch seconds (decay target). */
  final case class DatetimeConstant(iso: String) extends Expr
  final case class Mult(xs: Seq[Expr]) extends Expr
  final case class Sum(xs: Seq[Expr]) extends Expr
  final case class Div(l: Expr, r: Expr, byZeroDefault: Option[Double] = None) extends Expr
  final case class Neg(x: Expr) extends Expr
  final case class SqrtE(x: Expr) extends Expr
  final case class PowE(base: Expr, exp: Expr) extends Expr
  final case class ExpE(x: Expr) extends Expr
  final case class Log10E(x: Expr) extends Expr
  final case class LnE(x: Expr) extends Expr
  final case class AbsE(x: Expr) extends Expr

  sealed trait DecayKind
  case object LinDecay extends DecayKind
  case object GaussDecay extends DecayKind
  case object ExpDecay extends DecayKind

  /** Decay over x toward target; midpoint = value of the kernel at distance
    * `scale` (defaults 0.5 / 1.0). λ transform per `parsed_formula.rs:186-223`:
    * Lin λ=(1−m)/s, Exp λ=ln(m)/s, Gauss λ=ln(m)/s².
    * Kernels (`formula_scorer.rs:330-343`):
    * exp(λ|d|), exp(λd²), max(−λ|d|+1, 0). */
  final case class Decay(
      kind: DecayKind,
      x: Expr,
      target: Expr = Constant(0.0),
      midpoint: Double = 0.5,
      scale: Double = 1.0) extends Expr

  def compile(
      e: Expr,
      scores: Int => Column,
      resolver: FieldResolver): Column = {
    def go(e: Expr): Column = e match {
      case Constant(v) => lit(v)
      case ScoreVar(i) => scores(i)
      case PayloadVar(key, default) =>
        // first value under the key, numeric; missing → default. Temporal
        // columns read as epoch SECONDS (fractional μs) — the documented
        // unit for datetime variables in formula arithmetic.
        val v = graft.filters.Temporal.asSeconds(
          element_at(resolver.values(key), 1), resolver.dataTypeOf(key))
        default.fold(v)(d => coalesce(v, lit(d)))
      case CondVar(c) =>
        when(new FilterCompiler(resolver).condition(c), lit(1.0d)).otherwise(lit(0.0d))
      case GeoDistanceVar(origin, key) =>
        val p = element_at(resolver.values(key), 1)
        VectorFunctions.haversineMeters(
          p.getField("lon"), p.getField("lat"), lit(origin.lon), lit(origin.lat))
      case DatetimeVar(key) =>
        // ANSI-safe epoch seconds (timestamp→double cast is disallowed)
        unix_micros(to_timestamp(element_at(resolver.values(key), 1))) / lit(1e6)
      case DatetimeConstant(iso) =>
        lit(java.time.Instant.parse(iso).getEpochSecond.toDouble)
      case Mult(xs) => xs.map(go).reduce(_ * _)
      case Sum(xs) => xs.map(go).reduce(_ + _)
      case Div(l, r, byZero) =>
        val rr = go(r)
        byZero match {
          case Some(d) => when(rr === 0.0d, lit(d)).otherwise(go(l) / rr)
          case None => go(l) / rr
        }
      case Neg(x) => -go(x)
      case SqrtE(x) => sqrt(go(x))
      case PowE(b, x) => pow(go(b), go(x))
      case ExpE(x) => exp(go(x))
      case Log10E(x) => log10(go(x))
      case LnE(x) => log(go(x))
      case AbsE(x) => abs(go(x))
      case d @ Decay(kind, x, target, midpoint, scale) =>
        val lambda = decayLambda(kind, midpoint, scale)
        val diff = go(x) - go(target)
        kind match {
          case ExpDecay => exp(lit(lambda) * abs(diff))
          case GaussDecay => exp(lit(lambda) * diff * diff)
          case LinDecay => greatest(lit(-lambda) * abs(diff) + lit(1.0d), lit(0.0d))
        }
    }
    go(e)
  }

  def decayLambda(kind: DecayKind, midpoint: Double, scale: Double): Double = {
    require(kind match {
      case LinDecay => midpoint >= 0.0 && midpoint <= 1.0
      case _ => midpoint > 0.0 && midpoint < 1.0
    }, s"invalid decay midpoint $midpoint")
    require(scale > 0.0, s"decay scale must be positive, got $scale")
    kind match {
      case LinDecay => (1.0 - midpoint) / scale
      case ExpDecay => math.log(midpoint) / scale
      case GaussDecay => math.log(midpoint) / (scale * scale)
    }
  }
}
