package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, Cast, Expression,
  GreaterThan, GreaterThanOrEqual, Greatest, Least, Length, Literal,
  Multiply, OctetLength, Or, Round}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: under a Jaro–Winkler threshold predicate, inject a
  * PROVABLE length-ratio prefilter so candidate pairs are rejected on
  * two integer lengths before the O(|a|·|b|) comparator runs — the
  * similarity-join optimization Catalyst cannot derive itself because
  * the bound lives in the comparator's semantics, not its algebra.
  *
  * The bound (with la ≤ lb, m ≤ la matches, boost ≤ 4·0.1·(1−j)):
  *
  *   jw = j + l·0.1·(1−j) ≤ 0.6·j + 0.4   (prefix cap l ≤ 4)
  *   j  = (m/la + m/lb + (m−t)/m)/3 ≤ (1 + la/lb + 1)/3
  *
  * so jw ≥ τ forces j ≥ (τ − 0.4)/0.6 and hence
  *
  *   min(la, lb) ≥ (3·(τ − 0.4)/0.6 − 2) · max(la, lb).
  *
  * For τ = 0.92 that is min ≥ 0.6·max: a 5-char probe can never clear
  * 0.92 against a 12-char name, and the pair dies on a length compare.
  * Small epsilons widen the bound for the round-6 threshold form and
  * FP slop — the filter must be CONSERVATIVE (never drop a true match),
  * which JaroWinklerSpec property-checks on random edit neighborhoods.
  *
  * Matches both `jw(a,b) ≥ τ` and the hash-stable graded form
  * `round(jw(a,b), _) ≥ τ`; the rewritten comparator carries the
  * `pruned` marker so the to-fixpoint pass is idempotent. Registered
  * builder-time via [[GraftExtensions]] (injectOptimizerRule) or on a
  * live session via [[JwLengthPruning.ensure]]
  * (spark.experimental.extraOptimizations — the post-optimizer user
  * batch, so the conjunct stays beside the comparator and codegen's
  * short-circuit AND evaluates the cheap bound first).
  */
object JwLengthPruning extends Rule[LogicalPlan] {
  /** Winkler prefix boost ceiling: 4 chars × 0.1 weight. */
  val MaxBoost = 0.4

  /** min/max length factor implied by threshold τ; ≤ 0 means the bound
    * is vacuous and nothing is injected. 1e-6 absorbs a round-6
    * threshold match; 1e-9 absorbs FP slop in the comparison itself.
    */
  def factor(tau: Double): Double = {
    val j = (tau - 1e-6 - MaxBoost) / (1 - MaxBoost)
    3 * j - 2 - 1e-9
  }

  /** Length-ratio prefilter, guarded to the unit the kernel measures in.
    *
    * The derivation above is unit-consistent only if the bound and the
    * comparator count string length the same way — but Spark's `Length`
    * counts Unicode CODE POINTS while the JaroWinkler kernel scores
    * non-ASCII strings in UTF-16 CODE UNITS, so a supplementary-plane
    * string (1 code point = 2 units) would make the "provably
    * conservative" ratio drop pairs the kernel actually clears (5 astral
    * chars = 10 units vs a 10-char name: kernel ratio 1.0, code-point
    * ratio 0.5). The guard: prune ONLY when both sides are pure ASCII —
    * detected as octet_length == char_length, which for UTF-8 holds iff
    * every code point is 1 byte, and for ASCII all three length units
    * (bytes, code points, UTF-16 units) coincide. Any non-ASCII operand
    * short-circuits the prefilter to true and the pair falls through to
    * the exact comparator; conservativeness is preserved for ALL inputs,
    * the fast path for the ASCII corpora the rule targets.
    */
  private def bound(a: Expression, b: Expression, tau: Double): Expression = {
    val la = Cast(Length(a), DoubleType)
    val lb = Cast(Length(b), DoubleType)
    val nonAscii = Or(GreaterThan(OctetLength(a), Length(a)),
      GreaterThan(OctetLength(b), Length(b)))
    Or(nonAscii,
      GreaterThanOrEqual(Least(Seq(la, lb)),
        Multiply(Literal(factor(tau), DoubleType), Greatest(Seq(la, lb)))))
  }

  private def rewrite(cond: Expression): Expression = cond.transform {
    case GreaterThanOrEqual(jw @ JaroWinkler(a, b, _, false),
        lit @ Literal(t: Double, DoubleType)) if factor(t) > 0 =>
      And(bound(a, b, t),
        GreaterThanOrEqual(jw.copy(pruned = true), lit))
    case GreaterThanOrEqual(r: Round,
        lit @ Literal(t: Double, DoubleType)) if (r.child match {
          case jw: JaroWinkler => !jw.pruned && factor(t) > 0
          case _ => false
        }) =>
      val jw = r.child.asInstanceOf[JaroWinkler]
      And(bound(jw.left, jw.right, t),
        GreaterThanOrEqual(r.withNewChildren(
          Seq(jw.copy(pruned = true)) ++ r.children.drop(1)), lit))
  }

  /** The predicate may sit in a Filter OR — after the main optimizer's
    * pushdown, which runs before the user batch — inside a Join
    * condition; both carry it to the same short-circuit AND.
    */
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case Filter(cond, child) => Filter(rewrite(cond), child)
    case j: Join if j.condition.isDefined =>
      j.copy(condition = j.condition.map(rewrite))
  }

  /** Live-session registration (idempotent) — the extraOptimizations
    * route for sessions the driver hands us already built.
    */
  def ensure(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraOptimizations.contains(JwLengthPruning))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ JwLengthPruning
  }
}
