package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Catalyst optimizer rule: algebraic simplification of the Unicode
  * normalization kernels — the engine's own expression algebra, not
  * just its own functions. Pipelines compose normalization defensively
  * (a cleaning stage NFC-normalizes, a later fold strips accents, a
  * hashing stage normalizes again "to be safe"), and each kernel call
  * is a full pass over the string; these identities delete the
  * redundant passes at plan time:
  *
  *  - `nfc(nfc(x)) → nfc(x)` — NFC is idempotent (UAX #15 §1.3:
  *    normalization forms are, by definition, stable under
  *    re-application).
  *  - `strip_accents(nfc(x)) → strip_accents(x)` — the strip kernel
  *    starts from NFD, and `NFD(NFC(x)) = NFD(x)` (canonical
  *    equivalence is preserved by composition).
  *  - `nfc(strip_accents(x)) → strip_accents(x)` — the strip kernel
  *    NFC-recomposes its output by construction
  *    ([[TextKernels.stripAccents]]).
  *
  * Soundness of each identity is spec-tested value-for-value on mixed
  * composed/decomposed fixtures (`NormalizeRuleSpec`), and the
  * registered `text_normalize` query — which composes
  * `strip_accents ∘ nfc` — is the live beneficiary: its plan drops
  * the inner `nfcexpr` pass (plan-guarded).
  *
  * Registration: `GraftExtensions` injects it as an optimizer rule
  * for `spark.sql.extensions`-configured sessions;
  * [[GraftFunctions.register]] appends it idempotently to
  * `spark.experimental.extraOptimizations` so the imperative
  * registration path (the one Verify/Bench/tests use) gets it too.
  */
object NormalizeChainSimplification extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case NfcExpr(inner @ NfcExpr(_))          => inner
      case StripAccentsExpr(NfcExpr(c))         => StripAccentsExpr(c)
      case NfcExpr(inner @ StripAccentsExpr(_)) => inner
    }
}
