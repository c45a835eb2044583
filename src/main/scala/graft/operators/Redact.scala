package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Regex-based PII / sensitive-token scrubbing — the redaction pass a
  * training-data pipeline runs before text ever reaches tokenization
  * (emails, phone numbers, numeric ids, free-form keys).
  *
  * Rules are applied IN ORDER, each seeing the previous rule's output —
  * the usual redaction semantics (a broad rule after a narrow one must
  * not re-match inside the narrow rule's replacement token). Everything
  * is `regexp_replace` / `regexp_extract_all`, i.e. codegen'd Catalyst
  * expressions evaluated row-local in one narrow stage: at 100 TB the
  * scrub is a map-only pass with zero shuffle, and Parquet column
  * pruning still applies because no UDF opacity hides the projection.
  *
  * Patterns must stay in the portable regex intersection (character
  * classes, bounded quantifiers, alternation — no lookaround, no
  * backrefs) when the result needs an oracle: Spark compiles Java
  * regex, DuckDB RE2. Replacements must avoid `$` and `\` (group-ref
  * syntax differs between the two engines).
  */
object Redact {

  /** One redaction rule: every non-overlapping match of `pattern` is
    * replaced by `replacement`. */
  final case class Rule(pattern: String, replacement: String)

  /** `text` with all rules applied in order. */
  def scrub(text: Column, rules: Seq[Rule]): Column =
    rules.foldLeft(text)((c, r) => regexp_replace(c, r.pattern, r.replacement))

  /** Total number of redactions `scrub` performs: rule i is counted on
    * the text as rules 0..i-1 left it (chained, like the scrub itself).
    * Folded in ONE pass carrying (staged text, running count): each
    * staged prefix appears once and is shared between its own count and
    * the next stage's replace input, so whole-stage codegen's
    * subexpression elimination evaluates every regex stage once —
    * O(rules) regex work per row, not O(rules^2) as a naive
    * re-derive-the-prefix-per-rule formulation would cost on the
    * 100 TB map-only scrub pass. */
  def hitCount(text: Column, rules: Seq[Rule]): Column = {
    val (_, total) = rules.foldLeft((text, lit(0L))) {
      case ((staged, count), r) =>
        (regexp_replace(staged, r.pattern, r.replacement),
          count + size(regexp_extract_all(staged, lit(r.pattern), lit(0))))
    }
    // null text: size(null) is -1 per rule, so the naive fold returned
    // -(rules.length) — a negative count that silently deflated corpus
    // redaction totals. No text ⇒ zero hits.
    when(text.isNull, lit(0L)).otherwise(total.cast("long"))
  }

  /** Pseudonymous stable key for an id column: keyed sha-256 over the
    * pipeline salt and the id's decimal string. Deterministic across
    * runs (same salt), so downstream grouping/joins on the pseudonym
    * still work, but — unlike an unsalted digest of a low-entropy
    * sequential id space — not reversible by precomputing hashes of
    * '1','2',…: recovery requires the salt, which in production comes
    * from a secret store, never from the output. The salt is required
    * (no default) so callers can't silently fall back to unkeyed. */
  def pseudonym(id: Column, salt: String): Column = {
    require(salt.nonEmpty, "pseudonym salt must be non-empty (keyed hash)")
    sha2(concat(lit(salt), lit(":"), id.cast("string")), 256)
  }
}
