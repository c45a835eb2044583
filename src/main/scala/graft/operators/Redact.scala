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
    * the text as rules 0..i-1 left it (chained, like the scrub itself). */
  def hitCount(text: Column, rules: Seq[Rule]): Column = {
    val counts = rules.indices.map { i =>
      val staged = scrub(text, rules.take(i))
      size(regexp_extract_all(staged, lit(rules(i).pattern), lit(0)))
    }
    counts.reduceOption(_ + _).getOrElse(lit(0)).cast("long")
  }

  /** Pseudonymous stable key for an id column: md5 of its decimal string.
    * One-way at pipeline scope (no salt table to join back), deterministic
    * across runs so downstream grouping/joins on the pseudonym still work. */
  def pseudonym(id: Column): Column = md5(id.cast("string"))
}
