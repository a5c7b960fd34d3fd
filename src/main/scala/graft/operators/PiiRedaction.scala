package graft.operators

import org.apache.spark.sql.DataFrame
import graft.queries.{SparkSql, SqlDialect}

/** PII redaction — the scrub pass an LLM training-data pipeline runs
  * before text ships to a training job: emails, IPv4 addresses, and
  * SSN-shaped ids are replaced by typed placeholder tokens, and per-doc
  * match counts are kept as the audit trail (a corpus slice with a high
  * redaction density is usually a scrape of a contact dump — a slice to
  * DROP, which the counts make queryable without re-scanning text).
  *
  * Scale shape: a PURE PROJECTION — counts and replacements are row-local
  * regex work, no join, no shuffle, no state; the scan parallelizes like
  * any map and whole-stage codegen keeps it fused.
  *
  * Cross-engine regex contract (the subtle part): Spark compiles java
  * .util.regex, DuckDB compiles RE2, and the two disagree about string-
  * literal escape processing (Spark SQL literals eat one level of
  * backslash, DuckDB's eat none). Every pattern here therefore stays in
  * the BACKSLASH-FREE subset — `[.]` for a literal dot, `[0-9]` for \d,
  * no anchors/lookaround (RE2 has no lookaround at all) — which both
  * engines parse identically, enforced by [[PiiRedaction.Rule]]. The
  * trade is documented imprecision, not a bug: without `\b`, an
  * SSN-shaped id inside a longer digit run still matches (redacting too
  * MUCH is the safe failure mode for PII).
  *
  * Redactions apply sequentially in [[Rules]] order (email before ip:
  * an address in an email's host part is consumed by the email rule);
  * counts are measured on the ORIGINAL text per rule, so they answer
  * "how many of each pattern did this doc carry" independent of
  * redaction order.
  */
object PiiRedaction {

  /** One redaction rule: output-column suffix, pattern (backslash-free
    * subset, single-quote-free so it embeds in both dialects' string
    * literals), placeholder. */
  final case class Rule(name: String, pattern: String, placeholder: String) {
    require(!pattern.contains("\\") && !pattern.contains("'"),
      s"rule $name: patterns must stay in the backslash-free, quote-free subset")
    require(name.matches("[a-z][a-z0-9_]*"), s"bad rule name $name")
  }

  val Email: Rule = Rule("email",
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}", "[EMAIL]")
  val Ipv4: Rule = Rule("ip",
    "[0-9]{1,3}([.][0-9]{1,3}){3}", "[IP]")
  val SsnLike: Rule = Rule("ssn",
    "[0-9]{3}-[0-9]{2}-[0-9]{4}", "[ID]")

  /** Default rule chain, in application order. */
  val Rules: Seq[Rule] = Seq(Email, Ipv4, SsnLike)

  /** The redacted-text expression: `rules` applied innermost-first in
    * order. Dialect-parameterized so the oracle runs the identical
    * chain. */
  def redactExpr(d: SqlDialect, textCol: String, rules: Seq[Rule] = Rules): String =
    rules.foldLeft(textCol)((acc, r) => d.regexReplaceAll(acc, r.pattern, r.placeholder))

  /** Per-rule match-count expressions over the original text. */
  def countExprs(d: SqlDialect, textCol: String, rules: Seq[Rule] = Rules): Seq[String] =
    rules.map(r => s"${d.regexCount(textCol, r.pattern)} AS n_${r.name}")

  /** (id, redacted, n_<rule>…) — the shipped text plus the audit counts. */
  def redact(docs: DataFrame, idCol: String, textCol: String,
      rules: Seq[Rule] = Rules): DataFrame = {
    val d = SparkSql
    docs.selectExpr(
      (s"$idCol AS doc_id" +:
        s"${redactExpr(d, textCol, rules)} AS redacted" +:
        countExprs(d, textCol, rules)): _*)
  }
}
