package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction and URL canonicalization — the scrubbing passes a
  * training-data pipeline runs before anything else sees the text (every
  * public corpus pipeline ships a variant; e.g. the C4/CCNet-style
  * scrub-and-dedup stages). Pure per-row column expressions, zero
  * shuffle; every pattern is written in the RE2-compatible subset (no
  * lookaround, no replacement backrefs) so the SAME pattern text runs in
  * Spark's Java regex and the DuckDB oracle's RE2 — the portability
  * contract the oracle compare depends on.
  */
object Redact {

  /** RE2-safe PII patterns (shared verbatim with the oracle SQL). */
  final val EmailPat = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  final val PhonePat = """\d{2}-\d{3}-\d{3}-\d{4}"""
  final val Ipv4Pat = """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"""

  /** Redaction order matters: emails first (their dotted local/domain
    * parts must not be half-eaten by the IP pattern), then phones, then
    * bare IPs.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPat, "<EMAIL>"),
        PhonePat, "<PHONE>"),
      Ipv4Pat, "<IP>")

  def countPat(text: Column, pat: String): Column =
    regexp_count(text, lit(pat)).cast(org.apache.spark.sql.types.LongType)

  /** URL canonicalization for dedup: strip fragment; lowercase scheme +
    * host (path case is preserved — paths are case-sensitive); drop
    * `www.`; drop the https default port; drop `utm_*` tracking params;
    * strip a dangling `?` and the trailing slash. Every step is
    * RE2-portable (no lookaround, no replacement backrefs), so the
    * oracle runs the same text. Limitation, documented: the regex-only
    * utm step leaves a dangling `&` when a utm param is FIRST with
    * params after it — real canonicalizers re-join the param list; the
    * fixture and oracle agree on the policy either way.
    */
  def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, """#.*$""", "")
    val hostPat = """^[A-Za-z]+://[^/?#]*"""
    val lowered = concat(
      lower(regexp_extract(noFrag, hostPat, 0)),
      regexp_replace(noFrag, hostPat, ""))
    val noWww = regexp_replace(lowered, """://www\.""", "://")
    val noPortMid =
      regexp_replace(regexp_replace(noWww, """:443/""", "/"), """:443\?""", "?")
    val noPort = when(noPortMid.endsWith(":443"),
      noPortMid.substr(lit(1), length(noPortMid) - 4)).otherwise(noPortMid)
    val noUtm = regexp_replace(noPort, """[?&]utm_[^&#]*""", "")
    regexp_replace(regexp_replace(noUtm, """\?$""", ""), """/$""", "")
  }
}
