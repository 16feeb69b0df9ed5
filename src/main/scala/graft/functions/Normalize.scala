package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Normalization + scalar helpers (SURVEY.md §2.7 F1–F10).
  *
  * All are Spark built-ins (codegen'd) — no UDFs. The reference's row
  * transforms (`services/etlService.js:148-201`, `index.js:230-234`,
  * `utils/logger.js:22-42`) become config-driven column expressions.
  */
object Normalize {

  /** F1 — uppercase the given columns, null-safe and string-only, like
    * the reference's `uppercaseFields` (`services/etlService.js:194-200`,
    * which guards `typeof === 'string'`). Columns absent from the frame
    * or of non-string type pass through untouched.
    */
  def uppercase(df: DataFrame, cols: Seq[String]): DataFrame = {
    // case-insensitive name match, like Spark's own resolution — a
    // JDBC source may fold identifier case (Derby: FIRST_NAME)
    val wanted = cols.map(_.toLowerCase).toSet
    val stringCols = df.schema.fields
      .filter(f => f.dataType == StringType && wanted.contains(f.name.toLowerCase))
      .map(_.name).toSet
    // single select (not a withColumn fold) so Catalyst sees one Project
    val projected = df.columns.map { c =>
      if (stringCols.contains(c)) upper(col(c)).as(c) else col(c)
    }
    df.select(projected.toIndexedSeq: _*)
  }

  /** Unicode NFC canonical composition (UAX #15) — native codegen'd
    * expression ([[graft.plans.NfcExpr]]): the normalize-before-hash
    * step every web-text dedup pipeline needs (U+0065+U+0301 vs U+00E9
    * must produce the SAME shingles/digests). Already-normalized text
    * takes a zero-allocation fast path.
    */
  def nfc(text: Column): Column = {
    graft.plans.GraftFunctions.registerActive()
    call_function("graft_nfc", text)
  }

  /** Accent stripping (NFD → drop Mn marks → NFC) — the match/search
    * folding normalizer; DuckDB `strip_accents` parity on decomposable
    * Latin text ([[graft.plans.StripAccentsExpr]]).
    */
  def stripAccents(text: Column): Column = {
    graft.plans.GraftFunctions.registerActive()
    call_function("graft_strip_accents", text)
  }

  /** F1 applied per-table from the catalog normalization lists. */
  def forTable(df: DataFrame, table: String): DataFrame =
    graft.schema.Catalog.tables.get(table) match {
      case Some(spec) => uppercase(df, spec.upperCols)
      case None       => df
    }

  /** F2 — composite key `` `${table}:${rsbsa_no}` ``
    * (`services/etlService.js:620`).
    */
  def compositeKey(table: Column, key: Column): Column =
    concat_ws(":", table, key)

  /** F3 — split composite key on `:`, 1-based part
    * (`services/etlService.js:628`).
    */
  def keyPart(composite: Column, part: Int): Column =
    element_at(split(composite, ":"), part)

  /** F5 — Manila-time ISO timestamp `yyyy-MM-dd'T'HH:mm:ss.SSS+08:00`
    * (`services/etlService.js:753-773`, `utils/logger.js:22-42`). The
    * engine stays in UTC; Manila formatting is presentation-edge only.
    */
  def manilaIso(ts: Column): Column =
    date_format(from_utc_timestamp(ts, "Asia/Manila"),
      "yyyy-MM-dd'T'HH:mm:ss.SSS'+08:00'")

  /** F7 — ZEROFILL display padding (`padStart(3,'0')`,
    * `services/etlService.js:771`; DDL `:277-290`).
    */
  def zeroPad(c: Column, width: Int): Column = lpad(c.cast("string"), width, "0")

  /** F4 — parse a `[ts] message` log line into its parts
    * (`index.js:230-234`).
    */
  def logTimestamp(line: Column): Column = regexp_extract(line, "^\\[(.*?)\\]", 1)
  def logMessage(line: Column): Column =
    trim(regexp_replace(line, "^\\[(.*?)\\]\\s*", ""))

  /** ENUM domain validation (SURVEY.md §1.2: MySQL ENUM → String +
    * domain check): rows whose enum-typed columns hold values outside
    * the declared domain — the quarantine feed (R8). Scoped to the
    * named table's declared schema: only columns that are both in the
    * frame AND enum-typed in that table's DDL are checked (a
    * same-named column in another table may have a different domain).
    */
  def enumViolations(df: DataFrame, table: String): DataFrame = {
    val domains = graft.schema.Schemas.enumDomains
    val declared = graft.schema.Schemas.byName.get(table)
      .map(_.fieldNames.toSet)
      .getOrElse(domains.keySet) // unknown table: fall back to global names
    val checks = df.columns
      .filter(c => domains.contains(c) && declared.contains(c))
      .map { c =>
        col(c).isNotNull && !col(c).isin(domains(c).map(lit): _*)
      }
    if (checks.isEmpty) df.limit(0)
    else df.filter(checks.reduce(_ || _))
  }

  /** F9 — error-rate percent rounded to 2 decimals
    * (`services/etlService.js:674`).
    */
  def errorRatePct(errors: Column, total: Column): Column =
    round(errors.cast("double") / total.cast("double") * 100, 2)

  /** F6 — uptime decompose millis → (hours, minutes, seconds)
    * (`index.js:39-44`).
    */
  def uptimeParts(ms: Column): (Column, Column, Column) = {
    val totalSec = floor(ms / 1000)
    (floor(totalSec / 3600),
     floor(pmod(totalSec, lit(3600)) / 60),
     pmod(totalSec, lit(60)))
  }

  /** Tracking query parameters [[canonicalUrl]] strips — the fixed
    * literal list of per-fetch analytics/click-id params (UTM family,
    * Google/Facebook click ids, referrer tags) that vary without
    * changing the resource; every web-corpus pipeline (C4,
    * RefinedWeb) carries an equivalent list for its pre-dedup URL
    * normalization.
    */
  val trackingParams: Seq[String] = Seq(
    "utm_source", "utm_medium", "utm_campaign", "utm_term",
    "utm_content", "gclid", "fbclid", "ref")

  /** URL canonicalization — the key-normalization step web-corpus
    * pipelines run BEFORE any content dedup (C4 / RefinedWeb lineage:
    * most exact duplicates are the same page re-fetched under a
    * cosmetically different URL). Rules, applied in order, all
    * expressible as codegen'd string built-ins on BOTH engines (the
    * DuckDB oracle mirrors them verbatim):
    *
    *  1. scheme + authority lowercased (path/query case is
    *     significant per RFC 3986 §6.2.2.1, host case is not);
    *  2. default ports stripped — `:80` iff http, `:443` iff https
    *     (a non-default port is identity-bearing and survives);
    *  3. fragment dropped (never sent to the server);
    *  4. [[trackingParams]] QUERY params removed, OTHER params kept
    *     verbatim in their original order. The rest is split at the
    *     FIRST `?` and the param rules touch only the query
    *     component: `&` is a legal path character (RFC 3986 §3.3) and
    *     `?` is legal inside query values (§3.4), so `/a&ref=1` (a
    *     path) and `?q=a?ref=1` (a value containing `?ref=`) must
    *     survive untouched — a false collapse here DELETES a document
    *     downstream. The strip is STRUCTURAL, not a regex scan: the
    *     query body splits on `&` (the one reserved separator — a raw
    *     `&` cannot occur inside a param), each param's NAME (the
    *     part before its first `=`) is compared case-insensitively
    *     against the list, survivors rejoin with `&` (split/rejoin is
    *     byte-identical for kept params, including empty ones like
    *     `?a=1&&x=3`). This is the only shape that is simultaneously
    *     safe against the three regex hazards: name-prefix bleed
    *     (`ref` must not eat `referrer=x`), VALUELESS params
    *     (`?utm_source` with no `=`, strippable only with lookahead,
    *     which the oracle's RE2 lacks), and case-mangled names
    *     (`?UTM_SOURCE=x`). A query reduced to exactly `?` drops;
    *  5. empty path normalized to `/` so `https://x.com` and
    *     `https://x.com/` collide.
    *
    * Anchoring is `\z` (absolute end of input) everywhere, never `$`:
    * Java's `$` matches before a final line terminator while RE2's
    * does not, and the oracle mirrors these rules in RE2 — on crawl
    * garbage with a trailing newline the two would silently disagree.
    *
    * Map-only — one row in, one canonical string out; the dedup that
    * follows shuffles only the 16-byte md5 of this value, never text.
    */
  def canonicalUrl(url: Column): Column = {
    val prefix = regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", 0)
    val rest = url.substr(length(prefix) + lit(1), length(url))
    val auth = lower(prefix)
    val noPort = when(auth.startsWith("http://"),
        regexp_replace(auth, ":80\\z", ""))
      .when(auth.startsWith("https://"), regexp_replace(auth, ":443\\z", ""))
      .otherwise(auth)
    val noFrag = regexp_replace(rest, "(?s)#.*", "")
    val qPos = instr(noFrag, "?") // 1-based; 0 when there is no query
    val path = when(qPos === 0, noFrag)
      .otherwise(noFrag.substr(lit(1), qPos - lit(1)))
    // structural strip (scaladoc rule 4): split the query body on
    // '&', drop params whose lowercased name is tracked, rejoin —
    // kept params (empty ones included) are reassembled verbatim
    val body = when(qPos === 0, lit(""))
      .otherwise(noFrag.substr(qPos + lit(1), length(noFrag)))
    val kept = filter(split(body, "&", -1), p =>
      !lower(split_part(p, lit("="), lit(1)))
        .isInCollection(trackingParams))
    val s2 = when(qPos === 0, lit(""))
      .otherwise(concat(lit("?"), array_join(kept, "&")))
    val q = when(s2 === "?", lit("")).otherwise(s2)
    val pathed = when(path === "", lit("/")).otherwise(path)
    concat(noPort, pathed, q)
  }

  /** Lowercased host of a URL (no port, no userinfo) — the grouping
    * key for host-level dedup policies (per-host caps, domain
    * blocklists). An optional `user[:pw]@` userinfo prefix (RFC 3986
    * §3.2.1) is skipped so `https://alice@x.com/a` groups under
    * `x.com`, not `alice@x.com` — a wrong key here splits one host's
    * dup statistics across phantom hosts.
    */
  def urlHost(url: Column): Column =
    regexp_extract(lower(url),
      "^[a-z0-9+.-]+://(?:[^/?#@]*@)?([^/:?#@]+)", 1)
}
