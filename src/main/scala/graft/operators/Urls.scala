package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization — the dedup key every crawl pipeline computes
  * BEFORE content dedup (CommonCrawl-derived sets dedup by canonical
  * URL first because it is free relative to MinHash; the reference
  * engine has no such surface, so this is a beyond-parity operator
  * like the PII/quality family).
  *
  * Canonical form, applied in a fixed order so the DuckDB oracle can
  * mirror it step for step:
  *   1. scheme lowercased;
  *   2. host lowercased, default port stripped (`:80` for http,
  *      `:443` for https — other ports kept);
  *   3. path: empty → `/`, trailing slashes stripped (except the root);
  *   4. query: split on `&`, tracking params dropped (`utm_*`,
  *      `fbclid`, `gclid`), empties dropped, rest SORTED and rejoined
  *      (param order never distinguishes resources in practice, and
  *      sorting is what makes `?a=1&b=2` ≡ `?b=2&a=1`);
  *   5. fragment dropped (never sent to the server).
  *
  * SYNTACTIC canonicalizer, not a URL parser: userinfo (`user@host`)
  * is kept inside the authority and CASE-FOLDED along with the host —
  * a deliberate dedup-key choice (RFC 3986 makes userinfo
  * case-sensitive, but crawl URLs differing only in userinfo case are
  * in practice the same resource, and a canonical KEY prefers the
  * coarser fold); percent-encoding is not normalized, and a string
  * without `scheme://` canonicalizes to itself unchanged (returned
  * as-is so upstream junk stays visible
  * instead of being silently rewritten). Everything is built from
  * codegen'd string/array functions in the Java-regex ∩ RE2 common
  * subset — one map-side projection, no shuffle, no UDF.
  */
object Urls {

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private val HostRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
  private val PathRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
  private val QueryRe = "^[^#]*\\?([^#]*)"

  /** Query params dropped by rule 4 — the tracking families that vary
    * per click without distinguishing the resource.
    */
  val TrackingParamRe = "^(utm_[A-Za-z0-9_]*|fbclid|gclid)="

  /** The canonical URL column (rules in the object doc). NULL in →
    * NULL out; a string with no `scheme://` passes through unchanged.
    */
  def canonicalUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, SchemeRe, 1))
    val hostRaw = lower(regexp_extract(url, HostRe, 1))
    val host = when(scheme === "http", regexp_replace(hostRaw, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostRaw, ":443$", ""))
      .otherwise(hostRaw)
    val pathRaw = regexp_extract(url, PathRe, 1)
    val pathTrim = regexp_replace(pathRaw, "/+$", "")
    val path = when(pathTrim === "", lit("/")).otherwise(pathTrim)
    val params = array_join(
      array_sort(filter(split(regexp_extract(url, QueryRe, 1), "&"),
        p => p =!= "" && !p.rlike(TrackingParamRe))), "&")
    val canon = concat(scheme, lit("://"), host, path,
      when(params === "", lit("")).otherwise(concat(lit("?"), params)))
    when(url.isNull, lit(null).cast("string"))
      .when(scheme === "", url) // not a scheme://-URL: pass through
      .otherwise(canon)
  }

  /** Keep ONE row per canonical URL — the min-id survivor rule the
    * exact-dedup family uses (deterministic, engine-mirrorable). One
    * hash-partial aggregate on the canonical key; no pair
    * materialization.
    *
    * NULL urls are EXEMPT from dedup: `canonicalUrl` is NULL exactly
    * when the url column is NULL, and Spark's groupBy collects all
    * nulls into ONE group — deduping them would silently collapse
    * every url-less document onto a single survivor, which is data
    * loss, not dedup, for corpora with optional URLs. Every null-url
    * row passes through unchanged.
    *
    * Loud guards (the operator-family convention): the id column must
    * be integral (the min-id survivor rule needs a total order the
    * oracle mirrors), a NULL id on any url-bearing row raises in-plan
    * (a null id can never win `min` nor match the semi join — it
    * would vanish silently), and the scratch column name must be
    * fresh (`withColumn` would silently REPLACE a caller's `__curl`,
    * changing the grouping key).
    */
  def dedupByUrl(df: DataFrame, idCol: String, urlCol: String): DataFrame = {
    import org.apache.spark.sql.types._
    require(!df.columns.contains("__curl"),
      "Urls.dedupByUrl: input already has a '__curl' column; rename it first")
    val idType = df.schema(idCol).dataType
    require(idType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }, s"Urls.dedupByUrl: id column '$idCol' must be integral (got " +
      s"${idType.simpleString}) — the min-id survivor rule needs a total " +
      "order with no engine-dependent collation")
    val guardedId = coalesce(col(idCol),
      raise_error(concat(
        lit(s"Urls.dedupByUrl: NULL id in column '$idCol' for url: "),
        col(urlCol))).cast(idType))
    val withUrl = df.where(col(urlCol).isNotNull)
    val keep = withUrl
      .withColumn("__curl", canonicalUrl(col(urlCol)))
      .groupBy(col("__curl"))
      .agg(min(guardedId).as(idCol))
      .select(col(idCol))
    df.where(col(urlCol).isNull)
      .unionByName(withUrl.join(keep, Seq(idCol), "left_semi"))
  }
}
