package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL-centric web-pipeline operators: normalization, URL-keyed dedup and
  * domain blocklist filtering — the front half of every web-scale corpus
  * build (crawl dedup happens on the normalized URL long before any
  * content hash is computed).
  *
  * Everything is pure Catalyst string/regex expressions (codegen'd, no
  * UDFs) using only RE2-safe patterns, so the oracle replicates each step
  * verbatim in SQL and the comparison is exact. Scope is deliberately the
  * deterministic core (case folding, fragment strip, default-port drop,
  * userinfo strip, empty-path canonicalization, registrable-domain
  * approximation); IDN/punycode and public-suffix-list lookups are
  * out — they need tables, not rules, and belong in a dimension join. */
object WebOps {

  private val SchemeRe = "^([a-zA-Z][a-zA-Z0-9+.-]*)://"

  /** Appends parsed + normalized columns to `df`:
    * `scheme` (lowercased), `host` (lowercased, userinfo/port stripped),
    * `domain` (registrable-domain approximation = last two labels),
    * `url_norm` (scheme://host[:port]/path?query — fragment stripped,
    * default ports 80/443 dropped, empty path → "/").
    * Non-URL rows parse to empty strings rather than erroring — at
    * corpus scale a malformed URL is data, not an exception. */
  def parseUrls(df: DataFrame, url: Column): DataFrame = {
    val noFrag = regexp_replace(url, "#.*", "")
    val scheme = lower(regexp_extract(noFrag, SchemeRe, 1))
    val auth = regexp_extract(noFrag, SchemeRe + "([^/?#]*)", 2)
    val host = lower(regexp_extract(auth, "^(?:[^@]*@)?([^:]*)", 1))
    val port = regexp_extract(auth, ":([0-9]+)$", 1)
    val pathq = regexp_extract(noFrag, SchemeRe + "[^/?#]*(.*)", 2)
    val portSeg = when(
      port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"), lit(""))
      .otherwise(concat(lit(":"), port))
    val path1 = when(pathq === "", lit("/")).otherwise(pathq)
    df.withColumn("scheme", scheme)
      .withColumn("host", host)
      .withColumn("domain", regexp_extract(host, "([^.]+\\.[^.]+)$", 1))
      .withColumn("url_norm",
        when(scheme === "", lit(""))
          .otherwise(concat(scheme, lit("://"), host, portSeg, path1)))
  }

  /** URL-keyed dedup: one row per normalized URL with the representative
    * (minimum) id and the duplicate count. One shuffle keyed on the
    * normalized URL (bounded-length strings; at 10^12 rows key on
    * `xxhash64(url_norm)` instead via [[TrainingOps.dedupExactByHash]]
    * when the URL text itself isn't needed downstream). */
  def dedupByUrl(parsed: DataFrame, id: Column): DataFrame =
    parsed.groupBy(col("url_norm"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("n_dupes"))

  /** Drop rows whose registrable domain is on the blocklist (UT1-style
    * domain filtering). Blocklists are ~10^5 rows against 10^12 docs:
    * the anti-join broadcasts the blocklist, nothing shuffles. */
  def filterBlockedDomains(parsed: DataFrame, blocked: DataFrame): DataFrame =
    parsed.join(broadcast(blocked.select(col(blocked.columns.head).as("domain"))),
      Seq("domain"), "left_anti")
}
