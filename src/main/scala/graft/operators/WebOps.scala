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

  /** Per-domain document cap (anti-domination sampling): keep at most
    * `cap` docs per registrable domain, selected by a content-addressed
    * MD5 rank — deterministic, repartition- and rerun-stable, and exactly
    * replicable in oracle SQL (same md5 hex, same lexicographic order,
    * doc_id tiebreak). One shuffle keyed on domain; the `rk <= cap`
    * filter directly over row_number lets Spark's WindowGroupLimit rule
    * keep only `cap` rows per key flowing out of each sort — a skewed
    * mega-domain never materializes past the limit. */
  def domainCapSample(parsed: DataFrame, cap: Int, id: Column,
                      salt: String = ":cap"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("domain"))
      .orderBy(md5(concat(id.cast("string"), lit(salt))), id)
    parsed.withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= cap)
  }

  /** Parse robots.txt contents into (host, path_prefix) disallow rules
    * for the wildcard agent — the crawl-politeness dimension table.
    * Group semantics per the robots exclusion standard: consecutive
    * `User-agent` lines open a group; a `Disallow` rule belongs to the
    * nearest preceding group and applies to us iff that group names `*`.
    * Empty Disallow (allow-all) yields no rule. `Allow:` precedence and
    * `$`/`*` wildcards are out of scope (documented subset: prefix rules).
    *
    * Whole parse is explode + two windows keyed on host — robots files
    * are small and one-per-host, so per-key state is a few hundred lines;
    * everything is codegen'd expressions, no UDFs, and the oracle
    * replicates it line for line. */
  def parseRobots(robots: DataFrame, host: Column, content: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("host")).orderBy(col("ln"))
    val cls = robots
      .select(host.as("host"), posexplode(split(content, "\n")).as(Seq("ln", "raw")))
      .withColumn("line", trim(regexp_replace(col("raw"), "#.*", "")))
      .withColumn("is_ua", lower(col("line")).startsWith("user-agent:"))
      .withColumn("ua", when(col("is_ua"), trim(expr("substring(line, 12)"))))
      .withColumn("dis", when(lower(col("line")).startsWith("disallow:"),
        trim(expr("substring(line, 10)"))))
    val grouped = cls
      .withColumn("new_grp",
        col("is_ua") && !coalesce(lag(col("is_ua"), 1).over(w), lit(false)))
      .withColumn("grp", sum(when(col("new_grp"), 1).otherwise(0)).over(w))
    val starGroups = grouped.where(col("ua") === "*")
      .select(col("host"), col("grp")).distinct()
    grouped.where(col("dis").isNotNull && col("dis") =!= "")
      .join(starGroups, Seq("host", "grp"))
      .select(col("host"), col("dis").as("path_prefix"))
      .distinct()
  }

  /** Extract `Sitemap:` directives from robots.txt bodies — per the robots
    * exclusion standard these are group-independent (valid anywhere in the
    * file, any casing) and carry ABSOLUTE URLs. Output (host, pos, sitemap)
    * in file order feeds the fetcher whose responses [[parseSitemaps]]
    * parses: robots → sitemap URL → loc entries is the complete
    * frontier-seeding chain. Comments strip first (a `#` ends the value);
    * pure codegen string expressions, no shuffle. */
  def robotsSitemaps(robots: DataFrame, host: Column, content: Column): DataFrame =
    robots.select(host.as("host"), posexplode(split(content, "\n")).as(Seq("ln", "raw")))
      .withColumn("line", trim(regexp_replace(col("raw"), "#.*", "")))
      .where(lower(col("line")).startsWith("sitemap:"))
      .withColumn("sitemap", trim(expr("substring(line, 9)")))
      .where(col("sitemap") =!= "")
      .withColumn("pos", row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("host")).orderBy(col("ln"))) - 1)
      .select(col("host"), col("pos"), col("sitemap"))

  /** Parse sitemap.xml bodies into discovered URLs — the other half of
    * crawl-frontier seeding next to [[parseRobots]]. Emits one row per
    * `<loc>` entry: (host, kind, pos, loc) where kind is `urlset` (page
    * sitemap) or `sitemapindex` (pointer to further sitemaps — the caller
    * feeds those back into fetching). XML-escaped URLs are unescaped (the
    * sitemap spec requires entity escaping); `pos` preserves document
    * order. Pure regexp/codegen expressions over RE2-safe patterns — a
    * sitemap is flat enough that a real XML parser buys nothing, and the
    * oracle replicates the exact expressions in SQL. */
  def parseSitemaps(sitemaps: DataFrame, host: Column, content: Column): DataFrame = {
    val kind = when(col("_c").contains("<sitemapindex"), lit("sitemapindex"))
      .otherwise(lit("urlset"))
    val locs = expr("regexp_extract_all(_c, '<loc>\\\\s*([^<]*?)\\\\s*</loc>', 1)")
    val unescaped =
      Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&apos;" -> "'", "&amp;" -> "&")
        .foldLeft(col("loc0")) { case (c, (e, r)) => regexp_replace(c, e, r) }
    sitemaps.select(host.as("host"), content.as("_c"))
      .withColumn("kind", kind)
      .select(col("host"), col("kind"), posexplode(locs).as(Seq("pos", "loc0")))
      .withColumn("loc", unescaped)
      .select(col("host"), col("kind"), col("pos"), col("loc"))
  }

  /** Drop URLs disallowed by a robots rule for their host (prefix match
    * on the path+query). Rules tables are host-cardinality — tiny next
    * to a 10^12-row frontier — so the anti-join broadcasts the rules and
    * nothing shuffles; the prefix test rides the hash join's extra
    * condition. Requires [[parseUrls]] columns (`host`, `url_norm`). */
  def robotsFilter(parsed: DataFrame, rules: DataFrame): DataFrame = {
    val path = regexp_extract(col("url_norm"), "^[a-z0-9+.-]+://[^/?#]*(.*)$", 1)
    val withPath = parsed.withColumn("path", path)
    val r = broadcast(rules.select(col("host").as("r_host"), col("path_prefix")))
    withPath.join(r,
        withPath("host") === r("r_host") && withPath("path").startsWith(r("path_prefix")),
        "left_anti")
      .drop("path")
  }
}
