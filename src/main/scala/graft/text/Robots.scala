package graft.text

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** robots.txt (REP, RFC 9309) handling — the crawl-etiquette gate that
  * runs BEFORE a URL is fetched (the [[Html.metaRobotsNoindex]] filter
  * is the after-fetch half): parse per-host rule files, then decide
  * every candidate URL by the standard longest-prefix-match rule.
  *
  * The DECISION is the distributed part — billions of URLs × a
  * rules table: one equi-join on host, prefix test, per-URL argmax on
  * (match length, allow) — and is oracle-gated. The PARSE is per-file
  * local string work (a typed flatMap over (host, body) rows, the
  * ContikiNg log-parse discipline) and is spec-checked.
  */
object Robots {

  /** Rules of the `*` (any-crawler) agent group of one robots.txt
    * body: (allow, path-prefix) in file order. Group semantics per RFC
    * 9309 §2.2.1 simplified to the common case: consecutive
    * `User-agent:` lines head one group; the `*` group's Allow/
    * Disallow rules run until the next group header. Comments (#…) and
    * blank lines ignored; an empty-prefix Disallow (allow everything)
    * is dropped. */
  def parseStarRules(body: String): Seq[(Boolean, String)] = {
    var inStar = false
    var inHeader = false
    val out = Seq.newBuilder[(Boolean, String)]
    for (raw <- body.split("\n")) {
      val line = raw.takeWhile(_ != '#').trim
      val lower = line.toLowerCase(java.util.Locale.ROOT)
      if (line.isEmpty) {
        // Comment-only and blank lines are NEUTRAL (RFC 9309 §2.2
        // ignores them entirely; its group ABNF allows emptyline
        // BETWEEN startgrouplines): clearing inHeader here split a
        // 'User-agent: *' + '# note' + 'User-agent: b' header block,
        // silently dropping the group's rules from the star set —
        // failing OPEN (URL treated as allowed).
      } else if (lower.startsWith("user-agent:")) {
        val agent = line.substring("user-agent:".length).trim
        if (!inHeader) { inStar = false; inHeader = true }
        if (agent == "*") inStar = true
      } else if (line.nonEmpty) {
        inHeader = false
        val allow = lower.startsWith("allow:")
        val dis = lower.startsWith("disallow:")
        if (inStar && (allow || dis)) {
          val prefix = line.substring(if (allow) 6 else 9).trim
          if (prefix.nonEmpty) out += ((allow, prefix))
        }
      }
    }
    out.result()
  }

  /** Distributed parse of a (host, body) table → (host, allow,
    * prefix) rules table. */
  def rulesTable(bodies: DataFrame, hostCol: String = "host",
      bodyCol: String = "body"): DataFrame = {
    val spark = bodies.sparkSession
    bodies.select(col(hostCol).cast("string"), col(bodyCol).cast("string"))
      .as(Encoders.tuple(Encoders.STRING, Encoders.STRING))
      .flatMap { case (host, body) =>
        parseStarRules(Option(body).getOrElse(""))
          .map { case (allow, prefix) => (host, allow, prefix) }
      }(Encoders.product[(String, Boolean, String)])
      .toDF(hostCol, "allow", "prefix")
  }

  /** One sitemap `<loc>` URL (group 1), whitespace-tolerant — the
    * Java∩RE2 subset like every pattern here. */
  val LocRe = "(?is)<loc>[ \\t\\r\\n]*([^<]*?)[ \\t\\r\\n]*</loc>"

  /** All `<loc>` URLs of a sitemap.xml body in document order — the
    * crawl-frontier feed that pairs with [[matchUrls]]: sitemap lists
    * what the site WANTS crawled, robots decides what MAY be. Pure
    * column expression. */
  def sitemapLocs(xml: org.apache.spark.sql.Column):
      org.apache.spark.sql.Column =
    regexp_extract_all(xml, lit(LocRe), lit(1))

  /** Crawl decision per URL: among the url's host's rules whose prefix
    * matches the path, the LONGEST prefix wins; Allow wins exact
    * length ties (the Google tiebreak); no matching rule ⇒ allowed.
    * urls: (host, path); rules: (host, allow, prefix). Returns urls +
    * `allowed`. One equi-join on host (rule sets are per-host small),
    * a map-side-combining max_by argmax, one join back — nothing
    * wider than (host, path, prefix) shuffles. */
  def matchUrls(urls: DataFrame, rules: DataFrame,
      hostCol: String = "host", pathCol: String = "path"): DataFrame = {
    val matched = urls.select(col(hostCol), col(pathCol))
      .join(rules, Seq(hostCol))
      .filter(startswith(col(pathCol), col("prefix")))
      .groupBy(col(hostCol), col(pathCol))
      .agg(max_by(col("allow"),
        struct(length(col("prefix")).as("len"), col("allow")))
        .as("__decision"))
    urls.join(matched, Seq(hostCol, pathCol), "left")
      .withColumn("allowed", coalesce(col("__decision"), lit(true)))
      .drop("__decision")
  }

  /** RFC 9309 §2.2.3 wildcard rule → anchored regex, as a pure column
    * expression (so the oracle states the identical translation):
    * every regex metacharacter escaped by LITERAL replace (backslash
    * first, or it would re-escape the escapes), `*` → `.*`, and a
    * TRAILING `$` in the original rule (the end-of-path designator)
    * converted to the regex end anchor — a mid-rule `$` stays literal,
    * the "only meaningful at the end" convention. Patterns stay in the
    * Java∩RE2 common subset (escaped literals, `.*`, anchors). */
  def ruleRegex(prefix: Column): Column = {
    val metas = Seq("\\", ".", "+", "?", "(", ")", "[", "]",
      "{", "}", "|", "^", "$")
    val escaped = metas.foldLeft(prefix)((c, m) =>
      replace(c, lit(m), lit("\\" + m)))
    val starred = replace(escaped, lit("*"), lit(".*"))
    // the escaped trailing designator is the 2-char token \$ — drop
    // it, append the real anchor
    val anchored = when(endswith(prefix, lit("$")),
      concat(starred.substr(lit(1), length(starred) - 2), lit("$")))
      .otherwise(starred)
    concat(lit("^"), anchored)
  }

  /** [[matchUrls]] with RFC 9309 §2.2.3 WILDCARDS — full spec parity
    * for the `*` / end-`$` rules large sites actually serve (the
    * prefix-only matcher fails open on a "Disallow: star-dot-pdf,
    * end-anchored" rule).
    * Most-specific = longest RULE in octets (wildcards count as
    * written, the RFC convention), Allow wins ties, no match →
    * allowed. The regex pattern is a per-rule derived column (compiled
    * per row): rules tables are site-sized, and the host equi-join
    * keeps each path row against its own host's handful of rules —
    * never a corpus × all-rules product. */
  def matchUrlsWildcard(urls: DataFrame, rules: DataFrame,
      hostCol: String = "host", pathCol: String = "path"): DataFrame = {
    val matched = urls.select(col(hostCol), col(pathCol))
      .join(rules, Seq(hostCol))
      .filter(regexp_like(col(pathCol), ruleRegex(col("prefix"))))
      .groupBy(col(hostCol), col(pathCol))
      .agg(max_by(col("allow"),
        struct(length(col("prefix")).as("len"), col("allow")))
        .as("__decision"))
    urls.join(matched, Seq(hostCol, pathCol), "left")
      .withColumn("allowed", coalesce(col("__decision"), lit(true)))
      .drop("__decision")
  }

  /** Crawl-delay of the `*` group: the polite-crawler pacing knob.
    * Crawl-delay is NOT in RFC 9309 but is the de-facto extension most
    * large sites still serve; the common semantics implemented here:
    * the directive belongs to the group whose header precedes it (the
    * same grouping state machine as [[parseStarRules]] — comments and
    * blank lines neutral), integer seconds only (fractional or junk
    * values ignored — fail open to "no delay", the conservative read
    * being the CALLER's rate limiter's job), first star-group value
    * wins when a file repeats it. None = no star crawl-delay. */
  def parseStarDelay(body: String): Option[Long] = {
    var inStar = false
    var inHeader = false
    var out: Option[Long] = None
    for (raw <- body.split("\n")) {
      val line = raw.takeWhile(_ != '#').trim
      val lower = line.toLowerCase(java.util.Locale.ROOT)
      if (line.isEmpty) {
        // neutral (RFC 9309 §2.2 ignores comments/blanks entirely)
      } else if (lower.startsWith("user-agent:")) {
        val agent = line.substring("user-agent:".length).trim
        if (!inHeader) { inStar = false; inHeader = true }
        if (agent == "*") inStar = true
      } else {
        inHeader = false
        if (inStar && out.isEmpty &&
            lower.startsWith("crawl-delay:")) {
          val v = line.substring("crawl-delay:".length).trim
          if (v.nonEmpty && v.forall(_.isDigit) && v.length <= 9)
            out = Some(v.toLong)
        }
      }
    }
    out
  }

  /** Distributed [[parseStarDelay]] over a (host, body) table →
    * (host, crawl_delay_s) — hosts WITHOUT a star crawl-delay keep a
    * NULL row (the fetcher's default pacing applies), so the output is
    * a left-joinable per-host pacing dimension. Same typed-flatMap
    * parse shape as [[rulesTable]]. */
  def delaysTable(bodies: DataFrame, hostCol: String = "host",
      bodyCol: String = "body"): DataFrame = {
    bodies.select(col(hostCol).cast("string"), col(bodyCol).cast("string"))
      .as(Encoders.tuple(Encoders.STRING, Encoders.STRING))
      .map { case (host, body) =>
        (host, parseStarDelay(Option(body).getOrElse(""))
          .map(java.lang.Long.valueOf).orNull)
      }(Encoders.product[(String, java.lang.Long)])
      .toDF(hostCol, "crawl_delay_s")
  }
}
