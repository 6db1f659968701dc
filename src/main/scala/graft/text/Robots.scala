package graft.text

import org.apache.spark.sql.{DataFrame, Encoders}
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
