package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL / domain handling for web-corpus pipelines — the C4/RefinedWeb
  * stages that run before any text look: host extraction and
  * normalization (codegen regexp), per-host document caps (domain
  * diversity — one mega-site must not dominate the corpus), and host
  * blocklist filtering. The cap's rank is a per-host partitioned window
  * (WindowGroupLimit pushes the `≤ n` filter into the sort); the
  * blocklist broadcasts.
  */
object Urls {

  /** Normalized host of a URL: the authority up to the first `/:?#`,
    * lowercased, a leading `www.` stripped; null when the value does
    * not parse as a scheme://host URL. Regex kept in the Java∩RE2
    * common subset for oracle parity. */
  def host(url: Column): Column = {
    val h = regexp_extract(lower(url), "^[a-z][a-z0-9+.-]*://([^/:?#]+)", 1)
    when(h === "", lit(null).cast("string"))
      .otherwise(regexp_replace(h, "^www\\.", ""))
  }

  /** Path component of a URL (case preserved — paths are
    * case-significant), '' when the URL has none or does not parse;
    * query/fragment excluded. */
  def path(url: Column): Column =
    regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)

  /** URL-spam feature vector — the integer lexical signals a
    * crawl-frontier ranker reads before fetching anything (SEO-spam
    * and auto-generated hosts skew on every one of them): digit chars
    * in the host, host label depth (dots + 1), path segment depth,
    * path length, query-parameter count, and an explicit-port flag.
    * Pure codegen regexp counts in the Java∩RE2 common subset so the
    * oracle states each formula verbatim; null/unparseable URLs yield
    * null host features and zero path/query counts. */
  def featureColumns(url: Column): Seq[Column] = {
    val h = host(url)
    val p = path(url)
    val q = regexp_extract(url, "^[^?#]*\\?([^#]*)", 1)
    Seq(
      regexp_count(h, lit("[0-9]")).cast("long").as("host_digits"),
      when(h.isNull, lit(null).cast("long"))
        .otherwise(regexp_count(h, lit("\\.")).cast("long") + 1L)
        .as("host_depth"),
      regexp_count(p, lit("/")).cast("long").as("path_depth"),
      length(p).cast("long").as("path_len"),
      when(q === "", lit(0L))
        .otherwise(regexp_count(q, lit("&")).cast("long") + 1L)
        .as("n_query_params"),
      regexp_count(lower(url),
        lit("^[a-z][a-z0-9+.-]*://[^/?#]*:[0-9]+")).cast("long")
        .as("has_port"))
  }

  /** Keep at most `n` docs per host, chosen by deterministic hash draw
    * (ties by id) — reproducible domain-diversity capping, the
    * [[graft.pipeline.PipelineOps.sampleNPerStratum]] shape keyed on
    * the EXTRACTED host. Rows with un-parseable URLs are dropped. */
  def capPerHost(docs: DataFrame, n: Int, urlCol: String = "url",
      idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withHost = docs.withColumn("host", host(col(urlCol)))
      .filter(col("host").isNotNull)
    val w = Window.partitionBy(col("host"))
      .orderBy(graft.pipeline.PipelineOps.hashDraw(col(idCol)), col(idCol))
    withHost.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= n)
      .drop("__rk")
  }

  /** Tracking query parameters stripped by [[canonicalizeUrl]] — the
    * keys that differ across visits to the SAME page (the reason one
    * page shows up as a thousand "distinct" URLs in a crawl). */
  val TrackingParamRe = "^(utm_[a-z0-9]+|gclid|fbclid|msclkid)="

  /** Canonical form of a URL for crawl-level dedup — all pure column
    * expressions (regex in the Java∩RE2 common subset, the
    * param-filter as a list HOF; no backreference replacements, which
    * spell differently across engines):
    *
    *  - scheme and authority lowercased (path/query stay cased — they
    *    are case-significant),
    *  - default ports dropped (`http://…:80`, `https://…:443`),
    *  - the `#fragment` dropped (never sent to the server),
    *  - tracking parameters ([[TrackingParamRe]]) removed, remaining
    *    params kept IN ORDER (sorting them would merge genuinely
    *    different server interpretations),
    *  - a bare `?` left over from all-tracking queries dropped.
    *
    * Non-URL values (no `scheme://authority`) pass through trimmed —
    * canonicalization must never manufacture collisions out of
    * garbage. */
  def canonicalizeUrl(url: Column): Column = {
    val u = trim(url)
    val prefix = regexp_extract(u, "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)
    val lp = lower(prefix)
    val scheme = regexp_extract(lp, "^([a-z0-9+.-]+)://", 1)
    val hostport = regexp_extract(lp, "^[a-z0-9+.-]+://(.*)$", 1)
    val isDefaultPort =
      (scheme === "http" && hostport.rlike(":80$")) ||
        (scheme === "https" && hostport.rlike(":443$"))
    val authority = when(isDefaultPort,
      regexp_replace(hostport, ":(80|443)$", "")).otherwise(hostport)
    val rest = u.substr(length(prefix) + 1, lit(1 << 20))
    val noFrag = regexp_replace(rest, "(?s)#.*", "")
    val path = regexp_extract(noFrag, "(?s)^([^?]*)", 1)
    val query = regexp_extract(noFrag, "(?s)^[^?]*\\?(.*)", 1)
    val kept = filter(split(query, "&"),
      p => p =!= "" && !p.rlike(TrackingParamRe))
    val canon = concat(scheme, lit("://"), authority, path,
      when(size(kept) > 0, concat(lit("?"), array_join(kept, "&")))
        .otherwise(lit("")))
    when(prefix === "" || u.isNull, u).otherwise(canon)
  }

  /** Drop docs whose normalized host is on the blocklist (broadcast
    * anti-join; hosts compared exactly, post-normalization). */
  def blocklistFilter(docs: DataFrame, blockedHosts: Seq[String],
      urlCol: String = "url"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val blocked = broadcast(blockedHosts.toDF("__blocked_host"))
    docs.join(blocked,
        host(col(urlCol)) === col("__blocked_host"), "left_anti")
  }
}
