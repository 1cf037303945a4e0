package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** ClickHouse URL function family — `domain`, `topLevelDomain`,
  * `firstSignificantSubdomain`, `path`, `queryString`, `fragment`,
  * `extractURLParameter`, `cutQueryStringAndFragment`, `netloc` — the
  * web-analytics accessors a ClickHouse nginx-log deployment (the
  * reference's own domain) queries constantly. Complements
  * `TextAnalysis.canonicalizeUrl` (t28): that one NORMALIZES before
  * dedup, these EXTRACT for grouping.
  *
  * All pure map-only, zero UDFs. Since r19 every accessor is ONE
  * codegen'd byte-scan kernel call ([[UrlKernels]]) instead of a stack
  * of 2–6 regex executions — bit-identical to the r15 regex
  * compositions, which live on as [[UrlFunctions.ref]] and pin the
  * kernels in `UrlKernelsSpec` (the q97/q98 oracles still mirror the
  * regex semantics token-for-token, warts included).
  *
  * Contract: `[scheme://][user[:pass]@]host[:port]` URLs — the scheme
  * is OPTIONAL, as in ClickHouse ("some.domain.com/path" works; r15
  * ADVICE retired the old scheme-required deviation). A host-less
  * relative path ("/a/b") reads an empty host and the path accessors
  * still apply. Protocol-relative "//host" is NOT special-cased
  * (the slashes read as path steps — pre-concat a scheme for those).
  * Deviations from ClickHouse, documented rather than hidden:
  *   - `topLevelDomain` returns '' for IPv4 hosts (as CH does) via an
  *     all-digits-and-dots guard, not a full IP parse.
  *   - `firstSignificantSubdomain` uses a compact multi-part-suffix
  *     heuristic (second-level labels co/com/org/net/gov/edu/ac under a
  *     2-letter cc-TLD) instead of CH's embedded public-suffix list —
  *     right on the overwhelmingly common cases (example.co.uk →
  *     example), an explicit approximation elsewhere.
  */
object UrlFunctions {

  private def k(url: Column, mode: Int): Column =
    ColumnBridge.column(
      UrlKernels.UrlExtract(ColumnBridge.expression(url), mode))

  /** host[:port] with userinfo — everything before the first `/`, `?`
    * or `#`, after the optional `scheme://` (ClickHouse `netloc` keeps
    * userinfo and port too, and accepts scheme-less URLs).
    */
  def netloc(url: Column): Column = k(url, UrlKernels.NETLOC)

  /** Bare host: netloc with userinfo and port stripped. */
  def domain(url: Column): Column = k(url, UrlKernels.DOMAIN)

  /** ClickHouse `domainWithoutWWW`: [[domain]] with one leading `www.`
    * label stripped (anchored — only the first label, never an inner
    * `www` subdomain).
    */
  def domainWithoutWWW(url: Column): Column = k(url, UrlKernels.DOMAIN_NO_WWW)

  /** ClickHouse `cutWWW`: the full URL with the host's leading `www.`
    * stripped in place (scheme, userinfo, port, path, query, fragment
    * all preserved).
    */
  def cutWWW(url: Column): Column = k(url, UrlKernels.CUT_WWW)

  /** Last dot-label of the host; '' for single-label or IPv4 hosts. */
  def topLevelDomain(url: Column): Column = k(url, UrlKernels.TLD)

  /** The registrable label: "clickhouse" in news.clickhouse.com and
    * example in example.co.uk (see object doc for the heuristic).
    */
  def firstSignificantSubdomain(url: Column): Column = k(url, UrlKernels.FSD)

  /** Path without query/fragment; bare authority → "/" (CH `path` shape). */
  def path(url: Column): Column = k(url, UrlKernels.PATH)

  /** Query string without the leading '?' or the fragment; '' if none. */
  def queryString(url: Column): Column = k(url, UrlKernels.QUERY)

  /** Fragment without the leading '#'; '' if none. */
  def fragment(url: Column): Column = k(url, UrlKernels.FRAGMENT)

  /** Value of the FIRST `name=` pair in the query string; '' if absent.
    * `name` is restricted to word characters so the kernel (and the
    * oracle's regex mirror) needs no quoting dialect.
    */
  def extractURLParameter(url: Column, name: String): Column =
    ColumnBridge.column(
      UrlKernels.UrlExtractParam(ColumnBridge.expression(url), name))

  /** URL with query string and fragment removed (no trailing '?'/'#'). */
  def cutQueryStringAndFragment(url: Column): Column = k(url, UrlKernels.CUT_QF)

  /** Scheme without '://'; '' when scheme-less (ClickHouse protocol). */
  def protocol(url: Column): Column = k(url, UrlKernels.PROTOCOL)

  /** Path WITH the query string, fragment excluded; '/' for a bare
    * authority (ClickHouse pathFull).
    */
  def pathFull(url: Column): Column = k(url, UrlKernels.PATH_FULL)

  /** URL with the query string removed (including '?'), fragment kept
    * (ClickHouse cutQueryString).
    */
  def cutQueryString(url: Column): Column = k(url, UrlKernels.CUT_Q)

  /** URL with the fragment removed (including '#'). */
  def cutFragment(url: Column): Column = k(url, UrlKernels.CUT_F)

  /** All `name=value` pairs of the query string in document order;
    * [] when there is no query string (ClickHouse extractURLParameters).
    */
  def extractURLParameters(url: Column): Column =
    filter(split(queryString(url), "&"), x => x =!= "")

  /** `[scheme://]netloc` prefix (no trailing slash) — the hierarchy
    * root. Scheme-less URLs keep their bare authority as the prefix
    * ("www.example.com/a" roots at "www.example.com/", ClickHouse's
    * own URLHierarchy read); a host-less relative path reads an empty
    * prefix and roots at "/". The old scheme-REQUIRED deviation is
    * retired (r15 ADVICE), spec- and oracle-pinned both ways.
    */
  private def schemePrefix(url: Column): Column = k(url, UrlKernels.SCHEME_PREFIX)

  /** Host truncated to start at the first significant subdomain —
    * ClickHouse `cutToFirstSignificantSubdomain` ("news.clickhouse.com.tr"
    * → "clickhouse.com.tr"); same suffix heuristic as
    * [[firstSignificantSubdomain]]. '' for IPv4 or dot-less hosts (no
    * registrable suffix exists).
    */
  def cutToFirstSignificantSubdomain(url: Column): Column =
    k(url, UrlKernels.CUT_TO_FSD)

  /** ClickHouse `URLPathHierarchy`: one array element per path level,
    * root '/' excluded — "/browse/CONF/x" → ["/browse/", "/browse/CONF/",
    * "/browse/CONF/x"]. Exact contract (documented so the q98 oracle can
    * mirror it): empty segments collapse (CH counts consecutive
    * separators as one), every non-final level ends with '/', the final
    * level ends with '/' only if the path did; bare authority (path "/")
    * → empty array. The sub-n `sequence` guard matters here too:
    * sequence(1, 0) is DESCENDING in Spark.
    */
  def urlPathHierarchy(url: Column): Column = {
    val p = path(url)
    val segs = filter(split(p, "/"), s => s =!= "")
    val n = size(segs)
    val endsSlash = p.rlike("/$")
    when(n === 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), n), i =>
        concat(lit("/"), array_join(slice(segs, lit(1), i), "/"),
          when(i === n && !endsSlash, lit("")).otherwise(lit("/")))))
  }

  /** ClickHouse `URLHierarchy`: `scheme://netloc/` as the root level,
    * then the [[urlPathHierarchy]] levels with the prefix re-attached,
    * then — when a query string exists — the query-bearing URL (fragment
    * excluded, a documented deviation: fragments are client-side) as the
    * final level.
    *
    * PERFORMANCE: this self-contained Column form embeds the accessor
    * subtrees inside the per-level lambda bodies, so each level
    * re-evaluates them — O(levels × kernels) per row. Fine for a scalar
    * SQL accessor; for CORPUS-scale hierarchy columns use
    * [[withUrlHierarchies]], which stages the shared pieces once per
    * row behind fences.
    */
  def urlHierarchy(url: Column): Column = {
    val pre = schemePrefix(url)
    val levels = concat(
      array(concat(pre, lit("/"))),
      transform(urlPathHierarchy(url), l => concat(pre, l)))
    val qs = queryString(url)
    when(qs === "", levels)
      .otherwise(concat(levels,
        array(concat(cutQueryStringAndFragment(url), lit("?"), qs))))
  }

  /** Corpus-scale form of [[urlPathHierarchy]] + [[urlHierarchy]]:
    * appends BOTH hierarchy columns with the shared per-row pieces
    * (prefix, path, query string, cut URL, path segments) computed
    * exactly once as FENCED intermediate columns — the per-level lambdas
    * then reference cheap bound attributes instead of re-evaluating the
    * accessor trees (the FuzzyMatch staging discipline; the fence
    * stops CollapseProject from inlining the definitions back in).
    * Results ≡ the Column forms row-for-row (spec-pinned).
    */
  def withUrlHierarchies(df: org.apache.spark.sql.DataFrame, urlCol: String,
      pathHierCol: String = "ph", urlHierCol: String = "uh"): org.apache.spark.sql.DataFrame = {
    import graft.functions.OptimizerFence
    val u = col(urlCol)
    val staged = df
      .withColumn("_uh_pre", OptimizerFence(schemePrefix(u)))
      .withColumn("_uh_p", OptimizerFence(path(u)))
      .withColumn("_uh_qs", OptimizerFence(queryString(u)))
      .withColumn("_uh_cut", OptimizerFence(cutQueryStringAndFragment(u)))
      .withColumn("_uh_segs",
        OptimizerFence(filter(split(col("_uh_p"), "/"), s => s =!= "")))
    val n = size(col("_uh_segs"))
    val endsSlash = col("_uh_p").rlike("/$")
    val ph = when(n === 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), n), i =>
        concat(lit("/"), array_join(slice(col("_uh_segs"), lit(1), i), "/"),
          when(i === n && !endsSlash, lit("")).otherwise(lit("/")))))
    val withPh = staged.withColumn(pathHierCol, OptimizerFence(ph))
    val levels = concat(
      array(concat(col("_uh_pre"), lit("/"))),
      transform(col(pathHierCol), l => concat(col("_uh_pre"), l)))
    val uh = when(col("_uh_qs") === "", levels)
      .otherwise(concat(levels,
        array(concat(col("_uh_cut"), lit("?"), col("_uh_qs")))))
    withPh.withColumn(urlHierCol, uh)
      .drop("_uh_pre", "_uh_p", "_uh_qs", "_uh_cut", "_uh_segs")
  }

  /** The r15 regex compositions — the semantics the kernels must match
    * bit-for-bit (`UrlKernelsSpec` pins every accessor on a
    * branch-covering corpus). Never on a hot path; the q97/q98 oracle
    * generators keep mirroring these token-for-token.
    */
  private[graft] object ref {

    /** Optional-scheme prefix: the greedy optional group eats `scheme://`
      * when present, so the following `[^/?#]*` always starts at the
      * authority (a scheme-less "host/path" starts there directly; a
      * host-less "/path" matches it empty).
      */
    private val SchemeRe = "^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?"

    def netloc(url: Column): Column =
      regexp_extract(url, SchemeRe + "([^/?#]*)", 1)

    def domain(url: Column): Column =
      regexp_replace(
        regexp_replace(netloc(url), "^[^@]*@", ""),
        ":[0-9]+$", "")

    def domainWithoutWWW(url: Column): Column =
      regexp_replace(domain(url), "^www\\.", "")

    def cutWWW(url: Column): Column =
      regexp_replace(url,
        "^((?:[a-zA-Z][a-zA-Z0-9+.-]*://)?(?:[^/?#@]*@)?)www\\.", "$1")

    def topLevelDomain(url: Column): Column = {
      val h = domain(url)
      when(h.rlike("^[0-9.]+$"), lit(""))
        .otherwise(regexp_extract(h, "\\.([a-zA-Z0-9-]+)$", 1))
    }

    def firstSignificantSubdomain(url: Column): Column = {
      val h = domain(url)
      val multi = regexp_extract(h,
        "([a-zA-Z0-9-]+)\\.(?:co|com|org|net|gov|edu|ac)\\.[a-zA-Z]{2}$", 1)
      val plain = regexp_extract(h, "([a-zA-Z0-9-]+)\\.[a-zA-Z0-9-]+$", 1)
      when(h.rlike("^[0-9.]+$"), lit(""))
        .otherwise(when(multi =!= "", multi)
          .otherwise(when(plain =!= "", plain).otherwise(h)))
    }

    def path(url: Column): Column = {
      val p = regexp_extract(url, SchemeRe + "[^/?#]*([^?#]*)", 1)
      when(p === "", lit("/")).otherwise(p)
    }

    def queryString(url: Column): Column =
      regexp_extract(url, "\\?([^#]*)", 1)

    def fragment(url: Column): Column =
      regexp_extract(url, "#(.*)$", 1)

    def extractURLParameter(url: Column, name: String): Column = {
      require(name.matches("[A-Za-z0-9_]+"),
        s"parameter name must be [A-Za-z0-9_]+, got '$name'")
      regexp_extract(queryString(url), s"(?:^|&)$name=([^&]*)", 1)
    }

    def cutQueryStringAndFragment(url: Column): Column =
      regexp_replace(url, "[?#].*$", "")

    def protocol(url: Column): Column =
      regexp_extract(url, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1)

    def pathFull(url: Column): Column = {
      val p = regexp_extract(url, SchemeRe + "[^/?#]*([^#]*)", 1)
      when(p === "", lit("/")).otherwise(p)
    }

    def cutQueryString(url: Column): Column =
      regexp_replace(url, "\\?[^#]*", "")

    def cutFragment(url: Column): Column =
      regexp_replace(url, "#.*$", "")

    def schemePrefix(url: Column): Column =
      regexp_extract(url, "^((?:[a-zA-Z][a-zA-Z0-9+.-]*://)?[^/?#]*)", 1)

    def cutToFirstSignificantSubdomain(url: Column): Column = {
      val h = domain(url)
      val multi = regexp_extract(h,
        "([a-zA-Z0-9-]+\\.(?:co|com|org|net|gov|edu|ac)\\.[a-zA-Z]{2})$", 1)
      val plain = regexp_extract(h, "([a-zA-Z0-9-]+\\.[a-zA-Z0-9-]+)$", 1)
      when(h.rlike("^[0-9.]+$"), lit(""))
        .otherwise(when(multi =!= "", multi).otherwise(plain))
    }
  }
}
