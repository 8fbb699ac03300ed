package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** URL / web-provenance operators for corpus curation (r13).
  *
  * Every web-scale training corpus keys on URLs — dedup by canonical URL,
  * per-domain quality budgets, SURT-ordered crawl partitioning — but URLs
  * arrive messy: scheme/host case, `www.` vanity prefixes, default ports,
  * fragments, tracking query params, unstable param order, trailing slashes.
  * This family provides:
  *
  *   - [[canonicalize]]: the normalization pass (lowercase scheme+host,
  *     strip `www.`, drop default ports, drop fragments, drop tracking
  *     params, sort surviving params, collapse trailing slashes) plus the
  *     registrable domain (public-suffix-lite: a small multi-label suffix
  *     list, else last two labels) and the SURT form (scheme-less,
  *     comma-reversed host labels — the Internet-Archive sort key that
  *     co-locates a domain's pages under any range partitioning).
  *   - URL-keyed exact dedup on the SURT key (scheme variants of one page
  *     fold together; distinct ports stay distinct).
  *   - a per-registrable-domain corpus report (docs, pages, dup rate,
  *     tokens) — the table a mixture designer reads before setting
  *     per-domain caps.
  *
  * Scale: [[canonicalize]] is pure codegen'd string expressions — a narrow
  * projection, zero shuffle, runs at scan speed over 100 TB. The dedup and
  * the report each add exactly one hash-shuffle on their group key. At the
  * 100 TB design point the dedup group key would ride as `xxhash64(surt)`
  * (8 bytes instead of the full string — same clusters, ~n²/2⁶⁴ collision
  * risk); the gated queries group on the string itself so the DuckDB dual
  * is exact, and the swap is a one-line projection.
  *
  * No counterpart in the reference (it ingests ticker APIs, not crawls);
  * this is the LLM-pipeline extension surface, same family as Dedup /
  * TextAnalysis.
  */
object Web {

  /** Query-param keys dropped by canonicalization: the ad/analytics
    * attribution params that vary per click without changing the page.
    */
  val trackingParamRe = "^(utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid)="

  /** Multi-label public suffixes recognized by [[registrableDomain]] —
    * a deliberately small public-suffix-list stand-in (the real PSL is a
    * data file; the operator structure is identical).
    */
  val multiLabelSuffixRe = "\\.(co\\.uk|org\\.uk|com\\.au|co\\.jp)$"

  /** Registrable domain of an already-lowercased host: last three labels
    * when the host ends in a listed multi-label suffix, else last two;
    * hosts of ≤2 labels pass through unchanged.
    */
  def registrableDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    when(size(labels) <= 2, host)
      .when(host.rlike(multiLabelSuffixRe), array_join(slice(labels, -3, 3), "."))
      .otherwise(array_join(slice(labels, -2, 2), "."))
  }

  /** Canonicalization pass: adds `url_canon`, `domain`, `surt` beside the
    * raw `urlCol`. All columns are built from codegen'd string expressions
    * (regexp_extract/replace, split, array_sort, higher-order filter) —
    * no UDF, no shuffle.
    */
  def canonicalize(df: DataFrame, urlCol: String): DataFrame = {
    // structural parse (fragment already stripped): scheme://host[:port]path[?query]
    val noFrag = regexp_replace(col(urlCol), "#.*", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostPort = lower(regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    val rawPath = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    val rawQuery = regexp_extract(noFrag, "\\?([^#]*)", 1)
    df.withColumn("__scheme", scheme)
      .withColumn("__host", regexp_replace(regexp_replace(hostPort, ":[0-9]+$", ""), "^www\\.", ""))
      .withColumn("__port", regexp_extract(hostPort, ":([0-9]+)$", 1))
      .withColumn("__path", {
        val p1 = regexp_replace(rawPath, "/+$", "")
        when(p1 === "", lit("/")).otherwise(p1)
      })
      .withColumn("__qs", {
        // drop empties + tracking params, then sort for order stability —
        // sorting the whole "k=v" strings sorts by key then value
        val params = filter(split(rawQuery, "&"),
          (p: Column) => p =!= "" && !p.rlike(trackingParamRe))
        array_join(array_sort(params), "&")
      })
      .withColumn("__portSfx", {
        val default = (col("__scheme") === "http" && col("__port") === "80") ||
          (col("__scheme") === "https" && col("__port") === "443")
        when(col("__port") =!= "" && !default, concat(lit(":"), col("__port"))).otherwise(lit(""))
      })
      .withColumn("__qSfx",
        when(col("__qs") =!= "", concat(lit("?"), col("__qs"))).otherwise(lit("")))
      .withColumn("url_canon",
        concat(col("__scheme"), lit("://"), col("__host"), col("__portSfx"),
          col("__path"), col("__qSfx")))
      .withColumn("domain", registrableDomain(col("__host")))
      // SURT: scheme-less, host labels reversed + comma-joined — range
      // partitioning on this key co-locates a domain (and its subdomains)
      .withColumn("surt",
        concat(array_join(reverse(split(col("__host"), "\\.")), ","),
          col("__portSfx"), lit(")"), col("__path"), col("__qSfx")))
      .drop("__scheme", "__host", "__port", "__path", "__qs", "__portSfx", "__qSfx")
  }

  /** URL-keyed exact dedup on the SURT key: one hash-shuffle on the key,
    * survivor = min id (the Dedup.exact rule). `n_distinct_canon` separates
    * true re-crawls (same canonical URL) from scheme/port variants that the
    * scheme-less SURT folds together.
    */
  def urlDedup(canonicalized: DataFrame, idCol: String): DataFrame =
    canonicalized.groupBy("surt").agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col("url_canon")).as("n_distinct_canon"),
      min(col(idCol)).as("keeper_id"))

  /** Per-registrable-domain corpus report: docs, distinct pages (SURT),
    * dup rate, whitespace tokens — the per-domain budget table. Two
    * partial-aggregable passes fused by Catalyst into one shuffle on
    * `domain` (countDistinct expands to the standard two-phase plan).
    */
  def domainReport(canonicalized: DataFrame, textCol: String): DataFrame =
    canonicalized.groupBy("domain").agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col("surt")).as("n_pages"),
      round(lit(1.0) - countDistinct(col("surt")).cast(DoubleType) /
        count(lit(1)).cast(DoubleType), 6).as("dup_rate"),
      sum(TextAnalysis.wsTokens(col(textCol)).cast(LongType)).as("total_tokens"))

  /** HTML → text extraction (r13): the front of every web-corpus pipeline.
    * Order is load-bearing: script/style BLOCKS drop first (dotall,
    * non-greedy — a `<` inside script code must not derail tag stripping),
    * then tags strip to spaces, then entities decode (`&amp;` LAST or it
    * double-decodes), then whitespace collapses. Pure codegen'd string
    * expressions — scan-speed, zero shuffle, the [[canonicalize]] class.
    */
  def htmlToText(html: Column): Column = {
    val noScript = regexp_replace(html, "(?s)<script.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?s)<style.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "<[^>]*>", " ")
    val decoded = replace(
      replace(
        replace(
          replace(
            replace(noTags, lit("&lt;"), lit("<")),
            lit("&gt;"), lit(">")),
          lit("&quot;"), lit("\"")),
        lit("&#39;"), lit("'")),
      lit("&amp;"), lit("&"))
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** All href link targets in an HTML payload, in document order. */
  def extractLinks(html: Column): Column =
    regexp_extract_all(html, lit("href=\"([^\"]*)\""), lit(1))

  /** Deterministic HTML fixture around (doc_id, text, url): a full page with
    * title/h1, a script block containing a bare `<` (the classic
    * tag-stripper trap), a style block, entity-encoded text, and two links
    * (the doc's messy [[withUrls]] URL + a case-messy absolute second link).
    * Pure string concatenation the oracle restates verbatim.
    */
  def withHtml(docsWithUrl: DataFrame): DataFrame = {
    val idStr = col("doc_id").cast(StringType)
    val c = (col("doc_id") % 100).cast(StringType)
    docsWithUrl.withColumn("html", concat(
      lit("<html><head><title>Doc "), idStr,
      lit("</title><script>var x = 1 < 2;</script><style>.c{color:red}</style></head><body><h1>Doc "),
      idStr, lit("</h1><p>"), col("text"),
      lit(" &amp; tail &lt;tag&gt;</p><a href=\""), col("url"),
      lit("\">first</a> <a href=\"HTTP://Example.COM/p?id="), c,
      lit("#x\">second</a></body></html>")))
  }

  /** Deterministic messy-URL fixture: derives a crawl-shaped `url` column
    * from `doc_id` — 100 page clusters (c = doc_id % 100), 7 hosts
    * (c % 7, one under a multi-label suffix), 5 mess variants
    * (v = doc_id ÷ 100 mod 5) that exercise every normalization rule:
    * case + `www.` + default port + fragment + tracking params (v0),
    * `:443` + trailing slash + unsorted params (v1), tracking params mixed
    * into sorted-order violations (v2), `www.` + fbclid (v3), and a
    * genuinely distinct page on a kept non-default port (v4). Variants
    * v0–v3 canonicalize to one SURT; v4 stays separate. The formula is
    * pure integer/string arithmetic the oracle restates verbatim.
    */
  def withUrls(docs: DataFrame): DataFrame = {
    val c = (col("doc_id") % 100).cast(StringType)
    val v = expr("doc_id DIV 100") % 5
    val h = (col("doc_id") % 100 % 7).cast(StringType)
    val hostbase = when(col("doc_id") % 100 % 7 === 6, lit("news.example.co.uk"))
      .otherwise(concat(lit("site"), h, lit(".example-"), h, lit(".com")))
    val art = concat(lit("/articles/"), c)
    val url = when(v === 0, concat(lit("HTTP://WWW."), upper(hostbase), lit(":80"), art,
        lit("?utm_source=feed&x=2&id="), c, lit("#frag")))
      .when(v === 1, concat(lit("https://"), hostbase, lit(":443"), art,
        lit("/?id="), c, lit("&x=2")))
      .when(v === 2, concat(lit("https://"), hostbase, art,
        lit("?x=2&id="), c, lit("&utm_campaign=summer&gclid=g"), c))
      .when(v === 3, concat(lit("https://www."), hostbase, art,
        lit("?id="), c, lit("&x=2&fbclid=f"), c))
      .otherwise(concat(lit("http://"), hostbase, lit(":8080"), art, lit("?id="), c))
    docs.withColumn("url", url)
  }
}
