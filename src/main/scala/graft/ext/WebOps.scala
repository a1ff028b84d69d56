package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-corpus URL operators — the canonicalization pass every
  * CommonCrawl-style pipeline runs before URL-keyed dedup (the same
  * page arrives as `HTTP://Site.com:80/a?utm_source=x&b=1#frag` and
  * `http://site.com/a?b=1`; without canonicalization URL dedup
  * misses most true duplicates). All steps are codegen'd built-in
  * string/array expressions (RE2-safe regexes — no lookaheads — so a
  * DuckDB oracle replays them verbatim): zero shuffle, scan speed at
  * 100 TB.
  *
  * Canonical form: lowercase scheme+authority; fragment dropped;
  * default ports (:80 http, :443 https) dropped; tracking params
  * (utm_*, fbclid, gclid, ref) dropped; surviving query params
  * sorted; empty query's '?' dropped.
  */
object WebOps {

  /** Lowercase the scheme+authority prefix only (paths are
    * case-sensitive). */
  private def lowerAuthority(u: Column): Column =
    concat(lower(regexp_extract(u, "^([^:/?#]+://[^/?#]*)", 1)),
      regexp_replace(u, "^[^:/?#]+://[^/?#]*", ""))

  def canonicalizeUrl(url: Column): Column = {
    val lowered = lowerAuthority(url)
    val noFrag = regexp_replace(lowered, "#.*$", "")
    val noPort = regexp_replace(
      regexp_replace(noFrag, "^(https://[^/:?#]+):443([/?#].*)?$", "$1$2"),
      "^(http://[^/:?#]+):80([/?#].*)?$", "$1$2")
    val query = regexp_extract(noPort, "\\?(.*)$", 1)
    val kept = sort_array(filter(split(query, "&"), p =>
      p =!= "" && !p.rlike("^(utm_[^=]*|fbclid|gclid|ref)=")))
    val base = regexp_replace(noPort, "\\?.*$", "")
    concat(base,
      when(size(kept) > 0, concat(lit("?"), array_join(kept, "&")))
        .otherwise(lit("")))
  }

  /** Registered domain of a canonical URL: host minus `www.`, cut to
    * the registrable suffix — a 2-label cut, except under the
    * multi-label public suffixes in `extraSuffixes` (a Mozilla-PSL
    * stand-in demonstrating the mechanism; production would load the
    * full list the same way) where 3 labels survive. */
  val extraSuffixes = Seq("co.uk", "com.au", "co.jp")

  def registeredDomain(canonUrl: Column): Column = {
    val host = regexp_replace(
      regexp_extract(canonUrl, "^[^:/?#]+://([^/:?#]+)", 1), "^www\\.", "")
    val labels = split(host, "\\.")
    val n = size(labels)
    val deep = extraSuffixes.map(s => host.endsWith("." + s))
      .reduce(_ || _)
    when(deep, concat_ws(".", slice(labels, n - 2, lit(3))))
      .otherwise(concat_ws(".", slice(labels, greatest(n - 1, lit(1)), lit(2))))
  }

  /** Per-row canonicalization screen: canonical URL + registered
    * domain + whether canonicalization changed anything (the dedup
    * win it unlocked). */
  def urlScreen(df: DataFrame, urlCol: String = "url"): DataFrame = {
    val canon = canonicalizeUrl(col(urlCol))
    df.withColumn("canon_url", canon)
      .withColumn("domain", registeredDomain(col("canon_url")))
      .withColumn("changed", col(urlCol) =!= col("canon_url"))
  }
}
