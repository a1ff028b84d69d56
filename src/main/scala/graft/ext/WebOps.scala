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

  // ── HTML main-content extraction (jusText/trafilatura-lite) ──────

  /** Strip tags and decode the four core entities. `&amp;` decodes
    * LAST (the HTML5 rule): `&amp;lt;` means the literal text "&lt;",
    * and amp-first would double-decode it to "<". */
  def htmlToText(html: Column): Column = {
    val noTags = trim(regexp_replace(html, "<[^>]*>", ""))
    Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) =>
        regexp_replace(c, e, java.util.regex.Matcher.quoteReplacement(r)) }
  }

  /** Link-density main-content extraction — the web-corpus cleaning
    * pass between raw HTML and the text pipeline (jusText, Pomikálek
    * 2011; trafilatura): segment the page into block elements, score
    * each block by LINK DENSITY (anchor-text chars / text chars —
    * boilerplate nav/footer/ad blocks are mostly links), keep blocks
    * under the density threshold with enough text, join the survivors.
    * Density is compared in integer micro units (1e6·link/text via
    * truncating div) so the gate replays bit-for-bit in the oracle.
    *
    * RE2-safe by construction (no backreferences — the block pattern
    * repeats the alternation instead of \\1): one pass of per-row
    * array expressions, zero shuffle, scan speed at 100 TB.
    *
    * Assumes non-nested block elements (the planted-fixture shape;
    * real pipelines run a proper parser in the decode stage — this is
    * the Spark-side plumbing and gate).
    *
    * @return doc_id, n_blocks, n_kept, main_text
    */
  def htmlMainContent(df: DataFrame, htmlCol: String = "html",
      maxLinkDensityMicro: Long = 500000L, minChars: Int = 10): DataFrame = {
    val blockPat = "<(?:p|div|nav|footer|li|h1)[^>]*>.*?</(?:p|div|nav|footer|li|h1)>"
    val blocks = regexp_extract_all(col(htmlCol), lit(blockPat), lit(0))
    // density gate as a CROSS-MULTIPLICATION (link·1e6 < thresh·text):
    // no division anywhere, so the comparison is exact int64 on both
    // engines — the floor-of-a-double-quotient boundary bug cannot
    // exist
    val scored = transform(blocks, b => {
      val text = htmlToText(b)
      val linkChars = aggregate(
        transform(regexp_extract_all(b, lit("<a [^>]*>([^<]*)</a>"), lit(1)),
          a => length(a)),
        lit(0), (acc, x) => acc + x)
      struct(text.as("text"),
        (length(text) >= minChars &&
          linkChars.cast("long") * lit(1000000L) <
            lit(maxLinkDensityMicro) * length(text).cast("long")).as("keep"))
    })
    df.select(col("doc_id"),
        size(blocks).as("n_blocks"),
        filter(scored, s => s("keep")).as("kept"))
      .select(col("doc_id"), col("n_blocks"),
        size(col("kept")).as("n_kept"),
        array_join(transform(col("kept"), s => s("text")), "\n").as("main_text"))
  }
}
