package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for LLM training-data pipelines over a
  * `text` column: token counting, quality scoring, language-ID
  * heuristic, document fingerprinting. Everything is built-in Column
  * compositions (codegen'd, no UDFs) so the hot path stays inside
  * whole-stage codegen and the DuckDB oracle can mirror it exactly.
  *
  * Scale: all per-row narrow transforms — no shuffle; at 100 TB these
  * run map-side at scan speed, bounded by parquet decode.
  */
object TextAnalysis {

  /** Canonical whitespace/case normalization used by fingerprints and
    * exact dedup. */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** MD5 fingerprint of normalized text (rolling-hash stand-in that
    * both engines implement identically). */
  def fingerprint(text: Column): Column = md5(normalize(text))

  /** Whitespace tokens, empties removed. array_remove (codegen'd)
    * rather than a filter() lambda: higher-order functions evaluate
    * interpreted per element, and this expression is inlined into
    * every downstream stat — the difference is ~10x on the curation
    * gate. Identical output (removes exactly the "" elements). */
  def tokens(text: Column): Column =
    array_remove(split(lower(text), "\\s+"), "")

  /** Adjacent-pair struct-explode SQL over an array column — the one
    * bigram expression bigramLogProb / pmiCollocations / textRank /
    * bpeTrain all build (field names vary per caller). */
  def adjacentPairsExpr(arrCol: String = "toks", f1: String = "a",
      f2: String = "b"): String =
    s"transform(sequence(1, size($arrCol) - 1), " +
    s"i -> struct($arrCol[i-1] as $f1, $arrCol[i] as $f2))"

  /** BPE-ish subword segmentation: runs of alphanumerics or single
    * non-space symbols (the classic pre-tokenizer regex). */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z0-9]+|[^a-z0-9\\s]"), lit(0)))

  private def countIn(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(lit): _*)))

  val EnStop = Seq("the", "a", "of", "and", "is", "to", "in", "it", "that")
  val EsStop = Seq("el", "la", "de", "y", "es", "en", "que", "los")
  val FrStop = Seq("le", "la", "de", "et", "est", "les", "des", "un")
  val DeStop = Seq("der", "die", "das", "und", "ist", "den", "von", "mit")

  /** Per-document stats + quality score:
    * 0.4·stopword-ratio + 0.4·min(tokens/100, 1) + 0.2·(1 − punct-ratio).
    * Deterministic double arithmetic (int/int divisions only). */
  def withStats(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    df.withColumn("n_tokens", size(toks))
      .withColumn("n_bpe_tokens", bpeTokenCount(t))
      .withColumn("n_punct", length(t) - length(regexp_replace(t, "[.!?,;:]", "")))
      .withColumn("n_stopwords", countIn(toks, EnStop))
      .withColumn("quality_score", round(
        col("n_stopwords").cast(DoubleType) / greatest(col("n_tokens"), lit(1)) * 0.4 +
        least(col("n_tokens").cast(DoubleType) / 100.0, lit(1.0)) * 0.4 +
        (lit(1.0) - col("n_punct").cast(DoubleType) / greatest(length(t), lit(1))) * 0.2,
        6))
      .withColumn("fingerprint", fingerprint(t))
  }

  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhoneRe = "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b"

  /** PII redaction for training corpora: mask emails and phone-shaped
    * numbers, report replacement counts. Pure regex Columns — runs at
    * scan speed. */
  def redact(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_emails",
        size(regexp_extract_all(t, lit(EmailRe), lit(0))))
      .withColumn("n_phones",
        size(regexp_extract_all(t, lit(PhoneRe), lit(0))))
      .withColumn("redacted",
        regexp_replace(regexp_replace(t, EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>"))
  }

  /** Typed PII EXTRACTION — the third face of the PII family next to
    * [[redact]] (masking) and [[luhnScreen]] (card numbers): the
    * governance/audit report that lists WHAT was found, per doc, as
    * typed arrays (sorted for deterministic replay). Only docs with at
    * least one hit are returned — at corpus scale the report is
    * incident-sized, not corpus-sized. Map-side regexp extraction at
    * scan speed, no shuffle.
    * @return (doc_id, emails, phones, n_emails, n_phones) for hits */
  def piiExtract(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    df.select(col(idCol),
        array_sort(regexp_extract_all(t, lit(EmailRe), lit(0))).as("emails"),
        array_sort(regexp_extract_all(t, lit(PhoneRe), lit(0))).as("phones"))
      .withColumn("n_emails", size(col("emails")))
      .withColumn("n_phones", size(col("phones")))
      .filter(col("n_emails") > 0 || col("n_phones") > 0)
  }

  /** BM25 ranking of the corpus against a fixed bag-of-words query —
    * the retrieval scorer quality-filtering and targeted-subset
    * extraction pipelines run over a training corpus ("find documents
    * about X"). Standard Okapi BM25 with the +1 idf smoothing:
    *
    *   idf_t  = ln((N − df_t + 0.5)/(df_t + 0.5) + 1)
    *   s(d,t) = idf_t · tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl))
    *
    * Scale shape: one narrow pass computes per-doc tf/dl; one
    * all-to-one aggregate yields the (single-row) corpus stats {N,
    * Σdl, df_t}, broadcast back; scoring is again narrow; the top-k
    * is TakeOrderedAndProject (per-partition heaps + driver merge, no
    * global sort). Terms are a compile-time Seq so every tf stays a
    * codegen'd column — the per-term score sum is a FIXED-ORDER
    * left-assoc chain, which is what lets DuckDB replay the doubles
    * bit-for-bit. */
  /** Character-level Shannon entropy per document — the classic
    * gibberish/binary/encoded-blob detector that complements
    * [[graft.ext.Curation.repetitionScore]] (token repetition) and
    * [[withStats]] (length/punct ratios): natural-language text sits
    * in a narrow entropy band, base64 blobs and key-mash far outside
    * it. H = Σ (c/n)·ln(n/c) over the per-doc char histogram; each
    * char's term is rounded to integer micro-nats BEFORE the per-doc
    * sum and the mean is a truncating integer division — the
    * [[graft.ext.Curation.bigramLogProb]] replay-exactness
    * discipline (summation order cannot perturb a long sum; every
    * term is ≥ 0 so HALF_UP and half-away-from-zero agree).
    *
    * Scale shape: explode is map-side; the histogram is one shuffle
    * on (doc, char) with partial combine (alphabet-bounded fanout:
    * ≤ |charset| rows per doc); totals and terms re-key by doc id.
    * Docs with empty text drop out (no histogram).
    *
    * @return (doc_id, n_chars, n_distinct_chars, entropy_micro).
    */
  def charEntropy(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    // two consumers (totals, terms) — materialize the histogram once
    val h = df.filter(length(col(textCol)) > 0)
      .select(col(idCol), explode(split(col(textCol), "")).as("ch"))
      .groupBy(col(idCol), col("ch")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val n = h.groupBy(col(idCol)).agg(sum(col("cnt")).as("n"),
      count(lit(1)).cast(IntegerType).as("n_distinct_chars"))
    val e = h.join(n.select(col(idCol), col("n")), Seq(idCol))
      .select(col(idCol),
        round(lit(1e6) * col("cnt") *
          log(col("n").cast(DoubleType) / col("cnt")))
          .cast(LongType).as("term"))
      .groupBy(col(idCol)).agg(sum(col("term")).as("s"))
    n.join(e, Seq(idCol))
      .select(col(idCol), col("n").cast(IntegerType).as("n_chars"),
        col("n_distinct_chars"), expr("s div n").as("entropy_micro"))
  }

  def bm25TopK(df: DataFrame, terms: Seq[String], k: Int = 20,
      k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = tokens(col(textCol))
    // tf via size − size(array_remove): array_remove is codegen'd and
    // CSE-shares the one split across all terms, where a filter()
    // lambda evaluates interpreted per element per term (measured
    // ~10× on this query); the count is identical.
    // localCheckpoint the narrow (id, dl, tf…) projection: BOTH passes
    // (corpus stats, scoring) read it, so the corpus is tokenized ONCE
    // — at 100 TB re-tokenizing the text for the second pass is the
    // dominant cost, and the checkpointed projection is k+2 ints per
    // doc, not the text.
    val tfCols = terms.zipWithIndex.map { case (tm, i) =>
      (size(toks) - size(array_remove(toks, tm))).as(s"tf$i") }
    val wtf = df.select(col(idCol) +: size(toks).as("dl") +: tfCols: _*)
      .localCheckpoint()
    val dfAggs = terms.indices.map(i =>
      sum((col(s"tf$i") > 0).cast(LongType)).as(s"df$i"))
    // the corpus stats are ONE row — collect and inline as literals
    // (the all-to-one aggregate happens either way; literal stats keep
    // the scoring expression small enough that codegen compile time
    // doesn't dominate, and drop the crossJoin/broadcast plumbing)
    val st = wtf.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).as("sum_dl") +: dfAggs): _*).head()
    val nDocs = st.getLong(0)
    // empty corpus: sum(dl) aggregates to null and avgdl would be 0/0
    // — return the empty result with the output schema instead
    if (nDocs == 0L)
      return wtf.select(col(idCol) +: col("dl") +:
        terms.indices.map(i => col(s"tf$i")) :+
        lit(0.0).as("bm25"): _*).limit(0)
    val avgdl = st.getLong(1).toDouble / nDocs
    def termScore(i: Int): Column = {
      val tf = col(s"tf$i").cast(DoubleType)
      val dfT = st.getLong(2 + i)
      val idf = math.log(((nDocs - dfT + 0.5) / (dfT + 0.5)) + 1.0)
      lit(idf) * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl").cast(DoubleType) / avgdl)))
    }
    val score = terms.indices.map(termScore).reduce(_ + _)
    // score>0 AFTER the top-k, not before: a pre-TakeOrdered Filter
    // gets pushed through the Project into the scan, where the score
    // expression inlines and the text re-tokenizes ~5x per row
    // (measured 4x wall-clock). Positives sort first, so top-k then
    // drop non-positives ≡ filter then top-k — on 20 rows, free.
    wtf.withColumn("score", score)
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
      .filter(col("score") > 0)
      .select(col(idCol) +: col("dl") +:
        terms.indices.map(i => col(s"tf$i")) :+
        round(col("score"), 6).as("bm25"): _*)
  }

  /** Reciprocal-rank fusion (Cormack/Clarke/Buettcher) — the standard
    * hybrid-retrieval combiner: given N ranked lists over the same
    * item space (lexical BM25, dense cosine, …), score every item by
    * Σ_lists 1/(rrfK + rank) and re-rank. Rank-based, so incomparable
    * score scales fuse without calibration. Each list's term is
    * rounded to integer MICRO-units before the sum (the
    * order-free-longs rule), so the fused ordering replays
    * bit-for-bit cross-engine.
    *
    * Scale shape: inputs are top-k lists — bounded by construction
    * (lists × k rows, NOT corpus-bound) — so the union, the groupBy,
    * and the single-partition rank window all operate on a few
    * hundred rows regardless of corpus size; the heavy lifting
    * happened inside the per-modality retrievers.
    *
    * @param rankings DataFrames each carrying (idCol, rankCol),
    *                 rank 1-based.
    * @return (item_id, rrf_micro, n_lists, rank) for the fused
    *         top `topK`, best first, ties by id.
    */
  def rrfFuse(rankings: Seq[DataFrame], rrfK: Int = 60, topK: Int = 10,
      idCol: String = "item_id", rankCol: String = "rank"): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    val terms = rankings.map(_.select(col(idCol),
      round(lit(1e6) / (lit(rrfK.toDouble) + col(rankCol)), 0)
        .cast(org.apache.spark.sql.types.LongType).as("term_micro")))
    terms.reduce(_ union _)
      .groupBy(col(idCol))
      .agg(sum(col("term_micro")).as("rrf_micro"),
        count(lit(1)).as("n_lists"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("rrf_micro").desc, col(idCol))))
      .filter(col("rank") <= topK)
  }

  /** Stopword-profile language-ID heuristic with a fixed precedence
    * (en > es > fr > de > unknown) on ties. A real system would use
    * char-n-gram profiles; the *shape* (per-row scoring + argmax) is
    * identical and that is what matters at scale. */
  def withLangId(df: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = tokens(col(textCol))
    val en = countIn(toks, EnStop); val es = countIn(toks, EsStop)
    val fr = countIn(toks, FrStop); val de = countIn(toks, DeStop)
    df.withColumn("en_hits", en).withColumn("es_hits", es)
      .withColumn("fr_hits", fr).withColumn("de_hits", de)
      .withColumn("lang_pred",
        when(col("en_hits") === 0 && col("es_hits") === 0 &&
          col("fr_hits") === 0 && col("de_hits") === 0, "unknown")
        .when(col("en_hits") >= col("es_hits") && col("en_hits") >= col("fr_hits") &&
          col("en_hits") >= col("de_hits"), "en")
        .when(col("es_hits") >= col("fr_hits") && col("es_hits") >= col("de_hits"), "es")
        .when(col("fr_hits") >= col("de_hits"), "fr")
        .otherwise("de"))
  }

  /** Apply a FIXED ordered BPE merge table to a document: the text is
    * spelled as a space-separated symbol stream (characters, original
    * spaces as the `▁`-style marker `_`), then each merge rewrites
    * every non-overlapping left-to-right occurrence of its pair —
    * exactly the iterative merge application of a learned BPE
    * tokenizer (the table here is a literal; production loads the
    * learned one). The whole cascade is a chain of literal replace()
    * calls, fully codegen'd, zero shuffle — tokenization at scan
    * speed, the property a 100 TB tokenize pass needs. Both engines'
    * replace() share the left-to-right non-overlap contract, so a
    * DuckDB replay is character-identical.
    *
    * @return original columns + bpe_symbols (the merged stream) and
    *         n_bpe_symbols.
    */
  def bpeApply(df: DataFrame,
      merges: Seq[(String, String)] = DefaultMerges,
      textCol: String = "text"): DataFrame = {
    // "abc d" -> "a b c _ d": one space after every char, spaces
    // become the word-boundary marker
    val spelled = trim(regexp_replace(
      regexp_replace(lower(col(textCol)), " ", "_"), "(.)", "$1 "))
    val merged = merges.foldLeft(spelled) { case (acc, (a, b)) =>
      call_function("replace", acc, lit(s"$a $b"), lit(a + b)) }
    df.withColumn("bpe_symbols", merged)
      .withColumn("n_bpe_symbols", size(split(col("bpe_symbols"), " ")))
  }

  /** Top-k collocations by pointwise mutual information over adjacent
    * token pairs: PMI(a,b) = ln(c(ab)·N² / (B·c(a)·c(b))), with N =
    * total tokens and B = total bigrams. The ratio is assembled in
    * DOUBLE with a FIXED operation order and passed through ONE ln —
    * the engine-agreement discipline the bigram-LM NLL already proved
    * out — then micro-rounded, so ranking needs no float tolerance.
    * `minCount` suppresses the classic PMI pathology (hapax pairs
    * scoring highest).
    *
    * Scale shape: unigram and bigram counts are each one map-side
    * partial-agg'd shuffle; N and B are one-row aggregates broadcast
    * back; the two count joins key on the token; top-k is TakeOrdered.
    *
    * @return (a, b, pair_n, pmi_micro, rn) — top `topK` by
    *         (pmi desc, a, b).
    */
  def pmiCollocations(df: DataFrame, minCount: Long = 5, topK: Int = 20,
      textCol: String = "text"): DataFrame = {
    val toksed = df.select(tokens(col(textCol)).as("toks")).localCheckpoint()
    val uni = toksed.select(explode(col("toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val bi = toksed.filter(size(col("toks")) >= 2)
      .select(explode(expr(adjacentPairsExpr())).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("pair_n"))
      .localCheckpoint()
    // both consumers of the tokenized corpus are now materialized —
    // release its pinned blocks; the returned plan reads only uni/bi
    Checkpoints.release(toksed)
    val totals = uni.agg(sum(col("c")).as("n_tokens"))
      .crossJoin(bi.agg(sum(col("pair_n")).as("n_bigrams")))
    bi.filter(col("pair_n") >= minCount)
      .join(uni.select(col("w").as("a"), col("c").as("ca")), "a")
      .join(uni.select(col("w").as("b"), col("c").as("cb")), "b")
      .crossJoin(broadcast(totals))
      .withColumn("pmi_micro", round(log(
        (col("pair_n").cast(DoubleType) * col("n_tokens") * col("n_tokens")) /
          (col("n_bigrams").cast(DoubleType) * col("ca") * col("cb"))) * 1e6, 0)
        .cast(LongType))
      .orderBy(col("pmi_micro").desc, col("a"), col("b"))
      .limit(topK)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("pmi_micro").desc, col("a"), col("b"))).cast(IntegerType))
      .select("a", "b", "pair_n", "pmi_micro", "rn")
  }

  /** A small frequency-plausible English merge table for [[bpeApply]]
    * demos/tests; ordered (later merges may consume earlier outputs). */
  val DefaultMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n", "an" -> "d",
    "e" -> "r", "o" -> "r", "s" -> "t", "the" -> "_", "and" -> "_")

  /** Overlapping fixed-size chunker — the RAG/embedding-prep shape:
    * windows of `chunkTokens` tokens starting every
    * `chunkTokens − overlap` positions, so consecutive chunks share
    * `overlap` tokens and no boundary sentence is ever split without a
    * copy that contains it whole. The final chunk may be shorter.
    * Entirely per-row array arithmetic + one posexplode — ZERO
    * shuffle, chunking runs at scan speed at any corpus size.
    *
    * @return (doc_id, chunk_idx, n_chunk_tokens, chunk_text).
    */
  def chunkWithOverlap(df: DataFrame, chunkTokens: Int = 64,
      overlap: Int = 16, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(overlap < chunkTokens, "overlap must be < chunkTokens")
    val stride = chunkTokens - overlap
    // last start: once a start position would add no tokens beyond the
    // previous chunk's coverage (start ≥ n − overlap), the chunk would
    // be a pure suffix-duplicate of its neighbor — stop before it
    df.select(col(idCol), tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col(idCol), posexplode(expr(
        s"transform(sequence(0, greatest(0, " +
        s"(size(toks) - $overlap - 1) div $stride)), " +
        s"i -> slice(toks, i * $stride + 1, $chunkTokens))"))
        .as(Seq("chunk_idx", "chunk")))
      .select(col(idCol), col("chunk_idx"),
        size(col("chunk")).as("n_chunk_tokens"),
        array_join(col("chunk"), " ").as("chunk_text"))
  }

  /** BPE merge-table TRAINING — the other half of [[bpeApply]]: start
    * from the character-spelled corpus and repeat until `merges`
    * merges are learned: (a) count every adjacent symbol pair in ONE
    * corpus pass, (b) take the top `remaining` pairs in (cnt desc, a,
    * b) order and greedily keep the ones pairwise-DISJOINT from every
    * earlier keep in that order (no shared symbol, and no symbol
    * equal to an earlier keep's merged token), (c) apply the whole
    * batch in one rewrite with the same literal replace() contract
    * bpeApply uses, in selection order. Disjointness makes each
    * kept pair's count exact at selection time (merging (a,b)
    * cannot create or destroy (c,d) adjacencies when the symbols are
    * disjoint), so batching k compatible merges costs one corpus
    * pass instead of k — the standard batched-BPE trainer speedup.
    * Conflicting runner-ups are NOT applied; they are re-counted
    * next round. The greedy order keeps the loop deterministic and
    * engine-portable.
    *
    * Caveat vs classical sequential BPE: counts are exact at
    * selection time, but ranking is not re-evaluated WITHIN a round —
    * a pair created by an earlier merge in the same batch (("ab","c")
    * after merging ("a","b")) is never considered against the kept
    * runner-ups, even if it would outrank them. The learned table can
    * therefore differ from a strict top-1-per-pass trainer; batching
    * trades that re-ranking for k× fewer corpus passes.
    *
    * Scale shape: each round is ONE pair-count shuffle (map-side
    * partial agg — a pair appearing 10⁹ times is one key) + a
    * top-`remaining` TakeOrdered; only ≤ `merges` rows ever reach
    * the driver (the centroid-table discipline). The batch rewrite
    * is a pure map, and the corpus is re-checkpointed per round so
    * the next round rescans materialized symbols instead of a
    * k-deep replace chain.
    *
    * @return (step, a, b, cnt): 1-based merge order, the pair, and its
    *         count at selection time.
    */
  def bpeTrain(df: DataFrame, merges: Int = 3,
      textCol: String = "text"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val spelled = trim(regexp_replace(
      regexp_replace(lower(col(textCol)), " ", "_"), "(.)", "$1 "))
    var corpus = df.select(spelled.as("s")).localCheckpoint()
    val learned = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var exhausted = false
    while (learned.size < merges && !exhausted) {
      val remaining = merges - learned.size
      val top = corpus
        .select(split(col("s"), " ").as("arr"))
        .filter(size(col("arr")) >= 2)
        .select(explode(expr(adjacentPairsExpr("arr"))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(remaining).as[(String, String, Long)].collect()
      if (top.isEmpty) exhausted = true // corpus has no pairs left
      else {
        val used = scala.collection.mutable.Set[String]()
        val batch = top.filter { case (a, b, _) =>
          val ok = !used(a) && !used(b)
          if (ok) { used += a; used += b; used += (a + b) }
          ok
        } // first row always survives: used starts empty
        batch.foreach { case (a, b, cnt) =>
          learned += ((learned.size + 1, a, b, cnt)) }
        val superseded = corpus
        corpus = corpus.select(batch.foldLeft(col("s")) {
            case (c, (a, b, _)) =>
              call_function("replace", c, lit(a + " " + b), lit(a + b))
          }.as("s")).localCheckpoint()
        // the new checkpoint materialized FROM the old one — the old
        // round's blocks are dead the moment the rewrite lands
        Checkpoints.release(superseded)
      }
    }
    // the merge table was collected on the driver; nothing reads the
    // final corpus materialization again
    Checkpoints.release(corpus)
    learned.toSeq.toDF("step", "a", "b", "cnt")
  }

  /** Blocklist screen (the C4 "bad words" gate, list-of-phrases form):
    * per doc, which blocklist terms occur as SUBSTRINGS of the
    * lowercased text — phrases crossing token boundaries included —
    * plus the keep gate (no term fired). One Aho–Corasick automaton
    * pass per row ([[graft.expressions.MultiMatch]]) instead of
    * |terms| contains() probes, so the gate costs O(bytes) no matter
    * how long the list grows; the term list ships inside the
    * expression (≈ a broadcast, bounded by list size).
    *
    * Scale: narrow map-side transform — no shuffle; runs at parquet
    * scan speed on a 100 TB corpus.
    *
    * @return doc_id, n_matches, matched_csv (pattern-list order), keep
    */
  def blocklistScreen(docs: DataFrame, terms: Seq[String],
      textCol: String = "text"): DataFrame = {
    // Locale.ROOT: a tr-locale JVM would lower "INDEX" to dotless-ı
    // bytes that Spark's locale-independent lower() never produces —
    // the term would silently never fire
    val lowered = terms.map(_.toLowerCase(java.util.Locale.ROOT))
    // null text ≡ empty text for the gate (no term can match), the
    // same contract the oracle's LEFT JOIN + COALESCE implements — a
    // null gate column would drop the doc from BOTH keep-filters
    val matched = coalesce(
      graft.expressions.MultiMatch.matchedTerms(lower(col(textCol)), lowered),
      array().cast("array<string>"))
    docs.select(col("doc_id"), matched.as("matched"))
      .select(col("doc_id"),
        size(col("matched")).as("n_matches"),
        array_join(col("matched"), ",").as("matched_csv"),
        (size(col("matched")) === 0).as("keep"))
  }

  /** Vocabulary pruning curve — tokenizer sizing by MIN-COUNT cutoff
    * (how BPE/WordPiece vocabularies actually prune): for each
    * threshold t, the surviving vocab size and the fraction of token
    * OCCURRENCES still covered. Deliberately rank-free: a "top-k
    * tokens" curve needs a global vocab sort; the min-count framing
    * is pure aggregation, so the same plan holds at a 10⁹-type
    * vocabulary ([[vocabRichness]]'s frequency table, read once).
    *
    * Scale shape: one (token-hash) count shuffle, then a
    * thresholds×vocab explode collapsed by ONE map-combined
    * aggregation — no sort anywhere. All sums exact longs; coverage
    * is one micro-rounded division.
    *
    * @return (min_count, vocab_size, covered_tokens, coverage_micro)
    */
  def vocabPruningCurve(docs: DataFrame,
      thresholds: Seq[Long] = Seq(1L, 2L, 4L, 8L, 16L, 32L, 64L, 128L, 256L),
      textCol: String = "text"): DataFrame = {
    val counts = docs
      .select(explode(tokens(col(textCol))).as("tok"))
      .select(Dedup.portableHash60(concat(lit("vp|"), col("tok"))).as("h"))
      .groupBy("h").agg(count(lit(1)).as("c"))
      .localCheckpoint() // vocab-bounded; feeds the curve AND the total
    val total = counts.agg(sum(col("c")).as("n_total"))
    val out = counts
      .select(col("c"), explode(typedLit(thresholds)).as("min_count"))
      .filter(col("c") >= col("min_count"))
      .groupBy("min_count")
      .agg(count(lit(1)).as("vocab_size"), sum(col("c")).as("covered_tokens"))
      .crossJoin(broadcast(total))
      .select(col("min_count"), col("vocab_size"), col("covered_tokens"),
        round(col("covered_tokens").cast(DoubleType) * 1e6 /
          col("n_total").cast(DoubleType), 0).cast(LongType)
          .as("coverage_micro"))
      .localCheckpoint()
    graft.ext.Checkpoints.release(counts)
    out
  }

  /** Luhn-validated payment-card screening — the PII gate's
    * high-precision tier: raw digit-run regexes flag phone numbers,
    * order ids, and timestamps; a 13–19 digit run that passes the
    * Luhn mod-10 checksum (with optional space/dash grouping) is
    * card-shaped with ~10× fewer false positives, which is what
    * decides whether a whole document is quarantined. Candidates
    * extract with one RE2-safe regexp pass; the checksum runs inside
    * a per-candidate array fold (double every second digit from the
    * right, subtract 9 over 9, sum ≡ 0 mod 10).
    *
    * Zero shuffle — the whole screen is per-row array expressions at
    * scan speed; both engines share the regexp and fold arithmetic,
    * so a DuckDB replay is exact.
    *
    * @return (doc_id, n_candidates, n_luhn_valid, keep) */
  def luhnScreen(docs: DataFrame, textCol: String = "text"): DataFrame = {
    // digit runs of 13-19 allowing single space/dash separators,
    // bounded both sides by non-digits (RE2-safe: no lookarounds —
    // anchor on the stripped form's length instead)
    val cands =
      expr(s"""filter(transform(
        regexp_extract_all($textCol, '[0-9][0-9 -]{11,24}[0-9]', 0),
        c -> regexp_replace(c, '[ -]', '')),
        d -> length(d) >= 13 AND length(d) <= 19)""")
    val valid =
      """filter(cands, d -> aggregate(sequence(0, length(d) - 1), 0,
        (acc, i) -> acc + (CASE WHEN i % 2 = 1
          THEN IF(CAST(substring(reverse(d), i + 1, 1) AS INT) * 2 > 9,
            CAST(substring(reverse(d), i + 1, 1) AS INT) * 2 - 9,
            CAST(substring(reverse(d), i + 1, 1) AS INT) * 2)
          ELSE CAST(substring(reverse(d), i + 1, 1) AS INT) END)) % 10 = 0)"""
    docs.select(col("doc_id"), cands.as("cands"))
      .select(col("doc_id"), size(col("cands")).as("n_candidates"),
        size(expr(valid)).as("n_luhn_valid"))
      .withColumn("keep", col("n_luhn_valid") === 0)
  }

  /** Vocabulary richness / sample-coverage estimators per source —
    * the "how much of this source's vocabulary have we actually
    * seen" corpus statistic that sizes tokenizer vocab and flags
    * under-crawled sources: bias-corrected Chao1 richness
    * V + F₁(F₁−1)/(2(F₂+1)) (Chao 1984; F_k = # tokens seen exactly
    * k times) and Good–Turing sample coverage 1 − F₁/N.
    *
    * Scale shape: one (source, token-hash) count shuffle (map-side
    * combined, hashes are longs), then a source-keyed rollup of the
    * frequency-of-frequencies — nothing corpus-proportional after
    * the first aggregate. Estimator divisions are single IEEE ops on
    * exact longs, rounded to 6dp.
    *
    * @return (source, n_tokens, vocab, f1, f2, chao1, coverage) */
  def vocabRichness(docs: DataFrame, srcCol: String = "source",
      textCol: String = "text"): DataFrame = {
    val counts = docs.select(col(srcCol).as("source"),
        explode(tokens(col(textCol))).as("tok"))
      .select(col("source"),
        Dedup.portableHash60(concat(lit("vr|"), col("tok"))).as("h"))
      .groupBy("source", "h").agg(count(lit(1)).as("c"))
    counts.groupBy("source").agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("vocab"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("f1"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).as("f2"))
      .select(col("source"), col("n_tokens"), col("vocab"), col("f1"),
        col("f2"),
        round(col("vocab").cast(DoubleType) +
          (col("f1") * (col("f1") - 1L)).cast(DoubleType) /
            (lit(2L) * (col("f2") + 1L)).cast(DoubleType), 6).as("chao1"),
        round(lit(1.0) -
          col("f1").cast(DoubleType) / col("n_tokens").cast(DoubleType), 6)
          .as("coverage"))
  }

  /** ROUGE-N overlap between paired (candidate, reference) texts —
    * the n-gram eval metric (Lin, 2004) a summarization/distillation
    * pipeline scores its outputs with, and a cheap text-pair
    * similarity for QA of rewrite/augmentation stages: clipped n-gram
    * matches Σ min(count_cand, count_ref), recall = overlap/ref-grams
    * (ROUGE is recall-oriented), precision = overlap/cand-grams, F1.
    *
    * Scale shape: n-grams build inside per-row array expressions
    * (zero shuffle), collapse to (pair, gram-hash) counts (one keyed
    * shuffle each side, map-side combined), clip-join on
    * (pair, hash) — co-keyed, no fanout — and roll up per pair.
    * Grams travel as 60-bit portable hashes, so shuffles move longs
    * and the DuckDB oracle replays them. Pairs where either side has
    * < n tokens score 0 by the zero-denominator contract.
    *
    * @param cand (idCol, textCol) candidate rows, one per pair id
    * @param ref  (idCol, textCol) reference rows, same id domain;
    *             only ids present on BOTH sides are scored
    * @return (pair_id, overlap, n_cand, n_ref, rouge_p, rouge_r,
    *         rouge_f1) */
  def rougeN(cand: DataFrame, ref: DataFrame, n: Int = 2,
      idCol: String = "pair_id", textCol: String = "text"): DataFrame =
    rougeNLazy(cand, ref, n, idCol, textCol)._1

  /** The full ROUGE plan + the two gram-count legs (PlanAuditSpec
    * asserts on the plan; the legs are exposed for callers that want
    * to materialize them). Deliberately LAZY: an eager-checkpoint
    * variant of the two gram legs measured 7× SLOWER at sf0.1 (0.15 s
    * → 1.09 s) because Spark's ReuseExchange already dedupes the two
    * identical bins-keyed branches — the checkpoint traded one real
    * exchange for three materialization jobs. Measure, don't guess. */
  private[graft] def rougeNLazy(cand: DataFrame, ref: DataFrame, n: Int = 2,
      idCol: String = "pair_id", textCol: String = "text")
      : (DataFrame, DataFrame, DataFrame) = {
    def gramCounts(df: DataFrame, cnt: String): DataFrame =
      df.select(col(idCol).as("pair_id"), tokens(col(textCol)).as("toks"))
        .filter(size(col("toks")) >= n)
        .select(col("pair_id"), explode(expr(
          s"transform(sequence(1, size(toks) - ${n - 1}), " +
            s"i -> concat_ws(' ', slice(toks, i, $n)))")).as("gram"))
        .select(col("pair_id"),
          Dedup.portableHash60(concat(lit("rg|"), col("gram"))).as("h"))
        .groupBy("pair_id", "h").agg(count(lit(1)).as(cnt))
    val cg = gramCounts(cand, "cc")
    val rg = gramCounts(ref, "rc")
    val ov = cg.join(rg, Seq("pair_id", "h"))
      .groupBy("pair_id").agg(sum(least(col("cc"), col("rc"))).as("overlap"))
    val nc = cg.groupBy("pair_id").agg(sum(col("cc")).as("n_cand"))
    val nr = rg.groupBy("pair_id").agg(sum(col("rc")).as("n_ref"))
    val base = cand.select(col(idCol).as("pair_id"))
      .join(ref.select(col(idCol).as("pair_id")), Seq("pair_id"))
    val p = when(col("n_cand") > 0,
      col("overlap").cast(DoubleType) / col("n_cand").cast(DoubleType))
      .otherwise(0.0)
    val r = when(col("n_ref") > 0,
      col("overlap").cast(DoubleType) / col("n_ref").cast(DoubleType))
      .otherwise(0.0)
    val out = base.join(nc, Seq("pair_id"), "left")
      .join(nr, Seq("pair_id"), "left")
      .join(ov, Seq("pair_id"), "left")
      .select(col("pair_id"),
        coalesce(col("overlap"), lit(0L)).as("overlap"),
        coalesce(col("n_cand"), lit(0L)).as("n_cand"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"))
      .select(col("pair_id"), col("overlap"), col("n_cand"), col("n_ref"),
        round(p, 6).as("rouge_p"), round(r, 6).as("rouge_r"),
        round(when(p + r > 0.0, lit(2.0) * p * r / (p + r)).otherwise(0.0), 6)
          .as("rouge_f1"))
    (out, cg, rg)
  }

  /** Zipf-law slope per source — the corpus-health diagnostic next to
    * [[vocabRichness]]: natural text follows freq ∝ rank^s with
    * s ≈ −1; a slope far above −1 (flat) signals template/boilerplate
    * corpora, far below signals a degenerate vocabulary. Fits OLS of
    * ln(freq) on ln(rank) over each source's top-`topK` tokens.
    *
    * Exactness: ln(rank)/ln(count) are micro-rounded per term before
    * any sum; the OLS numerator/denominator are exact-long
    * Σ-products (bounds documented: safe through ~10¹² tokens per
    * source at topK ≤ 1000); slope and intercept are fixed-shape
    * double divisions, micro-rounded. Sources whose top-K has one
    * distinct rank (n < 2) score slope 0 by convention.
    *
    * Scale shape: one (source, token-hash) count shuffle, then the
    * per-source top-K via the bounded-heap partial aggregate
    * ([[graft.expressions.TopKByScore]] — no task ever holds more
    * than K entries, where a rank window would sort a source's whole
    * vocabulary in one task), then source-sized OLS sums.
    *
    * @return (source, n_terms, slope_micro, intercept_micro) */
  def zipfSlope(docs: DataFrame, topK: Int = 50,
      srcCol: String = "source", textCol: String = "text"): DataFrame = {
    val counts = docs
      .select(col(srcCol).as("source"), explode(tokens(col(textCol))).as("tok"))
      .select(col("source"),
        Dedup.portableHash60(concat(lit("zf|"), col("tok"))).as("h"))
      .groupBy("source", "h").agg(count(lit(1)).as("c"))
    // rank = heap position under (count desc, hash asc) — identical
    // to the window form, bounded-heap partials instead of a sort
    val top = counts.groupBy("source")
      .agg(graft.expressions.TopKByScore.topK(
        col("c").cast(DoubleType), col("h"), col("c"), topK).as("topk"))
      .select(col("source"), posexplode(col("topk")))
      .select(col("source"), (col("pos") + 1).cast(LongType).as("rank"),
        col("col.payload").as("c"))
    val xy = top.select(col("source"),
      round(log(col("rank").cast(DoubleType)) * 1e6, 0).cast(LongType).as("x"),
      round(log(col("c").cast(DoubleType)) * 1e6, 0).cast(LongType).as("y"))
    val agg = xy.groupBy("source").agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("y")).as("sxy"))
    val den = (col("n") * col("sxx") - col("sx") * col("sx"))
    val slopeRaw = (col("n") * col("sxy") - col("sx") * col("sy"))
      .cast(DoubleType) / den.cast(DoubleType)
    agg.select(col("source"), col("n").as("n_terms"),
      when(den === 0L, 0L).otherwise(
        round(slopeRaw * 1e6, 0).cast(LongType)).as("slope_micro"),
      when(den === 0L, round(col("sy").cast(DoubleType) /
          col("n").cast(DoubleType), 0).cast(LongType))
        .otherwise(round((col("sy").cast(DoubleType) -
          slopeRaw * col("sx").cast(DoubleType)) /
          col("n").cast(DoubleType), 0).cast(LongType))
        .as("intercept_micro"))
  }

  /** Corpus-level BLEU-N (Papineni et al., 2002) over candidate/
    * reference pairs — the MT/distillation eval twin of [[rougeN]]:
    * per order n ≤ maxN, clipped precision
    * pₙ = Σ_pairs Σ_g min(countᶜ, countʳ) / Σ_pairs cand-grams, all
    * corpus-summed BEFORE dividing (the corpus-BLEU definition, which
    * is what makes the statistic stable), then
    * BLEU = BP · (Π pₙ)^(1/maxN) with the brevity penalty
    * BP = min(1, e^(1−r_len/c_len)).
    *
    * Exactness: clip/total counts are order-free long sums; each pₙ
    * is one exact-long division. The root is IEEE-exact for maxN = 2
    * (sqrt is correctly rounded); BP's exp fires only when the corpus
    * candidate length is short of the reference and runs on one
    * group-level scalar built from exact longs — 6dp rounding absorbs
    * the sub-ulp libm spread (the q_hits/q_dsir micro discipline).
    *
    * Scale shape: identical to [[rougeN]] per order — per-row gram
    * arrays, (order, pair, hash)-keyed counts, co-keyed clip join,
    * then an orders-sized rollup. One logical pipeline serves all
    * orders (the order is part of the key, NOT a separate pass), so
    * the corpus is read once per side regardless of maxN.
    *
    * @param cand (idCol, textCol) candidate rows, one per pair id
    * @param ref  (idCol, textCol) reference rows, same id domain;
    *             only ids present on both sides are scored
    * @return one row: (n_pairs, c_len, r_len, clip_1.., tot_1..,
    *         p_1.., bp, bleu) — p/bp/bleu 6dp */
  def corpusBleu(cand: DataFrame, ref: DataFrame, maxN: Int = 2,
      idCol: String = "pair_id", textCol: String = "text"): DataFrame = {
    val (lazyOut, ids) = corpusBleuLazy(cand, ref, maxN, idCol, textCol)
    val out = lazyOut.localCheckpoint() // one-row result; release scaffold
    graft.ext.Checkpoints.release(ids)
    out
  }

  /** The lazy BLEU plan + the pinned scored-ids table (PlanAuditSpec
    * asserts on the plan; [[corpusBleu]] materializes and releases). */
  private[graft] def corpusBleuLazy(cand: DataFrame, ref: DataFrame,
      maxN: Int, idCol: String, textCol: String): (DataFrame, DataFrame) = {
    require(maxN >= 1 && maxN <= 4, "maxN in [1,4]")
    // ids on both sides — pairs-bounded, read by both gram legs
    val ids = cand.select(col(idCol).as("pair_id"))
      .join(ref.select(col(idCol).as("pair_id")), Seq("pair_id"))
      .distinct().localCheckpoint()
    // (order, pair, hash) counts for every order in ONE pass: the
    // per-row flatten emits each order's grams tagged with n
    def gramCounts(df: DataFrame, cnt: String): DataFrame =
      df.select(col(idCol).as("pair_id"), tokens(col(textCol)).as("toks"))
        .join(ids, Seq("pair_id"))
        .select(col("pair_id"), explode(expr(
          // per-order guard: sequence(1, 0) would DESCEND, not empty
          (1 to maxN).map(n =>
            s"if(size(toks) >= $n, " +
              s"transform(sequence(1, size(toks) - ${n - 1}), " +
              s"i -> concat('$n|', concat_ws(' ', slice(toks, i, $n)))), " +
              "array())")
            .mkString("flatten(array(", ", ", "))"))).as("gram"))
        .select(col("pair_id"),
          substring(col("gram"), 1, 1).cast(IntegerType).as("n"),
          Dedup.portableHash60(concat(lit("bl|"), col("gram"))).as("h"))
        .groupBy("n", "pair_id", "h").agg(count(lit(1)).as(cnt))
    val cg = gramCounts(cand, "cc")
    val rg = gramCounts(ref, "rc")
    val clip = cg.join(rg, Seq("n", "pair_id", "h"))
      .groupBy("n").agg(sum(least(col("cc"), col("rc"))).as("clip"))
    val tot = cg.groupBy("n").agg(sum(col("cc")).as("tot"))
    // corpus token lengths ARE the unigram totals already counted in
    // the gram legs (each token is exactly one 1-gram) — deriving
    // them from tot/rg saves two further full corpus scans, and
    // ReuseExchange shares the gram-leg subtrees across consumers
    val cLen = tot.filter(col("n") === 1)
      .agg(coalesce(sum(col("tot")), lit(0L)).as("c_len"))
    val rLen = rg.filter(col("n") === 1)
      .agg(coalesce(sum(col("rc")), lit(0L)).as("r_len"))
    val orders = tot.join(clip, Seq("n"), "left")
      .select(col("n"), col("tot"), coalesce(col("clip"), lit(0L)).as("clip"))
      .withColumn("p", when(col("tot") > 0L,
        col("clip").cast(DoubleType) / col("tot").cast(DoubleType))
        .otherwise(0.0))
    // orders-sized pivot into one row (maxN ≤ 4 columns)
    val wide = orders.groupBy().pivot("n", (1 to maxN).map(Int.box))
      .agg(first(col("clip")).as("clip"), first(col("tot")).as("tot"),
        first(col("p")).as("p"))
    val nPairs = ids.count()
    val pProd = (1 to maxN).map(n => coalesce(col(s"${n}_p"), lit(0.0)))
      .reduce(_ * _)
    val geo = if (maxN == 1) pProd
      else if (maxN == 2) sqrt(pProd)
      else pow(pProd, lit(1.0 / maxN))
    val out = wide
      .crossJoin(cLen)
      .crossJoin(rLen)
      .select(
        (lit(nPairs).as("n_pairs") +:
          col("c_len") +: col("r_len") +:
          (1 to maxN).flatMap(n => Seq(
            coalesce(col(s"${n}_clip"), lit(0L)).as(s"clip_$n"),
            coalesce(col(s"${n}_tot"), lit(0L)).as(s"tot_$n"),
            round(coalesce(col(s"${n}_p"), lit(0.0)), 6).as(s"p_$n"))) :+
          round(when(col("c_len") >= col("r_len") || col("c_len") === 0L, 1.0)
            .otherwise(exp(lit(1.0) - col("r_len").cast(DoubleType) /
              col("c_len").cast(DoubleType))), 6).as("bp") :+
          round(when(col("c_len") >= col("r_len") || col("c_len") === 0L,
              lit(1.0)).otherwise(exp(lit(1.0) -
                col("r_len").cast(DoubleType) /
                col("c_len").cast(DoubleType))) * geo, 6).as("bleu")): _*)
    (out, ids)
  }

  /** Flesch–Kincaid readability per document — the classic
    * text-difficulty gate (a training mix skewed to one reading level
    * is a curation smell, and readability is a standard quality-score
    * feature). Deterministic heuristic surface, documented: words =
    * whitespace tokens; sentences = runs of [.!?] (min 1); syllables
    * per word = vowel-group count [aeiouy]+ (min 1). FK grade =
    * 0.39·w/s + 11.8·syl/w − 15.59; Flesch ease = 206.835 − 1.015·w/s
    * − 84.6·syl/w — fixed-shape IEEE on exact integer counts, 6dp.
    *
    * Scale shape: a PURE MAP — every count comes from per-row array
    * expressions, no shuffle at all; the 100 TB pass is a narrow scan.
    *
    * @return (doc_id, n_words, n_sentences, n_syllables, fk_grade,
    *         flesch_ease) */
  def readability(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = tokens(col(textCol))
    val w = size(toks).cast(LongType)
    val s = greatest(lit(1),
      size(regexp_extract_all(col(textCol), lit("[.!?]+"), lit(0))))
      .cast(LongType)
    val syl = aggregate(
      transform(toks, t => greatest(lit(1),
        size(regexp_extract_all(t, lit("[aeiouy]+"), lit(0)))).cast(LongType)),
      lit(0L), (acc, x) => acc + x)
    docs.select(col(idCol), w.as("n_words"), s.as("n_sentences"),
        syl.as("n_syllables"))
      .withColumn("fk_grade", round(when(col("n_words") === 0L, 0.0)
        .otherwise(lit(0.39) * col("n_words").cast(DoubleType) /
            col("n_sentences").cast(DoubleType) +
          lit(11.8) * col("n_syllables").cast(DoubleType) /
            col("n_words").cast(DoubleType) - lit(15.59)), 6))
      .withColumn("flesch_ease", round(when(col("n_words") === 0L, 0.0)
        .otherwise(lit(206.835) - lit(1.015) *
            col("n_words").cast(DoubleType) /
            col("n_sentences").cast(DoubleType) -
          lit(84.6) * col("n_syllables").cast(DoubleType) /
            col("n_words").cast(DoubleType)), 6))
  }

  /** Gunning fog, SMOG, and Coleman–Liau per document — the OTHER
    * three classic readability indices beside [[readability]]'s
    * Flesch–Kincaid pair; corpora graded by one index only inherit
    * its quirks (FK leans on syllables-per-word, Coleman–Liau on
    * characters — a curation gate should cross-check). Shared
    * deterministic heuristics with [[readability]] (words =
    * whitespace tokens, sentences = runs of [.!?], syllables =
    * [aeiouy]+ groups), plus: complex words = syllable count ≥ 3;
    * letters = [A-Za-z] characters. fog = 0.4·(w/s + 100·cw/w);
    * SMOG = 1.0430·√(cw·30/s) + 3.1291; CL = 0.0588·(100·L/w) −
    * 0.296·(100·s/w) − 15.8 — fixed-shape IEEE on exact integer
    * counts, 6dp; w = 0 reports all three as 0.
    *
    * Scale shape: a PURE MAP like [[readability]] — per-row array
    * expressions only, no shuffle; the 100 TB pass is a narrow scan.
    *
    * @return (doc_id, n_words, n_sentences, n_complex, n_letters,
    *         fog, smog, coleman_liau) */
  def readabilityExtended(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = tokens(col(textCol))
    val w = size(toks).cast(LongType)
    val s = greatest(lit(1),
      size(regexp_extract_all(col(textCol), lit("[.!?]+"), lit(0))))
      .cast(LongType)
    val cw = size(filter(toks, t =>
      size(regexp_extract_all(t, lit("[aeiouy]+"), lit(0))) >= 3))
      .cast(LongType)
    val letters = length(
      regexp_replace(col(textCol), "[^A-Za-z]", "")).cast(LongType)
    def d(c: Column) = c.cast(DoubleType)
    docs.select(col(idCol), w.as("n_words"), s.as("n_sentences"),
        cw.as("n_complex"), letters.as("n_letters"))
      .withColumn("fog", round(when(col("n_words") === 0L, 0.0)
        .otherwise(lit(0.4) * (d(col("n_words")) / d(col("n_sentences")) +
          lit(100.0) * d(col("n_complex")) / d(col("n_words")))), 6))
      .withColumn("smog", round(when(col("n_words") === 0L, 0.0)
        .otherwise(lit(1.0430) * sqrt(d(col("n_complex")) * lit(30.0) /
          d(col("n_sentences"))) + lit(3.1291)), 6))
      .withColumn("coleman_liau", round(when(col("n_words") === 0L, 0.0)
        .otherwise(lit(0.0588) * (lit(100.0) * d(col("n_letters")) /
            d(col("n_words"))) -
          lit(0.296) * (lit(100.0) * d(col("n_sentences")) /
            d(col("n_words"))) - lit(15.8)), 6))
  }

  /** RAKE keyphrase extraction (Rose et al. 2010, "Automatic Keyword
    * Extraction from Individual Documents"): candidate phrases are
    * maximal stopword-free token runs (boundaries = [[EnStop]]
    * members); corpus-wide word scores deg(w)/freq(w) where freq
    * counts occurrences inside candidates and deg sums the length of
    * the containing phrase per occurrence (co-occurrence incl. self);
    * a phrase scores the sum of its words' scores, and the top
    * `topPerDoc` phrases per document are kept.
    *
    * Exactness contract: word score is the integer micro floor
    * deg·10⁶ / freq (both non-negative longs, so Spark's truncating
    * long division and DuckDB's `//` agree); phrase score is an exact
    * long sum; ranking ties break (score desc, phrase asc, pid asc).
    *
    * Scale shape: one posexplode, per-doc windows (doc-bounded), ONE
    * corpus-wide word aggregation with map-side combine (vocab-sized
    * result), one equi-join of occurrences against word scores,
    * per-doc top-k window. No corpus-wide window, no collect.
    *
    * @return (doc_id, phrase, score_micro, rn) — rn in 1..topPerDoc */
  def rakeKeyphrases(docs: DataFrame, topPerDoc: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(idCol),
        posexplode(tokens(col(textCol))).as(Seq("pos", "w")))
      .withColumn("is_stop",
        col("w").isin(EnStop.map(x => lit(x)): _*))
    // phrase id = running stopword count; stopwords then drop out
    val occ = toks
      .withColumn("pid", sum(when(col("is_stop"), 1L).otherwise(0L))
        .over(Window.partitionBy(idCol).orderBy("pos")))
      .filter(!col("is_stop"))
      .withColumn("plen",
        count(lit(1)).over(Window.partitionBy(idCol, "pid")))
    // exact long floor-division (never a double intermediate — deg·10⁶
    // at corpus scale exceeds 2^53)
    val wordScore = occ.groupBy("w")
      .agg(expr("(sum(plen) * CAST(1000000 AS BIGINT)) div count(*)")
        .as("w_score"))
    val phrases = occ.join(wordScore, "w")
      .groupBy(col(idCol), col("pid"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("w")))),
          x => x.getField("w")), " ").as("phrase"),
        sum(col("w_score")).as("score_micro"))
    phrases
      .withColumn("rn", row_number().over(Window.partitionBy(idCol)
        .orderBy(col("score_micro").desc, col("phrase"), col("pid"))))
      .filter(col("rn") <= topPerDoc)
      .select(col(idCol), col("phrase"), col("score_micro"),
        col("rn").cast(IntegerType).as("rn"))
  }

  /** Yule's characteristic K per source — lexical REPETITIVENESS
    * that, unlike raw type/token ratios, is (approximately) sample-
    * size invariant: K = 10⁴·(Σ_f f²·V_f − N)/N² over the frequency-
    * of-frequencies (V_f = tokens occurring exactly f times). High K
    * = a small vocabulary worked hard (templates, boilerplate, spun
    * text); the corpus-level cousin of per-document
    * [[graft.ext.Curation.repetitionScore]], and the repetitiveness
    * complement of [[vocabRichness]]'s coverage estimators (same
    * count table, a different moment).
    *
    * Exactness: the token-count cells and both moments Σc² and Σc
    * are exact long sums (Σc² bounds: a single token repeated ~3·10⁹
    * times saturates; document corpora sit far below); K is one
    * fixed-shape IEEE expression, 6dp. A source with N < 1 token is
    * absent; N = tiny is reported as-is (the caller reads n_tokens).
    *
    * Scale shape: ONE (source, token-hash) count shuffle map-side
    * combined, then a source-keyed rollup — [[vocabRichness]]'s plan.
    *
    * @return (source, n_tokens, vocab, k) — k 6dp */
  def yulesK(docs: DataFrame, srcCol: String = "source",
      textCol: String = "text"): DataFrame = {
    val counts = docs.select(col(srcCol).as("source"),
        explode(tokens(col(textCol))).as("tok"))
      .select(col("source"),
        Dedup.portableHash60(concat(lit("yk|"), col("tok"))).as("h"))
      .groupBy("source", "h").agg(count(lit(1)).as("c"))
    def d(c: String) = col(c).cast(DoubleType)
    counts.groupBy("source").agg(
        sum(col("c")).as("n_tokens"), count(lit(1)).as("vocab"),
        sum(col("c") * col("c")).as("m2"))
      .select(col("source"), col("n_tokens"), col("vocab"),
        round(lit(10000.0) * (d("m2") - d("n_tokens")) /
          (d("n_tokens") * d("n_tokens")), 6).as("k"))
  }

  /** Gries' Deviation of Proportions (DP) for the corpus's top-K
    * terms — the term DISPERSION diagnostic frequency alone hides: a
    * term can be corpus-frequent because it is everywhere (DP ≈ 0,
    * a function word) or because ONE source spams it (DP → 1, a
    * boilerplate/template marker worth a cleaning rule).
    * DP(t) = Σ_sources |share-of-t-in-source − source-size-share| / 2.
    *
    * Exactness: all counts are exact longs; each source's absolute
    * deviation is rounded to a MICRO long pre-sum (sources-bounded
    * fold, order-free); DP is one division, 6dp. Terms travel as the
    * portable md5-60 hash so any engine replays identity.
    *
    * Scale shape: one (source, term-hash) count shuffle map-side
    * combined; the top-K selection is the bounded-heap
    * [[graft.expressions.TopKByScore]] aggregate (O(K) state per
    * partial, no corpus-wide sort); the deviation grid is K × sources
    * rows built from a broadcast semi-filter of the count table —
    * nothing corpus-proportional after the first shuffle. Sources
    * where a top term is ABSENT still contribute their size share
    * (the grid is dense by construction).
    *
    * @return (h, total, dp) — top-K terms by (count desc, hash asc) */
  def dpDispersion(docs: DataFrame, topK: Int = 20,
      srcCol: String = "source", textCol: String = "text"): DataFrame = {
    val base = docs
      .select(col(srcCol).as("source"), explode(tokens(col(textCol))).as("tok"))
      .select(col("source"),
        Dedup.portableHash60(concat(lit("dp|"), col("tok"))).as("h"))
      .groupBy("source", "h").agg(count(lit(1)).as("c"))
      .localCheckpoint() // feeds source sizes, term totals, the grid
    val srcTot = base.groupBy("source").agg(sum(col("c")).as("s_n"))
    val top = base.groupBy("h").agg(sum(col("c")).as("t"))
      .agg(graft.expressions.TopKByScore.topK(
        col("t").cast(DoubleType), col("h"), col("t"), topK).as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.id").as("h"), col("e.payload").as("total"))
    val cand = base.join(broadcast(top.select("h")), Seq("h"), "left_semi")
    def d(c: String) = col(c).cast(DoubleType)
    val grid = top.crossJoin(srcTot)
      .crossJoin(broadcast(srcTot.agg(sum(col("s_n")).as("n_corpus"))))
      .join(cand, Seq("source", "h"), "left")
      .select(col("h"), col("total"),
        round(abs(coalesce(d("c"), lit(0.0)) / d("total") -
          d("s_n") / d("n_corpus")) * 1e6, 0).cast(LongType).as("dev_micro"))
    val out = grid.groupBy("h").agg(max(col("total")).as("total"),
        sum(col("dev_micro")).as("dev"))
      .select(col("h"), col("total"),
        round(col("dev").cast(DoubleType) / 2e6, 6).as("dp"))
      .localCheckpoint()
    graft.ext.Checkpoints.release(base)
    out
  }
}
