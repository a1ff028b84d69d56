package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** SparkEntry wiring for the LLM-pipeline extension operators over
  * documents/embeddings. Thresholds are tuned to the synthetic corpus
  * (no true near-dups exist in it — max observed jaccard 0.037 and
  * cosine 0.443 at sf0.01) so results stay non-empty; the operators
  * themselves take arbitrary thresholds.
  */
object ExtQueries {

  def qTextStats(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.withStats(Tables(spark, dir).documents)
      .select("doc_id", "n_tokens", "n_bpe_tokens", "n_punct", "n_stopwords",
        "quality_score", "fingerprint")

  def qTextLangId(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.withLangId(Tables(spark, dir).documents)
      .select("doc_id", "en_hits", "es_hits", "fr_hits", "de_hits", "lang_pred")

  /** PII redaction over documents with deterministic synthetic PII
    * planted (every 3rd doc gets an email, every 5th a phone) so the
    * masking paths actually execute. */
  def qTextRedact(spark: SparkSession, dir: String): DataFrame = {
    val planted = Tables(spark, dir).documents.select(col("doc_id"),
      concat(col("text"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" contact user"), col("doc_id"), lit("@example.com")))
          .otherwise(lit("")),
        when(col("doc_id") % 5 === 0,
          concat(lit(" call 555-"), lpad((col("doc_id") % 1000).cast("string"), 3, "0"),
            lit("-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise(lit(""))).as("text"))
    TextAnalysis.redact(planted)
      .select("doc_id", "n_emails", "n_phones", "redacted")
  }

  /** Typed PII extraction report over the same planted corpus as
    * [[qTextRedact]] — emails/phones as sorted arrays, hits only. */
  def qPiiExtract(spark: SparkSession, dir: String): DataFrame = {
    val planted = Tables(spark, dir).documents.select(col("doc_id"),
      concat(col("text"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" contact user"), col("doc_id"), lit("@example.com")))
          .otherwise(lit("")),
        when(col("doc_id") % 5 === 0,
          concat(lit(" call 555-"), lpad((col("doc_id") % 1000).cast("string"), 3, "0"),
            lit("-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise(lit(""))).as("text"))
    TextAnalysis.piiExtract(planted)
      .select(col("doc_id"), concat_ws(",", col("emails")).as("emails"),
        concat_ws(",", col("phones")).as("phones"),
        col("n_emails"), col("n_phones"))
  }

  def qDedupExact(spark: SparkSession, dir: String): DataFrame =
    Dedup.exactGroups(Tables(spark, dir).documents)

  def qDedupNgramJaccard(spark: SparkSession, dir: String): DataFrame =
    Dedup.jaccardPairs(Tables(spark, dir).documents, threshold = 0.02, idMod = 5)

  def qDedupMinhashSig(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashSignatures(Tables(spark, dir).documents, numHashes = 8)

  // shared engine/oracle constants (the hurstWindows discipline):
  // 8-token turns, trigram-Jaccard threshold over turn runs
  private[ext] val convTurnTokens: Int = 8
  private[ext] val convThreshold: Double = 0.3

  /** Sequence-level (conversation-shaped) near-dup pairs: docs
    * re-expressed as ordered turn-hash text, then the df-capped
    * trigram-Jaccard join runs at the TURN level — pairs score only
    * on shared ordered 3-turn runs. */
  def qConvNearDups(spark: SparkSession, dir: String): DataFrame =
    Dedup.conversationNearDups(Tables(spark, dir).documents,
      threshold = convThreshold, turnTokens = convTurnTokens)

  // 4-token turns; planted prefixes snapped to a turn boundary so a
  // true sequence-prefix copy scores containment 1.0
  private[ext] val convContainTurn: Int = 4

  /** Sequence-level containment: plant turn-aligned prefix copies
    * (2/5 of each 7th doc's tokens, snapped to the turn size), then
    * [[graft.ext.Dedup.containmentJoin]] over the turn-hash text —
    * "is this conversation a prefix/sub-sequence of another?" via
    * the rarest-first prefix filter, unchanged. */
  def qConvContainment(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents.select(col("doc_id"), col("text"))
    val tt = convContainTurn
    val plant = d.filter(col("doc_id") % 7 === 0)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .select((col("doc_id") + lit(1000000L)).as("doc_id"), expr(
        s"array_join(slice(toks, 1, " +
          s"greatest(((size(toks) * 2) div 5 div $tt) * $tt, ${2 * tt})), ' ')")
        .as("text"))
    Dedup.containmentJoin(
      Dedup.turnText(d.unionAll(plant), turnTokens = tt), threshold = 0.9)
  }

  // budget below the sf0.01 corpus total (27,165 tokens) so the
  // waterfill saturates the small sources and redistributes
  private[ext] val tokenBudget: Long = 26000L
  private[ext] val tokenBudgetAlpha: Double = 0.5

  /** Per-source token-budget waterfill at the sqrt temperature. */
  def qTokenBudget(spark: SparkSession, dir: String): DataFrame =
    Curation.tokenBudgetAllocate(Tables(spark, dir).documents,
      budgetTokens = tokenBudget, alpha = tokenBudgetAlpha)

  /** The allocation APPLIED as a deterministic per-source doc
    * sample — kept token mass ≈ each source's allocation. */
  def qTokenBudgetSample(spark: SparkSession, dir: String): DataFrame =
    Curation.tokenBudgetSample(Tables(spark, dir).documents,
      budgetTokens = tokenBudget, alpha = tokenBudgetAlpha)

  /** Within-conversation turn repetition (degenerate-generation /
    * agent-loop detector): turn counts, distinct turns, longest
    * identical-turn run, repeat fraction. */
  def qTurnRepetition(spark: SparkSession, dir: String): DataFrame =
    Dedup.turnRepetition(Tables(spark, dir).documents,
      turnTokens = convTurnTokens)

  /** Role-aware conversation structure lints
    * ([[graft.ext.Dedup.conversationStructure]]) over transcripts
    * synthesized DETERMINISTICALLY from the documents table (the
    * corpus has no chat markup, so the query manufactures it the
    * way the containment query plants prefixes): each doc's tokens
    * chunk into 8-token turns; roles alternate user/assistant with
    * a doc_id-parity phase, doc_id%3 docs open with a system turn,
    * doc_id%5 docs force a same-role repeat at turn 2 (alternation
    * violations), doc_id%7 docs blank turn 1's content (empty
    * turns), doc_id%4 docs demote line 3 to an unmarked
    * continuation, and odd docs end with terminal punctuation (so
    * truncated_last splits the corpus). Every defect class the
    * operator reports is therefore populated at every SF, and the
    * oracle recomputes the expected structure independently of the
    * parser. */
  def qConvStructure(spark: SparkSession, dir: String): DataFrame = {
    val transcripts = Tables(spark, dir).documents
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .selectExpr("doc_id", "toks",
        "CAST((size(toks) + 7) div 8 AS INT) AS nch")
      .selectExpr("doc_id",
        """CASE WHEN nch = 0 THEN '' ELSE array_join(
          |  transform(sequence(0, nch - 1), i -> CASE
          |    WHEN doc_id % 4 = 0 AND i = 3 THEN
          |      array_join(slice(toks, i * 8 + 1, 8), ' ')
          |    ELSE concat(
          |      CASE WHEN i = 0 AND doc_id % 3 = 0 THEN 'system'
          |           WHEN doc_id % 5 = 0 AND i = 2 THEN 'user'
          |           WHEN (i + doc_id) % 2 = 0 THEN 'user'
          |           ELSE 'assistant' END,
          |      ': ',
          |      concat(
          |        CASE WHEN doc_id % 7 = 0 AND i = 1 THEN ''
          |             ELSE array_join(slice(toks, i * 8 + 1, 8), ' ')
          |             END,
          |        CASE WHEN i = nch - 1 AND doc_id % 2 = 1 THEN '.'
          |             ELSE '' END))
          |    END),
          |  '\n') END AS text""".stripMargin)
    Dedup.conversationStructure(transcripts)
  }

  /** Structured-output lint over synthesized AGENT transcripts: the
    * documents table's tokens are folded into deterministic
    * user/assistant chat with fenced code blocks (valid json,
    * invalid json, python), inline JSON lines (valid and broken),
    * fences inside USER turns (which must NOT count), and a
    * trailing unclosed ```json block on every 7th document — so
    * every defect class the linter reports populates at every SF.
    * The oracle never parses: it derives each count from the same
    * chunk arithmetic BY CONSTRUCTION, so the engine's fold +
    * strict-JSON validation is what is actually under test. */
  def qStructLint(spark: SparkSession, dir: String): DataFrame = {
    val transcripts = Tables(spark, dir).documents
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .selectExpr("doc_id", "toks",
        "CAST((size(toks) + 7) div 8 AS INT) AS nch")
      .selectExpr("doc_id",
        """CASE WHEN nch = 0 THEN '' ELSE concat(array_join(
          |  flatten(transform(sequence(0, nch - 1), i ->
          |    CASE
          |    WHEN (i + doc_id) % 2 = 0 THEN
          |      CASE WHEN doc_id % 3 = 0 AND i = 0 THEN array(
          |          'user: see', '```python',
          |          concat('print(', regexp_replace(
          |            element_at(toks, i * 8 + 1), '[^a-z0-9]', ''),
          |            ')'), '```')
          |        ELSE array(concat('user: ',
          |          array_join(slice(toks, i * 8 + 1, 8), ' ')))
          |        END
          |    WHEN (doc_id + i) % 5 = 0 THEN array(
          |      'assistant: result', '```json',
          |      concat('{"k": "', regexp_replace(
          |        element_at(toks, i * 8 + 1), '[^a-z0-9]', ''),
          |        '"}'), '```')
          |    WHEN (doc_id + i) % 5 = 1 THEN array(
          |      'assistant: result', '```json',
          |      concat('{"k": x', regexp_replace(
          |        element_at(toks, i * 8 + 1), '[^a-z0-9]', ''),
          |        '}'), '```')
          |    WHEN (doc_id + i) % 5 = 2 THEN array(
          |      'assistant: code', '```python',
          |      concat('print("', regexp_replace(
          |        element_at(toks, i * 8 + 1), '[^a-z0-9]', ''),
          |        '")'), '```')
          |    WHEN (doc_id + i) % 5 = 3 AND doc_id % 2 = 0 THEN array(
          |      'assistant: data', concat('{"v": ', i, '}'))
          |    WHEN (doc_id + i) % 5 = 3 THEN array(
          |      'assistant: data', '{broken}')
          |    ELSE array(concat('assistant: ',
          |      array_join(slice(toks, i * 8 + 1, 8), ' ')))
          |    END)), '\n'),
          |  CASE WHEN doc_id % 7 = 0 THEN concat('\n',
          |    array_join(array('assistant: tail', '```json',
          |      '{"partial":'), '\n')) ELSE '' END)
          |END AS text""".stripMargin)
    Dedup.structuredOutputLint(transcripts)
  }

  /** LSH candidates over the minhash signatures — pure operator
    * output (the portable-md5 minhash makes the candidate set itself
    * oracle-checkable; non-emptiness at the verified SFs is a property
    * of the corpus, asserted by the oracle's identical row count). */
  def qDedupLshCandidates(spark: SparkSession, dir: String): DataFrame = {
    val sigs = Dedup.minhashSignatures(Tables(spark, dir).documents, numHashes = 8)
    Dedup.lshCandidates(sigs, numHashes = 8, rowsPerBand = 2)
  }

  /** LSH candidates with the hot-bucket cap FORCED LOW (bucketCap=2,
    * under the corpus's largest real bucket) so the cap semantics —
    * keep the 2 lowest ids per band bucket, pair only among keepers —
    * are themselves oracle-verified cross-engine, not just
    * spec-tested. The production default (1000) is a no-op at these
    * SFs; this query proves the guard computes the DETERMINISTIC
    * subset the DuckDB replay derives with a per-bucket row_number. */
  def qDedupLshCapped(spark: SparkSession, dir: String): DataFrame = {
    val sigs = Dedup.minhashSignatures(Tables(spark, dir).documents, numHashes = 8)
    Dedup.lshCandidates(sigs, numHashes = 8, rowsPerBand = 2, bucketCap = 2)
  }

  /** LSH candidates verified with exact Jaccard — the production
    * near-dup pipeline shape (oracle-verified end to end: md5 minhash
    * → banding → candidate join → shingle intersection). */
  def qDedupLshVerified(spark: SparkSession, dir: String): DataFrame =
    Dedup.lshVerifiedPairs(Tables(spark, dir).documents, numHashes = 8, rowsPerBand = 2)

  /** Near-dup clusters: connected components over the LSH candidate
    * graph; component id = min doc_id reachable (the keeper). */
  def qDedupClusters(spark: SparkSession, dir: String): DataFrame = {
    val sigs = Dedup.minhashSignatures(Tables(spark, dir).documents, numHashes = 8)
    val cand = Dedup.lshCandidates(sigs, numHashes = 8, rowsPerBand = 2)
    Dedup.connectedComponents(cand)
  }

  /** Leakage-safe split over the LSH near-dup clusters: every
    * candidate-connected cluster lands whole in one of train/val/test
    * ([[Curation.leakageSafeSplit]] over [[qDedupClusters]]'s graph). */
  def qLeakageSplit(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    val cand = Dedup.lshCandidates(
      Dedup.minhashSignatures(docs, numHashes = 8),
      numHashes = 8, rowsPerBand = 2)
    Curation.leakageSafeSplit(docs, cand)
  }

  /** Quality-aware keeper selection over the LSH near-dup clusters:
    * same candidate graph as q_dedup_clusters, but the keeper is the
    * best-quality doc per component, not the min id. */
  def qDedupKeepBest(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    val cand = Dedup.lshCandidates(
      Dedup.minhashSignatures(docs, numHashes = 8),
      numHashes = 8, rowsPerBand = 2)
    Dedup.dedupKeepBest(docs, cand)
  }

  /** Boilerplate text planted on every 10th doc (5 rotating variants)
    * so the CDC shared-chunk path actually fires: the variants' shared
    * interior chunks surface as multi-doc fingerprints even though
    * every host document has a different-length prefix — exactly the
    * partial-overlap case whole-document dedup misses. */
  private[ext] val cdcBoiler = ": this document is provided as is without " +
    "warranty of any kind express or implied including fitness for a " +
    "particular purpose. this notice must be preserved in all copies " +
    "of the document. "

  /** CDC chunk fingerprints shared across documents (n_docs ≥ 2). */
  def qDedupCdc(spark: SparkSession, dir: String): DataFrame = {
    val planted = Tables(spark, dir).documents.select(col("doc_id"),
      concat(col("text"),
        when(col("doc_id") % 10 === 0,
          concat(lit(" license "), (col("doc_id") % 5).cast("string"),
            lit(cdcBoiler))).otherwise(lit(""))).as("text"))
    Dedup.cdcChunks(planted, boundaryMod = 8)
      .groupBy(col("chunk_hash"))
      .agg(countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") >= 2)
  }

  def qDedupSimhash(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhash64(Tables(spark, dir).documents,
      tokenHash = t => Dedup.portableHash60(concat(lit("sh|"), t)))

  /** SimHash banded near-dup pairs at Hamming radius 3 (portable
    * token hash so the oracle replays signatures and bands exactly). */
  def qSimhashNearDups(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhashNearDups(Tables(spark, dir).documents,
      tokenHash = t => Dedup.portableHash60(concat(lit("sh|"), t)))

  def qSimCosineTopK(spark: SparkSession, dir: String): DataFrame =
    Similarity.bruteForceTopK(Tables(spark, dir).embeddings, k = 10, numQueries = 5)

  /** Shared (nTokens, tokenDim) grid for the MaxSim query AND its
    * oracle generator — one source of truth, so the two can't
    * desynchronize (the q_random_walks constant-coupling lesson). */
  val maxsimTokens = 8
  val maxsimTokenDim = 8

  /** ColBERT-style MaxSim late interaction: the 64-dim stored vector
    * read as 8×8-dim token sub-vectors, score = Σ_i max_j cos. */
  def qMaxsimTopk(spark: SparkSession, dir: String): DataFrame =
    Similarity.maxSimTopK(Tables(spark, dir).embeddings, k = 10,
      numQueries = 5, nTokens = maxsimTokens, tokenDim = maxsimTokenDim)

  /** MM rounds for Bradley–Terry — shared by query and oracle
    * generator. */
  val btIters = 3

  /** Per-source hashed-unigram drift (KL / Jensen–Shannon) vs the
    * whole-corpus mixture — corpus-governance for re-crawled data. */
  def qCorpusDrift(spark: SparkSession, dir: String): DataFrame =
    Curation.corpusDrift(Tables(spark, dir).documents, buckets = 256)

  /** Reliability diagram + ECE/MCE/Brier of an English-ness
    * probability (capped stopword-hit score) against a crude
    * contains-' the ' label — the calibration QA every score-gated
    * corpus filter needs. */
  def qEvalCalibration(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    val hits = size(filter(toks,
      t => t.isin(TextAnalysis.EnStop.map(x => lit(x)): _*)))
    val preds = Tables(spark, dir).documents.select(
      least(lit(1000000L), hits.cast("long") * 125000L).as("p_micro"),
      when(lower(col("text")).like("% the %"), 1L).otherwise(0L).as("y"))
    Evaluation.calibration(preds, bins = 10)
  }

  /** Murphy decomposition of [[qEvalCalibration]]'s Brier score —
    * the same stopword-score forecaster split into miscalibration,
    * discrimination, and the base-rate floor. */
  def qBrierDecomp(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    val hits = size(filter(toks,
      t => t.isin(TextAnalysis.EnStop.map(x => lit(x)): _*)))
    val preds = Tables(spark, dir).documents.select(
      least(lit(1000000L), hits.cast("long") * 125000L).as("p_micro"),
      when(lower(col("text")).like("% the %"), 1L).otherwise(0L).as("y"))
    Evaluation.brierDecomposition(preds, bins = 10)
  }

  /** Cohen's κ per source between two language annotators: the
    * stopword-hit lang-id rule vs a contains-' the ' rule. */
  def qCohenKappa(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    def cnt(words: Seq[String]) =
      size(filter(toks, t => t.isin(words.map(x => lit(x)): _*)))
    val labels = Tables(spark, dir).documents.select(
      col("source").as("group"),
      when(cnt(TextAnalysis.EnStop) >= cnt(TextAnalysis.EsStop), "en")
        .otherwise("es").as("label_a"),
      when(lower(col("text")).like("% the %"), "en").otherwise("es")
        .as("label_b"))
    Evaluation.cohenKappa(labels)
  }

  /** ROC-AUC per language of the stopword-hit English-ness score
    * against the contains-' the ' label — does the score actually
    * rank English docs above the rest? (the threshold-free companion
    * of [[qEvalCalibration]]). */
  def qAucRoc(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    val hits = size(filter(toks,
      t => t.isin(TextAnalysis.EnStop.map(x => lit(x)): _*)))
    val preds = Tables(spark, dir).documents.select(
      col("lang").as("group"),
      least(lit(1000000L), hits.cast("long") * 125000L).as("score_micro"),
      when(lower(col("text")).like("% the %"), 1L).otherwise(0L).as("y"))
    Evaluation.aucRoc(preds)
  }

  /** Fleiss' κ per source across THREE language annotators — the
    * stopword-count rule, the contains-' the ' rule, and the corpus
    * lang tag — one rating row per (doc, rater). */
  def qFleissKappa(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    def cnt(words: Seq[String]) =
      size(filter(toks, t => t.isin(words.map(x => lit(x)): _*)))
    val d = Tables(spark, dir).documents
    def rater(c: org.apache.spark.sql.Column): DataFrame =
      d.select(col("source").as("group"), col("doc_id").as("item"), c.as("cat"))
    val ratings = rater(
        when(cnt(TextAnalysis.EnStop) >= cnt(TextAnalysis.EsStop), "en")
          .otherwise("es"))
      .unionAll(rater(
        when(lower(col("text")).like("% the %"), "en").otherwise("es")))
      .unionAll(rater(
        when(col("lang") === "en", "en").otherwise("es")))
    Evaluation.fleissKappa(ratings)
  }

  /** Krippendorff's α per source over the three language-rule raters
    * with PLANTED MISSING DATA (rater 2 skips doc_id % 3 == 1, rater 3
    * skips doc_id % 5 == 2) — the incomplete-panel agreement shape
    * Fleiss' κ cannot express; items left with one rating drop. */
  def qKrippendorffAlpha(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    def cnt(words: Seq[String]) =
      size(filter(toks, t => t.isin(words.map(x => lit(x)): _*)))
    val d = Tables(spark, dir).documents
    def rater(c: org.apache.spark.sql.Column): DataFrame =
      d.select(col("source").as("group"), col("doc_id").as("item"), c.as("cat"))
    val ratings = rater(
        when(cnt(TextAnalysis.EnStop) >= cnt(TextAnalysis.EsStop), "en")
          .otherwise("es"))
      .unionAll(rater(
        when(lower(col("text")).like("% the %"), "en").otherwise("es"))
        .filter(col("item") % 3 =!= 1))
      .unionAll(rater(
        when(col("lang") === "en", "en").otherwise("es"))
        .filter(col("item") % 5 =!= 2))
    Evaluation.krippendorffAlpha(ratings)
  }

  /** Two-sample KS drift per language between even- and odd-id docs'
    * English-ness scores — the null-hypothesis wiring of the
    * distribution-drift gate (same score as [[qAucRoc]]). */
  def qKsDrift(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    val hits = size(filter(toks,
      t => t.isin(TextAnalysis.EnStop.map(x => lit(x)): _*)))
    val scored = Tables(spark, dir).documents.select(
      col("doc_id"), col("lang").as("group"),
      least(lit(1000000L), hits.cast("long") * 125000L).as("v"))
    Evaluation.ksTest(
      scored.filter(col("doc_id") % 2 === 0).drop("doc_id"),
      scored.filter(col("doc_id") % 2 === 1).drop("doc_id"))
  }

  /** 1-D Wasserstein drift per language between even- and odd-id
    * docs' English-ness scores — the drift MAGNITUDE beside
    * [[qKsDrift]]'s max-gap shape, finished from the same
    * (grp, value) state. */
  def qWasserstein(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    val hits = size(filter(toks,
      t => t.isin(TextAnalysis.EnStop.map(x => lit(x)): _*)))
    val scored = Tables(spark, dir).documents.select(
      col("doc_id"), col("lang").as("group"),
      least(lit(1000000L), hits.cast("long") * 125000L).as("v"))
    Evaluation.wasserstein1(
      scored.filter(col("doc_id") % 2 === 0).drop("doc_id"),
      scored.filter(col("doc_id") % 2 === 1).drop("doc_id"))
  }

  /** Cramér–von Mises drift per language on the same even/odd
    * English-ness split — the squared-gap whole-curve test
    * completing the KS / W₁ trio off one state. */
  def qCramerVonMises(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    val hits = size(filter(toks,
      t => t.isin(TextAnalysis.EnStop.map(x => lit(x)): _*)))
    val scored = Tables(spark, dir).documents.select(
      col("doc_id"), col("lang").as("group"),
      least(lit(1000000L), hits.cast("long") * 125000L).as("v"))
    Evaluation.cramerVonMises(
      scored.filter(col("doc_id") % 2 === 0).drop("doc_id"),
      scored.filter(col("doc_id") % 2 === 1).drop("doc_id"))
  }

  /** Anderson–Darling drift per language on the same even/odd
    * English-ness split — the tail-weighted fourth finish completing
    * the KS / W₁ / CvM quartet off one state. */
  def qAndersonDarling(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    val hits = size(filter(toks,
      t => t.isin(TextAnalysis.EnStop.map(x => lit(x)): _*)))
    val scored = Tables(spark, dir).documents.select(
      col("doc_id"), col("lang").as("group"),
      least(lit(1000000L), hits.cast("long") * 125000L).as("v"))
    Evaluation.andersonDarling(
      scored.filter(col("doc_id") % 2 === 0).drop("doc_id"),
      scored.filter(col("doc_id") % 2 === 1).drop("doc_id"))
  }

  /** Hashing-trick featurization of order metadata into 64 sparse
    * signed-count buckets — the metadata→vector bridge (status,
    * priority, and customer-mod-sharded cohort as categoricals). */
  def qFeatureHash(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir).orders.select(
      col("o_orderkey").as("id"), col("o_orderstatus"),
      col("o_orderpriority"),
      (col("o_custkey") % 16).cast("string").as("cust_cohort"))
    Curation.featureHash(o,
      Seq("o_orderstatus", "o_orderpriority", "cust_cohort"), dim = 64)
  }

  /** Per-doc majority language across the three annotator rules of
    * [[qFleissKappa]] — the weak-supervision label each doc would
    * train with, plus confidence and tie flags. */
  def qLabelVote(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    def cnt(words: Seq[String]) =
      size(filter(toks, t => t.isin(words.map(x => lit(x)): _*)))
    val d = Tables(spark, dir).documents
    def rater(c: org.apache.spark.sql.Column): DataFrame =
      d.select(col("source").as("group"), col("doc_id").as("item"), c.as("cat"))
    val ratings = rater(
        when(cnt(TextAnalysis.EnStop) >= cnt(TextAnalysis.EsStop), "en")
          .otherwise("es"))
      .unionAll(rater(
        when(lower(col("text")).like("% the %"), "en").otherwise("es")))
      .unionAll(rater(
        when(col("lang") === "en", "en").otherwise("es")))
    Evaluation.labelVote(ratings)
  }

  /** Candidate period range shared by the periodogram query and its
    * oracle generator. */
  val periodogramMin = 2
  val periodogramMax = 14

  /** DFT power per candidate period over each event type's daily
    * volume — dominant-cycle detection for ingest monitoring. */
  def qPeriodogram(spark: SparkSession, dir: String): DataFrame =
    Timeseries.periodogram(Tables(spark, dir).events,
      minPeriod = periodogramMin, maxPeriod = periodogramMax)

  /** Pearson χ² + Cramér's V per source between the corpus lang tag
    * and the stopword-rule language call — is the rule's output
    * actually associated with the labeled language, and how strongly? */
  def qChiSquare(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    def cnt(words: Seq[String]) =
      size(filter(toks, t => t.isin(words.map(x => lit(x)): _*)))
    val labels = Tables(spark, dir).documents.select(
      col("source").as("group"),
      col("lang").as("label_a"),
      when(cnt(TextAnalysis.EnStop) >= cnt(TextAnalysis.EsStop), "en")
        .otherwise("es").as("label_b"))
    Evaluation.chiSquare(labels)
  }

  /** PSI per language between even- and odd-id docs' English-ness
    * scores — the binned model-monitoring twin of [[qKsDrift]]
    * (same score, same split, industry-standard statistic). */
  def qPsiDrift(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    val hits = size(filter(toks,
      t => t.isin(TextAnalysis.EnStop.map(x => lit(x)): _*)))
    val scored = Tables(spark, dir).documents.select(
      col("doc_id"), col("lang").as("group"),
      least(lit(1000000L), hits.cast("long") * 125000L).as("p_micro"))
    Evaluation.psi(
      scored.filter(col("doc_id") % 2 === 0).drop("doc_id"),
      scored.filter(col("doc_id") % 2 === 1).drop("doc_id"),
      bins = 10)
  }

  /** Corpus BLEU-2 of even docs (candidates) against their odd
    * successors (references) — the precision-oriented twin of
    * [[qRougeOverlap]] with brevity penalty, over the same pairing. */
  def qCorpusBleu(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    TextAnalysis.corpusBleu(
      d.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id").as("pair_id"), col("text")),
      d.filter(col("doc_id") % 2 === 1)
        .select((col("doc_id") - 1).as("pair_id"), col("text")),
      maxN = 2)
  }

  /** Disk-index twin of [[qContainment]]: history's df-capped shingle
    * postings persisted bucketed ([[graft.operators.ShingleIndex]]),
    * then a batch of planted prefix slices (contained — expect 1.0)
    * and token-reversed decoys (shingle-destroyed — expect absent)
    * probed against the written table. */
  def qContainmentIndexed(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    val path = System.getProperty("java.io.tmpdir") + "/graft_shingle_idx"
    ensureIndex(spark, "graft_shingle_idx", path, dir) {
      graft.operators.ShingleIndex.writeIndex(docs, "graft_shingle_idx", path)
    }
    val withToks = docs.withColumn("toks", TextAnalysis.tokens(col("text")))
    val slices = withToks.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        expr("array_join(slice(toks, 1, " +
          "greatest((size(toks) * 2) div 5, 5)), ' ')").as("text"))
    val decoys = withToks.filter(col("doc_id") % 11 === 3)
      .select((col("doc_id") + 2000000L).as("doc_id"),
        expr("array_join(reverse(toks), ' ')").as("text"))
    graft.operators.ShingleIndex.probe(spark, "graft_shingle_idx",
      slices.unionAll(decoys), threshold = 0.9)
  }

  /** dbt `relationships` audit of lineitem→orders with planted
    * orphans (every 1000th lineitem re-keyed past the order domain) —
    * real rows must produce zero violations, plants must surface
    * with their row counts. */
  def qFkAudit(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val planted = t.lineitem.select(
      when(col("l_orderkey") % 1000 === 0,
        col("l_orderkey") + 1000000000L).otherwise(col("l_orderkey"))
        .as("l_orderkey"))
    graft.model.DataChecks.relationships(
      planted, "l_orderkey", t.orders, "o_orderkey")
  }

  /** dbt source-freshness over the event stream per event type, with
    * a planted dead feed ("ghost") that must classify `error` with a
    * null max_loaded_at. */
  def qSourceFreshness(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
    val sources = ev.select(col("event_type").as("source")).distinct()
      .unionAll(spark.range(1).select(lit("ghost").as("source")))
    graft.model.DataChecks.sourceFreshness(
      ev.withColumnRenamed("event_type", "source"), sources,
      java.sql.Timestamp.valueOf("2024-03-01 00:00:00"),
      warnAfterS = 2505600L /* 29d */, errorAfterS = 2678400L /* 31d */)
  }

  /** Benford first-digit conformity of order amounts (exact cents)
    * per order priority — the fabricated-numbers / broken-ETL audit. */
  def qBenford(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir).orders.select(
      col("o_orderpriority").as("group"),
      round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
    Profiler.benford(o, "cents")
  }

  /** Zipf slope over each source's top-50 token frequencies — the
    * template-corpus detector next to vocab richness. */
  def qZipfSlope(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.zipfSlope(Tables(spark, dir).documents, topK = 50)

  /** Chao1 vocabulary richness + Good–Turing coverage per source. */
  def qVocabRichness(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.vocabRichness(Tables(spark, dir).documents)

  /** Min-count vocabulary pruning curve over the corpus (rank-free
    * tokenizer sizing). */
  def qVocabPruning(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.vocabPruningCurve(Tables(spark, dir).documents)

  /** Luhn-validated card screening over documents with planted
    * valid (doc_id%50=0) and checksum-failing (doc_id%50=25) runs —
    * only the Luhn-valid plant may quarantine. */
  def qLuhnScreen(spark: SparkSession, dir: String): DataFrame = {
    val planted = Tables(spark, dir).documents.select(col("doc_id"),
      when(col("doc_id") % 50 === 0,
          concat(col("text"), lit(" card 4111 1111 1111 1111 ok")))
        .when(col("doc_id") % 50 === 25,
          concat(col("text"), lit(" ref 4111111111111112 x")))
        .otherwise(col("text")).as("text"))
    TextAnalysis.luhnScreen(planted)
  }

  /** Reciprocal top-5 pairs over the vec_id%4 subset — the exact
    * mutual-kNN dedup-candidate rule (reciprocity filters hubness). */
  def qMutualKnn(spark: SparkSession, dir: String): DataFrame =
    Similarity.mutualKnn(
      Tables(spark, dir).embeddings.filter(col("vec_id") % 4 === 0), k = 5)

  /** Per-label centroid drift vs the corpus centroid — the dense
    * twin of q_corpus_drift over the embeddings table. */
  def qEmbedDrift(spark: SparkSession, dir: String): DataFrame =
    Similarity.embedDrift(Tables(spark, dir).embeddings)

  /** Holt double-exponential volume forecast per event type (level +
    * trend in milli-units, 3-day horizon). */
  def qHoltForecast(spark: SparkSession, dir: String): DataFrame =
    Timeseries.holtForecast(Tables(spark, dir).events)

  /** Holt–Winters additive weekly-seasonal forecast per event type —
    * the seasonal component [[qHoltForecast]] lacks. */
  def qHoltWinters(spark: SparkSession, dir: String): DataFrame =
    Timeseries.holtWintersForecast(Tables(spark, dir).events)

  /** Forecast backtest: last week held out, Holt–Winters fit on the
    * rest, MASE against the seasonal-naive repeat. */
  def qForecastBacktest(spark: SparkSession, dir: String): DataFrame =
    Timeseries.forecastBacktest(Tables(spark, dir).events)

  /** Window ladder for [[qHurst]] — ONE constant list feeds the
    * engine call and the DuckDB oracle's ln(w) VALUES table (the
    * randomWalks shared-constant discipline), sized to the ~30-day
    * event window the test data carries. */
  private[ext] val hurstWindows: Seq[Int] = Seq(4, 8, 16)

  /** Hurst exponent of the global daily series — long-memory
    * persistence beside [[qAcf]]'s fixed lags and [[qLjungBox]]'s
    * joint white-noise gate. */
  def qHurst(spark: SparkSession, dir: String): DataFrame =
    Timeseries.hurstRS(Tables(spark, dir).events, hurstWindows)

  /** Poisson-or-bursty per event type: VMR and Fisher's index of
    * dispersion over the daily counts — the distributional check
    * beside [[qDurbinWatson]]'s serial one. */
  def qDispersionTest(spark: SparkSession, dir: String): DataFrame =
    Timeseries.dispersionTest(Tables(spark, dir).events)

  /** Theil–Sen robust daily-volume trend per event type (median of
    * pairwise slopes; outage days cannot move it). */
  def qTheilSen(spark: SparkSession, dir: String): DataFrame =
    Timeseries.theilSen(Tables(spark, dir).events)

  /** Median/MAD modified z-score outlier days per event type (50%
    * breakdown — the spike cannot mask itself). */
  def qMadOutliers(spark: SparkSession, dir: String): DataFrame =
    Timeseries.madOutliers(Tables(spark, dir).events)

  /** Empirical LSH recall vs exact ground truth, per Jaccard decile —
    * the "measure, don't guess" query for the MinHash-banding family
    * (the dedup twin of q_ann_recall): ground-truth near-dup pairs
    * from the EXACT prefix-filtered join, probed against the banded
    * candidate set; per-bucket recall exposes the banding S-curve
    * (1−(1−s^r)^b) empirically, so a banding-parameter change that
    * silently drops mid-similarity pairs breaks the hash. */
  def qLshRecall(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    val exact = Dedup.prefixJaccardJoin(docs, threshold = 0.5)
    val cands = Dedup.lshCandidates(
        Dedup.minhashSignatures(docs, numHashes = 8),
        numHashes = 8, rowsPerBand = 2)
      .select(col("a_id"), col("b_id"), lit(1L).as("hit"))
    exact.join(cands, Seq("a_id", "b_id"), "left")
      .select(floor(col("jaccard") * 10).cast("long").as("j_bucket"),
        coalesce(col("hit"), lit(0L)).as("hit"))
      .groupBy("j_bucket")
      .agg(count(lit(1)).as("n_pairs"), sum(col("hit")).as("n_hit"))
      .select(col("j_bucket"), col("n_pairs"), col("n_hit"),
        round(col("n_hit").cast("double") / col("n_pairs").cast("double"), 6)
          .as("recall"))
  }

  /** ROUGE-2 of each even doc (candidate) against its odd successor
    * (reference) — the summarization-eval overlap metric as a
    * text-pair scoring operator. */
  def qRougeOverlap(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    TextAnalysis.rougeN(
      d.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id").as("pair_id"), col("text")),
      d.filter(col("doc_id") % 2 === 1)
        .select((col("doc_id") - 1).as("pair_id"), col("text")),
      n = 2)
  }

  /** Bradley–Terry strength ranking over part brands, with pairwise
    * duels synthesized from each order's first two lineitems (winner
    * = higher extended price; price ties and same-brand duels drop).
    * The RLHF preference-aggregation shape on relational data. */
  def qBradleyTerry(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val b1 = t.part.select(col("p_partkey").as("pk1"), col("p_brand").as("b1"))
    val b2 = t.part.select(col("p_partkey").as("pk2"), col("p_brand").as("b2"))
    val l1 = t.lineitem.filter(col("l_linenumber") === 1)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk1"),
        col("l_extendedprice").as("ep1"))
    val l2 = t.lineitem.filter(col("l_linenumber") === 2)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk2"),
        col("l_extendedprice").as("ep2"))
    val duels = l1.join(l2, "ok")
      .join(broadcast(b1), "pk1").join(broadcast(b2), "pk2")
      .filter(col("ep1") =!= col("ep2") && col("b1") =!= col("b2"))
      .select(
        when(col("ep1") > col("ep2"), col("b1")).otherwise(col("b2")).as("winner"),
        when(col("ep1") > col("ep2"), col("b2")).otherwise(col("b1")).as("loser"))
    Preferences.bradleyTerry(duels, iters = btIters)
  }

  /** IVF with the Lloyd k-means quantizer — oracle-verified: centroid
    * averaging accumulates integer micro-units, so the DuckDB oracle
    * replays both iterations (seeds → assign → update → probe → top-k)
    * bit-for-bit. */
  def qSimIvfTopK(spark: SparkSession, dir: String): DataFrame =
    Similarity.ivfTopK(Tables(spark, dir).embeddings, k = 10, numQueries = 5,
      nprobe = 2, nClusters = 8, kmeansIters = 2)

  /** Recall@10 of the IVF-probed search against exact brute force —
    * the "measure, don't guess" query for the ANN family: an index
    * whose recall is unmeasured is a liability, and because BOTH
    * paths are deterministic the recall itself is oracle-checkable. */
  def qAnnRecall(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir).embeddings
    val exact = Similarity.bruteForceTopK(emb, k = 10, numQueries = 5)
      .select("query_id", "nn_id")
    val ivf = Similarity.ivfTopK(emb, k = 10, numQueries = 5,
        nprobe = 2, nClusters = 8, kmeansIters = 2)
      .select(col("query_id"), col("nn_id").as("ivf_id"))
    exact.join(ivf,
        exact("query_id") === ivf("query_id") &&
          exact("nn_id") === ivf("ivf_id"), "left")
      .groupBy(exact("query_id"))
      .agg(count(col("ivf_id")).as("n_hits"))
      .select(col("query_id"), col("n_hits"),
        (col("n_hits") * 100000L).as("recall_micro"))
  }

  /** Retrieval-quality metrics (MRR / NDCG@10 / P@10, same-label
    * relevance) over the exact ranking — closes the ANN evaluation
    * loop next to [[qAnnRecall]]; integer-nano DCG makes every sum
    * order-free and oracle-replayable
    * ([[Similarity.rankingMetrics]]). */
  def qRankingMetrics(spark: SparkSession, dir: String): DataFrame =
    Similarity.rankingMetrics(Tables(spark, dir).embeddings,
      k = 10, numQueries = 5)

  /** Deterministic IVF (flat seeds, no Lloyd iterations) — the
    * simplest oracle-verifiable ANN scale path. */
  def qSimIvfFlat(spark: SparkSession, dir: String): DataFrame =
    Similarity.ivfFlatTopK(Tables(spark, dir).embeddings, k = 10, numQueries = 5,
      nprobe = 2, nClusters = 8)

  /** PQ codes: every embedding compressed to 8 4-bit codes (64×
    * smaller than the raw doubles) in one map-side pass. */
  def qEmbedPqCodes(spark: SparkSession, dir: String): DataFrame =
    Similarity.pqEncode(Tables(spark, dir).embeddings, m = 8, ks = 16)

  /** PQ ADC top-k: exact query against code-compressed corpus;
    * integer-micro subspace terms make the approximate score an exact
    * integer both engines replay. */
  def qSimPqTopK(spark: SparkSession, dir: String): DataFrame =
    Similarity.pqTopK(Tables(spark, dir).embeddings, k = 10, numQueries = 5,
      m = 8, ks = 16)

  /** IVF-PQ combined search: coarse routing + PQ-coded residuals,
    * integer-micro ADC scoring — the FAISS-style serving shape. */
  def qSimIvfPq(spark: SparkSession, dir: String): DataFrame =
    Similarity.ivfPqTopK(Tables(spark, dir).embeddings, k = 10,
      numQueries = 5, nprobe = 2, nClusters = 8, m = 8, ks = 16)

  def qSimNearDup(spark: SparkSession, dir: String): DataFrame =
    Similarity.cosineNearDupPairs(Tables(spark, dir).embeddings,
      threshold = 0.35, numPlanes = 16, rowsPerBand = 4)

  /** Semantic dedup end to end: embedding near-dup pairs (hyperplane
    * LSH + exact cosine verify) clustered with HashMin connected
    * components — "keep one vector per semantic cluster", the
    * embedding-space analog of the MinHash q_dedup_clusters chain.
    * Every stage shuffles keyed (band buckets, then node id); the
    * oracle replays the full composition, recursive CTE included. */
  def qSimClusters(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Similarity.cosineNearDupPairs(Tables(spark, dir).embeddings,
      threshold = 0.35, numPlanes = 16, rowsPerBand = 4)
    Dedup.connectedComponents(pairs)
  }

  def qRepetition(spark: SparkSession, dir: String): DataFrame =
    Curation.repetitionScore(Tables(spark, dir).documents)

  /** Tokenizer fertility (BPE-ish tokens per char) by language — the
    * context-budget planning metric of a multilingual mixture. */
  def qTokenFertility(spark: SparkSession, dir: String): DataFrame =
    Curation.tokenFertility(Tables(spark, dir).documents)

  /** Cross-document trigram novelty per doc (df==1 fraction) — the
    * corpus-level complement to q_repetition's within-doc gate. */
  def qNoveltyScore(spark: SparkSession, dir: String): DataFrame =
    Curation.noveltyScore(Tables(spark, dir).documents)

  /** Novelty AGAINST HISTORY through the on-disk shingle index (plus
    * its capped-hot companion, so the df cap cannot distort the
    * answer): the %4==0 batch's per-doc unseen-trigram fraction vs
    * the %4!=0 resident corpus — the nightly "how much is new"
    * measure of an ingest pipeline. */
  def qNoveltyIndexed(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    val path = System.getProperty("java.io.tmpdir") + "/graft_novelty_idx"
    ensureIndex(spark, "graft_novelty_idx", path, dir) {
      graft.operators.ShingleIndex.writeIndex(
        docs.filter(col("doc_id") % 4 =!= 0), "graft_novelty_idx", path)
    }
    graft.operators.ShingleIndex.noveltyProbe(spark, "graft_novelty_idx",
      docs.filter(col("doc_id") % 4 === 0))
  }

  def qHashSplit(spark: SparkSession, dir: String): DataFrame =
    Curation.hashSplit(Tables(spark, dir).documents)
      .select("doc_id", "split")

  def qStratifiedSample(spark: SparkSession, dir: String): DataFrame =
    Curation.stratifiedSample(Tables(spark, dir).documents, permille = 100)
      .select("doc_id", "lang", "source")

  /** Gopher/C4-style rule gate: per-doc metrics, per-rule flags,
    * conjunction keep — one narrow map-side pass. */
  def qGopherFilters(spark: SparkSession, dir: String): DataFrame =
    Curation.gopherRules(Tables(spark, dir).documents)
      .select("doc_id", "n_tokens", "mean_word_len", "alpha_ratio",
        "symbol_ratio", "n_stopwords", "r_wordcount", "r_meanlen",
        "r_alpha", "r_symbol", "r_stop", "keep")

  /** Deterministic mixture resampling toward a 2:1 even:odd source
    * weighting — per-source rates from one low-cardinality aggregate,
    * broadcast back, md5-coin acceptance. */
  def qDataMixture(spark: SparkSession, dir: String): DataFrame =
    Curation.mixtureSample(Tables(spark, dir).documents,
      weights = (0 until 20).map(i =>
        s"src$i" -> (if (i % 2 == 0) 2.0 else 1.0)).toMap)

  /** BM25 retrieval over the corpus for a fixed bag-of-words query. */
  def qBm25Topk(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.bm25TopK(Tables(spark, dir).documents,
      terms = Seq("spark", "data", "join"), k = 20)

  /** SemDeDup-shaped embedding dedup: cluster-blocked pairwise cosine,
    * keep the lowest id per duplicate neighborhood. */
  def qSemanticDedup(spark: SparkSession, dir: String): DataFrame =
    Similarity.semanticDedup(Tables(spark, dir).embeddings,
      nClusters = 8, threshold = 0.35)

  def qContamination(spark: SparkSession, dir: String): DataFrame =
    Curation.contamination(Tables(spark, dir).documents,
      benchMod = 97, minShared = 3)

  def qSourceQuality(spark: SparkSession, dir: String): DataFrame =
    Curation.sourceQuality(Tables(spark, dir).documents)

  def qUnigramLogprob(spark: SparkSession, dir: String): DataFrame =
    Curation.unigramLogProb(Tables(spark, dir).documents)

  def qVocabTopk(spark: SparkSession, dir: String): DataFrame =
    Curation.vocabTopK(Tables(spark, dir).documents, k = 100)

  /** The flagship composition — a complete training-data curation
    * pipeline: stats -> quality/length gate -> exact dedup (keep min
    * id per fingerprint) -> MinHash-LSH near-dup clustering (keep each
    * cluster's min id). Every stage reuses an individually
    * oracle-verified operator; the whole chain is itself verified
    * against a DuckDB replica. */
  def qCurationPipeline(spark: SparkSession, dir: String): DataFrame = {
    // the gated stats feed three consumers (keeper agg, keeper join,
    // LSH shingles) — materialize once (localCheckpoint, not cache: no
    // pinned blocks outlive the query in a long session)
    val st = TextAnalysis.withLangId(
        TextAnalysis.withStats(Tables(spark, dir).documents))
      .filter(col("n_tokens").between(15, 95) && col("quality_score") >= 0.4)
      .localCheckpoint()
    val keepers = st.groupBy(col("fingerprint"))
      .agg(min(col("doc_id")).as("keep_id"))
    val deduped = st.join(keepers,
      st("fingerprint") === keepers("fingerprint") &&
        st("doc_id") === keepers("keep_id")).localCheckpoint()
    val sigs = Dedup.minhashFromShingles(
      Dedup.wordTrigrams(deduped.select("doc_id", "text")), 8, "doc_id")
    val cc = Dedup.connectedComponents(Dedup.lshCandidates(sigs, 8, 2))
      .withColumnRenamed("node", "doc_id")
    deduped.join(cc, Seq("doc_id"), "left")
      .filter(col("component").isNull || col("component") === col("doc_id"))
      .select(col("doc_id"), col("lang_pred"), col("n_tokens"), col("quality_score"))
  }

  /** int8 embedding quantization (4× storage cut; per-vector scale). */
  def qEmbedQuantize(spark: SparkSession, dir: String): DataFrame =
    Similarity.quantizeInt8(Tables(spark, dir).embeddings)
      .select(col("vec_id"), round(col("scale"), 6).as("scale"),
        concat_ws(",", col("q").cast("array<string>")).as("q"))

  /** Approximate distinct counts / percentiles (HLL++, t-digest-style
    * quantile sketch) — the 100 TB cardinality tools. Sketch values
    * can't hash across engines, so the query emits the EXACT answers
    * (which the DuckDB oracle hash-checks) plus in-query booleans
    * asserting each estimate lands within its error bound — the
    * oracle expects every flag true, so a drifting sketch fails the
    * hash just like a wrong join would. Bounds: HLL++ default rsd is
    * 5% (1σ); 15% = 3σ. approx_percentile(accuracy=1000) is exact
    * whenever a group's value count is ≤ accuracy·10; 5% relative
    * slack covers bigger groups. */
  def qApproxAggs(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    Tables(spark, dir).lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_orderkey")).as("exact_orders"),
        countDistinct(col("l_partkey")).as("exact_parts"),
        approx_count_distinct(col("l_orderkey")).as("ao"),
        approx_count_distinct(col("l_partkey")).as("ap"),
        expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("p50a"),
        expr("percentile(l_extendedprice, 0.5)").as("p50e"))
      .select(col("l_returnflag"), col("exact_orders"), col("exact_parts"),
        (abs(col("ao") - col("exact_orders")).cast("double") /
          col("exact_orders") <= 0.15).as("ok_orders"),
        (abs(col("ap") - col("exact_parts")).cast("double") /
          col("exact_parts") <= 0.15).as("ok_parts"),
        (abs(col("p50a") - col("p50e")) / col("p50e") <= 0.05).as("ok_p50"))
  }

  /** One-pass per-column profiling of orders (schema-driven). */
  def qProfileOrders(spark: SparkSession, dir: String): DataFrame =
    Profiler.profile(Tables(spark, dir).orders)

  /** Pre-shuffle skew diagnostic on the order→customer key. */
  def qSkewReport(spark: SparkSession, dir: String): DataFrame =
    Profiler.skewReport(Tables(spark, dir).orders, "o_custkey")

  /** Multimodal plumbing: synth payloads -> batch decode (stubbed
    * codec) -> features. The stub derives metadata from the portable
    * md5-60 hash of the payload, so the binary mapPartitions pipeline
    * is hash-verified end to end against a DuckDB replay. */
  def qMultimodalMeta(spark: SparkSession, dir: String): DataFrame =
    Multimodal.extractFeatures(
      Multimodal.mediaFromDocuments(spark, Tables(spark, dir).documents)).toDF()

  /** Frame sampling explode (oracle-verified like the meta query). */
  def qMultimodalFrames(spark: SparkSession, dir: String): DataFrame =
    Multimodal.sampleFrames(
      Multimodal.extractFeatures(
        Multimodal.mediaFromDocuments(spark, Tables(spark, dir).documents)),
      stride = 2).toDF()

  /** Per-frame RMS/zero-crossing features over the REAL WAV corpus
    * rows — the VAD/energy-gating precursor (constant-amplitude
    * content lands exactly on |amp|·1000 with zcr 0, the oracle
    * contract; the spec exercises alternating-sign content). */
  def qAudioFrames(spark: SparkSession, dir: String): DataFrame =
    Multimodal.audioFrameFeatures(
      Multimodal.mediaFromDocuments(spark, Tables(spark, dir).documents),
      frameLen = 16).toDF()

  /** VAD gate over the WAV corpus frames: zero-amplitude clips
    * (doc_id % 100 ≡ 1 mod 3 with amp 0) must flag silent, everything
    * else is all-speech at this corpus's constant amplitudes. */
  def qVadGate(spark: SparkSession, dir: String): DataFrame =
    Multimodal.vadGate(
      Multimodal.audioFrameFeatures(
        Multimodal.mediaFromDocuments(spark, Tables(spark, dir).documents),
        frameLen = 16),
      rmsThresholdMilli = 1000L)

  /** Exposure/degenerate-image screen over the REAL pattern-PNG
    * corpus — decoded mean/min/max luma per image
    * ([[Multimodal.imageStats]]); the mosaic formulas make the
    * decoded statistics oracle-predictable. */
  def qImageStats(spark: SparkSession, dir: String): DataFrame =
    Multimodal.imageStats(
      Multimodal.patternImages(spark, Tables(spark, dir).documents))

  /** Image near-dup via difference perceptual hash: one block-mosaic
    * PNG per document (REAL container), REAL javax.imageio decode +
    * 9×8 average-pool into a 64-bit dHash, then the SimHash-style
    * 4×16 banded Hamming join (complete for distance ≤ 3, never
    * all-pairs). Within-family variants differ by hash-placed
    * perturbation blocks; the oracle recomputes the mosaics from the
    * shared md5-60 formulas and brute-forces Hamming — so a
    * hash-match proves encoder, decoder, pooling, banding, and
    * popcount all at once. */
  def qImageNearDup(spark: SparkSession, dir: String): DataFrame =
    Multimodal.nearDupImages(
      Multimodal.imageDHashes(
        Multimodal.patternImages(spark, Tables(spark, dir).documents)))

  /** Disk-index twin of [[qImageNearDup]] — the nightly image-ingest
    * shape: history's d-hash band rows persisted as a bucketed
    * external table ([[graft.operators.DHashIndex]]), a new batch
    * decoded and probed against it (history beats batch; pairwise
    * smaller-id rule within the batch). The oracle recomputes every
    * mosaic hash from the md5-60 formulas and classifies the batch
    * with the same (hamming, id) argmin. */
  def qImageDedupIndexed(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    val path = System.getProperty("java.io.tmpdir") + "/graft_dhash_idx"
    ensureIndex(spark, "graft_dhash_idx", path, dir) {
      graft.operators.DHashIndex.writeIndex(
        Multimodal.imageDHashes(Multimodal.patternImages(spark,
          docs.filter(col("doc_id") % 4 =!= 0))),
        "graft_dhash_idx", path)
    }
    graft.operators.DHashIndex.probe(spark, "graft_dhash_idx",
        Multimodal.imageDHashes(Multimodal.patternImages(spark,
          docs.filter(col("doc_id") % 4 === 0))))
      .select("media_id", "status", "dup_of", "hamming")
  }

  /** Disk-index NEAR-dup twin of [[qDedupIncremental]] — the text
    * analog of [[qImageDedupIndexed]]: history's (doc_id % 4 ≠ 0)
    * banded minhash rows persisted as a bucketed table
    * ([[graft.operators.MinHashBandIndex]]), the % 4 == 0 batch
    * probed against it and itself, matches scored by signature
    * agreement (≥ 3 of 8). */
  def qDedupNearIndexed(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    val path = System.getProperty("java.io.tmpdir") + "/graft_mhband_idx"
    ensureIndex(spark, "graft_mhband_idx", path, dir) {
      graft.operators.MinHashBandIndex.writeIndex(
        docs.filter(col("doc_id") % 4 =!= 0), "graft_mhband_idx", path)
    }
    graft.operators.MinHashBandIndex.probe(spark, "graft_mhband_idx",
      docs.filter(col("doc_id") % 4 === 0))
  }

  /** Concat-and-chunk sequence packing of the document corpus into
    * 512-token context windows across 8 hash shards (per-shard window
    * = no global serial pass; see [[Curation.packChunks]]). */
  def qPackChunks(spark: SparkSession, dir: String): DataFrame =
    Curation.packChunks(Tables(spark, dir).documents,
      contextLen = 512, nShards = 8)

  /** Z-order (Morton) codes over a 2-d key — the multi-dimensional
    * layout key [[graft.operators.ZOrder.writeZOrdered]] sorts by.
    * Pure codegen'd bit arithmetic, replayed bit-for-bit by the
    * DuckDB oracle. */
  def qZorderKey(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.ZOrder
    Tables(spark, dir).lineitem
      .filter(col("l_partkey") % 20 === 0)
      .select(col("l_orderkey"), col("l_linenumber"),
        ZOrder.zValue(pmod(col("l_partkey"), lit(65536)),
          pmod(col("l_orderkey"), lit(65536))).as("zv"))
  }

  /** Duplicate-passage removal with deterministic boilerplate planted
    * (every 4th doc gets a footer passage appended, every 7th a header
    * prepended) so the drop-and-reassemble paths actually execute on
    * the synthetic corpus — the operator itself is generic. */
  def qDedupPassage(spark: SparkSession, dir: String): DataFrame = {
    val footer = "subscribe to our newsletter for updates and follow us online"
    val header = "copyright notice all rights reserved do not reproduce this content"
    val planted = Tables(spark, dir).documents.select(col("doc_id"),
      concat(
        when(col("doc_id") % 7 === 0, lit(header + " ")).otherwise(lit("")),
        col("text"),
        when(col("doc_id") % 4 === 0, lit(" " + footer)).otherwise(lit("")))
        .as("text"))
    Dedup.passageDedup(planted, span = 10)
  }

  /** Line-level boilerplate removal: docs reflowed into 10-token
    * lines, a "subscribe" banner planted on every 3rd doc and a
    * rights footer on every 4th — those (plus any line the corpus's
    * planted near-dup chains repeat across ≥3 docs) must vanish from
    * every document, with the remaining lines reassembled in order. */
  private def plantedLineDocs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents.select(col("doc_id"),
      concat_ws("\n",
        when(col("doc_id") % 3 === 0, lit("subscribe to our newsletter")),
        regexp_replace(col("text"), "((?:\\S+ ){9}\\S+) ", "$1\n"),
        when(col("doc_id") % 4 === 0, lit("all rights reserved")))
        .as("text"))

  def qLineDedup(spark: SparkSession, dir: String): DataFrame =
    Dedup.lineDedup(plantedLineDocs(spark, dir), minDocs = 3)

  /** Disk-index twin of [[qLineDedup]]: the boilerplate census
    * persisted as a bucketed external table
    * ([[graft.operators.BoilerplateIndex]]) and probed — the nightly
    * shape where history's census cleans each new batch without
    * re-counting history. */
  def qLineDedupIndexed(spark: SparkSession, dir: String): DataFrame = {
    val planted = plantedLineDocs(spark, dir)
    val bpPath = System.getProperty("java.io.tmpdir") + "/graft_bp_idx"
    ensureIndex(spark, "graft_bp_idx", bpPath, dir) {
      graft.operators.BoilerplateIndex.writeIndex(
        planted, "graft_bp_idx", bpPath, minDocs = 3)
    }
    graft.operators.BoilerplateIndex.probe(spark, "graft_bp_idx", planted)
  }

  /** C4 line-quality cleaning: docs reflowed into 10-token lines;
    * even docs get every line terminally punctuated (survive unless
    * too short), odd docs none (every line drops); a lorem-ipsum
    * line planted on every 5th doc and a curly-brace config line on
    * every 7th must fall to their dedicated rules even when
    * punctuated. */
  def qC4Clean(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    val reflow = regexp_replace(col("text"), "((?:\\S+ ){9}\\S+) ", "$1\n")
    val punct = when(col("doc_id") % 2 === 0,
      concat(regexp_replace(reflow, "\n", ".\n"), lit("."))).otherwise(reflow)
    val planted = docs.select(col("doc_id"),
      concat_ws("\n",
        when(col("doc_id") % 5 === 0, lit("lorem ipsum dolor sit amet.")),
        punct,
        when(col("doc_id") % 7 === 0, lit("config { display none }")))
        .as("text"))
    Curation.c4Clean(planted)
  }

  /** Classifier-apply quality gate: a deterministic pseudo-trained
    * weight table (Knuth-hash micro weights in ±1e6 over 2^16
    * buckets) scores every doc's hashed bigrams; keep = mean weight
    * ≥ 0. */
  def qQualityClassify(spark: SparkSession, dir: String): DataFrame = {
    val dims = 1 << 16
    val weights = spark.range(dims).select(col("id").as("bucket"),
      ((col("id") * 2654435761L) % 2000001L - 1000000L).as("w_micro"))
    Curation.qualityClassify(Tables(spark, dir).documents, weights, dims)
  }

  /** Char-entropy quality signal over the raw corpus. */
  def qCharEntropy(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.charEntropy(Tables(spark, dir).documents)

  /** Incremental dedup of a new batch against the historical
    * fingerprint index: history = doc_id % 5 ≠ 4; the new batch is the
    * held-out docs plus simulated re-crawls of every 7th historical
    * doc (same text, new id) — those must flag `dup_history`. */
  def qDedupIncremental(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    val hist = docs.filter(col("doc_id") % 5 =!= 4)
    val index = hist
      .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fingerprint"))
      .groupBy("fingerprint").agg(min(col("doc_id")).as("keeper_id"))
    val newBatch = docs.filter(col("doc_id") % 5 === 4)
      .select(col("doc_id"), col("text"))
      .unionAll(hist.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    Dedup.dedupAgainstIndex(newBatch, index)
  }

  /** Build-once guard for the disk-index twins: writeIndex is the
    * one-time batch job of the nightly cycle, so the wrappers rebuild
    * only when the table is missing from the catalog or was built
    * from a different source dir (marker file in the index path).
    * Repeated invocations — bench warm reps, exactly the nightly
    * cadence — then time the PROBE, the recurring production cost. */
  private def ensureIndex(spark: SparkSession, table: String,
      path: String, dir: String)(build: => Unit): Unit = {
    val marker = java.nio.file.Paths.get(path, "_GRAFT_BUILT_FROM")
    val same = java.nio.file.Files.exists(marker) &&
      new String(java.nio.file.Files.readAllBytes(marker), "UTF-8") == dir
    if (!(same && spark.catalog.tableExists(table))) {
      build
      java.nio.file.Files.write(marker, dir.getBytes("UTF-8"))
    }
  }

  /** Disk-index twin of [[qDedupIncremental]]: history's fingerprint
    * map persisted as a bucketed external table
    * ([[graft.operators.FingerprintIndex]]), the same new batch
    * probed against the written table — identical answers, but the
    * corpus-sized side never re-shuffles (IOSpec plan-asserts). */
  def qDedupIndexed(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    val hist = docs.filter(col("doc_id") % 5 =!= 4)
    val fpPath = System.getProperty("java.io.tmpdir") + "/graft_fp_idx"
    ensureIndex(spark, "graft_fp_idx", fpPath, dir) {
      graft.operators.FingerprintIndex.writeIndex(hist, "graft_fp_idx", fpPath)
    }
    val newBatch = docs.filter(col("doc_id") % 5 === 4)
      .select(col("doc_id"), col("text"))
      .unionAll(hist.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    graft.operators.FingerprintIndex.probe(spark, "graft_fp_idx", newBatch)
  }

  /** Disk-index twin of [[qSimIvfTopK]]: the corpus written as a
    * cluster-partitioned parquet IVF index
    * ([[graft.operators.IvfIndex]]), then probed — same kmeans
    * parameters, so answers are identical to the in-memory IVF path
    * and the oracle replays the same arithmetic. The write is the
    * one-time nightly build (build-once guard as in [[qDedupIndexed]]);
    * repeated runs time the partition-pruned PROBE, the recurring
    * production cost. */
  def qIvfIndexed(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir).embeddings
    val path = System.getProperty("java.io.tmpdir") + "/graft_ivf_idx"
    // marker INSIDE the index directory (the ensureIndex discipline):
    // it dies with the index, so a cleaned-up directory always
    // triggers a rebuild rather than a probe of a missing path
    val marker = java.nio.file.Paths.get(path, "_GRAFT_BUILT_FROM")
    val same = java.nio.file.Files.exists(marker) &&
      new String(java.nio.file.Files.readAllBytes(marker), "UTF-8") == dir
    if (!same) {
      graft.operators.IvfIndex.writeIndex(emb, path, nClusters = 8, iters = 2)
      java.nio.file.Files.write(marker, dir.getBytes("UTF-8"))
    }
    graft.operators.IvfIndex.probeTopK(spark, path,
      emb.filter(col("vec_id") < 5), k = 10, nprobe = 2)
  }

  /** Index-maintenance path: build the IVF index from the resident 2/3
    * of the embeddings (vec_id % 3 ≠ 0), APPEND the remaining third
    * through [[graft.operators.IvfIndex.appendVectors]] (nearest
    * stored centroid, O(batch), no recluster), then probe — served
    * results must cover old AND new rows exactly as a replay that
    * assigns the appended batch against the same frozen centroids.
    * Build-then-append is deterministic, so the APPENDED index is
    * marker-reused across runs (a bare append on reuse would
    * duplicate the batch; the marker guards the whole build+append
    * unit instead). */
  def qIvfAppend(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir).embeddings
    val path = ensureIvfAppendIndex(spark, dir)
    graft.operators.IvfIndex.probeTopK(spark, path,
      emb.filter(col("vec_id") < 5), k = 10, nprobe = 2)
  }

  /** Build-or-reuse the build-then-append IVF index shared by
    * [[qIvfAppend]] and [[qIvfDrift]]: resident 2/3 (vec_id % 3 ≠ 0)
    * clustered at build time, the remaining third appended against
    * the frozen centroids. Marker-guarded as a unit (a bare re-append
    * would duplicate the batch). */
  private def ensureIvfAppendIndex(spark: SparkSession, dir: String): String = {
    val emb = Tables(spark, dir).embeddings
    val path = System.getProperty("java.io.tmpdir") + "/graft_ivf_append"
    val marker = java.nio.file.Paths.get(path, "_GRAFT_BUILT_FROM")
    val same = java.nio.file.Files.exists(marker) &&
      new String(java.nio.file.Files.readAllBytes(marker), "UTF-8") == dir
    if (!same) {
      val fs = org.apache.hadoop.fs.FileSystem.get(
        spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      fs.delete(new org.apache.hadoop.fs.Path(path + ".centroids"), true)
      graft.operators.IvfIndex.writeIndex(
        emb.filter(col("vec_id") % 3 =!= 0), path, nClusters = 8, iters = 2)
      graft.operators.IvfIndex.appendVectors(spark,
        emb.filter(col("vec_id") % 3 === 0), path)
      java.nio.file.Files.write(marker, dir.getBytes("UTF-8"))
    }
    path
  }

  /** Staleness report over the appended index of [[qIvfAppend]]:
    * per-cluster cosine between the frozen build-time centroid and
    * the CURRENT member mean (residents + the appended third), with
    * the re-cluster flag at the shared threshold. The oracle replays
    * the whole lifecycle — 2-iteration Lloyd on the resident subset,
    * frozen-centroid assignment of the appended batch, then the
    * micro-exact centroid-vs-mean cosine — so a hash match proves the
    * monitor measures exactly what the maintenance path produced. */
  def qIvfDrift(spark: SparkSession, dir: String): DataFrame = {
    val path = ensureIvfAppendIndex(spark, dir)
    graft.operators.IvfIndex.driftReport(spark, path,
      thresholdMicro = ivfDriftThresholdMicro)
  }

  /** Shared by [[qIvfDrift]] and its DuckDB oracle. Tuned so the
    * synthetic corpus exercises BOTH outcomes (the random embeddings
    * give centroid-vs-mean agreement around 0.95–0.97). */
  val ivfDriftThresholdMicro: Long = 960000L

  /** Power-iteration rounds for [[qPcaPower]] — shared with the
    * oracle generator (unrolled to the same depth). */
  val pcaRounds = 8

  /** Top principal component + explained-variance share of the
    * embedding table — the anisotropy/collapse diagnostic
    * ([[graft.ext.Similarity.pcaPower]]). */
  def qPcaPower(spark: SparkSession, dir: String): DataFrame =
    Similarity.pcaPower(Tables(spark, dir).embeddings, rounds = pcaRounds)

  /** Effective rank (participation ratio) of the embedding space —
    * the one-number isotropy diagnostic
    * ([[graft.ext.Similarity.effectiveRank]]). */
  def qEffectiveRank(spark: SparkSession, dir: String): DataFrame =
    Similarity.effectiveRank(Tables(spark, dir).embeddings)

  /** Nearest-centroid classification of the embeddings table: fit on
    * vec_id % 5 ≠ 0, classify the rest, confusion counts. */
  def qCentroidClassify(spark: SparkSession, dir: String): DataFrame =
    Similarity.centroidClassify(Tables(spark, dir).embeddings, trainMod = 5)

  /** Simplified silhouette of the embedding labels — per-class
    * cluster quality beside [[qCentroidClassify]]'s confusion matrix
    * and [[qEmbedOutliers]]'s per-point distances. */
  def qSilhouette(spark: SparkSession, dir: String): DataFrame =
    Similarity.silhouetteByLabel(Tables(spark, dir).embeddings)

  /** Prototypicality outliers: distance to own-label centroid in
    * integer micro space; threshold tuned so the synthetic corpus
    * splits (its labels are random, so distances are broad). */
  def qEmbedOutliers(spark: SparkSession, dir: String): DataFrame =
    Similarity.embedOutliers(Tables(spark, dir).embeddings,
      threshold = 1000000000000L)

  /** Per-source quota: top-15 docs per source by quality (the corpus
    * has 25 docs/source at sf0.01, so the cap binds at the verified
    * scale factors). */
  def qDomainCap(spark: SparkSession, dir: String): DataFrame =
    Curation.domainCap(Tables(spark, dir).documents, k = 15)

  /** Quality-weighted Bernoulli sample targeting ~30% of the corpus,
    * weighted by the [[TextAnalysis.withStats]] quality score. */
  def qWeightedSample(spark: SparkSession, dir: String): DataFrame =
    Curation.weightedSample(
      TextAnalysis.withStats(Tables(spark, dir).documents),
      targetFrac = 0.3)

  /** Corpus diff between a simulated previous snapshot (every 17th doc
    * absent = `added` now; every 11th doc carries a stale suffix =
    * `changed`; extra legacy rows = `removed`) and the current table. */
  def qCorpusDiff(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    val old = docs.filter(col("doc_id") % 17 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 11 === 0, concat(col("text"), lit(" legacy trailer")))
          .otherwise(col("text")).as("text"))
      .unionAll(docs.filter(col("doc_id") % 19 === 0)
        .select((col("doc_id") + 3000000L).as("doc_id"), col("text")))
    Dedup.corpusDiff(old, docs)
  }

  /** OOV rate of the held-out split against the top-50 train vocab. */
  def qOovRate(spark: SparkSession, dir: String): DataFrame =
    Curation.oovRate(Tables(spark, dir).documents, vocabSize = 50)

  /** Bigram-LM (add-one smoothed) mean NLL per document. */
  def qBigramLogprob(spark: SparkSession, dir: String): DataFrame =
    Curation.bigramLogProb(Tables(spark, dir).documents)

  /** Label-filtered exact ANN: top-10 among corpus rows with label in
    * {1,2,3} for each of the first 5 query vectors. */
  def qSimFilteredTopk(spark: SparkSession, dir: String): DataFrame =
    Similarity.filteredTopK(Tables(spark, dir).embeddings,
      col("label").isin(1, 2, 3), k = 10, numQueries = 5)

  /** Fixed-merge-table BPE application over the corpus. */
  def qBpeApply(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.bpeApply(Tables(spark, dir).documents)
      .select("doc_id", "n_bpe_symbols", "bpe_symbols")

  /** Per-source percentile calibration of the quality score. */
  def qScoreCalibrate(spark: SparkSession, dir: String): DataFrame =
    Curation.calibrateBySource(Tables(spark, dir).documents)

  /** Maximal duplicated token spans with a 12-token boilerplate run
    * planted on every 6th doc (so ≥8-token shared windows exist and
    * the island merge has multi-window spans to collapse). */
  def qDedupSpans(spark: SparkSession, dir: String): DataFrame = {
    val boiler = "all rights reserved unauthorized reproduction of this " +
      "material is strictly prohibited by law"
    val planted = Tables(spark, dir).documents.select(col("doc_id"),
      concat(col("text"),
        when(col("doc_id") % 6 === 0, lit(" " + boiler)).otherwise(lit("")))
        .as("text"))
    Dedup.duplicateSpans(planted, span = 8)
  }

  /** MOSS winnowing fingerprints (k=3-token grams, window w=4). */
  def qWinnowFingerprints(spark: SparkSession, dir: String): DataFrame =
    Dedup.winnowFingerprints(Tables(spark, dir).documents)

  /** Epoch-1 deterministic training shuffle into 8 shards (pinned so
    * the oracle replays shard assignment independent of session
    * parallelism). */
  def qEpochShuffle(spark: SparkSession, dir: String): DataFrame =
    Curation.epochShuffle(Tables(spark, dir).documents, epoch = 1,
      numShards = 8)

  /** Prefix-filtered exact Jaccard self-join at t = 0.5. */
  def qPrefixJaccard(spark: SparkSession, dir: String): DataFrame =
    Dedup.prefixJaccardJoin(Tables(spark, dir).documents)

  /** Directed containment at t = 0.9 with planted partial copies:
    * every 7th doc spawns a derived short doc (its first 40% of
    * tokens, id + 1e6) whose shingles are a strict subset of the
    * host's — the quote/partial-copy case symmetric Jaccard misses.
    * The token count is integer arithmetic ((n·2) div 5, floor 5) so
    * the oracle replants identically. */
  def qContainment(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    val planted = d.filter(col("doc_id") % 7 === 0)
      .withColumn("toks", TextAnalysis.tokens(col("text")))
      .select((col("doc_id") + 1000000L).as("doc_id"),
        expr("array_join(slice(toks, 1, " +
          "greatest((size(toks) * 2) div 5, 5)), ' ')").as("text"))
    Dedup.containmentJoin(
      d.select(col("doc_id"), col("text")).unionAll(planted),
      threshold = 0.9)
  }

  /** Learn the first 3 BPE merges from the corpus. */
  def qBpeTrain(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.bpeTrain(Tables(spark, dir).documents)

  /** 64-token chunks with 16-token overlap (RAG/embedding prep). */
  def qChunkOverlap(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.chunkWithOverlap(Tables(spark, dir).documents)

  /** Top-20 PMI collocations with a min-count-5 floor. */
  def qPmiCollocations(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.pmiCollocations(Tables(spark, dir).documents)

  /** Exact 5-NN majority-vote label prediction on the held-out split. */
  def qKnnClassify(spark: SparkSession, dir: String): DataFrame =
    Similarity.knnClassify(Tables(spark, dir).embeddings)

  /** Top-10 hard negatives (different-label near neighbors) for the
    * first 5 query vectors — contrastive-training mining. */
  def qHardNegatives(spark: SparkSession, dir: String): DataFrame =
    Similarity.hardNegatives(Tables(spark, dir).embeddings)

  /** Length-bucketed batch assignment (8 docs/batch, 4 shards —
    * pinned for oracle replay). */
  def qLengthBatches(spark: SparkSession, dir: String): DataFrame =
    Curation.lengthBucketBatches(Tables(spark, dir).documents,
      batchSize = 8, numShards = 4)

  /** √-temperature source rebalancing at targetFrac = 0.3. */
  def qTemperatureSample(spark: SparkSession, dir: String): DataFrame =
    Curation.temperatureSample(Tables(spark, dir).documents)

  /** Unicode NFC normalization over planted canonical-equivalence
    * cases: every 3rd doc gets a DECOMPOSED suffix (e + combining
    * acute), every 3rd+1 the precomposed form — the normalizer must
    * rewrite exactly the decomposed rows. */
  def qNfcNormalize(spark: SparkSession, dir: String): DataFrame = {
    import graft.expressions.NfcNormalize.nfc
    val marker = when(col("doc_id") % 3 === 0, lit(" cafe\u0301 decomposed"))
      .when(col("doc_id") % 3 === 1, lit(" caf\u00e9 composed"))
      .otherwise(lit(""))
    Tables(spark, dir).documents
      .select(col("doc_id"), concat(col("text"), marker).as("text"))
      .select(col("doc_id"), nfc(col("text")).as("nfc_text"),
        octet_length(col("text")).as("n_raw_bytes"),
        octet_length(nfc(col("text"))).as("n_nfc_bytes"),
        (nfc(col("text")) =!= col("text")).as("changed"))
  }

  /** Per-source exact-dedup governance report. The synthetic corpus
    * has no exact duplicates, so every 7th doc's text is replaced
    * with shared boilerplate — one cross-source duplicate family
    * whose non-keepers must show up in each source's dup count. */
  def qDedupReport(spark: SparkSession, dir: String): DataFrame = {
    val planted = Tables(spark, dir).documents
      .select(col("doc_id"), col("source"),
        when(col("doc_id") % 7 === 0,
          lit("common boilerplate page please enable javascript to continue"))
          .otherwise(col("text")).as("text"))
    Curation.dedupReport(planted)
  }

  /** Memorization audit: score every doc's 8-gram containment in a
    * reference = the doc_id % 5 == 0 slice (those docs score 1.0 by
    * construction; the planted near-dup chains give the rest
    * non-trivial partial overlap). */
  def qMemorization(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    Curation.memorizationScore(docs, docs.filter(col("doc_id") % 5 === 0))
  }

  /** Disk-index twin of [[qMemorization]]: the reference gram set
    * written as a bucketed external table
    * ([[graft.operators.MemorizationIndex]]) and probed — the 100 TB
    * shape where the training-set index is built once and every
    * candidate batch audits against it. */
  def qMemorizationIndexed(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    val memPath = System.getProperty("java.io.tmpdir") + "/graft_mem_idx"
    ensureIndex(spark, "graft_mem_idx", memPath, dir) {
      graft.operators.MemorizationIndex.writeIndex(
        docs.filter(col("doc_id") % 5 === 0), "graft_mem_idx", memPath)
    }
    graft.operators.MemorizationIndex.probe(spark, "graft_mem_idx", docs)
  }

  /** Fuzzy cross-corpus contamination: every 40th doc becomes a
    * lightly-edited "benchmark" copy (two extra leading tokens,
    * re-identified +100000) that exact n-gram membership would only
    * partially catch — the LSH cross join must find it. */
  def qCrossNearDups(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    val bench = docs.filter(col("doc_id") % 40 === 0)
      .select((col("doc_id") + 100000).as("doc_id"),
        concat(lit("eval prompt "), col("text")).as("text"))
    Dedup.crossNearDups(docs, bench)
  }

  /** Hybrid-retrieval RRF: fuse the BM25 top-20 lexical list with the
    * dense cosine top-20 of query vector 0 over the shared id space. */
  def qRrfFusion(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lex = TextAnalysis.bm25TopK(Tables(spark, dir).documents,
        terms = Seq("spark", "data", "join"), k = 20)
      .select(col("doc_id").as("item_id"), row_number().over(
        Window.orderBy(col("bm25").desc, col("doc_id"))).as("rank"))
    val dense = Similarity.bruteForceTopK(Tables(spark, dir).embeddings,
        k = 20, numQueries = 1)
      .select(col("nn_id").as("item_id"), col("rn").as("rank"))
    TextAnalysis.rrfFuse(Seq(lex, dense), topK = 10)
  }

  /** CCNet-style per-source head/middle/tail perplexity terciles. */
  def qPplBuckets(spark: SparkSession, dir: String): DataFrame =
    Curation.perplexityBuckets(Tables(spark, dir).documents)

  /** The histogram-CDF twin of [[qPplBuckets]]: cutoffs from 0.01-nat
    * NLL cells, zero-sort assignment. */
  def qPplBucketsApprox(spark: SparkSession, dir: String): DataFrame =
    Curation.perplexityBucketsApprox(Tables(spark, dir).documents)

  /** The threshold-filter twin of [[qDomainCap]]: per-source quality
    * threshold from value counts, boundary ties kept. */
  def qDomainCapApprox(spark: SparkSession, dir: String): DataFrame =
    Curation.domainCapApprox(Tables(spark, dir).documents, k = 15)

  /** DSIR importance resample: target = the src0–src3 slice of the
    * corpus, top-100 Gumbel-perturbed draw over 8192 hash buckets. */
  def qDsirSample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    Curation.dsirSample(docs,
      docs.filter(col("source").isin("src0", "src1", "src2", "src3")))
  }

  /** Co-purchase association rules over lineitem baskets: top-50 by
    * exact-integer lift, support floor 3. */
  def qAssocRules(spark: SparkSession, dir: String): DataFrame =
    Association.pairRules(Tables(spark, dir).lineitem,
      basketCol = "l_orderkey", itemCol = "l_partkey")

  /** Entity resolution with the Jaro–Winkler residual (micro-compared
    * threshold 0.9) — same variant families, similarity-based match. */
  def qEntityResolutionJw(spark: SparkSession, dir: String): DataFrame =
    EntityResolution.resolveJw(
      EntityResolution.customerVariants(Tables(spark, dir).customer))

  /** Native Jaro–Winkler over every within-block candidate pair of
    * the ER variant set — per-pair micro scores asserted against
    * DuckDB's built-in comparator. */
  def qJaroWinkler(spark: SparkSession, dir: String): DataFrame = {
    val n = EntityResolution
      .customerVariants(Tables(spark, dir).customer)
      .select(col("record_id"),
        regexp_replace(lower(trim(col("name"))), "[^a-z]", "").as("letters"),
        regexp_replace(lower(trim(col("name"))), "[^0-9]", "").as("digits"))
    val a = n.select(col("digits"), col("record_id").as("src"),
      col("letters").as("la"))
    val b = n.select(col("digits"), col("record_id").as("dst"),
      col("letters").as("lb"))
    a.join(b, Seq("digits"))
      .filter(col("src") < col("dst"))
      .select(col("src"), col("dst"),
        round(graft.expressions.JaroWinkler.jw(col("la"), col("lb")) * 1e6, 0)
          .cast("long").as("jw_micro"))
  }

  /** Sorted-neighborhood entity resolution over the variant set PLUS
    * keyless families (empty digit strings) that strong-key blocking
    * cannot link — each keyless twin pair must resolve together. */
  def qEntityResolutionSn(spark: SparkSession, dir: String): DataFrame =
    EntityResolution.resolveSortedNeighborhood(
      EntityResolution.customerVariantsKeyless(Tables(spark, dir).customer))

  /** Negative-sampling draw: 20 tokens ∝ count^(3/4) via the
    * double-sqrt weight and md5-Gumbel top-k. */
  def qNegSampling(spark: SparkSession, dir: String): DataFrame =
    Curation.negSamplingDraw(Tables(spark, dir).documents)

  /** Bloom-filter screening: train-split bigrams build a 3×4096
    * filter; the bench split's bigrams plus 200 planted-absent keys
    * probe it. Summary proves the one-sided contract: every true
    * member flagged, false positives only among absents. */
  def qBloomProbe(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    def bigrams(df: DataFrame): DataFrame = df
      .select(TextAnalysis.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(explode(expr(
        TextAnalysis.adjacentPairsExpr("toks", "w1", "w2"))).as("b"))
      .select(concat(col("b.w1"), lit(" "), col("b.w2")).as("key"))
    val trainKeys = bigrams(docs.filter(col("doc_id") % 97 =!= 0))
      .distinct().localCheckpoint() // builds the filter AND the truth set
    val probes = bigrams(docs.filter(col("doc_id") % 97 === 0))
      .unionAll(spark.range(200)
        .select(concat(lit("absent"), col("id")).as("key")))
      .distinct()
    val bloom = Sketches.bloomBuild(trainKeys, depth = 3, m = 4096)
    Sketches.bloomProbe(bloom, probes, depth = 3, m = 4096)
      .join(trainKeys.withColumn("truly", lit(true)), Seq("key"), "left")
      .agg(count(lit(1)).as("n_probe"),
        sum(when(col("truly"), 1L).otherwise(0L)).as("n_true_present"),
        sum(when(col("maybe_present"), 1L).otherwise(0L)).as("n_maybe"),
        sum(when(col("maybe_present") && col("truly").isNull, 1L)
          .otherwise(0L)).as("n_false_pos"))
  }

  /** MMR diversified top-5 over cosine top-20 candidates for 3 query
    * vectors: integer-micro greedy (λ=0.7), replayed step-for-step by
    * the unrolled oracle. */
  def qMmrDiversify(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir).embeddings
    val cands = Similarity.bruteForceTopK(emb, k = 20, numQueries = 3)
      .select(col("query_id"), col("nn_id").as("cid"),
        round(col("cos_sim") * 1e6, 0).cast("long").as("rel_micro"))
      .localCheckpoint() // feeds the pair grid AND the greedy loop
    val dv = emb.select(col("vec_id"),
      expr("transform(embedding, x -> cast(x as double))").as("v"))
    val sims = cands.select(col("query_id"), col("cid").as("a"))
      .join(cands.select(col("query_id"), col("cid").as("b")), Seq("query_id"))
      .filter(col("a") =!= col("b"))
      .join(dv.select(col("vec_id").as("a"), col("v").as("av")), Seq("a"))
      .join(dv.select(col("vec_id").as("b"), col("v").as("bv")), Seq("b"))
      .select(col("query_id"), col("a"), col("b"),
        round(round(Similarity.cosine(col("av"), col("bv")), 6) * 1e6, 0)
          .cast("long").as("sim_micro"))
    Similarity.mmrSelect(cands, sims, k = 5)
  }

  /** Per-source HLL distinct-bigram estimates beside the exact
    * count: portable registers, exact-long harmonic sum, proven-ln
    * linear-counting branch. */
  def qHllDistinct(spark: SparkSession, dir: String): DataFrame = {
    val bg = Tables(spark, dir).documents
      .select(col("source"), TextAnalysis.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("source"), explode(expr(
        TextAnalysis.adjacentPairsExpr("toks", "w1", "w2"))).as("b"))
      .select(col("source"),
        concat(col("b.w1"), lit(" "), col("b.w2")).as("key"))
      .localCheckpoint() // feeds the sketch AND the exact reference
    Sketches.hllDistinctBy(bg, "source")
      .join(bg.groupBy("source").agg(countDistinct("key").as("true_n")),
        Seq("source"))
      .select("source", "true_n", "v", "raw_est", "hll_est")
  }

  /** Mergeable quantile sketch over orders: per-priority p50/p90 from
    * the deterministic 1/8 hash-threshold sample, exact quantiles
    * riding along so the sampling error is measured, not promised
    * ([[Sketches.quantileSketch]]). */
  def qQuantileSketch(spark: SparkSession, dir: String): DataFrame =
    Sketches.quantileSketch(Tables(spark, dir).orders,
      groupCol = "o_orderpriority", keyCol = "o_orderkey",
      valCol = "o_totalprice", shift = 3)

  /** Exact pairwise (grp, key) intersection counts — the key-wide
    * self-join companion the KMV queries ride along for measured
    * error. @return (grp_a, grp_b, inter_exact) for grp_a < grp_b. */
  private def exactPairIntersections(gk: DataFrame): DataFrame = {
    val d = gk.distinct().localCheckpoint()
    d.as("a")
      .join(d.as("b"), col("a.key") === col("b.key") && col("a.grp") < col("b.grp"))
      .groupBy(col("a.grp").as("grp_a"), col("b.grp").as("grp_b"))
      .agg(count(lit(1)).as("inter_exact"))
  }

  /** Audience overlap via KMV bottom-k sketches: per-returnflag
    * distinct-partkey sketches composed into pairwise union AND
    * intersection estimates ([[Sketches.kmvOverlap]]) — the segment-
    * overlap question HLL cannot answer. The exact pairwise
    * intersection rides along (the key-wide self-join shuffle the
    * sketch replaces at 100 TB) so the measured error is visible and
    * oracle-checked. */
  def qKmvOverlap(spark: SparkSession, dir: String): DataFrame = {
    val k = 256
    val li = Tables(spark, dir).lineitem
      .select(col("l_returnflag").as("grp"), col("l_partkey").as("key"))
    val sk = Sketches.kmvSketchBy(li, "grp", "key", k)
    Sketches.kmvOverlap(sk, "grp", k)
      .join(exactPairIntersections(li), Seq("grp_a", "grp_b"))
      .select("grp_a", "grp_b", "est_a", "est_b", "est_union", "est_inter",
        "inter_exact")
  }

  /** Joinability discovery (the Aurum-style data-catalog question:
    * which columns JOIN with which?): KMV sketches over six key
    * columns across five tables, composed into pairwise DIRECTED
    * containment estimates — est_inter/est_a ≈ |A∩B|/|A|, the "is
    * this column a foreign key into that one" score — without ever
    * joining the tables themselves. Mixed saturation by design
    * (suppkey's 100 values stay exact, partkey/custkey saturate the
    * sketch), so both estimator branches are oracle-checked; the
    * exact intersection rides along. At lake scale this is the whole
    * point: profiling C columns pairwise needs C sketch scans, not
    * C² joins. */
  def qJoinability(spark: SparkSession, dir: String): DataFrame = {
    val k = 256
    val t = Tables(spark, dir)
    def colSet(df: DataFrame, c: String, name: String): DataFrame =
      df.select(col(c).cast("long").as("key"), lit(name).as("grp"))
    val all = colSet(t.orders, "o_custkey", "orders.o_custkey")
      .unionAll(colSet(t.customer, "c_custkey", "customer.c_custkey"))
      .unionAll(colSet(t.lineitem, "l_partkey", "lineitem.l_partkey"))
      .unionAll(colSet(t.part, "p_partkey", "part.p_partkey"))
      .unionAll(colSet(t.lineitem, "l_suppkey", "lineitem.l_suppkey"))
      .unionAll(colSet(t.supplier, "s_suppkey", "supplier.s_suppkey"))
    val sk = Sketches.kmvSketchBy(all, "grp", "key", k)
    Sketches.kmvOverlap(sk, "grp", k)
      .join(exactPairIntersections(all), Seq("grp_a", "grp_b"), "left")
      .withColumn("inter_exact", coalesce(col("inter_exact"), lit(0L)))
      .withColumn("containment_a", round(col("est_inter") / col("est_a"), 4))
      .withColumn("containment_b", round(col("est_inter") / col("est_b"), 4))
  }

  /** Columns profiled by [[qFdDiscovery]] — shared with the oracle
    * generator so both engines scan the identical pair grid. */
  val fdCols = Seq("c_custkey", "c_name", "c_nationkey", "c_mktsegment")

  /** Functional-dependency discovery over customer's columns
    * ([[graft.ext.Curation.fdDiscovery]]): the key column determines
    * everything, names are unique (so name→* holds too), and the
    * low-cardinality nation/segment pair fails with visible violation
    * mass — the TANE-style profile a warehouse catalog runs before
    * trusting joins. */
  def qFdDiscovery(spark: SparkSession, dir: String): DataFrame =
    Curation.fdDiscovery(Tables(spark, dir).customer, fdCols)

  /** Interpolated Kneser–Ney bigram LM over the corpus: top-100
    * bigrams with exact-long-arithmetic pkn_nano (D = 3/4). */
  def qKnBigram(spark: SparkSession, dir: String): DataFrame =
    Curation.knBigramTable(Tables(spark, dir).documents)

  /** Count-min heavy-hitter bigrams: sample proposes candidates, the
    * fixed 4×256 sketch scores them at full-corpus weight; exact
    * counts ride along so `cms_est ≥ exact_n` is oracle-checked. */
  def qCmsHeavyHitters(spark: SparkSession, dir: String): DataFrame =
    Sketches.cmsHeavyHitters(Tables(spark, dir).documents)

  /** Entity resolution over customers with deterministic dirty
    * variants (insert/delete typos, case/whitespace noise): strong-key
    * blocking on the digit string + edit-distance-1 letter match +
    * transitive closure — every variant family must collapse back to
    * its clean record's id. */
  def qEntityResolution(spark: SparkSession, dir: String): DataFrame =
    EntityResolution.resolve(
      EntityResolution.customerVariants(Tables(spark, dir).customer))

  /** Span-removal decontamination: a 12-token benchmark sentence is
    * planted on the bench split (id % 97 == 0) and on every 13th
    * train doc, whose copies must then be cut. */
  def qDecontaminate(spark: SparkSession, dir: String): DataFrame = {
    val boiler = "the quick brown fox jumps over the lazy dog near the riverbank"
    val planted = Tables(spark, dir).documents.select(col("doc_id"),
      concat(col("text"),
        when(col("doc_id") % 97 === 0 || col("doc_id") % 13 === 0,
          lit(" " + boiler)).otherwise(lit(""))).as("text"))
    Curation.decontaminate(planted)
  }

  // ── time-series analytics over the event stream ──────────────────

  def qCusum(spark: SparkSession, dir: String): DataFrame =
    Timeseries.cusumChangepoint(Tables(spark, dir).events)

  def qAcf(spark: SparkSession, dir: String): DataFrame =
    Timeseries.acf(Tables(spark, dir).events, maxLag = 7)

  def qEwma(spark: SparkSession, dir: String): DataFrame =
    Timeseries.ewma(Tables(spark, dir).events, window = 8)

  /** Ljung–Box joint white-noise test over the first 7 lags of the
    * daily series — the portmanteau gate beside [[qAcf]]'s per-lag
    * table and [[qDurbinWatson]]'s lag-1 statistic. */
  def qLjungBox(spark: SparkSession, dir: String): DataFrame =
    Timeseries.ljungBox(Tables(spark, dir).events, maxLag = 7)

  def qSeqPattern(spark: SparkSession, dir: String): DataFrame =
    Timeseries.seqPattern(Tables(spark, dir).events)

  /** Day-of-week-adjusted anomaly scores over the event stream. */
  def qSeasonalAnomaly(spark: SparkSession, dir: String): DataFrame =
    Timeseries.seasonalAnomalies(Tables(spark, dir).events)

  /** Poisson-bootstrap ~95% CI on mean event value (cents) per event
    * type: B=50 replicates in one pass, interval = 2nd/49th order
    * statistics of the replicate means. */
  def qBootstrapCi(spark: SparkSession, dir: String): DataFrame =
    Bootstrap.poissonMeanCI(Tables(spark, dir).events, "event_type",
      round(col("value") * 100, 0), "event_id",
      b = 50, loRank = 2, hiRank = 49)

  /** Blocklist shared by qBlocklistFilter and its oracle (single
    * source of truth — the oracle renders this Seq into its VALUES
    * CTE, so engine and oracle cannot desynchronize). Phrases chosen
    * to exercise the automaton: cross-token bigrams/trigrams from the
    * corpus vocabulary, a pattern that is an interior substring of
    * another hit ("low j" inside "slow join"), a single token, and
    * two terms absent from the corpus (empty-match path). */
  val BlocklistTerms: Seq[String] = Seq(
    "slow join", "batch batch batch", "vector join vector",
    "spark window", "low j", "dup", "scan merge", "lorem ipsum",
    "the fast", "errcode")

  /** Aho–Corasick blocklist gate over the raw corpus. */
  def qBlocklistFilter(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.blocklistScreen(Tables(spark, dir).documents,
      BlocklistTerms)

  /** JL project-then-rerank ANN: 8-dim coarse scan, top-40 shortlist,
    * exact rerank to top-10. */
  def qSimJlRerank(spark: SparkSession, dir: String): DataFrame =
    Similarity.jlTopK(Tables(spark, dir).embeddings,
      k = 10, numQueries = 5, outDim = 8, shortlist = 40)

  /** URL canonicalization screen over deterministically planted URLs
    * (mixed-case scheme/host, default ports, tracking params,
    * fragments, a co.uk multi-label suffix — every rule fires on some
    * residue class). The oracle replants the identical URLs in SQL
    * and replays every canonicalization regex. */
  def qUrlCanonicalize(spark: SparkSession, dir: String): DataFrame = {
    val planted = Tables(spark, dir).documents.select(col("doc_id"),
      concat(
        when(col("doc_id") % 3 === 0, "HTTPS://").otherwise("http://"),
        when(col("doc_id") % 4 === 0, "WWW.").otherwise(""),
        lit("Site"), (col("doc_id") % 7).cast("string"),
        when(col("doc_id") % 5 === 0, ".co.uk").otherwise(".example.com"),
        when(col("doc_id") % 3 === 0, ":443")
          .when(col("doc_id") % 3 === 1, ":80").otherwise(""),
        lit("/Path/"), (col("doc_id") % 11).cast("string"),
        when(col("doc_id") % 4 === 0, "?utm_source=x&b=2&a=1")
          .when(col("doc_id") % 4 === 1, "?a=1&fbclid=zz")
          .when(col("doc_id") % 4 === 2, "?z=9").otherwise(""),
        when(col("doc_id") % 6 === 0, "#frag").otherwise("")).as("url"))
    WebOps.urlScreen(planted)
      .select("doc_id", "url", "canon_url", "domain", "changed")
  }

  /** HTML main-content extraction over deterministically planted
    * pages: every doc is wrapped in nav/footer boilerplate (link-
    * dense), docs ≡ 0 mod 3 get an ad block, the body text rides in
    * two <p> blocks. The link-density gate must drop every
    * boilerplate block and keep the prose. */
  def qHtmlExtract(spark: SparkSession, dir: String): DataFrame = {
    val planted = Tables(spark, dir).documents.select(col("doc_id"),
      concat(
        lit("<html><head><title>Doc "), col("doc_id").cast("string"),
        lit("</title></head><body>"),
        lit("<nav><a href=\"/\">Home</a> <a href=\"/about\">About us</a></nav>"),
        lit("<p>"), substring(col("text"), 1, 120), lit("</p>"),
        when(col("doc_id") % 3 === 0,
          lit("<div class=\"ad\"><a href=\"/buy\">Buy now great deal</a>" +
            " <a href=\"/win\">Click here</a></div>")).otherwise(lit("")),
        lit("<p>"), substring(col("text"), 121, 4000), lit(" &amp; tail</p>"),
        lit("<footer><a href=\"/tos\">Terms</a> <a href=\"/priv\">Privacy</a></footer>"),
        lit("</body></html>")).as("html"))
    WebOps.htmlMainContent(planted)
  }

  /** Misra–Gries per-source top tokens. Capacity 4096 ≫ the corpus
    * vocabulary, so the summary never evicts and the counts are EXACT
    * (order-independent — the only regime a DuckDB replay can check);
    * the eviction/merge bound is ExtSpec's job. */
  def qFreqItems(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables(spark, dir).documents
      .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
    toks.groupBy("source")
      .agg(graft.expressions.FreqItemsAgg
        .freqItems(col("tok"), capacity = 4096, emitK = 10).as("top"))
      .select(col("source"), posexplode(col("top")))
      .select(col("source"), (col("pos") + 1).as("rn"),
        col("col.item").as("token"), col("col.cnt").as("cnt"))
  }

  /** RAKE keyphrases over the documents table — top 3 candidate
    * phrases per doc by summed deg/freq word score. */
  def qRakeKeywords(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.rakeKeyphrases(Tables(spark, dir).documents)

  /** Do "longer" and "more tokens" rank documents the same way within
    * each language? Spearman ρ (all docs) + Kendall τ-b (capped
    * subset) between n_chars and the token count. */
  def qRankCorr(spark: SparkSession, dir: String): DataFrame =
    Evaluation.rankCorrelation(
      Tables(spark, dir).documents.select(col("lang"), col("doc_id"),
        col("n_chars"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_toks")),
      "lang", "doc_id", "n_chars", "n_toks", maxPerGroup = 200)

  /** Two-proportion z-test per event type: arm = user_id parity,
    * conversion = value > 50 — the A/B readout shape. */
  def qAbTest(spark: SparkSession, dir: String): DataFrame =
    Evaluation.abTest(
      Tables(spark, dir).events.select(col("event_type"),
        pmod(col("user_id"), lit(2)).as("arm"),
        (col("value") > 50.0).cast("long").as("conv")),
      "event_type", "arm", "conv")

  /** Classification report (per-class P/R/F1, integer micro) over the
    * nearest-centroid classifier's confusion counts — the eval step
    * after [[qCentroidClassify]]. */
  def qEvalF1(spark: SparkSession, dir: String): DataFrame =
    Evaluation.classificationReport(
      Similarity.centroidClassify(Tables(spark, dir).embeddings, trainMod = 5))

  /** McNemar's paired test per language: two heuristic gates scored
    * on the SAME docs against the contains-" the " label — length
    * (n_chars ≥ 150) vs token count (≥ 30). Discordant-pair counts
    * plus the continuity-corrected χ². */
  def qMcnemar(spark: SparkSession, dir: String): DataFrame =
    Evaluation.mcnemar(
      Tables(spark, dir).documents.select(col("lang").as("group"),
        lower(col("text")).like("% the %").as("y"),
        (col("n_chars") >= 150L).as("pred_a"),
        (size(TextAnalysis.tokens(col("text"))) >= 30).as("pred_b")))

  /** Group-fairness audit of the length gate by language: per-lang
    * selection rate / TPR / FPR and the demographic-parity +
    * equalized-odds gaps vs the overall rates. The label correlates
    * with language by construction (" the " is English), so the
    * report shows real disparity, not noise. */
  def qFairness(spark: SparkSession, dir: String): DataFrame =
    Evaluation.fairnessReport(
      Tables(spark, dir).documents.select(col("lang").as("group"),
        lower(col("text")).like("% the %").as("y"),
        (col("n_chars") >= 150L).as("pred")))

  /** Label-noise census via confident learning
    * ([[graft.ext.Curation.confidentJoint]]): the langid stopword
    * profile supplies per-class probabilities (hit shares), the
    * corpus's own `lang` column is the noisy label — the joint count
    * matrix's off-diagonal is the estimated mislabel mass. Docs
    * outside the four scored classes or with no stopword hits
    * abstain. */
  def qLabelNoise(spark: SparkSession, dir: String): DataFrame = {
    val d = TextAnalysis.withLangId(Tables(spark, dir).documents)
      .filter(col("lang").isin("en", "es", "fr", "de"))
      .withColumn("tot", col("en_hits") + col("es_hits") +
        col("fr_hits") + col("de_hits"))
      .filter(col("tot") > 0)
    // one corpus pass: stack the four class shares instead of a
    // 4-way self-union (which would tokenize the corpus four times)
    def p(c: String) =
      round(col(s"${c}_hits").cast("double") * lit(1e6) /
        col("tot").cast("double"), 0).cast("long")
    val scores = d.select(col("doc_id"), col("lang").as("noisy"),
        p("en").as("p_en"), p("es").as("p_es"),
        p("fr").as("p_fr"), p("de").as("p_de"))
      .selectExpr("doc_id", "noisy",
        "stack(4, 'en', p_en, 'es', p_es, 'fr', p_fr, 'de', p_de) " +
          "as (cls, p_micro)")
    Curation.confidentJoint(scores)
  }

  /** Dataset cartography over the LR trainer's own rounds
    * ([[graft.ext.Curation.lrCartography]]): per doc, confidence /
    * variability / correct-round count across the 12 training
    * snapshots, banded into the easy/hard/ambiguous map. */
  def qCartography(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
      .withColumn("y", lower(col("text")).like("% the %").cast("long"))
    Curation.lrCartography(docs, "y", iters = lrIters)
  }

  /** Fellegi–Sunter field spec + thresholds, shared with the oracle
    * generator so both engines score from the SAME micro weights
    * (the VincentyDistance shared-constants discipline). */
  val fsFields: Seq[EntityResolution.FsField] = Seq(
    EntityResolution.FsField("name", 0.95, 0.05, jwMin = 0.92),
    // 5-category segment: high u (strangers agree 1 time in 5)
    EntityResolution.FsField("segment", 0.90, 0.20),
    EntityResolution.FsField("phone", 0.90, 0.02))
  val fsUpperMicro = 8000000L
  val fsLowerMicro = 0L

  /** Probabilistic record linkage over the multi-field dirty customer
    * records: every in-block pair scored by summed log₂ likelihood
    * weights, cut into match/review/nonmatch
    * ([[graft.ext.EntityResolution.fellegiSunter]]). */
  def qFellegiSunter(spark: SparkSession, dir: String): DataFrame =
    EntityResolution.fellegiSunter(
      EntityResolution.customerLinkRecords(Tables(spark, dir).customer),
      "blk", fsFields, fsUpperMicro, fsLowerMicro)

  /** Flesch–Kincaid readability per document — pure map, no shuffle. */
  def qReadability(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.readability(Tables(spark, dir).documents)

  /** Gunning fog / SMOG / Coleman–Liau per document — the
    * cross-check indices beside [[qReadability]]'s FK pair; pure
    * map, no shuffle. */
  def qReadabilityExt(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.readabilityExtended(Tables(spark, dir).documents)

  /** Mixture diversity/concentration of the corpus by source:
    * entropy, effective source count, HHI, Gini. */
  def qMixDiversity(spark: SparkSession, dir: String): DataFrame =
    Curation.mixDiversity(Tables(spark, dir).documents)

  /** Corpus distinct-1/2/3 generation diversity per source — the
    * cross-document repetition readout. */
  def qDistinctNgrams(spark: SparkSession, dir: String): DataFrame =
    Curation.distinctNgrams(Tables(spark, dir).documents)

  /** LR training rounds for [[qLrTrain]] — shared with the oracle
    * generator (unrolled to the same depth). 12 rounds take the demo
    * label from the 0.77 all-majority base rate to 0.94 accuracy. */
  val lrIters = 12

  /** Train the hashed-bigram logistic quality gate on a derived
    * label (contains " the "), then score the corpus with the
    * learned weights — distributed TRAINING with an exact DuckDB
    * replay ([[graft.ext.Curation.trainQualityLr]]). */
  def qLrTrain(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
      .withColumn("y", lower(col("text")).like("% the %").cast("long"))
    // score off the trainer's own pinned feature table (r18): the
    // previous lrMargins + label-join shape re-tokenized and
    // re-shuffled the whole corpus a second time for the same rows
    val (w, _, feats) =
      Curation.trainQualityLrWithFeats(docs, "y", iters = lrIters)
    Curation.lrScoreOnFeats(feats, w)
      .select(col("doc_id"), col("y"), col("margin_micro"), col("pred"))
  }

  /** Weighted κ between two derived ordinal 1–5 "judges" per
    * language: length-based vs token-count-based scores — the
    * ordinal-agreement readout for LLM-judge panels. */
  def qWeightedKappa(spark: SparkSession, dir: String): DataFrame =
    Evaluation.weightedKappa(
      Tables(spark, dir).documents.select(col("lang").as("group"),
        least(lit(5L), greatest(lit(1L),
          expr("n_chars div 50"))).as("r1"),
        least(lit(5L), greatest(lit(1L),
          expr("CAST(size(" +
            "array_remove(split(lower(text), '\\\\s+'), '')" +
            ") AS BIGINT) div 10"))).as("r2")))

  /** Difference-in-differences per event type: arm = user parity,
    * periods split at Jan 16, outcome in exact cents — the
    * quasi-experimental readout with the common time trend stripped. */
  def qDid(spark: SparkSession, dir: String): DataFrame =
    Evaluation.didEstimate(
      Tables(spark, dir).events.select(col("event_type").as("group"),
        pmod(col("user_id"), lit(2)).as("arm"),
        (col("ts") >= lit("2024-01-16").cast("timestamp"))
          .cast("long").as("period"),
        round(col("value") * 100, 0).cast("long").as("y_micro")))

  /** CUPED adjustment: per-user pre-period spend (cents) as the
    * covariate for post-period spend, arms by user parity — the
    * variance-reduction readout an experimentation platform applies
    * before every metric read. */
  def qCuped(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).events
      .withColumn("cents", round(col("value") * 100, 0).cast("long"))
      .withColumn("post",
        (col("ts") >= lit("2024-01-16").cast("timestamp")).cast("long"))
    val perUser = e.groupBy(col("user_id")).agg(
      sum(when(col("post") === 0L, col("cents")).otherwise(0L)).as("x_micro"),
      sum(when(col("post") === 1L, col("cents")).otherwise(0L)).as("y_micro"))
    Evaluation.cupedAdjust(perUser.select(lit("all").as("group"),
      pmod(col("user_id"), lit(2)).as("arm"),
      col("y_micro"), col("x_micro")))
  }

  /** DeLong's paired-AUC test per language: quality score vs a pure
    * length score against the contains-" the " label, scored on the
    * SAME docs — the correlated-AUC comparison two independent
    * Mann–Whitney tests would get wrong. */
  def qDelong(spark: SparkSession, dir: String): DataFrame = {
    val d = TextAnalysis.withStats(Tables(spark, dir).documents)
    Evaluation.delongTest(d.select(col("lang").as("group"),
      lower(col("text")).like("% the %").cast("long").as("y"),
      round(col("quality_score") * 1e6, 0).cast("long")
        .as("score_a_micro"),
      (least(col("n_chars"), lit(1000L)) * 1000L).as("score_b_micro")))
  }

  /** Hill tail index of event value (cents) per event type over the
    * top-100 order statistics — how heavy is the value tail the
    * robust means defend against. */
  def qHillTail(spark: SparkSession, dir: String): DataFrame =
    Evaluation.hillTail(Tables(spark, dir).events.select(
      col("event_type").as("group"),
      round(col("value") * 100, 0).cast("long").as("v")), k = 100)

  /** Weekly seasonal strength per event type — the R² of the
    * day-of-week profile against the daily series, the one-number
    * screen before seasonal modeling. */
  def qSeasonalStrength(spark: SparkSession, dir: String): DataFrame =
    Timeseries.seasonalStrength(Tables(spark, dir).events)

  /** Gwet's AC1 per source over the two language heuristics — the
    * prevalence-paradox-resistant agreement beside [[qCohenKappa]]
    * on identical inputs (en-heavy sources skew the marginals; AC1
    * stays interpretable where κ collapses). */
  def qGwetAc1(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    def cnt(words: Seq[String]) =
      size(filter(toks, t => t.isin(words.map(x => lit(x)): _*)))
    Evaluation.gwetAC1(Tables(spark, dir).documents.select(
      col("source").as("group"),
      when(cnt(TextAnalysis.EnStop) >= cnt(TextAnalysis.EsStop), "en")
        .otherwise("es").as("label_a"),
      when(lower(col("text")).like("% the %"), "en").otherwise("es")
        .as("label_b")))
  }

  /** Truncated RBO@20 per language between the quality-score ranking
    * and the pure-length ranking of docs — does the trained-looking
    * ranker agree with the trivial one at the top, where serving
    * decisions happen? */
  def qRbo(spark: SparkSession, dir: String): DataFrame = {
    val d = TextAnalysis.withStats(Tables(spark, dir).documents)
    Evaluation.rboOverlap(
      d.select(col("lang").as("group"), col("doc_id").as("item"),
        round(col("quality_score") * 1e6, 0).cast("long").as("score_micro")),
      d.select(col("lang").as("group"), col("doc_id").as("item"),
        col("n_chars").as("score_micro")))
  }

  /** 5%-trimmed and winsorized mean event value (cents) per event
    * type — the robust location pair beside the raw means a whale
    * event would own. */
  def qTrimmedMean(spark: SparkSession, dir: String): DataFrame =
    Evaluation.robustLocation(Tables(spark, dir).events.select(
      col("event_type").as("group"),
      round(col("value") * 100, 0).cast("long").as("v")))

  /** Degree assortativity of the part↔supplier sourcing graph (the
    * [[graft.queries.AdvancedAnalytics.qPagerank]] edge encoding) —
    * bipartite hub-and-spoke structure reads strongly negative. */
  def qAssortativity(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
      .select((col("l_partkey") * 2).as("p"), (col("l_suppkey") * 2 + 1).as("s"))
      .distinct()
    val edges = li.select(col("p").as("src"), col("s").as("dst"))
      .union(li.select(col("s").as("src"), col("p").as("dst")))
    graft.operators.Graph.assortativity(edges)
  }

  /** Cochran's Q per language over THREE heuristic gates scored on
    * the same docs (length, token count, contains-" the ") — the
    * k-gate generalization of [[qMcnemar]]'s pair. */
  def qCochranQ(spark: SparkSession, dir: String): DataFrame = {
    val d = TextAnalysis.withStats(Tables(spark, dir).documents)
    val base = d.select(col("lang").as("group"), col("doc_id").as("item"),
      (col("n_chars") >= 150L).cast("long").as("g_len"),
      (col("n_tokens") >= 30).cast("long").as("g_tok"),
      lower(col("text")).like("% the %").cast("long").as("g_the"))
    Evaluation.cochranQ(base.selectExpr("group", "item",
      "stack(3, 'len', g_len, 'tok', g_tok, 'the', g_the) as (rater, y)"))
  }

  /** Precision–recall AUC per language of the quality score against
    * the contains-" the " label — the imbalance-honest companion of
    * [[qAucRoc]] on identical inputs. */
  def qPrAuc(spark: SparkSession, dir: String): DataFrame = {
    val d = TextAnalysis.withStats(Tables(spark, dir).documents)
    Evaluation.prAuc(d.select(col("lang").as("group"),
      round(col("quality_score") * 1e6, 0).cast("long").as("score_micro"),
      lower(col("text")).like("% the %").cast("long").as("y")))
  }

  /** Log-rank test between even- and odd-keyed customers' lifetime
    * curves — the inferential companion of [[qKaplanMeier]] on the
    * same censored lifetimes (a parity split, so the expected verdict
    * is "no difference" — the null behaving is itself the check). */
  def qLogRank(spark: SparkSession, dir: String): DataFrame = {
    val perCust = Tables(spark, dir).orders.groupBy("o_custkey").agg(
      min(to_date(col("o_orderdate"))).as("first_d"),
      max(to_date(col("o_orderdate"))).as("last_d"))
    Evaluation.logRank(perCust.select(lit("all").as("group"),
      pmod(col("o_custkey"), lit(2)).as("arm"),
      expr("datediff(last_d, first_d) div 30").as("t"),
      (col("last_d") < lit("2001-02-01").cast("date")).cast("long")
        .as("event")))
  }

  /** Cohen's d / Hedges' g of the user-parity arm on event value
    * (cents) per event type — the effect-SIZE readout beside
    * [[qAbTest]]'s significance z. */
  def qEffectSize(spark: SparkSession, dir: String): DataFrame =
    Evaluation.effectSize(Tables(spark, dir).events.select(
      col("event_type").as("group"), pmod(col("user_id"), lit(2)).as("arm"),
      round(col("value") * 100, 0).cast("long").as("y")))

  /** Page–Hinkley upward-shift evidence per event type over the daily
    * series — the running-min sequential detector beside [[qCusum]]'s
    * global-peak statistic. */
  def qPageHinkley(spark: SparkSession, dir: String): DataFrame =
    Timeseries.pageHinkley(Tables(spark, dir).events)

  /** Mann–Whitney rank test per language: does the quality score of
    * docs containing " the " stochastically dominate the rest? The
    * unpaired nonparametric sibling of [[qDelong]] (same metric, same
    * label) — rank-based, so no normality assumption on the score. */
  def qMannWhitney(spark: SparkSession, dir: String): DataFrame = {
    val d = TextAnalysis.withStats(Tables(spark, dir).documents)
    Evaluation.mannWhitney(d.select(col("lang").as("group"),
      lower(col("text")).like("% the %").cast("long").as("arm"),
      round(col("quality_score") * 1e6, 0).cast("long").as("v_micro")))
  }

  /** Benjamini–Hochberg FDR gate over the per-event-type A/B z-tests
    * ([[qAbTest]]'s family of comparisons): each test's p comes from
    * the two-sided Chernoff bound 2·exp(−z²/2) — a TRUE conservative
    * p-value bound computable exactly in any engine (no normal-CDF
    * special function), micro-rounded — then the step-up adjustment
    * decides which event types survive at q = 0.05. */
  def qFdrBh(spark: SparkSession, dir: String): DataFrame = {
    val z = Evaluation.abTest(
      Tables(spark, dir).events.select(col("event_type"),
        pmod(col("user_id"), lit(2)).as("arm"),
        (col("value") > 50.0).cast("long").as("conv")),
      "event_type", "arm", "conv")
    Evaluation.bhAdjust(z.select(lit("all").as("group"),
      col("grp").as("test"),
      round(least(lit(1.0), lit(2.0) * exp(-col("z") * col("z") / 2.0))
        * 1e6, 0).cast("long").as("p_micro")))
  }

  /** Mantel–Haenszel common odds ratio + CMH χ² of the user-parity
    * arm's effect on high-value events, stratified by event type —
    * the Simpson-safe pooled readout over [[qAbTest]]'s strata. */
  def qMantelHaenszel(spark: SparkSession, dir: String): DataFrame =
    Evaluation.mantelHaenszel(Tables(spark, dir).events.select(
      lit("all").as("group"), col("event_type").as("stratum"),
      pmod(col("user_id"), lit(2)).as("arm"),
      (col("value") > 50.0).cast("long").as("y")))

  /** Jensen–Shannon divergence per language between even- and odd-id
    * docs' token distributions — the symmetric always-finite corpus
    * drift statistic (novel tokens on either side stay bounded, where
    * KL explodes and PSI needs numeric bins). */
  def qJsDivergence(spark: SparkSession, dir: String): DataFrame =
    Evaluation.jsDivergence(Tables(spark, dir).documents.select(
      col("lang").as("group"), pmod(col("doc_id"), lit(2)).as("side"),
      explode(TextAnalysis.tokens(col("text"))).as("tok")))

  /** Kaplan–Meier customer-lifetime curve: per customer, lifetime =
    * months between first and last order; customers still ordering in
    * the corpus's final six months (the order stream ends 2001-08-01)
    * are CENSORED (their true lifetime is longer than observed) — the
    * estimator reads retention without the censoring bias a naive
    * survival fraction bakes in. */
  def qKaplanMeier(spark: SparkSession, dir: String): DataFrame = {
    val perCust = Tables(spark, dir).orders.groupBy("o_custkey").agg(
      min(to_date(col("o_orderdate"))).as("first_d"),
      max(to_date(col("o_orderdate"))).as("last_d"))
    Evaluation.kaplanMeier(perCust.select(lit("all").as("group"),
      expr("datediff(last_d, first_d) div 30").as("t"),
      (col("last_d") < lit("2001-02-01").cast("date")).cast("long")
        .as("event")))
  }

  /** Mann–Kendall monotone-trend test per event type over the
    * densified daily series — the significance readout beside
    * [[qTheilSen]]'s slope estimate. */
  def qMannKendall(spark: SparkSession, dir: String): DataFrame =
    Timeseries.mannKendall(Tables(spark, dir).events)

  /** Split-conformal quality-gate calibration per language: the
    * nonconformity score is inverted doc quality (low quality = high
    * nonconformity), doc_id%5 holds out the test split, and the
    * report carries the finite-sample 90% threshold plus its measured
    * held-out coverage. */
  def qConformalGate(spark: SparkSession, dir: String): DataFrame = {
    val d = TextAnalysis.withStats(Tables(spark, dir).documents)
    Evaluation.conformalThreshold(d.select(col("lang").as("group"),
      when(pmod(col("doc_id"), lit(5)) === 0, "test")
        .otherwise("cal").as("split"),
      (lit(1000000L) - round(col("quality_score") * 1e6, 0).cast("long"))
        .as("s_micro")))
  }

  /** Interval-metric Krippendorff α per language over an INCOMPLETE
    * ordinal panel: three derived 1–5 judges (two length scales, one
    * token scale), judge 2 and 3 missing on planted residue classes
    * and judge-1-only docs excluded as single-rating units. The
    * squared-difference metric the nominal α cannot express. */
  def qKrippendorffInterval(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents.select(
      col("lang").as("group"), col("doc_id").as("item"),
      least(lit(5L), greatest(lit(1L), expr("n_chars div 50"))).as("v1"),
      least(lit(5L), greatest(lit(1L),
        expr("CAST(size(array_remove(split(lower(text), '\\\\s+'), '')) " +
          "AS BIGINT) div 10"))).as("v2"),
      least(lit(5L), greatest(lit(1L), expr("n_chars div 60"))).as("v3"))
    val panel = d.selectExpr("group", "item",
        "stack(3, 'r1', v1, 'r2', v2, 'r3', v3) as (rater, v)")
      .filter(col("rater") === "r1" ||
        (pmod(col("item"), lit(17)) =!= 0 &&
          (col("rater") === "r2" ||
            (col("rater") === "r3" && pmod(col("item"), lit(3)) =!= 0))))
    Evaluation.krippendorffAlphaInterval(panel)
  }

  /** Train → score → EVALUATE: Mann–Whitney AUC of the trained
    * model's margins against the labels (margins are scores — AUC is
    * rank-based, no calibration needed). The full quality-gate loop
    * in one oracle-checked query. */
  def qLrEval(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
      .withColumn("y", lower(col("text")).like("% the %").cast("long"))
    // same single-tokenize scoring as [[qLrTrain]] (r18)
    val (w, _, feats) =
      Curation.trainQualityLrWithFeats(docs, "y", iters = lrIters)
    val preds = Curation.lrScoreOnFeats(feats, w)
      .select(lit("all").as("group"),
        col("margin_micro").as("score_micro"), col("y"))
    Evaluation.aucRoc(preds)
  }

  /** EM iteration count for [[qFsEm]] — shared with the oracle
    * generator (unrolled to the same depth). */
  val fsEmIters = 5

  /** EM demo field spec: EXACT equality on all three fields (names
    * are unique per customer, so name agreement is the strongly
    * discriminative feature — twins agree unless the %3 typo fired,
    * strangers never do; the JW comparator that the WEIGHTING query
    * wants is nearly constant across these near-key blocks and would
    * starve the mixture). (m, u) here are the EM INIT, not ground
    * truth. */
  val fsEmFields: Seq[EntityResolution.FsField] = Seq(
    EntityResolution.FsField("name", 0.90, 0.10),
    EntityResolution.FsField("segment", 0.90, 0.20),
    EntityResolution.FsField("phone", 0.90, 0.10))

  /** Unsupervised Fellegi–Sunter (m, u, p) estimation over the same
    * dirty-record pairs: the agreement-pattern histogram EM-fit from
    * the fsFields priors ([[graft.ext.EntityResolution
    * .fellegiSunterEm]]); one row per field plus the shared match
    * prevalence. */
  def qFsEm(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (fit, p) = EntityResolution.fellegiSunterEm(
      EntityResolution.customerLinkRecords(Tables(spark, dir).customer),
      "blk", fsEmFields, iters = fsEmIters)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    fit.map { case (f, m, u) => (f, r6(m), r6(u), r6(p)) }
      .toDF("field", "m", "u", "p")
  }

  /** Welch's t on event value (cents) between the user-parity arms,
    * per event type — the MEAN-difference readout beside [[qAbTest]]'s
    * proportion z and [[qMannWhitney]]'s rank test (a parity split, so
    * the expected verdict is "no difference" — the null behaving is
    * itself the check). */
  def qWelchTtest(spark: SparkSession, dir: String): DataFrame =
    Evaluation.welchTTest(Tables(spark, dir).events.select(
      col("event_type").as("group"), pmod(col("user_id"), lit(2)).as("arm"),
      round(col("value") * 100, 0).cast("long").as("y")))

  /** Always-valid mSPRT on the same per-event-type user-parity arms
    * as [[qWelchTtest]], τ = 100 cents — the peeking-safe p beside
    * the fixed-horizon t. */
  def qMsprt(spark: SparkSession, dir: String): DataFrame =
    Evaluation.msprt(Tables(spark, dir).events.select(
      col("event_type").as("group"), pmod(col("user_id"), lit(2)).as("arm"),
      round(col("value") * 100, 0).cast("long").as("y")), tau = 100.0)

  /** Kruskal–Wallis across SOURCES within each language: does at
    * least one source's document-length distribution sit above the
    * rest? The k-sample extension of [[qMannWhitney]] — the corpus-mix
    * diagnostic that flags a source whose length profile diverges. */
  def qKruskalWallis(spark: SparkSession, dir: String): DataFrame =
    Evaluation.kruskalWallis(Tables(spark, dir).documents.select(
      col("lang").as("group"), col("source").as("arm"),
      col("n_chars").as("v")))

  /** Brown–Forsythe variance-equality across event types on event
    * value (cents) — are the five types equally spread, or does one
    * carry the tail? The spread-side complement of [[qWelchTtest]]. */
  def qBrownForsythe(spark: SparkSession, dir: String): DataFrame =
    Evaluation.brownForsythe(Tables(spark, dir).events.select(
      lit("all").as("group"), col("event_type").as("arm"),
      round(col("value") * 100, 0).cast("long").as("v")))

  /** Jonckheere–Terpstra ordered trend of order value (cents) across
    * the five priority tiers (1-URGENT → 5-LOW as the dose order) —
    * the monotone-alternative power [[qKruskalWallis]] gives up. */
  def qJonckheere(spark: SparkSession, dir: String): DataFrame =
    Evaluation.jonckheereTerpstra(Tables(spark, dir).orders.select(
      lit("all").as("group"),
      substring(col("o_orderpriority"), 1, 1).cast("long").as("arm"),
      round(col("o_totalprice") * 100, 0).cast("long").as("v")))

  /** Split-half (Spearman–Brown) reliability of the five event types
    * as scale items on the same per-user activity panel as
    * [[qCronbachAlpha]] — the α-vs-SB gap diagnoses uneven items. */
  def qSplitHalf(spark: SparkSession, dir: String): DataFrame = {
    val activity = Tables(spark, dir).events.groupBy(
        col("user_id").as("subject"), col("event_type").as("item"))
      .agg(count(lit(1)).as("score"))
    Evaluation.splitHalf(activity.select(lit("all").as("group"),
      col("subject"), col("item"), col("score")))
  }

  /** Bartlett's variance-equality χ² across event types on the same
    * cents input as [[qBrownForsythe]] — the parametric power side of
    * the pair (disagreement between the two flags heavy tails). */
  def qBartlett(spark: SparkSession, dir: String): DataFrame =
    Evaluation.bartlett(Tables(spark, dir).events.select(
      lit("all").as("group"), col("event_type").as("arm"),
      round(col("value") * 100, 0).cast("long").as("v")))

  /** Kendall's W over the five order-priority classes as "raters"
    * ranking months by order volume — do the priority tiers agree on
    * which months are busy? A concordance readout over the same
    * orders stream [[qMonthlyGrowth]] trends. */
  def qKendallW(spark: SparkSession, dir: String): DataFrame = {
    val monthly = Tables(spark, dir).orders.groupBy(
        col("o_orderpriority").as("rater"),
        date_format(col("o_orderdate"), "yyyy-MM").as("item"))
      .agg(count(lit(1)).as("score"))
    Evaluation.kendallW(monthly.select(lit("all").as("group"),
      col("rater"), col("item"), col("score")))
  }

  /** Friedman's χ² on the same priority-ranks-months panel as
    * [[qKendallW]] — the significance shape finished from the SAME
    * concordance state (χ²_F = m(n−1)W, df = n−1). */
  def qFriedman(spark: SparkSession, dir: String): DataFrame = {
    val monthly = Tables(spark, dir).orders.groupBy(
        col("o_orderpriority").as("rater"),
        date_format(col("o_orderdate"), "yyyy-MM").as("item"))
      .agg(count(lit(1)).as("score"))
    Evaluation.friedmanTest(monthly.select(lit("all").as("group"),
      col("rater"), col("item"), col("score")))
  }

  /** Page's L on the priority-ranks-months panel — do monthly
    * volumes RISE chronologically consistently across tiers? The
    * ordered third finish beside [[qKendallW]] and [[qFriedman]]
    * (month names sort chronologically, so the item order is time). */
  def qPageTrend(spark: SparkSession, dir: String): DataFrame = {
    val monthly = Tables(spark, dir).orders.groupBy(
        col("o_orderpriority").as("rater"),
        date_format(col("o_orderdate"), "yyyy-MM").as("item"))
      .agg(count(lit(1)).as("score"))
    Evaluation.pageTrend(monthly.select(lit("all").as("group"),
      col("rater"), col("item"), col("score")))
  }

  /** Cronbach's α over the five event types as scale "items" scored
    * by per-user activity counts — do the event types measure one
    * underlying engagement trait? Users active in all five types form
    * the complete panel. */
  def qCronbachAlpha(spark: SparkSession, dir: String): DataFrame = {
    val activity = Tables(spark, dir).events.groupBy(
        col("user_id").as("subject"), col("event_type").as("item"))
      .agg(count(lit(1)).as("score"))
    Evaluation.cronbachAlpha(activity.select(lit("all").as("group"),
      col("subject"), col("item"), col("score")))
  }

  /** Nelson–Aalen cumulative hazard on the same censored customer
    * lifetimes as [[qKaplanMeier]] — the additive estimator plus the
    * Fleming–Harrington survival it implies. */
  def qNelsonAalen(spark: SparkSession, dir: String): DataFrame = {
    val perCust = Tables(spark, dir).orders.groupBy("o_custkey").agg(
      min(to_date(col("o_orderdate"))).as("first_d"),
      max(to_date(col("o_orderdate"))).as("last_d"))
    Evaluation.nelsonAalen(perCust.select(lit("all").as("group"),
      expr("datediff(last_d, first_d) div 30").as("t"),
      (col("last_d") < lit("2001-02-01").cast("date")).cast("long")
        .as("event")))
  }

  /** SSE-optimal single change point per event type's daily series —
    * the exact binary-segmentation split beside [[qCusum]]'s cumsum
    * peak and [[qPageHinkley]]'s sequential detector. */
  def qChangepoint(spark: SparkSession, dir: String): DataFrame =
    Timeseries.changePoint(Tables(spark, dir).events)

  /** Per-part local clustering coefficient of the co-purchase graph
    * (parts sharing an order) — the node-level community-embeddedness
    * feature beside [[graft.queries.AdvancedAnalytics.qTriangles]]'s
    * global count; see
    * [[graft.operators.Graph.localClustering]]. */
  def qLocalClustering(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Graph.localClustering(
      graft.queries.AdvancedAnalytics.coPurchasePairs(
        Tables(spark, dir).lineitem))

  /** Rich-club φ(k) of the co-purchase parts graph — do frequently
    * co-ordered parts cluster among themselves as degree rises? The
    * hub-core diagnostic beside [[qLocalClustering]]'s node view. */
  def qRichClub(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Graph.richClub(
      graft.queries.AdvancedAnalytics.coPurchasePairs(
        Tables(spark, dir).lineitem))

  /** k-truss (k=4) of the repeat-co-purchase graph — the triangle-
    * cohesion edge core [[qRichClub]]'s degree ladder and kCore's
    * node shells both overstate (stars survive a core, not a truss). */
  def qKTruss(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Graph.kTruss(
      graft.queries.AdvancedAnalytics.coPurchasePairs(
        Tables(spark, dir).lineitem), k = 4)

  /** [[qKTruss]] with the driver fast path DISABLED
    * (collectThreshold = 0): the bench/correctness probe for the
    * distributed peel loop — the actual 100 TB path — which sf0.1
    * (1.1M edges, under the 5M gate) otherwise never exercises. Same
    * graph, same oracle, same surviving edges; only the execution
    * path differs. */
  def qKTrussDist(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Graph.kTruss(
      graft.queries.AdvancedAnalytics.coPurchasePairs(
        Tables(spark, dir).lineitem), k = 4, collectThreshold = 0L)

  /** Gini inequality of order revenue WITHIN each priority tier —
    * is one tier's revenue whale-driven while another's is flat?
    * The value-mass complement of [[qMixDiversity]]'s size gini. */
  def qGini(spark: SparkSession, dir: String): DataFrame =
    Curation.giniValue(Tables(spark, dir).orders.select(
      col("o_orderpriority").as("group"),
      round(col("o_totalprice") * 100, 0).cast("long").as("v")))

  /** Exact boxplot of order revenue per priority tier — the
    * five-number + Tukey-fence profile beside [[qGini]]'s
    * concentration number and the approximate [[qQuantileSketch]]. */
  def qBoxplot(spark: SparkSession, dir: String): DataFrame =
    Profiler.boxplotStats(Tables(spark, dir).orders.select(
      col("o_orderpriority").as("group"),
      round(col("o_totalprice") * 100, 0).cast("long").as("v")))

  /** Decile lift/gain table of the quality score as a ranker for
    * English documents — "keep the top 20% by score" quantified; the
    * business-table view of the ranking [[qDelong]] and AUC grade
    * with one number. */
  def qLiftGain(spark: SparkSession, dir: String): DataFrame = {
    val d = TextAnalysis.withStats(Tables(spark, dir).documents)
    Evaluation.liftGain(d.select(lit("all").as("group"),
      round(col("quality_score") * 1e6, 0).cast("long").as("score_micro"),
      (col("lang") === "en").cast("long").as("y")))
  }

  /** Pairwise mutual information between the orders table's
    * categorical profiling columns (status, priority, order month) —
    * [[graft.ext.Curation.columnMi]], the graded companion of
    * q_fd_discovery's boolean FDs. */
  def qColumnMi(spark: SparkSession, dir: String): DataFrame =
    Curation.columnMi(Tables(spark, dir).orders.select(
      col("o_orderstatus").as("status"),
      col("o_orderpriority").as("priority"),
      date_format(col("o_orderdate"), "yyyy-MM").as("month")),
      Seq("status", "priority", "month"))

  /** Gries' DP dispersion of the corpus's top-20 tokens across
    * sources — which frequent terms are EVERYWHERE (function words,
    * DP ≈ 0) vs concentrated in one source (template/boilerplate
    * markers)? */
  def qDpDispersion(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.dpDispersion(Tables(spark, dir).documents)

  /** Post-stratified ATE of the user-parity arm on event value
    * (cents), standardized over event-type strata — the Simpson-safe
    * mean effect beside [[qMantelHaenszel]]'s odds scale and
    * [[qCuped]]'s covariate adjustment. */
  def qStratAte(spark: SparkSession, dir: String): DataFrame =
    Evaluation.postStratifiedAte(Tables(spark, dir).events.select(
      lit("all").as("group"), col("event_type").as("stratum"),
      pmod(col("user_id"), lit(2)).as("arm"),
      round(col("value") * 100, 0).cast("long").as("y")))

  /** Durbin–Watson on each event type's daily residuals — the lag-1
    * autocorrelation single number beside [[qAcf]]'s per-lag table
    * and [[qRunsTest]]'s sign patterns. */
  def qDurbinWatson(spark: SparkSession, dir: String): DataFrame =
    Timeseries.durbinWatson(Tables(spark, dir).events)

  /** Partial correlation per language: does the quality score track
    * raw character length BEYOND token count (the confounder both
    * share)? The "is this correlation just length" check before
    * believing a raw Pearson r. */
  def qPartialCorr(spark: SparkSession, dir: String): DataFrame = {
    val d = TextAnalysis.withStats(Tables(spark, dir).documents)
    Evaluation.partialCorr(d.select(col("lang").as("group"),
      round(col("quality_score") * 1e6, 0).cast("long").as("x"),
      col("n_chars").cast("long").as("y"),
      col("n_tokens").cast("long").as("z")))
  }

  /** Yule's K lexical repetitiveness per source — the
    * sample-size-invariant "small vocabulary worked hard" corpus
    * diagnostic beside [[qVocabRichness]]'s coverage estimators. */
  def qYulesK(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.yulesK(Tables(spark, dir).documents)

  /** Cliff's delta of the quality score between the ' the ' arms per
    * language — the ordinal effect SIZE beside [[qMannWhitney]]'s
    * significance z, finished from the same rank state. */
  def qCliffsDelta(spark: SparkSession, dir: String): DataFrame = {
    val d = TextAnalysis.withStats(Tables(spark, dir).documents)
    Evaluation.cliffsDelta(d.select(col("lang").as("group"),
      lower(col("text")).like("% the %").cast("long").as("arm"),
      round(col("quality_score") * 1e6, 0).cast("long").as("v_micro")))
  }

  /** Hosmer–Lemeshow goodness-of-fit on the stopword-share
    * pseudo-probability vs the ' the ' label — the χ²-shaped
    * significance companion of [[qEvalCalibration]]'s ECE and
    * [[qBrierDecomp]]'s reliability, a FOURTH finish over the same
    * binned calibration state. */
  def qHosmerLemeshow(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    val hits = size(filter(toks,
      t => t.isin(TextAnalysis.EnStop.map(x => lit(x)): _*)))
    val preds = Tables(spark, dir).documents.select(
      least(lit(1000000L), hits.cast("long") * 125000L).as("p_micro"),
      when(lower(col("text")).like("% the %"), 1L).otherwise(0L).as("y"))
    Evaluation.hosmerLemeshow(preds, bins = 10)
  }

  /** ICC(2,1) over the five event types as "raters" scoring per-user
    * activity — the continuous-score absolute-agreement companion of
    * [[qCronbachAlpha]] (same complete panel, a different question:
    * consistency of the SCALE vs agreement of the RATERS). */
  def qIcc(spark: SparkSession, dir: String): DataFrame = {
    val activity = Tables(spark, dir).events.groupBy(
        col("user_id").as("subject"), col("event_type").as("rater"))
      .agg(count(lit(1)).as("score"))
    Evaluation.icc21(activity.select(lit("all").as("group"),
      col("subject"), col("rater"), col("score")))
  }

  /** Wald–Wolfowitz runs test on each event type's daily series —
    * does the above/below-median sign pattern clump (regimes) or
    * alternate (flapping)? The sign-pattern randomness check beside
    * [[qCusum]]/[[qPageHinkley]]/[[qChangepoint]]'s level shifts. */
  def qRunsTest(spark: SparkSession, dir: String): DataFrame =
    Timeseries.runsTest(Tables(spark, dir).events)

  /** Quantile-normalize the quality score across sources — each
    * source's score distribution mapped onto the pooled one, so one
    * global threshold treats differently-calibrated sources fairly. */
  def qQuantileNorm(spark: SparkSession, dir: String): DataFrame = {
    val d = TextAnalysis.withStats(Tables(spark, dir).documents)
    Curation.quantileNormalize(d.select(lit("all").as("group"),
      col("source"),
      round(col("quality_score") * 1e6, 0).cast("long").as("v")))
  }
}
