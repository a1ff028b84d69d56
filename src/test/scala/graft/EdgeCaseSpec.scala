package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sql.BigQueryDialect

/** Defensive edge cases: translator parsing, empty inputs through the
  * operators, degenerate shapes. */
class EdgeCaseSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  test("dialect: nested parens and commas inside strings survive") {
    val t = BigQueryDialect.translate(
      "select date_diff(coalesce(a, b, date('2020-01-01')), least(c, d), year) from t")
    assert(t.contains("(year(coalesce(a, b, date('2020-01-01'))) - year(least(c, d)))"))
    val t2 = BigQueryDialect.translate(
      "select regexp_contains(concat(a, ', ', b), 'x,y') from t")
    assert(t2.contains("(concat(a, ', ', b) RLIKE 'x,y')"))
    // function-name suffix must not match (aregexp_contains is untouched)
    val t3 = BigQueryDialect.translate("select aregexp_contains(x, y) from t")
    assert(t3.contains("aregexp_contains(x, y)"))
  }

  test("as-of join with empty right side keeps all left rows unmatched") {
    val l = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L))
      .toDF("k", "l_ts", "l_id")
    val r = Seq.empty[(Long, java.sql.Timestamp)].toDF("rk", "r_ts")
    val out = graft.plans.AsofJoin.asofJoin(l, r, Seq("k"), Seq("rk"), "l_ts", "r_ts")
    assert(out.count() == 1)
    assert(out.filter(col("r_ts").isNull).count() == 1)
  }

  test("as-of join: null keys and null timestamps never match (SQL ASOF semantics)") {
    val ts = java.sql.Timestamp.valueOf(_: String)
    val l = Seq(
      (Option(1L), Option(ts("2024-01-01 10:00:00")), 1L),   // normal: matches
      (None,       Option(ts("2024-01-01 10:00:00")), 2L),   // null key
      (Option(1L), None,                              3L))   // null ts
      .toDF("k", "l_ts", "l_id")
    val r = Seq(
      (Option(1L), Option(ts("2024-01-01 09:00:00")), 10L),
      (None,       Option(ts("2024-01-01 09:00:00")), 11L),  // null key: never a candidate
      (Option(1L), None,                              12L))  // null ts: never a candidate
      .toDF("rk", "r_ts", "r_id")
    val out = graft.plans.AsofJoin.asofJoin(l, r, Seq("k"), Seq("rk"), "l_ts", "r_ts")
      .select("l_id", "r_id").as[(Long, Option[Long])].collect().toMap
    assert(out(1L).contains(10L), s"normal row should match r_id 10: $out")
    assert(out(2L).isEmpty, s"null-key left row must be unmatched: $out")
    assert(out(3L).isEmpty, s"null-ts left row must be unmatched: $out")
  }

  test("isTestUser is false (not null) when name/email are null") {
    val df = Seq(
      (Some("test"), Some("x"), Some("a@b.com")),
      (None: Option[String], None: Option[String], None: Option[String]),
      (Some("alice"), None: Option[String], None: Option[String]))
      .toDF("fn", "ln", "em")
      .select(graft.functions.BqFunctions.isTestUser(col("fn"), col("ln"), col("em")).as("t"))
    val vals = df.as[Boolean].collect().toSeq   // would throw on NULL boolean
    assert(vals == Seq(true, false, false), s"got $vals")
  }

  test("dedup operators on empty and single-doc inputs") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(graft.ext.Dedup.exactGroups(empty).count() == 0)
    assert(graft.ext.Dedup.minhashSignatures(empty).count() == 0)
    val single = Seq((1L, "one two three four")).toDF("doc_id", "text")
    assert(graft.ext.Dedup.lshCandidates(
      graft.ext.Dedup.minhashSignatures(single)).count() == 0)
    val short = Seq((1L, "ab")).toDF("doc_id", "text") // <3 tokens: no shingles
    assert(graft.ext.Dedup.wordTrigrams(short).count() == 0)
    // round 16: conversation dedup and the budget allocator on empty
    // input; a <3-turn conversation yields no turn trigrams -> no pairs
    assert(graft.ext.Dedup.conversationNearDups(empty).count() == 0)
    assert(graft.ext.Dedup.conversationNearDups(
      Seq((1L, "a b c d"), (2L, "a b c d")).toDF("doc_id", "text"),
      threshold = 0.0, turnTokens = 2).count() == 0)
    val emptySrc = Seq.empty[(Long, String, String)]
      .toDF("doc_id", "source", "text")
    assert(graft.ext.Curation.tokenBudgetAllocate(emptySrc, 100L)
      .count() == 0)
    assert(graft.ext.Curation.tokenBudgetSample(emptySrc, 100L)
      .count() == 0)
    assert(graft.ext.Dedup.turnRepetition(empty).count() == 0)
    // a whitespace-only doc has zero turns and must not divide by it
    val blank = graft.ext.Dedup.turnRepetition(
      Seq((5L, "  ")).toDF("doc_id", "text")).collect().head
    assert(blank.getAs[Int]("n_turns") == 0 &&
      blank.getAs[Double]("repeat_frac") == 0.0)
  }

  test("connected components on empty pair list") {
    val empty = Seq.empty[(Long, Long)].toDF("a_id", "b_id")
    assert(graft.ext.Dedup.connectedComponents(empty).count() == 0)
  }

  test("ANN edge cases: single-cluster IVF, tiny-corpus PQ, indivisible dims") {
    import graft.ext.Similarity
    def emb(n: Int, dim: Int) = (0 until n).map(i =>
      (i.toLong, (0 until dim).map(d => (i * dim + d + 1).toFloat / 100).toArray))
      .toDF("vec_id", "embedding")
    // nClusters = 1: the greatest() guard routes everything to cluster 0
    val one = Similarity.ivfFlatTopK(emb(6, 8), k = 3, numQueries = 2,
      nprobe = 1, nClusters = 1)
    assert(one.groupBy("query_id").count().select("count")
      .as[Long].collect().forall(_ == 3L))
    // corpus smaller than ks: codebook shrinks to the corpus, codes stay valid
    val tiny = Similarity.pqEncode(emb(5, 8), m = 2, ks = 16)
    assert(tiny.count() == 5)
    val codes = tiny.select("c0", "c1").as[(Int, Int)].collect()
    assert(codes.forall { case (a, b) => a >= 0 && a < 5 && b >= 0 && b < 5 })
    // dim not divisible by m is rejected loudly, not silently truncated
    val err = intercept[IllegalArgumentException] {
      Similarity.pqEncode(emb(5, 10), m = 4, ks = 4)
    }
    assert(err.getMessage.contains("subspaces"))
  }

  test("round-8 operators tolerate empty and degenerate inputs") {
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val emptyEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(graft.operators.Graph.pageRank(emptyEdges).count() == 0)
    assert(graft.ext.Dedup.passageDedup(emptyDocs).count() == 0)
    assert(graft.ext.Dedup.duplicateSpans(emptyDocs).count() == 0)
    assert(graft.ext.Dedup.corpusDiff(emptyDocs, emptyDocs).count() == 0)
    // index dedup with an empty index keeps batch-internal semantics
    val batch = Seq((1L, "a"), (2L, "a")).toDF("doc_id", "text")
    val emptyIdx = Seq.empty[(String, Long)].toDF("fingerprint", "keeper_id")
    val st = graft.ext.Dedup.dedupAgainstIndex(batch, emptyIdx)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(st == Map(1L -> "kept", 2L -> "dup_batch"))
    // all-zero weights: acceptance rate is null/0 everywhere -> empty
    val zw = Seq((1L, 0.0), (2L, 0.0)).toDF("doc_id", "w")
    assert(graft.ext.Curation.weightedSample(zw, 0.5, weightCol = "w").count() == 0)
    // single-token docs have no bigrams
    val one = Seq((1L, "solo")).toDF("doc_id", "text")
    assert(graft.ext.Curation.bigramLogProb(one).count() == 0)
  }

  test("late round-8 operators tolerate empty and degenerate inputs") {
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val emptyEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(graft.ext.Dedup.winnowFingerprints(emptyDocs).count() == 0)
    assert(graft.ext.Dedup.prefixJaccardJoin(emptyDocs).count() == 0)
    assert(graft.ext.Curation.epochShuffle(emptyDocs).count() == 0)
    assert(graft.ext.TextAnalysis.bpeTrain(emptyDocs).count() == 0)
    assert(graft.operators.Graph.textRank(emptyDocs).count() == 0)
    assert(graft.operators.Graph.labelPropagation(emptyEdges).count() == 0)
    val tri = graft.operators.Graph.triangleCount(emptyEdges)
      .as[(Long, Long, Long)].head()
    assert(tri == ((0L, 0L, 0L)), s"empty graph must count zeros: $tri")
    // docs shorter than k+w-1 yield no winnowing windows; short docs
    // yield no shingles for the prefix join
    val short = Seq((1L, "a b c"), (2L, "x y")).toDF("doc_id", "text")
    assert(graft.ext.Dedup.winnowFingerprints(short).count() == 0)
    assert(graft.ext.Dedup.prefixJaccardJoin(short).count() == 0)
    // self-loop-only graph: no labels to propagate, no triangles
    val loops = Seq((5L, 5L)).toDF("src", "dst")
    assert(graft.operators.Graph.labelPropagation(loops).count() == 0)
    assert(graft.operators.Graph.triangleCount(loops)
      .as[(Long, Long, Long)].head() == ((0L, 0L, 0L)))
    // empty-corpus guards (each used to throw): bm25 stats row, IVF-PQ
    // seed collect, centroid fit
    assert(graft.ext.TextAnalysis.bm25TopK(emptyDocs, Seq("spark")).count() == 0)
    val emptyEmb = Seq.empty[(Long, Seq[Float], Int)]
      .toDF("vec_id", "embedding", "label")
    assert(graft.ext.Similarity.ivfPqTopK(emptyEmb).count() == 0)
    assert(graft.ext.Similarity.centroidClassify(emptyEmb).count() == 0)
    // every id on the test split -> no train rows -> empty confusion
    val allTest = Seq((0L, Seq(1.0f, 0f), 0), (5L, Seq(0f, 1.0f), 1))
      .toDF("vec_id", "embedding", "label")
    assert(graft.ext.Similarity.centroidClassify(allTest, trainMod = 5).count() == 0)
    // string-id pair list under the collect threshold must take the
    // type-preserving distributed CC path, not the long fast path
    val strPairs = Seq(("fp-a", "fp-b"), ("fp-b", "fp-c")).toDF("a", "b")
    val cc = graft.ext.Dedup.connectedComponents(strPairs, "a", "b")
      .as[(String, String)].collect().toMap
    assert(cc.values.toSet == Set("fp-a"), s"one component rooted at min id: $cc")
  }

  test("round-9 operators tolerate empty and degenerate inputs") {
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val someDocs = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    // DSIR: empty raw -> empty sample; empty target still scores
    // (pure raw-LM surprise, tc=0 smoothing everywhere)
    assert(graft.ext.Curation.dsirSample(emptyDocs, someDocs).count() == 0)
    assert(graft.ext.Curation.dsirSample(someDocs, emptyDocs).count() == 1)
    assert(graft.ext.Curation
      .dsirScore(emptyDocs, graft.ext.Curation.dsirModel(someDocs, someDocs))
      .count() == 0)
    // perplexity buckets: empty corpus and no-bigram corpus both empty
    val emptySrc = Seq.empty[(Long, String, String)]
      .toDF("doc_id", "text", "source")
    assert(graft.ext.Curation.perplexityBuckets(emptySrc).count() == 0)
    val solo = Seq((1L, "solo", "a")).toDF("doc_id", "text", "source")
    assert(graft.ext.Curation.perplexityBuckets(solo).count() == 0)
    // RRF: single list is an identity re-rank
    val one = Seq((7L, 1), (8L, 2)).toDF("item_id", "rank")
    val rrf = graft.ext.TextAnalysis.rrfFuse(Seq(one))
      .select("item_id", "rank").as[(Long, Int)].collect().toSet
    assert(rrf == Set((7L, 1), (8L, 2)), s"single-list RRF is identity: $rrf")
    // cross-corpus near-dups: either side empty -> no pairs
    assert(graft.ext.Dedup.crossNearDups(emptyDocs, someDocs).count() == 0)
    assert(graft.ext.Dedup.crossNearDups(someDocs, emptyDocs).count() == 0)
  }

  test("round-10 operators tolerate empty and degenerate inputs") {
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val emptyKeys = Seq.empty[Tuple1[String]].toDF("key")
    // sketches on empty corpora: empty tables, never errors
    assert(graft.ext.Sketches.cmsBuild(emptyKeys).count() == 0)
    assert(graft.ext.Sketches.cmsHeavyHitters(emptyDocs).count() == 0)
    assert(graft.ext.Sketches.bloomBuild(emptyKeys).count() == 0)
    // probing an EMPTY bloom: everything is definitively absent
    val probes = Seq("a", "b").map(Tuple1(_)).toDF("key")
    val pr = graft.ext.Sketches
      .bloomProbe(graft.ext.Sketches.bloomBuild(emptyKeys), probes)
      .as[(String, Boolean)].collect().toMap
    assert(pr == Map("a" -> false, "b" -> false))
    // HLL of an empty group stream: no rows (no groups exist)
    assert(graft.ext.Sketches.hllDistinctBy(
      Seq.empty[(String, String)].toDF("grp", "key"), "grp").count() == 0)
    // entity resolution: empty record set, and records with NO digits
    assert(graft.ext.EntityResolution.resolve(
      Seq.empty[(Long, String)].toDF("record_id", "name")).count() == 0)
    val noKey = Seq((1L, "alpha"), (2L, "alpha")).toDF("record_id", "name")
    val erNk = graft.ext.EntityResolution.resolve(noKey)
      .as[(Long, Long)].collect().toMap
    assert(erNk == Map(1L -> 1L, 2L -> 2L),
      "records without a strong key must stay singletons")
    // kCore: empty edge list, and k beyond the densest subgraph
    assert(graft.operators.Graph.kCore(
      Seq.empty[(Long, Long)].toDF("src", "dst")).count() == 0)
    assert(graft.operators.Graph.kCore(
      Seq((1L, 2L)).toDF("src", "dst"), k = 5).count() == 0)
    // MMR with k beyond the candidate count: returns all candidates
    val cands = Seq((1L, 10L, 900000L), (1L, 11L, 500000L))
      .toDF("query_id", "cid", "rel_micro")
    val sims = Seq((1L, 10L, 11L, 100000L), (1L, 11L, 10L, 100000L))
      .toDF("query_id", "a", "b", "sim_micro")
    val picks = graft.ext.Similarity.mmrSelect(cands, sims, k = 5)
    assert(picks.count() == 2, "k beyond candidates returns what exists")
    // KN bigram on a corpus with no bigrams at all
    assert(graft.ext.Curation.knBigramTable(
      Seq((1L, "word")).toDF("doc_id", "text")).count() == 0)
    // skew report on a single-key table: share 100%, entropy 0
    val sk = graft.ext.Profiler.skewReport(
      Seq("x", "x").map(Tuple1(_)).toDF("k"), "k").collect()(0)
    assert(sk.getAs[Long]("hot_share_micro") == 1000000L)
    assert(sk.getAs[Long]("entropy_micro") == 0L)
  }

  test("incremental merge bootstrap from empty batch sequence") {
    val path = java.nio.file.Files.createTempDirectory("graft-edge").toString + "/t"
    val b = Seq((1L, "x")).toDF("id", "v")
    val r1 = graft.model.Incremental.merge(spark, b, path, Seq("id"))
    assert(r1.count() == 1)
    // idempotent re-merge of identical batch
    val r2 = graft.model.Incremental.merge(spark, b, path, Seq("id"))
    assert(r2.count() == 1)
  }

  test("round-11 operators tolerate empty and degenerate inputs") {
    import graft.ext._
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    // blocklist on empty corpus and on empty-string text
    assert(TextAnalysis.blocklistScreen(emptyDocs, Seq("x")).count() == 0)
    val es = TextAnalysis.blocklistScreen(Seq((1L, "")).toDF("doc_id", "text"),
      Seq("x")).select("n_matches", "keep").as[(Int, Boolean)].head()
    assert(es == ((0, true)))
    // pattern longer than text
    val long = TextAnalysis.blocklistScreen(
      Seq((1L, "ab")).toDF("doc_id", "text"), Seq("abc"))
      .select("keep").as[Boolean].head()
    assert(long)
    // JL rerank with queries ∌ corpus split degenerate: 1-row corpus
    val one = Seq((0L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
    assert(Similarity.jlTopK(one, k = 3, numQueries = 1, outDim = 2,
      shortlist = 4).count() == 0) // only self, excluded
    // FreqItemsAgg over all-null items and an empty group result
    val nulls = Seq(("g", null.asInstanceOf[String]), ("g", null.asInstanceOf[String]))
      .toDF("g", "item")
    val fi = nulls.groupBy("g")
      .agg(graft.expressions.FreqItemsAgg.freqItems(col("item"), 4, 4).as("t"))
      .select(size(col("t"))).as[Int].head()
    assert(fi == 0, "null items must not enter the summary")
    // aggRefresh: empty batch folds leave state unchanged
    val path = java.nio.file.Files.createTempDirectory("graft-edge-ar").toString + "/t"
    val ev = Seq((1L, "a", 5.0, 10L), (2L, "a", 7.0, 11L))
      .toDF("event_id", "k", "value", "uid")
    val first = graft.model.Incremental.aggRefresh(spark, ev, path, "k",
      round(col("value") * 100, 0), col("uid")).collect()
    val afterEmpty = graft.model.Incremental.aggRefresh(spark,
      ev.filter(col("event_id") < 0), path, "k",
      round(col("value") * 100, 0), col("uid")).collect()
    assert(first.toSet == afterEmpty.toSet,
      "empty fold must be a no-op on the rollup")
    // URL canonicalization survives a non-URL string (no scheme)
    val odd = WebOps.urlScreen(Seq((1L, "not a url at all")).toDF("doc_id", "url"))
      .select("canon_url").as[String].head()
    assert(odd == "not a url at all")
  }

  test("round-11 eval/retrieval operators tolerate empty and degenerate inputs") {
    import graft.ext._
    // Bradley–Terry: no comparisons at all → empty, not a crash
    val noDuels = Seq.empty[(String, String)].toDF("winner", "loser")
    assert(Preferences.bradleyTerry(noDuels).count() == 0)
    // only self-duels (dropped) behave as empty too
    val selfOnly = Seq(("a", "a"), ("b", "b")).toDF("winner", "loser")
    assert(Preferences.bradleyTerry(selfOnly).count() == 0)
    // calibration: empty predictions → empty table (no 0/0 rows)
    val noPreds = Seq.empty[(Long, Long)].toDF("p_micro", "y")
    assert(Evaluation.calibration(noPreds).count() == 0)
    // kappa: a single annotation pair still yields a defined row
    val one = Seq(("g", "x", "x")).toDF("group", "label_a", "label_b")
    val k1 = Evaluation.cohenKappa(one)
      .select("po", "pe", "kappa").as[(Double, Double, Double)].head()
    assert(k1 == ((1.0, 1.0, 0.0)), s"constant single pair: $k1")
    // corpusDrift: empty corpus → empty report
    val emptySrc = Seq.empty[(Long, String, String)]
      .toDF("doc_id", "text", "source")
    assert(Curation.corpusDrift(emptySrc).count() == 0)
    // rougeN: pair ids present on only one side are not scored
    val c = Seq((1L, "a b c")).toDF("pair_id", "text")
    val r = Seq((2L, "a b c")).toDF("pair_id", "text")
    assert(TextAnalysis.rougeN(c, r).count() == 0)
    // vocabRichness: all-singleton source (F2 = 0) stays finite
    val sing = Seq((1L, "alpha beta gamma", "s")).toDF("doc_id", "text", "source")
    val v = TextAnalysis.vocabRichness(sing)
      .select("f1", "f2", "chao1").as[(Long, Long, Double)].head()
    assert(v._1 == 3L && v._2 == 0L && v._3 == 6.0, s"chao1 V+F1(F1-1)/2: $v")
    // Holt: empty events → empty forecast; HITS: empty edges → empty
    val noEvents = Seq.empty[(Long, java.sql.Timestamp, String)]
      .toDF("event_id", "ts", "event_type")
    assert(Timeseries.holtForecast(noEvents).count() == 0)
    val noEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(graft.operators.Graph.hits(noEdges).count() == 0)
    // modularity of an empty assignment over empty edges
    assert(graft.operators.Graph.modularity(noEdges,
      Seq.empty[(Long, Long)].toDF("node", "label")).count() == 0)
    // embedding drift over an empty corpus
    assert(Similarity.embedDrift(Seq.empty[(Long, Array[Float], Int)]
      .toDF("vec_id", "embedding", "label")).count() == 0)
  }

  test("eval/drift/link-prediction operators tolerate empty and degenerate inputs") {
    import graft.ext._
    val noScores = Seq.empty[(String, Long, Long)]
      .toDF("group", "score_micro", "y")
    assert(Evaluation.aucRoc(noScores).count() == 0)
    // a group whose every score ties collapses to one cell — still 0.5
    val allTied = Seq(("g", 5L, 1L), ("g", 5L, 0L), ("g", 5L, 1L))
      .toDF("group", "score_micro", "y")
    assert(Evaluation.aucRoc(allTied).select("auc").as[Double].head() == 0.5)
    // fleiss: every item single-rated → the group itself vanishes
    val singles = Seq(("g", 1L, "a"), ("g", 2L, "b")).toDF("group", "item", "cat")
    assert(Evaluation.fleissKappa(singles).count() == 0)
    val noRatings = Seq.empty[(String, Long, String)].toDF("group", "item", "cat")
    assert(Evaluation.fleissKappa(noRatings).count() == 0)
    // KS with both sides empty → empty; PSI with both empty → empty
    val noVals = Seq.empty[(String, Long)].toDF("group", "v")
    assert(Evaluation.ksTest(noVals, noVals).count() == 0)
    val noP = Seq.empty[(String, Long)].toDF("group", "p_micro")
    assert(Evaluation.psi(noP, noP).count() == 0)
    // PSI with an empty CURRENT side still reports the full bin grid
    // (a vanished stream IS drift — smoothing keeps every term finite)
    val basePs = Seq(("g", 150000L)).toDF("group", "p_micro")
    val drained = Evaluation.psi(basePs, noP)
      .select("psi_micro").distinct().as[Long].collect()
    assert(drained.length == 1, s"one summary per group: ${drained.toSeq}")
    // BLEU: empty pairing → zero counts, bleu 0, bp 1 (c_len 0 contract)
    val noPairs = Seq.empty[(Long, String)].toDF("pair_id", "text")
    val b = TextAnalysis.corpusBleu(noPairs, noPairs)
      .select("n_pairs", "c_len", "bp", "bleu")
      .as[(Long, Long, Double, Double)].head()
    assert(b == ((0L, 0L, 1.0, 0.0)), s"empty BLEU: $b")
    // adamicAdar: empty edges and a graph with no shared neighbors
    val noEdges2 = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(graft.operators.Graph.adamicAdar(noEdges2).count() == 0)
    val lone = Seq((1L, 2L)).toDF("src", "dst")
    assert(graft.operators.Graph.adamicAdar(lone).count() == 0)
    // chiSquare: empty labels → empty; single row → dof 0, V 0
    val noLabels = Seq.empty[(String, String, String)]
      .toDF("group", "label_a", "label_b")
    assert(Evaluation.chiSquare(noLabels).count() == 0)
    // personalizedPageRank: empty seeds → empty ranks (nothing to
    // personalize toward), seeds disjoint from the graph keep reset
    val someEdges = Seq((1L, 2L)).toDF("src", "dst")
    assert(graft.operators.Graph.personalizedPageRank(someEdges,
      Seq.empty[Long].toDF("node")).count() == 0)
    val orphanSeed = graft.operators.Graph.personalizedPageRank(
        someEdges, Seq(99L).toDF("node"))
      .as[(Long, Long)].collect().toMap
    assert(orphanSeed == Map(99L -> 150000L),
      s"orphan seed keeps its reset mass: $orphanSeed")
    graft.ext.Checkpoints.releaseAll(spark)
  }

  test("periodogram/zipf/benford/leakage/containment tolerate empty and degenerate inputs") {
    import graft.ext._
    val noEvents = Seq.empty[(Long, java.sql.Timestamp, String)]
      .toDF("event_id", "ts", "event_type")
    assert(Timeseries.periodogram(noEvents).count() == 0)
    // single-day series: every residual is 0 — all powers 0, no NaN
    val oneDay = Seq((1L,
      java.sql.Timestamp.valueOf("2026-03-01 00:00:00"), "view"))
      .toDF("event_id", "ts", "event_type")
    val p1 = Timeseries.periodogram(oneDay, minPeriod = 2, maxPeriod = 3)
      .select("power_micro").as[Long].collect()
    assert(p1.nonEmpty && p1.forall(_ == 0L), s"one-day: ${p1.toSeq}")
    val noDocs = Seq.empty[(Long, String, String)]
      .toDF("doc_id", "text", "source")
    assert(TextAnalysis.zipfSlope(noDocs).count() == 0)
    assert(Profiler.benford(
      Seq.empty[(String, java.lang.Long)].toDF("group", "cents"),
      "cents").count() == 0)
    // leakage split with no candidates degrades to plain hashSplit
    val ids = Seq(4L, 7L).toDF("doc_id")
    val ls = Curation.leakageSafeSplit(ids,
        Seq.empty[(Long, Long)].toDF("a_id", "b_id"))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val hs = Curation.hashSplit(ids).select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    assert(ls == hs, s"no-candidate split must equal hashSplit: $ls vs $hs")
    // containment over an empty corpus and an all-short corpus
    assert(Dedup.containmentJoin(noDocs.select("doc_id", "text")).count() == 0)
    assert(Dedup.containmentJoin(
      Seq((1L, "a b"), (2L, "a")).toDF("doc_id", "text")).count() == 0)
    graft.ext.Checkpoints.releaseAll(spark)
  }

  test("round-12 operators tolerate empty and degenerate inputs") {
    import graft.ext.Dedup
    import graft.model.Incremental
    // bucketCap = 1: every bucket keeps one id — no pairs can form
    val dups = Seq((1L, "same exact words here now"), (2L, "same exact words here now"))
      .toDF("doc_id", "text")
    assert(Dedup.lshCandidates(Dedup.minhashSignatures(dups),
      bucketCap = 1).count() == 0)
    // guarded CDC: first batch may contain deletes for unseen keys —
    // they become tombstones, the live view is empty for those keys
    val tmp = java.nio.file.Files.createTempDirectory("graft-edge-cdc").toString + "/t"
    Incremental.applyChangesGuarded(spark,
      Seq((1L, "x", "D", 5L), (2L, "a", "I", 1L)).toDF("id", "v", "op", "seq"),
      tmp, Seq("id"))
    val live = Incremental.readCdcTable(spark, tmp)
      .select("id", "v").as[(Long, String)].collect().toMap
    assert(live == Map(2L -> "a"), s"$live")
    // ...and the tombstone still guards: a later lower-seq insert loses
    Incremental.applyChangesGuarded(spark,
      Seq((1L, "resurrect", "I", 3L)).toDF("id", "v", "op", "seq"),
      tmp, Seq("id"))
    assert(!Incremental.readCdcTable(spark, tmp)
      .select("id").as[Long].collect().contains(1L))
    // vincenty: antipodal-ish pair stays finite and deterministic
    val d = graft.expressions.VincentyDistance.meters(0.0, 0.0, 0.5, 179.7)
    assert(d.isFinite && d > 1.9e7 && d < 2.1e7, s"antipodal-ish: $d")
    // novelty: empty corpus and a single doc (all grams unique → 1.0)
    val noDocs2 = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(graft.ext.Curation.noveltyScore(noDocs2).count() == 0)
    val solo = graft.ext.Curation.noveltyScore(
      Seq((1L, "a b c d")).toDF("doc_id", "text"))
      .select("novelty").as[Double].collect()
    assert(solo.toSeq == Seq(1.0), s"solo doc: ${solo.toSeq}")
    // fertility: empty group table → no rows; zero-char docs never
    // occur (length >= 1 for any non-empty string) but a whitespace
    // doc still has chars, so the division is safe
    assert(graft.ext.Curation.tokenFertility(
      Seq.empty[(Long, String, String)].toDF("doc_id", "lang", "text")).count() == 0)
    // minhash band index probe with an all-short batch (no signatures)
    val idxTmp = java.nio.file.Files.createTempDirectory("graft-edge-mh").toString
    graft.operators.MinHashBandIndex.writeIndex(dups, "edge_mh_idx", idxTmp + "/i")
    try {
      assert(graft.operators.MinHashBandIndex.probe(spark, "edge_mh_idx",
        Seq((9L, "ab")).toDF("doc_id", "text")).count() == 0)
    } finally spark.sql("DROP TABLE IF EXISTS edge_mh_idx")
    graft.ext.Checkpoints.releaseAll(spark)
  }

  test("round-13 operators tolerate empty and degenerate inputs") {
    import graft.ext.{Evaluation, TextAnalysis, EntityResolution, Curation}
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextAnalysis.rakeKeyphrases(noDocs).count() == 0)
    // an all-stopword doc yields NO candidate phrases (not a crash,
    // not an empty-string phrase)
    assert(TextAnalysis.rakeKeyphrases(
      Seq((1L, "the of and a")).toDF("doc_id", "text")).count() == 0)
    // a doc with no stopwords is one whole-doc phrase
    val whole = TextAnalysis.rakeKeyphrases(
      Seq((1L, "spark catalyst optimizer")).toDF("doc_id", "text"))
      .select("phrase").as[String].collect()
    assert(whole.toSeq == Seq("spark catalyst optimizer"))
    // rank correlation: single-row group → ρ and τ guard to 0
    val single = Seq(("g", 1L, 5L, 7L)).toDF("grp", "id", "x", "y")
    val rc = Evaluation.rankCorrelation(single, "grp", "id", "x", "y")
      .select("spearman_rho", "kendall_tau_b").as[(Double, Double)].head()
    assert(rc == ((0.0, 0.0)), s"$rc")
    assert(Evaluation.rankCorrelation(
      Seq.empty[(String, Long, Long, Long)].toDF("grp", "id", "x", "y"),
      "grp", "id", "x", "y").count() == 0)
    // abTest: empty input → no groups; all-converting arms → se=0 → z=0
    assert(Evaluation.abTest(
      Seq.empty[(String, Long, Long)].toDF("grp", "arm", "conv"),
      "grp", "arm", "conv").count() == 0)
    val allConv = Seq(("m", 0L, 1L), ("m", 1L, 1L)).toDF("grp", "arm", "conv")
    assert(Evaluation.abTest(allConv, "grp", "arm", "conv")
      .head().getAs[Double]("z") == 0.0)
    // classification report on an empty confusion table
    assert(Evaluation.classificationReport(
      Seq.empty[(Long, Long, Long)].toDF("label", "pred_label", "n"))
      .count() == 0)
    // LR training on an empty corpus: empty weight table, step 1
    val (we, sde) = Curation.trainQualityLr(
      Seq.empty[(Long, String, Long)].toDF("doc_id", "text", "y"), "y",
      iters = 2)
    assert(we.count() == 0 && sde == 1L)
    // readability / mixDiversity on empty inputs
    assert(TextAnalysis.readability(noDocs).count() == 0)
    assert(Curation.mixDiversity(
      Seq.empty[(Long, String)].toDF("doc_id", "source")).count() == 1)
    // FS: a block entirely above maxBlock produces no pairs
    val big = (1 to 5).map(i => (i.toLong, "b", s"name$i", "s", "p"))
      .toDF("record_id", "blk", "name", "segment", "phone")
    assert(EntityResolution.fellegiSunter(big, "blk",
      graft.ext.ExtQueries.fsFields, 8000000L, 0L, maxBlock = 2)
      .count() == 0)
    graft.ext.Checkpoints.releaseAll(spark)
  }

  test("round-13 continuation operators tolerate empty and degenerate inputs") {
    import graft.ext.{Evaluation, Curation, Similarity, Timeseries}
    // paired tests: empty input → no groups
    val noPaired = Seq.empty[(String, Boolean, Boolean, Boolean)]
      .toDF("group", "y", "pred_a", "pred_b")
    assert(Evaluation.mcnemar(noPaired).count() == 0)
    assert(Evaluation.fairnessReport(
      Seq.empty[(String, Boolean, Boolean)].toDF("group", "y", "pred"))
      .count() == 0)
    assert(Evaluation.delongTest(
      Seq.empty[(String, Long, Long, Long)]
        .toDF("group", "y", "score_a_micro", "score_b_micro")).count() == 0)
    // conformal with NO test rows: the calibrated threshold row
    // SURVIVES the empty test split (left-join-to-test shape) with
    // n_test=0, n_cov=0, coverage=null — a live gate monitor keeps
    // its threshold during a lull in held-out traffic
    val calOnly = Evaluation.conformalThreshold(
      Seq(("g", "cal", 100L)).toDF("group", "split", "s_micro")).head()
    // n=1 → k=2 > n: the tiny-set convention pins the threshold at
    // the domain max — the point is the ROW survives, not its value
    assert(calOnly.getAs[Long]("threshold_micro") == 1000000L)
    assert(calOnly.getAs[Long]("n_test") == 0L)
    assert(calOnly.getAs[Long]("n_cov") == 0L)
    assert(calOnly.isNullAt(calOnly.fieldIndex("coverage")))
    // …and no CAL rows: no thresholds, nothing to cover
    assert(Evaluation.conformalThreshold(
      Seq(("g", "test", 100L)).toDF("group", "split", "s_micro"))
      .count() == 0)
    // interval alpha: every unit single-rating → no qualifying items
    assert(Evaluation.krippendorffAlphaInterval(
      Seq(("g", 1L, 3L), ("g", 2L, 4L)).toDF("group", "item", "v"))
      .count() == 0)
    // confident learning: empty scores, and a class with no
    // self-labeled examples (no threshold) simply never predicts
    assert(Curation.confidentJoint(
      Seq.empty[(Long, String, String, Long)]
        .toDF("doc_id", "noisy", "cls", "p_micro")).count() == 0)
    val noSelf = Seq((1L, "a", "a", 900000L), (1L, "a", "b", 100000L))
      .toDF("doc_id", "noisy", "cls", "p_micro") // nobody labeled b
    val cj = Curation.confidentJoint(noSelf).collect()
      .map(r => r.getAs[String]("pred")).toSet
    assert(cj == Set("a"), s"$cj")
    // distinct-n: empty corpus and a doc shorter than every n
    assert(Curation.distinctNgrams(
      Seq.empty[(String, String)].toDF("source", "text")).count() == 0)
    // fd discovery: all-null column still profiles (sentinel value)
    val nulls = Seq((1L, null.asInstanceOf[String]),
      (2L, null.asInstanceOf[String])).toDF("k", "v")
    val fd = Curation.fdDiscovery(nulls, Seq("k", "v")).collect()
      .map(r => (r.getAs[String]("lhs"), r.getAs[Boolean]("holds"))).toMap
    assert(fd == Map("k" -> true, "v" -> false), s"$fd")
    // forecasting: empty events → no series; cartography on an empty
    // corpus → no rows (the trainer divides by a zero feature mass
    // only through the guarded stepDiv)
    val noEvents = Seq.empty[(Long, Long, java.sql.Timestamp, String)]
      .toDF("user_id", "event_id", "ts", "event_type")
    assert(Timeseries.holtWintersForecast(noEvents).count() == 0)
    assert(Timeseries.forecastBacktest(noEvents).count() == 0)
    assert(Curation.lrCartography(
      Seq.empty[(Long, String, Long)].toDF("doc_id", "text", "y"), "y",
      iters = 2).count() == 0)
    // graph: empty edges and an all-self-loop graph predict nothing
    assert(graft.operators.Graph.jaccardLinks(
      Seq.empty[(Long, Long)].toDF("src", "dst")).count() == 0)
    assert(graft.operators.Graph.jaccardLinks(
      Seq((1L, 1L), (2L, 2L)).toDF("src", "dst")).count() == 0)
    // embeddings: a single vector has zero variance everywhere
    val solo = Seq((1L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
    assert(Similarity.effectiveRank(solo).head()
      .getAs[Double]("eff_rank") == 0.0)
    graft.ext.Checkpoints.releaseAll(spark)
  }
}
