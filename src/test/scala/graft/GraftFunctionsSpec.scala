package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sql.GraftFunctions

class GraftFunctionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get

  test("registered SQL functions: st_distance / regexp_contains / date_diff_years") {
    GraftFunctions.register(spark)
    // JFK (40.6413, -73.7781) to LAX (33.9416, -118.4085): ~3974 km
    val km = spark.sql(
      """SELECT st_distance(st_geogpoint(-73.7781, 40.6413),
        |                   st_geogpoint(-118.4085, 33.9416)) / 1000.0 AS km""".stripMargin)
      .head().getDouble(0)
    assert(math.abs(km - 3974) < 15, s"JFK-LAX ~3974km, got $km")
    assert(spark.sql("SELECT regexp_contains('abc123', '\\\\d{3}')").head().getBoolean(0))
    assert(!spark.sql("SELECT regexp_contains('abcdef', '\\\\d{3}')").head().getBoolean(0))
    // boundary-crossing semantics: Dec 31 -> Jan 1 is 1 "year"
    assert(spark.sql(
      "SELECT date_diff_years(DATE '2021-01-01', DATE '2020-12-31')").head().getInt(0) == 1)
    assert(spark.sql(
      "SELECT date_diff_years(DATE '2021-12-31', DATE '2021-01-01')").head().getInt(0) == 0)
  }

  test("haversine Column function: known city pair") {
    import org.apache.spark.sql.functions._
    val mi = spark.range(1).select(
      graft.functions.BqFunctions.haversineMiles(
        lit(40.6413), lit(-73.7781), lit(33.9416), lit(-118.4085)).as("mi"))
      .head().getDouble(0)
    assert(math.abs(mi - 2469) < 10, s"JFK-LAX ~2469mi, got $mi")
  }

  test("jaro_winkler: textbook values, byte semantics, SQL registration") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val pairs = Seq(("martha", "marhta"), ("dixon", "dicksonx"),
      ("crate", "trace"), ("ab", "ba"), ("", ""), ("same", "same"))
      .toDF("a", "b")
    val got = pairs.select(
      graft.expressions.JaroWinkler.jw($"a", $"b").as("jw")).as[Double]
      .collect()
    // martha/marhta 0.9611..., dixon/dicksonx 0.8133..., crate/trace
    // 0.7333... (below boost threshold: no prefix bonus), ab/ba 0
    // (window 0), both-empty 0 (the DuckDB convention), identical 1
    val want = Seq(0.9611111111111111, 0.8133333333333332,
      0.7333333333333334, 0.0, 0.0, 1.0)
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g - w) < 1e-12, s"got $g want $w") }
    // SQL path = expression path
    val viaSql = spark.sql(
      "SELECT jaro_winkler('martha', 'marhta')").head().getDouble(0)
    assert(viaSql == got(0))
    // byte semantics on multi-byte input (matches DuckDB's walk)
    val uni = Seq(("éa", "éb")).toDF("a", "b").select(
      graft.expressions.JaroWinkler.jw($"a", $"b")).head().getDouble(0)
    assert(math.abs(uni - 0.8222222222222222) < 1e-12, s"got $uni")
  }

  test("nfc_normalize: canonical equivalence collapses, ascii fast-path is identity") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT nfc_normalize('cafe\u0301') = 'caf\u00e9' AS eq, " +
      "nfc_normalize('plain ascii') AS p, nfc_normalize(NULL) AS n").head()
    assert(r.getBoolean(0), "decomposed must normalize to precomposed")
    assert(r.getString(1) == "plain ascii")
    assert(r.isNullAt(2), "null-safe")
    // the Column entry point and the fingerprint interplay: canonically
    // equivalent docs dedup identically once normalized
    import org.apache.spark.sql.functions._
    import graft.expressions.NfcNormalize.nfc
    import spark.implicits._
    val docs = Seq((1L, "result cafe\u0301"), (2L, "result caf\u00e9"))
      .toDF("doc_id", "text")
    val fps = docs.select(
      graft.ext.TextAnalysis.fingerprint(nfc(col("text"))).as("fp"))
      .distinct().count()
    assert(fps == 1L, "NFC must collapse equivalent docs to one fingerprint")
  }

  test("LLM-pipeline TVFs from SQL text are row-identical to the Scala API") {
    GraftFunctions.register(spark)
    val docs = graft.sources.Tables(spark, "/root/testdata/sf0.001").documents
    docs.createOrReplaceTempView("docs_tvf")
    def sameAs(sql: String, api: org.apache.spark.sql.DataFrame): Unit = {
      val viaSql = spark.sql(sql)
      assert(viaSql.columns.sorted.sameElements(api.columns.sorted),
        s"schema drift: ${viaSql.columns.toSeq} vs ${api.columns.toSeq}")
      assert(viaSql.exceptAll(api).isEmpty && api.exceptAll(viaSql).isEmpty,
        s"SQL and Scala results differ for: $sql")
    }
    sameAs("SELECT * FROM gopher_rules('docs_tvf')",
      graft.ext.Curation.gopherRules(docs))
    sameAs("SELECT * FROM gopher_rules('docs_tvf', 20)",
      graft.ext.Curation.gopherRules(docs, minTokens = 20))
    sameAs("SELECT * FROM hash_split('docs_tvf', 70, 20)",
      graft.ext.Curation.hashSplit(docs, trainPct = 70, valPct = 20))
    sameAs("SELECT * FROM dedup_candidates('docs_tvf')",
      graft.ext.Dedup.lshCandidates(graft.ext.Dedup.minhashSignatures(docs)))
    sameAs("SELECT * FROM text_stats('docs_tvf')",
      graft.ext.TextAnalysis.withStats(docs))
    graft.ext.Curation.dsirModel(docs,
        docs.filter(org.apache.spark.sql.functions.col("source") === "src0"))
      .createOrReplaceTempView("dsir_model_tvf")
    sameAs("SELECT * FROM dsir_score('docs_tvf', 'dsir_model_tvf')",
      graft.ext.Curation.dsirScore(docs, spark.table("dsir_model_tvf")))
    docs.filter(org.apache.spark.sql.functions.col("doc_id") % 5 === 0)
      .createOrReplaceTempView("mem_ref_tvf")
    sameAs("SELECT * FROM memorization_score('docs_tvf', 'mem_ref_tvf', 6)",
      graft.ext.Curation.memorizationScore(docs,
        spark.table("mem_ref_tvf"), n = 6))
    // the TVF surface composes with plain SQL downstream of the call
    val kept = spark.sql(
      "SELECT count(*) FROM gopher_rules('docs_tvf') WHERE keep").head().getLong(0)
    val keptApi = graft.ext.Curation.gopherRules(docs)
      .filter(org.apache.spark.sql.functions.col("keep")).count()
    assert(kept == keptApi, s"composed SQL filter: $kept vs $keptApi")
  }

  test("round-9/10 family TVFs from SQL text are row-identical to the Scala API") {
    GraftFunctions.register(spark)
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = graft.sources.Tables(spark, "/root/testdata/sf0.001").documents
    docs.createOrReplaceTempView("docs_tvf9")
    def sameAs(sql: String, api: org.apache.spark.sql.DataFrame): Unit = {
      val viaSql = spark.sql(sql)
      assert(viaSql.columns.sorted.sameElements(api.columns.sorted),
        s"schema drift: ${viaSql.columns.toSeq} vs ${api.columns.toSeq}")
      assert(viaSql.exceptAll(api).isEmpty && api.exceptAll(viaSql).isEmpty,
        s"SQL and Scala results differ for: $sql")
    }
    sameAs("SELECT * FROM simhash_near_dups('docs_tvf9')",
      graft.ext.Dedup.simhashNearDups(docs))
    sameAs("SELECT * FROM simhash_near_dups('docs_tvf9', 2)",
      graft.ext.Dedup.simhashNearDups(docs, maxHamming = 2))
    docs.filter(col("doc_id") % 7 === 0).createOrReplaceTempView("bench_tvf9")
    sameAs("SELECT * FROM cross_near_dups('docs_tvf9', 'bench_tvf9')",
      graft.ext.Dedup.crossNearDups(docs, spark.table("bench_tvf9")))
    sameAs("SELECT * FROM prefix_jaccard('docs_tvf9', 0.4)",
      graft.ext.Dedup.prefixJaccardJoin(docs, threshold = 0.4))
    // two ranked lists built in plain SQL, fused by the TVF
    spark.sql("""SELECT * FROM (SELECT doc_id AS item_id,
        row_number() OVER (ORDER BY length(text) DESC, doc_id) AS rank
      FROM docs_tvf9) WHERE rank <= 20""").createOrReplaceTempView("rank_a_tvf9")
    spark.sql("""SELECT * FROM (SELECT doc_id AS item_id,
        row_number() OVER (ORDER BY doc_id) AS rank
      FROM docs_tvf9) WHERE rank <= 20""").createOrReplaceTempView("rank_b_tvf9")
    sameAs("SELECT * FROM rrf_fuse('rank_a_tvf9', 'rank_b_tvf9', 60, 5)",
      graft.ext.TextAnalysis.rrfFuse(
        Seq(spark.table("rank_a_tvf9"), spark.table("rank_b_tvf9")),
        rrfK = 60, topK = 5))
    sameAs("SELECT * FROM ppl_buckets('docs_tvf9')",
      graft.ext.Curation.perplexityBuckets(docs))
    sameAs("SELECT * FROM ppl_buckets_approx('docs_tvf9')",
      graft.ext.Curation.perplexityBucketsApprox(docs))
    sameAs("SELECT * FROM cms_heavy_hitters('docs_tvf9', 20, 4, 128)",
      graft.ext.Sketches.cmsHeavyHitters(docs, k = 20, depth = 4, width = 128))
    sameAs("SELECT * FROM kn_bigram('docs_tvf9', 30)",
      graft.ext.Curation.knBigramTable(docs, topK = 30))
    graft.ext.EntityResolution.customerVariants(
        graft.sources.Tables(spark, "/root/testdata/sf0.001").customer)
      .createOrReplaceTempView("er_recs_tvf9")
    sameAs("SELECT * FROM entity_resolution('er_recs_tvf9')",
      graft.ext.EntityResolution.resolve(spark.table("er_recs_tvf9")))
    sameAs("SELECT * FROM entity_resolution_jw('er_recs_tvf9', 900000)",
      graft.ext.EntityResolution.resolveJw(spark.table("er_recs_tvf9")))
    sameAs("SELECT * FROM entity_resolution_sn('er_recs_tvf9', 8)",
      graft.ext.EntityResolution
        .resolveSortedNeighborhood(spark.table("er_recs_tvf9")))
    docs.selectExpr("source AS grp", "lower(text) AS key")
      .createOrReplaceTempView("hll_keys_tvf9")
    sameAs("SELECT * FROM hll_distinct_by('hll_keys_tvf9', 'grp')",
      graft.ext.Sketches.hllDistinctBy(spark.table("hll_keys_tvf9"), "grp"))
    Seq((1L, 10L, 900000L), (1L, 11L, 800000L), (1L, 12L, 500000L))
      .toDF("query_id", "cid", "rel_micro")
      .createOrReplaceTempView("mmr_cands_tvf9")
    Seq((1L, 10L, 11L, 990000L), (1L, 11L, 10L, 990000L),
      (1L, 10L, 12L, 100000L), (1L, 12L, 10L, 100000L),
      (1L, 11L, 12L, 100000L), (1L, 12L, 11L, 100000L))
      .toDF("query_id", "a", "b", "sim_micro")
      .createOrReplaceTempView("mmr_sims_tvf9")
    sameAs("SELECT * FROM mmr_select('mmr_cands_tvf9', 'mmr_sims_tvf9', 3)",
      graft.ext.Similarity.mmrSelect(spark.table("mmr_cands_tvf9"),
        spark.table("mmr_sims_tvf9"), k = 3))
    sameAs("SELECT * FROM conversation_near_dups('docs_tvf9', 0.3, 8)",
      graft.ext.Dedup.conversationNearDups(docs, threshold = 0.3,
        turnTokens = 8))
    sameAs("SELECT * FROM token_budget('docs_tvf9', 26000, 0.5)",
      graft.ext.Curation.tokenBudgetAllocate(docs, 26000L, alpha = 0.5))
    sameAs("SELECT * FROM token_budget_sample('docs_tvf9', 26000, 0.5)",
      graft.ext.Curation.tokenBudgetSample(docs, 26000L, alpha = 0.5))
    sameAs("SELECT * FROM turn_repetition('docs_tvf9', 8)",
      graft.ext.Dedup.turnRepetition(docs, turnTokens = 8))
    sameAs("SELECT * FROM conversation_structure('docs_tvf9')",
      graft.ext.Dedup.conversationStructure(docs))
    sameAs("SELECT * FROM structured_output_lint('docs_tvf9')",
      graft.ext.Dedup.structuredOutputLint(docs))
    Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst").createOrReplaceTempView("kcore_edges_tvf9")
    sameAs("SELECT * FROM k_core('kcore_edges_tvf9', 2)",
      graft.operators.Graph.kCore(spark.table("kcore_edges_tvf9"), k = 2))
    Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("child", "parent")
      .createOrReplaceTempView("anc_edges_tvf11")
    sameAs("SELECT * FROM ancestors('anc_edges_tvf11', 6)",
      graft.operators.Graph.ancestors(spark.table("anc_edges_tvf11"), 6))
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .createOrReplaceTempView("cf_old_tvf11")
    Seq((1L, "a"), (2L, "b2"), (3L, "c")).toDF("id", "v")
      .createOrReplaceTempView("cf_new_tvf11")
    sameAs("SELECT * FROM change_feed('cf_old_tvf11', 'cf_new_tvf11', 'id')",
      graft.model.Incremental.changeFeed(spark.table("cf_old_tvf11"),
        spark.table("cf_new_tvf11"), Seq("id")))
    graft.sources.Tables(spark, "/root/testdata/sf0.001").orders
      .createOrReplaceTempView("orders_tvf9")
    sameAs("SELECT * FROM quantile_sketch('orders_tvf9', 'o_orderpriority', " +
        "'o_orderkey', 'o_totalprice', 2)",
      graft.ext.Sketches.quantileSketch(spark.table("orders_tvf9"),
        "o_orderpriority", "o_orderkey", "o_totalprice", shift = 2))
    sameAs("SELECT * FROM kmv_overlap('orders_tvf9', 'o_orderpriority', " +
        "'o_custkey', 32)",
      graft.ext.Sketches.kmvOverlap(
        graft.ext.Sketches.kmvSketchBy(spark.table("orders_tvf9"),
          "o_orderpriority", "o_custkey", 32), "o_orderpriority", 32))
    // composes downstream: bucket histogram over the TVF output
    val viaSql = spark.sql(
      "SELECT ppl_bucket, count(*) AS n FROM ppl_buckets('docs_tvf9') GROUP BY 1")
    val viaApi = graft.ext.Curation.perplexityBuckets(docs)
      .groupBy(col("ppl_bucket")).agg(count(lit(1)).as("n"))
    assert(viaSql.exceptAll(viaApi).isEmpty && viaApi.exceptAll(viaSql).isEmpty)
  }

  test("graph and ANN TVFs are row-identical to the Scala API") {
    GraftFunctions.register(spark)
    import org.apache.spark.sql.functions._
    def sameAs(sql: String, api: org.apache.spark.sql.DataFrame): Unit = {
      val viaSql = spark.sql(sql)
      assert(viaSql.exceptAll(api).isEmpty && api.exceptAll(viaSql).isEmpty, sql)
    }
    val li = graft.sources.Tables(spark, "/root/testdata/sf0.001").lineitem
      .select((col("l_partkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst")).distinct()
    li.createOrReplaceTempView("edges_tvf")
    sameAs("SELECT * FROM page_rank('edges_tvf', 2, 85)",
      graft.operators.Graph.pageRank(li, iters = 2))
    sameAs("SELECT * FROM label_prop('edges_tvf', 2)",
      graft.operators.Graph.labelPropagation(li, iters = 2))
    sameAs("SELECT * FROM triangle_count('edges_tvf')",
      graft.operators.Graph.triangleCount(li))
    li.select(col("src").as("a_id"), col("dst").as("b_id"))
      .createOrReplaceTempView("pairs_tvf")
    sameAs("SELECT * FROM connected_components('pairs_tvf')",
      graft.ext.Dedup.connectedComponents(spark.table("pairs_tvf")))
    val emb = graft.sources.Tables(spark, "/root/testdata/sf0.001").embeddings
    emb.createOrReplaceTempView("corpus_tvf")
    emb.filter(col("vec_id") < 3).createOrReplaceTempView("queries_tvf")
    sameAs("SELECT * FROM ann_topk('queries_tvf', 'corpus_tvf', 5)",
      graft.ext.Similarity.serveTopK(
        spark.table("queries_tvf"), emb, 5))
    val docs = graft.sources.Tables(spark, "/root/testdata/sf0.001").documents
    docs.createOrReplaceTempView("docs_bm25_tvf")
    sameAs("SELECT * FROM bm25_topk('docs_bm25_tvf', 'spark data join', 7)",
      graft.ext.TextAnalysis.bm25TopK(docs, Seq("spark", "data", "join"), 7))
    sameAs("SELECT * FROM line_dedup('docs_bm25_tvf', 3)",
      graft.ext.Dedup.lineDedup(docs, minDocs = 3))
    sameAs("SELECT * FROM c4_clean('docs_bm25_tvf', 3, 1)",
      graft.ext.Curation.c4Clean(docs, minWords = 3, minKeptLines = 1))
    spark.range(1 << 16).select(col("id").as("bucket"),
      ((col("id") * 2654435761L) % 2000001L - 1000000L).as("w_micro"))
      .createOrReplaceTempView("weights_tvf")
    sameAs("SELECT * FROM quality_classify('docs_bm25_tvf', 'weights_tvf')",
      graft.ext.Curation.qualityClassify(docs, spark.table("weights_tvf")))
  }

  test("on-disk index probe TVFs are row-identical to the Scala probes") {
    GraftFunctions.register(spark)
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables(spark, "/root/testdata/sf0.001").documents
    val tmp = java.nio.file.Files.createTempDirectory("graft-tvf-idx").toString
    graft.operators.FingerprintIndex.writeIndex(
      docs.filter(col("doc_id") % 5 =!= 4), "fp_tvf_b", tmp + "/fp")
    docs.filter(col("doc_id") % 5 === 4).createOrReplaceTempView("batch_tvf10")
    val fpSql = spark.sql("SELECT * FROM fp_index_probe('fp_tvf_b', 'batch_tvf10')")
    val fpApi = graft.operators.FingerprintIndex.probe(
      spark, "fp_tvf_b", spark.table("batch_tvf10"))
    assert(fpSql.exceptAll(fpApi).isEmpty && fpApi.exceptAll(fpSql).isEmpty)
    graft.operators.MemorizationIndex.writeIndex(
      docs.filter(col("doc_id") % 5 === 0), "mem_tvf_b", tmp + "/mem")
    docs.createOrReplaceTempView("docs_tvf10")
    val memSql = spark.sql("SELECT * FROM mem_index_probe('mem_tvf_b', 'docs_tvf10')")
    val memApi = graft.operators.MemorizationIndex.probe(spark, "mem_tvf_b", docs)
    assert(memSql.exceptAll(memApi).isEmpty && memApi.exceptAll(memSql).isEmpty)
    graft.operators.MinHashBandIndex.writeIndex(
      docs.filter(col("doc_id") % 5 =!= 4), "mh_tvf_b", tmp + "/mh")
    val mhSql = spark.sql("SELECT * FROM mh_index_probe('mh_tvf_b', 'batch_tvf10')")
    val mhApi = graft.operators.MinHashBandIndex.probe(
      spark, "mh_tvf_b", spark.table("batch_tvf10"))
    assert(mhSql.exceptAll(mhApi).isEmpty && mhApi.exceptAll(mhSql).isEmpty)
  }

  test("st_distance_spheroid from SQL equals the Column API and stays under haversine divergence") {
    GraftFunctions.register(spark)
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val pts = Seq((40.7128, -74.006, 51.5074, -0.1278),   // NYC–London
      (35.6762, 139.6503, -33.8688, 151.2093),            // Tokyo–Sydney
      (0.0, 0.0, 0.0, 90.0), (10.0, 20.0, 10.0, 20.0))    // equator quarter, coincident
      .toDF("lat1", "lon1", "lat2", "lon2")
    pts.createOrReplaceTempView("sph_pts")
    val viaSql = spark.sql(
      """SELECT st_distance_spheroid(st_geogpoint(lon1, lat1),
        |       st_geogpoint(lon2, lat2)) AS m FROM sph_pts""".stripMargin)
      .as[Double].collect()
    val viaApi = pts.select(graft.expressions.VincentyDistance
        .stDistanceSpheroid(col("lat1"), col("lon1"), col("lat2"), col("lon2")))
      .as[Double].collect()
    assert(viaSql.toSeq == viaApi.toSeq)
    // NYC–London geodesic is ~5570 km; spheroid must sit within 0.5%
    // of haversine but NOT equal it (the sphere bias it corrects)
    val hav = pts.select(graft.functions.BqFunctions
        .haversineMiles(col("lat1"), col("lon1"), col("lat2"), col("lon2")) * 1609.34)
      .as[Double].collect()
    assert(math.abs(viaApi(0) - 5570000.0) < 20000.0, s"NYC-London: ${viaApi(0)}")
    assert(viaApi(3) == 0.0, "coincident points must be exactly 0")
    for (i <- 0 until 3) {
      assert(math.abs(viaApi(i) - hav(i)) / viaApi(i) < 0.005,
        s"row $i spheroid ${viaApi(i)} vs haversine ${hav(i)}")
      assert(viaApi(i) != hav(i), s"row $i spheroid should differ from sphere")
    }
  }

  test("multi_match SQL surface: matched patterns in list order, literal-only") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT multi_match('ushers walk', 'she', 'he', 'walk', 'absent') AS m, " +
      "multi_match('', 'x') AS e, multi_match(CAST(NULL AS STRING), 'x') AS n").head()
    assert(r.getSeq[String](0) == Seq("she", "he", "walk"))
    assert(r.getSeq[String](1) == Seq())
    assert(r.isNullAt(2))
    // non-literal pattern is rejected at analysis, not silently wrong
    intercept[Exception] {
      spark.sql("SELECT multi_match('a', concat('b', rand())) ").head()
    }
  }

  test("round-11 eval/retrieval TVFs are row-identical to the Scala API") {
    GraftFunctions.register(spark)
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = graft.sources.Tables(spark, "/root/testdata/sf0.001").documents
    val emb = graft.sources.Tables(spark, "/root/testdata/sf0.001").embeddings
    docs.createOrReplaceTempView("docs_tvf11")
    emb.createOrReplaceTempView("emb_tvf11")
    def sameAs(sql: String, api: org.apache.spark.sql.DataFrame): Unit = {
      val viaSql = spark.sql(sql)
      assert(viaSql.columns.sorted.sameElements(api.columns.sorted),
        s"schema drift: ${viaSql.columns.toSeq} vs ${api.columns.toSeq}")
      assert(viaSql.exceptAll(api).isEmpty && api.exceptAll(viaSql).isEmpty,
        s"SQL and Scala results differ for: $sql")
    }
    sameAs("SELECT * FROM corpus_drift('docs_tvf11', 64)",
      graft.ext.Curation.corpusDrift(docs, buckets = 64))
    sameAs("SELECT * FROM vocab_richness('docs_tvf11')",
      graft.ext.TextAnalysis.vocabRichness(docs))
    sameAs("SELECT * FROM maxsim_topk('emb_tvf11', 5, 2)",
      graft.ext.Similarity.maxSimTopK(emb, k = 5, numQueries = 2))
    Seq(("a", "b"), ("a", "b"), ("b", "c"), ("a", "c"))
      .toDF("winner", "loser").createOrReplaceTempView("duels_tvf11")
    sameAs("SELECT * FROM bradley_terry('duels_tvf11', 2)",
      graft.ext.Preferences.bradleyTerry(spark.table("duels_tvf11"), iters = 2))
    Seq((1L, "a b c d")).toDF("pair_id", "text")
      .createOrReplaceTempView("cand_tvf11")
    Seq((1L, "a b x c d")).toDF("pair_id", "text")
      .createOrReplaceTempView("ref_tvf11")
    sameAs("SELECT * FROM rouge_n('cand_tvf11', 'ref_tvf11', 2)",
      graft.ext.TextAnalysis.rougeN(
        spark.table("cand_tvf11"), spark.table("ref_tvf11"), n = 2))
    Seq(("g", "y", "y"), ("g", "y", "n"), ("g", "n", "n"))
      .toDF("group", "label_a", "label_b")
      .createOrReplaceTempView("lab_tvf11")
    sameAs("SELECT * FROM cohen_kappa('lab_tvf11')",
      graft.ext.Evaluation.cohenKappa(spark.table("lab_tvf11")))
    Seq((800000L, 1L), (200000L, 0L), (500000L, 1L))
      .toDF("p_micro", "y").createOrReplaceTempView("preds_tvf11")
    sameAs("SELECT * FROM calibration('preds_tvf11', 10)",
      graft.ext.Evaluation.calibration(spark.table("preds_tvf11"), bins = 10))
  }

  test("late round-11 TVFs are row-identical to the Scala API") {
    GraftFunctions.register(spark)
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = graft.sources.Tables(spark, "/root/testdata/sf0.001").documents
    val emb = graft.sources.Tables(spark, "/root/testdata/sf0.001").embeddings
    val events = graft.sources.Tables(spark, "/root/testdata/sf0.001").events
    docs.createOrReplaceTempView("docs_l11")
    emb.createOrReplaceTempView("emb_l11")
    events.createOrReplaceTempView("ev_l11")
    def sameAs(sql: String, api: org.apache.spark.sql.DataFrame): Unit = {
      val viaSql = spark.sql(sql)
      assert(viaSql.columns.sorted.sameElements(api.columns.sorted),
        s"schema drift: ${viaSql.columns.toSeq} vs ${api.columns.toSeq}")
      assert(viaSql.exceptAll(api).isEmpty && api.exceptAll(viaSql).isEmpty,
        s"SQL and Scala results differ for: $sql")
    }
    sameAs("SELECT * FROM theil_sen('ev_l11')",
      graft.ext.Timeseries.theilSen(events))
    sameAs("SELECT * FROM mad_outliers('ev_l11')",
      graft.ext.Timeseries.madOutliers(events))
    sameAs("SELECT * FROM holt_forecast('ev_l11')",
      graft.ext.Timeseries.holtForecast(events))
    sameAs("SELECT * FROM mutual_knn('emb_l11', 3)",
      graft.ext.Similarity.mutualKnn(emb, k = 3))
    sameAs("SELECT * FROM luhn_screen('docs_l11')",
      graft.ext.TextAnalysis.luhnScreen(docs))
    sameAs("SELECT * FROM vocab_pruning('docs_l11')",
      graft.ext.TextAnalysis.vocabPruningCurve(docs))
    sameAs("SELECT * FROM embed_drift('emb_l11')",
      graft.ext.Similarity.embedDrift(emb))
    Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
      .createOrReplaceTempView("edges_l11")
    sameAs("SELECT * FROM hits('edges_l11', 2)",
      graft.operators.Graph.hits(spark.table("edges_l11"), 2))
    Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("node", "label")
      .createOrReplaceTempView("labels_l11")
    sameAs("SELECT * FROM modularity('edges_l11', 'labels_l11')",
      graft.operators.Graph.modularity(
        spark.table("edges_l11"), spark.table("labels_l11")))
  }

  test("eval/link-prediction TVFs are row-identical to the Scala API") {
    GraftFunctions.register(spark)
    import spark.implicits._
    def sameAs(sql: String, api: org.apache.spark.sql.DataFrame): Unit = {
      val viaSql = spark.sql(sql)
      assert(viaSql.columns.sorted.sameElements(api.columns.sorted),
        s"schema drift: ${viaSql.columns.toSeq} vs ${api.columns.toSeq}")
      assert(viaSql.exceptAll(api).isEmpty && api.exceptAll(viaSql).isEmpty,
        s"SQL and Scala results differ for: $sql")
    }
    Seq(("g", 90L, 1L), ("g", 50L, 1L), ("g", 50L, 0L), ("g", 10L, 0L))
      .toDF("group", "score_micro", "y")
      .createOrReplaceTempView("scores_e11")
    sameAs("SELECT * FROM auc_roc('scores_e11')",
      graft.ext.Evaluation.aucRoc(spark.table("scores_e11")))
    Seq(("g", 1L, "en"), ("g", 1L, "en"), ("g", 1L, "es"),
        ("g", 2L, "en"), ("g", 2L, "es"), ("g", 2L, "es"))
      .toDF("group", "item", "cat").createOrReplaceTempView("rate_e11")
    sameAs("SELECT * FROM fleiss_kappa('rate_e11')",
      graft.ext.Evaluation.fleissKappa(spark.table("rate_e11")))
    Seq(("g", true, true, false), ("g", true, false, true),
        ("g", false, false, false))
      .toDF("group", "y", "pred_a", "pred_b")
      .createOrReplaceTempView("mcn_e11")
    sameAs("SELECT * FROM mcnemar('mcn_e11')",
      graft.ext.Evaluation.mcnemar(spark.table("mcn_e11")))
    Seq(("g", true, true), ("g", false, true), ("h", true, false))
      .toDF("group", "y", "pred").createOrReplaceTempView("fair_e11")
    sameAs("SELECT * FROM fairness_report('fair_e11')",
      graft.ext.Evaluation.fairnessReport(spark.table("fair_e11")))
    Seq((1L, "a", "a", 900000L), (1L, "a", "b", 100000L),
        (2L, "b", "a", 800000L), (2L, "b", "b", 200000L))
      .toDF("doc_id", "noisy", "cls", "p_micro")
      .createOrReplaceTempView("cj_e11")
    sameAs("SELECT * FROM confident_joint('cj_e11')",
      graft.ext.Curation.confidentJoint(spark.table("cj_e11")))
    Seq(("g", "a b a"), ("g", "c d")).toDF("source", "text")
      .createOrReplaceTempView("dn_e11")
    sameAs("SELECT * FROM distinct_ngrams('dn_e11')",
      graft.ext.Curation.distinctNgrams(spark.table("dn_e11")))
    Seq(("g", 1L, 5L, 2L), ("g", 1L, 3L, 7L), ("g", 0L, 3L, 4L),
        ("g", 0L, 1L, 1L))
      .toDF("group", "y", "score_a_micro", "score_b_micro")
      .createOrReplaceTempView("dl_e11")
    sameAs("SELECT * FROM delong_test('dl_e11')",
      graft.ext.Evaluation.delongTest(spark.table("dl_e11")))
    Seq(("g", 0L, 0L, 10L), ("g", 0L, 0L, 12L), ("g", 0L, 1L, 13L),
        ("g", 0L, 1L, 15L), ("g", 1L, 0L, 20L), ("g", 1L, 0L, 22L),
        ("g", 1L, 1L, 28L), ("g", 1L, 1L, 30L))
      .toDF("group", "arm", "period", "y_micro")
      .createOrReplaceTempView("did_e11")
    sameAs("SELECT * FROM did('did_e11')",
      graft.ext.Evaluation.didEstimate(spark.table("did_e11")))
    Seq(("all", 0L, 1L, 1L), ("all", 0L, 3L, 3L), ("all", 1L, 2L, 2L),
        ("all", 1L, 6L, 6L))
      .toDF("group", "arm", "y_micro", "x_micro")
      .createOrReplaceTempView("cup_e11")
    sameAs("SELECT * FROM cuped('cup_e11')",
      graft.ext.Evaluation.cupedAdjust(spark.table("cup_e11")))
    Seq(("g", 1L), ("g", 2L)).toDF("group", "v")
      .createOrReplaceTempView("ks_a_e11")
    Seq(("g", 2L), ("g", 9L)).toDF("group", "v")
      .createOrReplaceTempView("ks_b_e11")
    sameAs("SELECT * FROM ks_test('ks_a_e11', 'ks_b_e11')",
      graft.ext.Evaluation.ksTest(
        spark.table("ks_a_e11"), spark.table("ks_b_e11")))
    sameAs("SELECT * FROM wasserstein('ks_a_e11', 'ks_b_e11')",
      graft.ext.Evaluation.wasserstein1(
        spark.table("ks_a_e11"), spark.table("ks_b_e11")))
    sameAs("SELECT * FROM cvm_test('ks_a_e11', 'ks_b_e11')",
      graft.ext.Evaluation.cramerVonMises(
        spark.table("ks_a_e11"), spark.table("ks_b_e11")))
    Seq(("g", 150000L), ("g", 850000L)).toDF("group", "p_micro")
      .createOrReplaceTempView("psi_a_e11")
    Seq(("g", 850000L), ("g", 950000L)).toDF("group", "p_micro")
      .createOrReplaceTempView("psi_b_e11")
    sameAs("SELECT * FROM psi('psi_a_e11', 'psi_b_e11', 10)",
      graft.ext.Evaluation.psi(
        spark.table("psi_a_e11"), spark.table("psi_b_e11")))
    Seq((1L, "a b c")).toDF("pair_id", "text")
      .createOrReplaceTempView("bleu_c_e11")
    Seq((1L, "a b d")).toDF("pair_id", "text")
      .createOrReplaceTempView("bleu_r_e11")
    sameAs("SELECT * FROM corpus_bleu('bleu_c_e11', 'bleu_r_e11', 2)",
      graft.ext.TextAnalysis.corpusBleu(
        spark.table("bleu_c_e11"), spark.table("bleu_r_e11")))
    Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
      .createOrReplaceTempView("edges_e11")
    sameAs("SELECT * FROM adamic_adar('edges_e11')",
      graft.operators.Graph.adamicAdar(spark.table("edges_e11")))
    Seq(("g", "a", "x"), ("g", "a", "y"), ("g", "b", "x"))
      .toDF("group", "label_a", "label_b")
      .createOrReplaceTempView("chi_e11")
    sameAs("SELECT * FROM chi_square('chi_e11')",
      graft.ext.Evaluation.chiSquare(spark.table("chi_e11")))
    Seq(1L).toDF("node").createOrReplaceTempView("seeds_e11")
    sameAs("SELECT * FROM ppr('edges_e11', 'seeds_e11', 2)",
      graft.operators.Graph.personalizedPageRank(
        spark.table("edges_e11"), spark.table("seeds_e11"), iters = 2))
    (0 until 6).map(d => (d.toLong,
        java.sql.Timestamp.valueOf(f"2026-02-${d + 1}%02d 00:00:00"), "view"))
      .toDF("event_id", "ts", "event_type")
      .createOrReplaceTempView("pgram_e11")
    sameAs("SELECT * FROM periodogram('pgram_e11', 2, 5)",
      graft.ext.Timeseries.periodogram(
        spark.table("pgram_e11"), minPeriod = 2, maxPeriod = 5))
    sameAs("SELECT * FROM ljung_box('pgram_e11', 3)",
      graft.ext.Timeseries.ljungBox(
        spark.table("pgram_e11"), maxLag = 3))
    sameAs("SELECT * FROM label_vote('rate_e11')",
      graft.ext.Evaluation.labelVote(spark.table("rate_e11")))
    Seq((1L, "red apple and green apple"), (2L, "the sort merge join"))
      .toDF("doc_id", "text").createOrReplaceTempView("rake_e11")
    sameAs("SELECT * FROM rake_keywords('rake_e11', 2)",
      graft.ext.TextAnalysis.rakeKeyphrases(
        spark.table("rake_e11"), topPerDoc = 2))
    Seq(("g", 1L, 10L, 1L), ("g", 2L, 20L, 3L), ("g", 3L, 30L, 2L))
      .toDF("grp", "id", "x", "y").createOrReplaceTempView("rc_e11")
    sameAs("SELECT * FROM rank_corr('rc_e11', 2)",
      graft.ext.Evaluation.rankCorrelation(spark.table("rc_e11"),
        "grp", "id", "x", "y", maxPerGroup = 2))
    Seq(("m", 0L, 1L), ("m", 0L, 0L), ("m", 1L, 1L), ("m", 1L, 1L))
      .toDF("grp", "arm", "conv").createOrReplaceTempView("ab_e11")
    sameAs("SELECT * FROM ab_test('ab_e11')",
      graft.ext.Evaluation.abTest(spark.table("ab_e11"),
        "grp", "arm", "conv"))
    Seq((1L, 1L, 8L), (1L, 2L, 2L), (2L, 2L, 5L))
      .toDF("label", "pred_label", "n").createOrReplaceTempView("cr_e11")
    sameAs("SELECT * FROM classification_report('cr_e11')",
      graft.ext.Evaluation.classificationReport(spark.table("cr_e11")))
    sameAs("SELECT * FROM readability('rake_e11')",
      graft.ext.TextAnalysis.readability(spark.table("rake_e11")))
    sameAs("SELECT * FROM readability_ext('rake_e11')",
      graft.ext.TextAnalysis.readabilityExtended(spark.table("rake_e11")))
    Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("doc_id", "source")
      .createOrReplaceTempView("mixd_e11")
    sameAs("SELECT * FROM mix_diversity('mixd_e11')",
      graft.ext.Curation.mixDiversity(spark.table("mixd_e11")))
    (0 until 10).map(i => (i.toLong,
        if (i % 2 == 1) s"d$i has good stuff" else s"d$i has bad stuff",
        (i % 2).toLong))
      .toDF("doc_id", "text", "y").createOrReplaceTempView("lrt_e11")
    sameAs("SELECT * FROM lr_train('lrt_e11', 4)",
      graft.ext.Curation.trainQualityLr(spark.table("lrt_e11"), "y",
        iters = 4)._1)
    spark.sql("SELECT * FROM lr_train('lrt_e11', 4)")
      .createOrReplaceTempView("lrw_e11")
    sameAs("SELECT * FROM lr_margins('lrt_e11', 'lrw_e11')",
      graft.ext.Curation.lrMargins(spark.table("lrt_e11"),
        spark.table("lrw_e11")))
    Seq((1L, "red", "m"), (2L, "blue", "l")).toDF("id", "color", "sz")
      .createOrReplaceTempView("fh_e11")
    sameAs("SELECT * FROM feature_hash('fh_e11', 'color,sz', 16)",
      graft.ext.Curation.featureHash(
        spark.table("fh_e11"), Seq("color", "sz"), dim = 16))
    Seq((1L, "a b c d e f g h i j"), (2L, "a b c d e f"))
      .toDF("doc_id", "text").createOrReplaceTempView("cont_e11")
    sameAs("SELECT * FROM containment('cont_e11', 0.9)",
      graft.ext.Dedup.containmentJoin(
        spark.table("cont_e11"), threshold = 0.9))
    Seq((1L, "a a a b b c", "s1")).toDF("doc_id", "text", "source")
      .createOrReplaceTempView("zipf_e11")
    sameAs("SELECT * FROM zipf_slope('zipf_e11', 10)",
      graft.ext.TextAnalysis.zipfSlope(spark.table("zipf_e11"), topK = 10))
    Seq(("g", 123L), ("g", 77L), ("g", 901L)).toDF("group", "cents")
      .createOrReplaceTempView("bf_e11")
    sameAs("SELECT * FROM benford('bf_e11', 'cents')",
      graft.ext.Profiler.benford(spark.table("bf_e11"), "cents"))
    Seq(1L, 2L, 3L).toDF("doc_id").createOrReplaceTempView("lsd_e11")
    Seq((1L, 2L)).toDF("a_id", "b_id").createOrReplaceTempView("lsc_e11")
    sameAs("SELECT * FROM leakage_split('lsd_e11', 'lsc_e11')",
      graft.ext.Curation.leakageSafeSplit(
        spark.table("lsd_e11"), spark.table("lsc_e11")))
    graft.ext.Checkpoints.releaseAll(spark)
  }
}
