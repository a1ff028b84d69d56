package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions for the scale-critical query shapes: these
  * lock in the plans that survive 100 TB, so a regression (a cartesian
  * product sneaking back in, a top-1 window losing its group-limit, a
  * global sort materializing fully) fails the suite — not just the
  * bench.
  */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir)
      .queryExecution.executedPlan.toString

  test("row_number top-1 shapes plan a WindowGroupLimit (pushed partial top-k)") {
    val p = plan("q_window_top1")
    assert(p.contains("WindowGroupLimit"), s"q_window_top1 plan lacks WindowGroupLimit:\n$p")
  }

  test("agg-then-top-1 is a two-level hash agg, not a window") {
    val p = plan("q_window_agg_rank")
    assert(!p.contains("Window"), s"q_window_agg_rank should not plan a window:\n$p")
    assert(p.contains("HashAggregate"), s"q_window_agg_rank plan lacks hash agg:\n$p")
  }

  test("LSH verify path carries no forced broadcast hint (AQE decides at runtime)") {
    val lp = SparkEntry.queries("q_dedup_lsh_verified")(spark, dir)
      .queryExecution.optimizedPlan.toString
    assert(!lp.contains("strategy=broadcast"),
      s"unconditional broadcast hint on the LSH verify path:\n$lp")
  }

  test("embedding near-dup has no cartesian product over the corpus") {
    val p = plan("q_sim_near_dup")
    assert(!p.contains("CartesianProduct"), s"CartesianProduct in q_sim_near_dup:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"BroadcastNestedLoopJoin in q_sim_near_dup:\n$p")
  }

  test("n-gram jaccard has no cartesian product") {
    val p = plan("q_dedup_ngram_jaccard")
    assert(!p.contains("CartesianProduct"), s"CartesianProduct in q_dedup_ngram_jaccard:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"BroadcastNestedLoopJoin in q_dedup_ngram_jaccard:\n$p")
  }

  test("global sort+limit plans TakeOrderedAndProject (no full range shuffle)") {
    val p = plan("q_sort_global_limit")
    assert(p.contains("TakeOrderedAndProject"), s"q_sort_global_limit plan:\n$p")
  }

  test("round-13 queries: keyed joins only, bounded windows") {
    // FS pair space must stay the census-capped block equi-join; the
    // rank-correlation tau join equi-keys on the group; RAKE's top-k
    // is a WindowGroupLimit, never a corpus sort
    // (q_mix_diversity is excluded: its plan joins two SINGLE-ROW
    // aggregates — a 1×1 cross join is the correct shape there)
    for (q <- Seq("q_fellegi_sunter", "q_fs_em", "q_rank_corr",
        "q_rake_keywords", "q_ab_test", "q_eval_f1", "q_readability",
        "q_lr_train", "q_lr_eval")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"$q falls back to a nested loop:\n$p")
    }
    assert(plan("q_rake_keywords").contains("WindowGroupLimit"),
      "rake top-k must push the group limit")
  }

  test("late round-13 queries: no windows, no cartesians, broadcast thresholds") {
    // mcnemar/fairness/distinct-n are single-pass group aggregates;
    // holt-winters folds inside a per-row array; the drift report is
    // a broadcast-centroid join over the index scan. None may plan a
    // per-row window or a cartesian.
    for (q <- Seq("q_mcnemar", "q_fairness", "q_distinct_ngrams",
        "q_holt_winters", "q_ivf_drift")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian:\n$p")
      assert(!p.contains("row_number"), s"$q plans a per-row ranking:\n$p")
    }
  }

  test("round-14 statistics: no cartesians; windows only over bounded cell tables") {
    // every new statistic's corpus-touching step is ONE map-side-
    // combined aggregation; the windows that follow partition over
    // value/vocab/time/depth-bounded cell tables. None may plan a
    // cartesian or fall back to a nested loop; the RBO rank windows
    // must push their top-k group limit.
    for (q <- Seq("q_mann_whitney", "q_fdr_bh", "q_mantel_haenszel",
        "q_js_divergence", "q_kaplan_meier", "q_logrank", "q_cochran_q",
        "q_pr_auc", "q_effect_size", "q_page_hinkley", "q_gwet_ac1",
        "q_trimmed_mean", "q_assortativity", "q_rbo", "q_hill_tail",
        "q_seasonal_strength")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"$q falls back to a nested loop:\n$p")
    }
    assert(plan("q_rbo").contains("WindowGroupLimit"),
      "rbo's top-k rank windows must push the group limit")
    // effect size / mantel-haenszel / cochran-q never plan a window
    // at all — pure aggregation chains
    for (q <- Seq("q_effect_size", "q_mantel_haenszel", "q_cochran_q")) {
      val p = plan(q)
      assert(!p.contains("Window"), s"$q should not plan any window:\n$p")
    }
    // mann-kendall's pair join is an equi-join on the series key over
    // the days-sized table (hash-joinable, never nested-loop)
    val mk = plan("q_mann_kendall")
    assert(!mk.contains("CartesianProduct") &&
      mk.contains("Join"), s"q_mann_kendall pair join shape:\n$mk")
  }

  test("round-15 continuation stats: no cartesians; readability_ext is a pure map") {
    // lazy plans: every corpus-touching step is one map-side-combined
    // aggregation; windows run over value-cardinality-bounded state
    for (q <- Seq("q_wasserstein", "q_cvm", "q_gini")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"$q falls back to a nested loop:\n$p")
    }
    // ljung_box/hurst cross ONE-ROW broadcast totals (the acf
    // discipline) and bartlett's grp key is the literal 'all' in this
    // wiring, so Catalyst folds its groups-sized broadcast join to a
    // BNLJ over one row — fine; a cartesian is not
    for (q <- Seq("q_ljung_box", "q_bartlett", "q_hurst"))
      assert(!plan(q).contains("CartesianProduct"),
        s"$q plans a cartesian")
    // the late-session finishes: anderson-darling windows only over
    // the bounded state; msprt is a pure aggregation chain (no join,
    // no window at all); silhouette is a pure map over literal
    // centroids after the driver-side fit
    val ad = plan("q_anderson_darling")
    assert(!ad.contains("CartesianProduct") &&
      !ad.contains("BroadcastNestedLoopJoin"), s"q_anderson_darling:\n$ad")
    for (q <- Seq("q_msprt")) {
      val p = plan(q)
      assert(!p.contains("Join"), s"$q should not plan any join:\n$p")
      assert(!p.contains("Window"), s"$q should not plan any window:\n$p")
    }
    // the dispersion test densifies each series across its day span
    // (round 16): ONE hash-equi left join of the sequence-exploded
    // span table onto the observed (series, day) counts — bounded by
    // series × span-days, never a cartesian or a window
    val disp = plan("q_dispersion_test")
    assert(disp.contains("HashJoin") &&
      !disp.contains("CartesianProduct") &&
      !disp.contains("BroadcastNestedLoopJoin") &&
      !disp.contains("Window"),
      s"q_dispersion_test densify-join shape:\n$disp")
    val sil = plan("q_silhouette")
    assert(!sil.contains("Join"),
      s"q_silhouette must stay join-free after the centroid fit:\n$sil")
    // extended readability must stay shuffle-free end to end
    val re = plan("q_readability_ext")
    assert(!re.contains("Exchange"),
      s"q_readability_ext should be a pure map, found a shuffle:\n$re")
  }

  test("confidentJoint/cartography: every EXECUTED stage is window-free; thresholds broadcast") {
    // their results are checkpointed (the final plan is just a Scan
    // ExistingRDD), so audit the plans that actually RAN via a
    // QueryExecutionListener instead of the top-level plan string
    val plans = scala.collection.mutable.ArrayBuffer.empty[String]
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(name: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        plans.synchronized { plans += qe.executedPlan.toString }
      override def onFailure(name: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      SparkEntry.queries("q_label_noise")(spark, dir).count()
      // listener delivery is async: poll until the broadcast stage
      // shows up (or time out and fail on the assertions below)
      val deadline = System.currentTimeMillis() + 15000
      while (System.currentTimeMillis() < deadline &&
          !plans.synchronized(plans.exists(_.contains("BroadcastHashJoin"))))
        Thread.sleep(100)
      // snapshot under the lock before iterating: listener delivery is
      // async and late onSuccess callbacks kept appending mid-foreach
      // (ConcurrentModificationException — flaked once in the r19 run)
      val snap = plans.synchronized(plans.toList)
      assert(snap.nonEmpty, "listener captured no executed plans")
      snap.foreach { p =>
        assert(!p.contains("CartesianProduct"),
          s"q_label_noise ran a cartesian stage:\n$p")
        assert(!p.contains("row_number"),
          s"q_label_noise ran a per-row ranking stage:\n$p")
      }
      // the classes-sized threshold table rides as a broadcast — the
      // score side never shuffles for it
      assert(snap.exists(_.contains("BroadcastHashJoin")),
        "confidentJoint must broadcast its threshold table")
    } finally spark.listenerManager.unregister(listener)
    graft.ext.Checkpoints.releaseAll(spark)
  }

  test("flagship joins broadcast their small sides") {
    for (q <- Seq("q_tpch_q3", "q_tpch_q5")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q has no broadcast join:\n$p")
    }
  }

  test("reference models: no cartesian, no nested-loop fallback, broadcast dims") {
    // the three reference models are the flagship deliverable — their
    // plans must stay the 100 TB shape: every join keyed (no cartesian
    // / nested-loop), at least the small dimension sides broadcast
    for (q <- Seq("q_locations_clean", "q_stacked_users_partners", "q_user_base")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"$q falls back to a nested loop:\n$p")
      assert(p.contains("BroadcastHashJoin"), s"$q broadcasts nothing:\n$p")
    }
  }

  test("IVF layout: cluster-partitioned parquet prunes unprobed partitions") {
    import graft.ext.Similarity
    import graft.sources.{IO, Tables}
    import org.apache.spark.sql.functions.col
    val emb = Tables(spark, dir).embeddings
    val (assign, _) = Similarity.kmeans(emb, k = 4, iters = 1)
    val clustered = emb.join(assign, "vec_id")
    val out = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    IO.writePartitioned(clustered, out, Seq("cluster"))
    val probe = IO.readParquet(spark, out).filter(col("cluster").isin(1, 2))
    val scan = probe.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [") && scan.contains("cluster"),
      s"no partition filter in IVF probe scan:\n$scan")
    assert(probe.count() > 0)
  }

  test("domainCapApprox windows over value counts, never documents (hot-domain safe)") {
    val p = plan("q_domain_cap_approx")
    // no per-document ranking anywhere: the only window runs over the
    // (source, q_micro) value-count aggregate, whose cardinality is
    // bounded by the 6dp score domain (≤1e6+1 values) regardless of
    // how hot a domain is — the shape that cannot serialize a 10^8-doc
    // domain into one task's sort
    assert(!p.contains("row_number"),
      s"q_domain_cap_approx plans a per-document ranking:\n$p")
    assert("(?s)Window.*q_micro.* DESC".r.findFirstIn(p).isDefined,
      s"q_domain_cap_approx window does not run over the q_micro value domain:\n$p")
    assert("(?s)HashAggregate\\(keys=\\[source[^\\]]*q_micro".r.findFirstIn(p).isDefined,
      s"q_domain_cap_approx lacks the value-count aggregate under the window:\n$p")
    // threshold table broadcasts; the corpus pass is a narrow filter
    assert(p.contains("BroadcastHashJoin"),
      s"q_domain_cap_approx threshold join is not broadcast:\n$p")
    // the exact twin, by contrast, is allowed its per-domain sort —
    // but must keep the pushed group-limit shape
    val exact = plan("q_domain_cap")
    assert(exact.contains("WindowGroupLimit"),
      s"q_domain_cap lost its pushed window group limit:\n$exact")
  }

  test("native as-of join plans AsofJoinExec (single merge pass, no window)") {
    val p = plan("q_asof_native")
    assert(p.contains("AsofJoin"), s"q_asof_native does not use the native operator:\n$p")
    assert(!p.contains("Window"), s"native as-of should not plan a window:\n$p")
  }

  test("bucketed range join is a pure equi-join (no nested loop)") {
    val p = plan("q_range_join_bucketed")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"bucketed range join fell back to a nested loop:\n$p")
  }

  test("projection/filter queries push filters into the parquet scan") {
    val p = plan("q_filter_in")
    assert(p.contains("PushedFilters: [In("), s"q_filter_in scan has no pushed filter:\n$p")
  }

  test("Q17's part filter reaches the scan; threshold join broadcasts") {
    val p = plan("q_tpch_q17")
    assert(p.contains("EqualTo(p_brand"), s"q_tpch_q17 brand filter not pushed:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"q_tpch_q17 has no broadcast join:\n$p")
  }

  test("Q21's one-pass rewrite: single lineitem scan, no semi/anti joins") {
    val p = plan("q_tpch_q21")
    // the EXISTS/NOT EXISTS pair is folded into the two-level agg, so
    // the plan must not re-scan lineitem for semi/anti probes
    assert(!p.contains("LeftSemi") && !p.contains("LeftAnti"),
      s"q_tpch_q21 regressed to semi/anti probe joins:\n$p")
    val lineitemScans = "lineitem".r.findAllIn(
      "Location.*".r.findAllIn(p).mkString("\n")).size
    assert(lineitemScans <= 1, s"q_tpch_q21 scans lineitem ${lineitemScans}x:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"q_tpch_q21 supplier join not broadcast:\n$p")
  }

  test("PQ top-k: bounded-heap partial agg, no window, no cartesian product") {
    val p = plan("q_sim_pq_topk")
    assert(!p.contains("Window"), s"q_sim_pq_topk still plans a window:\n$p")
    assert(p.contains("partial_top_k_by_score"), s"q_sim_pq_topk lacks partial top-k:\n$p")
    assert(!p.contains("CartesianProduct"), s"CartesianProduct in q_sim_pq_topk:\n$p")
  }

  // --- adapted TPC-H remainder (TpchQueries) -------------------------------

  test("TPC-H remainder: no accidental cartesian; dims broadcast") {
    // q11/q15/q22 deliberately cross-join a broadcast 1-row scalar —
    // excluded from the cartesian sweep, covered by the oracle instead
    val crossFree = Seq("q_tpch_q2", "q_tpch_q4", "q_tpch_q6", "q_tpch_q7",
      "q_tpch_q8", "q_tpch_q9", "q_tpch_q10", "q_tpch_q12", "q_tpch_q13",
      "q_tpch_q14", "q_tpch_q16", "q_tpch_q19", "q_tpch_q20")
    for (q <- crossFree) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"CartesianProduct in $q:\n$p")
    }
    for (q <- Seq("q_tpch_q2", "q_tpch_q7", "q_tpch_q8", "q_tpch_q9",
        "q_tpch_q10", "q_tpch_q14", "q_tpch_q16", "q_tpch_q19")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q has no broadcast join:\n$p")
    }
  }

  test("TPC-H top-k (Q2/Q10) plans TakeOrderedAndProject, no global sort") {
    for (q <- Seq("q_tpch_q2", "q_tpch_q10")) {
      val p = plan(q)
      assert(p.contains("TakeOrderedAndProject"), s"$q sorts globally:\n$p")
    }
  }

  test("Q19's disjunction pushes the per-branch hulls into both scans") {
    val p = plan("q_tpch_q19")
    // assert intent, not Spark's exact filter rendering (version-specific):
    // the hull columns must appear inside a PushedFilters: [...] block
    def pushed(col: String): Boolean =
      s"PushedFilters: \\[[^\\]]*$col".r.findFirstIn(p).isDefined
    assert(pushed("l_quantity"),
      s"q_tpch_q19 quantity hull not pushed to the lineitem scan:\n$p")
    assert(pushed("p_brand"),
      s"q_tpch_q19 brand branch not pushed to the part scan:\n$p")
  }

  test("Q4's EXISTS decorrelates to a semi join with the lateness residual") {
    val p = plan("q_tpch_q4")
    assert(p.contains("LeftSemi"), s"q_tpch_q4 lost its semi join:\n$p")
  }

  test("Q22's NOT EXISTS decorrelates to an anti join") {
    val p = plan("q_tpch_q22")
    assert(p.contains("LeftAnti"), s"q_tpch_q22 lost its anti join:\n$p")
  }

  test("centroid scoring passes are shuffle-free maps (model inlined as literals)") {
    // the FIT collects a k×d model at construction time; the returned
    // scoring plan over the corpus must be a pure narrow scan — any
    // corpus Exchange here would shuffle 100 TB
    val po = plan("q_embed_outliers")
    assert(!po.contains("Exchange"),
      s"q_embed_outliers scoring pass must be shuffle-free:\n$po")
    val pc = plan("q_centroid_classify")
    // exactly one exchange: the (≤k²)-row confusion-matrix agg
    assert("Exchange".r.findAllIn(pc).size <= 1,
      s"q_centroid_classify should shuffle only the confusion agg:\n$pc")
    for (p <- Seq(po, pc))
      assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
        s"centroid scoring must not join the corpus against the model:\n$p")
  }

  test("weighted sample broadcasts the one-row stats; corpus pass is a filter") {
    val p = plan("q_weighted_sample")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"q_weighted_sample stats must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"q_weighted_sample must not sort-merge the corpus against 1 row:\n$p")
  }

  test("passage dedup: keeper join is hash-keyed, no cartesian") {
    val p = plan("q_dedup_passage")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"q_dedup_passage joins must stay equi-keyed:\n$p")
  }

  test("incremental dedup probes the index with equi joins only") {
    val p = plan("q_dedup_incremental")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"q_dedup_incremental must stay equi-keyed:\n$p")
  }

  test("prefix-Jaccard join stays equi-keyed and its gate has a shuffle fallback") {
    import org.apache.spark.sql.functions.col
    val docs = graft.sources.Tables(spark, dir).documents
    val p = graft.ext.Dedup.prefixJaccardJoin(docs)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"prefix join must stay equi-keyed:\n$p")
    // gate forced OFF: identical rows via keyed shuffle joins
    val on = graft.ext.Dedup.prefixJaccardJoin(docs).collect().toSet
    val off = graft.ext.Dedup.prefixJaccardJoin(docs, broadcastMaxSets = 0L)
      .collect().toSet
    assert(on == off, "broadcast gate must not change results")
  }

  test("decontaminate: bench window set broadcasts; all joins equi-keyed") {
    val p = plan("q_decontaminate")
    assert(p.contains("BroadcastExchange"),
      s"benchmark window set must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"q_decontaminate must stay equi-keyed:\n$p")
  }

  test("knn/hard-negative scans broadcast the small query side") {
    for (q <- Seq("q_knn_classify", "q_hard_negatives")) {
      val p = plan(q)
      assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
        s"$q must broadcast its query side:\n$p")
      assert(!p.contains("SortMergeJoin"),
        s"$q must not sort-merge the corpus against the query batch:\n$p")
    }
  }

  test("knnClassify: broadcast gate off ≡ on; gated path forces no broadcast") {
    val emb = graft.sources.Tables(spark, dir).embeddings
    val on = graft.ext.Similarity.knnClassify(emb, k = 3).collect().toSet
    val offDf = graft.ext.Similarity
      .knnClassify(emb, k = 3, broadcastMaxTest = 0L, numBlocks = 7)
    val lp = offDf.queryExecution.optimizedPlan.toString
    assert(!lp.contains("strategy=broadcast"),
      s"gated kNN path must not force a broadcast hint:\n$lp")
    val pp = offDf.queryExecution.executedPlan.toString
    assert(!pp.contains("CartesianProduct"),
      s"gated kNN path must stay equi-keyed:\n$pp")
    assert(on == offDf.collect().toSet,
      "kNN broadcast gate must not change the confusion matrix")
  }

  test("round-9 queries: DSIR broadcasts its model, cross-LSH stays equi-keyed") {
    val pDsir = plan("q_dsir_sample")
    assert(pDsir.contains("BroadcastExchange"),
      s"q_dsir_sample must broadcast the bucket-LLR model:\n$pDsir")
    assert(pDsir.contains("TakeOrderedAndProject"),
      s"q_dsir_sample selection must be a top-k, not a global sort:\n$pDsir")
    for (q <- Seq("q_cross_near_dups", "q_ppl_buckets", "q_memorization",
        "q_simhash_near_dups", "q_dedup_keep_best", "q_dedup_report")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"),
        s"$q must stay equi-keyed:\n$p")
    }
    // NFC is a pure narrow map: no exchange at all
    val pNfc = plan("q_nfc_normalize")
    assert(!pNfc.contains("Exchange"),
      s"q_nfc_normalize must be a zero-shuffle map:\n$pNfc")
  }

  test("approx bucket/cap paths: zero-sort corpus assignment, cutoffs broadcast") {
    // the exact forms sort the corpus (ntile / row_number windows);
    // the approx twins must NOT — their only window runs over the
    // value-bounded histogram, the corpus pass is a broadcast-join map
    val pExact = plan("q_ppl_buckets")
    assert(pExact.contains("ntile"), s"exact form lost its ntile:\n$pExact")
    val pApx = plan("q_ppl_buckets_approx")
    assert(!pApx.contains("ntile"),
      s"approx bucketing must not rank the corpus:\n$pApx")
    assert(!pApx.contains("rangepartitioning"),
      s"approx bucketing must not global-sort anything:\n$pApx")
    assert(pApx.contains("BroadcastHashJoin"),
      s"cutoff table must broadcast to the corpus side:\n$pApx")
    val pCap = plan("q_domain_cap_approx")
    assert(!pCap.contains("row_number"),
      s"approx cap must not rank the corpus:\n$pCap")
    assert(!pCap.contains("rangepartitioning"),
      s"approx cap must not global-sort anything:\n$pCap")
    assert(pCap.contains("BroadcastHashJoin"),
      s"threshold table must broadcast to the corpus side:\n$pCap")
  }

  test("round-10 sketches/linkage: probes broadcast, candidates stay equi-keyed") {
    // CMS probe: the <= d*w sketch broadcasts; nothing nested-loops
    val pCms = plan("q_cms_heavy_hitters")
    assert(pCms.contains("BroadcastHashJoin"),
      s"CMS sketch must broadcast at probe:\n$pCms")
    assert(!pCms.contains("CartesianProduct") &&
      !pCms.contains("BroadcastNestedLoopJoin"),
      s"non-equi join in the CMS probe:\n$pCms")
    // Bloom probe: position set broadcasts
    val pBloom = plan("q_bloom_probe")
    assert(pBloom.contains("BroadcastHashJoin"),
      s"bloom positions must broadcast at probe:\n$pBloom")
    assert(!pBloom.contains("CartesianProduct"),
      s"cartesian in the bloom probe:\n$pBloom")
    // HLL: no sort anywhere — registers are pure hash aggregation
    val pHll = plan("q_hll_distinct")
    assert(!pHll.contains("rangepartitioning"),
      s"HLL must not global-sort anything:\n$pHll")
    // entity resolution: pairwise stage is equi-keyed on the blocking
    // key (the levenshtein predicate is a residual, never a loop join)
    val pEr = plan("q_entity_resolution")
    assert(!pEr.contains("CartesianProduct") &&
      !pEr.contains("BroadcastNestedLoopJoin"),
      s"ER pairwise stage must stay blocked/equi-keyed:\n$pEr")
    // KN: assembly joins are keyed; top-k is TakeOrdered, no full sort
    val pKn = plan("q_kn_bigram")
    assert(pKn.contains("TakeOrderedAndProject"),
      s"KN top-k must plan TakeOrderedAndProject:\n$pKn")
  }

  test("graph operators: gated broadcast off ≡ on (pageRank, triangles)") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("src", "dst")
    val prOn = graft.operators.Graph.pageRank(edges).collect().toSet
    val prOff = graft.operators.Graph.pageRank(edges, broadcastMaxNodes = 0L)
      .collect().toSet
    assert(prOn == prOff, "pageRank gate must not change ranks")
    val tOn = graft.operators.Graph.triangleCount(edges).collect().toSet
    val tOff = graft.operators.Graph
      .triangleCount(edges, broadcastMaxEdges = 0L).collect().toSet
    assert(tOn == tOff, "triangleCount gate must not change counts")
  }

  test("graph operators: gated broadcast off ≡ on (LPA, shortestPaths, randomWalks)") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 1L))
      .toDF("src", "dst")
    val lpOn = graft.operators.Graph.labelPropagation(edges).collect().toSet
    val lpOff = graft.operators.Graph
      .labelPropagation(edges, broadcastMaxNodes = 0L).collect().toSet
    assert(lpOn == lpOff, "labelPropagation gate must not change labels")
    val starts = Seq(1L).toDF("node")
    val spOn = graft.operators.Graph.shortestPaths(edges, starts).collect().toSet
    val spOff = graft.operators.Graph
      .shortestPaths(edges, starts, broadcastMaxFrontier = 0L).collect().toSet
    assert(spOn == spOff, "shortestPaths gate must not change distances")
    val rwOn = graft.operators.Graph
      .randomWalks(edges, starts, walkLen = 3, walksPerNode = 2).collect().toSet
    val rwOff = graft.operators.Graph
      .randomWalks(edges, starts, walkLen = 3, walksPerNode = 2,
        broadcastMaxEdges = 0L).collect().toSet
    assert(rwOn == rwOff, "randomWalks gate must not change walks")
  }

  test("graph operators: gated broadcast off ≡ on (HITS, modularity, mutualKnn)") {
    import spark.implicits._
    val edges = Seq((1L, 10L), (2L, 10L), (3L, 11L), (1L, 11L))
      .toDF("src", "dst")
    val hOn = graft.operators.Graph.hits(edges, iters = 2).collect().toSet
    val hOff = graft.operators.Graph
      .hits(edges, iters = 2, broadcastMaxNodes = 0L).collect().toSet
    assert(hOn == hOff, "hits gate must not change scores")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 3L), (10L, 1L), (11L, 3L))
      .toDF("node", "label")
    val mOn = graft.operators.Graph.modularity(edges, labels).collect().toSet
    val mOff = graft.operators.Graph
      .modularity(edges, labels, broadcastMaxNodes = 0L).collect().toSet
    assert(mOn == mOff, "modularity gate must not change Q")
    val emb = graft.sources.Tables(spark, dir).embeddings
      .filter(org.apache.spark.sql.functions.col("vec_id") < 20)
    val kOn = graft.ext.Similarity.mutualKnn(emb, k = 3).collect().toSet
    // forcing the blocked path now takes BOTH gates to zero (row gate
    // guards the caller hint; the byte gate guards the stats path)
    val kOff = graft.ext.Similarity
      .mutualKnn(emb, k = 3, broadcastMaxRows = 0L, broadcastMaxBytes = 0L)
      .collect().toSet
    assert(kOn == kOff, "mutualKnn gate must not change pairs")
    // past the gate the pair space is hash-blocked into an equi-keyed
    // shuffle join — an oversized corpus must never degrade to a
    // single-task cartesian scan
    val offPlan = graft.ext.Similarity
      .mutualKnn(emb, k = 3, broadcastMaxRows = 0L, broadcastMaxBytes = 0L)
      .queryExecution.executedPlan.toString
    assert(!offPlan.contains("CartesianProduct") &&
      !offPlan.contains("BroadcastNestedLoopJoin"),
      s"mutualKnn past-gate fallback must be blocked, not cartesian:\n$offPlan")
  }

  test("mutualKnn size gate runs ZERO Spark jobs (stats / caller hint, never a count)") {
    val emb = graft.sources.Tables(spark, dir).embeddings
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // the parquet scan's file size is known to the optimizer → the
      // tiny table gates to the broadcast path with no job launched
      assert(graft.ext.Similarity.statsGate(emb,
        maxRows = 1000000L, maxBytes = 256L << 20, rowHint = None))
      // both gates at zero → blocked path, still zero jobs
      assert(!graft.ext.Similarity.statsGate(emb,
        maxRows = 0L, maxBytes = 0L, rowHint = None))
      // the caller's hint overrides stats entirely
      assert(!graft.ext.Similarity.statsGate(emb,
        maxRows = 10L, maxBytes = Long.MaxValue, rowHint = Some(11L)))
      // drain the async listener bus before reading the counter
      Thread.sleep(1000)
      assert(jobs.get() == 0,
        s"the size gate must plan from statistics, not run ${jobs.get()} job(s)")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("iterative graph plans: no cartesian product in any round") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("src", "dst")
    val starts = Seq(1L).toDF("node")
    def assertNoCartesian(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$name plans a cartesian:\n$p")
    }
    assertNoCartesian("pageRank", graft.operators.Graph.pageRank(edges))
    assertNoCartesian("labelPropagation", graft.operators.Graph.labelPropagation(edges))
    assertNoCartesian("kCore", graft.operators.Graph.kCore(edges))
    assertNoCartesian("randomWalks",
      graft.operators.Graph.randomWalks(edges, starts, walkLen = 2))
  }

  test("RFM buckets by broadcast cutoffs, not a global ntile window") {
    // the textbook ntile(5) OVER (ORDER BY ...) sorts every customer
    // in one task; the plan must instead broadcast the one-row
    // quantile cutoffs over the per-customer aggregate
    val p = plan("q_rfm")
    assert(!p.contains("Window"), s"q_rfm plans a window:\n$p")
    assert(p.contains("Broadcast"), s"q_rfm cutoffs must broadcast:\n$p")
  }

  test("KMV overlap: bounded-TreeSet partial agg, no pre-distinct, no corpus window") {
    // the sketch build must feed raw occurrences straight into the
    // idempotent aggregate — a distinct or window before it would
    // shuffle the whole key space (the thing the sketch replaces);
    // the one Window in the plan belongs to nothing (exact companion
    // is a join+count), and the overlap math runs on sketch rows only
    val p = plan("q_kmv_overlap")
    assert(p.contains("ObjectHashAggregate"), s"no object-hash agg:\n$p")
    assert(p.contains("partial_kmv_sketch"), s"sketch agg not partial:\n$p")
    assert(!p.contains("Window"), s"q_kmv_overlap plans a window:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in overlap:\n$p")
  }

  test("exact ANN top-k: bounded-heap partial agg, no corpus-wide window") {
    // VERDICT r10 #2: the exact path must not sort a query's whole
    // scored corpus in one task — TopKByScore under ObjectHashAggregate
    // with a partial (map-side) phase replaces the window.
    for (q <- Seq("q_sim_cosine_topk", "q_hard_negatives")) {
      val p = plan(q)
      assert(!p.contains("Window"), s"$q still plans a window:\n$p")
      assert(p.contains("ObjectHashAggregate"), s"$q lacks ObjectHashAggregate:\n$p")
      assert(p.contains("partial_top_k_by_score"), s"$q lacks partial top-k:\n$p")
    }
  }

  test("blocklist screen is a shuffle-free codegen'd map over the scan") {
    val p = plan("q_blocklist_filter")
    assert(!p.contains("Exchange"), s"blocklist gate must not shuffle:\n$p")
    assert(!p.contains("Window"), s"blocklist gate must not window:\n$p")
    // executedPlan.toString marks whole-stage codegen stages "*(n)";
    // the MultiMatch projection must sit inside one
    assert(p.contains("*(1) Project") && p.contains("multimatch"),
      s"MultiMatch fell out of whole-stage codegen:\n$p")
  }

  test("JL rerank: bounded-heap both stages, rerank probes joined by key") {
    val p = plan("q_sim_jl_rerank")
    assert(!p.contains("Window"), s"q_sim_jl_rerank plans a window:\n$p")
    assert(p.contains("partial_top_k_by_score"),
      s"JL stages lack the bounded-heap partial top-k:\n$p")
    // the only nested-loop allowed is the intended reduced-space
    // broadcast cross of the tiny query set; the full-width rerank
    // must be keyed hash joins
    assert(!p.contains("CartesianProduct"), s"cartesian in JL rerank:\n$p")
  }

  test("freq-items MG: partial object-hash agg, shuffle bounded by capacity") {
    val p = plan("q_freq_items")
    assert(p.contains("ObjectHashAggregate"), s"no object-hash agg:\n$p")
    assert(p.contains("partial_freq_items_mg"),
      s"MG summary must partial-aggregate map-side:\n$p")
    assert(!p.contains("Window"), s"q_freq_items plans a window:\n$p")
  }

  test("PIT feature join: two native as-of passes, no window, no cartesian") {
    val p = plan("q_pit_features")
    assert("AsofJoin".r.findAllIn(p).size >= 2,
      s"expected two chained AsofJoin operators:\n$p")
    assert(!p.contains("Window") && !p.contains("CartesianProduct"),
      s"PIT join regressed to window/cartesian:\n$p")
  }

  test("aggRefresh: batch partial-aggregates map-side before touching state") {
    val path = java.nio.file.Files.createTempDirectory("graft-aggref-plan").toString + "/t"
    val e = graft.sources.Tables(spark, dir).events
    // bootstrap writes state; the FOLD is the plan under audit
    graft.model.Incremental.aggRefresh(spark,
      e.filter(org.apache.spark.sql.functions.col("event_id") % 2 === 0), path,
      "event_type", org.apache.spark.sql.functions.round(
        org.apache.spark.sql.functions.col("value") * 100, 0),
      org.apache.spark.sql.functions.col("user_id"))
    val folded = graft.model.Incremental.aggRefresh(spark,
      e.filter(org.apache.spark.sql.functions.col("event_id") % 2 === 1), path,
      "event_type", org.apache.spark.sql.functions.round(
        org.apache.spark.sql.functions.col("value") * 100, 0),
      org.apache.spark.sql.functions.col("user_id"))
    val p = folded.queryExecution.executedPlan.toString
    // the returned rollup reads the two |keys|-bounded state tables —
    // no window, no cartesian, and partial aggregation everywhere
    assert(!p.contains("Window") && !p.contains("CartesianProduct"),
      s"aggRefresh rollup plan regressed:\n$p")
    assert(p.contains("HashAggregate"), s"no hash agg in rollup:\n$p")
  }

  test("MaxSim: broadcast query side, native fused expression, no window") {
    val p = plan("q_maxsim_topk")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"maxsim must broadcast the query side over the corpus scan:\n$p")
    assert(!p.contains("Window"),
      s"per-query top-k must be the bounded-heap agg, not a window:\n$p")
    assert(p.contains("maxsimscore") || p.contains("MaxSimScore"),
      s"scoring must be the native fused expression, not a composition:\n$p")
  }

  test("corpusDrift: the only corpus-proportional stage is the first count agg") {
    // audit the LAZY plan — the public operator checkpoints its
    // result, which would reduce the executed plan to an RDD scan
    val docs = graft.sources.Tables(spark, dir).documents
    val (lzy, counts) = graft.ext.Curation.corpusDriftLazy(docs, buckets = 64)
    val p = lzy.queryExecution.executedPlan.toString
    graft.ext.Checkpoints.release(counts)
    assert(!p.contains("Window") && !p.contains("CartesianProduct"),
      s"corpusDrift must stay window/cartesian-free:\n$p")
    // grid-side joins on the bounded sources×buckets table broadcast
    assert(p.contains("BroadcastHashJoin"),
      s"bounded grid joins should broadcast:\n$p")
  }

  test("rougeN: clip join is a co-keyed equi-join, no window, no cartesian") {
    import org.apache.spark.sql.functions._
    val d = graft.sources.Tables(spark, dir).documents
    val (lzy, cg, rg) = graft.ext.TextAnalysis.rougeNLazy(
      d.filter(col("doc_id") % 2 === 0).select(col("doc_id").as("pair_id"), col("text")),
      d.filter(col("doc_id") % 2 === 1).select((col("doc_id") - 1).as("pair_id"), col("text")))
    val p = lzy.queryExecution.executedPlan.toString
    graft.ext.Checkpoints.release(cg, rg)
    assert(!p.contains("Window") && !p.contains("CartesianProduct"),
      s"rougeN plan regressed:\n$p")
    assert(p.contains("Join"), s"the clip join must appear in the lazy plan:\n$p")
  }

  test("calibration: bins-keyed partial aggregation, no sort, no window") {
    val p = plan("q_eval_calibration")
    assert(!p.contains("Window") && !p.contains("Sort"),
      s"calibration must be pure hash aggregation:\n$p")
    assert(p.contains("HashAggregate"), s"no hash agg:\n$p")
  }

  test("aucRoc / ksTest: one corpus aggregation, then score-cardinality-bounded windows") {
    // the ONLY corpus-proportional stage is the first (group, score)
    // count agg — the cumulative windows run over its distinct-score
    // output (bounded by score cardinality, never corpus size). The
    // partial (map-side) aggregate before the exchange is the proof.
    for (name <- Seq("q_auc_roc", "q_ks_drift")) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"cartesian in $name:\n$p")
      assert(p.contains("partial_count") || p.contains("partial_sum"),
        s"$name lost its map-side combine before the shuffle:\n$p")
      assert(p.contains("Window"), s"$name should plan its bounded window:\n$p")
    }
    // PSI: same bounded-state shape, but window-free — pure keyed
    // aggregation over the (group, bin) grid
    val pp = plan("q_psi_drift")
    assert(!pp.contains("CartesianProduct") && !pp.contains("Window"),
      s"q_psi_drift must stay a windowless keyed aggregation:\n$pp")
    assert(pp.contains("partial_count") || pp.contains("partial_sum"),
      s"q_psi_drift lost its map-side combine:\n$pp")
  }

  test("corpusBleu: pure aggregation pipeline — no window, map-side combine present") {
    import org.apache.spark.sql.functions._
    val d = graft.sources.Tables(spark, dir).documents
    val (lzy, ids) = graft.ext.TextAnalysis.corpusBleuLazy(
      d.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id").as("pair_id"), col("text")),
      d.filter(col("doc_id") % 2 === 1)
        .select((col("doc_id") - 1).as("pair_id"), col("text")),
      2, "pair_id", "text")
    val p = lzy.queryExecution.executedPlan.toString
    graft.ext.Checkpoints.release(ids)
    // one-row scalar crossJoins at the tail are fine; a Window or an
    // un-combined gram shuffle is not
    assert(!p.contains("Window"), s"corpusBleu planned a window:\n$p")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"corpusBleu lost its map-side combine:\n$p")
  }

  test("adamicAdar: center-keyed wedge equi-join, no cartesian, gated degree broadcast") {
    val lp = SparkEntry.queries("q_adamic_adar")(spark, dir)
    val p = lp.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"q_adamic_adar wedge join degenerated:\n$p")
    graft.ext.Checkpoints.releaseAll(spark)
  }

  test("containment: token-keyed candidate join, no cartesian; gate off ≡ on") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b c d e f g h i j"), (2L, "a b c d e f"),
      (3L, "x y z w v u t s")).toDF("doc_id", "text")
    val on = graft.ext.Dedup.containmentJoin(d, threshold = 0.9)
      .collect().toSet
    val off = graft.ext.Dedup.containmentJoin(d, threshold = 0.9,
      broadcastMaxSets = 0L).collect().toSet
    assert(on == off, "verify-broadcast gate must not change pairs")
    val p = SparkEntry.queries("q_containment")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"),
      s"q_containment candidate join degenerated:\n$p")
    graft.ext.Checkpoints.releaseAll(spark)
  }

  test("chiSquare / PPR: keyed joins only — no cartesian, no window") {
    for (name <- Seq("q_chi_square", "q_ppr")) {
      val p = SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct") && !p.contains("Window"),
        s"$name plan degenerated:\n$p")
    }
    graft.ext.Checkpoints.releaseAll(spark)
  }

  test("featureHash / labelVote / periodogram / zipf: no corpus window, combine present") {
    // feature_hash & label_vote & periodogram: windowless keyed aggs;
    // zipf: the per-source top-K must be the bounded-heap
    // ObjectHashAggregate, never a rank window over the vocabulary
    for (name <- Seq("q_feature_hash", "q_label_vote", "q_periodogram",
        "q_zipf_slope")) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct") && !p.contains("Window"),
        s"$name plan degenerated:\n$p")
      assert(p.contains("partial"), s"$name lost its map-side combine:\n$p")
    }
    val pz = plan("q_zipf_slope")
    assert(pz.contains("ObjectHashAggregate"),
      s"zipf top-K must plan the bounded-heap aggregate:\n$pz")
  }

  test("fk audit: child pre-aggregates to distinct keys BELOW the anti-join") {
    // the orphan census must never row-level-join child×parent: the
    // child side collapses to (key, count) partials first, so the
    // anti-join moves distinct keys, not rows
    val p = plan("q_fk_audit")
    assert(p.contains("partial_count"),
      s"child side lost its pre-aggregation:\n$p")
    assert(p.contains("LeftAnti"), s"orphan check must plan an anti-join:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in q_fk_audit:\n$p")
  }

  test("round-15 stats (lazy plans): map-side combine present, no cartesian") {
    // the non-checkpointing statistics expose their full plan at the
    // top level: the raw stream must aggregate ONCE (map-side
    // combined) before any window
    for (q <- Seq("q_welch_ttest", "q_strat_ate", "q_lift_gain")) {
      val p = plan(q)
      assert(p.contains("partial_"), s"$q lost map-side combine:\n$p")
      assert(!p.contains("CartesianProduct"), s"cartesian in $q:\n$p")
    }
    graft.ext.Checkpoints.releaseAll(spark)
  }

  test("round-15 stats (checkpointed): every EXECUTED stage cartesian-free, combine present") {
    // kruskalWallis/brownForsythe/kendallW/cronbachAlpha/icc21/
    // quantileNormalize checkpoint their results (final plan = Scan
    // ExistingRDD), so audit the stages that actually RAN via the
    // QueryExecutionListener (the confidentJoint discipline)
    val plans = scala.collection.mutable.ArrayBuffer.empty[String]
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(name: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        plans.synchronized { plans += qe.executedPlan.toString }
      override def onFailure(name: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      for (q <- Seq("q_kruskal_wallis", "q_brown_forsythe", "q_kendall_w",
          "q_cronbach_alpha", "q_icc", "q_quantile_norm",
          "q_local_clustering"))
        SparkEntry.queries(q)(spark, dir).count()
      val deadline = System.currentTimeMillis() + 15000
      while (System.currentTimeMillis() < deadline &&
          !plans.synchronized(plans.exists(_.contains("partial_"))))
        Thread.sleep(100)
      val snap = plans.synchronized(plans.toSeq)
      assert(snap.nonEmpty, "listener captured no executed plans")
      snap.foreach { p =>
        assert(!p.contains("CartesianProduct"),
          s"a round-15 stat ran a cartesian stage:\n$p")
      }
      assert(snap.exists(_.contains("partial_")),
        "no executed stage shows map-side combine")
    } finally spark.listenerManager.unregister(listener)
    graft.ext.Checkpoints.releaseAll(spark)
  }

  test("round-16 queries: conversation dedup keyed-join only; token budget collapses to literals") {
    // conversation near-dups inherits jaccardPairs' guards: candidate
    // generation keyed on rare turn-trigram shingles, never a
    // cartesian or nested loop
    val cd = plan("q_conv_near_dups")
    assert(cd.contains("HashJoin") && !cd.contains("CartesianProduct") &&
      !cd.contains("BroadcastNestedLoopJoin"),
      s"q_conv_near_dups candidate-join shape:\n$cd")
    // the waterfill runs on the collected sources-sized table at
    // build time (the k-seed-collect discipline); the published plan
    // is a local relation projection — no shuffle survives
    val tb = plan("q_token_budget")
    assert(!tb.contains("Exchange") && !tb.contains("Join"),
      s"q_token_budget should publish a local allocation table:\n$tb")
  }

  test("round-17: conversation structure is a zero-shuffle map (transcript synthesis + fold)") {
    // transcript synthesis and the role-fold are both per-row
    // expressions; a corpus Exchange or any Join here would mean the
    // lint stopped being map-side and became a scale hazard
    val p = plan("q_conv_structure")
    assert(!p.contains("Exchange") && !p.contains("Join"),
      s"q_conv_structure must be a zero-shuffle per-row map:\n$p")
  }

  test("round-18: structured-output lint is a zero-shuffle map (transcript synthesis + fold + json checks)") {
    // fence fold, role tracking, and get_json_object validation are
    // all per-row expressions over already-folded block bodies; an
    // Exchange or Join here would mean the ingest gate re-scans or
    // shuffles the corpus
    val p = plan("q_struct_lint")
    assert(!p.contains("Exchange") && !p.contains("Join"),
      s"q_struct_lint must be a zero-shuffle per-row map:\n$p")
  }

  test("unpartitioned WindowExec inventory: exactly the known bounded-table windows") {
    // The bench tail logs `WindowExec: No Partition Defined` per
    // single-partition window stage. This pins WHICH queries plan
    // one, so the warnings are attributed instead of re-investigated
    // each round. Every member is a window over a BOUNDED table or a
    // pushed top-k — never a corpus-sized global sort:
    //  - q_cusum: running sum over the daily series (date-domain
    //    bounded — Timeseries.cusumChangepoint)
    //  - q_mix_diversity: group-size rank over the sources table
    //    (groups-bounded — Curation.mixDiversity)
    //  - q_data_mixture: the explicit Window.partitionBy() over the
    //    sources table (groups-bounded — Curation mixture weights)
    //  - q_fdr_bh: p-value rank over the tests table (one row per
    //    hypothesis, grp folded — hypothesis-count bounded)
    //  - q_kaplan_meier / q_nelson_aalen / q_logrank: cumulative
    //    windows over DISTINCT event times (time-domain bounded)
    //  - q_lift_gain / q_lr_eval: cumulative windows over the
    //    DISTINCT-score table (micro-rounded score domain, grp='all'
    //    literal folded out of the partition spec by Catalyst)
    //  - q_rrf_fusion: rank over two fused top-20 lists (≤40 rows
    //    by construction — TextAnalysis.rrfFuse; the per-modality
    //    retrievers did the heavy lifting)
    //  - q_pmi_collocations / q_textrank: global top-k rank + filter
    //    over vocab-derived tables — planned with a pushed limit
    //    (WindowGroupLimit, or LimitPushDownThroughWindow's
    //    TakeOrderedAndProject beneath the window), so each
    //    partition pre-prunes to k before the single reduce
    //    (asserted below)
    // A NEW query appearing here means a corpus-sized global window
    // sneaked in — bound it or justify it in this list.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.window.WindowExec
    def walk(p: SparkPlan): Seq[SparkPlan] = {
      val expanded = p match {
        case a: AdaptiveSparkPlanExec => a.initialPlan
        case x => x
      }
      expanded +: (expanded.children ++
        expanded.subqueries).flatMap(walk)
    }
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val hasGlobal = try {
        walk(SparkEntry.queries(name)(spark, dir)
          .queryExecution.executedPlan).exists {
            case w: WindowExec => w.partitionSpec.isEmpty
            case _ => false
          }
      } catch { case t: Throwable =>
        fail(s"planning $name errored: ${t.getMessage}")
      }
      if (hasGlobal) Some(name) else None
    }
    assert(offenders == Seq("q_cusum", "q_data_mixture", "q_fdr_bh",
      "q_kaplan_meier", "q_lift_gain", "q_logrank", "q_lr_eval",
      "q_mix_diversity", "q_nelson_aalen", "q_pmi_collocations",
      "q_rrf_fusion", "q_textrank"),
      s"unpartitioned-window query set changed: $offenders")
    // the corpus-derived top-k members must keep a pushed limit — a
    // bare global row_number would sort the whole candidate table on
    // one partition (q_rrf_fusion is exempt: its window INPUT is two
    // top-20 lists, bounded by construction)
    for (q <- Seq("q_pmi_collocations", "q_textrank")) {
      val p = plan(q)
      assert(p.contains("WindowGroupLimit") ||
        p.contains("TakeOrderedAndProject"),
        s"$q global top-k lost its pushed limit:\n$p")
    }
    graft.ext.Checkpoints.releaseAll(spark)
  }
}
