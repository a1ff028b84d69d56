package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Similarity search over an embedding column (`array<float>`):
  * brute-force cosine top-k as the exact baseline, and an IVF-style
  * (inverted-file) partitioned variant as the scale path.
  *
  * Scale design: brute force broadcasts the (small) query set against
  * the full corpus — a map-side cross product, no shuffle, O(Q·N·d).
  * IVF cuts N to the probed partitions: centroids are a tiny
  * broadcast table; each query scans only its nprobe nearest
  * partitions. At 100 TB the corpus would be written bucketed/
  * partitioned BY the coarse cluster id so a probe is a partition-
  * pruned scan, not a filter over everything.
  */
object Similarity {

  /** array<float> -> array<double>, the precision both engines agree
    * on for dot products. */
  private def asDouble(c: Column): Column =
    transform(c, x => x.cast(DoubleType))

  /** Left-to-right-summed dot product. Uses the native codegen'd
    * [[graft.expressions.DotProduct]] — bit-identical to the
    * higher-order-function fold (see foldDot) and to DuckDB's
    * list_dot_product, but stays inside whole-stage codegen. */
  def dot(a: Column, b: Column): Column = graft.expressions.DotProduct.dot(a, b)

  /** The built-in-composed fold (interpreted lambda path); kept as the
    * semantics reference the native expression is asserted against. */
  def foldDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Exact top-k neighbors for each query vector (default: vec_id <
    * numQueries as the query set). Excludes self-matches. */
  def bruteForceTopK(emb: DataFrame, k: Int = 10, numQueries: Int = 5,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // Norms are precomputed once per row (not once per pair): each of
    // the Q·N scored pairs then costs ONE dot product instead of
    // three. sqrt(dot(v,v)) is the same IEEE value either way, so
    // results are bit-identical to the per-pair formulation.
    val corpus = emb.select(col(idCol).as("nn_id"), asDouble(col(vecCol)).as("dv"))
      .withColumn("dn", sqrt(dot(col("dv"), col("dv"))))
    val queries = emb.filter(col(idCol) < numQueries)
      .select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
      .withColumn("qn", sqrt(dot(col("qv"), col("qv"))))
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col("nn_id") =!= col("query_id"))
      .select(col("query_id"), col("nn_id"),
        round(dot(col("qv"), col("dv")) / (col("qn") * col("dn")), 6).as("cos_sim"))
    topKExplode(scored, Seq("query_id"), k)
  }

  /** Two-phase exact per-query top-k: bounded-heap partial aggregation
    * ([[graft.expressions.TopKByScore]]) then posexplode — survivors
    * and ranks identical to `row_number over (partitionBy query_id
    * orderBy cos_sim desc, nn_id)`, but no task ever holds more than k
    * entries per query (the window form sorts the whole scored corpus
    * for a query in ONE task — a straggler at 100× scale). */
  private[graft] def topKExplode(scored: DataFrame, keys: Seq[String], k: Int,
      payload: Column = lit(0L), payloadAs: Option[String] = None): DataFrame = {
    val keyCols = keys.map(col)
    val exploded = scored.groupBy(keyCols: _*)
      .agg(graft.expressions.TopKByScore.topK(
        col("cos_sim"), col("nn_id"), payload, k).as("topk"))
      .select(keyCols :+ posexplode(col("topk")): _*)
    val outCols = keyCols ++ Seq(col("col.id").as("nn_id")) ++
      payloadAs.map(p => col("col.payload").as(p)).toSeq ++
      Seq(col("col.score").as("cos_sim"), (col("pos") + 1).as("rn"))
    exploded.select(outCols: _*)
  }

  /** Retrieval-quality metrics over the exact top-k ranking — the
    * evaluation loop the ANN family needs next to [[bruteForceTopK]]
    * and recall: per query, MRR, NDCG@k, and precision@k under
    * same-label relevance. DCG uses an exact integer weight table
    * (wᵢ = round(10⁹/log₂(i+1)) nano-units), so the per-query sums
    * are order-independent longs — the repo's exact-sum contract —
    * and the single final division is plain IEEE, replayable by the
    * oracle. IDCG is the prefix-sum of the same table at
    * min(R, k) where R = same-label corpus size minus self.
    *
    * Scale shape: the ranking is the bounded-heap top-k; labels
    * attach by keyed joins (query side broadcast); everything after
    * is queries×k rows. @return (query_id, n_rel, mrr, ndcg_at_k,
    * p_at_k). */
  def rankingMetrics(emb: DataFrame, k: Int = 10, numQueries: Int = 5,
      idCol: String = "vec_id", labelCol: String = "label"): DataFrame = {
    val w = (1 to k).map(i => math.round(1e9 / (math.log(i + 1.0) / math.log(2.0))))
    val prefix = w.scanLeft(0L)(_ + _).tail
    val ranked = bruteForceTopK(emb, k, numQueries, idCol)
    val labels = emb.select(col(idCol), col(labelCol))
    val qLab = labels.select(col(idCol).as("query_id"), col(labelCol).as("q_label"))
    val nLab = labels.select(col(idCol).as("nn_id"), col(labelCol).as("n_label"))
    val rel = ranked
      .join(broadcast(qLab), "query_id")
      .join(nLab, "nn_id")
      .withColumn("rel", (col("q_label") === col("n_label")).cast("long"))
      .withColumn("w", element_at(typedLit(w), col("rn").cast("int")))
    val labCount = labels.groupBy(labelCol).agg(count(lit(1)).as("n_lab"))
    val qRel = qLab.join(broadcast(labCount),
        qLab("q_label") === labCount(labelCol))
      .select(col("query_id"), (col("n_lab") - 1).as("r_total"))
    rel.groupBy("query_id")
      .agg(sum(col("rel") * col("w")).as("dcg_nano"),
        min(when(col("rel") === 1, col("rn"))).as("first_rel"),
        sum(col("rel")).as("n_rel"))
      .join(broadcast(qRel), "query_id")
      .select(col("query_id"), col("n_rel"),
        round(when(col("first_rel").isNotNull,
          lit(1.0) / col("first_rel")).otherwise(0.0), 6).as("mrr"),
        round(when(col("r_total") > 0,
            col("dcg_nano").cast("double") /
              element_at(typedLit(prefix),
                least(col("r_total"), lit(k)).cast("int")))
          .otherwise(0.0), 6).as("ndcg_at_k"),
        round(col("n_rel") / lit(k.toDouble), 6).as("p_at_k"))
  }

  /** Serving-shaped exact top-k: an ARRIVING query set (a micro-batch
    * in streaming, an RPC batch in serving) against a static corpus.
    * The query side is the small side by construction and broadcasts;
    * scoring is a map over the corpus; the only window is per-query
    * top-k. Used by `StreamingOps` inside foreachBatch — the
    * composition that turns the ANN family into an online service.
    * Same output columns as [[bruteForceTopK]], but WITHOUT its
    * self-exclusion — see the note below.
    */
  def serveTopK(queries: DataFrame, corpus: DataFrame, k: Int = 10,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("nn_id"), asDouble(col(vecCol)).as("dv"))
      .withColumn("dn", sqrt(dot(col("dv"), col("dv"))))
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
      .withColumn("qn", sqrt(dot(col("qv"), col("qv"))))
    // NO self-exclusion here: queries and corpus are DISTINCT id
    // spaces in the serving contract (a request id coinciding with a
    // corpus id is a coincidence, not identity) — the self-join eval
    // operators exclude, a server must not. Callers sharing one id
    // space filter `query_id =!= nn_id` downstream.
    val scored = c.crossJoin(broadcast(q))
      .select(col("query_id"), col("nn_id"),
        round(dot(col("qv"), col("dv")) / (col("qn") * col("dn")), 6).as("cos_sim"))
    topKExplode(scored, Seq("query_id"), k)
  }

  /** ColBERT-style late-interaction (MaxSim) retrieval: each stored
    * vector is read as `nTokens` fixed-width token sub-vectors of
    * `tokenDim` dims (a multi-vector representation packed into one
    * embedding column — the layout a token-level encoder would emit),
    * and score(q, d) = Σ_i max_j cos(q_i, d_j): every query token
    * matches its best document token, summed over query tokens
    * (Khattab & Zaharia, SIGIR 2020). This ranks differently from
    * single-vector cosine — a document strong on EVERY query facet
    * beats one globally similar — which is why late interaction is
    * the reranking layer modern retrieval stacks add above pooled
    * ANN.
    *
    * Scale shape: identical to [[bruteForceTopK]] — token slices and
    * per-token norms are computed ONCE per row map-side (never per
    * pair), the query side broadcasts, scoring is a zero-shuffle
    * projection (nTokens² codegen'd [[graft.expressions.DotProduct]]
    * terms per pair), and the only aggregation is the bounded-heap
    * top-k. Zero-norm tokens score 0 by contract (no NaN poisoning).
    * All arithmetic is fixed-order IEEE (greatest over identical
    * doubles, left-to-right i-sum), so the DuckDB oracle replays the
    * exact ranking. */
  def maxSimTopK(emb: DataFrame, k: Int = 10, numQueries: Int = 5,
      nTokens: Int = 8, tokenDim: Int = 8, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val corpus = emb.select(col(idCol).as("nn_id"), asDouble(col(vecCol)).as("dv"))
    val queries = emb.filter(col(idCol) < numQueries)
      .select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col("nn_id") =!= col("query_id"))
      .select(col("query_id"), col("nn_id"),
        round(graft.expressions.MaxSimScore.maxSim(
          col("qv"), col("dv"), nTokens, tokenDim), 6).as("cos_sim"))
    topKExplode(scored, Seq("query_id"), k)
      .withColumnRenamed("cos_sim", "maxsim")
  }

  /** Built-in-composed MaxSim (slices + greatest of guarded cosines);
    * interpreted-path semantics reference the native [[maxSimTopK]]
    * expression is asserted against in ExtSpec — never the hot path. */
  private[graft] def maxSimComposed(qv: Column, dv: Column,
      nTokens: Int, tokenDim: Int): Column = {
    def tok(vc: Column, i: Int): Column = slice(vc, i * tokenDim + 1, tokenDim)
    def norm(vc: Column, i: Int): Column =
      sqrt(foldDot(tok(vc, i), tok(vc, i)))
    val terms = (0 until nTokens).map { i =>
      val js = (0 until nTokens).map { j =>
        val den = norm(qv, i) * norm(dv, j)
        when(den === 0.0, 0.0)
          .otherwise(foldDot(tok(qv, i), tok(dv, j)) / den)
      }
      if (js.size == 1) js.head else greatest(js: _*)
    }
    terms.reduce(_ + _)
  }

  /** Serving-shaped MaxSim: an ARRIVING query set against a static
    * corpus — [[serveTopK]]'s contract (no self-exclusion; the query
    * side is the small side by construction and broadcasts
    * unconditionally) with the late-interaction score. Used by
    * `StreamingOps.maxsimServeStream` inside foreachBatch — the
    * reranking-layer twin of the cosine ANN serving path. */
  def maxSimServe(queries: DataFrame, corpus: DataFrame, k: Int = 10,
      nTokens: Int = 8, tokenDim: Int = 8, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("nn_id"), asDouble(col(vecCol)).as("dv"))
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .select(col("query_id"), col("nn_id"),
        round(graft.expressions.MaxSimScore.maxSim(
          col("qv"), col("dv"), nTokens, tokenDim), 6).as("cos_sim"))
    topKExplode(scored, Seq("query_id"), k)
      .withColumnRenamed("cos_sim", "maxsim")
  }

  /** Mutual (reciprocal) k-nearest-neighbor pairs: (a, b) where each
    * is in the other's top-k — the high-precision near-duplicate /
    * same-entity candidate rule (a one-directional neighbor is often
    * a hub artifact; reciprocity filters hubness, the RNN heuristic
    * behind SNN clustering and two-tower dedup). Exact all-pairs
    * scoring over the given corpus: at 100 TB the input is an ANN
    * shortlist (IVF/LSH candidates), not the raw corpus — this exact
    * form is the recall oracle for that pipeline.
    *
    * Scale shape: the ranking reuses the bounded-heap top-k (never a
    * corpus-wide window); the query side broadcasts under the size
    * gate — decided from the caller's `rowCountHint` or the
    * optimizer's plan statistics, NEVER an eager count() job (a
    * gate-only corpus scan is real money at 100 TB; unknown stats
    * fall through to the blocked path) — and PAST the gate the pair
    * space is hash-blocked (corpus
    * keyed by id-hash % numBlocks, queries replicated per block) into
    * an equi-keyed shuffle join — the [[knnClassify]] fallback shape —
    * so an oversized input degrades to a partitioned N×N join, never
    * a single-task cartesian or a driver-sized broadcast; the
    * reciprocity check is ONE co-keyed self-join of the queries×k
    * ranked table (materialized once — it feeds both sides).
    *
    * @return (a_id, b_id, cos_sim, ra, rb) with a_id < b_id */
  /** ZERO-JOB broadcast gate: the caller's row hint wins; otherwise
    * the optimizer's plan statistics decide (parquet scans know file
    * bytes; CBO-analyzed tables know rows). Plans with unknown stats
    * report a Long.MaxValue-ish size and fall through to the blocked
    * path — the safe direction. Never runs a count() job: a gate-only
    * corpus scan is real money at 100 TB. */
  private[graft] def statsGate(df: DataFrame, maxRows: Long,
      maxBytes: Long, rowHint: Option[Long]): Boolean = rowHint match {
    case Some(n) => n <= maxRows
    case None =>
      val st = df.queryExecution.optimizedPlan.stats
      st.rowCount.map(_ <= BigInt(maxRows))
        .getOrElse(st.sizeInBytes <= BigInt(maxBytes))
  }

  def mutualKnn(emb: DataFrame, k: Int = 5, idCol: String = "vec_id",
      vecCol: String = "embedding",
      broadcastMaxRows: Long = 1000000L, numBlocks: Int = 64,
      rowCountHint: Option[Long] = None,
      broadcastMaxBytes: Long = 256L << 20): DataFrame = {
    val corpus = emb.select(col(idCol).as("nn_id"), asDouble(col(vecCol)).as("dv"))
      .withColumn("dn", sqrt(dot(col("dv"), col("dv"))))
    val queries = emb.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
      .withColumn("qn", sqrt(dot(col("qv"), col("qv"))))
    val pairs =
      if (statsGate(emb, broadcastMaxRows, broadcastMaxBytes, rowCountHint))
        corpus.crossJoin(broadcast(queries))
      else {
        val b = math.max(1, numBlocks)
        corpus.withColumn("blk",
            pmod(hash(col("nn_id")), lit(b)).cast(IntegerType))
          .join(queries.withColumn("blk",
            explode(sequence(lit(0), lit(b - 1)))), "blk")
          .drop("blk")
      }
    val scored = pairs
      .filter(col("nn_id") =!= col("query_id"))
      .select(col("query_id"), col("nn_id"),
        round(dot(col("qv"), col("dv")) / (col("qn") * col("dn")), 6).as("cos_sim"))
    val ranked = topKExplode(scored, Seq("query_id"), k).localCheckpoint()
    val out = ranked.alias("a")
      .join(ranked.alias("b"),
        col("b.query_id") === col("a.nn_id") &&
          col("b.nn_id") === col("a.query_id"))
      .filter(col("a.query_id") < col("a.nn_id"))
      .select(col("a.query_id").as("a_id"), col("a.nn_id").as("b_id"),
        col("a.cos_sim").as("cos_sim"),
        col("a.rn").as("ra"), col("b.rn").as("rb"))
      .localCheckpoint()
    graft.ext.Checkpoints.release(ranked)
    out
  }

  /** Embedding-space drift per label/source — the dense-vector twin
    * of [[Curation.corpusDrift]]: when a source is re-crawled or an
    * encoder is re-run, the cheapest first-order check is whether
    * each group's centroid moved against the corpus centroid. Emits
    * per group the micro-L2 shift and the centroid cosine (a cosine
    * well below 1 means the group points somewhere else in embedding
    * space — re-cluster / re-index before serving).
    *
    * Exactness contract: per-dim values micro-round BEFORE summing
    * (the centroidClassify discipline), so centroid fitting is
    * order-free long arithmetic; both distances are computed from
    * the INTEGER centroids with one sqrt/division each, 6dp-rounded.
    *
    * Scale shape: one (label, dim) shuffle with map-side partial
    * sums; everything after lives on the labels×dims table.
    *
    * @return (label, n_vecs, l2_micro, cos_micro) */
  def embedDrift(emb: DataFrame, labelCol: String = "label",
      vecCol: String = "embedding"): DataFrame = {
    val dims = emb.select(col(labelCol).as("label"),
        posexplode(asDouble(col(vecCol))))
      .select(col("label"), col("pos").as("d"),
        round(col("col") * 1e6, 0).cast(LongType).as("vm"))
    val perLD = dims.groupBy("label", "d")
      .agg(sum(col("vm")).as("s"), count(lit(1)).as("n"))
      .localCheckpoint() // labels×dims-bounded; feeds both centroids
    val cl = perLD.select(col("label"), col("d"), col("n"),
      round(col("s").cast(DoubleType) / col("n").cast(DoubleType), 0)
        .cast(LongType).as("c"))
    val cg = perLD.groupBy("d")
      .agg(round(sum(col("s")).cast(DoubleType) /
          sum(col("n")).cast(DoubleType), 0)
        .cast(LongType).as("g"))
    val out = cl.join(broadcast(cg), "d")
      .groupBy("label")
      .agg(max(col("n")).as("n_vecs"),
        sum((col("c") - col("g")) * (col("c") - col("g"))).as("l2sq"),
        sum(col("c") * col("g")).as("dotlg"),
        sum(col("c") * col("c")).as("nl2"),
        sum(col("g") * col("g")).as("ng2"))
      .select(col("label"), col("n_vecs"),
        round(sqrt(col("l2sq").cast(DoubleType)), 0).cast(LongType)
          .as("l2_micro"),
        round(when(col("nl2") > 0 && col("ng2") > 0,
            col("dotlg").cast(DoubleType) /
              (sqrt(col("nl2").cast(DoubleType)) *
                sqrt(col("ng2").cast(DoubleType))) * 1e6)
          .otherwise(0.0), 0).cast(LongType).as("cos_micro"))
      .localCheckpoint()
    graft.ext.Checkpoints.release(perLD)
    out
  }

  /** Metadata-filtered exact ANN: top-k among only the corpus rows
    * satisfying `corpusPred` (pre-filter semantics — the production
    * "search within label/language/license" shape). The predicate is
    * applied BEFORE scoring, so Catalyst pushes it into the corpus
    * scan (with a cluster/label-partitioned layout it becomes
    * partition pruning) and the Q·N' cross scoring touches only
    * survivors — filtered ANN costs less than unfiltered, never more
    * (post-filter top-k would return short lists instead). */
  def filteredTopK(emb: DataFrame, corpusPred: Column, k: Int = 10,
      numQueries: Int = 5, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val corpus = emb.filter(corpusPred)
      .select(col(idCol).as("nn_id"), asDouble(col(vecCol)).as("dv"))
      .withColumn("dn", sqrt(dot(col("dv"), col("dv"))))
    val queries = emb.filter(col(idCol) < numQueries)
      .select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
      .withColumn("qn", sqrt(dot(col("qv"), col("qv"))))
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col("nn_id") =!= col("query_id"))
      .select(col("query_id"), col("nn_id"),
        round(dot(col("qv"), col("dv")) / (col("qn") * col("dn")), 6).as("cos_sim"))
    topKExplode(scored, Seq("query_id"), k)
  }

  /** Map-side cluster argmax over a driver-side centroid list:
    * greatest over (score, -cluster) structs picks the highest score
    * with ties to the LOWEST cluster id (structs order
    * lexicographically) — exactly
    * row_number() OVER (ORDER BY score DESC, cluster) = 1, with no
    * shuffle/window: the centroid list is baked into the projection as
    * literals, so assignment is one narrow pass over the corpus.
    * greatest() needs ≥2 args — a single centroid means that cluster. */
  private def argmaxCluster(cents: Seq[(Int, Seq[Double])])(
      score: Seq[Double] => Column): Column =
    if (cents.size == 1) lit(cents.head._1)
    else -greatest(cents.map { case (cid, cv) =>
      struct(score(cv).as("s"), lit(-cid).as("nc")) }: _*).getField("nc")

  /** Lloyd's k-means over L2-normalized vectors (cosine geometry) —
    * the IVF coarse quantizer. Distributed assign/update; ONLY the
    * k×d centroid table ever touches the driver (the standard Spark
    * k-means shape — no data collect). Deterministic AND
    * engine-portable: seeds are the k lowest-id vectors; assignment is
    * a map-side argmax with ties to the lowest cluster id; centroid
    * averaging accumulates each component in integer MICRO-UNITS
    * (sum of round(x·1e6) as long, then /n/1e6 on the driver) so the
    * result is independent of summation order — a second engine
    * replaying the same iterations lands on bit-identical centroids,
    * which is what lets the q_sim_ivf_topk DuckDB oracle hash-check
    * the whole index build. The ≤1e-6 per-component quantization is
    * noise for a coarse quantizer (ExtSpec's full-probe ≡ brute-force
    * and recall-monotonicity invariants are unaffected).
    *
    * @return (assignments: idCol/cluster, centroids: cluster/centroid)
    */
  def kmeans(emb: DataFrame, k: Int = 8, iters: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding"): (DataFrame, DataFrame) = {
    val spark = emb.sparkSession
    import spark.implicits._
    val nv = {
      val v = asDouble(col(vecCol))
      // localCheckpoint (not cache): reused every iteration, and the
      // blocks are released with the RDD instead of pinning the store
      emb.select(col(idCol).as("id"),
        transform(v, x => x / sqrt(dot(v, v))).as("nv")).localCheckpoint()
    }
    var cents: Seq[(Int, Seq[Double])] =
      nv.orderBy("id").limit(k).collect().zipWithIndex
        .map { case (r, i) => (i, r.getSeq[Double](1)) }.toSeq
    var assign: DataFrame = null
    for (_ <- 0 until iters) {
      assign = nv.withColumn("cluster",
          argmaxCluster(cents)(cv => dot(col("nv"), typedLit(cv))))
        .select(col("id"), col("cluster"))
      cents = assign.join(nv, "id")
        .select(col("cluster"), posexplode(col("nv")).as(Seq("pos", "v")))
        .groupBy("cluster", "pos")
        .agg(sum(round(col("v") * 1e6, 0).cast(LongType)).as("s"),
          count(lit(1)).as("n"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (cid, rows) =>
          (cid, rows.sortBy(_.getInt(1))
            .map(r => r.getLong(2).toDouble / r.getLong(3) / 1e6).toSeq) }
        .toSeq.sortBy(_._1)
    }
    (assign.withColumnRenamed("id", idCol),
      cents.toDF("cluster", "centroid"))
  }

  /** IVF search: route each query to its `nprobe` nearest coarse
    * centroids, scan only those partitions, exact top-k within them.
    * With nprobe = k this is exactly brute force (tested). At 100 TB
    * the corpus is written partitioned BY cluster so a probe is a
    * partition-pruned scan, not a filter. */
  def ivfTopK(emb: DataFrame, k: Int = 10, numQueries: Int = 5, nprobe: Int = 2,
      nClusters: Int = 8, kmeansIters: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val (assign, cents) = kmeans(emb, nClusters, kmeansIters, idCol, vecCol)
    val queries = emb.filter(col(idCol) < numQueries)
      .select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("csim").desc, col("cluster"))
    val probes = queries.crossJoin(broadcast(cents))
      .withColumn("csim", cosine(col("qv"), col("centroid")))
      .withColumn("prn", row_number().over(probeW))
      .filter(col("prn") <= nprobe)
      .select(col("query_id"), col("qv"), col("cluster"))
    val corpus = emb.select(col(idCol).as("nn_id"), asDouble(col(vecCol)).as("dv"))
      .join(assign.select(col(idCol).as("nn_id"), col("cluster")), "nn_id")
    val scored = corpus.withColumn("dn", sqrt(dot(col("dv"), col("dv"))))
      .join(broadcast(probes.withColumn("qn", sqrt(dot(col("qv"), col("qv"))))),
        Seq("cluster"))
      .filter(col("nn_id") =!= col("query_id"))
      .select(col("query_id"), col("nn_id"),
        round(dot(col("qv"), col("dv")) / (col("qn") * col("dn")), 6).as("cos_sim"))
    topKExplode(scored, Seq("query_id"), k)
  }

  /** Non-iterative IVF ("flat" coarse quantizer): centroids are the
    * nClusters lowest-id vectors — no Lloyd averaging, so index build
    * and search are pure deterministic arithmetic that a second engine
    * replays bit-for-bit (the DuckDB oracle hash-checks this end to
    * end, which the k-means variant can't offer because float
    * averaging is summation-order-dependent).
    *
    * Scale shape: cluster assignment is a single MAP-SIDE projection —
    * the centroid list is a broadcast-sized literal and `greatest` over
    * (cosine, -cluster) structs picks the argmax without any
    * shuffle/window, so the index build is one narrow pass over the
    * corpus. Only the candidate rows from probed clusters reach the
    * per-query top-k window. At 100 TB the corpus is written
    * partitioned BY `cluster` so a probe is a partition-pruned scan. */
  def ivfFlatTopK(emb: DataFrame, k: Int = 10, numQueries: Int = 5,
      nprobe: Int = 2, nClusters: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val corpus = emb.select(col(idCol).as("nn_id"), asDouble(col(vecCol)).as("dv"))
    // nClusters×dim doubles — the only driver collect, same as k-means
    val cents: Seq[(Int, Seq[Double])] =
      corpus.orderBy("nn_id").limit(nClusters).collect()
        .zipWithIndex.map { case (r, i) => (i, r.getSeq[Double](1)) }.toSeq
    def cosTo(v: Column, cv: Seq[Double]): Column = {
      val c = typedLit(cv)
      dot(v, c) / (sqrt(dot(v, v)) * sqrt(dot(c, c)))
    }
    val assigned = corpus.withColumn("cluster",
      argmaxCluster(cents)(cv => cosTo(col("dv"), cv)))
    val queries = emb.filter(col(idCol) < numQueries)
      .select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val pw = Window.partitionBy(col("query_id"))
      .orderBy(col("csim").desc, col("cluster"))
    val probes = queries
      .crossJoin(broadcast(cents.toDF("cluster", "cv")))
      .withColumn("csim", cosine(col("qv"), col("cv")))
      .withColumn("prn", row_number().over(pw)).filter(col("prn") <= nprobe)
      .select(col("query_id"), col("qv"), col("cluster"))
    val scored = assigned.withColumn("dn", sqrt(dot(col("dv"), col("dv"))))
      .join(broadcast(probes.withColumn("qn", sqrt(dot(col("qv"), col("qv"))))),
        Seq("cluster"))
      .filter(col("nn_id") =!= col("query_id"))
      .select(col("query_id"), col("nn_id"),
        round(dot(col("qv"), col("dv")) / (col("qn") * col("dn")), 6).as("cos_sim"))
    topKExplode(scored, Seq("query_id"), k)
  }

  /** SemDeDup-shaped semantic dedup: partition the embedding space
    * with a coarse quantizer (deterministic flat seeds — the
    * nClusters lowest-id vectors, as [[ivfFlatTopK]]), then compare
    * pairs ONLY within a cluster and drop every vector that has a
    * lower-id partner with cosine ≥ `threshold`. The cluster blocking
    * is what makes embedding dedup tractable at corpus scale: the
    * quadratic pairwise step runs per-cluster (shuffle keyed on
    * cluster id, N²/k pairs instead of N²), the published SemDeDup
    * recipe. Complements [[cosineNearDupPairs]] (hyperplane-LSH
    * blocking): k-means blocking has no band false-negatives within a
    * cluster but misses cross-cluster pairs; LSH is probabilistic
    * both ways — a production pipeline picks by corpus geometry.
    *
    * Returns every vector with its cluster, the count of lower-id
    * near-dup partners, and `is_kept` (no such partner — exactly one
    * keeper per duplicate chain, lowest id). */
  def semanticDedup(emb: DataFrame, nClusters: Int = 8,
      threshold: Double = 0.35,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val corpus = emb.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    val cents: Seq[(Int, Seq[Double])] =
      corpus.orderBy("id").limit(nClusters).collect()
        .zipWithIndex.map { case (r, i) => (i, r.getSeq[Double](1)) }.toSeq
    def cosTo(v: Column, cv: Seq[Double]): Column = {
      val c = typedLit(cv)
      dot(v, c) / (sqrt(dot(v, v)) * sqrt(dot(c, c)))
    }
    val assigned = corpus
      .withColumn("cluster", argmaxCluster(cents)(cv => cosTo(col("v"), cv)))
      .withColumn("nm", sqrt(dot(col("v"), col("v"))))
    val a = assigned.select(col("cluster"),
      col("id").as("a_id"), col("v").as("va"), col("nm").as("na"))
    val bb = assigned.select(col("cluster"),
      col("id").as("b_id"), col("v").as("vb"), col("nm").as("nb"))
    val dups = a.join(bb, Seq("cluster"))
      .filter(col("a_id") < col("b_id"))
      .select(col("b_id"),
        round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
    val better = dups.groupBy(col("b_id")).agg(count(lit(1)).as("n_better"))
    assigned.select(col("id").as(idCol), col("cluster"))
      .join(better.withColumnRenamed("b_id", idCol), Seq(idCol), "left")
      .withColumn("n_better", coalesce(col("n_better"), lit(0L)))
      .withColumn("is_kept", col("n_better") === 0)
  }

  /** Scala-side left-to-right dot — the same IEEE fold DotProduct and
    * DuckDB's list_dot_product evaluate, for driver-side codebook
    * constants. */
  private def dotS(a: Seq[Double], b: Seq[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Product-quantization codebook: the vector space split into `m`
    * subspaces of dim/m dims; per subspace, `ks` centroids taken from
    * the ks lowest-id vectors' subvectors (flat seeds — deterministic
    * and engine-replayable; a production build would Lloyd-iterate
    * each subspace with the same integer-micro discipline as
    * [[kmeans]]). Returns codebook(j) = Seq of (code, centroid). */
  def pqCodebook(emb: DataFrame, m: Int = 8, ks: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding"): Seq[Seq[(Int, Seq[Double])]] = {
    val seeds: Seq[Seq[Double]] = emb
      .select(col(idCol), asDouble(col(vecCol)).as("dv"))
      .orderBy(idCol).limit(ks).collect()
      .map(_.getSeq[Double](1).toSeq).toSeq
    require(seeds.nonEmpty, "pqCodebook: embeddings table is empty — no seed vectors")
    val dim = seeds.head.length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val sub = dim / m
    (0 until m).map { j =>
      seeds.zipWithIndex.map { case (v, i) => (i, v.slice(j * sub, j * sub + sub)) }
    }
  }

  /** PQ encode: each vector compresses to `m` small codes (ks=16 →
    * 4 bits each; 64 doubles → 8 codes is a 64× storage cut — THE
    * technique for holding 100 TB of vectors in serving memory).
    * Per subspace the code is argmin-L2 to the subspace centroid,
    * computed as argmax of ip(x_j, c) − ½‖c‖² (equivalent ordering,
    * fewer terms) — a single MAP-SIDE projection over codebook
    * literals, ties to the lowest code: one narrow pass, no shuffle.
    * Output: idCol, c0..c{m-1}. */
  def pqEncode(emb: DataFrame, m: Int = 8, ks: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    pqEncodeWith(pqCodebook(emb, m, ks, idCol, vecCol), emb, idCol, vecCol)

  /** Encode against a caller-built codebook — lets [[pqTopK]] collect
    * the seed vectors once instead of once per stage. */
  private def pqEncodeWith(cb: Seq[Seq[(Int, Seq[Double])]], emb: DataFrame,
      idCol: String, vecCol: String): DataFrame = {
    val sub = cb.head.head._2.length
    val dv = asDouble(col(vecCol))
    val codes = cb.indices.map { j =>
      argmaxCluster(cb(j)) { cv =>
        dot(slice(dv, j * sub + 1, sub), typedLit(cv)) - lit(0.5 * dotS(cv, cv))
      }.as(s"c$j")
    }
    emb.select(col(idCol) +: codes: _*)
  }

  /** PQ top-k search (asymmetric distance computation): the query
    * stays exact; each corpus vector is scored from its codes alone —
    * approx_ip(q, x) = Σ_j ip(q_j, centroid[j][code_j(x)]). Each
    * subspace term is rounded to integer MICRO-UNITS before the sum,
    * so the score is an exact integer both engines agree on
    * (`ip_micro`), and ranking needs no float tolerance. The scan is
    * map-side (queries broadcast, codebooks literal); per-query top-k
    * is the only window. At 100 TB the codes table is 64× smaller
    * than the vectors — the whole corpus scan reads 8 bytes/row. */
  def pqTopK(emb: DataFrame, k: Int = 10, numQueries: Int = 5,
      m: Int = 8, ks: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cb = pqCodebook(emb, m, ks, idCol, vecCol)
    val sub = cb.head.head._2.length
    val enc = pqEncodeWith(cb, emb, idCol, vecCol)
      .withColumnRenamed(idCol, "nn_id")
    val queries = emb.filter(col(idCol) < numQueries)
      .select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val terms = (0 until m).map { j =>
      round(dot(slice(col("qv"), j * sub + 1, sub),
        element_at(typedLit(cb(j).map(_._2)), col(s"c$j") + 1)) * 1e6, 0)
        .cast(LongType)
    }
    // ip_micro is integer-exact below 2^53, so ranking it as the
    // heap's double score loses nothing; cast back to long on output
    val scoredPq = enc.crossJoin(broadcast(queries))
      .filter(col("nn_id") =!= col("query_id"))
      .select(col("query_id"), col("nn_id"), terms.reduce(_ + _).as("ip_micro"))
    scoredPq.groupBy("query_id")
      .agg(graft.expressions.TopKByScore.topK(
        col("ip_micro").cast(DoubleType), col("nn_id"), lit(0L), k).as("topk"))
      .select(col("query_id"), posexplode(col("topk")))
      .select(col("query_id"), col("col.id").as("nn_id"),
        col("col.score").cast(LongType).as("ip_micro"), (col("pos") + 1).as("rn"))
  }

  /** Hard-negative mining for contrastive training: for each query
    * vector, the top-k most similar corpus vectors with a DIFFERENT
    * label — the "looks like a positive but isn't" set that makes
    * embedding training data effective (random negatives are too easy
    * and teach nothing). Same scan shape as [[bruteForceTopK]] with a
    * label-inequality residual on the scoring join; at corpus scale
    * the candidate set comes from an ANN preselection, mining then
    * re-ranks candidates only.
    *
    * @return (query_id, query_label, nn_id, nn_label, cos_sim, rn).
    */
  def hardNegatives(emb: DataFrame, k: Int = 10, numQueries: Int = 5,
      idCol: String = "vec_id", vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    val c = emb.select(col(idCol).as("nn_id"),
        col(labelCol).cast(LongType).as("nn_label"),
        asDouble(col(vecCol)).as("dv"))
      .withColumn("dn", sqrt(dot(col("dv"), col("dv"))))
    val q = emb.filter(col(idCol) < numQueries)
      .select(col(idCol).as("query_id"),
        col(labelCol).cast(LongType).as("query_label"),
        asDouble(col(vecCol)).as("qv"))
      .withColumn("qn", sqrt(dot(col("qv"), col("qv"))))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("nn_id") =!= col("query_id") &&
        col("nn_label") =!= col("query_label"))
      .select(col("query_id"), col("query_label"), col("nn_id"),
        round(dot(col("qv"), col("dv")) / (col("qn") * col("dn")), 6).as("cos_sim"),
        col("nn_label"))
    topKExplode(scored, Seq("query_id", "query_label"), k,
        payload = col("nn_label"), payloadAs = Some("nn_label"))
      .select("query_id", "query_label", "nn_id", "nn_label", "cos_sim", "rn")
  }

  /** IVF-PQ combined index and search — the production serving shape
    * (FAISS IVFPQ): a coarse quantizer routes vectors to `nClusters`
    * inverted lists, and each vector stores only the PQ codes of its
    * RESIDUAL against its coarse centroid. Search probes `nprobe`
    * lists and scores candidates by ADC: approx ip(q, x) =
    * ip(q, centroid) + Σⱼ ip(qⱼ, residual-centroid[codeⱼ]). Every term
    * is rounded to integer MICRO-UNITS before summing, so the score is
    * an exact BIGINT a second engine reproduces bit-for-bit (the
    * DuckDB oracle replays build + encode + search end to end).
    *
    * Determinism: coarse centroids are the nClusters lowest-id
    * vectors; the residual codebook comes from the ks lowest-id
    * vectors' residuals, assigned on the driver with the SAME
    * left-to-right dot and lowest-cluster tie-break the map side uses.
    *
    * Scale shape: assignment, residual, and encoding are one narrow
    * map pass (centroids and codebooks ride as literals); only probed
    * lists are scanned at query time (partition-prunable when the
    * codes table is written partitioned by cluster); the codes table
    * reads ~m bytes per row instead of the full vector — the 64×
    * memory cut that makes 100 TB of vectors servable at all.
    */
  def ivfPqTopK(emb: DataFrame, k: Int = 10, numQueries: Int = 5,
      nprobe: Int = 2, nClusters: Int = 8, m: Int = 8, ks: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val corpus = emb.select(col(idCol).as("nn_id"), asDouble(col(vecCol)).as("dv"))
    val lowest = corpus.orderBy("nn_id").limit(math.max(nClusters, ks))
      .collect().map(_.getSeq[Double](1).toSeq).toSeq
    // empty corpus: no centroids to seed — empty result, right schema
    if (lowest.isEmpty)
      return emb.select(col(idCol).as("query_id"), col(idCol).as("nn_id"),
        lit(0L).as("ip_micro"), lit(0).as("rn")).limit(0)
    val cents: Seq[(Int, Seq[Double])] =
      lowest.take(nClusters).zipWithIndex.map { case (v, i) => (i, v) }
    def cosTo(v: Column, cv: Seq[Double]): Column = {
      val c = typedLit(cv)
      dot(v, c) / (sqrt(dot(v, v)) * sqrt(dot(c, c)))
    }
    val centArr = typedLit(cents.map(_._2))
    val resid = corpus
      .withColumn("cluster", argmaxCluster(cents)(cv => cosTo(col("dv"), cv)))
      .withColumn("rv", zip_with(col("dv"),
        element_at(centArr, col("cluster") + 1), (a, b) => a - b))
    // residual codebook seeds: driver-side assignment replays the
    // map-side argmax exactly (same left-to-right dot, same
    // lowest-cluster tie-break)
    def cosS(a: Seq[Double], b: Seq[Double]): Double =
      dotS(a, b) / (math.sqrt(dotS(a, a)) * math.sqrt(dotS(b, b)))
    val seedRes: Seq[Seq[Double]] = lowest.take(ks).map { v =>
      val best = cents.map { case (i, cv) => (cosS(v, cv), i) }
        .reduceLeft((x, y) => if (y._1 > x._1) y else x)
      v.zip(cents(best._2)._2).map { case (a, b) => a - b }
    }
    val dim = lowest.head.length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val sub = dim / m
    val cb: Seq[Seq[(Int, Seq[Double])]] = (0 until m).map { j =>
      seedRes.zipWithIndex.map { case (v, i) => (i, v.slice(j * sub, j * sub + sub)) }
    }
    val codes = (0 until m).map { j =>
      argmaxCluster(cb(j)) { cv =>
        dot(slice(col("rv"), j * sub + 1, sub), typedLit(cv)) -
          lit(0.5 * dotS(cv, cv))
      }.as(s"c$j")
    }
    val enc = resid.select(col("nn_id") +: col("cluster") +: codes: _*)
    val queries = emb.filter(col(idCol) < numQueries)
      .select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val pw = Window.partitionBy(col("query_id"))
      .orderBy(col("csim").desc, col("cluster"))
    val probes = queries
      .crossJoin(broadcast(cents.toDF("cluster", "cv")))
      .withColumn("csim", cosine(col("qv"), col("cv")))
      .withColumn("prn", row_number().over(pw)).filter(col("prn") <= nprobe)
      .select(col("query_id"), col("qv"), col("cluster"))
    val coarseTerm = round(dot(col("qv"),
      element_at(centArr, col("cluster") + 1)) * 1e6, 0).cast(LongType)
    val resTerms = (0 until m).map { j =>
      round(dot(slice(col("qv"), j * sub + 1, sub),
        element_at(typedLit(cb(j).map(_._2)), col(s"c$j") + 1)) * 1e6, 0)
        .cast(LongType)
    }
    val scoredIvfPq = enc.join(broadcast(probes), Seq("cluster"))
      .filter(col("nn_id") =!= col("query_id"))
      .select(col("query_id"), col("nn_id"),
        (coarseTerm +: resTerms).reduce(_ + _).as("ip_micro"))
    scoredIvfPq.groupBy("query_id")
      .agg(graft.expressions.TopKByScore.topK(
        col("ip_micro").cast(DoubleType), col("nn_id"), lit(0L), k).as("topk"))
      .select(col("query_id"), posexplode(col("topk")))
      .select(col("query_id"), col("col.id").as("nn_id"),
        col("col.score").cast(LongType).as("ip_micro"), (col("pos") + 1).as("rn"))
  }

  /** Symmetric int8 quantization of an embedding column: per-vector
    * max-abs scale, values in [-127, 127]. 4× storage cut — the
    * standard trick before shipping 100 TB of vectors; keep `scale` to
    * dequantize (x ≈ q * scale / 127). */
  def quantizeInt8(emb: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val v = asDouble(col(vecCol))
    val maxAbs = array_max(transform(v, x => abs(x)))
    emb.select(col(idCol),
      greatest(maxAbs, lit(1e-30)).as("scale"),
      transform(v, x => round(x / greatest(maxAbs, lit(1e-30)) * 127, 0)
        .cast("int")).as("q"))
  }

  /** Deterministic random hyperplanes, shared bit-for-bit with the
    * DuckDB oracle: component (j,i) = 2·(hex60(md5("j|i"))/2^60) − 1,
    * where hex60 is the first 15 hex chars of the digest. Both engines
    * evaluate the identical IEEE expression, so sign bits agree. */
  def hyperplanes(numPlanes: Int, dim: Int): Seq[Seq[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until numPlanes).map { j =>
      (0 until dim).map { i =>
        val hex = md.digest(s"$j|$i".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(15)
        2 * (java.lang.Long.parseLong(hex, 16).toDouble / math.pow(2, 60)) - 1
      }
    }
  }

  /** Embedding-cosine near-duplicate pairs via random-hyperplane LSH
    * (sign-bit signatures, banded like [[Dedup.lshCandidates]]) with
    * exact-cosine verification — no corpus×corpus cross product ever
    * forms. Candidate generation is a hash-partitioned self-join on
    * (band, key) buckets; the verify step joins vectors back onto the
    * (sparse) candidate set. This is the shape that survives 100 TB:
    * signatures are one map-side pass (numPlanes dot products/row) and
    * every join is keyed. Defaults (16 planes, 4-bit bands) suit the
    * synthetic low-threshold test; production near-dup at cosine ≥ 0.9
    * wants more planes (e.g. 64–256) for selectivity. */
  def cosineNearDupPairs(emb: DataFrame, threshold: Double,
      numPlanes: Int = 16, rowsPerBand: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val s = emb.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    val dim = emb.select(size(col(vecCol)).as("d")).head().getInt(0)
    val planes = hyperplanes(numPlanes, dim)
    val bits = planes.zipWithIndex.map { case (pl, j) =>
      when(dot(col("v"), typedLit(pl)) >= 0, 1).otherwise(0).as(s"bit$j") }
    val sig = s.select(col("id") +: bits: _*)
    val nBands = numPlanes / rowsPerBand
    val bandKeys = (0 until nBands).map { b =>
      struct(lit(b).as("band"),
        (0 until rowsPerBand).map(r =>
          col(s"bit${b * rowsPerBand + r}") * (1 << r)).reduce(_ + _).as("k"))
    }
    val exploded = sig.select(col("id"), explode(array(bandKeys: _*)).as("bk"))
    val cand = exploded.select(col("id").as("a_id"), col("bk"))
      .join(exploded.select(col("id").as("b_id"), col("bk")), Seq("bk"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
    val sn = s.withColumn("n", sqrt(dot(col("v"), col("v"))))
    cand
      .join(sn.select(col("id").as("a_id"), col("v").as("va"), col("n").as("na")), "a_id")
      .join(sn.select(col("id").as("b_id"), col("v").as("vb"), col("n").as("nb")), "b_id")
      .select(col("a_id"), col("b_id"),
        round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }

  /** Johnson–Lindenstrauss reduction of an embedding column: out
    * component j = ⟨v, plane_j⟩ over the deterministic
    * [[hyperplanes]] matrix — the REAL-VALUED twin of the sign-bit
    * signatures [[cosineNearDupPairs]] builds from the same planes.
    * One narrow map-side pass (outDim native dot products per row),
    * no shuffle. */
  def jlProject(emb: DataFrame, outDim: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val dim = emb.select(size(col(vecCol)).as("d")).head().getInt(0)
    val planes = hyperplanes(outDim, dim)
    emb.select(col(idCol), asDouble(col(vecCol)).as("v"))
      .withColumn("rv", array(planes.map(p => dot(col("v"), typedLit(p))): _*))
      .drop("v")
  }

  /** Project-then-rerank exact-in-the-shortlist ANN (JL coarse
    * search): score queries against the corpus in the outDim-wide
    * REDUCED space (outDim multiplies per pair instead of dim — an
    * 8× cheaper scan at outDim=8, dim=64), keep a per-query shortlist
    * via the bounded-heap top-k, then rerank ONLY the shortlist by
    * exact full-dimension cosine. The serving shape between
    * brute-force (exact, full-width scan) and IVF (pruned but
    * recall-bounded by nprobe): the full-width vectors are touched
    * for shortlist×queries rows only, joined back BY KEY — at 100 TB
    * the wide embedding table is read once map-side for projection
    * and then only point-probed.
    *
    * Both stages order by (rounded score desc, nn_id), so the
    * pipeline is deterministic end-to-end and a DuckDB oracle
    * replays projection, shortlist, and rerank bit-for-bit.
    *
    * @return (query_id, nn_id, cos_sim, rn) — exact cosines, ranked.
    */
  def jlTopK(emb: DataFrame, k: Int = 10, numQueries: Int = 5,
      outDim: Int = 8, shortlist: Int = 40,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val red = jlProject(emb, outDim, idCol, vecCol)
    val corpusR = red.select(col(idCol).as("nn_id"), col("rv").as("cv"))
      .withColumn("cn", sqrt(dot(col("cv"), col("cv"))))
    val queriesR = red.filter(col(idCol) < numQueries)
      .select(col(idCol).as("query_id"), col("rv").as("qv"))
      .withColumn("qn", sqrt(dot(col("qv"), col("qv"))))
    val scoredR = corpusR.crossJoin(broadcast(queriesR))
      .filter(col("nn_id") =!= col("query_id"))
      .select(col("query_id"), col("nn_id"),
        round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6).as("cos_sim"))
    val cand = topKExplode(scoredR, Seq("query_id"), shortlist)
      .select("query_id", "nn_id")
    // exact rerank: keyed point-probes of the full-width vectors
    val full = emb.select(col(idCol).as("__id"), asDouble(col(vecCol)).as("__fv"))
      .withColumn("__fn", sqrt(dot(col("__fv"), col("__fv"))))
    val rescored = cand
      .join(full.select(col("__id").as("query_id"), col("__fv").as("qv"),
        col("__fn").as("qn")), "query_id")
      .join(full.select(col("__id").as("nn_id"), col("__fv").as("cv"),
        col("__fn").as("cn")), "nn_id")
      .select(col("query_id"), col("nn_id"),
        round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6).as("cos_sim"))
    topKExplode(rescored, Seq("query_id"), k)
  }

  /** Nearest-centroid embedding classifier — the FineWeb-Edu-style
    * quality-classifier shape: fit per-label centroids on a train
    * split, classify everything else by nearest centroid, report the
    * confusion matrix. The train aggregation is one shuffle over
    * (label, dim) cells; the fitted model is a tiny k×d table collected
    * to the driver and baked into the scoring projection as literals,
    * so classification is a single narrow map-side pass — the exact
    * shape that scores 100 TB of embeddings with zero shuffle.
    *
    * Deterministic/portable like [[kmeans]]: components are summed in
    * integer micro-units and divided by the truncating integer `div`
    * (DuckDB `//` agrees), distances are squared-L2 in integer micro
    * space (|x|≤~1e6 ⇒ Σ over 64 dims ≤ ~3e14, far inside int64), and
    * argmin breaks ties toward the LOWEST label via least() over
    * (dist, label) structs — so a DuckDB oracle replays the fit AND
    * the classification bit-for-bit.
    *
    * @return (label, pred_label, n) confusion counts over the test
    *         split.
    */
  /** Integer-micro projection of an embedding column: each component
    * as round(x·1e6) in a long — the shared representation of the
    * centroid family ([[centroidClassify]], [[embedOutliers]]). */
  private def microVec(vecCol: String): Column =
    transform(asDouble(col(vecCol)), x => round(x * 1e6, 0).cast(LongType))

  /** Per-label integer-micro centroids over `rows` (expects columns
    * lbl, m from [[microVec]]): one (label, dim) shuffle, truncating
    * `div` for the mean so a DuckDB `//` replay is bit-identical.
    * Only the k×d model touches the driver. */
  private def fitCentroidsMicro(rows: DataFrame): Seq[(Long, Seq[Long])] =
    rows.select(col("lbl"), posexplode(col("m")).as(Seq("pos", "v")))
      .groupBy("lbl", "pos")
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      .withColumn("c", expr("s div n"))
      .select("lbl", "pos", "c")
      .collect()
      .groupBy(_.getLong(0))
      .map { case (l, rows) =>
        (l, rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq) }
      .toSeq.sortBy(_._1)

  /** Squared L2 distance from the micro vector column `m` to a
    * centroid literal — pure integer arithmetic (≤ ~3e14 over 64
    * dims, far inside int64). */
  private def microDist2(cv: Seq[Long]): Column =
    aggregate(zip_with(col("m"), typedLit(cv),
        (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, x) => acc + x)

  /** Simplified silhouette per label over the label-centroid model —
    * CLUSTER QUALITY as one number per class: s = (b − a)/max(a, b)
    * with a = distance to the own-label centroid and b = the nearest
    * OTHER centroid (the standard simplified silhouette — per-point
    * pair distances are replaced by centroid distances, the form
    * that scales). s → 1 means tight, well-separated labels; s ≤ 0
    * means the label's points sit closer to a rival centroid than
    * their own — the label-noise smell [[embedOutliers]] reads
    * point-by-point and [[centroidClassify]] reads as confusion.
    *
    * Exactness: centroids and squared distances are exact
    * integer-micro longs (the [[embedOutliers]] whole-table fit);
    * per-point s takes two IEEE sqrts and one division, micro-
    * rounded pre-average (order-free fold); the per-label mean is
    * one final division, 6dp. Fewer than 2 labels (no "other"
    * centroid exists) reports s = 0 for every label; a point
    * coinciding with both centroids (max = 0) scores 0.
    *
    * Scale shape: one k×d centroid fit (map-side combined; only the
    * model touches the driver), then a PURE MAP — every point
    * evaluates k literal centroid expressions, no join, no shuffle
    * beyond the label rollup.
    *
    * @return (label, n, silhouette) — silhouette 6dp */
  def silhouetteByLabel(emb: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", labelCol: String = "label"): DataFrame = {
    val micro = emb.select(col(idCol), col(labelCol).cast(LongType).as("lbl"),
      microVec(vecCol).as("m"))
    val cents = fitCentroidsMicro(micro)
    if (cents.size < 2)
      return micro.groupBy(col("lbl").as("label"))
        .agg(count(lit(1)).as("n"))
        .select(col("label"), col("n"), lit(0.0).as("silhouette"))
    // a² = own-label distance; b² = nearest rival (own label masked
    // to Long.MaxValue inside the least() fold)
    val a2 = cents.map { case (l, cv) =>
      when(col("lbl") === l, microDist2(cv)) }
      .reduce((x, y) => coalesce(x, y))
    val b2 = least(cents.map { case (l, cv) =>
      when(col("lbl") === l, lit(Long.MaxValue)).otherwise(microDist2(cv))
    }: _*)
    def d(c: Column) = c.cast(DoubleType)
    val aD = sqrt(d(a2)); val bD = sqrt(d(b2))
    val sMicro = when(greatest(aD, bD) <= 0.0, lit(0L))
      .otherwise(round((bD - aD) / greatest(aD, bD) * lit(1e6), 0)
        .cast(LongType))
    micro.select(col("lbl"), sMicro.as("s_micro"))
      .groupBy(col("lbl").as("label"))
      .agg(count(lit(1)).as("n"), sum(col("s_micro")).as("ssum"))
      .select(col("label"), col("n"),
        round(d(col("ssum")) / d(col("n")) / lit(1e6), 6).as("silhouette"))
  }

  def centroidClassify(emb: DataFrame, trainMod: Int = 5,
      idCol: String = "vec_id", vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    val micro = emb.select(col(idCol), col(labelCol).cast(LongType).as("lbl"),
      microVec(vecCol).as("m"))
    val cents = fitCentroidsMicro(micro.filter(col(idCol) % trainMod =!= 0))
    // no train rows at all (empty input, or every id on the test
    // split): nothing to predict with — empty confusion matrix
    if (cents.isEmpty)
      return micro.select(col("lbl").as("label"),
        col("lbl").as("pred_label"), lit(0L).as("n")).limit(0)
    def dist(cv: Seq[Long]): Column = microDist2(cv)
    // least() over (dist, label) structs = argmin with ties to the
    // lowest label — no shuffle, no window
    val pred =
      if (cents.size == 1) lit(cents.head._1)
      else least(cents.map { case (l, cv) =>
        struct(dist(cv).as("d"), lit(l).as("l")) }: _*).getField("l")
    micro.filter(col(idCol) % trainMod === 0)
      .select(col("lbl").as("label"), pred.as("pred_label"))
      .groupBy("label", "pred_label")
      .agg(count(lit(1)).as("n"))
  }

  /** Exact k-NN label prediction on the held-out split — the eval
    * harness for embedding-space labeling: every test vector
    * (id % trainMod == 0) takes the majority label of its `k` nearest
    * TRAIN vectors by integer-micro squared L2 (ties: nearer id, then
    * smaller label), reported as a confusion matrix. Pure integer
    * arithmetic end to end, so the DuckDB oracle replays distances,
    * ranking, and votes exactly.
    *
    * Scale shape: the held-out split is 1/trainMod of the corpus — a
    * FRACTION, not a bounded query set — so the broadcast is
    * size-gated like every other corpus-bound broadcast in the tree:
    * the test side broadcasts only while BOTH its row count stays at
    * or under `broadcastMaxTest` AND its estimated payload
    * (rows × (dim×8 B + per-row overhead), from the same stats pass
    * that sizes the exactness bound) stays at or under
    * `broadcastMaxTestBytes` — a row gate alone would let 10⁶
    * high-dimensional embedding rows (multiple GB) through Spark's
    * byte checks via the forced broadcast() hint and OOM the driver.
    * Past either gate the pair space is hash-blocked (train keyed by
    * nid % numBlocks, test replicated per block) into an equi-keyed
    * shuffle join, so no corpus fraction ever lands on the driver. Exact k-NN is
    * inherently Q×N either way — at corpus scale the candidate set
    * comes from an ANN preselection ([[ivfPqTopK]]/[[ivfFlatTopK]]);
    * this operator is the exact-evaluation contract those paths are
    * measured against.
    *
    * Exactness guard: the fast path holds micro components as DOUBLES
    * so the hot per-pair distance is ONE native codegen'd DotProduct
    * instead of an interpreted zip_with fold (10x on the cross
    * product). That is integer-exact only while every intermediate
    * (Σa², Σb², partial dot sums, their combination) stays below 2^53
    * — bounded by 4·dim·maxm² where maxm = max |component|·1e6. The
    * same stats pass that sizes the gate measures that bound; when it
    * is exceeded the distance falls back to the pure-long zip_with
    * fold (headroom 2^63), keeping the BIGINT oracle replay exact for
    * any input.
    *
    * @return (label, pred_label, n) confusion counts.
    */
  def knnClassify(emb: DataFrame, k: Int = 5, trainMod: Int = 5,
      idCol: String = "vec_id", vecCol: String = "embedding",
      labelCol: String = "label",
      broadcastMaxTest: Long = 1000000L,
      broadcastMaxTestBytes: Long = 128L << 20, numBlocks: Int = 64): DataFrame = {
    val microL = emb.select(col(idCol), col(labelCol).cast(LongType).as("lbl"),
      microVec(vecCol).as("ml"))
    // one narrow map-side-combined pass: test-split size (broadcast
    // gate) + the exactness bound inputs (max |micro|, dim)
    val st = microL.agg(
      count(when(col(idCol) % trainMod === 0, 1)).as("ntest"),
      max(aggregate(col("ml"), lit(0L),
        (acc, x) => greatest(acc, abs(x)))).as("maxm"),
      max(size(col("ml"))).as("dim")).head()
    val nTest = st.getLong(0)
    val maxM = if (st.isNullAt(1)) 0L else st.getLong(1)
    val dim = if (st.isNullAt(2)) 0L else st.getInt(2).toLong
    val doubleExact =
      4.0 * maxM.toDouble * maxM.toDouble * dim.toDouble < math.pow(2, 53)
    val micro =
      if (doubleExact)
        microL.select(col(idCol), col("lbl"),
          transform(col("ml"), x => x.cast(DoubleType)).as("m"))
          .withColumn("sq", dot(col("m"), col("m")))
      else microL.select(col(idCol), col("lbl"), col("ml").as("m"))
        .withColumn("sq", lit(0L))
    val test = micro.filter(col(idCol) % trainMod === 0)
      .select(col(idCol).as("tid"), col("lbl").as("true_lbl"),
        col("m").as("tm"), col("sq").as("tsq"))
    val train = micro.filter(col(idCol) % trainMod =!= 0)
      .select(col(idCol).as("nid"), col("lbl").as("n_lbl"),
        col("m").as("nm"), col("sq").as("nsq"))
    // Σ(a−b)² = Σa² + Σb² − 2·a·b — all terms integer-exact doubles
    // inside the measured 2^53 bound; else the pure-long fold
    val d2 =
      if (doubleExact) (col("tsq") + col("nsq") -
        lit(2.0) * dot(col("tm"), col("nm"))).cast(LongType)
      else aggregate(zip_with(col("tm"), col("nm"),
          (a, b) => (a - b) * (a - b)),
        lit(0L), (acc, x) => acc + x)
    // estimated broadcast payload: per test row, the vector (dim
    // doubles/longs at 8 B) plus id/label/Σ² fields and array header
    // — conservative enough that the byte gate trips before the
    // driver is at risk, cheap because dim rode along with the stats
    val estBytes = nTest * (dim * 8L + 64L)
    val pairs =
      if (nTest <= broadcastMaxTest && estBytes <= broadcastMaxTestBytes)
        train.crossJoin(broadcast(test))
      else {
        val b = math.max(1, numBlocks)
        train.withColumn("blk", pmod(col("nid"), lit(b)).cast(IntegerType))
          .join(test.withColumn("blk",
            explode(sequence(lit(0), lit(b - 1)))), "blk")
      }
    // nearest-k = top-k by NEGATED distance (exact below 2^53), ties
    // to the lowest nid — identical to the (d2 asc, nid asc) window
    val top = pairs
      .withColumn("d2", d2)
      .groupBy(col("tid"), col("true_lbl"))
      .agg(graft.expressions.TopKByScore.topK(
        (-col("d2")).cast(DoubleType), col("nid"),
        col("n_lbl").cast(LongType), k).as("topk"))
      .select(col("tid"), col("true_lbl"), posexplode(col("topk")))
      .select(col("tid"), col("true_lbl"), col("col.payload").as("n_lbl"))
    top.groupBy(col("tid"), col("true_lbl"), col("n_lbl"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("tid"), col("true_lbl"))
      .agg(min(struct((-col("cnt")).as("nc"), col("n_lbl").as("l"))).as("v"))
      .select(col("true_lbl").as("label"), col("v.l").as("pred_label"))
      .groupBy("label", "pred_label")
      .agg(count(lit(1)).as("n"))
  }

  /** Prototypicality-based outlier pruning (the SemDeDup-era data-
    * cleaning step): fit per-label centroids over the WHOLE table,
    * then flag every vector whose squared micro-distance to its OWN
    * label's centroid exceeds `threshold` — mislabeled or atypical
    * rows a curation pipeline drops or routes for review. The fit is
    * one (label, dim) shuffle; scoring is a zero-shuffle map over the
    * corpus with the k×d model inlined as a literal lookup
    * (element_at over a label→centroid map), so the 100 TB pass is a
    * narrow scan. Pure integer arithmetic end to end — the oracle
    * replays fit and distances exactly.
    *
    * @return (vec_id, label, dist_micro2, is_outlier)
    */
  def embedOutliers(emb: DataFrame, threshold: Long,
      idCol: String = "vec_id", vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    val micro = emb.select(col(idCol), col(labelCol).cast(LongType).as("lbl"),
      microVec(vecCol).as("m"))
    val cents = fitCentroidsMicro(micro)
    val centMap = map(cents.flatMap { case (l, cv) =>
      Seq(lit(l), typedLit(cv)) }: _*)
    micro
      .withColumn("dist_micro2",
        aggregate(zip_with(col("m"), element_at(centMap, col("lbl")),
            (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x))
      .select(col(idCol), col("lbl").as("label"), col("dist_micro2"),
        (col("dist_micro2") > threshold).as("is_outlier"))
  }

  /** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    * 1998): greedily pick k results balancing relevance against
    * redundancy — pick t maximizes λ·rel(c) − (1−λ)·max_{s∈S} sim(c,s)
    * over unpicked candidates c given already-picked S. The step that
    * turns a similarity top-k into a DIVERSE top-k (near-duplicate
    * hits waste result slots and training batches alike).
    *
    * Inputs are integer-micro tables (the portable-similarity
    * contract): `cands` (query_id, cid, rel_micro) — a bounded
    * per-query candidate list, e.g. [[bruteForceTopK]] output — and
    * `sims` (query_id, a, b, sim_micro) holding BOTH directions of
    * each candidate pair. λ = lambdaNum/lambdaDen; scoring is the
    * scale-free long `lambdaNum·rel − (lambdaDen−lambdaNum)·maxsim`,
    * ties to the lowest cid, so the greedy trace replays exactly.
    *
    * Scale shape: greedy selection is inherently sequential in k, but
    * every step is ONE bounded join + window over candidate-list-sized
    * tables (queries × ≤listK rows) — k small joins, never a
    * corpus-sized pass; all queries advance in parallel within each
    * step. The selected set is re-materialized per step so the loop's
    * plan stays flat (the connectedComponents discipline).
    *
    * @return (query_id, cid, pick_rank, rel_micro), pick_rank 1..k.
    */
  def mmrSelect(cands: DataFrame, sims: DataFrame, k: Int = 5,
      lambdaNum: Int = 7, lambdaDen: Int = 10): DataFrame = {
    require(k >= 1 && lambdaNum > 0 && lambdaNum < lambdaDen)
    val wRel = Window.partitionBy(col("query_id"))
      .orderBy(col("rel_micro").desc, col("cid"))
    val c0 = cands.select("query_id", "cid", "rel_micro").localCheckpoint()
    var selected = c0.withColumn("rn", row_number().over(wRel))
      .filter(col("rn") === 1)
      .select(col("query_id"), col("cid"), lit(1).as("pick_rank"),
        col("rel_micro"))
      .localCheckpoint()
    for (step <- 2 to k) {
      val rem = c0.join(selected.select(col("query_id"), col("cid")),
        Seq("query_id", "cid"), "left_anti")
      val msim = rem
        .join(sims.withColumnRenamed("a", "cid"), Seq("query_id", "cid"))
        .join(selected.select(col("query_id"), col("cid").as("b")),
          Seq("query_id", "b"))
        .groupBy(col("query_id"), col("cid"), col("rel_micro"))
        .agg(max(col("sim_micro")).as("maxsim"))
      val wScore = Window.partitionBy(col("query_id")).orderBy(
        (lit(lambdaNum) * col("rel_micro") -
          lit(lambdaDen - lambdaNum) * col("maxsim")).desc, col("cid"))
      val pick = msim.withColumn("rn", row_number().over(wScore))
        .filter(col("rn") === 1)
        .select(col("query_id"), col("cid"), lit(step).as("pick_rank"),
          col("rel_micro"))
      val prev = selected
      selected = prev.unionAll(pick).localCheckpoint()
      Checkpoints.release(prev) // folded into the new checkpoint
    }
    Checkpoints.release(c0) // the final selection is materialized
    selected
  }

  /** Top principal component of the embedding space by power
    * iteration — the anisotropy/collapse diagnostic for a learned
    * embedding table (a healthy space spreads variance; a collapsed
    * one parks most of it on one direction — `explained` near 1 is
    * the red flag). Mean and covariance are computed DISTRIBUTED in
    * exact integer micro space (per-dim micro means; covariance cells
    * round(Σ eᵢeⱼ / n) from exact long sums — map-side combinable to
    * dims² cells); the dims²-bounded cell table is then collected
    * (the centroid discipline) and `rounds` power-iteration steps run
    * driver-side under the iterated-float contract: every state
    * element squashes to 12dp per round, every fold is sequential in
    * index order, v₀ = 1/√dims per element (exactly representable
    * for power-of-two dims), so the DuckDB oracle unrolls the same
    * rounds bit-for-bit. No sign canonicalization: the iteration is
    * fully deterministic from v₀, so both engines land on the same
    * signed vector.
    *
    * @return one row per dimension: (d, mu_micro, pc1 — the
    *   eigenvector coordinate at 12dp, rounded to 6 for the report —
    *   plus the Rayleigh eigenvalue and explained-variance share
    *   replicated on every row, calibration-summary style) */
  /** Effective rank (participation ratio) of the embedding space —
    * (Σλ)²/Σλ² over the covariance spectrum, computed WITHOUT any
    * eigendecomposition via trace identities: Σλ = tr(C) and
    * Σλ² = tr(C²) = ‖C‖²_F = Σᵢⱼ cᵢⱼ². An isotropic d-dim space
    * scores d; a collapsed space scores ≈ 1 — the one-number
    * companion to [[pcaPower]]'s top direction.
    *
    * Exactness: the same integer-micro covariance cells as pcaPower,
    * re-rounded to unit-variance scale (c div-like round by 1e6) so
    * squares stay inside exact longs (documented bound: per-dim
    * variance ≤ ~4·10⁶ unit-scale keeps Σc² < 2⁶³ through 64 dims);
    * the ratio is one 6dp division. Fully distributed — the cells
    * never leave the cluster.
    *
    * @return one row: (dims, trace_units, frob2_units, eff_rank) */
  def effectiveRank(emb: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val vm = emb.select(col(idCol).as("id"),
        posexplode(asDouble(col(vecCol))))
      .select(col("id"), col("pos").as("j"),
        round(col("col") * 1e6, 0).cast(LongType).as("x"))
      .localCheckpoint()
    val mu = vm.groupBy("j").agg(
      round(sum(col("x")).cast(DoubleType) / count(lit(1)).cast(DoubleType), 0)
        .cast(LongType).as("m"))
    val cent = vm.join(broadcast(mu), Seq("j"))
      .select(col("id"), col("j"), (col("x") - col("m")).as("e"))
    val cov = cent.as("a").join(cent.as("b"), Seq("id"))
      .groupBy(col("a.j").as("i"), col("b.j").as("jj"))
      .agg(round(sum(col("a.e") * col("b.e")).cast(DoubleType) /
          count(lit(1)).cast(DoubleType), 0)
        .cast(LongType).as("c"))
      // micro² → unit-variance scale, so the Frobenius squares fold
      // as exact longs
      .withColumn("cr", round(col("c").cast(DoubleType) / 1e6, 0)
        .cast(LongType))
    val out = cov.agg(
        sum(when(col("i") === col("jj"), lit(1L)).otherwise(0L)).as("dims"),
        sum(when(col("i") === col("jj"), col("cr")).otherwise(0L))
          .as("trace_units"),
        sum(col("cr") * col("cr")).as("frob2_units"))
      .select(col("dims"), col("trace_units"), col("frob2_units"),
        round(when(col("frob2_units") === 0L, 0.0)
          .otherwise((col("trace_units") * col("trace_units"))
            .cast(DoubleType) / col("frob2_units").cast(DoubleType)), 6)
          .as("eff_rank"))
      .localCheckpoint()
    Checkpoints.release(vm)
    out
  }

  def pcaPower(emb: DataFrame, rounds: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = emb.sparkSession
    val vm = emb.select(col(idCol).as("id"),
        posexplode(asDouble(col(vecCol))))
      .select(col("id"), col("pos").as("j"),
        round(col("col") * 1e6, 0).cast(LongType).as("x"))
      .localCheckpoint() // two passes: mean, then centered self-join
    val mu = vm.groupBy("j").agg(
      round(sum(col("x")).cast(DoubleType) / count(lit(1)).cast(DoubleType), 0)
        .cast(LongType).as("m"))
    val cent = vm.join(broadcast(mu), Seq("j"))
      .select(col("id"), col("j"), (col("x") - col("m")).as("e"))
    val cov = cent.as("a").join(cent.as("b"), Seq("id"))
      .groupBy(col("a.j").as("i"), col("b.j").as("jj"))
      .agg(round(sum(col("a.e") * col("b.e")).cast(DoubleType) /
          count(lit(1)).cast(DoubleType), 0)
        .cast(LongType).as("c"))
    // dims²-bounded collects (64² = 4096 cells)
    val cells = cov.collect().map(r =>
      (r.getInt(0), r.getInt(1), r.getLong(2)))
    val mus = mu.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    Checkpoints.release(vm)
    val dims = mus.size
    val mat = Array.ofDim[Double](dims, dims)
    cells.foreach { case (i, j, c) => mat(i)(j) = c.toDouble }
    def r12(x: Double): Double =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    def dotSeq(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    import spark.implicits._
    val trace = cells.collect { case (i, j, c) if i == j => c }.sum
    // degenerate guard (matches effectiveRank's convention): a
    // single-vector or constant table has an all-zero covariance
    // (PSD ⇒ trace 0 ⟺ zero matrix) — power iteration would divide
    // by nrm=0 and emit NaN everywhere; pin pc1=0/eig=0/explained=0
    if (dims == 0 || trace == 0L)
      return (0 until dims).map(d => (d, mus(d), 0.0, 0.0, 0.0))
        .toDF("d", "mu_micro", "pc1", "eig", "explained")
    var v = Array.fill(dims)(1.0 / math.sqrt(dims.toDouble))
    for (_ <- 1 to rounds) {
      val w = mat.map(row => r12(dotSeq(row, v)))
      val nrm = math.sqrt(dotSeq(w, w))
      v = if (nrm == 0.0) w else w.map(x => r12(x / nrm))
    }
    val wFinal = mat.map(row => r12(dotSeq(row, v)))
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val eig = r6(dotSeq(v, wFinal))
    val explained = r6(dotSeq(v, wFinal) / trace.toDouble)
    (0 until dims).map(d =>
        (d, mus(d), r6(v(d)), eig, explained))
      .toDF("d", "mu_micro", "pc1", "eig", "explained")
  }
}
