package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators for LLM training-data pipelines: exact
  * (hash-groupBy), n-gram Jaccard, MinHash+LSH banding, SimHash.
  * Embedding-cosine near-dup lives in [[Similarity]].
  *
  * Scale design:
  *  - exact: one shuffle on the 128-bit fingerprint — the canonical
  *    100 TB dedup (fingerprints are uniform ⇒ no skew);
  *  - Jaccard is pairwise and only run within LSH/sample bounds —
  *    never all-pairs at scale;
  *  - MinHash: shingle explode is map-side; signatures are one shuffle
  *    on doc_id; banding joins hash-partition on (band, key) buckets,
  *    turning O(n²) similarity into per-bucket micro-joins;
  *  - SimHash: map-side token hashing + one shuffle on doc_id; the
  *    64 bit-sums are a single hash-agg pass.
  */
object Dedup {

  /** Exact dedup groups: fingerprint -> keeper (min id) + group size.
    * Join back on fingerprint to drop non-keepers. */
  def exactGroups(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    df.select(col(idCol), TextAnalysis.fingerprint(col(textCol)).as("fingerprint"))
      .groupBy("fingerprint")
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_docs"))

  /** Distinct word 3-gram shingles per doc: (id, gram). Docs with <3
    * tokens yield no shingles. Deduplication happens INSIDE each row
    * (array_distinct before the explode) — "distinct per doc" needs no
    * cross-row comparison, so the full (id, gram) table never
    * shuffles; the whole operator is map-side. */
  def wordTrigrams(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    df.select(col(idCol), toks.as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col(idCol), explode(expr(
        "array_distinct(transform(sequence(1, size(toks) - 2), " +
        "i -> concat(toks[i-1], ' ', toks[i], ' ', toks[i+1])))")).as("gram"))
  }

  /** n-gram Jaccard pairs over a keyspace-sampled subset (`idMod`
    * keeps ids ≡0 mod m). Two phases, both shuffle-keyed:
    * candidate generation joins only on grams with document frequency
    * ≤ `dfCap` (a hot shingle shared by n docs would otherwise emit n²
    * candidate rows — the cap bounds per-gram fanout to dfCap², the
    * standard guard at corpus scale), then the exact |∩| / |∪| is
    * computed over the FULL shingle sets of each surviving pair, so
    * the score is unaffected by the cap; only pairs whose every shared
    * gram is hot can be missed. localCheckpoint (not cache) so no
    * pinned blocks outlive the query in a long session. */
  def jaccardPairs(df: DataFrame, threshold: Double, idMod: Int = 5,
      dfCap: Int = 100,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sampled = df.filter(col(idCol) % idMod === 0)
    val sh = wordTrigrams(sampled, idCol, textCol).localCheckpoint()
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("n"))
    val rareGrams = sh.groupBy(col("gram"))
      .agg(count(lit(1)).as("gdf")).filter(col("gdf") <= dfCap)
      .select("gram")
    val rare = sh.join(rareGrams, Seq("gram"))
    val cand = rare.select(col(idCol).as("a_id"), col("gram"))
      .join(rare.select(col(idCol).as("b_id"), col("gram")), Seq("gram"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
    val shared = cand
      .join(sh.select(col(idCol).as("a_id"), col("gram")), "a_id")
      .join(sh.select(col(idCol).as("b_id2"), col("gram").as("gram_b")),
        col("b_id") === col("b_id2") && col("gram") === col("gram_b"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("n_shared"))
    shared
      .join(sizes.select(col(idCol).as("a_id"), col("n").as("na")), "a_id")
      .join(sizes.select(col(idCol).as("b_id"), col("n").as("nb")), "b_id")
      .withColumn("jaccard", round(col("n_shared").cast(DoubleType) /
        (col("na") + col("nb") - col("n_shared")), 6))
      .filter(col("jaccard") >= threshold)
      .select("a_id", "b_id", "jaccard")
  }

  /** Portable 60-bit hash both Spark and DuckDB compute identically:
    * first 15 hex chars of md5(input), parsed as hex — evaluated by
    * the native codegen'd [[graft.expressions.Md5Hash60]], which
    * reads the bits straight from the digest (no hex-string
    * round-trip; bit-equality with [[composedHash60]] is asserted in
    * ExtSpec). */
  def portableHash60(c: Column): Column =
    graft.expressions.Md5Hash60.hash60(c)

  /** The built-in-composed construction of the same hash (three
    * string ops per row) — kept as the semantics reference the native
    * expression is asserted against, and as documentation of the
    * DuckDB oracle contract (`CAST(concat('0x', substr(md5(c), 1,
    * 15)) AS BIGINT)`). */
  def composedHash60(c: Column, second: Boolean = false): Column =
    conv(substring(md5(c), 1 + (if (second) 15 else 0), 15), 16, 10)
      .cast(LongType)

  /** Portable seeded shingle hash. One 128-bit md5 digest yields TWO
    * independent 60-bit hashes (hex chars 1-15 and 16-30), so k seed
    * hashes cost only ceil(k/2) md5 evaluations per shingle — md5 is
    * the dominant map-side cost of MinHash at corpus scale. Seed i
    * reads half (i%2) of digest md5("(i/2)|gram"); the DuckDB oracles
    * compute the identical expression. */
  private def seedHash(seed: Int, gram: Column): Column =
    graft.expressions.Md5Hash60.hash60(
      concat(lit(seed / 2), lit("|"), gram), second = seed % 2 == 1)

  /** MinHash signatures from a precomputed (id, gram) shingle table —
    * lets pipelines cache the shingles once and derive signatures,
    * sizes, and verify joins from the same scan. (Measured: hoisting
    * the md5 digests into a pre-aggregate projection is SLOWER —
    * codegen subexpression elimination already dedupes the shared
    * digests across the k min-aggregate inputs.) */
  def minhashFromShingles(sh: DataFrame, numHashes: Int,
      idCol: String): DataFrame = {
    val aggs = (0 until numHashes).map(i => min(seedHash(i, col("gram"))).as(s"m$i"))
    sh.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash signatures: per doc, min seed-hash over its shingles for
    * each of `numHashes` seed functions. One row per doc with columns
    * m0..m{k-1}. */
  def minhashSignatures(df: DataFrame, numHashes: Int = 8,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    minhashFromShingles(wordTrigrams(df, idCol, textCol), numHashes, idCol)

  /** The banded key structs over a signature table's m0..m{n-1}
    * columns — shared by the self-join ([[lshCandidates]]) and the
    * cross-corpus ([[crossNearDups]]) banding. */
  private def bandStructs(numHashes: Int, rowsPerBand: Int): Seq[Column] = {
    val bands = numHashes / rowsPerBand
    (0 until bands).map { b =>
      val ks = (0 until rowsPerBand).map(r =>
        col(s"m${b * rowsPerBand + r}").as(s"k$r"))
      struct(lit(b).as("band") +: ks: _*)
    }
  }

  /** LSH banding over minhash signatures (r rows per band): docs
    * sharing all r minhashes of any band become candidate pairs.
    * Returns (a_id, b_id, n_shared_bands).
    *
    * `bucketCap` bounds the band-bucket self-join fan-out — the
    * classic LSH scale-killer: web corpora carry 10⁵–10⁷-sized
    * near-identical template families (empty pages, boilerplate), and
    * one hot band bucket would otherwise emit n² candidate rows. Each
    * bucket keeps only its `bucketCap` LOWEST ids (deterministic, so
    * the semantics replay cross-engine), capping per-bucket output at
    * cap²/2 pairs. The cap is computed with [[KmvSketchAgg]] — a
    * map-side-combinable bottom-k aggregate whose per-group state is ≤
    * cap longs — NOT a per-bucket window sort, so the hot bucket never
    * concentrates in one task and the shuffle carries ≤ cap ids per
    * bucket per map partition instead of the full membership. Pairs
    * inside an over-cap family beyond the kept ids are lost to THIS
    * path by design (mirroring [[jaccardPairs]]' `dfCap`); identical
    * docs are exact-dedup's job ([[exactGroups]] runs first in
    * [[graft.ext.Curation.curationPipeline]]), and the kept ids still
    * seed the family's cluster for [[connectedComponents]]. Buckets at
    * or under the cap (the overwhelming majority — that's the point of
    * banding) are emitted exactly.
    *
    * The default (1000) bounds any bucket to ≤ ~5·10⁵ pairs while
    * being far above real collision-bucket sizes for non-degenerate
    * corpora. */
  def lshCandidates(sigs: DataFrame, numHashes: Int = 8, rowsPerBand: Int = 2,
      idCol: String = "doc_id", bucketCap: Int = 1000): DataFrame = {
    val bandKeys = bandStructs(numHashes, rowsPerBand)
    // materialize the CAPPED banded table before the self-join: both
    // join sides reference it, and without a checkpoint the whole
    // upstream shingle→md5→minhash pipeline is evaluated twice (the
    // md5 digests are the dominant map-side cost of the dedup family).
    // The bottom-k agg shuffles on bk, so the post-checkpoint
    // self-join is on the same key the data was just partitioned by.
    val exploded = sigs.select(col(idCol), explode(array(bandKeys: _*)).as("bk"))
    val capped = exploded.groupBy(col("bk"))
      .agg(graft.expressions.KmvSketchAgg.kmv(col(idCol), bucketCap).as("ids"))
      .select(col("bk"), explode(col("ids")).as(idCol))
      .localCheckpoint()
    val l = capped.select(col(idCol).as("a_id"), col("bk"))
    val r = capped.select(col(idCol).as("b_id"), col("bk"))
    l.join(r, Seq("bk")).filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("n_shared_bands"))
  }

  /** The production near-dup shape: LSH candidates verified with exact
    * Jaccard — only candidate pairs ever pay the shingle-intersection
    * cost. The verify joins are plain keyed equi-joins on a_id/b_id —
    * the scale-safe default: a post-banding candidate set can still be
    * 10⁷+ pairs at corpus scale, so no broadcast is forced here; AQE
    * converts either side to a broadcast join at runtime when its
    * actual size is under the threshold, and falls back to shuffle
    * joins when it isn't (no driver OOM path). localCheckpoint (not
    * cache) so no pinned blocks outlive the query in a long session. */
  def lshVerifiedPairs(df: DataFrame, numHashes: Int = 8, rowsPerBand: Int = 2,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sh = wordTrigrams(df, idCol, textCol).localCheckpoint()
    val sigs = minhashFromShingles(sh, numHashes, idCol)
    val cand = lshCandidates(sigs, numHashes, rowsPerBand, idCol)
      .localCheckpoint()
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("n"))
    // The candidate set is sparse by construction (that's the point of
    // LSH): semi-filter the trigram table to candidate docs BEFORE the
    // (b_id, gram) intersection join, so only candidate docs' grams
    // reach it instead of every shingle row. No forced broadcast —
    // AQE sees the candidate set's runtime size and picks broadcast
    // itself when it is small (a loose threshold can make it huge).
    val shB = sh.join(cand.select(col("b_id").as("b_id2")).distinct(),
        col(idCol) === col("b_id2"), "left_semi")
      .select(col(idCol).as("b_id2"), col("gram").as("gram_b"))
    val pairGrams =
      sh.select(col(idCol).as("a_id"), col("gram")).join(cand, "a_id")
    val shared = pairGrams
      .join(shB, col("b_id") === col("b_id2") && col("gram") === col("gram_b"))
      .groupBy("a_id", "b_id", "n_shared_bands")
      .agg(count(lit(1)).as("n_shared"))
    shared
      .join(sizes.select(col(idCol).as("a_id"), col("n").as("na")), "a_id")
      .join(sizes.select(col(idCol).as("b_id"), col("n").as("nb")), "b_id")
      .select(col("a_id"), col("b_id"), col("n_shared_bands"),
        round(col("n_shared").cast(DoubleType) /
          (col("na") + col("nb") - col("n_shared")), 6).as("jaccard"))
  }

  /** Quality-aware cluster representative selection — the keep policy
    * production dedup actually ships: given near-dup pairs (from any
    * candidate strategy), cluster them with [[connectedComponents]]
    * and keep the HIGHEST-QUALITY doc per cluster
    * ([[TextAnalysis.withStats]] score, ties to the lowest id) instead
    * of the arbitrary min-id keeper. Docs in no pair are their own
    * singleton keepers, so the output covers the whole corpus and
    * `is_keeper` rows ARE the deduplicated corpus.
    *
    * Scale shape: CC is the bounded-iteration HashMin loop; quality
    * is a map-side pass; the final argmax is one window over
    * components (cluster-sized partitions — near-dup clusters are
    * small by nature; a pathological mega-cluster is the same
    * hot-key caveat as [[graft.ext.Curation.domainCap]]).
    *
    * @return (doc_id, component, quality_score, is_keeper).
    */
  def dedupKeepBest(docs: DataFrame, pairs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cc = connectedComponents(pairs)
    val q = TextAnalysis.withStats(docs)
      .select(col(idCol), col("quality_score"))
    val labeled = q
      .join(cc.withColumnRenamed("node", idCol), Seq(idCol), "left")
      .withColumn("component", coalesce(col("component"), col(idCol)))
    // keeper = argmax (quality desc NULLS LAST, id asc) per component
    // as a map-side-combined struct-min agg + join — no per-component
    // window, so a pathological giant duplicate cluster never sorts
    // in a single task. The explicit null flag preserves the window's
    // NULLS LAST: struct-min alone would sort a null quality FIRST
    // and crown a null-quality doc.
    val winners = labeled.groupBy(col("component"))
      .agg(min(struct(col("quality_score").isNull.cast("int").as("nn"),
        (-col("quality_score")).as("nq"), col(idCol).as("kid"))).as("w"))
      .select(col("component"), col("w.kid").as("__keeper_id"))
    labeled.join(winners, "component")
      .select(col(idCol), col("component"), col("quality_score"),
        (col(idCol) === col("__keeper_id")).as("is_keeper"))
  }

  /** Fuzzy cross-corpus contamination — MinHash-LSH near-duplicate
    * pairs BETWEEN two corpora (training candidates × benchmark/eval
    * set): the fuzzy complement to the exact n-gram paths
    * ([[graft.ext.Curation.contamination]] membership,
    * [[graft.ext.Curation.decontaminate]] span removal), catching
    * lightly-edited benchmark copies those exact matches miss. Same
    * banding as [[lshCandidates]] but joined ACROSS the corpora (no
    * self-pairs, no a<b constraint — the id spaces are independent),
    * then the sparse candidates verified with exact trigram-shingle
    * Jaccard exactly as [[lshVerifiedPairs]] does.
    *
    * Scale shape: banding is keyed (band, minhashes) — never
    * all-pairs; the right side is typically the SMALL benchmark set,
    * so its banded table and shingles are tiny and AQE broadcasts
    * them at runtime (no forced hint, same policy as
    * lshVerifiedPairs); the verify joins touch only candidate docs'
    * shingles via the left-semi prefilter.
    *
    * @return (a_id, b_id, n_shared_bands, jaccard): a from `left`,
    *         b from `right`, every banded collision with its exact
    *         similarity.
    */
  def crossNearDups(left: DataFrame, right: DataFrame,
      numHashes: Int = 8, rowsPerBand: Int = 2,
      idCol: String = "doc_id", textCol: String = "text",
      bucketCap: Int = 1000): DataFrame = {
    val shL = wordTrigrams(left, idCol, textCol).localCheckpoint()
    val shR = wordTrigrams(right, idCol, textCol).localCheckpoint()
    val keys = bandStructs(numHashes, rowsPerBand)
    // Same hot-band-bucket cap as [[lshCandidates]], applied to the
    // LARGE (training) side only: a 10⁶-member template family on the
    // left would otherwise fan out n·m rows against every right doc in
    // the bucket. The right side is the small benchmark set — capping
    // it would silently drop contamination TARGETS, the one thing this
    // operator must not miss, and its bucket sizes are bounded by the
    // benchmark's own size.
    val exL = minhashFromShingles(shL, numHashes, idCol)
      .select(col(idCol).as("a_id"), explode(array(keys: _*)).as("bk"))
      .groupBy(col("bk"))
      .agg(graft.expressions.KmvSketchAgg.kmv(col("a_id"), bucketCap).as("ids"))
      .select(col("bk"), explode(col("ids")).as("a_id"))
    val exR = minhashFromShingles(shR, numHashes, idCol)
      .select(col(idCol).as("b_id"), explode(array(keys: _*)).as("bk"))
    val cand = exL.join(exR, Seq("bk"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("n_shared_bands"))
      .localCheckpoint()
    val shB = shR.join(cand.select(col("b_id").as("b_id2")).distinct(),
        col(idCol) === col("b_id2"), "left_semi")
      .select(col(idCol).as("b_id2"), col("gram").as("gram_b"))
    val pairGrams =
      shL.select(col(idCol).as("a_id"), col("gram")).join(cand, "a_id")
    val shared = pairGrams
      .join(shB, col("b_id") === col("b_id2") && col("gram") === col("gram_b"))
      .groupBy("a_id", "b_id", "n_shared_bands")
      .agg(count(lit(1)).as("n_shared"))
    val sizesL = shL.groupBy(col(idCol)).agg(count(lit(1)).as("n"))
    val sizesR = shR.groupBy(col(idCol)).agg(count(lit(1)).as("n"))
    shared
      .join(sizesL.select(col(idCol).as("a_id"), col("n").as("na")), "a_id")
      .join(sizesR.select(col(idCol).as("b_id"), col("n").as("nb")), "b_id")
      .select(col("a_id"), col("b_id"), col("n_shared_bands"),
        round(col("n_shared").cast(DoubleType) /
          (col("na") + col("nb") - col("n_shared")), 6).as("jaccard"))
  }

  /** Connected components over an undirected pair list (HashMin label
    * propagation): each node converges to the minimum id reachable
    * from it — the canonical "cluster the near-dup graph, keep one doc
    * per cluster" step. Iterations are bounded by graph diameter; each
    * is one join + one min-aggregate (all shuffles on node id). The
    * candidate graph from LSH is sparse, so this scales as
    * O(edges · diameter).
    *
    * `maxIter` bounds convergence-check BATCHES, not HashMin rounds:
    * the first batch runs 4 rounds, later ones 2, so the total round
    * cap is 2·maxIter + 2 (driver convergence jobs dominate wall-clock
    * on sparse graphs, hence the batching). */
  def connectedComponents(pairs: DataFrame, aCol: String = "a_id",
      bCol: String = "b_id", maxIter: Int = 20,
      collectThreshold: Long = 500000L): DataFrame = {
    // localCheckpoint (not cache) after every step: iterative plans
    // double in size each round otherwise — cache truncates execution
    // but NOT analysis, and Catalyst planning time explodes
    // exponentially with the lineage. Edges are hash-partitioned on
    // the probe key (dst) BEFORE the checkpoint (LogicalRDD keeps the
    // partitioning), so each round's label join reuses that layout and
    // only the min-aggregate shuffles — one shuffle per round at
    // scale; locally AQE broadcasts the tiny label side anyway.
    // pairs is referenced twice (both edge directions) — materialize
    // it first so an expensive upstream (an LSH banding join, say) is
    // computed once, not once per direction. Self-loop edges are
    // added ONCE so each HashMin round is a single join + min-agg
    // that references the previous labels exactly once: the naive
    // "union(prev, neighbors-of-prev)" form references prev twice per
    // round and the in-batch plan doubles every round (2^rounds label
    // subtrees before the next checkpoint). The distinct's shuffle
    // leaves edges hash-clustered for the per-round joins; at 100 TB
    // the label side shuffles on node id each round while locally AQE
    // just broadcasts it.
    val p0 = pairs.localCheckpoint()
    // Size the iteration's shuffle parallelism to the MEASURED edge
    // count (the count is free — p0 is already materialized). AQE
    // coalesces tiny shuffles inside one query, but localCheckpoint
    // pins each round's partitioning, so without this a sparse
    // candidate graph pays full-width task scheduling every round.
    // ~100k edges per partition; at 100 TB the quotient exceeds the
    // session default and the cap keeps the configured width.
    // The reduced width lives in a CHILD session (newSession: same
    // SparkContext and data, separate SQLConf) — mutating the
    // caller's spark.sql.shuffle.partitions would silently re-width
    // any concurrent query on the shared session, and restoring it
    // in finally would clobber a concurrent conf change. The edge
    // RDD is already checkpointed, so re-wrapping it in the child
    // session costs one row conversion of a 2-column id table.
    val callerSession = pairs.sparkSession
    val defaultParts =
      callerSession.conf.get("spark.sql.shuffle.partitions").toInt
    val nEdges = p0.count()
    // Size-gated driver fast path — the broadcast-join discipline
    // applied to graphs: a candidate graph at or under
    // `collectThreshold` edges (~16 MB of longs at the default) is
    // union-found in memory in one collect, replacing ~8 Spark jobs
    // of per-round planning overhead (measured 3–4 s on a 2k-edge
    // graph regardless of shuffle width — it is ALL fixed cost).
    // Identical output: component = min reachable id. At 100 TB the
    // gate simply never fires and the distributed HashMin loop below
    // runs; pass collectThreshold = 0 to force it (the equivalence
    // spec does).
    // The fast path is additionally gated on BOTH id columns already
    // being LongType: the in-memory union-find works on longs, and
    // taking it for int/string ids would return a different schema
    // (bigint) than the distributed loop (input type) — a behavior
    // fork that would flip on data VOLUME. Non-long ids always take
    // the type-preserving distributed path.
    val longIds = p0.schema(aCol).dataType == LongType &&
      p0.schema(bCol).dataType == LongType
    if (nEdges <= collectThreshold && longIds) {
      import callerSession.implicits._
      val es = p0.select(col(aCol), col(bCol))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) {
          val nx = parent.getOrElse(c, c); parent(c) = r; c = nx
        }
        r
      }
      for ((a, b) <- es) {
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      val labels = parent.keys.toSeq.map(n => (n, find(n)))
      Checkpoints.release(p0) // edges are on the driver now
      return labels.toDF("node", "component")
    }
    val parts = math.min(defaultParts,
      math.max(1L, nEdges / 100000L).toInt)
    val isolated = parts < defaultParts
    val spark = if (isolated) {
      val s = callerSession.newSession()
      s.conf.set("spark.sql.shuffle.partitions", parts.toString)
      s
    } else callerSession
    val p =
      if (isolated) spark.createDataFrame(p0.rdd, p0.schema).localCheckpoint()
      else p0
    if (isolated) Checkpoints.release(p0) // re-wrapped into p's blocks
    var labels = p.select(col(aCol).as("node"))
      .unionAll(p.select(col(bCol).as("node")))
      .distinct().withColumn("component", col("node")).localCheckpoint()
    val edges = p.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionAll(p.select(col(bCol).as("src"), col(aCol).as("dst")))
      .unionAll(labels.select(col("node").as("src"), col("node").as("dst")))
      .distinct().localCheckpoint()
    // the input pair list is fully folded into labels + edges now
    Checkpoints.release(p)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // Batched HashMin rounds per convergence check: each round every
      // node adopts min(own label, neighbors' labels). The check is a
      // driver job, which dominates wall-clock on sparse candidate
      // graphs — so the first check comes only after a 4-round warm
      // start (LSH near-dup components are almost always short chains
      // that converge within 4 hops), then every 2 rounds. The check
      // compares the LAST round against the one before it: HashMin is
      // monotone and deterministic, so a round that changed no label
      // IS the fixed point — small-diameter graphs finish in a single
      // checkpoint + count batch instead of needing a second batch to
      // observe quiescence. The final round's INPUT is checkpointed
      // too: the changes count joins two materialized label tables, so
      // it never re-executes the batch's join+agg lineage (a count
      // against an uncheckpointed 3-round-deep `prev` would re-run
      // nearly the whole batch).
      val rounds = if (iter == 0) 4 else 2
      var prev = labels
      var next = labels
      for (r <- 0 until rounds) {
        prev = if (r == rounds - 1) next.localCheckpoint() else next
        // self-loops are in `edges`, so min-over-neighbors already
        // includes the node's own label — one reference to prev
        next = edges
          .join(prev.withColumnRenamed("node", "dst"), "dst")
          .select(col("src").as("node"), col("component"))
          .groupBy("node").agg(min("component").as("component"))
      }
      next = next.localCheckpoint()
      val changes = next.join(
          prev.select(col("node"), col("component").as("old")), "node")
        .filter(col("component") =!= col("old")).count()
      // both the batch input (`labels`) and the final round's input
      // (`prev`) are superseded: `next` is materialized and the
      // convergence count has run — release their pinned blocks
      Checkpoints.release(prev, labels)
      labels = next
      converged = changes == 0
      iter += 1
    }
    Checkpoints.release(edges) // the loop is the only consumer
    // hand the result back on the CALLER's session (checkpointed, so
    // the re-wrap reads materialized rows, not the loop's lineage)
    if (isolated) callerSession.createDataFrame(labels.rdd, labels.schema)
    else labels
  }

  /** Content-defined chunking (CDC) over tokens: a chunk boundary
    * opens at every token whose portable hash is ≡ 0 mod
    * `boundaryMod` — so expected chunk length ≈ boundaryMod tokens
    * and, crucially, boundaries depend only on LOCAL content: two
    * documents sharing a long word run produce identical interior
    * chunks even when different-length prefixes shift the alignment
    * (the self-synchronization property fixed-size chunking lacks —
    * the standard partial-overlap dedup shape at corpus scale).
    * Token-level deliberately: one md5 per token, the MinHash cost
    * class. Formulated RELATIONALLY — explode tokens, running count
    * of boundary flags per doc, group-concat per chunk — not as
    * nested array lambdas: higher-order functions evaluate
    * interpreted and re-evaluate a referenced array expression per
    * use, which measured 120× slower than this plan, where every
    * expression stays in codegen and both shuffles are keyed on the
    * doc id. The portable md5-60 boundary hash lets a DuckDB oracle
    * replay the chunking exactly.
    *
    * @return (idCol, chunk_idx, chunk_hash) — one row per chunk */
  def cdcChunks(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", boundaryMod: Int = 8): DataFrame =
    cdcChunkTexts(df, idCol, textCol, boundaryMod)
      .select(col(idCol), col("chunk_idx"),
        md5(col("chunk_text")).as("chunk_hash"))

  /** The reassemblable form of [[cdcChunks]]: chunk texts instead of
    * fingerprints — concatenating a doc's chunks in chunk_idx order
    * reproduces its token stream exactly (PropertySpec invariant). */
  def cdcChunkTexts(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", boundaryMod: Int = 8): DataFrame = {
    val tk = df.select(col(idCol),
      posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("pos", "tok")))
    val marked = tk.withColumn("is_b",
      (col("pos") === 0 || portableHash60(col("tok")) % boundaryMod === 0)
        .cast(LongType))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("pos"))
    marked.withColumn("chunk_idx", (sum(col("is_b")).over(w) - 1).cast(IntegerType))
      .groupBy(col(idCol), col("chunk_idx"))
      .agg(concat_ws(" ",
        transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
          s => s.getField("tok"))).as("chunk_text"))
      .select(col(idCol), col("chunk_idx"), col("chunk_text"))
  }

  /** 64-bit SimHash over whitespace tokens. Bit i of the result is the
    * sign of Σ_tokens (bit_i(hash) ? +1 : −1). `tokenHash` defaults to
    * Spark-native xxhash64 (the fast path); pass a portable hash (e.g.
    * portableHash60-based) for cross-engine verification — the
    * q_dedup_simhash oracle uses md5("sh|" + token). */
  def simhash64(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text",
      tokenHash: Column => Column = xxhash64(_)): DataFrame = {
    val tok = df.select(col(idCol),
      explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .withColumn("h", tokenHash(col("tok")))
    val bitSums = (0 until 64).map(i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$i"))
    val sums = tok.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    val simhash = (0 until 64).map(i =>
      when(col(s"b$i") > 0, lit(1L << i)).otherwise(0L)).reduce(_ + _)
    sums.select(col(idCol), simhash.as("simhash"))
  }

  /** Hamming distance between two 64-bit simhashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** The 4×16-bit band expansion of a 64-bit hash table — one row per
    * (id, hash, blk, v); shared by [[bandedHammingPairs]] and the
    * on-disk [[graft.operators.DHashIndex]] layout (which folds
    * (blk, v) into its single bucket key). */
  def bandRows(hashes: DataFrame, idCol: String, hashCol: String): DataFrame = {
    val blocks = (0 until 4).map(b =>
      struct(lit(b).as("blk"),
        shiftright(col(hashCol), b * 16).bitwiseAND(0xFFFF).as("v")))
    hashes.select(col(idCol), col(hashCol), explode(array(blocks: _*)).as("bk"))
      .select(col(idCol), col(hashCol),
        col("bk.blk").as("blk"), col("bk.v").as("v"))
  }

  /** Banded Hamming near-dup pairs over ANY 64-bit hash column — the
    * candidate machinery shared by [[simhashNearDups]] (text) and
    * [[Multimodal.nearDupImages]] (dHash): 4 bands × 16 bits, so any
    * pair within Hamming ≤ 3 shares a clean band (pigeonhole);
    * candidates are four equi-joins on (band, value), never
    * all-pairs, then exactly verified by popcount.
    *
    * @param hashes one row per id: (idCol, hashCol: long).
    * @return (a_id, b_id, hamming ≤ maxHamming). */
  def bandedHammingPairs(hashes: DataFrame, idCol: String, hashCol: String,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3,
      s"4x16-bit banding is complete only for maxHamming <= 3, got $maxHamming")
    // the hash frame feeds FOUR plan subtrees (both band-join sides,
    // both verify joins) — without a checkpoint an expensive upstream
    // re-evaluates per subtree (the documented imageDHashes input
    // DECODES its corpus: measured 4x decode on q_image_near_dup).
    // Hash-frame-sized pin; callers reclaim via releaseAll.
    val sh = hashes.select(col(idCol), col(hashCol)).localCheckpoint()
    val ex = bandRows(sh, idCol, hashCol)
      .select(col(idCol), struct(col("blk"), col("v")).as("bk"))
    val cand = ex.select(col(idCol).as("a_id"), col("bk"))
      .join(ex.select(col(idCol).as("b_id"), col("bk")), Seq("bk"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
    cand
      .join(sh.select(col(idCol).as("a_id"), col(hashCol).as("ha")), "a_id")
      .join(sh.select(col(idCol).as("b_id"), col(hashCol).as("hb")), "b_id")
      .withColumn("hamming", hamming(col("ha"), col("hb")).cast(IntegerType))
      .filter(col("hamming") <= maxHamming)
      .select(col("a_id"), col("b_id"), col("hamming"))
  }

  /** SimHash near-duplicate pairs (the Manku/Jain/Sarma web-dedup
    * pipeline — the FOURTH candidate-generation strategy next to
    * MinHash-LSH banding, the df-capped all-pairs, and the PPJoin
    * prefix filter): band each 64-bit simhash into four 16-bit
    * blocks; by pigeonhole, any pair within Hamming distance
    * `maxHamming` < 4 differs in at most 3 blocks and so SHARES at
    * least one block exactly — candidates are an equi-join on
    * (block index, block value), never all-pairs, and the verify is
    * one xor/bit_count per candidate. Completeness is exact for
    * maxHamming ≤ 3 (the classic f=64, k=3 setting); larger radii
    * would need more blocks.
    *
    * Scale shape: 4 rows per doc join on uniform 16-bit block keys
    * (worst-case fanout is per-block-value collisions, not corpus²);
    * the signature table is checkpointed once and reused by the
    * banding and both verify probes.
    *
    * @return (a_id, b_id, hamming) for pairs within `maxHamming`.
    */
  def simhashNearDups(df: DataFrame, maxHamming: Int = 3,
      idCol: String = "doc_id", textCol: String = "text",
      tokenHash: Column => Column = xxhash64(_)): DataFrame =
    bandedHammingPairs(simhash64(df, idCol, textCol, tokenHash).localCheckpoint(),
      idCol, "simhash", maxHamming)

  /** C4-style duplicate-passage removal with reassembly: split each
    * doc into consecutive `span`-token passages, drop every passage
    * whose exact text occurred earlier in the corpus (global first
    * occurrence by (doc_id, idx) wins — so boilerplate like cookie
    * banners and copyright footers survives exactly once), and
    * reassemble the surviving passages in order. This is corpus
    * REWRITE, complementing [[cdcChunkTexts]] (which only identifies
    * shared chunks).
    *
    * Scale shape: the passage explode is map-side; first-occurrence is
    * ONE shuffle keyed on the 128-bit passage hash (uniform ⇒ no
    * skew; a boilerplate passage shared by 10⁸ docs is still one
    * min-aggregation key with map-side partial combine, never a
    * fanout); the keeper join is keyed on the same hash so AQE can
    * co-locate it; reassembly is one shuffle back on doc_id.
    * sort_array(collect_list(struct(idx, …))) makes the rebuild order
    * deterministic under parallel collection.
    *
    * @return doc_id, n_passages, n_kept, clean_text (kept passages
    *         joined with single spaces; empty string if every passage
    *         was a duplicate of an earlier doc's).
    */
  def passageDedup(df: DataFrame, span: Int = 10,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val passages = df
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col(idCol), posexplode(expr(
        s"transform(sequence(0, cast((size(toks) - 1) div $span as int)), " +
        s"i -> array_join(slice(toks, i * $span + 1, $span), ' '))"))
        .as(Seq("idx", "passage")))
      .withColumn("ph", md5(col("passage")))
    val keepers = passages.groupBy("ph")
      .agg(min(struct(col(idCol).as("kid"), col("idx").as("kidx"))).as("k"))
    passages.join(keepers, "ph")
      .withColumn("kept",
        (col(idCol) === col("k.kid") && col("idx") === col("k.kidx"))
          .cast(LongType))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_passages"),
        sum(col("kept")).as("n_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(when(col("kept") === 1,
            struct(col("idx"), col("passage"))))),
          s => s.getField("passage"))).as("clean_text"))
  }

  /** Cross-document line-level boilerplate removal (the CCNet /
    * RefinedWeb cleaning pass): any line whose trimmed content
    * appears in at least `minDocs` DISTINCT documents is boilerplate
    * (nav bars, cookie banners, license footers) and is struck from
    * EVERY document; remaining lines are reassembled in order.
    * Complements [[passageDedup]] (which keeps ONE copy of a repeated
    * passage; boilerplate must instead be dropped everywhere).
    *
    * Scale shape: one posexplode of the corpus into lines; the
    * boilerplate census is a map-side-combined count-distinct on the
    * line hash (a footer shared by 10⁸ docs is ONE key, never a
    * fanout); the qualifying set is bounded by totalLines/minDocs and
    * in practice tiny, so it size-gate-broadcasts back (shuffle join
    * fallback above `broadcastMaxFps`); reassembly is ONE shuffle
    * keyed on doc id — the membership flag rides the line rows into a
    * conditional collect, so no anti-join + re-join with the source
    * is needed. sort_array over (pos, line) structs makes rebuild
    * order deterministic under parallel collection.
    *
    * @return (doc_id, text, n_lines, n_removed) — text is "" when
    *         every line was boilerplate.
    */
  def lineDedup(df: DataFrame, minDocs: Long = 3,
      broadcastMaxFps: Long = 5000000L,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val boiler = explodeLines(df, idCol, textCol).groupBy("f")
      .agg(count_distinct(col(idCol)).as("nd"))
      .filter(col("nd") >= minDocs).select("f")
      .localCheckpoint()
    // boiler's pinned blocks stay live until the caller consumes the
    // result (session owners reclaim via Checkpoints.releaseAll)
    lineDedupAgainst(df, boiler,
      boiler.count() <= broadcastMaxFps, idCol, textCol)
  }

  private def explodeLines(df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    df.select(col(idCol),
        posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
      .withColumn("f", md5(trim(col("line"))))

  /** Strike every line of `df` whose fingerprint is in `boiler`
    * ((f) rows — a [[lineDedup]] census, or a persisted
    * [[graft.operators.BoilerplateIndex]] table) and reassemble.
    * `forceBroadcast` pins the census to the map side; pass false
    * when it comes from a bucketed on-disk table so the planner can
    * use the index's own layout instead. Same output contract as
    * [[lineDedup]]. */
  def lineDedupAgainst(df: DataFrame, boiler: DataFrame,
      forceBroadcast: Boolean = true, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val b = boiler.select(col("f"), lit(true).as("isb"))
    val flagged = explodeLines(df, idCol, textCol).join(
      if (forceBroadcast) broadcast(b) else b, Seq("f"), "left")
    flagged.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_lines"),
        count(col("isb")).as("n_removed"),
        array_join(transform(
          array_sort(collect_list(when(col("isb").isNull,
            struct(col("pos"), col("line"))))),
          s => s.getField("line")), "\n").as("text"))
      .select(col(idCol), col("text"),
        col("n_lines").cast(IntegerType).as("n_lines"),
        col("n_removed").cast(IntegerType).as("n_removed"))
  }

  /** Incremental (delta) dedup: screen a NEW batch of documents
    * against a historical fingerprint index WITHOUT touching the
    * historical corpus — the nightly-ingest production shape, where
    * the index (fingerprint → keeper id) is the only state carried
    * between runs. A new doc is `dup_history` if its fingerprint is
    * already indexed, `dup_batch` if another new doc with a smaller id
    * shares the fingerprint, else `kept`; `dup_of` names the keeper.
    * Union of `kept` rows with the old index is the next index — the
    * update is append-only.
    *
    * Scale shape: two joins, both keyed on the uniform 128-bit
    * fingerprint (the batch-internal min-agg combines map-side); the
    * historical index is the big side and is never re-fingerprinted —
    * cost per run is O(batch) + one index probe, not O(corpus).
    */
  /** Exact duplicated-substring spans (the "Deduplicating Training
    * Data Makes Language Models Better" operation, re-expressed
    * relationally): find every MAXIMAL token span whose every
    * `span`-token sliding window (stride 1) also occurs somewhere
    * else in the corpus — the spans an exact-substring dedup pass
    * would cut. Two docs sharing a 30-token run report one 30-token
    * span each, not 23 overlapping windows.
    *
    * Relational shape instead of the paper's suffix array: the
    * sliding-window explode is map-side; duplicated windows are ONE
    * shuffle on the uniform 128-bit window hash (map-side partial
    * count; a boilerplate window shared by 10⁸ docs is one count key,
    * never a fanout); the probe back is keyed on the same hash; the
    * gaps-and-islands merge (island = pos − row_number) is a per-doc
    * window over only the duplicated positions — sparse by
    * construction. All integer arithmetic, so a DuckDB replay is
    * exact.
    *
    * @return (doc_id, span_start, span_end, n_tokens) per maximal
    *         duplicated span; token positions 0-based inclusive.
    */
  /** (idCol, pos, wh): md5 of every `span`-token sliding window over a
    * pre-tokenized frame (column `toks`), materialized once — every
    * call site feeds this table to more than one consumer, and without
    * the checkpoint the tokenize + per-position md5 (the dominant
    * scalar cost) would re-run per consumer. Storage is O(corpus
    * tokens), the same order as the shuffle files downstream writes.
    * Shared by [[duplicateSpans]] and `Curation.decontaminate`. */
  private[graft] def slidingWindowHashes(toksed: DataFrame, span: Int,
      idCol: String): DataFrame =
    toksed.filter(size(col("toks")) >= span)
      .select(col(idCol), posexplode(expr(
        s"transform(sequence(0, size(toks) - $span), " +
        s"i -> md5(array_join(slice(toks, i + 1, $span), ' ')))"))
        .as(Seq("pos", "wh")))
      .localCheckpoint()

  /** Gaps-and-islands merge: contiguous flagged window positions →
    * maximal token spans (idCol, span_start, span_end), inclusive; the
    * per-doc window runs over only the flagged positions (sparse by
    * construction). Shared by [[duplicateSpans]] and
    * `Curation.decontaminate`. */
  private[graft] def mergeIslands(flaggedPos: DataFrame, span: Int,
      idCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("pos"))
    flaggedPos.withColumn("island", col("pos") - row_number().over(w))
      .groupBy(col(idCol), col("island"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + lit(span - 1)).as("span_end"))
      .select(col(idCol), col("span_start"), col("span_end"))
  }

  def duplicateSpans(df: DataFrame, span: Int = 8,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val windows = slidingWindowHashes(
      df.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("toks")),
      span, idCol)
    val dups = windows.groupBy("wh").agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).select("wh")
    val dupPos = windows.join(dups, "wh").select(col(idCol), col("pos"))
    mergeIslands(dupPos, span, idCol)
      .select(col(idCol), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("n_tokens"))
  }

  /** Corpus snapshot diff — the versioning audit between two corpus
    * states: per doc id, `added` (new only), `removed` (old only),
    * `changed` (both, different content fingerprint), or `unchanged`.
    * The ops counterpart of [[dedupAgainstIndex]]: that screens a
    * delta, this explains one.
    *
    * Scale: each side collapses to (id, fingerprint) map-side; the
    * full-outer join is ONE shuffle keyed on the uniform id — at
    * 100 TB both snapshots are typically already bucketed by id, which
    * makes this a zero-shuffle zip of co-located buckets.
    */
  def corpusDiff(oldDf: DataFrame, newDf: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    def fp(df: DataFrame, name: String) = df.select(col(idCol),
      TextAnalysis.fingerprint(col(textCol)).as(name))
    fp(oldDf, "old_fp").join(fp(newDf, "new_fp"), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("old_fp").isNull, lit("added"))
          .when(col("new_fp").isNull, lit("removed"))
          .when(col("old_fp") =!= col("new_fp"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"),
        col("old_fp"), col("new_fp"))
  }

  /** Re-express each document as its TURN-HASH text — the adapter
    * that lifts the WHOLE shingle-dedup family to SEQUENCE level
    * (multi-turn conversations, session logs, any ordered-sub-unit
    * data): the token stream splits into fixed-size turns of
    * `turnTokens` tokens (the last, possibly short, turn kept —
    * genuinely turn-delimited data should pre-split on its own
    * separator upstream and pass turnTokens large), each turn
    * collapses to the 15-hex-char md5 prefix of its space-joined
    * tokens, and the output `text` is the space-joined turn-hash
    * sequence in order.
    *
    * Why an adapter instead of a new operator family: word-trigrams
    * OVER TURN HASHES are exactly ordered turn-trigram shingles, so
    * [[jaccardPairs]], [[containmentJoin]], [[minhashSignatures]],
    * [[prefixJaccardJoin]], and the on-disk
    * [[graft.operators.ShingleIndex]] all operate at the sequence
    * level verbatim — zero new join code, every existing scale
    * guard (df caps, rarest-first prefixes, bucketed probes)
    * inherited. Map-side only: one projection, no shuffle.
    *
    * @return (idCol, text) — text = space-joined turn hashes */
  def turnText(df: DataFrame, turnTokens: Int = 8,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    turnHashes(df, turnTokens, idCol, textCol)
      .select(col(idCol), array_join(col("turns"), " ").as("text"))

  /** The ordered turn-hash ARRAY behind [[turnText]] — (idCol,
    * turns: array&lt;string&gt;), empty array for empty docs. */
  private[graft] def turnHashes(df: DataFrame, turnTokens: Int,
      idCol: String, textCol: String): DataFrame = {
    require(turnTokens >= 1, s"turnTokens must be >= 1, got $turnTokens")
    df.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("toks"))
      .select(col(idCol), expr(
        s"""CASE WHEN size(toks) = 0 THEN array()
           |ELSE transform(
           |  sequence(0, (size(toks) + $turnTokens - 1) div $turnTokens - 1),
           |  i -> substring(md5(array_join(
           |    slice(toks, i * $turnTokens + 1, $turnTokens), ' ')), 1, 15))
           |END""".stripMargin).cast("array<string>").as("turns"))
  }

  /** WITHIN-conversation turn repetition — the degenerate-generation
    * / agent-loop detector batch dedup cannot see (a conversation
    * that repeats its own turn over and over is unique corpus-wide
    * yet worthless as training data): per document, the turn count,
    * distinct-turn count, the LONGEST run of consecutive identical
    * turns, and repeat_frac = 1 − distinct/n.
    *
    * Exactness: counts are exact ints off the turn array; the run
    * length is one aggregate() fold over the array (turn-count
    * bounded); repeat_frac is one division, 6dp.
    *
    * Scale shape: pure map — one projection per document, no
    * shuffle, no join (the [[turnText]] family's zero-shuffle rule).
    *
    * @return (idCol, n_turns, n_distinct_turns, max_run,
    *         repeat_frac) */
  def turnRepetition(df: DataFrame, turnTokens: Int = 8,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    turnHashes(df, turnTokens, idCol, textCol)
      .select(col(idCol),
        size(col("turns")).as("n_turns"),
        size(array_distinct(col("turns"))).as("n_distinct_turns"),
        expr("""aggregate(turns,
          |  struct(CAST('' AS STRING) AS prev, 0 AS run, 0 AS best),
          |  (s, x) -> struct(x AS prev,
          |    CASE WHEN x = s.prev THEN s.run + 1 ELSE 1 END AS run,
          |    greatest(s.best,
          |      CASE WHEN x = s.prev THEN s.run + 1 ELSE 1 END) AS best),
          |  s -> s.best)""".stripMargin).as("max_run"),
        round(when(size(col("turns")) === 0, 0.0)
          .otherwise(lit(1.0) -
            size(array_distinct(col("turns"))).cast(DoubleType) /
              size(col("turns")).cast(DoubleType)), 6).as("repeat_frac"))

  /** Role-aware conversation STRUCTURE checks — the transcript-shape
    * lints [[turnRepetition]]'s content view cannot see: a chat
    * transcript whose lines carry `system:` / `user:` / `assistant:`
    * markers is parsed into role turns (marker line opens a turn;
    * unmarked lines continue the open turn; blank lines are ignored;
    * lines before any marker count as preamble) and each document
    * reports the defects that make it worthless as instruction-
    * tuning data: same-role back-to-back turns (alternation
    * violations, system turns exempt), empty turns (a marker with no
    * content — the classic truncated-generation artifact), and a
    * last turn that stops mid-sentence (no terminal punctuation).
    *
    * Exactness: one left-to-right fold over the line array per
    * document; counts are exact ints; `truncated_last` is a regexp
    * on the final turn's trimmed content.
    *
    * Scale shape: pure map — one projection per document, zero
    * shuffle, zero join (the [[turnText]] family rule).
    *
    * @return (idCol, n_turns, n_user, n_assistant, n_system,
    *         n_pre_lines, first_role, last_role,
    *         alternation_violations, n_empty_turns, truncated_last)
    *         — one row per document, zeros/'' for markerless text */
  def conversationStructure(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val rx = "^\\\\s*(system|user|assistant)\\\\s*:"
    df.select(col(idCol), col(textCol)).selectExpr(idCol,
      s"""aggregate(split($textCol, '\\n'),
         |  named_struct(
         |    'roles', cast(array() as array<string>),
         |    'contents', cast(array() as array<string>),
         |    'pre', 0),
         |  (s, l) -> CASE
         |    WHEN trim(l) = '' THEN s
         |    WHEN regexp_extract(l, '$rx', 1) != '' THEN named_struct(
         |      'roles', s.roles || array(regexp_extract(l, '$rx', 1)),
         |      'contents', s.contents ||
         |        array(trim(regexp_replace(l, '$rx', ''))),
         |      'pre', s.pre)
         |    WHEN size(s.roles) = 0 THEN named_struct('roles', s.roles,
         |      'contents', s.contents, 'pre', s.pre + 1)
         |    ELSE named_struct('roles', s.roles,
         |      'contents', slice(s.contents, 1, size(s.contents) - 1) ||
         |        array(trim(concat(element_at(s.contents, -1), ' ',
         |          trim(l)))),
         |      'pre', s.pre)
         |    END,
         |  s -> s) AS conv""".stripMargin)
      .selectExpr(idCol, "conv",
        // non-system role sequence once, not once per lambda step
        "filter(conv.roles, r -> r != 'system') AS nonsys")
      .selectExpr(idCol,
        "size(conv.roles) AS n_turns",
        "size(filter(conv.roles, r -> r = 'user')) AS n_user",
        "size(filter(conv.roles, r -> r = 'assistant')) AS n_assistant",
        "size(filter(conv.roles, r -> r = 'system')) AS n_system",
        "conv.pre AS n_pre_lines",
        "coalesce(element_at(conv.roles, 1), '') AS first_role",
        "coalesce(element_at(conv.roles, -1), '') AS last_role",
        """CASE WHEN size(nonsys) < 2 THEN 0 ELSE size(filter(
          |  transform(sequence(2, size(nonsys)),
          |    i -> element_at(nonsys, i) = element_at(nonsys, i - 1)),
          |  x -> x)) END AS alternation_violations""".stripMargin,
        "size(filter(conv.contents, c -> c = '')) AS n_empty_turns",
        """size(conv.roles) > 0 AND
          |NOT element_at(conv.contents, -1) rlike '[.!?]$'
          |AS truncated_last""".stripMargin)
  }

  /** Structured-OUTPUT lints for assistant turns — the ingest gate
    * for tool-call / agent transcripts, sibling of
    * [[conversationStructure]] (which checks the turn SHAPE; this
    * checks what the assistant emitted INSIDE its turns). Lines are
    * folded once left-to-right tracking the current role (same
    * marker grammar); within assistant turns only:
    *  - ``` fence lines toggle a code block (info string = language);
    *    a block still open at end of document is the classic
    *    truncated-generation artifact (`unclosed_fence`);
    *  - closed ```json blocks must parse (`get_json_object` = strict
    *    Jackson; an unquoted value or missing brace reads NULL);
    *  - a single non-fence line bracketed `{…}`/`[…]` is an inline
    *    JSON candidate, validated the same way.
    * Fences and JSON in user/system turns are deliberately IGNORED —
    * quoting broken JSON back at the model is fine; emitting it is
    * not.
    *
    * Scale shape: pure map — one projection per document, zero
    * shuffle, zero join (the [[conversationStructure]] rule); the
    * JSON validation runs on block bodies already folded into the
    * row, never on a re-scan.
    *
    * @return (idCol, n_fences, n_code_blocks, unclosed_fence,
    *         n_json_blocks, n_json_invalid, n_inline_json,
    *         n_inline_json_invalid) — one row per document, zeros
    *         for text with no assistant structure */
  def structuredOutputLint(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val rx = "^\\\\s*(system|user|assistant)\\\\s*:"
    df.select(col(idCol), col(textCol)).selectExpr(idCol,
      // pass 1 (pure array transform): split a role-marker line into
      // a role SENTINEL item (\u0001-prefixed — the tokenizer strips
      // control chars from real text, so it cannot collide) followed
      // by the marker line's remaining content, so the fold below
      // processes every item uniformly under "current role"
      s"""flatten(transform(split($textCol, '\\n'), l -> CASE
         |  WHEN regexp_extract(l, '$rx', 1) != '' THEN array(
         |    concat(char(1), regexp_extract(l, '$rx', 1)),
         |    trim(regexp_replace(l, '$rx', '')))
         |  ELSE array(l) END)) AS items""".stripMargin)
      .selectExpr(idCol,
        s"""aggregate(items,
           |  named_struct(
           |    'role', CAST('' AS STRING),
           |    'open', false,
           |    'lang', CAST('' AS STRING),
           |    'body', CAST('' AS STRING),
           |    'started', false,
           |    'blocks',
           |      cast(array() as array<struct<lang:string,body:string>>),
           |    'fences', 0,
           |    'inline', cast(array() as array<string>)),
           |  (s, l) -> CASE
           |    WHEN startswith(l, char(1)) THEN named_struct(
           |      'role', substr(l, 2), 'open', s.open, 'lang', s.lang,
           |      'body', s.body, 'started', s.started,
           |      'blocks', s.blocks, 'fences', s.fences,
           |      'inline', s.inline)
           |    WHEN s.role != 'assistant' THEN s
           |    WHEN trim(l) rlike '^```' THEN CASE
           |      WHEN NOT s.open THEN named_struct('role', s.role,
           |        'open', true, 'lang', trim(substr(trim(l), 4)),
           |        'body', '', 'started', false, 'blocks', s.blocks,
           |        'fences', s.fences + 1, 'inline', s.inline)
           |      ELSE named_struct('role', s.role, 'open', false,
           |        'lang', '', 'body', '', 'started', false,
           |        'blocks', s.blocks ||
           |          array(named_struct('lang', s.lang, 'body', s.body)),
           |        'fences', s.fences + 1, 'inline', s.inline)
           |      END
           |    WHEN s.open THEN named_struct('role', s.role,
           |      'open', true, 'lang', s.lang,
           |      'body', CASE WHEN s.started
           |        THEN concat(s.body, '\\n', l) ELSE l END,
           |      'started', true, 'blocks', s.blocks,
           |      'fences', s.fences, 'inline', s.inline)
           |    WHEN trim(l) rlike '^[\\\\[{].*[\\\\]}]$$' THEN
           |      named_struct('role', s.role, 'open', s.open,
           |        'lang', s.lang, 'body', s.body,
           |        'started', s.started, 'blocks', s.blocks,
           |        'fences', s.fences,
           |        'inline', s.inline || array(trim(l)))
           |    ELSE s
           |    END,
           |  s -> s) AS lint""".stripMargin)
      .selectExpr(idCol,
        "lint.fences AS n_fences",
        "size(lint.blocks) AS n_code_blocks",
        "lint.open AS unclosed_fence",
        "size(filter(lint.blocks, b -> b.lang = 'json')) AS n_json_blocks",
        """size(filter(lint.blocks, b -> b.lang = 'json' AND
          |  get_json_object(b.body, '$') IS NULL)) AS n_json_invalid"""
          .stripMargin,
        "size(lint.inline) AS n_inline_json",
        """size(filter(lint.inline, j ->
          |  get_json_object(j, '$') IS NULL)) AS n_inline_json_invalid"""
          .stripMargin)
  }

  /** Sequence-level near-duplicate pairs for conversation-shaped
    * data: [[turnText]] then the df-capped exact trigram-Jaccard
    * join — a pair scores high only when it shares ordered runs of
    * 3·turnTokens tokens, so reordered or interleaved content that
    * fools bag-of-shingles similarity does NOT collide here.
    * Same scale shape as [[jaccardPairs]] (its guards verbatim).
    *
    * @return (a_id, b_id, jaccard) with Jaccard ≥ threshold over
    *         turn-trigram shingles */
  def conversationNearDups(df: DataFrame, threshold: Double = 0.1,
      turnTokens: Int = 8, dfCap: Int = 100,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    jaccardPairs(turnText(df, turnTokens, idCol, textCol), threshold,
      idMod = 1, dfCap, idCol, "text")

  def dedupAgainstIndex(newDocs: DataFrame, index: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val fp = newDocs.select(col(idCol),
      TextAnalysis.fingerprint(col(textCol)).as("fingerprint"))
    val batchMin = fp.groupBy("fingerprint")
      .agg(min(col(idCol)).as("batch_keeper"))
    fp.join(batchMin, "fingerprint")
      .join(index.select(col("fingerprint"),
        col("keeper_id").as("hist_keeper")), Seq("fingerprint"), "left")
      .select(col(idCol), col("fingerprint"),
        when(col("hist_keeper").isNotNull, lit("dup_history"))
          .when(col(idCol) =!= col("batch_keeper"), lit("dup_batch"))
          .otherwise(lit("kept")).as("status"),
        coalesce(col("hist_keeper"),
          when(col(idCol) =!= col("batch_keeper"), col("batch_keeper")))
          .as("dup_of"))
  }

  /** Prefix-filtered exact Jaccard similarity self-join (the
    * PPJoin/AllPairs candidate-generation family — a THIRD
    * candidate-generation strategy next to MinHash-LSH banding and the
    * df-capped all-pairs): order every document's distinct tokens by
    * ascending global document frequency (rarest first, ties by token),
    * keep only the prefix of length |d| − ⌈t·|d|⌉ + 1, and join
    * documents on shared PREFIX tokens only. The prefix-filter lemma
    * guarantees completeness: any pair with Jaccard ≥ t shares at
    * least one prefix token, so unlike LSH this is exact with NO
    * probabilistic recall caveat; the PPJoin+ positional filter then
    * prunes candidates whose first-match positions already bound the
    * overlap below the threshold, and the verify step computes true
    * Jaccard on the surviving pairs.
    *
    * Scale shape: the candidate join is keyed on prefix tokens, and
    * rarest-first ordering is the skew defense — a stop-word with df
    * 10⁸ sorts to the END of every document and never enters a prefix,
    * so join fanout concentrates on rare tokens with tiny posting
    * lists. Token sets are checkpointed once and reused by the
    * explode and both verify probes; the per-doc rank window is
    * bounded by document length, not corpus size.
    *
    * @return (a_id, b_id, jaccard) for pairs with Jaccard ≥ threshold.
    */
  def prefixJaccardJoin(df: DataFrame, threshold: Double = 0.5,
      idCol: String = "doc_id", textCol: String = "text",
      broadcastMaxSets: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // similarity unit = distinct word-trigram shingles (not raw
    // tokens): a small shared vocabulary makes token SETS of unrelated
    // documents overlap heavily, while shingle sets only overlap on
    // shared phrasing — same discrimination argument as
    // [[ngramJaccardPairs]]. Shingles are reduced to their 60-bit
    // portable hash IMMEDIATELY: every downstream shuffle, sort, join
    // key, and intersection then moves 8-byte longs instead of
    // ~30-char strings.
    val ts = df
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col(idCol), array_sort(array_distinct(transform(
        sequence(lit(1), size(col("toks")) - 2),
        i => graft.expressions.Md5Hash60.hash60(concat(
          element_at(col("toks"), i), lit(" "),
          element_at(col("toks"), i + 1), lit(" "),
          element_at(col("toks"), i + 2)))))).as("s"))
      .localCheckpoint()
    // sz rides along from the array length at explode time — one
    // window pass (the df-rank) instead of two
    val ex = ts.select(col(idCol), size(col("s")).as("sz"),
      explode(col("s")).as("token"))
    val dfreq = ex.groupBy("token").agg(count(lit(1)).as("df"))
    val ranked = ex.join(dfreq, "token")
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(col("df"), col("token"))))
    val pref = ranked
      .filter(col("rnk") <= col("sz") - ceil(lit(threshold) * col("sz")) + 1)
      .select(col(idCol), col("token"), col("rnk"), col("sz"))
    // PPJoin+ positional filter: both docs rank tokens in the SAME
    // global (df, token) order, so among a pair's matched prefix
    // tokens the one with minimal a-rank also has minimal b-rank —
    // it is the pair's FIRST match, nothing common precedes it in
    // both lists, and overlap ≤ 1 + min(|a|−ra, |b|−rb). Jaccard ≥ t
    // needs overlap ≥ t·(|a|+|b|)/(1+t); pairs whose bound already
    // fails are pruned BEFORE the verify join ever moves their
    // shingle arrays. The 1e-9 slack makes float rounding err only
    // toward KEEPING a candidate — the verify step computes true
    // Jaccard, so a loose filter costs a row of work while a tight
    // one would lose a true pair.
    val cand = pref.as("a").join(pref.as("b"),
        col("a.token") === col("b.token") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("a_id"), col(s"b.$idCol").as("b_id"),
        col("a.rnk").as("ra"), col("a.sz").as("sza"),
        col("b.rnk").as("rb"), col("b.sz").as("szb"))
      .groupBy("a_id", "b_id")
      .agg(min(col("ra")).as("ra"), max(col("sza")).as("sza"),
        min(col("rb")).as("rb"), max(col("szb")).as("szb"))
      .filter((lit(1) + least(col("sza") - col("ra"), col("szb") - col("rb")))
        .cast(DoubleType) * (1.0 + threshold) >=
        lit(threshold) * (col("sza") + col("szb")) - 1e-9)
      .select(col("a_id"), col("b_id"))
    // Size-gated broadcast of the shingle-set table for the verify
    // probes: candidate pairs carry two ~KB array payloads through a
    // shuffle otherwise. At corpus scale the gate fails and the
    // verify falls back to keyed joins (sets are corpus-bound).
    def sets(k: String) =
      ts.select(col(idCol).as(s"${k}_id"), col("s").as(s"s$k"))
    val (sa, sb) =
      if (ts.count() <= broadcastMaxSets) (broadcast(sets("a")), broadcast(sets("b")))
      else (sets("a"), sets("b"))
    cand
      .join(sa, "a_id")
      .join(sb, "b_id")
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("jac", col("inter").cast(DoubleType) /
        (size(col("sa")) + size(col("sb")) - col("inter")))
      .filter(col("jac") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("jac"), 6).as("jaccard"))
  }

  /** Prefix-filtered exact CONTAINMENT join — the asymmetric twin of
    * [[prefixJaccardJoin]]: score C(a→b) = |Sa ∩ Sb| / |Sa| and emit
    * directed pairs with C ≥ t. Jaccard misses "short doc quoted
    * inside a long one" (the union term swamps the overlap);
    * containment is the quote/partial-copy/boilerplate-inclusion
    * detector a dedup pipeline runs NEXT TO symmetric near-dup.
    *
    * Prefix lemma (containment form): |Sa∩Sb| ≥ t·|Sa| forces a match
    * inside a's first ⌊(1−t)·|Sa|⌋+1 rarest-first shingles — so only
    * the CONTAINED side is prefix-filtered; the other side indexes
    * ALL its shingles. That stays scale-safe because every join key
    * comes from some document's rare prefix: df-ascending ordering
    * means prefix tokens have short posting lists, and a stop-shingle
    * with df 10⁸ sorts to the end of every prefix and never keys the
    * join. The [[prefixJaccardJoin]] positional filter prunes
    * candidates whose first-match ranks already bound the overlap
    * under t·|Sa| before any shingle array moves; verify computes the
    * exact intersection on survivors.
    *
    * @return (src_id, dst_id, containment) — src's shingles ⊆-scored
    *         against dst, both directions emitted when both hold. */
  def containmentJoin(df: DataFrame, threshold: Double = 0.9,
      idCol: String = "doc_id", textCol: String = "text",
      broadcastMaxSets: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ts = df
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col(idCol), array_sort(array_distinct(transform(
        sequence(lit(1), size(col("toks")) - 2),
        i => graft.expressions.Md5Hash60.hash60(concat(
          element_at(col("toks"), i), lit(" "),
          element_at(col("toks"), i + 1), lit(" "),
          element_at(col("toks"), i + 2)))))).as("s"))
      .localCheckpoint()
    val ex = ts.select(col(idCol), size(col("s")).as("sz"),
      explode(col("s")).as("token"))
    val dfreq = ex.groupBy("token").agg(count(lit(1)).as("df"))
    val ranked = ex.join(dfreq, "token")
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(col("df"), col("token"))))
    // contained side: prefix only; container side: every shingle,
    // rank riding along for the positional filter
    val pref = ranked
      .filter(col("rnk") <= col("sz") - ceil(lit(threshold) * col("sz")) + 1)
      .select(col(idCol).as("src_id"), col("token"),
        col("rnk").as("ra"), col("sz").as("sza"))
    val full = ranked.select(col(idCol).as("dst_id"), col("token"),
      col("rnk").as("rb"), col("sz").as("szb"))
    val cand = pref.join(full,
        Seq("token")).filter(col("src_id") =!= col("dst_id"))
      .groupBy("src_id", "dst_id")
      .agg(min(col("ra")).as("ra"), max(col("sza")).as("sza"),
        min(col("rb")).as("rb"), max(col("szb")).as("szb"))
      // overlap ≤ 1 + min(|a|−ra, |b|−rb) must reach t·|a| (1e-9
      // slack errs toward keeping — verify is exact)
      .filter((lit(1) + least(col("sza") - col("ra"), col("szb") - col("rb")))
        .cast(DoubleType) >= lit(threshold) * col("sza") - 1e-9)
      .select(col("src_id"), col("dst_id"))
    def sets(k: String) =
      ts.select(col(idCol).as(s"${k}_id"), col("s").as(s"s$k"))
    val (sa, sb) =
      if (ts.count() <= broadcastMaxSets) (broadcast(sets("src")), broadcast(sets("dst")))
      else (sets("src"), sets("dst"))
    val out = cand
      .join(sa, "src_id")
      .join(sb, "dst_id")
      .withColumn("inter", size(array_intersect(col("ssrc"), col("sdst"))))
      .withColumn("cont", col("inter").cast(DoubleType) / size(col("ssrc")))
      .filter(col("cont") >= threshold)
      .select(col("src_id"), col("dst_id"), round(col("cont"), 6).as("containment"))
      .localCheckpoint() // pairs-sized; release the shingle scaffold
    graft.ext.Checkpoints.release(ts)
    out
  }

  /** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the
    * MOSS algorithm): hash every `k`-token gram, slide a window of `w`
    * consecutive gram hashes, and in each window select the MINIMUM
    * hash — rightmost occurrence on ties (base winnowing; the robust
    * variant would additionally prefer re-selecting the previous
    * window's pick). The selected (position, hash) set is the document's
    * fingerprint: any shared token run of length ≥ k + w − 1 between
    * two documents is guaranteed to share at least one fingerprint,
    * with density 2/(w+1) — the principled sampling guarantee that
    * plain "every j-th gram" fingerprinting lacks.
    *
    * Scale shape: the whole selection is per-row array arithmetic —
    * tokenize, gram-hash (60-bit md5 prefix, the engine's portable
    * hash contract), window-argmin, dedup selected positions — so the
    * operator is ZERO-shuffle: a pure map over the corpus emitting
    * O(2·tokens/(w+1)) fingerprint rows. Downstream match-finding is
    * one groupBy on the uniform fingerprint (same shape as
    * [[exactDedupGroups]]). O(m·w) comparisons per doc happen inside
    * codegen'd array expressions, never across rows.
    *
    * @return (doc_id, pos, fp): 0-based gram position and 60-bit
    *         fingerprint hash, one row per selected fingerprint.
    */
  def winnowFingerprints(df: DataFrame, k: Int = 3, w: Int = 4,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val grams = df
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= k + w - 1)
      .withColumn("hv", transform(
        sequence(lit(0), size(col("toks")) - k),
        i => graft.expressions.Md5Hash60.hash60(
          array_join(slice(col("toks"), i + 1, lit(k)), " "))))
      // materialization barrier, NOT a cache nicety: without it,
      // projection collapse inlines this hv definition into every
      // slice() inside the window-argmin lambda below, so each of the
      // m windows re-runs tokenize + all m gram hashes — O(m²) md5
      // per document (observed: one sf0.1 partition pinned a core for
      // 10+ minutes). The checkpoint stays per-partition local, so
      // the operator is still a zero-shuffle map at any scale.
      .localCheckpoint()
    // window start s selects position s + w − rpos, where rpos is the
    // 1-based position of the min in the REVERSED window — reversing
    // makes "first occurrence" mean "rightmost in the original"
    val sel = grams.withColumn("sel", array_distinct(transform(
      sequence(lit(0), size(col("hv")) - w),
      s => s.cast(LongType) + lit(w.toLong) - array_position(
        reverse(slice(col("hv"), s + 1, lit(w))),
        array_min(slice(col("hv"), s + 1, lit(w)))))))
    sel.select(col(idCol), col("hv"), explode(col("sel")).as("pos"))
      .select(col(idCol), col("pos"),
        element_at(col("hv"), (col("pos") + 1).cast(IntegerType)).as("fp"))
  }
}
