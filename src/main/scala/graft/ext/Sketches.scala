package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.expressions.Md5Hash60

/** Fixed-memory frequency sketches (Cormode–Muthukrishnan count-min).
  * The sketch answers "how often does key x occur?" with one-sided
  * error (estimate ≥ truth; overshoot ≤ εN with probability 1−δ at
  * width e/ε, depth ln 1/δ) in depth×width counters TOTAL — state
  * does not grow with the corpus, which is the whole point at 100 TB:
  * vocabulary-sized exact counts need a key-wide shuffle every batch,
  * while sketch counters are a constant-size mergeable summary that
  * adds across shards/batches/days by plain +.
  *
  * Hashes are the portable md5-60 contract, so a DuckDB replay builds
  * the bit-identical sketch and every estimate is oracle-checkable.
  */
object Sketches {

  private def bucket(keyCol: Column, seed: Int, width: Int): Column =
    Md5Hash60.hash60(concat(lit(s"cms$seed|"), keyCol)) % width

  /** The ×depth (seed, bucket) expansion of a key column — shared by
    * the sketch build, the probe, and the streaming twin so all
    * address identically. */
  def addressed(keyCol: Column, depth: Int, width: Int): Column =
    explode(array((0 until depth).map(s =>
      struct(lit(s).as("seed"), bucket(keyCol, s, width).as("bucket"))): _*))

  /** Build a count-min sketch over a key stream (one row per key
    * OCCURRENCE, e.g. the exploded token or bigram stream).
    *
    * Scale shape: occurrences first collapse to (key, cnt) — one
    * key-clustered shuffle with map-side combine — so the ×depth
    * expansion runs over DISTINCT keys, not occurrences; the final
    * aggregate lands on ≤ depth·width counters, and every executor
    * holds at most that many partial cells. Sketches from disjoint
    * corpus shards merge by summing counters cell-wise.
    *
    * @return (seed, bucket, c) — ≤ depth·width rows.
    */
  def cmsBuild(occurrences: DataFrame, keyCol: String = "key",
      depth: Int = 4, width: Int = 256): DataFrame = {
    val vocab = occurrences.groupBy(keyCol).agg(count(lit(1)).as("cnt"))
    vocab.select(addressed(col(keyCol), depth, width).as("sb"), col("cnt"))
      .groupBy(col("sb.seed").as("seed"), col("sb.bucket").as("bucket"))
      .agg(sum(col("cnt")).as("c"))
  }

  /** Point estimate for each candidate key: min over the depth
    * addressed counters. The sketch is ≤ depth·width rows — always
    * broadcast; the probe is that join plus a candidate-keyed min. */
  def cmsEstimate(sketch: DataFrame, candidates: DataFrame,
      keyCol: String = "key", depth: Int = 4, width: Int = 256): DataFrame =
    candidates
      .select(col(keyCol), addressed(col(keyCol), depth, width).as("sb"))
      .select(col(keyCol), col("sb.seed").as("seed"),
        col("sb.bucket").as("bucket"))
      .join(broadcast(sketch), Seq("seed", "bucket"))
      .groupBy(keyCol).agg(min(col("c")).as("cms_est"))

  /** Build a Bloom filter over a key set: the set-bit POSITIONS table
    * (≤ m rows of `pos`), which is the natural relational encoding —
    * filters from disjoint shards merge by plain UNION/distinct
    * (bitwise OR), and the filter broadcasts at probe time. Positions
    * are the portable md5-60 addressing, so a DuckDB replay sets the
    * identical bits. Membership is one-sided like every Bloom filter:
    * no false negatives ever, false positives at rate ≈
    * (1−e^(−dn/m))^d — size m to the expected key count.
    *
    * Scale shape: keys collapse to distinct once (the only key-wide
    * shuffle), the ×d expansion runs over distinct keys, and the
    * result is ≤ m rows regardless of corpus size. */
  def bloomBuild(keys: DataFrame, keyCol: String = "key",
      depth: Int = 4, m: Int = 8192): DataFrame =
    keys.select(col(keyCol)).distinct()
      .select(explode(array((0 until depth).map(s =>
        (Md5Hash60.hash60(concat(lit(s"bloom$s|"), col(keyCol))) % m)
          .as(s"p$s")): _*)).as("pos"))
      .distinct()

  /** Probe candidate keys against a built filter: a key is
    * `maybe_present` iff ALL d addressed bits are set. The filter is
    * ≤ m rows — broadcast; the probe is that join plus a key-keyed
    * count, nothing corpus-sized.
    *
    * @return (keyCol, maybe_present). */
  def bloomProbe(bloom: DataFrame, candidates: DataFrame,
      keyCol: String = "key", depth: Int = 4, m: Int = 8192): DataFrame =
    candidates.select(col(keyCol)).distinct()
      .select(col(keyCol), explode(array((0 until depth).map(s =>
        (Md5Hash60.hash60(concat(lit(s"bloom$s|"), col(keyCol))) % m)
          .as(s"p$s")): _*)).as("pos"))
      .join(broadcast(bloom.select(col("pos"), lit(1L).as("hit"))),
        Seq("pos"), "left")
      .groupBy(keyCol)
      .agg(sum(coalesce(col("hit"), lit(0L))).as("hits"))
      .select(col(keyCol), (col("hits") === depth).as("maybe_present"))

  /** Per-group HyperLogLog distinct-count estimate (Flajolet et al.
    * 2007) — the "distinct users per day / distinct n-grams per
    * source" shape at 100 TB, where exact COUNT(DISTINCT) means a
    * key-wide shuffle per group and the sketch means m registers per
    * group, mergeable across shards by register-wise max (register
    * insertion is idempotent, so no pre-distinct pass is needed
    * either — duplicates simply re-set the same register).
    *
    * Portability contract (every step exact integer except the ONE
    * empirically-portable ln in the small-range branch):
    * register = h mod m, ρ = min(53 − bitlen(h div m), 32) via the
    * binary-string length both engines produce identically (Spark
    * `conv(_,10,2)` ≡ DuckDB `format('{:b}',_)`, including "0" for
    * 0); registers aggregate by max; the harmonic sum is the exact
    * long Σ 2^(32−Mⱼ) (+ 2³² per empty register); raw estimate =
    * (α_micro · (m²·2³² div Σ)) div 10⁶ with α_micro =
    * round(0.7213/(1+1.079/m)·10⁶); Flajolet's small-range branch
    * (raw ≤ 2.5m, some register empty) is linear counting
    * round(m·ln(m/V)) — ln portability is the proven bigram-NLL
    * contract.
    *
    * Scale shape: one shuffle on (group, register) with map-side max
    * combine — the post-shuffle table is groups×m rows no matter the
    * corpus; the estimate is a group-keyed fold of that.
    *
    * @return (groupCol, v, raw_est, hll_est) — v = empty registers.
    */
  def hllDistinctBy(df: DataFrame, groupCol: String, keyCol: String = "key",
      m: Int = 256): DataFrame =
    hllEstimate(hllRegisters(df, groupCol, keyCol, m), groupCol, m)

  /** The per-group register table (groupCol, reg, mj) — ≤ groups×m
    * rows. Split out because the register aggregation is exactly what
    * a STREAM maintains as state
    * ([[graft.streaming.StreamingOps.hllRegistersStream]]): max is
    * the streaming-safe fold, and the same table merges across
    * shards by register-wise max. */
  def hllRegisters(df: DataFrame, groupCol: String, keyCol: String = "key",
      m: Int = 256): DataFrame = {
    require(m >= 16 && (m & (m - 1)) == 0, "m must be a power of two >= 16")
    df.select(col(groupCol),
        Md5Hash60.hash60(concat(lit("hll|"), col(keyCol))).as("hv"))
      .select(col(groupCol), (col("hv") % m).as("reg"),
        least(lit(53) - length(conv(expr(s"hv div $m"), 10, 2)), lit(32))
          .cast("long").as("rho"))
      .groupBy(col(groupCol), col("reg")).agg(max(col("rho")).as("mj"))
  }

  /** Finish an estimate from a register table (batch output of
    * [[hllRegisters]], a streamed state snapshot, or a max-merge of
    * shard tables). */
  def hllEstimate(regs: DataFrame, groupCol: String,
      m: Int = 256): DataFrame = {
    require(m >= 16 && (m & (m - 1)) == 0, "m must be a power of two >= 16")
    val alphaMicro = math.round(0.7213 / (1 + 1.079 / m) * 1e6)
    val m2Scaled = m.toLong * m.toLong * 4294967296L
    regs.groupBy(groupCol)
      .agg(
        (sum(expr("shiftleft(1L, cast(32 - mj as int))")) +
          (lit(m) - count(lit(1))) * 4294967296L).as("est_scaled"),
        (lit(m) - count(lit(1))).cast("long").as("v"))
      .withColumn("raw_est",
        expr(s"($alphaMicro * ($m2Scaled div est_scaled)) div 1000000"))
      .withColumn("hll_est",
        when(col("v") > 0 && col("raw_est") <= (5L * m / 2),
          round(lit(m) * log(lit(m.toDouble) / col("v")), 0).cast("long"))
          .otherwise(col("raw_est")))
      .select(groupCol, "v", "raw_est", "hll_est")
  }

  /** Heavy-hitter BIGRAMS by count-min estimate. Candidates are
    * proposed from a cheap deterministic document sample (`doc_id %
    * sampleMod == 0` — at scale the full key space is exactly what
    * you cannot enumerate, so a sample proposes and the sketch scores
    * each candidate at FULL-corpus weight). Exact counts ride along
    * so the one-sided-error invariant (`cms_est ≥ exact_n`) is
    * visible in the output and oracle-checked; nothing after the
    * first aggregation is ever occurrence-sized.
    *
    * @return top-k (key, exact_n, cms_est) by estimate.
    */
  def cmsHeavyHitters(df: DataFrame, k: Int = 50, depth: Int = 4,
      width: Int = 256, sampleMod: Int = 8, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val bg = df
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col(idCol), explode(expr(
        TextAnalysis.adjacentPairsExpr("toks", "w1", "w2"))).as("b"))
      .select(col(idCol), concat(col("b.w1"), lit(" "), col("b.w2")).as("key"))
    val exact = bg.groupBy("key").agg(count(lit(1)).as("exact_n"))
    val sketch = exact
      .select(addressed(col("key"), depth, width).as("sb"), col("exact_n"))
      .groupBy(col("sb.seed").as("seed"), col("sb.bucket").as("bucket"))
      .agg(sum(col("exact_n")).as("c"))
    val cands = bg.filter(col(idCol) % sampleMod === 0)
      .select("key").distinct()
    cmsEstimate(sketch, cands, "key", depth, width)
      .join(exact, Seq("key"))
      .orderBy(col("cms_est").desc, col("key"))
      .limit(k)
      .select("key", "exact_n", "cms_est")
  }

  /** The KMV hash contract — shared by the batch build, the set-op
    * estimates, the streaming twin, and the DuckDB oracle replay
    * (first 15 hex chars of md5, the repo-wide portable 60-bit hash). */
  def kmvHash(keyCol: Column): Column =
    Md5Hash60.hash60(concat(lit("kmv|"), keyCol.cast("string")))

  /** Per-group KMV (bottom-k theta) distinct sketch
    * ([[graft.expressions.KmvSketchAgg]]): the k smallest distinct
    * 60-bit key hashes, ascending. THE overlap sketch at 100 TB —
    * unlike HLL registers, two groups' states compose into union AND
    * intersection estimates ([[kmvOverlap]]), which is the
    * "distinct users in segment A ∩ segment B" question exact
    * COUNT(DISTINCT) needs a key-wide self-join shuffle to answer.
    *
    * Scale shape: ONE aggregation, no pre-distinct — insertion is
    * idempotent, so raw occurrence rows feed the bounded TreeSet
    * directly; map-side partials are ≤ k longs per group and shards
    * merge by folding (StreamingSpec proves the stream-state twin
    * value-identical). @return (groupCol, hs: array<long>). */
  def kmvSketchBy(df: DataFrame, groupCol: String, keyCol: String,
      k: Int = 256): DataFrame =
    df.select(col(groupCol), kmvHash(col(keyCol)).as("h"))
      .groupBy(groupCol)
      .agg(graft.expressions.KmvSketchAgg.kmv(col("h"), k).as("hs"))

  /** Distinct estimate from a sketch column: exact size when the
    * sketch is unsaturated (it then holds EVERY distinct hash), else
    * the classic (k−1)·2^60/θ with θ = the k-th minimum. Pure IEEE
    * double arithmetic on both engines — deterministic and
    * oracle-replayable. */
  def kmvEstimate(hs: Column, k: Int): Column =
    when(size(hs) < k, size(hs).cast("double"))
      .otherwise(round(
        lit((k - 1).toDouble) * lit(math.pow(2, 60)) /
          element_at(hs, k).cast("double"), 2))

  /** Pairwise set-operation estimates between every two group
    * sketches: combine A∪B's k smallest hashes into the union sketch
    * L, estimate |A∪B| from its threshold, and scale by the fraction
    * of L present in BOTH sketches for the intersection (Bar-Yossef
    * bottom-k composition). When L is unsaturated both inputs are
    * exhaustive, so both estimates degrade to EXACT counts.
    *
    * Scale shape: runs entirely on the sketch table (groups × k longs
    * — broadcast-sized); per-pair work is O(k²) array ops. Nothing
    * here touches the corpus. @return one row per unordered pair. */
  def kmvOverlap(sketches: DataFrame, groupCol: String,
      k: Int = 256): DataFrame = {
    val a = sketches.select(col(groupCol).as("grp_a"), col("hs").as("hs_a"))
    val b = sketches.select(col(groupCol).as("grp_b"), col("hs").as("hs_b"))
    a.join(b, col("grp_a") < col("grp_b"))
      .withColumn("l", slice(array_sort(array_union(col("hs_a"), col("hs_b"))), 1, k))
      .withColumn("kp", size(col("l")))
      .withColumn("est_union", kmvEstimate(col("l"), k))
      .withColumn("common", size(filter(col("l"), h =>
        array_contains(col("hs_a"), h) && array_contains(col("hs_b"), h))))
      .withColumn("est_inter",
        // kp = 0 (two all-null-key groups) must degrade to 0.0, not
        // a non-ANSI 0/0 null
        when(col("kp") === 0, lit(0.0)).otherwise(
          round(col("common").cast("double") / col("kp") * col("est_union"), 2)))
      .select(col("grp_a"), col("grp_b"),
        kmvEstimate(col("hs_a"), k).as("est_a"),
        kmvEstimate(col("hs_b"), k).as("est_b"),
        col("est_union"), col("est_inter"))
  }

  /** The quantile sketch's membership predicate — shared by the batch
    * build and the streaming twin so their states are row-identical. */
  def quantileSampleFilter(keyCol: Column, shift: Int): Column = {
    require(shift >= 0 && shift < 30, "shift out of range")
    pmod(Md5Hash60.hash60(concat(lit("qs|"), keyCol.cast("string"))),
      lit(1L << shift)) === 0
  }

  /** Mergeable quantile sketch ("sampled companions"): the sketch
    * state is the deterministic hash-threshold sample — rows whose
    * md5-60 of the key ≡ 0 mod 2^shift, a 1/2^shift uniform subset.
    * Because membership depends only on the key hash, the union of
    * shard/batch samples IS the sample of the union — the sketch
    * merges by plain UNION like the other sketches' states, and a
    * 100 TB quantile query sorts only corpus/2^shift rows (rank error
    * O(1/√sample) by standard order-statistics bounds). Quantiles over
    * the sample use the exact interpolated `percentile`, so estimates
    * are deterministic and the DuckDB oracle replays them
    * bit-identically; exact full-data quantiles ride along (the
    * hllDistinctBy pattern) so the measured error is visible in the
    * output rather than promised.
    *
    * @return (groupCol, n, n_sampled, p50_est, p90_est, p50_exact,
    *         p90_exact)
    */
  def quantileSketch(df: DataFrame, groupCol: String, keyCol: String,
      valCol: String, shift: Int = 3): DataFrame = {
    val sampled = df.filter(quantileSampleFilter(col(keyCol), shift))
    val est = sampled.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_sampled"),
        round(percentile(col(valCol), lit(0.5)), 4).as("p50_est"),
        round(percentile(col(valCol), lit(0.9)), 4).as("p90_est"))
    val exact = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        round(percentile(col(valCol), lit(0.5)), 4).as("p50_exact"),
        round(percentile(col(valCol), lit(0.9)), 4).as("p90_exact"))
    exact.join(est, Seq(groupCol), "left")
      .select(col(groupCol), col("n"), col("n_sampled"),
        col("p50_est"), col("p90_est"), col("p50_exact"), col("p90_exact"))
  }
}
