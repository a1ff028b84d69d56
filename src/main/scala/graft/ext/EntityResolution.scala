package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record linkage / entity resolution: collapse dirty near-duplicate
  * RECORDS (names with typos, case/whitespace noise) into canonical
  * entities. The classic pipeline — normalize, block on a strong key,
  * fuzzy-match within blocks, transitively close — expressed as plain
  * DataFrame ops over the shared [[Dedup.connectedComponents]] core.
  *
  * Differs from document dedup (minhash/simhash over token sets): ER
  * links SHORT strings where a single edit is significant, so the
  * comparator is character edit distance, and candidate generation is
  * equality on a strong blocking key rather than LSH banding.
  *
  * Scale shape: normalization is a scan-speed map. The pairwise
  * comparison is quadratic ONLY within a block — the block-size cap
  * (`maxBlock`) bounds per-block work the way LSH band width bounds
  * candidate fan-out, and is standard ER practice (oversized blocks
  * mean the blocking key is too weak; re-block, don't compare).
  * Block-count filtering and the self-join both shuffle on the
  * blocking key, so the whole candidate stage is one key-clustered
  * exchange; the transitive closure is the size-gated
  * connectedComponents (driver union-find on small graphs, HashMin
  * loop at scale).
  */
object EntityResolution {

  /** lower/trim, then strip to the character class — the normalized
    * match fields. Spark regexp_replace replaces ALL matches (DuckDB
    * needs the explicit 'g' flag — oracle parity note). */
  private def stripTo(c: Column, keep: String): Column =
    regexp_replace(lower(trim(c)), s"[^$keep]", "")

  /** Resolve records (id, name) into entities.
    *
    * Match rule: two records are linked when their digit strings are
    * EQUAL (the strong key — the "same zip/phone" discipline) and
    * their letter strings are within `maxEdit` character edits (the
    * fuzzy name match). Entity id = min record id over the transitive
    * closure; records in no link (or with an empty/overloaded strong
    * key) resolve to themselves.
    *
    * @param maxBlock records sharing one strong key beyond this are
    *   left unlinked (blocking key too weak to compare pairwise).
    * @return (idCol, entity_id) — one row per input record.
    */
  def resolve(records: DataFrame, idCol: String = "record_id",
      nameCol: String = "name", maxEdit: Int = 1,
      maxBlock: Int = 64): DataFrame = {
    // normalized match fields; computed once — both the block census
    // and the pairwise join read this projection
    val n = records.select(col(idCol),
      stripTo(col(nameCol), "a-z").as("letters"),
      stripTo(col(nameCol), "0-9").as("digits"))
    val blocked = n.filter(col("digits") =!= "")
    // block census: keyed aggregation on the blocking key — the same
    // shuffle layout the pairwise self-join needs, so AQE reuses the
    // exchange; the census is block-cardinality-sized, never
    // record-cardinality-sized
    val blockSizes = blocked.groupBy("digits")
      .agg(count(lit(1)).as("block_n"))
      .filter(col("block_n") <= maxBlock)
      .select("digits")
    val nb = blocked.join(blockSizes, Seq("digits"))
    val a = nb.select(col("digits"), col(idCol).as("src"),
      col("letters").as("la"))
    val b = nb.select(col("digits"), col(idCol).as("dst"),
      col("letters").as("lb"))
    // within-block pairwise: equi-join on the strong key with the
    // edit-distance predicate as a residual — Spark's levenshtein
    // takes the early-exit threshold form so non-matches cost O(maxEdit·len)
    val edges = a.join(b, Seq("digits"))
      .filter(col("src") < col("dst") &&
        levenshtein(col("la"), col("lb"), maxEdit) >= 0)
      .select("src", "dst")
    val comp = Dedup.connectedComponents(edges, "src", "dst")
    n.join(comp.withColumnRenamed("node", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("component"), col(idCol)).as("entity_id"))
  }

  /** [[resolve]] with the Jaro–Winkler comparator in place of the
    * edit-distance cap: linked when digits are equal AND
    * jw(letters) ≥ `minJw` (micro-compared, so the threshold
    * replays exactly). Similarity thresholds transfer across name
    * lengths where an absolute edit cap does not — the standard
    * choice when record names vary widely in length. Same blocking,
    * census, and closure as [[resolve]]; only the residual differs
    * (the codegen'd [[graft.expressions.JaroWinkler]] in the
    * pairwise hot loop).
    */
  def resolveJw(records: DataFrame, idCol: String = "record_id",
      nameCol: String = "name", minJw: Double = 0.9,
      maxBlock: Int = 64): DataFrame = {
    val minJwMicro = math.round(minJw * 1e6)
    val n = records.select(col(idCol),
      stripTo(col(nameCol), "a-z").as("letters"),
      stripTo(col(nameCol), "0-9").as("digits"))
    val blocked = n.filter(col("digits") =!= "")
    val blockSizes = blocked.groupBy("digits")
      .agg(count(lit(1)).as("block_n"))
      .filter(col("block_n") <= maxBlock)
      .select("digits")
    val nb = blocked.join(blockSizes, Seq("digits"))
    val a = nb.select(col("digits"), col(idCol).as("src"),
      col("letters").as("la"))
    val b = nb.select(col("digits"), col(idCol).as("dst"),
      col("letters").as("lb"))
    val edges = a.join(b, Seq("digits"))
      .filter(col("src") < col("dst") &&
        round(graft.expressions.JaroWinkler.jw(col("la"), col("lb")) * 1e6, 0)
          .cast("long") >= minJwMicro)
      .select("src", "dst")
    val comp = Dedup.connectedComponents(edges, "src", "dst")
    n.join(comp.withColumnRenamed("node", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("component"), col(idCol)).as("entity_id"))
  }

  /** Sorted-neighborhood candidate generation (Hernández & Stolfo
    * 1995) — the OTHER classic ER strategy: sort all records by a
    * composite key and compare each record only with its `window−1`
    * successors. Complements [[resolve]]'s strong-key blocking: a
    * record with an EMPTY or dirty strong key never enters a block
    * at all, but still sorts next to its near-duplicates (the sort
    * key leads with the digit string, then letters, so keyless
    * records cluster by name). The match rule is unchanged —
    * digit-equal + letters within `maxEdit` — only candidate
    * generation differs; with a window covering each key group the
    * result is identical to blocking (ExtSpec asserts it), and on
    * keyless records it links where blocking cannot.
    *
    * Scale shape: the global rank is NOT a single-partition window —
    * it is the sort-merge idiom: repartitionByRange on the sort key,
    * sortWithinPartitions, per-partition sizes collected (one tiny
    * job, numPartitions longs) and turned into prefix-sum offsets, so
    * ranks are assigned in a zero-shuffle map pass. The window join
    * is an equi-join on rank div window (each record joins its own
    * and the next bucket — bounded 2× fan-out) with the |Δrank| <
    * window residual, so candidate volume is ≤ 2·window per record
    * regardless of corpus size — the sort is the method's one real
    * cost, exactly as in the single-node original.
    */
  def resolveSortedNeighborhood(records: DataFrame,
      idCol: String = "record_id", nameCol: String = "name",
      window: Int = 8, maxEdit: Int = 1): DataFrame = {
    require(window >= 2, "window must cover at least one neighbor")
    val spark = records.sparkSession
    val n = records.select(col(idCol),
      stripTo(col(nameCol), "a-z").as("letters"),
      stripTo(col(nameCol), "0-9").as("digits"))
      .withColumn("sort_key", concat(col("digits"), lit("|"), col("letters")))
    // distributed global rank: range-partition by the sort key, sort
    // within partitions, then add each partition's prefix offset
    val parts = n.repartitionByRange(col("sort_key"), col(idCol))
      .sortWithinPartitions(col("sort_key"), col(idCol))
      .localCheckpoint()
    val sizes = parts.rdd.mapPartitionsWithIndex { case (i, it) =>
      Iterator((i, it.size.toLong)) }.collect().sortBy(_._1)
    val offsets = sizes.map(_._2).scanLeft(0L)(_ + _)
    val offsetByPart = spark.sparkContext.broadcast(offsets)
    val ranked = spark.createDataFrame(
      parts.rdd.mapPartitionsWithIndex { case (i, it) =>
        var r = offsetByPart.value(i)
        it.map { row => r += 1
          org.apache.spark.sql.Row(row.get(0), row.getString(1),
            row.getString(2), r) }
      },
      org.apache.spark.sql.types.StructType(
        parts.schema.fields.take(3) :+
          org.apache.spark.sql.types.StructField("rank",
            org.apache.spark.sql.types.LongType)))
      .localCheckpoint()
    Checkpoints.release(parts)
    // window pairs via bucket equi-join: a record in bucket b meets
    // bucket b and b+1 — covers every |Δrank| < window pair exactly
    val a = ranked.select(col(idCol).as("src"), col("letters").as("la"),
      col("digits").as("da"), col("rank").as("ra"),
      expr(s"rank div $window").as("bucket"))
    val b0 = ranked.select(col(idCol).as("dst"), col("letters").as("lb"),
      col("digits").as("db"), col("rank").as("rb"),
      expr(s"rank div $window").as("bucket"))
    val b = b0.unionAll(b0.withColumn("bucket", col("bucket") - 1))
    val edges = a.join(b, Seq("bucket"))
      .filter(col("rb") > col("ra") && col("rb") - col("ra") < window &&
        col("da") === col("db") &&
        levenshtein(col("la"), col("lb"), maxEdit) >= 0)
      .select("src", "dst")
    val comp = Dedup.connectedComponents(edges, "src", "dst")
    ranked.join(comp.withColumnRenamed("node", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("component"), col(idCol)).as("entity_id"))
  }

  /** Deterministic dirty-record generator for the demo query/oracle:
    * the clean rows plus typo'd variants (insertion, deletion,
    * case/whitespace noise) at disjoint id offsets — the oracle
    * replays the same arithmetic, so expected entities are exactly
    * the clean keys. */
  def customerVariants(customer: DataFrame): DataFrame = {
    val base = customer.select(col("c_custkey").as("record_id"),
      col("c_name").as("name"))
    def variant(mod: Int, offset: Long, name: Column) =
      customer.filter(col("c_custkey") % mod === 0)
        .select((col("c_custkey") + offset).as("record_id"), name.as("name"))
    base
      .unionAll(variant(5, 1000000L,
        regexp_replace(col("c_name"), "Customer", "Custoomer")))
      .unionAll(variant(7, 2000000L,
        regexp_replace(col("c_name"), "Customer", "Custmer")))
      .unionAll(variant(3, 3000000L,
        concat(lit("  "), upper(col("c_name")), lit(" "))))
  }

  /** One Fellegi–Sunter comparison field: the record column, its
    * (m, u) probabilities — m = P(agree | same entity),
    * u = P(agree | different entities) — and the agreement rule
    * (exact normalized equality by default; Jaro–Winkler ≥ `jwMin`
    * when `jwMin` < 1). The log₂ likelihood-ratio weights fold to
    * INTEGER MICRO constants here, on the driver, once — the
    * distributed plan never evaluates a transcendental, and an
    * oracle regenerates the identical constants from the same
    * (m, u). */
  final case class FsField(field: String, m: Double, u: Double,
      jwMin: Double = 1.0) {
    require(m > 0 && m < 1 && u > 0 && u < 1 && m > u,
      s"need 0 < u < m < 1, got m=$m u=$u")
    def agreeMicro: Long =
      math.round(math.log(m / u) / math.log(2.0) * 1e6)
    def disagreeMicro: Long =
      math.round(math.log((1 - m) / (1 - u)) / math.log(2.0) * 1e6)
  }

  /** Fellegi–Sunter probabilistic record linkage (Fellegi & Sunter
    * 1969, JASA — the model behind every serious master-data /
    * identity-resolution system): candidate pairs from strong-key
    * blocking score the SUM of per-field log₂ likelihood-ratio
    * weights — `agreeMicro` when the field agrees, `disagreeMicro`
    * when it doesn't — and the two thresholds cut the score line into
    * match / clerical-review / nonmatch, the paper's decision rule.
    * Complements [[resolve]]/[[resolveJw]] (single-field yes/no
    * links): FS weighs EVERY field's evidence, so one noisy field
    * cannot veto a link that three strong fields support.
    *
    * Exactness contract: weights are driver-side integer micro
    * constants ([[FsField]]); pair scores are exact long sums; JW
    * agreement compares micro-rounded similarity (the
    * [[resolveJw]]/DuckDB-parity discipline); thresholds compare
    * micro longs. The whole trace replays on any engine.
    *
    * Scale shape: the pair space is a census-capped equi-join on the
    * blocking key (never all-pairs — the [[resolve]] discipline);
    * each pair evaluates a fixed number of codegen'd comparators
    * (equality / [[graft.expressions.JaroWinkler]]).
    *
    * @return (a_id, b_id, score_micro, decision) for every in-block
    *         pair, decision ∈ match|review|nonmatch. */
  /** The shared candidate stage: census-capped in-block pairs with a
    * 0/1 agreement flag per field — the sufficient statistics BOTH
    * [[fellegiSunter]] (weighting) and [[fellegiSunterEm]]
    * (estimation) consume.
    * @return (a_id, b_id, agree_<field>...) */
  private[graft] def agreementPairs(records: DataFrame, blockCol: String,
      fields: Seq[FsField], idCol: String, maxBlock: Int): DataFrame = {
    val norm = records.select(col(idCol) +: col(blockCol).as("blk") +:
      fields.map(f => lower(trim(col(f.field))).as(f.field)): _*)
    val blockSizes = norm.groupBy("blk").agg(count(lit(1)).as("block_n"))
      .filter(col("block_n") <= maxBlock).select("blk")
    val nb = norm.join(blockSizes, Seq("blk"))
    val a = nb.select(col("blk") +: col(idCol).as("a_id") +:
      fields.map(f => col(f.field).as("a_" + f.field)): _*)
    val b = nb.select(col("blk") +: col(idCol).as("b_id") +:
      fields.map(f => col(f.field).as("b_" + f.field)): _*)
    val agreeCols = fields.map { f =>
      val agree =
        if (f.jwMin >= 1.0) col("a_" + f.field) === col("b_" + f.field)
        else round(graft.expressions.JaroWinkler.jw(
            col("a_" + f.field), col("b_" + f.field)) * 1e6, 0)
          .cast("long") >= math.round(f.jwMin * 1e6)
      when(agree, 1).otherwise(0).as("agree_" + f.field)
    }
    a.join(b, Seq("blk")).filter(col("a_id") < col("b_id"))
      .select(col("a_id") +: col("b_id") +: agreeCols: _*)
  }

  def fellegiSunter(records: DataFrame, blockCol: String,
      fields: Seq[FsField], upperMicro: Long, lowerMicro: Long,
      idCol: String = "record_id", maxBlock: Int = 64): DataFrame = {
    require(fields.nonEmpty && upperMicro >= lowerMicro)
    val score = fields.map { f =>
      when(col("agree_" + f.field) === 1, lit(f.agreeMicro))
        .otherwise(lit(f.disagreeMicro))
    }.reduce(_ + _)
    agreementPairs(records, blockCol, fields, idCol, maxBlock)
      .withColumn("score_micro", score)
      .withColumn("decision",
        when(col("score_micro") >= upperMicro, lit("match"))
          .when(col("score_micro") <= lowerMicro, lit("nonmatch"))
          .otherwise(lit("review")))
      .select("a_id", "b_id", "score_micro", "decision")
  }

  /** Unsupervised (m, u, p) estimation for [[fellegiSunter]] — the EM
    * fit of the original paper (Winkler 1988's formulation): the
    * agreement-pattern HISTOGRAM (≤2^k rows for k fields — the only
    * thing collected to the driver, never the pairs) is a binary
    * mixture of a match class (rate mᵢ per field, prevalence p) and a
    * nonmatch class (rate uᵢ); `iters` fixed EM rounds re-estimate
    * them from the caller's priors (the FsField (m, u) act as the
    * init). This is how production linkage gets weights WITHOUT
    * labeled pairs.
    *
    * Determinism: the histogram is exact long counts; each EM round
    * is fixed-shape IEEE arithmetic over ≤2^k patterns summed in
    * canonical pattern order; outputs round to 6dp — the DuckDB
    * oracle replays the identical unrolled rounds.
    *
    * Scale shape: ONE aggregation over the candidate pairs (map-side
    * combine to ≤2^k rows); the fit itself is driver math on the
    * histogram, the same bounded-model-collect discipline as
    * k-means centroid fitting.
    *
    * @return per-field fitted (field, m, u) plus the match prevalence
    *         p — all clamped into [1e-6, 1−1e-6]. */
  def fellegiSunterEm(records: DataFrame, blockCol: String,
      fields: Seq[FsField], iters: Int = 5, pInit: Double = 0.1,
      idCol: String = "record_id", maxBlock: Int = 64)
      : (Seq[(String, Double, Double)], Double) = {
    val k = fields.size
    val agreeCols = fields.map(f => "agree_" + f.field)
    val hist = agreementPairs(records, blockCol, fields, idCol, maxBlock)
      .groupBy(agreeCols.map(col): _*).agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (agreeCols.indices.map(i => r.getInt(i)).toVector,
        r.getLong(k)))
      .sortBy(_._1.mkString) // canonical order: sums replay exactly
    var m = fields.map(_.m).toArray
    var u = fields.map(_.u).toArray
    var p = pInit
    for (_ <- 0 until iters) {
      var sumCR = 0.0; var sumCN = 0.0; var sumC = 0.0
      val mNum = Array.fill(k)(0.0); val uNum = Array.fill(k)(0.0)
      for ((pat, c) <- hist) {
        var wm = p; var wu = 1.0 - p
        for (i <- 0 until k) {
          wm *= (if (pat(i) == 1) m(i) else 1.0 - m(i))
          wu *= (if (pat(i) == 1) u(i) else 1.0 - u(i))
        }
        val r = wm / (wm + wu)
        sumCR += c * r; sumCN += c * (1.0 - r); sumC += c
        for (i <- 0 until k if pat(i) == 1) {
          mNum(i) += c * r; uNum(i) += c * (1.0 - r)
        }
      }
      // 12dp round per round: the oracle's sums may associate
      // differently at the last ulp, and EM iterates — squashing to
      // 12dp each round keeps both traces identical long before the
      // 6dp output rounding. Clamp per round too: a rate that hits an
      // exact 0/1 boundary zeroes a whole weight product and the next
      // round divides 0/0 — clamped, every weight stays positive and
      // no guard is ever needed (the oracle replays the same clamp)
      def r12(x: Double) = BigDecimal(x)
        .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
      def clamp(x: Double) = math.min(1.0 - 1e-6, math.max(1e-6, x))
      m = mNum.map(x => clamp(r12(x / sumCR)))
      u = uNum.map(x => clamp(r12(x / sumCN)))
      p = clamp(r12(sumCR / sumC))
    }
    (fields.indices.map(i => (fields(i).field, m(i), u(i))), p)
  }

  /** Deterministic multi-field dirty-record generator for the FS demo
    * query/oracle: each customer yields a clean record (key·2) and a
    * twin (key·2+1) with field-selective noise — name typo on key%3
    * ('Customer'→'Custommer', still above the JW gate), market
    * segment clobbered on key%4 (disagreement on a 5-category field —
    * the high-u evidence), synthetic phone's last digit dropped on
    * key%5 (low-u evidence). Blocking key = key div 10, so twins
    * always co-block and the other ≤18 records in the block are
    * near-key strangers — exactly the pairs FS must score apart. */
  def customerLinkRecords(customer: DataFrame): DataFrame = {
    val phone = concat(lit("555-"),
      lpad(col("c_custkey").cast("string"), 9, "0"))
    val base = customer.select(
      (col("c_custkey") * 2).as("record_id"),
      expr("c_custkey div 10").cast("string").as("blk"),
      col("c_name").as("name"),
      col("c_mktsegment").as("segment"),
      phone.as("phone"))
    val twin = customer.select(
      (col("c_custkey") * 2 + 1).as("record_id"),
      expr("c_custkey div 10").cast("string").as("blk"),
      when(col("c_custkey") % 3 === 0,
        regexp_replace(col("c_name"), "Customer", "Custommer"))
        .otherwise(col("c_name")).as("name"),
      when(col("c_custkey") % 4 === 0, lit("MOVED"))
        .otherwise(col("c_mktsegment")).as("segment"),
      when(col("c_custkey") % 5 === 0, substring(phone, 1, 12))
        .otherwise(phone).as("phone"))
    base.unionAll(twin)
  }

  /** [[customerVariants]] plus KEYLESS record families (no digits at
    * all — letters from the md5 of the key, a trailing-letter typo on
    * the twin): strong-key blocking can never link these, the
    * sorted-neighborhood pass must. */
  def customerVariantsKeyless(customer: DataFrame): DataFrame = {
    val zzName = concat(lit("zz"), regexp_replace(
      md5(concat(lit("kl|"), col("c_custkey").cast("string"))),
      "[0-9]", ""))
    def keyless(offset: Long, name: Column) =
      customer.filter(col("c_custkey") % 13 === 0)
        .select((col("c_custkey") + offset).as("record_id"), name.as("name"))
    customerVariants(customer)
      .unionAll(keyless(4000000L, zzName))
      .unionAll(keyless(5000000L, concat(zzName, lit("x"))))
  }
}
