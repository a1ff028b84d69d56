package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Curation

/** Semantic evidence for the curation operators (the DuckDB oracle
  * proves engine parity; these prove the operators mean what they
  * claim on planted inputs).
  */
class CurationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  test("repetitionScore: looping text scores high, diverse text scores 0") {
    val docs = Seq(
      Doc(1, "spam spam spam spam spam spam spam spam"),
      Doc(2, "one two three four five six seven eight")).toDF
    val r = Curation.repetitionScore(docs)
      .select("doc_id", "repetition").as[(Long, Double)].collect().toMap
    assert(r(1L) > 0.8, s"looping doc scored ${r(1L)}")
    assert(r(2L) == 0.0, s"diverse doc scored ${r(2L)}")
  }

  test("hashSplit: deterministic, exhaustive, roughly proportional") {
    val docs = (0L until 1000L).map(i => Doc(i, "x")).toDF
    val s1 = Curation.hashSplit(docs).groupBy("split").count()
      .as[(String, Long)].collect().toMap
    val s2 = Curation.hashSplit(docs).groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(s1 == s2, "split not deterministic")
    assert(s1.values.sum == 1000)
    assert(s1("train") > 700 && s1("train") < 900, s"train=${s1("train")}")
    assert(s1("val") > 50 && s1("val") < 150, s"val=${s1("val")}")
  }

  test("stratifiedSample: deterministic subset at ~permille rate") {
    val docs = (0L until 1000L).map(i => Doc(i, "x")).toDF
    val n1 = Curation.stratifiedSample(docs, permille = 100).count()
    val n2 = Curation.stratifiedSample(docs, permille = 100).count()
    assert(n1 == n2)
    assert(n1 > 50 && n1 < 150, s"sampled $n1 of 1000 at 10%")
  }

  test("contamination: flags the doc sharing trigrams with the benchmark doc") {
    // doc 0 is the benchmark (0 % 97 == 0); doc 5 copies a span of it
    val docs = Seq(
      Doc(0, "alpha beta gamma delta epsilon zeta eta theta"),
      Doc(5, "alpha beta gamma delta unrelated tail words here"),
      Doc(7, "completely different text with no overlap at all")).toDF
    val flagged = Curation.contamination(docs, benchMod = 97, minShared = 2)
      .select("doc_id").as[Long].collect().toSet
    assert(flagged == Set(5L), s"flagged $flagged")
  }

  test("sourceQuality: dup_rate reflects exact duplicates per source") {
    val docs = Seq(
      (1L, "same exact text here", "srcA"),
      (2L, "same exact text here", "srcA"),   // dup of 1 in srcA
      (3L, "different text entirely", "srcA"),
      (4L, "unique text for source b", "srcB"))
      .toDF("doc_id", "text", "source")
    val r = Curation.sourceQuality(docs)
      .select("source", "n_docs", "dup_rate")
      .as[(String, Long, Double)].collect()
      .map { case (s, n, d) => (s, (n, d)) }.toMap
    assert(r("srcA")._1 == 3 && math.abs(r("srcA")._2 - (1.0 - 2.0 / 3)) < 1e-6)
    assert(r("srcB")._1 == 1 && r("srcB")._2 == 0.0)
  }

  test("unigramLogProb: rare-token docs score higher than common-token docs") {
    val docs = Seq(
      (1L, "common common common common"),
      (2L, "common common common rareword")).toDF("doc_id", "text")
    val r = Curation.unigramLogProb(docs)
      .select("doc_id", "mean_nll").as[(Long, Double)].collect().toMap
    assert(r(2L) > r(1L), s"doc with the rare token should score higher: $r")
  }

  test("vocabTopK: most frequent token first, ties on token") {
    val docs = Seq(Doc(1, "b b b a a c"), Doc(2, "a b d d")).toDF
    val top = Curation.vocabTopK(docs, k = 3)
      .as[(String, Long)].collect().toSeq
    assert(top == Seq(("b", 4L), ("a", 3L), ("d", 2L)), s"got $top")
  }

  test("domainCap: hot domain capped at k by quality, small domain untouched") {
    val hot = (1L to 10L).map(i =>
      // lower ids get more stopwords -> higher quality score
      (i, ("the a of and is to in it that" * 2).take(60 - 3 * i.toInt) +
        " filler words here", "hot"))
    val docs = (hot :+ ((100L, "the a of and is unique small domain text", "cold")))
      .toDF("doc_id", "text", "source")
    val out = Curation.domainCap(docs, k = 3).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(3))).toMap
    assert(out.count(_._2._1 == "hot") == 3, s"hot domain must cap at 3: $out")
    assert(out.contains(100L), s"small domain survives: $out")
    assert(out.values.forall(_._2 <= 3))
  }

  test("weightedSample: zero-weight rows never sampled; rate proportional to weight") {
    val docs = (1L to 200L).map(i =>
      (i, if (i % 2 == 0) 1.0 else 0.0)).toDF("doc_id", "w")
    val out = Curation.weightedSample(docs, targetFrac = 0.5, weightCol = "w")
      .as[(Long, Double)].collect()
    assert(out.forall(_._1 % 2 == 0), "zero-weight rows must never be sampled")
    // accept rate for w=1 rows is min(1, 1e6*0.5*200/1e8) = 1.0 -> all kept
    assert(out.length == 100, s"unit-weight rows all kept at rate 1.0: ${out.length}")
    val rerun = Curation.weightedSample(docs, targetFrac = 0.5, weightCol = "w")
      .as[(Long, Double)].collect()
    assert(out.sortBy(_._1).toSeq == rerun.sortBy(_._1).toSeq, "deterministic")
  }

  test("tokenBudgetAllocate: exact waterfill — saturation, redistribution, budget kept") {
    import spark.implicits._
    // sources with 10/20/70 tokens (one doc each of that many words)
    def words(n: Int) = Seq.fill(n)("t").mkString(" ")
    val docs = Seq((1L, "a", words(10)), (2L, "b", words(20)),
      (3L, "c", words(70))).toDF("doc_id", "source", "text")
    // α = 0 (uniform weights 1e6), B = 60:
    // round 1: share = 60/3 = 20 -> a (10) and b (20) saturate
    // round 2: rem = 30, share = 30 < 70 -> done
    // allocs (10, 20, 30), Σ = 60 = B exactly
    val out = Curation.tokenBudgetAllocate(docs, 60L, alpha = 0.0)
      .select("source", "tokens_available", "weight_micro",
        "tokens_alloc", "saturated", "alloc_frac")
      .as[(String, Long, Long, Long, Boolean, Double)]
      .collect().sortBy(_._1).toSeq
    assert(out == Seq(
      ("a", 10L, 1000000L, 10L, true, 1.0),
      ("b", 20L, 1000000L, 20L, true, 1.0),
      ("c", 70L, 1000000L, 30L, false, 0.428571)), s"$out")
    // α = 1 proportional, B = 50: shares 50·T/100 = (5,10,35), no
    // saturation, Σ = 50
    val prop = Curation.tokenBudgetAllocate(docs, 50L, alpha = 1.0)
      .select("source", "tokens_alloc", "saturated")
      .as[(String, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(prop == Seq(("a", 5L, false), ("b", 10L, false),
      ("c", 35L, false)), s"$prop")
    // budget above capacity: everyone saturates at their own T
    val all = Curation.tokenBudgetAllocate(docs, 200L, alpha = 0.5)
      .select("source", "tokens_alloc", "saturated")
      .as[(String, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(all == Seq(("a", 10L, true), ("b", 20L, true),
      ("c", 70L, true)), s"$all")
    // zero budget allocates nothing; NULL sources are excluded
    val zero = Curation.tokenBudgetAllocate(
      docs.unionAll(Seq((9L, null: String, "x y")).toDF(
        "doc_id", "source", "text")), 0L)
    assert(zero.count() == 3 &&
      zero.agg(org.apache.spark.sql.functions.sum("tokens_alloc"))
        .head.getLong(0) == 0L)
  }

  test("tokenBudgetSample: rates follow the allocation; saturated sources keep everything") {
    import spark.implicits._
    def words(n: Int) = Seq.fill(n)("t").mkString(" ")
    // α = 0, B = 600 of 1000 total tokens: round 1 share = 200 each,
    // so a (100 tokens) and b (200) both saturate; round 2 hands c
    // the remaining 300 of its 700 -> rate 300/700 = 428571 micro
    val docs = ((1L to 10L).map(i => (i, "a", words(10))) ++
      (101L to 120L).map(i => (i, "b", words(10))) ++
      (201L to 270L).map(i => (i, "c", words(10))))
      .toDF("doc_id", "source", "text")
    val out = Curation.tokenBudgetSample(docs, 600L, alpha = 0.0)
      .as[(Long, String, Long)].collect()
    val rates = out.groupBy(_._2).view.mapValues(_.head._3).toMap
    assert(rates("a") == 1000000L && rates("b") == 1000000L,
      s"saturated sources sample at rate 1: $rates")
    assert(rates("c") == 428571L, s"c's rate must be alloc/T: $rates")
    // saturated sources keep EVERY doc (rate 1e6 accepts all hashes)
    assert(out.count(_._2 == "a") == 10 && out.count(_._2 == "b") == 20)
    // deterministic replay
    val rerun = Curation.tokenBudgetSample(docs, 600L, alpha = 0.0)
      .as[(Long, String, Long)].collect()
    assert(out.sortBy(_._1).toSeq == rerun.sortBy(_._1).toSeq)
  }

  test("temperatureSample: rare sources upweighted, hot sources capped below 1") {
    // source "hot": 900 docs, "rare": 100 docs. √-temperature gives
    // rare a ~3x higher accept rate than hot (√900:√100 = 3:1 weight
    // on a 9:1 corpus → per-doc rate ratio 3x).
    val docs = ((1L to 900L).map(i => (i, "hot")) ++
      (1001L to 1100L).map(i => (i, "rare"))).toDF("doc_id", "source")
    val out = Curation.temperatureSample(docs, targetFrac = 0.3)
      .as[(Long, String, Long)].collect()
    val rates = out.groupBy(_._2).view.mapValues(_.head._3).toMap
    assert(rates.keySet == Set("hot", "rare"))
    val ratio = rates("rare").toDouble / rates("hot")
    assert(math.abs(ratio - 3.0) < 1e-3, s"rate ratio must be ~3x: $rates")
    assert(rates.values.forall(_ <= 1000000L), "rates capped at 1")
    val rerun = Curation.temperatureSample(docs, targetFrac = 0.3)
      .as[(Long, String, Long)].collect()
    assert(out.sortBy(_._1).toSeq == rerun.sortBy(_._1).toSeq, "deterministic")
    // NULL sources are excluded from weights AND sample: rates for the
    // real sources must be identical with or without the null rows
    val withNulls = docs.unionAll(
      (2001L to 2500L).map(i => (i, null: String)).toDF("doc_id", "source"))
    val out2 = Curation.temperatureSample(withNulls, targetFrac = 0.3)
      .as[(Long, String, Long)].collect()
    assert(out2.forall(_._2 != null), "null-source rows never sampled")
    assert(out2.sortBy(_._1).toSeq == out.sortBy(_._1).toSeq,
      "null rows must not perturb real sources' rates or draws")
  }

  test("epochShuffle: valid dense per-shard positions; epochs re-deal; reruns identical") {
    val docs = (1L to 400L).map(Tuple1(_)).toDF("doc_id")
    val e0 = Curation.epochShuffle(docs, epoch = 0, numShards = 4)
      .as[(Long, Int, Int)].collect()
    assert(e0.length == 400 && e0.forall(r => r._2 >= 0 && r._2 < 4))
    // positions within each shard are exactly 1..shardSize
    e0.groupBy(_._2).foreach { case (s, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length),
        s"shard $s positions must be dense from 1")
    }
    val e0b = Curation.epochShuffle(docs, epoch = 0, numShards = 4)
      .as[(Long, Int, Int)].collect()
    assert(e0.sortBy(_._1).toSeq == e0b.sortBy(_._1).toSeq, "deterministic rerun")
    val e1 = Curation.epochShuffle(docs, epoch = 1, numShards = 4)
      .as[(Long, Int, Int)].collect()
    assert(e0.sortBy(_._1).toSeq != e1.sortBy(_._1).toSeq,
      "a new epoch must re-deal the order")
  }

  test("dsirSample: target-like docs win the importance draw; deterministic") {
    // two disjoint vocabularies; the target speaks only vocab A, so
    // vocab-A raw docs carry positive LLR and must fill the top-k
    val vocabA = Seq("alpha", "beta", "gamma", "delta")
    val vocabB = Seq("omega", "sigma", "theta", "kappa")
    val raw = (1L to 40L).map { i =>
      val v = if (i <= 20) vocabA else vocabB
      (i, Seq.tabulate(12)(j => v((i + j).toInt % 4)).mkString(" "))
    }.toDF("doc_id", "text")
    val target = (100L to 119L).map(i =>
      (i, Seq.tabulate(12)(j => vocabA((i + j).toInt % 4)).mkString(" ")))
      .toDF("doc_id", "text")
    val picked = Curation.dsirSample(raw, target, k = 20)
      .select("doc_id").as[Long].collect().toSet
    assert(picked == (1L to 20L).toSet,
      s"vocab-A docs must win the draw, got $picked")
    // deterministic rerun, and zero-token docs never appear
    val again = Curation.dsirSample(raw, target, k = 20)
      .select("doc_id").as[Long].collect().toSet
    assert(picked == again, "portable-hash Gumbel draw must be reproducible")
    val withEmpty = raw.union(Seq((99L, "   ")).toDF("doc_id", "text"))
    assert(!Curation.dsirSample(withEmpty, target, k = 41)
      .select("doc_id").as[Long].collect().contains(99L),
      "zero-token docs have no weight and must drop out")
  }

  test("dedupReport: per-source counts with one cross-source dup family") {
    val docs = Seq(
      (1L, "dup text", "a"), (2L, "dup text", "a"), (3L, "dup text", "b"),
      (4L, "unique one", "a"), (5L, "unique two", "b")
    ).toDF("doc_id", "text", "source")
    val out = Curation.dedupReport(docs)
      .select("source", "n_docs", "n_dups", "n_distinct", "dup_rate")
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    // keeper of "dup text" is id 1 (source a): a has one dup (id 2),
    // b's copy (id 3) also counts as a dup in b's accounting
    assert(out("a") == (("a", 3L, 1L, 2L, 0.333333)), s"${out("a")}")
    assert(out("b") == (("b", 2L, 1L, 2L, 0.5)), s"${out("b")}")
  }

  test("memorizationScore: verbatim copy scores 1, partial overlap in between, fresh scores 0") {
    val ref = Seq((100L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val docs = Seq(
      (1L, "one two three four five six seven eight nine ten"), // verbatim
      (2L, "one two three four five six seven eight fresh tail here now"),
      (3L, "totally novel words that the reference has never seen before ever"),
      (4L, "short doc")                                          // < n tokens
    ).toDF("doc_id", "text")
    val out = Curation.memorizationScore(docs, ref, n = 8)
      .select("doc_id", "n_grams", "n_hit", "mem_score")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._4 == 1.0, s"verbatim copy must score 1: ${out(1L)}")
    // doc 2: 5 distinct 8-grams, exactly one ("one..eight") is in ref
    assert(out(2L) == ((2L, 5L, 1L, 0.2)), s"partial overlap: ${out(2L)}")
    assert(out(3L)._3 == 0L && out(3L)._4 == 0.0, s"fresh doc: ${out(3L)}")
    assert(!out.contains(4L), "docs with < n tokens have no grams")
  }

  test("perplexityBuckets: fluent repeats rank head, gibberish ranks tail, per source") {
    // six docs share phrasing (high-count bigrams -> low NLL); three
    // are singleton-bigram gibberish (high NLL). ntile(3) over nine
    // docs puts the gibberish squarely in the tail of its source.
    val fluent = (1L to 6L).map(i =>
      (i, "the cat sat on the mat and the dog sat on the rug", "a"))
    val noise = Seq(
      (7L, "zq xv wk jm pl nt rb gf dc hs", "a"),
      (8L, "yw uq os ia ne tr bm kd lf cg", "a"),
      (9L, "vv bb nn mm pp qq rr ss tt uu", "a"))
    val docs = (fluent ++ noise).toDF("doc_id", "text", "source")
    val out = Curation.perplexityBuckets(docs)
      .select("doc_id", "ppl_bucket").as[(Long, String)].collect().toMap
    assert(Seq(7L, 8L, 9L).forall(out(_) == "tail"),
      s"gibberish docs must land in the tail: $out")
    assert(Seq(1L, 2L, 3L).forall(out(_) == "head"),
      s"fluent low-NLL docs must land in the head: $out")
  }

  test("sharded operators: default shard count tracks session parallelism") {
    val dp = spark.sparkContext.defaultParallelism
    val docs = (1L to 2000L).map(i => (i, s"some text tokens $i"))
      .toDF("doc_id", "text")
    // default (knob unset) spreads over [0, defaultParallelism) with
    // every shard index in range; the explicit knob still wins
    for (shards <- Seq(
        Curation.epochShuffle(docs).select("shard"),
        Curation.lengthBucketBatches(docs).select("shard"),
        Curation.packChunks(docs).select("shard"))) {
      val vals = shards.distinct().as[Int].collect()
      assert(vals.forall(s => s >= 0 && s < dp),
        s"default shard ids must sit in [0, $dp): ${vals.sorted.toSeq}")
      if (dp > 1)
        assert(vals.length > 1, "hash sharding must use more than one shard")
    }
    assert(Curation.epochShuffle(docs, numShards = 3)
      .agg(max(col("shard"))).head().getInt(0) < 3, "explicit knob wins")
  }

  // a small two-source corpus whose docs all have DISTINCT bigram-NLL
  // values (different token patterns), so cell ties cannot occur at
  // cellMicros = 1 — the precondition for exact histogram equivalence
  private def tieFreeDocs = (1L to 12L).map { i =>
    val words = (0 to (i % 6).toInt + 2).map(j => s"w${(i * 7 + j * j) % 13}")
    (i, words.mkString(" ") + s" tail$i marker${i % 5}",
      if (i <= 6) "sa" else "sb")
  }.toDF("doc_id", "text", "source")

  test("perplexityBucketsApprox ≡ exact ntile form on cell-tie-free data") {
    val docs = tieFreeDocs
    // precondition: at cellMicros = 1 the cell IS the exact NLL —
    // assert no two docs of a source share one (else the test data
    // regressed, not the operator)
    val nll = Curation.bigramLogProb(docs)
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
    val dups = nll.groupBy("source", "mean_nll_micro").count()
      .filter(col("count") > 1).count()
    assert(dups === 0, "test corpus must be NLL-tie-free per source")
    val exact = Curation.perplexityBuckets(docs)
      .select("doc_id", "bucket", "ppl_bucket")
      .as[(Long, Int, String)].collect().toSet
    val approx = Curation.perplexityBucketsApprox(docs, cellMicros = 1L)
      .select("doc_id", "bucket", "ppl_bucket")
      .as[(Long, Int, String)].collect().toSet
    assert(approx === exact)
  }

  test("perplexityBucketsApprox: coarse cells keep cutoff-cell docs together") {
    val docs = tieFreeDocs
    // one giant cell per source → nothing is ever above a cutoff →
    // every doc lands in bucket 1 (cells cannot be split)
    val coarse = Curation.perplexityBucketsApprox(docs,
      cellMicros = 1000000000L)
    assert(coarse.filter(col("bucket") =!= 1).count() === 0)
    assert(coarse.count() === 12)
  }

  test("domainCapApprox ≡ exact domainCap kept set on tie-free data; ties widen") {
    val docs = tieFreeDocs
    val qs = graft.ext.TextAnalysis.withStats(docs)
      .groupBy(col("source"), col("quality_score")).count()
      .filter(col("count") > 1).count()
    assert(qs === 0, "test corpus must be quality-tie-free per source")
    val k = 3
    val exact = Curation.domainCap(docs, k)
      .select("doc_id").as[Long].collect().toSet
    val approx = Curation.domainCapApprox(docs, k)
      .select("doc_id").as[Long].collect().toSet
    assert(approx === exact)
    // planted boundary tie: 5 docs share one quality value; k = 2
    // must keep ALL of them (threshold cannot split a value)
    val tied = (1L to 5L).map(i => (i, "same words here", "sx"))
      .toDF("doc_id", "text", "source")
    assert(Curation.domainCapApprox(tied, 2).count() === 5)
    assert(Curation.domainCap(tied, 2).count() === 2)
  }

  test("noveltyScore: exact dups score 0, unique docs 1, partial overlap exact fraction") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),      // dup of 2: all grams shared
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "one two three four"),                  // fully unique: novelty 1
      (4L, "alpha beta gamma nine ten eleven"))    // shares ONLY 'alpha beta gamma' with 1/2
      .toDF("doc_id", "text")
    val n = graft.ext.Curation.noveltyScore(docs)
      .select("doc_id", "n_grams", "n_unique", "novelty")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(n(1L)._4 == 0.0 && n(2L)._4 == 0.0, s"exact dups: $n")
    assert(n(3L)._3 == 2L && n(3L)._4 == 1.0, s"unique doc: $n")
    // doc 4: 4 grams, 'alpha beta gamma' shared (df=3) → 3 unique of 4
    assert(n(4L)._2 == 4L && n(4L)._3 == 3L && n(4L)._4 == 0.75, s"partial: $n")
  }

  test("domainCapApprox: 50k-doc hot domain resolves without ranking documents") {
    // the hot-domain shape domainCap's window would serialize into one
    // task's sort at corpus scale: one domain carries 50k docs over a
    // handful of distinct quality values (template pages all score
    // alike). The value-count path must (a) finish with its window
    // over ≤ #distinct-values rows, (b) keep everything at or above
    // the k-th value, never fewer than k, (c) leave the cold domain
    // untouched.
    val hot = (1L to 50000L).map { i =>
      // 5 rotating text variants → at most 5 distinct quality values
      val v = (i % 5).toInt
      (i, ("the a of and is to in it that word " * (v + 2)).trim, "hot")
    }
    val docs = (hot :+ ((900000L, "the a of and is unique cold domain text", "cold")))
      .toDF("doc_id", "text", "source")
    val k = 7
    val out = Curation.domainCapApprox(docs, k)
      .select("doc_id", "source").as[(Long, String)].collect()
    val hotKept = out.count(_._2 == "hot")
    // threshold keeps the whole boundary value: ≥ k, and ≤ the two
    // highest-quality variant populations (10k docs each)
    assert(hotKept >= k, s"hot domain kept $hotKept < k=$k")
    assert(hotKept <= 20000, s"hot domain kept $hotKept — threshold ignored")
    assert(out.exists(_._2 == "cold"), "cold domain must survive")
    // the kept set is exactly { docs with quality >= the k-th value }:
    // every kept quality value must be >= every dropped one
    val kept = Curation.domainCapApprox(docs, k)
      .filter(col("source") === "hot")
      .select("quality_score").as[Double].collect().min
    val keptIds = out.map(_._1).toSet
    val dropped = graft.ext.TextAnalysis.withStats(docs)
      .filter(col("source") === "hot")
      .select("doc_id", "quality_score").as[(Long, Double)].collect()
      .filterNot(r => keptIds.contains(r._1)).map(_._2)
    assert(dropped.forall(_ < kept),
      s"dropped a doc at/above the kept threshold $kept")
  }

  test("negSamplingDraw: ^0.75 tempering lifts rare tokens, draw is deterministic") {
    // 'rare' appears once, 'common' 16 times: raw ratio 16x, tempered
    // ratio 16^.75 = 8x — the weight column must show exactly that
    val docs = Seq(Doc(1, ("common " * 16) + "rare")).toDF
    val out = Curation.negSamplingDraw(docs, k = 5)
      .select("token", "cnt", "w_micro").as[(String, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(out("rare")._3 == 1000000L) // 1^0.75 = 1
    assert(out("common")._3 == 8000000L, s"16^0.75 = 8: ${out("common")}")
    val rerun = Curation.negSamplingDraw(docs, k = 5)
      .select("token", "cnt", "w_micro").as[(String, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(rerun == out, "draw must be deterministic")
  }

  test("knBigramTable: hand-computed Kneser-Ney nanos on a tiny corpus") {
    // corpus "a b a b a c": c(ab)=2 c(ba)=2 c(ac)=1; cw1(a)=3 n1f(a)=2,
    // cw1(b)=2 n1f(b)=1; n1b=1 everywhere; T=3, D=3/4:
    //   P(b|a) = 1.25/3 + (0.75*2/3)(1/3) -> 416666666 + 166666666
    //   P(c|a) = 0.25/3 + same backoff    ->  83333333 + 166666666
    //   P(a|b) = 1.25/2 + (0.75*1/2)(1/3) -> 625000000 + 125000000
    val docs = Seq(Doc(1, "a b a b a c")).toDF
    val out = Curation.knBigramTable(docs)
      .select("w1", "w2", "c", "pkn_nano")
      .as[(String, String, Long, Long)].collect()
      .map { case (w1, w2, c, p) => ((w1, w2), (c, p)) }.toMap
    assert(out(("a", "b")) == (2L, 583333332L), s"got $out")
    assert(out(("a", "c")) == (1L, 249999999L))
    assert(out(("b", "a")) == (2L, 750000000L))
    // interpolated KN is a proper distribution: per history, observed
    // discounted mass + backoff weight * total continuation mass = 1
    // (exact in rationals; nano truncation loses < 1 nano per term)
    val pa = out(("a", "b"))._2 + out(("a", "c"))._2 +
      (750000000L * 2 / 3) * 1 / 3 // unseen (a,a): backoff-only term
    assert(math.abs(pa - 1000000000L) < 5, s"P(.|a) mass $pa")
  }

  test("corpusDrift: divergent source scores above mixture-shaped sources; JS bounded; partition-independent") {
    val common = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = (
      (0L until 20L).map(i => (i, common, "web")) ++
      (20L until 40L).map(i => (i, common, "wiki")) ++
      // drifted source: disjoint vocabulary
      (40L until 60L).map(i =>
        (i, "zygote quasar phantom nebula cipher oblique vortex matrix", "spam"))
    ).toDF("doc_id", "text", "source")
    val d = Curation.corpusDrift(docs, buckets = 64)
      .select("source", "kl_micro", "js_micro")
      .as[(String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(d("spam")._2 > d("web")._2 && d("spam")._2 > d("wiki")._2,
      s"disjoint-vocab source must lead KL: $d")
    assert(d("spam")._3 > d("web")._3, s"and JS: $d")
    // JS ≤ ln 2 (in micro), with smoothing slack
    d.values.foreach { case (s, _, js) =>
      assert(js >= -5 && js <= 693148, s"JS out of [0, ln2] for $s: $js") }
    // sources with identical token distributions score identically
    assert(d("web")._2 == d("wiki")._2 && d("web")._3 == d("wiki")._3,
      s"same-distribution sources must tie: $d")
    val d2 = Curation.corpusDrift(docs.repartition(13), buckets = 64)
      .select("source", "kl_micro", "js_micro")
      .as[(String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(d == d2, "partitioning must not change divergences")
  }

  test("columnMi: perfect dependence = ln2 with NMI 1; constant column guards to 0") {
    // x == y over a uniform 2-value domain: MI = H(X) = H(Y) = ln 2
    val dep = Seq(("a", "a", "z"), ("a", "a", "z"), ("b", "b", "z"),
      ("b", "b", "z")).toDF("x", "y", "konst")
    val out = graft.ext.Curation.columnMi(dep, Seq("x", "y", "konst"))
      .collect().map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs")) ->
        ((r.getAs[Double]("mi_nats"), r.getAs[Double]("nmi")))).toMap
    val ln2 = BigDecimal(math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(("x", "y")) == ((ln2, 1.0)))
    // a constant column has zero entropy: MI 0, NMI guarded to 0
    assert(out(("x", "konst")) == ((0.0, 0.0)))
    assert(out(("y", "konst")) == ((0.0, 0.0)))
    graft.ext.Checkpoints.releaseAll(spark)
  }

  test("yulesK: repetitive source scores high, all-distinct scores 0") {
    val docs = Seq(("rep", "a a a b"), ("div", "a b c d"))
      .toDF("source", "text")
    val out = graft.ext.TextAnalysis.yulesK(docs).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("vocab"),
          r.getAs[Double]("k")))).toMap
    // rep: counts {3,1}, m2 = 10, K = 1e4*(10-4)/16 = 3750
    assert(out("rep") == ((4L, 2L, 3750.0)))
    // every token distinct: m2 = N, K = 0 exactly
    assert(out("div") == ((4L, 4L, 0.0)))
  }

  test("dpDispersion: even spread scores 0, single-source term scores 0.5") {
    val docs = Seq(("s1", "aa bb"), ("s2", "aa cc")).toDF("source", "text")
    val out = graft.ext.TextAnalysis.dpDispersion(docs, topK = 10)
      .collect().map(r => r.getAs[Long]("total") -> r.getAs[Double]("dp"))
    // 'aa' (total 2) appears in both sources at exactly their size
    // share -> DP 0; 'bb'/'cc' (total 1) live in one source -> DP 0.5
    assert(out.filter(_._1 == 2L).map(_._2).toSeq == Seq(0.0))
    assert(out.filter(_._1 == 1L).map(_._2).toSeq.sorted == Seq(0.5, 0.5))
    graft.ext.Checkpoints.releaseAll(spark)
  }

  test("giniValue: equal values 0, one whale hits the n=4 maximum, ties fold per cell") {
    val df = Seq(("eq", 5L), ("eq", 5L), ("eq", 5L), ("eq", 5L),
      ("whale", 0L), ("whale", 0L), ("whale", 0L), ("whale", 10L),
      ("one", 7L))
      .toDF("group", "v")
    val out = graft.ext.Curation.giniValue(df)
      .collect().map(r => r.getAs[String]("grp") -> r).toMap
    assert(out("eq").getAs[Double]("gini") == 0.0)
    // {0,0,0,10}: iwx = 10·4 = 40 -> G = (80 − 50)/40 = 0.75, the
    // (n−1)/n maximum for n = 4
    assert(out("whale").getAs[Long]("total") == 10L)
    assert(out("whale").getAs[Double]("gini") == 0.75)
    // a single row has no inequality to measure
    assert(out("one").getAs[Double]("gini") == 0.0)
  }
}
