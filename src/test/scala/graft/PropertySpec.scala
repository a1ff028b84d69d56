package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests (SURVEY §5 "unit level"): the bucketing cascades are
  * total functions into fixed codomains for ANY string input, age is
  * null-safe on garbage, and the dialect translator preserves
  * SQL-text invariants. Generators are sampled with fixed seeds (the
  * scalatest-scalacheck bridge isn't on the offline classpath).
  */
class PropertySpec extends AnyFunSuite {
  import graft.functions.BqFunctions
  import graft.sql.BigQueryDialect
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  def forAll[A](gen: Gen[List[A]])(check: List[A] => Unit): Unit =
    (1L to 8L).foreach { seed =>
      gen.apply(Gen.Parameters.default, Seed(seed)).foreach(check)
    }

  val raceCodomain = Set("Prefer Not To Say", "Multiracial", "Hispanic", "Black",
    "Asian", "Native Hawaiian or other Pacific Islander",
    "Native American or Alaska Native", "White", "Other")
  val genderCodomain = Set("Prefer Not To Say", "Man", "Woman", "Non-binary")

  // strings biased toward the cascade's trigger words + arbitrary junk
  val tagGen: Gen[String] = Gen.oneOf(
    Gen.oneOf("White", "Other", "Man", "Woman", "Prefer not to say",
      "South Asian", "East Asian", "Hispanic or Latinx",
      "White, Black or African American", "Man, Woman", ""),
    Gen.alphaNumStr,
    Gen.asciiPrintableStr.map(_.take(40)))

  test("race/gender cascades are total with fixed codomains") {
    forAll(Gen.listOfN(40, tagGen)) { tags =>
      val df = tags.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "tag")
      val out = df.select(
        BqFunctions.raceBucket(col("tag")).as("race"),
        BqFunctions.genderBucket(col("tag")).as("gender"))
        .collect()
      out.foreach { r =>
        assert(raceCodomain.contains(r.getString(0)), s"race: ${r.getString(0)}")
        assert(genderCodomain.contains(r.getString(1)), s"gender: ${r.getString(1)}")
      }
    }
  }

  test("age is null or plausible for arbitrary birthday strings") {
    forAll(Gen.listOfN(40, Gen.asciiPrintableStr.map(_.take(12)))) { bdays =>
      val df = bdays.zipWithIndex.map { case (b, i) => (i.toLong, b) }.toDF("id", "birthday")
      val out = df.select(BqFunctions.ageAsOf(col("birthday"),
        to_date(lit("2026-08-12"))).as("age")).collect()
      out.foreach { r =>
        if (!r.isNullAt(0)) {
          val a = r.getInt(0)
          assert(a > -10000 && a < 10000) // garbage years parse to garbage ages, never throw
        }
      }
    }
  }

  test("CDC chunks partition the token stream exactly for arbitrary text") {
    // chunk boundaries may fall anywhere, but the chunks must always
    // reassemble to the full token sequence (no gaps, overlaps, or
    // reorders) and chunk_idx must be dense from 0
    val wordGen = Gen.oneOf(Gen.alphaNumStr.suchThat(_.nonEmpty).map(_.take(8)),
      Gen.oneOf("the", "a", "of", "license", "warranty", "data"))
    forAll(Gen.listOfN(12, Gen.listOfN(30, wordGen).map(_.mkString(" ")))) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val chunks = graft.ext.Dedup.cdcChunkTexts(docs, boundaryMod = 4)
      // dense 0-based chunk_idx per doc
      val idx = chunks.groupBy("doc_id")
        .agg(min("chunk_idx").as("lo"), max("chunk_idx").as("hi"),
          count(lit(1)).as("n"))
        .filter(col("lo") =!= 0 || col("hi") =!= col("n") - 1)
      assert(idx.count() == 0, "chunk_idx not dense from 0")
      // reassembly: chunks joined in chunk_idx order == token stream
      val got = chunks.groupBy("doc_id")
        .agg(concat_ws(" ", transform(
          array_sort(collect_list(struct(col("chunk_idx"), col("chunk_text")))),
          s => s.getField("chunk_text"))).as("got"))
      val want = docs.select(col("doc_id"),
        concat_ws(" ", graft.ext.TextAnalysis.tokens(col("text"))).as("want"))
      val bad = got.join(want, "doc_id").filter(col("got") =!= col("want"))
      assert(bad.count() == 0, "CDC chunks do not reassemble the token stream")
    }
  }

  test("dialect translator: balanced quotes preserved, no Jinja remains") {
    val models = Seq("intermediate/locations_clean.sql",
      "intermediate/stacked_users_partners.sql", "marts/user_base.sql")
    for (m <- models) {
      val p = java.nio.file.Paths.get(s"/root/reference/models/$m")
      assume(java.nio.file.Files.exists(p))
      val sql = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      val out = BigQueryDialect.translate(sql, Some("2026-08-12"))
      assert(!out.contains("{{") && !out.contains("}}"), s"$m: Jinja left behind")
      assert(out.count(_ == '\'') % 2 == 0, s"$m: unbalanced quotes")
      assert(!out.toLowerCase.contains("qualify"), s"$m: QUALIFY left behind")
      assert(!out.toLowerCase.contains("safe."), s"$m: SAFE. left behind")
    }
  }

  // small-alphabet word gen: forces token repeats so winnowing ties,
  // duplicate windows, and shingle overlaps actually occur
  val wordGen: Gen[String] = Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff")
  val docGen: Gen[List[String]] =
    Gen.choose(0, 30).flatMap(n => Gen.listOfN(n, wordGen))

  test("vincenty: symmetric, zero iff coincident, within 0.5% of haversine, ≤ half circumference") {
    import graft.expressions.VincentyDistance.meters
    val coordGen: Gen[List[(Double, Double, Double, Double)]] =
      Gen.listOfN(40, for {
        a <- Gen.chooseNum(-89.9, 89.9); b <- Gen.chooseNum(-179.9, 179.9)
        c <- Gen.chooseNum(-89.9, 89.9); d <- Gen.chooseNum(-179.9, 179.9)
      } yield (a, b, c, d))
    def hav(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
      val dLat = math.toRadians(lat2 - lat1) / 2
      val dLon = math.toRadians(lon2 - lon1) / 2
      val x = math.pow(math.sin(dLat), 2) +
        math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
          math.pow(math.sin(dLon), 2)
      6371008.8 * 2 * math.asin(math.sqrt(x))
    }
    forAll(coordGen) { pts =>
      pts.foreach { case (lat1, lon1, lat2, lon2) =>
        val d = meters(lat1, lon1, lat2, lon2)
        // the swapped direction walks an algebraically-equal but
        // differently-associated iteration — symmetric to ULPs
        val rev = meters(lat2, lon2, lat1, lon1)
        assert(d == rev || math.abs(d - rev) / math.max(d, 1.0) < 1e-12,
          s"asymmetric at ($lat1,$lon1)-($lat2,$lon2): $d vs $rev")
        assert(meters(lat1, lon1, lat1, lon1) == 0.0)
        assert(d >= 0.0 && d < 20037509.0 * 1.01,
          s"out of range: $d") // ~half WGS84 circumference + slack
        val h = hav(lat1, lon1, lat2, lon2)
        // nearly antipodal pairs are classic Vincenty's non-convergent
        // mode — fixed iterations keep it deterministic but not
        // sphere-close there, so the 0.5% envelope applies away from it
        if (h > 1000.0 && h < 19000000.0)
          assert(math.abs(d - h) / h < 0.006,
            s"($lat1,$lon1)-($lat2,$lon2): vincenty $d vs haversine $h")
      }
    }
  }

  test("winnowing coverage: every w-window of grams contains a selected position") {
    val k = 3; val w = 4
    forAll(Gen.listOfN(6, docGen)) { docs =>
      val df = docs.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val sel = graft.ext.Dedup.winnowFingerprints(df, k, w)
        .select("doc_id", "pos").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      docs.zipWithIndex.foreach { case (ws, i) =>
        val m = ws.length - k + 1 // gram count
        if (ws.length >= k + w - 1) {
          val ps = sel.getOrElse(i.toLong, Set.empty)
          (0 to m - w).foreach { s =>
            assert(ps.exists(p => p >= s && p < s + w),
              s"doc $i window $s has no fingerprint: $ps (${ws.mkString(" ")})")
          }
        } else assert(!sel.contains(i.toLong), s"short doc $i fingerprinted")
      }
    }
  }

  test("chunker partition property: concatenating stride prefixes rebuilds the doc") {
    val chunk = 6; val overlap = 2; val stride = chunk - overlap
    forAll(Gen.listOfN(6, docGen)) { docs =>
      val nonEmpty = docs.filter(_.nonEmpty)
      val df = nonEmpty.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = graft.ext.TextAnalysis.chunkWithOverlap(df, chunk, overlap)
        .select("doc_id", "chunk_idx", "chunk_text")
        .as[(Long, Int, String)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toList).toMap
      nonEmpty.zipWithIndex.foreach { case (ws, i) =>
        val chunks = got(i.toLong).map(_.split(" ").toList)
        // every chunk except the last is full-size or doc-bounded;
        // dropping each chunk's overlap-with-next prefix rebuilds the doc
        val rebuilt = chunks.init.map(_.take(stride)).flatten ++ chunks.last
        assert(rebuilt == ws, s"doc $i not rebuilt: $chunks vs $ws")
        assert(chunks.forall(_.nonEmpty), "no empty chunk")
      }
    }
  }

  test("PPJoin+ positional filter loses no true pair on arbitrary corpora") {
    // tiny vocabulary forces heavy shingle overlap, stressing both the
    // prefix-filter completeness lemma and the positional-filter bound
    val wordGen = Gen.oneOf("red", "blue", "green", "fox", "dog", "cat")
    val docGen = Gen.choose(5, 12)
      .flatMap(n => Gen.listOfN(n, wordGen).map(_.mkString(" ")))
    forAll(Gen.listOfN(12, docGen)) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val sets = texts.zipWithIndex.map { case (txt, i) =>
        val w = txt.split("\\s+").filter(_.nonEmpty).map(_.toLowerCase)
        (i.toLong, w.sliding(3).filter(_.length == 3)
          .map(_.mkString(" ")).toSet)
      }.filter(_._2.nonEmpty)
      for (t <- Seq(0.4, 0.6)) {
        val got = graft.ext.Dedup.prefixJaccardJoin(docs, threshold = t)
          .select("a_id", "b_id").as[(Long, Long)].collect().toSet
        val want = (for {
          (a, sa) <- sets
          (b, sb) <- sets
          if a < b
          inter = (sa & sb).size
          if inter.toDouble / (sa.size + sb.size - inter) >= t
        } yield (a, b)).toSet
        assert(got == want, s"t=$t: got $got want $want for $texts")
      }
    }
  }

  test("epoch shuffle is a bijection onto dense per-shard positions for any id set") {
    forAll(Gen.listOfN(60, Gen.choose(0L, 100000L))) { ids0 =>
      val ids = ids0.distinct
      val df = ids.map(Tuple1(_)).toDF("doc_id")
      val out = graft.ext.Curation.epochShuffle(df, epoch = 2, numShards = 3)
        .as[(Long, Int, Int)].collect()
      assert(out.length == ids.length, "every id appears exactly once")
      out.groupBy(_._2).foreach { case (s, rows) =>
        assert(rows.map(_._3).sorted.toSeq == (1 to rows.length),
          s"shard $s positions not dense")
      }
    }
  }

  val keyGen: Gen[String] = Gen.oneOf(
    Gen.choose(0, 12).map(i => s"hot$i"), // skewed repeats
    Gen.alphaNumStr.map(s => "k" + s.take(8)))

  test("count-min is one-sided for ANY key multiset, even at width 2") {
    forAll(Gen.listOfN(60, keyGen)) { keys =>
      val occ = keys.map(Tuple1(_)).toDF("key")
      val exact = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val sketch = graft.ext.Sketches.cmsBuild(occ, width = 2)
      val est = graft.ext.Sketches
        .cmsEstimate(sketch, occ.distinct(), width = 2)
        .as[(String, Long)].collect().toMap
      exact.foreach { case (k, c) =>
        assert(est(k) >= c, s"UNDERestimate for $k: ${est(k)} < $c") }
    }
  }

  test("bloom never false-negatives for ANY member set at ANY width") {
    forAll(Gen.listOfN(40, keyGen)) { keys =>
      val members = keys.map(Tuple1(_)).toDF("key")
      val bloom = graft.ext.Sketches.bloomBuild(members, m = 16, depth = 2)
      val got = graft.ext.Sketches.bloomProbe(bloom, members, m = 16, depth = 2)
        .as[(String, Boolean)].collect()
      got.foreach { case (k, p) => assert(p, s"false negative for $k") }
    }
  }

  test("KMV sketch equals the sort-take formulation for ANY key multiset") {
    forAll(Gen.listOfN(60, Gen.zip(Gen.oneOf("g1", "g2"), keyGen))) { rows =>
      val df = rows.toDF("grp", "key")
      val k = 8
      val got = graft.ext.Sketches.kmvSketchBy(df, "grp", "key", k)
        .as[(String, Seq[Long])].collect().toMap
      // reference: hash, distinct, sort ascending, take k — per group
      val want = rows.toDF("grp", "key")
        .select($"grp", graft.ext.Sketches.kmvHash($"key").as("h"))
        .as[(String, Long)].collect().toSeq
        .groupBy(_._1).view
        .mapValues(_.map(_._2).distinct.sorted.take(k)).toMap
      assert(got.view.mapValues(_.toSeq).toMap == want,
        s"heap sketch != sort-take reference")
    }
  }

  test("kCore result is sound: every member keeps >= k neighbors in-core") {
    val edgeGen = Gen.listOfN(30,
      Gen.zip(Gen.choose(1L, 12L), Gen.choose(1L, 12L)))
    forAll(edgeGen) { es =>
      val edges = es.toDF("src", "dst")
      val core = graft.operators.Graph.kCore(edges, k = 2)
        .as[(Long, Long)].collect().toMap
      // soundness: reported degree is the within-core degree and >= k
      val undirected = es.filter(e => e._1 != e._2)
        .flatMap(e => Seq(e, e.swap)).distinct
      core.foreach { case (n, d) =>
        val inCore = undirected.count(e => e._1 == n && core.contains(e._2))
        assert(d == inCore && d >= 2, s"node $n: reported $d, actual $inCore")
      }
    }
  }

  test("TopKByScore ≡ row_number window for arbitrary scored pairs") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // scores drawn from a SMALL set so cross-id ties are common — the
    // (score desc, id asc) tie-break is the contract under test
    val pairGen: Gen[(Long, Long, Double)] = for {
      q <- Gen.choose(0L, 3L); id <- Gen.choose(0L, 40L)
      s <- Gen.oneOf(0.1, 0.25, 0.5, 0.5, 0.75, 1.0)
    } yield (q, id, s)
    forAll(Gen.listOfN(120, pairGen)) { rows =>
      val scored = rows.distinctBy(r => (r._1, r._2))
        .toDF("query_id", "nn_id", "cos_sim")
      val k = 5
      val viaWindow = scored.withColumn("rn", row_number().over(
          Window.partitionBy($"query_id").orderBy($"cos_sim".desc, $"nn_id")))
        .filter($"rn" <= k)
        .select("query_id", "nn_id", "cos_sim", "rn")
        .as[(Long, Long, Double, Int)].collect().toSet
      val viaHeap = graft.ext.Similarity.topKExplode(scored, Seq("query_id"), k)
        .as[(Long, Long, Double, Int)].collect().toSet
      assert(viaHeap == viaWindow,
        s"heap/window divergence:\n heap=$viaHeap\n wind=$viaWindow")
    }
  }

  test("Aho–Corasick ≡ per-pattern contains for arbitrary unicode text") {
    // multi-byte chars stress the byte-level DFA: é (2 bytes), 中 (3),
    // 𝄞 (4, surrogate pair) mixed with ASCII and pattern fragments
    // no lone surrogates: '𝄞' is appended as a whole string, never
    // split by charAt (an unpaired surrogate UTF-8-encodes lossily and
    // would diverge from the JVM contains() reference)
    val pieceGen = Gen.oneOf("a", "b", " ", "é", "中", "x", "𝄞", "ab", "aé")
    val textGen = Gen.listOfN(20, pieceGen).map(_.mkString)
    val pats = Seq("ab", "ba", "aé", "é中", "𝄞", "aba", " a ")
    forAll(Gen.listOfN(25, textGen)) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = graft.ext.TextAnalysis.blocklistScreen(df, pats)
        .select("doc_id", "matched_csv").as[(Long, String)].collect().toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        val want = pats.filter(p => t.toLowerCase.contains(p)).mkString(",")
        assert(got(i.toLong) == want,
          s"doc '$t': got ${got(i.toLong)} want $want")
      }
    }
  }

  test("AUC u2 equals brute-force 2·wins+ties for ANY score/label sample") {
    val rowGen = Gen.zip(Gen.choose(0L, 8L), Gen.oneOf(0L, 1L))
    forAll(Gen.listOfN(20, rowGen)) { rows =>
      if (rows.nonEmpty) {
        val df = rows.map { case (s, y) => ("g", s, y) }
          .toDF("group", "score_micro", "y")
        val (u2, auc) = graft.ext.Evaluation.aucRoc(df)
          .select("u2", "auc").as[(Long, Double)].head()
        val pos = rows.filter(_._2 == 1L).map(_._1)
        val neg = rows.filter(_._2 == 0L).map(_._1)
        val w = for (p <- pos; n <- neg) yield p.compare(n)
        val brute = 2L * w.count(_ > 0) + w.count(_ == 0)
        assert(u2 == brute, s"u2 $u2 vs brute $brute for $rows")
        // strictly monotone rescale preserves AUC exactly
        val df2 = rows.map { case (s, y) => ("g", s * 3 + 1, y) }
          .toDF("group", "score_micro", "y")
        val auc2 = graft.ext.Evaluation.aucRoc(df2)
          .select("auc").as[Double].head()
        assert(auc2 == auc, s"monotone transform changed AUC: $auc2 != $auc")
      }
    }
  }

  test("KS d_num is symmetric and matches the brute-force ECDF max") {
    val vGen = Gen.choose(0L, 6L)
    forAll(Gen.listOfN(24, vGen)) { vs =>
      val (va, vb) = vs.splitAt(12)
      if (va.nonEmpty && vb.nonEmpty) {
        val a = va.map(("g", _)).toDF("group", "v")
        val b = vb.map(("g", _)).toDF("group", "v")
        val d1 = graft.ext.Evaluation.ksTest(a, b)
          .select("d_num").as[Long].head()
        val d2 = graft.ext.Evaluation.ksTest(b, a)
          .select("d_num").as[Long].head()
        assert(d1 == d2, s"KS must be symmetric: $d1 vs $d2")
        val na = va.size.toLong; val nb = vb.size.toLong
        val brute = (0L to 6L).map(x =>
          math.abs(va.count(_ <= x) * nb - vb.count(_ <= x) * na)).max
        assert(d1 == brute, s"d_num $d1 vs brute $brute for $va | $vb")
      }
    }
  }

  test("PSI of a sample against itself is 0; every term is non-negative") {
    val pGen = Gen.choose(0L, 1000000L)
    forAll(Gen.listOfN(15, pGen)) { ps =>
      if (ps.nonEmpty) {
        val df = ps.map(("g", _)).toDF("group", "p_micro")
        val self = graft.ext.Evaluation.psi(df, df)
          .select("psi_micro").distinct().as[Long].collect()
        assert(self.toSeq == Seq(0L), s"self-PSI must be 0: ${self.toSeq}")
        val (h, t) = ps.splitAt(ps.size / 2)
        if (h.nonEmpty && t.nonEmpty) {
          val terms = graft.ext.Evaluation.psi(
              h.map(("g", _)).toDF("group", "p_micro"),
              t.map(("g", _)).toDF("group", "p_micro"))
            .select("term_micro").as[Long].collect()
          assert(terms.forall(_ >= 0L), s"negative PSI term: ${terms.toSeq}")
        }
      }
    }
  }

  test("adamicAdar matches brute-force wedge scoring on ANY small graph") {
    val edgeGen = Gen.zip(Gen.choose(0L, 7L), Gen.choose(0L, 7L))
    forAll(Gen.listOfN(10, edgeGen)) { es0 =>
      val es = es0.filter(e => e._1 != e._2)
      if (es.nonEmpty) {
        val got = graft.operators.Graph.adamicAdar(es.toDF("src", "dst"))
          .as[(Long, Long, Long, Long)].collect()
          .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
        // brute force: symmetric adjacency, all non-adjacent pairs
        val adj = (es ++ es.map(_.swap)).distinct
          .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
        val nodes = adj.keySet
        val want = (for {
          u <- nodes.toSeq; v <- nodes.toSeq
          if u < v && !adj(u).contains(v)
          cn = adj(u) & adj(v)
          if cn.nonEmpty
        } yield (u, v) -> (cn.size.toLong,
          cn.toSeq.map(w => math.round(1e6 / math.log(adj(w).size))).sum))
          .toMap
        assert(got == want, s"AA mismatch for $es: got $got want $want")
        graft.ext.Checkpoints.releaseAll(spark)
      }
    }
  }

  test("benford digit extraction via string equals the arithmetic first digit") {
    forAll(Gen.listOfN(25, Gen.choose(1L, 4000000000L))) { vs =>
      val got = graft.ext.Profiler.benford(
          vs.map(("g", _)).toDF("group", "cents"), "cents")
        .select("digit", "n_digit").as[(Int, Long)].collect()
        .filter(_._2 > 0L).map(r => r._1 -> r._2).toMap
      val want = vs.groupBy { v =>
        var n = v; while (n >= 10) n /= 10; n.toInt
      }.view.mapValues(_.size.toLong).toMap
      assert(got == want, s"digit census mismatch: $got vs $want for $vs")
    }
  }

  test("containment always detects a token-prefix slice at 1.0 for ANY doc") {
    val wordGen = Gen.oneOf("ax", "bx", "cx", "dx", "ex", "fx", "gx", "hx")
    forAll(Gen.listOfN(14, wordGen)) { words =>
      // slice ≥ 5 tokens so the derived doc has ≥ 3 shingles
      val hostText = words.mkString(" ")
      val sliceText = words.take(7).mkString(" ")
      val d = Seq((1L, hostText), (2L, sliceText)).toDF("doc_id", "text")
      val got = graft.ext.Dedup.containmentJoin(d, threshold = 0.99)
        .as[(Long, Long, Double)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      assert(got.get((2L, 1L)).contains(1.0),
        s"prefix slice must be contained: $got for '$hostText'")
      graft.ext.Checkpoints.releaseAll(spark)
    }
  }

  test("rank correlation is invariant under strictly monotone transforms") {
    // ρ and τ-b depend only on orderings: x → 3x + 7 and y → y³ (both
    // strictly increasing on the sampled domain) must not change them
    val gen = Gen.listOfN(12, Gen.zip(Gen.chooseNum(-50L, 50L), Gen.chooseNum(-50L, 50L)))
    forAll(gen) { pts =>
      val rows = pts.zipWithIndex.map { case ((x, y), i) =>
        ("g", i.toLong, x, y) }
      val base = graft.ext.Evaluation.rankCorrelation(
        rows.toDF("grp", "id", "x", "y"), "grp", "id", "x", "y")
        .select("spearman_rho", "kendall_tau_b")
        .as[(Double, Double)].collect().toSeq
      val warped = graft.ext.Evaluation.rankCorrelation(
        rows.map { case (g, i, x, y) => (g, i, 3 * x + 7, y * y * y) }
          .toDF("grp", "id", "x", "y"), "grp", "id", "x", "y")
        .select("spearman_rho", "kendall_tau_b")
        .as[(Double, Double)].collect().toSeq
      assert(base == warped, s"monotone transform changed (ρ, τ): $base vs $warped")
    }
  }

  test("mannWhitney is a RANK test: z invariant under strictly increasing value maps") {
    import graft.ext.Evaluation
    val rowGen = for {
      arm <- Gen.oneOf(0, 1)
      v <- Gen.chooseNum(-50L, 50L)
    } yield (arm, v)
    forAll(Gen.listOfN(60, rowGen)) { rows =>
      val df = rows.toDF("arm", "v_micro").withColumn("group", lit("g"))
      // strictly increasing map: v -> 7v + 3 (ties preserved exactly)
      val warped = rows.map { case (a, v) => (a, 7L * v + 3L) }
        .toDF("arm", "v_micro").withColumn("group", lit("g"))
      val z0 = Evaluation.mannWhitney(df).collect().head.getAs[Double]("z")
      val z1 = Evaluation.mannWhitney(warped).collect().head.getAs[Double]("z")
      assert(z0 == z1, s"rank test moved under a monotone map: $z0 vs $z1")
    }
  }

  test("jsDivergence: symmetric in its sides and bounded by ln 2") {
    import graft.ext.Evaluation
    val rowGen = for {
      side <- Gen.oneOf(0L, 1L)
      tok <- Gen.oneOf("a", "b", "c", "d", "e")
    } yield (side, tok)
    forAll(Gen.listOfN(50, rowGen)) { rows =>
      val df = rows.toDF("side", "tok").withColumn("group", lit("g"))
      val swapped = rows.map { case (s, t) => (1L - s, t) }
        .toDF("side", "tok").withColumn("group", lit("g"))
      val a = Evaluation.jsDivergence(df).collect().head
      val b = Evaluation.jsDivergence(swapped).collect().head
      assert(a.getAs[Double]("js_nats") == b.getAs[Double]("js_nats"),
        "JS must be symmetric in its sides")
      val js = a.getAs[Double]("js_nats")
      assert(js >= 0.0 && js <= 0.693148, s"JS out of [0, ln 2]: $js")
    }
  }

  test("BH adjustment: p_adj >= raw p, monotone in rank, never above 1") {
    import graft.ext.Evaluation
    forAll(Gen.listOfN(12, Gen.chooseNum(0L, 1000000L))) { ps =>
      val tests = ps.zipWithIndex.map { case (p, i) => (s"t$i", p) }
        .toDF("test", "p_micro").withColumn("group", lit("f"))
      val rows = Evaluation.bhAdjust(tests).collect()
        .map(r => (r.getAs[Long]("rnk"), r.getAs[Long]("p_micro"),
          r.getAs[Double]("p_adj"))).sortBy(_._1)
      for ((rnk, p, adj) <- rows) {
        assert(adj <= 1.0 && adj >= 0.0, s"p_adj out of range at rank $rnk")
        assert(adj + 5e-7 >= p / 1e6,
          s"adjusted p below raw p at rank $rnk: $adj < ${p / 1e6}")
      }
      for (pair <- rows.toSeq.sliding(2) if rows.length > 1; a = pair.head;
           b = pair.last)
        assert(a._3 <= b._3 + 1e-12,
          s"p_adj not monotone in rank: ${a._3} > ${b._3}")
    }
  }

  test("kaplanMeier: survival is non-increasing in t and inside [0, 1]") {
    import graft.ext.Evaluation
    val subjGen = for {
      t <- Gen.chooseNum(1L, 10L)
      ev <- Gen.oneOf(0, 1)
    } yield (t, ev)
    forAll(Gen.listOfN(40, subjGen)) { subs =>
      val df = subs.toDF("t", "event").withColumn("group", lit("g"))
      val surv = Evaluation.kaplanMeier(df).collect()
        .map(r => (r.getAs[Long]("t"), r.getAs[Double]("surv")))
        .sortBy(_._1)
      surv.foreach { case (_, s) => assert(s >= 0.0 && s <= 1.0) }
      for (pair <- surv.toSeq.sliding(2) if surv.length > 1; a = pair.head;
           b = pair.last)
        assert(b._2 <= a._2 + 1e-9,
          s"survival increased from t=${a._1} to t=${b._1}: ${surv.toSeq}")
    }
  }

  test("token-budget waterfill invariants on arbitrary source mixes") {
    // for ANY source sizes / budget / temperature:
    //   Σ alloc ≤ min(budget, Σ T)   (never overspends)
    //   alloc_s ≤ T_s                (never over-grants a source)
    //   saturated ⇒ alloc = T        (grant-in-full semantics)
    val srcGen = for {
      n <- Gen.chooseNum(1, 30)
    } yield n
    forAll(Gen.listOfN(5, srcGen)) { sizes =>
      val docs = sizes.zipWithIndex.flatMap { case (n, s) =>
        // one doc of n tokens per source keeps T_s = n exactly
        Seq((s.toLong, s"s$s", Seq.fill(n)("w").mkString(" ")))
      }.toDF("doc_id", "source", "text")
      for (b <- Seq(0L, 7L, 40L, 1000L); a <- Seq(0.0, 0.5, 1.0)) {
        val rows = graft.ext.Curation
          .tokenBudgetAllocate(docs, b, alpha = a)
          .select("tokens_available", "tokens_alloc", "saturated")
          .as[(Long, Long, Boolean)].collect()
        val total = rows.map(_._1).sum
        val spent = rows.map(_._2).sum
        assert(spent <= math.min(b, total),
          s"overspend: $spent > min($b, $total) at alpha=$a")
        rows.foreach { case (t, al, sat) =>
          assert(al <= t, s"over-grant: $al > $t")
          assert(!sat || al == t, s"saturated but alloc $al != $t")
        }
      }
    }
  }

  test("turnRepetition bounds on arbitrary token streams") {
    val tokGen = Gen.oneOf("a", "b", "c", "aa", "xyz")
    forAll(Gen.listOfN(24, tokGen)) { toks =>
      val df = Seq((1L, toks.mkString(" "))).toDF("doc_id", "text")
      for (tt <- Seq(1, 2, 4)) {
        val r = graft.ext.Dedup.turnRepetition(df, turnTokens = tt)
          .collect().head
        val n = r.getAs[Int]("n_turns")
        val nd = r.getAs[Int]("n_distinct_turns")
        val run = r.getAs[Int]("max_run")
        val frac = r.getAs[Double]("repeat_frac")
        assert(n == (toks.size + tt - 1) / tt, s"turn count tt=$tt")
        assert(nd >= 1 && nd <= n, s"distinct bound: $nd of $n")
        assert(run >= 1 && run <= n, s"run bound: $run of $n")
        assert(frac >= 0.0 && frac < 1.0, s"frac range: $frac")
      }
    }
  }

  test("conversationStructure invariants on arbitrary role/content transcripts") {
    // build transcripts FROM a known turn structure, then assert the
    // parser recovers its invariants: turn count = marker count,
    // role tallies partition it, violations = adjacent same-role
    // pairs in the non-system sequence, trailing '.' clears
    // truncated_last, and appending a system turn never changes the
    // violation count
    val turnGen = for {
      role <- Gen.oneOf("system", "user", "assistant")
      words <- Gen.chooseNum(0, 3)
    } yield (role, Seq.fill(words)("w").mkString(" "))
    forAll(Gen.listOfN(6, turnGen)) { turns0 =>
      val turns = turns0
      def text(ts: List[(String, String)]): String =
        ts.map { case (r, c) => s"$r: $c" }.mkString("\n")
      def structOf(ts: List[(String, String)]) =
        graft.ext.Dedup.conversationStructure(
          Seq((1L, text(ts))).toDF("doc_id", "text")).collect().head
      val r = structOf(turns)
      assert(r.getAs[Int]("n_turns") == turns.size)
      assert(r.getAs[Int]("n_user") + r.getAs[Int]("n_assistant") +
        r.getAs[Int]("n_system") == turns.size, "roles partition turns")
      val nonsys = turns.map(_._1).filter(_ != "system")
      val expViol = nonsys.sliding(2).count {
        case Seq(a, b) => a == b; case _ => false }
      assert(r.getAs[Int]("alternation_violations") == expViol,
        s"violations of ${turns.map(_._1)}")
      assert(r.getAs[Int]("n_empty_turns") ==
        turns.count(_._2.trim.isEmpty), "empty turns")
      if (turns.nonEmpty) {
        // terminal punctuation on the last turn clears the flag
        val dotted = turns.init :+ (turns.last._1, turns.last._2 + " done.")
        assert(!structOf(dotted).getAs[Boolean]("truncated_last"))
        assert(structOf(turns :+ (("system", "note"))) // system never
          .getAs[Int]("alternation_violations") == expViol) // violates
      }
    }
  }

  test("structuredOutputLint invariants on transcripts built from known blocks") {
    // build assistant turns FROM a known block structure, then assert
    // the linter recovers it: closed-block count, json tally and
    // validity, fence parity, and that the SAME blocks inside a user
    // turn contribute nothing
    sealed trait Blk
    case object ValidJson extends Blk
    case object BadJson extends Blk
    case object Py extends Blk
    case object InlineOk extends Blk
    case object InlineBad extends Blk
    case object Prose extends Blk
    val blkGen: Gen[Blk] = Gen.oneOf(ValidJson, BadJson, Py,
      InlineOk, InlineBad, Prose)
    def render(b: Blk): Seq[String] = b match {
      case ValidJson => Seq("```json", "{\"a\": 1}", "```")
      case BadJson => Seq("```json", "{nope", "```")
      case Py => Seq("```python", "print(1)", "```")
      case InlineOk => Seq("{\"ok\": true}")
      case InlineBad => Seq("{broken}")
      case Prose => Seq("plain words here")
    }
    forAll(Gen.listOfN(5, blkGen)) { blocks =>
      for (trailOpen <- Seq(true, false)) {
        val body = blocks.flatMap(b => "assistant: says" +: render(b))
        val lines = ("user: hi" +: body) ++
          (if (trailOpen) Seq("assistant: cut", "```json", "{\"p\":")
           else Seq.empty)
        val r = graft.ext.Dedup.structuredOutputLint(
          Seq((1L, lines.mkString("\n"))).toDF("doc_id", "text"))
          .collect().head
        val fenced = blocks.count(b =>
          b == ValidJson || b == BadJson || b == Py)
        assert(r.getAs[Int]("n_code_blocks") == fenced)
        assert(r.getAs[Int]("n_fences") ==
          2 * fenced + (if (trailOpen) 1 else 0))
        assert(r.getAs[Boolean]("unclosed_fence") == trailOpen)
        assert(r.getAs[Int]("n_json_blocks") ==
          blocks.count(b => b == ValidJson || b == BadJson))
        assert(r.getAs[Int]("n_json_invalid") == blocks.count(_ == BadJson))
        assert(r.getAs[Int]("n_inline_json") ==
          blocks.count(b => b == InlineOk || b == InlineBad))
        assert(r.getAs[Int]("n_inline_json_invalid") ==
          blocks.count(_ == InlineBad))
        // the same rendered blocks inside a USER turn are invisible
        val asUser = ("user: quote" +:
          blocks.flatMap(b => "user: says" +: render(b))).mkString("\n")
        val ru = graft.ext.Dedup.structuredOutputLint(
          Seq((1L, asUser)).toDF("doc_id", "text")).collect().head
        assert(ru.getAs[Int]("n_fences") == 0 &&
          ru.getAs[Int]("n_code_blocks") == 0 &&
          ru.getAs[Int]("n_inline_json") == 0 &&
          !ru.getAs[Boolean]("unclosed_fence"), "user turns must not lint")
      }
    }
  }

  test("assortativity r stays in [-1, 1] on arbitrary symmetrized graphs") {
    val edgeGen = for {
      u <- Gen.chooseNum(0L, 8L)
      v <- Gen.chooseNum(0L, 8L) if v != u
    } yield (u, v)
    forAll(Gen.listOfN(20, edgeGen)) { es =>
      val sym = es.flatMap { case (u, v) => Seq((u, v), (v, u)) }.distinct
      if (sym.nonEmpty) {
        val r = graft.operators.Graph.assortativity(sym.toDF("src", "dst"))
          .collect().head.getAs[Double]("r")
        assert(r >= -1.000001 && r <= 1.000001, s"r out of range: $r")
      }
    }
  }
}
