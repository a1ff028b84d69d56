package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext._

case class Doc(doc_id: Long, text: String)

/** Unit evidence for the extension operators whose queries have no SQL
  * oracle (LSH candidates, simhash, IVF, multimodal): planted
  * near-duplicates must be found, properties must hold.
  */
class ExtSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  val base = "the quick brown fox jumps over the lazy dog while the cat watches from the warm windowsill every single morning"
  val nearDup = base.replace("warm", "cold")
  val docs = Seq(
    Doc(1, base),
    Doc(2, nearDup),
    Doc(3, "completely different content about spark catalyst optimizer rules and physical execution planning strategies"),
    Doc(4, "yet another unrelated document discussing parquet column pruning predicate pushdown and vectorized readers today")
  ).toDF

  test("minhash LSH surfaces planted near-duplicate pair") {
    val sigs = Dedup.minhashSignatures(docs, numHashes = 8)
    val cands = Dedup.lshCandidates(sigs, numHashes = 8, rowsPerBand = 2)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(cands.contains((1L, 2L)), s"expected (1,2) in $cands")
    assert(!cands.contains((3L, 4L)), "unrelated docs should not collide in every band")
  }

  test("lsh bucketCap bounds a planted 10k-identical family; under-cap pairs keep full recall") {
    // 10k identical docs collapse every band to ONE bucket per band —
    // the hot-bucket scale-killer shape. Uncapped this would emit
    // ~5·10⁷ candidate rows; the cap must bound it to C(cap,2) pairs
    // among the cap LOWEST ids, while pairs in under-cap buckets (the
    // planted near-dup) survive untouched.
    val familyText = "standard legal disclaimer template page copyright " +
      "notice all rights reserved terms of service privacy policy cookie banner"
    val family = (1000L until 11000L).map(Doc(_, familyText))
    val all = (docs.as[Doc].collect().toSeq ++ family).toDF
    val cap = 50
    val sigs = Dedup.minhashSignatures(all, numHashes = 8)
    val cands = Dedup.lshCandidates(sigs, numHashes = 8, rowsPerBand = 2,
      bucketCap = cap)
    val rows = cands.select("a_id", "b_id").as[(Long, Long)].collect()
    // bounded: per band ≤ C(cap,2) pairs; distinct pairs across bands
    // collapse, so the family contributes ≤ C(cap,2) + under-cap extras
    assert(rows.length <= cap * (cap - 1) / 2 + 16,
      s"candidate output not bounded: ${rows.length} pairs")
    // the family's kept ids are exactly its cap lowest
    val famIds = rows.toSeq.flatMap(p => Seq(p._1, p._2)).filter(_ >= 1000L).distinct.sorted
    assert(famIds == (1000L until (1000L + cap)).toSeq,
      s"kept ids are not the $cap lowest: ${famIds.take(5)}..${famIds.takeRight(5)}")
    // under-cap recall: the planted near-dup pair (1,2) still surfaces
    assert(rows.toSet.contains((1L, 2L)), "under-cap pair lost by the cap")
  }

  test("jaccard pairs rank the planted near-dup highest") {
    val pairs = Dedup.jaccardPairs(docs, threshold = 0.0, idMod = 1)
      .orderBy(desc("jaccard")).as[(Long, Long, Double)].collect()
    assert(pairs.head._1 == 1L && pairs.head._2 == 2L)
    assert(pairs.head._3 > 0.7)
  }

  test("turnText: fixed-size turns hash to the md5-hex15 sequence; short tail turn kept") {
    import spark.implicits._
    def h(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15)
    val docs = Seq((1L, "A b  c D e")).toDF("doc_id", "text")
    val out = graft.ext.Dedup.turnText(docs, turnTokens = 2)
      .as[(Long, String)].collect().toSeq
    // lowercased tokens, 2-token turns, last turn short: "a b","c d","e"
    assert(out == Seq((1L, s"${h("a b")} ${h("c d")} ${h("e")}")), s"$out")
    // empty text -> empty turn text, not a crash
    val empty = graft.ext.Dedup.turnText(
      Seq((2L, "  ")).toDF("doc_id", "text"), turnTokens = 2)
      .as[(Long, String)].collect().toSeq
    assert(empty == Seq((2L, "")), s"$empty")
  }

  test("conversationNearDups: shared ordered turn runs score; reordered turns do not") {
    import spark.implicits._
    // turnTokens = 1 -> trigrams are ordered token triples.
    // A {123,234,345}, B shares {123,234} -> J = 2/4 = 0.5;
    // C is A's bag REORDERED -> zero shared ordered runs, no pair.
    val docs = Seq(
      (1L, "x1 x2 x3 x4 x5"),
      (2L, "x1 x2 x3 x4 z5"),
      (3L, "x3 x2 x1 x5 x4")).toDF("doc_id", "text")
    val pairs = graft.ext.Dedup.conversationNearDups(docs,
        threshold = 0.3, turnTokens = 1)
      .as[(Long, Long, Double)].collect().toSeq
    assert(pairs == Seq((1L, 2L, 0.5)), s"$pairs")
  }

  test("turnRepetition: hand-computed runs, distinct counts, repeat fraction") {
    import spark.implicits._
    // turnTokens = 1: turns are the tokens themselves (hashed).
    // "a a a b b c": n=6, distinct=3, longest run = 3 (aaa),
    // repeat_frac = 1 - 3/6 = 0.5. "x y x y": runs all 1, frac 0.5.
    val docs = Seq((1L, "a a a b b c"), (2L, "x y x y"), (3L, "solo"))
      .toDF("doc_id", "text")
    val out = graft.ext.Dedup.turnRepetition(docs, turnTokens = 1)
      .as[(Long, Int, Int, Int, Double)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, 6, 3, 3, 0.5),
      (2L, 4, 2, 1, 0.5),
      (3L, 1, 1, 1, 0.0)), s"$out")
    // an agent loop: one turn repeated wall-to-wall
    val loop = graft.ext.Dedup.turnRepetition(
      Seq((9L, "do it do it do it do it")).toDF("doc_id", "text"),
      turnTokens = 2).as[(Long, Int, Int, Int, Double)].collect().head
    assert(loop == ((9L, 4, 1, 4, 0.75)), s"$loop")
  }

  test("conversationStructure: hand-computed roles, continuations, preamble, truncation (round 17)") {
    import spark.implicits._
    val docs = Seq(
      // clean 3-turn chat, alternating, sentence-final
      (1L, "system: be helpful\nuser: hi there\nassistant: hello!"),
      // preamble lines, a continuation, a same-role repeat, no
      // terminal punctuation
      (2L, "export of a chat\nsecond preamble\nuser: first ask\n" +
        "continues the ask\nuser: asked again\nassistant: reply"),
      // empty turn (marker with no content), blank lines ignored
      (3L, "user: question?\n\nassistant:\nuser: still there."),
      // markerless text: zero turns, every line preamble
      (4L, "no roles here\njust text"),
      // empty text
      (5L, "")
    ).toDF("doc_id", "text")
    val out = graft.ext.Dedup.conversationStructure(docs)
      .as[(Long, Int, Int, Int, Int, Int, String, String, Int, Int,
        Boolean)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, 3, 1, 1, 1, 0, "system", "assistant", 0, 0, false),
      // doc 2: turns user/user/assistant; "continues the ask" folds
      // into turn 1; user,user adjacent = 1 violation; last content
      // "reply" has no terminal punctuation
      (2L, 3, 2, 1, 0, 2, "user", "assistant", 1, 0, true),
      // doc 3: assistant turn is empty; alternation is clean; last
      // turn ends with '.'
      (3L, 3, 2, 1, 0, 0, "user", "user", 0, 1, false),
      (4L, 0, 0, 0, 0, 2, "", "", 0, 0, false),
      (5L, 0, 0, 0, 0, 0, "", "", 0, 0, false)), s"$out")
  }

  test("structuredOutputLint: hand-computed fences, json validity, role scoping, truncation (round 18)") {
    import spark.implicits._
    val docs = Seq(
      // one valid json block + one invalid + inline valid
      (1L, "user: please\nassistant: here\n```json\n{\"a\": 1}\n```\n" +
        "assistant: and\n```json\n{bad\n```\n{\"ok\": true}"),
      // fence in USER turn ignored; assistant python block counts;
      // inline invalid counted
      (2L, "user: mine\n```json\n{ignored\n```\nassistant: code\n" +
        "```python\nprint(1)\n```\n{broken}"),
      // unclosed fence at EOF (truncated generation)
      (3L, "assistant: partial\n```json\n{\"cut\":"),
      // multi-line json body folds with newlines and validates
      (4L, "assistant: multi\n```json\n{\"a\": 1,\n \"b\": [2, 3]}\n```"),
      // markerless text: nothing counts
      (5L, "```json\n{loose}\n```\n{\"x\": 1}"),
      // empty text
      (6L, "")
    ).toDF("doc_id", "text")
    val out = graft.ext.Dedup.structuredOutputLint(docs)
      .as[(Long, Int, Int, Boolean, Int, Int, Int, Int)]
      .collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, 4, 2, false, 2, 1, 1, 0),
      (2L, 2, 1, false, 0, 0, 1, 1),
      (3L, 1, 0, true, 0, 0, 0, 0),
      (4L, 2, 1, false, 1, 0, 0, 0),
      (5L, 0, 0, false, 0, 0, 0, 0),
      (6L, 0, 0, false, 0, 0, 0, 0)), s"$out")
  }

  test("connected components: planted chain and separate pair cluster correctly") {
    // chain 1-2-3 plus pair (10,11): two components keyed by min id
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a_id", "b_id")
    val cc = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("connected components: driver fast path ≡ distributed HashMin loop") {
    // star + long chain + isolated pair, deliberately out of order
    val pairs = (Seq((7L, 3L), (3L, 9L), (9L, 1L)) ++
      (20L to 26L).map(i => (i + 1, i)) ++ Seq((100L, 90L)))
      .toDF("a_id", "b_id")
    val fast = Dedup.connectedComponents(pairs).as[(Long, Long)].collect().toMap
    val dist = Dedup.connectedComponents(pairs, collectThreshold = 0)
      .as[(Long, Long)].collect().toMap
    assert(fast == dist, s"fast $fast vs distributed $dist")
    assert(fast(7L) == 1L && fast(26L) == 20L && fast(100L) == 90L)
  }

  test("simhash: near-dups close in hamming, unrelated far") {
    val sh = Dedup.simhash64(docs).as[(Long, Long)].collect().toMap
    val near = java.lang.Long.bitCount(sh(1L) ^ sh(2L))
    val far  = java.lang.Long.bitCount(sh(1L) ^ sh(3L))
    assert(near < 16, s"near-dup hamming $near")
    assert(far > near, s"unrelated ($far) should exceed near-dup ($near)")
  }

  test("exact dedup groups identical normalized texts") {
    val d = Seq(Doc(1, "Hello  World"), Doc(2, "hello world"), Doc(3, "other")).toDF
    val g = Dedup.exactGroups(d).orderBy("keeper_id").collect()
    assert(g.length == 2)
    assert(g.head.getAs[Long]("keeper_id") == 1L && g.head.getAs[Long]("n_docs") == 2L)
  }

  test("IVF: full probe ≡ brute force; recall monotone in nprobe") {
    // The corpus is isotropic random vectors (no cluster structure —
    // verified: same-label and cross-label mean cosine are both ≈ 0),
    // so an absolute recall bound would be meaningless. The honest
    // properties: probing every partition IS brute force, and more
    // probes never hurt.
    val emb = graft.sources.Tables(spark, "/root/testdata/sf0.001").embeddings
    def pairs(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("query_id", "nn_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val brute = pairs(Similarity.bruteForceTopK(emb, k = 10, numQueries = 3))
    val full  = pairs(Similarity.ivfTopK(emb, k = 10, numQueries = 3,
      nprobe = 8, nClusters = 8, kmeansIters = 2))
    assert(full == brute, "nprobe == nClusters must reproduce brute force exactly")
    def recall(ivf: Map[Long, Set[Long]]): Double = {
      val rs = brute.keys.map { q =>
        val b = brute(q)
        b.intersect(ivf.getOrElse(q, Set.empty)).size.toDouble / b.size
      }
      rs.sum / rs.size
    }
    val r1 = recall(pairs(Similarity.ivfTopK(emb, k = 10, numQueries = 3,
      nprobe = 1, nClusters = 8, kmeansIters = 2)))
    val r4 = recall(pairs(Similarity.ivfTopK(emb, k = 10, numQueries = 3,
      nprobe = 4, nClusters = 8, kmeansIters = 2)))
    assert(r4 >= r1, s"recall must not decrease with more probes ($r1 -> $r4)")
  }

  test("IVF-flat: full probe ≡ brute force; every corpus row lands in one cluster") {
    val emb = graft.sources.Tables(spark, "/root/testdata/sf0.001").embeddings
    def pairs(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("query_id", "nn_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val brute = pairs(Similarity.bruteForceTopK(emb, k = 10, numQueries = 3))
    val full = pairs(Similarity.ivfFlatTopK(emb, k = 10, numQueries = 3,
      nprobe = 8, nClusters = 8))
    assert(full == brute, "nprobe == nClusters must reproduce brute force exactly")
    // partial probe returns exactly k rows per query (clusters are
    // non-empty by construction: every seed assigns to itself)
    val part = Similarity.ivfFlatTopK(emb, k = 10, numQueries = 3,
      nprobe = 2, nClusters = 8)
    val counts = part.groupBy("query_id").count()
      .select("count").as[Long].collect()
    assert(counts.forall(_ == 10L), s"expected 10 rows per query, got ${counts.toSeq}")
  }

  test("native DotProduct is bit-identical to the HOF fold") {
    import org.apache.spark.sql.functions._
    val emb = graft.sources.Tables(spark, "/root/testdata/sf0.001").embeddings
      .select(transform(col("embedding"), x => x.cast("double")).as("v"))
    val both = emb.crossJoin(emb.limit(3).select(col("v").as("w")))
      .select(Similarity.dot(col("v"), col("w")).as("native"),
        Similarity.foldDot(col("v"), col("w")).as("fold"))
    assert(both.filter(col("native") =!= col("fold")).count() == 0)
  }

  test("native Md5Hash60 is bit-identical to the composed hex construction") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables(spark, "/root/testdata/sf0.001").documents
    val both = docs.select(
      graft.expressions.Md5Hash60.hash60(col("text")).as("n1"),
      Dedup.composedHash60(col("text")).as("c1"),
      graft.expressions.Md5Hash60.hash60(col("text"), second = true).as("n2"),
      Dedup.composedHash60(col("text"), second = true).as("c2"))
    assert(both.filter(col("n1") =!= col("c1") || col("n2") =!= col("c2"))
      .count() == 0)
  }

  test("CDC chunking self-synchronizes after different-length prefixes") {
    import org.apache.spark.sql.functions._
    val shared = ("the common tail both documents carry word " * 8).trim
    val docs = Seq(
      (1L, "short prefix. " + shared),
      (2L, "a much longer and entirely different prefix sentence here. " + shared),
      (3L, "unrelated content with no overlap at all whatsoever in it"))
      .toDF("doc_id", "text")
    val chunks = Dedup.cdcChunks(docs, boundaryMod = 4)
    // chunks reassemble the document exactly (no gaps/overlaps) —
    // check via per-doc chunk count > 0 and a full-text round trip
    val n = chunks.groupBy("doc_id").count().select("count").as[Long].collect()
    assert(n.length == 3 && n.forall(_ > 0))
    // docs 1 and 2 share interior chunks despite shifted alignment;
    // doc 3 shares none with either
    val sharedHashes = chunks.filter(col("doc_id") === 1)
      .select("chunk_hash").intersect(
        chunks.filter(col("doc_id") === 2).select("chunk_hash"))
    assert(sharedHashes.count() >= 1,
      "CDC failed to re-synchronize on the shared suffix")
    val crossed = chunks.filter(col("doc_id") === 3).select("chunk_hash")
      .intersect(chunks.filter(col("doc_id") =!= 3).select("chunk_hash"))
    assert(crossed.count() == 0)
  }

  test("PQ: seed vectors self-quantize exactly; search returns k per query") {
    import org.apache.spark.sql.functions._
    val emb = graft.sources.Tables(spark, "/root/testdata/sf0.001").embeddings
    // the 16 seed vectors' subvectors ARE the codebook: their codes
    // must equal their own seed index in every subspace
    val codes = Similarity.pqEncode(emb, m = 8, ks = 16)
    val seedIds = emb.orderBy("vec_id").limit(16)
      .select("vec_id").as[Long].collect()
    val seedCodes = codes.filter(col("vec_id").isin(seedIds: _*))
      .orderBy("vec_id").collect()
    seedCodes.zipWithIndex.foreach { case (row, i) =>
      (0 until 8).foreach { j =>
        assert(row.getInt(1 + j) == i,
          s"seed $i subspace $j coded as ${row.getInt(1 + j)}")
      }
    }
    // all codes live in [0, ks)
    val outOfRange = (0 until 8).map(j =>
      codes.filter(col(s"c$j") < 0 || col(s"c$j") >= 16).count()).sum
    assert(outOfRange == 0)
    // ADC search: exactly k rows per query, ranked by ip_micro desc
    val top = Similarity.pqTopK(emb, k = 10, numQueries = 3, m = 8, ks = 16)
    val counts = top.groupBy("query_id").count().select("count").as[Long].collect()
    assert(counts.length == 3 && counts.forall(_ == 10L))
  }

  test("approx aggregates stay within error bounds of exact") {
    val rows = ExtQueries.qApproxAggs(spark, "/root/testdata/sf0.01")
      .select("l_returnflag", "ok_orders", "ok_parts", "ok_p50")
      .as[(String, Boolean, Boolean, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (k, o, p, q) =>
      assert(o && p && q, s"$k: estimate out of bound (orders=$o parts=$p p50=$q)")
    }
  }

  test("int8 quantization round-trips within quantization error") {
    import org.apache.spark.sql.functions._
    val emb = graft.sources.Tables(spark, "/root/testdata/sf0.001").embeddings
    val q = Similarity.quantizeInt8(emb)
    // max quantization step is scale/127; allow half-step + fp dust
    val worst = q.join(emb, "vec_id")
      .select((expr(
        "array_max(zip_with(transform(embedding, x -> cast(x as double)), q, (a, b) -> abs(a - b * scale / 127.0)))"
      ) / col("scale")).as("rel"))
      .agg(max(col("rel"))).head().getDouble(0)
    assert(worst <= 0.5 / 127 + 1e-9, s"worst relative quant error $worst")
  }

  test("multimodal: real PNG decode round-trip (javax.imageio)") {
    import Multimodal._
    // encoder output is a compliant PNG: the JDK decoder recovers the
    // exact dims and pixel we encoded
    val png = PngCodec.encode(37, 21, 200, 5, 0)
    assert(png.length == PngCodec.pngLength(37, 21))
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img != null, "ImageIO could not parse the generated PNG")
    assert(img.getWidth == 37 && img.getHeight == 21)
    val rgb = img.getRGB(36, 20) // far corner: every pixel carries the color
    assert(((rgb >> 16) & 0xff) == 200 && ((rgb >> 8) & 0xff) == 5 && (rgb & 0xff) == 0)
  }

  test("multimodal: dHash of a decoded pattern PNG equals the mosaic formula") {
    import Multimodal._
    val md = java.security.MessageDigest.getInstance("MD5")
    for (id <- Seq(0L, 1L, 2L, 7L)) {
      val grid = patternGrid(md, id)
      val png = PngCodec.encodeGray(72, 64, (bx, by) => grid(bx)(by))
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      // expectation straight from the mosaic (cells == uniform blocks)
      var want = 0L
      for (cy <- 0 until 8; cx <- 0 until 8)
        if (grid(cx)(cy) < grid(cx + 1)(cy)) want |= 1L << (cy * 8 + cx)
      assert(dHash64(img) == want, s"id $id: decode+pool != formula")
    }
  }

  test("multimodal: banded image near-dup finds family variants, not strangers") {
    import spark.implicits._
    // 4 families x 3 variants
    val docs = (0L until 12L).toDF("doc_id")
    val hashes = Multimodal.imageDHashes(Multimodal.patternImages(spark, docs))
    val got = Multimodal.nearDupImages(hashes)
      .as[(Long, Long, Int)].collect().map(r => (r._1, r._2) -> r._3).toMap
    // ground truth: brute-force over the collected hashes
    val hs = hashes.as[(Long, Long)].collect().toMap
    val want = (for {
      a <- hs.keys; b <- hs.keys if a < b
      d = java.lang.Long.bitCount(hs(a) ^ hs(b)) if d <= 3
    } yield (a, b) -> d).toMap
    assert(got == want, s"banding != brute force:\n got=$got\n want=$want")
    // sanity: variant 1 of family 0 sits within 2 bits of variant 0
    assert(java.lang.Long.bitCount(hs(0L) ^ hs(1L)) <= 2)
  }

  test("multimodal: real WAV parse round-trip (javax.sound.sampled)") {
    import Multimodal._
    val wav = WavCodec.encode(11000, 50, 700)
    assert(wav.length == WavCodec.wavLength(50))
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    assert(ais.getFormat.getSampleRate.toInt == 11000)
    assert(ais.getFormat.getSampleSizeInBits == 16)
    assert(ais.getFrameLength == 50L)
    val buf = new Array[Byte](2)
    assert(ais.read(buf) == 2)
    assert(((buf(1) << 8) | (buf(0) & 0xff)) == 700)
  }

  test("audioFrameFeatures: alternating signal counts crossings; partial frame and mixed RMS by hand") {
    import Multimodal._
    // hand-built WAV: 20 samples alternating +1000/−1000 (header
    // mirrors WavCodec byte-for-byte, samples vary)
    def wavOf(samples: Seq[Int], rate: Int = 8000): Array[Byte] = {
      val dataLen = samples.length * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      bb.put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      bb.putShort(1).putShort(1).putInt(rate).putInt(rate * 2)
      bb.putShort(2).putShort(16)
      bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
      samples.foreach(s => bb.putShort(s.toShort))
      bb.array()
    }
    val alt = (0 until 20).map(i => if (i % 2 == 0) 1000 else -1000)
    val mixed = Seq(3000, 4000)
    val media = Seq(
      MediaRow(1L, "audio", wavOf(alt)),
      MediaRow(2L, "audio", wavOf(mixed)),
      MediaRow(3L, "image", Array[Byte](1, 2))) // skipped
    val ds = spark.createDataset(media)(
      org.apache.spark.sql.Encoders.product[MediaRow])
    val out = Multimodal.audioFrameFeatures(ds, frameLen = 8)
      .collect().map(r => (r.media_id, r.frame_idx) -> r).toMap
    // frames of 8, 8, 4: rms exactly 1000·1000; zcr = n−1 within frame
    assert(out((1L, 0)).n_samples == 8 && out((1L, 0)).rms_milli == 1000000L
      && out((1L, 0)).zcr == 7, s"${out((1L, 0))}")
    assert(out((1L, 2)).n_samples == 4 && out((1L, 2)).zcr == 3,
      s"partial frame: ${out((1L, 2))}")
    // mixed: rms = sqrt((9e6+16e6)/2)·1000 = 3535534 milli (rounded)
    assert(out((2L, 0)) == AudioFrameRow(2L, 0, 2, 3535534L, 0),
      s"${out((2L, 0))}")
    assert(!out.keySet.exists(_._1 == 3L), "non-audio rows skip")
    // VAD gate over those frames: the alternating clip is all speech
    // at threshold 1e6 milli; a mixed-silence clip gates per frame
    val silent = MediaRow(4L, "audio", wavOf(Seq.fill(20)(0)))
    val ds2 = spark.createDataset(media :+ silent)(
      org.apache.spark.sql.Encoders.product[MediaRow])
    val gated = Multimodal.vadGate(
        Multimodal.audioFrameFeatures(ds2, frameLen = 8),
        rmsThresholdMilli = 1000000L)
      .select("media_id", "n_frames", "n_speech", "speech_ratio_micro",
        "is_silent")
      .as[(Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(gated(1L) == ((1L, 3L, 3L, 1000000L, false)), s"${gated(1L)}")
    assert(gated(4L) == ((4L, 3L, 0L, 0L, true)),
      s"silent clip must flag: ${gated(4L)}")
  }

  test("imageStats: decoded luma statistics match the mosaic grid by hand") {
    import Multimodal._
    val md = java.security.MessageDigest.getInstance("MD5")
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq(5L, 6L).toDF("doc_id")
    val stats = Multimodal.imageStats(patternImages(spark, docs))
      .as[(Long, Int, Int, Long, Int, Int)].collect()
      .map(r => r._1 -> r).toMap
    for (id <- Seq(5L, 6L)) {
      val g = patternGrid(md, id).flatten
      val want = (id, 72, 64,
        math.round(g.map(_.toLong).sum.toDouble * 1000 / 72), g.min, g.max)
      assert(stats(id) == want, s"image $id: ${stats(id)} vs $want")
    }
  }

  test("multimodal: real AVI container round-trip (RIFF chunk walk)") {
    import Multimodal._
    val avi = AviCodec.encode(37, 21, 4, 200, 5, 9)
    assert(avi.length == AviCodec.aviLength(37, 21, 4))
    val md = java.security.MessageDigest.getInstance("MD5")
    val f = MediaCodec.decodeVideo(md, MediaRow(7L, "video", avi))
    assert(f.width == 37 && f.height == 21 && f.n_frames == 4)
    assert(f.byte_len == avi.length)
    // checksum is content-addressed from the DECODED dims/frames/pixel
    assert(f.checksum ==
      MediaCodec.hash60(md, "avi|37|21|4|200|5|9".getBytes("UTF-8")))
    // a frame-count lie in the header is caught by the chunk count
    val bad = avi.clone()
    // dwTotalFrames sits at RIFF(12) + LIST hdr(12) + avih hdr(8) + 16
    bad(12 + 12 + 8 + 16) = 5
    assertThrows[IllegalArgumentException] {
      MediaCodec.decodeVideo(md, MediaRow(8L, "video", bad))
    }
  }

  test("multimodal: deterministic features + frame sampling") {
    val docsReal = graft.sources.Tables(spark, "/root/testdata/sf0.001").documents
    val media = Multimodal.mediaFromDocuments(spark, docsReal)
    val feats = Multimodal.extractFeatures(media).cache()
    // every payload is a real container of formula-derived parameters:
    // PNG / WAV / AVI — byte lengths follow each codec's closed formula
    val joined = feats.toDF().join(docsReal, col("media_id") === col("doc_id"))
    assert(joined.filter(col("kind") === "video")
      .filter(col("byte_len") =!= expr(
        "cast(224 + (1 + media_id % 6) * (8 + ((3 * (16 + media_id % 24) + 3) div 4) * 4 * (16 + (media_id div 3) % 24)) as int)"))
      .count() == 0)
    assert(joined.filter(col("kind") === "video")
      .filter(col("width") =!= (lit(16) + col("media_id") % 24).cast("int") ||
        col("n_frames") =!= (lit(1) + col("media_id") % 6).cast("int"))
      .count() == 0)
    assert(joined.filter(col("kind") === "image")
      .filter(col("width") =!= (lit(16) + col("media_id") % 48).cast("int") ||
        col("height") =!= (lit(16) + (col("media_id") / 3).cast("long") % 48).cast("int"))
      .count() == 0)
    // audio: decoded sample rate (kHz) and bit depth match the
    // generation formulas
    assert(joined.filter(col("kind") === "audio")
      .filter(col("width") =!= (lit(8) + col("media_id") % 8).cast("int") ||
        col("height") =!= 16).count() == 0)
    // decode is deterministic: re-running yields identical checksums
    val again = Multimodal.extractFeatures(media)
    assert(feats.toDF().except(again.toDF()).count() == 0)
    // resize: dims bounded by maxDim, ids/kind/frames preserved
    val resized = Multimodal.resizeAll(feats, maxDim = 32).cache()
    assert(resized.filter(f => f.width > 32 || f.height > 32).count() == 0)
    assert(resized.count() == feats.count())
    // frames: stride-2 sampling emits ceil(n_frames/2) rows per media
    val frames = Multimodal.sampleFrames(feats, stride = 2).toDF()
    val perMedia = frames.groupBy("media_id").count()
      .join(feats.toDF(), "media_id")
      .filter(col("count") =!= ceil(col("n_frames") / lit(2.0)).cast("long"))
    assert(perMedia.count() == 0)
  }

  test("gopher gate: planted degenerate docs are rejected, clean doc kept") {
    val planted = Seq(
      Doc(1, Seq.fill(3)("the quick brown fox jumps over a lazy dog and it runs far").mkString(" ")),
      Doc(2, "tiny doc"),                                  // word count
      Doc(3, Seq.fill(60)("!!! ???").mkString(" ")),       // symbols, no alpha
      Doc(4, Seq.fill(50)("internationalization").mkString(" ")) // mean word len, no stopwords
    ).toDF
    val g = Curation.gopherRules(planted, minTokens = 20)
      .select("doc_id", "keep").collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(g(1), "clean repeated-sentence doc should pass the gate")
    assert(!g(2) && !g(3) && !g(4), s"degenerate docs slipped through: $g")
  }

  test("mixture sample hits the target mixture and keeps the max source whole") {
    val docs = spark.range(3000).select(col("id").as("doc_id"),
      concat(lit("src"), (col("id") % 3).cast("string")).as("source"))
    // target 2:1:1 over three equal sources → src0 keeps all, others ~half
    val out = Curation.mixtureSample(docs,
      Map("src0" -> 2.0, "src1" -> 1.0, "src2" -> 1.0)).cache()
    val bySrc = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("src0") == 1000, "max-ratio source must be kept whole")
    assert(math.abs(bySrc("src1") - 500) < 100 && math.abs(bySrc("src2") - 500) < 100,
      s"off-target mixture: $bySrc")
    // deterministic: rerun is identical
    assert(Curation.mixtureSample(docs, Map("src0" -> 2.0, "src1" -> 1.0,
      "src2" -> 1.0)).except(out).count() == 0)
  }

  test("bm25: docs dense in a query term outrank docs without it") {
    val d = Seq(
      Doc(1, "spark spark spark runs spark jobs on spark clusters"),
      Doc(2, "spark appears once in this much longer document about various other completely unrelated topics"),
      Doc(3, "no relevant terms at all in here")).toDF
    val r = TextAnalysis.bm25TopK(d, Seq("spark", "data", "join"), k = 10)
      .select("doc_id").collect().map(_.getLong(0))
    assert(r.headOption.contains(1L), s"term-dense doc not ranked first: ${r.toSeq}")
    assert(!r.contains(3L), "zero-score doc must be filtered")
  }

  test("dedupKeepBest: highest-quality doc keeps, singletons keep themselves") {
    // doc 2 is longer + stopword-richer than doc 1 -> higher quality;
    // they are paired, so 2 must be the keeper even though 1 < 2
    val docs = Seq(
      Doc(1L, "alpha beta"),
      Doc(2L, "the alpha and the beta of it is that a long document wins quality"),
      Doc(3L, "standalone singleton document")).toDF
    val pairs = Seq((1L, 2L)).toDF("a_id", "b_id")
    val out = graft.ext.Dedup.dedupKeepBest(docs, pairs)
      .select("doc_id", "component", "is_keeper")
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(out(2L)._3 && !out(1L)._3, s"quality must pick the keeper: $out")
    assert(out(1L)._2 == 1L && out(2L)._2 == 1L, "paired docs share a component")
    assert(out(3L)._3 && out(3L)._2 == 3L, "singleton keeps itself")
    // NULLS LAST: a null-text doc (null quality score) must never win
    // its cluster over a scored doc (the window semantics the
    // struct-min agg preserves via the explicit null flag)
    val withNull = Seq(Doc(1L, null), Doc(2L, "a scored document")).toDF
    val nOut = graft.ext.Dedup.dedupKeepBest(withNull, Seq((1L, 2L)).toDF("a_id", "b_id"))
      .select("doc_id", "is_keeper").as[(Long, Boolean)].collect().toMap
    assert(nOut(2L) && !nOut(1L), s"null-quality doc must not be keeper: $nOut")
  }

  test("simhashNearDups: identical docs pair at hamming 0, disjoint text does not pair") {
    val docs = Seq(
      Doc(1, "alpha beta gamma delta epsilon zeta eta theta"),
      Doc(2, "alpha beta gamma delta epsilon zeta eta theta"),
      Doc(3, "one two three four five six seven eight nine ten eleven")).toDF
    val out = graft.ext.Dedup.simhashNearDups(docs)
      .as[(Long, Long, Int)].collect().toSeq
    assert(out.contains((1L, 2L, 0)), s"identical docs must pair at 0: $out")
    assert(!out.exists(p => p._1 == 3L || p._2 == 3L),
      s"disjoint-vocabulary doc must not pair: $out")
    assertThrows[IllegalArgumentException] {
      graft.ext.Dedup.simhashNearDups(docs, maxHamming = 4)
    }
  }

  test("crossNearDups: benchmark copies caught across corpora, disjoint text is not") {
    val left = Seq(
      Doc(1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      Doc(2, "one two three four five six seven eight nine ten")).toDF
    val right = Seq(
      (11L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (12L, "totally different words sharing nothing with anything else here")
    ).toDF("doc_id", "text")
    val out = graft.ext.Dedup.crossNearDups(left, right)
      .select("a_id", "b_id", "jaccard")
      .as[(Long, Long, Double)].collect().toSeq
    assert(out.exists(p => p._1 == 1L && p._2 == 11L && p._3 == 1.0),
      s"identical cross-corpus copy must be found with jaccard 1: $out")
    assert(!out.exists(_._2 == 12L), s"disjoint benchmark doc must not pair: $out")
    assert(!out.exists(_._1 == 2L), s"unrelated corpus doc must not pair: $out")
  }

  test("rrfFuse: hand-computed fusion — consensus items beat single-list items") {
    // lists A=[1,2,3], B=[3,2,4] at rrfK=60 (micro-rounded terms):
    //   item3 = 15873+16393 = 32266, item2 = 16129*2 = 32258,
    //   item1 = 16393, item4 = 15873 -> order 3, 2, 1, 4
    val a = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("item_id", "rank")
    val b = Seq((3L, 1), (2L, 2), (4L, 3)).toDF("item_id", "rank")
    val out = TextAnalysis.rrfFuse(Seq(a, b), topK = 10)
      .orderBy("rank")
      .select("item_id", "rrf_micro", "n_lists")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((3L, 32266L, 2L), (2L, 32258L, 2L),
      (1L, 16393L, 1L), (4L, 15873L, 1L)), s"got $out")
  }

  test("semantic dedup: identical vectors dedup to the lowest id, one keeper per chain") {
    val vecs = Seq(
      (0L, Seq.fill(4)(1.0f)), (1L, Seq(1.0f, 0.9f, 1.1f, 1.0f)),
      (10L, Seq.fill(4)(1.0f)),             // exact dup of 0
      (11L, Seq(-1.0f, 1.0f, -1.0f, 1.0f)), // its own direction
      (12L, Seq(1.0f, 0.9f, 1.1f, 1.0f))    // exact dup of 1
    ).toDF("vec_id", "embedding")
    val out = Similarity.semanticDedup(vecs, nClusters = 2, threshold = 0.99)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(out(0) && out(1) && out(11), s"originals must be kept: $out")
    assert(!out(10) && !out(12), s"exact dups must be dropped: $out")
  }

  test("duplicate spans: shared 10-token run reported as ONE maximal span each") {
    val shared = "one two three four five six seven eight nine ten"
    val d = Seq(
      Doc(1, s"aa bb cc $shared dd ee"),      // shared at tokens 3..12
      Doc(2, s"$shared xx yy zz"),            // shared at tokens 0..9
      Doc(3, "totally unrelated words that never repeat anywhere else at all")).toDF
    val out = Dedup.duplicateSpans(d, span = 8).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(out.toSet == Set(1L -> ((3, 12, 10)), 2L -> ((0, 9, 10))),
      s"expected one exact maximal span per doc: ${out.toSeq}")
  }

  test("passage dedup: later copies of a passage drop, order is preserved") {
    val boiler = "one two three four five six seven eight nine ten"
    val d = Seq(
      Doc(1, s"$boiler alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      Doc(2, s"$boiler lambda mu nu xi omicron pi rho sigma tau upsilon"),
      Doc(3, "unique words only in this document nothing repeats here at all")).toDF
    val out = Dedup.passageDedup(d, span = 10).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1) == ((2L, 2L,
      s"$boiler alpha beta gamma delta epsilon zeta eta theta iota kappa")),
      s"first occurrence keeps everything: ${out(1)}")
    assert(out(2) == ((2L, 1L,
      "lambda mu nu xi omicron pi rho sigma tau upsilon")),
      s"doc 2 must lose the boilerplate passage but keep its own: ${out(2)}")
    assert(out(3)._1 == 2L && out(3)._2 == 2L, s"unique doc unchanged: ${out(3)}")
  }

  test("line dedup: boilerplate lines vanish everywhere, order preserved, both join paths agree") {
    val d = Seq(
      Doc(1, "cookie banner\nreal content of doc one\ncookie banner"),
      Doc(2, "cookie banner\nsomething else entirely"),
      Doc(3, "  cookie banner \nthird doc body"),
      Doc(4, "cookie banner")).toDF
    val out = Dedup.lineDedup(d, minDocs = 3).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3)))).toMap
    // trim-normalized "cookie banner" appears in 4 distinct docs (doc 1
    // twice counts once) -> struck from all, including the padded form
    assert(out(1) == (("real content of doc one", 3, 2)), s"${out(1)}")
    assert(out(2) == (("something else entirely", 2, 1)), s"${out(2)}")
    assert(out(3) == (("third doc body", 2, 1)), s"${out(3)}")
    assert(out(4) == (("", 1, 1)), "fully-boilerplate doc keeps a row with empty text")
    // below threshold nothing is removed
    val keep = Dedup.lineDedup(d, minDocs = 5).collect()
      .map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(keep.values.forall(_ == 0), s"minDocs above fan-in removes nothing: $keep")
    // shuffle-join fallback (broadcast gate forced off) is identical
    val bc = Dedup.lineDedup(d, minDocs = 3).collect().toSet
    val sh = Dedup.lineDedup(d, minDocs = 3, broadcastMaxFps = 0L).collect().toSet
    assert(bc == sh, "size-gated broadcast and shuffle paths must agree")
  }

  test("c4 clean: each line rule fires independently, doc gate needs 3 survivors") {
    val d = Seq(
      Doc(1, "a good long sentence here.\nno terminal punctuation line\n" +
        "too short.\nlorem ipsum dolor sit amet.\nvar x = { a: 1 }.\n" +
        "another quality sentence survives!\nand a third one does too?"),
      Doc(2, "only one good sentence here.\nsecond good sentence right here.")).toDF
    val out = Curation.c4Clean(d).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getInt(2), r.getInt(3), r.getBoolean(4)))).toMap
    assert(out(1) == (("a good long sentence here.\n" +
      "another quality sentence survives!\nand a third one does too?",
      7, 3, true)), s"${out(1)}")
    assert(out(2) == (("only one good sentence here.\nsecond good sentence right here.",
      2, 2, false)), "two survivors fail the 3-line doc gate")
    // quote-closed terminal punctuation is accepted
    val q = Curation.c4Clean(
      Seq(Doc(3, "he said \"this is a quote.\"")).toDF, minKeptLines = 1).collect()
    assert(q.head.getBoolean(4), "punct+closing-quote line must survive")
  }

  test("quality classify: mean hashed-bigram weight, empty docs score 0, paths agree") {
    val docs = Seq(Doc(1, "alpha beta gamma"), Doc(2, "single"),
      Doc(3, "alpha beta")).toDF
    // weight every bucket 5 micro: any doc with >=1 bigram scores 5
    val flat = spark.range(1 << 16).select(col("id").as("bucket"),
      lit(5L).as("w_micro"))
    val out = Curation.qualityClassify(docs, flat).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(out(1) == ((2, 5L, true)), s"${out(1)}")
    assert(out(2) == ((0, 0L, true)), "no bigrams -> score 0")
    assert(out(3) == ((1, 5L, true)), s"${out(3)}")
    // negative uniform weights fail a positive threshold
    val neg = spark.range(1 << 16).select(col("id").as("bucket"),
      lit(-7L).as("w_micro"))
    val o2 = Curation.qualityClassify(docs, neg, thresholdMicro = 1L).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(o2 == Map(1L -> false, 2L -> false, 3L -> false))
    // broadcast and shuffle join paths agree
    val a = Curation.qualityClassify(docs, flat).collect().toSet
    val b = Curation.qualityClassify(docs, flat, broadcastMaxWeights = 0L)
      .collect().toSet
    assert(a == b, "size-gated broadcast and shuffle paths must agree")
  }

  test("char entropy: closed-form values on degenerate and uniform strings") {
    val d = Seq(Doc(1, "aaaa"), Doc(2, "abab"), Doc(3, "abcd"),
      Doc(4, "")).toDF
    val out = TextAnalysis.charEntropy(d).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getLong(3))))
      .toMap
    assert(out(1) == ((4, 1, 0L)), "single-char string has zero entropy")
    assert(out(2) == ((4, 2, 693147L)), "two uniform chars -> ln 2 micro-nats")
    assert(out(3) == ((4, 4, 1386294L)), "four uniform chars -> ln 4")
    assert(!out.contains(4L), "empty text drops out")
  }

  test("incremental dedup: recrawls flag dup_history, batch dups flag dup_batch") {
    val hist = Seq(Doc(1, "historical content alpha"), Doc(2, "historical content beta")).toDF
    val index = Dedup.exactGroups(hist).select(col("fingerprint"), col("keeper_id"))
    val batch = Seq(
      Doc(100, "historical content alpha"), // recrawl of 1
      Doc(101, "fresh new content"),
      Doc(102, "fresh new content"),        // batch dup of 101
      Doc(103, "another fresh document")).toDF
    val out = Dedup.dedupAgainstIndex(batch, index).collect()
      .map(r => r.getLong(0) -> (r.getString(2), Option(r.get(3)))).toMap
    assert(out(100L) == (("dup_history", Some(1L))), s"$out")
    assert(out(101L) == (("kept", None)), s"$out")
    assert(out(102L) == (("dup_batch", Some(101L))), s"$out")
    assert(out(103L) == (("kept", None)), s"$out")
  }

  test("bpe apply: hand-checked merge cascade on a tiny doc") {
    // "the cat" -> "t h e _ c a t" -> th -> the -> the_ : "the_ c a t"
    val out = TextAnalysis.bpeApply(Seq(Doc(1, "the cat")).toDF)
      .select("bpe_symbols", "n_bpe_symbols").head()
    assert(out.getString(0) == "the_ c a t", s"got '${out.getString(0)}'")
    assert(out.getInt(1) == 4)
  }

  test("calibrateBySource: per-source percentiles span 0..1, ties share ranks") {
    val d = Seq(
      (1L, "the a of and is to in it that words here now", "s1"),
      (2L, "zz qq ww", "s1"),
      (3L, "the a of and is to in it that words here now", "s2"),
      (4L, "the the the the a a a of of is", "s2"),
      (5L, "mid quality the a of text", "s2")).toDF("doc_id", "text", "source")
    val out = Curation.calibrateBySource(d).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(1L) == 1.0 && out(2L) == 0.0, s"2-doc source spans 0..1: $out")
    assert(Seq(3L, 4L, 5L).map(out).sorted == Seq(0.0, 0.5, 1.0), s"$out")
  }

  test("corpus diff labels added/removed/changed/unchanged correctly") {
    val old = Seq(Doc(1, "alpha"), Doc(2, "beta"), Doc(3, "gamma")).toDF
    val nw = Seq(Doc(1, "alpha"), Doc(2, "beta EDITED"), Doc(4, "delta")).toDF
    val out = Dedup.corpusDiff(old, nw).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"), s"$out")
  }

  test("oov rate: full vocab -> zero OOV; empty vocab -> all OOV") {
    val d = (1L to 40L).map(i => Doc(i, s"tok${i % 7} tok${i % 5} shared words")).toDF
    val full = Curation.oovRate(d, vocabSize = 1000).collect()
    assert(full.nonEmpty, "hash split must yield test docs")
    assert(full.forall(_.getLong(2) == 0L),
      "vocab covering every train token may still miss test-only tokens" +
        " only if the token never occurs in train; with shared tokens all hit")
    val none = Curation.oovRate(d, vocabSize = 0).collect()
    assert(none.forall(r => r.getLong(2) == r.getLong(1)),
      "empty vocab: every token is OOV")
  }

  test("bigram NLL: repetitive-bigram doc scores lower than novel-bigram doc") {
    val d = Seq(
      Doc(1, "a b a b a b a b a b"),   // one dominant bigram pattern
      Doc(2, "c d e f g h i j k l")).toDF // all bigrams unique
    val out = Curation.bigramLogProb(d).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(1L) < out(2L), s"repetition must lower the NLL: $out")
  }

  test("filtered ANN respects the corpus predicate and matches brute force unfiltered") {
    val vecs = (0L until 20L).map(i =>
      (i, Seq(1.0f + i, 2.0f - i, 0.5f * i, 1.0f), (i % 4).toInt))
      .toDF("vec_id", "embedding", "label")
    val filtered = Similarity.filteredTopK(vecs, col("label") === 1, k = 5,
      numQueries = 2).collect()
    val allowed = (0L until 20L).filter(_ % 4 == 1).toSet
    assert(filtered.nonEmpty && filtered.forall(r => allowed(r.getLong(1))),
      "every neighbor must satisfy the predicate")
    val unfiltered = Similarity.filteredTopK(vecs, lit(true), k = 5, numQueries = 2)
    val brute = Similarity.bruteForceTopK(vecs, k = 5, numQueries = 2)
    assert(unfiltered.except(brute).count() == 0 &&
      brute.except(unfiltered).count() == 0,
      "pred=true must equal brute force")
  }

  test("embed outliers: planted far vector flagged, cluster members clean") {
    // 4 vectors near (1,0,0,0) with label 0, one far row with the
    // same label must exceed any tight threshold
    val vecs = Seq(
      (1L, Seq(1.0f, 0f, 0f, 0f), 0),
      (2L, Seq(0.99f, 0.01f, 0f, 0f), 0),
      (3L, Seq(1.01f, -0.01f, 0f, 0f), 0),
      (4L, Seq(1.0f, 0.02f, 0f, 0f), 0),
      (5L, Seq(-1.0f, 5.0f, 0f, 0f), 0)).toDF("vec_id", "embedding", "label")
    val out = Similarity.embedOutliers(vecs, threshold = 2000000000000L)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(out(5L), s"far vector must be an outlier: $out")
    assert(Seq(1L, 2L, 3L, 4L).forall(!out(_)), s"cluster members clean: $out")
  }

  test("centroid classifier: separable labels classify perfectly") {
    // label 0 near (1,0,0,0), label 1 near (0,1,0,0) — vec_id % 5 == 0
    // rows are the test split and must land on their own label
    val rows = (0L until 20L).map { i =>
      val l = (i % 2).toInt
      val base = if (l == 0) Seq(1.0f, 0.01f * i, 0f, 0f)
                 else Seq(0.01f * i, 1.0f, 0f, 0f)
      (i, base, l)
    }
    val emb = rows.toDF("vec_id", "embedding", "label")
    val conf = Similarity.centroidClassify(emb, trainMod = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(conf.keys.forall { case (t, p) => t == p },
      s"misclassification in separable data: $conf")
    assert(conf.values.sum == 4L, s"4 test rows expected: $conf")
  }

  test("silhouetteByLabel: tight separated labels score 1; single label degenerates to 0") {
    // two point-mass labels at (0,0,0,0) and (1,1,0,0): every point
    // sits ON its centroid (a = 0) with the rival at sqrt(2) -> s = 1
    val emb = Seq(
      (1L, Seq(0f, 0f, 0f, 0f), 0), (2L, Seq(0f, 0f, 0f, 0f), 0),
      (3L, Seq(1f, 1f, 0f, 0f), 1), (4L, Seq(1f, 1f, 0f, 0f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.silhouetteByLabel(emb).collect()
      .map(r => r.getAs[Long]("label") -> r).toMap
    assert(out.keySet == Set(0L, 1L))
    out.values.foreach { r =>
      assert(r.getAs[Long]("n") == 2L)
      assert(r.getAs[Double]("silhouette") == 1.0, s"$r")
    }
    // a label whose points straddle a rival centroid scores below the
    // tight ones: move one label-0 point onto label 1's centroid
    val noisy = Seq(
      (1L, Seq(0f, 0f, 0f, 0f), 0), (2L, Seq(1f, 1f, 0f, 0f), 0),
      (3L, Seq(1f, 1f, 0f, 0f), 1), (4L, Seq(1f, 1f, 0f, 0f), 1))
      .toDF("vec_id", "embedding", "label")
    val n0 = Similarity.silhouetteByLabel(noisy).collect()
      .map(r => r.getAs[Long]("label") -> r.getAs[Double]("silhouette"))
      .toMap
    assert(n0(0L) < 1.0 && n0(1L) <= 1.0, s"$n0")
    // with a single label there is no rival centroid: 0 by contract
    val one = Seq((1L, Seq(0f, 0f, 0f, 0f), 7), (2L, Seq(1f, 0f, 0f, 0f), 7))
      .toDF("vec_id", "embedding", "label")
    val s1 = Similarity.silhouetteByLabel(one).collect()
    assert(s1.length == 1 && s1.head.getAs[Double]("silhouette") == 0.0)
  }

  test("IVF-PQ: deterministic rerun; k per query with dense ranks; candidates respect probes") {
    val emb = graft.sources.Tables(spark, "/root/testdata/sf0.001").embeddings
    val out = Similarity.ivfPqTopK(emb, k = 10, numQueries = 3,
      nprobe = 2, nClusters = 8, m = 8, ks = 16)
      .as[(Long, Long, Long, Int)].collect()
    val byQ = out.groupBy(_._1)
    assert(byQ.keySet == Set(0L, 1L, 2L), s"3 queries expected: ${byQ.keySet}")
    byQ.foreach { case (q, rows) =>
      assert(rows.map(_._4).sorted.toSeq == (1 to rows.length),
        s"query $q ranks must be dense from 1")
      assert(rows.length <= 10)
    }
    // exact rerun (codebooks + ADC arithmetic fully deterministic)
    val rerun = Similarity.ivfPqTopK(emb, k = 10, numQueries = 3,
      nprobe = 2, nClusters = 8, m = 8, ks = 16)
      .as[(Long, Long, Long, Int)].collect()
    assert(out.sortBy(r => (r._1, r._4)).toSeq ==
      rerun.sortBy(r => (r._1, r._4)).toSeq, "IVF-PQ must be bit-deterministic")
    // more probes never shrink the candidate pool for any query
    val p1 = Similarity.ivfPqTopK(emb, k = 1000, numQueries = 3,
      nprobe = 1, nClusters = 8).as[(Long, Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.length).toMap
    val p8 = Similarity.ivfPqTopK(emb, k = 1000, numQueries = 3,
      nprobe = 8, nClusters = 8).as[(Long, Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.length).toMap
    assert(p1.forall { case (q, n) => p8.getOrElse(q, 0) >= n },
      s"full probe must dominate: $p1 vs $p8")
  }

  test("hardNegatives: never returns the query's own label; nearest other-label first") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Seq(1.0f, 0f, 0f, 0f), 0),    // query, label 0
      (5L, Seq(0.99f, 0.01f, 0f, 0f), 0), // same-label near dup — must be excluded
      (6L, Seq(0.9f, 0.1f, 0f, 0f), 1),   // the hard negative
      (7L, Seq(0f, 1.0f, 0f, 0f), 1),
      (8L, Seq(0f, 0f, 1.0f, 0f), 2)).toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(vecs, k = 3, numQueries = 1)
      .as[(Long, Long, Long, Long, Double, Int)].collect().sortBy(_._6)
    assert(out.forall(r => r._4 != r._2), s"own label leaked: ${out.toSeq}")
    assert(!out.exists(_._3 == 5L), "same-label near-dup must be excluded")
    assert(out.head._3 == 6L, s"hardest negative first: ${out.toSeq}")
  }

  test("lengthBucketBatches: dense positions, bounded batches, monotone lengths") {
    import spark.implicits._
    val docs = (1L to 100L).map(i => (i, ("w " * (i % 37 + 1).toInt).trim))
      .toDF("doc_id", "text")
    val out = Curation.lengthBucketBatches(docs, batchSize = 8, numShards = 4)
      .as[(Long, Int, Int, Int, Int)].collect()
    assert(out.length == 100)
    out.groupBy(r => (r._3, r._4)).foreach { case ((s, b), rows) =>
      assert(rows.length <= 8, s"batch ($s,$b) overflows")
      assert(rows.map(_._5).sorted.toSeq == (0 until rows.length),
        s"batch ($s,$b) positions must be dense")
    }
    // within a shard, batches are length-ordered: max of batch b ≤ min of b+1
    out.groupBy(_._3).foreach { case (s, rows) =>
      val byBatch = rows.groupBy(_._4).toSeq.sortBy(_._1)
        .map { case (b, rs) => (b, rs.map(_._2).min, rs.map(_._2).max) }
      byBatch.sliding(2).foreach {
        case Seq((_, _, hiPrev), (_, loNext, _)) =>
          assert(hiPrev <= loNext, s"shard $s batches out of length order")
        case _ => ()
      }
    }
  }

  test("decontaminate: planted benchmark span is cut, clean docs untouched") {
    import spark.implicits._
    val bench = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (0L, bench), // benchMod split (0 % 97 == 0)
      (1L, s"intro words then $bench closing words"),
      (2L, "an entirely unrelated document with plenty of ordinary words"))
      .toDF("doc_id", "text")
    val out = Curation.decontaminate(docs, benchMod = 97, span = 8)
      .as[(Long, Int, Int, String)].collect().map(r => r._1 -> r).toMap
    assert(!out.contains(0L), "benchmark docs are not emitted")
    assert(out(1L) == ((1L, 13, 8, "intro words then closing words")),
      s"span must be cut exactly: ${out(1L)}")
    assert(out(2L)._3 == 0 && out(2L)._4 ==
      "an entirely unrelated document with plenty of ordinary words",
      s"clean doc must be untouched: ${out(2L)}")
  }

  test("chunkWithOverlap: hand-computed windows; overlap shared between neighbors") {
    import spark.implicits._
    val docs = Seq((1L, "t0 t1 t2 t3 t4 t5 t6")).toDF("doc_id", "text")
    val out = TextAnalysis.chunkWithOverlap(docs, chunkTokens = 4, overlap = 2)
      .orderBy("chunk_idx")
      .select("chunk_idx", "n_chunk_tokens", "chunk_text")
      .as[(Int, Int, String)].collect().toSeq
    // no trailing pure-suffix-duplicate chunk: a start ≥ n − overlap
    // would add no new tokens, so "t6" alone is never emitted
    assert(out == Seq((0, 4, "t0 t1 t2 t3"), (1, 4, "t2 t3 t4 t5"),
      (2, 3, "t4 t5 t6")), s"unexpected chunks: $out")
    // a doc shorter than the overlap still yields its single chunk
    val tiny = Seq((2L, "a")).toDF("doc_id", "text")
    assert(TextAnalysis.chunkWithOverlap(tiny, 4, 2).count() == 1)
  }

  test("pmiCollocations: planted collocation outranks frequent-but-independent pairs") {
    import spark.implicits._
    // "aurora borealis" always co-occur (perfect association); "the"
    // pairs are frequent but promiscuous, so their PMI is low
    val docs = (1 to 10).map(i =>
      (i.toLong, s"the cat saw the aurora borealis over the dog and the bird $i"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.pmiCollocations(docs, minCount = 5, topK = 5)
      .as[(String, String, Long, Long, Int)].collect()
    assert(out.head._1 == "aurora" && out.head._2 == "borealis",
      s"planted collocation must rank first: ${out.toSeq}")
    assert(out.head._3 == 10L)
  }

  test("knnClassify: separable labels classify perfectly; ties break to lowest label") {
    import spark.implicits._
    val rows = (0L until 30L).map { i =>
      val l = (i % 2).toInt
      val base = if (l == 0) Seq(1.0f, 0.001f * i, 0f, 0f)
                 else Seq(0.001f * i, 1.0f, 0f, 0f)
      (i, base, l)
    }
    val emb = rows.toDF("vec_id", "embedding", "label")
    val conf = Similarity.knnClassify(emb, k = 3, trainMod = 5)
      .as[(Long, Long, Long)].collect()
    assert(conf.forall { case (t, p, _) => t == p },
      s"separable data must classify perfectly: ${conf.toSeq}")
    assert(conf.map(_._3).sum == 6L, s"6 test rows expected: ${conf.toSeq}")
  }

  test("bpeTrain: hand-computed merge sequence with deterministic tie-break") {
    import spark.implicits._
    // "a a a b" ×2 docs: (a,a)=4 wins; then (a,b)=2 ties (aa,a)=2 and
    // wins lexicographically; then (aa,ab)=2 is the only pair left
    val docs = Seq((1L, "aaab"), (2L, "aaab")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeTrain(docs, merges = 3)
      .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1, "a", "a", 4L), (2, "a", "b", 2L),
      (3, "aa", "ab", 2L)), s"unexpected merges: $out")
  }

  test("prefix-filtered Jaccard join ≡ brute-force all-pairs (exactness)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again today"),
      (2L, "the quick brown fox jumps over the lazy dog again tonight"),
      (3L, "a completely different story about ships and harbors at dawn"),
      (4L, "a completely different story about ships and harbors at dusk"),
      (5L, "nothing shares any phrasing with anything else whatsoever"))
      .toDF("doc_id", "text")
    val got = Dedup.prefixJaccardJoin(docs, threshold = 0.3)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    // brute force over the same shingle sets
    def sh(s: String) = s.split("\\s+").sliding(3).map(_.mkString(" ")).toSet
    val texts = docs.as[(Long, String)].collect()
    val want = (for {
      (a, ta) <- texts; (b, tb) <- texts if a < b
      inter = (sh(ta) & sh(tb)).size
      jac = inter.toDouble / (sh(ta) | sh(tb)).size if jac >= 0.3
    } yield (a, b)).toSet
    assert(got == want, s"got $got want $want")
    assert(want.contains((1L, 2L)) && want.contains((3L, 4L)),
      "planted near-dup pairs present")
  }

  test("winnowing: shared run ≥ k+w-1 tokens guarantees a shared fingerprint") {
    import spark.implicits._
    val shared = "quick brown fox jumps over the lazy dog tonight"
    val docs = Seq(
      (1L, s"alpha beta gamma $shared delta epsilon"),
      (2L, s"one two $shared three four five six"),
      (3L, "completely different words with no overlap at all here"))
      .toDF("doc_id", "text")
    val fp = Dedup.winnowFingerprints(docs, k = 3, w = 4)
    val byDoc = fp.collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(2)).toSet).toMap
    // the winnowing guarantee: any shared substring of ≥ k+w-1 = 6
    // tokens must contribute at least one common fingerprint
    assert((byDoc(1L) & byDoc(2L)).nonEmpty, s"guarantee violated: $byDoc")
    assert((byDoc(1L) & byDoc(3L)).isEmpty, "unrelated docs share nothing")
    // density: selections ≈ 2/(w+1) of windows, never more than windows
    val g1 = docs.filter($"doc_id" === 1L).select(
      graft.ext.TextAnalysis.tokens($"text")).head.getSeq[String](0).size
    assert(byDoc(1L).size <= g1 - 2, "cannot select more than gram count")
  }

  test("count-min: estimates are one-sided and exact without collisions") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta alpha beta alpha beta"),
      (8L, "gamma delta gamma delta"),
      (16L, "alpha beta epsilon zeta")).toDF("doc_id", "text")
    // wide sketch: no collisions possible among a handful of bigrams
    val hh = Sketches.cmsHeavyHitters(docs, k = 50, width = 1024, sampleMod = 8)
      .as[(String, Long, Long)].collect()
    assert(hh.nonEmpty && hh.forall { case (_, ex, est) => est == ex })
    assert(hh.maxBy(_._3)._1 == "alpha beta")
    // narrow sketch: collisions force overestimates but NEVER under
    val tight = Sketches.cmsHeavyHitters(docs, k = 50, width = 2, sampleMod = 8)
      .as[(String, Long, Long)].collect()
    assert(tight.forall { case (_, ex, est) => est >= ex })
    assert(tight.exists { case (_, ex, est) => est > ex },
      "width 2 over 8 keys must collide")
  }

  test("count-min: shard sketches merge cell-wise to the full-corpus sketch") {
    import spark.implicits._
    val occ = Seq.tabulate(40)(i => s"k${i % 7}").toDF("key")
    val a = occ.filter($"key" < "k4")
    val b = occ.filter($"key" >= "k4")
    def cells(df: org.apache.spark.sql.DataFrame) =
      df.as[(Int, Long, Long)].collect()
        .map { case (s, bk, c) => ((s, bk), c) }.toMap
    val full = cells(Sketches.cmsBuild(occ, width = 8))
    val merged = cells(Sketches.cmsBuild(a, width = 8)
      .unionAll(Sketches.cmsBuild(b, width = 8))
      .groupBy("seed", "bucket").agg(sum("c").as("c")))
    assert(merged == full, s"merge mismatch: $merged vs $full")
  }

  test("pairRules: hand-computed confidence and lift; popular-but-independent scores lift 1") {
    import spark.implicits._
    // 4 baskets: x in all 4 (popular), y in 2, z only ever with y
    val baskets = Seq(
      (1L, "x"), (1L, "y"), (1L, "z"),
      (2L, "x"), (2L, "y"), (2L, "z"),
      (3L, "x"), (4L, "x")).toDF("ok", "pk")
    val rules = Association.pairRules(baskets, minSupport = 2, topK = 10)
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    // y->z: s=2, conf=2/2=1.0, lift=2*4/(2*2)=2.0
    assert(rules(("y", "z")) == (2L, 1000000L, 2000000L), s"got $rules")
    // y->x: s=2, conf=1.0, lift=2*4/(2*4)=1.0 (x is just popular)
    assert(rules(("y", "x")) == (2L, 1000000L, 1000000L))
    // x->y: conf=2/4=0.5, lift symmetric 1.0
    assert(rules(("x", "y")) == (2L, 500000L, 1000000L))
  }

  test("skewReport: hot key, share, and entropy match hand computation") {
    import spark.implicits._
    // 6 rows: key a x3, b x2, c x1 -> hot=a share=500000
    // H = -(1/2 ln 1/2 + 1/3 ln 1/3 + 1/6 ln 1/6) = 1.011404...
    val df = Seq("a", "a", "a", "b", "b", "c").map(Tuple1(_)).toDF("k")
    val r = graft.ext.Profiler.skewReport(df, "k").collect()(0)
    assert(r.getAs[Long]("n_rows") == 6 && r.getAs[Long]("n_keys") == 3)
    assert(r.getAs[String]("hot_key") == "a" && r.getAs[Long]("hot_n") == 3)
    assert(r.getAs[Long]("hot_share_micro") == 500000L)
    val h = r.getAs[Long]("entropy_micro")
    assert(math.abs(h - 1011404L) <= 2, s"entropy $h")
  }

  test("bloom: no false negatives ever; shard filters merge by union") {
    import spark.implicits._
    val members = (1 to 50).map(i => s"in$i").toDF("key")
    val bloom = Sketches.bloomBuild(members, m = 4096, depth = 3)
    val probes = ((1 to 50).map(i => s"in$i") ++
      (1 to 50).map(i => s"out$i")).toDF("key")
    val got = Sketches.bloomProbe(bloom, probes, m = 4096, depth = 3)
      .as[(String, Boolean)].collect().toMap
    assert((1 to 50).forall(i => got(s"in$i")), "false negative!")
    // a TIGHT filter must show false positives (one-sided, not exact)
    val tight = Sketches.bloomBuild(members, m = 32, depth = 2)
    val gotTight = Sketches.bloomProbe(tight, probes, m = 32, depth = 2)
      .as[(String, Boolean)].collect().toMap
    assert((1 to 50).forall(i => gotTight(s"in$i")), "false negative!")
    assert((1 to 50).exists(i => gotTight(s"out$i")),
      "32 bits over 50 keys must collide")
    // shard merge = position-set union
    val a = Sketches.bloomBuild(members.filter($"key" < "in3"), m = 4096, depth = 3)
    val b = Sketches.bloomBuild(members.filter($"key" >= "in3"), m = 4096, depth = 3)
    assert(a.unionAll(b).distinct().as[Long].collect().toSet ==
      bloom.as[Long].collect().toSet, "union-merge mismatch")
  }

  test("mmrSelect: near-duplicate of the top hit is deferred behind a diverse pick") {
    import spark.implicits._
    // B is a near-copy of top hit A (sim .99): pure relevance ranks
    // A,B,C; MMR must defer B behind the dissimilar C
    val cands = Seq(
      (1L, 10L, 900000L), // A
      (1L, 11L, 800000L), // B ~ A
      (1L, 12L, 500000L), // C, dissimilar
      (1L, 13L, 400000L)  // D
    ).toDF("query_id", "cid", "rel_micro")
    val simPairs = Seq(
      (10L, 11L, 990000L), (10L, 12L, 100000L), (10L, 13L, 100000L),
      (11L, 12L, 100000L), (11L, 13L, 100000L), (12L, 13L, 950000L))
    val sims = simPairs.flatMap { case (a, b, s) =>
      Seq((1L, a, b, s), (1L, b, a, s)) }
      .toDF("query_id", "a", "b", "sim_micro")
    val picks = Similarity.mmrSelect(cands, sims, k = 4)
      .orderBy("pick_rank").select("cid").as[Long].collect().toSeq
    // step2: B 7*8e5-3*9.9e5=2.63e6 < C 7*5e5-3*1e5=3.2e6 -> C;
    // step3: B 2.63e6 > D 7*4e5-3*9.5e5=-5e4 (D ~ C now) -> B; then D
    assert(picks == Seq(10L, 12L, 11L, 13L), s"got $picks")
  }

  test("hll: duplicate-insensitive, small-range branch sane, registers merge by max") {
    import spark.implicits._
    val keys = (1 to 40).map(i => ("g", s"key$i")).toDF("grp", "key")
    val est = Sketches.hllDistinctBy(keys, "grp")
      .select("hll_est").as[Long].head()
    // linear-counting zone (40 << 2.5*256): estimate close to truth
    assert(math.abs(est - 40) <= 8, s"LC estimate $est for 40 keys")
    // inserting every key three more times changes NOTHING
    val dup = keys.unionAll(keys).unionAll(keys).unionAll(keys)
    val estDup = Sketches.hllDistinctBy(dup, "grp")
      .select("hll_est").as[Long].head()
    assert(estDup == est, s"duplicates moved the estimate: $estDup vs $est")
    // shard merge: max over per-shard registers == whole-corpus registers
    def regs(df: org.apache.spark.sql.DataFrame) = df
      .select(graft.expressions.Md5Hash60.hash60(
        concat(lit("hll|"), $"key")).as("hv"))
      .select(($"hv" % 256).as("reg"),
        least(lit(53) - length(conv(expr("hv div 256"), 10, 2)), lit(32))
          .cast("long").as("rho"))
      .groupBy("reg").agg(max($"rho").as("mj"))
    val shardA = keys.filter($"key" < "key3")
    val shardB = keys.filter($"key" >= "key3")
    val merged = regs(shardA).unionAll(regs(shardB))
      .groupBy("reg").agg(max($"mj").as("mj"))
      .as[(Long, Long)].collect().toMap
    val whole = regs(keys).as[(Long, Long)].collect().toMap
    assert(merged == whole, "register-wise max must merge shards")
  }

  test("maxSim: swapped-slot match invisible to pooled cosine; nTokens=1 ≡ cosine; zero-norm scores 0") {
    def e(i: Int, s: Float = 1f) = { val a = Array.fill(8)(0f); a(i) = s; a }
    val z = Array.fill(8)(0f)
    def vec(toks: Array[Float]*): Array[Float] =
      (toks ++ Seq.fill(8 - toks.length)(z)).flatten.toArray
    val q = vec(e(0), e(1))
    val a = vec(e(1, 2f), e(0, 3f)) // query tokens present, slots swapped + scaled
    val b = vec(e(2), e(3))         // unrelated directions
    val emb = Seq((0L, q), (1L, a), (2L, b), (3L, Array.fill(64)(0f)))
      .toDF("vec_id", "embedding")
    val ms = Similarity.maxSimTopK(emb, k = 3, numQueries = 1)
      .select("nn_id", "maxsim").as[(Long, Double)].collect().toMap
    assert(ms(1L) == 2.0, s"both query tokens find exact-direction matches: $ms")
    assert(ms(2L) == 0.0 && ms(3L) == 0.0, s"unrelated/zero score 0, not NaN: $ms")
    // pooled single-vector cosine is blind to the swapped-slot match
    val pooled = Similarity.bruteForceTopK(emb, k = 3, numQueries = 1)
      .select("nn_id", "cos_sim").as[(Long, Double)].collect().toMap
    assert(pooled(1L) == 0.0, s"full-vector cosine of orthogonal layouts: $pooled")
    // degenerate 1×64 grid IS pooled cosine — ranks and scores identical
    val embR = graft.sources.Tables(spark, "/root/testdata/sf0.001").embeddings
    val one = Similarity.maxSimTopK(embR, k = 5, numQueries = 2,
        nTokens = 1, tokenDim = 64)
      .select("query_id", "nn_id", "maxsim", "rn")
      .as[(Long, Long, Double, Int)].collect().toSet
    val bf = Similarity.bruteForceTopK(embR, k = 5, numQueries = 2)
      .select("query_id", "nn_id", "cos_sim", "rn")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(one == bf, "nTokens=1 must reproduce brute-force cosine exactly")
  }

  test("rougeN: hand-computed clipped bigram overlap; identity pair scores 1; short pair scores 0") {
    val cand = Seq((1L, "a b c d"), (2L, "same text here"), (3L, "x"))
      .toDF("pair_id", "text")
    val ref = Seq((1L, "a b x c d"), (2L, "same text here"), (3L, "y"))
      .toDF("pair_id", "text")
    val out = TextAnalysis.rougeN(cand, ref, n = 2)
      .select("pair_id", "overlap", "rouge_p", "rouge_r", "rouge_f1")
      .as[(Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // cand bigrams {ab,bc,cd}, ref {ab,bx,xc,cd} → overlap 2,
    // P=2/3, R=2/4, F1=4/7
    assert(out(1L)._2 == 2L)
    assert(out(1L)._3 == 0.666667 && out(1L)._4 == 0.5)
    assert(out(1L)._5 == 0.571429, s"F1: ${out(1L)}")
    assert(out(2L)._3 == 1.0 && out(2L)._4 == 1.0 && out(2L)._5 == 1.0)
    assert(out(3L)._2 == 0L && out(3L)._5 == 0.0, "sub-bigram texts score 0")
  }

  test("lshRecall composition: planted near-dup pair is ground truth AND recalled") {
    val exact = Dedup.prefixJaccardJoin(docs, threshold = 0.5)
    val cands = Dedup.lshCandidates(
      Dedup.minhashSignatures(docs, numHashes = 8), numHashes = 8, rowsPerBand = 2)
    val rec = exact.join(cands.select(col("a_id"), col("b_id"),
          lit(1L).as("hit")), Seq("a_id", "b_id"), "left")
      .select(floor(col("jaccard") * 10).cast("long").as("j_bucket"),
        coalesce(col("hit"), lit(0L)).as("hit"))
      .groupBy("j_bucket")
      .agg(count(lit(1)).as("n"), sum(col("hit")).as("h"))
      .as[(Long, Long, Long)].collect()
    assert(rec.nonEmpty && rec.map(_._2).sum >= 1, s"ground truth exists: ${rec.toSeq}")
    assert(rec.forall(r => r._2 == r._3),
      s"the banding must recall every planted pair here: ${rec.toSeq}")
  }

  test("calibration: perfectly calibrated bins gap 0 (ECE 0); Brier matches hand sum") {
    val rows = (Seq.fill(8)((800000L, 1L)) ++ Seq.fill(2)((800000L, 0L)) ++
      Seq.fill(2)((200000L, 1L)) ++ Seq.fill(8)((200000L, 0L)))
      .toDF("p_micro", "y")
    val out = Evaluation.calibration(rows, bins = 10)
      .select("bin", "n_bin", "gap_micro", "ece_micro", "brier_micro")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.map(_._1).toSet == Set(2L, 8L))
    assert(out.forall(_._3 == 0L), s"calibrated bins must gap 0: ${out.toSeq}")
    assert(out.head._4 == 0L, "ECE 0")
    // Brier = (8·0.04 + 2·0.64 + 2·0.64 + 8·0.04)/20 = 0.16
    assert(out.head._5 == 160000L, s"brier: ${out.head}")
    val anti = Seq.fill(10)((900000L, 0L)).toDF("p_micro", "y")
    val a = Evaluation.calibration(anti, bins = 10)
      .select("ece_micro").as[Long].head()
    assert(a == 900000L, s"anti-calibrated ECE = confidence: $a")
  }

  test("cohenKappa: perfect agreement 1; hand-computed 2x2 case; constant-pair convention 0") {
    val hand = (Seq.fill(6)(("g", "y", "y")) ++ Seq.fill(2)(("g", "n", "n")) ++
      Seq(("g", "y", "n"), ("g", "n", "y")) ++
      Seq.fill(4)(("perfect", "a", "a")) ++ Seq.fill(3)(("perfect", "b", "b")) ++
      Seq.fill(5)(("const", "x", "x")))
      .toDF("group", "label_a", "label_b")
    val k = Evaluation.cohenKappa(hand)
      .select("grp", "po", "pe", "kappa")
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // g: po=0.8, pe=0.7·0.7+0.3·0.3=0.58, κ=(0.8−0.58)/0.42
    assert(k("g")._2 == 0.8 && k("g")._3 == 0.58)
    assert(k("g")._4 == 0.52381, s"hand κ: ${k("g")}")
    assert(k("perfect")._4 == 1.0)
    assert(k("const")._4 == 0.0, "pe=1 degenerate scores 0 by convention")
  }

  test("aucRoc: perfect ranking 1; hand 0.75; all-tied and one-class 0.5") {
    val rows = (
      Seq(("sep", 90L, 1L), ("sep", 80L, 1L), ("sep", 20L, 0L), ("sep", 10L, 0L)) ++
      Seq(("m", 10L, 0L), ("m", 20L, 1L), ("m", 30L, 0L), ("m", 40L, 1L)) ++
      Seq(("tie", 50L, 1L), ("tie", 50L, 0L)) ++
      Seq(("pos", 70L, 1L), ("pos", 30L, 1L)))
      .toDF("group", "score_micro", "y")
    val a = Evaluation.aucRoc(rows)
      .select("grp", "n_pos", "n_neg", "u2", "auc")
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(a("sep")._5 == 1.0, s"separable: ${a("sep")}")
    // m: pos20 beats neg10 only; pos40 beats both ⇒ U=3/4
    assert(a("m")._4 == 6L && a("m")._5 == 0.75, s"hand: ${a("m")}")
    // one pos and one neg at the same score: U = ½ tie
    assert(a("tie")._4 == 1L && a("tie")._5 == 0.5, s"tie: ${a("tie")}")
    assert(a("pos")._5 == 0.5, "no negatives: coin-flip convention")
  }

  test("krippendorffAlpha: hand mixed-panel case; De=0 convention 1; single-rating items excluded") {
    // g (raters per item VARY — the missing-data shape):
    //  item 1 (a,a): du=0 · item 2 (a,b): du=2 · item 3 (b,b,b): du=0
    //  item 4 (a,b,b): du=(9−5)/2=2 · item 5 single (a): DROPPED
    //  n=10, n_a=4, n_b=6 ⇒ Do=4, De=(100−52)/9=16/3, α=1−4/(16/3)=0.25
    val rows = Seq(
      ("g", 1L, "a"), ("g", 1L, "a"),
      ("g", 2L, "a"), ("g", 2L, "b"),
      ("g", 3L, "b"), ("g", 3L, "b"), ("g", 3L, "b"),
      ("g", 4L, "a"), ("g", 4L, "b"), ("g", 4L, "b"),
      ("g", 5L, "a"),
      ("p", 1L, "x"), ("p", 1L, "x"), ("p", 2L, "x"), ("p", 2L, "x"))
      .toDF("group", "item", "cat")
    val a = Evaluation.krippendorffAlpha(rows)
      .select("grp", "n_items", "n_ratings", "do_micro", "de", "alpha")
      .as[(String, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(a("g")._2 == 4L && a("g")._3 == 10L, s"item 5 must drop: ${a("g")}")
    assert(a("g")._4 == 4000000L && a("g")._5 == 5.333333, s"Do/De: ${a("g")}")
    assert(a("g")._6 == 0.25, s"hand α: ${a("g")}")
    assert(a("p")._5 == 0.0 && a("p")._6 == 1.0,
      s"no-variation group is α=1 by convention: ${a("p")}")
  }

  test("fleissKappa: hand 2-item 3-rater case; perfect 1; single-rating items excluded") {
    // g: item 1 rated (en,en,es), item 2 (en,es,es):
    // po = (2+2)/(2·3·2) = 1/3; marginals en=3, es=3 of N=6 ⇒ pe=0.5;
    // κ = (1/3 − 1/2)/(1/2) = −1/3. Item 3 has ONE rating — excluded.
    val g = Seq(
      ("g", 1L, "en"), ("g", 1L, "en"), ("g", 1L, "es"),
      ("g", 2L, "en"), ("g", 2L, "es"), ("g", 2L, "es"),
      ("g", 3L, "en"),
      ("p", 1L, "a"), ("p", 1L, "a"), ("p", 2L, "b"), ("p", 2L, "b"))
      .toDF("group", "item", "cat")
    val k = Evaluation.fleissKappa(g)
      .select("grp", "n_items", "n_ratings", "po", "pe", "kappa")
      .as[(String, Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(k("g")._2 == 2L && k("g")._3 == 6L, s"item 3 must drop: ${k("g")}")
    assert(k("g")._4 == 0.333333 && k("g")._5 == 0.5, s"po/pe: ${k("g")}")
    assert(k("g")._6 == -0.333333, s"hand κ: ${k("g")}")
    // p: unanimous raters, two balanced categories ⇒ po=1, pe=0.5, κ=1
    assert(k("p")._6 == 1.0, s"perfect: ${k("p")}")
  }

  test("weightedKappa: hand ordinal case (linear vs quadratic); perfect 1; constant-pair convention 1") {
    // g (1–3 scale): (1,1)×2 (2,2)×2 (3,3)×2 (1,3) (2,1), n=8.
    // wol = |1−3| + |2−1| = 3; woq = 4 + 1 = 5.
    // Marginals: r1 = {1:3, 2:3, 3:2}, r2 = {1:3, 2:2, 3:3} ⇒
    // wel = 24+18+16 = 58, weq = 42+18+28 = 88.
    // κ_l = 1 − 8·3/58 = 34/58; κ_q = 1 − 8·5/88 = 48/88 — the
    // quadratic weight punishes the 2-step (1,3) miss harder.
    val hand = (Seq.fill(2)(("g", 1L, 1L)) ++ Seq.fill(2)(("g", 2L, 2L)) ++
      Seq.fill(2)(("g", 3L, 3L)) ++ Seq(("g", 1L, 3L), ("g", 2L, 1L)) ++
      Seq(("perfect", 1L, 1L), ("perfect", 2L, 2L)) ++
      Seq.fill(3)(("const", 2L, 2L)))
      .toDF("group", "r1", "r2")
    val k = Evaluation.weightedKappa(hand)
      .select("grp", "n", "kappa_linear", "kappa_quadratic")
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(k("g")._2 == 8L)
    assert(k("g")._3 == 0.586207, s"hand κ_l: ${k("g")}")
    assert(k("g")._4 == 0.545455, s"hand κ_q: ${k("g")}")
    assert(k("perfect")._3 == 1.0 && k("perfect")._4 == 1.0)
    assert(k("const")._3 == 1.0 && k("const")._4 == 1.0,
      "no weighted disagreement possible ⇒ 1 by convention")
  }

  test("ksTest: identical 0; disjoint 1; missing side 1 by convention") {
    val a = Seq(("same", 1L), ("same", 2L), ("dis", 1L), ("dis", 2L),
      ("only_a", 5L)).toDF("group", "v")
    val b = Seq(("same", 1L), ("same", 2L), ("dis", 10L), ("dis", 11L))
      .toDF("group", "v")
    val k = Evaluation.ksTest(a, b)
      .select("grp", "n_a", "n_b", "d_num", "ks")
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(k("same")._4 == 0L && k("same")._5 == 0.0, s"identical: ${k("same")}")
    assert(k("dis")._5 == 1.0, s"disjoint: ${k("dis")}")
    assert(k("only_a")._3 == 0L && k("only_a")._5 == 1.0,
      s"one-sided group is maximal drift: ${k("only_a")}")
  }

  test("leakageSafeSplit: cluster members share one split; singletons match hashSplit") {
    val cand = Seq((1L, 2L), (2L, 5L)).toDF("a_id", "b_id")
    val d = Seq(1L, 2L, 3L, 5L, 9L).toDF("doc_id")
    val out = Curation.leakageSafeSplit(d, cand)
      .as[(Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // {1,2,5} is one component with keeper 1 — one split for all
    assert(Set(1L, 2L, 5L).map(out(_)._1) == Set(1L),
      s"cluster keeper: $out")
    assert(Set(1L, 2L, 5L).map(out(_)._2).size == 1,
      s"cluster must land whole in one split: $out")
    // singletons hash their own id — identical to the plain hashSplit
    val plain = Curation.hashSplit(d).select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    assert(out(3L) == ((3L, plain(3L))) && out(9L) == ((9L, plain(9L))),
      s"singletons must coincide with hashSplit: $out vs $plain")
    graft.ext.Checkpoints.releaseAll(spark)
  }

  test("containmentJoin: planted prefix slice scores 1.0 one-way; near-dup stays under 0.9") {
    val host = base // 19 words
    val short8 = base.split(" ").take(8).mkString(" ")
    val d = Seq(
      Doc(1, host), Doc(2, short8), Doc(3, nearDup),
      Doc(4, "completely different content about spark catalyst optimizer rules today")
    ).toDF
    val out = Dedup.containmentJoin(d, threshold = 0.9)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // the 8-word prefix's 6 shingles are all inside the host's set
    assert(out.get((2L, 1L)).contains(1.0), s"planted containment: $out")
    assert(!out.contains((1L, 2L)), "host is NOT contained in the slice")
    // one changed word flips 3 of 17 shingles: C ≈ 0.82 < 0.9 both ways
    assert(!out.contains((1L, 3L)) && !out.contains((3L, 1L)),
      s"near-dup under threshold must not pair: $out")
    assert(out.keySet.flatMap(k => Set(k._1, k._2)).subsetOf(Set(1L, 2L, 3L)),
      s"unrelated doc must stay unpaired: $out")
    // the same pair DOES clear a lower threshold, both asymmetric ways
    val lo = Dedup.containmentJoin(d, threshold = 0.8)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(lo.contains((1L, 3L)) && lo.contains((3L, 1L)),
      s"0.8 admits the near-dup in both directions: $lo")
    graft.ext.Checkpoints.releaseAll(spark)
  }

  test("labelVote: majority wins; ties break to smallest category and flag") {
    val r = Seq(
      ("g", 1L, "en"), ("g", 1L, "en"), ("g", 1L, "es"),
      ("g", 2L, "es"), ("g", 2L, "en"),
      ("g", 3L, "zh"))
      .toDF("group", "item", "cat")
    val out = Evaluation.labelVote(r)
      .select("item", "label", "votes", "n_ratings", "confidence", "is_tie")
      .as[(Long, String, Long, Long, Double, Boolean)].collect()
      .map(x => x._1 -> x).toMap
    assert(out(1L) == ((1L, "en", 2L, 3L, 0.666667, false)), s"${out(1L)}")
    assert(out(2L) == ((2L, "en", 1L, 2L, 0.5, true)),
      s"tie breaks lexicographically and flags: ${out(2L)}")
    assert(out(3L) == ((3L, "zh", 1L, 1L, 1.0, false)), s"${out(3L)}")
  }

  test("featureHash: bounded buckets, null skip, per-id determinism") {
    // ("color=red", "sz=xl") genuinely cancel at dim=16 (same bucket,
    // opposite signs — by-design hashing-trick behavior, asserted at
    // the end); "sz=m" lands in a distinct bucket
    val df = Seq(
      (1L, "red", "m"), (2L, "red", "m"), (3L, "blue", null))
      .toDF("id", "color", "sz")
    val out = Curation.featureHash(df, Seq("color", "sz"), dim = 16)
      .as[(Long, Long, Long)].collect()
    assert(out.forall(r => r._2 >= 0 && r._2 < 16), s"bucket range: ${out.toSeq}")
    // identical feature rows hash identically: id 1 ≡ id 2 cell-for-cell
    val by = out.groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSet)
    assert(by(1L) == by(2L), s"determinism: ${by.toMap}")
    // id 3 contributes only its non-null feature (one signed unit)
    assert(by(3L).map(_._2).map(math.abs).sum == 1L, s"null skip: ${by(3L)}")
    // total signed mass per id bounded by feature count
    assert(out.groupBy(_._1).forall(_._2.map(r => math.abs(r._3)).sum <= 2),
      s"mass bound: ${out.toSeq}")
    // exact-cancellation pair (verified md5 collision with opposite
    // signs at dim=16) drops its id entirely — the sparse contract
    val cancel = Seq((9L, "red", "xl")).toDF("id", "color", "sz")
    assert(Curation.featureHash(cancel, Seq("color", "sz"), dim = 16)
      .count() == 0L, "canceling features must vanish, not emit w=0")
  }

  test("chiSquare: hand 2x2 case; independent table 0; constant column dof 0") {
    val hand = (Seq.fill(30)(("g", "a", "x")) ++ Seq.fill(10)(("g", "a", "y")) ++
      Seq.fill(10)(("g", "b", "x")) ++ Seq.fill(30)(("g", "b", "y")) ++
      Seq.fill(20)(("ind", "a", "x")) ++ Seq.fill(20)(("ind", "a", "y")) ++
      Seq.fill(20)(("ind", "b", "x")) ++ Seq.fill(20)(("ind", "b", "y")) ++
      Seq.fill(5)(("const", "a", "x")) ++ Seq.fill(5)(("const", "a", "y")))
      .toDF("group", "label_a", "label_b")
    val out = Evaluation.chiSquare(hand)
      .select("grp", "n", "dof", "chi2_micro", "cramers_v")
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    // g: e=20 per cell, (o−e)²/e = 5 per cell ⇒ χ²=20, V=√(20/80)=0.5
    assert(out("g") == (("g", 80L, 1L, 20000000L, 0.5)), s"hand: ${out("g")}")
    assert(out("ind")._4 == 0L && out("ind")._5 == 0.0,
      s"independent: ${out("ind")}")
    assert(out("const")._3 == 0L && out("const")._5 == 0.0,
      s"constant column: ${out("const")}")
  }

  test("psi: identical samples score 0; shifted mass is positive; hand term") {
    // identical distributions: every term's ratio is 1 ⇒ psi 0
    val a = (Seq.fill(5)(("g", 150000L)) ++ Seq.fill(5)(("g", 850000L)))
      .toDF("group", "p_micro")
    val same = Evaluation.psi(a, a, bins = 10)
      .select("psi_micro").distinct().as[Long].collect()
    assert(same.toSeq == Seq(0L), s"identical: ${same.toSeq}")
    // all baseline mass in bin 1, all current in bin 8 ⇒ large PSI;
    // hand term for bin 1: pa=(5+1)/15, pb=(0+1)/15 ⇒
    // (1/15−6/15)·ln(1/6)·1e6 = (−1/3)·(−1.791759)·1e6 = 597253
    val b = Seq.fill(5)(("g", 850000L)).toDF("group", "p_micro")
    val a1 = Seq.fill(5)(("g", 150000L)).toDF("group", "p_micro")
    val out = Evaluation.psi(a1, b, bins = 10)
      .select("bin", "a_n", "b_n", "term_micro", "psi_micro")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out.size == 10, "full bin grid including empty bins")
    assert(out(1L)._4 == 597253L, s"hand term bin 1: ${out(1L)}")
    assert(out(8L)._4 == 597253L, s"symmetric shift: ${out(8L)}")
    assert(out(0L)._4 == 0L, "empty-in-both bin contributes 0")
    assert(out(1L)._5 > 1000000L, s"psi must flag the shift: ${out(1L)}")
  }

  test("corpusBleu: hand clip counts; brevity penalty branch; unpaired ids drop") {
    // cand "a b c" vs ref "a b d": p1 = 2/3, p2 = 1/2, lens equal ⇒
    // bp = 1, BLEU-2 = sqrt(1/3) = 0.57735
    val c1 = Seq((1L, "a b c")).toDF("pair_id", "text")
    val r1 = Seq((1L, "a b d")).toDF("pair_id", "text")
    val o1 = TextAnalysis.corpusBleu(c1, r1)
    val row1 = o1.select("n_pairs", "c_len", "r_len", "clip_1", "tot_1",
        "p_1", "clip_2", "tot_2", "p_2", "bp", "bleu")
      .as[(Long, Long, Long, Long, Long, Double, Long, Long, Double, Double, Double)]
      .head()
    assert(row1 == ((1L, 3L, 3L, 2L, 3L, 0.666667, 1L, 2L, 0.5, 1.0, 0.57735)),
      s"hand BLEU: $row1")
    // short candidate: cand "a b" vs ref "a b c d" ⇒ p1 = p2 = 1,
    // bp = e^(1 − 4/2) = e^(−1) = 0.367879 = BLEU
    val c2 = Seq((1L, "a b")).toDF("pair_id", "text")
    val r2 = Seq((1L, "a b c d")).toDF("pair_id", "text")
    val row2 = TextAnalysis.corpusBleu(c2, r2).select("bp", "bleu")
      .as[(Double, Double)].head()
    assert(row2 == ((0.367879, 0.367879)), s"bp branch: $row2")
    // a candidate with no matching reference id contributes nothing
    val c3 = Seq((1L, "a b c"), (9L, "z z z")).toDF("pair_id", "text")
    val row3 = TextAnalysis.corpusBleu(c3, r1)
      .select("n_pairs", "c_len").as[(Long, Long)].head()
    assert(row3 == ((1L, 3L)), s"unpaired drop: $row3")
    graft.ext.Checkpoints.releaseAll(spark)
  }

  test("benford: uniform digits deviate by the hand MAD; non-positive values skip") {
    // one value per digit 1..9 (plus skipped 0 / negative / null):
    // every share is round(1e6/9) = 111111
    val vals: Seq[(String, java.lang.Long)] =
      (1 to 9).map(d => ("u", java.lang.Long.valueOf(d * 100L - 1))) ++
        Seq(("u", java.lang.Long.valueOf(0L)),
          ("u", java.lang.Long.valueOf(-7L)), ("u", null))
    val df = vals.toDF("group", "cents")
    val out = Profiler.benford(df, "cents")
      .select("digit", "n_digit", "n", "p_micro", "dev_micro", "mad_micro")
      .as[(Int, Long, Long, Long, Long, Long)].collect()
    assert(out.length == 9 && out.forall(r => r._2 == 1L && r._3 == 9L),
      s"skips + full grid: ${out.toSeq}")
    val expMap = Profiler.benfordExpectedMicro.toMap
    out.foreach { r =>
      assert(r._5 == 111111L - expMap(r._1), s"dev hand check: $r")
    }
    val madHand = math.round(
      (1 to 9).map(d => math.abs(111111L - expMap(d))).sum / 9.0)
    assert(out.head._6 == madHand, s"MAD hand check: ${out.head} vs $madHand")
    // a perfectly Benford-weighted sample scores MAD ≈ 0: counts
    // proportional to p_micro themselves
    val bigVals = (1 to 9).flatMap(d =>
      Seq.fill((expMap(d) / 1000L).toInt)(("b", java.lang.Long.valueOf(d.toLong))))
    val mad2 = Profiler.benford(bigVals.toDF("group", "cents"), "cents")
      .select("mad_micro").distinct().as[Long].head()
    assert(mad2 < 1500L, s"Benford-weighted sample must conform: $mad2")
  }

  test("zipfSlope: exact power-law counts fit slope −1; single-token source scores 0") {
    // counts (12, 6, 4, 3) are exactly 12/rank — a pure Zipf s = −1
    val text = (Seq.fill(12)("aa") ++ Seq.fill(6)("bb") ++
      Seq.fill(4)("cc") ++ Seq.fill(3)("dd")).mkString(" ")
    val d = Seq((1L, text, "s1"), (2L, "solo solo solo", "s2"))
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.zipfSlope(d, topK = 50)
      .select("source", "n_terms", "slope_micro", "intercept_micro")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("s1")._2 == 4L, s"four ranked terms: ${out("s1")}")
    assert(math.abs(out("s1")._3 + 1000000L) <= 50,
      s"pure Zipf must fit −1 (±term rounding): ${out("s1")}")
    // intercept ≈ ln 12 · 1e6 = 2484907
    assert(math.abs(out("s1")._4 - 2484907L) <= 50, s"${out("s1")}")
    assert(out("s2") == (("s2", 1L, 0L, math.round(math.log(3.0) * 1e6))),
      s"degenerate source: ${out("s2")}")
  }

  test("vocabRichness: Chao1 and coverage on a hand-counted source") {
    val docs = Seq((1L, "a a b c", "s1")).toDF("doc_id", "text", "source")
    val r = TextAnalysis.vocabRichness(docs)
      .select("n_tokens", "vocab", "f1", "f2", "chao1", "coverage")
      .as[(Long, Long, Long, Long, Double, Double)].head()
    // N=4, V=3, F1=2 (b,c), F2=1 (a twice): chao1 = 3 + 2·1/4 = 3.5
    assert(r == ((4L, 3L, 2L, 1L, 3.5, 0.5)), s"got $r")
  }

  test("vocabPruningCurve: hand-counted thresholds; coverage monotone decreasing") {
    // "a a a a b b c": counts {a:4, b:2, c:1}
    val d = Seq((1L, "a a a a b b c")).toDF("doc_id", "text")
    val out = TextAnalysis.vocabPruningCurve(d, thresholds = Seq(1L, 2L, 3L))
      .select("min_count", "vocab_size", "covered_tokens", "coverage_micro")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, 3L, 7L, 1000000L),  // everything
      (2L, 2L, 6L, 857143L),   // a, b -> 6/7
      (3L, 1L, 4L, 571429L)),  // a only -> 4/7
      s"got ${out.toSeq}")
  }

  test("luhnScreen: checksum separates cards from card-shaped numbers; short runs never candidates") {
    val docs = Seq(
      (1L, "pay with 4111111111111111 now"),          // valid Luhn
      (2L, "ref 4111111111111112 invalid"),           // fails checksum
      (3L, "grouped 4111 1111 1111 1111 card"),       // valid, separators
      (4L, "phone 123-456-7890 and id 123456789012"), // too short
      (5L, "amex 378282246310005 works")              // 15-digit valid
    ).toDF("doc_id", "text")
    val out = TextAnalysis.luhnScreen(docs)
      .select("doc_id", "n_candidates", "n_luhn_valid", "keep")
      .as[(Long, Int, Int, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 1, 1, false)), s"valid card quarantines: ${out(1L)}")
    assert(out(2L) == ((2L, 1, 0, true)), s"checksum failure passes: ${out(2L)}")
    assert(out(3L) == ((3L, 1, 1, false)), s"grouped form detected: ${out(3L)}")
    assert(out(4L) == ((4L, 0, 0, true)), s"short runs never candidates: ${out(4L)}")
    assert(out(5L) == ((5L, 1, 1, false)), s"15-digit amex: ${out(5L)}")
  }

  test("mutualKnn: reciprocal pairs inside clusters, none across; hub non-reciprocity filtered") {
    def v(s: Float*): Array[Float] = s.toArray
    // two tight 2-clusters plus a lone point whose top-1 is cluster A
    // but which is nobody's top-1 back at k=1
    val emb = Seq(
      (1L, v(1f, 0f, 0f)), (2L, v(0.99f, 0.1f, 0f)),
      (3L, v(0f, 1f, 0f)), (4L, v(0.1f, 0.99f, 0f)),
      (5L, v(0.7f, 0.1f, 0.7f))).toDF("vec_id", "embedding")
    val pairs = Similarity.mutualKnn(emb, k = 1)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L), (3L, 4L)),
      s"cluster pairs only — the lone hub-seeker must be filtered: $pairs")
  }

  test("embedDrift: the shifted label drifts furthest; identical labels tie") {
    val base = Array.fill(8)(1f)
    val shifted = { val a = Array.fill(8)(1f); a(0) = 11f; a }
    val emb = Seq((0L, base, 1), (1L, base, 1), (2L, base, 2), (3L, base, 2),
      (4L, shifted, 3), (5L, shifted, 3)).toDF("vec_id", "embedding", "label")
    val d = Similarity.embedDrift(emb)
      .select("label", "l2_micro", "cos_micro")
      .as[(Int, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // global dim-0 centroid = (4·1 + 2·11)/6 ≈ 4.33: label 3 sits
    // 6.67 away, labels 1/2 only 3.33 — and identically so
    assert(d(1) == d(2), s"identical labels must tie: $d")
    assert(d(3)._1 > d(1)._1, s"shifted label must lead L2 drift: $d")
    // no label sits ON the global centroid (it is the pulled mean),
    // so every centroid cosine is strictly below 1
    assert(d.values.forall(_._2 < 1000000L), s"no perfect alignment: $d")
  }

  test("MaxSimScore: undersized vectors yield null, never out-of-bounds reads") {
    val df = Seq((Array.fill(32)(1.0), Array.fill(64)(1.0))).toDF("q", "d")
    val r = df.select(
      graft.expressions.MaxSimScore.maxSim(col("q"), col("d"), 8, 8).as("s1"),
      graft.expressions.MaxSimScore.maxSim(col("d"), col("d"), 8, 8).as("s2"))
      .head()
    assert(r.isNullAt(0), "a 32-element vector under the 8×8 grid must score null")
    // sqrt(8)·sqrt(8) ≠ 8 exactly in IEEE — compare with tolerance
    assert(math.abs(r.getDouble(1) - 8.0) < 1e-9,
      s"full-size identical vectors: 8 tokens × cos 1, got ${r.getDouble(1)}")
  }

  test("MaxSimScore native expression ≡ built-in composition, bit-for-bit") {
    val emb = graft.sources.Tables(spark, "/root/testdata/sf0.001").embeddings
    val q = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"),
        transform(col("embedding"), x => x.cast("double")).as("qv"))
    val pairs = emb
      .select(col("vec_id").as("nn_id"),
        transform(col("embedding"), x => x.cast("double")).as("dv"))
      .crossJoin(q)
    val diff = pairs.select(
        graft.expressions.MaxSimScore.maxSim(col("qv"), col("dv"), 8, 8).as("nat"),
        Similarity.maxSimComposed(col("qv"), col("dv"), 8, 8).as("ref"))
      .filter(col("nat") =!= col("ref")).count()
    assert(diff == 0, "native fused loop must be bit-identical to the composition")
  }

  test("bradleyTerry: transitive dominance ranks A>B>C; result is partitioning-independent") {
    val duels = Seq(
      ("A", "B"), ("A", "B"), ("A", "B"),
      ("B", "C"), ("B", "C"), ("B", "C"),
      ("A", "C"), ("A", "C"), ("A", "C"),
      ("C", "A") // one upset — strengths still ordered
    ).toDF("winner", "loser")
    val w = Preferences.bradleyTerry(duels, iters = 3)
      .select("item", "w_micro", "rk")
      .as[(String, Long, Int)].collect().sortBy(_._3)
    assert(w.map(_._1).toSeq == Seq("A", "B", "C"),
      s"dominance order: ${w.toSeq}")
    assert(w(0)._2 > w(1)._2 && w(1)._2 > w(2)._2, s"strict strengths: ${w.toSeq}")
    // exact-sum contract: any input partitioning yields the same iterates
    val w2 = Preferences.bradleyTerry(duels.repartition(7), iters = 3)
      .select("item", "w_micro", "rk")
      .as[(String, Long, Int)].collect().sortBy(_._3)
    assert(w.toSeq == w2.toSeq, "partitioning must not change the fit")
  }

  test("rankingMetrics: perfect ranking scores 1.0, no-relevant scores 0, mixed in between") {
    import spark.implicits._
    // 2D embeddings: label 0 clusters near (1, 0), label 1 near (0, 1).
    // Query 0 (label 0) has its 3 same-label vectors closer than every
    // label-1 vector -> perfect top-k; query 1 (label 2, singleton)
    // has NO same-label rows -> all-zero metrics.
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (1L, Array(0.1f, 1.0f), 2),
      (5L, Array(0.9f, 0.1f), 0), (6L, Array(0.8f, 0.2f), 0),
      (7L, Array(0.7f, 0.3f), 0),
      (8L, Array(0.0f, 1.0f), 1), (9L, Array(0.1f, 0.9f), 1))
      .toDF("vec_id", "embedding", "label")
    val m = graft.ext.Similarity.rankingMetrics(emb, k = 3, numQueries = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    // query 0: 3 relevant of 3 slots, R = 3 -> idcg == dcg -> all 1.0
    assert(m(0L) == ((3L, 1.0, 1.0, 1.0)), s"got ${m(0L)}")
    // query 1: zero relevant anywhere
    assert(m(1L) == ((0L, 0.0, 0.0, 0.0)), s"got ${m(1L)}")
  }

  test("kmv: duplicate-insensitive, exact when unsaturated, shards fold to the whole") {
    import spark.implicits._
    val keys = (1 to 500).map(i => ("g", s"key$i")).toDF("grp", "key")
    val k = 64
    val sk = Sketches.kmvSketchBy(keys, "grp", "key", k)
    val hs = sk.select("hs").as[Seq[Long]].head()
    assert(hs.size == k && hs == hs.sorted && hs.distinct.size == k,
      "sketch must be k distinct ascending hashes")
    // duplicates are TreeSet no-ops
    val dup = keys.unionAll(keys).unionAll(keys)
    assert(Sketches.kmvSketchBy(dup, "grp", "key", k)
      .select("hs").as[Seq[Long]].head() == hs,
      "duplicates changed the sketch")
    // shard fold: sketch of (sketch(A) ∪ sketch(B)) == sketch of A∪B
    val hsA = Sketches.kmvSketchBy(keys.filter($"key" < "key3"),
      "grp", "key", k).select("hs").as[Seq[Long]].head()
    val hsB = Sketches.kmvSketchBy(keys.filter($"key" >= "key3"),
      "grp", "key", k).select("hs").as[Seq[Long]].head()
    assert((hsA ++ hsB).distinct.sorted.take(k) == hs,
      "bottom-k of shard-sketch union must equal the whole-corpus sketch")
    // estimate: saturated branch lands near truth (deterministic seed)
    val est = sk.select(Sketches.kmvEstimate($"hs", k)).as[Double].head()
    assert(math.abs(est - 500) < 150, s"KMV estimate $est for 500 keys")
    // unsaturated branch is EXACT
    val small = (1 to 20).map(i => ("g", s"key$i")).toDF("grp", "key")
    val estSmall = Sketches.kmvSketchBy(small, "grp", "key", k)
      .select(Sketches.kmvEstimate($"hs", k)).as[Double].head()
    assert(estSmall == 20.0, s"unsaturated estimate must be exact: $estSmall")
  }

  test("kmvOverlap: unsaturated pairs give exact set algebra, saturated stay near truth") {
    import spark.implicits._
    val k = 64
    // A = 1..30, B = 16..45: |A|=30 |B|=30 |A∩B|=15 |A∪B|=45 — all < k
    val df = ((1 to 30).map(i => ("A", s"u$i")) ++
      (16 to 45).map(i => ("B", s"u$i"))).toDF("grp", "key")
    val sk = Sketches.kmvSketchBy(df, "grp", "key", k)
    val row = Sketches.kmvOverlap(sk, "grp", k).collect().head
    assert(row.getAs[String]("grp_a") == "A" && row.getAs[String]("grp_b") == "B")
    assert(row.getAs[Double]("est_a") == 30.0 && row.getAs[Double]("est_b") == 30.0)
    assert(row.getAs[Double]("est_union") == 45.0)
    assert(row.getAs[Double]("est_inter") == 15.0,
      s"unsaturated intersection must be exact: $row")
    // all-null-key groups: empty sketches degrade to exact 0.0 across
    // the board, never a 0/0 null
    val nulls = Seq(("A", null: String), ("B", null: String)).toDF("grp", "key")
    val zRow = Sketches.kmvOverlap(
      Sketches.kmvSketchBy(nulls, "grp", "key", k), "grp", k).collect().head
    assert(zRow.getAs[Double]("est_union") == 0.0 &&
      zRow.getAs[Double]("est_inter") == 0.0, s"empty-sketch pair: $zRow")
    // saturated: 600 vs 600 with 300 shared — estimates within 35%
    val big = ((1 to 600).map(i => ("A", s"u$i")) ++
      (301 to 900).map(i => ("B", s"u$i"))).toDF("grp", "key")
    val bigRow = Sketches.kmvOverlap(
      Sketches.kmvSketchBy(big, "grp", "key", k), "grp", k).collect().head
    val eu = bigRow.getAs[Double]("est_union")
    val ei = bigRow.getAs[Double]("est_inter")
    assert(math.abs(eu - 900) < 315, s"union estimate $eu for 900")
    assert(math.abs(ei - 300) < 150, s"intersection estimate $ei for 300")
  }

  test("entityResolution: typo variants collapse transitively, strangers stay apart") {
    import spark.implicits._
    val recs = Seq(
      (1L, "Acme Corp #001122"),       // clean
      (2L, "Acme Corpp #001122"),      // insertion, dist 1 from clean
      (3L, "Acme Crp #001122"),        // deletion, dist 1 from clean, 2 from rec 2
      (4L, "  ACME CORP #001122  "),   // case/space noise, dist 0
      (5L, "Zenith Ltd #001122"),      // same strong key, far letters
      (6L, "Acme Corp #009988"),       // same letters, different strong key
      (7L, "No Digits Here")           // empty strong key -> singleton
    ).toDF("record_id", "name")
    val out = EntityResolution.resolve(recs).as[(Long, Long)].collect().toMap
    // 2 and 3 are edit distance 2 apart — linked only THROUGH 1
    assert(Seq(1L, 2L, 3L, 4L).forall(out(_) == 1L), s"family broken: $out")
    assert(out(5L) == 5L && out(6L) == 6L && out(7L) == 7L)
  }

  test("sorted-neighborhood ER: equals blocking on keyed records, links keyless ones") {
    import spark.implicits._
    val keyed = Seq(
      (1L, "Acme Corp #001122"), (2L, "Acme Corpp #001122"),
      (3L, "  ACME CORP #001122 "), (4L, "Zenith Ltd #009988"),
      (5L, "Zenith Ltdd #009988"), (6L, "Solo Vendor #777000"))
      .toDF("record_id", "name")
    val byBlock = EntityResolution.resolve(keyed)
      .as[(Long, Long)].collect().toMap
    val bySn = EntityResolution.resolveSortedNeighborhood(keyed, window = 8)
      .as[(Long, Long)].collect().toMap
    assert(bySn == byBlock,
      s"window covering each key group must reproduce blocking: $bySn vs $byBlock")
    // keyless family: blocking leaves singletons, SN links the twins
    val keyless = keyed.unionAll(Seq(
      (7L, "zz plain name"), (8L, "zz plain namex")).toDF("record_id", "name"))
    val b2 = EntityResolution.resolve(keyless).as[(Long, Long)].collect().toMap
    assert(b2(7L) == 7L && b2(8L) == 8L, "blocking cannot see keyless records")
    val s2 = EntityResolution.resolveSortedNeighborhood(keyless, window = 8)
      .as[(Long, Long)].collect().toMap
    assert(s2(7L) == 7L && s2(8L) == 7L, s"SN must link the keyless twins: $s2")
  }

  test("entityResolution: oversized blocks are never compared pairwise") {
    import spark.implicits._
    // 5 identical-letter records share one strong key; cap at 4 blocks
    // nothing links, every record resolves to itself
    val recs = (1L to 5L).map(i => (i, s"Same Name #42")).toDF("record_id", "name")
    val out = EntityResolution.resolve(recs, maxBlock = 4)
      .as[(Long, Long)].collect().toMap
    assert((1L to 5L).forall(i => out(i) == i), s"block cap ignored: $out")
    // and with the cap lifted they all merge
    val merged = EntityResolution.resolve(recs, maxBlock = 64)
      .as[(Long, Long)].collect().toMap
    assert((1L to 5L).forall(i => merged(i) == 1L), s"expected one entity: $merged")
  }

  test("blocklistScreen: Aho–Corasick finds overlapping/nested patterns") {
    import spark.implicits._
    // classic AC stress set: "he" ends inside "she", "hers" extends
    // "he"; "ushers" fires she+he+hers at overlapping offsets
    val pats = Seq("he", "she", "hers", "his")
    val rows = Seq(
      (1L, "ushers"), (2L, "this"), (3L, "xyz"), (4L, "hehehers"),
      (5L, ""), (6L, "sh")).toDF("doc_id", "text")
    val got = TextAnalysis.blocklistScreen(rows, pats)
      .orderBy("doc_id")
      .select("doc_id", "matched_csv", "keep")
      .as[(Long, String, Boolean)].collect().toSeq
    assert(got == Seq(
      (1L, "he,she,hers", false),
      (2L, "his", false),
      (3L, "", true),
      (4L, "he,hers", false),
      (5L, "", true),
      (6L, "", true)), s"got $got")
  }

  test("blocklistScreen ≡ per-term contains() on the corpus vocabulary") {
    import spark.implicits._
    // brute-force witness over arbitrary texts incl. pattern suffixes/
    // prefixes straddling word boundaries and repeated-byte runs
    val pats = Seq("ab", "aba", "bab", "ca t", "t c", "zzz")
    val rnd = new scala.util.Random(7)
    val alphabet = "abc tz"
    val texts = (1L to 60L).map { i =>
      (i, (0 until rnd.nextInt(24)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    val df = texts.toDF("doc_id", "text")
    val got = TextAnalysis.blocklistScreen(df, pats)
      .select("doc_id", "matched_csv").as[(Long, String)].collect().toMap
    texts.foreach { case (id, t) =>
      val want = pats.filter(t.contains(_)).mkString(",")
      assert(got(id) == want, s"doc $id text '$t': got ${got(id)} want $want")
    }
  }

  test("blocklistScreen: case-insensitive, multi-byte safe, null text") {
    import spark.implicits._
    val rows = Seq((1L, "The FAST path"), (2L, "café fast"),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = TextAnalysis.blocklistScreen(rows, Seq("Fast", "café"))
      .orderBy("doc_id")
      .select("doc_id", "matched_csv", "keep")
      .as[(Long, String, Boolean)].collect().toSeq
    // null text ≡ empty text: no matches, keep = true (never a null
    // gate that would drop the doc from both filter branches)
    assert(got == Seq((1L, "fast", false), (2L, "fast,café", false),
      (3L, "", true)), s"got $got")
  }

  test("jlTopK with a corpus-wide shortlist ≡ exact brute-force top-k") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val emb = (0L until 40L).map(i =>
      (i, (0 until 16).map(_ => rnd.nextDouble() - 0.5).map(_.toFloat))).toDF("vec_id", "embedding")
    val exact = Similarity.bruteForceTopK(emb, k = 5, numQueries = 3)
      .as[(Long, Long, Double, Int)].collect().toSet
    val jl = Similarity.jlTopK(emb, k = 5, numQueries = 3, outDim = 4,
      shortlist = 64)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(jl == exact, "rerank over the full corpus must be exactly brute force")
    // a narrow shortlist still returns k ranked exact-cosine rows per query
    val narrow = Similarity.jlTopK(emb, k = 5, numQueries = 3, outDim = 4,
      shortlist = 8).as[(Long, Long, Double, Int)].collect()
    assert(narrow.length == 15)
    val exactByPair = exact.map(r => (r._1, r._2) -> r._3).toMap
    narrow.foreach { case (q, n, cs, _) =>
      exactByPair.get((q, n)).foreach(e =>
        assert(e == cs, s"reranked cosine must be the exact cosine for ($q,$n)")) }
  }

  test("Poisson bootstrap: point inside CI, partition-independent, E[w] = 1") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val rows = (1L to 2000L).map(i =>
      (i, if (i % 2 == 0) "g1" else "g2", 100.0 + rnd.nextGaussian() * 10))
    def run(parts: Int) = Bootstrap.poissonMeanCI(
        rows.toDF("id", "g", "v").repartition(parts), "g",
        round(col("v") * 100, 0), "id", b = 50, loRank = 2, hiRank = 49)
      .select("g", "n", "point_milli", "lo_milli", "hi_milli")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    val a = run(1)
    assert(a == run(8), "CI must not depend on partitioning")
    a.foreach { case (g, n, pt, lo, hi) =>
      assert(n == 1000)
      assert(lo <= pt && pt <= hi, s"$g: point $pt outside [$lo, $hi]")
      // true mean 100.00 (=10_000_000 centi-milli): the ~95% interval
      // on n=1000, sd=10 is ±~0.6 — generous 3x head-room bound
      assert(math.abs(pt - 10000000L) < 200000L, s"$g point far off: $pt")
      assert(hi - lo < 400000L && hi - lo > 20000L,
        s"$g interval width implausible: ${hi - lo}")
    }
    // the 60-bit thresholds encode Poisson(1): mean multiplicity ≈ 1
    val ws = (1 to 20000).map { i =>
      val hv = {
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(s"wcheck|$i".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(15)
        java.lang.Long.parseLong(hex, 16)
      }
      Bootstrap.thresholds60.count(hv >= _)
    }
    val meanW = ws.sum.toDouble / ws.size
    assert(math.abs(meanW - 1.0) < 0.03, s"E[w] drifted: $meanW")
    assert(ws.count(_ == 0) > 6000 && ws.count(_ == 0) < 8500,
      s"P(w=0) should be ~e^-1: ${ws.count(_ == 0)}")
  }

  test("URL canonicalization: hand-checked rules and idempotence") {
    import spark.implicits._
    val cases = Seq(
      (1L, "HTTP://Example.COM:80/A/b?utm_source=t&x=2&a=1#sec",
        "http://example.com/A/b?a=1&x=2", "example.com"),
      (2L, "https://www.Shop.co.uk:443/p?fbclid=1",
        "https://www.shop.co.uk/p", "shop.co.uk"),
      (3L, "http://a.b.site.com/q", "http://a.b.site.com/q", "site.com"),
      (4L, "https://single.com:443", "https://single.com", "single.com"),
      (5L, "http://x.com/p?utm_a=1&utm_b=2", "http://x.com/p", "x.com"),
      (6L, "http://deep.sub.example.com.au/z",
        "http://deep.sub.example.com.au/z", "example.com.au"))
    val out = WebOps.urlScreen(cases.map(c => (c._1, c._2)).toDF("doc_id", "url"))
      .select("doc_id", "canon_url", "domain")
      .as[(Long, String, String)].collect().sortBy(_._1)
    cases.zip(out).foreach { case ((id, _, wantCanon, wantDom), (gid, canon, dom)) =>
      assert(gid == id)
      assert(canon == wantCanon, s"case $id canon: got $canon want $wantCanon")
      assert(dom == wantDom, s"case $id domain: got $dom want $wantDom")
    }
    // canonicalization is idempotent: canon(canon(u)) == canon(u)
    val twice = WebOps.urlScreen(
      out.map(r => (r._1, r._2)).toSeq.toDF("doc_id", "url"))
      .select("doc_id", "canon_url").as[(Long, String)].collect().sortBy(_._1)
    out.zip(twice).foreach { case ((_, c1, _), (_, c2)) =>
      assert(c1 == c2, s"not idempotent: $c1 -> $c2") }
  }

  test("HTML main content: link-dense blocks drop, prose survives, entities decode") {
    import spark.implicits._
    val page = "<html><body>" +
      "<nav><a href=\"/\">Home</a> <a href=\"/x\">Links only</a></nav>" +
      "<p>This is the real article text, clearly long enough.</p>" +
      "<div><a href=\"/a\">tiny</a> mostly prose around a small link " +
      "that should survive the density gate easily</div>" +
      "<p>Fish &amp; chips &lt;3 say &amp;lt; literally</p>" +
      "<footer><a href=\"/t\">T</a><a href=\"/p\">P</a></footer>" +
      "</body></html>"
    val out = WebOps.htmlMainContent(Seq((1L, page)).toDF("doc_id", "html"))
      .select("n_blocks", "n_kept", "main_text")
      .as[(Int, Int, String)].head()
    assert(out._1 == 5, s"blocks: $out")
    assert(out._2 == 3, s"kept: $out")
    val parts = out._3.split("\n")
    assert(parts(0) == "This is the real article text, clearly long enough.")
    assert(parts(1).startsWith("tiny mostly prose"))
    // &amp;lt; is the literal text "&lt;" — amp decodes LAST, so it
    // must NOT double-decode to "<"
    assert(parts(2) == "Fish & chips <3 say &lt; literally",
      s"entity decode: ${parts(2)}")
  }

  test("FreqItemsAgg at never-evicting capacity ≡ exact counts (any partitioning)") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val rows = (1 to 3000).map(i =>
      (s"g${i % 2}", s"item${rnd.nextInt(40)}"))
    val truth = rows.groupBy(identity).map { case ((g, it), v) => (g, it, v.size.toLong) }
    def run(parts: Int) = rows.toDF("g", "item").repartition(parts)
      .groupBy("g")
      .agg(graft.expressions.FreqItemsAgg.freqItems(col("item"), 4096, 1000).as("top"))
      .select(col("g"), explode(col("top")).as("e"))
      .select(col("g"), col("e.item"), col("e.cnt"))
      .as[(String, String, Long)].collect().toSet
    val one = run(1)
    assert(one == truth.toSet, "ample capacity must give exact counts")
    assert(run(8) == one, "result must not depend on partitioning")
  }

  test("FreqItemsAgg under eviction keeps the Misra–Gries guarantees") {
    import spark.implicits._
    // skewed stream: 'hh' appears 400×, 60 noise items ≤ 20× each
    val rows = (Seq.fill(400)("hh") ++
      (1 to 60).flatMap(i => Seq.fill(1 + i % 20)(s"n$i")))
    val n = rows.size.toLong
    val truth = rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val cap = 16
    for (parts <- Seq(1, 8)) {
      val got = rows.map(("g", _)).toDF("g", "item").repartition(parts)
        .groupBy("g")
        .agg(graft.expressions.FreqItemsAgg.freqItems(col("item"), cap, cap).as("top"))
        .select(explode(col("top")).as("e"))
        .select(col("e.item"), col("e.cnt"))
        .as[(String, Long)].collect().toMap
      assert(got.size <= cap)
      // counts never overestimate, and underestimate by ≤ n/(cap+1)
      got.foreach { case (it, c) =>
        assert(c <= truth(it), s"$it overestimated: $c > ${truth(it)} (parts=$parts)")
        assert(truth(it) - c <= n / (cap + 1),
          s"$it under by more than n/(cap+1) (parts=$parts)") }
      // every truly-frequent item (count > n/(cap+1)) must be present
      truth.filter(_._2 > n / (cap + 1)).keys.foreach(k =>
        assert(got.contains(k), s"frequent item $k missing (parts=$parts)"))
    }
  }

  test("rakeKeyphrases: stopword-bounded phrases, deg/freq word scores, deterministic top-k") {
    import spark.implicits._
    // "and"/"the" ∈ EnStop split phrases; "apple" appears in two
    // 2-token phrases → freq 2, deg 4 → score 2e6; every single-count
    // word in a 2-token phrase scores 2e6
    val docs = Seq(Doc(1L, "red apple and green apple"),
      Doc(2L, "the sort merge join")).toDF()
    val out = TextAnalysis.rakeKeyphrases(docs)
      .as[(Long, String, Long, Int)].collect().toSet
    assert(out == Set(
      (1L, "green apple", 4000000L, 1),
      (1L, "red apple", 4000000L, 2), // tie → phrase asc
      (2L, "sort merge join", 9000000L, 1)))
  }

  test("readability: hand-computed FK counts and grades") {
    import spark.implicits._
    // "the cat sat. it ran away!" → 6 words, 2 sentences, syllables:
    // the(1) cat(1) sat.(1) it(1) ran(1) away!(2: a, ay) = 7
    val out = TextAnalysis.readability(
      Seq((1L, "the cat sat. it ran away!"), (2L, "zzz")).toDF("doc_id", "text"))
      .as[(Long, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L)._2 == 6L && out(1L)._3 == 2L && out(1L)._4 == 7L,
      s"${out(1L)}")
    val fk = 0.39 * 6.0 / 2.0 + 11.8 * 7.0 / 6.0 - 15.59
    assert(math.abs(out(1L)._5 - BigDecimal(fk)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    // no [aeiouy] at all → syllable floor of 1 per word; no terminator
    // → sentence floor of 1
    assert(out(2L)._2 == 1L && out(2L)._3 == 1L && out(2L)._4 == 1L)
  }

  test("readabilityExtended: hand-computed fog, SMOG, Coleman-Liau") {
    import spark.implicits._
    // "The cat sat. Amazing elephants everywhere!" -> 6 words,
    // 2 sentences, complex (3+ vowel groups): amazing(a,a,i),
    // elephants(e,e,a), everywhere(e,e,y,e,e) = 3; letters = 35
    val out = TextAnalysis.readabilityExtended(
      Seq((1L, "The cat sat. Amazing elephants everywhere!"),
        (2L, "zzz")).toDF("doc_id", "text"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val d1 = out(1L)
    assert(d1.getAs[Long]("n_words") == 6L &&
      d1.getAs[Long]("n_sentences") == 2L)
    assert(d1.getAs[Long]("n_complex") == 3L, s"$d1")
    assert(d1.getAs[Long]("n_letters") == 35L)
    // fog = 0.4·(6/2 + 100·3/6) = 21.2 exactly
    assert(d1.getAs[Double]("fog") == 21.2)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(d1.getAs[Double]("smog") ==
      r6(1.0430 * math.sqrt(45.0) + 3.1291))
    assert(d1.getAs[Double]("coleman_liau") ==
      r6(0.0588 * 3500.0 / 6.0 - 0.296 * 200.0 / 6.0 - 15.8))
    // vowel-free text: no complex words, SMOG floors at its intercept
    val d2 = out(2L)
    assert(d2.getAs[Long]("n_complex") == 0L &&
      d2.getAs[Long]("n_letters") == 3L)
    assert(d2.getAs[Double]("fog") == 0.4)
    assert(d2.getAs[Double]("smog") == 3.1291)
  }

  test("trainQualityLr learns a planted separable signal and replays deterministically") {
    import spark.implicits._
    // positives all contain the bigram "good stuff", negatives "bad
    // stuff" — a perfectly separable signal the trained weights must
    // pick up (y is balanced, so the base rate is 0.5)
    val docs = (0 until 30).map { i =>
      val y = i % 2
      val txt = if (y == 1) s"doc $i has good stuff inside"
        else s"doc $i has bad stuff inside"
      (i.toLong, txt, y.toLong)
    }.toDF("doc_id", "text", "y")
    val (w, stepDiv) = Curation.trainQualityLr(docs, "y", iters = 8)
    assert(stepDiv >= 1L)
    val scored = Curation.lrMargins(docs, w)
      .join(docs.select(col("doc_id"), col("y")), Seq("doc_id"))
    val acc = scored.filter((col("y") === 1L) === col("pred")).count()
      .toDouble / 30.0
    assert(acc == 1.0, s"separable signal must be learned, got $acc")
    // bit-determinism: retraining reproduces the identical weight table
    val (w2, _) = Curation.trainQualityLr(docs, "y", iters = 8)
    assert(w.collect().toSet == w2.collect().toSet)
    graft.ext.Checkpoints.releaseAll(spark)
  }

  test("mixDiversity: uniform vs concentrated mixtures") {
    import spark.implicits._
    // 4 equal groups: entropy ln 4, eff_n 4, hhi 0.25, gini 0
    val uniform = (0 until 40).map(i => (i.toLong, s"s${i % 4}"))
      .toDF("doc_id", "source")
    val u = Curation.mixDiversity(uniform).head()
    assert(u.getAs[Long]("n_groups") == 4L && u.getAs[Long]("n_docs") == 40L)
    assert(math.abs(u.getAs[Double]("entropy") - math.log(4.0)) < 1e-5)
    assert(math.abs(u.getAs[Double]("eff_n") - 4.0) < 1e-5)
    assert(u.getAs[Double]("hhi") == 0.25)
    assert(u.getAs[Double]("gini") == 0.0)
    // 1 dominant + 3 tiny: entropy well below ln 4, hhi near 1, gini high
    val skewed = ((0 until 37).map(i => (i.toLong, "big")) ++
      Seq((100L, "a"), (101L, "b"), (102L, "c")))
      .toDF("doc_id", "source")
    val s = Curation.mixDiversity(skewed).head()
    assert(s.getAs[Double]("entropy") < 0.5)
    assert(s.getAs[Double]("hhi") > 0.8)
    assert(s.getAs[Double]("gini") > 0.6)
    // single group: gini guard 0, eff_n 1
    val one = Seq((1L, "only"), (2L, "only")).toDF("doc_id", "source")
    val o = Curation.mixDiversity(one).head()
    assert(o.getAs[Double]("gini") == 0.0 && o.getAs[Double]("eff_n") == 1.0)
  }

  test("rankCorrelation: perfect agreement, inversion, and tie handling") {
    import spark.implicits._
    val agree = Seq(("g", 1L, 10L, 1L), ("g", 2L, 20L, 2L),
      ("g", 3L, 30L, 3L), ("g", 4L, 40L, 4L))
      .toDF("grp", "id", "x", "y")
    val a = Evaluation.rankCorrelation(agree, "grp", "id", "x", "y")
      .select("spearman_rho", "kendall_tau_b")
      .as[(Double, Double)].head()
    assert(a == ((1.0, 1.0)))
    val invert = Seq(("g", 1L, 10L, 4L), ("g", 2L, 20L, 3L),
      ("g", 3L, 30L, 2L), ("g", 4L, 40L, 1L))
      .toDF("grp", "id", "x", "y")
    val b = Evaluation.rankCorrelation(invert, "grp", "id", "x", "y")
      .select("spearman_rho", "kendall_tau_b")
      .as[(Double, Double)].head()
    assert(b == ((-1.0, -1.0)))
    // all-x-tied group: ρ and τ-b guard to 0, never NaN
    val tied = Seq(("g", 1L, 5L, 1L), ("g", 2L, 5L, 2L), ("g", 3L, 5L, 3L))
      .toDF("grp", "id", "x", "y")
    val c = Evaluation.rankCorrelation(tied, "grp", "id", "x", "y")
      .select("spearman_rho", "kendall_tau_b")
      .as[(Double, Double)].head()
    assert(c == ((0.0, 0.0)))
  }

  test("abTest: hand-computed pooled z; empty-arm guard") {
    import spark.implicits._
    // arm 0: 2/4 convert; arm 1: 1/4 convert
    val rows = Seq((0L, 1L), (0L, 1L), (0L, 0L), (0L, 0L),
      (1L, 1L), (1L, 0L), (1L, 0L), (1L, 0L))
      .map { case (arm, c) => ("m", arm, c) }.toDF("grp", "arm", "conv")
    val r = Evaluation.abTest(rows, "grp", "arm", "conv").head()
    assert(r.getAs[Long]("n_a") == 4L && r.getAs[Long]("conv_b") == 1L)
    val p = 3.0 / 8.0
    val z = (0.5 - 0.25) / math.sqrt(p * (1 - p) * (1.0 / 4 + 1.0 / 4))
    assert(math.abs(r.getAs[Double]("z") -
      BigDecimal(z).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    val oneArm = Seq(("m", 0L, 1L)).toDF("grp", "arm", "conv")
    assert(Evaluation.abTest(oneArm, "grp", "arm", "conv")
      .head().getAs[Double]("z") == 0.0)
  }

  test("mcnemar: hand-computed discordance cells and corrected chi-square") {
    import spark.implicits._
    // y always true: A right ×4 with B right, A right B wrong ×3,
    // A wrong B right ×1, both wrong ×2 → χ² = (|3−1|−1)²/4 = 0.25
    val rows = (Seq.fill(4)((true, true)) ++ Seq.fill(3)((true, false)) ++
      Seq((false, true)) ++ Seq.fill(2)((false, false)))
      .map { case (a, b) => ("g", true, a, b) }
      .toDF("group", "y", "pred_a", "pred_b")
    val r = Evaluation.mcnemar(rows).head()
    assert(r.getAs[Long]("n") == 10L && r.getAs[Long]("n_both") == 4L &&
      r.getAs[Long]("n01") == 3L && r.getAs[Long]("n10") == 1L &&
      r.getAs[Long]("n_neither") == 2L)
    assert(r.getAs[Double]("chi2_cc") == 0.25)
    // zero discordance → statistic 0, not NaN
    val same = Seq(("g", true, true, true))
      .toDF("group", "y", "pred_a", "pred_b")
    assert(Evaluation.mcnemar(same).head().getAs[Double]("chi2_cc") == 0.0)
  }

  test("fairnessReport: hand-computed rates and gaps; degenerate groups report 0") {
    import spark.implicits._
    // group a: n=4 pos=2 sel=2 tp=1 fp=1; group b: n=2 pos=1 sel=0
    val rows = Seq(
      ("a", true, true), ("a", true, false), ("a", false, true),
      ("a", false, false),
      ("b", true, false), ("b", false, false))
      .toDF("group", "y", "pred")
    val m = Evaluation.fairnessReport(rows).collect()
      .map(r => r.getAs[String]("grp") -> r).toMap
    assert(m("a").getAs[Double]("sel_rate") == 0.5 &&
      m("a").getAs[Double]("tpr") == 0.5 && m("a").getAs[Double]("fpr") == 0.5)
    assert(m("b").getAs[Double]("sel_rate") == 0.0 &&
      m("b").getAs[Double]("tpr") == 0.0 && m("b").getAs[Double]("fpr") == 0.0)
    // overall: sel 2/6, tpr 1/3, fpr 1/3
    def r6(x: Double) = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(m("a").getAs[Double]("dp_gap") == r6(0.5 - 2.0 / 6.0))
    assert(m("b").getAs[Double]("tpr_gap") == r6(0.0 - 1.0 / 3.0))
    // all-positive group: FPR denominator is 0 → reported 0
    val allPos = Seq(("c", true, true)).toDF("group", "y", "pred")
    assert(Evaluation.fairnessReport(allPos).head().getAs[Double]("fpr") == 0.0)
    graft.ext.Checkpoints.releaseAll(spark)
  }

  test("pcaPower: axis-aligned variance finds the axis; rank-1 space reads collapsed") {
    import spark.implicits._
    // variance 4 on axis 0, 1 on axis 1, uncorrelated → pc1 = ±e0,
    // explained = 4/5
    val axis = Seq((1L, Seq(2.0f, 0.0f)), (2L, Seq(-2.0f, 0.0f)),
      (3L, Seq(0.0f, 1.0f)), (4L, Seq(0.0f, -1.0f)))
      .toDF("vec_id", "embedding")
    val a = Similarity.pcaPower(axis).collect()
      .map(r => r.getAs[Int]("d") -> r).toMap
    assert(a.values.forall(_.getAs[Long]("mu_micro") == 0L))
    assert(math.abs(math.abs(a(0).getAs[Double]("pc1")) - 1.0) < 1e-4, s"$a")
    assert(math.abs(a(1).getAs[Double]("pc1")) < 1e-4, s"$a")
    assert(math.abs(a(0).getAs[Double]("explained") - 0.8) < 1e-3, s"$a")
    // rank-1 (collapsed) space: every vector on the (0.6, 0.8) ray →
    // explained ≈ 1 and the component reproduces the ray's direction
    val ray = (1L to 4L).map(k =>
        (k, Seq(0.6f * k, 0.8f * k))).toDF("vec_id", "embedding")
    val c = Similarity.pcaPower(ray).collect()
      .map(r => r.getAs[Int]("d") -> r).toMap
    assert(c(0).getAs[Double]("explained") > 0.9999, s"$c")
    val (p0, p1) = (c(0).getAs[Double]("pc1"), c(1).getAs[Double]("pc1"))
    assert(math.abs(p1 / p0 - 0.8 / 0.6) < 1e-5, s"ray direction: $p0 $p1")
    assert(math.abs(math.sqrt(p0 * p0 + p1 * p1) - 1.0) < 1e-6, "unit norm")
    // degenerate inputs (effectiveRank's guarded convention): a
    // single vector and a constant table both have an all-zero
    // covariance — the guard pins pc1=0/eig=0/explained=0, never NaN
    val single = Seq((1L, Seq(0.3f, 0.4f))).toDF("vec_id", "embedding")
    val s = Similarity.pcaPower(single).collect()
    assert(s.length == 2 && s.forall(r =>
      r.getAs[Double]("pc1") == 0.0 && r.getAs[Double]("eig") == 0.0 &&
        r.getAs[Double]("explained") == 0.0), s"single: ${s.mkString(",")}")
    val const = (1L to 3L).map(k => (k, Seq(0.5f, -0.5f)))
      .toDF("vec_id", "embedding")
    val cc = Similarity.pcaPower(const).collect()
    assert(cc.forall(r => r.getAs[Double]("pc1") == 0.0 &&
      r.getAs[Double]("eig") == 0.0 &&
      r.getAs[Double]("explained") == 0.0), s"const: ${cc.mkString(",")}")
    graft.ext.Checkpoints.releaseAll(spark)
  }

  test("didEstimate: hand-computed cells, effect, and z") {
    import spark.implicits._
    // arm0: 11→14 (trend +3); arm1: 21→29 (+8) → DiD = 5;
    // every cell var = 2, se = sqrt(4·(2/2)) = 2 → z = 2.5
    val rows = Seq(
      (0L, 0L, 10L), (0L, 0L, 12L), (0L, 1L, 13L), (0L, 1L, 15L),
      (1L, 0L, 20L), (1L, 0L, 22L), (1L, 1L, 28L), (1L, 1L, 30L))
      .map { case (a, p, y) => ("g", a, p, y) }
      .toDF("group", "arm", "period", "y_micro")
    val r = Evaluation.didEstimate(rows).head()
    assert(r.getAs[Double]("m00") == 11.0 && r.getAs[Double]("m11") == 29.0)
    assert(r.getAs[Double]("did_micro") == 5.0 && r.getAs[Double]("z") == 2.5,
      s"$r")
    // a missing cell drops the group; a single-row cell zeroes z
    assert(Evaluation.didEstimate(rows.filter(col("period") === 0))
      .count() == 0)
    val tiny = Seq(("g", 0L, 0L, 10L), ("g", 0L, 1L, 13L),
      ("g", 1L, 0L, 20L), ("g", 1L, 1L, 28L))
      .toDF("group", "arm", "period", "y_micro")
    assert(Evaluation.didEstimate(tiny).head().getAs[Double]("z") == 0.0)
  }

  test("cupedAdjust: a perfect covariate equalizes arms and removes all variance") {
    import spark.implicits._
    // y = x exactly → pooled theta = 1; the arm gap (2 vs 4) is pure
    // covariate imbalance, so both adjusted means land on the pooled
    // mean 3 and the variance reduction is total
    val rows = Seq(("all", 0L, 1L, 1L), ("all", 0L, 3L, 3L),
      ("all", 1L, 2L, 2L), ("all", 1L, 6L, 6L))
      .toDF("group", "arm", "y_micro", "x_micro")
    val m = Evaluation.cupedAdjust(rows).collect()
      .map(r => r.getAs[Long]("arm") ->
        (r.getAs[Double]("mean_y"), r.getAs[Double]("mean_adj"),
          r.getAs[Double]("theta"), r.getAs[Double]("var_reduction"))).toMap
    assert(m(0L) == ((2.0, 3.0, 1.0, 1.0)), s"$m")
    assert(m(1L) == ((4.0, 3.0, 1.0, 1.0)), s"$m")
    // a useless (constant) covariate: theta 0, nothing changes
    val const = Seq(("all", 0L, 1L, 7L), ("all", 0L, 3L, 7L),
      ("all", 1L, 2L, 7L), ("all", 1L, 6L, 7L))
      .toDF("group", "arm", "y_micro", "x_micro")
    val c = Evaluation.cupedAdjust(const).collect()
      .map(r => r.getAs[Long]("arm") ->
        (r.getAs[Double]("mean_adj"), r.getAs[Double]("var_reduction"))).toMap
    assert(c(0L) == ((2.0, 0.0)) && c(1L) == ((4.0, 0.0)), s"$c")
    graft.ext.Checkpoints.releaseAll(spark)
  }

  test("fdDiscovery: holds/violations by hand; null is a value") {
    import spark.implicits._
    // id→city holds; city→id fails with 1 extra value under 'NY';
    // a null city is a VALUE: id→city still holds (one value per id)
    val t = Seq((1L, "NY"), (2L, "NY"), (3L, "LA"),
      (4L, null.asInstanceOf[String]))
      .toDF("id", "city")
    val m = Curation.fdDiscovery(t, Seq("id", "city")).collect()
      .map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs")) ->
        (r.getAs[Long]("n_lhs"), r.getAs[Boolean]("holds"),
          r.getAs[Long]("violations"))).toMap
    assert(m(("id", "city")) == ((4L, true, 0L)), s"$m")
    // city values: NY→{1,2} (1 violation), LA→{3}, null→{4}
    assert(m(("city", "id")) == ((3L, false, 1L)), s"$m")
    // an rhs null must break an otherwise-clean FD
    val dirty = Seq((1L, "a"), (1L, null.asInstanceOf[String]))
      .toDF("k", "v")
    val d = Curation.fdDiscovery(dirty, Seq("k", "v")).collect()
      .map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs")) ->
        r.getAs[Boolean]("holds")).toMap
    assert(!d(("k", "v")), s"$d")
    // a genuine '__null__' STRING must not collide with a real NULL:
    // k=1 maps to the literal text and k=2 to NULL — two distinct rhs
    // values per... no: each k has ONE value, so k→v holds; and
    // v→k must see TWO lhs groups (the text and the null), not one
    val sentinel = Seq((1L, "__null__"), (2L, null.asInstanceOf[String]))
      .toDF("k", "v")
    val sv = Curation.fdDiscovery(sentinel, Seq("k", "v")).collect()
      .map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs")) ->
        (r.getAs[Long]("n_lhs"), r.getAs[Boolean]("holds"))).toMap
    assert(sv(("k", "v")) == ((2L, true)), s"$sv")
    assert(sv(("v", "k")) == ((2L, true)),
      s"the '__null__' text and a real NULL are distinct lhs groups: $sv")
  }

  test("effectiveRank: isotropic space scores dims, rank-1 scores 1, anisotropic between") {
    import spark.implicits._
    // equal variance both axes, uncorrelated → eff_rank = dims = 2
    val iso = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(-1.0f, 0.0f)),
      (3L, Seq(0.0f, 1.0f)), (4L, Seq(0.0f, -1.0f)))
      .toDF("vec_id", "embedding")
    assert(Similarity.effectiveRank(iso).head()
      .getAs[Double]("eff_rank") == 2.0)
    // variance 4 vs 1 → (4+1)²/(16+1) = 25/17
    val aniso = Seq((1L, Seq(2.0f, 0.0f)), (2L, Seq(-2.0f, 0.0f)),
      (3L, Seq(0.0f, 1.0f)), (4L, Seq(0.0f, -1.0f)))
      .toDF("vec_id", "embedding")
    assert(Similarity.effectiveRank(aniso).head()
      .getAs[Double]("eff_rank") == 1.470588)
    // every vector on one ray → rank 1 (cross terms make it exact)
    val ray = (1L to 4L).map(k =>
      (k, Seq(0.6f * k, 0.8f * k))).toDF("vec_id", "embedding")
    val r = Similarity.effectiveRank(ray).head().getAs[Double]("eff_rank")
    assert(math.abs(r - 1.0) < 1e-3, s"rank-1 space: $r")
    graft.ext.Checkpoints.releaseAll(spark)
  }

  test("delongTest: matches the pairwise brute force; identical models give z=0") {
    import spark.implicits._
    // mixed ties across classes on both scorers
    val ex = Seq( // (y, sa, sb)
      (1L, 5L, 2L), (1L, 3L, 7L), (1L, 3L, 4L),
      (0L, 3L, 4L), (0L, 1L, 1L), (0L, 6L, 2L))
    val df = ex.map { case (y, a, b) => ("g", y, a, b) }
      .toDF("group", "y", "score_a_micro", "score_b_micro")
    val r = Evaluation.delongTest(df).head()
    // brute force: per-example scaled structural components
    val pos = ex.filter(_._1 == 1L); val neg = ex.filter(_._1 == 0L)
    def v10(s: Long, f: ((Long, Long, Long)) => Long) =
      2L * neg.count(f(_) < s) + neg.count(f(_) == s)
    def v01(s: Long, f: ((Long, Long, Long)) => Long) =
      2L * pos.count(f(_) > s) + pos.count(f(_) == s)
    val (np, nn) = (pos.size.toLong, neg.size.toLong)
    val v10a = pos.map(p => v10(p._2, _._2)); val v10b = pos.map(p => v10(p._3, _._3))
    val v01a = neg.map(p => v01(p._2, _._2)); val v01b = neg.map(p => v01(p._3, _._3))
    def cov(xy: Long, x: Long, y: Long, n: Long, d: Long) =
      (xy.toDouble - x.toDouble * y.toDouble / n.toDouble) /
        (n.toDouble - 1.0) / (d.toDouble * d.toDouble)
    def sums(v: Seq[Long], w: Seq[Long]) =
      (v.sum, w.sum, v.map(x => x * x).sum, w.map(x => x * x).sum,
        v.zip(w).map { case (x, y) => x * y }.sum)
    val (sa10, sb10, saa10, sbb10, sab10) = sums(v10a, v10b)
    val (sa01, sb01, saa01, sbb01, sab01) = sums(v01a, v01b)
    val vd = (cov(saa10, sa10, sa10, np, 2 * nn) +
        cov(sbb10, sb10, sb10, np, 2 * nn) -
        2.0 * cov(sab10, sa10, sb10, np, 2 * nn)) / np.toDouble +
      (cov(saa01, sa01, sa01, nn, 2 * np) +
        cov(sbb01, sb01, sb01, nn, 2 * np) -
        2.0 * cov(sab01, sa01, sb01, nn, 2 * np)) / nn.toDouble
    def r6(x: Double) = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    val scale = (np * 2 * nn).toDouble
    assert(r.getAs[Double]("auc_a") == r6(sa10 / scale), s"$r")
    assert(r.getAs[Double]("auc_b") == r6(sb10 / scale), s"$r")
    assert(r.getAs[Double]("var_diff") == r6(vd), s"$r vs $vd")
    assert(r.getAs[Double]("z") ==
      r6(((sa10 - sb10).toDouble / scale) / math.sqrt(vd)), s"$r")
    // identical scorers: every paired component matches → var 0 → z 0
    val same = ex.map { case (y, a, _) => ("g", y, a, a) }
      .toDF("group", "y", "score_a_micro", "score_b_micro")
    val s = Evaluation.delongTest(same).head()
    assert(s.getAs[Double]("var_diff") == 0.0 && s.getAs[Double]("z") == 0.0)
    // degenerate class counts report z = 0, not NaN
    val onePos = Seq(("g", 1L, 5L, 2L), ("g", 0L, 3L, 4L), ("g", 0L, 1L, 1L))
      .toDF("group", "y", "score_a_micro", "score_b_micro")
    assert(Evaluation.delongTest(onePos).head().getAs[Double]("z") == 0.0)
    graft.ext.Checkpoints.releaseAll(spark)
  }

  test("conformalThreshold: k-th order statistic, tiny-set convention, measured coverage") {
    import spark.implicits._
    // cal scores 100..900 (n=9), α=10% → k = ⌈10·0.9⌉ = 9 → the 9th
    // smallest = 900; test [150, 850, 950] covers 2/3
    val rows = (1 to 9).map(i => ("g", "cal", i * 100L)) ++
      Seq(("g", "test", 150L), ("g", "test", 850L), ("g", "test", 950L))
    val r = Evaluation.conformalThreshold(
      rows.toDF("group", "split", "s_micro")).head()
    assert(r.getAs[Long]("n_cal") == 9L && r.getAs[Long]("k") == 9L &&
      r.getAs[Long]("threshold_micro") == 900L, s"$r")
    assert(r.getAs[Long]("n_test") == 3L && r.getAs[Long]("n_cov") == 2L &&
      r.getAs[Double]("coverage") == 0.666667, s"$r")
    // α=20% → k = ⌈10·0.8⌉ = 8 → threshold 800
    val r2 = Evaluation.conformalThreshold(
      rows.toDF("group", "split", "s_micro"), alphaPermille = 200).head()
    assert(r2.getAs[Long]("threshold_micro") == 800L, s"$r2")
    // n_cal = 3, α=10% → k = ⌈4·0.9⌉ = 4 > n → threshold pinned at
    // the domain max, coverage 1
    val tiny = Seq(("g", "cal", 10L), ("g", "cal", 20L), ("g", "cal", 30L),
      ("g", "test", 999999L)).toDF("group", "split", "s_micro")
    val t = Evaluation.conformalThreshold(tiny).head()
    assert(t.getAs[Long]("k") == 4L &&
      t.getAs[Long]("threshold_micro") == 1000000L &&
      t.getAs[Double]("coverage") == 1.0, s"$t")
    graft.ext.Checkpoints.releaseAll(spark)
  }

  test("krippendorffAlphaInterval: hand-computed units, exclusions, conventions") {
    import spark.implicits._
    // g: unit1 [1,3] → du = 2(2·10−16)/1 = 8; unit2 [2,2] → 0;
    // unit9 [5] single-rating → excluded. Totals: n=4, t1=8, t2=18,
    // den = 2(4·18−64) = 16, de = 16/3, α = 1 − 8/(16/3) = −0.5
    val ratings = Seq(
      ("g", 1L, 1L), ("g", 1L, 3L), ("g", 2L, 2L), ("g", 2L, 2L),
      ("g", 9L, 5L),
      ("h", 1L, 2L), ("h", 1L, 2L), ("h", 2L, 4L), ("h", 2L, 4L),
      ("z", 1L, 3L), ("z", 1L, 3L), ("z", 2L, 3L), ("z", 2L, 3L))
      .toDF("group", "item", "v")
    val m = Evaluation.krippendorffAlphaInterval(ratings).collect()
      .map(r => r.getAs[String]("grp") ->
        (r.getAs[Long]("n_items"), r.getAs[Long]("n_ratings"),
          r.getAs[Long]("do_micro"), r.getAs[Double]("alpha"))).toMap
    assert(m("g") == ((2L, 4L, 8000000L, -0.5)), s"$m")
    // perfect within-unit agreement across distinct unit values: α = 1
    assert(m("h")._4 == 1.0, s"$m")
    // every rating identical: De = 0 → α = 1 by convention
    assert(m("z") == ((2L, 4L, 0L, 1.0)), s"$m")
    // nominal α would punish g's 1-vs-3 split the same as 2-vs-3;
    // interval must punish a wider split MORE: widen unit1 to [1,5]
    val wide = Seq(("g", 1L, 1L), ("g", 1L, 5L), ("g", 2L, 2L), ("g", 2L, 2L))
      .toDF("group", "item", "v")
    val aWide = Evaluation.krippendorffAlphaInterval(wide)
      .head().getAs[Double]("alpha")
    val narrow = Seq(("g", 1L, 2L), ("g", 1L, 3L), ("g", 2L, 2L), ("g", 2L, 2L))
      .toDF("group", "item", "v")
    val aNarrow = Evaluation.krippendorffAlphaInterval(narrow)
      .head().getAs[Double]("alpha")
    assert(aWide < aNarrow, s"wide $aWide must score below narrow $aNarrow")
  }

  test("distinctNgrams: hand-computed cross-document type/occurrence counts") {
    import spark.implicits._
    // group g: "a b a b" + "a b" → uni 6/2, bi 4/2 ("a b"×3, "b a"),
    // tri 2/2; a one-token doc contributes only to n=1
    val docs = Seq(("g", "a b a b"), ("g", "a b"), ("h", "x"))
      .toDF("source", "text")
    val m = Curation.distinctNgrams(docs).collect()
      .map(r => (r.getAs[String]("grp"), r.getAs[Int]("n")) ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("n_distinct"),
          r.getAs[Double]("distinct_ratio"))).toMap
    assert(m(("g", 1)) == ((6L, 2L, 0.333333)), s"$m")
    assert(m(("g", 2)) == ((4L, 2L, 0.5)), s"$m")
    assert(m(("g", 3)) == ((2L, 2L, 1.0)), s"$m")
    assert(m(("h", 1)) == ((1L, 1L, 1.0)) && !m.contains(("h", 2)), s"$m")
  }

  test("confidentJoint: hand-computed thresholds, abstention, and the planted mislabel") {
    import spark.implicits._
    // thresholds: t_a = mean(0.9, 0.7) = 0.8; t_b = mean(0.8, 0.2) = 0.5
    // x1 → (a,a); x2 clears nothing → abstains; x3 → (b,b);
    // x4 is labeled b but p_a = 0.8 ≥ t_a → (b,a): the planted error
    val scores = Seq(
      (1L, "a", "a", 900000L), (1L, "a", "b", 100000L),
      (2L, "a", "a", 700000L), (2L, "a", "b", 300000L),
      (3L, "b", "a", 200000L), (3L, "b", "b", 800000L),
      (4L, "b", "a", 800000L), (4L, "b", "b", 200000L))
      .toDF("doc_id", "noisy", "cls", "p_micro")
    val m = Curation.confidentJoint(scores).collect()
      .map(r => (r.getAs[String]("noisy"), r.getAs[String]("pred")) ->
        (r.getAs[Long]("n"), r.getAs[Boolean]("off_diag"))).toMap
    assert(m == Map(("a", "a") -> ((1L, false)), ("b", "b") -> ((1L, false)),
      ("b", "a") -> ((1L, true))), s"$m")
    // exact-tie argmax goes to the lexicographic first class
    val tie = Seq(
      (1L, "a", "a", 500000L), (1L, "a", "b", 500000L),
      (2L, "b", "a", 500000L), (2L, "b", "b", 500000L))
      .toDF("doc_id", "noisy", "cls", "p_micro")
    val t = Curation.confidentJoint(tie).collect()
      .map(r => r.getAs[String]("noisy") -> r.getAs[String]("pred")).toMap
    assert(t == Map("a" -> "a", "b" -> "a"), s"$t")
  }

  test("lrCartography: majority label maps confident, contradicted duplicate cannot") {
    import spark.implicits._
    // 8 positives and 2 clean negatives are separable; doc 10 carries
    // the POSITIVE text with a negative label — same margins as the
    // positives, so its gold-probability is 1−σ(m): low confidence
    val docs = ((0L to 7L).map(i =>
        (i, "good great fine text sample", 1L)) ++ Seq(
        (8L, "bad awful poor text sample", 0L),
        (9L, "bad awful poor text sample", 0L),
        (10L, "good great fine text sample", 0L)))
      .toDF("doc_id", "text", "y")
    val m = Curation.lrCartography(docs, "y", iters = 12).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // invariants: micro probabilities and round counts in range
    m.values.foreach { r =>
      val c = r.getAs[Long]("conf_micro"); val v = r.getAs[Long]("var_micro")
      assert(c >= 0L && c <= 1000000L && v >= 0L &&
        r.getAs[Long]("n_correct") <= 12L)
      // region banding is a pure function of (conf, var)
      val want =
        if (v >= Curation.cartographyVarHiMicro) "ambiguous"
        else if (c >= Curation.cartographyConfHiMicro) "easy"
        else if (c <= Curation.cartographyConfLoMicro) "hard"
        else "middle"
      assert(r.getAs[String]("region") == want)
    }
    val conf0 = m(0L).getAs[Long]("conf_micro")
    val conf10 = m(10L).getAs[Long]("conf_micro")
    // identical text, opposite labels: per-round gold probs sum to 1
    // (up to the micro rounding), and the majority side wins
    assert(math.abs(conf0 + conf10 - 1000000L) <= 2L, s"$conf0 + $conf10")
    assert(conf0 > 500000L && conf10 < 500000L, s"$conf0 vs $conf10")
    // the clean negatives train well: more confident than the
    // contradicted duplicate
    assert(m(8L).getAs[Long]("conf_micro") > conf10)
    graft.ext.Checkpoints.releaseAll(spark)
  }

  test("fellegiSunter: field evidence sums to exact micro scores; thresholds cut decisions") {
    import spark.implicits._
    import graft.ext.EntityResolution.{FsField, fellegiSunter}
    val fields = Seq(FsField("nm", 0.95, 0.05, jwMin = 0.92),
      FsField("ad", 0.90, 0.01), FsField("ph", 0.90, 0.02))
    val Seq(nm, ad, ph) = fields
    val recs = Seq(
      (1L, "b", "acme corp", "1 main st", "555"),
      (2L, "b", "acme corpp", "1 main st", "555"),     // near-name twin
      (3L, "b", "zzz unrelated name", "9 elm av", "999"),
      (10L, "c", "solo record", "2 oak", "111"))
      .toDF("record_id", "blk", "nm", "ad", "ph")
    val out = fellegiSunter(recs, "blk", fields,
      upperMicro = 8000000L, lowerMicro = 0L)
      .as[(Long, Long, Long, String)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // (1,2): name JW('acme corp','acme corpp') ≥ .92, addr+phone equal
    val full = nm.agreeMicro + ad.agreeMicro + ph.agreeMicro
    assert(out((1L, 2L)) == ((full, "match")), s"${out((1L, 2L))} vs $full")
    // (1,3)/(2,3): all three fields disagree → deep negative
    val none = nm.disagreeMicro + ad.disagreeMicro + ph.disagreeMicro
    assert(out((1L, 3L)) == ((none, "nonmatch")))
    assert(out((2L, 3L)) == ((none, "nonmatch")))
    // singleton block yields no pair; weights are the exact driver
    // constants (log2 ratios in micro)
    assert(out.size == 3)
    assert(nm.agreeMicro == math.round(math.log(0.95 / 0.05) / math.log(2) * 1e6))
    // a mixed pair lands in review: name agrees, addr+phone disagree
    val mixed = Seq(
      (1L, "b", "acme corp", "1 main st", "555"),
      (2L, "b", "acme corp", "9 elm av", "999"))
      .toDF("record_id", "blk", "nm", "ad", "ph")
    val m = fellegiSunter(mixed, "blk", fields, 8000000L, -3000000L)
      .as[(Long, Long, Long, String)].collect().head
    assert(m._3 == nm.agreeMicro + ad.disagreeMicro + ph.disagreeMicro)
    assert(m._4 == "review", s"$m")
  }

  test("fellegiSunterEm recovers a planted agreement mixture") {
    import spark.implicits._
    import graft.ext.EntityResolution.{FsField, fellegiSunterEm}
    // 2 blocks of 10 records: ids 2t/2t+1 are twins agreeing on f1
    // unless t%3==0 (typo suffix) and on f2 unless t%4==0; strangers
    // never agree f1 (per-twin tokens) and mostly agree f2 (shared
    // 'E') — a clean two-class mixture EM must separate
    val recs2 = (0 until 20).map { k =>
      val twin = k / 2
      val f1 = s"t$twin" + (if (k % 2 == 1 && twin % 3 == 0) "x" else "")
      val f2 = if (k % 2 == 1 && twin % 4 == 0) "Q" + k else "E"
      (k.toLong, (k / 10).toString, f1, f2)
    }.toDF("record_id", "blk", "f1", "f2")
    val fields = Seq(FsField("f1", 0.8, 0.1), FsField("f2", 0.8, 0.3))
    val (fit, p) = fellegiSunterEm(recs2, "blk", fields, iters = 10)
    val byField = fit.map(f => (f._1, f._2, f._3)).map(t => t._1 -> t).toMap
    // 10 twin pairs in 90 total pairs; twins agree f1 at 6/10 (t%3),
    // f2 at 7/10 (t%4); strangers: f1 never, f2 mostly (both 'E')
    assert(p > 0.02 && p < 0.5, s"prevalence $p")
    // 90 pairs is a small sample — assert SEPARATION (match class
    // agrees far more than nonmatch), not the exact planted rates
    val (_, m1, u1) = byField("f1")
    assert(m1 > 0.2 && m1 > 4 * u1, s"f1 fit ($m1, $u1)")
    val (_, m2, u2) = byField("f2")
    assert(m2 > 0.5, s"f2 fit ($m2, $u2)")
    // determinism: a second run reproduces the fit bit-for-bit
    assert(fellegiSunterEm(recs2, "blk", fields, iters = 10) == ((fit, p)))
  }

  test("classificationReport: per-class P/R/F1 from confusion counts") {
    import spark.implicits._
    // class 1: tp=8, fn=2 (8+2 support), fp=1; class 2: tp=5, fn=1, fp=2
    val conf = Seq((1L, 1L, 8L), (1L, 2L, 2L), (2L, 2L, 5L), (2L, 1L, 1L))
      .toDF("label", "pred_label", "n")
    val r = Evaluation.classificationReport(conf)
      .select("label", "support", "tp", "fp", "fn",
        "precision_micro", "recall_micro", "f1_micro")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(t => t._1 -> t).toMap
    assert(r(1L) == ((1L, 10L, 8L, 1L, 2L, 888888L, 800000L, 842104L)))
    assert(r(2L) == ((2L, 6L, 5L, 2L, 1L, 714285L, 833333L, 769230L)))
    // a class predicted but never true still reports (support 0)
    val conf2 = Seq((1L, 3L, 2L), (1L, 1L, 3L)).toDF("label", "pred_label", "n")
    val r2 = Evaluation.classificationReport(conf2)
      .filter(col("label") === 3L)
      .select("support", "tp", "fp").as[(Long, Long, Long)].head()
    assert(r2 == ((0L, 0L, 2L)))
  }
}
