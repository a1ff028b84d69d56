package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.{Checkpoints, Curation, Dedup, TextAnalysis}
import graft.operators.Graph

/** The zero-leak contract for localCheckpoint blocks: operators
  * release provably-dead intermediates inline, and a session owner's
  * [[Checkpoints.releaseAll]] reclaims the rest once results are
  * consumed — a long-lived session running many pipeline stages must
  * not accumulate pinned storage (the round-9 bench read
  * checkpoint-heavy queries at 7-10x their isolated floor purely from
  * accumulated pins). */
class CheckpointLifecycleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the quiet river bank"),
    (2L, "the quick brown fox jumps over the lazy dog near the quiet river bend"),
    (3L, "spark catalyst optimizer rules rewrite logical plans into physical plans"),
    (4L, "parquet column pruning and predicate pushdown keep the scan narrow today")
  ).toDF("doc_id", "text")

  private def pinned: Int = Checkpoints.pinnedCount(spark)

  test("release() drops the blocks behind a checkpointed DataFrame") {
    Checkpoints.releaseAll(spark)
    val d = spark.range(100).toDF("id").localCheckpoint()
    assert(pinned >= 1)
    Checkpoints.release(d)
    assert(pinned === 0)
    // no-op on a non-checkpointed frame
    Checkpoints.release(spark.range(5).toDF("id"))
  }

  test("bpeTrain releases every internal checkpoint (fully self-cleaning)") {
    Checkpoints.releaseAll(spark)
    val merges = TextAnalysis.bpeTrain(docs, merges = 3).collect()
    assert(merges.nonEmpty)
    assert(pinned === 0, "bpeTrain collects its result; nothing may stay pinned")
  }

  test("trainQualityLr pins only the final weight table") {
    Checkpoints.releaseAll(spark)
    val labeled = (0 until 10).map(i =>
      (i.toLong, s"tok$i shared words here", (i % 2).toLong))
      .toDF("doc_id", "text", "y")
    val (w, _) = Curation.trainQualityLr(labeled, "y", iters = 3)
    assert(w.count() >= 0)
    assert(pinned === 1,
      "features and superseded rounds must be released; only the result weights stay")
    Checkpoints.release(w)
    assert(pinned === 0)
  }

  test("connectedComponents driver fast path leaves nothing pinned") {
    Checkpoints.releaseAll(spark)
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a_id", "b_id")
    val cc = Dedup.connectedComponents(pairs).collect()
    assert(cc.length === 5)
    assert(pinned === 0)
  }

  test("connectedComponents distributed loop pins only the result labels") {
    Checkpoints.releaseAll(spark)
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a_id", "b_id")
    // collectThreshold=0 forces the HashMin loop (the equivalence spec's knob)
    val cc = Dedup.connectedComponents(pairs, collectThreshold = 0L)
    assert(cc.count() === 5)
    // superseded per-batch labels, the edge table, and the input pair
    // checkpoints are all released inline; only the final label
    // checkpoint (which backs the returned frame) may remain
    assert(pinned <= 1,
      s"expected at most the final labels pinned, saw $pinned")
    Checkpoints.releaseAll(spark)
    assert(pinned === 0)
  }

  test("pmiCollocations releases the tokenized corpus once counts exist") {
    Checkpoints.releaseAll(spark)
    val top = TextAnalysis.pmiCollocations(docs, minCount = 2, topK = 5)
    assert(top.count() >= 0)
    // uni + bi count checkpoints back the (lazy) returned plan; the
    // tokenized corpus intermediate must already be gone
    assert(pinned <= 2, s"expected <=2 (uni, bi), saw $pinned")
    Checkpoints.releaseAll(spark)
    assert(pinned === 0)
  }

  test("bigramLogProb releases the tokenized corpus (V collected as literal)") {
    Checkpoints.releaseAll(spark)
    val nll = Curation.bigramLogProb(docs)
    assert(nll.count() === 4)
    assert(pinned <= 2, s"expected <=2 (counted, bigramN), saw $pinned")
    Checkpoints.releaseAll(spark)
    assert(pinned === 0)
  }

  test("triangleCount releases the undirected edge checkpoint") {
    Checkpoints.releaseAll(spark)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("src", "dst")
    val row = Graph.triangleCount(edges).collect()(0)
    assert(row.getAs[Long]("n_triangles") === 1L)
    assert(row.getAs[Long]("n_edges") === 4L)
    // oriented + adj back the returned plan; und must be gone
    assert(pinned <= 2, s"expected <=2 (oriented, adj), saw $pinned")
    Checkpoints.releaseAll(spark)
    assert(pinned === 0)
  }

  test("kCore releases every superseded peel round (only final edges pinned)") {
    Checkpoints.releaseAll(spark)
    // triangle + 2-chain: peels two rounds before converging
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val core = Graph.kCore(edges, k = 2)
    assert(core.count() === 3)
    // every intermediate round's edges + survivor tables are released
    // inline; only the final edge checkpoint backs the returned plan
    assert(pinned <= 1, s"expected at most final edges pinned, saw $pinned")
    Checkpoints.releaseAll(spark)
    assert(pinned === 0)
  }

  test("mmrSelect pins only its candidate base and final selection") {
    Checkpoints.releaseAll(spark)
    val cands = Seq((1L, 10L, 900000L), (1L, 11L, 800000L),
      (1L, 12L, 500000L)).toDF("query_id", "cid", "rel_micro")
    val sims = Seq((1L, 10L, 11L, 990000L), (1L, 11L, 10L, 990000L),
      (1L, 10L, 12L, 100000L), (1L, 12L, 10L, 100000L),
      (1L, 11L, 12L, 100000L), (1L, 12L, 11L, 100000L))
      .toDF("query_id", "a", "b", "sim_micro")
    val picks = graft.ext.Similarity.mmrSelect(cands, sims, k = 3)
    assert(picks.count() === 3)
    // superseded per-step selections and the candidate base are
    // released inline; only the final selection backs the plan
    assert(pinned <= 1, s"expected at most the final pick set, saw $pinned")
    Checkpoints.releaseAll(spark)
    assert(pinned === 0)
  }

  test("releaseAll after consuming a query restores a clean session") {
    Checkpoints.releaseAll(spark)
    // a representative checkpoint-heavy composite: near-dup candidates
    val sigs = Dedup.minhashSignatures(docs, numHashes = 8)
    Dedup.lshCandidates(sigs, numHashes = 8, rowsPerBand = 2).count()
    Checkpoints.releaseAll(spark)
    assert(pinned === 0)
  }

  test("MinHashBandIndex probe pins only its signature checkpoint; releaseAll reclaims it") {
    Checkpoints.releaseAll(spark)
    val tmp = java.nio.file.Files.createTempDirectory("graft-ckpt-mh").toString
    graft.operators.MinHashBandIndex.writeIndex(
      docs.filter(col("doc_id") <= 2), "ckpt_mh_idx", tmp + "/idx")
    try {
      graft.operators.MinHashBandIndex.probe(spark, "ckpt_mh_idx",
        docs.filter(col("doc_id") > 2)).count()
      // one batch-sized pin (the probe's signature checkpoint + the
      // internal lshCandidates band table) is the documented contract;
      // the session owner reclaims once results are consumed
      Checkpoints.releaseAll(spark)
      assert(pinned === 0)
    } finally spark.sql("DROP TABLE IF EXISTS ckpt_mh_idx")
  }

  test("eval/link-prediction family: only the returned result may stay pinned") {
    Checkpoints.releaseAll(spark)
    import spark.implicits._
    // materialize-and-release ops: after releasing the RESULT, zero
    // pins remain — any residue is an internal scaffold leak
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 4L)).toDF("src", "dst")
    val aa = Graph.adamicAdar(edges)
    aa.count(); Checkpoints.release(aa)
    assert(pinned === 0, "adamicAdar leaked a scaffold")
    val ppr = Graph.personalizedPageRank(edges, Seq(1L).toDF("node"))
    ppr.count(); Checkpoints.release(ppr)
    assert(pinned === 0, "personalizedPageRank leaked a scaffold")
    val bleu = TextAnalysis.corpusBleu(
      docs.withColumnRenamed("doc_id", "pair_id"),
      docs.withColumnRenamed("doc_id", "pair_id"))
    bleu.count(); Checkpoints.release(bleu)
    assert(pinned === 0, "corpusBleu leaked a scaffold")
    val cont = Dedup.containmentJoin(docs, threshold = 0.5)
    cont.count(); Checkpoints.release(cont)
    assert(pinned === 0, "containmentJoin leaked a scaffold")
    val ratings = Seq(("g", 1L, "a"), ("g", 1L, "a"), ("g", 2L, "b"),
      ("g", 2L, "a")).toDF("group", "item", "cat")
    val fk = graft.ext.Evaluation.fleissKappa(ratings)
    fk.count(); Checkpoints.release(fk)
    assert(pinned === 0, "fleissKappa leaked a scaffold")
    val labels = Seq(("g", "a", "x"), ("g", "b", "y"))
      .toDF("group", "label_a", "label_b")
    val chi = graft.ext.Evaluation.chiSquare(labels)
    chi.count(); Checkpoints.release(chi)
    assert(pinned === 0, "chiSquare leaked a scaffold")
    // fully-lazy ops: consuming them must pin nothing at all
    val preds = Seq(("g", 5L, 1L), ("g", 3L, 0L))
      .toDF("group", "score_micro", "y")
    graft.ext.Evaluation.aucRoc(preds).count()
    val vals = Seq(("g", 1L)).toDF("group", "v")
    graft.ext.Evaluation.ksTest(vals, vals).count()
    val ps = Seq(("g", 500000L)).toDF("group", "p_micro")
    graft.ext.Evaluation.psi(ps, ps).count()
    graft.ext.Evaluation.labelVote(ratings).count()
    graft.ext.Curation.featureHash(
      Seq((1L, "r")).toDF("id", "c"), Seq("c")).count()
    assert(pinned === 0, "lazy eval ops must not pin")
  }

  test("aggRefresh releases its staged batch (fully self-cleaning)") {
    Checkpoints.releaseAll(spark)
    val before = pinned
    val path = java.nio.file.Files
      .createTempDirectory("graft-ckpt-aggref").toString + "/t"
    val ev = Seq((1L, "a", 5.0, 10L), (2L, "b", 7.0, 11L))
      .toDF("event_id", "k", "value", "uid")
    graft.model.Incremental.aggRefresh(spark, ev, path, "k",
      round(col("value") * 100, 0), col("uid")).count()
    assert(pinned === before,
      "aggRefresh must release the staged-batch checkpoint before returning")
  }
}
