package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.{concat, lit, pmod}
import graft.operators.Graph

/** Unit evidence for the DataFrame PageRank: hand-computed integer
  * ranks on a tiny directed graph, hub dominance on a star, and
  * run-to-run determinism (the integer-micro arithmetic has no
  * summation-order sensitivity to hide).
  */
class GraphSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  test("pagerank: hand-computed ranks on a single directed edge") {
    // A(1)→B(2): rB = 150000 + 85·rA div 100 each round; rA stays at
    // the damping floor after round 1 ⇒ rA=150000, rB=277500
    val ranks = Graph.pageRank(Seq((1L, 2L)).toDF("src", "dst"), iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(ranks == Map(1L -> 150000L, 2L -> 277500L), s"$ranks")
  }

  test("hits: bipartite direction separates hubs from authorities; in-degree orders authorities") {
    // parts 1,2,3 → supplier 10; part 1 also → supplier 11
    val edges = Seq((1L, 10L), (2L, 10L), (3L, 10L), (1L, 11L))
      .toDF("src", "dst")
    val r = Graph.hits(edges, iters = 2)
      .as[(Long, Long, Long)].collect()
      .map(x => x._1 -> (x._2, x._3)).toMap
    // pure sources have authority 0; pure sinks have hub 0
    assert(Seq(1L, 2L, 3L).forall(r(_)._2 == 0L), s"source auth: $r")
    assert(Seq(10L, 11L).forall(r(_)._1 == 0L), s"sink hub: $r")
    // 3 in-edges beat 1; the 2-out-edge hub beats the 1-out-edge hubs
    assert(r(10L)._2 > r(11L)._2, s"auth order: $r")
    assert(r(1L)._1 > r(2L)._1 && r(2L)._1 == r(3L)._1, s"hub order: $r")
    // L1 contract: each score vector sums to ~1e12 (per-node rounding)
    val hubSum = r.values.map(_._1).sum; val authSum = r.values.map(_._2).sum
    assert(math.abs(hubSum - 1000000000000L) <= r.size &&
      math.abs(authSum - 1000000000000L) <= r.size, s"L1: $hubSum $authSum")
    // deterministic re-run
    val r2 = Graph.hits(edges.repartition(5), iters = 2)
      .as[(Long, Long, Long)].collect()
      .map(x => x._1 -> (x._2, x._3)).toMap
    assert(r == r2, "partitioning must not change HITS scores")
  }

  test("modularity: two clean cliques score 0.5; one-community assignment scores 0") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L))
      .toDF("src", "dst")
    val good = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L), (6L, 4L))
      .toDF("node", "label")
    val g = Graph.modularity(edges, good)
      .select("label", "w_in", "d_tot", "term_micro", "modularity_micro")
      .as[(Long, Long, Long, Long, Long)].collect()
    // per clique: w_in = 6 directed, d = 6, term = 6/12 − (6/12)² = 0.25
    assert(g.forall(r => r._2 == 6L && r._3 == 6L && r._4 == 250000L), s"$g")
    assert(g.head._5 == 500000L, s"two-clique Q must be 0.5: ${g.toSeq}")
    val flat = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (5L, 1L), (6L, 1L))
      .toDF("node", "label")
    val q0 = Graph.modularity(edges, flat)
      .select("modularity_micro").as[Long].head()
    assert(q0 == 0L, s"everything-in-one-community must score 0: $q0")
  }

  test("pagerank: star hub outranks every leaf; deterministic re-run") {
    val edges = (1L to 5L).flatMap(l => Seq((0L, l), (l, 0L))).toDF("src", "dst")
    val r = Graph.pageRank(edges, iters = 3).as[(Long, Long)].collect().toMap
    assert((1L to 5L).forall(l => r(0L) > r(l)), s"hub must dominate: $r")
    assert((1L to 5L).map(r).toSet.size == 1, s"leaves are symmetric: $r")
    val r2 = Graph.pageRank(edges, iters = 3).as[(Long, Long)].collect().toMap
    assert(r == r2, "integer-micro ranks must be bit-identical across runs")
  }

  test("pagerank: broadcast gate off ≡ on (r19 chunked-adjacency scale shape)") {
    // gate off forces the node-bound chunked adjacency iteration state
    // (the 100 TB keyed-shuffle shape); gate on keeps the per-edge
    // (src, dst, odeg) form — ranks must be bit-identical, including a
    // hub whose out-degree spans multiple 1024-neighbor chunks... at
    // test scale the chunk count is 1 per node, so ALSO pin the chunk
    // math by checking a hub star plus cross-links
    val edges = ((1L to 5L).flatMap(l => Seq((0L, l), (l, 0L))) ++
      Seq((1L, 2L), (2L, 3L), (3L, 4L))).toDF("src", "dst")
    val on = Graph.pageRank(edges, iters = 3).as[(Long, Long)].collect().toMap
    val off = Graph.pageRank(edges, iters = 3, broadcastMaxNodes = 0L)
      .as[(Long, Long)].collect().toMap
    assert(on == off, s"gate-off adjacency ranks must match: $on vs $off")
  }

  test("textrank: connective tokens outrank rare ones; rn dense from 1") {
    // "the" neighbors every content word — highest co-occurrence
    // degree ⇒ highest rank. "zzz" appears once at a sentence edge.
    val docs = Seq(
      "the cat sat on the mat",
      "the dog ate the bone",
      "the bird sang to the cat",
      "zzz the end").toDF("text")
    val out = Graph.textRank(docs, topK = 5).collect()
    assert(out.head.getString(0) == "the", s"hub token first: ${out.toSeq}")
    assert(out.map(_.getInt(2)).toSeq == (1 to out.length), "rn dense from 1")
    assert(out.length == 5)
  }

  test("label propagation: disjoint triangles converge to their min ids") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (10L, 11L), (11L, 12L), (12L, 10L)).toDF("src", "dst")
    val labels = Graph.labelPropagation(edges, iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L).forall(labels(_) == 1L), s"first clique: $labels")
    assert(Seq(10L, 11L, 12L).forall(labels(_) == 10L), s"second clique: $labels")
    val rerun = Graph.labelPropagation(edges, iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(labels == rerun, "synchronous LPA must be deterministic")
  }

  test("triangles: K4 plus a pendant edge has exactly 4 triangles") {
    // K4 on {1,2,3,4} (6 edges, C(4,3)=4 triangles) + pendant 4–5;
    // input deliberately messy: duplicates, reversed pairs, self-loop
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (2L, 3L),
      (2L, 4L), (3L, 4L), (4L, 5L), (3L, 3L), (4L, 3L))
      .toDF("src", "dst")
    val r = Graph.triangleCount(edges).as[(Long, Long, Long)].head()
    assert(r._1 == 7L, s"7 distinct undirected edges, got ${r._1}")
    assert(r._3 == 4L, s"K4 has 4 triangles, got ${r._3}")
    assert(r._2 >= r._3, "every triangle closes a wedge")
  }

  test("kCore: chains peel off round by round, the triangle survives") {
    // triangle {1,2,3} with a tail 3-4-5: peeling drops 5 (deg 1)
    // then 4 (deg 1 after round 1) — MULTI-round peel — leaving the
    // triangle, every member at within-core degree 2
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val core2 = Graph.kCore(edges, k = 2).as[(Long, Long)].collect().toMap
    assert(core2 == Map(1L -> 2L, 2L -> 2L, 3L -> 2L), s"got $core2")
    // k=3: a triangle is NOT a 3-core; everything peels away
    assert(Graph.kCore(edges, k = 3).isEmpty)
    // K4 IS a 3-core and survives intact
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("src", "dst")
    val core3 = Graph.kCore(k4, k = 3).as[(Long, Long)].collect().toMap
    assert(core3 == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("shortestPaths: exact hop counts on a path graph; hop cap honored") {
    // path 1–2–3–4–5 (symmetrized), seed {1}
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val d = Graph.shortestPaths(edges, seeds, maxHops = 6)
      .as[(Long, Int)].collect().toMap
    assert(d == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> 4), s"$d")
    // cap at 2 hops: node 4, 5 unreached
    val capped = Graph.shortestPaths(edges, seeds, maxHops = 2)
      .as[(Long, Int)].collect().toMap
    assert(capped == Map(1L -> 0, 2L -> 1, 3L -> 2), s"$capped")
    // multi-source takes the nearer seed
    val multi = Graph.shortestPaths(edges, Seq(1L, 5L).toDF("node"), maxHops = 6)
      .as[(Long, Int)].collect().toMap
    assert(multi == Map(1L -> 0, 5L -> 0, 2L -> 1, 4L -> 1, 3L -> 2), s"$multi")
  }

  test("shortestPaths: no pinned blocks leak; deterministic re-run") {
    val und = Seq((1L, 2L), (2L, 3L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val before = graft.ext.Checkpoints.pinnedCount(spark)
    val d = Graph.shortestPaths(edges, Seq(1L).toDF("node"), maxHops = 4)
    val r1 = d.as[(Long, Int)].collect().toMap
    // only the final dist checkpoint may remain pinned
    assert(graft.ext.Checkpoints.pinnedCount(spark) <= before + 1)
    graft.ext.Checkpoints.release(d)
    val r2 = Graph.shortestPaths(edges, Seq(1L).toDF("node"), maxHops = 4)
      .as[(Long, Int)].collect().toMap
    assert(r1 == r2)
  }

  test("randomWalks: walks follow edges, have full length, and replay") {
    // two disjoint 3-cycles so every node has out-degree 1 — walks
    // are forced deterministic paths around each cycle
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (10L, 11L), (11L, 12L), (12L, 10L)).toDF("src", "dst")
    val starts = Seq(1L, 10L).toDF("node")
    val out = Graph.randomWalks(edges, starts, walkLen = 3, walksPerNode = 2)
      .as[(Long, Int, Int, Long)].collect()
    // 2 starts × 2 walks × 4 positions
    assert(out.length == 16, s"${out.length}")
    val byWalk = out.groupBy(r => (r._1, r._2))
      .map { case (k, rs) => k -> rs.sortBy(_._3).map(_._4).toSeq }
    // out-degree 1 ⇒ the unique cycle path regardless of hash picks
    assert(byWalk((1L, 0)) == Seq(1L, 2L, 3L, 1L), s"$byWalk")
    assert(byWalk((10L, 1)) == Seq(10L, 11L, 12L, 10L), s"$byWalk")
    val rerun = Graph.randomWalks(edges, starts, walkLen = 3, walksPerNode = 2)
      .as[(Long, Int, Int, Long)].collect()
    assert(out.toSet == rerun.toSet, "hash-driven walks must replay exactly")
  }

  test("randomWalks: high-degree hub ranks match the sorted-dst contract; bounded pins") {
    // hub 0 with 500 out-edges — enough to span several range
    // partitions, exercising the prefix-sum rank (the per-src window
    // this replaced would have put all 500 in one task). With
    // dsts = 1..500 sorted, rank r ⟺ dst r, so the hash pick is
    // directly checkable: node(step 1) == hash60("0|w|1") % 500 + 1.
    val hubDeg = 500L
    val edges = (1L to hubDeg).map(l => (0L, l)).toDF("src", "dst")
    val starts = Seq(0L).toDF("node")
    val before = graft.ext.Checkpoints.pinnedCount(spark)
    val walkLen = 1
    val out = Graph.randomWalks(edges, starts, walkLen = walkLen, walksPerNode = 8)
      .as[(Long, Int, Int, Long)].collect()
    // pinned: a CONSTANT three tables (start positions + adjacency +
    // degrees) regardless of walk length — steps are lazy layers over
    // them (r18), and the session owner reclaims after consuming
    assert(graft.ext.Checkpoints.pinnedCount(spark) <= before + 3,
      "randomWalks must pin only starts/adjacency/degrees")
    graft.ext.Checkpoints.releaseAll(spark)
    val expected = spark.range(8).toDF("walk")
      .select($"walk",
        (pmod(graft.expressions.Md5Hash60.hash60(
          concat(lit("0"), lit("|"), $"walk".cast("string"), lit("|"), lit("1"))),
          lit(hubDeg)) + 1L).as("dst"))
      .as[(Long, Long)].collect().toMap
    val step1 = out.filter(_._3 == 1).map(r => r._2.toLong -> r._4).toMap
    assert(step1 == expected, s"hub picks diverge: $step1 vs $expected")
  }

  test("randomWalks: duplicate input edges don't perturb ranks or degrees") {
    // the adjacency dedups ADJACENT rows inside the range-sorted
    // partitions (no separate distinct shuffle) — triplicated input
    // must produce exactly the walks of the clean edge list
    val clean = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val dup = (Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L)) ++
      Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L)) ++
      Seq((1L, 3L), (3L, 1L))).toDF("src", "dst")
    val starts = Seq(1L, 2L).toDF("node")
    val a = Graph.randomWalks(clean, starts, walkLen = 3, walksPerNode = 4)
      .as[(Long, Int, Int, Long)].collect().toSet
    val b = Graph.randomWalks(dup, starts, walkLen = 3, walksPerNode = 4)
      .as[(Long, Int, Int, Long)].collect().toSet
    assert(a == b, s"duplicate edges changed the walks:\n a=$a\n b=$b")
  }

  test("ancestors: diamond DAG keeps min depth; cycles stop at the backstop") {
    // diamond: 1 -> {2, 3} -> 4 -> 5, plus a shortcut 1 -> 4:
    // ancestor 4 of node 1 is reachable at depth 1 (shortcut) and 2
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 5L), (1L, 4L))
      .toDF("child", "parent")
    val anc = Graph.ancestors(edges).as[(Long, Long, Int)].collect().toSet
    assert(anc == Set((1L, 2L, 1), (1L, 3L, 1), (1L, 4L, 1), (1L, 5L, 2),
      (2L, 4L, 1), (2L, 5L, 2), (3L, 4L, 1), (3L, 5L, 2), (4L, 5L, 1)),
      s"got $anc")
    // a 3-cycle terminates at maxDepth and reports each node's
    // reachable set (everyone, incl. itself through the loop)
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("child", "parent")
    val c = Graph.ancestors(cyc, maxDepth = 4).as[(Long, Long, Int)].collect()
    assert(c.length == 9 && c.map(_._3).max <= 4, s"cycle run: ${c.toSeq}")
    // no pinned checkpoint leak beyond the returned accumulator
    graft.ext.Checkpoints.releaseAll(spark)
  }

  test("randomWalks: picks are hash-distributed on a branching node") {
    // star center 0 with 4 out-neighbors; 16 one-step walks from 0
    val edges = (1L to 4L).map(l => (0L, l)).toDF("src", "dst")
    val starts = Seq(0L).toDF("node")
    val out = Graph.randomWalks(edges, starts, walkLen = 1, walksPerNode = 16)
      .as[(Long, Int, Int, Long)].collect()
    val step1 = out.filter(_._3 == 1).map(_._4)
    assert(step1.length == 16)
    // md5 spreads 16 picks over 4 neighbors: expect >1 distinct target
    assert(step1.distinct.length > 1, s"degenerate picks: ${step1.toSeq}")
    // dead ends (leaves have no out-edges) would truncate longer walks
    val longer = Graph.randomWalks(edges, starts, walkLen = 3, walksPerNode = 1)
      .as[(Long, Int, Int, Long)].collect()
    assert(longer.map(_._3).max == 1, "walk must stop at a dead end")
  }

  test("personalizedPageRank: hand ranks; unreached nodes absent; gate off ≡ on") {
    // 1→2 with seed {1}: round 1 gives 1 its reset 150000 and 2 its
    // damped inflow 850000; round 2 damps 1's contribution to 127500
    val e = Seq((1L, 2L), (3L, 2L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val r1 = Graph.personalizedPageRank(e, seeds, iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(r1 == Map(1L -> 150000L, 2L -> 850000L), s"iter1: $r1")
    val r2 = Graph.personalizedPageRank(e, seeds, iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(r2 == Map(1L -> 150000L, 2L -> 127500L), s"iter2: $r2")
    // node 3 (non-seed, no inflow) never appears — reachable-set output
    assert(!r2.contains(3L), "unreached nodes must be absent")
    val off = Graph.personalizedPageRank(e, seeds, iters = 2,
      broadcastMaxNodes = 0L).as[(Long, Long)].collect().toMap
    assert(off == r2, "broadcast gate must not change ranks")
    graft.ext.Checkpoints.releaseAll(spark)
  }

  test("adamicAdar: hand term on a path; adjacent pairs excluded; hub cap") {
    // path 1—2—3: only (1,3) share a neighbor; deg(2)=2 ⇒
    // term = round(1e6/ln 2) = 1442695
    val path = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val out = Graph.adamicAdar(path).as[(Long, Long, Long, Long)].collect()
    assert(out.toSeq == Seq((1L, 3L, 1L, 1442695L)), s"got ${out.toSeq}")
    // triangle: every sharing pair is already adjacent ⇒ no predictions
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    assert(Graph.adamicAdar(tri).count() == 0L, "adjacent pairs excluded")
    // star center above the degree cap generates no wedges
    val star = (1L to 5L).map(l => (0L, l)).toDF("src", "dst")
    assert(Graph.adamicAdar(star, maxCenterDegree = 3L).count() == 0L)
    // ...and scores all C(5,2) leaf pairs when the cap admits it:
    // term = round(1e6/ln 5) = 621335, cn = 1 each
    val full = Graph.adamicAdar(star).as[(Long, Long, Long, Long)].collect()
    assert(full.length == 10 && full.forall(r => r._3 == 1L && r._4 == 621335L),
      s"star pairs: ${full.toSeq}")
    // gate off ≡ on
    val off = Graph.adamicAdar(path, broadcastMaxNodes = 0L)
      .as[(Long, Long, Long, Long)].collect()
    assert(off.toSeq == out.toSeq, "broadcast gate must not change scores")
    graft.ext.Checkpoints.releaseAll(spark)
  }

  test("jaccardLinks: degree-normalized scores; full-overlap pair hits 1") {
    // path 1—2—3—4: (1,3) share {2}, deg 1/2 → 1e6 div (1+2−1) = 500000;
    // (2,4) symmetric
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val out = Graph.jaccardLinks(path)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 3L, 1L, 1L, 2L, 500000L),
      (2L, 4L, 1L, 2L, 1L, 500000L)), s"got $out")
    // diamond 1—2,1—3,2—3,2—4,3—4: (1,4) share BOTH neighbors →
    // jaccard exactly 1; all sharing pairs that are adjacent excluded
    val diamond = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("src", "dst")
    val d = Graph.jaccardLinks(diamond)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(d == Set((1L, 4L, 2L, 2L, 2L, 1000000L)), s"got $d")
    // a hub above the center cap generates no wedges
    val star = (1L to 5L).map(l => (0L, l)).toDF("src", "dst")
    assert(Graph.jaccardLinks(star, maxCenterDegree = 3L).count() == 0L)
    // gate off ≡ on
    val off = Graph.jaccardLinks(path, broadcastMaxNodes = 0L)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(off == out, "broadcast gate must not change scores")
    graft.ext.Checkpoints.releaseAll(spark)
  }

  test("localClustering: triangle + pendant, hand-computed coefficients") {
    // triangle 1-2-3 plus pendant 3-4: lcc(1)=lcc(2)=1, lcc(3)=1/3,
    // lcc(4)=0 (deg < 2)
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("src", "dst")
    val out = Graph.localClustering(e).collect()
      .map(r => r.getAs[Long]("node") ->
        ((r.getAs[Long]("deg"), r.getAs[Long]("tri"),
          r.getAs[Double]("lcc")))).toMap
    assert(out(1L) == ((2L, 1L, 1.0)))
    assert(out(2L) == ((2L, 1L, 1.0)))
    assert(out(3L) == ((3L, 1L, 0.333333)))
    assert(out(4L) == ((1L, 0L, 0.0)))
    // duplicate/reversed edges normalize away; per-node credits agree
    // with the global count on the same graph
    val dup = e.union(Seq((2L, 1L), (4L, 3L)).toDF("src", "dst"))
    val tri3 = Graph.localClustering(dup)
      .agg(org.apache.spark.sql.functions.sum("tri")).as[Long].head()
    assert(tri3 == 3L, "three credits per triangle")
    graft.ext.Checkpoints.releaseAll(spark)
  }

  test("kTruss: 4-clique survives k=4 with support 2; tail and lone triangle peel away") {
    import spark.implicits._
    // 4-clique {1,2,3,4}, a pendant path 4-5-6, and a separate
    // triangle {7,8,9}: at k=4 only the clique's 6 edges survive
    // (every clique edge closes exactly 2 in-truss triangles); the
    // lone triangle's edges have support 1 and peel in round one
    val clique = for (a <- 1 to 4; b <- (a + 1) to 4) yield (a.toLong, b.toLong)
    val edges = (clique ++ Seq((4L, 5L), (5L, 6L),
      (7L, 8L), (8L, 9L), (7L, 9L))).toDF("src", "dst")
    val out = graft.operators.Graph.kTruss(edges, k = 4).collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst")) ->
        r.getAs[Long]("support")).toMap
    assert(out.keySet == clique.toSet, s"${out.keySet}")
    assert(out.values.forall(_ == 2L), s"$out")
    // k=3 keeps the lone triangle too (support 1 within itself)
    val k3 = graft.operators.Graph.kTruss(edges, k = 3).collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst"))).toSet
    assert(k3 == clique.toSet ++ Set((7L, 8L), (8L, 9L), (7L, 9L)), s"$k3")
    graft.ext.Checkpoints.releaseAll(spark)
  }

  test("kTruss: driver fast path ≡ distributed decremental loop") {
    import spark.implicits._
    // overlapping cliques + a bridge + pendants: enough structure
    // for several peel rounds. collectThreshold = 0 forces the
    // distributed path; the peel is confluent, so both must agree
    // edge-for-edge including supports.
    val c1 = for (a <- 1 to 5; b <- (a + 1) to 5) yield (a.toLong, b.toLong)
    val c2 = for (a <- 4 to 8; b <- (a + 1) to 8) yield (a.toLong, b.toLong)
    val edges = (c1 ++ c2 ++ Seq((8L, 9L), (9L, 10L), (10L, 8L),
      (1L, 20L), (20L, 21L))).toDF("src", "dst")
    for (kk <- Seq(2, 3, 4, 5)) {
      val fast = graft.operators.Graph.kTruss(edges, k = kk)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val dist = graft.operators.Graph.kTruss(edges, k = kk,
          collectThreshold = 0L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(fast == dist, s"k=$kk fast/distributed disagree:\n$fast\n$dist")
    }
    graft.ext.Checkpoints.releaseAll(spark)
  }

  test("kTruss: maxRounds bail-out parity — fast path peels in shells (round 17)") {
    import spark.implicits._
    // depth-3 "triangle tree": root edge (1,2) expanded by {3,4}
    // (triangles 1-2-3, 1-2-4), each depth-1 edge expanded by two
    // fresh vertices. k=4 peels it one level per round — leaves
    // (support 1) in round 1, depth-1 edges (dropping 3 -> 1) in
    // round 2, the root (2 -> 0) in round 3 — so maxRounds binds at
    // 1 and 2, and BOTH paths must leave the identical unconverged
    // edge set with identical maintained supports at the cap.
    var nextV = 5L
    val d1 = Seq((1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L))
    val d2 = d1.flatMap { case (u, v) =>
      val (w1, w2) = (nextV, nextV + 1); nextV += 2
      Seq((u, w1), (v, w1), (u, w2), (v, w2))
    }
    val edges = (Seq((1L, 2L)) ++ d1 ++ d2).toDF("src", "dst")
    def run(mr: Int, thresh: Long) =
      graft.operators.Graph.kTruss(edges, k = 4, maxRounds = mr,
          collectThreshold = thresh).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for (mr <- Seq(1, 2, 3)) {
      val fast = run(mr, Long.MaxValue)
      val dist = run(mr, 0L)
      assert(fast == dist, s"maxRounds=$mr fast/dist:\n$fast\n$dist")
      graft.ext.Checkpoints.releaseAll(spark)
    }
    // the cap really binds: one round retains root + depth-1 shell
    // (with post-round supports), three rounds reach the empty
    // fixpoint
    val one = run(1, Long.MaxValue)
    assert(one == (d1.map(e => e -> 1L) :+ ((1L, 2L) -> 2L)).toMap,
      s"$one")
    assert(run(3, Long.MaxValue).isEmpty)
    graft.ext.Checkpoints.releaseAll(spark)
  }

  test("kTruss: k=2 is the whole graph — triangle-free edges survive with support 0") {
    import spark.implicits._
    // path 1-2-3 (no triangles) + triangle {4,5,6}: the 2-truss is
    // by definition every edge (support >= 0 always holds), so the
    // path edges must NOT be dropped by the support table's
    // triangles-only domain
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L), (5L, 6L), (4L, 6L))
      .toDF("src", "dst")
    val out = graft.operators.Graph.kTruss(edges, k = 2).collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst")) ->
        r.getAs[Long]("support")).toMap
    assert(out == Map((1L, 2L) -> 0L, (2L, 3L) -> 0L,
      (4L, 5L) -> 1L, (5L, 6L) -> 1L, (4L, 6L) -> 1L), s"$out")
    graft.ext.Checkpoints.releaseAll(spark)
  }

  test("triangle enumeration: wheel-graph hand counts, broadcast gate off ≡ on (r18 exploded probe stream)") {
    import spark.implicits._
    // Wheel W5: hub 0 joined to a 5-cycle 1-2-3-4-5-1. 10 edges,
    // 5 triangles (one per rim edge), every rim node lcc = 2/3
    // (deg 3, 2 triangles), hub lcc = 5/C(5,2) = 0.5. The hub's
    // orientation out-degree is large relative to the graph — the
    // exploded-adjacency probe stream (r18) must still enumerate
    // each triangle exactly once, on BOTH sides of the edge gate
    // (gate off forces the keyed-join exchange shape).
    val rim = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 1L))
    val edges = (rim ++ (1 to 5).map(i => (0L, i.toLong))).toDF("src", "dst")
    for (gate <- Seq(20000000L, 0L)) {
      val t = Graph.triangleCount(edges, broadcastMaxEdges = gate)
        .as[(Long, Long, Long)].head()
      assert(t._1 == 10L, s"gate=$gate edges: $t")
      assert(t._3 == 5L, s"gate=$gate triangles: $t")
      val lcc = Graph.localClustering(edges, broadcastMaxEdges = gate)
        .collect().map(r => r.getAs[Long]("node") ->
          ((r.getAs[Long]("tri"), r.getAs[Double]("lcc")))).toMap
      assert(lcc(0L) == ((5L, 0.5)), s"gate=$gate hub: $lcc")
      for (n <- 1L to 5L)
        assert(lcc(n) == ((2L, 0.666667)), s"gate=$gate rim $n: $lcc")
      graft.ext.Checkpoints.releaseAll(spark)
    }
  }

  test("richClub: clique core with pendants, hand-computed phi ladder") {
    import spark.implicits._
    // 4-clique {1,2,3,4} + pendants 5,6 on node 1: deg(1)=5,
    // deg(2..4)=3, deg(5)=deg(6)=1
    val clique = for (a <- 1 to 4; b <- (a + 1) to 4) yield (a.toLong, b.toLong)
    val edges = (clique ++ Seq((1L, 5L), (1L, 6L))).toDF("src", "dst")
    val out = graft.operators.Graph.richClub(edges, ks = Seq(1, 2, 4))
      .collect().map(r => r.getAs[Int]("k") -> r).toMap
    // k=1 and k=2: the rich set is the clique, fully connected inside
    for (k <- Seq(1, 2)) {
      assert(out(k).getAs[Long]("n_nodes") == 4L, s"k=$k")
      assert(out(k).getAs[Long]("n_edges") == 6L, s"k=$k")
      assert(out(k).getAs[Double]("phi") == 1.0, s"k=$k")
    }
    // k=4: only node 1 survives -> no pairs, phi 0 by contract
    assert(out(4).getAs[Long]("n_nodes") == 1L)
    assert(out(4).getAs[Double]("phi") == 0.0)
    graft.ext.Checkpoints.releaseAll(spark)
  }
}
