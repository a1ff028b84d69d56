package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.model.Incremental

class IncrementalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
  def tmp(n: String) = java.nio.file.Files.createTempDirectory(n).toString + "/t"

  test("incremental merge: upsert by key across three batches") {
    val path = tmp("graft-incr")
    val b1 = Seq((1L, "a", 10), (2L, "b", 20)).toDF("id", "v", "n")
    val b2 = Seq((2L, "b2", 21), (3L, "c", 30)).toDF("id", "v", "n")
    val b3 = Seq((1L, "a3", 12)).toDF("id", "v", "n")
    Incremental.merge(spark, b1, path, Seq("id"))
    Incremental.merge(spark, b2, path, Seq("id"))
    val r = Incremental.merge(spark, b3, path, Seq("id"))
      .orderBy("id").as[(Long, String, Int)].collect().toSeq
    assert(r === Seq((1L, "a3", 12), (2L, "b2", 21), (3L, "c", 30)))
  }

  test("snapshot SCD2: change tracking with valid_from/valid_to") {
    val path = tmp("graft-snap")
    val day1 = Seq((1L, "alice", "NY"), (2L, "bob", "LA")).toDF("id", "name", "city")
    val day2 = Seq((1L, "alice", "SF"), (2L, "bob", "LA"), (3L, "cara", "CHI"))
      .toDF("id", "name", "city")
    Incremental.snapshot(spark, day1, path, Seq("id"), ts("2026-01-01"))
    val snap = Incremental.snapshot(spark, day2, path, Seq("id"), ts("2026-01-02"))

    // id=1 moved: closed NY version + open SF version
    val v1 = snap.filter($"id" === 1).orderBy("valid_from").collect()
    assert(v1.length === 2)
    assert(v1(0).getAs[String]("city") === "NY" &&
      !v1(0).getAs[Boolean]("is_current") &&
      v1(0).getAs[java.sql.Timestamp]("valid_to") === ts("2026-01-02"))
    assert(v1(1).getAs[String]("city") === "SF" &&
      v1(1).getAs[Boolean]("is_current") &&
      v1(1).isNullAt(v1(1).fieldIndex("valid_to")))
    // id=2 unchanged: single open version from day 1
    val v2 = snap.filter($"id" === 2).collect()
    assert(v2.length === 1 && v2.head.getAs[Boolean]("is_current") &&
      v2.head.getAs[java.sql.Timestamp]("valid_from") === ts("2026-01-01"))
    // id=3 new: one open version from day 2
    val v3 = snap.filter($"id" === 3).collect()
    assert(v3.length === 1 && v3.head.getAs[Boolean]("is_current"))
    // invariant: exactly one current row per present key
    assert(snap.filter($"is_current").groupBy("id").count()
      .filter($"count" > 1).isEmpty)
  }

  test("snapshot SCD2: deleted keys get closed") {
    val path = tmp("graft-snap-del")
    val day1 = Seq((1L, "x"), (2L, "y")).toDF("id", "v")
    val day2 = Seq((1L, "x")).toDF("id", "v") // key 2 disappears
    Incremental.snapshot(spark, day1, path, Seq("id"), ts("2026-02-01"))
    val snap = Incremental.snapshot(spark, day2, path, Seq("id"), ts("2026-02-02"))
    val v2 = snap.filter($"id" === 2).collect()
    assert(v2.length === 1 && !v2.head.getAs[Boolean]("is_current") &&
      v2.head.getAs[java.sql.Timestamp]("valid_to") === ts("2026-02-02"))
  }

  test("insertOverwrite: batch partitions replaced wholesale, others untouched") {
    val path = tmp("graft-iow")
    val b1 = Seq((1L, "m1", 10), (2L, "m1", 20), (3L, "m2", 30), (4L, "m3", 40))
      .toDF("id", "pt", "n")
    Incremental.insertOverwrite(spark, b1, path, "pt")
    // re-run m1 THINNER (one row) and m2 changed; m3 untouched
    val b2 = Seq((9L, "m1", 99), (3L, "m2", 31)).toDF("id", "pt", "n")
    val r = Incremental.insertOverwrite(spark, b2, path, "pt")
      .select("id", "pt", "n").as[(Long, String, Int)].collect().toSet
    assert(r === Set((9L, "m1", 99), (3L, "m2", 31), (4L, "m3", 40)),
      s"got $r")
  }

  test("changeFeed: minimal I/U/D between versions; applying it replays old -> new") {
    val oldV = Seq((1L, "a", 10), (2L, "b", 20), (3L, null: String, 30))
      .toDF("id", "v", "n")
    val newV = Seq((1L, "a", 10), (2L, "b2", 20), (4L, "d", 40))
      .toDF("id", "v", "n")
    val feed = Incremental.changeFeed(oldV, newV, Seq("id"))
      .as[(String, Long, String, Int)].collect().toSet
    assert(feed === Set(("U", 2L, "b2", 20), ("D", 3L, null, 30),
      ("I", 4L, "d", 40)), s"got $feed")
    // identical versions -> empty feed (null-safe hash: null == null)
    assert(Incremental.changeFeed(oldV, oldV, Seq("id")).isEmpty)
    // round trip: applyChanges(feed) onto old == new
    val path = tmp("graft-feed")
    Incremental.merge(spark, oldV, path, Seq("id"))
    val replayed = Incremental.applyChanges(spark,
      Incremental.changeFeed(oldV, newV, Seq("id")).withColumn("seq", lit(1)),
      path, Seq("id"))
      .as[(Long, String, Int)].collect().toSet
    assert(replayed === newV.as[(Long, String, Int)].collect().toSet)
  }

  test("scd2AsOf: mid-history timestamp returns the round-1 table") {
    val path = tmp("graft-asof")
    val day1 = Seq((1L, "alice", "NY"), (2L, "bob", "LA")).toDF("id", "name", "city")
    val day2 = Seq((1L, "alice", "SF"), (3L, "cara", "CHI")).toDF("id", "name", "city")
    Incremental.snapshot(spark, day1, path, Seq("id"), ts("2024-01-01"))
    val snap = Incremental.snapshot(spark, day2, path, Seq("id"), ts("2024-02-01"))
    val asOfMid = Incremental.scd2AsOf(snap, ts("2024-01-15"))
      .as[(Long, String, String)].collect().toSet
    assert(asOfMid === Set((1L, "alice", "NY"), (2L, "bob", "LA")))
    val asOfEnd = Incremental.scd2AsOf(snap, ts("2024-02-01"))
      .as[(Long, String, String)].collect().toSet
    assert(asOfEnd === Set((1L, "alice", "SF"), (3L, "cara", "CHI")))
  }

  test("applyChanges: I/U/D fold with in-batch ordering and delete-then-reinsert") {
    val path = tmp("graft-cdc")
    // batch 1: inserts (one key arrives twice out of order — seq wins)
    val b1 = Seq(
      (1L, "a1", "I", 10L), (2L, "b1", "I", 11L),
      (2L, "b2", "U", 13L), (3L, "c1", "I", 12L))
      .toDF("id", "v", "op", "seq")
    val r1 = Incremental.applyChanges(spark, b1, path, Seq("id"))
      .as[(Long, String)].collect().toMap
    assert(r1 == Map(1L -> "a1", 2L -> "b2", 3L -> "c1"), s"got $r1")
    // batch 2: delete 1, update 3; delete beats a stale earlier update
    val b2 = Seq(
      (1L, "a2", "U", 20L), (1L, null.asInstanceOf[String], "D", 21L),
      (3L, "c2", "U", 22L))
      .toDF("id", "v", "op", "seq")
    val r2 = Incremental.applyChanges(spark, b2, path, Seq("id"))
      .as[(Long, String)].collect().toMap
    assert(r2 == Map(2L -> "b2", 3L -> "c2"), s"got $r2")
    // batch 3: re-insert a previously deleted key
    val b3 = Seq((1L, "a3", "I", 30L)).toDF("id", "v", "op", "seq")
    val r3 = Incremental.applyChanges(spark, b3, path, Seq("id"))
      .as[(Long, String)].collect().toMap
    assert(r3 == Map(1L -> "a3", 2L -> "b2", 3L -> "c2"), s"got $r3")
  }

  test("compactGuarded: drops only past-horizon tombstones, keeps the seq guard") {
    val path = tmp("graft-cdc-compact")
    // fold 1: three keys live; fold 2: delete 1 at seq 4, delete 2 at
    // seq 9, update 3 to v3b at seq 6
    Incremental.applyChangesGuarded(spark,
      Seq((1L, "v1", "I", 1L), (2L, "v2", "I", 1L), (3L, "v3", "I", 1L))
        .toDF("id", "v", "op", "seq"), path, Seq("id"))
    Incremental.applyChangesGuarded(spark,
      Seq((1L, "v1", "D", 4L), (2L, "v2", "D", 9L), (3L, "v3b", "U", 6L))
        .toDF("id", "v", "op", "seq"), path, Seq("id"))
    val live0 = Incremental.readCdcTable(spark, path)
      .select("id", "v").as[(Long, String)].collect().toSet
    val compacted = Incremental.compactGuarded(spark, path, horizonSeq = 5L)
    // live view is untouched by compaction
    assert(Incremental.readCdcTable(spark, path)
      .select("id", "v").as[(Long, String)].collect().toSet === live0)
    // key 1's tombstone (seq 4 ≤ 5) is gone; key 2's (seq 9 > 5) kept;
    // key 3 keeps its forward-only __seq
    val raw = compacted.select(col("id"), col("__seq").cast("long"),
      col("__deleted")).as[(Long, Long, Boolean)].collect().toSet
    assert(raw === Set((2L, 9L, true), (3L, 6L, false)), s"$raw")
    // the retained tombstone still blocks an in-horizon replay…
    Incremental.applyChangesGuarded(spark,
      Seq((2L, "back", "I", 7L)).toDF("id", "v", "op", "seq"), path, Seq("id"))
    assert(!Incremental.readCdcTable(spark, path)
      .select("id").as[Long].collect().contains(2L))
    // …and the live row's persisted seq still rejects a stale replay
    Incremental.applyChangesGuarded(spark,
      Seq((3L, "stale", "U", 2L)).toDF("id", "v", "op", "seq"), path, Seq("id"))
    assert(Incremental.readCdcTable(spark, path).filter(col("id") === 3)
      .select("v").as[String].collect().toSeq === Seq("v3b"))
  }

  test("aggRefresh: batch folds ≡ one-shot recompute, in any batch order") {
    val rows = (1L to 300L).map(i =>
      (i, s"k${i % 3}", (i % 17).toDouble + 0.25, i % 40)) // dup users per key
    val full = rows.toDF("event_id", "key", "value", "uid")
    def run(path: String, splits: Seq[Seq[Long]]): Seq[(String, Long, Long, Long, Long, Long)] = {
      splits.foldLeft(null: org.apache.spark.sql.DataFrame) { (_, ids) =>
        Incremental.aggRefresh(spark, full.filter(col("event_id").isin(ids: _*)),
          path, "key", round(col("value") * 100, 0), col("uid"))
      }.orderBy("key")
        .select("key", "cnt", "sum_micro", "min_micro", "max_micro", "hll_est")
        .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    }
    val ids = (1L to 300L)
    val foldedPath = tmp("graft-aggref-b")
    val oneShot = run(tmp("graft-aggref-a"), Seq(ids))
    val threeAsc = run(foldedPath,
      Seq(ids.filter(_ % 3 == 0), ids.filter(_ % 3 == 1), ids.filter(_ % 3 == 2)))
    val threeDesc = run(tmp("graft-aggref-c"),
      Seq(ids.filter(_ % 3 == 2), ids.filter(_ % 3 == 1), ids.filter(_ % 3 == 0)))
    assert(oneShot == threeAsc, s"fold ≠ recompute:\n$oneShot\n$threeAsc")
    assert(oneShot == threeDesc, "fold must be batch-order-independent")
    // scalar state is exact
    val k0 = oneShot.find(_._1 == "k0").get
    val expect = rows.filter(_._2 == "k0")
    assert(k0._2 == expect.size)
    assert(k0._3 == expect.map(r => math.round(r._3 * 100)).sum)
    // on-disk state stays bounded: ≤ keys×m register rows, |keys| scalar rows
    assert(spark.read.parquet(foldedPath + "/scalars").count() == 3)
    assert(spark.read.parquet(foldedPath + "/regs").count() <= 3 * 256)
  }
}
