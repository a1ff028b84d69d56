package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-timing probe for the distributed k-truss peel (build tool):
  * times triangle enumeration, support seeding, and each peel
  * round's sub-steps on the bench co-purchase graph, so the
  * expensive phase is measured instead of guessed. */
object KtrussProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }
    val li = graft.sources.Tables(spark, dir).lineitem
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val e0 = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("src"), col("b.pk").as("dst"))
    val e = e0.select(
        least(col("src"), col("dst")).cast("long").as("u"),
        greatest(col("src"), col("dst")).cast("long").as("v"))
      .filter(col("u") =!= col("v")).distinct().localCheckpoint()
    println(s"[probe] edges = ${t("edge build+count")(e.count())}")
    // mirror Graph.kTruss's triangles()
    val deg = e.select(col("u").as("node"))
      .unionAll(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val flip = struct(col("du"), col("u")) > struct(col("dv"), col("v"))
    val oriented = t("orient") {
      val o = e
        .join(broadcast(deg.select(col("node").as("u"), col("deg").as("du"))), "u")
        .join(broadcast(deg.select(col("node").as("v"), col("deg").as("dv"))), "v")
        .select(when(flip, col("v")).otherwise(col("u")).as("src"),
          when(flip, col("u")).otherwise(col("v")).as("dst"))
        .localCheckpoint()
      o.count(); o
    }
    val adj = oriented.groupBy(col("src"))
      .agg(collect_list(col("dst")).as("nbrs"))
    def side(k: String) = adj.select(col("src").as(k), col("nbrs").as(s"n_$k"))
    val tri = t("triangles") {
      val x = oriented
        .join(broadcast(side("a")), col("src") === col("a"))
        .join(broadcast(side("b")), col("dst") === col("b"))
        .select(col("src"), col("dst"),
          explode(array_intersect(col("n_a"), col("n_b"))).as("w"))
        .select(
          least(col("src"), col("dst")).as("e1u"),
          greatest(col("src"), col("dst")).as("e1v"),
          least(col("src"), col("w")).as("e2u"),
          greatest(col("src"), col("w")).as("e2v"),
          least(col("dst"), col("w")).as("e3u"),
          greatest(col("dst"), col("w")).as("e3v"))
        .localCheckpoint()
      println(s"[probe] triangles = ${x.count()}")
      x
    }
    def supportOf(tt: org.apache.spark.sql.DataFrame) =
      tt.select(col("e1u").as("u"), col("e1v").as("v"))
        .unionAll(tt.select(col("e2u").as("u"), col("e2v").as("v")))
        .unionAll(tt.select(col("e3u").as("u"), col("e3v").as("v")))
        .groupBy("u", "v").agg(count(lit(1)).as("support"))
    var sup = t("seed sup") {
      val s = e.join(supportOf(tri), Seq("u", "v"), "left")
        .select(col("u"), col("v"),
          coalesce(col("support"), lit(0L)).as("support"))
        .localCheckpoint()
      s.count(); s
    }
    var triV = tri
    var round = 0
    var done = false
    while (!done && round < 30) {
      val below = t(s"r$round below") {
        val b = sup.filter(col("support") < 2L).select("u", "v")
          .localCheckpoint(); b }
      val bc = below.count()
      println(s"[probe] r$round shell = $bc")
      if (bc == 0) done = true
      else {
        def flag(cu: String, cv: String, d: String) =
          broadcast(below.select(col("u").as(cu), col("v").as(cv),
            lit(true).as(d)))
        val marked = t(s"r$round marked ckpt") {
          val m = triV
            .join(flag("e1u", "e1v", "d1"), Seq("e1u", "e1v"), "left")
            .join(flag("e2u", "e2v", "d2"), Seq("e2u", "e2v"), "left")
            .join(flag("e3u", "e3v", "d3"), Seq("e3u", "e3v"), "left")
            .localCheckpoint()
          m.count(); m
        }
        val isDead = col("d1").isNotNull || col("d2").isNotNull ||
          col("d3").isNotNull
        val triCols = Seq("e1u", "e1v", "e2u", "e2v", "e3u", "e3v").map(col)
        val nextTri = t(s"r$round nextTri ckpt") {
          val nt = marked.filter(!isDead).select(triCols: _*)
            .localCheckpoint(); nt.count(); nt }
        val supDelta = t(s"r$round supDelta") {
          val d = supportOf(marked.filter(isDead).select(triCols: _*))
            .withColumnRenamed("support", "delta").localCheckpoint()
          println(s"[probe] r$round delta rows = ${d.count()}"); d }
        val nextSup = t(s"r$round nextSup ckpt") {
          val ns = sup
            .join(broadcast(below), Seq("u", "v"), "left_anti")
            .join(broadcast(supDelta), Seq("u", "v"), "left")
            .select(col("u"), col("v"),
              (col("support") - coalesce(col("delta"), lit(0L)))
                .as("support"))
            .localCheckpoint()
          ns.count(); ns }
        graft.ext.Checkpoints.release(triV, sup, below, marked, supDelta)
        triV = nextTri
        sup = nextSup
      }
      round += 1
    }
    spark.stop()
  }
}
