package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** On-disk IVF vector index — the materialized form of the ANN
  * family's 100 TB layout claim: the corpus is written to parquet
  * PARTITIONED BY its coarse k-means cluster, so an `nprobe`-cluster
  * query reads only the probed directories (static partition pruning
  * at the scan — plan-asserted in IOSpec, not just documented), while
  * the tiny centroid table rides alongside for probe routing.
  *
  * Serving shape: [[probeTopK]] routes a BATCH of queries to their
  * nprobe nearest centroids (k×d broadcast), collects the ≤
  * queries×nprobe distinct probed cluster ids (a bounded driver
  * list — that bound is what makes STATIC pruning possible), scans
  * only those partitions, and ranks exact cosine within them. The
  * per-query restriction to its own probes is the (cluster) join
  * against the probe table, so one pruned scan serves the whole
  * batch.
  */
object IvfIndex {

  private def centroidPath(path: String): String = path + ".centroids"

  /** Build and write the index: Lloyd k-means coarse quantizer
    * ([[Similarity.kmeans]] — integer-micro averaging, deterministic),
    * vectors written partitioned by cluster, centroids written
    * alongside at `<path>.centroids`. */
  def writeIndex(emb: DataFrame, path: String, nClusters: Int = 8,
      iters: Int = 3, idCol: String = "vec_id",
      vecCol: String = "embedding"): Unit = {
    val (assign, cents) = Similarity.kmeans(emb, nClusters, iters, idCol, vecCol)
    emb.join(assign, Seq(idCol))
      .write.mode("overwrite").partitionBy("cluster").parquet(path)
    cents.write.mode("overwrite").parquet(centroidPath(path))
  }

  /** Nightly-ingest index maintenance: route a NEW batch of vectors to
    * their nearest existing coarse centroid and append them into the
    * matching cluster partition directories — O(batch) work against an
    * index of any size, no recluster, no rewrite of resident
    * partitions (`mode(append)` + partitionBy only creates files under
    * the touched cluster dirs). Assignment mirrors
    * [[Similarity.kmeans]]'s step exactly (row-normalized vector,
    * argmax dot against the stored centroid, ties to the lowest
    * cluster id), so an appended vector lands in the same cluster a
    * full rebuild at the same centroids would give it and
    * [[probeTopK]] serves old and new rows identically. Centroids are
    * NOT moved by appends — the standard IVF serving discipline
    * (centroid drift is a periodic offline rebuild; the append path
    * must stay cheap and deterministic). */
  def appendVectors(spark: SparkSession, batch: DataFrame, path: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val cents = spark.read.parquet(centroidPath(path))
    val nv = {
      val v = transform(col(vecCol), x => x.cast("double"))
      batch.select(col(idCol),
        transform(v, x => x / sqrt(Similarity.dot(v, v))).as("nv"))
    }
    val w = Window.partitionBy(col(idCol))
      .orderBy(Similarity.dot(col("nv"), col("centroid")).desc, col("cluster"))
    val assign = nv.crossJoin(broadcast(cents))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(idCol), col("cluster"))
    batch.join(assign, Seq(idCol))
      .write.mode("append").partitionBy("cluster").parquet(path)
  }

  /** Staleness monitor for the nightly-append lifecycle: since
    * [[appendVectors]] routes against FROZEN centroids forever, the
    * index quality decays silently as the appended distribution
    * drifts. This report measures that decay per cluster — the cosine
    * (in exact micro space, the [[Similarity.embedDrift]] discipline)
    * between each frozen centroid and the CURRENT mean of the
    * vectors actually resident in its partition — and flags the
    * clusters whose agreement fell below `thresholdMicro` for offline
    * re-clustering. The "measure, don't guess" loop for the index
    * family, same as q_ann_recall is for probe quality.
    *
    * Scale shape: one pass over the index; per-row work is a
    * normalize + posexplode, the aggregate is map-side combinable
    * down to clusters×dims rows, and the centroid side is a
    * broadcast. No driver-side state beyond the report itself
    * (clusters rows).
    *
    * @return (cluster, n_vecs, cos_micro, recluster) — cos_micro is
    *   round(cos(frozen centroid, member mean) · 1e6) computed from
    *   exact long sums of micro-rounded coordinates, so the report
    *   replays bit-exactly in any engine */
  def driftReport(spark: SparkSession, path: String,
      thresholdMicro: Long = 995000L, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val cents = spark.read.parquet(centroidPath(path))
    val v = transform(col(vecCol), x => x.cast("double"))
    val nv = spark.read.parquet(path).select(col("cluster"),
      transform(v, x => x / sqrt(Similarity.dot(v, v))).as("nv"))
    val dims = nv.select(col("cluster"), posexplode(col("nv")))
      .select(col("cluster"), col("pos").as("d"),
        round(col("col") * 1e6, 0).cast(LongType).as("vm"))
    val members = dims.groupBy("cluster", "d")
      .agg(sum(col("vm")).as("s"), count(lit(1)).as("n"))
      .select(col("cluster"), col("d"), col("n"),
        round(col("s").cast(DoubleType) / col("n").cast(DoubleType), 0)
          .cast(LongType).as("m"))
    val frozen = cents.select(col("cluster"), posexplode(col("centroid")))
      .select(col("cluster"), col("pos").as("d"),
        round(col("col") * 1e6, 0).cast(LongType).as("g"))
    members.join(broadcast(frozen), Seq("cluster", "d"))
      .groupBy("cluster")
      .agg(max(col("n")).as("n_vecs"),
        sum(col("m") * col("g")).as("dotmg"),
        sum(col("m") * col("m")).as("nm2"),
        sum(col("g") * col("g")).as("ng2"))
      .select(col("cluster"), col("n_vecs"),
        round(when(col("nm2") > 0 && col("ng2") > 0,
            col("dotmg").cast(DoubleType) /
              (sqrt(col("nm2").cast(DoubleType)) *
                sqrt(col("ng2").cast(DoubleType))) * 1e6)
          .otherwise(0.0), 0).cast(LongType).as("cos_micro"))
      .withColumn("recluster", col("cos_micro") < lit(thresholdMicro))
  }

  /** Exact top-k within the probed partitions of a written index.
    * Results are identical to scoring the same (query, cluster) pairs
    * over the full corpus — pruning changes I/O, never answers
    * (IOSpec asserts both). */
  def probeTopK(spark: SparkSession, path: String, queries: DataFrame,
      k: Int = 10, nprobe: Int = 2, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val cents = spark.read.parquet(centroidPath(path))
    val q = queries.select(col(idCol).as("query_id"),
        transform(col(vecCol), x => x.cast("double")).as("qv"))
      .withColumn("qn", sqrt(Similarity.dot(col("qv"), col("qv"))))
    val pw = Window.partitionBy(col("query_id"))
      .orderBy(col("csim").desc, col("cluster"))
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("csim", Similarity.cosine(col("qv"), col("centroid")))
      .withColumn("prn", row_number().over(pw))
      .filter(col("prn") <= nprobe)
      .select(col("query_id"), col("qv"), col("qn"), col("cluster"))
      .localCheckpoint()
    // bounded driver list (≤ queries × nprobe ids): the literal IN on
    // the partition column is what turns the scan into a directory
    // prune instead of a full read + filter
    val probed = probes.select(col("cluster")).distinct()
      .collect().map(_.getInt(0)).sorted
    val corpus = spark.read.parquet(path)
      .filter(col("cluster").isin(probed.map(Integer.valueOf): _*))
      .select(col("cluster"), col(idCol).as("nn_id"),
        transform(col(vecCol), x => x.cast("double")).as("dv"))
      .withColumn("dn", sqrt(Similarity.dot(col("dv"), col("dv"))))
    val scored = corpus.join(broadcast(probes), Seq("cluster"))
      .filter(col("nn_id") =!= col("query_id"))
      .select(col("query_id"), col("nn_id"),
        round(Similarity.dot(col("qv"), col("dv")) / (col("qn") * col("dn")), 6)
          .as("cos_sim"))
    // bounded-heap two-phase top-k (no per-query corpus-wide window)
    Similarity.topKExplode(scored, Seq("query_id"), k)
  }
}
