package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Source/sink breadth (SURVEY §2.1 S4/S5): the reference's only I/O
  * is the BigQuery adapter; the Spark-native engine fronts parquet
  * (primary), orc, csv and json, plus the write shapes that matter at
  * 100 TB — partitioned layout for pruning and bucketed tables for
  * shuffle-free joins.
  */
object IO {

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def readCsv(spark: SparkSession, path: String, header: Boolean = true): DataFrame =
    spark.read.option("header", header.toString).option("inferSchema", "true").csv(path)

  def readJson(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** ORC — the other columnar format Spark supports natively; same
    * pushdown/pruning behavior as parquet. */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** Hive-style partitioned layout: scans filtered on `cols` prune
    * whole directories (partition pruning — the 100 TB table layout). */
  def writePartitioned(df: DataFrame, path: String, cols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(cols: _*).parquet(path)

  /** Range-partitioned, sorted-within-partition layout: maximizes
    * parquet zone-map (row-group min/max) effectiveness, so point and
    * range filters on `cols` skip whole row groups — the right layout
    * for append-mostly 100 TB fact tables queried by time/key range. */
  def writeSortedBy(df: DataFrame, path: String, cols: Seq[String],
      partitions: Int = 0): Unit = {
    val keyCols = cols.map(col)
    val ranged = if (partitions > 0)
      df.repartitionByRange(partitions, keyCols: _*)
    else df.repartitionByRange(keyCols: _*)
    ranged.sortWithinPartitions(keyCols: _*)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Bucketed + sorted managed table: joins/aggregations on the bucket
    * key skip the shuffle entirely (requires saveAsTable — bucket
    * metadata lives in the catalog). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol).sortBy(bucketCol)
      .format("parquet").saveAsTable(table)

  /** Small-file compaction — the maintenance pass every long-lived
    * table needs: streaming sinks and per-batch appends leave
    * thousands of KB-scale files, and scan/planning cost grows with
    * FILE COUNT (task scheduling, footer reads, listing pressure),
    * not bytes. Rewrites `path` to ≈ ceil(totalBytes/targetBytes)
    * files (parquet re-encodes, so output sizes track input bytes
    * approximately); with `partitionCols` the Hive layout is
    * preserved and rows re-cluster one-file-per-partition-value
    * (right for the many-small-partitions case; a jumbo partition
    * stays one file — split those by bucketing instead).
    *
    * Swap discipline: the rewrite lands at `<path>.compacting` and
    * only replaces the original after success, via rename — atomic on
    * HDFS/local, NOT on object stores (there, compact into a table
    * format's transaction log instead; this operator is the raw-
    * parquet fallback).
    *
    * @return (filesBefore, filesAfter) data-file counts. */
  def compact(spark: SparkSession, path: String,
      targetBytes: Long = 128L << 20,
      partitionCols: Seq[String] = Nil): (Int, Int) = {
    import org.apache.hadoop.fs.Path
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles(d: Path): Seq[org.apache.hadoop.fs.FileStatus] = {
      val it = fs.listFiles(d, true)
      val buf = scala.collection.mutable.ArrayBuffer
        .empty[org.apache.hadoop.fs.FileStatus]
      while (it.hasNext) {
        val f = it.next()
        val name = f.getPath.getName
        if (!name.startsWith("_") && !name.startsWith(".")) buf += f
      }
      buf.toSeq
    }
    val before = dataFiles(p)
    val n = math.max(1,
      math.ceil(before.map(_.getLen).sum.toDouble / targetBytes).toInt)
    val tmp = new Path(path + ".compacting")
    fs.delete(tmp, true)
    val src = spark.read.parquet(path)
    val w =
      if (partitionCols.nonEmpty)
        src.repartition(partitionCols.map(col): _*)
          .write.partitionBy(partitionCols: _*)
      else src.repartition(n).write
    w.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val bak = new Path(path + ".precompact")
    fs.delete(bak, true)
    require(fs.rename(p, bak) && fs.rename(tmp, p),
      s"compact swap failed for $path")
    fs.delete(bak, true)
    (before.size, dataFiles(p).size)
  }
}

/** Skew mitigation for hot keys (SURVEY §7.2 step 8: "salting for
  * skewed keys like the invite-code fan-outs"). AQE's skew-join
  * handles sort-merge skew automatically; salting is the explicit
  * fallback when a single key dominates a shuffle hash join or
  * aggregation.
  */
object Skew {

  /** Salted inner equi-join: left's hot keys spread over `salts`
    * partitions; right replicated `salts` ways. Correct for any key
    * distribution; use when one key holds >~1/partitions of the rows. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salts: Int = 8): DataFrame = {
    val saltedL = left.withColumn("__salt",
      (rand(seed = 42) * salts).cast("int"))
    val saltedR = right.crossJoin(
      right.sparkSession.range(salts).select(col("id").cast("int").as("__salt")))
    saltedL.join(saltedR,
        saltedL(key) === saltedR(key) && saltedL("__salt") === saltedR("__salt"))
      .drop(saltedR(key)).drop("__salt")
  }

  /** Two-phase aggregation for skewed group keys: partial agg on
    * (key, salt), then final agg on key. `aggs` maps column -> "sum" |
    * "count" (the decomposable aggregates). */
  def saltedCountSum(df: DataFrame, key: String, sumCol: String,
      salts: Int = 8): DataFrame = {
    val salted = df.withColumn("__salt", (rand(seed = 42) * salts).cast("int"))
    salted.groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(col(sumCol)).as("__s"))
      .groupBy(col(key))
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as("sum"))
  }
}
