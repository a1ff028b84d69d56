package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** One-off plan/phase audit of q_jonckheere's jtFinish (build tool):
  * the shipped operator ends in a localCheckpoint, so PlanDump only
  * shows a stub — this probe explains the PRE-checkpoint aggregation
  * plan (mirroring jtFinish's body) and times the two real jobs. */
object JtProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.expressions.Window
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-24s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }
    val orders = graft.sources.Tables(spark, dir).orders
    val state = orders.select(
      lit("all").as("group"),
      substring(col("o_orderpriority"), 1, 1).cast("long").as("arm"),
      round(col("o_totalprice") * 100, 0).cast("long").as("v"))
      .select(col("group").as("grp"),
        col("arm").cast("string").as("arm"), col("v").cast(LongType).as("v"))
      .groupBy("grp", "arm", "v").agg(count(lit(1)).as("cnt"))
    val cells = t("cells ckpt")(state.select(col("grp"),
        col("arm").cast(LongType).as("arm"), col("v"), col("cnt"))
      .localCheckpoint())
    val arms = cells.select("grp", "arm").distinct()
    val pairs = arms.select(col("grp").as("pg"), col("arm").as("ai"))
      .join(arms.select(col("grp").as("g2"), col("arm").as("aj")),
        col("pg") === col("g2") && col("ai") < col("aj"))
      .select(col("pg"), col("ai"), col("aj"))
    val side0 = cells.join(pairs, col("grp") === col("pg") &&
        col("arm") === col("ai"))
      .select(col("grp"), col("ai"), col("aj"), col("v"),
        col("cnt").as("c0"), lit(0L).as("c1"))
    val side1 = cells.join(pairs, col("grp") === col("pg") &&
        col("arm") === col("aj"))
      .select(col("grp"), col("ai"), col("aj"), col("v"),
        lit(0L).as("c0"), col("cnt").as("c1"))
    val pooled = side0.unionAll(side1)
      .groupBy("grp", "ai", "aj", "v")
      .agg(sum(col("c0")).as("c0"), sum(col("c1")).as("c1"))
    val wPrev = Window.partitionBy("grp", "ai", "aj").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val j2Tab = pooled
      .withColumn("below", coalesce(sum(col("c0")).over(wPrev), lit(0L)))
      .groupBy("grp").agg(
        sum(col("c1") * (lit(2L) * col("below") + col("c0"))).as("j2"))
    println(j2Tab.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    t("j2Tab job")(j2Tab.count())
    spark.stop()
  }
}
