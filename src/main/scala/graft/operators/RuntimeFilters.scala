package graft.operators

import org.apache.spark.sql.SparkSession

/** Runtime bloom-filter join pruning — Catalyst's runtime-filter rule
  * (`InjectRuntimeFilter`) builds a bloom filter over the selective
  * (filtered) side's join keys and probes it on the large side's scan,
  * cutting the shuffled fact rows to the keys that can actually match.
  * This is the 100 TB shape for "selective dim ⋈ huge fact" when the
  * dim is too big to broadcast: the bloom costs one small aggregate
  * and removes most of the fact shuffle.
  *
  * Spark injects it only past size thresholds that local test data
  * never reaches (application side ≥ 10 GB by default) — correct in
  * production, invisible in a local run. [[withRuntimeBloom]] scopes
  * the thresholds down so the plan shape itself is testable (see
  * RuntimeFilterSpec); exactness is unconditional either way (a bloom
  * admits false positives, the join still filters them).
  */
object RuntimeFilters {

  /** Runs `f` with runtime bloom-filter injection enabled and the
    * application-side scan threshold lowered to `appSideScanBytes`
    * (0 = always consider). Restores prior conf values after. */
  def withRuntimeBloom[T](spark: SparkSession, appSideScanBytes: Long = 0L)(
      f: => T): T = {
    val confs = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" ->
        appSideScanBytes.toString)
    val prior = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
