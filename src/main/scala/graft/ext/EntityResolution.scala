package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record linkage / entity resolution: collapse dirty near-duplicate
  * RECORDS (names with typos, case/whitespace noise) into canonical
  * entities. The classic pipeline — normalize, block on a strong key,
  * fuzzy-match within blocks, transitively close — expressed as plain
  * DataFrame ops over the shared [[Dedup.connectedComponents]] core.
  *
  * Differs from document dedup (minhash/simhash over token sets): ER
  * links SHORT strings where a single edit is significant, so the
  * comparator is character edit distance, and candidate generation is
  * equality on a strong blocking key rather than LSH banding.
  *
  * Scale shape: normalization is a scan-speed map. The pairwise
  * comparison is quadratic ONLY within a block — the block-size cap
  * (`maxBlock`) bounds per-block work the way LSH band width bounds
  * candidate fan-out, and is standard ER practice (oversized blocks
  * mean the blocking key is too weak; re-block, don't compare).
  * Block-count filtering and the self-join both shuffle on the
  * blocking key, so the whole candidate stage is one key-clustered
  * exchange; the transitive closure is the size-gated
  * connectedComponents (driver union-find on small graphs, HashMin
  * loop at scale).
  */
object EntityResolution {

  /** lower/trim, then strip to the character class — the normalized
    * match fields. Spark regexp_replace replaces ALL matches (DuckDB
    * needs the explicit 'g' flag — oracle parity note). */
  private def stripTo(c: Column, keep: String): Column =
    regexp_replace(lower(trim(c)), s"[^$keep]", "")

  /** Resolve records (id, name) into entities.
    *
    * Match rule: two records are linked when their digit strings are
    * EQUAL (the strong key — the "same zip/phone" discipline) and
    * their letter strings are within `maxEdit` character edits (the
    * fuzzy name match). Entity id = min record id over the transitive
    * closure; records in no link (or with an empty/overloaded strong
    * key) resolve to themselves.
    *
    * @param maxBlock records sharing one strong key beyond this are
    *   left unlinked (blocking key too weak to compare pairwise).
    * @return (idCol, entity_id) — one row per input record.
    */
  def resolve(records: DataFrame, idCol: String = "record_id",
      nameCol: String = "name", maxEdit: Int = 1,
      maxBlock: Int = 64): DataFrame = {
    // normalized match fields; computed once — both the block census
    // and the pairwise join read this projection
    val n = records.select(col(idCol),
      stripTo(col(nameCol), "a-z").as("letters"),
      stripTo(col(nameCol), "0-9").as("digits"))
    val blocked = n.filter(col("digits") =!= "")
    // block census: keyed aggregation on the blocking key — the same
    // shuffle layout the pairwise self-join needs, so AQE reuses the
    // exchange; the census is block-cardinality-sized, never
    // record-cardinality-sized
    val blockSizes = blocked.groupBy("digits")
      .agg(count(lit(1)).as("block_n"))
      .filter(col("block_n") <= maxBlock)
      .select("digits")
    val nb = blocked.join(blockSizes, Seq("digits"))
    val a = nb.select(col("digits"), col(idCol).as("src"),
      col("letters").as("la"))
    val b = nb.select(col("digits"), col(idCol).as("dst"),
      col("letters").as("lb"))
    // within-block pairwise: equi-join on the strong key with the
    // edit-distance predicate as a residual — Spark's levenshtein
    // takes the early-exit threshold form so non-matches cost O(maxEdit·len)
    val edges = a.join(b, Seq("digits"))
      .filter(col("src") < col("dst") &&
        levenshtein(col("la"), col("lb"), maxEdit) >= 0)
      .select("src", "dst")
    val comp = Dedup.connectedComponents(edges, "src", "dst")
    n.join(comp.withColumnRenamed("node", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("component"), col(idCol)).as("entity_id"))
  }

  /** Deterministic dirty-record generator for the demo query/oracle:
    * the clean rows plus typo'd variants (insertion, deletion,
    * case/whitespace noise) at disjoint id offsets — the oracle
    * replays the same arithmetic, so expected entities are exactly
    * the clean keys. */
  def customerVariants(customer: DataFrame): DataFrame = {
    val base = customer.select(col("c_custkey").as("record_id"),
      col("c_name").as("name"))
    def variant(mod: Int, offset: Long, name: Column) =
      customer.filter(col("c_custkey") % mod === 0)
        .select((col("c_custkey") + offset).as("record_id"), name.as("name"))
    base
      .unionAll(variant(5, 1000000L,
        regexp_replace(col("c_name"), "Customer", "Custoomer")))
      .unionAll(variant(7, 2000000L,
        regexp_replace(col("c_name"), "Customer", "Custmer")))
      .unionAll(variant(3, 3000000L,
        concat(lit("  "), upper(col("c_name")), lit(" "))))
  }
}
