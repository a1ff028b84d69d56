package graft.models

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.BqFunctions.haversineMiles

/** Port of models/intermediate/locations_clean.sql (reference file,
  * 168 LoC): one row per from_location_id with best city/state/county/
  * country + coordinates. Output: 8 columns (SURVEY §1.4).
  *
  * Construct mapping (SURVEY §2):
  *  - edge-flatten UNION ALL (lines 2-29)        -> unionByName of two join shapes
  *  - HAVING count(distinct) > 1 (lines 30-37)   -> groupBy/agg/filter
  *  - ST_DISTANCE/1609.34 (line 48)              -> haversineMiles (built-ins only)
  *  - QUALIFY row_number()=1 (lines 83,89,95)    -> window + filter desugar
  *  - `* except(...)` (lines 127,151)            -> drop
  *  - street-address regex heuristics (64-66)    -> rlike (Java regex ≡ RE2 here)
  *  - score + top-1 dedup (139-156)              -> case-sum + window
  *
  * Scale: location tables shuffle once on from_location_id for the
  * windows; the five left joins in the flatten all key on the same
  * from_location_id, so AQE can reuse the exchange. Windows use
  * row_number()=1 which Spark ≥3.5 rewrites to per-partition group
  * limits (InferWindowGroupLimit).
  */
object LocationsClean {

  /** top-1 per partition with explicit order, dropping the rank col. */
  private def top1(df: DataFrame, partition: Column, order: Column*): DataFrame =
    df.withColumn("__rn",
        row_number().over(Window.partitionBy(partition).orderBy(order: _*)))
      .filter(col("__rn") === 1)
      .drop("__rn")

  def apply(src: Map[String, DataFrame]): DataFrame = {
    val loc   = src("location_location")
    val llac  = src("location_location_address_components")
    val types = src("location_location_types")

    // location_components (lines 2-29): component edges ∪ self rows
    val edges = llac
      .join(loc.as("to_loc"), llac("to_location_id") === col("to_loc.id"))
      .join(types.as("t1"), llac("to_location_id") === col("t1.location_id"))
      .filter(col("t1.locationtype_id").isin(1, 3, 4, 7, 8))
      .select(
        llac("from_location_id").as("from_location_id"),
        col("to_loc.id").as("to_location_id"),
        col("to_loc.display_name").as("display_name"),
        col("to_loc.long_name").as("long_name"),
        col("to_loc.latitude").as("latitude"),
        col("to_loc.longitude").as("longitude"),
        col("t1.locationtype_id").as("locationtype_id"))
    val selfRows = loc.as("fl")
      .join(types.as("t2"), col("fl.id") === col("t2.location_id"))
      .filter(col("t2.locationtype_id").isin(1, 3, 4, 7, 8))
      .select(
        col("fl.id").as("from_location_id"),
        col("fl.id").as("to_location_id"),
        col("fl.display_name").as("display_name"),
        col("fl.long_name").as("long_name"),
        col("fl.latitude").as("latitude"),
        col("fl.longitude").as("longitude"),
        col("t2.locationtype_id").as("locationtype_id"))
    val locationComponents = edges.unionAll(selfRows)

    // multiple (lines 30-37): >1 distinct city-ish display_name
    val multiple = locationComponents
      .filter(col("locationtype_id").isin(3, 4) &&
        col("from_location_id") =!= col("to_location_id"))
      .groupBy("from_location_id")
      .agg(countDistinct("display_name").as("n_names"))
      .filter(col("n_names") > 1)
      .select("from_location_id")

    // city_candidates (lines 38-56): distance of each city component
    val cityCandidates = multiple
      .join(loc.as("fl2"), col("fl2.id") === multiple("from_location_id"))
      .join(locationComponents.as("city"),
        col("city.from_location_id") === col("fl2.id") &&
          col("city.locationtype_id").isin(3, 4))
      .filter(col("fl2.latitude").isNotNull && col("fl2.longitude").isNotNull &&
        col("city.latitude").isNotNull && col("city.longitude").isNotNull)
      .select(
        col("fl2.id").as("from_location_id"),
        col("city.to_location_id").as("to_location_id"),
        col("city.display_name").as("city"),
        col("city.latitude").as("city_latitude"),
        col("city.longitude").as("city_longitude"),
        col("fl2.display_name").as("original_locale"),
        col("fl2.latitude").as("og_latitude"),
        col("fl2.longitude").as("og_longitude"),
        haversineMiles(col("city.latitude"), col("city.longitude"),
          col("fl2.latitude"), col("fl2.longitude")).as("distance_from_origin"))

    // replace (lines 57-78): nearest candidate; keep the original
    // locale as "city" only if far away and it doesn't look like a
    // street address / plus-code / county
    val nearest = top1(cityCandidates, col("from_location_id"),
      col("distance_from_origin"), col("to_location_id"))
    val lowerLocale = lower(col("original_locale"))
    val replaceDf = nearest.select(
      col("from_location_id"),
      col("to_location_id"),
      col("original_locale"),
      col("distance_from_origin"),
      when(col("distance_from_origin") > 10 &&
          !lowerLocale.rlike("\\d{1,5}\\s+\\w+") &&
          !lowerLocale.rlike("^[0-9a-z]{4}\\+[0-9a-z]{2,}") &&
          !lowerLocale.rlike("\\bst\\b|\\bave\\b|\\brd\\b|\\bdr\\b|\\bln\\b") &&
          !lowerLocale.like("%county%"),
        col("original_locale")).otherwise(col("city")).as("city_replace"),
      when(col("distance_from_origin") > 10, col("og_latitude"))
        .otherwise(col("city_latitude")).as("city_latitude_replace"),
      when(col("distance_from_origin") > 10, col("og_longitude"))
        .otherwise(col("city_longitude")).as("city_longitude_replace"),
      col("og_latitude"), col("og_longitude"))

    // best country/state/county (lines 79-96): QUALIFY desugar
    def bestOfType(t: Int): DataFrame =
      top1(locationComponents.filter(col("locationtype_id") === t),
        col("from_location_id"), col("to_location_id"))
    val bestCountry = bestOfType(1)
    val bestState   = bestOfType(7)
    val bestCounty  = bestOfType(8)

    // best_city derived subquery (lines 126-134)
    val bestCity = top1(locationComponents.filter(col("locationtype_id").isin(3, 4)),
      col("from_location_id"), col("to_location_id"))

    // all_location_flat (lines 97-135): 6-way left-join fan
    val flat = loc.as("base")
      .join(replaceDf.as("rep"), col("base.id") === col("rep.from_location_id"), "left")
      .join(bestCounty.as("bcty"), col("base.id") === col("bcty.from_location_id"), "left")
      .join(bestState.as("bst"), col("base.id") === col("bst.from_location_id"), "left")
      .join(bestCountry.as("bcn"), col("base.id") === col("bcn.from_location_id"), "left")
      .join(src("location_location_types").as("bt"),
        col("base.id") === col("bt.location_id"), "left")
      .join(bestCity.as("bcity"), col("base.id") === col("bcity.from_location_id"), "left")
      .select(
        col("base.id").as("from_location_id"),
        col("base.display_name").as("original_locale"),
        when(col("rep.city_replace").isNotNull, col("rep.city_replace"))
          .when(col("bt.locationtype_id") === 1, lit(null))
          .when(col("bcity.display_name").isNotNull, col("bcity.display_name"))
          .when(col("base.display_name") === "Seoul", col("base.display_name"))
          .otherwise(lit(null)).as("city"),
        coalesce(col("rep.city_latitude_replace"), col("bcity.latitude"),
          col("base.latitude")).as("city_latitude"),
        coalesce(col("rep.city_longitude_replace"), col("bcity.longitude"),
          col("base.longitude")).as("city_longitude"),
        col("bcty.display_name").as("county"),
        when(col("bt.locationtype_id") === 1, lit(null))
          .when(col("bst.display_name") === col("bcn.long_name"), lit(null))
          .when(col("bst.display_name").isNotNull, col("bst.display_name"))
          .otherwise(lit(null)).as("state"),
        col("bcn.long_name").as("country"),
        col("base.latitude").as("latitude"),
        col("base.longitude").as("longitude"))

    // scored + dedup (lines 136-156)
    def hit(c: Column): Column = when(c.isNotNull, 1).otherwise(0)
    val scored = flat
      .filter(col("latitude").isNotNull && col("longitude").isNotNull)
      .withColumn("score",
        hit(col("city")) + hit(col("city_latitude")) + hit(col("city_longitude")) +
        hit(col("county")) + hit(col("state")) + hit(col("country")) +
        hit(col("latitude")) + hit(col("longitude")))
    // Reference orders by score only (nondeterministic ties in both
    // BigQuery and Spark — SURVEY §2.5 caveat); extra keys below pick a
    // stable winner among equal-score rows without changing which rows
    // are *valid* winners.
    val deduped = top1(scored, col("from_location_id"), col("score").desc,
      col("city"), col("state"), col("county"), col("country"),
      col("city_latitude"), col("city_longitude"))

    // final projection (lines 158-168)
    deduped.select("from_location_id", "original_locale", "city", "county",
      "state", "country", "city_latitude", "city_longitude")
  }
}
