package graft.models

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.BqFunctions._

/** Port of models/marts/user_base.sql (reference file, 83 LoC): the
  * final 33-column BI mart (SURVEY §1.4).
  *
  * Semantics preserved exactly:
  *  - widget-API-key existence flag via plain left join — a user with
  *    2 keys yields 2 rows, as in the reference (J9, user_base.sql:57);
  *  - test-user / race / gender cascades via BqFunctions (13-43);
  *  - age via BigQuery DATE_DIFF year-boundary semantics with SAFE
  *    parse (48-54); `asOf` injectable for deterministic tests
  *    (risk register §7.3 — current_date nondeterminism);
  *  - partner_name fallback cascade (69-73);
  *  - final ORDER BY is presentation-only (O1) and kept.
  *
  * Scale: user_user is the fact; widget keys / attribution / locations
  * are joined on user-grained keys — stacked_users_partners and
  * locations_clean outputs are far smaller than users, so broadcast
  * them when they fit; otherwise all three joins co-partition on the
  * same user_id key.
  */
object UserBase {

  def apply(src: Map[String, DataFrame],
            asOf: Column = current_date()): DataFrame = {
    val uu     = src("user_user")
    val widget = src("widget_widgetuserapikey").as("widget")
    val upf    = src("stacked_users_partners").as("upf")
    val loc    = src("locations_clean").as("loc")

    // users CTE (lines 2-55)
    val users = uu
      .join(widget, col("widget.user_id") === uu("id"), "left")
      .select(
        uu("id").as("user_id"),
        uu("uuid").as("uuid"),
        uu("first_name").as("first_name"),
        uu("last_name").as("last_name"),
        uu("email").as("email"),
        uu("type").as("user_type"),
        when(col("widget.id").isNotNull, "Widget Account")
          .when(uu("type") === "E", "Advisors")
          .when(uu("type") === "CL", "Cohort Learners")
          .when(uu("type") === "IL", "Independent Learners")
          .as("user_type_full_name"),
        isTestUser(uu("first_name"), uu("last_name"), uu("email")).as("is_test_user"),
        uu("race_ethnicity").as("race_ethnicity"),
        raceBucket(uu("race_ethnicity")).as("race"),
        uu("gender").as("gender"),
        uu("self_describe_gender").as("self_describe_gender"),
        genderBucket(uu("gender")).as("gender_sum"),
        uu("date_joined").as("date_joined"),
        uu("is_active").as("is_active"),
        when(uu("is_active") === false, "deactivated").otherwise("active")
          .as("account_status"),
        uu("is_staff").as("is_staff"),
        ageAsOf(uu("birthday"), asOf).as("age"),
        uu("location_id").as("location_id"))

    // final mart (lines 58-83)
    users
      .join(upf, users("user_id") === col("upf.user_id"), "left")
      .join(loc, users("location_id") === col("loc.from_location_id"), "left")
      .select(
        users("*") +:
        Seq(
          coalesce(col("loc.country"), lit("Prefer Not To Say")).as("country"),
          coalesce(col("loc.state"), lit("Prefer Not To Say")).as("state"),
          coalesce(col("loc.county"), lit("Prefer Not To Say")).as("county"),
          coalesce(col("loc.city"), lit("Prefer Not To Say")).as("city"),
          col("loc.city_latitude").as("city_latitude"),
          col("loc.city_longitude").as("city_longitude"),
          col("upf.partner_id").as("partner_id"),
          when(col("upf.partner_name").isNull && users("user_type") === "CL",
            "No Partner associated with this account")
            .when(col("upf.partner_name").isNull && users("user_type") === "E",
              "No Partner associated with this account")
            .when(users("user_type") === "IL", lit(null))
            .otherwise(col("upf.partner_name")).as("partner_name"),
          col("upf.partner_code").as("partner_code"),
          col("upf.classroom_id").as("classroom_id"),
          col("upf.classroom_name").as("classroom_name"),
          col("upf.classroom_code").as("classroom_code"),
          col("upf.site_id").as("site_id"),
          col("upf.site_name").as("site_name")): _*)
      .orderBy(col("user_id"), col("partner_id"), col("classroom_id"), col("site_id"))
  }
}
