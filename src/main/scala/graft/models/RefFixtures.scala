package graft.models

import org.apache.spark.sql.{DataFrame, SparkSession}

// Fixture row shapes for the 14 reference source tables (FIXTURES.md §1);
// Options model nullables. Field order = FIXTURES.md column order — the
// DuckDB VALUES renderer below iterates productIterator in this order.
case class UU(id: Long, uuid: String, first_name: String, last_name: String,
    email: String, `type`: String, race_ethnicity: Option[String],
    gender: Option[String], self_describe_gender: Option[String],
    date_joined: java.sql.Timestamp, is_active: Boolean, is_staff: Boolean,
    birthday: Option[String], location_id: Option[Long])
case class Widget(id: Long, user_id: Long)
case class EC(id: Long, site_id: Option[Long], name: String)
case class ECLM(user_id: Long, classroom_id: Long)
case class ECE(user_id: Long, classroom_id: Long)
case class ECI(email: String, classroom_id: Long)
case class ECIC(code: String, classroom_id: Long)
case class Site(id: Long, name: String, partner_id: Long)
case class Partner(id: Long, name: String)
case class UPIC(id: Long, code: String, partner_id: Long, site_id: Long)
case class Action(user_id: Long, partner_invite_code_id: Long, action_type: String)
case class Loc(id: Long, display_name: String, long_name: String,
    latitude: Option[Double], longitude: Option[Double], slug: String)
case class LLAC(from_location_id: Long, to_location_id: Long)
case class LType(location_id: Long, locationtype_id: Long)

/** Shared reference-model fixtures (FIXTURES.md §3 edge cases) — the
  * single definition feeding BOTH the Spark DataFrames the models run
  * over AND the self-contained DuckDB `VALUES` CTEs the driver oracle
  * replays (ReferenceModelOracles). One Seq per table: editing a
  * fixture row updates engine and oracle together, so they cannot
  * desynchronize.
  */
object RefFixtures {
  def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")

  val userUser: Seq[UU] = Seq(
    UU(1, "u1", "Ann", "Lee", "educator1@example.com", "E",
      Some("White, Other"), Some("Man, Woman"), None, ts("2020-01-01"),
      true, false, Some("04-1987"), Some(100L)),
    UU(2, "u2", "Bob", "Kim", "bob@example.com", "CL", None, None, None,
      ts("2021-02-02"), true, false, None, None),
    UU(3, "u3", "Cal", "Rey", "cal@example.com", "IL",
      Some("Prefer not to say"), Some("Prefer to self-describe"),
      Some("fluid"), ts("2021-03-03"), true, false, Some("01-2000"), None),
    UU(4, "u4", "Dee", "Soto", "dee@example.com", "CL",
      Some("Hispanic or Latinx"), Some("Woman"), None, ts("2022-04-04"),
      true, false, Some("xx-abcd"), Some(200L)),
    UU(5, "u5", "Te st", "User", "educatorst1@example.com", "E",
      Some("Other"), Some("Man"), None, ts("2022-05-05"), false, true,
      Some("12-2010"), None),
    UU(6, "u6", "Fay", "Wu", "fay@example.com", "CL",
      Some("South Asian"), Some("Nonbinary"), None, ts("2023-06-06"),
      true, false, Some("08-1990"), Some(300L)),
    UU(7, "u7", "Gil", "Ona", "gil@example.com", "CL",
      Some("Native American or Alaska Native"), Some("Woman"), None,
      ts("2023-07-07"), true, false, Some("09-1995"), None))

  val widgets: Seq[Widget] = Seq(Widget(1, 2), Widget(2, 2))
  val classrooms: Seq[EC] = Seq(
    EC(1, Some(10L), "Alpha"), EC(2, Some(10L), "Beta"), EC(3, None, "NoSite"))
  val learnerMemberships: Seq[ECLM] = Seq(ECLM(2, 1), ECLM(6, 1), ECLM(6, 2))
  val classroomEducators: Seq[ECE] = Seq(ECE(1, 1))
  val invitations: Seq[ECI] = Seq(ECI(" Educator1@Example.com ", 2))
  val classroomCodes: Seq[ECIC] = Seq(ECIC("CC1", 1))
  val sites: Seq[Site] = Seq(Site(10, "Site A", 20))
  val partners: Seq[Partner] = Seq(Partner(20, "Partner X"))
  val partnerCodes: Seq[UPIC] = Seq(
    UPIC(30, "PC1", 20, 10), UPIC(31, "PC2", 20, 10))
  val actions: Seq[Action] = Seq(
    Action(4, 30, "userjoins"), Action(4, 31, "other"))
  val locations: Seq[Loc] = Seq(
    Loc(100, "123 Main St", "123 Main St", Some(40.0), Some(-75.0), "main"),
    Loc(101, "Springfield", "Springfield", Some(40.05), Some(-75.0), "sprg"),
    Loc(102, "Shelbyville", "Shelbyville", Some(41.0), Some(-75.0), "shlb"),
    Loc(103, "Pennsylvania", "Pennsylvania", Some(41.2), Some(-77.2), "pa"),
    Loc(104, "United States", "United States of America", Some(39.8), Some(-98.6), "us"),
    Loc(105, "Mont County", "Mont County", Some(40.2), Some(-75.4), "mont"),
    Loc(200, "Nowhere", "Nowhere", None, None, "nowhere"),
    Loc(300, "Seoul", "Seoul", Some(37.55), Some(126.99), "seoul"),
    Loc(400, "Faraway Village", "Faraway Village", Some(40.0), Some(-75.0), "far"),
    Loc(401, "North Town", "North Town", Some(50.0), Some(-75.0), "nt"),
    Loc(402, "South Town", "South Town", Some(50.1), Some(-75.0), "st2"),
    Loc(500, "456 Oak Ave", "456 Oak Ave", Some(40.0), Some(-75.0), "oak"),
    Loc(501, "Cedar Town", "Cedar Town", Some(50.0), Some(-74.0), "ct"),
    Loc(502, "Pine Town", "Pine Town", Some(50.2), Some(-74.0), "pt"))
  val addressComponents: Seq[LLAC] = Seq(
    LLAC(100, 101), LLAC(100, 102), LLAC(100, 103), LLAC(100, 104), LLAC(100, 105),
    LLAC(400, 401), LLAC(400, 402),
    LLAC(500, 501), LLAC(500, 502))
  val locationTypes: Seq[LType] = Seq(
    LType(101, 3), LType(102, 4), LType(103, 7), LType(104, 1), LType(105, 8),
    LType(401, 3), LType(402, 4), LType(501, 3), LType(502, 4))

  def sources(spark: SparkSession): Map[String, DataFrame] = {
    import spark.implicits._
    Map(
      "user_user" -> userUser.toDF,
      "widget_widgetuserapikey" -> widgets.toDF,
      "educator_classroom" -> classrooms.toDF,
      "educator_classroomlearnermembership" -> learnerMemberships.toDF,
      "educator_classroom_educators" -> classroomEducators.toDF,
      "educator_classroominvitation" -> invitations.toDF,
      "educator_classroominvitecode" -> classroomCodes.toDF,
      "user_site" -> sites.toDF,
      "user_partner" -> partners.toDF,
      "user_partnerinvitecode" -> partnerCodes.toDF,
      "action_userjoinsaction" -> actions.toDF,
      "location_location" -> locations.toDF,
      "location_location_address_components" -> addressComponents.toDF,
      "location_location_types" -> locationTypes.toDF)
  }

  // ---- DuckDB rendering (oracle side) ----------------------------------

  private def sqlLit(v: Any): String = v match {
    case null | None => "NULL"
    case Some(x) => sqlLit(x)
    case s: String => "'" + s.replace("'", "''") + "'"
    case t: java.sql.Timestamp => s"TIMESTAMP '${t.toString}'"
    case b: Boolean => if (b) "TRUE" else "FALSE"
    case other => other.toString // Long / Int / Double
  }

  /** `name AS (SELECT CAST.. FROM (VALUES ..))` — explicit casts pin the
    * DuckDB column types to the Spark fixture schema even when a column
    * is all-NULL in the VALUES list. */
  private def cte(name: String, cols: Seq[(String, String)], rows: Seq[Product]): String = {
    val sel = cols.map { case (c, t) => s"CAST($c AS $t) AS $c" }.mkString(", ")
    val vals = rows.map(_.productIterator.map(sqlLit).mkString("(", ", ", ")")).mkString(", ")
    val names = cols.map(_._1).mkString(", ")
    s"$name AS (SELECT $sel FROM (VALUES $vals) AS v($names))"
  }

  private val B = "BIGINT"; private val V = "VARCHAR"; private val D = "DOUBLE"

  /** All 14 source tables as self-contained DuckDB CTE bodies, keyed by
    * the reference's source-table name. */
  lazy val duckCtes: Map[String, String] = Map(
    "user_user" -> cte("user_user", Seq("id" -> B, "uuid" -> V, "first_name" -> V,
      "last_name" -> V, "email" -> V, "type" -> V, "race_ethnicity" -> V,
      "gender" -> V, "self_describe_gender" -> V, "date_joined" -> "TIMESTAMP",
      "is_active" -> "BOOLEAN", "is_staff" -> "BOOLEAN", "birthday" -> V,
      "location_id" -> B), userUser),
    "widget_widgetuserapikey" -> cte("widget_widgetuserapikey",
      Seq("id" -> B, "user_id" -> B), widgets),
    "educator_classroom" -> cte("educator_classroom",
      Seq("id" -> B, "site_id" -> B, "name" -> V), classrooms),
    "educator_classroomlearnermembership" -> cte("educator_classroomlearnermembership",
      Seq("user_id" -> B, "classroom_id" -> B), learnerMemberships),
    "educator_classroom_educators" -> cte("educator_classroom_educators",
      Seq("user_id" -> B, "classroom_id" -> B), classroomEducators),
    "educator_classroominvitation" -> cte("educator_classroominvitation",
      Seq("email" -> V, "classroom_id" -> B), invitations),
    "educator_classroominvitecode" -> cte("educator_classroominvitecode",
      Seq("code" -> V, "classroom_id" -> B), classroomCodes),
    "user_site" -> cte("user_site",
      Seq("id" -> B, "name" -> V, "partner_id" -> B), sites),
    "user_partner" -> cte("user_partner", Seq("id" -> B, "name" -> V), partners),
    "user_partnerinvitecode" -> cte("user_partnerinvitecode",
      Seq("id" -> B, "code" -> V, "partner_id" -> B, "site_id" -> B), partnerCodes),
    "action_userjoinsaction" -> cte("action_userjoinsaction",
      Seq("user_id" -> B, "partner_invite_code_id" -> B, "action_type" -> V), actions),
    "location_location" -> cte("location_location",
      Seq("id" -> B, "display_name" -> V, "long_name" -> V, "latitude" -> D,
        "longitude" -> D, "slug" -> V), locations),
    "location_location_address_components" -> cte("location_location_address_components",
      Seq("from_location_id" -> B, "to_location_id" -> B), addressComponents),
    "location_location_types" -> cte("location_location_types",
      Seq("location_id" -> B, "locationtype_id" -> B), locationTypes))
}
