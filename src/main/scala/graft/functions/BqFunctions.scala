package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** BigQuery-dialect shims as pure Column compositions (no UDFs — every
  * function here stays inside whole-stage codegen; SURVEY §2.8–§2.10).
  *
  * Each mirrors a construct of the reference exactly; file:line cites
  * point at /root/reference.
  */
object BqFunctions {

  /** dbt macro `coalesce_trim` (macros/utils.sql:1-3) — defined in the
    * reference but never invoked; provided for API completeness. */
  def coalesceTrim(c: Column, fallback: Column): Column =
    coalesce(trim(c), fallback)

  /** BigQuery DATE_DIFF(d1, d2, YEAR): count of year-boundary crossings,
    * NOT elapsed years (user_base.sql:50-54). year(d1)-year(d2) is the
    * exact semantics. */
  def dateDiffYears(later: Column, earlier: Column): Column =
    year(later) - year(earlier)

  /** BigQuery SAFE.PARSE_DATE('%Y-%m-%d', s): null on failure
    * (user_base.sql:52). try_to_date never throws, even under ANSI. */
  def safeParseDateIso(s: Column): Column =
    try_to_date(s, "yyyy-MM-dd")

  /** The mart's age computation (user_base.sql:48-54): birthday is a
    * STRING laid out 'MM-YYYY…' — substr(4,4)=year, substr(1,2)=month;
    * subtract 1 if this year's (month,01) hasn't been reached by
    * `asOf`. Null birthday or unparsable year ⇒ null age. */
  def ageAsOf(birthday: Column, asOf: Column): Column = {
    val parsed = safeParseDateIso(
      concat(substring(birthday, 4, 4), lit("-"), substring(birthday, 1, 2), lit("-01")))
    val notYet = when(
      date_format(asOf, "MMdd") < concat(substring(birthday, 1, 2), lit("01")), 1)
      .otherwise(0)
    when(birthday.isNull, lit(null).cast(IntegerType))
      .otherwise(dateDiffYears(asOf, parsed) - notYet)
  }

  /** ST_DISTANCE(st_geogpoint(lon1,lat1), st_geogpoint(lon2,lat2)) in
    * miles (locations_clean.sql:48). Haversine on a sphere
    * (R=3958.7613 mi); BigQuery's spheroid differs ≤0.5% — the oracle
    * uses this same formula (SURVEY §7.3). */
  def haversineMiles(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1) / 2
    val dLon = radians(lon2 - lon1) / 2
    val a = pow(sin(dLat), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon), 2)
    lit(3958.7613) * 2 * asin(sqrt(a))
  }

  /** Test-user detection (user_base.sql:13-16): whitespace-stripped
    * lowercase name/email contains 'test', or the literal email. */
  def isTestUser(firstName: Column, lastName: Column, email: Column): Column = {
    def strip(c: Column) = regexp_replace(lower(trim(c)), "\\s+", "")
    coalesce(
      strip(firstName).like("%test%") || strip(lastName).like("%test%") ||
        strip(email).like("%test%") || email.like("educatorst1@example.com"),
      lit(false))
  }

  /** Race/ethnicity bucketing cascade (user_base.sql:18-34), preserved
    * verbatim including the asymmetric LIKE patterns (e.g.
    * '%Native American or Alaska Native' has no trailing wildcard) and
    * the equality-like branches ('Hispanic or Latinx' without %). */
  def raceBucket(r: Column): Column = {
    val categoryHits =
      when(r.like("%White%"), 1).otherwise(0) +
      when(r.like("%Hispanic%") || r.like("%Latinx%"), 1).otherwise(0) +
      when(r.like("%Black%") || r.like("%African American%"), 1).otherwise(0) +
      when(r.like("%South Asian%") || r.like("%East Asian%"), 1).otherwise(0) +
      when(r.like("%Native Hawaiian or other Pacific Islander%"), 1).otherwise(0) +
      when(r.like("%Native American or Alaska Native"), 1).otherwise(0) +
      when(r.like("%Other%"), 1).otherwise(0)
    when(lower(r).like("%prefer not to say%") || r.isNull, "Prefer Not To Say")
      .when(categoryHits > 1, "Multiracial")
      .when(r.like("Hispanic or Latinx"), "Hispanic")
      .when(r.like("Black or African American"), "Black")
      .when(r.like("%South Asian%") || r.like("%East Asian%"), "Asian")
      .when(r.like("Native Hawaiian or other Pacific Islander"),
        "Native Hawaiian or other Pacific Islander")
      .when(r.like("Native American or Alaska Native"),
        "Native American or Alaska Native")
      .when(r.like("White"), "White")
      .when(r.like("Other"), "Other")
      .otherwise("Other")
  }

  /** Gender normalization cascade (user_base.sql:37-43), incl. the
    * "Man and Woman ⇒ Prefer Not To Say" rule. */
  def genderBucket(g: Column): Column =
    when(g.like("%Prefer not to say%") || g.isNull, "Prefer Not To Say")
      .when(g.like("%Prefer to self-describe%"), "Prefer Not To Say")
      .when(g.like("%Man%") && g.like("%Woman%"), "Prefer Not To Say")
      .when(g.like("%Man%"), "Man")
      .when(g.like("%Woman%"), "Woman")
      .otherwise("Non-binary")
}
