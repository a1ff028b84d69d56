package graft.queries

import graft.models.RefFixtures

/** Self-contained DuckDB replays of the three reference models — the
  * oracle side of [[ReferenceModelQueries]]. The fixture tables are
  * rendered from the same Scala Seqs the Spark side runs over
  * ([[RefFixtures.duckCtes]]), so both engines see byte-identical
  * inputs; the SQL below re-derives the model semantics (documented
  * construct-by-construct in graft.models.*) in DuckDB's dialect.
  *
  * Dialect notes that MUST hold for hash parity:
  *  - Spark ascending sort puts NULLS FIRST; DuckDB defaults to NULLS
  *    LAST — every window ORDER BY over nullable keys says NULLS FIRST.
  *  - Spark regexp_replace replaces every match; DuckDB needs the 'g'
  *    flag.
  *  - Spark `rlike` is a partial match, like DuckDB regexp_matches.
  *  - Untyped NULLs in UNION ALL branches carry explicit CASTs (Spark
  *    unions are positional and typed).
  */
object ReferenceModelOracles {

  private def fix(names: String*): String =
    names.map(RefFixtures.duckCtes(_)).mkString(",\n")

  private val asOf = s"DATE '${ReferenceModelQueries.asOfDate}'"

  // ---- locations_clean ---------------------------------------------------

  /** Haversine miles, identical formula/op-order to
    * BqFunctions.haversineMiles(latA, lonA, latB, lonB). */
  private def hav(latA: String, lonA: String, latB: String, lonB: String) =
    s"3958.7613 * 2 * asin(sqrt(pow(sin(radians($latB - $latA) / 2), 2) + " +
    s"cos(radians($latA)) * cos(radians($latB)) * pow(sin(radians($lonB - $lonA) / 2), 2)))"

  private val locationsCleanChain = s"""
location_components AS (
  SELECT a.from_location_id, l.id AS to_location_id, l.display_name,
         l.long_name, l.latitude, l.longitude, t.locationtype_id
  FROM location_location_address_components a
  JOIN location_location l ON a.to_location_id = l.id
  JOIN location_location_types t ON a.to_location_id = t.location_id
  WHERE t.locationtype_id IN (1, 3, 4, 7, 8)
  UNION ALL
  SELECT l.id, l.id, l.display_name, l.long_name, l.latitude, l.longitude,
         t.locationtype_id
  FROM location_location l
  JOIN location_location_types t ON l.id = t.location_id
  WHERE t.locationtype_id IN (1, 3, 4, 7, 8)
),
multi AS (
  SELECT from_location_id FROM location_components
  WHERE locationtype_id IN (3, 4) AND from_location_id != to_location_id
  GROUP BY 1 HAVING count(DISTINCT display_name) > 1
),
city_candidates AS (
  SELECT fl.id AS from_location_id, c.to_location_id,
         c.display_name AS city, c.latitude AS city_latitude,
         c.longitude AS city_longitude, fl.display_name AS original_locale,
         fl.latitude AS og_latitude, fl.longitude AS og_longitude,
         ${hav("c.latitude", "c.longitude", "fl.latitude", "fl.longitude")} AS distance_from_origin
  FROM multi m
  JOIN location_location fl ON fl.id = m.from_location_id
  JOIN location_components c
    ON c.from_location_id = fl.id AND c.locationtype_id IN (3, 4)
  WHERE fl.latitude IS NOT NULL AND fl.longitude IS NOT NULL
    AND c.latitude IS NOT NULL AND c.longitude IS NOT NULL
),
nearest AS (
  SELECT * FROM city_candidates
  QUALIFY row_number() OVER (PARTITION BY from_location_id
    ORDER BY distance_from_origin, to_location_id) = 1
),
rep AS (
  SELECT from_location_id, to_location_id, original_locale, distance_from_origin,
    CASE WHEN distance_from_origin > 10
      AND NOT regexp_matches(lower(original_locale), '\\d{1,5}\\s+\\w+')
      AND NOT regexp_matches(lower(original_locale), '^[0-9a-z]{4}\\+[0-9a-z]{2,}')
      AND NOT regexp_matches(lower(original_locale), '\\bst\\b|\\bave\\b|\\brd\\b|\\bdr\\b|\\bln\\b')
      AND lower(original_locale) NOT LIKE '%county%'
      THEN original_locale ELSE city END AS city_replace,
    CASE WHEN distance_from_origin > 10 THEN og_latitude ELSE city_latitude END
      AS city_latitude_replace,
    CASE WHEN distance_from_origin > 10 THEN og_longitude ELSE city_longitude END
      AS city_longitude_replace,
    og_latitude, og_longitude
  FROM nearest
),
best_country AS (
  SELECT * FROM location_components WHERE locationtype_id = 1
  QUALIFY row_number() OVER (PARTITION BY from_location_id ORDER BY to_location_id) = 1
),
best_state AS (
  SELECT * FROM location_components WHERE locationtype_id = 7
  QUALIFY row_number() OVER (PARTITION BY from_location_id ORDER BY to_location_id) = 1
),
best_county AS (
  SELECT * FROM location_components WHERE locationtype_id = 8
  QUALIFY row_number() OVER (PARTITION BY from_location_id ORDER BY to_location_id) = 1
),
best_city AS (
  SELECT * FROM location_components WHERE locationtype_id IN (3, 4)
  QUALIFY row_number() OVER (PARTITION BY from_location_id ORDER BY to_location_id) = 1
),
loc_flat AS (
  SELECT base.id AS from_location_id,
    base.display_name AS original_locale,
    CASE WHEN rep.city_replace IS NOT NULL THEN rep.city_replace
         WHEN bt.locationtype_id = 1 THEN NULL
         WHEN bcity.display_name IS NOT NULL THEN bcity.display_name
         WHEN base.display_name = 'Seoul' THEN base.display_name
         ELSE NULL END AS city,
    coalesce(rep.city_latitude_replace, bcity.latitude, base.latitude) AS city_latitude,
    coalesce(rep.city_longitude_replace, bcity.longitude, base.longitude) AS city_longitude,
    bcty.display_name AS county,
    CASE WHEN bt.locationtype_id = 1 THEN NULL
         WHEN bst.display_name = bcn.long_name THEN NULL
         WHEN bst.display_name IS NOT NULL THEN bst.display_name
         ELSE NULL END AS state,
    bcn.long_name AS country,
    base.latitude AS latitude, base.longitude AS longitude
  FROM location_location base
  LEFT JOIN rep ON base.id = rep.from_location_id
  LEFT JOIN best_county bcty ON base.id = bcty.from_location_id
  LEFT JOIN best_state bst ON base.id = bst.from_location_id
  LEFT JOIN best_country bcn ON base.id = bcn.from_location_id
  LEFT JOIN location_location_types bt ON base.id = bt.location_id
  LEFT JOIN best_city bcity ON base.id = bcity.from_location_id
),
loc_scored AS (
  SELECT *,
    (CASE WHEN city IS NOT NULL THEN 1 ELSE 0 END +
     CASE WHEN city_latitude IS NOT NULL THEN 1 ELSE 0 END +
     CASE WHEN city_longitude IS NOT NULL THEN 1 ELSE 0 END +
     CASE WHEN county IS NOT NULL THEN 1 ELSE 0 END +
     CASE WHEN state IS NOT NULL THEN 1 ELSE 0 END +
     CASE WHEN country IS NOT NULL THEN 1 ELSE 0 END +
     CASE WHEN latitude IS NOT NULL THEN 1 ELSE 0 END +
     CASE WHEN longitude IS NOT NULL THEN 1 ELSE 0 END) AS score
  FROM loc_flat
  WHERE latitude IS NOT NULL AND longitude IS NOT NULL
),
locations_clean AS (
  SELECT from_location_id, original_locale, city, county, state, country,
         city_latitude, city_longitude
  FROM loc_scored
  QUALIFY row_number() OVER (PARTITION BY from_location_id
    ORDER BY score DESC, city NULLS FIRST, state NULLS FIRST,
             county NULLS FIRST, country NULLS FIRST,
             city_latitude NULLS FIRST, city_longitude NULLS FIRST) = 1
)"""

  val qLocationsClean: String =
    "WITH " + fix("location_location", "location_location_address_components",
      "location_location_types") + "," + locationsCleanChain +
    "\nSELECT * FROM locations_clean"

  // ---- stacked_users_partners --------------------------------------------

  /** The 8 shared attribution columns of the classroom-tail routes. */
  private val tailCols = """ec.site_id AS site_id, us.name AS site_name,
    up.id AS partner_id, up.name AS partner_name, upic.code AS partner_code,
    ec.id AS classroom_id, ec.name AS classroom_name, ecic.code AS classroom_code"""

  private def classroomTail(joinType: String, classroomKey: String) = s"""
  $joinType JOIN educator_classroom ec ON $classroomKey = ec.id
  LEFT JOIN user_site us ON ec.site_id = us.id
  LEFT JOIN user_partner up ON us.partner_id = up.id
  LEFT JOIN user_partnerinvitecode upic ON upic.partner_id = up.id
  LEFT JOIN educator_classroominvitecode ecic ON ecic.classroom_id = ec.id"""

  private val stackedChain = s"""
r1 AS (
  SELECT CAST(NULL AS BIGINT) AS educator_id, m.user_id AS learner_id, $tailCols
  FROM educator_classroomlearnermembership m
  ${classroomTail("LEFT", "m.classroom_id")}
),
r2 AS (
  SELECT e.user_id AS educator_id, CAST(NULL AS BIGINT) AS learner_id, $tailCols
  FROM educator_classroom_educators e
  ${classroomTail("LEFT", "e.classroom_id")}
),
r3 AS (
  SELECT CAST(NULL AS BIGINT) AS educator_id, u.id AS learner_id, $tailCols
  FROM educator_classroominvitation i
  JOIN user_user u
    ON lower(trim(u.email)) = lower(trim(i.email)) AND u.type != 'IL'
  ${classroomTail("INNER", "i.classroom_id")}
),
r4 AS (
  SELECT CAST(NULL AS BIGINT) AS educator_id, u.id AS learner_id,
    upic.site_id AS site_id, us.name AS site_name, up.id AS partner_id,
    up.name AS partner_name, upic.code AS partner_code,
    CAST(NULL AS BIGINT) AS classroom_id, CAST(NULL AS VARCHAR) AS classroom_name,
    CAST(NULL AS VARCHAR) AS classroom_code
  FROM action_userjoinsaction a
  JOIN user_user u ON u.id = a.user_id AND u.type != 'IL'
  JOIN user_partnerinvitecode upic ON a.partner_invite_code_id = upic.id
  LEFT JOIN user_partner up ON up.id = upic.partner_id
  LEFT JOIN user_site us ON upic.site_id = us.id
  WHERE a.action_type = 'userjoins'
),
attributions AS (
  SELECT * FROM r1 UNION ALL SELECT * FROM r2
  UNION ALL SELECT * FROM r3 UNION ALL SELECT * FROM r4
),
stacked_users_partners AS (
  SELECT DISTINCT educator_id AS user_id, partner_id, partner_name,
    partner_code, classroom_id, classroom_name, classroom_code,
    site_id, site_name
  FROM attributions WHERE educator_id IS NOT NULL
  UNION ALL
  SELECT DISTINCT learner_id AS user_id, partner_id, partner_name,
    partner_code, classroom_id, classroom_name, classroom_code,
    site_id, site_name
  FROM attributions WHERE learner_id IS NOT NULL
)"""

  private val stackedFixtures = fix("educator_classroomlearnermembership",
    "educator_classroom_educators", "educator_classroominvitation",
    "educator_classroominvitecode", "educator_classroom", "user_site",
    "user_partner", "user_partnerinvitecode", "user_user",
    "action_userjoinsaction")

  val qStackedUsersPartners: String =
    "WITH " + stackedFixtures + "," + stackedChain +
    "\nSELECT * FROM stacked_users_partners"

  // ---- user_base ----------------------------------------------------------

  private def strip(c: String) =
    s"regexp_replace(lower(trim($c)), '\\s+', '', 'g')"

  private def raceHits(r: String) = Seq(
    s"$r LIKE '%White%'",
    s"$r LIKE '%Hispanic%' OR $r LIKE '%Latinx%'",
    s"$r LIKE '%Black%' OR $r LIKE '%African American%'",
    s"$r LIKE '%South Asian%' OR $r LIKE '%East Asian%'",
    s"$r LIKE '%Native Hawaiian or other Pacific Islander%'",
    s"$r LIKE '%Native American or Alaska Native'",
    s"$r LIKE '%Other%'")
    .map(cond => s"CASE WHEN $cond THEN 1 ELSE 0 END")
    .mkString("(", " + ", ")")

  /** raceBucket / genderBucket cascades (BqFunctions) over a column. */
  private def raceCase(r: String) = s"""CASE
       WHEN lower($r) LIKE '%prefer not to say%' OR $r IS NULL THEN 'Prefer Not To Say'
       WHEN ${raceHits(r)} > 1 THEN 'Multiracial'
       WHEN $r LIKE 'Hispanic or Latinx' THEN 'Hispanic'
       WHEN $r LIKE 'Black or African American' THEN 'Black'
       WHEN $r LIKE '%South Asian%' OR $r LIKE '%East Asian%' THEN 'Asian'
       WHEN $r LIKE 'Native Hawaiian or other Pacific Islander'
         THEN 'Native Hawaiian or other Pacific Islander'
       WHEN $r LIKE 'Native American or Alaska Native'
         THEN 'Native American or Alaska Native'
       WHEN $r LIKE 'White' THEN 'White'
       WHEN $r LIKE 'Other' THEN 'Other'
       ELSE 'Other' END"""

  private def genderCase(g: String) = s"""CASE
       WHEN $g LIKE '%Prefer not to say%' OR $g IS NULL THEN 'Prefer Not To Say'
       WHEN $g LIKE '%Prefer to self-describe%' THEN 'Prefer Not To Say'
       WHEN $g LIKE '%Man%' AND $g LIKE '%Woman%' THEN 'Prefer Not To Say'
       WHEN $g LIKE '%Man%' THEN 'Man'
       WHEN $g LIKE '%Woman%' THEN 'Woman'
       ELSE 'Non-binary' END"""

  private val userBaseChain = s"""
users_cte AS (
  SELECT u.id AS user_id, u.uuid, u.first_name, u.last_name, u.email,
    u.type AS user_type,
    CASE WHEN w.id IS NOT NULL THEN 'Widget Account'
         WHEN u.type = 'E' THEN 'Advisors'
         WHEN u.type = 'CL' THEN 'Cohort Learners'
         WHEN u.type = 'IL' THEN 'Independent Learners' END AS user_type_full_name,
    coalesce(${strip("u.first_name")} LIKE '%test%'
          OR ${strip("u.last_name")} LIKE '%test%'
          OR ${strip("u.email")} LIKE '%test%'
          OR u.email LIKE 'educatorst1@example.com', FALSE) AS is_test_user,
    u.race_ethnicity,
    ${raceCase("u.race_ethnicity")} AS race,
    u.gender, u.self_describe_gender,
    ${genderCase("u.gender")} AS gender_sum,
    u.date_joined, u.is_active,
    CASE WHEN u.is_active = FALSE THEN 'deactivated' ELSE 'active' END
      AS account_status,
    u.is_staff,
    CASE WHEN u.birthday IS NULL THEN NULL ELSE
      (year($asOf) - year(try_cast(
         substr(u.birthday, 4, 4) || '-' || substr(u.birthday, 1, 2) || '-01'
         AS DATE)))
      - (CASE WHEN strftime($asOf, '%m%d') < substr(u.birthday, 1, 2) || '01'
              THEN 1 ELSE 0 END)
    END AS age,
    u.location_id
  FROM user_user u
  LEFT JOIN widget_widgetuserapikey w ON w.user_id = u.id
),
user_base AS (
  SELECT ub.*,
    coalesce(loc.country, 'Prefer Not To Say') AS country,
    coalesce(loc.state, 'Prefer Not To Say') AS state,
    coalesce(loc.county, 'Prefer Not To Say') AS county,
    coalesce(loc.city, 'Prefer Not To Say') AS city,
    loc.city_latitude, loc.city_longitude,
    upf.partner_id,
    CASE WHEN upf.partner_name IS NULL AND ub.user_type = 'CL'
           THEN 'No Partner associated with this account'
         WHEN upf.partner_name IS NULL AND ub.user_type = 'E'
           THEN 'No Partner associated with this account'
         WHEN ub.user_type = 'IL' THEN NULL
         ELSE upf.partner_name END AS partner_name,
    upf.partner_code, upf.classroom_id, upf.classroom_name,
    upf.classroom_code, upf.site_id, upf.site_name
  FROM users_cte ub
  LEFT JOIN stacked_users_partners upf ON ub.user_id = upf.user_id
  LEFT JOIN locations_clean loc ON ub.location_id = loc.from_location_id
)"""

  private val allFixtures = fix("user_user", "widget_widgetuserapikey",
    "educator_classroomlearnermembership", "educator_classroom_educators",
    "educator_classroominvitation", "educator_classroominvitecode",
    "educator_classroom", "user_site", "user_partner",
    "user_partnerinvitecode", "action_userjoinsaction", "location_location",
    "location_location_address_components", "location_location_types")

  private val userBaseWith: String =
    "WITH " + allFixtures + "," + locationsCleanChain + "," + stackedChain +
    "," + userBaseChain

  val qUserBase: String = userBaseWith + "\nSELECT * FROM user_base"

  /** marts_schema.yml:6-15 checks over the mart CTE. */
  val qUserBaseChecks: String = userBaseWith + s"""
SELECT 'not_null_user_id' AS check_name,
       (SELECT count(*) FROM user_base WHERE user_id IS NULL) AS violations
UNION ALL
SELECT 'unique_user_partner_site' AS check_name,
       (SELECT count(*) FROM (
          SELECT user_id, partner_id, site_id FROM user_base
          GROUP BY 1, 2, 3 HAVING count(*) > 1)) AS violations"""

  val all: Map[String, String] = Map(
    "q_locations_clean" -> qLocationsClean,
    "q_stacked_users_partners" -> qStackedUsersPartners,
    "q_user_base" -> qUserBase,
    "q_user_base_checks" -> qUserBaseChecks)
}
