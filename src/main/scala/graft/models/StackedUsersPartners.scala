package graft.models

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Port of models/intermediate/stacked_users_partners.sql (reference
  * file, 118 LoC): user↔partner attribution via 4 UNION ALL routes,
  * then per-key dedup. Output: 9 columns (SURVEY §1.4).
  *
  * Semantics preserved exactly:
  *  - left-join fan-out through invite codes is intentional (SURVEY
  *    §2.3 join-multiplicity note) — dedup happens only in the final
  *    GROUP BY 1..9 (≡ distinct);
  *  - route 3 joins users on lower(trim(email)) with residual
  *    `type != 'IL'` (stacked_users_partners.sql:57);
  *  - untyped NULL literals become explicit casts (lines 4,26,46,
  *    68,75-77) — Spark unions are positional.
  *
  * Scale: classroom/site/partner/invite-code tables are dimensions —
  * broadcast; membership/action tables are the facts. The final
  * distinct is one shuffle on all 9 columns.
  */
object StackedUsersPartners {

  private val nullLong   = lit(null).cast(LongType)
  private val nullString = lit(null).cast(StringType)

  def apply(src: Map[String, DataFrame]): DataFrame = {
    val eclm = src("educator_classroomlearnermembership")
    val ece  = src("educator_classroom_educators")
    val eci  = src("educator_classroominvitation")
    val ecic = src("educator_classroominvitecode").as("ecic")
    val ec   = src("educator_classroom")
    val us   = src("user_site")
    val up   = src("user_partner")
    val upic = src("user_partnerinvitecode").as("upic")
    val uu   = src("user_user")
    val act  = src("action_userjoinsaction")

    /** classroom → site → partner → partner/classroom invite codes,
      * shared by routes 1-3 (lines 15-19, 36-40, 58-62). */
    def classroomTail(base: DataFrame, classroomKey: Column, joinType: String): DataFrame =
      base
        .join(broadcast(ec), classroomKey === ec("id"), joinType)
        .join(broadcast(us), ec("site_id") === us("id"), "left")
        .join(broadcast(up), us("partner_id") === up("id"), "left")
        .join(broadcast(upic), col("upic.partner_id") === up("id"), "left")
        .join(broadcast(ecic), col("ecic.classroom_id") === ec("id"), "left")

    /** The 8 shared attribution columns for classroom-tail routes. */
    def tailCols: Seq[Column] = Seq(
      ec("site_id").as("site_id"),
      us("name").as("site_name"),
      up("id").as("partner_id"),
      up("name").as("partner_name"),
      col("upic.code").as("partner_code"),
      ec("id").as("classroom_id"),
      ec("name").as("classroom_name"),
      col("ecic.code").as("classroom_code"))

    // Route 1: learners via classroom membership (lines 3-19)
    val r1 = classroomTail(eclm, eclm("classroom_id"), "left")
      .select(nullLong.as("educator_id") +: eclm("user_id").as("learner_id") +: tailCols: _*)

    // Route 2: educators via classroom (lines 23-40)
    val r2 = classroomTail(ece, ece("classroom_id"), "left")
      .select(ece("user_id").as("educator_id") +: nullLong.as("learner_id") +: tailCols: _*)

    // Route 3: learners via classroom invitation, email-matched (lines 44-62)
    val r3base = eci.join(uu,
      lower(trim(uu("email"))) === lower(trim(eci("email"))) && uu("type") =!= "IL")
    val r3 = classroomTail(r3base, eci("classroom_id"), "inner")
      .select(nullLong.as("educator_id") +: uu("id").as("learner_id") +: tailCols: _*)

    // Route 4: learners via partner invite code action (lines 66-83)
    val upic4 = src("user_partnerinvitecode").as("upic4")
    val r4 = act.filter(act("action_type") === "userjoins")
      .join(uu, uu("id") === act("user_id") && uu("type") =!= "IL")
      .join(broadcast(upic4), act("partner_invite_code_id") === col("upic4.id"))
      .join(broadcast(up), up("id") === col("upic4.partner_id"), "left")
      .join(broadcast(us), col("upic4.site_id") === us("id"), "left")
      .select(
        nullLong.as("educator_id"),
        uu("id").as("learner_id"),
        col("upic4.site_id").as("site_id"),
        us("name").as("site_name"),
        up("id").as("partner_id"),
        up("name").as("partner_name"),
        col("upic4.code").as("partner_code"),
        nullLong.as("classroom_id"),
        nullString.as("classroom_name"),
        nullString.as("classroom_code"))

    val attributions = r1.unionAll(r2).unionAll(r3).unionAll(r4)

    val nine = Seq("partner_id", "partner_name", "partner_code", "classroom_id",
      "classroom_name", "classroom_code", "site_id", "site_name")

    // Final stack: educator-keyed ∪ learner-keyed halves, GROUP BY
    // 1..9 with no agg ≡ distinct (lines 86-114)
    val educators = attributions.filter(col("educator_id").isNotNull)
      .select(col("educator_id").as("user_id") +: nine.map(col): _*).distinct()
    val learners = attributions.filter(col("learner_id").isNotNull)
      .select(col("learner_id").as("user_id") +: nine.map(col): _*).distinct()

    educators.unionAll(learners)
  }
}
