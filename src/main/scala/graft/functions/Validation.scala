package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Email/phone validation & repair (reference T3-T5,
  * /root/reference/internal/services/employees/employees.go:160-241).
  *
  * Everything here is pure `org.apache.spark.sql.functions` — codegen'd
  * column expressions, no UDFs, so the whole repair pipeline stays
  * inside WholeStageCodegen and is trivially distributable.
  */
object Validation {

  /** RFC-5322 approximation. The reference delegates to Go's
    * `net/mail.ParseAddress` (employees.go:228-231); a full RFC parser
    * is deliberately NOT replicated — this regex accepts the practical
    * address space and is expressible as a codegen'd `rlike`.
    */
  val EmailRegex = "^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}$"

  /** E.164 after stripping spaces/hyphens — exactly the reference's
    * regex `^\+?[0-9]\d{1,14}$` (employees.go:234-241).
    */
  val PhoneRegex = "^\\+?[0-9]\\d{1,14}$"

  def isValidEmail(email: Column): Column =
    email.isNotNull && email.rlike(EmailRegex)

  def normalizePhone(phone: Column): Column =
    regexp_replace(phone, "[ -]", "")

  def isValidPhone(phone: Column): Column =
    phone.isNotNull && normalizePhone(phone).rlike(PhoneRegex)

  /** Deterministic generated address for empty/invalid emails.
    *
    * The reference generates a *random* email (employees.go:172,181 via
    * randomail) — deliberately diverged to a seeded hash of the row key
    * so repairs are reproducible and idempotent across replays (a replay
    * of the same batch must not produce a new row diff; see SURVEY.md
    * §7.3 "MERGE atomicity").
    */
  def generatedEmail(seed: Column): Column =
    concat(lit("gen-"), substring(md5(seed.cast("string")), 1, 12),
      lit("@placeholder.local"))

  /** T3: keep valid emails, replace empty/invalid with the generated one. */
  def repairEmail(email: Column, seed: Column): Column =
    when(isValidEmail(email), email).otherwise(generatedEmail(seed))

  /** Repair-count flag (feeds the emails_fixed_total metric,
    * /root/reference/internal/metrics/metrics.go:88-112): A3 tally is
    * `filter(wasRepaired).count()`.
    */
  def emailWasRepaired(email: Column): Column = !isValidEmail(email)
}
