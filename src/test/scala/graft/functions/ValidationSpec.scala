package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** T3-T5 matrix from the reference's service tests
  * (employees_internal_test.go:136-266 and employees.go:160-241).
  */
class ValidationSpec extends SparkSpec {
  import spark.implicits._

  private def emails(rows: (Long, String)*) =
    rows.toSeq.toDF("id", "email")

  test("valid emails pass through unchanged") {
    val out = emails((1L, "new@example.com"), (2L, "User2@Example.COM"))
      .select(Validation.repairEmail($"email", $"id").as("e"))
      .as[String].collect()
    assert(out.toSet == Set("new@example.com", "User2@Example.COM"))
  }

  test("empty, null and invalid emails are repaired deterministically") {
    val df = emails((1L, ""), (2L, "12345"), (3L, null))
    val out = df.select(Validation.repairEmail($"email", $"id").as("e"))
      .as[String].collect()
    assert(out.forall(_.endsWith("@placeholder.local")))
    // deterministic: same seed → same repair on re-run (replay safety)
    val again = df.select(Validation.repairEmail($"email", $"id").as("e"))
      .as[String].collect()
    assert(out.sameElements(again))
    // distinct seeds → distinct addresses
    assert(out.distinct.length == 3)
  }

  test("repair flag feeds the emails_fixed tally (A3)") {
    val n = emails((1L, "ok@example.com"), (2L, "bad"), (3L, ""), (4L, null))
      .where(Validation.emailWasRepaired($"email")).count()
    assert(n == 3)
  }

  test("phone validation: E.164 after stripping spaces and hyphens") {
    val cases = Seq(
      ("0961234567", true),          // fixture employees_internal_test.go
      ("+1 416-555-0123", true),     // separators stripped
      ("phone123", false),
      ("+123456789012345678", false), // > 15 digits
      ("", false),
      (null.asInstanceOf[String], false))
    val df = cases.zipWithIndex
      .map { case ((p, exp), i) => (i.toLong, p, exp) }
      .toDF("id", "phone", "expected")
    val bad = df.where(Validation.isValidPhone($"phone") =!= $"expected").count()
    assert(bad == 0)
  }
}
