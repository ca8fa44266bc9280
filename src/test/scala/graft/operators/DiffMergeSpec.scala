package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** T6/J2/K1-K3 routing matrix (employees_internal_test.go:136-266:
  * hash-match no-op, insert, update, skip-identical; plus null-flip
  * coverage the reference can't express).
  */
class DiffMergeSpec extends SparkSpec {
  import spark.implicits._

  private val incoming = Seq(
    (1L, "New Employee", "new@example.com"),   // absent in current → insert
    (2L, "Updated Name", "updated@example.com"), // differs → update
    (3L, "Same Name", "same@example.com"),     // identical → skip
    (4L, "Null Flip", null)                    // null vs value → update
  ).toDF("id", "name", "email")

  private val current = Seq(
    (2L, "Old Name", "old@example.com"),
    (3L, "Same Name", "same@example.com"),
    (4L, "Null Flip", "was-set@example.com"),
    (5L, "Gone", "gone@example.com")           // absent in incoming
  ).toDF("id", "name", "email")

  test("routeChanges: insert/update/skip/absent with null-safe compare") {
    val routes = DiffMerge.routeChanges(incoming, current,
        Seq("id"), Seq("name", "email"))
      .select($"id", col(DiffMerge.RouteCol))
      .as[(Long, String)].collect().toMap
    assert(routes == Map(
      1L -> DiffMerge.Insert, 2L -> DiffMerge.Update,
      3L -> DiffMerge.Skip, 4L -> DiffMerge.Update,
      5L -> DiffMerge.Absent))
  }

  test("insertIfAbsent keeps current values on collision (ON CONFLICT DO NOTHING)") {
    val merged = DiffMerge.insertIfAbsent(incoming, current, Seq("id"))
    assert(merged.count() == 5)
    val row2 = merged.where($"id" === 2).select($"name").as[String].head()
    assert(row2 == "Old Name") // current wins — insert-only semantics
  }

  test("upsert: incoming wins, untouched current rows survive") {
    val merged = DiffMerge.upsert(incoming, current, Seq("id"))
    assert(merged.count() == 5)
    assert(merged.where($"id" === 2).select($"name").as[String].head() == "Updated Name")
    assert(merged.where($"id" === 5).select($"name").as[String].head() == "Gone")
  }

  test("preserveUnlessChanged mirrors IS DISTINCT FROM under nulls (K3)") {
    val df = Seq(
      ("a", "a", 10),  // unchanged → preserved
      ("a", "b", 20),  // changed → reset
      (null, null, 30),// both null → unchanged → preserved
      (null, "x", 40)  // null→value → changed → reset
    ).toDF("cur_addr", "new_addr", "lat")
    val out = df.select(DiffMerge.preserveUnlessChanged(
      $"cur_addr", $"new_addr", $"lat", lit(-1)).as("lat")).as[Int].collect()
    assert(out.toSeq == Seq(10, -1, 30, -1))
  }
}
