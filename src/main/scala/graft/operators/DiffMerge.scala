package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot-diff and merge semantics (T6/J2/K1/K2/K3 in SURVEY.md §2).
  *
  * The reference diffs each incoming employee against the stored row
  * with a per-row SELECT then routes to insert / update / skip
  * (/root/reference/internal/services/employees/employees.go:108-133).
  * At 100 TB a per-row point lookup (S4) is untenable; the engine
  * replaces the O(N) round-trips with ONE distributed join between the
  * incoming batch and the current state, then routes rows by null-safe
  * column comparison. Catalyst broadcasts the smaller side
  * automatically (or the caller can `broadcast()` the batch); both
  * sides shuffle-partition on the key otherwise — no driver-side loop
  * anywhere.
  *
  * Null-safety: the reference's `IS DISTINCT FROM`
  * (/root/reference/internal/repository/task.go:97-112) is `<=>`
  * negated, NOT `=!=` — `=!=` returns NULL when either side is NULL and
  * would silently drop changed-to-NULL updates.
  */
object DiffMerge {

  val RouteCol = "__route"
  val Insert = "insert"
  val Update = "update"
  val Skip = "skip"
  val Absent = "absent" // present in current, missing from incoming

  private val curPrefix = "__cur_"

  /** Full-outer diff of `incoming` vs `current` on `keys`, comparing
    * `compare` columns null-safely. Returns the coalesced keys, the
    * incoming compare columns, current columns prefixed `__cur_`, and
    * [[RouteCol]] ∈ {insert, update, skip, absent}. (T6/J2.)
    */
  def routeChanges(incoming: DataFrame, current: DataFrame,
      keys: Seq[String], compare: Seq[String]): DataFrame = {
    val inc = incoming.withColumn("__inc_present", lit(1))
    val cur = current.select(
      keys.map(col) ++
        compare.map(c => col(c).as(curPrefix + c)) :+ lit(1).as("__cur_present"): _*)
    val differs = compare
      .map(c => !(col(c) <=> col(curPrefix + c)))
      .reduceOption(_ || _)
      .getOrElse(lit(false))
    inc.join(cur, keys, "full_outer")
      .withColumn(RouteCol,
        when(col("__cur_present").isNull, Insert)
          .when(col("__inc_present").isNull, Absent)
          .when(differs, Update)
          .otherwise(Skip))
      .drop("__inc_present", "__cur_present")
  }

  /** K1: `INSERT … ON CONFLICT DO NOTHING` as a dataflow — current
    * state plus the incoming rows whose key is absent (left-anti).
    */
  def insertIfAbsent(incoming: DataFrame, current: DataFrame,
      keys: Seq[String]): DataFrame =
    current.unionByName(
      incoming.join(current.select(keys.map(col): _*), keys, "left_anti"))

  /** K1+K2 combined: merged state after upsert — incoming rows win on
    * key collision, untouched current rows survive.
    */
  def upsert(incoming: DataFrame, current: DataFrame,
      keys: Seq[String]): DataFrame =
    incoming.unionByName(
      current.join(incoming.select(keys.map(col): _*), keys, "left_anti"))

  /** K3's conditional preservation: keep `curValue` when the guard
    * column is unchanged (null-safe), else reset. Encodes the
    * `CASE WHEN tasks.address IS DISTINCT FROM EXCLUDED.address` legs
    * of /root/reference/internal/repository/task.go:97-112.
    */
  def preserveUnlessChanged(guardCur: Column, guardInc: Column,
      curValue: Column, resetTo: Column): Column =
    when(guardCur <=> guardInc, curValue).otherwise(resetTo)
}
