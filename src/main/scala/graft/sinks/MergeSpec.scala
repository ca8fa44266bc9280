package graft.sinks

/** Declarative description of an idempotent MERGE/upsert into a
  * relational state store — the dataflow form of the reference's
  * embedded SQL (K1-K3/K6, SURVEY.md §2.2).
  *
  * @param table      target table
  * @param keyCols    conflict target (PK / unique)
  * @param insertCols full column list written on insert (must include
  *                   keys)
  * @param updateCols columns overwritten from the incoming row on
  *                   conflict (`SET c = EXCLUDED.c`)
  * @param skipIfIdentical add `WHERE (t.update_cols…) IS DISTINCT FROM
  *                   (EXCLUDED.update_cols…)` so identical rows write
  *                   nothing — the reference's skip-if-identical
  *                   (employees.go:111-114) pushed into the store,
  *                   avoiding write amplification
  * @param touchCol   column set to CURRENT_TIMESTAMP on every applied
  *                   update (employee.go:50 `updated_at`)
  * @param preserves  conditionally-preserved columns: keep the stored
  *                   value while `guardCol` is unchanged, else reset —
  *                   the geo-CASE of task.go:97-112
  */
final case class MergeSpec(
    table: String,
    keyCols: Seq[String],
    insertCols: Seq[String],
    updateCols: Seq[String],
    skipIfIdentical: Boolean = false,
    touchCol: Option[String] = None,
    preserves: Seq[Preserve] = Nil)

/** `col` keeps its stored value while `guardCol` is unchanged
  * (null-safe), else becomes `resetSql` (a SQL literal, e.g. NULL / 0).
  */
final case class Preserve(col: String, guardCol: String, resetSql: String)

object MergeSpecs {
  /** employees — /root/reference/internal/repository/employee.go:23-52. */
  val employees: MergeSpec = MergeSpec(
    table = "employees",
    keyCols = Seq("id"),
    insertCols = Seq("id", "fullname", "shortname", "position", "email", "phone"),
    updateCols = Seq("fullname", "shortname", "position", "email", "phone"),
    skipIfIdentical = true,
    touchCol = Some("updated_at"))

  /** tasks — /root/reference/internal/repository/task.go:81-113,
    * including the four geo-preservation CASE legs keyed on address
    * change.
    */
  val tasks: MergeSpec = MergeSpec(
    table = "tasks",
    keyCols = Seq("task_id"),
    insertCols = Seq("task_id", "task_type_id", "creation_date", "closing_date",
      "description", "address", "customer_name", "customer_login", "comments",
      "is_closed"),
    updateCols = Seq("task_type_id", "creation_date", "closing_date",
      "description", "address", "customer_name", "customer_login", "comments",
      "is_closed"),
    touchCol = Some("updated_at"),
    preserves = Seq(
      Preserve("latitude", "address", "NULL"),
      Preserve("longitude", "address", "NULL"),
      Preserve("geocoding_attempts", "address", "0"),
      Preserve("geocoding_error", "address", "NULL")))

  /** scraper_status watermark — scraper_status.go:16-19. */
  val scraperStatus: MergeSpec = MergeSpec(
    table = "scraper_status",
    keyCols = Seq("id"),
    insertCols = Seq("id", "last_processed_date"),
    updateCols = Seq("last_processed_date"),
    touchCol = Some("updated_at"))
}
