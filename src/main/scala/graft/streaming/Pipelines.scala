package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.functions.{Dates, Validation}
import graft.models.Schemas
import graft.operators.Bridge
import graft.sinks.{JdbcMergeWriter, MergeSpecs, SqlDialect}
import graft.sinks.JdbcMergeWriter.ConnFactory

/** The two reference pipelines re-expressed Spark-first
  * (SURVEY.md §3.1/§3.2): landing-zone payloads → declarative
  * transforms (Catalyst-optimized) → idempotent JDBC MERGE in
  * `foreachBatch`.
  *
  * Replaces the reference's per-row round-trips (1 SELECT + 1 write
  * per employee; ≥4 statements per task) with set-oriented MERGEs —
  * the write path is per-partition batched, the read path is joins,
  * nothing loops on the driver.
  *
  * Ordering: employees before tasks within a cycle (executors resolve
  * against employees — main.go:85 encodes this with a sleep; here it
  * is an explicit call order), and inside the task batch
  * dim → fact → bridge (K7, task.go:47-72).
  */
object Pipelines {

  // ---- employee pipeline (§3.1) -------------------------------------------

  /** T1 projection + T3/T4 email repair + A4 key-dedup. Phone is
    * validated (T5) but not repaired — reference behavior: invalid
    * phones pass through untouched (employees.go:199-212 only tallies).
    */
  def transformEmployees(raw: DataFrame): DataFrame =
    raw.select(
      col("id").cast("long").as("id"),
      col("fullname"), col("shortname"), col("position"),
      Validation.repairEmail(col("email"), col("id")).as("email"),
      col("phone"))
      .dropDuplicates("id")

  /** foreachBatch body: MERGE with skip-if-identical (K1+K2+T6 pushed
    * into the store — identical rows produce zero writes).
    */
  def employeeBatch(batch: DataFrame, dialect: SqlDialect, cf: ConnFactory): Unit =
    JdbcMergeWriter.upsert(transformEmployees(batch), MergeSpecs.employees,
      dialect, cf)

  /** Structured Streaming form: landing-zone parquet → MERGE sink.
    * Checkpoint replaces the reference's scraper_status for progress;
    * `Trigger.ProcessingTime("10 minutes")` matches the reference
    * cadence (config.go:30), `Trigger.AvailableNow` drains a backlog.
    */
  /** `cleanSource` ("delete" / "archive" / "off") is the landing-zone
    * retention primary path: the file source removes each file once its
    * batch commits, so the zone stays bounded (see [[LandingZone]]).
    */
  def employeeStream(spark: SparkSession, landingDir: String,
      checkpointDir: String, dialect: SqlDialect, cf: ConnFactory,
      trigger: Trigger = Trigger.ProcessingTime("10 minutes"),
      cleanSource: String = "delete"): StreamingQuery =
    spark.readStream.schema(Schemas.employee)
      .option("cleanSource", cleanSource)
      .parquet(landingDir)
      .writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, _: Long) => employeeBatch(b, dialect, cf) }
      .start()

  // ---- task pipeline (§3.2) -----------------------------------------------

  /** T2 projection + T7 date normalization + T9 zero-time→NULL + A4. */
  def transformTasks(raw: DataFrame): DataFrame =
    raw.select(
      col("id").cast("long").as("task_id"),
      col("type").as("type_name"),
      col("creation_date"),
      Dates.zeroTimeToNull(col("closing_date")).as("closing_date"),
      col("description"), col("address"),
      col("customer_name"), col("customer_login"),
      col("comments"), col("executors"), col("is_closed"))
      .dropDuplicates("task_id")

  /** foreachBatch body for tasks — K7 ordering inside one batch:
    *  1. dim: ensure task_types has every incoming name (K4; ids stay
    *     store-assigned, read back and joined — never generated in
    *     Spark);
    *  2. fact: MERGE tasks with the geo-preservation CASE (K3);
    *  3. bridge: explode executors, broadcast-resolve shortname→id
    *     (J1, LEFT join: unmatched ⇒ NULL), group-overwrite
    *     task_executors (K5).
    *
    * @param loadDim       reads current task_types from the store
    * @param loadEmployees reads current employees (id, shortname)
    */
  def taskBatch(batch: DataFrame, dialect: SqlDialect, cf: ConnFactory,
      loadDim: () => DataFrame, loadEmployees: () => DataFrame): Unit = {
    val tasks = transformTasks(batch).cache()
    try {
      // 1. dimension get-or-create
      val names = tasks.select("type_name").where(col("type_name").isNotNull)
        .distinct().collect().map(_.getString(0)).toSeq
      JdbcMergeWriter.ensureDimension(names, "task_types", "type_name", dialect, cf)
      val dim = loadDim() // (type_id, type_name)

      // 2. fact upsert with dim join (broadcast: dims are small)
      val fact = tasks.join(broadcast(dim), Seq("type_name"), "left")
        .select(col("task_id"), col("type_id").as("task_type_id"),
          col("creation_date"), col("closing_date"), col("description"),
          col("address"), col("customer_name"), col("customer_login"),
          col("comments"), col("is_closed"))
      JdbcMergeWriter.upsert(fact, MergeSpecs.tasks, dialect, cf)

      // 3. bridge rewrite
      val bridge = Bridge.resolveExecutors(tasks, loadEmployees(),
        "task_id", "executors", "id", "shortname")
        .select(col("task_id"), col("executor_id"))
      JdbcMergeWriter.overwriteGroups(bridge, "task_executors", "task_id",
        Seq("task_id", "executor_id"), dialect, cf)
    } finally tasks.unpersist()
  }

  def taskStream(spark: SparkSession, landingDir: String, checkpointDir: String,
      dialect: SqlDialect, cf: ConnFactory,
      loadDim: () => DataFrame, loadEmployees: () => DataFrame,
      trigger: Trigger = Trigger.ProcessingTime("10 minutes"),
      cleanSource: String = "delete"): StreamingQuery =
    spark.readStream.schema(Schemas.task)
      .option("cleanSource", cleanSource)
      .parquet(landingDir)
      .writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, _: Long) =>
        taskBatch(b, dialect, cf, loadDim, loadEmployees)
      }
      .start()
}
