package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.models.Schemas

/** Landing-zone payload envelopes — the exact upstream response shapes
  * (FIXTURES.md §1; mock/ScraperServiceClient.go):
  *
  *   employees: { "new_hash": "...", "employees": [ {...}, ... ] }
  *   tasks:     { "new_hash": "...", "date": "yyyy-MM-dd", "tasks": [...] }
  *
  * The poller writes one JSON file per fetch; these readers explode the
  * envelope into typed rows carrying the batch hash (for T8 gating /
  * audit). Schemas are explicit — never inferred (SURVEY.md §1.2).
  */
object Payloads {

  val employeeEnvelope: StructType = StructType(Seq(
    StructField("new_hash", StringType),
    StructField("employees", ArrayType(Schemas.employee))))

  val taskEnvelope: StructType = StructType(Seq(
    StructField("new_hash", StringType),
    StructField("date", StringType),
    StructField("tasks", ArrayType(Schemas.task))))

  /** One row per employee, with the envelope hash alongside. */
  def readEmployeePayloads(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(employeeEnvelope).json(path)
      .select(col("new_hash"), explode(col("employees")).as("e"))
      .select(col("new_hash"), col("e.*"))

  /** One row per task, with the envelope hash and partition date. */
  def readTaskPayloads(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(taskEnvelope).json(path)
      .select(col("new_hash"), col("date"), explode(col("tasks")).as("t"))
      .select(col("new_hash"), to_date(col("date"), "yyyy-MM-dd").as("batch_date"),
        col("t.*"))

  /** Streaming variant over a landing directory (file source tracks
    * processed files in the checkpoint).
    */
  def streamEmployeePayloads(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(employeeEnvelope).json(dir)
      .select(col("new_hash"), explode(col("employees")).as("e"))
      .select(col("new_hash"), col("e.*"))

  /** Malformed envelopes in a landing path. PERMISSIVE parsing means a
    * bad file otherwise disappears silently (its null envelope
    * explodes to zero rows); pipelines feed this count into
    * `items_parsed_total{type="corrupt_envelope"}` so ingest rot is
    * visible instead of silent.
    */
  def countCorruptInto(spark: SparkSession, path: String,
      envelope: StructType, metrics: graft.observability.Metrics): Long = {
    val audited = StructType(envelope.fields :+
      StructField("_corrupt_record", StringType))
    // Spark refuses queries touching ONLY the corrupt column on a raw
    // file scan — parse+cache first (per the AnalysisException's own
    // guidance), then filter.
    val parsed = spark.read.schema(audited)
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path).cache()
    try {
      val n = parsed.where(col("_corrupt_record").isNotNull).count()
      if (n > 0) metrics.incItemsParsed("corrupt_envelope", n.toDouble)
      n
    } finally parsed.unpersist()
  }
}
