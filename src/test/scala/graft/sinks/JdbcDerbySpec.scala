package graft.sinks

import java.sql.{DriverManager, Timestamp}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.streaming.Pipelines

/** Integration test of the MERGE sink against a real JDBC store
  * (in-memory Derby, same JVM as local-mode executors) — the analogue
  * of the reference's testcontainers suite (database_test.go:15-68)
  * and its repository behavior matrix (employee/task_test.go).
  */
class JdbcDerbySpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private def conn() = DriverManager.getConnection(url)
  private val cf: JdbcMergeWriter.ConnFactory = {
    val u = url
    () => DriverManager.getConnection(u)
  }

  private def exec(sql: String): Unit = {
    val c = conn()
    try { val st = c.createStatement(); st.execute(sql); st.close() }
    finally c.close()
  }

  private def query1[T](sql: String)(f: java.sql.ResultSet => T): Seq[T] = {
    val c = conn()
    try {
      val rs = c.createStatement().executeQuery(sql)
      val buf = scala.collection.mutable.ArrayBuffer.empty[T]
      while (rs.next()) buf += f(rs)
      buf.toSeq
    } finally c.close()
  }

  private lazy val init: Unit = {
    exec("""CREATE TABLE employees (
      id BIGINT PRIMARY KEY, fullname VARCHAR(200), shortname VARCHAR(50),
      position VARCHAR(100), email VARCHAR(200), phone VARCHAR(50),
      updated_at TIMESTAMP DEFAULT CURRENT_TIMESTAMP)""")
    exec("""CREATE TABLE tasks (
      task_id BIGINT PRIMARY KEY, address VARCHAR(200),
      latitude DOUBLE, geocoding_attempts INT, geocoding_error VARCHAR(200),
      updated_at TIMESTAMP DEFAULT CURRENT_TIMESTAMP)""")
    exec("""CREATE TABLE task_types (
      type_id INT GENERATED ALWAYS AS IDENTITY PRIMARY KEY,
      type_name VARCHAR(100) UNIQUE)""")
    exec("CREATE TABLE task_executors (task_id BIGINT, executor_id BIGINT)")
  }

  // reduced employees spec (same as production MergeSpecs.employees)
  private val empSpec = MergeSpecs.employees

  // reduced tasks spec: Derby has no arrays, so comments is omitted —
  // the geo-CASE legs under test are identical to MergeSpecs.tasks
  private val taskSpec = MergeSpec(
    table = "tasks", keyCols = Seq("task_id"),
    insertCols = Seq("task_id", "address"),
    updateCols = Seq("address"),
    touchCol = Some("updated_at"),
    preserves = Seq(
      Preserve("latitude", "address", "NULL"),
      Preserve("geocoding_attempts", "address", "0"),
      Preserve("geocoding_error", "address", "NULL")))

  private def employeeDf(rows: (Long, String, String)*) =
    rows.toSeq.map { case (id, name, email) =>
      (id, name, s"SN$id", "pos", email, "0961234567")
    }.toDF("id", "fullname", "shortname", "position", "email", "phone")

  test("employee MERGE: insert, then skip-if-identical leaves updated_at untouched") {
    init
    JdbcMergeWriter.upsert(
      employeeDf((1L, "Alice", "a@example.com"), (2L, "Bob", "b@example.com")),
      empSpec, DerbyDialect, cf)
    val ts1 = query1("SELECT id, updated_at FROM employees ORDER BY id")(r =>
      (r.getLong(1), r.getTimestamp(2)))
    assert(ts1.map(_._1) == Seq(1L, 2L))

    Thread.sleep(50)
    // identical replay → MERGE matched-but-identical → no update applied
    JdbcMergeWriter.upsert(
      employeeDf((1L, "Alice", "a@example.com"), (2L, "Bob", "b@example.com")),
      empSpec, DerbyDialect, cf)
    val ts2 = query1("SELECT id, updated_at FROM employees ORDER BY id")(r =>
      (r.getLong(1), r.getTimestamp(2)))
    assert(ts2 == ts1, "identical rows must not be rewritten (skip-if-identical)")

    // changed row → updated, updated_at advances
    JdbcMergeWriter.upsert(
      employeeDf((2L, "Bobby", "b@example.com")), empSpec, DerbyDialect, cf)
    val name = query1("SELECT fullname FROM employees WHERE id = 2")(_.getString(1))
    assert(name == Seq("Bobby"))
    val ts3 = query1("SELECT updated_at FROM employees WHERE id = 2")(_.getTimestamp(1))
    assert(ts3.head.after(ts1(1)._2))
  }

  test("task MERGE: geo columns preserved iff address unchanged (K3 CASE)") {
    init
    exec("INSERT INTO tasks (task_id, address, latitude, geocoding_attempts, geocoding_error) " +
      "VALUES (10, 'Main St', 51.5, 3, NULL), (11, 'Old Rd', 40.7, 2, 'failed')")
    val batch = Seq((10L, "Main St"), (11L, "New Rd")).toDF("task_id", "address")
    JdbcMergeWriter.upsert(batch, taskSpec, DerbyDialect, cf)
    val rows = query1(
      "SELECT task_id, address, latitude, geocoding_attempts, geocoding_error " +
        "FROM tasks ORDER BY task_id") { r =>
      (r.getLong(1), r.getString(2),
        Option(r.getObject(3)).map(_.asInstanceOf[Double]),
        r.getInt(4), Option(r.getString(5)))
    }
    assert(rows(0) == ((10L, "Main St", Some(51.5), 3, None)),
      "unchanged address keeps lat/attempts")
    assert(rows(1) == ((11L, "New Rd", None, 0, None)),
      "changed address NULLs lat + error, zeroes attempts")
  }

  test("dimension get-or-create is race-safe and idempotent (K4)") {
    init
    JdbcMergeWriter.ensureDimension(Seq("TypeA", "TypeB"), "task_types",
      "type_name", DerbyDialect, cf)
    JdbcMergeWriter.ensureDimension(Seq("TypeB", "TypeC"), "task_types",
      "type_name", DerbyDialect, cf)
    val names = query1("SELECT type_name FROM task_types ORDER BY type_name")(_.getString(1))
    assert(names == Seq("TypeA", "TypeB", "TypeC"))
    val ids = query1("SELECT count(DISTINCT type_id) FROM task_types")(_.getInt(1))
    assert(ids == Seq(3)) // store-assigned, unique
  }

  test("bridge overwriteGroups: delete-then-insert per task, NULL ids kept (K5/J1)") {
    init
    exec("DELETE FROM task_executors")
    exec("INSERT INTO task_executors VALUES (100, 1), (100, 2), (200, 3)")
    val incoming = Seq(
      (100L, Some(9L)), (100L, None) // None = unmatched shortname → NULL
    ).toDF("task_id", "executor_id")
    JdbcMergeWriter.overwriteGroups(incoming, "task_executors", "task_id",
      Seq("task_id", "executor_id"), DerbyDialect, cf)
    val rows = query1("SELECT task_id, executor_id FROM task_executors ORDER BY task_id, executor_id")(
      r => (r.getLong(1), Option(r.getObject(2)).map(_.toString.toLong)))
    assert(rows == Seq((100L, Some(9L)), (100L, None), (200L, Some(3L))))
  }

  test("MERGE null transitions: NULL→value and value→NULL update, NULL=NULL skips") {
    init
    // the compact NOT(a = ? OR both-null) guard evaluates to UNKNOWN
    // when exactly one side is NULL — these transitions were silently
    // dropped before the three-bind expansion
    JdbcMergeWriter.upsert(
      employeeDf((60L, "Nully", null)), empSpec, DerbyDialect, cf)
    val e0 = query1("SELECT email FROM employees WHERE id = 60")(_.getString(1))
    assert(e0 == Seq(null))

    // NULL → value must apply the update
    JdbcMergeWriter.upsert(
      employeeDf((60L, "Nully", "n@example.com")), empSpec, DerbyDialect, cf)
    val e1 = query1("SELECT email FROM employees WHERE id = 60")(_.getString(1))
    assert(e1 == Seq("n@example.com"), "NULL→value transition must not be skipped")

    // value → NULL must apply the update
    JdbcMergeWriter.upsert(
      employeeDf((60L, "Nully", null)), empSpec, DerbyDialect, cf)
    val e2 = query1("SELECT email FROM employees WHERE id = 60")(_.getString(1))
    assert(e2 == Seq(null), "value→NULL transition must not be skipped")

    // NULL = NULL replay is identical → skip guard holds, updated_at frozen
    val ts1 = query1("SELECT updated_at FROM employees WHERE id = 60")(_.getTimestamp(1))
    Thread.sleep(50)
    JdbcMergeWriter.upsert(
      employeeDf((60L, "Nully", null)), empSpec, DerbyDialect, cf)
    val ts2 = query1("SELECT updated_at FROM employees WHERE id = 60")(_.getTimestamp(1))
    assert(ts2 == ts1, "identical all-NULL replay must skip")
  }

  test("task MERGE: address NULL transitions flip the preserve CASE") {
    init
    exec("DELETE FROM tasks")
    exec("INSERT INTO tasks (task_id, address, latitude, geocoding_attempts, geocoding_error) " +
      "VALUES (20, NULL, 12.5, 1, NULL), (21, 'Has Addr', 33.3, 2, 'e')")
    // NULL → value and value → NULL are both "address changed" → geo reset
    val batch = Seq(
      (20L, Some("Now Set")), (21L, Option.empty[String])).toDF("task_id", "address")
    JdbcMergeWriter.upsert(batch, taskSpec, DerbyDialect, cf)
    val rows = query1(
      "SELECT task_id, latitude, geocoding_attempts FROM tasks ORDER BY task_id") { r =>
      (r.getLong(1), Option(r.getObject(2)).map(_.asInstanceOf[Double]), r.getInt(3))
    }
    assert(rows(0) == ((20L, None, 0)), "NULL→value address change must reset geo")
    assert(rows(1) == ((21L, None, 0)), "value→NULL address change must reset geo")
  }

  test("overwriteGroups streams multi-group partitions past the batch size") {
    init
    exec("DELETE FROM task_executors")
    exec("INSERT INTO task_executors VALUES (300, 1), (301, 1), (999, 7)")
    // 3 groups × 600 rows > BatchSize(500): exercises the one-pass
    // sorted-stream (delete at group boundary, batched inserts behind)
    val incoming = (0 until 1800).map { i =>
      (300L + (i % 3), i.toLong)
    }.toDF("task_id", "executor_id")
    JdbcMergeWriter.overwriteGroups(incoming, "task_executors", "task_id",
      Seq("task_id", "executor_id"), DerbyDialect, cf)
    val counts = query1(
      "SELECT task_id, count(*) FROM task_executors GROUP BY task_id ORDER BY task_id")(
      r => (r.getLong(1), r.getLong(2)))
    assert(counts == Seq((300L, 600L), (301L, 600L), (302L, 600L), (999L, 1L)),
      "each incoming group fully rewritten, untouched group intact")
  }

  test("sink accumulators record rows/transactions from the executors") {
    init
    val m = new JdbcMergeWriter.SinkMetrics(spark.sparkContext)
    JdbcMergeWriter.upsert(
      employeeDf((50L, "Acc One", "x@example.com"), (51L, "Acc Two", "y@example.com"))
        .repartition(2),
      empSpec, DerbyDialect, cf, Some(m))
    assert(m.rowsWritten.value == 2L)
    assert(m.partitionsTouched.value >= 1L && m.partitionsTouched.value <= 2L)
    assert(m.txnNanos.value > 0L)
  }

  test("employee pipeline batch end-to-end: transform + repair + MERGE") {
    init
    exec("DELETE FROM employees")
    val raw = spark.createDataFrame(
      java.util.List.of(
        Row(7L, "Valid Mail", "VM", "qa", "v@example.com", "0961234567"),
        Row(8L, "Broken Mail", "BM", "qa", "12345", ""),
        Row(8L, "Broken Mail", "BM", "qa", "12345", "")), // dup row in batch (A4)
      StructType(graft.models.Schemas.employee.fields.map(_.copy(nullable = true))))
    Pipelines.employeeBatch(raw, DerbyDialect, cf)
    val rows = query1("SELECT id, email FROM employees ORDER BY id")(r =>
      (r.getLong(1), r.getString(2)))
    assert(rows.map(_._1) == Seq(7L, 8L))
    assert(rows(0)._2 == "v@example.com")
    assert(rows(1)._2.endsWith("@placeholder.local"), "invalid email repaired")
  }
}
