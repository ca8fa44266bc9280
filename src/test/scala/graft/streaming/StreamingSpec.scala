package graft.streaming

import java.nio.file.Files
import java.sql.{DriverManager, Timestamp}

import org.apache.spark.sql.Row
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.SparkSpec
import graft.models.Schemas
import graft.sinks.{DerbyDialect, JdbcMergeWriter}

/** Streaming-layer behavior: landing-zone → foreachBatch MERGE with
  * checkpointed progress (replaces scraper_status), the hash-gated
  * poller (S1/S2 matrix from employees_internal_test.go:136-266), and
  * the day-by-day backfill driver (tasks.go:79-127).
  */
class StreamingSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:streamdb;create=true"
  private val cf: JdbcMergeWriter.ConnFactory = JdbcMergeWriter.connFactory(url)

  private lazy val init: Unit = {
    val c = DriverManager.getConnection(url)
    try c.createStatement().execute("""CREATE TABLE employees (
      id BIGINT PRIMARY KEY, fullname VARCHAR(200), shortname VARCHAR(50),
      position VARCHAR(100), email VARCHAR(200), phone VARCHAR(50),
      updated_at TIMESTAMP DEFAULT CURRENT_TIMESTAMP)""")
    finally c.close()
  }

  private def writeLanding(dir: String, rows: Seq[Row]): Unit = {
    val schema = StructType(Schemas.employee.fields.map(_.copy(nullable = true)))
    spark.createDataFrame(java.util.List.copyOf(
      scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)
      .coalesce(1).write.mode("append").parquet(dir)
  }

  test("employee stream: landing zone drained via AvailableNow into MERGE sink, " +
    "checkpoint skips processed files on restart") {
    init
    val landing = Files.createTempDirectory("landing").toString
    val ckpt = Files.createTempDirectory("ckpt").toString
    writeLanding(landing, Seq(
      Row(1L, "Alice", "AL", "qa", "a@example.com", "0961234567"),
      Row(2L, "Bob", "BO", "dev", "bad-email", "")))

    val q1 = Pipelines.employeeStream(spark, landing, ckpt, DerbyDialect, cf,
      Trigger.AvailableNow())
    q1.awaitTermination(60000)

    def emails: Map[Long, String] = {
      val c = DriverManager.getConnection(url)
      try {
        val rs = c.createStatement().executeQuery("SELECT id, email FROM employees")
        val b = scala.collection.mutable.Map.empty[Long, String]
        while (rs.next()) b += rs.getLong(1) -> rs.getString(2)
        b.toMap
      } finally c.close()
    }
    val afterFirst = emails
    assert(afterFirst.keySet == Set(1L, 2L))
    assert(afterFirst(2L).endsWith("@placeholder.local"))

    // second micro-batch: new file with an update + a new employee
    writeLanding(landing, Seq(
      Row(2L, "Bobby", "BO", "dev", "b@example.com", ""),
      Row(3L, "Cara", "CA", "ops", "c@example.com", "")))
    val q2 = Pipelines.employeeStream(spark, landing, ckpt, DerbyDialect, cf,
      Trigger.AvailableNow())
    q2.awaitTermination(60000)
    val afterSecond = emails
    assert(afterSecond == Map(
      1L -> "a@example.com", 2L -> "b@example.com", 3L -> "c@example.com"))
  }

  test("cleanSource=delete removes processed landing files (retention primary path)") {
    init
    val landing = Files.createTempDirectory("landing-clean")
    val ckpt = Files.createTempDirectory("ckpt-clean").toString
    writeLanding(landing.toString, Seq(
      Row(10L, "Zed", "ZD", "qa", "z@example.com", "0961234567")))
    val q = Pipelines.employeeStream(spark, landing.toString, ckpt,
      DerbyDialect, cf, Trigger.AvailableNow())
    q.awaitTermination(60000)
    def parquets = Option(landing.toFile.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    val firstRun = parquets
    assert(firstRun.nonEmpty)
    // a batch's files become delete-eligible when the NEXT batch
    // commits (source commit() fires then), so the zone is bounded
    // with a one-run lag: run 2 must clean run 1's files.
    writeLanding(landing.toString, Seq(
      Row(11L, "Yan", "YA", "qa", "y@example.com", "0961234567")))
    val q2 = Pipelines.employeeStream(spark, landing.toString, ckpt,
      DerbyDialect, cf, Trigger.AvailableNow())
    q2.awaitTermination(60000)
    val deadline = System.currentTimeMillis() + 20000
    while (parquets.intersect(firstRun).nonEmpty &&
      System.currentTimeMillis() < deadline) Thread.sleep(200)
    assert(parquets.intersect(firstRun).isEmpty,
      s"run-1 landing files must be deleted once run 2 commits, still present: " +
        parquets.intersect(firstRun))
  }

  test("hash-gated poller: unchanged hash and empty batches are skipped, " +
    "hash commits only after a successful batch") {
    val calls = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    var responses = List(
      FetchResult("h1", Seq("a", "b")),  // new → process
      FetchResult("h1", Seq("a", "b")),  // same hash → skip
      FetchResult("h2", Seq.empty),      // empty → skip, hash advances
      FetchResult("h3", Seq("c")),       // new → process
      FetchResult("h4", Seq("boom")))    // batch fails → hash NOT committed
    val fetcher = new SnapshotFetcher[String] {
      override def fetch(known: Option[String]): FetchResult[String] = {
        val r = responses.head; responses = responses.tail; r
      }
    }
    val poller = new HashGatedPoller[String](fetcher, items => {
      if (items.contains("boom")) sys.error("sink failure")
      calls += items
    })
    assert(poller.poll())
    assert(!poller.poll())
    assert(!poller.poll())
    assert(poller.knownHash.contains("h2")) // empty response still advances
    assert(poller.poll())
    intercept[RuntimeException] { poller.poll() }
    assert(poller.knownHash.contains("h3"), "failed batch must not commit h4")
    assert(calls.toSeq == Seq(Seq("a", "b"), Seq("c")))
  }

  test("backfill: strictly ordered days, watermark = processed + 1, abort stops advance") {
    val processed = scala.collection.mutable.ArrayBuffer.empty[Timestamp]
    val marks = scala.collection.mutable.ArrayBuffer.empty[Timestamp]
    val n = Backfill.run(
      Timestamp.valueOf("2024-01-30 15:30:00"),
      Timestamp.valueOf("2024-02-02 00:00:00"),
      d => processed += d, w => marks += w)
    assert(n == 4)
    assert(processed.head == Timestamp.valueOf("2024-01-30 00:00:00"))
    assert(processed.last == Timestamp.valueOf("2024-02-02 00:00:00"))
    assert(marks.last == Timestamp.valueOf("2024-02-03 00:00:00"))

    // failure on the second day aborts before advancing further
    val seen = scala.collection.mutable.ArrayBuffer.empty[Timestamp]
    val marks2 = scala.collection.mutable.ArrayBuffer.empty[Timestamp]
    intercept[RuntimeException] {
      Backfill.run(
        Timestamp.valueOf("2024-01-01 00:00:00"),
        Timestamp.valueOf("2024-01-05 00:00:00"),
        d => { if (seen.size == 1) sys.error("day failed"); seen += d },
        w => marks2 += w)
    }
    assert(marks2.size == 1, "watermark stops at the failed day (no skip-ahead)")
  }
}
