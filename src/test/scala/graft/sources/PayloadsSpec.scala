package graft.sources

import java.nio.file.Files

import graft.SparkSpec

class PayloadsSpec extends SparkSpec {
  import spark.implicits._

  test("employee envelope: hash carried, rows exploded, schema fixed") {
    val dir = Files.createTempDirectory("payload").toString
    Files.writeString(java.nio.file.Path.of(dir, "b1.json"),
      """{"new_hash":"h1","employees":[
        |{"id":1,"fullname":"Alice","shortname":"AL","position":"qa","email":"a@example.com","phone":"1"},
        |{"id":2,"fullname":"Bob","shortname":"BO","position":"dev","email":"","phone":""}]}"""
        .stripMargin.replace("\n", ""))
    val df = Payloads.readEmployeePayloads(spark, dir)
    val rows = df.select($"new_hash", $"id", $"fullname").as[(String, Long, String)]
      .collect().sortBy(_._2)
    assert(rows.toSeq == Seq(("h1", 1L, "Alice"), ("h1", 2L, "Bob")))
  }

  test("task envelope: date parsed, arrays and booleans typed") {
    val dir = Files.createTempDirectory("payload").toString
    Files.writeString(java.nio.file.Path.of(dir, "t1.json"),
      """{"new_hash":"h2","date":"2024-03-01","tasks":[
        |{"id":101,"type":"Repair","creation_date":"2024-03-01T10:00:00.000Z",
        |"closing_date":null,"description":"d","address":"Main St",
        |"customer_name":"C","customer_login":"c1","comments":["x","y"],
        |"executors":["AL"],"is_closed":false}]}""".stripMargin.replace("\n", ""))
    val df = Payloads.readTaskPayloads(spark, dir)
    val r = df.selectExpr("new_hash", "CAST(batch_date AS STRING)", "id",
      "size(comments)", "executors[0]", "is_closed").as[(String, String, Long, Int, String, Boolean)].head()
    assert(r == (("h2", "2024-03-01", 101L, 2, "AL", false)))
  }

  test("corrupt envelopes are counted, good rows unaffected") {
    val dir = Files.createTempDirectory("payload").toString
    Files.writeString(java.nio.file.Path.of(dir, "good.json"),
      """{"new_hash":"h1","employees":[{"id":1,"fullname":"A","shortname":"A","position":"p","email":"a@example.com","phone":"1"}]}""")
    Files.writeString(java.nio.file.Path.of(dir, "junk.json"), "not json at all")
    val m = new graft.observability.Metrics
    val n = Payloads.countCorruptInto(spark, dir, Payloads.employeeEnvelope, m)
    assert(n == 1)
    assert(m.counterValue("hephaestus_items_parsed_total",
      "type" -> "corrupt_envelope") == 1.0)
    assert(Payloads.readEmployeePayloads(spark, dir).count() == 1)
  }

  test("custom expressions are callable from SQL after registration") {
    graft.expressions.GraftExtensions.register(spark)
    val d = spark.sql(
      "SELECT graft_vector_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d," +
        " graft_rolling_hash('abc') AS rh," +
        " graft_lang_guess('the cat and the dog') AS lg").head()
    assert(d.getDouble(0) == 11.0)
    assert(d.getLong(1) == ((('a' * 131L + 'b') % 1000000007L) * 131L + 'c') % 1000000007L)
    assert(d.getString(2) == "en")
  }
}
