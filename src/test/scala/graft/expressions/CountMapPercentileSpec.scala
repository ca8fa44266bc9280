package graft.expressions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** CountMapPercentile uses DuckDB's lerp interpolation
  * (`vlo + frac·(vhi−vlo)` — the oracle-hash-matched form); Spark's
  * exact `percentile` computes the algebraically-equal two-term form,
  * which can differ by 1 ulp on non-dyadic values. So: bit-for-bit vs
  * Spark on dyadic inputs (every `compare` call below uses eighths /
  * quarters / integers), ≤1 ulp on non-dyadic (own test), across every
  * shape: ties, single values, nulls, empty groups, multiple
  * percentages, negatives, partial-merge across partitions.
  */
class CountMapPercentileSpec extends SparkSpec {
  import spark.implicits._

  private val ps = Seq(0.0, 0.25, 0.5, 0.75, 0.9, 1.0)

  private def sparkVsKernel(df: org.apache.spark.sql.DataFrame,
      col0: String): Seq[(Double, Double)] = {
    val got = df.agg(CountMapPercentile.of(col(col0), ps).as("a"))
      .head.getSeq[Double](0)
    val want = df.agg(percentile(col(col0).cast("double"),
        typedLit(ps.toArray)).as("p"))
      .head.getSeq[Double](0)
    assert(got.size == want.size)
    got.zip(want)
  }

  private def compare(df: org.apache.spark.sql.DataFrame, col0: String): Unit =
    sparkVsKernel(df, col0).foreach { case (g, w) =>
      assert(java.lang.Double.doubleToLongBits(g) ==
        java.lang.Double.doubleToLongBits(w), s"got $g want $w")
    }

  test("matches Spark percentile on a tied low-cardinality domain") {
    compare((1 to 5000).map(i => (i % 50 + 1).toDouble).toDF("v"), "v")
  }

  test("matches Spark percentile on fractional and negative values") {
    val r = new scala.util.Random(7)
    compare(Seq.fill(2000)((r.nextInt(40) - 20) / 8.0).toDF("v"), "v")
  }

  test("non-dyadic values: within 1 ulp of Spark's two-term form") {
    // 0.1 steps are not exact binary fractions — the lerp and two-term
    // interpolations may legitimately differ in the last bit here.
    val df = (1 to 3000).map(i => (i % 37) * 0.1).toDF("v")
    sparkVsKernel(df, "v").foreach { case (g, w) =>
      val ulps = math.abs(java.lang.Double.doubleToLongBits(g) -
        java.lang.Double.doubleToLongBits(w))
      assert(ulps <= 1L, s"got $g want $w ($ulps ulps apart)")
    }
  }

  test("matches on a single distinct value and a single row") {
    compare(Seq.fill(100)(3.5).toDF("v"), "v")
    compare(Seq(42.0).toDF("v"), "v")
  }

  test("ignores nulls; all-null group evaluates to null") {
    val df = Seq[Option[Double]](Some(1.0), None, Some(2.0), None, Some(2.0))
      .toDF("v")
    compare(df, "v")
    val r = Seq[Option[Double]](None, None).toDF("v")
      .agg(CountMapPercentile.of(col("v"), Seq(0.5))).head
    assert(r.isNullAt(0))
  }

  test("grouped aggregation across many partitions merges partials") {
    val df = (1 to 20000)
      .map(i => (i % 3, (i % 97).toDouble / 4.0))
      .toDF("g", "v").repartition(16)
    val got = df.groupBy("g")
      .agg(CountMapPercentile.of(col("v"), ps).as("a"))
      .orderBy("g").collect().map(r => (r.getInt(0), r.getSeq[Double](1)))
    val want = df.groupBy("g")
      .agg(percentile(col("v"), typedLit(ps.toArray)).as("p"))
      .orderBy("g").collect().map(r => (r.getInt(0), r.getSeq[Double](1)))
    assert(got.toSeq == want.toSeq)
  }

  test("bounded-domain contract: exceeding maxDistinct fails loudly") {
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val ex = intercept[Exception] {
      df.agg(CountMapPercentile.of(col("v"), Seq(0.5), maxDistinct = 50))
        .head
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(_.getMessage != null) &&
      causes(ex).exists(c => c.getMessage != null &&
        c.getMessage.contains("bounded domains")))
  }

  test("reachable through the SQL surface (graft_percentile_cm)") {
    GraftExtensions.register(spark)
    Seq(1.0, 2.0, 3.0, 4.0).toDF("v").createOrReplaceTempView("cmp_t")
    val got = spark.sql(
      "SELECT graft_percentile_cm(v, 0.5, 1.0) AS p FROM cmp_t")
      .head.getSeq[Double](0)
    assert(got == Seq(2.5, 4.0))
    // integer literals are valid percentages too (0 and 1 bound the range)
    val ints = spark.sql(
      "SELECT graft_percentile_cm(v, 0, 1) AS p FROM cmp_t")
      .head.getSeq[Double](0)
    assert(ints == Seq(1.0, 4.0))
  }

  test("serde round-trips the buffer exactly") {
    val m = new CountMapPercentile.DoubleCounts(1024)
    val r = new scala.util.Random(11)
    (1 to 500).foreach(_ => m.add((r.nextInt(200) - 100) / 8.0, 1L))
    val back = CountMapPercentile.DoubleCounts.fromBytes(m.toBytes, 1024)
    assert(back.size == m.size)
    val a = scala.collection.mutable.Map[Double, Long]()
    val b = scala.collection.mutable.Map[Double, Long]()
    m.foreach((k, c) => a(k) = c)
    back.foreach((k, c) => b(k) = c)
    assert(a == b)
  }
}
