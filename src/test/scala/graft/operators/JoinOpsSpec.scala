package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Behavior of the temporal/range join operators on controlled
  * fixtures: inclusive as-of semantics, left-outer nulls, half-open
  * interval boundaries, bucket-crossing intervals.
  */
class JoinOpsSpec extends SparkSpec {
  import spark.implicits._

  test("asOf: latest right row at or before each left time, per key") {
    val left = Seq(
      (1L, 10L, "a"), // after right@5 → carries v5
      (1L, 20L, "b"), // after right@20 (equal ts → inclusive) → v20
      (1L, 3L, "c"),  // before any right row → null
      (2L, 10L, "d")  // other key: only right@2 visible → w2
    ).toDF("k", "t", "payload")
    val right = Seq(
      (1L, 5L, "v5"), (1L, 20L, "v20"), (1L, 30L, "v30"),
      (2L, 2L, "w2"), (3L, 1L, "x1")
    ).toDF("k", "t", "rv")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "t", "t")
      .as[(Long, Long, String, String)].collect().toSet
    assert(out == Set(
      (1L, 10L, "a", "v5"),
      (1L, 20L, "b", "v20"),
      (1L, 3L, "c", null),
      (2L, 10L, "d", "w2")))
  }

  test("asOf: carries multiple right payload columns and rejects collisions") {
    val left = Seq((1L, 10L, 1.0)).toDF("k", "t", "lv")
    val right = Seq((1L, 5L, 2.0, "s")).toDF("k", "t", "rv", "tag")
    val row = AsOfJoin.asOf(left, right, Seq("k"), "t", "t").collect().head
    assert(row.getDouble(2) == 1.0 && row.getDouble(3) == 2.0 && row.getString(4) == "s")
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(left, left, Seq("k"), "t", "t")
    }
    // right payload shadowing the LEFT time name must also fail fast
    val rightClash = Seq((1L, 5L, 2.0, 7L)).toDF("k", "et", "rv", "t")
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(left, rightClash, Seq("k"), "t", "et")
    }
  }

  test("asOf: payload comes from ONE right row even when payload fields are NULL") {
    val left = Seq((1L, 10L)).toDF("k", "t").withColumn("dummy", lit(0))
    val right = Seq(
      (1L, 3L, Some(0.5), Some("old")),
      (1L, 5L, Some(1.5), None) // latest row: tag is NULL
    ).toDF("k", "t", "rv", "tag")
    val row = AsOfJoin.asOf(left, right, Seq("k"), "t", "t")
      .select("rv", "tag").collect().head
    // must be the WHOLE latest row (1.5, NULL) — never (1.5, "old"),
    // a franken-row stitched from two different right rows
    assert(row.getDouble(0) == 1.5 && row.isNullAt(1))
  }

  test("asOfWithin equals the brute-force bounded definition on pseudo-random data") {
    val lookback = 40L
    val left = (0 until 300).map { i =>
      (i * 7919 % 11L, (i * 104729 % 400).toLong, i.toLong)
    }.toDF("k", "t", "lid")
    val rightRows = (0 until 200).map { i =>
      ((i * 6101 % 11).toLong, (i * 99991 % 400).toLong)
    }.distinct.map { case (k, t) => (k, t, s"v$k-$t") }
    val out = AsOfJoin.asOfWithin(left, rightRows.toDF("k", "t", "rv"),
        Seq("k"), "t", "t", lit(lookback))
      .as[(Long, Long, Long, String)].collect().toSet
    val byKey = rightRows.groupBy(_._1)
    val expected = (0 until 300).map { i =>
      val (k, t, lid) = (i * 7919 % 11L, (i * 104729 % 400).toLong, i.toLong)
      val best = byKey.getOrElse(k, Seq.empty)
        .filter(r => r._2 <= t && r._2 >= t - lookback)
        .sortBy(_._2).lastOption.map(_._3).orNull
      (k, t, lid, best)
    }.toSet
    assert(out == expected)
  }

  test("asOfWithin masks matches older than the lookback, keeps fresh ones") {
    val left = Seq((1L, 100L, "a"), (1L, 500L, "b")).toDF("k", "t", "payload")
    val right = Seq((1L, 90L, "fresh-for-a"), (1L, 120L, "stale-for-b"))
      .toDF("k", "t", "rv")
    val out = AsOfJoin.asOfWithin(left, right, Seq("k"), "t", "t", lit(50L))
      .select("payload", "rv").as[(String, String)].collect().toMap
    assert(out("a") == "fresh-for-a")     // 100 - 90 = 10 <= 50
    assert(out("b") == null,              // 500 - 120 = 380 > 50 → masked
      "stale match must be masked to NULL")
  }

  test("asOf: NULL keys never match (SQL equality semantics)") {
    val left = Seq((Option.empty[Long], 10L, "a"), (Some(1L), 10L, "b"))
      .toDF("k", "t", "payload")
    val right = Seq((Option.empty[Long], 5L, "nullmatch"), (Some(1L), 5L, "real"))
      .toDF("k", "t", "rv")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "t", "t")
      .select("payload", "rv").as[(String, String)].collect().toSet
    assert(out == Set(("a", null), ("b", "real")),
      "null-keyed rows must not join to each other")
  }

  test("asOf equals the brute-force definition on pseudo-random data") {
    // deterministic pseudo-random fixture (no Random: replayable)
    val left = (0 until 400).map { i =>
      (i * 7919 % 13L, (i * 104729 % 500).toLong, i.toLong)
    }.toDF("k", "t", "lid")
    val rightRows = (0 until 300).map { i =>
      ((i * 6101 % 13).toLong, (i * 99991 % 500).toLong)
    }.distinct.map { case (k, t) => (k, t, s"v$k-$t") }
    val right = rightRows.toDF("k", "t", "rv")

    val got = AsOfJoin.asOf(left, right, Seq("k"), "t", "t")
      .as[(Long, Long, Long, String)].collect().toSet
    val byKey = rightRows.groupBy(_._1)
    val expected = (0 until 400).map { i =>
      val (k, t, lid) = (i * 7919 % 13L, (i * 104729 % 500).toLong, i.toLong)
      val best = byKey.getOrElse(k, Seq.empty).filter(_._2 <= t)
        .sortBy(_._2).lastOption.map(_._3).orNull
      (k, t, lid, best)
    }.toSet
    assert(got == expected)
  }

  test("asOfBucketed equals plain asOf across bucket widths (pseudo-random)") {
    val left = (0 until 400).map { i =>
      (i * 7919 % 13L, (i * 104729 % 500).toLong, i.toLong)
    }.toDF("k", "t", "lid")
    val rightRows = (0 until 300).map { i =>
      ((i * 6101 % 13).toLong, (i * 99991 % 500).toLong)
    }.distinct.map { case (k, t) => (k, t, s"v$k-$t") }
    val right = rightRows.toDF("k", "t", "rv")
    val expected = AsOfJoin.asOf(left, right, Seq("k"), "t", "t")
      .as[(Long, Long, Long, String)].collect().toSet
    // widths spanning every regime: 1 (one instant per bucket — every
    // match crosses buckets via carry-in), mid, and wider than the
    // whole time domain (degenerates to the plain single-window case)
    for (width <- Seq(1L, 7L, 40L, 1000L)) {
      val got = AsOfJoin.asOfBucketed(left, right, Seq("k"), "t", "t", width)
        .as[(Long, Long, Long, String)].collect().toSet
      assert(got == expected, s"bucketed(width=$width) diverged from plain asOf")
    }
  }

  test("asOfBucketed: lookback mask and timestamp axis match the plain form") {
    import java.sql.Timestamp
    def ts(sec: Long) = new Timestamp(1700000000000L + sec * 1000)
    val left = (0 until 200).map { i =>
      (i * 7919 % 5L, ts((i * 104729 % 3000).toLong), i.toLong)
    }.toDF("k", "t", "lid")
    val right = (0 until 150).map { i =>
      ((i * 6101 % 5).toLong, (i * 99991 % 3000).toLong)
    }.distinct.map { case (k, s) => (k, ts(s), s"v$k-$s") }.toDF("k", "t", "rv")
    val look = expr("INTERVAL 600 SECONDS")
    val expected = AsOfJoin.asOfWithin(left, right, Seq("k"), "t", "t", look)
      .as[(Long, Timestamp, Long, String)].collect().toSet
    val got = AsOfJoin.asOfBucketed(left, right, Seq("k"), "t", "t",
        bucketWidth = 450L, maxLookback = Some(look))
      .as[(Long, Timestamp, Long, String)].collect().toSet
    assert(got == expected)
  }

  test("asOfBucketed: one hot key spreads across bucket partitions, same answer") {
    // 5k rows on ONE key — the plain form puts all of them on a single
    // reducer; the bucketed form must split them AND still agree
    val left = (0 until 5000).map(i => (1L, i.toLong, i.toLong)).toDF("k", "t", "lid")
    val right = (0 until 500).map(i => (1L, i * 10L, s"r$i")).toDF("k", "t", "rv")
    val expected = (0 until 5000).map { i =>
      (1L, i.toLong, i.toLong, s"r${i / 10}")
    }.toSet
    val got = AsOfJoin.asOfBucketed(left, right, Seq("k"), "t", "t", 250L)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(got == expected)
  }

  test("pick: plain on uniform keys, bucketed on a hot key, same answer either way") {
    // uniform: 13 keys x ~30 rows each, far under any threshold
    val left = (0 until 400).map { i =>
      (i * 7919 % 13L, (i * 104729 % 500).toLong, i.toLong)
    }.toDF("k", "t", "lid")
    val rightRows = (0 until 300).map { i =>
      ((i * 6101 % 13).toLong, (i * 99991 % 500).toLong)
    }.distinct.map { case (k, t) => (k, t, s"v$k-$t") }
    val right = rightRows.toDF("k", "t", "rv")
    assert(AsOfJoin.plan(left, right, Seq("k"), "t", "t") == AsOfJoin.Plain)

    // hot key: key 0 carries 500 of the 530 right rows; threshold 100
    // forces the bucketed form with a width that splits the hot span
    val hotRight = ((0 until 500).map(i => (0L, i.toLong * 2, s"h$i")) ++
      (0 until 30).map(i => (1L + i % 5, i.toLong * 7, s"c$i"))).toDF("k", "t", "rv")
    val hotLeft = (0 until 200).map(i => (i % 6L, (i * 13 % 1000).toLong, i.toLong))
      .toDF("k", "t", "lid")
    val choice = AsOfJoin.plan(hotLeft, hotRight, Seq("k"), "t", "t",
      hotKeyThreshold = 100L)
    choice match {
      case AsOfJoin.Bucketed(w) =>
        // hottest key spans ~1200 time units over ~600 rows; 6+ buckets
        assert(w >= 1 && w <= 250, s"bucket width should split the hot span, got $w")
      case other => fail(s"expected Bucketed on a hot key, got $other")
    }
    // the chosen form is semantics-preserving in both regimes
    val expectUniform = AsOfJoin.asOf(left, right, Seq("k"), "t", "t")
      .as[(Long, Long, Long, String)].collect().toSet
    val gotUniform = AsOfJoin.pick(left, right, Seq("k"), "t", "t")
      .as[(Long, Long, Long, String)].collect().toSet
    assert(gotUniform == expectUniform)
    val expectHot = AsOfJoin.asOf(hotLeft, hotRight, Seq("k"), "t", "t")
      .as[(Long, Long, Long, String)].collect().toSet
    val gotHot = AsOfJoin.pick(hotLeft, hotRight, Seq("k"), "t", "t",
      hotKeyThreshold = 100L)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(gotHot == expectHot)
    // empty inputs stay on the plain form instead of dividing by zero
    assert(AsOfJoin.plan(left.limit(0), right.limit(0), Seq("k"), "t", "t")
      == AsOfJoin.Plain)
  }

  test("pointInInterval: half-open [lo, hi), bucket-crossing intervals, exact boundaries") {
    val points = Seq(0.0, 1.0, 9.999, 10.0, 15.0, 25.0, 30.0).map(Tuple1(_))
      .toDF("p")
    val intervals = Seq(
      ("narrow", 1.0, 10.0),   // within one bucket at width 10
      ("wide", 5.0, 30.0),     // crosses three buckets
      ("empty", 40.0, 41.0)    // matches nothing
    ).toDF("name", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi", 10.0)
      .select("p", "name").as[(Double, String)].collect().toSet
    assert(got == Set(
      (1.0, "narrow"), (9.999, "narrow"),        // lo inclusive, hi exclusive
      (9.999, "wide"), (10.0, "wide"), (15.0, "wide"), (25.0, "wide")))
  }

  test("intervalOverlapJoin equals the naive overlap join, each pair exactly once") {
    val a = (0 until 60).map(i =>
      (i.toLong, (i * 3 % 50).toDouble, (i * 3 % 50 + i % 7 + 1).toDouble))
      .toDF("aid", "a_lo", "a_hi")
    val b = (0 until 40).map(i =>
      (i.toLong, (i * 5 % 45).toDouble, (i * 5 % 45 + i % 11 + 1).toDouble))
      .toDF("bid", "b_lo", "b_hi")
    val fast = RangeJoin.intervalOverlapJoin(a, b, "a_lo", "a_hi", "b_lo", "b_hi", 4.0)
      .select("aid", "bid").as[(Long, Long)].collect().sorted.toSeq
    val naive = a.join(b, col("a_lo") < col("b_hi") && col("b_lo") < col("a_hi"))
      .select("aid", "bid").as[(Long, Long)].collect().sorted.toSeq
    assert(fast == naive, "bucketed overlap join must equal the inequality join")
    assert(fast.distinct == fast, "canonical-bucket dedup emits each pair once")
  }

  test("pointInInterval result equals the naive inequality join") {
    val points = (0 until 500).map(i => Tuple1((i * 7 % 100).toDouble)).toDF("p")
    val intervals = (0 until 20).map(i =>
      (i.toLong, i * 5.0, i * 5.0 + (i % 3 + 1) * 4.0)).toDF("iid", "lo", "hi")
    val fast = RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi", 6.0)
      .select("p", "iid").as[(Double, Long)].collect().sorted.toSeq
    val naive = points.join(intervals, col("p") >= col("lo") && col("p") < col("hi"))
      .select("p", "iid").as[(Double, Long)].collect().sorted.toSeq
    assert(fast == naive)
  }
}
