package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for every left row, the payload of the
  * single latest right row with the same key and
  * `rightTime <= leftTime` (inclusive — DuckDB/Pandas ASOF `>=`
  * semantics).
  *
  * Spark-first shape: NOT an inequality join, which Catalyst can only
  * execute as a broadcast-nested-loop/cartesian. Instead a tagged
  * UNION + one window pass:
  *   1. tag right rows side=0 and left rows side=1; right payload
  *      columns travel as ONE struct, so the carried values always
  *      come from a single matched right row — never fields stitched
  *      from different rows, even when the payload contains NULLs;
  *   2. hash-partition by key, sort by (time, side) within partitions
  *      — at equal timestamps the right row sorts first, which is what
  *      makes the join inclusive;
  *   3. `last(struct, ignoreNulls)` over the running window carries
  *      the latest right row onto each left row (the struct itself is
  *      NULL only on left rows);
  *   4. keep the side=1 rows and unpack the struct.
  *
  * SQL equality semantics on keys: right rows with a NULL key are
  * dropped up front (they can never equal anything), so a null-keyed
  * left row comes out with NULL payload — matching `ON l.k = r.k`,
  * where NULL = NULL is not a match, instead of Window.partitionBy's
  * null-groups-together behavior.
  *
  * Cost: ONE shuffle of |L|+|R| rows on the key — the same single
  * exchange any per-key window pays (asserted in PlanAuditSpec), no
  * row amplification, no driver state; at 100 TB this scales exactly
  * like `q_window_running`. Left rows with no prior right row keep
  * NULL payloads (left-outer semantics).
  *
  * Determinism: when several right rows share (key, rightTime) the
  * carried row is whichever sorts last, which is not stable across
  * runs — pre-aggregate the right side to one row per (key, time)
  * when that matters (the oracle-checked query wrapper does).
  */
object AsOfJoin {

  import org.apache.spark.sql.Column

  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String): DataFrame =
    asOfImpl(left, right, keys, leftTime, rightTime, None)

  /** As-of join with a maximum lookback: a matched right row older
    * than `maxLookback` before the left time is masked to NULLs (the
    * "join to state, but not stale state" form — e.g. the user's last
    * view within the past hour). `maxLookback` is a Column so both
    * interval (`expr("INTERVAL 1 HOUR")`) and numeric time axes work.
    * Same single-exchange plan as [[asOf]]: the mask is a map-side
    * projection after the carry.
    */
  def asOfWithin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, maxLookback: Column): DataFrame =
    asOfImpl(left, right, keys, leftTime, rightTime, Some(maxLookback))

  /** Skew-hardened as-of join: same semantics as [[asOf]], but the
    * window runs per (key, time-bucket) instead of per key, so one
    * pathologically hot key no longer lands its entire history on a
    * single reducer — each reducer handles at most one bucket of it.
    *
    * `bucketWidth` is in the time column's long-cast units (seconds
    * for timestamps): pick it so a hot key's densest bucket fits one
    * executor comfortably (e.g. 1 day of a key that logs 1M rows/day).
    *
    * Mechanics (all equi-joins/windows, no inequality join):
    *   1. per (key, bucket) reduce the right side to its LAST row —
    *      partial-aggregated, one shuffle of |R|;
    *   2. per key, over the TINY frame of bucket summaries plus the
    *      left side's distinct buckets, a running `last` computes each
    *      left bucket's carry-in: the latest right row from any
    *      STRICTLY earlier bucket (summaries of the same bucket sort
    *      after the marker, so in-bucket rights are excluded here —
    *      they participate in step 3 directly). A hot key contributes
    *      #buckets rows to this window, not #rows;
    *   3. seed each (key, bucket) group with its carry-in as a
    *      side=-1 row at the bucket's start instant, union the real
    *      right (side=0) and left (side=1) rows, and run the [[asOf]]
    *      window partitioned by (key, bucket).
    *
    * Determinism caveat matches [[asOf]]: ties on (key, time) within
    * the right side carry an arbitrary winner — pre-aggregate the
    * right side to one row per (key, time) when that matters.
    *
    * Numeric-axis caveat: bucket assignment divides the long-cast time
    * in double, so axis values must fit double precision (< 2^53 —
    * epoch seconds/millis are fine; raw nanos are not. Timestamps cast
    * to epoch SECONDS and are always safe).
    *
    * PRICE (measured, sf0.1–sf3 sweeps): on UNSKEWED data this form
    * costs ~3–5× the plain [[asOf]] wall clock — e.g. 2.55 s vs 0.54 s
    * at sf0.1 — because it makes three shuffled passes (bucket
    * summaries, carry-in window, bucketed window) where [[asOf]] makes
    * one. It exists for the hot-key case, where the plain form's
    * single per-key reducer becomes the straggler; reach for it on
    * evidence (a key with more rows than one executor comfortably
    * sorts, ~5M), not defensively. [[pick]] encodes that decision rule
    * and chooses the form from the data's own key histogram.
    */
  def asOfBucketed(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, bucketWidth: Long,
      maxLookback: Option[Column] = None): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val (l, r, _, leftPayload, unpack) =
      prepare(left, right, keys, leftTime, rightTime, maxLookback)

    val axis = left.schema(leftTime).dataType
    // bucket start instant on the ORIGINAL axis: <= every row in the
    // bucket (floor to whole units), so a side=-1 seed row there sorts
    // before all of them without losing sub-unit time resolution
    def bucketOf(t: Column): Column = floor(t.cast("long") / bucketWidth)
    def bucketStart(b: Column): Column = axis match {
      case _: org.apache.spark.sql.types.TimestampType =>
        timestamp_seconds(b * bucketWidth)
      case dt => (b * bucketWidth).cast(dt)
    }

    val rb = r.withColumn("__b", bucketOf(col("__t")))
    val lb = l.withColumn("__b", bucketOf(col("__t")))

    // 1. per-(key, bucket) last right row — max_by on (__t, __side)
    //    isn't needed: within a bucket only right rows compete, so
    //    max_by over __t with struct tiebreak on __rp is the same
    //    arbitrary-tie contract as the plain window's `last`
    val summaries = rb.groupBy((keys :+ "__b").map(col): _*)
      .agg(max_by(col("__rp"), col("__t")).as("__rp"))

    // 2. carry-in per left bucket: markers (side 0) vs summaries
    //    (side 1) ordered by (__b, side) — a marker at bucket B sees
    //    exactly the summaries with __b < B
    val markers = lb.select((keys :+ "__b").map(col): _*).distinct()
      .withColumn("__s", lit(0))
      .withColumn("__sum", lit(null).cast(r.schema("__rp").dataType))
    val sums = summaries.withColumn("__s", lit(1))
      .withColumnRenamed("__rp", "__sum")
    val carryW = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__b"), col("__s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carries = markers.unionByName(sums)
      .withColumn("__carry", last(col("__sum"), ignoreNulls = true).over(carryW))
      .where(col("__s") === 0 && col("__carry").isNotNull)
      .select(keys.map(col) ++ Seq(col("__b"),
        bucketStart(col("__b")).as("__t"), lit(-1).as("__side"),
        col("__carry").as("__rp")) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    // 3. the asOf window, now partitioned by (key, bucket)
    val w = Window.partitionBy((keys :+ "__b").map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unpack(lb.unionByName(rb).unionByName(carries)
      .withColumn("__rp", last(col("__rp"), ignoreNulls = true).over(w)))
  }

  /** The decision [[pick]] made, exposed so callers (and tests) can see
    * WHY a form was chosen without re-deriving the histogram.
    */
  sealed trait Choice
  case object Plain extends Choice
  final case class Bucketed(bucketWidth: Long) extends Choice

  /** Decision rule for [[pick]], as data: runs one counting job over
    * the two sides' key projections (cheap — keys + time only, full
    * map-side partial aggregation) and returns [[Plain]] unless some
    * key's combined row count exceeds `hotKeyThreshold`, in which case
    * [[Bucketed]] with a width sized so the hottest key's densest
    * bucket carries roughly `hotKeyThreshold` rows.
    *
    * The default threshold is 5M rows: the point where a single
    * reducer's sort of one key's history stops fitting comfortably in
    * one task (~hundreds of MB at typical row widths). Uniform data
    * stays on the single-exchange plain form — the 3–5× bucketed
    * constant is only paid when the straggler it prevents would cost
    * more.
    */
  def plan(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      hotKeyThreshold: Long = 5000000L): Choice = {
    require(hotKeyThreshold > 0, "hotKeyThreshold must be positive")
    val lk = left.select(keys.map(col) :+ col(leftTime).cast("long").as("__t"): _*)
    val rk = right.select(keys.map(col) :+ col(rightTime).cast("long").as("__t"): _*)
    val both = lk.unionByName(rk)
    val stats = both.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__n"), min("__t").as("__lo"), max("__t").as("__hi"))
      .agg(max("__n").as("maxPerKey"),
        max_by(col("__hi") - col("__lo"), col("__n")).as("hotSpan"))
    val row = stats.collect()(0)
    if (row.isNullAt(0)) Plain // both sides empty
    else {
      val maxPerKey = row.getLong(0)
      if (maxPerKey <= hotKeyThreshold) Plain
      else {
        val span = if (row.isNullAt(1)) 0L else row.getLong(1)
        val nBuckets = math.max(1L, (maxPerKey + hotKeyThreshold - 1) / hotKeyThreshold)
        Bucketed(math.max(1L, span / nBuckets))
      }
    }
  }

  /** As-of join that chooses between [[asOf]] and [[asOfBucketed]] from
    * the data's own key histogram (see [[plan]]): the plain
    * single-exchange form on uniform keys, the skew-hardened bucketed
    * form once one key's history would land >`hotKeyThreshold` rows on
    * a single reducer. Costs one extra counting job over the key
    * columns — amortize by calling [[plan]] once and reusing the
    * choice when joining repeatedly against the same distribution.
    */
  def pick(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      maxLookback: Option[Column] = None,
      hotKeyThreshold: Long = 5000000L): DataFrame =
    plan(left, right, keys, leftTime, rightTime, hotKeyThreshold) match {
      case Plain => asOfImpl(left, right, keys, leftTime, rightTime, maxLookback)
      case Bucketed(w) =>
        asOfBucketed(left, right, keys, leftTime, rightTime, w, maxLookback)
    }

  private def asOfImpl(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      maxLookback: Option[Column]): DataFrame = {
    val (l, r, _, _, unpack) =
      prepare(left, right, keys, leftTime, rightTime, maxLookback)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unpack(l.unionByName(r)
      .withColumn("__rp", last(col("__rp"), ignoreNulls = true).over(w)))
  }

  /** Shared front/back half of both as-of shapes: validation, the
    * tagged left/right projections, and the final unpack (filter to
    * left rows, apply the lookback freshness mask, restore names).
    */
  private def prepare(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, maxLookback: Option[Column])
      : (DataFrame, DataFrame, Seq[String], Seq[String], DataFrame => DataFrame) = {
    require(keys.nonEmpty, "asOf needs at least one key column")
    val leftPayload = left.columns.toSeq.filterNot(c => keys.contains(c) || c == leftTime)
    val rightPayload = right.columns.toSeq.filterNot(c => keys.contains(c) || c == rightTime)
    require(rightPayload.nonEmpty,
      "right side needs at least one payload column to carry")
    val clashes = rightPayload.intersect(leftPayload :+ leftTime)
    require(clashes.isEmpty,
      s"right payload collides with left output columns: ${clashes.mkString(", ")}")
    // reserved internals — catch them on EITHER side up front, or they
    // surface later as an opaque ambiguous-reference AnalysisException
    val reserved = (left.columns ++ right.columns).distinct
      .intersect(Seq("__t", "__side", "__rp", "__rt", "__b", "__s", "__sum", "__carry"))
    require(reserved.isEmpty,
      s"column names reserved by asOf: ${reserved.mkString(", ")}")

    // the matched right row's own time rides along in the struct so a
    // lookback bound can be applied after the carry
    val rpStruct = struct(rightPayload.map(col) :+ col(rightTime).as("__rt"): _*)
    // right rows with any NULL key can never match under SQL equality
    val r = right
      .where(keys.map(col(_).isNotNull).reduce(_ && _))
      .select(keys.map(col) ++ Seq(col(rightTime).as("__t"),
        lit(0).as("__side"),
        rpStruct.as("__rp")) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val l = left.select(
      keys.map(col) ++ Seq(col(leftTime).as("__t"), lit(1).as("__side"),
        lit(null).cast(r.schema("__rp").dataType).as("__rp")) ++
        leftPayload.map(col): _*)

    val fresh = maxLookback match {
      case Some(d) => col("__rp.__rt") >= col("__t") - d
      case None => lit(true)
    }
    val unpack: DataFrame => DataFrame = df => df
      .where(col("__side") === 1)
      .select(keys.map(col) ++ Seq(col("__t").as(leftTime)) ++
        leftPayload.map(col) ++
        rightPayload.map(c => when(fresh, col(s"__rp.$c")).as(c)): _*)
    (l, r, rightPayload, leftPayload, unpack)
  }
}
