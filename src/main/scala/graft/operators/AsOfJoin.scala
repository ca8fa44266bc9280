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

  private def asOfImpl(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      maxLookback: Option[Column]): DataFrame = {
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
      .intersect(Seq("__t", "__side", "__rp", "__rt"))
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

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fresh = maxLookback match {
      case Some(d) => col("__rp.__rt") >= col("__t") - d
      case None => lit(true)
    }
    l.unionByName(r)
      .withColumn("__rp", last(col("__rp"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(keys.map(col) ++ Seq(col("__t").as(leftTime)) ++
        leftPayload.map(col) ++
        rightPayload.map(c => when(fresh, col(s"__rp.$c")).as(c)): _*)
  }
}
