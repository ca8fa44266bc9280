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
  *   1. tag right rows side=0 and left rows side=1, aligning schemas
  *      with typed nulls for the other side's payload;
  *   2. hash-partition by key, sort by (time, side) within partitions
  *      — at equal timestamps the right row sorts first, which is what
  *      makes the join inclusive;
  *   3. `last(payload, ignoreNulls)` over the running window carries
  *      the most recent right values onto each left row;
  *   4. keep the side=1 rows.
  *
  * Cost: ONE shuffle of |L|+|R| rows on the key — the same single
  * exchange any per-key window pays (asserted in PlanAuditSpec), no
  * row amplification, no driver state; at 100 TB this scales exactly
  * like `q_window_running`. Left rows with no prior right row keep
  * NULL payloads (left-outer semantics).
  *
  * Determinism: when several right rows share (key, rightTime) the
  * carried payload is whichever sorts last, which is not stable across
  * runs — pre-aggregate the right side to one row per (key, time)
  * when that matters (the oracle-checked query wrapper does).
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String): DataFrame = {
    val leftPayload = left.columns.toSeq.filterNot(c => keys.contains(c) || c == leftTime)
    val rightPayload = right.columns.toSeq.filterNot(c => keys.contains(c) || c == rightTime)
    require(leftPayload.intersect(rightPayload).isEmpty,
      s"payload column collision: ${leftPayload.intersect(rightPayload).mkString(", ")}")

    val l = left.select(
      keys.map(col) ++ Seq(col(leftTime).as("__t"), lit(1).as("__side")) ++
        leftPayload.map(col) ++
        rightPayload.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val r = right.select(
      keys.map(col) ++ Seq(col(rightTime).as("__t"), lit(0).as("__side")) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightPayload.map(col): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightPayload.foldLeft(l.unionByName(r)) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.where(col("__side") === 1)
      .select(keys.map(col) ++ Seq(col("__t").as(leftTime)) ++
        (leftPayload ++ rightPayload).map(col): _*)
  }
}
