package graft.expressions

import org.apache.spark.sql.{Column, GraftColumnBridge => B}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.lit

/** Column forms of Spark's own Bloom-filter expressions — the same
  * `BloomFilterAggregate` / `BloomFilterMightContain` pair Catalyst
  * injects for runtime shuffle-join pruning, exposed here so operators
  * can build the filter over an explicit key set and probe it in a
  * whole-stage-codegen'd predicate.
  *
  * Contract mirrors the internal expressions: the build side takes
  * LONG keys (hash upstream if needed), the probe side requires the
  * serialized filter to be FOLDABLE (a literal or scalar subquery) —
  * so the intended flow is: distributed `agg(bloomAgg(...))`, ONE
  * bounded 1-row collect of the serialized sketch, then probe with
  * `mightContain(bloomLit(bytes), key)`. That is exactly how Spark
  * materializes its own runtime filters (subquery result broadcast
  * into the probe plan); the sketch is megabytes for tens of millions
  * of keys, never data-scale.
  */
object BloomSketch {

  /** Distributed Bloom build over a LONG column; returns BINARY (the
    * serialized `org.apache.spark.util.sketch.BloomFilter`). Partials
    * are fixed-size bit arrays merged by OR — map-side combine cost is
    * O(bits), independent of row count. `expectedItems` only tunes the
    * false-positive rate (sizing follows Spark's own n·ln(1/fpp)
    * rule); an underestimate degrades speed, never correctness.
    *
    * CONF CAP: `BloomFilterAggregate` silently clamps the sizing to
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems` (default
    * 4M) and `...maxNumBits` (default 67M bits ≈ 8 MB). Past the cap
    * the sketch saturates toward fpp≈1 and a pre-filter built on it
    * degenerates to a no-op — correct (downstream exact confirms keep
    * working) but pointless. When `expectedItems` exceeds the
    * configured cap this method logs a warning naming the confs to
    * raise; it does not mutate session conf behind the caller's back.
    */
  def bloomAgg(keys: Column, expectedItems: Long): Column = {
    val conf = org.apache.spark.sql.internal.SQLConf.get
    val maxItems = conf.getConfString(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumItems", "4000000").toLong
    val maxBits = conf.getConfString(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "67108864").toLong
    val log = org.slf4j.LoggerFactory.getLogger(getClass)
    if (expectedItems > maxItems)
      log.warn(
        s"bloomAgg: expectedItems=$expectedItems exceeds " +
          s"spark.sql.optimizer.runtime.bloomFilter.maxNumItems=$maxItems - " +
          "the sketch will be clamped and its fpp degrades toward 1 " +
          "(pre-filter becomes a no-op; correctness is unaffected). Raise " +
          "maxNumItems and maxNumBits to size the sketch for this key set.")
    // Sizing is ALSO clamped by maxNumBits (Spark sizes 8 bits/item):
    // raising maxNumItems alone still saturates once 8·items passes the
    // bits cap. `/ 8` form avoids 8·items overflowing Long.
    else if (expectedItems > maxBits / 8)
      log.warn(
        s"bloomAgg: expectedItems=$expectedItems needs ~8x that in bits, " +
          s"exceeding spark.sql.optimizer.runtime.bloomFilter" +
          s".maxNumBits=$maxBits - the sketch will be clamped and its fpp " +
          "degrades toward 1 (pre-filter becomes a no-op; correctness is " +
          "unaffected). Raise maxNumBits to size the sketch for this key set.")
    B.column(new BloomFilterAggregate(B.expression(keys), expectedItems)
      .toAggregateExpression())
  }

  /** Codegen'd membership probe: true if `key` MIGHT be in the sketch
    * (no false negatives). `bloom` must be foldable — see class doc.
    */
  def mightContain(bloom: Column, key: Column): Column =
    B.column(BloomFilterMightContain(B.expression(bloom), B.expression(key)))

  /** Foldable literal from a collected serialized sketch. */
  def bloomLit(bytes: Array[Byte]): Column = lit(bytes)
}
