package graft.expressions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Exact interpolated percentiles over a bounded-cardinality numeric
  * column, via a primitive open-addressing count map.
  *
  * Same linear-interpolation semantics as DuckDB's `quantile_cont`
  * (the oracle this engine hash-matches against): position `(N−1)·p`
  * over the sorted multiset, interpolated in the lerp form
  * `vlo + frac·(vhi−vlo)`. Spark's exact `percentile` computes the
  * algebraically-equal two-term form `(hi−pos)·vlo + (pos−lo)·vhi`,
  * which can differ by 1 ulp on non-dyadic values — so agreement with
  * Spark is exact on dyadic inputs and within 1 ulp in general (pinned
  * in `CountMapPercentileSpec`). Nulls ignored; empty input → null.
  *
  * Why a kernel: Spark's exact `Percentile` keeps its counts in an
  * `OpenHashMap[AnyRef, Long]` — every row boxes the value and hashes
  * the box — and a query wanting k percentiles over the SAME column as
  * separate aggregate calls pays k maps and k inserts per row. This
  * buffer is two primitive arrays (`Array[Double]` keys /
  * `Array[Long]` counts, emptiness = count 0), one insert per row
  * regardless of how many percentages are requested, and the partial
  * state is `O(distinct values)` — tiny and mergeable, the same scale
  * contract as a sketch, but exact.
  *
  * The bounded-domain contract is enforced: more than `maxDistinct`
  * distinct values throws with a pointer to `percentile_approx` —
  * silently degrading to an unbounded buffer is how 100-TB jobs OOM.
  * (Defaults to 1<<16: far above any genuinely low-cardinality domain,
  * ~1 MB of buffer at the cap.)
  */
case class CountMapPercentile(
    child: Expression,
    percentages: Seq[Double],
    maxDistinct: Int = CountMapPercentile.DefaultMaxDistinct,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountMapPercentile.DoubleCounts]
  with UnaryLike[Expression] {

  require(percentages.nonEmpty && percentages.forall(p => p >= 0.0 && p <= 1.0),
    s"percentages must be in [0,1], got $percentages")
  require(maxDistinct > 0, "maxDistinct must be positive")

  override def prettyName: String = "count_map_percentile"
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"count_map_percentile expects double (cast upstream), got ${t.catalogString}")
  }

  override def createAggregationBuffer(): CountMapPercentile.DoubleCounts =
    new CountMapPercentile.DoubleCounts(maxDistinct)

  override def update(buf: CountMapPercentile.DoubleCounts,
      input: InternalRow): CountMapPercentile.DoubleCounts = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double], 1L)
    buf
  }

  override def merge(buf: CountMapPercentile.DoubleCounts,
      other: CountMapPercentile.DoubleCounts): CountMapPercentile.DoubleCounts = {
    other.foreach((k, c) => buf.add(k, c))
    buf
  }

  override def eval(buf: CountMapPercentile.DoubleCounts): Any = {
    val out = buf.percentiles(percentages.toArray)
    if (out == null) null else new GenericArrayData(out)
  }

  override def serialize(buf: CountMapPercentile.DoubleCounts): Array[Byte] =
    buf.toBytes

  override def deserialize(bytes: Array[Byte]): CountMapPercentile.DoubleCounts =
    CountMapPercentile.DoubleCounts.fromBytes(bytes, maxDistinct)

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMapPercentile =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMapPercentile =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountMapPercentile =
    copy(child = newChild)
}

object CountMapPercentile {
  import org.apache.spark.sql.GraftColumnBridge

  val DefaultMaxDistinct: Int = 1 << 16

  /** `Array[Double]` of the exact percentiles of `col` (cast to
    * double) at `ps`, one map insert per row. Bounded-domain contract:
    * throws past `maxDistinct` distinct values.
    */
  def of(col: Column, ps: Seq[Double],
      maxDistinct: Int = DefaultMaxDistinct): Column =
    GraftColumnBridge.column(
      CountMapPercentile(GraftColumnBridge.expression(col.cast("double")),
        ps, maxDistinct).toAggregateExpression())

  /** Primitive double→long count map: open addressing, linear probing,
    * power-of-2 capacity, emptiness = count 0 (so key slots never need
    * a sentinel). +0.0/−0.0 normalize to one key; NaN hashes to one
    * slot via its canonical bits.
    */
  final class DoubleCounts(maxDistinct: Int) {
    private var cap = 64
    private var keys = new Array[Double](cap)
    private var counts = new Array[Long](cap)
    private var used = 0

    def size: Int = used

    private def idx(k: Double): Int = {
      // finalizer from splitmix64 over the canonical bits
      var h = java.lang.Double.doubleToLongBits(k + 0.0)
      h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
      h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
      (h ^ (h >>> 31)).toInt & (cap - 1)
    }

    def add(k0: Double, c: Long): Unit = {
      val k = k0 + 0.0 // collapse -0.0 into +0.0
      var i = idx(k)
      while (true) {
        if (counts(i) == 0L) {
          if (used == maxDistinct) throw new IllegalStateException(
            s"count_map_percentile: more than $maxDistinct distinct values; " +
              "this aggregate is for bounded domains - use percentile_approx")
          keys(i) = k; counts(i) = c; used += 1
          if (used * 10 >= cap * 7) grow()
          return
        } else if (keyEq(keys(i), k)) {
          counts(i) += c
          return
        } else i = (i + 1) & (cap - 1)
      }
    }

    private def keyEq(a: Double, b: Double): Boolean =
      java.lang.Double.doubleToLongBits(a) == java.lang.Double.doubleToLongBits(b)

    private def grow(): Unit = {
      val ok = keys; val oc = counts
      cap <<= 1
      keys = new Array[Double](cap)
      counts = new Array[Long](cap)
      var i = 0
      while (i < ok.length) {
        if (oc(i) != 0L) {
          var j = idx(ok(i))
          while (counts(j) != 0L) j = (j + 1) & (cap - 1)
          keys(j) = ok(i); counts(j) = oc(i)
        }
        i += 1
      }
    }

    def foreach(f: (Double, Long) => Unit): Unit = {
      var i = 0
      while (i < cap) { if (counts(i) != 0L) f(keys(i), counts(i)); i += 1 }
    }

    /** Exact interpolated percentiles (null when no values seen). */
    def percentiles(ps: Array[Double]): Array[Double] = {
      if (used == 0) return null
      val ks = new Array[Double](used)
      val cs = new Array[Long](used)
      var n = 0
      var i = 0
      while (i < cap) {
        if (counts(i) != 0L) { ks(n) = keys(i); cs(n) = counts(i); n += 1 }
        i += 1
      }
      // sort both by key (insertion indices -> sort pairs)
      val order = Array.range(0, used)
        .sortBy(ks(_))(Ordering.Double.TotalOrdering)
      val sk = order.map(ks(_))
      val sc = order.map(cs(_))
      val cum = new Array[Long](used)
      var acc = 0L
      i = 0
      while (i < used) { acc += sc(i); cum(i) = acc; i += 1 }
      val total = acc

      // order statistic at 0-based position pos (0 <= pos < total)
      def at(pos: Long): Double = {
        var lo = 0; var hi = used - 1
        while (lo < hi) { // first idx with cum(idx) > pos
          val mid = (lo + hi) >>> 1
          if (cum(mid) > pos) hi = mid else lo = mid + 1
        }
        sk(lo)
      }

      ps.map { p =>
        val h = (total - 1) * p
        val lo = math.floor(h).toLong
        val hi = math.ceil(h).toLong
        val vlo = at(lo)
        if (hi == lo) vlo else vlo + (h - lo) * (at(hi) - vlo)
      }
    }

    def toBytes: Array[Byte] = {
      val bos = new ByteArrayOutputStream(8 + used * 16)
      val out = new DataOutputStream(bos)
      out.writeInt(used)
      foreach { (k, c) => out.writeDouble(k); out.writeLong(c) }
      out.flush()
      bos.toByteArray
    }
  }

  object DoubleCounts {
    def fromBytes(bytes: Array[Byte], maxDistinct: Int): DoubleCounts = {
      val in = ByteBuffer.wrap(bytes)
      val n = in.getInt
      val m = new DoubleCounts(maxDistinct)
      var i = 0
      while (i < n) { m.add(in.getDouble, in.getLong); i += 1 }
      m
    }
  }
}
