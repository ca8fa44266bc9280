package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Order-insensitive correctness rollup for query outputs too large to
  * dump and hash row-by-row through the driver compare harness (e.g.
  * k5_explode_bridge at sf100 ≈ 400M rows: Verify's coalesce(1) dump +
  * python fetchall would need >100 GB RAM). Prints `rows=<n>
  * hashsum=<decimal>` where hashsum = Σ over rows of the first-15-hex
  * bigint of md5(col1 || ':' || col2 ...), nulls rendered as 'null' —
  * every piece portable SQL, so tools/rollup_check.py reproduces the
  * identical pair in DuckDB from the query's oracle SQL and equality
  * of both numbers is a full-content match (mod md5 collisions).
  *
  * Args: <sfDir> <queryName>. Columns are rendered with CAST(c AS
  * STRING); only use on integer/string outputs (float rendering is
  * not engine-portable).
  */
object RollupCheck {
  def main(args: Array[String]): Unit = {
    val (dir, name) = (args(0), args(1))
    val spark = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    val rendered = df.schema.fieldNames.map(c =>
      coalesce(col(c).cast("string"), lit("null")))
    val hashed = conv(substring(md5(concat_ws(":", rendered.toSeq: _*)), 1, 15),
      16, 10).cast(DecimalType(38, 0))
    val r = df.agg(count(lit(1)).as("rows"), sum(hashed).as("hashsum")).head()
    println(s"rows=${r.getLong(0)} hashsum=${r.getDecimal(1)}")
    spark.stop()
  }
}
