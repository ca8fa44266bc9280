package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession

/** Shared local session for all suites (one JVM-wide session — Spark
  * startup dominates suite time otherwise).
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = GraftSession.local("4")
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

trait SparkSpec extends AnyFunSuite {
  // stable identifier (lazy val, not def) so `import spark.implicits._` works
  protected lazy val spark: SparkSession = TestSpark.spark
}
