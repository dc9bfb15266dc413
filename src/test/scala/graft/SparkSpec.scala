package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session base for all suites: one JVM-wide local session with
  * the engine's canonical configs (UTC, AQE, nanosAsLong). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(cores = 4)
  val sf: String = "/root/testdata/sf0.001"
}
