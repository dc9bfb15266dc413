package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session base for all suites: one JVM-wide local session with
  * the engine's canonical configs (UTC, AQE, nanosAsLong). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(cores = 4)
  val sf: String = "/root/testdata/sf0.001"

  /** A second session on the shared context, built with
    * [[graft.plans.GraftExtensions]] installed session-wide (getOrCreate
    * would return the existing extension-less session, so the
    * active/default sessions are cleared first and restored after). */
  def withExtensionSession[T](f: SparkSession => T): T = {
    val prior = SparkSession.getDefaultSession
    spark // force shared session (and its SparkContext) to exist first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val ext = GraftSession.configure(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .withExtensions(new graft.plans.GraftExtensions))
      .getOrCreate()
    try f(ext)
    finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prior.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }
}
