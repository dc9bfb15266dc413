package graft

import org.apache.spark.sql.SparkSession

/** Deterministic synchronization with the async listener bus for the
  * probe mains ([[StageProbe]], [[ErScaleProbe]]): a fixed
  * `Thread.sleep` was the only barrier before round 15, and under load
  * the final stage-completed event could land after the sleep,
  * silently dropping the hottest stage from the emitted task-count
  * witness (r14 ADVICE). `LiveListenerBus.waitUntilEmpty` is the real
  * barrier but is `private[spark]` — reach it by reflection the way
  * Spark's own TestUtils callers do; if the reflective shape ever
  * changes, fall back to polling the caller's event count until it is
  * stable for a full second (bounded at 15 s).
  */
object ProbeSync {

  def awaitQuiesce(spark: SparkSession, observed: () => Int): Unit = {
    val viaReflection =
      try {
        val sc = spark.sparkContext
        val m = sc.getClass.getMethod("listenerBus")
        val bus = m.invoke(sc)
        val wait0 = bus.getClass.getMethods
          .find(x => x.getName == "waitUntilEmpty" &&
            x.getParameterCount == 0)
        val wait1 = bus.getClass.getMethods
          .find(x => x.getName == "waitUntilEmpty" &&
            x.getParameterCount == 1 &&
            x.getParameterTypes()(0) == java.lang.Long.TYPE)
        // r15 advice: a TIMEOUT from the found method (it throws on
        // expiry, surfacing here as InvocationTargetException) is a
        // completed quiesce ATTEMPT — waiting the poll window on top
        // would double the worst case to ~30 s. Only a missing
        // reflective shape falls through to the poll.
        if (wait0.isDefined) {
          try wait0.get.invoke(bus) catch { case _: Exception => () }
          true
        } else if (wait1.isDefined) {
          try wait1.get.invoke(bus, java.lang.Long.valueOf(15000L))
          catch { case _: Exception => () }
          true
        } else false
      } catch { case _: Exception => false }
    if (!viaReflection) {
      // stabilization poll: quiesced = no new events for 1 s
      val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
      var last = observed()
      var stableSince = System.nanoTime()
      while (System.nanoTime() < deadline &&
          System.nanoTime() - stableSince < 1000L * 1000 * 1000) {
        Thread.sleep(100)
        val now = observed()
        if (now != last) { last = now; stableSince = System.nanoTime() }
      }
    }
  }
}
