package graft.operators

import graft.SparkSpec
import graft.Tables.loadEvents

/** Integrity laws of the SCD2 build/lookup pair that the hash gate
  * implies but doesn't state: q94's validity intervals TILE each
  * user's observed timeline, so a point-in-time lookup matches every
  * event exactly once and touches every version at least once. */
class EventAnalyticsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q104: intervals tile the timeline — every event matches exactly one version") {
    val r = EventAnalytics.queries("q104_scd2_lookup")(spark, dir).head()
    val nEvents = loadEvents(spark, dir).count()
    val nVersions = EventAnalytics.queries("q94_scd2")(spark, dir).count()
    assert(r.getAs[Long]("n_events_matched") === nEvents,
      "a gap or overlap in validity intervals would drop or double-count")
    assert(r.getAs[Long]("n_versions_hit") === nVersions,
      "every version contains at least its own defining event")
  }
}
