package graft.operators

import graft.SparkSpec
import graft.Tables.loadEvents

/** Integrity laws of the SCD2 build/lookup pair that the hash gate
  * implies but doesn't state: q94's half-open validity intervals TILE
  * each user's observed timeline, so a point-in-time lookup matches
  * every event exactly once, and every NON-EMPTY version is touched.
  * (A version can be empty: two equal-ts events straddling a type
  * change yield [T, T) — its defining event falls in the successor.
  * The tiling law is exact either way; "hits every version" is not.) */
class EventAnalyticsSpec extends SparkSpec {

  import org.apache.spark.sql.functions._

  private val dir = "/root/testdata/sf0.001"

  test("q104: intervals tile the timeline — every event matches exactly one version") {
    val r = EventAnalytics.queries("q104_scd2_lookup")(spark, dir).head()
    val nEvents = loadEvents(spark, dir).count()
    val dim = EventAnalytics.queries("q94_scd2")(spark, dir)
    val nonEmptyVersions = dim.filter(
      col("valid_to").isNull || col("valid_from") < col("valid_to")).count()
    assert(r.getAs[Long]("n_events_matched") === nEvents,
      "a gap or overlap in validity intervals would drop or double-count")
    assert(r.getAs[Long]("n_versions_hit") === nonEmptyVersions,
      "every non-empty version contains at least one event")
  }
}
