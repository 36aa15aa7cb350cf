package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}

/** Column bridges for Spark's built-in Bloom-filter sketch expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the machinery
  * behind Catalyst's injected runtime row-group filters), which ship in
  * the internal function registry and have no public `functions._`
  * surface.
  *
  * Used by q98: build a fixed-size Bloom summary of the eval-set gram
  * hashes, prefilter the (at scale, vastly larger) corpus gram stream
  * with the codegen'd `might_contain` predicate, and only then run the
  * exact semi-join on the survivors. The sketch is a few hundred KB
  * regardless of eval-set size, so it rides to executors as a literal
  * the way Spark's own runtime filters do (subquery result → constant).
  */
object SketchBridge {

  /** Aggregate a LongType column into a serialized Bloom filter
    * (binary). `expectedItems`/`numBits` size the sketch: false-positive
    * rate ~ (1 - e^(-kn/m))^k with k derived by Spark from m/n. */
  def bloom_agg(c: Column, expectedItems: Long, numBits: Long): Column =
    toColumn(new BloomFilterAggregate(toExpression(c),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Codegen membership probe of a LongType value against a CONSTANT
    * serialized Bloom filter (Catalyst requires the sketch side be
    * foldable or a subquery result — pass `lit(bytes)`). */
  def might_contain(bloom: Column, v: Column): Column =
    toColumn(BloomFilterMightContain(toExpression(bloom), toExpression(v)))
}
