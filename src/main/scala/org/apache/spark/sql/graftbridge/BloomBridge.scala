package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Exposes Spark's NATIVE bloom-filter expressions — the codegen'd pair
  * Catalyst itself injects for runtime row-level filtering
  * (`BloomFilterAggregate` / `BloomFilterMightContain`, both
  * `private[sql]`-adjacent internals with no public Column wrapper) — so
  * the engine's Bloom pre-screens run as vectorizable native predicates
  * instead of boxed Scala UDFs. Same shim technique as [[ColumnBridge]].
  */
object BloomBridge {

  /** Aggregate a `LongType` column into a serialized bloom filter
    * (`BinaryType`) sized for `expectedItems` at false-positive rate
    * `fpp`. Mergeable: partials combine across partitions like any
    * TypedImperativeAggregate.
    *
    * SIZING CAP: `BloomFilterAggregate` silently clamps its arguments to
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems` /
    * `.maxNumBits` (defaults 4M items / 8M bits) — past the cap the
    * effective fpp degrades and the pre-screen passes more candidates.
    * Correctness is unaffected (callers MUST follow with an exact
    * join, as [[graft.operators.Decontaminate]] does); we log when the
    * request exceeds the cap so the degraded selectivity is visible.
    * Raise the two SQLConf limits on a real cluster for bigger sets. */
  def bloomAgg(child: Column, expectedItems: Long, fpp: Double): Column = {
    val bits = BloomFilter.optimalNumOfBits(expectedItems, fpp)
    val conf = org.apache.spark.sql.internal.SQLConf.get
    val maxItems = conf.getConf(org.apache.spark.sql.internal.SQLConf.RUNTIME_BLOOM_FILTER_MAX_NUM_ITEMS)
    val maxBits = conf.getConf(org.apache.spark.sql.internal.SQLConf.RUNTIME_BLOOM_FILTER_MAX_NUM_BITS)
    if (expectedItems > maxItems || bits > maxBits) {
      // scalastyle:off println
      Console.err.println(
        s"BloomBridge.bloomAgg: requested $expectedItems items / $bits bits exceeds " +
          s"runtime-bloom-filter caps ($maxItems items / $maxBits bits); the filter " +
          "will be clamped and the pre-screen fpp degrades (exact join still required).")
      // scalastyle:on println
    }
    ColumnBridge.column(new BloomFilterAggregate(
      ColumnBridge.expression(child),
      Literal(expectedItems), Literal(bits)).toAggregateExpression())
  }

  /** Native `might_contain(filterBytes, value)` predicate over a
    * serialized filter: the constant deserializes once per task and the
    * probe is a codegen'd hash — no per-row boxing. */
  def mightContain(filterBytes: Array[Byte], value: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(filterBytes, BinaryType),
      ColumnBridge.expression(value)))
}
