package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter build + probe over Spark's native sketch expressions (the
  * same `BloomFilterAggregate` / `BloomFilterMightContain` pair Catalyst's
  * runtime-filter injection uses, wired to the public Column API).
  *
  * The 100 TB pattern this enables: aggregate the SMALL side of a
  * containment question into one compact binary (distributed build — the
  * aggregate merges across partitions like any sketch), ship it to every
  * scan task as a literal, and filter the LARGE side at scan speed with
  * zero shuffle. Probes are xxhash64-based: O(1) per row, codegen'd.
  */
object BloomFunctions {

  /** Aggregate: bloom filter of `c`'s xxhash64 values, sized for
    * `expectedItems` distinct keys. Returns the serialized filter (binary).
    */
  def bloomAgg(c: Column, expectedItems: Long): Column =
    ColumnBridge.column(
      new BloomFilterAggregate(
        XxHash64(Seq(ColumnBridge.expression(c)), 42L), expectedItems)
        .toAggregateExpression())

  /** Scalar probe: does the filter (a driver-held serialized sketch) possibly
    * contain `c`? False negatives are impossible; false positives occur at
    * the filter's configured rate — callers needing exactness re-verify the
    * (tiny) positive set, see `Dedup.bloomDecontaminate`.
    */
  def mightContain(bloom: Array[Byte], c: Column): Column =
    ColumnBridge.column(
      BloomFilterMightContain(Literal(bloom, BinaryType),
        XxHash64(Seq(ColumnBridge.expression(c)), 42L)))
}
