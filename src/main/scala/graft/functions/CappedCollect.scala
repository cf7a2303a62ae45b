package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Result of a size-capped collect: the collected ids, or an overflow flag
  * when the group exceeded the cap (in which case `ds` is empty — the
  * oversized list is never materialized). */
case class CappedList(ds: Seq[Long], overflow: Boolean)

/** `collect_list` with a HARD buffer bound: the aggregation buffer stops
  * growing the moment a group exceeds `cap`, so a degenerate hot group (an
  * LSH bucket whose band key collapsed, an all-near-dup corpus) can never
  * materialize a giant row or feed a C(n,2) pair expansion. Overflowing
  * groups come back as `overflow=true` with an EMPTY list — the consumer
  * counts/drops them instead of exploding them.
  *
  * This is the scale dial the reference's dedup pipelines put in front of
  * candidate-pair generation; at 100 TB a single unbounded bucket is the
  * difference between a bounded shuffle and an OOM. Used by
  * TextPipeline q35 (MinHash/LSH near-dup pairs).
  */
final class CappedCollect(cap: Int) extends Aggregator[Long, CappedList, CappedList] {
  def zero: CappedList = CappedList(Vector.empty, overflow = false)

  def reduce(b: CappedList, a: Long): CappedList =
    if (b.overflow) b
    else if (b.ds.length >= cap) CappedList(Vector.empty, overflow = true)
    else CappedList(b.ds :+ a, overflow = false)

  def merge(x: CappedList, y: CappedList): CappedList =
    if (x.overflow || y.overflow || x.ds.length + y.ds.length > cap)
      CappedList(Vector.empty, overflow = true)
    else CappedList(x.ds ++ y.ds, overflow = false)

  def finish(r: CappedList): CappedList = r

  def bufferEncoder: Encoder[CappedList] = Encoders.product[CappedList]
  def outputEncoder: Encoder[CappedList] = Encoders.product[CappedList]
}
