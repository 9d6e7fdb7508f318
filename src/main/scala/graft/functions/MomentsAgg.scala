package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact running moments of an integer-cents value: count, sum, and sum of
  * squares as longs.
  *
  * The merge is long addition — associative AND commutative — so the
  * result is independent of partition layout and merge order, which is
  * what makes a moments aggregate hash-comparable cross-engine at all
  * (float Welford merges reorder rounding and fail exactly that bar;
  * statistics derive downstream from the exact sums in one fixed IEEE
  * expression). This is the SURVEY §2.H extension-tier typed
  * `Aggregator[IN, BUF, OUT]`: the same kernel works in a typed batch
  * `Dataset` aggregation (`mapValues(...).agg(MomentsAgg.toColumn)`) and
  * any place a mergeable moments state is needed.
  *
  * Envelope: `sumSqCents` overflows Long past ~9.2e18 — about 9 billion
  * rows of $10k values. Past that envelope use the streaming Welford
  * state ([[graft.streaming.EventsStreaming.runningZScores]]) or shard
  * the aggregation; overflow here would wrap silently, hence the
  * documented bound rather than a per-row check in the hot loop.
  */
case class Moments(n: Long, sumCents: Long, sumSqCents: Long)

object MomentsAgg extends Aggregator[Long, Moments, Moments] {
  def zero: Moments = Moments(0L, 0L, 0L)
  def reduce(b: Moments, cents: Long): Moments =
    Moments(b.n + 1L, b.sumCents + cents, b.sumSqCents + cents * cents)
  def merge(a: Moments, b: Moments): Moments =
    Moments(a.n + b.n, a.sumCents + b.sumCents, a.sumSqCents + b.sumSqCents)
  def finish(r: Moments): Moments = r
  def bufferEncoder: Encoder[Moments] = Encoders.product[Moments]
  def outputEncoder: Encoder[Moments] = Encoders.product[Moments]
}
