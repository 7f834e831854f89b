package graft.ops

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import scala.collection.mutable

/** Approximate heavy hitters via the SpaceSaving sketch (Metwally et
  * al., "Efficient computation of frequent and top-k elements in data
  * streams", ICDT 2005) as a typed Spark `Aggregator` — the custom-UDAF
  * surface (SURVEY.md §4 item 3) on a problem Spark has no built-in
  * for: exact top-k frequency needs a full groupBy; the sketch keeps a
  * bounded `capacity`-entry summary per partition and merges
  * associatively, so the shuffle moves one small map per partition
  * instead of one row per distinct key.
  *
  * Guarantee: any item with true count > N/capacity is present in the
  * summary; reported counts overestimate by at most the recorded
  * `error` bound. Use capacity ≥ k/θ for top-k at support threshold θ.
  */
object HeavyHitters {

  final case class Entry(count: Long, error: Long)

  type Sketch = mutable.HashMap[String, Entry]

  /** The SpaceSaving insertion step, shared by the batch Aggregator and
    * the streaming keyed state ([[graft.streaming.Streams.heavyHitters]]).
    */
  def offer(b: Sketch, capacity: Int, item: String,
            count: Long, error: Long): Unit =
    b.get(item) match {
      case Some(e) => b.update(item, Entry(e.count + count, e.error + error))
      case None =>
        if (b.size < capacity) b.update(item, Entry(count, error))
        else {
          // evict the current min; newcomer inherits its count as error
          val (minK, minE) = b.minBy(_._2.count)
          b.remove(minK)
          b.update(item, Entry(minE.count + count, minE.count + error))
        }
    }

  final class SpaceSaving(capacity: Int)
    extends Aggregator[String, Sketch, Seq[(String, Long, Long)]] {

    override def zero: Sketch = mutable.HashMap.empty

    override def reduce(b: Sketch, item: String): Sketch = {
      if (item != null) HeavyHitters.offer(b, capacity, item, 1, 0)
      b
    }

    override def merge(a: Sketch, b: Sketch): Sketch = {
      b.foreach { case (k, e) => HeavyHitters.offer(a, capacity, k, e.count, e.error) }
      a
    }

    /** (item, estimated count, max overestimate), count-descending. */
    override def finish(b: Sketch): Seq[(String, Long, Long)] =
      b.toSeq.map { case (k, e) => (k, e.count, e.error) }
        .sortBy { case (k, c, _) => (-c, k) }

    override def bufferEncoder: Encoder[Sketch] = Encoders.kryo[Sketch]
    override def outputEncoder: Encoder[Seq[(String, Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long, Long)]]()
  }

  /** Column-function form: `df.agg(topK(32)(col("token")))`. */
  def topK(capacity: Int): Column => Column = udaf(new SpaceSaving(capacity)).apply(_)
}
