package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import scala.collection.mutable

/** Bounded-heap top-k as a typed Aggregator — the scale replacement for
  * `row_number().over(Window.partitionBy(key).orderBy(score))` top-k.
  *
  * The window form materializes and SORTS every row of every key after
  * the shuffle; this aggregator keeps only k candidates per key on the
  * map side (partial aggregation), so the shuffle carries at most
  * k × partitions rows per key and nothing is globally sorted. At 100 TB
  * that's the difference between shuffling the corpus and shuffling the
  * answer.
  *
  * Elements are (id, score); result is ids best-first. Deterministic:
  * ties break toward the smaller id.
  */
class TopKAggregator[IN](k: Int, id: IN => Long, score: IN => Double)
    extends Aggregator[IN, mutable.PriorityQueue[(Double, Long)], Seq[Long]] {

  // dequeue() removes the LARGEST element under this ordering, so rank
  // the worst candidate largest: lowest score first (reversed score
  // compare), larger id on ties (so ties prefer keeping the smaller id)
  private val heapOrd: Ordering[(Double, Long)] =
    Ordering.Tuple2(Ordering.Double.TotalOrdering.reverse, Ordering[Long])

  override def zero: mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(heapOrd)

  override def reduce(
      heap: mutable.PriorityQueue[(Double, Long)],
      row: IN): mutable.PriorityQueue[(Double, Long)] = {
    heap.enqueue((score(row), id(row)))
    while (heap.size > k) heap.dequeue()
    heap
  }

  override def merge(
      a: mutable.PriorityQueue[(Double, Long)],
      b: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    b.foreach(a.enqueue(_))
    while (a.size > k) a.dequeue()
    a
  }

  override def finish(heap: mutable.PriorityQueue[(Double, Long)]): Seq[Long] =
    heap.toSeq.sortBy { case (score, id) => (-score, id) }.map(_._2)

  override def bufferEncoder: Encoder[mutable.PriorityQueue[(Double, Long)]] =
    Encoders.kryo[mutable.PriorityQueue[(Double, Long)]]

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
