package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed bounded top-k aggregator (SURVEY §2.9 north-star): keeps at
  * most k (sortKey, payload) pairs per group in a min-heap, so a
  * group's state is O(k) no matter how many rows it sees — the
  * scalable alternative to `collect_list` + sort + slice, whose state
  * is O(group size) and OOMs on hot groups at 100 TB.
  *
  * Spark runs this as an ObjectHashAggregate with partial merge:
  * per-partition heaps combine pairwise, so the shuffle carries at
  * most k pairs per (partition, group). Output is sorted descending by
  * sortKey with ascending payload tie-break — a total order, making
  * results oracle-comparable.
  */
final case class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), mutable.PriorityQueue[(Double, Long)], Seq[(Double, Long)]] {

  // min-heap on (sortKey asc, payload desc): the head is the weakest
  // element, evicted first; payload desc in the ordering makes the
  // kept set deterministic under sortKey ties (smaller payload wins)
  private def heapOrdering: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, p) => (-s, p) }

  override def zero: mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(heapOrdering)

  override def reduce(heap: mutable.PriorityQueue[(Double, Long)],
                      row: (Double, Long)): mutable.PriorityQueue[(Double, Long)] = {
    heap.enqueue(row)
    while (heap.size > k) heap.dequeue()
    heap
  }

  override def merge(a: mutable.PriorityQueue[(Double, Long)],
                     b: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    b.foreach(a.enqueue(_))
    while (a.size > k) a.dequeue()
    a
  }

  override def finish(heap: mutable.PriorityQueue[(Double, Long)]): Seq[(Double, Long)] =
    heap.toSeq.sortBy { case (s, p) => (-s, p) }

  override def bufferEncoder: Encoder[mutable.PriorityQueue[(Double, Long)]] =
    Encoders.kryo[mutable.PriorityQueue[(Double, Long)]]

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}
