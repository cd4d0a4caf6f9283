package graft.ops

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** kNN candidate: exact distance + surface key (SURVEY.md O-39). Only the
  * join key rides through the aggregation — lineage columns (building_id,
  * surface_class) re-attach after top-k, so buffers and the exchange stay
  * minimal.
  */
final case class KnnCand(
    dist: Double,
    surface_id: String)

/** Bounded-buffer top-k aggregator (O-39/O-53). The buffer never exceeds k
  * candidates ordered by (dist, surface_id), so the PARTIAL aggregation
  * reduces each image's ~9-cell candidate fan-out to ≤ k rows map-side —
  * the shuffle moves k·|images| rows, not the full candidate set. Ordering
  * is total (surface_id is unique per candidate) ⇒ deterministic output at
  * any parallelism.
  */
class TopKCandAgg(k: Int) extends Aggregator[KnnCand, Seq[KnnCand], Seq[KnnCand]] {
  private def lt(a: KnnCand, b: KnnCand): Boolean =
    a.dist < b.dist || (a.dist == b.dist && a.surface_id < b.surface_id)

  override def zero: Seq[KnnCand] = Vector.empty
  override def reduce(b: Seq[KnnCand], a: KnnCand): Seq[KnnCand] =
    if (b.length >= k && !lt(a, b.last)) b
    else ((b :+ a).sortWith(lt)).take(k)
  override def merge(x: Seq[KnnCand], y: Seq[KnnCand]): Seq[KnnCand] =
    (x ++ y).sortWith(lt).take(k)
  override def finish(b: Seq[KnnCand]): Seq[KnnCand] = b
  override def bufferEncoder: Encoder[Seq[KnnCand]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[KnnCand]] = ExpressionEncoder()
}
