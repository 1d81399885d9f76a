package graft.ops

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregates (SURVEY §2.10). */
object Aggregators {

  /** Minimal change-row shape for the typed latest-wins aggregate. */
  final case class ChangeRow(_id: String, version: Long, deletion: Boolean)

  /** K1 as a typed `Aggregator`: fold a group's change rows into the
    * winning (highest-version) row. Algebraically a max-by — associative
    * and commutative, so Spark applies it map-side (partial aggregation)
    * before the shuffle: only one row per (partition, key) moves, vs the
    * full row set for the window/row_number formulation. Equivalent output
    * (UpsertSpec asserts window-vs-aggregator parity). */
  object LatestWinsAgg extends Aggregator[ChangeRow, ChangeRow, ChangeRow] {
    private val sentinel = ChangeRow("", -1L, deletion = false)
    override def zero: ChangeRow = sentinel
    override def reduce(b: ChangeRow, a: ChangeRow): ChangeRow =
      if (a.version > b.version) a else b
    override def merge(b1: ChangeRow, b2: ChangeRow): ChangeRow =
      if (b1.version >= b2.version) b1 else b2
    override def finish(r: ChangeRow): ChangeRow = r
    override def bufferEncoder: Encoder[ChangeRow] = Encoders.product[ChangeRow]
    override def outputEncoder: Encoder[ChangeRow] = Encoders.product[ChangeRow]
  }

  /** Latest-wins over a typed Dataset via the aggregator. */
  def latestWinsTyped(spark: SparkSession, changes: Dataset[ChangeRow]): Dataset[ChangeRow] = {
    import spark.implicits._
    changes.groupByKey(_._id)
      .agg(LatestWinsAgg.toColumn.name("winner"))
      .map(_._2)
  }
}
