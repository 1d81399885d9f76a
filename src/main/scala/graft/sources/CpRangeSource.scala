package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 batch source for the reference's partitioned checkpoint
  * range scan (do_scan, main/src/etl.rs:886-1025).
  *
  * Faithful to the reference's work distribution: checkpoints are walked
  * hi→lo, ROUND-ROBIN partitioned across N workers (`step_by(step_size)`
  * with offset `partition`, main/src/etl.rs:428-442,902), and
  * already-completed ranges are skipped inside each worker
  * (main/src/etl.rs:913-939 — the reference likewise loads the completed
  * range list into memory before planning the scan).
  *
  * Options:
  *  - `start`, `end`: inclusive checkpoint bounds
  *  - `partitions`: worker count (default 8)
  *  - `completed`: skip-list as "end:start,end:start" descending ranges
  *    (the output of PipelineOps.descendingRanges — tiny)
  *
  * Usage: `spark.read.format("cp-range").option(...).load()` → `cp BIGINT`.
  * At 100 TB this source shape is what replaces `spark.range` + anti-join
  * when the skip-list is known at plan time: pruning happens at the
  * partition level before a single row is produced.
  */
class CpRangeSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "cp-range"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CpRangeSource.Schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new CpRangeTable(new CaseInsensitiveStringMap(properties))
}

object CpRangeSource {
  val Schema: StructType = StructType(Seq(StructField("cp", LongType, nullable = false)))

  /** Parse "end:start,end:start" into inclusive ranges. */
  def parseRanges(s: String): Array[(Long, Long)] =
    if (s == null || s.isEmpty) Array.empty
    else s.split(',').map { r =>
      val Array(e, st) = r.split(':')
      (e.toLong, st.toLong)
    }

  def formatRanges(ranges: Seq[(Long, Long)]): String =
    ranges.map { case (e, s) => s"$e:$s" }.mkString(",")
}

private[sources] class CpRangeTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "cp_range"
  override def schema(): StructType = CpRangeSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new CaseInsensitiveStringMap(
      (options.asScala ++ opts.asScala).asJava)
    new CpRangeScan(merged)
  }
}

private[sources] class CpRangeScan(options: CaseInsensitiveStringMap)
    extends ScanBuilder with Scan with Batch {
  private val start = options.getLong("start", 0L)
  private val end = options.getLong("end", 0L)
  private val partitions = options.getInt("partitions", 8)
  private val completed = CpRangeSource.parseRanges(options.get("completed"))

  override def build(): Scan = this
  override def readSchema(): StructType = CpRangeSource.Schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    // Round-robin by cp % partitions, exactly like the reference's
    // step_by(step_size) worker split.
    (0 until partitions).map(i =>
      CpRangePartition(start, end, i, partitions, completed): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new CpRangeReaderFactory
}

private[sources] case class CpRangePartition(
    start: Long, end: Long, offset: Int, step: Int,
    completed: Array[(Long, Long)]) extends InputPartition

private[sources] class CpRangeReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[CpRangePartition]
    new CpRangeReader(p)
  }
}

/** Walks this worker's checkpoints descending, skipping completed ranges
  * (ranges are descending by end — advance a cursor instead of scanning,
  * mirroring the `advance_by` skip at main/src/etl.rs:927). */
private[sources] class CpRangeReader(p: CpRangePartition)
    extends PartitionReader[InternalRow] {
  // highest cp ≤ end with cp % step == offset
  private var cp: Long = p.end - java.lang.Math.floorMod(p.end - p.offset, p.step.toLong)
  private var rangeIdx = 0
  private var current: Long = _

  private def skipCompleted(): Unit = {
    while (rangeIdx < p.completed.length && p.completed(rangeIdx)._2 > cp)
      rangeIdx += 1
    while (rangeIdx < p.completed.length &&
        cp >= p.completed(rangeIdx)._2 && cp <= p.completed(rangeIdx)._1) {
      cp -= p.step
      while (rangeIdx < p.completed.length && p.completed(rangeIdx)._2 > cp)
        rangeIdx += 1
    }
  }

  override def next(): Boolean = {
    skipCompleted()
    if (cp < p.start) false
    else { current = cp; cp -= p.step; true }
  }

  override def get(): InternalRow = new GenericInternalRow(Array[Any](current))
  override def close(): Unit = ()
}
