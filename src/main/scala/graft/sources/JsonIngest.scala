package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL event ingest with a DECLARED schema and corrupt-record routing —
  * the file-source analog of the reference's RPC-response parse path
  * (parse_get_object_response, main/src/client.rs:118-143: a response that
  * fails to parse becomes a warned + metered error item, never a crash;
  * unparsable object changes are simply not yielded, main/src/client.rs:
  * 178-190).
  *
  * Scale rules baked in:
  *  - the schema is declared, never inferred — inference is an extra full
  *    pass over the data and samples nondeterministically at 100 TB;
  *  - PERMISSIVE mode captures malformed lines in a corrupt-record column
  *    instead of failing the job (one poisoned line in a 100 TB load must
  *    not kill the pipeline);
  *  - [[route]] splits good rows from corrupt raw lines so the latter can
  *    join the dead-letter flow (K3) with full line fidelity for replay.
  */
object JsonIngest {

  /** The JSONL ingest wire schema (this source's OWN contract, independent
    * of the parquet testdata's clock encoding): ts is a nanos long, and
    * downstream consumers resolve epoch-millis via the type-adaptive
    * Tables.tsMillis seam, which handles this encoding too. */
  val Corrupt = "_corrupt"
  val EventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType),
    StructField(Corrupt, StringType)))

  def readEvents(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(EventSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", Corrupt)
      .json(path)

  /** Routed read: good events, corrupt raw lines, and a release() that
    * unpins the shared cache once both sides are consumed — a long-lived
    * host calling route() per ingest request must not pin scans until
    * eviction (same discipline as DedupOps.releaseCaches). */
  final case class Routed(ok: DataFrame, bad: DataFrame, release: () => Unit)

  /** The input is persisted first: Spark refuses raw filters on the
    * internal corrupt-record column of an unmaterialized json scan
    * (SPARK-38523-adjacent guard), and the two sides would otherwise each
    * re-read the files anyway. */
  def route(raw: DataFrame): Routed = {
    val cached = raw.persist()
    Routed(
      ok = cached.filter(col(Corrupt).isNull).drop(Corrupt),
      bad = cached.filter(col(Corrupt).isNotNull).select(col(Corrupt).as("raw_line")),
      release = () => { cached.unpersist(); () })
  }
}
