package graft.model

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Derives the Sui-shaped object-change stream and current-state `objects`
  * table from the testdata `events` table.
  *
  * Reference data model being reproduced:
  *  - `ObjectItem` change stream: main/src/etl.rs:53-63
  *  - change-kind parse (Created/Mutated kept, Deleted kept as tombstone,
  *    Wrapped/Transferred dropped): main/src/client.rs:178-190
  *  - latest-version-wins upsert into the objects store (deletes terminal):
  *    main/src/etl.rs:1227-1267
  *  - server-side typed parse (type-tag split on '<'/ '::', owner variant
  *    decode, base64 bcs, storage_rebate string→u64): server/src/main.rs:370-446
  *
  * Scale notes: `changes` is a pure narrow projection over the scan (no
  * shuffle; whole-stage codegen; column pruning reaches parquet).
  * `objects` needs exactly ONE shuffle — hash-partition by `_id` for the
  * latest-wins window — which is also the partitioning you want the stored
  * table bucketed by at 100 TB, making downstream id-joins (J1/J2)
  * shuffle-free.
  */
object ObjectsModel {
  import ModelConf._

  /** The object-change stream (ObjectItem analog), one row per event.
    * All derived columns are deterministic functions of (event_id, user_id,
    * event_type, props, ts) — mirrored exactly in
    * [[graft.oracle.OracleSql.baseCtes]]. */
  def changes(spark: SparkSession, dir: String): DataFrame =
    deriveChanges(Tables.events(spark, dir))

  def deriveChanges(events: DataFrame): DataFrame = {
    val rank = col("user_id") % 4
    val baseType = concat(
      lit("0x"), (col("user_id") % PkgMod).cast("string"),
      lit("::"), col("event_type"),
      lit("::T"), (col("event_id") % StructMod).cast("string"))
    val jsonK = get_json_object(col("props"), "$.k")
    val ownerHex = concat(lit("0xa"), lpad(col("user_id").cast("string"), OwnerPad, "0"))
    events.select(
      floor(col("event_id") / CpSize).cast("long").as("cp"),
      concat(lit("0x"), lpad((col("event_id") % IdSpace).cast("string"), IdPad, "0")).as("_id"),
      col("event_id").as("version"),
      when(col("event_type") === "signup", "created")
        .when(col("event_type") === "purchase", "deleted")
        .when(col("event_type") === "error", "wrapped")
        .otherwise("mutated").as("change_kind"),
      (col("event_type") === "purchase").as("deletion"),
      when(rank === 0, "Address").when(rank === 1, "Object")
        .when(rank === 2, "Shared").otherwise("Immutable").as("owner_kind"),
      when(rank === 0, ownerHex)
        .when(rank === 1, concat(lit("0x"),
          lpad(((col("user_id") * 7 + col("event_id") % 13) % IdSpace).cast("string"), IdPad, "0")))
        .otherwise(lit(null).cast("string")).as("owner"),
      when(rank === 2, col("event_id")).otherwise(lit(null).cast("long"))
        .as("initial_shared_version"),
      when(rank === 1,
        concat(lit("0x2::dynamic_field::Field<0x1::string::String,"), baseType, lit(">")))
        .otherwise(baseType).as("type_full"),
      when(rank === 1, concat(
        lit("{\"name\":{\"type\":\"0x1::string::String\",\"fields\":{\"k\":\""), jsonK,
        lit("\"}},\"value\":{\"fields\":{\"owner\":\""), ownerHex,
        lit("\",\"v\":\""), (col("event_id") % DynValMod).cast("string"),
        lit("\"}}}")))
        .otherwise(col("props")).as("fields_json"),
      base64(encode(col("props"), "UTF-8")).as("bcs_b64"),
      ((col("event_id") * RebateMul) % RebateMod).cast("string").as("storage_rebate_str"),
      concat(lit("tx"), lpad(col("event_id").cast("string"), 8, "0")).as("previous_transaction"),
      concat(lit("dg"), lpad(col("event_id").cast("string"), 8, "0")).as("digest"),
      (col("event_id") % 2 === 0).as("has_public_transfer"),
      Tables.tsMillis(events).as("ts_ms"),
      // pipeline-arrival time (ts_first_seen, main/src/etl.rs:59-60):
      // chain time plus a deterministic per-item ingest delay
      (Tables.tsMillis(events) + col("event_id") % IngestDelayMod).as("ts_first_seen"),
      when(floor(col("event_id") / CpSize).cast("long") % PollMod === 0, "poll")
        .otherwise("livescan").as("ingested_via"),
      col("user_id"), col("event_type"), col("value"))
  }

  /** P10 — change-kind filter+map: Wrapped/Transferred changes never enter
    * the pipeline (main/src/client.rs:185-189). */
  def kept(changes: DataFrame): DataFrame =
    changes.filter(col("change_kind") =!= "wrapped")

  /** K3 input — items whose enrichment fetch poisons (dead-letter queue,
    * main/src/etl.rs:480-488). */
  def failures(kept: DataFrame): DataFrame =
    kept.filter(col("version") % FailureMod === FailureRem)

  /** Successfully processed items (kept minus DLQ). */
  def processed(kept: DataFrame): DataFrame =
    kept.filter(col("version") % FailureMod =!= FailureRem)

  /** K1 — latest-version-wins merge, deletes terminal. Batch equivalent of
    * the aggregation-pipeline conditional upsert at main/src/etl.rs:1249-1266
    * (`$lt: [$version_, new]` guard): commutative + idempotent under
    * arrival-order permutation, which the ScalaCheck spec asserts.
    * One shuffle on `_id`; AQE handles skewed hot objects. */
  def latestWins(changeRows: DataFrame): DataFrame = {
    val w = Window.partitionBy("_id").orderBy(col("version").desc)
    changeRows
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** The current-state `objects` table with the server's typed parse (P13)
    * applied at ingest: type tag decomposed on '<' then '::'
    * (server/src/main.rs:379-394), version_hex (server/src/main.rs:250-252),
    * storage_rebate parsed from string (server/src/main.rs:441). */
  def objects(spark: SparkSession, dir: String): DataFrame =
    parse(latestWins(kept(changes(spark, dir))))

  /** P13 — typed parse/projection, ingest-time (all codegen'd built-ins,
    * no UDFs). */
  def parse(objs: DataFrame): DataFrame =
    objs
      .withColumn("deleted", col("deletion"))
      .withColumn("type_head",
        expr("CASE WHEN instr(type_full,'<') > 0 THEN substr(type_full, 1, instr(type_full,'<')-1) ELSE type_full END"))
      .withColumn("type_generics_raw",
        expr("CASE WHEN instr(type_full,'<') > 0 THEN substr(type_full, instr(type_full,'<')+1, length(type_full)-instr(type_full,'<')-1) ELSE NULL END"))
      .withColumn("type_package", expr("split_part(type_head,'::',1)"))
      .withColumn("type_module", expr("split_part(type_head,'::',2)"))
      .withColumn("type_struct", expr("split_part(type_head,'::',3)"))
      .withColumn("type_generics", split(col("type_generics_raw"), ","))
      .withColumn("version_hex", concat(lit("0x"), lower(hex(col("version")))))
      .withColumn("storage_rebate", col("storage_rebate_str").cast("long"))
      .withColumn("bcs", unbase64(col("bcs_b64")))

  /** A1/K2 — completed checkpoints: a cp commits only when every kept item
    * of that cp processed successfully (completion countdown,
    * main/src/etl.rs:518-570; commit main/src/mongo.rs:23-58).
    * Map-side partial aggregation → tiny result. */
  def completedCheckpoints(kept: DataFrame): DataFrame =
    kept.groupBy(col("cp").as("_id"))
      .agg(
        count(lit(1)).as("expected"),
        sum(when(col("version") % FailureMod =!= FailureRem, 1L).otherwise(0L)).as("done"))
      .filter(col("expected") === col("done"))
      .select(col("_id"))
}
