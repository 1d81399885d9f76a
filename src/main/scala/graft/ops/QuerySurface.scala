package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The serving read-query surface: the Spark re-expression of the reference
  * GraphQL `objects(args)` planner (server/src/main.rs:277-342).
  *
  * The reference compiles exactly one of the argument kinds into a Mongo
  * filter, **first match wins** in the order ids → owner → owners → type →
  * types → dynamic_field, and errors with InvalidQuery when none is set
  * (server/src/main.rs:341-342). [[objectsQuery]] reproduces that dispatch
  * over the `objects` DataFrame; Catalyst pushes the resulting predicates
  * into the parquet scan (sargable: `isin` / `startswith` / equality on the
  * decomposed type columns — never `rlike`).
  *
  * Pagination (limit+skip on every objects query, server/src/main.rs:40-41,
  * 279-280) is `ORDER BY _id OFFSET skip LIMIT n` — the reference relies on
  * Mongo natural order; we make the order explicit and deterministic, which
  * is also the only sane semantics on a distributed engine.
  */
object QuerySurface {

  /** Argument object mirroring the GraphQL `QueryObjectsArgs`
    * (server/src/main.rs:30-42). */
  final case class ObjectsArgs(
      ids: Seq[String] = Nil,
      owner: Option[String] = None,
      owners: Seq[String] = Nil,
      tpe: Option[String] = None,
      types: Seq[String] = Nil,
      dynamicField: Option[DynamicFieldQuery] = None,
      limit: Int = 50,
      skip: Int = 0,
      afterId: Option[String] = None) // keyset cursor: page starts after this _id

  /** server/src/main.rs:44-56 (QueryDynamicFieldsArgs): match child
    * dynamic-field objects on name/value (optionally under a sub-key), then
    * return the PARENT objects (J1). */
  final case class DynamicFieldQuery(
      names: Seq[String] = Nil,
      nameKey: Option[String] = None,
      values: Seq[String] = Nil,
      valueKey: Option[String] = None)

  /** GraphQL guard analog (depth ≤ 10 / complexity ≤ 1000,
    * server/src/main.rs:598-601): bound limit/skip so a single API call
    * cannot scan unboundedly. O5. */
  val MaxLimit = 1000
  val MaxSkip = 1000000

  def invalid(msg: String): Nothing = throw new IllegalArgumentException(msg)

  /** P3/P4 — the owner disjunction across the two nested ownership paths
    * (server/src/main.rs:283-286): on the flattened model this is
    * kind∈{Address,Object} ∧ owner∈xs. */
  def ownerFilter(owners: Seq[String]): Column =
    (col("owner_kind") === "Address" && col("owner").isin(owners: _*)) ||
      (col("owner_kind") === "Object" && col("owner").isin(owners: _*))

  /** P5/P6 — sargable type-prefix match (the reference builds an anchored
    * `^prefix` regex so Mongo can use the type index,
    * server/src/main.rs:287-294; `startswith` is the Spark-sargable form). */
  def typePrefixFilter(prefixes: Seq[String]): Column =
    prefixes.map(p => col("type_full").startsWith(p)).reduce(_ || _)

  /** P8 — dynamic-field children: ObjectOwner ownership ∧ type LIKE
    * '0x2::dynamic_field::Field<%' (server/src/main.rs:212-218). */
  def dynamicFieldChildFilter: Column =
    col("owner_kind") === "Object" &&
      col("type_full").startsWith("0x2::dynamic_field::Field<")

  /** P7 — predicates on dynamic nested JSON paths, built at plan time
    * (server/src/main.rs:295-323). */
  def dynamicFieldMatch(q: DynamicFieldQuery): Column = {
    val namePath = "$.name.fields." + q.nameKey.getOrElse("k")
    val valuePath = "$.value.fields." + q.valueKey.getOrElse("v")
    val nameCond =
      if (q.names.isEmpty) lit(true)
      else get_json_object(col("fields_json"), namePath).isin(q.names: _*)
    val valueCond =
      if (q.values.isEmpty) lit(true)
      else get_json_object(col("fields_json"), valuePath).isin(q.values: _*)
    dynamicFieldChildFilter && nameCond && valueCond
  }

  /** J1 — child-match → parent objects: the `$lookup` + `$unwind` +
    * `$replaceWith $object` pipeline (server/src/main.rs:325-340) as one
    * equi self-join. The matched child set is small → broadcast it, so the
    * big objects side is never shuffled. */
  def parentsOfMatchingChildren(objects: DataFrame, q: DynamicFieldQuery): DataFrame = {
    val children = objects.filter(dynamicFieldMatch(q)).select(col("owner").as("__parent_id")).distinct()
    objects.join(broadcast(children), col("_id") === col("__parent_id"), "inner")
      .drop("__parent_id")
  }

  /** The first-match-wins dispatch (server/src/main.rs:281-342). */
  def objectsQuery(objects: DataFrame, args: ObjectsArgs): DataFrame = {
    if (args.limit > MaxLimit || args.skip > MaxSkip)
      invalid(s"query too expensive: limit=${args.limit} skip=${args.skip}")
    if (args.afterId.nonEmpty && args.skip > 0)
      invalid("InvalidQuery: 'after' cursor and 'skip' are mutually exclusive")
    val filtered =
      if (args.ids.nonEmpty) objects.filter(col("_id").isin(args.ids: _*))
      else if (args.owner.nonEmpty) objects.filter(ownerFilter(args.owner.toSeq))
      else if (args.owners.nonEmpty) objects.filter(ownerFilter(args.owners))
      else if (args.tpe.nonEmpty) objects.filter(typePrefixFilter(args.tpe.toSeq))
      else if (args.types.nonEmpty) objects.filter(typePrefixFilter(args.types))
      else if (args.dynamicField.nonEmpty) parentsOfMatchingChildren(objects, args.dynamicField.get)
      else invalid("InvalidQuery: no filter arg set")
    args.afterId
      .map(a => paginateAfter(filtered, a, args.limit))
      .getOrElse(paginate(filtered, args.limit, args.skip))
  }

  /** O2 — deterministic limit+skip pagination. */
  def paginate(df: DataFrame, limit: Int, skip: Int): DataFrame = {
    val ordered = df.orderBy(col("_id"))
    (if (skip > 0) ordered.offset(skip) else ordered).limit(limit)
  }

  /** O2b — KEYSET pagination, the scale-safe page form: OFFSET pagination
    * re-sorts and discards `skip` rows on every page — O(skip) per page, a
    * deep-page killer at 100× data (the reference serves the offset form,
    * server/src/main.rs:279-280). The `_id > cursor` predicate pushes down
    * to the scan (file-level min/max pruning on an _id-sorted layout), so
    * every page costs O(limit) regardless of depth. */
  def paginateAfter(df: DataFrame, lastId: String, limit: Int): DataFrame =
    df.filter(col("_id") > lastId).orderBy(col("_id")).limit(limit)

  /** J2 — parent→children resolver (server/src/main.rs:205-247), N+1 loops
    * collapsed into ONE batched equi-join with a per-parent limit window.
    * Children (filtered) are the smaller side → broadcast-friendly; the
    * window partitions by parent id so state is bounded per key. */
  def childrenResolver(objects: DataFrame, parents: DataFrame, perParentLimit: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val children = objects.filter(dynamicFieldChildFilter)
      .select(col("owner").as("parent_id"), col("_id").as("child_id"),
        col("version").as("child_version"), col("type_full").as("child_type"))
    val joined = parents.select(col("_id").as("parent_id"))
      .join(children, Seq("parent_id"), "inner")
    val w = Window.partitionBy("parent_id")
      .orderBy(col("child_version").desc, col("child_id"))
    joined.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= perParentLimit)
  }

  /** The projection of the canonical object view used by serving queries —
    * stable scalar columns only (P12: explicit select = Catalyst column
    * pruning down to the scan). */
  def serveProjection(df: DataFrame): DataFrame =
    df.select("_id", "version", "version_hex", "deleted", "digest",
      "type_full", "type_package", "type_module", "type_struct",
      "owner_kind", "owner", "initial_shared_version",
      "previous_transaction", "storage_rebate", "has_public_transfer",
      "fields_json", "cp", "ts_ms", "ingested_via")
}
