package graft

import graft.model.ObjectsModel
import graft.ops.QuerySurface
import graft.ops.QuerySurface.ObjectsArgs

/** JSON request → DataFrame compilation (the GraphQL-surface analog). */
class QueryApiSpec extends SparkSpec {
  import graft.api.QueryApi

  private lazy val objs = ObjectsModel.objects(spark, sf0001)

  test("object point lookup") {
    val rows = QueryApi.compile(objs, """{"object": {"id": "0x000007"}}""").collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[String]("_id") === "0x000007")
  }

  test("objects by owner equals the typed surface") {
    val viaJson = QueryApi.compile(objs,
      """{"objects": {"owner": "0xa00000", "limit": 100}}""")
      .select("_id").collect().map(_.getString(0)).toSeq
    val viaTyped = QuerySurface.objectsQuery(objs,
      ObjectsArgs(owner = Some("0xa00000"), limit = 100))
      .select("_id").collect().map(_.getString(0)).toSeq
    assert(viaJson === viaTyped && viaJson.nonEmpty)
  }

  test("first-match-wins priority: ids wins over type") {
    val rows = QueryApi.compile(objs,
      """{"objects": {"ids": ["0x000007"], "type": "0x1::click"}}""").collect()
    assert(rows.map(_.getAs[String]("_id")).toSeq === Seq("0x000007"))
  }

  test("dynamic-field parents via JSON") {
    val rows = QueryApi.compile(objs,
      """{"objects": {"dynamicField": {"values": ["7"], "valueKey": "v"}, "limit": 100}}""")
      .collect()
    assert(rows.nonEmpty)
  }

  test("dynamicFields resolver pages children of one parent") {
    val rows = QueryApi.compile(objs,
      """{"dynamicFields": {"parentId": "0x000010", "limit": 5}}""").collect()
    assert(rows.forall(_.getAs[String]("owner") == "0x000010"))
  }

  test("reference example queries run through the API surface") {
    // example-queries/graphql/{get-object-by-id, get-objects-by-owner,
    // get-objects-by-type} — same request shapes, fixture-scaled values;
    // the selected fields (type.full, fields, owner, id) must be present.
    val byId = QueryApi.compile(objs, """{"object": {"id": "0x000007"}}""")
      .select("type_full", "fields_json", "owner", "owner_kind").collect()
    assert(byId.length === 1 && byId.head.getAs[String]("type_full").nonEmpty)

    val byOwner = QueryApi.compile(objs,
      """{"objects": {"owner": "0xa00000"}}""")
      .select("type_full", "_id").collect()
    assert(byOwner.nonEmpty)

    val byType = QueryApi.compile(objs,
      """{"objects": {"type": "0x1::click::T1"}}""")
      .select("_id", "owner").collect()
    assert(byType.nonEmpty)
  }

  test("keyset 'after' cursor rides through the JSON surface (O2b)") {
    val page1 = QueryApi.compile(objs,
      """{"objects": {"types": ["0x"], "limit": 15}}""")
      .collect().map(_.getAs[String]("_id")).toSeq
    val page2 = QueryApi.compile(objs,
      s"""{"objects": {"types": ["0x"], "after": "${page1.last}", "limit": 15}}""")
      .collect().map(_.getAs[String]("_id")).toSeq
    val viaOffset = QueryApi.compile(objs,
      """{"objects": {"types": ["0x"], "limit": 15, "skip": 15}}""")
      .collect().map(_.getAs[String]("_id")).toSeq
    assert(page2 === viaOffset)
    assert(page1.toSet.intersect(page2.toSet).isEmpty)
  }

  test("every malformed request fails as InvalidQuery, never a raw parser error") {
    val bads = Seq(
      "", "nope", "[]", "{}", "{\"a\":1,\"b\":2}", "{broken",
      """{"object": {}}""", """{"objects": {}}""",
      """{"objects": {"unknown_field": 1}}""", """{"dynamicFields": {}}""")
    bads.foreach { req =>
      val e = intercept[Exception] { QueryApi.compile(objs, req).collect() }
      assert(e.isInstanceOf[IllegalArgumentException],
        s"request `$req` threw ${e.getClass.getName}: ${e.getMessage}")
    }
  }

  test("validation: unknown root / unknown field / no args → InvalidQuery") {
    for (bad <- Seq(
        """{"frobnicate": {}}""",
        """{"objects": {"ownerz": "x"}}""",
        """{"objects": {"dynamicField": {"namez": []}}}""",
        """{"objects": {}}""",
        """[1,2]""")) {
      val e = intercept[IllegalArgumentException](
        QueryApi.compile(objs, bad).collect())
      assert(e.getMessage.contains("InvalidQuery"), s"$bad → ${e.getMessage}")
    }
  }
}
