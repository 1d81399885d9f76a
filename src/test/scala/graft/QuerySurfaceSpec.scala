package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.ObjectsModel
import graft.ops.QuerySurface
import graft.ops.QuerySurface.{DynamicFieldQuery, ObjectsArgs}

/** The objects(args) dispatch semantics (server/src/main.rs:277-342):
  * first-match-wins argument priority, InvalidQuery on no args, guard
  * limits, deterministic pagination. */
class QuerySurfaceSpec extends SparkSpec {

  private lazy val objs: DataFrame = ObjectsModel.objects(spark, sf0001)

  test("no filter arg → InvalidQuery") {
    val e = intercept[IllegalArgumentException] {
      QuerySurface.objectsQuery(objs, ObjectsArgs())
    }
    assert(e.getMessage.contains("InvalidQuery"))
  }

  test("guard rejects oversized limit (O5 analog)") {
    intercept[IllegalArgumentException] {
      QuerySurface.objectsQuery(objs, ObjectsArgs(ids = Seq("x"), limit = 100000))
    }
  }

  test("keyset page equals the offset page it replaces (O2b)") {
    def ids(df: DataFrame): Seq[String] =
      df.collect().map(_.getAs[String]("_id")).toSeq
    val page1 = ids(QuerySurface.paginate(objs, 20, 0))
    assert(page1.size === 20)
    // page 2 via cursor == page 2 via offset, and dispatch honors afterId
    val byCursor = ids(QuerySurface.paginateAfter(objs, page1.last, 20))
    val byOffset = ids(QuerySurface.paginate(objs, 20, 20))
    assert(byCursor === byOffset)
    val viaArgs = ids(QuerySurface.objectsQuery(objs,
      ObjectsArgs(types = Seq("0x"), afterId = Some(page1.last), limit = 20)))
    assert(viaArgs === byOffset)
    // ambiguous paging args are rejected, not silently resolved
    val e = intercept[IllegalArgumentException] {
      QuerySurface.objectsQuery(objs,
        ObjectsArgs(types = Seq("0x"), afterId = Some(page1.last), skip = 30))
    }
    assert(e.getMessage.contains("mutually exclusive"))
  }

  test("first-match-wins: ids beats owner when both set") {
    val both = QuerySurface.objectsQuery(objs,
      ObjectsArgs(ids = Seq("0x000007"), owner = Some("0xa00000")))
    val idsOnly = QuerySurface.objectsQuery(objs, ObjectsArgs(ids = Seq("0x000007")))
    assert(both.collect().map(_.getAs[String]("_id")).toSeq ===
      idsOnly.collect().map(_.getAs[String]("_id")).toSeq)
  }

  test("owner filter matches only Address/Object ownership kinds") {
    val rows = QuerySurface.objectsQuery(objs,
      ObjectsArgs(owner = Some("0xa00000"), limit = 1000)).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => Seq("Address", "Object").contains(r.getAs[String]("owner_kind"))))
    assert(rows.forall(_.getAs[String]("owner") == "0xa00000"))
  }

  test("type prefix filter is a prefix match, not exact") {
    val rows = QuerySurface.objectsQuery(objs,
      ObjectsArgs(tpe = Some("0x1::click"), limit = 1000)).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[String]("type_full").startsWith("0x1::click")))
  }

  test("pagination is deterministic and non-overlapping") {
    val page1 = QuerySurface.paginate(objs, 10, 0).select("_id").collect().map(_.getString(0))
    val page2 = QuerySurface.paginate(objs, 10, 10).select("_id").collect().map(_.getString(0))
    assert(page1.length === 10 && page2.length === 10)
    assert(page1.toSet.intersect(page2.toSet).isEmpty)
    assert((page1 ++ page2).sorted === (page1 ++ page2).toSeq)
  }

  test("dynamic-field parents: every parent has a matching child (J1)") {
    val q = DynamicFieldQuery(values = Seq("7"), valueKey = Some("v"))
    val parents = QuerySurface.parentsOfMatchingChildren(objs, q)
      .select("_id").collect().map(_.getString(0)).toSet
    val childOwners = objs.filter(QuerySurface.dynamicFieldMatch(q))
      .select("owner").collect().map(_.getString(0)).toSet
    assert(parents.nonEmpty)
    assert(parents.subsetOf(childOwners))
  }

  test("children resolver caps children per parent (J2)") {
    val parents = objs.limit(50)
    val out = QuerySurface.childrenResolver(objs, parents, 2)
    val counts = out.groupBy("parent_id").count().collect().map(_.getLong(1))
    assert(counts.forall(_ <= 2))
  }
}
