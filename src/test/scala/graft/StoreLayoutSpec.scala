package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

import graft.model.ObjectsModel
import graft.ops.{QuerySurface, StoreLayout}

/** Bucketed store layout: the J1/J2 join on `_id`-bucketed parents and
  * `owner`-bucketed children must plan WITHOUT a shuffle on either side —
  * this is the property that makes the serving joins viable at 100 TB. */
class StoreLayoutSpec extends SparkSpec {

  test("bucketed parent/children join plans with zero shuffle exchanges") {
    val objs = ObjectsModel.objects(spark, sf0001)
    val parents = objs.filter(!QuerySurface.dynamicFieldChildFilter)
      .select("_id", "version", "type_full")
    val children = objs.filter(QuerySurface.dynamicFieldChildFilter)
      .select(col("owner"), col("_id").as("child_id"), col("version").as("child_version"))

    StoreLayout.saveObjectsBucketed(parents, "t_parents", buckets = 8)
    StoreLayout.saveChildrenBucketed(children, "t_children", buckets = 8)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast join so bucketing is what avoids the shuffle
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = StoreLayout.bucketedChildrenJoin(spark, "t_parents", "t_children")
      val expected = parents.join(children, parents("_id") === children("owner")).count()
      assert(joined.count() === expected)

      val shuffles = joined.queryExecution.executedPlan.collect {
        case s: ShuffleExchangeLike => s
      }
      assert(shuffles.isEmpty,
        s"expected shuffle-free bucketed join, found ${shuffles.size} exchanges:\n" +
          joined.queryExecution.executedPlan.toString)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }
}
