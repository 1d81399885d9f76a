package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

import graft.model.ObjectsModel
import graft.ops.{QuerySurface, StoreLayout}

/** Bucketed store layout: the J1/J2 join on `_id`-bucketed parents and
  * `owner`-bucketed children must plan WITHOUT a shuffle on either side —
  * this is the property that makes the serving joins viable at 100 TB. */
class StoreLayoutSpec extends SparkSpec {

  test("SparkEntry bucketed variants match their logical twins with zero hash shuffles") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.catalyst.plans.physical.RangePartitioning
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // no broadcast: the BUCKETING must be what satisfies the joins
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      for ((b, plain) <- Seq(
          "j1b_bucketed_parent_join" -> "j1_dynfield_parent_join",
          "j2b_bucketed_children" -> "j2_children_resolver",
          "k1b_bucketed_latest_wins" -> "k1_latest_wins")) {
        val bucketed = SparkEntry.queries(b)(spark, sf0001)
        val logical = SparkEntry.queries(plain)(spark, sf0001)
        assert(bucketed.collect().toSeq === logical.collect().toSeq, s"$b vs $plain")
        val plan = bucketed.queryExecution.executedPlan match {
          case a: AdaptiveSparkPlanExec => a.executedPlan
          case p => p
        }
        val hashShuffles = plan.collect {
          case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
              if !s.outputPartitioning.isInstanceOf[RangePartitioning] => s
        }
        assert(hashShuffles.isEmpty,
          s"$b: expected zero hash shuffles on the bucketed plan:\n$plan")
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

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
