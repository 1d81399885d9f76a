package graft

import org.apache.spark.sql.functions._

import graft.model.ObjectsModel
import graft.ops.{Aggregators, SkewOps}
import graft.ops.Aggregators.ChangeRow

/** Salting correctness (results must equal the unsalted plan) and the
  * typed latest-wins Aggregator vs the window formulation. */
class SkewAggSpec extends SparkSpec {
  import spark.implicits._

  test("salted count-by-key equals plain groupBy count") {
    val kept = ObjectsModel.kept(ObjectsModel.changes(spark, sf0001))
    val plain = kept.groupBy("owner_kind").count()
      .as[(String, Long)].collect().toMap
    val salted = SkewOps.saltedCountByKey(kept, "owner_kind", "version")
      .as[(String, Long)].collect().toMap
    assert(salted === plain)
  }

  test("salted join equals plain join") {
    val big = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 4L)).toDF("k", "v")
    val small = Seq(("a", "x"), ("b", "y")).toDF("k", "w")
    val plain = big.join(small, "k").select("k", "v", "w")
      .as[(String, Long, String)].collect().toSet
    val salted = SkewOps.saltedJoin(big, small, "k", "v", n = 4)
      .select("k", "v", "w").as[(String, Long, String)].collect().toSet
    assert(salted === plain)
  }

  test("typed LatestWinsAgg matches the window latest-wins (K1 parity)") {
    val kept = ObjectsModel.kept(ObjectsModel.changes(spark, sf0001))
    val typedIn = kept.select(col("_id"), col("version"), col("deletion"))
      .as[ChangeRow]
    val viaAgg = Aggregators.latestWinsTyped(spark, typedIn)
      .collect().map(c => (c._id, c.version, c.deletion)).toSet
    val viaWindow = ObjectsModel.latestWins(kept)
      .select("_id", "version", "deletion")
      .as[(String, Long, Boolean)].collect().toSet
    assert(viaAgg === viaWindow)
  }

  test("aggregator plans a partial (map-side) aggregation before the shuffle") {
    val typedIn = ObjectsModel.kept(ObjectsModel.changes(spark, sf0001))
      .select(col("_id"), col("version"), col("deletion")).as[ChangeRow]
    val plan = Aggregators.latestWinsTyped(spark, typedIn)
      .queryExecution.executedPlan.toString
    // ObjectHashAggregate/SortAggregate appears twice: partial + final
    assert(plan.contains("Aggregate"), plan)
  }
}
