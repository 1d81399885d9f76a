package graft

import graft.model.{ObjectsModel, Tables}
import graft.ops.AggOps

/** Distinct-count sketches (A5d family): the HLL++ variant is test-gated
  * here (its sketch is engine-specific, so no DuckDB oracle), and the
  * oracle-gated KMV variant is sanity-checked against the exact count. */
class SketchSpec extends SparkSpec {

  private lazy val objects = ObjectsModel.objects(spark, sf0001)
  private lazy val exact: Long =
    objects.select("type_full").distinct().count()

  test("HLL++ approx distinct is within the configured 1% rsd envelope") {
    val approx = AggOps.approxDistinctTypes(objects).head().getLong(0)
    // 0.01 rsd → 5% is a generous 5-sigma bound at this cardinality
    assert(math.abs(approx - exact) <= math.max(1L, (exact * 0.05).toLong),
      s"approx=$approx exact=$exact")
  }

  test("KMV estimate is deterministic and close to exact") {
    val a = AggOps.kmvDistinctTypes(objects).head().getLong(0)
    val b = AggOps.kmvDistinctTypes(objects).head().getLong(0)
    assert(a === b, "KMV is pure hash arithmetic — must be deterministic")
    // k=64 → relative sd ≈ 1/sqrt(k-2) ≈ 13%; allow 3 sigma
    assert(math.abs(a - exact) <= math.max(2L, (exact * 0.4).toLong),
      s"kmv=$a exact=$exact")
  }

  test("KMV falls back to the exact count below k distinct values") {
    // deterministic subset: a bare limit(10) can pick different rows across
    // the two actions below if partition evaluation order changes
    val tiny = objects.orderBy("_id").limit(10)
    val est = AggOps.kmvDistinctTypes(tiny).head().getLong(0)
    val exactTiny = tiny.select("type_full").distinct().count()
    assert(est === exactTiny)
  }
}
