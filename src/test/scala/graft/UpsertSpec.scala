package graft

import scala.util.Random

import org.apache.spark.sql.DataFrame

import graft.model.ObjectsModel
import graft.ops.PipelineOps

/** K1 latest-version-wins MERGE invariants (main/src/etl.rs:1227-1267):
  * commutative under arrival-order permutation, idempotent under replay,
  * deletes terminal. */
class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private def changes(rows: Seq[(String, Long, Boolean)]): DataFrame =
    rows.toDF("_id", "version", "deletion")

  private def state(df: DataFrame): Set[(String, Long, Boolean)] =
    ObjectsModel.latestWins(df).as[(String, Long, Boolean)].collect().toSet

  test("latest version wins per id, deletes terminal when newest") {
    val s = state(changes(Seq(
      ("a", 1L, false), ("a", 3L, true), ("a", 2L, false),
      ("b", 5L, false), ("b", 4L, true))))
    assert(s === Set(("a", 3L, true), ("b", 5L, false)))
  }

  test("commutative under permutation of arrival order (seeded property)") {
    val rnd = new Random(7)
    for (_ <- 1 to 10) {
      val rows = Seq.fill(30)((
        s"id${rnd.nextInt(5)}", rnd.nextLong(100).max(0L), rnd.nextBoolean()))
      // versions must be unique per id for a well-defined winner
      val uniq = rows.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      val expected = state(changes(uniq))
      assert(state(changes(rnd.shuffle(uniq))) === expected)
    }
  }

  test("idempotent under replay (batch applied twice)") {
    val rows = Seq(("a", 1L, false), ("a", 2L, false), ("b", 9L, true))
    assert(state(changes(rows ++ rows)) === state(changes(rows)))
  }

  test("delete-then-late-update: terminal delete survives a late lower-version update") {
    // FIXTURES A.1 golden case: delete at v5 already applied; update v3
    // arrives late (out-of-order) — the version guard must discard it
    // (main/src/etl.rs:1227-1267: delete upserts terminal state, updates
    // apply only when version is greater).
    val s = state(changes(Seq(("a", 5L, true), ("a", 3L, false))))
    assert(s === Set(("a", 5L, true)))
  }

  test("engine config maps reference knobs and rejects unknown nets (S8)") {
    val conf = graft.model.EngineConf()
    assert(conf.trigger.toString.contains("100"))
    assert(conf.sourceFor("test").nonEmpty)
    intercept[IllegalArgumentException](conf.sourceFor("mainnet"))
  }

  test("first-seen dedup keeps the lowest version (J4, version-aware)") {
    val df = Seq(("a", 3L), ("a", 1L), ("b", 2L)).toDF("_id", "version")
    val got = PipelineOps.firstSeenWins(df).as[(String, Long)].collect().toSet
    assert(got === Set(("a", 1L), ("b", 2L)))
  }
}
