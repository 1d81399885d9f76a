package graft

import java.nio.file.Files

import graft.model.ObjectsModel
import graft.sources.JsonIngest

/** JSONL ingest: declared schema, corrupt lines routed (not fatal), and the
  * good rows feed the same change derivation as the parquet path. */
class JsonIngestSpec extends SparkSpec {
  import spark.implicits._

  test("corrupt lines route to the DLQ side; good rows drive the model") {
    val dir = Files.createTempDirectory("graft_jsonl")
    val lines = Seq(
      """{"event_id": 1, "ts": 1700000000000000000, "user_id": 3, "event_type": "signup", "value": 1.5, "props": "{\"k\": 1}"}""",
      """{"event_id": 2, "ts": 1700000001000000000, "user_id": 4, "event_type": "click", "value": 2.5, "props": "{\"k\": 2}"}""",
      """this is not json at all""",
      """{"event_id": 3, "ts": 1700000002000000000, "user_id": 5, "event_type": "purchase", "value": 3.5, "props": "{\"k\": 3}"}""",
      """{"event_id": "BROKEN TYPE, "ts": }"""
    )
    Files.write(dir.resolve("events.jsonl"), lines.mkString("\n").getBytes)

    val routed = JsonIngest.route(JsonIngest.readEvents(spark, dir.toString))
    try {
      assert(routed.ok.count() === 3L)
      assert(routed.bad.as[String].collect().toSet ===
        Set("this is not json at all", """{"event_id": "BROKEN TYPE, "ts": }"""))

      // same downstream derivation as the parquet path (deriveChanges only
      // needs the event columns; ts is a nanos long in both sources)
      val changes = ObjectsModel.deriveChanges(routed.ok)
      assert(changes.count() === 3L)
      assert(changes.select("change_kind").as[String].collect().toSet ===
        Set("created", "mutated", "deleted"))
    } finally routed.release()
  }
}
