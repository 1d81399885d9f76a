package graft.api

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.DataFrame

import graft.ops.QuerySurface
import graft.ops.QuerySurface.{DynamicFieldQuery, ObjectsArgs}

/** The serving API: compiles a JSON request (the engine's analog of the
  * reference's GraphQL query surface, server/src/main.rs:250-342) into a
  * DataFrame over the objects table.
  *
  * Supported request shapes (exactly the reference's three query roots):
  *
  * {{{
  * {"object":  {"id": "0x…"}}                                   // :271-275
  * {"objects": {"ids": […] | "owner": "…" | "owners": […] |
  *              "type": "…" | "types": […] |
  *              "dynamicField": {"names": […], "nameKey": "…",
  *                               "values": […], "valueKey": "…"},
  *              "limit": n, "skip": n}}                         // :277-342
  * {"dynamicFields": {"parentId": "0x…", "limit": n, "skip": n}} // :205-247
  * }}}
  *
  * Validation mirrors async-graphql's: unknown roots/fields are rejected
  * up front (the guard analog of depth/complexity limits,
  * server/src/main.rs:594-602). Argument priority inside `objects` is
  * first-match-wins, as in the reference planner.
  */
object QueryApi {

  private val mapper = new ObjectMapper()

  private val objectsFields = Set(
    "ids", "owner", "owners", "type", "types", "dynamicField", "limit", "skip",
    "after")
  private val dynFieldFields = Set("names", "nameKey", "values", "valueKey")

  def invalid(msg: String): Nothing =
    throw new IllegalArgumentException(s"InvalidQuery: $msg")

  private def strings(n: JsonNode): Seq[String] =
    if (n == null) Nil
    else if (n.isArray) n.elements().asScala.map(_.asText()).toSeq
    else Seq(n.asText())

  private def strOpt(n: JsonNode): Option[String] =
    Option(n).map(_.asText()).filter(_.nonEmpty)

  private def checkFields(node: JsonNode, allowed: Set[String], where: String): Unit = {
    val unknown = node.fieldNames().asScala.filterNot(allowed).toSeq
    if (unknown.nonEmpty) invalid(s"unknown field(s) ${unknown.mkString(", ")} in $where")
  }

  /** Parse the request JSON into the typed argument surface. */
  def parseObjectsArgs(node: JsonNode): ObjectsArgs = {
    checkFields(node, objectsFields, "objects")
    val dyn = Option(node.get("dynamicField")).map { d =>
      checkFields(d, dynFieldFields, "dynamicField")
      DynamicFieldQuery(
        names = strings(d.get("names")),
        nameKey = strOpt(d.get("nameKey")),
        values = strings(d.get("values")),
        valueKey = strOpt(d.get("valueKey")))
    }
    ObjectsArgs(
      ids = strings(node.get("ids")),
      owner = strOpt(node.get("owner")),
      owners = strings(node.get("owners")),
      tpe = strOpt(node.get("type")),
      types = strings(node.get("types")),
      dynamicField = dyn,
      limit = Option(node.get("limit")).map(_.asInt()).getOrElse(50),
      skip = Option(node.get("skip")).map(_.asInt()).getOrElse(0),
      afterId = strOpt(node.get("after")))
  }

  /** Compile a JSON request against an objects DataFrame. Every rejection
    * — unparsable JSON included — surfaces as the InvalidQuery error shape
    * (the GraphQL layer's behavior), never a raw parser exception. */
  def compile(objects: DataFrame, requestJson: String): DataFrame = {
    val root =
      try mapper.readTree(requestJson)
      catch {
        case e: com.fasterxml.jackson.core.JacksonException =>
          invalid(s"malformed JSON request: ${e.getOriginalMessage}")
      }
    if (root == null || !root.isObject || root.size() != 1)
      invalid("request must be a single-root JSON object")
    val kind = root.fieldNames().next()
    kind match {
      case "object" =>
        checkFields(root.get("object"), Set("id"), "object")
        val id = strOpt(root.get("object").get("id"))
          .getOrElse(invalid("object.id required"))
        QuerySurface.objectsQuery(objects, ObjectsArgs(ids = Seq(id), limit = 1))
      case "objects" =>
        QuerySurface.objectsQuery(objects, parseObjectsArgs(root.get("objects")))
      case "dynamicFields" =>
        val n = root.get("dynamicFields")
        checkFields(n, Set("parentId", "limit", "skip"), "dynamicFields")
        val parent = strOpt(n.get("parentId")).getOrElse(invalid("dynamicFields.parentId required"))
        val limit = Option(n.get("limit")).map(_.asInt()).getOrElse(50)
        val skip = Option(n.get("skip")).map(_.asInt()).getOrElse(0)
        // per-parent children page (the resolver at server/src/main.rs:205-247)
        val children = objects
          .filter(QuerySurface.dynamicFieldChildFilter)
          .filter(objects("owner") === parent)
        QuerySurface.paginate(children, limit, skip)
      case other => invalid(s"unknown query root '$other'")
    }
  }
}
