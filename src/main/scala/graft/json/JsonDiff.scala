package graft.json

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** One field-level change between two JSON objects
  * (ref: TradeChangeDetectionJob.java:115-155 — ADDED / MODIFIED /
  * REMOVED with old/new values). */
case class DiffEntry(field: String, action: String,
                     old_value: String, new_value: String)

/** Structural diff of two flat JSON objects — the reference's
  * `findDifferences` re-expressed as a pure function usable from a UDF,
  * a stateful streaming fold, or tests.
  *
  * Values are compared as their JSON text (the reference compares
  * `JsonNode.asText`, TradeChangeDetectionJob.java:133); nested values
  * compare by their serialized form. Output is sorted by field name so
  * results are deterministic regardless of map iteration order.
  */
object JsonDiff {
  private val mapper = new ObjectMapper()

  /** Flatten a JSON object's top-level fields to field -> text. Non-object
    * or unparseable input yields an empty map. */
  def flat(json: String): Map[String, String] = {
    if (json == null) return Map.empty
    try {
      val node = mapper.readTree(json)
      if (node == null || !node.isObject) Map.empty
      else node.fields().asScala.map(e => e.getKey -> valueText(e.getValue)).toMap
    } catch { case _: Exception => Map.empty }
  }

  private def valueText(n: JsonNode): String =
    if (n.isTextual) n.asText else n.toString

  def diff(prev: Map[String, String], curr: Map[String, String]): Seq[DiffEntry] = {
    val added = (curr.keySet -- prev.keySet).toSeq
      .map(k => DiffEntry(k, "ADDED", null, curr(k)))
    val modified = (curr.keySet & prev.keySet).toSeq
      .filter(k => prev(k) != curr(k))
      .map(k => DiffEntry(k, "MODIFIED", prev(k), curr(k)))
    val removed = (prev.keySet -- curr.keySet).toSeq
      .map(k => DiffEntry(k, "REMOVED", prev(k), null))
    (added ++ modified ++ removed).sortBy(_.field)
  }

  def diffJson(prev: String, curr: String): Seq[DiffEntry] =
    diff(flat(prev), flat(curr))
}
