package graft.lake

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

/** Tiny JSON helpers over the jackson-databind that ships with Spark.
  * Used only for driver-side manifest/snapshot metadata (small files), never
  * on the data path.
  */
object Json {
  val mapper = new ObjectMapper()

  def obj(): ObjectNode = mapper.createObjectNode()
  def arr(): ArrayNode = mapper.createArrayNode()
  def parse(s: String): JsonNode = mapper.readTree(s)
  def write(n: JsonNode): String = mapper.writerWithDefaultPrettyPrinter().writeValueAsString(n)
}
