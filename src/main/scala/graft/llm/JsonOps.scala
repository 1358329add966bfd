package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, MapType, StringType}

/** Semi-structured ("multimodal metadata") column operators: JSON
  * string columns carrying per-record properties, as in `events.props`.
  *
  * Both forms are pure projections (map-side, codegen'd, no shuffle):
  *   - [[extractPath]] — `get_json_object`, best for plucking one or
  *     two fields without parsing the whole object;
  *   - [[parseMap]]/[[parseTyped]] — `from_json` into MapType or a
  *     caller-supplied StructType when most fields are needed (parse
  *     once, read many).
  * At scale prefer extracting in the same projection as the scan so
  * the JSON string itself is never shuffled.
  */
object JsonOps {

  /** Single-path JSON extraction, e.g. path "$.k". Returns string. */
  def extractPath(json: Column, path: String): Column =
    get_json_object(json, path)

  /** Parse a JSON object column into map<string,string>. */
  def parseMap(json: Column): Column =
    from_json(json, MapType(StringType, StringType))

  /** Parse into a caller-supplied type (StructType for fixed shapes). */
  def parseTyped(json: Column, t: DataType): Column = from_json(json, t)

  /** Explode a JSON object's entries into (key, value) rows —
    * the schema-discovery shape for heterogeneous props. */
  def explodeEntries(df: DataFrame, jsonCol: String, idCols: Seq[String]): DataFrame =
    df.select(idCols.map(col) :+ explode(parseMap(col(jsonCol))).as(Seq("key", "value")): _*)
}
