package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** jsonb mutation shims over flat JSON objects — the reference's
  * jsonb_set / jsonb_delete / jsonb_concat / jsonb_object_keys
  * (reference: src/expr/impl/src/scalar/jsonb_*.rs). Spark's JSON surface
  * is read-only (`get_json_object`/`from_json`); mutation is expressed as
  * parse → map transform → re-serialize. Flat string→string objects only
  * (the engine's jsonb carrier for event properties); nested structures
  * pass through `from_json` with full schemas instead.
  */
object JsonFunctions {

  private val mapType = MapType(StringType, StringType)

  private def asMap(json: Column): Column = from_json(json, mapType)

  /** jsonb_set(json, key, value) for flat objects. */
  def jsonbSet(json: Column, key: Column, value: Column): Column =
    to_json(map_concat(
      map_filter(asMap(json), (k, _) => k =!= key),
      map(key, value.cast(StringType))))

  /** jsonb_delete(json, key). */
  def jsonbDelete(json: Column, key: Column): Column =
    to_json(map_filter(asMap(json), (k, _) => k =!= key))

  /** jsonb_concat(a, b): right side wins on key conflicts. */
  def jsonbConcat(a: Column, b: Column): Column = {
    val bm = asMap(b)
    to_json(map_concat(
      map_filter(asMap(a), (k, _) => !array_contains(map_keys(bm), k)),
      bm))
  }

  /** jsonb_object_keys, sorted for determinism. */
  def jsonbObjectKeys(json: Column): Column =
    array_sort(map_keys(asMap(json)))

  /** jsonb_each(json) — table function: one (key, value) row per field
    * of a flat object. A generator column: use in a select alongside the
    * carrying row's columns (`df.select(col("id"), jsonbEach(col("j")))`).
    * reference: src/expr/impl/src/table_function/jsonb.rs (jsonb_each)
    */
  def jsonbEach(json: Column): Column = explode(asMap(json))

  /** jsonb_array_elements_text(json) — one row per element of a JSON
    * array, as text. reference: src/expr/impl/src/table_function/jsonb.rs
    */
  def jsonbArrayElements(json: Column): Column =
    explode(from_json(json, ArrayType(StringType)))

  /** jsonb_array_elements WITH ORDINALITY (position, element). */
  def jsonbArrayElementsOrdinal(json: Column): Column =
    posexplode(from_json(json, ArrayType(StringType)))

  /** jsonb_path_query(json, path) — every value matched by a (wildcard)
    * JSONPath, as a string array; `explode` it for the set-returning
    * form. reference: src/expr/impl/src/scalar/jsonb_path.rs
    */
  def jsonbPathQueryArray(json: Column, path: String): Column =
    from_json(get_json_object(json, path), ArrayType(StringType))

  /** jsonb_path_query_first(json, path). */
  def jsonbPathQueryFirst(json: Column, path: String): Column =
    element_at(jsonbPathQueryArray(json, path), 1)

  /** Typed access: jsonb field as bigint/double/text. */
  def jsonbGetText(json: Column, path: String): Column =
    get_json_object(json, s"$$.$path")
  def jsonbGetLong(json: Column, path: String): Column =
    jsonbGetText(json, path).cast(LongType)
  def jsonbGetDouble(json: Column, path: String): Column =
    jsonbGetText(json, path).cast(DoubleType)
}
