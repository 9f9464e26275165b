package graft.ops

import graft.{QDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, MapType, StringType}

/** Nested/typed-column operators: the `props` JSON payload materialized as
  * real Catalyst nested types — `from_json` → StructType navigated with
  * dot syntax, `from_json` → MapType navigated with `map_keys` and an
  * explode — instead of the stringly `get_json_object` probes of q28.
  * This is the §1.2 type-system row: real pipelines carry typed
  * struct/map columns (request headers, feature maps, labeled spans) and
  * the engine has to parse once, keep the nested column intact through
  * the shuffle, and explode it only where the query demands rows.
  *
  * At scale: `from_json` is a per-row projection (no shuffle); the map
  * explode multiplies rows by the key count BEFORE the aggregation
  * shuffle, so the per-key aggregate shuffles |rows|·|keys| slim rows —
  * the same shape a feature-store pivot runs at 100 TB. Determinism:
  * all values are int64 (exact sums); key order never matters because
  * every map key becomes its own group.
  */
object Nested {
  import Tables._

  val defs: Vector[(String, QDef)] = Vector(

    // ---------------------------------------------------------------- q91
    // Parse props once into BOTH nested forms: a struct (dot-navigated in
    // a predicate — the typed fast path when the schema is known) and a
    // map (exploded to (key, value) rows — the generic path when it
    // isn't). Aggregate per (event_type, key): count, exact int64 sum,
    // min/max, and the per-event key-count maximum (map_keys cardinality).
    "q91_map_explode" -> QDef(
      (s, d) =>
        events(s, d)
          .withColumn("st", from_json(col("props"), lit("k BIGINT")))
          .withColumn("pm", from_json(col("props"), MapType(StringType, LongType)))
          // struct navigation as the row filter: typed dot access, no
          // string re-parse (from_json of both forms shares one parse per
          // form; get_json_object would re-scan the string per probe)
          .where(col("st.k").isNotNull)
          .withColumn("n_keys", size(map_keys(col("pm"))).cast("long"))
          .select(col("event_type"), col("n_keys"),
            explode(col("pm")).as(Seq("pk", "pv")))
          .groupBy("event_type", "pk")
          .agg(
            count(lit(1)).as("n"),
            sum("pv").as("sum_v"),
            min("pv").as("min_v"),
            max("pv").as("max_v"),
            max("n_keys").as("max_keys"))
          .orderBy("event_type", "pk"),
      """WITH kv AS (
        |  SELECT event_type,
        |         len(json_keys(props)) AS n_keys,
        |         unnest(json_keys(props)) AS pk,
        |         props
        |  FROM events
        |  WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL),
        |typed AS (
        |  SELECT event_type, n_keys, pk,
        |         CAST(json_extract_string(props, '$.' || pk) AS BIGINT) AS pv
        |  FROM kv)
        |SELECT event_type, pk, COUNT(*) AS n,
        |  CAST(SUM(pv) AS BIGINT) AS sum_v,
        |  MIN(pv) AS min_v, MAX(pv) AS max_v,
        |  CAST(MAX(n_keys) AS BIGINT) AS max_keys
        |FROM typed GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    )
  )
}
