package graft.ops

import graft.{QDef, Tables}
import org.apache.spark.sql.functions._

/** Round-10 batch 7: aggregate-surface depth — bitwise aggregation as a
  * set encoding (q180), DataSketches HLL build/merge (q181, the
  * mergeable-summary path §6 of SCALE.md assumes for 100 TB rollups), and
  * the width_bucket equi-width histogram function (q182; the equi-DEPTH
  * complement is q138).
  */
object Round10g {
  import Tables._

  val defs: Vector[(String, QDef)] = Vector(

    // --------------------------------------------------------------- q180
    // Hours-active bitmask per user via bit_or aggregation: hour-of-day
    // packs into one long (bit h set ⇔ user active in hour h), then the
    // corpus rolls up into the active-hour-count histogram — the compact
    // set encoding a behavioral profile table ships instead of 24 columns
    // (bitwise OR is associative/commutative ⇒ map-side combinable; the
    // mask is also the JOINable form of "hour overlap" via bitwise AND).
    // All-integer arithmetic.
    "q180_hour_bitmask" -> QDef(
      (s, d) =>
        events(s, d)
          .select(col("user_id"),
            expr("shiftleft(1L, CAST(hour(ts) AS INT))").as("hbit"))
          .groupBy("user_id")
          .agg(bit_or(col("hbit")).as("mask"))
          .select(bit_count(col("mask")).cast("int").as("n_active_hours"))
          .groupBy("n_active_hours")
          .agg(count(lit(1)).as("n_users"))
          .orderBy("n_active_hours"),
      """WITH m AS (SELECT user_id,
        |             bit_or(CAST(1 AS BIGINT) << CAST(EXTRACT(hour FROM ts) AS INT))
        |               AS mask
        |           FROM events GROUP BY 1)
        |SELECT CAST(bit_count(mask) AS INT) AS n_active_hours,
        |       COUNT(*) AS n_users
        |FROM m GROUP BY 1 ORDER BY n_active_hours""".stripMargin
    ),

    // --------------------------------------------------------------- q181
    // DataSketches HLL build + MERGE: per-type user sketches unioned into
    // a corpus-wide distinct estimate — the mergeable-summary design a
    // 100 TB rollup table relies on (per-partition sketches persist;
    // readers union instead of rescanning). Sketch binaries are not
    // cross-engine portable ⇒ rows-only oracle (the q54 contract), with
    // InvariantSpec bounding every estimate against the exact distinct
    // count (±5%) and the union against the per-type maximum.
    "q181_hll_union" -> QDef(
      (s, d) => {
        val perType = events(s, d)
          .groupBy("event_type")
          .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
        val union = perType
          .agg(hll_union_agg(col("sk")).as("sk"))
          .select(lit("ALL").as("event_type"),
            hll_sketch_estimate(col("sk")).cast("long").as("est_users"))
        perType
          .select(col("event_type"),
            hll_sketch_estimate(col("sk")).cast("long").as("est_users"))
          .unionByName(union)
          .orderBy("event_type")
      },
      null // sketch binaries are engine-specific; bounds live in InvariantSpec
    ),

    // --------------------------------------------------------------- q182
    // Equi-WIDTH histogram of order prices via width_bucket (the
    // equi-DEPTH complement is q138): 20 fixed buckets over [0, 600k),
    // under/overflow landing in buckets 0/21 per the SQL spec. Bucket
    // boundaries are exact doubles (600000/20 = 30000 — integer-valued),
    // so bucket assignment is identical in both engines. One map-side-
    // combinable aggregate.
    "q182_width_bucket" -> QDef(
      (s, d) =>
        orders(s, d)
          .select(width_bucket(col("o_totalprice"), lit(0.0), lit(600000.0), lit(20))
            .cast("int").as("bucket"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_orders"))
          .orderBy("bucket"),
      // spelled arithmetically (floor(v/width)+1 with the SQL-spec under/
      // overflow buckets): width 30000 is integer-valued so the one
      // rounded division matches Spark's width_bucket on 2-decimal money
      // everywhere (boundary values are exactly representable)
      """SELECT CAST(CASE WHEN o_totalprice < 0.0 THEN 0
        |              WHEN o_totalprice >= 600000.0 THEN 21
        |              ELSE FLOOR(o_totalprice / 30000.0) + 1 END AS INT) AS bucket,
        |       COUNT(*) AS n_orders
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin
    )
  )
}
