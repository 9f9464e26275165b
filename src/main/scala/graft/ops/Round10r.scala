package graft.ops

import graft.{QDef, Tables}
import org.apache.spark.sql.functions._

/** Round-10 batch 18: pre-release governance — a differentially-private
  * count release calibrated by a privacy-utility audit (q213, the
  * mechanism-side complement of q132's k-anonymity and q200's
  * redaction), and a join-skew diagnostic (q214, the PLANNER-side
  * complement of the q67/q186 salting implementations: measure where
  * hash partitioning will concentrate join work BEFORE running it).
  *
  * Determinism: q213's "randomness" is the q204 discipline — the
  * portable md5→int64 hash pushed through a FIXED integer CDF ladder
  * (two-sided geometric, α = e⁻¹ ⇒ ε = 1 for count queries at
  * sensitivity 1; |k| ≤ 8 clamp absorbs the 1.8e-4 tail). No floating
  * noise anywhere; both engines release identical values.
  */
object Round10r {
  import Tables._

  val defs: Vector[(String, QDef)] = Vector(

    // --------------------------------------------------------------- q213
    // DP count release + utility audit: per (lang, source) stratum the
    // true document count, the deterministic two-sided-geometric noise
    // draw, the released noisy count, and the absolute error — the
    // calibration view a data owner inspects BEFORE publishing (the
    // released table would carry only n_dp; the audit quantifies the
    // utility cost of ε = 1 on this cut). Scale shape: one
    // map-side-combinable rollup; the noise draw and ladder are
    // per-GROUP map-side expressions — group cardinality, not volume.
    "q213_dp_release" -> QDef(
      (s, d) => {
        val u = conv(substring(md5(concat(col("lang"), lit("|"),
          col("source"), lit("#dp"))), 1, 15), 16, 10).cast("long") % 1000000
        val k = when(col("u") < 155, -8L).when(col("u") < 576, -7L)
          .when(col("u") < 1721, -6L).when(col("u") < 4835, -5L)
          .when(col("u") < 13299, -4L).when(col("u") < 36307, -3L)
          .when(col("u") < 98847, -2L).when(col("u") < 268851, -1L)
          .when(col("u") < 730968, 0L).when(col("u") < 900971, 1L)
          .when(col("u") < 963512, 2L).when(col("u") < 986519, 3L)
          .when(col("u") < 994983, 4L).when(col("u") < 998097, 5L)
          .when(col("u") < 999243, 6L).when(col("u") < 999664, 7L)
          .otherwise(8L)
        documents(s, d).groupBy("lang", "source")
          .agg(count(lit(1)).as("n_true"))
          .withColumn("u", u)
          .withColumn("noise_k", k)
          .select(col("lang"), col("source"), col("n_true"), col("noise_k"),
            (col("n_true") + col("noise_k")).as("n_dp"),
            abs(col("noise_k")).as("abs_err"))
          .orderBy("lang", "source")
      },
      """WITH g AS (
        |  SELECT lang, source, COUNT(*) AS n_true
        |  FROM documents GROUP BY 1, 2),
        |n AS (
        |  SELECT lang, source, n_true,
        |         CAST(('0x' || substring(md5(lang || '|' || source || '#dp'),
        |           1, 15)) AS BIGINT) % 1000000 AS u
        |  FROM g),
        |k AS (
        |  SELECT lang, source, n_true,
        |         CASE WHEN u < 155 THEN -8 WHEN u < 576 THEN -7
        |              WHEN u < 1721 THEN -6 WHEN u < 4835 THEN -5
        |              WHEN u < 13299 THEN -4 WHEN u < 36307 THEN -3
        |              WHEN u < 98847 THEN -2 WHEN u < 268851 THEN -1
        |              WHEN u < 730968 THEN 0 WHEN u < 900971 THEN 1
        |              WHEN u < 963512 THEN 2 WHEN u < 986519 THEN 3
        |              WHEN u < 994983 THEN 4 WHEN u < 998097 THEN 5
        |              WHEN u < 999243 THEN 6 WHEN u < 999664 THEN 7
        |              ELSE 8 END AS noise_k
        |  FROM n)
        |SELECT lang, source, n_true, CAST(noise_k AS BIGINT) AS noise_k,
        |       CAST(n_true + noise_k AS BIGINT) AS n_dp,
        |       CAST(abs(noise_k) AS BIGINT) AS abs_err
        |FROM k ORDER BY lang, source""".stripMargin
    ),

    // --------------------------------------------------------------- q214
    // Join-skew diagnostic: for the many-to-many events⋈orders key
    // (user_id = o_custkey), the per-hash-bucket key count, input rows
    // on each side, and EXACT join output rows (Σ_key n_ev·n_ord) under
    // 32-way hash partitioning — the "which partition will melt"
    // analysis run before choosing a salting factor (q67/q186) or an
    // AQE skew threshold. Scale shape: two map-side-combinable per-key
    // rollups (key cardinality ≪ volume), a key equi-join of the two
    // count tables, and a ≤32-row bucket rollup — the audit never
    // materializes the join it predicts.
    "q214_skew_audit" -> QDef(
      (s, d) => {
        val ev = events(s, d).groupBy(col("user_id").as("k"))
          .agg(count(lit(1)).as("n_ev"))
        val ord = orders(s, d).groupBy(col("o_custkey").as("k"))
          .agg(count(lit(1)).as("n_ord"))
        ev.join(ord, "k")
          .withColumn("bucket",
            conv(substring(md5(concat(col("k").cast("string"), lit("#b"))),
              1, 15), 16, 10).cast("long") % 32)
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_keys"), sum("n_ev").as("n_ev"),
            sum("n_ord").as("n_ord"),
            sum(col("n_ev") * col("n_ord")).as("out_rows"))
          .orderBy("bucket")
      },
      """WITH ev AS (
        |  SELECT user_id AS k, COUNT(*) AS n_ev FROM events GROUP BY 1),
        |ord AS (
        |  SELECT o_custkey AS k, COUNT(*) AS n_ord FROM orders GROUP BY 1),
        |j AS (
        |  SELECT ev.k, n_ev, n_ord,
        |         CAST(('0x' || substring(md5(CAST(ev.k AS VARCHAR) || '#b'),
        |           1, 15)) AS BIGINT) % 32 AS bucket
        |  FROM ev JOIN ord ON ev.k = ord.k)
        |SELECT bucket, COUNT(*) AS n_keys, CAST(SUM(n_ev) AS BIGINT) AS n_ev,
        |       CAST(SUM(n_ord) AS BIGINT) AS n_ord,
        |       CAST(SUM(n_ev * n_ord) AS BIGINT) AS out_rows
        |FROM j GROUP BY 1 ORDER BY bucket""".stripMargin
    )
  )
}
