package graft
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Benchmark main. Prints ONE compact machine-readable JSON summary line to
  * stdout (fixed-size — see [[Bench.stdoutLine]]) and writes the FULL record,
  * including the per-query timing map, to `bench.json` in the working
  * directory, so the caller can recover per-query numbers even though the
  * stdout tail window is small (round-1 failure mode: sbt's `[info]` prefix
  * broke the parse — build.sbt now also sets `run / outputStrategy :=
  * StdoutOutput`; rounds 3 and 5: the per-query map outgrew the ~2.9 KB
  * stdout tail window, hence the split).
  *
  * Methodology (noise-proofing, see VERDICT.md round 1):
  *   - queries run in SORTED name order (a Map's hash order misattributed
  *     JVM/codegen warmup to whichever query happened to come first);
  *   - one untimed session warmup action before any timing;
  *   - each query runs `SPARK_GRAFT_BENCH_REPS` times (default 2) and the
  *     reported time is the MINIMUM — rep 1 absorbs per-query codegen and
  *     page-cache warmup, and external machine contention (the dominant
  *     round-1 noise source, 2–10× spikes) can only inflate, never
  *     deflate, so min-of-reps is the honest steady-state number;
  *   - failures are NOT swallowed: a failing query contributes no time,
  *     is reported under "errors", and the process exits nonzero.
  */
object Bench {
  private def jstr(s: String) = "\"" + s + "\""
  private def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))

  /** The ONE stdout line the driver tail-captures. FIXED-SIZE by
    * construction: no per-query map (that lives only in bench.json), at
    * most 8 error NAMES (messages stay in bench.json). Round-3 AND round-5
    * both lost the driver's bench record because the per-query map grew
    * the line past the ~2.9 KB tail window — the count of queries can
    * never do that again (BenchLineSpec pins the bound). */
  def stdoutLine(total: Double, errorNames: Seq[String], reps: Int,
                 sf: String, nQueries: Int): String = {
    val errJson = errorNames.take(8).map(jstr).mkString("[", ",", "]")
    s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":$nQueries,"n_errors":${errorNames.size},"errors":$errJson,"reps":$reps,"sf":"$sf"}"""
  }

  /** Full record written to bench.json: everything stdoutLine has PLUS the
    * per-query timing map and full error messages. */
  def fullJson(total: Double, results: Seq[(String, Double)],
               errors: collection.Map[String, String], reps: Int, sf: String): String = {
    val qs = results.map { case (k, v) => jstr(k) + ":" + fmt(v) }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => jstr(k) + ":" + jstr(v) }.mkString("{", ",", "}")
    s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"errors":$errJson,"reps":$reps,"sf":"$sf"}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Untimed warmup: spin up executor threads, parquet footer reads, and
    // the groupBy/shuffle machinery once before the first timed query.
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect()

    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results = SparkEntry.queries.toVector.sortBy(_._1).flatMap {
      case (name, fn) =>
        val times = (1 to reps).flatMap { _ =>
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
          catch {
            case e: Throwable =>
              errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
                .replaceAll("[\"\\\\\n\r\t]", " ").take(200)
              None
          }
        }
        times.minOption.map(name -> _)
    }
    val total = results.map(_._2).sum
    val full = fullJson(total, results, errors, reps, sfDir)
    val line = stdoutLine(total, errors.keys.toSeq, reps, sfDir, results.size)
    Files.write(Paths.get("bench.json"), (full + "\n").getBytes(StandardCharsets.UTF_8))
    println(line)
    spark.stop()
    if (errors.nonEmpty) {
      System.err.println(s"bench: ${errors.size} quer${if (errors.size == 1) "y" else "ies"} FAILED: ${errors.keys.mkString(", ")}")
      sys.exit(1)
    }
  }
}
