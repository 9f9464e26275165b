package graft

import org.apache.spark.sql.SparkSession

/** Dev-only phase profiler for a single query: times plan CONSTRUCTION
  * (which executes any eager localCheckpoint jobs) separately from the
  * final count, per rep, and counts the Spark JOBS each phase submits
  * (at bench scale the fixed per-job overhead — broadcast builds,
  * checkpoint materializations — dominates several ladder queries, so
  * job count is the lever to watch).
  * Usage: runMain graft.DevProbe <sfDir> <reps> <q>
  */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val stages = new java.util.concurrent.atomic.AtomicInteger(0)
    val trace = sys.env.contains("GRAFT_JOB_TRACE")
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); stages.addAndGet(js.stageInfos.size)
        if (trace) {
          val desc = Option(js.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
          val callsite = js.stageInfos.lastOption.map(_.name).getOrElse("")
          jobStart.put(js.jobId, (System.nanoTime(), s"$desc | $callsite"))
        }
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        if (trace) Option(jobStart.remove(je.jobId)).foreach { case (t0, d) =>
          println(f"[job] ${je.jobId}%4d ${(System.nanoTime() - t0) / 1e9}%6.3f s  ${d.take(140)}")
        }
    })
    def snap(): (Int, Int) = { Thread.sleep(50); (jobs.get, stages.get) }
    for (name <- names; r <- 1 to reps) {
      val (j0, s0) = snap()
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val t1 = System.nanoTime()
      val (j1, s1) = snap()
      df.count()
      val t2 = System.nanoTime()
      val (j2, s2) = snap()
      println(f"[devprobe] $name rep $r construct ${(t1 - t0) / 1e9}%.2f s (${j1 - j0} jobs/${s1 - s0} stages) count ${(t2 - t1) / 1e9}%.2f s (${j2 - j1} jobs/${s2 - s1} stages)")
    }

    // cAssign strategy A/B at scale (dev-only; r16): wide 64-min-column
    // argmin vs narrow-key + vec_id rejoin, nlist = 8, synthetic 250k
    // 64-dim grid vectors. Justifies the nlist gate in Round11.cAssign.
    if (sys.env.contains("GRAFT_PROBE_CASSIGN")) {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.DataFrame
      val n = sys.env.getOrElse("GRAFT_PROBE_CASSIGN_N", "250000").toLong
      val nlist = 8
      val vecs = spark.range(n).select(col("id").as("vec_id"),
          expr("transform(sequence(1, 64), i -> pmod(xxhash64(id * 64 + i), 2000000) - 1000000)").as("v"))
        .repartition(32).localCheckpoint()
      val c0 = vecs.where(col("vec_id") < nlist)
        .select(col("vec_id").as("j"), col("v").as("c")).localCheckpoint()
      def cDist(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
        import graft.plans.DotProduct.{dot, norm2}
        val (ad, bd) = (a.cast("array<double>"), b.cast("array<double>"))
        (norm2(ad) + norm2(bd) - lit(2.0) * dot(ad, bd)).cast("long")
      }
      val keyed = vecs.crossJoin(broadcast(c0.limit(nlist)))
        .withColumn("key", cDist(col("v"), col("c")) * lit(nlist.toLong) + col("j"))
      def wide: DataFrame = keyed.groupBy("vec_id")
        .agg(min("key").as("key"),
          (1 to 64).map(i => min(expr(s"element_at(v, $i)")).as(s"v$i")): _*)
        .select(col("vec_id"), array((1 to 64).map(i => col(s"v$i")): _*).as("v"),
          (col("key") % nlist).as("list_id"))
      def rejoin: DataFrame = keyed.groupBy("vec_id").agg(min("key").as("key"))
        .select(col("vec_id"), (col("key") % nlist).as("list_id"))
        .join(vecs, Seq("vec_id")).select(col("vec_id"), col("v"), col("list_id"))
      for (r <- 1 to reps; (nm, df) <- Seq("wide" -> wide, "rejoin" -> rejoin)) {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[devprobe] cassign.$nm rep $r n=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }

    // q254 internals, phase by phase (dev-only diagnostics)
    if (sys.env.contains("GRAFT_PROBE_Q254")) {
      import org.apache.spark.sql.functions._
      for (r <- 1 to reps) {
        def t[A](label: String)(f: => A): A = {
          val s0 = System.nanoTime()
          val a = f
          println(f"[devprobe]   q254.$label%-12s ${(System.nanoTime() - s0) / 1e9}%.2f s")
          a
        }
        println(s"[devprobe] q254 phases rep $r")
        val emb = Tables.embeddings(spark, sfDir)
        val qvT = t("qvT.ckpt") { ops.Round11.quantized(emb).localCheckpoint() }
        val ladder = t("ladder") { ops.Round10n.pqCodebooksK(emb, ops.Round15.kcLevels) }
        val codesCk = t("codes.ckpt") { ladder._1.localCheckpoint() }
        t("count") { codesCk.count() }
      }
    }
    spark.stop()
  }
}
