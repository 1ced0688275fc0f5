package graft

import org.apache.spark.sql.SparkSession

/** Plan diagnostic: run one named `SparkEntry` query against a fixture
  * dir and print timing plus a summary of the FINAL adaptive plan
  * (join strategies, exchanges, partition counts) — the local stand-in
  * for "read the Spark UI" when chasing a bench outlier.
  *
  * Usage: `runMain graft.PlanProbe <sfDir> <queryName> [cpus]`
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, name, rest @ _*) = args
    val cpus = rest.headOption.getOrElse(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    // job/stage/task counts expose fixed-overhead-dominated scenarios
    // (many tiny jobs) vs data-dominated ones — per run, via listener
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); tasks.addAndGet(s.stageInfo.numTasks); ()
      }
    })
    // warm run absorbs JIT/codegen, timed run measures steady state
    for (i <- 1 to 2) {
      jobs.set(0); stages.set(0); tasks.set(0)
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      df.write.mode("overwrite").format("noop").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the async listener bus drain
      println(f"[probe] run $i: $sec%.2f s  jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get}")
    }
    val df = fn(spark, sfDir)
    df.collect() // finalize AQE before reading the executed plan
    val full = df.queryExecution.executedPlan.toString
    val cut = full.indexOf("== Initial Plan ==")
    val plan = if (cut >= 0) full.substring(0, cut) else full
    def histo(re: String): Map[String, Int] =
      re.r.findAllIn(plan).toList.groupBy(identity).map { case (k, v) => k -> v.size }
    println(s"[probe] joins: ${histo("BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct")}")
    println(s"[probe] exchanges: ${histo("Exchange \\w+partitioning\\(?[^,)]*")}")
    println(s"[probe] aqe reads: ${histo("AQEShuffleRead \\w+")}")
    println(s"[probe] wholestage spans: ${plan.sliding("WholeStageCodegen".length).count(_ == "WholeStageCodegen")}")
    if (sys.env.contains("SPARK_GRAFT_PROBE_PLAN")) println(plan)
    spark.stop()
  }
}
