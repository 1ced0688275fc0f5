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
    // per-job wall time + call site: fixed-overhead scenarios need to
    // know WHICH of their many tiny jobs eat the time
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val jobTimes = new java.util.concurrent.ConcurrentLinkedQueue[(Double, String)]()
    val execDesc = new java.util.concurrent.ConcurrentHashMap[Long, String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        val site = Option(j.properties).flatMap { p =>
          Option(p.getProperty("spark.job.description"))
            .orElse(Option(p.getProperty("callSite.short")))
            .orElse(Option(p.getProperty("spark.sql.execution.id")).map("sql exec " + _))
        }.getOrElse("?").linesIterator.next().take(120)
        jobStart.put(j.jobId, (System.nanoTime(), site)); ()
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        Option(jobStart.remove(j.jobId)).foreach { case (t0, site) =>
          jobTimes.add(((System.nanoTime() - t0) / 1e9, site))
        }; ()
      }
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); tasks.addAndGet(s.stageInfo.numTasks); ()
      }
      override def onOtherEvent(e: org.apache.spark.scheduler.SparkListenerEvent): Unit = e match {
        case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
          execDesc.put(s.executionId, s.description.linesIterator.next().take(100)); ()
        case _ => ()
      }
    })
    // warm run absorbs JIT/codegen, timed run measures steady state
    for (i <- 1 to 2) {
      jobs.set(0); stages.set(0); tasks.set(0); jobTimes.clear()
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      df.write.mode("overwrite").format("noop").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the async listener bus drain
      println(f"[probe] run $i: $sec%.2f s  jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get}")
      if (i == 2) {
        import scala.jdk.CollectionConverters._
        val byTime = jobTimes.asScala.toSeq.sortBy(-_._1)
        val jobSum = byTime.map(_._1).sum
        println(f"[probe] job wall-time sum: $jobSum%.2f s (gaps = ${sec - jobSum}%.2f s driver-side)")
        byTime.take(12).foreach { case (t, site) =>
          println(f"[probe]   $t%6.3f s  $site")
        }
        val bySite = byTime.groupBy(_._2).view
          .mapValues(v => (v.size, v.map(_._1).sum)).toSeq.sortBy(-_._2._2)
        println(s"[probe] by call site:")
        bySite.take(10).foreach { case (site, (n, t)) =>
          val desc = site.stripPrefix("sql exec ").toLongOption
            .flatMap(id => Option(execDesc.get(id))).map(d => s"  [$d]").getOrElse("")
          println(f"[probe]   $t%6.2f s  n=$n%-3d $site$desc")
        }
      }
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
