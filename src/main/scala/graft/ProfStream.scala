package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling entry for the lake-maintenance streaming family
  * (`s_view_maintain`, `s_join_view_stream`, `s_stream_enrich`,
  * `s_segment_maintain`) — phase walls behind `-Dgraft.stream.profile`;
  * not part of the driver contract.
  */
object ProfStream {

  /** Phase timing behind `-Dgraft.stream.profile` (stderr only; zero
    * cost when unset) — this family's cost is fixture + per-trigger
    * fixed overhead, so optimization needs per-phase walls.
    */
  def prof[T](name: => String)(f: => T): T =
    if (!sys.props.contains("graft.stream.profile")) f
    else {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(
        f"[stream-prof] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

  def main(args: Array[String]): Unit = {
    sys.props("graft.stream.profile") = "1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-prof-stream")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // warm the JIT/codegen paths once
    SparkEntry.queries("t_fingerprint")(spark, dir).write.mode("overwrite").format("noop").save()
    val names = if (args.nonEmpty) args.toSeq
      else Seq("s_view_maintain", "s_join_view_stream",
               "s_stream_enrich", "s_segment_maintain")
    names.foreach { name =>
      // twice: the second run is steady state
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir).write.mode("overwrite").format("noop").save()
        System.err.println(f"[stream-prof] TOTAL#$i $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
