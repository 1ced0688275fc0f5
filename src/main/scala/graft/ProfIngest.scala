package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling entry for the at-ingest dedup family (run with
  * -Dgraft.ingest.profile); not part of the driver contract.
  */
object ProfIngest {
  def main(args: Array[String]): Unit = {
    sys.props("graft.ingest.profile") = "1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-prof")
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
    def time(name: String): Unit = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.mode("overwrite").format("noop").save()
      System.err.println(f"[ingest-prof] TOTAL $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("s_incremental_dedup")
    time("s_incremental_dedup")
    time("s_incremental_semdedup")
    time("s_incremental_semdedup")
    spark.stop()
  }
}
