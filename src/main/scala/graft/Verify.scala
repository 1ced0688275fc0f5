package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** Replace TimestampType (tz-adjusted, parquet isAdjustedToUTC=true, read
    * by DuckDB as TIMESTAMP WITH TIME ZONE) with TimestampNTZType throughout
    * a type. The DuckDB oracle answers naive TIMESTAMP, so a dumped TIMESTAMPTZ
    * column fails the driver's schema compare even when every value matches
    * (the r7 failure mode: 13 rows✓ schema✗). Session tz is UTC, so the cast
    * is a pure flavor change — wall-clock values are bit-identical. */
  private def ntz(dt: DataType): DataType = dt match {
    case TimestampType       => TimestampNTZType
    case s: StructType       => StructType(s.fields.map(f => f.copy(dataType = ntz(f.dataType))))
    case a: ArrayType        => a.copy(elementType = ntz(a.elementType))
    case m: MapType          => m.copy(keyType = ntz(m.keyType), valueType = ntz(m.valueType))
    case other               => other
  }
  /** Cast every timestamp-bearing result column to its NTZ flavor before the
    * dump — applies to the Verify artifact only, never the engine itself. */
  def toNtz(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) { (acc, f) =>
      val target = ntz(f.dataType)
      if (target == f.dataType) acc
      else acc.withColumn(f.name, col(f.name).cast(target))
    }
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, rest @ _*) = args
    // optional trailing query names: verify just those (local iteration)
    val only: Set[String] = rest.toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // INT64-micros timestamps: parquet footers then carry real
      // min/max stats (INT96 gets none), powering write-time stats
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions) // SQL DML over lake tables
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // thrown queries must surface as `err` rows in CORRECTNESS, never as
    // silently-missing keys (the round-5 lesson: 20 queries vanished)
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries.filter(q => only.isEmpty || only(q._1)).foreach { case (name, fn) =>
      try toNtz(fn(spark, sfDir)).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        val msg = s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}".take(500)
        System.err.println(s"[verify] $name failed: $msg")
        errors(name) = msg
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // full query list so the parity gate can flag rows-only queries
    // that failed to write anything (they have no oracle entry)
    Files.writeString(Paths.get(s"$outDir/query_names.json"),
      SparkEntry.queries.keys.toSeq.filter(k => only.isEmpty || only(k))
        .sorted.map(q).mkString("[", ",", "]"))
    // query → exception, so a broken query grades as `err`, not absence
    Files.writeString(Paths.get(s"$outDir/_errors.json"),
      errors.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    spark.stop()
  }
}
