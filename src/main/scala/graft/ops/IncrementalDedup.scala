package graft.ops

import java.nio.file.{Files, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Incremental (at-ingest) MinHash near-dedup — the streaming form of
  * [[Dedup.minHashLshPairs]]: every arriving micro-batch is
  * deduplicated against the signature index of ALL previously ingested
  * documents, then its own signatures join the index. This is the
  * production shape for a continuously-crawled corpus: new documents
  * dedup against a 100 TB history WITHOUT rescanning it — per batch,
  * cost is the batch's hashing plus a bucket-join against the index,
  * whose fan-out tracks true near-dup density.
  *
  * Drop semantics are ORDER-INDEPENDENT: a document is dropped iff it
  * has an exact-verified Jaccard ≥ threshold match with any smaller-id
  * document in the corpus. Every qualifying pair (a < b) is detected
  * when its later-ARRIVING member is processed (the earlier member's
  * bands are then in the index, or both share the batch); whichever
  * member has the LARGER id is tombstoned — including retroactively,
  * the way production pipelines issue late tombstones — so arrival
  * order cannot change the final kept set.
  *
  * Index state is parquet under `workDir` (at scale: a lake table
  * partitioned by band): `bands/` holds (id, band, bh) LSH bucket
  * rows, `shingles/` holds (id, sz, shingles) for the exact-verify
  * pass, `drops/` accumulates tombstones.
  */
object IncrementalDedup {

  /** Ingest `docs` as `slices` simulated arrivals (parquet file
    * stream, one file per trigger), maintaining the signature index
    * and tombstones under `workDir`; returns (doc_id, kept) for the
    * whole corpus — kept = no verified near-dup with a smaller id.
    */
  def dedupAtIngest(spark: SparkSession, docs: DataFrame, workDir: Path,
                    slices: Int = 4, textCol: String = "text",
                    idCol: String = "doc_id", n: Int = 3,
                    numHashes: Int = 128, bands: Int = 32,
                    threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val srcDir = workDir.resolve("arrivals")
    val bandsDir = workDir.resolve("bands").toString
    val shDir = workDir.resolve("shingles").toString
    val dropsDir = workDir.resolve("drops").toString
    Files.createDirectories(srcDir)

    // interleaved slices (id % slices), NOT id ranges: later batches
    // carry ids smaller than already-indexed ones, exercising the
    // retroactive-tombstone path rather than only the happy order
    val input = docs.select(col(idCol), col(textCol))
    for (s <- 0 until slices)
      input.filter(col(idCol) % slices === s)
        .coalesce(1).write.mode("overwrite")
        .parquet(srcDir.resolve(f"slice_$s%03d").toString)

    def readOrEmpty(dir: String, schema: org.apache.spark.sql.types.StructType): DataFrame =
      if (Files.exists(java.nio.file.Paths.get(dir))) spark.read.parquet(dir)
      else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

    val stream = spark.readStream
      .schema(input.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$srcDir/*")
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val (bsh, bbanded) =
          Dedup.bandedSignatures(batch, textCol, idCol, n, numHashes, bands)
        val bshC = bsh.localCheckpoint()        // sigs evaluate once, not per join branch
        val bbandedC = bbanded.localCheckpoint()
        val prevBanded = readOrEmpty(bandsDir, bbandedC.schema)
        val prevSh = readOrEmpty(shDir, bshC.schema)
        // candidates: batch × index bucket collisions (either direction)
        // + in-batch collisions; canonicalized u < v. The BATCH side is
        // broadcast: the history-sized index is then STREAMED against a
        // hash table (one scan, zero index shuffle per batch) — the
        // difference between O(batch) and O(history) network per
        // trigger. (At production scale the index additionally lives
        // bucketed by (band, bh) in a lake table, making the scan
        // bucket-local too.)
        val crossIdx = prevBanded.select(col("band"), col("bh"), col("id").as("pid"))
          .join(broadcast(bbandedC), Seq("band", "bh"))
          .select(least(col("id"), col("pid")).as("u"),
            greatest(col("id"), col("pid")).as("v"))
        val inBatch = bbandedC.select(col("band"), col("bh"), col("id").as("a"))
          .join(bbandedC.select(col("band"), col("bh"), col("id").as("b")), Seq("band", "bh"))
          .where(col("a") < col("b"))
          .select(col("a").as("u"), col("b").as("v"))
        val cand = broadcast(crossIdx.unionByName(inBatch).distinct())
        // exact verify on shingle-hash sets (batch ∪ index): candidate
        // pairs are near-dup-density-sized, so THEY broadcast and the
        // set store is likewise scanned, never shuffled
        val sets = bshC.unionByName(prevSh)
        val uSide = sets
          .select(col("id").as("u"), col("shingles").as("u_sh"), col("sz").as("u_sz"))
          .join(cand, Seq("u")) // candidate-sized result
        val drops = sets
          .select(col("id").as("v"), col("shingles").as("v_sh"), col("sz").as("v_sz"))
          .join(broadcast(uSide), Seq("v"))
          .withColumn("inter", size(array_intersect(col("u_sh"), col("v_sh"))))
          .where(col("inter").cast("double") /
            (col("u_sz") + col("v_sz") - col("inter")) >= threshold)
          .select(col("v").as("id")).distinct() // larger id tombstoned
        // one file per artifact per trigger: a 32-way write of a
        // batch-sized frame is pure small-file debt that every later
        // trigger re-lists and re-opens
        drops.coalesce(1).write.mode("append").parquet(dropsDir)
        bbandedC.coalesce(1).write.mode("append").parquet(bandsDir)
        bshC.coalesce(1).write.mode("append").parquet(shDir)
      }
      .option("checkpointLocation", workDir.resolve("ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val dropped = readOrEmpty(dropsDir,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          docs.schema(idCol).dataType, nullable = false))))
      .select(col("id").as(idCol)).distinct()
    docs.select(col(idCol))
      .join(dropped.withColumn("_drop", lit(true)), Seq(idCol), "left_outer")
      .select(col(idCol), col("_drop").isNull.as("kept"))
      .orderBy(col(idCol))
  }
}
