package graft.lake

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{count, lit, max, min}

/** Runtime-filtered lake join — the lake-source analogue of Spark's
  * dynamic partition pruning, applied at the MANIFEST level.
  *
  * Spark's own DPP only fires for Hive-style static partition columns
  * of a built-in file source; a graft lake fact prunes through its own
  * metadata instead (hidden-transform directory projection + per-file
  * min/max/bloom stats). This helper runs the dim side first, collects
  * its (bounded) join-key set on the driver, and re-plans the fact
  * scan with a flat `In` predicate the lake scan projects onto every
  * spec generation — so a selective dim filter skips fact FILES before
  * a single fact row is read.
  *
  * At 100 TB the payoff is the classic star-join asymmetry: the fact
  * table is the 100 TB side, the filtered dim key set is thousands of
  * rows, and without the runtime filter the join shuffles (or at best
  * scans) the whole fact. The driver-side collect is capped (`cap`,
  * default 1000 keys) — beyond it the helper degrades loudly to the
  * plain join, which AQE still handles; it never ships an unbounded
  * key list into a predicate or onto the driver.
  *
  * Exactness: [[LakeTable.scan]] applies the `In` both as directory/
  * stats pruning AND as an exact row filter, and an INNER equi-join
  * never matches null keys, so dropping nulls from the key set is
  * semantics-preserving. Results are therefore identical to the plain
  * join — pinned by the `lake_runtime_filter` oracle query.
  */
object RuntimeFilter {

  /** Keys at or below this count push down as a flat `In` (file-level
    * pruning); above it, the bloom tier takes over (row-level). The
    * value is [[DriverTiers]]' shared driver-exact policy.
    */
  val DefaultCap: Int = DriverTiers.Default.driverKeyCap

  /** Key types `DataFrameStatFunctions.bloomFilter` supports — the
    * shared gate for every bloom tier (here, [[JoinView]],
    * [[IncrementalView]]).
    */
  private[graft] val BloomableTypes: Set[org.apache.spark.sql.types.DataType] = {
    import org.apache.spark.sql.types._
    Set(ByteType, ShortType, IntegerType, LongType, StringType)
  }

  /** Row-level bloom filter of `df(keyCol)` by the values of
    * `keys(keyCol)` — the shared kernel of [[JoinView]]'s driver-large
    * bounded read and [[IncrementalView]]'s bloom-bounded view read.
    * SUPERSET-safe by construction: bloom false positives pass through
    * (the callers' joins drop them) and nulls escape via the `isNull`
    * arm (a bloom cannot represent null; the callers' null-safe /
    * right-outer joins need null rows to survive). Un-bloomable key
    * types return `df` unchanged. Runs two actions over `keys` (count
    * + bloom build) — pass a checkpointed or trivially-derived frame.
    * ([[prunedJoin]]'s tier 2 keeps its own fused variant: it rides
    * the key count on the min/max summary job and adds range
    * predicates, which this generic kernel has no use for.)
    */
  private[graft] def bloomRowFilter(df: DataFrame, keyCol: String,
                                    keys: DataFrame,
                                    fpp: Double = 0.01): DataFrame =
    if (!BloomableTypes.contains(df.schema(keyCol).dataType)) df
    else {
      val nn = keys.na.drop(Seq(keyCol))
      val n = nn.count()
      // Spark's stat.bloomFilter NPEs on an EMPTY input frame (its
      // aggregate returns a null buffer) — and a delete-everything
      // window legitimately produces zero non-null keys. The kernel's
      // contract with zero keys: the bloom matches nothing, the
      // null-escape arm remains.
      if (n == 0) df.where(df(keyCol).isNull)
      else {
        val bloom = nn.stat.bloomFilter(keyCol, n, fpp)
        val bos = new java.io.ByteArrayOutputStream()
        bloom.writeTo(bos)
        df.where(graft.functions.BloomFunctions.bloom_might_contain(
          df(keyCol), bos.toByteArray) || df(keyCol).isNull)
      }
    }

  /** Inner equi-join `fact(factKey) = dim(dimKey)` with the dim's
    * distinct key set pushed into the fact scan. `dim` should already
    * carry its selective filter — that selectivity is what makes the
    * key set small and the pruning worthwhile. No broadcast hint is
    * forced: key cardinality does not bound the dim FRAME's size, so
    * the broadcast election stays with Spark's size estimation / AQE
    * (or the caller's own hint).
    *
    * Three tiers by dim key-set size:
    *  1. ≤ `cap` keys — exact flat `In` on the fact scan: directory +
    *     file-stats pruning, the fact may skip almost all its files.
    *  2. > `cap` keys, integral/string key — a bloom filter built from
    *     the dim keys probes every fact row INSIDE the scan stage
    *     (codegen'd [[graft.functions.BloomMightContainExpr]]): no
    *     file skipping, but non-matching fact rows never reach the
    *     join exchange. This is Spark's runtime bloom join filter made
    *     deliberate — Spark's own rule cannot see a lake scan. False
    *     positives (at `bloomFpp`) are eliminated by the join itself,
    *     so results stay exact unconditionally.
    *  3. unsupported key type — plain join, AQE still applies.
    */
  def prunedJoin(fact: LakeTable, factKey: String,
                 dim: DataFrame, dimKey: String,
                 version: Option[Long] = None,
                 cap: Int = DefaultCap,
                 bloomFpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.types._
    // under the cap the dim plan runs twice (key sample + join) — the
    // standard runtime-filter trade for a selective dim; the over-cap
    // branch checkpoints its key frame below before reusing it
    val keysRaw = dim.select(dim(dimKey)).distinct()
    val sample = keysRaw.limit(cap + 1).collect()
    val vals = sample.iterator.map(_.get(0)).filter(_ != null).toSeq
    // the summary tiers cast dim values INTO the fact key's type; on
    // mismatched key types a narrowing cast can wrap (non-ANSI) and a
    // range predicate would then EXCLUDE matchable rows — so they
    // require identical types. The In tier is safe cross-typed (a
    // wrapped literal only RETAINS junk rows the join discards; a
    // representable match always casts exactly).
    val sameType = fact.read(version).schema(factKey).dataType ==
      keysRaw.schema(dimKey).dataType
    val factDf =
      if (vals.isEmpty) fact.read(version).where(lit(false))
      else if (sample.length <= cap)
        fact.scan(Seq(LakePredicate.In(factKey, vals)), version)
      else if (!sameType) fact.read(version) // tier 3: plain join, AQE applies
      else {
        // over the cap the dim is big enough that re-running its plan
        // for each summary job would multiply its scan cost —
        // checkpoint the (keys-only) frame once and derive everything
        // from it
        val keys = keysRaw.localCheckpoint()
        // even a driver-large key set has a driver-tiny SUMMARY: its
        // [min, max] range rides into the scan as file-stat pruning
        // (zone maps skip whole files when the dim's keys are
        // clustered — fact partitioned by time joined to "last week's"
        // dim rows is the canonical case), and a bloom filter of the
        // keys drops the surviving files' non-matching ROWS before
        // the join exchange
        val summary = keys.agg(
          count(keys(dimKey)), min(keys(dimKey)), max(keys(dimKey))).head
        val rangePreds =
          if (summary.isNullAt(1)) Nil
          else Seq(LakePredicate.GtEq(factKey, summary.get(1)),
                   LakePredicate.LtEq(factKey, summary.get(2)))
        val base = fact.scan(rangePreds, version)
        base.schema(factKey).dataType match {
          case ByteType | ShortType | IntegerType | LongType | StringType =>
            // size the filter from the true key count (the same job
            // computed it); ~1.2 MB per million keys at 1% fpp,
            // shipped with the plan exactly as Spark's own injected
            // filter is
            val n = math.max(summary.getLong(0), 1L)
            val bloom = keys.stat.bloomFilter(dimKey, n, bloomFpp)
            val bos = new java.io.ByteArrayOutputStream()
            bloom.writeTo(bos)
            base.where(graft.functions.BloomFunctions.bloom_might_contain(
              base(factKey), bos.toByteArray))
          case _ => base
        }
      }
    // no forced broadcast: a small KEY set does not bound the dim
    // frame's size (few keys × many rows, or wide payloads). Spark's
    // size estimation + AQE elect broadcast when the dim really is
    // small — the hint is the caller's decision, not this helper's
    factDf.join(dim, factDf(factKey) === dim(dimKey))
  }
}
