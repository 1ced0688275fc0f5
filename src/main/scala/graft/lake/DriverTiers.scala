package graft.lake

/** The ONE definition site for the driver-bounded execution tiers the
  * refresh/runtime-filter machinery shares ([[JoinView]],
  * [[IncrementalView]], [[RuntimeFilter]], and the stream-enrichment
  * query). Each knob answers the same scale question — "how much key
  * state may the driver hold, and in what form may it re-enter a
  * scan?" — and the policy previously lived in four scattered
  * constants with drifting values; this object owns it.
  *
  * The tiers, cheapest first:
  *
  *  1. **`In` pushdown** (≤ [[inPushdownCap]] values): the key set
  *     ships as a flat `In` predicate the lake scan applies BOTH as
  *     driver-side file skipping (directory projection + per-file
  *     min/max/bloom stats) and as an exact row filter. The cap is
  *     where the per-file × per-value driver evaluation stops paying
  *     — beyond ~1k values the file-skip loop itself is the cost.
  *  2. **Driver-exact key set** (≤ [[driverKeyCap]] values): the keys
  *     still fit on the driver and ship as an `isin` row filter —
  *     exact, no join needed — but no longer file-skip. Bounded where
  *     the isin/In PLAN cost starts to matter: tens of thousands of
  *     literals make analysis and plan shipping measurable (measured
  *     at ~20k in SCALE.md round 11).
  *  3. **Bloom + semi-join** (above [[driverKeyCap]]): only a bloom
  *     summary of the keys reaches the plan (row-level filter inside
  *     the scan stage); a null-safe semi-join restores exactness.
  *     Never unbounded driver state.
  *
  * [[bloomFileThreshold]] gates tier 3's view-side variant: a bloom
  * build costs two extra driver actions, worth paying only when the
  * bounded table is big enough (manifest file count) for the saved
  * scan to matter.
  *
  * Carried as a VALUE (not globals) so tests exercise every tier
  * boundary on tiny data by passing shrunken caps — no shared
  * mutable `sys.props` under parallel suites.
  */
final case class DriverTiers(inPushdownCap: Int = 1000,
                             driverKeyCap: Int = 20000,
                             bloomFileThreshold: Int = 8) {
  require(inPushdownCap >= 0 && driverKeyCap >= inPushdownCap,
    s"tiers must nest: inPushdownCap=$inPushdownCap <= driverKeyCap=$driverKeyCap")
}

object DriverTiers {
  /** Production policy — the measured defaults above. */
  val Default: DriverTiers = DriverTiers()
}
