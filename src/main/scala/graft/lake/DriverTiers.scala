package graft.lake

/** The ONE definition site for the driver-bounded execution tiers the
  * refresh/runtime-filter machinery shares ([[JoinView]],
  * [[IncrementalView]], [[RuntimeFilter]], and the stream-enrichment
  * query). Each knob answers the same scale question — "how much key
  * state may the driver hold, and in what form may it re-enter a
  * scan?" — and the policy previously lived in four scattered
  * constants with drifting values; this object owns it.
  *
  * The tiers:
  *
  *  1. **Driver-exact `In` pushdown** (≤ [[driverKeyCap]] values): the
  *     key set ships as ONE flat `In` predicate the lake scan applies
  *     BOTH as driver-side file skipping (directory projection +
  *     per-file min/max stats — evaluated via a pre-sorted probe set
  *     and a binary search per file, [[FileStats]], so the driver
  *     cost is O(V log V) once, not O(files × V)) and as an exact
  *     row filter. The cap is where the In expression's PLAN cost
  *     starts to matter: tens of thousands of cast literals make
  *     analysis and plan shipping measurable (measured at ~20k in
  *     SCALE.md round 11; the round-12 soak's third MV decade showed
  *     why the file-skip must extend to this whole tier — a 5k-key
  *     refresh read that loses file skipping becomes a table scan at
  *     a 100M-row base).
  *  2. **Bloom + semi-join** (above [[driverKeyCap]]): only a bloom
  *     summary of the keys reaches the plan (row-level filter inside
  *     the scan stage); a null-safe semi-join restores exactness.
  *     Never unbounded driver state.
  *
  * [[bloomFileThreshold]] gates tier 2's view-side variant: a bloom
  * build costs two extra driver actions, worth paying only when the
  * bounded table is big enough (manifest file count) for the saved
  * scan to matter.
  *
  * Carried as a VALUE (not globals) so tests exercise every tier
  * boundary on tiny data by passing shrunken caps — no shared
  * mutable `sys.props` under parallel suites.
  */
final case class DriverTiers(driverKeyCap: Int = 20000,
                             bloomFileThreshold: Int = 8) {
  require(driverKeyCap >= 0, s"negative driverKeyCap: $driverKeyCap")
}

object DriverTiers {
  /** Production policy — the measured defaults above. */
  val Default: DriverTiers = DriverTiers()
}
