package graft.state

import java.nio.file.Files
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite

class WatermarkStoreSpec extends AnyFunSuite {
  test("epoch fallback, advance, monotonicity") {
    val st = new WatermarkStore(Files.createTempDirectory("wm-spec-"))
    assert(st.get("p", "extract") === new Timestamp(0L)) // constant.py:85 fallback
    val t1 = Timestamp.valueOf("2024-01-05 10:00:00")
    assert(st.advance("p", "extract", t1) === t1)
    assert(st.get("p", "extract") === t1)
    // stale writer cannot move the watermark backwards
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    assert(st.advance("p", "extract", t0) === t1)
    assert(st.get("p", "extract") === t1)
    // keys are independent
    assert(st.get("p", "other") === new Timestamp(0L))
    assert(st.all().size === 1)
  }

  test("path traversal in keys rejected") {
    val st = new WatermarkStore(Files.createTempDirectory("wm-spec2-"))
    intercept[IllegalArgumentException](st.get("../p", "x"))
  }

  test("microsecond precision round-trips (no ms flooring)") {
    val st = new WatermarkStore(Files.createTempDirectory("wm-us-"))
    val t = new Timestamp(1706400000123L) // ...123 ms
    t.setNanos(123456000)                 // ...123456 us
    st.advance("p", "x", t)
    val got = st.get("p", "x")
    assert(WatermarkStore.toMicros(got) === WatermarkStore.toMicros(t))
    assert(got.getNanos === 123456000)
    // a strictly-later sub-ms instant still advances
    val t2 = new Timestamp(1706400000123L); t2.setNanos(123457000)
    assert(st.advance("p", "x", t2) === t2)
  }

  test("pre-epoch instants round-trip (floorDiv, not truncation toward zero)") {
    // 1969-12-31T23:59:59.500 = -500ms = -500_000µs; getTime/1000*1e6
    // would round to -1_000_000+500_000 incorrectly under toward-zero
    val t = new Timestamp(-500L)
    assert(t.getNanos === 500000000) // JDBC normalization: -1s + 0.5s
    val us = WatermarkStore.toMicros(t)
    assert(us === -500000L)
    val back = WatermarkStore.fromMicros(us)
    assert(back === t && back.getTime === -500L)
    // deeper pre-epoch with sub-ms precision
    val t3 = new Timestamp(-86400000L - 1L) // 1969-12-30T23:59:59.999
    t3.setNanos(998765000)
    val us3 = WatermarkStore.toMicros(t3)
    assert(WatermarkStore.fromMicros(us3) === t3)
  }
}
