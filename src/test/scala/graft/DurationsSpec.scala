package graft

import java.time.Duration

import org.scalatest.funsuite.AnyFunSuite

import graft.util.Durations

class DurationsSpec extends AnyFunSuite {

  test("parses single units") {
    assert(Durations.parse("30d") == Duration.ofDays(30))
    assert(Durations.parse("6h") == Duration.ofHours(6))
    assert(Durations.parse("30m") == Duration.ofMinutes(30))
    assert(Durations.parse("15s") == Duration.ofSeconds(15))
  }

  test("parses compounds and zero") {
    assert(Durations.parse("1d12h") == Duration.ofHours(36))
    assert(Durations.parse("0") == Duration.ZERO)
    assert(Durations.parse("0d") == Duration.ZERO)
    assert(Durations.parse("1d2h3m4s") ==
      Duration.ofDays(1).plusHours(2).plusMinutes(3).plusSeconds(4))
  }

  test("rejects garbage") {
    for (bad <- Seq("", "x", "12", "d", "1h2d", "-3d", "1.5d"))
      assertThrows[IllegalArgumentException](Durations.parse(bad))
  }

  test("format round-trips") {
    for (s <- Seq("30d", "6h", "30m", "15s", "1d12h", "1d2h3m4s"))
      assert(Durations.format(Durations.parse(s)) == s)
    assert(Durations.format(Duration.ZERO) == "0d")
  }

  test("sql interval rendering") {
    assert(Durations.toSqlInterval(Durations.parse("1d12h")) ==
      "INTERVAL '1' DAY + INTERVAL '12' HOUR")
    assert(Durations.toSqlInterval(Duration.ZERO) == "INTERVAL '0' SECOND")
  }
}
