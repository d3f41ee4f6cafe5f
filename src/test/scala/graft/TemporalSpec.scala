package graft

import java.time.Instant

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.filters.Temporal

/** Type-aware datetime bound coercion (Temporal) — the schema-drift guard:
  * the same Range/start_from bound must compare correctly whether the
  * column is timestamp[us] (current testdata), TIMESTAMP(NANOS)-as-long
  * (historic layout under nanosAsLong), or a plain numeric. */
class TemporalSpec extends SparkTestBase {

  test("parseInstant accepts the reference's lenient wire forms") {
    val expect = Instant.parse("2024-01-15T06:30:00Z")
    assert(Temporal.parseInstant("2024-01-15T06:30:00Z").contains(expect))
    assert(Temporal.parseInstant("2024-01-15T06:30:00+00:00").contains(expect))
    assert(Temporal.parseInstant("2024-01-15T08:30:00+02:00").contains(expect))
    assert(Temporal.parseInstant("2024-01-15 06:30:00").contains(expect))
    assert(Temporal.parseInstant("2024-01-15").contains(Instant.parse("2024-01-15T00:00:00Z")))
    assert(Temporal.parseInstant("2024-01-15 06:30:00.250")
      .contains(Instant.parse("2024-01-15T06:30:00.250Z")))
    // chrono `%#z` (`types.rs:124-125`): colon-less and minute-less offsets
    assert(Temporal.parseInstant("2024-01-15T08:30:00+0200").contains(expect))
    assert(Temporal.parseInstant("2024-01-15 08:30:00+0200").contains(expect))
    assert(Temporal.parseInstant("2024-01-15T08:30+02").contains(expect))
    assert(Temporal.parseInstant("2024-01-15T04:30:00-0200").contains(expect))
    // RFC3339 `t`/`z` are case-insensitive
    assert(Temporal.parseInstant("2024-01-15t06:30:00z").contains(expect))
    // a bare date's `-dd` tail must NOT be read as an offset
    assert(Temporal.parseInstant("2024-01-15").contains(Instant.parse("2024-01-15T00:00:00Z")))
    assert(Temporal.parseInstant("not a date").isEmpty)
    assert(Temporal.parseInstant("2024-13-45").isEmpty)
  }

  test("epochMicros keeps sub-second precision") {
    assert(Temporal.epochMicros(Instant.parse("2024-01-15T06:30:00.123456Z")) ===
      Instant.parse("2024-01-15T06:30:00Z").getEpochSecond * 1000000L + 123456L)
  }

  test("boundLit coerces nanos and strings against every temporal column type") {
    import spark.implicits._
    val base = Instant.parse("2024-01-15T00:00:00Z")
    val rows = Seq(-3600L, -60L, 0L, 60L, 3600L).map { off =>
      val i = base.plusSeconds(off)
      (off,
        java.sql.Timestamp.from(i),
        java.time.LocalDateTime.ofInstant(i, java.time.ZoneOffset.UTC),
        i.getEpochSecond * 1000000000L)
    }
    val df = rows.toDF("off", "ts_ltz", "ts_ntz", "ts_nanos")

    // every representation × every bound form agrees: strictly-after-the-
    // instant keeps the two later rows
    val nanoBound = base.getEpochSecond * 1000000000L
    val cases = Seq(
      ("ts_ltz", TimestampType), ("ts_ntz", TimestampNTZType), ("ts_nanos", LongType))
    for ((c, dt) <- cases; b <- Seq[Any](nanoBound, "2024-01-15T00:00:00Z", "2024-01-15 00:00:00", "2024-01-15")) {
      val n = df.filter(col(c) > Temporal.boundLit(Some(dt), b)).count()
      assert(n === 2, s"col=$c bound=$b")
    }
    // non-temporal columns: bounds pass through untouched
    assert(df.filter(col("off") > Temporal.boundLit(Some(LongType), 0L)).count() === 2)
  }

  test("asSeconds reads temporal columns as epoch seconds, numerics as double") {
    import spark.implicits._
    val i = Instant.parse("2024-01-15T06:30:00.500Z")
    val df = Seq((java.sql.Timestamp.from(i),
      java.time.LocalDateTime.ofInstant(i, java.time.ZoneOffset.UTC), 42.0))
      .toDF("ltz", "ntz", "num")
    val row = df.select(
      Temporal.asSeconds(col("ltz"), Some(TimestampType)),
      Temporal.asSeconds(col("ntz"), Some(TimestampNTZType)),
      Temporal.asSeconds(col("num"), Some(DoubleType))).head()
    val want = i.getEpochSecond.toDouble + 0.5
    assert(row.getDouble(0) === want)
    assert(row.getDouble(1) === want)
    assert(row.getDouble(2) === 42.0)
  }
}
