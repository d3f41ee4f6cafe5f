package graft.filters

import java.time.{Instant, LocalDate, LocalDateTime, OffsetDateTime, ZoneOffset}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Type-aware coercion of datetime Range / order-by `start_from` bounds to
  * the resolved payload column's type.
  *
  * The reference accepts datetime bounds as RFC3339 strings — plus lenient
  * space-separated and bare-date forms — and compares them against datetime
  * payloads regardless of the stored representation, with microsecond
  * precision (`Range<DateTimePayloadType>` `lib/segment/src/types.rs:3229-3345`;
  * parsing `types.rs:65,78`). The engine's numeric wire unit for datetime
  * bounds is epoch **nanoseconds** (the historic testdata layout: parquet
  * TIMESTAMP(NANOS) read as long via `nanosAsLong`), truncated to μs when
  * the column is a real timestamp.
  *
  * Coercions (anything else falls through to a plain literal, keeping the
  * numeric fast path untouched):
  *   - timestamp/timestamp_ntz column + numeric bound → epoch nanos → μs
  *   - timestamp/timestamp_ntz column + string bound  → parsed instant (μs)
  *   - date column + string bound                     → UTC calendar date
  *   - numeric column + datetime-string bound         → epoch nanos
  *
  * Every coerced bound is a plain literal of the column's type, so parquet
  * pushdown sees an ordinary typed comparison and prunes row groups.
  */
object Temporal {

  /** Parse the reference's accepted wire forms to an Instant (UTC when no
    * offset is given): RFC3339 with offset/'Z', `yyyy-MM-ddTHH:mm:ss[.f]`,
    * `yyyy-MM-dd HH:mm:ss[.f]`, and bare `yyyy-MM-dd`. The offset may omit
    * the colon or the minutes (`+0200` / `+02`) — chrono's `%#z` accepts
    * both (`types.rs:124-125`) where java.time wants `+02:00` — and
    * RFC3339's `t`/`z` are case-insensitive. */
  def parseInstant(s: String): Option[Instant] = {
    val t0 = s.trim.replace(' ', 'T')
    val t1 = if (t0.length > 10 && t0.charAt(10) == 't') t0.updated(10, 'T') else t0
    val t2 = if (t1.nonEmpty && t1.last == 'z') t1.dropRight(1) + "Z" else t1
    // `+HHMM` → `+HH:MM` (4 digits after the sign can only be an offset);
    // bare `+HH` → `+HH:00` (guarded by a preceding time so a bare date's
    // `-dd` tail can never match)
    val t = t2
      .replaceFirst("([+-]\\d{2})(\\d{2})$", "$1:$2")
      .replaceFirst("(T\\d{2}:\\d{2}(?::\\d{2}(?:\\.\\d+)?)?)([+-]\\d{2})$", "$1$2:00")
    def attempt(f: => Instant): Option[Instant] =
      try Some(f) catch { case _: java.time.format.DateTimeParseException => None }
    attempt(OffsetDateTime.parse(t).toInstant)
      .orElse(attempt(Instant.parse(t)))
      .orElse(attempt(LocalDateTime.parse(t).toInstant(ZoneOffset.UTC)))
      .orElse(attempt(LocalDate.parse(t).atStartOfDay(ZoneOffset.UTC).toInstant))
  }

  def epochMicros(i: Instant): Long =
    Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L), i.getNano / 1000L)

  /** The bound as an Instant, when it has a temporal reading: strings parse
    * per [[parseInstant]]; integral numerics are epoch nanos. */
  private def asInstant(b: Any): Option[Instant] = b match {
    case s: String => parseInstant(s)
    case i: Instant => Some(i)
    case n: Long =>
      Some(Instant.ofEpochSecond(Math.floorDiv(n, 1000000000L), Math.floorMod(n, 1000000000L)))
    case n: Int => asInstant(n.toLong)
    case _ => None
  }

  /** Literal for bound `b` compared against a column of type `dt` (None =
    * statically unknown → plain literal). */
  def boundLit(dt: Option[DataType], b: Any): Column = dt match {
    case Some(TimestampType) =>
      asInstant(b).map(i => lit(microsToInstant(epochMicros(i)))).getOrElse(lit(b))
    case Some(TimestampNTZType) =>
      asInstant(b)
        .map(i => lit(LocalDateTime.ofInstant(microsToInstant(epochMicros(i)), ZoneOffset.UTC)))
        .getOrElse(lit(b))
    case Some(DateType) =>
      asInstant(b)
        .map(i => lit(java.sql.Date.valueOf(LocalDate.ofInstant(i, ZoneOffset.UTC))))
        .getOrElse(lit(b))
    case Some(_: NumericType) => b match {
      // numeric datetime columns hold epoch nanos (the engine's numeric unit)
      case s: String =>
        parseInstant(s).map(i => lit(Math.multiplyExact(epochMicros(i), 1000L))).getOrElse(lit(b))
      case _ => lit(b)
    }
    case _ => lit(b)
  }

  private def microsToInstant(us: Long): Instant =
    Instant.ofEpochSecond(Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L)

  /** Numeric view of a possibly-temporal column for formula arithmetic:
    * temporal values become epoch **seconds** (fractional μs preserved) —
    * the documented unit of datetime variables in the formula language
    * (ref `rescore_formula/formula_scorer.rs:260-345` scores datetimes as
    * timestamps). Non-temporal values cast to double as before. ANSI-safe:
    * no timestamp→double cast (disallowed), `unix_micros` on a
    * session-UTC-normalized timestamp instead. */
  def asSeconds(c: Column, dt: Option[DataType]): Column = dt match {
    case Some(TimestampType) => unix_micros(c) / lit(1e6)
    case Some(TimestampNTZType) => unix_micros(c.cast(TimestampType)) / lit(1e6)
    case Some(DateType) => unix_date(c).cast("double") * lit(86400.0)
    case _ => c.cast("double")
  }
}
