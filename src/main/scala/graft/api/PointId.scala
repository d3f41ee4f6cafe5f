package graft.api

/** Wire point-id parsing — `ExtendedPointId` (reference
  * `lib/segment/src/types.rs:174-268`).
  *
  * A point id in a JSON body is an unsigned integer or a UUID string —
  * nothing else. The reference's custom deserializer (`types.rs:243-268`)
  * tries u64 then `Uuid`, and rejects everything else (including decimal
  * digit STRINGS — `"5"` only u64-parses on path params via `FromStr`,
  * never in a body) with a fixed message that the HTTP layer wraps as
  * "Format error in JSON body: ..." (`src/actix/mod.rs:112,255`).
  *
  * UUID strings accept exactly the `uuid` crate's four `try_parse` forms —
  * simple (32 hex), hyphenated (8-4-4-4-12), braced hyphenated, and
  * case-insensitive `urn:uuid:` + hyphenated — and every accepted form
  * canonicalizes to the lowercase hyphenated rendering: the reference
  * stores the parsed 128-bit value and `Display`s it canonically, so
  * `ABCD…`, `{abcd…}` and `abcd…` are the SAME id on write, read, filter,
  * by-id query and response. Parsing (not string-keeping) is what makes
  * that hold here too.
  */
object PointId {

  private val Hyphenated =
    ("([0-9a-fA-F]{8})-([0-9a-fA-F]{4})-([0-9a-fA-F]{4})-" +
      "([0-9a-fA-F]{4})-([0-9a-fA-F]{12})").r
  private val Simple =
    ("([0-9a-fA-F]{8})([0-9a-fA-F]{4})([0-9a-fA-F]{4})" +
      "([0-9a-fA-F]{4})([0-9a-fA-F]{12})").r

  /** Canonical lowercase-hyphenated form, or None when `s` is not a UUID
    * in any of the four accepted syntaxes. */
  def canonicalUuid(s0: String): Option[String] = {
    val s =
      if (s0.length == 45 && s0.regionMatches(true, 0, "urn:uuid:", 0, 9))
        s0.substring(9)
      else if (s0.length == 38 && s0.charAt(0) == '{' && s0.charAt(37) == '}')
        s0.substring(1, 37)
      else s0
    s match {
      case Hyphenated(a, b, c, d, e) =>
        Some(s"$a-$b-$c-$d-$e".toLowerCase)
      case Simple(a, b, c, d, e) =>
        Some(s"$a-$b-$c-$d-$e".toLowerCase)
      case _ => None
    }
  }

  /** The reference deserializer's rejection, wire-wrapped
    * (`types.rs:260-266`; strings render bare — `utils/fmt.rs`). */
  def invalid(rendered: String): Nothing = throw new IllegalArgumentException(
    s"Format error in JSON body: value $rendered is not a valid point ID, " +
      "valid values are either an unsigned integer or a UUID")

  private val U64Max = (BigInt(1) << 64) - 1

  /** Unsigned integer id — the reference's FULL u64 domain
    * (`ExtendedPointId::NumId(u64)`, `types.rs:174-179`). Ids up to 2^63−1
    * stay native Longs; the `[2^63, 2^64)` tail rides the string-id
    * machinery as its decimal rendering — digits-only strings ORDER as
    * NumIds (`Reads.idSortKey`: `"0" + lpad(20)` covers all 20 u64
    * digits) and HASH as NumIds (`SipHash24.sliceIndexUuid` parses ≤20
    * digits as unsigned u64) — so tail ids coexist with Long and UUID ids
    * exactly like the reference's NumId/Uuid order. Beyond u64 rejects
    * loudly like serde's u64 deserialization. */
  def parseNum(i: BigInt): Any =
    if (i < 0) invalid(i.toString)
    else if (i.isValidLong) i.toLong
    else if (i <= U64Max) i.toString
    else throw new IllegalArgumentException(
      s"Bad request: point id $i exceeds the supported id range (0..2^64-1)")

  /** UUID string id → canonical form. */
  def parseString(s: String): String =
    canonicalUuid(s).getOrElse(invalid(s))
}
