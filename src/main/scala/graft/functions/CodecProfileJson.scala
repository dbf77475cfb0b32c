package graft.functions

import graft.sources.{Aac, H264, Mp2, Mp3, Vlc}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** The user-facing JSON injection path for EVERY codeword-table seam
  * in the codec layer — the generalization of [[Vp8ProfileJson]] to
  * the four families whose appendix DATA the zero-egress sandbox has
  * no copy of. A user holding the published tables (ISO/IEC 11172-3
  * Tables 3-B.2/3-B.3/B.5–B.8, ISO/IEC 13818-7 Tables A.2–A.12 +
  * §8.9, ITU-T H.264 Tables 9-4/9-5/9-7..9-10) edits a dumped
  * stand-in document and decodes real files WITHOUT recompiling —
  * the same value swap [[Vp8.Profile]] promises, reachable from
  * [[graft.RunDecode]].
  *
  * Shared shapes:
  *  - a VLC table is `[[value, len, code], ...]` — an MSB-first
  *    prefix code ([[graft.sources.Vlc]] validates prefix-freedom);
  *  - absent fields keep that family's stand-in (so a partial
  *    document swaps one table at a time);
  *  - `null` in an optional-VLC slot keeps the stand-in fixed-width
  *    field for that one table.
  *
  * Family schemas (all fields optional):
  * {{{
  * mp3:  { "sfbLong": [int×23], "sfbShort": [int×13],
  *         "linbits": [int×32],
  *         "huff": [vlc|null ×32],      // pair tables, value = 16|x|+|y|
  *         "count1A": vlc }             // value = the 4-bit vwxy pattern
  * mp2:  { "window": [int×512],
  *         "allocBits": [int×sblimit],  // per-subband nbal (2..4)
  *         "quantLevels": [[int]×sblimit] }
  * aac:  { "swbLong": [int], "swbShort": [int],
  *         "cb": [vlc|null ×12] }       // tuple-index packing: Aac.Profile
  * h264: { "cbpIntra": [int×48], "cbpInter": [int×48],
  *         "coeffToken": { "n0": vlc, "n2": vlc, "n4": vlc,
  *                         "chromaDc": vlc },   // value = tc*4 + t1
  *         "totalZeros": [vlc×15], "totalZerosCdc": [vlc×3],
  *         "runBefore": [vlc×7],
  *         "cabacRangeLps": [[int×4]×64],       // Table 9-35
  *         "cabacTransLps": [int×64],           // Table 9-36 LPS col
  *         "cabacCtxInit": [[m, n]×>=277] }     // Tables 9-12..9-33
  * }}}
  * Range/shape validation is each Profile's own; malformed documents
  * fail loudly by field name. */
object CodecProfileJson {

  private def ints(v: JValue, field: String): Array[Int] = v match {
    case JArray(xs) => xs.map {
      case JInt(n) => n.toInt
      case other => throw new IllegalArgumentException(
        s"codec profile json: non-integer in $field: $other")
    }.toArray
    case other => throw new IllegalArgumentException(
      s"codec profile json: $field must be an array, got $other")
  }

  private def vlc(v: JValue, field: String): Vlc = v match {
    case JArray(rows) => Vlc(rows.map {
      case JArray(List(JInt(value), JInt(len), JInt(code))) =>
        Vlc.Entry(value.toInt, len.toInt, code.toInt)
      case other => throw new IllegalArgumentException(
        s"codec profile json: $field rows are [value, len, code], " +
          s"got $other")
    }.toVector)
    case other => throw new IllegalArgumentException(
      s"codec profile json: $field must be a VLC row array, got $other")
  }

  /** A slot array like `huff`/`cb`: each element a VLC or null. */
  private def vlcSlots(v: JValue, field: String, n: Int)
      : Vector[Option[Vlc]] = v match {
    case JArray(xs) =>
      require(xs.length == n,
        s"codec profile json: $field needs $n slots, got ${xs.length}")
      xs.map {
        case JNull | JNothing => None
        case x => Some(vlc(x, field))
      }.toVector
    case other => throw new IllegalArgumentException(
      s"codec profile json: $field must be a slot array, got $other")
  }

  private def vlcVector(v: JValue, field: String, n: Int): Vector[Vlc] =
    v match {
      case JArray(xs) =>
        require(xs.length == n,
          s"codec profile json: $field needs $n tables, got ${xs.length}")
        xs.map(vlc(_, field)).toVector
      case other => throw new IllegalArgumentException(
        s"codec profile json: $field must be a table array, got $other")
    }

  private def field(j: JValue, name: String): Option[JValue] =
    j \ name match {
      case JNothing | JNull => None
      case v => Some(v)
    }

  // ---- renderers -----------------------------------------------------------

  private def jInts(a: Array[Int]): JValue =
    JArray(a.map(v => JInt(v): JValue).toList)
  private def jVlc(v: Vlc): JValue =
    JArray(v.entries.map(e => JArray(List(JInt(e.value), JInt(e.len),
      JInt(e.code))): JValue).toList)
  private def jSlots(v: Vector[Option[Vlc]]): JValue =
    JArray(v.map {
      case Some(t) => jVlc(t)
      case None => JNull: JValue
    }.toList)
  private def compact(o: JObject): String =
    JsonMethods.compact(JsonMethods.render(o))

  // ---- MP3 -----------------------------------------------------------------

  def parseMp3(json: String,
      base: Mp3.Profile = Mp3.Profile.StandIn): Mp3.Profile = {
    val j = JsonMethods.parse(json)
    Mp3.Profile(
      sfbLong = field(j, "sfbLong").map(ints(_, "sfbLong"))
        .getOrElse(base.sfbLong),
      sfbShort = field(j, "sfbShort").map(ints(_, "sfbShort"))
        .getOrElse(base.sfbShort),
      linbits = field(j, "linbits").map(ints(_, "linbits"))
        .getOrElse(base.linbits),
      huff = field(j, "huff").map(vlcSlots(_, "huff", 32))
        .getOrElse(base.huff),
      count1A = field(j, "count1A").map(vlc(_, "count1A"))
        .orElse(base.count1A))
  }

  def renderMp3(p: Mp3.Profile): String = compact(JObject(List(
    "sfbLong" -> jInts(p.sfbLong),
    "sfbShort" -> jInts(p.sfbShort),
    "linbits" -> jInts(p.linbits),
    "huff" -> jSlots(p.huff)) ++
    p.count1A.map(v => "count1A" -> jVlc(v)).toList))

  // ---- MP2 -----------------------------------------------------------------

  def parseMp2(json: String,
      base: Mp2.Profile = Mp2.Profile.StandIn): Mp2.Profile = {
    val j = JsonMethods.parse(json)
    Mp2.Profile(
      window = field(j, "window").map(ints(_, "window"))
        .getOrElse(base.window),
      allocBits = field(j, "allocBits").map(ints(_, "allocBits"))
        .getOrElse(base.allocBits),
      quantLevels = field(j, "quantLevels").map {
        case JArray(rows) => rows.map(ints(_, "quantLevels")).toArray
        case other => throw new IllegalArgumentException(
          s"codec profile json: quantLevels must be row arrays, $other")
      }.getOrElse(base.quantLevels))
  }

  def renderMp2(p: Mp2.Profile): String = compact(JObject(List(
    "window" -> jInts(p.window),
    "allocBits" -> jInts(p.allocBits),
    "quantLevels" -> JArray(p.quantLevels.map(jInts).toList))))

  // ---- AAC -----------------------------------------------------------------

  def parseAac(json: String,
      base: Aac.Profile = Aac.Profile.StandIn): Aac.Profile = {
    val j = JsonMethods.parse(json)
    Aac.Profile(
      swbLong = field(j, "swbLong").map(ints(_, "swbLong"))
        .getOrElse(base.swbLong),
      swbShort = field(j, "swbShort").map(ints(_, "swbShort"))
        .getOrElse(base.swbShort),
      cb = field(j, "cb").map(vlcSlots(_, "cb", 12)).getOrElse(base.cb))
  }

  def renderAac(p: Aac.Profile): String = compact(JObject(List(
    "swbLong" -> jInts(p.swbLong),
    "swbShort" -> jInts(p.swbShort),
    "cb" -> jSlots(p.cb))))

  // ---- H.264 ---------------------------------------------------------------

  private def intRows(v: JValue, field: String): Array[Array[Int]] =
    v match {
      case JArray(rows) => rows.map(ints(_, field)).toArray
      case other => throw new IllegalArgumentException(
        s"codec profile json: $field must be row arrays, got $other")
    }

  def parseH264(json: String,
      base: H264.Profile = H264.Profile.StandIn): H264.Profile = {
    val j = JsonMethods.parse(json)
    val ct = field(j, "coeffToken").map { o =>
      def sub(name: String): Vlc = field(o, name) match {
        case Some(v) => vlc(v, s"coeffToken.$name")
        case None => throw new IllegalArgumentException(
          s"codec profile json: coeffToken needs $name")
      }
      H264.CoeffTokenTables(sub("n0"), sub("n2"), sub("n4"),
        sub("chromaDc"))
    }.orElse(base.coeffToken)
    H264.Profile(
      cbpIntra = field(j, "cbpIntra").map(ints(_, "cbpIntra"))
        .getOrElse(base.cbpIntra),
      cbpInter = field(j, "cbpInter").map(ints(_, "cbpInter"))
        .getOrElse(base.cbpInter),
      coeffToken = ct,
      totalZeros = field(j, "totalZeros")
        .map(vlcVector(_, "totalZeros", 15)).orElse(base.totalZeros),
      totalZerosCdc = field(j, "totalZerosCdc")
        .map(vlcVector(_, "totalZerosCdc", 3))
        .orElse(base.totalZerosCdc),
      runBefore = field(j, "runBefore")
        .map(vlcVector(_, "runBefore", 7)).orElse(base.runBefore),
      cabacRangeLps = field(j, "cabacRangeLps")
        .map(intRows(_, "cabacRangeLps")).getOrElse(base.cabacRangeLps),
      cabacTransLps = field(j, "cabacTransLps")
        .map(ints(_, "cabacTransLps")).getOrElse(base.cabacTransLps),
      cabacCtxInit = field(j, "cabacCtxInit")
        .map(intRows(_, "cabacCtxInit")).orElse(base.cabacCtxInit))
  }

  def renderH264(p: H264.Profile): String = compact(JObject(List(
    "cbpIntra" -> jInts(p.cbpIntra),
    "cbpInter" -> jInts(p.cbpInter)) ++
    p.coeffToken.map(ct => "coeffToken" -> (JObject(List(
      "n0" -> jVlc(ct.n0), "n2" -> jVlc(ct.n2),
      "n4" -> jVlc(ct.n4),
      "chromaDc" -> jVlc(ct.chromaDc))): JValue)).toList ++
    p.totalZeros.map(ts =>
      "totalZeros" -> (JArray(ts.map(jVlc).toList): JValue)).toList ++
    p.totalZerosCdc.map(ts =>
      "totalZerosCdc" -> (JArray(ts.map(jVlc).toList): JValue)).toList ++
    p.runBefore.map(ts =>
      "runBefore" -> (JArray(ts.map(jVlc).toList): JValue)).toList ++
    List(
      "cabacRangeLps" -> (JArray(p.cabacRangeLps.map(jInts).toList)
        : JValue),
      "cabacTransLps" -> jInts(p.cabacTransLps)) ++
    p.cabacCtxInit.map(t =>
      "cabacCtxInit" -> (JArray(t.map(jInts).toList): JValue)).toList))
}
