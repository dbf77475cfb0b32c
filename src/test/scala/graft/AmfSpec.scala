package graft

import graft.sources.Amf
import graft.sources.Amf._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** AMF0 unit tests ([[graft.sources.Amf]] — Adobe AMF 0 spec): byte
  * layout per marker, the object/ECMA end sentinel, big-endian
  * IEEE-754 numbers, and encode→decode identity on random nested
  * values — the m32 oracle's local counterpart for the metadata
  * payloads RTMP data messages carry.
  */
class AmfSpec extends AnyFunSuite {

  test("byte layout: Number is 0x00 + 8 BE bytes, String is 0x02 + u16 " +
      "+ UTF-8, Boolean is 0x01 + 1, Null is bare 0x05") {
    val b = Amf.encode(Seq(AmfNumber(1.0)))
    assert(b.map(_ & 0xFF).toSeq ==
      Seq(0x00, 0x3F, 0xF0, 0, 0, 0, 0, 0, 0))
    val s = Amf.encode(Seq(AmfString("hi")))
    assert(s.map(_ & 0xFF).toSeq == Seq(0x02, 0, 2, 'h', 'i'))
    assert(Amf.encode(Seq(AmfBoolean(true))).map(_ & 0xFF).toSeq ==
      Seq(0x01, 1))
    assert(Amf.encode(Seq(AmfNull)).map(_ & 0xFF).toSeq == Seq(0x05))
  }

  test("ECMA array: 0x08 + u32 count + entries + empty-key 0x09 end " +
      "marker; the onMetaData shape is 88 bytes") {
    val meta = Amf.encode(Seq(AmfString("onMetaData"), AmfEcmaArray(Seq(
      "duration" -> AmfNumber(1.5),
      "samplerate" -> AmfNumber(1000.0),
      "stereo" -> AmfBoolean(false),
      "avgabs" -> AmfNumber(12.25)))))
    assert(meta.length == 88)
    assert((meta(13) & 0xFF) == 0x08)
    assert(meta.slice(14, 18).map(_ & 0xFF).toSeq == Seq(0, 0, 0, 4))
    assert(meta.takeRight(3).map(_ & 0xFF).toSeq == Seq(0, 0, 0x09))
    val Seq(AmfString(n), AmfEcmaArray(es)) = Amf.decode(meta)
    assert(n == "onMetaData")
    assert(es.map(_._1) == Seq("duration", "samplerate", "stereo", "avgabs"))
    assert(es.toMap.apply("duration") == AmfNumber(1.5))
  }

  test("object end marker is validated; unknown markers fail loud") {
    val obj = Amf.encode(Seq(AmfObject(Seq("k" -> AmfNumber(2.0)))))
    // corrupt the end marker 0x09 -> 0x07
    val bad = obj.clone(); bad(bad.length - 1) = 0x07
    intercept[IllegalArgumentException] { Amf.decode(bad) }
    intercept[RuntimeException] { Amf.decode(Array[Byte](0x42)) }
  }

  test("property: encode → decode identity on random nested values " +
      "(objects, ECMA and strict arrays, negative/fractional numbers, " +
      "unicode strings)") {
    val genLeaf: Gen[Value] = Gen.oneOf(
      Gen.chooseNum(-1e12, 1e12).map(AmfNumber(_)),
      Gen.oneOf(true, false).map(AmfBoolean(_)),
      Gen.alphaNumStr.map(s => AmfString(s.take(40))),
      Gen.const(AmfString("héllo π")),
      Gen.const(AmfNull))
    def genValue(depth: Int): Gen[Value] =
      if (depth == 0) genLeaf
      else Gen.frequency(
        3 -> genLeaf,
        1 -> Gen.choose(0, 4).flatMap(n =>
          Gen.listOfN(n, Gen.zip(Gen.identifier.map(_.take(12)),
            genValue(depth - 1))).map(es =>
            AmfObject(es.distinctBy(_._1)))),
        1 -> Gen.choose(0, 4).flatMap(n =>
          Gen.listOfN(n, Gen.zip(Gen.identifier.map(_.take(12)),
            genValue(depth - 1))).map(es =>
            AmfEcmaArray(es.distinctBy(_._1)))),
        1 -> Gen.choose(0, 4).flatMap(n =>
          Gen.listOfN(n, genValue(depth - 1)).map(AmfStrictArray(_))))
    val genTop = Gen.choose(1, 4).flatMap(n =>
      Gen.listOfN(n, genValue(2)))
    val prop = Prop.forAll(genTop) { vs =>
      // empty keys are reserved for the end marker; the generator's
      // identifiers are non-empty, so round-trip must be exact
      Amf.decode(Amf.encode(vs)) == vs
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(80), prop)
    assert(res.passed, res.status.toString)
  }
}
