package graft

import graft.sources.IsoBmff
import graft.sources.IsoBmff._
import org.scalatest.funsuite.AnyFunSuite

/** ISO-BMFF (fragmented MP4) format pins — the third container family
  * next to ContainerFormatSpec (RIFF) and MkvSpec (EBML): box framing,
  * moov/mvex metadata, per-fragment moof/traf/tfdt/trun structure with
  * default-base-is-moof offsets, and the mux→demux identity the
  * reference pins for its containers (tests/media/test_containers
  * .py:20-29).
  */
class IsoBmffSpec extends AnyFunSuite {

  private val tracks = Seq(
    Mp4Track(1, "video", "grft", width = 64, height = 48),
    Mp4Track(2, "audio", "gpcm", sampleRate = 16000, channels = 1))

  private def sample(trk: Int, dts: Long, dur: Long, key: Boolean,
      tag: String): Mp4Sample =
    Mp4Sample(trk, dts, dur, key, tag.getBytes("UTF-8"))

  private val samples = Seq(
    sample(1, 0L, 33L, key = true, "v0"),
    sample(2, 0L, 32L, key = true, "a0-longer-payload"),
    sample(1, 33L, 33L, key = false, "v1"),
    sample(2, 32L, 32L, key = true, "a1"),
    sample(1, 66L, 33L, key = false, "v2!"))

  test("u16/u32/u64 are big-endian and round trip") {
    assert(readU32(u32(0xdeadbeefL), 0) == 0xdeadbeefL)
    assert(readU16(u16(0xbeef), 0) == 0xbeef)
    assert(readU64(u64(0x1122334455667788L), 0) == 0x1122334455667788L)
    assert(u32(1L).toSeq == Seq(0, 0, 0, 1).map(_.toByte))
  }

  test("mux→demux identity: tracks, sample order per track, dts chain, " +
      "durations, keyframes, payload bytes") {
    val bytes = mux(tracks, samples, fragMax = 2)
    val (gotTracks, gotSamples, frags) = demux(bytes)
    assert(gotTracks == tracks)
    assert(frags == 3) // 5 samples, fragments of 2
    // per-track sample streams survive byte-exactly in dts order
    for (t <- Seq(1, 2)) {
      val want = samples.filter(_.track == t)
      val got = gotSamples.filter(_.track == t).sortBy(_.dts)
      assert(got.map(_.dts) == want.map(_.dts))
      assert(got.map(_.dur) == want.map(_.dur))
      assert(got.map(_.keyframe) == want.map(_.keyframe))
      assert(got.map(_.payload.toSeq) == want.map(_.payload.toSeq))
    }
  }

  test("box layout: ftyp first, one moov, moof+mdat pairs, mfhd " +
      "sequence numbers start at 1") {
    val bytes = mux(tracks, samples, fragMax = 2)
    val top = boxes(bytes, 0, bytes.length)
    assert(top.map(_.kind).take(2) == Seq("ftyp", "moov"))
    val rest = top.drop(2).map(_.kind)
    assert(rest == Seq("moof", "mdat", "moof", "mdat", "moof", "mdat"))
    val seqs = top.filter(_.kind == "moof").map(m =>
      boxes(m.data, 0, m.data.length).find(_.kind == "mfhd")
        .map(h => readU32(h.data, 4)).get)
    assert(seqs == Seq(1L, 2L, 3L))
  }

  test("tfdt carries each (fragment, track) run's first dts in a " +
      "version-1 64-bit box; trun offsets are moof-relative") {
    val bytes = mux(tracks, samples, fragMax = 4)
    val moof = boxes(bytes, 0, bytes.length).find(_.kind == "moof").get
    val trafs = boxes(moof.data, 0, moof.data.length).filter(_.kind == "traf")
    assert(trafs.size == 2) // both tracks present in fragment 1
    val byTrack = trafs.map { tf =>
      val els = boxes(tf.data, 0, tf.data.length)
      val tfhd = els.find(_.kind == "tfhd").get.data
      assert((readU32(tfhd, 0) & DefaultBaseIsMoof) != 0)
      val tfdtBox = els.find(_.kind == "tfdt").get.data
      assert(tfdtBox(0) == 1) // version 1 → 64-bit baseMediaDecodeTime
      readU32(tfhd, 4).toInt -> readU64(tfdtBox, 4)
    }.toMap
    assert(byTrack == Map(1 -> 0L, 2 -> 0L))
    // first trun's data offset points just past the moof into the mdat
    val trun0 = boxes(trafs.head.data, 0, trafs.head.data.length)
      .find(_.kind == "trun").get.data
    val moofSize = readU32(bytes, moof.pos)
    assert(readU32(trun0, 8) == moofSize + 8)
  }

  test("demux skips unknown boxes (forward compatibility) and rejects " +
      "missing ftyp/moov, truncated boxes, bad mfhd sequence") {
    val bytes = mux(tracks, samples, fragMax = 8)
    // splice an unknown box between moov and the first moof
    val top = boxes(bytes, 0, bytes.length)
    val moovEnd = top(1).pos + 8 + top(1).data.length
    val out = new java.io.ByteArrayOutputStream()
    out.write(bytes, 0, moovEnd)
    writeBox(out, "skip", Array[Byte](1, 2, 3))
    out.write(bytes, moovEnd, bytes.length - moovEnd)
    val (_, withSkip, _) = demux(out.toByteArray)
    assert(withSkip.size == samples.size)

    intercept[IllegalArgumentException] {
      demux(bytes.drop(16)) // ftyp gone
    }
    intercept[IllegalArgumentException] {
      demux(bytes.dropRight(3)) // truncated final box
    }
    // corrupt the mfhd sequence number of fragment 1
    val moof = top.find(_.kind == "moof").get
    val bad = bytes.clone()
    // mfhd payload: 4 bytes fullbox + u32 sequence at moof body start:
    // moof.pos + 8 (moof hdr) + 8 (mfhd hdr) + 4 (fullbox) → sequence
    bad(moof.pos + 8 + 8 + 4 + 3) = 9
    intercept[IllegalArgumentException] { demux(bad) }
  }

  test("a fragment holding only one track writes a single traf") {
    val onlyVideo = samples.filter(_.track == 1)
    val bytes = mux(tracks, onlyVideo, fragMax = 8)
    val moof = boxes(bytes, 0, bytes.length).find(_.kind == "moof").get
    assert(boxes(moof.data, 0, moof.data.length).count(_.kind == "traf") == 1)
    val (_, got, frags) = demux(bytes)
    assert(frags == 1 && got.map(_.payload.toSeq) ==
      onlyVideo.map(_.payload.toSeq))
  }
}
