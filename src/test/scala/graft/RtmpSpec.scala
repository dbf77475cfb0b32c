package graft

import graft.sources.Rtmp
import graft.sources.Rtmp.RtmpMessage
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** RTMP chunk-stream unit tests ([[graft.sources.Rtmp]] — Adobe RTMP
  * Specification 1.0 §5.3): byte-level header layout down the fmt
  * compression ladder, split-message continuation, the extended
  * timestamp sentinel and its §5.3.1.3 repetition rule, Set Chunk
  * Size handling, multi-byte chunk-stream ids, and mux→demux
  * identity on randomized interleaved streams — the m31 oracle's
  * local counterpart for the live-ingest framing under m30's FLV
  * frame layer.
  */
class RtmpSpec extends AnyFunSuite {

  private def msg(csid: Int, ts: Long, s: String, typeId: Int = 9,
      streamId: Long = 1L) =
    RtmpMessage(csid, streamId, typeId, ts, s.getBytes("US-ASCII"))

  test("mux → demux is identity on an interleaved two-stream timeline") {
    val msgs = Seq(
      msg(6, 0, "I-frame"), msg(4, 0, "a0", typeId = 8),
      msg(6, 33, "P-frame"), msg(4, 32, "a1", typeId = 8),
      msg(6, 66, "P-frame"), msg(4, 64, "a2", typeId = 8))
    val (dec, _) = Rtmp.demux(Rtmp.mux(msgs))
    assert(dec.map(m => (m.csid, m.streamId, m.typeId, m.tsMs)) ==
      msgs.map(m => (m.csid, m.streamId, m.typeId, m.tsMs)))
    assert(dec.map(_.payload.toSeq) == msgs.map(_.payload.toSeq))
  }

  test("fmt ladder: first message Type 0 (11B header, LE stream id), " +
      "length change Type 1, equal-delta repeat Type 3, delta change " +
      "Type 2") {
    val msgs = Seq(
      msg(3, 100, "aaaa"),        // fmt0: virgin chunk stream
      msg(3, 110, "bbbbbb"),      // fmt1: length changed (4 -> 6)
      msg(3, 120, "cccccc"),      // fmt3: same len/type AND delta 10
      msg(3, 135, "dddddd"))      // fmt2: delta changed (10 -> 15)
    val bytes = Rtmp.mux(msgs)
    // chunk 1: basic (fmt0<<6)|3, ts u24=100, len u24=4, type 9,
    // stream id u32 LITTLE-endian = 1
    assert((bytes(0) & 0xFF) == 3)
    assert(bytes.slice(1, 4).map(_ & 0xFF).toSeq == Seq(0, 0, 100))
    assert(bytes.slice(4, 7).map(_ & 0xFF).toSeq == Seq(0, 0, 4))
    assert((bytes(7) & 0xFF) == 9)
    assert(bytes.slice(8, 12).map(_ & 0xFF).toSeq == Seq(1, 0, 0, 0))
    var p = 12 + 4
    // chunk 2: fmt1, delta 10, len 6, type 9 — 8B header
    assert((bytes(p) & 0xFF) == ((1 << 6) | 3))
    assert(bytes.slice(p + 1, p + 4).map(_ & 0xFF).toSeq == Seq(0, 0, 10))
    assert(bytes.slice(p + 4, p + 7).map(_ & 0xFF).toSeq == Seq(0, 0, 6))
    p += 8 + 6
    // chunk 3: fmt3, zero-byte header (everything inherited)
    assert((bytes(p) & 0xFF) == ((3 << 6) | 3))
    p += 1 + 6
    // chunk 4: fmt2, delta-only 3B header carrying the new delta 15
    assert((bytes(p) & 0xFF) == ((2 << 6) | 3))
    assert(bytes.slice(p + 1, p + 4).map(_ & 0xFF).toSeq == Seq(0, 0, 15))
    assert(p + 4 + 6 == bytes.length)
    val (dec, stats) = Rtmp.demux(bytes)
    assert(dec.map(_.tsMs) == Seq(100L, 110L, 120L, 135L))
    assert((stats.fmt0, stats.fmt1, stats.fmt2, stats.fmt3) ==
      (1L, 1L, 1L, 1L))
    assert(stats.ext == 0L)
  }

  test("a message longer than the chunk size splits into fmt-3 " +
      "continuations and reassembles exactly") {
    val payload = ("x" * 300).getBytes("US-ASCII")
    val m = RtmpMessage(5, 1L, 9, 42L, payload)
    val bytes = Rtmp.mux(Seq(m)) // default chunk size 128 -> 3 chunks
    assert((bytes(0) >> 6) == 0)
    // continuation basic headers at 12+128 and 12+128+1+128
    assert((bytes(12 + 128) & 0xFF) == ((3 << 6) | 5))
    assert((bytes(12 + 128 + 1 + 128) & 0xFF) == ((3 << 6) | 5))
    assert(bytes.length == 12 + 300 + 2)
    val (dec, stats) = Rtmp.demux(bytes)
    assert(dec.size == 1 && dec.head.payload.length == 300)
    assert(dec.head.payload.toSeq == payload.toSeq)
    assert((stats.fmt0, stats.fmt3) == (1L, 2L))
  }

  test("extended timestamp: sentinel + u32 on the Type-0 header, " +
      "repeated on that message's continuations, cleared by the next " +
      "fmt-1 header (§5.3.1.3)") {
    val big = 20000000L // > 0xFFFFFF
    val msgs = Seq(
      RtmpMessage(4, 1L, 8, big, ("y" * 200).getBytes("US-ASCII")),
      msg(4, big + 32, "short", typeId = 8))
    val bytes = Rtmp.mux(msgs)
    // header: sentinel in the u24 ts field, real value as u32 after
    // the 11B message header
    assert(bytes.slice(1, 4).map(_ & 0xFF).toSeq == Seq(0xFF, 0xFF, 0xFF))
    assert(((bytes(12) & 0xFFL) << 24 | (bytes(13) & 0xFFL) << 16 |
      (bytes(14) & 0xFFL) << 8 | (bytes(15) & 0xFFL)) == big)
    // continuation at 16+128 repeats the 4-byte extended field
    val contAt = 16 + 128
    assert((bytes(contAt) & 0xFF) == ((3 << 6) | 4))
    assert(((bytes(contAt + 1) & 0xFFL) << 24 |
      (bytes(contAt + 2) & 0xFFL) << 16 |
      (bytes(contAt + 3) & 0xFFL) << 8 |
      (bytes(contAt + 4) & 0xFFL)) == big)
    // second message: fmt1 (length changed), small delta, NO ext
    val m2At = contAt + 5 + 72
    assert((bytes(m2At) & 0xFF) == ((1 << 6) | 4))
    assert(bytes.slice(m2At + 1, m2At + 4).map(_ & 0xFF).toSeq ==
      Seq(0, 0, 32))
    val (dec, stats) = Rtmp.demux(bytes)
    assert(dec.map(_.tsMs) == Seq(big, big + 32))
    assert(stats.ext == 2L) // header + one continuation
  }

  test("non-default chunk size is declared by a leading Set Chunk Size " +
      "control message, consumed by the demux and applied to framing") {
    val payload = ("z" * 100).getBytes("US-ASCII")
    val bytes = Rtmp.mux(Seq(RtmpMessage(7, 1L, 9, 5L, payload)),
      chunkSize = 48)
    // control: fmt0 on csid 2, type 1, stream 0, u32 payload = 48
    assert((bytes(0) & 0xFF) == 2)
    assert((bytes(7) & 0xFF) == Rtmp.TypeSetChunkSize)
    assert(bytes.slice(12, 16).map(_ & 0xFF).toSeq == Seq(0, 0, 0, 48))
    val (dec, stats) = Rtmp.demux(bytes)
    assert(dec.size == 1 && dec.head.payload.length == 100)
    assert(stats.setChunkSize == 1L)
    // 100 bytes at chunk size 48 -> 3 chunks: fmt0 + 2 continuations
    assert((stats.fmt0, stats.fmt3) == (2L, 2L))
  }

  test("the Set Chunk Size declaration is framed at the OLD size " +
      "(§5.4.1: it applies only to later chunks) — a tiny declared " +
      "size must not split the declaration itself") {
    val payload = ("v" * 10).getBytes("US-ASCII")
    val bytes = Rtmp.mux(Seq(RtmpMessage(9, 1L, 9, 0L, payload)),
      chunkSize = 2)
    val (dec, stats) = Rtmp.demux(bytes)
    assert(dec.size == 1 && dec.head.payload.toSeq == payload.toSeq)
    // the 4-byte declaration rides ONE chunk at the default size; the
    // 10-byte message then splits into 5 two-byte chunks
    assert(stats.setChunkSize == 1L)
    assert((stats.fmt0, stats.fmt3) == (2L, 4L))
  }

  test("a caller-supplied mid-stream Set Chunk Size re-frames every " +
      "later chunk on both sides") {
    val scs = {
      val p = new java.io.ByteArrayOutputStream(4)
      p.write(0); p.write(0); p.write(0); p.write(16)
      RtmpMessage(Rtmp.ControlCsid, 0L, Rtmp.TypeSetChunkSize, 0L,
        p.toByteArray)
    }
    val big = ("w" * 64).getBytes("US-ASCII")
    val msgs = Seq(RtmpMessage(9, 1L, 9, 0L, big), scs,
      RtmpMessage(9, 1L, 9, 10L, big))
    val (dec, stats) = Rtmp.demux(Rtmp.mux(msgs))
    // first 64B message: one chunk at 128; after the switch to 16,
    // the second 64B message takes 4 chunks
    assert(dec.size == 2)
    assert(dec.map(_.payload.length) == Seq(64, 64))
    assert(stats.setChunkSize == 1L && stats.fmt3 == 3L)
    // 31-bit maximum is accepted (0x7FFFFFFF, spec §5.4.1)
    val max = {
      val p = new java.io.ByteArrayOutputStream(4)
      p.write(0x7F); p.write(0xFF); p.write(0xFF); p.write(0xFF)
      RtmpMessage(Rtmp.ControlCsid, 0L, Rtmp.TypeSetChunkSize, 0L,
        p.toByteArray)
    }
    val (dec2, _) = Rtmp.demux(Rtmp.mux(Seq(max,
      RtmpMessage(9, 1L, 9, 0L, big))))
    assert(dec2.size == 1 && dec2.head.payload.length == 64)
  }

  test("2- and 3-byte basic headers carry chunk-stream ids 64-319 and " +
      "320-65599") {
    val msgs = Seq(msg(64, 1, "lo2"), msg(319, 2, "hi2"),
      msg(320, 3, "lo3"), msg(65599, 4, "hi3"))
    val bytes = Rtmp.mux(msgs)
    assert((bytes(0) & 0x3F) == 0 && (bytes(1) & 0xFF) == 0)
    val (dec, _) = Rtmp.demux(bytes)
    assert(dec.map(_.csid) == Seq(64, 319, 320, 65599))
  }

  test("framing violations fail loud: truncated body, header on an " +
      "unfinished message, fmt-1 on a virgin chunk stream") {
    val good = Rtmp.mux(Seq(msg(3, 0, "hello")))
    intercept[IllegalArgumentException] {
      Rtmp.demux(good.dropRight(2))
    }
    // a second fmt0 header injected where a continuation belongs
    val split = Rtmp.mux(Seq(RtmpMessage(3, 1L, 9, 0L,
      ("w" * 200).getBytes("US-ASCII"))))
    val hijack = split.take(12 + 128) ++ split.take(12)
    intercept[IllegalArgumentException] { Rtmp.demux(hijack) }
    // fmt1 with nothing to inherit
    val virgin = Array[Byte]((1 << 6 | 3).toByte, 0, 0, 1, 0, 0, 1, 9, 'q')
    intercept[IllegalArgumentException] { Rtmp.demux(virgin) }
  }

  test("property: mux → demux identity on random interleaved streams " +
      "(mixed chunk sizes, payload sizes straddling the chunk size, " +
      "timestamps past 2^24, stream-id changes forcing fmt 0)") {
    val genMsgs: Gen[(Int, List[RtmpMessage])] = for {
      chunkSize <- Gen.oneOf(16, 48, 128, 4096)
      n <- Gen.choose(1, 24)
      msgs <- Gen.listOfN(n, for {
        csid <- Gen.oneOf(3, 4, 6, 64, 320)
        streamId <- Gen.oneOf(1L, 2L)
        typeId <- Gen.oneOf(8, 9, 18)
        ts <- Gen.oneOf(Gen.choose(0L, 1000L),
          Gen.choose(0xFFFFF0L, 0x2000000L))
        len <- Gen.oneOf(Gen.choose(0, 8), Gen.choose(120, 140),
          Gen.choose(250, 260))
        body <- Gen.listOfN(len, Gen.choose(0, 255))
      } yield RtmpMessage(csid, streamId, typeId, ts,
        body.map(_.toByte).toArray))
    } yield (chunkSize, msgs)
    val prop = Prop.forAll(genMsgs) { case (chunkSize, raw) =>
      // per-csid timestamps must be monotone (the mux requires it —
      // RTMP deltas are unsigned); sort within each chunk stream
      val msgs = raw.groupBy(_.csid).toSeq.flatMap { case (_, ms) =>
        ms.sortBy(_.tsMs)
      }
      val (dec, _) = Rtmp.demux(Rtmp.mux(msgs, chunkSize))
      dec.size == msgs.size && dec.zip(msgs).forall { case (a, b) =>
        a.csid == b.csid && a.streamId == b.streamId &&
          a.typeId == b.typeId && a.tsMs == b.tsMs &&
          java.util.Arrays.equals(a.payload, b.payload)
      }
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(60), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: the incremental Dechunker is slicing-invariant — " +
      "ANY partition of the wire bytes into feeds yields exactly the " +
      "batch demux (the live-socket contract: TCP read boundaries " +
      "carry no meaning)") {
    val gen: Gen[(Int, List[RtmpMessage], List[Int])] = for {
      chunkSize <- Gen.oneOf(16, 128)
      n <- Gen.choose(1, 12)
      msgs <- Gen.listOfN(n, for {
        csid <- Gen.oneOf(3, 4, 64)
        typeId <- Gen.oneOf(8, 9)
        // include past-2^24 timestamps so extended-timestamp fields
        // (and their fmt-3 repeats) also straddle feed boundaries
        ts <- Gen.oneOf(Gen.choose(0L, 500L),
          Gen.choose(0xFFFFF0L, 0x2000000L))
        len <- Gen.oneOf(Gen.choose(0, 8), Gen.choose(120, 140))
        body <- Gen.listOfN(len, Gen.choose(0, 255))
      } yield RtmpMessage(csid, 1L, typeId, ts, body.map(_.toByte).toArray))
      cuts <- Gen.listOfN(9, Gen.choose(1, 97))
    } yield (chunkSize, msgs, cuts)
    val prop = Prop.forAll(gen) { case (chunkSize, raw, cuts) =>
      val msgs = raw.groupBy(_.csid).toSeq.flatMap(_._2.sortBy(_.tsMs))
      val bytes = Rtmp.mux(msgs, chunkSize)
      val (want, wantStats) = Rtmp.demux(bytes)
      val d = new Rtmp.Dechunker
      val got = Seq.newBuilder[RtmpMessage]
      var pos = 0
      var ci = 0
      while (pos < bytes.length) {
        val take = math.min(cuts(ci % cuts.size), bytes.length - pos)
        got ++= d.feed(java.util.Arrays.copyOfRange(bytes, pos, pos + take))
        pos += take
        ci += 1
      }
      val g = got.result()
      d.pendingBytes == 0 && !d.midMessage && d.stats == wantStats &&
        g.size == want.size && g.zip(want).forall { case (a, b) =>
          a.csid == b.csid && a.streamId == b.streamId &&
            a.typeId == b.typeId && a.tsMs == b.tsMs &&
            java.util.Arrays.equals(a.payload, b.payload)
        }
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(60), prop)
    assert(res.passed, res.status.toString)
  }
}
