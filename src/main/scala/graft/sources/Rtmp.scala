package graft.sources

import java.io.ByteArrayOutputStream

/** RTMP chunk stream — the WIRE framing under the FLV frame layer,
  * written from the public Adobe "RTMP Specification 1.0" (§5.3
  * "Chunking"). This completes the engine's live-ingest stack: the
  * reference accepts `rtmp://` URLs by handing them to libav
  * (media/container.py:38-116 `InputContainer.open`;
  * inputcontainer.py:85-98 feeds per-track topics), and on the wire
  * those URLs speak exactly this format — RTMP messages whose audio/
  * video type ids (8/9) and payloads are the FLV tag stream
  * ([[Flv]]), split into interleaved chunks with per-chunk-stream
  * header compression.
  *
  * Layout (spec §5.3.1):
  *  - Basic header: fmt(2 bits) | csid. csid 2–63 in 1 byte; 64–319
  *    as `fmt<<6|0` + (csid−64); 320–65599 as `fmt<<6|1` +
  *    (csid−64) little-endian u16. csid 2 is reserved for protocol
  *    control.
  *  - Message header by fmt: Type 0 (11 B) = absolute timestamp u24,
  *    message length u24, message type id u8, message stream id u32
  *    LITTLE-endian; Type 1 (7 B) = timestamp delta u24, length u24,
  *    type id u8 (stream id inherited); Type 2 (3 B) = timestamp
  *    delta u24 only; Type 3 (0 B) = everything inherited — both the
  *    continuation form (later chunks of a split message) and the
  *    compressed-start form (same length, type and delta as the
  *    previous message on the chunk stream).
  *  - Extended timestamp (§5.3.1.3): when the 24-bit field would
  *    overflow, it carries the sentinel 0xFFFFFF and the real value
  *    follows as u32. A Type 3 chunk carries the extended field iff
  *    the most recent Type 0/1/2 header on the same chunk stream did.
  *  - Set Chunk Size (§5.4.1): message type 1 on csid 2, stream 0,
  *    payload u32; applies to every later chunk in the direction.
  *
  * Fmt selection on mux follows the spec's compression ladder: first
  * message on a chunk stream (or a stream-id change) → Type 0;
  * changed length/type → Type 1; changed delta → Type 2; everything
  * equal → Type 3. Per the §5.3.1.2.4 note, a Type 0's timestamp
  * doubles as the implied delta, so a second message whose delta
  * equals the first's absolute timestamp may start at Type 3.
  */
object Rtmp {

  /** Audio/video message type ids equal the FLV tag types. */
  val TypeAudio = 8
  val TypeVideo = 9
  /** Protocol control: Set Chunk Size. */
  val TypeSetChunkSize = 1
  /** Chunk stream id reserved for protocol control messages. */
  val ControlCsid = 2

  val DefaultChunkSize = 128

  /** One assembled RTMP message. */
  final case class RtmpMessage(csid: Int, streamId: Long, typeId: Int,
      tsMs: Long, payload: Array[Byte])

  /** Per-chunk accounting from a demux: chunk counts by header type,
    * extended-timestamp fields seen, and protocol-control messages
    * consumed (not returned as data messages). */
  final case class ChunkStats(fmt0: Long, fmt1: Long, fmt2: Long,
      fmt3: Long, ext: Long, setChunkSize: Long)

  private def u24(out: ByteArrayOutputStream, v: Long): Unit = {
    require(v >= 0 && v <= 0xFFFFFF, s"u24 out of range: $v")
    out.write(((v >> 16) & 0xFF).toInt); out.write(((v >> 8) & 0xFF).toInt)
    out.write((v & 0xFF).toInt)
  }
  private def u32(out: ByteArrayOutputStream, v: Long): Unit = {
    out.write(((v >> 24) & 0xFF).toInt); out.write(((v >> 16) & 0xFF).toInt)
    out.write(((v >> 8) & 0xFF).toInt); out.write((v & 0xFF).toInt)
  }
  private def u32le(out: ByteArrayOutputStream, v: Long): Unit = {
    out.write((v & 0xFF).toInt); out.write(((v >> 8) & 0xFF).toInt)
    out.write(((v >> 16) & 0xFF).toInt); out.write(((v >> 24) & 0xFF).toInt)
  }

  private def basicHeader(out: ByteArrayOutputStream, fmt: Int,
      csid: Int): Unit = {
    require(fmt >= 0 && fmt <= 3, s"fmt $fmt")
    require(csid >= 2 && csid <= 65599, s"csid $csid out of range")
    if (csid <= 63) out.write((fmt << 6) | csid)
    else if (csid <= 319) { out.write(fmt << 6); out.write(csid - 64) }
    else {
      out.write((fmt << 6) | 1)
      out.write((csid - 64) & 0xFF); out.write(((csid - 64) >> 8) & 0xFF)
    }
  }

  /** Per-chunk-stream mux compression state. */
  private final class CsState {
    var streamId: Long = -1L
    var ts: Long = -1L
    var delta: Long = -1L
    var len: Int = -1
    var typeId: Int = -1
    var headerHadExt: Boolean = false
  }

  /** Serialize messages (caller-ordered — interleaving across chunk
    * streams is the caller's timeline) into one RTMP chunk stream.
    * A non-default `chunkSize` is declared up front with a Set Chunk
    * Size control message, exactly as a real ingest does. */
  def mux(msgs: Seq[RtmpMessage], chunkSize: Int = DefaultChunkSize)
      : Array[Byte] = {
    require(chunkSize >= 1 && chunkSize <= 0x7FFFFFFF, s"chunkSize $chunkSize")
    val out = new ByteArrayOutputStream(
      64 + msgs.map(m => m.payload.length + 24).sum)
    val states = scala.collection.mutable.Map.empty[Int, CsState]
    // the chunk size IN EFFECT: a Set Chunk Size message is itself
    // framed at the old size — the declared size applies only to
    // chunks after it (§5.4.1), exactly how the demux switches
    var effChunkSize = DefaultChunkSize
    def writeMessage(m: RtmpMessage): Unit = {
      require(m.csid != ControlCsid || m.typeId == TypeSetChunkSize,
        s"csid 2 is reserved for protocol control, got type ${m.typeId}")
      require(m.tsMs >= 0 && m.tsMs <= 0xFFFFFFFFL, s"timestamp ${m.tsMs}")
      val st = states.getOrElseUpdate(m.csid, new CsState)
      // compression ladder (spec §5.3.1.2): everything-inherited → 3,
      // delta-only → 2, length/type changed → 1, new stream → 0
      val fmt =
        if (st.streamId != m.streamId || st.ts < 0 || m.tsMs < st.ts) 0
        else if (m.payload.length != st.len || m.typeId != st.typeId) 1
        else if (m.tsMs - st.ts != st.delta) 2
        else 3
      val tsField = if (fmt == 0) m.tsMs else m.tsMs - st.ts
      val ext = fmt != 3 && tsField >= 0xFFFFFF
      basicHeader(out, fmt, m.csid)
      if (fmt <= 2) u24(out, if (ext) 0xFFFFFF else tsField)
      if (fmt <= 1) {
        u24(out, m.payload.length.toLong); out.write(m.typeId)
      }
      if (fmt == 0) u32le(out, m.streamId)
      if (fmt <= 2) st.headerHadExt = ext
      if (ext) u32(out, tsField)
      else if (fmt == 3 && st.headerHadExt) u32(out, tsField)
      // first chunk carries min(len, effChunkSize) payload bytes, the
      // rest continues in fmt-3 chunks on the same chunk stream
      var off = math.min(m.payload.length, effChunkSize)
      out.write(m.payload, 0, off)
      while (off < m.payload.length) {
        basicHeader(out, 3, m.csid)
        // §5.3.1.3: fmt-3 carries the extended field iff the most
        // recent fmt-0/1/2 header on this chunk stream did
        if (st.headerHadExt) u32(out, tsField)
        val n = math.min(m.payload.length - off, effChunkSize)
        out.write(m.payload, off, n)
        off += n
      }
      // delta bookkeeping: after a Type 0 the absolute timestamp
      // doubles as the implied delta (§5.3.1.2.4 note); 1/2 record
      // the real delta; 3 inherits
      if (fmt == 0) st.delta = m.tsMs
      else if (fmt <= 2) st.delta = tsField
      st.streamId = m.streamId; st.ts = m.tsMs
      st.len = m.payload.length; st.typeId = m.typeId
      // a Set Chunk Size takes effect AFTER its own chunks — whether
      // the leading declaration or a caller-supplied mid-stream one
      if (m.typeId == TypeSetChunkSize) {
        require(m.payload.length == 4, "Set Chunk Size payload must be u32")
        val cs = ((m.payload(0) & 0xFFL) << 24) |
          ((m.payload(1) & 0xFFL) << 16) |
          ((m.payload(2) & 0xFFL) << 8) | (m.payload(3) & 0xFFL)
        require(cs >= 1 && cs <= 0x7FFFFFFF, s"chunk size $cs out of range")
        effChunkSize = cs.toInt
      }
    }
    if (chunkSize != DefaultChunkSize) {
      val p = new ByteArrayOutputStream(4); u32(p, chunkSize.toLong)
      writeMessage(RtmpMessage(ControlCsid, 0L, TypeSetChunkSize, 0L,
        p.toByteArray))
    }
    msgs.foreach(writeMessage)
    out.toByteArray
  }

  private def rdU24(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xFFL) << 16) | ((b(off + 1) & 0xFFL) << 8) | (b(off + 2) & 0xFFL)
  private def rdU32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xFFL) << 24) | ((b(off + 1) & 0xFFL) << 16) |
      ((b(off + 2) & 0xFFL) << 8) | (b(off + 3) & 0xFFL)
  private def rdU32le(b: Array[Byte], off: Int): Long =
    (b(off) & 0xFFL) | ((b(off + 1) & 0xFFL) << 8) |
      ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)

  /** Per-chunk-stream demux assembly state. */
  private final class AsmState {
    var streamId: Long = -1L
    var ts: Long = -1L
    var delta: Long = -1L
    var len: Int = -1
    var typeId: Int = -1
    var headerHadExt: Boolean = false
    var buf: ByteArrayOutputStream = null // non-null = mid-message
    var remaining: Int = 0
  }

  /** INCREMENTAL chunk-stream parser — the live-socket form of
    * [[demux]]: feed bytes as they arrive off the wire; each feed
    * returns every message the new bytes completed. A chunk is
    * consumed only when it is entirely buffered (chunks are at most
    * `chunkSize` + header bytes, so the holdback is bounded); partial
    * trailing bytes wait for the next feed. Framing violations (a
    * new-message header on an unfinished message, fmt 1/2/3 on a
    * virgin chunk stream, bad Set Chunk Size) fail loud exactly as in
    * batch [[demux]] — only INCOMPLETENESS waits. */
  final class Dechunker {
    private val states = scala.collection.mutable.Map.empty[Int, AsmState]
    private var chunkSize = DefaultChunkSize
    private var fmt0 = 0L; private var fmt1 = 0L
    private var fmt2 = 0L; private var fmt3 = 0L
    private var extN = 0L; private var setCs = 0L
    // growable holdback buffer with a consumed pointer: appending is
    // amortized O(1) and compaction runs only when the consumed
    // prefix dominates, so a chunk larger than the socket read size
    // (a peer may Set Chunk Size into the megabytes) costs O(chunk)
    // total instead of re-copying the whole prefix on every feed
    private var buf: Array[Byte] = Array.emptyByteArray
    private var bufStart = 0
    private var bufEnd = 0

    /** Unparsed trailing bytes held back for the next feed. */
    def pendingBytes: Int = bufEnd - bufStart

    /** True while some chunk stream is mid-message. */
    def midMessage: Boolean = states.valuesIterator.exists(_.buf != null)

    def unfinished: Seq[(Int, Int)] = states.iterator
      .filter(_._2.buf != null).map { case (c, st) => (c, st.remaining) }
      .toSeq

    def stats: ChunkStats = ChunkStats(fmt0, fmt1, fmt2, fmt3, extN, setCs)

    /** Parse ONE whole chunk at `pos0` (bounded by `end`) if fully
      * buffered: returns the new position, appending any completed
      * message; returns -1 when more bytes are needed (no state was
      * touched). */
    private def parseChunk(bytes: Array[Byte], pos0: Int, end: Int,
        msgs: scala.collection.mutable.Builder[RtmpMessage, Seq[RtmpMessage]])
        : Int = {
      var pos = pos0
      if (pos >= end) return -1
      val b0 = bytes(pos) & 0xFF
      val fmt = b0 >> 6
      var csid = b0 & 0x3F
      pos += 1
      if (csid == 0) {
        if (pos >= end) return -1
        csid = 64 + (bytes(pos) & 0xFF); pos += 1
      } else if (csid == 1) {
        if (pos + 1 >= end) return -1
        csid = 64 + (bytes(pos) & 0xFF) + ((bytes(pos + 1) & 0xFF) << 8)
        pos += 2
      }
      val st = states.getOrElseUpdate(csid, new AsmState)
      val continuation = fmt == 3 && st.buf != null
      // ---- phase 1: read every header field into locals (no state
      // mutation), returning -1 on any incompleteness
      var tsField = st.delta
      var lenField = st.len
      var typeField = st.typeId
      var streamField = st.streamId
      var extSeen = false
      if (!continuation) {
        require(st.buf == null,
          s"new message header (fmt $fmt) on csid $csid with " +
            s"${st.remaining} bytes of an unfinished message")
        require(fmt == 0 || st.ts >= 0,
          s"fmt $fmt chunk on virgin csid $csid has nothing to inherit")
        if (fmt <= 2) {
          if (pos + 3 > end) return -1
          tsField = rdU24(bytes, pos); pos += 3
        }
        if (fmt <= 1) {
          if (pos + 4 > end) return -1
          lenField = rdU24(bytes, pos).toInt
          typeField = bytes(pos + 3) & 0xFF
          pos += 4
        }
        if (fmt == 0) {
          if (pos + 4 > end) return -1
          streamField = rdU32le(bytes, pos); pos += 4
        }
        extSeen = (fmt <= 2 && tsField == 0xFFFFFF) ||
          (fmt == 3 && st.headerHadExt)
        if (extSeen) {
          if (pos + 4 > end) return -1
          tsField = rdU32(bytes, pos); pos += 4
        }
        require(lenField >= 0, s"csid $csid message with no length")
      } else {
        // continuation of a split message (§5.3.2.2): repeated ext field
        extSeen = st.headerHadExt
        if (extSeen) {
          if (pos + 4 > end) return -1
          pos += 4
        }
      }
      val bodyRemaining = if (continuation) st.remaining else lenField
      val n = math.min(bodyRemaining, chunkSize)
      if (pos + n > end) return -1
      // ---- phase 2: the whole chunk is buffered — commit state
      if (!continuation) {
        st.len = lenField
        st.typeId = typeField
        st.streamId = streamField
        // extSeen for fmt <= 2 is precisely "the 24-bit field carried
        // the 0xFFFFFF sentinel"; a fmt-3 start inherits the flag
        if (fmt <= 2) st.headerHadExt = extSeen
        st.ts = if (fmt == 0) tsField else st.ts + tsField
        st.delta = tsField // fmt 0: absolute doubles as implied delta
        st.buf = new ByteArrayOutputStream(st.len)
        st.remaining = st.len
      }
      if (extSeen) extN += 1
      fmt match {
        case 0 => fmt0 += 1; case 1 => fmt1 += 1
        case 2 => fmt2 += 1; case _ => fmt3 += 1
      }
      st.buf.write(bytes, pos, n)
      pos += n
      st.remaining -= n
      if (st.remaining == 0) {
        val payload = st.buf.toByteArray
        st.buf = null
        if (st.typeId == TypeSetChunkSize) {
          require(payload.length == 4, "Set Chunk Size payload must be u32")
          val cs = rdU32(payload, 0)
          require(cs >= 1 && cs <= 0x7FFFFFFF, s"chunk size $cs out of range")
          chunkSize = cs.toInt
          setCs += 1
        } else {
          msgs += RtmpMessage(csid, st.streamId, st.typeId, st.ts, payload)
        }
      }
      pos
    }

    def feed(data: Array[Byte]): Seq[RtmpMessage] = {
      // append (grow ×2 when needed; compact the consumed prefix
      // first when it dominates the buffer)
      if (bufEnd + data.length > buf.length) {
        if (bufStart > 0 && (bufEnd - bufStart) <= buf.length / 2 &&
            bufEnd - bufStart + data.length <= buf.length) {
          System.arraycopy(buf, bufStart, buf, 0, bufEnd - bufStart)
          bufEnd -= bufStart; bufStart = 0
        } else {
          val need = bufEnd - bufStart + data.length
          val grown = new Array[Byte](math.max(need, buf.length * 2))
          System.arraycopy(buf, bufStart, grown, 0, bufEnd - bufStart)
          buf = grown; bufEnd -= bufStart; bufStart = 0
        }
      }
      System.arraycopy(data, 0, buf, bufEnd, data.length)
      bufEnd += data.length
      val msgs = Seq.newBuilder[RtmpMessage]
      var np = parseChunkIn(msgs)
      while (np >= 0) { bufStart = np; np = parseChunkIn(msgs) }
      if (bufStart == bufEnd) { bufStart = 0; bufEnd = 0 }
      msgs.result()
    }

    /** [[parseChunk]] against the internal (buf, bufStart, bufEnd)
      * window — bounds are checked against bufEnd, positions returned
      * as absolute buf indices. */
    private def parseChunkIn(
        msgs: scala.collection.mutable.Builder[RtmpMessage, Seq[RtmpMessage]])
        : Int = parseChunk(buf, bufStart, bufEnd, msgs)
  }

  /** Parse an RTMP chunk stream back into assembled messages.
    * Processes Set Chunk Size control messages in-stream (they apply
    * to every later chunk and are consumed, not returned). Validates
    * chunk framing: a new-message header on a chunk stream with an
    * unfinished message, a fmt-1/2/3 chunk on a virgin chunk stream,
    * or a truncated chunk all fail loud. (Batch form of [[Dechunker]]:
    * one feed, then completeness is REQUIRED rather than waited on.) */
  def demux(bytes: Array[Byte]): (Seq[RtmpMessage], ChunkStats) = {
    val d = new Dechunker
    val msgs = d.feed(bytes)
    require(!d.midMessage, d.unfinished.map { case (csid, rem) =>
      s"stream ended with $rem bytes missing on csid $csid" }.mkString("; "))
    require(d.pendingBytes == 0,
      s"truncated chunk: ${d.pendingBytes} unparsed trailing bytes")
    (msgs, d.stats)
  }

  // ---- handshake (spec §5.2) ------------------------------------------------
  // C0/S0 = version byte 3; C1/S1 = 1536 bytes (u32 time, u32 zero,
  // 1528 bytes the peer must echo); C2 echoes S1, S2 echoes C1. The
  // echo is the whole point of the exchange — both helpers verify it.

  val HandshakeLen = 1536

  private def readFully(in: java.io.InputStream, n: Int): Array[Byte] = {
    val b = new Array[Byte](n)
    var got = 0
    while (got < n) {
      val r = in.read(b, got, n - got)
      require(r >= 0, s"rtmp handshake: peer closed after $got/$n bytes")
      got += r
    }
    b
  }

  /** Client side: send C0+C1, expect S0+S1+S2 (S2 echoing C1), send
    * C2 echoing S1. Deterministic: C1's random block is zeros. */
  def clientHandshake(in: java.io.InputStream,
      out: java.io.OutputStream): Unit = {
    val c1 = new Array[Byte](HandshakeLen)
    out.write(3); out.write(c1); out.flush()
    val s0 = in.read()
    require(s0 == 3, s"rtmp handshake: server version $s0")
    val s1 = readFully(in, HandshakeLen)
    val s2 = readFully(in, HandshakeLen)
    require(java.util.Arrays.equals(s2, c1),
      "rtmp handshake: S2 does not echo C1")
    out.write(s1); out.flush() // C2
  }

  /** Server side: expect C0+C1, send S0+S1+S2 (S2 echoing C1), expect
    * C2 echoing S1. */
  def serverHandshake(in: java.io.InputStream,
      out: java.io.OutputStream): Unit = {
    val c0 = in.read()
    require(c0 == 3, s"rtmp handshake: client version $c0")
    val c1 = readFully(in, HandshakeLen)
    val s1 = new Array[Byte](HandshakeLen)
    out.write(3); out.write(s1); out.write(c1); out.flush()
    val c2 = readFully(in, HandshakeLen)
    require(java.util.Arrays.equals(c2, s1),
      "rtmp handshake: C2 does not echo S1")
  }
}
