package graft.sources

import graft.sources.Flac.{BitReader, BitWriter}
import java.io.ByteArrayOutputStream

/** MPEG-4 Part 2 Visual ELEMENTARY-STREAM indexer (ISO/IEC 14496-2
  * §6.2) — the structural layer for the last video codec the
  * reference names without one (its basic A/V container test pairs
  * `mpeg4` video with AAC,
  * /root/reference/tests/media/test_containers.py:20, decoded through
  * libav in media/codec.py:50-135): the start-code walk and header
  * layer that a curation pipeline needs from real .m4v/DivX/Xvid
  * elementary streams — resolution, profile, VOP types and timing —
  * the [[H264]] NAL-layer contract for the earlier codec generation.
  *
  * NORMATIVE here (§6.2 syntax, simple-profile rectangular subset):
  *  - start codes 00 00 01 xx: VOS B0 (+ profile_and_level), VO B5
  *    (visual_object_type), video_object 00–1F, VOL 20–2F, VOP B6,
  *    VOS end B1;
  *  - the VOL header through the tool flags: random_accessible,
  *    video_object_type_indication, aspect_ratio_info (incl. the
  *    extended 15 form), vol_control_parameters with chroma_format /
  *    low_delay, shape (RECTANGULAR only — loud otherwise), the
  *    MARKER BITS the syntax salts between fields (each verified),
  *    vop_time_increment_resolution(16) and the DERIVED
  *    time-increment field width ceil(log2(res)), fixed_vop_rate,
  *    width/height (13), interlaced/obmc/sprite/not_8_bit/
  *    quant_type/complexity/resync/data_partitioned/scalability
  *    flags (the non-simple tools must be OFF — loud);
  *  - VOP headers: vop_coding_type (I/P — B/S loud), modulo_time_base
  *    (unary 1s + 0), vop_time_increment at the VOL-derived width,
  *    vop_coded, intra_dc_vlc_thr(3), vop_quant(5), fcode_forward(3)
  *    for P;
  *  - next_start_code() stuffing: a zero bit then ONES to the byte
  *    boundary (§5.2.3 — the exact dual of H.264's trailing form),
  *    verified on read.
  *
  * Macroblock data rides OPAQUE between a VOP header and the next
  * start code (the indexing contract, like [[AudioIndex]] payloads);
  * payload bytes must avoid start-code emulation (no 00 00 0x runs —
  * caller's responsibility, verified at mux). */
object Mpeg4P2 {

  val VosStart = 0xB0
  val VosEnd = 0xB1
  val VisualObject = 0xB5
  val VopCode = 0xB6

  final case class Vol(profileLevel: Int, videoObjectId: Int,
      volId: Int, randomAccessible: Boolean, typeIndication: Int,
      aspectRatio: Int, aspectExt: Option[(Int, Int)],
      chromaLowDelay: Option[(Int, Boolean)],
      timeIncrementResolution: Int, fixedVopRate: Option[Int],
      width: Int, height: Int, quantType: Boolean) {
    require(profileLevel >= 0 && profileLevel < 256, "m4v: profile")
    require(videoObjectId >= 0 && videoObjectId < 32, "m4v: VO id")
    require(volId >= 0x20 && volId < 0x30, "m4v: VOL start code")
    require(typeIndication >= 0 && typeIndication < 256, "m4v: voti")
    require(aspectRatio >= 1 && aspectRatio < 16, "m4v: aspect")
    require((aspectRatio == 15) == aspectExt.isDefined,
      "m4v: extended_PAR carries width/height exactly when code 15")
    require(aspectExt.forall { case (w, h) =>
      w >= 1 && w < 256 && h >= 1 && h < 256 }, "m4v: par bytes")
    require(chromaLowDelay.forall(_._1 == 1),
      "m4v: chroma_format must be 4:2:0 (01)")
    require(timeIncrementResolution >= 1 &&
      timeIncrementResolution < 65536, "m4v: time resolution")
    require(fixedVopRate.forall(v => v >= 1 &&
      v < timeIncrementResolution), "m4v: fixed increment range")
    require(width >= 1 && width < 8192 && height >= 1 && height < 8192,
      "m4v: 13-bit dimensions")
    /** ceil(log2(res)) with the spec's minimum of 1 bit. */
    def incBits: Int = {
      var b = 1
      while ((1 << b) < timeIncrementResolution) b += 1
      b
    }
  }

  /** One VOP: coding type 0 = I, 1 = P (B/S out of scope, loud),
    * `moduloBase` = the number of modulo_time_base '1' bits,
    * `payload` = the opaque macroblock region. */
  final case class Vop(codingType: Int, moduloBase: Int,
      timeIncrement: Int, intraDcVlcThr: Int, quant: Int,
      fcodeForward: Int, payload: Array[Byte]) {
    require(codingType == 0 || codingType == 1,
      "m4v: B/S VOPs are out of this leg's scope")
    require(moduloBase >= 0 && moduloBase < 16, "m4v: modulo base")
    require(intraDcVlcThr >= 0 && intraDcVlcThr < 8, "m4v: dc thr")
    require(quant >= 1 && quant < 32, "m4v: vop_quant is 5 bits, >= 1")
    require(codingType == 1 || fcodeForward == 0,
      "m4v: fcode_forward is P-only")
    require(codingType == 0 || (fcodeForward >= 1 && fcodeForward < 8),
      "m4v: P needs fcode_forward in 1..7")
  }

  private def startCode(out: ByteArrayOutputStream, code: Int): Unit = {
    out.write(0); out.write(0); out.write(1); out.write(code)
  }

  /** §5.2.3 next_start_code(): '0' then ones to the byte boundary. */
  private def stuff(w: BitWriter): Unit = {
    w.writeBits(0L, 1)
    while (w.pendingBits != 0) w.writeBits(1L, 1)
  }
  private def unstuff(r: BitReader, what: String): Unit = {
    require(r.readBits(1) == 0L, s"m4v: $what stuffing must start 0")
    while (r.bitPos % 8 != 0)
      require(r.readBits(1) == 1L, s"m4v: $what stuffing bits must be 1")
  }

  /** Mux one visual-object sequence: VOS + VO + VOL headers, the
    * VOPs, VOS end. */
  def mux(vol: Vol, vops: Seq[Vop]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    startCode(out, VosStart)
    out.write(vol.profileLevel)
    startCode(out, VisualObject)
    val wv = new BitWriter
    wv.writeBits(0L, 1) // is_visual_object_identifier
    wv.writeBits(1L, 4) // visual_object_type = video
    wv.writeBits(0L, 1) // video_signal_type
    stuff(wv)
    out.write(wv.toBytes)
    startCode(out, vol.videoObjectId)
    startCode(out, vol.volId)
    val w = new BitWriter
    w.writeBits(if (vol.randomAccessible) 1L else 0L, 1)
    w.writeBits(vol.typeIndication.toLong, 8)
    w.writeBits(0L, 1) // is_object_layer_identifier
    w.writeBits(vol.aspectRatio.toLong, 4)
    vol.aspectExt.foreach { case (pw, ph) =>
      w.writeBits(pw.toLong, 8); w.writeBits(ph.toLong, 8)
    }
    vol.chromaLowDelay match {
      case Some((cf, ld)) =>
        w.writeBits(1L, 1) // vol_control_parameters
        w.writeBits(cf.toLong, 2)
        w.writeBits(if (ld) 1L else 0L, 1)
        w.writeBits(0L, 1) // vbv_parameters
      case None => w.writeBits(0L, 1)
    }
    w.writeBits(0L, 2) // shape: rectangular
    w.writeBits(1L, 1) // marker
    w.writeBits(vol.timeIncrementResolution.toLong, 16)
    w.writeBits(1L, 1) // marker
    vol.fixedVopRate match {
      case Some(inc) =>
        w.writeBits(1L, 1)
        w.writeBits(inc.toLong, vol.incBits)
      case None => w.writeBits(0L, 1)
    }
    w.writeBits(1L, 1) // marker
    w.writeBits(vol.width.toLong, 13)
    w.writeBits(1L, 1) // marker
    w.writeBits(vol.height.toLong, 13)
    w.writeBits(1L, 1) // marker
    w.writeBits(0L, 1) // interlaced
    w.writeBits(1L, 1) // obmc_disable (simple profile: no OBMC)
    w.writeBits(0L, 1) // sprite_enable
    w.writeBits(0L, 1) // not_8_bit
    w.writeBits(if (vol.quantType) 1L else 0L, 1)
    w.writeBits(1L, 1) // complexity_estimation_disable
    w.writeBits(1L, 1) // resync_marker_disable
    w.writeBits(0L, 1) // data_partitioned
    w.writeBits(0L, 1) // scalability
    stuff(w)
    out.write(w.toBytes)
    vops.foreach { v =>
      startCode(out, VopCode)
      val wp = new BitWriter
      wp.writeBits(v.codingType.toLong, 2)
      (0 until v.moduloBase).foreach(_ => wp.writeBits(1L, 1))
      wp.writeBits(0L, 1)
      wp.writeBits(1L, 1) // marker
      require(v.timeIncrement < vol.timeIncrementResolution,
        "m4v: time increment beyond the VOL resolution")
      wp.writeBits(v.timeIncrement.toLong, vol.incBits)
      wp.writeBits(1L, 1) // marker
      wp.writeBits(1L, 1) // vop_coded
      if (v.codingType == 1) wp.writeBits(0L, 1) // rounding_type
      wp.writeBits(v.intraDcVlcThr.toLong, 3)
      wp.writeBits(v.quant.toLong, 5)
      if (v.codingType == 1) wp.writeBits(v.fcodeForward.toLong, 3)
      stuff(wp)
      out.write(wp.toBytes)
      // opaque macroblock region — must not emulate a start code
      var zeros = 0
      v.payload.foreach { b =>
        if ((b & 0xff) == 0) zeros += 1
        else {
          require(zeros < 2 || (b & 0xff) > 3,
            "m4v: payload emulates a start-code prefix")
          zeros = 0
        }
        out.write(b & 0xff)
      }
      require(zeros < 2, "m4v: payload ends in a start-code prefix")
    }
    startCode(out, VosEnd)
    out.toByteArray
  }

  /** Walk a stream back: the VOL header and every VOP with its byte
    * offset and opaque payload; every marker, stuffing run, subset
    * flag and start code verified loudly. */
  def demux(bytes: Array[Byte]): (Vol, Seq[(Long, Vop)]) = {
    def code(at: Int): Int = {
      require(at + 4 <= bytes.length, s"m4v: truncated start code at $at")
      require(bytes(at) == 0 && bytes(at + 1) == 0 && bytes(at + 2) == 1,
        s"m4v: lost start-code prefix at $at")
      bytes(at + 3) & 0xff
    }
    def nextStart(from: Int): Int = {
      var i = from
      while (i + 3 <= bytes.length &&
        !(bytes(i) == 0 && bytes(i + 1) == 0 && bytes(i + 2) == 1))
        i += 1
      require(i + 3 <= bytes.length, "m4v: missing closing start code")
      i
    }
    require(code(0) == VosStart, "m4v: stream must open with VOS")
    val profileLevel = bytes(4) & 0xff
    require(code(5) == VisualObject, "m4v: expected visual_object")
    val rv = new BitReader(bytes, 9, bytes.length)
    require(rv.readBits(1) == 0L, "m4v: visual_object_identifier unsupported")
    require(rv.readBits(4) == 1L, "m4v: visual_object_type must be video")
    require(rv.readBits(1) == 0L, "m4v: video_signal_type unsupported")
    unstuff(rv, "visual_object")
    var pos = (rv.bitPos / 8).toInt
    val voId = code(pos)
    require(voId < 0x20, s"m4v: video_object start code, got $voId")
    pos += 4
    val volId = code(pos)
    require(volId >= 0x20 && volId < 0x30, s"m4v: VOL start code $volId")
    pos += 4
    val r = new BitReader(bytes, pos, bytes.length)
    val ra = r.readBits(1) == 1L
    val voti = r.readBits(8).toInt
    require(r.readBits(1) == 0L, "m4v: object_layer_identifier unsupported")
    val aspect = r.readBits(4).toInt
    require(aspect >= 1, "m4v: forbidden aspect_ratio_info 0")
    val aspectExt = if (aspect == 15)
      Some((r.readBits(8).toInt, r.readBits(8).toInt)) else None
    val vcp = if (r.readBits(1) == 1L) {
      val cf = r.readBits(2).toInt
      require(cf == 1, "m4v: chroma_format must be 4:2:0")
      val ld = r.readBits(1) == 1L
      require(r.readBits(1) == 0L, "m4v: vbv_parameters unsupported")
      Some((cf, ld))
    } else None
    require(r.readBits(2) == 0L, "m4v: only RECTANGULAR shape decodes here")
    require(r.readBits(1) == 1L, "m4v: marker before time resolution")
    val res = r.readBits(16).toInt
    require(res >= 1, "m4v: zero time resolution")
    require(r.readBits(1) == 1L, "m4v: marker after time resolution")
    var incBits = 1
    while ((1 << incBits) < res) incBits += 1
    val fixed = if (r.readBits(1) == 1L)
      Some(r.readBits(incBits).toInt) else None
    require(r.readBits(1) == 1L, "m4v: marker before width")
    val width = r.readBits(13).toInt
    require(r.readBits(1) == 1L, "m4v: marker after width")
    val height = r.readBits(13).toInt
    require(r.readBits(1) == 1L, "m4v: marker after height")
    require(r.readBits(1) == 0L, "m4v: interlaced unsupported")
    require(r.readBits(1) == 1L, "m4v: obmc must be disabled")
    require(r.readBits(1) == 0L, "m4v: sprites unsupported")
    require(r.readBits(1) == 0L, "m4v: not_8_bit unsupported")
    val quantType = r.readBits(1) == 1L
    require(r.readBits(1) == 1L, "m4v: complexity estimation must be off")
    require(r.readBits(1) == 1L, "m4v: resync markers must be off")
    require(r.readBits(1) == 0L, "m4v: data partitioning unsupported")
    require(r.readBits(1) == 0L, "m4v: scalability unsupported")
    unstuff(r, "VOL")
    val vol = Vol(profileLevel, voId, volId, ra, voti, aspect,
      aspectExt, vcp, res, fixed, width, height, quantType)
    pos = (r.bitPos / 8).toInt
    val vops = Seq.newBuilder[(Long, Vop)]
    while (code(pos) == VopCode) {
      val at = pos
      val rp = new BitReader(bytes, pos + 4, bytes.length)
      val ct = rp.readBits(2).toInt
      require(ct <= 1, s"m4v: B/S VOP at $pos out of this leg's scope")
      var mb = 0
      while (rp.readBits(1) == 1L) { mb += 1; require(mb < 16, "m4v: modulo") }
      require(rp.readBits(1) == 1L, "m4v: marker before time increment")
      val inc = rp.readBits(vol.incBits).toInt
      require(inc < res, s"m4v: time increment $inc beyond $res")
      require(rp.readBits(1) == 1L, "m4v: marker after time increment")
      require(rp.readBits(1) == 1L, "m4v: vop_coded = 0 unsupported")
      if (ct == 1) require(rp.readBits(1) == 0L,
        "m4v: rounding_type must be 0 here")
      val thr = rp.readBits(3).toInt
      val quant = rp.readBits(5).toInt
      val fcode = if (ct == 1) rp.readBits(3).toInt else 0
      if (ct == 1) require(fcode >= 1, "m4v: forbidden fcode 0")
      unstuff(rp, "VOP")
      val payloadStart = (rp.bitPos / 8).toInt
      val end = nextStart(payloadStart)
      val payload = java.util.Arrays.copyOfRange(bytes, payloadStart, end)
      vops += ((at.toLong, Vop(ct, mb, inc, thr, quant, fcode, payload)))
      pos = end
    }
    require(code(pos) == VosEnd, "m4v: stream must close with VOS end")
    require(pos + 4 == bytes.length, "m4v: trailing bytes after VOS end")
    (vol, vops.result())
  }
}
