package graft

import graft.functions.{CodecProfileJson, Vp8, Vp8ProfileJson}
import graft.sources.{Aac, AudioIndex, H264, Ivf, Mp2, Mp3}
import java.nio.file.{Files, Paths}

/** User-facing decode CLI — the reachable end of EVERY table-
  * injection seam: someone holding the published appendix tables
  * (RFC 6386's probability tables, ISO/IEC 11172-3's audio tables,
  * ISO/IEC 13818-7's AAC codebooks, ITU-T H.264's CAVLC codewords)
  * decodes a real file without recompiling. Matches the decode
  * surface of the reference's libav binding
  * (streamtasks/media/codec.py:50-135) at the structural level.
  *
  * {{{
  * // dump an editable stand-in table set (family: vp8 mp2 mp3 aac h264)
  * runMain graft.RunDecode dump-standin <family> <out.json>
  * runMain graft.RunDecode dump-standin <out.json>          // legacy = vp8
  *
  * // decode with a profile ("standin" = the built-in tables)
  * runMain graft.RunDecode vp8  <profile.json|standin> <in.ivf|.webm> <outDir>
  * runMain graft.RunDecode mp2  <profile.json|standin> <in.mp2> <outDir>
  * runMain graft.RunDecode mp3  <profile.json|standin> <in.mp3> <outDir>
  * runMain graft.RunDecode aac  <profile.json|standin> <in.aac> <outDir>
  * runMain graft.RunDecode h264 <profile.json|standin> <in.h264> <outDir>
  * runMain graft.RunDecode <profile.json|standin> <in.ivf> <outDir> // legacy
  * }}}
  *
  * Every family writes `frames.jsonl` (one line per decoded unit with
  * its load-bearing numbers) to `outDir`; vp8 additionally writes
  * `frame0.pgm`. Failures are loud and named — the first real-file
  * attempt under injected tables fails in a specific place, not with
  * garbage output. */
object RunDecode {

  def main(args: Array[String]): Unit = args.toSeq match {
    case Seq("dump-standin", out) => dumpStandin("vp8", out)
    case Seq("dump-standin", family, out) => dumpStandin(family, out)
    case Seq(family, profileArg, input, outDir)
        if Set("vp8", "mp2", "mp3", "aac", "h264")(family) =>
      run(family, profileArg, input, outDir)
    case Seq(profileArg, input, outDir) =>
      run("vp8", profileArg, input, outDir) // legacy 3-arg = vp8
    case _ =>
      System.err.println(
        "usage: RunDecode dump-standin [vp8|mp2|mp3|aac|h264] <out.json>" +
          "\n   or: RunDecode <family> <profile.json|standin> <input> " +
          "<outDir>")
      sys.exit(2)
  }

  private def dumpStandin(family: String, out: String): Unit = {
    val json = family match {
      case "vp8" => Vp8ProfileJson.render(Vp8.Profile.StandIn)
      case "mp2" => CodecProfileJson.renderMp2(Mp2.Profile.StandIn)
      case "mp3" => CodecProfileJson.renderMp3(Mp3.Profile.StandIn)
      case "aac" => CodecProfileJson.renderAac(Aac.Profile.StandIn)
      case "h264" => CodecProfileJson.renderH264(H264.Profile.StandIn)
      case other => sys.error(s"RunDecode: unknown family $other")
    }
    Files.write(Paths.get(out), json.getBytes("UTF-8"))
    println(s"""{"family":"$family","dumped":"$out"}""")
  }

  private def run(family: String, profileArg: String, input: String,
      outDir: String): Unit = {
    val bytes = Files.readAllBytes(Paths.get(input))
    Files.createDirectories(Paths.get(outDir))
    def profJson: Option[String] =
      if (profileArg == "standin") None
      else Some(new String(
        Files.readAllBytes(Paths.get(profileArg)), "UTF-8"))
    family match {
      case "vp8" => runVp8(profJson, bytes, outDir)
      case "mp2" => runMp2(profJson, bytes, outDir)
      case "mp3" => runMp3(profJson, bytes, outDir)
      case "aac" => runAac(profJson, bytes, outDir)
      case "h264" => runH264(profJson, bytes, outDir)
    }
  }

  private def writeLines(outDir: String, lines: Seq[String]): Unit =
    Files.write(Paths.get(outDir, "frames.jsonl"),
      (lines.mkString("\n") + "\n").getBytes("UTF-8"))

  // ---- VP8 (IVF / WebM), pixel-exact --------------------------------------

  private def runVp8(profJson: Option[String], bytes: Array[Byte],
      outDir: String): Unit = {
    val profile = profJson.map(Vp8ProfileJson.parse(_))
      .getOrElse(Vp8.Profile.StandIn)
    val looksWebm = bytes.length >= 4 && (bytes(0) & 0xff) == 0x1A &&
      (bytes(1) & 0xff) == 0x45
    val payloads: Seq[Array[Byte]] =
      if (looksWebm) {
        val (tracks, blocks) = graft.sources.Mkv.demux(bytes)
        val video = tracks.find(_.codecId == "V_VP8").getOrElse(
          sys.error("RunDecode: no V_VP8 track in the container"))
        val vBlocks = blocks.filter(_.track == video.number)
        vBlocks.foreach { b =>
          require(Ivf.parseVp8Tag(b.payload).keyframe == b.keyframe,
            "RunDecode: container keyframe flag disagrees with the " +
              "payload's frame_type bit")
        }
        vBlocks.map(_.payload)
      } else {
        val (hdr, frames) = Ivf.demux(bytes)
        require(hdr.fourcc == "VP80",
          s"RunDecode: ${hdr.fourcc} is not a VP8 IVF stream")
        frames.map(_._2.payload)
      }
    val cx = new Vp8.Ctx(profile)
    val decoded = Vp8.decodeStream(payloads, ctx = cx)
    val lines = decoded.zipWithIndex.map { case (f, i) =>
      val luma = f.y.iterator.map(_.toLong).sum
      val chroma = f.u.iterator.map(_.toLong).sum +
        f.v.iterator.map(_.toLong).sum
      s"""{"frame":$i,"keyframe":${f.keyframe},"width":${f.width},""" +
        s""""height":${f.height},"luma_sum":$luma,""" +
        s""""chroma_sum":$chroma}"""
    }
    writeLines(outDir, lines)
    val f0 = decoded.head
    val pgm = new java.io.ByteArrayOutputStream()
    pgm.write(s"P5\n${f0.width} ${f0.height}\n255\n".getBytes("US-ASCII"))
    f0.y.foreach(p => pgm.write(p))
    Files.write(Paths.get(outDir, "frame0.pgm"), pgm.toByteArray)
    println(s"""{"family":"vp8","frames":${decoded.length},""" +
      s""""width":${f0.width},"height":${f0.height},"out":"$outDir"}""")
  }

  // ---- MP2 (Layer II mono elementary stream) → synthesis PCM --------------

  private def runMp2(profJson: Option[String], bytes: Array[Byte],
      outDir: String): Unit = {
    val p = profJson.map(CodecProfileJson.parseMp2(_))
      .getOrElse(Mp2.Profile.StandIn)
    val frames = Mp2.demux(bytes, p)
    val synth = new Mp2.Synth(p.window)
    val lines = frames.map { case (off, f) =>
      val alloc = f.subs.map(_.q.toLong).sum
      val sfSum = f.subs.iterator.flatMap(_.sf).map(_.toLong).sum
      var pcmSum = 0L
      var pcmAbs = 0L
      var t = 0
      while (t < 36) {
        val slot = Array.tabulate(32)(sb =>
          if (sb < Mp2.Sblimit && f.subs(sb).q > 0) f.subs(sb).samples(t)
          else 0)
        val out = synth.step(slot)
        out.foreach { v => pcmSum += v; pcmAbs += math.abs(v) }
        t += 1
      }
      s"""{"offset":$off,"bitrate_index":${f.bitrateIndex},""" +
        s""""alloc_sum":$alloc,"sf_sum":$sfSum,""" +
        s""""pcm_sum":$pcmSum,"pcm_abs_sum":$pcmAbs}"""
    }
    writeLines(outDir, lines)
    println(s"""{"family":"mp2","frames":${frames.length},""" +
      s""""out":"$outDir"}""")
  }

  // ---- MP3 (Layer III mono, bit reservoir honored) ------------------------

  private def runMp3(profJson: Option[String], bytes: Array[Byte],
      outDir: String): Unit = {
    val p = profJson.map(CodecProfileJson.parseMp3(_))
      .getOrElse(Mp3.Profile.StandIn)
    val frames = Mp3.demuxReservoir(bytes, p)
    // the §2.4.3.4 hybrid filterbank to PCM, when the stream stays on
    // the exact-integer requant grid; otherwise report structure only
    val hybrid = new graft.sources.Mp3Pcm.Hybrid()
    val lines = frames.map { case (off, mdb, f) =>
      val perGr = (0 until 2).map { gr =>
        val g = f.granules(gr)
        val codeSum = g.bigValues.iterator
          .map(v => math.abs(v._1).toLong + math.abs(v._2)).sum +
          g.count1.iterator.map(q =>
            (math.abs(q._1) + math.abs(q._2) + math.abs(q._3) +
              math.abs(q._4)).toLong).sum
        (g.bigValues.length, f.part23LengthWith(gr, p), codeSum,
          g.scalefacs.map(_.toLong).sum)
      }
      val pcm = scala.util.Try {
        (0 until 2).map(gr => hybrid.granule(f.granules(gr), p).sum).sum
      }
      val pcmField = pcm.map(v => s""","pcm_sum":$v""").getOrElse(
        s""","pcm_skipped":${'"'}${pcm.failed.get.getMessage
          .takeWhile(_ != '(').trim.replace('"', '\'')}${'"'}""")
      s"""{"offset":$off,"main_data_begin":$mdb,""" +
        s""""big_values":[${perGr.map(_._1).mkString(",")}],""" +
        s""""part23":[${perGr.map(_._2).mkString(",")}],""" +
        s""""code_sum":[${perGr.map(_._3).mkString(",")}],""" +
        s""""sf_sum":[${perGr.map(_._4).mkString(",")}]$pcmField}"""
    }
    writeLines(outDir, lines)
    println(s"""{"family":"mp3","frames":${frames.length},""" +
      s""""out":"$outDir"}""")
  }

  // ---- AAC (ADTS stream, §6.3.1 element loop per frame) -------------------

  private def runAac(profJson: Option[String], bytes: Array[Byte],
      outDir: String): Unit = {
    val p = profJson.map(CodecProfileJson.parseAac(_))
      .getOrElse(Aac.Profile.StandIn)
    val frames = AudioIndex.adtsDemux(bytes)
    // §4.6.11 filterbank to samples when the stream stays on the
    // exact-integer grid (single SCE, sine windows, ungrouped shorts)
    val overlap = new graft.sources.AacPcm.Overlap()
    val lines = frames.map { case (off, fr) =>
      val els = Aac.demuxElements(fr.payload, p)
      def icsStats(ics: Aac.AacIcs): (Int, Long) =
        (ics.info.maxSfb,
          ics.spectral.iterator.flatten.flatten
            .map(v => math.abs(v).toLong).sum)
      val parts = els.map {
        case Aac.SceEl(tag, ics) =>
          val (sfb, sum) = icsStats(ics)
          s"""{"el":"sce","tag":$tag,"max_sfb":$sfb,"spec_sum":$sum}"""
        case Aac.CpeEl(tag, l, r, msp, _) =>
          val (sfb, ls) = icsStats(l)
          val (_, rs) = icsStats(r)
          s"""{"el":"cpe","tag":$tag,"max_sfb":$sfb,""" +
            s""""ms_mask_present":$msp,"spec_sum_l":$ls,""" +
            s""""spec_sum_r":$rs}"""
      }
      val pcm = els match {
        case Seq(Aac.SceEl(_, ics)) => scala.util.Try {
          overlap.frame(graft.sources.AacPcm.dequantIcs(ics, p),
            ics.info.windowSequence).sum
        }.toOption
        case _ => None
      }
      val pcmField = pcm.map(v => s""","pcm_sum":$v""").getOrElse("")
      s"""{"offset":$off,"rate":${fr.rate},""" +
        s""""channels":${fr.channels},""" +
        s""""elements":[${parts.mkString(",")}]$pcmField}"""
    }
    writeLines(outDir, lines)
    println(s"""{"family":"aac","frames":${frames.length},""" +
      s""""out":"$outDir"}""")
  }

  // ---- H.264 (Annex-B, CAVLC I/P slice families) --------------------------

  private def runH264(profJson: Option[String], bytes: Array[Byte],
      outDir: String): Unit = {
    val p = profJson.map(CodecProfileJson.parseH264(_))
      .getOrElse(H264.Profile.StandIn)
    val nals = H264.splitAnnexB(bytes)
    var sps: Option[H264.Sps] = None
    var pps: Option[H264.Pps] = None
    val lines = Seq.newBuilder[String]
    var idx = 0
    nals.foreach { nal =>
      H264.nalType(nal) match {
        case H264.NalSps =>
          sps = Some(H264.parseSps(nal))
          lines += s"""{"nal":$idx,"type":"sps","width":${sps.get.width},""" +
            s""""height":${sps.get.height}}"""
        case H264.NalPps =>
          pps = Some(H264.parsePps(nal))
          lines += s"""{"nal":$idx,"type":"pps","cabac":${pps.get.cabac}}"""
        case t if t == H264.NalSlice || t == H264.NalIdr =>
          val s = sps.getOrElse(sys.error("RunDecode: slice before SPS"))
          val q = pps.getOrElse(sys.error("RunDecode: slice before PPS"))
          lines += decodeSlice(nal, s, q, p, idx)
        case other =>
          lines += s"""{"nal":$idx,"type":"other","nal_unit_type":$other}"""
      }
      idx += 1
    }
    writeLines(outDir, lines.result())
    println(s"""{"family":"h264","nals":${nals.length},""" +
      s""""out":"$outDir"}""")
  }

  /** One coded slice through the CAVLC families this engine decodes,
    * most general first; each parser fails LOUDLY on a mismatched
    * layout, so the fallback chain reports the family that actually
    * matched (or the last named failure). */
  private def decodeSlice(nal: Array[Byte], sps: H264.Sps,
      pps: H264.Pps, p: H264.Profile, idx: Int): String = {
    def pixels(p: => graft.sources.H264Recon.Planes): String =
      scala.util.Try(p).map { pl =>
        val luma = pl.y.iterator.flatMap(_.iterator).map(_.toLong).sum
        val chroma = pl.u.iterator.flatMap(_.iterator).map(_.toLong).sum +
          pl.v.iterator.flatMap(_.iterator).map(_.toLong).sum
        s""","luma_sum":$luma,"chroma_sum":$chroma"""
      }.getOrElse(""","recon_skipped":true""")
    def coeffSum(blocks: Iterable[Array[Int]]): Long =
      blocks.iterator.flatMap(_.iterator)
        .map(v => math.abs(v).toLong).sum
    val attempts: Seq[(String, () => String)] = Seq(
      "intra_coded" -> { () =>
        val (info, mbs) = H264.parseIntraCodedSlice(nal, sps, pps, -1, p)
        val sum = coeffSum(mbs.flatMap(_.luma)) +
          coeffSum(mbs.flatMap(_.chromaDc)) +
          coeffSum(mbs.flatMap(_.chromaAc.flatten))
        s"""{"nal":$idx,"type":"slice","family":"intra_coded",""" +
          s""""mbs":${mbs.length},"coeff_abs_sum":$sum""" +
          pixels(graft.sources.H264Recon.decodeI4Frame(
            info, mbs, sps, pps)) + "}"
      },
      "i16x16" -> { () =>
        val (info, mbs) = H264.parseI16Slice(nal, sps, pps, p)
        val sum = coeffSum(mbs.map(_.lumaDc)) +
          coeffSum(mbs.flatMap(_.lumaAc)) +
          coeffSum(mbs.flatMap(_.chromaDc)) +
          coeffSum(mbs.flatMap(_.chromaAc.flatten))
        s"""{"nal":$idx,"type":"slice","family":"i16x16",""" +
          s""""mbs":${mbs.length},"coeff_abs_sum":$sum""" +
          pixels(graft.sources.H264Recon.decodeI16Frame(
            info, mbs, sps, pps)) + "}"
      },
      "p_slice" -> { () =>
        val (_, mbs) = H264.parsePSlice(nal, sps, pps, p)
        val sum = coeffSum(mbs.flatMap(_.luma)) +
          coeffSum(mbs.flatMap(_.chromaDc)) +
          coeffSum(mbs.flatMap(_.chromaAc.flatten))
        s"""{"nal":$idx,"type":"slice","family":"p_slice",""" +
          s""""mbs":${mbs.length},"coeff_abs_sum":$sum}"""
      },
      "intra_mode" -> { () =>
        val (_, mbs) = H264.parseIntraModeSlice(nal, sps, pps, p)
        s"""{"nal":$idx,"type":"slice","family":"intra_mode",""" +
          s""""mbs":${mbs.length}}"""
      })
    var lastErr: Throwable = null
    attempts.foreach { case (_, f) =>
      try return f()
      catch { case e: Exception => lastErr = e }
    }
    throw new IllegalArgumentException(
      s"RunDecode: slice NAL $idx matched no CAVLC family " +
        s"(last: ${lastErr.getMessage})")
  }
}
