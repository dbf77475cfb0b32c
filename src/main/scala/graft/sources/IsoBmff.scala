package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.US_ASCII

/** Fragmented-MP4 (ISO-BMFF, ISO/IEC 14496-12) mux/demux — the
  * engine's THIRD container family, next to RIFF ([[Riff]]/[[Wav]]/
  * [[Avi]]) and EBML ([[Ebml]]/[[Mkv]]): the box-structured,
  * big-endian format the web's segmented-streaming stacks (DASH/HLS/
  * MSE) consume, and the natural export target for the reference's
  * browser-facing viewers (`ui/videoviewer.py:57-75` streams a live
  * container into a MediaSource-style client; its mpegts leg is a
  * sibling of this family). Written from the public specification:
  * length-prefixed boxes, FullBox version/flags, `ftyp`/`moov`
  * (mvhd, per-track trak > tkhd/mdhd/hdlr, mvex > trex defaults) and
  * per-fragment `moof` (mfhd sequence, per-track traf >
  * tfhd/tfdt/trun) + `mdat`, with `default-base-is-moof` offset
  * addressing and version-1 (64-bit) tfdt baseMediaDecodeTime.
  *
  * Same scale stance as the other families: mux/demux are per-group
  * executor kernels over binary columns; one container never spans
  * executors, bytes never touch the driver.
  */
object IsoBmff {

  def u32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  def u64(v: Long): Array[Byte] = u32(v >>> 32) ++ u32(v & 0xffffffffL)

  def u16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  def readU32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  def readU64(b: Array[Byte], off: Int): Long =
    (readU32(b, off) << 32) | readU32(b, off + 4)

  def readU16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  def boxType(b: Array[Byte], off: Int): String =
    new String(b, off + 4, 4, US_ASCII)

  /** One box: type + payload (header excluded); `pos` is the offset of
    * the box HEADER in the enclosing buffer (moof positions anchor
    * default-base-is-moof data offsets). */
  final case class Box(kind: String, data: Array[Byte], pos: Int)

  /** Children of a box body / top level [from, until). 32-bit sizes
    * (size ≥ 8); unknown boxes are returned for the caller to skip —
    * the ISO-BMFF forward-compatibility rule. `mdat` bodies are NOT
    * copied (Box.data empty, pos/size walk unaffected): sample
    * payloads are sliced from the original buffer through the trun
    * offsets, and eagerly copying a fragment movie's media would
    * transiently double the kernel's memory per container. */
  def boxes(b: Array[Byte], from: Int, until: Int): Seq[Box] = {
    val acc = Seq.newBuilder[Box]
    var p = from
    while (p + 8 <= until) {
      val size = readU32(b, p)
      require(size >= 8 && p + size <= until,
        s"box ${boxType(b, p)} at $p overruns container (size=$size)")
      val kind = boxType(b, p)
      acc += Box(kind,
        if (kind == "mdat") Array.emptyByteArray
        else java.util.Arrays.copyOfRange(b, p + 8, p + size.toInt), p)
      p += size.toInt
    }
    acc.result()
  }

  def writeBox(out: ByteArrayOutputStream, kind: String,
      data: Array[Byte]): Unit = {
    require(kind.length == 4, s"box type must be 4 chars: $kind")
    out.write(u32(data.length + 8L))
    out.write(kind.getBytes(US_ASCII))
    out.write(data)
  }

  private def box(kind: String)(fill: ByteArrayOutputStream => Unit)
      : Array[Byte] = {
    val body = new ByteArrayOutputStream()
    fill(body)
    val out = new ByteArrayOutputStream(body.size + 8)
    writeBox(out, kind, body.toByteArray)
    out.toByteArray
  }

  /** FullBox header: 1-byte version + 24-bit flags. */
  private def full(version: Int, flags: Long): Array[Byte] = Array(
    version.toByte, ((flags >> 16) & 0xff).toByte,
    ((flags >> 8) & 0xff).toByte, (flags & 0xff).toByte)

  /** The movie timescale (ticks per second) — 1000 = millisecond
    * ticks, the engine's envelope unit (Mkv fixes the same 1 ms). */
  val Timescale = 1000L

  /** tfhd flag: offsets in this traf are relative to the moof's first
    * byte (ISO 14496-12 §8.8.7.1 default-base-is-moof). */
  val DefaultBaseIsMoof = 0x020000L
  /** trun flags: data-offset + per-sample duration/size/flags present
    * (§8.8.8.1). */
  val TrunFlags = 0x000001L | 0x000100L | 0x000200L | 0x000400L
  /** sample_flags bit: sample_is_non_sync_sample (§8.8.3.1) — clear on
    * keyframes. */
  val NonSync = 0x00010000L

  final case class Mp4Track(id: Int, kind: String, // "video" | "audio"
      codec: String, // stsd entry fourcc, e.g. "grft"
      width: Int = 0, height: Int = 0, sampleRate: Int = 0,
      channels: Int = 0)

  /** One sample; dts in [[Timescale]] ticks (ms), `dur` its duration. */
  final case class Mp4Sample(track: Int, dts: Long, dur: Long,
      keyframe: Boolean, payload: Array[Byte])

  // ------------------------------------------------------------------ mux

  /** Sample-table payloads for a CLASSIC (non-fragmented) track; when
    * absent the trak is written in the fragmented shape (duration 0,
    * empty tables, samples described by moof/trun). */
  private final case class FlatTables(
      stts: Seq[(Long, Long)],        // (sample_count, delta) runs
      stss: Option[Seq[Long]],        // 1-based sync samples; None = all
      stsc: Seq[(Long, Long)],        // (first_chunk, samples_per_chunk)
      sizes: Either[Long, Seq[Long]], // uniform size | per-sample table
      stco: Seq[Long],                // absolute chunk offsets
      duration: Long)

  private def trak(t: Mp4Track, flat: Option[FlatTables] = None): Array[Byte] = box("trak") { trk =>
    trk.write(box("tkhd") { b =>
      b.write(full(0, 7)) // track_enabled | in_movie | in_preview
      b.write(u32(0)); b.write(u32(0)) // creation/modification
      b.write(u32(t.id.toLong)); b.write(u32(0)) // track_id, reserved
      b.write(u32(flat.map(_.duration).getOrElse(0L))) // 0 for fragmented
      b.write(new Array[Byte](8)) // reserved
      // layer, alternate_group, volume (8.8 fixed, audio full), reserved
      b.write(u16(0)); b.write(u16(0))
      b.write(u16(if (t.kind == "audio") 0x100 else 0)); b.write(u16(0))
      // identity 3×3 matrix in 16.16 / 2.30 fixed point
      Seq(0x00010000L, 0, 0, 0, 0x00010000L, 0, 0, 0, 0x40000000L)
        .foreach(v => b.write(u32(v)))
      b.write(u32(t.width.toLong << 16)) // 16.16 width
      b.write(u32(t.height.toLong << 16))
    })
    trk.write(box("mdia") { md =>
      md.write(box("mdhd") { b =>
        b.write(full(0, 0))
        b.write(u32(0)); b.write(u32(0))
        b.write(u32(Timescale))
        b.write(u32(flat.map(_.duration).getOrElse(0L)))
        b.write(u16(0x55c4)); b.write(u16(0)) // language 'und', quality
      })
      md.write(box("hdlr") { b =>
        b.write(full(0, 0)); b.write(u32(0))
        b.write((if (t.kind == "video") "vide" else "soun")
          .getBytes(US_ASCII))
        b.write(new Array[Byte](12)) // reserved
        b.write(0) // empty null-terminated name
      })
      md.write(box("minf") { mi =>
        // mandatory media header (vmhd/smhd) + self-contained data
        // reference (dinf > dref > 'url ' flag 1) — ISO 14496-12
        // requires both; the stsd entries' data_reference_index 1
        // points at the dref entry below
        if (t.kind == "video")
          mi.write(box("vmhd") { b =>
            b.write(full(0, 1)) // flags=1 per spec
            b.write(u16(0)) // graphicsmode copy
            b.write(u16(0)); b.write(u16(0)); b.write(u16(0)) // opcolor
          })
        else
          mi.write(box("smhd") { b =>
            b.write(full(0, 0))
            b.write(u16(0)); b.write(u16(0)) // balance, reserved
          })
        mi.write(box("dinf") { di =>
          di.write(box("dref") { b =>
            b.write(full(0, 0)); b.write(u32(1)) // entry_count
            b.write(box("url ")(u => u.write(full(0, 1)))) // self-contained
          })
        })
        mi.write(box("stbl") { st =>
          st.write(box("stsd") { b =>
            b.write(full(0, 0)); b.write(u32(1)) // one sample entry
            b.write(box(t.codec) { se =>
              se.write(new Array[Byte](6)); se.write(u16(1)) // data ref
              if (t.kind == "video") {
                se.write(new Array[Byte](16)) // pre_defined/reserved
                se.write(u16(t.width)); se.write(u16(t.height))
                se.write(u32(0x00480000L)); se.write(u32(0x00480000L))
                se.write(u32(0)); se.write(u16(1)) // frame_count
                se.write(new Array[Byte](32)) // compressorname
                se.write(u16(0x18)); se.write(u16(0xffff)) // depth, -1
              } else {
                // the SampleEntry rate field is 16.16 fixed point —
                // a rate >= 2^16 would silently wrap (hi-res audio
                // needs the srat/esds extension, not written here)
                require(t.sampleRate >= 0 && t.sampleRate < 0x10000,
                  s"track ${t.id}: sampleRate ${t.sampleRate} exceeds " +
                    "the 16.16 SampleEntry field")
                se.write(new Array[Byte](8))
                se.write(u16(t.channels)); se.write(u16(16)) // samplesize
                se.write(u32(0))
                se.write(u32(t.sampleRate.toLong << 16)) // 16.16 rate
              }
            })
          })
          flat match {
            case None =>
              // fragmented movies carry EMPTY sample tables in the moov
              st.write(box("stts")(b => { b.write(full(0, 0)); b.write(u32(0)) }))
              st.write(box("stsc")(b => { b.write(full(0, 0)); b.write(u32(0)) }))
              st.write(box("stsz")(b => { b.write(full(0, 0)); b.write(u32(0))
                b.write(u32(0)) }))
              st.write(box("stco")(b => { b.write(full(0, 0)); b.write(u32(0)) }))
            case Some(ft) =>
              val nSamples = ft.stts.map(_._1).sum
              st.write(box("stts") { b =>
                b.write(full(0, 0)); b.write(u32(ft.stts.length.toLong))
                ft.stts.foreach { case (c, d) => b.write(u32(c)); b.write(u32(d)) }
              })
              // stss absent ⇔ every sample is a sync sample (spec rule)
              ft.stss.foreach { sync =>
                st.write(box("stss") { b =>
                  b.write(full(0, 0)); b.write(u32(sync.length.toLong))
                  sync.foreach(n => b.write(u32(n)))
                })
              }
              st.write(box("stsc") { b =>
                b.write(full(0, 0)); b.write(u32(ft.stsc.length.toLong))
                ft.stsc.foreach { case (first, spc) =>
                  b.write(u32(first)); b.write(u32(spc)); b.write(u32(1))
                }
              })
              st.write(box("stsz") { b =>
                b.write(full(0, 0))
                ft.sizes match {
                  case Left(uniform) =>
                    b.write(u32(uniform)); b.write(u32(nSamples))
                  case Right(each) =>
                    b.write(u32(0)); b.write(u32(each.length.toLong))
                    each.foreach(sz => b.write(u32(sz)))
                }
              })
              st.write(box("stco") { b =>
                b.write(full(0, 0)); b.write(u32(ft.stco.length.toLong))
                ft.stco.foreach { o =>
                  require(o <= 0xffffffffL, "stco offset needs co64")
                  b.write(u32(o))
                }
              })
          }
        })
      })
    })
  }

  /** Mux samples (already in presentation order) into
    * ftyp + moov + (moof+mdat)×fragments. A fragment closes after
    * `fragMax` samples (over all tracks, in interleave order); within
    * a fragment each track gets its own traf/trun with a CONTIGUOUS
    * mdat run (the layout real fMP4 muxers emit), tfdt = the track's
    * first dts of the fragment. */
  def mux(tracks: Seq[Mp4Track], samples: Seq[Mp4Sample],
      fragMax: Int = 8): Array[Byte] = {
    require(tracks.nonEmpty, "at least one track")
    val byId = tracks.map(_.id).toSet
    samples.foreach(sm => require(byId.contains(sm.track),
      s"sample for unknown track ${sm.track}"))

    val out = new ByteArrayOutputStream()
    out.write(box("ftyp") { b =>
      b.write("iso5".getBytes(US_ASCII)); b.write(u32(0))
      b.write("iso5".getBytes(US_ASCII)); b.write("dash".getBytes(US_ASCII))
    })
    out.write(box("moov") { mv =>
      mv.write(box("mvhd") { b =>
        b.write(full(0, 0))
        b.write(u32(0)); b.write(u32(0))
        b.write(u32(Timescale)); b.write(u32(0))
        b.write(u32(0x00010000L)); b.write(u16(0x0100)); b.write(u16(0))
        b.write(new Array[Byte](8))
        Seq(0x00010000L, 0, 0, 0, 0x00010000L, 0, 0, 0, 0x40000000L)
          .foreach(v => b.write(u32(v)))
        b.write(new Array[Byte](24)) // pre_defined
        b.write(u32(tracks.map(_.id).max + 1L)) // next_track_ID
      })
      tracks.foreach(t => mv.write(trak(t)))
      mv.write(box("mvex") { mx =>
        tracks.foreach(t => mx.write(box("trex") { b =>
          b.write(full(0, 0))
          b.write(u32(t.id.toLong)); b.write(u32(1)) // sample descr idx
          b.write(u32(0)); b.write(u32(0)); b.write(u32(0)) // defaults
        }))
      })
    })

    samples.grouped(fragMax).zipWithIndex.foreach { case (frag, fi) =>
      // per-track contiguous runs, tracks in id order
      val runs = frag.groupBy(_.track).toSeq.sortBy(_._1)
      val mdatPayload = runs.flatMap(_._2).flatMap(_.payload).toArray
      // data offsets are moof-relative (default-base-is-moof): the
      // moof box size must be known before the truns are written, so
      // lay the moof out twice — once with zero offsets to measure,
      // once with the real ones. Deterministic and allocation-cheap
      // at fragment granularity.
      def moofBytes(offsets: Map[Int, Long]): Array[Byte] = box("moof") { mf =>
        mf.write(box("mfhd") { b =>
          b.write(full(0, 0)); b.write(u32(fi + 1L))
        })
        runs.foreach { case (trackId, ss) =>
          mf.write(box("traf") { tf =>
            tf.write(box("tfhd") { b =>
              b.write(full(0, DefaultBaseIsMoof))
              b.write(u32(trackId.toLong))
            })
            tf.write(box("tfdt") { b =>
              b.write(full(1, 0)) // version 1: 64-bit decode time
              b.write(u64(ss.head.dts))
            })
            tf.write(box("trun") { b =>
              b.write(full(0, TrunFlags))
              b.write(u32(ss.size.toLong))
              b.write(u32(offsets.getOrElse(trackId, 0L)))
              ss.foreach { sm =>
                b.write(u32(sm.dur))
                b.write(u32(sm.payload.length.toLong))
                b.write(u32(if (sm.keyframe) 0L else NonSync))
              }
            })
          })
        }
      }
      val moofSize = moofBytes(Map.empty).length
      var off = moofSize + 8L // past the mdat header
      val offsets = runs.map { case (trackId, ss) =>
        val o = trackId -> off
        off += ss.map(_.payload.length.toLong).sum
        o
      }.toMap
      out.write(moofBytes(offsets))
      writeBox(out, "mdat", mdatPayload)
    }
    out.toByteArray
  }

  // ---------------------------------------------------------------- demux

  /** A trak box → (track meta, stbl body) — shared between the
    * fragmented demux (stbl holds only stsd there) and the classic
    * demux (stbl carries the full sample tables). */
  private def parseTrak(tk: Box): (Mp4Track, Array[Byte]) = {
    val tkEls = boxes(tk.data, 0, tk.data.length)
    val tkhd = tkEls.find(_.kind == "tkhd").get.data
    val id = readU32(tkhd, 12).toInt
    val mdia = tkEls.find(_.kind == "mdia").get
    val mdEls = boxes(mdia.data, 0, mdia.data.length)
    val hdlr = mdEls.find(_.kind == "hdlr").get.data
    val kind = if (new String(hdlr, 8, 4, US_ASCII) == "vide") "video"
      else "audio"
    val mdhd = mdEls.find(_.kind == "mdhd").get.data
    require(readU32(mdhd, 12) == Timescale,
      s"track $id timescale ${readU32(mdhd, 12)} != $Timescale")
    val minf = mdEls.find(_.kind == "minf").get
    val stbl = boxes(minf.data, 0, minf.data.length)
      .find(_.kind == "stbl")
      .getOrElse(throw new IllegalArgumentException(s"track $id: no stbl"))
    val stsd = boxes(stbl.data, 0, stbl.data.length)
      .find(_.kind == "stsd").get.data
    val entry = boxes(stsd, 8, stsd.length).head
    val t =
      if (kind == "video")
        Mp4Track(id, kind, entry.kind,
          width = readU16(entry.data, 24), height = readU16(entry.data, 26))
      else
        Mp4Track(id, kind, entry.kind,
          channels = readU16(entry.data, 16),
          sampleRate = (readU32(entry.data, 24) >> 16).toInt)
    (t, stbl.data)
  }

  /** Parse back (tracks, samples, fragment count). Sample dts values
    * are reconstructed from each traf's tfdt + trun durations; sample
    * bytes are resolved through the trun data offset against the
    * moof position (default-base-is-moof). Unknown boxes anywhere are
    * skipped. */
  def demux(bytes: Array[Byte]): (Seq[Mp4Track], Seq[Mp4Sample], Int) = {
    val top = boxes(bytes, 0, bytes.length)
    require(top.headOption.exists(_.kind == "ftyp"), "missing ftyp")
    val moov = top.find(_.kind == "moov")
      .getOrElse(throw new IllegalArgumentException("missing moov"))

    val tracks = boxes(moov.data, 0, moov.data.length)
      .filter(_.kind == "trak").map(tk => parseTrak(tk)._1)

    val samples = Seq.newBuilder[Mp4Sample]
    var frags = 0
    top.filter(_.kind == "moof").foreach { moof =>
      frags += 1
      val seqNo = boxes(moof.data, 0, moof.data.length)
        .find(_.kind == "mfhd").map(m => readU32(m.data, 4)).getOrElse(0L)
      require(seqNo == frags, s"moof sequence $seqNo at fragment $frags")
      boxes(moof.data, 0, moof.data.length).filter(_.kind == "traf")
        .foreach { tf =>
          val els = boxes(tf.data, 0, tf.data.length)
          val tfhd = els.find(_.kind == "tfhd").get.data
          require((readU32(tfhd, 0) & DefaultBaseIsMoof) != 0,
            "only default-base-is-moof addressing is written/read")
          val trackId = readU32(tfhd, 4).toInt
          val tfdt = els.find(_.kind == "tfdt").get.data
          var dts = tfdt(0) match {
            case 1 => readU64(tfdt, 4)
            case _ => readU32(tfdt, 4)
          }
          val trun = els.find(_.kind == "trun").get.data
          // EXACT flag match: extra per-sample fields (composition
          // offsets 0x800, first-sample-flags 0x004) change the record
          // width — a superset would silently misparse, so fail loud
          require((readU32(trun, 0) & 0xffffffL) == TrunFlags,
            "trun flags 0x" +
              java.lang.Long.toHexString(readU32(trun, 0) & 0xffffffL) +
              ": only offset + per-sample duration/size/flags " +
              "(12-byte records) are read")
          val n = readU32(trun, 4).toInt
          var off = moof.pos + readU32(trun, 8)
          var i = 0
          while (i < n) {
            val base = 12 + i * 12
            val dur = readU32(trun, base)
            val size = readU32(trun, base + 4).toInt
            val flags = readU32(trun, base + 8)
            samples += Mp4Sample(trackId, dts, dur, (flags & NonSync) == 0,
              java.util.Arrays.copyOfRange(bytes, off.toInt,
                off.toInt + size))
            dts += dur; off += size; i += 1
          }
        }
    }
    (tracks, samples.result(), frags)
  }

  // --------------------------------------- classic (non-fragmented) layout

  /** Mux into the CLASSIC layout: ftyp + mdat + moov with FULL sample
    * tables — the non-streaming .mp4 file shape the reference's plain
    * mp4 container tests read and write
    * (tests/media/test_containers.py:26-27 — `"mp4"` audio round
    * trips go through libav's regular moov muxer, not fMP4). mdat
    * precedes moov so every chunk offset is known in one pass (the
    * layout non-faststart muxers emit; readers must accept any box
    * order after ftyp). Chunking: up to `chunkMax` consecutive
    * samples per track form a chunk; chunks interleave globally by
    * (first dts, track id) — the time-interleaved layout real muxers
    * produce so a linear read advances all tracks together.
    *
    * Tables written per track: stts (run-length durations), stss
    * (sync samples — OMITTED when every sample is sync, the spec's
    * all-sync convention), stsc ((first_chunk, samples_per_chunk)
    * runs), stsz (uniform-size field when all samples match, else the
    * per-sample table), stco (absolute chunk offsets). */
  def muxFlat(tracks: Seq[Mp4Track], samples: Seq[Mp4Sample],
      chunkMax: Int = 8): Array[Byte] = {
    require(tracks.nonEmpty, "at least one track")
    require(chunkMax >= 1, s"chunkMax $chunkMax")
    val byId = tracks.map(_.id).toSet
    samples.foreach(sm => require(byId.contains(sm.track),
      s"sample for unknown track ${sm.track}"))
    // Classic MP4 without edit lists cannot represent dts gaps: the
    // demuxer reconstructs dts by accumulating stts durations from 0,
    // so any input violating dts(i) = Σ dur(0..i-1) would round-trip
    // with silently altered timestamps. Fail loudly instead.
    tracks.foreach { t =>
      var acc = 0L
      samples.filter(_.track == t.id).zipWithIndex.foreach {
        case (sm, i) =>
          require(sm.dts == acc,
            s"track ${t.id} sample $i: dts ${sm.dts} != running duration " +
              s"sum $acc — classic moov (stts) cannot represent dts gaps")
          acc += sm.dur
      }
    }

    val ftyp = box("ftyp") { b =>
      b.write("isom".getBytes(US_ASCII)); b.write(u32(0x200))
      b.write("isom".getBytes(US_ASCII)); b.write("iso2".getBytes(US_ASCII))
    }
    // chunks: per-track consecutive runs in the samples' track order,
    // then a global (first dts, track) interleave
    val ordered = tracks.flatMap { t =>
      samples.filter(_.track == t.id).grouped(chunkMax)
        .map(c => (t.id, c.toIndexedSeq))
    }.sortBy { case (id, c) => (c.head.dts, id) }
    var off = ftyp.length + 8L // past the mdat header
    val chunkOffsets = ordered.map { case (id, c) =>
      val o = off
      off += c.map(_.payload.length.toLong).sum
      (id, c, o)
    }
    val mdatBody = ordered.iterator.flatMap(_._2).flatMap(_.payload).toArray

    def runLength(xs: Seq[Long]): Seq[(Long, Long)] =
      xs.foldLeft(Vector.empty[(Long, Long)]) { case (acc, v) =>
        acc.lastOption match {
          case Some((c, d)) if d == v => acc.init :+ (c + 1, v)
          case _ => acc :+ (1L, v)
        }
      }

    def tablesFor(tid: Int): FlatTables = {
      val ss = samples.filter(_.track == tid)
      require(ss.nonEmpty, s"track $tid: classic layout needs samples")
      val sync = ss.zipWithIndex.collect { case (sm, i) if sm.keyframe =>
        i + 1L }
      val my = chunkOffsets.filter(_._1 == tid)
      val spcRuns = runLength(my.map(_._2.length.toLong))
      val firsts = spcRuns.scanLeft(1L)(_ + _._1).init
      val sizes = ss.map(_.payload.length.toLong)
      FlatTables(
        stts = runLength(ss.map(_.dur)),
        stss = if (sync.length == ss.length) None else Some(sync),
        stsc = firsts.zip(spcRuns.map(_._2)),
        sizes = if (sizes.distinct.length == 1) Left(sizes.head)
          else Right(sizes),
        stco = my.map(_._3),
        duration = ss.map(_.dur).sum)
    }

    val out = new ByteArrayOutputStream()
    out.write(ftyp)
    writeBox(out, "mdat", mdatBody)
    val tables = tracks.map(t => t -> tablesFor(t.id))
    out.write(box("moov") { mv =>
      mv.write(box("mvhd") { b =>
        b.write(full(0, 0))
        b.write(u32(0)); b.write(u32(0))
        b.write(u32(Timescale))
        b.write(u32(tables.map(_._2.duration).max))
        b.write(u32(0x00010000L)); b.write(u16(0x0100)); b.write(u16(0))
        b.write(new Array[Byte](8))
        Seq(0x00010000L, 0, 0, 0, 0x00010000L, 0, 0, 0, 0x40000000L)
          .foreach(v => b.write(u32(v)))
        b.write(new Array[Byte](24)) // pre_defined
        b.write(u32(tracks.map(_.id).max + 1L)) // next_track_ID
      })
      tables.foreach { case (t, ft) => mv.write(trak(t, Some(ft))) }
      // no mvex: nothing is fragmented
    })
    out.toByteArray
  }

  /** Parse a classic file back: (tracks, samples), samples per track
    * in table order, tracks in trak order. Every table
    * cross-constraint is verified loud: stts sample count == stsz
    * count == the stsc/stco chunk expansion, offsets in range.
    * Accepts any top-level box order after ftyp (mdat before OR after
    * moov) and skips unknown boxes — the ISO-BMFF compatibility
    * rules. */
  def demuxFlat(bytes: Array[Byte]): (Seq[Mp4Track], Seq[Mp4Sample]) = {
    val top = boxes(bytes, 0, bytes.length)
    require(top.headOption.exists(_.kind == "ftyp"), "missing ftyp")
    val moov = top.find(_.kind == "moov")
      .getOrElse(throw new IllegalArgumentException("missing moov"))
    val samples = Seq.newBuilder[Mp4Sample]
    val tracks = boxes(moov.data, 0, moov.data.length)
      .filter(_.kind == "trak").map { tk =>
        val (t, stbl) = parseTrak(tk)
        val els = boxes(stbl, 0, stbl.length)
        def tbl(kind: String): Array[Byte] = els.find(_.kind == kind)
          .getOrElse(throw new IllegalArgumentException(
            s"track ${t.id}: missing $kind")).data
        // stts → per-sample durations
        val stts = tbl("stts")
        val durs = (0 until readU32(stts, 4).toInt).flatMap { r =>
          val c = readU32(stts, 8 + r * 8)
          val d = readU32(stts, 12 + r * 8)
          Seq.fill(c.toInt)(d)
        }
        // stsz → per-sample sizes (uniform or table)
        val stsz = tbl("stsz")
        val uniform = readU32(stsz, 4)
        val nSamples = readU32(stsz, 8).toInt
        require(uniform != 0 || stsz.length >= 12 + nSamples * 4,
          s"track ${t.id}: stsz table truncated " +
            s"(${stsz.length} bytes for $nSamples samples)")
        val sizes =
          if (uniform != 0) Seq.fill(nSamples)(uniform)
          else (0 until nSamples).map(i => readU32(stsz, 12 + i * 4))
        require(durs.length == nSamples,
          s"track ${t.id}: stts ${durs.length} samples vs stsz $nSamples")
        // stss → sync set (absent = every sample is sync)
        val sync: Int => Boolean = els.find(_.kind == "stss") match {
          case None => _ => true
          case Some(b) =>
            val set = (0 until readU32(b.data, 4).toInt)
              .map(i => readU32(b.data, 8 + i * 4).toInt).toSet
            n => set.contains(n)
        }
        // stsc + stco → chunk expansion
        val stco = tbl("stco")
        val nChunks = readU32(stco, 4).toInt
        val offsets = (0 until nChunks).map(i => readU32(stco, 8 + i * 4))
        val stsc = tbl("stsc")
        val runs = (0 until readU32(stsc, 4).toInt).map { r =>
          (readU32(stsc, 8 + r * 12), readU32(stsc, 12 + r * 12),
            readU32(stsc, 16 + r * 12))
        }
        runs.foreach { case (_, _, sdi) => require(sdi == 1,
          s"track ${t.id}: sample_description_index $sdi") }
        val spc = (0 until nChunks).map { ci =>
          val run = runs.reverse.find(_._1 <= ci + 1).getOrElse(
            throw new IllegalArgumentException(
              s"track ${t.id}: chunk ${ci + 1} before first stsc run"))
          run._2
        }
        require(spc.map(_.toInt).sum == nSamples,
          s"track ${t.id}: stsc expands to ${spc.map(_.toInt).sum} " +
            s"samples vs stsz $nSamples")
        var si = 0
        var dts = 0L
        offsets.zip(spc).foreach { case (chunkOff, count) =>
          var off = chunkOff
          (0 until count.toInt).foreach { _ =>
            val size = sizes(si).toInt
            // stco offsets are u32 and about to be narrowed to Int for
            // copyOfRange — a valid foreign file past 2 GiB must fail
            // with a clear parse error, not a negative-index crash
            require(off <= Int.MaxValue.toLong - size,
              s"track ${t.id}: stco offset $off beyond the supported " +
                "2 GiB (use the co64 fragmented layout)")
            require(off + size <= bytes.length,
              s"track ${t.id}: sample $si overruns the file")
            samples += Mp4Sample(t.id, dts, durs(si), sync(si + 1),
              java.util.Arrays.copyOfRange(bytes, off.toInt,
                off.toInt + size))
            dts += durs(si)
            off += size
            si += 1
          }
        }
        t
      }
    (tracks, samples.result())
  }
}
