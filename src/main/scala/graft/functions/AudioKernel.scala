package graft.functions

/** Audio kernels mirroring the reference's AudioSequencer
  * (/root/reference/streamtasks/media/util.py:188-267): time-aligning
  * a PCM track against its own timestamps with gap-fill and bounded
  * stretch healing, plus the linear-interp resample those use
  * (np.interp semantics, util.py:263-267 and the audio resampler task
  * SURVEY §2.2 #25).
  *
  * Mounted per track inside typed mapGroups/mapPartitions — one
  * sequencer per (pipeline, track) key, exactly the keyed-state shape
  * StatefulRunner distributes.
  */
object AudioKernel {

  /** Linear-interpolation resample of a mono signal to `newLength`
    * samples (np.interp over linspace indices). */
  def stretchLinear(samples: Array[Double], newLength: Int): Array[Double] = {
    require(newLength >= 0)
    val n = samples.length
    if (newLength == 0 || n == 0) return new Array[Double](newLength)
    if (n == 1) return Array.fill(newLength)(samples(0))
    Array.tabulate(newLength) { j =>
      val pos = j.toDouble * (n - 1) / math.max(1, newLength - 1)
      val i = math.min(n - 2, pos.toInt)
      val frac = pos - i
      samples(i) * (1 - frac) + samples(i + 1) * frac
    }
  }

  /** Rational-rate conversion via linear interp (resampler #25). */
  def resample(samples: Array[Double], fromRate: Int, toRate: Int): Array[Double] =
    stretchLinear(samples,
      math.round(samples.length.toDouble * toRate / fromRate).toInt)

  /** Overlap crossfade smoother (util.py:173-186, the speech
    * enhancement tasks' seam-healing): the first `overlap` samples of
    * each chunk are linearly crossfaded with the previous chunk's
    * tail — weight ramps 0→1 for the new chunk, 1→0 for the old.
    * State = the previous chunk's tail; thread through foldLeft or a
    * state machine per track. */
  def crossfade(prevTail: Option[Array[Double]], chunk: Array[Double],
      overlap: Int): (Array[Double], Array[Double]) = {
    require(chunk.length > overlap, "chunk must exceed the overlap")
    val out = chunk.clone()
    prevTail.foreach { old =>
      var i = 0
      while (i < overlap) {
        val wNew = if (overlap == 1) 0.0 else i.toDouble / (overlap - 1)
        out(i) = chunk(i) * wNew + old(i) * (1.0 - wNew)
        i += 1
      }
    }
    (out, chunk.takeRight(overlap))
  }

  /** One audio track's sequencer state: buffered samples, the buffer
    * start time (seconds) and accumulated desync (seconds). */
  final case class SeqState(buf: Vector[Double], startTime: Double,
      desync: Double, started: Boolean)

  object Sequencer {
    def init: SeqState = SeqState(Vector.empty, 0.0, 0.0, started = false)

    /** Insert a chunk stamped `time` (seconds) into the track buffer,
      * healing desync like util.py:228-257: positive desync (gap) →
      * stretch the buffer over the gap if within `maxStretchRatio`,
      * else zero-fill; negative desync (overlap) → stretch-compress if
      * within ratio, else drop the overlapping head of the new chunk. */
    def insert(s: SeqState, time: Double, samples: Array[Double],
        sampleRate: Int, maxStretchRatio: Double): SeqState = {
      if (!s.started)
        return SeqState(samples.toVector, time, 0.0, started = true)
      val endTime = s.startTime + s.buf.length.toDouble / sampleRate
      val desync = s.desync + (time - endTime)
      val desyncSamples = math.round(math.abs(desync) * sampleRate).toInt
      val nextCount = s.buf.length + samples.length
      if (desyncSamples == 0)
        s.copy(buf = s.buf ++ samples, desync = desync)
      else if (desync < 0) { // overlap: compress or drop
        val newLen = nextCount - desyncSamples
        if (newLen > 0 && nextCount.toDouble / newLen < maxStretchRatio) {
          val stretched = stretchLinear((s.buf ++ samples).toArray, newLen)
          s.copy(buf = stretched.toVector,
            desync = desync + math.min(desyncSamples, samples.length).toDouble / sampleRate)
        } else {
          val dropped = samples.drop(desyncSamples)
          s.copy(buf = s.buf ++ dropped,
            desync = desync + math.min(desyncSamples, samples.length).toDouble / sampleRate)
        }
      } else { // gap: stretch over it or zero-fill
        val newLen = nextCount + desyncSamples
        if (nextCount != 0 && newLen.toDouble / nextCount < maxStretchRatio) {
          val stretched = stretchLinear((s.buf ++ samples).toArray, newLen)
          s.copy(buf = stretched.toVector,
            desync = desync - desyncSamples.toDouble / sampleRate)
        } else {
          s.copy(buf = s.buf ++ Vector.fill(desyncSamples)(0.0) ++ samples,
            desync = desync - desyncSamples.toDouble / sampleRate)
        }
      }
    }

    /** Pop `count` aligned samples starting at `time`, zero-padding
      * before the buffer start and after its end (util.py:214-226). */
    def popStart(s: SeqState, time: Double, count: Int,
        sampleRate: Int): (SeqState, Array[Double]) = {
      if (!s.started) return (s, new Array[Double](count))
      val startOffset = math.round((time - s.startTime) * sampleRate).toInt
      val bufEnd = math.max(0, math.min(count + startOffset, s.buf.length))
      val bufStart = math.min(math.max(0, startOffset), s.buf.length)
      val pad = math.min(math.max(0, -startOffset), count)
      val body = s.buf.slice(bufStart, bufEnd)
      val out = Array.fill(pad)(0.0) ++ body.toArray
      val padded = if (out.length < count)
        out ++ new Array[Double](count - out.length) else out
      (s.copy(buf = s.buf.drop(bufEnd),
        startTime = s.startTime + bufEnd.toDouble / sampleRate), padded)
    }
  }
}
