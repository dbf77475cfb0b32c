package graft.functions

/** A tiny TRAINED acoustic model for the §2.4 inference mounts — real
  * weights, not a synthetic kernel. `scripts/train_asr.py` trains
  * softmax regression (full-batch gradient descent, fixed seed) on a
  * synthetic phoneme dataset — 6 classes (0 = CTC blank), 8-dim
  * integer spectral templates + bounded integer noise, the same frame
  * recipe the m15 fixture synthesizes — then quantizes weights ×1000
  * to integers. Quantization makes every logit an exact 64-bit
  * integer dot product, so the Spark kernel and the m15 DuckDB oracle
  * compute bit-identical argmaxes: a trained model under a hash gate.
  *
  * The committed resource `graft/asr_tiny.txt` is the model artifact
  * (weights ship in the jar, the way a real deployment broadcasts or
  * bakes in small models); the reference binds speechbrain checkpoints
  * at the same seam (inference/asrspeechrecognition.py:54-71).
  */
object AsrTiny {

  /** The trained-model FIXTURE synthesis shared by m15 and c13 (one
    * 8-dim integer frame per event: class template + bounded hash
    * noise — the distribution the head was trained on) and its exact
    * SQL twins, kept in ONE place so the two oracle-gated queries can
    * never silently diverge. SQL `j` is 1-based (matches the Scala
    * j + 1 factor). */
  def frameSynth(cls: Int, eid: Long): Array[Long] =
    Array.tabulate(model.dim)(j =>
      model.tmpl(cls)(j) + eid * (j + 1) * 2654435761L % 7L - 3L)

  def matSql(a: Array[Array[Long]]): String =
    a.map(_.mkString("[", ",", "]")).mkString("[", ",", "]")

  /** The per-(event, j) synthesized feature — DuckDB twin of
    * [[frameSynth]] (expects columns `cls`, `event_id`, `j`). */
  def synthXSql: String =
    s"${matSql(model.tmpl)}[cls + 1][j] + event_id * j * 2654435761 % 7 - 3"

  /** The per-class logit — DuckDB twin of Model.logit (expects
    * columns `x`, `j`, `k`; aggregate over j). */
  def logitSql: String =
    s"SUM(${matSql(model.w)}[k][j] * x) + ${model.b.mkString("[", ",", "]")}[k]"

  final case class Model(tmpl: Array[Array[Long]], w: Array[Array[Long]],
      b: Array[Long]) {
    val classes: Int = w.length
    val dim: Int = w(0).length

    def logit(k: Int, x: Array[Long]): Long = {
      var s = b(k)
      var j = 0
      while (j < dim) { s += w(k)(j) * x(j); j += 1 }
      s
    }

    /** argmax over classes; ties go to the LOWER class id (the
      * oracle's `ORDER BY logit DESC, k` row_number order). */
    def predict(x: Array[Long]): Int = {
      var best = 0
      var bestV = logit(0, x)
      var k = 1
      while (k < classes) {
        val v = logit(k, x)
        if (v > bestV) { best = k; bestV = v }
        k += 1
      }
      best
    }
  }

  /** Loaded once per JVM from the classpath — the per-executor model
    * load a mapPartitions/flatMapGroups inference mount amortizes. */
  lazy val model: Model = {
    val in = getClass.getResourceAsStream("/graft/asr_tiny.txt")
    require(in != null, "asr_tiny.txt missing from classpath")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try {
      val rows = src.getLines().filterNot(_.startsWith("#")).toVector
      def mat(p: String): Array[Array[Long]] = rows
        .filter(_.startsWith(p + " "))
        .map(_.drop(p.length + 1).trim.split("\\s+").map(_.toLong))
        .toArray
      val m = Model(mat("tmpl"), mat("w"), mat("b").head)
      require(m.tmpl.length == m.classes && m.b.length == m.classes,
        "model shape mismatch")
      m
    } finally src.close()
  }
}
