package graft.sources

/** An MSB-first binary PREFIX CODE — the shared table shape behind
  * every codeword-table seam in the codec layer (MP3's Huffman pair
  * tables B.5–B.7, AAC's spectral codebooks A.2–A.12, H.264's CAVLC
  * tables 9-5/9-7/9-10, MP2's allocation columns): a set of
  * (value, len, code) rows where no codeword is a prefix of another.
  * The codec STRUCTURE around each table is implemented from spec
  * text; the tables themselves are appendix DATA that a user injects
  * via [[graft.functions.CodecProfileJson]] — this class is the
  * value-swap container (same seam class as
  * [[graft.functions.Vp8.Profile]]).
  *
  * Encoding writes `len` bits of `code` MSB-first; decoding walks the
  * stream bit by bit until a codeword matches (bounded by the longest
  * codeword, so a corrupt stream fails loudly instead of spinning). */
final case class Vlc(entries: Vector[Vlc.Entry]) {
  require(entries.nonEmpty, "vlc: empty code table")
  entries.foreach { e =>
    require(e.len >= 1 && e.len <= 24, s"vlc: codeword length ${e.len}")
    require(e.code >= 0 && (e.len == 24 || e.code < (1 << e.len)),
      s"vlc: code ${e.code} does not fit ${e.len} bits")
  }
  require(entries.map(_.value).distinct.length == entries.length,
    "vlc: duplicate values")
  require(entries.map(e => (e.len, e.code)).distinct.length ==
    entries.length, "vlc: duplicate codewords")
  // prefix-freedom: sort by (padded code, len); a prefix pair sorts
  // adjacent with the shorter first and the longer sharing its bits
  private val sorted = entries.sortBy(e => (e.code.toLong << (24 - e.len), e.len))
  sorted.sliding(2).foreach {
    case Seq(a, b) =>
      require(a.len >= b.len ||
        (b.code >> (b.len - a.len)) != a.code,
        s"vlc: codeword ${a.code}/${a.len} is a prefix of " +
          s"${b.code}/${b.len}")
    case _ => ()
  }

  val maxLen: Int = entries.map(_.len).max
  private val byValue: Map[Int, Vlc.Entry] =
    entries.map(e => e.value -> e).toMap
  private val byCode: Map[(Int, Int), Int] =
    entries.map(e => (e.len, e.code) -> e.value).toMap

  def has(value: Int): Boolean = byValue.contains(value)
  def values: Set[Int] = byValue.keySet

  /** Codeword length of `value` (part-length arithmetic). */
  def bits(value: Int): Int = byValue.get(value) match {
    case Some(e) => e.len
    case None => throw new IllegalArgumentException(
      s"vlc: value $value has no codeword")
  }

  /** Write `value`'s codeword through `sink(bits, n)` (MSB-first). */
  def write(sink: (Long, Int) => Unit, value: Int): Unit = {
    val e = byValue.getOrElse(value, throw new IllegalArgumentException(
      s"vlc: value $value has no codeword"))
    sink(e.code.toLong, e.len)
  }

  /** Read one codeword via `readBits(n) => bits`; fails loudly past
    * the longest codeword. */
  def read(readBits: Int => Long): Int = {
    var code = 0
    var len = 0
    while (len < maxLen) {
      code = (code << 1) | readBits(1).toInt
      len += 1
      byCode.get((len, code)) match {
        case Some(v) => return v
        case None => ()
      }
    }
    throw new IllegalArgumentException(
      s"vlc: no codeword matches after $maxLen bits (code $code)")
  }
}

object Vlc {
  /** One code-table row: decoded `value`, codeword `code` of `len`
    * bits (MSB-first). */
  final case class Entry(value: Int, len: Int, code: Int)

  /** A fixed-length code: each value in `values` coded as itself in
    * `width` bits — the degenerate prefix code every stand-in field
    * is, and the form some REAL appendix tables take (MP3's count1
    * table B is 4-bit FLC; H.264's coeff_token nC ≥ 8 column is
    * 6-bit FLC). */
  def flc(width: Int, values: Seq[Int]): Vlc = {
    require(values.forall(v => v >= 0 && v < (1 << width)),
      s"vlc: flc($width) values out of range")
    Vlc(values.toVector.map(v => Entry(v, width, v)))
  }

  /** A canonical code assigning length `lens(i)` to `values(i)` —
    * convenience for specs that need a VALID nontrivial prefix code
    * without hand-picking codewords (Kraft sum must be ≤ 1). */
  def canonical(pairs: Seq[(Int, Int)]): Vlc = {
    val byLen = pairs.sortBy(p => (p._2, p._1))
    var code = 0
    var prevLen = 0
    val entries = byLen.map { case (value, len) =>
      require(len >= prevLen, "vlc: canonical needs sorted lengths")
      code <<= (len - prevLen)
      prevLen = len
      val e = Entry(value, len, code)
      code += 1
      e
    }
    Vlc(entries.toVector)
  }
}
