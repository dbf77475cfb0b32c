package graft.functions

/** A TRAINED greedy bigram decoder as a chat reply kernel — the
  * learned replacement for e40's caller-supplied closure, wiring
  * t18's in-plan-trained model (prev token → argmax continuation)
  * into the [[graft.streaming.StateMachines.Chat]] machine
  * (llamacppchat.py:49-77's `chat` call, with the model a trained
  * artifact rather than an injected stub).
  *
  * Model shipping follows the production pattern m15's ASR proved
  * (weights ride a path, not the closure): the training plan WRITES
  * the model distributed (`\t`-separated text — tokens are
  * `\s+`-split so a tab can never occur inside one), and each
  * executor loads it lazily ONCE per JVM from the shared path
  * (`@transient lazy` — on a cluster the path is HDFS/S3; the local
  * engine reads the same layout from the local FS). No `collect()`:
  * the model never passes through the driver.
  *
  * Decoding is greedy over the rolling context: the next token
  * depends only on the LAST context token (the bigram property), so
  * `reply = follow the argmax chain up to `steps` tokens`; an
  * out-of-vocabulary tail falls back to the fixed token "ok"
  * (deterministic on both engines — the oracle mirrors it with a
  * COALESCE).
  */
final case class BigramLm(dir: String, steps: Int)
    extends (Vector[(String, String)] => String) with Serializable {
  require(steps >= 1, "decode at least one token")

  @transient private lazy val table: Map[String, String] = {
    val d = java.nio.file.Paths.get(dir)
    val listing = java.nio.file.Files.list(d)
    val b = Map.newBuilder[String, String]
    try {
      val files = listing.iterator()
      while (files.hasNext) {
        val f = files.next()
        if (f.getFileName.toString.startsWith("part-")) {
          val lines = java.nio.file.Files.readAllLines(f).iterator()
          while (lines.hasNext) {
            val line = lines.next()
            val cut = line.indexOf('\t')
            if (cut > 0) b += line.substring(0, cut) -> line.substring(cut + 1)
          }
        }
      }
    } finally listing.close() // directory handle
    b.result()
  }

  def apply(context: Vector[(String, String)]): String = {
    var cur = context.last._2.trim.split("\\s+").last
    val out = Vector.newBuilder[String]
    var n = 0
    var more = true
    while (n < steps && more) table.get(cur) match {
      case Some(nxt) => out += nxt; cur = nxt; n += 1
      case None => more = false
    }
    val r = out.result()
    if (r.isEmpty) "ok" else r.mkString(" ")
  }
}
