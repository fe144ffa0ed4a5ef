package graft.functions

/** Shared deterministic hashing helpers (md5 hex matches Spark's `md5`
  * over UTF-8 bytes and DuckDB's `md5` bit-for-bit — the only hash the
  * two engines share, see the oracle-parity notes in README). */
object Hashing {

  // r9 (guide §1.2 step 2 — per-task work): md5hex is called per TOKEN
  // by the det-corpus synthesis every kg_* entry runs, and the old body
  // paid a java.util.Formatter construction + format-string parse PER
  // BYTE (f"%02x" — ~20% of the cascade's execution samples) plus a
  // MessageDigest provider lookup and a charset-name lookup per call.
  // Now: nibble lookup table, thread-local digest (reset per call),
  // constant Charset. Output is byte-identical.
  private val hexChars = "0123456789abcdef".toCharArray
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def md5hex(v: String): String = {
    val md = digests.get()
    md.reset()
    val d = md.digest(v.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(i * 2) = hexChars((d(i) & 0xf0) >> 4)
      out(i * 2 + 1) = hexChars(d(i) & 0x0f)
      i += 1
    }
    new String(out)
  }
}
