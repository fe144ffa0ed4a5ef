package graft.functions

/** Shared deterministic hashing helpers (md5 hex matches Spark's `md5`
  * over UTF-8 bytes and DuckDB's `md5` bit-for-bit — the only hash the
  * two engines share, see the oracle-parity notes in README). */
object Hashing {
  def md5hex(v: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(v.getBytes("UTF-8"))
    val sb = new StringBuilder(32)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }
}
