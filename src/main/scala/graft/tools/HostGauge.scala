package graft.tools

/** Host-health gauges shared by Bench / ScaleSweep / CanonProbe / probes.
  *
  * Two failure modes this factoring fixes (ADVICE r7):
  *  - the per-tool stealJiffies() copies returned 0 on ANY /proc/stat
  *    read failure, so on a host where the gate cannot be read every
  *    sample silently counted as steal-clean — [[stealJiffies]] now
  *    returns None for "unreadable" and callers record those samples as
  *    UNGATED in their artifacts, distinct from a genuine 0-steal read;
  *  - the r7 bench regression (65.5 → 110.9 s warm on near-identical
  *    code) was attributed to ambient host I/O but nothing MEASURED the
  *    disk (VERDICT r7 What's-wrong #2) — [[ioCanary]] O_DIRECT-reads a
  *    fixed 1 GiB file (page cache bypassed, so the number is device
  *    throughput under the window's ambient load, not memory bandwidth)
  *    and fsync-writes 256 MiB, so a degraded bench window carries its
  *    own disk evidence.
  */
object HostGauge {

  /** Steal-burst threshold shared by every gated tool: a window whose
    * cumulative steal delta exceeds this many jiffies (~20 CPU-seconds
    * at 100 Hz) is noisy-neighbor-polluted and must not enter a warm
    * floor. */
  val StealCleanThreshold = 2000L

  /** Cumulative steal jiffies across all cpus (/proc/stat "cpu" line,
    * field 8). None when /proc/stat cannot be read or parsed — callers
    * MUST treat None-gated samples as ungated (recorded as such), never
    * as clean. */
  def stealJiffies(): Option[Long] = scala.util.Try {
    val src = scala.io.Source.fromFile("/proc/stat")
    try src.getLines().next().trim.split("\\s+").drop(1).lift(7).map(_.toLong)
    finally src.close()
  }.toOption.flatten

  /** Run `f` inside a steal window. Returns (result, Some(delta)) when
    * both boundary reads succeeded, (result, None) when the gate was
    * unreadable. */
  def stealWindow[A](f: => A): (A, Option[Long]) = {
    val s0 = stealJiffies()
    val r = f
    val s1 = stealJiffies()
    (r, for (a <- s0; b <- s1) yield b - a)
  }

  /** A sample is CLEAN only when the gate was readable AND under the
    * threshold; None (unreadable) is ungated, not clean. */
  def isClean(delta: Option[Long]): Boolean =
    delta.exists(_ < StealCleanThreshold)

  // ---------------------------------------------------------------- I/O

  private val canaryPath = java.nio.file.Paths.get("/tmp/graft-io-canary-1g.bin")
  private val CanaryBytes: Long = 1L << 30 // 1 GiB read target
  private val WriteBytes: Long = 256L << 20 // 256 MiB write target
  private val Align = 4096
  private val Chunk = 4 << 20

  /** Write-once canary file (1 GiB of a fixed pattern on the same ext4
    * device as the testdata and /tmp fixtures). Non-zero pattern so a
    * hypothetical hole-punching layer can't satisfy reads from nothing. */
  def ensureCanaryFile(): Unit = {
    val f = canaryPath.toFile
    if (f.isFile && f.length() == CanaryBytes) return
    val ch = java.nio.channels.FileChannel.open(canaryPath,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE,
      java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
    try {
      val buf = java.nio.ByteBuffer.allocateDirect(Chunk)
      var i = 0
      while (buf.hasRemaining) { buf.put((i * 131 + 17).toByte); i += 1 }
      var written = 0L
      while (written < CanaryBytes) {
        buf.rewind()
        written += ch.write(buf)
      }
      ch.force(false)
    } finally ch.close()
  }

  /** One canary probe: (read MB/s, write MB/s, direct?). The read is
    * O_DIRECT (falls back to a buffered read with direct=false on
    * filesystems that refuse it — that variant only measures page-cache
    * bandwidth and callers should weigh it accordingly); the write is
    * 256 MiB + fsync to a scratch file, then deleted. */
  def ioCanary(): (Double, Double, Boolean) = {
    ensureCanaryFile()
    val (readMBps, direct) = readCanaryMBps()
    (readMBps, writeCanaryMBps(), direct)
  }

  private def readCanaryMBps(): (Double, Boolean) = {
    val direct = scala.util.Try(
      java.nio.channels.FileChannel.open(canaryPath,
        java.nio.file.StandardOpenOption.READ,
        com.sun.nio.file.ExtendedOpenOption.DIRECT))
    val (ch, isDirect) = direct match {
      case scala.util.Success(c) => (c, true)
      case scala.util.Failure(_) =>
        (java.nio.channels.FileChannel.open(canaryPath,
          java.nio.file.StandardOpenOption.READ), false)
    }
    try {
      // O_DIRECT needs position, length, and buffer address all
      // block-aligned; alignedSlice handles the address, Chunk is a
      // multiple of 4096 for the rest
      val buf = java.nio.ByteBuffer.allocateDirect(Chunk + Align).alignedSlice(Align)
      val t0 = System.nanoTime()
      var pos = 0L
      var eof = false
      while (pos < CanaryBytes && !eof) {
        buf.clear()
        val n = ch.read(buf, pos)
        if (n <= 0) eof = true else pos += n
      }
      val s = (System.nanoTime() - t0) / 1e9
      // divide ACTUAL bytes read, not the 1 GiB target (ADVICE r9): an
      // early EOF (canary truncated/removed by /tmp cleanup) previously
      // inflated the reading — a broken probe classified as a healthy
      // window. A short read now yields the true (low) throughput of
      // whatever was read, and a zero-byte probe reads 0.0 MB/s — both
      // err toward "degraded", never toward a fake clean window.
      (pos / 1048576.0 / s, isDirect)
    } finally ch.close()
  }

  private def writeCanaryMBps(): Double = {
    val p = java.nio.file.Paths.get(s"/tmp/graft-io-canary-write-${ProcessHandle.current().pid()}.bin")
    val ch = java.nio.channels.FileChannel.open(p,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE,
      java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
    try {
      val buf = java.nio.ByteBuffer.allocateDirect(Chunk)
      while (buf.hasRemaining) buf.put(0x5a.toByte)
      val t0 = System.nanoTime()
      var written = 0L
      while (written < WriteBytes) {
        buf.rewind()
        written += ch.write(buf)
      }
      ch.force(false)
      val s = (System.nanoTime() - t0) / 1e9
      WriteBytes / 1048576.0 / s
    } finally {
      ch.close()
      java.nio.file.Files.deleteIfExists(p)
    }
  }
}
