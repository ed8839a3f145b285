package graft

/** Shared bench measurement helpers. The whole methodology here hinges
  * on steal-stamped walls (BENCH.md), so there is exactly ONE
  * /proc/stat parser — every artifact's steal column is comparable by
  * construction.
  */
private[graft] object BenchUtil {

  /** (stealTicks, totalTicks) from the aggregate /proc/stat cpu line. */
  def cpuTicks(): (Long, Long) = {
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try {
        val f = src.getLines().next().trim.split("\\s+").drop(1).map(_.toLong)
        (if (f.length > 7) f(7) else 0L, f.sum)
      } finally src.close()
    } catch { case _: Exception => (0L, 0L) }
  }
}
