package graft

/** Standalone DRAM-bandwidth probe (round-20, verdict r19 item 3): runs
  * Bench's exact memProbe out-of-band so the cross-day band can accumulate
  * without a 130 s bench run attached. Prints one JSON line with the
  * probe value, thread count, and load average — append the values to
  * BENCH_README's band table. Usage:
  * `SPARK_GRAFT_CPUS=32 Test/runMain graft.MemProbeMain [reps]`.
  */
object MemProbeMain {
  def main(args: Array[String]): Unit = {
    val n = math.max(1, sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt)
    val reps = if (args.nonEmpty) args(0).toInt else 2
    val load =
      try {
        val parts = java.nio.file.Files
          .readString(java.nio.file.Paths.get("/proc/loadavg")).split(" ")
        parts(0).toDouble
      } catch { case scala.util.control.NonFatal(_) => -1.0 }
    val vs = (1 to reps).map(_ => Bench.memProbe(n))
    println(s"""{"metric":"calib_mem","threads":$n,"load_avg":$load,""" +
      s""""values":${vs.mkString("[", ",", "]")}}""")
  }
}
