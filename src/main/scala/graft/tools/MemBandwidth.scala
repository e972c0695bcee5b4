package graft.tools

/** Pure memory-bandwidth saturation probe (no Spark, no allocation in
  * the timed loop): N threads each stream-sum a PRIVATE 256 MB long
  * array; aggregate GB/s at each thread count bounds what ANY
  * memory-resident workload can achieve at that width on this machine.
  * The extraction job's full-width scaling efficiency cannot exceed
  * this curve's — run with the same levels to adjudicate how much of
  * the 8→32 gap is machine memory bandwidth rather than engine design.
  *
  *   runMain graft.tools.MemBandwidth [mbPerThread] [passes] [levels]
  */
object MemBandwidth {
  def main(args: Array[String]): Unit = {
    val mb = if (args.length > 0) args(0).toInt else 256
    val passes = if (args.length > 1) args(1).toInt else 3
    val levels = (if (args.length > 2) args(2) else "1,8,16,24,32")
      .split(",").map(_.trim.toInt).toSeq
    val longsPerThread = mb.toLong * 1024 * 1024 / 8

    def run(threads: Int): Double = {
      val arrays = Array.fill(threads)(new Array[Long](longsPerThread.toInt))
      // touch (physically back) every page before timing
      arrays.foreach { a => var i = 0; while (i < a.length) { a(i) = i; i += 4096 / 8 } }
      val sink = new java.util.concurrent.atomic.AtomicLong()
      val barrier = new java.util.concurrent.CyclicBarrier(threads + 1)
      val ts = arrays.map { a =>
        val t = new Thread(() => {
          barrier.await()
          var p = 0
          var s = 0L
          while (p < passes) {
            var i = 0
            while (i < a.length) { s += a(i); i += 1 } // 8 B/iter stream read
            p += 1
          }
          sink.addAndGet(s)
          ()
        })
        t.start(); t
      }
      barrier.await()
      val t0 = System.nanoTime()
      ts.foreach(_.join())
      val secs = (System.nanoTime() - t0) / 1e9
      val bytes = threads.toLong * longsPerThread * 8 * passes
      bytes / secs / 1e9
    }

    run(2) // JIT warm-up
    val best = scala.collection.mutable.Map.empty[Int, Double]
    for (v <- 1 to 3; n <- levels) {
      val gbs = run(n)
      if (gbs > best.getOrElse(n, 0.0)) best(n) = gbs
      println(f"visit $v threads=$n%2d: $gbs%7.1f GB/s aggregate (${gbs / n}%6.2f /thread)")
    }
    println("\n== best per level ==")
    val base = levels.head
    levels.foreach { n =>
      val e = (best(n) / best(base)) / (n.toDouble / base)
      println(f"threads=$n%2d: ${best(n)}%7.1f GB/s  (${best(n) / n}%6.2f /thread, eff-vs-$base=${e}%.3f)")
    }
  }
}
