package graft.tools

/** Pure-register CPU scaling probe: per-thread xorshift throughput at 1, 2,
  * 4, 8, 16 and 32 threads. No allocation, no shared memory, no syscalls in
  * the hot loop — isolates the HOST's frequency/SMT curve from every job
  * effect (GC, allocator, bandwidth). Run when a thread-scaling number needs
  * a hardware baseline.
  *
  * Measured on this VM (2026-08-18, 32-vCPU Xeon 2.70GHz, 3 reps):
  * per-thread rate is FLAT from 1 to 8 threads (449-469 Miter/s at 1 thread
  * vs 348-464 at 4 and 381-458 at 8 — rep spread is window noise, minima
  * ratio 1→4 = 0.99, 1→8 = 0.98) and drops to ~0.61-0.68 at 32 threads.
  * Conclusions: (a) no single-core turbo — a 1-thread baseline is NOT
  * hardware-inflated; (b) the ~40% per-thread gap the EXTRACTION job shows
  * between local[1] (4.2k docs/s) and local[4/8] (~3.0k docs/s/thread) is
  * therefore not the CPU — it is JVM background work (GC, JIT, Spark
  * runtime) spilling onto the 31 idle cores at low N, which is why bench
  * scaling levels are pinned to exactly N cores (Bench.CpuPin).
  *
  * sbt -batch "runMain graft.tools.CpuProbe [itersPerThread] [reps]" */
object CpuProbe {
  private def spin(iters: Long): Long = {
    var x = 88172645463325252L
    var i = 0L
    while (i < iters) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      i += 1
    }
    x
  }

  def main(args: Array[String]): Unit = {
    val iters = if (args.nonEmpty) args(0).toLong else 800000000L
    val reps = if (args.length > 1) args(1).toInt else 3
    spin(iters / 4) // JIT warmup
    val sink = new java.util.concurrent.atomic.AtomicLong()
    for (rep <- 1 to reps; n <- Seq(1, 2, 4, 8, 16, 32)) {
      val t0 = System.nanoTime()
      val ts = (1 to n).map { _ =>
        val t = new Thread(() => sink.addAndGet(spin(iters)))
        t.start(); t
      }
      ts.foreach(_.join())
      val sec = (System.nanoTime() - t0) / 1e9
      val perThread = iters / sec / 1e6
      println(f"[cpuprobe] rep=$rep threads=$n%2d wall=$sec%6.2fs " +
        f"per-thread=$perThread%7.1f Miter/s total=${perThread * n}%8.1f Miter/s " +
        s"ts=${java.time.Instant.now}")
    }
  }
}
