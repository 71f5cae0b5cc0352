package graft

/** In-harness phase timings for the bench artifact: the two streaming
  * lifecycles (q109, q111) cost almost no dataflow — their wall-clock
  * is query-start/checkpoint/dial latency, which inflates ~4× under a
  * contended driver window while ordinary queries inflate ~1.1-1.3×.
  * Recording each lifecycle phase INSIDE the harness lets a reviewer
  * attribute a slow recorded number to environment (all phases
  * uniformly inflated) vs a real regression (one phase moved), without
  * needing a clean re-run. Bench emits the map as `"phases"` in the
  * bench_results.json file artifact; the last sample of each query
  * wins (phases are keyed `qNNN.<phase>`). */
object BenchPhases {
  private val timings =
    new java.util.concurrent.ConcurrentHashMap[String, Double]()

  def timed[T](name: String)(body: => T): T = {
    val t0 = System.nanoTime()
    try body
    finally {
      timings.put(name, (System.nanoTime() - t0) / 1e9)
      ()
    }
  }

  def snapshot: Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    timings.asScala.toMap
  }
}
