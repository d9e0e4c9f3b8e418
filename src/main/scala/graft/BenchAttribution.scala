package graft

/** In-process cost attribution for registry rows whose closure pays
  * BENCH SCAFFOLDING a production pipeline never pays (VERDICT r17
  * #7): `stream_dedup_indexed` copies a template dedup index per
  * invocation because the stream APPENDS to it — a real service owns
  * ONE standing index and appends to it daily, so the copy is pure
  * harness cost, yet it rides inside the timed closure and inflates
  * the headline row.
  *
  * Rows record named sections here ([[timed]]); [[Bench]] emits the
  * last-invocation seconds per section as `"attribution":{...}` in
  * the artifact's env block, so a reader can split a row's wall time
  * into scaffold vs the work a production deployment would actually
  * pay — WITHOUT changing what the row times (the headline number
  * stays comparable across rounds; the attribution is an overlay).
  *
  * Last-invocation (not min-over-iterations) is the honest choice:
  * Bench reports the min over ≥2 timed iterations per row, and the
  * sections of the MIN iteration are not identifiable after the fact;
  * the last iteration is a steady-state one (never the warmup), which
  * is what the decomposition is for. Values are advisory diagnostics,
  * not gates — nothing guards on them.
  */
object BenchAttribution {
  // process-global and JVM-lifetime by design (sections survive until
  // [[reset]]): fine for the one-key-per-JVM ladder, but a multi-run
  // JVM would otherwise emit stale cross-run values as this run's
  // decomposition — Bench.main resets at run start (ADVICE r18)
  private val sections =
    new java.util.concurrent.ConcurrentHashMap[String, Double]()

  /** Drop every recorded section — call at the start of a measurement
    * run so its artifact's attribution reflects only that run.
    */
  def reset(): Unit = sections.clear()

  /** Record `sec` for `key` (e.g. "stream_dedup_indexed.copy_index"),
    * overwriting the previous invocation's value.
    */
  def record(key: String, sec: Double): Unit = sections.put(key, sec)

  /** Time `body` and record it under `key`. Records on failure too —
    * a section that threw after 30 s is exactly what the reader needs
    * to see.
    */
  def timed[T](key: String)(body: => T): T = {
    val t0 = System.nanoTime()
    try body
    finally record(key, (System.nanoTime() - t0) / 1e9)
  }

  /** Snapshot for artifact emission, sorted by key for stable JSON. */
  def snapshot: Seq[(String, Double)] = {
    import scala.jdk.CollectionConverters._
    sections.asScala.toSeq.sortBy(_._1)
  }
}
