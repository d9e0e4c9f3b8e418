package graft

import org.apache.spark.sql.functions._
import graft.io.{Manifest, Sinks}

/** Randomized crash-monkey over the staged-write protocols (VERDICT
  * r14 next-round #2): the per-op crash windows are hand-pinned in
  * SinksSpec/OpsSpec/CompactionSpec, but their COMPOSITION — N random
  * maintenance ops interleaved on ONE table tree with a kill at a
  * random mutation boundary, then the recovery preambles — is exactly
  * where repair-ordering bugs (repairRetention before upsert repair,
  * resurrect-vs-drop races) surface first.
  *
  * Harness: every op runs against a `monkey://` table
  * ([[MonkeyFileSystem]]) with a kill armed at a uniformly random
  * mutation ordinal inside the op's observed mutation budget; after a
  * kill the harness disarms, runs the same repair preamble every
  * entry point runs, reads the table, and asserts ATOMICITY — the
  * state equals the pre-op model or the post-op model, nothing in
  * between — then adopts whichever matched and keeps going. Ops that
  * complete unkilled must land exactly on the post-op model.
  *
  * The op mix is the partitioned-table lifecycle: keyed upsert merge,
  * TTL retention, targeted key purge, compaction, manifest vacuum.
  * Kill count defaults to a CI-sized sweep; set GRAFT_MONKEY_KILLS
  * (e.g. 1000) for the full round-gate sweep. Seeded: the sequence of
  * ops and batches replays from GRAFT_MONKEY_SEED, though kill
  * ordinals land on task-scheduling-dependent mutations, so the
  * assertions are invariant-based, never golden.
  */
class CrashMonkeySpec extends SparkSpec {
  import spark.implicits._

  private val targetKills =
    sys.env.getOrElse("GRAFT_MONKEY_KILLS", "160").toInt
  private val seed = sys.env.getOrElse("GRAFT_MONKEY_SEED", "1237").toLong

  private type Model = Map[String, (Double, String)] // user -> (value, date)

  private val dates = Vector("2024-01-01", "2024-01-02",
    "2024-01-03", "2024-01-04")
  // user -> date is FIXED (upsertPartitioned's functional-determination
  // contract: the partition value is determined by the key)
  private def dateOf(u: Int): String = dates(u % dates.length)
  private def user(u: Int): String = f"u$u%02d"

  private def toDf(rows: Seq[(String, Double, String)]) =
    rows.toDF("user", "value", "date")

  private def readState(dir: String): Model =
    // partition discovery infers yyyy-MM-dd as DATE — cast back so the
    // model compares strings regardless of inference
    spark.read.parquet(dir)
      .select(col("user"), col("value"), col("date").cast("string"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getString(2))).toMap

  /** The canonical entry-point repair preamble (the order
    * deleteKeysPartitioned/upsertPartitioned use: a committed
    * retention drop completes BEFORE the upsert repair could
    * resurrect its partitions).
    */
  private def repair(dir: String): Unit = {
    Sinks.repairRetention(spark, dir)
    Sinks.repairPartitionedUpsert(spark, dir)
    graft.ops.Compaction.repairPartitioned(spark, dir)
  }

  private sealed trait Op {
    def name: String
    def run(dir: String): Unit
    def post(m: Model): Model
  }

  test(s"random op interleaving with $targetKills kills stays atomic (seed $seed)") {
    val rnd = new scala.util.Random(seed)
    val base = java.nio.file.Files.createTempDirectory("graft_monkey")
    val dir = s"monkey://${base.toString}/t"
    spark.sparkContext.hadoopConfiguration
      .set("fs.monkey.impl", classOf[MonkeyFileSystem].getName)

    def mkUpsert(): Op = {
      val n = 4 + rnd.nextInt(8)
      val batch = Seq.fill(n) {
        val u = rnd.nextInt(20)
        (user(u), math.round(rnd.nextDouble() * 1000) / 10.0, dateOf(u))
      }.distinctBy(_._1)
      new Op {
        val name = s"upsert(${batch.size})"
        def run(dir: String): Unit = Sinks.upsertPartitioned(
          spark, toDf(batch), dir, Seq("user"), "date")
        def post(m: Model): Model =
          m ++ batch.map { case (u, v, d) => u -> (v, d) }
      }
    }
    def mkRetention(m: Model): Op = {
      // cutoff keeps at least the newest date present, so the
      // drop-everything refusal never fires
      val present = m.values.map(_._2).toVector.distinct.sorted
      val cutoff =
        if (present.isEmpty) dates.head
        else present(rnd.nextInt(present.length))
      new Op {
        val name = s"retention(>=$cutoff)"
        def run(dir: String): Unit =
          Sinks.dropPartitions(spark, dir, "date", v => v >= lit(cutoff))
        def post(m: Model): Model = m.filter(_._2._2 >= cutoff)
      }
    }
    def mkPurge(m: Model): Op = {
      val pool = m.keys.toVector.sorted
      val doomed = (0 until (1 + rnd.nextInt(3))).map { _ =>
        if (pool.nonEmpty && rnd.nextBoolean()) pool(rnd.nextInt(pool.length))
        else user(rnd.nextInt(25)) // sometimes absent keys — a no-op purge
      }.distinct
      new Op {
        val name = s"purge(${doomed.mkString(",")})"
        def run(dir: String): Unit = Sinks.deleteKeysPartitioned(
          spark, doomed.toDF("user"), dir, Seq("user"), "date")
        def post(m: Model): Model = m.removedAll(doomed)
      }
    }
    val compactOp: Op = new Op {
      val name = "compact"
      def run(dir: String): Unit =
        graft.ops.Compaction.compactPartitioned(spark, dir, 1L << 24)
      def post(m: Model): Model = m
    }
    val vacuumOp: Op = new Op {
      val name = "vacuum"
      def run(dir: String): Unit = Manifest.vacuum(spark, dir, 2)
      def post(m: Model): Model = m
    }

    // bootstrap UNKILLED: table creation is a plain first write, not a
    // staged protocol — the monkey exercises mutations of an EXISTING
    // table, which is what the swap disciplines cover
    var model: Model = Map.empty
    val boot = mkUpsert()
    boot.run(dir); model = boot.post(model)
    assert(readState(dir) == model, "bootstrap upsert must land exactly")

    // observed mutation budget per op name — kills are placed uniformly
    // inside the last observed budget so they land in real windows
    val budget = scala.collection.mutable.Map[String, Long]()
    var kills = 0; var steps = 0; var completedKilled = 0; var rolledBack = 0
    while (kills < targetKills) {
      steps += 1
      val op =
        if (model.size < 6) mkUpsert() // keep the table populated
        else rnd.nextInt(10) match {
          case 0 | 1 | 2 | 3 => mkUpsert()
          case 4 | 5         => mkRetention(model)
          case 6 | 7         => mkPurge(model)
          case 8             => compactOp
          case _             => vacuumOp
        }
      val opKey = op.name.takeWhile(_ != '(')
      val known = budget.get(opKey)
      val tryKill = known.isDefined && rnd.nextDouble() < 0.8
      if (tryKill) MonkeyFileSystem.arm(1 + rnd.nextLong(known.get))
      else MonkeyFileSystem.resetCount()
      val outcome =
        try { op.run(dir); Right(MonkeyFileSystem.mutations) }
        catch {
          case t: Throwable if MonkeyFileSystem.killed(t) => Left(t)
          case t: Throwable =>
            MonkeyFileSystem.disarm()
            fail(s"step $steps ${op.name} (seed $seed): non-monkey failure: $t", t)
        }
      MonkeyFileSystem.disarm()
      outcome match {
        case Right(muts) =>
          if (!tryKill && muts > 0) budget(opKey) = muts
          repair(dir) // must be a no-op after a clean run
          val got = readState(dir)
          assert(got == op.post(model),
            s"step $steps ${op.name} (seed $seed): clean run diverged from model")
          model = op.post(model)
        case Left(_) =>
          kills += 1
          repair(dir)
          val got = readState(dir)
          val pre = model; val post = op.post(model)
          if (got == post) { completedKilled += 1; model = post }
          else if (got == pre) rolledBack += 1
          else fail(s"step $steps ${op.name} killed (seed $seed): state is " +
            s"NEITHER pre nor post — atomicity broken.\n got=$got\n pre=$pre\n post=$post")
          // a second repair pass must be idempotent
          repair(dir)
          assert(readState(dir) == model,
            s"step $steps ${op.name} (seed $seed): repair is not idempotent")
      }
    }
    info(s"monkey: $steps steps, $kills kills " +
      s"($rolledBack rolled back, $completedKilled rolled forward), " +
      s"budgets=${budget.toMap}")
    // final state must also survive a full vacuum + re-read
    Manifest.vacuum(spark, dir, 1)
    assert(readState(dir) == model, "post-sweep vacuum changed data")
    org.apache.commons.io.FileUtils.deleteQuietly(base.toFile)
  }
}
