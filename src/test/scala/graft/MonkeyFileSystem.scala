package graft

import java.net.URI

import org.apache.hadoop.fs.{FSDataOutputStream, Path => HPath, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Fault-injecting local FileSystem for the crash-monkey sweep
  * (test-only): registered under the `monkey://` scheme, it delegates
  * to the local filesystem but counts every MUTATING call — create,
  * rename, delete, mkdirs, append — and, once armed past a threshold,
  * throws on that mutation AND every later one. The "and every later
  * one" half is what makes the injection a faithful process kill: a
  * crashed writer performs no further I/O of any kind, so a single
  * thrown call with later calls succeeding would model a transient
  * fault, not a crash. Reads keep working (the op under test aborts
  * via the thrown mutation within a few calls anyway), which lets the
  * harness inspect state without disarming mid-flight.
  *
  * Kill placement is by mutation ORDINAL, so one knob sweeps every
  * boundary of a staged-write protocol: inside the stage's task
  * files, between the txn-marker rename and the partition swaps,
  * mid-swap, during trash cleanup — wherever the op's n-th mutation
  * happens to land. Counters are JVM-global (local-mode executors
  * share the JVM), so parallel task mutations all count.
  */
class MonkeyFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "monkey"
  override def getUri: URI = URI.create("monkey:///")

  private def tick(): Unit = MonkeyFileSystem.tick()

  override def rename(src: HPath, dst: HPath): Boolean = {
    tick(); super.rename(src, dst)
  }
  override def delete(p: HPath, recursive: Boolean): Boolean = {
    tick(); super.delete(p, recursive)
  }
  override def mkdirs(p: HPath): Boolean = { tick(); super.mkdirs(p) }
  override def mkdirs(p: HPath, perm: FsPermission): Boolean = {
    tick(); super.mkdirs(p, perm)
  }
  override def create(f: HPath, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    tick()
    super.create(f, permission, overwrite, bufferSize, replication,
      blockSize, progress)
  }
  override def createNonRecursive(f: HPath, permission: FsPermission,
                                  overwrite: Boolean, bufferSize: Int,
                                  replication: Short, blockSize: Long,
                                  progress: Progressable): FSDataOutputStream = {
    tick()
    super.createNonRecursive(f, permission, overwrite, bufferSize,
      replication, blockSize, progress)
  }
  override def append(f: HPath, bufferSize: Int,
                      progress: Progressable): FSDataOutputStream = {
    tick(); super.append(f, bufferSize, progress)
  }
}

object MonkeyFileSystem {
  /** The injected crash. An IOException subclass so it travels the
    * same propagation paths a real storage failure would.
    */
  class Killed extends java.io.IOException("monkey: injected crash")

  private val counter = new java.util.concurrent.atomic.AtomicLong()
  @volatile private var killFrom: Long = Long.MaxValue

  /** Fail the `atMutation`-th mutating call (1-based) and every one
    * after it, counting from now.
    */
  def arm(atMutation: Long): Unit = {
    require(atMutation >= 1, s"kill ordinal must be >= 1: $atMutation")
    counter.set(0)
    killFrom = atMutation
  }

  /** Stop injecting; returns how many mutations were counted since
    * the last [[arm]]/[[resetCount]] (the op's mutation budget, used
    * to place the next kill inside a real window).
    */
  def disarm(): Long = { killFrom = Long.MaxValue; counter.get() }

  def resetCount(): Unit = counter.set(0)
  def mutations: Long = counter.get()

  private[graft] def tick(): Unit = {
    val n = counter.incrementAndGet()
    if (n >= killFrom) throw new Killed
  }

  /** True if the throwable chain contains an injected crash — Spark
    * wraps executor-side exceptions, sometimes flattening them to
    * message text, so both the class and the message are probed.
    */
  def killed(t: Throwable): Boolean =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(20).exists {
      c =>
        c.isInstanceOf[Killed] ||
          (c.getMessage != null && c.getMessage.contains("monkey: injected crash"))
    }
}
