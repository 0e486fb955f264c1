package graft.delayed

import java.util.concurrent.{ConcurrentHashMap, CountDownLatch, LinkedBlockingQueue, Semaphore, TimeUnit}
import scala.concurrent.duration.Duration

/** Client-side coordination primitives — the rebuild of the reference's
  * shared-state surface (`Queue`/`Variable`/`Lock`,
  * SS/wukong/__init__.py:5-29, tests/test_queues.py, test_variable.py,
  * test_locks.py).
  *
  * Scope note (SURVEY §1.1): in the reference these objects live on the
  * scheduler so MULTIPLE clients can coordinate; the Spark rebuild runs
  * one driver program, so the same API coordinates concurrent workflows
  * (futures, delayed graphs, streaming callbacks) inside that driver.
  * Values of distributed data are handles (DataFrames, futures,
  * broadcasts) — never materialized rows — so putting a "dataset" on a
  * queue moves a plan, not data, exactly like the reference's key-based
  * handles.
  */
object Coordination {

  /** distributed.Queue analog: blocking multi-producer/multi-consumer
    * handoff between concurrent client workflows. */
  final class GQueue[T](maxSize: Int = Int.MaxValue) {
    private val q = new LinkedBlockingQueue[T](maxSize)
    def put(v: T): Unit = q.put(v)
    def get(atMost: Duration = Duration.Inf): T =
      if (atMost.isFinite) {
        val v = q.poll(atMost.toMillis, TimeUnit.MILLISECONDS)
        if (v == null) throw new java.util.concurrent.TimeoutException("GQueue.get timed out")
        v
      } else q.take()
    def size: Int = q.size()
  }

  /** distributed.Variable analog: a named, settable cell; `get` blocks
    * until the first `set` (the reference's "wait until someone
    * publishes" semantics). */
  final class GVariable[T] {
    @volatile private var value: Option[T] = None
    private val first = new CountDownLatch(1)
    def set(v: T): Unit = { value = Some(v); first.countDown() }
    def get(atMost: Duration = Duration.Inf): T = {
      if (atMost.isFinite) {
        if (!first.await(atMost.toMillis, TimeUnit.MILLISECONDS))
          throw new java.util.concurrent.TimeoutException("GVariable.get timed out")
      } else first.await()
      value.get
    }
    def isSet: Boolean = value.isDefined
  }

  /** distributed.Lock analog: named re-entrant-free mutual exclusion for
    * critical sections across concurrent submitted tasks. */
  final class GLock {
    private val sem = new Semaphore(1, true)
    def acquire(): Unit = sem.acquire()
    def release(): Unit = sem.release()
    def withLock[T](f: => T): T = { acquire(); try f finally release() }
  }

  /** Named registries (the reference addresses all three by name). */
  private val queues = new ConcurrentHashMap[String, GQueue[Any]]()
  private val variables = new ConcurrentHashMap[String, GVariable[Any]]()
  private val locks = new ConcurrentHashMap[String, GLock]()

  def queue[T](name: String): GQueue[T] =
    queues.computeIfAbsent(name, _ => new GQueue[Any]()).asInstanceOf[GQueue[T]]
  def variable[T](name: String): GVariable[T] =
    variables.computeIfAbsent(name, _ => new GVariable[Any]()).asInstanceOf[GVariable[T]]
  def lock(name: String): GLock =
    locks.computeIfAbsent(name, _ => new GLock())
}
