package graft.delayed

import java.util.concurrent.{ConcurrentHashMap, CopyOnWriteArrayList, CountDownLatch, LinkedBlockingQueue, Semaphore, TimeUnit}
import scala.concurrent.duration.Duration
import scala.concurrent.{Future, Promise}

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

  /** distributed.Pub/Sub analog (the reference's control plane —
    * `SS/wukong/__init__.py:23` re-exports `Pub`/`Sub` from
    * distributed.pubsub; the Lambda executors coordinate over the same
    * publish/subscribe shape through Redis channels): named broadcast
    * channels with multi-subscriber fan-out. Each subscriber owns a
    * private queue; `put` enqueues into every queue registered
    * at publish time, so — dask semantics — a LATE subscriber sees only
    * messages published after it subscribed, and a channel with no
    * subscribers drops messages.
    *
    * Backpressure policy: each subscriber queue is bounded (default
    * 65,536 pending messages). A subscriber that stops consuming without
    * [[GSub.unsubscribe]] does NOT grow driver memory without bound —
    * once its queue is full the OLDEST pending message is dropped per
    * publish (`dropped` counts them), matching the lossy-broadcast
    * contract of the reference's Redis pub/sub (a slow Redis subscriber
    * loses messages; publishers are never blocked by one stuck
    * consumer). Pass `maxPending` to [[Coordination.sub]] to widen or
    * tighten the bound per subscriber. */
  final class GPub[T] private[delayed] (channel: String) {
    def put(v: T): Unit = {
      val subs = Coordination.subscribers.get(channel)
      if (subs != null) subs.forEach(_.offerDroppingOldest(v.asInstanceOf[Any]))
    }
  }

  final class GSub[T] private[delayed] (channel: String, maxPending: Int = 1 << 16) {
    private[delayed] val q = new LinkedBlockingQueue[Any](maxPending)
    private val droppedCount = new java.util.concurrent.atomic.AtomicLong(0L)
    /** Messages discarded because this subscriber's queue was full. */
    def dropped: Long = droppedCount.get()
    private[delayed] def offerDroppingOldest(v: Any): Unit = {
      while (!q.offer(v)) {
        if (q.poll() != null) {
          // make silent loss observable beyond the counter: warn once per
          // subscriber the first time it falls behind
          if (droppedCount.incrementAndGet() == 1L)
            System.err.println(s"[graft] pub/sub subscriber on '$channel' fell " +
              s"behind: dropping oldest pending messages (bound $maxPending); " +
              "see GSub.dropped for the running count")
        }
      }
    }
    /** Blocking next message (the reference's `sub.get()` / iteration). */
    def get(atMost: Duration = Duration.Inf): T =
      if (atMost.isFinite) {
        val v = q.poll(atMost.toMillis, TimeUnit.MILLISECONDS)
        if (v == null) throw new java.util.concurrent.TimeoutException("GSub.get timed out")
        v.asInstanceOf[T]
      } else q.take().asInstanceOf[T]
    /** Non-blocking drain of everything already delivered. */
    def drain(): Seq[T] = {
      val out = new java.util.ArrayList[Any]()
      q.drainTo(out)
      scala.jdk.CollectionConverters.ListHasAsScala(out).asScala.toSeq.map(_.asInstanceOf[T])
    }
    /** Deregister; also drops the channel's registry entry once its last
      * subscriber leaves, so short-lived channels don't accumulate
      * forever. Removal + emptiness check run atomically against the
      * registration in [[Coordination.sub]]. */
    def unsubscribe(): Unit = {
      Coordination.subscribers.computeIfPresent(channel, (_, l) => {
        l.remove(this)
        if (l.isEmpty) null else l
      })
      ()
    }
  }

  /** distributed.Actor analog (`SS/wukong/__init__.py:5` re-exports
    * `Actor`/`ActorFuture`): a named stateful handler whose messages are
    * processed strictly sequentially by a dedicated daemon mailbox
    * thread — the actor guarantee that state is never touched
    * concurrently. `ask` returns a future of the handler's reply
    * (ActorFuture); `tell` is fire-and-forget. Handler exceptions fail
    * that message's future and leave state untouched; the mailbox keeps
    * processing (reference error-path fidelity: an actor method raising
    * does not kill the actor). */
  final class GActor[S, M, R] private[delayed] (name: String, initial: S,
                                               handler: (S, M) => (S, R)) {
    // tell() enqueues a null promise (no per-tell allocation, nothing to
    // discard); handler failures on that path land in failedTellCount +
    // a stderr line instead of vanishing into a dropped future
    private val mailbox = new LinkedBlockingQueue[(M, Promise[R])]()
    private val failedTellCount = new java.util.concurrent.atomic.AtomicLong(0L)
    @volatile private var running = true
    private val thread = new Thread(() => {
      var state = initial                       // confined to this thread
      while (running || !mailbox.isEmpty) {
        val msg = mailbox.poll(50, TimeUnit.MILLISECONDS)
        if (msg != null) {
          val (m, p) = msg
          try {
            val (s2, r) = handler(state, m)
            state = s2
            if (p != null) p.success(r)
          } catch {
            case e: Throwable =>
              if (p != null) p.failure(e)
              else {
                failedTellCount.incrementAndGet()
                System.err.println(s"[graft] actor '$name' handler failed on a " +
                  s"fire-and-forget tell: $e")
              }
          }
        }
      }
      // Exit drain: a message can slip into the mailbox between the
      // loop's final emptiness check and here (ask racing stop). Fail
      // its promise rather than leaving the caller blocked forever.
      var leftover = mailbox.poll()
      while (leftover != null) {
        if (leftover._2 != null)
          leftover._2.failure(new IllegalStateException(s"actor '$name' is stopped"))
        leftover = mailbox.poll()
      }
    }, s"graft-actor-$name")
    thread.setDaemon(true)
    thread.start()

    private val lifecycle = new Object

    /** ask/tell — the proxy-method call of the reference Actor. A
      * stopped actor fails the ask immediately (reference: messaging a
      * dead actor raises). The lifecycle monitor orders every enqueue
      * against stop(): a message admitted here is in the mailbox BEFORE
      * `running` can flip, so the mailbox thread's `!mailbox.isEmpty`
      * exit check is guaranteed to see it — no ask can slip between the
      * thread's last poll and its death. The exit drain above is a
      * belt-and-braces backstop. */
    def ask(m: M): Future[R] = {
      val p = Promise[R]()
      lifecycle.synchronized {
        if (!running)
          p.failure(new IllegalStateException(s"actor '$name' is stopped"))
        else mailbox.put((m, p))
      }
      p.future
    }
    def askResult(m: M, atMost: Duration = Duration.Inf): R =
      scala.concurrent.Await.result(ask(m), atMost)
    /** Fire-and-forget: no promise is allocated; a handler exception on a
      * told message increments [[failedTells]] and logs rather than
      * disappearing into a discarded future. Tells to a stopped actor are
      * silently dropped (the reference's tell to a dead actor is lossy;
      * use ask for the failing variant). */
    def tell(m: M): Unit = lifecycle.synchronized {
      if (running) mailbox.put((m, null)); ()
    }
    /** Count of fire-and-forget messages whose handler threw. */
    def failedTells: Long = failedTellCount.get()
    /** Stop accepting messages and let the thread drain then exit; the
      * registry drops it. In-flight promises either complete normally
      * (already admitted to the mailbox) or — post-stop asks — fail
      * fast in ask(). */
    def stop(): Unit = lifecycle.synchronized {
      running = false; Coordination.actors.remove(name); ()
    }
  }

  /** Named registries (the reference addresses all of these by name).
    * Driver-scoped, like Queue/Variable/Lock above (see the scope note). */
  private val queues = new ConcurrentHashMap[String, GQueue[Any]]()
  private val variables = new ConcurrentHashMap[String, GVariable[Any]]()
  private val locks = new ConcurrentHashMap[String, GLock]()
  private[delayed] val subscribers = new ConcurrentHashMap[String, CopyOnWriteArrayList[GSub[Any]]]()
  private[delayed] val actors = new ConcurrentHashMap[String, GActor[_, _, _]]()

  def queue[T](name: String): GQueue[T] =
    queues.computeIfAbsent(name, _ => new GQueue[Any]()).asInstanceOf[GQueue[T]]
  def variable[T](name: String): GVariable[T] =
    variables.computeIfAbsent(name, _ => new GVariable[Any]()).asInstanceOf[GVariable[T]]
  def lock(name: String): GLock =
    locks.computeIfAbsent(name, _ => new GLock())
  def pub[T](channel: String): GPub[T] = new GPub[T](channel)
  def sub[T](channel: String, maxPending: Int = 1 << 16): GSub[T] = {
    val s = new GSub[Any](channel, maxPending)
    // Registration runs inside compute() so it is atomic with the
    // empty-channel removal in unsubscribe(): we can never add to a
    // list that was just unlinked from the registry.
    subscribers.compute(channel, (_, existing) => {
      val l = if (existing == null) new CopyOnWriteArrayList[GSub[Any]]() else existing
      l.add(s); l
    })
    s.asInstanceOf[GSub[T]]
  }
  /** Create-or-get a named actor; `initial`/`handler` only apply on
    * first creation (reference: Actors are created once on a worker and
    * then addressed by handle). */
  def actor[S, M, R](name: String, initial: S)(handler: (S, M) => (S, R)): GActor[S, M, R] =
    actors.computeIfAbsent(name, _ => new GActor[S, M, R](name, initial, handler))
      .asInstanceOf[GActor[S, M, R]]
}
