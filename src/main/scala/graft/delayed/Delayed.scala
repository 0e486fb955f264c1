package graft.delayed

import java.util.concurrent.atomic.AtomicLong
import scala.collection.concurrent.TrieMap
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** The rebuild of Wukong's primary user entry point: arbitrary lazy task
  * DAGs (`dask.delayed` — reference README.md:125-201, evaluated by
  * `execute_task`/`pack_data`, TE/function.py:3808-3881).
  *
  * A `Delayed[T]` is a node in a DAG built by wrapping functions over
  * other `Delayed` values. Nothing runs until `compute()`. Evaluation is
  * topological and memoized: every node runs exactly once even under
  * fan-out (the engine-side guarantee Wukong got from Redis dependency
  * counters, A3/A4 — here a concurrent promise cache), and independent
  * branches run in parallel on the execution context (the "invoke"
  * fan-out, A6). Node bodies may be driver-local functions or full Spark
  * actions — composing Spark jobs into a DAG is exactly the reference's
  * model of delayed collections.
  *
  * Error semantics mirror the reference (TE/function.py:1810-1817): the
  * first failing task short-circuits every dependent and the original
  * exception surfaces at `compute()`/`gather` with its message intact.
  */
sealed trait Delayed[+T] {
  private[delayed] def node: Node

  def map[U](f: T => U): Delayed[U] =
    Delayed.fromNode(Node.Apply(args => f(args.head.asInstanceOf[T]), Seq(node)))

  def zip[U, R](other: Delayed[U])(f: (T, U) => R): Delayed[R] =
    Delayed.fromNode(Node.Apply(
      args => f(args(0).asInstanceOf[T], args(1).asInstanceOf[U]),
      Seq(node, other.node)))

  /** Evaluate this node (and its whole upstream DAG). */
  def compute()(implicit ec: ExecutionContext = Delayed.defaultEc): T =
    Await.result(computeAsync(), Duration.Inf)

  def computeAsync()(implicit ec: ExecutionContext = Delayed.defaultEc): Future[T] =
    Node.run(node, new TrieMap)(ec).asInstanceOf[Future[T]]
}

private[delayed] sealed trait Node { val id: Long = Node.nextId() }
private[delayed] object Node {
  private val counter = new AtomicLong(0)
  def nextId(): Long = counter.incrementAndGet()

  final case class Value(v: Any) extends Node
  final case class Apply(fn: Seq[Any] => Any, deps: Seq[Node]) extends Node

  /** Memoized topological evaluation: the cache maps node → in-flight
    * Future, so shared subgraphs evaluate once and parallel branches
    * overlap (Wukong's become/invoke pipelining, collapsed onto an
    * executor pool). */
  def run(node: Node, cache: TrieMap[Long, Future[Any]])(implicit ec: ExecutionContext): Future[Any] =
    cache.getOrElseUpdate(node.id, node match {
      case Value(v) => Future.successful(v)
      case Apply(fn, deps) =>
        Future.sequence(deps.map(d => run(d, cache))).map(fn)
    })
}

object Delayed {
  /** Shared pool for driver-side DAG evaluation. Spark actions inside
    * nodes block a pool thread while executors do the real work, so the
    * pool is sized generously relative to cores. */
  implicit lazy val defaultEc: ExecutionContext =
    ExecutionContext.fromExecutor(java.util.concurrent.Executors.newFixedThreadPool(
      math.max(16, Runtime.getRuntime.availableProcessors()),
      (r: Runnable) => {   // daemon threads: an idle DAG pool must never pin the JVM open
        val t = new Thread(r, "graft-delayed")
        t.setDaemon(true)
        t
      }))

  private[delayed] def fromNode[T](n: Node): Delayed[T] =
    new Delayed[T] { val node: Node = n }

  /** Literal value → delayed (dask `delayed(3)`). */
  def value[T](v: T): Delayed[T] = fromNode(Node.Value(v))

  /** delayed(f)(args…) — wrap a function call as a DAG node. */
  def apply[T](f: => T): Delayed[T] = fromNode(Node.Apply(_ => f, Nil))

  def apply2[A, B, R](f: (A, B) => R)(a: Delayed[A], b: Delayed[B]): Delayed[R] =
    a.zip(b)(f)

  def sequence[T](ds: Seq[Delayed[T]]): Delayed[Seq[T]] =
    fromNode(Node.Apply(args => args.map(_.asInstanceOf[T]), ds.map(_.node)))

  /** Evaluate several keys against one shared cache — dask
    * `get(dsk, keys)` semantics: common subgraphs run once. */
  def computeAll[T](ds: Seq[Delayed[T]])(implicit ec: ExecutionContext = defaultEc): Seq[T] = {
    val cache = new TrieMap[Long, Future[Any]]
    val futures = ds.map(d => Node.run(d.node, cache)(ec))
    Await.result(Future.sequence(futures)(scala.collection.BuildFrom.buildFromIterableOps, ec), Duration.Inf)
      .map(_.asInstanceOf[T])
  }

  /** Pairwise tree reduction — the reference's 1024-leaf `operator.add`
    * tree (README.md:180-201): log-depth DAG, inner nodes evaluate in
    * parallel per level. */
  def treeReduce[T](leaves: Seq[Delayed[T]])(op: (T, T) => T): Delayed[T] = {
    require(leaves.nonEmpty, "treeReduce of no leaves")
    var level = leaves
    while (level.size > 1) {
      level = level.grouped(2).map {
        case Seq(a, b) => a.zip(b)(op)
        case Seq(a)    => a
      }.toSeq
    }
    level.head
  }
}

/** Raw Dask-graph-spec evaluator — `get(dsk, keys)`
  * (SS/wukong/client.py:2602): a graph is a map key → task, where a task
  * is either a literal, a reference to another key, or
  * `GraphTask(fn, args)` whose args may be keys (recursively packed, the
  * `pack_data` analog, TE/function.py:3849-3881). */
object DaskGraph {
  final case class GraphTask(fn: Seq[Any] => Any, args: Seq[Any])

  def get(dsk: Map[String, Any], keys: Seq[String])
         (implicit ec: ExecutionContext = Delayed.defaultEc): Seq[Any] = {
    val nodes = TrieMap[String, Delayed[Any]]()
    def build(key: String, visiting: Set[String]): Delayed[Any] = {
      require(!visiting.contains(key), s"cycle at $key")
      nodes.getOrElseUpdate(key, dsk(key) match {
        case GraphTask(fn, args) =>
          val argNodes = args.map {
            case k: String if dsk.contains(k) => build(k, visiting + key)
            case lit                          => Delayed.value(lit)
          }
          Delayed.sequence(argNodes).map(fn)
        case k: String if dsk.contains(k) => build(k, visiting + key) // alias
        case lit                          => Delayed.value(lit)
      })
    }
    Delayed.computeAll(keys.map(k => build(k, Set.empty)))
  }
}
