package graft.delayed

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import scala.concurrent.{Await, ExecutionContext, Future, Promise}
import scala.concurrent.duration.{Duration, FiniteDuration}
import scala.util.Try

/** Futures facade — the rebuild of Wukong's Dask-Distributed client API
  * (SURVEY.md §2.B5): `submit` (client.py:1423), `map` (:1524), `gather`
  * (:1902), `scatter` (:2072), `as_completed`/`wait`/`fire_and_forget`
  * (client.py:4241, __init__.py:9-20).
  *
  * On Spark the "cluster" side of a future is a job: a submitted function
  * typically closes over Datasets and runs actions; the returned
  * `GraftFuture` resolves when the job completes. Failure propagates the
  * original exception (reference error-path fidelity,
  * TE/function.py:1810-1817 → scheduler.py:4147-4156).
  */
final class GraftFuture[T] private[delayed] (private[delayed] val underlying: Future[T]) {
  def result(atMost: Duration = Duration.Inf): T = Await.result(underlying, atMost)
  def isCompleted: Boolean = underlying.isCompleted
  def onComplete(f: Try[T] => Unit)(implicit ec: ExecutionContext): Unit =
    underlying.onComplete(f)
}

final class Client(val spark: SparkSession)(implicit ec: ExecutionContext = Delayed.defaultEc) {

  /** submit(func, *args): run one task asynchronously, get a future. */
  def submit[T](f: => T): GraftFuture[T] = new GraftFuture(Future(f))

  /** map(func, iterable): one future per element. */
  def map[A, T](items: Seq[A])(f: A => T): Seq[GraftFuture[T]] =
    items.map(a => submit(f(a)))

  /** gather(futures): block for all results, first failure rethrown. */
  def gather[T](fs: Seq[GraftFuture[T]]): Seq[T] =
    Await.result(Future.sequence(fs.map(_.underlying)), Duration.Inf)

  /** scatter(data): ship a value to every executor once — broadcast. */
  def scatter[T: scala.reflect.ClassTag](v: T): Broadcast[T] =
    spark.sparkContext.broadcast(v)

  /** gather of a distributed frame back to the driver (small results). */
  def gatherRows(df: DataFrame): Array[Row] = df.collect()

  /** as_completed: futures in completion order. */
  def asCompleted[T](fs: Seq[GraftFuture[T]]): Iterator[Try[T]] = {
    val queue = new java.util.concurrent.LinkedBlockingQueue[Try[T]]()
    fs.foreach(_.underlying.onComplete(queue.put))
    Iterator.fill(fs.size)(queue.take())
  }

  /** wait(futures, timeout): done / not-done split. */
  def waitAll[T](fs: Seq[GraftFuture[T]], atMost: FiniteDuration): (Seq[GraftFuture[T]], Seq[GraftFuture[T]]) = {
    val all = Future.sequence(fs.map(_.underlying.transform(Try(_))(ec)))
    Try(Await.ready(all, atMost))
    fs.partition(_.isCompleted)
  }

  /** fire_and_forget: run for side effects, swallow the handle. */
  def fireAndForget[T](f: => T): Unit = { Future(f); () }
}
