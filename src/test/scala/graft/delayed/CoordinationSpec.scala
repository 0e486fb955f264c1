package graft.delayed

import graft.SparkSpec
import scala.concurrent.duration._

/** Queue / Variable / Lock / Pub-Sub / Actor semantics from the
  * reference's shared-state surface (test_queues.py, test_variable.py,
  * test_locks.py; `__init__.py` re-exports Pub/Sub and Actor), driven
  * through the futures facade. */
class CoordinationSpec extends SparkSpec {

  test("queue: producer/consumer futures hand off results in order per producer") {
    val client = new Client(spark)
    val q = Coordination.queue[Long]("spec_q")
    val producer = client.submit {
      (1L to 100L).foreach(q.put); true
    }
    val consumer = client.submit {
      (1 to 100).map(_ => q.get(10.seconds)).sum
    }
    assert(producer.result() && consumer.result() == 5050L)
    assert(q.size == 0)
  }

  test("variable: get blocks until set, then all readers see the value") {
    val client = new Client(spark)
    val v = Coordination.variable[String]("spec_v")
    assert(!v.isSet)
    intercept[java.util.concurrent.TimeoutException](v.get(50.millis))
    val readers = client.map(1 to 4)(_ => v.get(10.seconds))
    client.fireAndForget { Thread.sleep(50); v.set("ready") }
    assert(client.gather(readers).toSet == Set("ready"))
    // named registry returns the same cell
    assert(Coordination.variable[String]("spec_v").get(1.second) == "ready")
  }

  test("lock: critical sections across concurrent tasks never interleave") {
    val client = new Client(spark)
    val lock = Coordination.lock("spec_l")
    var counter = 0 // unsynchronized on purpose: the lock must protect it
    val fs = client.map(1 to 8) { _ =>
      (1 to 1000).foreach { _ =>
        lock.withLock { counter = counter + 1 }
      }
    }
    client.gather(fs)
    assert(counter == 8000, s"lost updates without mutual exclusion: $counter")
  }

  test("pub/sub: fan-out to every subscriber; late subscribers miss history") {
    val client = new Client(spark)
    val pub = Coordination.pub[Int]("spec_ch")
    pub.put(-1)                               // no subscribers yet: dropped
    val s1 = Coordination.sub[Int]("spec_ch")
    val s2 = Coordination.sub[Int]("spec_ch")
    val readers = Seq(s1, s2).map(s => client.submit((1 to 3).map(_ => s.get(5.seconds)).toList))
    client.fireAndForget { (1 to 3).foreach(pub.put) }
    assert(client.gather(readers) == Seq(List(1, 2, 3), List(1, 2, 3)))
    val late = Coordination.sub[Int]("spec_ch")   // subscribes after 1..3
    pub.put(42)
    assert(s1.get(5.seconds) == 42 && s2.get(5.seconds) == 42 && late.get(5.seconds) == 42)
    intercept[java.util.concurrent.TimeoutException](late.get(50.millis)) // no replay of 1..3
    s1.unsubscribe()
    pub.put(7)
    assert(s2.get(5.seconds) == 7 && late.get(5.seconds) == 7)
    assert(s1.drain().isEmpty, "unsubscribed channel must stop receiving")
  }

  test("actor: counter round-trips are sequential under concurrent asks") {
    val client = new Client(spark)
    val counter = Coordination.actor[Long, Long, Long]("spec_actor", 0L) {
      (state, delta) => (state + delta, state + delta)
    }
    // 8 concurrent askers × 500 increments: the mailbox must serialize
    val fs = client.map(1 to 8)(_ => (1 to 500).map(_ => counter.askResult(1L, 10.seconds)).max)
    client.gather(fs)
    assert(counter.askResult(0L, 10.seconds) == 4000L,
      "mailbox must serialize state updates (no lost increments)")
    // registry: same name → same actor instance and state
    val again = Coordination.actor[Long, Long, Long]("spec_actor", 999L)((s, d) => (s + d, s))
    assert(again.askResult(0L, 10.seconds) == 4000L)
    counter.stop()
  }

  test("actor: a failing message fails its future but not the actor") {
    val actor = Coordination.actor[Int, String, Int]("spec_actor_err", 10) {
      case (_, "boom") => throw new IllegalStateException("boom")
      case (s, "get")  => (s, s)
      case (s, inc)    => (s + inc.toInt, s + inc.toInt)
    }
    assert(actor.askResult("5", 5.seconds) == 15)
    val failed = actor.ask("boom")
    intercept[IllegalStateException] {
      scala.concurrent.Await.result(failed, 5.seconds)
    }
    assert(actor.askResult("get", 5.seconds) == 15, "state untouched after handler failure")
    actor.stop()
  }

  test("actor: a failing tell is counted, not silently swallowed") {
    val actor = Coordination.actor[Int, String, Int]("spec_actor_tell", 0) {
      case (_, "boom") => throw new IllegalStateException("boom")
      case (s, inc)    => (s + inc.toInt, s + inc.toInt)
    }
    assert(actor.failedTells == 0L)
    actor.tell("boom")
    actor.tell("7")                       // actor keeps processing after the failure
    assert(actor.askResult("3", 5.seconds) == 10, "state must reflect the good tell")
    assert(actor.failedTells == 1L, "fire-and-forget handler failure must be counted")
    actor.stop()
  }
}
