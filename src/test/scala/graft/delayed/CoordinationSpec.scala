package graft.delayed

import graft.SparkSpec
import scala.concurrent.duration._

/** Queue / Variable / Lock semantics from the reference's shared-state
  * tests (test_queues.py, test_variable.py, test_locks.py), driven
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
}
