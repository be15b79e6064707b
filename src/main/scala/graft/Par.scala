package graft

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Concurrent submission of INDEPENDENT Spark job chains from the
  * driver (optimization guide §2.6 "overlap independent jobs"):
  * actions are only sequential because driver code calls them
  * sequentially, and Spark's scheduler happily runs several jobs at
  * once inside one application. The gates that build multiple
  * independent artifacts in sequence (two IVF-PQ trainings, three
  * index-batch writes) were measured FASTER on 8 cores than 32 —
  * the job stream, not the executors, was the bottleneck; submitting
  * the independent chains from a small thread pool lets the next
  * job's tasks back-fill cores the current job's tail leaves idle.
  *
  * Failure contract: the first failing chain's exception propagates
  * (unwrapped from the ExecutionException) after the pool shuts
  * down; results are only returned when every chain succeeded. Job
  * descriptions/groups are thread-local in Spark, so each chain may
  * label itself without clobbering the others.
  */
object Par {

  /** Run two independent job chains concurrently; return both. */
  def par2[A, B](a: => A, b: => B): (A, B) = {
    val rs = parN(Seq(() => a.asInstanceOf[Any], () => b.asInstanceOf[Any]))
    (rs(0).asInstanceOf[A], rs(1).asInstanceOf[B])
  }

  /** Run every thunk concurrently on a bounded pool (2-4 in flight is
    * plenty: enough to fill stage tails, not enough to thrash the
    * scheduler) and return results in input order. */
  def parN[A](thunks: Seq[() => A], parallelism: Int = 4): Seq[A] = {
    if (thunks.isEmpty) return Seq.empty
    if (thunks.size == 1) return Seq(thunks.head())
    val pool = Executors.newFixedThreadPool(
      math.min(parallelism, thunks.size))
    implicit val ec: ExecutionContext =
      ExecutionContext.fromExecutorService(pool)
    try {
      val fs = thunks.map(t => Future(t()))
      fs.map(f => Await.result(f, Duration.Inf))
    } finally pool.shutdown()
  }
}
