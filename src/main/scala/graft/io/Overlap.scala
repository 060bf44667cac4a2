package graft.io

/** Overlap independent Spark actions (guide-§2.6 shape, and the same
  * fan-out idea [[graft.Controller]] uses for tables): the driver's
  * sequential action calls are what serialize independent sub-second
  * jobs — submitting them from a small pool lets each job's task tail
  * back-fill executor slots freed by its siblings. Use ONLY for
  * genuinely independent side effects (distinct tables/paths, no
  * ordering contract); anything ordered stays on the caller's thread. */
object Overlap {

  /** Run the thunks concurrently and wait for ALL of them; the first
    * failure rethrows after every thunk has finished (no write is
    * abandoned mid-flight). A fresh bounded pool per call — callers are
    * delivery-grained, not row-grained. */
  def awaitAll(work: Seq[() => Unit]): Unit =
    if (work.size <= 1) work.foreach(_())
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(work.size)
      try {
        import scala.jdk.CollectionConverters._
        val futures = pool.invokeAll(
          work.map(f => new java.util.concurrent.Callable[Unit] {
            override def call(): Unit = f()
          }).asJava)
        futures.asScala.foreach(_.get()) // rethrows the first failure
      } finally pool.shutdown()
    }
}
