package graft.operators

/** Run independent Spark actions from a few driver threads so the
  * scheduler overlaps their jobs (optimization-guide §2.6: one job's
  * straggler tail back-fills with the next job's tasks). Used where an
  * operator fans out writes/updates to INDEPENDENT stores — the work is
  * the same set of jobs, only the wall-clock serialization goes away.
  *
  * Blocks until every thunk finishes; the first failure is rethrown
  * (the remaining thunks still run to completion, keeping the same
  * partial-progress surface a serialized loop has — callers' replay
  * contracts already tolerate any completed subset).
  */
private[graft] object Par {
  def run(thunks: Seq[() => Unit]): Unit = {
    if (thunks.sizeIs <= 1) { thunks.foreach(_.apply()); return }
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val ts = thunks.map(t => new Thread(() =>
      try t() catch { case e: Throwable => errs.add(e); () }))
    ts.foreach(_.start()); ts.foreach(_.join())
    if (!errs.isEmpty) throw errs.peek()
  }
}
