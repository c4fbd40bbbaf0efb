package graft.operators

import org.apache.spark.sql.DataFrame

/** Scoped materialization for intermediate relations read by more than one
  * downstream consumer — the repo's sanctioned persist pattern.
  *
  * Why scoped: a bare `persist()` whose release is a CONTRACT ("the caller
  * unpersists once consumed") is one forgotten call site away from a leak —
  * and composed programs like q76 are exactly where a leaked cache ends up
  * taxing every later stage of a long session (the round-5 bench
  * contamination). `withMaterialized` owns the whole lifecycle in one
  * lexical scope: persist → eager `count()` barrier → body → guaranteed
  * `unpersist` in a finally.
  *
  * The eager count is load-bearing, not a nicety: two consumers reading a
  * LAZY cache concurrently (e.g. both sides of a bucket self-join) race the
  * unpopulated cache and can each recompute the entire upstream lineage
  * (cache stampede — cost the LSH pipeline 3-4× before the barrier was
  * added).
  *
  * Contract for `body`: anything that must OUTLIVE the scope has to be
  * materialized inside it — `localCheckpoint()` (eager by default) for
  * bounded results, or a sink write. Returning a lazy plan that still
  * references `df` is not an error, but it silently recomputes `df` from
  * scratch on first use, which defeats the cache. All Dedup/Similarity
  * operators therefore end their bodies with a `localCheckpoint()` of the
  * (candidate-/result-sized) output.
  */
object Materialize {

  /** Run `body` with `df` persisted and eagerly materialized; always
    * releases the cache on exit (including on exception). */
  def withMaterialized[A](df: DataFrame)(body: DataFrame => A): A = {
    val cached = df.persist()
    cached.count() // eager fill — concurrent consumers must not stampede
    try body(cached) finally cached.unpersist()
  }

  /** Two-relation variant (nested scopes, released inner-first). */
  def withMaterialized2[A](df1: DataFrame, df2: DataFrame)(
      body: (DataFrame, DataFrame) => A): A =
    withMaterialized(df1)(a => withMaterialized(df2)(b => body(a, b)))

  /** Run INDEPENDENT Spark action chains from a bounded driver thread
    * pool and return their results in input order — the optimization
    * guide's §2.6 "overlap independent jobs" pattern: Spark's scheduler
    * happily runs several jobs at once inside one application; chains of
    * eager actions (iterative `localCheckpoint` loops, per-config
    * trainings) are only sequential because the driver calls them
    * sequentially. Overlapping them lets one chain's stage tail backfill
    * with the next chain's tasks — a wall-clock win at ANY scale, and a
    * pure scheduling change: each chain's computation (and therefore the
    * query result) is untouched.
    *
    * Only for thunks with no data dependencies between them. Failures
    * propagate with the original cause (the first failing thunk's
    * exception), after all threads settle. */
  def concurrently[A](thunks: Seq[() => A], parallelism: Int = 4): Seq[A] = {
    if (thunks.size <= 1) return thunks.map(_())
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(parallelism, thunks.size))
    try {
      val fs = thunks.map(t => pool.submit(
        new java.util.concurrent.Callable[A] { def call(): A = t() }))
      // settle EVERY future before propagating the first failure
      // (ADVICE r17: rethrowing immediately left sibling Spark action
      // chains running in background threads after the caller unwound)
      val settled = fs.map(f => scala.util.Try(f.get()))
      settled.collectFirst { case scala.util.Failure(e) => e }.foreach {
        case e: java.util.concurrent.ExecutionException => throw e.getCause
        case e => throw e
      }
      settled.map(_.get)
    } finally pool.shutdown()
  }
}
