package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}

/** Maximal-marginal-relevance re-ranking (Carbonell & Goldstein, SIGIR'98)
  * — the diversity-aware selection step between ANN retrieval and a RAG
  * prompt (or dedup-aware negative mining): greedily pick k results
  * maximizing `λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s)`, so each pick trades
  * query relevance against redundancy with what's already selected.
  *
  * Scale shape: relevance scoring and top-N candidate cut are ordinary
  * distributed stages (broadcast query vectors, native codegen cosine,
  * WindowGroupLimit top-N per query); the inherently sequential greedy
  * loop runs per query GROUP over the bounded candidate set via
  * `flatMapGroups` — the q31 recursive-kernel sanction: state is O(N·dim)
  * per group (N = candidate cut, here 20), never corpus-sized, and groups
  * parallelize across queries. FP parity with the oracle: candidate sims
  * use the same ascending-index dot fold and `dot/(√Σa²·√Σb²)` tree as
  * [[graft.functions.cosineSim]], and the penalty constant is written
  * explicitly (0.3, NOT `1-0.7` which is 1 ulp off in IEEE).
  */
object Mmr {

  case class Cand(qid: Long, vecId: Long, rel: Double, v: Array[Double])
  case class Pick(query_id: Long, rank: Int, vec_id: Long, mmr: Double)

  /** Ascending-index dot product — bit-identical to DuckDB's
    * `list_dot_product` and to [[graft.functions.VectorExprs]]. */
  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  private def cos(a: Array[Double], b: Array[Double]): Double =
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

  /** Greedy MMR over per-query candidate sets. `penalty` must be the
    * EXPLICIT 1−λ constant (same literal the oracle embeds). Rank-1 uses
    * the empty-set convention max-sim = 0 (so mmr₁ = λ·rel). Ties break
    * by ascending vec_id, matching `ORDER BY mmr DESC, vec_id`. */
  def select(cands: Dataset[Cand], lambda: Double, penalty: Double,
             k: Int): DataFrame = {
    import cands.sparkSession.implicits._
    cands.groupByKey(_.qid).flatMapGroups { (qid, it) =>
      val all = it.toArray
      val selected = scala.collection.mutable.ArrayBuffer.empty[Cand]
      val out = scala.collection.mutable.ArrayBuffer.empty[Pick]
      val remaining = scala.collection.mutable.ArrayBuffer(all: _*)
      var rank = 1
      while (rank <= k && remaining.nonEmpty) {
        var best: Cand = null
        var bestScore = Double.NegativeInfinity
        for (c <- remaining) {
          val maxSim =
            if (selected.isEmpty) 0.0
            else selected.iterator.map(s => cos(c.v, s.v)).max
          val m = lambda * c.rel - penalty * maxSim
          if (best == null || m > bestScore ||
            (m == bestScore && c.vecId < best.vecId)) {
            best = c; bestScore = m
          }
        }
        out += Pick(qid, rank, best.vecId, bestScore)
        selected += best
        remaining -= best
        rank += 1
      }
      out.iterator
    }.toDF()
  }
}
