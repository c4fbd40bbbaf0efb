package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact per-node triangle counting via degree-ordered edge orientation.
  *
  * The naive wedge enumeration explodes on hub vertices (a degree-d hub
  * contributes d² wedges — the "curse of the last reducer", Suri &
  * Vassilvitskii WWW'11). Orienting every undirected edge from its lower
  * (degree, id) endpoint to its higher one makes each triangle counted
  * exactly once from its lowest-rank corner and bounds TOTAL wedge work by
  * O(m^{3/2}) on any topology: under this orientation no vertex has
  * out-degree above O(√m). Reference behavior anchor: the reference keeps
  * all graph-shaped statistics server-side in SQL (e.g.
  * `00049_create_stock_metrics.sql`'s self-join families); this is the
  * strictly-local subgraph-count member of that family, alongside
  * [[Dedup.connectedComponents]] (reachability) and [[PageRank]]
  * (propagation).
  *
  * Plan shape: degrees are one map-side-combined aggregation; the oriented
  * edge list (with the head's rank carried) is scoped-materialized once and
  * read three times — two wedge sides and the closing-edge probe — all
  * key-partitioned equi-joins, nothing quadratic in a hub's degree.
  */
object Triangles {

  /** Per-node triangle participation counts.
    *
    * @param edges undirected DISTINCT edges as columns (u, v); u != v and
    *              each unordered pair present once (any orientation).
    *              Self-loops and duplicate pairs are the caller's bug —
    *              dedupe with `canon`-style select first.
    * @return (node, n_tri) for every node in at least one triangle
    */
  def perNode(edges: DataFrame): DataFrame = {
    val deg = edges.select(col("u").as("x"))
      .union(edges.select(col("v").as("x")))
      .groupBy(col("x")).agg(count(lit(1)).as("d"))
    // orient from lower (degree, id) rank to higher; carry the head's rank
    // so the wedge join can order its two heads without another lookup
    val oriented = edges
      .join(deg.select(col("x").as("u"), col("d").as("du")), Seq("u"))
      .join(deg.select(col("x").as("v"), col("d").as("dv")), Seq("v"))
      .select(
        when(col("du") < col("dv") ||
            (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("src"), col("v").as("dst"),
            col("dv").as("ddst")))
          .otherwise(struct(col("v").as("src"), col("u").as("dst"),
            col("du").as("ddst"))).as("e"))
      .select(col("e.src"), col("e.dst"), col("e.ddst"))
    Materialize.withMaterialized(oriented) { o =>
      val w1 = o.select(col("src"), col("dst").as("b"), col("ddst").as("db"))
      val w2 = o.select(col("src"), col("dst").as("c"), col("ddst").as("dc"))
      val wedges = w1.join(w2, Seq("src"))
        .filter(col("db") < col("dc") ||
          (col("db") === col("dc") && col("b") < col("c")))
      val tri = wedges.join(
          o.select(col("src").as("b"), col("dst").as("c")), Seq("b", "c"))
        .select(col("src").as("a"), col("b"), col("c"))
      tri.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
        .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
        .localCheckpoint()
    }
  }
}
