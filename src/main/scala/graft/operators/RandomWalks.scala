package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic random-walk corpus generation — the DeepWalk /
  * node2vec data-prep stage: `walksPerNode` fixed-length walks from
  * every node with out-degree > 0, emitted as (start, widx, step,
  * node) rows (the "sentences" a downstream skip-gram embedding
  * trains on).
  *
  * The "randomness" is a reproducible hash draw: the next step from
  * the walk (start, widx) at step t is the out-neighbor `dst` of the
  * current node minimizing md5("start|widx|t|dst") — deterministic
  * across retries, partitionings and engines (the q135 oracle states
  * the same md5 draw verbatim), which is what a 100 TB pipeline needs
  * from sampled data (a re-run must not produce a different corpus).
  * Draws are md5-unique per candidate in practice; the tiebreak
  * (struct min falls back to dst) is total either way.
  *
  * Scale posture: each step is ONE equi-join of the frontier (n·w
  * rows) against the edge table on the current node plus a map-side-
  * partial min aggregation per walk — never adjacency materialized
  * per walk, never a driver loop over nodes. Walks reaching a sink
  * node simply stop (no row at later steps). For long walks pass a
  * `checkpointDir`/localCheckpoint upstream if lineage depth matters;
  * typical embedding walks (L ≤ 80) are fine.
  */
object RandomWalks {

  /** Walk corpus over a directed edge frame (`src`, `dst` columns).
    * Self-loops are dropped; edges are deduplicated (the walk is over
    * the graph, not the multigraph). */
  def walks(edges: DataFrame, walksPerNode: Int = 2,
      length: Int = 3): DataFrame = {
    require(walksPerNode > 0 && length >= 0,
      s"need walksPerNode > 0, length >= 0, got $walksPerNode/$length")
    val e = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst")).distinct()
    var frontier = e.select(col("src").as("start")).distinct()
      .select(col("start"),
        explode(sequence(lit(0), lit(walksPerNode - 1))).as("widx"))
      .select(col("start"), col("widx").cast("long").as("widx"),
        col("start").as("cur"))
    var out = frontier.select(col("start"), col("widx"),
      lit(0L).as("step"), col("cur").as("node"))
    for (t <- 1 to length) {
      val cand = frontier.join(e, frontier("cur") === e("src"))
        .select(col("start"), col("widx"), col("dst"),
          md5(concat(col("start"), lit("|"),
            col("widx").cast("string"), lit(s"|$t|"), col("dst"))
            .cast("binary")).as("draw"))
      frontier = cand.groupBy(col("start"), col("widx"))
        .agg(min(struct(col("draw"), col("dst"))).as("m"))
        .select(col("start"), col("widx"), col("m.dst").as("cur"))
      out = out.unionByName(frontier.select(col("start"), col("widx"),
        lit(t.toLong).as("step"), col("cur").as("node")))
    }
    out
  }
}
