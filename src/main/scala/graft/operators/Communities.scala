package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Community detection by SYNCHRONOUS label propagation (Raghavan et
  * al. 2007), made deterministic: every node starts labeled with its
  * own id; each round every node adopts the label most frequent among
  * its neighbors, ties broken by the SMALLEST label — no coin flips,
  * no asynchronous update order, so the result is a pure function of
  * the graph and the round count (and the q140 oracle can state the
  * rounds verbatim as SQL).
  *
  * Scale posture: one round = one equi-join of the symmetrized edge
  * set against the label table (shuffle on the neighbor key) + two
  * hash aggregations — the (count, label) argmax is a single
  * `min(struct(-cnt, label))` with map-side partials, never a
  * per-node sort window. Rounds are a fixed parameter: LPA's quality
  * plateaus in a handful of sweeps and a fixed budget keeps the plan
  * finite — pass a `checkpointDir` upstream via
  * [[graft.util.Checkpoints]] if lineage depth matters at high round
  * counts.
  */
object Communities {

  /** (id, label) after `rounds` synchronous sweeps over a directed
    * edge frame (`src`, `dst`) — edges are symmetrized and
    * deduplicated first (LPA is an undirected-neighborhood notion;
    * self-loops drop). Every endpoint appears in the output. */
  def labelPropagation(edges: DataFrame, rounds: Int = 2): DataFrame = {
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    val e = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst"))
    val sym = e.unionByName(
        e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    val nodes = sym.select(col("src").as("id")).distinct()
    var labels = nodes.select(col("id"), col("id").as("label"))
    for (_ <- 1 to rounds) {
      val counts = sym
        .join(labels.select(col("id").as("dst"),
          col("label").as("nlabel")), "dst")
        .groupBy(col("src"), col("nlabel"))
        .agg(count(lit(1)).as("c"))
      val best = counts
        .groupBy(col("src"))
        .agg(min(struct((-col("c")).as("nc"), col("nlabel").as("l")))
          .as("m"))
        .select(col("src").as("id"), col("m.l").as("label"))
      labels = nodes.join(best, Seq("id"), "left")
        .select(col("id"), coalesce(col("label"), col("id")).as("label"))
    }
    labels
  }
}
