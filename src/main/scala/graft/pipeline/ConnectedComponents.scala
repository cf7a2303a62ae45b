package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed connected components over a near-duplicate pair graph — the
  * step an LLM-data pipeline runs AFTER candidate generation (q35/q36/q42
  * emit pairs; keep/drop decisions need per-doc component labels).
  *
  * Algorithm: alternating large-star / small-star (Kiveris, Lattanzi,
  * Mirrokni, Rastogi, Vassilvitskii — "Connected Components in MapReduce
  * and Beyond", SoCC'14), expressed as pure DataFrame groupBy/join rounds:
  *
  *   large-star: every node points its LARGER neighbors at the minimum of
  *     its neighborhood (incl. itself);
  *   small-star: every node and its smaller-or-equal neighbors all point at
  *     the minimum of that set.
  *
  * Both steps preserve connectivity and strictly contract the graph toward
  * a star forest whose centers are the component minima; convergence is
  * O(log n) alternating rounds on any graph (the paper's Theorem 3) and
  * 2-4 rounds on real near-dup graphs (components are dense).
  *
  * Scale shape: each round is two shuffles on the node id (a groupBy-min
  * and an equi-join) — NO collect_list of neighborhoods (a component's
  * center would otherwise materialize its whole component in one buffer)
  * and no driver-side graph state; the convergence check is a distributed
  * anti-join. The pair sets feeding it are hard-bounded upstream (df-cut /
  * CappedCollect / centroid pruning), so rounds are cheap joins.
  */
object ConnectedComponents {

  /** @param edges  (a, b) pair rows, any orientation, self-loops ignored
    * @param checkpointDir  None (default) = per-round localCheckpoint:
    *        fastest, right for local mode, but blocks live on executors
    *        WITHOUT fault tolerance — on a real cluster, losing one
    *        executor mid-iteration kills the job unrecoverably (truncated
    *        lineage cannot recompute). Some(dir) = reliable checkpoints to
    *        durable storage (HDFS/S3 path on a cluster): each round
    *        survives executor loss at the cost of a write per round — the
    *        setting a 1000-executor run wants.
    * @return (labels, rounds): labels = (node, component) with component =
    *         the minimum node id reachable from `node`; every node that
    *         appears in an edge gets a row. `rounds` = alternating
    *         large+small-star rounds until fixpoint.
    */
  def run(s: SparkSession, edges: DataFrame,
      checkpointDir: Option[String] = None): (DataFrame, Int) = {
    // checkpoint (not a bare persist): iterative plans otherwise grow
    // multiplicatively — each round's lineage embeds the previous round's
    // several times over, and by ~8 rounds the plan tree alone OOMs the
    // driver. Checkpointing materializes the round AND truncates lineage,
    // the standard discipline for iterative graph algorithms on Spark.
    checkpointDir.foreach(s.sparkContext.setCheckpointDir)
    def chk(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint() else df.localCheckpoint(true)
    // canonical undirected representation: (u, v) with u > v
    var cur = chk(edges.select(
        greatest(col("a"), col("b")).as("u"), least(col("a"), col("b")).as("v"))
      .filter(col("u") =!= col("v")).distinct())
    var rounds = 0
    var done = cur.isEmpty // an edgeless graph is already converged
    while (!done) {
      // large-star: m(x) = min over x's full neighborhood (both directions)
      // plus x itself; larger neighbors re-point at m(x).
      // (r7 note: an explicit repartition(u) shared by the groupBy and the
      // join was measured 15-20% SLOWER here — AQE broadcast-joins the
      // mins side, so the join needs no exchange and the repartition was
      // pure added cost; guide §1.1's "the ideal plan is usually slower at
      // first" case, reverted on measurement.)
      val sym = cur.union(cur.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy(col("u"))
        .agg(min(col("v")).as("mn"))
        .select(col("u").as("x"), least(col("u"), col("mn")).as("m"))
      // no intermediate distinct (r7): duplicates cannot change a min or
      // the final distinct edge set, and dropping it removes a whole
      // (u,v) exchange per round
      val afterLarge = sym.filter(col("v") > col("u"))
        .join(mins, col("u") === col("x"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
      // small-star: on (u > v)-oriented edges, u and all its smaller
      // neighbors point at the minimum of the closed smaller-neighborhood
      val oriented = afterLarge.select(
          greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
        .filter(col("u") =!= col("v"))
      val smallMins = oriented.groupBy(col("u"))
        .agg(min(col("v")).as("m"))
      val next = oriented.join(smallMins, "u")
        .select(explode(array(
          struct(col("v").as("a"), col("m").as("b")),
          struct(col("u").as("a"), col("m").as("b")))).as("e"))
        .select(greatest(col("e.a"), col("e.b")).as("u"),
          least(col("e.a"), col("e.b")).as("v"))
        .filter(col("u") =!= col("v")).distinct()
      val nextChk = chk(next)
      rounds += 1
      // fixpoint: the edge SET is unchanged — ONE distributed symmetric-
      // difference action (both sides are distinct, so a pair present in
      // both rounds counts 2, a changed pair counts 1); no driver
      // materialization
      done = cur.union(nextChk).groupBy(col("u"), col("v"))
        .count().filter(col("count") === 1).isEmpty
      cur.unpersist()
      cur = nextChk
    }
    // at the fixpoint the graph is a star forest centered on component
    // minima: every non-center's component is its (unique) smaller
    // neighbor; centers label themselves. Materialize the labels so the
    // final round's checkpoint blocks can be released (a bare lazy result
    // would pin them for the caller's lifetime).
    val labels = chk(cur.select(col("u").as("node"), col("v").as("component"))
      .union(cur.select(col("v").as("node"), col("v").as("component")))
      .groupBy(col("node")).agg(min(col("component")).as("component")))
    cur.unpersist()
    (labels, rounds)
  }
}
