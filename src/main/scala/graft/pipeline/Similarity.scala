package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.CosineSimilarity.cosineSim

/** Similarity search over the `embeddings` table (vec_id, embedding:
  * array<float>, label).
  *
  * - `q40_knn_bruteforce`: exact cosine top-k for a fixed probe set, as a
  *   declarative plan: per-pair dot/norm via `zip_with` + `aggregate`
  *   (sequential left-fold ⇒ deterministic Double results, matching the
  *   DuckDB oracle's list_* functions on DOUBLE[] element-for-element).
  * - `q41_knn_lsh`: random-hyperplane LSH ANN — deterministic planes from
  *   splitmix64, bucket join then exact re-rank inside buckets. The scale
  *   path: candidate generation is a hash-bucket equi-join instead of a
  *   cartesian product. No SQL oracle (plane generation is not reasonably
  *   SQL-expressible); recall vs brute force is pinned in SimilaritySpec.
  *
  * Scale notes: brute force is O(Q×N) with Q the (small) probe set —
  * broadcast the probes, never the corpus; LSH buckets bound candidate
  * pairs. At 100 TB the same shapes hold with the probe set broadcast and
  * buckets salted if skewed.
  */
object Similarity {

  private def emb(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"$d/embeddings.parquet")

  type Q = (SparkSession, String) => DataFrame

  val NumProbes = 5
  val TopK = 10
  val LshTables = 8
  val LshBits = 4

  val IvfLists = 16
  val IvfProbes = 4

  val queries: Map[String, Q] = Map(
    // --- IVF-style ANN: nList cells around deterministic data-vector
    //     centroids; queries probe the nProbe nearest cells, exact cosine
    //     re-rank inside. The scale shape: assignment is one bounded map
    //     (≤ nList dot products/row), candidates come from a cell
    //     equi-join — never all-pairs. Rows-only driver check (centroid
    //     selection is not reasonably SQL-expressible); recall vs brute
    //     force pinned in PipelineSpec.
    "q43_knn_ivf" -> ((s, d) => {
      import s.implicits._
      val e = emb(s, d)
        .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      val n = e.count()
      val step = math.max(n / IvfLists, 1L)
      // centroids: every step-th vector (deterministic spread over the id
      // space); ≤ IvfLists rows — a bounded, scale-safe collect
      val cents: Array[(Int, Array[Double])] = e
        .filter(col("vec_id") % step === 0 && col("vec_id") / step < IvfLists)
        .as[(Long, Seq[Double])].collect()
        .sortBy(_._1).zipWithIndex
        .map { case ((_, v), i) => (i, v.toArray) }
      val centB = s.sparkContext.broadcast(cents)
      def cosLocal(a: Array[Double], b: Seq[Double]): Double = {
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length && i < b.length) {
          dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
        }
        if (na == 0.0 || nb == 0.0) -2.0 else dot / (math.sqrt(na) * math.sqrt(nb))
      }
      def nearestCells(v: Seq[Double], k: Int): Seq[Int] =
        centB.value.map { case (ci, c) => (ci, cosLocal(c, v)) }
          .sortBy { case (ci, sim) => (-sim, ci) }.take(k).map(_._1).toSeq
      val assigned = e.as[(Long, Seq[Double])]
        .map { case (id, v) => (id, nearestCells(v, 1).head, v) }
        .toDF("vec_id", "cell", "v")
      val probes = broadcast(e.filter(col("vec_id") < NumProbes)
        .as[(Long, Seq[Double])]
        .flatMap { case (id, v) =>
          nearestCells(v, IvfProbes).map(c => (id, c, v))
        }
        .toDF("query_id", "cell", "qv"))
      val cands = probes.join(assigned.filter(col("vec_id") >= NumProbes), "cell")
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          round(cosineSim(col("qv"), col("v")), 4).as("cos"))
        .dropDuplicates("query_id", "neighbor_id")
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("neighbor_id").asc)
      cands.withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= TopK)
        .orderBy(col("query_id"), col("rk"))
    }),

    "q40_knn_bruteforce" -> ((s, d) => {
      val e = emb(s, d)
        .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      val probes = broadcast(e.filter(col("vec_id") < NumProbes)
        .select(col("vec_id").as("query_id"), col("v").as("qv")))
      val pairs = probes.crossJoin(e.filter(col("vec_id") >= NumProbes))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          round(cosineSim(col("qv"), col("v")), 4).as("cos"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("neighbor_id").asc)
      pairs.withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= TopK)
        .orderBy(col("query_id"), col("rk"))
    }),

    "q41_knn_lsh" -> ((s, d) => {
      // probe signatures computed from ONLY the probe vectors: the LSH
      // signature flatMap is a typed op, so a filter AFTER it does not push
      // into the scan — deriving probes from the full sigs lineage ran the
      // whole signature pass twice (once per join side)
      val sigs = lshSignatures(s,
        emb(s, d).filter(col("vec_id") >= NumProbes)
          .select(col("vec_id"), col("embedding")), LshTables, LshBits)
      val probes = broadcast(lshSignatures(s,
        emb(s, d).filter(col("vec_id") < NumProbes)
          .select(col("vec_id"), col("embedding")), LshTables, LshBits)
        .select(col("vec_id").as("query_id"), col("bucket"), col("v").as("qv")))
      val cands = probes.join(sigs, "bucket")
        .select(col("query_id"), col("vec_id").as("neighbor_id"), col("qv"), col("v"))
        .dropDuplicates("query_id", "neighbor_id")
        .select(col("query_id"), col("neighbor_id"),
          round(cosineSim(col("qv"), col("v")), 4).as("cos"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("neighbor_id").asc)
      cands.withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= TopK)
        .orderBy(col("query_id"), col("rk"))
    })
  )

  // ~99th percentile of pair cosines in this corpus (max observed ≈ 0.49):
  // high enough to be a near-dup cut, low enough to be non-empty at every sf
  private val embDedupThreshold = 0.30

  // q42 cell count for the exact centroid-pruned threshold join (bounded
  // driver-side state: DedupCells centroids + radii)
  val DedupCells = 16

  // q42 cache of the (vec_id, cell, cosToCent, v) assignment — persisted
  // once per dataset, reused by the radii aggregation and both join sides
  // across repeated calls. Keyed per dir on (session identity, content
  // fingerprint), not the bare dir (ADVICE r3): regenerated data or a
  // replaced SparkSession invalidates the entry, and the superseded
  // DataFrame is unpersisted so MEMORY_AND_DISK blocks don't leak.
  private case class CachedAssign(key: String, df: DataFrame)
  private val dedupAssignCache =
    new java.util.concurrent.ConcurrentHashMap[String, CachedAssign]()

  private def cachedAssign(s: SparkSession, d: String,
      build: () => DataFrame): DataFrame = dedupAssignCache.synchronized {
    val key = s"${System.identityHashCode(s)}@" +
      graft.sources.ContentFingerprint.of(s"$d/embeddings.parquet")
    val existing = dedupAssignCache.get(d)
    if (existing != null && existing.key == key) existing.df
    else {
      if (existing != null)
        try existing.df.unpersist()
        catch { case _: Exception => () } // stale session: nothing to free
      val df = build()
      dedupAssignCache.put(d, CachedAssign(key, df))
      df
    }
  }

  /** Multi-table random-hyperplane LSH signatures: L independent tables of
    * B bits; a vector lands in L buckets (`bucket = table * 2^B + sig`),
    * candidates = bucket equi-join — the standard recall/cost dial (more
    * tables ⇒ higher recall). Planes are deterministic from splitmix64.
    * Input: (vec_id, embedding float[]); output: (vec_id, bucket, v double[]). */
  def lshSignatures(s: SparkSession, e0: DataFrame,
      nTables: Int, nBits: Int): DataFrame = {
    import s.implicits._
    val dim = 64
    val planes: Array[Array[Array[Double]]] = Array.tabulate(nTables) { t =>
      Array.tabulate(nBits) { p =>
        Array.tabulate(dim) { i =>
          val x = graft.corpus.CorpusGen.splitmix64(
            (t.toLong * 131 + p).toLong * 7919 + i + 42)
          (x >>> 11).toDouble / (1L << 53).toDouble - 0.5
        }
      }
    }
    val planesB = s.sparkContext.broadcast(planes)
    e0.as[(Long, Seq[Float])].flatMap { case (id, v) =>
      val pls = planesB.value
      (0 until nTables).map { t =>
        var sig = 0
        var p = 0
        while (p < nBits) {
          var dot = 0.0; var i = 0
          val pl = pls(t)(p)
          while (i < v.length && i < dim) { dot += pl(i) * v(i); i += 1 }
          if (dot > 0) sig |= (1 << p)
          p += 1
        }
        (id, t * (1 << nBits) + sig, v.map(_.toDouble))
      }
    }.toDF("vec_id", "bucket", "v")
  }

  val extraQueries: Map[String, Q] = Map(
    // --- embedding-cosine near-duplicate detection (dedup family): pairs
    //     above a cosine threshold, sampled every 4th vector. Candidate
    //     generation is an EXACT centroid-pruned join (never all-pairs —
    //     the round-1 cartesian was the scale-killer): vectors are assigned
    //     to their nearest of DedupCells centroids; a cell pair (i,j) can
    //     contain a qualifying pair only if
    //       angle(c_i,c_j) - r_i - r_j <= arccos(threshold)
    //     (angular triangle inequality, r = the cell's angular radius), so
    //     pruned cell pairs are provably empty and the survivors join by
    //     cell id (equi-join). Unlike the round-2 LSH formulation, recall
    //     is 100% BY CONSTRUCTION — the exact-join SQL oracle is valid at
    //     every scale and seed, not just the tested ones (ADVICE r2). On
    //     clustered data (real near-dup corpora) most cell pairs prune; on
    //     isotropic data nothing can prune without losing exactness — the
    //     inherent price of an exact threshold join.
    "q42_embedding_dedup" -> ((s, d) => {
      import s.implicits._
      val sampled = emb(s, d).filter(col("vec_id") % 4 === 0)
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("v"))
      val n = sampled.count()
      val step = math.max(n / DedupCells, 1L)
      // centroids: every step-th sampled vector (ids are multiples of 4) —
      // a deterministic, <= DedupCells bounded collect
      val cents: Array[(Int, Array[Double])] = sampled
        .filter(expr(s"(vec_id DIV 4) % $step = 0") &&
          expr(s"(vec_id DIV 4) DIV $step < $DedupCells"))
        .as[(Long, Seq[Double])].collect()
        .sortBy(_._1).zipWithIndex
        .map { case ((_, v), i) => (i, v.toArray) }
      val centB = s.sparkContext.broadcast(cents)
      def cosLocal(a: Array[Double], b: Seq[Double]): Double = {
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length && i < b.length) {
          dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
        }
        if (na == 0.0 || nb == 0.0) -1.0
        else math.max(-1.0, math.min(1.0, dot / (math.sqrt(na) * math.sqrt(nb))))
      }
      // assignment: one bounded map (<= DedupCells dot products per row).
      // Cached per dataset (NOT re-persisted per call — the three
      // consumers below reuse one materialization across repeated calls)
      val assigned = cachedAssign(s, d, () =>
        sampled.as[(Long, Seq[Double])]
          .map { case (id, v) =>
            val cs = centB.value.map { case (ci, c) => (ci, cosLocal(c, v)) }
            val (cell, cos) = cs.minBy { case (ci, sim) => (-sim, ci) }
            (id, cell, cos, v)
          }
          .toDF("vec_id", "cell", "cosToCent", "v")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      // angular radius per cell (DedupCells rows — bounded collect)
      val radii: Map[Int, Double] = assigned
        .groupBy($"cell").agg(min($"cosToCent").as("minCos"))
        .as[(Int, Double)].collect()
        .map { case (c, mc) => c -> math.acos(math.max(-1.0, math.min(1.0, mc))) }
        .toMap
      // surviving cell pairs via the triangle-inequality bound; the filter
      // threshold is the ROUNDED cut (round(cos,4) >= 0.30 admits cos >=
      // 0.29995), widened by an epsilon dwarfing any FP noise in the bound
      val thetaMax = math.acos(embDedupThreshold - 0.0001)
      val cellPairs = (for {
        (i, ci) <- cents.iterator
        (j, cj) <- cents.iterator if i <= j
        dij = math.acos(cosLocal(ci, cj.toSeq))
        if dij - radii.getOrElse(i, 0.0) - radii.getOrElse(j, 0.0) <=
          thetaMax + 1e-9
      } yield (i, j)).toSeq
      val cellPairsDF = broadcast(cellPairs.toDF("ca", "cb"))
      val a = assigned.select($"cell".as("ca"), $"vec_id".as("ia"), $"v".as("va"))
      val b = assigned.select($"cell".as("cb"), $"vec_id".as("ib"), $"v".as("vb"))
      // each unordered vector pair appears exactly once: cross-cell pairs
      // via their unique (ca <= cb) cell pair, same-cell pairs via ia < ib
      a.join(cellPairsDF, "ca").join(b, "cb")
        .filter($"ca" =!= $"cb" || $"ia" < $"ib")
        .select(least($"ia", $"ib").as("a"), greatest($"ia", $"ib").as("b"),
          round(cosineSim($"va", $"vb"), 4).as("cos"))
        .filter($"cos" >= embDedupThreshold)
        .orderBy($"a", $"b")
    }),

    // --- canonicalization over the EMBEDDING near-dup graph: the same
    //     distributed connected components that close the text-dedup family
    //     (q79) reused over q42's exact pair set — and because q42's pairs
    //     ARE SQL-expressible, this CC entry carries a FULL recursive-CTE
    //     oracle (unlike q79's minhash upstream, nothing here is
    //     approximate). (vec_id, component, is_canonical) per sampled
    //     vector; keep = the component minimum.
    "q82_embedding_components" -> ((s, d) => {
      val pairs = extraQueries("q42_embedding_dedup")(s, d)
        .select(col("a"), col("b"))
      val (labels, _) = ConnectedComponents.run(s, pairs)
      val nodes = emb(s, d).filter(col("vec_id") % 4 === 0).select(col("vec_id"))
      nodes.join(labels, nodes("vec_id") === labels("node"), "left_outer")
        .select(col("vec_id"),
          coalesce(col("component"), col("vec_id")).as("component"),
          (coalesce(col("component"), col("vec_id")) === col("vec_id"))
            .as("is_canonical"))
        .orderBy(col("vec_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q82_embedding_components" ->
      s"""WITH RECURSIVE emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |           FROM embeddings WHERE vec_id % 4 = 0),
         |pairs AS (
         |  SELECT a.vec_id AS a, b.vec_id AS b
         |  FROM emb a JOIN emb b ON a.vec_id < b.vec_id
         |  WHERE round(list_dot_product(a.v, b.v) /
         |    (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4) >= $embDedupThreshold),
         |edges AS (SELECT a AS u, b AS w FROM pairs UNION SELECT b AS u, a AS w FROM pairs),
         |reach(node, lab) AS (
         |  SELECT vec_id, vec_id FROM emb
         |  UNION
         |  SELECT e.w, r.lab FROM reach r JOIN edges e ON e.u = r.node)
         |SELECT node AS vec_id, min(lab)::BIGINT AS component,
         |  (node = min(lab)) AS is_canonical
         |FROM reach GROUP BY node ORDER BY vec_id""".stripMargin,
    "q42_embedding_dedup" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |           FROM embeddings WHERE vec_id % 4 = 0)
         |SELECT a.vec_id AS a, b.vec_id AS b,
         |  round(list_dot_product(a.v, b.v) /
         |    (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4) AS cos
         |FROM e a JOIN e b ON a.vec_id < b.vec_id
         |WHERE round(list_dot_product(a.v, b.v) /
         |    (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4) >= $embDedupThreshold
         |ORDER BY a, b""".stripMargin,
    "q40_knn_bruteforce" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |probes AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < $NumProbes),
         |pairs AS (
         |  SELECT p.query_id, e.vec_id AS neighbor_id,
         |    round(list_dot_product(p.qv, e.v) /
         |      (sqrt(list_dot_product(p.qv, p.qv)) * sqrt(list_dot_product(e.v, e.v))), 4) AS cos
         |  FROM probes p CROSS JOIN e WHERE e.vec_id >= $NumProbes),
         |ranked AS (
         |  SELECT query_id, neighbor_id, cos,
         |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC)::BIGINT AS rk
         |  FROM pairs)
         |SELECT query_id, neighbor_id, cos, rk FROM ranked
         |WHERE rk <= $TopK ORDER BY query_id, rk""".stripMargin
    // q41_knn_lsh: rows-only check; recall pinned in SimilaritySpec
  )
}
