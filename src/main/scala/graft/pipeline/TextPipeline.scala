package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.analysis.CodeTokenizer

/** Training-data text pipeline over the `documents` table: token statistics,
  * quality scoring, language ID, document fingerprinting, exact and
  * near-duplicate detection (MinHash/LSH, SimHash, n-gram Jaccard).
  *
  * Everything integer-derived is exact cross-engine; ratios are divisions of
  * exact integers (bit-identical in IEEE754), so most of these queries carry
  * a full DuckDB oracle. MinHash uses md5-prefix integer hashing
  * (`CAST('0x'||substr(md5(t),1,7) AS BIGINT)`, < 2^28) with affine hash
  * families in Long arithmetic — expressible identically in SQL.
  *
  * Scale notes: all shapes are groupBy/join on bounded keys; near-dup
  * candidate generation is band-bucket self-join (LSH), never all-pairs;
  * the n-gram Jaccard demo restricts pairs to (lang, source) buckets, the
  * way a production pipeline would block on a cheap key first.
  */
object TextPipeline {

  private def docs(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"$d/documents.parquet")

  /** Shared tokenization as a Column expression — the SQL-parity twin of
    * CodeTokenizer (same regex semantics; CodeTokenizerSpec pins them). */
  private def tokensCol(text: org.apache.spark.sql.Column) =
    filter(split(lower(text), "[^a-z0-9_]+"),
      t => length(t) >= CodeTokenizer.MinLen && length(t) <= CodeTokenizer.MaxLen)

  private val tokensSqlDuck =
    "SELECT doc_id, t AS term FROM (SELECT doc_id, unnest(regexp_split_to_array(lower(text),'[^a-z0-9_]+')) AS t FROM documents) WHERE length(t) BETWEEN 2 AND 64"

  type Q = (SparkSession, String) => DataFrame

  val MinhashHashes = 8
  val MinhashBands = 4 // 2 rows per band
  // q35: LSH buckets larger than this are dropped BEFORE pair expansion (a
  // bucket this hot means the band key is degenerate and carries no near-dup
  // signal; expanding it is the C(n,2) blowup). Max observed bucket in this
  // corpus is 625 docs at sf0.1, so the cap never fires at any test scale —
  // asserted by PipelineSpec — and the q35 oracle stays exact.
  val MinhashBucketCap = 4096
  // q36: drop shingles shared by more than this many sampled docs before
  // the self-join (hot-shingle quadratic-blowup guard)
  val ShingleDfCut = 10
  // affine hash family over h < 2^28: (a*h + b) mod p, products < 2^59
  val MinhashP = 2147483647L // 2^31 - 1
  val MinhashA: Array[Long] = Array(1103515245L, 1299709L, 15485863L, 32452843L,
    49979687L, 67867967L, 86028121L, 104395301L)
  val MinhashB: Array[Long] = Array(12345L, 7919L, 104729L, 1299721L,
    15485867L, 32452867L, 49979693L, 67867979L)

  val queries: Map[String, Q] = Map(
    // --- per-document token statistics
    "q30_token_stats" -> ((s, d) => {
      docs(s, d)
        .withColumn("toks", tokensCol(col("text")))
        .select(col("doc_id"),
          size(col("toks")).cast("long").as("n_tokens"),
          size(array_distinct(col("toks"))).cast("long").as("n_distinct"))
        .orderBy(col("doc_id"))
    }),

    // --- quality scoring: ratios of exact integers
    "q31_quality" -> ((s, d) => {
      val stop = Seq("the", "and", "for", "with", "this", "that", "is", "of", "to", "in")
      docs(s, d)
        .withColumn("toks", tokensCol(col("text")))
        .withColumn("n_tokens", size(col("toks")).cast("long"))
        .withColumn("sum_len",
          aggregate(col("toks"), lit(0L), (acc, t) => acc + length(t).cast("long")))
        .withColumn("n_stop",
          size(filter(col("toks"), t => t.isin(stop: _*))).cast("long"))
        .filter(col("n_tokens") > 0)
        .select(col("doc_id"),
          length(col("text")).cast("long").as("n_chars"),
          col("n_tokens"),
          round(col("sum_len").cast("double") / col("n_tokens"), 4).as("avg_token_len"),
          round(col("n_stop").cast("double") / col("n_tokens"), 4).as("stopword_ratio"))
        .orderBy(col("doc_id"))
    }),

    // --- language ID by marker-token voting (n-gram heuristic family)
    "q32_lang_id" -> ((s, d) => {
      val en = Seq("the", "and", "for", "with", "this")
      val de = Seq("und", "der", "nicht", "mit", "das")
      val es = Seq("que", "los", "para", "con", "una")
      def hits(ws: Seq[String]) =
        size(filter(col("toks"), t => t.isin(ws: _*))).cast("long")
      docs(s, d)
        .withColumn("toks", tokensCol(col("text")))
        .withColumn("hits_en", hits(en))
        .withColumn("hits_de", hits(de))
        .withColumn("hits_es", hits(es))
        .select(col("doc_id"), col("lang").as("labeled_lang"),
          col("hits_en"), col("hits_de"), col("hits_es"),
          when(col("hits_en") >= col("hits_de") && col("hits_en") >= col("hits_es"), "en")
            .when(col("hits_de") >= col("hits_es"), "de")
            .otherwise("es").as("pred_lang"))
        .orderBy(col("doc_id"))
    }),

    // --- exact dedup: content fingerprint + canonical-row choice
    "q33_exact_dedup" -> ((s, d) => {
      val w = Window.partitionBy(col("fp"))
      docs(s, d)
        .withColumn("fp", md5(col("text")))
        .withColumn("dup_count", count(lit(1)).over(w))
        .withColumn("keep_id", min(col("doc_id")).over(w))
        .select(col("doc_id"), col("fp"), col("dup_count"),
          (col("doc_id") === col("keep_id")).as("is_canonical"))
        .orderBy(col("doc_id"))
    }),

    // --- document fingerprint: MinHash signature (md5-prefix base hash,
    //     affine family, integer-exact cross-engine)
    "q34_minhash_sig" -> ((s, d) => {
      val base = docs(s, d)
        .withColumn("term", explode(array_distinct(tokensCol(col("text")))))
        .withColumn("h", conv(substring(md5(col("term")), 1, 7), 16, 10).cast("long"))
      val aggs = (0 until MinhashHashes).map(j =>
        min((col("h") * MinhashA(j) + MinhashB(j)) % MinhashP).as(s"mh$j"))
      base.groupBy(col("doc_id"))
        .agg(aggs.head, aggs.tail: _*)
        .orderBy(col("doc_id"))
    }),

    // --- MinHash + LSH near-dup candidate pairs: band signatures bucket-join.
    //     Sampled every 5th doc: this synthetic corpus is drawn from a tiny
    //     shared vocabulary, so ALL docs are minhash-near-dups and unsampled
    //     candidate pairs grow quadratically (9.2M at sf0.1) — sampling keeps
    //     the demo bounded while exercising the identical plan shape.
    "q35_minhash_pairs" -> ((s, d) => {
      val base = docs(s, d).filter(col("doc_id") % 5 === 0)
        .withColumn("term", explode(array_distinct(tokensCol(col("text")))))
        .withColumn("h", conv(substring(md5(col("term")), 1, 7), 16, 10).cast("long"))
      val aggs = (0 until MinhashHashes).map(j =>
        min((col("h") * MinhashA(j) + MinhashB(j)) % MinhashP).as(s"mh$j"))
      val sig = base.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
      // bands of 2 rows: bucket key = (band, mh_{2b}, mh_{2b+1}); a single
      // explode instead of a 4-way union so the signature aggregation runs
      // once. Candidate pairs by grouping each bucket's doc list and
      // expanding combinations — a bucket SELF-JOIN defeats exchange reuse
      // and runs the whole md5+minhash aggregation once per side (measured
      // on q36's identical shape). The collect is CappedCollect, not
      // collect_list: a bucket above MinhashBucketCap never materializes
      // (the buffer stops growing at the cap) and is counted+dropped
      // instead of expanded — the hard bound that makes the C(n,2)
      // expansion safe on an all-near-dup corpus.
      import s.implicits._
      val dropped = s.sparkContext.longAccumulator("q35_dropped_buckets")
      val cappedCollect = udaf(new graft.functions.CappedCollect(MinhashBucketCap),
        org.apache.spark.sql.Encoders.scalaLong)
      val bandArr = array((0 until MinhashBands).map { b =>
        struct(lit(b).as("band"), col(s"mh${2 * b}").as("k1"),
          col(s"mh${2 * b + 1}").as("k2"))
      }: _*)
      sig.select(col("doc_id"), explode(bandArr).as("bk"))
        .groupBy(col("bk.band"), col("bk.k1"), col("bk.k2"))
        .agg(cappedCollect(col("doc_id")).as("cd"))
        .select(col("cd.ds").as("ds"), col("cd.overflow").as("overflow"))
        .as[(Seq[Long], Boolean)]
        .flatMap { case (ds, overflow) =>
          if (overflow) { dropped.add(1); Iterator.empty }
          else {
            val sorted = ds.sorted
            for {
              i <- sorted.indices.iterator
              j <- (i + 1) until sorted.length
            } yield (sorted(i), sorted(j))
          }
        }
        .toDF("a", "b").distinct()
        .orderBy(col("a"), col("b"))
    }),

    // --- n-gram (3-token shingle) Jaccard similarity within (lang, source)
    //     blocks, sampled every 10th doc. Shingles with document frequency
    //     above ShingleDfCut are dropped BEFORE the self-join: within a hot
    //     shingle the join is quadratic in the docs sharing it, and
    //     super-common shingles carry no near-dup signal anyway (standard
    //     df-cut practice). Jaccard is then computed over the KEPT shingle
    //     sets on both sides (max observed shingle df in this corpus is 7,
    //     so results are unchanged at every test sf — the cut is pure
    //     scale insurance).
    "q36_ngram_jaccard" -> ((s, d) => {
      // doc → distinct 3-shingles as a typed flatMap over CodeTokenizer
      // (the engine's UDTF shape; tokenizer parity with the SQL twin is
      // pinned by TokenizerSpec). Expression formulations measured worse
      // here: nested zip_with costs ~1.9 s of one-time Janino compilation,
      // and a transform(sequence)/element_at lambda gets the tokenization
      // expression INLINED PER ELEMENT by CollapseProject — O(tokens²)/row.
      import s.implicits._
      val exploded = docs(s, d).filter(col("doc_id") % 10 === 0)
        .select(col("doc_id"), col("lang"), col("source"), col("text"))
        .as[(Long, String, String, String)]
        .flatMap { case (id, lang, source, text) =>
          val toks = CodeTokenizer.tokenize(text)
          val seen = scala.collection.mutable.LinkedHashSet.empty[String]
          var i = 0
          while (i + 2 < toks.length) {
            seen += s"${toks(i)} ${toks(i + 1)} ${toks(i + 2)}"
            i += 1
          }
          seen.iterator.map(sh => (id, lang, source, sh))
        }
        .toDF("doc_id", "lang", "source", "shingle")
      // df-cut and per-doc counts as window aggregates over ONE lineage,
      // then pairs by grouping each shingle's (≤ ShingleDfCut) doc list and
      // expanding combinations — NO self-join: a self-join here defeats
      // exchange reuse and re-executes the whole tokenize→explode→window
      // chain per side (measured 3.5× slower). Within a shingle the
      // expansion is ≤ C(ShingleDfCut, 2) pairs — the quadratic term is
      // hard-bounded, which is the whole point of the df-cut.
      val kept = exploded
        .withColumn("df", count(lit(1)).over(Window.partitionBy(col("shingle"))))
        .filter(col("df") <= ShingleDfCut)
        .withColumn("n_sh", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
        .select(col("lang"), col("source"), col("shingle"),
          col("doc_id"), col("n_sh"))
      kept
        .groupBy(col("lang"), col("source"), col("shingle"))
        .agg(collect_list(struct(col("doc_id"), col("n_sh"))).as("ds"))
        .select(col("ds")).as[Seq[(Long, Long)]]
        .flatMap { ds =>
          val sorted = ds.sortBy(_._1)
          for {
            i <- sorted.indices.iterator
            j <- (i + 1) until sorted.length
          } yield (sorted(i)._1, sorted(j)._1, sorted(i)._2, sorted(j)._2)
        }
        .toDF("a", "b", "na", "nb")
        .groupBy(col("a"), col("b"), col("na"), col("nb"))
        .agg(count(lit(1)).as("inter"))
        .select(col("a"), col("b"),
          round(col("inter").cast("double") /
            (col("na") + col("nb") - col("inter")).cast("double"), 4).as("jaccard"))
        .orderBy(col("a"), col("b"))
    }),

    // --- fuzzy-dedup canonicalization: connected components over the q35
    //     near-dup pair graph (alternating large-star/small-star — see
    //     ConnectedComponents), then per-doc keep/drop: component = the
    //     minimum doc_id reachable through near-dup pairs, canonical = the
    //     component minimum. This closes the dedup family end-to-end
    //     (candidates → pairs → components → keep/drop), the step a
    //     training-data pipeline actually executes after candidate
    //     generation. Singletons (no near-dup) are their own canonical.
    "q79_dedup_components" -> ((s, d) => {
      val pairs = queries("q35_minhash_pairs")(s, d).select(col("a"), col("b"))
      val (labels, _) = ConnectedComponents.run(s, pairs)
      val nodes = docs(s, d).filter(col("doc_id") % 5 === 0).select(col("doc_id"))
      nodes.join(labels, nodes("doc_id") === labels("node"), "left_outer")
        .select(col("doc_id"),
          coalesce(col("component"), col("doc_id")).as("component"),
          (coalesce(col("component"), col("doc_id")) === col("doc_id"))
            .as("is_canonical"))
        .orderBy(col("doc_id"))
    }),

    // --- token counting, whitespace + BPE-ish regex (the two counting
    //     conventions an LLM-data pipeline actually reports): whitespace
    //     tokens via split, BPE-ish tokens via a GPT-2-style pattern
    //     (contraction suffixes | letter runs | digit runs | punctuation
    //     runs), counted with regexp_count on both engines.
    "q70_token_counts" -> ((s, d) => {
      docs(s, d)
        .select(col("doc_id"),
          size(split(trim(col("text")), "\\s+")).cast("long").as("ws_tokens"),
          regexp_count(col("text"),
            lit("'(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+"))
            .cast("long").as("bpe_tokens"))
        .orderBy(col("doc_id"))
    }),

    // --- document fingerprinting via rolling-window hashing (winnowing
    //     family): hash every 16-char window at stride 8, keep the MIN —
    //     a content-defined fingerprint stable under trailing edits. The
    //     md5-prefix integer hash is the same cross-engine primitive the
    //     minhash family uses.
    "q71_window_fingerprint" -> ((s, d) => {
      import s.implicits._
      docs(s, d).select(col("doc_id"), col("text")).as[(Long, String)]
        .map { case (id, text) =>
          val md = java.security.MessageDigest.getInstance("MD5")
          var best = Long.MaxValue
          var i = 0
          val n = text.length
          var windows = 0L
          while (i + 16 <= n) {
            md.reset()
            val hex = md.digest(text.substring(i, i + 16).getBytes("UTF-8"))
              .take(4).map(b => f"$b%02x").mkString
            val h = java.lang.Long.parseLong(hex.substring(0, 7), 16)
            if (h < best) best = h
            windows += 1
            i += 8
          }
          (id, if (windows == 0) -1L else best, windows)
        }
        .toDF("doc_id", "fp", "n_windows")
        .orderBy(col("doc_id"))
    }),

    // --- SimHash-64 fingerprint (bit-vote over term hashes). Not
    //     SQL-expressible at sane cost → rows-only driver check; exactness
    //     pinned by SimHashSpec instead.
    "q37_simhash" -> ((s, d) => {
      import s.implicits._
      docs(s, d).select(col("doc_id"), col("text")).as[(Long, String)]
        .map { case (id, text) =>
          (id, SimHash.simhash64(CodeTokenizer.tokenize(text).toSeq))
        }
        .toDF("doc_id", "simhash")
        .orderBy(col("doc_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q30_token_stats" ->
      s"""WITH toks AS ($tokensSqlDuck)
         |SELECT d.doc_id, coalesce(t.n,0) AS n_tokens, coalesce(t.nd,0) AS n_distinct
         |FROM documents d LEFT JOIN (
         |  SELECT doc_id, count(*)::BIGINT AS n, count(DISTINCT term)::BIGINT AS nd
         |  FROM toks GROUP BY 1) t USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,
    "q31_quality" ->
      s"""WITH toks AS ($tokensSqlDuck)
         |SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS n_chars,
         |  t.n AS n_tokens,
         |  round(t.sum_len / t.n, 4) AS avg_token_len,
         |  round(t.n_stop / t.n, 4) AS stopword_ratio
         |FROM documents d JOIN (
         |  SELECT doc_id, count(*)::BIGINT AS n,
         |    CAST(sum(length(term)) AS DOUBLE) AS sum_len,
         |    CAST(sum(CASE WHEN term IN ('the','and','for','with','this','that','is','of','to','in') THEN 1 ELSE 0 END) AS DOUBLE) AS n_stop
         |  FROM toks GROUP BY 1) t USING (doc_id)
         |WHERE t.n > 0 ORDER BY d.doc_id""".stripMargin,
    "q32_lang_id" ->
      s"""WITH toks AS ($tokensSqlDuck),
         |h AS (SELECT d.doc_id, d.lang,
         |  coalesce(sum(CASE WHEN t.term IN ('the','and','for','with','this') THEN 1 ELSE 0 END),0)::BIGINT AS hits_en,
         |  coalesce(sum(CASE WHEN t.term IN ('und','der','nicht','mit','das') THEN 1 ELSE 0 END),0)::BIGINT AS hits_de,
         |  coalesce(sum(CASE WHEN t.term IN ('que','los','para','con','una') THEN 1 ELSE 0 END),0)::BIGINT AS hits_es
         |FROM documents d LEFT JOIN toks t USING (doc_id) GROUP BY 1,2)
         |SELECT doc_id, lang AS labeled_lang, hits_en, hits_de, hits_es,
         |  CASE WHEN hits_en >= hits_de AND hits_en >= hits_es THEN 'en'
         |       WHEN hits_de >= hits_es THEN 'de' ELSE 'es' END AS pred_lang
         |FROM h ORDER BY doc_id""".stripMargin,
    "q33_exact_dedup" ->
      """SELECT doc_id, md5(text) AS fp,
        |  count(*) OVER (PARTITION BY md5(text)) AS dup_count,
        |  doc_id = min(doc_id) OVER (PARTITION BY md5(text)) AS is_canonical
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q34_minhash_sig" -> {
      val hashSql = (0 until MinhashHashes).map(j =>
        s"min((h*${MinhashA(j)} + ${MinhashB(j)}) % $MinhashP) AS mh$j").mkString(",\n  ")
      s"""WITH toks AS ($tokensSqlDuck),
         |hv AS (SELECT DISTINCT doc_id, CAST(('0x' || substr(md5(term),1,7)) AS BIGINT) AS h
         |       FROM (SELECT DISTINCT doc_id, term FROM toks))
         |SELECT doc_id,
         |  $hashSql
         |FROM hv GROUP BY 1 ORDER BY doc_id""".stripMargin
    },
    "q35_minhash_pairs" -> {
      val hashSql = (0 until MinhashHashes).map(j =>
        s"min((h*${MinhashA(j)} + ${MinhashB(j)}) % $MinhashP) AS mh$j").mkString(",\n  ")
      val bandSql = (0 until MinhashBands).map(b =>
        s"SELECT doc_id, $b AS band, mh${2 * b} AS k1, mh${2 * b + 1} AS k2 FROM sig")
        .mkString("\n  UNION ALL ")
      s"""WITH toks AS ($tokensSqlDuck),
         |hv AS (SELECT DISTINCT doc_id, CAST(('0x' || substr(md5(term),1,7)) AS BIGINT) AS h
         |       FROM (SELECT DISTINCT doc_id, term FROM toks) WHERE doc_id % 5 = 0),
         |sig AS (SELECT doc_id, $hashSql FROM hv GROUP BY 1),
         |bands AS ($bandSql)
         |SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
         |FROM bands l JOIN bands r
         |  ON l.band = r.band AND l.k1 = r.k1 AND l.k2 = r.k2 AND l.doc_id < r.doc_id
         |ORDER BY a, b""".stripMargin
    },
    // q79: the same q35 pair CTE, then component = min reachable doc_id via
    // a recursive min-reachability CTE (an independent formulation of CC —
    // transitive closure + min — deliberately unlike the star-contraction
    // the engine runs)
    "q79_dedup_components" -> {
      val hashSql = (0 until MinhashHashes).map(j =>
        s"min((h*${MinhashA(j)} + ${MinhashB(j)}) % $MinhashP) AS mh$j").mkString(",\n  ")
      val bandSql = (0 until MinhashBands).map(b =>
        s"SELECT doc_id, $b AS band, mh${2 * b} AS k1, mh${2 * b + 1} AS k2 FROM sig")
        .mkString("\n  UNION ALL ")
      s"""WITH RECURSIVE toks AS ($tokensSqlDuck),
         |hv AS (SELECT DISTINCT doc_id, CAST(('0x' || substr(md5(term),1,7)) AS BIGINT) AS h
         |       FROM (SELECT DISTINCT doc_id, term FROM toks) WHERE doc_id % 5 = 0),
         |sig AS (SELECT doc_id, $hashSql FROM hv GROUP BY 1),
         |bands AS ($bandSql),
         |pairs AS (
         |  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
         |  FROM bands l JOIN bands r
         |    ON l.band = r.band AND l.k1 = r.k1 AND l.k2 = r.k2 AND l.doc_id < r.doc_id),
         |nodes AS (SELECT DISTINCT doc_id FROM documents WHERE doc_id % 5 = 0),
         |edges AS (SELECT a AS u, b AS v FROM pairs UNION SELECT b AS u, a AS v FROM pairs),
         |reach(node, lab) AS (
         |  SELECT doc_id, doc_id FROM nodes
         |  UNION
         |  SELECT e.v, r.lab FROM reach r JOIN edges e ON e.u = r.node)
         |SELECT node AS doc_id, min(lab)::BIGINT AS component,
         |  (node = min(lab)) AS is_canonical
         |FROM reach GROUP BY node ORDER BY doc_id""".stripMargin
    },
    "q36_ngram_jaccard" ->
      s"""WITH sampled AS (
         |  SELECT doc_id, lang, source,
         |    regexp_split_to_array(lower(text),'[^a-z0-9_]+') AS raw
         |  FROM documents WHERE doc_id % 10 = 0),
         |toks AS (
         |  SELECT doc_id, lang, source, term,
         |    row_number() OVER (PARTITION BY doc_id ORDER BY i) AS pos
         |  FROM (SELECT doc_id, lang, source, unnest(raw) AS term,
         |          generate_subscripts(raw,1) AS i FROM sampled)
         |  WHERE length(term) BETWEEN 2 AND 64),
         |sh0 AS (
         |  SELECT DISTINCT t1.doc_id, t1.lang, t1.source,
         |    t1.term || ' ' || t2.term || ' ' || t3.term AS shingle
         |  FROM toks t1 JOIN toks t2 ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
         |  JOIN toks t3 ON t1.doc_id = t3.doc_id AND t3.pos = t1.pos + 2),
         |dfs AS (SELECT shingle, count(*) AS dfc FROM sh0 GROUP BY 1),
         |sh AS (SELECT sh0.* FROM sh0 JOIN dfs USING (shingle) WHERE dfc <= $ShingleDfCut),
         |counts AS (SELECT doc_id, count(*)::BIGINT AS n_sh FROM sh GROUP BY 1),
         |inter AS (
         |  SELECT a.doc_id AS a, b.doc_id AS b, count(*)::BIGINT AS inter
         |  FROM sh a JOIN sh b ON a.lang = b.lang AND a.source = b.source
         |    AND a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1,2)
         |SELECT a, b,
         |  round(CAST(inter AS DOUBLE) / CAST(ca.n_sh + cb.n_sh - inter AS DOUBLE), 4) AS jaccard
         |FROM inter JOIN counts ca ON ca.doc_id = a JOIN counts cb ON cb.doc_id = b
         |ORDER BY a, b""".stripMargin,
    "q70_token_counts" ->
      """SELECT doc_id,
        |  len(regexp_split_to_array(trim(text), '\s+'))::BIGINT AS ws_tokens,
        |  len(regexp_extract_all(text,
        |    '''(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+'))::BIGINT
        |    AS bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q71_window_fingerprint" ->
      """SELECT d.doc_id,
        |  coalesce(min(CAST(('0x' || substr(md5(substr(d.text, g.i, 16)), 1, 7))
        |    AS BIGINT)), -1) AS fp,
        |  count(g.i)::BIGINT AS n_windows
        |FROM documents d
        |LEFT JOIN LATERAL (
        |  SELECT unnest(generate_series(1, greatest(length(d.text) - 15, 0), 8)) AS i
        |) g ON TRUE
        |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin
    // q37_simhash: no SQL oracle (rows-only check); see SimHashSpec
  )
}

/** 64-bit SimHash over token multisets: per-token 64-bit hash (FNV-1a),
  * signed bit votes, sign of each vote = fingerprint bit. */
object SimHash {
  def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  def simhash64(tokens: Seq[String]): Long = {
    val votes = new Array[Int](64)
    tokens.foreach { t =>
      val h = fnv1a64(t)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Hamming distance between fingerprints (near-dup predicate). */
  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}
