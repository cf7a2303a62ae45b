package graft.query

import scala.collection.mutable
import graft.analysis.CodeTokenizer
import graft.index.IndexBuilder
import graft.model.{BM25Params, ScoredDoc, SourceFile}

/** Sequential, obviously-correct, single-threaded BM25 reference scorer.
  *
  * This is the parity anchor required by SURVEY.md §7.0: the reference repo
  * is a relational DBMS with no BM25, so "rank-identical to the reference"
  * is anchored to this scorer. The distributed pipeline (index build + TAAT
  * and Block-Max WAND scorers) must match its top-k docIds AND scores
  * exactly, at every parallelism level.
  *
  * Shares the tokenizer and the scoring formulas with the engine but nothing
  * else: no Spark, no codec, no sharding — a straight-line textbook
  * implementation (docId = lexicographic rank of (repo, path, commit);
  * contributions summed in canonical sorted-term order; tie-break score
  * DESC, docId ASC).
  */
final class SequentialOracle(corpus: Seq[SourceFile],
    params: BM25Params = BM25Params(), unicodeFold: Boolean = false) {

  private val sorted: Vector[SourceFile] =
    corpus.sortBy(f => (f.repo, f.path, f.commit)).toVector
  val numDocs: Long = sorted.length.toLong

  private val termFreqs: Vector[mutable.HashMap[String, Int]] =
    sorted.map(f => CodeTokenizer.termFreqs(f.content, unicodeFold)._1)
  private val docLens: Vector[Int] =
    sorted.map(f => CodeTokenizer.docLength(f.content, unicodeFold))
  val avgDl: Double = docLens.map(_.toLong).sum.toDouble / math.max(numDocs, 1L)

  private val df: mutable.HashMap[String, Long] = {
    val m = mutable.HashMap.empty[String, Long]
    termFreqs.foreach(_.keysIterator.foreach(t => m.update(t, m.getOrElse(t, 0L) + 1L)))
    m
  }

  def docKey(docId: Long): (String, String, String) = {
    val f = sorted(docId.toInt); (f.repo, f.path, f.commit)
  }

  def score(query: String, docId: Long): Double = {
    val terms = CodeTokenizer.tokenize(query, unicodeFold).distinct.sorted
    val tf = termFreqs(docId.toInt)
    val dl = docLens(docId.toInt)
    var s = 0.0
    terms.foreach { t =>
      tf.get(t).foreach { f =>
        val w = IndexBuilder.idf(numDocs, df(t)) * (params.k1 + 1.0)
        s += w * IndexBuilder.tfNorm(f, dl, avgDl, params)
      }
    }
    s
  }

  def topK(query: String, k: Int): Vector[ScoredDoc] = {
    val terms = CodeTokenizer.tokenize(query, unicodeFold).distinct.sorted.filter(df.contains)
    if (terms.isEmpty) return Vector.empty
    val hits = (0L until numDocs)
      .map(d => ScoredDoc(d, score(query, d)))
      .filter(_.score > 0.0)
    hits.sortBy(sd => (-sd.score, sd.docId)).take(k).toVector
  }
}
