package graft.corpus

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.model.SourceFile

/** Deterministic synthetic source-code corpus (FIXTURES.md §1).
  *
  * Schema = BASELINE.json `input_hint`: (repo, path, commit, lang, content).
  * Generation is per-row seeded (seed derived from the global file id via
  * splitmix64), so the corpus is byte-identical regardless of partition
  * count or execution order — a precondition for the rank-identity and
  * scaling-efficiency runs (same input at local[8] and local[32]).
  *
  * The vocabulary is Zipf-weighted (~20k identifiers) plus per-language
  * keyword sets, guaranteeing heavy-hitter terms (`if`, `return`, …) that
  * exercise the salted merge path, mirroring the skew the reference defuses
  * with fixed 512-way overflow partitions (aggregation_hash_table.cpp:120).
  */
object CorpusGen {
  final val Langs: Vector[String] = Vector("scala", "java", "py", "c", "go", "md")
  final val Ext: Map[String, String] = Map(
    "scala" -> "scala", "java" -> "java", "py" -> "py",
    "c" -> "c", "go" -> "go", "md" -> "md")
  final val Keywords: Map[String, Vector[String]] = Map(
    "scala" -> Vector("def", "val", "if", "else", "match", "case", "return", "import", "class", "object"),
    "java" -> Vector("public", "static", "void", "if", "else", "return", "import", "class", "new", "final"),
    "py" -> Vector("def", "if", "else", "return", "import", "class", "for", "in", "None", "self"),
    "c" -> Vector("int", "void", "if", "else", "return", "include", "struct", "for", "while", "static"),
    "go" -> Vector("func", "if", "else", "return", "import", "package", "for", "range", "var", "type"),
    "md" -> Vector("the", "and", "for", "with", "this", "that", "use", "run", "build", "test"))

  final val VocabSize = 20000

  // -- deterministic per-row PRNG ------------------------------------------
  @inline def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Stateless counter-based RNG: nth draw for a given stream. */
  @inline private def draw(stream: Long, n: Int): Long =
    splitmix64(stream * 0x100000001b3L + n)

  @inline private def uniform(x: Long, bound: Int): Int =
    (((x >>> 1) % bound).toInt)

  /** Zipf-ish rank via inverse-power transform of a uniform draw:
    * rank ~ floor(u^(2) * V) concentrates mass on low ranks. */
  @inline private def zipfRank(x: Long, vocab: Int): Int = {
    val u = ((x >>> 11).toDouble / (1L << 53).toDouble) // [0,1)
    val r = (u * u * vocab).toInt
    if (r >= vocab) vocab - 1 else r
  }

  def identifier(rank: Int): String = {
    // Deterministic readable identifier for a vocab rank.
    val roots = Vector("get", "set", "run", "map", "key", "val", "idx", "buf",
      "node", "item", "data", "conf", "util", "exec", "scan", "sort", "hash",
      "join", "agg", "plan", "col", "row", "doc", "term", "pos", "len")
    val r1 = roots((rank * 7919) % roots.length)
    val r2 = roots((rank * 104729 / roots.length) % roots.length)
    if (rank < roots.length) r1
    else if (rank < roots.length * roots.length) s"${r1}_$r2"
    else f"${r1}_${r2}_x${rank % 997}%03d"
  }

  def sha256Hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
  }

  /** Generate file #id of a corpus with `seed`. Pure function. */
  def genFile(id: Long, seed: Long): SourceFile = {
    val s = splitmix64(seed ^ splitmix64(id))
    // Zipf-weighted repo choice over ~50 repos: square a uniform draw.
    val repoIdx = { val u = (draw(s, 0) >>> 11).toDouble / (1L << 53).toDouble
      val r = (u * u * 50).toInt; if (r >= 50) 49 else r }
    val lang = Langs(uniform(draw(s, 1), Langs.length))
    val dir = uniform(draw(s, 2), 40)
    val path = s"src/dir$dir/File${id}.${Ext(lang)}"
    val repo = s"org${repoIdx % 7}/repo$repoIdx"
    val commit = sha256Hex(s"$repo/$path#$seed").substring(0, 40)
    val lines = 10 + uniform(draw(s, 3), 391) // 10..400 lines
    val kw = Keywords(lang)
    val sb = new java.lang.StringBuilder(lines * 40)
    var ln = 0
    var n = 16 // draw counter
    while (ln < lines) {
      val tokensInLine = 3 + uniform(draw(s, n), 8); n += 1
      var t = 0
      while (t < tokensInLine) {
        val x = draw(s, n); n += 1
        // ~35% keyword, else Zipfian vocab identifier
        if ((x & 0xff) < 90) sb.append(kw(uniform(x >>> 8, kw.length)))
        else sb.append(identifier(zipfRank(x, VocabSize)))
        sb.append(if (t == tokensInLine - 1) "" else " ")
        t += 1
      }
      sb.append('\n')
      ln += 1
    }
    SourceFile(repo, path, commit, lang, sb.toString)
  }

  /** Distributed deterministic corpus of `numFiles` files. */
  def generate(spark: SparkSession, numFiles: Long, seed: Long = 42L,
      partitions: Int = 0): Dataset[SourceFile] = {
    import spark.implicits._
    val p = if (partitions > 0) partitions
            else spark.sparkContext.defaultParallelism * 2
    spark.range(0L, numFiles, 1L, p).map(id => genFile(id, seed))
  }
}
