package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.CosineSimilarity
import graft.functions.CosineSimilarity.cosineSim

/** Custom Catalyst Expression + UDF/UDAF surface (SURVEY.md §2.10; the
  * reference's CREATE FUNCTION / TPL-builtin machinery). */
class FunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cosine_similarity expression matches the composed built-in form exactly") {
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(3.0, 2.0, 1.0)),
      (Array(1.0, 0.0), Array(0.0, 1.0)),
      (Array(0.5, -0.5, 2.5), Array(1.5, 2.5, -0.5))).toDF("a", "b")
    val composed = df.select(
      (aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0.0), (s, x) => s + x) /
        (sqrt(aggregate(zip_with($"a", $"a", (x, y) => x * y), lit(0.0), (s, x) => s + x)) *
         sqrt(aggregate(zip_with($"b", $"b", (x, y) => x * y), lit(0.0), (s, x) => s + x))))
        .as("c")).as[Double].collect()
    val native = df.select(cosineSim($"a", $"b").as("c")).as[Double].collect()
    assert(native.toSeq == composed.toSeq) // bit-identical, same fold order
  }

  test("cosine_similarity null/zero/mismatch handling (zip_with semantics)") {
    val df = Seq(
      (Some(Array(0.0, 0.0)), Some(Array(1.0, 2.0))),      // zero norm -> null
      (None, Some(Array(1.0, 2.0))),                       // null input -> null
      (Some(Array(1.0, 2.0, 3.0)), Some(Array(1.0, 2.0)))  // length mismatch -> null
    ).toDF("a", "b")
    val out = df.select(cosineSim($"a", $"b")).collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("cosine_similarity rejects non-double arrays at analysis time") {
    CosineSimilarity.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT cosine_similarity(array(1, 2), array(2, 1))").collect()
    }
    assert(e.getMessage.contains("ARRAY<DOUBLE>") ||
      e.getMessage.toLowerCase.contains("type"), e.getMessage)
  }

  test("cosine_similarity works under whole-stage codegen and via SQL") {
    CosineSimilarity.register(spark)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
    emb.createOrReplaceTempView("emb_fs")
    val viaSql = spark.sql(
      """SELECT a.vec_id x, b.vec_id y,
        |  round(cosine_similarity(a.v, b.v), 6) c
        |FROM emb_fs a JOIN emb_fs b ON a.vec_id < 3 AND b.vec_id BETWEEN 3 AND 6
        |ORDER BY x, y""".stripMargin).collect()
    val viaCol = emb.filter($"vec_id" < 3).select($"vec_id".as("x"), $"v".as("va"))
      .crossJoin(emb.filter($"vec_id".between(3, 6)).select($"vec_id".as("y"), $"v".as("vb")))
      .select($"x", $"y", round(cosineSim($"va", $"vb"), 6).as("c"))
      .orderBy($"x", $"y").collect()
    assert(viaSql.toSeq == viaCol.toSeq && viaSql.nonEmpty)
  }

  test("Scala UDF registration (CREATE FUNCTION parity)") {
    val tokenCount = udf((s: String) => graft.analysis.CodeTokenizer.docLength(s))
    spark.udf.register("token_count", tokenCount)
    val n = spark.sql("SELECT token_count('def foo_bar(x1: Int) = x1') AS n")
      .as[Int].head()
    assert(n == 5)
  }

  test("typed Aggregator (UDAF parity): per-group geometric mean") {
    import org.apache.spark.sql.expressions.Aggregator
    import org.apache.spark.sql.Encoder
    val geoMean = new Aggregator[Double, (Double, Long), Double] {
      def zero = (0.0, 0L)
      def reduce(b: (Double, Long), a: Double) = (b._1 + math.log(a), b._2 + 1)
      def merge(x: (Double, Long), y: (Double, Long)) = (x._1 + y._1, x._2 + y._2)
      def finish(b: (Double, Long)) = math.exp(b._1 / b._2)
      def bufferEncoder: Encoder[(Double, Long)] =
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaDouble,
          org.apache.spark.sql.Encoders.scalaLong)
      def outputEncoder: Encoder[Double] =
        org.apache.spark.sql.Encoders.scalaDouble
    }
    val ds = Seq(2.0, 8.0, 4.0).toDS()
    val gm = ds.select(geoMean.toColumn).head()
    assert(math.abs(gm - 4.0) < 1e-9)
  }

  test("parameterized SQL (prepared-statement parity, traffic_cop.cpp:282)") {
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .createOrReplaceTempView("orders_fs")
    val n = spark.sql(
      "SELECT count(*) FROM orders_fs WHERE o_totalprice > :minPrice",
      Map("minPrice" -> 100000.0)).as[Long].head()
    val expected = spark.sql(
      "SELECT count(*) FROM orders_fs WHERE o_totalprice > 100000.0").as[Long].head()
    assert(n == expected && n > 0)
  }

  test("sketches: approx_count_distinct (HLL++) and approx_percentile") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val (approx, exact) = li.agg(
      approx_count_distinct($"l_partkey").as("a"),
      countDistinct($"l_partkey").as("e")).as[(Long, Long)].head()
    assert(math.abs(approx - exact).toDouble / exact < 0.1,
      s"HLL estimate $approx too far from exact $exact")
    val p50 = li.agg(percentile_approx($"l_quantity", lit(0.5), lit(1000)))
      .head().getDouble(0)
    assert(p50 > 0 && p50 <= 50)
  }
}
