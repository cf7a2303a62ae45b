package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.pipeline.Sampling

/** Deterministic hash sampling: the keep-set is a pure function of the
  * row key — stable under repartitioning and engine — with the observed
  * rate tracking the requested one. */
class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val ids = spark.range(0, 20000).toDF("id")

  test("thresholdHex: exact on dyadic rates, 32 digits, monotone") {
    assert(Sampling.thresholdHex(0.5) == "8" + "0" * 31)
    assert(Sampling.thresholdHex(0.25) == "4" + "0" * 31)
    assert(Sampling.thresholdHex(0.0) == "0" * 32)
    assert(Sampling.thresholdHex(1.0) == "f" * 32)
    val ts = Seq(0.01, 0.1, 0.3, 0.5, 0.9).map(Sampling.thresholdHex)
    assert(ts == ts.sorted && ts.forall(_.length == 32))
  }

  test("observed rate tracks the requested rate (md5 uniformity)") {
    for (rate <- Seq(0.1, 0.5)) {
      val n = ids.filter(Sampling.hashSample(col("id"), rate, "t")).count()
      val expected = 20000 * rate
      assert(math.abs(n - expected) < 4 * math.sqrt(expected),
        s"rate $rate kept $n of 20000")
    }
  }

  test("keep-set is identical under any partitioning, and disjoint salts are independent") {
    val a = ids.filter(Sampling.hashSample(col("id"), 0.3, "s"))
      .as[Long].collect().toSet
    val b = ids.repartition(17).filter(Sampling.hashSample(col("id"), 0.3, "s"))
      .as[Long].collect().toSet
    assert(a == b, "sample changed under repartitioning")
    // a different salt draws an (approximately) independent sample:
    // overlap ≈ rate² of the population, far from either marginal
    val c = ids.filter(Sampling.hashSample(col("id"), 0.3, "u"))
      .as[Long].collect().toSet
    val overlap = (a & c).size.toDouble
    assert(math.abs(overlap - 20000 * 0.09) < 4 * math.sqrt(20000 * 0.09),
      s"salted overlap $overlap not ~ rate^2")
    // nested rates: the 0.1 sample is a subset of the 0.3 sample (same salt)
    val d = ids.filter(Sampling.hashSample(col("id"), 0.1, "s"))
      .as[Long].collect().toSet
    assert(d.subsetOf(a), "thresholds must nest")
  }

  test("plan shape: rate filter fuses into the scan; exact-N is TakeOrderedAndProject") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val filtered = docs.filter(Sampling.hashSample(col("doc_id"), 0.25, "p"))
      .select("doc_id")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sampling filter must not shuffle:\n$plan")
    val topn = Sampling.hashTopN(docs.select(col("doc_id")), col("doc_id"), 50, "p")
    val tPlan = topn.queryExecution.executedPlan.toString
    assert(tPlan.contains("TakeOrderedAndProject"),
      s"exact-N sample should be TakeOrderedAndProject:\n$tPlan")
    assert(topn.count() == 50)
  }
}
