package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

import graft.codec.{PostingCodec, Posting, VByte}

/** Delta/VByte codec round-trip properties (required by BASELINE.json
  * north_star: "delta/VByte codec round-trips"). Property-style tests over
  * seeded random inputs (deterministic; the reference has no property tests
  * — we add them, SURVEY.md §5 carry-over). */
class CodecSpec extends AnyFunSuite {

  private def randPostings(rnd: Random, n: Int): List[Posting] = {
    var id = 0L
    (0 until n).map { _ =>
      id += 1 + rnd.nextLong(1L << 35)
      Posting(id, 1 + rnd.nextInt(1 << 20))
    }.toList
  }

  test("VByte round-trips values across the Long range (1000 seeded cases)") {
    val rnd = new Random(42)
    val edge = Seq(0L, 1L, 127L, 128L, 16383L, 16384L, Long.MaxValue)
    val vals = edge ++ (0 until 1000).map(_ => rnd.nextLong(Long.MaxValue))
    vals.foreach { v =>
      assert(VByte.decodeAll(VByte.encodeAll(Seq(v))) == Vector(v))
    }
    assert(VByte.decodeAll(VByte.encodeAll(vals)) == vals.toVector)
  }

  test("VByte encodes small values in one byte") {
    assert(VByte.encodeAll(Seq(0L, 1L, 127L)).length == 3)
    assert(VByte.encodeAll(Seq(128L)).length == 2)
  }

  test("posting block round-trips (200 seeded cases, gaps up to 2^35)") {
    val rnd = new Random(7)
    (0 until 200).foreach { _ =>
      val ps = randPostings(rnd, 1 + rnd.nextInt(2000))
      assert(PostingCodec.decodeBlock(PostingCodec.encodeBlock(ps)) == ps.toVector)
    }
  }

  test("foreachPosting streams the same sequence as decodeBlock") {
    val rnd = new Random(11)
    (0 until 50).foreach { _ =>
      val ps = randPostings(rnd, 1 + rnd.nextInt(500))
      val bytes = PostingCodec.encodeBlock(ps)
      val out = Vector.newBuilder[Posting]
      PostingCodec.foreachPosting(bytes)((d, tf) => out += Posting(d, tf))
      assert(out.result() == PostingCodec.decodeBlock(bytes))
    }
  }

  test("encodeBlock rejects non-increasing docIds") {
    intercept[IllegalArgumentException] {
      PostingCodec.encodeBlock(Seq(Posting(5, 1), Posting(5, 1)))
    }
  }

  test("buildBlocks frames at blockSize and keeps consistent block-max metadata") {
    val postings = (0 until 1000).map(i => (i.toLong * 3 + 1, (i % 7) + 1, 100))
    val norm = (tf: Int, dl: Int) => tf.toDouble / (tf + dl)
    val blocks = PostingCodec.buildBlocks(7, 0, postings, norm, blockSize = 128)
    assert(blocks.map(_.count).sum == 1000)
    assert(blocks.init.forall(_.count == 128))
    blocks.foreach { b =>
      val dec = PostingCodec.decodeBlock(b.bytes)
      assert(dec.head.docId == b.firstDocId)
      assert(dec.last.docId == b.lastDocId)
      assert(dec.map(_.tf).max == b.maxTf)
      assert(dec.map(_.tf.toLong).sum == b.sumTf)
      val expectedMaxNorm = dec.map(p => norm(p.tf, 100)).max
      assert(math.abs(b.maxTfNorm - expectedMaxNorm) < 1e-15)
    }
    // concatenating blocks reproduces the input (merge validity property)
    val all = blocks.flatMap(b => PostingCodec.decodeBlock(b.bytes))
    assert(all.map(p => (p.docId, p.tf)) == postings.map(p => (p._1, p._2)))
  }
}
