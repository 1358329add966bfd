package graft.expr

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import graft.SparkSpec
import graft.llm.TextOps

class ShingleDeletionHashesSpec extends SparkSpec {
  import spark.implicits._

  private def md5h28(t: String): Long = {
    val d = MessageDigest.getInstance("MD5").digest(t.getBytes(StandardCharsets.UTF_8))
    (((d(0) & 0xffL) << 20) | ((d(1) & 0xffL) << 12) |
      ((d(2) & 0xffL) << 4) | ((d(3) & 0xffL) >> 4))
  }

  /** Pure-Scala reference: every n-window, every deletion position,
    * affine combination over the SURVIVING tokens. */
  private def reference(text: String, n: Int): Seq[Long] = {
    val th = text.split("\\s+", -1).map(md5h28)
    val c = TextOps.ShingleC.take(n - 1)
    val out = scala.collection.mutable.LinkedHashSet[Long]()
    for (i <- 0 to th.length - n; del <- 0 until n) {
      val acc = (0 until n - 1).map { k =>
        th(i + k + (if (k >= del) 1 else 0)) * c(k)
      }.sum
      out += acc % TextOps.ShingleM
    }
    out.toSeq
  }

  test("compiled deletion-neighborhood hashes match the pure-Scala reference bit-for-bit") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b c d e",
      "one two three four",   // exactly n tokens for n=4
      "repeat repeat repeat repeat repeat",
      "short",                // below n → empty
    )
    for (n <- Seq(2, 4, 6); t <- texts) {
      val got = Seq(t).toDF("text")
        .select(TextOps.shingleDeletionHashes($"text", n).as("hs"))
        .as[Seq[Long]].head()
      assert(got == reference(t, n), s"n=$n text='$t'")
    }
  }

  test("a one-token edit inside a window still shares a variant hash") {
    val clean = "alpha beta gamma delta"
    val inserted = "alpha beta JUNK gamma delta"     // insertion
    val dropped = "alpha beta delta"                 // deletion (n=4 window of clean)
    val swapped = "alpha beta ZZZ delta"             // substitution
    def hs(t: String, n: Int) = Seq(t).toDF("text")
      .select(TextOps.shingleDeletionHashes($"text", n).as("hs"))
      .as[Seq[Long]].head().toSet
    val c4 = hs(clean, 4)
    assert((c4 & hs(inserted, 4)).nonEmpty, "insertion must collide")
    assert((c4 & hs(swapped, 4)).nonEmpty, "substitution must collide")
    // dropped alone has 3 tokens (below n=4 → no windows), but in
    // context ("… delta END") its window's delete-END variant "alpha
    // beta delta" meets clean's delete-gamma variant — symmetric
    assert((c4 & hs(dropped + " END", 4)).nonEmpty, "deletion must collide")
    // guard: unrelated text shares nothing
    assert((c4 & hs("totally different words here", 4)).isEmpty)
  }

  test("n below 2 or beyond the coefficient family is rejected") {
    intercept[IllegalArgumentException] {
      TextOps.shingleDeletionHashes($"text", 1)
    }
    intercept[IllegalArgumentException] {
      TextOps.shingleDeletionHashes($"text", TextOps.ShingleC.length + 2)
    }
  }
}
