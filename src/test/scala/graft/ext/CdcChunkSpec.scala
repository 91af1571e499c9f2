package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Content-defined chunking: the property fixed-size chunking lacks is
  * SHIFT INVARIANCE — prepending text to a document must leave the chunk
  * hashes of the untouched tail intact (boundaries are functions of
  * content, not position). */
class CdcChunkSpec extends SparkSpec {
  import spark.implicits._

  private val words = (1 to 400).map(i => s"w${i % 97}x${(i * 31) % 53}")
  private val doc = words.mkString(" ")

  private def chunks(rows: Seq[(Long, String)]): Map[Long, Seq[Long]] =
    Dedup.cdcChunkTable(rows.toDF("doc_id", "text"))
      .orderBy("doc_id", "chunk_id")
      .collect()
      .groupBy(_.getLong(0))
      .map { case (d, rs) => d -> rs.map(_.getAs[Long]("chunk_hash")).toSeq }

  test("chunks cover the document exactly (word counts sum to doc length)") {
    val n = Dedup.cdcChunkTable(Seq((1L, doc)).toDF("doc_id", "text"))
      .agg(sum("n_words")).head().getLong(0)
    assert(n == words.size)
  }

  test("prefix insertion leaves the tail's chunk hashes intact (shift invariance)") {
    val shifted = "zzz qqq " + doc // 2 inserted words at the head
    val Seq(orig, moved) = Seq(chunks(Seq((1L, doc))), chunks(Seq((1L, shifted))))
      .map(_(1L))
    // every original chunk after the first boundary reappears verbatim
    val common = orig.toSet.intersect(moved.toSet)
    assert(common.size >= orig.size - 1,
      s"content-defined boundaries shifted: only ${common.size} of ${orig.size} chunks survived")
    // sanity: a FIXED-size chunking of the same docs would share (almost)
    // nothing — the shift breaks every 16-word window alignment
    val fixedOrig = words.grouped(16).map(_.mkString(" ")).toSet
    val fixedMoved = ("zzz" :: "qqq" :: words.toList).grouped(16).map(_.mkString(" ")).toSet
    assert(fixedOrig.intersect(fixedMoved).size <= 1)
  }

  test("shared blocks between different docs hash to the same chunks") {
    val shared = words.take(200).mkString(" ")
    val a = shared + " " + (1 to 50).map(i => s"a$i").mkString(" ")
    val b = (1 to 37).map(i => s"b$i").mkString(" ") + " " + shared
    val ch = chunks(Seq((1L, a), (2L, b)))
    val inter = ch(1L).toSet.intersect(ch(2L).toSet)
    assert(inter.size >= 5,
      s"shared 200-word block produced only ${inter.size} common chunks")
  }
}
