package graft.operators

import java.io.IOException
import java.net.URI

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** A local FileSystem whose RENAME of a `.tmp` publish stage is an
  * object-store emulation: per-child move in a deterministic order, torn
  * (IOException) after a configurable number of moves — the non-atomic-
  * rename window `IndexLifecycle.writeViaTmp`'s contract documents as the
  * residual gap on stores without atomic directory rename. Ordinary
  * renames (task commits, un-armed runs) stay native.
  */
class TornRenameFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: URI = URI.create("torn:///")

  override def rename(src: Path, dst: Path): Boolean = {
    if (TornRenameFileSystem.movesLeft < 0 || !src.getName.endsWith(".tmp")
        || !getFileStatus(src).isDirectory)
      return super.rename(src, dst)
    mkdirs(dst)
    val kids = listStatus(src).sortBy(_.getPath.getName).sortBy { k =>
      val sidecar = k.getPath.getName.startsWith("_block_stats")
      if (sidecar == TornRenameFileSystem.sidecarFirst) 0 else 1
    }
    kids.foreach { k =>
      if (TornRenameFileSystem.movesLeft == 0)
        throw new IOException(s"torn: rename $src -> $dst interrupted " +
          s"after moving ${listStatus(dst).length} of ${kids.length} entries")
      TornRenameFileSystem.movesLeft -= 1
      if (!super.rename(k.getPath, new Path(dst, k.getPath.getName)))
        throw new IOException(s"torn: child move failed for ${k.getPath}")
    }
    true
  }
}

object TornRenameFileSystem {
  /** -1 = disarmed (native rename); n >= 0 = tear after n child moves. */
  @volatile var movesLeft: Int = -1
  /** Child order of the emulated copy: sidecar before postings or after. */
  @volatile var sidecarFirst: Boolean = true
}

/** The ingest publish contract ON AN OBJECT STORE (non-atomic rename):
  * at EVERY possible tear point of a torn replay, (a) committed batches
  * stay fully probe-visible (never under-read), (b) the WAND probe is
  * NEVER silently wrong — when the torn subtree's sidecar is visible
  * (sidecar-first copy order: the over-complete state the sidecar-first
  * stage invariant documents) it equals the plain probe EXACTLY (phantom
  * sidecar rows only weaken bounds); when postings land before their
  * sidecar (the hostile copy order) it refuses LOUDLY with the
  * `_block_stats` guard instead of silently pruning unbounded blocks —
  * and (c) the batch's replay repairs the index to the clean result
  * bit-identically in both orders.
  */
class TornPublishSpec extends SparkSpec {
  import spark.implicits._

  private def docs: DataFrame = Seq(
    (0L, "a a b x"), (1L, "a c"), (2L, "b b b c y y"), (3L, "a b a b c"),
    // batch-1 docs share the committed vocabulary AND add their own —
    // a torn batch-1 must never disturb committed-doc membership
    (6L, "a b q q"), (7L, "c q r"), (8L, "r r r")
  ).toDF("doc_id", "text")

  private def probePair(idx: String, q: Seq[String]) = (
    Retrieval.bm25AgainstIndex(spark, idx, q, 10).collect()
      .map(_.toString).toSeq,
    Retrieval.bm25WandAgainstIndex(spark, idx, q, 10).collect()
      .map(_.toString).toSeq)

  test("torn replay on a non-atomic-rename store: committed batches never under-read; WAND exact-or-loud at every tear point; replay repairs") {
    spark.sparkContext.hadoopConfiguration.set("fs.torn.impl",
      classOf[TornRenameFileSystem].getName)
    val q = Seq("a", "b", "c", "q", "r")
    val local = tempDir("torn_idx")
    val idx = s"torn://$local/idx"

    for (order <- Seq(true, false)) {
      TornRenameFileSystem.sidecarFirst = order
      TornRenameFileSystem.movesLeft = -1
      val dir = s"$idx/${if (order) "sidecar_first" else "postings_first"}"
      Retrieval.writeTextIndex(docs.where($"doc_id" < 2), "doc_id", "text",
        dir, nBuckets = 4)
      // batch 0: COMMITTED (publishes un-torn)
      Retrieval.ingestTextBatch(docs.where($"doc_id" >= 2 && $"doc_id" < 4),
        "doc_id", "text", dir, queryTag = "qt", batchId = 0L)
      val committedIds = Retrieval.bm25AgainstIndex(spark, dir, q, 10)
        .collect().map(_.getLong(0)).toSet
      assert(committedIds === Set(0L, 1L, 2L, 3L))

      // batch 1's publish rename tears after k = 0, 1, 2, … child moves —
      // every iteration is a crash + replay of the SAME batch
      var k = 0
      var published = false
      var wandExact = 0
      var wandRefused = 0
      while (!published) {
        TornRenameFileSystem.movesLeft = k
        try {
          Retrieval.ingestTextBatch(docs.where($"doc_id" >= 6), "doc_id",
            "text", dir, queryTag = "qt", batchId = 1L)
          published = true
        } catch {
          case e: Exception =>
            assert(e.getMessage != null && e.getMessage.contains("torn"),
              s"unexpected failure at tear point $k: $e")
            val plain = Retrieval.bm25AgainstIndex(spark, dir, q, 10)
              .collect().map(_.toString).toSeq
            // (b) never silently wrong: exact when the torn subtree's
            // sidecar is visible; the loud _block_stats guard when its
            // postings landed sidecar-less
            try {
              val wand = Retrieval.bm25WandAgainstIndex(spark, dir, q, 10)
                .collect().map(_.toString).toSeq
              assert(wand === plain,
                s"WAND must equal the plain probe at tear point $k (order=$order)")
              wandExact += 1
            } catch {
              case g: IllegalArgumentException =>
                assert(g.getMessage.contains("_block_stats"),
                  s"only the loud sidecar guard may refuse (tear $k, order=$order): $g")
                wandRefused += 1
            }
            // (a) committed docs all still present — never under-read
            val ids = Retrieval.bm25AgainstIndex(spark, dir, q, 10)
              .collect().map(_.getLong(0)).toSet
            assert(committedIds.subsetOf(ids),
              s"committed docs lost at tear point $k (order=$order): $ids")
            k += 1
        }
      }
      assert(k >= 2, s"the tear must exercise >= 2 interior points, got $k")
      if (order) assert(wandExact >= 1,
        "sidecar-first tearing must exercise the exact-with-phantom-sidecar state")
      else assert(wandRefused >= 1,
        "postings-first tearing must exercise the loud sidecar-guard refusal")
      TornRenameFileSystem.movesLeft = -1

      // (c) the successful replay repaired the index bit-identically to a
      // never-torn twin of the same build + batches
      val twin = tempDir("torn_twin") + s"/idx_$order"
      Retrieval.writeTextIndex(docs.where($"doc_id" < 2), "doc_id", "text",
        twin, nBuckets = 4)
      Retrieval.ingestTextBatch(docs.where($"doc_id" >= 2 && $"doc_id" < 4),
        "doc_id", "text", twin, queryTag = "qt", batchId = 0L)
      Retrieval.ingestTextBatch(docs.where($"doc_id" >= 6), "doc_id", "text",
        twin, queryTag = "qt", batchId = 1L)
      assert(probePair(dir, q) === probePair(twin, q),
        s"replay must repair to the clean result (order=$order)")
    }
  }
}
