package graft

import graft.operators.{Multimodal, TextHash}
import graft.queries.{DedupQueries, EmbeddingQueries}

/** Semantics checks for the training-data operators beyond the oracle
  * gate: LSH recall vs the exact baseline, MinHash candidate coverage of
  * true near-dups, multimodal decode plumbing.
  */
class OperatorsSpec extends SparkSpec {

  test("LSH ANN recalls a usable fraction of the exact top-k (s02 vs s01)") {
    val exact = EmbeddingQueries.queries("s01_knn_bruteforce")(spark, sfSmoke)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val ann = EmbeddingQueries.queries("s02_ann_lsh")(spark, sfSmoke)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(ann.nonEmpty, "LSH returned no candidates")
    assert(ann.length <= 20 * 3)
    val hits = ann.count(exact.contains)
    val recall = hits.toDouble / ann.length
    // multi-probe over 64 buckets on random 64-dim data: precision vs the
    // exact top-5 won't be high, but it must beat random chance (~5/500)
    assert(recall > 0.05, s"LSH precision vs exact top-5 too low: $recall")
  }

  test("MinHash LSH candidates cover all strong true near-dups (d03 ⊇ d06@0.95)") {
    val strong = DedupQueries.queries("d06_ngram_jaccard_dups")(spark, sfSmoke)
      .collect().filter(_.getDouble(2) >= 0.95)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(strong.nonEmpty, "fixture data lost its near-dup pairs?")
    val candidates = DedupQueries.queries("d03_minhash_dedup_pairs")(spark, sfSmoke)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val missed = strong -- candidates
    // P(miss | jaccard≥0.95) = (1-s^4)^4 < 0.002 per pair
    assert(missed.isEmpty, s"LSH missed strong pairs: $missed")
  }

  test("simhash of near-identical docs differs in few bits") {
    val sims = DedupQueries.queries("d04_simhash")(spark, sfSmoke)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val strong = DedupQueries.queries("d06_ngram_jaccard_dups")(spark, sfSmoke)
      .collect().filter(_.getDouble(2) >= 0.95)
    assert(strong.nonEmpty)
    strong.foreach { r =>
      val d = java.lang.Long.bitCount(sims(r.getLong(0)) ^ sims(r.getLong(1)))
      assert(d <= TextHash.SimBits / 4, s"hamming $d too large for near-dup pair")
    }
  }

  test("multimodal decode stub is deterministic and batch extraction conserves rows") {
    val media = Multimodal.mediaFromDocuments(spark, Tables(spark, sfSmoke, "documents"))
    val feats = Multimodal.extractFeatures(media)
    assert(feats.count() == media.count())
    val f = feats.filter(_.doc_id == 0).head()
    val (w, h, ph) = Multimodal.decodeStub(
      media.filter(_.doc_id == 0).head().media)
    assert(f.width == w && f.height == h && f.phash == ph)
    assert(f.width >= 16 && f.width < 32 && ph.length == 8)
  }
}
