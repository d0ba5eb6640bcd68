package graft.queries

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.TextHash._

/** Near-duplicate detection over `documents` (the LLM-training-data
  * pipeline surface): MinHash signatures, MinHash+LSH candidate pairs,
  * SimHash fingerprints, and exact n-gram Jaccard verification. All four
  * are oracle-checked — signatures are exact modular integers generated
  * from graft.operators.TextHash on both engines.
  *
  * Scale design (100 TB): signatures are computed in ONE codegen pass per
  * document (higher-order functions on the token array — no explode), so
  * the only thing that ever shuffles is (doc_id, 16 longs) or a band key,
  * never the text. Candidate generation is the band-bucket self-join
  * (d03); exact Jaccard (d06) is the verify stage — at scale you run it
  * on d03's candidates, not on the full inverted index.
  */
object DedupQueries {

  /** documents + th/sh/mh/bands signature columns (shared pipeline). */
  private def signatures(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .withColumn("th", expr(sparkTokenHashes("text")))
      .withColumn("sh", expr(sparkShingles("th")))
      .withColumn("mh", expr(sparkMinhash("sh")))
      .withColumn("bands", expr(sparkBands("mh")))

  /** DuckDB CTE computing the same signature table. */
  private val duckSigs =
    s"""sigs AS (
          SELECT doc_id, mh, ${duckBands("mh")} AS bands
          FROM (SELECT doc_id, ${duckMinhash("sh")} AS mh
                FROM (SELECT doc_id, ${duckShingles("th")} AS sh
                      FROM (SELECT doc_id, ${duckTokenHashes("text")} AS th
                            FROM documents))))"""

  val queries: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(
    // ---- d02: MinHash signatures + LSH band keys -------------------------
    "d02_minhash_sigs" -> { (s, dir) =>
      import s.implicits._
      signatures(s, dir)
        .select(
          $"doc_id",
          expr("array_join(transform(mh, x -> CAST(x AS STRING)), '-')").as("sig"),
          element_at($"bands", 1).as("band0"),
          element_at($"bands", 2).as("band1"),
          element_at($"bands", 3).as("band2"),
          element_at($"bands", 4).as("band3"))
        .orderBy($"doc_id")
    },

    // ---- d03: LSH candidate pairs + signature-estimated similarity -------
    "d03_minhash_dedup_pairs" -> { (s, dir) =>
      import s.implicits._
      val sigs = signatures(s, dir).select($"doc_id", $"mh", $"bands")
      val exploded = sigs
        // posexplode_outer, NOT posexplode: the non-outer Generate makes
        // InferFiltersFromGenerate push a `size(bands)>0` filter to the
        // scan with the WHOLE signature expression inlined — a ~600 KB
        // interpreted tree re-evaluating the minhashes ~256× per row
        // (200s at sf0.01). bands is always length-4, so outer is
        // semantically identical and keeps the plan linear.
        .select($"doc_id", $"mh", posexplode_outer($"bands").as(Seq("band_id", "band_key")))
      val a = exploded.select($"doc_id".as("doc_a"), $"mh".as("mh_a"),
        $"band_id", $"band_key")
      val b = exploded.select($"doc_id".as("doc_b"), $"mh".as("mh_b"),
        $"band_id".as("band_id_b"), $"band_key".as("band_key_b"))
      a.join(b,
          $"band_id" === $"band_id_b" && $"band_key" === $"band_key_b" &&
            $"doc_a" < $"doc_b")
        .select($"doc_a", $"doc_b",
          round(size(filter(zip_with($"mh_a", $"mh_b", (x, y) => x === y),
            (m: org.apache.spark.sql.Column) => m)) / lit(K.toDouble), 4).as("sim_est"))
        .distinct()
        .filter($"sim_est" >= 0.5)
        .orderBy($"doc_a", $"doc_b")
    },

    // ---- d04: SimHash fingerprints ---------------------------------------
    "d04_simhash" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "documents")
        .withColumn("th", expr(sparkTokenHashes("text")))
        .select($"doc_id", expr(sparkSimhash("th")).as("simhash"))
        .orderBy($"doc_id")
    },

    // ---- d06: exact n-gram Jaccard over LSH candidates (verify stage) ----
    // Candidates come from the d03 band join, NEVER from a full inverted-
    // index self-join: with a small hot vocabulary (exactly this corpus)
    // every shingle is shared by ~1% of all docs and the index join is
    // quadratic (~80M pairs at sf0.1). Verifying only band-collision pairs
    // keeps the exact-Jaccard stage linear in true near-dups — the shape
    // that survives 100 TB.
    "d06_ngram_jaccard_dups" -> { (s, dir) =>
      import s.implicits._
      val sigs = signatures(s, dir)
        .withColumn("shset", array_distinct($"sh"))
        .select($"doc_id", $"shset", $"bands")
      val exploded = sigs
        // posexplode_outer for the same InferFiltersFromGenerate reason as d03
        .select($"doc_id", posexplode_outer($"bands").as(Seq("band_id", "band_key")))
      val cand = exploded.as("x")
        .join(exploded.as("y"),
          $"x.band_id" === $"y.band_id" && $"x.band_key" === $"y.band_key" &&
            $"x.doc_id" < $"y.doc_id")
        .select($"x.doc_id".as("doc_a"), $"y.doc_id".as("doc_b"))
        .distinct()
      cand
        .join(sigs.select($"doc_id".as("doc_a"), $"shset".as("sh_a")), "doc_a")
        .join(sigs.select($"doc_id".as("doc_b"), $"shset".as("sh_b")), "doc_b")
        .withColumn("n_common", size(array_intersect($"sh_a", $"sh_b")))
        .withColumn("jaccard", round($"n_common" /
          (size($"sh_a") + size($"sh_b") - $"n_common"), 4))
        .filter($"jaccard" >= 0.5)
        .select($"doc_a", $"doc_b", $"jaccard")
        .orderBy($"doc_a", $"doc_b")
    })

  val oracleSql: ListMap[String, String] = ListMap(
    "d02_minhash_sigs" ->
      s"""WITH $duckSigs
          SELECT doc_id, concat_ws('-', mh[1], mh[2], mh[3], mh[4], mh[5], mh[6],
            mh[7], mh[8], mh[9], mh[10], mh[11], mh[12], mh[13], mh[14], mh[15],
            mh[16]) AS sig,
            bands[1] AS band0, bands[2] AS band1, bands[3] AS band2,
            bands[4] AS band3
          FROM sigs ORDER BY doc_id""",
    "d03_minhash_dedup_pairs" ->
      s"""WITH $duckSigs,
          expl AS (
            SELECT doc_id, mh, b.band_id, bands[b.band_id + 1] AS band_key
            FROM sigs, (SELECT unnest(range(${Bands})) AS band_id) b)
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
            round(len(list_filter(range(1, ${K + 1}), i -> a.mh[i] = b.mh[i]))
                  / ${K}.0, 4) AS sim_est
          FROM expl a JOIN expl b
            ON a.band_id = b.band_id AND a.band_key = b.band_key
              AND a.doc_id < b.doc_id
          WHERE round(len(list_filter(range(1, ${K + 1}), i -> a.mh[i] = b.mh[i]))
                  / ${K}.0, 4) >= 0.5
          ORDER BY doc_a, doc_b""",
    "d04_simhash" ->
      s"""WITH th AS (SELECT doc_id, unnest(${duckTokenHashes("text")}) AS t
                      FROM documents),
          b AS (SELECT doc_id, j, sum(CASE WHEN (t >> j) & 1 = 1 THEN 1 ELSE -1 END) AS s
                FROM th, (SELECT unnest(range(${SimBits})) AS j) js
                GROUP BY doc_id, j)
          SELECT doc_id,
            CAST(sum(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << j ELSE 0 END) AS BIGINT) AS simhash
          FROM b GROUP BY doc_id ORDER BY doc_id""",
    "d06_ngram_jaccard_dups" ->
      s"""WITH sets AS (
            SELECT doc_id, list_distinct(sh) AS shset, ${duckBands("mh")} AS bands
            FROM (SELECT doc_id, sh, ${duckMinhash("sh")} AS mh
                  FROM (SELECT doc_id, ${duckShingles("th")} AS sh
                        FROM (SELECT doc_id, ${duckTokenHashes("text")} AS th
                              FROM documents)))),
          expl AS (
            SELECT doc_id, b.band_id, bands[b.band_id + 1] AS band_key
            FROM sets, (SELECT unnest(range(${Bands})) AS band_id) b),
          cand AS (
            SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
            FROM expl x JOIN expl y
              ON x.band_id = y.band_id AND x.band_key = y.band_key
                AND x.doc_id < y.doc_id),
          scored AS (
            SELECT doc_a, doc_b,
              len(list_intersect(sa.shset, sb.shset)) AS n_common,
              len(sa.shset) AS n_a, len(sb.shset) AS n_b
            FROM cand
            JOIN sets sa ON sa.doc_id = doc_a
            JOIN sets sb ON sb.doc_id = doc_b)
          SELECT doc_a, doc_b,
            round(n_common / (n_a + n_b - n_common), 4) AS jaccard
          FROM scored
          WHERE round(n_common / (n_a + n_b - n_common), 4) >= 0.5
          ORDER BY doc_a, doc_b""")
}
