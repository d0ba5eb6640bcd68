package graft.queries

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Text-pipeline queries over the `documents` table — the exactly-SQL-
  * expressible subset (exact dedup, token stats, fingerprinting). The
  * non-SQL ops (MinHash/SimHash/LSH/ANN) live in graft.operators and are
  * declared without an oracle (rows-only check).
  */
object DocumentQueries {

  val queries: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(
    // Exact dedup: one representative (min doc_id) per distinct text.
    // At 100 TB, group on a fixed-width hash of the text instead of the
    // text itself to keep shuffle rows narrow — see d01b in operators.
    "d01_dedup_exact" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "documents")
        .groupBy($"text")
        .agg(min($"doc_id").as("doc_id"), count(lit(1)).as("n_copies"))
        .select($"doc_id", $"n_copies")
        .orderBy($"doc_id")
    },
    // Token statistics per language (whitespace tokenization).
    "d05_token_stats" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "documents")
        .withColumn("n_tokens", size(split($"text", " ")).cast("long"))
        .groupBy($"lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum($"n_tokens").as("total_tokens"),
          round(avg($"n_tokens"), 2).as("avg_tokens"),
          max($"n_tokens").as("max_tokens"),
          countDistinct($"source").as("n_sources"))
        .orderBy($"lang")
    },
    // Normalized-content fingerprint (md5 of whitespace-collapsed lower text).
    "d08_fingerprint" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "documents")
        .select($"doc_id", md5(regexp_replace(lower($"text"), "\\s+", " ")).as("fp"))
        .orderBy($"doc_id")
    })

  val oracleSql: ListMap[String, String] = ListMap(
    "d01_dedup_exact" ->
      """SELECT min(doc_id) AS doc_id, count(*) AS n_copies
         FROM documents GROUP BY text ORDER BY doc_id""",
    "d05_token_stats" ->
      """SELECT lang, count(*) AS n_docs,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
         round(avg(len(string_split(text, ' '))), 2) AS avg_tokens,
         CAST(max(len(string_split(text, ' '))) AS BIGINT) AS max_tokens,
         count(DISTINCT source) AS n_sources
         FROM documents GROUP BY lang ORDER BY lang""",
    "d08_fingerprint" ->
      """SELECT doc_id, md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp
         FROM documents ORDER BY doc_id""")
}
