package graft.operators

/** Shared deterministic text-hashing formulas for the dedup/similarity
  * operators (MinHash, SimHash, n-gram Jaccard). Both the Spark plans and
  * the DuckDB oracle SQL are GENERATED from the constants here, so the two
  * engines compute bit-identical integers — the property the correctness
  * gate hashes.
  *
  * All hashes are polynomial rolling hashes mod a 30-bit prime: products
  * stay under 2^63, so BIGINT arithmetic is exact in any engine (no
  * engine-specific murmur/xxhash, which would never cross-match).
  *
  * Scale note: these run as whole-stage-codegen higher-order functions on
  * array columns — one narrow pass per document, no explode/shuffle until
  * the (tiny) signature columns exist. At 100 TB the per-doc signature is
  * what shuffles, never the text.
  */
object TextHash {
  val P = 1000000007L // prime modulus
  val K = 16          // minhash signature length
  val Bands = 4       // LSH bands (rows per band = K / Bands = 4)
  val SimBits = 32    // simhash width

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Minhash coefficients from a splitmix64 finalizer, NOT small affine
    * constants: with a ≤ 33 the 16 component hashes were strongly
    * correlated (one small shingle value lands below every component's
    * min simultaneously), so misses on true near-dup pairs clustered —
    * observed 3/20 banding misses at jaccard 0.966 vs ~0.006 expected.
    * Large pseudo-independent a ∈ [1, P-1], b ∈ [0, P-1] restore the
    * theoretical rate; a·x < P² < 2^63 keeps BIGINT arithmetic exact. */
  def aCoef(j: Int): Long = Math.floorMod(mix(2L * j), P - 1) + 1
  def bCoef(j: Int): Long = Math.floorMod(mix(2L * j + 1), P)

  // ---- Spark SQL expression strings (for functions.expr) ---------------

  /** array<bigint> of per-token rolling hashes of a text column.
    * Empty-token guard: Spark's sequence(1, 0) yields [1, 0] (descending
    * sequences!), which would fold ascii('')=0 twice and hash '' to 6727
    * while DuckDB's range(1, 1) is empty and yields the seed 7 — so ''
    * is pinned to the seed explicitly on both engines. */
  def sparkTokenHashes(text: String): String =
    s"""transform(split($text, ' '),
        t -> CASE WHEN length(t) = 0 THEN CAST(7 AS BIGINT)
             ELSE aggregate(transform(sequence(1, length(t)), i -> ascii(substring(t, i, 1))),
                            CAST(7 AS BIGINT), (acc, c) -> (acc * 31 + c) % $P) END)"""

  /** word-3-gram shingle hashes from a token-hash array column `th`. */
  def sparkShingles(th: String): String =
    s"""CASE WHEN size($th) >= 3
        THEN transform(sequence(1, size($th) - 2),
             i -> ((element_at($th, i) * 37 + element_at($th, i + 1)) % $P * 37
                   + element_at($th, i + 2)) % $P)
        ELSE CAST(array() AS array<bigint>) END"""

  /** K-component minhash signature from a shingle array column `sh`
    * (empty doc → sentinel P per component). */
  def sparkMinhash(sh: String): String = {
    val comps = (0 until K).map { j =>
      s"coalesce(array_min(transform($sh, x -> (${aCoef(j)} * x + ${bCoef(j)}) % $P)), CAST($P AS BIGINT))"
    }
    s"array(${comps.mkString(", ")})"
  }

  /** LSH band keys (Bands strings) from a minhash array column `mh`. */
  def sparkBands(mh: String): String = {
    val r = K / Bands
    val keys = (0 until Bands).map { b =>
      val parts = (0 until r).map(i => s"element_at($mh, ${b * r + i + 1})")
      s"concat_ws('-', ${parts.mkString(", ")})"
    }
    s"array(${keys.mkString(", ")})"
  }

  /** SimBits-bit simhash from a token-hash array column `th`. */
  def sparkSimhash(th: String): String =
    s"""aggregate(
          zip_with(
            aggregate($th,
              transform(sequence(0, ${SimBits - 1}), j -> CAST(0 AS BIGINT)),
              (acc, t) -> zip_with(acc,
                transform(sequence(0, ${SimBits - 1}),
                  j -> CASE WHEN shiftright(t, j) % 2 = 1
                       THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END),
                (x, y) -> x + y)),
            sequence(0, ${SimBits - 1}),
            (s, j) -> CASE WHEN s > 0 THEN shiftleft(CAST(1 AS BIGINT), j)
                      ELSE CAST(0 AS BIGINT) END),
          CAST(0 AS BIGINT), (a, x) -> a + x)"""

  // ---- DuckDB oracle SQL fragments --------------------------------------

  /** DuckDB: per-token rolling hashes of a text expression (empty token →
    * seed 7, naturally: range(1,1) is empty, reduce returns the prepended
    * seed — matches the Spark-side CASE guard). */
  def duckTokenHashes(text: String): String =
    s"""list_transform(string_split($text, ' '),
        t -> list_reduce(
               list_prepend(CAST(7 AS BIGINT),
                 list_transform(range(1, len(t) + 1),
                   i -> CAST(ascii(substr(t, i, 1)) AS BIGINT))),
               (a, b) -> (a * 31 + b) % $P))"""

  /** DuckDB: shingle hashes from a token-hash list expression `th`. */
  def duckShingles(th: String): String =
    s"""CASE WHEN len($th) >= 3
        THEN list_transform(range(1, len($th) - 1),
             i -> (($th[i] * 37 + $th[i + 1]) % $P * 37 + $th[i + 2]) % $P)
        ELSE CAST([] AS BIGINT[]) END"""

  /** DuckDB: minhash signature list from a shingle list expression. */
  def duckMinhash(sh: String): String = {
    val comps = (0 until K).map { j =>
      s"coalesce(list_min(list_transform($sh, x -> (${aCoef(j)} * x + ${bCoef(j)}) % $P)), CAST($P AS BIGINT))"
    }
    s"[${comps.mkString(", ")}]"
  }

  /** DuckDB: band keys list from a minhash list expression `mh`. */
  def duckBands(mh: String): String = {
    val r = K / Bands
    val keys = (0 until Bands).map { b =>
      val parts = (0 until r).map(i => s"$mh[${b * r + i + 1}]")
      s"concat_ws('-', ${parts.mkString(", ")})"
    }
    s"[${keys.mkString(", ")}]"
  }
}
