package graft.queries

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.Materialize.Ops
import graft.operators.Multimodal

/** Driver-gate coverage for the multimodal plumbing: binary payload →
  * batched (stub) decode → typed features, verified against an oracle
  * that recomputes the deterministic feature contract in SQL.
  */
object MultimodalQueries {

  val queries: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(
    // ---- m01: REAL media decode — every doc wrapped as a valid binary
    // PPM; extractFeatures must recover width/height from the P6 header
    // it parses and hash every raster byte. The oracle recomputes the
    // payload-generation contract (not the parse) in SQL.
    "m01_media_features" -> { (s, dir) =>
      import s.implicits._
      val media = Multimodal.ppmFromDocuments(s, Tables(s, dir, "documents"))
      Multimodal.extractFeatures(media)
        .toDF()
        // floor-scale, not round: w/h can land exactly on a .xxxx5
        // boundary (e.g. 9/160) where engine round modes diverge
        .withColumn("aspect",
          floor($"width" / $"height".cast("double") * 10000) / 10000)
        // sortedOnce (r19): the sort sampler would re-decode every object
        .sortedOnce($"doc_id")
    },

    // ---- m02: video-style frame sampling (every other 64B frame) ---------
    "m02_frame_sample" -> { (s, dir) =>
      import s.implicits._
      val media = Multimodal.mediaFromDocuments(s, Tables(s, dir, "documents"))
      Multimodal.sampleFrames(media).toDF().sortedOnce($"doc_id", $"frame_idx")
    },

    // ---- m03: resize/downsample plumbing ---------------------------------
    "m03_media_resize" -> { (s, dir) =>
      import s.implicits._
      val media = Multimodal.mediaFromDocuments(s, Tables(s, dir, "documents"))
      Multimodal.resize(media).toDF().sortedOnce($"doc_id")
    },

    // ---- m04: media dedup — exact at content grain, near at perceptual
    // grain. The d03 LSH discipline transposed to images: exact-dup
    // collapse first (byte-identical payloads ride their min-doc rep),
    // then candidate pairs ONLY where two reps share one of the four
    // 16-bit bands of the m01 average-hash, degenerate band buckets
    // (> MaxAhashBucket reps — no selectivity) dropped, then the exact
    // hamming verify over the full 64-bit hashes. Text/payload never
    // joins — everything that shuffles is md5 fps, band keys, and
    // 64-bit hashes. The deterministic integer ahash (m01's contract)
    // makes the whole disposition SQL-replayable.
    "m04_media_neardup" -> { (s, dir) =>
      mediaNearDup(s, Tables(s, dir, "documents"))
    },

    // ---- m05: shared-frame census — d47's duplicated-n-gram shape
    // transposed to the frame axis: per video, what fraction of its
    // DISTINCT sampled frames also appears in at least one other
    // video (the repeated-intro/outro/logo-reel signal a video-corpus
    // curation run thresholds), plus the hottest frame's document
    // frequency. Everything that shuffles is (doc_id, md5 frame hash)
    // pairs off m02's deterministic frame sampling — frame BYTES never
    // shuffle, and df is one map-side-combinable fp aggregate.
    "m05_shared_frames" -> { (s, dir) =>
      import s.implicits._
      val frames = Multimodal
        .sampleFrames(Multimodal.mediaFromDocuments(s, Tables(s, dir, "documents")))
        .toDF()
        .select($"doc_id", $"fhash").distinct()
      val dfreq = frames.groupBy($"fhash").agg(count(lit(1)).as("df"))
      frames.join(dfreq, Seq("fhash"))
        .groupBy($"doc_id")
        .agg(
          count(lit(1)).as("n_frames"),
          sum(when($"df" >= 2, lit(1L)).otherwise(lit(0L))).as("n_shared"),
          max($"df").as("max_df"))
        .withColumn("shared_frac",
          floor($"n_shared".cast("double") / $"n_frames" * 10000) / 10000.0)
        .select($"doc_id", $"n_frames", $"n_shared", $"shared_frac",
          $"max_df")
        .orderBy($"doc_id")
    },

    // ---- m06: audio census — REAL RIFF/WAVE decode (chunk walk, fmt
    // validation, odd-size pad bytes) over generated MIXED-FORMAT PCM
    // payloads (doc_id%3: u8 mono / s16le mono / s16le stereo — real
    // crawl audio is dominantly s16le); the engine must parse the
    // binary headers and frames it wrote, the oracle recomputes the
    // generation contract (u8-grain samples = code points mod 256;
    // stereo = the exact (l + (l+2)%256)/2 downmix) in SQL — the m01
    // convention on the audio axis ------------------------------------
    "m06_audio_census" -> { (s, dir) =>
      import s.implicits._
      Multimodal.audioFeatures(
        Multimodal.wavFromDocuments(s, Tables(s, dir, "documents")))
        .toDF().sortedOnce($"doc_id")
    },

    // ---- m07: windowed frame-energy census — the VAD/silence-trim
    // primitive over the SAME mixed-format WAV fixture as m06: the
    // engine parses the binary frames it wrote and censuses 64-frame
    // windows (active count, first-active trim point, loudest window);
    // the oracle replays the generation contract + windowing in SQL --
    "m07_frame_energy" -> { (s, dir) =>
      import s.implicits._
      Multimodal.audioFrameEnergy(
        Multimodal.wavFromDocuments(s, Tables(s, dir, "documents")))
        .toDF().sortedOnce($"doc_id")
    })

  /** m04 as a reusable operator over a (doc_id, text) frame — the
    * payload-generation contract (ppm wrapping) is part of the operator
    * so the gate and the planted specs disposition identical bytes. */
  def mediaNearDup(s: SparkSession, docs: DataFrame): DataFrame = {
    import s.implicits._
    val media = Multimodal.ppmFromDocuments(s, docs)
    val fps = media.toDF().select($"doc_id", md5($"media").as("cfp"))
    val ah = Multimodal.extractFeatures(media).toDF()
      .select($"doc_id", $"ahash")
    // (doc_id, cfp, ahash) feeds TWO consumers (the rep collapse and
    // the exact-pair join) and everything downstream chains off it —
    // materialize so the payload generation + raster hash run ONCE
    // (the d41/d47 barrier discipline); payload bytes never cached,
    // only the 3 narrow columns
    val feats = graft.Materialize(fps.join(ah, "doc_id"))
    val maxBucket = QueryConf.mediaMaxBucket(s)
    // identical content ⇒ identical ahash, so min() carries the rep's
    // hash through the same aggregate
    val reps = feats.groupBy($"cfp")
      .agg(min($"doc_id").as("rep"), min($"ahash").as("ahash"))
    val exact = feats.join(reps, "cfp").filter($"doc_id" =!= $"rep")
      .select($"rep".as("doc_a"), $"doc_id".as("doc_b"),
        lit(0L).as("hamming"), lit("exact").as("kind"))
    // banded candidates via ONE bounded bucket aggregate (r20 — the
    // dedup cappedBuckets/bucketPairs shape at the ahash-band grain):
    // the old [occupancy groupBy → join-back → band self-join] chain
    // paid three more shuffle boundaries for pairs whose bucket the
    // cap bounds anyway; graft_bucket keeps the exact count plus the
    // cap smallest reps ascending (ahash riding as a 1-element array —
    // identical content ⇒ one hash per rep), and the ra < rb pairs
    // fall out of the sorted member arrays in-row. A viral band key
    // ships ≤ cap members per map task instead of its whole bucket
    // through the join-back.
    val buckets = reps.select($"rep", $"ahash", explode(expr(
      """transform(sequence(0, 3), b -> named_struct(
           'band', CAST(b AS BIGINT),
           'key', shiftright(ahash, 16 * b) & 65535))""")).as("bk"))
      .select($"rep", array($"ahash").as("ah"),
        $"bk.band".as("band"), $"bk.key".as("key"))
      .groupBy($"band", $"key")
      .agg(expr(
        s"${graft.functions.BucketAgg.functionName}(rep, ah, $maxBucket)")
        .as("b"))
      .filter($"b.bucket_n" <= maxBucket)
    val near = buckets
      .select($"b.members".as("ms"),
        posexplode($"b.members").as(Seq("i", "a")))
      .select($"a",
        explode(expr("slice(ms, i + 2, size(ms) - i - 1)")).as("bb"))
      .select($"a.doc_id".as("ra"), element_at($"a.mh", 1).as("aa"),
        $"bb.doc_id".as("rb"), element_at($"bb.mh", 1).as("ab"))
      .distinct()
      .withColumn("hamming", expr("CAST(bit_count(aa ^ ab) AS BIGINT)"))
      .filter($"hamming" <= HammingBar)
      .select($"ra".as("doc_a"), $"rb".as("doc_b"), $"hamming",
        lit("near").as("kind"))
    exact.unionByName(near).orderBy($"doc_a", $"doc_b")
  }

  /** m04 near-dup bar: ≤ HammingBar differing bits of the 64-bit
    * average-hash counts as perceptually near; band buckets shared by
    * more than MaxAhashBucket distinct rasters carry no selectivity
    * and are dropped (the d16 MaxBandBucket discipline). */
  val HammingBar = 6
  // gate default; the live cap comes from [[QueryConf.mediaMaxBucket]]
  private[queries] val MaxAhashBucket = QueryConf.DefaultMediaMaxBucket

  /** The shared m01/m04 oracle prelude — mirrors ppmFromDocuments'
    * generation contract: w = 8 + doc_id%9, h = ceil(len/3w) (>=1),
    * raster = text '.'-padded to w*h*3; the ENGINE's numbers come from
    * parsing the P6 header it wrote. ahash is the integer-exact
    * perceptual average-hash: per-pixel ITU-601 luma (×1000), 8×8 grid
    * cells, bit set iff S_cell*N > T*n_cell (cross-multiplied integers
    * — DuckDB's sum() is HUGEINT, so the products are exact like the
    * engine's BigInt compare), assembled as an unsigned HUGEINT. */
  private val duckMediaPrelude: String =
    """g AS (
           SELECT doc_id, text, CAST(8 + doc_id % 9 AS INTEGER) AS w,
             CAST(greatest(1, (length(text) + 3 * (8 + doc_id % 9) - 1)
                  // (3 * (8 + doc_id % 9))) AS INTEGER) AS h
           FROM documents),
         p AS (
           SELECT doc_id, w, h,
             'P6' || chr(10) || w || ' ' || h || chr(10) || '255' || chr(10) AS header,
             rpad(text, w * h * 3, '.') AS raster
           FROM g),
         px AS (
           SELECT doc_id, w, h, unnest(range(w * h)) AS i FROM p),
         lum AS (
           SELECT px.doc_id, (i % px.w) AS x, (i // px.w) AS y, px.w, px.h,
             299 * ascii(substr(p.raster, 3*i + 1, 1))
             + 587 * ascii(substr(p.raster, 3*i + 2, 1))
             + 114 * ascii(substr(p.raster, 3*i + 3, 1)) AS luma
           FROM px JOIN p ON p.doc_id = px.doc_id),
         cells AS (
           SELECT doc_id, ((y*8) // h)*8 + ((x*8) // w) AS cell,
             sum(luma) AS s, count(*) AS n,
             sum(sum(luma)) OVER (PARTITION BY doc_id) AS t,
             sum(count(*)) OVER (PARTITION BY doc_id) AS nn
           FROM lum GROUP BY doc_id, ((y*8) // h)*8 + ((x*8) // w)),
         bits AS (
           SELECT doc_id,
             sum(CASE WHEN s * nn > t * n
                 THEN CAST(1 AS HUGEINT) << cell
                 ELSE CAST(0 AS HUGEINT) END) AS ub
           FROM cells GROUP BY doc_id)"""

  /** unsigned-HUGEINT → signed 64-bit ahash (both consumers share the
    * exact two's-complement mapping). */
  private val duckSignedAhash: String =
    """CAST(CASE WHEN ub >= CAST(9223372036854775808 AS HUGEINT)
                THEN ub - CAST(18446744073709551616 AS HUGEINT)
                ELSE ub END AS BIGINT)"""

  val oracleSql: ListMap[String, String] = ListMap(
    "m01_media_features" ->
      s"""WITH $duckMediaPrelude
         SELECT p.doc_id,
           CAST(length(header) + length(raster) AS BIGINT) AS n_bytes,
           w AS width, h AS height,
           substr(md5(raster), 1, 8) AS phash,
           $duckSignedAhash AS ahash,
           floor(w / CAST(h AS DOUBLE) * 10000) / 10000 AS aspect
         FROM p JOIN bits ON bits.doc_id = p.doc_id ORDER BY p.doc_id""",
    // m04: content fingerprints over the SAME generated payload
    // (header || raster — ASCII, so string md5 == the engine's binary
    // md5), the signed ahash banded into four 16-bit keys, the bucket
    // cap, and the hamming verify via xor + bit_count
    "m04_media_neardup" ->
      s"""WITH $duckMediaPrelude,
         feats AS (
           SELECT p.doc_id, md5(header || raster) AS cfp,
             $duckSignedAhash AS ahash
           FROM p JOIN bits ON bits.doc_id = p.doc_id),
         reps AS (
           SELECT cfp, min(doc_id) AS rep, min(ahash) AS ahash
           FROM feats GROUP BY cfp),
         exact AS (
           SELECT r.rep AS doc_a, f.doc_id AS doc_b,
             CAST(0 AS BIGINT) AS hamming, 'exact' AS kind
           FROM feats f JOIN reps r USING (cfp) WHERE f.doc_id <> r.rep),
         bands AS (
           SELECT rep, ahash, CAST(b.b AS BIGINT) AS band,
             (ahash >> (16 * b.b)) & 65535 AS key
           FROM reps, (SELECT unnest(range(4)) AS b) b),
         ok AS (
           SELECT band, key FROM bands GROUP BY band, key
           HAVING count(*) <= $MaxAhashBucket),
         cand AS (
           SELECT DISTINCT a.rep AS ra, a.ahash AS aa,
             c.rep AS rb, c.ahash AS ab
           FROM bands a
           JOIN ok USING (band, key)
           JOIN bands c ON a.band = c.band AND a.key = c.key
             AND a.rep < c.rep),
         near AS (
           SELECT ra AS doc_a, rb AS doc_b,
             CAST(bit_count(xor(aa, ab)) AS BIGINT) AS hamming,
             'near' AS kind
           FROM cand WHERE bit_count(xor(aa, ab)) <= $HammingBar)
         SELECT * FROM (
           SELECT * FROM exact UNION ALL SELECT * FROM near)
         ORDER BY doc_a, doc_b""",
    // the corpus is pure ASCII (verified), so character slices in SQL are
    // byte slices of the UTF-8 payload the engine frames/downsamples;
    // the range bounds ARE the operator's MaxFrames/MaxSamples caps
    "m02_frame_sample" ->
      s"""WITH f AS (
            SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
              substr(text, 1 + i * ${Multimodal.FrameStride},
                ${Multimodal.FrameSize}) AS frame
            FROM documents,
              (SELECT unnest(range(0, ${Multimodal.MaxFrames})) AS i) idx
            WHERE 1 + i * ${Multimodal.FrameStride} <= length(text))
          SELECT doc_id, frame_idx,
            CAST(length(frame) AS BIGINT) AS frame_bytes, md5(frame) AS fhash
          FROM f ORDER BY doc_id, frame_idx""",
    // m05: m02's frame CTE (character slices of the ASCII payload) at
    // distinct (doc, fhash) grain, df at hash grain — the d47 replay
    // on the frame axis
    "m05_shared_frames" ->
      s"""WITH f AS (
            SELECT DISTINCT doc_id,
              md5(substr(text, 1 + i * ${Multimodal.FrameStride},
                ${Multimodal.FrameSize})) AS fhash
            FROM documents,
              (SELECT unnest(range(0, ${Multimodal.MaxFrames})) AS i) idx
            WHERE 1 + i * ${Multimodal.FrameStride} <= length(text)),
          dfreq AS (SELECT fhash, count(*) AS df FROM f GROUP BY fhash)
          SELECT doc_id,
            CAST(count(*) AS BIGINT) AS n_frames,
            CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_shared,
            floor(CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
              / count(*) * 10000) / 10000 AS shared_frac,
            CAST(max(df) AS BIGINT) AS max_df
          FROM f JOIN dfreq USING (fhash)
          GROUP BY doc_id ORDER BY doc_id""",
    // m06: the generation contract replayed — u8-grain samples are the
    // text's code points mod 256 ('.' = 46 for empty docs); stereo docs
    // (doc_id%3=2) downmix to the exact integer (l + (l+2)%256)/2 (the
    // parities match, so the engine's floor average is this // 2); s16
    // carries (v-128)*256 which the decoder's (v+32768)>>8 inverts, so
    // mono censuses are format-invariant. rate = 8000 + (doc_id % 9)
    // kHz steps; duration/mean use // (positive-operand integer
    // division, identical to the engine's Long division)
    "m06_audio_census" ->
      """WITH s AS (
           SELECT doc_id,
             CASE WHEN len(text) = 0 THEN [46]
                  ELSE list_transform(range(1, len(text) + 1),
                         i -> ascii(substr(text, i, 1)) % 256) END AS vs
           FROM documents),
         u AS (
           SELECT doc_id,
             CASE WHEN doc_id % 3 = 2 THEN (v0 + (v0 + 2) % 256) // 2
                  ELSE v0 END AS v
           FROM (SELECT doc_id, unnest(vs) AS v0 FROM s)),
         agg AS (
           SELECT doc_id, count(*) AS n_samples,
             sum(abs(v - 128)) AS sum_abs,
             sum(CASE WHEN abs(v - 128) <= 2 THEN 1 ELSE 0 END) AS silence_n,
             sum(CASE WHEN v = 0 OR v = 255 THEN 1 ELSE 0 END) AS clip_n
           FROM u GROUP BY doc_id)
         SELECT doc_id,
           CAST(8000 + (doc_id % 9) * 1000 AS INTEGER) AS sample_rate,
           CAST(CASE WHEN doc_id % 3 = 0 THEN 8 ELSE 16 END AS INTEGER)
             AS bits,
           CAST(CASE WHEN doc_id % 3 = 2 THEN 2 ELSE 1 END AS INTEGER)
             AS channels,
           CAST(n_samples AS BIGINT) AS n_samples,
           CAST(n_samples * 1000 // (8000 + (doc_id % 9) * 1000)
             AS BIGINT) AS duration_ms,
           CAST(sum_abs AS BIGINT) AS sum_abs_dev,
           CAST(sum_abs * 10000 // n_samples AS BIGINT) AS mean_abs_dev_bp,
           CAST(silence_n AS BIGINT) AS silence_n,
           CAST(clip_n AS BIGINT) AS clip_n
         FROM agg ORDER BY doc_id""",
    // m07: the m06 generation replay + positional windowing — window
    // id = (i-1) // 64 over the 1-based sample index (the d51 toks[i]
    // pattern), per-window integer deviation sums, the active test in
    // exact-integer form (s > 2·len), first-index-on-ties peak via a
    // min() over the rows attaining the per-doc max
    "m07_frame_energy" ->
      s"""WITH s AS (
           SELECT doc_id,
             CASE WHEN len(text) = 0 THEN [46]
                  ELSE list_transform(range(1, len(text) + 1),
                         i -> ascii(substr(text, i, 1)) % 256) END AS vs
           FROM documents),
         u AS (
           SELECT doc_id, (i - 1) // ${Multimodal.EnergyWin} AS wi,
             CASE WHEN doc_id % 3 = 2 THEN (v0 + (v0 + 2) % 256) // 2
                  ELSE v0 END AS v
           FROM (SELECT doc_id, i, vs[i] AS v0
                 FROM (SELECT doc_id, vs,
                         unnest(range(1, len(vs) + 1)) AS i FROM s))),
         w AS (
           SELECT doc_id, wi, sum(abs(v - 128)) AS dev,
             count(*) AS wlen
           FROM u GROUP BY 1, 2),
         agg AS (
           SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_windows,
             CAST(sum(CASE WHEN dev > 2 * wlen THEN 1 ELSE 0 END)
               AS BIGINT) AS active_n,
             CAST(coalesce(min(CASE WHEN dev > 2 * wlen THEN wi END), -1)
               AS BIGINT) AS first_active,
             max(dev) AS peak
           FROM w GROUP BY 1),
         pk AS (
           SELECT w.doc_id, CAST(min(w.wi) AS BIGINT) AS peak_idx
           FROM w JOIN agg ON agg.doc_id = w.doc_id AND w.dev = agg.peak
           GROUP BY 1)
         SELECT s.doc_id, CAST(len(s.vs) AS BIGINT) AS n_samples,
           agg.n_windows, agg.active_n, agg.first_active,
           pk.peak_idx, CAST(agg.peak AS BIGINT) AS peak_sum
         FROM s
         JOIN agg ON agg.doc_id = s.doc_id
         JOIN pk ON pk.doc_id = s.doc_id
         ORDER BY s.doc_id""",
    "m03_media_resize" ->
      s"""WITH s AS (
            SELECT doc_id,
              string_agg(substr(text, 1 + i * ${Multimodal.ResampleStride}, 1),
                '' ORDER BY i) AS sampled
            FROM documents,
              (SELECT unnest(range(0, ${Multimodal.MaxSamples})) AS i) idx
            WHERE 1 + i * ${Multimodal.ResampleStride} <= length(text)
            GROUP BY doc_id)
          SELECT d.doc_id, CAST(length(coalesce(s.sampled, '')) AS BIGINT) AS r_bytes,
            CAST((16 + (ascii(substr(md5(d.text), 1, 1)) % 16)) // 2 AS INTEGER) AS r_width,
            CAST((16 + (ascii(substr(md5(d.text), 2, 1)) % 16)) // 2 AS INTEGER) AS r_height,
            md5(coalesce(s.sampled, '')) AS rhash
          FROM documents d LEFT JOIN s ON s.doc_id = d.doc_id
          ORDER BY d.doc_id""")
}
