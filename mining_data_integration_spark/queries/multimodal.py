"""Multimodal-column queries (SURVEY §7.4): binary payloads + typed
metadata -> Arrow-batched feature extraction (operators/multimodal.py).

The decode kernel is the deterministic sha256 stub (the container has
no codec libs), which makes the whole pipeline — binary schema, batch
iteration, metadata pruning, output shape — DuckDB-oracle-checkable:
DuckDB computes the identical sha256-derived features.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import multimodal as M
from ._util import spread, t


def mm1_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media -> feature vectors via mapInPandas; metadata filter
    (width) prunes before decode. Features rounded to 6 dp so the
    float32 column compares exactly against DuckDB's doubles."""
    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    media = M.make_fake_media(docs, "doc_id", "text")
    feats = M.extract_features(media, min_width=100)
    return feats.select(
        "media_id", "mime", "n_bytes",
        # CSV of fixed-6-dp decimals: the driver canonicalizer can't hash
        # raw array<> columns, and decimal(10,6) renders identically in
        # Spark and DuckDB (no float-formatting ambiguity)
        F.concat_ws(
            ",",
            F.transform(
                F.col("feature").cast("array<double>"),
                lambda x: F.round(x, 6).cast("decimal(10,6)").cast("string"),
            ),
        ).alias("feature_r"),
    ).orderBy("media_id")


def mm2_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling: payload = container of 32-byte
    frames, every 4th full frame decoded (sha256 stub) to a 4-float
    feature — the 1→N explode happens inside the Arrow batch
    (operators/multimodal.py sample_frames). Oracle reproduces the
    frames with range/unnest + substring (documents are ASCII, so
    character slicing = byte slicing)."""
    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    media = M.make_fake_media(docs, "doc_id", "text")
    frames = M.sample_frames(media, frame_size=32, stride=4)
    return frames.select(
        "media_id", "frame_idx",
        # CSV-serialized like mm1 (driver canonicalizer vs array<> cols)
        F.concat_ws(
            ",",
            F.transform(
                F.col("frame_feature").cast("array<double>"),
                lambda x: F.round(x, 6).cast("decimal(10,6)").cast("string"),
            ),
        ).alias("feature_r"),
    ).orderBy("media_id", "frame_idx")


def mm3_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thumbnail resize stage: aspect-preserving fit into 64×64, never
    upscaling (operators/multimodal.resize_media). The dimension math
    is exact IEEE arithmetic mirrored by the oracle; thumb_bytes
    proves the binary output column flows (sha256 stub = 32 bytes)."""
    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    media = M.make_fake_media(docs, "doc_id", "text")
    resized = M.resize_media(media, box=64)
    return resized.select(
        "media_id", "width", "height", "new_width", "new_height",
        F.octet_length("resized").alias("thumb_bytes"),
    ).orderBy("media_id")


def mm4_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-style overlapping frame windowing (64-sample frames, hop
    32 — librosa.util.frame counting): per-window integer energy/peak
    from the payload bytes inside the Arrow batch. Oracle mirrors with
    range + ord(substring) (ASCII payloads: char = byte)."""
    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    media = M.make_fake_media(docs, "doc_id", "text")
    return M.window_audio(media, frame=64, hop=32).orderBy(
        "media_id", "win_idx")


def mm5_ppm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL end-to-end image decode (round 4 — the decoder slot is no
    longer stub-only): every doc_id becomes an actual binary PPM (P6)
    image built JVM-side (operators/multimodal.make_ppm_media), and the
    Arrow kernel genuinely parses the format — magic, comment-tolerant
    header tokenizer, raster slicing — reducing the 4x2 raster to
    exact integer per-channel sums. The oracle never sees the binary:
    it recomputes the sums from the pixel generator formula, so a
    parser that misreads even one byte hash-mismatches."""
    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    media = M.make_ppm_media(docs.select("doc_id"), id_col="doc_id")
    return media.mapInPandas(
        M.decode_ppm_stats, M.PPM_STATS_SCHEMA).orderBy("media_id")


def mm6_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL decode of a COMPRESSED format, end-to-end: every doc_id
    becomes a genuine RGB8 PNG (Arrow encoder kernel — chunk CRC32s,
    zlib IDAT, per-scanline filters cycling through all five types),
    and the decoder kernel (operators/multimodal.png_decode) walks the
    chunk stream verifying CRCs, inflates, reverses Sub/Up/Average/
    Paeth filtering, and reduces the raster to exact channel sums.
    Every 97th id carries a flipped IDAT byte -> ok=false poison rows.
    The oracle never touches the binary: pixel sums come from the
    closed-form generator, so one wrong unfiltered byte anywhere
    hash-mismatches."""
    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    media = docs.select(F.col("doc_id").alias("media_id")).mapInPandas(
        M.make_png_media, "media_id bigint, payload binary")
    return media.mapInPandas(
        M.decode_png_stats, M.PNG_STATS_SCHEMA).orderBy("media_id")


def mm9_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL decode of a LOSSY compressed format through the INJECTABLE
    codec slot: every doc_id becomes a genuine baseline JPEG (Arrow
    encoder kernel — FDCT, Annex-K quantization, canonical Huffman,
    byte stuffing), and decode is operators/multimodal.decode_real
    with the from-scratch jpeg_decode_gray injected — the same slot a
    codec-equipped deployment fills with a PIL adapter. Fixture
    rasters are flat even-valued 8x8 blocks, so the lossy codec
    round-trips them BIT-EXACTLY (jpeg_block_value docstring has the
    proof) and the oracle recomputes pixel sums in closed form; every
    101st payload is truncated mid-scan -> ok=false poison rows."""
    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    media = docs.select(F.col("doc_id").alias("media_id")).mapInPandas(
        M.make_jpeg_media, "media_id bigint, payload binary")
    return media.mapInPandas(
        M.decode_real(M.jpeg_decode_gray), M.REAL_STATS_SCHEMA
    ).orderBy("media_id")


QUERIES = {
    "mm4_audio_windows": mm4_audio_windows,
    "mm1_feature_extract": mm1_feature_extract,
    "mm2_frame_sample": mm2_frame_sample,
    "mm3_resize_plan": mm3_resize_plan,
    "mm5_ppm_decode": mm5_ppm_decode,
    "mm6_png_decode": mm6_png_decode,
    "mm9_jpeg_decode": mm9_jpeg_decode,
}


def _ppm_chan_sum(offset: int) -> str:
    """Channel sum from the generator formula: raster byte j has value
    (media_id*(j+1)) % 256; channel `offset` owns bytes j = 3p+offset."""
    n_px = M.PPM_W * M.PPM_H
    terms = " + ".join(
        f"(doc_id * {3 * p + offset + 1}) % 256" for p in range(n_px))
    return f"CAST({terms} AS BIGINT)"

def _png_chan_sum(offset: int) -> str:
    n_px = M.PNG_W * M.PNG_H
    terms = " + ".join(
        f"(doc_id * {3 * p + offset + 1}) % 256" for p in range(n_px))
    return (f"CASE WHEN doc_id % {M.PNG_POISON_EVERY} = 0 THEN NULL "
            f"ELSE CAST({terms} AS BIGINT) END")


def _jpeg_sum_px() -> str:
    """Closed-form pixel sum from the flat-block generator:
    each of the four 8x8 blocks contributes 64 * jpeg_block_value."""
    terms = " + ".join(
        f"64 * (2 * ((doc_id * 7 + {bx} + 3 * {by}) % 128))"
        for by in range(M.JPEG_H // 8) for bx in range(M.JPEG_W // 8))
    return (f"CASE WHEN doc_id % {M.JPEG_POISON_EVERY} = 0 THEN NULL "
            f"ELSE CAST({terms} AS BIGINT) END")


ORACLES = {
    "mm9_jpeg_decode": f"""
        SELECT doc_id AS media_id,
               CASE WHEN doc_id % {M.JPEG_POISON_EVERY} = 0 THEN NULL
                    ELSE CAST({M.JPEG_W} AS INTEGER) END AS width,
               CASE WHEN doc_id % {M.JPEG_POISON_EVERY} = 0 THEN NULL
                    ELSE CAST({M.JPEG_H} AS INTEGER) END AS height,
               {_jpeg_sum_px()} AS sum_px,
               doc_id % {M.JPEG_POISON_EVERY} <> 0 AS ok
        FROM documents ORDER BY media_id
    """,
    "mm6_png_decode": f"""
        SELECT doc_id AS media_id,
               CASE WHEN doc_id % {M.PNG_POISON_EVERY} = 0 THEN NULL
                    ELSE CAST({M.PNG_W} AS INTEGER) END AS width,
               CASE WHEN doc_id % {M.PNG_POISON_EVERY} = 0 THEN NULL
                    ELSE CAST({M.PNG_H} AS INTEGER) END AS height,
               {_png_chan_sum(0)} AS sum_r,
               {_png_chan_sum(1)} AS sum_g,
               {_png_chan_sum(2)} AS sum_b,
               doc_id % {M.PNG_POISON_EVERY} <> 0 AS ok
        FROM documents ORDER BY media_id
    """,
    "mm5_ppm_decode": f"""
        SELECT doc_id AS media_id,
               CAST({M.PPM_W} AS INTEGER) AS width,
               CAST({M.PPM_H} AS INTEGER) AS height,
               {_ppm_chan_sum(0)} AS sum_r,
               {_ppm_chan_sum(1)} AS sum_g,
               {_ppm_chan_sum(2)} AS sum_b,
               TRUE AS ok
        FROM documents ORDER BY media_id
    """,
    "mm4_audio_windows": """
        WITH m AS (
            SELECT doc_id AS media_id, text, length(text) AS L
            FROM documents
        ), wins AS (
            SELECT media_id, text,
                   -- CASE guard: DuckDB's // truncates toward zero,
                   -- so (L-64)//32 must never see a negative operand
                   unnest(range(0, CASE WHEN L >= 64
                                        THEN (L - 64) // 32 + 1
                                        ELSE 0 END)) AS win_idx
            FROM m
        )
        SELECT media_id,
               CAST(win_idx AS INTEGER) AS win_idx,
               CAST(win_idx * 32 AS INTEGER) AS start,
               CAST(list_sum(list_transform(range(1, 65),
                    i -> ord(substring(text, CAST(win_idx * 32 + i AS INTEGER), 1))))
                    AS BIGINT) AS energy,
               CAST(list_max(list_transform(range(1, 65),
                    i -> ord(substring(text, CAST(win_idx * 32 + i AS INTEGER), 1))))
                    AS INTEGER) AS peak
        FROM wins ORDER BY media_id, win_idx
    """,
    "mm3_resize_plan": """
        WITH media AS (
            SELECT doc_id AS media_id,
                   CAST(length(text) % 640 + 1 AS INTEGER) AS width,
                   CAST(length(text) % 480 + 1 AS INTEGER) AS height
            FROM documents
        ), dims AS (
            SELECT media_id, width, height,
                   least(CAST(64 AS DOUBLE) / width,
                         CAST(64 AS DOUBLE) / height, 1.0) AS scale
            FROM media
        )
        SELECT media_id, width, height,
               greatest(1, CAST(floor(width * scale) AS INT)) AS new_width,
               greatest(1, CAST(floor(height * scale) AS INT)) AS new_height,
               32 AS thumb_bytes
        FROM dims ORDER BY media_id
    """,
    "mm2_frame_sample": """
        WITH frames AS (
            SELECT doc_id AS media_id,
                   unnest(range(0, length(text) // 32, 4)) AS frame_idx,
                   text
            FROM documents
        ), hashed AS (
            SELECT media_id, frame_idx,
                   sha256(substring(text, frame_idx * 32 + 1, 32)) AS hex
            FROM frames
        )
        SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
               array_to_string(list_transform(range(0, 4),
                   i -> CAST(CAST(round(CAST(CAST(
                   ((strpos('0123456789abcdef', substring(hex, 2*i + 1, 1)) - 1) * 16
                    + strpos('0123456789abcdef', substring(hex, 2*i + 2, 1)) - 1
                   ) / 255.0 AS REAL) AS DOUBLE), 6) AS DECIMAL(10,6)) AS VARCHAR)),
                   ',') AS feature_r
        FROM hashed
        ORDER BY media_id, frame_idx
    """,
    "mm1_feature_extract": """
        WITH media AS (
            SELECT doc_id AS media_id, 'image/png' AS mime,
                   (length(text) % 640 + 1) AS width,
                   encode(text) AS payload, text
            FROM documents
        ), hashed AS (
            -- sha256(VARCHAR) hashes the utf-8 encoding = our payload
            SELECT media_id, mime, octet_length(payload) AS n_bytes,
                   sha256(text) AS hex
            FROM media WHERE width >= 100
        )
        SELECT media_id, mime, n_bytes,
               -- CAST .. AS REAL mirrors the operator's float32
               -- feature column before the 6-dp round
               array_to_string(list_transform(range(0, 16),
                   i -> CAST(CAST(round(CAST(CAST(
                   ((strpos('0123456789abcdef', substring(hex, 2*i + 1, 1)) - 1) * 16
                    + strpos('0123456789abcdef', substring(hex, 2*i + 2, 1)) - 1
                   ) / 255.0 AS REAL) AS DOUBLE), 6) AS DECIMAL(10,6)) AS VARCHAR)),
                   ',') AS feature_r
        FROM hashed
        ORDER BY media_id
    """,
}


def mm7_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode end-to-end: every doc_id becomes a genuine
    mono 16-bit PCM WAV (Arrow encoder kernel — RIFF envelope, fmt
    validation, word-aligned chunk walk) from a closed-form sample
    generator; the decoder kernel (operators/multimodal.wav_decode,
    cross-checked against the stdlib wave module in tests) parses the
    container and reduces samples to exact integer energy/peak. Every
    89th id carries a corrupted RIFF size -> ok=false poison rows.
    The oracle recomputes energy/peak from the generator formula."""
    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    media = docs.select(F.col("doc_id").alias("media_id")).mapInPandas(
        M.make_wav_media, "media_id bigint, payload binary")
    return media.mapInPandas(
        M.decode_wav_stats, M.WAV_STATS_SCHEMA).orderBy("media_id")


QUERIES["mm7_wav_decode"] = mm7_wav_decode


def _wav_oracle() -> str:
    n = M.WAV_N_SAMPLES
    p = M.WAV_POISON_EVERY
    sample = "abs(((doc_id * (j + 3)) % 4001) - 2000)"
    return f"""
    WITH s AS (
        SELECT doc_id, unnest(range(0, {n})) AS j FROM documents
    ), agg AS (
        SELECT doc_id,
               CAST(sum({sample}) AS BIGINT) AS energy,
               CAST(max({sample}) AS INTEGER) AS peak
        FROM s GROUP BY doc_id
    )
    SELECT d.doc_id AS media_id,
           CASE WHEN d.doc_id % {p} = 0 THEN NULL
                ELSE CAST({M.WAV_SR} AS INTEGER) END AS sample_rate,
           CASE WHEN d.doc_id % {p} = 0 THEN NULL
                ELSE CAST({n} AS INTEGER) END AS n_samples,
           CASE WHEN d.doc_id % {p} = 0 THEN NULL ELSE a.energy END
               AS energy,
           CASE WHEN d.doc_id % {p} = 0 THEN NULL ELSE a.peak END
               AS peak,
           d.doc_id % {p} <> 0 AS ok
    FROM documents d JOIN agg a ON d.doc_id = a.doc_id
    ORDER BY media_id
    """


ORACLES["mm7_wav_decode"] = _wav_oracle()


def mm8_dhash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate clustering by perceptual hash — the
    multimodal analogue of dd1's exact text dedup: every doc becomes a
    real binary PPM, the Arrow kernel DECODES it and computes the
    dHash (integer grayscale, neighbor-compare bits), and images
    collapse into clusters by hash equality. Output is the cluster
    report (hash, size, min-id exemplar) a corpus pipeline uses to
    keep one image per perceptual bucket. Scale: hashing is map-side
    mapInPandas; clustering is ONE combinable groupBy on the 64-value
    hash space (a 9x8 production raster widens that to 2^64 — same
    plan). The oracle recomputes every gray level and comparison bit
    from the pixel generator formula, so a decode or bit-pack error
    anywhere hash-mismatches."""
    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    media = M.make_ppm_media(docs.select("doc_id"), id_col="doc_id")
    hashed = media.mapInPandas(M.decode_ppm_dhash, M.DHASH_SCHEMA)
    return (
        hashed.filter(F.col("ok"))
        .groupBy("dhash")
        .agg(F.count("*").cast("long").alias("n_images"),
             F.min("media_id").cast("long").alias("exemplar"))
        .orderBy("dhash")
    )


QUERIES["mm8_dhash_clusters"] = mm8_dhash_clusters


def _ppm_gray(p: int) -> str:
    """Exact integer grayscale of pixel p from the generator formula:
    byte j of the raster is (doc_id*(j+1)) % 256, channel c of pixel p
    is byte 3p+c."""
    chans = " + ".join(f"(doc_id * {3 * p + c + 1}) % 256"
                       for c in range(3))
    return f"(({chans}) // 3)"


def _dhash_expr() -> str:
    bits = []
    k = (M.PPM_W - 1) * M.PPM_H
    for y in range(M.PPM_H):
        for x in range(M.PPM_W - 1):
            k -= 1
            pa, pb = y * M.PPM_W + x, y * M.PPM_W + x + 1
            bits.append(
                f"(CASE WHEN {_ppm_gray(pa)} > {_ppm_gray(pb)} "
                f"THEN {1 << k} ELSE 0 END)")
    return " + ".join(bits)


ORACLES["mm8_dhash_clusters"] = f"""
    WITH h AS (
        SELECT doc_id, CAST({_dhash_expr()} AS BIGINT) AS dhash
        FROM documents
    )
    SELECT dhash, CAST(count(*) AS BIGINT) AS n_images,
           CAST(min(doc_id) AS BIGINT) AS exemplar
    FROM h GROUP BY dhash ORDER BY dhash
"""


def mm10_gif_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL decode of a THIRD compression family, end-to-end: every
    doc_id becomes a genuine GIF87a (Arrow encoder kernel — LSB-first
    variable-width LZW with clear/EOI codes and 4096-entry dictionary
    resets, 255-byte sub-block framing, grayscale-identity palette)
    decoded through the injectable decode_real slot by the
    from-scratch GIF parser (extension-block walk, palette handling,
    full LZW with the cScSc case). LZW is lossless, so the oracle
    recomputes pixel sums from the mm5 closed-form generator; every
    103rd payload is truncated mid-stream -> ok=false poison rows."""
    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    media = docs.select(F.col("doc_id").alias("media_id")).mapInPandas(
        M.make_gif_media, "media_id bigint, payload binary")
    return media.mapInPandas(
        M.decode_real(M.gif_decode_gray), M.REAL_STATS_SCHEMA
    ).orderBy("media_id")


QUERIES["mm10_gif_decode"] = mm10_gif_decode


def _gif_sum_px() -> str:
    n_px = M.GIF_W * M.GIF_H
    terms = " + ".join(f"(doc_id * {j + 1}) % 256" for j in range(n_px))
    return (f"CASE WHEN doc_id % {M.GIF_POISON_EVERY} = 0 THEN NULL "
            f"ELSE CAST({terms} AS BIGINT) END")


ORACLES["mm10_gif_decode"] = f"""
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % {M.GIF_POISON_EVERY} = 0 THEN NULL
                ELSE CAST({M.GIF_W} AS INTEGER) END AS width,
           CASE WHEN doc_id % {M.GIF_POISON_EVERY} = 0 THEN NULL
                ELSE CAST({M.GIF_H} AS INTEGER) END AS height,
           {_gif_sum_px()} AS sum_px,
           doc_id % {M.GIF_POISON_EVERY} <> 0 AS ok
    FROM documents ORDER BY media_id
"""


def mm11_adpcm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPRESSED audio decode end-to-end — the fourth from-scratch
    compression family (predictive coding: IMA ADPCM / DVI4, 4-bit
    adaptive deltas, 4x) after DEFLATE (mm6), DCT+Huffman (mm9) and
    LZW (mm10): every doc_id becomes a real IMA-ADPCM WAV (fmt tag
    0x0011 + fact chunk + per-block predictor headers) of ramp blocks
    chosen so the LOSSY codec reproduces them bit-exactly (at step
    index 0 both 0- and +1-deltas encode exactly and the index stays
    clamped at 0 — proof in adpcm_block_start's docstring), then the
    decoder kernel (operators/multimodal.adpcm_decode) walks the RIFF
    container and reconstructs samples predictively, reducing to
    exact integer energy/peak. Every 97th id carries a block header
    step index past the 89-entry table -> ok=false poison rows. The
    oracle recomputes every decoded sample as block_start + j."""
    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    media = docs.select(F.col("doc_id").alias("media_id")).mapInPandas(
        M.make_adpcm_media, "media_id bigint, payload binary")
    return media.mapInPandas(
        M.decode_adpcm_stats, M.ADPCM_STATS_SCHEMA).orderBy("media_id")


QUERIES["mm11_adpcm_decode"] = mm11_adpcm_decode


def _adpcm_oracle() -> str:
    nb, spb, p = M.ADPCM_N_BLOCKS, M.ADPCM_SPB, M.ADPCM_POISON_EVERY
    start = "((doc_id * (b + 7)) % 4001) - 2000"
    return f"""
    WITH bl AS (
        SELECT doc_id, unnest(range(0, {nb})) AS b FROM documents
    ), s AS (
        SELECT doc_id, abs({start} + j.j) AS av
        FROM bl, (SELECT unnest(range(0, {spb})) AS j) j
    ), agg AS (
        SELECT doc_id,
               CAST(sum(av) AS BIGINT) AS energy,
               CAST(max(av) AS INTEGER) AS peak
        FROM s GROUP BY doc_id
    )
    SELECT d.doc_id AS media_id,
           CASE WHEN d.doc_id % {p} = 0 THEN NULL
                ELSE CAST({M.ADPCM_SR} AS INTEGER) END AS sample_rate,
           CASE WHEN d.doc_id % {p} = 0 THEN NULL
                ELSE CAST({nb} AS INTEGER) END AS n_blocks,
           CASE WHEN d.doc_id % {p} = 0 THEN NULL
                ELSE CAST({nb * spb} AS INTEGER) END AS n_samples,
           CASE WHEN d.doc_id % {p} = 0 THEN NULL ELSE a.energy END
               AS energy,
           CASE WHEN d.doc_id % {p} = 0 THEN NULL ELSE a.peak END
               AS peak,
           d.doc_id % {p} <> 0 AS ok
    FROM documents d JOIN agg a ON d.doc_id = a.doc_id
    ORDER BY media_id
    """


ORACLES["mm11_adpcm_decode"] = _adpcm_oracle()


def mm12_codec_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-corpus codec DISPATCH — the media-lake reality check
    composing all four from-scratch families behind one kernel: every
    doc_id becomes one of PNG (DEFLATE), GIF (LZW), PCM WAV or
    IMA-ADPCM WAV (predictive) by id % 4; the decode side SNIFFS each
    payload (magic bytes; RIFF disambiguated to PCM vs ADPCM by
    walking to the fmt tag — container alone does not identify the
    codec) and routes to the right from-scratch decoder, reducing to
    a unified (kind, n_units, checksum) row. Closed-form content
    generators per format let the oracle recompute every stat; every
    101st id has its first magic byte flipped -> unknown container ->
    ok=false with a null kind."""
    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    media = docs.select(F.col("doc_id").alias("media_id")).mapInPandas(
        M.make_mixed_media, "media_id bigint, payload binary")
    return media.mapInPandas(
        M.codec_dispatch_stats, M.MIX_STATS_SCHEMA).orderBy("media_id")


QUERIES["mm12_codec_dispatch"] = mm12_codec_dispatch


def _mix_oracle() -> str:
    p = M.MIX_POISON_EVERY
    png_sum = " + ".join(f"(doc_id * {j + 1}) % 256"
                         for j in range(M.MIX_PNG_W * M.MIX_PNG_H * 3))
    gif_sum = " + ".join(f"(doc_id * {j + 1}) % 256"
                         for j in range(M.MIX_GIF_W * M.MIX_GIF_H))
    wav_sum = " + ".join(
        f"abs(((doc_id * {j + 3}) % 4001) - 2000)"
        for j in range(M.MIX_WAV_N))
    adpcm_sum = " + ".join(
        f"abs(((doc_id * {b + 7}) % 4001) - 2000 + {j})"
        for b in range(M.MIX_ADPCM_BLOCKS)
        for j in range(M.ADPCM_SPB))
    kind = ("CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'gif' "
            "WHEN 2 THEN 'wav_pcm' ELSE 'wav_adpcm' END")
    n_units = ("CASE doc_id % 4 WHEN 0 THEN 8 WHEN 1 THEN 8 "
               "WHEN 2 THEN 16 ELSE 18 END")
    checksum = (f"CASE doc_id % 4 WHEN 0 THEN {png_sum} "
                f"WHEN 1 THEN {gif_sum} WHEN 2 THEN {wav_sum} "
                f"ELSE {adpcm_sum} END")
    return f"""
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % {p} = 0 THEN NULL ELSE {kind} END AS kind,
           CASE WHEN doc_id % {p} = 0 THEN NULL
                ELSE CAST({n_units} AS INTEGER) END AS n_units,
           CASE WHEN doc_id % {p} = 0 THEN NULL
                ELSE CAST({checksum} AS BIGINT) END AS checksum,
           doc_id % {p} <> 0 AS ok
    FROM documents ORDER BY media_id
    """


ORACLES["mm12_codec_dispatch"] = _mix_oracle()


def mm13_mjpeg_avi_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video frame decode end-to-end — the VIDEO modality done
    with an actual container + codec rather than the mm2 stub: every
    doc_id becomes a genuine MJPEG AVI (Arrow encoder kernel — RIFF
    'AVI ' envelope, hdrl/avih/strl stream headers, movi list of six
    complete baseline-JPEG frames), and the decode kernel walks the
    container with the from-scratch demuxer (operators/multimodal.
    avi_parse_mjpeg), samples every 2nd frame and decodes it through
    the injectable JPEG slot (jpeg_decode_gray) — one output row per
    sampled frame, the 1->N fan-out inside the Arrow batch. Frame
    rasters are flat even-valued 8x8 blocks (avi_frame_value), so the
    lossy codec round-trips them bit-exactly and the oracle recomputes
    every sampled frame's pixel sum in closed form; every 109th id
    carries an avih frame count that disagrees with the movi payload
    -> the demuxer rejects the lying header as a single ok=false row."""
    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    media = docs.select(F.col("doc_id").alias("media_id")).mapInPandas(
        M.make_avi_media, "media_id bigint, payload binary")
    return media.mapInPandas(
        M.decode_avi_frames(M.jpeg_decode_gray), M.AVI_STATS_SCHEMA
    ).orderBy("media_id", "frame_idx")


QUERIES["mm13_mjpeg_avi_decode"] = mm13_mjpeg_avi_decode


def _avi_sum_px() -> str:
    """Closed-form sampled-frame pixel sum: each of the four 8x8
    blocks of frame fi contributes 64 * avi_frame_value."""
    return " + ".join(
        f"64 * (2 * ((doc_id * 7 + fi * 11 + {bx} + 3 * {by}) % 128))"
        for by in range(M.AVI_H // 8) for bx in range(M.AVI_W // 8))


ORACLES["mm13_mjpeg_avi_decode"] = f"""
    SELECT doc_id AS media_id, CAST(fi AS INTEGER) AS frame_idx,
           CAST({M.AVI_W} AS INTEGER) AS width,
           CAST({M.AVI_H} AS INTEGER) AS height,
           CAST({_avi_sum_px()} AS BIGINT) AS sum_px,
           TRUE AS ok
    FROM documents,
         (SELECT unnest(range(0, {M.AVI_N_FRAMES},
                              {M.AVI_FRAME_STRIDE})) AS fi) f
    WHERE doc_id % {M.AVI_POISON_EVERY} <> 0
    UNION ALL
    SELECT doc_id AS media_id, NULL AS frame_idx, NULL AS width,
           NULL AS height, NULL AS sum_px, FALSE AS ok
    FROM documents WHERE doc_id % {M.AVI_POISON_EVERY} = 0
    ORDER BY media_id, frame_idx
"""
