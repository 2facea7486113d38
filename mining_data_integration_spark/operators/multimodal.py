"""Multimodal column plumbing (SURVEY.md §7.4): image/audio/video as
opaque binary columns + typed metadata, processed by Arrow-batched
mapInPandas stages.

The container has no image/audio codecs, so the decode kernels are
STUBBED: `decode_image_stub` produces a deterministic fake feature
vector from the bytes (sha256-seeded), and the real libraries would
drop into the same batch-iterator signature. Everything around the
stub — binary schema, batch iteration, partition sizing, output
schema — is real Spark plumbing and is what matters at 100 TB:

* binary payloads stay OFF the driver: mapInPandas streams Arrow
  record batches executor-side;
* `spark.sql.files.maxPartitionBytes` bounds how much binary a task
  holds; metadata-only predicates (width/height/mime filters) run
  BEFORE decode so pruned files are never decoded;
* feature vectors come back as array<float> columns ready for the
  similarity operators (operators/similarity.py).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 16

MEDIA_SCHEMA = (
    "media_id bigint, mime string, width int, height int, payload binary"
)
FEATURE_SCHEMA = (
    "media_id bigint, mime string, feature array<float>, n_bytes bigint"
)


def make_fake_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Build a synthetic media table from any table: payload bytes are
    the utf-8 text (deterministic), metadata derived from them."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image/png").alias("mime"),
        (F.length(text_col) % 640 + 1).cast("int").alias("width"),
        (F.length(text_col) % 480 + 1).cast("int").alias("height"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
    )


def _fake_feature(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real decoder+encoder: 16 floats
    from sha256(payload). A real pipeline calls PIL/librosa here —
    same signature, same batch shape."""
    h = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in h[:FEATURE_DIM]]


def decode_image_stub(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: binary payload -> feature vector. Batch-at-
    a-time so Arrow amortizes serialization; never materializes the
    whole partition."""
    for pdf in batches:
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "mime": pdf["mime"],
                "feature": [_fake_feature(bytes(p)) for p in pdf["payload"]],
                "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
            }
        )


def extract_features(media: DataFrame, min_width: int = 0) -> DataFrame:
    """Metadata-pruned decode: the width filter is a plain column
    predicate (pushed to the scan — decode never sees pruned rows),
    then the Arrow-batched stub kernel."""
    pruned = media.filter(F.col("width") >= min_width)
    return pruned.mapInPandas(decode_image_stub, schema=FEATURE_SCHEMA)


FRAME_DIM = 4
FRAME_SCHEMA = "media_id bigint, frame_idx int, frame_feature array<float>"


def make_frame_sampler(frame_size: int, stride: int):
    """mapInPandas kernel factory: video-style frame sampling. The
    payload is treated as a container of fixed-size frames; every
    `stride`-th full frame is 'decoded' (sha256 stub — a real pipeline
    slots an actual codec here) into a small feature vector. 1→N row
    fan-out happens inside the Arrow batch, so a long video never
    becomes a driver-side loop and short payloads emit nothing."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            feats: list[list[float]] = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                for fi in range(0, len(b) // frame_size, stride):
                    fb = b[fi * frame_size:(fi + 1) * frame_size]
                    h = hashlib.sha256(fb).digest()
                    ids.append(mid)
                    idxs.append(fi)
                    feats.append([x / 255.0 for x in h[:FRAME_DIM]])
            # explicit dtypes: a zero-row batch otherwise defaults the
            # list column to float64, which Arrow can't cast to
            # list<float>
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_feature": pd.Series(feats, dtype="object"),
                }
            )

    return kernel


def sample_frames(media: DataFrame, frame_size: int = 32,
                  stride: int = 4) -> DataFrame:
    """Sampled frame features per media row (see make_frame_sampler).
    Only (media_id, payload) cross the Arrow boundary — metadata
    columns are pruned before the kernel."""
    return media.select("media_id", "payload").mapInPandas(
        make_frame_sampler(frame_size, stride), schema=FRAME_SCHEMA)


REAL_STATS_SCHEMA = (
    "media_id bigint, width int, height int, sum_px bigint, ok boolean"
)


def decode_real(decoder=None):
    """The compressed-codec slot, INJECTABLE (the sources/rest.py
    transport pattern applied to codecs): pass any
    ``bytes -> (width, height, pixel_bytes)`` callable — a PIL/opencv
    adapter in a codec-equipped deployment, or the from-scratch
    decoders shipped here (jpeg_decode_gray below; png_decode /
    decode_ppm / wav_decode for their formats) — and get back a
    mapInPandas kernel producing REAL_STATS_SCHEMA rows; a decoder
    ValueError OR IndexError becomes an ok=false row, never a dead
    task (IndexError is the adversarial-payload class: an injected
    decoder that indexes a short segment body before validating its
    length — the cost is that a genuine indexing bug in a decoder
    also surfaces as ok=false rows rather than a task failure, so
    decoder unit tests, not this kernel, are where implementation
    bugs must be caught). Raises ONLY when no decoder is injected:
    the engine itself never fakes a codec it does not have."""
    if decoder is None:
        raise NotImplementedError(
            "no decoder injected: pass decode_real(decoder=...) a "
            "bytes -> (width, height, pixels) callable — e.g. "
            "jpeg_decode_gray (baseline JPEG, from scratch), "
            "png_decode, decode_ppm, or a PIL/opencv adapter in a "
            "codec-equipped deployment"
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, sums, oks = [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                ids.append(mid)
                try:
                    w, h, pix = decoder(bytes(payload))
                    ws.append(w)
                    hs.append(h)
                    sums.append(sum(pix))
                    oks.append(True)
                except (ValueError, IndexError):
                    # IndexError covers injected decoders that index a
                    # short segment body before validating its length —
                    # an adversarial payload must never kill the task
                    ws.append(None)
                    hs.append(None)
                    sums.append(None)
                    oks.append(False)
            yield pd.DataFrame({
                "media_id": pd.Series(ids, dtype="int64"),
                "width": pd.Series(ws, dtype="Int32"),
                "height": pd.Series(hs, dtype="Int32"),
                "sum_px": pd.Series(sums, dtype="Int64"),
                "ok": pd.Series(oks, dtype="bool"),
            })

    return kernel


# --- real image decode: binary PPM (P6), from scratch ------------------
# The one raster format simple enough to parse correctly with no codec
# library: ASCII header "P6 <w> <h> <maxval>" (with #-comments), one
# whitespace byte, then w*h*3 raw sample bytes.

PPM_W, PPM_H = 4, 2

PPM_STATS_SCHEMA = (
    "media_id bigint, width int, height int, "
    "sum_r bigint, sum_g bigint, sum_b bigint, ok boolean"
)


def make_ppm_media(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Deterministic REAL image corpus: every row becomes a valid
    binary PPM — header + 4x2 raster whose byte j is the pure function
    (media_id * (j+1)) % 256 — built entirely JVM-side (transform/
    lpad/hex over a sequence, then unhex), so the encode stage is
    whole-stage-codegen and the oracle can recompute every pixel."""
    n = PPM_W * PPM_H * 3
    hexstr = F.expr(
        f"concat_ws('', transform(sequence(0, {n - 1}), "
        f"j -> lpad(hex(({id_col} * (j + 1)) % 256), 2, '0')))"
    )
    header = f"P6\n{PPM_W} {PPM_H}\n255\n"
    return ids.select(
        F.col(id_col).alias("media_id"),
        F.concat(F.encode(F.lit(header), "utf-8"),
                 F.unhex(hexstr)).alias("payload"),
    )


def decode_ppm(data: bytes) -> tuple[int, int, bytes]:
    """From-scratch binary-PPM (P6) parser: magic, three whitespace-
    separated ASCII integers with ``#``-to-end-of-line comments allowed
    between tokens, exactly ONE whitespace byte before the raster, then
    w*h*3 one-byte samples (maxval < 256 only). Raises ValueError on
    any malformed payload — the kernel maps that to ok=false rows."""
    if not data.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    pos = 2
    vals: list[int] = []
    while len(vals) < 3:
        while pos < len(data):
            c = data[pos:pos + 1]
            if c.isspace():
                pos += 1
            elif c == b"#":
                nl = data.find(b"\n", pos)
                if nl == -1:
                    raise ValueError("unterminated header comment")
                pos = nl + 1
            else:
                break
        start = pos
        while (pos < len(data) and not data[pos:pos + 1].isspace()
               and data[pos:pos + 1] != b"#"):
            pos += 1
        tok = data[start:pos]
        if not tok.isdigit():
            raise ValueError(f"bad header token {tok!r}")
        vals.append(int(tok))
    w, h, maxval = vals
    if not 0 < maxval < 256:
        raise ValueError("only 1-byte samples supported (maxval < 256)")
    if pos >= len(data) or not data[pos:pos + 1].isspace():
        raise ValueError("missing raster separator")
    pos += 1
    need = w * h * 3
    pix = data[pos:pos + need]
    if len(pix) != need:
        raise ValueError("truncated raster")
    return w, h, pix


def decode_ppm_stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel around decode_ppm: real pixel decode reduced
    to exact integer per-channel sums (oracle-checkable — no float
    resample). Malformed payloads survive as ok=false rows with null
    dimensions instead of failing the task: at corpus scale a poison
    file must not kill the stage."""
    for pdf in batches:
        out: dict[str, list] = {k: [] for k in (
            "media_id", "width", "height", "sum_r", "sum_g", "sum_b", "ok")}
        for mid, payload in zip(pdf["media_id"], pdf["payload"]):
            out["media_id"].append(mid)
            try:
                w, h, pix = decode_ppm(bytes(payload))
                out["width"].append(w)
                out["height"].append(h)
                out["sum_r"].append(sum(pix[0::3]))
                out["sum_g"].append(sum(pix[1::3]))
                out["sum_b"].append(sum(pix[2::3]))
                out["ok"].append(True)
            except ValueError:
                for k in ("width", "height", "sum_r", "sum_g", "sum_b"):
                    out[k].append(None)
                out["ok"].append(False)
        yield pd.DataFrame({
            "media_id": pd.Series(out["media_id"], dtype="int64"),
            "width": pd.Series(out["width"], dtype="Int32"),
            "height": pd.Series(out["height"], dtype="Int32"),
            "sum_r": pd.Series(out["sum_r"], dtype="Int64"),
            "sum_g": pd.Series(out["sum_g"], dtype="Int64"),
            "sum_b": pd.Series(out["sum_b"], dtype="Int64"),
            "ok": pd.Series(out["ok"], dtype="bool"),
        })


RESIZE_SCHEMA = (
    "media_id bigint, mime string, width int, height int, "
    "new_width int, new_height int, resized binary"
)


def make_resizer(box: int = 64):
    """mapInPandas kernel factory: aspect-preserving fit into a
    box×box thumbnail, never upscaling. The DIMENSION arithmetic is
    the real resize plan (pure IEEE double ops — engine-exact); the
    pixel resample itself is stubbed (sha256 thumbnail stand-in; a
    real pipeline calls PIL.Image.resize here with the same batch
    signature)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            nw: list[int] = []
            nh: list[int] = []
            res: list[bytes] = []
            for w, h, payload in zip(pdf["width"], pdf["height"],
                                     pdf["payload"]):
                scale = min(box / w, box / h, 1.0)
                nw.append(max(1, int(w * scale)))
                nh.append(max(1, int(h * scale)))
                res.append(hashlib.sha256(bytes(payload)).digest())
            out = pdf[["media_id", "mime", "width", "height"]].copy()
            out["new_width"] = pd.Series(nw, dtype="int32")
            out["new_height"] = pd.Series(nh, dtype="int32")
            out["resized"] = res
            yield out

    return kernel


def resize_media(media: DataFrame, box: int = 64) -> DataFrame:
    """Thumbnail stage over binary media (see make_resizer). Payloads
    stream executor-side through Arrow; only the columns the kernel
    needs cross the boundary."""
    return media.select(
        "media_id", "mime", "width", "height", "payload"
    ).mapInPandas(make_resizer(box), schema=RESIZE_SCHEMA)


AUDIO_WINDOW_SCHEMA = (
    "media_id bigint, win_idx int, start int, energy bigint, peak int"
)


def make_audio_windower(frame: int, hop: int):
    """Arrow kernel: payload treated as 8-bit PCM; overlapping windows
    of `frame` samples every `hop` (the STFT/feature-frame shape —
    librosa.util.frame semantics: only full windows, count
    (n - frame) // hop + 1). Energy/peak are exact integers so the
    stage stays oracle-checkable; a real pipeline computes FFT bins
    here with the identical 1->N batch fan-out."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [], "win_idx": [], "start": [],
                "energy": [], "peak": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                n = (len(b) - frame) // hop + 1 if len(b) >= frame else 0
                for w in range(n):
                    seg = b[w * hop:w * hop + frame]
                    out["media_id"].append(mid)
                    out["win_idx"].append(w)
                    out["start"].append(w * hop)
                    out["energy"].append(sum(seg))
                    out["peak"].append(max(seg))
            yield pd.DataFrame(out)

    return kernel


def window_audio(media: DataFrame, frame: int = 64,
                 hop: int = 32) -> DataFrame:
    """Overlapping audio windowing via mapInPandas. Only (media_id,
    payload) cross the Arrow boundary; fan-out is bounded by
    len(payload) / hop per row."""
    return media.select("media_id", "payload").mapInPandas(
        make_audio_windower(frame, hop), AUDIO_WINDOW_SCHEMA)


# --- real image decode #2: PNG, from scratch ---------------------------
# PNG is a genuinely COMPRESSED format the engine can still decode with
# no codec library: the container is chunks with CRC32s, the raster is
# zlib (stdlib) over per-scanline filtered bytes, and the five filter
# types (None/Sub/Up/Average/Paeth) are pure byte arithmetic. The
# encoder below cycles filter types per scanline so the decoder's
# unfilter paths are all exercised end-to-end on every image.

import struct
import zlib

PNG_W, PNG_H = 6, 4
_PNG_BPP = 3  # RGB, 8-bit
_PNG_SIG = b"\x89PNG\r\n\x1a\n"
PNG_POISON_EVERY = 97

PNG_STATS_SCHEMA = (
    "media_id bigint, width int, height int, "
    "sum_r bigint, sum_g bigint, sum_b bigint, ok boolean"
)


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_scanline(ftype: int, raw: bytes, prev: bytes) -> bytes:
    bpp = _PNG_BPP
    out = bytearray(len(raw))
    for i, x in enumerate(raw):
        a = raw[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 0:
            out[i] = x
        elif ftype == 1:
            out[i] = (x - a) % 256
        elif ftype == 2:
            out[i] = (x - b) % 256
        elif ftype == 3:
            out[i] = (x - (a + b) // 2) % 256
        else:
            out[i] = (x - _paeth(a, b, c)) % 256
    return bytes(out)


def _unfilter_scanline(ftype: int, filt: bytes, prev: bytes) -> bytes:
    bpp = _PNG_BPP
    out = bytearray(len(filt))
    for i, x in enumerate(filt):
        a = out[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 0:
            out[i] = x
        elif ftype == 1:
            out[i] = (x + a) % 256
        elif ftype == 2:
            out[i] = (x + b) % 256
        elif ftype == 3:
            out[i] = (x + (a + b) // 2) % 256
        elif ftype == 4:
            out[i] = (x + _paeth(a, b, c)) % 256
        else:
            raise ValueError(f"bad filter type {ftype}")
    return bytes(out)


def png_encode(raw: bytes, width: int, height: int,
               filter_seed: int = 0) -> bytes:
    """Minimal RGB8 PNG encoder: scanline r gets filter type
    (filter_seed + r) % 5, so every filter path round-trips."""
    stride = width * _PNG_BPP
    if len(raw) != stride * height:
        raise ValueError("raster size mismatch")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    body = bytearray()
    prev = bytes(stride)
    for r in range(height):
        line = raw[r * stride:(r + 1) * stride]
        ftype = (filter_seed + r) % 5
        body.append(ftype)
        body += _filter_scanline(ftype, line, prev)
        prev = line
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(body), 6))
            + _png_chunk(b"IEND", b""))


def png_decode(data: bytes) -> tuple[int, int, bytes]:
    """From-scratch PNG decoder for the subset a data pipeline can
    verify without a codec library: 8-bit RGB (colour type 2), no
    interlace. Walks the chunk stream verifying every CRC32, inflates
    the concatenated IDATs (zlib verifies the adler32), and reverses
    the per-scanline filters. Raises ValueError on any malformation —
    the kernel maps that to ok=false rows."""
    if not data.startswith(_PNG_SIG):
        raise ValueError("bad PNG signature")
    pos = len(_PNG_SIG)
    width = height = None
    idat = bytearray()
    seen_end = False
    while pos < len(data):
        if pos + 8 > len(data):
            raise ValueError("truncated chunk header")
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        if pos + 12 + length > len(data):
            raise ValueError("truncated chunk")
        payload = data[pos + 8:pos + 8 + length]
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + length:pos + 12 + length])
        if zlib.crc32(ctype + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {ctype!r}")
        if ctype == b"IHDR":
            width, height, depth, ctype_px, comp, filt, inter = \
                struct.unpack(">IIBBBBB", payload)
            if (depth, ctype_px, comp, filt, inter) != (8, 2, 0, 0, 0):
                raise ValueError("unsupported PNG variant")
        elif ctype == b"IDAT":
            idat += payload
        elif ctype == b"IEND":
            seen_end = True
            break
        pos += 12 + length
    if width is None or not seen_end or not idat:
        raise ValueError("missing IHDR/IDAT/IEND")
    try:
        body = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"bad IDAT stream: {e}") from e
    stride = width * _PNG_BPP
    if len(body) != (stride + 1) * height:
        raise ValueError("raster size mismatch")
    out = bytearray()
    prev = bytes(stride)
    for r in range(height):
        row = body[r * (stride + 1):(r + 1) * (stride + 1)]
        line = _unfilter_scanline(row[0], row[1:], prev)
        out += line
        prev = line
    return width, height, bytes(out)


def make_png_media(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas ENCODER kernel: media_id -> real PNG payload whose
    raw raster byte j is the pure function (media_id*(j+1)) % 256 —
    so the DuckDB oracle recomputes the decoded channel sums in closed
    form without parsing PNG. Every PNG_POISON_EVERY-th id gets one
    IDAT byte flipped (CRC + inflate both break): the poison-file path
    a 100 TB crawl always contains."""
    n = PNG_W * PNG_H * _PNG_BPP
    for pdf in batches:
        payloads = []
        for mid in pdf["media_id"]:
            raw = bytes((int(mid) * (j + 1)) % 256 for j in range(n))
            png = bytearray(png_encode(raw, PNG_W, PNG_H,
                                       filter_seed=int(mid)))
            if int(mid) % PNG_POISON_EVERY == 0:
                png[41] ^= 0xFF  # first IDAT data byte
            payloads.append(bytes(png))
        yield pd.DataFrame({
            "media_id": pdf["media_id"].astype("int64"),
            "payload": payloads,
        })


def decode_png_stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel around png_decode: real inflate + unfilter
    reduced to exact per-channel integer sums; malformed payloads
    survive as ok=false rows (poison must not kill the stage)."""
    for pdf in batches:
        out: dict[str, list] = {k: [] for k in (
            "media_id", "width", "height", "sum_r", "sum_g", "sum_b", "ok")}
        for mid, payload in zip(pdf["media_id"], pdf["payload"]):
            out["media_id"].append(mid)
            try:
                w, h, pix = png_decode(bytes(payload))
                out["width"].append(w)
                out["height"].append(h)
                out["sum_r"].append(sum(pix[0::3]))
                out["sum_g"].append(sum(pix[1::3]))
                out["sum_b"].append(sum(pix[2::3]))
                out["ok"].append(True)
            except ValueError:
                for k in ("width", "height", "sum_r", "sum_g", "sum_b"):
                    out[k].append(None)
                out["ok"].append(False)
        yield pd.DataFrame({
            "media_id": pd.Series(out["media_id"], dtype="int64"),
            "width": pd.Series(out["width"], dtype="Int32"),
            "height": pd.Series(out["height"], dtype="Int32"),
            "sum_r": pd.Series(out["sum_r"], dtype="Int64"),
            "sum_g": pd.Series(out["sum_g"], dtype="Int64"),
            "sum_b": pd.Series(out["sum_b"], dtype="Int64"),
            "ok": pd.Series(out["ok"], dtype="bool"),
        })


# --- real audio decode: RIFF/WAVE PCM, from scratch --------------------
# The audio sibling of the PPM/PNG decoders: RIFF container walk
# (chunk ids + little-endian sizes, word alignment), fmt block
# validation, 16-bit PCM samples. No codec library involved.

WAV_SR = 8000
WAV_N_SAMPLES = 64
WAV_POISON_EVERY = 89

WAV_STATS_SCHEMA = (
    "media_id bigint, sample_rate int, n_samples int, "
    "energy bigint, peak int, ok boolean"
)


def wav_encode(samples: list[int], sample_rate: int) -> bytes:
    """Minimal mono 16-bit PCM WAV encoder (RIFF + fmt + data);
    samples packed explicitly little-endian for portability."""
    pcm = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(data: bytes) -> tuple[int, list[int]]:
    """From-scratch RIFF/WAVE parser for mono 16-bit PCM: validates the
    RIFF envelope size, walks chunks with word alignment, checks the
    fmt block (PCM, mono, 16-bit), and decodes the data chunk into
    signed samples. Raises ValueError on any malformation."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    (riff_sz,) = struct.unpack("<I", data[4:8])
    if riff_sz != len(data) - 8:
        raise ValueError("RIFF size mismatch")
    pos = 12
    sample_rate = None
    pcm = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (sz,) = struct.unpack("<I", data[pos + 4:pos + 8])
        payload = data[pos + 8:pos + 8 + sz]
        if len(payload) != sz:
            raise ValueError("truncated chunk")
        if cid == b"fmt ":
            if sz < 16:
                raise ValueError("short fmt chunk")
            audio_fmt, n_ch, sr, _br, _ba, bits = struct.unpack(
                "<HHIIHH", payload[:16])
            if (audio_fmt, n_ch, bits) != (1, 1, 16):
                raise ValueError("unsupported WAV variant")
            sample_rate = sr
        elif cid == b"data":
            pcm = payload
        pos += 8 + sz + (sz & 1)  # RIFF chunks are word-aligned
    if sample_rate is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    if len(pcm) % 2:
        raise ValueError("odd PCM byte count")
    samples = [struct.unpack("<h", pcm[i:i + 2])[0]
               for i in range(0, len(pcm), 2)]
    return sample_rate, samples


def make_wav_media(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow ENCODER kernel: media_id -> real WAV whose sample j is the
    pure function ((media_id*(j+3)) % 4001) - 2000, so the oracle
    recomputes energy/peak in closed form. Every WAV_POISON_EVERY-th
    id gets its RIFF size field corrupted."""
    for pdf in batches:
        payloads = []
        for mid in pdf["media_id"]:
            samples = [((int(mid) * (j + 3)) % 4001) - 2000
                       for j in range(WAV_N_SAMPLES)]
            wav = bytearray(wav_encode(samples, WAV_SR))
            if int(mid) % WAV_POISON_EVERY == 0:
                wav[4] ^= 0xFF  # RIFF envelope size now wrong
            payloads.append(bytes(wav))
        yield pd.DataFrame({
            "media_id": pdf["media_id"].astype("int64"),
            "payload": payloads,
        })


def decode_wav_stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow kernel around wav_decode: exact integer energy
    (sum of |sample|) and peak per payload; malformed payloads
    degrade to ok=false rows."""
    for pdf in batches:
        out: dict[str, list] = {k: [] for k in (
            "media_id", "sample_rate", "n_samples", "energy", "peak", "ok")}
        for mid, payload in zip(pdf["media_id"], pdf["payload"]):
            out["media_id"].append(mid)
            try:
                sr, samples = wav_decode(bytes(payload))
                out["sample_rate"].append(sr)
                out["n_samples"].append(len(samples))
                out["energy"].append(sum(abs(s) for s in samples))
                out["peak"].append(max(abs(s) for s in samples)
                                   if samples else 0)
                out["ok"].append(True)
            except ValueError:
                for k in ("sample_rate", "n_samples", "energy", "peak"):
                    out[k].append(None)
                out["ok"].append(False)
        yield pd.DataFrame({
            "media_id": pd.Series(out["media_id"], dtype="int64"),
            "sample_rate": pd.Series(out["sample_rate"], dtype="Int32"),
            "n_samples": pd.Series(out["n_samples"], dtype="Int32"),
            "energy": pd.Series(out["energy"], dtype="Int64"),
            "peak": pd.Series(out["peak"], dtype="Int32"),
            "ok": pd.Series(out["ok"], dtype="bool"),
        })


# --- compressed audio: IMA ADPCM (DVI4), from scratch ------------------
# The fourth compression family after DEFLATE (PNG), DCT+Huffman
# (JPEG) and LZW (GIF): PREDICTIVE coding — each 16-bit sample is
# stored as a 4-bit delta against an adaptive-step predictor (4x
# compression). Tables and algorithm are the public IMA/DVI spec
# (also RFC 3551 §4.5.1); the WAV container uses format tag 0x0011
# with per-block (predictor, step-index) headers, a fact chunk, and
# the same word-aligned RIFF walk as wav_decode above.

ADPCM_SR = 8000
ADPCM_SPB = 9            # samples per block: 1 header + 8 nibbles
ADPCM_BLOCK_BYTES = 8    # 4-byte header + 4 nibble bytes
ADPCM_N_BLOCKS = 6
ADPCM_POISON_EVERY = 97

_IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
    143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449,
    494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411,
    1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026,
    4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442,
    11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623,
    27086, 29794, 32767,
]
_IMA_INDEX_ADJ = [-1, -1, -1, -1, 2, 4, 6, 8]


def _ima_step_decode(pred: int, index: int, nib: int) -> tuple[int, int]:
    """One IMA decode step: reconstruct the next sample from a 4-bit
    code. diff = step/8 + bit-selected step/1, step/2, step/4 — the
    integer-shift formulation every hardware decoder uses."""
    step = _IMA_STEPS[index]
    diff = step >> 3
    if nib & 4:
        diff += step
    if nib & 2:
        diff += step >> 1
    if nib & 1:
        diff += step >> 2
    pred = pred - diff if nib & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    index = max(0, min(88, index + _IMA_INDEX_ADJ[nib & 7]))
    return pred, index


def ima_adpcm_encode_block(samples: list[int],
                           index: int) -> tuple[bytes, int, list[int]]:
    """Encode one IMA ADPCM block: the first sample travels verbatim
    in the 4-byte header (int16 predictor + step index + reserved),
    the rest as greedy bit-by-bit 4-bit codes. The encoder tracks the
    DECODER's reconstruction (predictive coding's defining closure:
    both sides run the same predictor), so the returned `recon` list
    is bit-exactly what ima_adpcm_decode will produce — the property
    the roundtrip tests pin on arbitrary signals."""
    pred = samples[0]
    recon = [pred]
    header = struct.pack("<hBB", pred, index, 0)
    nibbles = []
    for s in samples[1:]:
        step = _IMA_STEPS[index]
        delta = s - pred
        nib = 0
        if delta < 0:
            nib = 8
            delta = -delta
        if delta >= step:
            nib |= 4
            delta -= step
        if delta >= step >> 1:
            nib |= 2
            delta -= step >> 1
        if delta >= step >> 2:
            nib |= 1
        pred, index = _ima_step_decode(pred, index, nib)
        nibbles.append(nib)
        recon.append(pred)
    if len(nibbles) % 2:
        nibbles.append(0)
    data = bytes(nibbles[i] | (nibbles[i + 1] << 4)
                 for i in range(0, len(nibbles), 2))
    return header + data, index, recon


def adpcm_encode(samples: list[int], sample_rate: int,
                 spb: int = ADPCM_SPB) -> bytes:
    """Mono IMA-ADPCM WAV encoder: fmt (tag 0x0011, 4-bit, cbSize=2
    extension carrying samples-per-block), a fact chunk with the true
    sample count, and fixed-size data blocks. The step index carries
    ACROSS blocks (each block header re-seeds the decoder, real IMA
    behavior) and the total length must tile into whole blocks."""
    if len(samples) % spb:
        raise ValueError("sample count must be a multiple of "
                         "samples_per_block")
    block_bytes = 4 + (spb - 1 + 1) // 2
    index = 0
    blocks = []
    for i in range(0, len(samples), spb):
        blk, index, _ = ima_adpcm_encode_block(samples[i:i + spb], index)
        blocks.append(blk)
    data = b"".join(blocks)
    byte_rate = (sample_rate * block_bytes + spb - 1) // spb
    fmt = struct.pack("<HHIIHHHH", 0x11, 1, sample_rate, byte_rate,
                      block_bytes, 4, 2, spb)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"fact" + struct.pack("<I", 4)
            + struct.pack("<I", len(samples))
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def adpcm_decode(data: bytes) -> tuple[int, list[int]]:
    """From-scratch IMA-ADPCM WAV decoder: RIFF walk (envelope size,
    word alignment — the wav_decode discipline), fmt validation (tag
    0x0011, mono, 4-bit, extension with samples-per-block), fact
    sample count, then per-block predictive reconstruction seeded
    from each block header. Raises ValueError on any malformation,
    including a header step index past the 89-entry table."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    (riff_sz,) = struct.unpack("<I", data[4:8])
    if riff_sz != len(data) - 8:
        raise ValueError("RIFF size mismatch")
    pos = 12
    sample_rate = block_bytes = spb = n_total = None
    pcm = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (sz,) = struct.unpack("<I", data[pos + 4:pos + 8])
        payload = data[pos + 8:pos + 8 + sz]
        if len(payload) != sz:
            raise ValueError("truncated chunk")
        if cid == b"fmt ":
            if sz < 20:
                raise ValueError("short fmt chunk")
            tag, n_ch, sr, _br, ba, bits, cb, _spb = struct.unpack(
                "<HHIIHHHH", payload[:20])
            if (tag, n_ch, bits) != (0x11, 1, 4) or cb < 2:
                raise ValueError("unsupported ADPCM variant")
            sample_rate, block_bytes, spb = sr, ba, _spb
        elif cid == b"fact":
            if sz < 4:
                raise ValueError("short fact chunk")
            (n_total,) = struct.unpack("<I", payload[:4])
        elif cid == b"data":
            pcm = payload
        pos += 8 + sz + (sz & 1)
    if sample_rate is None or pcm is None or n_total is None:
        raise ValueError("missing fmt/fact/data chunk")
    if spb < 1 or block_bytes < 4 or len(pcm) % block_bytes:
        raise ValueError("data does not tile into blocks")
    samples: list[int] = []
    for off in range(0, len(pcm), block_bytes):
        pred, index, _rsv = struct.unpack(
            "<hBB", pcm[off:off + 4])
        if index > 88:
            raise ValueError("step index out of range")
        samples.append(pred)
        emitted = 1
        for byte in pcm[off + 4:off + block_bytes]:
            for nib in (byte & 0x0F, byte >> 4):
                if emitted >= spb:
                    break
                pred, index = _ima_step_decode(pred, index, nib)
                samples.append(pred)
                emitted += 1
    if len(samples) < n_total:
        raise ValueError("fact count exceeds decoded samples")
    samples = samples[:n_total]
    return sample_rate, samples


def adpcm_block_start(mid: int, b: int) -> int:
    """Closed-form first sample of block b for media id mid. Each
    block is an ascending +1-per-sample ramp from this value; at step
    index 0 (step=7) both a 0-delta and a +1-delta encode EXACTLY
    (diff = 7>>3 = 0 and 7>>3 + 7>>2 = 1) and the index adjustment is
    -1 -> clamped 0, so ramp fixtures round-trip the lossy codec
    bit-exactly and the oracle can recompute every decoded sample as
    start + j. |start| <= 2000 keeps start + 8 far from int16 clamp."""
    return ((mid * (b + 7)) % 4001) - 2000


def make_adpcm_media(batches: Iterator[pd.DataFrame]) \
        -> Iterator[pd.DataFrame]:
    """Arrow ENCODER kernel: media_id -> real IMA-ADPCM WAV of
    ADPCM_N_BLOCKS ramp blocks (closed-form starts, see
    adpcm_block_start). Every ADPCM_POISON_EVERY-th id gets its first
    block header's step index corrupted to 0xEE (> 88) — located via
    a mini chunk walk, not a hardcoded offset."""
    for pdf in batches:
        payloads = []
        for mid in pdf["media_id"]:
            samples = [adpcm_block_start(int(mid), b) + j
                       for b in range(ADPCM_N_BLOCKS)
                       for j in range(ADPCM_SPB)]
            wav = bytearray(adpcm_encode(samples, ADPCM_SR))
            if int(mid) % ADPCM_POISON_EVERY == 0:
                pos = 12
                while pos + 8 <= len(wav):
                    (sz,) = struct.unpack("<I", wav[pos + 4:pos + 8])
                    if wav[pos:pos + 4] == b"data":
                        wav[pos + 8 + 2] = 0xEE  # block-1 step index
                        break
                    pos += 8 + sz + (sz & 1)
            payloads.append(bytes(wav))
        yield pd.DataFrame({
            "media_id": pdf["media_id"].astype("int64"),
            "payload": payloads,
        })


ADPCM_STATS_SCHEMA = (
    "media_id bigint, sample_rate int, n_blocks int, n_samples int, "
    "energy bigint, peak int, ok boolean"
)


def decode_adpcm_stats(batches: Iterator[pd.DataFrame]) \
        -> Iterator[pd.DataFrame]:
    """Arrow kernel around adpcm_decode: exact integer energy
    (sum |sample|) and peak; malformed payloads -> ok=false rows."""
    for pdf in batches:
        out: dict[str, list] = {k: [] for k in (
            "media_id", "sample_rate", "n_blocks", "n_samples",
            "energy", "peak", "ok")}
        for mid, payload in zip(pdf["media_id"], pdf["payload"]):
            out["media_id"].append(mid)
            try:
                sr, samples = adpcm_decode(bytes(payload))
                out["sample_rate"].append(sr)
                out["n_blocks"].append(len(samples) // ADPCM_SPB)
                out["n_samples"].append(len(samples))
                out["energy"].append(sum(abs(s) for s in samples))
                out["peak"].append(max(abs(s) for s in samples)
                                   if samples else 0)
                out["ok"].append(True)
            except ValueError:
                for k in ("sample_rate", "n_blocks", "n_samples",
                          "energy", "peak"):
                    out[k].append(None)
                out["ok"].append(False)
        yield pd.DataFrame({
            "media_id": pd.Series(out["media_id"], dtype="int64"),
            "sample_rate": pd.Series(out["sample_rate"], dtype="Int32"),
            "n_blocks": pd.Series(out["n_blocks"], dtype="Int32"),
            "n_samples": pd.Series(out["n_samples"], dtype="Int32"),
            "energy": pd.Series(out["energy"], dtype="Int64"),
            "peak": pd.Series(out["peak"], dtype="Int32"),
            "ok": pd.Series(out["ok"], dtype="bool"),
        })


# --- mixed-corpus codec dispatch (mm12) --------------------------------
# A real media lake is format-heterogeneous: the decode operator must
# SNIFF each payload's container (magic bytes, and for RIFF the fmt
# tag) and route it to the right decoder. This composes all four
# from-scratch families behind one kernel, with the same injectable-
# decoder philosophy as decode_real (pass your own kind->decoder map
# in a codec-equipped deployment).

MIX_POISON_EVERY = 101
MIX_PNG_W, MIX_PNG_H = 4, 2          # RGB: 24 raster bytes
MIX_GIF_W, MIX_GIF_H = 4, 2          # gray: 8 raster bytes
MIX_WAV_N = 16
MIX_ADPCM_BLOCKS = 2

MIX_STATS_SCHEMA = (
    "media_id bigint, kind string, n_units int, checksum bigint, "
    "ok boolean"
)


def sniff_media_kind(data: bytes) -> str:
    """Container detection from magic bytes: PNG signature, GIF87a/
    89a, or RIFF/WAVE — the latter disambiguated to PCM vs IMA-ADPCM
    by walking chunks to the fmt tag (the container alone does not
    identify the codec; the fmt chunk does). Raises ValueError for
    unknown containers — the dispatch kernel maps that to ok=false."""
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        pos = 12
        while pos + 8 <= len(data):
            cid = data[pos:pos + 4]
            (sz,) = struct.unpack("<I", data[pos + 4:pos + 8])
            if cid == b"fmt " and sz >= 2:
                if pos + 10 > len(data):
                    raise ValueError("RIFF fmt chunk truncated")
                (tag,) = struct.unpack("<H", data[pos + 8:pos + 10])
                if tag == 1:
                    return "wav_pcm"
                if tag == 0x11:
                    return "wav_adpcm"
                raise ValueError(f"unknown WAV format tag {tag:#x}")
            pos += 8 + sz + (sz & 1)
        raise ValueError("RIFF/WAVE without fmt chunk")
    raise ValueError("unknown media container")


def _mix_decode(kind: str, payload: bytes) -> tuple[int, int]:
    """(n_units, checksum) per kind: pixels + byte sum for rasters,
    samples + absolute-amplitude sum for audio."""
    if kind == "png":
        w, h, pix = png_decode(payload)
        return w * h, sum(pix)
    if kind == "gif":
        w, h, pix = gif_decode_gray(payload)
        return w * h, sum(pix)
    dec = wav_decode if kind == "wav_pcm" else adpcm_decode
    _sr, samples = dec(payload)
    return len(samples), sum(abs(s) for s in samples)


def codec_dispatch_stats(batches: Iterator[pd.DataFrame]) \
        -> Iterator[pd.DataFrame]:
    """Arrow kernel: sniff -> route -> decode -> unified stats row.
    Any sniff/decode ValueError (wrong magic, corrupt stream,
    truncation) degrades to an ok=false row with a null kind — one
    poisoned payload never kills the batch."""
    for pdf in batches:
        out: dict[str, list] = {k: [] for k in (
            "media_id", "kind", "n_units", "checksum", "ok")}
        for mid, payload in zip(pdf["media_id"], pdf["payload"]):
            out["media_id"].append(mid)
            try:
                payload = bytes(payload)
                kind = sniff_media_kind(payload)
                n_units, checksum = _mix_decode(kind, payload)
                out["kind"].append(kind)
                out["n_units"].append(n_units)
                out["checksum"].append(checksum)
                out["ok"].append(True)
            except ValueError:
                out["kind"].append(None)
                out["n_units"].append(None)
                out["checksum"].append(None)
                out["ok"].append(False)
        yield pd.DataFrame({
            "media_id": pd.Series(out["media_id"], dtype="int64"),
            "kind": pd.Series(out["kind"], dtype="object"),
            "n_units": pd.Series(out["n_units"], dtype="Int32"),
            "checksum": pd.Series(out["checksum"], dtype="Int64"),
            "ok": pd.Series(out["ok"], dtype="bool"),
        })


def make_mixed_media(batches: Iterator[pd.DataFrame]) \
        -> Iterator[pd.DataFrame]:
    """Arrow ENCODER kernel: media_id -> one of the four real formats
    by id % 4 (0 png, 1 gif, 2 pcm wav, 3 ima-adpcm), each with a
    closed-form content generator so the oracle recomputes the
    decoded stats per format. Every MIX_POISON_EVERY-th id gets its
    first magic byte flipped -> unknown container -> ok=false."""
    for pdf in batches:
        payloads = []
        for mid in pdf["media_id"]:
            d = int(mid)
            f = d % 4
            if f == 0:
                raw = bytes((d * (j + 1)) % 256
                            for j in range(MIX_PNG_W * MIX_PNG_H * 3))
                media = png_encode(raw, MIX_PNG_W, MIX_PNG_H)
            elif f == 1:
                raw = bytes((d * (j + 1)) % 256
                            for j in range(MIX_GIF_W * MIX_GIF_H))
                media = gif_encode_gray(raw, MIX_GIF_W, MIX_GIF_H)
            elif f == 2:
                samples = [((d * (j + 3)) % 4001) - 2000
                           for j in range(MIX_WAV_N)]
                media = wav_encode(samples, WAV_SR)
            else:
                samples = [adpcm_block_start(d, b) + j
                           for b in range(MIX_ADPCM_BLOCKS)
                           for j in range(ADPCM_SPB)]
                media = adpcm_encode(samples, ADPCM_SR)
            if d % MIX_POISON_EVERY == 0:
                media = bytes([media[0] ^ 0xFF]) + media[1:]
            payloads.append(media)
        yield pd.DataFrame({
            "media_id": pdf["media_id"].astype("int64"),
            "payload": payloads,
        })


DHASH_SCHEMA = "media_id bigint, dhash bigint, ok boolean"


def decode_ppm_dhash(batches: "Iterator[pd.DataFrame]") \
        -> "Iterator[pd.DataFrame]":
    """mapInPandas kernel: real PPM decode -> perceptual difference
    hash (dHash). Grayscale each pixel with the exact integer mean
    (r+g+b)//3, then one bit per horizontally adjacent pair —
    1 iff left > right — packed row-major, MSB first. On the 4x2
    raster that is (W-1)*H = 6 bits; a production raster resizes to
    9x8 for the canonical 64-bit dHash, but the pipeline shape
    (decode -> integer gray -> neighbor compare -> pack) is identical
    and every step here is oracle-recomputable from the pixel
    generator formula. Malformed payloads -> ok=false, null hash."""
    for pdf in batches:
        ids, hashes, oks = [], [], []
        for mid, payload in zip(pdf["media_id"], pdf["payload"]):
            ids.append(mid)
            try:
                w, h, pix = decode_ppm(bytes(payload))
                gray = [(pix[3 * p] + pix[3 * p + 1] + pix[3 * p + 2]) // 3
                        for p in range(w * h)]
                bits = 0
                for y in range(h):
                    for x in range(w - 1):
                        bits = (bits << 1) | (
                            1 if gray[y * w + x] > gray[y * w + x + 1]
                            else 0)
                hashes.append(bits)
                oks.append(True)
            except ValueError:
                hashes.append(None)
                oks.append(False)
        yield pd.DataFrame({
            "media_id": pd.Series(ids, dtype="int64"),
            "dhash": pd.Series(hashes, dtype="Int64"),
            "ok": pd.Series(oks, dtype="bool"),
        })


# --- real compressed decode #2: baseline JPEG (grayscale, from scratch) ---
# Sequential-DCT baseline JPEG per ITU-T T.81: Annex K.1 luminance
# quantization, K.3 standard Huffman tables, one 8-bit component (no
# chroma, hence no subsampling ambiguity and no YCbCr rounding).
# The encoder exists to build REAL fixtures; the decoder is the
# production-shaped artifact (full marker walk, entropy decode with
# byte-stuffing, DC prediction, dequantize, IDCT).

JPEG_W, JPEG_H = 16, 16           # 2x2 MCUs of 8x8
JPEG_POISON_EVERY = 101

_JPEG_QT = [                       # Annex K.1 luminance, row-major
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]

_JPEG_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_JPEG_DC_VALS = list(range(12))
_JPEG_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_JPEG_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _jpeg_zigzag() -> list[int]:
    """Zigzag position -> row-major index (generated, not transcribed:
    diagonal s runs (0,s)..(s,0), direction alternating by parity)."""
    order = []
    for s in range(15):
        ij = [(i, s - i) for i in range(s + 1)]
        if s % 2 == 0:
            ij.reverse()          # even diagonals walk up-right
        order += [i * 8 + j for i, j in ij if i < 8 and j < 8]
    return order


_ZZ = _jpeg_zigzag()


def _dct_mat():
    import numpy as np

    c = np.zeros((8, 8))
    for u in range(8):
        for x in range(8):
            a = (1 / 2 ** 0.5) if u == 0 else 1.0
            c[u, x] = 0.5 * a * np.cos((2 * x + 1) * u * np.pi / 16)
    return c


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman: symbol -> (code, length)."""
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)    # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


def _mag_bits(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: value -> (category size, appended bits)."""
    if v == 0:
        return 0, 0
    size = abs(v).bit_length()
    return size, (v if v >= 0 else v + (1 << size) - 1)


def jpeg_encode_gray(raw: bytes, width: int, height: int) -> bytes:
    """Baseline sequential-DCT JPEG encoder, single 8-bit grayscale
    component (fixture builder for the decoder below). Dimensions must
    be multiples of 8 (no edge-replication logic to keep the fixture
    exactly analyzable)."""
    import numpy as np

    if width % 8 or height % 8 or len(raw) != width * height:
        raise ValueError("gray raster with 8-aligned dims required")
    C = _dct_mat()
    q = np.array(_JPEG_QT, dtype=float).reshape(8, 8)
    dc_codes = _huff_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _huff_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)
    img = np.frombuffer(raw, dtype=np.uint8).reshape(height, width)

    w = _BitWriter()
    prev_dc = 0
    for by in range(height // 8):
        for bx in range(width // 8):
            block = img[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8].astype(float)
            coef = C @ (block - 128.0) @ C.T
            qc = np.rint(coef / q).astype(int)
            zz = [int(qc.flat[_ZZ[k]]) for k in range(64)]
            size, bits = _mag_bits(zz[0] - prev_dc)
            prev_dc = zz[0]
            code, length = dc_codes[size]
            w.write(code, length)
            if size:
                w.write(bits, size)
            run = 0
            last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
            for k in range(1, last_nz + 1):
                if zz[k] == 0:
                    run += 1
                    continue
                while run > 15:
                    zc, zl = ac_codes[0xF0]   # ZRL
                    w.write(zc, zl)
                    run -= 16
                size, bits = _mag_bits(zz[k])
                code, length = ac_codes[(run << 4) | size]
                w.write(code, length)
                w.write(bits, size)
                run = 0
            if last_nz < 63:
                ec, el = ac_codes[0x00]       # EOB
                w.write(ec, el)
    w.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") \
            + payload

    dqt = seg(0xDB, bytes([0x00]) + bytes(_JPEG_QT[_ZZ[k]] for k in range(64)))
    sof = seg(0xC0, bytes([8]) + height.to_bytes(2, "big")
              + width.to_bytes(2, "big") + bytes([1, 1, 0x11, 0]))
    dht = seg(0xC4, bytes([0x00]) + bytes(_JPEG_DC_BITS)
              + bytes(_JPEG_DC_VALS)) \
        + seg(0xC4, bytes([0x10]) + bytes(_JPEG_AC_BITS)
              + bytes(_JPEG_AC_VALS))
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return (b"\xff\xd8" + dqt + sof + dht + sos + bytes(w.out)
            + b"\xff\xd9")


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated entropy stream")
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.data):
                raise ValueError("truncated entropy stream")
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2              # stuffed 0xFF data byte
            else:
                raise ValueError("marker inside entropy stream")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _huff_decode_tables(bits: list[int], vals: list[int]) \
        -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _read_symbol(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, size: int) -> int:
    return v if size == 0 or v >= (1 << (size - 1)) else v - (1 << size) + 1


def jpeg_decode_gray(data: bytes) -> tuple[int, int, bytes]:
    """Baseline JPEG decoder, from scratch: full marker walk (skips
    APPn/COM, rejects progressive/multi-component), DQT/DHT table
    registry, entropy decode with byte-stuffing and DC prediction,
    dequantize, inverse zigzag, float IDCT, level shift + clamp.
    Raises ValueError on malformed/truncated/unsupported payloads —
    the decode_real kernel maps that to ok=false rows."""
    import numpy as np

    if data[:2] != b"\xff\xd8":
        raise ValueError("missing SOI")
    pos = 2
    qts: dict[int, list[int]] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    width = height = None
    comp = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("truncated marker stream")
        if data[pos] != 0xFF:
            raise ValueError("marker sync lost")
        marker = data[pos + 1]
        if marker == 0xD9:
            raise ValueError("EOI before scan data")
        seglen = int.from_bytes(data[pos + 2:pos + 4], "big")
        body = data[pos + 4:pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated segment")
        if marker == 0xDB:
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                if b + 65 > len(body):
                    raise ValueError("short DQT")
                zz = list(body[b + 1:b + 65])
                tab = [0] * 64
                for k in range(64):
                    tab[_ZZ[k]] = zz[k]
                qts[tq] = tab
                b += 65
        elif marker == 0xC4:
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0x0F
                bits = list(body[b + 1:b + 17])
                n = sum(bits)
                vals = list(body[b + 17:b + 17 + n])
                if len(bits) != 16 or len(vals) != n:
                    raise ValueError("short DHT")
                tab = _huff_decode_tables(bits, vals)
                (dc_tabs if tc == 0 else ac_tabs)[th] = tab
                b += 17 + n
        elif marker == 0xC0:
            if len(body) < 9:
                raise ValueError("short SOF body")
            if body[0] != 8:
                raise ValueError("only 8-bit precision supported")
            height = int.from_bytes(body[1:3], "big")
            width = int.from_bytes(body[3:5], "big")
            if body[5] != 1:
                raise ValueError("only single-component (gray) supported")
            if body[7] != 0x11:
                raise ValueError("subsampled gray is invalid")
            comp = {"id": body[6], "tq": body[8]}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline SOF unsupported")
        elif marker == 0xDA:
            if comp is None or width is None:
                raise ValueError("SOS before SOF")
            if len(body) < 6:
                raise ValueError("short SOS body")
            if body[0] != 1:
                raise ValueError("scan component count mismatch")
            td, ta = body[2] >> 4, body[2] & 0x0F
            if td not in dc_tabs or ta not in ac_tabs \
                    or comp["tq"] not in qts:
                raise ValueError("scan references missing table")
            pos = pos + 2 + seglen
            break
        # APPn / COM / DRI etc.: skip (DRI without RSTn use is inert)
        pos = pos + 2 + seglen

    C = _dct_mat()
    q = np.array(qts[comp["tq"]], dtype=float).reshape(8, 8)
    dc_t, ac_t = dc_tabs[td], ac_tabs[ta]
    if width % 8 or height % 8:
        raise ValueError("non-8-aligned dims unsupported (no edge pad)")
    r = _BitReader(data, pos)
    img = np.zeros((height, width), dtype=np.uint8)
    prev_dc = 0
    for by in range(height // 8):
        for bx in range(width // 8):
            zz = [0] * 64
            size = _read_symbol(r, dc_t)
            diff = _extend(r.bits(size), size) if size else 0
            prev_dc += diff
            zz[0] = prev_dc
            k = 1
            while k < 64:
                sym = _read_symbol(r, ac_t)
                if sym == 0x00:          # EOB
                    break
                run, size = sym >> 4, sym & 0x0F
                if size == 0:
                    if run != 15:
                        raise ValueError("invalid AC symbol")
                    k += 16              # ZRL
                    continue
                k += run
                if k > 63:
                    raise ValueError("AC run past block end")
                zz[k] = _extend(r.bits(size), size)
                k += 1
            coef = np.zeros(64)
            for k in range(64):
                coef[_ZZ[k]] = zz[k]
            block = C.T @ (coef.reshape(8, 8) * q) @ C
            px = np.clip(np.rint(block) + 128, 0, 255).astype(np.uint8)
            img[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = px
    return width, height, bytes(img.tobytes())


def jpeg_block_value(media_id: int, bx: int, by: int) -> int:
    """The fixture generator: 8x8 block (bx, by) of media row
    `media_id` is the constant EVEN value below. Even matters: the
    block's only nonzero DCT coefficient is DC = 8*(v-128), the DC
    quantizer is 16, and (v-128) even makes quantization EXACT — so
    the lossy codec round-trips these rasters bit-perfectly and the
    SQL oracle can recompute pixel sums in closed form."""
    return 2 * ((media_id * 7 + bx + 3 * by) % 128)


def make_jpeg_media(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: media_id -> REAL baseline-JPEG payload
    (flat 8x8 blocks from jpeg_block_value). Every JPEG_POISON_EVERY-th
    id ships only the first half of its payload — a mid-scan
    truncation the decoder must survive as ok=false."""
    for pdf in batches:
        ids, payloads = [], []
        for mid in pdf["media_id"]:
            raw = bytearray(JPEG_W * JPEG_H)
            for by in range(JPEG_H // 8):
                for bx in range(JPEG_W // 8):
                    v = jpeg_block_value(int(mid), bx, by)
                    for y in range(8):
                        row = (by * 8 + y) * JPEG_W + bx * 8
                        raw[row:row + 8] = bytes([v] * 8)
            enc = jpeg_encode_gray(bytes(raw), JPEG_W, JPEG_H)
            if mid % JPEG_POISON_EVERY == 0:
                enc = enc[:len(enc) // 2]
            ids.append(mid)
            payloads.append(enc)
        yield pd.DataFrame({
            "media_id": pd.Series(ids, dtype="int64"),
            "payload": pd.Series(payloads, dtype="object"),
        })


# --- real compressed decode #3: GIF87a / LZW (from scratch) -------------
# Third compression family beside PNG's DEFLATE and JPEG's DCT+Huffman:
# dictionary coding. Grayscale-identity palette, one image block, no
# extensions — the minimal valid GIF87a a web corpus is full of.

GIF_W, GIF_H = 8, 8
GIF_POISON_EVERY = 103


class _LsbBitWriter:
    """GIF packs LZW codes least-significant-bit first."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def _lzw_encode(data: bytes, min_code_size: int = 8) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    w = _LsbBitWriter()
    w.write(clear, width)
    cur = b""
    for byte in data:
        nxt = cur + bytes([byte])
        if nxt in table:
            cur = nxt
            continue
        w.write(table[cur], width)
        table[nxt] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        elif next_code >= 4096:
            w.write(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        cur = bytes([byte])
    if cur:
        w.write(table[cur], width)
    w.write(eoi, width)
    return w.flush()


def _lzw_decode(data: bytes, min_code_size: int, expect: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    pos = acc = nbits = 0
    width = min_code_size + 1

    def read_code() -> int:
        nonlocal pos, acc, nbits
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated LZW stream")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return code

    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    while True:
        code = read_code()
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("bad first LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):          # the cScSc case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("LZW code out of range")
        out += entry
        prev = entry
        if len(table) >= (1 << width) and width < 12:
            width += 1
        if len(out) > expect:
            raise ValueError("LZW output overruns raster")
    if len(out) != expect:
        raise ValueError("LZW output short of raster")
    return bytes(out)


def gif_encode_gray(raw: bytes, width: int, height: int) -> bytes:
    """Minimal valid GIF87a: grayscale-identity global palette (256
    entries i,i,i), one image block, LZW-compressed index stream in
    255-byte sub-blocks."""
    if len(raw) != width * height:
        raise ValueError("raster size mismatch")
    out = bytearray(b"GIF87a")
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    out += bytes([0xF7, 0, 0])           # GCT present, 256 entries
    for i in range(256):
        out += bytes([i, i, i])
    out += b"\x2c" + (0).to_bytes(2, "little") * 2
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    out += bytes([0x00, 8])              # no LCT; LZW min code size 8
    lzw = _lzw_encode(raw, 8)
    for i in range(0, len(lzw), 255):
        block = lzw[i:i + 255]
        out += bytes([len(block)]) + block
    out += b"\x00\x3b"
    return bytes(out)


def gif_decode_gray(data: bytes) -> tuple[int, int, bytes]:
    """From-scratch GIF87a/89a decoder for the subset above: header +
    screen descriptor, global color table walk, skips 0x21 extension
    blocks, one image descriptor (no interlace, no local table), full
    LZW decode (variable code width, clear/EOI, the cScSc case),
    gray value = palette red channel. Raises ValueError on anything
    malformed or truncated."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    if len(data) < 13:
        raise ValueError("truncated screen descriptor")
    packed = data[10]
    pos = 13
    palette = b""
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        palette = data[pos:pos + 3 * n]
        if len(palette) != 3 * n:
            raise ValueError("truncated color table")
        pos += 3 * n
    while True:
        if pos >= len(data):
            raise ValueError("missing image block")
        b = data[pos]
        if b == 0x21:                     # extension: label + sub-blocks
            pos += 2
            while True:
                if pos >= len(data):
                    raise ValueError("truncated extension")
                sz = data[pos]
                pos += 1 + sz
                if sz == 0:
                    break
        elif b == 0x2C:
            break
        else:
            raise ValueError("unexpected block type")
    if pos + 10 > len(data):
        raise ValueError("truncated image descriptor")
    width = int.from_bytes(data[pos + 5:pos + 7], "little")
    height = int.from_bytes(data[pos + 7:pos + 9], "little")
    ipacked = data[pos + 9]
    pos += 10
    if ipacked & 0x40:
        raise ValueError("interlaced GIF unsupported")
    if ipacked & 0x80:
        n = 2 << (ipacked & 0x07)
        palette = data[pos:pos + 3 * n]
        if len(palette) != 3 * n:
            raise ValueError("truncated local color table")
        pos += 3 * n
    if not palette:
        raise ValueError("no color table")
    if pos >= len(data):
        raise ValueError("missing LZW code size")
    min_code = data[pos]
    pos += 1
    if not 2 <= min_code <= 8:
        raise ValueError("bad LZW minimum code size")
    lzw = bytearray()
    while True:
        if pos >= len(data):
            raise ValueError("truncated sub-block chain")
        sz = data[pos]
        pos += 1
        if sz == 0:
            break
        block = data[pos:pos + sz]
        if len(block) != sz:
            raise ValueError("truncated sub-block")
        lzw += block
        pos += sz
    idx = _lzw_decode(bytes(lzw), min_code, width * height)
    gray = bytes(palette[3 * i] for i in idx)
    return width, height, gray


def make_gif_media(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: media_id -> REAL GIF87a payload whose raster
    byte j is (media_id*(j+1)) % 256 (the mm5 closed form, so the SQL
    oracle recomputes every pixel). Every GIF_POISON_EVERY-th id ships
    half its payload -> ok=false."""
    for pdf in batches:
        ids, payloads = [], []
        for mid in pdf["media_id"]:
            raw = bytes((int(mid) * (j + 1)) % 256
                        for j in range(GIF_W * GIF_H))
            enc = gif_encode_gray(raw, GIF_W, GIF_H)
            if mid % GIF_POISON_EVERY == 0:
                enc = enc[:len(enc) // 2]
            ids.append(mid)
            payloads.append(enc)
        yield pd.DataFrame({
            "media_id": pd.Series(ids, dtype="int64"),
            "payload": pd.Series(payloads, dtype="object"),
        })


# --- real VIDEO container: MJPEG-in-AVI (from scratch) ------------------
# The video modality done for real rather than via the frame-sampler
# stub (mm2): an AVI is a RIFF form ('AVI ') whose 'movi' list holds one
# '00dc' chunk per frame, and with the 'MJPG' handler each chunk is a
# complete baseline JPEG — so the container walk composes with the
# existing from-scratch JPEG codec into genuine video frame decode.

AVI_W, AVI_H = 16, 16             # each frame: 2x2 MCUs of 8x8
AVI_N_FRAMES = 6
AVI_FRAME_STRIDE = 2              # decode frames 0, 2, 4
AVI_POISON_EVERY = 109
AVI_US_PER_FRAME = 40_000         # 25 fps

AVI_STATS_SCHEMA = (
    "media_id bigint, frame_idx int, width int, height int, "
    "sum_px bigint, ok boolean"
)


def _riff_chunk(fourcc: bytes, body: bytes) -> bytes:
    """RIFF chunk: fourcc + little-endian size + body, word-aligned
    (a pad byte after odd-sized bodies, not counted in size)."""
    out = fourcc + len(body).to_bytes(4, "little") + body
    if len(body) % 2:
        out += b"\x00"
    return out


def avi_encode_mjpeg(frames: list[bytes], width: int, height: int,
                     us_per_frame: int = AVI_US_PER_FRAME,
                     declared_frames: int | None = None) -> bytes:
    """Minimal valid AVI (RIFF 'AVI ') holding one MJPG video stream:
    LIST hdrl (avih + LIST strl (strh 'vids'/'MJPG' + strf
    BITMAPINFOHEADER)) then LIST movi with one '00dc' chunk per frame.
    `declared_frames` overrides the avih/strh frame counts (the mm13
    poison: a count that disagrees with the movi payload must be
    rejected by the decoder, not silently played)."""
    import struct

    n = len(frames) if declared_frames is None else declared_frames
    sugg = max((len(f) for f in frames), default=0)
    avih = struct.pack(
        "<IIIIIIIIII4I", us_per_frame, 0, 0, 0, n, 0, 1, sugg,
        width, height, 0, 0, 0, 0)
    strh = struct.pack(
        "<4s4sIHHIIIIIIiI4h", b"vids", b"MJPG", 0, 0, 0, 0, 1, 25, 0,
        n, sugg, -1, 0, 0, 0, width, height)
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0)
    strl = _riff_chunk(b"LIST", b"strl"
                       + _riff_chunk(b"strh", strh)
                       + _riff_chunk(b"strf", strf))
    hdrl = _riff_chunk(b"LIST", b"hdrl"
                       + _riff_chunk(b"avih", avih) + strl)
    movi_body = b"movi" + b"".join(
        _riff_chunk(b"00dc", f) for f in frames)
    movi = _riff_chunk(b"LIST", movi_body)
    return _riff_chunk(b"RIFF", b"AVI " + hdrl + movi)


def avi_parse_mjpeg(data: bytes) -> tuple[int, int, list[bytes]]:
    """From-scratch AVI container parser for the MJPG subset: verifies
    the RIFF/'AVI ' envelope, walks the word-aligned chunk stream,
    reads avih (declared frame count + dimensions) and the stream
    headers (fccType must be 'vids' with an MJPG handler/compression),
    then collects the '00dc' frame payloads from the movi list. Raises
    ValueError on a malformed/truncated container or when the declared
    frame count disagrees with the movi payload — a real demuxer must
    reject a lying header, not play garbage. Returns (width, height,
    frames) with each frame a complete JPEG byte string."""
    import struct

    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF AVI payload")
    riff_size = int.from_bytes(data[4:8], "little")
    if 8 + riff_size > len(data):
        raise ValueError("truncated RIFF envelope")

    def walk(buf: bytes):
        pos = 0
        while pos < len(buf):
            if pos + 8 > len(buf):
                raise ValueError("truncated chunk header")
            fourcc = buf[pos:pos + 4]
            size = int.from_bytes(buf[pos + 4:pos + 8], "little")
            body = buf[pos + 8:pos + 8 + size]
            if len(body) != size:
                raise ValueError("truncated chunk body")
            yield fourcc, body
            pos += 8 + size + (size % 2)

    declared = None
    width = height = None
    stream_ok = False
    frames: list[bytes] = []
    for fourcc, body in walk(data[12:8 + riff_size]):
        if fourcc != b"LIST":
            continue                      # idx1 / JUNK etc.
        ltype, lbody = body[:4], body[4:]
        if ltype == b"hdrl":
            for sub, sbody in walk(lbody):
                if sub == b"avih":
                    if len(sbody) < 40:
                        raise ValueError("short avih header")
                    declared = struct.unpack_from("<I", sbody, 16)[0]
                    streams = struct.unpack_from("<I", sbody, 24)[0]
                    width = struct.unpack_from("<i", sbody, 32)[0]
                    height = struct.unpack_from("<i", sbody, 36)[0]
                    if streams != 1:
                        raise ValueError("exactly one stream supported")
                elif sub == b"LIST" and sbody[:4] == b"strl":
                    for ss, ssb in walk(sbody[4:]):
                        if ss == b"strh":
                            if len(ssb) < 8:
                                raise ValueError("short strh header")
                            if ssb[:4] != b"vids" or ssb[4:8] != b"MJPG":
                                raise ValueError(
                                    "not an MJPG video stream")
                            stream_ok = True
                        elif ss == b"strf":
                            if len(ssb) < 20:
                                raise ValueError("short strf header")
                            if ssb[16:20] != b"MJPG":
                                raise ValueError(
                                    "strf compression is not MJPG")
        elif ltype == b"movi":
            if declared is None or not stream_ok:
                raise ValueError("movi before stream headers")
            for sub, sbody in walk(lbody):
                if sub == b"00dc":
                    frames.append(sbody)
    if declared is None:
        raise ValueError("no avih header")
    if len(frames) != declared:
        raise ValueError(
            f"declared {declared} frames, movi holds {len(frames)}")
    return width, height, frames


def avi_frame_value(media_id: int, frame: int, bx: int, by: int) -> int:
    """Per-frame flat 8x8 block value — jpeg_block_value with the
    frame index mixed in. Even (the 2* factor), so every frame
    round-trips the lossy JPEG codec bit-exactly (the mm9 DC-exact
    quantization proof in jpeg_block_value applies per frame)."""
    return 2 * ((media_id * 7 + frame * 11 + bx + 3 * by) % 128)


def make_avi_media(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: media_id -> REAL MJPEG AVI payload of
    AVI_N_FRAMES genuine baseline-JPEG frames (flat 8x8 blocks from
    avi_frame_value, exact-roundtrip rasters). Every
    AVI_POISON_EVERY-th id declares ONE MORE frame in avih/strh than
    the movi list holds — a lying container header the demuxer must
    reject as ok=false."""
    for pdf in batches:
        ids, payloads = [], []
        for mid in pdf["media_id"]:
            frames = []
            for f in range(AVI_N_FRAMES):
                raw = bytearray(AVI_W * AVI_H)
                for by in range(AVI_H // 8):
                    for bx in range(AVI_W // 8):
                        v = avi_frame_value(int(mid), f, bx, by)
                        for y in range(8):
                            row = (by * 8 + y) * AVI_W + bx * 8
                            raw[row:row + 8] = bytes([v] * 8)
                frames.append(jpeg_encode_gray(bytes(raw), AVI_W, AVI_H))
            declared = (len(frames) + 1
                        if mid % AVI_POISON_EVERY == 0 else None)
            ids.append(mid)
            payloads.append(avi_encode_mjpeg(
                frames, AVI_W, AVI_H, declared_frames=declared))
        yield pd.DataFrame({
            "media_id": pd.Series(ids, dtype="int64"),
            "payload": pd.Series(payloads, dtype="object"),
        })


def decode_avi_frames(decoder=None, stride: int = AVI_FRAME_STRIDE):
    """Video frame-sample-and-decode kernel factory through the
    INJECTABLE codec slot (decode_real's contract, lifted to
    containers): walk the AVI, take every `stride`-th frame, decode it
    with the injected ``bytes -> (width, height, pixels)`` JPEG
    decoder, and emit one AVI_STATS_SCHEMA row per sampled frame — the
    1->N fan-out happens inside the Arrow batch (the mm2 shape, now
    with a real demuxer + codec). A ValueError or IndexError anywhere
    in the container walk or a frame decode degrades THAT media row to
    a single ok=false row; it never kills the task. Raises only when
    no decoder is injected."""
    if decoder is None:
        raise NotImplementedError(
            "no frame decoder injected: pass decode_avi_frames("
            "decoder=...) a bytes -> (width, height, pixels) callable "
            "— e.g. jpeg_decode_gray, or a PIL/opencv adapter in a "
            "codec-equipped deployment"
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fis, ws, hs, sums, oks = [], [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    _, _, frames = avi_parse_mjpeg(bytes(payload))
                    rows = []
                    for fi in range(0, len(frames), stride):
                        w, h, pix = decoder(frames[fi])
                        rows.append((fi, w, h, sum(pix)))
                except (ValueError, IndexError):
                    ids.append(mid)
                    fis.append(None)
                    ws.append(None)
                    hs.append(None)
                    sums.append(None)
                    oks.append(False)
                    continue
                for fi, w, h, s in rows:
                    ids.append(mid)
                    fis.append(fi)
                    ws.append(w)
                    hs.append(h)
                    sums.append(s)
                    oks.append(True)
            yield pd.DataFrame({
                "media_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(fis, dtype="Int32"),
                "width": pd.Series(ws, dtype="Int32"),
                "height": pd.Series(hs, dtype="Int32"),
                "sum_px": pd.Series(sums, dtype="Int64"),
                "ok": pd.Series(oks, dtype="bool"),
            })

    return kernel
