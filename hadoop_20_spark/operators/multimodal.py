"""Multimodal (image/audio/video) column plumbing (north-star extension).

Media are opaque ``binary`` columns plus typed metadata structs; all
heavy per-item work (decode, resize, feature-extract, frame-sample) runs
in Arrow-batched ``mapInPandas`` so bytes never round-trip through
driver-side Python row objects.

Decoding: uncompressed PPM (P6), 24-bit uncompressed BMP, and 8-bit
RGB/RGBA non-interlaced PNG (stdlib zlib inflate + full scanline
unfiltering) are decoded by a built-in dependency-free decoder (real
pixels, runs everywhere); any other format goes through PIL when
importable.  Compressed formats
with neither available raise a clearly-marked NotImplementedError;
``fake=True`` substitutes a deterministic md5-derived pseudo-decode for
plumbing tests that don't care about pixels.

Closest reference analog: BytesWritable payloads processed by custom
mappers; C++ pipes (``mapred/pipes/``) for native codecs — superseded by
Arrow batches.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, payload binary, media_type string, "
    "meta struct<filename:string, declared_w:int, declared_h:int>"
)

FEATURE_SCHEMA = (
    "media_id long, media_type string, n_bytes long, content_md5 string, "
    "width int, height int, feat array<float>"
)


def to_media_table(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Build a media-shaped table from any fixture: payload = utf-8 bytes
    of a text column (a stand-in corpus with real binary plumbing)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("image/fake").alias("media_type"),
        F.struct(
            F.concat(F.col(id_col).cast("string"), F.lit(".img")).alias("filename"),
            F.lit(None).cast("int").alias("declared_w"),
            F.lit(None).cast("int").alias("declared_h"),
        ).alias("meta"),
    )


def _pool_feature(px, w: int, h: int) -> list[float]:
    """4x2 box-average grayscale thumbnail in [0,1] from an (h, w, 3)
    uint8 pixel array — the same 8-dim feature shape the PIL path emits
    (grid means instead of PIL's resample kernel; both are deterministic
    per decoder)."""
    import numpy as np

    # integer luma (Rec.601 weights, PIL's L formula)
    luma = (
        px[:, :, 0].astype("uint32") * 299
        + px[:, :, 1].astype("uint32") * 587
        + px[:, :, 2].astype("uint32") * 114
    ) // 1000
    feat = []
    for gy in range(2):
        y0, y1 = gy * h // 2, max((gy + 1) * h // 2, gy * h // 2 + 1)
        for gx in range(4):
            x0, x1 = gx * w // 4, max((gx + 1) * w // 4, gx * w // 4 + 1)
            cell = luma[y0 : max(y1, y0 + 1), x0 : max(x1, x0 + 1)]
            feat.append(float(np.mean(cell)) / 255.0 if cell.size else 0.0)
    return feat


def _decode_ppm(payload: bytes) -> tuple[int, int, list[float]]:
    w, h, px = _decode_ppm_px(payload)
    return w, h, _pool_feature(px, w, h)


def _decode_ppm_px(payload: bytes):
    """Binary PPM (P6): ASCII header (magic, width, height, maxval, with
    ``#`` comments) then raw RGB triples.  No compression, no deps.
    Returns (w, h, (h,w,3) uint8 RGB array)."""
    import numpy as np

    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    pos, vals = 2, []
    while len(vals) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = vals
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    px = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return w, h, px.reshape(h, w, 3)


def _decode_bmp(payload: bytes) -> tuple[int, int, list[float]]:
    w, h, px = _decode_bmp_px(payload)
    return w, h, _pool_feature(px, w, h)


def _decode_bmp_px(payload: bytes):
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER): little-endian header,
    BGR rows padded to 4 bytes, stored bottom-up (top-down when height
    is negative).  No compression, no deps.  Returns (w, h, RGB array)."""
    import struct

    import numpy as np

    if not payload.startswith(b"BM"):
        raise ValueError("not a BMP")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    w, h_raw = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or compression != 0:
        raise ValueError(f"only uncompressed 24-bit BMP (got bpp={bpp})")
    h, bottom_up = abs(h_raw), h_raw > 0
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=data_off
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    # BGR -> RGB
    return w, h, rows[:, :, ::-1]


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _decode_png(payload: bytes) -> tuple[int, int, list[float]]:
    w, h, px = _decode_png_px(payload)
    return w, h, _pool_feature(px, w, h)


def _decode_png_px(payload: bytes):
    """8-bit truecolor PNG (color type 2 RGB / 6 RGBA, no interlace)
    via the stdlib only: chunk walk → concatenated IDAT → zlib inflate →
    per-scanline unfilter (None/Sub/Up/Average/Paeth, RFC 2083 §6) →
    RGB pixels.  The one COMPRESSED image format the built-in decoder
    handles everywhere — PPM/BMP prove the raw path, this proves a real
    inflate+unfilter pipeline with zero dependencies.  Alpha (type 6)
    is dropped, not composited: features come from the color channels."""
    import struct
    import zlib

    import numpy as np

    if not payload.startswith(_PNG_MAGIC):
        raise ValueError("not a PNG")
    pos, ihdr, idat = len(_PNG_MAGIC), None, []
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        if pos + 12 + length > len(payload):
            # A declared length past the buffer would silently truncate
            # the body slice and fail LATER as zlib.error / a bogus
            # short-IDAT — keep malformed input in the ValueError family
            # every other decoder raises, at the point of detection.
            raise ValueError("corrupt PNG: chunk length exceeds payload")
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + CRC
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    w, h, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if bit_depth != 8 or color_type not in (2, 6) or interlace != 0:
        raise ValueError(
            "only 8-bit RGB/RGBA non-interlaced PNG supported "
            f"(depth={bit_depth}, color={color_type}, interlace={interlace})"
        )
    bpp = 4 if color_type == 6 else 3  # bytes per pixel == channels at 8-bit
    stride = w * bpp
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise ValueError(f"corrupt IDAT: {e}") from e
    if len(raw) < h * (stride + 1):
        raise ValueError("truncated IDAT stream")
    out = bytearray(h * stride)
    prev = bytearray(stride)  # virtual zero row above the image
    for y in range(h):
        base = y * (stride + 1)
        ftype = raw[base]
        row = bytearray(raw[base + 1 : base + 1 + stride])
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y * stride : (y + 1) * stride] = row
        prev = row
    px = np.frombuffer(bytes(out), dtype=np.uint8).reshape(h, w, bpp)[:, :, :3]
    return w, h, px


def _builtin_decoder(payload: bytes):
    """Magic-sniff for the formats the built-in decoder handles."""
    if payload.startswith(b"P6"):
        return _decode_ppm
    if payload.startswith(b"BM"):
        return _decode_bmp
    if payload.startswith(_PNG_MAGIC):
        return _decode_png
    return None


def _builtin_pixel_decoder(payload: bytes):
    """Pixel-level twin of _builtin_decoder (for transforms that need
    the raster, not the pooled feature — resize, crops)."""
    if payload.startswith(b"P6"):
        return _decode_ppm_px
    if payload.startswith(b"BM"):
        return _decode_bmp_px
    if payload.startswith(_PNG_MAGIC):
        return _decode_png_px
    return None


def _encode_ppm(px) -> bytes:
    """Re-encode an (h, w, 3) uint8 RGB array as binary PPM (P6) — the
    dependency-free interchange format the decoders round-trip."""
    h, w = px.shape[0], px.shape[1]
    return b"P6\n%d %d\n255\n" % (w, h) + px.astype("uint8").tobytes()


def _real_decoder():
    """PIL-backed image decoder when the library is importable, else
    ``None``.  Cached module-side so executors probe the import once per
    worker process, not once per row."""
    global _REAL_DECODER
    if _REAL_DECODER is not _UNPROBED:
        return _REAL_DECODER
    try:
        import io

        from PIL import Image
    except ImportError:
        _REAL_DECODER = None
        return None

    def decode(payload: bytes) -> tuple[int, int, list[float]]:
        img = Image.open(io.BytesIO(payload))
        img.load()
        w, h = img.size
        # 8-dim feature: 4x2 grayscale thumbnail, [0,1] — the smallest
        # real embedding that exercises the array<float> plumbing.
        feat = [p / 255.0 for p in img.convert("L").resize((4, 2)).getdata()]
        return w, h, feat

    _REAL_DECODER = decode
    return decode


_UNPROBED = object()
_REAL_DECODER = _UNPROBED


def _decode_bytes(payload: bytes, fake: bool) -> tuple[int, int, list[float]]:
    """Decode one media payload → (width, height, feature vector).

    - fake=False → real decode: uncompressed PPM/BMP via the built-in
      dependency-free decoder (runs in this container); other formats
      via PIL when importable (optional dep — not in this container's
      baseline image); otherwise a clearly-marked NotImplementedError;
    - fake=True → deterministic pseudo-decode from md5(payload): width/
      height in [64, 1983], 8-dim feature of bytes/255.
    """
    if not fake:
        builtin = _builtin_decoder(payload)
        if builtin is not None:
            return builtin(payload)
        decode = _real_decoder()
        if decode is None:
            raise NotImplementedError(
                "compressed media codecs not available in this "
                "environment (PIL not importable) and payload is not "
                "PPM/BMP; pass fake=True for the deterministic stub"
            )
        return decode(payload)
    digest = hashlib.md5(payload).digest()
    width = 64 + int.from_bytes(digest[0:2], "big") % 1920
    height = 64 + int.from_bytes(digest[2:4], "big") % 1920
    feat = [b / 255.0 for b in digest[4:12]]
    return width, height, feat


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched decode/feature pass over the media table.

    mapInPandas: each worker receives pandas batches of (media_id,
    payload, ...); per-batch Python loop, zero driver involvement.  At
    100 TB the input should be repartitioned by size (not count) so each
    task holds a bounded byte volume — media rows are wide."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "content_md5": pdf["payload"].map(
                    lambda b: hashlib.md5(bytes(b)).hexdigest()
                ),
            }
            decoded = pdf["payload"].map(lambda b: _decode_bytes(bytes(b), fake))
            out["width"] = decoded.map(lambda d: d[0]).astype("int32")
            out["height"] = decoded.map(lambda d: d[1]).astype("int32")
            out["feat"] = decoded.map(lambda d: d[2])
            yield pd.DataFrame(out)

    return media.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, stride: int = 2, fake: bool = True) -> DataFrame:
    """Video frame-sampling plumbing: treat each payload as a clip whose
    frame count derives deterministically from its content (fake codec),
    emit one row per sampled frame (every ``stride``-th) — a
    row-EXPANDING mapInPandas, the UDTF shape for media.

    Frame identity is md5(payload + b"#" + index), so the whole operator
    is engine-reproducible and oracle-checkable despite the stubbed
    decoder; a real ffmpeg frame extractor replaces ``_n_frames``/the
    digest line and nothing else changes.  At 100 TB the note from
    ``extract_features`` applies doubly: output is ~n_frames× the input
    row count, so budget shuffle partitions on the EXPANDED size."""

    def _n_frames(payload: bytes) -> int:
        return 1 + int(hashlib.md5(payload).hexdigest()[:15], 16) % 8

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, digests = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload)
                for i in range(0, _n_frames(raw), stride):
                    ids.append(mid)
                    idxs.append(i)
                    digests.append(
                        hashlib.md5(raw + b"#" + str(i).encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_md5": digests}
            )

    return media.mapInPandas(run, "media_id long, frame_idx int, frame_md5 string")


def _resize_nn(px, max_side: int):
    """Nearest-neighbor downscale of an (h, w, 3) array so the longer
    side is max_side (no-op if already within bounds).  Pixel-center
    sampling: src index = floor((i + 0.5) * src / dst) — the standard
    NN kernel, deterministic, pure integer index math."""
    import numpy as np

    h, w = px.shape[0], px.shape[1]
    if max(w, h) <= max_side:
        return px
    scale = max_side / max(w, h)
    nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
    xs = ((np.arange(nw) + 0.5) * w / nw).astype("int64").clip(0, w - 1)
    ys = ((np.arange(nh) + 0.5) * h / nh).astype("int64").clip(0, h - 1)
    return px[ys][:, xs]


def resize_image(
    media: DataFrame, max_side: int = 512, fake: bool = True
) -> DataFrame:
    """REAL image resize for the built-in formats (PPM/BMP/PNG →
    nearest-neighbor downscale → PPM re-encode), as Arrow mapInPandas:
    decode the raster, resample, emit the RESIZED BYTES with the new
    dims.  Unsupported formats raise (the decoders' ValueError
    contract); fake=True keeps the metadata-only pseudo-decode path for
    media-shaped tables whose payloads aren't real images (dims scaled,
    payload passed through) — same schema either way, so pipelines swap
    paths with one flag."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payload, widths, heights = [], [], []
            for b in pdf["payload"]:
                raw = bytes(b)
                if fake:
                    w, h, _ = _decode_bytes(raw, fake=True)
                    s = min(1.0, max_side / max(w, h))
                    out_payload.append(raw)
                    widths.append(int(w * s))
                    heights.append(int(h * s))
                else:
                    dec = _builtin_pixel_decoder(raw)
                    if dec is None:
                        raise NotImplementedError(
                            "resize supports the built-in raster formats "
                            "(PPM/BMP/PNG) in this environment"
                        )
                    _, _, px = dec(raw)
                    small = _resize_nn(px, max_side)
                    out_payload.append(_encode_ppm(small))
                    widths.append(small.shape[1])
                    heights.append(small.shape[0])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": out_payload,
                    "width": widths,
                    "height": heights,
                }
            )

    return media.mapInPandas(run, "media_id long, payload binary, width int, height int")


# Back-compat name from when the real path didn't exist; fake=True is
# byte-identical to the old stub behavior.
resize_stub = resize_image


# --- audio: real PCM WAV decode, no deps ------------------------------------

AUDIO_FEATURE_SCHEMA = (
    "media_id long, n_channels int, sample_rate int, n_samples long, "
    "duration_s double, feature array<float>"
)


def _decode_wav(payload: bytes) -> tuple[int, int, int, float, list[float]]:
    """Uncompressed PCM WAV (RIFF/WAVE, 8- or 16-bit): chunk walk for
    ``fmt ``/``data``, little-endian samples, multi-channel downmix,
    8-segment RMS envelope in [0,1] — the audio sibling of the PPM/BMP
    decoders (real bytes, no external codec).  Returns
    (n_channels, sample_rate, n_samples, duration_s, feature)."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt = data = None
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (sz,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_ch, rate = struct.unpack_from("<HHI", fmt, 0)
    (bits,) = struct.unpack_from("<H", fmt, 14)
    if audio_format != 1 or bits not in (8, 16) or n_ch < 1:
        raise ValueError(f"only PCM 8/16-bit supported (fmt={audio_format}, bits={bits})")
    if bits == 16:
        # tolerate a truncated/odd-length data chunk: trim to whole frames
        data = data[: len(data) // (2 * n_ch) * (2 * n_ch)]
        x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    else:  # 8-bit WAV is unsigned, midpoint 128
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    n_samples = len(x) // n_ch
    x = x[: n_samples * n_ch].reshape(n_samples, n_ch).mean(axis=1)
    feat = []
    for s in range(8):
        a = s * n_samples // 8
        b = max((s + 1) * n_samples // 8, a + 1)
        seg = x[a : min(b, n_samples)]
        feat.append(float(np.sqrt(np.mean(seg * seg))) if seg.size else 0.0)
    return n_ch, rate, n_samples, n_samples / rate if rate else 0.0, feat


def extract_audio_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched audio feature pass (same mapInPandas shape as
    ``extract_features``): real decode for PCM WAV payloads (built-in,
    dependency-free), deterministic md5 pseudo-decode otherwise/when
    ``fake=True``.  Per row: channels, sample rate, sample count,
    duration, 8-segment RMS envelope."""

    def decode(b: bytes):
        if not fake and b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            return _decode_wav(b)
        if not fake:
            raise NotImplementedError(
                "compressed audio codecs not available in this environment "
                "and payload is not PCM WAV; pass fake=True for the stub"
            )
        digest = hashlib.md5(b).digest()
        n_ch = 1 + digest[0] % 2
        rate = (8000, 16000, 22050, 44100)[digest[1] % 4]
        n_samples = 1 + int.from_bytes(digest[2:5], "big") % (rate * 4)
        feat = [v / 255.0 for v in digest[5:13]]
        return n_ch, rate, n_samples, n_samples / rate, feat

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = pdf["payload"].map(lambda b: decode(bytes(b)))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_channels": decoded.map(lambda d: d[0]).astype("int32"),
                    "sample_rate": decoded.map(lambda d: d[1]).astype("int32"),
                    "n_samples": decoded.map(lambda d: d[2]).astype("int64"),
                    # raw duration — rounding policy belongs to the query
                    # layer (F.round = half-up, matches SQL ROUND; Python
                    # round here would be banker's and diverge on .5 ties)
                    "duration_s": decoded.map(lambda d: d[3]),
                    "feature": decoded.map(lambda d: d[4]),
                }
            )

    return media.mapInPandas(run, AUDIO_FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# Synthetic gray PPM corpus + decode (round 9: perceptual near-dup drill)
# ---------------------------------------------------------------------------
# Pixel spec (shared with the SQL oracle, which recomputes it
# arithmetically): image content belongs to the doc's BASE group
# (doc_id DIV group), gray value at index i =
#   md5("px:{base}:{i}")[:2 hex]  (+128 mod 256 where the per-DOC noise
#   class md5("noise:{doc_id}:{i}")[:15 hex] % noise_mod == 0)
# so same-base docs are near-duplicates differing in ~1/noise_mod of
# their pixels.  The Spark path must recover these values only through
# a REAL PPM encode -> decode round trip; matching the oracle proves the
# binary path lossless.

_SYNTH_W = 16
_SYNTH_H = 16


def _synth_gray(doc_id: int, base_id: int, noise_mod: int) -> "object":
    import numpy as np

    n = _SYNTH_W * _SYNTH_H
    v = np.empty(n, dtype=np.uint8)
    for i in range(n):
        g = int(hashlib.md5(f"px:{base_id}:{i}".encode()).hexdigest()[:2], 16)
        if int(hashlib.md5(f"noise:{doc_id}:{i}".encode()).hexdigest()[:15], 16) % noise_mod == 0:
            g = (g + 128) % 256
        v[i] = g
    return v


def synth_gray_ppm(
    df: DataFrame, id_col: str = "doc_id", group: int = 3, noise_mod: int = 50
) -> DataFrame:
    """Deterministic 16x16 gray P6 corpus: same-base docs are planted
    near-duplicates.  Arrow-batched generation; payload is a REAL PPM
    (header + raw RGB triples, r=g=b)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for b in batches:
            ids = b[id_col].astype("int64")
            payloads, bases = [], []
            for mid in ids:
                base = int(mid) // group
                v = _synth_gray(int(mid), base, noise_mod)
                rgb = np.repeat(v, 3)
                payloads.append(
                    b"P6\n%d %d\n255\n" % (_SYNTH_W, _SYNTH_H) + rgb.tobytes()
                )
                bases.append(base)
            yield pd.DataFrame(
                {"media_id": ids.values, "base_id": bases, "payload": payloads}
            )

    return df.select(id_col).mapInPandas(
        gen, "media_id long, base_id long, payload binary"
    )


def decode_gray(media: DataFrame) -> DataFrame:
    """Decode PPM payloads back to integer luma arrays (Rec.601 integer
    weights — exact for r=g=b inputs), Arrow-batched."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            grays = []
            for payload in b["payload"]:
                w, h, px = _decode_ppm_px(bytes(payload))
                luma = (
                    px[:, :, 0].astype("uint32") * 299
                    + px[:, :, 1].astype("uint32") * 587
                    + px[:, :, 2].astype("uint32") * 114
                ) // 1000
                grays.append([int(x) for x in luma.reshape(-1)])
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"].values,
                    "base_id": b["base_id"].values,
                    "gray": grays,
                }
            )

    return media.mapInPandas(run, "media_id long, base_id long, gray array<int>")
