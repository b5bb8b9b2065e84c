import glob
import hashlib
import os

from pyspark.sql import functions as F

from hadoop_20_spark import sources
from hadoop_20_spark.operators import multimodal, pipe, rowops


def test_kv_text_roundtrip(spark, tables, tmp_path):
    path = str(tmp_path / "kv")
    nation = tables["nation"].select("n_nationkey", "n_name")
    sources.write_kv_text(nation, path, "n_nationkey", "n_name")
    back = sources.read_kv_text(spark, path)
    got = {r["key"]: r["value"] for r in back.collect()}
    exp = {str(r["n_nationkey"]): r["n_name"] for r in nation.collect()}
    assert got == exp


def test_kv_text_no_separator_edge(spark, tmp_path):
    # KeyValueLineRecordReader: no tab -> whole line is key, empty value
    p = tmp_path / "lines"
    p.mkdir()
    (p / "part-0.txt").write_text("justakey\nk\tv\n")
    got = {r["key"]: r["value"] for r in sources.read_kv_text(spark, str(p)).collect()}
    assert got == {"justakey": "", "k": "v"}


def test_demux_write_layout(spark, tables, tmp_path):
    out = str(tmp_path / "demux")
    sources.write_demux(tables["events"], out, "event_type")
    dirs = {os.path.basename(d) for d in glob.glob(out + "/event_type=*")}
    types = {r["event_type"] for r in tables["events"].select("event_type").distinct().collect()}
    assert dirs == {f"event_type={t}" for t in types}
    back = spark.read.parquet(out)
    assert back.count() == tables["events"].count()


def test_write_sorted_rowgroup_stats(spark, tables, tmp_path):
    out = str(tmp_path / "sorted")
    li = tables["lineitem"].select("l_orderkey", "l_extendedprice")
    sources.write_sorted(li.coalesce(1), out, "l_orderkey")
    back = spark.read.parquet(out)
    assert back.count() == li.count()


def test_compact_small_files(spark, tables, tmp_path):
    frag = str(tmp_path / "frag")
    tables["orders"].repartition(20).write.parquet(frag)
    assert len(glob.glob(frag + "/part-*")) == 20
    out = str(tmp_path / "compact")
    sources.compact_small_files(spark, frag, out, target_file_mb=128)
    assert len(glob.glob(out + "/part-*")) < 20
    assert spark.read.parquet(out).count() == tables["orders"].count()


def test_pipe_wordcount_matches_native(spark, tables):
    docs = tables["documents"].select("doc_id", "text").limit(50)
    via_pipe = {
        r["token"]: r["token_count"]
        for r in pipe.script_wordcount(spark, docs).collect()
    }
    native = {
        r["token"]: r["token_count"]
        for r in rowops.token_counts(docs, "text").collect()
    }
    assert via_pipe == native


def test_split_kv_multifield_keys(spark):
    df = spark.createDataFrame([("a\tb\tc",), ("nokey",)], ["line"])
    got = {r["key"]: r["value"] for r in pipe.split_kv(df, num_key_fields=2).collect()}
    assert got == {"a\tb": "c", "nokey": ""}


def test_multimodal_features_deterministic(spark, tables):
    media = multimodal.to_media_table(tables["documents"].limit(20), "doc_id", "text")
    feats = multimodal.extract_features(media, fake=True)
    rows = {r["media_id"]: r for r in feats.collect()}
    texts = {r["doc_id"]: r["text"] for r in tables["documents"].limit(20).collect()}
    for mid, r in rows.items():
        payload = texts[mid].encode()
        assert r["n_bytes"] == len(payload)
        assert r["content_md5"] == hashlib.md5(payload).hexdigest()
        w, h, feat = multimodal._decode_bytes(payload, fake=True)
        assert (r["width"], r["height"]) == (w, h)
        assert len(r["feat"]) == 8


def test_multimodal_real_decode_stub_or_pil():
    """fake=False uses PIL when importable, else the marked stub."""
    try:
        import PIL  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False
    if not has_pil:
        try:
            multimodal._decode_bytes(b"xx", fake=False)
            raise AssertionError("expected NotImplementedError")
        except NotImplementedError:
            pass
        return
    # real path: decode a generated 6x3 PNG; 8-dim feature contract holds
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (6, 3), (200, 10, 10)).save(buf, format="PNG")
    w, h, feat = multimodal._decode_bytes(buf.getvalue(), fake=False)
    assert (w, h) == (6, 3)
    assert len(feat) == 8 and all(0.0 <= x <= 1.0 for x in feat)


def test_resize_stub_bounds(spark, tables):
    media = multimodal.to_media_table(tables["documents"].limit(10), "doc_id", "text")
    out = multimodal.resize_stub(media, max_side=128).collect()
    assert all(max(r["width"], r["height"]) <= 128 for r in out)


def test_frame_sample_expansion_bounds(spark, tables):
    from hadoop_20_spark.operators import multimodal

    media = multimodal.to_media_table(tables["documents"].limit(100), "doc_id", "text")
    frames = multimodal.frame_sample(media, stride=2, fake=True)
    rows = frames.collect()
    # 1..8 frames per clip, stride 2 => 1..4 rows per media item
    per_media = {}
    for r in rows:
        per_media.setdefault(r.media_id, []).append(r.frame_idx)
    assert set(per_media) == {r.media_id for r in media.select("media_id").collect()}
    for idxs in per_media.values():
        assert 1 <= len(idxs) <= 4
        assert sorted(idxs) == list(range(0, 2 * len(idxs), 2))


def test_write_named_outputs(spark, tables, tmp_path):
    from pyspark.sql import functions as F
    from hadoop_20_spark import sources

    li = tables["lineitem"].limit(1000)
    paths = sources.write_named_outputs(
        li,
        str(tmp_path / "named"),
        {
            "by_flag": (
                lambda df: df.groupBy("l_returnflag").count(),
                "parquet",
            ),
            "high_value": (
                lambda df: df.filter(F.col("l_extendedprice") > 40000).select(
                    "l_orderkey", "l_extendedprice"
                ),
                "json",
            ),
        },
    )
    flags = spark.read.parquet(paths["by_flag"])
    assert flags.count() == li.select("l_returnflag").distinct().count()
    hv = spark.read.json(paths["high_value"])
    assert hv.count() == li.filter(F.col("l_extendedprice") > 40000).count()


import pytest


@pytest.mark.parametrize("sep", ["|", ".", "'", "::", "\\"])
def test_kv_text_regex_and_quote_separators(spark, tmp_path, sep):
    # Separators are LITERALS: regex metachars ('|', '.'), SQL quotes
    # ("'"), backslash, and multi-char separators must all round-trip.
    p = tmp_path / "sep"
    p.mkdir()
    (p / "part-0.txt").write_text(f"k1{sep}v1\nk2{sep}v2{sep}tail\nplain\n")
    got = {
        r["key"]: r["value"]
        for r in sources.read_kv_text(spark, str(p), separator=sep).collect()
    }
    assert got == {"k1": "v1", "k2": f"v2{sep}tail", "plain": ""}


@pytest.mark.parametrize("sep", ["|", ".", "::"])
def test_split_kv_literal_separator(spark, sep):
    df = spark.createDataFrame([(f"a{sep}b{sep}c",), ("nokey",)], ["line"])
    got = {
        r["key"]: r["value"]
        for r in pipe.split_kv(df, separator=sep, num_key_fields=2).collect()
    }
    assert got == {f"a{sep}b": "c", "nokey": ""}


def test_fs_api_scheme_agnostic(spark, tables, tmp_path):
    # compact/du/list must go through the Hadoop FS API: exercise with
    # explicit file:// URIs (the scheme-resolution path hdfs:// takes).
    frag = f"file://{tmp_path}/frag"
    tables["orders"].repartition(10).write.parquet(frag)
    assert sources.fs_du_bytes(spark, frag) > 0
    listed = sources.fs_list_files(spark, frag)
    assert len([p for p in listed if "part-" in p]) == 10
    assert all(p.startswith("file:") for p in listed)
    out = f"file://{tmp_path}/compact"
    n = sources.compact_small_files(spark, frag, out, target_file_mb=128)
    assert n < 10
    assert spark.read.parquet(out).count() == tables["orders"].count()


def test_distcp_files_preserves_bytes(spark, tables, tmp_path):
    src = f"file://{tmp_path}/src"
    tables["nation"].write.parquet(src)
    dst = f"file://{tmp_path}/dst"
    n = sources.distcp_files(spark, src, dst)
    assert n == len(sources.fs_list_files(spark, src))
    assert sources.fs_du_bytes(spark, dst) == sources.fs_du_bytes(spark, src)
    assert spark.read.parquet(dst).count() == tables["nation"].count()


def _make_ppm(w, h, rgb_rows):
    """rgb_rows: list of h rows, each w (r,g,b) tuples."""
    body = bytes(c for row in rgb_rows for px in row for c in px)
    return b"P6\n# comment\n%d %d\n255\n" % (w, h) + body


def _make_bmp(w, h, rgb_rows):
    """Uncompressed 24-bit bottom-up BMP from top-down rgb rows."""
    import struct

    stride = (w * 3 + 3) & ~3
    body = b""
    for row in reversed(rgb_rows):  # bottom-up storage
        line = bytes(c for (r, g, b) in row for c in (b, g, r))  # BGR
        body += line + b"\x00" * (stride - len(line))
    data_off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", data_off + len(body), 0, 0, data_off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + info + body


def test_builtin_ppm_decode_real_pixels():
    """The dependency-free PPM decoder runs HERE (no PIL): 8x2 image,
    left half black, right half white -> feature cells 0,0,1,1 per row."""
    rows = [[(0, 0, 0)] * 4 + [(255, 255, 255)] * 4 for _ in range(2)]
    w, h, feat = multimodal._decode_bytes(_make_ppm(8, 2, rows), fake=False)
    assert (w, h) == (8, 2)
    assert len(feat) == 8
    assert feat == [0.0, 0.0, 1.0, 1.0, 0.0, 0.0, 1.0, 1.0]


def test_builtin_bmp_decode_real_pixels():
    """BMP path: bottom-up BGR storage with row padding decodes to the
    same top-down RGB pixels as the equivalent PPM."""
    rows = [
        [(255, 0, 0)] * 2 + [(0, 0, 255)] * 2,  # top row: red | blue
        [(0, 255, 0)] * 4,  # bottom row: green
    ]
    w, h, feat = multimodal._decode_bytes(_make_bmp(4, 2, rows), fake=False)
    w2, h2, feat2 = multimodal._decode_bytes(_make_ppm(4, 2, rows), fake=False)
    assert (w, h) == (4, 2)
    # BMP and PPM of the same image must produce identical features
    assert feat == feat2
    # top row: red luma 299/1000, blue luma 114/1000
    assert abs(feat[0] - 0.299 * 255 // 1 / 255) < 0.01
    assert abs(feat[3] - 0.114) < 0.01
    # bottom row: green luma 587/1000
    assert all(abs(f - 0.587) < 0.01 for f in feat[4:])


def _make_png(w, h, rgb_rows, filters=None, alpha=None):
    """Synthesize an 8-bit truecolor PNG with the stdlib only, encoding
    each scanline with a CHOSEN filter type (default: cycle through all
    five) so the decoder's unfiltering logic is genuinely exercised.
    ``alpha``: per-pixel alpha byte → color type 6 (RGBA)."""
    import struct
    import zlib

    bpp = 4 if alpha is not None else 3
    color_type = 6 if alpha is not None else 2

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body))
        )

    raw_rows = []
    for row in rgb_rows:
        line = bytearray()
        for px in row:
            line += bytes(px)
            if alpha is not None:
                line.append(alpha)
        raw_rows.append(bytes(line))
    if filters is None:
        filters = [(y % 5) for y in range(h)]
    stream = bytearray()
    prev = bytes(w * bpp)
    for y, row in enumerate(raw_rows):
        f = filters[y]
        enc = bytearray(row)
        if f == 1:  # Sub: x - left
            for i in range(len(row) - 1, bpp - 1, -1):
                enc[i] = (row[i] - row[i - bpp]) & 0xFF
        elif f == 2:  # Up: x - above
            for i in range(len(row)):
                enc[i] = (row[i] - prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(len(row)):
                left = row[i - bpp] if i >= bpp else 0
                enc[i] = (row[i] - ((left + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(len(row)):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                enc[i] = (row[i] - pred) & 0xFF
        stream.append(f)
        stream += enc
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(stream)))
        + chunk(b"IEND", b"")
    )


def test_builtin_png_decode_all_filters():
    """PNG (the one COMPRESSED built-in format): an image encoded with
    every filter type (None/Sub/Up/Average/Paeth across its 5 rows) must
    decode to the same features as the equivalent uncompressed PPM."""
    rows = [
        [((x * 37 + y * 91) % 256, (x * 11) % 256, (y * 53) % 256) for x in range(8)]
        for y in range(5)
    ]
    w, h, feat = multimodal._decode_bytes(
        _make_png(8, 5, rows, filters=[0, 1, 2, 3, 4]), fake=False
    )
    w2, h2, feat2 = multimodal._decode_bytes(_make_ppm(8, 5, rows), fake=False)
    assert (w, h) == (8, 5) == (w2, h2)
    assert feat == feat2


def test_builtin_png_decode_rgba_and_known_pixels():
    """RGBA (color type 6) decodes with alpha dropped; a half-black /
    half-white image yields the exact 0/1 feature grid (real pixel
    values, not shape-only)."""
    rows = [[(0, 0, 0)] * 4 + [(255, 255, 255)] * 4 for _ in range(2)]
    w, h, feat = multimodal._decode_bytes(
        _make_png(8, 2, rows, alpha=200), fake=False
    )
    assert (w, h) == (8, 2)
    assert feat == [0.0, 0.0, 1.0, 1.0, 0.0, 0.0, 1.0, 1.0]


def test_builtin_png_corrupt_inputs_raise_value_error():
    """Malformed PNGs must fail in the ValueError family at detection,
    like every other decoder — never leak zlib.error or silently
    truncate a chunk whose declared length overruns the payload."""
    import pytest

    rows = [[(10, 20, 30)] * 4 for _ in range(2)]
    good = _make_png(4, 2, rows)
    # 1. oversized declared chunk length (first chunk = IHDR at offset 8)
    bad_len = good[:8] + b"\xff\xff\xff\x00" + good[12:]
    with pytest.raises(ValueError, match="chunk length"):
        multimodal._decode_bytes(bad_len, fake=False)
    # 2. corrupt deflate stream inside a well-framed IDAT
    import struct

    def chunk(ctype, body):
        import zlib as _z

        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", _z.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 4, 2, 8, 2, 0, 0, 0)
    broken = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", b"\x00not-deflate")
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="corrupt IDAT"):
        multimodal._decode_bytes(broken, fake=False)


def test_extract_features_png_through_spark(spark):
    """Real zlib-inflate PNG decode end-to-end in Arrow mapInPandas in
    THIS container (no PIL): asserts decoded dims and pixel values."""
    rows = [[(128, 128, 128)] * 4 for _ in range(2)]
    payload = _make_png(4, 2, rows, filters=[4, 2])
    media = spark.createDataFrame(
        [(1, bytearray(payload), "image/png", ("a.png", None, None))],
        multimodal.MEDIA_SCHEMA,
    )
    out = multimodal.extract_features(media, fake=False).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["width"], r["height"]) == (4, 2)
    assert all(abs(f - 128 / 255) < 0.01 for f in r["feat"])


def test_extract_features_real_decode_through_spark(spark):
    """The real (fake=False) decode path executes end-to-end in
    mapInPandas in THIS container via the built-in PPM decoder."""
    rows = [[(128, 128, 128)] * 4 for _ in range(2)]
    payload = _make_ppm(4, 2, rows)
    media = spark.createDataFrame(
        [(1, bytearray(payload), "image/x-portable-pixmap", ("a.ppm", None, None))],
        multimodal.MEDIA_SCHEMA,
    )
    out = multimodal.extract_features(media, fake=False).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["width"], r["height"]) == (4, 2)
    assert all(abs(f - 128 / 255) < 0.01 for f in r["feat"])


def _make_wav(rate=8000, seconds=0.5, freq=440.0, bits=16, channels=1) -> bytes:
    """Synthesize a PCM sine WAV with the stdlib wave module."""
    import io
    import math
    import struct
    import wave

    n = int(rate * seconds)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(bits // 8)
        w.setframerate(rate)
        frames = bytearray()
        for i in range(n):
            v = math.sin(2 * math.pi * freq * i / rate)
            for _ in range(channels):
                if bits == 16:
                    frames += struct.pack("<h", int(v * 30000))
                else:
                    frames += struct.pack("<B", int(v * 120) + 128)
        w.writeframes(bytes(frames))
    return buf.getvalue()


def test_builtin_wav_decode_real_samples():
    """The dependency-free PCM WAV decoder must parse real RIFF bytes:
    correct rate/count/duration, and the RMS envelope of a constant-
    amplitude sine ~= amp/sqrt(2) in every segment."""
    from hadoop_20_spark.operators.multimodal import _decode_wav

    n_ch, rate, n_samples, dur, feat = _decode_wav(_make_wav())
    assert (n_ch, rate, n_samples) == (1, 8000, 4000)
    assert abs(dur - 0.5) < 1e-9
    expected_rms = (30000 / 32768.0) / (2 ** 0.5)
    for f in feat:
        assert abs(f - expected_rms) < 0.01, feat

    # 8-bit stereo path (downmix keeps the sine, both channels equal)
    n_ch2, rate2, n2, _, feat2 = _decode_wav(
        _make_wav(bits=8, channels=2, seconds=0.25)
    )
    assert (n_ch2, rate2, n2) == (2, 8000, 2000)
    assert abs(feat2[0] - (120 / 128.0) / (2 ** 0.5)) < 0.02, feat2


def test_wav_decode_truncated_data_chunk():
    """A data chunk cut mid-frame (odd byte count) must decode the whole
    frames it has instead of raising from np.frombuffer."""
    from hadoop_20_spark.operators.multimodal import _decode_wav

    import struct

    full = _make_wav(seconds=0.1, channels=2)  # 16-bit stereo
    # rebuild with the data chunk 3 bytes short (mid-frame cut): walk to
    # the data chunk and shrink both its declared size and its body
    pos, out = 12, bytearray(full[:12])
    while pos + 8 <= len(full):
        cid = full[pos : pos + 4]
        (sz,) = struct.unpack_from("<I", full, pos + 4)
        body = full[pos + 8 : pos + 8 + sz]
        if cid == b"data":
            body = body[:-3]
            sz = len(body)
        out += cid + struct.pack("<I", sz) + body
        pos += 8 + struct.unpack_from("<I", full, pos + 4)[0]
    n_ch, rate, n_samples, _, feat = _decode_wav(bytes(out))
    assert (n_ch, rate) == (2, 8000)
    assert n_samples == 800 - 1  # one frame lost to the truncation
    assert len(feat) == 8


def test_extract_audio_features_real_decode_through_spark(spark):
    """Real WAV decode through the Arrow mapInPandas path (fake=False),
    running in this container with no optional deps."""
    from hadoop_20_spark.operators import multimodal

    rows = [
        (1, bytearray(_make_wav(seconds=0.25))),
        (2, bytearray(_make_wav(rate=16000, seconds=0.125, freq=880.0))),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        r["media_id"]: r
        for r in multimodal.extract_audio_features(media, fake=False).collect()
    }
    assert got[1]["sample_rate"] == 8000 and got[1]["n_samples"] == 2000
    assert got[2]["sample_rate"] == 16000 and got[2]["n_samples"] == 2000
    assert abs(got[1]["duration_s"] - 0.25) < 1e-6
    assert len(got[1]["feature"]) == 8


def test_resize_image_real_roundtrip(spark):
    """Real resize path: a 16x8 PNG with a known left/right pattern is
    NN-downscaled to 8x4, re-encoded as PPM, and the output bytes
    decode back to the same pattern at the new dims."""
    rows = [
        [(0, 0, 0)] * 8 + [(255, 255, 255)] * 8 for _ in range(8)
    ]
    payload = _make_png(16, 8, rows, filters=[0, 1, 2, 3, 4, 0, 1, 2])
    media = spark.createDataFrame(
        [(7, bytearray(payload), "image/png", ("a.png", None, None))],
        multimodal.MEDIA_SCHEMA,
    )
    out = multimodal.resize_image(media, max_side=8, fake=False).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["width"], r["height"]) == (8, 4)
    w, h, px = multimodal._decode_ppm_px(bytes(r["payload"]))
    assert (w, h) == (8, 4)
    # left half black, right half white survives the resample exactly
    assert px[:, :4].max() == 0 and px[:, 4:].min() == 255


def test_resize_image_noop_within_bounds(spark):
    """An image already within max_side passes through the real path
    with identical pixel content (re-encoded, dims unchanged)."""
    rows = [[(9, 8, 7)] * 4 for _ in range(3)]
    media = spark.createDataFrame(
        [(1, bytearray(_make_ppm(4, 3, rows)), "image/x-ppm", ("a.ppm", None, None))],
        multimodal.MEDIA_SCHEMA,
    )
    r = multimodal.resize_image(media, max_side=512, fake=False).collect()[0]
    assert (r["width"], r["height"]) == (4, 3)
    w, h, px = multimodal._decode_ppm_px(bytes(r["payload"]))
    assert px.tolist() == [[[9, 8, 7]] * 4] * 3


def test_resize_nn_matches_python_model():
    """NN kernel against a brute pixel-center model on odd sizes."""
    import numpy as np

    px = np.arange(7 * 5 * 3, dtype="uint8").reshape(5, 7, 3)
    small = multimodal._resize_nn(px, 3)
    # longer side 7 -> 3, so h: 5*(3/7) -> 2
    assert small.shape == (2, 3, 3)
    for y in range(2):
        for x in range(3):
            sy = int((y + 0.5) * 5 / 2)
            sx = int((x + 0.5) * 7 / 3)
            assert (small[y, x] == px[sy, sx]).all()


def test_distcp_update_incremental_sync(spark, tmp_path):
    """-update semantics: first run copies everything, second run copies
    nothing (idempotent), a changed-size file is re-copied alone, and
    -delete removes destination extras."""
    import pathlib

    from hadoop_20_spark import sources

    src = tmp_path / "src"
    dst = tmp_path / "dst"
    (src / "sub").mkdir(parents=True)
    (src / "a.txt").write_text("alpha\n")
    (src / "sub" / "b.txt").write_text("bravo bravo\n")

    r1 = sources.distcp_update(spark, str(src), str(dst))
    assert r1 == {"copied": 2, "skipped": 0, "deleted": 0}
    assert (dst / "sub" / "b.txt").read_text() == "bravo bravo\n"

    r2 = sources.distcp_update(spark, str(src), str(dst))
    assert r2 == {"copied": 0, "skipped": 2, "deleted": 0}

    (src / "a.txt").write_text("alpha changed\n")  # size differs
    r3 = sources.distcp_update(spark, str(src), str(dst))
    assert r3 == {"copied": 1, "skipped": 1, "deleted": 0}
    assert (dst / "a.txt").read_text() == "alpha changed\n"

    (dst / "stale.txt").write_text("gone\n")
    r4 = sources.distcp_update(spark, str(src), str(dst), delete_extra=True)
    assert r4 == {"copied": 0, "skipped": 2, "deleted": 1}
    assert not pathlib.Path(dst / "stale.txt").exists()
