"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with decode / feature-extract / resize / frame-sample as
Arrow-batched mapInPandas stages.

The Spark-side plumbing — schema, partitioning, UDF signature, batch
shape — is real and tested. Image decoding is real too:
``extract_features(fake=False)`` decodes bytes via PIL when installed,
falling back to the pure-stdlib PNG decoder in ``imagecodec.py``
(8-bit grey/RGB/RGBA, all five scanline filters). Audio decoding is
real as well: 8/16-bit PCM WAV through the stdlib ``wave`` reader
(``_real_decode_audio``; ``synth_wav`` is its encode twin for
fixtures/oracles). Video decoding is real too: a pure-stdlib
uncompressed-AVI (RIFF) frame extractor (``_real_decode_video``;
``synth_avi`` is its encode twin), pooling luminance over all frames
onto the same 4x4 grid as images. ``fake=True`` remains the
oracle-checkable default — deterministic features derived from the
content digest, so downstream operators (dedup by content hash,
embedding by feature vector) are exercised end-to-end with
DuckDB-reproducible values; the real video path is oracle-checked
through media_video_features (integer-exact pooling makes
``avg(g)/255`` SQL-replayable).

Scale notes: binaries stay in their column through shuffles only when
needed — metadata-only operations prune the binary at the parquet scan
(columnar format = free). Batch size per Arrow chunk is controlled by
``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType,
    StringType, StructField, StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),       # image | audio | video
        StructField("mime", StringType()),
        StructField("width", IntegerType()),      # image/video
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),   # audio/video
        StructField("content", BinaryType()),
    ]
)

FEATURE_DIM = 16


def content_hash(df: DataFrame, out: str = "content_hash") -> DataFrame:
    """Exact binary dedup key — JVM md5 over the binary column, no
    Python in the loop."""
    return df.withColumn(out, F.md5(F.col("content")))


def _fake_decode(data: bytes) -> list[float]:
    """Deterministic stand-in for a real decoder: FEATURE_DIM floats
    derived from the content digest. Stable across processes/runs."""
    dig = hashlib.sha256(data or b"").digest()
    return [b / 255.0 for b in dig[:FEATURE_DIM]]


_POOL_GRID = 4  # FEATURE_DIM == _POOL_GRID ** 2


def _pixels_to_features(width: int, height: int, rows) -> list[float]:
    """Luminance average-pooled to a 4x4 grid -> FEATURE_DIM floats in
    [0, 1]. Identical arithmetic for the PIL and stdlib-PNG decoders so
    features don't depend on which decoder ran."""
    sums = [0.0] * FEATURE_DIM
    counts = [0] * FEATURE_DIM
    for y in range(height):
        gy = min(_POOL_GRID - 1, y * _POOL_GRID // max(height, 1))
        row = rows[y]
        for x in range(width):
            r, g, b = row[x]
            cell = gy * _POOL_GRID + min(_POOL_GRID - 1, x * _POOL_GRID // max(width, 1))
            sums[cell] += (r + g + b) / 3.0
            counts[cell] += 1
    return [s / c / 255.0 if c else 0.0 for s, c in zip(sums, counts)]


def _real_decode_image(data: bytes) -> list[float]:
    """Real byte-level image decode: PIL when importable (any format),
    else the pure-stdlib PNG decoder (pipelines/imagecodec.py)."""
    try:
        import io

        from PIL import Image  # optional, not in every environment

        img = Image.open(io.BytesIO(bytes(data))).convert("RGB")
        w, h = img.size
        px = list(img.getdata())
        rows = [px[y * w : (y + 1) * w] for y in range(h)]
        return _pixels_to_features(w, h, rows)
    except ImportError:
        from social_link_prediction_spark.pipelines import imagecodec

        w, h, rows = imagecodec.decode_png(bytes(data))
        return _pixels_to_features(w, h, rows)


def synth_wav(seed: int, n_samples: int, framerate: int = 8000) -> bytes:
    """Deterministic mono 8-bit PCM WAV fixture: sample i is
    ``(seed*7 + i*13) % 256``. Pure stdlib (wave) — the encode half of
    the audio round-trip test/oracle."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(framerate)
        w.writeframes(bytes((seed * 7 + i * 13) % 256 for i in range(n_samples)))
    return buf.getvalue()


def _real_decode_audio(data: bytes) -> list[float]:
    """Real byte-level audio decode via the stdlib ``wave`` reader
    (8/16-bit PCM WAV, any channel count — channels are averaged).
    Features: normalized [0,1] sample means average-pooled to
    FEATURE_DIM time buckets (bucket = i*FEATURE_DIM//n — the same
    pooling convention as the image grid, so both modalities land in
    one feature space)."""
    import io
    import struct
    import wave

    with wave.open(io.BytesIO(bytes(data)), "rb") as w:
        nch, width, n = w.getnchannels(), w.getsampwidth(), w.getnframes()
        raw = w.readframes(n)
    if width == 1:  # unsigned 8-bit
        vals = [b / 255.0 for b in raw]
    elif width == 2:  # signed 16-bit little-endian
        ints = struct.unpack(f"<{len(raw) // 2}h", raw)
        vals = [(s + 32768) / 65535.0 for s in ints]
    else:
        raise NotImplementedError(f"unsupported WAV sample width: {width}")
    # average channels per frame
    frames = [sum(vals[i : i + nch]) / nch for i in range(0, len(vals), nch)]
    sums, counts = [0.0] * FEATURE_DIM, [0] * FEATURE_DIM
    n_frames = len(frames)
    for i, v in enumerate(frames):
        cell = min(FEATURE_DIM - 1, i * FEATURE_DIM // max(n_frames, 1))
        sums[cell] += v
        counts[cell] += 1
    return [s / c if c else 0.0 for s, c in zip(sums, counts)]


def synth_avi(
    seed: int, n_frames: int, width: int = 8, height: int = 8, fps: int = 10
) -> bytes:
    """Deterministic uncompressed 24-bit AVI fixture (pure stdlib):
    grayscale pixel (x, y) of frame f is
    ``(seed*7 + f*31 + y*13 + x*5) % 256`` in all three channels.
    A minimal but well-formed RIFF: hdrl (avih + one 'vids'/DIB
    stream), movi with one '00db' bottom-up BGR DIB chunk per frame.
    The encode twin of :func:`_real_decode_video` — the same
    round-trip discipline as :func:`synth_wav`."""
    import struct

    stride = (width * 3 + 3) // 4 * 4
    frame_sz = stride * height
    frames = []
    for f in range(n_frames):
        rows = []
        for y_stored in range(height):  # bottom-up storage
            y = height - 1 - y_stored
            row = bytearray()
            for x in range(width):
                g = (seed * 7 + f * 31 + y * 13 + x * 5) % 256
                row += bytes((g, g, g))  # BGR, grayscale
            row += b"\x00" * (stride - len(row))
            rows.append(bytes(row))
        frames.append(b"".join(rows))

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) % 2 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    avih = struct.pack(
        "<14I",
        1_000_000 // fps, frame_sz * fps, 0, 0x10,  # usec/frame, rate, pad, HASINDEX-less flags
        n_frames, 0, 1, frame_sz, width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"DIB " + struct.pack("<10I", 0, 0, 0, 1, fps, 0, n_frames, frame_sz, 0, 0)
        + struct.pack("<4h", 0, 0, width, height)
    )
    strf = struct.pack(
        "<I2i2H2I2i2I", 40, width, height, 1, 24, 0, frame_sz, 0, 0, 0, 0
    )
    strl = chunk(b"LIST", b"strl" + chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih) + strl)
    movi = chunk(b"LIST", b"movi" + b"".join(chunk(b"00db", fr) for fr in frames))
    riff_payload = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_payload)) + riff_payload


def _real_decode_video(data: bytes) -> list[float]:
    """Real byte-level video decode: walk the RIFF/AVI structure
    (pure stdlib), read width/height from 'avih', decode every
    uncompressed '00db' DIB frame (bottom-up BGR, 4-byte row stride),
    and pool luminance over ALL frames jointly onto the 4x4 grid —
    the same cell geometry as the image path, so images and videos
    land in one feature space.

    Accumulation is integer-exact (grayscale (r+g+b)/3 is an exact
    integer; sums of integers are exact doubles), and the feature is
    one ``sum/count`` division then one ``/255`` — so a SQL oracle
    computing ``avg(g)/255`` over the same pixels reproduces the value
    bit-for-bit before the float32 cast."""
    import struct

    data = bytes(data)
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI byte stream")
    width = height = None
    frames: list[bytes] = []

    def walk(buf: bytes, off: int, end: int) -> None:
        nonlocal width, height
        while off + 8 <= end:
            fourcc = buf[off : off + 4]
            (sz,) = struct.unpack("<I", buf[off + 4 : off + 8])
            payload_start = off + 8
            if fourcc == b"LIST":
                walk(buf, payload_start + 4, payload_start + sz)
            elif fourcc == b"avih":
                width, height = struct.unpack(
                    "<2I", buf[payload_start + 32 : payload_start + 40]
                )
            elif fourcc[2:4] in (b"db", b"dc") and sz > 0:
                frames.append(buf[payload_start : payload_start + sz])
            off = payload_start + sz + (sz % 2)

    walk(data, 12, len(data))
    if not frames or not width or not height:
        raise ValueError("no decodable frames in AVI stream")
    stride = (width * 3 + 3) // 4 * 4
    sums = [0.0] * FEATURE_DIM
    counts = [0] * FEATURE_DIM
    for fr in frames:
        for y in range(height):
            s = height - 1 - y  # bottom-up
            gy = min(_POOL_GRID - 1, y * _POOL_GRID // max(height, 1))
            base = s * stride
            for x in range(width):
                b0 = fr[base + x * 3]
                g0 = fr[base + x * 3 + 1]
                r0 = fr[base + x * 3 + 2]
                cell = gy * _POOL_GRID + min(
                    _POOL_GRID - 1, x * _POOL_GRID // max(width, 1)
                )
                sums[cell] += (r0 + g0 + b0) / 3.0
                counts[cell] += 1
    return [s / c / 255.0 if c else 0.0 for s, c in zip(sums, counts)]


def extract_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches). Output
    schema: input minus content, plus features array<float>.

    ``fake=True`` (the oracle-checkable default) derives deterministic
    features from the content digest. ``fake=False`` decodes bytes for
    real on all three modalities: images via PIL or the stdlib PNG
    decoder, audio via the stdlib wave reader, video via the stdlib
    RIFF/AVI frame extractor. The Spark plumbing (Arrow batch shape,
    schema, binary-column pruning) is identical on every path.
    """
    out_schema = StructType(
        [f for f in df.schema.fields if f.name != "content"]
        + [StructField("features", ArrayType(FloatType()))]
    )
    other_cols = [f.name for f in out_schema.fields if f.name != "features"]

    def decode_row(kind: str, content) -> list[float]:
        data = bytes(content) if content is not None else b""
        if fake:
            return _fake_decode(data)
        if kind == "image":
            return _real_decode_image(data)
        if kind == "audio":
            return _real_decode_audio(data)
        if kind == "video":
            return _real_decode_video(data)
        raise NotImplementedError(f"unknown media kind {kind!r}; pass fake=True")

    def batches(it: Iterator) -> Iterator:
        for pdf in it:
            if fake:
                # hot path: one vectorized map, no per-row kind branch
                feats = pdf["content"].map(
                    lambda b: _fake_decode(bytes(b) if b is not None else b"")
                )
            else:
                # `kind` is only consulted by the real-decode path; the
                # fake path must keep accepting content-only frames
                kinds = pdf["kind"] if "kind" in pdf.columns else [None] * len(pdf)
                feats = [decode_row(k, c) for k, c in zip(kinds, pdf["content"])]
            res = pdf[other_cols].copy()
            res["features"] = feats
            yield res

    return df.mapInPandas(batches, schema=out_schema)


def resize_plan(df: DataFrame, max_side: int = 512) -> DataFrame:
    """Resize planning is pure metadata arithmetic (JVM): compute the
    scale factor and output dims without touching bytes; the byte
    transform itself is an extract_features-style mapInPandas stage."""
    scale = F.when(
        F.greatest("width", "height") > max_side,
        max_side / F.greatest("width", "height").cast("double"),
    ).otherwise(F.lit(1.0))
    return (
        df.withColumn("scale", scale)
        .withColumn("out_width", F.floor(F.col("width") * F.col("scale")).cast("int"))
        .withColumn("out_height", F.floor(F.col("height") * F.col("scale")).cast("int"))
    )


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one output row per sampled timestamp
    (explode over a sequence) — the decode of each frame is the
    mapInPandas stage. Metadata explodes JVM-side; bytes are carried
    once per video, not per frame."""
    return df.filter(F.col("kind") == "video").withColumn(
        "frame_ts_ms",
        F.explode(F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))),
    )


def perceptual_ahash(df: DataFrame, fake: bool = True) -> DataFrame:
    """Average-hash (aHash) perceptual fingerprint per image, the
    image-side twin of simhash/minhash document dedup: luminance is
    pooled onto a block grid, each block contributes one bit (above /
    below the grid mean), and near-duplicate images are the pairs at
    small Hamming distance — robust to re-encoding and mild resizing,
    which byte-level exact dedup misses entirely.

    60 bits (not the classic 64) so the packed hash plus every band
    arithmetic stays inside SIGNED int64 on both engines; bits come
    in 4 bands of 15 for LSH-style candidate blocking (a near-dup
    pair within Hamming r almost surely agrees on >= 1 whole band —
    the same banding law the MinHash planner pins).

    ``fake=True`` (oracle-checkable default) uses the 32 sha256
    digest bytes cycled to 60 as the "block luminances" — exactly
    reproducible in SQL. ``fake=False`` decodes real pixels (PIL or
    the stdlib PNG decoder) and block-pools luminance onto the same
    60 slots. Output: input columns minus content, plus ``ahash``
    (long) and ``band0..band3`` (int).
    """
    out_schema = StructType(
        [f for f in df.schema.fields if f.name != "content"]
        + [StructField("ahash", LongType())]
        + [StructField(f"band{b}", IntegerType()) for b in range(4)]
    )
    other_cols = [
        f.name for f in out_schema.fields
        if f.name not in ("ahash", "band0", "band1", "band2", "band3")
    ]

    def lum60(data: bytes) -> list[int]:
        if fake:
            dig = hashlib.sha256(data).digest()
            return [dig[i % 32] for i in range(60)]
        try:
            import io

            from PIL import Image  # optional

            img = Image.open(io.BytesIO(data)).convert("RGB")
            w, h = img.size
            px = list(img.getdata())
            rows = [px[y * w : (y + 1) * w] for y in range(h)]
        except ImportError:
            from social_link_prediction_spark.pipelines import imagecodec

            w, h, rows = imagecodec.decode_png(data)
        # pool luminance onto a 10x6 grid (60 blocks, row-major)
        out = []
        for gy in range(6):
            for gx in range(10):
                y0, y1 = gy * h // 6, max(gy * h // 6 + 1, (gy + 1) * h // 6)
                x0, x1 = gx * w // 10, max(gx * w // 10 + 1, (gx + 1) * w // 10)
                tot = n = 0
                for y in range(y0, min(y1, h)):
                    for x in range(x0, min(x1, w)):
                        r, g, b = rows[y][x]
                        tot += (299 * r + 587 * g + 114 * b) // 1000
                        n += 1
                out.append(tot // max(n, 1))
        return out

    def hash_one(data) -> tuple[int, int, int, int, int]:
        vals = lum60(bytes(data) if data is not None else b"")
        mean = sum(vals) / 60.0
        bits = [1 if v > mean else 0 for v in vals]
        h = 0
        bands = []
        for b in range(4):
            bv = 0
            for j in range(15):
                bv |= bits[15 * b + j] << j
            bands.append(bv)
            h |= bv << (15 * b)
        return h, bands[0], bands[1], bands[2], bands[3]

    def batches(it: Iterator) -> Iterator:
        for pdf in it:
            hashed = [hash_one(c) for c in pdf["content"]]
            out = pdf[[c for c in other_cols if c in pdf.columns]].copy()
            out["ahash"] = [t[0] for t in hashed]
            for b in range(4):
                out[f"band{b}"] = [t[b + 1] for t in hashed]
            yield out

    return df.mapInPandas(batches, out_schema)
