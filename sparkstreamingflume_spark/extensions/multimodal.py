"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video content rides as ``binary`` columns with a metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched Pandas functions over ``mapInPandas`` — the only sane
Python hot path (vectorized batches, not per-row pickling).

Pixel-level codecs (PIL/ffmpeg/torchaudio) are NOT in this container,
but header METADATA needs no codec: ``decode_image_real`` is a pure
struct-unpack parser for PNG/APNG, JPEG, and GIF containers (width,
height, frame count from the format's own header fields). The
deterministic fake (``decode_image_fake``) remains for payloads that
are not real images (the synthetic corpus), so the Spark-side plumbing
— schema, batch iteration, partition behavior — is exercised either
way; both paths return the same ``(width, height, n_frames)`` shape.

Scale posture: mapInPandas streams Arrow batches; memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``, payload columns are
pruned when untouched, and there is no shuffle — decode is embarrassingly
parallel over input partitions.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("media_type", T.StringType()),  # image/audio/video
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha1", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def _png_meta(b: bytes) -> tuple[int, int, int]:
    # IHDR is mandatory-first: width/height are big-endian uint32 at 16..24.
    w, h = struct.unpack(">II", b[16:24])
    # APNG: an acTL chunk (before the first IDAT) carries num_frames.
    n_frames, pos = 1, 8
    while pos + 8 <= len(b):
        (length,), ctype = struct.unpack(">I", b[pos : pos + 4]), b[pos + 4 : pos + 8]
        if ctype == b"acTL" and pos + 12 <= len(b):
            n_frames = struct.unpack(">I", b[pos + 8 : pos + 12])[0]
            break
        if ctype in (b"IDAT", b"IEND"):
            break
        pos += 12 + length  # len + type + data + crc
    return w, h, n_frames


def _jpeg_meta(b: bytes) -> tuple[int, int, int]:
    # Walk marker segments to the first SOFn frame header.
    pos = 2
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            pos += 1
            continue
        marker = b[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:  # no-length markers
            pos += 2
            continue
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):  # SOFn
            h, w = struct.unpack(">HH", b[pos + 5 : pos + 9])
            return w, h, 1
        pos += 2 + struct.unpack(">H", b[pos + 2 : pos + 4])[0]
    raise ValueError("JPEG: no SOF frame header found")


def _gif_meta(b: bytes) -> tuple[int, int, int]:
    w, h = struct.unpack("<HH", b[6:10])
    packed = b[10]
    pos = 13
    if packed & 0x80:  # global color table
        pos += 3 * (2 << (packed & 0x07))
    n_frames = 0
    while pos < len(b):
        introducer = b[pos]
        if introducer == 0x3B:  # trailer
            break
        if introducer == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(b) and b[pos] != 0:
                pos += 1 + b[pos]
            pos += 1
        elif introducer == 0x2C:  # image descriptor
            n_frames += 1
            lpacked = b[pos + 9]
            pos += 10
            if lpacked & 0x80:  # local color table
                pos += 3 * (2 << (lpacked & 0x07))
            pos += 1  # LZW min code size
            while pos < len(b) and b[pos] != 0:
                pos += 1 + b[pos]
            pos += 1
        else:
            raise ValueError(f"GIF: unknown block introducer 0x{introducer:02x}")
    return w, h, max(1, n_frames)


def decode_image_real(payload: bytes) -> tuple[int, int, int]:
    """Header-metadata decoder for real image bytes — no codec library
    needed: width/height/frame-count live in fixed struct fields of the
    PNG (+APNG acTL), JPEG (SOFn), and GIF (logical screen descriptor +
    image-descriptor walk) containers. Pixel DATA decoding still needs
    PIL/libvips at deployment; metadata extraction — the piece the
    dedup/profiling pipeline actually consumes — is complete here.
    Raises ``ValueError`` on an unrecognized container.
    """
    b = bytes(payload)
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        return _png_meta(b)
    if b[:2] == b"\xff\xd8":
        return _jpeg_meta(b)
    if b[:6] in (b"GIF87a", b"GIF89a"):
        return _gif_meta(b)
    raise ValueError("unsupported image format (not PNG/JPEG/GIF)")


def decode_image_fake(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake: metadata derived from the payload digest, so
    tests are stable and the plumbing is exercised with real byte flow."""
    h = hashlib.sha1(payload).digest()
    width = 64 + (int.from_bytes(h[0:4], "big") % 1216)
    height = 64 + (int.from_bytes(h[4:8], "big") % 656)
    n_frames = 1 + (h[8] % 32)
    return width, height, n_frames


def decode_media(df: DataFrame, use_real_codec: bool = False) -> DataFrame:
    """mapInPandas decode: (media_id, payload, media_type) -> metadata rows.

    Arrow-batched; one Python worker pass per partition, payload column
    dropped from the output (decode-and-discard keeps the shuffle-free
    output narrow).
    """

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["payload"].map(len),
                "sha1": pdf["payload"].map(
                    lambda b: hashlib.sha1(bytes(b)).hexdigest()
                ),
            }
            dims = pdf["payload"].map(
                decode_image_real if use_real_codec else decode_image_fake
            )
            out["width"] = dims.map(lambda d: d[0])
            out["height"] = dims.map(lambda d: d[1])
            out["n_frames"] = dims.map(lambda d: d[2])
            yield pd.DataFrame(out)

    return df.mapInPandas(decode, schema=DECODED_SCHEMA)


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha1", T.StringType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)


def decode_audio_real(payload: bytes) -> tuple[int, int, int]:
    """Header-metadata decoder for real WAV (RIFF) bytes — no codec
    library needed: channels / sample rate / bits-per-sample live in the
    ``fmt `` chunk and the sample count falls out of the ``data`` chunk
    length. Compressed codecs (mp3/ogg/flac) still need ffmpeg at
    deployment; the RIFF container — the interchange format raw corpus
    audio actually arrives in — is complete here. Returns
    ``(sample_rate, n_channels, n_samples)``; raises ``ValueError`` on a
    non-RIFF payload or a truncated chunk walk.
    """
    b = bytes(payload)
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("unsupported audio format (not RIFF/WAVE)")
    pos, rate, channels, bits, data_len = 12, None, None, None, None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (clen,) = struct.unpack("<I", b[pos + 4 : pos + 8])
        if cid == b"fmt ":
            channels, rate = struct.unpack("<HI", b[pos + 10 : pos + 16])
            (bits,) = struct.unpack("<H", b[pos + 22 : pos + 24])
        elif cid == b"data":
            data_len = clen
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if rate is None or data_len is None:
        raise ValueError("WAV: missing fmt/data chunk")
    n_samples = data_len // max(1, channels * (bits // 8))
    return rate, channels, n_samples


def decode_audio_fake(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake audio metadata from the payload digest (the
    synthetic corpus carries arbitrary bytes, not RIFF containers)."""
    h = hashlib.sha1(payload).digest()
    rate = (8000, 16000, 22050, 44100, 48000)[h[0] % 5]
    channels = 1 + (h[1] % 2)
    n_samples = 1000 + int.from_bytes(h[2:6], "big") % 480_000
    return rate, channels, n_samples


def decode_audio(df: DataFrame, use_real_codec: bool = False) -> DataFrame:
    """mapInPandas audio decode: (media_id, payload) -> audio metadata.

    Same Arrow-batched, shuffle-free, payload-dropping shape as
    :func:`decode_media`; ``duration_ms`` is integer-derived so results
    are engine-deterministic.
    """

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            meta = pdf["payload"].map(
                decode_audio_real if use_real_codec else decode_audio_fake
            )
            rates = meta.map(lambda m: m[0])
            samples = meta.map(lambda m: m[2])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(len),
                    "sha1": pdf["payload"].map(
                        lambda b: hashlib.sha1(bytes(b)).hexdigest()
                    ),
                    "sample_rate": rates,
                    "n_channels": meta.map(lambda m: m[1]),
                    "n_samples": samples,
                    "duration_ms": samples * 1000 // rates,
                }
            )

    return df.mapInPandas(decode, schema=AUDIO_SCHEMA)


VIDEO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha1", T.StringType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("n_tracks", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def _bmff_boxes(b: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for ISO-BMFF boxes in
    ``b[start:end]`` — size==1 means a 64-bit largesize follows the
    type; size==0 means the box runs to the end of the enclosure."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", b[pos : pos + 4])
        btype = b[pos + 4 : pos + 8]
        head = 8
        if size == 1:
            if pos + 16 > end:  # largesize would overrun the enclosure
                raise ValueError(f"BMFF: truncated largesize box {btype!r}")
            (size,) = struct.unpack(">Q", b[pos + 8 : pos + 16])
            head = 16
        elif size == 0:
            size = end - pos
        if size < head or pos + size > end:
            raise ValueError(f"BMFF: box {btype!r} with impossible size {size}")
        yield btype, pos + head, pos + size
        pos += size


def decode_video_real(payload: bytes) -> tuple[int, int, int, int]:
    """Header-metadata decoder for real MP4/ISO-BMFF bytes — no codec
    library needed: duration and timescale live in ``moov/mvhd``, the
    track count is the number of ``moov/trak`` boxes, and the visual
    width/height sit at fixed offsets of the first ``tkhd`` whose
    dimensions are nonzero (16.16 fixed-point). Frame DATA decoding
    still needs ffmpeg at deployment; container metadata — the piece
    dedup/profiling/frame-sampling budgets actually consume — is
    complete here. Returns ``(duration_ms, n_tracks, width, height)``;
    raises ``ValueError`` on a non-BMFF payload or missing moov/mvhd.
    """
    b = bytes(payload)
    if len(b) < 12 or b[4:8] != b"ftyp":
        raise ValueError("unsupported video format (no ftyp box)")
    duration_ms = n_tracks = width = height = None
    for btype, ps, pe in _bmff_boxes(b, 0, len(b)):
        if btype != b"moov":
            continue
        n_tracks = 0
        for ctype, cs, ce in _bmff_boxes(b, ps, pe):
            if ctype == b"mvhd":
                version = b[cs] if ce > cs else 0
                if ce - cs < (32 if version == 1 else 20):
                    raise ValueError("BMFF: truncated mvhd box")
                if version == 1:
                    scale, dur = struct.unpack(">IQ", b[cs + 20 : cs + 32])
                else:
                    scale, dur = struct.unpack(">II", b[cs + 12 : cs + 20])
                duration_ms = dur * 1000 // max(1, scale)
            elif ctype == b"trak":
                n_tracks += 1
                if width:
                    continue
                for ttype, ts, te in _bmff_boxes(b, cs, ce):
                    if ttype == b"tkhd":
                        if te <= ts:
                            raise ValueError("BMFF: truncated tkhd box")
                        off = ts + (88 if b[ts] == 1 else 76)
                        if off + 8 > te:
                            raise ValueError("BMFF: truncated tkhd box")
                        w16, h16 = struct.unpack(">II", b[off : off + 8])
                        if w16 and h16:
                            width, height = w16 >> 16, h16 >> 16
        break
    if duration_ms is None or n_tracks is None:
        raise ValueError("BMFF: missing moov/mvhd box")
    return duration_ms, n_tracks, width or 0, height or 0


def decode_video_fake(payload: bytes) -> tuple[int, int, int, int]:
    """Deterministic fake video metadata from the payload digest (the
    synthetic corpus carries arbitrary bytes, not BMFF containers)."""
    h = hashlib.sha1(payload).digest()
    duration_ms = 1000 + int.from_bytes(h[0:4], "big") % 600_000
    n_tracks = 1 + (h[4] % 3)
    width = (256, 640, 1280, 1920)[h[5] % 4]
    height = (144, 360, 720, 1080)[h[5] % 4]
    return duration_ms, n_tracks, width, height


def decode_video(df: DataFrame, use_real_codec: bool = False) -> DataFrame:
    """mapInPandas video decode: (media_id, payload) -> container metadata.

    Same Arrow-batched, shuffle-free, payload-dropping shape as
    :func:`decode_media` / :func:`decode_audio`.
    """

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            meta = pdf["payload"].map(
                decode_video_real if use_real_codec else decode_video_fake
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(len),
                    "sha1": pdf["payload"].map(
                        lambda b: hashlib.sha1(bytes(b)).hexdigest()
                    ),
                    "duration_ms": meta.map(lambda m: m[0]),
                    "n_tracks": meta.map(lambda m: m[1]),
                    "width": meta.map(lambda m: m[2]),
                    "height": meta.map(lambda m: m[3]),
                }
            )

    return df.mapInPandas(decode, schema=VIDEO_SCHEMA)


def frame_sample(df: DataFrame, every_nth: int = 8) -> DataFrame:
    """Frame-sampling plumbing: explode a video payload into frame rows
    (fake: one row per sampled frame index, real: ffmpeg seek+decode).
    Output is (media_id, frame_no) — the downstream embedding/dedup input.
    """
    from pyspark.sql import functions as F

    decoded = decode_media(df)
    return decoded.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_nth))
        ).alias("frame_no"),
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def resize_fake(payload: bytes, max_side: int) -> tuple[int, int, bytes]:
    """Deterministic fake resize: recompute the fake dims, scale the long
    side to ``max_side`` preserving aspect, and emit a digest-derived
    payload of proportional size — so batch shapes and byte flow match a
    real resampler's."""
    w, h, _ = decode_image_fake(payload)
    scale = min(1.0, max_side / max(w, h))
    nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
    body = hashlib.sha1(payload + max_side.to_bytes(4, "big")).digest()
    out = (body * (1 + (nw * nh) // (3 * len(body))))[: max(1, (nw * nh) // 3)]
    return nw, nh, out


def resize_media(df: DataFrame, max_side: int = 256) -> DataFrame:
    """mapInPandas resize: payload -> resampled payload + new dims.

    Real deployment swaps ``resize_fake`` for PIL/libvips ``thumbnail``;
    the Spark-side contract (Arrow batch in/out, binary column out,
    no shuffle, partition-parallel) is identical and is what tests pin.
    """

    def do_resize(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            triples = pdf["payload"].map(lambda b: resize_fake(bytes(b), max_side))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": triples.map(lambda t: t[0]),
                    "height": triples.map(lambda t: t[1]),
                    "payload": triples.map(lambda t: t[2]),
                }
            )

    return df.mapInPandas(do_resize, schema=RESIZED_SCHEMA)


FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


def extract_features(df: DataFrame) -> DataFrame:
    """Feature extraction plumbing: payload -> fixed-dim float vector.

    The fake embeds the payload digest into a deterministic unit-norm
    16-dim vector (a real deployment runs a CLIP/ViT forward pass here —
    same mapInPandas shape, bigger batches, GPU scheduling via
    ``spark.task.resource.gpu.amount``). Output feeds the same
    embedding-similarity operators as the text path
    (q_embed_topk / q_embed_ivf / q_dedup_embed_cosine).
    """

    def embed(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            vecs = []
            for b in pdf["payload"]:
                h = hashlib.sha256(bytes(b)).digest()
                v = np.frombuffer(h[: FEATURE_DIM * 2], dtype=np.uint16).astype(
                    np.float32
                )
                v = v - v.mean()
                norm = float(np.linalg.norm(v))
                vecs.append((v / norm if norm else v).tolist())
            yield pd.DataFrame({"media_id": pdf["media_id"], "embedding": vecs})

    return df.mapInPandas(embed, schema=FEATURES_SCHEMA)


CONTENT_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("entropy_bits", T.DoubleType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


def byte_histogram_counts(payload: bytes, dim: int = 64) -> list:
    """INTEGER ``dim``-bucket byte-value histogram of an opaque payload
    — the shared counting core of :func:`byte_histogram_features` (which
    normalizes it) and the cross-engine-certified binary near-dup path
    (``q_media_neardup_binary``, plans/extension_queries.py: this exact
    function runs inside the plan's mapInPandas stage and its output is
    hash-compared against a DuckDB derivation of the same byte stream —
    so the counting path is oracle-certified on genuinely binary input,
    not just the ASCII corpus where chars coincide with bytes).
    Integer counts, not normalized floats, because every downstream
    sign/bucket decision must be integer-exact across engines."""
    import numpy as np

    if dim <= 0 or 256 % dim:
        raise ValueError(f"dim must divide 256, got {dim}")
    # NULL payload (a missing/failed upstream fetch) degrades like the
    # empty payload instead of raising TypeError inside the task and
    # failing the whole job on one dirty row — same
    # dirty-data-must-not-crash posture as the embedding validity gate
    if payload is None:
        return [0] * dim
    a = np.frombuffer(bytes(payload), dtype=np.uint8)
    if a.size == 0:
        return [0] * dim
    full = np.bincount(a, minlength=256)
    return full.reshape(dim, 256 // dim).sum(axis=1).astype(np.int64).tolist()


def byte_histogram_features(payload: bytes, dim: int = 64):
    """Real, dependency-free content features for an opaque payload:
    an L2-normalized ``dim``-bucket byte-value histogram plus Shannon
    entropy (bits/byte). Unlike the digest fake above, these have
    LOCALITY — payloads differing in a few bytes land at cosine ~1 —
    so they honestly support near-dup detection and clustering over
    binary columns (format fingerprinting, corrupted-file outliers,
    compressed-vs-raw separation via entropy). A real CLIP/ViT embedder
    drops into the same slot with semantic locality.

    Counting goes through :func:`byte_histogram_counts` (at 256-bucket
    granularity for exact entropy, re-bucketed to ``dim`` here), so the
    features path and the certified binary near-dup path share one
    counting core; normalization does not change the sign of any dot
    product, so certifying the integer counts certifies every SRP
    bucketing decision the normalized features would make.
    """
    import numpy as np

    full = np.asarray(byte_histogram_counts(payload, 256), dtype=np.float64)
    n = int(full.sum())
    if n == 0:
        return 0, 0.0, [0.0] * dim
    if dim <= 0 or 256 % dim:
        raise ValueError(f"dim must divide 256, got {dim}")
    p = full[full > 0] / n
    entropy = float(-(p * np.log2(p)).sum())  # true bits/byte, 0..8
    hist = full.reshape(dim, 256 // dim).sum(axis=1)
    norm = float(np.linalg.norm(hist))
    feats = (hist / norm).astype(np.float32).tolist()
    return n, entropy, feats


def extract_content_features(df: DataFrame, dim: int = 64) -> DataFrame:
    """mapInPandas byte-histogram featurizer: (media_id, payload) ->
    (media_id, n_bytes, entropy_bits, embedding). Same Arrow-batched,
    shuffle-free, payload-dropping shape as the decoders; the embedding
    column feeds the text-side ANN operators (q_embed_topk /
    q_embed_ivf / q_dedup_embed_cosine) unchanged.
    """

    def featurize(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = [byte_histogram_features(b, dim) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [r[0] for r in rows],
                    "entropy_bits": [r[1] for r in rows],
                    "embedding": [r[2] for r in rows],
                }
            )

    return df.mapInPandas(featurize, schema=CONTENT_FEATURES_SCHEMA)


CONTENT_HISTOGRAM_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("bucket", T.IntegerType()),
        T.StructField("cnt", T.LongType()),
    ]
)


def content_histogram(df: DataFrame, dim: int = 64) -> DataFrame:
    """mapInPandas INTEGER byte-histogram featurizer, long form:
    (media_id, payload) -> (media_id, bucket, cnt) rows, zero buckets
    omitted — the input shape of the shared SRP near-dup pair stage
    (``_media_pair_stage``, plans/extension_queries.py). Same
    Arrow-batched, shuffle-free, payload-dropping shape as the
    decoders; counting goes through :func:`byte_histogram_counts`, the
    same core :func:`byte_histogram_features` normalizes, so the
    cross-engine certification of ``q_media_neardup_binary`` (which
    runs THIS stage over genuinely binary payloads) covers the
    features path's counting too."""

    def hist(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids: list = []
            buckets: list = []
            cnts: list = []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                for k, c in enumerate(byte_histogram_counts(b, dim)):
                    if c:
                        ids.append(mid)
                        buckets.append(k)
                        cnts.append(c)
            yield pd.DataFrame(
                {"media_id": ids, "bucket": buckets, "cnt": cnts}
            )

    return df.mapInPandas(hist, schema=CONTENT_HISTOGRAM_SCHEMA)


def near_dup_media(
    df: DataFrame,
    dim: int = 64,
    n_planes: int = 16,
    threshold_ppm: int = 990_000,
    bucket_ceil: int = 128,
) -> DataFrame:
    """Near-duplicate detection over opaque BINARY media columns:
    (media_id, payload) -> (media_a, media_b, cosine_ppm) pairs.

    The end-to-end composition of the multimodal featurizer with the
    text side's LSH dedup machinery: byte-histogram features
    (extract_content_features — L2-normalized, so dot product IS
    cosine), a signed-random-projection signature (``n_planes`` seeded
    hyperplanes, applied as a broadcast crossJoin + zip_with dot per
    plane — all Catalyst, no Python past the featurizer), bucket-only
    candidate generation on the full signature with the family's
    BUCKET_CEIL contract (a bucket holding B media emits O(B²)
    candidates; mass-duplicated payloads belong to exact dedup on
    md5(payload), not pair enumeration), and an exact cosine verify on
    the feature vectors. A CLIP/ViT embedder drops into the featurizer
    slot and this operator becomes semantic near-dup unchanged.

    100 TB shape: one mapInPandas featurize pass (shuffle-free), one
    signature aggregate (media_id keyed), one bucket self-join whose
    key is the n_planes-bit signature, verify joins carrying dim-float
    vectors only for surviving candidates. Test-pinned
    (tests/test_multimodal.py); DuckDB cannot run the mapInPandas
    featurizer, but the pipeline IS oracle-certified end to end via
    q_media_neardup (plans/extension_queries.py), which re-expresses
    the featurizer as the SQL char histogram — exactly this byte
    histogram on the ASCII driver corpus, parity pinned in
    tests/test_multimodal.py — and runs the same SRP-bucket +
    BUCKET_CEIL + exact-verify pair stage in both engines.
    """
    import numpy as np

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    spark = df.sparkSession
    rng = np.random.default_rng(20260814)
    planes = rng.standard_normal((n_planes, dim)).astype(float).tolist()
    planes_df = spark.createDataFrame(
        [(j, planes[j]) for j in range(n_planes)],
        "plane_id INT, plane ARRAY<DOUBLE>",
    )

    feats = extract_content_features(df, dim).filter(
        (F.col("n_bytes") > 0) & (F.size("embedding") == dim)
    )
    dot = F.aggregate(
        F.zip_with(
            F.col("embedding").cast("array<double>"),
            F.col("plane"),
            lambda a, b: a * b,
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    bits = feats.crossJoin(F.broadcast(planes_df)).select(
        "media_id",
        (dot > 0).cast("long").alias("bit"),
        "plane_id",
    )
    sigs = bits.groupBy("media_id").agg(
        F.sum(F.expr("shiftleft(bit, plane_id)")).alias("sig")
    )
    pruned = (
        sigs.withColumn("bsz", F.count("*").over(Window.partitionBy("sig")))
        .filter(F.col("bsz") <= bucket_ceil)
        .drop("bsz")
    )
    sa, sb = pruned.alias("sa"), pruned.alias("sb")
    cand = (
        sa.join(sb, F.col("sa.sig") == F.col("sb.sig"))
        .filter(F.col("sa.media_id") < F.col("sb.media_id"))
        .select(
            F.col("sa.media_id").alias("media_a"),
            F.col("sb.media_id").alias("media_b"),
        )
    )
    fa = feats.select(
        F.col("media_id").alias("media_a"), F.col("embedding").alias("ea")
    )
    fb = feats.select(
        F.col("media_id").alias("media_b"), F.col("embedding").alias("eb")
    )
    cosine = F.aggregate(
        F.zip_with(
            F.col("ea").cast("array<double>"),
            F.col("eb").cast("array<double>"),
            lambda a, b: a * b,
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        cand.join(fa, "media_a")
        .join(fb, "media_b")
        .select(
            "media_a",
            "media_b",
            F.floor(cosine * 1_000_000).cast("long").alias("cosine_ppm"),
        )
        .filter(F.col("cosine_ppm") >= threshold_ppm)
    )
