"""Multimodal plumbing tests: schema, Arrow batch flow, deterministic fake."""

from __future__ import annotations

import hashlib

import pytest

from sparkstreamingflume_spark.extensions import multimodal as MM

# Driver-budget profile (pytest.ini): stream-twin/soak/sweep file —
# excluded from the default selection, always run by tools/run_shards.sh.
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        (i, f"payload-{i}".encode() * (i + 1), "image" if i % 2 else "video")
        for i in range(10)
    ]
    return spark.createDataFrame(rows, MM.MEDIA_SCHEMA)


def test_decode_schema_and_values(media_df):
    out = MM.decode_media(media_df)
    assert out.schema == MM.DECODED_SCHEMA
    rows = {r.media_id: r for r in out.collect()}
    assert len(rows) == 10
    for i in range(10):
        payload = f"payload-{i}".encode() * (i + 1)
        r = rows[i]
        assert r.n_bytes == len(payload)
        assert r.sha1 == hashlib.sha1(payload).hexdigest()
        w, h, f = MM.decode_image_fake(payload)
        assert (r.width, r.height, r.n_frames) == (w, h, f)
        assert 64 <= r.width < 1280 and 64 <= r.height < 720


def test_decode_is_deterministic(media_df):
    a = sorted(map(tuple, MM.decode_media(media_df).collect()))
    b = sorted(map(tuple, MM.decode_media(media_df).collect()))
    assert a == b


# --- real tiny in-container image bytes (built with struct/zlib only) ------


def make_png(w: int, h: int, frames: int | None = None) -> bytes:
    """A genuinely valid (A)PNG: correct chunk lengths + CRCs, 1 IDAT."""
    import struct
    import zlib

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    ihdr = chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
    actl = chunk(b"acTL", struct.pack(">II", frames, 0)) if frames else b""
    raw = b"".join(b"\x00" + b"\x00" * w for _ in range(h))  # filter 0 rows
    idat = chunk(b"IDAT", zlib.compress(raw))
    return b"\x89PNG\r\n\x1a\n" + ihdr + actl + idat + chunk(b"IEND", b"")


def make_jpeg(w: int, h: int) -> bytes:
    """Minimal JPEG: SOI + APP0(JFIF) + SOF0 carrying the dimensions."""
    import struct

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + b"\x00\x01\x00\x01\x00\x00"
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 11)
        + b"\x08"
        + struct.pack(">HH", h, w)
        + b"\x01\x11\x00"
    )
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def make_gif(w: int, h: int, frames: int = 1) -> bytes:
    """Minimal GIF89a: logical screen + N image descriptors + trailer."""
    import struct

    hdr = b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00"  # no GCT
    img = (
        b"\x2c"
        + struct.pack("<HHHH", 0, 0, w, h)
        + b"\x00"  # no local color table
        + b"\x02"  # LZW min code size
        + b"\x01\x00"  # one 1-byte data sub-block + terminator
        + b"\x00"
    )
    return hdr + img * frames + b"\x3b"


def test_real_codec_parses_png_jpeg_gif_headers():
    assert MM.decode_image_real(make_png(320, 200)) == (320, 200, 1)
    assert MM.decode_image_real(make_png(17, 9, frames=5)) == (17, 9, 5)
    assert MM.decode_image_real(make_jpeg(641, 480)) == (641, 480, 1)
    assert MM.decode_image_real(make_gif(12, 34)) == (12, 34, 1)
    assert MM.decode_image_real(make_gif(12, 34, frames=3)) == (12, 34, 3)
    with pytest.raises(ValueError):
        MM.decode_image_real(b"not an image at all")


def test_real_codec_png_is_pil_parseable_shape():
    """The generated PNG is standards-valid: zlib-decompressible IDAT and
    CRC-correct chunks (so the byte literals are REAL images, not just
    parser-shaped input)."""
    import struct
    import zlib

    b = make_png(5, 4)
    pos, seen = 8, {}
    while pos + 8 <= len(b):
        (length,) = struct.unpack(">I", b[pos : pos + 4])
        ctype = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", b[pos + 8 + length : pos + 12 + length])
        assert crc == zlib.crc32(ctype + data), ctype
        seen[ctype] = data
        pos += 12 + length
    assert set(seen) == {b"IHDR", b"IDAT", b"IEND"}
    raw = zlib.decompress(seen[b"IDAT"])
    assert len(raw) == 4 * (1 + 5)  # h rows of (filter byte + w bytes)


def test_decode_media_real_codec_path(spark):
    """decode_media(use_real_codec=True) over real image bytes: the
    Arrow/mapInPandas plumbing is identical to the fake path and the
    metadata shape agrees (same DECODED_SCHEMA, same tuple arity)."""
    import hashlib as H

    payloads = [
        (0, make_png(320, 200), "image"),
        (1, make_jpeg(640, 480), "image"),
        (2, make_gif(64, 32, frames=4), "image"),
        (3, make_png(8, 8, frames=2), "image"),
    ]
    df = spark.createDataFrame(payloads, MM.MEDIA_SCHEMA)
    rows = {r.media_id: r for r in MM.decode_media(df, use_real_codec=True).collect()}
    expect = {0: (320, 200, 1), 1: (640, 480, 1), 2: (64, 32, 4), 3: (8, 8, 2)}
    for mid, (w, h, f) in expect.items():
        r = rows[mid]
        assert (r.width, r.height, r.n_frames) == (w, h, f)
        assert r.n_bytes == len(payloads[mid][1])
        assert r.sha1 == H.sha1(payloads[mid][1]).hexdigest()


def test_frame_sample_explodes(media_df):
    frames = MM.frame_sample(media_df, every_nth=4).collect()
    by_id: dict[int, list[int]] = {}
    for r in frames:
        by_id.setdefault(r.media_id, []).append(r.frame_no)
    rows = {r.media_id: r for r in MM.decode_media(media_df).collect()}
    for mid, fnos in by_id.items():
        expect = list(range(0, rows[mid].n_frames, 4))
        assert sorted(fnos) == expect


def test_resize_preserves_aspect_and_bounds(spark, media_df):
    from sparkstreamingflume_spark.extensions.multimodal import (
        decode_media,
        resize_media,
    )

    orig = {r["media_id"]: (r["width"], r["height"]) for r in decode_media(media_df).collect()}
    rows = resize_media(media_df, max_side=256).collect()
    assert len(rows) == len(orig)
    for r in rows:
        w, h = r["width"], r["height"]
        ow, oh = orig[r["media_id"]]
        assert max(w, h) <= 256
        assert len(r["payload"]) > 0
        # aspect preserved within integer-truncation slack
        if ow >= oh:
            assert w >= h
        # deterministic: same input -> same output
    again = resize_media(media_df, max_side=256).collect()
    assert sorted((r["media_id"], bytes(r["payload"])) for r in again) == sorted(
        (r["media_id"], bytes(r["payload"])) for r in rows
    )


def test_extract_features_unit_norm_deterministic(spark, media_df):
    import math

    from sparkstreamingflume_spark.extensions.multimodal import (
        FEATURE_DIM,
        extract_features,
    )

    rows = extract_features(media_df).collect()
    assert len(rows) == media_df.count()
    for r in rows:
        v = r["embedding"]
        assert len(v) == FEATURE_DIM
        assert abs(math.sqrt(sum(x * x for x in v)) - 1.0) < 1e-3
    again = {r["media_id"]: r["embedding"] for r in extract_features(media_df).collect()}
    assert all(again[r["media_id"]] == r["embedding"] for r in rows)


def make_wav(rate: int, channels: int, n_samples: int, bits: int = 16) -> bytes:
    """A standards-valid PCM WAV: RIFF header + fmt chunk + data chunk."""
    import struct

    frame = channels * (bits // 8)
    data = bytes(n_samples * frame)  # silence
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * frame, frame, bits
    )
    body = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_real_audio_codec_parses_wav_header():
    assert MM.decode_audio_real(make_wav(16000, 1, 1234)) == (16000, 1, 1234)
    assert MM.decode_audio_real(make_wav(44100, 2, 999, bits=8)) == (44100, 2, 999)
    # extra chunk before fmt (LIST) must be skipped by the chunk walk
    import struct

    w = make_wav(8000, 1, 10)
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    patched = w[:12] + extra + w[12:]
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    assert MM.decode_audio_real(patched) == (8000, 1, 10)
    with pytest.raises(ValueError):
        MM.decode_audio_real(b"not audio")
    with pytest.raises(ValueError):  # RIFF but no fmt/data
        MM.decode_audio_real(b"RIFF\x04\x00\x00\x00WAVE")


def test_decode_audio_real_and_fake_paths(spark, media_df):
    """Same mapInPandas plumbing both ways: real WAV bytes parse to their
    true header values; the fake path yields the same schema and is
    deterministic over arbitrary bytes."""
    import hashlib as H

    payloads = [
        (0, make_wav(16000, 1, 16000), "audio"),  # 1 s mono
        (1, make_wav(48000, 2, 12000), "audio"),  # 250 ms stereo
    ]
    df = spark.createDataFrame(payloads, MM.MEDIA_SCHEMA)
    rows = {r.media_id: r for r in MM.decode_audio(df, use_real_codec=True).collect()}
    assert (rows[0].sample_rate, rows[0].n_channels, rows[0].n_samples) == (
        16000, 1, 16000,
    )
    assert rows[0].duration_ms == 1000
    assert (rows[1].sample_rate, rows[1].n_channels, rows[1].n_samples) == (
        48000, 2, 12000,
    )
    assert rows[1].duration_ms == 250
    for mid, payload, _ in payloads:
        assert rows[mid].n_bytes == len(payload)
        assert rows[mid].sha1 == H.sha1(payload).hexdigest()

    fake = MM.decode_audio(media_df).collect()
    assert len(fake) == media_df.count()
    assert MM.decode_audio(media_df).schema == MM.AUDIO_SCHEMA
    for r in fake:
        assert r.sample_rate in (8000, 16000, 22050, 44100, 48000)
        assert r.n_channels in (1, 2)
        assert r.duration_ms == r.n_samples * 1000 // r.sample_rate


def box(btype: bytes, payload: bytes) -> bytes:
    import struct

    return struct.pack(">I", 8 + len(payload)) + btype + payload


def make_mp4(duration_ms: int, timescale: int, tracks, mvhd_v1: bool = False) -> bytes:
    """A structurally-valid ISO-BMFF skeleton: ftyp + moov(mvhd + trak*).

    ``tracks`` is a list of (width, height) — (0, 0) marks a non-visual
    track (audio/subs), matching how tkhd encodes them.
    """
    import struct

    dur = duration_ms * timescale // 1000
    if mvhd_v1:
        mvhd = box(
            b"mvhd",
            struct.pack(">B3x", 1)
            + struct.pack(">QQIQ", 0, 0, timescale, dur)
            + b"\x00" * 80,
        )
    else:
        mvhd = box(
            b"mvhd",
            struct.pack(">B3x", 0)
            + struct.pack(">IIII", 0, 0, timescale, dur)
            + b"\x00" * 80,
        )
    traks = b""
    for w, h in tracks:
        tkhd = box(
            b"tkhd",
            struct.pack(">B3x", 0)
            + b"\x00" * 72  # times/ids/duration/layer/volume/matrix (v0: 76-4)
            + struct.pack(">II", w << 16, h << 16),
        )
        traks += box(b"trak", tkhd)
    return box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2") + box(b"moov", mvhd + traks)


def test_real_video_codec_parses_bmff_header():
    mp4 = make_mp4(90_000, 600, [(1920, 1080), (0, 0)])
    assert MM.decode_video_real(mp4) == (90_000, 2, 1920, 1080)
    # 64-bit mvhd (version 1) and a non-visual-only file
    assert MM.decode_video_real(make_mp4(1_500, 1000, [(0, 0)], mvhd_v1=True)) == (
        1_500, 1, 0, 0,
    )
    with pytest.raises(ValueError):
        MM.decode_video_real(b"not a video")
    with pytest.raises(ValueError):  # ftyp but no moov
        MM.decode_video_real(box(b"ftyp", b"isom"))


def test_real_video_codec_truncated_bytes_raise_valueerror():
    """Malformed/truncated BMFF must fail with the DOCUMENTED ValueError,
    never a leaked struct.error (size==1 with no room for the 64-bit
    largesize; mvhd/tkhd payloads shorter than their fixed layouts)."""
    import struct

    ftyp = box(b"ftyp", b"isom")
    # size==1 (largesize follows) but fewer than 16 bytes remain
    trunc_large = ftyp + struct.pack(">I", 1) + b"moov" + b"\x00" * 4
    with pytest.raises(ValueError):
        MM.decode_video_real(trunc_large)
    # mvhd payload shorter than the version-0 fixed offsets
    with pytest.raises(ValueError):
        MM.decode_video_real(ftyp + box(b"moov", box(b"mvhd", b"\x00" * 8)))
    # v1 mvhd flag but only a v0-sized payload
    with pytest.raises(ValueError):
        MM.decode_video_real(
            ftyp + box(b"moov", box(b"mvhd", struct.pack(">B3x", 1) + b"\x00" * 20))
        )
    # tkhd payload shorter than the width/height offsets
    good_mvhd = box(
        b"mvhd", struct.pack(">B3x", 0) + struct.pack(">IIII", 0, 0, 600, 600)
        + b"\x00" * 80
    )
    bad_trak = box(b"trak", box(b"tkhd", struct.pack(">B3x", 0) + b"\x00" * 8))
    with pytest.raises(ValueError):
        MM.decode_video_real(ftyp + box(b"moov", good_mvhd + bad_trak))
    # inner box overrunning its enclosure
    lying = struct.pack(">I", 4096) + b"mvhd" + b"\x00" * 20
    with pytest.raises(ValueError):
        MM.decode_video_real(ftyp + box(b"moov", lying))


def test_decode_video_real_and_fake_paths(spark, media_df):
    import hashlib as H

    payloads = [
        (0, make_mp4(30_000, 90000, [(640, 360)]), "video"),
        (1, make_mp4(250, 600, [(0, 0), (1280, 720)]), "video"),
    ]
    df = spark.createDataFrame(payloads, MM.MEDIA_SCHEMA)
    rows = {r.media_id: r for r in MM.decode_video(df, use_real_codec=True).collect()}
    assert (rows[0].duration_ms, rows[0].n_tracks, rows[0].width, rows[0].height) == (
        30_000, 1, 640, 360,
    )
    assert (rows[1].duration_ms, rows[1].n_tracks, rows[1].width, rows[1].height) == (
        250, 2, 1280, 720,
    )
    for mid, payload, _ in payloads:
        assert rows[mid].n_bytes == len(payload)
        assert rows[mid].sha1 == H.sha1(payload).hexdigest()

    fake = MM.decode_video(media_df).collect()
    assert len(fake) == media_df.count()
    assert MM.decode_video(media_df).schema == MM.VIDEO_SCHEMA
    for r in fake:
        assert r.duration_ms >= 1000 and r.n_tracks in (1, 2, 3)
        assert (r.width, r.height) in (
            (256, 144), (640, 360), (1280, 720), (1920, 1080),
        )


def test_byte_histogram_features_locality_and_entropy(spark):
    """Content features must have real locality (unlike the digest fake):
    a payload differing in a few bytes stays at cosine ~1, an unrelated
    payload does not; entropy separates constant from uniform bytes; and
    the whole path runs through Arrow batches with exact unit norms."""
    import math

    from sparkstreamingflume_spark.extensions.multimodal import (
        byte_histogram_features,
        extract_content_features,
    )

    base = bytes(range(256)) * 8
    near = bytearray(base)
    near[0:4] = b"\xff\xff\xff\xff"  # 4 of 2048 bytes changed
    other = b"\x00" * 2048

    def cos(u, v):
        return sum(a * b for a, b in zip(u, v))

    _, ent_base, f_base = byte_histogram_features(base)
    _, ent_const, f_const = byte_histogram_features(other)
    _, _, f_near = byte_histogram_features(bytes(near))
    assert cos(f_base, f_near) > 0.999
    assert cos(f_base, f_const) < 0.2
    assert abs(ent_base - 8.0) < 0.01  # uniform bytes: 8 bits/byte
    assert ent_const == 0.0  # constant bytes: zero entropy
    for f in (f_base, f_near, f_const):
        assert abs(math.sqrt(cos(f, f)) - 1.0) < 1e-5

    # NULL payload degrades like the empty payload — one dirty row must
    # not crash the whole mapInPandas task (dirty-data posture parity
    # with the embedding validity gate)
    assert byte_histogram_features(None) == (0, 0.0, [0.0] * 64)

    df = spark.createDataFrame(
        [(1, base), (2, bytes(near)), (3, other), (4, b""), (5, None)],
        "media_id long, payload binary",
    )
    out = {r["media_id"]: r for r in extract_content_features(df).collect()}
    assert out[1]["n_bytes"] == 2048 and len(out[1]["embedding"]) == 64
    assert cos(out[1]["embedding"], out[2]["embedding"]) > 0.999
    assert out[4]["n_bytes"] == 0 and out[4]["entropy_bits"] == 0.0
    assert out[5]["n_bytes"] == 0 and out[5]["entropy_bits"] == 0.0


def test_near_dup_media_finds_perturbed_copies(spark):
    """The featurizer->SRP-LSH->cosine-verify composition: an exact
    copy and an 8-bytes-perturbed copy of a 4 KB payload pair with the
    original at cosine ~1; a differently-distributed payload (ASCII
    text vs full-range bytes) pairs with nothing."""
    import random

    from sparkstreamingflume_spark.extensions.multimodal import near_dup_media

    rnd = random.Random(7)
    base = bytes(rnd.randrange(256) for _ in range(4096))
    near = bytearray(base)
    for p in rnd.sample(range(len(near)), 8):
        near[p] = (near[p] + 128) % 256
    text = ("the quick brown fox " * 205)[:4096].encode()  # ASCII band only
    rows = [
        (1, base),
        (2, bytes(near)),
        (3, base),  # exact duplicate
        (4, text),
    ]
    df = spark.createDataFrame(rows, "media_id LONG, payload BINARY")
    pairs = {
        (r.media_a, r.media_b): r.cosine_ppm
        for r in near_dup_media(df).collect()
    }
    assert set(pairs) == {(1, 2), (1, 3), (2, 3)}
    assert pairs[(1, 3)] >= 999_999  # exact copy: cosine 1.0
    assert all(v >= 990_000 for v in pairs.values())


def test_media_neardup_sql_featurizer_matches_mapinpandas(spark):
    """The q_media_neardup bridge claim (round-10 verdict task 3): on
    the ASCII driver corpus, the certified query's SQL char-histogram
    IS byte_histogram_features' 64-bucket byte histogram, so the
    oracle row transitively certifies the mapInPandas featurizer's
    math. Pin it: featurize encode(text) through the Arrow path and
    compare against the query's histogram expression, L2-normalized,
    per document."""
    import math

    from pyspark.sql import functions as F

    from sparkstreamingflume_spark.extensions.multimodal import (
        extract_content_features,
    )
    from sparkstreamingflume_spark.plans.extension_queries import _docs

    sf = "/root/testdata/sf0.001"
    d = _docs(spark, sf).select("doc_id", "text")
    arrow = {
        r.media_id: r.embedding
        for r in extract_content_features(
            d.select(
                F.col("doc_id").alias("media_id"),
                F.encode("text", "UTF-8").alias("payload"),
            )
        ).collect()
    }
    hist_rows = (
        d.select(
            "doc_id",
            F.explode(
                F.expr("transform(split(text, ''), c -> ascii(c))")
            ).alias("code"),
        )
        .groupBy("doc_id", F.expr("code div 4").alias("bucket"))
        .count()
        .collect()
    )
    hists: dict = {}
    for r in hist_rows:
        hists.setdefault(r.doc_id, [0] * 64)[r.bucket] = r["count"]
    assert set(hists) == set(arrow) and len(hists) == 500
    for doc_id, h in hists.items():
        nrm = math.sqrt(sum(c * c for c in h))
        got = arrow[doc_id]
        assert len(got) == 64
        for j in range(64):
            assert abs(h[j] / nrm - got[j]) < 1e-6, (doc_id, j)


def test_media_neardup_hot_bucket_ceiling_engages(spark, tmp_path):
    """The BUCKET_CEIL contract of q_media_neardup, which the driver
    fixture never exercises (its max bucket occupancy is 45 < 128):
    a mass-duplicated payload (200 identical copies — one signature
    bucket per band, size 200 > BUCKET_CEIL) is PRUNED, never
    pair-enumerated — exact copies belong to md5 dedup, the family's
    exact-first-then-near order — while an unrelated near-dup pair in
    a cold bucket still verifies. Same fixture shape as the text
    family's hot-bucket pin in tests/test_dedup_skew.py."""
    import hashlib
    import os

    from sparkstreamingflume_spark.plans.extension_queries import (
        q_media_neardup,
    )

    def words(tag: str, n: int) -> str:
        out = []
        i = 0
        while len(" ".join(out)) < n:
            out.append(hashlib.md5(f"{tag}:{i}".encode()).hexdigest()[:7])
            i += 1
        return " ".join(out)[:n]

    rows = []
    # 80 diverse seed docs (ids 0..79 feed the balanced-difference
    # planes at the 4x10-bit floor)
    for i in range(80):
        rows.append((i, words(f"seed{i}", 400)))
    # the hot block: 200 byte-identical payloads
    hot = words("hot", 500)
    for i in range(80, 280):
        rows.append((i, hot))
    # a cold near-dup pair: one character changed
    base = words("cold", 550)
    rows.append((280, base))
    rows.append((281, "X" + base[1:]))
    d = tmp_path / "fx"
    os.makedirs(d)
    spark.createDataFrame(
        [(i, t, "en", "t", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.parquet(str(d / "documents.parquet"))

    pairs = {
        (r.media_a, r.media_b): r.cos_ppm
        for r in q_media_neardup(spark, str(d)).collect()
    }
    hot_ids = set(range(80, 280))
    assert not any(
        a in hot_ids and b in hot_ids for a, b in pairs
    ), "hot bucket was pair-enumerated past BUCKET_CEIL"
    assert (280, 281) in pairs and pairs[(280, 281)] >= 999_000


def test_byte_histogram_counts_is_the_features_counting_core():
    """The binary-certification bridge (round-11 verdict task 4):
    byte_histogram_counts — the exact function q_media_neardup_binary
    runs inside its certified mapInPandas stage — is the counting core
    byte_histogram_features normalizes, on genuinely binary payloads
    (multi-byte UTF-8, full 0..255 random bytes, empty, None). So the
    oracle row's hash compare certifies every bucketing decision the
    normalized features would make (normalization never flips the sign
    of a dot product)."""
    import hashlib
    import math

    from sparkstreamingflume_spark.extensions.multimodal import (
        byte_histogram_counts,
        byte_histogram_features,
    )

    payloads = [
        "plain ascii text".encode(),
        "Ωψ火€· multi-byte ☃ ünïcodé".encode(),
        bytes(range(256)) * 3,
        hashlib.md5(b"chain").digest() * 5,
        b"",
        None,
    ]
    for b in payloads:
        c64 = byte_histogram_counts(b, 64)
        c256 = byte_histogram_counts(b, 256)
        # 64-bucket == re-bucketed 256-bucket (one core, two grains)
        assert c64 == [
            sum(c256[4 * k : 4 * k + 4]) for k in range(64)
        ]
        n = 0 if b is None else len(b)
        assert sum(c64) == n
        n_feat, _, feats = byte_histogram_features(b)
        assert n_feat == n
        if n == 0:
            assert feats == [0.0] * 64
            continue
        nrm = math.sqrt(sum(c * c for c in c64))
        for j in range(64):
            assert abs(feats[j] - c64[j] / nrm) < 1e-6, j


def test_media_neardup_non_ascii_raises_loudly(spark, tmp_path):
    """ADVICE r11 #2: q_media_neardup's char==byte histogram bridge
    only holds on an ASCII corpus; a codepoint >= 256 must RAISE
    in-plan (both engines carry the invariant), never silently mint a
    bucket > 63 while the cross-engine compare keeps passing."""
    import os

    import duckdb
    import pytest

    from sparkstreamingflume_spark.plans.registry import REGISTRY

    d = tmp_path / "fx"
    os.makedirs(d)
    rows = [(i, f"plain ascii doc {i} " * 20) for i in range(90)]
    rows.append((90, "smuggled non-ascii Ω voids the bridge " * 10))
    spark.createDataFrame(
        [(i, t, "en", "t", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.parquet(str(d / "documents.parquet"))

    q = REGISTRY["q_media_neardup"]
    with pytest.raises(Exception, match="non-ASCII codepoint"):
        q.build(spark, str(d)).collect()
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet/*.parquet')"
    )
    with pytest.raises(Exception, match="non-ASCII codepoint"):
        con.sql(q.oracle).fetchall()


def test_media_neardup_binary_payload_is_genuinely_binary(spark):
    """The certified binary plan's payload column really is opaque
    bytes: multi-byte UTF-8 sequences AND md5-chain bytes outside any
    UTF-8 text range (the full 0..255 span), with the documented
    per-doc length law — so the green driver row certifies the
    featurizer on binary input, not ASCII-coincident input."""
    from pyspark.sql import functions as F

    from sparkstreamingflume_spark.extensions.multimodal import (
        byte_histogram_counts,
    )
    from sparkstreamingflume_spark.plans.extension_queries import (
        MEDIA_BIN_TAIL,
        _docs,
    )

    sf = "/root/testdata/sf0.001"
    d = (
        _docs(spark, sf)
        .filter(F.length("text") > 0)
        .select(F.col("doc_id").alias("media_id"), "text")
        .limit(50)
    )
    payload = F.concat(
        F.encode(
            F.concat(
                F.col("text"),
                F.expr(
                    f"repeat('{MEDIA_BIN_TAIL}',"
                    " CAST(1 + media_id % 4 AS INT))"
                ),
            ),
            "UTF-8",
        ),
        F.expr(
            "unhex(concat_ws('', transform("
            "sequence(0, CAST(media_id % 3 AS INT)),"
            " j -> md5(concat(CAST(media_id AS STRING), ':',"
            " CAST(j AS STRING))))))"
        ),
    )
    rows = d.select("media_id", "text", payload.alias("payload")).collect()
    assert len(rows) == 50
    import hashlib

    for r in rows:
        b = bytes(r.payload)
        text_utf8 = (
            r.text + MEDIA_BIN_TAIL * (1 + r.media_id % 4)
        ).encode("utf-8")
        nb = 1 + r.media_id % 3
        rnd = b"".join(
            hashlib.md5(f"{r.media_id}:{j}".encode()).digest()
            for j in range(nb)
        )
        assert b == text_utf8 + rnd, r.media_id
        # genuinely non-ASCII: the tail has bytes >= 0x80
        assert any(x >= 128 for x in b), r.media_id
        counts = byte_histogram_counts(b, 64)
        assert sum(counts) == len(b)
