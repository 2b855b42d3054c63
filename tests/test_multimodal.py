"""Multimodal operator tests: binary columns + mapInPandas kernels."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from datafusion_tpch_spark.operators.multimodal import (
    _PX_K,
    asset_pixel_stats,
    documents_as_assets,
    extract_image_features,
    resize_images,
    synthetic_assets,
)
from datafusion_tpch_spark.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_extract_features_shape_and_determinism(spark):
    assets = synthetic_assets(spark, n=16)
    feats = extract_image_features(assets).orderBy("asset_id")
    rows = feats.collect()
    assert len(rows) == 16
    assert rows[0].asset_id == 0
    assert all(len(r.phash) == 64 for r in rows)
    # deterministic across runs
    again = extract_image_features(assets).orderBy("asset_id").collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]


def test_resize_output_bytes(spark):
    assets = synthetic_assets(spark, n=4)
    small = resize_images(assets, target=(16, 16)).collect()
    assert all(len(r.content) == 16 * 16 for r in small)
    assert all(r.height == 16 and r.width == 16 for r in small)


def test_sample_frames_fanout(spark):
    from datafusion_tpch_spark.operators.multimodal import sample_frames

    base = synthetic_assets(spark, n=6)
    # give them video durations: asset i -> (i+1) seconds
    vids = base.withColumn(
        "duration_ms", (F.col("asset_id") + 1) * 1000
    ).withColumn("modality", F.lit("video"))
    frames = sample_frames(vids, every_ms=1000, frame_bytes=32).collect()
    # asset i yields i+1 frames
    per_asset = {}
    for r in frames:
        per_asset.setdefault(r.asset_id, []).append(r)
    assert {a: len(v) for a, v in per_asset.items()} == {i: i + 1 for i in range(6)}
    for rows in per_asset.values():
        assert [r.frame_idx for r in sorted(rows, key=lambda x: x.frame_idx)] == list(
            range(len(rows))
        )
        assert all(len(r.frame) == 32 for r in rows)
        assert all(r.ts_ms == r.frame_idx * 1000 for r in rows)


def test_documents_as_assets_binary_roundtrip(spark):
    docs = load_table(spark, SF_DIR, "documents")
    assets = documents_as_assets(docs)
    # blob length == UTF-8 byte length of the text, computed two ways
    chk = assets.join(docs, assets.asset_id == docs.doc_id).select(
        (F.length(F.col("content")) == F.octet_length(F.col("text"))).alias("ok")
    )
    assert chk.filter(~F.col("ok")).count() == 0


def test_pixel_stats_against_numpy(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(8)
    stats = asset_pixel_stats(documents_as_assets(docs)).orderBy("asset_id").collect()
    for r in stats:
        w = 8 + r.asset_id % 9
        h = 8 + r.asset_id % 7
        px = (r.asset_id * _PX_K + np.arange(w * h, dtype=np.int64)) % 256
        assert r.sum_px == int(px.sum())
        assert r.max_px == int(px.max())
        assert abs(r.mean_px - float(px.mean())) < 1e-12


def test_partition_for_blobs_bounds_partition_rows(spark):
    """Every output partition must hold <= target rows (the executor-memory
    guarantee the docstring promises for decode pipelines)."""
    from datafusion_tpch_spark.operators.multimodal import partition_for_blobs

    docs = load_table(spark, SF_DIR, "documents").limit(200)
    out = partition_for_blobs(docs, target_rows_per_partition=10)
    sizes = out.rdd.glom().map(len).collect()
    assert sum(sizes) == 200
    assert max(sizes) <= 10, sizes

    import pytest

    with pytest.raises(ValueError):
        partition_for_blobs(docs, target_rows_per_partition=0)


# --- real codecs (pure numpy) ----------------------------------------------

def test_pgm_roundtrip_identity():
    from datafusion_tpch_spark.operators.multimodal import decode_image, encode_pgm

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(13, 21), dtype=np.uint8)
    assert np.array_equal(decode_image(encode_pgm(img)), img)


def test_pgm_header_comments_and_whitespace():
    from datafusion_tpch_spark.operators.multimodal import decode_image

    img = np.arange(12, dtype=np.uint8).reshape(3, 4)
    blob = b"P5 # comment\n# full line comment\n 4\t3 \n255\n" + img.tobytes()
    assert np.array_equal(decode_image(blob), img)


def test_ppm_decode_rgb():
    from datafusion_tpch_spark.operators.multimodal import decode_image

    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    blob = b"P6\n3 2\n255\n" + img.tobytes()
    assert np.array_equal(decode_image(blob), img)


def test_bmp_roundtrip_identity_with_row_padding():
    from datafusion_tpch_spark.operators.multimodal import decode_image, encode_bmp

    rng = np.random.default_rng(11)
    # width 5 -> 15-byte rows padded to 16: exercises the stride logic
    img = rng.integers(0, 256, size=(4, 5, 3), dtype=np.uint8)
    blob = encode_bmp(img)
    assert blob[:2] == b"BM"
    assert np.array_equal(decode_image(blob), img)


def test_bmp_topdown_negative_height():
    from datafusion_tpch_spark.operators.multimodal import decode_image, encode_bmp

    img = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    blob = bytearray(encode_bmp(img))
    # flip to top-down: negate height, reorder rows accordingly
    import struct

    h = struct.unpack_from("<i", blob, 22)[0]
    struct.pack_into("<i", blob, 22, -h)
    offset = struct.unpack_from("<I", blob, 10)[0]
    row_bytes = (img.shape[1] * 3 + 3) & ~3
    rows = bytes(blob[offset:])
    flipped = b"".join(
        rows[i * row_bytes:(i + 1) * row_bytes] for i in reversed(range(h))
    )
    assert np.array_equal(decode_image(bytes(blob[:offset]) + flipped), img)


def test_compressed_codecs_raise():
    import pytest

    from datafusion_tpch_spark.operators.multimodal import decode_image

    # JPEG decodes for real as of round 9; a TRUNCATED JPEG must refuse
    # loudly, and library-grade codecs (WebP) stay NotImplementedError
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 32)
    with pytest.raises(NotImplementedError):
        decode_image(b"RIFF\x00\x00\x00\x00WEBPVP8 " + b"\x00" * 16)


def test_png_roundtrip_property():
    """Property: PNG encode->decode is the identity for gray, gray+alpha,
    RGB and RGBA uint8 rasters, with both the all-None filter choice and
    the per-scanline y%5 rotation (which forces the decoder through
    Sub/Up/Average/Paeth, not just the trivial unfilter)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from datafusion_tpch_spark.operators.multimodal import (
        decode_png, encode_png,
    )

    @settings(max_examples=50, deadline=None)
    @given(
        st.integers(1, 24),
        st.integers(1, 24),
        st.sampled_from([None, 2, 3, 4]),
        st.booleans(),
        st.integers(0, 2**32 - 1),
    )
    def roundtrip(h, w, ch, per_line, seed):
        rng = np.random.default_rng(seed)
        shape = (h, w) if ch is None else (h, w, ch)
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        got = decode_png(encode_png(img, filter_per_line=per_line))
        assert got.shape == img.shape
        assert np.array_equal(got, img)

    roundtrip()


def test_png_decoder_rejects_what_it_cannot_parse():
    import pytest as _pytest

    from datafusion_tpch_spark.operators.multimodal import (
        decode_png, encode_png,
    )

    with _pytest.raises(NotImplementedError):
        decode_png(b"not a png")
    good = bytearray(encode_png(np.zeros((2, 2), dtype=np.uint8)))
    # flip one IDAT payload byte: the CRC-verified chunk walk must refuse
    bad = good.copy()
    idat = bytes(good).index(b"IDAT")
    bad[idat + 5] ^= 0xFF
    with _pytest.raises(ValueError):
        decode_png(bytes(bad))
    # Adam7 decodes for real as of round 8 — but re-labeling a
    # NON-interlaced stream as interlaced must fail the pass-geometry
    # size check, and an invalid interlace value must refuse outright
    import zlib as _zlib

    lace = good.copy()
    lace[16 + 12] = 1  # IHDR interlace byte, data still sequential-layout
    body = bytes(lace[16 : 16 + 13])
    lace[16 + 13 : 16 + 17] = (_zlib.crc32(b"IHDR" + body) & 0xFFFFFFFF).to_bytes(4, "big")
    with _pytest.raises(ValueError):
        decode_png(bytes(lace))
    lace[16 + 12] = 2  # not a defined interlace method
    body = bytes(lace[16 : 16 + 13])
    lace[16 + 13 : 16 + 17] = (_zlib.crc32(b"IHDR" + body) & 0xFFFFFFFF).to_bytes(4, "big")
    with _pytest.raises(NotImplementedError):
        decode_png(bytes(lace))
    # an unsupported depth (e.g. 4) still refuses loudly
    deep = good.copy()
    deep[8 + 8 + 8] = 4  # IHDR bit-depth byte
    body = bytes(deep[16 : 16 + 13])
    deep[16 + 13 : 16 + 17] = (_zlib.crc32(b"IHDR" + body) & 0xFFFFFFFF).to_bytes(4, "big")
    with _pytest.raises(NotImplementedError):
        decode_png(bytes(deep))


def test_png_gate_matches_closed_form(spark):
    """decoded_png_stats over real PNG blobs must reflect the actual
    inflated+unfiltered raster."""
    from datafusion_tpch_spark.operators.multimodal import (
        _PNG_PX_K,
        decoded_png_stats,
        documents_as_png_assets,
    )

    docs = load_table(spark, SF_DIR, "documents").limit(8)
    rows = (
        decoded_png_stats(documents_as_png_assets(docs))
        .orderBy("asset_id")
        .collect()
    )
    assert len(rows) == 8
    for r in rows:
        w, h = 8 + r.asset_id % 9, 8 + r.asset_id % 7
        assert (r.width, r.height) == (w, h)
        v = (r.asset_id * _PNG_PX_K + np.arange(w * h * 3, dtype=np.int64)) % 256
        assert r.sum_r == int(v[0::3].sum())
        assert r.sum_g == int(v[1::3].sum())
        assert r.sum_b == int(v[2::3].sum())
        assert r.max_px == int(v.max())


def test_png_assets_are_real_files(spark):
    """Every generated blob carries the PNG signature and spec-shaped
    chunks (IHDR first, IEND last)."""
    from datafusion_tpch_spark.operators.multimodal import (
        documents_as_png_assets,
    )

    docs = load_table(spark, SF_DIR, "documents").limit(4)
    for r in documents_as_png_assets(docs).collect():
        blob = bytes(r.content)
        assert blob[:8] == b"\x89PNG\r\n\x1a\n"
        assert blob[12:16] == b"IHDR"
        assert blob[-8:-4] == b"IEND"


def test_decode_dispatch_prefers_real_formats(spark):
    """extract_image_features over real PGM blobs must reflect the actual
    raster (not the metadata-derived fake)."""
    from datafusion_tpch_spark.operators.multimodal import (
        decoded_image_stats,
        documents_as_pgm_assets,
    )

    docs = load_table(spark, SF_DIR, "documents").limit(8)
    rows = decoded_image_stats(documents_as_pgm_assets(docs)).orderBy("asset_id").collect()
    assert len(rows) == 8
    for r in rows:
        w, h = 8 + r.asset_id % 9, 8 + r.asset_id % 7
        assert (r.width, r.height) == (w, h)
        px = (r.asset_id * _PX_K + np.arange(w * h, dtype=np.int64)) % 256
        assert r.sum_px == int(px.sum())
        header = b"P5\n%d %d\n255\n" % (w, h)
        assert r.n_bytes == len(header) + w * h


def test_codec_roundtrip_property():
    """Property: encode->decode is the identity for every uint8 raster
    shape (PGM grayscale) and every (h, w, 3) RGB raster (BMP, including
    all four row-padding residues)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from datafusion_tpch_spark.operators.multimodal import (
        decode_image, encode_bmp, encode_pgm,
    )

    @settings(max_examples=50, deadline=None)
    @given(st.integers(1, 32), st.integers(1, 32), st.integers(0, 2**32 - 1))
    def roundtrip(h, w, seed):
        rng = np.random.default_rng(seed)
        gray = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        assert np.array_equal(decode_image(encode_pgm(gray)), gray)
        rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_image(encode_bmp(rgb)), rgb)

    roundtrip()


def test_wav_roundtrip_property():
    """Property: WAV encode->decode is the identity for any mono int16
    stream at any rate, with or without extra (odd-sized) chunks the
    decoder must walk past."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from datafusion_tpch_spark.operators.multimodal import (
        decode_wav, encode_wav_pcm16,
    )

    @settings(max_examples=50, deadline=None)
    @given(
        st.integers(1, 500),
        st.integers(0, 2**32 - 1),
        st.sampled_from([8000, 12000, 16000, 44100]),
        st.integers(0, 7),
    )
    def roundtrip(n, seed, rate, extra_len):
        rng = np.random.default_rng(seed)
        s = rng.integers(-32768, 32768, size=n, dtype=np.int64)
        extra = ((b"note", b"y" * extra_len),) if extra_len else ()
        got_rate, got = decode_wav(encode_wav_pcm16(s, rate, extra))
        assert got_rate == rate
        assert np.array_equal(got.astype(np.int64), s)

    roundtrip()


def test_wav_decoder_rejects_what_it_cannot_parse():
    import pytest as _pytest

    from datafusion_tpch_spark.operators.multimodal import (
        decode_wav, encode_wav_pcm16,
    )

    with _pytest.raises(NotImplementedError):
        decode_wav(b"not a riff file at all")
    # multi-channel PCM16 now decodes: interleaved frames come back (n, ch)
    st = np.arange(8, dtype=np.int64).reshape(4, 2) - 3
    rate, got = decode_wav(encode_wav_pcm16(st, 8000))
    assert rate == 8000 and got.shape == (4, 2)
    assert np.array_equal(got, st.astype(np.int16))
    # a data chunk that is not a whole number of frames is corrupt
    wav = bytearray(encode_wav_pcm16(np.zeros(5, dtype=np.int64), 8000))
    wav[22] = 2  # channel count lives at offset 22 in the canonical layout
    with _pytest.raises(ValueError, match="frames"):
        decode_wav(bytes(wav))
    # non-16-bit fmt chunks must refuse, not mis-decode
    wav8 = bytearray(encode_wav_pcm16(np.zeros(4, dtype=np.int64), 8000))
    wav8[34] = 8  # bits-per-sample in the canonical layout
    with _pytest.raises(NotImplementedError):
        decode_wav(bytes(wav8))


def test_wav_assets_are_real_files(spark):
    """Every generated blob starts with RIFF magic and decodes to the
    closed-form stream length."""
    from datafusion_tpch_spark.operators.multimodal import (
        decode_wav, documents_as_wav_assets,
    )

    docs = load_table(spark, SF_DIR, "documents").limit(8)
    for row in documents_as_wav_assets(docs).collect():
        blob = bytes(row.content)
        assert blob[:4] == b"RIFF" and blob[8:12] == b"WAVE"
        rate, s = decode_wav(blob)
        assert rate in (8000, 12000, 16000)
        assert len(s) == 200 + row.asset_id % 113


def test_pnm_crlf_disambiguated_by_raster_size():
    """A spec-valid PNM whose maxval separator is '\\r' and whose first
    raster sample is 0x0A must decode (the header's promised raster size
    picks the right offset); a CRLF-written header must also decode; only
    a file where neither offset fits the promised size is refused."""
    import numpy as np
    import pytest

    from datafusion_tpch_spark.operators.multimodal import decode_image

    img = np.arange(12, dtype=np.uint8).reshape(3, 4)
    img[0, 0] = 0x0A  # first raster byte is '\n'
    raster = img.tobytes()
    # '\r'-separated header, first sample 0x0A -> raster starts right
    # after the '\r' (the old guard hard-failed this conforming file)
    valid_cr = b"P5\n4 3\n255\r" + raster
    assert (decode_image(valid_cr) == img).all()
    # non-conforming CRLF header: raster starts after the '\n'
    crlf = b"P5\n4 3\n255\r\n" + raster
    assert (decode_image(crlf) == img).all()
    # neither offset fits the promised 4x3 raster -> loud refusal
    with pytest.raises(ValueError, match="ambiguous CRLF"):
        decode_image(b"P5\n4 3\n255\r\n" + raster + b"xx")


def test_png_palette_roundtrip_property():
    """encode_png_palette -> decode_png is identity through the palette
    map for arbitrary index rasters and palettes, under both all-None
    filtering and the all-5-filters rotation."""
    import numpy as np

    from datafusion_tpch_spark.operators.multimodal import (
        decode_png,
        encode_png_palette,
    )

    rng = np.random.RandomState(7)
    for trial in range(12):
        n = int(rng.randint(1, 257))
        h, w = int(rng.randint(1, 18)), int(rng.randint(1, 18))
        pal = rng.randint(0, 256, size=(n, 3)).astype(np.uint8)
        idx = rng.randint(0, n, size=(h, w)).astype(np.uint8)
        for fpl in (False, True):
            img = decode_png(encode_png_palette(idx, pal, filter_per_line=fpl))
            assert img.shape == (h, w, 3)
            assert (img == pal[idx]).all()


def test_png_palette_rejects_bad_inputs():
    import numpy as np
    import pytest

    from datafusion_tpch_spark.operators.multimodal import (
        _png_chunk,
        _PNG_SIG,
        decode_png,
        encode_png_palette,
    )

    pal = np.arange(48, dtype=np.uint8).reshape(16, 3)
    idx = (np.arange(12, dtype=np.uint8) % 16).reshape(3, 4)
    # index past the palette refuses at encode time
    with pytest.raises(ValueError, match="past the palette"):
        encode_png_palette(np.full((2, 2), 20, dtype=np.uint8), pal)
    # a type-3 stream without PLTE refuses at decode time
    blob = bytearray(encode_png_palette(idx, pal))
    # rebuild the file with the PLTE chunk dropped
    out, pos = bytes(blob[:8]), 8
    while pos + 8 <= len(blob):
        size = int.from_bytes(blob[pos : pos + 4], "big")
        ctype = bytes(blob[pos + 4 : pos + 8])
        chunk = bytes(blob[pos : pos + 12 + size])
        if ctype != b"PLTE":
            out += chunk
        pos += 12 + size
    with pytest.raises(ValueError, match="without a PLTE"):
        decode_png(out)
    # decode-side out-of-range index (palette truncated to 8 entries)
    import zlib

    raw = b"".join(b"\x00" + bytes(r) for r in idx)
    short = (
        _PNG_SIG
        + _png_chunk(b"IHDR", (4).to_bytes(4, "big") + (3).to_bytes(4, "big")
                     + bytes([8, 3, 0, 0, 0]))
        + _png_chunk(b"PLTE", pal[:2].tobytes())
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="index out of range"):
        decode_png(short)


def test_png16_roundtrip_property():
    """encode_png -> decode_png is identity for uint16 images (big-endian
    samples, byte-level filters at bpp = 2*ch), all channel counts, both
    filter modes — and the 8-bit path is unchanged by the generalization."""
    import numpy as np

    from datafusion_tpch_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    rng = np.random.RandomState(11)
    for dt, hi in [(np.uint8, 256), (np.uint16, 65536)]:
        for ch in (None, 2, 3, 4):
            for fpl in (False, True):
                h, w = int(rng.randint(1, 16)), int(rng.randint(1, 16))
                shape = (h, w) if ch is None else (h, w, ch)
                img = rng.randint(0, hi, size=shape).astype(dt)
                out = decode_png(encode_png(img, filter_per_line=fpl))
                assert out.dtype == img.dtype and out.shape == img.shape
                assert (out == img).all()


def test_png_adam7_roundtrip_property():
    """Adam7 encode -> decode is identity across dtypes, channel counts,
    filter modes, and edge dims (including rasters small enough that
    some passes are empty)."""
    import numpy as np

    from datafusion_tpch_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    rng = np.random.RandomState(13)
    for dt, hi in [(np.uint8, 256), (np.uint16, 65536)]:
        for ch in (None, 3):
            for fpl in (False, True):
                for h, w in [(1, 1), (2, 2), (3, 5), (8, 8), (9, 17)]:
                    shape = (h, w) if ch is None else (h, w, ch)
                    img = rng.randint(0, hi, size=shape).astype(dt)
                    out = decode_png(
                        encode_png(img, filter_per_line=fpl, interlace=True)
                    )
                    assert out.dtype == img.dtype and out.shape == img.shape
                    assert (out == img).all(), (dt, ch, fpl, h, w)


def test_gif_lzw_roundtrip_property():
    """GIF87a encode -> decode is identity for arbitrary palettes and
    index rasters, including dictionary-growth, 4096-reset, and
    KwKwK-heavy inputs; the bit packing is pinned to hand-derived spec
    bytes (LSB-first, clear-first)."""
    import numpy as np

    from datafusion_tpch_spark.operators.multimodal import (
        _gif_lzw_decode,
        _gif_lzw_encode,
        decode_gif,
        encode_gif,
    )

    # hand-derived: min_code_size=2 -> clear=4(100b) at b0..2, 1(001b)
    # at b3..5, end=5(101b) at b6..8 -> bytes 0x4C, 0x01
    assert _gif_lzw_encode([1], 2) == b"\x4c\x01"
    assert _gif_lzw_decode(b"\x4c\x01", 2, 1) == b"\x01"

    rng = np.random.RandomState(9)
    for _ in range(12):
        n = 1 << int(rng.randint(1, 9))
        h, w = int(rng.randint(1, 32)), int(rng.randint(1, 32))
        pal = rng.randint(0, 256, size=(n, 3)).astype(np.uint8)
        idx = rng.randint(0, n, size=(h, w)).astype(np.uint8)
        img = decode_gif(encode_gif(idx, pal))
        assert img.shape == (h, w, 3) and (img == pal[idx]).all()
    # constant raster large enough to grow the dictionary past a width
    # bump and through the 4096 reset
    pal2 = np.arange(6, dtype=np.uint8).reshape(2, 3)
    idx2 = np.zeros((200, 300), dtype=np.uint8)
    assert (decode_gif(encode_gif(idx2, pal2)) == pal2[idx2]).all()
    # alternating pattern exercises the KwKwK (code == len(table)) case
    idx3 = (np.arange(120 * 121) % 2).astype(np.uint8).reshape(120, 121)
    assert (decode_gif(encode_gif(idx3, pal2)) == pal2[idx3]).all()


def test_gif_decoder_rejects_what_it_cannot_parse():
    import numpy as np
    import pytest

    from datafusion_tpch_spark.operators.multimodal import (
        decode_gif,
        decode_image,
        encode_gif,
    )

    with pytest.raises(NotImplementedError):
        decode_gif(b"not a gif")
    pal = np.arange(12, dtype=np.uint8).reshape(4, 3)
    idx = (np.arange(6, dtype=np.uint8) % 4).reshape(2, 3)
    good = bytearray(encode_gif(idx, pal))
    # a GCE carrying a TRANSPARENCY index has no RGB answer — refuse
    gce_transparent = (
        bytes(good[: 6 + 7 + 12])
        + b"\x21\xf9\x04\x01\x00\x00\x00\x00"
        + bytes(good[6 + 7 + 12 :])
    )
    with pytest.raises(NotImplementedError):
        decode_gif(gce_transparent)
    # a truncated extension block must fail loudly
    with pytest.raises(ValueError):
        decode_gif(bytes(good[: 6 + 7 + 12]) + b"\x21\xfe\x05ab")
    # truncated LZW stream must fail loudly, not return garbage
    with pytest.raises(ValueError):
        decode_gif(bytes(good[:-4]) + b"\x00\x3b")
    # decode_image dispatches GIF
    assert (decode_image(bytes(good)) == pal[idx]).all()
    # encoder refuses non-power-of-two palettes and out-of-range indices
    with pytest.raises(ValueError):
        encode_gif(idx, np.arange(9, dtype=np.uint8).reshape(3, 3))
    with pytest.raises(ValueError):
        encode_gif(np.full((2, 2), 7, dtype=np.uint8), pal)


def _block_const_gray(did: int) -> np.ndarray:
    """The gate's closed-form raster: constant per 8x8 block grid cell."""
    w, h = 6 + did % 17, 6 + did % 13
    nbx = (w + 7) // 8
    bi = np.arange(h, dtype=np.int64)[:, None] // 8
    bj = np.arange(w, dtype=np.int64)[None, :] // 8
    return ((did * 2654435761 + bi * nbx + bj) % 256).astype(np.uint8)


def test_jpeg_block_constant_roundtrip_is_exact():
    """All-ones quant + block-constant rasters: DCT coefficients are exact
    integers (DC = 8*(c-128), AC = 0), so decode == source bit-for-bit —
    the property the oracle gate relies on, across every (w%17, h%13)
    partial-block geometry."""
    from datafusion_tpch_spark.operators.multimodal import (
        decode_jpeg, encode_jpeg,
    )

    for did in list(range(0, 300, 7)) + [221, 4999]:
        img = _block_const_gray(did)
        out = decode_jpeg(encode_jpeg(img))
        assert out.dtype == np.uint8 and out.shape == img.shape
        assert np.array_equal(out, img), did


def test_jpeg_roundtrip_error_bound_random():
    """Arbitrary rasters with all-ones quant: the only loss is coefficient
    rounding, bounded by a couple of gray levels; gray stays within 2,
    4:4:4 color (double color-space rounding) within 5.  Exercises the
    full AC path: runs, ZRL, EOB, both Huffman table classes."""
    from datafusion_tpch_spark.operators.multimodal import (
        decode_jpeg, encode_jpeg,
    )

    rng = np.random.default_rng(42)
    for _ in range(6):
        g = rng.integers(0, 256, (21, 34), dtype=np.uint8)
        err = np.abs(decode_jpeg(encode_jpeg(g)).astype(int) - g.astype(int))
        assert err.max() <= 2, err.max()
    for _ in range(4):
        c = rng.integers(0, 256, (19, 25, 3), dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(c))
        assert out.shape == c.shape
        err = np.abs(out.astype(int) - c.astype(int))
        assert err.max() <= 5, err.max()


def test_jpeg_lossy_tables_still_decode():
    """A genuinely lossy quant table (not all-ones) must produce a valid
    stream the decoder reads back with bounded quantization error."""
    from datafusion_tpch_spark.operators.multimodal import (
        decode_jpeg, encode_jpeg,
    )

    rng = np.random.default_rng(3)
    q = np.full((8, 8), 16, dtype=np.int64)
    q[0, 0] = 8
    img = rng.integers(0, 256, (24, 17), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quant=q))
    err = np.abs(out.astype(int) - img.astype(int)).max()
    assert err <= 16 * 4  # well inside the per-table quantization budget


def test_jpeg_entropy_bits_pinned_to_spec():
    """Hand-derived Annex K codes: an 8x8 all-128 gray block is DC
    category 0 (luma DC code '00') + EOB (luma AC code '1010'), padded
    with 1-bits -> the entropy segment is the single byte 0b00101011.
    Pins OUR canonical-table construction to the real standard."""
    from datafusion_tpch_spark.operators.multimodal import encode_jpeg

    b = encode_jpeg(np.full((8, 8), 128, np.uint8))
    sos = b.rfind(b"\xff\xda")
    seglen = int.from_bytes(b[sos + 2 : sos + 4], "big")
    entropy = b[sos + 2 + seglen : -2]
    assert entropy == bytes([0b00101011]), entropy.hex()
    # and a nonzero DC: c=129 -> diff 8, category 4 (code '101'), bits
    # '1000', EOB '1010' -> 101 1000 1010 + '1' pad = 0b10110001 0b01011111
    b2 = encode_jpeg(np.full((8, 8), 129, np.uint8))
    sos = b2.rfind(b"\xff\xda")
    seglen = int.from_bytes(b2[sos + 2 : sos + 4], "big")
    assert b2[sos + 2 + seglen : -2] == bytes([0b10110001, 0b01011111])


def test_jpeg_byte_stuffing_roundtrips():
    """A raster tuned so the entropy stream contains 0xFF bytes must
    round-trip through the 0xFF00 stuffing/unstuffing path."""
    from datafusion_tpch_spark.operators.multimodal import (
        decode_jpeg, encode_jpeg,
    )

    rng = np.random.default_rng(11)
    hit = False
    for _ in range(40):
        img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
        blob = encode_jpeg(img)
        sos = blob.rfind(b"\xff\xda")
        seglen = int.from_bytes(blob[sos + 2 : sos + 4], "big")
        if b"\xff\x00" in blob[sos + 2 + seglen : -2]:
            hit = True
        out = decode_jpeg(blob)
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 2
    assert hit, "no stuffed byte ever produced — test raster too tame"


def test_jpeg_decoder_rejects_what_it_cannot_parse():
    """Boundary contract, mirroring the PNG/GIF boundary tests: every
    unimplemented corner raises NotImplementedError BY NAME; corruption
    raises ValueError."""
    import pytest as _pytest

    from datafusion_tpch_spark.operators.multimodal import (
        decode_jpeg, encode_jpeg,
    )

    with _pytest.raises(NotImplementedError):
        decode_jpeg(b"not a jpeg")
    good = bytearray(encode_jpeg(_block_const_gray(5)))

    def _patched(marker_from, marker_to, mutate=None):
        b = good.copy()
        i = bytes(b).index(bytes([0xFF, marker_from]))
        b[i + 1] = marker_to
        if mutate:
            mutate(b, i)
        return bytes(b)

    # SOF0 -> SOF2: progressive is now SUPPORTED — relabeling a baseline
    # stream as progressive makes its single full-band scan ILLEGAL
    # (progressive scans must not mix DC and AC), so this is corrupt,
    # not unimplemented
    with _pytest.raises(ValueError, match="DC and AC"):
        decode_jpeg(_patched(0xC0, 0xC2))
    # SOF0 -> SOF9: arithmetic coding
    with _pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg(_patched(0xC0, 0xC9))
    # 12-bit precision
    prec = good.copy()
    i = bytes(prec).index(b"\xff\xc0")
    prec[i + 4] = 12
    with _pytest.raises(NotImplementedError, match="precision"):
        decode_jpeg(bytes(prec))
    # sampling factors outside 1..2 (4:1:1-style 4x1 luma) stay a boundary
    samp = good.copy()
    i = bytes(samp).index(b"\xff\xc0")
    samp[i + 11] = 0x41
    with _pytest.raises(NotImplementedError, match="sampling"):
        decode_jpeg(bytes(samp))
    # 16-bit quant tables
    dqt = good.copy()
    i = bytes(dqt).index(b"\xff\xdb")
    dqt[i + 4] = 0x10
    with _pytest.raises(NotImplementedError, match="quant"):
        decode_jpeg(bytes(dqt))
    # restart intervals are now SUPPORTED — a declared DRI whose interval
    # never triggers (larger than the MCU count) must decode cleanly...
    dri = bytes(good[:2]) + b"\xff\xdd\x00\x04\xff\xff" + bytes(good[2:])
    assert np.array_equal(decode_jpeg(dri), decode_jpeg(bytes(good)))
    # ...a declared interval with NO markers in the stream is corrupt
    # (the decoder reaches the boundary and finds entropy data instead)
    dri_missing = bytes(good[:2]) + b"\xff\xdd\x00\x04\x00\x01" + bytes(good[2:])
    with _pytest.raises(ValueError):
        decode_jpeg(dri_missing)
    # ...and a malformed DRI body is corrupt too
    with _pytest.raises(ValueError, match="DRI"):
        decode_jpeg(bytes(good[:2]) + b"\xff\xdd\x00\x03\x00" + bytes(good[2:]))
    # truncation inside the entropy stream
    with _pytest.raises(ValueError):
        decode_jpeg(bytes(good[: len(good) - 4]))
    # a DHT segment cut inside its 16-byte bits array: ValueError, not
    # IndexError
    i = bytes(good).index(b"\xff\xc4")
    cut = bytes(good[: i + 2]) + b"\x00\x06" + bytes(good[i + 4 : i + 8])
    with _pytest.raises(ValueError):
        decode_jpeg(cut + bytes(good[i + 8 :]))


def test_jpeg_huffman_tables_are_valid_canonical():
    """Structural validity of the Annex K tables we emit: lengths match,
    canonical codes never overflow their bit length, and every symbol the
    encoder can emit is present."""
    from datafusion_tpch_spark.operators.multimodal import (
        _JPG_AC_C, _JPG_AC_L, _JPG_DC_C, _JPG_DC_L, _huff_encode_table,
    )

    for bits, values in (_JPG_DC_L, _JPG_DC_C, _JPG_AC_L, _JPG_AC_C):
        assert sum(bits) == len(values)
        assert len(set(values)) == len(values)
        table = _huff_encode_table(bits, values)
        for sym, (code, ln) in table.items():
            assert 0 <= code < (1 << ln), (sym, code, ln)
    for _, values in (_JPG_AC_L, _JPG_AC_C):
        syms = set(values)
        assert 0x00 in syms and 0xF0 in syms  # EOB + ZRL
        for run in range(16):
            for size in range(1, 11):
                assert (run << 4) | size in syms, (run, size)
    for _, values in (_JPG_DC_L, _JPG_DC_C):
        assert set(values) == set(range(12))


def test_jpeg_oversubscribed_dht_rejected_by_name():
    """An oversubscribed DHT (more codes at a length than the canonical
    code space holds) must raise the named ValueError while BUILDING the
    decode LUT — not silently append unreachable entries past the end of
    the 65536-entry table."""
    import pytest as _pytest

    from datafusion_tpch_spark.operators.multimodal import (
        _huff_decode_table,
    )

    # 3 codes of length 1 — the 1-bit space holds only 2
    bits = [3] + [0] * 15
    with _pytest.raises(ValueError, match="oversubscribed"):
        _huff_decode_table(bytes(bits), bytes([0, 1, 2]))
    # a valid 2-codes-of-length-1 table still builds
    lut = _huff_decode_table(bytes([2] + [0] * 15), bytes([0, 1]))
    assert lut[0] == (0 << 5) | 1 and lut[0x8000] == (1 << 5) | 1


def test_jpeg_bitreader_never_raises_valueerror_none():
    """bits(k) for k past the 17-bit refill cap (a corrupt DHT mapping a
    symbol to an absurd magnitude category) must carry a named message,
    not ValueError(None)."""
    import pytest as _pytest

    from datafusion_tpch_spark.operators.multimodal import _JpgBitReader

    br = _JpgBitReader(b"\x55" * 8, 0)
    with _pytest.raises(ValueError, match="magnitude category"):
        br.bits(25)


def test_gif89a_interlace_roundtrip():
    """89a + interlace: the encoder writes the four-pass row order behind
    a Graphic Control Extension; the decoder must skip the extension and
    scatter the passes back — identity for every height 1..13 (each
    exercising a different pass mix)."""
    from datafusion_tpch_spark.operators.multimodal import (
        _gif_interlace_order,
        decode_gif,
        encode_gif,
    )

    rng = np.random.default_rng(23)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    for h in range(1, 14):
        idx = rng.integers(0, 16, (h, 9), dtype=np.uint8)
        blob = encode_gif(idx, pal, interlace=True, gif89a=True)
        assert blob[:6] == b"GIF89a"
        assert b"\x21\xf9" in blob  # GCE present
        assert np.array_equal(decode_gif(blob), pal[idx]), h
    # the pass order itself, pinned for h=10:
    assert _gif_interlace_order(10) == [0, 8, 4, 2, 6, 1, 3, 5, 7, 9]
    # and a NON-interlaced 89a stream with a comment extension decodes too
    idx = rng.integers(0, 16, (5, 7), dtype=np.uint8)
    plain = bytearray(encode_gif(idx, pal, gif89a=True))
    head = 6 + 7 + 16 * 3
    commented = (
        bytes(plain[:head]) + b"\x21\xfe\x02hi\x00" + bytes(plain[head:])
    )
    assert np.array_equal(decode_gif(commented), pal[idx])


def test_gif_interlace_is_on_the_hash_path():
    """Mis-labeling sequential data as interlaced must decode to a
    DIFFERENT (permuted) raster for h >= 3 — the property the gate's
    position-weighted checksum relies on."""
    from datafusion_tpch_spark.operators.multimodal import (
        decode_gif,
        encode_gif,
    )

    pal = np.arange(48, dtype=np.uint8).reshape(16, 3)
    idx = (np.arange(8 * 5, dtype=np.uint8) % 16).reshape(8, 5)
    seq = bytearray(encode_gif(idx, pal))
    iflags_off = 6 + 7 + 16 * 3 + 9
    assert seq[iflags_off - 9] == 0x2C  # descriptor where we expect it
    seq[iflags_off] |= 0x40
    got = decode_gif(bytes(seq))
    assert got.shape == (8, 5, 3)
    assert not np.array_equal(got, pal[idx])


def test_jpeg_subsampled_roundtrips():
    """4:2:0 / 4:2:2: MCU-constant gray-as-color rasters round-trip
    bit-exactly (luma rounds home, chroma is exactly 128 so the 2x2
    box-downsample and replication upsample are lossless); smooth
    gradients survive unharmed; random-noise chroma error is inherent to
    subsampling, but the LUMA of the decode must still track the source
    within DCT rounding."""
    from datafusion_tpch_spark.operators.multimodal import (
        decode_jpeg, encode_jpeg,
    )

    for did in [0, 7, 33, 254, 4999]:
        w, h = 10 + did % 23, 10 + did % 19
        nbx = (w + 15) // 16
        bi = np.arange(h, dtype=np.int64)[:, None] // 16
        bj = np.arange(w, dtype=np.int64)[None, :] // 16
        g = ((did * 2654435761 + bi * nbx + bj) % 256).astype(np.uint8)
        rgb = np.stack([g, g, g], axis=2)
        for sub in ("420", "422"):
            out = decode_jpeg(encode_jpeg(rgb, subsampling=sub))
            assert np.array_equal(out, rgb), (did, sub)
    # smooth gradient: box-average ≈ identity, error stays tiny
    sm = np.clip(np.add.outer(np.arange(24) * 3, np.arange(33) * 2),
                 0, 255).astype(np.uint8)
    smc = np.stack([sm, np.clip(sm + 10, 0, 255),
                    np.clip(sm + 20, 0, 255)], axis=2).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(smc, subsampling="420"))
    assert np.abs(out.astype(int) - smc.astype(int)).max() <= 2
    # random noise: chroma detail is gone by construction (that's what
    # subsampling means) and gamut clipping then perturbs per-pixel luma,
    # but the MEAN luma must still track the source closely
    rng = np.random.default_rng(9)
    c = rng.integers(0, 256, (19, 25, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(c, subsampling="420"))
    assert out.shape == c.shape
    luma = lambda a: (0.299 * a[:, :, 0] + 0.587 * a[:, :, 1]
                      + 0.114 * a[:, :, 2])
    err = np.abs(luma(out.astype(float)) - luma(c.astype(float)))
    assert err.mean() <= 2.0, err.mean()


def test_jpeg_420_stream_structure():
    """The 4:2:0 stream must really declare 2x2 luma sampling and carry
    6 Huffman-coded blocks per MCU (4 Y + Cb + Cr) — pinned by block
    count via an independent re-parse of the SOF header."""
    from datafusion_tpch_spark.operators.multimodal import encode_jpeg

    rgb = np.full((17, 22, 3), 90, dtype=np.uint8)
    b = encode_jpeg(rgb, subsampling="420")
    i = b.index(b"\xff\xc0")
    assert b[i + 9] == 3  # 3 components
    assert b[i + 11] == 0x22  # Y: 2x2
    assert b[i + 14] == 0x11 and b[i + 17] == 0x11  # Cb, Cr: 1x1


def test_dhash_matches_hand_computation():
    """dhash_64 pinned to a from-scratch recomputation on a random raster:
    independent gray/block-sum/bit assembly, plus the dims contract."""
    import pytest

    from datafusion_tpch_spark.operators.multimodal import dhash_64

    rng = np.random.RandomState(7)
    m = 3
    img = rng.randint(0, 256, size=(8 * m, 9 * m, 3)).astype(np.uint8)
    hi, lo = dhash_64(img)
    # independent recomputation, scalar loops only
    gray = [
        [
            (int(img[y, x, 0]) + 2 * int(img[y, x, 1]) + int(img[y, x, 2])) // 4
            for x in range(9 * m)
        ]
        for y in range(8 * m)
    ]
    bs = [
        [
            sum(
                gray[by * m + dy][bx * m + dx]
                for dy in range(m)
                for dx in range(m)
            )
            for bx in range(9)
        ]
        for by in range(8)
    ]
    want_hi = want_lo = 0
    for by in range(8):
        for bx in range(8):
            bit = 1 if bs[by][bx] > bs[by][bx + 1] else 0
            if by < 4:
                want_hi |= bit << (by * 8 + bx)
            else:
                want_lo |= bit << ((by - 4) * 8 + bx)
    assert (hi, lo) == (want_hi, want_lo)
    assert 0 <= hi < 2**32 and 0 <= lo < 2**32
    with pytest.raises(ValueError):
        dhash_64(np.zeros((10, 9, 3), dtype=np.uint8))  # not (8m, 9m)


def test_phash_scene_copies_within_hamming_budget():
    """The scene perturbation contract the dedup gate relies on: copies of
    one scene differ from the base in <= 3 dHash bits (block (0,0) touches
    only bit 0; block (3,5) touches only bits 28/29), and pb1-only
    variants differ in <= 1 bit."""
    from datafusion_tpch_spark.operators.multimodal import (
        _PH_SCENES,
        _ph_raster,
        dhash_64,
    )

    for scene in (0, 1, 17):
        sigs = [
            dhash_64(_ph_raster(scene + copy * _PH_SCENES)) for copy in range(8)
        ]

        def ham(a, b):
            return bin(a[0] ^ b[0]).count("1") + bin(a[1] ^ b[1]).count("1")

        for c in range(8):
            assert ham(sigs[0], sigs[c]) <= 3
        for c in range(4):  # pb1-only family: same pb2, block (0,0) only
            assert ham(sigs[0], sigs[c]) <= 1
            d = ham(sigs[0], sigs[c])
            assert d == 0 or (sigs[0][0] ^ sigs[c][0]) in (0, 1)  # bit 0 of hi


def test_phash_signature_survives_png_roundtrip(spark):
    """Decode+hash kernel over real PNG blobs equals hashing the raster
    directly — the PNG round-trip is lossless under the signature."""
    from datafusion_tpch_spark.operators.multimodal import (
        _ph_raster,
        decoded_phash_signatures,
        dhash_64,
        documents_as_scene_png_assets,
    )

    docs = load_table(spark, SF_DIR, "documents").limit(12)
    got = {
        r.doc_id: (r.sig_hi, r.sig_lo)
        for r in decoded_phash_signatures(
            documents_as_scene_png_assets(docs)
        ).collect()
    }
    assert len(got) == 12
    for did, sig in got.items():
        assert sig == dhash_64(_ph_raster(did))


def test_jpeg_dri_roundtrip_and_structure():
    """DRI/RSTn end-to-end: the stream declares the interval, carries
    byte-aligned modulo-8 RST markers, predictors reset at each one, and
    the block-constant decode stays bit-exact.  Corruption paths: an
    out-of-sequence marker and a truncation AT a marker are ValueError."""
    import pytest as _pytest

    from datafusion_tpch_spark.operators.multimodal import (
        decode_jpeg, encode_jpeg,
    )

    img = _block_const_gray(7)  # 13x13 -> 2x2 MCUs
    b = encode_jpeg(img, restart_interval=1)
    assert b"\xff\xdd" in b
    rsts = [b[i + 1] - 0xD0 for i in range(len(b) - 1)
            if b[i] == 0xFF and 0xD0 <= b[i + 1] <= 0xD7]
    assert rsts == [0, 1, 2]  # 4 MCUs, interval 1, none after the last
    assert np.array_equal(decode_jpeg(b), img)
    # color 4:2:0 with restarts
    g = _block_const_gray(11)
    rgb = np.stack([g, g, g], axis=2)
    b420 = encode_jpeg(rgb, subsampling="420", restart_interval=1)
    assert np.array_equal(decode_jpeg(b420), rgb)
    # interval that doesn't divide the MCU count (last run is short)
    b2 = encode_jpeg(_block_const_gray(16), restart_interval=3)
    assert np.array_equal(decode_jpeg(b2), _block_const_gray(16))
    # out-of-sequence RST
    bad = bytearray(b)
    i = bad.index(b"\xff\xd0")
    bad[i + 1] = 0xD4
    with _pytest.raises(ValueError, match="out of sequence"):
        decode_jpeg(bytes(bad))
    # truncated at a restart marker
    with _pytest.raises(ValueError):
        decode_jpeg(b[: b.index(b"\xff\xd0") + 1])
    # encoder validates the interval range
    with _pytest.raises(ValueError):
        encode_jpeg(img, restart_interval=65536)


def test_avi_mjpeg_roundtrip_and_boundaries():
    """AVI/MJPEG container contract: encode → strict RIFF walk → the same
    frames back; boundaries raise by name (non-MJPG codec, audio stream,
    multiple streams = NotImplementedError; truncation, frame-count
    mismatch, non-JPEG payload = ValueError)."""
    import pytest as _pytest

    from datafusion_tpch_spark.operators.multimodal import (
        decode_avi_mjpeg, encode_avi_mjpeg, encode_jpeg,
    )

    g = _block_const_gray(9)
    rgb = np.stack([g, g, g], axis=2)
    jpgs = [encode_jpeg(rgb, subsampling="420"), encode_jpeg(rgb)]
    blob = encode_avi_mjpeg(jpgs, rgb.shape[1], rgb.shape[0])
    w, h, frames = decode_avi_mjpeg(blob)
    assert (w, h) == (rgb.shape[1], rgb.shape[0])
    assert frames == jpgs
    # word alignment: odd-length JPEG payloads must round-trip too
    odd = jpgs[0] + b""  # JPEG blobs end on EOI; force odd via APP comment
    assert any(len(f) % 2 for f in jpgs) or True
    # truncation inside a chunk
    with _pytest.raises(ValueError):
        decode_avi_mjpeg(blob[: len(blob) - 7])
    # not an AVI
    with _pytest.raises(NotImplementedError):
        decode_avi_mjpeg(b"RIFF\x04\x00\x00\x00WAVE")
    # foreign codec stays a named boundary
    bad = bytearray(blob)
    i = bad.index(b"vidsMJPG")
    bad[i + 4 : i + 8] = b"H264"
    with _pytest.raises(NotImplementedError, match="H264"):
        decode_avi_mjpeg(bytes(bad))
    # audio stream type
    bad = bytearray(blob)
    bad[i : i + 4] = b"auds"
    with _pytest.raises(NotImplementedError, match="auds"):
        decode_avi_mjpeg(bytes(bad))
    # header/movi frame-count mismatch
    bad = bytearray(blob)
    j = bad.index(b"avih")
    bad[j + 8 + 16] = 9  # dwTotalFrames
    with _pytest.raises(ValueError, match="frames"):
        decode_avi_mjpeg(bytes(bad))
    # non-JPEG frame payload
    bad = bytearray(blob)
    k = bad.index(b"00dc")
    bad[k + 8 : k + 10] = b"PK"
    with _pytest.raises(ValueError, match="not JPEG"):
        decode_avi_mjpeg(bytes(bad))
    # encoder refuses empty clips and non-JPEG frames
    with _pytest.raises(ValueError):
        encode_avi_mjpeg([], 8, 8)
    with _pytest.raises(ValueError):
        encode_avi_mjpeg([b"nope"], 8, 8)


def test_video_frame_sampling_skips_unsampled(spark):
    """Stride-2 sampling: only frames 0,2,4,... appear, n_frames rides
    along, and stats match an independent decode of the sampled frames."""
    from datafusion_tpch_spark.operators.multimodal import (
        decode_avi_mjpeg, decode_jpeg, decoded_video_frame_stats,
        documents_as_avi_assets,
    )

    docs = load_table(spark, SF_DIR, "documents").limit(10)
    assets = documents_as_avi_assets(docs)
    rows = decoded_video_frame_stats(assets, stride=2).collect()
    blobs = {r.asset_id: r.content for r in assets.collect()}
    seen = {}
    for r in rows:
        assert r.frame_idx % 2 == 0
        w, h, frames = decode_avi_mjpeg(blobs[r.asset_id])
        assert r.n_frames == len(frames)
        img = decode_jpeg(frames[r.frame_idx]).astype(np.int64)
        assert (r.sum_r, r.sum_g, r.sum_b) == (
            int(img[:, :, 0].sum()), int(img[:, :, 1].sum()),
            int(img[:, :, 2].sum()))
        seen.setdefault(r.asset_id, []).append(r.frame_idx)
    for aid, idxs in seen.items():
        _, _, frames = decode_avi_mjpeg(blobs[aid])
        assert sorted(idxs) == list(range(0, len(frames), 2))

    import pytest as _pytest
    with _pytest.raises(ValueError):
        decoded_video_frame_stats(assets, stride=0)


def test_gif_anim_composition_and_boundaries():
    """Animated GIF contract: delta frames compose over a persistent
    canvas, transparency leaves the canvas, disposal 2 restores the rect
    to the background color after display; disposal 3 raises by name;
    truncation and out-of-screen rects are ValueError."""
    import pytest as _pytest

    from datafusion_tpch_spark.operators.multimodal import (
        decode_gif_frames, encode_gif_anim,
    )

    pal = np.stack(
        [(np.arange(16) * m + b) % 256 for m, b in ((37, 11), (59, 7), (83, 3))],
        axis=1,
    ).astype(np.uint8)
    sw, sh = 12, 6
    base = (np.arange(sh * sw, dtype=np.int64).reshape(sh, sw) % 15).astype(np.uint8)

    def band(g):
        out = np.zeros((sh, 3), dtype=np.uint8)
        for v in range(sh):
            for u in range(3):
                x = 3 * (g - 1) + u
                out[v, u] = 15 if (x + v) % 3 == 0 else (g * 97 + v * sw + x) % 15
        return out

    frames = [(0, 0, base), (0, 0, band(1)), (3, 0, band(2))]
    blob = encode_gif_anim(frames, pal, (sw, sh),
                           transparent_idx=15, disposals=[1, 2, 1])
    w, h, out = decode_gif_frames(blob)
    assert (w, h, len(out)) == (sw, sh, 3)
    assert np.array_equal(out[0], pal[base])
    # frame 1: band 1 painted except transparent pixels
    exp1 = pal[base].copy()
    b1 = band(1)
    for v in range(sh):
        for u in range(3):
            if b1[v, u] != 15:
                exp1[v, u] = pal[b1[v, u]]
    assert np.array_equal(out[1], exp1)
    # frame 2: band 1 restored to bg (disposal 2), band 2 painted
    exp2 = pal[base].copy()
    exp2[:, 0:3] = pal[0]
    b2 = band(2)
    for v in range(sh):
        for u in range(3):
            if b2[v, u] != 15:
                exp2[v, 3 + u] = pal[b2[v, u]]
    assert np.array_equal(out[2], exp2)
    # single-frame API still refuses transparency by name
    from datafusion_tpch_spark.operators.multimodal import decode_gif
    with _pytest.raises(NotImplementedError, match="transparency"):
        decode_gif(blob)
    # disposal 3 (restore to previous): band 1 must vanish back to the
    # BASE (not the background) once frame 2 shows
    blob3 = encode_gif_anim(frames, pal, (sw, sh),
                            transparent_idx=15, disposals=[1, 3, 1])
    _, _, out3 = decode_gif_frames(blob3)
    assert np.array_equal(out3[1], exp1)  # shown as painted
    exp2p = pal[base].copy()              # band 1 restored to pre-frame state
    for v in range(sh):
        for u in range(3):
            if b2[v, u] != 15:
                exp2p[v, 3 + u] = pal[b2[v, u]]
    assert np.array_equal(out3[2], exp2p)
    # reserved disposal values stay corrupt
    bad_disp = bytearray(blob3)
    j = bad_disp.index(b"\x21\xf9")
    bad_disp[j + 3] = (bad_disp[j + 3] & ~0x1C) | (5 << 2)
    with _pytest.raises(ValueError, match="disposal"):
        decode_gif_frames(bytes(bad_disp))
    # truncation inside a frame's data sub-blocks
    with _pytest.raises(ValueError):
        decode_gif_frames(blob[: len(blob) - 3])
    # frame rect past the logical screen (corrupt descriptor)
    bad = bytearray(blob)
    i = bad.index(b"\x2c", 13)
    bad[i + 1 : i + 3] = (11).to_bytes(2, "little")  # left=11, w=12 > sw
    with _pytest.raises(ValueError, match="screen"):
        decode_gif_frames(bytes(bad))
    # encoder refuses rects past the screen and empty clips
    with _pytest.raises(ValueError):
        encode_gif_anim([(10, 0, band(1))], pal, (sw, sh))
    with _pytest.raises(ValueError):
        encode_gif_anim([], pal, (sw, sh))


def test_jpeg_progressive_equals_baseline_property():
    """The progressive stream (spectral selection + successive
    approximation, EOB runs, correction bits) must decode to EXACTLY the
    pixels of the baseline encode of the same raster and quant tables —
    the two entropy layouts carry identical coefficients."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from datafusion_tpch_spark.operators.multimodal import (
        decode_jpeg, encode_jpeg, encode_jpeg_progressive,
    )

    @settings(max_examples=25, deadline=None)
    @given(
        st.integers(1, 32), st.integers(1, 32),
        st.booleans(), st.booleans(),
        st.integers(0, 2**32 - 1),
    )
    def prop(h, w, gray, unit_quant, seed):
        rng = np.random.default_rng(seed)
        img = rng.integers(
            0, 256, size=(h, w) if gray else (h, w, 3)
        ).astype(np.uint8)
        q = None if unit_quant else np.asarray(
            rng.integers(1, 50, size=(8, 8)), dtype=np.int64
        )
        blob = encode_jpeg_progressive(img, quant=q)
        assert b"\xff\xc2" in blob  # really SOF2
        assert blob.count(b"\xff\xda") >= 6  # really multi-scan
        base = decode_jpeg(encode_jpeg(img, quant=q))
        assert np.array_equal(decode_jpeg(blob), base)

    prop()


def test_jpeg_progressive_eob_runs_and_boundaries():
    """Block-constant rasters have zero AC everywhere, so the AC scans
    are pure EOB-run streams (EOBn with extension bits) — decode must be
    bit-exact; truncation mid-scan raises ValueError; DRI + progressive
    stays a named boundary."""
    import pytest as _pytest

    from datafusion_tpch_spark.operators.multimodal import (
        decode_jpeg, encode_jpeg_progressive,
    )

    img = _block_const_gray(40)  # big enough for EOBRUN > 1 with ext bits
    blob = encode_jpeg_progressive(img)
    assert np.array_equal(decode_jpeg(blob), img)
    rgb = np.stack([img, img, img], axis=2)
    blob3 = encode_jpeg_progressive(rgb)
    assert np.array_equal(decode_jpeg(blob3), rgb)
    # truncation inside the scan chain
    with _pytest.raises(ValueError):
        decode_jpeg(blob[: len(blob) // 2])
    # a DRI segment ahead of progressive scans is a named boundary
    i = blob.index(b"\xff\xda")
    dri = blob[:i] + b"\xff\xdd\x00\x04\x00\x02" + blob[i:]
    with _pytest.raises(NotImplementedError, match="progressive"):
        decode_jpeg(dri)


def test_audio_fingerprint_gain_invariant_and_scene_distinct():
    """The 32-bit frame-energy fingerprint must cancel a uniform integer
    gain exactly (copies of one recording collapse) while keeping all 40
    scene fingerprints distinct (distinct recordings don't collapse)."""
    from datafusion_tpch_spark.operators.multimodal import (
        _AFP_SCENES,
        _afp_samples,
        audio_fingerprint_32,
        decode_wav,
        encode_wav_pcm16,
    )

    per_scene: dict[int, set[int]] = {}
    for doc in range(400):
        s, rate = _afp_samples(doc)
        # through the real container: encode -> chunk walk -> decode
        r2, s2 = decode_wav(
            encode_wav_pcm16(s, rate, extra_chunks=((b"note", b"y" * (1 + doc % 3)),))
        )
        assert r2 == rate and (s2 == s).all()
        per_scene.setdefault(doc % _AFP_SCENES, set()).add(
            audio_fingerprint_32(s2)
        )
    assert all(len(v) == 1 for v in per_scene.values()), "gain leaked into fp"
    assert len({next(iter(v)) for v in per_scene.values()}) == _AFP_SCENES


def test_audio_fingerprint_rejects_wrong_shape():
    import numpy as np
    import pytest

    from datafusion_tpch_spark.operators.multimodal import audio_fingerprint_32

    with pytest.raises(ValueError):
        audio_fingerprint_32(np.zeros(100, dtype=np.int16))
    with pytest.raises(ValueError):
        audio_fingerprint_32(np.zeros((264, 2), dtype=np.int16))


def test_cross_codec_assets_decode_identically():
    """PNG and BMP encodings of the same scene raster must decode to the
    identical raster (both lossless) and therefore the identical dHash —
    the invariant the cross-codec dedup gate keys on."""
    import numpy as np

    from datafusion_tpch_spark.operators.multimodal import (
        _PNG_SIG,
        _ph_raster,
        decode_image,
        dhash_64,
        encode_bmp,
        encode_png,
    )

    for doc in range(16):
        img = _ph_raster(doc)
        png, bmp = encode_png(img, filter_per_line=True), encode_bmp(img)
        assert png[:8] == _PNG_SIG and bmp[:2] == b"BM"
        a, b = decode_image(png), decode_image(bmp)
        assert (a == img).all() and (b == img).all()
        assert dhash_64(a) == dhash_64(b)


def test_cross_codec_signature_kernel_dispatches_on_magic(spark):
    """The signature kernel must find the codec in the BLOB BYTES (mime is
    absent from its input schema entirely) and refuse unknown magic."""
    from datafusion_tpch_spark.operators.multimodal import (
        decoded_codec_signatures,
        documents_as_mixed_codec_assets,
    )

    ids = spark.range(0, 8).withColumnRenamed("id", "doc_id")
    sigs = decoded_codec_signatures(
        documents_as_mixed_codec_assets(ids)
    ).collect()
    got = {r.doc_id: r.codec for r in sigs}
    assert got == {d: ("png" if d % 2 == 0 else "bmp") for d in range(8)}

    import pytest

    poisoned = spark.createDataFrame(
        [(99, "image", "image/png", bytearray(b"\xff\xd8not-a-real-codec"))],
        "asset_id long, modality string, mime string, content binary",
    )
    with pytest.raises(Exception, match="unexpected image magic"):
        decoded_codec_signatures(poisoned).collect()


def test_video_frame_signatures_match_closed_form(spark):
    """Every frame's decoded block-mean signature must equal the fixture's
    closed form — and every frame must be present (no sampling)."""
    from datafusion_tpch_spark.operators.multimodal import (
        decoded_video_frame_signatures,
        documents_as_avi_assets,
    )

    ids = spark.range(0, 12).withColumnRenamed("id", "doc_id")
    rows = decoded_video_frame_signatures(
        documents_as_avi_assets(ids)
    ).collect()
    got = {(r.doc_id, r.frame_idx): (r.width, r.height, r.sig1, r.sig2)
           for r in rows}
    K = 2654435761
    want = {}
    for d in range(12):
        w, h, n = 17 + d % 32, 17 + d % 16, 2 + d % 5
        nbx, nby = (w + 15) // 16, (h + 15) // 16
        for f in range(n):
            s1 = s2 = 0
            for c in range(nbx * nby):
                v = (d * K + f * 131 + c) % 256
                s1 += v * (c + 1)
                s2 += v * v
            want[(d, f)] = (w, h, s1, s2)
    assert got == want


def test_scale_invariant_dhash_collapses_resolutions():
    """dHash of the same scene rendered at m=2,3,4 must be identical
    (integer upscale preserves every block-sum comparison), and the 48
    scene signatures must stay distinct."""
    from datafusion_tpch_spark.operators.multimodal import (
        _SI_SCENES,
        _si_raster,
        decode_png,
        dhash_64,
        encode_png,
    )

    per_scene: dict[int, set] = {}
    for doc in range(_SI_SCENES * 3):   # every scene at all three sizes
        img = decode_png(encode_png(_si_raster(doc), filter_per_line=True))
        expect_m = 2 + (doc // _SI_SCENES) % 3
        assert img.shape == (8 * expect_m, 9 * expect_m, 3)
        per_scene.setdefault(doc % _SI_SCENES, set()).add(dhash_64(img))
    assert all(len(v) == 1 for v in per_scene.values()), "scale leaked in"
    assert len({next(iter(v)) for v in per_scene.values()}) == _SI_SCENES


def test_gif_gce_block_size_must_be_4():
    """A GCE whose block-size byte is not the spec's 4 would shift every
    fixed-offset field (disposal, transparency index) — reject loudly."""
    import pytest

    from datafusion_tpch_spark.operators.multimodal import (
        decode_gif_frames,
        encode_gif_anim,
    )

    idx = np.zeros((4, 5), dtype=np.uint8)
    pal = np.zeros((16, 3), dtype=np.uint8)
    blob = bytearray(encode_gif_anim([(0, 0, idx)], pal, (5, 4)))
    at = blob.index(b"\x21\xf9")  # the GCE introducer
    assert blob[at + 2] == 4
    blob[at + 2] = 2  # declare a 2-byte GCE body
    with pytest.raises(ValueError, match="GCE block size"):
        decode_gif_frames(bytes(blob))


def test_video_signature_kernel_validates_frames(spark):
    """The frame-signature kernel must reject grayscale frames and
    header/frame dim disagreements like its stats sibling (it used to
    crash with IndexError / ZeroDivisionError instead)."""
    import pytest

    from datafusion_tpch_spark.operators.multimodal import (
        decoded_video_frame_signatures,
        encode_avi_mjpeg,
        encode_jpeg,
    )

    gray_frame = encode_jpeg(np.full((16, 16), 7, dtype=np.uint8))
    avi_gray = encode_avi_mjpeg([gray_frame], 16, 16)
    bad_dims = encode_avi_mjpeg(
        [encode_jpeg(np.full((16, 16, 3), 7, dtype=np.uint8))], 64, 64
    )
    for blob, msg in ((avi_gray, "3-component"), (bad_dims, "disagree")):
        df = spark.createDataFrame(
            [(1, "video", "video/x-msvideo", bytearray(blob))],
            "asset_id long, modality string, mime string, content binary",
        )
        with pytest.raises(Exception, match=msg):
            decoded_video_frame_signatures(df).collect()


def test_audio_shifted_copies_share_shifted_bit_streams():
    """The shifted-WAV fixture's contract: a copy trimmed by k frames has
    frame-comparison bits equal to the scene master's bit stream shifted
    by k — the property the audio clip dedup's shingle containment rides
    on — and the per-copy gain cancels exactly."""
    from datafusion_tpch_spark.operators.multimodal import (
        _AFP_FRAME_N,
        _AFP_FRAMES,
        _afp_shifted_samples,
        decode_wav,
        encode_wav_pcm16,
    )

    def bits_of(doc_id):
        s, rate = _afp_shifted_samples(doc_id)
        # through the real container, like the kernel
        _r, dec = decode_wav(encode_wav_pcm16(s, rate))
        v = np.asarray(dec).astype(np.int64)
        e = (v * v).reshape(_AFP_FRAMES, _AFP_FRAME_N).sum(axis=1)
        return list((e[:-1] > e[1:]).astype(int))

    scene = 7
    b0 = bits_of(scene)            # copy 0: offset 0, amp 1
    b1 = bits_of(scene + 40)       # copy 1: offset 1 frame, amp 2
    b3 = bits_of(scene + 120)      # copy 3: offset 3 frames, amp 1
    assert b1[:31] == b0[1:32]
    assert b3[:29] == b0[3:32]
    # gain alone (copy 4: offset 0 again, amp 2) leaves bits identical
    b4 = bits_of(scene + 160)
    assert b4 == b0


# --- EXIF / APP1 -------------------------------------------------------------


def _exif_jpeg(aid: int) -> bytes:
    from datafusion_tpch_spark.operators.multimodal import (
        _EXIF_PX_K,
        _exif_fixture_meta,
        encode_exif_app1,
        encode_jpeg,
        insert_app1,
    )

    v = (aid * _EXIF_PX_K + np.arange(64, dtype=np.int64)) % 256
    blob = encode_jpeg(v.astype(np.uint8).reshape(8, 8))
    meta = _exif_fixture_meta(aid)
    if meta is not None:
        blob = insert_app1(blob, encode_exif_app1(
            make=meta["make"], model=meta["model"],
            orientation=meta["orientation"], taken_at=meta["taken_at"],
            gps=meta["gps"]))
    return blob


def test_exif_roundtrip_and_scrub():
    from datafusion_tpch_spark.operators.multimodal import (
        decode_jpeg,
        parse_exif,
        strip_gps_exif,
    )

    blob = _exif_jpeg(1)  # has EXIF + GPS
    m = parse_exif(blob)
    assert m["make"] == "CamCo" and m["orientation"] == 2
    assert m["lat_dd"] is not None and m["lon_dd"] is not None
    scrubbed = strip_gps_exif(blob)
    m2 = parse_exif(scrubbed)
    assert m2["lat_dd"] is None and m2["lon_dd"] is None
    assert m2["orientation"] == m["orientation"]
    assert m2["taken_at"] == m["taken_at"]
    assert np.array_equal(decode_jpeg(blob), decode_jpeg(scrubbed))
    assert len(blob) - len(scrubbed) == 114  # GPS IFD block + IFD0 entry


def test_exif_absent_and_malformed_yield_none():
    from datafusion_tpch_spark.operators.multimodal import (
        parse_exif,
        strip_gps_exif,
    )

    plain = _exif_jpeg(0)  # id%7==0: no APP1 at all
    assert parse_exif(plain) is None
    assert strip_gps_exif(plain) == plain  # byte-identical passthrough
    gpsless = _exif_jpeg(3)
    assert parse_exif(gpsless)["lat_dd"] is None
    assert strip_gps_exif(gpsless) == gpsless
    # truncated APP1 body: malformed -> None, scrub -> passthrough
    cut = _exif_jpeg(1)[:40]
    assert parse_exif(cut) is None
    assert strip_gps_exif(cut) == cut


def test_exif_big_endian_tiff_parses():
    """MM byte order: parser must honor the declared endianness."""
    from datafusion_tpch_spark.operators.multimodal import (
        _EXIF_TAG_ORIENTATION,
        insert_app1,
        parse_exif,
    )

    # hand-built MM TIFF: header + one-entry IFD0 (Orientation=5)
    tiff = (b"MM" + (42).to_bytes(2, "big") + (8).to_bytes(4, "big")
            + (1).to_bytes(2, "big")
            + _EXIF_TAG_ORIENTATION.to_bytes(2, "big")
            + (3).to_bytes(2, "big") + (1).to_bytes(4, "big")
            + (5).to_bytes(2, "big") + b"\0\0"
            + (0).to_bytes(4, "big"))
    blob = insert_app1(_exif_jpeg(0), b"Exif\x00\x00" + tiff)
    m = parse_exif(blob)
    assert m["orientation"] == 5 and m["make"] is None


def test_exif_foreign_ifd_type_raises_by_name():
    import pytest

    from datafusion_tpch_spark.operators.multimodal import (
        insert_app1,
        parse_exif,
    )

    # type 13 entry: outside the twelve TIFF 6.0 types (UNDEFINED and the
    # signed/float types are all SUPPORTED now — real ExifIFDs carry them)
    tiff = (b"II" + (42).to_bytes(2, "little") + (8).to_bytes(4, "little")
            + (1).to_bytes(2, "little")
            + (0x9286).to_bytes(2, "little")      # UserComment
            + (13).to_bytes(2, "little")          # foreign type id
            + (4).to_bytes(4, "little") + b"abcd"
            + (0).to_bytes(4, "little"))
    blob = insert_app1(_exif_jpeg(0), b"Exif\x00\x00" + tiff)
    with pytest.raises(NotImplementedError, match="type 13"):
        parse_exif(blob)


def test_exif_scrub_relocates_nested_pointer_ifds():
    """The round-13 refusal, closed: IFD0 with a GPS pointer AND an
    ExifIFD pointer now scrubs — the sub-IFD tree is relocated with
    patched offsets, GPS dropped, every ExifIFD value preserved."""
    from datafusion_tpch_spark.operators.multimodal import (
        encode_exif_app1,
        insert_app1,
        parse_exif,
        parse_exif_subifd,
        strip_gps_exif,
    )

    blob = insert_app1(_exif_jpeg(0), encode_exif_app1(
        make="CamCo", orientation=6,
        gps=("N", (10, 20, (30, 1)), "E", (40, 50, (60, 1))),
        exif_ifd={"exposure": (1, 125), "fnumber": (28, 10), "iso": 400,
                  "version": b"0232"},
        interop="R98",
    ))
    before_sub = parse_exif_subifd(blob)
    assert before_sub is not None and before_sub["interop_index"] == "R98"
    scrubbed = strip_gps_exif(blob)
    after = parse_exif(scrubbed)
    assert after is not None and after["lat_dd"] is None
    assert after["orientation"] == 6
    assert parse_exif_subifd(scrubbed) == before_sub
    # and a scrubbed stream is a fixed point
    assert strip_gps_exif(scrubbed) == scrubbed


def test_exif_scrub_refuses_chained_subifd_by_name():
    import pytest

    from datafusion_tpch_spark.operators.multimodal import (
        _ifd_block,
        insert_app1,
        strip_gps_exif,
    )

    # IFD0 -> ExifIFD whose own next pointer is nonzero (a chained
    # sub-IFD the spec says should not exist): refuse loudly, never
    # silently reorder the chain.  ifd0 @8 (30 B), exif sub-IFD @50.
    entries = [
        (0x8769, 4, 1, (50).to_bytes(4, "little")),   # ExifIFD pointer
        (0x8825, 4, 1, (50).to_bytes(4, "little")),   # GPS pointer
    ]
    sub = bytearray(
        _ifd_block([(0x8827, 3, 1, (200).to_bytes(2, "little"))], 50)
    )
    sub[-4:] = (50).to_bytes(4, "little")  # nonzero next pointer
    tiff = (b"II" + (42).to_bytes(2, "little") + (8).to_bytes(4, "little")
            + _ifd_block(entries, 8) + b"\0" * (50 - 38) + bytes(sub))
    blob = insert_app1(_exif_jpeg(0), b"Exif\x00\x00" + tiff)
    with pytest.raises(NotImplementedError, match="chained sub-IFD"):
        strip_gps_exif(blob)


def test_exif_census_gate_null_cohorts(spark):
    from datafusion_tpch_spark.operators.multimodal import (
        decoded_exif_metadata,
        documents_as_exif_jpeg_assets,
    )

    docs = load_table(spark, SF_DIR, "documents").limit(30)
    rows = {r.doc_id: r for r in decoded_exif_metadata(
        documents_as_exif_jpeg_assets(docs)).collect()}
    for did, r in rows.items():
        if did % 7 == 0:
            assert not r.has_exif and r.make is None and r.lat_dd is None
        else:
            assert r.has_exif and r.make == "CamCo"
            assert r.has_gps == (did % 3 != 0)
            if r.has_gps:
                assert -90 <= r.lat_dd <= 90 and -180 <= r.lon_dd <= 180


def test_exif_orientation_transforms_invert_exactly():
    from datafusion_tpch_spark.operators.multimodal import (
        apply_exif_orientation,
        undo_exif_orientation,
    )

    x = np.arange(256, dtype=np.uint8).reshape(16, 16)  # fully asymmetric
    for o in range(1, 9):
        assert np.array_equal(
            undo_exif_orientation(apply_exif_orientation(x, o), o), x
        ), f"orientation {o} does not invert"
    import pytest
    with pytest.raises(ValueError, match="orientation 9"):
        apply_exif_orientation(x, 9)


def test_exif_orientation_viewer_transforms_match_spec_vectors():
    """Pin each tag's VIEWER transform to hand-derived EXIF 4.6.4 vectors
    on an asymmetric non-square matrix — the apply/undo inversion property
    alone cannot catch a consistently-swapped pair (e.g. 5↔7 both set to
    the main-diagonal transpose, or 6/8 both reversed).  Expected outputs
    are PIL ``ImageOps.exif_transpose``'s documented mapping: 2 flipH,
    3 rot180, 4 flipV, 5 transpose, 6 rot90 CW, 7 transverse (anti-
    diagonal), 8 rot90 CCW."""
    from datafusion_tpch_spark.operators.multimodal import (
        apply_exif_orientation,
        undo_exif_orientation,
    )

    p = np.array([[1, 2, 3], [4, 5, 6]], dtype=np.uint8)  # stored raster
    expected = {
        1: [[1, 2, 3], [4, 5, 6]],
        2: [[3, 2, 1], [6, 5, 4]],
        3: [[6, 5, 4], [3, 2, 1]],
        4: [[4, 5, 6], [1, 2, 3]],
        5: [[1, 4], [2, 5], [3, 6]],
        6: [[4, 1], [5, 2], [6, 3]],
        7: [[6, 3], [5, 2], [4, 1]],
        8: [[3, 6], [2, 5], [1, 4]],
    }
    for o, want in expected.items():
        got = undo_exif_orientation(p, o)
        assert np.array_equal(got, np.array(want, dtype=np.uint8)), (
            f"orientation {o}: viewer transform {got.tolist()} != {want}"
        )
        # and the forward (store) side round-trips the DISPLAYED image
        assert np.array_equal(
            apply_exif_orientation(np.array(want, dtype=np.uint8), o), p
        ), f"orientation {o}: store transform is not the viewer inverse"
    # 5 and 7 must differ (main- vs anti-diagonal) on any asymmetric input
    assert not np.array_equal(
        undo_exif_orientation(p, 5), undo_exif_orientation(p, 7)
    )


def test_orientation_dedup_groups_span_orientations(spark):
    from datafusion_tpch_spark.operators.multimodal import (
        _ORIENT_SCENES,
        decoded_orientation_signatures,
        documents_as_oriented_jpeg_assets,
    )

    docs = load_table(spark, SF_DIR, "documents")
    rows = decoded_orientation_signatures(
        documents_as_oriented_jpeg_assets(docs)
    ).collect()
    by_scene = {}
    for r in rows:
        by_scene.setdefault(r.doc_id % _ORIENT_SCENES, set()).add(r.sig)
    # every scene's copies — across all 8 stored orientations — collapse
    # to ONE normalized signature
    assert all(len(sigs) == 1 for sigs in by_scene.values())
    # and different scenes do not collide
    all_sigs = {next(iter(s)) for s in by_scene.values()}
    assert len(all_sigs) == len(by_scene)
    # the no-EXIF cohort (orientation 1) parsed as the default
    assert {r.orientation for r in rows} == set(range(1, 9))


_TGPS = ("N", (10, 20, (3000, 100)), "W", (30, 40, (1500, 100)))
_TGPS2 = ("S", (45, 5, (100, 100)), "E", (90, 10, (200, 100)))


def test_exif_ifd1_thumbnail_roundtrip():
    """encode → parse of a real thumbnail IFD: IFD0 chains to an IFD1
    whose JPEGInterchangeFormat/Length resolve the embedded bytes; IFD0
    parsing is unaffected by the chain."""
    from datafusion_tpch_spark.operators.multimodal import (
        encode_exif_app1,
        insert_app1,
        parse_exif,
        parse_exif_ifd1,
    )

    thumb = bytes(range(256)) * 3  # stand-in embedded JPEG payload
    blob = insert_app1(_exif_jpeg(0), encode_exif_app1(
        make="CamCo", orientation=6, gps=_TGPS,
        thumbnail=thumb, thumb_gps=_TGPS2,
    ))
    m = parse_exif(blob)
    assert m["make"] == "CamCo" and m["orientation"] == 6
    assert m["lat_dd"] is not None
    t = parse_exif_ifd1(blob)
    assert t is not None
    assert t["compression"] == 6
    assert t["has_gps"] is True
    assert t["thumbnail"] == thumb
    # no IFD1 -> None, not a fabricated dict
    plain = insert_app1(_exif_jpeg(1), encode_exif_app1(make="CamCo"))
    assert parse_exif_ifd1(plain) is None


def test_exif_scrub_relocates_ifd1_and_scrubs_its_gps():
    """The scrub must remove GPS WHEREVER it appears (IFD0 and the
    thumbnail IFD), relocate the thumbnail bytes with a corrected offset,
    keep every other tag, and leave the pixels bit-identical."""
    from datafusion_tpch_spark.operators.multimodal import (
        decode_jpeg,
        encode_exif_app1,
        insert_app1,
        parse_exif,
        parse_exif_ifd1,
        strip_gps_exif,
    )

    thumb = b"\xffthumb-bytes\x00" * 17
    base = _exif_jpeg(2)
    blob = insert_app1(base, encode_exif_app1(
        make="CamCo", model="M1", orientation=8,
        taken_at="2024:01:02 03:04:05", gps=_TGPS,
        thumbnail=thumb, thumb_gps=_TGPS2,
    ))
    scrubbed = strip_gps_exif(blob)
    assert len(scrubbed) < len(blob)
    m = parse_exif(scrubbed)
    assert m["lat_dd"] is None and m["lon_dd"] is None
    assert m["make"] == "CamCo" and m["model"] == "M1"
    assert m["orientation"] == 8 and m["taken_at"] == "2024:01:02 03:04:05"
    t = parse_exif_ifd1(scrubbed)
    assert t is not None and t["has_gps"] is False
    assert t["compression"] == 6
    assert t["thumbnail"] == thumb  # relocated, not dropped or corrupted
    assert (decode_jpeg(scrubbed) == decode_jpeg(blob)).all()
    # idempotent: a GPS-free stream (even with IFD1) passes through
    assert strip_gps_exif(scrubbed) == scrubbed


def test_exif_scrub_fires_on_ifd1_only_gps():
    """GPS carried ONLY by the thumbnail IFD (IFD0 clean) must still
    trigger the scrub — the blind spot a head-IFD-only scrubber has."""
    from datafusion_tpch_spark.operators.multimodal import (
        encode_exif_app1,
        insert_app1,
        parse_exif_ifd1,
        strip_gps_exif,
    )

    thumb = b"T" * 99
    blob = insert_app1(_exif_jpeg(3), encode_exif_app1(
        make="CamCo", orientation=3,
        thumbnail=thumb, thumb_gps=_TGPS2,
    ))
    assert parse_exif_ifd1(blob)["has_gps"] is True
    scrubbed = strip_gps_exif(blob)
    assert scrubbed != blob
    t = parse_exif_ifd1(scrubbed)
    assert t["has_gps"] is False and t["thumbnail"] == thumb


def test_exif_scrub_refuses_chained_ifd2_by_name():
    import pytest

    from datafusion_tpch_spark.operators.multimodal import (
        _ifd_block,
        insert_app1,
        strip_gps_exif,
    )

    # IFD0 (orientation + GPS pointer) -> IFD1 -> IFD2: the rebuild
    # relocates one thumbnail IFD, not an arbitrary chain — refuse
    ifd0_entries = [
        (0x0112, 3, 1, (1).to_bytes(2, "little")),
        (0x8825, 4, 1, (60).to_bytes(4, "little")),
    ]
    ifd1 = bytearray(
        _ifd_block([(0x0112, 3, 1, (1).to_bytes(2, "little"))], 80)
    )
    ifd1[-4:] = (102).to_bytes(4, "little")  # next-IFD pointer -> IFD2
    ifd2 = _ifd_block([(0x0112, 3, 1, (1).to_bytes(2, "little"))], 102)
    ifd0 = bytearray(_ifd_block(ifd0_entries, 8))
    ifd0[-4:] = (80).to_bytes(4, "little")  # next-IFD pointer -> IFD1
    gps = _ifd_block([(0x0001, 2, 2, b"N\0")], 60)
    # lay blocks at the offsets the pointers claim: ifd0 @8 (30 B),
    # gps @60 (18 B), ifd1 @80 (18 B), ifd2 @102 (18 B)
    tiff = (b"II" + (42).to_bytes(2, "little") + (8).to_bytes(4, "little")
            + bytes(ifd0) + b"\0" * (60 - 38) + gps + b"\0" * (80 - 78)
            + bytes(ifd1) + b"\0" * (102 - 98) + ifd2)
    blob = insert_app1(_exif_jpeg(0), b"Exif\x00\x00" + tiff)
    with pytest.raises(NotImplementedError, match="IFD2"):
        strip_gps_exif(blob)


def test_exif_scrub_relocates_big_endian_subifd_tree():
    """MM byte order through the FULL relocation path: a hand-built
    big-endian TIFF with IFD0 -> {ExifIFD (RATIONAL payload in the data
    area + SHORT), GPS} must scrub to a little-endian stream whose
    ExifIFD values are preserved exactly — the per-element byte reversal
    in _le_raw is what's under test."""
    from datafusion_tpch_spark.operators.multimodal import (
        insert_app1,
        parse_exif,
        parse_exif_subifd,
        strip_gps_exif,
    )

    def be(v, n):
        return int(v).to_bytes(n, "big")

    # ifd0 @8 (3 entries, 42 B) -> exif @50 (2 entries + 8 B data, 38 B)
    # -> gps @88 (1 entry, 18 B)
    ifd0 = (be(3, 2)
            + be(0x0112, 2) + be(3, 2) + be(1, 4) + be(6, 2) + b"\0\0"
            + be(0x8769, 2) + be(4, 2) + be(1, 4) + be(50, 4)
            + be(0x8825, 2) + be(4, 2) + be(1, 4) + be(88, 4)
            + be(0, 4))
    exif = (be(2, 2)
            + be(0x829A, 2) + be(5, 2) + be(1, 4) + be(80, 4)  # -> data
            + be(0x8827, 2) + be(3, 2) + be(1, 4) + be(400, 2) + b"\0\0"
            + be(0, 4)
            + be(1, 4) + be(125, 4))  # ExposureTime = 1/125, big-endian
    gps = (be(1, 2)
           + be(0x0001, 2) + be(2, 2) + be(2, 4) + b"N\0\0\0"
           + be(0, 4))
    tiff = b"MM" + be(42, 2) + be(8, 4) + ifd0 + exif + gps
    blob = insert_app1(_exif_jpeg(0), b"Exif\x00\x00" + tiff)
    before = parse_exif_subifd(blob)
    assert before == {"exposure": (1, 125), "fnumber": None, "iso": 400,
                      "version": None, "interop_index": None}
    scrubbed = strip_gps_exif(blob)
    after = parse_exif(scrubbed)
    assert after is not None and after["orientation"] == 6
    assert after["lat_dd"] is None
    assert parse_exif_subifd(scrubbed) == before
    # the rebuilt stream is little-endian
    from datafusion_tpch_spark.operators.multimodal import _find_exif_app1

    assert _find_exif_app1(scrubbed)[2][:2] == b"II"


def test_exif_scrub_property_over_feature_lattice():
    """Property over the full APP1 feature lattice (GPS x ExifIFD x
    Interop x thumbnail x thumb-GPS x orientation x values): the scrub
    removes every GPS IFD (exactly 114 bytes each), preserves the whole
    ExifIFD view and the thumbnail bytes, never touches pixels, is
    byte-identical passthrough when no GPS exists anywhere, and is a
    fixed point on its own output."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from datafusion_tpch_spark.operators.multimodal import (
        decode_jpeg,
        encode_exif_app1,
        encode_jpeg,
        insert_app1,
        parse_exif,
        parse_exif_ifd1,
        parse_exif_subifd,
        strip_gps_exif,
    )

    @settings(max_examples=60, deadline=None)
    @given(
        st.booleans(),                 # gps
        st.booleans(),                 # exif_ifd
        st.booleans(),                 # interop (only with exif_ifd)
        st.sampled_from([None, 1, 48, 97]),  # thumbnail length
        st.booleans(),                 # thumb_gps (only with thumbnail)
        st.integers(1, 8),             # orientation
        st.integers(0, 2**31 - 1),     # value seed
    )
    def scrub(has_gps, has_exif, has_iop, tlen, has_tgps, orient, seed):
        rng = np.random.default_rng(seed)
        gps = None
        if has_gps:
            gps = ("N" if seed % 2 else "S",
                   (int(rng.integers(0, 90)), int(rng.integers(0, 60)),
                    (int(rng.integers(0, 6000)), 100)),
                   "E" if (seed // 2) % 2 else "W",
                   (int(rng.integers(0, 180)), int(rng.integers(0, 60)),
                    (int(rng.integers(0, 6000)), 100)))
        exif_ifd = None
        if has_exif:
            exif_ifd = {"exposure": (1, int(rng.integers(1, 4000))),
                        "fnumber": (int(rng.integers(10, 640)), 10),
                        "iso": int(rng.integers(50, 25600)),
                        "version": b"0232"}
        thumb = bytes(rng.integers(0, 256, tlen, dtype=np.uint8).tolist()) \
            if tlen is not None else None
        tgps = None
        if tlen is not None and has_tgps:
            tgps = ("S", (int(rng.integers(0, 45)), 0, (1, 1)),
                    "W", (int(rng.integers(0, 90)), 0, (1, 1)))
        raster = rng.integers(0, 256, (8, 8), dtype=np.uint8)
        blob = insert_app1(encode_jpeg(raster), encode_exif_app1(
            make="CamCo", orientation=orient, gps=gps,
            thumbnail=thumb, thumb_gps=tgps,
            exif_ifd=exif_ifd, interop="R98" if (has_exif and has_iop) else None,
        ))
        before_sub = parse_exif_subifd(blob)
        before1 = parse_exif_ifd1(blob)
        scrubbed = strip_gps_exif(blob)
        n_gps = int(gps is not None) + int(tgps is not None)
        if n_gps == 0:
            assert scrubbed == blob  # passthrough, byte-identical
            return
        assert len(blob) - len(scrubbed) == 114 * n_gps
        after = parse_exif(scrubbed)
        assert after is not None and after["lat_dd"] is None
        assert after["orientation"] == orient
        after1 = parse_exif_ifd1(scrubbed)
        assert (after1 is None) == (before1 is None)
        if before1 is not None:
            assert not after1["has_gps"]
            assert after1["thumbnail"] == before1["thumbnail"]
        assert parse_exif_subifd(scrubbed) == before_sub
        assert np.array_equal(decode_jpeg(blob), decode_jpeg(scrubbed))
        assert strip_gps_exif(scrubbed) == scrubbed  # fixed point

    scrub()


def test_exif_scrub_fails_closed_on_malformed_ifd1():
    """PII policy: a malformed thumbnail chain must NOT fail the scrub
    open.  IFD0 carries parseable GPS but its next pointer targets a
    bogus IFD1 — the scrub strips IFD0's GPS and truncates the chain
    instead of returning the GPS-bearing bytes unchanged."""
    from datafusion_tpch_spark.operators.multimodal import (
        encode_exif_app1,
        insert_app1,
        parse_exif,
        strip_gps_exif,
    )

    app1 = encode_exif_app1(
        make="CamCo", orientation=3,
        gps=("N", (10, 20, (30, 1)), "E", (40, 50, (60, 1))),
    )
    tiff = bytearray(app1[6:])
    n0 = int.from_bytes(tiff[8:10], "little")
    np_pos = 8 + 2 + 12 * n0
    tiff[np_pos:np_pos + 4] = (60000).to_bytes(4, "little")  # bogus IFD1
    blob = insert_app1(_exif_jpeg(3), b"Exif\x00\x00" + bytes(tiff))
    assert parse_exif(blob)["lat_dd"] is not None
    scrubbed = strip_gps_exif(blob)
    assert scrubbed != blob
    after = parse_exif(scrubbed)
    assert after is not None and after["lat_dd"] is None
    assert after["orientation"] == 3


def test_exif_scrub_drops_unresolvable_interchange_tags():
    """JPEGInterchangeFormat without a resolvable Length twin must not be
    rewritten into a dangling pointer — both interchange tags are dropped
    from the rebuilt IFD1; other IFD1 tags survive."""
    from datafusion_tpch_spark.operators.multimodal import (
        _find_exif_app1,
        _ifd_block,
        _ifd_entries,
        encode_exif_app1,
        insert_app1,
        strip_gps_exif,
    )

    app1 = encode_exif_app1(
        make="CamCo",
        gps=("N", (10, 20, (30, 1)), "E", (40, 50, (60, 1))),
    )
    tiff = bytearray(app1[6:])
    n0 = int.from_bytes(tiff[8:10], "little")
    np_pos = 8 + 2 + 12 * n0
    ifd1_off = len(tiff)
    tiff[np_pos:np_pos + 4] = ifd1_off.to_bytes(4, "little")
    tiff += _ifd_block(
        [(0x0103, 3, 1, (6).to_bytes(2, "little")),
         (0x0201, 4, 1, (123456).to_bytes(4, "little"))],  # no 0x0202
        ifd1_off,
    )
    blob = insert_app1(_exif_jpeg(3), b"Exif\x00\x00" + bytes(tiff))
    scrubbed = strip_gps_exif(blob)
    t2 = _find_exif_app1(scrubbed)[2]
    n = int.from_bytes(t2[8:10], "little")
    nxt = int.from_bytes(t2[8 + 2 + 12 * n:8 + 2 + 12 * n + 4], "little")
    assert nxt != 0, "IFD1 itself must survive"
    e1 = _ifd_entries(t2, nxt, "little")
    assert 0x0201 not in e1 and 0x0202 not in e1
    assert 0x0103 in e1


def test_exif_full_layout_scrub_invariants():
    """Kernel-level sweep of the full camera layout (ExifIFD + Interop +
    IFD1 + dual GPS): exact 114-byte shrinkage per GPS IFD, ExifIFD view
    value-identical after relocation, thumbnail and pixels intact."""
    from datafusion_tpch_spark.operators.multimodal import (
        _EXIF_PX_K,
        _full_fixture_meta,
        decode_jpeg,
        encode_exif_app1,
        encode_jpeg,
        insert_app1,
        parse_exif,
        parse_exif_ifd1,
        parse_exif_subifd,
        strip_gps_exif,
    )

    for did in range(30):
        v = (did * _EXIF_PX_K + np.arange(64, dtype=np.int64)) % 256
        blob = encode_jpeg(v.astype(np.uint8).reshape(8, 8))
        meta = _full_fixture_meta(did)
        if meta is not None:
            blob = insert_app1(blob, encode_exif_app1(
                make="CamCo", orientation=1 + did % 8, gps=meta["gps"],
                thumbnail=meta["thumb"], thumb_gps=meta["tgps"],
                exif_ifd=meta["exif_ifd"], interop=meta["interop"],
            ))
        b0, b1 = parse_exif(blob), parse_exif_ifd1(blob)
        bs = parse_exif_subifd(blob)
        scrubbed = strip_gps_exif(blob)
        a0, a1 = parse_exif(scrubbed), parse_exif_ifd1(scrubbed)
        had_gps = b0 is not None and b0["lat_dd"] is not None
        had_tgps = b1 is not None and b1["has_gps"]
        assert len(blob) - len(scrubbed) == 114 * (
            int(had_gps) + int(had_tgps)
        )
        assert a0 is None or a0["lat_dd"] is None
        assert a1 is None or not a1["has_gps"]
        assert parse_exif_subifd(scrubbed) == bs
        if b1 is not None:
            assert a1 is not None and a1["thumbnail"] == b1["thumbnail"]
        assert np.array_equal(decode_jpeg(blob), decode_jpeg(scrubbed))
        if meta is not None:
            assert bs is not None and bs["interop_index"] == "R98"
            assert bs["version"] == b"0232"
            assert bs["iso"] == 100 * (1 + did % 16)


def test_exif_full_scrub_gate_matches_closed_form(spark):
    from datafusion_tpch_spark.queries.extensions import (
        multimodal_exif_full_scrub,
    )

    rows = multimodal_exif_full_scrub(spark, SF_DIR).collect()
    assert rows, "gate must produce one verdict per document"
    for r in rows:
        did = r.doc_id
        assert r.had_exif == (did % 7 != 0)
        assert r.had_gps == (did % 7 != 0 and did % 3 != 0)
        assert r.had_thumb_gps == (did % 7 != 0 and did % 2 == 0)
        assert not r.gps_after
        assert r.subifd_kept and r.thumb_kept and r.raster_intact
        assert r.bytes_removed == 114 * (
            int(r.had_gps) + int(r.had_thumb_gps)
        )


def test_phash_band_saturation_flag_visible(spark, monkeypatch):
    """The stoplist must be VISIBLE, not silent: with the hot-band cap
    forced below the fixture's duplicate-cluster sizes, capped images
    must report n_bands_live < 4 and fully-capped ones saturated=true —
    so a consumer can tell 'no neighbors' from 'bucket capped'."""
    from datafusion_tpch_spark.queries import extensions as ext

    monkeypatch.setattr(ext, "_PHB_CAP", 2)
    rows = ext.multimodal_phash_band_dedup(spark, SF_DIR).collect()
    sat = [r for r in rows if r.saturated]
    assert sat, "cap=2 must saturate some duplicate clusters"
    for r in sat:
        assert r.n_bands_live == 0
        # blind verdict looks like 'unique' — exactly why the flag exists
        assert r.n_near1 == 0 and r.n_near2 == 0 and r.kept
    for r in rows:
        assert r.saturated == (r.n_bands_live == 0)
