"""Multimodal plumbing tests: payload schema, feature-extraction batch
kernel, frame sampling UDTF shape, content repartitioning, stub
contract."""

from __future__ import annotations

import hashlib

import pytest

from production_ready_ds_spark.operators import multimodal as mm
from production_ready_ds_spark.queries import catalog
from production_ready_ds_spark.tables import load


@pytest.fixture(scope="module")
def cat():
    return catalog()


def test_attach_payload_schema_and_hash(spark, sf_small):
    d = mm.attach_payload(load(spark, sf_small, "documents"))
    row = d.select("doc_id", "text", "payload", "modality", "n_bytes", "content_md5").first()
    assert row.payload == row.text.encode("utf-8")
    assert row.n_bytes == len(row.payload)
    assert row.content_md5 == hashlib.md5(row.payload).hexdigest()
    assert row.modality == "text"


def test_extract_features_deterministic(spark, sf_small):
    d = mm.attach_payload(load(spark, sf_small, "documents"))
    f1 = sorted(map(str, mm.extract_features(d).collect()))
    f2 = sorted(map(str, mm.extract_features(d).collect()))
    assert f1 == f2 and len(f1) == 500


def test_extract_features_values(spark, sf_small):
    import math

    d = mm.attach_payload(load(spark, sf_small, "documents"))
    row = mm.extract_features(d).filter("doc_id = 0").first()
    text_row = load(spark, sf_small, "documents").filter("doc_id = 0").first()
    buf = text_row.text.encode()
    n = len(buf)
    assert row.n_bytes == n
    assert row.mean_byte_x1e4 == (20000 * sum(buf) + n) // (2 * n)
    counts = {}
    for b in buf:
        counts[b] = counts.get(b, 0) + 1
    expect_ent = sum(
        math.floor((c / n) * math.log2(n / c) * 10000 + 0.5) for c in counts.values()
    )
    assert row.entropy_x1e4 == expect_ent
    assert row.head_bytes == [int(b) for b in buf[:4]]


def test_sample_frames_counts(spark, sf_small):
    d = mm.attach_payload(load(spark, sf_small, "documents"))
    frames = mm.sample_frames(d, chunk_size=64, stride=4)
    got = {r.doc_id: r.n for r in frames.groupBy("doc_id").count().withColumnRenamed("count", "n").collect()}
    for r in load(spark, sf_small, "documents").select("doc_id", "text").limit(20).collect():
        n = len(r.text.encode())
        n_chunks = (n + 63) // 64
        expect = (n_chunks + 3) // 4 if n else 0
        assert got.get(r.doc_id, 0) == expect


def test_repartition_by_content(spark, sf_small):
    d = mm.attach_payload(load(spark, sf_small, "documents"))
    out = mm.repartition_by_content(d, 8)
    assert out.rdd.getNumPartitions() == 8
    assert out.count() == 500


def test_decode_image_is_stubbed():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x89PNG")


def test_raw_rgb_decoder_through_spark(spark):
    """The pluggable-decoder path with a REAL decode: construct raw-RGB
    images with known channel values, run the SAME mapInPandas plumbing
    with RawRGBDecoder, and verify the decoded dims + channel means."""
    dec = mm.RawRGBDecoder()
    # 2x2 solid red and a 1x3 gradient-green image
    red = mm.RawRGBDecoder.encode(2, 2, bytes([255, 0, 0] * 4))
    green = mm.RawRGBDecoder.encode(1, 3, bytes([0, 10, 0, 0, 20, 0, 0, 60, 0]))
    df = spark.createDataFrame(
        [(1, bytearray(red)), (2, bytearray(green)), (3, bytearray(b"not an image"))],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r for r in mm.extract_features(df, decoder=dec).collect()}
    assert (rows[1].width, rows[1].height) == (2, 2)
    assert (rows[1].mean_r, rows[1].mean_g, rows[1].mean_b) == (255.0, 0.0, 0.0)
    assert (rows[2].width, rows[2].height) == (1, 3)
    assert rows[2].mean_g == 30.0
    # malformed payload decodes to all-NULL features, not a batch failure
    assert rows[3].width is None and rows[3].mean_r is None


def test_raw_rgb_decoder_rejects_truncated_body():
    dec = mm.RawRGBDecoder()
    good = mm.RawRGBDecoder.encode(2, 1, bytes(6))
    assert dec.decode(good)["width"] == 2
    assert dec.decode(good[:-1])["width"] is None, "truncated body must be null"
    assert dec.decode(b"")["width"] is None


def test_pil_decoder_raises_without_pillow():
    try:
        import PIL  # noqa: F401

        pytest.skip("pillow present; drop-in path is live")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="pillow"):
        mm.PILImageDecoder().decode(b"\x89PNG")


def test_pcm_audio_decoder_roundtrip():
    """Known waveform → exact features: a ±2000 square wave with
    half-period 4 over 16 samples has rms 2000, peak 2000, and 3
    sign flips in 15 transitions... (multiples of 4 in [1,15] = 3)."""
    import numpy as np

    from production_ready_ds_spark.operators.multimodal import PCMAudioDecoder

    i = np.arange(16)
    samples = np.where((i // 4) % 2 == 0, 2000, -2000)
    buf = PCMAudioDecoder.encode(8000, samples)
    out = PCMAudioDecoder().decode(buf)
    assert out["sr"] == 8000
    assert out["n_samples"] == 16
    assert out["rms"] == 2000.0
    assert out["peak"] == 2000
    assert out["zcr"] == round(3 / 15, 6)
    assert out["duration_s"] == round(16 / 8000, 4)


def test_pcm_audio_decoder_malformed_is_null_row():
    from production_ready_ds_spark.operators.multimodal import PCMAudioDecoder

    dec = PCMAudioDecoder()
    for bad in (None, b"", b"PCM1", b"JUNKxxxxxx", b"PCM1\x00\x00\x1f\x40\x01"):
        out = dec.decode(bad)
        assert all(v is None for v in out.values()), bad


def _rgb_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_resize_rgb_identity_roundtrips_exact_pixels(spark):
    pixels = bytes(range(4 * 3 * 3))  # 4x3 image, distinct bytes
    payload = mm.RawRGBDecoder.encode(4, 3, pixels)
    out = mm.resize_rgb(_rgb_df(spark, [(1, payload)]), 4, 3).first()
    assert (out.w_in, out.h_in) == (4, 3)
    assert bytes(out.payload) == payload  # identity resize = byte-identical


def test_resize_rgb_downsample_picks_nn_grid(spark):
    # 4x4 image; resize to 2x2 must sample src rows/cols (0,2) x (0,2)
    import numpy as np

    img = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    payload = mm.RawRGBDecoder.encode(4, 4, img.tobytes())
    out = mm.resize_rgb(_rgb_df(spark, [(1, payload)]), 2, 2).first()
    expected = img[np.ix_([0, 2], [0, 2])]
    w, h, body = 2, 2, bytes(out.payload)[8:]
    assert bytes(out.payload)[:8] == mm.RawRGBDecoder.MAGIC + b"\x00\x02\x00\x02"
    assert body == expected.tobytes()
    assert (w * h * 3) == len(body)


def test_resize_rgb_upsample_repeats_pixels(spark):
    # 2x2 -> 4x4: NN grid (dst*2)//4 = [0,0,1,1] per axis
    import numpy as np

    img = np.array(range(2 * 2 * 3), dtype=np.uint8).reshape(2, 2, 3)
    payload = mm.RawRGBDecoder.encode(2, 2, img.tobytes())
    out = mm.resize_rgb(_rgb_df(spark, [(1, payload)]), 4, 4).first()
    expected = img[np.ix_([0, 0, 1, 1], [0, 0, 1, 1])]
    assert bytes(out.payload)[8:] == expected.tobytes()


def test_resize_rgb_malformed_payload_yields_null_row(spark):
    rows = [(1, b"JUNK"), (2, None), (3, mm.RawRGBDecoder.MAGIC + b"\x00\x02\x00\x02abc")]
    got = {r.doc_id: r for r in mm.resize_rgb(_rgb_df(spark, rows), 2, 2).collect()}
    assert len(got) == 3
    for doc_id in (1, 2, 3):
        assert got[doc_id].payload is None and got[doc_id].w_in is None


def test_resize_rgb_chains_into_decoder(spark):
    # resized payload is valid RawRGB: decode it and check means match numpy
    import numpy as np

    img = np.arange(5 * 7 * 3, dtype=np.uint8).reshape(7, 5, 3)
    payload = mm.RawRGBDecoder.encode(5, 7, img.tobytes())
    small = mm.resize_rgb(_rgb_df(spark, [(9, payload)]), 3, 3)
    feat = mm.extract_features(small, mm.RawRGBDecoder()).first()
    ys, xs = (np.arange(3) * 7) // 3, (np.arange(3) * 5) // 3
    exp = img[np.ix_(ys, xs)].reshape(-1, 3).mean(axis=0)
    assert (feat.width, feat.height) == (3, 3)
    assert feat.mean_r == pytest.approx(round(float(exp[0]), 4))
    assert feat.mean_b == pytest.approx(round(float(exp[2]), 4))


# ---------------------------------------------------------------- png --


def test_png_roundtrip_every_filter_type():
    """encode → parse must be the identity for every scanline filter
    (a decoder that only ever sees filter 0 proves nothing about
    Sub/Up/Average/Paeth reconstruction)."""
    import numpy as np

    rng = np.random.RandomState(7)
    for w, h in [(1, 1), (8, 8), (16, 9), (5, 7)]:
        px = rng.randint(0, 256, size=w * h * 3, dtype=np.uint8).tobytes()
        for fts in [[f] * h for f in range(5)] + [[(y * 3 + 1) % 5 for y in range(h)]]:
            got = mm.PNGDecoder.parse(mm.PNGDecoder.encode(w, h, px, fts))
            assert got is not None and got[:2] == (w, h) and got[2] == px, (w, h, fts[0])


def test_png_rejects_malformed_and_out_of_subset():
    """Corruption (CRC, truncation) and declared-out-of-subset headers
    (16-bit, interlaced) must yield None — with the RIGHT outcome
    label — never garbage. Alpha variants are IN-subset since round 6:
    a wrong-stride alpha body is corrupt, not unsupported."""
    import struct
    import zlib

    good = mm.PNGDecoder.encode(4, 4, bytes(range(48)), [4, 3, 2, 1])
    assert mm.PNGDecoder.parse(good) is not None
    assert mm.PNGDecoder.parse_fmt(None) == ("not-png", None)
    assert mm.PNGDecoder.parse_fmt(b"\x89PNG") == ("not-png", None)
    # signature present but cut before a complete IHDR: a truncated
    # PNG, counted as corrupt (not junk) in quarantine reports
    assert mm.PNGDecoder.parse_fmt(good[:20]) == ("corrupt", None)
    assert mm.PNGDecoder.parse_fmt(good[:-4]) == ("corrupt", None)  # truncated IEND
    # Truncation at EVERY offset inside the trailing chunks must return
    # None, never raise — in particular mid-CRC (regression: a file cut
    # inside a chunk's 4-byte CRC passed the data-length check, then
    # struct.unpack threw on the short CRC slice and killed the Spark
    # task instead of quarantining the row).
    for cut in range(1, 30):
        assert mm.PNGDecoder.parse(good[:-cut]) is None, cut
    assert mm.PNGDecoder.parse(mm.PNGDecoder.encode(4, 3, bytes(36))[:-14]) is None
    bad = bytearray(good)
    bad[40] ^= 0xFF
    assert mm.PNGDecoder.parse_fmt(bytes(bad)) == ("corrupt", None)  # CRC flip

    def with_ihdr(depth, ctype, interlace):
        ihdr = struct.pack(">IIBBBBB", 4, 4, depth, ctype, 0, 0, interlace)
        body = b"".join(
            bytes([0]) + bytes(12) for _ in range(4)
        )
        return (
            mm.PNGDecoder.MAGIC
            + mm.PNGDecoder._chunk(b"IHDR", ihdr)
            + mm.PNGDecoder._chunk(b"IDAT", zlib.compress(body))
            + mm.PNGDecoder._chunk(b"IEND", b"")
        )

    # alpha and 16-bit gray/truecolor headers are in-subset since
    # round 6 — these bodies carry the WRONG stride for their color
    # type, so they're corrupt
    assert mm.PNGDecoder.parse_fmt(with_ihdr(8, 4, 0))[0] == "corrupt"  # gray+alpha
    assert mm.PNGDecoder.parse_fmt(with_ihdr(8, 6, 0))[0] == "corrupt"  # RGBA
    assert mm.PNGDecoder.parse_fmt(with_ihdr(16, 2, 0))[0] == "corrupt"  # 16-bit rgb
    assert mm.PNGDecoder.parse_fmt(with_ihdr(16, 4, 0))[0] == "unsupported"  # 16-bit alpha
    assert mm.PNGDecoder.parse_fmt(with_ihdr(16, 3, 0))[0] == "unsupported"  # 16-bit palette
    # interlace=1 is in-subset since round 6; this body has the wrong
    # Adam7 pass byte count, so it's corrupt — interlace>1 stays out
    assert mm.PNGDecoder.parse_fmt(with_ihdr(8, 2, 1))[0] == "corrupt"
    assert mm.PNGDecoder.parse_fmt(with_ihdr(8, 2, 2))[0] == "unsupported"
    # a gray header whose body carries the WRONG stride is corrupt, not
    # unsupported (grayscale itself is in-subset since round 5)
    assert mm.PNGDecoder.parse_fmt(with_ihdr(8, 0, 0)) == ("corrupt", None)
    # palette PNG missing its PLTE chunk is corrupt
    assert mm.PNGDecoder.parse_fmt(with_ihdr(8, 3, 0))[0] == "corrupt"
    # decode() maps the rejections to all-NULL feature rows
    assert mm.PNGDecoder().decode(bytes(bad)) == mm.PNGDecoder._NULL


def test_png_gray_and_palette_round_trip_all_filters():
    """Round-5 subset widening: 8-bit grayscale (G→GGG expansion) and
    palette (PLTE-mapped) PNGs must round-trip bit-exactly through
    every scanline filter, out-of-range palette indices must reject
    as corrupt (RFC 2083 §4.1.2), and boundary palette indices must
    map correctly."""
    import numpy as np

    rng = np.random.RandomState(5)
    for w, h in [(1, 1), (16, 9), (5, 7)]:
        g = rng.randint(0, 256, w * h, dtype=np.uint8).tobytes()
        want = bytes(b for v in g for b in (v, v, v))
        for f in range(5):
            fmt, got = mm.PNGDecoder.parse_fmt(
                mm.PNGDecoder.encode(w, h, g, [f] * h, ctype=0)
            )
            assert fmt == "gray" and got == (w, h, want), (w, h, f)
        pal = bytes(rng.randint(0, 256, 3 * 65, dtype=np.uint8))
        idx = rng.randint(0, 65, w * h, dtype=np.uint8).tobytes()
        wantp = bytes(b for i in idx for b in pal[3 * i : 3 * i + 3])
        for f in range(5):
            fmt, got = mm.PNGDecoder.parse_fmt(
                mm.PNGDecoder.encode(w, h, idx, [f] * h, ctype=3, palette=pal)
            )
            assert fmt == "palette" and got == (w, h, wantp), (w, h, f)
    # boundary: index 64 valid with 65 entries, corrupt with 64
    pal = bytes(range(195))  # 65 entries
    idx = bytes([64] + [0] * 11)
    fmt, got = mm.PNGDecoder.parse_fmt(
        mm.PNGDecoder.encode(4, 3, idx, ctype=3, palette=pal)
    )
    assert fmt == "palette" and got[2][:3] == pal[192:195]
    fmt, got = mm.PNGDecoder.parse_fmt(
        mm.PNGDecoder.encode(4, 3, idx, ctype=3, palette=pal[: 3 * 64])
    )
    assert (fmt, got) == ("corrupt", None)


def test_png_transcode_chains_into_resize(spark):
    """PNG payload → png_to_rawrgb → resize → RawRGB decode must equal
    the same chain fed the raw pixels directly — the codec is a
    transparent ingest stage."""
    import numpy as np

    img = np.arange(6 * 5 * 3, dtype=np.uint8).reshape(5, 6, 3)
    png = mm.PNGDecoder.encode(6, 5, img.tobytes(), [(y + 2) % 5 for y in range(5)])
    via_png = mm.extract_features(
        mm.resize_rgb(mm.png_to_rawrgb(_rgb_df(spark, [(1, png)])), 3, 3),
        mm.RawRGBDecoder(),
    ).first()
    raw = mm.RawRGBDecoder.encode(6, 5, img.tobytes())
    direct = mm.extract_features(
        mm.resize_rgb(_rgb_df(spark, [(1, raw)]), 3, 3), mm.RawRGBDecoder()
    ).first()
    assert via_png == direct
    # malformed PNG flows through as a NULL payload, not an exception
    nulls = mm.extract_features(
        mm.resize_rgb(mm.png_to_rawrgb(_rgb_df(spark, [(2, b"junk")])), 3, 3),
        mm.RawRGBDecoder(),
    ).first()
    assert nulls.width is None


# ---------------------------------------------------------------- wav --


def test_wav_roundtrip_matches_pcm_kernel():
    """WAV encode → decode must produce byte-identical features to the
    raw-PCM layout over the same samples (one shared kernel), and
    malformed / out-of-subset containers yield NULL rows."""
    import struct

    import numpy as np

    sam = np.where((np.arange(900) // 7) % 2 == 0, 800, -800).astype("<i2")
    wav = mm.WAVAudioDecoder.encode(16000, sam)
    pcm = mm.PCMAudioDecoder.encode(16000, sam)
    assert mm.WAVAudioDecoder().decode(wav) == mm.PCMAudioDecoder().decode(pcm)
    assert mm.WAVAudioDecoder().decode(None) == mm.WAVAudioDecoder._NULL
    assert mm.WAVAudioDecoder().decode(b"RIFFxxxxWAVE") == mm.WAVAudioDecoder._NULL
    assert mm.WAVAudioDecoder().decode(wav[:-5]) == mm.WAVAudioDecoder._NULL

    def with_fmt(afmt, ch, bits):
        fmt = struct.pack("<HHIIHH", afmt, ch, 8000, 16000, 2, bits)
        chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        chunks += b"data" + struct.pack("<I", 4) + b"\x00\x01\x00\x01"
        return b"RIFF" + struct.pack("<I", len(chunks)) + chunks

    assert mm.WAVAudioDecoder().decode(with_fmt(1, 2, 16)) == mm.WAVAudioDecoder._NULL  # stereo
    assert mm.WAVAudioDecoder().decode(with_fmt(3, 1, 16)) == mm.WAVAudioDecoder._NULL  # float fmt
    assert mm.WAVAudioDecoder().decode(with_fmt(1, 1, 8)) == mm.WAVAudioDecoder._NULL  # 8-bit
    assert mm.WAVAudioDecoder().decode(with_fmt(1, 1, 16))["n_samples"] == 2  # subset OK


def test_wav_odd_chunk_word_alignment():
    """RIFF chunks are word-aligned: an odd-length auxiliary chunk must
    not desync the walk (the classic RIFF parser bug)."""
    import struct

    import numpy as np

    sam = np.asarray([5, -5, 5, -5], dtype="<i2")
    wav = bytearray(mm.WAVAudioDecoder.encode(8000, sam))
    # splice an odd-length LIST chunk between WAVE and fmt
    aux = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # 3 bytes + pad
    out = bytes(wav[:12]) + aux + bytes(wav[12:])
    out = out[:4] + struct.pack("<I", len(out) - 8) + out[8:]
    d = mm.WAVAudioDecoder().decode(out)
    assert d["n_samples"] == 4 and d["sr"] == 8000, d


def test_png_alpha_round_trip_all_filters():
    """Round-6 subset widening: gray+alpha (ctype 4) and RGBA (ctype 6)
    must decode through every scanline filter with the alpha channel
    flattened over the declared white background by the exact integer
    formula (a*fg + (255-a)*bg + 127) // 255."""
    import numpy as np

    bg = mm.PNGDecoder.ALPHA_BG

    def flat(fg, a):
        return (int(a) * int(fg) + (255 - int(a)) * bg + 127) // 255

    rng = np.random.RandomState(11)
    for w, h in [(1, 1), (16, 9), (5, 7)]:
        ga = rng.randint(0, 256, w * h * 2, dtype=np.uint8)
        want_ga = bytes(
            b
            for j in range(0, len(ga), 2)
            for c in (flat(ga[j], ga[j + 1]),)
            for b in (c, c, c)
        )
        rgba = rng.randint(0, 256, w * h * 4, dtype=np.uint8)
        want_rgba = bytes(
            flat(rgba[j + ch], rgba[j + 3])
            for j in range(0, len(rgba), 4)
            for ch in (0, 1, 2)
        )
        for f in range(5):
            fmt, got = mm.PNGDecoder.parse_fmt(
                mm.PNGDecoder.encode(w, h, ga.tobytes(), [f] * h, ctype=4)
            )
            assert fmt == "gray-alpha" and got == (w, h, want_ga), (w, h, f)
            fmt, got = mm.PNGDecoder.parse_fmt(
                mm.PNGDecoder.encode(w, h, rgba.tobytes(), [f] * h, ctype=6)
            )
            assert fmt == "rgba" and got == (w, h, want_rgba), (w, h, f)


def test_png_alpha_compositing_boundaries():
    """Alpha semantics pinned at the boundaries: a=255 is the identity
    (RGBA decodes to its own RGB), a=0 is the background everywhere,
    and a mid alpha rounds half-up."""
    # fully opaque: identity with the RGB decode of the same pixels
    rgb = bytes([10, 20, 30, 200, 150, 100])
    rgba = bytes([10, 20, 30, 255, 200, 150, 100, 255])
    _, got = mm.PNGDecoder.parse_fmt(mm.PNGDecoder.encode(2, 1, rgba, ctype=6))
    assert got == (2, 1, rgb)
    # fully transparent: the declared white background
    rgba0 = bytes([10, 20, 30, 0, 200, 150, 100, 0])
    _, got = mm.PNGDecoder.parse_fmt(mm.PNGDecoder.encode(2, 1, rgba0, ctype=6))
    assert got == (2, 1, bytes([255] * 6))
    # half alpha (a=128 on fg=0 over bg=255): (128*0 + 127*255 + 127)//255 = 127
    ga = bytes([0, 128])
    _, got = mm.PNGDecoder.parse_fmt(mm.PNGDecoder.encode(1, 1, ga, ctype=4))
    assert got == (1, 1, bytes([127, 127, 127]))


def test_png_16bit_round_trip_all_filters():
    """Round-6 second widening: 16-bit grayscale and truecolor decode
    through every scanline filter with the exact integer downscale
    (v*255 + 32767) // 65535 — boundary-pinned: 0 -> 0, 65535 -> 255,
    and 32896 (= 0x8080) -> 128."""
    import numpy as np

    def scale(v):
        return (v * 255 + 32767) // 65535

    rng = np.random.RandomState(17)
    for w, h in [(1, 1), (9, 5)]:
        g16 = rng.randint(0, 65536, w * h, dtype=np.uint16)
        want_g = bytes(b for v in g16 for c in (scale(int(v)),) for b in (c, c, c))
        rgb16 = rng.randint(0, 65536, w * h * 3, dtype=np.uint16)
        want_rgb = bytes(scale(int(v)) for v in rgb16)
        for f in range(5):
            fmt, got = mm.PNGDecoder.parse_fmt(
                mm.PNGDecoder.encode(
                    w, h, g16.astype(">u2").tobytes(), [f] * h, ctype=0, depth=16
                )
            )
            assert fmt == "gray16" and got == (w, h, want_g), (w, h, f)
            fmt, got = mm.PNGDecoder.parse_fmt(
                mm.PNGDecoder.encode(
                    w, h, rgb16.astype(">u2").tobytes(), [f] * h, ctype=2, depth=16
                )
            )
            assert fmt == "rgb16" and got == (w, h, want_rgb), (w, h, f)
    # boundary values of the downscale
    import struct

    samples = struct.pack(">3H", 0, 65535, 32896)
    _, got = mm.PNGDecoder.parse_fmt(
        mm.PNGDecoder.encode(1, 1, samples, ctype=2, depth=16)
    )
    assert got == (1, 1, bytes([0, 255, 128]))
    # depth 16 is invalid for palette/alpha fixtures
    import pytest as _pytest

    with _pytest.raises(ValueError, match="depth 16"):
        mm.PNGDecoder.encode(2, 1, bytes(4), ctype=4, depth=16)


def test_png_adam7_interlaced_equals_straight_decode():
    """Round-6 third widening: Adam7-interlaced PNGs must decode to
    EXACTLY the bytes the straight encoding of the same pixels
    decodes to — across color types, depths, odd dimensions (empty
    passes), and non-zero per-pass filters."""
    import numpy as np

    rng = np.random.RandomState(23)
    cases = []
    for w, h in [(1, 1), (2, 3), (8, 8), (13, 7), (5, 11)]:
        cases.append((w, h, rng.randint(0, 256, w * h * 3, dtype=np.uint8).tobytes(), {"ctype": 2}))
        cases.append((w, h, rng.randint(0, 256, w * h, dtype=np.uint8).tobytes(), {"ctype": 0}))
        cases.append((w, h, rng.randint(0, 256, w * h * 4, dtype=np.uint8).tobytes(), {"ctype": 6}))
        cases.append(
            (w, h, rng.randint(0, 65536, w * h * 3, dtype=np.uint16).astype(">u2").tobytes(),
             {"ctype": 2, "depth": 16})
        )
    pal = bytes(rng.randint(0, 256, 3 * 256, dtype=np.uint8))
    cases.append((9, 6, rng.randint(0, 256, 54, dtype=np.uint8).tobytes(), {"ctype": 3, "palette": pal}))
    for w, h, px, kw in cases:
        want = mm.PNGDecoder.parse_fmt(mm.PNGDecoder.encode(w, h, px, **kw))
        got = mm.PNGDecoder.parse_fmt(mm.PNGDecoder.encode(w, h, px, interlace=True, **kw))
        assert got == want, (w, h, kw)
    # non-zero filters inside passes: cycle all five across pass rows
    w, h = 12, 10
    px = rng.randint(0, 256, w * h * 3, dtype=np.uint8).tobytes()
    passes = [(x0, y0, dx, dy) for x0, y0, dx, dy in mm.PNGDecoder.ADAM7]
    total_rows = sum(
        ((h - y0 + dy - 1) // dy) for x0, y0, dx, dy in passes
        if w > x0 and h > y0 and ((w - x0 + dx - 1) // dx) > 0
    )
    fts = [(r * 7 + 1) % 5 for r in range(total_rows)]
    got = mm.PNGDecoder.parse_fmt(
        mm.PNGDecoder.encode(w, h, px, fts, ctype=2, interlace=True)
    )
    want = mm.PNGDecoder.parse_fmt(mm.PNGDecoder.encode(w, h, px, ctype=2))
    assert got == want
    # byte-accounting corruption classes: a zlib-valid stream whose
    # raw bytes end short of (or run past) the Adam7 pass total is
    # corrupt — and the geometry helper is the single source of truth
    import struct
    import zlib

    def laced_with_raw(raw_bytes):
        ihdr = struct.pack(">IIBBBBB", 8, 8, 8, 2, 0, 0, 1)
        return (
            mm.PNGDecoder.MAGIC
            + mm.PNGDecoder._chunk(b"IHDR", ihdr)
            + mm.PNGDecoder._chunk(b"IDAT", zlib.compress(raw_bytes))
            + mm.PNGDecoder._chunk(b"IEND", b"")
        )

    expected = sum(
        ph * (1 + pw * 3) for *_a, pw, ph in mm.PNGDecoder._adam7_passes(8, 8)
    )
    assert mm.PNGDecoder.parse_fmt(laced_with_raw(bytes(expected)))[1] is not None
    assert mm.PNGDecoder.parse_fmt(laced_with_raw(bytes(expected - 1)))[0] == "corrupt"
    assert mm.PNGDecoder.parse_fmt(laced_with_raw(bytes(expected + 1)))[0] == "corrupt"


def test_png_huge_header_tiny_body_is_corrupt_not_memoryerror():
    """A crafted ~100-byte interlaced PNG declaring a 50000x50000
    image must classify as corrupt — never attempt a gigabyte
    allocation (MemoryError/OverflowError kill the Spark task; decode
    errors are data). Same guarantee for a declared-size zlib bomb:
    the inflate is bounded by the header-declared byte count."""
    import struct
    import zlib

    for w, h, interlace in [(50000, 50000, 1), (50000, 50000, 0), (2**31 - 1, 2**31 - 1, 1)]:
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, interlace)
        buf = (
            mm.PNGDecoder.MAGIC
            + mm.PNGDecoder._chunk(b"IHDR", ihdr)
            + mm.PNGDecoder._chunk(b"IDAT", zlib.compress(bytes(10)))
            + mm.PNGDecoder._chunk(b"IEND", b"")
        )
        assert mm.PNGDecoder.parse_fmt(buf) == ("corrupt", None), (w, interlace)
    # zlib bomb: 1 MB of zeros compresses to ~1 KB but the header
    # declares a 2x2 image — bounded inflate classifies it corrupt
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    bomb = (
        mm.PNGDecoder.MAGIC
        + mm.PNGDecoder._chunk(b"IHDR", ihdr)
        + mm.PNGDecoder._chunk(b"IDAT", zlib.compress(bytes(1_000_000)))
        + mm.PNGDecoder._chunk(b"IEND", b"")
    )
    assert mm.PNGDecoder.parse_fmt(bomb) == ("corrupt", None)


# --- dHash perceptual fingerprint + Hamming-blocked image dedup --------


def _ref_dhash_bands(gray):
    """Independent pure-Python dHash reference (no numpy, no shared
    code with the kernel): bit (y, x) set iff gray[y][x+1] > gray[y][x],
    band k packs rows 2k (low byte) and 2k+1 (high byte)."""
    bands = [0] * mm.DHASH_BANDS
    for y in range(mm.DHASH_H):
        for x in range(mm.DHASH_W - 1):
            if gray[y][x + 1] > gray[y][x]:
                bands[y // 2] |= 1 << ((y % 2) * 8 + x)
    return bands


def test_dhash_bands_match_independent_reference(spark):
    import numpy as np

    w, h = mm.DHASH_W, mm.DHASH_H
    rgb = np.zeros((h, w, 3), np.uint8)
    for y in range(h):
        for x in range(w):
            v = (x * 37 + y * 91) % 256
            rgb[y, x] = (v, (v + 3) % 256, (v + 7) % 256)
    payload = mm.RawRGBDecoder.encode(w, h, rgb.tobytes())
    df = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, payload binary")
    row = df.mapInPandas(mm.dhash_bands_batches(), schema=mm.DHASH_SCHEMA).first()
    gray = [
        [
            (299 * int(rgb[y, x, 0]) + 587 * int(rgb[y, x, 1]) + 114 * int(rgb[y, x, 2]))
            // 1000
            for x in range(w)
        ]
        for y in range(h)
    ]
    assert [row[f"b{k}"] for k in range(mm.DHASH_BANDS)] == _ref_dhash_bands(gray)


def test_dhash_malformed_or_wrong_dims_is_null(spark):
    good = mm.RawRGBDecoder.encode(mm.DHASH_W, mm.DHASH_H, bytes(mm.DHASH_W * mm.DHASH_H * 3))
    wrong_dims = mm.RawRGBDecoder.encode(8, 8, bytes(8 * 8 * 3))
    df = spark.createDataFrame(
        [(0, bytearray(good)), (1, bytearray(wrong_dims)), (2, bytearray(b"junk")), (3, None)],
        "doc_id long, payload binary",
    )
    rows = {
        r.doc_id: r
        for r in df.mapInPandas(mm.dhash_bands_batches(), schema=mm.DHASH_SCHEMA).collect()
    }
    assert all(rows[0][f"b{k}"] is not None for k in range(mm.DHASH_BANDS))
    for bad in (1, 2, 3):
        assert all(rows[bad][f"b{k}"] is None for k in range(mm.DHASH_BANDS))


def test_dhash_invariant_to_2x_resolution(spark):
    """The perceptual property: the SAME pattern rendered at 2x the
    resolution (each pixel duplicated 2x2) fingerprints IDENTICALLY —
    the NN grid samples the same relative positions
    (floor(floor(2a)/2) = floor(a))."""
    import numpy as np

    rng_vals = (np.arange(20 * 24 * 3, dtype=np.int64) * 7919 % 251).astype(np.uint8)
    base = rng_vals.reshape(24, 20, 3)
    big = np.repeat(np.repeat(base, 2, axis=0), 2, axis=1)
    df = spark.createDataFrame(
        [
            (0, bytearray(mm.RawRGBDecoder.encode(20, 24, base.tobytes()))),
            (1, bytearray(mm.RawRGBDecoder.encode(40, 48, big.tobytes()))),
        ],
        "doc_id long, payload binary",
    )
    fps = {r.doc_id: r for r in mm.dhash_fingerprints(df).collect()}
    for k in range(mm.DHASH_BANDS):
        assert fps[0][f"b{k}"] == fps[1][f"b{k}"]


def test_dedup_image_recall_all_group_pairs(spark, sf_small, cat):
    """Constructed near-dup recall: every group of 4 variants must
    produce all 6 within-group pairs (the synthesis guarantees a
    1-pixel perturbation flips <= 2 dHash bits in one band, so blocking
    AND the radius both hold), base↔variant pairs within Hamming 2,
    variant↔variant within 4."""
    rows = cat["q_dedup_image"].fn(spark, sf_small).collect()
    got = {(r.doc_a, r.doc_b): r.hamming for r in rows}
    n_groups = 500 // 4
    for g in range(n_groups):
        ids = [4 * g + i for i in range(4)]
        for i in range(4):
            for j in range(i + 1, 4):
                key = (ids[i], ids[j])
                assert key in got, f"missing within-group pair {key}"
                limit = 2 if i == 0 else 4
                assert got[key] <= limit, (key, got[key])
    assert all(h <= 7 for h in got.values())


def test_hamming_candidates_pigeonhole_boundary(spark):
    """A pair with 7 flips concentrated in one band shares 7 bands ->
    found at hamming 7; a pair with one flip in EVERY band shares no
    band -> correctly absent (the documented blocking boundary at
    hamming 8 = n_bands)."""
    from production_ready_ds_spark.operators.dedup import hamming_candidates

    base = [10, 20, 30, 40, 50, 60, 70, 80]
    seven_one_band = [base[0] ^ 0b1111111] + base[1:]
    one_per_band = [b ^ 1 for b in base]
    df = spark.createDataFrame(
        [(0, *base), (1, *seven_one_band), (2, *one_per_band)],
        "doc_id long, " + ", ".join(f"b{k} long" for k in range(8)),
    )
    rows = hamming_candidates(df, radius=7).collect()
    got = {(r.doc_a, r.doc_b): r.hamming for r in rows}
    assert got.get((0, 1)) == 7
    assert (0, 2) not in got
    # docs 1 and 2 differ by 7+8 flips minus overlaps -> whatever the
    # distance, it exceeds the radius or shares no band; either way the
    # only emitted pair is (0, 1)
    assert set(got) == {(0, 1)}


def test_hamming_candidates_oversized_bucket_guard(spark):
    """30 identical fingerprints (> OVERSIZED_BUCKET_CAP = 20) must pair
    at n*cap, not n^2: every member keeps an edge to the bucket's
    lowest ids so connected components still collapses the family."""
    from production_ready_ds_spark.operators.dedup import (
        OVERSIZED_BUCKET_CAP,
        hamming_candidates,
    )

    n = 30
    fp = [11, 22, 33, 44, 55, 66, 77, 88]
    df = spark.createDataFrame(
        [(i, *fp) for i in range(n)],
        "doc_id long, " + ", ".join(f"b{k} long" for k in range(8)),
    )
    rows = hamming_candidates(df, radius=7).collect()
    assert len(rows) <= n * OVERSIZED_BUCKET_CAP
    seen = {r.doc_a for r in rows} | {r.doc_b for r in rows}
    assert seen == set(range(n)), "every family member needs at least one edge"
    assert all(r.doc_a < OVERSIZED_BUCKET_CAP for r in rows)
    assert all(r.hamming == 0 for r in rows)


def test_hamming_candidates_superband_tier(spark):
    """Past the mean-bucket limit the blocking key becomes pairs of
    adjacent bands (mean_bucket_limit=0 forces the tier): flips
    confined to ONE super-band still block (3 of 4 shared), while one
    flip in every OTHER base band touches all 4 super-bands and is
    correctly absent even under the radius."""
    from production_ready_ds_spark.operators.dedup import hamming_candidates

    base = [10, 20, 30, 40, 50, 60, 70, 80]
    two_bands_one_super = [base[0] ^ 3, base[1] ^ 3] + base[2:]  # bands 0+1
    one_per_super = [b ^ (1 - (k % 2)) if k % 2 == 0 else b for k, b in enumerate(base)]
    df = spark.createDataFrame(
        [(0, *base), (1, *two_bands_one_super), (2, *one_per_super)],
        "doc_id long, " + ", ".join(f"b{k} long" for k in range(8)),
    )
    rows = hamming_candidates(df, radius=7, mean_bucket_limit=0).collect()
    got = {(r.doc_a, r.doc_b): r.hamming for r in rows}
    assert got.get((0, 1)) == 4
    assert (0, 2) not in got, "flips in all 4 super-bands must not block"
    # same frame under the small-corpus tier: doc 2 DOES share 4 of 8
    # base bands with doc 0 and surfaces at hamming 4
    rows1 = hamming_candidates(df, radius=7).collect()
    got1 = {(r.doc_a, r.doc_b): r.hamming for r in rows1}
    assert got1.get((0, 2)) == 4


def test_hamming_candidates_low_entropy_corpus_escalates(spark):
    """The tier rule measures bucket load, not corpus size: a tiny but
    LOW-ENTROPY corpus (18 identical fingerprints drive mean bucket
    past the limit — the mostly-flat-images case a doc-count threshold
    cannot see) escalates to super-bands at the DEFAULT limit, so the
    one-flip-per-super-band variant stops blocking; an equal-SIZE
    high-entropy corpus stays on raw bands (the 3-doc test above)."""
    from production_ready_ds_spark.operators.dedup import hamming_candidates

    base = [10, 20, 30, 40, 50, 60, 70, 80]
    one_per_super = [b ^ (1 - (k % 2)) if k % 2 == 0 else b for k, b in enumerate(base)]
    rows = [(i, *base) for i in range(19)] + [(19, *one_per_super)]
    df = spark.createDataFrame(
        rows, "doc_id long, " + ", ".join(f"b{k} long" for k in range(8))
    )
    # n=20 docs, sum of per-band distinct = 8 + 4 flips = 12 < 20 → sb=2
    got = {
        (r.doc_a, r.doc_b)
        for r in hamming_candidates(df, radius=7).collect()
    }
    assert all(19 not in pair for pair in got), (
        "one flip per super-band must not block under the escalated tier"
    )
    assert (0, 1) in got, "identical fingerprints still pair"


# --- Y4M video container ------------------------------------------------


def test_y4m_roundtrip_exact_planes():
    import numpy as np

    w, h = 10, 8
    f0 = (np.arange(w * h) % 256).astype(np.uint8).tobytes()
    f1 = ((np.arange(w * h) * 7) % 256).astype(np.uint8).tobytes()
    buf = mm.Y4MVideoDecoder.encode(w, h, [f0, f1])
    outcome, parsed = mm.Y4MVideoDecoder.parse_fmt(buf)
    assert outcome == "420"
    pw, ph, frames = parsed
    assert (pw, ph) == (w, h)
    assert frames == [f0, f1]
    # mono variant: no chroma planes, same Y round-trip
    buf_m = mm.Y4MVideoDecoder.encode(w, h, [f0], colorspace="mono")
    outcome, parsed = mm.Y4MVideoDecoder.parse_fmt(buf_m)
    assert outcome == "mono" and parsed[2] == [f0]
    assert len(buf_m) < len(buf), "mono must not carry chroma bytes"


def test_y4m_rejects_malformed_and_out_of_subset():
    import numpy as np

    w, h = 8, 8
    y = bytes(w * h)
    good = mm.Y4MVideoDecoder.encode(w, h, [y, y])
    # truncation at EVERY boundary class: header, frame marker, plane
    for cut in (5, len(good) - 1, len(good) - w * h // 2):
        assert mm.Y4MVideoDecoder.parse_fmt(good[:cut])[0] in ("corrupt", "not-y4m")
    assert mm.Y4MVideoDecoder.parse_fmt(b"")[0] == "not-y4m"
    assert mm.Y4MVideoDecoder.parse_fmt(b"RIFF junk")[0] == "not-y4m"
    # valid grammar, undeclared colorspaces
    for cs in ("444", "422", "411"):
        hdr = f"YUV4MPEG2 W8 H8 F25:1 Ip C{cs}\n".encode()
        assert mm.Y4MVideoDecoder.parse_fmt(hdr)[0] == "unsupported", cs
    # interlaced streams are out of subset
    hdr = b"YUV4MPEG2 W8 H8 F25:1 It C420jpeg\n"
    assert mm.Y4MVideoDecoder.parse_fmt(hdr)[0] == "unsupported"
    # odd dims under C420, zero dims, and a declared-size bomb
    assert mm.Y4MVideoDecoder.parse_fmt(b"YUV4MPEG2 W9 H8 C420\n")[0] == "corrupt"
    assert mm.Y4MVideoDecoder.parse_fmt(b"YUV4MPEG2 W0 H8 C420\n")[0] == "corrupt"
    assert (
        mm.Y4MVideoDecoder.parse_fmt(b"YUV4MPEG2 W100000 H100000 C420\n")[0]
        == "corrupt"
    )
    # garbage between frames
    bad = good[: len(good) - (w * h + 2 * 16) - 6] + b"JUNK!\n" + good[-(w * h + 2 * 16) :]
    assert mm.Y4MVideoDecoder.parse_fmt(bad)[0] == "corrupt"
    # encode guards its own contract
    with pytest.raises(ValueError):
        mm.Y4MVideoDecoder.encode(9, 8, [bytes(72)])
    with pytest.raises(ValueError):
        mm.Y4MVideoDecoder.encode(8, 8, [bytes(3)])


def test_y4m_frames_kernel_samples_and_gray_expands(spark):
    import numpy as np

    w, h = 8, 8
    planes = [
        ((np.arange(w * h) + 10 * f) % 256).astype(np.uint8).tobytes() for f in range(5)
    ]
    buf = mm.Y4MVideoDecoder.encode(w, h, planes)
    df = spark.createDataFrame(
        [(7, bytearray(buf)), (8, bytearray(b"junk"))], "doc_id long, payload binary"
    )
    rows = df.mapInPandas(
        mm.y4m_frames_batches(stride=2),
        schema="doc_id long, frame_idx int, n_frames long, payload binary",
    ).collect()
    got = {(r.doc_id, r.frame_idx): r for r in rows}
    assert {k for k in got if k[0] == 7} == {(7, 0), (7, 2), (7, 4)}
    assert all(r.n_frames == 5 for r in rows if r.doc_id == 7)
    parsed = mm.RawRGBDecoder.parse(got[(7, 2)].payload)
    assert parsed[:2] == (w, h)
    expect = bytes(b for yb in planes[2] for b in (yb, yb, yb))
    assert parsed[2] == expect, "gray expansion must triple each Y byte"
    # undecodable payload -> one all-NULL row, doc still visible
    assert got[(8, None)].payload is None and got[(8, None)].n_frames is None


def test_y4m_frames_kernel_header_only_stream_keeps_doc(spark):
    """A valid but FRAMELESS Y4M (header only) must still emit one row
    (n_frames = 0, NULL frame) — a decodable doc silently vanishing
    from corpus joins is the contract violation the all-NULL row
    exists to prevent."""
    buf = b"YUV4MPEG2 W8 H8 F25:1 Ip C420jpeg\n"
    assert mm.Y4MVideoDecoder.parse_fmt(buf)[0] == "420"
    df = spark.createDataFrame([(5, bytearray(buf))], "doc_id long, payload binary")
    rows = df.mapInPandas(
        mm.y4m_frames_batches(stride=2),
        schema="doc_id long, frame_idx int, n_frames long, payload binary",
    ).collect()
    assert len(rows) == 1
    assert rows[0].n_frames == 0 and rows[0].frame_idx is None
    assert rows[0].payload is None


def test_video_dhash_majority_outvotes_single_frame_edit(spark):
    """The temporal majority fold: with 3 sampled identical frames, a
    1-pixel edit in ONE sampled frame is outvoted 2:1 — the edited
    video fingerprints IDENTICALLY to the clean one; corrupt payloads
    yield all-NULL bands but keep their doc visible."""
    import numpy as np

    w, h = 16, 16
    y = ((np.arange(w * h, dtype=np.int64) * 7919) % 251).astype(np.uint8)
    y_edit = y.copy()
    # pixel 40 = grid cell (oy=2, ox=5); y[39]=111 < y[40]=249, so
    # zeroing it provably flips the (2, x=4) comparison bit
    assert y[39] < y[40] and y[40] > 0
    y_edit[40] = 0
    # stride=2 over 5 frames samples indices 0, 2, 4
    clean = mm.Y4MVideoDecoder.encode(w, h, [y.tobytes()] * 5)
    edited = mm.Y4MVideoDecoder.encode(
        w, h, [y.tobytes(), y.tobytes(), y_edit.tobytes(), y.tobytes(), y.tobytes()]
    )
    df = spark.createDataFrame(
        [(0, bytearray(clean)), (1, bytearray(edited)), (2, bytearray(b"junk"))],
        "doc_id long, payload binary",
    )
    fps = {
        r.doc_id: r
        for r in df.mapInPandas(
            mm.video_dhash_batches(stride=2), schema=mm.DHASH_SCHEMA
        ).collect()
    }
    for k in range(mm.DHASH_BANDS):
        assert fps[0][f"b{k}"] == fps[1][f"b{k}"], "majority must outvote the edit"
        assert fps[2][f"b{k}"] is None
    # single-frame video: the edit IS the majority -> fingerprints differ
    one_clean = mm.Y4MVideoDecoder.encode(w, h, [y.tobytes()])
    one_edit = mm.Y4MVideoDecoder.encode(w, h, [y_edit.tobytes()])
    df1 = spark.createDataFrame(
        [(0, bytearray(one_clean)), (1, bytearray(one_edit))],
        "doc_id long, payload binary",
    )
    fps1 = {
        r.doc_id: r
        for r in df1.mapInPandas(
            mm.video_dhash_batches(stride=2), schema=mm.DHASH_SCHEMA
        ).collect()
    }
    assert any(fps1[0][f"b{k}"] != fps1[1][f"b{k}"] for k in range(mm.DHASH_BANDS))


def test_dedup_video_recall_all_group_pairs(spark, sf_small, cat):
    """Constructed near-dup recall for the video corpus: all 6
    within-group pairs per group of 4 found (a sampled 1-pixel/1-frame
    perturbation flips <= 2 majority bits; an unsampled one flips 0),
    base↔variant within Hamming 2, variant↔variant within 4."""
    rows = cat["q_dedup_video"].fn(spark, sf_small).collect()
    got = {(r.doc_a, r.doc_b): r.hamming for r in rows}
    for g in range(500 // 4):
        ids = [4 * g + i for i in range(4)]
        for i in range(4):
            for j in range(i + 1, 4):
                key = (ids[i], ids[j])
                assert key in got, f"missing within-group pair {key}"
                limit = 2 if i == 0 else 4
                assert got[key] <= limit, (key, got[key])
    assert all(h <= 7 for h in got.values())


def test_perceptual_cluster_queries_collapse_groups(spark, sf_small, cat):
    """Both perceptual cluster queries must collapse every constructed
    group of 4 variants into ONE cluster rooted at the group's lowest
    doc_id (the keep-decision contract: chains resolve transitively)."""
    for name in (
        "q_dedup_image_clusters",
        "q_dedup_video_clusters",
        "q_dedup_audio_clusters",
    ):
        rows = cat[name].fn(spark, sf_small).collect()
        got = {r.doc_id: r.cluster_id for r in rows}
        assert len(got) == 500, name
        for g in range(500 // 4):
            for i in range(4):
                assert got[4 * g + i] == 4 * g, (name, g, i)


def test_audio_envelope_dhash_kernel(spark):
    """Envelope hash through the REAL WAV container: known per-window
    amplitudes produce exactly the louder-than bits; gain scaling
    preserves the fingerprint (order-invariance); malformed and
    too-short payloads yield all-NULL bands."""
    import numpy as np

    step, W = 4, mm.ENVELOPE_WINDOWS
    w = ((np.arange(W, dtype=np.int64) * 7919) % 251) + 1
    amp = np.repeat(w, step)
    sign = np.where(np.arange(len(amp)) % 2 == 0, 1, -1)
    buf = mm.WAVAudioDecoder.encode(8000, (amp * sign).astype("<i2"))
    buf2x = mm.WAVAudioDecoder.encode(8000, (2 * amp * sign).astype("<i2"))
    short = mm.WAVAudioDecoder.encode(8000, np.ones(W - 1, dtype="<i2"))
    df = spark.createDataFrame(
        [(0, bytearray(buf)), (1, bytearray(buf2x)), (2, bytearray(b"junk")),
         (3, bytearray(short))],
        "doc_id long, payload binary",
    )
    fps = {
        r.doc_id: r
        for r in df.mapInPandas(
            mm.audio_envelope_dhash_batches(), schema=mm.DHASH_SCHEMA
        ).collect()
    }
    bits = (w[1:] > w[:-1]).astype(int)
    expect = [
        int(sum(b << p for p, b in enumerate(bits[16 * k : 16 * k + 16])))
        for k in range(8)
    ]
    assert [fps[0][f"b{k}"] for k in range(8)] == expect
    for k in range(8):
        assert fps[1][f"b{k}"] == fps[0][f"b{k}"], "2x gain must not move bits"
        assert fps[2][f"b{k}"] is None and fps[3][f"b{k}"] is None


def test_dedup_audio_recall_all_group_pairs(spark, sf_small, cat):
    """Constructed near-dup recall for the audio corpus: all 6
    within-group pairs found (a 1-window amplitude overwrite flips <= 2
    adjacent envelope bits), base↔variant within Hamming 2,
    variant↔variant within 4."""
    rows = cat["q_dedup_audio"].fn(spark, sf_small).collect()
    got = {(r.doc_a, r.doc_b): r.hamming for r in rows}
    for g in range(500 // 4):
        ids = [4 * g + i for i in range(4)]
        for i in range(4):
            for j in range(i + 1, 4):
                key = (ids[i], ids[j])
                assert key in got, f"missing within-group pair {key}"
                limit = 2 if i == 0 else 4
                assert got[key] <= limit, (key, got[key])
    assert all(h <= 7 for h in got.values())


def test_hamming_oracle_cap_replay_matches_spark_on_hot_buckets(spark):
    """The dHash oracle's oversized-bucket replay (ranked CTE): on a
    corpus with > cap identical fingerprints the DuckDB formulation
    emits EXACTLY hamming_candidates' pair set (round 9: the minhash
    oracle replays the same guard — test_minhash_oracle_cap_replay)."""
    import duckdb

    from production_ready_ds_spark.operators.dedup import (
        OVERSIZED_BUCKET_CAP,
        hamming_candidates,
    )

    n = OVERSIZED_BUCKET_CAP + 12
    fp = [77, 177, 277, 377, 477, 577, 677, 777]
    df = spark.createDataFrame(
        [(i, *fp) for i in range(n)],
        "doc_id long, " + ", ".join(f"b{k} long" for k in range(8)),
    )
    got = {
        (r.doc_a, r.doc_b)
        for r in hamming_candidates(df, radius=7).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE sb AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, {k}, {v})" for i in range(n) for k, v in enumerate(fp))
        + ") AS t(doc_id, band, key)"
    )
    want = {
        (a, b)
        for a, b in con.execute(
            f"""
            WITH ranked AS (
              SELECT doc_id, band, key,
                     ROW_NUMBER() OVER (PARTITION BY band, key
                                        ORDER BY doc_id) AS rnk,
                     COUNT(*) OVER (PARTITION BY band, key) AS bn
              FROM sb
            )
            SELECT DISTINCT a.doc_id, b.doc_id
            FROM ranked a JOIN ranked b
              ON a.band = b.band AND a.key = b.key
             AND a.doc_id < b.doc_id
             AND (a.bn <= {OVERSIZED_BUCKET_CAP}
                  OR a.rnk <= {OVERSIZED_BUCKET_CAP})
            """
        ).fetchall()
    }
    assert got == want and len(got) > 0
    # the hot-bucket shape: every pair's lower end is a capped member
    assert all(a < OVERSIZED_BUCKET_CAP for a, _ in got)


def test_multimodal_clusters_coarsen_both_modalities(spark, sf_small, cat):
    """The cross-modal composition property over the FULL modality set
    (round 9): any two documents sharing a TEXT, IMAGE, VIDEO, or
    AUDIO cluster must share a multimodal cluster (the union graph can
    only merge components, never split them), and every document
    appears exactly once."""
    from collections import defaultdict

    mm_cl = {
        r.doc_id: r.cluster_id
        for r in cat["q_dedup_multimodal_clusters"].fn(spark, sf_small).collect()
    }
    assert len(mm_cl) == 500
    for modal in (
        "q_dedup_image_clusters",
        "q_dedup_clusters",
        "q_dedup_video_clusters",
        "q_dedup_audio_clusters",
    ):
        groups = defaultdict(list)
        for r in cat[modal].fn(spark, sf_small).collect():
            groups[r.cluster_id].append(r.doc_id)
        for members in groups.values():
            assert len({mm_cl[m] for m in members}) == 1, (modal, members)


def test_multimodal_keep_best_ranks_decoded_quality(spark, sf_small, cat):
    """Round-10 quality-aware canonicals over the cross-modal
    families: (a) the cluster sets are EXACTLY q_dedup_multimodal_
    clusters'; (b) one keep per cluster, kept iff doc_id == keep;
    (c) the winner maximizes the per-modality quality tuple (n_chars
    desc, img w·h desc, video frames desc, audio samples desc, doc_id
    asc) re-derived from the synth closed forms; (d) the DECODED keys
    the Spark side ranks by equal those closed forms — pinning the
    header-parse path."""
    from production_ready_ds_spark.operators.multimodal import ENVELOPE_WINDOWS
    from production_ready_ds_spark.queries.multimodal import _multimodal_quality

    base = {
        r.doc_id: r.cluster_id
        for r in cat["q_dedup_multimodal_clusters"].fn(spark, sf_small).collect()
    }
    rows = cat["q_dedup_multimodal_keep_best"].fn(spark, sf_small).collect()
    assert len(rows) == 500
    assert {r.doc_id: r.cluster_id for r in rows} == base

    n_chars = {
        r.doc_id: r.n_chars
        for r in load(spark, sf_small, "documents")
        .select("doc_id", "n_chars")
        .collect()
    }

    def quality(doc_id):
        g = doc_id // 4
        return (
            -n_chars[doc_id],
            -(16 + g % 7) * (16 + g % 5),  # image w·h
            -(3 + g % 3),  # video frames
            -ENVELOPE_WINDOWS * (8 + g % 5),  # audio samples
            doc_id,
        )

    from collections import defaultdict

    members = defaultdict(list)
    for r in rows:
        members[r.cluster_id].append(r)
    for cl, rs in members.items():
        keeps = {r.keep_doc_id for r in rs}
        assert len(keeps) == 1, (cl, keeps)
        want = min((r.doc_id for r in rs), key=quality)
        assert keeps == {want}, (cl, keeps, want)
        for r in rs:
            assert r.kept == (r.doc_id == r.keep_doc_id)

    decoded = _multimodal_quality(spark, sf_small).collect()
    assert len(decoded) == 500
    for r in decoded:
        g = r.doc_id // 4
        assert r.img_pixels == (16 + g % 7) * (16 + g % 5)
        assert r.vid_frames == 3 + g % 3
        assert r.aud_samples == ENVELOPE_WINDOWS * (8 + g % 5)
