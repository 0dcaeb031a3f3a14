"""Multimodal columns — opaque binary payloads with typed metadata.

Training-data-pipeline extension (SURVEY.md §7 M5): image/audio/video are
carried as ``binary`` columns plus a metadata struct; transforms run as
Arrow-batched ``mapInPandas`` so each Python batch touches thousands of
payloads with one serialization hop. The Spark-side plumbing (schema,
partitioning, batch shape, fan-out) is real and tested. Decode is REAL
end-to-end for uncompressed 24/32-bit BMP (:func:`decode_bmp`, pure
numpy) and RIFF/WAVE uncompressed PCM audio (:func:`decode_wav` /
:func:`encode_wav_pcm`, stdlib struct + numpy — certified by the
mm_audio_features oracle); other formats use a clearly-marked
deterministic STUB (codec
libraries are not in this container) — pass ``decoder=`` to
``decode_image_batch`` / ``sample_video_frames`` to slot in a full codec
without touching the plan.

At 100 TB: payload columns dominate IO — keep them in their own parquet
column (column pruning skips them for metadata-only queries), partition by
content date/source, and size ``spark.sql.files.maxPartitionBytes`` so one
task's payload batch fits executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Arrow batch schema produced by byte_histogram_features. ``counts`` is
#: the raw (un-normalized) 16-bin histogram — exact integers, used by the
#: driver-compared query contract; ``feature`` is the normalized float
#: form a downstream model consumes.
_FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, entropy double, feature array<double>, "
    "counts array<long>"
)


def attach_binary_payload(
    df: DataFrame, id_col: str, text_col: str, mime: str = "application/octet-stream"
) -> DataFrame:
    """Materialize an opaque binary payload column + metadata struct.

    With no media files in the container, the payload is the UTF-8 encoded
    document body — the schema/partitioning contract is identical for real
    image/audio bytes.
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.struct(
            # BIGINT, not INT: DuckDB octet_length is BIGINT and the
            # driver's canonicalizer compares dtype width.
            F.octet_length(F.col(text_col)).cast("long").alias("n_bytes"),
            F.lit(mime).alias("mime"),
        ).alias("meta"),
    )


def byte_histogram_features(binary_df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads: 16-bin byte
    histogram (normalized) + Shannon entropy. A real featurizer (CLIP,
    mel-spectrogram, ...) replaces the numpy body; the mapInPandas batch
    contract stays the same."""
    import numpy as np

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(payload, dtype=np.uint8)
                hist = np.bincount(arr >> 4, minlength=16).astype(np.float64)
                total = hist.sum()
                p = hist / total if total else hist
                nz = p[p > 0]
                entropy = float(-(nz * np.log2(nz)).sum()) if nz.size else 0.0
                out.append(
                    (
                        int(doc_id),
                        int(arr.size),
                        round(entropy, 6),
                        (p.round(9)).tolist(),
                        [int(c) for c in hist],
                    )
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "n_bytes", "entropy", "feature", "counts"]
            )

    return binary_df.select("doc_id", "payload").mapInPandas(compute, _FEATURE_SCHEMA)


#: Arrow batch schema produced by decode_image_batch: uint8 RGB tensor as
#: packed bytes (row-major h×w×3) + explicit dims — the compact Arrow
#: transfer form; reshape with np.frombuffer(...).reshape(h, w, 3).
_IMAGE_SCHEMA = "doc_id long, height int, width int, channels int, pixels binary"

#: Arrow batch schema produced by sample_video_frames: one row PER SAMPLED
#: FRAME (mapInPandas fan-out: input rows ≠ output rows).
_FRAME_SCHEMA = (
    "doc_id long, frame_idx int, ts_sec double, height int, width int, "
    "channels int, pixels binary"
)


def _fake_decode_image(payload: bytes):
    """STUB DECODER — deterministic fake standing in for Pillow/opencv
    (not in this container). Tiles the payload bytes into a 32×32×3 uint8
    array; same payload → same pixels, so tests are exact. Swap this ONE
    function for ``np.asarray(Image.open(io.BytesIO(payload)))`` when a
    codec is available — nothing else in the plan changes."""
    import numpy as np

    base = np.frombuffer(payload, dtype=np.uint8)
    if base.size == 0:
        base = np.zeros(1, dtype=np.uint8)
    return np.resize(base, (32, 32, 3))


def decode_bmp(payload: bytes):
    """REAL decoder for uncompressed 24/32-bit BMP — pure numpy, no codec
    library. Parses the BITMAPFILEHEADER/BITMAPINFOHEADER, honors row
    padding (4-byte aligned strides), bottom-up vs top-down row order, and
    BGR(A) channel order; returns an (h, w, 3) uint8 RGB array.

    Raises ValueError for non-BMP payloads and NotImplementedError for
    palettized/compressed/core-header variants — callers fall back to the
    stub (or a plugged-in codec) for those.
    """
    import struct

    import numpy as np

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    header_size = struct.unpack_from("<I", payload, 14)[0]
    if header_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMP not supported")
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    # BI_RGB only; BI_BITFIELDS(3) with default masks also appears for
    # 32-bit but reordering masks is codec work, not plumbing — refuse.
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(
            f"only uncompressed 24/32-bit BMP supported (bpp={bpp}, "
            f"compression={compression})"
        )
    bottom_up = height > 0
    height = abs(height)
    if width <= 0 or height <= 0:
        raise ValueError("degenerate BMP dimensions")
    bytes_pp = bpp // 8
    stride = ((width * bytes_pp + 3) // 4) * 4
    need = data_offset + stride * height
    if len(payload) < need:
        raise ValueError("truncated BMP pixel array")
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * height, offset=data_offset
    ).reshape(height, stride)
    pix = rows[:, : width * bytes_pp].reshape(height, width, bytes_pp)
    rgb = pix[..., [2, 1, 0]]  # BGR(A) → RGB, alpha dropped
    if bottom_up:
        rgb = rgb[::-1]
    return np.ascontiguousarray(rgb)


def decode_ppm(payload: bytes):
    """REAL decoder for binary PPM (P6) — the netpbm interchange format:
    'P6' magic, whitespace/comment-separated width/height/maxval header,
    raw RGB triplets. Pure numpy; maxval ≤ 255 only (16-bit samples are
    codec work). Raises ValueError for non-PPM payloads —
    contract-compatible with :func:`decode_bmp` for per-payload
    fallback."""
    import numpy as np

    if len(payload) < 2 or payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment runs to end of line
            nl = payload.find(b"\n", pos)
            if nl < 0:
                raise ValueError("unterminated PPM comment")
            pos = nl + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("malformed PPM header")
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval, then raster
    width, height, maxval = fields
    if width <= 0 or height <= 0:
        raise ValueError("degenerate PPM dimensions")
    if not 0 < maxval < 256:
        raise NotImplementedError(f"PPM maxval {maxval} not supported")
    need = width * height * 3
    if len(payload) - pos < need:
        raise ValueError("truncated PPM raster")
    return (
        np.frombuffer(payload, dtype=np.uint8, count=need, offset=pos)
        .reshape(height, width, 3)
        .copy()
    )


def _default_decode_image(payload: bytes):
    """Default decode path: REAL decode for uncompressed 24/32-bit BMP
    and binary PPM (P6), deterministic stub otherwise. Two image decode
    paths are therefore end-to-end real in this container; everything
    else keeps the injectable ``decoder=`` seam."""
    for real in (decode_bmp, decode_ppm):
        try:
            return real(payload)
        except (ValueError, NotImplementedError):
            continue
    return _fake_decode_image(payload)


def _resize_nearest(img, height: int, width: int):
    """Nearest-neighbor resize (real logic, not stubbed): index maps
    computed once per target shape."""
    import numpy as np

    h0, w0 = img.shape[0], img.shape[1]
    rows = (np.arange(height) * h0 // height).astype(np.intp)
    cols = (np.arange(width) * w0 // width).astype(np.intp)
    return img[rows][:, cols]


def decode_image_batch(
    binary_df: DataFrame, width: int, height: int, decoder=None
) -> DataFrame:
    """Decode + nearest-neighbor-resize image payloads to (height, width,
    3) uint8 tensors, Arrow-batched via ``mapInPandas``.

    Decode is REAL for uncompressed 24/32-bit BMP payloads
    (:func:`decode_bmp`, pure numpy — no codec library needed); other
    formats fall back to the deterministic stub because codec libraries
    are not in this container. The batch contract, output schema, and
    resize math are the same either way. Pass ``decoder=`` to plug in a
    full codec (Pillow/opencv) without touching the plan.
    """
    import numpy as np

    decode = decoder or _default_decode_image

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = _resize_nearest(decode(payload), height, width)
                out.append(
                    (int(doc_id), height, width, 3,
                     np.ascontiguousarray(img, dtype=np.uint8).tobytes())
                )
            yield pd.DataFrame(
                out,
                columns=["doc_id", "height", "width", "channels", "pixels"],
            )

    return binary_df.select("doc_id", "payload").mapInPandas(compute, _IMAGE_SCHEMA)


def sample_video_frames(
    binary_df: DataFrame,
    every_n_seconds: float,
    fps: float = 30.0,
    decoder=None,
) -> DataFrame:
    """Sample one frame every ``every_n_seconds`` from video payloads —
    the mapInPandas FAN-OUT shape: each input row yields 0..n frame rows.

    The container parse/decode is a deterministic STUB (the payload is
    treated as fps 32×32×3 frames of 3072 bytes each); frame timing,
    sampling stride, and the one-row-per-frame batch contract are real.
    Pass ``decoder=`` taking (payload, frame_idx) -> HxWx3 uint8 array to
    plug in a real demuxer (pyav/ffmpeg) without touching the plan.
    """
    import numpy as np

    frame_bytes = 32 * 32 * 3

    def default_decoder(payload: bytes, frame_idx: int):
        chunk = payload[frame_idx * frame_bytes : (frame_idx + 1) * frame_bytes]
        return _fake_decode_image(chunk)

    decode = decoder or default_decoder
    stride = max(1, int(round(every_n_seconds * fps)))

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = max(1, len(payload) // frame_bytes)
                for idx in range(0, n_frames, stride):
                    img = decode(payload, idx)
                    out.append(
                        (int(doc_id), idx, round(idx / fps, 6), img.shape[0],
                         img.shape[1], 3,
                         np.ascontiguousarray(img, dtype=np.uint8).tobytes())
                    )
            yield pd.DataFrame(
                out,
                columns=["doc_id", "frame_idx", "ts_sec", "height", "width",
                         "channels", "pixels"],
            )

    return binary_df.select("doc_id", "payload").mapInPandas(compute, _FRAME_SCHEMA)


# --- audio: REAL RIFF/WAVE PCM codec (pure stdlib struct + numpy) ---------

_AUDIO_SCHEMA = (
    "doc_id long, sample_rate int, n_channels int, n_samples long, "
    "duration_sec double, rms double, peak int"
)


def encode_wav_pcm(samples, sample_rate: int, bits: int = 16) -> bytes:
    """Serialize centered integer samples (shape (n,) or (n, channels)) to
    a REAL RIFF/WAVE uncompressed-PCM payload. 8-bit WAV stores unsigned
    bytes (amplitude + 128); 16/32-bit store signed little-endian."""
    import struct

    import numpy as np

    a = np.asarray(samples)
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    if bits == 8:
        raw = (a.astype(np.int64) + 128).astype("<u1").tobytes()
    elif bits == 16:
        raw = a.astype("<i2").tobytes()
    elif bits == 32:
        raw = a.astype("<i4").tobytes()
    else:
        raise ValueError(f"unsupported PCM width: {bits}")
    block = ch * (bits // 8)
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * block, block, bits
    )
    pad = b"\x00" if len(raw) % 2 else b""
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(raw)) + raw + pad
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes):
    """REAL decoder for RIFF/WAVE uncompressed PCM — walks the chunk list
    (fmt /data, skipping LIST/fact/etc.), returns (sample_rate,
    centered int32 array of shape (n_samples, n_channels)). 8-bit input
    is de-biased by 128 so every width yields zero-centered amplitudes.

    Raises ValueError for non-WAV payloads and NotImplementedError for
    compressed (non-PCM) encodings — mirrors :func:`decode_bmp`'s
    contract so callers can fall back per-payload."""
    import struct

    import numpy as np

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, len(payload)
    fmt_chunk = data = None
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        chunk = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_chunk = chunk
        elif cid == b"data":
            data = chunk
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if fmt_chunk is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, ch, rate, _, _, bits = struct.unpack_from("<HHIIHH", fmt_chunk)
    if audio_format != 1:
        raise NotImplementedError(
            f"only uncompressed PCM supported (format={audio_format})"
        )
    if bits == 8:
        a = np.frombuffer(data, dtype="<u1").astype(np.int32) - 128
    elif bits == 16:
        a = np.frombuffer(data, dtype="<i2").astype(np.int32)
    elif bits == 32:
        a = np.frombuffer(data, dtype="<i4").astype(np.int32)
    else:
        raise NotImplementedError(f"PCM width {bits} not supported")
    n = len(a) // ch
    return rate, a[: n * ch].reshape(n, ch)


def audio_features_batch(binary_df: DataFrame, decoder=None) -> DataFrame:
    """Per-payload audio features via the REAL WAV decode: sample rate,
    channel/sample counts, duration, RMS amplitude, absolute peak.
    Arrow-batched ``mapInPandas`` over (doc_id, payload) — the audio twin
    of :func:`decode_image_batch`. RMS uses an exact integer
    sum-of-squares before the one double division+sqrt, so the value is
    independent of batch boundaries and engine summation order
    (cross-checked by the mm_audio_features DuckDB oracle). Empty payloads
    (0 samples) are dropped — no silent 0/0. ``decoder=`` swaps in a full
    codec (soundfile/pyav) without touching the plan."""
    import numpy as np

    decode = decoder or decode_wav

    def _rhu(x: float, k: int = 6) -> float:
        f = float(10**k)
        import math

        return math.floor(x * f + 0.5) / f

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rate, a = decode(payload)
                n, ch = a.shape
                if n == 0:
                    continue
                ssq = int((a.astype(np.int64) ** 2).sum())
                out.append(
                    (
                        int(doc_id),
                        int(rate),
                        int(ch),
                        int(n),
                        _rhu(n / rate),
                        _rhu((ssq / (n * ch)) ** 0.5),
                        int(np.abs(a).max()),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "sample_rate", "n_channels", "n_samples",
                    "duration_sec", "rms", "peak",
                ],
            )

    return binary_df.select("doc_id", "payload").mapInPandas(compute, _AUDIO_SCHEMA)


def sample_chunks(
    bin_df: DataFrame,
    chunk_size: int = 32,
    stride: int = 4,
) -> DataFrame:
    """(doc_id, chunk_idx, chunk_bytes, chunk_md5) — every ``stride``-th
    ``chunk_size``-byte chunk of each binary payload (the video
    frame-sampling access pattern over opaque bytes: decode-free seeks
    into the payload at fixed offsets, the shape a real codec's
    keyframe sampler uses). Pure Catalyst expressions over the binary
    column — sequence → filter → explode → substring — no Python on
    the data path; the payload column is read once and only the sampled
    slices survive the projection (at 100 TB the bytes moved are
    |chunks|/stride of the corpus)."""
    n = F.length("payload")
    idxs = F.filter(
        F.sequence(
            F.lit(0), F.ceil(n / F.lit(chunk_size)).cast("int") - 1
        ),
        lambda c: c % stride == 0,
    )
    return (
        # Zero-length payloads emit NO chunk rows (ADVICE r4): without
        # the guard, ceil(0/chunk)-1 = -1 and sequence(0, -1) auto-steps
        # DOWN, yielding [0, -1] — one spurious empty chunk per empty
        # document (the oracle's generate_series(0, -1) is empty).
        bin_df.where(n > 0)
        .select("doc_id", "payload", F.explode(idxs).alias("chunk_idx"))
        .select(
            "doc_id",
            "chunk_idx",
            F.expr(
                f"substring(payload, chunk_idx * {chunk_size} + 1,"
                f" {chunk_size})"
            ).alias("chunk"),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
            F.length("chunk").cast("bigint").alias("chunk_bytes"),
            F.md5("chunk").alias("chunk_md5"),
        )
    )


def sniff_format(payload: Column) -> Column:
    """Magic-byte file-type dispatch over an opaque binary column:
    uppercase hex of the first 4 bytes matched against the standard
    signatures (BMP 'BM', PPM 'P6', RIFF, PNG, PDF '%PDF', ZIP 'PK').
    Pure codegen (substring + hex + CASE) — the router a mixed media
    drop-zone applies before handing each format to its decoder."""
    magic8 = F.hex(F.substring(payload, 1, 4))
    return (
        F.when(magic8.startswith("424D"), "bmp")
        .when(magic8.startswith("5036"), "ppm")
        .when(magic8 == "52494646", "riff")
        .when(magic8 == "89504E47", "png")
        .when(magic8.startswith("25504446"), "pdf")
        .when(magic8.startswith("504B"), "zip")
        .otherwise("unknown")
    )


#: Arrow batch schema for spectrogram_features_batch — scalar columns
#: only (band shares serialize as a ppm integer-string signature, the
#: mm_byte_histogram counts contract).
_SPEC_SCHEMA = (
    "doc_id long, n_frames long, band_sig string, spectral_centroid double"
)


def spectrogram_features_batch(
    binary_df: DataFrame,
    n_fft: int = 256,
    hop: int = 128,
    n_bands: int = 8,
    decoder=None,
) -> DataFrame:
    """REAL short-time-Fourier spectral features over WAV payloads: each
    decoded PCM stream is framed (rectangular window — keeps the
    Parseval certification exact-simple), rfft'd per frame, and the
    one-sided power spectrum folds into ``n_bands`` equal frequency
    bands accumulated across frames. Output per doc: frame count, band
    energy SHARES as a ppm integer signature, and the normalized
    spectral centroid — the 'brightness' scalar that separates hiss
    from hum without shipping the whole spectrogram.

    This is the engine's template for DSP-grade featurization the SQL
    surface cannot express: numpy FFT inside Arrow-batched mapInPandas
    (one rfft batch per frame, vectorizable to a strided matmul for
    real workloads), certified not by a SQL oracle but by property
    tests — Parseval's theorem ties total spectral power to the
    time-domain energy the ORACLE-CERTIFIED mm_audio_features RMS
    already pins, and a pure tone must land its energy in the
    containing band (tests/test_multimodal.py). At 100 TB: narrow,
    zero-exchange, payload bytes never shuffle (the
    audio_features_batch posture)."""
    import numpy as np

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                _, data = (decoder or decode_wav)(bytes(payload))
                x = data[:, 0].astype(np.float64)
                n_frames = (
                    1 + (len(x) - n_fft) // hop if len(x) >= n_fft else 0
                )
                bands = np.zeros(n_bands)
                edges = None
                for f in range(n_frames):
                    seg = x[f * hop : f * hop + n_fft]
                    spec = np.abs(np.fft.rfft(seg)) ** 2
                    if edges is None:
                        edges = np.linspace(
                            0, len(spec), n_bands + 1
                        ).astype(int)
                    for b in range(n_bands):
                        bands[b] += spec[edges[b] : edges[b + 1]].sum()
                total = bands.sum()
                shares = bands / total if total > 0 else bands
                centers = (np.arange(n_bands) + 0.5) / n_bands
                centroid = (
                    float((shares * centers).sum()) if total > 0 else 0.0
                )
                sig = ",".join(
                    str(int(np.floor(s * 1e6 + 0.5))) for s in shares
                )
                out.append(
                    (
                        int(doc_id),
                        int(n_frames),
                        sig,
                        round(centroid, 6),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "n_frames", "band_sig", "spectral_centroid",
                ],
            )

    return binary_df.select("doc_id", "payload").mapInPandas(
        compute, _SPEC_SCHEMA
    )


def vad_segments_batch(
    binary_df: DataFrame,
    frame: int = 256,
    hop: int = 128,
    threshold: int = 2000,
    decoder=None,
) -> DataFrame:
    """Energy-based voice-activity detection over WAV payloads — the
    first pass a speech-data pipeline runs to cut silence and bound
    utterances before the expensive ASR/embedding stage (the classic
    frame-energy gate underlying WebRTC VAD's energy tier and every
    kaldi-style segmenter). Each decoded PCM stream is framed
    (``frame`` samples, ``hop`` stride, rectangular — the
    spectrogram_features_batch geometry), a frame is ACTIVE iff its
    energy Σx² exceeds ``frame · threshold`` (mean-square gate), and
    consecutive active frames merge into segments (gaps-and-islands).
    Output per doc: frame count, active-frame count, segment count,
    and the longest segment in frames — the scalars a curation filter
    gates on (min speech fraction, max unbroken utterance).

    Exactness: samples are centered integers, so frame energies are
    EXACT int64 sums — no float anywhere — and the whole operator has
    a pure ANSI-SQL twin (mm_audio_vad), unlike the FFT path. At
    100 TB: narrow Arrow-batched mapInPandas, zero exchanges, payload
    bytes never shuffle; the per-frame energy loop is one strided
    numpy reduction per payload."""
    import numpy as np

    gate = frame * threshold

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                _, data = (decoder or decode_wav)(bytes(payload))
                x = data[:, 0].astype(np.int64)
                nf = 1 + (len(x) - frame) // hop if len(x) >= frame else 0
                if nf > 0:
                    # strided frame matrix (view, no copy) -> one
                    # vectorized energy reduction for all frames
                    fr = np.lib.stride_tricks.as_strided(
                        x,
                        shape=(nf, frame),
                        strides=(x.strides[0] * hop, x.strides[0]),
                    )
                    act = (fr * fr).sum(axis=1) > gate
                    idx = np.flatnonzero(act)
                else:
                    idx = np.empty(0, dtype=np.int64)
                if idx.size:
                    brk = np.flatnonzero(np.diff(idx) > 1)
                    runs = np.diff(
                        np.concatenate(([0], brk + 1, [idx.size]))
                    )
                    n_seg, max_run = int(runs.size), int(runs.max())
                else:
                    n_seg, max_run = 0, 0
                out.append(
                    (int(doc_id), int(nf), int(idx.size), n_seg, max_run)
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "n_frames", "n_active", "n_segments",
                    "max_run",
                ],
            )

    return binary_df.select("doc_id", "payload").mapInPandas(
        compute,
        "doc_id long, n_frames long, n_active long, n_segments long,"
        " max_run long",
    )


#: Arrow batch schema for dhash_batch — one 64-bit perceptual hash per
#: payload, carried as a '0'/'1' bit string (integer-exact end to end;
#: a 64-bit int would overflow signed at bit 63 in SQL twins).
_DHASH_SCHEMA = "doc_id long, dhash_sig string"


def dhash_batch(
    binary_df: DataFrame,
    grid: int = 8,
    patch: int = 4,
    decoder=None,
) -> DataFrame:
    """Perceptual difference-hash (dHash) over decoded images: the
    ``grid`` x ``grid`` array of ``patch`` x ``patch`` tile INTEGER
    intensity sums (the patch_grid_batch reduction, kept as exact sums —
    no float mean, no rounding), hashed to grid² gradient-sign bits:
    bit (r, c) = 1 iff sum(r, c) > sum(r, (c+1) mod grid). The
    wrap-around column comparison yields exactly grid² bits from a
    grid² tile array (classic dHash resizes to (grid+1) x grid; the
    wrap variant keeps the tiling integral so the hash is reproducible
    by pure integer SQL). Near-identical images differ in few bits, so
    Hamming distance over the signature is the near-dup metric —
    robust to brightness-preserving noise that breaks
    patch_grid_batch's exact md5 fingerprints.

    Decode dispatch matches patch_grid_batch (real BMP/PPM decoders,
    deterministic stub otherwise; ``decoder=`` plugs in a codec).
    Output is one 64-char bit string per payload — model-sized, the
    relation downstream banding joins on (queries/multimodal.py
    mm_image_dhash_dedup). Integer-exact throughout: tile sums of
    patch² * 3 uint8 values are exact in int64, so the signature is
    bit-reproducible by any engine."""
    import numpy as np

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                if decoder is not None:
                    img = decoder(raw)
                else:
                    try:
                        img = decode_bmp(raw)
                    except (ValueError, NotImplementedError):
                        try:
                            img = decode_ppm(raw)
                        except (ValueError, NotImplementedError):
                            img = _fake_decode_image(raw)
                img = np.asarray(img, dtype=np.int64)
                h, w = img.shape[0], img.shape[1]
                # Real images SMALLER than the grid (e.g. a 4x4 BMP at
                # grid=8) would make ph or pw zero and crash the
                # zero-size reshape below, failing the whole task.
                # Upscale by mod-indexing — the stub decoder's tiling
                # semantics — so tiny payloads hash deterministically;
                # images >= grid pixels are untouched (ADVICE r7).
                if h < grid:
                    img = img[np.arange(grid) % h]
                    h = grid
                if w < grid:
                    img = img[:, np.arange(grid) % w]
                    w = grid
                ph, pw = h // grid, w // grid
                sums = (
                    img[: ph * grid, : pw * grid]
                    .reshape(grid, ph, grid, pw, -1)
                    .sum(axis=(1, 3, 4))
                )
                rolled = np.roll(sums, -1, axis=1)
                bits = (sums > rolled).astype(np.uint8).ravel()
                out.append((int(doc_id), "".join("1" if b else "0" for b in bits)))
            yield pd.DataFrame(out, columns=["doc_id", "dhash_sig"])

    return binary_df.select("doc_id", "payload").mapInPandas(
        compute, _DHASH_SCHEMA
    )


#: Arrow batch schema for patch_grid_batch — one row PER PATCH
#: (mapInPandas fan-out like sample_video_frames).
_PATCH_SCHEMA = (
    "doc_id long, py int, px int, patch_h int, patch_w int, "
    "mean_intensity double, patch_md5 string"
)


def patch_grid_batch(
    binary_df: DataFrame,
    patch: int = 8,
    decoder=None,
) -> DataFrame:
    """ViT-style non-overlapping patch grid over decoded images: each
    payload decodes (real BMP/PPM decoders by default, any codec via
    ``decoder=``), the H x W x 3 tensor splits into ``patch`` x
    ``patch`` tiles (edge remainders dropped, the ViT convention), and
    each tile emits one row with its grid coordinates, mean intensity,
    and an md5 content fingerprint — the tokenization step a
    vision-language pipeline runs before patch embeddings, and the
    fingerprint is what patch-level dedup joins on. mapInPandas
    FAN-OUT (rows out >> rows in — the sample_video_frames contract);
    at 100 TB the grid is narrow and zero-exchange, and downstream
    patch dedup is a hash join on patch_md5, never pixel comparison."""
    import hashlib

    import numpy as np

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                if decoder is not None:
                    img = decoder(raw)
                else:
                    try:
                        img = decode_bmp(raw)
                    except (ValueError, NotImplementedError):
                        try:
                            img = decode_ppm(raw)
                        except (ValueError, NotImplementedError):
                            img = _fake_decode_image(raw)
                img = np.asarray(img)
                h, w = img.shape[0], img.shape[1]
                for py in range(h // patch):
                    for px in range(w // patch):
                        tile = img[
                            py * patch : (py + 1) * patch,
                            px * patch : (px + 1) * patch,
                        ]
                        out.append(
                            (
                                int(doc_id),
                                py,
                                px,
                                patch,
                                patch,
                                # floor-half-up, not python round():
                                # the tile sum is <= 192*255 (exact in
                                # float64 at ANY summation order), so
                                # this matches the SQL oracle's
                                # floor(sum/192*1e6+0.5) bit for bit;
                                # round() would tie-break half-even.
                                float(
                                    np.floor(
                                        float(tile.mean()) * 1e6 + 0.5
                                    )
                                    / 1e6
                                ),
                                hashlib.md5(
                                    np.ascontiguousarray(tile).tobytes()
                                ).hexdigest(),
                            )
                        )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "py", "px", "patch_h", "patch_w",
                    "mean_intensity", "patch_md5",
                ],
            )

    return binary_df.select("doc_id", "payload").mapInPandas(
        compute, _PATCH_SCHEMA
    )
