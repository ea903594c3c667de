"""Multimodal (binary-payload) columns: schema, framing, features, decode.

A media column is an opaque ``binary`` payload plus a typed metadata struct
(`META_TYPE`) — the layout a 100 TB training-data lake actually uses
(parquet keeps the blobs out of dictionary/stats paths; metadata stays
columnar and prunable). Everything *around* the codec is real, distributed
Spark:

- **attach_payload / payload_meta** — pure JVM column expressions
  (encode/md5/octet slicing); no Python in the hot path.
- **frame_sample** — every-k-th fixed-size frame via `sequence` + `explode`
  + binary `substring`: frame extraction without ever shipping payloads
  through Python, and without a shuffle (map-side explode).
- **byte_histogram_features** — the feature-extraction shape: `mapInPandas`
  over Arrow record batches, NumPy-vectorized per batch. This is the
  template for real decode→featurize kernels; batches arrive
  partition-local, so the op scales linearly with executors.
- **decode_frames / resize_frames** — the real-media kernels.
  ``codec="real"`` IMPORT-PROBES ``PIL`` at call time: where Pillow is
  installed (a real cluster image) the frames are decoded/resized through
  it; where it isn't (this environment), the call fails fast with an
  actionable NotImplementedError instead of dying inside an executor.
  ``codec="ppm"`` drives the SAME real kernels through the vendored
  pure-stdlib codec (:mod:`.imagecodec` — PPM/PGM/PNG decode, PNG
  encode), so a genuine decode→resize→re-encode path runs end to end
  with no media libraries at all. ``codec="fake"`` runs the same
  mapInPandas plumbing with a deterministic byte-level kernel so
  schema, batch shape, and partitioning are testable for arbitrary
  (non-image) payload bytes.

Reference parity: the reference has no binary columns (geometry aside,
SURVEY §2.7 C11); this module is a north-star extension (BASELINE.json
"multimodal columns"), designed per the 100 TB goal.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "META_TYPE",
    "attach_payload",
    "payload_meta",
    "frame_sample",
    "byte_histogram_features",
    "decode_frames",
    "resize_frames",
    "AUDIO_FP_VERSION",
    "PHASH_VERSION",
    "phash64_frames",
    "AUDIO_META_TYPE",
    "attach_audio_payload",
    "decode_audio_stats",
    "audio_frame_energy",
    "audio_fingerprint_frames",
    "VIDEO_META_TYPE",
    "attach_video_payload",
    "video_frame_stats",
]

META_TYPE = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("frame_bytes", T.IntegerType()),
        T.StructField("n_frames", T.LongType()),
    ]
)


def attach_payload(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    frame_bytes: int = 64,
) -> DataFrame:
    """(id, payload: binary, meta: struct) from a text column.

    Deterministic stand-in for reading real media blobs from parquet: the
    UTF-8 bytes of the text ARE the payload. Metadata is computed, typed,
    and carried as a struct so downstream ops never re-touch the blob for
    bookkeeping."""
    payload = F.encode(F.col(text), "UTF-8")
    n_bytes = F.octet_length(payload).cast("long")
    n_frames = F.ceil(n_bytes / F.lit(float(frame_bytes))).cast("long")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit("fake/raw").alias("format"),
            n_bytes.alias("n_bytes"),
            F.lit(frame_bytes).alias("frame_bytes"),
            n_frames.alias("n_frames"),
        ).alias("meta"),
    )


def payload_meta(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Typed metadata projection: byte length, content digest, frame count.
    Pure column expressions — the blob never leaves the JVM."""
    return df.select(
        F.col(id_col),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.md5(F.col("payload")).alias("payload_md5"),
        F.col("meta.n_frames").alias("n_frames"),
    )


def frame_sample(
    df: DataFrame, every: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    """Every ``every``-th fixed-size frame of each payload, with a digest.

    sequence(0, n_frames-1, every) → explode → binary substring: map-side
    only (no shuffle), JVM-side slicing. The last frame may be short
    (substring clamps) — same semantics as a tail video frame."""
    fb = F.col("meta.frame_bytes")
    # zero-length payload -> n_frames=0 -> sequence(0,-1,+step) would throw;
    # emit an empty array instead (explode then yields no rows)
    seq = F.when(
        F.col("meta.n_frames") > 0,
        F.sequence(
            F.lit(0).cast("long"), F.col("meta.n_frames") - 1, F.lit(every).cast("long")
        ),
    ).otherwise(F.array().cast("array<long>"))
    idx = F.explode(seq).alias("frame_idx")
    return df.select(F.col(id_col), F.col("payload"), fb.alias("fb"), idx).select(
        F.col(id_col),
        F.col("frame_idx"),
        F.md5(
            F.substring(F.col("payload"), F.col("frame_idx") * F.col("fb") + 1, F.col("fb"))
        ).alias("frame_md5"),
    )


def byte_histogram_features(
    df: DataFrame, n_buckets: int = 16, id_col: str = "doc_id"
) -> DataFrame:
    """Byte-value histogram per payload — the feature-extraction template.

    mapInPandas over Arrow batches; NumPy does the counting per batch
    (vectorized, no per-row Python). Output is long-form
    (id, bucket, n_bytes) so exact integer counts are oracle-comparable.
    Scales map-side: each task featurizes only its partition's blobs.
    """
    import numpy as np

    width = 256 // n_buckets
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("bucket", T.IntegerType()),
            T.StructField("n_bytes", T.LongType()),
        ]
    )

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, buckets, counts = [], [], []
            for i, blob in zip(pdf[id_col], pdf["payload"]):
                arr = np.frombuffer(bytes(blob), dtype=np.uint8) // width
                hist = np.bincount(arr, minlength=n_buckets)
                nz = np.nonzero(hist)[0]
                ids.extend([i] * len(nz))
                buckets.extend(nz.tolist())
                counts.extend(hist[nz].tolist())
            yield pd.DataFrame(
                {"doc_id": ids, "bucket": buckets, "n_bytes": counts}
            )

    return df.select(F.col(id_col), F.col("payload")).mapInPandas(
        featurize, schema=out_schema
    )


# ---------------------------------------------------------------------------
# audio arm: WAV/PCM binary columns through the vendored pure-stdlib codec
# (operators/audiocodec.py), closing the audio half of the multimodal story
# the way imagecodec.py closed the image half (r9 verdict order #4)
# ---------------------------------------------------------------------------

AUDIO_META_TYPE = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("bits", T.IntegerType()),
        T.StructField("n_frames", T.LongType()),
    ]
)


def _synth_samples(doc_id: int):
    """Deterministic PCM recipe per document — the audio analog of
    attach_payload's text-bytes stand-in, chosen so a SQL oracle can
    re-derive every sample with integer arithmetic: channels, rate,
    frame count and bit depth are doc_id residues; flat interleaved
    sample i is ((doc_id*7919 + i*104729) % 65536) - 32768."""
    import numpy as np

    d = int(doc_id)
    channels = 1 + d % 2
    rate = 8000 + 1000 * (d % 4)
    n_frames = 64 + d % 64
    bits = (16, 24, 32)[d % 3]
    i = np.arange(n_frames * channels, dtype=np.int64)
    flat = (d * 7919 + i * 104729) % 65536 - 32768
    return flat.reshape(n_frames, channels), rate, bits


def attach_audio_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, payload: binary, meta: AUDIO_META_TYPE) with a REAL encoded
    WAV per row: deterministic PCM samples (see :func:`_synth_samples`)
    run through ``audiocodec.encode_wav`` inside an Arrow-batched
    kernel — varying channel count, sample rate, frame count AND bit
    depth (16/24/32) across rows, so every encoder width is exercised
    by one pass. The blob is opaque binary downstream, exactly like a
    media lake's payload column; metadata is typed and prunable."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("meta", AUDIO_META_TYPE),
        ]
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import audiocodec  # resolved on the executor

        for pdf in batches:
            rows = []
            for d in pdf[id_col]:
                arr, rate, bits = _synth_samples(d)
                blob = audiocodec.encode_wav(arr, rate, bits=bits)
                rows.append(
                    (
                        int(d),
                        blob,
                        {
                            "format": "audio/wav",
                            "n_bytes": len(blob),
                            "sample_rate": rate,
                            "n_channels": arr.shape[1],
                            "bits": bits,
                            "n_frames": arr.shape[0],
                        },
                    )
                )
            yield pd.DataFrame(rows, columns=[id_col, "payload", "meta"])

    return df.select(F.col(id_col)).mapInPandas(synth, schema=out_schema)


_I64_MAX = (1 << 63) - 1


def _exact_sum_sq(col, peak: int) -> int:
    """Exact Σs² of an int64 sample vector: vectorized int64 when the
    worst case ``n·peak²`` provably fits (the 8/16-bit hot path —
    n·2³⁰ wraps only past ~2³³ samples), unbounded Python-int
    (object-dtype) accumulation otherwise (full-scale 32-bit samples
    square to ~2⁶², wrapping an int64 sum after two samples; full-scale
    24-bit after ~131k, seconds of audio)."""
    n = len(col)
    if n == 0:
        return 0
    if n * peak * peak <= _I64_MAX:  # Python-int guard: never wraps
        return int((col * col).sum())
    obj = col.astype(object)
    return int((obj * obj).sum())


def _exact_sum_abs(col, peak: int) -> int:
    """Exact Σ|s|: int64 is safe up to n·peak ≤ 2⁶³−1 (days of 32-bit
    audio); beyond that, Python-int accumulation."""
    import numpy as np

    n = len(col)
    if n == 0:
        return 0
    if n * peak <= _I64_MAX:
        return int(np.abs(col).sum())
    return int(np.abs(col.astype(object)).sum())


def decode_audio_stats(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Decode each WAV payload (``audiocodec.decode_wav`` — real RIFF
    parsing, all PCM widths) and emit exact per-channel integer
    statistics: sample count, peak magnitude, Σ|s|, Σs², first and last
    sample. Integer-exact for EVERY width the codec supports: Σs² uses
    int64 only when ``n·peak²`` provably fits (the 8/16-bit hot path)
    and falls back to unbounded Python-int accumulation otherwise
    (full-scale 24/32-bit PCM, where naive int64 products wrap after a
    handful of samples); a true Σs² past int64 raises with the doc id
    rather than emitting a wrapped value the LongType column can't
    represent. Map-side only (mapInPandas; blobs never shuffle)."""
    import numpy as np

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("channel", T.IntegerType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("peak", T.LongType()),
            T.StructField("sum_abs", T.LongType()),
            T.StructField("sum_sq", T.LongType()),
            T.StructField("first_s", T.LongType()),
            T.StructField("last_s", T.LongType()),
        ]
    )

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import audiocodec

        for pdf in batches:
            rows = []
            for d, blob in zip(pdf[id_col], pdf["payload"]):
                arr, rate = audiocodec.decode_wav(bytes(blob))
                a64 = arr.astype(np.int64)
                for c in range(arr.shape[1]):
                    col = a64[:, c]
                    peak = int(np.abs(col).max()) if len(col) else 0
                    ssq = _exact_sum_sq(col, peak)
                    sabs = _exact_sum_abs(col, peak)
                    if ssq > _I64_MAX or sabs > _I64_MAX:
                        raise OverflowError(
                            f"doc_id={int(d)} channel {c}: Σs²={ssq} or "
                            f"Σ|s|={sabs} exceeds int64 — the LongType "
                            "output column cannot represent it; shorten "
                            "the clip or aggregate per-window instead"
                        )
                    rows.append(
                        (
                            int(d),
                            c,
                            rate,
                            len(col),
                            peak,
                            sabs,
                            ssq,
                            int(col[0]) if len(col) else 0,
                            int(col[-1]) if len(col) else 0,
                        )
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.select(F.col(id_col), F.col("payload")).mapInPandas(
        stats, schema=out_schema
    )


def audio_frame_energy(
    df: DataFrame, window_frames: int = 16, id_col: str = "doc_id"
) -> DataFrame:
    """Windowed energy over decoded frames: Σs² (all channels) per
    ``window_frames``-frame window — the feature a VAD / silence-trim /
    loudness-bucketing pipeline computes. Exact for every PCM width:
    int64 vectorized when ``window_frames·channels·peak²`` provably
    fits, Python-int accumulation otherwise (full-scale 24/32-bit
    payloads, where naive int64 squares wrap); a window whose true
    energy exceeds int64 raises rather than wrapping. The tail window
    may be short (its true frame count is emitted). Map-side only."""
    import numpy as np

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("window_idx", T.LongType()),
            T.StructField("n_frames", T.LongType()),
            T.StructField("energy", T.LongType()),
        ]
    )

    def energy(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import audiocodec

        for pdf in batches:
            rows = []
            for d, blob in zip(pdf[id_col], pdf["payload"]):
                arr, _rate = audiocodec.decode_wav(bytes(blob))
                a64 = arr.astype(np.int64)
                peak = int(np.abs(a64).max()) if a64.size else 0
                nch = arr.shape[1]
                # worst-case window energy; Python ints, never wraps
                if window_frames * nch * peak * peak <= _I64_MAX:
                    sq = (a64**2).sum(axis=1)
                else:
                    sq = (a64.astype(object) ** 2).sum(axis=1)
                for w in range(0, len(sq), window_frames):
                    chunk = sq[w : w + window_frames]
                    e = int(chunk.sum())
                    if e > _I64_MAX:
                        raise OverflowError(
                            f"doc_id={int(d)} window {w // window_frames}: "
                            f"energy {e} exceeds int64 — use a smaller "
                            "window_frames for this bit depth"
                        )
                    rows.append((int(d), w // window_frames, len(chunk), e))
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.select(F.col(id_col), F.col("payload")).mapInPandas(
        energy, schema=out_schema
    )


def audio_fingerprint_frames(
    df: DataFrame,
    frame_samples: int = 2048,
    hop: int = 1024,
    n_bands: int = 33,
    chunk_frames: int = 256,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-frame 32-bit audio fingerprints — the published
    Haitsma–Kalker robust hash (Haitsma & Kalker 2002, the Philips
    audio fingerprint): mono-mix → overlapping ``frame_samples``-sample
    frames every ``hop`` samples → |FFT|² → ``n_bands`` log-spaced band
    energies E(t, b) → bit(t, b) = 1 iff
    (E(t,b) − E(t,b+1)) − (E(t−1,b) − E(t−1,b+1)) > 0 — the
    time-frequency energy-difference sign, ``n_bands − 1 = 32`` bits
    per frame. The audio arm of the near-dup family: re-encoded,
    re-sampled-to-the-same-rate, or GAIN-CHANGED copies byte-level
    dedup can never see pair at small Hamming distance —
    amplitude scaling is EXACTLY invariant by construction (a positive
    gain multiplies every band energy, cancelling in both sign
    comparisons; test-pinned).

    Emits (id, frame_idx, fp long in [0, 2³²)) — one row per frame
    starting at frame_idx 1 (the first frame has no predecessor).
    Compose with
    :func:`~..operators.dedup.hamming_neardup_pairs(hash_bits=32)`:
    duplicate ids per doc are the supported multi-hash shape (any-frame
    MIN-distance pair semantics). Audio shorter than
    ``frame_samples + hop`` yields no row.

    Determinism: decode and mono-mix are integer math; the FFT runs in
    float64, so fingerprints are deterministic per platform (the pHash
    discipline — pin with the vendored codec, oracle via fixed
    vectors). The emitted bit format is versioned as
    :data:`AUDIO_FP_VERSION` — stamp it next to any PERSISTED
    fingerprint table and validate at load; a band/FFT change without a
    bump silently breaks stored-hash joins at small Hamming distances.

    Plan shape: one map-side Arrow kernel (``mapInPandas``) —
    partitioning follows the input, payload blobs never shuffle; the
    downstream pairing moves only (id, 8-byte hash) rows.
    """
    import numpy as np

    if n_bands < 2:
        raise ValueError(f"n_bands must be >= 2, got {n_bands}")
    if n_bands - 1 > 32:
        raise ValueError(
            f"n_bands - 1 = {n_bands - 1} bits will not fit the 32-bit "
            "fingerprint"
        )
    # frame_samples/2 - 1 must exceed the low-cutoff bin 4 or the
    # logspace below runs DECREASING and np.unique silently re-sorts it
    # into edges that pass the distinct-count guard yet crash reduceat
    # inside the executor (r14 review) — 12 is the smallest safe width
    if hop < 1 or frame_samples < max(2 * n_bands, 12):
        raise ValueError(
            f"need hop >= 1 and frame_samples >= {max(2 * n_bands, 12)} "
            f"(got hop={hop}, frame_samples={frame_samples})"
        )
    # name the id field by id_col and carry the INPUT's id dtype through
    # (string/long ids both round-trip) — the sibling-operator schema
    # discipline phash64_frames follows; this operator's output is a
    # join key for hamming_neardup_pairs, so a string/composite id must
    # round-trip instead of crashing in the kernel (ADVICE r15 #1)
    out_schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("frame_idx", T.LongType()),
            T.StructField("fp", T.LongType()),
        ]
    )
    # log-spaced band edges over FFT bins [4, frame_samples/2): skip DC
    # and the lowest bins (the published layout also cuts low frequency;
    # starting at bin 1 would round the first few log steps onto the
    # same integer bin and collapse bands)
    n_bins = frame_samples // 2
    edges = np.unique(
        np.round(
            np.logspace(np.log10(4.0), np.log10(n_bins - 1), n_bands + 1)
        ).astype(np.int64)
    )
    if len(edges) < n_bands + 1:
        raise ValueError(
            f"frame_samples={frame_samples} gives only {len(edges) - 1} "
            f"distinct log-spaced bands; raise frame_samples or lower "
            f"n_bands={n_bands}"
        )
    edges = edges[: n_bands + 1]

    # chunk_frames bounds the kernel's peak memory at
    # ~chunk x frame_samples x 32 B regardless of track length (a
    # 1-hour track would otherwise materialize a multi-GB frame
    # matrix in one task — r14 review); the previous chunk's last d1
    # row carries across the boundary so the bits are IDENTICAL to
    # the one-shot computation (equality test-pinned)
    if chunk_frames < 1:
        raise ValueError(f"chunk_frames must be >= 1, got {chunk_frames}")
    weights = 1 << np.arange(n_bands - 2, -1, -1, dtype=np.int64)

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import audiocodec

        for pdf in batches:
            rows = {"id": [], "frame_idx": [], "fp": []}
            for d, blob in zip(pdf[id_col], pdf["payload"]):
                arr, _rate = audiocodec.decode_wav(bytes(blob))
                mono = arr.astype(np.float64).mean(axis=1)
                n_frames = (len(mono) - frame_samples) // hop + 1
                if n_frames < 2:
                    continue
                prev_d1 = None
                for c0 in range(0, n_frames, chunk_frames):
                    nc = min(chunk_frames, n_frames - c0)
                    idx = (
                        np.arange(frame_samples)[None, :]
                        + hop * (c0 + np.arange(nc))[:, None]
                    )
                    spec = np.abs(np.fft.rfft(mono[idx], axis=1)) ** 2
                    # band energies: (nc, n_bands)
                    E = np.add.reduceat(spec[:, :n_bins], edges[:-1], axis=1)
                    d1 = E[:, :-1] - E[:, 1:]      # freq difference
                    full = (
                        d1 if prev_d1 is None
                        else np.vstack([prev_d1, d1])
                    )
                    d2 = full[1:, :] - full[:-1, :]  # time difference
                    bits = d2 > 0
                    fps = (bits.astype(np.int64) * weights[None, :]).sum(
                        axis=1
                    )
                    # first chunk: d2 rows are frames 1..nc-1; later
                    # chunks prepend the carried row, so rows are c0..
                    start = 1 if prev_d1 is None else c0
                    for t, fp in enumerate(fps, start=start):
                        # d passes through uncoerced: the schema carries
                        # the input id dtype (string ids must not int())
                        rows["id"].append(d)
                        rows["frame_idx"].append(t)
                        rows["fp"].append(int(fp))
                    prev_d1 = d1[-1:, :]
            yield pd.DataFrame(
                {
                    id_col: rows["id"],
                    "frame_idx": rows["frame_idx"],
                    "fp": rows["fp"],
                }
            )

    return df.select(F.col(id_col), F.col("payload")).mapInPandas(
        kern, schema=out_schema
    )


def _probe_pil():
    """Call-time import probe for the real image codec. Returns
    ``PIL.Image`` or None. Probing on the driver turns a would-be
    executor-side ImportError (a late, opaque task failure) into an
    immediate, actionable error at plan time; on a cluster image with
    Pillow installed the real arm lights up with no code change."""
    try:
        from PIL import Image

        return Image
    except ImportError:
        return None


def _pil_missing(op: str) -> NotImplementedError:
    return NotImplementedError(
        f"{op}(codec='real') needs Pillow (PIL) and it is not importable "
        "in this environment; install pillow on the cluster image, use "
        "codec='ppm' for the dependency-free real decoder (PPM/PGM/PNG "
        "payloads), or codec='fake' for the deterministic byte-level kernel"
    )


def _real_resize_rows(
    pdf: pd.DataFrame, factor: int, id_col: str, image_mod
) -> pd.DataFrame:
    """codec='real' resize kernel: each frame is an ENCODED image — decode
    with PIL, scale to 1/factor, re-encode PNG. The image module is
    injected so the kernel is unit-testable where Pillow isn't installed
    (tests pass a stub; executors pass the probed ``PIL.Image``)."""
    import io

    rows = {"doc_id": [], "frame_idx": [], "frame": [], "n_bytes": []}
    for i, blob, fb, nf in zip(
        pdf[id_col], pdf["payload"], pdf["frame_bytes"], pdf["n_frames"]
    ):
        data = bytes(blob)
        for k in range(int(nf)):
            img = image_mod.open(io.BytesIO(data[k * fb : (k + 1) * fb]))
            w, h = img.size
            small = img.resize((max(w // factor, 1), max(h // factor, 1)))
            buf = io.BytesIO()
            small.save(buf, format="PNG")
            out = buf.getvalue()
            rows["doc_id"].append(i)
            rows["frame_idx"].append(k)
            rows["frame"].append(out)
            rows["n_bytes"].append(len(out))
    return pd.DataFrame(rows)


def resize_frames(
    df: DataFrame, factor: int = 4, codec: str = "real", id_col: str = "doc_id"
) -> DataFrame:
    """Resize (downsample) each frame, emitting new binary frames with
    updated size metadata — the transform shape of a real image/video
    resize stage (decode → scale → re-encode) in a training-data pipeline.

    ``codec="real"`` import-probes Pillow at call time: where it is
    installed, frames are decoded/resized/re-encoded through PIL
    (:func:`_real_resize_rows`); where it isn't, the call raises an
    actionable NotImplementedError immediately. ``codec="fake"`` keeps
    every Spark-side property real (schema, mapInPandas Arrow batching,
    per-frame explosion, binary output column) with a deterministic
    stand-in kernel: every ``factor``-th byte of the frame. Output:
    (id, frame_idx, frame binary, n_bytes), one row per frame —
    partitioning follows the input; no shuffle is introduced.
    """
    import numpy as np

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("frame_idx", T.LongType()),
            T.StructField("frame", T.BinaryType()),
            T.StructField("n_bytes", T.LongType()),
        ]
    )

    if codec == "real":
        if _probe_pil() is None:
            raise _pil_missing("resize_frames")

        def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from PIL import Image  # resolved on the executor

            for pdf in batches:
                yield _real_resize_rows(pdf, factor, id_col, Image)

    elif codec == "ppm":
        # dependency-free REAL-decode arm: the same kernel as
        # codec='real', driven by the vendored pure-stdlib codec
        # (PPM/PGM/PNG in, PNG out) — always available, so the real
        # kernel path executes end to end even without Pillow
        def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from . import imagecodec  # resolved on the executor

            for pdf in batches:
                yield _real_resize_rows(pdf, factor, id_col, imagecodec)

    elif codec == "fake":

        def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = {"doc_id": [], "frame_idx": [], "frame": [], "n_bytes": []}
                for i, blob, fb, nf in zip(
                    pdf[id_col], pdf["payload"], pdf["frame_bytes"], pdf["n_frames"]
                ):
                    data = np.frombuffer(bytes(blob), dtype=np.uint8)
                    for k in range(int(nf)):
                        small = data[k * fb : (k + 1) * fb : factor]
                        rows["doc_id"].append(i)
                        rows["frame_idx"].append(k)
                        rows["frame"].append(small.tobytes())
                        rows["n_bytes"].append(len(small))
                yield pd.DataFrame(rows)

    else:
        raise ValueError(f"unknown codec {codec!r}; use 'real', 'ppm', or 'fake'")

    flat = df.select(
        F.col(id_col),
        F.col("payload"),
        F.col("meta.frame_bytes").alias("frame_bytes"),
        F.col("meta.n_frames").alias("n_frames"),
    )
    return flat.mapInPandas(resize, schema=out_schema)


def _real_decode_rows(
    pdf: pd.DataFrame, id_col: str, image_mod
) -> pd.DataFrame:
    """codec='real' decode kernel: PIL-decode each encoded frame, convert
    to grayscale, emit the mean pixel value. Image module injected for
    testability without Pillow (see :func:`_real_resize_rows`)."""
    import io

    import numpy as np

    rows = {"doc_id": [], "frame_idx": [], "mean_byte": []}
    for i, blob, fb, nf in zip(
        pdf[id_col], pdf["payload"], pdf["frame_bytes"], pdf["n_frames"]
    ):
        data = bytes(blob)
        for k in range(int(nf)):
            img = image_mod.open(io.BytesIO(data[k * fb : (k + 1) * fb]))
            arr = np.asarray(img.convert("L"), dtype=np.float64)
            rows["doc_id"].append(i)
            rows["frame_idx"].append(k)
            rows["mean_byte"].append(float(arr.mean()))
    return pd.DataFrame(rows)


def decode_frames(
    df: DataFrame, codec: str = "real", id_col: str = "doc_id"
) -> DataFrame:
    """Decode each sampled frame to a scalar feature (mean pixel/byte value).

    ``codec="real"`` import-probes Pillow at call time (see module
    docstring): present → PIL decode + grayscale mean per frame; absent →
    immediate actionable NotImplementedError. ``codec="fake"`` exercises
    identical plumbing with a deterministic byte-mean decoder.
    """
    import numpy as np

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("frame_idx", T.LongType()),
            T.StructField("mean_byte", T.DoubleType()),
        ]
    )

    if codec == "real":
        if _probe_pil() is None:
            raise _pil_missing("decode_frames")

        def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from PIL import Image  # resolved on the executor

            for pdf in batches:
                yield _real_decode_rows(pdf, id_col, Image)

    elif codec == "ppm":
        # same real kernel, vendored pure-stdlib codec (see resize_frames)
        def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from . import imagecodec  # resolved on the executor

            for pdf in batches:
                yield _real_decode_rows(pdf, id_col, imagecodec)

    elif codec == "fake":

        def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = {"doc_id": [], "frame_idx": [], "mean_byte": []}
                for i, blob, fb, nf in zip(
                    pdf[id_col], pdf["payload"], pdf["frame_bytes"], pdf["n_frames"]
                ):
                    data = np.frombuffer(bytes(blob), dtype=np.uint8)
                    for k in range(int(nf)):
                        frame = data[k * fb : (k + 1) * fb]
                        rows["doc_id"].append(i)
                        rows["frame_idx"].append(k)
                        rows["mean_byte"].append(float(frame.mean()))
                yield pd.DataFrame(rows)

    else:
        raise ValueError(f"unknown codec {codec!r}; use 'real', 'ppm', or 'fake'")

    flat = df.select(
        F.col(id_col),
        F.col("payload"),
        F.col("meta.frame_bytes").alias("frame_bytes"),
        F.col("meta.n_frames").alias("n_frames"),
    )
    return flat.mapInPandas(decode, schema=out_schema)


# --------------------------------------------------------------------------
# Video arm: Y4M payloads through the vendored pure-stdlib codec
# (operators/videocodec.py), closing the image/audio/VIDEO triple the
# same way attach_audio_payload/decode_audio_stats closed audio.
# --------------------------------------------------------------------------

VIDEO_META_TYPE = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("colorspace", T.StringType()),
        T.StructField("fps_num", T.IntegerType()),
        T.StructField("fps_den", T.IntegerType()),
    ]
)


def _synth_frames(doc_id: int):
    """Deterministic planar video per document — the video analog of
    :func:`_synth_samples`, chosen so a SQL oracle can re-derive every
    pixel with integer arithmetic: dimensions, frame count, and
    colorspace are doc_id residues (even docs are Cmono, odd C420jpeg,
    so both layouts are exercised); luma pixel (f, r, c) is
    (d*31 + f*7919 + r*13 + c*3) % 256 and the C420 chroma planes use
    the same shape with different multipliers."""
    import numpy as np

    d = int(doc_id)
    w = 16 + 4 * (d % 3)  # 16/20/24 — even, so C420 is legal
    h = 12 + 2 * (d % 5)  # 12..20 — even
    n = 3 + d % 5  # 3..7 frames
    f, r, c = np.ogrid[0:n, 0:h, 0:w]
    y = ((d * 31 + f * 7919 + r * 13 + c * 3) % 256).astype(np.uint8)
    if d % 2 == 0:
        return y, None, None
    f, r, c = np.ogrid[0 : n, 0 : h // 2, 0 : w // 2]
    cb = ((d * 17 + f * 104729 + r * 11 + c * 5) % 256).astype(np.uint8)
    cr = ((d * 23 + f * 7 + r * 19 + c * 29) % 256).astype(np.uint8)
    return y, cb, cr


def attach_video_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, payload: binary, meta: VIDEO_META_TYPE) with a REAL encoded
    Y4M stream per row: deterministic planes (see :func:`_synth_frames`)
    run through ``videocodec.encode_y4m`` inside an Arrow-batched
    kernel — varying dimensions, frame count AND colorspace (Cmono /
    C420jpeg) across rows. The blob is opaque binary downstream,
    exactly like a media lake's payload column; metadata is typed and
    prunable. Map-side only."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("meta", VIDEO_META_TYPE),
        ]
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import videocodec  # resolved on the executor

        for pdf in batches:
            rows = []
            for d in pdf[id_col]:
                y, cb, cr = _synth_frames(d)
                fps = (24 + int(d) % 2, 1)
                blob = videocodec.encode_y4m(y, cb, cr, fps=fps)
                rows.append(
                    (
                        int(d),
                        blob,
                        {
                            "format": "video/x-y4m",
                            "n_bytes": len(blob),
                            "width": y.shape[2],
                            "height": y.shape[1],
                            "n_frames": y.shape[0],
                            "colorspace": "mono" if cb is None else "420jpeg",
                            "fps_num": fps[0],
                            "fps_den": fps[1],
                        },
                    )
                )
            yield pd.DataFrame(rows, columns=[id_col, "payload", "meta"])

    return df.select(F.col(id_col)).mapInPandas(synth, schema=out_schema)


def video_frame_stats(
    df: DataFrame, stride: int = 1, id_col: str = "doc_id"
) -> DataFrame:
    """Decode each Y4M payload (``videocodec.decode_y4m`` — real header
    parsing, planar walking, both colorspaces) and emit exact per-frame
    integer statistics for every ``stride``-th frame: luma sum / sum of
    squares / min / max plus chroma plane sums (0 for mono) — the
    shot-detection / brightness-bucketing / quality-filter feature pass
    over a video column. Integer-exact by construction, so the
    encode→decode round-trip is externally oracle-checkable
    value-for-value. Map-side only (mapInPandas; blobs never
    shuffle)."""
    import numpy as np

    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("y_sum", T.LongType()),
            T.StructField("y_sq", T.LongType()),
            T.StructField("y_min", T.IntegerType()),
            T.StructField("y_max", T.IntegerType()),
            T.StructField("cb_sum", T.LongType()),
            T.StructField("cr_sum", T.LongType()),
        ]
    )

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import videocodec

        for pdf in batches:
            rows = []
            for d, blob in zip(pdf[id_col], pdf["payload"]):
                y, cb, cr, info = videocodec.decode_y4m(bytes(blob))
                for f in range(0, info["n_frames"], stride):
                    yf = y[f].astype(np.int64)
                    rows.append(
                        (
                            int(d),
                            f,
                            info["width"],
                            info["height"],
                            int(yf.sum()),
                            int((yf * yf).sum()),
                            int(yf.min()),
                            int(yf.max()),
                            int(cb[f].astype(np.int64).sum()) if cb is not None else 0,
                            int(cr[f].astype(np.int64).sum()) if cr is not None else 0,
                        )
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.select(F.col(id_col), F.col("payload")).mapInPandas(
        stats, schema=out_schema
    )


# Version of the hash FORMAT :func:`phash64_frames` emits. Perceptual
# hashes are long-lived state — image dedup tables, stored frontier
# fingerprints, cross-run join keys — so any change to the emitted bits
# is a KEY-FORMAT BREAK exactly like the canonical-URL one
# (``web.CANONICALIZER_VERSION``): hashes persisted under an older
# version silently stop matching newly computed ones AT SMALL HAMMING
# DISTANCES (a few flipped bits push true duplicates past max_distance
# — worse than an exact-key break because nothing errors). Persist this
# number alongside stored hashes and REBUILD from the source images on
# mismatch; unlike URL keys there is no in-place rekey (the old bits do
# not determine the new ones). History:
#   1 — orthonormal 2-D DCT-II (row/col 0 scaled by an extra 1/sqrt(2));
#       self-consistent but ~0.3 bits/image off the published transform.
#   2 — unnormalized DCT-II (scipy.fftpack.dct's default, the transform
#       the ImageHash library applies), so bits match the published
#       pHash given the same grayscale-resized pixels.
PHASH_VERSION = 2

# Version of the fingerprint FORMAT :func:`audio_fingerprint_frames`
# emits (same discipline as :data:`PHASH_VERSION`): the 32 bits/frame
# are a persistable join key — stored audio-dedup pair tables and
# fingerprint indexes silently stop matching newly computed frames at
# small Hamming distances if the band layout, FFT framing, or sign rule
# ever changes, so any such change MUST bump this number. Persist it
# alongside stored fingerprints (e.g. ``sources.models.save_model(...,
# params={"audio_fp_version": AUDIO_FP_VERSION, ...})``) and validate
# at load with ``expect_params`` — the FEATURE_HASH_VERSION pattern; on
# mismatch REBUILD from the source audio (like pHash, the old bits do
# not determine the new ones — no in-place rekey exists). History:
#   1 — Haitsma-Kalker 2002 layout: frame_samples=2048/hop=1024
#       defaults, 33 log-spaced band edges over FFT bins
#       [4, frame_samples/2), float64 |FFT|² energies,
#       time-frequency energy-difference sign bits.
AUDIO_FP_VERSION = 1


def _phash_rows(
    pdf: pd.DataFrame, id_col: str, image_mod, hash_size: int, hf: int
) -> pd.DataFrame:
    """pHash kernel (the published DCT perceptual hash, as in the
    ImageHash library): decode → luma → resize to (hash_size·hf)² →
    2-D UNNORMALIZED DCT-II (scipy.fftpack.dct's default — the exact
    transform ImageHash applies; an orthonormal DCT scales row/col 0
    differently and flips ~0.3 bits/image vs ImageHash, ADVICE r14 #2)
    → top-left hash_size² low-frequency block → bit i set iff
    coefficient i > block median. Given the same grayscale-resized
    pixel array, the bits match ImageHash bit-for-bit; end-to-end
    equality additionally requires ImageHash's resample filter
    (LANCZOS/ANTIALIAS) — the vendored codec resizes nearest-neighbor,
    so cross-library joins should hash through one decode path. The
    image module is injected (PIL where installed, the vendored pure
    codec otherwise) — the byte-histogram/testability discipline."""
    import io

    import numpy as np

    n_px = hash_size * hf
    k = np.arange(n_px)
    # scipy.fftpack.dct(type=2, norm=None): y[k] = 2 * sum_n x[n] *
    # cos(pi*(2n+1)k/(2N)) — no per-row scaling anywhere
    dct = 2.0 * np.cos(
        np.pi * (2.0 * k[None, :] + 1.0) * k[:, None] / (2.0 * n_px)
    )

    rows = {id_col: [], "frame_idx": [], "phash": []}
    for i, fi, blob in zip(pdf[id_col], pdf["frame_idx"], pdf["frame"]):
        img = image_mod.open(io.BytesIO(bytes(blob))).convert("L").resize(
            (n_px, n_px)
        )
        a = np.asarray(img, dtype=np.float64)
        low = (dct @ a @ dct.T)[:hash_size, :hash_size]
        bits = (low > np.median(low)).flatten()
        h = 0
        for b in bits:
            h = (h << 1) | int(b)
        if h >= 1 << 63:  # store as signed 64-bit
            h -= 1 << 64
        rows[id_col].append(i)
        rows["frame_idx"].append(int(fi))
        rows["phash"].append(h)
    return pd.DataFrame(rows)


def phash64_frames(
    df: DataFrame,
    codec: str = "ppm",
    hash_size: int = 8,
    highfreq_factor: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """64-bit perceptual hashes for encoded image frames — the multimodal
    arm of the dedup family: two images whose pHashes sit within a small
    Hamming distance are visual near-duplicates (rescaled, re-encoded,
    lightly edited copies), which byte-level dedup can never see. Input
    is the (id, frame_idx, frame binary) shape :func:`resize_frames`
    emits (each ``frame`` an encoded PPM/PGM/PNG image, or anything PIL
    reads under ``codec="real"``); output is (id, frame_idx, phash
    long). Pair the hashes with
    :func:`~..operators.dedup.hamming_neardup_pairs`.

    ``hash_size`` must be ≤ 8 (hash_size² bits must fit the long);
    the (8, 4) default is the published pHash configuration.

    The emitted bits are a PERSISTED KEY FORMAT, currently
    :data:`PHASH_VERSION` — stamp that version next to any stored
    hashes and rebuild from the source images on mismatch (the v1 → v2
    DCT break is documented at the constant).

    Determinism: decode, luma and nearest-neighbor resize are integer
    math; the DCT runs in float64 with a fixed contraction order, so
    hashes are deterministic per platform (pinned by test on the
    vendored codec). Cross-engine oracling would use fixed-vector
    images, the media-codec gate pattern.

    Plan shape: one map-side Arrow kernel (``mapInPandas``) —
    partitioning follows the input, image bytes never shuffle; the
    downstream pairing moves only (id, 8-byte hash) rows.
    """
    if hash_size < 1 or hash_size * hash_size > 64:
        raise ValueError(
            f"hash_size² must fit 64 bits, got hash_size={hash_size}"
        )
    if highfreq_factor < 1:
        raise ValueError(f"highfreq_factor must be >= 1, got {highfreq_factor}")
    # name the id field by id_col and carry the INPUT's id dtype through
    # (string/long ids both round-trip) — the sibling-operator schema
    # discipline; previously this hardcoded ("doc_id", long) and silently
    # renamed a video_id column (ADVICE r14 #3)
    out_schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("frame_idx", T.LongType()),
            T.StructField("phash", T.LongType()),
        ]
    )

    if codec == "real":
        if _probe_pil() is None:
            raise _pil_missing("phash64_frames")

        def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from PIL import Image  # resolved on the executor

            for pdf in batches:
                yield _phash_rows(pdf, id_col, Image, hash_size, highfreq_factor)

    elif codec == "ppm":

        def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from . import imagecodec  # resolved on the executor

            for pdf in batches:
                yield _phash_rows(
                    pdf, id_col, imagecodec, hash_size, highfreq_factor
                )

    else:
        raise ValueError(f"unknown codec {codec!r}; use 'real' or 'ppm'")

    return df.select(F.col(id_col), "frame_idx", "frame").mapInPandas(
        kern, schema=out_schema
    )
