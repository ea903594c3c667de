"""The multimodal (binary-column) journey — image, audio and video
payloads decoded end-to-end with ZERO media libraries, on one corpus.

No reference analogue (the reference has no binary columns); this is
the feature-extraction pass a multimodal training lake runs before
mixing media into the corpus (BASELINE.json "multimodal columns"):

  1. image arm — per-doc P6 PPM frames as one fixed-frame payload
                 column; frame_sample slices frames JVM-side (binary
                 substring, no Python); decode_frames(codec="ppm") runs
                 the REAL decode kernel on the vendored pure-stdlib
                 codec (luma mean per frame); resize_frames re-encodes
                 half-size PNGs
  2. audio arm — attach_audio_payload encodes real RIFF/WAVE blobs
                 (16/24/32-bit PCM); decode_audio_stats emits exact
                 per-channel integer stats; audio_frame_energy finds
                 each doc's loudest 16-frame window (the VAD shape)
  3. video arm — attach_video_payload encodes real YUV4MPEG2 streams
                 (Cmono + C420jpeg); video_frame_stats emits per-frame
                 luma/chroma stats; the largest frame-over-frame luma
                 delta per doc is the shot-boundary signal

Every kernel is map-side (payload bytes never shuffle — the plan pins
in tests/test_plans.py assert it); the only exchanges are the final
result-sized aggregates. Run: python examples/media_pipeline.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from w4h_integrated_toolkit_spark.catalog import read_parquet
from w4h_integrated_toolkit_spark.operators import multimodal as MM
from w4h_integrated_toolkit_spark.session import get_spark

SF_DIR = os.environ.get("W4H_EXAMPLE_SF_DIR", "/root/testdata/sf0.001")


def attach_image_payload(df, frames_per_doc: int = 3, w: int = 8, h: int = 4):
    """Per-doc deterministic P6 PPM frames concatenated into one payload
    (fixed header → fixed frame size, the multimodal framing contract).
    A real lake reads blobs from parquet; the recipe stands in for the
    scan, the kernels downstream are the production path."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("meta", MM.META_TYPE),
        ]
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        header = f"P6\n{w} {h}\n255\n".encode()
        rows = []
        for pdf in batches:
            for d in pdf["doc_id"]:
                frames = []
                for k in range(frames_per_doc):
                    y, x = np.mgrid[0:h, 0:w]
                    rgb = np.stack(
                        [
                            (x * 31 + int(d) + k) % 256,
                            (y * 57 + int(d)) % 256,
                            (x + y + k) % 256,
                        ],
                        axis=-1,
                    ).astype(np.uint8)
                    frames.append(header + rgb.tobytes())
                payload = b"".join(frames)
                rows.append(
                    (
                        int(d),
                        payload,
                        ("image/ppm", len(payload), len(frames[0]), frames_per_doc),
                    )
                )
            yield pd.DataFrame(rows, columns=["doc_id", "payload", "meta"])
            rows = []

    return df.select("doc_id").mapInPandas(synth, schema=out_schema)


def main() -> None:
    spark = get_spark("media-pipeline", cpus=4, shuffle_partitions=4,
                      driver_memory="4g")
    docs = read_parquet(spark, f"{SF_DIR}/documents.parquet").select("doc_id")
    n = docs.count()
    print(f"corpus: {n} documents ({SF_DIR})")

    # 1. image arm — vendored-codec decode + resize, all map-side
    img = attach_image_payload(docs)
    sampled = MM.frame_sample(img, every=2)
    luma = MM.decode_frames(img, codec="ppm")
    resized = MM.resize_frames(img, factor=2, codec="ppm")
    print(
        "image arm: "
        f"{sampled.count()} sampled frames (JVM substring, no Python), "
        f"{luma.count()} decoded luma means "
        f"(corpus mean {luma.agg(F.round(F.avg('mean_byte'), 2)).first()[0]}), "
        f"{resized.count()} half-size PNG re-encodes"
    )

    # 1b. perceptual dedup — pHash over images WITH low-frequency content
    # (the 8x4 framing fixture above is deliberately tiny for the framing
    # contract; perceptual hashing needs actual image structure, so this
    # step synthesizes 64x64 radial-gradient stills with doc-dependent
    # centers, plus each one's HALF-SIZE copy — the classic rescaled
    # near-duplicate byte-level dedup can never see). Banded Hamming
    # pairing (pigeonhole over max_distance+1 bands) finds the copies
    # without an all-pairs join.
    from w4h_integrated_toolkit_spark.operators.dedup import (
        hamming_neardup_pairs,
    )

    n_imgs = 100
    ph_schema = "doc_id long, frame_idx long, frame binary"

    def synth_stills(batches):
        import numpy as np

        from w4h_integrated_toolkit_spark.operators import imagecodec as IC

        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "frame": []}
            for d in pdf["doc_id"]:
                d = int(d)
                cx, cy, s = (d * 7) % 64, (d * 13) % 64, 3 + d % 5
                y, x = np.mgrid[0:64, 0:64]
                still = np.clip(
                    255 - ((x - cx) ** 2 + (y - cy) ** 2) // s, 0, 255
                ).astype(np.uint8)
                for key, arr in ((d, still), (d + 1_000_000, still[::2, ::2])):
                    rows["doc_id"].append(key)
                    rows["frame_idx"].append(0)
                    rows["frame"].append(IC.encode_ppm(arr))
            import pandas as pd

            yield pd.DataFrame(rows)

    stills = (
        spark.range(n_imgs)
        .withColumnRenamed("id", "doc_id")
        .mapInPandas(synth_stills, schema=ph_schema)
    )
    hashes = MM.phash64_frames(stills, codec="ppm").select("doc_id", "phash")
    pairs = hamming_neardup_pairs(hashes, max_distance=10)
    self_pairs = pairs.filter(F.col("id_b") - F.col("id_a") == 1_000_000)
    n_self = self_pairs.count()
    med = self_pairs.agg(F.median("distance").alias("m")).first()["m"]
    print(
        f"perceptual dedup: {n_self}/{n_imgs} half-size copies re-found "
        f"(median pHash distance {med}); "
        f"{pairs.count()} near-dup pairs total at distance <= 10"
    )

    # 2. audio arm — exact PCM stats + loudest window per doc
    wav = MM.attach_audio_payload(docs)
    stats = MM.decode_audio_stats(wav)
    peak = stats.agg(F.max("peak")).first()[0]
    energy = MM.audio_frame_energy(wav, window_frames=16)
    w_loud = Window.partitionBy("doc_id").orderBy(
        F.col("energy").desc(), F.col("window_idx")
    )
    loudest = (
        energy.withColumn("r", F.row_number().over(w_loud))
        .filter("r = 1")
        .drop("r")
    )
    print(
        f"audio arm: {stats.count()} channel-stat rows (peak |s| {peak}), "
        f"loudest window per doc -> {loudest.count()} rows"
    )

    # 2b. perceptual AUDIO dedup — Haitsma-Kalker fingerprints over a
    # corpus where every doc also has a half-gain copy (the re-mastered/
    # re-encoded duplicate byte-level dedup can never see). Gain changes
    # cancel exactly in the energy-difference signs, so copies pair at
    # Hamming distance 0; the multi-frame ids ride the same
    # hamming_neardup_pairs multi-hash (any-frame) semantics pHash uses.
    import numpy as np

    from w4h_integrated_toolkit_spark.operators import audiocodec as AC
    from w4h_integrated_toolkit_spark.operators.dedup import (
        hamming_neardup_pairs,
    )

    def synth_tracks(batches):
        import pandas as pd

        for pdf in batches:
            rows = {"doc_id": [], "payload": []}
            t = np.arange(2048 * 3)
            for d in pdf["doc_id"]:
                d = int(d)
                # tones + per-track broadband noise: pure tones leave
                # most bands empty and every fingerprint near-zero —
                # real audio is broadband, so the demo's tracks are too
                sig = (
                    np.round(
                        3000 * np.sin(2 * np.pi * (11 + d) * t / 2048)
                        + 1500 * np.sin(2 * np.pi * (157 + 13 * d) * t / 2048)
                    ).astype(np.int64)
                    + np.random.default_rng(d).integers(
                        -2000, 2000, size=len(t)
                    )
                ) * 2  # even -> halving is exact
                for key, s in ((d, sig), (d + 1_000_000, sig // 2)):
                    rows["doc_id"].append(key)
                    rows["payload"].append(AC.encode_wav(s, 8000))
            yield pd.DataFrame(rows)

    n_tracks = 40
    tracks = (
        spark.range(n_tracks)
        .withColumnRenamed("id", "doc_id")
        .mapInPandas(synth_tracks, schema="doc_id long, payload binary")
    )
    afp = MM.audio_fingerprint_frames(tracks).select("doc_id", "fp")
    apairs = hamming_neardup_pairs(
        afp, max_distance=3, hash_bits=32, hash_col="fp"
    )
    acopies = apairs.filter(F.col("id_b") - F.col("id_a") == 1_000_000)
    print(
        f"audio dedup: {acopies.count()}/{n_tracks} half-gain copies "
        f"re-found (median distance "
        f"{acopies.agg(F.median('distance')).first()[0]}); "
        f"{apairs.count()} near-dup pairs total at distance <= 3"
    )

    # 3. video arm — per-frame brightness + max frame-over-frame delta
    vid = MM.attach_video_payload(docs)
    vstats = MM.video_frame_stats(vid)
    w_seq = Window.partitionBy("doc_id").orderBy("frame_idx")
    deltas = vstats.withColumn(
        "d", F.abs(F.col("y_sum") - F.lag("y_sum").over(w_seq))
    )
    shot = deltas.groupBy("doc_id").agg(F.max("d").alias("max_luma_delta"))
    top = shot.orderBy(F.col("max_luma_delta").desc(), "doc_id").limit(3)
    print(f"video arm: {vstats.count()} frame-stat rows; sharpest cuts:")
    for r in top.collect():
        print(f"  doc {r['doc_id']}: max frame-over-frame |Δluma| {r['max_luma_delta']}")

    spark.stop()


if __name__ == "__main__":
    main()
