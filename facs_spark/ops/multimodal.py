"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery (schemas, partition-aware batch shapes,
mapInPandas signatures, metadata extraction) is real and tested; the
actual media decode is STUBBED behind ``decode_image``/``decode_audio``
(the codec libraries are not in this container) with a deterministic
fake, clearly marked.  Swapping the stub for PIL/soundfile is a
one-function change — the distributed plumbing does not move.

Schema convention for a media column ``m``:
    m            binary        -- opaque payload
    m_meta       struct<mime string, width int, height int,
                        duration_ms int, sha1 string>
"""

from __future__ import annotations

import hashlib
import struct as _struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..session import ensure_parallelism, ensure_shipped

MEDIA_META_SCHEMA = ("struct<mime:string, width:int, height:int, "
                     "duration_ms:int, sha1:string>")


def synth_media(df: DataFrame, id_col: str, kind: str = "image") -> DataFrame:
    """Attach a deterministic fake media payload per row (fixture).

    ``kind="image"``: magic(4s) | width(u16) | height(u16) | body.
    ``kind="audio"``: magic(4s) | sample_rate(u32) | n_samples(u32) |
    int16-LE samples.  Enough structure for the metadata extractor to
    parse either like a container header.
    """
    ensure_shipped(df.sparkSession)
    if kind not in ("image", "audio"):
        raise ValueError(f"unknown media kind {kind!r}")

    def kernel(iterator):
        for batch in iterator:
            ids = batch[id_col].to_numpy()
            blobs = []
            for i in ids:
                if kind == "image":
                    w = 16 + (int(i) * 7) % 48
                    h = 16 + (int(i) * 13) % 48
                    body = (int(i).to_bytes(8, "little")
                            * ((w * h) // 8 + 1))[: w * h]
                    blobs.append(b"FIMG" + _struct.pack("<HH", w, h) + body)
                else:
                    rate = 8000
                    n = 256 + (int(i) * 37) % 1024
                    t = np.arange(n, dtype=np.float64)
                    wave = (3000 * np.sin(2 * np.pi * (50 + int(i) % 200)
                                          * t / rate)).astype("<i2")
                    blobs.append(b"FAUD" + _struct.pack("<II", rate, n)
                                 + wave.tobytes())
            yield pd.DataFrame({id_col: ids, "media": blobs})

    return ensure_parallelism(df.select(id_col)).mapInPandas(
        kernel, schema=f"{id_col} long, media binary")


def media_metadata(df: DataFrame, id_col: str,
                   media_col: str = "media") -> DataFrame:
    """Parse container headers into the typed metadata struct —
    vectorized, no decode."""
    ensure_shipped(df.sparkSession)

    def kernel(iterator):
        for batch in iterator:
            metas = {"mime": [], "width": [], "height": [],
                     "duration_ms": [], "sha1": []}
            for blob in batch[media_col]:
                b = bytes(blob)
                if b[:4] == b"FIMG":
                    w, h = _struct.unpack_from("<HH", b, 4)
                    metas["mime"].append("image/x-fake")
                    metas["width"].append(w)
                    metas["height"].append(h)
                    metas["duration_ms"].append(0)
                elif b[:4] == b"FAUD":
                    rate, n = _struct.unpack_from("<II", b, 4)
                    metas["mime"].append("audio/x-fake")
                    metas["width"].append(0)
                    metas["height"].append(0)
                    metas["duration_ms"].append(int(n * 1000 / max(rate, 1)))
                else:
                    metas["mime"].append("application/octet-stream")
                    metas["width"].append(0)
                    metas["height"].append(0)
                    metas["duration_ms"].append(0)
                metas["sha1"].append(hashlib.sha1(b).hexdigest())
            out = pd.DataFrame({id_col: batch[id_col],
                                "nbytes": [len(bytes(b)) for b in batch[media_col]]})
            for k, v in metas.items():
                out[k] = v
            yield out

    # upstream media frames are already partition-parallel; no repartition
    return df.select(id_col, media_col).mapInPandas(
        kernel, schema=(f"{id_col} long, nbytes long, mime string, "
                        "width int, height int, duration_ms int, sha1 string"))


def decode_image(blob: bytes) -> np.ndarray:
    """STUB — real codecs unavailable in this container.

    Contract: returns an (H, W, 3) uint8 array.  The deterministic
    fake decodes the FIMG fixture container; any other payload raises,
    exactly where a PIL/libjpeg call would slot in.
    """
    if blob[:4] == b"FIMG":
        w, h = _struct.unpack_from("<HH", blob, 4)
        body = np.frombuffer(blob, np.uint8, offset=8)
        px = np.resize(body, w * h * 3).reshape(h, w, 3)
        return px
    raise NotImplementedError(
        "real image decode requires PIL/libjpeg — not present in this "
        "container; plug the codec in here")


def decode_audio(blob: bytes) -> tuple[np.ndarray, int]:
    """STUB — real codecs unavailable in this container.

    Contract: returns (int16 waveform, sample_rate).  The
    deterministic fake decodes the FAUD fixture container; any other
    payload raises, exactly where a soundfile/ffmpeg call would slot
    in.
    """
    if blob[:4] == b"FAUD":
        rate, n = _struct.unpack_from("<II", blob, 4)
        wave = np.frombuffer(blob, dtype="<i2", count=n, offset=12)
        return wave, rate
    raise NotImplementedError(
        "real audio decode requires soundfile/ffmpeg — not present in "
        "this container; plug the codec in here")


def audio_features(df: DataFrame, id_col: str, media_col: str = "media",
                   window_ms: int = 32) -> DataFrame:
    """Decode → fixed windows → per-window RMS + zero-crossing rate,
    batched via mapInPandas — the audio analogue of
    ``image_features`` (real batch shape, stub decoder)."""
    ensure_shipped(df.sparkSession)

    def kernel(iterator):
        for batch in iterator:
            rows = {"ids": [], "win": [], "rms": [], "zcr": []}
            for i, blob in zip(batch[id_col], batch[media_col]):
                wave, rate = decode_audio(bytes(blob))
                step = max(1, rate * window_ms // 1000)
                if wave.size < step:  # clip shorter than one window
                    step = max(1, wave.size)
                n_win = max(1, wave.size // step)
                w = wave[:n_win * step].astype(np.float64) \
                    .reshape(n_win, step)
                rms = np.sqrt((w * w).mean(axis=1))
                zc = (np.diff(np.signbit(w), axis=1) != 0).mean(axis=1)
                rows["ids"].extend([i] * n_win)
                rows["win"].extend(range(n_win))
                rows["rms"].extend(rms.tolist())
                rows["zcr"].extend(zc.tolist())
            yield pd.DataFrame({id_col: rows["ids"], "win_idx": rows["win"],
                                "rms": rows["rms"], "zcr": rows["zcr"]})

    return df.select(id_col, media_col).mapInPandas(
        kernel,
        schema=f"{id_col} long, win_idx int, rms double, zcr double")


def image_features(df: DataFrame, id_col: str,
                   media_col: str = "media",
                   resize_to: int = 8) -> DataFrame:
    """Decode → resize → mean-pool features, batched via mapInPandas.

    Demonstrates the real batch shape for media kernels: per Arrow
    batch, decode into one (B, H, W, 3) block, vectorize the pooling.
    Uses the stub decoder (deterministic fake) — swap ``decode_image``
    for a real codec to run on real corpora.
    """
    ensure_shipped(df.sparkSession)

    def kernel(iterator):
        for batch in iterator:
            feats, ids = [], []
            for i, blob in zip(batch[id_col], batch[media_col]):
                img = decode_image(bytes(blob)).astype(np.float32)
                h, w, _ = img.shape
                # nearest-neighbor resize to (resize_to, resize_to)
                yi = (np.arange(resize_to) * h // resize_to)
                xi = (np.arange(resize_to) * w // resize_to)
                small = img[yi][:, xi]
                feats.append(small.mean(axis=(0, 1)).tolist()
                             + [float(img.mean()), float(img.std())])
                ids.append(i)
            yield pd.DataFrame({id_col: ids, "features": feats})

    return df.select(id_col, media_col).mapInPandas(
        kernel, schema=f"{id_col} long, features array<double>")


def frame_sample_plan(df: DataFrame, id_col: str,
                      duration_col: str, fps: float = 1.0,
                      max_frames: int = 16) -> DataFrame:
    """Frame-sampling plan for video rows: (id, frame_ts_ms) pairs,
    JVM-side sequence generation (no decode)."""
    n = F.least(F.floor(F.col(duration_col) / F.lit(int(1000 / fps))) + 1,
                F.lit(max_frames))
    return (df.select(id_col, duration_col)
            .withColumn("frame_idx", F.explode(F.sequence(F.lit(0), n - 1)))
            .withColumn("frame_ts_ms",
                        (F.col("frame_idx") * F.lit(int(1000 / fps)))
                        .cast("long"))
            .select(id_col, "frame_idx", "frame_ts_ms"))
