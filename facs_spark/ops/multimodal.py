"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery (schemas, partition-aware batch shapes,
mapInPandas signatures, metadata extraction) is real and tested.
Decode support comes in two tiers:

* **real codecs, pure python** — WAV (RIFF/WAVE, PCM16 mono:
  ``decode_wav``/``encode_wav``) and BMP (Windows BITMAPINFOHEADER,
  24-bit uncompressed: ``decode_bmp``/``encode_bmp``).  These parse
  actual container bytes end-to-end; ``decode_audio``/``decode_image``
  dispatch to them on magic.
* **stubbed codecs** — compressed formats (JPEG/PNG/MP3/...) need
  libjpeg/ffmpeg, which this container lacks; those payloads raise a
  clearly-marked ``NotImplementedError`` exactly where a PIL/soundfile
  call slots in.  The FIMG/FAUD deterministic fakes remain for
  plumbing fixtures.

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


# --------------------------------------------------------- real codecs
# WAV and BMP are the two mainstream container formats whose reference
# encodings are uncompressed and fully specified in a page of header
# layout — decodable in pure python/numpy with zero codec libraries.
# (Microsoft/IBM RIFF WAVE spec 1991; Windows BITMAPINFOHEADER.)

def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """PCM16 mono RIFF/WAVE bytes for an int16 sample array."""
    data = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    fmt = _struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    chunks = (b"WAVE"
              + b"fmt " + _struct.pack("<I", len(fmt)) + fmt
              + b"data" + _struct.pack("<I", len(data)) + data)
    return b"RIFF" + _struct.pack("<I", len(chunks)) + chunks


def decode_wav(blob: bytes) -> tuple[np.ndarray, int]:
    """Parse RIFF/WAVE bytes → (int16 mono waveform, sample_rate).

    A real chunk-walking parser (not tied to this module's encoder):
    chunks may come in any order with unknown chunks interleaved
    (LIST/INFO, fact, ...), each padded to an even byte boundary per
    the RIFF spec.  Supports PCM (format 1) 16-bit; mono or the first
    channel of interleaved multi-channel.
    """
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, min(len(blob), 8 + _struct.unpack_from("<I", blob, 4)[0])
    fmt = None
    data = None
    while pos + 8 <= end:
        cid, size = blob[pos:pos + 4], _struct.unpack_from("<I", blob, pos + 4)[0]
        body = blob[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = _struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are even-aligned
    if fmt is None or data is None:
        raise ValueError("RIFF/WAVE missing fmt or data chunk")
    audio_fmt, channels, rate, _byterate, _align, bits = fmt
    if audio_fmt != 1 or bits != 16:
        raise NotImplementedError(
            f"WAV format {audio_fmt}/{bits}-bit needs a codec library; "
            "only PCM16 decodes in pure python here")
    wave = np.frombuffer(data, dtype="<i2",
                         count=len(data) // 2 // channels * channels)
    if channels > 1:
        wave = wave.reshape(-1, channels)[:, 0].copy()
    return wave, rate


def encode_bmp(px: np.ndarray) -> bytes:
    """24-bit uncompressed BMP bytes for an (H, W, 3) uint8 RGB array."""
    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    data = rows.tobytes()
    info = _struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                        2835, 2835, 0, 0)
    header = _struct.pack("<2sIHHI", b"BM", 14 + 40 + len(data), 0, 0,
                          14 + 40)
    return header + info + data


def decode_bmp(blob: bytes) -> np.ndarray:
    """Parse BMP bytes → (H, W, 3) uint8 RGB.  Supports the ubiquitous
    BITMAPINFOHEADER 24-bit BI_RGB layout (top-down or bottom-up)."""
    if blob[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = _struct.unpack_from("<I", blob, 10)[0]
    hdr_size, w, h = _struct.unpack_from("<Iii", blob, 14)
    planes, bits, compression = _struct.unpack_from("<HHI", blob, 26)
    if hdr_size < 40 or bits != 24 or compression != 0:
        raise NotImplementedError(
            f"BMP {bits}-bit compression={compression} needs a codec "
            "library; only 24-bit BI_RGB decodes in pure python here")
    flip = h > 0  # positive height = bottom-up storage
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(blob, np.uint8, count=h * stride,
                         offset=data_off).reshape(h, stride)
    px = rows[:, :w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    return (px[::-1] if flip else px).copy()


def synth_samples(i: int) -> np.ndarray:
    """Deterministic int16 sample pattern for doc ``i`` — chosen to be
    replayable in plain SQL (the q47 oracle rebuilds it with
    ``generate_series``): ``s[j] = (i*31 + j*7) % 201 - 100``."""
    n = 256 + (i * 37) % 1024
    j = np.arange(n, dtype=np.int64)
    return ((i * 31 + j * 7) % 201 - 100).astype("<i2")


def synth_media(df: DataFrame, id_col: str, kind: str = "image") -> DataFrame:
    """Attach a deterministic media payload per row (fixture).

    ``kind="image"``: fake container magic(4s)|width(u16)|height(u16)|body.
    ``kind="audio"``: fake container magic(4s)|rate(u32)|n(u32)|int16 LE.
    ``kind="wav"``: a REAL RIFF/WAVE PCM16 file per row (the
    ``synth_samples`` pattern — SQL-replayable for oracle checks).
    ``kind="bmp"``: a REAL 24-bit BMP per row (deterministic pixels).
    """
    ensure_shipped(df.sparkSession)
    if kind not in ("image", "audio", "wav", "bmp"):
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
                elif kind == "audio":
                    rate = 8000
                    n = 256 + (int(i) * 37) % 1024
                    t = np.arange(n, dtype=np.float64)
                    wave = (3000 * np.sin(2 * np.pi * (50 + int(i) % 200)
                                          * t / rate)).astype("<i2")
                    blobs.append(b"FAUD" + _struct.pack("<II", rate, n)
                                 + wave.tobytes())
                elif kind == "wav":
                    blobs.append(encode_wav(synth_samples(int(i)), 8000))
                else:  # bmp
                    w = 8 + (int(i) * 5) % 24
                    h = 8 + (int(i) * 11) % 24
                    yy, xx = np.mgrid[0:h, 0:w]
                    px = np.stack([(yy * 7 + int(i)) % 256,
                                   (xx * 13 + int(i) * 3) % 256,
                                   (yy + xx + int(i) * 5) % 256],
                                  axis=-1).astype(np.uint8)
                    blobs.append(encode_bmp(px))
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
                elif b[:4] == b"RIFF" and b[8:12] == b"WAVE":
                    wave, rate = decode_wav(b)
                    metas["mime"].append("audio/wav")
                    metas["width"].append(0)
                    metas["height"].append(0)
                    metas["duration_ms"].append(
                        int(wave.size * 1000 / max(rate, 1)))
                elif b[:2] == b"BM":
                    _, w, h = _struct.unpack_from("<Iii", b, 14)
                    metas["mime"].append("image/bmp")
                    metas["width"].append(int(w))
                    metas["height"].append(abs(int(h)))
                    metas["duration_ms"].append(0)
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
    """Dispatch on magic: BMP decodes for REAL (pure-python 24-bit
    BI_RGB parser); FIMG is the deterministic plumbing fake;
    compressed formats (JPEG/PNG/...) raise where a PIL/libjpeg call
    would slot in.  Contract: returns an (H, W, 3) uint8 RGB array.
    """
    if blob[:2] == b"BM":
        return decode_bmp(blob)
    if blob[:4] == b"FIMG":
        w, h = _struct.unpack_from("<HH", blob, 4)
        body = np.frombuffer(blob, np.uint8, offset=8)
        px = np.resize(body, w * h * 3).reshape(h, w, 3)
        return px
    raise NotImplementedError(
        "compressed image decode (JPEG/PNG/...) requires PIL/libjpeg — "
        "not present in this container; plug the codec in here")


def decode_audio(blob: bytes) -> tuple[np.ndarray, int]:
    """Dispatch on magic: RIFF/WAVE decodes for REAL (pure-python
    PCM16 parser); FAUD is the deterministic plumbing fake; compressed
    formats (MP3/OGG/...) raise where a soundfile/ffmpeg call would
    slot in.  Contract: returns (int16 waveform, sample_rate).
    """
    if blob[:4] == b"RIFF":
        return decode_wav(blob)
    if blob[:4] == b"FAUD":
        rate, n = _struct.unpack_from("<II", blob, 4)
        wave = np.frombuffer(blob, dtype="<i2", count=n, offset=12)
        return wave, rate
    raise NotImplementedError(
        "compressed audio decode (MP3/OGG/...) requires "
        "soundfile/ffmpeg — not present in this container; plug the "
        "codec in here")


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
