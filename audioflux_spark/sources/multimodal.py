"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The reference's whole domain is decoded audio (audio.read →
/root/reference/python/audioflux/audio.py:22-106, backed by soundfile). In
this engine, media payloads ride transcripts as opaque ``binary`` columns
with a typed metadata struct; decode / feature-extract / resize / frame-
sample run as Arrow-batched kernels over mapInPandas.

DECODERS ARE STUBBED in this container (no PIL/soundfile/av): each `_decode_*`
first tries the real library import and otherwise derives a DETERMINISTIC
FAKE tensor from the payload bytes (seeded by a payload digest) with the
shape the metadata declares. The Spark-side plumbing — schema, partitioning,
UDF signatures, batch iteration, output shapes — is real and tested; swapping
in real decoders is a one-function change.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType()),
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("channels", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                    T.StructField("format", T.StringType()),
                ]
            ),
        ),
    ]
)


def gen_assets(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic synthetic asset table (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"])[rng.integers(0, 3, n)]
    rows = []
    for i in range(n):
        kind = str(kinds[i])
        payload = rng.integers(0, 256, size=int(rng.integers(64, 256)), dtype=np.uint8).tobytes()
        if kind == "image":
            meta = (int(rng.integers(8, 64)), int(rng.integers(8, 64)), 3, None, None, None, "png")
        elif kind == "audio":
            meta = (None, None, 1, 16000, int(rng.integers(100, 2000)), None, "wav")
        else:
            meta = (int(rng.integers(8, 32)), int(rng.integers(8, 32)), 3, None,
                    int(rng.integers(500, 5000)), int(rng.integers(4, 32)), "mp4")
        rows.append(
            (f"asset-{i:06d}", f"conv-{i % max(n // 4, 1):08d}", i % 7, kind, payload, meta)
        )
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def _digest_rng(payload: bytes) -> np.random.Generator:
    seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "little")
    return np.random.default_rng(seed)


def _decode_image(payload: bytes, width: int, height: int, channels: int) -> np.ndarray:
    """Real PIL decode when the library is importable AND the payload is a
    valid image; deterministic fake otherwise (ImportError → silent fallback,
    undecodable payload → warned fallback). Never raises on a present lib."""
    try:
        import io

        import PIL.Image

        try:
            img = PIL.Image.open(io.BytesIO(payload))
            arr = np.asarray(img.convert("RGB" if int(channels) == 3 else "L"))
            if arr.ndim == 2:
                arr = arr[:, :, None]
            return arr
        except Exception:
            import warnings

            warnings.warn("payload not decodable by PIL; using deterministic fake")
    except ImportError:
        pass
    if payload[:2] in (b"P6", b"P5"):  # stdlib netpbm path, like WAV's RIFF
        try:
            return _decode_ppm(payload)
        except Exception:
            import warnings

            warnings.warn("netpbm payload not decodable; using deterministic fake")
    # deterministic fake: shape from metadata, values from payload digest.
    # (Arrow structs with nullable int fields arrive as floats in pandas —
    # coerce explicitly.)
    return _digest_rng(payload).integers(
        0, 256, size=(int(height), int(width), int(channels)), dtype=np.uint8
    )


def _decode_ppm(payload: bytes) -> np.ndarray:
    """REAL decode of binary PPM (P6) / PGM (P5) via pure stdlib parsing —
    no external dependency (the netpbm header is magic, then
    whitespace-separated width/height/maxval with '#' comments, then one
    raw sample block). Returns HxWx3 (P6) or HxWx1 (P5) uint8."""
    if payload[:2] not in (b"P6", b"P5"):
        raise ValueError("not a binary netpbm payload")
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment runs to end of line
            nl = payload.find(b"\n", pos)
            pos = len(payload) if nl < 0 else nl + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # exactly ONE whitespace byte separates maxval from raster
    width, height, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    nch = 3 if payload[:2] == b"P6" else 1
    n = width * height * nch
    arr = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    return arr.reshape(height, width, nch)


def _decode_wav_pcm(payload: bytes) -> np.ndarray:
    """REAL decode of PCM WAV via stdlib ``wave`` + np.frombuffer — no external
    dependency (the reference's audio.read backed by soundfile,
    /root/reference/python/audioflux/audio.py:22-106; same normalization:
    intN → float32 in [-1, 1), multi-channel → mean downmix)."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        nch = w.getnchannels()
        sw = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if sw == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif sw == 1:  # 8-bit WAV is unsigned
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif sw == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"unsupported PCM sample width {sw}")
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return x.astype(np.float32)


def _decode_audio(payload: bytes, sample_rate: int, duration_ms: int) -> np.ndarray:
    """Real decode when possible — soundfile for any container when the
    library is importable, else stdlib ``wave`` for PCM WAV payloads (RIFF
    magic) — deterministic fake otherwise (same contract as _decode_image)."""
    try:
        import io

        import soundfile

        try:
            data, _sr = soundfile.read(io.BytesIO(payload), dtype="float32")
            return data if data.ndim == 1 else data.mean(axis=1).astype(np.float32)
        except Exception:
            import warnings

            warnings.warn("payload not decodable by soundfile; using deterministic fake")
    except ImportError:
        pass
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        try:
            return _decode_wav_pcm(payload)
        except Exception:
            import warnings

            warnings.warn("RIFF payload not PCM-decodable; using deterministic fake")
    n = max(int(int(sample_rate) * int(duration_ms) / 1000), 1)
    return _digest_rng(payload).standard_normal(n).astype(np.float32)


def image_features(assets: DataFrame) -> DataFrame:
    """Per-image feature vector (mean/std per channel + size), Arrow-batched.
    Output: (asset_id, features array<float>)."""

    def extract(iterator):
        for pdf in iterator:
            pdf = pdf[pdf["kind"] == "image"]
            if pdf.empty:
                continue
            feats = []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                img = _decode_image(bytes(payload), meta["width"], meta["height"], meta["channels"])
                f = np.concatenate(
                    [
                        img.mean(axis=(0, 1)),
                        img.std(axis=(0, 1)),
                        [img.shape[0], img.shape[1]],
                    ]
                ).astype(np.float32)
                feats.append(f)
            yield pd.DataFrame({"asset_id": pdf["asset_id"].to_numpy(), "features": feats})

    return assets.mapInPandas(extract, schema="asset_id string, features array<float>")


def resize_images(assets: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize (pure NumPy — no library needed) over the
    decoded tensor; returns re-encoded raw bytes + new meta."""

    def run(iterator):
        for pdf in iterator:
            pdf = pdf[pdf["kind"] == "image"]
            if pdf.empty:
                continue
            out = []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                img = _decode_image(bytes(payload), meta["width"], meta["height"], meta["channels"])
                ys = (np.arange(out_h) * img.shape[0] // out_h).astype(np.int64)
                xs = (np.arange(out_w) * img.shape[1] // out_w).astype(np.int64)
                out.append(img[ys][:, xs].tobytes())
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].to_numpy(),
                    "payload": out,
                    "width": out_w,
                    "height": out_h,
                }
            )

    return assets.mapInPandas(
        run, schema="asset_id string, payload binary, width int, height int"
    )


def sample_frames(assets: DataFrame, every_n: int = 4) -> DataFrame:
    """Frame sampling for video assets: emits one row per sampled frame index
    (decode stubbed; the explode/plumbing shape is the point)."""
    vids = assets.filter(F.col("kind") == "video").select(
        "asset_id",
        F.explode(
            F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )
    return vids


def audio_stats(assets: DataFrame) -> DataFrame:
    """Per-clip RMS/ZCR — the reference's temporal features
    (/root/reference/src/temporal_algorithm.c:93-167) over (fake-)decoded audio."""

    def run(iterator):
        for pdf in iterator:
            pdf = pdf[pdf["kind"] == "audio"]
            if pdf.empty:
                continue
            rms, zcr = [], []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                x = _decode_audio(bytes(payload), meta["sample_rate"], meta["duration_ms"])
                rms.append(float(np.sqrt(np.mean(x**2))))
                zcr.append(float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))))
            yield pd.DataFrame(
                {"asset_id": pdf["asset_id"].to_numpy(), "rms": rms, "zcr": zcr}
            )

    return assets.mapInPandas(run, schema="asset_id string, rms double, zcr double")
