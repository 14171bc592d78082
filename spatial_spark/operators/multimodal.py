"""Multimodal column handling: opaque binary payloads + typed metadata.

Image/audio/video travel as `binary` columns with a metadata struct; all
decode/feature steps run as Arrow-batched `mapInPandas` so the per-batch
shape (schema, partitioning, batch iteration) is the real 100 TB plumbing.
The actual codec calls are STUBBED (no image/audio libs in this container):
`decoder="fake"` runs a deterministic header-parse stand-in, `decoder="real"`
raises NotImplementedError at the exact seam where PIL/ffmpeg would slot in.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("media_type", T.StringType(), True),   # image|audio|video
    T.StructField("format", T.StringType(), True),       # png|jpeg|wav|mp4...
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.IntegerType(), True),
])


def make_fake_media_df(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table: payload = 16-byte header
    (magic, width, height, seed) + pseudo-pixel bytes."""
    rows = []
    for i in range(n):
        w, h = 8 + (i % 5) * 4, 8 + (i % 3) * 4
        header = struct.pack("<4sIII", b"FAKE", w, h, i)
        body = bytes(((i * 31 + j * 7) % 251) for j in range(w * h))
        rows.append((i, header + body, "image", "fake", w, h, None))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_features(df: DataFrame, decoder: str = "fake",
                    payload_col: str = "payload") -> DataFrame:
    """Decode payloads → per-item feature struct via mapInPandas.

    Output adds: decoded_w, decoded_h, mean_intensity, histogram16.
    decoder="real" marks where a real codec (PIL / torchaudio / ffmpeg)
    plugs in; everything around it (Arrow batching, schema, partition
    parallelism) is production-shaped."""
    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField("decoded_w", T.IntegerType()),
           T.StructField("decoded_h", T.IntegerType()),
           T.StructField("mean_intensity", T.DoubleType()),
           T.StructField("histogram16", T.ArrayType(T.LongType()))])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, means, hists = [], [], [], []
            for buf in pdf[payload_col]:
                if buf is None:
                    ws.append(None); hs.append(None); means.append(None); hists.append(None)
                    continue
                if decoder == "real":
                    raise NotImplementedError(
                        "real media decode requires PIL/ffmpeg — not in this "
                        "container; plug the codec in here")
                magic, w, h, _seed = struct.unpack_from("<4sIII", bytes(buf), 0)
                if magic != b"FAKE":
                    raise ValueError("unknown payload format")
                px = np.frombuffer(bytes(buf), dtype=np.uint8, offset=16)
                ws.append(int(w)); hs.append(int(h))
                means.append(float(px.mean()) if len(px) else 0.0)
                hists.append(np.histogram(px, bins=16, range=(0, 256))[0]
                             .astype(np.int64).tolist())
            yield pdf.assign(decoded_w=ws, decoded_h=hs,
                             mean_intensity=means, histogram16=hists)

    return df.mapInPandas(run, out_schema)


def resize_stub(df: DataFrame, target_w: int, target_h: int,
                payload_col: str = "payload") -> DataFrame:
    """Resize plumbing: fake decoder emits a payload with the new header
    dims and nearest-neighbor-sampled body (deterministic)."""
    out_schema = df.schema

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for buf in pdf[payload_col]:
                if buf is None:
                    out.append(None)
                    continue
                magic, w, h, seed = struct.unpack_from("<4sIII", bytes(buf), 0)
                px = np.frombuffer(bytes(buf), dtype=np.uint8, offset=16)
                img = px[: w * h].reshape(h, w)
                yi = (np.arange(target_h) * h // target_h)
                xi = (np.arange(target_w) * w // target_w)
                resized = img[yi][:, xi]
                out.append(struct.pack("<4sIII", b"FAKE", target_w, target_h, seed)
                           + resized.tobytes())
            pdf = pdf.copy()
            pdf[payload_col] = out
            pdf["width"] = target_w
            pdf["height"] = target_h
            yield pdf

    return df.mapInPandas(run, out_schema)


def frame_sample_stub(df: DataFrame, every_n: int = 2) -> DataFrame:
    """Video frame-sampling plumbing: treat each payload row as a 'video'
    whose frames are row-chunks; emit one row per sampled frame (1→N
    mapInPandas, the real shape of frame extraction)."""
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("frame_no", T.IntegerType())])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                buf = row["payload"]
                if buf is None:
                    continue
                _, w, h, _ = struct.unpack_from("<4sIII", bytes(buf), 0)
                n_frames = max(int(h), 1)
                for f in range(0, n_frames, every_n):
                    r = row.to_dict()
                    r["frame_no"] = f
                    rows.append(r)
            if rows:
                yield pd.DataFrame(rows)

    return df.mapInPandas(run, out_schema)
