"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The reference stores opaque blobs (Vec<u8> values, kv_store/mod.rs:37-39);
a training-data pipeline needs the same carry-through plus decode /
feature-extract / resize / frame-sample stages. Design:

  * payload: BinaryType column — never interpreted by the engine core;
    partitioned/shuffled as bytes (Arrow handles binary columns
    zero-copy between JVM and Python).
  * meta: typed struct (media_type, n_bytes, checksum) — predicate-able
    without touching payload bytes (column pruning keeps blob I/O out
    of metadata-only queries).
  * decode/resize/frame-sample: mapInPandas batch stages. The actual
    codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so the
    decode body is stubbed — REAL Spark plumbing (schema, batching,
    partition-locality), FAKE pixels. Set decode_mode="fake" for a
    deterministic stand-in; "strict" raises NotImplementedError the
    way the real import failure would.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("checksum", T.StringType()),
                    T.StructField("source", T.StringType()),
                ]
            ),
        ),
    ]
)


def media_table_from_documents(docs: DataFrame) -> DataFrame:
    """Build a media table using document text bytes as stand-in
    payloads (the engine treats payloads as opaque either way).

    Stand-in assumption (ADVICE r12): the fixture corpus is ASCII, so
    one character == one payload byte and the DuckDB oracles may read
    "pixels"/"samples" via ord(substr(text, i, 1)). Queries that bound
    payload size must bound on BYTES (F.octet_length / strlen), never
    characters, so non-ASCII text diverges loudly at the length gate
    instead of silently in the hash bits; the ASCII property itself is
    pinned by tests/test_similarity.py's ASCII-fixture test."""
    payload = F.col("text").cast("binary")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image/fake").alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.md5(payload).alias("checksum"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        # double (not float32) so the deterministic fake features are
        # exactly reproducible by the SQL oracle; a real extractor
        # would emit float32
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def decode_and_featurize(media: DataFrame, decode_mode: str = "fake", feature_dim: int = 8) -> DataFrame:
    """mapInPandas decode + feature-extract stage.

    Real pipeline shape: iterate Arrow batches, decode payload bytes,
    emit fixed-schema rows. decode_mode="fake" derives deterministic
    dimensions/features from the payload checksum (so tests are exact);
    "strict" raises NotImplementedError at the decode site — the
    clearly-marked stub for the missing codec libraries.
    """

    def gen(batches):
        for pdf in batches:
            if decode_mode == "strict":
                raise NotImplementedError(
                    "image decode requires PIL/ffmpeg, not available in this "
                    "environment; use decode_mode='fake' for the deterministic stand-in"
                )
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                digest = hashlib.md5(b).digest()
                rows.append(
                    {
                        "media_id": mid,
                        "width": 64 + digest[0] % 64,
                        "height": 64 + digest[1] % 64,
                        "n_channels": 3,
                        "feature": [
                            round(digest[i] / 255.0, 6) for i in range(feature_dim)
                        ],
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "width", "height", "n_channels", "feature"])

    return media.mapInPandas(gen, DECODED_SCHEMA)


def resize_stub(decoded: DataFrame, target: int = 224) -> DataFrame:
    """Resize stage: pure metadata arithmetic here (aspect-preserving
    target dims); the pixel resample itself is part of the stubbed
    decode. Kept JVM-side — no Python needed for the geometry."""
    scale = F.lit(target) / F.greatest("width", "height")
    # floor, not round: round-half midpoints are HALF_UP in Spark but
    # banker's in DuckDB — floor is the cross-engine-deterministic
    # choice (and standard for image geometry anyway)
    return decoded.select(
        "media_id",
        F.floor(F.col("width") * scale).cast("int").alias("resized_w"),
        F.floor(F.col("height") * scale).cast("int").alias("resized_h"),
        "feature",
    )


def frame_sample_plan(media: DataFrame, every_n: int = 10, max_frames: int = 4) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_index)
    to decode — the explode happens engine-side so the decode stage
    receives an already-parallel frame workload."""
    # Integer division (floor == trunc for the non-negative byte count)
    # so the DuckDB oracle's `//` and this expression agree for EVERY
    # payload length — `(x / n).cast("int")` truncated while a DuckDB
    # `CAST(x / n AS INT)` rounds, diverging for short payloads.
    n_frames = F.least(
        F.floor(F.col("meta.n_bytes") / every_n).cast("int") + 1, F.lit(max_frames)
    )
    return media.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_index"),
    ).withColumn("byte_offset", F.col("frame_index") * every_n)


AUDIO_ENERGY_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("window_index", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("sumsq", T.LongType()),
    ]
)


def audio_energy_windows(media: DataFrame, window_bytes: int = 64) -> DataFrame:
    """Windowed audio energy over opaque payloads (the audio leg of
    the multimodal family): payload bytes are treated as fake 8-bit
    PCM samples (centered at 128 — a real decoder would slot in
    here; the Spark-side plumbing is what's under test), split into
    fixed windows, and each window reduces to (n_samples, Σ sample²)
    inside an Arrow-vectorized mapInPandas. The UDF emits EXACT
    integers only — the RMS transcendental happens JVM-side on the
    caller, so the Python boundary never touches a float. Fan-out is
    len/window rows per payload (row-linear); batches arrive
    Arrow-columnar and numpy does the per-window fold without
    per-sample Python."""
    import numpy as np
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            out = {"media_id": [], "window_index": [], "n_samples": [], "sumsq": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                samples = np.frombuffer(payload, dtype=np.uint8).astype(np.int64) - 128
                for w in range(0, len(samples), window_bytes):
                    chunk = samples[w : w + window_bytes]
                    out["media_id"].append(mid)
                    out["window_index"].append(w // window_bytes)
                    out["n_samples"].append(len(chunk))
                    out["sumsq"].append(int((chunk * chunk).sum()))
            yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(gen, AUDIO_ENERGY_SCHEMA)


IMAGE_POOL_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("in_w", T.IntegerType()),
        T.StructField("in_h", T.IntegerType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("n_out_bytes", T.LongType()),
        T.StructField("pool_checksum", T.LongType()),
    ]
)


def image_downsample_pool(media: DataFrame, in_w: int = 16) -> DataFrame:
    """2×2 average-pool downsample — the IMAGE-PIXEL leg of the
    multimodal family (resize_stub covers geometry only; this touches
    the pixels): payload bytes stand in for a row-major in_w-wide
    8-bit grayscale image (deterministic fake decode, same discipline
    as audio_energy_windows; a real decoder slots in at the reshape),
    each 2×2 block reduces to floor(mean) in EXACT integer arithmetic
    inside an Arrow-vectorized mapInPandas, and the pooled image is
    rebuilt as real bytes (the stage's actual output at scale — here
    reduced to dims + an order-pinned checksum so the result is
    engine-hashable without shipping blobs through the oracle).

    The Python boundary emits integers only; numpy does both the
    strided 2×2 sums and the modular-Horner checksum (blockwise dot
    products against a precomputed power table) without per-pixel
    Python. Fan-out is one row per payload
    (row-linear, no shuffle). ``in_w`` must be even (the 2×2 pool
    halves it; an odd width would silently drop a column — rejected
    instead)."""
    if in_w < 2 or in_w % 2 != 0:
        raise ValueError(f"image_downsample_pool needs an even in_w >= 2, got {in_w}")
    import numpy as np

    # Modular Horner fold, vectorized: cs = sum(v_i * 131^(n-1-i)) mod P
    # as blockwise int64 dot products against a precomputed descending
    # power table (built once here — a bounded _CHUNK-length loop, not
    # per-pixel). Pixel values < 256 and weights < P keep every product
    # under 2.6e11 and every _CHUNK-sum under 1.1e15 — no int64 overflow.
    _P, _CHUNK = 1000000007, 4096
    _wt = np.empty(_CHUNK, np.int64)
    _acc = 1
    for _j in range(_CHUNK - 1, -1, -1):
        _wt[_j] = _acc
        _acc = _acc * 131 % _P

    def _horner_mod(flat: "np.ndarray") -> int:
        cs = 0
        for s in range(0, flat.size, _CHUNK):
            chunk = flat[s : s + _CHUNK]
            cs = (
                cs * pow(131, chunk.size, _P)
                + int(np.dot(chunk, _wt[_CHUNK - chunk.size :]) % _P)
            ) % _P
        return cs

    def gen(batches):
        for pdf in batches:
            out = {k: [] for k in
                   ("media_id", "in_w", "in_h", "out_w", "out_h",
                    "n_out_bytes", "pool_checksum")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = np.frombuffer(
                    bytes(payload) if payload is not None else b"", np.uint8
                ).astype(np.int64)
                in_h = len(b) // in_w
                ow, oh = in_w // 2, in_h // 2
                if oh > 0:
                    img = b[: in_h * in_w].reshape(in_h, in_w)[: oh * 2, : ow * 2]
                    pooled = (
                        img[0::2, 0::2] + img[0::2, 1::2]
                        + img[1::2, 0::2] + img[1::2, 1::2]
                    ) // 4
                    flat = pooled.ravel()
                    # the stage's real product: pooled bytes
                    blob = pooled.astype(np.uint8).tobytes()
                    cs = _horner_mod(flat)
                else:
                    blob, flat, cs = b"", np.array([], np.int64), 0
                out["media_id"].append(mid)
                out["in_w"].append(in_w)
                out["in_h"].append(in_h)
                out["out_w"].append(ow if oh > 0 else 0)
                out["out_h"].append(oh)
                out["n_out_bytes"].append(len(blob))
                out["pool_checksum"].append(cs)
            yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(gen, IMAGE_POOL_SCHEMA)


def image_dhash(media: DataFrame, in_w: int = 9, rows: int = 5) -> DataFrame:
    """Perceptual difference hash (dHash — the public average/
    difference-hash family used for image near-dup detection): payload
    bytes stand in for a row-major ``in_w``-wide 8-bit grayscale image
    (deterministic fake decode, image_downsample_pool's discipline —
    a real decoder+resample slots in at the reshape), and each of the
    first ``rows`` pixel rows contributes ``in_w - 1`` horizontal
    gradient bits: bit = 1 iff p(r,c) < p(r,c+1). The
    rows·(in_w-1)-bit fingerprint packs into ONE BIGINT (callers keep
    rows·(in_w-1) < 63 so the hash stays positive — the default 9×5
    geometry is the classic 40-bit shape of a 9-wide dHash over 5
    rows), so downstream banding/XOR is plain integer algebra any
    engine reproduces. Payloads shorter than in_w·rows are DROPPED
    (no partial grid — callers filter the same bound so oracle row
    sets align).

    Scale: one row per payload, row-linear, no shuffle — the hash is
    Arrow-batched numpy (strided compare + power-of-two dot), and the
    100 TB near-dup pass that follows is the banded hamming equi-join
    (operators/dedup.py hamming_pairs), never an all-pairs distance."""
    n_bits = rows * (in_w - 1)
    if in_w < 2 or rows < 1 or n_bits >= 63:
        raise ValueError(
            f"image_dhash needs in_w >= 2, rows >= 1 and rows*(in_w-1) < 63 "
            f"(one positive BIGINT), got {in_w}x{rows} = {n_bits} bits"
        )
    import numpy as np

    need = in_w * rows
    pow2 = (np.int64(1) << np.arange(n_bits, dtype=np.int64)).astype(np.int64)

    def gen(batches):
        for pdf in batches:
            ids, hashes = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                if len(raw) < need:
                    continue
                grid = (
                    np.frombuffer(raw[:need], np.uint8)
                    .astype(np.int64)
                    .reshape(rows, in_w)
                )
                bits = (grid[:, :-1] < grid[:, 1:]).astype(np.int64).ravel()
                ids.append(mid)
                hashes.append(int(np.dot(bits, pow2)))
            # explicit int64 dtype: an all-dropped batch would otherwise
            # infer object/float columns and fail Arrow conversion
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "dhash": pd.Series(hashes, dtype="int64"),
                }
            )

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("dhash", T.LongType()),
        ]
    )
    return media.select("media_id", "payload").mapInPandas(gen, schema)


def audio_fingerprint(
    media: DataFrame, n_windows: int = 41, window_bytes: int = 2
) -> DataFrame:
    """Energy-difference audio fingerprint (the Haitsma–Kalker 2002
    robust-audio-fingerprint family, public: the sign of the energy
    difference between consecutive windows is the classic
    noise-robust bit): payload bytes stand in for centered 8-bit PCM
    (audio_energy_windows' fake-decode discipline), the first
    ``n_windows`` fixed windows reduce to exact integer energies
    Σ(b-128)², and each consecutive-window comparison contributes one
    bit — (n_windows - 1) bits packed into ONE positive BIGINT
    (callers keep n_windows <= 63), the same single-integer shape
    image_dhash emits, so the SAME banded hamming join
    (operators/dedup.py hamming_pairs) dedups audio. Payloads shorter
    than n_windows·window_bytes are DROPPED (no partial fingerprint;
    callers filter the same bound for oracle row alignment).

    Scale: one row per payload, row-linear, no shuffle — Arrow-batched
    numpy does the strided energy fold; the near-dup pass downstream
    shuffles band values only."""
    n_bits = n_windows - 1
    if n_windows < 2 or window_bytes < 1 or n_bits >= 63:
        raise ValueError(
            f"audio_fingerprint needs 2 <= n_windows <= 63 (one positive "
            f"BIGINT) and window_bytes >= 1, got {n_windows}/{window_bytes}"
        )
    import numpy as np

    need = n_windows * window_bytes
    pow2 = (np.int64(1) << np.arange(n_bits, dtype=np.int64)).astype(np.int64)

    def gen(batches):
        for pdf in batches:
            ids, fps = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                if len(raw) < need:
                    continue
                s = np.frombuffer(raw[:need], np.uint8).astype(np.int64) - 128
                energy = (s * s).reshape(n_windows, window_bytes).sum(axis=1)
                bits = (energy[:-1] < energy[1:]).astype(np.int64)
                ids.append(mid)
                fps.append(int(np.dot(bits, pow2)))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "fingerprint": pd.Series(fps, dtype="int64"),
                }
            )

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("fingerprint", T.LongType()),
        ]
    )
    return media.select("media_id", "payload").mapInPandas(gen, schema)
