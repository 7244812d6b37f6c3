"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, processed by Arrow-batched ``mapInPandas`` kernels.

The Spark-side plumbing — schemas, batch shapes, partition sizing, UDF
signatures — is real and tested; the actual codec step is STUBBED because no
image/audio library exists in this container: ``decode_image`` raises
``NotImplementedError`` unless ``fake=True``, in which case a *headerless raw
RGB24* decode stands in: the payload bytes ARE the pixel buffer, tiled
cyclically to ``(h, w, 3)``. Paired with ``make_fake_media``'s closed-form
payload generator (a pure function of ``(media_id, byte index)``), every
downstream feature is expressible in ANSI SQL, so the driver's DuckDB oracle
can hash-match the whole pipeline (see ``q_multimodal_features``).

Scale notes: media rows are large (MBs); the kernels are streaming
(``mapInPandas`` yields per Arrow batch, never materializing a partition),
and ``media_repartition_hint`` documents the row-group sizing rule —
payload-heavy tables want small ``spark.sql.files.maxPartitionBytes`` and
``maxRecordsPerBatch`` tuned so a batch of decoded frames fits in executor
memory.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover - not present in this container
    from PIL import Image as _PILImage  # type: ignore

    _HAVE_PIL = True
except Exception:  # pragma: no cover
    _HAVE_PIL = False

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("pixels", T.BinaryType()),  # uint8 (h, w, 3) C-order
    ]
)


def decode_image(payload: bytes, width: int, height: int, fake: bool = False) -> np.ndarray:
    """payload → uint8 (h, w, 3).

    Three routes, mirroring the rasterio import-gate policy in
    ``sources/raster.py``:

    - ``fake=True``: deterministic *raw RGB24* codec — the payload bytes
      are read as the pixel buffer itself, tiled cyclically to fill
      ``(h, w, 3)`` (flat pixel ``j`` takes byte ``payload[j % len]``).
      Closed-form, so a SQL oracle can replay it exactly. This is the
      tested default in this container.
    - Pillow importable (absent here): real JPEG/PNG/WebP decode via
      ``Image.open`` → RGB. The declared (width, height) metadata are
      hints; the DECODED dimensions win (payload is the source of truth —
      same rule as the raster scan trusting the file over proj:shape).
    - neither: a clear NotImplementedError.
    """
    if fake:
        buf = np.frombuffer(payload, dtype=np.uint8)
        if buf.size == 0:
            raise ValueError("decode_image: empty payload")
        return np.resize(buf, height * width * 3).reshape(height, width, 3)
    if _HAVE_PIL:
        import io

        with _PILImage.open(io.BytesIO(bytes(payload))) as im:
            arr = np.asarray(im.convert("RGB"), dtype=np.uint8)
        if arr.ndim != 3 or arr.shape[2] != 3:
            raise ValueError(f"decode_image: decoded shape {arr.shape} is not RGB")
        return arr
    raise NotImplementedError(
        "No image codec available in this environment; pass fake=True for "
        "the deterministic raw-RGB24 decoder (tests), or install Pillow — "
        "decode_image routes to it automatically when importable."
    )


#: Fake payload length. Prime, and co-prime with any (h*w*3), so the cyclic
#: tiling sweeps the whole byte pattern rather than aliasing to a short cycle.
FAKE_PAYLOAD_BYTES = 997


def fake_payload(media_id: int, nbytes: int = FAKE_PAYLOAD_BYTES) -> bytes:
    """Closed-form payload: byte ``k`` is ``((id+3)*(41k + (k%7)*29 + 17)) % 256``.

    Pure integer arithmetic in (media_id, k) — replayable in ANSI SQL — and the
    per-media multiplier ``(media_id+3)`` changes the residue *distribution*
    (not just a shift), so histograms differ across media.
    """
    return bytes(
        ((media_id + 3) * (41 * k + (k % 7) * 29 + 17)) % 256 for k in range(nbytes)
    )


def make_fake_media(spark, n: int = 8, width: int = 32, height: int = 24) -> DataFrame:
    """Synthetic media table with deterministic closed-form payloads."""
    rows = [
        (i, "image", "image/fake", width, height, 1, fake_payload(i)) for i in range(n)
    ]
    from stackstac_spark.session import local_df

    return local_df(spark, rows, MEDIA_SCHEMA)


def extract_features(media: DataFrame, fake: bool = True, bins: int = 16) -> DataFrame:
    """Per-image color-histogram feature vector via streaming mapInPandas."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                img = decode_image(row.payload, row.width, row.height, fake=fake)
                hist, _ = np.histogram(img, bins=bins, range=(0, 256))
                feat = (hist / hist.sum()).astype("float32")
                out.append((row.media_id, feat.tolist()))
            yield pd.DataFrame(out, columns=["media_id", "feature"])

    cols = ["media_id", "kind", "mime", "width", "height", "n_frames", "payload"]
    return media.select(*cols).mapInPandas(kernel, FEATURE_SCHEMA)


def resize_images(media: DataFrame, out_w: int, out_h: int, fake: bool = True) -> DataFrame:
    """Nearest-neighbor resize (pure numpy index gather) → FRAME_SCHEMA."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                img = decode_image(row.payload, row.width, row.height, fake=fake)
                # decoded dims win over metadata hints (decode_image contract
                # — a real codec may disagree with the declared width/height)
                src_h, src_w = img.shape[:2]
                rr = (np.arange(out_h) * src_h // out_h).astype(int)
                cc = (np.arange(out_w) * src_w // out_w).astype(int)
                resized = img[rr][:, cc]
                out.append((row.media_id, 0, out_w, out_h, resized.tobytes()))
            yield pd.DataFrame(
                out, columns=["media_id", "frame_idx", "width", "height", "pixels"]
            )

    cols = ["media_id", "kind", "mime", "width", "height", "n_frames", "payload"]
    return media.select(*cols).mapInPandas(kernel, FRAME_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 2, fake: bool = True) -> DataFrame:
    """Frame sampling for video rows: emit every ``every_n``-th frame (the
    fake raw codec derives each frame deterministically from (payload, idx):
    appending the frame index changes the tiling period, so frames differ)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                for fi in range(0, max(int(row.n_frames), 1), every_n):
                    img = decode_image(
                        row.payload + fi.to_bytes(4, "big"), row.width, row.height, fake=fake
                    )
                    # label frames with the DECODED dims so pixels always
                    # reshape to (height, width, 3) regardless of metadata
                    out.append(
                        (row.media_id, fi, img.shape[1], img.shape[0], img.tobytes())
                    )
            yield pd.DataFrame(
                out, columns=["media_id", "frame_idx", "width", "height", "pixels"]
            )

    cols = ["media_id", "kind", "mime", "width", "height", "n_frames", "payload"]
    return media.select(*cols).mapInPandas(kernel, FRAME_SCHEMA)


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.IntegerType()),
        T.StructField("n_zero_cross", T.IntegerType()),
    ]
)


def decode_audio(payload: bytes, fake: bool = False) -> np.ndarray:
    """payload → int16 mono PCM samples. STUB like :func:`decode_image`:
    real audio codecs are unavailable here; ``fake=True`` reads the payload
    as headerless little-endian PCM16 (byte pair ``(2k, 2k+1)`` → sample
    ``k``; a trailing odd byte is dropped) — closed-form over the payload
    bytes, so a SQL oracle replays it exactly."""
    if not fake:
        raise NotImplementedError(
            "No audio codec available in this environment; pass fake=True for "
            "the deterministic raw-PCM16 decoder (tests), or deploy with "
            "soundfile/librosa and replace this branch."
        )
    buf = np.frombuffer(payload, dtype=np.uint8)
    n = (buf.size // 2) * 2
    if n == 0:
        raise ValueError("decode_audio: payload shorter than one sample")
    return buf[:n].view("<i2").astype(np.int64)


def extract_audio_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Per-clip waveform features — RMS level, peak amplitude, zero
    crossings (the speech/silence/clipping triage every audio-corpus
    ingest runs before the expensive ASR/embedding stage). Streaming
    ``mapInPandas``, one pass per payload, no shuffle."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                s = decode_audio(row.payload, fake=fake)
                rms = float(np.sqrt(np.mean(s.astype(np.float64) ** 2)))
                sign = np.sign(s)
                nz = sign != 0
                zc = int(np.count_nonzero(np.diff(sign[nz]) != 0))
                out.append(
                    (row.media_id, int(s.size), rms, int(np.abs(s).max()), zc)
                )
            yield pd.DataFrame(
                out,
                columns=["media_id", "n_samples", "rms", "peak", "n_zero_cross"],
            )

    cols = ["media_id", "kind", "mime", "width", "height", "n_frames", "payload"]
    return media.select(*cols).mapInPandas(kernel, AUDIO_FEATURE_SCHEMA)


def media_repartition_hint(avg_payload_bytes: int, target_partition_bytes: int = 64 << 20) -> int:
    """Rows per partition so a partition of payloads stays near the target —
    the knob that keeps 100 TB of media from creating 100 GB tasks."""
    return max(1, target_partition_bytes // max(avg_payload_bytes, 1))


def average_hash(media: DataFrame, fake: bool = True, grid: int = 8) -> DataFrame:
    """Per-image perceptual average-hash (aHash): decode → integer grayscale
    sums → ``grid × grid`` block sums → one bit per block
    (block_sum · n_blocks > total_sum) → four 16-bit hash words.

    The visual near-duplicate fingerprint: small pixel perturbations
    (re-encodes, watermark specks) rarely move a block's mean across the
    global mean, so near-identical images land a few Hamming bits apart
    while unrelated images differ in ~half the bits.

    Every step is INTEGER arithmetic (channel sums, block sums, strict
    integer compare — no float mean), so a SQL oracle replays the hash
    bit-for-bit. Blocks partition pixels by ``r·grid // h`` (floor), exact
    for any dimensions. The ``grid²`` bits ship as ``grid²/16`` 16-bit
    words (``w0..w{n-1}``, b = block_r·grid + block_c, word i holds bits
    16i..16i+15 little-endian) rather than one signed 64-bit value: the
    words are non-negative, engine-portable, and are exactly the LSH bands
    :func:`hamming_near_dups` buckets on. ``grid`` must satisfy
    ``grid² % 16 == 0`` (bits pack exactly into words; e.g. 4, 8, 12, 16)
    — both the kernel output and the result schema are derived from it,
    so any accepted ``grid`` yields a consistent DataFrame.

    Same streaming ``mapInPandas`` shape as :func:`extract_features` —
    map-only over payload splits, no shuffle.
    """
    n_blocks = grid * grid
    if grid < 1 or n_blocks % 16 != 0:
        raise ValueError(
            f"grid²={n_blocks} must be a positive multiple of 16 so the hash "
            "bits pack exactly into 16-bit words (e.g. grid = 4, 8, 12, 16)"
        )
    n_words = n_blocks // 16
    word_cols = [f"w{i}" for i in range(n_words)]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                img = decode_image(row.payload, row.width, row.height, fake=fake)
                h, w = img.shape[0], img.shape[1]
                gray = img.astype(np.int64).sum(axis=2)  # (h, w) channel sums
                br = (np.arange(h) * grid) // h
                bc = (np.arange(w) * grid) // w
                blocks = np.zeros((grid, grid), dtype=np.int64)
                np.add.at(blocks, (br[:, None].repeat(w, 1), bc[None, :].repeat(h, 0)), gray)
                total = int(gray.sum())
                bits = (blocks.reshape(-1) * n_blocks > total).astype(np.int64)
                words = [
                    int((bits[16 * i : 16 * (i + 1)] << np.arange(16)).sum())
                    for i in range(n_words)
                ]
                out.append((row.media_id, *words))
            yield pd.DataFrame(out, columns=["media_id", *word_cols])

    schema = T.StructType(
        [T.StructField("media_id", T.LongType())]
        + [T.StructField(c, T.LongType()) for c in word_cols]
    )
    cols = ["media_id", "kind", "mime", "width", "height", "n_frames", "payload"]
    return media.select(*cols).mapInPandas(kernel, schema)


def hamming_near_dups(hashes: DataFrame, max_hamming: int = 8) -> DataFrame:
    """Visual near-duplicate pairs from :func:`average_hash` words via
    Hamming LSH: candidates are pairs agreeing EXACTLY on ≥1 of the
    16-bit words (with W words, a pair within Hamming distance W−1 of
    each other is guaranteed ≥1 untouched word by pigeonhole; distance
    ≤ max_hamming pairs are found with the classic banding probability),
    then verified with the exact Hamming distance (bit_count of per-word
    XORs). The word set is DERIVED from the input's ``w<i>`` columns, so
    any :func:`average_hash` grid size feeds straight in.

    Scale shape: per-word equi-joins (unioned, distinct) — never an
    all-pairs product over the image corpus; the verify step is arithmetic
    on the already-joined pair rows. Returns (id_a < id_b, hamming).
    """
    import re as _re

    words = sorted(
        (c for c in hashes.columns if _re.fullmatch(r"w\d+", c)),
        key=lambda c: int(c[1:]),
    )
    if not words:
        raise ValueError("hashes must carry average_hash word columns w0..wN")
    # materialize the hash table once (optimization r12): the banded view,
    # both candidate-join sides, and the two verify joins would otherwise
    # re-run the upstream decode + hash Python kernel per consumer. EAGER
    # (second pass): the consumers are concurrent branches of ONE job
    # (self-join sides), so a lazy checkpoint lets them race and recompute
    # the decode before the cache fills. The table is one row of W small
    # ints per image — the cheapest possible thing to pin against the most
    # expensive thing in the plan.
    hashes = hashes.localCheckpoint()
    # one pass builds all W bands via explode (optimization r12, second
    # pass) — the previous union of W selects evaluated its input W times
    # (W plan subtrees, W cache reads)
    banded = hashes.select(
        F.col("media_id"),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("band"), F.col(w).alias("key"))
                    for i, w in enumerate(words)
                ]
            )
        ).alias("__bk"),
    ).select(
        "media_id", F.col("__bk.band").alias("band"), F.col("__bk.key").alias("key")
    )
    a = banded.select(
        F.col("media_id").alias("id_a"), "band", "key"
    )
    b = banded.select(F.col("media_id").alias("id_b"), "band", "key")
    cand = (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    ha = hashes.select(
        F.col("media_id").alias("id_a"), *[F.col(w).alias(f"a{w}") for w in words]
    )
    hb = hashes.select(
        F.col("media_id").alias("id_b"), *[F.col(w).alias(f"b{w}") for w in words]
    )
    hamming = sum(
        F.bit_count(F.col(f"a{w}").bitwiseXOR(F.col(f"b{w}"))) for w in words
    )
    return (
        cand.join(ha, "id_a")
        .join(hb, "id_b")
        .select("id_a", "id_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )
