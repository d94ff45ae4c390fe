"""Perceptual image hashing (dHash) and cross-container near-duplicate
image detection.

Training corpora carry the *same* image re-encoded many ways — PNG vs BMP
vs JPEG, different quality settings — so byte-level dedup (sha over the
payload) misses most image duplicates.  dHash ("difference hash", public
domain technique popularized by Krawetz's "Kind of Like That" blog post)
compares each pixel of a 9×8 grayscale thumbnail with its right neighbour,
giving a 64-bit signature that is invariant to container, scale, and mild
lossy re-encoding, while distinct images land ~32 bits apart.

Spark shape: hashing is a map-only Arrow ``mapInPandas`` stage over the
payload column (pixels never shuffle, never hit the driver — only the
8-byte signature leaves the stage); pairing reuses the capped Hamming
banding from :func:`evalidate_spark.functions.dedup.hamming_candidates`,
so the whole pipeline is signature-sized after the first stage — the same
scan-once/shuffle-tiny design as text MinHash.  With ``n_chunks=8`` every
pair within Hamming distance 7 is caught deterministically (pigeonhole
over 8-bit bands).

No SQL oracle is possible (decode + DCT-free thumbnailing aren't
SQL-expressible); correctness is pytest-verified instead: container
invariance (PNG ≡ BMP ≡ JPEG-decode of the same pixels), JPEG re-encode
proximity, distinct-image separation, and exact recall on an injected
duplicate corpus.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from . import codecs
from .dedup import hamming_candidates

_GRAY = np.array([0.299, 0.587, 0.114])  # ITU-R BT.601 luma


def _box_means(g: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Exact area-average resize of a 2-D float array to (th, tw) via a
    padded integral image — deterministic, no interpolation library."""
    if g.shape[0] < th:
        g = np.repeat(g, -(-th // g.shape[0]), axis=0)
    if g.shape[1] < tw:
        g = np.repeat(g, -(-tw // g.shape[1]), axis=1)
    h, w = g.shape
    s = np.zeros((h + 1, w + 1))
    s[1:, 1:] = g.cumsum(0).cumsum(1)
    re = (np.arange(th + 1) * h) // th
    ce = (np.arange(tw + 1) * w) // tw
    tot = (
        s[re[1:, None], ce[None, 1:]]
        - s[re[:-1, None], ce[None, 1:]]
        - s[re[1:, None], ce[None, :-1]]
        + s[re[:-1, None], ce[None, :-1]]
    )
    area = (re[1:] - re[:-1])[:, None] * (ce[1:] - ce[:-1])[None, :]
    return tot / area


def dhash64(px: np.ndarray) -> int:
    """uint8 ``[H, W, 3]`` RGB pixels → 64-bit dHash as a SIGNED int (the
    value Spark stores in a ``bigint`` column): luma → 9×8 box-mean
    thumbnail → bit i = (cell left of i) > (cell right of i), row-major."""
    g = np.asarray(px, dtype=np.float64) @ _GRAY
    m = _box_means(g, 9, 8)
    bits = (m[:, :-1] > m[:, 1:]).ravel()
    v = 0
    for i in np.flatnonzero(bits):
        v |= 1 << int(i)
    return v - (1 << 64) if v >= (1 << 63) else v


def decode_image(payload: bytes) -> Optional[np.ndarray]:
    """Container-dispatch decode (BMP / PNG / baseline JPEG) → pixels, or
    ``None`` for anything this sandbox has no codec for — callers flag,
    never crash the stage."""
    payload = payload or b""
    try:
        if payload[:2] == b"BM":
            return codecs.decode_bmp(payload)
        if payload[: len(codecs.PNG_SIGNATURE)] == codecs.PNG_SIGNATURE:
            return codecs.decode_png(payload)
        if payload[:3] == b"\xff\xd8\xff":
            return codecs.decode_jpeg(payload)
    except Exception:
        return None
    return None


DHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("dhash", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("decoded", T.BooleanType()),
    ]
)


def image_dhash(media: DataFrame) -> DataFrame:
    """Map-only Arrow stage: image rows of a :data:`multimodal.MEDIA_SCHEMA`
    table → ``(media_ref, dhash bigint, width, height, decoded)``.
    Undecodable payloads yield ``dhash = NULL, decoded = false`` (the
    honest-flag contract shared with :mod:`multimodal`)."""
    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            rows = {k.name: [] for k in DHASH_SCHEMA.fields}
            for ref, kind, payload in zip(
                pdf["media_ref"], pdf["media_kind"], pdf["payload"]
            ):
                if kind != "image":
                    continue
                px = decode_image(bytes(payload) if payload is not None else b"")
                rows["media_ref"].append(ref)
                if px is None:
                    rows["dhash"].append(None)
                    rows["width"].append(None)
                    rows["height"].append(None)
                    rows["decoded"].append(False)
                else:
                    rows["dhash"].append(dhash64(px))
                    rows["width"].append(px.shape[1])
                    rows["height"].append(px.shape[0])
                    rows["decoded"].append(True)
            pdf_out = pd.DataFrame(rows)
            pdf_out["dhash"] = pdf_out["dhash"].astype("Int64")
            pdf_out["width"] = pdf_out["width"].astype("Int32")
            pdf_out["height"] = pdf_out["height"].astype("Int32")
            yield pdf_out

    return media.mapInPandas(batches, schema=DHASH_SCHEMA)


def image_near_dups(
    media: DataFrame,
    max_hamming: int = 6,
    max_bucket: int = 64,
    n_chunks: int = 8,
) -> DataFrame:
    """Cross-container near-duplicate image pairs:
    ``(id_a, id_b, hamming, truncated)`` with ``hamming <= max_hamming``.

    Pipeline: :func:`image_dhash` (map-only, pixels stay put) →
    :func:`dedup.hamming_candidates` banding on the 8-byte signatures
    (capped buckets, one small shuffle) → exact-Hamming filter.  With the
    default ``n_chunks=8``, recall is exact for ``max_hamming <= 7``."""
    hashed = image_dhash(media).filter(F.col("decoded"))
    pairs = hamming_candidates(
        hashed, id_col="media_ref", sig_col="dhash",
        n_chunks=n_chunks, max_bucket=max_bucket,
    )
    return pairs.filter(F.col("hamming") <= max_hamming)


def transcode_images(media: DataFrame, container: str = "png") -> DataFrame:
    """Re-encode every decodable image payload into *container*
    (``png`` | ``bmp`` | ``jpeg``) inside the Arrow batch loop — the
    normalize-the-container step of an image-dedup pipeline, and the
    duplicate-injection tool for its tests.  Non-image or undecodable rows
    pass through unchanged with ``meta['transcode'] = 'skipped'``."""
    import pandas as pd

    if container not in ("png", "bmp", "jpeg"):
        raise ValueError(f"unknown container {container!r}")

    def _enc(px: np.ndarray) -> bytes:
        if container == "png":
            return codecs.encode_png(px)
        if container == "bmp":
            return codecs.encode_bmp(px)
        return codecs.encode_jpeg(px, quality=85)

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            payloads, metas = [], []
            for kind, p, m in zip(pdf["media_kind"], pdf["payload"], pdf["meta"]):
                meta = dict(m) if isinstance(m, dict) else {}
                px = (
                    decode_image(bytes(p) if p is not None else b"")
                    if kind == "image"
                    else None
                )
                if px is None:
                    payloads.append(p)
                    meta["transcode"] = "skipped"
                else:
                    payloads.append(_enc(px))
                    meta["transcode"] = container
                metas.append(meta)
            out = pdf.copy()
            out["payload"] = payloads
            out["meta"] = metas
            yield out

    return media.mapInPandas(batches, schema=media.schema)


# ------------------------------------------------------------------ audio
def spechash64(
    samples: np.ndarray,
    rate: int,
    f_lo: float = 50.0,
    f_hi: float = 2000.0,
    floor: float = 1e-4,
) -> int:
    """64-bit spectral fingerprint of a PCM signal — the audio analogue of
    :func:`dhash64`: power spectrum → 65 log-spaced bands between *f_lo*
    and *f_hi* Hz (≈ one musical semitone per band) → bit i =
    (band i energy) > (band i+1 energy), over TOTAL-energy-normalised,
    floor-clamped band energies.

    Invariances (by construction, pytest-verified): gain/volume scaling
    (normalisation), duration change of stationary content (relative
    energies), resampling (bands in absolute Hz).  The *floor* clamp makes
    comparisons between noise-only bands deterministically False instead
    of quantization-noise coin flips.  Resolution limit, stated honestly:
    content whose spectra differ only WITHIN one log band (< ~5.9%
    frequency shift) can collide; sparse spectra (pure tones) populate few
    bands, so distinct tones sit only a few bits apart — use a tight
    ``max_hamming`` for tonal corpora, wider for broadband content."""
    x = np.asarray(samples, dtype=np.float64)
    if x.size < 2:
        x = np.pad(x, (0, 2 - x.size))
    spec = np.abs(np.fft.rfft(x)) ** 2
    freqs = np.fft.rfftfreq(x.size, 1.0 / rate)
    edges = f_lo * (f_hi / f_lo) ** (np.arange(66) / 65)
    idx = np.searchsorted(edges, freqs)
    e = np.zeros(65)
    np.add.at(e, np.clip(idx - 1, 0, 64), np.where((idx >= 1) & (idx <= 65), spec, 0.0))
    tot = e.sum()
    if tot <= 0:
        return 0  # silence / empty: canonical zero fingerprint
    e = np.maximum(e / tot, floor)
    v = 0
    for i in np.flatnonzero(e[:-1] > e[1:]):
        v |= 1 << int(i)
    return v - (1 << 64) if v >= (1 << 63) else v


SPECHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("spechash", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("decoded", T.BooleanType()),
    ]
)


def audio_spechash(media: DataFrame) -> DataFrame:
    """Map-only Arrow stage: audio rows → ``(media_ref, spechash bigint,
    sample_rate, decoded)``; undecodable payloads flagged NULL/false."""
    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            rows = {k.name: [] for k in SPECHASH_SCHEMA.fields}
            for ref, kind, payload in zip(
                pdf["media_ref"], pdf["media_kind"], pdf["payload"]
            ):
                if kind != "audio":
                    continue
                rows["media_ref"].append(ref)
                try:
                    samples, rate = codecs.decode_wav(
                        bytes(payload) if payload is not None else b""
                    )
                    rows["spechash"].append(spechash64(samples, rate))
                    rows["sample_rate"].append(rate)
                    rows["decoded"].append(True)
                except Exception:
                    rows["spechash"].append(None)
                    rows["sample_rate"].append(None)
                    rows["decoded"].append(False)
            out = pd.DataFrame(rows)
            out["spechash"] = out["spechash"].astype("Int64")
            out["sample_rate"] = out["sample_rate"].astype("Int32")
            yield out

    return media.mapInPandas(batches, schema=SPECHASH_SCHEMA)


def audio_near_dups(
    media: DataFrame,
    max_hamming: int = 2,
    max_bucket: int = 64,
    n_chunks: int = 8,
) -> DataFrame:
    """Near-duplicate audio pairs (gain-scaled / resampled / re-trimmed
    copies): :func:`audio_spechash` → the shared capped Hamming banding →
    exact-distance filter.  Sparse (tonal) spectra concentrate hash mass
    in few bits, making the all-zero chunk value a hot bucket — the
    ``max_bucket`` cap bounds that skew and flags affected pairs
    ``truncated`` rather than letting one bucket explode quadratically."""
    hashed = audio_spechash(media).filter(F.col("decoded"))
    pairs = hamming_candidates(
        hashed, id_col="media_ref", sig_col="spechash",
        n_chunks=n_chunks, max_bucket=max_bucket,
    )
    return pairs.filter(F.col("hamming") <= max_hamming)


def audio_gain(media: DataFrame, gain: float = 0.25) -> DataFrame:
    """Re-encode every decodable WAV payload with its samples scaled by
    *gain* (int16-clipped) — the duplicate-injection tool for audio-dedup
    tests, and a minimal real audio transform.  Non-audio/undecodable rows
    pass through with ``meta['gain'] = 'skipped'``."""
    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            payloads, metas = [], []
            for kind, p, m in zip(pdf["media_kind"], pdf["payload"], pdf["meta"]):
                meta = dict(m) if isinstance(m, dict) else {}
                try:
                    if kind != "audio":
                        raise ValueError("not audio")
                    samples, rate = codecs.decode_wav(
                        bytes(p) if p is not None else b""
                    )
                    scaled = np.clip(
                        np.round(samples.astype(np.float64) * gain),
                        -32768, 32767,
                    ).astype(np.int16)
                    payloads.append(codecs.encode_wav(scaled, rate))
                    meta["gain"] = str(gain)
                except Exception:
                    payloads.append(p)
                    meta["gain"] = "skipped"
                metas.append(meta)
            out = pdf.copy()
            out["payload"] = payloads
            out["meta"] = metas
            yield out

    return media.mapInPandas(batches, schema=media.schema)


# ------------------------------------------------------------------ video
FRAMEHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("frame_ix", T.IntegerType()),
        T.StructField("dhash", T.LongType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("decoded", T.BooleanType()),
    ]
)


def video_framehash(media: DataFrame) -> DataFrame:
    """Map-only Arrow stage: video rows → one ``(media_ref, frame_ix,
    dhash, n_frames, decoded)`` row per decoded frame (:func:`dhash64` on
    each frame's pixels).  Undecodable videos emit a single flagged row so
    they stay visible downstream.  Frame pixels never leave the stage —
    only 8-byte signatures shuffle."""
    import pandas as pd

    from . import avi

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            rows = {k.name: [] for k in FRAMEHASH_SCHEMA.fields}
            for ref, kind, payload in zip(
                pdf["media_ref"], pdf["media_kind"], pdf["payload"]
            ):
                if kind != "video":
                    continue
                payload = bytes(payload) if payload is not None else b""
                frames = None
                if avi.is_avi(payload):
                    try:
                        frames, _fps = avi.decode_avi(payload)
                    except Exception:
                        frames = None
                if frames:
                    for ix, px in enumerate(frames):
                        rows["media_ref"].append(ref)
                        rows["frame_ix"].append(ix)
                        rows["dhash"].append(dhash64(px))
                        rows["n_frames"].append(len(frames))
                        rows["decoded"].append(True)
                else:
                    rows["media_ref"].append(ref)
                    rows["frame_ix"].append(None)
                    rows["dhash"].append(None)
                    rows["n_frames"].append(None)
                    rows["decoded"].append(False)
            out = pd.DataFrame(rows)
            out["frame_ix"] = out["frame_ix"].astype("Int32")
            out["dhash"] = out["dhash"].astype("Int64")
            out["n_frames"] = out["n_frames"].astype("Int32")
            yield out

    return media.mapInPandas(batches, schema=FRAMEHASH_SCHEMA)


def video_near_dups(
    media: DataFrame,
    max_hamming: int = 6,
    min_shared: float = 0.5,
    max_bucket: int = 64,
    n_chunks: int = 8,
) -> DataFrame:
    """Near-duplicate VIDEO pairs via frame-level perceptual hashes:
    ``(id_a, id_b, shared_frames, n_a, n_b, score)`` where *score* =
    (matched frames on the smaller side) / min(n_a, n_b), kept when
    ``score >= min_shared``.

    Pipeline: :func:`video_framehash` (map-only; one 8-byte signature per
    frame) → the shared capped Hamming banding over (video, frame) struct
    ids → frame pairs within *max_hamming*, same-video pairs dropped →
    per-video-pair roll-up counting DISTINCT matched frames on each side.
    A re-encoded copy (DIB → MJPEG) matches frame-for-frame at small
    Hamming; unrelated footage shares ~no frames.  Everything after the
    first stage is signature-sized; the quadratic risk inside one hash
    bucket is bounded by *max_bucket* exactly as for text/image dedup."""
    fh = video_framehash(media).filter(F.col("decoded"))
    sigs = fh.select(
        F.struct(F.col("media_ref"), F.col("frame_ix")).alias("fid"),
        "dhash",
    )
    fp = hamming_candidates(
        sigs, id_col="fid", sig_col="dhash",
        n_chunks=n_chunks, max_bucket=max_bucket,
    ).filter(F.col("hamming") <= max_hamming)
    # struct ordering sorts by media_ref first, so id_a.media_ref <=
    # id_b.media_ref — cross-video pairs are already canonically oriented
    vp = fp.select(
        F.col("id_a.media_ref").alias("id_a"),
        F.col("id_a.frame_ix").alias("fa"),
        F.col("id_b.media_ref").alias("id_b"),
        F.col("id_b.frame_ix").alias("fb"),
    ).filter(F.col("id_a") != F.col("id_b"))
    matched = vp.groupBy("id_a", "id_b").agg(
        F.countDistinct("fa").alias("__ma"),
        F.countDistinct("fb").alias("__mb"),
    )
    counts = fh.groupBy("media_ref").agg(F.max("n_frames").alias("__n"))
    scored = (
        matched.join(counts.withColumnRenamed("media_ref", "id_a"), "id_a")
        .withColumnRenamed("__n", "n_a")
        .join(counts.withColumnRenamed("media_ref", "id_b"), "id_b")
        .withColumnRenamed("__n", "n_b")
        .select(
            "id_a",
            "id_b",
            F.least("__ma", "__mb").alias("shared_frames"),
            "n_a",
            "n_b",
            F.round(
                F.least("__ma", "__mb") / F.least("n_a", "n_b"), 6
            ).alias("score"),
        )
    )
    return scored.filter(F.col("score") >= min_shared)


def transcode_video(
    media: DataFrame, container: str = "mjpeg", quality: int = 85
) -> DataFrame:
    """Re-encode every decodable AVI payload as *container*
    (``mjpeg`` — lossy — or ``dib`` — bit-exact), preserving fps — the
    duplicate-injection transform for video dedup and the
    normalize-the-codec step of a media pipeline.  Non-video or
    undecodable rows pass through with ``meta['transcode'] = 'skipped'``."""
    import pandas as pd

    from . import avi

    if container not in ("mjpeg", "dib"):
        raise ValueError(f"unknown container {container!r}")

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            payloads, metas = [], []
            for kind, p, m in zip(pdf["media_kind"], pdf["payload"], pdf["meta"]):
                meta = dict(m) if isinstance(m, dict) else {}
                try:
                    if kind != "video":
                        raise ValueError("not video")
                    frames, fps = avi.decode_avi(bytes(p) if p is not None else b"")
                    if not frames:
                        raise ValueError("no frames")
                    fps_i = max(1, int(round(fps)))
                    if container == "mjpeg":
                        payloads.append(
                            avi.encode_avi_mjpeg(frames, fps=fps_i, quality=quality)
                        )
                    else:
                        payloads.append(avi.encode_avi_dib(frames, fps=fps_i))
                    meta["transcode"] = container
                except Exception:
                    payloads.append(p)
                    meta["transcode"] = "skipped"
                metas.append(meta)
            out = pdf.copy()
            out["payload"] = payloads
            out["meta"] = metas
            yield out

    return media.mapInPandas(batches, schema=media.schema)
