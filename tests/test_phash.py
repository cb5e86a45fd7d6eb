"""Perceptual image hashing + banded-Hamming near-pairs
(operators/multimodal.py image hashes, operators/dedup.py
hamming_banded_pairs)."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from amazon_lookout_for_equipment_python_sdk_spark.operators import (
    dedup as dd,
    multimodal as mm,
)


def _img(seed: int, h: int = 64, w: int = 64) -> np.ndarray:
    rng = np.random.RandomState(seed)
    # smooth-ish structure: random low-res upsampled, so hashes are stable
    base = rng.randint(0, 255, (8, 8, 3), dtype=np.uint8)
    return base.repeat(h // 8, axis=0).repeat(w // 8, axis=1)


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & (2**64 - 1)).count("1")


@pytest.mark.parametrize("method", ["dhash", "ahash", "phash"])
def test_hash_deterministic_and_64bit(method):
    fn = mm._HASHERS[method]
    payload = mm.encode_bmp(_img(1))
    h1, h2 = fn(payload), fn(payload)
    assert h1 == h2
    assert -(2**63) <= h1 < 2**63


@pytest.mark.parametrize("method", ["dhash", "phash"])
def test_hash_resize_invariant(method):
    """The same picture at 2x resolution must hash within a few bits —
    the property that makes perceptual hashes near-dup keys."""
    fn = mm._HASHERS[method]
    img = _img(2)
    big = img.repeat(2, axis=0).repeat(2, axis=1)
    d = _hamming(fn(mm.encode_bmp(img)), fn(mm.encode_bmp(big)))
    assert d <= 3, d


def test_hash_distinct_images_far():
    a = mm.dhash64(mm.encode_bmp(_img(3)))
    b = mm.dhash64(mm.encode_bmp(_img(4)))
    assert _hamming(a, b) > 10


def test_hash_format_invariant_bmp_vs_png():
    """Lossless re-encode (BMP vs PNG) of identical pixels -> identical
    hash: the hash keys pixels, not container bytes."""
    img = _img(5)
    assert mm.dhash64(mm.encode_bmp(img)) == mm.dhash64(mm.encode_png(img))


def test_image_hashes_null_and_garbage_are_null(spark):
    rows = [
        (1, "image", bytearray(mm.encode_bmp(_img(6))), None),
        (2, "image", None, None),
        (3, "image", bytearray(b"not an image"), None),
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    got = {r["media_id"]: r["phash"] for r in mm.image_hashes(df).collect()}
    assert got[1] is not None and got[2] is None and got[3] is None


def test_image_near_pairs_finds_rescaled_twin(spark):
    img = _img(7)
    big = img.repeat(2, axis=0).repeat(2, axis=1)
    rows = [
        (1, "image", bytearray(mm.encode_bmp(img)), None),
        (2, "image", bytearray(mm.encode_bmp(big)), None),
        (3, "image", bytearray(mm.encode_bmp(_img(8))), None),
        (4, "image", bytearray(mm.encode_bmp(_img(9))), None),
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    pairs = mm.image_near_pairs(df, max_hamming=3).collect()
    assert [(r["a"], r["b"]) for r in pairs] == [(1, 2)]


def _brute_pairs(vals: dict[int, int], max_h: int):
    ids = sorted(vals)
    return sorted(
        (a, b, _hamming(vals[a], vals[b]))
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if _hamming(vals[a], vals[b]) <= max_h
    )


@pytest.mark.parametrize("max_bucket", [None, 10_000])
def test_hamming_banded_pairs_exact_vs_bruteforce(spark, max_bucket):
    """Pigeonhole exactness: banded join == brute force for
    max_hamming <= bands-1, on a cluster of near signatures + noise."""
    rng = np.random.RandomState(11)
    base = int(rng.randint(-(2**62), 2**62))
    vals = {}
    for i in range(6):  # cluster: <=3 bits flipped from base
        v = base
        for bit in rng.choice(64, size=i % 4, replace=False):
            v ^= 1 << int(bit)
        vals[i] = np.int64(v).item()
    for i in range(6, 30):  # noise
        vals[i] = int(np.int64(rng.randint(-(2**62), 2**62)))
    df = spark.createDataFrame(list(vals.items()), "id long, sig long")
    got = sorted(
        (r["a"], r["b"], r["hamming"])
        for r in dd.hamming_banded_pairs(
            df, 64, 3, 4, max_bucket=max_bucket
        ).collect()
    )
    assert got == _brute_pairs(vals, 3)


def test_hamming_banded_pairs_validates_args(spark):
    df = spark.createDataFrame([(1, 2)], "id long, sig long")
    with pytest.raises(ValueError, match="raise `bands`"):
        dd.hamming_banded_pairs(df, 64, 5, 4)
    with pytest.raises(ValueError, match="divide"):
        dd.hamming_banded_pairs(df, 64, 3, 5)


def test_image_near_pairs_single_shuffle_plan(spark):
    """Scale shape: uncapped path keeps ONE Exchange (the (band,chunk)
    groupBy) — the binary payloads never shuffle."""
    rows = [(i, "image", bytearray(mm.encode_bmp(_img(i))), None) for i in range(3)]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = mm.image_near_pairs(df, max_bucket=None)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan


def _tone_clip(freqs, rate=8000, secs=1.0, seed=None):
    import numpy as np

    t = np.arange(int(rate * secs)) / rate
    x = sum(np.sin(2 * np.pi * f * t) * a for f, a in freqs)
    if seed is not None:
        rng = np.random.RandomState(seed)
        x = x + rng.normal(0, 0.01, len(t))
    x = (x / np.max(np.abs(x)) * 20000).astype(np.int16)
    return mm.encode_wav(x[:, None], rate)


def test_audio_fingerprint_deterministic_and_robust():
    clip = _tone_clip([(440, 1.0), (880, 0.5)], seed=1)
    h1, h2 = mm.audio_fingerprint64(clip), mm.audio_fingerprint64(clip)
    assert h1 == h2 and -(2**63) <= h1 < 2**63
    # lossy ADPCM round trip: few bits flip
    samples, rate = mm.decode_audio(clip)
    lossy = mm.encode_wav_ima_adpcm(samples, rate)
    d = _hamming(h1, mm.audio_fingerprint64(lossy))
    assert d <= 2, d
    # different content: far
    other = mm.audio_fingerprint64(_tone_clip([(523, 1.0), (1320, 0.8)], seed=2))
    assert _hamming(h1, other) > 8


def test_audio_near_pairs_finds_reencoded_twin(spark):
    clip = _tone_clip([(440, 1.0), (880, 0.5)], seed=3)
    samples, rate = mm.decode_audio(clip)
    lossy = mm.encode_wav_ima_adpcm(samples, rate)
    rows = [
        (1, "audio", bytearray(clip), None),
        (2, "audio", bytearray(lossy), None),
        (3, "audio", bytearray(_tone_clip([(600, 1.0)], seed=4)), None),
        (4, "audio", bytearray(b"RIFFgarbage"), None),
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    pairs = mm.audio_near_pairs(df, max_hamming=3, bands=4).collect()
    assert [(r["a"], r["b"]) for r in pairs] == [(1, 2)]


def _clip(seed, n_frames=6):
    """Y4M clip: static footage + tiny deterministic per-frame noise —
    the near-dup shape is same-footage-different-encode, not motion
    (dHash is deliberately not translation invariant)."""
    base = _img(seed, 32, 32).astype(np.int16)
    rng = np.random.RandomState(seed * 7 + 1)
    frames = [
        np.clip(base + rng.randint(-6, 7, base.shape), 0, 255).astype(np.uint8)
        for _ in range(n_frames)
    ]
    return mm.encode_y4m(frames, fps=5)


def test_video_fingerprint_majority_stability():
    clip = _clip(21)
    h1 = mm.video_fingerprint64(clip)
    assert h1 == mm.video_fingerprint64(clip)
    # dropped last frame: majority hash moves at most a few bits
    frames, fps = mm.decode_y4m(clip)
    shorter = mm.encode_y4m(frames[:-1], fps=fps)
    assert _hamming(h1, mm.video_fingerprint64(shorter)) <= 3
    # different footage: far
    other = mm.video_fingerprint64(_clip(22))
    assert _hamming(h1, other) > 10


def test_video_near_pairs(spark):
    clip = _clip(23)
    frames, fps = mm.decode_y4m(clip)
    trimmed = mm.encode_y4m(frames[:-1], fps=fps)
    rows = [
        (1, "video", bytearray(clip), None),
        (2, "video", bytearray(trimmed), None),
        (3, "video", bytearray(_clip(24)), None),
        (4, "video", None, None),
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    pairs = mm.video_near_pairs(df).collect()
    assert [(r["a"], r["b"]) for r in pairs] == [(1, 2)]
