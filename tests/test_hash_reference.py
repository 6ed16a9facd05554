"""Independent reference for Spark's xxhash64 (the only rows-only-checked
primitive in the query surface): a from-spec pure-Python XXH64
(public algorithm, https://github.com/Cyan4973/xxHash spec) must equal
Spark's builtin on strings and ints, and the minhash/simhash pipelines
must equal a NumPy/Python recomputation built on it."""

import numpy as np
import pytest
from pyspark.sql import functions as F

M = (1 << 64) - 1
P1, P2, P3, P4, P5 = (
    0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
    0x85EBCA77C2B2AE63, 0x27D4EB2F165667C5,
)


def _rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & M


def _round(acc, inp):
    acc = (acc + inp * P2) & M
    return (_rotl(acc, 31) * P1) & M


def _merge(acc, val):
    acc ^= _round(0, val)
    return (acc * P1 + P4) & M


def xxh64(data: bytes, seed: int = 42) -> int:
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & M
        v2 = (seed + P2) & M
        v3 = seed & M
        v4 = (seed - P1) & M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8:i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16:i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & M
        h = _merge(h, v1)
        h = _merge(h, v2)
        h = _merge(h, v3)
        h = _merge(h, v4)
    else:
        h = (seed + P5) & M
    h = (h + n) & M
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i:i + 8], "little"))
        h = (_rotl(h, 27) * P1 + P4) & M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], "little") * P1) & M
        h = (_rotl(h, 23) * P2 + P3) & M
        i += 4
    while i < n:
        h ^= (data[i] * P5) & M
        h = (_rotl(h, 11) * P1) & M
        i += 1
    h ^= h >> 33
    h = (h * P2) & M
    h ^= h >> 29
    h = (h * P3) & M
    h ^= h >> 32
    return h


def _signed(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def xxhash64_spark(*args, seed: int = 42) -> int:
    """Spark's XxHash64 expression: fold each argument into the running
    hash (strings: XXH64 of UTF-8 bytes; ints: XXH64 of 4-byte LE;
    longs: 8-byte LE), using the running hash as the seed."""
    h = seed
    for a in args:
        if isinstance(a, str):
            h = xxh64(a.encode("utf-8"), h)
        elif isinstance(a, (int, np.integer)):
            # Spark IntegerType hashes as 4-byte LE (verified vs the
            # builtin); LongType would be 8-byte
            h = xxh64(int(a).to_bytes(4, "little", signed=True), h)
        else:
            raise TypeError(type(a))
    return _signed(h)


@pytest.mark.parametrize("s", ["", "a", "abc", "hello world", "x" * 31,
                               "y" * 32, "z" * 100])
def test_xxh64_matches_spark_strings(spark, s):
    got = spark.sql(f"SELECT xxhash64('{s}') v").collect()[0]["v"]
    assert got == xxhash64_spark(s)


@pytest.mark.parametrize("k", [0, 1, 7, 15])
def test_xxh64_matches_spark_string_int(spark, k):
    got = spark.sql(f"SELECT xxhash64('shingle text', {k}) v").collect()[0]["v"]
    assert got == xxhash64_spark("shingle text", k)


def test_minhash_matches_python_reference(spark):
    from fruits_spark.pipeline import minhash_signatures

    docs = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog"),
         (1, "pack my box with five dozen liquor jugs")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in
           minhash_signatures(docs, n_hashes=4).collect()}
    for doc_id, text in ((0, "the quick brown fox jumps over the lazy dog"),
                         (1, "pack my box with five dozen liquor jugs")):
        ws = text.lower().split(" ")
        shingles = {" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)}
        for k in range(4):
            want = min(xxhash64_spark(s, k) for s in shingles)
            assert got[doc_id][f"mh{k}"] == want


def test_simhash_matches_python_reference(spark):
    from fruits_spark.pipeline import simhash

    text = "some words repeated words for the simhash bits test words"
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    got = simhash(docs, bits=32).collect()[0]["simhash"]
    want = 0
    words = text.lower().split(" ")
    for bit in range(32):
        s = sum(
            1 if (xxhash64_spark(w) >> bit) % 2 != 0 else -1 for w in words
        )
        if s > 0:
            want += 1 << bit
    assert got == want


def _xxh64_longs(vals, seed: int = 42) -> int:
    """Spark xxhash64 over LongType columns: 8-byte LE chaining."""
    h = seed
    for v in vals:
        h = xxh64(int(v).to_bytes(8, "little", signed=True), h)
    return _signed(h)


def test_minhash_banding_matches_python_reference(spark):
    from fruits_spark.pipeline import minhash_lsh_candidates

    texts = [
        "the quick brown fox jumps over the lazy dog tonight",
        "the quick brown fox jumps over the lazy dog today",
        "pack my box with five dozen liquor jugs right now",
        "completely different words that share nothing at all here",
    ]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {(r["doc_a"], r["doc_b"]) for r in
           minhash_lsh_candidates(docs, n_hashes=8, bands=4).collect()}

    # python recomputation on the XXH64 reference
    def sig(text, k):
        ws = text.lower().split(" ")
        shingles = {" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)}
        return min(xxhash64_spark(s, k) for s in shingles)

    bands = {}
    rows = 8 // 4
    for d, t in enumerate(texts):
        s = [sig(t, k) for k in range(8)]
        for b in range(4):
            key = (b, _xxh64_longs(s[b * rows:(b + 1) * rows]))
            bands.setdefault(key, []).append(d)
    want = set()
    for key, ds in bands.items():
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                want.add((ds[i], ds[j]))
    assert got == want
    assert (0, 1) in want, "near-identical docs must be candidates"


def test_jaccard_stop_shingle_cap(spark):
    from fruits_spark.pipeline import jaccard_pairs

    # every doc shares the stop shingle "a b c"; only 0/1 truly overlap
    texts = [
        "a b c d e f g h",
        "a b c d e f g x",
        "a b c q r s t u",
        "a b c v w y z k",
    ]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    exact = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in
             jaccard_pairs(docs, threshold=0.05).collect()}
    # generous cap keeps everything -> identical to exact
    capped_hi = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in
                 jaccard_pairs(docs, threshold=0.05,
                               max_shingle_freq=10).collect()}
    assert exact == capped_hi
    # cap=2 drops the 4-doc stop shingle; only genuine overlap survives
    capped = {(r["doc_a"], r["doc_b"]) for r in
              jaccard_pairs(docs, threshold=0.05,
                            max_shingle_freq=2).collect()}
    assert (0, 1) in capped
    assert all(p in exact for p in capped)
    assert len(capped) < len(exact)
