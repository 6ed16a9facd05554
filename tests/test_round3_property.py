"""Property-based fuzz for the round-3 surfaces: WAV container
round-trips, BPE encode/decode inverses, and carry-mode equivalence on
arbitrary segment shapes.  No Spark session needed — these exercise the
pure kernels / codecs directly."""

import io
import wave

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from fruits_spark.multimodal import wav_blob


@settings(max_examples=40, deadline=None)
@given(
    samples=st.lists(
        st.integers(-32768, 32767), min_size=1, max_size=300
    ),
    sr=st.sampled_from([8000, 16000, 44100]),
)
def test_wav_container_roundtrips_through_stdlib(samples, sr):
    """Any PCM16 payload our writer would emit is readable by the
    stdlib wave module with identical samples — the container format
    itself is fuzz-proof, not just the fixed-formula corpus."""
    pcm = np.array(samples, dtype=np.int16)
    blob = wav_blob(pcm, sr)
    with wave.open(io.BytesIO(blob)) as wf:
        assert wf.getframerate() == sr
        assert wf.getnframes() == len(samples)
        back = np.frombuffer(wf.readframes(len(samples)), dtype="<i2")
    np.testing.assert_array_equal(back, pcm)


@settings(max_examples=25, deadline=None)
@given(
    texts=st.lists(
        st.text(
            alphabet="ab cd",  # tiny alphabet -> dense merge structure
            min_size=0, max_size=60,
        ),
        min_size=1, max_size=8,
    ),
    n_merges=st.integers(0, 40),
)
def test_bpe_encode_decode_inverse(texts, n_merges):
    """Driver-side property of the BPE pair: decoding any encoded word
    sequence recovers exactly the regex-extracted words of the corpus —
    merges never lose or corrupt symbols, at any merge count."""
    import re
    from collections import Counter

    from fruits_spark.pipeline import (
        bpe_encode_word, bpe_merges_from_word_freq, bpe_vocab,
    )

    # the same word_freq form train_bpe_merges builds after its sample
    # collect; from here down everything is the PRODUCTION code path
    word_freq = Counter()
    for t in texts:
        for w in re.findall(r"[a-z]+|[0-9]+", t.lower()):
            word_freq[w] += 1
    if not word_freq:
        return
    merges = bpe_merges_from_word_freq(word_freq, n_merges)
    vocab = bpe_vocab(merges)
    inv = {v: k for k, v in vocab.items()}
    ranks = {p: i for i, p in enumerate(merges)}
    for w in word_freq:
        ids = bpe_encode_word(w, ranks, vocab)
        decoded = "".join(inv[i] for i in ids)
        assert decoded == w + "</w>"


@settings(max_examples=40, deadline=None)
@given(
    lens=st.lists(st.integers(0, 900), min_size=1, max_size=120),
    seed=st.integers(0, 2**31 - 1),
)
def test_carry_modes_equal_any_shape(lens, seed):
    """slice/gather/auto carry variants agree bit-for-bit on arbitrary
    segment shapes, including empty segments."""
    import fruits_spark.kernels.flat as KF

    offsets = np.concatenate(([0], np.cumsum(lens))).astype(np.int64)
    x = np.random.default_rng(seed).normal(size=int(offsets[-1]))
    outs = {}
    orig = KF._CARRY_MODE
    try:
        for mode in ("slice", "gather"):
            KF._CARRY_MODE = mode
            outs[mode] = KF.Seg(offsets).cumsum(x.copy())
    finally:
        KF._CARRY_MODE = orig
    np.testing.assert_array_equal(outs["slice"], outs["gather"])
