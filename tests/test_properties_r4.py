"""Property-based tests (hypothesis) for the round-4 pure kernels:
segmentation-lattice invariants, Viterbi optimality, STFT energy
conservation, pHash scale invariance."""

from __future__ import annotations

import math
from itertools import combinations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from workbook_exporter_fe_spark.operators.multimodal import (
    _phash_bits,
    spectrogram,
)
from workbook_exporter_fe_spark.operators.unigram import (
    _lattice_expectations,
    _normalize,
    _viterbi,
)

# words over a tiny alphabet so the lattice has rich multi-path structure
_WORDS = st.text(alphabet="abc", min_size=1, max_size=8)


def _model_for(words: list[str]) -> dict[str, float]:
    seed: dict[str, float] = {}
    for w in words:
        for i in range(len(w)):
            for l in range(1, min(3, len(w) - i) + 1):
                seed[w[i : i + l]] = seed.get(w[i : i + l], 0.0) + 1.0
    return _normalize(seed, {p for p in seed if len(p) == 1})


@settings(max_examples=60, deadline=None)
@given(st.lists(_WORDS, min_size=1, max_size=6))
def test_lattice_expected_lengths_cover_word(words):
    """Every segmentation covers the word exactly once, so the expected
    piece counts weighted by piece LENGTH must sum to len(word)."""
    model = _model_for(words)
    for w in words:
        exp, z = _lattice_expectations(w, model, max_len=3)
        assert math.isfinite(z)
        total = sum(e * len(p) for p, e in exp.items())
        assert total == pytest.approx(len(w), abs=1e-9)


@settings(max_examples=60, deadline=None)
@given(st.lists(_WORDS, min_size=1, max_size=6))
def test_viterbi_beats_every_segmentation(words):
    model = _model_for(words)
    for w in words:
        got = _viterbi(w, model, max_len=3, floor=-50.0)
        assert "".join(got) == w
        score = sum(model.get(p, -50.0) for p in got)
        n = len(w)
        for k in range(n):
            for cuts in combinations(range(1, n), k):
                bounds = (0,) + cuts + (n,)
                pieces = [w[a:b] for a, b in zip(bounds, bounds[1:])]
                if all(len(p) <= 3 for p in pieces):
                    alt = sum(model.get(p, -50.0) for p in pieces)
                    assert score >= alt - 1e-9


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-32768, max_value=32767),
        min_size=0,
        max_size=64,
    )
)
def test_spectrogram_parseval(samples):
    """Per non-overlapping boxcar frame, time-domain energy equals
    spectrum energy (Parseval for the real FFT)."""
    s = np.array(samples, dtype=np.float64)
    n_fft = 8
    spec = spectrogram(s, n_fft)
    assert spec.shape == (len(s) // n_fft, n_fft // 2 + 1)
    for i in range(spec.shape[0]):
        frame = s[i * n_fft : (i + 1) * n_fft]
        te = float((frame**2).sum())
        fe = float(
            (spec[i, 0] + spec[i, -1] + 2 * spec[i, 1:-1].sum()) / n_fft
        )
        assert abs(te - fe) <= 1e-6 * max(te, 1.0)


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=2, max_value=12),
    st.integers(min_value=2, max_value=12),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_phash_upscale_invariance(w, h, seed):
    """Exact k× pixel-repeat upscales never change the hash (floor
    arithmetic of the nearest resize + integer luminance weights)."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
    bits = _phash_bits(img.ravel(), w, h)
    for k in (2, 3):
        up = img.repeat(k, axis=0).repeat(k, axis=1)
        assert np.array_equal(
            bits, _phash_bits(up.ravel(), k * w, k * h)
        ), (w, h, k)
