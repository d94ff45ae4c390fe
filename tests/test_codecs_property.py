"""Property roundtrips for the zero-dependency codecs: random image
dimensions/content (including the BMP row-padding edge widths) and
random audio lengths/rates must survive encode→decode bit-exactly —
the fixed-size matrix in the codec tests pins known cases, hypothesis
sweeps the dimension space."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from evalidate_spark.functions import codecs


@settings(max_examples=60, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
)
def test_bmp_roundtrip_property(h, w, seed):
    px = np.random.default_rng(seed).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    out = codecs.decode_bmp(codecs.encode_bmp(px))
    assert out.shape == (h, w, 3) and (out == px).all()


@settings(max_examples=60, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
    level=st.integers(0, 9),
)
def test_png_roundtrip_property(h, w, seed, level):
    px = np.random.default_rng(seed).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    out = codecs.decode_png(codecs.encode_png(px, level=level))
    assert out.shape == (h, w, 3) and (out == px).all()


@settings(max_examples=60, deadline=None)
@given(
    n=st.integers(0, 5000),
    rate=st.sampled_from([1, 8000, 44100, 48000]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_property(n, rate, seed):
    samples = np.random.default_rng(seed).integers(
        -(2**15), 2**15, size=n, dtype=np.int16
    )
    got, got_rate = codecs.decode_wav(codecs.encode_wav(samples, rate))
    assert got_rate == rate
    assert got.dtype == np.int16 and (got == samples).all()


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    th=st.integers(1, 24),
    tw=st.integers(1, 24),
    seed=st.integers(0, 2**31 - 1),
)
def test_resize_nearest_property(h, w, th, tw, seed):
    px = np.random.default_rng(seed).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    out = codecs.resize_nearest(px, tw, th)
    assert out.shape == (th, tw, 3)
    # every output pixel is SOME input pixel (nearest-neighbour keeps the
    # palette), and identity resize is exact
    assert set(np.unique(out)) <= set(np.unique(px))
    if (th, tw) == (h, w):
        assert (out == px).all()
