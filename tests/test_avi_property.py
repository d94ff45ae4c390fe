"""Property roundtrips for the AVI container: random frame counts, dims,
and fps survive encode→probe (header metadata identity) and, for the
DIB variant, encode→decode bit-exactly.  Complements the fixed-case
matrix in the multimodal tests the way test_mp4.py's property class
covers ISO-BMFF."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from evalidate_spark.functions import avi


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(1, 6),
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    fps=st.integers(1, 60),
    seed=st.integers(0, 2**31 - 1),
)
def test_dib_encode_probe_decode_property(n, h, w, fps, seed):
    rng = np.random.default_rng(seed)
    frames = [
        rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8) for _ in range(n)
    ]
    blob = avi.encode_avi_dib(frames, fps=fps)
    info = avi.probe_avi(blob)
    assert (info.width, info.height, info.n_frames) == (w, h, n)
    assert info.fps == fps and info.n_streams == 1 and not info.has_audio
    assert avi.is_decodable(info)
    decoded, got_fps = avi.decode_avi(blob)
    assert got_fps == fps and len(decoded) == n
    for a, b in zip(decoded, frames):
        assert (a == b).all()


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(1, 4),
    h=st.integers(8, 24),
    w=st.integers(8, 24),
    seed=st.integers(0, 2**31 - 1),
)
def test_mjpeg_probe_property(n, h, w, seed):
    rng = np.random.default_rng(seed)
    frames = [
        rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8) for _ in range(n)
    ]
    blob = avi.encode_avi_mjpeg(frames, fps=4, quality=85)
    info = avi.probe_avi(blob)
    assert (info.width, info.height, info.n_frames) == (w, h, n)
    assert avi.is_decodable(info)
    decoded, _ = avi.decode_avi(blob)
    # lossy: shape identity + rough proximity, never bit equality claims
    assert len(decoded) == n
    for a, b in zip(decoded, frames):
        assert a.shape == b.shape
