"""Property-based invariants (hypothesis): codec round-trips, remap DSL
semantics, convo vs the scalar reference loop on arbitrary inputs."""

import numpy as np
from hypothesis import given, settings, strategies as st

from balrog_ray.core.remap import apply_remap
from balrog_ray.tiles.codec import decode_tile, encode_tile

finite_f32 = st.floats(min_value=-1e4, max_value=1e4, width=32,
                       allow_nan=False)


@st.composite
def small_grid(draw):
    h = draw(st.integers(2, 12))
    w = draw(st.integers(2, 12))
    vals = draw(st.lists(finite_f32, min_size=h * w, max_size=h * w))
    return np.array(vals, dtype=np.float32).reshape(h, w)


@given(small_grid())
@settings(max_examples=40, deadline=None)
def test_npy_npz_roundtrip_lossless(arr):
    for fmt in ("npy", "npz"):
        payload, cap = encode_tile(arr, fmt)
        back = decode_tile(payload, fmt, cap)
        assert np.array_equal(back, arr)


@given(small_grid())
@settings(max_examples=40, deadline=None)
def test_png_roundtrip_psnr(arr):
    payload, cap = encode_tile(arr, "png")
    back = decode_tile(payload, "png", cap)
    rng = float(arr.max() - arr.min())
    if rng == 0.0:
        assert np.allclose(back, arr, atol=1e-3)
        return
    mse = float(np.mean((back.astype(np.float64) - arr) ** 2))
    psnr = 10 * np.log10(rng * rng / mse) if mse > 0 else np.inf
    assert psnr >= 40.0            # the driver's per-row invariant


@given(st.lists(st.floats(min_value=-80, max_value=120, allow_nan=False),
                min_size=1, max_size=64))
@settings(max_examples=60, deadline=None)
def test_remap_dsl_interval_semantics(values):
    """min-inclusive / max-exclusive-with-+0.0001-fudge; NODATA as an
    entry's new value; unmatched values pass through truncated to int
    (sa_tools.py:172-196)."""
    spec = "0 50 1;50.0001 100 2;100.0002 120 NODATA"
    data = np.array(values, dtype=np.float64)
    out = apply_remap(data, spec)
    for v, o in zip(values, out):
        if 0 <= v < 50.0001:
            assert o == 1
        elif 50.0001 <= v < 100.0001:
            assert o == 2
        elif 100.0002 <= v < 120.0001:
            assert o == -99
        else:
            assert o == int(v)      # truncation toward zero, like astype
