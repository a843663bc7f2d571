"""Parity tests for the pure-NumPy BAL kernels against the reference's
inline unit-test fixtures (see tests/_bal_fixtures.py for provenance)."""

import numpy as np
import pytest
from numpy.testing import assert_array_equal

import _bal_fixtures as fx
from balrog_ray.core import kernels, tables


def test_bal_esti_truth_table():
    """512-case sweep, identical to /root/reference/tests/test_bal_esti.py."""
    result = []
    for fdi in [80, 50]:
        for slope in [-99, -1, 1, 2, 3, 4, 5, 6]:
            for veg in [-99, 1, 2, 3, 4, 5, 6, 7]:
                for dist in [12.5, 37.5, 62.5, 87.5]:
                    result.append(tables.bal_esti(veg, dist, slope, fdi))
    assert result == fx.BAL_ESTI_EXPECT


def test_bal_lut_matches_scalar_rule():
    for fdi in tables.FDI_VALUES:
        for dist in [12.5, 37.5, 49.9, 50.0, 62.5, 87.5]:
            lut = tables.bal_lut(fdi, dist)
            for si, s in enumerate(tables.SLOPE_KEYS):
                for vi, v in enumerate(tables.VEG_KEYS):
                    assert lut[si, vi] == tables.bal_esti(v, dist, s, fdi)


def test_find_dist_class():
    result = []
    for limits in fx.DIST_CLASS_LIMITS:
        for dist in [12.5, 37.5, 62.5, 87.5]:
            result.append(int(tables.find_dist_class(dist, limits)))
    assert result == fx.DIST_CLASS_EXPECT


def test_find_dist_class_boundary_is_exclusive():
    # dist exactly equal to a limit falls into the next class
    assert int(tables.find_dist_class(16, [16, 21, 31, 42])) == 2
    assert int(tables.find_dist_class(42, [16, 21, 31, 42])) == 5


def test_neighbour_count():
    result = []
    for i in [1, 3, 5, 7, 9]:
        for jj in [2, 4, 5, 6, 8]:
            for d in ["w", "e", "n", "s", "nw", "ne", "se", "sw"]:
                result.append(kernels.neighbour_count(d, i, jj, 10, 10))
    assert result == fx.ALL_NEIGHB_EXPECT


def test_max_bal():
    arrays = [np.array(a) for a in fx.MAX_BAL_INPUTS]
    assert_array_equal(kernels.max_bal(arrays), np.array(fx.MAX_BAL_EXPECT))


def test_clip_array():
    data = np.arange(49).reshape(7, 7)
    for extent in fx.CLIP_EXTENTS:
        clip = kernels.clip_array(data, 395, 849, 30, 30, extent)
        assert_array_equal(np.array(fx.CLIP_EXPECT), clip)


@pytest.mark.parametrize("a_dir", kernels.DIRECTIONS)
def test_convo_direction(a_dir):
    """8x8 directional-scan fixture from /root/reference/tests/test_convo.py."""
    out = kernels.convo(a_dir, np.array(fx.CONVO_VEG),
                        np.array(fx.CONVO_SLOPE),
                        np.array(fx.CONVO_ASPECT[a_dir]), 25, 80)
    assert_array_equal(out, np.array(fx.CONVO_EXPECT[a_dir], dtype=np.float32))


def test_convo_matches_scalar_reference_loop():
    """Property check: the vectorized scan equals a direct transcription of
    the reference's per-pixel loop semantics on random classified inputs."""
    rng = np.random.default_rng(7)
    rows, cols = 11, 13
    veg = rng.choice([-99, 1, 2, 3, 4, 5, 6, 7], size=(rows, cols)).astype(float)
    slope = rng.choice([-99, 1, 2, 3, 4, 5, 6], size=(rows, cols)).astype(float)
    aspect = rng.choice([1, 2, 3, 4, 5, 6, 7, 8, 9], size=(rows, cols)).astype(float)

    def scalar_convo(a_dir, fdi, pixel_width):
        dire_width = pixel_width if a_dir in "wens" and len(a_dir) == 1 \
            else pixel_width * 1.414
        filter_width = int(np.ceil(100.0 / dire_width))
        sia = kernels.slope_in_aspect(slope, aspect, kernels.DIRE_ASPECT[a_dir])
        dr, dc = kernels.DIR_OFFSETS[a_dir]
        out = np.zeros((rows, cols), np.float32)
        for i in range(rows):
            for j in range(cols):
                n = min(kernels.neighbour_count(a_dir, i, j, rows, cols),
                        filter_width)
                vals = []
                for m in range(1, n + 1):
                    d = (m - 1) * dire_width + 0.5 * dire_width
                    vals.append(tables.bal_esti(
                        veg[i + m * dr, j + m * dc], d,
                        sia[i + m * dr, j + m * dc], fdi))
                out[i, j] = max(vals) if vals else -99
        return out

    for a_dir in ["w", "s", "ne", "sw"]:
        for fdi, pw in [(80, 25), (50, 30), (100, 12.5)]:
            got = kernels.convo(a_dir, veg, slope, aspect, pw, fdi)
            assert_array_equal(got, scalar_convo(a_dir, fdi, pw))


def test_scenario_strip():
    """End-to-end Method-1 scenario (port of tests/test_scenario.py:40-77):
    3x140 classified strip, FDI 80, 25 m pixels, west direction.

    The reference keeps the inputs as binary ArcGIS rasters; we reconstruct
    them from the published expected output's band structure: flat land
    (slope class 1), uniform west aspect (7), vegetation-class bands offset
    one column left of each output band (the west scan reads columns
    j-4..j-1), and slope class 6 from column 120 to drive the flame-zone
    tail.  Under FDI 80 upslope limits, the m=1 neighbour (12.5 m) maps
    veg 1->100, 3->29, 2->40, 5->19, which pins the band layout uniquely."""
    cols = 140
    veg = np.ones((3, cols))
    for lo, hi, cls in [(28, 40, 3), (40, 52, 2), (52, 64, 5), (64, 80, 2),
                        (80, 88, 5), (88, 104, 1), (104, 120, 3),
                        (120, 140, 1)]:
        veg[:, lo:hi] = cls
    slope = np.ones((3, cols))
    slope[:, 120:] = 6.0
    aspect = np.full((3, cols), 7.0)

    expected = np.ones([3, 140])
    expected[:, 0] = -99
    expected[:, 1:29] = 100
    expected[:, 29:41] = 29
    expected[:, 41:53] = 40
    expected[:, 53:65] = 19
    expected[:, 65:81] = 40
    expected[:, 81:89] = 19
    expected[:, 89:105] = 100
    expected[:, 105:121] = 29
    expected[:, 121:140] = 200

    out = kernels.convo("w", veg, slope, aspect, 25, 80)
    assert_array_equal(out, expected)

    # full 8-direction pass + max must run and dominate the west band values
    bands = kernels.compute_bal(veg, slope, aspect, 25, 80)
    assert bands["max"].shape == (3, cols)
    assert np.all(bands["max"][:, 1:] >= out[:, 1:])


def test_convo_out_window_matches_full():
    """out_window computes exactly the sub-rectangle of the full result --
    the core-tile restriction the pipeline uses to skip halo-row output."""
    rng = np.random.default_rng(11)
    rows, cols = 37, 29
    veg = rng.choice([-99, 1, 2, 3, 4, 5, 6, 7],
                     size=(rows, cols)).astype(np.float32)
    slope = rng.choice([-99, 1, 2, 3, 4, 5, 6],
                       size=(rows, cols)).astype(np.float32)
    aspect = rng.choice(range(1, 10), size=(rows, cols)).astype(np.float32)
    for win in [(5, 25, 4, 20), (0, rows, 0, cols), (30, 37, 0, 7)]:
        r0, r1, c0, c1 = win
        for a_dir in ["e", "n", "se", "nw"]:
            full = kernels.convo(a_dir, veg, slope, aspect, 10.0, 80)
            part = kernels.convo(a_dir, veg, slope, aspect, 10.0, 80,
                                 out_window=win)
            assert part.shape == (r1 - r0, c1 - c0)
            assert_array_equal(part, full[r0:r1, c0:c1])
        bands_full = kernels.compute_bal(veg, slope, aspect, 10.0, 80)
        bands_part = kernels.compute_bal(veg, slope, aspect, 10.0, 80,
                                         out_window=win)
        assert_array_equal(bands_part["max"], bands_full["max"][r0:r1, c0:c1])


def test_index_palette_path_is_bit_identical():
    """The uint8 palette-index scan must reproduce the float path
    exactly on every band (max included) -- random classified inputs,
    nodata sprinkled, core-window restriction."""
    from balrog_ray.pipelines.bal_pipeline import BAL_PALETTE

    rng = np.random.default_rng(11)
    H = W = 70
    veg = rng.integers(1, 8, (H, W)).astype(np.float32)
    veg[rng.random((H, W)) < 0.07] = -99.0
    slope = rng.choice([-99.0, 1, 2, 3, 4, 5, 6], (H, W)) \
        .astype(np.float32)
    aspect = rng.integers(1, 10, (H, W)).astype(np.float32)
    for win in (None, (5, 65, 5, 65)):
        f = kernels.compute_bal(veg, slope, aspect, 25.0, 80,
                                out_window=win)
        i = kernels.compute_bal(veg, slope, aspect, 25.0, 80,
                                out_window=win,
                                index_palette=BAL_PALETTE)
        for band in f:
            assert i[band].dtype == np.uint8
            assert_array_equal(BAL_PALETTE[i[band]], f[band])
    # palette validation: NODATA must be first, table values present
    with pytest.raises(ValueError, match="NODATA first"):
        kernels.convo("n", veg, slope, aspect, 25.0, 80,
                      index_palette=np.array([0.0, 12.5]))
    with pytest.raises(ValueError, match="missing BAL table values"):
        kernels.convo("n", veg, slope, aspect, 25.0, 80,
                      index_palette=np.array([-99.0, 12.5]))
