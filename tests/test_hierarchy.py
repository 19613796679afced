import numpy as np
import pytest

from mgard_tpu.hierarchy import Hierarchy


def test_dyadic_levels_3d():
    h = Hierarchy((5, 5, 5))
    assert h.L == 2
    assert h.shapes == ((2, 2, 2), (3, 3, 3), (5, 5, 5))


def test_nondyadic_adds_level():
    # Reference semantics (TensorMeshHierarchy.tpp:57-78): size 6 -> dyadic
    # floor 5 (L_dyadic=2), nondyadic -> L=3.
    h = Hierarchy((6,), placement="reference")
    assert h.L == 3
    assert [s[0] for s in h.shapes] == [2, 3, 5, 6]
    np.testing.assert_array_equal(h.level_indices(2, 0), [0, 1, 2, 3, 5])
    np.testing.assert_array_equal(h.level_indices(1, 0), [0, 2, 5])
    np.testing.assert_array_equal(h.level_indices(0, 0), [0, 5])


def test_nondyadic_tpu_placement():
    # TPU placement: same level shapes, new nodes front-interleaved so the
    # non-dyadic level is pure slices (front_nc set, no gather path).
    h = Hierarchy((6,))
    assert h.L == 3
    assert [s[0] for s in h.shapes] == [2, 3, 5, 6]
    np.testing.assert_array_equal(h.level_indices(2, 0), [0, 2, 3, 4, 5])
    np.testing.assert_array_equal(h.level_indices(1, 0), [0, 3, 5])
    np.testing.assert_array_equal(h.level_indices(0, 0), [0, 5])
    top = h.dims[0][3]
    assert top.front_nc == 2
    np.testing.assert_array_equal(top.new_pos, [1])
    lower = h.dims[0][2]
    assert lower.coarse_is_stride2


def test_front_interleaved_512():
    h = Hierarchy((512,))
    assert h.L == 9
    top = h.dims[0][9]
    assert top.front_nc == 256  # 255 new nodes at odd positions 1..509
    np.testing.assert_array_equal(top.new_pos, np.arange(1, 510, 2))
    for l in range(1, 9):
        assert h.dims[0][l].coarse_is_stride2


def test_mixed_flat_dims():
    h = Hierarchy((1, 9, 5))
    assert h.L == 2
    assert h.shapes[-1] == (1, 9, 5)
    assert h.shapes[0] == (1, 3, 2)
    assert h.effective_ndim == 2


def test_min_level_rule():
    # L = min over non-flat dims of log2(n-1); (5,2): min(2, 0) = 0.
    h = Hierarchy((5, 2))
    assert h.L == 0
    assert h.shapes == (((5, 2)),)


def test_dates_of_birth_1d():
    h = Hierarchy((9,))
    np.testing.assert_array_equal(
        h.dates_of_birth[0], [0, 3, 2, 3, 1, 3, 2, 3, 0])


def test_shuffle_permutation_partitions_by_level():
    h = Hierarchy((5, 5))
    p = h.shuffle_permutation()
    dob = h.date_of_birth_grid().ravel()[p]
    assert (np.diff(dob) >= 0).all()
    counts = h.level_counts()
    assert counts.sum() == h.ndof()
    assert counts[0] == 4  # 2x2 coarse grid


def test_block_specs_cover_everything():
    from mgard_tpu.ops.transform import block_specs
    for shape in [(5,), (6,), (9, 5), (5, 1, 9), (4, 7)]:
        h = Hierarchy(shape)
        specs = block_specs(h)
        total = sum(int(np.prod(bs)) for (_, _, bs, _) in specs)
        assert total == h.ndof(), shape
        # Blocks must tile the fine grid exactly once: paint fine indices.
        seen = np.zeros(h.shape, dtype=int)
        for (l, r, bs, pos) in specs:
            fine_pos = []
            for d in range(h.ndim):
                fine = h.level_indices(l, d)[np.asarray(pos[d])]
                fine_pos.append(fine)
            seen[np.ix_(*fine_pos)] += 1
        assert (seen == 1).all(), shape


def test_nonuniform_coordinates():
    rng = np.random.default_rng(0)
    xs = np.sort(rng.uniform(0, 10, 9))
    h = Hierarchy((9,), coordinates=[xs])
    lev = h.dims[0][h.L]
    np.testing.assert_allclose(lev.x, xs)
    np.testing.assert_allclose(lev.h, np.diff(xs))
    # Volumes: interior (x[i+1]-x[i-1])/2, boundary one-sided half.
    np.testing.assert_allclose(lev.volumes[0], (xs[1] - xs[0]) / 2)
    np.testing.assert_allclose(lev.volumes[4], (xs[5] - xs[3]) / 2)
