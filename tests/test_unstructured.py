"""Unstructured-mesh subsystem tests (reference tests/src/unstructured/:
test_MassMatrix, test_UniformMeshHierarchy, test_norms, test_estimators)."""

import math

import numpy as np
import pytest

from mgard_tpu.unstructured import (
    MeshLevel, UniformMeshHierarchy, compress, decompress, refine_uniform,
    structured_tet_mesh, structured_triangle_mesh)


def _reference_triangle():
    nodes = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    return MeshLevel(nodes=nodes, elements=np.array([[0, 1, 2]]))


def test_mass_matrix_reference_triangle():
    """P1 mass matrix of the unit triangle is A/12 * (ones + I)."""
    mesh = _reference_triangle()
    A = 0.5
    M = np.array([[mesh.mass_matvec(np.eye(3)[i])[j]
                   for j in range(3)] for i in range(3)])
    expected = A / 12.0 * (np.ones((3, 3)) + np.eye(3))
    np.testing.assert_allclose(M, expected, rtol=1e-12)
    np.testing.assert_allclose(mesh.mass_diagonal(), np.diag(expected),
                               rtol=1e-12)


def test_mass_matrix_tet():
    nodes = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1.0]])
    mesh = MeshLevel(nodes=nodes, elements=np.array([[0, 1, 2, 3]]))
    V = 1.0 / 6
    M = np.array([[mesh.mass_matvec(np.eye(4)[i])[j]
                   for j in range(4)] for i in range(4)])
    expected = V / 20.0 * (np.ones((4, 4)) + np.eye(4))
    np.testing.assert_allclose(M, expected, rtol=1e-12)


def test_refine_preserves_total_measure():
    for root in (structured_triangle_mesh(3, 3),
                 structured_tet_mesh((2, 2, 2))):
        fine = refine_uniform(root)
        assert fine.ndof > root.ndof
        np.testing.assert_allclose(fine.measures.sum(),
                                   root.measures.sum(), rtol=1e-12)
        # old node coordinates preserved in place
        np.testing.assert_array_equal(fine.nodes[:root.ndof], root.nodes)
        # midpoints match their parents
        mids = fine.nodes[root.ndof:]
        ep = fine.edge_parents
        np.testing.assert_allclose(
            mids, 0.5 * (root.nodes[ep[:, 0]] + root.nodes[ep[:, 1]]))


def test_decompose_of_linear_function_has_zero_details():
    """Interpolation is exact for affine functions, so all detail
    coefficients vanish (the projection keeps the level-0 part)."""
    hier = UniformMeshHierarchy(structured_triangle_mesh(3, 3), 2)
    fine = hier.meshes[-1]
    u = 2.0 * fine.nodes[:, 0] - 0.5 * fine.nodes[:, 1] + 1.0
    coeffs = np.asarray(hier.decompose(u))
    assert np.max(np.abs(coeffs[hier.ndof(0):])) < 1e-8


@pytest.mark.parametrize("builder,L", [
    (lambda: structured_triangle_mesh(3, 3), 2),
    (lambda: structured_tet_mesh((2, 2, 2)), 1),
])
def test_decompose_recompose_roundtrip(builder, L):
    hier = UniformMeshHierarchy(builder(), L)
    rng = np.random.default_rng(7)
    u = rng.standard_normal(hier.ndof())
    out = np.asarray(hier.recompose(hier.decompose(u)))
    np.testing.assert_allclose(out, u, atol=1e-7)


def test_norms_basic():
    hier = UniformMeshHierarchy(structured_triangle_mesh(3, 3), 2)
    u = np.ones(hier.ndof())
    # ||1||_L2 over the unit square is 1
    assert abs(hier.norm(u, 0.0) - 1.0) < 1e-9
    assert hier.norm(u, math.inf) == 1.0
    # s-norm of a constant equals its L2 norm (all details vanish)
    assert abs(hier.norm(u, 0.5) - 1.0) < 1e-7


def test_estimator_reliability():
    """norm(u, s) <= reliability-scaled estimator of the coefficients
    (reference estimators.cpp contract)."""
    hier = UniformMeshHierarchy(structured_triangle_mesh(3, 3), 2)
    rng = np.random.default_rng(3)
    u = rng.standard_normal(hier.ndof())
    s = 0.5
    est = hier.estimator(hier.decompose(u), s)
    realism, reliability = hier.estimator_bounds(s)
    norm = hier.norm(u, s)
    assert norm <= reliability * est / math.sqrt(realism) * 1.0001
    assert est > 0


@pytest.mark.parametrize("s,tol", [(0.0, 0.1), (0.0, 0.01), (1.0, 0.05)])
def test_compress_error_bound(s, tol):
    hier = UniformMeshHierarchy(structured_triangle_mesh(3, 3), 2)
    fine = hier.meshes[-1]
    x, y = fine.nodes[:, 0], fine.nodes[:, 1]
    u = np.sin(3 * x) * np.cos(2 * y) + 0.3 * x * y
    buf = compress(hier, u, s=s, tolerance=tol)
    out = decompress(hier, buf)
    err = hier.norm(u - out, s)
    assert err <= tol, (err, tol)
    assert len(buf) < u.nbytes


def test_compress_rejects_linf():
    hier = UniformMeshHierarchy(structured_triangle_mesh(3, 3), 1)
    with pytest.raises(ValueError):
        compress(hier, np.zeros(hier.ndof()), s=math.inf, tolerance=0.1)


def test_msh_loader_and_golden_coefficients():
    """Load the reference's circle.msh fixture, refine twice, decompose,
    and check the multilevel coefficients against the reference's golden
    output (tests/outputs/circle_L=2_coefficients.txt) — nodes matched
    by coordinates like the reference's own test
    (tests/src/unstructured/test_UniformMeshHierarchy.cpp:129-170)."""
    import pathlib

    from mgard_tpu.unstructured.mesh import load_msh

    ref = pathlib.Path("/root/reference/tests")
    if not (ref / "meshes/circle.msh").exists():
        pytest.skip("reference mesh fixtures unavailable")
    root = load_msh(ref / "meshes/circle.msh")
    assert root.dim == 2 and root.ndof == 67
    hier = UniformMeshHierarchy(root, 2)
    fine = hier.meshes[-1]

    golden = np.loadtxt(ref / "outputs/circle_L=2_coefficients.txt")
    xyz, u_ref, mc_ref = golden[:, :3], golden[:, 3], golden[:, 4]
    assert len(golden) == fine.ndof

    # match golden rows to our nodes by nearest coordinate
    d2 = ((fine.nodes[None, :, :3] - xyz[:, None, :]) ** 2).sum(-1)
    idx = np.argmin(d2, axis=1)
    assert len(set(idx.tolist())) == fine.ndof  # unique pairing
    assert np.sqrt(d2[np.arange(len(idx)), idx]).max() < 1e-6

    u = np.zeros(fine.ndof)
    mc_g = np.zeros(fine.ndof)
    u[idx] = u_ref
    mc_g[idx] = mc_ref
    mc = np.asarray(hier.decompose(u))
    rel = np.abs(mc - mc_g) / np.maximum(np.abs(mc_g), 1e-12)
    assert np.median(rel) < 1e-6
    assert np.quantile(rel, 0.95) < 1e-3, np.quantile(rel, 0.95)


@pytest.mark.parametrize("fixture", ["pyramid.msh", "hexahedron.msh"])
def test_surface_mesh_basic_properties(fixture):
    """The reference's pyramid / hexahedron fixtures
    (tests/src/unstructured/test_UniformMeshHierarchy.cpp:28-100 'basic
    properties'): pyramid.msh is a triangulated surface embedded in R^3,
    hexahedron.msh a two-tet volume mesh; for both, affine functions of
    (x, y, z) decompose to zero details, recompose inverts decompose in
    both compositions, and the transform is linear."""
    import pathlib

    from mgard_tpu.unstructured.mesh import load_msh

    path = pathlib.Path("/root/reference/tests/meshes") / fixture
    if not path.exists():
        pytest.skip("reference mesh fixtures unavailable")
    root = load_msh(path)
    assert root.nodes.shape[1] == 3  # embedded in R^3
    assert root.dim == (2 if fixture == "pyramid.msh" else 3)
    hier = UniformMeshHierarchy(root, 2)
    fine = hier.meshes[-1]

    # refinement preserves total surface area and coarse node indices
    np.testing.assert_allclose(fine.measures.sum(), root.measures.sum(),
                               rtol=1e-12)
    np.testing.assert_array_equal(fine.nodes[:root.ndof], root.nodes)

    # zero detail coefficients for a linear function of the coordinates
    x, y, z = fine.nodes[:, 0], fine.nodes[:, 1], fine.nodes[:, 2]
    u = 5.0 * x - 3.0 * y + 2.0 * z
    coeffs = np.asarray(hier.decompose(u))
    assert np.max(np.abs(coeffs[hier.ndof(0):])) < 1e-6

    rng = np.random.default_rng(11)
    v = rng.uniform(-1.0, 1.0, fine.ndof)
    # recompose inverts decompose (and vice versa)
    np.testing.assert_allclose(
        np.asarray(hier.recompose(hier.decompose(v))), v, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(hier.decompose(hier.recompose(v))), v, atol=1e-9)
    # linearity: T(alpha u + v) == alpha T(u) + T(v)
    alpha = 0.731
    lhs = np.asarray(hier.decompose(alpha * u + v))
    rhs = alpha * np.asarray(hier.decompose(u)) \
        + np.asarray(hier.decompose(v))
    np.testing.assert_allclose(lhs, rhs, atol=1e-9)


@pytest.mark.parametrize("fixture", ["pyramid.msh", "hexahedron.msh"])
def test_surface_mesh_compress_bound(fixture):
    """s-norm-bounded compression end-to-end on the surface fixtures."""
    import pathlib

    from mgard_tpu.unstructured.mesh import load_msh

    path = pathlib.Path("/root/reference/tests/meshes") / fixture
    if not path.exists():
        pytest.skip("reference mesh fixtures unavailable")
    hier = UniformMeshHierarchy(load_msh(path), 2)
    rng = np.random.default_rng(5)
    u = rng.uniform(-1.0, 1.0, hier.ndof())
    for s, tol in ((0.0, 0.5), (0.25, 0.25)):
        buf = compress(hier, u, s=s, tolerance=tol)
        out = decompress(hier, buf)
        err = hier.norm(u - out, s)
        assert err <= tol, (fixture, s, err, tol)
