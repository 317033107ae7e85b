"""Tests: epipolar geometry, triangulation, descriptor matchers,
distance transforms — validated against brute-force references
(the reference's strategy: synthetic inputs + algebraic invariants,
tests/descriptor_matcher.cc:17-45)."""

import numpy as np
import jax.numpy as jnp

from vpp_tpu.algorithms.geometry import (epipole_left, epipole_right,
                                         fundamental_from_projections,
                                         reprojection_error, triangulate)
from vpp_tpu.algorithms.matcher import (bruteforce_match, cross_check_match,
                                        hamming_distance, local_match,
                                        pairwise_distances, sad_distance)
from vpp_tpu.algorithms.distance_transform import (
    chamfer_distance_transform, euclidean_distance_transform, NEIGHBORHOODS)


def _projections():
    K = np.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]])
    R = np.eye(3)
    # translation with a z component keeps the epipoles finite
    t2 = np.array([0.5, 0.2, 1.0])
    P1 = K @ np.hstack([R, np.zeros((3, 1))])
    P2 = K @ np.hstack([R, -t2[:, None]])
    return P1, P2


def test_triangulate_roundtrip():
    P1, P2 = _projections()
    rng = np.random.RandomState(0)
    X = rng.rand(32, 3) * [2, 2, 2] + [-1, -1, 4]
    hom = np.hstack([X, np.ones((32, 1))])
    x1 = (hom @ P1.T)
    x1 = x1[:, :2] / x1[:, 2:3]
    x2 = (hom @ P2.T)
    x2 = x2[:, :2] / x2[:, 2:3]
    Xr = np.asarray(triangulate(P1, P2, x1, x2))
    assert np.allclose(Xr, X, atol=1e-2)
    err = np.asarray(reprojection_error(P1, Xr, x1))
    assert err.max() < 0.5


def test_epipoles_null_vectors():
    P1, P2 = _projections()
    F = np.asarray(fundamental_from_projections(P1, P2))
    el = np.asarray(epipole_left(F))
    er = np.asarray(epipole_right(F))
    # e'^T F ~ 0 and F e ~ 0 (dehomogenised)
    lhs = np.array([el[0], el[1], 1.0]) @ F
    rhs = F @ np.array([er[0], er[1], 1.0])
    assert np.abs(lhs).max() < 1e-2 * max(1, np.abs(F).max() * 1e3)
    assert np.abs(rhs).max() < 1e-2 * max(1, np.abs(F).max() * 1e3)


def test_bruteforce_match_equals_exhaustive():
    rng = np.random.RandomState(1)
    train = rng.randint(0, 255, (100, 16)).astype(np.float32)
    query = train[rng.permutation(100)[:20]] + rng.randn(20, 16)
    idx, dist = bruteforce_match(jnp.asarray(query), jnp.asarray(train))
    d = np.abs(query[:, None, :] - train[None]).sum(-1)
    assert np.array_equal(np.asarray(idx), d.argmin(1))
    assert np.allclose(np.asarray(dist), d.min(1), rtol=1e-5)
    # blocked path agrees
    idx_b, dist_b = bruteforce_match(jnp.asarray(query), jnp.asarray(train),
                                     train_block=17)
    assert np.array_equal(np.asarray(idx_b), np.asarray(idx))
    # l2 path
    idx2, _ = bruteforce_match(jnp.asarray(query), jnp.asarray(train),
                               distance="l2")
    d2 = ((query[:, None, :] - train[None]) ** 2).sum(-1)
    assert np.array_equal(np.asarray(idx2), d2.argmin(1))


def test_hamming_matches_popcount():
    rng = np.random.RandomState(2)
    a = rng.randint(0, 256, (8,), dtype=np.uint8)
    b = rng.randint(0, 256, (8,), dtype=np.uint8)
    expect = sum(bin(int(x) ^ int(y)).count("1") for x, y in zip(a, b))
    assert int(hamming_distance(jnp.asarray(a), jnp.asarray(b))) == expect
    pw = np.asarray(pairwise_distances(jnp.asarray(a[None]),
                                       jnp.asarray(b[None]), "hamming"))
    assert int(pw[0, 0]) == expect


def test_local_match_radius():
    rng = np.random.RandomState(3)
    train = rng.randint(0, 255, (50, 8)).astype(np.float32)
    tpos = rng.rand(50, 2).astype(np.float32) * 100
    query = train + 0.1
    qpos = tpos.copy()
    idx, dist, found = local_match(jnp.asarray(query), jnp.asarray(qpos),
                                   jnp.asarray(train), jnp.asarray(tpos),
                                   search_radius=5.0)
    assert np.asarray(found).all()
    assert np.array_equal(np.asarray(idx), np.arange(50))
    # zero radius far away -> nothing found
    _, _, found2 = local_match(jnp.asarray(query),
                               jnp.asarray(qpos + 1000.0),
                               jnp.asarray(train), jnp.asarray(tpos),
                               search_radius=5.0)
    assert not np.asarray(found2).any()


def test_cross_check():
    train = jnp.asarray(np.eye(8, dtype=np.float32) * 10)
    query = train + 0.01
    fwd, _, mutual = cross_check_match(query, train)
    assert np.array_equal(np.asarray(fwd), np.arange(8))
    assert np.asarray(mutual).all()


def _chamfer_reference(mask, nbh):
    """Sequential two-pass chamfer, straight from the reference recurrence
    (distance_transforms.hh:100-117)."""
    h, w = mask.shape
    inf = 1e9
    d = np.where(mask, 0.0, inf)
    for r in range(h):
        for c in range(w):
            for dr, dc, wt in nbh:
                rr, cc = r + dr, c + dc
                if 0 <= rr < h and 0 <= cc < w:
                    d[r, c] = min(d[r, c], d[rr, cc] + wt)
    for r in range(h - 1, -1, -1):
        for c in range(w - 1, -1, -1):
            for dr, dc, wt in nbh:
                rr, cc = r - dr, c - dc
                if 0 <= rr < h and 0 <= cc < w:
                    d[r, c] = min(d[r, c], d[rr, cc] + wt)
    return d


def test_chamfer_matches_sequential_reference():
    rng = np.random.RandomState(4)
    mask = rng.rand(20, 33) < 0.05
    mask[7, 12] = True
    for metric in ("d4", "d8", "d3_4", "d5_7_11"):
        got = np.asarray(chamfer_distance_transform(mask, metric))
        want = _chamfer_reference(mask, NEIGHBORHOODS[metric])
        assert np.allclose(got, want), metric


def test_euclidean_dt_exact_on_small():
    rng = np.random.RandomState(5)
    mask = rng.rand(40, 40) < 0.03
    mask[20, 20] = True
    dist, vec = euclidean_distance_transform(mask)
    dist = np.asarray(dist)
    vec = np.asarray(vec)
    seeds = np.argwhere(mask)
    rr, cc = np.mgrid[0:40, 0:40]
    brute = ((seeds[:, None, None, 0] - rr) ** 2 +
             (seeds[:, None, None, 1] - cc) ** 2).min(0)
    assert np.array_equal(dist.astype(np.int64), brute)
    # displacement vectors point to actual seeds at the stated distance
    tr = rr + vec[..., 0]
    tc = cc + vec[..., 1]
    assert mask[tr, tc].all()
    assert np.array_equal(vec[..., 0] ** 2 + vec[..., 1] ** 2,
                          brute)
