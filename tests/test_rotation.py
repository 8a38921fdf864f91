"""Property tests for the rotation math core.

Mirrors the test strategy SURVEY.md §4 prescribes: inverse round-trip,
orthogonality/norm preservation, stage-vs-matrix equivalence, and gradient
equivalence with the reference's analytic backward semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paroquant_tpu.ops import rotation as R

GS = 128


def _params(in_features=256, K=4, seed=0):
    params = R.make_rotation_params(in_features, GS, K, seed)
    rng = np.random.default_rng(seed)
    theta = jnp.asarray(
        rng.normal(0, 0.3, size=params.theta.shape).astype(np.float32)
    )
    theta = jnp.where(params.mask, 0.0, theta)
    params = params._replace(theta=theta)
    form = R.to_permutation_form(params, GS)
    return params, form


def test_pair_independence_invariant():
    rotations = R.generate_random_pairs(256, GS, 8, seed=0)
    assert len(rotations) == 8
    seen_pairs = set()
    for stage in rotations:
        used = set()
        for i, j in stage:
            assert i // GS == j // GS, "pair crosses group"
            assert i not in used and j not in used, "channel reuse within stage"
            used.update((i, j))
            assert (i, j) not in seen_pairs, "pair repeated across stages"
            seen_pairs.add((i, j))
        # greedy selection may fall slightly short in later stages (padded
        # with dummy identity pairs at pack time), never over-full
        assert len(stage) <= 256 // 2
    assert len(rotations[0]) == 256 // 2


def test_pack_pairs_rejects_illegal():
    with pytest.raises(ValueError):
        R.pack_pairs([[(0, 1), (1, 2)]], 128, GS)  # channel 1 reused
    with pytest.raises(ValueError):
        R.pack_pairs([[(0, 130)]], 256, GS)  # crosses group boundary


def test_inverse_roundtrip():
    params, form = _params()
    x = jnp.asarray(np.random.default_rng(1).normal(size=(5, 256)), jnp.float32)
    y = R.apply_rotation_stages(x, params.theta, form)
    x2 = R.apply_rotation_stages(y, params.theta, form, inverse=True)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-5)


def test_norm_preservation():
    params, form = _params()
    x = jnp.asarray(np.random.default_rng(2).normal(size=(7, 256)), jnp.float32)
    y = R.apply_rotation_stages(x, params.theta, form)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(y), axis=-1),
        np.linalg.norm(np.asarray(x), axis=-1),
        rtol=1e-5,
    )


def test_matrix_form_matches_stages():
    params, form = _params()
    rot = R.build_rotation_matrices(params.theta, form, GS)
    # orthogonality of composed matrices
    eye = jnp.einsum("gij,gkj->gik", rot, rot)
    np.testing.assert_allclose(
        np.asarray(eye), np.broadcast_to(np.eye(GS), eye.shape), atol=1e-5
    )
    x = jnp.asarray(np.random.default_rng(3).normal(size=(4, 256)), jnp.float32)
    y_stages = R.apply_rotation_stages(x, params.theta, form)
    y_mat = R.apply_rotation_matrices(x, rot)
    np.testing.assert_allclose(np.asarray(y_mat), np.asarray(y_stages), atol=1e-4)
    # inverse via transpose
    x2 = R.apply_rotation_matrices(y_mat, rot, inverse=True)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)


def test_dummy_pairs_are_identity():
    # fewer pairs than capacity -> dummy pairs must not move data
    rotations = [[(0, 5), (3, 9)]]
    pairs, theta, mask = R.pack_pairs(rotations, 128, GS, angles=[np.array([0.7, -0.2], np.float32)])
    assert mask.sum() == GS // 2 - 2
    params = R.RotationParams(jnp.asarray(pairs), jnp.asarray(theta), jnp.asarray(mask))
    form = R.to_permutation_form(params, GS)
    x = jnp.asarray(np.random.default_rng(4).normal(size=(2, 128)), jnp.float32)
    y = R.apply_rotation_stages(x, R.effective_theta(params), form)
    untouched = [c for c in range(128) if c not in (0, 5, 3, 9)]
    np.testing.assert_allclose(
        np.asarray(y)[:, untouched], np.asarray(x)[:, untouched], atol=1e-6
    )


def test_theta_gradient_matches_finite_difference():
    params, form = _params(in_features=128, K=2, seed=5)
    x = jnp.asarray(np.random.default_rng(6).normal(size=(3, 128)), jnp.float32)
    tgt = jnp.asarray(np.random.default_rng(7).normal(size=(3, 128)), jnp.float32)

    def loss(theta):
        y = R.apply_rotation_stages(x, theta, form)
        return jnp.mean((y - tgt) ** 2)

    g = jax.grad(loss)(params.theta)
    eps = 1e-3
    rng = np.random.default_rng(8)
    for _ in range(5):
        r = rng.integers(0, params.theta.shape[0])
        c = rng.integers(0, params.theta.shape[1])
        e = jnp.zeros_like(params.theta).at[r, c].set(eps)
        fd = (loss(params.theta + e) - loss(params.theta - e)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(g)[r, c], float(fd), atol=1e-3, rtol=1e-2)


def test_scaled_rotation_matches_reference_semantics():
    """rotate(x, scales) == rotate(x * scales) (reference rotation.cu applies
    scales during the load, rotation.cuh:24-31)."""
    params, form = _params(in_features=128, K=3, seed=9)
    x = jnp.asarray(np.random.default_rng(10).normal(size=(2, 128)), jnp.float32)
    scales = jnp.asarray(np.random.default_rng(11).uniform(0.5, 2.0, 128), jnp.float32)
    y1 = R.scaled_pairwise_rotation(x, params.theta, form, scales)
    y2 = R.apply_rotation_stages(x * scales, params.theta, form)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)
