"""SH evaluation tests: basis orthogonality-ish sanity, degree masking, grads."""

import numpy as np
import jax
import jax.numpy as jnp

from qed_splatter_tpu.ops.sh import (
    degree_band_mask,
    eval_sh_basis,
    eval_sh_colors,
    num_sh_bases,
)


def _unit_dirs(n, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3))
    return (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)


def test_num_bases():
    assert [num_sh_bases(d) for d in range(4)] == [1, 4, 9, 16]


def test_dc_only_constant():
    dirs = _unit_dirs(16)
    basis = np.asarray(eval_sh_basis(jnp.asarray(dirs), 0))
    np.testing.assert_allclose(basis, 0.28209479177387814, atol=1e-6)


def test_band_mask_traced_degree():
    for deg in range(4):
        m = np.asarray(degree_band_mask(jnp.asarray(deg), 3))
        assert m.sum() == num_sh_bases(deg)
        assert (m[: num_sh_bases(deg)] == 1).all()


def test_sh_orthonormality_montecarlo():
    """Monte-Carlo integral of basis_i * basis_j over the sphere ~ delta_ij / (4pi)... normalized."""
    dirs = _unit_dirs(200_000, seed=1)
    basis = np.asarray(eval_sh_basis(jnp.asarray(dirs), 3))  # [M, 16]
    gram = 4.0 * np.pi * (basis.T @ basis) / basis.shape[0]
    np.testing.assert_allclose(gram, np.eye(16), atol=0.15)


def test_colors_clamped_and_offset():
    n, k = 8, 16
    coeffs = jnp.zeros((n, k, 3))
    means = jnp.asarray(_unit_dirs(n)) * 2.0 + jnp.asarray([0.0, 0.0, 5.0])
    campos = jnp.zeros(3)
    col = np.asarray(eval_sh_colors(coeffs, means, campos, jnp.asarray(3), 3))
    np.testing.assert_allclose(col, 0.5, atol=1e-6)  # zero SH -> 0.5 grey

    # strongly negative dc -> clamped at 0
    coeffs = coeffs.at[:, 0, :].set(-10.0)
    col = np.asarray(eval_sh_colors(coeffs, means, campos, jnp.asarray(3), 3))
    np.testing.assert_allclose(col, 0.0, atol=1e-6)


def test_degree_masking_changes_color():
    rng = np.random.default_rng(2)
    coeffs = jnp.asarray(rng.normal(size=(4, 16, 3)).astype(np.float32) * 0.1)
    means = jnp.asarray(_unit_dirs(4)) + jnp.asarray([0.0, 0.0, 3.0])
    campos = jnp.zeros(3)
    c0 = eval_sh_colors(coeffs, means, campos, jnp.asarray(0), 3)
    c3 = eval_sh_colors(coeffs, means, campos, jnp.asarray(3), 3)
    assert np.abs(np.asarray(c0 - c3)).max() > 1e-3


def test_sh_grads():
    rng = np.random.default_rng(3)
    coeffs = jnp.asarray(rng.normal(size=(8, 16, 3)).astype(np.float32) * 0.2)
    means = jnp.asarray(_unit_dirs(8)) + jnp.asarray([0.0, 0.0, 3.0])

    def loss(coeffs, means):
        return jnp.sum(
            eval_sh_colors(coeffs, means, jnp.zeros(3), jnp.asarray(2), 3)
        )

    gc, gm = jax.grad(loss, argnums=(0, 1))(coeffs, means)
    assert np.isfinite(np.asarray(gc)).all()
    assert np.isfinite(np.asarray(gm)).all()
    # masked band-3 coeffs get zero grad
    assert np.abs(np.asarray(gc)[:, 9:, :]).max() == 0.0
    assert np.abs(np.asarray(gc)[:, :9, :]).max() > 0.0
