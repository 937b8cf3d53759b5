"""FWHT property tests — the port of verify-rrs.c:28-92 invariants."""

import jax.numpy as jnp
import numpy as np
import pytest

from rrs_tpu.formats.fwht import (
    RRS_BLOCK,
    block_rotate,
    fwht,
    fwht_np,
    hadamard_matrix,
    rotation_matrix,
)


@pytest.mark.parametrize("n", [2, 8, 256, 1024])
def test_self_inverse_np(n):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, n))
    np.testing.assert_allclose(fwht_np(fwht_np(x)), x, atol=1e-10)


@pytest.mark.parametrize("n", [256, 512])
def test_norm_preservation(n):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((3, n))
    y = fwht_np(x)
    np.testing.assert_allclose(
        np.linalg.norm(y, axis=-1), np.linalg.norm(x, axis=-1), rtol=1e-12
    )


def test_jnp_matches_np():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((5, 256)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(fwht(jnp.asarray(x))), fwht_np(x), atol=1e-4
    )


def test_hadamard_matmul_equals_fwht():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((4, 256))
    h = hadamard_matrix(256)
    np.testing.assert_allclose(x @ h, fwht_np(x), atol=1e-9)
    # Sylvester H is symmetric and orthogonal.
    np.testing.assert_allclose(h @ h, np.eye(256), atol=1e-12)


def test_rotation_matrix_folds_permutation():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 256))
    perm = rng.permutation(256)
    r = rotation_matrix(perm)
    expected = fwht_np(x[:, perm])
    np.testing.assert_allclose(x @ r, expected, atol=1e-9)


def test_block_rotate_multi_block():
    rng = np.random.default_rng(5)
    k = 3 * RRS_BLOCK
    x = rng.standard_normal((2, k)).astype(np.float32)
    r = jnp.asarray(hadamard_matrix(RRS_BLOCK), dtype=jnp.float32)
    got = np.asarray(block_rotate(jnp.asarray(x), r))
    expected = fwht_np(x.reshape(2, 3, RRS_BLOCK)).reshape(2, k)
    np.testing.assert_allclose(got, expected, atol=1e-4)


def test_orthogonality_preserves_dot_products():
    # The core RRS correctness argument: W x == (W H)(H x) for orthogonal H,
    # so rotating weights at quant time + activations at run time is exact.
    rng = np.random.default_rng(6)
    w = rng.standard_normal((8, 256))
    x = rng.standard_normal((256,))
    ref = w @ x
    got = fwht_np(w) @ fwht_np(x)
    np.testing.assert_allclose(got, ref, rtol=1e-10)
