"""Token-major block-layout experiment (VERDICT r3 next #4).

MAED_TOKEN_MAJOR=1 carries the parallel-mode transformer state as
(B*N, T, C) instead of frame-major (B*T, N, C): ONE relayout at stack entry,
a free cls-row slice at exit, the temporal branch reads contiguous rows, and
the spatial branch becomes the grouped einsum. The math is identical to the
frame-major contract — these tests pin that equivalence (forward, gradients,
and the sown ts_gate accounting) so the layout can be flipped by measurement
alone. Reference semantics: /root/reference/lib/models/vision_transformer.py
:216-228 (the torch code has a single hard-coded layout; the contract is a
TPU-only degree of freedom).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maed_tpu.models.vit import VisionTransformer


def _small_vit(**kw):
    return VisionTransformer(
        embed_dim=32, depth=2, num_heads=2, mlp_ratio=2.0, st_mode="parallel",
        hybrid=False, patch_size=16, representation_size=16, max_seqlen=8,
        **kw,
    )


@pytest.fixture
def toggled(monkeypatch):
    def run(fn, on: bool):
        monkeypatch.setenv("MAED_TOKEN_MAJOR", "1" if on else "0")
        return fn()

    return run


def test_forward_matches_frame_major(toggled):
    model = _small_vit()
    x = jax.random.normal(jax.random.PRNGKey(0), (2 * 4, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(1), x, seqlen=4)

    ref = toggled(lambda: model.apply(params, x, seqlen=4), on=False)
    tm = toggled(lambda: model.apply(params, x, seqlen=4), on=True)
    np.testing.assert_allclose(np.asarray(tm), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_frame_major(toggled):
    model = _small_vit()
    x = jax.random.normal(jax.random.PRNGKey(0), (2 * 4, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(1), x, seqlen=4)

    def loss(p):
        y = model.apply(p, x, seqlen=4)
        return jnp.sum(y * y)

    g_ref = toggled(lambda: jax.grad(loss)(params), on=False)
    g_tm = toggled(lambda: jax.grad(loss)(params), on=True)
    flat_ref = jax.tree.leaves(g_ref)
    flat_tm = jax.tree.leaves(g_tm)
    assert len(flat_ref) == len(flat_tm)
    for a, b in zip(flat_tm, flat_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_ts_gate_accounting_matches(toggled):
    """count_attn parity: the sown ts_gate must keep the frame-major
    (B*T, 1, C, 2) shape and values in either layout (reference
    vision_transformer.py:230-240)."""
    model = _small_vit()
    x = jax.random.normal(jax.random.PRNGKey(0), (2 * 4, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(1), x, seqlen=4)

    def gates(p):
        _, inter = model.apply(p, x, seqlen=4, mutable=["intermediates"])
        return inter["intermediates"]

    ref = toggled(lambda: gates(params), on=False)
    tm = toggled(lambda: gates(params), on=True)
    ref_leaves = jax.tree.leaves(ref)
    tm_leaves = jax.tree.leaves(tm)
    assert len(ref_leaves) == len(tm_leaves) and len(ref_leaves) > 0
    for a, b in zip(tm_leaves, ref_leaves):
        assert a.shape == b.shape == (8, 1, 32, 2)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_t1_image_batch_unaffected(toggled):
    """seqlen=1 (the mixed train step's image branch) must bypass the
    token-major relayout entirely — identical outputs with the flag on."""
    model = _small_vit()
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(1), x, seqlen=1)
    ref = toggled(lambda: model.apply(params, x, seqlen=1), on=False)
    tm = toggled(lambda: model.apply(params, x, seqlen=1), on=True)
    np.testing.assert_allclose(np.asarray(tm), np.asarray(ref),
                               rtol=0, atol=0)
