"""Parity tests for the experimental staged Pallas WavEncoder.

The module is a measured performance negative (DESIGN.md §15) but is kept
as a correct record of the staged-kernel technique; these tests pin its
numerics against the production Flax WavEncoder (reference semantics:
``scripts/model/audio_enc.py:6-25``) in CPU interpret mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from livelyspeaker_tpu.models.audio_encoder import (
    WavEncoder,
    audio_samples_for_frames,
)
from livelyspeaker_tpu.ops.pallas.fused_wav import (
    WavDims,
    fused_wav_encoder,
    pack_wav_params,
)


@pytest.fixture(scope="module")
def setup():
    B = 3
    L = audio_samples_for_frames(2)  # short clip keeps interpret mode fast
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.normal(0, 0.2, (B, L)).astype(np.float32))
    we = WavEncoder()
    params = we.init(jax.random.PRNGKey(0), wav)["params"]
    # non-trivial conv scales so mismatches can't hide in small magnitudes
    params = jax.tree.map(lambda p: p * 3.0 if p.ndim == 3 else p, params)
    return B, L, wav, we, params


def test_wavdims_geometry(setup):
    _, L, _, _, _ = setup
    d = WavDims(L)
    # conv chain semantics: k15, strides 5/6/6/6, conv0 padded 1600/side
    assert d.T1 == (L + 3200 - 15) // 5 + 1
    assert d.T4 >= 1
    # row counts cover every conv window (window t reads rows t..t+2)
    assert d.R1 >= d.T2p + 2 and 6 * d.R1 >= d.T1
    assert d.R2 >= d.T3p + 2 and 6 * d.R2 >= d.T2p
    assert d.R3 >= d.T4 + 2 and 6 * d.R3 >= d.T3p


def test_fused_wav_forward_matches_flax(setup):
    _, _, wav, we, params = setup
    ref = we.apply({"params": params}, wav)
    packed = pack_wav_params(params)
    with pltpu.force_tpu_interpret_mode():
        out = fused_wav_encoder(wav, packed, 0.3, 2)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_fused_wav_grads_match_flax(setup):
    _, _, wav, we, params = setup
    ref = we.apply({"params": params}, wav)
    w = jnp.asarray(
        np.random.default_rng(1).normal(size=ref.shape).astype(np.float32)
    )

    def loss_ref(wav, p):
        return jnp.sum(we.apply({"params": p}, wav) * w)

    def loss_fused(wav, p):
        return jnp.sum(fused_wav_encoder(wav, pack_wav_params(p), 0.3, 2) * w)

    gr = jax.grad(loss_ref, argnums=(0, 1))(wav, params)
    with pltpu.force_tpu_interpret_mode():
        gf = jax.grad(loss_fused, argnums=(0, 1))(wav, params)

    np.testing.assert_allclose(
        np.asarray(gf[0]), np.asarray(gr[0]), atol=5e-4
    )
    for conv in ("conv0", "conv1", "conv2", "conv3"):
        for leaf in ("kernel", "bias"):
            a = np.asarray(gr[1][conv][leaf])
            b = np.asarray(gf[1][conv][leaf])
            scale = max(np.abs(a).max(), 1.0)
            # pre-IN biases have exactly-zero true gradient (InstanceNorm
            # cancels any constant), so both sides are pure f32 noise
            # there; 2e-4 covers that while still pinning real gradients
            # to ~1e-5 relative.
            np.testing.assert_allclose(
                b / scale, a / scale, atol=2e-4,
                err_msg=f"d{conv}.{leaf}",
            )
