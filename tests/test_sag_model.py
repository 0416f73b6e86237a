"""SAG (MotionCLIP) tests: shapes, losses, and forward parity with the
reference transformer towers via converted weights."""

import sys
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from livelyspeaker_tpu.models.sag import SAG, sag_losses
from livelyspeaker_tpu.utils.torch_convert import sag_params_from_torch_state_dict
from conftest import REFERENCE_ROOT, requires_reference

B, T = 2, 34


def _init_sag(rng_np, **kw):
    model = SAG(**kw)
    x = jnp.asarray(rng_np.normal(size=(B, 9, 3, T)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    return model, params, x


def test_sag_autoencode_shapes(rng_np):
    model, params, x = _init_sag(rng_np)
    out = model.apply({"params": params}, x)
    assert out["z"].shape == (B, 512)
    assert out["output"].shape == (B, 9, 3, T)


def test_sag_decode_from_text_latent(rng_np):
    model, params, x = _init_sag(rng_np)
    z = jnp.asarray(rng_np.normal(size=(B, 512)).astype(np.float32))
    out = model.apply({"params": params}, z, x, method=model.decode)
    assert out.shape == (B, 9, 3, T)


def test_sag_mask_zeroes_padding(rng_np):
    model, params, x = _init_sag(rng_np)
    mask = jnp.ones((B, T), bool).at[:, 20:].set(False)
    out = model.apply(
        {"params": params},
        jnp.asarray(rng_np.normal(size=(B, 512)).astype(np.float32)),
        x,
        mask,
        method=model.decode,
    )
    np.testing.assert_allclose(np.asarray(out[..., 20:]), 0.0)


def test_sag_losses(rng_np):
    x = jnp.asarray(rng_np.normal(size=(B, 9, 3, T)).astype(np.float32))
    z = jnp.asarray(rng_np.normal(size=(B, 512)).astype(np.float32))
    text = jnp.asarray(rng_np.normal(size=(B, 512)).astype(np.float32))
    losses = sag_losses(x, x, z, z)  # perfect recon, perfect alignment
    assert float(losses["xyz_loss"]) == 0.0
    assert float(losses["clip_loss"]) == pytest.approx(0.0, abs=1e-6)
    losses2 = sag_losses(x, x * 0.5, z, text)
    assert float(losses2["sum"]) > 0


@requires_reference
def test_sag_matches_reference(rng_np):
    import torch

    sys.modules.setdefault("clip", types.ModuleType("clip"))
    sys.path.insert(0, f"{REFERENCE_ROOT}/scripts")
    from model.motionclip_module import Decoder_TRANSFORMER, Encoder_TRANSFORMER

    # the reference decoder hardcodes .cuda() (motionclip_module.py:163);
    # neutralise it for CPU parity testing
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        torch.manual_seed(0)
        ref_enc = Encoder_TRANSFORMER(latent_dim=512)
        ref_dec = Decoder_TRANSFORMER(latent_dim=512, n_pre_poses=4)
        ref_enc.eval()
        ref_dec.eval()

        sd = {}
        for k, v in ref_enc.state_dict().items():
            sd[f"encoder.{k}"] = v
        for k, v in ref_dec.state_dict().items():
            sd[f"decoder.{k}"] = v
        params = sag_params_from_torch_state_dict(sd, num_layers=3)

        x = rng_np.normal(size=(B, 9, 3, T)).astype(np.float32)
        mask = np.ones((B, T), bool)
        with torch.no_grad():
            enc_out = ref_enc(
                {"x": torch.from_numpy(x), "mask": torch.from_numpy(mask)}
            )
            z = enc_out["mu"].numpy()
            dec_out = ref_dec(
                {
                    "z": torch.from_numpy(z),
                    "mask": torch.from_numpy(mask),
                    "x": torch.from_numpy(x),
                }
            )["output"].numpy()
    finally:
        torch.Tensor.cuda = orig_cuda

    model = SAG()
    our_z = model.apply({"params": params}, jnp.asarray(x), method=model.encode)
    np.testing.assert_allclose(np.asarray(our_z), z, atol=1e-3)
    our_dec = model.apply(
        {"params": params}, jnp.asarray(z), jnp.asarray(x), method=model.decode
    )
    np.testing.assert_allclose(np.asarray(our_dec), dec_out, atol=1e-3)
