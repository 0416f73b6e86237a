"""SAG — the Semantic-Aware Generator (MotionCLIP-style), in Flax.

Re-design of ``scripts/model/motionclip.py`` + ``motionclip_module.py``: a
motion<->CLIP-space VAE-ish model.  The encoder prepends learned mu/sigma
query tokens to the skeleton embedding and runs a 3-layer transformer
encoder; ``mu`` (the first output token) is the motion latent
(motionclip_module.py:33-95).  The decoder treats the CLIP/motion latent as a
1-token memory, builds time-queries from the 4 seed frames (+ indicator bit)
through a linear mapping + sinusoidal PE, and runs a 3-layer transformer
decoder back to poses (motionclip_module.py:98-183).

At LivelySpeaker inference only the decoder runs, fed a frozen CLIP text
embedding as ``z`` (test_LivelySpeaker_ted.py:79-91).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from .mlp_backbone import sinusoidal_table
from .transformer import TransformerDecoder, TransformerEncoder

__all__ = ["SAGEncoder", "SAGDecoder", "SAG", "sag_losses"]


class SAGEncoder(nn.Module):
    """motion [B, J, F, T] (+mask [B, T]) -> latent mu [B, D]
    (Encoder_TRANSFORMER, motionclip_module.py:33-95)."""

    njoints: int = 9
    nfeats: int = 3
    latent_dim: int = 512
    ff_size: int = 1024
    num_layers: int = 3
    num_heads: int = 4
    dropout: float = 0.1
    activation: str = "gelu"

    @nn.compact
    def __call__(self, x, mask=None, *, deterministic=True):
        b, nj, nf, nt = x.shape
        if mask is None:
            mask = jnp.ones((b, nt), bool)
        h = x.reshape(b, nj * nf, nt).transpose(0, 2, 1)  # [B, T, IF]
        h = nn.Dense(self.latent_dim, name="skel_embedding")(h)

        mu_q = self.param(
            "mu_query", nn.initializers.normal(1.0), (1, self.latent_dim)
        )
        sigma_q = self.param(
            "sigma_query", nn.initializers.normal(1.0), (1, self.latent_dim)
        )
        prefix = jnp.broadcast_to(
            jnp.stack([mu_q[0], sigma_q[0]])[None], (b, 2, self.latent_dim)
        )
        h = jnp.concatenate([prefix, h], axis=1)  # [B, 2+T, D]

        pe = sinusoidal_table(5000, self.latent_dim)[: h.shape[1]]
        h = h + pe[None]
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)

        full_mask = jnp.concatenate(
            [jnp.ones((b, 2), bool), mask.astype(bool)], axis=1
        )
        h = TransformerEncoder(
            self.num_layers,
            self.latent_dim,
            self.num_heads,
            self.ff_size,
            self.dropout,
            self.activation,
            name="encoder",
        )(h, key_padding_mask=full_mask, deterministic=deterministic)
        return {"mu": h[:, 0]}


class SAGDecoder(nn.Module):
    """latent z [B, D] + seed frames -> motion [B, J, F, T]
    (Decoder_TRANSFORMER, motionclip_module.py:98-183)."""

    njoints: int = 9
    nfeats: int = 3
    latent_dim: int = 512
    ff_size: int = 1024
    num_layers: int = 3
    num_heads: int = 4
    dropout: float = 0.1
    activation: str = "gelu"
    n_pre_poses: int = 4

    @nn.compact
    def __call__(
        self,
        z: jnp.ndarray,  # [B, D]
        x: jnp.ndarray,  # [B, J, F, T] source motion providing seed frames
        mask: Optional[jnp.ndarray] = None,  # [B, T] True = valid
        *,
        deterministic=True,
    ) -> jnp.ndarray:
        b, nj, nf, nt = x.shape
        input_feats = nj * nf
        if mask is None:
            mask = jnp.ones((b, nt), bool)

        # Seed conditioning (motionclip_module.py:159-167): first n_pre_poses
        # frames of the motion plus an indicator bit; zero elsewhere.
        motion = x.reshape(b, input_feats, nt).transpose(0, 2, 1)  # [B, T, IF]
        fidx = jnp.arange(nt)
        seed = (fidx < self.n_pre_poses).astype(motion.dtype)  # [T]
        pre_cond = jnp.concatenate(
            [motion * seed[None, :, None], jnp.broadcast_to(seed[None, :, None], (b, nt, 1))],
            axis=-1,
        )  # [B, T, IF+1]

        tq = nn.Dense(self.latent_dim, name="mapping")(pre_cond)
        pe = sinusoidal_table(5000, self.latent_dim)[:nt]
        tq = tq + pe[None]
        tq = nn.Dropout(self.dropout)(tq, deterministic=deterministic)

        memory = z[:, None, :]  # [B, 1, D]
        h = TransformerDecoder(
            self.num_layers,
            self.latent_dim,
            self.num_heads,
            self.ff_size,
            self.dropout,
            self.activation,
            name="decoder",
        )(tq, memory, deterministic=deterministic)
        out = nn.Dense(input_feats, name="final_layer")(h)  # [B, T, IF]
        out = out * mask.astype(out.dtype)[:, :, None]  # zero padded frames
        return out.transpose(0, 2, 1).reshape(b, nj, nf, nt)


class SAG(nn.Module):
    """Encoder + decoder pair (MOTIONCLIP, motionclip.py:13-92)."""

    njoints: int = 9
    nfeats: int = 3
    latent_dim: int = 512
    ff_size: int = 1024
    num_layers: int = 3
    num_heads: int = 4
    dropout: float = 0.1
    n_pre_poses: int = 4

    def setup(self):
        kw = dict(
            njoints=self.njoints,
            nfeats=self.nfeats,
            latent_dim=self.latent_dim,
            ff_size=self.ff_size,
            num_layers=self.num_layers,
            num_heads=self.num_heads,
            dropout=self.dropout,
        )
        self.encoder = SAGEncoder(**kw)
        self.decoder = SAGDecoder(n_pre_poses=self.n_pre_poses, **kw)

    def __call__(self, x, mask=None, *, deterministic=True):
        """Auto-encode: motion -> z -> motion (motionclip.py:75-83)."""
        z = self.encoder(x, mask, deterministic=deterministic)["mu"]
        out = self.decoder(z, x, mask, deterministic=deterministic)
        return {"z": z, "output": out}

    def encode(self, x, mask=None, *, deterministic=True):
        return self.encoder(x, mask, deterministic=deterministic)["mu"]

    def decode(self, z, x, mask=None, *, deterministic=True):
        return self.decoder(z, x, mask, deterministic=deterministic)


def sag_losses(
    x: jnp.ndarray,
    output: jnp.ndarray,
    z: jnp.ndarray,
    text_features: jnp.ndarray,
    lam_cos: float = 1.0,
) -> Dict[str, jnp.ndarray]:
    """SAG training loss (motionclip.py:23-64 + motionclip_loss.py:5-25):
    recon MSE + velocity MSE + lam_cos * (1 - cos(z, clip_text))."""
    xyz_loss = jnp.mean((x - output) ** 2)
    vel_loss = jnp.mean(
        ((x[..., 1:] - x[..., :-1]) - (output[..., 1:] - output[..., :-1])) ** 2
    )
    fn = text_features / jnp.linalg.norm(text_features, axis=-1, keepdims=True)
    zn = z / jnp.linalg.norm(z, axis=-1, keepdims=True)
    cos = jnp.sum(fn * zn, axis=-1)
    cos_loss = jnp.mean(1.0 - cos)
    total = xyz_loss + vel_loss + lam_cos * cos_loss
    return {
        "xyz_loss": xyz_loss,
        "vel_loss": vel_loss,
        "clip_loss": cos_loss,
        "cos_sim": jnp.mean(cos),
        "sum": total,
    }
