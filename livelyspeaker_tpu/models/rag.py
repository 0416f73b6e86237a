"""RAG — the Rhythm-Aware (diffusion) Generator, in Flax.

TPU-first re-design of the reference denoiser (``scripts/model/RAG.py:16-133``
for TED, ``scripts_beat/model/RAG.py`` for BEAT; the BEAT variant adds an
8-way emotion prefix token and runs seq_len 36).  The model predicts x0.

Structure per forward pass (RAG.py:98-133):
  1. WavEncoder(audio) -> per-frame 256-d features, CFG-dropped as a whole.
  2. concat [x_t ‖ seed-masked origin_x ‖ indicator bit] per frame, concat
     audio features, Linear -> latent (InputProcess + input_mapping,
     RAG.py:110-114,176-192).
  3. VAE-style speaker token: Embed -> mu/logvar -> reparameterised sample,
     prepended to the sequence (RAG.py:117-122); BEAT also prepends an
     emotion token (scripts_beat/model/RAG.py:125-126).
  4. TransMLP mixer backbone with per-block timestep embedding; strip the
     prefix tokens; Linear back to pose space (RAG.py:124-125,195-211).

Differences by design (not bugs):
  - layout is [B, T, features] throughout (feature axis innermost for the
    MXU) instead of torch's [T, B, ...] permutes;
  - the audio frontend is exposed as :meth:`encode_audio` so samplers hoist
    it out of the diffusion scan (the reference recomputes it every step and
    twice per step under CFG, RAG.py:106 + cfg_sampler.py:29-30);
  - CFG conditioning drop is an explicit per-sample ``cond_drop`` array, so
    cond and uncond passes batch into one forward.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.nn import initializers

from .audio_encoder import WavEncoder
from .mlp_backbone import TransMLP

__all__ = ["RAG", "RAGConfig", "reparameterize"]


def reparameterize(rng: jax.Array, mu: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    """mu + eps * exp(logvar/2) (RAG.py:10-13)."""
    std = jnp.exp(0.5 * logvar)
    eps = jax.random.normal(rng, std.shape, std.dtype)
    return mu + eps * std


class RAGConfig:
    """Static hyperparameters (defaults = TED config, parser_util.py:99-110
    + model_util.py:20-37)."""

    def __init__(
        self,
        njoints: int = 9,
        nfeats: int = 3,
        nframes: int = 34,
        latent_dim: int = 512,
        num_layers: int = 8,
        mlpact: str = "silu",
        n_pre_seq: int = 4,
        n_speakers: int = 1400,
        speaker_dim: int = 256,
        audio_feat_dim: int = 256,
        num_emotions: int = 0,  # 8 for BEAT
        cond_mask_prob: float = 0.1,
        dtype: Any = jnp.float32,
        fused_train_backbone: bool = False,
        audio_bf16: bool = False,
    ):
        self.njoints = njoints
        self.nfeats = nfeats
        self.nframes = nframes
        self.latent_dim = latent_dim
        self.num_layers = num_layers
        self.mlpact = mlpact
        self.n_pre_seq = n_pre_seq
        self.n_speakers = n_speakers
        self.speaker_dim = speaker_dim
        self.audio_feat_dim = audio_feat_dim
        self.num_emotions = num_emotions
        self.cond_mask_prob = cond_mask_prob
        self.dtype = dtype
        # Train-time fast path: mixer stack through the fused Pallas kernel
        # with hand-written backward (f32, single-device).
        self.fused_train_backbone = fused_train_backbone
        # bf16 activations for the HBM-bound WavEncoder conv stack only
        # (params + returned features stay f32; audio_encoder.py docstring).
        # Orthogonal to TrainConfig.compute_dtype, which casts the whole
        # model and measured slower on the VPU-bound mixer (DESIGN §9).
        self.audio_bf16 = audio_bf16

    @property
    def input_feats(self) -> int:
        return self.njoints * self.nfeats

    @property
    def n_prefix(self) -> int:
        """Number of prefix condition tokens: style (+ emotion for BEAT)
        (RAG.py:116 n_pre_emb=1; scripts_beat/model/RAG.py:119 n_pre_emb=2)."""
        return 1 + (1 if self.num_emotions else 0)

    @property
    def seq_len(self) -> int:
        return self.nframes + self.n_prefix

    @classmethod
    def ted(cls, **kw) -> "RAGConfig":
        return cls(**kw)

    @classmethod
    def beat(cls, njoints: int = 47, nfeats: int = 6, **kw) -> "RAGConfig":
        kw.setdefault("num_emotions", 8)
        return cls(njoints=njoints, nfeats=nfeats, **kw)


class RAG(nn.Module):
    """The denoiser. See module docstring for the forward contract."""

    cfg: RAGConfig

    def setup(self):
        c = self.cfg
        self.audio_encoder = WavEncoder(
            dtype=jnp.bfloat16 if c.audio_bf16 else jnp.float32
        )
        self.input_mapping = nn.Dense(c.latent_dim, name="input_mapping")
        self.speaker_embedding = nn.Embed(
            c.n_speakers,
            c.speaker_dim,
            embedding_init=initializers.constant(1e-6),  # RAG.py:67
            name="speaker_embedding",
        )
        self.speaker_mu = nn.Dense(c.latent_dim, name="speaker_mu")
        self.speaker_logvar = nn.Dense(c.latent_dim, name="speaker_logvar")
        if c.num_emotions:
            self.emotion_embedding = nn.Embed(
                c.num_emotions,
                c.latent_dim,
                embedding_init=initializers.constant(1e-6),
                name="emotion_embedding",
            )
        self.backbone = TransMLP(
            seq_len=c.seq_len,
            num_layers=c.num_layers,
            dim=c.latent_dim,
            act=c.mlpact,
            fused_vjp=c.fused_train_backbone,
            name="backbone",
        )
        self.pose_final = nn.Dense(c.input_feats, name="pose_final")

    def encode_audio(self, audio: jnp.ndarray) -> jnp.ndarray:
        """Hoistable audio frontend: [B, L] -> [B, T, 256]."""
        feats = self.audio_encoder(audio.astype(self.cfg.dtype))
        t = self.cfg.nframes
        assert feats.shape[1] == t, (
            f"audio length maps to {feats.shape[1]} frames, expected {t}"
        )
        return feats

    def _drop_mask(self, batch: int, cond_drop, train: bool) -> jnp.ndarray:
        """Per-sample conditioning drop (mask_cond, RAG.py:80-96):
        1 -> null condition."""
        c = self.cfg
        if cond_drop is not None:
            return cond_drop.astype(self.cfg.dtype)
        if train and c.cond_mask_prob > 0.0:
            rng = self.make_rng("cond_mask")
            return jax.random.bernoulli(
                rng, c.cond_mask_prob, (batch,)
            ).astype(self.cfg.dtype)
        return jnp.zeros((batch,), self.cfg.dtype)

    def __call__(
        self,
        x: jnp.ndarray,
        t: jnp.ndarray,
        cond: Dict[str, jnp.ndarray],
        *,
        train: bool = False,
        audio_feats: Optional[jnp.ndarray] = None,
        backbone_apply: Optional[Callable] = None,
    ) -> Dict[str, jnp.ndarray]:
        """
        x: [B, njoints, nfeats, T] — x_t.
        t: [B] int — original-process timesteps.
        cond: 'audio' [B, L] (or pass audio_feats), 'vid' [B] int speaker ids,
              'origin_x' [B, njoints, nfeats, T] seed motion,
              optional 'emo' [B] int, optional 'cond_drop' [B] (1 = uncond).
        backbone_apply: optional (h [B,S,D], t [B]) -> [B,S,D] override for
              the mixer stack — the hook the pipeline-parallel trainer uses
              to route the backbone through parallel.pipeline.pipeline_forward
              while every other submodule runs normally.  The override sees
              the same inputs as ``self.backbone`` and must be numerically
              equivalent to it.
        """
        c = self.cfg
        b, nj, nf, nt = x.shape
        assert (nj, nf, nt) == (c.njoints, c.nfeats, c.nframes), x.shape

        if audio_feats is None:
            audio_feats = self.encode_audio(cond["audio"])
        drop = self._drop_mask(b, cond.get("cond_drop"), train)
        audio_emb = audio_feats * (1.0 - drop)[:, None, None]

        # Seed-frame conditioning: zero origin_x after the first n_pre_seq
        # frames, append the constraint indicator bit (RAG.py:110-111,184-192).
        origin_x = cond["origin_x"].astype(x.dtype)
        frame_idx = jnp.arange(nt)
        seed_mask = (frame_idx < c.n_pre_seq).astype(x.dtype)  # [T]
        origin_x = origin_x * seed_mask[None, None, None, :]

        to_btc = lambda a: a.reshape(b, nj * nf, nt).transpose(0, 2, 1)
        h = jnp.concatenate(
            [
                to_btc(x),
                to_btc(origin_x),
                jnp.broadcast_to(seed_mask[None, :, None], (b, nt, 1)).astype(
                    x.dtype
                ),
                audio_emb,
            ],
            axis=-1,
        )  # [B, T, 2*IF + 1 + 256]
        h = self.input_mapping(h)  # [B, T, D]

        # Stochastic speaker-style token (RAG.py:117-122).
        z_context = self.speaker_embedding(cond["vid"])[:, None]  # [B, 1, 256]
        z_mu = self.speaker_mu(z_context)
        z_logvar = self.speaker_logvar(z_context)
        if "style_eps" in cond:  # deterministic-eps escape hatch (tests/eval)
            style = z_mu + cond["style_eps"] * jnp.exp(0.5 * z_logvar)
        else:
            style = reparameterize(self.make_rng("style"), z_mu, z_logvar)

        prefix = [style]
        if c.num_emotions:
            prefix.append(self.emotion_embedding(cond["emo"])[:, None])
        h = jnp.concatenate(prefix + [h], axis=1)  # [B, S, D]

        if backbone_apply is not None:
            h = backbone_apply(h, t)[:, c.n_prefix :]  # [B, T, D]
        else:
            h = self.backbone(h, t)[:, c.n_prefix :]  # [B, T, D]
        out = self.pose_final(h)  # [B, T, IF]
        out = out.transpose(0, 2, 1).reshape(b, nj, nf, nt)

        return {"output": out, "z_mu": z_mu, "z_logvar": z_logvar}
