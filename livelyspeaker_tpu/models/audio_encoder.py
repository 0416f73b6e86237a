"""Raw-waveform audio frontend (WavEncoder) in Flax.

Re-design of the reference conv stack (``scripts/model/audio_enc.py:6-25``):
16 kHz waveform -> per-motion-frame 256-d features via four strided 1-D convs
(strides 5/6/6/6, kernel 15, first conv padded 1600/side) with channel-wise
InstanceNorm + LeakyReLU(0.3) between them.  36,266 samples (34 frames at
15 fps) map to exactly 34 feature frames.

TPU notes: we run NWC layout with ``lax.conv_general_dilated`` through
``nn.Conv`` so XLA can lower the large-stride convs onto the MXU as implicit
im2col matmuls, and the whole frontend is *time-invariant in t* so callers
hoist it out of the diffusion scan (the reference recomputes it for all 2x
CFG passes of every step, RAG.py:106 — hoisting it is pure win).

Mixed precision: unlike the VPU-bound mixer backbone (where bf16 measured
*slower*, docs/DESIGN.md §9), this stack is HBM-bandwidth-bound — the conv0
activation is [B, 7891, 32] and the instance-norm passes re-stream it several
times — so halving the bytes with ``dtype=bfloat16`` is the right lever for
the *training* step (inference hoists the encoder out of the scan, where its
cost is negligible).  Params stay f32 (flax casts them per-call, and the cast
is differentiable so master weights get f32 grads); instance-norm statistics
are always computed in f32.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["WavEncoder", "audio_samples_for_frames"]


def audio_samples_for_frames(n_frames: int, fps: int = 15, sr: int = 16000) -> int:
    """Waveform length the TED pipeline pairs with ``n_frames`` of motion
    (data_preprocessor.py:129-141 semantics: n_frames/fps seconds at 16 kHz)."""
    return int(round(n_frames / fps * sr))


def _instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """torch InstanceNorm1d (affine=False): normalise each (batch, channel)
    over the time axis. x is [B, L, C].  Statistics in f32 regardless of the
    activation dtype (a bf16 time-mean over ~8k samples loses ~3 digits)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=1, keepdims=True)
    var = jnp.mean((x32 - mean) ** 2, axis=1, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


class WavEncoder(nn.Module):
    """audio [B, L] float -> [B, T_out, 256] features (audio_enc.py:6-25).

    ``dtype`` is the activation/compute dtype for the conv stack (params and
    the returned features stay f32; see module docstring).
    """

    leak: float = 0.3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, wav: jnp.ndarray) -> jnp.ndarray:
        if jnp.issubdtype(wav.dtype, jnp.integer):
            # PCM16 records (TedConfig.audio_dtype="int16"): decode on
            # DEVICE — the host ships half the bytes, the cast is free here.
            wav = wav.astype(jnp.float32) * jnp.float32(1.0 / 32768.0)
        x = wav.astype(self.dtype)[..., None]  # [B, L, 1] (NWC)
        x = nn.Conv(32, (15,), strides=(5,), padding=[(1600, 1600)],
                    dtype=self.dtype, name="conv0")(x)
        x = _instance_norm(x)
        x = nn.leaky_relu(x, self.leak)
        x = nn.Conv(64, (15,), strides=(6,), padding="VALID",
                    dtype=self.dtype, name="conv1")(x)
        x = _instance_norm(x)
        x = nn.leaky_relu(x, self.leak)
        x = nn.Conv(128, (15,), strides=(6,), padding="VALID",
                    dtype=self.dtype, name="conv2")(x)
        x = _instance_norm(x)
        x = nn.leaky_relu(x, self.leak)
        x = nn.Conv(256, (15,), strides=(6,), padding="VALID",
                    dtype=self.dtype, name="conv3")(x)
        return x.astype(jnp.float32)  # [B, T, 256]
