"""Convert reference PyTorch checkpoints into our Flax param pytrees.

Supports the released RAG checkpoints (``ckpts/TED/RAG.pt``,
``ckpts/BEAT/...``; plain ``state_dict`` files with CLIP weights stripped,
train_loop.py:205-225) so a user of the reference can load their trained
weights directly into this framework.  The mapping below follows the
reference module tree of ``scripts/model/RAG.py`` / ``mlp_module.py`` /
``audio_enc.py``.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

__all__ = ["rag_params_from_torch_state_dict"]


def _t(a) -> np.ndarray:
    """torch tensor -> numpy (works on anything with .detach/.numpy)."""
    if hasattr(a, "detach"):
        a = a.detach().cpu().numpy()
    return np.asarray(a)


def rag_params_from_torch_state_dict(
    sd: Dict[str, "np.ndarray"], num_layers: int = 8, num_emotions: int = 0
) -> Dict:
    """Build the Flax ``params`` tree for :class:`livelyspeaker_tpu.models.RAG`
    from a reference RAG ``state_dict``."""
    p: Dict = {}

    # WavEncoder: torch Conv1d weight [out, in, k] -> flax Conv kernel [k, in, out]
    conv_map = {"conv0": 0, "conv1": 3, "conv2": 6, "conv3": 9}
    audio = {}
    for name, idx in conv_map.items():
        w = _t(sd[f"audio_encoder.feat_extractor.{idx}.weight"])
        b = _t(sd[f"audio_encoder.feat_extractor.{idx}.bias"])
        audio[name] = {"kernel": w.transpose(2, 1, 0), "bias": b}
    p["audio_encoder"] = audio

    def dense(prefix):
        return {
            "kernel": _t(sd[f"{prefix}.weight"]).T,
            "bias": _t(sd[f"{prefix}.bias"]),
        }

    p["input_mapping"] = dense("input_mapping")
    p["speaker_embedding"] = {"embedding": _t(sd["speaker_embedding.weight"])}
    p["speaker_mu"] = dense("speaker_mu")
    p["speaker_logvar"] = dense("speaker_logvar")
    if num_emotions:
        p["emotion_embedding"] = {"embedding": _t(sd["emotion_embedding.weight"])}
    p["pose_final"] = dense("output_process.poseFinal")

    backbone: Dict = {
        "embed_timestep": {
            "fc1": dense("backbone.embed_timestep.time_embed.0"),
            "fc2": dense("backbone.embed_timestep.time_embed.2"),
        }
    }
    for i in range(num_layers):
        pre = f"backbone.mlps.{i}"
        blk = {
            "ln1": {
                "scale": _t(sd[f"{pre}.block1.0.alpha"]).reshape(-1),
                "bias": _t(sd[f"{pre}.block1.0.beta"]).reshape(-1),
            },
            # token mix: torch Conv1d(seq, seq, 1) weight [S, S, 1]
            "token_mix_kernel": _t(sd[f"{pre}.block1.1.weight"])[:, :, 0],
            "token_mix_bias": _t(sd[f"{pre}.block1.1.bias"]),
            "ln2": {
                "scale": _t(sd[f"{pre}.block2.0.alpha"]).reshape(-1),
                "bias": _t(sd[f"{pre}.block2.0.beta"]).reshape(-1),
            },
            "channel_mix": {
                "kernel": _t(sd[f"{pre}.block2.1.weight"]).T,
                "bias": _t(sd[f"{pre}.block2.1.bias"]),
            },
        }
        backbone[f"block_{i}"] = blk
    p["backbone"] = backbone
    return p
