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

__all__ = [
    "rag_params_from_torch_state_dict",
    "sag_params_from_torch_state_dict",
]


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


def _attn(sd, prefix) -> Dict:
    """torch nn.MultiheadAttention -> our MultiHeadAttention params."""
    return {
        "in_proj_weight": _t(sd[f"{prefix}.in_proj_weight"]),
        "in_proj_bias": _t(sd[f"{prefix}.in_proj_bias"]),
        "out_proj": {
            "kernel": _t(sd[f"{prefix}.out_proj.weight"]).T,
            "bias": _t(sd[f"{prefix}.out_proj.bias"]),
        },
    }


def _ln(sd, prefix) -> Dict:
    return {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}


def _dense(sd, prefix) -> Dict:
    return {"kernel": _t(sd[f"{prefix}.weight"]).T, "bias": _t(sd[f"{prefix}.bias"])}


def sag_params_from_torch_state_dict(
    sd: Dict, num_layers: int = 3
) -> Dict:
    """Map a released SAG (MotionCLIP) state_dict (ckpts/TED/SAG.pth,
    module tree of scripts/model/motionclip_module.py) onto our
    :class:`livelyspeaker_tpu.models.sag.SAG` params."""
    enc_layers = {}
    for i in range(num_layers):
        pre = f"encoder.seqTransEncoder.layers.{i}"
        enc_layers[f"layer_{i}"] = {
            "self_attn": _attn(sd, f"{pre}.self_attn"),
            "linear1": _dense(sd, f"{pre}.linear1"),
            "linear2": _dense(sd, f"{pre}.linear2"),
            "norm1": _ln(sd, f"{pre}.norm1"),
            "norm2": _ln(sd, f"{pre}.norm2"),
        }
    dec_layers = {}
    for i in range(num_layers):
        pre = f"decoder.seqTransDecoder.layers.{i}"
        dec_layers[f"layer_{i}"] = {
            "self_attn": _attn(sd, f"{pre}.self_attn"),
            "multihead_attn": _attn(sd, f"{pre}.multihead_attn"),
            "linear1": _dense(sd, f"{pre}.linear1"),
            "linear2": _dense(sd, f"{pre}.linear2"),
            "norm1": _ln(sd, f"{pre}.norm1"),
            "norm2": _ln(sd, f"{pre}.norm2"),
            "norm3": _ln(sd, f"{pre}.norm3"),
        }
    return {
        "encoder": {
            "mu_query": _t(sd["encoder.muQuery"]),
            "sigma_query": _t(sd["encoder.sigmaQuery"]),
            "skel_embedding": _dense(sd, "encoder.skelEmbedding"),
            "encoder": enc_layers,
        },
        "decoder": {
            "mapping": _dense(sd, "decoder.mapping"),
            "final_layer": _dense(sd, "decoder.finallayer"),
            "decoder": dec_layers,
        },
    }
