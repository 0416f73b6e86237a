#!/usr/bin/env python
"""Convert reference PyTorch checkpoints to this framework's portable npz.

Supported kinds:
  rag       ckpts/TED/RAG.pt or BEAT RAG checkpoints (state_dict, CLIP-stripped)
  sag       ckpts/TED/SAG.pth (MOTIONCLIP state_dict)
  clip      OpenAI CLIP ViT-B/32 (full model or state_dict; text tower kept)
  fgd       TED TriModal gesture autoencoder (gesture_autoencoder_*.bin)
  beat_fid  BEAT HalfEmbeddingNet (best_rec_200.bin style)

Example:
    python scripts/convert_checkpoint.py rag ckpts/TED/RAG.pt rag_ted.npz
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from livelyspeaker_tpu.training.checkpoints import save_params_npz


def load_torch(path):
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return obj


def main():
    p = argparse.ArgumentParser()
    p.add_argument("kind", choices=["rag", "sag", "clip", "fgd", "beat_fid"])
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--layers", type=int, default=8, help="RAG mixer blocks")
    p.add_argument("--num_emotions", type=int, default=0,
                   help="8 for BEAT RAG checkpoints")
    args = p.parse_args()

    sd = load_torch(args.src)
    if args.kind == "rag":
        from livelyspeaker_tpu.utils.torch_convert import (
            rag_params_from_torch_state_dict,
        )

        params = rag_params_from_torch_state_dict(
            sd, num_layers=args.layers, num_emotions=args.num_emotions
        )
    elif args.kind == "sag":
        from livelyspeaker_tpu.utils.torch_convert import (
            sag_params_from_torch_state_dict,
        )

        params = sag_params_from_torch_state_dict(sd)
    elif args.kind == "clip":
        from livelyspeaker_tpu.models.clip_text import (
            clip_text_params_from_torch,
        )

        params = clip_text_params_from_torch(sd)
    else:  # fgd / beat_fid share the PoseEncoderConv converter
        from livelyspeaker_tpu.models.embedding_net import (
            pose_embedding_params_from_torch,
        )

        inner = sd.get("gen_dict") or sd.get("model_state") or sd
        params = pose_embedding_params_from_torch(inner)

    save_params_npz(args.dst, params)
    print(f"converted {args.kind}: {args.src} -> {args.dst}")


if __name__ == "__main__":
    main()
