#!/usr/bin/env python
"""Train the RAG diffusion denoiser (reference: scripts/train_RAG.py).

Examples:
    # smoke-train on synthetic data
    python scripts/train_rag.py --dataset synthetic --epochs 2 \
        --batch_size 32 --save_dir /tmp/rag_synth --log_interval 5

    # real TED records (built by scripts/build_ted_records.py)
    python scripts/train_rag.py --dataset ted --data_dir ./datasets/ted_records \
        --save_dir ./save/rag_ted
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from livelyspeaker_tpu.utils.jax_setup import setup as _jax_setup
_jax_setup()

import jax
import numpy as np

from livelyspeaker_tpu.data import DataLoader, TedWindowDataset
from livelyspeaker_tpu.diffusion import DiffusionSchedule
from livelyspeaker_tpu.models import RAG, RAGConfig
from livelyspeaker_tpu.parallel import (
    batch_sharding,
    create_mesh,
    fsdp_shard_params,
    shard_params,
)
from livelyspeaker_tpu.training import TrainConfig
from livelyspeaker_tpu.training.loop import TrainLoop
from livelyspeaker_tpu.utils.config import train_args


def main():
    args = train_args()
    np.random.seed(args.seed)

    if args.dataset == "synthetic":
        from livelyspeaker_tpu.data.synthetic import build_synthetic_ted_records

        data_dir = os.path.join(tempfile.gettempdir(), "ls_tpu_synth")
        if not os.path.exists(os.path.join(data_dir, "meta.json")):
            print("building synthetic records...")
            build_synthetic_ted_records(data_dir, n_clips=8, clip_seconds=20)
        args.data_dir = data_dir

    if args.dataset == "beat":
        from livelyspeaker_tpu.data.beat import BeatWindowDataset

        # BEAT config defaults (scripts_beat: njoints 47, rot6d, 8 emotions)
        dataset = BeatWindowDataset(args.data_dir)
        args.njoints = dataset.cfg.njoints
        args.nfeats = 6
        if args.num_emotions == 0:
            args.num_emotions = 8
        n_speakers = max(args.n_speakers, 30)
    else:
        dataset = TedWindowDataset(args.data_dir)
        n_speakers = max(args.n_speakers, dataset.speaker_model.n_words
                         if dataset.speaker_model else 0)

    pp = args.pipeline_parallel
    if pp > 1:
        # ('data', 'stage') mesh: DP over data rows, GPipe stages over the
        # mixer stack (parallel/pipeline.py).  Params stay in the canonical
        # per-block layout (replicated); the train step routes the backbone
        # through pipeline_forward via the backbone_factory hook, so
        # checkpoints/optimizer state are identical to the plain path.
        if args.fused_train:
            raise SystemExit(
                "--pipeline_parallel does not compose with --fused_train "
                "(the fused custom-VJP kernel is a single-chip whole-stack "
                "program; the pipeline shards the stack over 'stage')"
            )
        if args.layers % pp:
            raise SystemExit(
                f"--layers {args.layers} not divisible by "
                f"--pipeline_parallel {pp}"
            )
        from livelyspeaker_tpu.parallel import create_pipeline_mesh

        mesh = create_pipeline_mesh(pipeline_parallel=pp)
    else:
        mesh = create_mesh()  # all available devices, pure DP by default
    # The fused custom-VJP backbone is opaque to GSPMD; on multi-device
    # meshes it trains through the explicit shard_map DP step instead
    # (parallel/training.py) — same replicated-state semantics, pmean'd
    # grads, per-shard RNG streams.
    use_shard_map_dp = bool(getattr(args, "fused_train", False)
                            and mesh.size > 1)
    if getattr(args, "fsdp", False) and use_shard_map_dp:
        raise SystemExit(
            "--fsdp needs the GSPMD train step (params gathered at use "
            "sites), but --fused_train on a multi-device mesh runs the "
            "explicit shard_map DP step over replicated params; drop one."
        )
    # training consumes 3-4 of the 7-8 record fields; skipping the
    # eval-only tracks roughly doubles assembly throughput on 1-core hosts
    train_fields = (
        ("motion", "audio", "vid", "emo")
        if args.dataset == "beat"
        else ("motion", "audio", "vid")
    )
    if args.device_resident:
        from livelyspeaker_tpu.data import DeviceDataLoader

        # whole dataset staged in HBM once; per-step host traffic is a [B]
        # index vector (remote-dispatch hosts are otherwise transfer-bound)
        loader = DeviceDataLoader(
            dataset,
            batch_size=min(args.batch_size, max(len(dataset) // 2, 1)),
            shuffle=True,
            seed=args.seed,
            fields=train_fields,
            sharding=batch_sharding(mesh),
        )
    else:
        loader = DataLoader(
            dataset,
            batch_size=min(args.batch_size, max(len(dataset) // 2, 1)),
            shuffle=True,
            seed=args.seed,
            sharding=batch_sharding(mesh),
            fields=train_fields,
        )

    cfg = RAGConfig(
        njoints=args.njoints,
        nfeats=args.nfeats,
        nframes=args.n_poses,
        latent_dim=args.latent_dim,
        num_layers=args.layers,
        mlpact=args.mlpact,
        n_pre_seq=args.n_pre_poses,
        n_speakers=n_speakers,
        num_emotions=args.num_emotions,
        cond_mask_prob=args.cond_mask_prob,
        fused_train_backbone=bool(getattr(args, "fused_train", False)),
        audio_bf16=bool(getattr(args, "audio_bf16", False)),
    )
    model = RAG(cfg)
    sched = DiffusionSchedule.create(
        steps=args.diffusion_steps, schedule=args.noise_schedule
    )

    sample = dataset[0]
    keys = ("motion", "audio", "vid") + (("emo",) if "emo" in sample else ())
    init_batch = {k: np.asarray(sample[k])[None] for k in keys}
    init_cond = {"audio": init_batch["audio"], "vid": init_batch["vid"],
                 "origin_x": init_batch["motion"]}
    if "emo" in init_batch:
        init_cond["emo"] = init_batch["emo"]
    params = model.init(
        {"params": jax.random.PRNGKey(args.seed),
         "style": jax.random.PRNGKey(args.seed + 1),
         "cond_mask": jax.random.PRNGKey(args.seed + 2)},
        init_batch["motion"],
        np.zeros((1,), np.int32),
        init_cond,
        train=True,
    )["params"]
    if getattr(args, "fsdp", False):
        # ZeRO-style: params (and, by sharding propagation, Adam moments +
        # the EMA shadow) live 1/|data| per device on top of the TP rules.
        # Composes with --pipeline_parallel: the canonical tree stays
        # 'data'-sharded (ZeRO memory), pipeline_forward's shard_map
        # gathers+reshards the stacked copies over 'stage' at use sites
        # (dryrun-validated at flagship shape, __graft_entry__.py).
        params = fsdp_shard_params(params, mesh)
    elif pp > 1:
        # Canonical layout replicated; pipeline_forward reshards the
        # stacked copies over 'stage' inside its own shard_map.
        from livelyspeaker_tpu.parallel import replicated

        params = jax.device_put(params, replicated(mesh))
    else:
        params = shard_params(params, mesh)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    print(f"Total params: {n_params / 1e6:.2f}M")

    backbone_factory = None
    if pp > 1:
        from livelyspeaker_tpu.parallel import make_pipeline_backbone_factory

        backbone_factory = make_pipeline_backbone_factory(cfg, mesh)

    tcfg = TrainConfig(
        lr=args.lr,
        weight_decay=args.weight_decay,
        lr_anneal_steps=args.lr_anneal_steps,
        lambda_vel=args.lambda_vel,
        schedule_sampler=args.schedule_sampler,
        ema_rate=args.ema_rate,
        ema_warmup=args.ema_warmup,
        kld_weight=0.0 if args.dataset == "beat" else 0.01,
    )
    loop = TrainLoop(
        model,
        sched,
        params,
        loader,
        cfg=tcfg,
        save_dir=args.save_dir,
        num_epochs=args.epochs,
        log_interval=args.log_interval,
        save_after_epoch=600 if args.epochs > 600 else -1,
        save_every_epochs=args.save_interval,
        seed=args.seed,
        args_to_save=vars(args),
        resume=bool(args.resume_checkpoint),
        mesh=mesh,
        use_shard_map=use_shard_map_dp,
        backbone_factory=backbone_factory,
    )
    loop.run_loop()
    print(f"done at step {loop.step}")


if __name__ == "__main__":
    main()
