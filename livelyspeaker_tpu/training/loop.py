"""Host-side training loop.

Mirrors the reference TrainLoop surface (``scripts/train_utils/
train_loop.py:22-225``): epochs over the loader, per-step KV logging with
loss quartiles, LR anneal stop condition, periodic checkpointing with
resume — driving the jitted mesh-parallel step from trainer.py.
"""

from __future__ import annotations

import time
from typing import Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .checkpoints import CheckpointManager, save_args
from .logging import KVLogger, NoPlatform, TrainPlatform, log_loss_quartiles
from .trainer import (
    TrainConfig,
    TrainState,
    init_train_state,
    make_optimizer,
    make_train_step,
)

__all__ = ["TrainLoop"]


class TrainLoop:
    def __init__(
        self,
        model,
        sched,
        params,
        data: Iterable,
        *,
        cfg: Optional[TrainConfig] = None,
        save_dir: Optional[str] = None,
        num_epochs: int = 1501,
        log_interval: int = 100,
        save_after_epoch: int = 600,
        save_every_epochs: int = 100,
        platform: Optional[TrainPlatform] = None,
        seed: int = 233,
        args_to_save: Optional[Dict] = None,
        resume: bool = False,
        mesh=None,
        use_shard_map: bool = False,
        backbone_factory=None,
    ):
        self.model = model
        self.sched = sched
        self.data = data
        self.cfg = cfg or TrainConfig()
        self.num_epochs = num_epochs
        self.log_interval = log_interval
        self.save_after_epoch = save_after_epoch
        self.save_every_epochs = save_every_epochs
        self.save_dir = save_dir
        self.logger = KVLogger(save_dir)
        self.platform = platform or NoPlatform(save_dir or ".")
        self.rng = jax.random.PRNGKey(seed)

        tx = make_optimizer(self.cfg)
        # Private copy: step_fn donates the state (donate_argnums=0), which
        # would otherwise delete the CALLER's param buffers on step 1.
        params = jax.tree.map(lambda p: jnp.array(p), params)
        self.state = init_train_state(
            params, tx, cfg=self.cfg, num_timesteps=sched.num_timesteps
        )
        if use_shard_map:
            # Explicit-DP step for GSPMD-opaque models (the fused Pallas
            # backbone): the whole step runs per-device on its batch shard
            # with pmean'd grads (parallel/training.py).  Lazy import —
            # parallel imports trainer from this package.
            from ..parallel.training import shard_train_step

            if mesh is None:
                raise ValueError("use_shard_map=True requires a mesh")
            if backbone_factory is not None:
                raise ValueError(
                    "backbone_factory (pipeline parallelism) and "
                    "use_shard_map (fused-kernel DP) are separate mesh "
                    "programs; drop one"
                )
            self.step_fn = shard_train_step(model, sched, tx, self.cfg, mesh)
        else:
            step = make_train_step(
                model, sched, tx, self.cfg, backbone_factory=backbone_factory
            )
            # Mesh-sharded params (TP and/or FSDP placement from
            # train_rag.py): pin the output state to the input placement —
            # unconstrained, GSPMD propagation may re-replicate an
            # FSDP-sharded state after one step (parallel/mesh.py).
            from jax.sharding import NamedSharding

            if any(
                isinstance(l.sharding, NamedSharding)
                and tuple(l.sharding.spec)
                for l in jax.tree.leaves(self.state.params)
            ):
                from ..parallel.mesh import preserve_state_shardings

                step = preserve_state_shardings(step, self.state)
            self.step_fn = jax.jit(step, donate_argnums=0)
        self.ckpt = CheckpointManager(save_dir) if save_dir else None
        self.start_step = 0
        if save_dir and args_to_save is not None:
            save_args(save_dir, args_to_save)
        if resume and self.ckpt is not None:
            restored, step = self.ckpt.restore(self.state)
            if restored is not None:
                self.state = self._recommit_scalars(restored)
                self.start_step = step
                print(f"resumed from step {step}")
        # Host-side step mirror: the hot loop must never read
        # ``state.step`` (a device array — int() blocks on the in-flight
        # step and serializes dispatches, adding the full ~25-30 ms host
        # dispatch latency to every step on remote-dispatch hosts).
        self.host_step = self.start_step

    def _recommit_scalars(self, state):
        """Orbax commits every restored leaf to its template placement.
        Eager-created scalars (``state.step``, sampler counters) were
        single-device in the template, so they come back COMMITTED to
        device 0 — and jit refuses to mix that with params committed to a
        mesh (FSDP/TP resume).  Recommit such leaves replicated over the
        params' mesh; single-device training is returned unchanged."""
        from jax.sharding import NamedSharding, PartitionSpec

        mesh = next(
            (
                l.sharding.mesh
                for l in jax.tree.leaves(state.params)
                if isinstance(getattr(l, "sharding", None), NamedSharding)
            ),
            None,
        )
        if mesh is None or mesh.size == 1:
            return state
        rep = NamedSharding(mesh, PartitionSpec())
        return jax.tree.map(
            lambda x: x
            if isinstance(getattr(x, "sharding", None), NamedSharding)
            else jax.device_put(x, rep),
            state,
        )

    @property
    def step(self) -> int:
        return self.host_step

    def _anneal_done(self) -> bool:
        return bool(
            self.cfg.lr_anneal_steps
            and self.host_step >= self.cfg.lr_anneal_steps
        )

    def run_loop(self) -> TrainState:
        t_start = time.time()
        # Resume fast-forward: re-enter the epoch/batch position the run
        # stopped at, so host_step stays paired with the same batch stream
        # as an uninterrupted run (requires a sized, epoch-seeded loader —
        # DataLoader.set_epoch; plain iterables just restart).
        start_epoch, skip = 0, 0
        steps_per_epoch = (
            len(self.data) if hasattr(self.data, "__len__") else 0
        )
        if self.start_step and steps_per_epoch:
            start_epoch = self.start_step // steps_per_epoch
            skip = self.start_step % steps_per_epoch
        for epoch in range(start_epoch, self.num_epochs):
            if hasattr(self.data, "set_epoch"):
                try:
                    # Loaders that take start_batch skip mid-epoch resume
                    # positions in the index stream — no assembly/transfer
                    # of the discarded batches (a 512-clip batch is ~92 MB
                    # through the host tunnel on remote-dispatch hosts).
                    self.data.set_epoch(epoch, start_batch=skip)
                    skip = 0
                except TypeError:  # single-arg set_epoch iterables
                    self.data.set_epoch(epoch)
            for batch in self.data:
                if skip:  # mid-epoch resume: drop already-consumed batches
                    skip -= 1
                    continue
                if self._anneal_done():
                    break
                # Key derived from the GLOBAL step (not a sequential split):
                # a resumed run replays the exact key stream of an
                # uninterrupted one, making resume RNG-exact
                # (tests/test_training.py::test_resume_is_bit_exact).
                step_rng = jax.random.fold_in(self.rng, self.host_step)
                dev_batch = {
                    k: v
                    for k, v in batch.items()
                    if k in ("motion", "audio", "vid", "mask", "emo")
                }
                self.state, metrics = self.step_fn(
                    self.state, dev_batch, step_rng
                )
                self.host_step += 1
                if self.host_step % self.log_interval == 0:
                    t = np.asarray(metrics.pop("t"))
                    loss_ps = np.asarray(metrics.pop("loss_per_sample"))
                    log_loss_quartiles(
                        self.logger,
                        t,
                        {"loss": loss_ps},
                        self.sched.num_timesteps,
                        log_means=False,  # scalar 'loss' logged below
                    )
                    metrics = {k: float(v) for k, v in metrics.items()}
                    for k, v in metrics.items():
                        self.logger.logkv_mean(k, v)
                    self.logger.logkv("step", self.step)
                    self.logger.logkv(
                        "samples", self.step * batch["motion"].shape[0]
                    )
                    self.logger.logkv("elapsed_s", time.time() - t_start)
                    out = self.logger.dumpkvs()
                    for k, v in out.items():
                        self.platform.report_scalar(
                            name=k, value=v, iteration=self.step,
                            group_name="Loss",
                        )
            if (
                self.ckpt is not None
                and epoch % self.save_every_epochs == 0
                and epoch > self.save_after_epoch
            ):
                self.save()
            if self._anneal_done():
                break  # don't spin through the remaining epochs
        if self.ckpt is not None:
            self.save()
        return self.state

    def save(self) -> None:
        if self.ckpt.latest_step() == self.step:
            return  # already saved at this step
        host_state = jax.device_get(self.state)
        self.ckpt.save(self.step, host_state)
        from .checkpoints import save_params_npz

        save_params_npz(
            f"{self.save_dir}/model{self.step:09d}.npz", host_state.params
        )
        if host_state.ema_params is not None:
            # EMA weights exported alongside, selectable at eval time by
            # pointing --model_path at the _ema file.
            save_params_npz(
                f"{self.save_dir}/model_ema{self.step:09d}.npz",
                host_state.ema_params,
            )
        print(f"saved checkpoint at step {self.step}")
