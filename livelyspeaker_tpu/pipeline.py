"""High-level generation pipelines — the user-facing API.

``RAGSampler`` is the RAG-only path (scripts/test_RAG_ted.py:38-141);
``LivelySpeakerPipeline`` is the full two-stage composition
(scripts/test_LivelySpeaker_ted.py:57-113): SAG decodes a motion sketch from
a CLIP text embedding, which is q_sample-noised to step T-skip and
rhythm-refined by the RAG diffusion under classifier-free guidance.

Everything from the CLIP text encode to the final clip compiles into (at
most) two XLA programs; audio encoding is hoisted out of the diffusion scan.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from .diffusion import DiffusionSchedule, Inpainting, sample_loop
from .models import RAG, make_cfg_denoiser
from .models.clip_text import CLIPTextEncoder
from .models.sag import SAG

__all__ = ["RAGSampler", "LivelySpeakerPipeline", "generate_long_form",
           "generate_long_form_stream", "long_form_window_grid"]


class RAGSampler:
    """Audio+speaker conditioned gesture sampling with CFG.

    The whole reverse chain jits once per (batch shape, skip, method)
    combination; guidance scale, conditioning tensors, init_image and the RNG
    key are traced arguments, so a guidance sweep (test_RAG_ted.py:183-193)
    reuses one executable.

    ``mesh`` scales the same executable across chips (the reference is
    single-GPU-only, test_RAG_ted.py:60-70): batch args shard over the
    mesh's 'data' axis, params follow the TP rules.  With the XLA denoiser
    the sharded program is numerically identical to the single-device one;
    the fused Pallas denoiser runs per-device under shard_map with a
    fold_in(key, shard)-derived key stream (see parallel/sampling.py).
    """

    def __init__(
        self,
        model: RAG,
        params,
        *,
        steps: int = 1000,
        schedule: str = "cosine",
        timestep_respacing: Optional[str] = "ddim100",
        method: str = "ddim",
        use_fused: bool = False,
        mesh=None,
        guidance_schedule: Optional[str] = None,
    ):
        self.model = model
        self.params = params
        self.method = method
        self.use_fused = use_fused
        self.mesh = mesh
        self.guidance_schedule = guidance_schedule
        self.sched = DiffusionSchedule.create(
            steps=steps, schedule=schedule, timestep_respacing=timestep_respacing
        )
        self._jitted: Dict = {}

    def _guidance_schedule_fn(self, skip_timesteps: int):
        """Schedule callable normalised to the executed refinement window.

        The boundary is the ORIGINAL-process timestep of the first executed
        reverse step (sample_loop starts at respaced index T-skip-1 and the
        denoiser sees timestep_map-remapped t, sampling.py:363), so 'linear'
        and 'cosine' span exactly the steps that run, whatever the respacing
        or skip."""
        import numpy as np

        from .models import make_guidance_schedule

        idx = int(self.sched.num_timesteps) - int(skip_timesteps) - 1
        assert 0 <= idx < int(self.sched.num_timesteps), (
            skip_timesteps, self.sched.num_timesteps)
        t_boundary = int(np.asarray(self.sched.timestep_map)[idx])
        return make_guidance_schedule(self.guidance_schedule, t_boundary)

    def _build(self, skip_timesteps: int, with_init: bool, with_inpaint: bool,
               noised_inpaint: bool):
        c = self.model.cfg
        gsched = self._guidance_schedule_fn(skip_timesteps)

        def fn(params, cond, guidance, rng, init_image, inpaint_mask,
               inpaint_motion):
            b = cond["vid"].shape[0]
            if self.use_fused:
                from .models.fast_rag import make_fused_cfg_denoiser

                denoise = make_fused_cfg_denoiser(
                    self.model, params, cond, guidance,
                    guidance_schedule=gsched,
                )
            else:
                denoise = make_cfg_denoiser(
                    self.model, params, cond, guidance,
                    guidance_schedule=gsched,
                )
            inpainting = (
                Inpainting(inpaint_mask, inpaint_motion, noised_inpaint)
                if with_inpaint
                else None
            )
            return sample_loop(
                denoise,
                self.sched,
                (b, c.njoints, c.nfeats, c.nframes),
                rng,
                method=self.method,
                skip_timesteps=skip_timesteps,
                init_image=init_image if with_init else None,
                inpainting=inpainting,
            )

        if self.mesh is not None:
            from .parallel.sampling import shard_sample_fn

            # args after params: (cond, guidance, rng, init, mask, motion)
            return shard_sample_fn(
                fn,
                self.mesh,
                self.params,
                batched=(True, True, False, True, True, True),
                use_shard_map=self.use_fused,
                rng_arg=2,
            )
        return jax.jit(fn)

    def update_params(self, params) -> None:
        """Hot-swap the model weights (serving checkpoint reload).

        ``params`` is a traced ARGUMENT of every cached executable — not a
        closure constant — so a swap with the same tree structure and leaf
        shapes reuses every compiled program: no recompile, no dropped
        traffic.  Structure/shape are validated eagerly so a wrong
        checkpoint fails the reload call, not a later sampling call (a
        shape change would otherwise silently retrigger a 30s+ compile)."""
        old = jax.tree_util.tree_leaves_with_path(self.params)
        new = jax.tree_util.tree_leaves_with_path(params)
        if jax.tree_util.tree_structure(params) != jax.tree_util.tree_structure(
            self.params
        ):
            raise ValueError("checkpoint param tree structure differs from "
                             "the serving model's")
        bad = [
            jax.tree_util.keystr(kp)
            for (kp, a), (_, b) in zip(new, old)
            if a.shape != b.shape or a.dtype != b.dtype
        ]
        if bad:
            raise ValueError(
                f"checkpoint leaf shape/dtype mismatch at: {', '.join(bad)}"
            )
        self.params = params

    def __call__(
        self,
        cond: Dict[str, jnp.ndarray],
        rng: jax.Array,
        *,
        guidance=1.5,
        skip_timesteps: int = 0,
        init_image: Optional[jnp.ndarray] = None,
        inpainting: Optional[Inpainting] = None,
    ) -> jnp.ndarray:
        c = self.model.cfg
        b = cond["vid"].shape[0]
        guidance = jnp.asarray(guidance, jnp.float32)
        if self.mesh is not None:
            n_data = self.mesh.shape["data"]
            if b % n_data:
                raise ValueError(
                    f"batch {b} must divide the mesh data axis ({n_data}); "
                    "pad the batch (the serving batcher already pads to "
                    "max_batch)"
                )
            if guidance.ndim == 0:  # per-sample so it shards with the batch
                guidance = jnp.full((b,), guidance)
        with_init = init_image is not None or skip_timesteps > 0
        with_inpaint = inpainting is not None
        key = (b, skip_timesteps, with_init, with_inpaint,
               inpainting.noised if with_inpaint else True)
        if key not in self._jitted:
            self._jitted[key] = self._build(
                skip_timesteps, with_init, with_inpaint,
                inpainting.noised if with_inpaint else True,
            )
        zeros = jnp.zeros((b, c.njoints, c.nfeats, c.nframes))
        return self._jitted[key](
            self.params,
            cond,
            guidance,
            rng,
            init_image if init_image is not None else zeros,
            inpainting.mask if with_inpaint else jnp.zeros_like(zeros, bool),
            inpainting.motion if with_inpaint else zeros,
        )


class LivelySpeakerPipeline:
    """text + audio + speaker -> gesture clip (SAG sketch, RAG refinement).

    ``mesh`` scales the whole two-stage composition across chips: the CLIP
    text encode, the SAG decode and the RAG refinement chain all shard their
    batch axis over the mesh's 'data' axis (GSPMD, numerically identical to
    the single-device program — see parallel/sampling.py).
    """

    def __init__(
        self,
        rag: RAG,
        rag_params,
        sag: SAG,
        sag_params,
        clip_text: CLIPTextEncoder,
        clip_params,
        tokenizer,
        *,
        steps: int = 1000,
        timestep_respacing: str = "ddim100",
        skip_timesteps: int = 80,  # test_LivelySpeaker_ted.py:212
        method: str = "ddim",
        mesh=None,
        guidance_schedule: Optional[str] = None,
        use_fused: bool = False,
    ):
        self.rag_sampler = RAGSampler(
            rag,
            rag_params,
            steps=steps,
            timestep_respacing=timestep_respacing,
            method=method,
            mesh=mesh,
            guidance_schedule=guidance_schedule,
            use_fused=use_fused,
        )
        self.sag = sag
        self.sag_params = sag_params
        self.clip_text = clip_text
        self.clip_params = clip_params
        self.tokenizer = tokenizer
        self.skip_timesteps = skip_timesteps
        self.mesh = mesh
        jit_kw = {}
        if mesh is not None:
            from .parallel.mesh import batch_sharding

            dp = batch_sharding(mesh)
            jit_kw = {"in_shardings": dp, "out_shardings": dp}
        self._encode_text = jax.jit(
            lambda tokens: self.clip_text.apply(
                {"params": self.clip_params}, tokens
            ),
            **jit_kw,
        )
        self._sag_decode = jax.jit(
            lambda z, x: self.sag.apply(
                {"params": self.sag_params}, z, x, method=self.sag.decode
            ),
            **jit_kw,
        )

    def semantic_sketch(
        self, sentences: Sequence[str], seed_motion: jnp.ndarray
    ) -> jnp.ndarray:
        """SAG decode from CLIP text features
        (test_LivelySpeaker_ted.py:79-91)."""
        tokens = jnp.asarray(self.tokenizer(list(sentences)))
        z = self._encode_text(tokens)
        return self._sag_decode(z, seed_motion)

    def __call__(
        self,
        sentences: Sequence[str],
        cond: Dict[str, jnp.ndarray],
        rng: jax.Array,
        *,
        guidance: float = 1.5,
    ) -> jnp.ndarray:
        """Full composition (test_LivelySpeaker_ted.py:95-113)."""
        sketch = self.semantic_sketch(sentences, cond["origin_x"])
        return self.rag_sampler(
            cond,
            rng,
            guidance=guidance,
            skip_timesteps=self.skip_timesteps,
            init_image=sketch,
        )


def long_form_window_grid(
    n_audio_samples: int,
    nframes: int,
    n_pre_seq: int,
    fps: int = 15,
    sr: int = 16000,
):
    """The window grid every long-form path shares (this module's
    generators AND serving.GestureBatcher.long_form_stream — one
    definition so the audio-coverage semantics cannot drift apart).

    Windows of ``nframes`` overlap by ``n_pre_seq`` seed frames (hop =
    nframes - n_pre_seq); enough windows are laid down that
    ``nframes + (n-1)*hop >= total_frames`` (the tail window's audio is
    zero-padded by the caller), and the final window's output is cropped
    by ``excess`` so the yielded frames sum to exactly
    ``total_frames = max(int(n_audio_samples * fps / sr), nframes)``.

    Returns ``(n_windows, excess, hop, total_frames, sample_offsets)``
    where ``sample_offsets[w]`` is the waveform start of window ``w``.
    """
    hop = nframes - n_pre_seq
    total_frames = max(int(n_audio_samples * fps / sr), nframes)
    n_windows = max(1, -(-(total_frames - nframes) // hop) + 1)
    excess = nframes + (n_windows - 1) * hop - total_frames
    offsets = [int(round(w * hop / fps * sr)) for w in range(n_windows)]
    return n_windows, excess, hop, total_frames, offsets


def generate_long_form(
    sampler: RAGSampler,
    audio: "np.ndarray",
    speaker: int,
    rng: jax.Array,
    *,
    guidance: float = 1.5,
    fps: int = 15,
    sr: int = 16000,
    emotion: int = 0,
    pipeline: Optional[LivelySpeakerPipeline] = None,
    sentences: Optional[Sequence[str]] = None,
):
    """Arbitrary-length audio -> one continuous gesture stream.

    The reference only ever generates dataset windows; continuity between
    consecutive 34-frame clips comes from its seed-frame mechanism (the
    denoiser conditions on the first ``n_pre_seq=4`` frames of ``origin_x``,
    RAG.py:80-96 / models/rag.py:188-200, and the TED pipeline slides windows
    with exactly that overlap).  This function turns the mechanism into a
    long-form API: slice the waveform into ``nframes``-frame windows
    overlapping by ``n_pre_seq``, generate them sequentially, and feed each
    window's last ``n_pre_seq`` generated frames in as the next window's
    seed.  Every window reuses ONE compiled executable (fixed [1, ...]
    shapes); the loop is host-side because the dependency is inherently
    sequential.

    With ``pipeline`` + ``sentences`` (one per window, cycled if shorter),
    each window additionally gets a SAG semantic sketch refined by the last
    ``skip_timesteps`` diffusion steps (the full LivelySpeaker composition).

    Returns ``[njoints, nfeats, total_frames]`` with
    ``total_frames = int(len(audio) * fps / sr)`` exactly (min one window):
    the window grid is extended past the tail with zero-padded audio and the
    last window's output cropped, so no trailing audio goes motion-less.
    For incremental consumption (streaming serving), use
    :func:`generate_long_form_stream`, which this wraps.
    """
    import numpy as np

    chunks = list(
        generate_long_form_stream(
            sampler, audio, speaker, rng, guidance=guidance, fps=fps, sr=sr,
            emotion=emotion, pipeline=pipeline, sentences=sentences,
        )
    )
    return np.concatenate([c for _, c in chunks], axis=-1)


def generate_long_form_stream(
    sampler: RAGSampler,
    audio: "np.ndarray",
    speaker: int,
    rng: jax.Array,
    *,
    guidance: float = 1.5,
    fps: int = 15,
    sr: int = 16000,
    emotion: int = 0,
    pipeline: Optional[LivelySpeakerPipeline] = None,
    sentences: Optional[Sequence[str]] = None,
):
    """Generator form of :func:`generate_long_form`: yields
    ``(window_index, new_frames [J, F, K])`` as each window completes —
    K = nframes for window 0, nframes - n_pre_seq after (the final window may
    be cropped shorter so the total matches the audio duration exactly).
    Concatenating every chunk on the frame axis reproduces
    ``generate_long_form`` exactly
    (same key schedule). This is what lets serving stream a long request's
    motion incrementally instead of waiting for the whole chain.
    """
    import numpy as np

    c = sampler.model.cfg
    nf, pre = c.nframes, c.n_pre_seq
    n_windows, excess, hop, _, offsets = long_form_window_grid(
        len(audio), nf, pre, fps=fps, sr=sr
    )

    seed = np.zeros((1, c.njoints, c.nfeats, nf), np.float32)
    win_samples = int(round(nf / fps * sr))
    vid = jnp.asarray([speaker])
    emo = jnp.asarray([emotion]) if c.num_emotions else None

    for w in range(n_windows):
        s0 = offsets[w]
        wav = np.zeros((win_samples,), np.float32)
        chunk = np.asarray(audio[s0 : s0 + win_samples], np.float32)
        wav[: len(chunk)] = chunk
        cond = {
            "audio": jnp.asarray(wav)[None],
            "vid": vid,
            "origin_x": jnp.asarray(seed),
        }
        if emo is not None:
            # BEAT emotion-conditioned models require the emotion token
            # (models/rag.py:240; scripts_beat/model/RAG.py:125-126)
            cond["emo"] = emo
        rng, sub = jax.random.split(rng)
        if pipeline is not None and sentences:
            sent = sentences[w % len(sentences)]
            clip = pipeline([sent], cond, sub, guidance=guidance)
        else:
            clip = sampler(cond, sub, guidance=guidance)
        clip = np.asarray(clip[0])  # [J, F, nf]
        # The first `pre` frames of windows > 0 re-synthesise the seed and
        # are dropped; the caller keeps the previously-committed frames.
        out = clip if w == 0 else clip[:, :, pre:]
        if w == n_windows - 1 and excess:
            out = out[:, :, :-excess]  # audio shorter than the window grid
        yield w, out
        seed[:] = 0.0
        seed[0, :, :, :pre] = clip[:, :, -pre:]
