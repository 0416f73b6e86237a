"""Model zoo: RAG denoiser, audio frontend, CFG wrapper, SAG, evaluators."""

from .audio_encoder import WavEncoder, audio_samples_for_frames
from .cfg import make_cfg_denoiser, make_denoiser, make_guidance_schedule
from .mlp_backbone import MLPBlock, TimestepEmbedder, TransMLP, sinusoidal_table
from .rag import RAG, RAGConfig, reparameterize
