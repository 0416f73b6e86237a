"""LivelySpeaker-TPU: a TPU-native co-speech gesture generation framework.

A from-scratch JAX/XLA/Pallas/pjit re-design with the capabilities of
zyhbili/LivelySpeaker (ICCV 2023): semantic-aware gesture generation (SAG,
CLIP-conditioned transformer decoder) composed with a rhythm-aware diffusion
generator (RAG, audio-conditioned MLP denoiser) via diffusion
inpainting-in-time.
"""

__version__ = "0.1.0"
