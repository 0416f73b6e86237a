"""Evaluation: FGD/FID, beat alignment, SRGR, diversity, audio DSP."""

from .fgd import (
    EmbeddingSpaceEvaluator,
    calculate_frechet_distance,
    diversity_score,
    frechet_from_samples,
)
from .metrics import (
    Alignment,
    L1Div,
    SRGR,
    motion_beat_times_ted,
    ted_beat_align_batch,
)
