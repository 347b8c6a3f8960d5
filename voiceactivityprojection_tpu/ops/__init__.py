from voiceactivityprojection_tpu.ops.codebook import (
    projection_windows_to_bins,
    extract_projection_bins,
    codebook_encode,
    codebook_decode,
    codebook_matrix,
    get_labels,
    probs_next_speaker_aggregate,
    get_probs,
    entropy_bits,
)
from voiceactivityprojection_tpu.ops.losses import loss_vap, loss_vad

__all__ = [
    "projection_windows_to_bins",
    "extract_projection_bins",
    "codebook_encode",
    "codebook_decode",
    "codebook_matrix",
    "get_labels",
    "probs_next_speaker_aggregate",
    "get_probs",
    "entropy_bits",
    "loss_vap",
    "loss_vad",
]
