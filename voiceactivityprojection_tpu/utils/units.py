"""Time / sample / frame unit conversions.

The reference uses truncating ``int()`` conversions in two places with subtly
different call conventions (reference: vap/audio.py:14-19 — `int(t*sr)` and
`int(t/hop)` — and vap/events.py:65-67 — `int(t*frame_hz)`). For numeric
parity we mirror truncation exactly rather than rounding.
"""

from __future__ import annotations

from typing import List, Sequence


def time_to_samples(t: float, sample_rate: int) -> int:
    # reference: vap/audio.py:14-15 (int truncation)
    return int(t * sample_rate)


def time_to_frames(t: float, hop_time_or_hz: float, *, is_hz: bool = False) -> int:
    """Convert seconds to frame count.

    ``is_hz=False`` mirrors vap/audio.py:18-19 (`int(t / hop_time)`),
    ``is_hz=True``  mirrors vap/events.py:65-67 (`int(t * frame_hz)`).
    Both truncate; they agree whenever hop = 1/hz exactly.
    """
    if is_hz:
        return int(t * hop_time_or_hz)
    return int(t / hop_time_or_hz)


def sample_to_time(n_samples: int, sample_rate: int) -> float:
    # reference: vap/audio.py:22-23
    return n_samples / sample_rate


def bin_times_to_frames(bin_times: Sequence[float], frame_hz: int) -> List[int]:
    # reference: vap/objective.py:10-11 (tensor mul then .long() truncation)
    return [int(bt * frame_hz) for bt in bin_times]
