from voiceactivityprojection_tpu.utils.units import (
    time_to_samples,
    time_to_frames,
    sample_to_time,
    bin_times_to_frames,
)
from voiceactivityprojection_tpu.utils.io import (
    read_json,
    write_json,
    read_txt,
    write_txt,
    repo_root,
    tensor_dict_to_json,
)

__all__ = [
    "time_to_samples",
    "time_to_frames",
    "sample_to_time",
    "bin_times_to_frames",
    "read_json",
    "write_json",
    "read_txt",
    "write_txt",
    "repo_root",
    "tensor_dict_to_json",
]
