"""Config system tests: argparse round-trips, hashability, derived props."""

import argparse

import pytest

from voiceactivityprojection_tpu.config import (
    DataConfig,
    EventConfig,
    OptConfig,
    SDSConfig,
    VapConfig,
    VapMonoConfig,
)

pytestmark = pytest.mark.objective


def roundtrip(cls, argv):
    parser = argparse.ArgumentParser()
    cls.add_argparse_args(parser)
    args = parser.parse_args(argv)
    return cls.args_to_conf(args)


def test_vap_config_roundtrip():
    conf = roundtrip(VapConfig, ["--vap_dim", "128", "--vap_num_heads", "8"])
    assert conf.dim == 128 and conf.num_heads == 8
    assert conf.bin_times == (0.2, 0.4, 0.6, 0.8)


def test_bin_times_list_arg():
    conf = roundtrip(VapConfig, ["--vap_bin_times", "0.1", "0.2"])
    assert conf.bin_times == (0.1, 0.2)
    assert conf.horizon_frames == 5 + 10
    assert conf.n_classes == 2 ** 4
    assert conf.head_dim == 16


def test_bool_as_int_flag():
    conf = roundtrip(VapConfig, ["--vap_freeze_encoder", "0"])
    assert conf.freeze_encoder is False
    conf = roundtrip(VapConfig, ["--vap_freeze_encoder", "1"])
    assert conf.freeze_encoder is True


def test_configs_hashable_for_jit():
    # frozen dataclasses with tuple fields must hash (static jit args)
    for conf in (VapConfig(), VapMonoConfig(), OptConfig(), DataConfig(),
                 EventConfig(), SDSConfig()):
        hash(conf)


def test_every_config_binds_args():
    parser = argparse.ArgumentParser()
    for cls in (VapConfig, OptConfig, DataConfig, EventConfig, SDSConfig):
        cls.add_argparse_args(parser)
    args = parser.parse_args([])
    assert OptConfig.args_to_conf(args) == OptConfig()
    assert EventConfig.args_to_conf(args) == EventConfig()


def test_mono_config_extras():
    conf = VapMonoConfig()
    assert conf.mono is True
    assert conf.va_history_bins == 5


def test_derived_properties():
    conf = VapConfig()
    assert conf.bin_frames == [10, 20, 30, 40]
    assert conf.horizon_frames == 100
    assert conf.horizon_time == pytest.approx(2.0)
    assert conf.n_classes == 256
