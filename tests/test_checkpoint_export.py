"""State-dict export/import roundtrip."""

import numpy as np
import pytest
import jax

from voiceactivityprojection_tpu.config import VapConfig
from voiceactivityprojection_tpu.models.checkpoint import (
    export_vap_state_dict,
    import_vap_state_dict,
)
from voiceactivityprojection_tpu.models.vap import init_vap

pytestmark = pytest.mark.model


def test_export_import_roundtrip():
    conf = VapConfig(dim=16, encoder_dim=16, channel_layers=1, cross_layers=2)
    params = init_vap(jax.random.key(0), conf)
    sd = export_vap_state_dict(params)
    # reference-layout names present
    assert "encoder.encoder.gEncoder.conv0.weight" in sd
    assert sd["encoder.encoder.gEncoder.conv0.weight"].shape == (16, 1, 10)
    assert "ar.layers.1.mha_cross.query.weight" in sd
    assert "ar.combinator.h0_a.weight" in sd
    assert sd["encoder.encoder.gAR.baseNet.weight_ih_l0"].shape == (48, 16)

    back = import_vap_state_dict(sd, conf)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_import_rejects_mismatched_head():
    """Importing a 256-wide discrete head into a comparative config must
    raise instead of silently producing garbage probabilities."""
    import pytest
    from voiceactivityprojection_tpu.config import VapConfig
    from voiceactivityprojection_tpu.models.checkpoint import (
        export_vap_state_dict,
        import_vap_state_dict,
    )
    from voiceactivityprojection_tpu.models.vap import init_vap

    conf = VapConfig(dim=16, encoder_dim=16, channel_layers=1, cross_layers=1)
    sd = export_vap_state_dict(init_vap(jax.random.key(0), conf))
    bad = VapConfig(
        dim=16, encoder_dim=16, channel_layers=1, cross_layers=1,
        representation="comparative",
    )
    with pytest.raises(ValueError, match="vap_head"):
        import_vap_state_dict(sd, bad)
    import_vap_state_dict(sd, conf)  # matching config still imports
