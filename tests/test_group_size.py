"""Pin the ResNet-18 group-size/budget grid against the published file.

The reference's ``evaluate_group_size.py:71-88`` sweeps g in
{1,2,8,16,32} x alpha in {1.0,1.25,1.5,2.0,3.0} at (wb=9, db=9, dt=3)
with weight_terms = round(alpha * g) and publishes
``results/resnet18-group-size-results.json``.  Every tmacs/avg_terms
value there is deterministic arithmetic over the layer-shape table, so
all 25 settings must reproduce exactly (reference hook buffers are
float32, hence the float32 cast).
"""

import json
from pathlib import Path

import numpy as np
import pytest

from tq_tpu.convert import static_conv_layer_settings
from tq_tpu.evals.group_size import ALPHAS, GROUP_SIZES
from tq_tpu.models import resnet
from tq_tpu.profilers import cnn_cost

REF = Path("/root/reference/results/resnet18-group-size-results.json")


@pytest.mark.skipif(not REF.exists(), reason="reference checkout absent")
def test_group_size_grid_matches_published():
    published = json.loads(REF.read_text())
    specs = resnet.conv_specs()
    assert set(published) == {str(g) for g in GROUP_SIZES}
    for g in GROUP_SIZES:
        row = published[str(g)]
        assert len(row["tmacs"]) == len(ALPHAS)
        for i, alpha in enumerate(ALPHAS):
            wt = round(alpha * g)
            settings = static_conv_layer_settings(specs, 9, g, wt)
            tmacs, avg_terms = cnn_cost(settings=settings, specs=specs,
                                        data_bits=9, data_terms=3)
            assert np.float32(tmacs) == np.float32(row["tmacs"][i]), (g, alpha)
            assert np.float32(avg_terms) == np.float32(
                row["avg_terms"][i]
            ), (g, alpha)


def test_grid_settings_shape():
    """The sweep driver's grid constants match evaluate_group_size.py:71-77."""
    assert GROUP_SIZES == (1, 2, 8, 16, 32)
    assert ALPHAS == (1.0, 1.25, 1.5, 2.0, 3.0)
