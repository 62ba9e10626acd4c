"""Declarative config validation + dispatch tests."""

import json

import pytest

from tq_tpu.config import RunConfig, Setting, load_config


def test_setting_hardware_bounds():
    Setting(9, 24, 9, 3, 8).validate()
    with pytest.raises(ValueError):
        Setting(9, 24, 9, 3, 32).validate()  # g > 31 (5-bit field)
    with pytest.raises(ValueError):
        Setting(9, 128, 9, 3, 8).validate()  # budget > 127 (7-bit field)
    with pytest.raises(ValueError):
        Setting(9, 24, 9, 16, 8).validate()  # data terms > 15 (4-bit field)
    # The group-size grid's g=32 point needs the explicit override.
    Setting(9, 32, 9, 3, 32).validate(allow_oversize=True)


def test_load_config_roundtrip(tmp_path):
    cfg = {
        "workload": "mlp",
        "settings": [
            {"weight_bits": 4, "weight_terms": 6, "data_bits": 6,
             "data_terms": 6, "group_size": 16},
            [2, 2, 6, 6, 1],
        ],
        "out_file": str(tmp_path / "out.json"),
        "calib": {"num_bins": 4096},
    }
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(cfg))
    rc = load_config(p)
    assert rc.workload == "mlp"
    assert rc.settings[0].group_size == 16
    assert rc.settings[1] == Setting(2, 2, 6, 6, 1)
    assert rc.calib.num_bins == 4096


def test_unknown_keys_rejected(tmp_path):
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps({"workload": "mlp", "typo_key": 1}))
    with pytest.raises(ValueError, match="typo_key"):
        load_config(p)


def test_unknown_workload_rejected():
    with pytest.raises(ValueError):
        RunConfig(workload="gan").validate()
