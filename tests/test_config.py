from pathlib import Path

import pytest

from tpuslam.config import Config, dump_config, parse_config, save_config

DEFAULTS = Path(__file__).resolve().parent.parent / "tpuslam" / "config" / "defaults"


def test_parse_default_adapt_config():
    cfg = parse_config(DEFAULTS / "adapt_kitti.yaml")
    assert cfg.dataset.dataset == "Kitti"
    assert cfg.dataset.scales == (0, 1, 2, 3)  # list -> tuple coercion
    assert cfg.depth_pose.batch_size == 3
    assert cfg.depth_pose.max_depth is None  # empty YAML value -> Optional None
    assert cfg.depth_pose.log_path.is_absolute()  # path absolutised
    assert cfg.slam.adaptation_epochs == 5
    assert cfg.replay_buffer.similarity_threshold == 0.95
    assert cfg.loop_closure.detection_threshold == 0.99
    assert cfg.dataset.config_file == (DEFAULTS / "adapt_kitti.yaml").absolute()


def test_parse_synthetic_config():
    cfg = parse_config(DEFAULTS / "adapt_synthetic.yaml")
    assert cfg.dataset.dataset == "Synthetic"
    assert cfg.dataset.trajectory == "loop"


def test_unknown_key_raises(tmp_path):
    bad = tmp_path / "bad.yaml"
    bad.write_text("Slam:\n  no_such_field: 1\n")
    with pytest.raises(KeyError, match="no_such_field"):
        parse_config(bad)


def test_unknown_section_raises(tmp_path):
    bad = tmp_path / "bad.yaml"
    bad.write_text("Nope:\n  x: 1\n")
    with pytest.raises(KeyError, match="Nope"):
        parse_config(bad)


def test_type_coercion_rejects_wrong_types(tmp_path):
    bad = tmp_path / "bad.yaml"
    bad.write_text("Slam:\n  adaptation: 3\n")
    with pytest.raises(TypeError):
        parse_config(bad)


def test_roundtrip_save(tmp_path):
    cfg = parse_config(DEFAULTS / "adapt_kitti.yaml")
    out = tmp_path / "copy.yaml"
    save_config(cfg, out)
    cfg2 = parse_config(out)
    assert cfg2.slam.adaptation_epochs == cfg.slam.adaptation_epochs
    assert cfg2.dataset.scales == cfg.dataset.scales
    assert "adaptation_epochs" in dump_config(cfg2)
