"""Config system tests: YAML merging, overrides, instantiation."""

import numpy as np
import pytest

from snn_for_object_detection_tpu.utils.config import (
    deep_update,
    instantiate,
    load_config,
    parse_overrides,
    save_config_snapshot,
)


def test_deep_update():
    base = {"a": {"b": 1, "c": 2}, "d": 3}
    deep_update(base, {"a": {"b": 10}, "e": 4})
    assert base == {"a": {"b": 10, "c": 2}, "d": 3, "e": 4}


def test_parse_overrides_types():
    out = parse_overrides(
        ["--model.init_args.lr=0.01", "--data.flag=true", "--x=[1,2]"]
    )
    assert out["model"]["init_args"]["lr"] == 0.01
    assert out["data"]["flag"] is True
    assert out["x"] == [1, 2]


def test_parse_overrides_rejects_bad():
    with pytest.raises(ValueError):
        parse_overrides(["positional"])


def test_load_config_merging(tmp_path):
    p1 = tmp_path / "a.yaml"
    p1.write_text("model:\n  lr: 1\n  depth: 2\n")
    p2 = tmp_path / "b.yaml"
    p2.write_text("model:\n  lr: 5\n")
    cfg = load_config([str(p1), str(p2)], ["--model.depth=9"])
    assert cfg == {"model": {"lr": 5, "depth": 9}}


def test_instantiate_class_path():
    obj = instantiate(
        {
            "class_path": "snn_for_object_detection_tpu.utils.Plotter",
            "init_args": {"threshold": 0.5, "save_video": False},
        }
    )
    from snn_for_object_detection_tpu.utils import Plotter

    assert isinstance(obj, Plotter)
    assert obj.threshold == 0.5


def test_instantiate_nested():
    node = {
        "outer": {
            "class_path": "snn_for_object_detection_tpu.utils.Plotter",
            "init_args": {"threshold": 0.9},
        },
        "plain": [1, 2],
    }
    out = instantiate(node)
    assert out["outer"].threshold == 0.9
    assert out["plain"] == [1, 2]


def test_snapshot_roundtrip(tmp_path):
    cfg = {"a": 1, "b": {"c": [1, 2]}}
    path = save_config_snapshot(cfg, str(tmp_path))
    import yaml

    assert yaml.safe_load(open(path)) == cfg


def test_default_config_instantiates():
    """The shipped config/config.yaml must build model+data+trainer."""
    cfg = load_config(["config/config.yaml"])
    model = instantiate(cfg["model"])
    from snn_for_object_detection_tpu.models import TinyYolo

    assert isinstance(model, TinyYolo)
    assert model.num_classes == 2
    data = instantiate(cfg["data"])
    assert data.dataset == "gen1"
    from snn_for_object_detection_tpu.train import Trainer

    trainer = Trainer(**cfg["trainer"])
    assert trainer.limit_train_batches == 100


def test_model_summary():
    from snn_for_object_detection_tpu.models import TinyYolo
    from snn_for_object_detection_tpu.utils.summary import summarize

    m = TinyYolo(num_classes=2, in_hw=(240, 304))
    s = summarize(m)
    assert s["params"] == 4_228_544
    # conv FLOPs/frame: ground truth for perf claims (docs/perf.md)
    assert 7.0e9 < s["conv_flops_per_frame"] < 8.5e9


def test_infer_fp8_config_overlay():
    """The shipped e5m2 inference overlay builds with the fp8 state
    dtype coerced from its YAML string (docs/perf.md round-5 headline
    config)."""
    import jax.numpy as jnp

    cfg = load_config(["config/config.yaml", "config/infer_fp8.yaml"])
    model = instantiate(cfg["model"])
    assert model.state_dtype == jnp.dtype(jnp.float8_e5m2)
    assert model.compute_dtype == jnp.dtype(jnp.bfloat16)
    # deep-merged defaults from the base config still apply
    assert model.num_classes == 2


def test_vgg_config_overlay():
    """class_path swapping from YAML (subclass_mode_model parity)."""
    cfg = load_config(["config/config.yaml", "config/vgg.yaml"])
    model = instantiate(cfg["model"])
    from snn_for_object_detection_tpu.models import VggSNN

    assert isinstance(model, VggSNN)
    assert model.neuron == "plif"
    # deep-merged defaults from the base config still apply
    assert model.loss_ratio == 0.04
