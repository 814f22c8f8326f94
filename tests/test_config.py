import dataclasses

import pytest

from isp_tts_tpu.config import (
    MISSING,
    Registry,
    build_config,
    disable_nodes,
    load_recipe,
    merge_dicts,
    resolve_interpolations,
)


def test_merge_dicts_deep():
    base = {"a": {"x": 1, "y": 2}, "b": [1, 2], "c": 3}
    over = {"a": {"y": 5, "z": 6}, "b": [9]}
    out = merge_dicts(base, over)
    assert out == {"a": {"x": 1, "y": 5, "z": 6}, "b": [9], "c": 3}


def test_disable_nodes():
    cfg = {"m": {"pitch": {"_disable_": True, "v": 1}, "energy": {"v": 2}}}
    assert disable_nodes(cfg) == {"m": {"energy": {"v": 2}}}


def test_interpolation_refs_and_resolvers():
    cfg = {
        "model": {"_name_": "AcousticModel", "dim": 384},
        "out": "results/${model._name_}/x",
        "dim2": "${model.dim}",
        "calc": "${eval:2 * 3 + 1}",
    }
    out = resolve_interpolations(cfg)
    assert out["out"] == "results/AcousticModel/x"
    assert out["dim2"] == 384  # whole-string interpolation preserves type
    assert out["calc"] == 7


def test_interpolation_cycle_detection():
    with pytest.raises(ValueError):
        resolve_interpolations({"a": "${b}", "b": "${a}"})


def test_load_recipe_base_chain(tmp_path):
    (tmp_path / "default.yaml").write_text("trainer:\n  lr: 0.001\n  epochs: 10\n")
    (tmp_path / "child.yaml").write_text(
        "base: default.yaml\ntrainer:\n  epochs: 5\nmodel:\n  dim: 8\n"
    )
    cfg = load_recipe("child", tmp_path)
    assert cfg["trainer"] == {"lr": 0.001, "epochs": 5}
    assert cfg["model"]["dim"] == 8


@dataclasses.dataclass
class DummyConfig:
    dim: int = 4
    depth: int = MISSING  # type: ignore


class Dummy:
    Config = DummyConfig

    def __init__(self, config):
        self.config = config


def test_build_config_filters_and_missing():
    cfg = build_config(DummyConfig, {"dim": 8, "depth": 2, "_name_": "x", "junk": 1})
    assert (cfg.dim, cfg.depth) == (8, 2)
    with pytest.raises(ValueError):
        build_config(DummyConfig, {"dim": 8})


def test_registry_instantiate():
    reg = Registry("test")
    reg.add("Dummy", Dummy)
    obj = reg.instantiate({"_name_": "Dummy", "dim": 16, "depth": 1})
    assert obj.config.dim == 16
    with pytest.raises(KeyError):
        reg.get("Nope")
