import json
from dataclasses import dataclass, field
from typing import List, Optional

from nexus_tpu.config import AbsArguments, load_config_file


@dataclass
class Inner(AbsArguments):
    dims: List[int] = field(default_factory=list)
    name: str = "x"


@dataclass
class Outer(AbsArguments):
    lr: float = 0.1
    steps: int = 10
    inner: Optional[Inner] = None
    tags: List[str] = field(default_factory=list)


def test_from_dict_recursive_coercion():
    cfg = Outer.from_dict({"lr": "0.5", "steps": "7", "inner": {"dims": [1, 2], "name": "n"}, "tags": ["a"]})
    assert cfg.lr == 0.5 and isinstance(cfg.lr, float)
    assert cfg.steps == 7 and isinstance(cfg.steps, int)
    assert isinstance(cfg.inner, Inner)
    assert cfg.inner.dims == [1, 2]


def test_unknown_keys_preserved():
    cfg = Outer.from_dict({"lr": 1.0, "bogus": 42})
    assert cfg.lr == 1.0
    assert getattr(cfg, "_extra", {}).get("bogus") == 42


def test_json_roundtrip_and_path_resolution(tmp_path):
    sub = tmp_path / "cfgs"
    sub.mkdir()
    data_dir = sub / "data"
    data_dir.mkdir()
    cfg_path = sub / "c.json"
    cfg_path.write_text(json.dumps({"lr": 0.2, "steps": 3}))
    cfg = Outer.from_json(str(cfg_path))
    assert cfg.lr == 0.2

    # raw engine-style config with a relative path key
    raw = sub / "engine.yaml"
    raw.write_text("output_dir: data\nmodel_name_or_path: bge-base\n")
    d = load_config_file(str(raw))
    assert d["output_dir"] == str(data_dir)
    assert d["model_name_or_path"] == "bge-base"  # HF-id untouched


def test_to_dict_roundtrip():
    cfg = Outer.from_dict({"lr": 0.3, "inner": {"dims": [4]}})
    d = cfg.to_dict()
    cfg2 = Outer.from_dict(d)
    assert cfg2.lr == 0.3 and cfg2.inner.dims == [4]
