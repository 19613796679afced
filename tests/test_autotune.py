import numpy as np

from mgard_tpu.config import Lossless
from mgard_tpu.utils import autotune


def test_autotune_picks_and_persists(tmp_path):
    path = tmp_path / "table.json"
    res = autotune.autotune((33, 33), np.float32, save=True, path=path,
                            iters=1)
    assert res["best"] in (Lossless.BITPLANE, Lossless.BITPLANE_GROUP)
    assert path.exists()
    cfg = autotune.lookup((33, 33), np.float32, path=path)
    assert cfg is not None
    assert cfg.lossless == res["best"]


def test_lookup_missing_returns_none(tmp_path):
    assert autotune.lookup((5, 5), np.float64,
                           path=tmp_path / "none.json") is None


def test_apply_tuned_seeds_env(tmp_path, monkeypatch):
    """apply_tuned seeds env defaults from persisted sweep winners;
    explicit user env wins (round-4 review item #7)."""
    import json
    import os

    path = tmp_path / "table.json"
    path.write_text(json.dumps({
        "default_knobs": {"MGARD_TPU_CHUNK_GROUPS": "1024",
                          "MGARD_TPU_BP_CB": "8",
                          "NOT_A_KNOB": "evil"},
    }))
    monkeypatch.delenv("MGARD_TPU_CHUNK_GROUPS", raising=False)
    monkeypatch.setenv("MGARD_TPU_BP_CB", "2")  # user-set: must win
    monkeypatch.delenv("NOT_A_KNOB", raising=False)
    autotune.apply_tuned(path)
    assert os.environ["MGARD_TPU_CHUNK_GROUPS"] == "1024"
    assert os.environ["MGARD_TPU_BP_CB"] == "2"
    assert "NOT_A_KNOB" not in os.environ  # only known knobs applied


def test_config_tuned_falls_back_to_defaults():
    from mgard_tpu.config import Config

    cfg = Config.tuned((7, 7, 7), np.float32)
    assert isinstance(cfg, Config)


def test_container_records_chunk_groups():
    """The stream layout depends on CHUNK_GROUPS; containers record the
    width in the header (2048 is the implicit on-wire value when the
    field is absent), and the header field round-trips."""
    import dataclasses

    import mgard_tpu
    from mgard_tpu.io import format as fmt
    from mgard_tpu.ops import bitplane

    v = np.linspace(0, 1, 17 * 17, dtype=np.float32).reshape(17, 17)
    buf = mgard_tpu.compress(v, 1e-3)
    header, _ = fmt.read_container(buf)
    assert (header.chunk_groups or 2048) == bitplane.CHUNK_GROUPS

    h2 = dataclasses.replace(header, chunk_groups=1024)
    h3 = fmt.Header.unpack(h2.pack())
    assert h3.chunk_groups == 1024


def test_decode_rejects_mismatched_chunk_groups():
    import dataclasses

    import mgard_tpu
    import pytest
    from mgard_tpu.io import format as fmt

    v = np.linspace(0, 1, 17 * 17, dtype=np.float32).reshape(17, 17)
    buf = mgard_tpu.compress(v, 1e-3)
    header, sections = fmt.read_container(buf)
    bad = fmt.write_container(
        dataclasses.replace(header, chunk_groups=512), list(sections))
    with pytest.raises(ValueError, match="chunk_groups"):
        mgard_tpu.decompress(bad)
