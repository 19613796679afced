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
